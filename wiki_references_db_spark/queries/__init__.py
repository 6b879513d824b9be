"""Query registry backing the driver contract (``__spark_entry__.py``).

Every implemented operator from SURVEY.md §2 (plus the training-data
operator families) registers a named query: a ``(spark, sf_dir) ->
DataFrame`` callable and, where SQL-expressible, an equivalent DuckDB
oracle SQL string over the same parquet tables.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    _load()
    return dict(_QUERIES)


def all_oracles() -> dict[str, str]:
    _load()
    return dict(_ORACLES)


_LOADED = False

# The external driver evaluates the FIRST 50 registered queries against
# the DuckDB oracle (round-1 lesson: everything after position 50 got no
# hard correctness signal).  Every other query stays registered (and
# locally oracle-checked in tests/test_oracle_parity.py) after these.
#
# STEADY-STATE ROTATION POLICY (post-231/231: every registry member has
# a green driver row).  Each round's window = flagship + any
# never-driver-checked additions + every query whose VALUES changed
# that round + the OLDEST previously-green rows until the 50 slots are
# full, so no row's latest evidence ages past ~5 rounds.  PLAN-ONLY
# changes (persist levels, physical form) do not displace never-checked
# queries: they are value-identical by construction and covered by the
# local mirror.  (Round-3 lesson: local-green != driver-green — only a
# driver row is hard evidence.  Historical window contents live in the
# git history of this file.)
_DRIVER_WINDOW = [
    # THIS WINDOW (round 12, executing the TODO written at round-11
    # close, verbatim): flagship; the FIVE queries registered after the
    # r11 window closed and therefore never driver-checked
    # (embedding_lsh_recall_eval, dedup_semdedup_cells_ksqrt,
    # semdedup_recall_eval_ksqrt, dedup_embedding_cosine_projected,
    # embedding_lsh_projected_recall_eval — mandated slots); then 44 of
    # the 46 round-7-vintage rows (the full r7 list recomputed from
    # CORRECTNESS_r01..r11 minus the TWO DEFERRED rows named below).
    # DEFERRED TO ROUND 13 (must LEAD the r13 window, before any other
    # rotation candidates): q12_priority_class_counts,
    # q13_customer_distribution — chosen as the two lowest-risk
    # deferrals (single-table TPC-H aggregates, code untouched since
    # r2, locally parity-checked at three SFs every round).  After this
    # window lands, latest-row ages are {r12: 50, r11: 49, r10: 48,
    # r9: 49, r8: 48, r7: 2} over the 246 pre-r12 registrations (the
    # 6 round-12 additions — dedup_winnowing_fingerprints,
    # winnowing_recall_eval, dedup_cdc_chunks,
    # stream_cdc_chunks_vs_corpus, semantic_decontaminate_lsh,
    # rrf_hybrid_rank —
    # are never-driver-checked and MUST take r13 slots; only the flagship
    # overlaps the r11 window) and ZERO queries remain
    # never-driver-checked.
    # Round-13 TODO: flagship + the 2 deferred r7 rows above + any
    # round-12 additions (never driver-checked, mandated slots) + the
    # oldest r8-vintage rows until the 50 slots are full.
    "wiki_citations_at_revision",
    # --- never driver-checked (takes priority; late-r11 additions) ---
    "embedding_lsh_recall_eval",
    "dedup_semdedup_cells_ksqrt",
    "semdedup_recall_eval_ksqrt",
    "dedup_embedding_cosine_projected",
    "embedding_lsh_projected_recall_eval",
    # --- round-7-vintage refresh (44 of 46; 2 deferrals named above) ---
    "ann_ivf_pq_recall",
    "audience_overlap_jaccard",
    "bpe_pair_merge",
    "corpus_clean_pack_pipeline",
    "corpus_token_gini",
    "curriculum_quality_buckets",
    "dedup_incremental_batch",
    "dedup_lsh_recall_curve",
    "dedup_substring_containment",
    "doc_chunk_sliding",
    "embedding_pca_power_iter",
    "embedding_quantize_int8",
    "group_split_no_leakage",
    "hard_negative_mining",
    "heavy_hitters_two_phase",
    "hierarchy_root_closure",
    "hierarchy_subtree_rollup",
    "kcore_interaction_filter",
    "key_skew_profile",
    "kmeans_lloyd_update",
    "label_propagation_2iter",
    "length_bucket_batches",
    "numeric_corr_matrix",
    "pagerank_2iter",
    "pareto_skyline_parts",
    "pq_codebook_assign",
    "q11_important_share",
    "q15_top_supplier",
    "q16_part_supplier_variety",
    "q20_excess_share_supplier",
    "q22_dormant_customers",
    "q2_min_cost_supplier",
    "q4_priority_late_exists",
    "q8_market_share",
    "salted_replicate_join",
    "semantic_search_quality_filtered",
    "sketch_kmv_setops",
    "source_centroid_similarity",
    "source_token_drift",
    "sparse_idf_cosine_pairs",
    "stream_incident_attribution",
    "table_profile_stats",
    "training_shuffle_shards",
    "vocab_oov_rate",
]


def _load() -> None:
    global _LOADED
    if _LOADED:
        return
    # Import for registration side effects.
    from wiki_references_db_spark.queries import (  # noqa: F401
        analytics,
        citations,
        curation,
        generic,
        multimodal,
        pipeline_extra,
        profiling,
        serving_query,
        streams,
        tpch,
        training,
    )

    for registry in (_QUERIES, _ORACLES):
        ordered = {
            name: registry[name] for name in _DRIVER_WINDOW if name in registry
        }
        for name, value in registry.items():
            ordered.setdefault(name, value)
        registry.clear()
        registry.update(ordered)

    _LOADED = True
