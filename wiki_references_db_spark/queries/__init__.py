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
    # THIS WINDOW (round 11, executing the TODO written at round-10
    # close): flagship; semdedup_recall_eval (registered after the r10
    # window closed — the one never-driver-checked query, takes its
    # mandated slot); the TWO value-changed round-11 reworks
    # (dedup_embedding_cosine — corpus-adaptive band bits + norms
    # carried on band rows, so its candidate set and output changed;
    # table_profile_stats_approx — now emits the exact profile + an
    # engine-exact within_5pct_of_exact verdict with a FULL SQL
    # oracle, replacing the r10 registration whose driver row came
    # back err:no_oracle, i.e. untested); the TWO round-11 additions
    # (dedup_semdedup_cells_kfixed / semdedup_recall_eval_kfixed —
    # the fixed-k production centroid shape and its recall half); ALL
    # 41 remaining round-6-vintage rows (enumerated in the r10 TODO,
    # verified against CORRECTNESS_r01..r10); then 3 of the 49
    # round-7-vintage rows chosen for family spread (dedup canonical
    # pick, TPC-H deep join, streaming enrich).  After this window
    # lands, latest-row ages are {r11: 50, r10: 48, r9: 49, r8: 48,
    # r7: 46} (246 registered total) — nothing older than round 7.
    # Round-12 TODO: flagship + the FIVE queries registered after this
    # window closed and therefore never driver-checked
    # (embedding_lsh_recall_eval, dedup_semdedup_cells_ksqrt,
    # semdedup_recall_eval_ksqrt, dedup_embedding_cosine_projected,
    # embedding_lsh_projected_recall_eval — they MUST take slots) +
    # 44 of the 46 remaining r7-vintage rows (the r7 list minus
    # dedup_canonical_pick, q9_product_profit, stream_enrich_static;
    # push the last 2 + any round-12 additions' displacements to
    # round 13) = exactly 50.
    "wiki_citations_at_revision",
    # --- never driver-checked (takes priority) ---
    "semdedup_recall_eval",
    # --- round-11 value-changed reworks ---
    "dedup_embedding_cosine",
    "table_profile_stats_approx",
    # --- NEW in round 11 ---
    "dedup_semdedup_cells_kfixed",
    "semdedup_recall_eval_kfixed",
    # --- round-6-vintage refresh (all 41 remaining) ---
    "ann_ivf_pq_rerank",
    "basket_part_pairs",
    "bigram_lm_doc_score",
    "bloom_prefilter_join_stats",
    "cascade_delete_impact",
    "corpus_dup_span_stats",
    "csv_roundtrip_stats",
    "dedup_paragraphs_global",
    "dynamic_partition_pruning_stats",
    "embedding_coreset_per_cell",
    "event_type_trigrams",
    "events_seasonal_anomaly",
    "events_sessionize",
    "graph_bfs_converged",
    "graph_weighted_sssp",
    "interval_merge_coverage",
    "join_cardinality_stats",
    "jsonl_roundtrip_stats",
    "k_anonymity_groups",
    "multimodal_phash_dedup",
    "ols_normal_equations",
    "ols_per_group",
    "partitioned_layout_prune_stats",
    "phash_recall_eval",
    "priority_weighted_sample",
    "q21_blocking_supplier",
    "q5_local_supplier_volume",
    "q7_volume_shipping",
    "rare_token_score",
    "schema_evolution_merge_stats",
    "sketch_ams_f2",
    "sketch_hll_sliding_union",
    "sketch_sample_quantiles",
    "source_overlap_matrix",
    "stream_join_full_outer",
    "stream_join_left_outer",
    "stream_join_then_window",
    "target_encode_oof",
    "token_simpson_diversity",
    "triangle_count_cosupplier",
    "vocab_encode_docs",
    # --- round-7-vintage refresh (3 of 49, family spread) ---
    "dedup_canonical_pick",
    "q9_product_profit",
    "stream_enrich_static",
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
