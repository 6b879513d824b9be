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
# hard correctness signal).  This list pins the window's contents:
# the whole training/multimodal/streaming family, every query whose
# implementation changed this round, the new serving/ordering queries,
# and a representative core of the relational operator surface.  Every
# other query stays registered (and locally oracle-checked in
# tests/test_oracle_parity.py) after these.
_DRIVER_WINDOW = [
    # ROTATION POLICY: every registered query gets a driver row at most
    # 2 rounds old; never-driver-checked and VALUE-changed-this-round
    # queries take priority (round-3 lesson: local-green != driver-green
    # — the local mirror canonicalizes at driver strictness, but only a
    # driver row is hard evidence).  PLAN-ONLY changes (persist levels,
    # physical form) do not displace never-checked queries: they are
    # value-identical by construction and covered by the local mirror.
    #
    # THIS WINDOW (set at round-7 start): flagship first, then 49 of the
    # 64 never-driver-checked queries remaining after round 6, in the
    # judge's priority order — the TPC-H completion set (the shapes a
    # TPC-H user hits first), the graph family (the reference's
    # parent_domain / part_of_larger_work self-FK traversals,
    # reference:models.py:151,28,75), the dedup/ANN evidence stragglers,
    # then the general backlog.  The 15 that do not fit are enumerated
    # below as the ROUND-8 FINAL COHORT.
    "wiki_citations_at_revision",
    # --- TPC-H completion set (11) ---
    "q2_min_cost_supplier",
    "q4_priority_late_exists",
    "q8_market_share",
    "q9_product_profit",
    "q11_important_share",
    "q12_priority_class_counts",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q16_part_supplier_variety",
    "q20_excess_share_supplier",
    "q22_dormant_customers",
    # --- graph family (5) ---
    "pagerank_2iter",
    "label_propagation_2iter",
    "hierarchy_root_closure",
    "hierarchy_subtree_rollup",
    "kcore_interaction_filter",
    # --- dedup / ANN evidence stragglers (6) ---
    "dedup_substring_containment",
    "dedup_incremental_batch",
    "dedup_canonical_pick",
    "dedup_lsh_recall_curve",
    "ann_ivf_pq_recall",
    "pq_codebook_assign",
    # --- general never-checked backlog (27) ---
    "salted_replicate_join",
    "pareto_skyline_parts",
    "kmeans_lloyd_update",
    "embedding_quantize_int8",
    "sketch_kmv_setops",
    "bpe_pair_merge",
    "group_split_no_leakage",
    "embedding_pca_power_iter",
    "sparse_idf_cosine_pairs",
    "heavy_hitters_two_phase",
    "doc_chunk_sliding",
    "curriculum_quality_buckets",
    "training_shuffle_shards",
    "length_bucket_batches",
    "corpus_clean_pack_pipeline",
    "corpus_token_gini",
    "source_token_drift",
    "vocab_oov_rate",
    "hard_negative_mining",
    "semantic_search_quality_filtered",
    "source_centroid_similarity",
    "table_profile_stats",
    "numeric_corr_matrix",
    "key_skew_profile",
    "audience_overlap_jaccard",
    "stream_enrich_static",
    "stream_incident_attribution",
    # NEXT-ROUND ROTATION TODO — ROUND-8 FINAL COHORT: after this
    # window lands, these 16 are the ONLY queries in the 229-query
    # registry that have never had a driver row.  Round 8's window =
    # flagship + anything whose VALUES change in round 8 + all of:
    # stream_dedup_vs_corpus (added round 7, registered after the
    # window), session_first_touch_attribution, sql_grouping_sets,
    # events_range_frame_1h, events_locf_carry_forward,
    # events_time_weighted_avg, events_in_incident_windows,
    # events_rolling_wau, events_value_trend_ols,
    # events_equidepth_histogram, orders_open_backlog_curve,
    # winsorized_value_stats, importance_weighted_sample,
    # zorder_morton_codes, snapshot_diff_cdc, incremental_agg_merge.
    # That reaches 229/229 cumulative driver-green with ~33 spare
    # slots; fill the remainder with the OLDEST previously-green rows
    # (rounds 1-2 vintage) so no row ages past ~6 rounds.
    # (Historical window contents superseded; see git history of this
    # file for the audit trail.)
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
