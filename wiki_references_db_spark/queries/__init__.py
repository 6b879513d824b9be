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
    # THIS WINDOW (round 10, executing the TODO written at round-9
    # start): flagship, the SIX round-10 additions
    # (table_profile_stats_approx — registered without a SQL oracle,
    # so its driver row is the weaker rows+schema check; the value
    # contract is pinned by tests/test_profiling_approx.py — plus
    # dedup_semdedup_cells / dedup_semdedup_incremental /
    # stream_semdedup_vs_corpus / cell_label_purity /
    # orc_roundtrip_stats, all five with full SQL oracles), ALL 35
    # remaining round-5-vintage rows, then 8 of the 49 round-6-vintage
    # rows chosen for family spread (TPC-H, wiki serving, dedup,
    # graph).  After this window lands, latest-row ages are
    # {r10: 50, r9: 49, r8: 49, r7: 49, r6: 41} — nothing older than
    # round 6.  Round-11 TODO: refresh the 41 remaining r6-vintage
    # rows (exactly, recomputed from CORRECTNESS_r01..r09
    # minus this window: ann_ivf_pq_rerank, basket_part_pairs,
    # bigram_lm_doc_score, bloom_prefilter_join_stats,
    # cascade_delete_impact, corpus_dup_span_stats,
    # csv_roundtrip_stats, dedup_paragraphs_global,
    # dynamic_partition_pruning_stats, embedding_coreset_per_cell,
    # event_type_trigrams, events_seasonal_anomaly,
    # events_sessionize, graph_bfs_converged, graph_weighted_sssp,
    # interval_merge_coverage, join_cardinality_stats,
    # jsonl_roundtrip_stats, k_anonymity_groups,
    # multimodal_phash_dedup, ols_normal_equations, ols_per_group,
    # partitioned_layout_prune_stats, phash_recall_eval,
    # priority_weighted_sample, q21_blocking_supplier,
    # q5_local_supplier_volume, q7_volume_shipping, rare_token_score,
    # schema_evolution_merge_stats, sketch_ams_f2,
    # sketch_hll_sliding_union, sketch_sample_quantiles,
    # source_overlap_matrix, stream_join_full_outer,
    # stream_join_left_outer, stream_join_then_window,
    # target_encode_oof, token_simpson_diversity,
    # triangle_count_cosupplier, vocab_encode_docs)
    # + flagship + any round-11 additions (semdedup_recall_eval is
    # already registered, never driver-checked — it MUST take a slot)
    # + the oldest r7 rows to fill 50.
    "wiki_citations_at_revision",
    # --- NEW in round 10 (never-checked takes priority) ---
    "table_profile_stats_approx",
    "dedup_semdedup_cells",
    "dedup_semdedup_incremental",
    "stream_semdedup_vs_corpus",
    "cell_label_purity",
    "orc_roundtrip_stats",
    # --- round-5-vintage refresh (all 35 remaining) ---
    "ann_ivf_recall",
    "ann_lsh_recall",
    "bm25_rank_no_log",
    "corpus_mix_rebalance",
    "customers_rfm_segments",
    "data_quality_checks",
    "decontaminate_ngram_overlap",
    "events_cohort_retention",
    "events_daily_active_users",
    "events_ewma_per_user",
    "events_funnel_sessions",
    "events_gap_fill_hours",
    "events_inter_arrival_stats",
    "events_json_extract_stats",
    "events_mad_outliers",
    "events_value_histogram",
    "events_zscore_outliers",
    "fuzzy_match_blocked",
    "lineitem_percent_rank_sample",
    "multimodal_audio_stats",
    "multimodal_feature_extract",
    "nation_customer_rollcall",
    "orders_pareto_concentration",
    "orders_priority_transitions",
    "orders_yoy_growth",
    "quality_repetition_stats",
    "salted_skew_aggregate",
    "scd2_order_status_intervals",
    "sequence_pack_greedy",
    "sequence_pack_sharded",
    "sketch_bloom_membership",
    "sketch_countmin_heavy",
    "stream_dedup_keys",
    "stream_upsert_foreachbatch",
    "window_moving_avg_events",
    # --- round-6-vintage refresh (8 of 49, family spread) ---
    "q1_pricing_summary",
    "q6_forecast_revenue",
    "q18_large_volume_customer",
    "broadcast_lookup_join",
    "pagination_limit_cap",
    "dedup_jaccard_prefix_filter",
    "dedup_simhash",
    "graph_bfs_khop",
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
