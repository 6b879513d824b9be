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
    # THIS WINDOW (round 13, executing the TODO written at round-12
    # close, verbatim): flagship; the TWO rows deferred from the r7
    # refresh at round 12 (q12_priority_class_counts,
    # q13_customer_distribution — they LEAD as mandated); the SIX
    # round-12 additions that were registered after the r12 window was
    # pinned and therefore never driver-checked (mandated slots); the
    # THREE round-13 additions (decontam_recall_eval,
    # rrf_hybrid_generators, mixture_temperature_epochs — registered
    # BEFORE this window was pinned, so they take slots now per the
    # never-checked-first policy instead of waiting a round); then 38
    # of the 48 round-8-vintage rows.
    # DEFERRED TO ROUND 14 (must LEAD the r14 window): the TEN
    # remaining r8-vintage rows — distinct_full_row,
    # distinct_on_survivor, filter_project_predicates, merge_non_null,
    # pagination_offset, semi_join_exists, sql_grouping_sets,
    # topk_global, upsert_coalesce, window_lead_next — chosen as the
    # lowest-risk deferrals (single-concept relational/aggregate ops,
    # code untouched since r2-r4, locally parity-checked at three SFs
    # every round).  After this window lands, latest-row ages are
    # {r13: 50, r12: 44, r11: 49, r10: 48, r9: 49, r8: 10, r7: 0} over
    # the 255 registrations that existed when this window was pinned.
    # SEVENTEEN further round-13 queries were registered AFTER the pin
    # (dup_span_maximal_runs, embedding_matryoshka_recall,
    # adamic_adar_links, phrase_tag_dictionary, source_length_ks,
    # stream_length_drift_probe, mmr_diversify_topk,
    # simhash_hamming_pairs, stream_simhash_vs_corpus,
    # perceptron_quality_train, auc_rank_eval, confusion_matrix_eval,
    # pr_curve_points, stream_perceptron_scores,
    # labeler_agreement_kappa, decision_stump_train,
    # fim_split_transform) — locally
    # parity-checked at all three SFs, never driver-checked, MANDATED
    # r14 slots per the never-checked-first policy.
    # Round-14 TODO: flagship + the 10 deferred r8 rows above + the 17
    # post-pin round-13 additions + any round-14 additions (never
    # driver-checked, mandated slots) + the oldest r9-vintage rows
    # until the 50 slots are full.
    "wiki_citations_at_revision",
    # --- deferred r7 rows (lead, as the r12 window comment mandates) ---
    "q12_priority_class_counts",
    "q13_customer_distribution",
    # --- never driver-checked: round-12 additions (mandated slots) ---
    "dedup_winnowing_fingerprints",
    "winnowing_recall_eval",
    "dedup_cdc_chunks",
    "stream_cdc_chunks_vs_corpus",
    "semantic_decontaminate_lsh",
    "rrf_hybrid_rank",
    # --- never driver-checked: round-13 additions ---
    "decontam_recall_eval",
    "rrf_hybrid_generators",
    "mixture_temperature_epochs",
    # --- round-8-vintage refresh (38 of 48; 10 deferrals named above) ---
    "ann_cosine_topk",
    "ann_ivf_probe",
    "anti_join_absent",
    "asof_join_clicks",
    "customer_priority_listagg",
    "dedup_cluster_cc",
    "dedup_exact",
    "embedding_norm_stats",
    "events_equidepth_histogram",
    "events_in_incident_windows",
    "events_locf_carry_forward",
    "events_range_frame_1h",
    "events_rolling_wau",
    "events_time_weighted_avg",
    "events_value_trend_ols",
    "hydrate_collect_list",
    "importance_weighted_sample",
    "incremental_agg_merge",
    "null_aware_not_in",
    "orders_open_backlog_curve",
    "part_metrics_unpivot",
    "pii_redact",
    "q3_shipping_priority",
    "range_join_tiers",
    "scalar_derivations",
    "serving_article_citations",
    "session_first_touch_attribution",
    "sketch_kmv_distinct",
    "snapshot_diff_cdc",
    "split_train_val_test",
    "stream_dedup_vs_corpus",
    "topk_per_group",
    "wiki_other_articles",
    "wiki_template_params_pivot",
    "wiki_template_report",
    "wiki_web_resource_lookup",
    "winsorized_value_stats",
    "zorder_morton_codes",
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
