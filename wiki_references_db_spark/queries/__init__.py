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
    # training-data pipeline family (unverified by driver in round 1)
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "text_quality_score",
    "lang_id_heuristic",
    "token_count_regex",
    "doc_fingerprint",
    "ann_cosine_topk",
    "ann_lsh_bucketed",
    "embedding_norm_stats",
    "dedup_embedding_cosine",
    "ann_ivf_probe",
    "sketch_kmv_distinct",
    "split_train_val_test",
    # new this round: curation family
    "dedup_cluster_cc",
    "quality_repetition_stats",
    "pii_redact",
    "decontaminate_ngram_overlap",
    "bm25_rank_no_log",
    # multimodal + streaming (unverified by driver in round 1 + new)
    "multimodal_decode_stats",
    "stream_events_tumbling",
    "stream_stateful_lifecycle",
    "stream_sliding_counts",
    "stream_join_clicks_views",
    "stream_dedup_keys",
    # wiki citation family (incl. round-1-unverified wiki_other_articles)
    "wiki_citations_at_revision",
    "wiki_revisions_with_counts",
    "wiki_citation_history",
    "wiki_template_params_pivot",
    "wiki_template_report",
    "wiki_web_resource_lookup",
    "wiki_other_articles",
    # new this round
    "serving_article_citations",
    "serving_order_null_quirk",
    # changed this round (need fresh driver evidence)
    "events_sessionize",
    "pagination_offset",
    "asof_join_clicks",
    "salted_skew_aggregate",
    # representative relational core (the rest of round 1's green core —
    # merge_non_null, join_inner_3way, left_join_count, semi_join_exists,
    # anti_join_absent, upsert_coalesce, insert_if_absent, union_distinct
    # — rotated out this round to make room; all unchanged, all locally
    # oracle-checked)
    "q1_pricing_summary",
    "filter_project_predicates",
    "distinct_on_survivor",
    "broadcast_lookup_join",
    "hydrate_collect_list",
    "window_lead_next",
    "topk_per_group",
    "topk_global",
    "scalar_derivations",
    "events_lifecycle",
    "null_aware_not_in",
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
        serving_query,
        streams,
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
