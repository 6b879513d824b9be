"""Partition-count invariance: results must be bit-identical regardless
of ``spark.sql.shuffle.partitions`` — the property that lets the same
plans run on local[32] and a 1000-executor cluster without value drift.

Every cross-partition mechanism in the repo is exercised: the
ordered-operator prefix-offset machinery (range partition count = the
shuffle conf), salted shapes, iterative graph shuffles, rank-limit
windows, and decimal-exact sums.  The shuffle conf is runtime-settable,
so the session fixture's value (8) is swapped for an unusual prime (5)
and restored afterwards.
"""

import pytest

from wiki_references_db_spark.oracle import check_query
from wiki_references_db_spark.queries import all_oracles, all_queries

# One representative per cross-partition mechanism (the full registry is
# parity-swept elsewhere; this file only needs the partition-SENSITIVE
# shapes).
SENSITIVE = [
    "customers_rfm_segments",          # distributed NTILE (ordered.py)
    "orders_pareto_concentration",     # global running sum (ordered.py)
    "sequence_pack_sharded",           # per-shard packing windows
    "pareto_skyline_parts",            # global running max (ordered.py)
    "salted_replicate_join",           # salt fan-out join
    "dedup_cluster_cc",                # iterative keyed shuffles
    "label_propagation_2iter",         # iterative mode windows
    "ann_ivf_pq_rerank",               # multi-stage rank-limit windows
    "session_first_touch_attribution", # sessionize + two-level sums
    "dedup_canonical_pick",            # cc closure + per-cluster pick
    "incremental_agg_merge",           # partial-aggregate merge order
    "numeric_corr_matrix",             # decimal moment association
    "triangle_count_cosupplier",       # neighbor-cap windows + wedge joins
    "bpe_pair_merge",                  # argmax-merge broadcast + rank windows
    "dedup_paragraphs_global",         # hash-window election + sorted reassembly
    "hierarchy_subtree_rollup",        # iterated frontier joins + decimal rollup
    "events_value_trend_ols",          # decimal cross-moment association
    "orders_open_backlog_curve",       # sweep-line prefix sum (ordered.py)
    "corpus_token_gini",               # global rank moments (ordered.py)
]


@pytest.fixture(scope="module")
def odd_partitions(spark):
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "5")
    yield spark
    spark.conf.set("spark.sql.shuffle.partitions", prev)


@pytest.mark.parametrize("name", SENSITIVE)
def test_result_invariant_under_odd_shuffle_partitions(
    odd_partitions, sf_dir, name
):
    spark = odd_partitions
    qs, os_ = all_queries(), all_oracles()
    res = check_query(spark, name, qs[name], os_[name], sf_dir)
    assert res.ok, f"{name} under shuffle.partitions=5: {res.detail}"
    spark.catalog.clearCache()
