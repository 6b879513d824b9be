"""Physical-plan regression tests: lock in the scale-critical plan
properties (pushdown, broadcast, no nested-loop/cartesian joins) so a
refactor that silently degrades a plan fails CI, not the cluster."""

import re

import pytest

from wiki_references_db_spark.queries import all_queries

SF_DIR = "/root/testdata/sf0.001"


def _plan(spark, name):
    df = all_queries()[name](spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


def test_q6_pushes_all_filters_and_prunes_columns(spark):
    plan = _plan(spark, "q6_forecast_revenue")
    scan = plan[plan.index("FileScan parquet") :]
    pushed = scan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, pushed
    schema = scan.split("ReadSchema: ", 1)[1].splitlines()[0]
    read_cols = re.findall(r"(\w+):", schema)
    assert set(read_cols) <= {
        "l_quantity", "l_extendedprice", "l_discount", "l_shipdate", "struct",
    }, schema


def test_q3_broadcasts_the_dimension(spark):
    plan = _plan(spark, "q3_shipping_priority")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_ann_lsh_generates_candidates_before_scoring(spark):
    plan = _plan(spark, "ann_lsh_bucketed")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_dedup_minhash_has_no_cartesian(spark):
    plan = _plan(spark, "dedup_minhash_lsh")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_topk_global_is_take_ordered(spark):
    plan = _plan(spark, "topk_global")
    assert "TakeOrderedAndProject" in plan


def test_topk_per_group_uses_window_group_limit(spark):
    plan = _plan(spark, "topk_per_group")
    assert "WindowGroupLimit" in plan


@pytest.mark.parametrize(
    "name",
    ["wiki_citations_at_revision", "serving_article_citations"],
)
def test_flagship_queries_have_no_cartesian(spark, name):
    plan = _plan(spark, name)
    assert "CartesianProduct" not in plan
