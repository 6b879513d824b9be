"""Bucketed warehouse write path (SURVEY §7.3 risk 5): the two
instance-keyed fact tables land bucketed on their co-location key, so
the flagship serving path's history join and lifecycle aggregation plan
with ZERO Exchange on the bucketed side — the write pays the 28.8B-row
shuffle once instead of every serving query."""

import os

import pytest
from pyspark.sql import functions as F

from wiki_references_db_spark.plans.dedup_tables import dedup_staging
from wiki_references_db_spark.plans.stage import stage_revisions
from wiki_references_db_spark.plans.warehouse import (
    build_warehouse,
    read_warehouse,
    write_warehouse,
)
from wiki_references_db_spark.queries import serving
from wiki_references_db_spark.sources.mwrev import read_mwrev_bundles, write_mwrev_zst
from tests.test_wiki_pipeline import FIXTURE

BUCKETS = 4
PREFIX = "whbtest"


@pytest.fixture(scope="module")
def warehouses(spark, tmp_path_factory):
    """(plain dict-of-DataFrames warehouse, bucketed-read warehouse)."""
    bundle_dir = tmp_path_factory.mktemp("bundles_whb")
    write_mwrev_zst(os.path.join(bundle_dir, "fixture-00.mwrev.zst"), FIXTURE)
    raw = read_mwrev_bundles(spark, str(bundle_dir))
    deduped = dedup_staging(stage_revisions(raw, domain="en.wikipedia.org"))
    w = build_warehouse(deduped)
    out_dir = str(tmp_path_factory.mktemp("wh_bucketed"))
    write_warehouse(
        w, out_dir, history_buckets=BUCKETS, bucketed=True, table_prefix=PREFIX
    )
    plain = {k: v.localCheckpoint() for k, v in w.items()}
    bucketed = read_warehouse(spark, out_dir, table_prefix=PREFIX)
    yield plain, bucketed
    for name in ("citation_histories", "citation_instances"):
        spark.sql(f"DROP TABLE IF EXISTS {PREFIX}_{name}")


@pytest.fixture
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        old_aqe = spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold")
    except Exception:
        old_aqe = None
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    if old_aqe is not None:
        spark.conf.set(
            "spark.sql.adaptive.autoBroadcastJoinThreshold", old_aqe
        )
    else:
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_history_instance_join_is_shuffle_free(warehouses, no_broadcast):
    """The dominant serving join — citation_histories ⋈
    citation_instances on the instance id — plans as a SortMergeJoin
    with NO Exchange on either side when both tables are read through
    the bucketed catalog entries."""
    plain, bucketed = warehouses
    joined = bucketed["citation_histories"].join(
        bucketed["citation_instances"],
        F.col("citation_instance_id") == F.col("id"),
    )
    plan = _executed_plan(joined)
    assert "SortMergeJoin" in plan, plan
    assert "Exchange" not in plan, plan
    expected = plain["citation_histories"].join(
        plain["citation_instances"],
        F.col("citation_instance_id") == F.col("id"),
    )
    assert joined.count() == expected.count()


def test_lifecycle_aggregation_is_exchange_free(warehouses, no_broadcast):
    """The flagship's lifecycle stats (groupBy citation_instance_id over
    the history table) need no Exchange over the bucketed scan."""
    _, bucketed = warehouses
    stats = bucketed["citation_histories"].groupBy("citation_instance_id").agg(
        F.min("revision_id").alias("first_rev"),
        F.max("revision_id").alias("last_rev"),
        F.count(F.lit(1)).alias("n"),
    )
    plan = _executed_plan(stats)
    assert "HashAggregate" in plan or "SortAggregate" in plan, plan
    assert "Exchange" not in plan, plan
    assert stats.count() > 0


def test_flagship_identical_over_bucketed_warehouse(warehouses):
    """Reference semantics unchanged: article_citations over the
    bucketed-read warehouse row-for-row equals the in-memory warehouse
    result (hydrated mode, the full flagship surface)."""
    plain, bucketed = warehouses
    got = serving.article_citations(bucketed, 100, revision_id=1002)
    want = serving.article_citations(plain, 100, revision_id=1002)
    assert sorted(got.columns) == sorted(want.columns)
    cols = sorted(got.columns)

    def rows_as_json(df):
        # MAP-typed hydration columns rule out exceptAll; a canonical
        # JSON rendering of each row compares the full nested payload.
        return sorted(
            r["j"]
            for r in df.select(
                F.to_json(F.struct(*cols)).alias("j")
            ).collect()
        )

    got_rows, want_rows = rows_as_json(got), rows_as_json(want)
    assert got_rows == want_rows
    assert len(got_rows) > 0


def test_flagship_plans_zero_instance_exchange_over_bucketed(warehouses):
    """The FLAGSHIP serving query end-to-end (article_citations — the
    path behind wiki_citations_at_revision and the WSGI shell) over the
    bucketed-catalog warehouse plans its history work with ZERO
    Exchange on the instance key: the lifecycle aggregation
    (groupBy citation_instance_id) and the history⋈instance join ride
    the bucket distribution straight through the broadcast semi-joins.
    The same query over a plain (unbucketed) warehouse DOES shuffle on
    that key — pinning that the assertion discriminates, not that the
    plan happens to be small."""
    plain, bucketed = warehouses
    shuffle_marker = "hashpartitioning(citation_instance_id"

    got = serving.article_citations(bucketed, 100, revision_id=1002)
    plan = _executed_plan(got)
    assert shuffle_marker not in plan, plan

    want = serving.article_citations(plain, 100, revision_id=1002)
    assert shuffle_marker in _executed_plan(want)


def test_unbucketed_read_of_bucketed_files_still_works(warehouses, spark, tmp_path):
    """The bucketed layout degrades gracefully: the same directory read
    WITHOUT the catalog prefix is an ordinary parquet scan with
    identical rows (a consumer without the metastore loses only the
    co-location proof, not correctness)."""
    plain, bucketed = warehouses
    # bucketed["citation_histories"] is a catalog table backed by files
    # under the warehouse out_dir; re-read those files as plain parquet.
    location = (
        spark.sql(f"DESCRIBE FORMATTED {PREFIX}_citation_histories")
        .filter(F.col("col_name") == "Location")
        .first()["data_type"]
    )
    raw = spark.read.parquet(location)
    assert raw.count() == bucketed["citation_histories"].count()


def test_bucketed_histories_keep_revision_subsort(warehouses, spark):
    """ADVICE r9: the bucketed default must retain the plain path's
    (citation_instance_id, revision_id) secondary sort — the catalog
    entry records both sort columns, so revision-bounded history scans
    keep their row-group skipping."""
    sort_row = (
        spark.sql(f"DESCRIBE FORMATTED {PREFIX}_citation_histories")
        .filter(F.col("col_name") == "Sort Columns")
        .first()
    )
    assert sort_row is not None
    assert "citation_instance_id" in sort_row["data_type"], sort_row
    assert "revision_id" in sort_row["data_type"], sort_row
