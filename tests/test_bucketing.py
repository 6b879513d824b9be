"""Bucketed tables join WITHOUT a shuffle: the scale strategy for
repeated fact-fact joins (plans/bucketing.py)."""

import pytest
from pyspark.sql import functions as F

from wiki_references_db_spark.plans.bucketing import write_bucketed
from wiki_references_db_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


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
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", old_aqe)
    else:
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")


def test_bucketed_join_has_no_exchange(spark, tmp_path, no_broadcast):
    orders = load_table(spark, SF_DIR, "orders")
    lineitem = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    write_bucketed(
        orders, "orders_b", ["o_orderkey"], 4, path=str(tmp_path / "orders_b")
    )
    write_bucketed(
        lineitem,
        "lineitem_b",
        ["l_orderkey"],
        4,
        path=str(tmp_path / "lineitem_b"),
    )
    try:
        joined = spark.table("lineitem_b").join(
            spark.table("orders_b"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        # and it computes the same join as the unbucketed plan
        expected = lineitem.join(
            orders, F.col("l_orderkey") == F.col("o_orderkey")
        ).count()
        assert joined.count() == expected
    finally:
        spark.sql("DROP TABLE IF EXISTS lineitem_b")
        spark.sql("DROP TABLE IF EXISTS orders_b")


def test_bucketed_groupby_has_no_exchange(spark, tmp_path):
    """Aggregation on the bucket key also skips its shuffle: the bucket
    layout satisfies the required hash distribution."""
    orders = load_table(spark, SF_DIR, "orders")
    write_bucketed(
        orders, "orders_gb", ["o_custkey"], 4, path=str(tmp_path / "orders_gb")
    )
    try:
        agg = (
            spark.table("orders_gb")
            .groupBy("o_custkey")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert agg.count() == orders.select("o_custkey").distinct().count()
    finally:
        spark.sql("DROP TABLE IF EXISTS orders_gb")


def test_band_index_bucketed_probe_shuffles_only_delta(
    spark, tmp_path, no_broadcast
):
    """The streaming-dedup scale claim (queries/streams.py
    stream_dedup_vs_corpus docstring): persist the static corpus's LSH
    band index BUCKETED by its probe keys, and each micro-batch's
    candidate join shuffles ONLY the delta side — the executed plan has
    exactly one Exchange (over the batch's band rows), none over the
    bucketed corpus scan."""
    from wiki_references_db_spark.queries.training import (
        _band_rows_spark,
        _docs_with_shingles,
    )

    sf_dir = "/root/testdata/sf0.001"
    ds = _docs_with_shingles(spark, sf_dir).filter(F.size("shingles") > 0)
    corpus = _band_rows_spark(ds.filter(F.col("doc_id") % 10 != 0)).select(
        F.col("doc_id").alias("corpus_doc"), "band_id", "band_key"
    )
    write_bucketed(
        corpus,
        "band_index_b",
        ["band_id", "band_key"],
        4,
        path=str(tmp_path / "band_index_b"),
    )
    try:
        delta = _band_rows_spark(ds.filter(F.col("doc_id") % 10 == 0)).select(
            F.col("doc_id").alias("new_doc"), "band_id", "band_key"
        )
        probe = delta.join(
            spark.table("band_index_b"), ["band_id", "band_key"]
        ).select("new_doc", "corpus_doc")
        plan = probe._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan
        assert plan.count("Exchange hashpartitioning") == 1, plan
        # The one exchange keys on the DELTA side's band rows.
        ex = plan[plan.index("Exchange hashpartitioning"):].splitlines()[0]
        assert "band_id" in ex and "band_key" in ex, ex
        # Values identical to the unbucketed equi-join.
        expected = delta.join(corpus, ["band_id", "band_key"]).select(
            "new_doc", "corpus_doc"
        )
        assert probe.count() == expected.count() > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS band_index_b")


def test_cell_index_bucketed_probe_shuffles_only_delta(
    spark, tmp_path, no_broadcast
):
    """The streaming-SemDeDup scale claim (queries/streams.py
    stream_semdedup_vs_corpus docstring): persist the static corpus's
    cell index BUCKETED by the cell key, and each micro-batch's probe
    join shuffles ONLY the delta side — exactly one Exchange (over the
    batch's assigned rows), none over the bucketed corpus scan.  The
    delta is pinned first (localCheckpoint), matching foreachBatch
    reality where the micro-batch arrives materialized."""
    from wiki_references_db_spark.queries.training import _semdedup_assign

    sf_dir = "/root/testdata/sf0.001"
    e, assign = _semdedup_assign(spark, sf_dir)
    mem = assign.join(e.select("vec_id", "embedding"), "vec_id")
    corpus = mem.filter(~(F.col("vec_id") % 10 == 3)).select(
        F.col("cell").alias("cell_c"), F.col("embedding").alias("ec")
    )
    write_bucketed(
        corpus,
        "cell_index_b",
        ["cell_c"],
        4,
        path=str(tmp_path / "cell_index_b"),
    )
    try:
        delta = (
            mem.filter(F.col("vec_id") % 10 == 3)
            .select("vec_id", "cell", F.col("embedding").alias("eb"))
            .localCheckpoint(eager=True)
        )
        probe = delta.join(
            spark.table("cell_index_b"),
            F.col("cell") == F.col("cell_c"),
        ).select("vec_id", "cell")
        plan = probe._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan
        assert plan.count("Exchange hashpartitioning") == 1, plan
        # The one exchange keys on the DELTA side's cell assignment.
        ex = plan[plan.index("Exchange hashpartitioning"):].splitlines()[0]
        assert "cell#" in ex and "cell_c" not in ex, ex
        # Values identical to the unbucketed equi-join.
        expected = delta.join(
            corpus, F.col("cell") == F.col("cell_c")
        ).select("vec_id", "cell")
        assert probe.count() == expected.count() > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS cell_index_b")
        spark.catalog.clearCache()


def test_secondary_sort_keys_order_bucket_files(spark, tmp_path):
    """sort_keys may extend the bucket keys (ADVICE r9): histories
    bucketed on the instance key keep a (key, revision) within-file
    sort so row-group min/max stats skip on the secondary column.
    Verified on the actual files, not just the catalog entry."""
    import glob

    lineitem = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    write_bucketed(
        lineitem,
        "lineitem_ss",
        ["l_orderkey"],
        4,
        path=str(tmp_path / "lineitem_ss"),
        sort_keys=["l_orderkey", "l_linenumber"],
    )
    try:
        files = glob.glob(str(tmp_path / "lineitem_ss" / "*.parquet"))
        assert files
        for f in files:
            rows = (
                spark.read.parquet(f)
                .select("l_orderkey", "l_linenumber")
                .collect()
            )
            pairs = [(r.l_orderkey, r.l_linenumber) for r in rows]
            assert pairs == sorted(pairs), f
    finally:
        spark.sql("DROP TABLE IF EXISTS lineitem_ss")


def test_sort_keys_must_extend_bucket_keys(spark):
    orders = load_table(spark, SF_DIR, "orders")
    with pytest.raises(ValueError, match="must extend the bucket keys"):
        write_bucketed(
            orders, "orders_bad", ["o_orderkey"], 4,
            sort_keys=["o_custkey", "o_orderkey"],
        )


def test_overwriting_existing_catalog_table_warns(spark, tmp_path):
    """Two warehouses sharing a table name in one session: the second
    write replaces the first's catalog entry — write_bucketed warns so
    the silent replacement (ADVICE r9) is observable."""
    orders = load_table(spark, SF_DIR, "orders")
    write_bucketed(
        orders, "orders_ow", ["o_orderkey"], 4, path=str(tmp_path / "a")
    )
    try:
        with pytest.warns(UserWarning, match="overwriting existing catalog table"):
            write_bucketed(
                orders, "orders_ow", ["o_orderkey"], 4, path=str(tmp_path / "b")
            )
    finally:
        spark.sql("DROP TABLE IF EXISTS orders_ow")
