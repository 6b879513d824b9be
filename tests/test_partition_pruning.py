"""Partitioned writes prune at the directory level: the layout strategy
for low-cardinality filter columns at scale (plans/stage.py writes
partitionBy the same way)."""

from pyspark.sql import functions as F

from wiki_references_db_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_partitioned_read_prunes_directories(spark, tmp_path):
    events = load_table(spark, SF_DIR, "events")
    out = str(tmp_path / "events_by_type")
    events.write.mode("overwrite").partitionBy("event_type").parquet(out)

    filtered = spark.read.parquet(out).filter(F.col("event_type") == "click")
    plan = filtered._jdf.queryExecution().executedPlan().toString()

    # The predicate must land in PartitionFilters (directory pruning),
    # not in PushedFilters (row-group evaluation after listing).
    assert "PartitionFilters: [" in plan
    pf = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "event_type" in pf, plan

    expected = events.filter(F.col("event_type") == "click").count()
    assert filtered.count() == expected
