"""AQE splits skewed shuffle-join partitions at runtime — the engine's
answer to hot keys in 100 TB fact-fact joins (complementing the manual
salting in operators/skew.py, which covers aggregations and the joins
AQE can't see)."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture
def skew_tuned(spark):
    keys = [
        ("spark.sql.autoBroadcastJoinThreshold", "-1"),
        ("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1"),
        ("spark.sql.adaptive.skewJoin.enabled", "true"),
        ("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2"),
        ("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB"),
        ("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB"),
        ("spark.sql.shuffle.partitions", "8"),
    ]
    old = {}
    for k, v in keys:
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    yield
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_aqe_splits_skewed_join_partition(spark, skew_tuned):
    # 300k rows on ONE hot key vs a uniform right side: the hot key's
    # shuffle partition dwarfs the others, and AQE must mark and split
    # it (OptimizeSkewedJoin) instead of letting one task drag the stage.
    left = spark.range(0, 330_000).select(
        F.when(F.col("id") < 300_000, F.lit(7))
        .otherwise((F.col("id") % 977).cast("long"))
        .alias("k"),
        F.col("id").alias("v"),
    )
    right = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("w")
    )
    joined = left.join(right, "k")
    # Execute THIS plan instance (count()/write build their own query
    # executions and would leave this one un-finalized).
    assert len(joined.collect()) == 330_000
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "skew=true" in plan, plan[:2000]
