"""Bit-equality tests for operators/ordered.py against the built-in
single-partition window forms they replace.

The contract is exact: ``global_row_number`` / ``ntile_over`` /
``global_running_sum`` (range partition + per-partition window + exact
prefix offsets) must produce the SAME values as ``ROW_NUMBER() /
NTILE(k) / SUM() OVER (ORDER BY ...)`` — the parallel plan is an
implementation detail, not a semantics change.  Cases cover N < k,
N % k != 0, duplicate order keys with a unique tiebreak, and more
partitions than rows (empty range partitions)."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from wiki_references_db_spark.operators.ordered import (
    global_row_number,
    global_running_sum,
    ntile_over,
)


def _toy(spark, n):
    # Deterministic values with heavy ties: v cycles 0..6, id unique.
    return spark.range(n).select(
        "id", (F.col("id") % 7).alias("v"), (F.col("id") * 3 % 11).alias("w")
    )


@pytest.mark.parametrize("n,parts", [(1, 4), (3, 4), (40, 4), (100, 8)])
def test_global_row_number_matches_builtin(spark, n, parts):
    df = _toy(spark, n)
    order = [F.desc("v"), F.asc("id")]
    got, total = global_row_number(df, order, out="rn", num_partitions=parts)
    assert total == n
    want = df.withColumn("rn", F.row_number().over(Window.orderBy(*order)))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    spark.catalog.clearCache()


@pytest.mark.parametrize("n,k", [(1, 4), (3, 4), (7, 4), (40, 4), (41, 4), (100, 7)])
def test_ntile_matches_builtin(spark, n, k):
    df = _toy(spark, n)
    order = [F.asc("v"), F.asc("id")]
    got = ntile_over(df, order, k, "seg", num_partitions=4)
    want = df.withColumn("seg", F.ntile(k).over(Window.orderBy(*order)))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    spark.catalog.clearCache()


@pytest.mark.parametrize("n,parts", [(1, 4), (40, 4), (100, 8)])
def test_running_sum_matches_builtin_exact_decimal(spark, n, parts):
    df = _toy(spark, n).withColumn(
        "amt", (F.col("w") + 1).cast("decimal(28,10)") / 7
    )
    order = [F.desc("v"), F.asc("id")]
    got = global_running_sum(
        df, order, F.col("amt"), "cum", num_partitions=parts
    )
    w = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    want = df.withColumn("cum", F.sum("amt").over(w))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    spark.catalog.clearCache()


def test_running_sum_long_values(spark):
    df = _toy(spark, 60)
    got = global_running_sum(
        df, [F.asc("id")], F.col("w").cast("long"), "cum", num_partitions=6
    )
    w = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, 0)
    want = df.withColumn("cum", F.sum(F.col("w").cast("long")).over(w))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    spark.catalog.clearCache()


def test_parallel_form_has_no_global_window(spark):
    from tests.test_plan_shapes import _global_window_execs

    df = _toy(spark, 100)
    got, _ = global_row_number(df, [F.asc("v"), F.asc("id")], num_partitions=8)
    assert not _global_window_execs(spark, got)
    spark.catalog.clearCache()


@pytest.mark.parametrize("n,parts", [(1, 4), (3, 4), (40, 4), (100, 8)])
def test_running_max_matches_builtin(spark, n, parts):
    from wiki_references_db_spark.operators.ordered import global_running_max

    df = _toy(spark, n)
    order = [F.asc("w"), F.asc("id")]
    got = global_running_max(
        df, order, F.col("v"), out="m", num_partitions=parts
    )
    want = df.withColumn(
        "m",
        F.max("v").over(
            Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    spark.catalog.clearCache()


@pytest.mark.parametrize("n,parts", [(1, 4), (40, 4), (100, 8)])
def test_running_max_exclude_current_matches_builtin(spark, n, parts):
    from wiki_references_db_spark.operators.ordered import global_running_max

    df = _toy(spark, n)
    order = [F.asc("w"), F.asc("id")]
    got = global_running_max(
        df, order, F.col("v"), out="m", num_partitions=parts,
        exclude_current=True,
    )
    want = df.withColumn(
        "m",
        F.max("v").over(
            Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, -1)
        ),
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    spark.catalog.clearCache()


def test_running_max_double_with_nan_and_inf(spark):
    """Spark MAX treats NaN as greater than everything and must survive
    the cross-partition prefix round-trip ('inf'/'nan' spellings cast to
    NULL; the operator must emit 'Infinity'/'NaN')."""
    from wiki_references_db_spark.operators.ordered import global_running_max

    rows = [
        (0, 1.0), (1, float("inf")), (2, 3.0), (3, float("-inf")),
        (4, float("nan")), (5, 2.0), (6, 7.0),
    ]
    df = spark.createDataFrame(rows, "id long, v double")
    order = [F.asc("id")]
    got = global_running_max(df, order, F.col("v"), out="m", num_partitions=4)
    want = df.withColumn(
        "m",
        F.max("v").over(
            Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
        ),
    )

    def canon(rows_):
        out = []
        for r in sorted(rows_, key=lambda r: r["id"]):
            m = r["m"]
            out.append((r["id"], repr(r["v"]), repr(m)))
        return out

    assert canon(got.collect()) == canon(want.collect())
    spark.catalog.clearCache()
