"""Scalable total-order operators: global row numbers, NTILE, and
running sums WITHOUT a single-partition window.

A bare ``Window.orderBy(...)`` (no partitionBy) moves the entire
relation through ONE task — correct at test scale, a scale-killer at
100 TB ("No Partition Defined for Window" warning).  The operators here
produce bit-identical results with bounded parallelism:

1. ``repartitionByRange`` on the order keys co-locates contiguous key
   ranges (P-way parallel sort, Spark's own global-sort machinery);
2. a window PARTITIONED by the range-partition id computes per-partition
   row numbers / running sums;
3. per-partition totals (P scalars — a parameter-sized collect, same
   class as the 1-row fetches in queries/citations.py) become literal
   prefix offsets added map-side.

Exactness contract: row numbers and counts are integers (always exact);
running sums are exact iff the summed type is exact (decimal / integral
— the callers sum DECIMAL(28,10)).  Do NOT feed IEEE doubles through
``global_running_sum`` expecting bit-equality with a sequential scan:
float addition is not associative.

The ranged frame is persist()ed before the offsets job: range boundaries
come from per-RDD-id seeded sampling, so an unpinned re-evaluation in
the second job could re-draw boundaries and misalign the offsets.  The
cache is parameter-small relative to the input (callers apply this to
already-aggregated relations) and is released by the standard
``spark.catalog.clearCache()`` the oracle/bench harnesses run per query.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PID = "__range_pid"


def _ranged(df: DataFrame, order_cols: list[Column], num_partitions: int | None):
    spark = df.sparkSession
    p = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    return df.repartitionByRange(p, *order_cols).withColumn(
        _PID, F.spark_partition_id()
    ).persist()


def _offset_expr(offsets: dict[int, Column]) -> Column:
    """pid -> literal offset, as a broadcast-free scalar expression."""
    expr = None
    for pid, lit in offsets.items():
        cond = F.col(_PID) == pid
        expr = F.when(cond, lit) if expr is None else expr.when(cond, lit)
    return expr if expr is not None else F.lit(0)


def global_row_number(
    df: DataFrame,
    order_cols: list[Column],
    out: str = "rn",
    num_partitions: int | None = None,
) -> tuple[DataFrame, int]:
    """``row_number() OVER (ORDER BY order_cols)`` with P-way
    parallelism.  Returns (frame + ``out`` column, total row count);
    ``order_cols`` must be a total order for the result to be
    deterministic (callers append a unique tiebreak key)."""
    ranged = _ranged(df, order_cols, num_partitions)
    counts = {
        r[_PID]: r["n"]
        for r in ranged.groupBy(_PID).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = F.lit(acc)
        acc += counts[pid]
    w = Window.partitionBy(_PID).orderBy(*order_cols)
    result = ranged.withColumn(
        out, (F.row_number().over(w) + _offset_expr(offsets)).cast("long")
    ).drop(_PID)
    return result, acc


def ntile_over(
    df: DataFrame,
    order_cols: list[Column],
    k: int,
    out: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """``NTILE(k) OVER (ORDER BY order_cols)`` via ``global_row_number``
    plus the closed-form NTILE bucket function: with N rows, the first
    ``N % k`` buckets hold ``N // k + 1`` rows and the rest ``N // k``
    — the SQL-standard semantics both Spark and DuckDB implement, so the
    result is bit-identical to the built-in (and to a DuckDB oracle)
    while the sort stays P-way parallel."""
    rn_col = f"__rn_{out}"
    ranked, n = global_row_number(df, order_cols, out=rn_col, num_partitions=num_partitions)
    base, rem = divmod(n, k)
    rn = F.col(rn_col)
    if base == 0:
        bucket = rn
    else:
        head = rem * (base + 1)
        bucket = F.when(
            rn <= head, F.floor((rn - 1) / (base + 1)) + 1
        ).otherwise(rem + F.floor((rn - head - 1) / base) + 1)
    return ranked.withColumn(out, bucket.cast("int")).drop(rn_col)


def global_running_sum(
    df: DataFrame,
    order_cols: list[Column],
    value: Column,
    out: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """``SUM(value) OVER (ORDER BY order_cols ROWS UNBOUNDED PRECEDING)``
    with P-way parallelism: per-partition running sums plus literal
    prefix offsets from the per-partition totals.  ``value`` must be an
    exact type (decimal/integral) — offsets are re-associated across
    partitions, which is only value-preserving for exact arithmetic."""
    val_col = f"__val_{out}"
    ranged = _ranged(df.withColumn(val_col, value), order_cols, num_partitions)
    totals = {
        r[_PID]: r["t"]
        for r in ranged.groupBy(_PID).agg(F.sum(val_col).alias("t")).collect()
    }
    # Offsets carry the exact running total of all PRIOR partitions,
    # cast to the same type SUM produces so the map-side addition stays
    # in exact arithmetic end-to-end.
    sum_type = ranged.select(F.sum(val_col).alias("s")).schema[0].dataType.simpleString()
    offsets, acc = {}, None
    for pid in sorted(totals):
        offsets[pid] = (F.lit(0) if acc is None else F.lit(str(acc))).cast(sum_type)
        t = totals[pid]
        if t is not None:
            acc = t if acc is None else acc + t
    w = (
        Window.partitionBy(_PID)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return ranged.withColumn(
        out, F.sum(val_col).over(w) + _offset_expr(offsets)
    ).drop(_PID, val_col)
