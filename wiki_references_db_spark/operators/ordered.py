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
from wiki_references_db_spark.storage import persist_corpus

_PID = "__range_pid"


def _ranged(df: DataFrame, order_cols: list[Column], num_partitions: int | None):
    spark = df.sparkSession
    p = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    # DISK_ONLY: the full input relation, range-partitioned
    # (corpus-proportional) — read twice (per-partition counts, then the
    # offset join), exactly the budget class of a sort spill.
    return persist_corpus(
        df.repartitionByRange(p, *order_cols).withColumn(
            _PID, F.spark_partition_id()
        )
    )


def global_row_number(
    df: DataFrame,
    order_cols: list[Column],
    out: str = "rn",
    num_partitions: int | None = None,
) -> tuple[DataFrame, int]:
    """``row_number() OVER (ORDER BY order_cols)`` with P-way
    parallelism.  Returns (frame + ``out`` column, total row count);
    ``order_cols`` must be a total order for the result to be
    deterministic (callers append a unique tiebreak key).  The P prefix
    offsets attach via a broadcast hash join on the partition id — an
    O(1) probe per row, where an inline CASE chain would pay O(P)
    comparisons per row on a thousand-partition cluster."""
    ranged = _ranged(df, order_cols, num_partitions)
    counts = {
        r[_PID]: r["n"]
        for r in ranged.groupBy(_PID).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offsets, acc = [], 0
    for pid in sorted(counts):
        offsets.append((pid, acc))
        acc += counts[pid]
    w = Window.partitionBy(_PID).orderBy(*order_cols)
    result = ranged.withColumn("__rn_local", F.row_number().over(w))
    if offsets:
        off_df = df.sparkSession.createDataFrame(
            offsets, f"{_PID} int, __off long"
        )
        result = result.join(F.broadcast(off_df), _PID, "left")
    else:
        result = result.withColumn("__off", F.lit(0).cast("long"))
    result = result.withColumn(
        out,
        (F.col("__rn_local") + F.coalesce(F.col("__off"), F.lit(0))).cast("long"),
    ).drop(_PID, "__rn_local", "__off")
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
    from pyspark.sql.types import DecimalType

    val_col, syn_col = f"__val_{out}", f"__syn_{out}"
    # Pre-widen decimals to precision 38: SUM of decimal(38,s) is again
    # decimal(38,s), so the whole computation stays in ONE type and the
    # prefix offset can be injected WITHOUT a post-window addition —
    # adding two decimal(38,s) columns would exceed precision 38 and
    # make Spark silently shave a digit of scale off the result type.
    vtype = df.select(value.alias("v")).schema[0].dataType
    if isinstance(vtype, DecimalType):
        value = value.cast(DecimalType(38, vtype.scale))
    ranged = _ranged(df.withColumn(val_col, value), order_cols, num_partitions)
    totals = {
        r[_PID]: r["t"]
        for r in ranged.groupBy(_PID).agg(F.sum(val_col).alias("t")).collect()
    }
    # The exact running total of all PRIOR partitions enters partition
    # pid as a synthetic row ordered before every real row (sort key
    # syn=0), so the per-partition window SUM counts it as a summand —
    # exact arithmetic end-to-end, no precision growth.
    spark = df.sparkSession
    val_type = dict(ranged.dtypes)[val_col]
    offsets, acc = [], None
    for pid in sorted(totals):
        if acc is not None:
            offsets.append((pid, str(acc)))
        t = totals[pid]
        if t is not None:
            acc = t if acc is None else acc + t
    real = ranged.withColumn(syn_col, F.lit(1))
    if offsets:
        syn = spark.createDataFrame(offsets, f"{_PID} int, __off string").select(
            *[
                F.col("__off").cast(val_type).alias(c)
                if c == val_col
                else F.col(_PID).alias(c)
                if c == _PID
                else F.lit(None).cast(t).alias(c)
                for c, t in ranged.dtypes
            ],
            F.lit(0).alias(syn_col),
        )
        real = real.unionByName(syn)
    w = (
        Window.partitionBy(_PID)
        .orderBy(F.asc(syn_col), *order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        real.withColumn(out, F.sum(val_col).over(w))
        .filter(F.col(syn_col) == 1)
        .drop(_PID, val_col, syn_col)
    )


def global_running_max(
    df: DataFrame,
    order_cols: list[Column],
    value: Column,
    out: str,
    num_partitions: int | None = None,
    exclude_current: bool = False,
) -> DataFrame:
    """``MAX(value) OVER (ORDER BY order_cols ROWS UNBOUNDED PRECEDING
    [AND 1 PRECEDING])`` with P-way parallelism — the skyline/frontier
    primitive.  Same synthetic-prefix-row construction as
    ``global_running_sum``: the max of all PRIOR range partitions enters
    partition pid as a row ordered before every real row, so the
    per-partition window sees the global prefix.  Max is associative
    and insensitive to re-association, so any orderable type works
    (no decimal-widening dance needed).  With ``exclude_current`` the
    frame ends at 1 PRECEDING and the first global row gets NULL —
    exactly the SQL frame's semantics."""
    val_col, syn_col = f"__val_{out}", f"__syn_{out}"
    ranged = _ranged(df.withColumn(val_col, value), order_cols, num_partitions)
    totals = {
        r[_PID]: r["t"]
        for r in ranged.groupBy(_PID).agg(F.max(val_col).alias("t")).collect()
    }
    spark = df.sparkSession
    val_type = dict(ranged.dtypes)[val_col]

    # Cross-partition combine must mirror Spark's MAX semantics for
    # doubles: NaN is GREATER than everything (Python's max() is
    # NaN-poisoned in the wrong direction), and the string round-trip
    # into the synthetic row must use Spark-parseable spellings
    # ('Infinity'/'NaN' — str(float('inf'))='inf' casts to NULL).
    def _nan_greatest(a, b):
        if isinstance(a, float) and a != a:
            return a
        if isinstance(b, float) and b != b:
            return b
        return a if a >= b else b

    def _spark_literal(v) -> str:
        if isinstance(v, float):
            if v != v:
                return "NaN"
            if v == float("inf"):
                return "Infinity"
            if v == float("-inf"):
                return "-Infinity"
        return str(v)

    offsets, acc = [], None
    for pid in sorted(totals):
        if acc is not None:
            offsets.append((pid, _spark_literal(acc)))
        t = totals[pid]
        if t is not None:
            acc = t if acc is None else _nan_greatest(acc, t)
    real = ranged.withColumn(syn_col, F.lit(1))
    if offsets:
        syn = spark.createDataFrame(offsets, f"{_PID} int, __off string").select(
            *[
                F.col("__off").cast(val_type).alias(c)
                if c == val_col
                else F.col(_PID).alias(c)
                if c == _PID
                else F.lit(None).cast(t).alias(c)
                for c, t in ranged.dtypes
            ],
            F.lit(0).alias(syn_col),
        )
        real = real.unionByName(syn)
    end = -1 if exclude_current else 0
    w = (
        Window.partitionBy(_PID)
        .orderBy(F.asc(syn_col), *order_cols)
        .rowsBetween(Window.unboundedPreceding, end)
    )
    return (
        real.withColumn(out, F.max(val_col).over(w))
        .filter(F.col(syn_col) == 1)
        .drop(_PID, val_col, syn_col)
    )
