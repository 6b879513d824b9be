"""Z-order (Morton) clustering for multi-dimensional data skipping.

Parquet prunes row groups with per-column min/max stats, but a layout
sorted by one column only skips predicates on THAT column.  Interleaving
the bit patterns of two (or more) bucketed dimensions into one Morton
code and sorting by it bounds every block in BOTH dimensions at once, so
2-D range predicates (customer range x date range) skip most of the
file — the standard lakehouse technique (Delta/Iceberg `ZORDER BY`),
re-expressed here as a pure column expression + ordinary sorted write.

The interleave is a fixed shift/mask expression tree (16 terms for
8 bits/dim) that whole-stage codegen compiles to straight-line long
arithmetic — no UDF, no shuffle beyond the final range sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BITS = 8  # bits per dimension -> 16-bit Morton code


def morton_interleave8(x: Column, y: Column) -> Column:
    """Morton code of two 8-bit bucket columns: bit i of ``x`` lands at
    position 2i+1, bit i of ``y`` at position 2i (x-major)."""
    terms = []
    for i in range(BITS):
        terms.append(
            F.shiftleft(F.shiftright(x.cast("long"), i).bitwiseAND(1), 2 * i + 1)
        )
        terms.append(
            F.shiftleft(F.shiftright(y.cast("long"), i).bitwiseAND(1), 2 * i)
        )
    code = terms[0]
    for t in terms[1:]:
        code = code.bitwiseOR(t)
    return code


def morton_interleave8_sql(x_expr: str, y_expr: str) -> str:
    """The identical interleave as engine-neutral SQL text (DuckDB
    dialect: ``>> << & |`` on BIGINT) over two already-bucketed integer
    expressions."""
    terms = []
    for i in range(BITS):
        terms.append(f"((CAST({x_expr} AS BIGINT) >> {i}) & 1) << {2 * i + 1}")
        terms.append(f"((CAST({y_expr} AS BIGINT) >> {i}) & 1) << {2 * i}")
    return "(" + " | ".join(f"({t})" for t in terms) + ")"


def zorder_bucket(col: Column, lo: Column, hi: Column) -> Column:
    """Scale ``col`` into the [0, 2^BITS) bucket range given broadcast
    min/max bounds (inclusive), clamping the top edge."""
    span = (hi - lo + 1).cast("double")
    b = F.floor((col - lo).cast("double") * (1 << BITS) / span).cast("long")
    return F.least(F.greatest(b, F.lit(0)), F.lit((1 << BITS) - 1))


def write_zordered(
    df: DataFrame,
    path: str,
    x: Column,
    y: Column,
    max_records_per_file: int = 50_000,
) -> None:
    """Write ``df`` clustered by the Morton code of two bucketed
    dimensions: a range-partitioned sort on the code (parallel — no
    single-task global sort; repartitionByRange samples split points),
    then a parquet write whose per-file/per-row-group min/max stats are
    tight boxes in both dimensions."""
    coded = df.withColumn("__z", morton_interleave8(x, y))
    (
        coded.repartitionByRange(max(df.rdd.getNumPartitions(), 1), "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .parquet(path)
    )
