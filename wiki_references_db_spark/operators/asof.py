"""As-of (point-in-time) join — an operator Spark's DataFrame API lacks
natively, composed from union + a running ``last(ignorenulls)`` window
(SURVEY §2.4 notes the reference has no as-of joins; this is the
engine's forward-looking form, the standard Spark composition).

Semantics: for every left row, attach the payload of the LATEST right
row with the same key and ``right_time <= left_time`` (DuckDB/kdb ASOF
LEFT JOIN).  Physical shape: one shuffle on the key (both sides
co-partitioned by the union), one sort per partition — no range
cross-product, no per-left-row probe, so it scales linearly with
rows-per-key and is safe at billions of rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_IS_RIGHT = "__is_right"
_T = "__t"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
) -> DataFrame:
    """Left as-of join.  ``right``'s non-key, non-time columns become the
    attached payload (null when no right row is at or before the left
    row's time).  Column names must not collide between sides (rename
    beforehand)."""
    payload = [c for c in right.columns if c not in (key, right_time)]

    l_tagged = left.withColumn(_T, F.col(left_time)).withColumn(
        _IS_RIGHT, F.lit(0)
    )
    for c in payload:
        l_tagged = l_tagged.withColumn(c, F.lit(None).cast(dict(right.dtypes)[c]))

    r_tagged = right.withColumn(_T, F.col(right_time)).withColumn(
        _IS_RIGHT, F.lit(1)
    )
    for c in left.columns:
        if c != key:
            r_tagged = r_tagged.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    r_tagged = r_tagged.drop(right_time)

    cols = [key, _T, _IS_RIGHT] + [c for c in left.columns if c != key] + payload
    unioned = l_tagged.select(*cols).unionByName(r_tagged.select(*cols))

    # Rows ordered by time; at equal timestamps the right row sorts
    # FIRST (is_right desc) so right_time == left_time matches, per ASOF
    # semantics.  The running last(ignorenulls) carries the most recent
    # right payload forward within each key.
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(_T).asc(), F.col(_IS_RIGHT).desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned
    for c in payload:
        filled = filled.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return filled.filter(F.col(_IS_RIGHT) == 0).drop(_IS_RIGHT, _T)
