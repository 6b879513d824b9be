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

Determinism: the right payload travels as ONE struct column filled by a
single ``last(ignorenulls)`` (never per-column fills, which could stitch
an output row from two different right rows when some payload values are
null), and ties on (key, right_time) are broken by ordering on the
payload struct itself — the lexicographically greatest right row wins,
identically on every run and every engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_IS_RIGHT = "__is_right"
_T = "__t"
_PAYLOAD = "__payload"


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
    right_dtypes = dict(right.dtypes)
    payload_type = (
        "struct<" + ",".join(f"{c}:{right_dtypes[c]}" for c in payload) + ">"
    )

    l_tagged = (
        left.withColumn(_T, F.col(left_time))
        .withColumn(_IS_RIGHT, F.lit(0))
        .withColumn(_PAYLOAD, F.lit(None).cast(payload_type))
    )

    r_tagged = right.withColumn(_T, F.col(right_time)).withColumn(
        _IS_RIGHT, F.lit(1)
    )
    r_tagged = r_tagged.withColumn(
        _PAYLOAD, F.struct(*[F.col(c) for c in payload])
    )
    for c in left.columns:
        if c != key:
            r_tagged = r_tagged.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))

    cols = [key, _T, _IS_RIGHT, _PAYLOAD] + [c for c in left.columns if c != key]
    unioned = l_tagged.select(*cols).unionByName(r_tagged.select(*cols))

    # Rows ordered by time; at equal timestamps the right row sorts
    # FIRST (is_right desc) so right_time == left_time matches, per ASOF
    # semantics.  Among right rows tied on (key, time) the payload struct
    # itself is the final sort key, so the surviving payload (the LAST
    # non-null in window order == the greatest struct) is deterministic.
    w = (
        Window.partitionBy(key)
        .orderBy(
            F.col(_T).asc(),
            F.col(_IS_RIGHT).desc(),
            F.col(_PAYLOAD).asc_nulls_first(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.withColumn(
        _PAYLOAD, F.last(_PAYLOAD, ignorenulls=True).over(w)
    )
    return (
        filled.filter(F.col(_IS_RIGHT) == 0)
        .select(
            *[c for c in left.columns],
            *[F.col(f"{_PAYLOAD}.{c}").alias(c) for c in payload],
        )
    )
