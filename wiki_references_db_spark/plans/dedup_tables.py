"""Phase 1.5: staging dedup (reference:dedup_parquet.py).

Per table: NOT-NULL key guard (P1) -> full-row DISTINCT (D1) or
deterministic DISTINCT ON (D2).  The reference's 8 GB DuckDB memory cap
and its 800-line hash-partitioned external dedup engine
(reference:dedup_staged.py:305-708) are both subsumed by Spark's shuffle:
``repartition(keys) + one-survivor-per-key`` with spill handled by the
unified memory manager.

Survivor determinism: the reference's DISTINCT ON picks an arbitrary row
per key; we order by all non-key columns ascending (nulls last) so
reruns and oracles reproduce identical output (SURVEY §7.3 risk 2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wiki_references_db_spark.operators.relational import distinct_on, merge_non_null
from wiki_references_db_spark.schemas import DEDUP_KEYS


def dedup_table(name: str, df: DataFrame) -> DataFrame:
    keys, full_row = DEDUP_KEYS[name]
    guarded = df
    for k in keys:
        guarded = guarded.filter(F.col(k).isNotNull())
    if full_row:
        return guarded.distinct()
    return distinct_on(guarded, keys)


def dedup_staging(staging: dict[str, DataFrame]) -> dict[str, DataFrame]:
    return {name: dedup_table(name, df) for name, df in staging.items()}


def merge_staging_non_null(staging: dict[str, DataFrame]) -> dict[str, DataFrame]:
    """Alternative dedup keeping the most information per key: field-wise
    non-null merge (D4, reference:models.py:108-115) instead of a single
    survivor row.  Used where upsert semantics matter more than row
    identity (e.g. web_resources collecting page ids from curid rows)."""
    out = {}
    for name, df in staging.items():
        keys, full_row = DEDUP_KEYS[name]
        guarded = df
        for k in keys:
            guarded = guarded.filter(F.col(k).isNotNull())
        out[name] = guarded.distinct() if full_row else merge_non_null(guarded, keys)
    return out
