"""Generic relational operators the reference expresses ad hoc, as
reusable DataFrame combinators.

Each helper names the reference construct it reproduces (SURVEY.md §2) and
is deliberately a *logical* rewrite — Catalyst still chooses the physical
plan (hash vs sort aggregate, broadcast vs shuffle join, etc.).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def distinct_on(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column | str] | None = None,
) -> DataFrame:
    """One survivor row per key — DuckDB ``SELECT DISTINCT ON (keys)``
    (reference:dedup_parquet.py:74-86 et al., SURVEY §2.3 D2 / §2.6 W2).

    The reference's survivor is order-nondeterministic; we fix a
    deterministic tie-break (``order_by``, defaulting to all non-key
    columns ascending) so reruns and oracles reproduce byte-identical
    output.  Implemented as a row_number window, which Spark executes as
    one shuffle by ``keys`` + per-partition sort — the same cost profile
    as the hash-partitioned external dedup the reference hand-rolled
    (reference:dedup_staged.py:305-708).
    """
    if order_by is None:
        order_by = [F.col(c).asc_nulls_last() for c in df.columns if c not in keys]
        if not order_by:
            return df.dropDuplicates(list(keys))
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def merge_non_null(df: DataFrame, keys: Sequence[str], value_cols: Sequence[str] | None = None) -> DataFrame:
    """Collapse duplicate rows per key, field-wise, preferring non-null
    values — the reference's in-batch merge before upsert
    (reference:models.py:108-115 et al., SURVEY §2.3 D4).

    Deterministic variant: per column take MAX over the group (nulls
    ignored), so the survivor does not depend on encounter order.
    """
    if value_cols is None:
        value_cols = [c for c in df.columns if c not in keys]
    aggs = [F.max(c).alias(c) for c in value_cols]
    return df.groupBy(*[F.col(k) for k in keys]).agg(*aggs)


def upsert_coalesce(
    existing: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    value_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Merge ``new`` into ``existing``: per key keep one row whose value
    columns are ``coalesce(new, existing)`` — the reference's
    ``ON CONFLICT DO UPDATE ... COALESCE(excluded.c, existing.c)``
    (reference:models.py:126-141, SURVEY §2.8 U1) as a full-outer join.
    """
    if value_cols is None:
        value_cols = [c for c in existing.columns if c not in keys]
    # Rename both sides up front: the two inputs often share lineage (two
    # filters of one table), which trips Spark's ambiguous-self-join check
    # if we rely on DataFrame aliases alone.
    e = existing.select([F.col(c).alias(f"__e_{c}") for c in existing.columns])
    n = new.select([F.col(c).alias(f"__n_{c}") for c in new.columns])
    cond = None
    for k in keys:
        c = F.col(f"__e_{k}").eqNullSafe(F.col(f"__n_{k}"))
        cond = c if cond is None else (cond & c)
    out_keys = [F.coalesce(F.col(f"__n_{k}"), F.col(f"__e_{k}")).alias(k) for k in keys]
    out_vals = [
        F.coalesce(F.col(f"__n_{c}"), F.col(f"__e_{c}")).alias(c) for c in value_cols
    ]
    return e.join(n, cond, "full_outer").select(*out_keys, *out_vals)


def insert_if_absent(existing: DataFrame, new: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Insert-if-absent — ``ON CONFLICT DO NOTHING``
    (reference:models.py:355-359, SURVEY §2.8 U2): keep all existing rows,
    add new rows whose key is not present (anti-join + union).
    """
    fresh = new.join(existing.select(*keys).distinct(), list(keys), "left_anti")
    return existing.unionByName(fresh)


def paginate(
    df: DataFrame,
    order_by: Sequence[Column],
    limit: int = 100,
    offset: int = 0,
    max_limit: int = 1000,
) -> DataFrame:
    """LIMIT/OFFSET pagination over a deterministic total order — the API
    layer's ``_paginate`` with its 1000-row cap
    (reference:api_v1.py:26-27,108, SURVEY §2.7 O6).

    Implemented as ``orderBy(...).offset(o).limit(n)``: Spark plans a
    DISTRIBUTED sort with limit pushdown (CollectLimit /
    TakeOrderedAndProject over offset+limit rows), never the
    single-partition row_number window this replaces — so the helper is
    safe on arbitrarily large inputs, not just pre-reduced serving
    results.
    """
    limit = min(limit, max_limit)
    out = df.orderBy(*order_by)
    if offset:
        out = out.offset(offset)
    return out.limit(limit)


def top_k_per_group(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column],
    k: int,
) -> DataFrame:
    """Top-k rows per group with a deterministic tie-break (SURVEY §2.7
    O7 generalized).  One shuffle by ``keys``; Spark's WindowGroupLimit
    pushes the k-limit into the sort at scale.
    """
    w = Window.partitionBy(*[F.col(c) for c in keys]).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )
