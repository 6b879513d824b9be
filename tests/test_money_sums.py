"""Exactness proofs for the scaled-integer money-sum helpers
(queries/generic.py csum/revsum/discsum and their SQL twins) — the fast
replacements for the DECIMAL(28,10) aggregation path.

Three invariants are pinned, each against randomized 2-decimal money
data (hypothesis drives the values, Spark and DuckDB both execute):

1. ``csum(c) == dsum(c)`` BIT-IDENTICALLY for any 2-decimal column —
   the drop-in claim csum's docstring makes.
2. ``revsum``/``discsum`` equal their DuckDB oracle twins
   bit-identically (the cross-engine contract the driver checks), and
   equal the exact Fraction-arithmetic product sum to within one final
   correctly-rounded double conversion.
3. The hi/lo split recombines to the exact integer — no headroom loss
   at any magnitude the generators can reach.
"""

from __future__ import annotations

from fractions import Fraction

import duckdb
import pandas as pd
from hypothesis import given, settings, strategies as st

from wiki_references_db_spark.queries.generic import (
    _csum,
    _discsum,
    _revsum,
    csum,
    discsum,
    dsum,
    revsum,
)
from pyspark.sql import functions as F

# 2-decimal money values as the testdata generator produces them:
# dollars.cents doubles, price in [0, 1e6), discount in [0, 1).
_price = st.integers(min_value=0, max_value=100_000_000).map(lambda c: c / 100)
_disc = st.integers(min_value=0, max_value=99).map(lambda c: c / 100)
_rows = st.lists(st.tuples(_price, _disc), min_size=1, max_size=50)


def _spark_agg(spark, rows, col):
    pdf = pd.DataFrame(rows, columns=["price", "disc"])
    df = spark.createDataFrame(pdf)
    return df.agg(col.alias("v")).collect()[0]["v"]


def _duck_agg(rows, expr):
    con = duckdb.connect()
    con.execute("CREATE TABLE t (price DOUBLE, disc DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    out = con.execute(f"SELECT {expr} AS v FROM t").fetchone()[0]
    con.close()
    return out


@settings(max_examples=25, deadline=None)
@given(_rows)
def test_csum_is_dsum_bit_identical(spark, rows):
    a = _spark_agg(spark, rows, csum(F.col("price")))
    b = _spark_agg(spark, rows, dsum(F.col("price")))
    assert a == b  # exact double equality, not approx


@settings(max_examples=25, deadline=None)
@given(_rows)
def test_csum_matches_sql_twin(spark, rows):
    a = _spark_agg(spark, rows, csum(F.col("price")))
    b = _duck_agg(rows, _csum("price"))
    assert a == b


@settings(max_examples=25, deadline=None)
@given(_rows)
def test_revsum_cross_engine_and_exact(spark, rows):
    a = _spark_agg(spark, rows, revsum(F.col("price"), F.col("disc")))
    b = _duck_agg(rows, _revsum("price", "disc"))
    assert a == b
    # exact rational reference: sum of price*(1-disc) over exact cents
    exact = sum(
        Fraction(round(p * 100), 100) * Fraction(100 - round(d * 100), 100)
        for p, d in rows
    )
    assert a == float(exact)  # one correctly-rounded conversion


@settings(max_examples=25, deadline=None)
@given(_rows)
def test_discsum_cross_engine_and_exact(spark, rows):
    a = _spark_agg(spark, rows, discsum(F.col("price"), F.col("disc")))
    b = _duck_agg(rows, _discsum("price", "disc"))
    assert a == b
    exact = sum(
        Fraction(round(p * 100), 100) * Fraction(round(d * 100), 100)
        for p, d in rows
    )
    assert a == float(exact)


def test_revsum_hi_lo_recombines_at_large_magnitude(spark):
    # Max-magnitude rows: price 1e6-0.01, discount 0 -> per-row product
    # 9999999900000 at scale 1e4; 50 such rows stress the hi/lo split
    # far past what random draws reach.
    rows = [(999_999.99, 0.0)] * 50
    a = _spark_agg(spark, rows, revsum(F.col("price"), F.col("disc")))
    exact = sum(Fraction(99_999_999, 100) for _ in rows)
    assert a == float(exact)
