"""Regression tests for the round-2 correctness / scale fixes:

- short documents (<3 tokens) must shingle to [] (Spark's sequence(1,0)
  counts DOWN and ANSI mode throws on the out-of-bounds token access —
  the CASE guard mirrors DuckDB's empty generate_series instead);
- asof_join must pick ONE deterministic right row at tied timestamps,
  never stitch payload columns from different rows;
- paginate must plan a distributed sort + offset/limit, not a
  single-partition row_number window;
- sketch_kmv must plan TakeOrderedAndProject, not a global sort;
- salted_join must reject outer-join modes that would duplicate
  unmatched small-side rows.
"""

import datetime

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from wiki_references_db_spark.operators.asof import asof_join
from wiki_references_db_spark.operators.relational import paginate
from wiki_references_db_spark.operators.skew import salted_join
from wiki_references_db_spark.queries.training import _SHINGLES_FROM_TOKS, _TOKENS


def test_short_documents_shingle_to_empty(spark):
    docs = spark.createDataFrame(
        [
            (1, ""),
            (2, "   "),
            (3, "one"),
            (4, "one two"),
            (5, "one two three"),
            (6, "one two three four"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r["shingles"]
        for r in docs.select(
            "doc_id",
            F.expr(f"({_SHINGLES_FROM_TOKS.replace('toks', _TOKENS)})").alias(
                "shingles"
            ),
        ).collect()
    }
    # <3 tokens -> empty shingle list, no ANSI out-of-bounds error.
    assert out[3] == []
    assert out[4] == []
    assert out[5] == ["one two three"]
    assert out[6] == ["one two three", "two three four"]
    # split('', '\\s+') gives [''] (1 token) -> still empty.
    assert out[1] == []
    assert out[2] == []


def test_asof_join_deterministic_at_tied_right_times(spark):
    ts = datetime.datetime(2024, 1, 1, 12, 0, 0)
    left = spark.createDataFrame([Row(k="a", lt=ts)])
    # Two right rows at the SAME (key, time); one has a null payload
    # column.  A per-column fill could stitch (price from row1, note from
    # row2); the struct fill must return exactly one row's payload.
    right = spark.createDataFrame(
        [
            Row(k="a", rt=ts, price=1.0, note=None),
            Row(k="a", rt=ts, price=2.0, note="beta"),
        ]
    )
    rows = asof_join(left, right, key="k", left_time="lt", right_time="rt").collect()
    assert len(rows) == 1
    got = (rows[0]["price"], rows[0]["note"])
    # Deterministic winner: the greatest payload struct (price=2.0).
    assert got == (2.0, "beta")
    # Re-run to confirm stability.
    rows2 = asof_join(left, right, key="k", left_time="lt", right_time="rt").collect()
    assert (rows2[0]["price"], rows2[0]["note"]) == got


def test_asof_join_basic_before_semantics(spark):
    t = lambda s: datetime.datetime.fromisoformat(s)  # noqa: E731
    left = spark.createDataFrame(
        [Row(k="a", lt=t("2024-01-01 10:30")), Row(k="a", lt=t("2024-01-01 09:00"))]
    )
    right = spark.createDataFrame(
        [
            Row(k="a", rt=t("2024-01-01 10:00"), price=5.0, note="x"),
            Row(k="a", rt=t("2024-01-01 11:00"), price=7.0, note="y"),
        ]
    )
    out = {
        r["lt"]: (r["price"], r["note"])
        for r in asof_join(left, right, "k", "lt", "rt").collect()
    }
    assert out[t("2024-01-01 10:30")] == (5.0, "x")
    assert out[t("2024-01-01 09:00")] == (None, None)


def test_paginate_plans_no_window_and_slices_correctly(spark):
    df = spark.range(0, 10_000).withColumn("v", F.col("id") % 97)
    page = paginate(df, [F.col("id").asc()], limit=10, offset=100)
    plan = page._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    got = [r["id"] for r in page.collect()]
    assert got == list(range(100, 110))


def test_sketch_kmv_plans_take_ordered(spark, sf_dir):
    from wiki_references_db_spark.queries import all_queries

    df = all_queries()["sketch_kmv_distinct"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan
    row = df.collect()[0]
    # KMV with deterministic md5 hashing: estimate within 35% of exact
    # for the test corpus (k=64).
    assert row["exact_distinct"] > 0
    assert abs(row["kmv_estimate"] - row["exact_distinct"]) < 0.35 * row["exact_distinct"]


def test_salted_join_rejects_outer_modes(spark):
    df = spark.range(10).withColumn("k", F.col("id") % 3)
    small = spark.createDataFrame([(0, "a"), (1, "b")], ["k", "label"])
    with pytest.raises(ValueError, match="inner.*left"):
        salted_join(df, small, ["k"], "id", how="right")
    # inner still works and matches the unsalted join.
    got = salted_join(df, small, ["k"], "id", how="inner").count()
    assert got == df.join(small, "k").count()


def test_corpus_storage_level_conf(spark):
    """storage.persist_corpus honors spark.wikirefs.corpusStorageLevel
    and rejects unknown level names."""
    import pytest as _pytest
    from pyspark import StorageLevel

    from wiki_references_db_spark.storage import persist_corpus

    df = spark.range(10)
    try:
        got = persist_corpus(df).storageLevel
        assert got == StorageLevel.DISK_ONLY  # default
        df.unpersist()
        spark.conf.set("spark.wikirefs.corpusStorageLevel", "MEMORY_AND_DISK")
        got = persist_corpus(df).storageLevel
        assert got.useMemory and got.useDisk
        df.unpersist()
        spark.conf.set("spark.wikirefs.corpusStorageLevel", "MEMORY_ONLY")
        with _pytest.raises(ValueError, match="corpusStorageLevel"):
            persist_corpus(spark.range(5))
    finally:
        spark.conf.unset("spark.wikirefs.corpusStorageLevel")
        df.unpersist()


def test_adaptive_band_bits_rule_matches_closed_form(spark):
    """The corpus-adaptive band width (round-11 fix for the fixed-2^4
    quadratic): bits = clamp(ceil(log2(ceil(n/target))), 4, 16),
    computed engine-side as the binary digit count of ceil(n/target)-1
    so no float log2 can straddle a power-of-two boundary differently
    per engine.  Pin the Spark expression against the closed form over
    the interesting range, including the exact power-of-two boundaries
    and the clamp edges."""
    import math

    from pyspark.sql import functions as F

    from wiki_references_db_spark.queries.training import (
        _NEARDUP_MAX_BITS,
        _NEARDUP_MIN_BITS,
        _NEARDUP_TARGET_BUCKET,
    )

    def closed_form(n: int) -> int:
        m = max(1, math.ceil(n / _NEARDUP_TARGET_BUCKET))
        bits = max(1, math.ceil(math.log2(m))) if m > 1 else 1
        return min(_NEARDUP_MAX_BITS, max(_NEARDUP_MIN_BITS, bits))

    cases = [
        1, 15, 16, 17, 255, 256, 257, 500, 2000, 20000,
        16 * 2**10, 16 * 2**10 + 1, 16 * 2**16, 16 * 2**16 + 1, 10**9,
    ]
    df = spark.createDataFrame([(n,) for n in cases], "n bigint").select(
        "n",
        F.least(
            F.lit(_NEARDUP_MAX_BITS),
            F.greatest(
                F.lit(_NEARDUP_MIN_BITS),
                F.length(
                    F.bin(
                        F.expr(
                            f"(n + {_NEARDUP_TARGET_BUCKET - 1})"
                            f" div {_NEARDUP_TARGET_BUCKET} - 1"
                        )
                    )
                ),
            ),
        )
        .cast("int")
        .alias("bits"),
    )
    got = {r.n: r.bits for r in df.collect()}
    assert got == {n: closed_form(n) for n in cases}, got
