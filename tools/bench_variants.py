#!/usr/bin/env python3
"""One-off variant shoot-out for the round-5 perf work (VERDICT.md items
2/3): candidate rewrites of ``dedup_simhash`` and ``corpus_dup_span_stats``
timed head-to-head at sf0.1, min-of-2 after an sf0.001 warmup — the same
methodology as bench.py.  Results are committed in the rewrite's commit
message; this script is evidence, not part of the engine.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, functions as F

from wiki_references_db_spark.tables import load_table
from wiki_references_db_spark.queries.training import _TOKENS, _SIMHASH_SPARK
from wiki_references_db_spark.queries.curation import _SPANS_FROM_TOKS

# ---------------------------------------------------------------- simhash

# Packed-nibble accumulator: one bigint per md5 nibble, four 16-bit
# fields per bigint (bit i of nibble j accumulates in field i).  The
# per-word work is 16 array lookups + 16 adds instead of 64 lambda
# evaluations of instr/substring/pow.
_PCK = [sum(((v >> i) & 1) << (16 * i) for i in range(4)) for v in range(16)]
_PCK_LIT = "array(" + ", ".join(f"{v}L" for v in _PCK) + ")"


def simhash_packed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packed-nibble candidate (lost the shoot-out; kept as evidence).

    LIMIT: each 16-bit count field overflows past 65535 distinct tokens
    per document, silently corrupting the simhash (and the parity diff
    count).  Fine for the sf0.1 corpus (max ~400 words/doc); widen the
    fields to 4x bigint lanes of 16 bits each before reusing at larger
    scale."""
    d = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    toks = d.select("doc_id", F.expr(f"array_distinct({_TOKENS})").alias("ws"))
    hs = toks.select(
        "doc_id",
        F.expr("size(ws)").alias("cnt"),
        F.expr("transform(ws, w -> md5(w))").alias("hs"),
    )
    acc = hs.select(
        "doc_id",
        "cnt",
        F.expr(
            f"""
            aggregate(hs, array_repeat(CAST(0 AS BIGINT), 16),
              (acc, h) -> zip_with(acc,
                transform(sequence(1, 16),
                  j -> element_at({_PCK_LIT},
                         instr('0123456789abcdef', substring(h, j, 1)))),
                (a, b) -> a + b))
            """
        ).alias("bs"),
    )
    out = acc.select(
        "doc_id",
        F.expr(
            """
            array_join(transform(sequence(0, 63),
              k -> CASE WHEN 2 * (shiftright(element_at(bs, CAST(k div 4 + 1 AS INT)),
                                             16 * (k % 4)) % 65536) > cnt
                        THEN '1' ELSE '0' END), '')
            """
        ).alias("simhash64"),
    )
    return out.select(
        "doc_id", "simhash64", F.substring("simhash64", 1, 16).alias("band16")
    )


def simhash_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The r3 form: explode words + 64 codegen'd aggregates."""
    d = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    words = d.select(
        "doc_id",
        F.explode(F.expr(f"array_distinct({_TOKENS})")).alias("w"),
    ).select("doc_id", F.md5(F.col("w")).alias("h"))
    fp = words.groupBy("doc_id").agg(F.expr(_SIMHASH_SPARK).alias("simhash64"))
    return fp.select(
        "doc_id", "simhash64", F.substring("simhash64", 1, 16).alias("band16")
    )


# ---------------------------------------------------------- span stats


def spans_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.expr(_TOKENS).alias("toks"))
    span_rows = toks.select(
        "doc_id", F.explode(F.expr(_SPANS_FROM_TOKS)).alias("span")
    )
    w = Window.partitionBy("span")
    per_doc = (
        span_rows.withColumn("df", F.count(F.lit(1)).over(w))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum((F.col("df") > 1).cast("long")).alias("n_dup_spans"),
        )
    )
    return d.select("doc_id").join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_spans", F.lit(0)).alias("n_spans"),
        F.coalesce("n_dup_spans", F.lit(0)).alias("n_dup_spans"),
        F.when(
            F.col("n_spans").isNotNull(),
            F.col("n_dup_spans").cast("double") / F.col("n_spans"),
        ).alias("dup_frac"),
    )


def spans_join_nopersist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The r3 form: df aggregate + join probe, corpus exploded twice."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.expr(_TOKENS).alias("toks"))
    span_rows = toks.select(
        "doc_id", F.explode(F.expr(_SPANS_FROM_TOKS)).alias("span")
    )
    span_df = span_rows.groupBy("span").agg(F.count(F.lit(1)).alias("df"))
    per_doc = (
        span_rows.join(span_df, "span")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum((F.col("df") > 1).cast("long")).alias("n_dup_spans"),
        )
    )
    return d.select("doc_id").join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_spans", F.lit(0)).alias("n_spans"),
        F.coalesce("n_dup_spans", F.lit(0)).alias("n_dup_spans"),
        F.when(
            F.col("n_spans").isNotNull(),
            F.col("n_dup_spans").cast("double") / F.col("n_spans"),
        ).alias("dup_frac"),
    )


def main() -> None:
    from wiki_references_db_spark.session import get_spark
    from wiki_references_db_spark.queries import all_queries

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    warm_dir = "/root/testdata/sf0.001"
    spark = get_spark(app_name="wikirefs-bench-variants")
    spark.sparkContext.setLogLevel("ERROR")
    q = all_queries()

    variants = {
        "simhash_current": q["dedup_simhash"],
        "simhash_packed": simhash_packed,
        "simhash_groupby": simhash_groupby,
        "spans_current": q["corpus_dup_span_stats"],
        "spans_window": spans_window,
        "spans_join_nopersist": spans_join_nopersist,
    }
    for name, fn in variants.items():
        fn(spark, warm_dir).write.mode("overwrite").format("noop").save()
        spark.catalog.clearCache()
    results = {}
    for name, fn in variants.items():
        best, first = None, None
        for i in range(2):
            df = fn(spark, sf_dir)
            t0 = time.perf_counter()
            df.write.mode("overwrite").format("noop").save()
            dt = time.perf_counter() - t0
            # Clear between iterations too: a persisting variant would
            # otherwise serve run 2 from cache (CacheManager plan match),
            # an advantage the non-persisting variants can't get, biasing
            # the cross-variant min2 comparison.
            spark.catalog.clearCache()
            if i == 0:
                first = dt
            best = dt if best is None else min(best, dt)
        results[name] = (round(first, 3), round(best, 3))
        print(f"{name:24s} first={first:.3f}s  min2={best:.3f}s", flush=True)

    # Value parity between the variants (same rows, same simhash strings)
    a = q["dedup_simhash"](spark, sf_dir)
    b = simhash_packed(spark, sf_dir)
    c = simhash_groupby(spark, sf_dir)
    n_ab = a.exceptAll(b).count() + b.exceptAll(a).count()
    n_ac = a.exceptAll(c).count() + c.exceptAll(a).count()
    print(f"simhash parity: current-vs-packed diff={n_ab}, current-vs-groupby diff={n_ac}")
    s1 = q["corpus_dup_span_stats"](spark, sf_dir)
    s2 = spans_window(spark, sf_dir)
    n_s = s1.exceptAll(s2).count() + s2.exceptAll(s1).count()
    spark.catalog.clearCache()
    print(f"spans parity: current-vs-window diff={n_s}")


if __name__ == "__main__":
    main()
