#!/usr/bin/env python3
"""Stress-scale the STREAMING length-drift probe
(``stream_length_drift_probe``): time the full callable (stream drain +
KS tail) at 1x and Kx document corpora.

The probe's scale claims are (a) per-batch work is a keyed COUNT
aggregation over the batch (the mergeable sufficient statistic of the
KS test), so total streaming work grows ~linearly with the corpus; and
(b) the KS tail runs over the (source x distinct-length) count table —
a value DOMAIN, independent of row count — so it stays FLAT.  This
harness measures the end-to-end wall at both sizes and, separately,
the tail alone over pre-aggregated counts, so both claims are numbers
rather than prose.

Replicas are token-suffixed like tools/stress_scale.py (text changes)
but keep the n_chars column VALUES, so the length domain — and with it
the tail's work — is identical at both scales by construction.

Usage: python tools/stress_drift_streaming.py [K]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from wiki_references_db_spark.queries import all_queries
from wiki_references_db_spark.session import get_spark
from wiki_references_db_spark.tables import load_table

BASE = "/root/testdata/sf0.1"


def inflate_documents(spark, k: int, out_dir: str) -> None:
    df = load_table(spark, BASE, "documents")
    shift = df.agg(F.max("doc_id")).first()[0] + 1
    parts = []
    for i in range(k):
        p = df.withColumn("doc_id", F.col("doc_id") + F.lit(i * shift))
        if i > 0:
            p = p.withColumn(
                "text",
                F.expr(
                    "array_join(transform(split(coalesce(text, ''), ' '),"
                    f" x -> concat(x, '_r{i}')), ' ')"
                ),
            )
        parts.append(p)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.write.mode("overwrite").parquet(
        os.path.join(out_dir, "documents.parquet")
    )


def time_probe(spark, sf_dir: str) -> tuple[float, int]:
    fn = all_queries()["stream_length_drift_probe"]
    t0 = time.perf_counter()
    rows = fn(spark, sf_dir).collect()
    return time.perf_counter() - t0, len(rows)


def time_tail_only(spark, sf_dir: str) -> float:
    """The KS tail over pre-aggregated counts (no streaming): measures
    the value-domain claim in isolation."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    sc = (
        d.filter(F.col("doc_id") % 7 == 0)
        .groupBy("source", F.col("n_chars").alias("v"))
        .agg(F.count(F.lit(1)).alias("cs"))
    )
    cc = (
        d.filter(F.col("doc_id") % 7 != 0)
        .groupBy("source", F.col("n_chars").alias("v"))
        .agg(F.count(F.lit(1)).alias("cc"))
    )
    u = sc.join(cc, ["source", "v"], "full_outer").select(
        "source",
        "v",
        F.coalesce("cs", F.lit(0)).alias("cs"),
        F.coalesce("cc", F.lit(0)).alias("cc"),
    )
    wc = (
        Window.partitionBy("source")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt = Window.partitionBy("source")
    cums = (
        u.withColumn("cum_s", F.sum("cs").over(wc))
        .withColumn("cum_c", F.sum("cc").over(wc))
        .withColumn("tot_s", F.sum("cs").over(wt))
        .withColumn("tot_c", F.sum("cc").over(wt))
    )
    t0 = time.perf_counter()
    cums.filter((F.col("tot_s") > 0) & (F.col("tot_c") > 0)).groupBy(
        "source"
    ).agg(F.max(F.abs(F.col("cum_s") / F.col("tot_s") - F.col("cum_c") / F.col("tot_c")))).collect()
    return time.perf_counter() - t0


def main() -> int:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark(app_name="stress-drift-streaming")
    spark.sparkContext.setLogLevel("ERROR")

    big = tempfile.mkdtemp(prefix="drift_stress_")
    try:
        inflate_documents(spark, k, big)
        # Warm both paths once at the base size.
        time_probe(spark, BASE)
        t1, n1 = time_probe(spark, BASE)
        tk, nk = time_probe(spark, big)
        tail1 = time_tail_only(spark, BASE)
        tailk = time_tail_only(spark, big)
        print(f"probe end-to-end  1x: {t1:7.3f}s ({n1} rows)")
        print(f"probe end-to-end {k}x: {tk:7.3f}s ({nk} rows)")
        print(f"growth {tk / t1:.2f}x on a {k}x corpus")
        print(f"KS tail only      1x: {tail1:7.3f}s")
        print(f"KS tail only     {k}x: {tailk:7.3f}s (value-domain-sized; "
              f"growth {tailk / tail1:.2f}x)")
        ok = tk / t1 <= k
        print("SUB-LINEAR: scale-safe" if ok else "SUPER-LINEAR: investigate")
        return 0 if ok else 1
    finally:
        shutil.rmtree(big, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
