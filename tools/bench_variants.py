#!/usr/bin/env python3
"""One-off variant shoot-out for the round-7 perf work (VERDICT.md item
2): candidate rewrites of ``sketch_ams_f2`` timed head-to-head at sf0.1,
min-of-2 after an sf0.001 warmup — the same methodology as bench.py.
Results are committed in the rewrite's commit message; this script is
evidence, not part of the engine.  (Round-5/6 shoot-outs lived in this
file too; see git history.)

Hypothesis: the 0.83s constant is not the 320-counter aggregate but the
DOUBLE traversal of lineitem — the sketch pipeline (600k md5+conv,
3M-row explode) runs beside the exact-F2 baseline's own scan +
groupBy(l_partkey).  Since sign/bucket depend only on the key, the cell
counter is sum over keys of f * sign — so the sketch can be DERIVED from
the per-key counts the exact baseline already pays for: md5 on ~20k
keys instead of 600k rows, explode on 100k instead of 3M, one scan
instead of two, bit-identical values.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, functions as F

from wiki_references_db_spark.tables import load_table
from wiki_references_db_spark.queries.training import _AMS_D, _ams_bucket, _ams_nib


def _ams_packs() -> str:
    return ", ".join(
        f"({_ams_bucket('spark', j)} * 2 + ({_ams_nib('spark', 3 * j + 3)}"
        f" % 2))"
        for j in range(_AMS_D)
    )


def _assemble(est: DataFrame, keys: DataFrame) -> DataFrame:
    med = (
        est.orderBy("f2_est")
        .limit(_AMS_D // 2 + 1)
        .agg(F.max("f2_est").alias("median_f2_est"))
    )
    exact = keys.agg(F.sum(F.col("f") * F.col("f")).alias("exact_f2"))
    return (
        est.crossJoin(F.broadcast(med))
        .crossJoin(F.broadcast(exact))
        .select(
            "row_id",
            "f2_est",
            "median_f2_est",
            "exact_f2",
            (
                F.col("median_f2_est").cast("double") / F.col("exact_f2")
            ).alias("median_ratio"),
        )
        .orderBy("row_id")
    )


def _from_key_counts(spark: SparkSession, sf_dir: str, persist: bool) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey")
    keys = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("f"))
    if persist:
        keys = keys.persist()
    hashed = keys.selectExpr(
        "f",
        "CAST(conv(substring(md5(CAST(l_partkey AS STRING)), 1, 15),"
        " 16, 10) AS BIGINT) AS hv",
    )
    cells = (
        hashed.selectExpr("f", f"posexplode(array({_ams_packs()})) AS (row_id, p)")
        .selectExpr(
            "row_id",
            "(p div 2) AS bucket",
            "CASE WHEN p % 2 = 0 THEN f ELSE -f END AS dc",
        )
        .groupBy("row_id", "bucket")
        .agg(F.sum("dc").alias("c"))
    )
    est = cells.groupBy("row_id").agg(
        F.sum(F.col("c") * F.col("c")).alias("f2_est")
    )
    return _assemble(est, keys)


def ams_key_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _from_key_counts(spark, sf_dir, persist=False)


def ams_key_counts_persist(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _from_key_counts(spark, sf_dir, persist=True)


def main() -> None:
    from wiki_references_db_spark.session import get_spark
    from wiki_references_db_spark.queries import all_queries

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    warm_dir = "/root/testdata/sf0.001"
    spark = get_spark(app_name="wikirefs-bench-variants")
    spark.sparkContext.setLogLevel("ERROR")
    q = all_queries()

    variants = {
        "ams_current": q["sketch_ams_f2"],
        "ams_key_counts": ams_key_counts,
        "ams_key_counts_persist": ams_key_counts_persist,
    }
    for name, fn in variants.items():
        fn(spark, warm_dir).write.mode("overwrite").format("noop").save()
        spark.catalog.clearCache()
    for rounds in (1, 2):  # print a second pass to expose JIT drift
        for name, fn in variants.items():
            best, first = None, None
            for i in range(2):
                df = fn(spark, sf_dir)
                t0 = time.perf_counter()
                df.write.mode("overwrite").format("noop").save()
                dt = time.perf_counter() - t0
                spark.catalog.clearCache()
                if i == 0:
                    first = dt
                best = dt if best is None else min(best, dt)
            print(
                f"pass{rounds} {name:24s} first={first:.3f}s  min2={best:.3f}s",
                flush=True,
            )

    a = q["sketch_ams_f2"](spark, sf_dir)
    for name, fn in [("key_counts", ams_key_counts)]:
        b = fn(spark, sf_dir)
        diff = a.exceptAll(b).count() + b.exceptAll(a).count()
        spark.catalog.clearCache()
        print(f"ams parity: current-vs-{name} diff={diff}")


if __name__ == "__main__":
    main()
