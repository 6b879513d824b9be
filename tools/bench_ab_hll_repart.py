#!/usr/bin/env python3
"""Same-JVM alternating A/B for sketch_hll_sliding_union: committed
form vs a variant whose (hour, user) distinct is repartitioned to
defaultParallelism on the key BEFORE the distinct (the stage trace
shows the whole sketch/exact pipeline serialized on one AQE-coalesced
task downstream of the sub-MB distinct; same bytes!=CPU pattern as the
cosine confirm, guide §2.2)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PASSES = 3

def main():
    from pyspark.sql import functions as F
    from wiki_references_db_spark.session import get_spark
    from wiki_references_db_spark.tables import load_table
    import wiki_references_db_spark.queries.training as T
    from wiki_references_db_spark.queries import all_queries

    spark = get_spark(app_name="ab-hll-repart")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    name = "sketch_hll_sliding_union"

    def variant(spark, sf_dir):
        par = spark.sparkContext.defaultParallelism
        e = load_table(spark, sf_dir, "events")
        hu = (
            e.select(F.date_trunc("hour", F.col("ts")).alias("hr"), "user_id")
            .repartition(par, "hr", "user_id")
            .distinct()
        )
        hv = F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10
        ).cast("bigint")
        parts = hu.select(
            "hr",
            (hv % T._HLL_M).alias("bucket"),
            (hv / F.lit(T._HLL_M)).cast("bigint").alias("w"),
        )
        regs = parts.groupBy("hr", "bucket").agg(
            F.max(
                F.when(F.col("w") == 0, 27).otherwise(27 - F.length(F.bin(F.col("w"))))
            ).alias("rho")
        )
        targets = F.explode(
            F.array(
                F.col("hr"),
                F.col("hr") + F.expr("INTERVAL 1 HOUR"),
                F.col("hr") + F.expr("INTERVAL 2 HOUR"),
            )
        )
        hrs = hu.select("hr").distinct()
        merged = (
            regs.select(targets.alias("target"), "bucket", "rho")
            .join(F.broadcast(hrs.withColumnRenamed("hr", "target")), "target")
            .groupBy("target", "bucket")
            .agg(F.max("rho").alias("rho"))
        )
        folded = merged.groupBy("target").agg(
            (
                F.sum(F.pow(F.lit(2.0), -F.col("rho")))
                + (F.lit(T._HLL_M) - F.count(F.lit(1)))
            ).alias("ssum"),
            (
                F.sum((F.col("rho") == 0).cast("int"))
                + (F.lit(T._HLL_M) - F.count(F.lit(1)))
            ).cast("long").alias("n_empty"),
        )
        exact = (
            hu.select(targets.alias("target"), "user_id")
            .join(F.broadcast(hrs.withColumnRenamed("hr", "target")), "target")
            .groupBy("target")
            .agg(F.countDistinct("user_id").alias("exact_3h"))
        )
        return folded.join(exact, "target").select(
            F.date_format(F.col("target"), "yyyy-MM-dd HH:mm:ss").alias("hour"),
            (F.lit(T._HLL_M) - F.col("n_empty")).alias("n_buckets_used"),
            (F.lit(T._HLL_ALPHA) * F.lit(T._HLL_M * T._HLL_M) / F.col("ssum")).alias(
                "hll_estimate_3h"
            ),
            "exact_3h",
        )

    fns = {"plain": qs[name], "repart": variant}
    fns["plain"](spark, SF_DIR).write.mode("overwrite").format("noop").save()
    spark.catalog.clearCache()
    res = {v: [] for v in fns}
    keys = list(fns)
    for p in range(PASSES):
        order = keys if p % 2 == 0 else keys[::-1]
        for v in order:
            spark.sparkContext.setJobDescription(f"ab:{name}:{v}:p{p}")
            t0 = time.perf_counter()
            fns[v](spark, SF_DIR).write.mode("overwrite").format("noop").save()
            res[v].append(time.perf_counter() - t0)
            spark.catalog.clearCache()
    wins = sum(1 for x, y in zip(res["repart"], res["plain"]) if x < y)
    print(f"{name}: plain min {min(res['plain']):.3f} med {sorted(res['plain'])[1]:.3f}"
          f" | repart min {min(res['repart']):.3f} med {sorted(res['repart'])[1]:.3f}"
          f" | repart wins {wins}/{PASSES}")
    # result equivalence check at sf0.001
    a = sorted(map(tuple, fns["plain"](spark, "/root/testdata/sf0.001").collect()))
    b = sorted(map(tuple, fns["repart"](spark, "/root/testdata/sf0.001").collect()))
    print("identical results:", a == b)

if __name__ == "__main__":
    main()
