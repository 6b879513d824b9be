#!/usr/bin/env python3
"""Same-JVM alternating A/B of the AQE coalescePartitions.minPartitionSize
floor (64k vs 1m) over the batch-5 winners AND the queries that looked
elevated in the post-floor full draw, to separate the floor's real
per-query effect from draw variance (guide §1.1/§1.4)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
QUERIES = [
    "dedup_embedding_cosine", "dedup_embedding_cosine_projected",
    "semantic_decontaminate_lsh", "simhash_hamming_pairs",
    "sketch_hll_sliding_union", "corpus_dup_span_stats",
    "dup_span_maximal_runs", "q21_blocking_supplier",
    "phrase_tag_dictionary", "dedup_winnowing_fingerprints",
]
VARIANTS = ["64k", "1m"]
PASSES = 3
def main():
    from wiki_references_db_spark.queries import all_queries
    from wiki_references_db_spark.session import get_spark
    spark = get_spark(app_name="ab-aqefloor")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    results = {q: {v: [] for v in VARIANTS} for q in QUERIES}
    for q in QUERIES:
        fn = qs[q]
        # warm once (plan/IO caches) under default conf
        fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
        spark.catalog.clearCache()
        for p in range(PASSES):
            order = VARIANTS if p % 2 == 0 else VARIANTS[::-1]
            for v in order:
                spark.conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize", v)
                spark.sparkContext.setJobDescription(f"ab:{q}:{v}:p{p}")
                t0 = time.perf_counter()
                fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
                dt = time.perf_counter() - t0
                results[q][v].append(dt)
                spark.catalog.clearCache()
        a = results[q]["64k"]; b = results[q]["1m"]
        wins = sum(1 for x, y in zip(a, b) if x < y)
        print(f"{q:40s} 64k min {min(a):.3f} med {sorted(a)[1]:.3f} | "
              f"1m min {min(b):.3f} med {sorted(b)[1]:.3f} | 64k wins {wins}/{PASSES}",
              flush=True)
if __name__ == "__main__":
    main()
