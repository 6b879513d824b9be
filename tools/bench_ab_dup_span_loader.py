#!/usr/bin/env python3
"""Same-JVM alternating A/B: load_table vs load_table_parallel for the
two dup-span queries whose stage trace shows the tokenize+gram-hash
map chain on ONE task (the scan's single local split) writing a >10 MB
shuffle (guide §2.1 parallelize the expensive map, §1.1).  The loader
is swapped by rebinding the module-level name, so both variants are
the same committed code otherwise."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PASSES = 3

def main():
    from wiki_references_db_spark.session import get_spark
    from wiki_references_db_spark.tables import load_table, load_table_parallel
    import wiki_references_db_spark.queries.training as T
    import wiki_references_db_spark.queries.curation as C
    from wiki_references_db_spark.queries import all_queries

    spark = get_spark(app_name="ab-dupspan-loader")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    cases = [("dup_span_maximal_runs", T), ("corpus_dup_span_stats", C)]
    for name, mod in cases:
        fn = qs[name]
        fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
        spark.catalog.clearCache()
        res = {"plain": [], "parallel": []}
        keys = list(res)
        for p in range(PASSES):
            order = keys if p % 2 == 0 else keys[::-1]
            for v in order:
                mod.load_table = load_table_parallel if v == "parallel" else load_table
                spark.sparkContext.setJobDescription(f"ab:{name}:{v}:p{p}")
                t0 = time.perf_counter()
                fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
                res[v].append(time.perf_counter() - t0)
                spark.catalog.clearCache()
        mod.load_table = load_table
        wins = sum(1 for x, y in zip(res["parallel"], res["plain"]) if x < y)
        print(f"{name:28s} plain min {min(res['plain']):.3f} med {sorted(res['plain'])[1]:.3f}"
              f" | parallel min {min(res['parallel']):.3f} med {sorted(res['parallel'])[1]:.3f}"
              f" | parallel wins {wins}/{PASSES}", flush=True)

if __name__ == "__main__":
    main()
