#!/usr/bin/env python3
"""Round-8 A/B (VERDICT r7 item 2): settle the r6->r7 bench deltas on
``triangle_count_cosupplier`` (0.86 -> 1.55s) and
``serving_article_citations`` (0.46 -> 0.78s) with a same-JVM shoot-out
in EXACT bench-harness form — sf0.001 warmup through the noop sink, a
fresh DataFrame per timed run at sf0.1, ``clearCache()`` between
queries, min-of-2 per (query, level) pass, levels alternated A/B/A/B so
container drift cancels.

The open question from r7: the storage.py A/B showed DISK_ONLY ==
MEMORY_AND_DISK (3.27 vs 3.25s) in ITS harness, while the bench harness
showed the triangle query at 1.55s (r7, DISK_ONLY) vs 0.86s (r6,
MEMORY_AND_DISK) — either the persist level matters in bench-harness
form specifically, or the r7 number was session noise.  This script
answers it in the form the driver actually measures.  Results are
recorded in storage.py's module docstring and the commit message; this
script is evidence, not part of the engine.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = ["triangle_count_cosupplier", "serving_article_citations"]
LEVELS = ["DISK_ONLY", "MEMORY_AND_DISK"]
PASSES = 2  # each (query, level) gets PASSES x min-of-2 bench measurements

_CONF = "spark.wikirefs.corpusStorageLevel"


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    warm_dir = "/root/testdata/sf0.001"
    from wiki_references_db_spark.session import get_spark
    from wiki_references_db_spark.queries import all_queries

    spark = get_spark(app_name="wikirefs-persist-ab")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()

    def noop(df) -> None:
        df.write.mode("overwrite").format("noop").save()

    # Bench-harness warmup: codegen/JIT warm at the smallest SF.
    spark.range(1_000_000).selectExpr("sum(id)").write.mode("overwrite").format(
        "noop"
    ).save()
    for name in QUERIES:
        noop(queries[name](spark, warm_dir))
        spark.catalog.clearCache()

    # results[name][level] = list of min-of-2 measurements (one per pass)
    results: dict[str, dict[str, list[float]]] = {
        n: {lv: [] for lv in LEVELS} for n in QUERIES
    }
    for pass_i in range(PASSES):
        for level in LEVELS:
            spark.conf.set(_CONF, level)
            for name in QUERIES:
                fn = queries[name]
                best = None
                for _ in range(2):  # min-of-2, fresh DataFrame per run
                    df = fn(spark, sf_dir)
                    t0 = time.perf_counter()
                    noop(df)
                    dt = time.perf_counter() - t0
                    best = dt if best is None else min(best, dt)
                spark.catalog.clearCache()
                results[name][level].append(round(best, 3))
                print(
                    f"pass={pass_i} level={level:<15} {name}: {best:.3f}s",
                    flush=True,
                )

    print("\n=== summary (min over passes of min-of-2) ===")
    for name in QUERIES:
        row = {lv: min(results[name][lv]) for lv in LEVELS}
        print(f"{name}: {row}  all={results[name]}")


if __name__ == "__main__":
    main()
