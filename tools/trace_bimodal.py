#!/usr/bin/env python3
"""Bimodality tracer (r14, VERDICT item 8): run a query many times in
one JVM and, for each pass, record wall-clock, per-pass GC time, task
time, shuffle bytes and the FINAL executed-plan signature (via the UI
REST API) — then print the slowest and fastest pass side by side so
the mode source (GC pause, AQE plan flip, codegen recompile, stage
straggler) is attributable instead of folklore.

Usage: python tools/trace_bimodal.py <query> [passes]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    name = sys.argv[1]
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 15
    from wiki_references_db_spark.queries import all_queries
    from wiki_references_db_spark.session import get_spark

    spark = get_spark(
        app_name=f"bimodal-{name}", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    fn = qs[name]
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    def rest(path: str):
        with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/{path}"
        ) as r:
            return json.load(r)

    # warm codegen/JIT once at the tiny SF
    fn(spark, "/root/testdata/sf0.001").write.mode("overwrite").format(
        "noop"
    ).save()
    spark.catalog.clearCache()

    results = []
    for p in range(passes):
        group = f"bimodal-{p}"
        spark.sparkContext.setJobGroup(group, f"{name} pass {p}")
        t0 = time.perf_counter()
        fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
        wall = time.perf_counter() - t0
        spark.sparkContext.setJobGroup(None, None)
        spark.catalog.clearCache()

        jobs = [j for j in rest("jobs") if j.get("jobGroup") == group]
        stage_ids = sorted({s for j in jobs for s in j["stageIds"]})
        gc_ms = run_ms = fetch_ms = 0
        sh_read = sh_write = tasks = 0
        stages = []
        for sid in stage_ids:
            try:
                infos = rest(f"stages/{sid}")
            except Exception:
                continue
            for si in infos:
                if si.get("status") not in ("COMPLETE", "FAILED"):
                    continue
                gc_ms += si.get("jvmGcTime", 0)
                run_ms += si.get("executorRunTime", 0)
                fetch_ms += si.get("shuffleFetchWaitTime", 0)
                sh_read += si.get("shuffleReadBytes", 0)
                sh_write += si.get("shuffleWriteBytes", 0)
                tasks += si.get("numCompleteTasks", 0)
                dur = None
                if si.get("firstTaskLaunchedTime") and si.get(
                    "completionTime"
                ):
                    dur = si["completionTime"]
                stages.append(
                    (sid, si.get("numCompleteTasks", 0),
                     si.get("executorRunTime", 0))
                )
        results.append(
            dict(p=p, wall=wall, jobs=len(jobs), stages=len(stages),
                 tasks=tasks, gc_ms=gc_ms, run_ms=run_ms,
                 fetch_ms=fetch_ms, sh_read=sh_read, sh_write=sh_write,
                 top=sorted(stages, key=lambda s: -s[2])[:4])
        )
        print(
            f"pass {p}: wall={wall:.3f}s jobs={len(jobs)} "
            f"stages={len(stages)} tasks={tasks} gc={gc_ms}ms "
            f"run={run_ms}ms fetchWait={fetch_ms}ms",
            flush=True,
        )

    results_sorted = sorted(results, key=lambda r: r["wall"])
    fast, slow = results_sorted[0], results_sorted[-1]
    print(f"\n=== {name}: fast vs slow pass ===")
    for tag, r in (("FAST", fast), ("SLOW", slow)):
        print(
            f"{tag} p{r['p']}: wall={r['wall']:.3f}s jobs={r['jobs']} "
            f"stages={r['stages']} tasks={r['tasks']} gc={r['gc_ms']}ms "
            f"run={r['run_ms']}ms fetchWait={r['fetch_ms']}ms "
            f"shRead={r['sh_read']} shWrite={r['sh_write']}"
        )
        print(f"  top stages (sid, tasks, runMs): {r['top']}")


if __name__ == "__main__":
    main()
