#!/usr/bin/env python3
"""Stage-level breakdown of one or more headline queries: runs each
query once (warm) with a job group, then dumps per-stage wall-clock,
task counts and shuffle bytes from the UI REST API — the local stand-in
for the Stages tab the optimization guide (§1.1, §7.1) starts from.

Usage: python tools/stage_breakdown.py q1 q2 ...
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
    from wiki_references_db_spark.queries import all_queries
    from wiki_references_db_spark.session import get_spark

    spark = get_spark(app_name="stage-breakdown", extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    def rest(path: str):
        with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/{path}") as r:
            return json.load(r)

    names = sys.argv[1:]
    for name in names:
        fn = qs[name]
        # warm
        fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
        df = fn(spark, SF_DIR)
        group = f"breakdown-{name}"
        spark.sparkContext.setJobGroup(group, name)
        t0 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        wall = time.perf_counter() - t0
        spark.sparkContext.setJobGroup(None, None)
        spark.catalog.clearCache()

        jobs = [j for j in rest("jobs") if j.get("jobGroup") == group]
        print(f"\n=== {name}: wall {wall:.3f}s, {len(jobs)} jobs ===")
        total_stage_ms = 0
        rows = []
        for j in sorted(jobs, key=lambda j: j["jobId"]):
            jsub = j["submissionTime"]
            for sid in sorted(j["stageIds"]):
                try:
                    infos = rest(f"stages/{sid}")
                except Exception:
                    continue
                for s in infos:
                    if s["status"] not in ("COMPLETE", "SKIPPED"):
                        continue
                    if s["status"] == "SKIPPED":
                        rows.append((j["jobId"], sid, 0, 0, "SKIPPED", s["name"].split("\n")[0]))
                        continue
                    dur = s.get("executorRunTime", 0)
                    sub = s.get("firstTaskLaunchedTime") or s.get("submissionTime")
                    comp = s.get("completionTime")
                    wall_ms = 0
                    if sub and comp:
                        from datetime import datetime
                        fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
                        try:
                            wall_ms = (datetime.strptime(comp, fmt) - datetime.strptime(sub, fmt)).total_seconds() * 1000
                        except Exception:
                            pass
                    total_stage_ms += wall_ms
                    rows.append((j["jobId"], sid, s["numCompleteTasks"], wall_ms,
                                 f"run={dur}ms sr={s.get('shuffleReadBytes',0)} sw={s.get('shuffleWriteBytes',0)}",
                                 s["name"].split("\n")[0]))
        for r in rows:
            print(f"  job{r[0]:3d} stage{r[1]:4d} tasks={r[2]:3d} wall={r[3]:7.0f}ms {r[4]:40s} {r[5][:70]}")
        print(f"  sum stage wall: {total_stage_ms/1000:.3f}s vs query wall {wall:.3f}s (gap = driver/scheduling)")


if __name__ == "__main__":
    main()
