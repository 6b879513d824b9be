#!/usr/bin/env python3
"""Dump ``explain("formatted")`` for the named headline queries into
``plans/<round>/<query>_<suffix>.txt`` — the before/after plan evidence
the optimization rounds commit alongside each change.

Usage: python tools/dump_plans.py <round> <suffix> <query> [query ...]
e.g.   python tools/dump_plans.py r14 before dedup_embedding_cosine
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    rnd, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    from wiki_references_db_spark.queries import all_queries
    from wiki_references_db_spark.session import get_spark

    spark = get_spark(app_name="dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", rnd)
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = qs[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange mentions)")
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
