#!/usr/bin/env python3
"""Regenerate PLANS.md: the formatted physical plan of every headline
benchmark query at sf0.1, with the scale-relevant features called out
(pushed filters, pruned schemas, broadcast vs shuffle joins, codegen
spans).  Usage: python tools/gen_plans_doc.py > PLANS.md
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

FEATURES = [
    ("BroadcastHashJoin", "broadcast joins"),
    ("SortMergeJoin", "sort-merge joins"),
    ("BroadcastNestedLoopJoin", "broadcast nested-loop (1-row/param side)"),
    ("HashAggregate", "hash aggregates"),
    ("SortAggregate", "sort aggregates"),
    ("Exchange", "exchanges (shuffles/broadcasts)"),
    ("WholeStageCodegen", "codegen spans"),
    ("TakeOrderedAndProject", "top-k without global sort"),
    ("WindowGroupLimit", "window group-limit pushdown"),
    ("MapInPandas", "Arrow-batched Python stages"),
    ("PushedFilters: \\[[^]]", "scans with pushed filters"),
]


def main() -> None:
    from bench import HEADLINE
    from wiki_references_db_spark.queries import all_queries
    from wiki_references_db_spark.session import get_spark

    spark = get_spark(app_name="gen-plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()

    print("# Headline query plans (sf0.1)")
    print()
    print(
        "Formatted physical plans for every `bench.py` headline query, "
        f"captured over `{SF_DIR}`.  Regenerate with "
        "`python tools/gen_plans_doc.py > PLANS.md`.  These are the plans "
        "the plan-shape tests pin (tests/test_plan_shapes.py); the point "
        "of committing them is that a reviewer can read WHAT the engine "
        "executes without running it."
    )
    for name in HEADLINE:
        df = qs[name](spark, SF_DIR)
        doc = (qs[name].__doc__ or "").strip().split("\n\n")[0]
        doc = re.sub(r"\s+", " ", doc)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        # Count operator occurrences in the tree section only (the
        # details section repeats every node name once more).
        tree = plan.split("\n\n(1)", 1)[0]
        counts = []
        for pat, label in FEATURES:
            n = len(re.findall(pat, tree if "PushedFilters" not in pat else plan))
            if n:
                counts.append(f"{n} {label}")
        print(f"\n## {name}\n")
        if doc:
            print(f"{doc}\n")
        print(f"_Features: {'; '.join(counts) if counts else 'trivial'}_\n")
        print("```")
        # The formatted header (operator tree) plus the per-node details.
        print(plan.rstrip())
        print("```")
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
