"""Run any registered query from the command line.

    python -m wiki_references_db_spark.run <query> [sf_dir] [--explain] [-n N]
    python -m wiki_references_db_spark.run --list

Shows the first N rows (default 20) or, with --explain, the formatted
physical plan — the quickest way to eyeball a plan's pushdown/broadcast
shape while developing an operator.
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="wiki_references_db_spark.run")
    p.add_argument("query", nargs="?", help="registered query name")
    p.add_argument(
        "sf_dir",
        nargs="?",
        default=None,
        help="testdata dir (default $SPARK_GRAFT_SF_DIR or sf0.001)",
    )
    p.add_argument("--list", action="store_true", help="list registered queries")
    p.add_argument("--explain", action="store_true", help="print formatted plan")
    p.add_argument("-n", type=int, default=20, help="rows to show")
    args = p.parse_args(argv)

    from wiki_references_db_spark.queries import all_queries

    queries = all_queries()
    if args.list or not args.query:
        for name in queries:
            print(name)
        return 0
    if args.query not in queries:
        print(f"unknown query: {args.query}", file=sys.stderr)
        return 2

    import os

    sf_dir = args.sf_dir or os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"
    )
    from wiki_references_db_spark.session import get_spark

    spark = get_spark(app_name=f"run-{args.query}")
    spark.sparkContext.setLogLevel("ERROR")
    df = queries[args.query](spark, sf_dir)
    if args.explain:
        df.explain("formatted")
    else:
        df.show(args.n, truncate=False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
