#!/usr/bin/env python3
"""One-command oracle-parity release check: the same pass/fail table
the external driver records in CORRECTNESS_r{N}.json, over the ENTIRE
registry (the driver only sees the first 50), printed locally.

    python tools/check_parity.py                 # sf0.01, full registry
    python tools/check_parity.py --sf sf0.1      # bench scale
    python tools/check_parity.py --only q1_pricing_summary dedup_exact
    python tools/check_parity.py --window        # the 50 driver slots only

Exit code 0 iff every checked query passes rows + schema + value-hash
at driver strictness (wiki_references_db_spark/oracle.py).  Run this
before any release/round cut: with all 229 queries driver-green as of
round 8, this is the standing defense against post-rotation drift —
no driver window slot is needed to re-certify a refactor locally.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="sf0.01", help="testdata dir name or path")
    ap.add_argument("--only", nargs="*", help="check only these query names")
    ap.add_argument(
        "--window",
        action="store_true",
        help="check only the 50 driver-window slots (registry order)",
    )
    args = ap.parse_args()
    sf_dir = (
        args.sf if os.path.isdir(args.sf) else f"/root/testdata/{args.sf}"
    )

    from wiki_references_db_spark.oracle import check_query
    from wiki_references_db_spark.queries import (
        _DRIVER_WINDOW,
        all_oracles,
        all_queries,
    )
    from wiki_references_db_spark.session import get_spark

    qs, oracles = all_queries(), all_oracles()
    names = list(qs)
    if args.window:
        names = list(_DRIVER_WINDOW)
    if args.only:
        unknown = sorted(set(args.only) - set(qs))
        if unknown:
            print(f"unknown queries: {unknown}", file=sys.stderr)
            return 2
        names = args.only

    spark = get_spark(app_name="wikirefs-parity")
    spark.sparkContext.setLogLevel("ERROR")

    width = max(len(n) for n in names)
    failures: list[str] = []
    t_total = time.perf_counter()
    for name in names:
        t0 = time.perf_counter()
        try:
            res = check_query(spark, name, qs[name], oracles[name], sf_dir)
            ok, detail = res.ok, res.detail
            rows = f"{res.spark_rows}r"
        except Exception as exc:  # harness-level failure is a failure
            ok, detail, rows = False, repr(exc)[:160], "-"
        dt = time.perf_counter() - t0
        status = "pass" if ok else "FAIL"
        line = f"{status}  {name:<{width}}  {rows:>8}  {dt:6.1f}s"
        if not ok:
            line += f"  {detail}"
            failures.append(name)
        print(line, flush=True)
        spark.catalog.clearCache()
    total = time.perf_counter() - t_total
    print(
        f"\n{len(names) - len(failures)}/{len(names)} pass at {sf_dir} "
        f"in {total:.0f}s"
        + (f"; FAILURES: {failures}" if failures else "")
    )
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
