#!/usr/bin/env python3
"""Per-query run-to-run variance envelope across repeated full bench.py
runs (fresh JVM each), and a verdict on whether a pair of driver rounds'
per-query deltas fall inside that envelope.

The round-8 question this answers: the driver bench total climbed
21.06 s (r7) -> 23.75 s (r8, +12.8%) while the oracle got faster, with
12 sub-second queries regressing 1.3-1.9x on code paths untouched that
round.  Is that real, or within what identical code shows across
sessions?

Usage:
  python tools/bench_variance.py run1.json run2.json [run3.json ...] \
      [--compare BENCH_r07.json BENCH_r08.json]

Each runN.json is the two-line output of one `python bench.py`
invocation (the extended line + the final line; only the final line's
`queries` dict and totals are used).
"""

from __future__ import annotations

import json
import sys


def load_final(path: str) -> dict:
    text = open(path).read()
    try:
        whole = json.loads(text)
        if isinstance(whole, dict) and "tail" in whole:
            # Driver BENCH_rN.json: a recorder wrapper whose `tail`
            # string holds the bench stdout's last 2000 chars — the
            # final self-contained JSON line lives in there.
            text = whole["tail"]
        elif isinstance(whole, dict) and "queries" in whole:
            return whole
    except json.JSONDecodeError:
        pass
    candidates = []
    for line in text.splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                candidates.append(json.loads(line))
            except json.JSONDecodeError:
                continue
    for d in reversed(candidates):
        if "queries" in d:
            return d
    raise SystemExit(f"{path}: no bench line with a 'queries' dict")


def main() -> None:
    args = sys.argv[1:]
    compare: list[str] = []
    if "--compare" in args:
        i = args.index("--compare")
        compare = args[i + 1 :]
        args = args[:i]
        # --compare takes EXACTLY two round files; anything else is a
        # usage error, not a silent truncation/skip (ADVICE r9).
        if len(compare) != 2:
            raise SystemExit(
                f"--compare takes exactly 2 files, got {len(compare)}: "
                f"{compare}\n\n{__doc__}"
            )
    if len(args) < 2:
        raise SystemExit(__doc__)

    runs = [load_final(p) for p in args]
    names = list(runs[0]["queries"])
    print(f"{len(runs)} same-container runs of identical code:")
    totals = [r["value"] for r in runs]
    oracles = [r.get("oracle_total_sec") for r in runs]
    print(f"  spark totals : {totals}  "
          f"spread {max(totals) / min(totals):.3f}x")
    if all(oracles):
        print(f"  oracle totals: {oracles}  "
              f"spread {max(oracles) / min(oracles):.3f}x")
    # A folded-in DRIVER draw predates the current round's bench
    # additions, so its query set may be a strict subset (that is the
    # POINT of folding it in — the envelope max must bound the driver's
    # observed draws).  Raw totals above then mix list lengths; the
    # comparable number is the shared-prefix total.
    shared_names = [
        n for n in names if all(n in r["queries"] for r in runs)
    ]
    if len(shared_names) != len(names):
        sp = [round(sum(r["queries"][n] for n in shared_names), 3)
              for r in runs]
        print(
            f"  shared-prefix totals ({len(shared_names)} of "
            f"{len(names)} queries present in every input): {sp}  "
            f"spread {max(sp) / min(sp):.3f}x"
        )

    print(f"\n{'query':34s} {'min':>7s} {'max':>7s} {'spread':>7s}")
    spreads = {}
    for n in names:
        vals = [r["queries"][n] for r in runs if n in r["queries"]]
        lo, hi = min(vals), max(vals)
        spreads[n] = hi / lo if lo else float("inf")
        flag = "  <-- bimodal" if spreads[n] > 1.5 else ""
        part = f"  ({len(vals)}/{len(runs)} runs)" if len(vals) != len(runs) else ""
        print(f"{n:34s} {lo:7.3f} {hi:7.3f} {spreads[n]:6.2f}x{flag}{part}")
    over = sorted(spreads.values(), reverse=True)
    print(
        f"\nper-query spread on IDENTICAL code: median "
        f"{sorted(spreads.values())[len(spreads) // 2]:.2f}x, "
        f"p90 {over[len(over) // 10]:.2f}x, max {over[0]:.2f}x"
    )

    if len(compare) == 2:
        a, b = load_final(compare[0]), load_final(compare[1])
        shared = [n for n in a["queries"] if n in b["queries"] and n in spreads]
        outside = []
        for n in shared:
            va, vb = a["queries"][n], b["queries"][n]
            delta = (vb / va) if va else float("inf")
            if delta > spreads[n] and delta > 1.3:
                outside.append((n, va, vb, delta, spreads[n]))
        print(
            f"\ncross-round deltas ({compare[0]} -> {compare[1]}) vs the "
            f"measured envelope: {len(outside)} of {len(shared)} shared "
            f"queries regress beyond both 1.3x and their own same-code "
            f"spread"
        )
        for n, va, vb, delta, env in sorted(
            outside, key=lambda t: -t[3]
        ):
            print(f"  {n:34s} {va:.3f} -> {vb:.3f} ({delta:.2f}x; "
                  f"same-code spread {env:.2f}x)")
        if not outside:
            print("  -> every cross-round delta is inside the same-code "
                  "envelope: session noise, not regression")


if __name__ == "__main__":
    main()
