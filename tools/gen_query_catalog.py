#!/usr/bin/env python3
"""Regenerate QUERIES.md: one line per registered query (driver-window
position, defining module, first docstring sentence).

    python tools/gen_query_catalog.py > QUERIES.md
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def first_sentence(doc: str | None) -> str:
    if not doc:
        return ""
    text = " ".join(doc.split())
    for stop in (". ", ".\n"):
        if stop in text:
            return text[: text.index(stop) + 1]
    return text


def main() -> None:
    from wiki_references_db_spark.queries import _DRIVER_WINDOW, all_queries

    queries = all_queries()
    print("# Query catalog")
    print()
    print(
        f"{len(queries)} registered queries, every one value-hash-checked "
        "against a DuckDB oracle (tests/test_oracle_parity.py) at "
        "sf0.001/sf0.01/sf0.1.  The first 50 are the driver's per-round "
        "correctness window (see queries/__init__.py for the rotation "
        "policy).  Regenerate with `python tools/gen_query_catalog.py > "
        "QUERIES.md`."
    )
    print()
    print("| # | Query | Module | What it does |")
    print("|---|---|---|---|")
    for i, (name, fn) in enumerate(queries.items(), 1):
        mod = fn.__module__.rsplit(".", 1)[-1]
        win = " (window)" if name in _DRIVER_WINDOW else ""
        desc = first_sentence(fn.__doc__).replace("|", "\\|")
        print(f"| {i}{win} | `{name}` | {mod} | {desc} |")


if __name__ == "__main__":
    main()
