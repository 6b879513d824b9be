#!/usr/bin/env python3
"""Measure the winnowing recall/cost knobs that
``winnowing_recall_eval``'s docstring cites: hold the GROUND TRUTH
fixed (pairs sharing a non-boilerplate guarantee-gram, boilerplate
defined at the module-default cap) and vary the generator's fingerprint
document-frequency cap and its shared-fingerprint evidence threshold
independently, reporting recall against that fixed truth and the
candidate-pair count each setting buys it with.

Usage: python tools/winnow_cap_trade.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wiki_references_db_spark.queries.training import (
    _WINNOW_DF_CAP,
    _WINNOW_MIN_SHARED,
    _winnowing_pair_frame,
    _winnowing_truth_frame,
)
from wiki_references_db_spark.session import get_spark

# (df_cap, min_shared) grid: one axis swept at a time around the
# registered default so each knob's effect is attributable.
SETTINGS = [
    (10, 2), (20, 2), (50, 2), (100, 2),  # cap sweep at default threshold
    (20, 1), (20, 3),                     # threshold sweep at default cap
    (50, 1),                              # guarantee check, relaxed cap
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="winnow-cap-trade")
    spark.sparkContext.setLogLevel("ERROR")

    truth = _winnowing_truth_frame(spark, sf_dir).localCheckpoint(eager=True)
    n_true = truth.count()
    print(f"{sf_dir}: fixed truth (cap {_WINNOW_DF_CAP} boilerplate "
          f"exclusion) = {n_true} pairs")
    print(f"{'cap':>5s} {'min_shared':>11s} {'pairs':>9s} {'captured':>9s} "
          f"{'recall_ppm':>11s}")
    for cap, ms in SETTINGS:
        pairs = _winnowing_pair_frame(
            spark, sf_dir, df_cap=cap, min_shared=ms
        )
        n_pairs = pairs.count()
        hit = truth.join(
            pairs.select("doc_a", "doc_b"), ["doc_a", "doc_b"]
        ).count()
        ppm = round(hit / n_true * 1_000_000) if n_true else 0
        mark = (
            "  <-- registered default"
            if (cap, ms) == (_WINNOW_DF_CAP, _WINNOW_MIN_SHARED)
            else ""
        )
        print(f"{cap:5d} {ms:11d} {n_pairs:9d} {hit:9d} {ppm:11d}{mark}")
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
