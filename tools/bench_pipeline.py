#!/usr/bin/env python3
"""Extraction-pipeline throughput: generate a synthetic .mwrev.zst corpus
(realistic wikitext: inline refs, cite templates, bare URLs, section
structure), run extract -> staging -> dedup, and report revisions/sec.

Usage: python tools/bench_pipeline.py [n_revisions] [n_bundles]
"""

from __future__ import annotations

import os
import random
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wiki_references_db_spark.plans.dedup_tables import dedup_staging
from wiki_references_db_spark.plans.stage import stage_revisions
from wiki_references_db_spark.session import get_spark
from wiki_references_db_spark.sources.mwrev import read_mwrev_bundles, write_mwrev_zst

WORDS = (
    "history culture science river mountain treaty empire village census "
    "railway battle church museum island poet engineer archive "
).split()


def make_text(rng: random.Random, page: int, rev_i: int) -> str:
    paras = []
    for s in range(3):
        body = " ".join(rng.choices(WORDS, k=60))
        n = rng.randint(0, 3)
        refs = []
        for j in range(n):
            kind = rng.randrange(3)
            k = rng.randrange(40)
            if kind == 0:
                refs.append(
                    f'<ref name=r{k}>{{{{cite web |url=https://ex{k}.example/p{page} '
                    f"|title=T{k} |year=20{k % 30:02d}}}}}</ref>"
                )
            elif kind == 1:
                refs.append(f"{{{{Sfn|Author{k}|19{50 + k % 50}|p={k}}}}}")
            else:
                refs.append(f"<ref>https://plain{k}.example/x{page}</ref>")
        paras.append(body + " " + " ".join(refs))
    paras.append("== External links ==\n* https://ext.example/e%d" % page)
    return ("\n\n".join(paras)) + f"\n<!-- rev {rev_i} -->"


def gen_bundles(out_dir: str, n_revs: int, n_bundles: int) -> None:
    rng = random.Random(42)
    per = n_revs // n_bundles
    rid = 1
    for b in range(n_bundles):
        revs = []
        for i in range(per):
            page = 1000 * (b + 1) + i // 8  # ~8 revisions per page
            revs.append(
                {
                    "page_id": page,
                    "namespace_id": 0,
                    "revision_id": rid,
                    "parent_revision_id": rid - 1 if i % 8 else None,
                    "revision_timestamp": f"2020-01-01T{(i // 3600) % 24:02d}:{(i // 60) % 60:02d}:{i % 60:02d}Z",
                    "revision_text": make_text(rng, page, rid),
                }
            )
            rid += 1
        write_mwrev_zst(os.path.join(out_dir, f"bundle-{b:03d}.mwrev.zst"), revs)


def main() -> None:
    n_revs = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    n_bundles = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    spark = get_spark(app_name="wikirefs-pipeline-bench")
    spark.sparkContext.setLogLevel("ERROR")
    with tempfile.TemporaryDirectory() as tmp:
        gen_bundles(tmp, n_revs, n_bundles)
        size_mb = sum(
            os.path.getsize(os.path.join(tmp, f)) for f in os.listdir(tmp)
        ) / 1e6
        t0 = time.perf_counter()
        raw = read_mwrev_bundles(spark, tmp)
        staging = stage_revisions(raw, domain="en.wikipedia.org")
        deduped = dedup_staging(staging)
        counts = {k: v.count() for k, v in deduped.items()}
        dt = time.perf_counter() - t0
        print(
            f"revisions={n_revs} bundles={n_bundles} zst_mb={size_mb:.1f} "
            f"wall={dt:.1f}s throughput={n_revs / dt:.0f} rev/s"
        )
        print({k: counts[k] for k in sorted(counts)})

        # Phase 2 + serving: warehouse ids/FK resolution, then the
        # flagship lifecycle endpoint on the busiest page — the
        # reference's full extract -> dedup -> load -> serve lifecycle.
        from pyspark.sql import functions as F

        from wiki_references_db_spark.plans.warehouse import build_warehouse
        from wiki_references_db_spark.queries.serving import article_citations

        from wiki_references_db_spark.plans.warehouse import read_warehouse, write_warehouse

        t0 = time.perf_counter()
        deduped = {k: v.persist() for k, v in deduped.items()}
        wh_dir = os.path.join(tmp, "warehouse")
        # The instance-keyed fact tables land BUCKETED (the production
        # layout: the 28.8B-row shuffle is paid once at write time;
        # every instance-keyed serving join/agg then plans exchange-free
        # — tests/test_warehouse_bucketing.py pins the plan shape).
        write_warehouse(
            build_warehouse(deduped),
            wh_dir,
            history_buckets=8,
            bucketed=True,
            table_prefix="pipeline_wh",
        )
        dt_wh = time.perf_counter() - t0
        busiest = (
            deduped["revisions"]
            .groupBy("page_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.col("n").desc(), F.col("page_id").asc())
            .first()
        )
        # Serve from the written warehouse (bucketed catalog reads for
        # the fact tables, parquet scans + pushdown for the rest) — the
        # production serving input.
        w = read_warehouse(spark, wh_dir, table_prefix="pipeline_wh")
        t0 = time.perf_counter()
        n_cit = article_citations(w, busiest["page_id"]).count()
        dt_q = time.perf_counter() - t0
        print(
            f"warehouse_build_write={dt_wh:.1f}s tables={len(w)} "
            f"serve_flagship={dt_q:.2f}s page={busiest['page_id']} "
            f"citations={n_cit}"
        )


if __name__ == "__main__":
    main()
