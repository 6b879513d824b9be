#!/usr/bin/env python3
"""Stress-scale the STREAMING SimHash near-dup probe:
``stream_simhash_vs_corpus`` ships with a local-parity row and a plan
docstring; this tool measures the claim the docstring makes — that
per-batch cost tracks DELTA size, not corpus size, and that the 100 TB
form's corpus side (the pigeonhole block index persisted as a BUCKETED
table on (b, blk)) stays exchange-free in every micro-batch plan.

Mirrors tools/stress_cdc_streaming.py: a real Structured Streaming job
(file source, foreachBatch probe, maxFilesPerTrigger=1) runs an
IDENTICAL fixed-size document delta against the 1x and the Kx corpus's
block index; per-batch wall-clock is reported for both, and any
Exchange planned on the bucketed corpus side fails the run.

The corpus-side bucket SCAN does grow with the corpus — that read cost
is reported honestly inside the growth factor rather than excluded
(pigeonhole occupancy grows as n_corpus / 2^16 per block, so candidate
volume per delta doc grows linearly in corpus size at fixed delta; the
exchange-free property is what this harness pins).

Usage: python tools/stress_simhash_streaming.py [K] [n_batches]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, functions as F

from wiki_references_db_spark.plans.bucketing import write_bucketed
from wiki_references_db_spark.queries.training import (
    _fp_halves,
    _HAMMING64_INT_SPARK,
    _SIMHASH_BLOCK_CAP,
    _SIMHASH_HAM_K,
    _simhash_over,
)
from wiki_references_db_spark.session import get_spark
from wiki_references_db_spark.tables import load_table

BASE = "/root/testdata/sf0.1"

_BLOCK_EXPR = (
    "transform(sequence(0, 3), i -> struct(i AS b,"
    " substring(simhash64, i * 16 + 1, 16) AS blk))"
)


def inflate_documents(spark: SparkSession, k: int, out_dir: str) -> None:
    """Kx document corpus by key-shifted, token-suffixed replication —
    the SAME replica rule as tools/stress_scale.py's inflate: replicas
    are NEW content with distinct fingerprints, so a 10x corpus means
    ~10x DISTINCT block-index entries rather than 10x multiplicity per
    entry (block occupancy grows linearly, as at production scale)."""
    df = load_table(spark, BASE, "documents")
    shift = df.agg(F.max("doc_id")).first()[0] + 1
    parts = []
    for i in range(k):
        p = df.withColumn("doc_id", F.col("doc_id") + F.lit(i * shift))
        if i > 0:
            p = p.withColumn(
                "text",
                F.expr(
                    "array_join(transform(split(coalesce(text, ''), ' '),"
                    f" x -> concat(x, '_r{i}')), ' ')"
                ),
            )
        parts.append(p)
    out: DataFrame = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.write.mode("overwrite").parquet(
        os.path.join(out_dir, "documents.parquet")
    )


def run_streaming_probe(
    spark: SparkSession,
    corpus_dir: str,
    delta_dir: str,
    table: str,
    index_path: str,
    n_batches: int,
) -> tuple[list[float], int, int]:
    """Build the corpus's BUCKETED (b, blk) block index (the 100 TB
    form of the registered query's cap-filtered block frame), then
    stream the delta files through the foreachBatch probe, timing each
    batch.  Returns (per-batch seconds, total verified near-dup pairs,
    corpus-side exchange count observed across every per-batch plan)."""
    corpus = load_table(spark, corpus_dir, "documents").filter(
        F.col("doc_id") % 10 != 0
    )
    cblocks = _simhash_over(corpus).select(
        "doc_id", "simhash64", *_fp_halves()
    ).select(
        F.col("doc_id").alias("corpus_doc"),
        F.col("ha").alias("ha_b"),
        F.col("hb").alias("hb_b"),
        F.explode(F.expr(_BLOCK_EXPR)).alias("e"),
    ).select("corpus_doc", "ha_b", "hb_b", "e.b", "e.blk")
    ckept = (
        cblocks.groupBy("b", "blk")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= _SIMHASH_BLOCK_CAP)
        .select("b", "blk")
    )
    write_bucketed(
        cblocks.join(ckept, ["b", "blk"]).select(
            "b", "blk", "corpus_doc", "ha_b", "hb_b"
        ),
        table,
        ["b", "blk"],
        8,
        path=index_path,
    )
    index = spark.table(table)

    times: list[float] = []
    pair_total = [0]
    corpus_side_exchanges = [0]

    def process(batch_df: DataFrame, batch_id: int) -> None:
        t0 = time.perf_counter()
        nfp = _simhash_over(batch_df.select("doc_id", "text")).select(
            "doc_id", "simhash64", *_fp_halves()
        ).localCheckpoint(eager=True)
        nblocks = nfp.select(
            F.col("doc_id").alias("new_doc"),
            F.col("ha").alias("ha_a"),
            F.col("hb").alias("hb_a"),
            F.explode(F.expr(_BLOCK_EXPR)).alias("e"),
        ).select("new_doc", "ha_a", "hb_a", "e.b", "e.blk")
        cand = (
            nblocks.join(index, ["b", "blk"])
            .select("new_doc", "corpus_doc", "ha_a", "hb_a", "ha_b", "hb_b")
            .distinct()
        )
        result = (
            cand.withColumn("hamming", F.expr(_HAMMING64_INT_SPARK))
            .filter(F.col("hamming") <= _SIMHASH_HAM_K)
            .select("new_doc", "corpus_doc", "hamming")
        )
        plan = result._jdf.queryExecution().executedPlan().toString()
        for line in plan.splitlines():
            if "Exchange hashpartitioning" in line and "blk" in line:
                corpus_side_exchanges[0] += 1
        pair_total[0] += result.count()
        times.append(time.perf_counter() - t0)

    schema = spark.read.parquet(delta_dir).schema
    src = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(delta_dir)
    ckpt = tempfile.mkdtemp(prefix="ckpt_stress_simhash_")
    q = (
        src.writeStream.foreachBatch(process)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    shutil.rmtree(ckpt, ignore_errors=True)
    assert len(times) == n_batches, (len(times), n_batches)
    return times, pair_total[0], corpus_side_exchanges[0]


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark(app_name="stress-simhash-streaming")
    spark.sparkContext.setLogLevel("ERROR")

    work = tempfile.mkdtemp(prefix="stress_simhash_stream_")
    big_dir = os.path.join(work, "big")
    inflate_documents(spark, k, big_dir)

    # Fixed delta: the base corpus's doc_id % 10 == 0 slice (the same
    # "live crawl" slice the registered query streams), split into
    # n_batches files — IDENTICAL for both corpus sizes, so per-batch
    # growth isolates the corpus-size effect.
    delta_dir = os.path.join(work, "delta")
    delta = (
        load_table(spark, BASE, "documents")
        .filter(F.col("doc_id") % 10 == 0)
        .repartition(n_batches)
    )
    delta.write.mode("overwrite").parquet(delta_dir)
    n_delta = spark.read.parquet(delta_dir).count()

    results = {}
    for label, corpus_dir in (("1x", BASE), (f"{k}x", big_dir)):
        table = f"stress_simhash_index_{label}"
        times, pairs, cexch = run_streaming_probe(
            spark,
            corpus_dir,
            delta_dir,
            table,
            os.path.join(work, table),
            n_batches,
        )
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        spark.catalog.clearCache()
        results[label] = (times, pairs, cexch)
        print(
            f"{label:>4s}: per-batch {['%.3f' % t for t in times]} s "
            f"(delta {n_delta} docs / {n_batches} batches), "
            f"verified pairs {pairs}, corpus-side exchanges {cexch}"
        )
        if cexch:
            print("FAIL: bucketed corpus side planned an Exchange")
            sys.exit(1)

    # steady-state comparison: drop each run's first batch (session/JIT
    # warm-up lands there) and compare the remaining means.
    small = results["1x"][0][1:]
    big = results[f"{k}x"][0][1:]
    g = (sum(big) / len(big)) / (sum(small) / len(small))
    print(
        f"steady-state per-batch growth {g:.1f}x on a {k}x corpus "
        f"(delta fixed at {n_delta} docs; corpus-side bucket-scan growth "
        f"included, exchange-free on the corpus side at both sizes)"
    )
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
