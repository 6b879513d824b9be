#!/usr/bin/env python3
"""Stress-scale the STREAMING SemDeDup path (VERDICT r10 item 5): the
batch and incremental SemDeDup forms have measured 10x exponents
(bench_runs/r10/stress_semdedup_10x.txt); the streaming form had only
the plan pin (tests/test_bucketing.py
test_cell_index_bucketed_probe_shuffles_only_delta).  This tool runs
the REAL Structured Streaming job — file-source ledger, foreachBatch
probe of a cell-bucketed static index, maxFilesPerTrigger=1 so the
delta arrives as several micro-batches — against a 1x and a Kx corpus
with an IDENTICAL fixed-size delta stream, and reports per-batch
wall-clock for both.

What "scale-safe" means here: the DELTA is what a streaming ingest
pays for, so per-batch time must track delta size, not corpus size.
Under the %125 centroid-sample rule the corpus's CELL COUNT grows Kx
while per-cell membership stays ~flat (the rotation inflation keeps
replica geometry isomorphic — see tools/stress_scale.py), so the probe
pairs per batch vector are ~constant; the bucketed index keeps the
corpus side exchange-free (asserted on the per-batch plan at both
sizes).  The corpus-side bucket SCAN does grow with the corpus — that
read cost is reported honestly in the growth factor rather than
excluded (production bounds it with cell-range partition pruning on
top of the bucketing; the exchange-free property is what this harness
pins).

Usage: python tools/stress_semdedup_streaming.py [K] [n_batches]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from wiki_references_db_spark.plans.bucketing import write_bucketed
from wiki_references_db_spark.queries.training import (
    _IVF_CENT_MOD,
    _IVF_CENT_REM,
    _SEMDEDUP_INC_TAU,
    _dot_expr,
    _norm_expr,
    _semdedup_assign,
)
from wiki_references_db_spark.session import get_spark
from wiki_references_db_spark.tables import load_table

BASE = "/root/testdata/sf0.1"


def inflate_embeddings(spark: SparkSession, k: int, out_dir: str) -> None:
    """Kx embedding corpus by key-shifted, dimension-rotated replication
    (the SAME rotation helper as tools/stress_scale.py's inflate, so
    this harness's corpus shape stays comparable to the batch stress
    numbers it sits beside: each replica is NEW content with
    base-isomorphic geometry, so cells multiply instead of
    densifying)."""
    from tools.stress_scale import EMBED_ROTATION_MAX_K, rotated_embedding_expr

    assert k <= EMBED_ROTATION_MAX_K, (
        f"rotation supports k <= {EMBED_ROTATION_MAX_K}, got {k}"
    )
    df = load_table(spark, BASE, "embeddings")
    shift = df.agg(F.max("vec_id")).first()[0] + 1
    parts = []
    for i in range(k):
        p = df.withColumn("vec_id", F.col("vec_id") + F.lit(i * shift))
        if i > 0:
            p = p.withColumn("embedding", F.expr(rotated_embedding_expr(i)))
        parts.append(p)
    out: DataFrame = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.write.mode("overwrite").parquet(
        os.path.join(out_dir, "embeddings.parquet")
    )


def run_streaming_probe(
    spark: SparkSession,
    corpus_dir: str,
    delta_dir: str,
    table: str,
    index_path: str,
    n_batches: int,
) -> tuple[list[float], int, int]:
    """Build the corpus's bucketed cell index, then stream the delta
    files through the foreachBatch probe (one file per micro-batch),
    timing each batch.  Returns (per-batch seconds, total hit rows,
    corpus-side exchange count observed in the probe plan)."""
    e, assign = _semdedup_assign(spark, corpus_dir)
    corpus = (
        assign.join(e.select("vec_id", "embedding"), "vec_id")
        .filter(~(F.col("vec_id") % 10 == 3))
        .select(
            F.col("cell").alias("cell_c"),
            F.col("embedding").alias("ec"),
            F.expr(_norm_expr("embedding")).alias("nrm_c"),
        )
    )
    write_bucketed(corpus, table, ["cell_c"], 8, path=index_path)
    index = spark.table(table)
    cents = (
        e.filter(F.col("vec_id") % _IVF_CENT_MOD == _IVF_CENT_REM)
        .select(
            F.col("vec_id").alias("cent_id"),
            F.col("embedding").alias("ce"),
            F.expr(_norm_expr("embedding")).alias("nrm_cent"),
        )
        .localCheckpoint(eager=True)
    )

    times: list[float] = []
    hits_total = [0]
    corpus_side_exchanges = [0]

    def process(batch_df: DataFrame, batch_id: int) -> None:
        t0 = time.perf_counter()
        b = batch_df.select(
            "vec_id",
            F.col("embedding").alias("eb"),
            F.expr(_norm_expr("embedding")).alias("nrm_b"),
        ).localCheckpoint(eager=True)
        cos = b.crossJoin(F.broadcast(cents)).select(
            "vec_id",
            "eb",
            "nrm_b",
            "cent_id",
            (
                F.expr(_dot_expr("eb", "ce"))
                / (F.col("nrm_b") * F.col("nrm_cent"))
            ).alias("cosine"),
        )
        w = Window.partitionBy("vec_id").orderBy(
            F.col("cosine").desc(), F.col("cent_id")
        )
        memb = (
            cos.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("vec_id", F.col("cent_id").alias("cell"), "eb", "nrm_b")
        )
        probe = memb.join(index, F.col("cell") == F.col("cell_c")).filter(
            F.expr(_dot_expr("eb", "ec")) / (F.col("nrm_b") * F.col("nrm_c"))
            >= _SEMDEDUP_INC_TAU
        )
        plan = probe._jdf.queryExecution().executedPlan().toString()
        for line in plan.splitlines():
            if "Exchange hashpartitioning" in line and "cell_c" in line:
                corpus_side_exchanges[0] += 1
        hits_total[0] += probe.count()
        times.append(time.perf_counter() - t0)

    schema = spark.read.parquet(delta_dir).schema
    src = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(delta_dir)
    ckpt = tempfile.mkdtemp(prefix="ckpt_stress_semdedup_")
    q = (
        src.writeStream.foreachBatch(process)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    shutil.rmtree(ckpt, ignore_errors=True)
    assert len(times) == n_batches, (len(times), n_batches)
    return times, hits_total[0], corpus_side_exchanges[0]


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark(app_name="stress-semdedup-streaming")
    spark.sparkContext.setLogLevel("ERROR")

    work = tempfile.mkdtemp(prefix="stress_semdedup_stream_")
    big_dir = os.path.join(work, "big")
    inflate_embeddings(spark, k, big_dir)

    # Fixed delta: the base corpus's vec_id % 10 == 3 slice, split into
    # n_batches files — IDENTICAL for both corpus sizes, so per-batch
    # growth isolates the corpus-size effect.
    delta_dir = os.path.join(work, "delta")
    delta = (
        load_table(spark, BASE, "embeddings")
        .filter(F.col("vec_id") % 10 == 3)
        .repartition(n_batches)
    )
    delta.write.mode("overwrite").parquet(delta_dir)
    n_delta = spark.read.parquet(delta_dir).count()

    results = {}
    for label, corpus_dir in (("1x", BASE), (f"{k}x", big_dir)):
        table = f"stress_cell_index_{label}"
        times, hits, cexch = run_streaming_probe(
            spark,
            corpus_dir,
            delta_dir,
            table,
            os.path.join(work, table),
            n_batches,
        )
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        spark.catalog.clearCache()
        results[label] = (times, hits, cexch)
        print(
            f"{label:>4s}: per-batch {['%.3f' % t for t in times]} s "
            f"(delta {n_delta} vecs / {n_batches} batches), "
            f"hits {hits}, corpus-side exchanges {cexch}"
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
        f"(delta fixed at {n_delta} vectors; corpus-side scan growth "
        f"included, exchange-free on the corpus side at both sizes)"
    )
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
