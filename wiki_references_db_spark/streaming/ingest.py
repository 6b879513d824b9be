"""Incremental ingest of new revision bundles via Structured Streaming.

The reference gets incremental processing from per-shard marker files
(STARTED/DONE, reference:build_all.py:75-89,119-123) and resumable phase
markers (reference:dedup_staged.py:98-136).  Structured Streaming's file
source + checkpointing supplies the same exactly-once-per-file contract
natively (SURVEY §2.11): a bundle is processed exactly once across
restarts, with no marker-file bookkeeping.

``stream_revision_bundles`` is the streaming twin of
``sources.mwrev.read_mwrev_bundles`` (mapInPandas instead of an RDD
flatMap, since streaming DataFrames have no RDD view).
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from wiki_references_db_spark.plans.dedup_tables import dedup_staging
from wiki_references_db_spark.plans.stage import stage_revisions
from wiki_references_db_spark.schemas import RAW_REVISION
from wiki_references_db_spark.sources.mwrev import parse_mwrev_zst_bytes

_COLUMNS = [f.name for f in RAW_REVISION.fields]


def _parse_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows: list[dict] = []
        for path, content in zip(pdf["path"], pdf["content"]):
            rows.extend(
                parse_mwrev_zst_bytes(bytes(content), os.path.basename(path))
            )
        yield (
            pd.DataFrame(rows, columns=_COLUMNS)
            if rows
            else pd.DataFrame(columns=_COLUMNS)
        )


def stream_revision_bundles(
    spark: SparkSession, bundles_dir: str, max_files_per_trigger: int = 8
) -> DataFrame:
    """Streaming DataFrame of raw revisions from a watched bundle dir.
    One file = one parse unit (the line protocol is stateful per file)."""
    binary = (
        spark.readStream.format("binaryFile")
        .schema(
            "path string, modificationTime timestamp, length long, content binary"
        )
        .option("pathGlobFilter", "*.mwrev.zst")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(bundles_dir)
        .select("path", "content")
    )
    return binary.mapInPandas(_parse_batches, RAW_REVISION)


def ingest_available_bundles(
    spark: SparkSession,
    bundles_dir: str,
    staging_dir: str,
    checkpoint_dir: str,
    domain: str = "en.wikipedia.org",
) -> None:
    """Process all currently-available unprocessed bundles into the
    staging layer (append), then stop — the Trigger.AvailableNow form of
    the reference's build_all.py batch driver.  Re-running picks up only
    NEW bundles (checkpointed file ledger)."""
    raw = stream_revision_bundles(spark, bundles_dir)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        staging = stage_revisions(batch_df, domain=domain)
        for name, df in staging.items():
            (
                df.write.mode("append")
                .option("compression", "zstd")
                .parquet(f"{staging_dir}/{name}")
            )

    (
        raw.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def compact_staging(
    spark: SparkSession, staging_dir: str, deduped_dir: str
) -> None:
    """Phase-1.5 over the accumulated incremental staging output: global
    dedup into the consolidated layer (idempotent, overwrite)."""
    from wiki_references_db_spark.plans.stage import read_staging

    staging = read_staging(spark, staging_dir)
    for name, df in dedup_staging(staging).items():
        (
            df.write.mode("overwrite")
            .option("compression", "zstd")
            .parquet(f"{deduped_dir}/{name}")
        )
