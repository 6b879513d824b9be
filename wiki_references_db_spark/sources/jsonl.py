"""Legacy JSONL(+zstd) staging-shard glue (SURVEY.md §2.1 S3/S4).

The reference's first-generation staging format was newline-delimited
JSON compressed with zstd (writer reference:build_db.py:183-219, reader
reference:dedup_staged.py:187-217); parquet replaced it, but a user
migrating old shards still needs to read and write the format.

Two paths:

- **Native** (``read_jsonl`` / ``write_jsonl``): Spark's JSON source with
  any codec the JVM has (gzip/deflate/bzip2/lz4/snappy).  PERMISSIVE
  corrupt-record capture mirrors the reference reader's
  skip-damaged-line loop.
- **zstd** (``read_jsonl_zst`` / ``write_jsonl_zst``): text-source zstd
  needs native Hadoop, absent from pip-installed Spark, so the codec
  goes through pyarrow with ONE TASK PER SHARD — but the JSON
  encode/decode itself stays JVM-side (``to_json`` / ``from_json``), so
  Python only moves opaque bytes.  Shard size is bounded by the
  writer's file rotation (the reference rotated staging shards the same
  way), so whole-shard reads are safe.

Scale notes: both readers parallelize across shard files (one task per
file — the reference's subprocess-per-file model); the zstd writer
emits one shard per input partition and returns a manifest, and assumes
``path`` is on storage every executor can reach (as the reference's
staging directory was).
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType, StringType

CORRUPT_COL = "_corrupt_record"


def write_jsonl(df: DataFrame, path: str, compression: str = "gzip") -> None:
    """Spark-native JSONL shard writer (S3) for JVM-available codecs."""
    df.write.mode("overwrite").option("compression", compression).json(path)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType,
    mode: str = "PERMISSIVE",
) -> DataFrame:
    """Spark-native JSONL reader (S4) with corrupt-record capture: bad
    lines land in ``_corrupt_record`` instead of killing the scan
    (PERMISSIVE), mirroring reference:dedup_staged.py:198-205's
    skip-and-count loop.  Pass mode="FAILFAST" for strict loads."""
    full = schema
    if mode.upper() == "PERMISSIVE" and CORRUPT_COL not in schema.fieldNames():
        full = StructType(
            list(schema.fields) + [StructField(CORRUPT_COL, StringType(), True)]
        )
    return (
        spark.read.schema(full)
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def write_jsonl_zst(df: DataFrame, path: str) -> list[dict]:
    """Write ``df`` as ``part-NNNNN.jsonl.zst`` shards, one per input
    partition; returns the shard manifest (path, rows, bytes).  JSON
    encoding is JVM-side ``to_json``; Python compresses opaque byte
    blocks via pyarrow's zstd codec (standard frames — the reference's
    files interoperate)."""
    os.makedirs(path, exist_ok=True)
    lines = df.select(
        F.to_json(F.struct(*[F.col(c) for c in df.columns])).alias("line")
    )

    def _write(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId()
        shard = os.path.join(path, f"part-{pid:05d}.jsonl.zst")
        # Task attempts are not exclusive: speculation or a retry racing
        # a zombie first attempt can run two writers for the same
        # partition concurrently.  Write to an attempt-unique temp name
        # and atomically rename into place — whichever attempt replaces
        # last wins whole, never an interleaved shard.  The ".tmp"
        # suffix keeps half-written files out of the "*.jsonl.zst"
        # read glob.
        tmp = f"{shard}.{ctx.taskAttemptId()}.tmp"
        n_rows = 0
        out = None
        for batch in batches:
            if len(batch) == 0:
                continue
            if out is None:
                out = pa.output_stream(tmp, compression="zstd")
            payload = ("\n".join(batch["line"]) + "\n").encode("utf-8")
            out.write(payload)
            n_rows += len(batch)
        if out is None:
            return  # empty partition -> no shard file
        out.close()
        # Manifest bytes come from OUR attempt's file, stat'ed before the
        # rename so a racing attempt can't swap the inode underneath;
        # both attempts produce identical content for the partition, so
        # the number is correct whichever rename lands last.
        n_bytes = os.path.getsize(tmp)
        os.replace(tmp, shard)
        yield pd.DataFrame({"shard": [shard], "rows": [n_rows], "bytes": [n_bytes]})

    manifest = lines.mapInPandas(_write, schema="shard string, rows long, bytes long")
    return [r.asDict() for r in manifest.collect()]


def read_jsonl_zst(
    spark: SparkSession,
    path_or_glob: str,
    schema: StructType,
    mode: str = "PERMISSIVE",
) -> DataFrame:
    """Read ``*.jsonl.zst`` shards (S4).  binaryFile scan -> per-shard
    pyarrow zstd decode + line split in Arrow batches -> JVM-side
    ``from_json`` with corrupt-record capture.  One shard = one task."""
    binary = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.jsonl.zst")
        .load(path_or_glob)
        .select("content")
    )

    def _lines(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            for content in batch["content"]:
                text = (
                    pa.input_stream(pa.BufferReader(content), compression="zstd")
                    .read()
                    .decode("utf-8")
                )
                rows = [ln for ln in text.split("\n") if ln]
                if rows:
                    yield pd.DataFrame({"line": rows})

    lines = binary.mapInPandas(_lines, schema="line string")
    full = schema
    if mode.upper() == "PERMISSIVE" and CORRUPT_COL not in schema.fieldNames():
        full = StructType(
            list(schema.fields) + [StructField(CORRUPT_COL, StringType(), True)]
        )
    parsed = lines.select(
        F.from_json(
            F.col("line"),
            full,
            {"mode": mode, "columnNameOfCorruptRecord": CORRUPT_COL},
        ).alias("r")
    )
    return parsed.select("r.*")
