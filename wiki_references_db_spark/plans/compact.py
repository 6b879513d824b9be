"""Small-file compaction for parquet table directories.

The streaming ingest (streaming/ingest.py) and any incremental writer
produce one-file-per-micro-batch layouts; at scale the resulting
many-small-files problem dominates scan planning (listing, footer reads,
one task per tiny file).  ``compact_parquet`` rewrites a directory to
~``target_mb`` files — the maintenance op every parquet warehouse runs
(Delta OPTIMIZE / Iceberg rewrite_data_files, here dependency-free).

Sizing is metadata-only (filesystem listing; no data read before the
single rewrite scan).  With ``sort_by`` the rewrite range-partitions on
the given columns before writing, so each output file covers a disjoint
key range and min/max row-group pruning works after compaction — the
same motivation as plans/bucketing.py, for read patterns keyed on a
sort prefix rather than a join key.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import SparkSession


def compact_parquet(
    spark: SparkSession,
    src_dir: str,
    dest_dir: str,
    target_mb: int = 128,
    sort_by: list[str] | None = None,
) -> dict:
    """Rewrite ``src_dir``'s parquet files into ``dest_dir`` at
    ~``target_mb`` per file; returns a manifest dict.  The caller swaps
    directories on success (write-then-rename, the same atomicity
    discipline as the reference's STARTED/DONE markers).

    Sizing and the manifest use DRIVER-LOCAL filesystem listing
    (glob/getsize): ``src_dir`` must be a path the driver can stat, not
    just one executors can read (no s3://, hdfs:// or
    driver-invisible mounts).  A listing that comes back empty raises
    rather than silently compacting to 1 file with a zeroed manifest;
    porting to object storage means resolving listings through the
    Hadoop FileSystem API instead."""
    files = glob.glob(os.path.join(src_dir, "*.parquet")) + glob.glob(
        os.path.join(src_dir, "part-*")
    )
    files = sorted(set(f for f in files if os.path.isfile(f)))
    if not files:
        raise FileNotFoundError(
            f"compact_parquet: no parquet files visible to the driver at "
            f"{src_dir!r} — either the directory is empty or it is not "
            f"driver-local (this helper sizes via local glob/getsize)"
        )
    in_bytes = sum(os.path.getsize(f) for f in files)
    n_out = max(1, round(in_bytes / (target_mb * 1024 * 1024)))

    df = spark.read.parquet(src_dir)
    if sort_by:
        df = df.repartitionByRange(n_out, *sort_by).sortWithinPartitions(*sort_by)
    else:
        df = df.coalesce(n_out) if n_out < max(len(files), 1) else df.repartition(n_out)
    df.write.mode("overwrite").parquet(dest_dir)

    out_files = [
        f
        for f in glob.glob(os.path.join(dest_dir, "part-*"))
        if os.path.isfile(f) and not f.endswith(".crc")
    ]
    return {
        "in_files": len(files),
        "in_bytes": in_bytes,
        "out_files": len(out_files),
        "out_bytes": sum(os.path.getsize(f) for f in out_files),
        "target_mb": target_mb,
    }
