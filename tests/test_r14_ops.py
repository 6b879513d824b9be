"""Round-14 optimization regression tests.

Pins the behaviors the r14 optimization round changed:

- ``load_table_parallel`` sizing a DIRECTORY-backed parquet table from
  the sum of its part files (the r13 form read the directory inode size
  -> splits=1 -> unconditional round-robin repartition of the payload,
  the exact cluster-scale hazard the helper exists to avoid).
"""

from __future__ import annotations

import os

import pytest

from wiki_references_db_spark.tables import (
    _bytes_conf,
    _table_size_bytes,
    load_table,
    load_table_parallel,
)


@pytest.fixture(scope="module")
def dir_sf(spark, sf_dir, tmp_path_factory):
    """An sf_dir clone where ``documents.parquet`` is a DIRECTORY of
    part files (the normal cluster layout) instead of a single file."""
    root = tmp_path_factory.mktemp("dirsf")
    src = load_table(spark, sf_dir, "documents")
    out = os.path.join(str(root), "documents.parquet")
    src.repartition(4).write.parquet(out)
    return str(root)


def test_table_size_bytes_sums_directory_parts(dir_sf, sf_dir):
    path = os.path.join(dir_sf, "documents.parquet")
    assert os.path.isdir(path)
    total = _table_size_bytes(path)
    parts = [
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".parquet")
    ]
    assert len(parts) >= 2
    assert total == sum(os.path.getsize(p) for p in parts)
    # Same ballpark as the single-file layout (not an inode size).
    single = _table_size_bytes(os.path.join(sf_dir, "documents.parquet"))
    assert total > 0.2 * single


def _has_repartition(df) -> bool:
    return "Repartition" in df._jdf.queryExecution().logical().toString()


def test_load_table_parallel_directory_no_shuffle_when_splits_cover(
    spark, dir_sf
):
    """With a tiny maxPartitionBytes the directory's natural splits
    cover the cores, so the helper must be a no-op (no repartition) —
    the r13 form repartitioned ANY directory-backed table."""
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", "1k")
        df = load_table_parallel(spark, dir_sf, "documents")
        assert not _has_repartition(df)
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)


def test_load_table_parallel_small_table_still_repartitions(spark, sf_dir):
    """The local sub-core-count layout keeps the compute repartition
    (this is what parallelizes the per-row hash chains at tiny SF)."""
    par = spark.sparkContext.defaultParallelism
    df = load_table_parallel(spark, sf_dir, "documents")
    size = _table_size_bytes(os.path.join(sf_dir, "documents.parquet"))
    max_pb = _bytes_conf(
        spark, "spark.sql.files.maxPartitionBytes", 128 * 1024 * 1024
    )
    expect_noop = -(-size // max_pb) >= par
    assert _has_repartition(df) == (not expect_noop)


def test_load_table_parallel_directory_row_parity(spark, dir_sf, sf_dir):
    a = load_table_parallel(spark, dir_sf, "documents").count()
    b = load_table(spark, sf_dir, "documents").count()
    assert a == b
