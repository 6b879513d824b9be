"""Small-file compaction (plans/compact.py): fewer files, same rows,
and range-sorted output files with disjoint key ranges when sort_by is
given (min/max pruning survives compaction)."""

import glob
import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from wiki_references_db_spark.plans.compact import compact_parquet
from wiki_references_db_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def _fragmented(spark, tmp_path, n=40):
    src = str(tmp_path / "frag")
    load_table(spark, SF_DIR, "orders").repartition(n).write.parquet(src)
    return src


def test_compaction_reduces_files_preserves_rows(spark, tmp_path):
    src = _fragmented(spark, tmp_path)
    dest = str(tmp_path / "compact")
    manifest = compact_parquet(spark, src, dest, target_mb=128)
    assert manifest["in_files"] == 40
    assert manifest["out_files"] < manifest["in_files"]
    a = spark.read.parquet(src)
    b = spark.read.parquet(dest)
    assert a.count() == b.count()
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_sorted_compaction_gives_disjoint_ranges(spark, tmp_path):
    src = _fragmented(spark, tmp_path)
    dest = str(tmp_path / "sorted")
    # Force multiple output files regardless of tiny input size.
    orders_bytes = sum(
        os.path.getsize(f) for f in glob.glob(os.path.join(src, "part-*"))
    )
    target_mb = max(1, int(orders_bytes / (4 * 1024 * 1024)))  # aim ~4 files
    compact_parquet(spark, src, dest, target_mb=target_mb, sort_by=["o_orderkey"])
    ranges = []
    for f in sorted(glob.glob(os.path.join(dest, "part-*"))):
        if f.endswith(".crc"):
            continue
        t = pq.read_table(f, columns=["o_orderkey"])
        keys = t.column("o_orderkey").to_pylist()
        assert keys == sorted(keys)  # sorted within file
        ranges.append((keys[0], keys[-1]))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2  # disjoint: min/max pruning effective
    total = spark.read.parquet(dest).count()
    assert total == load_table(spark, SF_DIR, "orders").count()
