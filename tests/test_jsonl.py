"""S3/S4 legacy JSONL(+zstd) staging glue (sources/jsonl.py): shard
roundtrips, manifest accounting, and PERMISSIVE corrupt-line capture
mirroring reference:dedup_staged.py:187-217."""

import os

import pyarrow as pa
from pyspark.sql import Row, functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from wiki_references_db_spark.sources.jsonl import (
    CORRUPT_COL,
    read_jsonl,
    read_jsonl_zst,
    write_jsonl,
    write_jsonl_zst,
)

SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
    ]
)

ROWS = [
    Row(doc_id=1, text="plain"),
    Row(doc_id=2, text='quotes " and \\ backslash'),
    Row(doc_id=3, text="unicode é中文 and\ttab"),
    Row(doc_id=4, text=None),
]


def test_native_gzip_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(ROWS, SCHEMA)
    path = str(tmp_path / "gz")
    write_jsonl(df, path, compression="gzip")
    assert any(f.endswith(".gz") for f in os.listdir(path))
    back = read_jsonl(spark, path, SCHEMA).select("doc_id", "text")
    assert sorted(back.collect()) == sorted(df.collect())


def test_zst_roundtrip_and_manifest(spark, tmp_path):
    df = spark.createDataFrame(ROWS, SCHEMA).repartition(3)
    path = str(tmp_path / "zst")
    manifest = write_jsonl_zst(df, path)
    assert sum(m["rows"] for m in manifest) == len(ROWS)
    for m in manifest:
        assert m["shard"].endswith(".jsonl.zst")
        assert m["bytes"] == os.path.getsize(m["shard"])
    back = read_jsonl_zst(spark, path, SCHEMA).select("doc_id", "text")
    assert sorted(back.collect(), key=str) == sorted(df.collect(), key=str)


def test_zst_shards_are_standard_frames(spark, tmp_path):
    """The reference's tooling must be able to read our shards: plain
    zstd frames, one JSON object per line."""
    df = spark.createDataFrame(ROWS, SCHEMA).coalesce(1)
    path = str(tmp_path / "frames")
    manifest = write_jsonl_zst(df, path)
    raw = pa.input_stream(manifest[0]["shard"], compression="zstd").read()
    lines = [ln for ln in raw.decode("utf-8").split("\n") if ln]
    assert len(lines) == len(ROWS)
    assert all(ln.startswith("{") for ln in lines)


def test_permissive_corrupt_capture(spark, tmp_path):
    """A damaged line lands in _corrupt_record; good lines still parse
    (the reference reader's skip-damaged-line loop)."""
    shard_dir = tmp_path / "bad"
    shard_dir.mkdir()
    payload = b'{"doc_id": 1, "text": "ok"}\nnot json at all\n{"doc_id": 2, "text": "fine"}\n'
    with pa.output_stream(str(shard_dir / "part-00000.jsonl.zst"), compression="zstd") as out:
        out.write(payload)
    back = read_jsonl_zst(spark, str(shard_dir), SCHEMA)
    rows = back.collect()
    assert len(rows) == 3
    good = [r for r in rows if r[CORRUPT_COL] is None]
    bad = [r for r in rows if r[CORRUPT_COL] is not None]
    assert sorted(r.doc_id for r in good) == [1, 2]
    assert len(bad) == 1 and bad[0][CORRUPT_COL] == "not json at all"
    assert bad[0].doc_id is None


def test_empty_partitions_write_no_shards(spark, tmp_path):
    df = spark.createDataFrame(ROWS[:1], SCHEMA).repartition(8)
    path = str(tmp_path / "sparse")
    manifest = write_jsonl_zst(df, path)
    assert sum(m["rows"] for m in manifest) == 1
    assert len(os.listdir(path)) == len(manifest)
