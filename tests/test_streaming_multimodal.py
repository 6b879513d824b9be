"""Streaming ingest (exactly-once per bundle), windowed/stateful stream
operators, and multimodal binary-column plumbing."""

import os

import pytest
from pyspark.sql import functions as F

from wiki_references_db_spark.operators import multimodal as mm
from wiki_references_db_spark.sources.mwrev import write_mwrev_zst
from wiki_references_db_spark.streaming.ingest import (
    compact_staging,
    ingest_available_bundles,
)
from wiki_references_db_spark.streaming.windows import (
    stateful_lifecycle,
    windowed_event_counts,
)
from tests.test_wiki_pipeline import FIXTURE, _rev


def test_incremental_ingest_exactly_once_per_bundle(spark, tmp_path):
    bundles = tmp_path / "bundles"
    staging = tmp_path / "staging"
    ckpt = tmp_path / "ckpt"
    deduped = tmp_path / "deduped"
    bundles.mkdir()

    write_mwrev_zst(str(bundles / "b0.mwrev.zst"), FIXTURE[:5])  # page 100
    ingest_available_bundles(spark, str(bundles), str(staging), str(ckpt))
    rev1 = spark.read.parquet(str(staging / "revisions"))
    assert {r.revision_id for r in rev1.collect()} == {1001, 1002, 1003, 1004, 1005}

    # Second run with one NEW bundle: only the new file is processed
    # (checkpoint ledger), and the old rows are not duplicated.
    write_mwrev_zst(str(bundles / "b1.mwrev.zst"), FIXTURE[5:7])  # page 200
    ingest_available_bundles(spark, str(bundles), str(staging), str(ckpt))
    rev2 = spark.read.parquet(str(staging / "revisions")).collect()
    ids = sorted(r.revision_id for r in rev2)
    assert set(ids) == {1001, 1002, 1003, 1004, 1005, 2001, 2002}
    # Page-100 rows appear exactly as often as in run 1 (no reprocessing).
    assert ids.count(1001) == sum(1 for r in rev1.collect() if r.revision_id == 1001)

    compact_staging(spark, str(staging), str(deduped))
    dd = spark.read.parquet(str(deduped / "revisions"))
    assert dd.count() == 7  # one row per revision after global dedup


def test_windowed_event_counts_stream_matches_batch(spark, tmp_path):
    from wiki_references_db_spark.tables import load_table

    sf_dir = "/root/testdata/sf0.001"
    batch_events = load_table(spark, sf_dir, "events")
    expected = {
        (r.window_start, r.event_type): (r.n_events, round(r.total_value, 6))
        for r in windowed_event_counts(batch_events).collect()
    }

    # Stream the same parquet through the file source (production loader:
    # handles the bigint-nanos and TIMESTAMP_NTZ readings of ``ts``).
    from wiki_references_db_spark.queries.streams import _stream_events

    stream = _stream_events(spark, sf_dir)
    q = (
        windowed_event_counts(stream)
        .writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt_win"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.window_start, r.event_type): (r.n_events, round(r.total_value, 6))
        for r in spark.sql("select * from win_counts").collect()
    }
    assert got == expected


def test_stateful_lifecycle_operator(spark, tmp_path):
    """applyInPandasWithState lifecycle with state carried across
    micro-batches (maxFilesPerTrigger=1 => one batch per input file)."""
    src = tmp_path / "events_src"
    src.mkdir()
    ckpt = tmp_path / "ckpt_state"

    spark.createDataFrame(
        [("a", 1), ("a", 3), ("b", 2)], "key string, seq long"
    ).coalesce(1).write.mode("append").parquet(str(src))
    spark.createDataFrame(
        [("a", 9), ("c", 5)], "key string, seq long"
    ).coalesce(1).write.mode("append").parquet(str(src))

    stream = (
        spark.readStream.schema("key string, seq long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        stateful_lifecycle(stream)
        .writeStream.format("memory")
        .queryName("lifecycle")
        .outputMode("update")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # The memory sink accumulates one update row per (key, batch); the
    # final state per key is the one with the highest appearance_count.
    rows = {}
    for r in spark.sql("select * from lifecycle").collect():
        cur = rows.get(r.key)
        if cur is None or r.appearance_count > cur.appearance_count:
            rows[r.key] = r
    assert rows["a"].first_seen == 1 and rows["a"].last_seen == 9
    assert rows["a"].appearance_count == 3
    assert rows["b"].first_seen == 2 and rows["b"].appearance_count == 1
    assert rows["c"].first_seen == 5 and rows["c"].appearance_count == 1


@pytest.fixture()
def media_df(spark):
    rows = [
        (1, "image", b"\x89PNG fake bytes one", {"source": "s1"}),
        (2, "image", b"\x89PNG other fake bytes", {"source": "s2"}),
        (3, "video", b"\x00" * 4096, {"codec": "fake"}),
        (4, "audio", b"RIFF fake", {}),
    ]
    return spark.createDataFrame(rows, mm.MEDIA_SCHEMA)


def test_decode_images_deterministic(media_df):
    out = {r.media_id: r for r in mm.decode_images(media_df).collect()}
    assert set(out) == {1, 2}
    again = {r.media_id: r for r in mm.decode_images(media_df).collect()}
    for k in out:
        assert (out[k].width, out[k].height, out[k].channels) == (
            again[k].width, again[k].height, again[k].channels,
        )
    assert out[1].payload_bytes == len(b"\x89PNG fake bytes one")


def test_extract_features_shape(media_df):
    rows = mm.extract_features(media_df, dim=8).collect()
    assert len(rows) == 4
    assert all(len(r.feature) == 8 for r in rows)
    assert all(-1.0 <= v <= 1.0 for r in rows for v in r.feature)


def test_sample_frames_fanout(media_df):
    rows = mm.sample_frames(media_df, every_n_bytes=1024, max_frames=8).collect()
    assert {r.media_id for r in rows} == {3}
    assert [r.frame_index for r in sorted(rows, key=lambda r: r.frame_index)] == [
        0, 1, 2, 3,
    ]
    assert all(len(r.frame_payload) == 1024 for r in rows)


def test_real_codec_path_is_marked(media_df):
    with pytest.raises(Exception) as exc_info:
        mm.decode_images(media_df, use_real_codecs=True).collect()
    assert "NotImplementedError" in str(exc_info.value) or isinstance(
        exc_info.value, NotImplementedError
    )


def test_watermark_drops_late_rows_across_batches(spark, tmp_path):
    """Late-data semantics, empirically pinned: the watermark used for
    late-record FILTERING in batch N is the one established by data
    through batch N-1's commit — one batch behind the newest data — so
    a record must arrive two batches after the watermark-setting event
    to be dropped.  maxFilesPerTrigger=1 makes each file one batch
    (mtimes must differ: same-second files coalesce into one batch and
    nothing is ever late)."""
    import time

    import pandas as pd

    src = tmp_path / "late_src"
    src.mkdir()
    base = pd.Timestamp("2024-01-01 00:00:00")

    def write(name, rows):
        pd.DataFrame(
            {
                "event_id": [r[0] for r in rows],
                "ts": [
                    base + pd.Timedelta(hours=r[1], minutes=r[2]) for r in rows
                ],
                "user_id": [1] * len(rows),
                "event_type": ["view"] * len(rows),
                "value": [1.0] * len(rows),
                "props": ["{}"] * len(rows),
            }
        ).to_parquet(src / name)
        time.sleep(1.2)

    # Batch 0: data to 10:00 -> watermark 08:00 after commit.
    write("a.parquet", [(1, 1, 0), (2, 5, 0), (3, 10, 0)])
    # Batch 1: on-time 10:30 (advances the watermark to 08:30 next).
    write("b.parquet", [(4, 10, 30)])
    # Batch 2: on-time 09:30 plus a LATE 05:30 (< the 08:00 watermark
    # now in effect) whose hour window has been finalized.
    write("c.parquet", [(5, 9, 30), (6, 5, 30)])

    schema = spark.read.parquet(str(src)).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    dtype = dict(stream.dtypes).get("ts")
    if dtype in ("bigint", "long"):
        stream = stream.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    elif dtype == "timestamp_ntz":
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    agg = (
        stream.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.date_format("w.start", "HH:mm").alias("h"), "n")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("late_drop")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_late"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    dropped = sum(
        (p["stateOperators"][0]["numRowsDroppedByWatermark"] if p["stateOperators"] else 0)
        for p in q.recentProgress
    )
    got = {r["h"]: r["n"] for r in spark.sql("select * from late_drop").collect()}
    # Windows 01:00 and 05:00 finalize once the watermark passes them;
    # the late 05:30 event (event_id=6) must NOT be in the 05:00 count.
    assert dropped == 1, f"expected exactly the late row dropped: {got}"
    assert got.get("01:00") == 1
    assert got.get("05:00") == 1, f"late event leaked into a closed window: {got}"


# --------------------------------------------------------------------------
# Real (dependency-free) image header decode behind use_real_codecs=True
# --------------------------------------------------------------------------


def _png(w, h, color_type=6):
    ihdr = w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes(
        [8, color_type, 0, 0, 0]
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + len(ihdr).to_bytes(4, "big")
        + b"IHDR"
        + ihdr
        + b"\x00" * 4
    )


def _gif(w, h):
    return b"GIF89a" + w.to_bytes(2, "little") + h.to_bytes(2, "little") + b"\x00" * 6


def _bmp(w, h, bits=24):
    header = bytearray(54)
    header[0:2] = b"BM"
    header[18:22] = w.to_bytes(4, "little")
    header[22:26] = h.to_bytes(4, "little")
    header[28:30] = bits.to_bytes(2, "little")
    return bytes(header)


def _jpeg(w, h, ncomp=3):
    sof = (
        b"\xff\xc0"
        + (8 + 3 * ncomp).to_bytes(2, "big")
        + bytes([8])
        + h.to_bytes(2, "big")
        + w.to_bytes(2, "big")
        + bytes([ncomp])
        + b"\x00" * (3 * ncomp)
    )
    app0 = b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00" + b"\x00" * 9
    return b"\xff\xd8" + app0 + sof + b"\xff\xd9"


def test_parse_image_header_golden_bytes():
    from wiki_references_db_spark.operators.multimodal import parse_image_header

    assert parse_image_header(_png(640, 480, 6)) == ("png", 640, 480, 4)
    assert parse_image_header(_png(13, 7, 0)) == ("png", 13, 7, 1)
    assert parse_image_header(_gif(320, 200)) == ("gif", 320, 200, 3)
    assert parse_image_header(_bmp(800, 600, 24)) == ("bmp", 800, 600, 3)
    assert parse_image_header(_jpeg(1024, 768, 3)) == ("jpeg", 1024, 768, 3)
    assert parse_image_header(_jpeg(64, 32, 1)) == ("jpeg", 64, 32, 1)
    assert parse_image_header(b"plain text payload") is None
    assert parse_image_header(b"") is None
    assert parse_image_header(None) is None


def test_decode_images_real_codecs_through_mapinpandas(spark):
    """use_real_codecs=True must run the SAME mapInPandas plumbing with
    the real header parser: genuine container bytes in, true dimensions
    out, Arrow-batched end to end."""
    from wiki_references_db_spark.operators.multimodal import decode_images

    rows = [
        (1, "image", _png(640, 480, 2), {}),
        (2, "image", _gif(320, 200), {}),
        (3, "image", _bmp(800, 600, 32), {}),
        (4, "image", _jpeg(1024, 768, 3), {}),
        (5, "video", _png(9, 9), {}),  # filtered out by kind
    ]
    media = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary, metadata map<string,string>"
    )
    got = {
        r["media_id"]: (r["width"], r["height"], r["channels"], r["payload_bytes"])
        for r in decode_images(media, use_real_codecs=True).collect()
    }
    assert got == {
        1: (640, 480, 3, len(_png(640, 480, 2))),
        2: (320, 200, 3, len(_gif(320, 200))),
        3: (800, 600, 4, len(_bmp(800, 600, 32))),
        4: (1024, 768, 3, len(_jpeg(1024, 768, 3))),
    }


def test_decode_images_real_codecs_rejects_unknown_bytes(spark):
    import pyspark.errors
    import pytest as _pytest

    from wiki_references_db_spark.operators.multimodal import decode_images

    media = spark.createDataFrame(
        [(1, "image", b"not an image", {})],
        "media_id long, kind string, payload binary, metadata map<string,string>",
    )
    with _pytest.raises(pyspark.errors.PySparkException):
        decode_images(media, use_real_codecs=True).collect()


# --------------------------------------------------------------------------
# Real (dependency-free) WAV/RIFF header decode behind use_real_codecs=True
# --------------------------------------------------------------------------


def _wav(rate=44100, nch=2, bits=16, n_data=8820, extra_chunk=False):
    """Canonical RIFF/WAVE bytes: fmt + optional junk chunk + data."""
    byte_rate = rate * nch * bits // 8
    fmt = (
        b"fmt " + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little")            # PCM
        + nch.to_bytes(2, "little")
        + rate.to_bytes(4, "little")
        + byte_rate.to_bytes(4, "little")
        + (nch * bits // 8).to_bytes(2, "little")
        + bits.to_bytes(2, "little")
    )
    junk = b"LIST" + (5).to_bytes(4, "little") + b"INFOx" + b"\x00" if extra_chunk else b""
    data = b"data" + n_data.to_bytes(4, "little") + b"\x00" * n_data
    body = b"WAVE" + fmt + junk + data
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def test_parse_wav_header_golden_bytes():
    from wiki_references_db_spark.operators.multimodal import parse_wav_header

    # 8820 bytes at 44100 Hz stereo 16-bit = 176400 B/s -> 50 ms
    assert parse_wav_header(_wav(44100, 2, 16, 8820)) == ("wav", 44100, 2, 50)
    # 16000 B at 16 kHz mono 16-bit = 32000 B/s -> 500 ms
    assert parse_wav_header(_wav(16000, 1, 16, 16000)) == ("wav", 16000, 1, 500)
    # odd-sized chunk before data exercises word-alignment padding
    assert parse_wav_header(_wav(8000, 1, 16, 1600, extra_chunk=True)) == (
        "wav", 8000, 1, 100,
    )
    assert parse_wav_header(b"ID3\x03mp3 payload") is None
    assert parse_wav_header(b"") is None
    assert parse_wav_header(None) is None


def test_decode_audio_real_codecs_through_mapinpandas(spark):
    """use_real_codecs=True runs the SAME mapInPandas plumbing with the
    real RIFF parser: genuine WAV bytes in, true rate/channels/duration
    out."""
    from wiki_references_db_spark.operators.multimodal import decode_audio

    rows = [
        (1, "audio", _wav(44100, 2, 16, 8820), {}),
        (2, "audio", _wav(16000, 1, 16, 16000), {}),
        (3, "image", _wav(8000, 1, 16, 800), {}),  # filtered out by kind
    ]
    media = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary, metadata map<string,string>"
    )
    got = {
        r["media_id"]: (
            r["sample_rate"], r["n_channels"], r["duration_ms"], r["payload_bytes"]
        )
        for r in decode_audio(media, use_real_codecs=True).collect()
    }
    assert got == {
        1: (44100, 2, 50, len(_wav(44100, 2, 16, 8820))),
        2: (16000, 1, 500, len(_wav(16000, 1, 16, 16000))),
    }
