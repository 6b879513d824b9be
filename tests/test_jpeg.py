"""Baseline-JPEG codec (operators/jpeg.py): hand-crafted T.81 streams
decoded against hand-computed pixel values (decoder verified
independently of the encoder), encoder->decoder roundtrips at JPEG's
documented loss envelope, restart markers, profile error surfaces, and
the mapInPandas integration through decode_image_pixels."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from wiki_references_db_spark.operators.jpeg import (
    decode_jpeg_pixels,
    encode_jpeg_baseline,
    encode_jpeg_progressive,
)


# -- hand-crafted streams (independent of our encoder) ---------------------


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _dc_only_gray(w: int, h: int, extra: bytes = b"", scan: bytes = b"\x6f") -> bytes:
    """Single-component JPEG with trivial 1-bit Huffman tables: DC table
    maps code '0' -> category 2, AC table maps code '0' -> EOB.  The
    default scan bits '0 11 0' + 1-pad = 0x6F decode to DC=EXTEND(3,2)=3;
    with quant=16 the block is the constant 3*16/8 + 128 = 134."""
    return (
        b"\xff\xd8"
        + _seg(0xDB, bytes([0x00]) + bytes([16] * 64))  # DQT all 16s
        + _seg(0xC0, bytes([8]) + struct.pack(">HH", h, w) + bytes([1, 1, 0x11, 0]))
        + _seg(0xC4, bytes([0x00, 1] + [0] * 15) + bytes([0x02]))  # DC: '0'->cat2
        + _seg(0xC4, bytes([0x10, 1] + [0] * 15) + bytes([0x00]))  # AC: '0'->EOB
        + extra
        + _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
        + scan
        + b"\xff\xd9"
    )


def test_handcrafted_dc_only_block_exact():
    dec = decode_jpeg_pixels(_dc_only_gray(8, 8))
    assert dec.shape == (8, 8, 1)
    assert dec.dtype == np.uint8
    # DC 3 * quant 16 spread by the orthonormal IDCT: 48/8 + 128 = 134
    assert np.all(dec == 134)


def test_handcrafted_image_smaller_than_mcu_crops():
    # 5x3 frame still carries one full 8x8 MCU; decode crops to (3, 5).
    dec = decode_jpeg_pixels(_dc_only_gray(5, 3))
    assert dec.shape == (3, 5, 1)
    assert np.all(dec == 134)


def test_handcrafted_restart_marker_resets_predictor():
    """Two MCUs with DRI=1 and an RST0 between them: the second MCU's
    DC category-2 bits '00' EXTEND to -3 AGAINST A RESET predictor,
    giving 128 - 6 = 122 (without the reset it would be 134 - 6)."""
    payload = _dc_only_gray(
        16,
        8,
        extra=_seg(0xDD, struct.pack(">H", 1)),  # DRI = 1 MCU
        scan=b"\x6f" + b"\xff\xd0" + b"\x0f",
    )
    dec = decode_jpeg_pixels(payload)
    assert dec.shape == (8, 16, 1)
    assert np.all(dec[:, :8] == 134)
    assert np.all(dec[:, 8:] == 122)


def test_handcrafted_ac_coefficient():
    """DC=0 plus one AC coefficient placed by a run: '0' DC cat2 with
    bits '00' gives EXTEND(0,2)=-3 ... simpler: reuse cat-2 DC=3 and
    check a crafted AC run decodes into the right zigzag slot by
    comparing against the IDCT computed here from first principles."""
    # AC table: '0'->EOB, '10'->0x21 (run 2, size 1)
    ac_dht = _seg(0xC4, bytes([0x10, 1, 1] + [0] * 14) + bytes([0x00, 0x21]))
    payload = (
        b"\xff\xd8"
        + _seg(0xDB, bytes([0x00]) + bytes([16] * 64))
        + _seg(0xC0, bytes([8]) + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0]))
        + _seg(0xC4, bytes([0x00, 1] + [0] * 15) + bytes([0x02]))
        + ac_dht
        # scan bits: DC '0'+'11' (=3), AC '10'+'1' (run2 size1 val 1),
        # EOB '0' -> 0 11 10 1 0 + pad '1' = 01110101 -> 0x75
        + _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
        + b"\x75"
        + b"\xff\xd9"
    )
    dec = decode_jpeg_pixels(payload)[:, :, 0].astype(np.float64)
    # Expected block: DC=3*16=48 at (0,0); the AC lands after a run of
    # two zeros at zigzag index 3 = (row 2, col 0), value 1*16=16;
    # orthonormal IDCT computed here from first principles.
    M = np.zeros((8, 8))
    for x in range(8):
        for u in range(8):
            a = np.sqrt(0.125) if u == 0 else 0.5
            M[x, u] = a * np.cos((2 * x + 1) * u * np.pi / 16)
    F = np.zeros((8, 8))
    F[0, 0] = 48.0
    F[2, 0] = 16.0
    want = np.clip(np.round(M @ F @ M.T + 128.0), 0, 255)
    assert np.array_equal(dec, want)


# -- encoder -> decoder roundtrips ------------------------------------------


def test_roundtrip_gray_constant_exact():
    px = np.full((8, 8), 77, dtype=np.uint8)
    dec = decode_jpeg_pixels(encode_jpeg_baseline(px, quality=100))
    assert dec.shape == (8, 8, 1)
    assert np.all(dec[:, :, 0] == 77)


def test_roundtrip_gray_gradient_tight():
    h, w = 21, 13  # odd dims force edge-replication padding
    px = (np.add.outer(np.arange(h) * 3, np.arange(w) * 5) % 256).astype(
        np.uint8
    )
    dec = decode_jpeg_pixels(encode_jpeg_baseline(px, quality=95))[:, :, 0]
    assert dec.shape == (h, w)
    assert np.abs(dec.astype(int) - px.astype(int)).max() <= 2


def test_roundtrip_rgb_444():
    px = np.zeros((17, 19, 3), dtype=np.uint8)
    px[:, :, 0] = np.linspace(0, 255, 17).astype(np.uint8)[:, None]
    px[:, :, 1] = np.linspace(255, 0, 19).astype(np.uint8)[None, :]
    px[:, :, 2] = 128
    dec = decode_jpeg_pixels(encode_jpeg_baseline(px, quality=95))
    assert dec.shape == px.shape
    err = np.abs(dec.astype(int) - px.astype(int))
    assert err.max() <= 6 and err.mean() < 2.0


def test_roundtrip_rgb_420_subsampled():
    px = np.zeros((24, 18, 3), dtype=np.uint8)
    base = (np.add.outer(np.arange(24) * 7, np.arange(18) * 11) % 200 + 20)
    for c in range(3):  # gray content => chroma constant at 128
        px[:, :, c] = base
    dec = decode_jpeg_pixels(
        encode_jpeg_baseline(px, quality=92, subsample=True)
    )
    assert dec.shape == px.shape
    err = np.abs(dec.astype(int) - px.astype(int))
    assert err.max() <= 16 and err.mean() < 3.0


def test_roundtrip_noise_bounded():
    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    dec = decode_jpeg_pixels(encode_jpeg_baseline(px, quality=85))
    # Noise is JPEG's worst case; the envelope documents lossiness,
    # it does not hide a broken transform (a zigzag or table mixup
    # yields mean error ~60+, not <15).
    err = np.abs(dec.astype(int) - px.astype(int))
    assert err.mean() < 15


def test_header_parse_agrees_with_encoder():
    from wiki_references_db_spark.operators.multimodal import parse_image_header

    px = np.zeros((10, 14, 3), dtype=np.uint8)
    fmt, w, h, ch = parse_image_header(encode_jpeg_baseline(px))
    assert (fmt, w, h, ch) == ("jpeg", 14, 10, 3)
    gray = np.zeros((6, 9), dtype=np.uint8)
    fmt, w, h, ch = parse_image_header(encode_jpeg_baseline(gray))
    assert (fmt, w, h, ch) == ("jpeg", 9, 6, 1)


# -- error surfaces ----------------------------------------------------------


# -- progressive (SOF2) ------------------------------------------------------


def test_progressive_decode_identical_to_baseline():
    """The strongest cross-check available without a codec library: the
    progressive encoder serializes the IDENTICAL quantized coefficients
    as the baseline encoder (shared _prepare_planes), so a correct
    progressive decode must be bit-identical to the independently
    verified baseline decode — for gray, 4:4:4, and 4:2:0, odd dims,
    and a 1x1 edge case."""
    rng = np.random.default_rng(3)
    cases = [
        ((np.add.outer(np.arange(21) * 3, np.arange(13) * 5) % 256).astype(
            np.uint8
        ), {}),
        (rng.integers(0, 256, (17, 19, 3), dtype=np.uint8), {}),
        (rng.integers(0, 256, (24, 18, 3), dtype=np.uint8), {"subsample": True}),
        (rng.integers(0, 256, (23, 17, 3), dtype=np.uint8), {"subsample": True}),
        (np.array([[200]], dtype=np.uint8), {}),
    ]
    for px, kw in cases:
        b = decode_jpeg_pixels(encode_jpeg_baseline(px, quality=80, **kw))
        p = decode_jpeg_pixels(encode_jpeg_progressive(px, quality=80, **kw))
        assert np.array_equal(b, p), (px.shape, kw)


def _random_bands(rng) -> tuple:
    """Random spectral-selection script: a partition of [1..63] into
    1..4 contiguous bands."""
    n_cuts = int(rng.integers(0, 4))
    cuts = sorted(set(rng.integers(2, 63, n_cuts).tolist()))
    edges = [1] + cuts + [64]
    return tuple((edges[i], edges[i + 1] - 1) for i in range(len(edges) - 1))


@pytest.mark.parametrize("seed", list(range(8)))
def test_progressive_scan_script_differential_fuzz(seed):
    """Differential fuzz across the progressive scan-script space: for
    random images, random spectral-selection band partitions, every
    subsampling mode, and successive-approximation depths 0-3 plus a
    deep depth (6 — at Al>=4 most quantized AC magnitudes shift to zero
    history, exercising different EOB-run geometry; ADVICE r9), the
    progressive stream must decode BIT-IDENTICAL to the baseline stream
    of the same image (both carry the same quantized coefficients).
    This is the e2e exercise of the SA refinement decode paths — EOB
    runs with correction bits behind them, plain EOBs with
    nonzero-history tails (the round-9 decoder fix), ZRLs inside
    refinement scans — against the independently verified baseline
    decoder as the oracle."""
    rng = np.random.default_rng(1000 + seed)
    hh = int(rng.integers(1, 41))
    ww = int(rng.integers(1, 41))
    channels = int(rng.choice([1, 3]))
    if channels == 1:
        px = rng.integers(0, 256, (hh, ww), dtype=np.uint8)
        modes = [False]
    else:
        px = rng.integers(0, 256, (hh, ww, 3), dtype=np.uint8)
        modes = ["444", "420", "422", "411"]
    # Smooth half the fixtures: low-frequency content produces long
    # zero runs and EOB runs spanning many blocks (the interesting SA
    # geometry), where pure noise rarely does.
    if seed % 2:
        px = (px // 32) * 32
    quality = int(rng.choice([50, 80, 95]))
    bands = _random_bands(rng)
    mode = modes[seed % len(modes)]
    dri = int(rng.choice([0, 1, 2, 5]))
    want = decode_jpeg_pixels(
        encode_jpeg_baseline(px, quality=quality, subsample=mode)
    )
    # Baseline with restart markers must decode identically too.
    got_rst = decode_jpeg_pixels(
        encode_jpeg_baseline(
            px, quality=quality, subsample=mode, restart_interval=max(dri, 1)
        )
    )
    assert np.array_equal(got_rst, want), (px.shape, mode, quality, dri)
    for successive in (*range(4), 6):
        enc = encode_jpeg_progressive(
            px, quality=quality, subsample=mode, bands=bands,
            successive=successive, restart_interval=dri,
        )
        got = decode_jpeg_pixels(enc)
        assert np.array_equal(got, want), (
            px.shape, mode, quality, bands, successive, dri,
        )


@pytest.mark.parametrize("mode", ["444", "420", "422", "411"])
def test_progressive_geometry_matrix_differential(mode):
    """Deterministic completion of the fuzz matrix: every subsampling
    geometry x a multi-band scan script x SA depths {2, 6} x restart
    interval 3, on an image large enough to span multiple MCUs in BOTH
    axes for every geometry (4:1:1 MCUs are 32 px wide), decodes
    bit-identical to the baseline stream.  The random fuzz above only
    reaches 4:1:1 on whichever seeds draw color images (round-9 seeds
    hit it at 12x8 and 3x3 — single-MCU strips), so the cross-MCU
    restart/EOB-run interactions of the wide geometries are pinned here
    explicitly."""
    rng = np.random.default_rng(42)
    px = rng.integers(0, 256, (37, 69, 3), dtype=np.uint8)
    px = (px // 32) * 32  # smooth: long EOB runs across blocks
    want = decode_jpeg_pixels(encode_jpeg_baseline(px, quality=80, subsample=mode))
    for successive in (2, 6):
        enc = encode_jpeg_progressive(
            px, quality=80, subsample=mode, bands=((1, 5), (6, 63)),
            successive=successive, restart_interval=3,
        )
        assert np.array_equal(decode_jpeg_pixels(enc), want), (
            mode, successive,
        )


def test_progressive_header_parses():
    from wiki_references_db_spark.operators.multimodal import parse_image_header

    px = np.zeros((10, 14, 3), dtype=np.uint8)
    fmt, w, h, ch = parse_image_header(encode_jpeg_progressive(px))
    assert (fmt, w, h, ch) == ("jpeg", 14, 10, 3)


def test_progressive_successive_approximation_handcrafted():
    """Hand-built SA stream (independent of the encoder, which emits
    spectral selection only): four scans over one 8x8 gray block with
    quant all-1s — DC first at Al=1, DC refinement, AC first at Al=1,
    AC refinement with a correction bit, a no-change bit, and a
    NEWLY-APPEARING coefficient placed by a zero-history run.  Final
    coefficients: DC=5, zz[2]=-3, zz[5]=6, zz[7]=+1; pixels checked
    against a first-principles IDCT."""
    dqt = _seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    sof2 = _seg(0xC2, bytes([8]) + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0]))
    dc_dht = _seg(0xC4, bytes([0x00, 1] + [0] * 15) + bytes([0x02]))
    ac_dht = _seg(
        0xC4, bytes([0x10, 1, 1, 1, 1] + [0] * 12) + bytes([0x00, 0x11, 0x22, 0x41])
    )
    payload = (
        b"\xff\xd8" + dqt + sof2 + dc_dht + ac_dht
        # scan A: DC first, Ah=0 Al=1 -> sends 5>>1=2: '0' cat2, '10'
        + _seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x01])) + b"\x5f"
        # scan D: DC refine, Ah=1 Al=0 -> one raw bit '1' (DC 4 -> 5);
        # the padded byte is 0xFF, so the writer's stuffing appears
        + _seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x10])) + b"\xff\x00"
        # scan B: AC first, Al=1 -> zz[2]=-1<<1, zz[5]=3<<1, EOB
        + _seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0x01])) + b"\x9b\x7f"
        # scan C: AC refine, Ah=1 Al=0 -> new +1 at zz[7] via
        # zero-history run 4 (symbol 0x41), sign '1', correction bits
        # '1' (zz[2]: -2 -> -3) and '0' (zz[5] unchanged), then EOB
        + _seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0x10])) + b"\xec"
        + b"\xff\xd9"
    )
    dec = decode_jpeg_pixels(payload)[:, :, 0].astype(np.float64)
    M = np.zeros((8, 8))
    for x in range(8):
        for u in range(8):
            a = np.sqrt(0.125) if u == 0 else 0.5
            M[x, u] = a * np.cos((2 * x + 1) * u * np.pi / 16)
    zz = np.zeros(64)
    zz[0], zz[2], zz[5], zz[7] = 5, -3, 6, 1
    F = np.zeros((8, 8))
    zigzag = []
    r = c = 0
    for _ in range(64):
        zigzag.append((r, c))
        if (r + c) % 2 == 0:
            if c == 7:
                r += 1
            elif r == 0:
                c += 1
            else:
                r -= 1
                c += 1
        else:
            if r == 7:
                c += 1
            elif c == 0:
                r += 1
            else:
                r += 1
                c -= 1
    for k, (rr, cc) in enumerate(zigzag):
        F[rr, cc] = zz[k]
    want = np.clip(np.round(M @ F @ M.T + 128.0), 0, 255)
    assert np.array_equal(dec, want)


def _idct_from_zigzag(zz: np.ndarray) -> np.ndarray:
    """First-principles 8x8 IDCT of a zigzag-ordered coefficient vector
    (quant all-1s), matching the decoder's rounding/clipping."""
    M = np.zeros((8, 8))
    for x in range(8):
        for u in range(8):
            a = np.sqrt(0.125) if u == 0 else 0.5
            M[x, u] = a * np.cos((2 * x + 1) * u * np.pi / 16)
    F = np.zeros((8, 8))
    r = c = 0
    for k in range(64):
        F[r, c] = zz[k]
        if (r + c) % 2 == 0:
            if c == 7:
                r += 1
            elif r == 0:
                c += 1
            else:
                r -= 1
                c += 1
        else:
            if r == 7:
                c += 1
            elif c == 0:
                r += 1
            else:
                r += 1
                c -= 1
    return np.clip(np.round(M @ F @ M.T + 128.0), 0, 255)


def test_progressive_sa_plain_eob_refines_current_block_tail():
    """Regression for the T.81 G.1.2.3 EOBRUN convention in SA
    refinement: a PLAIN EOB (r=0, the most common refinement symbol)
    must still read correction bits for the current block's
    nonzero-history coefficients AFTER the EOB position (EOBRUN counts
    the current block: 1 << r, not (1 << r) - 1).  Here the refinement
    scan is a single EOB symbol followed immediately by correction bits
    '1' (zz[2]: -2 -> -3) and '0' (zz[5]: unchanged); a decoder that
    skips the tail pass leaves zz[2] at -2 and decodes wrong pixels."""
    dqt = _seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    sof2 = _seg(0xC2, bytes([8]) + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0]))
    dc_dht = _seg(0xC4, bytes([0x00, 1] + [0] * 15) + bytes([0x02]))
    ac_dht = _seg(
        0xC4, bytes([0x10, 1, 1, 1, 1] + [0] * 12) + bytes([0x00, 0x11, 0x22, 0x41])
    )
    payload = (
        b"\xff\xd8" + dqt + sof2 + dc_dht + ac_dht
        # DC first, Ah=0 Al=1 -> sends 5>>1=2: '0' cat2, bits '10'
        + _seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x01])) + b"\x5f"
        # DC refine, Ah=1 Al=0 -> one raw bit '1' (DC 4 -> 5)
        + _seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x10])) + b"\xff\x00"
        # AC first, Al=1 -> zz[2]=-1<<1, zz[5]=3<<1, EOB
        + _seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0x01])) + b"\x9b\x7f"
        # AC refine, Ah=1 Al=0 -> plain EOB ('0'), THEN the tail
        # correction bits for the nonzero-history coefficients after the
        # EOB position: '1' (zz[2] -2 -> -3), '0' (zz[5] unchanged);
        # 0 1 0 + 1-pad -> 0x5F
        + _seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0x10])) + b"\x5f"
        + b"\xff\xd9"
    )
    dec = decode_jpeg_pixels(payload)[:, :, 0].astype(np.float64)
    zz = np.zeros(64)
    zz[0], zz[2], zz[5] = 5, -3, 6
    assert np.array_equal(dec, _idct_from_zigzag(zz))


def test_progressive_eob_run_handcrafted():
    """EOBRUN spanning blocks: a 16x8 gray progressive stream whose AC
    scan opens with EOBRUN symbol 0x10 (category 1, 1 extra bit '1' ->
    run of 3... with 2 blocks present, run 2 suffices: extra bit '0')
    — both blocks' AC bands end with zero coefficients, DC alone
    carries the image."""
    dqt = _seg(0xDB, bytes([0x00]) + bytes([16] * 64))
    sof2 = _seg(
        0xC2, bytes([8]) + struct.pack(">HH", 8, 16) + bytes([1, 1, 0x11, 0])
    )
    dc_dht = _seg(0xC4, bytes([0x00, 1] + [0] * 15) + bytes([0x02]))
    # AC table: '0' -> 0x10 (EOBRUN cat 1)
    ac_dht = _seg(0xC4, bytes([0x10, 1] + [0] * 15) + bytes([0x10]))
    payload = (
        b"\xff\xd8" + dqt + sof2 + dc_dht + ac_dht
        # DC first scan Al=0: two blocks, diffs 3 then -3 (pred 3 -> 0):
        # '0' '11'  '0' '00' -> 011 000 + pad -> 01100011 = 0x63
        + _seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x00])) + b"\x63"
        # AC scan 1..63 Al=0: EOBRUN 0x10 with extra bit '0' -> run 2,
        # covering both blocks -> '0' + '0' + pad -> 0x3F
        + _seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0x00])) + b"\x3f"
        + b"\xff\xd9"
    )
    dec = decode_jpeg_pixels(payload)
    assert dec.shape == (8, 16, 1)
    assert np.all(dec[:, :8] == 134)  # DC 3*16/8 + 128
    assert np.all(dec[:, 8:] == 128)  # DC back to 0


def test_arithmetic_raises_not_implemented():
    payload = (
        b"\xff\xd8"
        + _seg(0xC9, bytes([8]) + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0]))
    )
    with pytest.raises(NotImplementedError, match="arithmetic"):
        decode_jpeg_pixels(payload)


def test_corrupt_payloads_raise_value_error():
    with pytest.raises(ValueError):
        decode_jpeg_pixels(b"not a jpeg")
    with pytest.raises(ValueError):
        decode_jpeg_pixels(b"\xff\xd8\xff\xd9")  # SOI+EOI, no scan
    # Truncated mid-segment: the segment walk runs out of bytes.
    good = _dc_only_gray(8, 8)
    with pytest.raises((ValueError, NotImplementedError)):
        decode_jpeg_pixels(good[:20])


# -- Spark integration through the real-codec stages -------------------------


def test_jpeg_through_image_pixel_stats(spark):
    from pyspark.sql import Row

    from wiki_references_db_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        image_pixel_stats,
    )

    px = np.full((12, 9), 200, dtype=np.uint8)
    media = spark.createDataFrame(
        [
            Row(
                media_id=1,
                kind="image",
                payload=encode_jpeg_baseline(px, quality=100),
                metadata={},
            )
        ],
        MEDIA_SCHEMA,
    )
    row = image_pixel_stats(media).collect()[0]
    assert (row.width, row.height, row.channels) == (9, 12, 1)
    # quality-100 constant gray decodes exactly
    assert row.pixel_min == row.pixel_max == 200
    assert row.pixel_sum == 200 * 12 * 9


def test_jpeg_through_extract_features(spark):
    from pyspark.sql import Row

    from wiki_references_db_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        extract_features,
    )

    px = np.full((8, 8, 3), 40, dtype=np.uint8)  # dark constant image
    media = spark.createDataFrame(
        [
            Row(
                media_id=1,
                kind="image",
                payload=encode_jpeg_baseline(px, quality=100),
                metadata={},
            )
        ],
        MEDIA_SCHEMA,
    )
    feat = extract_features(media, dim=8, use_real_codecs=True).collect()[0]
    # All luminance mass lands in one low histogram bin.
    assert abs(sum(feat.feature) - 1.0) < 1e-6
    assert max(feat.feature) == pytest.approx(1.0)
    assert feat.feature.index(max(feat.feature)) <= 2


def test_encode_thumbnails_end_to_end(spark):
    """The full media loop: PNG and JPEG sources decode, downscale
    aspect-preserving, and re-encode as baseline JPEG whose payloads
    decode back to the expected thumbnail geometry and content."""
    from pyspark.sql import Row

    from wiki_references_db_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        encode_thumbnails,
    )
    from wiki_references_db_spark.operators.multimodal import encode_png

    big = np.full((128, 96, 3), 90, dtype=np.uint8)   # downscales 2x
    small = np.full((10, 20), 200, dtype=np.uint8)    # passes through
    media = spark.createDataFrame(
        [
            Row(media_id=1, kind="image", payload=encode_png(big), metadata={}),
            Row(media_id=2, kind="image",
                payload=encode_jpeg_baseline(small, quality=100), metadata={}),
            Row(media_id=3, kind="audio", payload=b"RIFF....", metadata={}),
            # Damaged-corpus contract: an undecodable image payload is
            # SKIPPED (dropped from the output), never aborting the task.
            Row(media_id=4, kind="image", payload=b"\x89PNG\r\n\x1a\nJUNK",
                metadata={}),
        ],
        MEDIA_SCHEMA,
    )
    skipped = spark.sparkContext.accumulator(0)
    rows = {
        r.media_id: r
        for r in encode_thumbnails(
            media, max_side=64, skipped_acc=skipped
        ).collect()
    }
    assert set(rows) == {1, 2}  # audio filtered out; corrupt image skipped
    # ADVICE r9: the drop is observable on the driver without a
    # separate anti-join pass — the accumulator counts the skip.
    assert skipped.value == 1
    assert (rows[1].width, rows[1].height) == (48, 64)
    assert (rows[2].width, rows[2].height) == (20, 10)
    # Payloads are real JPEGs that decode to the right shape/content.
    t1 = decode_jpeg_pixels(bytes(rows[1].thumb_payload))
    assert t1.shape == (64, 48, 3)
    assert np.abs(t1.astype(int) - 90).max() <= 3  # constant image, mild loss
    t2 = decode_jpeg_pixels(bytes(rows[2].thumb_payload))
    assert t2.shape == (10, 20, 1)
    assert np.abs(t2.astype(int) - 200).max() <= 2


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("variant", ["baseline", "progressive", "sa_restart"])
def test_jpeg_truncation_never_hangs_or_garbles(seed, variant):
    """Damaged-corpus invariant (same property the PNG/GIF/BMP decoders
    carry): for EVERY truncation point of a valid JPEG payload
    (exhaustive — the payloads are small), decode either raises a clean
    ValueError/NotImplementedError or returns an array of the
    full-payload SHAPE (entropy data is self-delimiting only at
    markers, so mid-scan truncation legitimately decodes the prefix
    padded with 1-bits) — never hangs, never crashes with a non-codec
    exception."""
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, (17, 14, 3), dtype=np.uint8)
    if variant == "baseline":
        enc = encode_jpeg_baseline(px, quality=85)
    elif variant == "progressive":
        enc = encode_jpeg_progressive(px, quality=85)
    else:  # SA refinement scans + restart markers
        enc = encode_jpeg_progressive(
            px, quality=85, successive=2, restart_interval=3
        )
    full = decode_jpeg_pixels(enc)
    for cut in range(1, len(enc)):
        try:
            out = decode_jpeg_pixels(enc[:cut])
        except (ValueError, NotImplementedError):
            continue
        assert out.shape == full.shape, cut
        assert out.dtype == np.uint8


@pytest.mark.parametrize("seed", list(range(6)))
def test_jpeg_byte_corruption_never_hangs(seed):
    """Flip random bytes inside a valid payload (baseline AND a
    progressive/SA/restart stream): decode must terminate with either a
    clean codec error or SOME uint8 image — no hangs, no index errors,
    no arithmetic faults (the scan engine treats any marker as scan end
    and bounds every run)."""
    rng = np.random.default_rng(100 + seed)
    px = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    payloads = [
        encode_jpeg_baseline(px, quality=85),
        encode_jpeg_progressive(
            px, quality=85, subsample="420", successive=seed % 4,
            restart_interval=(seed % 3) * 2,
        ),
    ]
    for payload in payloads:
        enc = bytearray(payload)
        for _ in range(8):
            pos = int(rng.integers(2, len(enc)))
            enc[pos] = int(rng.integers(0, 256))
        try:
            out = decode_jpeg_pixels(bytes(enc))
            assert out.dtype == np.uint8 and out.ndim == 3
        except (ValueError, NotImplementedError):
            pass


def test_roundtrip_rgb_422_subsampled():
    """4:2:2 (Y 2x1): columns-only chroma averaging on the encode side,
    non-square nearest upsample on decode — the sampling-ratio path the
    integer-repeat upsampler could not express."""
    px = np.zeros((19, 22, 3), dtype=np.uint8)
    base = (np.add.outer(np.arange(19) * 9, np.arange(22) * 5) % 180 + 30)
    for c in range(3):  # gray content => chroma constant at 128
        px[:, :, c] = base
    dec = decode_jpeg_pixels(encode_jpeg_baseline(px, quality=92, subsample="422"))
    assert dec.shape == px.shape
    err = np.abs(dec.astype(int) - px.astype(int))
    assert err.max() <= 16 and err.mean() < 3.0
    # progressive serialization of the same coefficients stays identical
    rng = np.random.default_rng(11)
    pxr = rng.integers(0, 256, (24, 18, 3), dtype=np.uint8)
    b = decode_jpeg_pixels(encode_jpeg_baseline(pxr, quality=80, subsample="422"))
    p = decode_jpeg_pixels(
        encode_jpeg_progressive(pxr, quality=80, subsample="422")
    )
    assert np.array_equal(b, p)
    # back-compat: subsample=True is exactly "420"
    d1 = decode_jpeg_pixels(encode_jpeg_baseline(pxr, quality=80, subsample=True))
    d2 = decode_jpeg_pixels(encode_jpeg_baseline(pxr, quality=80, subsample="420"))
    assert np.array_equal(d1, d2)


def test_roundtrip_rgb_411_subsampled():
    """4:1:1 (Y 4x1, the DV-video layout): 1x4 column chroma averaging
    on the encode side, non-square 4x1 nearest upsample on decode —
    exercising a sampling ratio no in-repo encoder produced before
    (the decoder docstring claimed 4:1:1 exactness untested)."""
    px = np.zeros((19, 22, 3), dtype=np.uint8)
    base = (np.add.outer(np.arange(19) * 9, np.arange(22) * 5) % 180 + 30)
    for c in range(3):  # gray content => chroma constant at 128
        px[:, :, c] = base
    dec = decode_jpeg_pixels(encode_jpeg_baseline(px, quality=92, subsample="411"))
    assert dec.shape == px.shape
    err = np.abs(dec.astype(int) - px.astype(int))
    assert err.max() <= 16 and err.mean() < 3.0
    # progressive + SA + restarts over the same coefficients stays
    # bit-identical (the 4x1 Y MCU geometry in every scan engine path)
    rng = np.random.default_rng(12)
    pxr = rng.integers(0, 256, (21, 30, 3), dtype=np.uint8)
    b = decode_jpeg_pixels(encode_jpeg_baseline(pxr, quality=80, subsample="411"))
    p = decode_jpeg_pixels(
        encode_jpeg_progressive(
            pxr, quality=80, subsample="411", successive=2, restart_interval=2
        )
    )
    assert np.array_equal(b, p)


def test_two_component_stream_refuses_cleanly():
    """A 2-component frame is neither grayscale nor YCbCr: the decoder
    must fully decode the scan (exercising the non-square interleaved
    MCU path: Y at 2x1 contributes two blocks per MCU, C one) and then
    refuse at reassembly with a clean NotImplementedError — not a
    wrong-colored image and not an arithmetic error."""
    dqt = _seg(0xDB, bytes([0x00]) + bytes([16] * 64))
    sof = _seg(
        0xC0,
        bytes([8]) + struct.pack(">HH", 8, 16)
        + bytes([2, 1, 0x21, 0, 2, 0x11, 0]),
    )
    dc_dht = _seg(0xC4, bytes([0x00, 1] + [0] * 15) + bytes([0x02]))
    ac_dht = _seg(0xC4, bytes([0x10, 1] + [0] * 15) + bytes([0x00]))
    # interleaved MCU = Y0 Y1 C0, DC cat-2 each: '0 11 0' x3 + pad
    sos = _seg(0xDA, bytes([2, 1, 0x00, 2, 0x00, 0, 63, 0]))
    payload = (
        b"\xff\xd8" + dqt + sof + dc_dht + ac_dht + sos
        + b"\x60\x6f" + b"\xff\xd9"
    )
    with pytest.raises(NotImplementedError, match="2-component"):
        decode_jpeg_pixels(payload)
