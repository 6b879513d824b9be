"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched ``mapInPandas`` stages.

The Spark-side contract (schemas, partitioning, UDF signatures, batch
shapes) is real and tested; codec work is real wherever pure
Python+numpy suffices and honestly stubbed where a codec library or
model runtime would be required (none exist in this container):

- with ``use_real_codecs=False`` (default) decoders produce a
  DETERMINISTIC FAKE derived from the payload bytes (md5-seeded), so
  pipelines are testable end-to-end and reproducible;
- with ``use_real_codecs=True`` the dependency-free REAL paths run where
  pure Python suffices — container-header decode for images
  (PNG/GIF/BMP/JPEG, ``parse_image_header``) and audio (WAV/RIFF,
  ``parse_wav_header``), and FULL pixel decode for PNG (zlib IDAT
  inflate + per-scanline unfilter), GIF (complete LZW + interlace),
  BMP, and JPEG — sequential baseline AND progressive (Huffman + IDCT
  codec in ``operators/jpeg.py``, with a matching minimal encoder)
  (``decode_image_pixels``; powers ``image_pixel_stats`` and the
  real ``resize_images`` path, a model-free luminance-histogram
  feature in ``extract_features``, and real animated-GIF frame
  sampling in ``sample_frames`` with PNG re-encode via ``encode_png``)
  plus full WAV PCM/float sample decode (``decode_wav_samples``,
  powering ``audio_sample_stats``) — and everything genuinely needing
  a codec library or model runtime (arithmetic-coded/lossless JPEG
  profiles, compressed audio codecs, neural feature models, MP4/WebM
  keyframe seeking) raises
  ``NotImplementedError`` at the exact point where PIL/ffmpeg/soundfile
  would be called.

At 100 TB scale the design notes are: payloads stay in binary columns
(parquet keeps them out of dictionary encoding), metadata travels in a
narrow sidecar struct so filters prune without touching bytes, and every
stage is mapInPandas (per-batch vectorized, no per-row Python).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("metadata", MapType(StringType(), StringType())),
    ]
)

DECODED_IMAGE = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("payload_bytes", LongType()),
    ]
)

FEATURES = StructType(
    [
        StructField("media_id", LongType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)

FRAMES = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_index", IntegerType()),
        StructField("frame_payload", BinaryType()),
    ]
)


def _fake_dims(payload: bytes) -> tuple[int, int, int]:
    """Deterministic fake decode: dimensions derived from the content
    hash.  REPLACE with a real codec (PIL.Image.open) when available."""
    h = hashlib.md5(payload or b"").digest()
    return 16 + h[0] % 64, 16 + h[1] % 64, 1 + h[2] % 4


# PNG color type -> sample channels (greyscale, RGB, palette, grey+alpha,
# RGBA); JPEG reports its component count directly.
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def parse_image_header(payload: bytes) -> tuple[str, int, int, int] | None:
    """REAL header decode, dependency-free: (format, width, height,
    channels) parsed from the container bytes of PNG / GIF / BMP /
    baseline+progressive JPEG, or None if the payload is none of those.
    This is the metadata a 100 TB media pipeline extracts without
    touching pixel data; full pixel decode is real for PNG/GIF/BMP
    and baseline + progressive JPEG (``decode_image_pixels``)."""
    p = payload or b""
    if len(p) >= 26 and p[:8] == b"\x89PNG\r\n\x1a\n" and p[12:16] == b"IHDR":
        w = int.from_bytes(p[16:20], "big")
        h = int.from_bytes(p[20:24], "big")
        return "png", w, h, _PNG_CHANNELS.get(p[25], 3)
    if len(p) >= 10 and p[:6] in (b"GIF87a", b"GIF89a"):
        w = int.from_bytes(p[6:8], "little")
        h = int.from_bytes(p[8:10], "little")
        return "gif", w, h, 3
    if len(p) >= 30 and p[:2] == b"BM":
        w = int.from_bytes(p[18:22], "little", signed=True)
        h = abs(int.from_bytes(p[22:26], "little", signed=True))
        bits = int.from_bytes(p[28:30], "little")
        return "bmp", w, h, max(1, bits // 8)
    if len(p) >= 4 and p[:2] == b"\xff\xd8":
        # Walk JPEG segments to the first start-of-frame marker.
        i = 2
        while i + 9 < len(p):
            if p[i] != 0xFF:
                i += 1
                continue
            marker = p[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            seg_len = int.from_bytes(p[i + 2 : i + 4], "big")
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h = int.from_bytes(p[i + 5 : i + 7], "big")
                w = int.from_bytes(p[i + 7 : i + 9], "big")
                return "jpeg", w, h, p[i + 9]
            i += 2 + seg_len
        return None
    return None


def _paeth(a: int, b: int, c: int) -> int:
    # Standard PNG Paeth predictor (RFC 2083 §6.6).
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


# Legal PNG (color type -> bit depths) combinations, spec §11.2.2.
_PNG_VALID_DEPTHS = {
    0: (1, 2, 4, 8, 16),
    2: (8, 16),
    3: (1, 2, 4, 8),
    4: (8, 16),
    6: (8, 16),
}

# Adam7 pass grid: (x_start, y_start, x_step, y_step), spec §8.2.
_ADAM7_PASSES = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def decode_png_pixels(payload: bytes):
    """REAL, dependency-free PNG pixel decode: zlib IDAT inflate +
    per-scanline unfilter (all five filter types), sub-byte bit-depth
    unpacking, palette expansion.  Returns a numpy array of shape
    ``(height, width, channels)`` — uint8, or uint16 for 16-bit images
    (palette images expand to RGB).

    Supported: the complete PNG still-image grammar — every legal
    (color type, bit depth) combination including 16-bit (returned as
    uint16), and both interlace methods (Adam7 decodes as seven
    independently filtered sub-images scattered into place).  GIF/BMP
    decode for real in ``decode_gif_pixels``/``decode_bmp_pixels``;
    baseline AND progressive JPEG decode for real in
    ``operators/jpeg.py`` (Huffman + IDCT + SA/spectral scans).

    Performance note: the unfilter loop is per-scanline Python — correct
    and fine for fixtures and metadata validation; a 100 TB media
    pipeline swaps this body for a vectorized/native codec while keeping
    the identical mapInPandas contract around it."""
    import zlib

    import numpy as np

    p = payload or b""
    if len(p) < 8 or p[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload")
    pos, ihdr, plte, idat = 8, None, None, []
    while pos + 8 <= len(p):
        ln = int.from_bytes(p[pos : pos + 4], "big")
        typ = p[pos + 4 : pos + 8]
        data = p[pos + 8 : pos + 8 + ln]
        if typ == b"IHDR":
            ihdr = data
        elif typ == b"PLTE":
            plte = data
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
        pos += 12 + ln
    if ihdr is None or len(ihdr) < 13:
        raise ValueError("PNG missing IHDR")
    w = int.from_bytes(ihdr[0:4], "big")
    h = int.from_bytes(ihdr[4:8], "big")
    depth, ctype, interlace = ihdr[8], ihdr[9], ihdr[12]
    if ctype not in _PNG_CHANNELS:
        raise ValueError(f"PNG color type {ctype} invalid")
    if interlace not in (0, 1):
        raise ValueError(f"PNG interlace method {interlace} invalid")
    if depth not in _PNG_VALID_DEPTHS.get(ctype, ()):
        raise ValueError(f"PNG bit depth {depth} invalid for color type {ctype}")
    channels = _PNG_CHANNELS[ctype]
    raw = zlib.decompress(b"".join(idat))

    def sub_image(off: int, sw: int, sh: int):
        """Unfilter one (sub-)image of sh scanlines at sw pixels wide;
        returns (values array (sh, sw, channels), new offset)."""
        if sw == 0 or sh == 0:
            return np.empty((sh, sw, channels), dtype=np.uint8), off
        bits_px = depth * channels
        stride = (sw * bits_px + 7) // 8
        bpp = max(1, bits_px // 8)  # filter step in whole bytes (§6.5)
        if len(raw) < off + (stride + 1) * sh:
            raise ValueError("PNG IDAT stream truncated")
        recon = np.empty((sh, stride), dtype=np.uint8)
        prev = bytearray(stride)
        for y in range(sh):
            f = raw[off]
            line = bytearray(raw[off + 1 : off + 1 + stride])
            off += 1 + stride
            if f == 1:  # Sub
                for x in range(bpp, stride):
                    line[x] = (line[x] + line[x - bpp]) & 0xFF
            elif f == 2:  # Up
                for x in range(stride):
                    line[x] = (line[x] + prev[x]) & 0xFF
            elif f == 3:  # Average
                for x in range(stride):
                    a = line[x - bpp] if x >= bpp else 0
                    line[x] = (line[x] + ((a + prev[x]) >> 1)) & 0xFF
            elif f == 4:  # Paeth
                for x in range(stride):
                    a = line[x - bpp] if x >= bpp else 0
                    c = prev[x - bpp] if x >= bpp else 0
                    line[x] = (line[x] + _paeth(a, prev[x], c)) & 0xFF
            elif f != 0:
                raise ValueError(f"PNG filter type {f} invalid")
            recon[y] = np.frombuffer(bytes(line), dtype=np.uint8)
            prev = line
        if depth < 8:
            unpacked = np.unpackbits(recon, axis=1)
            fields = unpacked[:, : sw * depth].reshape(sh, sw, depth)
            weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
            vals = (fields * weights).sum(axis=2).astype(np.uint8)
            return vals[:, :, None], off
        if depth == 16:
            vals = (
                recon[:, : sw * channels * 2]
                .copy()
                .view(">u2")
                .astype(np.uint16)
                .reshape(sh, sw, channels)
            )
            return vals, off
        return recon[:, : sw * channels].reshape(sh, sw, channels), off

    if interlace:  # Adam7: seven independently filtered sub-images
        dtype = np.uint16 if depth == 16 else np.uint8
        px = np.zeros((h, w, channels), dtype=dtype)
        off = 0
        for x0, y0, xs, ys in _ADAM7_PASSES:
            sw = (w - x0 + xs - 1) // xs
            sh = (h - y0 + ys - 1) // ys
            vals, off = sub_image(off, sw, sh)
            px[y0::ys, x0::xs] = vals
    else:
        px, _ = sub_image(0, w, h)
    if ctype == 0 and depth < 8:
        # Rescale sub-byte grey to 8-bit (palette indices are used as-is).
        px = (px * (255 // ((1 << depth) - 1))).astype(np.uint8)
    if ctype == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        px = pal[px[:, :, 0]]
    return px


def decode_bmp_pixels(payload: bytes):
    """REAL, dependency-free BMP pixel decode: uncompressed (BI_RGB)
    BITMAPINFOHEADER files at 8 (palette), 24, or 32 bits.  Returns a
    numpy uint8 array (height, width, channels) — 3 channels RGB for
    8/24-bit, 4 (RGBA) for 32-bit; rows un-padded, bottom-up storage
    flipped (negative heights = top-down honored)."""
    import numpy as np

    p = payload or b""
    if len(p) < 54 or p[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = int.from_bytes(p[10:14], "little")
    hdr_size = int.from_bytes(p[14:18], "little")
    if hdr_size < 40:
        raise NotImplementedError("BITMAPCOREHEADER BMP not supported")
    w = int.from_bytes(p[18:22], "little", signed=True)
    h_raw = int.from_bytes(p[22:26], "little", signed=True)
    bits = int.from_bytes(p[28:30], "little")
    comp = int.from_bytes(p[30:34], "little")
    if comp != 0:
        raise NotImplementedError(f"BMP compression {comp} not supported")
    if bits not in (8, 24, 32):
        raise NotImplementedError(f"BMP bit depth {bits} not supported")
    h, top_down = abs(h_raw), h_raw < 0
    stride = ((w * bits + 31) // 32) * 4
    raw = np.frombuffer(
        p[data_off : data_off + stride * h], dtype=np.uint8
    ).reshape(h, stride)
    if bits == 8:
        n_colors = int.from_bytes(p[46:50], "little") or 256
        pal_bytes = p[14 + hdr_size : 14 + hdr_size + 4 * n_colors]
        if len(pal_bytes) < 4 * n_colors:
            raise ValueError("BMP truncated inside color table")
        pal = np.frombuffer(pal_bytes, dtype=np.uint8).reshape(-1, 4)[
            :, :3
        ][:, ::-1]  # BGRX -> RGB
        idx = raw[:, :w]
        if int(idx.max(initial=0)) >= n_colors:
            raise ValueError("BMP palette index out of range")
        px = pal[idx]
    else:
        ch = bits // 8
        px = raw[:, : w * ch].reshape(h, w, ch)
        # BGR(A) -> RGB(A)
        px = px[:, :, [2, 1, 0] + ([3] if ch == 4 else [])]
    return px if top_down else px[::-1].copy()


def _gif_lzw_decode(min_code_size: int, data: bytes, n_expected: int) -> list:
    """GIF-variant LZW: LSB-first bitstream, growing code width, CLEAR
    resets the dictionary, EOI terminates."""
    # Spec bounds the root code size at 2..8 bits (codes cap at 12); a
    # corrupt byte here would otherwise size the dictionary at 2^255.
    if not 2 <= min_code_size <= 11:
        raise ValueError(f"GIF LZW min code size {min_code_size} invalid")
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    out: list[int] = []
    # bit reader
    pos = 0
    nbits = len(data) * 8

    def read(width: int) -> int:
        nonlocal pos
        if pos + width > nbits:
            return eoi  # truncated stream: stop cleanly
        v = 0
        for i in range(width):
            byte = data[(pos + i) >> 3]
            v |= ((byte >> ((pos + i) & 7)) & 1) << i
        pos += width
        return v

    def reset():
        return {i: [i] for i in range(clear)}, min_code_size + 1

    table, width = reset()
    prev: list[int] | None = None
    next_code = eoi + 1
    while len(out) < n_expected:
        code = read(width)
        if code == eoi:
            break
        if code == clear:
            table, width = reset()
            next_code = eoi + 1
            prev = None
            continue
        if code in table:
            entry = table[code]
        elif code == next_code and prev is not None:
            entry = prev + [prev[0]]
        else:
            raise ValueError("corrupt GIF LZW stream")
        out.extend(entry)
        if prev is not None:
            table[next_code] = prev + [entry[0]]
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry
    return out[:n_expected]


_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def iter_gif_frames(payload: bytes):
    """Yield every image block of a GIF as a numpy uint8 RGB array
    (region_height, region_width, 3), in stream order — full LZW
    decompression (growing code widths, CLEAR/EOI), global/local color
    tables, 4-pass interlace.  Frames are the raw image-block regions;
    inter-frame compositing (disposal methods, transparency overlay)
    is deliberately out of scope — the frame-sampling pipeline wants
    the per-frame pixel content, not a playback renderer."""
    import numpy as np

    p = payload or b""
    if len(p) < 13 or p[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    flags = p[10]
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        if pos + 3 * n > len(p):
            raise ValueError("GIF truncated inside global color table")
        gct = np.frombuffer(p[pos : pos + 3 * n], dtype=np.uint8).reshape(-1, 3)
        pos += 3 * n
    seen = False
    while pos < len(p):
        block = p[pos]
        if block == 0x21:  # extension: label + length-prefixed sub-blocks
            pos += 2
            while pos < len(p) and p[pos]:
                pos += 1 + p[pos]
            pos += 1
        elif block == 0x2C:  # image descriptor
            if pos + 10 > len(p):
                raise ValueError("GIF truncated inside image descriptor")
            w = int.from_bytes(p[pos + 5 : pos + 7], "little")
            h = int.from_bytes(p[pos + 7 : pos + 9], "little")
            iflags = p[pos + 9]
            pos += 10
            ct = gct
            if iflags & 0x80:
                n = 2 << (iflags & 0x07)
                if pos + 3 * n > len(p):
                    raise ValueError("GIF truncated inside color table")
                ct = np.frombuffer(
                    p[pos : pos + 3 * n], dtype=np.uint8
                ).reshape(-1, 3)
                pos += 3 * n
            if ct is None:
                raise ValueError("GIF image without a color table")
            if pos >= len(p):
                raise ValueError("GIF truncated before LZW code size")
            min_code = p[pos]
            pos += 1
            chunks = []
            while pos < len(p) and p[pos]:
                ln = p[pos]
                chunks.append(p[pos + 1 : pos + 1 + ln])
                pos += 1 + ln
            pos += 1  # block terminator
            idx = np.array(
                _gif_lzw_decode(min_code, b"".join(chunks), w * h),
                dtype=np.int64,
            )
            if len(idx) < w * h:
                raise ValueError("GIF pixel stream truncated")
            grid = idx.reshape(h, w)
            if iflags & 0x40:  # interlaced: rows arrive in 4 passes
                # out_rows[y] = stream position holding display row y
                out_rows = np.empty(h, dtype=np.int64)
                src = 0
                for start, step in _GIF_INTERLACE_PASSES:
                    for y in range(start, h, step):
                        out_rows[y] = src
                        src += 1
                grid = grid[out_rows]
            seen = True
            yield ct[np.clip(grid, 0, len(ct) - 1)]
        elif block == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
    if not seen:
        raise ValueError("GIF contains no image block")


def decode_gif_pixels(payload: bytes):
    """First frame of ``iter_gif_frames`` — the still-image decode."""
    return next(iter_gif_frames(payload))


def encode_png(px) -> bytes:
    """Minimal REAL PNG encoder (filter 0, one zlib-compressed IDAT):
    uint8 arrays of 1 (grey), 2 (grey+alpha), 3 (RGB) or 4 (RGBA)
    channels.  The write half of the decode -> transform -> re-encode
    loop; ``decode_png_pixels(encode_png(px)) == px`` exactly."""
    import zlib

    import numpy as np

    px = np.ascontiguousarray(px, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ch = px.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}.get(ch)
    if ctype is None:
        raise ValueError(f"encode_png: {ch} channels unsupported")
    raw = b"".join(b"\x00" + px[y].tobytes() for y in range(h))

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            len(data).to_bytes(4, "big")
            + typ
            + data
            + zlib.crc32(typ + data).to_bytes(4, "big")
        )

    ihdr = (
        w.to_bytes(4, "big")
        + h.to_bytes(4, "big")
        + bytes([8, ctype, 0, 0, 0])
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def decode_image_pixels(payload: bytes):
    """Dispatch full pixel decode by container magic: PNG, GIF, BMP,
    and JPEG (sequential baseline AND progressive) all decode for
    real (pure stdlib+numpy — JPEG via the Huffman+IDCT codec in
    ``operators/jpeg.py``); the arithmetic-coded and lossless JPEG
    profiles raise ``NotImplementedError`` at their exact missing
    piece."""
    p = payload or b""
    if p.startswith(b"\x89PNG\r\n\x1a\n"):
        return decode_png_pixels(p)
    if p[:6] in (b"GIF87a", b"GIF89a"):
        return decode_gif_pixels(p)
    if p[:2] == b"BM":
        return decode_bmp_pixels(p)
    if p[:2] == b"\xff\xd8":
        from wiki_references_db_spark.operators.jpeg import decode_jpeg_pixels

        return decode_jpeg_pixels(p)
    raise ValueError("payload is not PNG/GIF/BMP/JPEG")


PIXEL_STATS = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("pixel_sum", LongType()),
        StructField("pixel_min", IntegerType()),
        StructField("pixel_max", IntegerType()),
    ]
)


def image_pixel_stats(media: DataFrame) -> DataFrame:
    """Pixel-level image stats through the REAL decoder — the first stop
    of any pixel-space curation pass (dead-pixel screens, brightness
    filters, constant-image dedup).  PNG, GIF, BMP, and baseline-JPEG
    payloads fully decode (``decode_image_pixels``, progressive JPEG
    included).  Same contract as every stage here: Arrow batch in,
    narrow typed frame out."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k.name: [] for k in PIXEL_STATS.fields}
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                px = decode_image_pixels(p)
                out["media_id"].append(mid)
                out["height"].append(px.shape[0])
                out["width"].append(px.shape[1])
                out["channels"].append(px.shape[2])
                out["pixel_sum"].append(int(px.sum(dtype="int64")))
                out["pixel_min"].append(int(px.min()))
                out["pixel_max"].append(int(px.max()))
            yield pd.DataFrame(out)[[f.name for f in PIXEL_STATS.fields]]

    return media.filter(F.col("kind") == "image").mapInPandas(fn, PIXEL_STATS)


def decode_images(media: DataFrame, use_real_codecs: bool = False) -> DataFrame:
    """image payloads -> (width, height, channels).  mapInPandas: one
    Arrow batch in, one narrow pandas frame out."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if use_real_codecs:
                # Real container-header decode (PNG/GIF/BMP/JPEG — pure
                # Python, no libs).  Full pixel decode would need PIL:
                # wire PIL.Image.open(io.BytesIO(payload)) here.
                dims = []
                for p in pdf["payload"]:
                    parsed = parse_image_header(p)
                    if parsed is None:
                        raise NotImplementedError(
                            "payload is not PNG/GIF/BMP/JPEG; pixel-level "
                            "decode of other formats requires PIL, not "
                            "present in this environment"
                        )
                    dims.append(parsed[1:])
            else:
                dims = [_fake_dims(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "channels": [d[2] for d in dims],
                    "payload_bytes": [len(p or b"") for p in pdf["payload"]],
                }
            )

    return media.filter(F.col("kind") == "image").mapInPandas(fn, DECODED_IMAGE)


def extract_features(
    media: DataFrame, dim: int = 8, use_real_codecs: bool = False
) -> DataFrame:
    """payload -> fixed-dim feature vector.

    Default path: deterministic md5-seeded fake (reproducible pipeline
    plumbing; a model inference would batch here the same way).  With
    ``use_real_codecs=True``, a REAL model-free image feature: the
    L1-normalized ``dim``-bin luminance histogram over the actually
    decoded pixels (PNG/GIF/BMP via ``decode_image_pixels``) — the
    classic pre-embedding baseline for near-duplicate and
    constant-image screens, and a drop-in column for the
    embedding-cosine dedup family (baseline and progressive JPEG
    included, via the real codec).  Neural embeddings still need a
    model runtime and stay out of scope.

    The real path operates on IMAGE rows only (same ``kind`` filter as
    ``decode_images`` / ``resize_images`` / ``image_pixel_stats``) —
    audio/video payloads are not silently md5-faked nor fed to the
    image decoders.  The fake path keeps featurizing every kind: the
    plumbing contract (schema, batching, one row per media_id) is
    modality-independent."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            feats = []
            for p in pdf["payload"]:
                if use_real_codecs:
                    raw = decode_image_pixels(p)
                    # luminance in [0, 1): mean over channels, scaled by
                    # the dtype's sample range (uint8 or uint16)
                    peak = 65536.0 if raw.dtype == np.uint16 else 256.0
                    lum = raw.astype(np.float64).mean(axis=2) / peak
                    hist, _ = np.histogram(lum, bins=dim, range=(0.0, 1.0))
                    total = max(1, int(hist.sum()))
                    feats.append([float(v) / total for v in hist])
                else:
                    h = hashlib.md5(p or b"").digest()
                    feats.append([(h[i] - 128) / 128.0 for i in range(dim)])
            yield pd.DataFrame({"media_id": pdf["media_id"], "feature": feats})

    src = media.filter(F.col("kind") == "image") if use_real_codecs else media
    return src.mapInPandas(fn, FEATURES)


def sample_frames(
    media: DataFrame, every_n_bytes: int = 1024, max_frames: int = 8,
    use_real_codecs: bool = False,
) -> DataFrame:
    """video payload -> sampled frame rows (one input row fans out to
    multiple frame rows — the shape is the contract).

    Default path: byte-slice stand-ins (deterministic plumbing fake).
    With ``use_real_codecs=True``, REAL frame sampling for animated GIF
    — the one video-ish container pure Python can decode: every
    ``max_frames``-capped stride through ``iter_gif_frames`` (full LZW),
    each sampled frame re-encoded as a standalone PNG payload
    (``encode_png``), so downstream image stages (pixel stats, resize,
    phash dedup) consume frames with zero special-casing.  MP4/WebM
    keyframe seeking genuinely needs ffmpeg and raises."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_index": [], "frame_payload": []}
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                p = p or b""
                if use_real_codecs:
                    if p[:6] not in (b"GIF87a", b"GIF89a"):
                        raise NotImplementedError(
                            "real frame sampling implemented for animated "
                            "GIF; MP4/WebM keyframe seeking requires ffmpeg"
                        )
                    frames = list(iter_gif_frames(p))
                    stride = max(1, len(frames) // max_frames)
                    for fi, frame in enumerate(frames[::stride][:max_frames]):
                        out["media_id"].append(mid)
                        out["frame_index"].append(fi)
                        out["frame_payload"].append(encode_png(frame))
                    continue
                for idx in range(min(max_frames, max(1, len(p) // every_n_bytes))):
                    out["media_id"].append(mid)
                    out["frame_index"].append(idx)
                    out["frame_payload"].append(
                        p[idx * every_n_bytes : (idx + 1) * every_n_bytes]
                    )
            yield pd.DataFrame(out)

    return media.filter(F.col("kind") == "video").mapInPandas(fn, FRAMES)


RESIZED = StructType(
    [
        StructField("media_id", LongType()),
        StructField("src_width", IntegerType()),
        StructField("src_height", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("resized_bytes", LongType()),
    ]
)


def resize_images(
    media: DataFrame,
    width: int = 32,
    height: int = 32,
    use_real_codecs: bool = False,
) -> DataFrame:
    """image payloads -> fixed-target resize.  The stub decodes source
    dims via ``_fake_dims`` and reports the resized buffer size
    (width*height*channels); a real implementation replaces the body
    with PIL ``Image.resize`` and re-encode.  Same mapInPandas contract:
    Arrow batch in, narrow typed frame out, no per-row Python."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            if use_real_codecs:
                # REAL path: full pixel decode (PNG/GIF/BMP/JPEG
                # incl. progressive) + nearest-neighbor resample
                # (pure numpy).
                dims = []
                for p in pdf["payload"]:
                    px = decode_image_pixels(p)
                    ys = np.minimum(
                        (np.arange(height) * px.shape[0]) // height,
                        px.shape[0] - 1,
                    )
                    xs = np.minimum(
                        (np.arange(width) * px.shape[1]) // width,
                        px.shape[1] - 1,
                    )
                    resized = px[ys][:, xs]
                    dims.append((px.shape[1], px.shape[0], resized.shape[2]))
            else:
                dims = [_fake_dims(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "src_width": [d[0] for d in dims],
                    "src_height": [d[1] for d in dims],
                    "width": [width] * len(pdf),
                    "height": [height] * len(pdf),
                    "resized_bytes": [width * height * d[2] for d in dims],
                }
            )

    return media.filter(F.col("kind") == "image").mapInPandas(fn, RESIZED)


THUMBNAILS = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("thumb_payload", BinaryType()),
    ]
)


def encode_thumbnails(
    media: DataFrame,
    max_side: int = 64,
    quality: int = 85,
    skipped_acc=None,
) -> DataFrame:
    """REAL end-to-end thumbnail stage — decode (PNG/GIF/BMP/baseline
    JPEG via ``decode_image_pixels``), aspect-preserving
    nearest-neighbor downscale to ``max_side``, re-encode as baseline
    JPEG (``operators/jpeg.py``) — the vision-training-data shape
    (dataset thumbnails / fixed-budget previews) with a REAL binary
    payload out, closing the media loop decode -> transform -> encode
    with no codec library.  Images already within ``max_side`` pass
    through un-resized (but still re-encoded, normalizing the corpus to
    one format).  16-bit PNG sources are rescaled to 8-bit; palette/
    grayscale/RGBA inputs land as grayscale or RGB JPEG (alpha
    dropped).  Same contract as every stage: Arrow batch in, narrow
    typed frame out, binary stays columnar.

    Damaged-corpus contract: a payload whose decode raises a clean
    codec error (ValueError for corrupt bytes, NotImplementedError for
    an unsupported profile, e.g. arithmetic-coded JPEG) is SKIPPED —
    dropped from the output, never aborting the Spark task — because a
    curation stage by design ingests damaged media.  Rows present in
    the output are guaranteed fully decoded and re-encoded; callers
    needing the IDENTITY of skipped rows anti-join the output against
    the input on ``media_id``.  For the RATE — the signal that matters
    at 28.8B-row scale, where an extra anti-join pass is not free —
    pass ``skipped_acc`` (a ``spark.sparkContext.accumulator(0)``): it
    is incremented once per skipped payload inside the Arrow workers,
    so after any action on the result the drop count is readable on
    the driver with zero extra passes (ADVICE r9)."""
    from wiki_references_db_spark.operators.jpeg import encode_jpeg_baseline

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = {"media_id": [], "width": [], "height": [], "thumb_payload": []}
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                try:
                    px = decode_image_pixels(p)
                except (ValueError, NotImplementedError):
                    # Skip undecodable payloads, keep the task alive —
                    # but make the skip observable on the driver.
                    if skipped_acc is not None:
                        skipped_acc.add(1)
                    continue
                if px.dtype == np.uint16:
                    px = (px // 257).astype(np.uint8)
                h, w = px.shape[:2]
                scale = max(h, w) / max_side
                if scale > 1.0:
                    th = max(1, round(h / scale))
                    tw = max(1, round(w / scale))
                    ys = np.minimum((np.arange(th) * h) // th, h - 1)
                    xs = np.minimum((np.arange(tw) * w) // tw, w - 1)
                    px = px[ys][:, xs]
                else:
                    th, tw = h, w
                if px.shape[2] == 4:  # RGBA -> RGB
                    px = px[:, :, :3]
                elif px.shape[2] == 2:  # gray+alpha -> gray
                    px = px[:, :, :1]
                out["media_id"].append(mid)
                out["width"].append(tw)
                out["height"].append(th)
                out["thumb_payload"].append(
                    encode_jpeg_baseline(px, quality=quality)
                )
            yield pd.DataFrame(out)

    return media.filter(F.col("kind") == "image").mapInPandas(fn, THUMBNAILS)


DECODED_AUDIO = StructType(
    [
        StructField("media_id", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_channels", IntegerType()),
        StructField("duration_ms", LongType()),
        StructField("payload_bytes", LongType()),
    ]
)

_SAMPLE_RATES = (8000, 16000, 22050, 44100, 48000)


def parse_wav_header(payload: bytes) -> tuple[str, int, int, int] | None:
    """REAL header decode, dependency-free: (format, sample_rate,
    n_channels, duration_ms) parsed from a RIFF/WAVE container by
    walking its chunk list to ``fmt `` and ``data``, or None if the
    payload is not a WAV.  The audio twin of ``parse_image_header`` —
    the metadata a media pipeline extracts without decoding samples;
    compressed formats (mp3/ogg/flac) still need soundfile/ffprobe and
    stay behind the documented NotImplementedError."""
    p = payload or b""
    if len(p) < 12 or p[:4] != b"RIFF" or p[8:12] != b"WAVE":
        return None
    rate = nch = byte_rate = None
    data_size = None
    i = 12
    while i + 8 <= len(p):
        cid = p[i : i + 4]
        size = int.from_bytes(p[i + 4 : i + 8], "little")
        if cid == b"fmt ":
            # A PCM fmt chunk declares >= 16 payload bytes; a smaller
            # declared size means the fixed-offset fields below would
            # read the NEXT chunk's bytes — reject instead of parsing
            # garbage.
            if size < 16 or i + 8 + 16 > len(p):
                return None
            nch = int.from_bytes(p[i + 10 : i + 12], "little")
            rate = int.from_bytes(p[i + 12 : i + 16], "little")
            byte_rate = int.from_bytes(p[i + 16 : i + 20], "little")
        elif cid == b"data":
            data_size = size
        # Chunks are word-aligned: odd sizes carry a pad byte.
        i += 8 + size + (size % 2)
    if not rate or not nch or not byte_rate or data_size is None:
        return None
    return "wav", rate, nch, data_size * 1000 // byte_rate


def decode_wav_samples(payload: bytes):
    """REAL, dependency-free WAV sample decode: PCM at 8/16/24/32 bits
    and IEEE-float32, returned as a numpy float64 array of shape
    ``(n_frames, n_channels)`` normalized to [-1, 1], plus the sample
    rate: ``(samples, rate)``.  Compressed codecs inside WAV (ADPCM,
    mp3-in-RIFF, ...) genuinely need a codec library and raise."""
    import numpy as np

    p = payload or b""
    if len(p) < 12 or p[:4] != b"RIFF" or p[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    fmt = None
    data = None
    i = 12
    while i + 8 <= len(p):
        cid = p[i : i + 4]
        size = int.from_bytes(p[i + 4 : i + 8], "little")
        if cid == b"fmt ":
            if size < 16 or i + 8 + 16 > len(p):
                raise ValueError("WAV fmt chunk truncated")
            fmt = (
                int.from_bytes(p[i + 8 : i + 10], "little"),   # audio format
                int.from_bytes(p[i + 10 : i + 12], "little"),  # channels
                int.from_bytes(p[i + 12 : i + 16], "little"),  # rate
                int.from_bytes(p[i + 22 : i + 24], "little"),  # bits/sample
            )
        elif cid == b"data":
            if i + 8 + size > len(p):
                raise ValueError("WAV data chunk truncated")
            data = p[i + 8 : i + 8 + size]
        i += 8 + size + (size % 2)
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    afmt, nch, rate, bits = fmt
    if not nch or not rate:
        raise ValueError("WAV fmt chunk invalid")
    if afmt == 1 and bits == 8:
        x = (np.frombuffer(data, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    elif afmt == 1 and bits == 16:
        x = np.frombuffer(data[: len(data) // 2 * 2], dtype="<i2").astype(
            np.float64
        ) / 32768.0
    elif afmt == 1 and bits == 24:
        b3 = np.frombuffer(data[: len(data) // 3 * 3], dtype=np.uint8).reshape(
            -1, 3
        ).astype(np.int64)
        v = b3[:, 0] | (b3[:, 1] << 8) | (b3[:, 2] << 16)
        v = np.where(v >= 1 << 23, v - (1 << 24), v)
        x = v.astype(np.float64) / float(1 << 23)
    elif afmt == 1 and bits == 32:
        x = np.frombuffer(data[: len(data) // 4 * 4], dtype="<i4").astype(
            np.float64
        ) / float(1 << 31)
    elif afmt == 3 and bits == 32:
        x = np.frombuffer(data[: len(data) // 4 * 4], dtype="<f4").astype(
            np.float64
        )
    else:
        raise NotImplementedError(
            f"WAV audio format {afmt} at {bits} bits needs a codec "
            "library (soundfile) — only PCM 8/16/24/32 and float32 "
            "decode dependency-free"
        )
    n_frames = len(x) // nch
    return x[: n_frames * nch].reshape(n_frames, nch), rate


AUDIO_SAMPLE_STATS = StructType(
    [
        StructField("media_id", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_channels", IntegerType()),
        StructField("n_frames", LongType()),
        StructField("peak", FloatType()),
        StructField("rms", FloatType()),
        StructField("clip_ratio", FloatType()),
    ]
)


def audio_sample_stats(media: DataFrame) -> DataFrame:
    """Sample-level audio stats through the REAL PCM decoder — the audio
    twin of ``image_pixel_stats`` (silence screens, clipping detection,
    loudness normalization inputs).  Arrow batch in, narrow typed frame
    out; compressed audio raises at its exact missing codec."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = {k.name: [] for k in AUDIO_SAMPLE_STATS.fields}
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                samples, rate = decode_wav_samples(p)
                flat = samples.ravel()
                out["media_id"].append(mid)
                out["sample_rate"].append(rate)
                out["n_channels"].append(samples.shape[1])
                out["n_frames"].append(samples.shape[0])
                out["peak"].append(
                    float(np.abs(flat).max()) if len(flat) else 0.0
                )
                out["rms"].append(
                    float(np.sqrt((flat * flat).mean())) if len(flat) else 0.0
                )
                out["clip_ratio"].append(
                    float((np.abs(flat) >= 0.999).mean()) if len(flat) else 0.0
                )
            yield pd.DataFrame(out)[[f.name for f in AUDIO_SAMPLE_STATS.fields]]

    return media.filter(F.col("kind") == "audio").mapInPandas(
        fn, AUDIO_SAMPLE_STATS
    )


def decode_audio(media: DataFrame, use_real_codecs: bool = False) -> DataFrame:
    """audio payloads -> (sample_rate, channels, duration).  The stub
    derives parameters from the content hash and models duration as
    bytes / (rate * channels * 2) for 16-bit PCM; with
    ``use_real_codecs=True`` genuine RIFF/WAVE containers are decoded
    for real (``parse_wav_header``) and anything else raises where
    soundfile/ffprobe would plug in.  Same contract as decode_images:
    Arrow batch in, narrow typed frame out."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rates, chans, durs, sizes = [], [], [], []
            for p in pdf["payload"]:
                p = p or b""
                if use_real_codecs:
                    # Real container-header decode (WAV/RIFF — pure
                    # Python, no libs).  Compressed audio would need
                    # soundfile/ffprobe: wire sf.info(...) here.
                    parsed = parse_wav_header(p)
                    if parsed is None:
                        raise NotImplementedError(
                            "payload is not RIFF/WAVE; decoding "
                            "compressed audio requires soundfile/"
                            "ffprobe, not present in this environment"
                        )
                    _, rate, nch, dur = parsed
                else:
                    h = hashlib.md5(p).digest()
                    rate = _SAMPLE_RATES[h[0] % len(_SAMPLE_RATES)]
                    nch = 1 + h[1] % 2
                    dur = len(p) * 1000 // (rate * nch * 2)
                rates.append(rate)
                chans.append(nch)
                durs.append(dur)
                sizes.append(len(p))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "sample_rate": rates,
                    "n_channels": chans,
                    "duration_ms": durs,
                    "payload_bytes": sizes,
                }
            )

    return media.filter(F.col("kind") == "audio").mapInPandas(fn, DECODED_AUDIO)
