"""JPEG (ITU-T T.81 / ISO 10918-1) pixel decode — pure stdlib + numpy,
no PIL/libjpeg.  Sequential baseline (SOF0/SOF1) AND progressive
(SOF2) Huffman profiles decode for real; only the arithmetic-coded and
lossless/hierarchical profiles raise ``NotImplementedError`` — honest
boundaries, same policy as the other codecs in
``operators/multimodal.py`` (reference parity note: the reference repo
never decodes media at all; this family is part of the training-data
pipeline surface, not reference parity).

Decode path, per T.81:

- segment walk (every segment length-validated against truncation):
  DQT (quant tables, 8/16-bit, zigzag order), DHT (Huffman code
  lengths + symbols, DC/AC classes), SOF (dimensions, per-component
  sampling factors), DRI (restart interval), SOS — any number of
  scans, each decoded into per-component ZIGZAG coefficient planes by
  ONE unified scan engine;
- the scan engine handles interleaved (MCU-order) and non-interleaved
  (per-component raster over its OWN block grid, T.81 A.2.2) scans,
  spectral selection bands [Ss..Se], successive approximation (first
  scans at Al, DC/AC refinement at Ah with correction bits), EOB runs
  spanning blocks, and RSTn restarts (predictors + EOB run reset, bit
  buffer realigned); sequential is simply the one-scan special case
  (Ss=0, Se=63, Ah=Al=0);
- entropy decode: canonical Huffman (T.81 annex C construction),
  bitstream with 0xFF00 byte-unstuffing; any real marker terminates a
  scan's entropy data (the read-ahead buffer pads with 1-bits and
  never consumes past the scan);
- at EOI: dequantize the accumulated planes, inverse zigzag, exact
  orthonormal 8x8 IDCT as two numpy matmuls vectorized over all blocks
  of a component, chroma upsampled by sample replication, YCbCr -> RGB
  per JFIF (BT.601 full range), level shift, clip to uint8.

Robustness: for EVERY truncation point of a valid payload (exhaustive
sweep in tests/test_jpeg.py) and for randomized byte corruption
(sampled sweep), decode either raises a clean ValueError /
NotImplementedError or returns a full-shape uint8 image — never hangs,
never escapes with an arithmetic/index error.

Matching ENCODERS live in ``encode_jpeg_baseline`` (gray or YCbCr
4:4:4 / 4:2:0 / 4:2:2 / 4:1:1, standard Annex K tables scaled by a quality
knob, optional restart intervals) and ``encode_jpeg_progressive``
(spectral-selection scan scripts, full successive-approximation
emission with T.81 G.1.2.2 correction-bit refinement scans, restart
intervals — all over the IDENTICAL quantized coefficients) — the
tests' differential ground-truth producers (no other JPEG library
exists in this container) and a real sink for small thumbnails.
"""

from __future__ import annotations

import struct

import numpy as np

# Zigzag index: _ZIGZAG[k] = (row, col) of the k-th coefficient in scan
# order; built programmatically (T.81 figure A.6).
def _zigzag_order() -> list[tuple[int, int]]:
    order = []
    r = c = 0
    for _ in range(64):
        order.append((r, c))
        if (r + c) % 2 == 0:  # moving up-right
            if c == 7:
                r += 1
            elif r == 0:
                c += 1
            else:
                r -= 1
                c += 1
        else:  # moving down-left
            if r == 7:
                c += 1
            elif c == 0:
                r += 1
            else:
                r += 1
                c -= 1
    return order


_ZIGZAG = _zigzag_order()
_ZZ_ROWS = np.array([rc[0] for rc in _ZIGZAG])
_ZZ_COLS = np.array([rc[1] for rc in _ZIGZAG])

# Orthonormal DCT basis: _DCT_M[x, u] = a(u) cos((2x+1) u pi / 16);
# spatial = M @ F @ M.T, coefficients F = M.T @ f @ M.
_DCT_M = np.zeros((8, 8))
for _x in range(8):
    for _u in range(8):
        a = np.sqrt(0.125) if _u == 0 else 0.5
        _DCT_M[_x, _u] = a * np.cos((2 * _x + 1) * _u * np.pi / 16)


class _BitReader:
    """MSB-first bit reader over an entropy-coded segment with 0xFF00
    unstuffing; restart markers are handled by the caller via
    ``restart()`` (byte-aligns and steps past the marker)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos  # byte position
        self.bits = 0  # bit buffer (int)
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        while self.nbits <= 24:
            if self.pos >= len(d):
                # Past the end: pad with 1-bits (T.81 F.2.2.5 allows the
                # final EOB code to be completed by padding).
                self.bits = (self.bits << 8) | 0xFF
                self.nbits += 8
                continue
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:  # stuffed literal 0xFF
                    self.pos += 2
                else:
                    # Any real marker ends this scan's entropy data
                    # (restart, EOI, or the next segment of a
                    # multi-scan stream): stop feeding real bytes and
                    # pad with 1-bits — the read-ahead buffer must
                    # never consume past the scan (pos stays on the
                    # 0xFF for the caller's marker walk).
                    self.bits = (self.bits << 8) | 0xFF
                    self.nbits += 8
                    continue
            else:
                self.pos += 1
            self.bits = (self.bits << 8) | b
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bits >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def restart(self) -> None:
        """Byte-align and consume one RSTn marker."""
        self.bits = 0
        self.nbits = 0
        d = self.data
        # Skip to the marker (there may be pad bits already consumed via
        # the buffer; pos sits at or before the 0xFF).
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("expected restart marker, hit end of scan")


class _Huff:
    """Canonical JPEG Huffman table: (length, code) -> symbol, decoded
    bit-by-bit with per-length code ranges (fast enough at fixture
    scale; the hot production path is Arrow-batched around this)."""

    def __init__(self, counts: list[int], symbols: bytes):
        if len(counts) != 16 or len(symbols) < sum(counts):
            raise ValueError("corrupt JPEG: truncated Huffman table (DHT)")
        self.maxcode = [-1] * 17
        self.mincode = [0] * 17
        self.valptr = [0] * 17
        self.symbols = symbols
        code = 0
        k = 0
        for ln in range(1, 17):
            if counts[ln - 1] == 0:
                self.maxcode[ln] = -1
                code <<= 1
                continue
            self.valptr[ln] = k
            self.mincode[ln] = code
            code += counts[ln - 1]
            k += counts[ln - 1]
            self.maxcode[ln] = code - 1
            code <<= 1

    def decode(self, br: _BitReader) -> int:
        code = br.read_bit()
        ln = 1
        while code > self.maxcode[ln] or self.maxcode[ln] == -1:
            ln += 1
            if ln > 16:
                raise ValueError("corrupt JPEG: Huffman code over 16 bits")
            code = (code << 1) | br.read_bit()
        return self.symbols[self.valptr[ln] + code - self.mincode[ln]]


def _extend(v: int, t: int) -> int:
    # T.81 F.2.2.1 EXTEND: map the t-bit magnitude to its signed value.
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg_pixels(payload: bytes) -> np.ndarray:
    """Full JPEG pixel decode — sequential baseline (SOF0/SOF1,
    interleaved or multi-scan non-interleaved) AND progressive (SOF2:
    spectral selection, successive approximation, EOB runs, restart
    intervals).  Returns (H, W, channels) uint8 — channels 1
    (grayscale) or 3 (RGB from YCbCr).  Raises ``NotImplementedError``
    for the arithmetic-coded and lossless/hierarchical profiles and
    ``ValueError`` on corrupt streams.

    Architecture: one unified scan engine fills per-component
    coefficient planes (zigzag order) across however many SOS scans the
    stream carries — a sequential frame is simply the one-scan special
    case (ss=0, se=63, ah=al=0) — and dequantization + IDCT run once at
    EOI over the accumulated planes."""
    p = payload or b""
    if p[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")

    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _Huff] = {}
    huff_ac: dict[int, _Huff] = {}
    restart_interval = 0
    frame = None  # (h, w, [(comp_id, hs, vs, tq)], progressive)
    coefs = None  # comp_id -> (nby, nbx, 64) int32 zigzag planes
    saw_scan = False

    i = 2
    while i + 3 < len(p):
        if p[i] != 0xFF:
            raise ValueError(f"corrupt JPEG: expected marker at {i}")
        marker = p[i + 1]
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        seg_len = int.from_bytes(p[i + 2 : i + 4], "big")
        seg = p[i + 4 : i + 2 + seg_len]
        if seg_len < 2 or len(seg) != seg_len - 2:
            raise ValueError("corrupt JPEG: truncated marker segment")
        if marker == 0xDB:  # DQT
            j = 0
            while j < len(seg):
                prec, tid = seg[j] >> 4, seg[j] & 0xF
                j += 1
                n = 64 * (2 if prec else 1)
                if j + n > len(seg):
                    raise ValueError(
                        "corrupt JPEG: truncated quantization table (DQT)"
                    )
                vals = (
                    np.frombuffer(seg[j : j + n], dtype=">u2")
                    if prec
                    else np.frombuffer(seg[j : j + 64], dtype=np.uint8)
                ).astype(np.int32)
                qt[tid] = vals.copy()  # zigzag order
                j += n
        elif marker == 0xC4:  # DHT
            j = 0
            while j < len(seg):
                cls, tid = seg[j] >> 4, seg[j] & 0xF
                counts = list(seg[j + 1 : j + 17])
                total = sum(counts)
                symbols = seg[j + 17 : j + 17 + total]
                (huff_dc if cls == 0 else huff_ac)[tid] = _Huff(
                    counts, symbols
                )
                j += 17 + total
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(seg[:2], "big")
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 prog
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            ncomp = seg[5]
            if len(seg) < 6 + 3 * ncomp:
                raise ValueError("corrupt JPEG: truncated frame header (SOF)")
            comps = []
            for c in range(ncomp):
                cid = seg[6 + 3 * c]
                samp = seg[7 + 3 * c]
                comps.append((cid, samp >> 4, samp & 0xF, seg[8 + 3 * c]))
            if h == 0 or w == 0 or any(
                not (1 <= hs <= 4 and 1 <= vs <= 4) for _, hs, vs, _ in comps
            ):
                raise ValueError(
                    "corrupt JPEG: illegal frame dimensions or sampling "
                    "factors in SOF"
                )
            frame = (h, w, comps, marker == 0xC2)
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            mcux = -(-w // (8 * hmax))
            mcuy = -(-h // (8 * vmax))
            coefs = {
                cid: np.zeros((mcuy * vs, mcux * hs, 64), dtype=np.int64)
                for cid, hs, vs, tq in comps
            }
        elif marker in (0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "arithmetic-coded JPEG: QM-coder not implemented"
            )
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7):
            raise NotImplementedError(
                f"JPEG profile SOF{marker - 0xC0} (lossless/differential)"
                " not implemented"
            )
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("corrupt JPEG: SOS before SOF")
            i = _decode_scan(
                p, i + 2 + seg_len, seg, frame, coefs, huff_dc, huff_ac,
                restart_interval,
            )
            saw_scan = True
            continue
        i += 2 + seg_len

    if not saw_scan:
        raise ValueError("corrupt JPEG: no scan data")
    return _reconstruct(frame, coefs, qt)


def _comp_block_grid(frame, cid):
    """Non-interleaved block grid of one component: ceil(comp_dim/8)
    over the component's OWN sampled dimensions (T.81 A.2.2 — smaller
    than the MCU-padded grid when the image is not an exact multiple
    of the MCU size)."""
    h, w, comps, _ = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    for c, hs, vs, tq in comps:
        if c == cid:
            cw = -(-(w * hs) // hmax)
            ch = -(-(h * vs) // vmax)
            return -(-ch // 8), -(-cw // 8)
    raise ValueError(f"corrupt JPEG: scan references unknown component {cid}")


def _decode_scan(p, pos, seg, frame, coefs, huff_dc, huff_ac, restart_interval):
    """Unified T.81 scan engine (sequential AND progressive): decodes one
    entropy-coded segment into the zigzag coefficient planes and returns
    the byte offset of the next marker segment."""
    h, w, comps, progressive = frame
    if not seg:
        raise ValueError("corrupt JPEG: truncated scan header (SOS)")
    ns = seg[0]
    if len(seg) < 4 + 2 * ns:
        raise ValueError("corrupt JPEG: truncated scan header (SOS)")
    scomps = []  # (cid, dc_tid, ac_tid)
    for k in range(ns):
        cid = seg[1 + 2 * k]
        tb = seg[2 + 2 * k]
        if cid not in coefs:
            raise ValueError(
                "corrupt JPEG: scan references unknown component"
            )
        scomps.append((cid, tb >> 4, tb & 0xF))
    ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
    a = seg[3 + 2 * ns]
    ah, al = a >> 4, a & 0xF
    if ss > 63 or se > 63 or ss > se:
        raise ValueError("corrupt JPEG: illegal spectral band in SOS")
    if ah > 13 or al > 13:  # T.81 bounds on successive approximation
        raise ValueError("corrupt JPEG: illegal approximation bits in SOS")

    by_id = {cid: (hs, vs) for cid, hs, vs, tq in comps}
    br = _BitReader(p, pos)
    pred = {cid: 0 for cid, *_ in scomps}
    state = {"eobrun": 0}

    def decode_block(zz, dc_tbl, ac_tbl, cid):
        # DC band
        if ss == 0:
            if ah == 0:  # first (or sequential) DC
                t = dc_tbl.decode(br)
                if t > 15:
                    raise ValueError("corrupt JPEG: DC category over 15")
                pred[cid] += _extend(br.read_bits(t), t)
                zz[0] = pred[cid] << al
            else:  # DC refinement: one correction bit
                if br.read_bit():
                    zz[0] |= 1 << al
        if se == 0:
            return
        # AC band
        k = max(ss, 1)
        if ah == 0:  # first AC scan (sequential is the al=0 case)
            if state["eobrun"] > 0:
                state["eobrun"] -= 1
                return
            while k <= se:
                rs = ac_tbl.decode(br)
                r, s = rs >> 4, rs & 0xF
                if s == 0:
                    if r != 15:
                        state["eobrun"] = (1 << r) - 1
                        if r:
                            state["eobrun"] += br.read_bits(r)
                        return
                    k += 16  # ZRL
                    continue
                k += r
                if k > se:
                    raise ValueError("corrupt JPEG: AC run past band end")
                zz[k] = _extend(br.read_bits(s), s) << al
                k += 1
            return
        # AC refinement (T.81 G.1.2.3)
        p1, m1 = 1 << al, -1 << al

        def refine_nonzero(idx):
            if br.read_bit() and (zz[idx] & p1) == 0:
                zz[idx] += p1 if zz[idx] > 0 else m1

        if state["eobrun"] == 0:
            while k <= se:
                rs = ac_tbl.decode(br)
                r, s = rs >> 4, rs & 0xF
                if s == 0:
                    if r != 15:
                        # T.81 G.1.2.3 / libjpeg jdphuff convention for
                        # SA refinement: EOBRUN counts the CURRENT block
                        # too (1 << r, NOT (1 << r) - 1), so the tail
                        # correction-bit pass below always runs for this
                        # block's remaining nonzero-history coefficients
                        # before the decrement.  With the -1 form, a
                        # plain EOB (r=0, the most common refinement
                        # symbol) would skip those correction bits and
                        # desync the stream.
                        state["eobrun"] = 1 << r
                        if r:
                            state["eobrun"] += br.read_bits(r)
                        break
                    # ZRL: advance past 16 zero-history coefficients
                    val = 0
                else:
                    if s != 1:
                        raise ValueError(
                            "corrupt JPEG: refinement magnitude != 1"
                        )
                    val = p1 if br.read_bit() else m1
                while k <= se:
                    if zz[k] != 0:
                        refine_nonzero(k)
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if val and k <= se:
                    zz[k] = val
                k += 1
        if state["eobrun"] > 0:
            while k <= se:
                if zz[k] != 0:
                    refine_nonzero(k)
                k += 1
            state["eobrun"] -= 1

    tables = {}
    for cid, dct, act in scomps:
        dc_tbl = huff_dc.get(dct) if ss == 0 else None
        ac_tbl = huff_ac.get(act) if se > 0 else None
        if ss == 0 and dc_tbl is None:
            raise ValueError("corrupt JPEG: missing DC Huffman table")
        if se > 0 and ac_tbl is None:
            raise ValueError("corrupt JPEG: missing AC Huffman table")
        tables[cid] = (dc_tbl, ac_tbl)

    def maybe_restart(unit_idx):
        if restart_interval and unit_idx and unit_idx % restart_interval == 0:
            br.restart()
            for c in pred:
                pred[c] = 0
            state["eobrun"] = 0

    if ns > 1:  # interleaved: MCU order, hs*vs blocks per component
        hmax = max(c[1] for c in comps)
        vmax = max(c[2] for c in comps)
        mcux = -(-w // (8 * hmax))
        mcuy = -(-h // (8 * vmax))
        unit = 0
        for my in range(mcuy):
            for mx in range(mcux):
                maybe_restart(unit)
                for cid, dct, act in scomps:
                    hs, vs = by_id[cid]
                    dc_tbl, ac_tbl = tables[cid]
                    plane = coefs[cid]
                    for by in range(vs):
                        for bx in range(hs):
                            decode_block(
                                plane[my * vs + by, mx * hs + bx],
                                dc_tbl, ac_tbl, cid,
                            )
                unit += 1
    else:  # non-interleaved: raster over the component's own grid
        cid, dct, act = scomps[0]
        dc_tbl, ac_tbl = tables[cid]
        nby, nbx = _comp_block_grid(frame, cid)
        plane = coefs[cid]
        unit = 0
        for by in range(nby):
            for bx in range(nbx):
                maybe_restart(unit)
                decode_block(plane[by, bx], dc_tbl, ac_tbl, cid)
                unit += 1

    # Advance to the next marker segment: step past any partial byte,
    # stuffing, and trailing restart markers of this scan.
    d, j = p, br.pos
    while j + 1 < len(d):
        if d[j] == 0xFF and d[j + 1] != 0x00:
            if 0xD0 <= d[j + 1] <= 0xD7:
                j += 2
                continue
            return j
        j += 1
    return len(d)


def _reconstruct(frame, coefs, qt):
    """Dequantize the accumulated zigzag planes, IDCT (vectorized), and
    assemble the final (H, W, channels) uint8 image."""
    h, w, comps, _ = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    out_comps = []
    for cid, hs, vs, tq in comps:
        if tq not in qt:
            raise ValueError("corrupt JPEG: missing quantization table")
        zz = coefs[cid] * qt[tq][np.newaxis, np.newaxis, :]  # dequantize
        nby, nbx, _ = zz.shape
        blocks = np.zeros((nby, nbx, 8, 8), dtype=np.float64)
        blocks[:, :, _ZZ_ROWS, _ZZ_COLS] = zz
        spatial = np.einsum("xu,bcuv,yv->bcxy", _DCT_M, blocks, _DCT_M)
        pix = (
            spatial.transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8) + 128.0
        )
        if hs == hmax and vs == vmax:
            out_comps.append(pix[:h, :w])
        else:
            # Nearest-index upsample to the full-resolution grid —
            # exact for EVERY legal sampling ratio (4:2:0, 4:2:2,
            # 4:1:1, and the non-divisible combinations like Y 3x1
            # that repeat-by-integer-factor cannot express).
            ys = np.minimum((np.arange(h) * vs) // vmax, pix.shape[0] - 1)
            xs = np.minimum((np.arange(w) * hs) // hmax, pix.shape[1] - 1)
            out_comps.append(pix[ys][:, xs])

    if len(out_comps) == 1:
        gray = np.clip(np.round(out_comps[0]), 0, 255).astype(np.uint8)
        return gray[:, :, np.newaxis]
    if len(out_comps) != 3:
        raise NotImplementedError(
            f"{len(out_comps)}-component JPEG (CMYK/Adobe) not implemented"
        )
    y, cb, cr = out_comps
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# Minimal baseline encoder (tests' ground-truth producer + thumbnail sink)
# ---------------------------------------------------------------------------

# Standard Annex K tables (T.81 K.1/K.2) in natural (row-major) order.
_STD_LUM_Q = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], dtype=np.int32)
_STD_CHR_Q = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
], dtype=np.int32)

# Annex K Huffman specs: (counts[16], symbols)
_DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    bytes(range(12)),
)
_DC_CHR = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    bytes(range(12)),
)
_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    bytes([
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ]),
)
_AC_CHR = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    bytes([
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ]),
)


# AC table for successive-approximation REFINEMENT scans.  The Annex K
# baseline tables lack the EOBn symbols (0x10..0xE0) that multi-block
# EOB runs need (libjpeg ships optimized per-scan tables for the same
# reason).  A refinement scan's alphabet is exactly 32 symbols:
# (r<<4)|1 for r=0..15 (newly-nonzero), 0xF0 (ZRL), and n<<4 for
# n=0..14 (EOBn, run < 2^15) — a flat canonical table of 31 codes at
# length 5 plus 1 at length 6 (the all-ones length-5 code stays
# reserved per T.81 C.2).
_AC_PROG_REFINE = (
    [0, 0, 0, 0, 31, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
    bytes(
        [(r << 4) | 1 for r in range(16)]
        + [0xF0]
        + [n << 4 for n in range(15)]
    ),
)


def _enc_codes(counts, symbols):
    """Canonical codes (symbol -> (code, length)) for an encoder."""
    out = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(counts[ln - 1]):
            out[symbols[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)  # byte stuffing

    def align(self) -> None:
        # Pad the final partial byte with 1-bits (T.81 F.1.2.3).
        while self.n:
            self.write(1, 1)


def _mag_cat(v: int) -> int:
    return 0 if v == 0 else int(v if v > 0 else -v).bit_length()


def _scale_q(tbl: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    out = (tbl * s + 50) // 100
    return np.clip(out, 1, 255).astype(np.int32)


def _subsample_mode(subsample) -> str:
    """Normalize the encoder's subsampling knob: False/None -> "444",
    True -> "420" (back-compat), or an explicit
    "444"/"420"/"422"/"411"."""
    if subsample in (False, None):
        return "444"
    if subsample is True:
        return "420"
    if subsample in ("444", "420", "422", "411"):
        return subsample
    raise ValueError(f"unsupported subsampling mode {subsample!r}")


def _prepare_planes(px, quality, subsample):
    """Shared encoder front half: color transform, chroma subsampling,
    MCU-grid edge padding, per-component quantized ZIGZAG coefficient
    planes (nby, nbx, 64) — quantized once here, so the baseline and
    progressive serializations of the same image carry IDENTICAL
    coefficients."""
    if px.ndim == 2:
        px = px[:, :, np.newaxis]
    h, w, ch = px.shape
    gray = ch == 1
    ql = _scale_q(_STD_LUM_Q, quality)
    qc = _scale_q(_STD_CHR_Q, quality)

    if gray:
        planes = [(px[:, :, 0].astype(np.float64), ql, 1, 1)]
    else:
        r = px[:, :, 0].astype(np.float64)
        g = px[:, :, 1].astype(np.float64)
        b = px[:, :, 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        mode = _subsample_mode(subsample)
        if mode != "444":
            # Box average per factor; pad dims to a factor multiple by
            # edge replication first.  "420" averages 2x2, "422"
            # averages 1x2 (columns only), "411" averages 1x4 — the
            # subsampled layouts in common use (4:1:1 is the DV-video
            # layout; it exercises the decoder's non-square 4x1
            # nearest-index upsample).
            fy, fx = {"420": (2, 2), "422": (1, 2), "411": (1, 4)}[mode]

            def down(c):
                p = np.pad(
                    c,
                    ((0, (-c.shape[0]) % fy), (0, (-c.shape[1]) % fx)),
                    mode="edge",
                )
                return (
                    p.reshape(
                        p.shape[0] // fy, fy, p.shape[1] // fx, fx
                    ).mean(axis=(1, 3))
                )

            planes = [
                (y, ql, fx, fy),
                (down(cb), qc, 1, 1),
                (down(cr), qc, 1, 1),
            ]
        else:
            planes = [(y, ql, 1, 1), (cb, qc, 1, 1), (cr, qc, 1, 1)]

    hmax = max(pl[2] for pl in planes)
    vmax = max(pl[3] for pl in planes)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    zz_planes = []
    for data, q, hs, vs in planes:
        th, tw = mcuy * vs * 8, mcux * hs * 8
        ph, pw = data.shape
        pad = np.pad(data, ((0, th - ph), (0, tw - pw)), mode="edge")
        nby, nbx = th // 8, tw // 8
        zz = np.zeros((nby, nbx, 64), dtype=np.int64)
        qzz = q[_ZZ_ROWS, _ZZ_COLS]
        for by in range(nby):
            for bx in range(nbx):
                blk = pad[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                coef = _DCT_M.T @ (blk - 128.0) @ _DCT_M
                zz[by, bx] = np.round(
                    coef[_ZZ_ROWS, _ZZ_COLS] / qzz
                ).astype(np.int64)
        zz_planes.append((zz, hs, vs))
    return h, w, gray, ql, qc, zz_planes, (hmax, vmax, mcux, mcuy)


def _write_headers(out, h, w, gray, ql, qc, subsample, sof_marker):
    def seg(marker, body):
        out.extend(bytes([0xFF, marker]))
        out.extend(struct.pack(">H", len(body) + 2))
        out.extend(body)

    def dqt(tid, tbl):
        seg(0xDB, bytes([tid]) + bytes(int(v) for v in tbl[_ZZ_ROWS, _ZZ_COLS]))

    def dht(cls, tid, spec):
        counts, symbols = spec
        seg(0xC4, bytes([(cls << 4) | tid]) + bytes(counts) + symbols)

    dqt(0, ql)
    if not gray:
        dqt(1, qc)
    if gray:
        comps, ncomp = bytes([1, 0x11, 0]), 1
    else:
        samp_y = {"444": 0x11, "420": 0x22, "422": 0x21, "411": 0x41}[
            _subsample_mode(subsample)
        ]
        comps, ncomp = bytes([1, samp_y, 0, 2, 0x11, 1, 3, 0x11, 1]), 3
    seg(
        sof_marker,
        bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp]) + comps,
    )
    dht(0, 0, _DC_LUM)
    dht(1, 0, _AC_LUM)
    if not gray:
        dht(0, 1, _DC_CHR)
        dht(1, 1, _AC_CHR)
    return seg


def _write_dc(bw, dc_codes, diff):
    t = _mag_cat(diff)
    code, ln = dc_codes[t]
    bw.write(code, ln)
    if t:
        bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)


def _write_ac_band(bw, ac_codes, zz, lo, hi, emit_eob=True):
    """Run-length AC coding of zz[lo..hi].  Returns True when the band
    was terminated by EOB (trailing zeros), False when the last coded
    coefficient sits exactly at ``hi``."""
    nz = [k for k in range(lo, hi + 1) if zz[k]]
    run = 0
    last = nz[-1] if nz else lo - 1
    for k in range(lo, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]
            bw.write(code, ln)
            run -= 16
        s = _mag_cat(v)
        code, ln = ac_codes[(run << 4) | s]
        bw.write(code, ln)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last < hi:
        if emit_eob:
            code, ln = ac_codes[0x00]
            bw.write(code, ln)
        return True
    return False


class _AcRefiner:
    """Successive-approximation AC refinement encoder (T.81 G.1.2.2,
    the encoder dual of the decoder's G.1.2.3 branch; algorithm follows
    libjpeg jcphuff): each coefficient in [lo..hi] whose magnitude at
    precision ``al`` is 1 is NEWLY nonzero (emitted as a (run, 1)
    symbol + sign bit); magnitudes > 1 have history and contribute one
    buffered correction bit (bit ``al``); EOB runs span blocks with the
    correction bits accumulated behind the run (the convention the
    round-9 decoder fix pinned: EOBRUN counts the current block).
    Stateful so a restart boundary can ``flush`` the pending EOB run —
    T.81 forbids runs from crossing a restart interval."""

    def __init__(self, ac_codes, lo, hi, al):
        self.ac_codes = ac_codes
        self.lo, self.hi, self.al = lo, hi, al
        self.eobrun = 0
        self.be_bits: list[int] = []  # bits pending behind the EOB run

    def flush(self, bw) -> None:
        if self.eobrun > 0:
            nbits = self.eobrun.bit_length() - 1
            code, ln = self.ac_codes[nbits << 4]
            bw.write(code, ln)
            if nbits:
                bw.write(self.eobrun & ((1 << nbits) - 1), nbits)
            for bit in self.be_bits:
                bw.write(bit, 1)
            self.be_bits = []
            self.eobrun = 0

    def write_block(self, bw, zz) -> None:
        lo, hi, al = self.lo, self.hi, self.al
        absval = [abs(int(zz[k])) >> al for k in range(lo, hi + 1)]
        eob = -1  # index (into absval) of the last NEWLY-nonzero coef
        for idx, t in enumerate(absval):
            if t == 1:
                eob = idx
        r = 0
        br_bits: list[int] = []  # correction bits pending in this run
        for idx, t in enumerate(absval):
            if t == 0:
                r += 1
                continue
            # ZRLs only when another newly-nonzero coef still follows;
            # otherwise the run folds into the EOB.
            while r > 15 and idx <= eob:
                self.flush(bw)
                code, ln = self.ac_codes[0xF0]
                bw.write(code, ln)
                r -= 16
                for bit in br_bits:
                    bw.write(bit, 1)
                br_bits = []
            if t > 1:  # history coefficient: one correction bit
                br_bits.append(t & 1)
                continue
            self.flush(bw)
            code, ln = self.ac_codes[(r << 4) | 1]
            bw.write(code, ln)
            bw.write(0 if int(zz[lo + idx]) < 0 else 1, 1)
            for bit in br_bits:
                bw.write(bit, 1)
            br_bits = []
            r = 0
        if r > 0 or br_bits:
            self.eobrun += 1
            self.be_bits.extend(br_bits)
            if self.eobrun == 0x7FFF:  # T.81 EOBRUN category cap (EOB14)
                self.flush(bw)


def _emit_entropy(out, units, dri, write_unit, flush=None, reset=None):
    """Emit one scan's entropy data with restart markers every ``dri``
    units (0 = none): each restart interval gets its own byte-aligned
    bit stream, RSTn markers cycle D0..D7 between intervals (raw marker
    bytes, outside the stuffed entropy stream), ``flush(bw)`` drains
    run state that must not cross a restart (EOB runs), and ``reset()``
    restores cross-unit state (DC predictors) — mirroring exactly what
    the decoder's ``maybe_restart`` re-initializes."""
    bw = _BitWriter()
    rst = 0
    for i, u in enumerate(units):
        if dri and i and i % dri == 0:
            if flush:
                flush(bw)
            bw.align()
            out.extend(bw.buf)
            out.extend(bytes([0xFF, 0xD0 + (rst & 7)]))
            rst += 1
            bw = _BitWriter()
            if reset:
                reset()
        write_unit(bw, u)
    if flush:
        flush(bw)
    bw.align()
    out.extend(bw.buf)


def encode_jpeg_baseline(
    px: np.ndarray,
    quality: int = 90,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Sequential-baseline encoder: (H, W) / (H, W, 1) grayscale or
    (H, W, 3) RGB, encoded as YCbCr with ``subsample`` one of
    False/4:4:4, "420" (or True), "422", "411".  Standard Annex K
    tables scaled by
    ``quality``.  ``restart_interval`` > 0 emits a DRI segment and RSTn
    markers every that many MCUs (DC predictors reset per interval —
    the damaged-corpus resilience feature real encoders ship)."""
    h, w, gray, ql, qc, zz_planes, (hmax, vmax, mcux, mcuy) = _prepare_planes(
        px, quality, subsample
    )
    out = bytearray(b"\xff\xd8")
    seg = _write_headers(out, h, w, gray, ql, qc, subsample, 0xC0)
    if restart_interval:
        seg(0xDD, struct.pack(">H", restart_interval))
    if gray:
        seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    else:
        seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))

    dc_l, ac_l = _enc_codes(*_DC_LUM), _enc_codes(*_AC_LUM)
    dc_c, ac_c = _enc_codes(*_DC_CHR), _enc_codes(*_AC_CHR)
    pred = [0] * len(zz_planes)

    def write_mcu(bw, myx):
        my, mx = myx
        for ci, (zz, hs, vs) in enumerate(zz_planes):
            dcc = dc_l if ci == 0 else dc_c
            acc = ac_l if ci == 0 else ac_c
            for by in range(vs):
                for bx in range(hs):
                    b = zz[my * vs + by, mx * hs + bx]
                    _write_dc(bw, dcc, int(b[0]) - pred[ci])
                    _write_ac_band(bw, acc, b, 1, 63)
                    pred[ci] = int(b[0])

    def reset_pred():
        pred[:] = [0] * len(zz_planes)

    _emit_entropy(
        out,
        [(my, mx) for my in range(mcuy) for mx in range(mcux)],
        restart_interval,
        write_mcu,
        reset=reset_pred,
    )
    out.extend(b"\xff\xd9")
    return bytes(out)


def encode_jpeg_progressive(
    px: np.ndarray,
    quality: int = 90,
    subsample: bool = False,
    bands: tuple = ((1, 5), (6, 63)),
    successive: int = 0,
    restart_interval: int = 0,
) -> bytes:
    """Progressive (SOF2) encoder — spectral-selection script, with
    optional SUCCESSIVE APPROXIMATION: one interleaved DC scan, then
    per-component AC band scans (default two bands per component — the
    classic coarse-then-detail refinement).  With ``successive=N`` > 0
    the script sends every scan at point transform Al=N first, then N
    refinement passes (DC: one raw correction bit per block; AC: the
    T.81 G.1.2.2 correction-bit scans via ``_AcRefiner``) down to Al=0
    — a libjpeg-style scan-script family (uniform SA depth across
    bands; the decoder additionally handles per-band mixed-depth
    scripts, pinned by the hand-crafted streams).  ``restart_interval``
    > 0 emits RSTn markers every that many MCUs in the DC scans and
    every that many BLOCKS in the (non-interleaved) AC scans, with DC
    predictors and EOB runs flushed per interval (the decoder resets
    the same state in ``maybe_restart``).  Whatever the script, the
    stream carries the IDENTICAL quantized coefficients as
    ``encode_jpeg_baseline`` of the same image (shared
    ``_prepare_planes``), so a correct decoder must produce
    bit-identical pixels for every serialization — which is exactly
    what the differential fuzz in tests/test_jpeg.py pins."""
    if not 0 <= successive <= 10:
        raise ValueError("successive approximation depth out of range")
    h, w, gray, ql, qc, zz_planes, (hmax, vmax, mcux, mcuy) = _prepare_planes(
        px, quality, subsample
    )
    out = bytearray(b"\xff\xd8")
    seg = _write_headers(out, h, w, gray, ql, qc, subsample, 0xC2)
    if restart_interval:
        seg(0xDD, struct.pack(">H", restart_interval))

    dc_l, ac_l = _enc_codes(*_DC_LUM), _enc_codes(*_AC_LUM)
    dc_c, ac_c = _enc_codes(*_DC_CHR), _enc_codes(*_AC_CHR)
    ac_refine = None
    if successive:
        # Extra DHT (class 1, id 2) shared by every AC refinement scan.
        seg(
            0xC4,
            bytes([0x12])
            + bytes(_AC_PROG_REFINE[0])
            + _AC_PROG_REFINE[1],
        )
        ac_refine = _enc_codes(*_AC_PROG_REFINE)

    def dc_scan_header(ah, al):
        if gray:
            seg(0xDA, bytes([1, 1, 0x00, 0, 0, (ah << 4) | al]))
        else:
            seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 0,
                             (ah << 4) | al]))

    # DC scan units are MCUs (the decoder restarts per MCU when
    # interleaved; a gray frame's MCU is a single block, so the block
    # counter it uses for ns=1 scans coincides).
    mcus = []
    for my in range(mcuy):
        for mx in range(mcux):
            mcus.append(
                [
                    (ci, zz[my * vs + by, mx * hs + bx])
                    for ci, (zz, hs, vs) in enumerate(zz_planes)
                    for by in range(vs)
                    for bx in range(hs)
                ]
            )

    # Scan 1: interleaved DC first, ss=0 se=0 ah=0 al=successive
    # (DC point transform is an arithmetic shift, T.81 A.4).
    dc_scan_header(0, successive)
    pred = [0] * len(zz_planes)

    def write_dc_mcu(bw, mcu):
        for ci, b in mcu:
            v = int(b[0]) >> successive
            _write_dc(bw, dc_l if ci == 0 else dc_c, v - pred[ci])
            pred[ci] = v

    def reset_pred():
        pred[:] = [0] * len(zz_planes)

    _emit_entropy(out, mcus, restart_interval, write_dc_mcu,
                  reset=reset_pred)

    # DC refinement scans: one raw bit per block, no Huffman coding.
    for al in range(successive - 1, -1, -1):
        dc_scan_header(al + 1, al)

        def write_dc_refine(bw, mcu, _al=al):
            for _ci, b in mcu:
                bw.write((int(b[0]) >> _al) & 1, 1)

        _emit_entropy(out, mcus, restart_interval, write_dc_refine)

    # AC band scans: non-interleaved, raster over each component's OWN
    # block grid (T.81 A.2.2 — smaller than the MCU grid at the edges);
    # the restart unit is the BLOCK here.
    comp_ids = [1] if gray else [1, 2, 3]
    for ci, (zz, hs, vs) in enumerate(zz_planes):
        acc = ac_l if ci == 0 else ac_c
        cw = -(-(w * hs) // hmax)
        chh = -(-(h * vs) // vmax)
        nby, nbx = -(-chh // 8), -(-cw // 8)
        blocks = [zz[by, bx] for by in range(nby) for bx in range(nbx)]
        for lo, hi in bands:
            # First scan of the band at Al=successive: magnitudes
            # shifted by the point transform (truncation toward zero).
            seg(
                0xDA,
                bytes([1, comp_ids[ci], (0 << 4) | (0 if ci == 0 else 1),
                       lo, hi, successive]),
            )

            def write_ac_first(bw, b):
                if successive:
                    b = np.sign(b) * (np.abs(b) >> successive)
                _write_ac_band(bw, acc, b, lo, hi)

            _emit_entropy(out, blocks, restart_interval, write_ac_first)
            # Refinement scans of the band down to Al=0, coded with the
            # dedicated refinement table (Ta=2).
            for al in range(successive - 1, -1, -1):
                seg(
                    0xDA,
                    bytes([1, comp_ids[ci], (0 << 4) | 2,
                           lo, hi, ((al + 1) << 4) | al]),
                )
                refiner = _AcRefiner(ac_refine, lo, hi, al)
                _emit_entropy(
                    out, blocks, restart_interval, refiner.write_block,
                    flush=refiner.flush,
                )

    out.extend(b"\xff\xd9")
    return bytes(out)
