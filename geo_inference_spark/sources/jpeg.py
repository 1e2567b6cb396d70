"""Baseline JPEG (JFIF) codec — from scratch, numpy only.

VERDICT r4 #1: ``media_decode``'s JPEG path was an md5 stub — the
dominant web image format in a Common-Crawl-style corpus decoded fake.
This module implements the baseline-DCT subset of the public JPEG spec
(ITU-T T.81 / ISO 10918-1) directly, the same zero-dependency move as
the PNG/TIFF/zarr codecs:

* ``decode_jpeg`` — baseline sequential DCT (SOF0), Huffman entropy
  coding, 8-bit precision, 1 component (grayscale) or 3 components
  (YCbCr, any h/v sampling factors dividing the max — covers 4:4:4,
  4:2:2 and 4:2:0), restart markers, 0xFF00 byte stuffing, 8/16-bit
  DQT tables. -> (h, w) or (h, w, 3) uint8.
* ``encode_jpeg`` — uint8 gray/RGB -> interchange-format JFIF stream
  using the spec's Annex K quantization + Huffman tables (quality-
  scaled per the public IJG formula), optional 4:2:0 subsampling and
  restart intervals. Used by tests and the synthetic media forge.
* ``expected_decode`` — the ANALYTIC expectation of decoding an
  ``encode_jpeg`` output: quantize -> dequantize -> IDCT -> upsample
  -> color-convert computed purely in numpy, WITHOUT the marker /
  Huffman / bitstream layers. The driver's oracle VALUES come from
  here, so the correctness gate certifies the whole entropy-coding
  layer against independent math.

Unsupported (raise loudly): arithmetic coding, 12-bit precision,
>3 components. Progressive (SOF2) IS supported — both
``encode_jpeg_progressive`` and the decoder's ``_progressive_scan``
path (spectral selection + successive approximation).

Entropy decode is a per-symbol Python loop (inherently sequential);
everything after it — dequantize, de-zigzag, IDCT, upsample, color
convert — is vectorized over all blocks at once. At cluster scale the
per-image loop lives inside Arrow-batched mapInPandas partitions
(text/multimodal.py), so images decode executor-side in parallel.
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------- constants


def _zigzag() -> np.ndarray:
    """Raster index of each coefficient in zigzag scan order."""
    idx = []
    for s in range(15):
        rows = range(min(s, 7), max(0, s - 7) - 1, -1) if s % 2 == 0 \
            else range(max(0, s - 7), min(s, 7) + 1)
        idx.extend(r * 8 + (s - r) for r in rows)
    return np.array(idx, dtype=np.int64)


ZIGZAG = _zigzag()
_UNZIG = np.argsort(ZIGZAG)  # zigzag position of each raster index

# Annex K.1 quantization tables (raster order)
QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# Annex K.3 typical Huffman tables: (BITS[1..16], HUFFVAL)
DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
           list(range(12)))
DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
             list(range(12)))
AC_LUMA = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
])
AC_CHROMA = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
])

# structural self-check: an AC table must hold exactly EOB, ZRL and
# every (run 0-15, size 1-10) pair once — catches any transcription slip
for _bits, _vals in (AC_LUMA, AC_CHROMA):
    assert sum(_bits) == len(_vals) == 162
    assert set(_vals) == (
        {0x00, 0xF0} | {(r << 4) | s for r in range(16) for s in range(1, 11)}
    )
for _bits, _vals in (DC_LUMA, DC_CHROMA):
    assert sum(_bits) == len(_vals) == 12


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix M: F = M @ f @ M.T."""
    x = np.arange(8, dtype=np.float64)
    u = x[:, None]
    m = 0.5 * np.cos((2 * x[None, :] + 1) * u * np.pi / 16.0)
    m[0] /= np.sqrt(2.0)
    return m


_DCT = _dct_matrix()


def quality_scale(table: np.ndarray, quality: int) -> np.ndarray:
    """Annex-K table scaled by the public IJG quality formula."""
    q = min(100, max(1, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    return np.clip((table * scale + 50) // 100, 1, 255).astype(np.int64)


def _huff_sizes_codes(bits, vals):
    """Canonical (code, size) per symbol, per spec C.1-C.3."""
    sizes = []
    for ln in range(1, 17):
        sizes.extend([ln] * bits[ln - 1])
    codes, code, prev = [], 0, sizes[0] if sizes else 0
    for sz in sizes:
        code <<= sz - prev
        prev = sz
        codes.append(code)
        code += 1
    return {v: (c, s) for v, c, s in zip(vals, codes, sizes)}


def _huff_decode_tables(bits, vals):
    """Table-driven decode: a 2^16-entry LUT mapping the next 16 bits
    (code left-aligned) to (symbol, code length). One list lookup per
    symbol instead of the spec's per-bit DECODE walk — ~5x on the
    entropy loop, the dominant cost of decoding a crawl's images.
    Cached per (BITS, HUFFVAL) so the standard tables build once."""
    return _huff_lut(tuple(bits), tuple(vals))


from functools import lru_cache  # noqa: E402  (local helper import)


@lru_cache(maxsize=64)
def _huff_lut(bits: tuple, vals: tuple):
    sizes = []
    for ln in range(1, 17):
        sizes.extend([ln] * bits[ln - 1])
    lut_sym = np.full(1 << 16, -1, dtype=np.int32)
    lut_len = np.zeros(1 << 16, dtype=np.int32)
    code, prev = 0, sizes[0] if sizes else 0
    for v, sz in zip(vals, sizes):
        code <<= sz - prev
        prev = sz
        lo = code << (16 - sz)
        hi = (code + 1) << (16 - sz)
        lut_sym[lo:hi] = v
        lut_len[lo:hi] = sz
        code += 1
    # plain lists index faster than numpy scalars in the hot loop
    return lut_sym.tolist(), lut_len.tolist()


# ---------------------------------------------------------------- encoder


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value: int, nbits: int) -> None:
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.n += nbits
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing
                self.out.append(0x00)
        self.acc &= (1 << self.n) - 1

    def align(self) -> None:
        if self.n:
            self.put((1 << (8 - self.n)) - 1, 8 - self.n)  # pad with 1s


def _rgb_to_ycbcr(pix: np.ndarray) -> np.ndarray:
    p = pix.astype(np.float64)
    r, g, b = p[..., 0], p[..., 1], p[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168735892 * r - 0.331264108 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418687589 * g - 0.081312411 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _plane_blocks(plane: np.ndarray, bh: int, bw: int) -> np.ndarray:
    """Edge-pad ``plane`` to (bh*8, bw*8) and split into (bh*bw, 8, 8)
    row-major blocks."""
    h, w = plane.shape
    plane = np.pad(plane, ((0, bh * 8 - h), (0, bw * 8 - w)), mode="edge")
    return (
        plane.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )


def _quantize_blocks(blocks: np.ndarray, qt_raster: np.ndarray) -> np.ndarray:
    """(n, 8, 8) spatial blocks -> (n, 64) quantized coefficients in
    ZIGZAG order. Rounding = round-half-away (floor(x/q + .5) on the
    magnitude), mirrored exactly by expected_decode."""
    f = np.einsum("ux,nxy,vy->nuv", _DCT, blocks - 128.0, _DCT)
    q = qt_raster.reshape(8, 8).astype(np.float64)
    coef = np.sign(f) * np.floor(np.abs(f) / q + 0.5)
    return coef.reshape(-1, 64)[:, ZIGZAG].astype(np.int64)


def _subsampled_planes(pix: np.ndarray, subsample: str):
    """-> list of (plane, (h_factor, v_factor), is_chroma)."""
    if pix.ndim == 2:
        return [(pix.astype(np.float64), (1, 1), False)]
    ycc = _rgb_to_ycbcr(pix)
    y, cb, cr = ycc[..., 0], ycc[..., 1], ycc[..., 2]
    if subsample == "444":
        return [(y, (1, 1), False), (cb, (1, 1), True), (cr, (1, 1), True)]
    if subsample != "420":
        raise NotImplementedError(f"subsample {subsample!r}")
    h, w = y.shape
    he, we = h + (h & 1), w + (w & 1)

    def down(p):
        p = np.pad(p, ((0, he - h), (0, we - w)), mode="edge")
        return (
            p.reshape(he // 2, 2, we // 2, 2).mean(axis=(1, 3))
        )

    return [(y, (2, 2), False), (down(cb), (1, 1), True),
            (down(cr), (1, 1), True)]


def encode_jpeg(
    pix: np.ndarray,
    quality: int = 75,
    subsample: str = "420",
    restart_interval: int = 0,
) -> bytes:
    """uint8 (h, w) gray or (h, w, 3) RGB -> baseline JFIF bytes."""
    if pix.dtype != np.uint8 or pix.ndim not in (2, 3):
        raise ValueError("encode_jpeg wants uint8 (h,w) or (h,w,3)")
    h, w = pix.shape[:2]
    planes = _subsampled_planes(pix, subsample if pix.ndim == 3 else "444")
    ncomp = len(planes)
    hmax = max(p[1][0] for p in planes)
    vmax = max(p[1][1] for p in planes)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    qts = [quality_scale(QT_LUMA, quality),
           quality_scale(QT_CHROMA, quality)]

    # per component: quantized (blocks_y, blocks_x, 64) coefficient grid
    comp_coef = []
    for plane, (hi, vi), is_chroma in planes:
        bw, bh = mcus_x * hi, mcus_y * vi
        blocks = _plane_blocks(plane, bh, bw)
        coef = _quantize_blocks(blocks, qts[1 if is_chroma else 0])
        comp_coef.append(coef.reshape(bh, bw, 64))

    # entropy-coded segment
    enc_dc = [_huff_sizes_codes(*DC_LUMA), _huff_sizes_codes(*DC_CHROMA)]
    enc_ac = [_huff_sizes_codes(*AC_LUMA), _huff_sizes_codes(*AC_CHROMA)]
    bw_ = _BitWriter()
    pred = [0] * ncomp
    ecs = bytearray()
    rst = 0

    def emit_block(coef_zz, ci):
        t = 1 if ci else 0
        dc, ac = enc_dc[t], enc_ac[t]
        diff = int(coef_zz[0]) - pred[ci]
        pred[ci] = int(coef_zz[0])
        s = int(abs(diff)).bit_length()
        code, ln = dc[s]
        bw_.put(code, ln)
        if s:
            bw_.put(diff if diff >= 0 else diff + (1 << s) - 1, s)
        run = 0
        nz = np.nonzero(coef_zz[1:])[0]
        last = nz[-1] + 1 if nz.size else 0
        for k in range(1, last + 1):
            v = int(coef_zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = ac[0xF0]
                bw_.put(code, ln)
                run -= 16
            s = abs(v).bit_length()
            code, ln = ac[(run << 4) | s]
            bw_.put(code, ln)
            bw_.put(v if v >= 0 else v + (1 << s) - 1, s)
            run = 0
        if last < 63:
            code, ln = ac[0x00]
            bw_.put(code, ln)

    for m in range(mcus_y * mcus_x):
        if restart_interval and m and m % restart_interval == 0:
            bw_.align()
            ecs += bytes(bw_.out)
            bw_.out.clear()
            ecs += bytes([0xFF, 0xD0 + rst])
            rst = (rst + 1) % 8
            pred = [0] * ncomp
        my, mx = divmod(m, mcus_x)
        for ci, (_, (hi, vi), _c) in enumerate(planes):
            for by in range(vi):
                for bx in range(hi):
                    emit_block(
                        comp_coef[ci][my * vi + by, mx * hi + bx], ci
                    )
    bw_.align()
    ecs += bytes(bw_.out)

    # headers
    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HH", 1, 1) + b"\x00\x00"
    for tid, qt in enumerate(qts[:min(ncomp, 2)]):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid]) \
            + bytes(int(v) for v in qt[ZIGZAG])
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for ci, (_, (hi, vi), is_chroma) in enumerate(planes):
        out += bytes([ci + 1, (hi << 4) | vi, 1 if is_chroma else 0])
    tables = [(0x00, DC_LUMA), (0x10, AC_LUMA)]
    if ncomp == 3:
        tables += [(0x01, DC_CHROMA), (0x11, AC_CHROMA)]
    for tc, (bits, vals) in tables:
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals)) \
            + bytes([tc]) + bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for ci in range(ncomp):
        out += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    out += b"\x00\x3f\x00"
    out += ecs
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def encode_jpeg_progressive(
    pix: np.ndarray,
    quality: int = 75,
    subsample: str = "420",
    restart_interval: int = 0,
) -> bytes:
    """uint8 gray/RGB -> progressive (SOF2) JFIF bytes.

    Scan script (spec G.1 successive approximation + spectral
    selection, all within the standard Annex-K Huffman tables — EOB
    runs are kept at 1 so only EOB0/ZRL symbols are needed):

      1. DC, all components interleaved, Al=1
      2. per component: AC band 1..5,  Al=1   (low frequencies first)
      3. per component: AC band 6..63, Al=1
      4. DC refinement (Al=0, raw bits)
      5. per component: AC band 1..5  refinement (Al=0)
      6. per component: AC band 6..63 refinement (Al=0)

    The decoded result is BIT-IDENTICAL to decoding the baseline
    encoding at the same quality/subsampling (same quantized
    coefficients, different entropy transport) — pinned by tests.
    """
    if pix.dtype != np.uint8 or pix.ndim not in (2, 3):
        raise ValueError("encode_jpeg_progressive wants uint8 (h,w)[,3]")
    h, w = pix.shape[:2]
    planes = _subsampled_planes(pix, subsample if pix.ndim == 3 else "444")
    ncomp = len(planes)
    hmax = max(p[1][0] for p in planes)
    vmax = max(p[1][1] for p in planes)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    qts = [quality_scale(QT_LUMA, quality),
           quality_scale(QT_CHROMA, quality)]
    comp_coef = []
    used_dims = []
    for plane, (hi, vi), is_chroma in planes:
        bw, bh = mcus_x * hi, mcus_y * vi
        blocks = _plane_blocks(plane, bh, bw)
        coef = _quantize_blocks(blocks, qts[1 if is_chroma else 0])
        comp_coef.append(coef.reshape(bh, bw, 64))
        used_dims.append(_comp_used_blocks(h, w, hi, vi, hmax, vmax))

    enc_dc = [_huff_sizes_codes(*DC_LUMA), _huff_sizes_codes(*DC_CHROMA)]
    enc_ac = [_huff_sizes_codes(*AC_LUMA), _huff_sizes_codes(*AC_CHROMA)]
    ri = int(restart_interval)

    def _maybe_restart(bw_, ecs, unit, rst, on_reset):
        """Every ri units: byte-align, flush, emit RSTn, reset state.
        Restart units are MCUs for the interleaved DC scan and blocks
        for the non-interleaved AC scans (spec G.1.4 via A.2.4)."""
        if ri and unit and unit % ri == 0:
            bw_.align()
            ecs += bytes(bw_.out)
            bw_.out.clear()
            ecs += bytes([0xFF, 0xD0 + rst[0]])
            rst[0] = (rst[0] + 1) % 8
            on_reset()

    def dc_scan(al, refine):
        bw_ = _BitWriter()
        ecs = bytearray()
        rst = [0]
        pred = [0] * ncomp
        for m in range(mcus_y * mcus_x):
            def _reset():
                pred[:] = [0] * ncomp
            _maybe_restart(bw_, ecs, m, rst, _reset)
            my, mx = divmod(m, mcus_x)
            for ci, (_, (hi, vi), _c) in enumerate(planes):
                t = 1 if ci else 0
                for by in range(vi):
                    for bx in range(hi):
                        dc = int(comp_coef[ci][my * vi + by, mx * hi + bx, 0])
                        if refine:
                            bw_.put((dc >> al) & 1, 1)
                            continue
                        v = dc >> al  # arithmetic shift (spec G.1.2.1)
                        diff = v - pred[ci]
                        pred[ci] = v
                        s = int(abs(diff)).bit_length()
                        code, ln = enc_dc[t][s]
                        bw_.put(code, ln)
                        if s:
                            bw_.put(
                                diff if diff >= 0 else diff + (1 << s) - 1, s
                            )
        bw_.align()
        ecs += bytes(bw_.out)
        return bytes(ecs)

    def ac_first_scan(ci, ss, se, al):
        t = 1 if ci else 0
        ac = enc_ac[t]
        bw_ = _BitWriter()
        ecs = bytearray()
        rst = [0]
        brows, bcols = used_dims[ci]
        grid = comp_coef[ci]
        for i in range(brows * bcols):
            _maybe_restart(bw_, ecs, i, rst, lambda: None)
            by, bx = divmod(i, bcols)
            blk = grid[by, bx]
            r = 0
            for k in range(ss, se + 1):
                c = int(blk[k])
                t_ = abs(c) >> al  # point transform: magnitude shift
                v = t_ if c > 0 else -t_
                if v == 0:
                    r += 1
                    continue
                while r > 15:
                    code, ln = ac[0xF0]
                    bw_.put(code, ln)
                    r -= 16
                s = abs(v).bit_length()
                code, ln = ac[(r << 4) | s]
                bw_.put(code, ln)
                bw_.put(v if v >= 0 else v + (1 << s) - 1, s)
                r = 0
            if r > 0:
                code, ln = ac[0x00]  # EOB (run length 1)
                bw_.put(code, ln)
        bw_.align()
        ecs += bytes(bw_.out)
        return bytes(ecs)

    def ac_refine_scan(ci, ss, se, al):
        """Positional simulation of the decoder's refinement walk
        (G.2 / libjpeg encode_mcu_AC_refine): corrections for
        nonzero-history coefficients are emitted exactly where the
        decoder's walk reads them."""
        t = 1 if ci else 0
        ac = enc_ac[t]
        ah = al + 1
        bw_ = _BitWriter()
        ecs = bytearray()
        rst = [0]
        brows, bcols = used_dims[ci]
        grid = comp_coef[ci]
        for i in range(brows * bcols):
            _maybe_restart(bw_, ecs, i, rst, lambda: None)
            by, bx = divmod(i, bcols)
            blk = grid[by, bx]
            hist = [(abs(int(blk[k])) >> ah) != 0 for k in range(64)]
            mag = [abs(int(blk[k])) >> al for k in range(64)]
            pos = ss
            while True:
                # next newly-nonzero >= pos, counting zero-history run
                j, r, sp = None, 0, pos
                while sp <= se:
                    if not hist[sp] and mag[sp] != 0:
                        j = sp
                        break
                    if not hist[sp]:
                        r += 1
                    sp += 1
                if j is None:
                    break
                while r > 15:
                    code, ln = ac[0xF0]
                    bw_.put(code, ln)
                    consumed = 0
                    while consumed < 16:
                        if hist[pos]:
                            bw_.put((mag[pos] >> 0) & 1, 1)
                        else:
                            consumed += 1
                        pos += 1
                    r -= 16
                code, ln = ac[(r << 4) | 1]
                bw_.put(code, ln)
                bw_.put(1 if int(blk[j]) > 0 else 0, 1)
                while pos <= j:
                    if hist[pos] and pos != j:
                        bw_.put(mag[pos] & 1, 1)
                    pos += 1
            if pos <= se:
                code, ln = ac[0x00]  # EOB, run 1
                bw_.put(code, ln)
                for k in range(pos, se + 1):
                    if hist[k]:
                        bw_.put(mag[k] & 1, 1)
        bw_.align()
        ecs += bytes(bw_.out)
        return bytes(ecs)

    # headers
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HH", 1, 1) + b"\x00\x00"
    for tid, qt in enumerate(qts[:min(ncomp, 2)]):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid]) \
            + bytes(int(v) for v in qt[ZIGZAG])
    out += b"\xff\xc2" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for ci, (_, (hi, vi), is_chroma) in enumerate(planes):
        out += bytes([ci + 1, (hi << 4) | vi, 1 if is_chroma else 0])
    tables = [(0x00, DC_LUMA), (0x10, AC_LUMA)]
    if ncomp == 3:
        tables += [(0x01, DC_CHROMA), (0x11, AC_CHROMA)]
    for tc, (bits, vals) in tables:
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals)) \
            + bytes([tc]) + bytes(bits) + bytes(vals)
    if ri:
        out += b"\xff\xdd" + struct.pack(">HH", 4, ri)

    def sos(comp_specs, ss, se, ah, al, ecs):
        ns = len(comp_specs)
        seg = bytearray(b"\xff\xda" + struct.pack(">HB", 6 + 2 * ns, ns))
        for cid, tdta in comp_specs:
            seg += bytes([cid, tdta])
        seg += bytes([ss, se, (ah << 4) | al])
        return bytes(seg) + ecs

    all_dc = [(ci + 1, ((1 if ci else 0) << 4) | 0) for ci in range(ncomp)]
    out += sos(all_dc, 0, 0, 0, 1, dc_scan(1, refine=False))
    for ci in range(ncomp):
        spec = [(ci + 1, 1 if ci else 0)]
        out += sos(spec, 1, 5, 0, 1, ac_first_scan(ci, 1, 5, 1))
    for ci in range(ncomp):
        spec = [(ci + 1, 1 if ci else 0)]
        out += sos(spec, 6, 63, 0, 1, ac_first_scan(ci, 6, 63, 1))
    out += sos(all_dc, 0, 0, 1, 0, dc_scan(0, refine=True))
    for ci in range(ncomp):
        spec = [(ci + 1, 1 if ci else 0)]
        out += sos(spec, 1, 5, 1, 0, ac_refine_scan(ci, 1, 5, 0))
    for ci in range(ncomp):
        spec = [(ci + 1, 1 if ci else 0)]
        out += sos(spec, 6, 63, 1, 0, ac_refine_scan(ci, 6, 63, 0))
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------- decoder


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment; handles
    0xFF00 stuffing and stops at any real marker."""

    __slots__ = ("data", "pos", "acc", "n", "marker")

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0
        self.marker = None

    def _fill(self) -> None:
        d = self.data
        while self.n <= 24:
            if self.marker is not None:
                self.acc = (self.acc << 8) | 0  # pad past marker
                self.n += 8
                continue
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1]
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:  # RST consumed by caller
                    self.marker = nxt
                    continue
                else:
                    self.marker = nxt
                    continue
            else:
                self.pos += 1
            self.acc = (self.acc << 8) | b
            self.n += 8
        # keep acc a machine-word int: without this mask it accretes
        # every byte ever read into one ever-growing bignum, making
        # each shift O(bytes so far) — quadratic on megabyte images
        # and an effective hang on corrupt zero-padded tails
        self.acc &= (1 << self.n) - 1

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        if k == 0:
            return 0
        if k > 16:
            # no valid JPEG symbol receives more than 16 bits (DC
            # category <= 15, AC size <= 10, EOBRUN length <= 14); a
            # corrupt DHT can define symbols up to 255, and _fill
            # tops out near 32 buffered bits — so this would spin
            raise ValueError(f"corrupt JPEG: {k}-bit receive")
        while self.n < k:
            self._fill()
        self.n -= k
        v = (self.acc >> self.n) & ((1 << k) - 1)
        return v

    def restart(self) -> None:
        """Consume an expected RSTn and realign."""
        self.acc = 0
        self.n = 0
        d = self.data
        # self.pos sits just before the marker bytes (marker was seen
        # during fill) or directly on them
        if self.marker is None:
            while d[self.pos] != 0xFF or not (0xD0 <= d[self.pos + 1] <= 0xD7):
                self.pos += 1
        self.pos += 2
        self.marker = None


def _decode_huff(br: _BitReader, tbl) -> int:
    lut_sym, lut_len = tbl
    if br.n < 16:
        br._fill()  # fills to > 24 bits (zero-padded past markers)
    idx = (br.acc >> (br.n - 16)) & 0xFFFF
    ln = lut_len[idx]
    if ln == 0:
        raise ValueError("corrupt JPEG: invalid huffman code")
    br.n -= ln
    return lut_sym[idx]


def _extend(v: int, s: int) -> int:
    return v - (1 << s) + 1 if s and v < (1 << (s - 1)) else v


def _comp_used_blocks(h, w, hi, vi, hmax, vmax):
    """Block rows/cols actually CODED for a component in a
    non-interleaved scan (spec A.2.2): ceil of the component's true
    sample dims over 8 — smaller than the MCU-padded grid."""
    cw = -(-(w * hi) // hmax)
    ch = -(-(h * vi) // vmax)
    return -(-ch // 8), -(-cw // 8)


def _next_marker(data: bytes, pos: int) -> int:
    """Position of the next real marker at/after ``pos`` (skips
    stuffed 0xFF00 and RSTn)."""
    n = len(data)
    while pos < n - 1:
        if data[pos] == 0xFF and data[pos + 1] != 0x00:
            if 0xD0 <= data[pos + 1] <= 0xD7:
                pos += 2
                continue
            return pos
        pos += 1
    return n


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline (SOF0/1) or progressive (SOF2) JFIF bytes ->
    (h, w) or (h, w, 3) uint8 pixels."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], tuple] = {}
    frame = None
    progressive = False
    restart_interval = 0
    coef = None  # progressive: per-component coefficient grids
    n = len(data)
    while pos < n:
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        seg_len = struct.unpack(">H", data[pos:pos + 2])[0]
        if seg_len < 2:
            # a 0/1 length can't even cover its own length field, and
            # pos += seg_len would spin on the same marker forever
            raise ValueError("corrupt JPEG: segment length < 2")
        seg = data[pos + 2:pos + seg_len]
        if marker == 0xDB:  # DQT (possibly several tables)
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                p += 1
                if pq:
                    vals = np.frombuffer(
                        seg[p:p + 128], dtype=">u2"
                    ).astype(np.int64)
                    p += 128
                else:
                    vals = np.frombuffer(
                        seg[p:p + 64], dtype=np.uint8
                    ).astype(np.int64)
                    p += 64
                raster = np.empty(64, dtype=np.int64)
                raster[ZIGZAG] = vals  # stored in zigzag order
                qt[tq] = raster
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 prog
            progressive = marker == 0xC2
            prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise NotImplementedError("only 8-bit precision")
            if nc not in (1, 3):
                raise NotImplementedError(f"{nc} components")
            comps = []
            for i in range(nc):
                cid, hv, tq_ = seg[6 + 3 * i:9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0xF, tq_))
            frame = (h, w, comps)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"unsupported JPEG (SOF marker 0x{marker:02x}; "
                "lossless/arithmetic/hierarchical not supported)"
            )
        elif marker == 0xC4:  # DHT (possibly several tables)
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1:p + 17])
                nv = sum(bits)
                vals = list(seg[p + 17:p + 17 + nv])
                huff[(tc, th)] = _huff_decode_tables(bits, vals)
                p += 17 + nv
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tdta = seg[1 + 2 * i:3 + 2 * i]
                scan.append((cs, tdta >> 4, tdta & 0xF))
            h, w, comps = frame
            # corrupt-dimension guard: no real entropy coding spends
            # fewer than ~6 bits per block (DC category + EOB), so a
            # frame whose block count exceeds 4x the payload bytes is
            # lying about its size — reject instead of looping over
            # phantom MCUs (a bit-flipped SOF once claimed a 5 GB
            # image inside a 2 KB payload; the fuzz test pins this)
            hmax_ = max(c[1] for c in comps)
            vmax_ = max(c[2] for c in comps)
            if hmax_ == 0 or vmax_ == 0 or any(
                c[1] == 0 or c[2] == 0 for c in comps
            ):
                raise ValueError("corrupt JPEG: zero sampling factor")
            n_blocks = (
                (-(-w // (8 * hmax_))) * (-(-h // (8 * vmax_)))
                * sum(c[1] * c[2] for c in comps)
            )
            if n_blocks > 4 * len(data):
                raise ValueError(
                    "corrupt JPEG: frame dimensions exceed payload "
                    f"capacity ({n_blocks} blocks, {len(data)} bytes)"
                )
            if not progressive:
                return _decode_scan(
                    data, pos + seg_len, h, w, comps, scan, qt, huff,
                    restart_interval,
                )
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0xF
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            mcus_x = -(-w // (8 * hmax))
            mcus_y = -(-h // (8 * vmax))
            if coef is None:
                coef = {
                    c[0]: np.zeros(
                        (mcus_y * c[2], mcus_x * c[1], 64), dtype=np.int64
                    )
                    for c in comps
                }
            pos = _progressive_scan(
                data, pos + seg_len, h, w, comps, scan, huff, coef,
                ss, se, ah, al, restart_interval,
            )
            continue
        pos += seg_len
    if progressive and coef is not None:
        h, w, comps = frame
        hmax = max(c[1] for c in comps)
        vmax = max(c[2] for c in comps)
        return _reconstruct(
            h, w, comps, [coef[c[0]] for c in comps], qt, hmax, vmax
        )
    raise ValueError("no SOS marker found")


def _progressive_scan(
    data, pos, h, w, comps, scan, huff, coef, ss, se, ah, al,
    restart_interval,
):
    """Decode one progressive scan's ECS into the coefficient grids;
    returns the position of the next marker after the ECS.
    Implements spec G.2: DC first/refine (interleaved or not), AC
    first with EOB runs, AC refine with correction bits."""
    by_id = {c[0]: c for c in comps}
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    br = _BitReader(data, pos)
    p1, m1 = 1 << al, -1 << al

    if ss == 0:  # DC scan
        if se != 0:
            raise ValueError("corrupt scan header: DC scan with Se != 0")
        if len(scan) > 1:  # interleaved MCU order over padded grids
            pred = [0] * len(scan)
            for m in range(mcus_y * mcus_x):
                if restart_interval and m and m % restart_interval == 0:
                    br.restart()
                    pred = [0] * len(scan)
                my, mx = divmod(m, mcus_x)
                for ci, (cs, td, _ta) in enumerate(scan):
                    _, hi, vi, _ = by_id[cs]
                    grid = coef[cs]
                    for by in range(vi):
                        for bx in range(hi):
                            blk = grid[my * vi + by, mx * hi + bx]
                            if ah == 0:
                                s = _decode_huff(br, huff[(0, td)])
                                pred[ci] += _extend(br.bits(s), s)
                                blk[0] = pred[ci] << al
                            elif br.bit():
                                blk[0] |= p1
        else:
            cs, td, _ta = scan[0]
            _, hi, vi, _ = by_id[cs]
            brows, bcols = _comp_used_blocks(h, w, hi, vi, hmax, vmax)
            grid = coef[cs]
            pred = 0
            for i in range(brows * bcols):
                if restart_interval and i and i % restart_interval == 0:
                    br.restart()
                    pred = 0
                by, bx = divmod(i, bcols)
                blk = grid[by, bx]
                if ah == 0:
                    s = _decode_huff(br, huff[(0, td)])
                    pred += _extend(br.bits(s), s)
                    blk[0] = pred << al
                elif br.bit():
                    blk[0] |= p1
        return _next_marker(data, br.pos)

    # AC scan: single component, block raster order over USED dims
    if len(scan) != 1:
        raise ValueError("corrupt scan header: interleaved AC scan")
    cs, _td, ta = scan[0]
    _, hi, vi, _ = by_id[cs]
    ac_t = huff[(1, ta)]
    brows, bcols = _comp_used_blocks(h, w, hi, vi, hmax, vmax)
    grid = coef[cs]
    eobrun = 0
    for i in range(brows * bcols):
        if restart_interval and i and i % restart_interval == 0:
            br.restart()
            eobrun = 0
        by, bx = divmod(i, bcols)
        blk = grid[by, bx]
        if ah == 0:  # first scan for this band
            if eobrun:
                eobrun -= 1
                continue
            k = ss
            while k <= se:
                rs = _decode_huff(br, ac_t)
                r, s = rs >> 4, rs & 0xF
                if s == 0:
                    if r == 15:  # ZRL
                        k += 16
                        continue
                    eobrun = (1 << r) - 1
                    if r:
                        eobrun += br.bits(r)
                    break
                k += r
                blk[k] = _extend(br.bits(s), s) << al
                k += 1
        else:  # refinement scan (libjpeg decode_mcu_AC_refine shape)
            k = ss
            if eobrun == 0:
                while k <= se:
                    rs = _decode_huff(br, ac_t)
                    r, s = rs >> 4, rs & 0xF
                    if s == 0:
                        if r != 15:
                            eobrun = 1 << r
                            if r:
                                eobrun += br.bits(r)
                            break
                        # r == 15: skip 16 zero-history coefficients
                        val = 0
                    else:  # s == 1: a newly nonzero coefficient
                        val = p1 if br.bit() else m1
                    while k <= se:
                        c = int(blk[k])
                        if c != 0:
                            if br.bit() and (c & p1) == 0:
                                blk[k] = c + (p1 if c > 0 else m1)
                        else:
                            r -= 1
                            if r < 0:
                                break
                        k += 1
                    if val and k <= se:
                        blk[k] = val
                    k += 1
            if eobrun > 0:
                while k <= se:
                    c = int(blk[k])
                    if c != 0 and br.bit() and (c & p1) == 0:
                        blk[k] = c + (p1 if c > 0 else m1)
                    k += 1
                eobrun -= 1
    return _next_marker(data, br.pos)


def _decode_scan(data, pos, h, w, comps, scan, qt, huff, restart_interval):
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    by_id = {c[0]: c for c in comps}
    order = []  # (comp_index, dc_tbl, ac_tbl, hi, vi)
    coef = []
    for ci, (cs, td, ta) in enumerate(scan):
        _, hi, vi, _ = by_id[cs]
        order.append((ci, huff[(0, td)], huff[(1, ta)], hi, vi))
        coef.append(
            np.zeros((mcus_y * vi, mcus_x * hi, 64), dtype=np.int64)
        )
    br = _BitReader(data, pos)
    pred = [0] * len(scan)
    zz = np.zeros(64, dtype=np.int64)
    for m in range(mcus_y * mcus_x):
        if restart_interval and m and m % restart_interval == 0:
            br.restart()
            pred = [0] * len(scan)
        my, mx = divmod(m, mcus_x)
        for ci, dc_t, ac_t, hi, vi in order:
            grid = coef[ci]
            for by in range(vi):
                for bx in range(hi):
                    zz[:] = 0
                    s = _decode_huff(br, dc_t)
                    diff = _extend(br.bits(s), s)
                    pred[ci] += diff
                    zz[0] = pred[ci]
                    k = 1
                    while k < 64:
                        rs = _decode_huff(br, ac_t)
                        r, s = rs >> 4, rs & 0xF
                        if s == 0:
                            if r == 15:  # ZRL
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        zz[k] = _extend(br.bits(s), s)
                        k += 1
                    grid[my * vi + by, mx * hi + bx] = zz
    ordered = [by_id[cs] for cs, _td, _ta in scan]
    return _reconstruct(h, w, ordered, coef, qt, hmax, vmax)


def _reconstruct(h, w, comps, grids, qt, hmax, vmax):
    """Coefficient grids -> pixels: dequantize + IDCT vectorized over
    all blocks per component, replicate-upsample, crop, color-convert.
    ``comps`` = [(cid, hi, vi, tq)] aligned with ``grids``."""
    planes = []
    for (cid, hi, vi, tq_), c in zip(comps, grids):
        q = qt[tq_][ZIGZAG]  # zigzag-ordered dequant vector
        bh, bw_ = c.shape[:2]
        dq = (c * q).reshape(-1, 64)[:, _UNZIG].reshape(-1, 8, 8)
        px = np.einsum("xu,nuv,yv->nxy", _DCT.T, dq.astype(np.float64),
                       _DCT.T)
        px = np.clip(np.floor(px + 128.0 + 0.5), 0, 255).astype(np.uint8)
        plane = (
            px.reshape(bh, bw_, 8, 8).transpose(0, 2, 1, 3)
            .reshape(bh * 8, bw_ * 8)
        )
        # upsample by replication to full resolution, then crop
        plane = np.repeat(np.repeat(plane, vmax // vi, axis=0),
                          hmax // hi, axis=1)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        return planes[0]
    return ycbcr_to_rgb(planes[0], planes[1], planes[2])


def ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    yf = y.astype(np.float64)
    cbf = cb.astype(np.float64) - 128.0
    crf = cr.astype(np.float64) - 128.0
    r = yf + 1.402 * crf
    g = yf - 0.344136286 * cbf - 0.714136286 * crf
    b = yf + 1.772 * cbf
    out = np.stack([r, g, b], axis=-1)
    return np.clip(np.floor(out + 0.5), 0, 255).astype(np.uint8)


def jpeg_stream_end(data: bytes, start: int = 0) -> int:
    """Position just past the EOI of the JPEG stream starting at
    ``start`` — an exact structural walk (segment lengths + entropy
    scans skipped via marker search), so concatenated-JPEG (MJPEG
    style) containers split without false positives on embedded
    SOI-looking bytes."""
    if data[start:start + 2] != b"\xff\xd8":
        raise ValueError("not a JPEG at offset")
    pos = start + 2
    n = len(data)
    while pos < n - 1:
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            return pos
        seg_len = struct.unpack(">H", data[pos:pos + 2])[0]
        if seg_len < 2:
            raise ValueError("corrupt JPEG: segment length < 2")
        if marker == 0xDA:  # entropy data follows the SOS header
            pos = _next_marker(data, pos + seg_len)
        else:
            pos += seg_len
    raise ValueError("truncated JPEG: no EOI")


def split_jpeg_frames(b: bytes) -> list[bytes]:
    """Split a concatenated-JPEG container into complete frames."""
    frames = []
    pos = 0
    while pos < len(b) - 1 and b[pos:pos + 3] == b"\xff\xd8\xff":
        end = jpeg_stream_end(b, pos)
        frames.append(b[pos:end])
        pos = end
    return frames


# ------------------------------------------------------- analytic oracle


def expected_decode(
    pix: np.ndarray,
    quality: int = 75,
    subsample: str = "420",
) -> np.ndarray:
    """What decode_jpeg(encode_jpeg(pix, ...)) must return, computed
    WITHOUT the marker/Huffman/bitstream layers: quantize ->
    dequantize -> IDCT -> replicate-upsample -> color-convert. Shares
    only the pure DCT/quantization math with the ENCODER — nothing
    with the decoder's entropy path — so equality certifies that
    layer end-to-end."""
    h, w = pix.shape[:2]
    planes = _subsampled_planes(pix, subsample if pix.ndim == 3 else "444")
    hmax = max(p[1][0] for p in planes)
    vmax = max(p[1][1] for p in planes)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    qts = [quality_scale(QT_LUMA, quality),
           quality_scale(QT_CHROMA, quality)]
    out_planes = []
    for plane, (hi, vi), is_chroma in planes:
        bw, bh = mcus_x * hi, mcus_y * vi
        blocks = _plane_blocks(plane, bh, bw)
        coef = _quantize_blocks(blocks, qts[1 if is_chroma else 0])
        q = qts[1 if is_chroma else 0][ZIGZAG]
        dq = (coef * q)[:, _UNZIG].reshape(-1, 8, 8)
        px = np.einsum("xu,nuv,yv->nxy", _DCT.T, dq.astype(np.float64),
                       _DCT.T)
        px = np.clip(np.floor(px + 128.0 + 0.5), 0, 255).astype(np.uint8)
        p = (
            px.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3)
            .reshape(bh * 8, bw * 8)
        )
        p = np.repeat(np.repeat(p, vmax // vi, axis=0), hmax // hi, axis=1)
        out_planes.append(p[:h, :w])
    if len(out_planes) == 1:
        return out_planes[0]
    return ycbcr_to_rgb(*out_planes)
