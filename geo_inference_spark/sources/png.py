"""Minimal PNG codec — from scratch, stdlib zlib/struct only.

The multimodal decode stage (text/multimodal.py) needs a real image
codec; the container has no Pillow, so the subset of the public PNG
spec (RFC 2083 / W3C PNG) the engine needs is implemented directly —
the same zero-dependency move as the TIFF and zarr codecs:

* ``decode_png`` — 8-bit depth, color types 0 (gray), 2 (RGB),
  3 (palette), 4 (gray+alpha), 6 (RGBA); all five row filters
  (None/Sub/Up/Average/Paeth); non-interlaced. -> (h, w, c) uint8.
* ``encode_png`` — (h, w, c) uint8 -> non-interlaced PNG with
  filter-0 rows (valid input for any reader; used by tests and the
  synthetic media generator).

Unsupported features (16-bit, interlace) raise loudly.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _paeth_vec(a, b, c):
    """Vectorized Paeth predictor (same tie-break order as _paeth)."""
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def _unfilter_serial_run(rowdata, filters, prevrow):
    """Unfilter a run of Average/Paeth rows on anti-diagonal wavefronts.

    The recurrence cur[y,x] = row[y,x] + pred(cur[y,x-1], cur[y-1,x],
    cur[y-1,x-1]) is serial per pixel, but every cell on the anti-
    diagonal y + x = d depends only on diagonals < d — so a (R, W)
    run decodes in R + W - 1 vectorized steps instead of R * W * c
    interpreter iterations (VERDICT r3 #4: filter-3/4 rows are the hot
    path of media_decode on real-world PNGs).

    rowdata: (R, W, c) int32 filtered bytes; filters: (R,) in {3, 4};
    prevrow: (W, c) int32 decoded row above the run (zeros at y=0).
    Returns the (R, W, c) decoded run.
    """
    R, W, c = rowdata.shape
    # pad: row 0 = the row above the run, col 0 = the virtual left
    # pixel (zeros, per spec); cur[0, 0] = 0 is the run-top upleft
    cur = np.zeros((R + 1, W + 1, c), np.int32)
    cur[0, 1:] = prevrow
    is_avg = (filters == 3)[:, None]
    for d in range(R + W - 1):
        ys = np.arange(max(0, d - W + 1), min(R, d + 1))
        xs = d - ys
        yi, xi = ys + 1, xs + 1
        a = cur[yi, xi - 1]  # left
        b = cur[yi - 1, xi]  # up
        cc = cur[yi - 1, xi - 1]  # upleft
        pred = np.where(
            is_avg[ys], (a + b) >> 1, _paeth_vec(a, b, cc)
        )
        cur[yi, xi] = (rowdata[ys, xs] + pred) & 0xFF
    return cur[1:, 1:]


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> (h, w, channels) uint8 (palette expanded to RGB)."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG file")
    pos = 8
    idat = bytearray()
    w = h = depth = ctype = interlace = None
    plte = None
    while pos + 8 <= len(data):
        (ln,) = struct.unpack_from(">I", data, pos)
        typ = data[pos + 4 : pos + 8]
        chunk = data[pos + 8 : pos + 8 + ln]
        if typ == b"IHDR":
            w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", chunk
            )
        elif typ == b"PLTE":
            plte = np.frombuffer(chunk, np.uint8).reshape(-1, 3)
        elif typ == b"IDAT":
            idat += chunk
        elif typ == b"IEND":
            break
        pos += 12 + ln
    if w is None:
        raise ValueError("PNG missing IHDR")
    if depth != 8:
        raise ValueError(f"only 8-bit PNG supported (got depth {depth})")
    if interlace:
        raise ValueError("interlaced PNG not supported")
    if ctype not in _CHANNELS:
        raise ValueError(f"PNG color type {ctype} not supported")
    c = _CHANNELS[ctype]
    stride = w * c
    raw = zlib.decompress(bytes(idat))
    if len(raw) < h * (stride + 1):
        raise ValueError("truncated PNG pixel data")
    arr = (
        np.frombuffer(raw, np.uint8, h * (stride + 1))
        .reshape(h, stride + 1)
        .astype(np.int32)
    )
    filters = arr[:, 0]
    if not np.isin(filters, (0, 1, 2, 3, 4)).all():
        bad = int(filters[~np.isin(filters, (0, 1, 2, 3, 4))][0])
        raise ValueError(f"bad PNG filter {bad}")
    rows = arr[:, 1:]
    out = np.zeros((h, stride), np.uint8)
    prev = np.zeros(stride, np.int32)
    y = 0
    while y < h:
        f = filters[y]
        if f >= 3:  # Average/Paeth: wavefront-decode the whole run
            y1 = y
            while y1 < h and filters[y1] >= 3:
                y1 += 1
            run = _unfilter_serial_run(
                rows[y:y1].reshape(y1 - y, w, c),
                filters[y:y1],
                prev.reshape(w, c),
            )
            out[y:y1] = run.reshape(y1 - y, stride).astype(np.uint8)
            prev = run[-1].reshape(stride).copy()
            y = y1
            continue
        row = rows[y]
        if f == 0:
            cur = row
        elif f == 1:  # Sub: per byte-lane cumsum over pixels
            cur = np.cumsum(
                row.reshape(w, c), axis=0, dtype=np.int64
            ).astype(np.int32).reshape(stride) & 0xFF
        else:  # f == 2, Up
            cur = (row + prev) & 0xFF
        out[y] = cur.astype(np.uint8)
        prev = cur
        y += 1
    pix = out.reshape(h, w, c)
    if ctype == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        pix = plte[pix[:, :, 0]]
    return pix


def encode_png(arr: np.ndarray, row_filters=None) -> bytes:
    """(h, w) or (h, w, c) uint8 -> non-interlaced PNG bytes.

    row_filters: None (all filter-0 rows), a single filter id 0-4, or
    a per-row sequence — real-world encoders pick filters adaptively,
    so tests forge mixed-filter files to exercise the decoder's
    Sub/Up/Average/Paeth paths. Filtering (unlike unfiltering) has no
    recurrence: left/up/upleft are raw-pixel shifts, one numpy
    expression per row.
    """
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, c = a.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    if row_filters is None:
        fs = np.zeros(h, np.uint8)
    else:
        fs = np.broadcast_to(
            np.asarray(row_filters, np.uint8), (h,)
        ).copy()
    if not np.isin(fs, (0, 1, 2, 3, 4)).all():
        raise ValueError("PNG row filter must be 0-4")

    pix = a.astype(np.int32)
    parts = []
    for y in range(h):
        f = int(fs[y])
        cur = pix[y]
        left = np.zeros_like(cur)
        left[1:] = cur[:-1]
        up = pix[y - 1] if y else np.zeros_like(cur)
        upleft = np.zeros_like(cur)
        if y:
            upleft[1:] = pix[y - 1][:-1]
        if f == 0:
            filt = cur
        elif f == 1:
            filt = cur - left
        elif f == 2:
            filt = cur - up
        elif f == 3:
            filt = cur - ((left + up) >> 1)
        else:
            filt = cur - _paeth_vec(left, up, upleft)
        parts.append(bytes([f]) + (filt & 0xFF).astype(np.uint8).tobytes())

    def chunk(typ: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + typ
            + payload
            + struct.pack(">I", zlib.crc32(typ + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        _SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"".join(parts), 6))
        + chunk(b"IEND", b"")
    )
