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
    out = np.zeros((h, stride), np.uint8)
    prev = np.zeros(stride, np.int32)
    p = 0
    for y in range(h):
        f = raw[p]
        row = np.frombuffer(raw, np.uint8, stride, p + 1).astype(np.int32)
        p += 1 + stride
        if f == 0:
            cur = row
        elif f == 1:  # Sub: per byte-lane cumsum over pixels
            cur = np.cumsum(
                row.reshape(w, c), axis=0, dtype=np.int64
            ).astype(np.int32).reshape(stride) & 0xFF
        elif f == 2:  # Up
            cur = (row + prev) & 0xFF
        elif f == 3:  # Average (sequential in x)
            cur = np.zeros(stride, np.int32)
            for x in range(stride):
                left = cur[x - c] if x >= c else 0
                cur[x] = (row[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif f == 4:  # Paeth (sequential in x)
            cur = np.zeros(stride, np.int32)
            for x in range(stride):
                a = cur[x - c] if x >= c else 0
                b = prev[x]
                cc = prev[x - c] if x >= c else 0
                cur[x] = (row[x] + _paeth(int(a), int(b), int(cc))) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {f}")
        cur = cur & 0xFF
        out[y] = cur.astype(np.uint8)
        prev = cur
    pix = out.reshape(h, w, c)
    if ctype == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        pix = plte[pix[:, :, 0]]
    return pix


def encode_png(arr: np.ndarray) -> bytes:
    """(h, w) or (h, w, c) uint8 -> PNG bytes (filter-0 rows)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, c = a.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[c]

    def chunk(typ: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + typ
            + payload
            + struct.pack(">I", zlib.crc32(typ + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    rows = b"".join(b"\0" + a[y].tobytes() for y in range(h))
    return (
        _SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(rows, 6))
        + chunk(b"IEND", b"")
    )
