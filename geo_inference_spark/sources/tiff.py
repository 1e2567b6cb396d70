"""Minimal GeoTIFF codec — from scratch, stdlib struct only.

The reference's raster IO is rasterio/xarray
(/root/reference/geo_inference/geo_inference.py:237-302, mask sink
:388-397). rasterio is absent here, so the subset of the public TIFF
6.0 + GeoTIFF 1.1 specs the engine actually needs is implemented
directly:

* ``write_geotiff`` — single- or multi-band arrays as BASELINE TIFF:
  little-endian, striped, uncompressed, pixel-interleaved, with
  ModelPixelScaleTag/ModelTiepointTag (the north-up affine) and a
  GeoKeyDirectory carrying the EPSG code. (The reference writes
  LZW/BigTIFF via rasterio — compression is delegated to the gated
  rasterio seam in raster_io.py; this codec guarantees a working
  GeoTIFF path with zero dependencies.)
* ``read_geotiff`` — classic TIFF, either byte order, uncompressed,
  striped or tiled, contiguous planar config; uint8/16/32 and
  float32/64 samples. Returns ((bands, H, W) float64, meta) with the
  same meta dict shape as raster_io.read_geotiff_chunks.
* ``read_geotiff_chunks_stdlib`` — the scan: array -> the engine's
  (ty, tx, chunk) table.

Every tag id below is from the public TIFF/GeoTIFF registries.
"""

from __future__ import annotations

import struct

import numpy as np

# TIFF tag ids (TIFF 6.0 spec)
T_WIDTH, T_HEIGHT = 256, 257
T_BITS, T_COMPRESSION, T_PHOTOMETRIC = 258, 259, 262
T_STRIP_OFFSETS, T_SAMPLES_PER_PIXEL, T_ROWS_PER_STRIP = 273, 277, 278
T_STRIP_COUNTS, T_PLANAR = 279, 284
T_TILE_WIDTH, T_TILE_HEIGHT, T_TILE_OFFSETS, T_TILE_COUNTS = 322, 323, 324, 325
T_SAMPLE_FORMAT = 339
# GeoTIFF 1.1
T_MODEL_PIXEL_SCALE, T_MODEL_TIEPOINT, T_GEO_KEYS = 33550, 33922, 34735

_FMT_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 11: 4, 12: 8, 16: 8, 17: 8}


def _np_dtype(bits: int, sample_format: int, bo: str) -> np.dtype:
    if sample_format == 3:  # IEEE float
        return np.dtype(f"{bo}f{bits // 8}")
    if sample_format == 2:  # signed int
        return np.dtype(f"{bo}i{bits // 8}")
    return np.dtype(f"{bo}u{bits // 8}")  # unsigned (default)


def write_geotiff(
    arr: np.ndarray,
    path: str,
    transform=(1.0, 0.0, 0.0, 0.0, -1.0, 0.0),
    epsg: int | None = 4326,
    rows_per_strip: int = 64,
) -> None:
    """(bands, H, W) or (H, W) -> baseline striped GeoTIFF (LE,
    uncompressed, pixel-interleaved). transform is the affine
    (a, b, c, d, e, f) with x = a*col + b*row + c — only north-up
    (b == d == 0) is expressible via PixelScale+Tiepoint."""
    a = np.asarray(arr)
    if a.ndim == 2:
        a = a[None, :, :]
    bands, h, w = a.shape
    ta, tb, tc, td, te, tf = (float(x) for x in transform)
    if tb != 0.0 or td != 0.0:
        raise ValueError("rotated transforms need the rasterio seam")
    if a.dtype.kind == "f":
        fmt, bits = 3, a.dtype.itemsize * 8
    elif a.dtype.kind == "i":
        fmt, bits = 2, a.dtype.itemsize * 8
    else:
        fmt, bits = 1, a.dtype.itemsize * 8
    pix = np.ascontiguousarray(np.moveaxis(a, 0, -1))  # (H, W, bands)
    row_bytes = w * bands * (bits // 8)
    strips = []
    for y0 in range(0, h, rows_per_strip):
        strips.append(pix[y0 : y0 + rows_per_strip].tobytes())

    entries = []  # (tag, type, count, value_or_bytes)

    def short(tag, v):
        entries.append((tag, 3, 1, struct.pack("<HH", v, 0)))

    def long_(tag, v):
        entries.append((tag, 4, 1, struct.pack("<I", v)))

    short(T_WIDTH, w)
    short(T_HEIGHT, h)
    entries.append(
        (T_BITS, 3, bands,
         struct.pack(f"<{bands}H", *([bits] * bands)).ljust(4, b"\0"))
    )
    short(T_COMPRESSION, 1)
    short(T_PHOTOMETRIC, 1)
    entries.append((T_STRIP_OFFSETS, 4, len(strips), None))  # patched below
    short(T_SAMPLES_PER_PIXEL, bands)
    short(T_ROWS_PER_STRIP, rows_per_strip)
    entries.append((T_STRIP_COUNTS, 4, len(strips), None))
    short(T_PLANAR, 1)
    entries.append(
        (T_SAMPLE_FORMAT, 3, bands,
         struct.pack(f"<{bands}H", *([fmt] * bands)).ljust(4, b"\0"))
    )
    # GeoTIFF: pixel scale (a, -e, 0) + tiepoint (0,0,0 -> c,f,0)
    entries.append(
        (T_MODEL_PIXEL_SCALE, 12, 3, struct.pack("<3d", ta, -te, 0.0))
    )
    entries.append(
        (T_MODEL_TIEPOINT, 12, 6,
         struct.pack("<6d", 0.0, 0.0, 0.0, tc, tf, 0.0))
    )
    if epsg is not None:
        # GeoKeyDirectory: version 1.1.0, 1 key: 2048 (geographic) or
        # 3072 (projected) CRS code
        geo_key = 2048 if epsg == 4326 else 3072
        keys = struct.pack("<8H", 1, 1, 0, 1, geo_key, 0, 1, epsg)
        entries.append((T_GEO_KEYS, 3, 8, keys))

    entries.sort(key=lambda e: e[0])
    n = len(entries)
    ifd_offset = 8
    data_offset = ifd_offset + 2 + n * 12 + 4  # after IFD
    # lay out out-of-line values first, then strips
    blobs = []
    blob_off = {}
    cur = data_offset
    for i, (tag, typ, cnt, val) in enumerate(entries):
        if val is not None and len(val) > 4:
            blob_off[i] = cur
            blobs.append(val)
            cur += len(val)
    # strip offsets/counts arrays
    strip_offsets = []
    strip_counts = [len(s) for s in strips]
    so_bytes = sc_bytes = b""
    so_off = sc_off = 0
    if len(strips) > 1:
        so_off, cur = cur, cur + 4 * len(strips)
        sc_off, cur = cur, cur + 4 * len(strips)
    strip_start = cur
    off = strip_start
    for s in strips:
        strip_offsets.append(off)
        off += len(s)
    so_bytes = struct.pack(f"<{len(strips)}I", *strip_offsets)
    sc_bytes = struct.pack(f"<{len(strips)}I", *strip_counts)

    out = [b"II*\0", struct.pack("<I", ifd_offset), struct.pack("<H", n)]
    for i, (tag, typ, cnt, val) in enumerate(entries):
        if tag == T_STRIP_OFFSETS:
            v = (struct.pack("<I", strip_offsets[0]) if len(strips) == 1
                 else struct.pack("<I", so_off))
        elif tag == T_STRIP_COUNTS:
            v = (struct.pack("<I", strip_counts[0]) if len(strips) == 1
                 else struct.pack("<I", sc_off))
        elif val is not None and len(val) > 4:
            v = struct.pack("<I", blob_off[i])
        else:
            v = (val or b"").ljust(4, b"\0")
        out.append(struct.pack("<HHI", tag, typ, cnt) + v)
    out.append(struct.pack("<I", 0))  # next IFD
    out.extend(blobs)
    if len(strips) > 1:
        out.append(so_bytes)
        out.append(sc_bytes)
    out.extend(strips)
    with open(path, "wb") as f:
        f.write(b"".join(out))


def _read_ifd(buf: bytes, bo: str):
    (off,) = struct.unpack_from(f"{bo}I", buf, 4)
    (n,) = struct.unpack_from(f"{bo}H", buf, off)
    tags = {}
    for i in range(n):
        tag, typ, cnt = struct.unpack_from(f"{bo}HHI", buf, off + 2 + i * 12)
        voff = off + 2 + i * 12 + 8
        size = _FMT_SIZES.get(typ, 1) * cnt
        if size > 4:
            (ptr,) = struct.unpack_from(f"{bo}I", buf, voff)
            raw = buf[ptr : ptr + size]
        else:
            raw = buf[voff : voff + size]
        if typ == 3:
            vals = struct.unpack(f"{bo}{cnt}H", raw)
        elif typ == 4:
            vals = struct.unpack(f"{bo}{cnt}I", raw)
        elif typ == 12:
            vals = struct.unpack(f"{bo}{cnt}d", raw)
        elif typ == 11:
            vals = struct.unpack(f"{bo}{cnt}f", raw)
        else:
            vals = (raw,)
        tags[tag] = vals
    return tags


def read_geotiff(path: str):
    """classic TIFF -> ((bands, H, W) float64, meta dict)."""
    buf = open(path, "rb").read()
    if buf[:2] == b"II":
        bo = "<"
    elif buf[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError("not a TIFF file")
    (magic,) = struct.unpack_from(f"{bo}H", buf, 2)
    if magic != 42:
        raise ValueError("BigTIFF needs the rasterio seam")
    t = _read_ifd(buf, bo)
    if t.get(T_COMPRESSION, (1,))[0] != 1:
        raise ValueError("compressed TIFF needs the rasterio seam")
    if t.get(T_PLANAR, (1,))[0] != 1:
        raise ValueError("only contiguous planar config supported")
    w, h = t[T_WIDTH][0], t[T_HEIGHT][0]
    bands = t.get(T_SAMPLES_PER_PIXEL, (1,))[0]
    bits = t[T_BITS][0]
    fmt = t.get(T_SAMPLE_FORMAT, (1,))[0]
    dt = _np_dtype(bits, fmt, bo)
    pix = np.zeros((h, w, bands), dtype=dt)
    if T_TILE_OFFSETS in t:
        tw, th = t[T_TILE_WIDTH][0], t[T_TILE_HEIGHT][0]
        nx = -(-w // tw)
        i = 0
        for off, cnt in zip(t[T_TILE_OFFSETS], t[T_TILE_COUNTS]):
            tile = np.frombuffer(buf, dt, count=tw * th * bands, offset=off)
            tile = tile.reshape(th, tw, bands)
            ty, tx = divmod(i, nx)
            y0, x0 = ty * th, tx * tw
            ys, xs = min(th, h - y0), min(tw, w - x0)
            pix[y0 : y0 + ys, x0 : x0 + xs] = tile[:ys, :xs]
            i += 1
    else:
        rps = t.get(T_ROWS_PER_STRIP, (h,))[0]
        y0 = 0
        for off, cnt in zip(t[T_STRIP_OFFSETS], t[T_STRIP_COUNTS]):
            rows = min(rps, h - y0)
            strip = np.frombuffer(buf, dt, count=rows * w * bands, offset=off)
            pix[y0 : y0 + rows] = strip.reshape(rows, w, bands)
            y0 += rows
    arr = np.moveaxis(pix, -1, 0).astype(np.float64)
    # geotransform
    transform = (1.0, 0.0, 0.0, 0.0, -1.0, 0.0)
    if T_MODEL_PIXEL_SCALE in t and T_MODEL_TIEPOINT in t:
        sx, sy = t[T_MODEL_PIXEL_SCALE][0], t[T_MODEL_PIXEL_SCALE][1]
        tp = t[T_MODEL_TIEPOINT]
        # raster point (tp0, tp1) maps to model (tp3, tp4)
        c = tp[3] - tp[0] * sx
        f = tp[4] + tp[1] * sy
        transform = (sx, 0.0, c, 0.0, -sy, f)
    epsg = None
    if T_GEO_KEYS in t:
        keys = t[T_GEO_KEYS]
        for i in range(4, len(keys), 4):
            if keys[i] in (2048, 3072):
                epsg = keys[i + 3]
    return arr, {
        "transform": transform,
        "crs": f"EPSG:{epsg}" if epsg else None,
        "width": w,
        "height": h,
        "count": bands,
        "nodata": None,
    }


def read_geotiff_chunks_stdlib(spark, path: str, stride: int, partitions=None):
    """GeoTIFF -> ((ty, tx, chunk) table, ny, nx, meta) with no
    rasterio — the stdlib twin of raster_io.read_geotiff_chunks."""
    from ..operators.overlap import raster_to_chunks

    arr, meta = read_geotiff(path)
    df, ny, nx = raster_to_chunks(spark, arr, stride, partitions)
    return df, ny, nx, meta


def read_stac_item_stack(item_path: str, bands_requested: list[str]):
    """S3 end-to-end on real files: resolve a STAC item's single-band
    GeoTIFF assets by eo:bands common_name and stack them in request
    order -> ((bands, H, W) float64, meta of the first band). Hrefs
    must be local/mounted paths (HTTP fetch is out of scope here —
    at scale the hrefs are object-store keys executors read directly).
    """
    import os

    from .manifest import stac_band_hrefs

    hrefs = stac_band_hrefs(item_path, bands_requested)
    base = os.path.dirname(os.path.abspath(item_path))
    arrs, meta0 = [], None
    for href in hrefs:
        p = href if os.path.isabs(href) else os.path.join(base, href)
        arr, meta = read_geotiff(p)
        if meta0 is None:
            meta0 = meta
        elif (meta["width"], meta["height"]) != (meta0["width"], meta0["height"]):
            raise ValueError("STAC band assets disagree on raster shape")
        arrs.append(arr[0])
    meta0["count"] = len(arrs)
    return np.stack(arrs), meta0
