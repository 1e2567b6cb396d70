"""Zarr v2 array store — from-scratch, stdlib-only (json + zlib).

The reference reads its zarr inputs with ``da.from_zarr``
(/root/reference/geo_inference/geo_dask.py:250) and a sidecar
metadata JSON (geo_dask.py:323-352). No zarr package ships in this
container, so the v2 format (public spec: .zarray JSON + C-order
chunk files named "i.j.k") is implemented directly:

* ``write_zarr_v2``  — (bands, H, W) numpy -> a zarr v2 directory
  (raw or zlib-compressed chunks), driver-side (test/ingest path).
* ``read_zarr_chunks`` — the DISTRIBUTED scan: the chunk grid becomes
  a task table and every executor decodes only its own chunk files
  via one Arrow pass, emitting the engine's (ty, tx, chunk) table —
  the same shape operators/overlap.py stitches. At 100 TB the chunk
  file list is the unit of parallelism and nothing ever concentrates
  on the driver.

Supported: C order, one chunk spanning the band axis, raw/zlib
codecs (blosc etc. raise loudly — install zarr for those).
"""

from __future__ import annotations

import json
import os
import zlib

import numpy as np
import pandas as pd

from ..operators.overlap import CHUNK_SCHEMA, np_to_bytes


def write_zarr_v2(
    arr: np.ndarray,
    path: str,
    spatial_chunk: int = 8,
    compressor: str | None = "zlib",
    level: int = 5,
    attrs: dict | None = None,
) -> None:
    """(bands, H, W) -> zarr v2 directory with chunks
    (bands, spatial_chunk, spatial_chunk)."""
    arr = np.asarray(arr)
    bands, h, w = arr.shape
    s = int(spatial_chunk)
    meta = {
        "zarr_format": 2,
        "shape": [bands, h, w],
        "chunks": [bands, s, s],
        "dtype": arr.dtype.str,
        "compressor": {"id": "zlib", "level": level} if compressor else None,
        "fill_value": 0,
        "order": "C",
        "filters": None,
    }
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, ".zarray"), "w") as f:
        json.dump(meta, f)
    if attrs is not None:
        with open(os.path.join(path, ".zattrs"), "w") as f:
            json.dump(attrs, f)
    ny = -(-h // s)
    nx = -(-w // s)
    for cy in range(ny):
        for cx in range(nx):
            block = np.zeros((bands, s, s), dtype=arr.dtype)
            yb = arr[:, cy * s : (cy + 1) * s, cx * s : (cx + 1) * s]
            block[:, : yb.shape[1], : yb.shape[2]] = yb
            raw = np.ascontiguousarray(block).tobytes()
            if compressor:
                raw = zlib.compress(raw, level)
            with open(os.path.join(path, f"0.{cy}.{cx}"), "wb") as f:
                f.write(raw)


def _zarray_meta(path: str) -> dict:
    with open(os.path.join(path, ".zarray")) as f:
        meta = json.load(f)
    comp = meta.get("compressor")
    if comp is not None and comp.get("id") != "zlib":
        raise ValueError(
            f"unsupported zarr compressor {comp.get('id')!r}; this "
            "stdlib reader handles raw and zlib (install zarr for blosc)"
        )
    if meta.get("order", "C") != "C":
        raise ValueError("only C-order zarr arrays supported")
    if meta.get("filters"):
        raise ValueError("zarr filters not supported")
    bands, h, w = meta["shape"]
    cb, cs1, cs2 = meta["chunks"]
    if cb != bands or cs1 != cs2:
        raise ValueError(
            "expected one chunk across the band axis and square spatial "
            f"chunks, got chunks={meta['chunks']} for shape={meta['shape']}"
        )
    return meta


def read_zarr_chunks(spark, path: str, partitions: int | None = None):
    """zarr dir -> ((ty, tx, chunk) DataFrame, ny, nx, meta).

    Chunk payloads are float64 (bands, s, s) bytes — exactly the
    overlap engine's CHUNK layout, so ``overlap_stitch`` consumes the
    result unchanged. Missing chunk files yield fill_value blocks (the
    v2 spec's sparse-array behavior).
    """
    meta = _zarray_meta(path)
    bands, h, w = meta["shape"]
    s = meta["chunks"][1]
    dtype = np.dtype(meta["dtype"])
    comp = meta.get("compressor") is not None
    fill = meta.get("fill_value") or 0
    ny = -(-h // s)
    nx = -(-w // s)
    tasks = spark.createDataFrame(
        [(cy, cx) for cy in range(ny) for cx in range(nx)],
        schema="ty int, tx int",
    )
    if partitions:
        tasks = tasks.repartition(partitions)

    def decode(pdf_iter):
        for pdf in pdf_iter:
            out = []
            for ty, tx in zip(pdf["ty"], pdf["tx"]):
                fp = os.path.join(path, f"0.{int(ty)}.{int(tx)}")
                if os.path.exists(fp):
                    raw = open(fp, "rb").read()
                    if comp:
                        raw = zlib.decompress(raw)
                    block = np.frombuffer(raw, dtype=dtype).reshape(bands, s, s)
                else:
                    block = np.full((bands, s, s), fill, dtype=dtype)
                out.append(np_to_bytes(block.astype(np.float64)))
            yield pd.DataFrame({"ty": pdf["ty"], "tx": pdf["tx"], "chunk": out})

    return tasks.mapInPandas(decode, CHUNK_SCHEMA), ny, nx, meta


def write_mask_zarr(tiles, path: str, stride: int, height: int, width: int,
                    attrs: dict | None = None) -> None:
    """S8 zarr sink, DISTRIBUTED: every executor writes its own mask
    tiles as independent zarr chunk files (raw uint8 — the exact
    object-store write pattern zarr exists for: no coordination, no
    driver assembly); the driver only writes the tiny .zarray. Tiles
    absent from the table are left unwritten = fill_value (sparse)."""
    import pandas as pd  # noqa: F401 (mapInPandas contract)

    s = int(stride)
    os.makedirs(path, exist_ok=True)
    # shape = the TRUE raster extent (ADVICE r2): zarr v2 stores edge
    # chunks padded to full chunk size, but the array shape defines the
    # logical bounds, so standard readers see exactly (height, width)
    meta = {
        "zarr_format": 2,
        "shape": [1, int(height), int(width)],
        "chunks": [1, s, s],
        "dtype": "|u1",
        "compressor": None,
        "fill_value": 255,
        "order": "C",
        "filters": None,
    }
    with open(os.path.join(path, ".zarray"), "w") as f:
        json.dump(meta, f)
    if attrs is not None:
        with open(os.path.join(path, ".zattrs"), "w") as f:
            json.dump(attrs, f)

    def write(pdf_iter):
        n = 0
        for pdf in pdf_iter:
            for ty, tx, m in zip(pdf["ty"], pdf["tx"], pdf["mask"]):
                with open(os.path.join(path, f"0.{int(ty)}.{int(tx)}"), "wb") as f:
                    f.write(bytes(m))
                n += 1
        yield pd.DataFrame({"n": [n]})

    tiles.select("ty", "tx", "mask").mapInPandas(write, "n long").agg(
        {"n": "sum"}
    ).collect()
