"""GeoTIFF IO seam (S1 scan / S8 sink on real rasters).

The reference reads GeoTIFF/VRT via rasterio/xarray
(/root/reference/geo_inference/geo_inference.py:237-302) and writes a
tiled LZW BigTIFF uint8 mask with nodata 255
(geo_inference.py:388-397, profile utils/helpers.py:279-301). This
container has no rasterio, so — like multimodal's PIL gate — the
adapter is import-try'd: the Spark-side contract (chunk table schema,
tile assembly, profile fields) is real and unit-tested against a mock;
a rasterio install makes it work on real data unchanged.
"""

from __future__ import annotations

import numpy as np

try:  # pragma: no cover - rasterio absent in this container
    import rasterio  # noqa: F401

    _HAS_RASTERIO = True
except ImportError:
    _HAS_RASTERIO = False


def _require_rasterio():
    if not _HAS_RASTERIO:
        raise ImportError(
            "rasterio is required for GeoTIFF IO; install it or use the "
            "in-memory raster_to_chunks / parquet mask-tile paths"
        )


def read_geotiff_chunks(spark, path: str, stride: int, partitions: int | None = None):
    """GeoTIFF -> ((ty, tx, chunk) DataFrame, ny, nx, meta).

    meta carries (transform, crs, width, height, count, nodata) — the
    fields the mask sink and the annotation affine transforms need.
    Reads the full array on the driver then cuts via raster_to_chunks;
    at 100 TB the chunks would be read per-window by executors from
    object storage instead (rasterio windowed reads per (ty, tx) task
    over the same schema).
    """
    _require_rasterio()
    from ..operators.overlap import raster_to_chunks

    with rasterio.open(path) as src:
        arr = src.read().astype(np.float64)
        meta = {
            "transform": tuple(src.transform)[:6],
            "crs": src.crs.to_string() if src.crs else None,
            "width": src.width,
            "height": src.height,
            "count": src.count,
            "nodata": src.nodata,
        }
    df, ny, nx = raster_to_chunks(spark, arr, stride, partitions)
    return df, ny, nx, meta


def mask_profile(meta: dict) -> dict:
    """The reference's single-band uint8 mask profile
    (utils/helpers.py:279-301): GTiff, BIGTIFF, lzw, nodata 255."""
    return {
        "driver": "GTiff",
        "dtype": "uint8",
        "count": 1,
        "width": meta["width"],
        "height": meta["height"],
        "crs": meta["crs"],
        "transform": meta["transform"],
        "nodata": 255,
        "tiled": True,
        "compress": "lzw",
        "BIGTIFF": "YES",
    }


def assemble_mask(tiles_rows, stride: int, height: int, width: int) -> np.ndarray:
    """(ty, tx, mask-bytes) rows -> dense uint8 mask trimmed to
    (height, width). Driver-side by design for the single-file sink;
    rasterio-free so it is testable everywhere."""
    s = stride
    ny = -(-height // s)
    nx = -(-width // s)
    out = np.full((ny * s, nx * s), 255, dtype=np.uint8)
    for r in tiles_rows:
        m = np.frombuffer(bytes(r["mask"]), dtype=np.uint8).reshape(s, s)
        out[r["ty"] * s : (r["ty"] + 1) * s, r["tx"] * s : (r["tx"] + 1) * s] = m
    return out[:height, :width]


def write_mask_geotiff(tiles, stride: int, meta: dict, path: str) -> None:
    """Mask-tile DataFrame -> LZW GeoTIFF (S8 on real storage), the
    reference's compressed mask profile (utils/helpers.py:289-300).

    The distributed sink remains the mask-tile table
    (sinks.write_mask_tiles); this export materializes one GeoTIFF the
    way the reference does. With rasterio installed it writes the
    exact tiled LZW BigTIFF profile; without it, the from-scratch
    codec writes a striped LZW classic TIFF (same pixels, same
    georeferencing; BigTIFF only matters past 4 GiB)."""
    mask = assemble_mask(
        tiles.select("ty", "tx", "mask").collect(),
        stride,
        meta["height"],
        meta["width"],
    )
    if not _HAS_RASTERIO:
        from .tiff import write_geotiff

        crs = meta.get("crs")
        epsg = int(str(crs).split(":")[-1]) if crs else None
        write_geotiff(
            mask, path, transform=meta["transform"], epsg=epsg,
            compression="lzw",
        )
        return
    import rasterio as rio
    from rasterio.transform import Affine

    profile = mask_profile(meta)
    t = profile["transform"]
    profile["transform"] = Affine(t[0], t[1], t[2], t[3], t[4], t[5])
    with rio.open(path, "w", **profile) as dst:
        dst.write(mask, 1)
