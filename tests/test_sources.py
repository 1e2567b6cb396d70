"""Manifest / GeoJSON / zarr-metadata sources and CRS helpers."""

import json

import math
import pytest

from geo_inference_spark.functions.crs import check_crs, transform_bounds
from geo_inference_spark.sources.manifest import (
    parse_zarr_metadata,
    read_geojson_polygons,
    read_manifest,
    zarr_metadata_dict,
)


def test_read_manifest_sorted_by_split(spark, tmp_path):
    p = tmp_path / "aoi.csv"
    p.write_text(
        "b.tif,b.gpkg,val,aoi2\n"
        "a.tif,a.gpkg,trn,aoi1\n"
        ",x.gpkg,tst,aoi3\n"  # missing tif -> dropped
    )
    rows = read_manifest(spark, str(p)).collect()
    assert [r.split for r in rows] == ["trn", "val"]
    assert rows[0].tif == "a.tif"


def test_read_geojson_polygons(spark, tmp_path):
    doc = {
        "type": "FeatureCollection",
        "features": [
            {
                "type": "Feature",
                "properties": {"value": 4.0},
                "geometry": {
                    "type": "Polygon",
                    "coordinates": [[[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]]],
                },
            },
            {"type": "Feature", "properties": {},
             "geometry": {"type": "Point", "coordinates": [0, 0]}},
        ],
    }
    p = tmp_path / "v.geojson"
    p.write_text(json.dumps(doc))
    rows = read_geojson_polygons(spark, str(p)).collect()
    assert len(rows) == 1 and rows[0].value == 4.0
    # graceful empty on missing file (geo.py:36-56 behavior)
    assert read_geojson_polygons(spark, str(tmp_path / "nope.geojson")).count() == 0


ZMETA = {
    "crs": "EPSG:4326",
    "transform": "| 0.5, 0.0, 100.0 |\n| 0.0, -0.5, 300.0 |",
    "count": 3, "width": 512, "height": 256,
    "driver": "GTiff", "dtype": "uint8",
}


def test_zarr_metadata_in_plan(spark):
    df = spark.createDataFrame([(json.dumps(ZMETA),)], schema="meta_json string")
    row = parse_zarr_metadata(spark, df).collect()[0]
    assert row.width == 512 and row["count"] == 3  # .count is Row's method
    assert list(row.affine6) == [0.5, 0.0, 100.0, 0.0, -0.5, 300.0]


def test_zarr_metadata_driver_twin(tmp_path):
    p = tmp_path / "m.json"
    p.write_text(json.dumps(ZMETA))
    meta = zarr_metadata_dict(str(p))
    assert meta["transform"] == (0.5, 0.0, 100.0, 0.0, -0.5, 300.0)


def test_crs_check_and_bounds():
    assert check_crs(4326) == "EPSG:4326"
    assert check_crs("epsg:3857") == "EPSG:3857"
    with pytest.raises(ValueError):
        check_crs("not-a-crs")
    b = transform_bounds(4326, 3857, -1.0, -1.0, 1.0, 1.0)
    assert b[0] == pytest.approx(-111319.49, rel=1e-4)
    rt = transform_bounds(3857, 4326, *b)
    assert all(math.isclose(a, e, abs_tol=1e-9) for a, e in zip(rt, (-1, -1, 1, 1)))
    assert transform_bounds(4326, 4326, 1, 2, 3, 4) == (1, 2, 3, 4)


STAC_ITEM = {
    "type": "Feature",
    "assets": {
        "B04": {"href": "s3://x/red.tif", "eo:bands": [{"common_name": "red"}]},
        "B03": {"href": "s3://x/green.tif", "eo:bands": [{"common_name": "green"}]},
        "B02": {"href": "s3://x/blue.tif", "eo:bands": [{"common_name": "blue"}]},
        "thumb": {"href": "s3://x/t.png"},
    },
}


def test_stac_asset_resolution(tmp_path):
    import json as _json

    from geo_inference_spark.sources.manifest import (
        stac_assets_by_common_name,
        stac_band_hrefs,
    )

    p = tmp_path / "item.json"
    p.write_text(_json.dumps(STAC_ITEM))
    assets = stac_assets_by_common_name(str(p))
    assert set(assets) == {"red", "green", "blue"}
    assert assets["red"]["name"] == "B04"
    assert stac_band_hrefs(str(p), ["blue", "red"]) == [
        "s3://x/blue.tif", "s3://x/red.tif",
    ]
    with pytest.raises(ValueError):
        stac_band_hrefs(str(p), ["nir", "red"])
    bad = dict(STAC_ITEM)
    bad["assets"] = {"B1": {"href": "x", "eo:bands": [{"common_name": "purple"}]}}
    p2 = tmp_path / "bad.json"
    p2.write_text(_json.dumps(bad))
    with pytest.raises(ValueError):
        stac_assets_by_common_name(str(p2))


# --------------------------------------------------------- raster IO seam

def test_raster_io_gated_without_rasterio():
    import geo_inference_spark.sources.raster_io as rio_mod

    if rio_mod._HAS_RASTERIO:  # pragma: no cover - not in this container
        return
    import pytest as _pytest

    with _pytest.raises(ImportError, match="rasterio"):
        rio_mod.read_geotiff_chunks(None, "/x.tif", 8)
    with _pytest.raises(ImportError, match="rasterio"):
        rio_mod.write_mask_geotiff(None, 8, {}, "/x.tif")


def test_raster_io_profile_and_assembly():
    """The rasterio-free pieces: reference mask profile fields and the
    tile -> dense assembly (trim + 255 fill for absent tiles)."""
    import numpy as np

    from geo_inference_spark.sources.raster_io import assemble_mask, mask_profile

    meta = {"width": 10, "height": 7, "crs": "EPSG:4326",
            "transform": (1.0, 0.0, 5.0, 0.0, -1.0, 9.0)}
    prof = mask_profile(meta)
    assert prof["driver"] == "GTiff" and prof["dtype"] == "uint8"
    assert prof["compress"] == "lzw" and prof["BIGTIFF"] == "YES"
    assert prof["nodata"] == 255 and prof["count"] == 1 and prof["tiled"]

    t00 = np.arange(16, dtype=np.uint8).reshape(4, 4)
    rows = [
        {"ty": 0, "tx": 0, "mask": t00.tobytes()},
        {"ty": 1, "tx": 2, "mask": np.full((4, 4), 7, np.uint8).tobytes()},
    ]
    m = assemble_mask(rows, 4, 7, 10)
    assert m.shape == (7, 10)
    np.testing.assert_array_equal(m[:4, :4], t00)
    assert (m[4:7, 8:10] == 7).all()
    assert (m[:4, 4:8] == 255).all()  # absent tiles -> nodata


# --------------------------------------------------------- zarr v2 store

def test_zarr_v2_roundtrip_and_stitch(spark, tmp_path):
    """write_zarr_v2 -> read_zarr_chunks -> overlap stitch == the dense
    pipeline on the original array (real zarr end-to-end, stdlib-only);
    edge chunks pad, missing chunks fill, zlib + raw both work."""
    import numpy as np

    from geo_inference_spark.operators.overlap import (
        bytes_to_np,
        overlap_stitch,
    )
    from geo_inference_spark.raster.dense import dense_infer_mask
    from geo_inference_spark.raster.kernels import make_linear_model
    from geo_inference_spark.sources.zarr_store import (
        read_zarr_chunks,
        write_zarr_v2,
    )

    rng = np.random.RandomState(12)
    arr = rng.uniform(0, 255, size=(2, 18, 27))  # NOT chunk-aligned
    for comp in ("zlib", None):
        zp = str(tmp_path / f"a_{comp}.zarr")
        write_zarr_v2(arr, zp, spatial_chunk=4, compressor=comp)
        chunks, ny, nx, meta = read_zarr_chunks(spark, zp)
        assert (ny, nx) == (5, 7) and meta["shape"] == [2, 18, 27]
        rows = {(r.ty, r.tx): bytes_to_np(bytes(r.chunk), (2, 4, 4))
                for r in chunks.collect()}
        assert len(rows) == 35
        np.testing.assert_array_equal(rows[(0, 0)], arr[:, :4, :4])
        # edge chunk zero-padded beyond the array extent
        edge = rows[(4, 6)]
        np.testing.assert_array_equal(edge[:, :2, :3], arr[:, 16:18, 24:27])
        assert (edge[:, 2:, :] == 0).all() and (edge[:, :, 3:] == 0).all()
        got_tiles = overlap_stitch(
            chunks, make_linear_model(3), 2, 4, ny, nx, 3
        ).collect()
        mask = np.zeros((ny * 4, nx * 4), dtype=np.uint8)
        for r in got_tiles:
            m = np.frombuffer(bytes(r.mask), dtype=np.uint8).reshape(4, 4)
            mask[r.ty * 4:(r.ty + 1) * 4, r.tx * 4:(r.tx + 1) * 4] = m
        # dense reference pads 18x27 -> 20x28 with zeros exactly like
        # the zarr edge chunks do
        exp = dense_infer_mask(arr, make_linear_model(3), 8, 3)
        np.testing.assert_array_equal(mask[:18, :27], exp)


def test_zarr_v2_unsupported_codec(tmp_path):
    import json
    import os

    import pytest as _pytest

    from geo_inference_spark.sources.zarr_store import _zarray_meta

    zp = str(tmp_path / "b.zarr")
    os.makedirs(zp)
    with open(os.path.join(zp, ".zarray"), "w") as f:
        json.dump({"zarr_format": 2, "shape": [1, 4, 4],
                   "chunks": [1, 4, 4], "dtype": "<f8", "order": "C",
                   "fill_value": 0, "filters": None,
                   "compressor": {"id": "blosc"}}, f)
    with _pytest.raises(ValueError, match="blosc"):
        _zarray_meta(zp)


# --------------------------------------------------------- stdlib GeoTIFF

def test_geotiff_roundtrip_and_chunks(spark, tmp_path):
    """write_geotiff -> read_geotiff roundtrips pixels, transform and
    EPSG for multi-band float and single-band uint8; the chunk scan
    feeds the stitch unchanged."""
    import numpy as np

    from geo_inference_spark.operators.overlap import bytes_to_np
    from geo_inference_spark.sources.tiff import (
        read_geotiff,
        read_geotiff_chunks_stdlib,
        write_geotiff,
    )

    rng = np.random.RandomState(5)
    t = (0.5, 0.0, 100.0, 0.0, -0.5, 300.0)
    # multi-band float32, multiple strips
    a = rng.uniform(0, 255, size=(3, 70, 40)).astype(np.float32)
    fp = str(tmp_path / "a.tif")
    write_geotiff(a, fp, transform=t, epsg=32618, rows_per_strip=16)
    got, meta = read_geotiff(fp)
    np.testing.assert_array_equal(got, a.astype(np.float64))
    assert meta["transform"] == t
    assert meta["crs"] == "EPSG:32618"
    assert (meta["count"], meta["height"], meta["width"]) == (3, 70, 40)
    # single-band uint8 mask (the S8 shape), one strip
    m = rng.randint(0, 4, size=(12, 16)).astype(np.uint8)
    fp2 = str(tmp_path / "m.tif")
    write_geotiff(m, fp2, transform=t, epsg=4326, rows_per_strip=64)
    got2, meta2 = read_geotiff(fp2)
    np.testing.assert_array_equal(got2[0], m.astype(np.float64))
    assert meta2["crs"] == "EPSG:4326"
    # distributed chunk scan
    df, ny, nx, meta3 = read_geotiff_chunks_stdlib(spark, fp, stride=8)
    assert (ny, nx) == (9, 5)  # 70->72, 40->40 at stride 8
    r = {(x.ty, x.tx): bytes_to_np(bytes(x.chunk), (3, 8, 8))
         for x in df.collect()}
    np.testing.assert_array_equal(r[(0, 0)], a[:, :8, :8].astype(np.float64))


def test_geotiff_reader_rejects_compressed(tmp_path):
    import struct

    import pytest as _pytest

    from geo_inference_spark.sources.tiff import read_geotiff

    # forge a minimal IFD claiming LZW compression
    ifd = struct.pack("<H", 1) + struct.pack(
        "<HHI", 259, 3, 1
    ) + struct.pack("<HH", 5, 0) + struct.pack("<I", 0)
    buf = b"II*\0" + struct.pack("<I", 8) + ifd
    fp = str(tmp_path / "c.tif")
    open(fp, "wb").write(buf)
    with _pytest.raises(ValueError, match="rasterio"):
        read_geotiff(fp)


def test_mask_zarr_sink_distributed(spark, tmp_path):
    """Distributed zarr mask sink: executor-written chunks read back
    exactly; absent tiles come back as fill 255."""
    import numpy as np

    from geo_inference_spark.sources.zarr_store import (
        read_zarr_chunks,
        write_mask_zarr,
    )

    rng = np.random.RandomState(3)
    t00 = rng.randint(0, 3, (4, 4)).astype(np.uint8)
    t11 = rng.randint(0, 3, (4, 4)).astype(np.uint8)
    tiles = spark.createDataFrame(
        [(0, 0, t00.tobytes()), (1, 1, t11.tobytes())],
        schema="ty int, tx int, mask binary",
    )
    zp = str(tmp_path / "mask.zarr")
    write_mask_zarr(tiles, zp, stride=4, height=8, width=8)
    chunks, ny, nx, meta = read_zarr_chunks(spark, zp)
    assert (ny, nx) == (2, 2) and meta["fill_value"] == 255
    got = {(r.ty, r.tx): np.frombuffer(bytes(r.chunk), dtype=np.float64)
           .reshape(1, 4, 4) for r in chunks.collect()}
    np.testing.assert_array_equal(got[(0, 0)][0], t00.astype(np.float64))
    np.testing.assert_array_equal(got[(1, 1)][0], t11.astype(np.float64))
    assert (got[(0, 1)] == 255.0).all()  # unwritten tile -> fill


def test_stac_item_band_stack(tmp_path):
    """STAC item with local single-band GeoTIFF assets -> stacked
    array in requested order via the stdlib codec."""
    import json

    import numpy as np

    from geo_inference_spark.sources.tiff import (
        read_stac_item_stack,
        write_geotiff,
    )

    rng = np.random.RandomState(4)
    bands = {}
    for cn in ("red", "green", "nir"):
        a = rng.uniform(0, 255, size=(10, 12)).astype(np.float32)
        write_geotiff(a, str(tmp_path / f"{cn}.tif"),
                      transform=(1.0, 0, 0, 0, -1.0, 0), epsg=32610)
        bands[cn] = a
    item = {
        "assets": {
            cn: {"href": f"{cn}.tif",
                 "eo:bands": [{"common_name": cn}]}
            for cn in bands
        }
    }
    ip = str(tmp_path / "item.json")
    json.dump(item, open(ip, "w"))
    arr, meta = read_stac_item_stack(ip, ["nir", "red"])
    assert arr.shape == (2, 10, 12) and meta["count"] == 2
    np.testing.assert_array_equal(arr[0], bands["nir"].astype(np.float64))
    np.testing.assert_array_equal(arr[1], bands["red"].astype(np.float64))
    assert meta["crs"] == "EPSG:32610"
