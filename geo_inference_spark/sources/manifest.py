"""Catalog-ish inputs: CSV AOI manifest, GeoJSON vector load, zarr
sidecar metadata (SURVEY.md §2.1 S5/S6/S2, §2.8 F15).

The reference parses these driver-side with pandas/json
(utils/helpers.py:366-413 read_csv; utils/geo.py:36-68 gdf_load/
df_load; geo_dask.py:323-352 read_zarr_metadata). Here they are
DataFrame scans: schema-checked spark.read + in-plan validation, so a
million-row manifest is as distributed as the data it points to.
"""

from __future__ import annotations

import json

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MANIFEST_SCHEMA = StructType(
    [
        StructField("tif", StringType()),
        StructField("gpkg", StringType()),
        StructField("split", StringType()),
        StructField("aoi_id", StringType()),
    ]
)


def read_manifest(spark: SparkSession, path: str) -> DataFrame:
    """S5: AOI csv manifest {tif, gpkg, split, aoi_id}, validated and
    ordered by split (helpers.py:366-413: rows must have 4 fields,
    sorted by split)."""
    df = spark.read.csv(path, schema=MANIFEST_SCHEMA, header=False)
    return df.filter(
        F.col("tif").isNotNull() & F.col("split").isNotNull()
    ).orderBy("split")


def read_geojson_polygons(spark: SparkSession, path: str) -> DataFrame:
    """S6: GeoJSON FeatureCollection -> (area_id, value, geom_wkb)
    polygons DataFrame. Graceful empty frame on a missing/invalid
    source (geo.py:36-56 returns empty on bad source)."""
    from ..geom.wkb import polygon_to_wkb

    empty = spark.createDataFrame(
        [], schema="area_id long, value double, geom_wkb binary"
    )
    try:
        with open(path) as f:
            doc = json.load(f)
    except (OSError, json.JSONDecodeError):
        return empty
    rows = []
    for i, feat in enumerate(doc.get("features", [])):
        geom = feat.get("geometry") or {}
        if geom.get("type") != "Polygon":
            continue
        rings = [np.asarray(r, dtype=np.float64) for r in geom["coordinates"]]
        value = float(feat.get("properties", {}).get("value", 0.0))
        rows.append((i, value, polygon_to_wkb(rings)))
    if not rows:
        return empty
    return spark.createDataFrame(
        rows, schema="area_id long, value double, geom_wkb binary"
    )


ZARR_META_SCHEMA = StructType(
    [
        StructField("crs", StringType()),
        StructField("transform", StringType()),
        StructField("count", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("driver", StringType()),
        StructField("dtype", StringType()),
        StructField("BIGTIFF", StringType()),
        StructField("compress", StringType()),
        StructField("nodata", DoubleType()),
    ]
)


def parse_zarr_metadata(spark: SparkSession, json_docs: DataFrame, col: str = "meta_json") -> DataFrame:
    """S2/F15: zarr sidecar JSON -> typed metadata incl. the affine
    parsed out of the 2-line '| a, b, c |\\n| d, e, f |' text block
    (geo_dask.py:323-352). from_json + regexp extraction, all
    in-plan."""
    df = json_docs.withColumn("m", F.from_json(F.col(col), ZARR_META_SCHEMA))
    nums = F.expr(
        "transform(regexp_extract_all(m.transform, '(-?[0-9]+\\\\.?[0-9]*)', 1),"
        " x -> cast(x as double))"
    )
    return df.select(
        "m.*",
        nums.alias("affine6"),
    ).withColumn(
        "affine6", F.slice(F.col("affine6"), 1, 6)
    )


def zarr_metadata_dict(path: str) -> dict:
    """Driver-side convenience twin of the reference function: parse
    one sidecar file to a dict with a 6-tuple transform."""
    with open(path) as f:
        meta = json.load(f)
    vals = []
    for line in meta["transform"].strip().split("\n"):
        vals.extend(float(v.strip()) for v in line.strip("|").split(","))
    meta["transform"] = tuple(vals[:6])
    return meta


# ------------------------------------------------------------------- STAC

# accepted eo:bands common names (public STAC eo extension band list,
# the subset the reference validates via Band.band_range,
# utils/helpers.py:354-357)
STAC_COMMON_NAMES = {
    "coastal", "blue", "green", "red", "rededge", "yellow", "pan",
    "nir", "nir08", "nir09", "cirrus", "swir16", "swir22", "lwir",
    "lwir11", "lwir12",
}


def stac_assets_by_common_name(item_path: str) -> dict:
    """S3: resolve a STAC item's single-band assets by eo:bands
    common_name -> {common_name: {"href": ..., "name": ...}}, in
    asset order (asset_by_common_name parity, utils/helpers.py:
    335-363 — driver-side catalog resolution; the hrefs then feed a
    multi-source union scan)."""
    with open(item_path) as f:
        item = json.load(f)
    out: dict = {}
    for name, asset in item.get("assets", {}).items():
        bands = asset.get("eo:bands", [])
        if len(bands) == 1 and "common_name" in bands[0]:
            cn = bands[0]["common_name"]
            if cn not in STAC_COMMON_NAMES:
                raise ValueError(
                    f'Must be one of the accepted common names. Got "{cn}".'
                )
            out[cn] = {"href": asset.get("href"), "name": name}
    if not out:
        raise ValueError("Common names for assets cannot be retrieved")
    return out


def stac_band_hrefs(item_path: str, bands_requested: list[str]) -> list[str]:
    """Selected band hrefs in request order (geo_inference.py:288-301
    band selection before the union scan)."""
    assets = stac_assets_by_common_name(item_path)
    missing = [b for b in bands_requested if b not in assets]
    if missing:
        raise ValueError(f"requested bands not in item: {missing}")
    return [assets[b]["href"] for b in bands_requested]
