"""Output sinks (SURVEY.md §2.1 S8-S11).

The reference writes files (GeoTIFF mask, GeoJSON, YOLO csv, COCO
json). Here the canonical sink is a table (parquet dir locally,
Iceberg in production); the file formats are provided for parity and
export.
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType


def write_mask_tiles(tiles: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S8: mask tile table (ty, tx, mask). Parquet stand-in for
    ``df.writeTo('masks').append()``; partitioned by ty for
    row-range pruning on reads."""
    tiles.write.mode(mode).partitionBy("ty").parquet(path)


def _feature_udf():
    from ..geom.wkb import parse_wkb

    @F.pandas_udf(StringType())
    def feature(wkb: pd.Series, value: pd.Series) -> pd.Series:
        out = []
        for b, v in zip(wkb, value):
            kind, payload = parse_wkb(bytes(b))
            if kind == "polygon":
                geometry = {
                    "type": "Polygon",
                    "coordinates": [r.tolist() for r in payload],
                }
            else:
                geometry = {
                    "type": "MultiPolygon",
                    "coordinates": [
                        [r.tolist() for r in poly] for poly in payload
                    ],
                }
            out.append(
                json.dumps(
                    {
                        "type": "Feature",
                        "properties": {"value": float(v)},
                        "geometry": geometry,
                    }
                )
            )
        return pd.Series(out)

    return feature


def write_geojson_features(polygons: DataFrame, path: str) -> None:
    """S9 scale path: newline-delimited GeoJSON Features (geojsonl),
    one text file per partition — the distributed sink for feature
    sets too large for a single FeatureCollection document."""
    polygons.select(
        _feature_udf()(F.col("geom_wkb"), F.col("value")).alias("feature")
    ).write.mode("overwrite").text(path)


def write_geojson(polygons: DataFrame, path: str) -> None:
    """S9: a standard GeoJSON FeatureCollection DOCUMENT — one JSON
    object any GeoJSON reader can parse. Like COCO (S11) this format
    is a single document by definition, so assembly is driver-side;
    use write_geojson_features for web-scale feature sets."""
    feats = polygons.select(
        _feature_udf()(F.col("geom_wkb"), F.col("value")).alias("feature")
    ).collect()
    with open(path, "w") as f:
        f.write('{"type":"FeatureCollection","features":[')
        f.write(",".join(r.feature for r in feats))
        f.write("]}")


def write_yolo_csv(yolo: DataFrame, path: str) -> None:
    """S10: space-delimited, no header, columns [value, x, y, w, h]
    (utils/polygon.py:148)."""
    yolo.select("value", "x", "y", "w", "h").write.mode("overwrite").csv(
        path, sep=" ", header=False
    )


def write_coco_json(doc: dict, path: str) -> None:
    """S11: single COCO json document (driver-side by design)."""
    with open(path, "w") as f:
        json.dump(doc, f)
