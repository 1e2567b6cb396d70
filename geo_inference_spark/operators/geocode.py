"""Geocoding: (lat, lon) -> hierarchical cell ids, as Arrow UDFs.

North-star stage (a): "geocodes pages into H3 (res 7-10) / S2 cells
via vectorized Arrow UDFs" (BASELINE.json). The UDFs are pandas_udf
(Arrow-batched, no per-row Python); the cell math itself is the pure
numpy in grid/hexgrid.py and grid/s2.py.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from ..grid import hexgrid, s2


def hex_cell_udf(res: int):
    @F.pandas_udf(LongType())
    def _udf(lat: pd.Series, lon: pd.Series) -> pd.Series:
        return pd.Series(
            hexgrid.latlng_to_cell(lat.to_numpy(), lon.to_numpy(), res)
        )

    return _udf


def s2_cell_udf(level: int):
    @F.pandas_udf(LongType())
    def _udf(lat: pd.Series, lon: pd.Series) -> pd.Series:
        return pd.Series(s2.latlng_to_cell(lat.to_numpy(), lon.to_numpy(), level))

    return _udf


def with_cells(
    df: DataFrame,
    lat_col: str = "lat",
    lon_col: str = "lon",
    hex_res: tuple[int, ...] = (7, 8, 9, 10),
    s2_levels: tuple[int, ...] = (12,),
) -> DataFrame:
    """Add cell_h{r} and cell_s2_{l} columns.

    One projection, no shuffle; Catalyst keeps it in the same stage as
    the scan. Cheap enough to recompute rather than persist — at 100TB
    you'd still store cell_h7 as an Iceberg partition column at write
    time (SURVEY.md §4 "partition the table by cell prefix").
    """
    for r in hex_res:
        df = df.withColumn(f"cell_h{r}", hex_cell_udf(r)(F.col(lat_col), F.col(lon_col)))
    for lv in s2_levels:
        df = df.withColumn(
            f"cell_s2_{lv}", s2_cell_udf(lv)(F.col(lat_col), F.col(lon_col))
        )
    return df
