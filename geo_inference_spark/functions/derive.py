"""Cross-engine deterministic derivations.

The driver's correctness gate runs each Spark query against a DuckDB
oracle on the same parquet (TESTDATA.md). Geospatial queries need
(lat, lon) for the driver's `documents` table; these formulas are pure
int64/double arithmetic that Spark SQL and DuckDB evaluate
bit-identically, so both sides derive identical coordinates.
"""

# Knuth multiplicative hashes mod 2^32 -> uniform doubles.
LON_SQL = (
    "(((doc_id * 2654435761) % 4294967296) / 4294967296.0) * 360.0 - 180.0"
)
LAT_SQL = (
    "(((doc_id * 2246822519 + 3266489917) % 4294967296) / 4294967296.0)"
    " * 170.0 - 85.0"
)

# 45-degree world grid area id (matches sources.pages.admin_grid_polygons)
GRID_AREA_SQL = (
    "cast(floor((({lon}) + 180.0) / 45.0) as bigint) * 4 "
    "+ cast(floor((({lat}) + 90.0) / 45.0) as bigint)"
).format(lon=LON_SQL, lat=LAT_SQL)
