"""CRS checks and bounds reprojection (SURVEY.md §2.8 F10/F11).

The reference leans on pyproj/rasterio (utils/geo.py:83-103
check_crs; transform_bounds calls in utils/geo_transforms.py:237-252).
pyproj is not in this container, so the two CRSs the engine actually
uses — EPSG:4326 (lon/lat degrees) and EPSG:3857 (web mercator) — are
implemented from the public spherical-mercator formulas; anything
else raises, loudly, rather than silently misprojecting.
"""

from __future__ import annotations

import math
import re

_R = 6378137.0  # WGS84 spherical earth radius used by EPSG:3857

_EPSG_RE = re.compile(r"(?:EPSG:)?(\d+)$", re.IGNORECASE)


def check_crs(crs) -> str:
    """Normalize a CRS spec to 'EPSG:<code>' (check_crs parity:
    accepts int codes and 'EPSG:x' strings)."""
    if isinstance(crs, int):
        return f"EPSG:{crs}"
    if isinstance(crs, str):
        m = _EPSG_RE.match(crs.strip())
        if m:
            return f"EPSG:{int(m.group(1))}"
    raise ValueError(f"unsupported CRS spec: {crs!r}")


def _to_3857(lon: float, lat: float) -> tuple[float, float]:
    x = math.radians(lon) * _R
    y = math.log(math.tan(math.pi / 4 + math.radians(lat) / 2)) * _R
    return x, y


def _to_4326(x: float, y: float) -> tuple[float, float]:
    lon = math.degrees(x / _R)
    lat = math.degrees(2 * math.atan(math.exp(y / _R)) - math.pi / 2)
    return lon, lat


def transform_bounds(
    src_crs, dst_crs, minx: float, miny: float, maxx: float, maxy: float
) -> tuple[float, float, float, float]:
    """Reproject a bbox between EPSG:4326 and EPSG:3857 (F11).

    Corner-based (sufficient for the axis-aligned, mid-latitude boxes
    the pipelines use); identity when src == dst.
    """
    src, dst = check_crs(src_crs), check_crs(dst_crs)
    if src == dst:
        return (minx, miny, maxx, maxy)
    if (src, dst) == ("EPSG:4326", "EPSG:3857"):
        x0, y0 = _to_3857(minx, miny)
        x1, y1 = _to_3857(maxx, maxy)
    elif (src, dst) == ("EPSG:3857", "EPSG:4326"):
        x0, y0 = _to_4326(minx, miny)
        x1, y1 = _to_4326(maxx, maxy)
    else:
        raise ValueError(f"unsupported reprojection {src} -> {dst}")
    return (min(x0, x1), min(y0, y1), max(x0, x1), max(y0, y1))
