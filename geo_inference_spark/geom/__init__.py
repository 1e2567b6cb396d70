"""Pure-numpy geometry kernel.

This container has no shapely/GEOS, so the engine carries its own
vectorized geometry primitives. Geometries are represented as:

- ``ring``: (N, 2) float64 ndarray, closed (first == last vertex).
- ``polygon``: list[ring] — ring 0 is the exterior, rest are holes.
- ``multipolygon``: list[polygon].

Wire format between Spark rows is WKB (BinaryType columns); see
:mod:`geo_inference_spark.geom.wkb`.
"""

from .core import (  # noqa: F401
    affine_transform_coords,
    bounds_of_rings,
    clip_polygon_rect,
    douglas_peucker,
    invert_affine,
    points_in_polygon,
    polygon_area,
    ring_signed_area,
    segments_intersect_bbox,
)
from .wkb import (  # noqa: F401
    geom_bounds_wkb,
    multipolygon_to_wkb,
    parse_wkb,
    point_to_wkb,
    polygon_to_wkb,
    wkt_of,
)
