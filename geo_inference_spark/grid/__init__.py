"""Hierarchical cell grids for geocoding, PIP-join covers, and kNN.

Two systems, one API (SURVEY.md §2.11 "Geocode/H3"):

- :mod:`hexgrid` — a pure-numpy hexagonal grid with H3-shaped algebra
  (latlng_to_cell, k_ring, parent, polyfill). Cell ids are int64. The
  real `h3` package is used instead when importable (it is not baked
  into this container); the hex fallback preserves every property the
  engine relies on (hierarchy, k-ring adjacency, ~7x area scaling per
  resolution).
- :mod:`s2` — the real S2 cell-id scheme (quadratic ST projection +
  Hilbert curve on 6 cube faces), implemented from the public spec,
  fully vectorized.
"""

try:  # pragma: no cover - not present in this container
    import h3 as _h3  # noqa: F401

    HAS_REAL_H3 = True
except ImportError:
    HAS_REAL_H3 = False

from . import hexgrid, s2  # noqa: F401,E402
