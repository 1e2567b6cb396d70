"""The 9 positional Hann stitching windows.

The reference builds a 2-D Hann taper per patch and, at image edges,
replaces the taper by 1.0 on the sides with no neighbor so overlap
weights still sum correctly (/root/reference/geo_inference/
geo_dask.py:52-182; golden spec re-derived in
/root/reference/tests/test_geo_dask.py:66-121).

Identity used here instead of the reference's tile/block pasting:
with ``h = hann(M, sym=False)`` we have ``h[M//2] == 1.0``, so every
one of the 9 variants is the outer product of two *clamped* 1-D Hann
vectors:

    row factor: top edge    -> h[max(i, step)]   (flat-1 upper half)
                bottom edge -> h[min(i, step)]   (flat-1 lower half)
                interior    -> h[i]
    col factor: same with left/right.

tests/test_windows.py proves this equals the reference's block
construction exactly.
"""

from __future__ import annotations

import numpy as np


def hann(m: int) -> np.ndarray:
    """Periodic (sym=False) Hann window of length m."""
    n = np.arange(m, dtype=np.float64)
    return 0.5 - 0.5 * np.cos(2.0 * np.pi * n / m)


def _axis_factor(m: int, edge: str) -> np.ndarray:
    """1-D taper: 'lo' = flat 1 toward index 0, 'hi' = flat 1 toward
    index m-1, 'mid' = plain Hann."""
    h = hann(m)
    step = m >> 1
    idx = np.arange(m)
    if edge == "lo":
        return h[np.maximum(idx, step)]
    if edge == "hi":
        return h[np.minimum(idx, step)]
    return h


def window_2d(m: int, row_edge: str = "mid", col_edge: str = "mid") -> np.ndarray:
    """2-D positional window = outer(row factor, col factor)."""
    return np.outer(_axis_factor(m, row_edge), _axis_factor(m, col_edge))


def select_position(cy: int, cx: int, ny: int, nx: int) -> tuple[str, str] | None:
    """(row_edge, col_edge) for patch at chunk-location (cy, cx).

    Reproduces the reference's branch ORDER and boundaries exactly
    (geo_dask.py:58-182): the last real patch column is nx-2 (patches
    at nx-1 have no right halo and yield zeros), hence the ``>= n-2``
    tests; an unmatched position returns None, which the caller turns
    into a zero output — same as the reference's untouched
    ``np.empty((1,1))`` failing its shape check.
    """
    if cx >= nx - 2 and cy == 0:
        return ("lo", "hi")  # top-right
    if cx >= nx - 2 and 0 < cy < ny - 2:
        return ("mid", "hi")  # right edge
    if cx >= nx - 2 and cy >= ny - 2:
        return ("hi", "hi")  # bottom-right
    if cy >= ny - 2 and 0 < cx < nx - 2:
        return ("hi", "mid")  # bottom edge
    if cy >= ny - 2 and cx == 0:
        return ("hi", "lo")  # bottom-left
    if cy == 0 and cx == 0:
        return ("lo", "lo")  # top-left
    if cx == 0 and 0 < cy < ny:
        return ("mid", "lo")  # left edge
    if 0 < cx < nx - 2 and cy == 0:
        return ("lo", "mid")  # top edge
    if 0 < cy < ny - 2 and 0 < cx < nx - 2:
        return ("mid", "mid")  # interior
    return None


def positional_window(cy: int, cx: int, ny: int, nx: int, m: int) -> np.ndarray | None:
    """The m x m stitch window for patch (cy, cx) of an ny x nx chunk
    grid, or None when the position is degenerate."""
    pos = select_position(cy, cx, ny, nx)
    if pos is None:
        return None
    return window_2d(m, pos[0], pos[1])
