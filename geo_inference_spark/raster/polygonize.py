"""Pure-numpy mask polygonization (rasterio.features.shapes stand-in).

The reference polygonizes the full assembled mask with GDAL
(``features.shapes(raster, transform=..., mask=raster>0)``,
/root/reference/geo_inference/utils/polygon.py:51-63). rasterio is
not available here, so this module implements the same contract from
scratch:

* 4-connected components of equal pixel value (value > 0 only);
* one polygon per component: exterior ring + hole rings, vertices on
  the integer pixel-corner lattice;
* exterior rings traced with the component interior on the LEFT
  (positive shoelace in (col,row) coords), holes opposite — so
  area/orientation math downstream is consistent;
* coordinates mapped through the raster affine transform
  ``x = a*col + b*row + c ; y = d*col + e*row + f``.

Self-touching "pinch" vertices (checkerboard corners where a hole
meets the exterior or another hole) are first traced as a single
ring passing through the vertex twice (sharpest-left turn rule),
then HEALED by splitting at repeated vertices
(``split_ring_at_repeats``) — the same node-split shapely's
``buffer(0.0)`` applies in the reference
(utils/polygon.py:60-62), so every emitted ring is simple and
component area equals its pixel count (property-tested on masks
constructed to pinch).

Everything here is per-tile-callable: component labels, boundary
edges and border strips are local facts, which is what lets
operators/vectorize.py distribute the computation and stitch at tile
borders.
"""

from __future__ import annotations

import numpy as np

from ..geom.core import polygon_area, ring_signed_area

Affine6 = tuple  # (a, b, c, d, e, f)
IDENTITY: Affine6 = (1.0, 0.0, 0.0, 0.0, 1.0, 0.0)


# ------------------------------------------------------------- labeling

def label_components(values: np.ndarray) -> np.ndarray:
    """4-connected components of equal positive value.

    Returns int32 labels, -1 for background (value <= 0). Labels are
    the flat index of the component's first (row-major) pixel —
    deterministic, independent of traversal order.

    Vectorized min-label propagation with pointer jumping (no scipy):
    each pass hooks every pixel to the minimum label among its equal
    neighbors, then compresses the label forest; converges in
    O(log diameter) passes for typical masks.
    """
    v = np.asarray(values)
    h, w = v.shape
    fg = v > 0
    lab = np.arange(h * w, dtype=np.int64).reshape(h, w)
    lab[~fg] = -1

    same_r = fg[:, 1:] & fg[:, :-1] & (v[:, 1:] == v[:, :-1])
    same_d = fg[1:, :] & fg[:-1, :] & (v[1:, :] == v[:-1, :])

    while True:
        new = lab.copy()
        # hook: min over 4-neighbors with equal value
        new[:, :-1] = np.where(same_r & (lab[:, 1:] < new[:, :-1]), lab[:, 1:], new[:, :-1])
        new[:, 1:] = np.where(same_r & (lab[:, :-1] < new[:, 1:]), lab[:, :-1], new[:, 1:])
        new[:-1, :] = np.where(same_d & (lab[1:, :] < new[:-1, :]), lab[1:, :], new[:-1, :])
        new[1:, :] = np.where(same_d & (lab[:-1, :] < new[1:, :]), lab[:-1, :], new[1:, :])
        # pointer jumping: compress via lab-as-forest
        flat = new.ravel()
        ok = flat >= 0
        for _ in range(2):
            flat[ok] = np.minimum(flat[ok], flat[flat[ok]])
        new = flat.reshape(h, w)
        if np.array_equal(new, lab):
            break
        lab = new
    return lab.astype(np.int64)


# ------------------------------------------------------------- edges

# directed boundary edges keep the component interior on the LEFT in
# (x=col, y=row) coords: top L->R, right T->B, bottom R->L, left B->T
# ... with y pointing DOWN that is counter-clockwise on screen?  The
# invariant that matters: exterior rings get positive shoelace area in
# (col,row) coords and holes negative (tests pin this).
_EDGE_DIRS = {
    "top": ((0, 0), (1, 0)),
    "right": ((1, 0), (1, 1)),
    "bottom": ((1, 1), (0, 1)),
    "left": ((0, 1), (0, 0)),
}


def boundary_edges(lab: np.ndarray) -> np.ndarray:
    """Directed unit boundary edges of every component.

    Returns int64 array (n, 5): [label, x0, y0, x1, y1] where an edge
    exists wherever a labeled pixel borders a pixel of a different
    label (or the array edge). Orientation keeps the component
    interior on the left.
    """
    h, w = lab.shape
    pad = np.full((h + 2, w + 2), -2, dtype=lab.dtype)
    pad[1:-1, 1:-1] = lab
    core = pad[1:-1, 1:-1]
    rows = []
    specs = {
        "top": pad[:-2, 1:-1],
        "bottom": pad[2:, 1:-1],
        "left": pad[1:-1, :-2],
        "right": pad[1:-1, 2:],
    }
    for side, nb in specs.items():
        m = (core >= 0) & (nb != core)
        if not m.any():
            continue
        r, c = np.nonzero(m)
        (dx0, dy0), (dx1, dy1) = _EDGE_DIRS[side]
        rows.append(
            np.stack(
                [core[r, c], c + dx0, r + dy0, c + dx1, r + dy1], axis=1
            )
        )
    if not rows:
        return np.empty((0, 5), dtype=np.int64)
    return np.concatenate(rows).astype(np.int64)


# turn priority: for incoming direction d, try left turn, straight,
# right turn (sharpest-left first) — resolves pinch vertices without
# ring crossings. Directions: 0=+x, 1=+y, 2=-x, 3=-y.
_DIR_OF = {(1, 0): 0, (0, 1): 1, (-1, 0): 2, (0, -1): 3}
_VEC_OF = {v: k for k, v in _DIR_OF.items()}


def chain_rings(edges: np.ndarray) -> list[np.ndarray]:
    """Chain directed edges (n, 4) [x0,y0,x1,y1] into closed rings.

    Every edge is used exactly once. At multi-edge vertices the
    sharpest-left continuation (relative to the incoming direction)
    is taken, producing non-crossing rings with pinch vertices.

    Edges are canonicalized (lexicographic sort) first, so the output
    is a pure function of the edge SET — the distributed path
    (operators/vectorize.py), whose shuffle order is arbitrary,
    produces rings identical to the single-pass path.
    """
    if len(edges) == 0:
        return []
    edges = edges[np.lexsort((edges[:, 3], edges[:, 2], edges[:, 1], edges[:, 0]))]
    by_start: dict[tuple, list[int]] = {}
    for i, (x0, y0, _, _) in enumerate(edges[:, :4]):
        by_start.setdefault((int(x0), int(y0)), []).append(i)
    used = np.zeros(len(edges), dtype=bool)
    rings = []
    for i0 in range(len(edges)):
        if used[i0]:
            continue
        ring = [(int(edges[i0, 0]), int(edges[i0, 1]))]
        cur = i0
        while True:
            used[cur] = True
            x1, y1 = int(edges[cur, 2]), int(edges[cur, 3])
            ring.append((x1, y1))
            if (x1, y1) == ring[0]:
                break
            cands = [j for j in by_start.get((x1, y1), ()) if not used[j]]
            if not cands:
                break  # open chain (cannot happen for valid input)
            if len(cands) == 1:
                cur = cands[0]
            else:
                dx = x1 - int(edges[cur, 0])
                dy = y1 - int(edges[cur, 1])
                din = _DIR_OF[(dx, dy)]
                # sharpest left first: turn -1 (left), 0, +1 (right)
                best = None
                for turn in (-1, 0, 1):
                    want = _VEC_OF[(din + turn) % 4]
                    for j in cands:
                        if (
                            int(edges[j, 2]) - x1 == want[0]
                            and int(edges[j, 3]) - y1 == want[1]
                        ):
                            best = j
                            break
                    if best is not None:
                        break
                cur = best if best is not None else cands[0]
        rings.append(np.array(ring, dtype=np.float64))
    return rings


def split_ring_at_repeats(ring: np.ndarray) -> list[np.ndarray]:
    """Split a self-touching ring into simple rings at repeated
    vertices — the node-split shapely's ``buffer(0)`` applies to the
    reference's GDAL output (utils/polygon.py:60-62). Walk the ring;
    whenever the current vertex was already visited, the loop since
    its first visit is extracted as its own closed ring and the walk
    resumes from that vertex. Orientation of each sub-ring is the
    traversal's own, so an extracted hole loop keeps its negative
    signed area. Vertices are exact lattice points (pre-transform),
    so tuple equality is exact. O(n).

    Fast path: almost no ring pinches, so duplicate detection is a
    single vectorized np.unique over the vertices-as-complex view —
    the per-vertex Python walk below runs only on actual pinches
    (without this gate the walk re-cost the whole polygonize stage
    ~2x at sf0.1)."""
    arr = ring[:-1]
    as_complex = arr[:, 0] + 1j * arr[:, 1]
    if np.unique(as_complex).size == len(arr):
        return [ring]
    pts = [(float(x), float(y)) for x, y in arr]
    out: list[np.ndarray] = []
    path: list[tuple] = []
    index: dict[tuple, int] = {}
    for p in pts:
        if p in index:
            i = index[p]
            loop = path[i:] + [p]
            if len(loop) >= 4:  # >= 3 distinct vertices
                out.append(np.array(loop, dtype=np.float64))
            for q in path[i + 1:]:
                del index[q]
            del path[i + 1:]  # p stays as the walk's position
        else:
            index[p] = len(path)
            path.append(p)
    out.append(np.array(path + [path[0]], dtype=np.float64))
    return out


def rings_to_polygon(rings: list[np.ndarray]) -> list[np.ndarray]:
    """Order a component's rings as [exterior, holes...], after
    splitting any self-touching ring at its pinch vertices
    (buffer(0) parity with the reference — a 4-connected component's
    pinches always merge hole/exterior loops, so the healed set is
    one exterior plus simple holes, never two exteriors).

    Exterior = the ring with the largest |area| (positive orientation
    by construction); holes follow in traced order.
    """
    rings = [s for r in rings for s in split_ring_at_repeats(r)]
    if len(rings) == 1:
        return rings
    areas = [abs(ring_signed_area(r)) for r in rings]
    ext = int(np.argmax(areas))
    return [rings[ext]] + [r for i, r in enumerate(rings) if i != ext]


def transform_rings(rings: list[np.ndarray], t: Affine6) -> list[np.ndarray]:
    a, b, c, d, e, f = t
    out = []
    for r in rings:
        x, y = r[:, 0], r[:, 1]
        out.append(np.stack([a * x + b * y + c, d * x + e * y + f], axis=1))
    return out


# ------------------------------------------------------------- public

def mask_to_polygons(
    values: np.ndarray,
    transform: Affine6 = IDENTITY,
    min_area: float = 0.0,
    simplify: bool = False,
    tolerance: float = 1.0,
) -> list[tuple[list[np.ndarray], float]]:
    """Full-mask polygonize: [(rings, pixel_value), ...].

    Contract of mask_to_poly_geojson (utils/polygon.py:20-71): only
    value>0 regions, min_area filtered AFTER transform, optional
    Douglas-Peucker simplify. Order: by component's first (row-major)
    pixel — deterministic (O2 stable-order requirement, SURVEY §2.6).
    """
    from ..geom.core import douglas_peucker

    lab = label_components(values)
    edges = boundary_edges(lab)
    out = []
    for comp, comp_edges in split_edges_by_label(edges):
        rings = rings_to_polygon(chain_rings(comp_edges))
        rings = transform_rings(rings, transform)
        if polygon_area(rings) < min_area:
            continue
        if simplify:
            rings = [douglas_peucker(r, tolerance) for r in rings]
        r0, c0 = divmod(int(comp), values.shape[1])
        out.append((rings, float(values[r0, c0])))
    return out


def split_edges_by_label(edges: np.ndarray):
    """Yield (label, edges (n,4)) groups in ascending label order —
    one sort, linear split."""
    if len(edges) == 0:
        return
    order = np.argsort(edges[:, 0], kind="stable")
    se = edges[order]
    labels, starts = np.unique(se[:, 0], return_index=True)
    bounds = list(starts) + [len(se)]
    for i, lb in enumerate(labels):
        yield int(lb), se[bounds[i] : bounds[i + 1], 1:]
