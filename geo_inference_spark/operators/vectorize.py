"""Distributed mask polygonization with cross-tile stitching (R3).

The reference polygonizes the fully assembled mask in one process
(utils/polygon.py:51-63). Distributed, a component may span tiles, so
the pipeline splits the work by what is local vs global:

  mask tiles (ty, tx, s x s uint8)
    -> mapInPandas  per-tile facts (ONE pass, one long schema):
         kind 0  local component (lid, value, global seed pixel)
         kind 1  boundary edge in GLOBAL pixel coords
         kind 2  border-strip cell (axis, border line, index, value)
    -> border cells self-join on the shared border key: equal values
       across a border => the two local components are one global one
    -> driver union-find over local components (the adjacency graph is
       O(tile perimeter), tiny vs the mask area; at petabyte scale
       this becomes an iterative DataFrame connected-components, the
       rest of the pipeline is unchanged)
    -> broadcast (tile, lid) -> gid map, tag edges
    -> SHUFFLE groupBy(gid): reversed duplicate edge pairs (the two
       sides of an internal tile border) cancel; the surviving edge
       set is EXACTLY the global boundary-edge set, so ring chaining,
       hole assignment, affine transform, min_area and simplify all
       run on exact global geometry (chain_rings is order-canonical).

tests/test_vectorize.py proves distributed == mask_to_polygons on the
assembled mask, including components spanning 4+ tiles and holes
crossing tile borders.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..geom.core import douglas_peucker, polygon_area
from ..geom.wkb import polygon_to_wkb
from ..raster.polygonize import (
    IDENTITY,
    boundary_edges,
    chain_rings,
    label_components,
    rings_to_polygon,
    transform_rings,
)

FACTS_SCHEMA = (
    "ty int, tx int, kind tinyint, lid long, value double, "
    "a long, b long, c long, d long"
)
POLY_SCHEMA = "poly_id long, value double, area double, geom_wkb binary"


def tile_facts(pdf_iter, stride: int):
    """Per-tile local pass: components, global-coord edges, border
    strips. Fully vectorized — no per-edge Python (a 512x512 tile has
    O(10^5) boundary edges; the loops this replaces were the per-tile
    hot spot)."""
    s = stride
    cols = ["ty", "tx", "kind", "lid", "value", "a", "b", "c", "d"]
    for pdf in pdf_iter:
        frames = []
        for r in pdf.itertuples():
            ty, tx = int(r.ty), int(r.tx)
            m = np.frombuffer(r.mask, dtype=np.uint8).reshape(s, s)
            lab = label_components(m)
            ox, oy = tx * s, ty * s
            flat_val = m.ravel().astype(np.float64)

            # kind 0: component seeds (label == first pixel flat index)
            lids = np.unique(lab[lab >= 0])
            if len(lids):
                seeds = (oy + lids // s) * (1 << 32) + (ox + lids % s)
                frames.append(
                    _facts_frame(ty, tx, 0, lids, flat_val[lids],
                                 seeds, 0, 0, 0, cols)
                )
            # kind 1: boundary edges in global pixel coords
            e = boundary_edges(lab)  # (n, 5): label, x0, y0, x1, y1
            if len(e):
                frames.append(
                    _facts_frame(ty, tx, 1, e[:, 0], flat_val[e[:, 0]],
                                 e[:, 1] + ox, e[:, 2] + oy,
                                 e[:, 3] + ox, e[:, 4] + oy, cols)
                )
            # kind 2: border strips — vertical borders (axis 0) keyed
            # by (line=x/s, global row), horizontal (axis 1) by
            # (line=y/s, global col); both adjacent tiles emit the key
            for axis, line, idx_base, vals, blids in (
                (0, tx, oy, m[:, 0], lab[:, 0]),
                (0, tx + 1, oy, m[:, -1], lab[:, -1]),
                (1, ty, ox, m[0, :], lab[0, :]),
                (1, ty + 1, ox, m[-1, :], lab[-1, :]),
            ):
                fg = np.nonzero(blids >= 0)[0]
                if len(fg):
                    frames.append(
                        _facts_frame(ty, tx, 2, blids[fg],
                                     vals[fg].astype(np.float64),
                                     axis, line, idx_base + fg, 0, cols)
                    )
        if frames:
            yield pd.concat(frames, ignore_index=True)
        else:
            yield _facts_frame(0, 0, 0, np.empty(0, np.int64),
                               np.empty(0), 0, 0, 0, 0, cols)


def _facts_frame(ty, tx, kind, lid, value, a, b, c, d, cols) -> pd.DataFrame:
    n = len(lid)
    full = lambda v: np.full(n, v, dtype=np.int64) if np.isscalar(v) else np.asarray(v, dtype=np.int64)  # noqa: E731
    return pd.DataFrame(
        {
            "ty": np.full(n, ty, dtype=np.int32),
            "tx": np.full(n, tx, dtype=np.int32),
            "kind": np.full(n, kind, dtype=np.int8),
            "lid": np.asarray(lid, dtype=np.int64),
            "value": np.asarray(value, dtype=np.float64),
            "a": full(a), "b": full(b), "c": full(c), "d": full(d),
        },
        columns=cols,
    )


class _UnionFind:
    def __init__(self):
        self.parent: dict = {}

    def find(self, x):
        p = self.parent.setdefault(x, x)
        while p != x:
            self.parent[x] = p = self.parent.setdefault(p, p)
            x, p = p, self.parent[p]
        return p

    def union(self, x, y):
        rx, ry = self.find(x), self.find(y)
        if rx != ry:
            self.parent[max(rx, ry)] = min(rx, ry)


def polygonize_tiles(
    spark: SparkSession,
    tiles: DataFrame,
    stride: int,
    transform=IDENTITY,
    min_area: float = 0.0,
    simplify: bool = False,
    tolerance: float = 1.0,
) -> DataFrame:
    """(ty, tx, mask) -> (poly_id, value, area, geom_wkb).

    poly_id is the component's first global row-major pixel id —
    stable across any partitioning (O2 determinism).
    """
    s = stride
    facts = tiles.mapInPandas(
        lambda it: tile_facts(it, s), schema=FACTS_SCHEMA
    ).cache()

    comps = facts.filter(F.col("kind") == 0).select(
        "ty", "tx", "lid", "value", F.col("a").alias("seed")
    )

    borders = facts.filter(F.col("kind") == 2).select(
        "ty", "tx", "lid", "value", "a", "b", "c"
    )
    l, r = borders.alias("l"), borders.alias("r")
    adj = (
        l.join(
            r,
            on=[
                F.col("l.a") == F.col("r.a"),
                F.col("l.b") == F.col("r.b"),
                F.col("l.c") == F.col("r.c"),
                F.col("l.value") == F.col("r.value"),
                # strict ordering => each cross-tile pair once, no self-pairs
                (F.col("l.ty") * 2097152 + F.col("l.tx"))
                < (F.col("r.ty") * 2097152 + F.col("r.tx")),
            ],
        )
        .select(
            F.col("l.ty").alias("ty1"), F.col("l.tx").alias("tx1"),
            F.col("l.lid").alias("lid1"),
            F.col("r.ty").alias("ty2"), F.col("r.tx").alias("tx2"),
            F.col("r.lid").alias("lid2"),
        )
        .distinct()
        .collect()
    )

    comp_rows = comps.collect()  # O(#local components)
    uf = _UnionFind()
    seed_of = {}
    val_of = {}
    for row in comp_rows:
        key = (row.ty, row.tx, row.lid)
        uf.find(key)
        seed_of[key] = row.seed
        val_of[key] = float(row.value)
    for row in adj:
        uf.union((row.ty1, row.tx1, row.lid1), (row.ty2, row.tx2, row.lid2))
    gid_seed: dict = {}
    for key in seed_of:
        root = uf.find(key)
        gid_seed[root] = min(gid_seed.get(root, seed_of[key]), seed_of[key])
    mapping = [
        (k[0], k[1], k[2], gid_seed[uf.find(k)], val_of[k])
        for k in seed_of
    ]
    map_df = spark.createDataFrame(
        mapping, schema="ty int, tx int, lid long, gid long, value double"
    )

    edges = facts.filter(F.col("kind") == 1).select(
        "ty", "tx", "lid", "a", "b", "c", "d"
    )
    tagged = edges.join(F.broadcast(map_df), on=["ty", "tx", "lid"])

    min_area_ = float(min_area)
    simplify_ = bool(simplify)
    tol_ = float(tolerance)
    t_ = tuple(float(x) for x in transform)

    def build_polygon(key, pdf: pd.DataFrame):
        e = pdf[["a", "b", "c", "d"]].to_numpy(dtype=np.int64)
        # cancel internal tile-border edges: an edge and its exact
        # reverse (emitted by the two adjacent tiles) both vanish
        fwd = {}
        for i, (x0, y0, x1, y1) in enumerate(e):
            fwd.setdefault((x0, y0, x1, y1), []).append(i)
        drop = np.zeros(len(e), dtype=bool)
        for (x0, y0, x1, y1), idxs in fwd.items():
            rev = fwd.get((x1, y1, x0, y0))
            if rev:
                n = min(len(idxs), len(rev))
                for i in idxs[:n]:
                    drop[i] = True
        keep = e[~drop]
        rings = rings_to_polygon(chain_rings(keep))
        rings = transform_rings(rings, t_)
        area = polygon_area(rings)
        if area < min_area_:
            return pd.DataFrame(
                columns=["poly_id", "value", "area", "geom_wkb"]
            ).astype({"poly_id": "int64", "value": "float64", "area": "float64"})
        if simplify_:
            rings = [douglas_peucker(rg, tol_) for rg in rings]
            area = polygon_area(rings)
        return pd.DataFrame(
            {
                "poly_id": [int(key[0])],
                "value": [float(pdf["value"].iloc[0])],
                "area": [area],
                "geom_wkb": [polygon_to_wkb(rings)],
            }
        )

    return tagged.groupBy("gid").applyInPandas(build_polygon, POLY_SCHEMA)
