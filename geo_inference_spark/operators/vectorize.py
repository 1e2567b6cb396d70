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
    -> connected components over the BORDER graph only (never the
       full O(#components) node set — that driver union-find was the
       round-1 scale-killer #2): union-find on the collected
       perimeter-sized graph when small, distributed hash-min label
       propagation + pointer jumping (O(log diameter) rounds) above
       a measured edge-count threshold
    -> (tile, lid) -> gid map joined onto edges (broadcast when the
       component count is small, shuffle join otherwise)
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


def _pack_nid(ty, tx, lid):
    """(ty, tx, lid) -> one 63-bit node id (ty, tx < 2^21, lid < 2^21
    i.e. stride <= 1448)."""
    return (
        F.shiftleft(
            F.shiftleft(ty.cast("long"), 21) + tx.cast("long"), 21
        )
        + lid.cast("long")
    )


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    max_iters: int = 64,
    driver_threshold: int = 5_000_000,
    identity_seeds: bool = False,
) -> DataFrame:
    """CC over the BORDER graph: nodes (nid, seed), undirected edges
    (nid1, nid2) -> (nid, gid) with gid = min seed of the component.

    Only components that touch a tile border can merge, so the
    algorithm never materializes the full node set (O(mask area /
    component size)); it works on the border graph, which is
    O(tile perimeter) — ~3 orders of magnitude smaller. Interior
    components keep gid = seed via the final left join.

    ``identity_seeds=True`` declares seed == nid for every node (the
    dedup-clusters shape); the border nodes' seeds are then known from
    the edge endpoints alone, so the driver regime skips the
    nodes-join collect job entirely.

    Two regimes by measured edge count:
    * border graph fits the driver comfortably (< driver_threshold
      edges) -> classic union-find on the collected border graph —
      one collect of perimeter-sized data, microseconds of CPU;
    * above it -> distributed hash-min label propagation with pointer
      jumping (the O(log diameter) doubling of Kiveris et al.'s star
      operations), on RDDs: Catalyst recomputes plan statistics
      inside every DataFrame localCheckpoint and a per-round plan
      with ~5 join leaves COMPOUNDS the size estimate round over
      round — by round ~8 the sizeInBytes BigInteger has millions of
      digits and stats estimation burns minutes of driver CPU
      (measured). RDD localCheckpoint truncates lineage with no stats
      machinery — the classic reason iterative graph algorithms
      (GraphX, Pregel) live on RDDs.
    """
    spark = nodes.sparkSession
    # regime gate: a cheap count() first — collecting threshold+1 Row
    # objects to decide the graph is "small" could itself OOM the
    # driver the gate exists to protect (ADVICE r2). edges is persisted
    # so the count's scan is reused by whichever branch runs next.
    edges = edges.persist()
    n_edges = edges.count()

    if n_edges <= driver_threshold:
        # Arrow toPandas instead of collect(): Row-object pickling of
        # ~1M edges cost seconds; the Arrow path is one columnar
        # transfer. Labeling is vectorized min-label propagation with
        # pointer jumping (numpy, O(E) per round, O(log n) rounds) —
        # the per-edge Python union-find loop was the driver hot spot.
        ep = edges.toPandas()
        edges.unpersist()
        e1 = ep.iloc[:, 0].to_numpy(np.int64)
        e2 = ep.iloc[:, 1].to_numpy(np.int64)
        ids = np.unique(np.concatenate([e1, e2]))
        if identity_seeds:
            bn_arr, bseed_arr = ids, ids
        else:
            bdf = spark.createDataFrame(
                pd.DataFrame(
                    {"nid": ids if len(ids) else np.array([-1], np.int64)}
                )
            )
            bs = nodes.join(bdf, "nid").toPandas()
            bn_arr = bs["nid"].to_numpy(np.int64)
            bseed_arr = bs["seed"].to_numpy(np.int64)
        m = len(ids)
        a = np.searchsorted(ids, e1)
        b = np.searchsorted(ids, e2)
        lbl = np.arange(m, dtype=np.int64)
        while True:
            new = lbl.copy()
            mn = np.minimum(lbl[a], lbl[b])
            np.minimum.at(new, a, mn)
            np.minimum.at(new, b, mn)
            while True:  # pointer jumping to the round's fixpoint
                nn = new[new]
                if np.array_equal(nn, new):
                    break
                new = nn
            if np.array_equal(new, lbl):
                break
            lbl = new
        # gid = min seed over each component's border nodes
        bn = bn_arr
        bseed = bseed_arr
        bidx = np.searchsorted(ids, bn)
        comp_min = np.full(m, np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(comp_min, lbl[bidx], bseed)
        mapping = pd.DataFrame(
            {"nid": bn, "lbl": comp_min[lbl[bidx]]}
            if len(bn)
            else {"nid": np.array([-1], np.int64),
                  "lbl": np.array([-1], np.int64)}
        )
        gids = spark.createDataFrame(mapping, schema="nid long, lbl long")
        return nodes.join(gids, "nid", "left").select(
            "nid", F.coalesce(F.col("lbl"), F.col("seed")).alias("gid")
        )

    # big regime: the count above also sizes the partitioning
    # partition count sized to the border graph, NOT inherited from
    # upstream — every Python-RDD task costs a worker round-trip, so
    # a tiny graph on many partitions is pure overhead
    p = max(4, min(256, n_edges // 2_000_000))
    e = edges.rdd.map(lambda r: (r[0], r[1]))
    both = (
        e.union(e.map(lambda kv: (kv[1], kv[0]))).distinct(p).cache()
    )
    if identity_seeds:  # seed == nid: no nodes join needed
        labels = both.keys().distinct(p).map(lambda n: (n, n)).cache()
    else:
        border = both.keys().distinct(p).map(lambda n: (n, None))
        labels = (
            nodes.rdd.map(lambda r: (r[0], r[1]))
            .join(border, p)
            .mapValues(lambda v: v[0])
            .cache()
        )
    labels.localCheckpoint()
    seeds = labels.map(lambda kv: (kv[1], kv[0])).cache()  # seed -> owner nid
    for _ in range(max_iters):
        # hash-min: min label over neighbors
        msgs = (
            both.join(labels, p)
            .map(lambda kv: (kv[1][0], kv[1][1]))
            .reduceByKey(min, p)
        )
        # pointer jump: label of the node that OWNS my current label
        jump = (
            labels.map(lambda kv: (kv[1], kv[0]))  # (lbl, nid)
            .join(seeds, p)  # (lbl, (nid, onid))
            .map(lambda kv: (kv[1][1], kv[1][0]))  # (onid, nid)
            .join(labels, p)  # (onid, (nid, olbl))
            .map(lambda kv: (kv[1][0], kv[1][1]))  # (nid, olbl)
        )
        # new label = min over (own, neighbor-min, jump) — msgs/jump
        # key sets are subsets of labels', so the union covers all
        upd = labels.union(msgs).union(jump).reduceByKey(min, p).cache()
        upd.localCheckpoint()  # per-round lineage stays O(1)
        changed = (
            upd.join(labels, p).filter(lambda kv: kv[1][0] < kv[1][1]).count()
        )
        labels = upd
        if changed == 0:
            gids = spark.createDataFrame(
                labels.map(lambda kv: (kv[0], kv[1])), schema="nid long, lbl long"
            )
            edges.unpersist()
            return nodes.join(gids, "nid", "left").select(
                "nid", F.coalesce(F.col("lbl"), F.col("seed")).alias("gid")
            )
    raise RuntimeError(f"connected_components: no fixpoint in {max_iters} rounds")


def polygonize_tiles(
    spark: SparkSession,
    tiles: DataFrame,
    stride: int,
    transform=IDENTITY,
    min_area: float = 0.0,
    simplify: bool = False,
    tolerance: float = 1.0,
    cc_driver_threshold: int = 5_000_000,
) -> DataFrame:
    """(ty, tx, mask) -> (poly_id, value, area, geom_wkb).

    poly_id is the component's first global row-major pixel id —
    stable across any partitioning (O2 determinism).
    """
    s = stride
    facts = tiles.mapInPandas(
        lambda it: tile_facts(it, s), schema=FACTS_SCHEMA
    ).cache()
    # ONE eager pass fills the cache and counts components: without
    # it the adj self-join's two exchange builds race the cold cache
    # and each recomputes the full scan+stitch+facts upstream
    # (event-log measured: two concurrent full-fill jobs), and the
    # broadcast decision needed its own comps.count() job later.
    kind_counts = {
        int(r["kind"]): int(r["n"])
        for r in facts.groupBy("kind")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    n_comps = kind_counts.get(0, 0)

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
            _pack_nid(F.col("l.ty"), F.col("l.tx"), F.col("l.lid")).alias("nid1"),
            _pack_nid(F.col("r.ty"), F.col("r.tx"), F.col("r.lid")).alias("nid2"),
        )
        .distinct()
    )

    nodes = comps.withColumn(
        "nid", _pack_nid(F.col("ty"), F.col("tx"), F.col("lid"))
    )
    gids = connected_components(
        nodes.select("nid", "seed"), adj, driver_threshold=cc_driver_threshold
    )
    map_df = nodes.join(gids, "nid").select("ty", "tx", "lid", "gid", "value")
    # the map is O(#local components); broadcast it while that is
    # small, fall back to a shuffle join on fragmented petabyte masks
    # (n_comps comes from the eager kind-counts pass above)
    if n_comps <= 2_000_000:
        map_df = F.broadcast(map_df)

    edges = facts.filter(F.col("kind") == 1).select(
        "ty", "tx", "lid", "a", "b", "c", "d"
    )
    tagged = edges.join(map_df, on=["ty", "tx", "lid"])

    min_area_ = float(min_area)
    simplify_ = bool(simplify)
    tol_ = float(tolerance)
    t_ = tuple(float(x) for x in transform)

    def build_polygon(key, pdf: pd.DataFrame):
        e = pdf[["a", "b", "c", "d"]].to_numpy(dtype=np.int64)
        # cancel internal tile-border edges: an edge and its exact
        # reverse (emitted by the two adjacent tiles) both vanish.
        # Vectorized multiset subtraction (the per-edge Python dict
        # loop here was the r2 polygonize hot spot: a continent-sized
        # component lands in ONE task, so the constant factor is the
        # wall clock): unique over fwd ∪ rev keys, per-key counts, and
        # each surviving key is re-emitted count_fwd - min(fwd, rev)
        # times. Copies of a key are identical rows, so WHICH copies
        # survive is immaterial, and chain_rings is order-canonical.
        uniq, inv = np.unique(
            np.concatenate([e, e[:, [2, 3, 0, 1]]]), axis=0, return_inverse=True
        )
        n = len(e)
        fcnt = np.bincount(inv[:n], minlength=len(uniq))
        rcnt = np.bincount(inv[n:], minlength=len(uniq))
        keep = np.repeat(
            np.arange(len(uniq)), fcnt - np.minimum(fcnt, rcnt)
        )
        keep = uniq[keep]
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

    # explicit-numPartitions repartition by gid: AQE would otherwise
    # coalesce the tiny tagged shuffle to ONE post-shuffle partition
    # and every component's ring chaining would run sequentially in a
    # single python task (measured 1.48 s of a 4.7 s query in one
    # 1-task stage). A user repartition with an explicit count is
    # exempt from AQE coalescing, and HashPartitioning(gid) satisfies
    # the groupBy's clustering requirement, so no second exchange is
    # added. Same value for any partitioning — groups stay whole.
    par = spark.sparkContext.defaultParallelism
    return (
        tagged.repartition(par, "gid")
        .groupBy("gid")
        .applyInPandas(build_polygon, POLY_SCHEMA)
    )
