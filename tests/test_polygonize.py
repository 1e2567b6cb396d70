"""mask_to_polygons contract tests (features.shapes stand-in,
utils/polygon.py:20-71 semantics)."""

import numpy as np

from geo_inference_spark.geom.core import polygon_area, ring_signed_area
from geo_inference_spark.raster.polygonize import (
    boundary_edges,
    chain_rings,
    label_components,
    mask_to_polygons,
)


def test_single_pixel():
    m = np.zeros((3, 3), dtype=np.uint8)
    m[1, 1] = 2
    [(rings, val)] = mask_to_polygons(m)
    assert val == 2.0
    np.testing.assert_array_equal(
        rings[0], [[1, 1], [2, 1], [2, 2], [1, 2], [1, 1]]
    )


def test_donut_hole_orientation():
    m = np.zeros((5, 5), dtype=np.uint8)
    m[1:4, 1:4] = 1
    m[2, 2] = 0
    [(rings, val)] = mask_to_polygons(m)
    assert len(rings) == 2
    assert ring_signed_area(rings[0]) == 9.0  # exterior positive
    assert ring_signed_area(rings[1]) == -1.0  # hole negative
    assert polygon_area(rings) == 8.0


def test_diagonal_pixels_are_separate_components():
    m = np.zeros((3, 3), dtype=np.uint8)
    m[0, 0] = m[1, 1] = 1
    assert len(mask_to_polygons(m)) == 2


def test_pinch_vertex_single_ring():
    # L-shaped 3-pixel component: one ring, area 3
    m = np.zeros((3, 3), dtype=np.uint8)
    m[0, 0] = m[0, 1] = m[1, 1] = 1
    polys = mask_to_polygons(m)
    assert len(polys) == 1
    rings, _ = polys[0]
    assert len(rings) == 1
    assert polygon_area(rings) == 3.0


def test_values_split_components():
    m = np.array([[1, 1, 2], [1, 2, 2], [0, 0, 0]], dtype=np.uint8)
    polys = mask_to_polygons(m)
    assert [v for _, v in polys] == [1.0, 2.0]
    assert [polygon_area(r) for r, _ in polys] == [3.0, 3.0]


def test_min_area_filter_after_transform():
    m = np.zeros((4, 4), dtype=np.uint8)
    m[0, 0] = 1  # area 1 px
    m[2:4, 2:4] = 1  # area 4 px
    # transform scales by 2 -> areas 4 and 16
    t = (2.0, 0.0, 0.0, 0.0, 2.0, 0.0)
    polys = mask_to_polygons(m, transform=t, min_area=5.0)
    assert len(polys) == 1
    assert polygon_area(polys[0][0]) == 16.0


def test_simplify_collinear_points():
    m = np.zeros((4, 6), dtype=np.uint8)
    m[1:3, 1:5] = 3  # 2x4 rectangle: boundary has collinear verts
    [(rings, _)] = mask_to_polygons(m, simplify=True, tolerance=0.5)
    # rectangle simplifies to 4 corners + closure
    assert len(rings[0]) == 5
    assert polygon_area(rings) == 8.0


def test_total_area_equals_pixel_count():
    rng = np.random.RandomState(3)
    m = (rng.rand(48, 48) > 0.5).astype(np.uint8) * rng.randint(
        1, 4, size=(48, 48)
    ).astype(np.uint8)
    polys = mask_to_polygons(m)
    total = sum(polygon_area(r) for r, _ in polys)
    assert total == float((m > 0).sum())


def test_label_components_deterministic_seed_ids():
    m = np.array([[1, 0, 1], [1, 0, 1], [1, 1, 1]], dtype=np.uint8)
    lab = label_components(m)
    # single component; label = flat index of first pixel (0)
    assert set(np.unique(lab[lab >= 0])) == {0}


def test_chain_rings_is_order_canonical():
    m = np.zeros((6, 6), dtype=np.uint8)
    m[1:5, 1:5] = 1
    m[2:4, 2:4] = 0
    lab = label_components(m)
    e = boundary_edges(lab)[:, 1:]
    rng = np.random.RandomState(0)
    base = chain_rings(e)
    for _ in range(5):
        shuf = chain_rings(e[rng.permutation(len(e))])
        assert len(shuf) == len(base)
        for a, b in zip(base, shuf):
            np.testing.assert_array_equal(a, b)


def test_pinch_healing_hole_touching_exterior():
    """A hole meeting the exterior at a checkerboard corner: the
    traced self-touching ring is split at the pinch vertex into a
    simple exterior + a simple hole (shapely buffer(0) node-split
    parity; VERDICT r4 #5). Area == pixel count."""
    m = np.array([[1, 1, 1], [1, 0, 1], [1, 1, 0]], dtype=np.uint8)
    polys = mask_to_polygons(m)
    assert len(polys) == 1
    rings, _ = polys[0]
    # every ring simple: no repeated vertices
    for r in rings:
        pts = [tuple(p) for p in r[:-1]]
        assert len(set(pts)) == len(pts), r
    assert polygon_area(rings) == 7.0  # pixel count
    assert len(rings) == 2  # exterior + healed hole
    assert ring_signed_area(rings[0]) > 0 > ring_signed_area(rings[1])


def test_pinch_healing_two_holes_touching():
    """Two diagonal holes sharing a corner: traced as one
    self-touching hole ring, healed into two simple holes."""
    m = np.ones((4, 5), dtype=np.uint8)
    m[1, 1] = 0
    m[2, 2] = 0
    polys = mask_to_polygons(m)
    assert len(polys) == 1
    rings, _ = polys[0]
    for r in rings:
        pts = [tuple(p) for p in r[:-1]]
        assert len(set(pts)) == len(pts), r
    assert polygon_area(rings) == 18.0
    assert len(rings) == 3  # exterior + 2 simple holes


def test_pinch_healing_property_random_checkerboards():
    """Property: for random masks seeded with checkerboard pinches,
    every emitted ring is simple and every polygon's area equals its
    component's pixel count (signed hole areas subtract exactly)."""
    from geo_inference_spark.raster.polygonize import label_components

    rng = np.random.RandomState(12)
    for trial in range(20):
        m = (rng.uniform(size=(12, 14)) < 0.62).astype(np.uint8)
        # plant a few checkerboard pinches
        for _ in range(4):
            y = rng.randint(0, 11)
            x = rng.randint(0, 13)
            m[y, x] = m[y + 1, x + 1] = 1
            m[y, x + 1] = m[y + 1, x] = 0
        lab = label_components(m)
        sizes = {}
        for v in lab[lab >= 0].ravel():
            sizes[int(v)] = sizes.get(int(v), 0) + 1
        polys = mask_to_polygons(m)
        assert len(polys) == len(sizes)
        areas = sorted(polygon_area(r) for r, _ in polys)
        assert areas == sorted(float(s) for s in sizes.values()), trial
        for rings, _ in polys:
            for r in rings:
                pts = [tuple(p) for p in r[:-1]]
                assert len(set(pts)) == len(pts)


def test_pinch_healing_distributed_matches_dense(spark):
    """The distributed polygonize (tile split + border stitch) heals
    pinches identically to the dense path — including pinches that
    straddle a tile border."""
    from geo_inference_spark.operators.vectorize import polygonize_tiles

    rng = np.random.RandomState(21)
    m = (rng.uniform(size=(16, 16)) < 0.6).astype(np.uint8)
    # pinches ON the tile border (tile=8): corners at x or y == 8
    for y, x in [(7, 7), (7, 3), (3, 7), (11, 7)]:
        m[y, x] = m[y + 1, x + 1] = 1
        m[y, x + 1] = m[y + 1, x] = 0
    rows = [
        (ty, tx,
         m[ty * 8:(ty + 1) * 8, tx * 8:(tx + 1) * 8]
         .astype(np.uint8).tobytes())
        for ty in range(2) for tx in range(2)
    ]
    sdf = spark.createDataFrame(rows, schema="ty int, tx int, mask binary")
    got = (
        polygonize_tiles(spark, sdf, 8)
        .orderBy("poly_id")
        .toPandas()
    )
    exp = mask_to_polygons(m.astype(np.float64))
    assert len(got) == len(exp)
    exp_areas = sorted(round(polygon_area(r), 9) for r, _ in exp)
    got_areas = sorted(round(a, 9) for a in got["area"])
    assert got_areas == exp_areas
