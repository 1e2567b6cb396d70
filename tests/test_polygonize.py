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
