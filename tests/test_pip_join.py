"""PIP join vs brute-force numpy oracle (generic irregular polygons)."""

import numpy as np

from geo_inference_spark.geom.core import points_in_polygon
from geo_inference_spark.geom.wkb import iter_polygons
from geo_inference_spark.operators.pip_join import build_cover, pip_join
from geo_inference_spark.sources import pages as P


def brute_force_matches(pts_pdf, polygons_pdf):
    exp = set()
    for _, row in polygons_pdf.iterrows():
        hit = np.zeros(len(pts_pdf), dtype=bool)
        for rings in iter_polygons(row["geom_wkb"]):
            hit |= points_in_polygon(
                pts_pdf["lon"].to_numpy(), pts_pdf["lat"].to_numpy(), rings
            )
        for pid in pts_pdf["page_id"].to_numpy()[hit]:
            exp.add((int(pid), int(row["area_id"])))
    return exp


def test_cover_interior_boundary_split():
    polys = P.synth_admin_polygons(n_areas=8)
    cover = build_cover(polys, res=7)
    assert len(cover) > 0
    assert set(cover.columns) == {"res", "cell", "area_id", "boundary"}
    assert not cover.duplicated(["res", "cell", "area_id"]).any()
    # adaptive cover keeps every polygon's cell count bounded
    per_poly = cover.groupby("area_id").size()
    assert (per_poly <= 4096).all()


def test_pip_join_matches_bruteforce(spark):
    pages = P.pages_df(spark, 4000, partitions=8)
    polys = P.synth_admin_polygons(n_areas=24)
    got_rows = (
        pip_join(spark, pages, polys, res=8, keep_cols=("page_id",))
        .select("page_id", "area_id")
        .collect()
    )
    got = {(r["page_id"], r["area_id"]) for r in got_rows}
    assert len(got_rows) == len(got)  # no duplicate matches
    pts = P.pages_pdf(np.arange(4000, dtype=np.uint64))
    exp = brute_force_matches(pts, polys)
    assert got == exp
    assert len(exp) > 50  # test is non-vacuous


def test_pip_join_grid_polygons(spark):
    pages = P.pages_df(spark, 2000, partitions=4)
    grid = P.admin_grid_polygons()
    got = (
        pip_join(spark, pages, grid, res=6, keep_cols=("page_id",))
        .select("page_id", "area_id")
        .toPandas()
    )
    # every page falls in exactly one grid rect
    assert len(got) == 2000
    assert got["page_id"].is_unique
    pts = P.pages_pdf(np.arange(2000, dtype=np.uint64))
    ix = np.floor((pts["lon"].to_numpy() + 180) / 45).clip(0, 7).astype(int)
    iy = np.floor((pts["lat"].to_numpy() + 90) / 45).clip(0, 3).astype(int)
    exp = dict(zip(pts["page_id"], ix * 4 + iy))
    for pid, aid in zip(got["page_id"], got["area_id"]):
        assert exp[pid] == aid


def test_pip_join_strtree_large_layer(spark):
    """≥10k polygons flips the refine onto the STRtree path; result
    must still equal brute force and stay duplicate-free."""
    pages = P.pages_df(spark, 1500, partitions=4)
    polys = P.synth_admin_polygons(n_areas=10_000)
    plan = pip_join(
        spark, pages, polys, res=6, keep_cols=("page_id",)
    ).select("page_id", "area_id")
    # the plan must stay a broadcast hash join of the big side
    assert "BroadcastHashJoin" in plan._jdf.queryExecution().executedPlan().toString()
    got_rows = plan.collect()
    got = {(r["page_id"], r["area_id"]) for r in got_rows}
    assert len(got_rows) == len(got)
    pts = P.pages_pdf(np.arange(1500, dtype=np.uint64))
    exp = brute_force_matches(pts, polys)
    assert got == exp
    assert len(exp) > 100


def test_pip_join_multipart_adaptive_res_no_double_count(spark):
    """A multipolygon whose parts would fit different adaptive cover
    resolutions must not double-count points (one res per area_id)."""
    import pandas as pd

    from geo_inference_spark.geom.wkb import multipolygon_to_wkb

    def square(cx, cy, r):
        return np.array(
            [
                [cx - r, cy - r],
                [cx + r, cy - r],
                [cx + r, cy + r],
                [cx - r, cy + r],
                [cx - r, cy - r],
            ],
            dtype=float,
        )

    # huge part (forces coarse adaptive res at the 4096-cell cap) +
    # tiny part that would fit the full requested res
    mp = multipolygon_to_wkb([[square(0.0, 0.0, 40.0)], [square(60.0, 0.5, 0.05)]])
    polys = pd.DataFrame(
        [{"area_id": 7, "name": "mp", "value": 1.0, "geom_wkb": mp,
          "crs": "EPSG:4326"}]
    )
    pages = P.pages_df(spark, 3000, partitions=4)
    got_rows = (
        pip_join(spark, pages, polys, res=9, keep_cols=("page_id",))
        .select("page_id", "area_id")
        .collect()
    )
    got = {(r["page_id"], r["area_id"]) for r in got_rows}
    assert len(got_rows) == len(got)  # the ADVICE double-count bug
    pts = P.pages_pdf(np.arange(3000, dtype=np.uint64))
    exp = brute_force_matches(pts, polys)
    assert got == exp
    assert len(exp) > 10
