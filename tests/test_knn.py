"""kNN: k-ring expansion + distance-bounded refinement vs brute-force
numpy oracle (SURVEY.md §2.6 O3)."""

import numpy as np
import pandas as pd

from geo_inference_spark.operators.knn import knn_join
from geo_inference_spark.sources.pages import pages_df


def brute_force(pts: pd.DataFrame, queries: pd.DataFrame, k: int):
    out = {}
    for _, q in queries.iterrows():
        d = np.sqrt(
            (pts["lon"].to_numpy() - q["lon"]) ** 2
            + (pts["lat"].to_numpy() - q["lat"]) ** 2
        )
        order = np.lexsort((pts["page_id"].to_numpy(), d))[:k]
        out[int(q["qid"])] = [
            (int(pts["page_id"].iloc[i]), float(d[i])) for i in order
        ]
    return out


def test_knn_exact_vs_brute_force(spark):
    pages = pages_df(spark, 4000, partitions=8)
    pts = pages.select("page_id", "lat", "lon").toPandas()
    queries = pd.DataFrame(
        {
            "qid": [0, 1, 2, 3],
            "lat": [40.7, 51.5, -23.5, 0.0],
            "lon": [-74.0, -0.1, -46.6, 10.0],
        }
    )
    got = knn_join(spark, pages, queries, k=7, res=7).toPandas()
    exp = brute_force(pts, queries, 7)
    for qid, grp in got.groupby("qid"):
        grp = grp.sort_values("rn")
        assert [
            (int(i), round(float(d), 9))
            for i, d in zip(grp["id"], grp["dist"])
        ] == [(i, round(d, 9)) for i, d in exp[int(qid)]], f"qid {qid}"


def test_knn_sparse_region_escalates(spark):
    # a query in the middle of the ocean forces ring escalation /
    # fallback but must still be exact
    pages = pages_df(spark, 500, partitions=4)
    pts = pages.select("page_id", "lat", "lon").toPandas()
    queries = pd.DataFrame({"qid": [9], "lat": [-60.0], "lon": [170.0]})
    got = knn_join(spark, pages, queries, k=3, res=8).toPandas()
    exp = brute_force(pts, queries, 3)
    assert [
        (int(i), round(float(d), 9)) for i, d in zip(got["id"], got["dist"])
    ] == [(i, round(d, 9)) for i, d in exp[9]]


def test_knn_fallback_is_bounded_not_crossjoin(spark):
    """VERDICT r2 #8: a straggler query must resolve through the
    per-partition local-top-k fallback (mapInPandas + broadcast join
    re-rank), never a crossJoin — and still be exact. max_rounds=0
    forces every query straight into the fallback."""
    pages = pages_df(spark, 2000, partitions=8)
    pts = pages.select("page_id", "lat", "lon").toPandas()
    queries = pd.DataFrame(
        {"qid": [0, 1], "lat": [-60.0, 40.7], "lon": [170.0, -74.0]}
    )
    sink: list = []
    got = knn_join(
        spark, pages, queries, k=5, res=7, max_rounds=0, plan_sink=sink
    ).toPandas()
    exp = brute_force(pts, queries, 5)
    for qid, grp in got.groupby("qid"):
        grp = grp.sort_values("rn")
        assert [
            (int(i), round(float(d), 9))
            for i, d in zip(grp["id"], grp["dist"])
        ] == [(i, round(d, 9)) for i, d in exp[int(qid)]], f"qid {qid}"
    assert sink, "fallback did not run"
    for plan in sink:
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_knn_haversine_antimeridian_and_pole_exact(spark):
    """Queries hugging the +-180 line or the polar cap must return
    exact geodesic kNN. Since round 4 these ride the main path: the
    haversine escalation uses spherical-box covers that split at
    +-180 and degrade to the full band at the poles, so the guarantee
    is the radius itself and never -inf (fallback remains only for
    covers past the cell cap)."""
    from geo_inference_spark.operators.knn import knn_join

    # points straddling the antimeridian: geodesically near a +179.9
    # query, planar-far (lon=-179.9 is 359.8 planar degrees away)
    rows = []
    pid = 0
    for lon in (179.5, 179.9, -179.9, -179.5, -178.0, 178.0):
        for lat in (9.0, 10.0, 11.0, 65.0):
            rows.append((pid, float(lat), float(lon)))
            pid += 1
    # polar cluster
    for lon in (-120.0, 0.0, 60.0, 175.0, -175.0):
        rows.append((pid, 89.5, lon))
        pid += 1
    pts = pd.DataFrame(rows, columns=["page_id", "lat", "lon"])
    pdf = spark.createDataFrame(pts, schema="page_id long, lat double, lon double")
    queries = pd.DataFrame(
        {"qid": [0, 1], "lat": [10.0, 89.8], "lon": [179.9, 180.0 - 1e-9]}
    )
    got = knn_join(
        spark, pdf, queries, k=4, res=6, metric="haversine"
    ).toPandas()
    lat, lon = pts["lat"].to_numpy(), pts["lon"].to_numpy()
    for _, q in queries.iterrows():
        dphi = np.radians(lat - q.lat)
        dlam = np.radians(lon - q.lon)
        a = (
            np.sin(dphi / 2) ** 2
            + np.cos(np.radians(q.lat)) * np.cos(np.radians(lat))
            * np.sin(dlam / 2) ** 2
        )
        d = 2 * 6371.0088 * np.arcsin(np.sqrt(a))
        order = np.lexsort((pts["page_id"].to_numpy(), d))[:4]
        exp_ids = pts["page_id"].to_numpy()[order].tolist()
        got_ids = got[got.qid == q.qid].sort_values("rn")["id"].tolist()
        assert got_ids == exp_ids, (q.qid, got_ids, exp_ids)


def test_knn_haversine_matches_bruteforce(spark):
    """Geodesic kNN == brute-force haversine ranking; at high latitude
    the planar and geodesic neighbor sets genuinely differ somewhere,
    so the metric option is not a no-op."""
    import pandas as pd

    from geo_inference_spark.operators.knn import KM_PER_DEG, knn_join
    from geo_inference_spark.sources import pages as P

    docs = P.pages_df(spark, 3000, partitions=4)
    qpdf = pd.DataFrame(
        [(0, 62.0, 10.0), (1, 40.7, -74.0), (2, -35.0, 149.0)],
        columns=["qid", "lat", "lon"],
    )
    got = knn_join(
        spark, docs, qpdf, k=5, res=6, id_col="page_id", metric="haversine"
    ).toPandas()
    pts = P.pages_pdf(np.arange(3000, dtype=np.uint64))
    lat = pts["lat"].to_numpy()
    lon = pts["lon"].to_numpy()
    for _, q in qpdf.iterrows():
        dphi = np.radians(lat - q.lat)
        dlam = np.radians(lon - q.lon)
        a = (
            np.sin(dphi / 2) ** 2
            + np.cos(np.radians(q.lat)) * np.cos(np.radians(lat))
            * np.sin(dlam / 2) ** 2
        )
        d = 2 * 6371.0088 * np.arcsin(np.sqrt(a))
        order = np.lexsort((pts["page_id"].to_numpy(), d))[:5]
        exp_ids = pts["page_id"].to_numpy()[order].tolist()
        got_ids = got[got.qid == q.qid].sort_values("rn")["id"].tolist()
        assert got_ids == exp_ids, (q.qid, got_ids, exp_ids)
    # sanity: distances are km-scale (not degrees)
    assert got["dist"].max() > 2.0 * KM_PER_DEG / 111.0  # > planar-deg scale


def test_knn_all_covers_exceed_cap_still_exact(spark):
    """ADVICE r4 (high): when EVERY remaining query's box cover blows
    past max_cover_cells, the escalation loop breaks — and the break
    must still reach the exact-scan fallback instead of silently
    dropping the queries (the old for/else skipped it)."""
    pages = pages_df(spark, 1500, partitions=4)
    pts = pages.select("page_id", "lat", "lon").toPandas()
    queries = pd.DataFrame(
        {"qid": [0, 1], "lat": [85.0, -60.0], "lon": [10.0, 170.0]}
    )
    sink: list = []
    got = knn_join(
        spark, pages, queries, k=4, res=8, metric="haversine",
        max_cover_cells=0, plan_sink=sink,  # every cover "explodes"
    ).toPandas()
    assert sink, "break did not reach the fallback"
    assert sorted(got["qid"].unique().tolist()) == [0, 1]
    lat, lon = pts["lat"].to_numpy(), pts["lon"].to_numpy()
    for _, q in queries.iterrows():
        dphi = np.radians(lat - q.lat)
        dlam = np.radians(lon - q.lon)
        a = (
            np.sin(dphi / 2) ** 2
            + np.cos(np.radians(q.lat)) * np.cos(np.radians(lat))
            * np.sin(dlam / 2) ** 2
        )
        d = 2 * 6371.0088 * np.arcsin(np.sqrt(a))
        order = np.lexsort((pts["page_id"].to_numpy(), d))[:4]
        exp_ids = pts["page_id"].to_numpy()[order].tolist()
        got_ids = got[got.qid == q.qid].sort_values("rn")["id"].tolist()
        assert got_ids == exp_ids, (q.qid, got_ids, exp_ids)


def test_radius_join_empty_queries_returns_empty(spark):
    """ADVICE r4: an empty query frame must yield an empty (qid, id,
    dist_km) result, not IndexError."""
    from geo_inference_spark.operators.knn import radius_join

    pages = pages_df(spark, 100, partitions=2)
    queries = pd.DataFrame({"qid": [], "lat": [], "lon": []})
    out = radius_join(spark, pages, queries, radius_km=100.0, res=6)
    assert out.columns == ["qid", "id", "dist_km"]
    assert out.count() == 0


def test_radius_join_matches_bruteforce_incl_antimeridian(spark):
    """Geofence radius query == brute-force haversine filter, including
    a query hugging the antimeridian — which rides the spherical-box
    cell cover (lon ranges split at +-180) on the SAME broadcast
    semi-join path as interior queries: no
    BroadcastNestedLoopJoin anywhere in the plan (VERDICT r3 #6)."""
    from geo_inference_spark.operators.knn import radius_join

    pages = pages_df(spark, 3000, partitions=4)
    pts = pages.select("page_id", "lat", "lon").toPandas()
    queries = pd.DataFrame(
        {"qid": [0, 1, 2], "lat": [10.0, 55.0, -20.0],
         "lon": [-60.0, 5.0, 179.95]}
    )
    out = radius_join(spark, pages, queries, radius_km=800.0, res=6)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    got = out.toPandas()
    lat, lon = pts["lat"].to_numpy(), pts["lon"].to_numpy()
    for _, q in queries.iterrows():
        dphi = np.radians(lat - q.lat)
        dlam = np.radians(lon - q.lon)
        a = (
            np.sin(dphi / 2) ** 2
            + np.cos(np.radians(q.lat)) * np.cos(np.radians(lat))
            * np.sin(dlam / 2) ** 2
        )
        d = 2 * 6371.0088 * np.arcsin(np.sqrt(a))
        exp_ids = set(pts["page_id"].to_numpy()[d <= 800.0].tolist())
        got_ids = set(got[got.qid == q.qid]["id"].tolist())
        assert got_ids == exp_ids, (q.qid, len(got_ids), len(exp_ids))
