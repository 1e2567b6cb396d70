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
