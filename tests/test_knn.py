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
