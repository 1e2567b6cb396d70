"""Planted-skew benchmark: salting on vs off (VERDICT r4 #7).

Builds a pages table where ONE res-8 cell holds 30% of all rows (the
100 TB crawl's 'Manhattan cell'), then measures at local[8]:

  A. groupBy(cell) count        — plain vs salted_agg
  B. per-cell top-k (window)    — plain vs salted_topk

A is the honest control: Spark's hash aggregate already does map-side
partial aggregation, so a hot key barely skews a count (the partials
collapse before the shuffle) — expect parity, and say so. B is where
the skew actually bites: a plain Window.partitionBy(cell) funnels the
hot cell's 30% of the table through ONE task; salted_topk bounds every
task at n*k rows per key.

Usage: python scripts/bench_skew.py [n_rows] [hot_frac] [res]
Appends nothing; prints one JSON line — copy into BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np
import pandas as pd
from pyspark.sql import Window
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from geo_inference_spark.operators.geocode import hex_cell_udf  # noqa: E402
from geo_inference_spark.operators.salting import (  # noqa: E402
    salted_agg,
    salted_topk,
)
from geo_inference_spark.session import get_spark  # noqa: E402


def build_skewed_pages(spark, n: int, hot_frac: float, res: int):
    """30% of rows at one point (one cell at any res), rest uniform."""
    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rng = np.random.RandomState(ids[0] % (2**31 - 1))
            hot = rng.uniform(size=len(ids)) < hot_frac
            lat = rng.uniform(-60, 70, len(ids))
            lon = rng.uniform(-180, 180, len(ids))
            lat[hot] = 40.7128
            lon[hot] = -74.006
            yield pd.DataFrame({
                "page_id": ids, "lat": lat, "lon": lon,
                "score": rng.uniform(0, 1, len(ids)),
            })

    return (
        spark.range(0, n, 1, 16)
        .mapInPandas(gen, "page_id long, lat double, lon double, score double")
        .withColumn("cell", hex_cell_udf(res)(F.col("lat"), F.col("lon")))
    )


def median3(fn):
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        fn()
        runs.append(time.perf_counter() - t0)
    return sorted(runs)[1]


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3_000_000
    hot = float(sys.argv[2]) if len(sys.argv) > 2 else 0.30
    # res 2 ~= a few hundred cells globally: the regime where ONE hot
    # key is a straggler task. At res 8 the uniform 70% spreads over
    # ~2M tiny cells and per-group overhead dominates instead — the
    # hot key is invisible (measured: salting LOSES there, 8.8 vs
    # 10.3 s; that honest negative is part of the writeup).
    res = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    spark = get_spark("bench-skew", cores=8)
    path = f"/tmp/graft_skew_pages_{n}_{hot}_r{res}"
    import os

    if not os.path.isdir(path):
        build_skewed_pages(spark, n, hot, res).write.mode("overwrite").parquet(path)
    pages = spark.read.parquet(path)
    pages.count()  # warm

    # A: count agg (control — partial agg already tames the hot key)
    t_plain_cnt = median3(
        lambda: pages.groupBy("cell").count().count()
    )
    t_salt_cnt = median3(
        lambda: salted_agg(
            pages, ["cell"], {"cnt": ("*", "count")}, n=8
        ).count()
    )

    # B: per-cell top-5 by score (the skew victim: no partial agg)
    w = Window.partitionBy("cell").orderBy(
        F.col("score").desc(), F.col("page_id")
    )

    def plain_topk():
        (
            pages.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 5)
            .count()
        )

    def salt_topk():
        salted_topk(
            pages, ["cell"], "score", k=5, n=8, tie_col="page_id"
        ).count()

    t_plain_topk = median3(plain_topk)
    t_salt_topk = median3(salt_topk)

    # C: the auto decision (VERDICT r5 #7) — should track the better
    # of plain/salted in each regime (its probe is one sampled agg)
    from geo_inference_spark.operators.salting import (
        choose_salting,
        salted_topk_auto,
    )

    def auto_topk():
        salted_topk_auto(
            pages, ["cell"], "score", k=5, n=8, tie_col="page_id",
            sample_fraction=0.01,
        ).count()

    t_auto_topk = median3(auto_topk)

    print(json.dumps({
        "n_rows": n, "hot_frac": hot, "res": res, "cores": 8,
        "count_plain_sec": round(t_plain_cnt, 3),
        "count_salted_sec": round(t_salt_cnt, 3),
        "topk_plain_sec": round(t_plain_topk, 3),
        "topk_salted_sec": round(t_salt_topk, 3),
        "topk_auto_sec": round(t_auto_topk, 3),
        "auto_chose_salting": choose_salting(
            pages, ["cell"], sample_fraction=0.01
        ),
        "hot_share_est": round(__import__(
            "geo_inference_spark.operators.salting",
            fromlist=["estimate_hot_share"],
        ).estimate_hot_share(pages, ["cell"], 0.01), 3),
        "topk_speedup": round(t_plain_topk / t_salt_topk, 2),
    }))


if __name__ == "__main__":
    main()
