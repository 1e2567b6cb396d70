"""As-of join vs DuckDB's native ASOF JOIN + hand-built edge cases."""

import datetime as dt

import duckdb
import pandas as pd

import __spark_entry__ as entry
from geo_inference_spark.operators.asof import asof_join

SF = "/root/testdata/sf0.01"


def test_asof_matches_duckdb_native(spark):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
    s = entry.q_events_asof(spark, SF).toPandas()
    o = con.execute(entry.oracle_sql()["events_asof"]).fetchdf()
    assert len(s) == len(o) > 0
    s = s.sort_values("event_id").reset_index(drop=True)
    o = o.sort_values("event_id").reset_index(drop=True)
    assert s["err_ts"].astype(str).tolist() == o["err_ts"].astype(str).tolist()
    assert s["err_value"].fillna(-1).tolist() == o["err_value"].fillna(-1).tolist()
    # non-vacuous: some clicks have a prior error, some don't
    assert s["err_ts"].isna().any() and s["err_ts"].notna().any()


def test_asof_edge_cases(spark):
    t = lambda m: dt.datetime(2024, 1, 1, 0, m)  # noqa: E731
    left = spark.createDataFrame(
        pd.DataFrame({"k": [1, 1, 1, 2], "ts": [t(1), t(5), t(10), t(3)],
                      "lid": [10, 11, 12, 13]}),
        schema="k long, ts timestamp, lid long",
    )
    right = spark.createDataFrame(
        pd.DataFrame({"k": [1, 1, 2], "ts": [t(5), t(7), t(4)],
                      "rid": [100, 101, 102], "v": [1.0, 2.0, 3.0]}),
        schema="k long, ts timestamp, rid long, v double",
    )
    out = {
        r.lid: (r.v_r)
        for r in asof_join(
            left, right, key="k", right_payload=("v",), right_id="rid"
        ).collect()
    }
    assert out[10] is None  # before any right row
    assert out[11] == 1.0  # equal timestamp included (>=)
    assert out[12] == 2.0  # latest prior
    assert out[13] is None  # key 2: right row is later than left


def test_approx_distinct_within_5pct(spark):
    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{SF}/events.parquet")
    both = (
        ev.groupBy("event_type")
        .agg(
            F.count_distinct("user_id").alias("exact"),
            F.approx_count_distinct("user_id").alias("approx"),
        )
        .collect()
    )
    for r in both:
        assert abs(r.approx - r.exact) / r.exact < 0.05, r


def test_asof_null_payload_is_atomic(spark):
    """The matched right row's values travel together: a genuine NULL
    in the matched row must come through as NULL (not a stale value
    from an older row), and all payload columns must come from the
    SAME right row — no torn tuples (DuckDB ASOF semantics)."""
    t = lambda m: dt.datetime(2024, 1, 1, 0, m)  # noqa: E731
    left = spark.createDataFrame(
        pd.DataFrame({"k": [1], "ts": [t(10)], "lid": [10]}),
        schema="k long, ts timestamp, lid long",
    )
    right = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": [1, 1],
                "ts": [t(1), t(5)],
                "rid": [100, 101],
                "v": [1.0, None],      # matched row (t5) has NULL v
                "w": [None, 9.0],      # matched row has non-NULL w
            }
        ),
        schema="k long, ts timestamp, rid long, v double, w double",
    )
    r = asof_join(
        left, right, key="k", right_payload=("v", "w"), right_id="rid"
    ).collect()[0]
    assert r.v_r is None  # NOT the stale 1.0 from rid=100
    assert r.w_r == 9.0
