"""Relational suite vs DuckDB oracles (TPC-H-shaped queries)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from geo_inference_spark.operators import relational as R

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events".split():
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


@pytest.mark.parametrize(
    "fn,oracle",
    [
        (R.q1_pricing_summary, R.Q1_ORACLE),
        (R.q3_shipping_priority, R.Q3_ORACLE),
        (R.q5_local_supplier_volume, R.Q5_ORACLE),
        (R.q_top_orders_per_customer, R.TOP_ORDERS_ORACLE),
        (R.q_rollup_region_nation, R.ROLLUP_ORACLE),
        (R.q7_nation_trade_volume, R.Q7_ORACLE),
        (R.q19_disjunctive_revenue, R.Q19_ORACLE),
        (R.q_user_retention, R.RETENTION_ORACLE),
        (R.q13_customer_distribution, R.Q13_ORACLE),
        (R.q_inactive_customers, R.INACTIVE_ORACLE),
        (R.q_order_quartiles, R.QUARTILES_ORACLE),
    ],
    ids=["q1", "q3", "q5", "top_orders", "rollup", "q7", "q19",
         "retention", "q13", "inactive", "quartiles"],
)
def test_relational_matches_oracle(spark, con, fn, oracle):
    got = fn(spark, SF).toPandas()
    exp = con.execute(oracle).fetchdf()
    assert len(got) == len(exp) > 0
    got = got[sorted(got.columns)]
    exp = exp[sorted(exp.columns)]
    g = sorted(tuple(str(v) for v in r) for r in got.itertuples(index=False, name=None))
    e = sorted(tuple(str(v) for v in r) for r in exp.itertuples(index=False, name=None))
    assert g == e


def test_q3_is_top10_sorted(spark):
    rows = R.q3_shipping_priority(spark, SF).collect()
    assert len(rows) == 10
    revs = [r.revenue for r in rows]
    assert revs == sorted(revs, reverse=True)


def test_q7_q19_plans_broadcast_no_cartesian(spark):
    """Q7's five dims broadcast (two self-aliased nation copies) and
    Q19's OR-of-ANDs never degrade to a nested-loop/cartesian plan."""
    for fn in (R.q7_nation_trade_volume, R.q19_disjunctive_revenue):
        plan = fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan, fn.__name__
        assert "CartesianProduct" not in plan, fn.__name__
        assert "BroadcastNestedLoopJoin" not in plan, fn.__name__


def test_approx_count_distinct_within_tolerance(spark):
    """The 100 TB path for distinct users is HLL++ (approx_count_
    distinct, mergeable partial agg, no exact-distinct shuffle); pin
    it within 5% of the exact count per event_type so the swap-in is
    a measured approximation, not a guess."""
    ev = spark.read.parquet(f"{SF}/events.parquet")
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    approx = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", rsd=0.02).alias("n"))
        .collect()
    }
    assert set(exact) == set(approx) and len(exact) == 5
    for t, n in exact.items():
        assert abs(approx[t] - n) <= 0.05 * n, (t, approx[t], n)
