"""Relational suite vs DuckDB oracles (TPC-H-shaped queries)."""

import duckdb
import pytest

from geo_inference_spark.operators import relational as R

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem".split():
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
    ],
    ids=["q1", "q3", "q5", "top_orders", "rollup"],
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
