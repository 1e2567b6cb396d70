"""Relational query suite over the TPC-H-ish star schema.

The engine's general-purpose relational surface: multi-way broadcast
+ shuffle joins, grouped aggregation, window ranking, top-k — the
Catalyst-native operators the geospatial/text pipelines compose with.
Shapes follow TPC-H Q1/Q3/Q5 (public spec) adapted to the driver's
column set; every query has an exact DuckDB oracle (floats rounded
identically on both sides because cross-partition double sums are
order-sensitive).

Scale notes: region/nation/customer/supplier are broadcast
dimensions; lineitem/orders shuffle only on their join keys;
aggregates are partial (map-side) before the key shuffle. AQE picks
broadcast automatically under the 64 MB threshold set in session.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: per (returnflag, linestatus) pricing summary."""
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02")
    )
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc), 2).alias("sum_disc_price"),
            F.round(F.sum(disc * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q1_ORACLE = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       round(avg(l_quantity), 4) AS avg_qty,
       round(avg(l_discount), 4) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: customer ⋈ orders ⋈ lineitem, revenue top-10."""
    cust = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.round(F.sum(rev), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


Q3_ORACLE = """
SELECT l_orderkey, o_orderdate, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-03-15'
  AND l_shipdate > TIMESTAMP '1995-03-15'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join, revenue per nation (customer and
    supplier in the same nation)."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(
            F.broadcast(supp),
            (li["l_suppkey"] == supp["s_suppkey"])
            & (cust["c_nationkey"] == supp["s_nationkey"]),
        )
        .join(F.broadcast(nation), supp["s_nationkey"] == nation["n_nationkey"])
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
        .groupBy("n_name")
        .agg(F.round(F.sum(rev), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


Q5_ORACLE = """
SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


def q_top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window ranking: each customer's top-2 orders by totalprice
    (rank over partition — exact-integer window semantics)."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 2)
        .select(
            "o_custkey", "o_orderkey",
            F.round("o_totalprice", 2).alias("totalprice"), "rk",
        )
        .orderBy("o_custkey", "rk")
    )


TOP_ORDERS_ORACLE = """
SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS totalprice,
       CAST(row_number() OVER (PARTITION BY o_custkey
                               ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rk
FROM orders
QUALIFY rk <= 2
ORDER BY o_custkey, rk
"""


def q_rollup_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping-sets surface: customer account balance rollup over
    region -> nation (ROLLUP, with grouping ids)."""
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    j = cust.join(
        F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"]
    ).join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
    return (
        j.rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.round(F.sum("c_acctbal"), 2).alias("sum_bal"),
        )
        .orderBy(
            F.col("r_name").asc_nulls_first(), F.col("n_name").asc_nulls_first()
        )
    )


ROLLUP_ORACLE = """
SELECT r_name, n_name, count(*) AS n_cust,
       round(sum(c_acctbal), 2) AS sum_bal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST
"""


def q6_revenue_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: potential-revenue scan-aggregate — the pure
    filter+agg plan (no join) whose entire predicate set must reach
    the parquet scan as PushedFilters."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_discount") >= 0.02)
            & (F.col("l_discount") <= 0.08)
            & (F.col("l_quantity") < 24)
        )
        .groupBy(F.year("l_shipdate").alias("ship_year"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("ship_year")
    )


Q6_ORACLE = """
SELECT CAST(year(l_shipdate) AS INT) AS ship_year,
       round(sum(l_extendedprice * l_discount), 2) AS revenue,
       count(*) AS n_items
FROM lineitem
WHERE l_discount >= 0.02 AND l_discount <= 0.08 AND l_quantity < 24
GROUP BY 1 ORDER BY ship_year
"""


def q4_priority_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (adapted to this schema's columns): orders with
    at least one returned lineitem, counted by priority — the LEFT
    SEMI join plan (EXISTS), which never duplicates or widens the
    probe side."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    ).select("l_orderkey")
    return (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"], "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("o_orderpriority")
    )


Q4_ORACLE = """
SELECT o_orderpriority, count(*) AS n_orders
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R'
)
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def q7_nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: trade volume between two nations per ship
    year, with the supplier nation and customer nation resolved
    through two separate broadcast copies of the nation dim — the
    classic self-aliased dimension pattern."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    j = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(n1), supp["s_nationkey"] == n1["sn_key"])
        .join(F.broadcast(n2), cust["c_nationkey"] == n2["cn_key"])
        .filter(
            ((F.col("supp_nation") == "NATION_9") & (F.col("cust_nation") == "NATION_10"))
            | ((F.col("supp_nation") == "NATION_10") & (F.col("cust_nation") == "NATION_9"))
        )
    )
    return (
        j.groupBy(
            "supp_nation", "cust_nation",
            F.year("l_shipdate").cast("int").alias("ship_year"),
        )
        .agg(F.round(F.sum(rev), 2).alias("revenue"),
             F.count(F.lit(1)).alias("n_items"))
        .orderBy("supp_nation", "cust_nation", "ship_year")
    )


Q7_ORACLE = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INT) AS ship_year,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE (n1.n_name = 'NATION_9' AND n2.n_name = 'NATION_10')
   OR (n1.n_name = 'NATION_10' AND n2.n_name = 'NATION_9')
GROUP BY 1, 2, 3
ORDER BY supp_nation, cust_nation, ship_year
"""


def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs predicate across the lineitem ⋈
    part join — the disjunctive-pushdown stress shape (each disjunct
    constrains both sides; Catalyst extracts the common l/p bounds
    below the join)."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    j = li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"]).filter(
        (
            (F.col("p_brand") == "Brand#1")
            & (F.col("p_size") <= 10)
            & (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & (F.col("p_size") <= 25)
            & (F.col("l_quantity") >= 10) & (F.col("l_quantity") <= 40)
        )
    )
    return j.agg(
        F.round(F.sum(rev), 2).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


Q19_ORACLE = """
SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size <= 10
       AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#3' AND p_size <= 25
       AND l_quantity BETWEEN 10 AND 40)
"""


def q_user_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day retention: users active on day d who return on
    d+1 — the cohort shape (distinct (user, day) self-join on the
    shifted day). One dedup shuffle + one equi-join on (user, day)."""
    ev = _t(spark, sf_dir, "events")
    du = ev.select(
        F.col("user_id"), F.date_trunc("day", "ts").alias("d")
    ).distinct()
    nxt = du.select(
        F.col("user_id"),
        (F.col("d") - F.expr("INTERVAL 1 DAY")).alias("d"),
    )
    return (
        du.join(nxt, ["user_id", "d"])
        .groupBy(F.col("d").alias("day"))
        .agg(F.count(F.lit(1)).alias("retained_users"))
        .orderBy("day")
    )


RETENTION_ORACLE = """
WITH du AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS d FROM events)
SELECT a.d AS day, count(*) AS retained_users
FROM du a JOIN du b ON b.user_id = a.user_id AND b.d = a.d + INTERVAL 1 DAY
GROUP BY 1 ORDER BY day
"""


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: orders-per-customer distribution INCLUDING
    zero-order customers — the LEFT OUTER join + two-level aggregation
    whose outer side must not drop unmatched probe rows."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


Q13_ORACLE = """
SELECT c_count, count(*) AS custdist FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def q_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join surface: customers with NO order in 1998, counted per
    nation (LEFT ANTI in Spark == NOT EXISTS in the oracle) — the plan
    that must stay a broadcast/shuffled hash anti-join, never a
    filtered outer join materializing the full probe x build."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        F.year("o_orderdate") == 1998
    ).select("o_custkey")
    nation = _t(spark, sf_dir, "nation")
    inactive = cust.join(
        orders, cust["c_custkey"] == orders["o_custkey"], "left_anti"
    )
    return (
        inactive.join(
            F.broadcast(nation), inactive["c_nationkey"] == nation["n_nationkey"]
        )
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_inactive"),
            F.round(F.sum("c_acctbal"), 2).alias("sum_bal"),
        )
        .orderBy("n_name")
    )


INACTIVE_ORACLE = """
SELECT n_name, count(*) AS n_inactive, round(sum(c_acctbal), 2) AS sum_bal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
WHERE NOT EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey AND year(o_orderdate) = 1998
)
GROUP BY n_name ORDER BY n_name
"""


def q_order_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile window surface: per-priority order-value quartiles with
    per-tile counts and value bounds (fully tie-broken ORDER BY so the
    tile assignment is deterministic in both engines)."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    return (
        orders.withColumn("tile", F.ntile(4).over(w))
        .groupBy("o_orderpriority", "tile")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
        .orderBy("o_orderpriority", "tile")
    )


QUARTILES_ORACLE = """
SELECT o_orderpriority, tile, count(*) AS n_orders,
       round(min(o_totalprice), 2) AS lo,
       round(max(o_totalprice), 2) AS hi
FROM (
  SELECT o_orderpriority, o_totalprice, o_orderkey,
         CAST(ntile(4) OVER (PARTITION BY o_orderpriority
                             ORDER BY o_totalprice, o_orderkey) AS INT) AS tile
  FROM orders
)
GROUP BY 1, 2 ORDER BY o_orderpriority, tile
"""
