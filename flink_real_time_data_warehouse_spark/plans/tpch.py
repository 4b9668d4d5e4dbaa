"""Classic analytic plans over the TPC-H-ish fixtures.

These go beyond the reference's own operator surface (it has no batch OLAP
layer) but exercise the same engine paths the DWS queries use — wide
aggregation, sort/limit top-k — and serve as bench headliners.

Determinism: money via exact integer cents (functions/money.py); averages
are one IEEE double division over the exact cents sum and exact count —
bit-identical in any engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.money import cents, money_sum, sql_cents, sql_money_sum
from ..operators.skew import salted_join
from ..queries import register
from ..tables import table

NET = "l_extendedprice * (1 - l_discount)"
GROSS = "l_extendedprice * (1 - l_discount) * (1 + l_tax)"


@register(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           sum(l_quantity) AS sum_qty,
           {sql_money_sum('l_extendedprice')} AS sum_base_price,
           {sql_money_sum(NET)} AS sum_disc_price,
           {sql_money_sum(GROSS)} AS sum_charge,
           sum(l_quantity) / count(*) AS avg_qty,
           (sum({sql_cents('l_extendedprice')}) / 100.0) / count(*) AS avg_price,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 shape: full-scan partial+final hash agg; the map-side combine the reference hand-writes in its window reducers (ProductStatsApp.java:253-281) is automatic here",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") <= F.lit("2001-09-01 00:00:00").cast("timestamp")
    )
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    gross = net * (1 + F.col("l_tax"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            money_sum(F.col("l_extendedprice")).alias("sum_base_price"),
            money_sum(net).alias("sum_disc_price"),
            money_sum(gross).alias("sum_charge"),
            (F.sum("l_quantity") / F.count("*")).alias("avg_qty"),
            ((F.sum(cents(F.col("l_extendedprice"))) / F.lit(100.0)) / F.count("*")).alias("avg_price"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "rollup_sales",
    oracle=f"""
    SELECT r.r_name AS region_name, n.n_name AS nation_name,
           count(*) AS order_ct,
           {sql_money_sum('o.o_totalprice')} AS total_amount
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r.r_name, n.n_name)
    """,
    doc="hierarchical ROLLUP aggregation (region -> nation -> grand total) — OLAP surface beyond the reference",
)
def rollup_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region")
    joined = (
        orders.join(F.broadcast(cust.select("c_custkey", "c_nationkey")),
                    F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation.select("n_nationkey", "n_name", "n_regionkey")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region.select("r_regionkey", "r_name")),
              F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return (
        joined.select(F.col("r_name").alias("region_name"), F.col("n_name").alias("nation_name"),
                      "o_totalprice")
        .rollup("region_name", "nation_name")
        .agg(F.count("*").alias("order_ct"),
             money_sum(F.col("o_totalprice")).alias("total_amount"))
    )


@register(
    "top_customers",
    oracle=f"""
    SELECT c.c_custkey AS custkey, c.c_name AS name,
           {sql_money_sum('o.o_totalprice')} AS total_spent,
           count(*) AS order_ct
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY 1, 2
    ORDER BY total_spent DESC, custkey ASC
    LIMIT 10
    """,
    doc="sort + limit top-k over an agg (TopN; deterministic tiebreak on custkey)",
)
def top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    return (
        orders.join(F.broadcast(cust.select("c_custkey", "c_name")),
                    F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(F.col("c_custkey").alias("custkey"), F.col("c_name").alias("name"))
        .agg(
            money_sum(F.col("o_totalprice")).alias("total_spent"),
            F.count("*").alias("order_ct"),
        )
        .orderBy(F.col("total_spent").desc(), F.col("custkey").asc())
        .limit(10)
    )


@register(
    "skew_salted_sales",
    oracle=f"""
    SELECT c.c_nationkey AS nationkey,
           count(*) AS order_ct,
           {sql_money_sum('o.o_totalprice')} AS total_amount
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY 1
    """,
    doc=(
        "skew-safe join: the hot-key salting rewrite (operators/skew.salted_join "
        "— left salt = hash of a row-unique id, right side replicated salt_n "
        "ways, join on (key, salt)) graded against the plain-join oracle, "
        "proving the decomposition is result-identical. At 100 TB this is how "
        "a viral-sku/bot-user key spreads over salt_n tasks instead of pinning "
        "one; composes under any join strategy the planner picks."
    ),
)
def skew_salted_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders").withColumnRenamed("o_custkey", "custkey")
    cust = table(spark, sf_dir, "customer").withColumnRenamed("c_custkey", "custkey")
    joined = salted_join(
        orders.select("custkey", "o_orderkey", "o_totalprice"),
        cust.select("custkey", "c_nationkey"),
        key="custkey",
        salt_from="o_orderkey",
    )
    return (
        joined.groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            F.count("*").alias("order_ct"),
            money_sum(F.col("o_totalprice")).alias("total_amount"),
        )
    )
