"""Spark SQL string-API plans — the surface parity for the reference's two
Flink SQL apps (SURVEY §2.1 S4, §2.10 C1/C3, §3.3).

ProvinceStatsSQLApp/KeywordStatsApp declare Kafka tables with DDL and run
chained SQL strings through the Blink planner. Here the same lifecycle is
`register_views` (tables as temp views) + `spark.sql(...)`: SQL string ->
unresolved plan -> analyzer -> Catalyst -> physical plan. The chained-query
pattern (KeywordStatsApp.java:90-96 interpolates one Table into the next
SQL) becomes a CTE chain in one statement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions.money import sql_money_sum
from ..queries import register
from ..tables import register_views

# One SQL text, valid in both Spark SQL and DuckDB (engine-neutral subset).
_KEYWORD_SQL_PORTABLE = """
    WITH pages AS (
      SELECT event_id, props FROM events WHERE event_type = 'view'
    ),
    parsed AS (
      SELECT event_id, CAST(get_json_object(props, '$.k') AS INT) AS k FROM pages
    )
    SELECT k % 10 AS k_bucket, count(*) AS page_ct, count(DISTINCT event_id) AS event_ct
    FROM parsed WHERE k IS NOT NULL GROUP BY k % 10
"""


@register(
    "sql_chained_stats",
    oracle="""
    WITH pages AS (
      SELECT event_id, props FROM events WHERE event_type = 'view'
    ),
    parsed AS (
      SELECT event_id, CAST(props->>'$.k' AS INTEGER) AS k FROM pages
    )
    SELECT k % 10 AS k_bucket, count(*) AS page_ct, count(DISTINCT event_id) AS event_ct
    FROM parsed WHERE k IS NOT NULL GROUP BY k % 10
    """,
    doc="S4+C1+C3+§3.3: chained SQL-string lifecycle (KeywordStatsApp.java:90-124) via temp views + spark.sql CTE chain",
)
def sql_chained_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_KEYWORD_SQL_PORTABLE)


@register(
    "sql_province_stats",
    oracle=f"""
    SELECT strftime(date_trunc('day', o.o_orderdate), '%Y-%m-%d %H:%M:%S') AS stt,
           n.n_name AS nation_name,
           count(DISTINCT o.o_orderkey) AS order_ct,
           {sql_money_sum('o.o_totalprice')} AS order_amount
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY 1, 2
    """,
    doc="S4+A4 via pure SQL string (ProvinceStatsSQLApp.java:112-132 lifecycle on Spark SQL)",
)
def sql_province_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT date_format(date_trunc('day', o.o_orderdate), 'yyyy-MM-dd HH:mm:ss') AS stt,
               n.n_name AS nation_name,
               count(DISTINCT o.o_orderkey) AS order_ct,
               coalesce(sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)), 0) / CAST(100.0 AS DOUBLE) AS order_amount
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY 1, 2
        """
    )


# One SQL text valid in both engines (engine-neutral subset): the TPC-H Q17
# shape — a CORRELATED scalar subquery per lineitem row. The graded surface
# here is Catalyst's decorrelation: the analyzer rewrites the per-row
# subquery into a per-partkey aggregate joined back on the correlation key
# (one shuffle agg + one join, never a per-row re-scan). The 0.2*avg bound
# is computed as sum/count over integral-valued quantity doubles, so both
# engines evaluate the identical IEEE expression and the boundary cannot
# flip between them; money flows as integer cents (sum/700.0 = the Q17
# avg_yearly convention over 7 years).
_SMALL_QTY_SQL = """
    SELECT p.p_brand,
           count(*) AS small_lines,
           coalesce(sum(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)), 0)
             / CAST(700.0 AS DOUBLE) AS avg_yearly
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand IN ('Brand#21', 'Brand#22', 'Brand#23')
      AND l.l_quantity < (SELECT 0.2 * sum(l2.l_quantity) / count(*)
                          FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
    GROUP BY p.p_brand
"""


@register(
    "small_qty_revenue",
    oracle=_SMALL_QTY_SQL,
    doc=(
        "TPC-H Q17 shape: correlated scalar subquery (per-part 20%-of-avg "
        "quantity bound) — exercises Catalyst decorrelation into a "
        "per-partkey aggregate + join on the correlation key. Scale note: "
        "the decorrelated agg runs over the full lineitem before the brand "
        "filter prunes partkeys (the Catalyst rewrite is key-complete); a "
        "hand-shaped plan would semi-join lineitem to the filtered parts "
        "first — the trade between declared and hand-optimized is the "
        "point of grading the SQL surface"
    ),
)
def small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_SMALL_QTY_SQL)


# TPC-H Q11 shape: a GLOBAL scalar subquery gating group results in
# HAVING. Catalyst plans the subquery as an independent aggregate joined
# into the per-group filter (one extra scan, no per-group re-execution).
# The share bound multiplies the EXACT global cents sum by a double
# fraction — one IEEE multiply, identical in both engines, compared to an
# exact integer group sum, so the boundary cannot flip.
_NATION_SHARE_SQL = """
    SELECT n.n_name AS nation_name,
           coalesce(sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)), 0)
             / CAST(100.0 AS DOUBLE) AS revenue
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    HAVING sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT))
         > 0.045 * (SELECT sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                    FROM orders)
"""


@register(
    "nation_revenue_share",
    oracle=_NATION_SHARE_SQL,
    doc=(
        "TPC-H Q11 shape: global scalar subquery in HAVING — nations whose "
        "revenue exceeds 4.5% of worldwide revenue. Catalyst executes the "
        "subquery once as its own aggregate and broadcasts the scalar into "
        "the group filter; money as exact integer cents on both sides"
    ),
)
def nation_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_NATION_SHARE_SQL)


@register(
    "small_qty_revenue_shaped",
    oracle=_SMALL_QTY_SQL,
    doc=(
        "Hand-shaped companion to small_qty_revenue (r5 verdict task 7), "
        "graded against the SAME oracle: Catalyst's decorrelation of the "
        "Q17 subquery aggregates ALL of lineitem before the brand filter "
        "prunes partkeys (the rewrite is key-complete by construction); "
        "this plan SEMI-JOINS lineitem to the brand-filtered partkeys "
        "FIRST, so the per-partkey 0.2*avg bound aggregates only the "
        "brands' rows — at 100 TB that's the difference between "
        "aggregating ~0.1% of lineitem and all of it. Correct because the "
        "bound for partkey p depends only on p's own rows, and the brand "
        "filter keeps/drops WHOLE partkeys. The quantified declared-vs-"
        "shaped gap is the point of carrying both (bench: "
        "small_qty_revenue vs small_qty_revenue_shaped); plan-shape test "
        "asserts the semi-join sits BELOW the bound aggregate"
    ),
)
def small_qty_revenue_shaped(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from ..functions.money import cents
    from ..tables import table

    brands = ("Brand#21", "Brand#22", "Brand#23")
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    part = (
        table(spark, sf_dir, "part")
        .where(F.col("p_brand").isin(*brands))
        .select("p_partkey", "p_brand")
    )
    # Brand-filtered partkeys are a small set even at 100 TB (3 brands of
    # ~O(part)/brand-cardinality): broadcast the semi-join probe so the
    # lineitem scan prunes map-side with zero shuffle.
    keys = F.broadcast(part.select(F.col("p_partkey").alias("l_partkey")))
    li_b = li.join(keys, "l_partkey", "left_semi")
    # Per-partkey bound over the PRUNED rows only — identical values to the
    # declared plan's full-table aggregate for every surviving partkey,
    # same IEEE expression as the oracle (0.2 * sum / count over
    # integral-valued doubles: exact).
    bounds = li_b.groupBy("l_partkey").agg(
        (F.lit(0.2) * F.sum("l_quantity") / F.count("*")).alias("qty_bound")
    )
    return (
        li_b.join(bounds, "l_partkey")
        .where(F.col("l_quantity") < F.col("qty_bound"))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("small_lines"),
            (
                F.coalesce(F.sum(cents(F.col("l_extendedprice"))), F.lit(0))
                / F.lit(700.0)
            ).alias("avg_yearly"),
        )
    )


# TPC-H Q21 shape, adapted to the fixture's columns (no l_receiptdate;
# "late" = shipped more than 90 days after the order date). One
# engine-portable SQL text: a plain EXISTS (another supplier on the same
# order) plus a CORRELATED NOT EXISTS whose predicate references the
# OUTER query's order date — the semi-join + anti-join self-join pair
# Catalyst must decorrelate without re-scanning lineitem per row.
_WAITING_SUPPLIER_SQL = """
    SELECT s.s_suppkey AS suppkey, s.s_name AS supp_name,
           count(*) AS numwait
    FROM lineitem l1
    JOIN orders o ON o.o_orderkey = l1.l_orderkey AND o.o_orderstatus = 'F'
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    WHERE l1.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
    GROUP BY 1, 2
"""


@register(
    "waiting_supplier",
    oracle=_WAITING_SUPPLIER_SQL,
    doc=(
        "TPC-H Q21 shape (suppliers who were the SOLE late shipper on "
        "multi-supplier finished orders): a semi-join EXISTS plus an "
        "anti-join NOT EXISTS whose predicate is CORRELATED on the outer "
        "order's date — the hardest decorrelation family in the TPC-H "
        "set, planned as two keyed self-joins of lineitem (never a "
        "per-row re-scan, no cartesian; plan-shape-tested). All "
        "predicates are date/key comparisons, so both engines evaluate "
        "identical logic and the counts are exact"
    ),
)
def waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_WAITING_SUPPLIER_SQL)


# Mixed GROUPING SETS — the general form ROLLUP/CUBE are sugar for
# (rollup_sales / cube_sales carry those): region-only, status-only, the
# pair, and the grand total, with GROUPING() markers disambiguating "NULL
# because subtotal" from a NULL group value. One portable SQL text — Spark
# plans it as a single Expand + hash aggregate (each input row fans out to
# its 4 grouping-set rows map-side; one shuffle, same as a plain agg).
_GROUPING_SETS_SQL = """
    SELECT r.r_name AS region_name, o.o_orderstatus AS status,
           CAST(grouping(r.r_name) AS INT) AS g_region,
           CAST(grouping(o.o_orderstatus) AS INT) AS g_status,
           count(*) AS order_ct,
           coalesce(sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)), 0)
             / CAST(100.0 AS DOUBLE) AS revenue
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY GROUPING SETS ((r.r_name), (o.o_orderstatus),
                            (r.r_name, o.o_orderstatus), ())
"""


@register(
    "grouping_sets_sales",
    oracle=_GROUPING_SETS_SQL,
    doc=(
        "arbitrary GROUPING SETS (the general OLAP form; rollup_sales / "
        "cube_sales are its two sugar cases) with GROUPING() markers — "
        "one portable SQL text runs on both engines. Scale shape: "
        "Spark's Expand fans each row to its 4 set-rows BEFORE the "
        "shuffle, so partial aggregation still combines map-side and the "
        "exchange carries pre-aggregated set-rows, not 4x the input"
    ),
)
def grouping_sets_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_GROUPING_SETS_SQL)
