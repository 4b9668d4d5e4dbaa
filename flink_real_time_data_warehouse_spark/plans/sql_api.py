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
