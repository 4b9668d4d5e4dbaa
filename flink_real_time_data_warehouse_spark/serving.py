"""Serving layer (SURVEY §2.9 K6, §2.5 A6).

The reference serves ClickHouse aggregates through a Spring Boot REST API
(`gmall-publisher`): `/api/sugar/gmv?date=` returns `{status, msg, data}`
with GMV for a day, defaulting to today (SugarController.java:20-49), via
`select sum(order_amount) from product_stats where toYYYYMMDD(stt)=#{date}`
(ProductStatsMapper.java:12-13).

Here the serving layer is a thin Python query API over the engine's result
tables (HTTP framing is out of engine scope, same as the reference keeps it
in a separate module). Answers come from Spark SQL over the same DataFrames
the pipelines produce.
"""

from __future__ import annotations

from datetime import date as _date

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.money import money_sum
from .tables import table


class ServingAPI:
    def __init__(self, spark: SparkSession, sf_dir: str):
        self.spark = spark
        self.sf_dir = sf_dir

    def gmv(self, day: str | None = None) -> dict:
        """GMV for one day (purchase value sum); `{status, msg, data}`
        envelope like SugarController.java:32-48. Defaults to today."""
        day = day or _date.today().isoformat()
        ev = table(self.spark, self.sf_dir, "events")
        row = (
            ev.where(
                (F.col("event_type") == "purchase")
                & (F.date_format("ts", "yyyy-MM-dd") == day)
            )
            .agg(money_sum(F.col("value")).alias("gmv"))
            .collect()[0]
        )
        return {"status": 0, "msg": "", "data": row["gmv"]}

    def product_stats_topn(self, n: int = 10) -> list[dict]:
        """Top products by net revenue (ProductStatsMapper-style serving agg)."""
        from .queries import registry

        df: DataFrame = registry()["product_stats"].spark(self.spark, self.sf_dir)
        rows = (
            df.groupBy("sku_id", "sku_name")
            .agg(F.sum("order_amount").alias("amount"))
            .orderBy(F.col("amount").desc(), F.col("sku_id").asc())
            .limit(n)
            .collect()
        )
        return [r.asDict() for r in rows]
