"""Streaming-backed registry queries.

Each callable replays the fixture through Structured Streaming to
completion (availableNow trigger) and returns the materialized result, so
the driver's DuckDB oracle grades *streaming* execution — watermarks,
append-mode window finalization, keyed state — against batch SQL.

Oracle caveat encoded in the SQL: append mode only emits windows/timers the
final watermark (max event time − delay) has passed, so the oracles filter
to that closed set. Everything else is identical to the batch plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions.money import sql_money_sum
from ..operators.stateful_batch import BOUNCE_TIMEOUT_S, SESSION_GAP_S
from ..queries import register
from ..sources.streams import stream_table
from ..streaming.pipelines import run_to_memory, visitor_stats_stream
from ..streaming.state import bounce_stream, new_user_fix_stream, uv_dedup_stream

WM_S = 1  # watermark delay used by the streaming queries (SQL apps use 1s, T6)


@register(
    "visitor_stats_stream",
    oracle=f"""
    SELECT * FROM (
      SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS stt,
             strftime(date_trunc('hour', ts) + INTERVAL 1 HOUR, '%Y-%m-%d %H:%M:%S') AS edt,
             count(*) FILTER (event_type = 'view') AS pv_ct,
             count(*) FILTER (event_type = 'click') AS click_ct,
             count(*) FILTER (event_type = 'error') AS err_ct,
             count(*) FILTER (event_type = 'purchase') AS purchase_ct,
             count(*) FILTER (event_type = 'signup') AS signup_ct,
             count(DISTINCT user_id) AS uv_ct,
             {sql_money_sum('value')} AS dur_sum
      FROM events
      GROUP BY 1, 2
    )
    WHERE edt <= strftime((SELECT max(ts) - INTERVAL {WM_S} SECOND FROM events),
                          '%Y-%m-%d %H:%M:%S')
    """,
    doc="A2 via Structured Streaming: watermark + tumble window, append mode; oracle = batch agg over watermark-closed windows",
)
def visitor_stats_stream_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = stream_table(spark, sf_dir, "events")
    return run_to_memory(visitor_stats_stream(ev, f"{WM_S} second"), spark)


@register(
    "uv_stream",
    oracle="""
    SELECT user_id, date_trunc('day', ts) AS visit_day, min(ts) AS first_ts
    FROM events GROUP BY 1, 2
    """,
    doc="T2 via applyInPandasWithState: keyed daily-first-visit dedup, streaming replay equals batch min-per-day",
)
def uv_stream_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = stream_table(spark, sf_dir, "events").withWatermark("ts", f"{WM_S} second")
    return run_to_memory(uv_dedup_stream(ev), spark)


@register(
    "new_user_stream",
    oracle="""
    SELECT event_id, user_id,
           CASE WHEN row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) = 1
                THEN 1 ELSE 0 END AS is_new
    FROM events
    """,
    doc="T1 via applyInPandasWithState: keyed first-seen state rewrites is_new",
)
def new_user_stream_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = stream_table(spark, sf_dir, "events")
    return run_to_memory(new_user_fix_stream(ev), spark)


@register(
    "bounce_stream",
    oracle=f"""
    WITH ordered AS (
      SELECT event_id, user_id, ts,
             lag(ts)  OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts,
             lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_ts
      FROM events
    )
    SELECT event_id, user_id, ts
    FROM ordered
    WHERE (prev_ts IS NULL OR epoch(ts) - epoch(prev_ts) > {SESSION_GAP_S})
      AND (
        (next_ts IS NOT NULL AND epoch(next_ts) - epoch(ts) > {BOUNCE_TIMEOUT_S})
        OR (next_ts IS NULL
            AND epoch(ts) + {BOUNCE_TIMEOUT_S} <= (SELECT epoch(max(ts)) - {WM_S} FROM events))
      )
    """,
    doc="T3 via applyInPandasWithState + event-time timer: match and timeout paths both emit; oracle = lag/lead bounce where the final watermark passed the timer",
)
def bounce_stream_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = stream_table(spark, sf_dir, "events").withWatermark("ts", f"{WM_S} second")
    return run_to_memory(bounce_stream(ev, SESSION_GAP_S, BOUNCE_TIMEOUT_S), spark)
