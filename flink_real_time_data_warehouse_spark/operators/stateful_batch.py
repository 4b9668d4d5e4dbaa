"""Batch (window-function) formulations of the reference's keyed-state ops.

These are the deterministic, oracle-checkable semantics; the incremental
streaming implementations live in streaming/state.py and are tested for
equivalence against these.

- first_seen_flag  ~ BaseLogApp new-vs-returning correction
  (BaseLogApp.java:69-102: keyed ValueState on mid; is_new rewritten to "0"
  when the key was seen before).
- daily_first_visit ~ UniqueVisitApp UV dedup (UniqueVisitApp.java:53-102:
  24h-TTL ValueState keeps only the first visit per mid per day).
- sessionize / bounce ~ UserJumpDetailApp CEP bounce detection
  (UserJumpDetailApp.java:81-120: a session-start whose follow-up within the
  timeout is absent or itself a start is a "jump"). With gap-based session
  starts a follow-up inside the timeout is by construction not a start, so
  the batch semantics reduce to: session start with no next event within
  the bounce timeout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SESSION_GAP_S = 6 * 3600  # gap that opens a new session (tuned to events data)
BOUNCE_TIMEOUT_S = 6 * 3600  # reference uses 10 s with dense logs; scaled to fixture density


def _user_order(user_col: str, ts_col: str, id_col: str) -> Window:
    return Window.partitionBy(user_col).orderBy(ts_col, id_col)


def first_seen_flag(
    df: DataFrame, user_col: str = "user_id", ts_col: str = "ts", id_col: str = "event_id"
) -> DataFrame:
    """is_new=1 on each user's first-ever event, else 0 (T1)."""
    rn = F.row_number().over(_user_order(user_col, ts_col, id_col))
    return df.withColumn("is_new", F.when(rn == 1, F.lit(1)).otherwise(F.lit(0)))


def daily_first_visit(
    df: DataFrame, user_col: str = "user_id", ts_col: str = "ts"
) -> DataFrame:
    """One row per (user, day): the first visit (T2 UV dedup)."""
    day = F.date_trunc("day", F.col(ts_col))
    return (
        df.groupBy(F.col(user_col), day.alias("visit_day"))
        .agg(F.min(ts_col).alias("first_ts"), F.count("*").alias("visit_ct"))
    )


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_s: int = SESSION_GAP_S,
) -> DataFrame:
    """Mark session starts: first event or gap from previous > gap_s."""
    w = _user_order(user_col, ts_col, id_col)
    prev_ts = F.lag(ts_col).over(w)
    gap = F.col(ts_col).cast("double") - prev_ts.cast("double")
    return df.withColumn(
        "is_session_start", F.when(prev_ts.isNull() | (gap > gap_s), 1).otherwise(0)
    )


def bounce_events(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_s: int = SESSION_GAP_S,
    timeout_s: int = BOUNCE_TIMEOUT_S,
) -> DataFrame:
    """Session-start events with no follow-up within timeout_s (T3 bounce).

    Requires timeout_s <= gap_s: only then is a follow-up inside the bounce
    timeout by construction not itself a session start, which is what lets
    the reference's CEP pattern (UserJumpDetailApp.java:81-120) reduce to
    this lag/lead form. A larger timeout would silently drop jumps whose
    follow-up is a new session start — enforced, not assumed.
    """
    if timeout_s > gap_s:
        raise ValueError(
            f"bounce timeout_s ({timeout_s}) must be <= session gap_s ({gap_s}); "
            "the batch reduction of the CEP semantics is invalid otherwise"
        )
    w = _user_order(user_col, ts_col, id_col)
    out = sessionize(df, user_col, ts_col, id_col, gap_s).withColumn(
        "_next_ts", F.lead(ts_col).over(w)
    )
    next_gap = F.col("_next_ts").cast("double") - F.col(ts_col).cast("double")
    return out.where(
        (F.col("is_session_start") == 1) & (F.col("_next_ts").isNull() | (next_gap > timeout_s))
    ).drop("is_session_start", "_next_ts")
