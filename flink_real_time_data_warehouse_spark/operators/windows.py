"""Tumbling-window helpers.

The reference stamps every DWS row with window bounds as
``yyyy-MM-dd HH:mm:ss`` strings (``stt``/``edt``) in the window finisher
(ProductStatsApp.java:282-301, VisitorStatsApp.java:183-198). We reproduce
that contract with ``date_trunc`` — for batch plans a plain group key (no
shuffle beyond the groupBy), for streaming plans ``F.window`` (see
streaming/pipelines.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_UNIT_INTERVAL = {"hour": "INTERVAL 1 HOUR", "day": "INTERVAL 1 DAY", "week": "INTERVAL 7 DAY"}

TS_FMT = "yyyy-MM-dd HH:mm:ss"


def tumble_bounds(ts: Column, unit: str) -> tuple[Column, Column]:
    """(stt, edt) string columns for the tumbling window containing `ts`."""
    if unit not in _UNIT_INTERVAL:
        raise ValueError(f"unit must be one of {sorted(_UNIT_INTERVAL)}")
    start = F.date_trunc(unit, ts)
    end = start + F.expr(_UNIT_INTERVAL[unit])
    return F.date_format(start, TS_FMT), F.date_format(end, TS_FMT)


def with_tumble(df: DataFrame, ts_col: str, unit: str) -> DataFrame:
    """Attach stt/edt window-bound columns (batch analog of a tumble window)."""
    stt, edt = tumble_bounds(F.col(ts_col), unit)
    return df.withColumn("stt", stt).withColumn("edt", edt)


def session_agg(
    df: DataFrame,
    ts_col: str,
    gap: str,
    keys: list,
    aggs: list,
) -> DataFrame:
    """Keyed session-window aggregate (Flink's EventTimeSessionWindows —
    the gap notion behind the reference's UserJumpDetail sessions, exposed
    as a first-class window op). Works on batch or streaming input;
    streaming needs a watermark on ts_col upstream.

    Session semantics (Spark's session_window): events merge while
    consecutive gaps are STRICTLY smaller than `gap`; the emitted window is
    [first_ts, last_ts + gap). An oracle must sessionize with
    `diff >= gap` starting a new session to match the boundary exactly.
    """
    grouped = df.groupBy(F.session_window(F.col(ts_col), gap).alias("win"), *keys).agg(*aggs)
    return grouped.select(
        F.date_format("win.start", TS_FMT).alias("stt"),
        F.date_format("win.end", TS_FMT).alias("edt"),
        *[c for c in grouped.columns if c != "win"],
    )
