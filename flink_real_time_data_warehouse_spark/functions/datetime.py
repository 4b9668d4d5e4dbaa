"""Datetime scalar functions (SURVEY §2.8 F1-F8).

The reference's DateTimeUtil (utils/DateTimeUtil.java:11-24) wraps a
thread-safe formatter for `yyyy-MM-dd HH:mm:ss` with a hardcoded +8 zone;
its SQL apps use TO_TIMESTAMP / FROM_UNIXTIME / DATE_FORMAT /
UNIX_TIMESTAMP, apps split datetime strings (OrderWideApp.java:56-58) and
approximate age from a birthday (OrderWideApp.java:137-147, flagged fixme).
All are thin aliases over Spark built-ins; the engine normalizes to UTC
(session.py) instead of +8 — documented divergence for oracle parity.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

FMT = "yyyy-MM-dd HH:mm:ss"


def to_ts(s: Column) -> Column:
    """F1/F6 toTs: parse 'yyyy-MM-dd HH:mm:ss' string -> timestamp."""
    return F.to_timestamp(s, FMT)


def from_epoch_millis(ms: Column) -> Column:
    """F2: epoch milliseconds -> timestamp (FROM_UNIXTIME(ts/1000) chain)."""
    return F.timestamp_millis(ms)


def fmt(ts: Column) -> Column:
    """F3/F6 toYMDhms: timestamp -> 'yyyy-MM-dd HH:mm:ss'."""
    return F.date_format(ts, FMT)


def now_epoch_millis() -> Column:
    """F4: processing-time stamp column (UNIX_TIMESTAMP()*1000). Excluded
    from golden-output hashing — non-deterministic by design."""
    return (F.unix_timestamp() * 1000).cast("long")


def split_date_hour(ts: Column) -> tuple[Column, Column]:
    """F7/P5: the reference splits 'yyyy-MM-dd HH:mm:ss' on ' ' and ':'
    (OrderWideApp.java:56-58); equivalent derived columns."""
    return F.date_format(ts, "yyyy-MM-dd"), F.hour(ts).cast("int")


def age_years(birthday: Column, asof: Column) -> Column:
    """F8: age in whole years ~ floor(days/365.25) (reference divides epoch
    ms by 365*24h, its fixme; we use the 365.25 intended form)."""
    return F.floor(F.datediff(asof, birthday) / 365.25).cast("long")
