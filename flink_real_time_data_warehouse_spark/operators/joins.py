"""Join operators: dimension enrichment and interval joins.

Spark-first replacements for the reference's join machinery:

- Dim enrichment: the reference does per-record async Phoenix lookups behind a
  Redis cache-aside (app/function/DimAsyncFunction.java:17-71,
  utils/DimUtil.java:15-49, utils/ThreadPoolUtil.java). On Spark the dim
  snapshot is a broadcast hash join — the broadcast IS the cache, coherent per
  batch/trigger, with zero custom threading.
- Interval join: the reference uses Flink's intervalJoin with event-time
  bounds (OrderWideApp.java:94-105 ±5s; PaymentWideApp.java:85-94
  -15min/+5min). In Spark this is an equi-join plus a time-range predicate;
  Catalyst plans the equi part as a hash join and evaluates the range as a
  post-join filter (and in streaming the same shape + watermarks bounds
  state retention).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dim_enrich(
    fact: DataFrame,
    dims: Sequence[tuple[DataFrame, Column, Sequence[Column]]],
    how: str = "inner",
) -> DataFrame:
    """Star-schema enrichment: join each (dim, condition, projected cols).

    Every dim is broadcast — at 100 TB fact scale the dims here (region,
    nation, customer, part) are MBs to low GBs; a shuffle join on the fact
    would be the single worst plan choice, so we pin the hint rather than
    rely on autoBroadcastJoinThreshold.
    """
    out = fact
    for dim, cond, cols in dims:
        out = out.join(F.broadcast(dim.select(*cols)), cond, how)
    return out


def interval_join(
    left: DataFrame,
    right: DataFrame,
    keys: Column,
    left_ts: Column,
    right_ts: Column,
    lower: str,
    upper: str,
    how: str = "inner",
) -> DataFrame:
    """Event-time interval join: keys match AND
    ``left_ts + lower <= right_ts <= left_ts + upper``.

    `lower`/`upper` are SQL interval literals, e.g. ``"INTERVAL 0 DAY"``,
    ``"INTERVAL -15 MINUTE"``. The equi `keys` part carries the shuffle;
    the band predicate never widens the shuffle key space.
    """
    band = (right_ts >= left_ts + F.expr(lower)) & (right_ts <= left_ts + F.expr(upper))
    return left.join(right, keys & band, how)
