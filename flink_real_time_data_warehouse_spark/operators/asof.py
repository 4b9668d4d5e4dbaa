"""As-of (temporal last-value) join.

For each left row, attach the most recent right row with the same key and
`right_ts <= left_ts`. The reference approximates this need with bounded
interval joins + dim caches; a true as-of join is the general form (and a
staple of market/telemetry data).

Spark has no built-in as-of join. The naive formulations both fall over at
scale: a range-condition join degenerates to a per-key cross product, and
groupBy(left).max(right_ts) double-joins. This implementation is the
scalable union-merge form:

    1. tag left (probe) and right (build) rows, unionByName
    2. one shuffle+sort per key: window (key ORDER BY ts, tag)
       with `last_value(right_cols, ignoreNulls=True)` carries the latest
       right values forward onto every subsequent left row
    3. keep left rows

Cost: a single hash shuffle of |L|+|R| rows and a per-partition sort —
the same profile as a sort-merge join, with no blowup on hot keys.
A tolerance bound (`max_lookback`) nulls out matches older than the bound
(the interval-join semantics as a special case).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    max_lookback_s: float | None = None,
) -> DataFrame:
    """Left as-of join: every left row + latest right values at or before
    its timestamp (right_ts <= left_ts). Ties on timestamp: the right row
    sorts first (tag ordering), so an exactly-simultaneous right row IS
    visible to the left row — matching DuckDB ASOF JOIN (<=) semantics.
    """
    lcols = left.columns
    l_tag = left.select(
        F.col(key).alias("_k"), F.col(left_ts).alias("_ts"), F.lit(1).alias("_tag"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in right_cols],
    )
    r_tag = right.select(
        F.col(key).alias("_k"), F.col(right_ts).alias("_ts"), F.lit(0).alias("_tag"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
    )
    merged = l_tag.unionByName(r_tag)
    w = Window.partitionBy("_k").orderBy("_ts", "_tag").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    carried = [
        F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_r_{c}") for c in right_cols
    ]
    carried_ts = F.last(F.when(F.col("_tag") == 0, F.col("_ts")), ignorenulls=True).over(w)
    out = merged.select(
        "_k", "_ts", "_tag", *lcols, *carried, carried_ts.alias("_match_ts")
    ).where(F.col("_tag") == 1)
    if max_lookback_s is not None:
        in_range = (F.col("_ts").cast("double") - F.col("_match_ts").cast("double")) <= max_lookback_s
        out = out.select(
            *lcols,
            *[
                F.when(in_range, F.col(f"_r_{c}")).otherwise(F.lit(None)).alias(c)
                for c in right_cols
            ],
        )
    else:
        out = out.select(*lcols, *[F.col(f"_r_{c}").alias(c) for c in right_cols])
    return out
