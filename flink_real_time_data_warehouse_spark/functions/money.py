"""Cross-engine-deterministic money arithmetic.

The reference carries money as BigDecimal (bean/OrderInfo.java:13-17) and the
oracle is DuckDB — but double→DECIMAL casts round differently across engines
(observed: 177/2000 groups off by one cent). So money flows as integer
cents derived with pure IEEE-double ops that are bit-identical everywhere:

    cents = floor(x * 100 + 0.5)        # round-half-up, exact for x >= 0
    sum(cents)                          # exact integer arithmetic
    sum / 100.0                         # one final double division

Spark-side helpers return Columns; the ``sql_*`` helpers emit the mirrored
ANSI fragment for the DuckDB oracle. At 100 TB the cents sums stay inside
int64 and the final division is per-group, so this costs nothing.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def cents(x: Column) -> Column:
    """Integer cents of a (non-negative) double money expression."""
    return F.floor(x * 100 + F.lit(0.5)).cast("long")


def money(x: Column) -> Column:
    """Per-row money value normalized to exact cents, emitted as double."""
    return cents(x) / F.lit(100.0)


def money_sum(x: Column) -> Column:
    """Order-independent exact money sum, emitted as double (0.0 if empty)."""
    return F.coalesce(F.sum(cents(x)), F.lit(0)) / F.lit(100.0)


def sql_cents(x: str) -> str:
    return f"CAST(floor(({x}) * 100 + 0.5) AS BIGINT)"


def sql_money(x: str) -> str:
    return f"{sql_cents(x)} / 100.0"


def sql_money_sum(x: str) -> str:
    return f"coalesce(sum({sql_cents(x)}), 0) / 100.0"
