"""Skew-handling join: explicit key salting.

At 100 TB a handful of hot keys (the viral sku, the bot user) can pin a
whole stage on one task. First line of defense is AQE skew-join splitting
(enabled in session.py) — it splits oversized *partitions*. Salting goes
further: it splits a single hot *key* across `salt_n` tasks by replicating
the build side, and composes with any join the planner picks.

    left (big, skewed):  salt = pmod(xxhash64(entire row id), n)
    right (small/dim):   exploded n ways, one copy per salt value
    join on (key, salt)  -> hot key now spreads over n tasks

The salt on the left is a deterministic function of a row-unique column so
results are reproducible run to run (no rand()).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt_from: str,
    salt_n: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join `left` and `right` on `key` with the right side replicated
    `salt_n` times. `salt_from` is any left column unique-ish per row (an
    event id) used to derive the deterministic salt."""
    l_salted = left.withColumn("_salt", F.pmod(F.xxhash64(F.col(salt_from)), F.lit(salt_n)))
    r_salted = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_n - 1)))
    ).withColumn("_salt", F.col("_salt").cast("long"))
    out = l_salted.join(r_salted, [key, "_salt"], how)
    return out.drop("_salt")
