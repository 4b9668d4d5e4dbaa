"""Parsing + stream-splitting operators (SURVEY §2.2 P1/P2, §2.3 R1).

- parse_json_logs: the dirty-data side output (BaseLogApp.java:49-67) —
  try-parse each line, route failures to a dead-letter DataFrame instead of
  failing the pipeline. In Spark: one `from_json` pass; a row is dirty iff
  the parse returned null for a non-null input. Both outputs derive from
  the same scan; Catalyst shares it.
- explode_entries: the display-array flatten with parent-field propagation
  (BaseLogApp.java:125-139 adds page_id to every exploded display row).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def parse_json_logs(
    df: DataFrame, raw_col: str, schema: StructType
) -> tuple[DataFrame, DataFrame]:
    """(clean, dirty): clean rows carry the parsed struct in `parsed`;
    dirty rows keep the raw line for a dead-letter sink.

    `from_json` in PERMISSIVE mode yields an all-null struct for bad input,
    so corruption is detected via the columnNameOfCorruptRecord field, which
    holds the raw text iff the parse failed."""
    from pyspark.sql.types import StringType, StructField

    # copy: StructType.add mutates in place, don't touch the caller's schema
    with_corrupt = StructType(list(schema.fields) + [StructField("_corrupt_record", StringType())])
    parsed = df.withColumn(
        "parsed",
        F.from_json(
            F.col(raw_col), with_corrupt,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt_record"},
        ),
    )
    is_dirty = F.col("parsed._corrupt_record").isNotNull()
    clean = parsed.where(~is_dirty).withColumn("parsed", F.col("parsed").dropFields("_corrupt_record"))
    dirty = parsed.where(is_dirty).drop("parsed")
    return clean, dirty


def explode_entries(
    df: DataFrame, array_col: str, parent_cols: list[str], entry_alias: str = "entry"
) -> DataFrame:
    """Flatten an array-of-structs column, propagating parent columns onto
    every exploded row (the reference's page_id injection)."""
    return df.select(*parent_cols, F.explode(F.col(array_col)).alias(entry_alias))
