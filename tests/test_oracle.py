"""Every registry query with an oracle must hash-match DuckDB — the local
mirror of the driver's CORRECTNESS gate. Runs at sf0.001 for speed; set
SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01 for the full check."""

from __future__ import annotations

import pytest

from flink_real_time_data_warehouse_spark.queries import registry

from .conftest import TEST_SF_DIR, assert_df_equal

QUERIES = registry()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, duck):
    q = QUERIES[name]
    df = q.spark(spark, TEST_SF_DIR)
    if q.oracle is None:
        assert df.count() >= 0  # rows-only smoke for non-SQL-expressible ops
        return
    assert_df_equal(df, duck(TEST_SF_DIR).sql(q.oracle), name)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
