"""Shared test fixtures: one local SparkSession + a DuckDB oracle runner
that mimics the driver's comparison (sort columns by name, order-insensitive
row compare, exact values)."""

from __future__ import annotations

import math
import os
from datetime import datetime
from decimal import Decimal

import duckdb
import pytest

from flink_real_time_data_warehouse_spark.session import get_spark
from flink_real_time_data_warehouse_spark.tables import TABLE_NAMES

TEST_SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
ORACLE_SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    # Tests run at sf0.001 (KB-scale inputs): 4 shuffle partitions keeps
    # every stage's task count (and each streaming trigger's state-store
    # file count) proportional to the data instead of the machine's 32
    # cores — same guide-§2.2 sizing the engine itself applies via
    # session.stream_partitions; results are partition-count-invariant
    # (the oracle comparisons prove it).
    s = get_spark("frtdw-tests", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def duck():
    def make(sf_dir: str) -> duckdb.DuckDBPyConnection:
        con = duckdb.connect()
        for t in TABLE_NAMES:
            con.sql(f"CREATE OR REPLACE VIEW {t} AS FROM '{sf_dir}/{t}.parquet'")
        return con

    cache: dict[str, duckdb.DuckDBPyConnection] = {}

    def get(sf_dir: str) -> duckdb.DuckDBPyConnection:
        if sf_dir not in cache:
            cache[sf_dir] = make(sf_dir)
        return cache[sf_dir]

    yield get
    for con in cache.values():
        con.close()


def _canon(v):
    """Canonicalize a cell for cross-engine comparison."""
    import numpy as np

    if v is None:
        return None
    if isinstance(v, np.ndarray):
        return tuple(_canon(x) for x in v.tolist())
    if isinstance(v, np.generic):
        return _canon(v.item())
    if isinstance(v, Decimal):
        return ("dec", str(v.normalize()))
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", v)  # exact: our plans only emit deterministic doubles
    if isinstance(v, datetime):
        return ("ts", v.replace(tzinfo=None).isoformat())
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    return v


def assert_df_equal(spark_df, oracle_rel, name=""):
    """Driver-style compare: row count, column names, order-insensitive values."""
    sp = spark_df.toPandas()
    du = oracle_rel.df()
    sp_cols, du_cols = sorted(sp.columns), sorted(du.columns)
    assert sp_cols == du_cols, f"{name}: columns differ: {sp_cols} vs {du_cols}"
    sp = sp[sp_cols]
    du = du[du_cols]
    assert len(sp) == len(du), f"{name}: row counts differ: {len(sp)} vs {len(du)}"
    sp_rows = sorted((tuple(_canon(v) for v in row) for row in sp.itertuples(index=False)), key=repr)
    du_rows = sorted((tuple(_canon(v) for v in row) for row in du.itertuples(index=False)), key=repr)
    for i, (a, b) in enumerate(zip(sp_rows, du_rows)):
        assert a == b, f"{name}: row {i} differs:\n  spark  {a}\n  oracle {b}"
