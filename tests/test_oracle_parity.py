"""Driver-mimicking correctness gate: every registered query runs in
Spark AND as its DuckDB oracle twin at sf=0.01; results must match on
row count, column-name set, and (column-sorted, row-sorted) values —
exactly, including float bits (the corpus is designed to be
bit-deterministic across engines, see plans/tables.py).
"""

from __future__ import annotations

import datetime
import os

import duckdb
import pandas as pd
import pytest

from trimet_bytes__data_engineering_project_spark.plans import ORACLES, QUERIES
from trimet_bytes__data_engineering_project_spark.schemas import DRIVER_TABLES

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in DRIVER_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def canonical(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object and df[c].map(
            lambda v: v is None or isinstance(v, (datetime.date, datetime.datetime))
        ).all() and df[c].notna().any():
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
    df = df.sort_values(by=list(df.columns), na_position="last", kind="mergesort")
    return df.reset_index(drop=True)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(name, spark, duck):
    spark_df = QUERIES[name](spark, SF_DIR).toPandas()
    duck_df = duck.sql(ORACLES[name]).df()
    assert sorted(spark_df.columns) == sorted(duck_df.columns), (
        f"{name}: columns {sorted(spark_df.columns)} != {sorted(duck_df.columns)}"
    )
    assert len(spark_df) == len(duck_df), f"{name}: {len(spark_df)} vs {len(duck_df)} rows"
    left, right = canonical(spark_df), canonical(duck_df)
    # The driver's value-hash distinguishes 1 from 1.0 (r03's x24 red row was a
    # DuckDB HUGEINT-window-sum -> float64 artifact with identical values), so
    # a float/non-float dtype-class mismatch must fail locally even when values
    # compare equal under check_dtype=False.
    for c in left.columns:
        lf, rf = left[c].dtype.kind == "f", right[c].dtype.kind == "f"
        assert lf == rf, (
            f"{name}.{c}: dtype-class mismatch {left[c].dtype} vs {right[c].dtype}"
            " — driver hash would flag this even with equal values"
        )
    pd.testing.assert_frame_equal(left, right, check_dtype=False, check_exact=True)


def test_all_queries_have_entries():
    assert QUERIES, "registry must not be empty"
    missing = set(ORACLES) - set(QUERIES)
    assert not missing, f"oracles without queries: {missing}"
