"""SparkSession factory.

The reference delegates all execution to pandas + PostgreSQL with no
tuning beyond B-tree indexes (SURVEY.md §4).  Here the session *is* the
engine, so the scale-relevant knobs live in one place:

- AQE on (runtime coalesce, skew-join splitting) — the 100 TB path.
- ``spark.sql.shuffle.partitions`` sized to cores for local runs; on a
  real cluster AQE's coalesce makes the initial number a ceiling.
- UTC session timezone — parquet timestamps compare bit-for-bit against
  the DuckDB oracle.
- ANSI off — the reference's ``pd.to_numeric(errors='coerce')`` /
  ``to_datetime(errors='coerce')`` semantics (NULL on bad input, never
  raise) map to Spark's non-ANSI casts (SURVEY.md §2.8 F1/F7/F11).
- Arrow on — every Pandas-UDF boundary (html parse, multimodal stubs)
  is Arrow-batched, never row-at-a-time pickling.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_session(
    app_name: str = "trimet-bytes-spark",
    cpus: int | None = None,
    ui: bool = False,
) -> SparkSession:
    """``ui=True`` enables the Spark UI solely for its task-metrics REST
    endpoint (bench.py's executor-CPU probe — r11 verdict item 4); the
    default stays off so tests and the driver's entry smoke never race
    on ports."""
    n = cpus or default_parallelism()
    return (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(n))
        .config("spark.ui.enabled", "true" if ui else "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        # catalog tables (bucketed layouts) land outside the repo tree
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_GRAFT_WAREHOUSE_DIR", "/tmp/trimet_spark_warehouse"),
        )
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .getOrCreate()
    )
