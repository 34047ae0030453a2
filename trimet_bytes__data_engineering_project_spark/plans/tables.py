"""Driver-table access + cross-engine-safe expression helpers.

Hash-parity rules used throughout the corpus (the driver compares
row-count + schema + order-insensitive value hashes against DuckDB):

- **Timestamps**: ``events.ts`` is parquet TIMESTAMP(NANOS), which Spark
  cannot scan natively; we read it via ``spark.sql.legacy.parquet.
  nanosAsLong`` and rebuild a microsecond TIMESTAMP_NTZ with integer
  ``div`` (never double division — ns-epoch exceeds a double's 53-bit
  mantissa).  DuckDB's parquet reader truncates ns→µs the same way, so
  values match bit-for-bit.  Session timezone is pinned to UTC so
  NTZ↔LTZ casts are identity.
- **Double aggregates**: SUM/AVG over doubles is order-dependent, so a
  shuffled Spark sum need not equal DuckDB's serial sum.  Every money/
  measure aggregate goes through ``DECIMAL(18,2)`` (exact, associative),
  is cast to DOUBLE once at the end, and averages are computed as one
  IEEE division of two exact values — deterministic in both engines.
- **Top-k**: every ORDER BY ... LIMIT carries a unique tie-break key so
  the selected *set* is deterministic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def _session_cache(spark: SparkSession) -> dict:
    """Per-session memo dict stored ON the session object: it dies with
    the session (no global registry pinning sessions or DataFrames
    forever) and cannot suffer id()-reuse aliasing — a new session at a
    recycled address is a different object with no attribute."""
    cache = getattr(spark, "_tb_table_cache", None)
    if cache is None:
        cache = {}
        spark._tb_table_cache = cache
    return cache


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver parquet table (TESTDATA.md shapes).

    The source DataFrame (resolved scan relation) is memoized per
    (session, dir, table): re-reading re-lists the directory and
    re-reads footers for schema on every call — a fixed ~0.1-0.5 s of
    driver work that every query in a corpus run would otherwise repay.
    Downstream plans are still built fresh on top; results are
    unchanged (the driver tables are immutable inputs — re-writing a
    table at the same path in-session would serve the stale listing)."""
    key = (sf_dir, name)
    cache = _session_cache(spark)
    cached = cache.get(key)
    if cached is not None:
        if name == "events":
            # runtime-settable legacy conf; must stay set while plans execute
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            spark.conf.set("spark.sql.session.timeZone", "UTC")
        return cached
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        df = spark.read.parquet(f"{sf_dir}/events.parquet")
        # Two generations of driver testdata exist: TIMESTAMP(NANOS)
        # (scanned as bigint under nanosAsLong — rebuild µs with integer
        # div) and native TIMESTAMP(MICROS) (scan directly; UTC session
        # tz makes the LTZ→NTZ cast identity).  Branch on the scanned
        # type so either layout normalizes to the same µs TIMESTAMP_NTZ.
        if dict(df.dtypes)["ts"] == "bigint":
            df = df.withColumn(
                "ts", F.expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)")
            )
        else:
            df = df.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    else:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    cache[key] = df
    return df


def epoch_us(col: Column) -> Column:
    """Exact µs-since-epoch of an NTZ timestamp (session tz pinned UTC by
    ``load_table``, so the NTZ→LTZ cast is identity).  DuckDB twin:
    ``epoch_us(ts)``."""
    return F.unix_micros(col.cast("timestamp"))


def dec_sum(col: Column) -> Column:
    """Order-independent sum of a 2-decimal measure, emitted as DOUBLE.
    DuckDB twin: ``CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE)``."""
    return F.sum(col.cast("decimal(18,2)")).cast("double")


def safe_avg(col: Column) -> Column:
    """Deterministic mean: exact decimal sum, one IEEE division.
    DuckDB twin: ``CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE) / COUNT(x)``."""
    return F.sum(col.cast("decimal(18,2)")).cast("double") / F.count(col)
