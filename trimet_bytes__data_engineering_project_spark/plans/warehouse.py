"""Warehouse layout + integration view — SURVEY.md §1.1(3,4), §2.3 J3.

The reference's warehouse is three unpartitioned PostgreSQL heap tables
plus ``trip_full_view`` (Part3/stop.sql).  Here the tables are Parquet,
and the fact tables are **partitioned by service date** — the date-
equality predicates that dominate the query corpus (P12) become
partition pruning instead of index scans, which is the design that
survives 100 TB (a day of reference-scale data is ~75 MB; at fleet
scale a day is a few hundred GB — still one prunable partition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_trip(df: DataFrame, path: str, mode: str = "append") -> None:
    """trip dimension — small (≈1,623 rows/day, BASELINE.md), unpartitioned;
    always broadcastable on the join side."""
    df.write.mode(mode).parquet(path)


def write_breadcrumb(df: DataFrame, path: str, mode: str = "append") -> None:
    """breadcrumb fact — partitioned by service_date for pruning; sorted
    within partitions by (trip_id, tstamp) so per-trip windows read
    nearly-clustered row groups."""
    (
        df.withColumn("service_date", F.to_date("tstamp"))
        .sortWithinPartitions("trip_id", "tstamp")
        .write.mode(mode)
        .partitionBy("service_date")
        .parquet(path)
    )


def write_stop_events(df: DataFrame, path: str, mode: str = "append") -> None:
    """stop_events fact — 24-column loader shape (SURVEY §1.2), partitioned
    by service_key (the only low-cardinality column queries filter on)."""
    df.write.mode(mode).partitionBy("service_key").parquet(path)


def trip_full_view(trip: DataFrame, breadcrumb: DataFrame, stop_events: DataFrame) -> DataFrame:
    """J3 — the integration view (Part3/stop.sql:45-74): trip LEFT JOIN
    breadcrumb LEFT JOIN stop_events, both on trip_id.

    The m×n fan-out per trip is the reference's documented semantics
    (SURVEY §2.3).  trip is broadcast (≪10 MB even at fleet scale); the
    two fact sides join by shuffle on trip_id — co-partitioned, so AQE
    can reuse one exchange.  Column set mirrors the view's select list
    (stop.sql:47-70): all of trip, breadcrumb's measures, and the 10
    stop-event columns the DDL view touches."""
    se_cols = [
        F.col("vehicle_number"),
        F.col("route_number"),
        F.col("direction").alias("se_direction"),
        F.col("service_key").alias("se_service_key"),
        F.col("trip_number"),
        F.col("arrive_time"),
        F.col("leave_time"),
        F.col("dwell"),
        F.col("ons"),
        F.col("offs"),
    ]
    se = stop_events.select(F.col("trip_number").cast("long").alias("se_trip_id"), *se_cols)
    return (
        F.broadcast(trip)
        .join(breadcrumb, "trip_id", "left")
        .join(se, trip["trip_id"] == se["se_trip_id"], "left")
        .drop("se_trip_id")
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str = "trip_id",
    sort: str = "tstamp",
    n_buckets: int = 16,
    mode: str = "overwrite",
) -> None:
    """Bucketed fact layout for co-located joins (SURVEY §4 shuffle row;
    brief: "bucketing for co-located joins").

    ``bucketBy(n, key)`` fixes the hash-partitioning of the table ON
    DISK, so any join or aggregation keyed on ``key`` between two
    tables bucketed with the same ``n`` needs NO exchange at read time
    — at 100 TB the fact⋈fact join (breadcrumb⋈stop_events on trip_id)
    goes from two full shuffles to zero.  ``sortBy`` clusters rows
    within each bucket so per-trip windows sort-merge cheaply.

    Bucketed tables must live in the session catalog (``saveAsTable``)
    — the bucket spec is catalog metadata, invisible to a plain
    ``.parquet(path)`` reader."""
    (
        df.write.mode(mode)
        .bucketBy(n_buckets, key)
        .sortBy(key, sort)
        .format("parquet")
        .saveAsTable(table)
    )


def compact_partition(
    spark: SparkSession,
    path: str,
    partition_col: str,
    partition_value: str,
    target_rows_per_file: int = 1_000_000,
    sort_cols: tuple[str, ...] = ("trip_id", "tstamp"),
) -> int:
    """Small-file compaction for one partition of a written fact table —
    the maintenance job every streaming-append layout needs: micro-batch
    appends leave O(batches) small files per day-partition, and at fleet
    scale an uncompacted day degrades every scan (footer-read per file,
    no row-group locality).

    Rewrites ``path/partition_col=value`` as ``ceil(rows / target)``
    files, re-sorted by ``sort_cols`` so windows read clustered row
    groups again.  The rewrite goes through a temp directory + atomic
    directory swap: a reader never sees a half-compacted partition, and
    a crash mid-compact leaves the original intact.  Returns the number
    of files after compaction."""
    import math
    import os
    import shutil

    part_dir = os.path.join(path, f"{partition_col}={partition_value}")
    df = spark.read.parquet(part_dir)
    n_rows = df.count()
    n_files = max(1, math.ceil(n_rows / target_rows_per_file))
    tmp_dir = part_dir + "._compacting"
    (
        df.repartition(n_files)
        .sortWithinPartitions(*[c for c in sort_cols if c in df.columns])
        .write.mode("overwrite")
        .parquet(tmp_dir)
    )
    swap = part_dir + "._old"
    os.rename(part_dir, swap)
    os.rename(tmp_dir, part_dir)
    shutil.rmtree(swap)
    return len([f for f in os.listdir(part_dir) if f.endswith(".parquet")])


def register_warehouse(spark: SparkSession, trip_path: str, breadcrumb_path: str) -> None:
    """Register the tables + view in the session catalog so the SQL
    surface (spark.sql over trip/breadcrumb/trip_full_view) matches the
    reference's Postgres catalog."""
    spark.read.parquet(trip_path).createOrReplaceTempView("trip")
    spark.read.parquet(breadcrumb_path).createOrReplaceTempView("breadcrumb")
    spark.sql(
        """
        CREATE OR REPLACE TEMP VIEW trip_breadcrumb_view AS
        SELECT t.*, b.tstamp, b.latitude, b.longitude, b.speed
        FROM trip t LEFT JOIN breadcrumb b USING (trip_id)
        """
    )


def load_audit(tables: dict[str, DataFrame]) -> dict[str, int]:
    """S10 — post-load row-count probe (Part2/updated_subscriber.py:208-224):
    the received/inserted/total reconciliation the reference prints per
    run.  ``count()`` is a metadata-only parquet scan (row-group stats),
    so auditing a 100 TB table reads footers, not data."""
    return {name: df.count() for name, df in tables.items()}
