"""Breadcrumb transform chain + warehouse split — SURVEY.md §3.2 stages 3-4.

Reference: ``Part1/subscriber_project.py:42-100``.  The pandas version
is: parse timestamps row-wise, global sort, ``diff()`` speed, global
``bfill()``, dedup-first for the trip table, two projections.  Here the
whole chain is lazy Catalyst expressions over one window partitioned by
trip — a single shuffle, no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.scalar import act_time_timestamp, parse_opd_date, service_key_from_ts
from ..functions.windows import backfill_clip, dedup_first_row, odometer_speed


def enrich_breadcrumbs(raw: DataFrame) -> DataFrame:
    """Raw breadcrumb records → enriched frame with TIMESTAMP, service_key,
    per-trip SPEED (m/s), null-filled GPS.

    Mirrors Part1/subscriber_project.py:48-73 stage by stage:
      F1 parse OPD_DATE → F2 +ACT_TIME seconds → F4/F5 service key →
      W1 Δmeters/Δt speed → W2 per-trip backfill + clip → P5 GPS fillna.
    """
    opd = parse_opd_date("OPD_DATE")
    df = (
        raw.withColumn("OPD_TS", opd)
        .withColumn("TIMESTAMP", act_time_timestamp(F.col("OPD_TS"), F.col("ACT_TIME")))
        .withColumn("service_key", service_key_from_ts("TIMESTAMP"))
    )
    w = Window.partitionBy("EVENT_NO_TRIP").orderBy("TIMESTAMP", "VEHICLE_ID")
    w_fwd = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    df = df.withColumn("SPEED", odometer_speed(F.col("METERS"), F.col("ACT_TIME"), w))
    df = df.withColumn("SPEED", backfill_clip(F.col("SPEED"), w_fwd))
    return df.fillna({"GPS_LATITUDE": 0.0, "GPS_LONGITUDE": 0.0})


def trip_table(enriched: DataFrame) -> DataFrame:
    """A7 + P1 + P4 — one dimension row per trip.

    Deterministic first-row-per-trip (row_number, not dropDuplicates),
    then the loader's projection/rename with constant route_id=0 /
    direction='Out' defaults (Part1/subscriber_project.py:76-89)."""
    w = Window.partitionBy("EVENT_NO_TRIP").orderBy("TIMESTAMP", "VEHICLE_ID")
    return (
        enriched.withColumn("_first", dedup_first_row(w))
        .filter(F.col("_first"))
        .select(
            F.col("EVENT_NO_TRIP").alias("trip_id"),
            F.lit(0).alias("route_id"),
            F.col("VEHICLE_ID").alias("vehicle_id"),
            F.col("service_key"),
            F.lit("Out").alias("direction"),
        )
    )


def breadcrumb_table(enriched: DataFrame) -> DataFrame:
    """P2 — fact projection/rename (Part1/subscriber_project.py:92-100)."""
    return enriched.select(
        F.col("TIMESTAMP").alias("tstamp"),
        F.col("GPS_LATITUDE").alias("latitude"),
        F.col("GPS_LONGITUDE").alias("longitude"),
        F.col("SPEED").alias("speed"),
        F.col("EVENT_NO_TRIP").alias("trip_id"),
    )


def coerce_breadcrumbs(raw: DataFrame) -> DataFrame:
    """P6+P7 — lossy numeric coercion + unparseable-row drop, the direct
    loader's cleanup (Part3/load_breadcrumb.py:33-49): ``try_cast`` turns
    malformed numerics into NULL exactly like ``pd.to_numeric(errors=
    'coerce')`` (and never raises under ANSI mode), then rows whose
    OPD_DATE failed to parse are dropped."""
    return (
        raw.withColumn("OPD_TS", parse_opd_date("OPD_DATE"))
        .withColumn("GPS_LATITUDE", F.col("GPS_LATITUDE").try_cast("double"))
        .withColumn("GPS_LONGITUDE", F.col("GPS_LONGITUDE").try_cast("double"))
        .withColumn("EVENT_NO_TRIP", F.col("EVENT_NO_TRIP").try_cast("long"))
        .withColumn("ACT_TIME", F.col("ACT_TIME").try_cast("int"))
        .dropna(subset=["OPD_TS"])
    )


def reorder_to_layout(df: DataFrame, expected: list[str]) -> DataFrame:
    """P3 — fixed column layout with fail-fast on missing columns
    (Part3/stop_event_subscriber.py:121-133): ``select`` raises
    AnalysisException when a column is absent, the same error contract
    as the reference's explicit KeyError check."""
    return df.select(*expected)


def trip_polylines_pandas(breadcrumb: DataFrame) -> DataFrame:
    """X4/A9 — per-trip polyline assembly as a grouped-map
    ``applyInPandas`` (the reference's ``df.groupby('trip_id')`` +
    per-group sort, visualize_map.py:40-42).  Kept as surface parity for
    genuinely imperative per-group logic; the declarative twin
    (sort_array(collect_list(struct))) in plans/core.py:q31 is the
    preferred plan — a test pins both to identical output."""
    import pandas as pd

    from ..sources.readers import _pickle_module_by_value

    _pickle_module_by_value(__name__)

    def assemble(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["tstamp", "point_id"])
        return pd.DataFrame(
            {
                "trip_id": [pdf["trip_id"].iloc[0]],
                "n_points": [len(pdf)],
                "series": [";".join(str(int(p)) for p in pdf["point_id"])],
            }
        )

    return breadcrumb.groupBy("trip_id").applyInPandas(
        assemble, "trip_id long, n_points long, series string"
    )
