"""Data-quality validation + quarantine — SURVEY.md §2.2 P16/P17.

The reference runs 20 row-wise validator functions in Python loops
(``Part2/updated_subscriber.py:72-150`` for breadcrumbs,
``Part3/stop_event_subscriber.py:36-111`` for stop events), logging and
dropping failures one row at a time.  Here each validator is a named
native predicate; the batch is split once into (valid, quarantine)
with a ``violations`` array column on the quarantine side — one codegen
pass, no Python, and the audit trail the reference printed to a log
becomes a queryable DataFrame.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.scalar import is_digits


def breadcrumb_validators() -> dict[str, Column]:
    """P16 — the 10 breadcrumb assertions of Part2/updated_subscriber.py:72-150.

    Keyed by the reference's assertion intent; each value is True for
    valid rows.  Applied to the *enriched* frame (post-transform), as in
    the reference."""
    return {
        "opd_date_nonempty": F.col("OPD_DATE").isNotNull() & (F.length("OPD_DATE") > 0),
        "vehicle_id_positive": F.col("VEHICLE_ID") > 0,
        "act_time_in_day": F.col("ACT_TIME").between(0, 86399),
        "latitude_in_range": F.col("GPS_LATITUDE").isNull() | F.col("GPS_LATITUDE").between(-90.0, 90.0),
        "longitude_in_range": F.col("GPS_LONGITUDE").isNull() | F.col("GPS_LONGITUDE").between(-180.0, 180.0),
        "trip_id_positive": F.col("EVENT_NO_TRIP") > 0,
        "meters_nonnegative": F.col("METERS") >= 0,
        "speed_nonnegative": F.col("SPEED").isNull() | (F.col("SPEED") >= 0),
        "timestamp_present": F.col("TIMESTAMP").isNotNull(),
        "dow_in_range": F.weekday("TIMESTAMP").between(0, 6),
    }


def stop_event_validators() -> dict[str, Column]:
    """P17 — the 10 stop-event assertions of Part3/stop_event_subscriber.py:52-111.

    Input is the 24-column all-string scrape shape; numeric rules cast
    with non-ANSI (coerce) semantics, so non-numeric text fails the rule
    rather than erroring — same outcome as the reference's try/except."""
    arrive = F.col("arrive_time").cast("int")
    leave = F.col("leave_time").cast("int")
    return {
        "vehicle_number_digits": is_digits("vehicle_number"),
        "trip_number_digits": is_digits("trip_number"),
        "location_id_digits": is_digits("location_id"),
        "stop_time_nonempty": F.col("stop_time").isNotNull() & (F.length("stop_time") > 0),
        "max_speed_in_range": F.col("maximum_speed").cast("double").between(0.0, 70.0),
        "direction_domain": F.col("direction").isin("0", "1"),
        "service_key_domain": F.col("service_key").isin("W", "S", "U"),
        "arrive_before_leave": arrive.isNotNull() & leave.isNotNull() & (arrive <= leave),
        "load_domain": F.col("estimated_load").isin("", "low", "medium", "high"),
        "dwell_nonnegative": F.col("dwell").cast("int") >= 0,
    }


def quarantine_split(df: DataFrame, validators: dict[str, Column]) -> tuple[DataFrame, DataFrame]:
    """Split into (valid, quarantined-with-violations).

    ``violations`` lists every failed rule name (NULL predicate results
    count as failures, matching the reference's assert-style drops).
    Both outputs derive from one annotated plan, so Catalyst computes the
    rule array once; at scale this is a single scan, not 20."""
    rules = F.array(
        *[F.when(cond.isNull() | ~cond, F.lit(name)) for name, cond in validators.items()]
    )
    annotated = df.withColumn("violations", F.array_compact(rules))
    valid = annotated.filter(F.size("violations") == 0).drop("violations")
    quarantined = annotated.filter(F.size("violations") > 0)
    return valid, quarantined
