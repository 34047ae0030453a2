"""Explicit StructTypes for every table shape the engine touches.

The reference infers schema everywhere (``pd.DataFrame(json_list)``,
``Part1/subscriber_project.py:42``) and declares types only in SQL DDL
(``Part3/stop.sql:7-42``).  This engine inverts that: schema is declared
once here, applied at every read, and drift fails fast at analysis time
(replacing the reference's runtime ``KeyError`` handling at
``Part3/stop_event_subscriber.py:129-133``).
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- raw breadcrumb ingest (TriMet API JSON; data dictionary in
# DataEngineering_Project_Part_2.pdf §A; loader Part1/subscriber_project.py:42-73)
BREADCRUMB_RAW = T.StructType(
    [
        T.StructField("EVENT_NO_TRIP", T.LongType()),
        T.StructField("EVENT_NO_STOP", T.LongType()),
        T.StructField("OPD_DATE", T.StringType()),  # ddMMMyyyy:HH:mm:ss
        T.StructField("VEHICLE_ID", T.IntegerType()),
        T.StructField("METERS", T.LongType()),
        T.StructField("ACT_TIME", T.IntegerType()),  # seconds since midnight
        T.StructField("GPS_LONGITUDE", T.DoubleType()),
        T.StructField("GPS_LATITUDE", T.DoubleType()),
        T.StructField("GPS_SATELLITES", T.IntegerType()),
        T.StructField("GPS_HDOP", T.DoubleType()),
    ]
)

# --- raw stop events (HTML-scraped, all strings; 24-column loader shape
# Part3/stop_event_subscriber.py:121-127 — the 16-column DDL at
# Part3/stop.sql:25-42 is a latent reference bug; we standardize on 24)
STOP_EVENT_COLUMNS = [
    "vehicle_number", "leave_time", "train", "route_number", "direction",
    "service_key", "trip_number", "stop_time", "arrive_time", "dwell",
    "location_id", "door", "lift", "ons", "offs", "estimated_load",
    "maximum_speed", "train_mileage", "pattern_distance",
    "location_distance", "x_coordinate", "y_coordinate", "data_source",
    "schedule_status",
]
STOP_EVENT_RAW = T.StructType([T.StructField(c, T.StringType()) for c in STOP_EVENT_COLUMNS])

# --- warehouse tables (Part3/stop.sql:7-22 + loader renames
# Part1/subscriber_project.py:81-100; route_id declared INT, not TEXT —
# the reference compares it numerically, q1.py:22 / q2.py:22)
TRIP = T.StructType(
    [
        T.StructField("trip_id", T.LongType(), False),
        T.StructField("route_id", T.IntegerType()),
        T.StructField("vehicle_id", T.IntegerType()),
        T.StructField("service_key", T.StringType()),
        T.StructField("direction", T.StringType()),
    ]
)

BREADCRUMB = T.StructType(
    [
        T.StructField("tstamp", T.TimestampType()),
        T.StructField("latitude", T.DoubleType()),
        T.StructField("longitude", T.DoubleType()),
        T.StructField("speed", T.DoubleType()),
        T.StructField("trip_id", T.LongType(), False),
    ]
)

# --- driver testdata tables (TESTDATA.md) — stand-ins per FIXTURES.md §4
DRIVER_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)
