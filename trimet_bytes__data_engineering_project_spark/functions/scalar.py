"""Scalar column expressions — SURVEY.md §2.8 (F1-F15).

Every reference scalar op was a row-wise Python function (``.apply`` /
``.iterrows``); here each is a native Catalyst expression, so the whole
transform chain stays inside whole-stage codegen.  No Python UDFs.
"""

from __future__ import annotations

import pandas as pd  # annotation target for the X1 pandas_udf signature
from pyspark.sql import Column
from pyspark.sql import functions as F

# Reference format: '07JAN2023:00:00:00' (Part1/subscriber_project.py:48).
# Java's MMM parses the abbreviated month case-insensitively under the
# default locale, matching pandas to_datetime('%d%b%Y:%H:%M:%S').
OPD_DATE_FORMAT = "ddMMMyyyy:HH:mm:ss"

SECONDS_PER_DAY_MAX = 86399


def parse_opd_date(col: Column | str) -> Column:
    """F1 — format-aware timestamp parse, NULL on failure.

    Mirrors ``pd.to_datetime(OPD_DATE, format='%d%b%Y:%H:%M:%S',
    errors='coerce')`` (Part1/subscriber_project.py:48).  ``try_to_timestamp``
    gives the coerce (NULL-not-raise) behavior regardless of ANSI mode.
    """
    return F.try_to_timestamp(F.col(col) if isinstance(col, str) else col, F.lit(OPD_DATE_FORMAT))


def act_time_timestamp(opd_ts: Column, act_time: Column) -> Column:
    """F2+F3 — event timestamp = OPD_DATE midnight + clamped ACT_TIME seconds.

    Replaces the reference's row-wise ``create_timestamp`` UDF
    (Part1/subscriber_project.py:55-64) with a pure expression:
    ``ts + least(ACT_TIME, 86399) seconds``.
    """
    secs = F.least(act_time.cast("long"), F.lit(SECONDS_PER_DAY_MAX).cast("long"))
    return F.timestamp_seconds(F.unix_timestamp(opd_ts) + secs)


def pg_dow(ts: Column | str) -> Column:
    """F4 — day-of-week, PostgreSQL EXTRACT(DOW) numbering (Sunday=0).

    Spark ``dayofweek`` is Sunday=1..Saturday=7; the reference query
    corpus (PDF Q3/Q5, q3.py:18) uses PG numbering, so offset by 1.
    DuckDB ``dayofweek`` is already Sunday=0 — oracle SQL uses it as-is.
    """
    c = F.col(ts) if isinstance(ts, str) else ts
    return (F.dayofweek(c) - F.lit(1)).alias("dow")


def service_key_from_weekday(weekday_mon0: Column) -> Column:
    """F5 — {0..4: Weekday, 5: Saturday, 6: Sunday} categorical map
    (Part1/subscriber_project.py:50-53; pandas Monday=0 numbering)."""
    return (
        F.when(weekday_mon0 <= 4, F.lit("Weekday"))
        .when(weekday_mon0 == 5, F.lit("Saturday"))
        .otherwise(F.lit("Sunday"))
    )


def service_key_from_ts(ts: Column | str) -> Column:
    """F4+F5 fused — service key straight from a timestamp.

    ``weekday()`` is Monday=0, matching pandas ``.dt.dayofweek``
    (Part1/subscriber_project.py:49)."""
    c = F.col(ts) if isinstance(ts, str) else ts
    return service_key_from_weekday(F.weekday(c))


def day_name(ts: Column | str) -> Column:
    """F8 — lowercase full weekday name, matching PG ``to_char(ts,'fmday')``
    (PDF Q10-2)."""
    c = F.col(ts) if isinstance(ts, str) else ts
    return F.lower(F.date_format(c, "EEEE"))


def is_digits(col: Column | str) -> Column:
    """F10 — ``str.isdigit()`` validator (Part3/stop_event_subscriber.py:54)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.rlike("^[0-9]+$")


def bounding_box(lat: Column, lon: Column, lat_min: float, lat_max: float, lon_min: float, lon_max: float) -> Column:
    """P8 — lat/lon bounding-box predicate (PDF Q4/Q5; q1.py:20-21).

    Plain float-pair ranges, exactly like the reference — both sides
    push down to the parquet scan as min/max row-group filters."""
    return lat.between(lat_min, lat_max) & lon.between(lon_min, lon_max)


def act_time_timestamp_pandas(opd_ts_col: str, act_time_col: str):
    """X1 — the reference's one scalar UDF (``create_timestamp``,
    Part1/subscriber_project.py:55-64) kept as an Arrow-vectorized
    ``pandas_udf`` for *surface* parity.  The native expression
    :func:`act_time_timestamp` is the production path (stays in
    codegen); a test pins the two to identical output."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("timestamp")
    def _build(opd_ts: pd.Series, act_time: pd.Series) -> pd.Series:
        secs = act_time.astype("int64").clip(upper=SECONDS_PER_DAY_MAX)
        return opd_ts + pd.to_timedelta(secs, unit="s")

    return _build(opd_ts_col, act_time_col)
