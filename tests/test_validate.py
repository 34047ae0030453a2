"""Quarantine-split tests — P16/P17 with deliberately corrupt rows."""

from __future__ import annotations

from pyspark.sql import functions as F

from trimet_bytes__data_engineering_project_spark.operators.transform import enrich_breadcrumbs
from trimet_bytes__data_engineering_project_spark.operators.validate import (
    breadcrumb_validators,
    quarantine_split,
    stop_event_validators,
)
from trimet_bytes__data_engineering_project_spark.schemas import BREADCRUMB_RAW, STOP_EVENT_COLUMNS

from .fixtures import breadcrumb_raw_records, corrupt_breadcrumb_records


def test_breadcrumb_quarantine(spark):
    records = breadcrumb_raw_records() + corrupt_breadcrumb_records()
    enriched = enrich_breadcrumbs(spark.createDataFrame(records, schema=BREADCRUMB_RAW))
    valid, quarantined = quarantine_split(enriched, breadcrumb_validators())

    assert valid.count() + quarantined.count() == enriched.count()
    violations = {
        v for r in quarantined.select("violations").collect() for v in r["violations"]
    }
    assert {
        "vehicle_id_positive",
        "act_time_in_day",
        "latitude_in_range",
        "longitude_in_range",
        "trip_id_positive",
        "meters_nonnegative",
    } <= violations
    # clean rows carry no violation column
    assert "violations" not in valid.columns


def test_stop_event_quarantine(spark):
    good = dict.fromkeys(STOP_EVENT_COLUMNS, "1")
    good.update(
        vehicle_number="3001", leave_time="25000", arrive_time="24950", stop_time="24980",
        direction="0", service_key="W", trip_number="238330000", dwell="50",
        location_id="9000", estimated_load="low", maximum_speed="35",
    )
    bad = dict(good, vehicle_number="abc", direction="2", service_key="X",
               maximum_speed="85", arrive_time="26000", estimated_load="huge", dwell="-5")
    df = spark.createDataFrame([good, bad]).select(*STOP_EVENT_COLUMNS)
    valid, quarantined = quarantine_split(df, stop_event_validators())
    assert valid.count() == 1 and quarantined.count() == 1
    v = quarantined.select("violations").first()[0]
    assert {
        "vehicle_number_digits", "direction_domain", "service_key_domain",
        "max_speed_in_range", "arrive_before_leave", "load_domain", "dwell_nonnegative",
    } <= set(v)


def test_quarantine_counts_match_subtract(spark):
    """EXCEPT-style equivalence (SURVEY §2.7): valid == input minus quarantined."""
    records = breadcrumb_raw_records() + corrupt_breadcrumb_records()
    enriched = enrich_breadcrumbs(spark.createDataFrame(records, schema=BREADCRUMB_RAW))
    valid, quarantined = quarantine_split(enriched, breadcrumb_validators())
    recomputed = enriched.subtract(quarantined.drop("violations"))
    assert recomputed.count() == valid.dropDuplicates().count()
