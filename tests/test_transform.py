"""Transform-chain unit tests — SURVEY.md §5 edge cases: first-row-per-
trip speed, Δt=0, ACT_TIME clamp, unparseable OPD_DATE, per-trip
backfill scope, deterministic trip dedup."""

from __future__ import annotations

import datetime

from pyspark.sql import Window
from pyspark.sql import functions as F

from trimet_bytes__data_engineering_project_spark.operators.transform import (
    breadcrumb_table,
    enrich_breadcrumbs,
    trip_table,
)
from trimet_bytes__data_engineering_project_spark.schemas import BREADCRUMB_RAW

from .fixtures import breadcrumb_raw_records


def _enriched(spark):
    raw = spark.createDataFrame(breadcrumb_raw_records(), schema=BREADCRUMB_RAW)
    return enrich_breadcrumbs(raw)


def test_timestamp_build_and_clamp(spark):
    df = _enriched(spark)
    # F1 coerce: the NOTADATE row parses to NULL
    assert df.filter(F.col("OPD_DATE").startswith("NOTADATE")).select("OPD_TS").first()[0] is None
    # F2+F3: ACT_TIME=90000 clamps to 86399 → 23:59:59 same day
    clamped = df.filter(F.col("ACT_TIME") == 90000).select("TIMESTAMP").first()[0]
    assert clamped.time() == datetime.time(23, 59, 59)


def test_service_key_mapping(spark):
    df = _enriched(spark)
    got = {
        r["d"]: r["service_key"]
        for r in df.select(F.weekday("TIMESTAMP").alias("d"), "service_key").distinct().collect()
        if r["d"] is not None
    }
    assert got[0] == "Weekday" and got[4] == "Weekday"
    assert got[5] == "Saturday" and got[6] == "Sunday"


def test_speed_window_edges(spark):
    df = _enriched(spark).filter(F.col("EVENT_NO_TRIP") == 238330000)
    rows = df.orderBy("TIMESTAMP").select("SPEED", "ACT_TIME", "METERS").collect()
    # W2: first row backfilled from the next non-null (not NULL, not inf)
    assert rows[0]["SPEED"] is not None
    # all speeds clipped at 0 and finite (Δt=0 row normalized then filled)
    assert all(r["SPEED"] is not None and r["SPEED"] >= 0 for r in rows)
    # W1 spot check: a plain interior row equals Δmeters/5s
    r1, r2 = rows[2], rows[3]
    assert abs(r2["SPEED"] - (r2["METERS"] - r1["METERS"]) / 5.0) < 1e-9


def test_backfill_is_per_trip(spark):
    """SURVEY §7 decision: no cross-trip bleed (unlike the reference's
    frame-global bfill)."""
    df = _enriched(spark)
    first_rows = (
        df.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("EVENT_NO_TRIP").orderBy("TIMESTAMP", "VEHICLE_ID")
            ),
        )
        .filter(F.col("rn") == 1)
        .select("EVENT_NO_TRIP", "SPEED")
        .collect()
    )
    # every trip's first speed comes from its own trip's second row —
    # defined for all trips in the fixture
    assert all(r["SPEED"] is not None for r in first_rows)


def test_trip_table_dedup(spark):
    df = _enriched(spark)
    trips = trip_table(df)
    n_trips = df.select("EVENT_NO_TRIP").distinct().count()
    assert trips.count() == n_trips
    row = trips.first()
    assert row["route_id"] == 0 and row["direction"] == "Out"
    # deterministic: rerun yields identical rows
    assert sorted(map(tuple, trips.collect())) == sorted(map(tuple, trip_table(df).collect()))


def test_breadcrumb_projection(spark):
    bc = breadcrumb_table(_enriched(spark))
    assert bc.columns == ["tstamp", "latitude", "longitude", "speed", "trip_id"]
    # P5: GPS nulls filled with 0.0
    assert bc.filter(F.col("latitude").isNull() | F.col("longitude").isNull()).count() == 0


def test_coerce_breadcrumbs_drops_unparseable_and_nulls_bad_numerics(spark):
    """P6+P7 — try_cast coercion + dropna mirror load_breadcrumb.py:33-49."""
    from trimet_bytes__data_engineering_project_spark.operators.transform import (
        coerce_breadcrumbs,
    )

    raw = spark.createDataFrame(breadcrumb_raw_records(), schema=BREADCRUMB_RAW)
    out = coerce_breadcrumbs(raw)
    assert out.filter(F.col("OPD_TS").isNull()).count() == 0  # P6: bad dates dropped
    assert out.count() < raw.count()


def test_reorder_to_layout_fail_fast(spark):
    """P3 — missing column raises (AnalysisException), present columns reorder."""
    import pytest
    from pyspark.errors import AnalysisException

    from trimet_bytes__data_engineering_project_spark.operators.transform import (
        reorder_to_layout,
    )

    df = spark.createDataFrame([(1, "a")], ["x", "y"])
    assert reorder_to_layout(df, ["y", "x"]).columns == ["y", "x"]
    with pytest.raises(AnalysisException):
        reorder_to_layout(df, ["y", "x", "missing"]).collect()


def test_pandas_udf_matches_native_timestamp(spark):
    """X1 — the surface-parity pandas_udf equals the native expression."""
    from trimet_bytes__data_engineering_project_spark.functions.scalar import (
        act_time_timestamp,
        act_time_timestamp_pandas,
        parse_opd_date,
    )

    raw = spark.createDataFrame(breadcrumb_raw_records(), schema=BREADCRUMB_RAW)
    df = raw.withColumn("OPD_TS", parse_opd_date("OPD_DATE")).filter(F.col("OPD_TS").isNotNull())
    cmp = df.select(
        act_time_timestamp(F.col("OPD_TS"), F.col("ACT_TIME")).alias("native"),
        act_time_timestamp_pandas("OPD_TS", "ACT_TIME").alias("pandas"),
    )
    assert cmp.filter(F.col("native") != F.col("pandas")).count() == 0
    assert cmp.filter(F.col("native").isNull()).count() == 0


def test_applyinpandas_polyline_matches_declarative(spark):
    """X4/A9 — grouped-map assembly equals sort_array(collect_list(struct))."""
    from trimet_bytes__data_engineering_project_spark.operators.transform import (
        trip_polylines_pandas,
    )

    rows = [
        (1, datetime.datetime(2024, 1, 1, 0, 0, s), 100 + s) for s in (3, 1, 2)
    ] + [(2, datetime.datetime(2024, 1, 1, 0, 0, 1), 200)]
    bc = spark.createDataFrame(rows, ["trip_id", "tstamp", "point_id"])
    got = {r["trip_id"]: (r["n_points"], r["series"]) for r in trip_polylines_pandas(bc).collect()}
    pts = F.sort_array(F.collect_list(F.struct("tstamp", "point_id")))
    want = {
        r["trip_id"]: (r["n_points"], r["series"])
        for r in bc.groupBy("trip_id")
        .agg(
            F.count("*").alias("n_points"),
            F.concat_ws(";", F.transform(pts, lambda x: x["point_id"].cast("string"))).alias(
                "series"
            ),
        )
        .collect()
    }
    assert got == want == {1: (3, "101;102;103"), 2: (1, "200")}


def test_load_audit_counts(spark):
    """S10 — reconciliation probe returns per-table row counts."""
    from trimet_bytes__data_engineering_project_spark.plans.warehouse import load_audit

    t1 = spark.range(5)
    t2 = spark.range(3)
    assert load_audit({"a": t1, "b": t2}) == {"a": 5, "b": 3}


def test_sessionize_gap_boundary_exact(spark):
    """A gap of exactly gap_seconds stays in-session (> opens a new
    one); per-key numbering restarts at 0; one Exchange serves both
    windows (lag + running sum share the sort)."""
    from datetime import datetime

    from trimet_bytes__data_engineering_project_spark.functions.windows import sessionize

    rows = [
        (1, datetime(2024, 1, 1, 0, 0, 0), 1),
        (1, datetime(2024, 1, 1, 0, 30, 0), 2),   # exactly 1800s → same session
        (1, datetime(2024, 1, 1, 1, 0, 1), 3),    # 1801s → new session
        (2, datetime(2024, 1, 1, 5, 0, 0), 4),    # new key → session 0
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_id"])
    out = sessionize(df, "user_id", "ts", 1800, "event_id")
    got = {r["event_id"]: r["session_id"] for r in out.collect()}
    assert got == {1: 0, 2: 0, 3: 1, 4: 0}
    import re

    # AQE plan string repeats the tree (Final + Initial); judge only the final
    plan = out._jdf.queryExecution().executedPlan().toString().split("== Initial Plan ==")[0]
    parts = re.findall(r"hashpartitioning\([^)]*\)", plan)
    assert parts and all("user_id" in p for p in parts)  # only the key shuffle
    assert plan.count("Window") == 2  # lag + running sum share that exchange


def test_conversion_funnel_ordering_semantics(spark):
    """A click BEFORE the first view doesn't advance the funnel; a
    purchase before the qualifying click doesn't either; equality
    (same timestamp) counts as progression."""
    from datetime import datetime

    from trimet_bytes__data_engineering_project_spark.plans.extensions import (
        x70_conversion_funnel,
    )
    from trimet_bytes__data_engineering_project_spark.plans.tables import _session_cache

    rows = [
        # u1: proper funnel
        (1, datetime(2024, 1, 1, 0), 1, "view"),
        (2, datetime(2024, 1, 1, 1), 1, "click"),
        (3, datetime(2024, 1, 1, 2), 1, "purchase"),
        # u2: click precedes view → stalls at view
        (4, datetime(2024, 1, 1, 1), 2, "click"),
        (5, datetime(2024, 1, 1, 2), 2, "view"),
        # u3: purchase precedes click → stalls at click
        (6, datetime(2024, 1, 1, 0), 3, "view"),
        (7, datetime(2024, 1, 1, 2), 3, "click"),
        (8, datetime(2024, 1, 1, 1), 3, "purchase"),
        # u4: simultaneous view+click+purchase → full funnel (>= semantics)
        (9, datetime(2024, 1, 1, 0), 4, "view"),
        (10, datetime(2024, 1, 1, 0), 4, "click"),
        (11, datetime(2024, 1, 1, 0), 4, "purchase"),
    ]
    ev = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "event_type"]).select(
        "event_id",
        F.col("ts").cast("timestamp_ntz").alias("ts"),
        "user_id",
        "event_type",
        F.lit(1.0).alias("value"),
        F.lit("{}").alias("props"),
    )
    cache = _session_cache(spark)
    cache[("_funnel_fixture", "events")] = ev
    try:
        out = {r["stage"]: r["n_users"] for r in
               x70_conversion_funnel(spark, "_funnel_fixture").collect()}
    finally:
        del cache[("_funnel_fixture", "events")]
    # view: all four users view at some point.  click_after_view: u2's
    # only click precedes its first view → excluded (u1, u3, u4 pass).
    # purchase_after_click: u3's purchase precedes its qualifying click
    # → excluded; u4's simultaneous events pass on >= semantics.
    assert out == {"view": 4, "click_after_view": 3, "purchase_after_click": 2}
