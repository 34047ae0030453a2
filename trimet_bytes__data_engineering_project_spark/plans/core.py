"""Reference-parity query corpus over the driver tables.

Each query re-expresses one row of SURVEY.md §2's operator inventory
(the PDF Q1-Q10 corpus, the q1-q5_3 visualization queries, and the
subscriber transform chain) against the driver's stand-in tables
(FIXTURES.md §4 mapping: ``events`` ↔ breadcrumb, ``user_id`` ↔
trip/vehicle id, ``value`` ↔ speed, ``orders``/``lineitem``/``customer``
↔ the warehouse star).  Every callable has a DuckDB oracle twin with
identical aliases; see ``tables.py`` for the cross-engine hash rules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.geo import haversine_m
from ..functions.scalar import day_name, pg_dow, service_key_from_ts
from ..functions.windows import running_avg  # noqa: F401 (W3 building block)
from .registry import query
from .tables import dec_sum, epoch_us, load_table


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


# --------------------------------------------------------------------------
# Aggregation tier (A1-A6) — PDF Q1/Q2/Q3/Q6/Q8/Q9 + tracking query
# --------------------------------------------------------------------------


@query(
    "q01_count_on_date",
    oracle="SELECT count(*) AS cnt FROM events WHERE CAST(ts AS DATE) = DATE '2024-01-15'",
)
def q01_count_on_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1+P12+F7 — COUNT(*) on one service date (PDF Q1; q4.py:16)."""
    ev = _events(spark, sf_dir)
    return ev.filter(F.to_date("ts") == F.lit("2024-01-15").cast("date")).agg(
        F.count("*").alias("cnt")
    )


@query(
    "q02_hour_window_count",
    oracle="SELECT count(*) AS cnt FROM events "
    "WHERE user_id = 7 AND hour(ts) BETWEEN 9 AND 11",
)
def q02_hour_window_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1+P10+P13+F6 — count for one entity in an hour window (q2.py:22-24)."""
    ev = _events(spark, sf_dir)
    return ev.filter((F.col("user_id") == 7) & F.hour("ts").between(9, 11)).agg(
        F.count("*").alias("cnt")
    )


@query(
    "q03_readings_per_dow",
    oracle="SELECT CAST(dayofweek(ts) AS INT) AS dow, count(*) AS num_readings "
    "FROM events GROUP BY 1",
)
def q03_readings_per_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3+F4 — readings per day-of-week, PG EXTRACT(DOW) numbering
    Sunday=0 (PDF Q3; Spark dayofweek is Sunday=1, hence the -1)."""
    ev = _events(spark, sf_dir)
    return ev.groupBy(pg_dow("ts")).agg(F.count("*").alias("num_readings"))


@query(
    "q04_running_avg_per_dow",
    oracle="""
    WITH per_dow AS (
      SELECT CAST(dayofweek(ts) AS INT) AS dow, count(*) AS num_readings
      FROM events GROUP BY 1
    )
    SELECT dow, num_readings,
           CAST(SUM(num_readings) OVER w AS DOUBLE) / (COUNT(*) OVER w) AS running_avg
    FROM per_dow WINDOW w AS (ORDER BY dow ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def q04_running_avg_per_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3 — cumulative mean of per-dow counts (PDF Q3, second form).
    Computed as exact-int running SUM / running COUNT → one IEEE division
    (engine-order-independent, unlike AVG over doubles)."""
    ev = _events(spark, sf_dir)
    per_dow = ev.groupBy(pg_dow("ts")).agg(F.count("*").alias("num_readings"))
    w = Window.orderBy("dow").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return per_dow.select(
        "dow",
        "num_readings",
        (F.sum("num_readings").over(w).cast("double") / F.count("*").over(w)).alias(
            "running_avg"
        ),
    )


@query(
    "q05_sunday_evening_count",
    oracle="SELECT count(*) AS cnt FROM events "
    "WHERE dayofweek(ts) = 0 AND hour(ts) BETWEEN 16 AND 18",
)
def q05_sunday_evening_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P13+P14 — Sunday 16:00-18:59 count (PDF Q5; Viz-1; q3.py:18-19)."""
    ev = _events(spark, sf_dir)
    return ev.filter((pg_dow("ts") == 0) & F.hour("ts").between(16, 18)).agg(
        F.count("*").alias("cnt")
    )


@query("q06_max_speed", oracle="SELECT max(value) AS max_speed FROM events")
def q06_max_speed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 — ungrouped system-wide MAX (PDF Q6)."""
    return _events(spark, sf_dir).agg(F.max("value").alias("max_speed"))


@query(
    "q07_vehicles_per_speed",
    oracle="""
    SELECT value AS speed, count(DISTINCT user_id) AS num_vehicles
    FROM events GROUP BY 1
    ORDER BY num_vehicles DESC, speed DESC LIMIT 5
    """,
)
def q07_vehicles_per_speed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4+O2 — distinct entities per exact measure value, top-5 with a
    deterministic tie-break (PDF Q7)."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(F.col("value").alias("speed"))
        .agg(F.countDistinct("user_id").alias("num_vehicles"))
        .orderBy(F.desc("num_vehicles"), F.desc("speed"))
        .limit(5)
    )


@query(
    "q08_longest_trip",
    oracle="""
    SELECT user_id AS trip_id,
           epoch_us(max(ts)) - epoch_us(min(ts)) AS trip_duration_us
    FROM events GROUP BY 1
    ORDER BY trip_duration_us DESC, trip_id LIMIT 1
    """,
)
def q08_longest_trip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6+O2+F12 — longest span by max(ts)-min(ts), top-1 (PDF Q8).
    Duration emitted as exact µs BIGINT (SURVEY §7: interval types don't
    hash-compare across engines)."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(F.col("user_id").alias("trip_id"))
        .agg((epoch_us(F.max("ts")) - epoch_us(F.min("ts"))).alias("trip_duration_us"))
        .orderBy(F.desc("trip_duration_us"), "trip_id")
        .limit(1)
    )


@query(
    "q09_counts_by_dates",
    # NOTE: derived-column subquery form on purpose — DuckDB 1.0.0 returns
    # 0 rows for `CAST(col AS DATE) IN (...)` applied directly to a base
    # column (IN-filter pushdown bug).
    oracle="""
    SELECT service_date, count(*) AS cnt FROM (
      SELECT CAST(ts AS DATE) AS service_date FROM events
    ) WHERE service_date IN (DATE '2024-01-01', DATE '2024-01-13', DATE '2024-01-20')
    GROUP BY 1
    """,
)
def q09_counts_by_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1×3 — counts for a holiday / Saturday / weekday date (PDF Q9)."""
    ev = _events(spark, sf_dir)
    dates = [F.lit(d).cast("date") for d in ("2024-01-01", "2024-01-13", "2024-01-20")]
    return (
        ev.withColumn("service_date", F.to_date("ts"))
        .filter(F.col("service_date").isin(*dates))
        .groupBy("service_date")
        .agg(F.count("*").alias("cnt"))
    )


@query(
    "q10_trips_per_vehicle",
    oracle="""
    SELECT o_custkey AS vehicle_id, count(DISTINCT o_orderkey) AS tot_trips
    FROM orders GROUP BY 1 ORDER BY tot_trips DESC, vehicle_id LIMIT 2
    """,
)
def q10_trips_per_vehicle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4+O2 — distinct trips per vehicle, top-2 (PDF Q10-1), on the
    orders↔customer analog of the trip↔vehicle fan-out."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.col("o_custkey").alias("vehicle_id"))
        .agg(F.countDistinct("o_orderkey").alias("tot_trips"))
        .orderBy(F.desc("tot_trips"), "vehicle_id")
        .limit(2)
    )


@query(
    "q11_trips_per_date_dayname",
    oracle="""
    SELECT CAST(ts AS DATE) AS service_date, lower(dayname(ts)) AS day_name,
           count(DISTINCT user_id) AS num_trips
    FROM events GROUP BY 1, 2
    ORDER BY num_trips DESC, service_date LIMIT 5
    """,
)
def q11_trips_per_date_dayname(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4+F7+F8+O2 — distinct trips per (date, weekday-name), top-5
    (PDF Q10-2; lowercase name matches PG to_char(ts,'fmday'))."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(F.to_date("ts").alias("service_date"), day_name("ts").alias("day_name"))
        .agg(F.countDistinct("user_id").alias("num_trips"))
        .orderBy(F.desc("num_trips"), "service_date")
        .limit(5)
    )


@query(
    "q12_trip_start_end",
    oracle="""
    SELECT user_id AS trip_id, min(ts) AS start_ts, max(ts) AS end_ts
    FROM events WHERE CAST(ts AS DATE) = DATE '2024-01-10' GROUP BY 1
    """,
)
def q12_trip_start_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5+P12 — per-trip start/end timestamps on one date (PDF Q10-3)."""
    ev = _events(spark, sf_dir)
    return (
        ev.filter(F.to_date("ts") == F.lit("2024-01-10").cast("date"))
        .groupBy(F.col("user_id").alias("trip_id"))
        .agg(F.min("ts").alias("start_ts"), F.max("ts").alias("end_ts"))
    )


@query(
    "q23_tracking_daily",
    oracle="""
    SELECT CAST(ts AS DATE) AS service_date, count(*) AS num_readings,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events GROUP BY 1
    """,
)
def q23_tracking_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3+F7 — the daily tracking table (rows/day audit,
    DataEngineering_Project_Part_1.pdf; GROUP BY tstamp::date)."""
    ev = _events(spark, sf_dir)
    return ev.groupBy(F.to_date("ts").alias("service_date")).agg(
        F.count("*").alias("num_readings"), dec_sum(F.col("value")).alias("sum_value")
    )


# --------------------------------------------------------------------------
# Predicate / projection tier (P8-P15) + set ops (U1/U2) + top-k (O2/O3)
# --------------------------------------------------------------------------


@query(
    "q13_scalar_subquery_points",
    oracle="""
    SELECT event_id, value AS speed FROM events
    WHERE user_id = (SELECT user_id FROM events
                     GROUP BY user_id ORDER BY count(*) DESC, user_id LIMIT 1)
    """,
)
def q13_scalar_subquery_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P15 — scalar-subquery trip selection: all points of the busiest
    entity (q1.py:16-25 / q2.py:17-26 pattern, deterministic tie-break).

    Expressed with the DataFrame-API scalar subquery
    (``DataFrame.scalar()``, Spark 4) — same plan as the SQL form, with
    no session temp-view registration (query functions must not mutate
    shared session state)."""
    ev = _events(spark, sf_dir)
    busiest = (
        ev.groupBy("user_id")
        .agg(F.count("*").alias("_cnt"))
        .orderBy(F.desc("_cnt"), "user_id")
        .limit(1)
        .select("user_id")
    )
    return ev.filter(F.col("user_id") == busiest.scalar()).select(
        "event_id", F.col("value").alias("speed")
    )


@query(
    "q14_in_list_counts",
    oracle="SELECT user_id, count(*) AS cnt FROM events "
    "WHERE user_id IN (3, 7) GROUP BY 1",
)
def q14_in_list_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P11+A3 — IN-list trip filter (q3.py:17)."""
    ev = _events(spark, sf_dir)
    return ev.filter(F.col("user_id").isin(3, 7)).groupBy("user_id").agg(
        F.count("*").alias("cnt")
    )


@query(
    "q15_service_key_counts",
    oracle="""
    SELECT CASE WHEN isodow(ts) - 1 <= 4 THEN 'Weekday'
                WHEN isodow(ts) - 1 = 5 THEN 'Saturday'
                ELSE 'Sunday' END AS service_key,
           count(*) AS cnt
    FROM events GROUP BY 1
    """,
)
def q15_service_key_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4+F5 — {Weekday,Saturday,Sunday} service-key derivation
    (Part1/subscriber_project.py:50-53; pandas Monday=0 numbering
    ↔ DuckDB isodow Monday=1, hence the -1)."""
    ev = _events(spark, sf_dir)
    return ev.groupBy(service_key_from_ts("ts").alias("service_key")).agg(
        F.count("*").alias("cnt")
    )


@query(
    "q22_bbox_distinct_trips",
    oracle="""
    SELECT DISTINCT l.l_orderkey AS trip_id
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_quantity BETWEEN 10 AND 20
      AND l.l_extendedprice BETWEEN 1000 AND 3000
      AND o.o_orderdate >= TIMESTAMP '1997-01-01'
    """,
)
def q22_bbox_distinct_trips(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8+U1+J1 — bounding-box-style float-pair range predicate + DISTINCT
    projection over the fact⋈dim join (PDF Q4: distinct trips through a
    lat/lon box on a date; quantity/price stand in for the coordinate
    pair).  Both ranges push down to the parquet scan."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    return (
        li.filter(
            F.col("l_quantity").between(10, 20)
            & F.col("l_extendedprice").between(1000, 3000)
        )
        .join(orders.filter(F.col("o_orderdate") >= "1997-01-01"), F.col("l_orderkey") == F.col("o_orderkey"))
        .select(F.col("l_orderkey").alias("trip_id"))
        .distinct()
    )


@query(
    "q24_union_counts",
    oracle="""
    SELECT event_type, count(*) AS cnt FROM (
      SELECT * FROM events WHERE event_type = 'click'
      UNION ALL
      SELECT * FROM events WHERE event_type = 'error'
    ) GROUP BY 1
    """,
)
def q24_union_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2 — multi-source union (the reference's 199-file concat,
    Part3/load_breadcrumb.py:72-76) as unionByName."""
    ev = _events(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click")
    errors = ev.filter(F.col("event_type") == "error")
    return clicks.unionByName(errors).groupBy("event_type").agg(F.count("*").alias("cnt"))


@query(
    "q28_top_value_events",
    oracle="SELECT event_id, value FROM events ORDER BY value DESC, event_id LIMIT 10",
)
def q28_top_value_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2 — ORDER BY ... LIMIT top-k; Spark plans TakeOrderedAndProject
    (true top-k, no global sort) (PDF Q7/Q8 pattern)."""
    ev = _events(spark, sf_dir)
    return ev.select("event_id", "value").orderBy(F.desc("value"), "event_id").limit(10)


@query("q29_distinct_event_types", oracle="SELECT DISTINCT event_type FROM events")
def q29_distinct_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 — DISTINCT projection (q2.py:19; PDF Q4)."""
    return _events(spark, sf_dir).select("event_type").distinct()


@query(
    "q30_hour_histogram",
    oracle="SELECT CAST(hour(ts) AS INT) AS hr, count(*) AS cnt FROM events GROUP BY 1",
)
def q30_hour_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6+A3 — per-hour histogram (Viz-1; PDF Q5 hour buckets)."""
    ev = _events(spark, sf_dir)
    return ev.groupBy(F.hour("ts").alias("hr")).agg(F.count("*").alias("cnt"))


# --------------------------------------------------------------------------
# Join tier (J1-J3)
# --------------------------------------------------------------------------


@query(
    "q20_trip_full_view",
    oracle="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderstatus,
           CAST(o.o_orderdate AS DATE) AS o_date,
           l.l_linenumber, l.l_quantity, l.l_extendedprice
    FROM customer c
    LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    LEFT JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE c.c_custkey <= 30
    """,
)
def q20_trip_full_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 — the trip_full_view integration view: dimension LEFT JOIN two
    facts with intentional fan-out (Part3/stop.sql:45-74).  The dimension
    side is broadcast; the filter prunes before the join."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 30)
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        F.broadcast(c)
        .join(o, c["c_custkey"] == o["o_custkey"], "left")
        .join(li, o["o_orderkey"] == li["l_orderkey"], "left")
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderstatus",
            F.col("o_orderdate").cast("date").alias("o_date"),
            "l_linenumber",
            "l_quantity",
            "l_extendedprice",
        )
    )


@query(
    "q21_join_using_segment",
    oracle="""
    SELECT c.c_mktsegment, count(*) AS num_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_revenue
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY 1
    """,
)
def q21_join_using_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2+A3 — equi-join (USING form, PDF Q4) + grouped exact-decimal
    revenue.  customer is a small dim → broadcast hash join, no shuffle
    of the orders side for the join itself."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("num_orders"),
            dec_sum(F.col("o_totalprice")).alias("total_revenue"),
        )
    )


# --------------------------------------------------------------------------
# Window tier (W1/W2) + dedup (A7) — the subscriber transform chain
# --------------------------------------------------------------------------


@query(
    "q16_speed_lag",
    oracle="""
    WITH pts AS (
      SELECT user_id, event_id, value, epoch_us(ts) AS t_us,
             lag(value) OVER w AS prev_value, lag(epoch_us(ts)) OVER w AS prev_t_us
      FROM events WHERE user_id < 5
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT event_id,
           (value - prev_value) / (NULLIF(t_us - prev_t_us, 0) / 1000000.0) AS speed_rate
    FROM pts
    """,
)
def q16_speed_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 — per-trip lag-diff rate: Δmeasure/Δtime within entity, ordered
    by (ts, id) (SPEED = ΔMETERS/ΔACT_TIME, Part1/subscriber_project.py:
    65-68).  First row per entity and Δt=0 normalize to NULL."""
    ev = _events(spark, sf_dir).filter(F.col("user_id") < 5)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t_us = epoch_us(F.col("ts"))
    dv = F.col("value") - F.lag("value").over(w)
    dt_us = t_us - F.lag(t_us).over(w)
    return ev.select(
        "event_id", (dv / (F.nullif(dt_us, F.lit(0)) / F.lit(1000000.0))).alias("speed_rate")
    )


@query(
    "q17_backfill_clip",
    oracle="""
    WITH pts AS (
      SELECT user_id, event_id, ts, value, epoch_us(ts) AS t_us,
             lag(value) OVER w AS prev_value, lag(epoch_us(ts)) OVER w AS prev_t_us
      FROM events WHERE user_id < 5
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), rated AS (
      SELECT user_id, event_id, ts,
             (value - prev_value) / (NULLIF(t_us - prev_t_us, 0) / 1000000.0) AS speed_rate
      FROM pts
    ), filled AS (
      SELECT event_id,
             first_value(speed_rate IGNORE NULLS) OVER
               (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS f
      FROM rated
    )
    SELECT event_id,
           CASE WHEN f IS NULL THEN NULL ELSE greatest(f, 0.0) END AS speed_filled
    FROM filled
    """,
)
def q17_backfill_clip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2 — backfill NULL rates from the next non-null *within the trip*,
    floor at 0 (SPEED.bfill().clip(lower=0), Part1/subscriber_project.py:
    69; per-trip scope per SURVEY §7 decision log)."""
    ev = _events(spark, sf_dir).filter(F.col("user_id") < 5)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_fwd = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    t_us = epoch_us(F.col("ts"))
    dv = F.col("value") - F.lag("value").over(w)
    dt_us = t_us - F.lag(t_us).over(w)
    rated = ev.withColumn(
        "speed_rate", dv / (F.nullif(dt_us, F.lit(0)) / F.lit(1000000.0))
    )
    filled = F.first("speed_rate", ignorenulls=True).over(w_fwd)
    return rated.select(
        "event_id",
        F.when(filled.isNull(), F.lit(None).cast("double"))
        .otherwise(F.greatest(filled, F.lit(0.0)))
        .alias("speed_filled"),
    )


@query(
    "q18_dedup_first_event",
    oracle="""
    SELECT user_id AS trip_id, 0 AS route_id, 'Out' AS direction,
           event_id AS first_event_id, ts AS first_ts
    FROM (
      SELECT user_id, event_id, ts,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def q18_dedup_first_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7+P1+P4 — deterministic first-row-per-group dedup producing the
    trip dimension, with the loader's constant route_id=0/direction='Out'
    projection (drop_duplicates keep='first' after sort,
    Part1/subscriber_project.py:65-89)."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("user_id").alias("trip_id"),
            F.lit(0).alias("route_id"),
            F.lit("Out").alias("direction"),
            F.col("event_id").alias("first_event_id"),
            F.col("ts").alias("first_ts"),
        )
    )


# --------------------------------------------------------------------------
# Validation tier (P16/X2) + scalar functions (F1/F2/F13)
# --------------------------------------------------------------------------


@query(
    "q19_validation_counts",
    oracle="""
    SELECT count(*) AS total,
           CAST(sum(CASE WHEN value < 0 THEN 1 ELSE 0 END) AS BIGINT) AS bad_value,
           CAST(sum(CASE WHEN user_id < 0 THEN 1 ELSE 0 END) AS BIGINT) AS bad_user,
           CAST(sum(CASE WHEN event_type NOT IN
                ('click','view','purchase','signup','error') THEN 1 ELSE 0 END) AS BIGINT)
             AS bad_type,
           CAST(sum(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS bad_ts
    FROM events
    """,
)
def q19_validation_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P16/X2 — per-rule violation audit: the reference's 10 assertion
    loops (Part2/updated_subscriber.py:72-150) as one aggregation pass
    over native predicates (measure≥0, id≥0, enum domain, ts present)."""
    ev = _events(spark, sf_dir)

    def bad(cond) -> F.Column:
        return F.sum(F.when(cond, 1).otherwise(0)).cast("long")

    return ev.agg(
        F.count("*").alias("total"),
        bad(F.col("value") < 0).alias("bad_value"),
        bad(F.col("user_id") < 0).alias("bad_user"),
        bad(~F.col("event_type").isin("click", "view", "purchase", "signup", "error")).alias(
            "bad_type"
        ),
        bad(F.col("ts").isNull()).alias("bad_ts"),
    )


@query(
    "q25_timestamp_roundtrip",
    oracle="""
    SELECT event_id,
           strptime(strftime(ts, '%d%b%Y') || ':00:00:00', '%d%b%Y:%H:%M:%S')
             + ((hour(ts)*3600 + minute(ts)*60 + second(ts)) * INTERVAL 1 SECOND)
             AS rebuilt_ts
    FROM events WHERE user_id < 3
    """,
)
def q25_timestamp_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1+F2+F3 — the OPD_DATE round-trip: format a ddMMMyyyy:HH:mm:ss
    string, parse it back (coerce semantics), add seconds-since-midnight
    (create_timestamp, Part1/subscriber_project.py:48-64).  rebuilt_ts
    equals date_trunc('second', ts) — computed the long way on purpose."""
    ev = _events(spark, sf_dir).filter(F.col("user_id") < 3)
    opd = F.concat(F.date_format("ts", "ddMMMyyyy"), F.lit(":00:00:00"))
    parsed = F.try_to_timestamp(opd, F.lit("ddMMMyyyy:HH:mm:ss"))
    act = F.hour("ts") * 3600 + F.minute("ts") * 60 + F.second("ts")
    rebuilt = F.timestamp_seconds(F.unix_timestamp(parsed) + act.cast("long"))
    return ev.select("event_id", rebuilt.cast("timestamp_ntz").alias("rebuilt_ts"))


@query(
    "q26_json_extract",
    oracle="""
    SELECT event_type,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k
    FROM events GROUP BY 1
    """,
)
def q26_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F13 — per-message JSON payload extraction (json.loads per record,
    Part1/subscriber_project.py:23) as get_json_object, no Python."""
    ev = _events(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.groupBy("event_type").agg(F.sum(k).cast("long").alias("sum_k"))


# --------------------------------------------------------------------------
# Flagship / bench headline — TPC-H Q1-pattern pricing summary
# --------------------------------------------------------------------------


@query(
    "q27_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
           count(*) AS count_order
    FROM lineitem WHERE l_shipdate <= DATE '2000-12-01'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q27_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship scan→filter→hash-agg (TPC-H Q1 pattern): the bench
    headline.  All measures aggregated as exact decimals (partial+final
    map-side combine, order-independent), emitted as doubles."""
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("decimal(18,2)")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc_price = price * (F.lit(1) - F.col("l_discount").cast("decimal(4,2)"))
    return (
        li.filter(F.col("l_shipdate") <= "2000-12-01")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            (F.sum(qty).cast("double") / F.count("*")).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# Grouped-series tier (A8/A9/O4/X4) — per-trip polyline assembly
# --------------------------------------------------------------------------


@query(
    "q31_user_series",
    oracle="""
    SELECT user_id AS trip_id, count(*) AS n_points,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(value) AS avg_value,
           string_agg(CAST(event_id AS VARCHAR), ';' ORDER BY ts, event_id) AS series
    FROM events WHERE CAST(ts AS DATE) = DATE '2024-01-10' GROUP BY 1
    """,
)
def q31_user_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8+A9+O4 — per-trip ordered series assembly (visualize_map.py:36-42:
    group by trip, sort points, build the polyline, mean for centering).
    ``sort_array(collect_list(struct))`` keeps assembly distributed — the
    per-group sort happens inside the agg buffer, no global sort; the
    series key is the (unique) event id so the string is engine-exact,
    and the mean is a decimal sum with one IEEE division."""
    ev = _events(spark, sf_dir)
    pts = F.sort_array(F.collect_list(F.struct("ts", "event_id")))
    return (
        ev.filter(F.to_date("ts") == F.lit("2024-01-10").cast("date"))
        .groupBy(F.col("user_id").alias("trip_id"))
        .agg(
            F.count("*").alias("n_points"),
            (F.sum(F.col("value").cast("decimal(18,2)")).cast("double") / F.count("value")).alias(
                "avg_value"
            ),
            F.concat_ws(";", F.transform(pts, lambda x: x["event_id"].cast("string"))).alias(
                "series"
            ),
        )
    )


# --------------------------------------------------------------------------
# Geodesic tier — the described-but-unimplemented haversine speed basis
# --------------------------------------------------------------------------


@query(
    "q32_haversine_segments",
    oracle="""
    WITH pts AS (
      SELECT user_id, event_id, ts,
             45.5 + (value - 50.0)/1000.0 AS lat,
             -122.65 + CAST(event_id % 100 AS DOUBLE)/1000.0 AS lon
      FROM events
    ), lagged AS (
      SELECT event_id, lat, lon,
             lag(lat) OVER w AS plat, lag(lon) OVER w AS plon
      FROM pts WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT event_id,
           round(2.0*6371000.0*asin(sqrt(
             sin((radians(lat)-radians(plat))/2)*sin((radians(lat)-radians(plat))/2)
             + cos(radians(plat))*cos(radians(lat))
               * sin((radians(lon)-radians(plon))/2)*sin((radians(lon)-radians(plon))/2)
           )), 4) AS hav_m
    FROM lagged
    """,
)
def q32_haversine_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geodesic segment length between consecutive per-trip GPS points —
    the speed basis the reference *describes* ("distance/time between
    consecutive GPS data", Presentation §Subscriber) but implements as
    the odometer delta (Part1/subscriber_project.py:68).  Pure-expr
    haversine over a lag window, no UDF.  The driver tables carry no
    GPS columns, so coordinates are derived deterministically from
    (value, event_id); rounded to 0.1 mm for cross-engine hash parity
    (see functions/geo.py)."""
    ev = _events(spark, sf_dir)
    lat = F.lit(45.5) + (F.col("value") - F.lit(50.0)) / F.lit(1000.0)
    lon = F.lit(-122.65) + (F.col("event_id") % F.lit(100)).cast("double") / F.lit(1000.0)
    pts = ev.select("user_id", "event_id", "ts", lat.alias("lat"), lon.alias("lon"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seg = haversine_m(
        F.lag("lat").over(w), F.lag("lon").over(w), F.col("lat"), F.col("lon")
    )
    return pts.select("event_id", F.round(seg, 4).alias("hav_m"))
