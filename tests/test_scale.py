"""Scale-technique tests — bucketed co-located joins, deterministic
skew salting, session-window trip derivation.

Each technique is verified two ways: the RESULT matches the naive
formulation exactly (these are pure physical rewrites, never semantic
changes), and the PLAN shows the property that matters at 100 TB
(no exchange for bucketed joins; fan-out keys for salted aggs).
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from trimet_bytes__data_engineering_project_spark.operators.skew import (
    salted_agg,
    salted_join,
)
from trimet_bytes__data_engineering_project_spark.plans.tables import load_table
from trimet_bytes__data_engineering_project_spark.plans.warehouse import write_bucketed

SF_DIR = "/root/testdata/sf0.01"


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


# ---------------------------------------------------------------------------
# Bucketed co-located join
# ---------------------------------------------------------------------------


def test_bucketed_join_has_no_shuffle(spark):
    """Two tables bucketed on the same key with the same bucket count
    sort-merge-join with ZERO shuffle exchanges — the on-disk layout IS
    the shuffle.  Auto-broadcast is disabled for the assertion because
    at sf0.01 the planner (correctly) prefers BHJ for these tiny
    tables; the bucketed-SMJ path is what a fact⋈fact join takes at
    100 TB, where neither side broadcasts.  The result set is identical
    to the plain path."""
    orders = load_table(spark, SF_DIR, "orders")
    lineitem = load_table(spark, SF_DIR, "lineitem").filter(F.col("l_quantity") >= 45)
    write_bucketed(orders, "b_orders", key="o_orderkey", sort="o_orderdate", n_buckets=8)
    write_bucketed(lineitem, "b_lineitem", key="l_orderkey", sort="l_linenumber", n_buckets=8)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        bo, bl = spark.table("b_orders"), spark.table("b_lineitem")
        joined = bl.join(bo, bl["l_orderkey"] == bo["o_orderkey"]).select(
            "l_orderkey", "l_linenumber", "o_orderdate"
        )
        plan = _plan(joined)
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan
        assert "Bucketed: true" in plan, plan

        plain = lineitem.join(orders, lineitem["l_orderkey"] == orders["o_orderkey"]).select(
            "l_orderkey", "l_linenumber", "o_orderdate"
        )
        assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, plain.collect()))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


# ---------------------------------------------------------------------------
# Deterministic salting
# ---------------------------------------------------------------------------


def test_salted_agg_matches_plain_groupby(spark):
    """The two-stage salted aggregation returns byte-identical results
    to the direct groupBy — counts/sums/mins/maxes are algebraic."""
    ev = load_table(spark, SF_DIR, "events")
    aggs = {
        "n": (F.count("*"), F.sum("n")),
        "sum_v": (F.sum(F.col("value").cast("decimal(18,2)")), F.sum("sum_v")),
        "max_v": (F.max("value"), F.max("max_v")),
        "min_ts": (F.min("ts"), F.min("min_ts")),
    }
    salted = salted_agg(ev, "user_id", aggs, fine_col="event_id", n_salts=8)
    plain = ev.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)")).alias("sum_v"),
        F.max("value").alias("max_v"),
        F.min("ts").alias("min_ts"),
    )
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_agg_is_deterministic_across_runs(spark):
    """hash()-based salt (not rand()): the same input produces the same
    partial-key layout twice — retry-safe at scale."""
    ev = load_table(spark, SF_DIR, "events")
    aggs = {"n": (F.count("*"), F.sum("n"))}
    a = salted_agg(ev, "user_id", aggs, fine_col="event_id", n_salts=8).collect()
    b = salted_agg(ev, "user_id", aggs, fine_col="event_id", n_salts=8).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_salted_join_matches_plain_join(spark):
    """Salting the fact and replicating the dim changes the physical
    key, never the join result."""
    ev = load_table(spark, SF_DIR, "events").withColumnRenamed("user_id", "uid")
    dim = (
        load_table(spark, SF_DIR, "events")
        .select(F.col("user_id").alias("uid"))
        .distinct()
        .withColumn("grp", F.pmod("uid", F.lit(3)))
    )
    salted = salted_join(ev, dim, key="uid", fine_col="event_id", n_salts=4).select(
        "event_id", "uid", "grp"
    )
    plain = ev.join(dim, "uid").select("event_id", "uid", "grp")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


# ---------------------------------------------------------------------------
# Session-window trip derivation (stateful streaming)
# ---------------------------------------------------------------------------


def test_trip_sessions_stream_matches_batch(spark, tmp_path):
    """session_window sessionization over an availableNow stream equals
    the same operator run in batch over the same landing files, and
    layover gaps actually split sessions."""
    from trimet_bytes__data_engineering_project_spark.schemas import BREADCRUMB_RAW
    from trimet_bytes__data_engineering_project_spark.streaming.pipeline import (
        streaming_breadcrumbs,
        trip_sessions,
    )

    from .fixtures import breadcrumb_raw_records, write_breadcrumb_landing

    landing = tmp_path / "landing"
    landing.mkdir()
    write_breadcrumb_landing(landing, breadcrumb_raw_records())

    q = (
        trip_sessions(streaming_breadcrumbs(spark, str(landing)), gap="15 minutes")
        .writeStream.format("memory")
        .queryName("sessions")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(map(tuple, spark.sql("SELECT * FROM sessions").collect()))

    batch = spark.read.schema(BREADCRUMB_RAW).json(str(landing))
    want = sorted(map(tuple, trip_sessions(batch, gap="15 minutes").collect()))
    assert got == want and got

    # the fixture has 7 vehicles × multiple distinct trip windows → the
    # gap must yield strictly more sessions than vehicles
    n_vehicles = len({r[0] for r in got})
    assert len(got) > n_vehicles
