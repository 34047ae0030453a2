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


# ---------------------------------------------------------------------------
# Custom stateful operator (applyInPandasWithState)
# ---------------------------------------------------------------------------


def test_stateful_trip_labels_match_batch_twin(spark, tmp_path):
    """applyInPandasWithState per-ping trip labeling carries (last_ts,
    seq) state ACROSS micro-batches (maxFilesPerTrigger=1 forces one
    batch per file) and reproduces the batch window-expr twin exactly —
    including trips that span the file boundary."""
    import json as _json
    import os

    from trimet_bytes__data_engineering_project_spark.streaming.stateful import (
        segment_trips_batch,
        segment_trips_stateful,
    )

    landing = tmp_path / "pings"
    landing.mkdir()

    # 3 vehicles × bursts of 4 pings @5s, bursts 1200s apart (> the
    # 900s gap); burst 2 straddles the two files so its state must
    # survive the batch boundary.
    def ping(v, t):
        return {"vehicle_id": v, "event_ts": f"2023-01-09T06:{t//60:02d}:{t%60:02d}"}

    rows_a, rows_b = [], []
    for v in (1, 2, 3):
        t0 = v * 7
        burst1 = [ping(v, t0 + i * 5) for i in range(4)]
        burst2 = [ping(v, t0 + 1500 + i * 5) for i in range(4)]
        rows_a += burst1 + burst2[:2]
        rows_b += burst2[2:]
    for fname, rows in (("a_000.json", rows_a), ("b_001.json", rows_b)):
        with open(landing / fname, "w") as f:
            for r in rows:
                f.write(_json.dumps(r) + "\n")
    os.utime(landing / "a_000.json", (1000000000, 1000000000))
    os.utime(landing / "b_001.json", (1000000100, 1000000100))

    schema = "vehicle_id int, event_ts timestamp"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .json(str(landing))
    )
    q = (
        segment_trips_stateful(stream, gap_seconds=900)
        .writeStream.format("memory")
        .queryName("trip_labels")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(map(tuple, spark.sql("SELECT * FROM trip_labels").collect()))

    batch = spark.read.schema(schema).json(str(landing))
    want = sorted(map(tuple, segment_trips_batch(batch, gap_seconds=900).collect()))
    assert got == want and got
    # burst structure: each vehicle has exactly trips {0, 1}
    seqs = {(r[0], r[2]) for r in got}
    assert seqs == {(v, s) for v in (1, 2, 3) for s in (0, 1)}


# ---------------------------------------------------------------------------
# Incremental streaming dedup
# ---------------------------------------------------------------------------


def test_streaming_dedup_catches_cross_batch_near_dups(spark, tmp_path):
    """Docs arriving in a later micro-batch are flagged against the
    accumulated signature store; fresh docs are not flagged; the store
    grows by every doc's bands."""
    import json as _json
    import os

    from trimet_bytes__data_engineering_project_spark.streaming.dedup import (
        run_streaming_dedup,
    )

    base = (
        "spark shuffles data between stages when the partitioning of the "
        "parent does not satisfy the required distribution of the child"
    )
    near = base.replace("child", "operator")  # high-Jaccard variant
    other = (
        "completely different content about breadcrumb telemetry feeds "
        "arriving from transit vehicles every five seconds all day"
    )
    landing = tmp_path / "docs"
    landing.mkdir()
    batches = [
        [(1, base), (2, other)],
        [(3, near), (4, "tiny"), (5, other + " with an extra trailing clause here")],
    ]
    for bi, rows in enumerate(batches):
        with open(landing / f"batch_{bi}.json", "w") as f:
            for doc_id, text in rows:
                f.write(_json.dumps({"doc_id": doc_id, "text": text}) + "\n")
        os.utime(landing / f"batch_{bi}.json", (1000000000 + bi * 100,) * 2)

    paths = {n: str(tmp_path / n) for n in ("store", "dups", "ckpt")}
    # maxFilesPerTrigger isn't an option of run_streaming_dedup; emulate
    # two arrivals with two availableNow runs sharing the checkpoint
    with open(landing / "batch_1.json") as f:
        pending = f.read()
    os.remove(landing / "batch_1.json")
    run_streaming_dedup(spark, str(landing), paths["store"], paths["dups"], paths["ckpt"])
    with open(landing / "batch_1.json", "w") as f:
        f.write(pending)
    run_streaming_dedup(spark, str(landing), paths["store"], paths["dups"], paths["ckpt"])

    dups = spark.read.parquet(paths["dups"]).collect()
    flagged = {(r["new_id"], r["dup_of"]) for r in dups}
    assert (3, 1) in flagged  # near-dup of batch-1 doc, caught cross-batch
    assert (5, 2) in flagged  # prefix-extension of batch-1 doc
    assert all(new != 4 for new, _ in flagged)  # fresh tiny doc not flagged

    store = spark.read.parquet(paths["store"])
    # every shingle-able doc indexed; doc 4 ("tiny", < 3 tokens) has no
    # shingles → correctly unindexable (operator contract: sigs exist
    # only for docs with ≥ 1 shingle)
    assert {r["doc_id"] for r in store.select("doc_id").distinct().collect()} == {1, 2, 3, 5}


def test_streaming_dedup_caps_degenerate_buckets(spark, tmp_path):
    """A boilerplate band (60 identical docs — one band_hash bucket over
    MAX_BUCKET=50) must be excluded from the probe on BOTH sides, the
    same contract as the batch operator — bounding the candidate join
    instead of going quadratic in the bucket — while normal near-dups
    in the same stream are still caught."""
    import json as _json

    from trimet_bytes__data_engineering_project_spark.streaming.dedup import (
        run_streaming_dedup,
    )

    boiler = "this exact same boilerplate footer appears on every single page"
    base = (
        "spark shuffles data between stages when the partitioning of the "
        "parent does not satisfy the required distribution of the child"
    )
    near = base.replace("child", "operator")
    landing = tmp_path / "docs"
    landing.mkdir()
    rows = [(i, boiler) for i in range(60)] + [(100, base), (101, near)]
    with open(landing / "batch_0.json", "w") as f:
        for doc_id, text in rows:
            f.write(_json.dumps({"doc_id": doc_id, "text": text}) + "\n")

    paths = {n: str(tmp_path / n) for n in ("store", "dups", "ckpt")}
    run_streaming_dedup(spark, str(landing), paths["store"], paths["dups"], paths["ckpt"])

    dups = spark.read.parquet(paths["dups"]).collect()
    flagged = {(r["new_id"], r["dup_of"]) for r in dups}
    assert (101, 100) in flagged  # normal near-dup still caught
    # degenerate bucket capped: none of the 60×59/2 boilerplate pairs logged
    assert all(new >= 100 and dup >= 100 for new, dup in flagged)
    # ... but the boilerplate docs ARE indexed in the store (cap is a
    # probe-side guard, not data loss)
    store_ids = {r["doc_id"] for r in spark.read.parquet(paths["store"]).collect()}
    assert set(range(60)) <= store_ids


def test_streaming_dedup_replay_is_idempotent(spark, tmp_path):
    """at-least-once replay (same data reprocessed as the same batch_id
    under a fresh checkpoint) overwrites the batch's own store/dup-log
    partitions instead of appending twice — row counts identical after
    a full replay."""
    import json as _json

    from trimet_bytes__data_engineering_project_spark.streaming.dedup import (
        run_streaming_dedup,
    )

    base = (
        "spark shuffles data between stages when the partitioning of the "
        "parent does not satisfy the required distribution of the child"
    )
    near = base.replace("child", "operator")
    landing = tmp_path / "docs"
    landing.mkdir()
    with open(landing / "batch_0.json", "w") as f:
        for doc_id, text in [(1, base), (2, near)]:
            f.write(_json.dumps({"doc_id": doc_id, "text": text}) + "\n")

    paths = {n: str(tmp_path / n) for n in ("store", "dups", "ckpt_a", "ckpt_b")}
    run_streaming_dedup(spark, str(landing), paths["store"], paths["dups"], paths["ckpt_a"])
    store_1 = spark.read.parquet(paths["store"]).count()
    dups_1 = spark.read.parquet(paths["dups"]).count()
    assert dups_1 >= 1

    # fresh checkpoint → the file re-delivers as batch 0 again (replay)
    run_streaming_dedup(spark, str(landing), paths["store"], paths["dups"], paths["ckpt_b"])
    assert spark.read.parquet(paths["store"]).count() == store_1
    assert spark.read.parquet(paths["dups"]).count() == dups_1


def test_runtime_bloom_filter_injects_on_selective_shuffle_join(spark):
    """Runtime bloom-filter join pruning — the runtime-filter mechanism
    for the scans DPP cannot cover (unpartitioned join keys): when a
    shuffle join's build side is selectively filtered, InjectRuntimeFilter
    adds a bloom_filter_agg over the build keys and a might_contain()
    pre-filter on the big side's scan, dropping non-joining rows BEFORE
    the shuffle.  Spark gates it on a 10 GiB application-side scan by
    default (invisible at test scale), so the thresholds are lowered
    here to pin that the engine's canonical fact-fact join shape is
    ELIGIBLE — at 100 TB the same plan gets the filter under stock
    defaults.  Result equality with the filter on/off is also pinned
    (the bloom is a performance-only pre-filter, never semantics)."""
    from pyspark.sql import functions as F

    li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
    o = spark.read.parquet("/root/testdata/sf0.1/orders.parquet").filter(
        F.col("o_totalprice") > 400000
    )

    def shape():
        return (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count("*").cast("long").alias("n"))
            .orderBy("o_orderpriority")
        )

    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force shuffle join
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0"
        )
        filtered = shape()
        p = filtered._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter_agg" in p and "might_contain" in p, p
        with_filter = [tuple(r) for r in filtered.collect()]

        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
        without = [tuple(r) for r in shape().collect()]
        assert with_filter == without and len(with_filter) > 0
    finally:
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_aqe_skew_join_splits_hot_partition(spark):
    """AQE's OptimizeSkewedJoin — the last stock runtime-replan
    mechanism without a plan pin (round-11 verdict item 7; x203 pins
    MANUAL salting): when one shuffle partition of a sort-merge join is
    skewed (> factor × median AND > the byte threshold), AQE splits it
    into sub-partitions and duplicates the matching build partition,
    so one straggler task becomes N parallel ones — the runtime answer
    to hot keys the engine relies on at 100 TB.  Thresholds default to
    256 MiB (invisible at test scale) and are lowered here to pin that
    the canonical hot-key join shape is ELIGIBLE; the final adaptive
    plan must carry SortMergeJoin(skew=true) + a skewed AQEShuffleRead.
    Result equality with the mechanism on/off is pinned too (the split
    is performance-only, never semantics).

    Documented decline (asserted below, not a bug): when the join feeds
    an aggregation keyed on the SAME join key, the agg reuses the
    join's hash partitioning, and splitting the skewed partition would
    force an extra shuffle — AQE then declines unless
    forceOptimizeSkewedJoin is set.  Salting (x203) remains the remedy
    for skew under partitioning-reuse shapes."""
    left = spark.range(300_000).select(
        F.when(F.col("id") % 10 < 7, F.lit(0))
        .otherwise(F.col("id") % 50)
        .cast("long")
        .alias("k"),
        (F.col("id") % 97).alias("v"),
    )
    right = spark.range(0, 2_000).select(
        (F.col("id") % 50).alias("k"), (F.col("id") * 3).alias("w")
    )

    def shape():
        return left.join(right, "k").agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.col("v") + F.col("w")).cast("long").alias("sv"),
        )

    keys = (
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
    )
    saved = {k: spark.conf.get(k) for k in keys}
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16k")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32k"
        )
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")

        df = shape()
        with_split = [tuple(r) for r in df.collect()]
        p = df._jdf.queryExecution().executedPlan().toString()  # final adaptive plan
        assert "SortMergeJoin(skew=true)" in p, p
        assert "skewed" in p, p  # the AQEShuffleRead that carries the sub-splits

        # the documented decline: same join feeding a groupBy on the join
        # key — partitioning reuse wins, no skew split in the final plan
        keyed = (
            left.join(right, "k")
            .groupBy("k")
            .agg(F.count("*").cast("long").alias("n"))
            .orderBy("k")
        )
        keyed.collect()
        assert "skew=true" not in keyed._jdf.queryExecution().executedPlan().toString()

        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        without = [tuple(r) for r in shape().collect()]
        assert with_split == without and with_split[0][0] == 12_000_000
    finally:
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_aqe_converts_smj_to_broadcast_at_runtime(spark):
    """AQE's runtime join-strategy switch — the replan that rescues the
    statically-mis-sized joins a 100 TB workload is full of: a filtered
    build side's STATIC size estimate is its file footprint (filters
    don't shrink sizeInBytes without CBO stats), so the initial plan is
    a sort-merge join; after the build side's shuffle stage
    materializes, its true byte size is under the broadcast threshold
    and AQE replans the join as BroadcastHashJoin — no shuffle on the
    100 TB probe side.  Pinned: initial plan SMJ-no-BHJ, final adaptive
    plan carries the BHJ, and the result equals the non-adaptive run
    (the switch is performance-only).  Completes the stock-mechanism
    pin set (DPP, runtime bloom, skew split, decorrelation, null-aware
    anti join)."""
    li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
    o = spark.read.parquet("/root/testdata/sf0.1/orders.parquet").filter(
        F.col("o_totalprice") > 400000
    )

    def shape():
        return li.join(o, li.l_orderkey == o.o_orderkey).agg(
            F.count("*").cast("long").alias("n")
        )

    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # below orders' ~2.7 MB file footprint => static plan can't broadcast;
        # the ~30k filtered rows' runtime bytes are well under it => AQE can
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "512k")
        df = shape()
        pre = df._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in pre and "BroadcastHashJoin" not in pre, pre
        with_aqe = [tuple(r) for r in df.collect()]
        post = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in post, post

        spark.conf.set("spark.sql.adaptive.enabled", "false")
        assert [tuple(r) for r in shape().collect()] == with_aqe
        assert with_aqe[0][0] > 0
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
