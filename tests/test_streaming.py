"""Streaming-tier tests — T1-T5: availableNow pipeline lands the same
warehouse tables as the batch path, trip upsert is idempotent across
restarts, quarantine captures corrupt rows."""

from __future__ import annotations

import glob
import json
import os
import shutil

from pyspark.sql import functions as F

from trimet_bytes__data_engineering_project_spark.operators.transform import (
    breadcrumb_table,
    enrich_breadcrumbs,
    trip_table,
)
from trimet_bytes__data_engineering_project_spark.operators.validate import (
    breadcrumb_validators,
    quarantine_split,
)
from trimet_bytes__data_engineering_project_spark.schemas import BREADCRUMB_RAW
from trimet_bytes__data_engineering_project_spark.sources.readers import read_breadcrumb_json
from trimet_bytes__data_engineering_project_spark.streaming import run_ingest_pipeline

from .fixtures import breadcrumb_raw_records, corrupt_breadcrumb_records, write_breadcrumb_landing


def test_stream_matches_batch(spark, tmp_path):
    landing = tmp_path / "landing"
    landing.mkdir()
    records = breadcrumb_raw_records() + corrupt_breadcrumb_records()
    write_breadcrumb_landing(landing, records)

    paths = {n: str(tmp_path / n) for n in ("trip", "breadcrumb", "ckpt", "quarantine")}
    run_ingest_pipeline(
        spark, str(landing), paths["trip"], paths["breadcrumb"], paths["ckpt"],
        quarantine_path=paths["quarantine"],
    )

    # batch twin over the same landing files
    raw = read_breadcrumb_json(spark, str(landing))
    valid, quarantined = quarantine_split(enrich_breadcrumbs(raw), breadcrumb_validators())

    streamed_bc = spark.read.parquet(paths["breadcrumb"])
    assert streamed_bc.count() == breadcrumb_table(valid).count()
    # Q1-style parity: per-date counts identical between stream and batch
    s = {str(r[0]): r[1] for r in streamed_bc.groupBy(F.to_date("tstamp")).count().collect()}
    b = {
        str(r[0]): r[1]
        for r in breadcrumb_table(valid).groupBy(F.to_date("tstamp")).count().collect()
    }
    assert s == b

    streamed_trips = spark.read.parquet(paths["trip"])
    assert streamed_trips.count() == trip_table(valid).count()
    assert spark.read.parquet(paths["quarantine"]).count() == quarantined.count()


def test_restart_is_idempotent_for_trips(spark, tmp_path):
    """T3/T5 — a second availableNow run over new files for the SAME trips
    must not duplicate trip dimension rows (left_anti upsert)."""
    landing = tmp_path / "landing"
    landing.mkdir()
    records = breadcrumb_raw_records()
    write_breadcrumb_landing(landing, records, files=2)

    paths = {n: str(tmp_path / n) for n in ("trip", "breadcrumb", "ckpt")}
    run_ingest_pipeline(spark, str(landing), paths["trip"], paths["breadcrumb"], paths["ckpt"])
    n_trips_first = spark.read.parquet(paths["trip"]).count()

    # new landing file, same trip ids (late pings for existing trips)
    late = [dict(r, ACT_TIME=80000) for r in records[:30]]
    with open(landing / "bus_late.json", "w") as f:
        for r in late:
            f.write(json.dumps(r) + "\n")
    run_ingest_pipeline(spark, str(landing), paths["trip"], paths["breadcrumb"], paths["ckpt"])

    trips = spark.read.parquet(paths["trip"])
    assert trips.count() == n_trips_first  # no new trip ids → no new rows
    assert trips.groupBy("trip_id").count().filter("count > 1").count() == 0


def test_hourly_rollup_watermarked_window(spark, tmp_path):
    """T4 — the watermarked tumbling window over the streamed landing
    matches the same rollup computed in batch."""
    from trimet_bytes__data_engineering_project_spark.functions.scalar import (
        act_time_timestamp,
        parse_opd_date,
    )
    from trimet_bytes__data_engineering_project_spark.schemas import BREADCRUMB_RAW
    from trimet_bytes__data_engineering_project_spark.streaming.pipeline import (
        hourly_rollup,
        streaming_breadcrumbs,
    )

    landing = tmp_path / "landing"
    landing.mkdir()
    write_breadcrumb_landing(landing, breadcrumb_raw_records())

    q = (
        hourly_rollup(streaming_breadcrumbs(spark, str(landing)))
        .writeStream.format("memory")
        .queryName("rollup")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r["hour_start"]: r["n_readings"] for r in spark.sql("SELECT * FROM rollup").collect()
    }

    batch = spark.read.schema(BREADCRUMB_RAW).json(str(landing))
    ts = act_time_timestamp(parse_opd_date("OPD_DATE"), F.col("ACT_TIME"))
    want = {
        r["hour_start"]: r["n"]
        for r in batch.select(ts.alias("TIMESTAMP"))
        .filter(F.col("TIMESTAMP").isNotNull())
        .groupBy(F.date_trunc("hour", "TIMESTAMP").alias("hour_start"))
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == want and got


def test_dedup_within_watermark_drops_cross_batch_redeliveries(spark, tmp_path):
    """At-least-once redelivery: the same records land twice across
    DIFFERENT micro-batches (maxFilesPerTrigger=1) — the watermarked
    dedup keeps exactly one copy of each key, matching the batch
    distinct over the same files, with bounded (watermark-evicted)
    state rather than forever-growing dropDuplicates state."""
    from trimet_bytes__data_engineering_project_spark.streaming.pipeline import (
        dedup_within_watermark,
    )

    landing = tmp_path / "landing"
    landing.mkdir()
    records = breadcrumb_raw_records()
    # file 0: originals; file 1: redelivery of the first half (dup keys)
    with open(landing / "a.json", "w") as f:
        for r in records:
            f.write(json.dumps(r) + "\n")
    with open(landing / "b.json", "w") as f:
        for r in records[: len(records) // 2]:
            f.write(json.dumps(r) + "\n")

    stream = (
        spark.readStream.schema(BREADCRUMB_RAW)
        .option("maxFilesPerTrigger", 1)
        .json(str(landing))
    )
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = (
        dedup_within_watermark(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out_dir)
    keys = ["EVENT_NO_TRIP", "VEHICLE_ID", "ACT_TIME"]
    # one row per distinct key, none lost
    assert got.count() == got.select(*keys).distinct().count()
    batch = read_breadcrumb_json(spark, str(landing))
    assert got.count() == batch.select(*keys).distinct().count()


def test_hourly_rollup_appends_only_finalized_windows(spark, tmp_path):
    """T4 late-data contract, append mode: a window is emitted exactly
    once, when the watermark (max event time − lateness) passes its
    end — records later than that are dropped from the result rather
    than mutating an already-emitted row.  Two micro-batches
    (maxFilesPerTrigger=1): batch 2's fresh data advances the
    watermark past hour-0, so hour-0 is finalized WITHOUT batch 2's
    straggler; windows the watermark never passes stay in state and
    are not emitted at stream end (availableNow)."""
    import json as _json

    from trimet_bytes__data_engineering_project_spark.streaming.pipeline import (
        hourly_rollup,
        streaming_breadcrumbs,
    )

    landing = tmp_path / "landing"
    landing.mkdir()

    def rec(act_time):
        return {
            "EVENT_NO_TRIP": 1, "EVENT_NO_STOP": 1, "OPD_DATE": "01JAN2024:00:00:00",
            "VEHICLE_ID": 1, "METERS": 0, "ACT_TIME": act_time,
            "GPS_LONGITUDE": 0.0, "GPS_LATITUDE": 0.0, "GPS_SATELLITES": 5, "GPS_HDOP": 1.0,
        }

    # batch 1: two readings in hour 0 (00:10, 00:20); batch 2: fresh
    # data at 05:00 (the watermark for batch 3 becomes 04:00 under 1h
    # lateness → hour 0 finalizes); batch 3: a straggler back in hour 0
    # — now later than the watermark, dropped.  (The watermark a batch
    # runs under comes from data through the PREVIOUS batch, so the
    # straggler must arrive one batch after the advancing data.)
    import os as _os

    for i, (name, times) in enumerate(
        [
            ("a.json", (600, 1200)),
            ("b.json", (5 * 3600,)),
            ("c.json", (6 * 3600,)),  # spacer: the wm FILTER lags the
            # reported wm by one batch, so the straggler needs two
            # batches after the advancing data
            ("d.json", (1800,)),
        ]
    ):
        with open(landing / name, "w") as f:
            for t in times:
                f.write(_json.dumps(rec(t)) + "\n")
        _os.utime(landing / name, (1700000000 + i * 10, 1700000000 + i * 10))

    from trimet_bytes__data_engineering_project_spark.schemas import BREADCRUMB_RAW

    s = (
        spark.readStream.schema(BREADCRUMB_RAW)
        .option("maxFilesPerTrigger", 1)
        .json(str(landing))
    )
    q = (
        hourly_rollup(s, lateness="1 hour")
        .writeStream.format("memory")
        .queryName("rollup_append")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        str(r["hour_start"]): r["n_readings"]
        for r in spark.sql("SELECT * FROM rollup_append").collect()
    }
    # hour 0 emitted with batch 1's two readings only — the final
    # straggler ran under wm 04:00 and was dropped.  hours 5 and 6
    # stay unemitted: the last watermark (05:00, from the 06:00 data
    # minus 1h lateness) never passed their window ends — append mode
    # withholds unfinalized windows rather than emitting provisional
    # rows it would have to retract
    assert got == {"2024-01-01 00:00:00": 2}


def test_kafka_parse_contract_roundtrip(spark):
    """S7 cluster path (SURVEY §2.9): a batch DataFrame with the kafka
    connector's EXACT wire schema (key/value binary, topic, partition,
    offset, timestamp, timestampType) stands in for a broker.  One JSON
    breadcrumb per message round-trips bit-exact through
    parse_kafka_breadcrumbs; a poison payload becomes an all-null row
    flagged _poison=True (kept, not silently acked-and-dropped like
    the reference's finally-block, Part1/subscriber_project.py:31-39);
    kafka offsets ride along for exactly-once bookkeeping."""
    import datetime

    from trimet_bytes__data_engineering_project_spark.streaming.pipeline import (
        KAFKA_WIRE_SCHEMA,
        parse_kafka_breadcrumbs,
    )

    recs = breadcrumb_raw_records()
    ts = datetime.datetime(2023, 1, 7, 1, 2, 3)
    wire_rows = [
        (str(r["VEHICLE_ID"]).encode(), json.dumps(r).encode(), "breadcrumbs", i % 2, i, ts, 0)
        for i, r in enumerate(recs)
    ] + [(b"poison", b"{not json", "breadcrumbs", 0, 999, ts, 0)]
    wire = spark.createDataFrame(wire_rows, KAFKA_WIRE_SCHEMA)
    out = parse_kafka_breadcrumbs(wire)

    # schema contract: BREADCRUMB_RAW fields + ingest metadata + _poison
    assert [f.name for f in out.schema.fields[: len(BREADCRUMB_RAW.fields)]] == [
        f.name for f in BREADCRUMB_RAW.fields
    ]
    assert out.schema["EVENT_NO_TRIP"].dataType.simpleString() == "bigint"
    rows = out.collect()
    good = [r for r in rows if not r["_poison"]]
    bad = [r for r in rows if r["_poison"]]
    assert len(good) == len(recs) and len(bad) == 1
    got = sorted(
        (r["EVENT_NO_TRIP"], r["OPD_DATE"], r["ACT_TIME"], r["GPS_LATITUDE"]) for r in good
    )
    want = sorted(
        (r["EVENT_NO_TRIP"], r["OPD_DATE"], r["ACT_TIME"], r.get("GPS_LATITUDE")) for r in recs
    )
    assert got == want
    assert bad[0]["kafka_offset"] == 999  # poison keeps its provenance

    # same downstream semantics as the file source: the parsed rows feed
    # the identical enrich chain the availableNow pipeline uses
    enriched = enrich_breadcrumbs(
        out.filter(~F.col("_poison")).select(*[f.name for f in BREADCRUMB_RAW.fields])
    )
    assert enriched.count() == len(recs)


def test_kafka_reader_gated_on_connector(spark):
    """The real .format('kafka') reader needs the spark-sql-kafka
    connector jar (cluster-side --packages); this container has no
    broker and no jar, so the reader must fail with the connector-
    missing error (NOT an API/typo error) — proving the code path is
    wired right up to the classpath boundary.  On a cluster with the
    jar this same call returns the stream parse_kafka_breadcrumbs
    already contract-tests.

    Round-5 check: the jar cannot land here — pyspark's bundled jars
    dir has no kafka artifact and the sandbox has no network route to
    Maven (verified: repo1.maven.org does not resolve), so
    ``--packages`` cannot fetch it either.  The wire-schema roundtrip
    test above remains the strongest broker-less coverage."""
    import pytest

    from trimet_bytes__data_engineering_project_spark.streaming.pipeline import (
        streaming_breadcrumbs_kafka,
    )

    try:
        streaming_breadcrumbs_kafka(spark, "localhost:9092", "breadcrumbs")
    except Exception as e:  # noqa: BLE001
        msg = str(e)
        assert "kafka" in msg.lower() and (
            "Failed to find" in msg or "DATA_SOURCE_NOT_FOUND" in msg or "provider" in msg.lower()
        ), f"unexpected failure mode: {msg[:200]}"
    else:
        pytest.skip("kafka connector present — reader built a stream; contract holds")


def test_streaming_lsh_index_equals_batch_build(spark, tmp_path):
    """Streaming index maintenance (streaming/index.py): embedding
    batches land via availableNow foreachBatch into per-batch_id
    bucket-partitioned directories; the probe over the streamed index
    returns EXACTLY the batch-built index's top-k (same deterministic
    hyperplanes).  A restart on the same checkpoint is a no-op, and a
    new landing file is processed incrementally — the index stays
    fresh without a rebuild."""
    from trimet_bytes__data_engineering_project_spark.operators.ann_index import (
        lsh_index_probe,
        write_lsh_index,
    )
    from trimet_bytes__data_engineering_project_spark.plans.tables import load_table
    from trimet_bytes__data_engineering_project_spark.streaming.index import (
        run_streaming_lsh_index,
    )

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    dim = len(emb.first()["embedding"])
    qvec = [float(v) for v in emb.filter("vec_id = 0").first()["embedding"]]

    landing = str(tmp_path / "landing")
    os.makedirs(landing)

    def land_file(df, name):
        # flat parquet files: the file-stream source does not recurse
        # into per-write subdirectories
        t = str(tmp_path / f"w_{name}")
        df.coalesce(1).write.parquet(t)
        shutil.move(glob.glob(f"{t}/part-*.parquet")[0], f"{landing}/{name}.parquet")

    # two initial "crawl" batches + one late batch held back
    land_file(emb.filter("vec_id % 3 = 0"), "a")
    land_file(emb.filter("vec_id % 3 = 1"), "b")

    idx = str(tmp_path / "stream_idx")
    ck = str(tmp_path / "ck")
    run_streaming_lsh_index(spark, landing, idx, dim, ck)

    batch_idx = str(tmp_path / "batch_idx")
    write_lsh_index(emb.filter("vec_id % 3 != 2"), batch_idx, dim=dim)
    got = [tuple(r) for r in lsh_index_probe(spark, idx, qvec, k=5).collect()]
    want = [tuple(r) for r in lsh_index_probe(spark, batch_idx, qvec, k=5).collect()]
    assert got == want and len(got) > 0

    # restart on the same checkpoint: no new input -> index unchanged
    n_before = spark.read.parquet(idx).count()
    run_streaming_lsh_index(spark, landing, idx, dim, ck)
    assert spark.read.parquet(idx).count() == n_before

    # late batch arrives -> processed incrementally, probe sees all rows
    land_file(emb.filter("vec_id % 3 = 2"), "c")
    run_streaming_lsh_index(spark, landing, idx, dim, ck)
    assert spark.read.parquet(idx).count() == emb.count()
    full_idx = str(tmp_path / "full_idx")
    write_lsh_index(emb, full_idx, dim=dim)
    got_full = [tuple(r) for r in lsh_index_probe(spark, idx, qvec, k=5).collect()]
    want_full = [tuple(r) for r in lsh_index_probe(spark, full_idx, qvec, k=5).collect()]
    assert got_full == want_full


def test_streaming_ivf_index_equals_batch_build(spark, tmp_path):
    """Streaming IVF maintenance: quantizer bootstrapped once (frozen),
    embedding batches assigned and landed per-batch_id; the nprobe
    probe over the streamed index equals the probe over a one-shot
    batch build that used the SAME centroids."""
    from trimet_bytes__data_engineering_project_spark.operators.ann_index import (
        ivf_index_probe,
        write_ivf_index,
    )
    from trimet_bytes__data_engineering_project_spark.operators.similarity import (
        as_double_vec,
    )
    from trimet_bytes__data_engineering_project_spark.plans.tables import load_table
    from trimet_bytes__data_engineering_project_spark.streaming.index import (
        bootstrap_ivf_quantizer,
        run_streaming_ivf_index,
    )

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    qvec = [float(v) for v in emb.filter("vec_id = 7").first()["embedding"]]
    cents = (
        emb.orderBy("vec_id")
        .limit(8)
        .select(F.col("vec_id").alias("centroid_id"), as_double_vec("embedding").alias("cvec"))
    )

    landing = str(tmp_path / "landing")
    os.makedirs(landing)

    def land_file(df, name):
        t = str(tmp_path / f"w_{name}")
        df.coalesce(1).write.parquet(t)
        shutil.move(glob.glob(f"{t}/part-*.parquet")[0], f"{landing}/{name}.parquet")

    land_file(emb.filter("vec_id % 2 = 0"), "a")
    land_file(emb.filter("vec_id % 2 = 1"), "b")

    idx = str(tmp_path / "stream_ivf")
    bootstrap_ivf_quantizer(cents, idx)
    run_streaming_ivf_index(spark, landing, idx, str(tmp_path / "ck"))

    batch_idx = str(tmp_path / "batch_ivf")
    write_ivf_index(emb, batch_idx, centroids=cents)
    for nprobe in (1, 3):
        got = [tuple(r) for r in ivf_index_probe(spark, idx, qvec, k=5, nprobe=nprobe).collect()]
        want = [tuple(r) for r in ivf_index_probe(spark, batch_idx, qvec, k=5, nprobe=nprobe).collect()]
        assert got == want and len(got) > 0


def test_streaming_knn_serve_equals_query_time_join(spark, tmp_path):
    """Streaming retrieval serving: micro-batches of query vectors
    probe the persisted LSH index (bounded bucket-set collect -> IN-list
    partition filter -> one bucket equi-join) and land per-batch_id
    top-k results pinned IDENTICAL to query-time knn_join over the same
    corpus with the same planes."""
    from trimet_bytes__data_engineering_project_spark.operators.ann_index import (
        write_lsh_index,
    )
    from trimet_bytes__data_engineering_project_spark.operators.similarity import knn_join
    from trimet_bytes__data_engineering_project_spark.plans.tables import load_table
    from trimet_bytes__data_engineering_project_spark.streaming.index import (
        run_streaming_knn_serve,
    )

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    dim = len(emb.first()["embedding"])
    corpus = emb.filter("vec_id % 10 != 0")
    queries = emb.filter("vec_id % 10 = 0")

    idx = str(tmp_path / "idx")
    write_lsh_index(corpus, idx, dim=dim)

    landing = str(tmp_path / "qs")
    os.makedirs(landing)
    for name, flt in (("a", "vec_id % 20 = 0"), ("b", "vec_id % 20 = 10")):
        t = str(tmp_path / f"w_{name}")
        queries.filter(flt).coalesce(1).write.parquet(t)
        shutil.move(glob.glob(f"{t}/part-*.parquet")[0], f"{landing}/{name}.parquet")

    results = str(tmp_path / "res")
    run_streaming_knn_serve(spark, landing, idx, results, str(tmp_path / "ck"), dim=dim)

    got = sorted(
        tuple(r)
        for r in spark.read.parquet(results).select("q_id", "c_id", "cos_sim", "rn").collect()
    )
    want = sorted(tuple(r) for r in knn_join(queries, corpus, dim=dim, k=3).collect())
    assert got == want and len(got) > 0


def test_stream_static_enrich_matches_batch(spark, tmp_path):
    """T4+J1 — the watermarked stream-static enrich (breadcrumb stream
    inner-joined to the trip dimension per micro-batch) lands exactly
    the batch join's rows, and the downstream watermarked rollup
    composes without re-declaring the watermark."""
    from trimet_bytes__data_engineering_project_spark.functions.scalar import (
        act_time_timestamp,
        parse_opd_date,
    )
    from trimet_bytes__data_engineering_project_spark.streaming.pipeline import (
        stream_static_enrich,
        streaming_breadcrumbs,
    )

    landing = tmp_path / "landing"
    landing.mkdir()
    write_breadcrumb_landing(landing, breadcrumb_raw_records())

    batch_raw = spark.read.schema(BREADCRUMB_RAW).json(str(landing))
    trips = trip_table(enrich_breadcrumbs(batch_raw)).select(
        "trip_id", "vehicle_id", "service_key"
    )
    dim_path = str(tmp_path / "trip_dim")
    # drop one trip so the inner join genuinely filters
    dropped = trips.orderBy("trip_id").limit(1)
    trips.join(dropped, "trip_id", "left_anti").write.parquet(dim_path)
    dim = spark.read.parquet(dim_path)

    ts = act_time_timestamp(parse_opd_date("OPD_DATE"), F.col("ACT_TIME"))

    def keyed(df):
        return df.select(
            F.col("EVENT_NO_TRIP").cast("long").alias("trip_id"),
            ts.alias("TIMESTAMP"),
            F.col("METERS").alias("meters"),
        ).filter(F.col("TIMESTAMP").isNotNull())

    out_path, ck = str(tmp_path / "enriched"), str(tmp_path / "ck_enrich")
    q = (
        stream_static_enrich(keyed(streaming_breadcrumbs(spark, str(landing))), dim, "trip_id")
        .writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = spark.read.parquet(out_path)
    want = keyed(batch_raw).join(dim, "trip_id")
    assert got.count() == want.count() > 0
    assert got.count() < keyed(batch_raw).count()  # the dropped trip filtered
    key = ["trip_id", "TIMESTAMP", "meters", "vehicle_id", "service_key"]
    assert sorted(map(tuple, got.select(key).collect())) == sorted(
        map(tuple, want.select(key).collect())
    )


def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    """T4 — bounded stream-stream inner join with both-side watermarks:
    stop-event stream ⋈ breadcrumb stream on trip_id with the
    breadcrumb inside [event_ts, event_ts + 600 s].  Pinned row-for-row
    to the batch join twin, including a ping that matches TWO events
    (row multiplication) and pings/events with no partner in range."""
    import datetime

    from trimet_bytes__data_engineering_project_spark.streaming.pipeline import (
        stream_stream_interval_join,
    )

    t0 = datetime.datetime(2023, 1, 6, 8, 0, 0)

    def at(s):
        return t0 + datetime.timedelta(seconds=s)

    events = [  # (trip_id, ev_ts): service stops
        (1, at(0)), (1, at(500)),   # overlapping windows: ping at 550 matches both
        (2, at(0)),
        (3, at(0)),                  # no pings for trip 3
    ]
    pings = [  # (trip_id, bc_ts)
        (1, at(550)), (1, at(700)), (1, at(2000)),  # 2000 out of range
        (2, at(599)), (2, at(601)),                  # boundary: 601 > 600 excluded
        (4, at(10)),                                  # no events for trip 4
    ]
    ev_path, bc_path = str(tmp_path / "ev"), str(tmp_path / "bc")
    spark.createDataFrame(events, "trip_id long, ev_ts timestamp").write.parquet(ev_path)
    spark.createDataFrame(pings, "trip_id long, bc_ts timestamp").write.parquet(bc_path)

    left = spark.readStream.schema("trip_id long, ev_ts timestamp").parquet(ev_path)
    right = spark.readStream.schema("trip_id long, bc_ts timestamp").parquet(bc_path)
    out_path, ck = str(tmp_path / "joined"), str(tmp_path / "ck_join")
    q = (
        stream_stream_interval_join(left, right, "trip_id", "ev_ts", "bc_ts", 600)
        .writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = sorted(map(tuple, spark.read.parquet(out_path).collect()))
    lb = spark.read.parquet(ev_path)
    rb = spark.read.parquet(bc_path)
    cond = (
        (lb["trip_id"] == rb["trip_id"])
        & (rb["bc_ts"] >= lb["ev_ts"])
        & (rb["bc_ts"] <= lb["ev_ts"] + F.expr("INTERVAL 600 SECONDS"))
    )
    want = sorted(map(tuple, lb.join(rb, cond).drop(rb["trip_id"]).collect()))
    assert got == want
    # the hand-computed expectation, not just engine-vs-engine:
    # trip 1: ping@550 matches ev@0 AND ev@500; ping@700 matches ev@500
    # trip 2: ping@599 matches ev@0 (601 excluded); trips 3/4 no output
    assert len(got) == 4


def test_streaming_lsh_index_accepts_double_landing(spark, tmp_path):
    """A landing directory written with array<double> embeddings (e.g.
    anything passed through as_double_vec before landing) streams with
    vec_element_type="double" and builds the SAME index as the float
    landing — the dtype tolerance the batch path already has via
    load_table/as_double_vec."""
    from trimet_bytes__data_engineering_project_spark.operators.ann_index import (
        lsh_index_probe,
    )
    from trimet_bytes__data_engineering_project_spark.operators.similarity import (
        as_double_vec,
    )
    from trimet_bytes__data_engineering_project_spark.plans.tables import load_table
    from trimet_bytes__data_engineering_project_spark.streaming.index import (
        run_streaming_lsh_index,
    )

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    dim = len(emb.first()["embedding"])
    qvec = [float(v) for v in emb.filter("vec_id = 0").first()["embedding"]]

    def land(df, name):
        d = str(tmp_path / name)
        os.makedirs(d)
        t = str(tmp_path / f"w_{name}")
        df.coalesce(1).write.parquet(t)
        shutil.move(glob.glob(f"{t}/part-*.parquet")[0], f"{d}/a.parquet")
        return d

    f_landing = land(emb, "float_landing")
    d_landing = land(
        emb.select("vec_id", as_double_vec("embedding").alias("embedding")),
        "double_landing",
    )

    f_idx, d_idx = str(tmp_path / "f_idx"), str(tmp_path / "d_idx")
    run_streaming_lsh_index(spark, f_landing, f_idx, dim, str(tmp_path / "f_ck"))
    run_streaming_lsh_index(
        spark, d_landing, d_idx, dim, str(tmp_path / "d_ck"), vec_element_type="double"
    )
    got = [tuple(r) for r in lsh_index_probe(spark, d_idx, qvec, k=5).collect()]
    want = [tuple(r) for r in lsh_index_probe(spark, f_idx, qvec, k=5).collect()]
    assert got == want and len(got) == 5


def test_streaming_quantized_serve_equals_batch(spark, tmp_path):
    """quantized=True serving: micro-batches of query vectors probe the
    int8 index and land exactly the batch quantized_knn_join_index
    results — the compressed serving path is the same plan driven by
    the stream."""
    from pyspark.sql import functions as F

    from trimet_bytes__data_engineering_project_spark.operators.ann_index import (
        quantized_knn_join_index,
        write_quantized_lsh_index,
    )
    from trimet_bytes__data_engineering_project_spark.plans.tables import load_table
    from trimet_bytes__data_engineering_project_spark.streaming.index import (
        run_streaming_knn_serve,
    )

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    dim = len(emb.first()["embedding"])
    corpus = emb.filter(F.col("vec_id") % 10 != 0)
    queries = emb.filter(F.col("vec_id") % 10 == 0)

    idx = str(tmp_path / "qidx")
    write_quantized_lsh_index(corpus, idx, dim=dim)

    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    t = str(tmp_path / "w")
    queries.coalesce(1).write.parquet(t)
    shutil.move(glob.glob(f"{t}/part-*.parquet")[0], f"{landing}/q.parquet")

    results, ck = str(tmp_path / "res"), str(tmp_path / "ck")
    run_streaming_knn_serve(spark, landing, idx, results, ck, dim, quantized=True)
    got = sorted(
        tuple(r) for r in spark.read.parquet(results)
        .select("q_id", "c_id", "q_cos", "rn").collect()
    )
    want = sorted(
        tuple(r)
        for r in quantized_knn_join_index(spark, queries, idx, dim, k=3).collect()
    )
    assert got == want and len(got) > 0


def test_streaming_ivf_serve_equals_batch_join(spark, tmp_path):
    """Streaming IVF retrieval serving — float and QUANTIZED: micro-
    batches of query vectors assign against the frozen persisted
    quantizer, probe only their inverted lists, and land per-batch_id
    top-k pinned IDENTICAL to the batch join operator over the same
    index (serving IS the batch plan driven by the stream)."""
    from trimet_bytes__data_engineering_project_spark.operators.ann_index import (
        ivf_knn_join,
        quantized_ivf_knn_join,
        write_ivf_index,
        write_quantized_ivf_index,
    )
    from trimet_bytes__data_engineering_project_spark.plans.tables import load_table
    from trimet_bytes__data_engineering_project_spark.streaming.index import (
        run_streaming_ivf_serve,
    )

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    corpus = emb.filter("vec_id % 10 != 0")
    queries = emb.filter("vec_id % 10 = 0")

    landing = str(tmp_path / "qs")
    os.makedirs(landing)
    for name, flt in (("a", "vec_id % 20 = 0"), ("b", "vec_id % 20 = 10")):
        t = str(tmp_path / f"w_{name}")
        queries.filter(flt).coalesce(1).write.parquet(t)
        shutil.move(glob.glob(f"{t}/part-*.parquet")[0], f"{landing}/{name}.parquet")

    for quantized, write_fn, join_fn, score in (
        (False, write_ivf_index, ivf_knn_join, "cos_sim"),
        (True, write_quantized_ivf_index, quantized_ivf_knn_join, "q_cos"),
    ):
        tag = "q" if quantized else "f"
        idx = str(tmp_path / f"idx_{tag}")
        write_fn(corpus, idx)
        results = str(tmp_path / f"res_{tag}")
        run_streaming_ivf_serve(
            spark, landing, idx, results, str(tmp_path / f"ck_{tag}"),
            quantized=quantized,
        )
        got = sorted(
            tuple(r)
            for r in spark.read.parquet(results)
            .select("q_id", "c_id", score, "rn")
            .collect()
        )
        want = sorted(tuple(r) for r in join_fn(spark, queries, idx, k=3).collect())
        assert got == want and len(got) > 0, quantized


def test_hadoopfs_probe_contract(spark, tmp_path):
    """Pin the miss-behavior contract hadoopfs exists for: ``fs_exists``
    answers present/absent through the Hadoop FileSystem API (the same
    filesystem the landing writes go to), and ``fs_list_names`` returns
    child names — for both bare local paths and scheme-qualified URIs.
    An ``os.path`` probe against a non-local URI would read "absent" and
    silently reset cross-batch state; this test pins the API the state
    probes must keep using."""
    from py4j.protocol import Py4JJavaError
    import pytest

    from trimet_bytes__data_engineering_project_spark.streaming.hadoopfs import (
        fs_exists,
        fs_list_names,
    )

    root = tmp_path / "state"
    (root / "gen=0").mkdir(parents=True)
    (root / "gen=1").mkdir()
    (root / "gen=1" / "weights.json").write_text("{}")

    # Present/absent — bare local path.
    assert fs_exists(spark, str(root)) is True
    assert fs_exists(spark, str(root / "gen=1" / "weights.json")) is True
    assert fs_exists(spark, str(root / "gen=2")) is False
    assert fs_exists(spark, str(tmp_path / "never-written")) is False

    # Present/absent — scheme-qualified URI (the non-local-shaped form;
    # os.path.exists would still happen to work for file: but NOT for
    # hdfs:/s3a:, which is why the probes go through the FS API).
    uri = "file://" + str(root)
    assert fs_exists(spark, uri) is True
    assert fs_exists(spark, "file://" + str(root / "gen=2")) is False

    # Listing: child names only (last path component), both forms.
    assert sorted(fs_list_names(spark, str(root))) == ["gen=0", "gen=1"]
    assert sorted(fs_list_names(spark, uri)) == ["gen=0", "gen=1"]
    assert fs_list_names(spark, str(root / "gen=1")) == ["weights.json"]

    # Listing a genuinely-missing path raises (FileNotFoundException
    # through py4j) rather than silently returning [] — callers gate
    # every fs_list_names behind fs_exists, and this pins that the gate
    # is load-bearing.
    with pytest.raises(Py4JJavaError):
        fs_list_names(spark, str(root / "gen=2"))


def test_streaming_media_landing_equals_batch(spark, tmp_path):
    """Two streamed blob landings produce feature + frame stores
    row-equal to one batch pass over the union (pure per-blob
    extractors = exact streaming); frame payload BYTES round-trip the
    store binary-identical; replay on the same checkpoint is a no-op
    (r8 verdict item 6 — the quality.py landing pattern applied to
    blobs)."""
    from trimet_bytes__data_engineering_project_spark.operators.multimodal import (
        extract_features,
        media_from_documents,
        sample_frames,
    )
    from trimet_bytes__data_engineering_project_spark.streaming.multimodal import (
        features_from_store,
        frames_from_store,
        run_streaming_media_features,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(40)
    media = media_from_documents(docs)

    landing = str(tmp_path / "landing")
    os.makedirs(landing)

    def land_file(df, name):
        t = str(tmp_path / f"w_{name}")
        df.coalesce(1).write.parquet(t)
        shutil.move(glob.glob(f"{t}/part-*.parquet")[0], f"{landing}/{name}.parquet")

    land_file(media.filter("media_id % 2 = 0"), "a")
    land_file(media.filter("media_id % 2 = 1"), "b")
    store, ck = str(tmp_path / "store"), str(tmp_path / "ck")
    run_streaming_media_features(spark, landing, store, ck, max_frames=4)

    fcols = ["media_id", "byte_len", "first_codepoint", "sha256_hex", "decoded"]
    got_f = sorted(
        map(tuple, features_from_store(spark, store).select(*fcols).collect())
    )
    want_f = sorted(map(tuple, extract_features(media).select(*fcols).collect()))
    assert got_f == want_f and len(got_f) == 40

    rcols = ["media_id", "frame_idx", "frame_bytes", "decoded"]
    got_r = sorted(
        map(tuple, frames_from_store(spark, store).select(*rcols).collect())
    )
    want_r = sorted(map(tuple, sample_frames(media, 4).select(*rcols).collect()))
    assert got_r == want_r and len(got_r) >= 40
    # blob-in/blob-out: landed frame bytes are exact payload slices
    payload = {r.media_id: bytes(r.payload) for r in media.collect()}
    for mid, idx, fb, decoded in got_r:
        assert not decoded and bytes(fb) in payload[mid]

    # replay idempotency: same checkpoint, no new landings -> no-op
    run_streaming_media_features(spark, landing, store, ck, max_frames=4)
    assert features_from_store(spark, store).count() == 40
    assert frames_from_store(spark, store).count() == len(got_r)


def test_streaming_passage_index_serves_equal_to_inflight(spark, tmp_path):
    """Two streamed document landings build a passage index whose
    derived-df serving scores bit-equal to an in-flight bm25_topk over
    the chunked union — streamed chunking is exact (pure per-doc
    projection) and the generation layout's raw stats are additive."""
    from trimet_bytes__data_engineering_project_spark.operators.retrieval import (
        bm25_serve,
        bm25_topk,
        materialize_queries,
        top_terms_queries,
    )
    from trimet_bytes__data_engineering_project_spark.operators.textstats import (
        chunk_documents,
    )
    from trimet_bytes__data_engineering_project_spark.streaming.index import (
        run_streaming_passage_index,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(80)

    landing = str(tmp_path / "landing")
    os.makedirs(landing)

    def land_file(df, name):
        t = str(tmp_path / f"w_{name}")
        df.coalesce(1).write.parquet(t)
        shutil.move(glob.glob(f"{t}/part-*.parquet")[0], f"{landing}/{name}.parquet")

    land_file(docs.filter("doc_id % 2 = 0"), "a")
    land_file(docs.filter("doc_id % 2 = 1"), "b")
    idx, ck = str(tmp_path / "pidx"), str(tmp_path / "ck")
    run_streaming_passage_index(spark, landing, idx, ck)

    queries = materialize_queries(
        top_terms_queries(docs, F.col("doc_id") % 25 == 0, n_terms=3)
    )
    got = sorted(
        map(tuple, bm25_serve(spark, queries, idx, k=10, derived_df=True).collect())
    )
    passages = chunk_documents(docs, size=200, stride=150).select(
        (F.col("doc_id") * F.lit(1048576) + F.col("chunk_idx"))
        .cast("long")
        .alias("passage_id"),
        F.col("chunk_text").alias("text"),
    )
    want = sorted(
        map(
            tuple,
            bm25_topk(passages, queries, k=10, id_col="passage_id", text_col="text").collect(),
        )
    )
    assert got == want and len(got) > 0
    # replay idempotency
    run_streaming_passage_index(spark, landing, idx, ck)
    got2 = sorted(
        map(tuple, bm25_serve(spark, queries, idx, k=10, derived_df=True).collect())
    )
    assert got2 == got


def test_streaming_dim_sums_drift_equals_batch(spark, tmp_path):
    """Two streamed embedding landings produce a dims store whose
    cross-generation drift (dim_drift_from_store) is bit-equal to
    x177's arithmetic computed directly over the same generation
    split — integer sums are additive, so the streamed audit is
    exact; replay is a no-op."""
    from trimet_bytes__data_engineering_project_spark.operators.spectral import (
        quantize_embeddings,
    )
    from trimet_bytes__data_engineering_project_spark.streaming.stats import (
        dim_drift_from_store,
        run_streaming_dim_sums,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(120)
    gen_a = emb.filter("vec_id % 2 = 0")
    gen_b = emb.filter("vec_id % 2 = 1")

    landing = str(tmp_path / "landing")
    os.makedirs(landing)

    def land_file(df, name):
        t = str(tmp_path / f"w_{name}")
        df.coalesce(1).write.parquet(t)
        shutil.move(glob.glob(f"{t}/part-*.parquet")[0], f"{landing}/{name}.parquet")

    store, ck = str(tmp_path / "store"), str(tmp_path / "ck")
    land_file(gen_a, "a")
    run_streaming_dim_sums(spark, landing, store, ck)   # batch 0 = gen A
    land_file(gen_b, "b")
    run_streaming_dim_sums(spark, landing, store, ck)   # batch 1 = gen B

    got = sorted(map(tuple, dim_drift_from_store(spark, store, 0).collect()))

    # direct computation over the same split (x177's arithmetic)
    def sums(df):
        rows = (
            quantize_embeddings(df, 1 << 10)
            .select(F.posexplode("xq").alias("j", "xv"))
            .groupBy("j")
            .agg(F.sum("xv").alias("s"), F.count("*").alias("n"))
            .collect()
        )
        return {r.j: (r.s, r.n) for r in rows}

    import math
    sa, sb = sums(gen_a), sums(gen_b)
    want = sorted(
        (
            j,
            sa[j][0], sa[j][1], sb[j][0], sb[j][1],
            math.floor(
                (sb[j][0] / sb[j][1] - sa[j][0] / sa[j][1]) * 1048576.0
            ),
        )
        for j in sa
    )
    assert got == want and len(got) == 64

    # replay idempotency
    run_streaming_dim_sums(spark, landing, store, ck)
    assert sorted(map(tuple, dim_drift_from_store(spark, store, 0).collect())) == got


def test_streaming_evolving_landing_union_and_type_conflict(spark, tmp_path):
    """Round-11 verdict item 8 — the streamed twin of the r11
    schema-evolution readers: generation-1 rows land under schema v1;
    the feed gains a column; the stream RESTARTS with the evolved
    schema under the SAME checkpoint (the file-source log replays
    nothing, so only generation-2 lands, carrying the new column); and
    the mixed-schema store serves through read_with_schema — the
    pinned, zero-footer-sweep scale read — with the old generation
    null-filling the added column.  A mid-stream TYPE conflict (id
    re-typed string by a broken producer) must kill the run loudly,
    never null a mistyped generation into the store."""
    import pytest
    from pyspark.sql.types import DoubleType, LongType, StringType, StructField, StructType

    from trimet_bytes__data_engineering_project_spark.sources.readers import (
        read_evolved,
        read_with_schema,
    )
    from trimet_bytes__data_engineering_project_spark.streaming.pipeline import (
        run_streaming_evolving_landing,
    )

    landing = str(tmp_path / "landing")
    store, ck = str(tmp_path / "store"), str(tmp_path / "ck")
    os.makedirs(landing)

    def land_file(df, name):
        t = str(tmp_path / f"w_{name}")
        df.coalesce(1).write.parquet(t)
        shutil.move(glob.glob(f"{t}/part-*.parquet")[0], f"{landing}/{name}.parquet")

    v1 = StructType([StructField("id", LongType()), StructField("text", StringType())])
    # a fresh StructType, NOT v1.add(...) — StructType.add mutates in place
    v2 = StructType(list(v1.fields) + [StructField("quality", DoubleType())])

    land_file(spark.createDataFrame([(1, "a"), (2, "b")], v1), "g1")
    run_streaming_evolving_landing(spark, landing, store, ck, v1)
    land_file(spark.createDataFrame([(3, "c", 0.5)], v2), "g2")
    run_streaming_evolving_landing(spark, landing, store, ck, v2)  # same checkpoint

    # two generations landed — g1 was NOT replayed under the new schema
    gens = sorted(os.listdir(f"{store}/gen"))
    assert gens == ["batch_id=0", "batch_id=1"]

    served = read_with_schema(spark, f"{store}/gen", v2)
    # explicit schema still picks up the batch_id partition column
    assert served.schema.simpleString() == (
        "struct<id:bigint,text:string,quality:double,batch_id:int>"
    )
    assert sorted((r.id, r.text, r.quality) for r in served.collect()) == [
        (1, "a", None),
        (2, "b", None),
        (3, "c", 0.5),
    ]
    # the discovery/audit read reconciles the same union schema
    assert read_evolved(spark, f"{store}/gen").columns == served.columns

    # type conflict mid-stream: the run dies, loudly naming the parquet
    # conversion — the store never receives a silently-nulled generation
    bad = spark.createDataFrame(
        [("x", "d", 1.0)], "id string, text string, quality double"
    )
    land_file(bad, "g3")
    with pytest.raises(Exception) as exc:
        run_streaming_evolving_landing(spark, landing, store, ck, v2)
    assert "convert" in str(exc.value).lower()


def test_x214_build_goes_through_checkpointed_writestream(spark):
    """The r13 verdict's done-condition for the streaming driver row:
    x214's store build must DEMONSTRABLY run the availableNow ingest —
    a checkpoint offsets log exists afterwards — and land every file
    exactly once across its two runs plus the no-new-files restart:
    the quarantine holds each poisoned row (VEHICLE_ID=0, every 37th
    event) exactly once, and trip ids are unique despite trips spanning
    both landed generations (the foreachBatch anti-join).  Forces a
    FRESH build (rmtree first) so the assertions witness this code's
    lifecycle, not a prior round's surviving scratch."""
    from trimet_bytes__data_engineering_project_spark.plans.extensions import (
        _SCRATCH,
        _tagged_dir,
    )
    from trimet_bytes__data_engineering_project_spark.plans.registry import QUERIES
    from trimet_bytes__data_engineering_project_spark.plans.tables import load_table

    sf = "/root/testdata/sf0.001"
    store = _tagged_dir(_SCRATCH, "streamed_warehouse", sf_dir=sf)
    shutil.rmtree(store, ignore_errors=True)

    out = QUERIES["x214_streamed_ingest_serve"](spark, sf).collect()
    assert len(out) > 0

    # the build went through a checkpointed writeStream
    offsets = glob.glob(os.path.join(store, "checkpoint", "offsets", "*"))
    assert len(offsets) >= 1, "no streaming offsets log — batch path used?"

    events = load_table(spark, sf, "events")
    n_events = events.count()
    n_poison = events.filter("event_id % 37 = 0").count()

    # exactly-once landing: valid rows land once, poisoned rows
    # quarantine once (runs 2 and 3 must not re-land generation A)
    crumbs = spark.read.parquet(os.path.join(store, "breadcrumb"))
    assert crumbs.count() == n_events - n_poison
    quarantined = spark.read.parquet(os.path.join(store, "quarantine"))
    assert quarantined.count() == n_poison
    assert quarantined.filter(F.col("VEHICLE_ID") != 0).count() == 0

    # trip dim unique despite trips spanning both generations
    trips = spark.read.parquet(os.path.join(store, "trip"))
    assert trips.count() == trips.select("trip_id").distinct().count()
