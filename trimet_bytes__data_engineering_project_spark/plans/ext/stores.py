"""Catalog + maintenance-store serves under the oracle gate: schema
registry, compacted stores, streamed warehouse (x211-x217).

Split from ``plans/extensions.py`` at the round-14 close (r13 verdict
item 8) — code moved VERBATIM; the aggregator re-exports every name, so
``plans.extensions.<name>`` remains the stable public path."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F
from ..registry import query
from ..tables import load_table
from .scratch import _SCRATCH, _fp_cached, _tagged_dir
from .audits import _build_cms_oracle

# ---------------------------------------------------------------------------
# x211: the schema REGISTRY's serve path under the oracle gate (r12
# verdict item 3).  x210 gates read_with_schema (caller-supplied
# StructType); this query drives the full catalog loop — register v1,
# land gen 0, register v2 (added nullable column), land gen 1, serve via
# read_registered (the landing's OWN _schema/current pointer) — so the
# registry half of the evolution path gets a driver row, not just
# pytest coverage.  The two-generation store build is shared with x217
# (the pinned-historical-version serve, round 14).
# ---------------------------------------------------------------------------
def _ensure_registered_landing(spark: SparkSession, sf_dir: str) -> str:
    """Build-once the two-generation REGISTERED landing shared by x211
    (current-pointer serve) and x217 (pinned v1 serve): register v1
    (doc_id, n_chars), land generation 0 (even doc_ids), register v2
    adding a nullable ``tok_est`` (``floor(n_chars / 4)`` as double —
    integral-valued, so sums are order-independent-exact), land
    generation 1 (odd doc_ids) under it.  Returns the store path."""
    import shutil

    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    from ...operators.ann_index import corpus_fingerprint, ensure_index
    from ...sources.readers import register_landing_schema

    docs = load_table(spark, sf_dir, "documents")
    store = os.path.join(_tagged_dir(_SCRATCH, "registered_landing", sf_dir=sf_dir), "gen")

    v1 = StructType([StructField("doc_id", LongType()), StructField("n_chars", LongType())])
    v2 = StructType(list(v1.fields) + [StructField("tok_est", DoubleType())])

    def build() -> None:
        # a REBUILD must start from an empty registry: re-registering v1
        # over a surviving v2 pointer is a column drop, which the
        # add-only contract rejects loudly (by design)
        shutil.rmtree(store, ignore_errors=True)
        base = docs.select("doc_id", "n_chars")
        register_landing_schema(spark, store, v1)
        base.filter(F.col("doc_id") % 2 == 0).write.parquet(f"{store}/batch_id=0")
        register_landing_schema(spark, store, v2)
        base.filter(F.col("doc_id") % 2 == 1).withColumn(
            "tok_est", F.floor(F.col("n_chars") / 4).cast("double")
        ).write.parquet(f"{store}/batch_id=1")

    # batch_id=1 is written LAST, so its _SUCCESS is the whole-build marker
    ensure_index(
        build,
        f"{store}/batch_id=1",
        fingerprint=_fp_cached(
            spark, sf_dir, "docs",
            lambda: corpus_fingerprint(docs, id_col="doc_id"),
        ),
    )
    return store
@query(
    "x211_registered_landing_serve",
    oracle="""
    WITH landing AS (
        SELECT doc_id, n_chars,
               CASE WHEN doc_id % 2 = 1
                    THEN CAST(n_chars // 4 AS DOUBLE) END AS tok_est
        FROM documents
    )
    SELECT doc_id % 3 AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(tok_est) AS BIGINT) AS n_tok,
           CAST(SUM(tok_est) AS BIGINT) AS sum_tok,
           CAST(MAX(n_chars) AS BIGINT) AS max_chars
    FROM landing
    GROUP BY doc_id % 3
    ORDER BY bucket
    """,
)
def x211_registered_landing_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate over a two-generation landing served through its OWN
    registered schema (``sources.read_registered``): the build registers
    v1 (doc_id, n_chars), lands generation 0 (even doc_ids), registers
    v2 adding a nullable ``tok_est`` (a whitespace-free token estimate,
    ``floor(n_chars / 4)`` — integral-valued double, so sums are
    order-independent-exact), and lands generation 1 (odd doc_ids) under
    it.  The serve resolves ``_schema/current`` — one small text GET —
    and projects every generation onto v2 with ZERO footer sweep
    (job-count-pinned for this exact path in tests/test_sources.py);
    generation 0 null-fills ``tok_est``, visible as ``n_tok < n_docs``
    per bucket.  The oracle recomputes from the raw documents table, so
    the driver's value-hash verifies register → land → evolve → serve
    end-to-end.

    Scale shape: the catalog lives next to the data (the warehouse's
    one-object-PUT pointer idiom), readers thread no StructTypes, and
    the read plans straight to a multi-path scan — at a 100k-file
    landing this is the difference between one GET and an O(files)
    mergeSchema footer sweep.  The add-only registry contract
    (type/drop/non-nullable/tightening rejections) is pinned in
    tests/test_sources.py."""
    from ...sources.readers import read_registered

    store = _ensure_registered_landing(spark, sf_dir)
    landing = read_registered(spark, store)
    return (
        landing.groupBy((F.col("doc_id") % 3).alias("bucket"))
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.count("tok_est").cast("long").alias("n_tok"),
            F.sum("tok_est").cast("long").alias("sum_tok"),
            F.max("n_chars").cast("long").alias("max_chars"),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# x212: a COMPACTED maintenance store under the oracle gate (r12 verdict
# item 4).  compact_store's consolidated-∪-tail serve is pinned
# bit-equal in pytest; this query runs the full lifecycle — land, fold,
# land more, fresh-checkpoint REPLAY — and serves the result against an
# oracle that recomputes the sketch from raw events, so the replay-
# safety contract gets a rows+schema+value-hash driver row.
# ---------------------------------------------------------------------------
@query("x212_compacted_cms_serve", oracle=_build_cms_oracle())
def x212_compacted_cms_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x185's heavy-hitter probe served from a COMPACTED CMS store: the
    build lands per-batch counters for two thirds of the feed
    (event_id % 3 ∈ {0, 1}), folds them into one consolidated
    generation (``compact_store`` — hidden gen + atomic pointer,
    hwm = 1), lands the third slice as a live tail dir, then re-lands
    slice 0 at batch_id=0 — the fresh-checkpoint replay shape.  The
    serve (``cms_from_store``) reads consolidated ∪ dirs above the hwm:
    the replay is IGNORED (its content is already in the fold), so the
    estimates equal a single sketch over the whole feed — which is
    exactly what the oracle recomputes cell-by-cell from raw events
    with the portable md5-slice hash.  A double-counted replay or a
    dropped consolidated generation (the f47e29c hazard class) would
    inflate or deflate ``est`` and fail the value-hash.

    Scale shape: counters are ≤ depth·width rows per landing — the
    store compaction bounds METADATA (one landing per 15 min = ~35k
    dirs/year → O(1) consolidated + current tail), not data volume; the
    serve fold shuffles ≤ depth·width rows and the probe broadcasts the
    counters (x185's plan).  Replay safety is the part a naive
    file-merge gets wrong (streaming/compaction.py docstring)."""
    import shutil

    from ...operators.ann_index import corpus_fingerprint, ensure_index
    from ...operators.sketch import cms_counters, cms_estimate
    from ...streaming.compaction import compact_store
    from ...streaming.stats import cms_from_store

    events = load_table(spark, sf_dir, "events")
    store = _tagged_dir(_SCRATCH, "compacted_cms", sf_dir=sf_dir)

    def build() -> None:
        shutil.rmtree(store, ignore_errors=True)
        slices = [
            events.filter(F.col("event_id") % 3 == i).selectExpr("user_id AS _k")
            for i in range(3)
        ]
        for i in (0, 1):
            cms_counters(slices[i], "_k", 4, 1024).write.parquet(
                f"{store}/cms/batch_id={i}"
            )
        compact_store(spark, store, "cms")  # folds 0,1 -> gen 1, hwm 1
        cms_counters(slices[2], "_k", 4, 1024).write.parquet(f"{store}/cms/batch_id=2")
        # fresh-checkpoint replay: slice 0 re-lands at batch_id 0 <= hwm
        cms_counters(slices[0], "_k", 4, 1024).write.parquet(f"{store}/cms/batch_id=0")
        with open(os.path.join(store, "_STORE_DONE"), "w"):
            pass

    ensure_index(
        build,
        store,
        marker="_STORE_DONE",
        fingerprint=_fp_cached(
            spark, sf_dir, "events",
            lambda: corpus_fingerprint(events, id_col="event_id"),
        ),
    )
    counters = cms_from_store(spark, store)
    counts = events.groupBy("user_id").agg(F.count("*").cast("long").alias("c"))
    top = counts.orderBy(F.desc("c"), F.asc("user_id")).limit(20)
    return (
        cms_estimate(top, counters, "user_id", depth=4, width=1024)
        .select("user_id", "c", "est")
        .orderBy(F.desc("c"), F.asc("user_id"))
    )


# ---------------------------------------------------------------------------
# x213: the outage store's DAY-COMPACTION under the oracle gate (r12
# verdict item 7's implementation, driver-gated): land time-sliced
# batches, re-segment the closed days into one consolidated generation
# (compact_outage_day — the order-aware compactor compact_store refuses
# to be), land a later slice, replay a folded one, and serve the audit
# against x202's raw-event oracle.
# ---------------------------------------------------------------------------
@query(
    "x213_outage_day_compaction",
    oracle="""
    WITH s AS (SELECT CAST(ts AS DATE) AS day, epoch_us(ts) AS t,
                      lag(epoch_us(ts)) OVER (PARTITION BY CAST(ts AS DATE)
                                              ORDER BY epoch_us(ts), event_id) AS prev
               FROM events)
    SELECT day,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(MAX(t - prev) AS BIGINT) AS max_gap_us,
           MAX(t - prev) > 3600000000 AS outage
    FROM s WHERE prev IS NOT NULL
    GROUP BY day
    ORDER BY day
    """,
)
def x213_outage_day_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x202's per-day outage audit served from a DAY-COMPACTED id-exact
    segment store: the build lands the feed as three event-time slices
    (hours [0,8), [8,16), [16,24) — each batch's segments are range-
    disjoint within every day, the arrival-order contract of the
    store), day-compacts through the day BEFORE the feed's last (closed
    days collapse to one chained row each, the open day passes through
    verbatim), lands the evening slice as a live tail — its closed-day
    segments chain against the consolidated rows — and re-lands slice 0
    at batch_id 0, the fresh-checkpoint replay the hwm ignores.  The
    serve (``outage_from_store_with_ids``) must then equal x202
    recomputed from raw events: a compaction that mis-folded a cross-
    segment gap, double-served a replay, or lost the open day's rows
    fails the value-hash on max_gap_us / n_events.

    Scale shape: the store holds O(non-empty shards) rows per batch;
    day-compaction bounds its directory count at O(1) consolidated
    generation + one day's live dirs (vs ~35k dirs/year), preserving
    the serve algebra exactly (pinned in tests/test_sketch.py) because
    a closed day's chain folds losslessly into (min, max, Σcnt,
    max-gap) — the serve's own quantities."""
    import shutil

    from ...operators.ann_index import corpus_fingerprint, ensure_index
    from ...streaming.compaction import compact_outage_day
    from ...streaming.stats import outage_from_store_with_ids, outage_segments_with_ids

    events = load_table(spark, sf_dir, "events")
    store = _tagged_dir(_SCRATCH, "outage_day_store", sf_dir=sf_dir)

    def build() -> None:
        shutil.rmtree(store, ignore_errors=True)
        slices = [
            events.filter((F.hour("ts") >= lo) & (F.hour("ts") < hi))
            for lo, hi in ((0, 8), (8, 16), (16, 24))
        ]
        for i in (0, 1):
            outage_segments_with_ids(slices[i], 900_000_000).write.parquet(
                f"{store}/outage/batch_id={i}"
            )
        # closed days = everything before the feed's last day (one
        # scalar read — a maintenance job computing its own cutoff)
        through = events.select(
            F.date_sub(F.max(F.to_date("ts")), 1).alias("d")
        ).first()["d"]
        compact_outage_day(spark, store, str(through), with_ids=True)
        outage_segments_with_ids(slices[2], 900_000_000).write.parquet(
            f"{store}/outage/batch_id=2"
        )
        # fresh-checkpoint replay: slice 0 re-lands at batch_id 0 <= hwm
        outage_segments_with_ids(slices[0], 900_000_000).write.parquet(
            f"{store}/outage/batch_id=0"
        )
        with open(os.path.join(store, "_STORE_DONE"), "w"):
            pass

    ensure_index(
        build,
        store,
        marker="_STORE_DONE",
        fingerprint=_fp_cached(
            spark, sf_dir, "events",
            lambda: corpus_fingerprint(events, id_col="event_id"),
        ),
    )
    return outage_from_store_with_ids(spark, store)


# ---------------------------------------------------------------------------
# x214: the STREAMING INGEST pipeline under the oracle gate (r13 verdict
# item 3 — the whole T1-T5 tier was pytest-only by construction).  The
# build derives a breadcrumb-shaped JSON feed from the events corpus,
# runs the checkpointed availableNow ingest (run_ingest_pipeline:
# readStream → enrich → validate/quarantine → foreachBatch dedup-upsert)
# over it in two landings plus a no-new-files restart, and serves the
# STREAMED warehouse against an oracle that recomputes the same
# aggregate from raw events — putting foreachBatch/checkpoint semantics
# under rows+schema+value-hash for the first time.
# ---------------------------------------------------------------------------
@query(
    "x214_streamed_ingest_serve",
    oracle="""
    WITH b AS (
        SELECT CAST(user_id % 97 + 1 AS BIGINT) AS vehicle_id,
               user_id * 1000000
                 + date_diff('day', DATE '2020-01-01', CAST(ts AS DATE)) AS trip_id,
               ((event_id % 180) - 90) + 0.25 AS lat,
               CASE WHEN event_id % 11 = 0 THEN 0.0
                    ELSE ((event_id % 360) - 180) + 0.25 END AS lon
        FROM events
        WHERE event_id % 37 <> 0
    )
    SELECT vehicle_id,
           CAST(COUNT(DISTINCT trip_id) AS BIGINT) AS n_trips,
           CAST(COUNT(*) AS BIGINT) AS n_crumbs,
           SUM(lat) AS sum_lat,
           SUM(lon) AS sum_lon
    FROM b GROUP BY vehicle_id ORDER BY vehicle_id
    """,
)
def x214_streamed_ingest_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vehicle warehouse audit served from a STREAM-BUILT warehouse:
    the build maps events onto the breadcrumb wire shape
    deterministically — trip = (user, day) as ``user_id·10^6 + days
    since 2020-01-01``, vehicle = ``user_id % 97 + 1``, OPD_DATE/
    ACT_TIME from ts, METERS = seconds-of-day (so per-trip Δmeters/Δt
    speeds are non-negative by construction), quarter-integral GPS
    (order-independent-exact SUMs), every 37th event poisoned with
    VEHICLE_ID=0 (fails P16's vehicle_id_positive → quarantined), every
    11th with NULL longitude (P5 null-fill → 0.0) — writes it as a JSON
    landing in two generations, and runs ``run_ingest_pipeline`` after
    each plus once more with no new files: T1 (availableNow trigger),
    T2 (validator quarantine), T3 (foreachBatch trip dedup-upsert +
    breadcrumb append), T5 (checkpointed restart lands each file
    exactly once — the second run processes only generation B, the
    third nothing).  The serve joins the streamed breadcrumb fact to
    the trip dim (J3's shape, dim broadcast) and aggregates per
    vehicle; the oracle recomputes from raw events with the same
    mapping minus the quarantined rows, so a double-landed file, a
    replayed batch, a dropped generation, an un-filled GPS null, or a
    quarantine leak all fail the value-hash on n_crumbs / n_trips /
    sum_lon.  The build raises unless the checkpoint's offsets log
    exists — the lifecycle demonstrably went through writeStream.

    Scale shape: the ingest is one file-source stream — per batch one
    window shuffle on trip for the enrich chain (W1/W2), one map-side
    validator pass, and a broadcast-able anti-join against landed trip
    ids; state is the checkpoint's file log, not data.  Reference:
    Part1/subscriber_project.py:17-100 (the daily Pub/Sub pull this
    re-architects as a checkpointed stream)."""
    import shutil

    from ...operators.ann_index import corpus_fingerprint, ensure_index
    from ...streaming.pipeline import run_ingest_pipeline

    events = load_table(spark, sf_dir, "events")
    store = _tagged_dir(_SCRATCH, "streamed_warehouse", sf_dir=sf_dir)
    trip_path = os.path.join(store, "trip")
    crumb_path = os.path.join(store, "breadcrumb")

    def build() -> None:
        shutil.rmtree(store, ignore_errors=True)
        landing = os.path.join(store, "landing")
        ck = os.path.join(store, "checkpoint")
        secs = (F.hour("ts") * 3600 + F.minute("ts") * 60 + F.second("ts")).cast("int")
        trip = (
            F.col("user_id") * F.lit(1000000)
            + F.datediff(F.to_date("ts"), F.lit("2020-01-01").cast("date"))
        ).cast("long")
        feed = events.select(
            trip.alias("EVENT_NO_TRIP"),
            trip.alias("EVENT_NO_STOP"),
            F.concat(F.date_format("ts", "ddMMMyyyy"), F.lit(":00:00:00")).alias(
                "OPD_DATE"
            ),
            F.when(F.col("event_id") % 37 == 0, F.lit(0))
            .otherwise((F.col("user_id") % 97 + 1).cast("int"))
            .cast("int")
            .alias("VEHICLE_ID"),
            secs.cast("long").alias("METERS"),
            secs.alias("ACT_TIME"),
            F.when(F.col("event_id") % 11 == 0, F.lit(None).cast("double"))
            .otherwise(((F.col("event_id") % 360) - 180).cast("double") + F.lit(0.25))
            .alias("GPS_LONGITUDE"),
            (((F.col("event_id") % 180) - 90).cast("double") + F.lit(0.25)).alias(
                "GPS_LATITUDE"
            ),
            F.lit(7).alias("GPS_SATELLITES"),
            F.lit(1.0).alias("GPS_HDOP"),
            (F.col("event_id") % 2).alias("_gen"),
        )
        for g in (0, 1):
            feed.filter(F.col("_gen") == g).drop("_gen").coalesce(4).write.mode(
                "append"
            ).json(landing)
            run_ingest_pipeline(
                spark, landing, trip_path, crumb_path, ck,
                quarantine_path=os.path.join(store, "quarantine"),
            )
        # T5: a restart with nothing new must land nothing (the serve's
        # exact counts are the witness)
        run_ingest_pipeline(
            spark, landing, trip_path, crumb_path, ck,
            quarantine_path=os.path.join(store, "quarantine"),
        )
        if not os.path.isdir(os.path.join(ck, "offsets")):
            raise IOError(
                f"{ck}/offsets missing after the ingest runs — the build "
                "did not go through a checkpointed writeStream; refusing "
                "to mark the store done"
            )
        with open(os.path.join(store, "_STORE_DONE"), "w"):
            pass

    ensure_index(
        build,
        store,
        marker="_STORE_DONE",
        fingerprint=_fp_cached(
            spark, sf_dir, "events",
            lambda: corpus_fingerprint(events, id_col="event_id"),
        ),
    )
    trips = spark.read.parquet(trip_path).select(
        "trip_id", F.col("vehicle_id").cast("long").alias("vehicle_id")
    )
    crumbs = spark.read.parquet(crumb_path)
    return (
        crumbs.join(F.broadcast(trips), "trip_id")
        .groupBy("vehicle_id")
        .agg(
            F.count_distinct("trip_id").cast("long").alias("n_trips"),
            F.count("*").cast("long").alias("n_crumbs"),
            F.sum("latitude").alias("sum_lat"),
            F.sum("longitude").alias("sum_lon"),
        )
        .orderBy("vehicle_id")
    )


# ---------------------------------------------------------------------------
# x215: a SECOND compact_store kind under the oracle gate (r13 verdict
# item 4): the FUNNEL store exercises the explicit group_cols/folds
# argument path (its columns are parameterized by the stage tuple, so
# it has no STORE_SPECS entry) and a different fold (min vs x212's
# sum) — same land → fold → land → replay lifecycle, served against
# x192's raw-event funnel oracle.
# ---------------------------------------------------------------------------
@query(
    "x215_compacted_funnel_serve",
    oracle="""
    WITH f AS (SELECT user_id,
                      min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS t_view,
                      min(CASE WHEN event_type = 'click' THEN epoch_us(ts) END) AS t_click,
                      min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS t_buy
               FROM events GROUP BY user_id),
    s AS (SELECT user_id,
                 CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END
               + CASE WHEN t_view IS NOT NULL AND t_click > t_view THEN 1 ELSE 0 END
               + CASE WHEN t_view IS NOT NULL AND t_click > t_view AND t_buy > t_click
                      THEN 1 ELSE 0 END AS stages
          FROM f)
    SELECT stages, CAST(COUNT(*) AS BIGINT) AS n_users
    FROM s GROUP BY stages ORDER BY stages
    """,
)
def x215_compacted_funnel_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x192's first-touch funnel served from a COMPACTED funnel store:
    the build lands per-batch (user, first-touch-µs) min tables for two
    thirds of the feed (event_id % 3 ∈ {0, 1}), folds them through
    ``compact_store``'s EXPLICIT-arguments path — group ``user_id``,
    fold ``min`` per stage column, the kind with no built-in spec —
    lands the third slice as a live tail, and re-lands slice 0 at
    batch_id=0 (the fresh-checkpoint replay the hwm ignores).  The
    serve (``funnel_from_store``) min-folds consolidated ∪ tail per
    user and only THEN applies the strict-order stage test — which is
    why the fold is exact: a user's first view may land in a different
    slice than their first click, and the folded mins still order
    correctly.  The oracle recomputes the stage histogram from raw
    events (x192's SQL verbatim): a double-counted replay cannot move a
    MIN, so the discriminating failures here are a LOST fold input
    (stage times regress to a later slice's min — users shift between
    histogram buckets) and a mis-grouped explicit fold.

    Scale shape: the store holds O(users) rows per landing; compaction
    bounds the metadata tier (one landing per 15 min = ~35k dirs/year →
    O(1) consolidated + live tail) while the serve fold shuffles only
    (user, 3×µs) rows — the corpus is scanned once per landing, never
    at serve time."""
    import shutil

    from ...operators.ann_index import corpus_fingerprint, ensure_index
    from ...streaming.compaction import compact_store
    from ...streaming.stats import funnel_from_store, funnel_min_table

    events = load_table(spark, sf_dir, "events")
    store = _tagged_dir(_SCRATCH, "compacted_funnel", sf_dir=sf_dir)

    def build() -> None:
        shutil.rmtree(store, ignore_errors=True)
        slices = [events.filter(F.col("event_id") % 3 == i) for i in range(3)]
        for i in (0, 1):
            funnel_min_table(slices[i]).write.parquet(f"{store}/funnel/batch_id={i}")
        compact_store(
            spark, store, "funnel",
            group_cols=["user_id"],
            folds={"t_view": "min", "t_click": "min", "t_purchase": "min"},
        )  # folds 0,1 -> gen 1, hwm 1
        funnel_min_table(slices[2]).write.parquet(f"{store}/funnel/batch_id=2")
        # fresh-checkpoint replay: slice 0 re-lands at batch_id 0 <= hwm
        funnel_min_table(slices[0]).write.parquet(f"{store}/funnel/batch_id=0")
        with open(os.path.join(store, "_STORE_DONE"), "w"):
            pass

    ensure_index(
        build,
        store,
        marker="_STORE_DONE",
        fingerprint=_fp_cached(
            spark, sf_dir, "events",
            lambda: corpus_fingerprint(events, id_col="event_id"),
        ),
    )
    return funnel_from_store(spark, store)


# ---------------------------------------------------------------------------
# x216: a MULTI-GENERATION compaction chain under the oracle gate (r13
# verdict item 5): x212/x213 commit generation 1; this lifecycle
# compacts TWICE with landings between — the gen-n pointer arithmetic
# (consolidated gen-1 ∪ new tail → gen-2, hwm re-derived) was
# hypothesis-pinned but had no driver row.
# ---------------------------------------------------------------------------
@query("x216_recompacted_cms_serve", oracle=_build_cms_oracle())
def x216_recompacted_cms_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x185's heavy-hitter probe served through a TWICE-compacted CMS
    store: land slices 0,1 (event_id % 5) → compact (gen-1, hwm 1) →
    land slices 2,3 → compact AGAIN — the re-compaction folds the
    PRIOR CONSOLIDATED GENERATION together with the new dirs into
    gen-2 (hwm 3) and retires gen-1 — → land slice 4 as the live tail
    → re-land slice 1 at batch_id=1 (≤ hwm: the fresh-checkpoint
    replay the serve ignores).  The build refuses to mark itself done
    unless the pointer reads exactly ``.consolidated-gen-2:3`` — the
    lifecycle demonstrably chained generations.  The serve
    (``cms_from_store``) then equals one sketch over the whole feed,
    which the oracle recomputes cell-by-cell from raw events with the
    portable md5-slice hash: losing the gen-1 rows in the re-fold,
    double-folding them, or serving the replay all move ``est``.

    Scale shape: re-compaction is the STEADY-STATE maintenance shape —
    a store compacted nightly folds gen-(n−1) ∪ ~96 tail dirs into
    gen-n, keeping the directory count O(1) forever, and each fold
    shuffles ≤ depth·width counter rows regardless of generation
    count (the x212 broadcast-probe plan pin applies unchanged)."""
    import shutil

    from ...operators.ann_index import corpus_fingerprint, ensure_index
    from ...operators.sketch import cms_counters, cms_estimate
    from ...streaming.compaction import _read_pointer, compact_store
    from ...streaming.stats import cms_from_store

    events = load_table(spark, sf_dir, "events")
    store = _tagged_dir(_SCRATCH, "recompacted_cms", sf_dir=sf_dir)

    def build() -> None:
        shutil.rmtree(store, ignore_errors=True)
        slices = [
            events.filter(F.col("event_id") % 5 == i).selectExpr("user_id AS _k")
            for i in range(5)
        ]

        def land(i: int) -> None:
            cms_counters(slices[i], "_k", 4, 1024).write.mode("overwrite").parquet(
                f"{store}/cms/batch_id={i}"
            )

        land(0), land(1)
        compact_store(spark, store, "cms")  # gen-1, hwm 1
        land(2), land(3)
        compact_store(spark, store, "cms")  # gen-1 ∪ {2,3} -> gen-2, hwm 3
        land(4)  # live tail above the hwm
        land(1)  # fresh-checkpoint replay at batch_id 1 <= hwm
        ptr = _read_pointer(f"{store}/cms")
        if ptr != (".consolidated-gen-2", 3):
            raise IOError(
                f"{store}/cms pointer reads {ptr!r}, expected "
                "('.consolidated-gen-2', 3) — the build did not chain two "
                "compaction generations; refusing to mark the store done"
            )
        with open(os.path.join(store, "_STORE_DONE"), "w"):
            pass

    ensure_index(
        build,
        store,
        marker="_STORE_DONE",
        fingerprint=_fp_cached(
            spark, sf_dir, "events",
            lambda: corpus_fingerprint(events, id_col="event_id"),
        ),
    )
    counters = cms_from_store(spark, store)
    counts = events.groupBy("user_id").agg(F.count("*").cast("long").alias("c"))
    top = counts.orderBy(F.desc("c"), F.asc("user_id")).limit(20)
    return (
        cms_estimate(top, counters, "user_id", depth=4, width=1024)
        .select("user_id", "c", "est")
        .orderBy(F.desc("c"), F.asc("user_id"))
    )


# ---------------------------------------------------------------------------
# x217: the registry's PINNED HISTORICAL VERSION serve under the oracle
# gate (r13 verdict item 7): x211 serves _schema/current; this serves
# version 1 explicitly over the SAME two-generation store — time-travel
# for a downstream job that validated against v1 and must keep its
# exact column view while the landing evolves.  The result is shaped so
# a broken pin is VISIBLE: one output row per column of the served
# view, so silently serving v2 emits a third (tok_est) row and fails
# rows_match, not just values.
# ---------------------------------------------------------------------------
@query(
    "x217_registered_version_pinned_serve",
    oracle="""
    WITH a AS (SELECT CAST(COUNT(doc_id) AS BIGINT) AS n1,
                      CAST(SUM(doc_id) AS BIGINT) AS s1,
                      CAST(COUNT(n_chars) AS BIGINT) AS n2,
                      CAST(SUM(n_chars) AS BIGINT) AS s2
               FROM documents)
    SELECT 'doc_id' AS col_name, n1 AS n_nonnull, s1 AS col_sum FROM a
    UNION ALL
    SELECT 'n_chars' AS col_name, n2 AS n_nonnull, s2 AS col_sum FROM a
    ORDER BY col_name
    """,
)
def x217_registered_version_pinned_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column (count, sum) profile of the landing served at PINNED
    schema version 1 (``read_registered(..., version=1)``) — the
    columns come from the served view itself, not a hand-written list,
    so the query's row set IS the version pin: v1 yields exactly the
    (doc_id, n_chars) rows the oracle recomputes from raw documents,
    while a pin that silently resolved the current pointer would emit a
    third ``tok_est`` row and fail rows_match.  Generation 1's files
    carry the v2 column on disk; parquet's per-file projection drops it
    under the pinned schema (the add-only registration contract
    guarantees every v1 column still exists, exactly typed, in every
    later generation — so a pinned read is total, never a cast).

    Scale shape: one small text GET for the version file, one
    column-pruned multi-path scan, one single-row aggregate unpivoted
    driver-side-free via ``stack`` — no footer sweep, no per-version
    data copies (time travel is a PROJECTION, not a snapshot)."""
    from ...sources.readers import read_registered

    store = _ensure_registered_landing(spark, sf_dir)
    landing = read_registered(spark, store, version=1)
    cols = landing.columns
    agg = landing.agg(
        *[F.count(c).cast("long").alias(f"n_{c}") for c in cols],
        *[F.sum(c).cast("long").alias(f"s_{c}") for c in cols],
    )
    stack = ", ".join(f"'{c}', n_{c}, s_{c}" for c in cols)
    return agg.select(
        F.expr(
            f"stack({len(cols)}, {stack}) AS (col_name, n_nonnull, col_sum)"
        )
    ).orderBy("col_name")
