"""Count-min sketch (operators/sketch.py) — the mergeable heavy-key
monitor behind x185 and streaming/stats.py:run_streaming_cms."""

import glob
import os
import shutil

from pyspark.sql import functions as F

from trimet_bytes__data_engineering_project_spark.operators.sketch import (
    cms_counters,
    cms_estimate,
    cms_from_counts,
)
from trimet_bytes__data_engineering_project_spark.plans.tables import load_table


def test_cms_overestimates_every_key_and_conserves_mass(spark):
    """The two CMS invariants, pinned for EVERY key (not just the
    top-20 the registered query shows): est >= exact (collisions only
    add — min over rows cannot undercount), and each hash row's cells
    sum to the total row count (mass conservation — every occurrence
    lands in exactly one cell per row)."""
    events = load_table(spark, "/root/testdata/sf0.001", "events")
    n_total = events.count()
    counts = events.groupBy("user_id").agg(F.count("*").cast("long").alias("c"))

    counters = cms_from_counts(counts, "user_id", "c", depth=4, width=4)
    per_row = {
        r.row: r.s
        for r in counters.groupBy("row").agg(F.sum("cell").alias("s")).collect()
    }
    assert per_row == {i: n_total for i in range(4)}

    est = cms_estimate(counts, counters, "user_id", depth=4, width=4)
    bad = est.filter(F.col("est") < F.col("c")).count()
    assert bad == 0
    # width 4 << |keys| = 15 forces a collision in EVERY row: the
    # sketch must overestimate somewhere or the invariant is vacuous
    assert est.filter(F.col("est") > F.col("c")).count() > 0


def test_cms_counters_match_from_counts(spark):
    """cms_counters(raw rows) is the same table as cms_from_counts over
    the exact count table — the raw form is a convenience wrapper, not
    a second code path."""
    events = load_table(spark, "/root/testdata/sf0.001", "events").limit(500)
    counts = events.groupBy("user_id").agg(F.count("*").cast("long").alias("c"))
    a = sorted(map(tuple, cms_counters(events, "user_id", 4, 64).collect()))
    b = sorted(map(tuple, cms_from_counts(counts, "user_id", "c", 4, 64).collect()))
    assert a == b and len(a) > 0


def test_streaming_cms_equals_batch_and_replays(spark, tmp_path):
    """Two streamed landings produce a cms store whose fold
    (cms_from_store) is BIT-EQUAL to cms_counters over the union of
    the landed rows — counter additivity — and replaying the stream is
    a no-op (per-batch_id overwrite)."""
    from trimet_bytes__data_engineering_project_spark.streaming.stats import (
        cms_from_store,
        run_streaming_cms,
    )

    events = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "event_id", "user_id"
    )
    gen_a = events.filter("event_id % 2 = 0")
    gen_b = events.filter("event_id % 2 = 1")

    landing = str(tmp_path / "landing")
    os.makedirs(landing)

    def land_file(df, name):
        t = str(tmp_path / f"w_{name}")
        df.coalesce(1).write.parquet(t)
        shutil.move(glob.glob(f"{t}/part-*.parquet")[0], f"{landing}/{name}.parquet")

    store, ck = str(tmp_path / "store"), str(tmp_path / "ck")
    land_file(gen_a, "a")
    run_streaming_cms(spark, landing, store, ck, "user_id", depth=4, width=64)
    land_file(gen_b, "b")
    run_streaming_cms(spark, landing, store, ck, "user_id", depth=4, width=64)

    got = sorted(map(tuple, cms_from_store(spark, store).collect()))
    want = sorted(
        map(
            tuple,
            cms_counters(
                gen_a.unionByName(gen_b).selectExpr("user_id AS _k"),
                "_k", 4, 64,
            ).collect(),
        )
    )
    assert got == want and len(got) > 0

    run_streaming_cms(spark, landing, store, ck, "user_id", depth=4, width=64)
    assert sorted(map(tuple, cms_from_store(spark, store).collect())) == got


def test_hll_registers_merge_and_estimate_accuracy(spark):
    """HLL register properties: (a) MAX-merge exactness — registers
    over any split max-fold to the union's registers bit-for-bit;
    (b) duplicate keys change nothing (no distinct shuffle needed);
    (c) the estimate lands within 10% at a planted 10_000-key
    cardinality (p=8 → theoretical rsd ~6.5%; the fixed md5 hash makes
    this a DETERMINISTIC 8.1% — pinned inside 1.5σ, not a flaky
    statistical bound) and exact-regime-correct at small n (linear
    counting)."""
    from trimet_bytes__data_engineering_project_spark.operators.sketch import (
        hll_estimate,
        hll_registers,
    )

    keys = spark.range(10_000).withColumnRenamed("id", "k")
    full = sorted(map(tuple, hll_registers(keys, "k").collect()))

    # (a) split / max-merge
    a = {r.reg: r.rho_max for r in hll_registers(keys.filter("k % 3 = 0"), "k").collect()}
    b = {r.reg: r.rho_max for r in hll_registers(keys.filter("k % 3 <> 0"), "k").collect()}
    merged = sorted((j, max(a.get(j, 0), b.get(j, 0))) for j in set(a) | set(b))
    assert merged == full

    # (b) duplicates are invisible
    dup = sorted(map(tuple, hll_registers(keys.union(keys).union(keys), "k").collect()))
    assert dup == full

    # (c) accuracy
    est = hll_estimate(full)
    assert abs(est - 10_000) <= 0.10 * 10_000
    small = hll_registers(spark.range(30).withColumnRenamed("id", "k"), "k").collect()
    est_small = hll_estimate([(r.reg, r.rho_max) for r in small])
    assert abs(est_small - 30) <= 3


def test_streaming_hll_equals_batch_and_replays(spark, tmp_path):
    """Streamed register landings max-fold (hll_from_store) to exactly
    the batch registers over the union; replay is a no-op (max is
    idempotent — at-least-once is already exact)."""
    from trimet_bytes__data_engineering_project_spark.operators.sketch import (
        hll_registers,
    )
    from trimet_bytes__data_engineering_project_spark.streaming.stats import (
        hll_from_store,
        run_streaming_hll,
    )

    events = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "event_id", "user_id"
    )
    gen_a = events.filter("event_id % 2 = 0")
    gen_b = events.filter("event_id % 2 = 1")

    landing = str(tmp_path / "landing")
    os.makedirs(landing)

    def land_file(df, name):
        t = str(tmp_path / f"w_{name}")
        df.coalesce(1).write.parquet(t)
        shutil.move(glob.glob(f"{t}/part-*.parquet")[0], f"{landing}/{name}.parquet")

    store, ck = str(tmp_path / "store"), str(tmp_path / "ck")
    land_file(gen_a, "a")
    run_streaming_hll(spark, landing, store, ck, "user_id")
    land_file(gen_b, "b")
    run_streaming_hll(spark, landing, store, ck, "user_id")

    got = sorted(map(tuple, hll_from_store(spark, store).collect()))
    want = sorted(
        map(
            tuple,
            hll_registers(
                gen_a.unionByName(gen_b).selectExpr("user_id AS _k"), "_k"
            ).collect(),
        )
    )
    assert got == want and len(got) > 0

    run_streaming_hll(spark, landing, store, ck, "user_id")
    assert sorted(map(tuple, hll_from_store(spark, store).collect())) == got


def test_cms_store_sliding_window_readoff(spark, tmp_path):
    """The windowed fold (min_batch_id) over the CMS store is
    bit-equal to a batch sketch over exactly the window's rows — the
    sliding-window heavy-hitter monitor falls out of the same store
    with a batch_id filter, no extra state."""
    from trimet_bytes__data_engineering_project_spark.streaming.stats import (
        cms_from_store,
        run_streaming_cms,
    )

    events = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "event_id", "user_id"
    )
    gens = [events.filter(f"event_id % 3 = {g}") for g in range(3)]

    landing = str(tmp_path / "landing")
    os.makedirs(landing)

    def land_file(df, name):
        t = str(tmp_path / f"w_{name}")
        df.coalesce(1).write.parquet(t)
        shutil.move(glob.glob(f"{t}/part-*.parquet")[0], f"{landing}/{name}.parquet")

    store, ck = str(tmp_path / "store"), str(tmp_path / "ck")
    for i, g in enumerate(gens):
        land_file(g, f"g{i}")
        run_streaming_cms(spark, landing, store, ck, "user_id", depth=4, width=64)

    got = sorted(
        map(tuple, cms_from_store(spark, store, min_batch_id=1).collect())
    )
    want = sorted(
        map(
            tuple,
            cms_counters(
                gens[1].unionByName(gens[2]).selectExpr("user_id AS _k"),
                "_k", 4, 64,
            ).collect(),
        )
    )
    assert got == want and len(got) > 0


def test_bloom_words_match_driver_bitmap_and_or_merge(spark, tmp_path):
    """The distributed (word_idx, word) Bloom equals the driver-built
    bitmap bit-for-bit; generations OR-fold to the union's bitmap
    (streaming landing pinned, replay a no-op); and probing through the
    reconstructed literal keeps bloom_decontaminate ≡ the streamed
    store's blocklist."""
    from trimet_bytes__data_engineering_project_spark.operators.dedup import (
        bloom_bitmap,
        bloom_words,
        to_bitmap_literal,
    )
    from trimet_bytes__data_engineering_project_spark.streaming.stats import (
        bloom_from_store,
        run_streaming_bloom,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(80)
    want = bloom_bitmap(docs, m_bits=1 << 12)
    got = to_bitmap_literal(bloom_words(docs, m_bits=1 << 12), m_bits=1 << 12)
    assert got == want and any(got)

    landing = str(tmp_path / "landing")
    os.makedirs(landing)

    def land_file(df, name):
        t = str(tmp_path / f"w_{name}")
        df.coalesce(1).write.parquet(t)
        shutil.move(glob.glob(f"{t}/part-*.parquet")[0], f"{landing}/{name}.parquet")

    store, ck = str(tmp_path / "store"), str(tmp_path / "ck")
    land_file(docs.filter("doc_id % 2 = 0"), "a")
    run_streaming_bloom(spark, landing, store, ck, m_bits=1 << 12)
    land_file(docs.filter("doc_id % 2 = 1"), "b")
    run_streaming_bloom(spark, landing, store, ck, m_bits=1 << 12)

    folded = to_bitmap_literal(bloom_from_store(spark, store), m_bits=1 << 12)
    assert folded == want

    run_streaming_bloom(spark, landing, store, ck, m_bits=1 << 12)  # replay
    assert to_bitmap_literal(bloom_from_store(spark, store), m_bits=1 << 12) == want


def test_streaming_funnel_equals_batch_x192(spark, tmp_path):
    """Streamed funnel store (min-merge per user, stage test after the
    fold) is bit-equal to the batch x192 histogram over the union —
    including the cross-batch case where a user's first view lands in
    a LATER batch than their first click; replay is a no-op."""
    from trimet_bytes__data_engineering_project_spark.plans.registry import QUERIES
    from trimet_bytes__data_engineering_project_spark.streaming.stats import (
        funnel_from_store,
        run_streaming_funnel,
    )

    events = load_table(spark, "/root/testdata/sf0.001", "events")
    # split by event TYPE so stage-times for one user span batches —
    # the ordering-across-batches case a per-batch stage fold would get
    # wrong (clicks+purchases land before any views)
    gen_a = events.filter("event_type <> 'view'")
    gen_b = events.filter("event_type = 'view'")

    landing = str(tmp_path / "landing")
    os.makedirs(landing)

    def land_file(df, name):
        t = str(tmp_path / f"w_{name}")
        df.coalesce(1).write.parquet(t)
        shutil.move(glob.glob(f"{t}/part-*.parquet")[0], f"{landing}/{name}.parquet")

    store, ck = str(tmp_path / "store"), str(tmp_path / "ck")
    land_file(gen_a, "a")
    run_streaming_funnel(spark, landing, store, ck)
    land_file(gen_b, "b")
    run_streaming_funnel(spark, landing, store, ck)

    got = sorted(map(tuple, funnel_from_store(spark, store).collect()))
    want = sorted(
        map(
            tuple,
            QUERIES["x192_event_funnel"](spark, "/root/testdata/sf0.001").collect(),
        )
    )
    assert got == want and len(got) > 0

    run_streaming_funnel(spark, landing, store, ck)  # replay
    assert sorted(map(tuple, funnel_from_store(spark, store).collect())) == got


def test_streaming_outage_equals_batch_x202(spark, tmp_path):
    """Streamed outage store (per-batch range-disjoint segment
    summaries, chained per day at serve) is bit-equal to the batch
    x202 over the union — with a batch boundary that SPLITS a shard
    mid-range (the cross-batch same-shard gap a per-batch-only fold
    would miss); replay under the same checkpoint is a no-op; and an
    out-of-order (interleaved) landing raises loudly instead of
    serving a silently-low max."""
    import pytest

    from trimet_bytes__data_engineering_project_spark.plans.registry import QUERIES
    from trimet_bytes__data_engineering_project_spark.streaming.stats import (
        outage_from_store,
        run_streaming_outage,
    )

    events = load_table(spark, "/root/testdata/sf0.001", "events")
    # three TIME-RANGED landings (the feed contract), cut at arbitrary
    # percentiles so batch boundaries fall mid-shard
    p33, p66 = events.selectExpr(
        "percentile(unix_micros(cast(ts as timestamp)), 0.33) p33",
        "percentile(unix_micros(cast(ts as timestamp)), 0.66) p66",
    ).first()
    eus = "unix_micros(cast(ts as timestamp))"
    gens = [
        events.filter(f"{eus} < {int(p33)}"),
        events.filter(f"{eus} >= {int(p33)} AND {eus} < {int(p66)}"),
        events.filter(f"{eus} >= {int(p66)}"),
    ]

    landing = str(tmp_path / "landing")
    os.makedirs(landing)

    def land_file(df, name):
        t = str(tmp_path / f"w_{name}")
        df.coalesce(1).write.parquet(t)
        shutil.move(glob.glob(f"{t}/part-*.parquet")[0], f"{landing}/{name}.parquet")

    store, ck = str(tmp_path / "store"), str(tmp_path / "ck")
    for i, g in enumerate(gens):
        land_file(g, f"g{i}")
        run_streaming_outage(spark, landing, store, ck)

    got = [tuple(r) for r in outage_from_store(spark, store).collect()]
    want = [
        tuple(r)
        for r in QUERIES["x202_feed_outage_audit"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    ]
    assert got == want and len(got) > 0

    run_streaming_outage(spark, landing, store, ck)  # replay: no-op
    assert [tuple(r) for r in outage_from_store(spark, store).collect()] == got

    # interleaved landings (odd ids then even ids — ranges overlap)
    # must raise, not serve a wrong answer
    store2, ck2 = str(tmp_path / "store2"), str(tmp_path / "ck2")
    landing2 = str(tmp_path / "landing2")
    os.makedirs(landing2)

    def land_file2(df, name):
        t = str(tmp_path / f"w2_{name}")
        df.coalesce(1).write.parquet(t)
        shutil.move(glob.glob(f"{t}/part-*.parquet")[0], f"{landing2}/{name}.parquet")

    land_file2(events.filter("event_id % 2 = 1"), "odd")
    run_streaming_outage(spark, landing2, store2, ck2)
    land_file2(events.filter("event_id % 2 = 0"), "even")
    run_streaming_outage(spark, landing2, store2, ck2)
    with pytest.raises(ValueError, match="overlapping segments"):
        outage_from_store(spark, store2).collect()


def test_outage_store_with_ids_closes_zero_span_duplicate_bound(spark, tmp_path):
    """Round-11 verdict item 5: the range-only outage store documents
    one undetectable slip — a ZERO-SPAN segment (all events at one
    timestamp) re-landed under a NEW batch_id inflates n_events (never
    the gap or flag).  The id-bearing-feed form closes it: landing
    n_ids + an order-independent id fingerprint per segment lets the
    serve fold collapse the replayed segment (same id multiset) while
    KEEPING legitimate equal-timestamp arrivals (distinct ids).  Pinned
    in-memory on the segment algebra, then end-to-end through the
    with_ids=True stream."""
    from trimet_bytes__data_engineering_project_spark.streaming.stats import (
        outage_from_segments,
        outage_from_segments_with_ids,
        outage_from_store_with_ids,
        outage_segments_with_ids,
        run_streaming_outage,
    )

    def to_df(rows):
        return spark.createDataFrame(
            [(t, i) for t, i in rows], "ts string, event_id long"
        ).select(F.col("ts").cast("timestamp").alias("ts"), "event_id")

    d = "2024-01-01 "
    spread = [(d + "00:00:00", 10), (d + "00:10:00", 11),
              (d + "00:20:00", 12), (d + "07:00:00", 13)]
    cluster = [(d + "08:00:00", 1), (d + "08:00:00", 2), (d + "08:00:00", 3)]
    legit_same_ts = [(d + "08:00:00", 4), (d + "08:00:00", 5)]

    seg = lambda rows: outage_segments_with_ids(to_df(rows), 900_000_000)  # noqa: E731
    base = seg(spread).unionByName(seg(cluster))

    want = [tuple(r) for r in outage_from_segments_with_ids(base).collect()]
    assert len(want) == 1
    day, n_events, max_gap_us, outage = want[0]
    assert (n_events, max_gap_us, outage) == (6, 24_000_000_000, True)

    # duplicate zero-span landing under a new batch_id: with-ids serve is
    # UNCHANGED (the closed bound) ...
    dup = base.unionByName(seg(cluster))
    assert [tuple(r) for r in outage_from_segments_with_ids(dup).collect()] == want
    # ... where the range-only fold inflates n_events by the replayed cnt
    # (and, as documented, never the gap or the flag)
    plain = [tuple(r) for r in outage_from_segments(dup).collect()]
    assert plain == [(day, 9, max_gap_us, outage)]

    # legitimate equal-timestamp arrivals (same instant, DISTINCT ids)
    # survive the collapse: n_events grows, gap/flag unchanged
    legit = dup.unionByName(seg(legit_same_ts))
    assert [tuple(r) for r in outage_from_segments_with_ids(legit).collect()] == [
        (day, 8, max_gap_us, outage)
    ]

    # end-to-end through the stream: land the spread, the cluster, then
    # the cluster AGAIN as a new file (new micro-batch => new batch_id)
    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    store, ck = str(tmp_path / "store"), str(tmp_path / "ck")

    def land_file(rows, name):
        t = str(tmp_path / f"w_{name}")
        to_df(rows).coalesce(1).write.parquet(t)
        shutil.move(glob.glob(f"{t}/part-*.parquet")[0], f"{landing}/{name}.parquet")

    for rows, name in [(spread, "g0"), (cluster, "g1")]:
        land_file(rows, name)
        run_streaming_outage(spark, landing, store, ck, with_ids=True)
    assert [
        tuple(r) for r in outage_from_store_with_ids(spark, store).collect()
    ] == want

    land_file(cluster, "g1_replay")  # duplicate landing, new batch_id
    run_streaming_outage(spark, landing, store, ck, with_ids=True)
    assert [
        tuple(r) for r in outage_from_store_with_ids(spark, store).collect()
    ] == want


def test_store_compaction_folds_exactly_and_is_replay_safe(spark, tmp_path):
    """Round-12 store compaction: folding all landed generations into
    one consolidated fileset (pointer-committed, hidden dir) leaves
    every serve BIT-EQUAL — cms (sum-fold) and hll (max-fold) pinned
    here — drops the per-batch dirs, keeps serving landings that arrive
    AFTER the fold, ignores a fresh-checkpoint REPLAY of already-folded
    batches (the double-count a naive file merge would produce), and
    the batch-granular window read refuses windows below the high-water
    mark instead of silently folding the wrong rows."""
    import pytest

    from trimet_bytes__data_engineering_project_spark.operators.sketch import (
        hll_registers,
    )
    from trimet_bytes__data_engineering_project_spark.streaming.compaction import (
        compact_store,
    )
    from trimet_bytes__data_engineering_project_spark.streaming.stats import (
        cms_from_store,
        hll_from_store,
        run_streaming_cms,
        run_streaming_hll,
    )

    events = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "event_id", "user_id"
    )
    gens = [events.filter(f"event_id % 3 = {i}") for i in range(3)]

    landing = str(tmp_path / "landing")
    os.makedirs(landing)

    def land_file(df, name):
        t = str(tmp_path / f"w_{name}")
        df.coalesce(1).write.parquet(t)
        shutil.move(glob.glob(f"{t}/part-*.parquet")[0], f"{landing}/{name}.parquet")

    store, ck = str(tmp_path / "store"), str(tmp_path / "ck")
    for i, g in enumerate(gens[:2]):  # batches 0 and 1
        land_file(g, f"g{i}")
        run_streaming_cms(spark, landing, store, ck, "user_id", depth=4, width=64)
        run_streaming_hll(spark, landing, store, str(tmp_path / "ck_h"), "user_id")

    cms_before = sorted(map(tuple, cms_from_store(spark, store).collect()))
    hll_before = sorted(map(tuple, hll_from_store(spark, store).collect()))

    assert compact_store(spark, store, "cms") == 1
    assert compact_store(spark, store, "hll") == 1
    # folded dirs are gone; the hidden consolidated generation serves
    assert not [d for d in os.listdir(f"{store}/cms") if d.startswith("batch_id=")]
    assert sorted(map(tuple, cms_from_store(spark, store).collect())) == cms_before
    assert sorted(map(tuple, hll_from_store(spark, store).collect())) == hll_before
    # re-compacting with nothing new is a no-op at the same hwm
    assert compact_store(spark, store, "cms") == 1

    # landings after the fold keep serving (consolidated ∪ tail)
    land_file(gens[2], "g2")
    run_streaming_cms(spark, landing, store, ck, "user_id", depth=4, width=64)
    run_streaming_hll(spark, landing, store, str(tmp_path / "ck_h"), "user_id")
    want_all = sorted(
        map(
            tuple,
            cms_counters(events.selectExpr("user_id AS _k"), "_k", 4, 64).collect(),
        )
    )
    assert sorted(map(tuple, cms_from_store(spark, store).collect())) == want_all
    want_hll = sorted(
        map(tuple, hll_registers(events.selectExpr("user_id AS _k"), "_k", 8).collect())
    )
    assert sorted(map(tuple, hll_from_store(spark, store).collect())) == want_hll

    # window serves above the hwm, refuses at/below it
    assert cms_from_store(spark, store, min_batch_id=2).count() > 0
    with pytest.raises(ValueError, match="compacted through batch_id=1"):
        cms_from_store(spark, store, min_batch_id=1)

    # fresh-checkpoint replay: every landing re-delivers as batch 0 —
    # at/below the hwm, so the serve ignores it (no double count)
    run_streaming_cms(spark, landing, store, str(tmp_path / "ck2"), "user_id",
                      depth=4, width=64)
    assert os.path.isdir(f"{store}/cms/batch_id=0")  # the replay landed...
    assert sorted(map(tuple, cms_from_store(spark, store).collect())) == want_all

    # ...and a second compaction folds tail + ignores the stale replay
    hwm = compact_store(spark, store, "cms")
    assert hwm >= 2
    assert sorted(map(tuple, cms_from_store(spark, store).collect())) == want_all


def test_store_compaction_funnel_explicit_and_outage_refused(spark, tmp_path):
    """The parameterized members of the store family: the funnel store
    compacts through compact_store's EXPLICIT group/fold args (min is
    associative/idempotent — the folded serve is bit-equal), and the
    outage store is REFUSED outright: its segments are order-sensitive
    ranges whose serve chains consecutive (seg_min, seg_max) pairs, so
    no per-column groupBy fold is sound there."""
    import pytest

    from trimet_bytes__data_engineering_project_spark.streaming.compaction import (
        compact_store,
    )
    from trimet_bytes__data_engineering_project_spark.streaming.stats import (
        funnel_from_store,
        run_streaming_funnel,
    )

    events = load_table(spark, "/root/testdata/sf0.001", "events")
    landing = str(tmp_path / "landing")
    os.makedirs(landing)

    def land_file(df, name):
        t = str(tmp_path / f"w_{name}")
        df.coalesce(1).write.parquet(t)
        shutil.move(glob.glob(f"{t}/part-*.parquet")[0], f"{landing}/{name}.parquet")

    store, ck = str(tmp_path / "store"), str(tmp_path / "ck")
    for i in range(2):
        land_file(events.filter(f"event_id % 2 = {i}"), f"g{i}")
        run_streaming_funnel(spark, landing, store, ck)

    before = [tuple(r) for r in funnel_from_store(spark, store).collect()]
    assert len(before) > 0

    hwm = compact_store(
        spark, store, "funnel",
        group_cols=["user_id"],
        folds={"t_view": "min", "t_click": "min", "t_purchase": "min"},
    )
    assert hwm == 1
    assert not [d for d in os.listdir(f"{store}/funnel") if d.startswith("batch_id=")]
    assert [tuple(r) for r in funnel_from_store(spark, store).collect()] == before

    with pytest.raises(ValueError, match="order.*sensitive|NOT compactable"):
        compact_store(spark, store, "outage")


def test_compact_store_fold_input_single_listing_toctou(spark, tmp_path):
    """Round-12 advice (compaction.py, medium): the landing stream is a
    STANDING concurrent writer, so a batch that lands between
    compact_store's directory listing and its fold must NOT be folded
    into the consolidated generation — folded AND still live above the
    recorded hwm would serve twice.  The fix builds the fold input from
    the one listing (explicit paths), so a late batch stays a live dir
    above the hwm, served exactly once.  Simulated by compacting under
    a monkeypatched stale listing while the late batch already sits on
    disk — the exact interleaving, made deterministic."""
    import pytest

    import trimet_bytes__data_engineering_project_spark.streaming.compaction as comp

    store = str(tmp_path / "store")
    # four landed generations of a 'hist' store (bin_idx, cnt)
    for b in range(4):
        spark.createDataFrame(
            [(i, 10 + b) for i in range(3)], "bin_idx int, cnt long"
        ).write.parquet(f"{store}/hist/batch_id={b}")

    # the compactor's listing happened BEFORE batch 3 landed
    orig = comp._batch_dirs
    comp._batch_dirs = lambda s, base: [e for e in orig(s, base) if e[0] <= 2]
    try:
        hwm = comp.compact_store(spark, store, "hist")
    finally:
        comp._batch_dirs = orig
    assert hwm == 2

    # batch 3 must still be a live dir above the hwm ...
    assert os.path.isdir(f"{store}/hist/batch_id=3")
    # ... and the serve counts every batch EXACTLY once:
    # cnt per bin = (10+0) + (10+1) + (10+2) + (10+3) = 46
    rows, got_hwm = comp.store_rows(spark, store, "hist")
    got = sorted(
        map(tuple, rows.groupBy("bin_idx").agg(F.sum("cnt").alias("cnt")).collect())
    )
    assert got_hwm == 2
    assert got == [(i, 46) for i in range(3)]

    # a second compaction (fresh listing) folds the late batch in
    assert comp.compact_store(spark, store, "hist") == 3
    rows2, _ = comp.store_rows(spark, store, "hist")
    got2 = sorted(
        map(tuple, rows2.groupBy("bin_idx").agg(F.sum("cnt").alias("cnt")).collect())
    )
    assert got2 == got

    # an empty store still refuses loudly under the new fold-input path
    with pytest.raises(ValueError, match="no landed generations"):
        comp.compact_store(spark, str(tmp_path / "empty"), "hist")


def test_outage_id_fingerprint_ansi_proof(spark):
    """Round-12 advice (stats.py, id_fp): SUM(xxhash64(...)) overflows
    int64 within a couple of rows — a harmless deterministic wraparound
    under non-ANSI sessions, but ARITHMETIC_OVERFLOW under
    spark.sql.ansi.enabled=true, killing the landing on a healthy feed.
    The decimal-sum-mod-2^64 fold must (a) run under ANSI and (b) land
    values BIT-IDENTICAL to the historical wraparound, so stores landed
    before the fix compare equal to fresh landings."""
    from trimet_bytes__data_engineering_project_spark.streaming.stats import (
        outage_segments_with_ids,
    )

    df = spark.createDataFrame(
        [("2024-01-01 00:%02d:00" % (i % 30), 100 + i) for i in range(60)],
        "ts string, event_id long",
    ).select(F.col("ts").cast("timestamp").alias("ts"), "event_id")

    # non-ANSI run first: its id_fp IS the historical wraparound value
    # (pinned separately below against a hand-built legacy fold)
    plain = sorted(map(tuple, outage_segments_with_ids(df, 900_000_000).collect()))
    old = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        ansi = sorted(map(tuple, outage_segments_with_ids(df, 900_000_000).collect()))
    finally:
        spark.conf.set("spark.sql.ansi.enabled", old)
    assert ansi == plain

    # bit-identity with the legacy non-ANSI bigint wraparound (what
    # pre-fix stores landed): same groups, both folds, equal values
    from trimet_bytes__data_engineering_project_spark.streaming.stats import (
        _wrapped_hash_sum,
    )

    g = df.withColumn("grp", F.col("event_id") % 5).groupBy("grp")
    legacy = sorted(
        map(tuple, g.agg(F.sum(F.xxhash64("event_id")).alias("fp")).collect())
    )
    wrapped = sorted(map(tuple, g.agg(_wrapped_hash_sum("event_id").alias("fp")).collect()))
    assert wrapped == legacy


def test_compact_outage_day_resegmentation(spark, tmp_path):
    """Round-12 verdict item 7: the outage store's order-aware
    compactor.  compact_store refuses the outage kind (no column fold
    preserves cross-segment gaps); compact_outage_day folds each CLOSED
    day's chained segments into one equivalent row via the serve's own
    gap algebra, passes open days through verbatim, and keeps the
    pointer/hwm replay contract.  Pinned: (a) serve after compaction is
    bit-equal to the fresh fold, (b) later segments of a compacted day
    chain correctly against the consolidated row, (c) a fresh-
    checkpoint replay (re-land at batch_id 0) is a no-op, (d) with_ids
    folds n_ids/id_fp soundly, (e) overlapping closed-day segments
    REFUSE compaction loudly."""
    import pytest

    from trimet_bytes__data_engineering_project_spark.streaming.compaction import (
        compact_outage_day,
    )
    from trimet_bytes__data_engineering_project_spark.streaming.stats import (
        outage_from_segments_with_ids,
        outage_from_store,
        outage_from_store_with_ids,
        outage_segments,
        outage_segments_with_ids,
    )

    def to_df(rows):
        return spark.createDataFrame(
            [(t, i) for t, i in rows], "ts string, event_id long"
        ).select(F.col("ts").cast("timestamp").alias("ts"), "event_id")

    # two days; each batch is a time slice (the feed's arrival order)
    d1, d2 = "2024-01-01 ", "2024-01-02 "
    b0 = [(d1 + "00:00:00", 1), (d1 + "00:10:00", 2), (d2 + "01:00:00", 20)]
    b1 = [(d1 + "02:00:00", 3), (d1 + "02:05:00", 4), (d2 + "03:00:00", 21)]
    b2 = [(d1 + "09:00:00", 5), (d2 + "11:00:00", 22)]
    shard = 900_000_000

    store = str(tmp_path / "store")
    seg = lambda rows: outage_segments_with_ids(to_df(rows), shard)  # noqa: E731
    for i, b in enumerate([b0, b1]):
        seg(b).write.parquet(f"{store}/outage/batch_id={i}")

    want_fresh = [
        tuple(r)
        for r in outage_from_segments_with_ids(
            seg(b0).unionByName(seg(b1)).unionByName(seg(b2))
        ).collect()
    ]

    # compact day 1 (closed); day 2 passes through verbatim
    assert compact_outage_day(spark, store, "2024-01-01", with_ids=True) == 1
    assert not [
        d for d in os.listdir(f"{store}/outage") if d.startswith("batch_id=")
    ]
    # consolidated gen: ONE row for the closed day, verbatim rows for day 2
    from trimet_bytes__data_engineering_project_spark.streaming.compaction import (
        store_rows,
    )

    rows, hwm = store_rows(spark, store, "outage")
    assert hwm == 1
    day1 = rows.filter("day = DATE '2024-01-01'").collect()
    assert len(day1) == 1
    assert day1[0]["cnt"] == 4 and day1[0]["n_ids"] == 4

    # a LATER batch adds segments to BOTH days — the compacted day's new
    # segment chains against its consolidated row
    seg(b2).write.parquet(f"{store}/outage/batch_id=2")
    got = [tuple(r) for r in outage_from_store_with_ids(spark, store).collect()]
    assert got == want_fresh

    # fresh-checkpoint replay: batch 0 re-lands at batch_id=0 <= hwm
    seg(b0).write.parquet(f"{store}/outage/batch_id=0")
    assert [
        tuple(r) for r in outage_from_store_with_ids(spark, store).collect()
    ] == want_fresh

    # second compaction folds the tail in (day 2 still open)
    assert compact_outage_day(spark, store, "2024-01-01", with_ids=True) == 2
    assert [
        tuple(r) for r in outage_from_store_with_ids(spark, store).collect()
    ] == want_fresh

    # range-only variant, same algebra
    store2 = str(tmp_path / "store2")
    rseg = lambda rows: outage_segments(to_df(rows), shard)  # noqa: E731
    for i, b in enumerate([b0, b1]):
        rseg(b).write.parquet(f"{store2}/outage/batch_id={i}")
    want2 = [
        tuple(r)
        for r in outage_from_store(spark, store2).collect()
    ]
    assert compact_outage_day(spark, store2, "2024-01-01") == 1
    assert [tuple(r) for r in outage_from_store(spark, store2).collect()] == want2

    # overlapping closed-day segments refuse compaction loudly
    store3 = str(tmp_path / "store3")
    rseg(b0).write.parquet(f"{store3}/outage/batch_id=0")
    rseg([(d1 + "00:05:00", 91), (d1 + "00:20:00", 92)]).write.parquet(
        f"{store3}/outage/batch_id=1"
    )
    with pytest.raises(ValueError, match="overlapping segments"):
        compact_outage_day(spark, store3, "2024-01-01")


def test_compact_outage_day_fold_input_single_listing_toctou(spark, tmp_path):
    """compact_outage_day inherits compact_store's single-listing rule
    (round-12 advice): a batch the live stream lands between the
    compactor's listing and its fold must stay a live dir above the
    recorded hwm — folded AND live would serve its segments twice
    (inflating n_events).  Same deterministic simulation as the
    compact_store pin: compaction under a monkeypatched stale listing
    while the late batch already sits on disk."""
    import trimet_bytes__data_engineering_project_spark.streaming.compaction as comp
    from trimet_bytes__data_engineering_project_spark.streaming.stats import (
        outage_from_segments,
        outage_from_store,
        outage_segments,
    )

    def to_df(rows):
        return spark.createDataFrame(
            [(t, i) for t, i in rows], "ts string, event_id long"
        ).select(F.col("ts").cast("timestamp").alias("ts"), "event_id")

    d = "2024-01-01 "
    batches = [
        [(d + "00:00:00", 1), (d + "00:10:00", 2)],
        [(d + "02:00:00", 3), (d + "02:30:00", 4)],
        [(d + "05:00:00", 5), (d + "05:15:00", 6)],  # lands mid-compaction
    ]
    store = str(tmp_path / "store")
    seg = lambda rows: outage_segments(to_df(rows), 900_000_000)  # noqa: E731
    for i, b in enumerate(batches):
        seg(b).write.parquet(f"{store}/outage/batch_id={i}")

    orig = comp._batch_dirs
    comp._batch_dirs = lambda s, base: [e for e in orig(s, base) if e[0] <= 1]
    try:
        hwm = comp.compact_outage_day(spark, store, "2024-01-01")
    finally:
        comp._batch_dirs = orig
    assert hwm == 1
    assert os.path.isdir(f"{store}/outage/batch_id=2")  # late batch stays live

    want = [
        tuple(r)
        for r in outage_from_segments(
            seg(batches[0]).unionByName(seg(batches[1])).unionByName(seg(batches[2]))
        ).collect()
    ]
    assert [tuple(r) for r in outage_from_store(spark, store).collect()] == want


def test_compact_outage_day_rejects_malformed_cutoff(spark, tmp_path):
    """A garbage through_day must refuse LOUDLY before any write: under
    a non-ANSI session it would cast to NULL, classify every segment as
    neither closed nor open, consolidate an EMPTY generation, and
    delete the batch dirs — a typo becoming silent data loss.  The
    eager ISO-date validation turns that into a ValueError with the
    store untouched."""
    import pytest

    from trimet_bytes__data_engineering_project_spark.streaming.compaction import (
        compact_outage_day,
    )
    from trimet_bytes__data_engineering_project_spark.streaming.stats import (
        outage_from_store,
        outage_segments,
    )

    df = spark.createDataFrame(
        [("2024-01-01 00:00:00", 1), ("2024-01-01 00:10:00", 2)],
        "ts string, event_id long",
    ).select(F.col("ts").cast("timestamp").alias("ts"), "event_id")
    store = str(tmp_path / "store")
    outage_segments(df, 900_000_000).write.parquet(f"{store}/outage/batch_id=0")
    before = [tuple(r) for r in outage_from_store(spark, store).collect()]

    for bad in ("2024-13-99", "tomorrow", "", "None"):
        with pytest.raises(ValueError, match="not an ISO date"):
            compact_outage_day(spark, store, bad)
    # the store is untouched: no pointer, batch dir intact, serve equal
    assert os.path.isdir(f"{store}/outage/batch_id=0")
    assert not os.path.exists(f"{store}/outage/._consolidated")
    assert [tuple(r) for r in outage_from_store(spark, store).collect()] == before


def test_compact_outage_day_refuses_id_evidence_mismatch(spark, tmp_path):
    """Round-13 review finding: with_ids=False on an id-bearing store
    would SELECT AWAY the n_ids/id_fp columns, write an id-less
    consolidated generation, and delete the batch dirs holding the only
    copies — outage_from_store_with_ids would fail forever.  Both
    mismatch directions refuse loudly with the store untouched."""
    import pytest

    from trimet_bytes__data_engineering_project_spark.streaming.compaction import (
        compact_outage_day,
    )
    from trimet_bytes__data_engineering_project_spark.streaming.stats import (
        outage_from_store_with_ids,
        outage_segments,
        outage_segments_with_ids,
    )

    def to_df(rows):
        return spark.createDataFrame(
            [(t, i) for t, i in rows], "ts string, event_id long"
        ).select(F.col("ts").cast("timestamp").alias("ts"), "event_id")

    rows = [("2024-01-01 00:00:00", 1), ("2024-01-01 00:10:00", 2)]
    ids_store = str(tmp_path / "ids_store")
    outage_segments_with_ids(to_df(rows), 900_000_000).write.parquet(
        f"{ids_store}/outage/batch_id=0"
    )
    before = [tuple(r) for r in outage_from_store_with_ids(spark, ids_store).collect()]
    with pytest.raises(ValueError, match="carries id evidence"):
        compact_outage_day(spark, ids_store, "2024-01-01")  # with_ids omitted
    assert os.path.isdir(f"{ids_store}/outage/batch_id=0")
    assert not os.path.exists(f"{ids_store}/outage/._consolidated")
    assert [
        tuple(r) for r in outage_from_store_with_ids(spark, ids_store).collect()
    ] == before

    plain_store = str(tmp_path / "plain_store")
    outage_segments(to_df(rows), 900_000_000).write.parquet(
        f"{plain_store}/outage/batch_id=0"
    )
    with pytest.raises(ValueError, match="landed range-only"):
        compact_outage_day(spark, plain_store, "2024-01-01", with_ids=True)
    assert not os.path.exists(f"{plain_store}/outage/._consolidated")


def test_compact_store_raises_on_mid_rewrite_fold_dir(spark, tmp_path):
    """Round-13 review finding: a fresh-checkpoint replay re-lands a
    FOLDED batch_id with mode('overwrite') — delete-then-commit — so a
    fold racing it could read an empty dir and commit a consolidated
    generation silently missing that batch (then ignore the re-land
    forever, at/below the hwm).  The fold now pins its input to the
    parquet FILES listed up-front; a dir caught mid-rewrite (no parquet
    files AND no _SUCCESS — overwrite deletes the whole dir first and
    recommits the marker last, so both vanish together) raises instead
    of folding partial content."""
    import pytest

    import trimet_bytes__data_engineering_project_spark.streaming.compaction as comp

    store = str(tmp_path / "store")
    for b in range(2):
        spark.createDataFrame(
            [(i, 10 + b) for i in range(3)], "bin_idx int, cnt long"
        ).write.parquet(f"{store}/hist/batch_id={b}")
    # simulate batch 1 caught mid-overwrite: the re-land's delete phase
    # removed data files AND the commit marker (the dir itself already
    # recreated by the in-flight write) — _SUCCESS must go too, else the
    # signature is a committed-empty landing, which SKIPS (round-13
    # advice disambiguation, pinned separately below)
    for f in os.listdir(f"{store}/hist/batch_id=1"):
        if f.endswith(".parquet") or f == "_SUCCESS":
            os.remove(f"{store}/hist/batch_id=1/{f}")
    with pytest.raises(IOError, match="mid-compaction"):
        comp.compact_store(spark, store, "hist")
    # nothing committed: no pointer, batch 0 intact and still served
    assert not os.path.exists(f"{store}/hist/._consolidated")
    rows, hwm = comp.store_rows(spark, store, "hist")
    assert hwm is None


def test_compact_store_skips_committed_empty_landing(spark, tmp_path):
    """Round-13 advice (compaction.py, low): a legitimately EMPTY landed
    generation — empty micro-batch, _SUCCESS committed, zero part files
    — shares the no-parquet signature with a mid-overwrite dir, and the
    round-13 raise would have blocked that store's compaction forever
    with a misleading diagnosis.  Disambiguated via _SUCCESS: the empty
    landing contributes no rows, the fold skips it, the hwm advances
    past it (so it is cleaned up), and the serve is unchanged."""
    import pytest

    import trimet_bytes__data_engineering_project_spark.streaming.compaction as comp

    store = str(tmp_path / "store")
    spark.createDataFrame(
        [(i, 10) for i in range(3)], "bin_idx int, cnt long"
    ).write.parquet(f"{store}/hist/batch_id=0")
    # batch 1: a committed-empty landing (marker only, no part files)
    os.makedirs(f"{store}/hist/batch_id=1")
    open(f"{store}/hist/batch_id=1/_SUCCESS", "w").close()

    hwm = comp.compact_store(spark, store, "hist")
    assert hwm == 1  # advanced PAST the empty landing
    rows, got_hwm = comp.store_rows(spark, store, "hist")
    assert got_hwm == 1
    got = sorted(
        map(tuple, rows.groupBy("bin_idx").agg(F.sum("cnt").alias("cnt")).collect())
    )
    assert got == [(i, 10) for i in range(3)]
    assert not os.path.isdir(f"{store}/hist/batch_id=1")  # cleaned up

    # a LATER committed-empty landing re-compacts fine too: the fold is
    # the prior consolidated generation alone (identity refold)
    os.makedirs(f"{store}/hist/batch_id=2")
    open(f"{store}/hist/batch_id=2/_SUCCESS", "w").close()
    assert comp.compact_store(spark, store, "hist") == 2
    rows2, _ = comp.store_rows(spark, store, "hist")
    got2 = sorted(
        map(tuple, rows2.groupBy("bin_idx").agg(F.sum("cnt").alias("cnt")).collect())
    )
    assert got2 == got

    # degenerate corner, loud: never compacted AND nothing but empty
    # landings — there is no schema to consolidate under
    empty = str(tmp_path / "empty_only")
    os.makedirs(f"{empty}/hist/batch_id=0")
    open(f"{empty}/hist/batch_id=0/_SUCCESS", "w").close()
    with pytest.raises(ValueError, match="committed-empty"):
        comp.compact_store(spark, empty, "hist")
    # the outage day-compactor shares the corner via _fold_files
    empty2 = str(tmp_path / "empty_outage")
    os.makedirs(f"{empty2}/outage/batch_id=0")
    open(f"{empty2}/outage/batch_id=0/_SUCCESS", "w").close()
    with pytest.raises(ValueError, match="committed-empty"):
        comp.compact_outage_day(spark, empty2, "2024-01-01")


def test_compact_outage_day_refuses_prior_gen_id_evidence_mismatch(spark, tmp_path):
    """Round-13 advice (compaction.py, medium): the id-evidence guard
    inspected only the NEW batch dirs — a prior consolidated generation
    carrying n_ids/id_fp plus range-only new batches passed
    with_ids=False, and the column projection silently stripped the id
    evidence from the consolidated rows before the superseded
    generation was deleted: the exact data-loss class the guard exists
    to prevent, entering through the other input.  The guard now reads
    the prior generation's schema too and refuses ANY shape mismatch
    between it, the fold dirs, and the flag — in both directions, with
    the store untouched."""
    import pytest

    import trimet_bytes__data_engineering_project_spark.streaming.compaction as comp
    from trimet_bytes__data_engineering_project_spark.streaming.stats import (
        outage_from_store_with_ids,
        outage_segments,
        outage_segments_with_ids,
    )

    def to_df(rows):
        return spark.createDataFrame(
            [(t, i) for t, i in rows], "ts string, event_id long"
        ).select(F.col("ts").cast("timestamp").alias("ts"), "event_id")

    # id-bearing store, day-compacted once: gen-1 carries n_ids/id_fp
    store = str(tmp_path / "store")
    outage_segments_with_ids(
        to_df([("2024-01-01 00:00:00", 1), ("2024-01-01 00:10:00", 2)]),
        900_000_000,
    ).write.parquet(f"{store}/outage/batch_id=0")
    assert comp.compact_outage_day(spark, store, "2024-01-01", with_ids=True) == 0
    before = [tuple(r) for r in outage_from_store_with_ids(spark, store).collect()]

    # a broken producer lands a RANGE-ONLY batch on the id-bearing store
    outage_segments(
        to_df([("2024-01-02 00:00:00", 3), ("2024-01-02 00:05:00", 4)]),
        900_000_000,
    ).write.parquet(f"{store}/outage/batch_id=1")

    # BOTH flag values refuse: no single compaction is sound for a
    # store landed in two shapes
    for flag in (False, True):
        with pytest.raises(ValueError, match="shape mismatch"):
            comp.compact_outage_day(spark, store, "2024-01-02", with_ids=flag)
    # untouched: pointer still gen-1, the mismatched batch dir intact —
    # so deleting the minority-shape dir and re-landing it through the
    # matching form restores the serve captured above (`before`); the
    # serve itself rightly fails while the mixed tail sits there (the
    # store is in a broken upstream state, and nothing was lost)
    assert comp._read_pointer(f"{store}/outage") == (".consolidated-gen-1", 0)
    assert os.path.isdir(f"{store}/outage/batch_id=1")
    shutil.rmtree(f"{store}/outage/batch_id=1")
    assert [
        tuple(r) for r in outage_from_store_with_ids(spark, store).collect()
    ] == before

    # reverse direction: prior gen RANGE-ONLY, new batches id-bearing —
    # previously with_ids=True would have died inside the prior gen's
    # projection with a confusing missing-column error; now the same
    # loud shape refusal
    store2 = str(tmp_path / "store2")
    outage_segments(
        to_df([("2024-01-01 00:00:00", 1), ("2024-01-01 00:10:00", 2)]),
        900_000_000,
    ).write.parquet(f"{store2}/outage/batch_id=0")
    assert comp.compact_outage_day(spark, store2, "2024-01-01") == 0
    outage_segments_with_ids(
        to_df([("2024-01-02 00:00:00", 3), ("2024-01-02 00:05:00", 4)]),
        900_000_000,
    ).write.parquet(f"{store2}/outage/batch_id=1")
    for flag in (False, True):
        with pytest.raises(ValueError, match="shape mismatch"):
            comp.compact_outage_day(spark, store2, "2024-01-02", with_ids=flag)
    assert comp._read_pointer(f"{store2}/outage") == (".consolidated-gen-1", 0)


def test_x216_build_chains_two_consolidated_generations(spark):
    """The r13 verdict's done-condition for the multi-generation chain:
    x216's store must hold a .consolidated-gen-2 pointer — generation 1
    was folded INTO generation 2 and retired — with only the live tail
    and the ignored replay as batch dirs.  Fresh build (rmtree first)
    so the pin witnesses this code's lifecycle."""
    from trimet_bytes__data_engineering_project_spark.plans.extensions import (
        _SCRATCH,
        _tagged_dir,
    )
    from trimet_bytes__data_engineering_project_spark.plans.registry import QUERIES
    from trimet_bytes__data_engineering_project_spark.streaming.compaction import (
        _read_pointer,
    )

    sf = "/root/testdata/sf0.001"
    store = _tagged_dir(_SCRATCH, "recompacted_cms", sf_dir=sf)
    shutil.rmtree(store, ignore_errors=True)

    out = QUERIES["x216_recompacted_cms_serve"](spark, sf).collect()
    # top-k capped by the distinct-user population (sf0.001 has < 20)
    from trimet_bytes__data_engineering_project_spark.plans.tables import load_table

    n_users = load_table(spark, sf, "events").select("user_id").distinct().count()
    assert len(out) == min(20, n_users) > 0
    # twice-compacted store still serves the EXACT sketch: every top
    # user's estimate must be >= its true count (CMS one-sided error),
    # and with this depth/width at sf0.001 collisions are absent
    assert all(r.est == r.c for r in out)

    assert _read_pointer(f"{store}/cms") == (".consolidated-gen-2", 3)
    assert os.path.isdir(f"{store}/cms/.consolidated-gen-2")
    assert not os.path.exists(f"{store}/cms/.consolidated-gen-1")  # retired
    live = sorted(
        d for d in os.listdir(f"{store}/cms") if d.startswith("batch_id=")
    )
    # batch 4 = live tail; batch 1 = the re-landed replay the serve ignores
    assert live == ["batch_id=1", "batch_id=4"]


def test_compact_store_refuses_partial_commit_dir(spark, tmp_path):
    """Round-14 review: a re-land caught mid-COMMIT — part files already
    renamed in, _SUCCESS not yet written (the committer writes it last)
    — previously folded as a silently PARTIAL batch.  _fold_files now
    requires the marker for NON-empty dirs too: parquet files without
    _SUCCESS is a commit in flight, raise with the store untouched."""
    import pytest

    import trimet_bytes__data_engineering_project_spark.streaming.compaction as comp

    store = str(tmp_path / "store")
    for b in range(2):
        spark.createDataFrame(
            [(i, 10 + b) for i in range(3)], "bin_idx int, cnt long"
        ).write.parquet(f"{store}/hist/batch_id={b}")
    # batch 1 mid-commit: marker not yet written, data files present
    os.remove(f"{store}/hist/batch_id=1/_SUCCESS")

    with pytest.raises(IOError, match="no _SUCCESS marker"):
        comp.compact_store(spark, store, "hist")
    # nothing committed: no pointer, both dirs' data intact
    assert not os.path.exists(f"{store}/hist/._consolidated")
    assert comp.store_rows(spark, store, "hist")[1] is None

    # the commit completing (marker lands) unblocks the same call
    open(f"{store}/hist/batch_id=1/_SUCCESS", "w").close()
    assert comp.compact_store(spark, store, "hist") == 1


def test_compact_outage_day_refuses_mixed_shape_new_dirs(spark, tmp_path):
    """Round-14 review: the id-evidence guard derived the new-batch
    shape from the MULTI-PATH read, whose schema comes from a single
    file — a fold set mixing id-bearing and range-only dirs resolved to
    whichever file won, either stripping the id dirs' evidence
    (with_ids=False passes) or null-filling the range-only rows into
    undercounted folds (with_ids=True passes).  The shape is now read
    PER DIR and any mixture refuses loudly, both flags, store
    untouched."""
    import pytest

    import trimet_bytes__data_engineering_project_spark.streaming.compaction as comp
    from trimet_bytes__data_engineering_project_spark.streaming.stats import (
        outage_segments,
        outage_segments_with_ids,
    )

    def to_df(rows):
        return spark.createDataFrame(
            [(t, i) for t, i in rows], "ts string, event_id long"
        ).select(F.col("ts").cast("timestamp").alias("ts"), "event_id")

    # NEVER-compacted store: batch 0 id-bearing, batch 1 range-only —
    # the mixture lives entirely within the new fold dirs
    store = str(tmp_path / "store")
    outage_segments_with_ids(
        to_df([("2024-01-01 00:00:00", 1), ("2024-01-01 00:10:00", 2)]),
        900_000_000,
    ).write.parquet(f"{store}/outage/batch_id=0")
    outage_segments(
        to_df([("2024-01-01 01:00:00", 3), ("2024-01-01 01:05:00", 4)]),
        900_000_000,
    ).write.parquet(f"{store}/outage/batch_id=1")

    for flag in (False, True):
        with pytest.raises(ValueError, match="WITHIN the new batch dirs"):
            comp.compact_outage_day(spark, store, "2024-01-01", with_ids=flag)
    # untouched: never compacted, both dirs intact
    assert comp._read_pointer(f"{store}/outage") is None
    assert os.path.isdir(f"{store}/outage/batch_id=0")
    assert os.path.isdir(f"{store}/outage/batch_id=1")
