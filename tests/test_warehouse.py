"""Warehouse tests — partitioned layout, partition pruning, and the J3
trip_full_view fan-out semantics."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from trimet_bytes__data_engineering_project_spark.operators.transform import (
    breadcrumb_table,
    enrich_breadcrumbs,
    trip_table,
)
from trimet_bytes__data_engineering_project_spark.plans.warehouse import (
    trip_full_view,
    write_breadcrumb,
    write_trip,
)
from trimet_bytes__data_engineering_project_spark.schemas import BREADCRUMB_RAW, STOP_EVENT_COLUMNS

from .fixtures import breadcrumb_raw_records


def _tables(spark):
    raw = spark.createDataFrame(breadcrumb_raw_records(), schema=BREADCRUMB_RAW)
    enriched = enrich_breadcrumbs(raw).filter(F.col("TIMESTAMP").isNotNull())
    return trip_table(enriched), breadcrumb_table(enriched)


def test_breadcrumb_partitioned_by_date(spark, tmp_path):
    trip, bc = _tables(spark)
    path = str(tmp_path / "breadcrumb")
    write_breadcrumb(bc, path)
    # physical layout: one directory per service date (partition pruning)
    parts = [d for d in os.listdir(path) if d.startswith("service_date=")]
    assert len(parts) == bc.select(F.to_date("tstamp")).distinct().count()

    # date predicate prunes: only one partition's files are read
    pruned = spark.read.parquet(path).filter(F.col("service_date") == "2023-01-09")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(service_date" in plan


def test_trip_full_view_fanout(spark, tmp_path):
    trip, bc = _tables(spark)
    write_trip(trip, str(tmp_path / "trip"))
    se_row = dict.fromkeys(STOP_EVENT_COLUMNS, "1")
    se_row.update(trip_number="238330000", service_key="W", direction="0")
    se = spark.createDataFrame([se_row, dict(se_row, direction="1")]).select(*STOP_EVENT_COLUMNS)

    view = trip_full_view(spark.read.parquet(str(tmp_path / "trip")), bc, se)
    # m×n fan-out per trip is the documented semantics (SURVEY §2.3 J3)
    bc_per_trip = bc.filter(F.col("trip_id") == 238330000).count()
    assert view.filter(F.col("trip_id") == 238330000).count() == bc_per_trip * 2
    # trips without stop events keep their breadcrumbs (left join)
    other = bc.filter(F.col("trip_id") == 238330001).count()
    assert view.filter(F.col("trip_id") == 238330001).count() == other


def test_compact_partition_merges_small_files(spark, tmp_path):
    """Streaming appends leave many small files per date partition;
    compaction rewrites one partition to ceil(rows/target) sorted files
    via an atomic directory swap (rows and values unchanged)."""
    from trimet_bytes__data_engineering_project_spark.plans.warehouse import (
        compact_partition,
    )

    _, bc = _tables(spark)
    path = str(tmp_path / "breadcrumb")
    # simulate micro-batch appends: several small writes into the layout
    for _ in range(5):
        write_breadcrumb(bc, path, mode="append")

    date = bc.select(F.to_date("tstamp").alias("d")).distinct().orderBy("d").first()["d"]
    part_dir = os.path.join(path, f"service_date={date}")
    before_files = [f for f in os.listdir(part_dir) if f.endswith(".parquet")]
    assert len(before_files) > 1
    before = spark.read.parquet(part_dir).orderBy("trip_id", "tstamp").collect()

    n_after = compact_partition(spark, path, "service_date", str(date))
    assert n_after == 1  # tiny partition → a single file
    after_files = [f for f in os.listdir(part_dir) if f.endswith(".parquet")]
    assert len(after_files) == 1
    after = spark.read.parquet(part_dir).orderBy("trip_id", "tstamp").collect()
    assert after == before
    # whole table still readable with the partition column intact
    assert spark.read.parquet(path).filter(F.col("service_date") == str(date)).count() == len(
        before
    )


def test_compact_pointer_commit_reader_sees_old_or_new_only(spark, tmp_path):
    """Object-store-safe pointer commit: a resolving reader sees the
    complete OLD fileset until the single-file pointer flips, and the
    complete NEW fileset after — never a mix, never an in-progress
    generation; plain table-root readers never see hidden work dirs."""
    import shutil

    from trimet_bytes__data_engineering_project_spark.plans.warehouse import (
        compact_partition,
        read_compacted,
        resolve_partition_dir,
    )

    _, bc = _tables(spark)
    path = str(tmp_path / "breadcrumb")
    for _ in range(4):
        write_breadcrumb(bc, path, mode="append")
    date = bc.select(F.to_date("tstamp").alias("d")).distinct().orderBy("d").first()["d"]
    part_dir = os.path.join(path, f"service_date={date}")
    before = spark.read.parquet(part_dir).orderBy("trip_id", "tstamp").collect()
    total_before = spark.read.parquet(path).count()

    # mid-compact: an in-progress generation exists but the pointer has
    # not flipped → resolve still returns the loose (old) fileset, and a
    # plain table-root read is unchanged (hidden dir invisible)
    inprog = os.path.join(part_dir, ".gen-1")
    spark.read.parquet(part_dir).limit(3).write.parquet(inprog)
    os.remove(os.path.join(inprog, "_SUCCESS"))  # simulate unfinished write
    assert resolve_partition_dir(part_dir) == part_dir
    assert spark.read.parquet(path).count() == total_before
    shutil.rmtree(inprog)

    n_after = compact_partition(spark, path, "service_date", str(date), commit="pointer")
    assert n_after == 1
    gen_dir = resolve_partition_dir(part_dir)
    assert os.path.basename(gen_dir).startswith(".gen-")
    after = spark.read.parquet(gen_dir).orderBy("trip_id", "tstamp").collect()
    assert after == before
    # loose generation-0 files vacuumed post-commit
    assert not [f for f in os.listdir(part_dir) if f.endswith(".parquet")]

    # read_compacted resolves every partition (compacted or not) to the
    # same rows the pre-compaction table held
    resolved = read_compacted(spark, path, "service_date")
    assert resolved.count() == total_before
    assert (
        resolved.filter(F.col("service_date") == str(date)).count() == len(before)
    )

    # second compaction: new generation, pointer flips, old gen vacuumed
    compact_partition(spark, path, "service_date", str(date), commit="pointer")
    gen2 = resolve_partition_dir(part_dir)
    assert gen2 != gen_dir and not os.path.exists(gen_dir)
    assert spark.read.parquet(gen2).orderBy("trip_id", "tstamp").collect() == before

    # pointer naming a vanished generation FAILS LOUDLY (round-10 close
    # finding 782e08e: the loose files it would silently degrade to may
    # have been vacuumed — a corrupt pointer must never read as an
    # empty/stale partition).  Written through the same FS API as the
    # commit path — the local Hadoop FS is checksummed, so a raw open()
    # rewrite would corrupt the crc sidecar rather than simulate a
    # dangling pointer.
    import pytest

    from trimet_bytes__data_engineering_project_spark.plans.warehouse import (
        CorruptPointerError,
    )
    from trimet_bytes__data_engineering_project_spark.streaming.hadoopfs import (
        fs_write_text_atomic,
    )

    fs_write_text_atomic(os.path.join(part_dir, "._current"), ".gen-99", spark)
    with pytest.raises(CorruptPointerError, match="does not exist"):
        resolve_partition_dir(part_dir)
    # restore the real pointer so later asserts see a healthy partition
    fs_write_text_atomic(
        os.path.join(part_dir, "._current"), os.path.basename(gen2), spark
    )
    assert resolve_partition_dir(part_dir) == gen2


def test_compact_swap_crash_states_recoverable_and_invisible(spark, tmp_path):
    """Swap-commit crash windows: hidden work dirs are invisible to
    plain readers, and recover_compaction repairs every crash state
    (mid-swap missing partition, pre-rmtree double copy, uncommitted
    new fileset)."""
    import shutil

    from trimet_bytes__data_engineering_project_spark.plans.warehouse import (
        recover_compaction,
    )

    _, bc = _tables(spark)
    path = str(tmp_path / "breadcrumb")
    write_breadcrumb(bc, path, mode="append")
    date = bc.select(F.to_date("tstamp").alias("d")).distinct().orderBy("d").first()["d"]
    part_dir = os.path.join(path, f"service_date={date}")
    tag = os.path.basename(part_dir)
    total = spark.read.parquet(path).count()
    part_rows = spark.read.parquet(part_dir).count()

    # crash state A: compacted fileset written, never committed
    shutil.copytree(part_dir, os.path.join(path, f".compact-new-{tag}"))
    assert spark.read.parquet(path).count() == total  # invisible to discovery
    recover_compaction(path)
    assert not os.path.exists(os.path.join(path, f".compact-new-{tag}"))

    # crash state B: between the two renames — partition dir absent
    os.rename(part_dir, os.path.join(path, f".compact-old-{tag}"))
    assert spark.read.parquet(path).count() == total - part_rows
    recover_compaction(path)
    assert spark.read.parquet(part_dir).count() == part_rows

    # crash state C: after second rename, before rmtree — both copies
    shutil.copytree(part_dir, os.path.join(path, f".compact-old-{tag}"))
    assert spark.read.parquet(path).count() == total  # old copy hidden
    recover_compaction(path)
    assert not os.path.exists(os.path.join(path, f".compact-old-{tag}"))
    assert spark.read.parquet(path).count() == total


def test_zorder_key_interleave_and_locality(spark, tmp_path):
    """zorder_key: (a) exact Morton bit-interleave on a hand-computed
    grid; (b) the layout property that justifies it — files of a
    z-sorted table are bounded in BOTH dimensions, so a single-dim
    predicate on the SECOND dimension prunes files, which a first-dim
    sort can never do."""
    import glob

    import pyarrow.parquet as pq

    from trimet_bytes__data_engineering_project_spark.functions.geo import zorder_key

    # (a) 4x4 grid, 2 bits: morton(x,y) = interleave bits, x even, y odd
    pts = spark.createDataFrame(
        [(x, y) for x in range(4) for y in range(4)], "x int, y int"
    )
    got = {
        (r["x"], r["y"]): r["z"]
        for r in pts.select("x", "y", zorder_key(F.col("x"), F.col("y"), (0, 3), (0, 3), bits=2).alias("z")).collect()
    }
    def morton(x, y):
        z = 0
        for b in range(2):
            z |= ((x >> b) & 1) << (2 * b) | ((y >> b) & 1) << (2 * b + 1)
        return z
    assert got == {(x, y): morton(x, y) for x in range(4) for y in range(4)}

    # (b) 64x64 grid written 16 files each way; predicate on lon only
    grid = spark.createDataFrame(
        [(float(la), float(lo)) for la in range(64) for lo in range(64)],
        "lat double, lon double",
    )
    z = zorder_key(F.col("lat"), F.col("lon"), (0.0, 63.0), (0.0, 63.0), bits=6)
    p_lat = str(tmp_path / "lat_sorted")
    p_z = str(tmp_path / "z_sorted")
    grid.repartitionByRange(16, "lat").sortWithinPartitions("lat").write.parquet(p_lat)
    grid.withColumn("_z", z).repartitionByRange(16, "_z").sortWithinPartitions(
        "_z"
    ).drop("_z").write.parquet(p_z)

    def files_hit(path, lo, hi):
        hit = 0
        for f in glob.glob(path + "/*.parquet"):
            md = pq.ParquetFile(f).metadata
            col = {md.schema.column(i).name: i for i in range(md.num_columns)}
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(col["lon"]).statistics
                mins.append(st.min); maxs.append(st.max)
            if min(mins) <= hi and max(maxs) >= lo:
                hit += 1
        return hit

    # lon in [0, 15]: z-order files are 2-D tiles -> most files skipped;
    # lat-sorted files all span the full lon range -> nothing skipped
    assert files_hit(p_lat, 0.0, 15.0) == 16
    assert files_hit(p_z, 0.0, 15.0) <= 8


def test_merge_upsert_updates_win_no_loss(spark):
    """Updates replace matched keys, unmatched base rows survive, new
    keys insert; row count = |base ∪ updates by key|; the anti join
    broadcasts (base never shuffles)."""
    from trimet_bytes__data_engineering_project_spark.plans.warehouse import merge_upsert

    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], ["id", "grp", "v"]
    )
    updates = spark.createDataFrame(
        [(2, "b", 99.0), (4, "d", 40.0)], ["id", "grp", "v"]
    )
    out = merge_upsert(base, updates, ["id"])
    rows = {r["id"]: r["v"] for r in out.collect()}
    assert rows == {1: 10.0, 2: 99.0, 3: 30.0, 4: 40.0}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_snapshot_diff_statuses(spark):
    """All four statuses on a hand corpus, including the NULL-content
    contract (NULL->value = changed, NULL->NULL = unchanged)."""
    from trimet_bytes__data_engineering_project_spark.plans.warehouse import (
        snapshot_diff,
    )

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, None), (5, None)],
        "id long, text string",
    )
    new = spark.createDataFrame(
        [(2, "b"), (3, "C"), (4, "x"), (5, None), (6, "f")],
        "id long, text string",
    )
    got = {r.id: r.status for r in snapshot_diff(old, new, "id", ["text"]).collect()}
    assert got == {
        1: "removed",
        2: "unchanged",
        3: "changed",
        4: "changed",
        5: "unchanged",
        6: "added",
    }


def test_snapshot_time_travel_and_vacuum(spark, tmp_path):
    """The snapshot layer end-to-end: (1) snapshots pin IMMUTABLE
    pointer-committed generations, so a reader AS OF snapshot N is
    untouched by later compactions AND later data changes (a new
    generation with fewer rows flips the live pointer; the old
    snapshot still reads the full fileset); (2) vacuum_table deletes
    exactly the generations no retained snapshot and no live pointer
    references, expires old manifests, and is idempotent."""
    import os

    from pyspark.sql import functions as F

    from trimet_bytes__data_engineering_project_spark.plans.warehouse import (
        commit_snapshot,
        compact_partition,
        list_snapshots,
        read_as_of,
        read_compacted,
        vacuum_table,
    )

    path = str(tmp_path / "fact")
    df = spark.range(200).select(
        F.col("id"),
        F.when(F.col("id") % 2 == 0, "2024-01-01").otherwise("2024-01-02").alias("day"),
    )
    df.repartition(4).write.partitionBy("day").parquet(path)

    # pointer-commit both partitions (vacuum=False: snapshot mode)
    for v in ("2024-01-01", "2024-01-02"):
        compact_partition(
            spark, path, "day", v, target_rows_per_file=1_000,
            sort_cols=("id",), commit="pointer", vacuum=False,
        )
    snap1 = commit_snapshot(path, "day")

    # second compaction generation + snapshot
    for v in ("2024-01-01", "2024-01-02"):
        compact_partition(
            spark, path, "day", v, target_rows_per_file=50,
            sort_cols=("id",), commit="pointer", vacuum=False,
        )
    snap2 = commit_snapshot(path, "day")

    full = sorted(r.id for r in read_compacted(spark, path, "day").collect())
    assert sorted(r.id for r in read_as_of(spark, path, "day", snap1).collect()) == full
    assert sorted(r.id for r in read_as_of(spark, path, "day", snap2).collect()) == full

    # DATA CHANGE: hand-commit a generation that drops ids >= 100 in one
    # partition (write + atomic pointer flip — the compact commit path)
    part = os.path.join(path, "day=2024-01-01")
    gen9 = os.path.join(part, ".gen-9")
    spark.read.parquet(os.path.join(part, ".gen-2")).filter("id < 100") \
        .write.parquet(gen9)
    from trimet_bytes__data_engineering_project_spark.streaming.hadoopfs import (
        fs_write_text_atomic,
    )

    fs_write_text_atomic(os.path.join(part, "._current"), ".gen-9", spark)

    live = sorted(r.id for r in read_compacted(spark, path, "day").collect())
    assert len(live) < len(full)                    # live view shrank
    assert sorted(r.id for r in read_as_of(spark, path, "day", snap2).collect()) == full

    # vacuum keeping only snap2: .gen-1 dirs (snap1-only) go; .gen-2
    # (snap2) and .gen-9 (live) stay; snap1's manifest expires
    deleted = vacuum_table(path, "day", keep_snapshots=1)
    assert deleted and all(d.endswith(".gen-1") for d in deleted)
    assert list_snapshots(path) == [snap2]
    assert sorted(r.id for r in read_as_of(spark, path, "day", snap2).collect()) == full
    assert sorted(r.id for r in read_compacted(spark, path, "day").collect()) == live
    assert vacuum_table(path, "day", keep_snapshots=1) == []  # idempotent


def test_commit_snapshot_race_first_publish_wins(spark, tmp_path):
    """The snapshot concurrency contract: two writers racing to the
    same id serialize by FIRST-PUBLISH-WINS — the manifest lands via an
    exclusive no-overwrite rename, the loser detects the collision and
    retries under the next id, and NO snapshot is ever lost.  The
    interleave: writer A lists the table (allocating base id 1), writer
    B runs a full commit_snapshot (taking id 1), then A publishes and
    must land as id 2 with ITS OWN listed state intact."""
    import json

    from pyspark.sql import functions as F

    from trimet_bytes__data_engineering_project_spark.plans.warehouse import (
        _load_snapshot,
        _publish_snapshot,
        commit_snapshot,
        list_snapshots,
    )

    path = str(tmp_path / "fact")
    spark.range(20).select(
        F.col("id"), F.lit("2024-01-01").alias("day")
    ).write.partitionBy("day").parquet(path)

    # writer A: listing done (its view of the table), publish pending
    a_mapping = {"day=2024-01-01": ""}
    # writer B: full commit wins id 1
    b_sid = commit_snapshot(path, "day")
    assert b_sid == 1
    # writer A publishes: collides on 1, retries, lands as 2
    a_sid = _publish_snapshot(path, a_mapping)
    assert a_sid == 2
    assert list_snapshots(path) == [1, 2]
    # neither manifest was overwritten: each carries its own writer's state
    assert _load_snapshot(path, 1)["snapshot_id"] == 1
    a_manifest = _load_snapshot(path, 2)
    assert a_manifest["snapshot_id"] == 2
    assert a_manifest["partitions"] == a_mapping
    # no leftover tmp objects from the losing publish attempt
    sdir = os.path.join(path, "_snapshots")
    assert not [f for f in os.listdir(sdir) if ".tmp-" in f]


def test_vacuum_skips_inflight_generation(spark, tmp_path):
    """vacuum_table never touches a generation numbered ABOVE the live
    pointer's — that is an uncommitted compaction in flight, and
    deleting it would dangle the compactor's imminent pointer commit.
    After the next commit moves the pointer past it, a crashed orphan
    at a lower number becomes reclaimable."""
    import os as _os

    from pyspark.sql import functions as F

    from trimet_bytes__data_engineering_project_spark.plans.warehouse import (
        compact_partition,
        resolve_partition_dir,
        vacuum_table,
    )

    path = str(tmp_path / "fact")
    spark.range(50).select(
        F.col("id"), F.lit("2024-01-01").alias("day")
    ).write.partitionBy("day").parquet(path)
    part = _os.path.join(path, "day=2024-01-01")

    # committed generation 1 (live pointer -> .gen-1)
    compact_partition(
        spark, path, "day", "2024-01-01", sort_cols=("id",),
        commit="pointer", vacuum=False,
    )
    live1 = resolve_partition_dir(part)
    assert _os.path.basename(live1) == ".gen-1"

    # a concurrent compaction has written .gen-2 but NOT flipped the pointer
    inflight = _os.path.join(part, ".gen-2")
    spark.read.parquet(live1).write.parquet(inflight)

    deleted = vacuum_table(path, "day", keep_snapshots=0)
    assert _os.path.isdir(inflight), "in-flight generation must survive vacuum"
    assert all(not d.endswith(".gen-2") for d in deleted)

    # the compactor dies; a LATER compaction commits .gen-3, moving the
    # pointer past the orphan — now vacuum reclaims it
    compact_partition(
        spark, path, "day", "2024-01-01", sort_cols=("id",),
        commit="pointer", vacuum=False,
    )
    assert _os.path.basename(resolve_partition_dir(part)) == ".gen-3"
    deleted2 = vacuum_table(path, "day", keep_snapshots=0)
    assert not _os.path.exists(inflight)
    assert any(d.endswith(".gen-2") for d in deleted2)


def test_read_as_of_empty_snapshot_raises(spark, tmp_path):
    """A snapshot committed on a table with zero partitions is a clear
    error at read time, not a reduce() TypeError."""
    import os as _os

    import pytest as _pytest

    from trimet_bytes__data_engineering_project_spark.plans.warehouse import (
        commit_snapshot,
        read_as_of,
    )

    path = str(tmp_path / "fact")
    _os.makedirs(path)
    sid = commit_snapshot(path, "day")
    with _pytest.raises(ValueError, match="zero partitions"):
        read_as_of(spark, path, "day", sid)


def test_compact_vacuum_spares_snapshot_referenced_fileset(spark, tmp_path):
    """compact_partition(vacuum=True) must NOT delete a superseded
    fileset a retained snapshot manifest still references — deleting it
    would dangle read_as_of.  Once the manifest expires, the next
    compaction's vacuum reclaims as usual."""
    import os as _os

    from pyspark.sql import functions as F

    from trimet_bytes__data_engineering_project_spark.plans.warehouse import (
        commit_snapshot,
        compact_partition,
        read_as_of,
        vacuum_table,
    )

    path = str(tmp_path / "fact")
    spark.range(60).select(
        F.col("id"), F.lit("2024-01-01").alias("day")
    ).write.partitionBy("day").parquet(path)
    part = _os.path.join(path, "day=2024-01-01")
    before = sorted(r.id for r in spark.read.parquet(part).collect())

    # snapshot pins generation 0 (the loose files)
    sid = commit_snapshot(path, "day")

    # default vacuum=True compaction: loose files must SURVIVE
    compact_partition(spark, path, "day", "2024-01-01", sort_cols=("id",), commit="pointer")
    loose = [f for f in _os.listdir(part) if f.endswith(".parquet")]
    assert loose, "snapshot-referenced generation 0 was vacuumed away"
    assert sorted(r.id for r in read_as_of(spark, path, "day", sid).collect()) == before

    # expire the manifest; the next compaction's vacuum now reclaims
    # its superseded source (.gen-1) as usual
    vacuum_table(path, "day", keep_snapshots=0)
    gen1 = _os.path.join(part, ".gen-1")
    assert _os.path.isdir(gen1)
    compact_partition(spark, path, "day", "2024-01-01", sort_cols=("id",), commit="pointer")
    assert not _os.path.exists(gen1)


def test_corrupt_pointer_fails_loudly(spark, tmp_path):
    """Round-10 close finding (782e08e), pinned per the r10 verdict: a
    ._current pointer that cannot be honored raises CorruptPointerError
    — garbage generation name, missing generation, or a generation
    lacking _SUCCESS — because the silent fallback it replaced read the
    loose generation-0 files, which may have been vacuumed (a corrupt
    pointer must never masquerade as an empty/stale partition)."""
    import os as _os

    import pytest as _pytest

    from pyspark.sql import functions as F

    from trimet_bytes__data_engineering_project_spark.plans.warehouse import (
        CorruptPointerError,
        read_compacted,
        resolve_partition_dir,
    )
    from trimet_bytes__data_engineering_project_spark.streaming.hadoopfs import (
        fs_write_text_atomic,
    )

    path = str(tmp_path / "fact")
    spark.range(10).select(
        F.col("id"), F.lit("2024-01-01").alias("day")
    ).write.partitionBy("day").parquet(path)
    part = _os.path.join(path, "day=2024-01-01")
    ptr = _os.path.join(part, "._current")

    # garbage generation name → the pointer object itself is corrupt
    fs_write_text_atomic(ptr, "../../../etc", spark)
    with _pytest.raises(CorruptPointerError, match="not a valid"):
        resolve_partition_dir(part)
    # ... and the loud error propagates through the table-level reader
    with _pytest.raises(CorruptPointerError, match="not a valid"):
        read_compacted(spark, path, "day")

    # pointer names a generation that exists but lacks _SUCCESS — a
    # truncated/foreign fileset, NOT a commit-protocol crash state (the
    # pointer flips only after _SUCCESS lands)
    gen = _os.path.join(part, ".gen-5")
    spark.read.parquet(part).write.parquet(gen)
    _os.remove(_os.path.join(gen, "_SUCCESS"))
    fs_write_text_atomic(ptr, ".gen-5", spark)
    with _pytest.raises(CorruptPointerError, match="lacks _SUCCESS"):
        resolve_partition_dir(part)

    # absent pointer stays the healthy generation-0 read path
    from trimet_bytes__data_engineering_project_spark.streaming.hadoopfs import (
        fs_delete,
    )

    fs_delete(ptr, recursive=False, spark=spark)
    assert resolve_partition_dir(part) == part


def test_swap_commit_checked_rename_raises_not_silent(spark, tmp_path):
    """Round-10 advice (warehouse.py:317): Hadoop FileSystem.rename /
    delete report failure as a False return, not an exception — the
    swap branch must check each step and raise, never return the old
    file count as if compaction succeeded.  Pinned by failing the
    FIRST rename via a monkeypatched fs_rename (deterministic across
    local-FS rename-semantics variants)."""
    import os as _os

    import pytest as _pytest

    from pyspark.sql import functions as F

    from trimet_bytes__data_engineering_project_spark.plans import warehouse as wh

    path = str(tmp_path / "fact")
    spark.range(10).select(
        F.col("id"), F.lit("2024-01-01").alias("day")
    ).write.partitionBy("day").parquet(path)
    part = _os.path.join(path, "day=2024-01-01")
    before = sorted(r.id for r in spark.read.parquet(part).collect())

    real_rename = wh.fs_rename if hasattr(wh, "fs_rename") else None
    assert real_rename is None  # fs_rename is imported inside the function

    import trimet_bytes__data_engineering_project_spark.streaming.hadoopfs as hfs

    orig = hfs.fs_rename
    calls = []

    def failing_rename(src, dst, spark_arg=None):
        calls.append((src, dst))
        return False  # e.g. a leftover .compact-old-* blocks the rename

    hfs.fs_rename = failing_rename
    try:
        with _pytest.raises(IOError, match="rename failed"):
            wh.compact_partition(spark, path, "day", "2024-01-01", sort_cols=("id",))
    finally:
        hfs.fs_rename = orig
    assert len(calls) == 1, "must abort at the FIRST failed rename"
    # the partition is untouched (old fileset intact and readable)
    assert sorted(r.id for r in spark.read.parquet(part).collect()) == before
    # recovery sweep clears the orphaned .compact-new-* work dir
    wh.recover_compaction(path)
    assert not [d for d in _os.listdir(path) if d.startswith(".compact-")]


def test_publish_exclusive_real_collision_and_retry(spark, tmp_path):
    """Round-10 advice (test_warehouse.py:408): actually exercise the
    collision path — the no-overwrite rename refusing an existing
    manifest, and _publish_snapshot's sid+=1 retry loop landing on the
    next id with the loser's content preserved."""
    import json
    import os as _os

    from trimet_bytes__data_engineering_project_spark.plans import warehouse as wh
    from trimet_bytes__data_engineering_project_spark.streaming.hadoopfs import (
        fs_publish_exclusive,
        fs_read_text,
    )

    path = str(tmp_path / "fact")
    sdir = _os.path.join(path, "_snapshots")
    _os.makedirs(sdir)

    # 1. the primitive refuses to overwrite: second publish at the same
    #    path returns False and the first writer's content survives
    target = _os.path.join(sdir, "snap-1.json")
    assert fs_publish_exclusive(target, '{"writer": "A"}', spark) is True
    assert fs_publish_exclusive(target, '{"writer": "B"}', spark) is False
    assert json.loads(fs_read_text(target, spark)) == {"writer": "A"}
    assert not [f for f in _os.listdir(sdir) if ".tmp-" in f]  # loser cleaned up

    # 2. the retry loop: monkeypatch list_snapshots so the publisher's
    #    FIRST attempt targets the already-taken id 1 and must retry
    orig = wh.list_snapshots
    wh.list_snapshots = lambda p: []  # stale listing: publisher thinks table is empty
    try:
        sid = wh._publish_snapshot(path, {"day=2024-01-01": ".gen-3"})
    finally:
        wh.list_snapshots = orig
    assert sid == 2  # collided on 1, landed on 2
    assert json.loads(fs_read_text(_os.path.join(sdir, "snap-2.json"), spark)) == {
        "snapshot_id": 2,
        "partitions": {"day=2024-01-01": ".gen-3"},
    }
    assert json.loads(fs_read_text(target, spark)) == {"writer": "A"}  # untouched


def test_read_via_manifest_row_equal_to_probe_path(spark, tmp_path):
    """read_via_manifest (r10 verdict item 3): the partition→generation
    map served from ONE manifest read must produce exactly the rows the
    O(partitions) pointer-probe path (read_compacted) produces — across
    a mixed layout (compacted + never-compacted partitions), and after
    a further compact+snapshot cycle."""
    import pytest as _pytest

    from pyspark.sql import functions as F

    from trimet_bytes__data_engineering_project_spark.plans.warehouse import (
        commit_snapshot,
        compact_partition,
        read_compacted,
        read_via_manifest,
    )

    path = str(tmp_path / "fact")
    df = spark.range(90).select(
        F.col("id"),
        F.concat(F.lit("2024-01-0"), (F.col("id") % 3 + 1).cast("string")).alias("day"),
    )
    df.write.partitionBy("day").parquet(path)

    # no snapshot yet → loud error pointing at commit_snapshot
    with _pytest.raises(ValueError, match="no snapshot"):
        read_via_manifest(spark, path, "day")

    # mixed layout: one partition pointer-compacted, two loose
    compact_partition(spark, path, "day", "2024-01-01", sort_cols=("id",), commit="pointer")
    commit_snapshot(path, "day")

    probe = read_compacted(spark, path, "day")
    manifest = read_via_manifest(spark, path, "day")
    key = lambda r: (r["day"], r["id"])  # noqa: E731
    assert sorted(manifest.collect(), key=key) == sorted(probe.collect(), key=key)

    # another compaction + snapshot: the NEWEST manifest tracks it
    compact_partition(spark, path, "day", "2024-01-02", sort_cols=("id",), commit="pointer")
    commit_snapshot(path, "day")
    assert sorted(
        read_via_manifest(spark, path, "day").collect(), key=key
    ) == sorted(read_compacted(spark, path, "day").collect(), key=key)


def test_resolve_pointer_rereads_once_on_vacuum_race(spark, tmp_path):
    """Round-11 advice (warehouse.py:173): a reader that loads ._current
    just before a concurrent compaction flips it can have the superseded
    generation vacuumed between the pointer read and the existence probe
    — a HEALTHY-table state, not corruption.  The missing-generation
    branch must re-read the pointer once and retry; only a pointer that
    STILL names a vanished generation raises.  Pinned by a monkeypatched
    fs_read_text that serves the stale generation first."""
    import os as _os

    import pytest as _pytest

    from pyspark.sql import functions as F

    import trimet_bytes__data_engineering_project_spark.streaming.hadoopfs as hfs
    from trimet_bytes__data_engineering_project_spark.plans.warehouse import (
        CorruptPointerError,
        resolve_partition_dir,
    )

    path = str(tmp_path / "fact")
    spark.range(10).select(
        F.col("id"), F.lit("2024-01-01").alias("day")
    ).write.partitionBy("day").parquet(path)
    part = _os.path.join(path, "day=2024-01-01")
    gen2 = _os.path.join(part, ".gen-2")
    spark.read.parquet(part).write.parquet(gen2)  # live generation, _SUCCESS included

    orig = hfs.fs_read_text
    reads = iter([".gen-1", ".gen-2"])  # stale read, then the flipped pointer
    hfs.fs_read_text = lambda p, s=None: next(reads)
    try:
        assert resolve_partition_dir(part) == gen2
    finally:
        hfs.fs_read_text = orig

    # the pointer STILL naming the vanished generation on re-read IS corruption
    hfs.fs_read_text = lambda p, s=None: ".gen-9"
    try:
        with _pytest.raises(CorruptPointerError, match="re-read"):
            resolve_partition_dir(part)
    finally:
        hfs.fs_read_text = orig


def test_read_compacted_partition_value_anchored_and_uri_decoded(spark, tmp_path):
    """Round-11 advice (warehouse.py:221): the partition value is parsed
    from input_file_name(), so (a) an ancestor directory containing
    '<col>=' in the TABLE-ROOT PATH must not shadow the partition's own
    segment (the greedy-prefix anchor takes the LAST occurrence), and
    (b) the URI's percent-encoding must be undone — a value with a space
    arrives as %20 — while a literal '+' (legal bare in URI paths, but
    form-decoded to space by url_decode) survives."""
    import os as _os

    from pyspark.sql import functions as F

    from trimet_bytes__data_engineering_project_spark.plans.warehouse import (
        read_compacted,
    )

    # table root itself sits under a 'day=archive' ancestor directory
    root = str(tmp_path / "day=archive" / "fact")
    df = spark.range(20).select(
        F.col("id"),
        F.when(F.col("id") % 2 == 0, F.lit("2024 01+x"))
        .otherwise(F.lit("2024-01-02"))
        .alias("day"),
    )
    df.write.partitionBy("day").parquet(root)
    assert _os.path.isdir(_os.path.join(root, "day=2024 01+x"))  # on-disk form

    out = read_compacted(spark, root, "day")
    assert out.count() == 20
    vals = {r.day for r in out.select("day").distinct().collect()}
    # NOT 'archive' (ancestor shadow), NOT '2024%2001+x' (URI residue),
    # NOT '2024 01 x' (form-decoded '+')
    assert vals == {"2024 01+x", "2024-01-02"}


def test_swap_post_commit_cleanup_failure_warns_not_raises(spark, tmp_path):
    """Round-11 advice (warehouse.py:404): once BOTH swap renames have
    landed the compaction is durably committed — a failure of the
    trailing fs_delete of .compact-old-* is cleanup-only and must not be
    reported like a failed commit (a caller retrying compact_partition
    would then abort on the leftover until recover_compaction runs).
    Pinned: delete returns False → RuntimeWarning naming
    recover_compaction, the call SUCCEEDS, the compacted data serves,
    and the recovery sweep drops the leftover on its both-copies
    branch."""
    import os as _os

    import pytest as _pytest

    from pyspark.sql import functions as F

    import trimet_bytes__data_engineering_project_spark.streaming.hadoopfs as hfs
    from trimet_bytes__data_engineering_project_spark.plans import warehouse as wh

    path = str(tmp_path / "fact")
    spark.range(30).select(
        F.col("id"), F.lit("2024-01-01").alias("day")
    ).write.partitionBy("day").parquet(path)
    part = _os.path.join(path, "day=2024-01-01")
    before = sorted(r.id for r in spark.read.parquet(part).collect())

    orig = hfs.fs_delete
    hfs.fs_delete = lambda p, recursive=True, spark=None: False
    try:
        with _pytest.warns(RuntimeWarning, match="post-commit cleanup"):
            n_files = wh.compact_partition(spark, path, "day", "2024-01-01", sort_cols=("id",))
    finally:
        hfs.fs_delete = orig
    assert n_files >= 1  # the commit reported success, not an IOError
    # compacted partition serves the same rows; the leftover lingers
    assert sorted(r.id for r in spark.read.parquet(part).collect()) == before
    assert [d for d in _os.listdir(path) if d.startswith(".compact-old-")]
    # the advertised remedy clears it without touching the live data
    wh.recover_compaction(path)
    assert not [d for d in _os.listdir(path) if d.startswith(".compact-")]
    assert sorted(r.id for r in spark.read.parquet(part).collect()) == before


def test_resolve_pointer_rereads_once_on_missing_success_race(spark, tmp_path):
    """Round-12 advice (warehouse.py): a vacuum's recursive delete is
    not atomic, so a reader racing it can observe the superseded gen
    dir STILL PRESENT but its _SUCCESS already gone.  That is the same
    benign read-vs-vacuum race the missing-generation branch retries —
    the _SUCCESS probe must also re-read the pointer once, and only a
    pointer that still names the _SUCCESS-less generation raises."""
    import os as _os

    import pytest as _pytest

    from pyspark.sql import functions as F

    import trimet_bytes__data_engineering_project_spark.streaming.hadoopfs as hfs
    from trimet_bytes__data_engineering_project_spark.plans.warehouse import (
        CorruptPointerError,
        resolve_partition_dir,
    )

    path = str(tmp_path / "fact")
    spark.range(10).select(
        F.col("id"), F.lit("2024-01-01").alias("day")
    ).write.partitionBy("day").parquet(path)
    part = _os.path.join(path, "day=2024-01-01")
    gen1 = _os.path.join(part, ".gen-1")
    gen2 = _os.path.join(part, ".gen-2")
    spark.read.parquet(part).write.parquet(gen1)
    spark.read.parquet(part).write.parquet(gen2)
    # mid-vacuum state: gen-1's dir survives, its _SUCCESS is gone
    _os.remove(_os.path.join(gen1, "_SUCCESS"))

    orig = hfs.fs_read_text
    reads = iter([".gen-1", ".gen-2"])  # stale read, then the flipped pointer
    hfs.fs_read_text = lambda p, s=None: next(reads)
    try:
        assert resolve_partition_dir(part) == gen2
    finally:
        hfs.fs_read_text = orig

    # a pointer STILL naming the _SUCCESS-less generation on re-read IS
    # corruption (truncated or foreign-written fileset)
    hfs.fs_read_text = lambda p, s=None: ".gen-1"
    try:
        with _pytest.raises(CorruptPointerError, match="re-read.*_SUCCESS|_SUCCESS"):
            resolve_partition_dir(part)
    finally:
        hfs.fs_read_text = orig
