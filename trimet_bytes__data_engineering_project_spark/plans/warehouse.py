"""Warehouse layout + integration view — SURVEY.md §1.1(3,4), §2.3 J3.

The reference's warehouse is three unpartitioned PostgreSQL heap tables
plus ``trip_full_view`` (Part3/stop.sql).  Here the tables are Parquet,
and the fact tables are **partitioned by service date** — the date-
equality predicates that dominate the query corpus (P12) become
partition pruning instead of index scans, which is the design that
survives 100 TB (a day of reference-scale data is ~75 MB; at fleet
scale a day is a few hundred GB — still one prunable partition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_trip(df: DataFrame, path: str, mode: str = "append") -> None:
    """trip dimension — small (≈1,623 rows/day, BASELINE.md), unpartitioned;
    always broadcastable on the join side."""
    df.write.mode(mode).parquet(path)


def write_breadcrumb(df: DataFrame, path: str, mode: str = "append") -> None:
    """breadcrumb fact — partitioned by service_date for pruning; sorted
    within partitions by (trip_id, tstamp) so per-trip windows read
    nearly-clustered row groups."""
    (
        df.withColumn("service_date", F.to_date("tstamp"))
        .sortWithinPartitions("trip_id", "tstamp")
        .write.mode(mode)
        .partitionBy("service_date")
        .parquet(path)
    )


def write_stop_events(df: DataFrame, path: str, mode: str = "append") -> None:
    """stop_events fact — 24-column loader shape (SURVEY §1.2), partitioned
    by service_key (the only low-cardinality column queries filter on)."""
    df.write.mode(mode).partitionBy("service_key").parquet(path)


def trip_full_view(trip: DataFrame, breadcrumb: DataFrame, stop_events: DataFrame) -> DataFrame:
    """J3 — the integration view (Part3/stop.sql:45-74): trip LEFT JOIN
    breadcrumb LEFT JOIN stop_events, both on trip_id.

    The m×n fan-out per trip is the reference's documented semantics
    (SURVEY §2.3).  trip is broadcast (≪10 MB even at fleet scale); the
    two fact sides join by shuffle on trip_id — co-partitioned, so AQE
    can reuse one exchange.  Column set mirrors the view's select list
    (stop.sql:47-70): all of trip, breadcrumb's measures, and the 10
    stop-event columns the DDL view touches."""
    se_cols = [
        F.col("vehicle_number"),
        F.col("route_number"),
        F.col("direction").alias("se_direction"),
        F.col("service_key").alias("se_service_key"),
        F.col("trip_number"),
        F.col("arrive_time"),
        F.col("leave_time"),
        F.col("dwell"),
        F.col("ons"),
        F.col("offs"),
    ]
    se = stop_events.select(F.col("trip_number").cast("long").alias("se_trip_id"), *se_cols)
    return (
        F.broadcast(trip)
        .join(breadcrumb, "trip_id", "left")
        .join(se, trip["trip_id"] == se["se_trip_id"], "left")
        .drop("se_trip_id")
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str = "trip_id",
    sort: str = "tstamp",
    n_buckets: int = 16,
    mode: str = "overwrite",
) -> None:
    """Bucketed fact layout for co-located joins (SURVEY §4 shuffle row;
    brief: "bucketing for co-located joins").

    ``bucketBy(n, key)`` fixes the hash-partitioning of the table ON
    DISK, so any join or aggregation keyed on ``key`` between two
    tables bucketed with the same ``n`` needs NO exchange at read time
    — at 100 TB the fact⋈fact join (breadcrumb⋈stop_events on trip_id)
    goes from two full shuffles to zero.  ``sortBy`` clusters rows
    within each bucket so per-trip windows sort-merge cheaply.

    Bucketed tables must live in the session catalog (``saveAsTable``)
    — the bucket spec is catalog metadata, invisible to a plain
    ``.parquet(path)`` reader."""
    (
        df.write.mode(mode)
        .bucketBy(n_buckets, key)
        .sortBy(key, sort)
        .format("parquet")
        .saveAsTable(table)
    )


def _pointer_path(part_dir: str) -> str:
    import os

    return os.path.join(part_dir, "._current")


class CorruptPointerError(IOError):
    """A ``._current`` pointer that cannot be honored — garbage
    generation name, or a named generation that is missing/incomplete.

    The pointer protocol makes every such state abnormal (the pointer
    flips only AFTER the generation's fileset, including ``_SUCCESS``,
    has landed; vacuum never deletes the live pointer's generation), so
    the read path fails LOUDLY instead of silently degrading to the
    loose generation-0 files — which may have been vacuumed, turning a
    corrupt pointer into silent data loss (BENCH_NOTES finding,
    round-10 close 782e08e)."""


def resolve_partition_dir(part_dir: str) -> str:
    """The directory a pointer-committed partition's CURRENT fileset
    lives in: the generation named by ``._current`` if the pointer
    exists, else the partition directory itself (the loose appended
    files, "generation 0").  This is the read path for pointer-
    committed tables — one metadata read, never a listing race.

    FAIL-LOUD CONTRACT (pinned in tests/test_warehouse.py): a pointer
    that exists but cannot be honored raises :class:`CorruptPointerError`
    rather than silently falling back —

    - garbage generation name (not ``.gen-<digits>``): the pointer
      object itself is corrupt;
    - named generation directory absent: vacuum raced past the live
      pointer, or external deletion;
    - named generation present but ``_SUCCESS`` absent: a truncated /
      foreign-written fileset — the commit protocol flips the pointer
      only after the write (including ``_SUCCESS``) completes, so no
      crash point of compact_partition produces this state.

    A genuinely in-flight compaction is NEVER pointed at (its hidden
    ``.gen-<n>`` is numbered above the pointer and invisible until the
    flip), so on a healthy table none of the three raises fires —
    with ONE read-side race handled here rather than raised: a reader
    that loads ``._current`` just before a concurrent compaction flips
    it can see the superseded generation vacuumed between the pointer
    read and the existence probe (pointer reads are not transactional
    with the fileset probe).  On the missing-generation branch — and
    equally on the missing-``_SUCCESS`` branch, since a vacuum's
    recursive delete is not atomic and can remove ``_SUCCESS`` before
    the dir itself vanishes — the pointer is therefore RE-READ once and
    resolution retried; only a pointer that STILL names the vanished or
    ``_SUCCESS``-less generation is corruption (round-11/12 advice —
    the retry distinguishes the benign read-vs-vacuum race from real
    pointer damage).

    All probes go through the Hadoop FileSystem API
    (streaming/hadoopfs.py), so the pointer is answered by the SAME
    filesystem the commit wrote to — an ``os.path`` probe against an
    HDFS/S3A table root would silently read "absent" and fall back to
    the stale generation-0 files (the exact failure class the
    streaming state stores fixed in round 7)."""
    import os
    import re

    from ..streaming.hadoopfs import fs_exists, fs_read_text

    spark = None
    for attempt in (0, 1):
        gen = fs_read_text(_pointer_path(part_dir))
        if gen is None:
            return part_dir
        gen = gen.strip()
        if not re.fullmatch(r"\.gen-\d+", gen):
            raise CorruptPointerError(
                f"{_pointer_path(part_dir)} names {gen!r}, which is not a "
                "valid .gen-<n> generation — the pointer object is corrupt; "
                "refusing to silently read the loose generation-0 files "
                "(they may have been vacuumed)"
            )
        gen_dir = os.path.join(part_dir, gen)
        spark = spark or _active_session()
        if not fs_exists(spark, gen_dir):
            if attempt == 0:
                # benign race: the generation we read was superseded and
                # vacuumed between the pointer read and this probe — a
                # fresh pointer read names the new live generation.
                continue
            raise CorruptPointerError(
                f"{_pointer_path(part_dir)} names {gen} (after a pointer "
                "re-read), but that generation directory does not exist — "
                "vacuum raced past the live pointer or the fileset was "
                "externally deleted; refusing to silently read the loose "
                "generation-0 files"
            )
        if not fs_exists(spark, os.path.join(gen_dir, "_SUCCESS")):
            if attempt == 0:
                # same benign race as the missing-generation branch: a
                # vacuum's recursive delete is not atomic, so a reader
                # can observe the superseded gen dir still present with
                # its _SUCCESS already gone.  Re-read the pointer once;
                # only a pointer that STILL names the _SUCCESS-less
                # generation is corruption (round-12 advice).
                continue
            raise CorruptPointerError(
                f"{_pointer_path(part_dir)} names {gen} (after a pointer "
                "re-read), but the generation lacks _SUCCESS — the commit "
                "protocol flips the pointer only after the fileset "
                "(including _SUCCESS) lands, so this is a truncated or "
                "foreign-written generation, not a mid-compaction or mid-"
                "vacuum state; refusing to silently fall back"
            )
        return gen_dir


def _active_session():
    from pyspark.sql import SparkSession

    s = SparkSession.getActiveSession()
    if s is None:
        raise RuntimeError(
            "warehouse pointer/manifest operations need an active "
            "SparkSession (filesystem probes run through the Hadoop FS API)"
        )
    return s


def _read_resolved_dirs(
    spark: SparkSession, resolved_dirs: list[str], partition_col: str
) -> DataFrame:
    """ONE multi-path parquet read over the resolved generation dirs,
    with the partition value re-attached by parsing the ``col=value``
    path segment out of each row's file path (JVM-side regexp over
    ``input_file_name`` — same escaped-dir-name string the old
    per-partition ``lit()`` attached).

    Why one read and not a union: a 200-way ``unionByName`` of 200
    separately-constructed parquet relations pays 200 driver-side
    schema reads plus an optimizer pass over a 200-leaf plan — measured
    ~12 s of pure plan construction at 200 partitions (BENCH_NOTES,
    round 11).  One relation over N dirs lists files in one
    (distributable) job and plans in O(1) — the shape that survives
    10k-partition tables.

    Schema-drift contract (changed vs the pre-r11 union, noted per
    round-11 advice): one multi-path relation takes its schema from a
    sampled footer, so a column missing from some generation's files is
    silently null-filled where the old per-partition ``unionByName``
    failed loudly on the mismatch.  Engine-written tables have uniform
    schemas (compact_partition rewrites whole filesets), so drift here
    means EXTERNAL writes — validate those upstream (P16/P17) or read
    them through sources.read_evolved, whose mergeSchema sweep rejects
    type conflicts loudly."""
    import re

    # Greedy '.*/' prefix anchors the match to the LAST '<col>=' path
    # segment — an ancestor directory in the table-root path containing
    # '<col>=' must not shadow the partition's own segment (round-11
    # advice); nothing deeper can match because the remaining segments
    # are '.gen-<n>' and 'part-*.parquet'.
    pattern = f".*/{re.escape(partition_col)}=([^/]+)"
    raw = F.regexp_extract(F.input_file_name(), pattern, 1)
    # input_file_name() returns a URI, so the on-disk directory name
    # arrives percent-encoded (space→%20; Spark's own %XX partition
    # escapes re-encoded, %3A→%253A).  ONE percent-decode recovers
    # exactly the on-disk 'col=value' segment — the same escaped-dir-
    # name string the pre-r11 per-partition lit() attached.  url_decode
    # alone is form-decoding ('+'→space), so literal '+' — which URI
    # path encoding leaves bare — is protected as %2B first.
    value = F.url_decode(F.regexp_replace(raw, r"\+", "%2B"))
    return spark.read.parquet(*resolved_dirs).withColumn(partition_col, value)


def read_compacted(spark: SparkSession, path: str, partition_col: str) -> DataFrame:
    """Read a (possibly pointer-compacted) partitioned table: each
    partition resolves through :func:`resolve_partition_dir`, then ONE
    multi-path read covers all resolved filesets.  On a plain
    never-compacted layout this reads exactly what
    ``spark.read.parquet(path)`` reads.

    Scale note: the per-partition pointer probe is driver-side
    O(partitions) at ~5.4 ms each — fine for day-partitioned tables
    (≤ thousands of partitions); past that, :func:`read_via_manifest`
    serves the same map from ONE snapshot-manifest read (the
    transaction-log move table formats industrialize)."""
    import os

    from ..streaming.hadoopfs import fs_list_entries

    prefix = f"{partition_col}="
    parts = sorted(
        d for d, is_dir in fs_list_entries(path, spark)
        if d.startswith(prefix) and is_dir
    )
    if not parts:
        raise ValueError(
            f"{path} has no {partition_col}= partition directories to read"
        )
    dirs = [resolve_partition_dir(os.path.join(path, d)) for d in parts]
    return _read_resolved_dirs(spark, dirs, partition_col)


def _checked(ok: bool, op: str, src: str, dst: str | None = None) -> None:
    """Hadoop FileSystem.rename/delete signal failure by returning
    False, not raising (unlike the os.rename/shutil.rmtree they
    replaced) — an unchecked False on the swap path would leave the
    partition uncompacted while reporting success (round-10 advice)."""
    if not ok:
        target = f"{src} -> {dst}" if dst else src
        raise IOError(f"filesystem {op} failed: {target}")


def recover_compaction(path: str) -> None:
    """Crash-recovery sweep for swap-committed compactions: restore any
    partition whose directory vanished mid-swap (its ``.compact-old-*``
    sibling survives) and drop leftover hidden work dirs.  Idempotent;
    run before reads after an unclean shutdown."""
    import os

    from ..streaming.hadoopfs import fs_delete, fs_exists, fs_list, fs_rename

    spark = _active_session()
    for d in fs_list(path):
        full = os.path.join(path, d)
        if d.startswith(".compact-old-"):
            orig = os.path.join(path, d[len(".compact-old-"):])
            if not fs_exists(spark, orig):
                _checked(fs_rename(full, orig), "rename", full, orig)
            else:
                _checked(fs_delete(full), "delete", full)  # crash before rmtree: both copies exist
        elif d.startswith(".compact-new-"):
            _checked(fs_delete(full), "delete", full)  # never committed


def compact_partition(
    spark: SparkSession,
    path: str,
    partition_col: str,
    partition_value: str,
    target_rows_per_file: int = 1_000_000,
    sort_cols: tuple[str, ...] = ("trip_id", "tstamp"),
    commit: str = "swap",
    vacuum: bool = True,
) -> int:
    """Small-file compaction for one partition of a written fact table —
    the maintenance job every streaming-append layout needs: micro-batch
    appends leave O(batches) small files per day-partition, and at fleet
    scale an uncompacted day degrades every scan (footer-read per file,
    no row-group locality).

    Rewrites ``path/partition_col=value`` as ``ceil(rows / target)``
    files, re-sorted by ``sort_cols`` so windows read clustered row
    groups again.  Returns the number of files after compaction.

    All work dirs use hidden basenames (leading ``.``), which Spark's
    file listing and partition discovery skip — an in-progress or
    crashed compaction is never visible to a reader of the table root
    (no duplicated rows, no mixed-type partition inference).

    Two commit protocols:

    - ``commit="swap"`` (default; **local/HDFS only**): the finished
      fileset replaces the partition directory via two ``os.rename``
      calls.  Plain ``spark.read.parquet(path)`` readers keep working
      unchanged.  Contract: POSIX/HDFS atomic rename — NOT object
      stores (S3/GCS have no directory rename).  There is a
      microseconds-wide window between the two renames where the
      partition directory is absent; a crash inside it is repaired by
      :func:`recover_compaction` (the surviving ``.compact-old-*`` dir
      is the intact original).
    - ``commit="pointer"`` (**object-store-safe**): the fileset is
      written to a hidden generation dir ``.gen-<n>/`` and committed by
      atomically writing the single pointer file ``._current`` — a
      one-object PUT, atomic on every store.  Nothing visible is ever
      renamed or deleted mid-flight, so a reader resolving through
      :func:`resolve_partition_dir` / :func:`read_compacted` sees the
      complete old fileset until the pointer flips and the complete new
      one after; superseded generations are vacuumed only after the
      commit.  (This is the manifest-commit idea table formats
      industrialize; see ``read_compacted`` for the scale contract.)
    """
    import math
    import os

    from ..streaming.hadoopfs import (
        fs_delete,
        fs_list,
        fs_rename,
        fs_write_text_atomic,
    )

    part_dir = os.path.join(path, f"{partition_col}={partition_value}")
    src_dir = resolve_partition_dir(part_dir) if commit == "pointer" else part_dir
    df = spark.read.parquet(src_dir)
    n_rows = df.count()
    n_files = max(1, math.ceil(n_rows / target_rows_per_file))
    compacted = df.repartition(n_files).sortWithinPartitions(
        *[c for c in sort_cols if c in df.columns]
    )

    if commit == "pointer":
        # SINGLE WRITER PER PARTITION: two concurrent compactions of the
        # same partition can allocate the same .gen-<n> (the listing is
        # not a lock) — serialize compaction per partition externally
        # (the maintenance-scheduler contract).  Readers, snapshot
        # commits, and vacuum_table are all safe to run concurrently
        # with ONE in-flight compaction: the new generation stays
        # invisible until the pointer flips and vacuum skips generations
        # newer than the live pointer.
        gens = [
            int(d[len(".gen-"):])
            for d in fs_list(part_dir, spark)
            if d.startswith(".gen-") and d[len(".gen-"):].isdigit()
        ]
        new_gen = f".gen-{max(gens, default=0) + 1}"
        new_dir = os.path.join(part_dir, new_gen)
        compacted.write.mode("overwrite").parquet(new_dir)  # hidden: invisible until commit
        # the commit: one atomic single-object write of the pointer
        fs_write_text_atomic(_pointer_path(part_dir), new_gen, spark)
        # post-commit vacuum of superseded filesets (best-effort; a crash
        # here leaves only already-invisible-to-resolve garbage).
        # vacuum=False RETAINS superseded generations — the snapshot /
        # time-travel mode: reads still resolve through the pointer, and
        # reclamation moves to vacuum_table(), which only deletes
        # generations no retained snapshot references.  Even with
        # vacuum=True the superseded fileset survives when a RETAINED
        # snapshot manifest still references it — deleting it would
        # dangle read_as_of; its reclamation moves to vacuum_table()
        # once the manifest expires.
        if vacuum and not _snapshot_references(
            path, os.path.basename(part_dir),
            "" if src_dir == part_dir else os.path.basename(src_dir),
        ):
            if src_dir == part_dir:  # generation 0: the loose appended files
                for f in fs_list(part_dir, spark):
                    if not f.startswith((".", "_")):
                        fs_delete(os.path.join(part_dir, f), recursive=False)
            else:
                fs_delete(src_dir)
        final_dir = new_dir
    elif commit == "swap":
        value_tag = os.path.basename(part_dir)
        new_dir = os.path.join(path, f".compact-new-{value_tag}")
        old_dir = os.path.join(path, f".compact-old-{value_tag}")
        compacted.write.mode("overwrite").parquet(new_dir)
        # each rename checked: a False return (e.g. a leftover
        # .compact-old-* from an unrecovered crash blocking the rename)
        # must abort loudly, not report the old file count as success
        _checked(fs_rename(part_dir, old_dir), "rename", part_dir, old_dir)
        _checked(fs_rename(new_dir, part_dir), "rename", new_dir, part_dir)
        # the second rename COMMITS the swap — a delete failure past
        # this point is cleanup-only (the compaction is durable, only
        # the superseded .compact-old-* lingers), so it must not be
        # reported identically to a failed commit: warn and succeed,
        # advising recover_compaction, which deletes the leftover on
        # its both-copies-exist branch (round-11 advice).
        if not fs_delete(old_dir):
            import warnings

            warnings.warn(
                f"compaction of {part_dir} committed, but post-commit "
                f"cleanup of {old_dir} failed — run recover_compaction("
                f"{path!r}) to drop the superseded fileset",
                RuntimeWarning,
                stacklevel=2,
            )
        final_dir = part_dir
    else:
        raise ValueError(f"unknown commit protocol: {commit!r}")
    return len([f for f in fs_list(final_dir, spark) if f.endswith(".parquet")])


def register_warehouse(spark: SparkSession, trip_path: str, breadcrumb_path: str) -> None:
    """Register the tables + view in the session catalog so the SQL
    surface (spark.sql over trip/breadcrumb/trip_full_view) matches the
    reference's Postgres catalog."""
    spark.read.parquet(trip_path).createOrReplaceTempView("trip")
    spark.read.parquet(breadcrumb_path).createOrReplaceTempView("breadcrumb")
    spark.sql(
        """
        CREATE OR REPLACE TEMP VIEW trip_breadcrumb_view AS
        SELECT t.*, b.tstamp, b.latitude, b.longitude, b.speed
        FROM trip t LEFT JOIN breadcrumb b USING (trip_id)
        """
    )


def load_audit(tables: dict[str, DataFrame]) -> dict[str, int]:
    """S10 — post-load row-count probe (Part2/updated_subscriber.py:208-224):
    the received/inserted/total reconciliation the reference prints per
    run.  ``count()`` is a metadata-only parquet scan (row-group stats),
    so auditing a 100 TB table reads footers, not data."""
    return {name: df.count() for name, df in tables.items()}


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    broadcast_keys: bool = True,
) -> DataFrame:
    """MERGE-shaped upsert as a declarative plan — ``WHEN MATCHED THEN
    UPDATE, WHEN NOT MATCHED THEN INSERT`` semantics plain parquet
    tables lack (the reference's COPY aborts on PK collision, SURVEY
    §2.9 T3; Delta/Iceberg ship this as a table service, this is the
    engine-level equivalent used to rewrite a partition or a table):
    every key present in ``updates`` takes the update row, every other
    base row survives unchanged.

    ``updates`` must be key-unique (the caller dedups a multi-version
    batch first — e.g. ``functions.windows.first_row_per_key``);
    schemas must match.

    Scale shape: one LEFT ANTI join of base against the update keys (on
    the key columns only) plus a union — base rows stream through
    untouched, nothing is shuffled unless the anti join needs it.
    ``broadcast_keys=True`` (default) force-hints the key set, right
    for the typical daily batch whose distinct keys fit an executor;
    pass ``False`` for a backfill-sized batch so AQE picks a shuffled
    (or, on a key-partitioned layout, co-located) anti join instead of
    failing the broadcast size limit.  Combined with
    ``compact_partition``'s commit protocols this is the rewrite step
    of a keyed table service."""
    keys = updates.select(*key_cols).distinct()
    if broadcast_keys:
        keys = F.broadcast(keys)
    survivors = base.join(keys, key_cols, "left_anti")
    return updates.unionByName(survivors)


def snapshot_diff(
    old: DataFrame, new: DataFrame, id_col: str, content_cols: list[str]
) -> DataFrame:
    """Corpus version diff: (id, status) for the union of two corpus
    snapshots, status in {added, removed, changed, unchanged} by
    content digest — the read-side complement of :func:`merge_upsert`
    (MERGE writes a new version; this audits what a landed version
    changed — the ingest-regression / data-versioning check run
    before a new crawl batch replaces the old).

    Scale shape: digests are computed in each scan's project (md5 over
    a unit-separator concat of the content columns — the join carries
    (id, 32-hex) rows, never document text), and the single shuffle is
    the full-outer id join; on an id-bucketed warehouse layout
    (write_bucketed) both sides are co-located and even that shuffle
    disappears.  NULL content columns digest as empty (coalesce) —
    a NULL->'x' edit counts as changed, NULL->NULL as unchanged."""
    def dig(df: DataFrame) -> F.Column:
        return F.md5(
            F.concat_ws(
                "\x1f", *[F.coalesce(F.col(c).cast("string"), F.lit("")) for c in content_cols]
            )
        )

    ho = old.select(F.col(id_col).alias("_id"), dig(old).alias("h_old"))
    hn = new.select(F.col(id_col).alias("_id"), dig(new).alias("h_new"))
    j = ho.join(hn, "_id", "full_outer")
    status = (
        F.when(F.col("h_old").isNull(), F.lit("added"))
        .when(F.col("h_new").isNull(), F.lit("removed"))
        .when(F.col("h_old") != F.col("h_new"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select(F.col("_id").alias(id_col), status.alias("status"))


# ----------------------------------------------------------------------
# Snapshot layer over the pointer-commit protocol — the Iceberg idea in
# miniature: a table-level SNAPSHOT is one immutable manifest object
# (snapshots/snap-<n>.json) mapping every partition to the generation
# dir that was current when the snapshot committed.  Manifests are
# written whole to a temp name and os.replace'd — a one-object atomic
# PUT on any store, same contract as the ._current pointer.  Reads "AS
# OF" a snapshot resolve through the manifest instead of the live
# pointers, so a reader pinned to snapshot N is untouched by any number
# of later compactions; vacuum_table() reclaims only generations that
# NO retained snapshot (and no live pointer) references — the
# time-travel / retention lifecycle table formats industrialize.
#
# Filesystem contract: same as the pointer protocol it extends — these
# helpers drive the driver-local filesystem (open/os.listdir), which is
# where the compacted fixtures live in this repo.  On HDFS/S3A the port
# point is mechanical: every probe/list/PUT here maps 1:1 onto the
# Hadoop FileSystem API (streaming/hadoopfs.py holds the exists/list
# helpers; atomic single-object PUT is create+rename there), and the
# PROTOCOL itself is object-store-safe by design — nothing visible is
# renamed or deleted mid-flight, commits are one-object writes.
# ----------------------------------------------------------------------


def _snapshot_dir(path: str) -> str:
    import os

    return os.path.join(path, "_snapshots")


def _snapshot_references(path: str, part_name: str, gen: str) -> bool:
    """True when ANY existing snapshot manifest maps ``part_name`` to
    generation ``gen`` (`""` = the loose generation-0 files) — the
    compact-time guard that keeps read_as_of from dangling."""
    for sid in list_snapshots(path):
        if _load_snapshot(path, sid)["partitions"].get(part_name) == gen:
            return True
    return False


def commit_snapshot(path: str, partition_col: str) -> int:
    """Record the table's CURRENT per-partition generations as the next
    snapshot; returns its id.  One listing + one atomic manifest write —
    no data moves.

    CONCURRENCY CONTRACT (pinned in tests/test_warehouse.py): snapshot
    ids are allocated by FIRST-PUBLISH-WINS — the manifest lands via an
    exclusive no-overwrite rename, so when two writers race to the same
    id the loser detects the collision and retries under the next id.
    No snapshot is ever silently overwritten; concurrent commits
    serialize into consecutive ids (each capturing the table state its
    writer listed — standard snapshot-isolation semantics, the same
    promise Iceberg's optimistic commit makes before it adds conflict
    *validation*)."""
    mapping = _current_generations(path, partition_col)
    return _publish_snapshot(path, mapping)


def _current_generations(path: str, partition_col: str) -> dict[str, str]:
    import os

    from ..streaming.hadoopfs import fs_list_entries

    prefix = f"{partition_col}="
    mapping = {}
    for d, is_dir in sorted(fs_list_entries(path)):
        if not (d.startswith(prefix) and is_dir):
            continue
        part_dir = os.path.join(path, d)
        resolved = resolve_partition_dir(part_dir)
        mapping[d] = os.path.basename(resolved) if resolved != part_dir else ""
    return mapping


def _publish_snapshot(path: str, mapping: dict[str, str]) -> int:
    """Allocate the next id and publish the manifest exclusively,
    retrying on id collision (the commit_snapshot race path — split out
    so the interleaving test can drive two pre-listed writers)."""
    import json
    import os

    from ..streaming.hadoopfs import fs_mkdirs, fs_publish_exclusive

    sdir = _snapshot_dir(path)
    fs_mkdirs(sdir)
    sid = max(list_snapshots(path), default=0) + 1
    while True:
        body = json.dumps({"snapshot_id": sid, "partitions": mapping})
        if fs_publish_exclusive(os.path.join(sdir, f"snap-{sid}.json"), body):
            return sid
        sid += 1  # a concurrent writer won this id; take the next


def _load_snapshot(path: str, snapshot_id: int) -> dict:
    import json
    import os

    from ..streaming.hadoopfs import fs_read_text

    text = fs_read_text(os.path.join(_snapshot_dir(path), f"snap-{snapshot_id}.json"))
    if text is None:
        raise FileNotFoundError(
            f"snapshot {snapshot_id} of {path} does not exist (expired or never committed)"
        )
    return json.loads(text)


def list_snapshots(path: str) -> list[int]:
    from ..streaming.hadoopfs import fs_list

    return sorted(
        int(f[len("snap-"):-len(".json")])
        for f in fs_list(_snapshot_dir(path))
        if f.startswith("snap-") and f.endswith(".json")
    )


def read_as_of(
    spark: SparkSession, path: str, partition_col: str, snapshot_id: int
) -> DataFrame:
    """Time-travel read: the table exactly as snapshot ``snapshot_id``
    recorded it — each partition reads the manifest's generation dir
    (or its loose files for generation 0), untouched by any compaction
    committed since.  One manifest read + one multi-path parquet read —
    NO per-partition pointer probes (the manifest already holds the
    map), so the metadata cost is O(1) in partition count."""
    import os

    snap = _load_snapshot(path, snapshot_id)
    if not snap["partitions"]:
        raise ValueError(
            f"snapshot {snapshot_id} of {path} records zero partitions — "
            "it was committed on an empty table; nothing to read"
        )
    dirs = [
        os.path.join(path, d, gen) if gen else os.path.join(path, d)
        for d, gen in sorted(snap["partitions"].items())
    ]
    return _read_resolved_dirs(spark, dirs, partition_col)


def read_via_manifest(
    spark: SparkSession, path: str, partition_col: str
) -> DataFrame:
    """Current-table read whose partition→generation map comes from the
    NEWEST snapshot manifest — ONE metadata object read — instead of
    read_compacted's per-partition pointer probes.

    Why it exists (round-10 close, 2030a1a): the FS-API probe costs
    ~5.4 ms/partition (pointer read + _SUCCESS check), so the listing
    path is linear in partition count — fine for day-partitioned tables
    (≤ thousands of partitions, ~1 s at 200), but past day-partition
    cardinality (hour partitions, multi-year retention, nested keys)
    the resolve itself dominates.  The snapshot manifest is already one
    atomic object holding the full map; serving reads from it makes the
    metadata cost O(1) in partition count — the same move Iceberg/Delta
    make by reading a transaction log instead of listing.

    CURRENCY CONTRACT: the manifest is authoritative only when a
    snapshot was committed AFTER the last layout change (compaction or
    new-partition append) — the maintenance-scheduler convention this
    warehouse already runs (compact → commit_snapshot).  A read between
    a compaction and its snapshot serves the pre-compaction generations
    (still complete and un-vacuumed — vacuum retains snapshot-referenced
    filesets), i.e. a consistent slightly-stale view, never a torn one.
    Tables with no snapshot raise — commit one first.

    Pinned row-equal to read_compacted in tests/test_warehouse.py;
    measured at 200 partitions in BENCH_NOTES.md."""
    snaps = list_snapshots(path)
    if not snaps:
        raise ValueError(
            f"{path} has no snapshot manifest to read through — run "
            "commit_snapshot() first (read_compacted is the probe-path "
            "alternative for never-snapshotted tables)"
        )
    return read_as_of(spark, path, partition_col, snaps[-1])


def vacuum_table(path: str, partition_col: str, keep_snapshots: int = 2) -> list[str]:
    """Reclaim generation dirs referenced by NEITHER a live pointer NOR
    one of the newest ``keep_snapshots`` manifests; expire older
    manifests.  Returns the deleted paths.  Crash-safe by the same
    argument as the commit path: only hidden ``.gen-*`` dirs invisible
    to resolve are ever deleted, the live pointer's generation is
    always retained, and a re-run after any crash point deletes only
    what remains unreferenced (idempotent).

    Safe to run CONCURRENTLY with one in-flight compaction: a
    generation numbered ABOVE the live pointer's is an in-progress (or
    crashed) compaction that has not committed yet, and vacuum skips it
    — deleting it would dangle the compactor's imminent pointer flip.
    A crashed generation is reclaimed on the vacuum after the NEXT
    successful commit moves the pointer past its number (pinned in
    tests/test_warehouse.py)."""
    import os

    from ..streaming.hadoopfs import fs_delete, fs_list, fs_list_entries

    snaps = list_snapshots(path)
    keep_ids = set(snaps[-keep_snapshots:]) if keep_snapshots > 0 else set()
    referenced: set[str] = set()
    for sid in keep_ids:
        snap = _load_snapshot(path, sid)
        for d, gen in snap["partitions"].items():
            if gen:
                referenced.add(os.path.join(path, d, gen))
    deleted: list[str] = []
    prefix = f"{partition_col}="
    for d, is_dir in sorted(fs_list_entries(path)):
        part_dir = os.path.join(path, d)
        if not (d.startswith(prefix) and is_dir):
            continue
        live = resolve_partition_dir(part_dir)
        live_num = (
            int(os.path.basename(live)[len(".gen-"):]) if live != part_dir else 0
        )
        for g in sorted(fs_list(part_dir)):
            gen_dir = os.path.join(part_dir, g)
            if not (g.startswith(".gen-") and g[len(".gen-"):].isdigit()):
                continue
            if int(g[len(".gen-"):]) > live_num:
                continue  # uncommitted compaction in flight — never touch
            if gen_dir != live and gen_dir not in referenced:
                fs_delete(gen_dir)
                deleted.append(gen_dir)
    for sid in snaps:
        if sid not in keep_ids:
            fs_delete(
                os.path.join(_snapshot_dir(path), f"snap-{sid}.json"),
                recursive=False,
            )
    return deleted
