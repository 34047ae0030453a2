"""Sources — SURVEY.md §2.1 (S1-S9).

The reference's ingest is driver-process Python: per-vehicle HTTP GETs
written to JSON landing files (``Part1/data_gather.py:46-59``), an HTML
scrape parsed with string splitting (``Part3/stop_event_publisher.py:
54-71``), and psycopg2 COPY loads.  The Spark-side equivalents here read
the *landing* formats; network fetch stays a thin driver-side step (or a
``mapInPandas`` fan-out over the id list at scale) and is out of the
engine's query path.
"""

from __future__ import annotations

import re
import sys
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import BREADCRUMB_RAW, STOP_EVENT_COLUMNS, STOP_EVENT_RAW


def _pickle_module_by_value(module_name: str) -> None:
    """Ship this module's code inside UDF closures instead of by import
    reference.  Spark's Python workers don't share the driver's
    ``sys.path`` mutations, so a ``mapInPandas`` closure that references
    this (non-installed) package would fail to unpickle on workers when
    the driver was launched from a foreign cwd.  By-value registration
    makes the closure self-contained — the local-mode equivalent of
    shipping the package with ``--py-files``."""
    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[module_name])


def load_driver_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    """Read driver-generated parquet tables (TESTDATA.md) by name."""
    return {n: spark.read.parquet(f"{sf_dir}/{n}.parquet") for n in names}


def read_breadcrumb_json(spark: SparkSession, path: str) -> DataFrame:
    """S1/S4 landing read — schema-enforced JSON scan of the per-vehicle
    breadcrumb files (``bus_{vid}_{date}.json``, Part1/data_gather.py:53-55).

    Explicit schema: no inference pass over 100 TB of JSON, and drift
    surfaces as NULL columns instead of silent shape changes.  Spark
    reads .gz/.zip-member files natively, so the reference's archive
    round-trip (Part1/data_gather.py:61-80) disappears."""
    return spark.read.schema(BREADCRUMB_RAW).json(path)


def read_vehicle_ids(spark: SparkSession, path: str) -> DataFrame:
    """S2 — headerless one-column CSV of vehicle ids, whitespace-stripped
    (Part1/data_gather.py:39-40)."""
    return spark.read.csv(path).select(F.trim(F.col("_c0")).cast("int").alias("vehicle_id"))


_ROW_RE = re.compile(r"<tr[^>]*>(.*?)</tr>", re.S | re.I)
_CELL_RE = re.compile(r"<t[hd][^>]*>(.*?)</t[hd]>", re.S | re.I)
_TAG_RE = re.compile(r"<[^>]+>")


def _parse_stop_event_html(html: str) -> list[dict[str, str]]:
    """Parse one scraped stop-events page into 24-column dicts.

    Re-implements the reference's th/td walk (Part3/stop_event_publisher.py:
    54-71) with stdlib regex (BeautifulSoup isn't assumed present): each
    <table> starts with a header row naming the columns; every following
    row pairs positionally with those names."""
    out: list[dict[str, str]] = []
    header: list[str] | None = None
    for row_html in _ROW_RE.findall(html):
        cells = [_TAG_RE.sub("", c).strip() for c in _CELL_RE.findall(row_html)]
        if not cells:
            continue
        if "<th" in row_html.lower():
            header = [c.strip().lower().replace(" ", "_") for c in cells]
            continue
        if header is None or len(cells) != len(header):
            continue
        rec = dict(zip(header, cells))
        out.append({c: rec.get(c, "") for c in STOP_EVENT_COLUMNS})
    return out


def read_stop_event_html(spark: SparkSession, path: str) -> DataFrame:
    """S3/X3 — HTML table scan as a distributed parse.

    ``wholetext`` file scan → ``mapInPandas`` UDTF (Arrow-batched, one
    output row per <tr>) → 24-column string frame.  This is the one
    genuinely UDF-shaped operator in the reference surface (SURVEY.md
    §2.10 X3); everything downstream is native expressions."""
    pages = spark.read.text(path, wholetext=True)
    _pickle_module_by_value(__name__)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict[str, str]] = []
            for html in pdf["value"]:
                rows.extend(_parse_stop_event_html(html))
            yield pd.DataFrame(rows, columns=STOP_EVENT_COLUMNS, dtype=str) if rows else pd.DataFrame(
                {c: pd.Series(dtype=str) for c in STOP_EVENT_COLUMNS}
            )

    return pages.mapInPandas(parse, schema=STOP_EVENT_RAW)


def read_evolved(spark: SparkSession, path: str) -> DataFrame:
    """Schema-evolution DISCOVERY read of a multi-generation parquet
    landing: batches landed over time gain columns (new quality scores,
    new metadata — the standing shape of a training-data store), and a
    plain read serves whichever schema the footer sample happens to
    hit.  ``mergeSchema`` reconciles every generation's footer into the
    union schema, null-filling columns a generation predates.

    Cost contract: schema merging reads ALL file footers — O(files) of
    driver/job work, fine for exploration and small stores, WRONG at a
    100 TB landing with 100k+ files.  The scale path is
    :func:`read_with_schema` — same result, zero footer sweep — once
    the target schema is known (e.g. from this function run once, or
    from the store's registered schema).

    Type CONFLICTS between generations (same column, different type)
    fail loudly in the merge with Spark's "Failed to merge" error — an
    int column silently widening to string between batches is an
    upstream bug, not something a reader should paper over."""
    return spark.read.option("mergeSchema", "true").parquet(path)


def read_with_schema(spark: SparkSession, path: str, schema) -> DataFrame:
    """Schema-evolution SCALE read: project every generation of a
    landing onto an explicit target schema — files missing a column
    null-fill it, files carrying extra columns drop them, and NO footer
    sweep happens (the reader trusts the declared schema; parquet's
    per-file projection does the per-generation adaptation).  This is
    the production read for evolving landings: the schema comes from
    the catalog/manifest, not from listing 100k footers.

    Pinned equal to :func:`read_evolved` on mixed-generation fixtures
    in tests/test_sources.py.  Caveat (documented, not hidden): a type
    CONFLICT a mergeSchema read would reject loudly is instead resolved
    by parquet's cast-or-null per file — pin the store's types with the
    validators (P16/P17) upstream when generations are untrusted."""
    return spark.read.schema(schema).parquet(path)


class SchemaEvolutionError(ValueError):
    """A registration that would break existing generations: a column
    type change (old files would silently cast-or-null under the new
    declared type) or a non-nullable addition (old generations cannot
    supply it).  Evolution is ADD-ONLY NULLABLE — everything else is a
    re-land, not a registration."""


def register_landing_schema(spark: SparkSession, path: str, schema) -> int:
    """The catalog half of the schema-evolution read path: version the
    landing's declared schema INSIDE the landing (``_schema/v<n>.json``
    + an atomically-written ``_schema/current`` pointer — the same
    one-object-PUT commit idiom as the warehouse's pointer-compaction),
    so :func:`read_registered` serves every generation with ZERO footer
    sweep and zero caller-side schema plumbing.

    Add-only contract, enforced LOUDLY at registration time (the only
    moment both schemas are in hand): every column of the current
    version must keep its exact dataType in the new one (a type change
    would make parquet's per-file adaptation silently cast-or-null the
    OLD generations — the mistyped-generation hazard the streamed
    landing kills per-batch), no existing column may TIGHTEN from
    nullable to non-nullable (old generations null-fill or genuinely
    hold nulls in it — a non-null declaration would miscompile IS NULL
    over them; relaxing non-nullable -> nullable is fine), and every
    NEW column must be nullable (old generations null-fill it).
    Column removal is likewise
    rejected: readers pinned to the registry must never lose a column
    that landed generations still carry.

    Single-writer contract (same as compact_partition): concurrent
    registrations can allocate the same version — serialize schema
    changes externally; READERS are safe concurrently with one
    registration (the pointer flips only after the version file
    lands)."""
    import json
    import os

    from ..streaming.hadoopfs import fs_exists, fs_write_text_atomic

    cur = landing_schema(spark, path, _absent_ok=True)
    if cur is not None:
        new_fields = {f.name: f for f in schema.fields}
        for f in cur.fields:
            nf = new_fields.get(f.name)
            if nf is None:
                raise SchemaEvolutionError(
                    f"{path}: registration drops column {f.name!r} — landed "
                    "generations still carry it; evolution is add-only"
                )
            if nf.dataType != f.dataType:
                raise SchemaEvolutionError(
                    f"{path}: registration re-types {f.name!r} from "
                    f"{f.dataType.simpleString()} to {nf.dataType.simpleString()}"
                    " — old generations would silently cast-or-null under "
                    "the new declared type; re-land them instead"
                )
            if f.nullable and not nf.nullable:
                raise SchemaEvolutionError(
                    f"{path}: registration tightens {f.name!r} from nullable "
                    "to non-nullable — old generations null-fill or genuinely "
                    "hold nulls in it, and a non-null declaration would let "
                    "the optimizer miscompile IS NULL predicates over them; "
                    "nullability may only relax (non-nullable -> nullable)"
                )
        old_names = {f.name for f in cur.fields}
        for f in schema.fields:
            if f.name not in old_names and not f.nullable:
                raise SchemaEvolutionError(
                    f"{path}: new column {f.name!r} is non-nullable — old "
                    "generations cannot supply it; added columns must be "
                    "nullable"
                )
    version = 1
    while fs_exists(spark, os.path.join(path, "_schema", f"v{version}.json")):
        version += 1
    fs_write_text_atomic(
        os.path.join(path, "_schema", f"v{version}.json"),
        json.dumps(json.loads(schema.json()), sort_keys=True),
        spark,
    )
    fs_write_text_atomic(os.path.join(path, "_schema", "current"), f"v{version}", spark)
    return version


def landing_schema(
    spark: SparkSession, path: str, version: int | None = None, _absent_ok: bool = False
):
    """Read the landing's registered schema — the CURRENT version, or a
    pinned historical one (time-travel for readers that must replay an
    old contract).  A pointer naming a missing version file fails
    loudly (the registry is corrupt), matching the warehouse pointer
    contract.

    A pinned ``version`` is bounds-checked against the current pointer
    (round-14 review): only versions the pointer has COMMITTED are
    servable history.  Without the check, an orphaned ``v<n>.json``
    left by a registration that crashed before flipping ``current``
    (the documented write order) would serve a never-committed contract
    — columns no generation carries, silently null-filled — and a
    simply-nonexistent pin would be misreported as registry corruption
    when the registry never named it."""
    import json
    import os

    from pyspark.sql.types import StructType

    from ..streaming.hadoopfs import fs_read_text

    cur = fs_read_text(os.path.join(path, "_schema", "current"))
    if cur is None:
        if _absent_ok and version is None:
            return None
        raise ValueError(f"{path} has no registered landing schema")
    cur_version = int(cur.strip().lstrip("v"))
    if version is None:
        tag = cur.strip()
    else:
        version = int(version)
        if not 1 <= version <= cur_version:
            raise ValueError(
                f"{path}: pinned schema version v{version} was never "
                f"committed — the registry's current pointer is "
                f"v{cur_version} (committed history is v1..v{cur_version}; "
                "an orphaned version file from a crashed registration is "
                "not servable history)"
            )
        tag = f"v{version}"
    txt = fs_read_text(os.path.join(path, "_schema", f"{tag}.json"))
    if txt is None:
        raise IOError(
            f"{path}: registry names {tag}, but _schema/{tag}.json does not "
            "exist — the schema registry is corrupt; refusing to guess"
        )
    return StructType.fromJson(json.loads(txt))


def read_registered(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """:func:`read_with_schema` under the landing's OWN registered
    schema — the self-describing form of the scale read: the catalog
    lives next to the data, the read costs one small text GET plus the
    pinned multi-path scan, and no caller threads StructTypes around.

    ``version`` pins a HISTORICAL schema (time-travel for readers that
    must replay an old contract — e.g. a downstream job validated
    against v1 keeps its exact column view while the landing evolves):
    generations that postdate the pinned version carry extra columns,
    and parquet's per-file projection simply drops them — the add-only
    registration contract guarantees every v1 column still exists with
    its exact type in every later generation, so a pinned read is
    always well-defined.  Default (None) serves the current pointer.

    The served columns are EXACTLY the registered ones (round 14): a
    multi-generation landing's ``batch_id=N`` directory names would
    otherwise ride in as a partition-discovery column — Spark appends
    partition columns even under an explicit schema — and a
    catalog-governed serve must not grow surprise columns the registry
    never declared (the raw layout stays reachable via
    :func:`read_with_schema` for maintenance jobs that want it)."""
    schema = landing_schema(spark, path, version)
    return read_with_schema(spark, path, schema).select(
        *[f.name for f in schema.fields]
    )
