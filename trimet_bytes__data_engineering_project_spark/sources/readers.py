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
