"""Mergeable count-min sketch over a key column.

The exact heavy-key audit (x183) answers "which keys are heavy NOW" with
one count shuffle over the corpus.  What it cannot do is run
CONTINUOUSLY: at 100 TB you do not re-count 10^11 rows after every
landing to notice a key going hot.  The count-min sketch is the standard
remedy (Cormode & Muthukrishnan 2005): ``depth`` hash rows of ``width``
counters; every key folds into one counter per row; the estimate is the
MIN over rows and is an OVERESTIMATE-ONLY bound (collisions only add).
Two properties make it the streaming fit:

* **additive** — counters over any split of the rows sum cell-wise to
  the counters over the union, so per-batch landings reproduce the
  batch sketch EXACTLY (the raw-stats contract the histogram / drift /
  inverted-index landings in ``streaming/`` already use);
* **fixed-size** — depth·width cells regardless of corpus size, so the
  store a monitoring query reads is kilobytes, never the corpus.

Scale shape: ONE map-side-combined count shuffle on the key (distinct
keys cross the wire, not rows — identical to x183's audit), then a
second shuffle over ≤ depth·width groups (thousands of rows, trivial).
The hash family is the repo's portable md5-slice (`conv(substring(
md5(key || ':' || row), 1, 8), 16, 10) % width`) so a DuckDB oracle
reproduces every cell bit-for-bit — no xxhash/libm divergence.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cms_bucket(key_col: Column, row_i: int, width: int) -> Column:
    """Portable bucket of ``key`` under hash row ``row_i``: the first 8
    hex chars of md5(key || ':' || row_i) as an integer, mod width.
    Deterministic and engine-portable (md5 is md5 everywhere)."""
    h = F.md5(F.concat(key_col.cast("string"), F.lit(f":{row_i}")))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % width).alias(
        f"_b{row_i}"
    )


def cms_from_counts(
    counts: DataFrame, key_col: str, count_col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Fold an exact per-key count table into CMS counters
    ``(row, bucket, cell)`` — ≤ depth·width rows.  Taking counts (not
    raw rows) keeps the expensive shuffle shared with whatever exact
    audit runs alongside (x183) and makes the fold input |keys|-sized."""
    buckets = F.array(
        *[cms_bucket(F.col(key_col), i, width) for i in range(depth)]
    )
    return (
        counts.select(F.col(count_col).alias("_c"), F.posexplode(buckets).alias("row", "bucket"))
        .groupBy("row", "bucket")
        .agg(F.sum("_c").cast("long").alias("cell"))
    )


def cms_counters(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """CMS counters straight from raw rows: exact per-key counts (one
    map-side-combined shuffle), then the tiny cell fold."""
    counts = df.groupBy(key_col).agg(F.count("*").cast("long").alias("_c"))
    return cms_from_counts(counts, key_col, "_c", depth=depth, width=width)


def cms_estimate(
    keys: DataFrame, counters: DataFrame, key_col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Point-query the sketch for every row of ``keys``: the estimate is
    ``min`` over the key's depth cells (overestimate-only — pinned by
    test against exact counts).  ``counters`` is ≤ depth·width rows, so
    it broadcasts; the probe never shuffles ``keys``."""
    buckets = F.array(
        *[cms_bucket(F.col(key_col), i, width) for i in range(depth)]
    )
    probes = keys.select("*", F.posexplode(buckets).alias("row", "bucket"))
    return (
        probes.join(F.broadcast(counters), ["row", "bucket"], "left")
        .groupBy(*keys.columns)
        .agg(F.min(F.coalesce(F.col("cell"), F.lit(0))).cast("long").alias("est"))
    )
