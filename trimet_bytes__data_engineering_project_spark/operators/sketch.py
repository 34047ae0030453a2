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

Relationship to ``textstats.top_terms(approx=True)`` (x79): that is the
vocabulary-head INSTANCE of the same sketch idea, built inline over
terms with digest-slice buckets (one md5, ``depth`` hex windows) and a
sampling-based candidate prober, shipped in round 5.  This module is
the sketch as a reusable KEYED operator — salted-row hash family,
count-table input sharing, an estimate API, and the additive
per-generation store (``streaming/stats.py:run_streaming_cms``) with
the sliding-window read-off — the continuous-monitoring lifecycle x79
never needed.
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


def hll_registers(df: DataFrame, key_col: str, p: int = 8) -> DataFrame:
    """Portable HyperLogLog registers over a key column — the
    MAX-mergeable sketch that pairs with the count-min's sum-merge:
    register index = the key digest's first ``p`` bits (p ≤ 16: the
    first ⌈p/4⌉ hex digits of md5), register value = max over keys of
    ρ = leading-zero count + 1 of the NEXT 32 digest bits (Flajolet et
    al. 2007).  Duplicated keys hash identically, so the registers —
    unlike an exact COUNT DISTINCT — need no distinct shuffle: one
    scan, map-side partial MAX, and 2^p rows per task on the wire.

    Everything is engine-portable integer arithmetic: md5 slices via
    ``conv``, and the leading-zero count via the binary-expansion-
    length idiom (``33 - length(bin(v))`` — the x164/x182 ``bin()``
    convention, no libm).  A DuckDB oracle reproduces every register
    bit-for-bit.  Registers never observed stay absent (reader supplies
    the ρ=0 default); ``max`` over generations of this table IS the
    union's table — the streamed form is exact, not approximate."""
    if not 1 <= p <= 16:
        raise ValueError("p must be in [1, 16] (hex-digit register index)")
    nhex = (p + 3) // 4
    h = F.md5(F.col(key_col).cast("string"))
    reg = (
        F.conv(F.substring(h, 1, nhex), 16, 10).cast("long") % (1 << p)
    ).alias("reg")
    v = F.conv(F.substring(h, nhex + 1, 8), 16, 10).cast("long")
    rho = F.when(v == 0, F.lit(33)).otherwise(
        F.lit(33) - F.length(F.bin(v))
    ).cast("int")
    return (
        df.select(reg, rho.alias("rho"))
        .groupBy("reg")
        .agg(F.max("rho").alias("rho_max"))
    )


# bias-correction constant for m = 2^p registers, p >= 7 (Flajolet et
# al. 2007 §4); exact literals keep the one IEEE estimate division
# reproducible across engines.
_HLL_ALPHA_INF = 0.7213475204444817


def hll_estimate(registers: "list[tuple[int, int]]", p: int = 8) -> float:
    """Cardinality estimate from a (reg, rho_max) register list — a
    DRIVER-SIDE fold over ≤ 2^p rows (the bounded-collect class: the
    sketch is kilobytes by construction; the corpus never moves).
    Missing registers count as ρ=0.  Standard raw estimate with the
    small-range linear-counting correction; the indicator sum is exact
    dyadic arithmetic (Σ 2^(33-ρ) as integers over a 2^33 denominator)
    so the only floats are the final constants and division."""
    import math

    m = 1 << p
    alpha = (
        {4: 0.673, 5: 0.697, 6: 0.709}.get(p)
        or _HLL_ALPHA_INF / (1.0 + 1.079 / m)
    )
    got = dict(registers)
    s_fp = sum(1 << (33 - got.get(j, 0)) for j in range(m))  # Σ 2^-ρ · 2^33
    raw = alpha * m * m * float(1 << 33) / float(s_fp)
    zeros = sum(1 for j in range(m) if got.get(j, 0) == 0)
    if raw <= 2.5 * m and zeros > 0:
        return m * math.log(m / zeros)
    return raw
