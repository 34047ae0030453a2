"""Range (interval-containment) join — the second "operator Spark
lacks" (brief: custom operators (a)); Spark plans a raw
``p.ts BETWEEN i.start AND i.end`` predicate as a nested-loop join,
which is O(points × intervals) per key and unusable at scale.

The scalable formulation is bin-and-conquer:

1. choose a bin width (a tuning knob, not a correctness bound);
2. each point maps to ONE bin (its timestamp's); each interval
   explodes to the bins its [start, end] overlaps — ≤ 2 bins when the
   width ≥ the longest interval, and exactly (len / width) + 1 bins
   otherwise (cost degrades gracefully, matches are never lost);
3. equi-join on (key, bin) — hash/sort-merge, one shuffle each side;
4. re-check the exact containment predicate.

Because a point lives in exactly one bin, each (point, interval) pair
can meet in at most ONE bin — the point's own — so the join introduces
no duplicate pairs and output multiplicity is identical to the naive
``BETWEEN`` join, including duplicated input rows (no trailing
DISTINCT that would collapse them).

Cost: the same as any equi-join, ×(small constant) on the interval
side.  The bin column is also the natural storage partition for a
persisted interval table (partition-pruned probes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_range_join(
    points: DataFrame,
    intervals: DataFrame,
    key: str,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bin_width_s: int,
) -> DataFrame:
    """Inner join of ``points`` to every same-key interval containing
    them (inclusive bounds).  Output: all points columns + all
    intervals columns (minus the duplicated key), with exactly the
    multiplicity of the naive ``BETWEEN`` join.

    ``bin_width_s`` trades shuffle fan-out for bucket size: an interval
    explodes to ``(len / width) + 1`` bins, so pick a width near the
    typical interval length.  Oversized intervals cost more bins but
    are matched correctly — never dropped."""
    p_bin = F.floor(F.unix_micros(F.col(point_ts).cast("timestamp")) / (bin_width_s * 1_000_000))
    s_us = F.unix_micros(F.col(start_ts).cast("timestamp"))
    e_us = F.unix_micros(F.col(end_ts).cast("timestamp"))

    pts = points.withColumn("_bin", p_bin)
    ivs = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(s_us / (bin_width_s * 1_000_000)),
                F.floor(e_us / (bin_width_s * 1_000_000)),
            )
        ),
    )
    iv_cols = [c for c in intervals.columns if c != key]
    return (
        pts.join(ivs.select(key, "_bin", *iv_cols), [key, "_bin"])
        .filter(F.col(point_ts).between(F.col(start_ts), F.col(end_ts)))
        .drop("_bin")
    )
