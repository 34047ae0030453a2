"""As-of join — the canonical "operator Spark lacks" (brief: custom
operators (a): composition of existing DataFrame ops).

For each left row, attach the payload of the LATEST right row of the
same key with ``right.ts <= left.ts`` (inclusive).  The naive
formulation is a range theta-join (O(n·m) per key) or a correlated
subquery per row; the scalable formulation used here is the classic
union-and-carry:

1. tag both sides (right = 0, left = 1) and union them;
2. one window per key ordered by (ts, side) — right rows sort before
   left rows at equal timestamps, which is exactly the inclusive
   ``<=`` semantic;
3. ``last(payload, ignorenulls=True)`` carries the most recent right
   payload forward onto every following left row;
4. keep the left rows.

Cost: ONE shuffle of both inputs on the key (the same price as any
equi-join) + a linear in-partition pass — no range explosion, no
per-row probe.  Skewed keys take the same salting/AQE treatment as
any other window (operators/skew.py).

Tie rule: among right rows sharing one exact timestamp the carried row
is order-nondeterministic — pre-aggregate the right side to one row
per (key, ts) if that matters (the corpus query does).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    payload_cols: list[str],
) -> DataFrame:
    """Left as-of join: all ``left`` columns plus, for each payload
    column, the value from the latest ``right`` row at or before the
    left row's ``ts`` (NULL if none yet).  ``left`` must not already
    contain the payload columns."""
    l_tag = left.withColumn("_side", F.lit(1))
    r_tag = right.select(key, ts, *payload_cols).withColumn("_side", F.lit(0))
    u = l_tag.unionByName(r_tag, allowMissingColumns=True)

    w = (
        Window.partitionBy(key)
        .orderBy(ts, "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = [F.last(c, ignorenulls=True).over(w).alias(c) for c in payload_cols]
    kept = [c for c in left.columns]
    return u.select(*kept, "_side", *carried).filter(F.col("_side") == 1).drop("_side")
