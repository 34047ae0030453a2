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
3. ``last(marker, ignorenulls=True)`` carries the most recent right
   row forward onto every following left row.  The carried value is a
   STRUCT built only on right rows — non-null whenever a right row
   matched — so a matched right row whose payload columns are
   legitimately NULL stays NULL in the output (exactly DuckDB's native
   ASOF semantics), instead of an older non-null payload leaking
   forward;
4. keep the left rows and project the payload columns out of the
   struct.

Cost: ONE shuffle of both inputs on the key (the same price as any
equi-join) + a linear in-partition pass — no range explosion, no
per-row probe.  Skewed keys: see :func:`asof_join_skewed`.

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
    tolerance_us: int | None = None,
) -> DataFrame:
    """Left as-of join: all ``left`` columns plus, for each payload
    column, the value from the latest ``right`` row at or before the
    left row's ``ts`` (NULL if none yet; a matched row's NULL payload
    is preserved as NULL).  ``left`` must not already contain the
    payload columns.

    ``tolerance_us`` (pandas ``merge_asof(tolerance=...)`` parity):
    when set, a match older than the left timestamp by more than this
    many microseconds is discarded — stale quotes don't decorate fresh
    trades.  Implemented by carrying the matched row's OWN timestamp in
    the same struct and nulling the projection when the gap exceeds the
    bound; plan shape is unchanged (still one union + one window, no
    extra shuffle)."""
    l_tag = left.withColumn("_side", F.lit(1))
    # the carry marker: a struct of (right ts, payload columns), built
    # ONLY on right rows — non-null iff a right row exists, independent
    # of whether its payload values are null; the embedded ts feeds the
    # tolerance check
    r_tag = (
        right.select(key, ts, *payload_cols)
        .withColumn("_side", F.lit(0))
        .withColumn("_r", F.struct(F.col(ts).alias("_rts"), *payload_cols))
        .drop(*payload_cols)
    )
    u = l_tag.unionByName(r_tag, allowMissingColumns=True)

    w = (
        Window.partitionBy(key)
        .orderBy(ts, "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = F.last("_r", ignorenulls=True).over(w)
    if tolerance_us is not None:
        gap = F.unix_micros(F.col(ts).cast("timestamp")) - F.unix_micros(
            carried["_rts"].cast("timestamp")
        )
        carried = F.when(gap <= tolerance_us, carried)
    kept = [c for c in left.columns]
    projected = [carried[c].alias(c) for c in payload_cols]
    return (
        u.select(*kept, "_side", *projected)
        .filter(F.col("_side") == 1)
        .drop("_side")
    )


def asof_join_skewed(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    payload_cols: list[str],
    hot_keys: list,
    n_splits: int = 8,
) -> DataFrame:
    """:func:`asof_join` with hot-key splitting for skewed key
    distributions.

    A salted window would split a hot key's carry chain mid-stream —
    left rows in salt s would not see right rows hashed to salt s' —
    so salting alone is wrong for as-of.  The correct composition:

    - **cold keys** take the plain one-shuffle path;
    - **hot keys**: LEFT rows are salted into ``n_splits`` groups
      (deterministic ``pmod(hash(ts), n)`` — retry-safe, like
      operators/skew.py), and the hot keys' RIGHT rows are replicated
      into every salt group.  Each (key, salt) partition then contains
      ALL right rows of the key plus 1/n of its left rows, so the
      per-partition carry is exact — no cross-salt patch-up pass
      needed, at the price of replicating only the hot keys' right
      side n× (right sides are the small side of an as-of join: state
      snapshots, not event streams).

    Output ≡ :func:`asof_join` (pinned by test); the hot partitions
    shrink from |left_hot| to |left_hot|/n rows.
    """
    # null-safe: isin() is NULL for NULL keys, and both filter(hot) and
    # filter(~hot) drop NULL rows — NULL-key left rows would silently
    # vanish, breaking the "output ≡ asof_join" contract (asof_join
    # keeps them, windowed in their own NULL partition).
    hot = F.coalesce(F.col(key).isin(hot_keys), F.lit(False))

    cold = asof_join(left.filter(~hot), right.filter(~hot), key, ts, payload_cols)

    l_hot = left.filter(hot).withColumn(
        "_salt", F.pmod(F.hash(F.col(ts)), F.lit(n_splits))
    )
    r_hot = right.filter(hot).withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_splits - 1)))
    )
    # same union-and-carry, windowed on (key, salt)
    l_tag = l_hot.withColumn("_side", F.lit(1))
    r_tag = (
        r_hot.select(key, ts, "_salt", *payload_cols)
        .withColumn("_side", F.lit(0))
        .withColumn("_r", F.struct(*payload_cols))
        .drop(*payload_cols)
    )
    u = l_tag.unionByName(r_tag, allowMissingColumns=True)
    w = (
        Window.partitionBy(key, "_salt")
        .orderBy(ts, "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = F.last("_r", ignorenulls=True).over(w)
    kept = [c for c in left.columns]
    projected = [carried[c].alias(c) for c in payload_cols]
    hot_out = (
        u.select(*kept, "_side", *projected)
        .filter(F.col("_side") == 1)
        .drop("_side")
    )
    return cold.unionByName(hot_out)
