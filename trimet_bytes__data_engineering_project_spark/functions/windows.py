"""Window-function builders — SURVEY.md §2.5 (W1-W3) and §2.4 A7.

The reference computes these with a global pandas sort + ``diff()`` /
``bfill()`` over the whole frame (Part1/subscriber_project.py:65-69).
Here each is a partitioned window: the only shuffle is one exchange on
the partition key, and at cluster scale every trip's rows land in one
task — no global sort, no driver materialization.
"""

from __future__ import annotations

from pyspark.sql import Column, Window, WindowSpec
from pyspark.sql import functions as F


def trip_order_window(trip_col: str = "trip_id", *order_cols: str) -> WindowSpec:
    """O1 folded into a window: partition by trip, order within it.

    Replaces the reference's global sort by (EVENT_NO_TRIP, TIMESTAMP,
    VEHICLE_ID) (Part1/subscriber_project.py:65) — partitioning makes the
    sort per-trip and shuffle-local instead of global."""
    order = list(order_cols) or ["tstamp"]
    return Window.partitionBy(trip_col).orderBy(*order)


def odometer_speed(meters: Column, secs: Column, w: WindowSpec) -> Column:
    """W1 — speed = Δ odometer / Δ time within trip
    (Part1/subscriber_project.py:65-68).

    Edge cases normalized to NULL (then repaired by ``backfill_clip``):
    first row per trip (no lag) and Δt=0 (pandas ±inf, Spark div-zero)."""
    dm = meters - F.lag(meters).over(w)
    dt = secs - F.lag(secs).over(w)
    return dm / F.nullif(dt, F.lit(0))


def backfill_clip(speed: Column, w_following: WindowSpec) -> Column:
    """W2 — backfill NULL speeds from the next non-null, floor at 0
    (``SPEED.bfill().clip(lower=0)``, Part1/subscriber_project.py:69).

    Decision (SURVEY.md §7): the reference's bfill is frame-global and
    bleeds the first row of one trip into the previous trip's tail; the
    intent per PDF Part 2 §D.2 is per-trip, so the window passed here
    should be partitioned by trip and span currentRow→unboundedFollowing.
    """
    filled = F.first(speed, ignorenulls=True).over(w_following)
    return F.greatest(filled, F.lit(0.0))


def dedup_first_row(w: WindowSpec) -> Column:
    """A7 — deterministic first-row-per-group marker.

    The reference's ``drop_duplicates(keep='first')`` after a sort
    (Part1/subscriber_project.py:65,76) is order-dependent; ``row_number``
    over an explicit window is the deterministic Spark equivalent
    (``dropDuplicates`` alone is not)."""
    return F.row_number().over(w) == 1


def running_avg(value: Column, order_col: str) -> Column:
    """W3 — cumulative mean ``avg(x) OVER (ORDER BY k)`` (PDF Q3).

    PG's default frame is RANGE UNBOUNDED PRECEDING..CURRENT ROW;
    identical to ROWS here because the reference orders by a unique key.
    """
    w = Window.orderBy(order_col).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return F.avg(value).over(w)


def sessionize(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: int,
    tiebreak_col: str,
) -> DataFrame:
    """Batch sessionization by the islands-and-gaps decomposition: a
    row starts a new session iff it is its key's first event or follows
    the previous one by more than ``gap_seconds``; the running sum of
    those flags numbers the sessions (0-based).  Semantics identical to
    streaming ``session_window`` with a static gap —
    ``streaming/pipeline.py:trip_sessions`` is the watermarked twin;
    this form exists because it is expressible in ANY engine (the
    oracle runs the same two windows) and composes with further batch
    ops.

    Adds a ``session_id`` column.  ``tiebreak_col`` must make
    (key, ts, tiebreak) unique or simultaneous events have no defined
    order.

    Scale shape: ONE shuffle on the key; both windows (lag + running
    sum) share the same (key, ts, tiebreak) sort, so Catalyst plans a
    single Window operator pair over one Exchange — per-key state is a
    single previous-row buffer, streamed."""
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    prev = F.lag(F.col(ts_col)).over(w)
    new_flag = F.when(
        prev.isNull()
        | (
            F.unix_micros(F.col(ts_col).cast("timestamp"))
            - F.unix_micros(prev.cast("timestamp"))
            > gap_seconds * 1_000_000
        ),
        F.lit(1),
    ).otherwise(F.lit(0))
    run = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return df.withColumn("session_id", (F.sum(new_flag).over(run) - 1).cast("long"))
