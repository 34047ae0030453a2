"""Custom stateful streaming operator — per-ping trip labeling via
``applyInPandasWithState`` (brief: "applyInPandasWithState for custom
stateful operators").

``session_window`` (pipeline.trip_sessions) aggregates one row per
session; labeling EVERY ping with its derived trip sequence — the
per-row output the reference's warehouse wants for a feed without
EVENT_NO_TRIP — is not expressible as a windowed aggregation.  It
needs per-group running state (last seen timestamp + current trip
counter) carried across micro-batches: exactly the
``applyInPandasWithState`` contract.

State per vehicle is two scalars, so fleet-scale state is
O(#vehicles), not O(#pings).  Data arrives Arrow-batched; the loop
below is a pure-Python fallback only within one vehicle's batch slice
(bounded by the micro-batch, not the stream).

Determinism contract: labels match the batch twin
(:func:`segment_trips_batch`) when each vehicle's pings arrive in
event-time order across micro-batches (the daily-file landing layout
guarantees this — files land and are processed in date order).  For
disordered feeds, compose with a watermarked sort upstream.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "vehicle_id int, event_ts timestamp, trip_seq int"
)
STATE_SCHEMA = "last_us long, seq int"

_US = 1_000_000


def _label_group(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    gap_seconds: int,
) -> Iterator[pd.DataFrame]:
    (vehicle_id,) = key
    last_us, seq = state.get if state.exists else (None, 0)

    rows = pd.concat(list(pdfs)).sort_values("event_ts")
    # Arrow hands timestamps as datetime64[ns]; state tracks µs
    ts_us = (rows["event_ts"].astype("int64") // 1000).tolist()
    seqs = []
    for us in ts_us:
        if last_us is not None and us - last_us > gap_seconds * _US:
            seq += 1
        last_us = us
        seqs.append(seq)

    state.update((last_us, seq))
    yield pd.DataFrame(
        {
            "vehicle_id": vehicle_id,
            "event_ts": rows["event_ts"].values,
            "trip_seq": pd.array(seqs, dtype="int32"),
        }
    )


def segment_trips_stateful(
    pings: DataFrame, gap_seconds: int = 900
) -> DataFrame:
    """Label each (vehicle_id, event_ts) ping with a derived trip
    sequence: a gap longer than ``gap_seconds`` starts the next trip.
    Streaming: state = (last_ts_us, current_seq) per vehicle.

    Input needs columns ``vehicle_id`` (int) and ``event_ts``
    (timestamp).  Output is append-mode per-row labels."""
    return pings.groupBy("vehicle_id").applyInPandasWithState(
        lambda key, pdfs, state: _label_group(key, pdfs, state, gap_seconds),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def segment_trips_batch(pings: DataFrame, gap_seconds: int = 900) -> DataFrame:
    """Batch twin of :func:`segment_trips_stateful` — pure window
    exprs: gap-flag via lag, trip_seq via running sum.  Used as the
    parity oracle for the stateful path and as the backfill
    implementation over historical data."""
    w = Window.partitionBy("vehicle_id").orderBy("event_ts")
    gap_us = F.lit(gap_seconds * _US)
    prev_us = F.lag(F.unix_micros(F.col("event_ts").cast("timestamp"))).over(w)
    is_new = (
        F.unix_micros(F.col("event_ts").cast("timestamp")) - prev_us > gap_us
    ).cast("int")
    return pings.select(
        "vehicle_id",
        "event_ts",
        F.sum(F.coalesce(is_new, F.lit(0)))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("int")
        .alias("trip_seq"),
    )
