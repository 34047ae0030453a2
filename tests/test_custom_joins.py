"""Contract tests for the custom join operators (asof, range join):
NULL-payload preservation, skewed-key composition, naive-join
multiplicity parity — the edges the driver's hash-compare oracles
cannot reach (their fixtures have unique ids and non-null payloads).
"""

from __future__ import annotations

import datetime
import sys
import types

from pyspark.sql import functions as F

from trimet_bytes__data_engineering_project_spark.operators.asof import (
    asof_join,
    asof_join_skewed,
)
from trimet_bytes__data_engineering_project_spark.operators.rangejoin import (
    interval_range_join,
)


def ts(minute: int) -> datetime.datetime:
    return datetime.datetime(2024, 1, 1, 12, minute)


def test_asof_preserves_matched_null_payload(spark):
    """A matched right row whose payload is legitimately NULL must yield
    NULL — not carry an older non-null payload forward (true ASOF
    semantics, DuckDB-native behavior)."""
    left = spark.createDataFrame(
        [(1, ts(5), "l1"), (1, ts(15), "l2"), (1, ts(25), "l3")],
        "k int, t timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, ts(0), "v0"), (1, ts(10), None), (1, ts(20), "v2")],
        "k int, t timestamp, payload string",
    )
    out = {
        r["tag"]: r["payload"]
        for r in asof_join(left, right, key="k", ts="t", payload_cols=["payload"]).collect()
    }
    assert out == {"l1": "v0", "l2": None, "l3": "v2"}


def test_asof_null_before_any_right_row(spark):
    left = spark.createDataFrame([(1, ts(1), "early")], "k int, t timestamp, tag string")
    right = spark.createDataFrame([(1, ts(9), "late")], "k int, t timestamp, payload string")
    rows = asof_join(left, right, key="k", ts="t", payload_cols=["payload"]).collect()
    assert rows[0]["payload"] is None


def test_asof_skewed_equals_plain(spark):
    """asof_join_skewed ≡ asof_join on a fixture where one key holds
    ~90% of the left rows (the hot-key shape the salting exists for),
    including NULL payloads and no-prior-row lefts."""
    left_rows = (
        [(7, ts(m % 60), f"hot{m}") for m in range(90)]
        + [(k, ts(k), f"cold{k}") for k in range(1, 6)]
        # NULL-key left rows: isin() is NULL for these, so a non-null-safe
        # hot/cold split would drop them from BOTH branches
        + [(None, ts(10), "nullkey10"), (None, ts(40), "nullkey40")]
    )
    right_rows = [(7, ts(0), "r0"), (7, ts(30), None), (7, ts(45), "r45")] + [
        (k, ts(0), f"rc{k}") for k in range(2, 6)
    ] + [(None, ts(20), "rnull")]
    left = spark.createDataFrame(left_rows, "k int, t timestamp, tag string")
    right = spark.createDataFrame(right_rows, "k int, t timestamp, payload string")

    plain = asof_join(left, right, key="k", ts="t", payload_cols=["payload"])
    skewed = asof_join_skewed(
        left, right, key="k", ts="t", payload_cols=["payload"], hot_keys=[7], n_splits=4
    )
    key = lambda r: (r["k"] is None, r["k"] or 0, r["t"], r["tag"])  # noqa: E731
    assert sorted(map(key, plain.collect())) == sorted(map(key, skewed.collect()))
    assert {r["tag"]: r["payload"] for r in plain.collect()} == {
        r["tag"]: r["payload"] for r in skewed.collect()
    }


def test_range_join_long_intervals_not_dropped(spark):
    """Intervals longer than bin_width_s explode to more bins but keep
    ALL their matches (the silent-drop fix)."""
    points = spark.createDataFrame(
        [(1, ts(0)), (1, ts(29)), (1, ts(59))], "k int, pt timestamp"
    )
    # one 55-minute interval vs 10-minute bins → 6-7 bins
    intervals = spark.createDataFrame(
        [(1, ts(2), ts(57))], "k int, s timestamp, e timestamp"
    )
    out = interval_range_join(
        points, intervals, key="k", point_ts="pt", start_ts="s", end_ts="e", bin_width_s=600
    )
    assert sorted(r["pt"].minute for r in out.collect()) == [29]
    # widen: interval covering all three points
    intervals2 = spark.createDataFrame(
        [(1, ts(0), ts(59))], "k int, s timestamp, e timestamp"
    )
    out2 = interval_range_join(
        points, intervals2, key="k", point_ts="pt", start_ts="s", end_ts="e", bin_width_s=600
    )
    assert out2.count() == 3


def test_range_join_multiplicity_matches_naive(spark):
    """Duplicate input rows survive with naive-BETWEEN multiplicity —
    no whole-row DISTINCT collapsing them."""
    points = spark.createDataFrame(
        [(1, ts(10)), (1, ts(10)), (1, ts(40))], "k int, pt timestamp"
    )
    intervals = spark.createDataFrame(
        [(1, ts(0), ts(20)), (1, ts(0), ts(20))], "k int, s timestamp, e timestamp"
    )
    binned = interval_range_join(
        points, intervals, key="k", point_ts="pt", start_ts="s", end_ts="e", bin_width_s=1200
    )
    naive = points.join(intervals, "k").filter(
        F.col("pt").between(F.col("s"), F.col("e"))
    )
    # 2 duplicate points × 2 duplicate intervals = 4 rows
    assert binned.count() == naive.count() == 4


def test_sample_frames_survives_importable_av(monkeypatch):
    """A present-but-unusable `av` module must degrade to the stub, not
    crash the operator (the round-1 landmine: NotImplementedError
    escaped the ImportError-only except)."""
    from trimet_bytes__data_engineering_project_spark.operators.multimodal import (
        _sample_frame_bytes,
        _stub_frames,
    )

    fake_av = types.ModuleType("av")

    def boom(*a, **k):
        raise NotImplementedError("fake codec")

    fake_av.open = boom
    monkeypatch.setitem(sys.modules, "av", fake_av)

    raw = bytes(range(256)) * 4
    frames, decoded = _sample_frame_bytes(raw, max_frames=4)
    assert decoded is False
    assert frames == _stub_frames(raw, 4)
    assert 1 <= len(frames) <= 4


def test_asof_join_tolerance(spark):
    """tolerance_us: a match older than the bound nulls out; an
    in-bound match survives; equal-gap passes (<=); huge tolerance
    reproduces the untolerated join exactly."""
    from datetime import datetime

    from pyspark.sql import functions as F

    from trimet_bytes__data_engineering_project_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 1, 2, 0, 0), 100),  # 1h after the quote → in
            (1, datetime(2024, 1, 1, 5, 0, 0), 101),  # 4h after → stale
            (2, datetime(2024, 1, 1, 1, 0, 0), 102),  # no quote ever → NULL
        ],
        ["k", "ts", "trade_id"],
    )
    right = spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 1, 0, 0), 7.0)], ["k", "ts", "px"]
    )
    out = {r["trade_id"]: r["px"] for r in
           asof_join(left, right, "k", "ts", ["px"], tolerance_us=3_600_000_000).collect()}
    assert out == {100: 7.0, 101: None, 102: None}
    loose = asof_join(left, right, "k", "ts", ["px"], tolerance_us=10**15)
    plain = asof_join(left, right, "k", "ts", ["px"])
    assert sorted(map(tuple, loose.collect())) == sorted(map(tuple, plain.collect()))
