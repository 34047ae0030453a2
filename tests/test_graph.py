"""Connected-components contracts: exact cluster labels on hand
fixtures, chain convergence via pointer jumping, determinism.
(Cross-engine parity for x34 — CC vs a recursive-CTE closure — is in
test_oracle_parity.py.)
"""

from __future__ import annotations

from pyspark.sql import functions as F

from trimet_bytes__data_engineering_project_spark.operators.graph import (
    connected_components,
)


def _labels(df):
    return {r["node"]: r["cluster_id"] for r in df.collect()}


def test_cc_chain_triangle_and_isolated_pair(spark):
    # chain 1-2-3 (no 1-3 edge), triangle 10-11-12, isolated pair 20-21
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (11, 12), (10, 12), (20, 21)],
        "a_id long, b_id long",
    )
    got = _labels(connected_components(pairs))
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_cc_long_chain_converges(spark):
    # a worst-case path graph: min label must travel the full diameter;
    # pointer jumping makes that O(log n) rounds, well inside max_iter
    n = 64
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "a_id long, b_id long"
    )
    got = _labels(connected_components(pairs))
    assert set(got.values()) == {0}
    assert len(got) == n + 1


def test_cc_deterministic_and_order_independent(spark):
    import random

    edges = [(1, 5), (5, 9), (2, 9), (30, 31), (31, 32), (40, 41)]
    rng = random.Random(7)
    shuffled = edges[:]
    rng.shuffle(shuffled)
    # reversed pair orientation must not change clusters either
    flipped = [(b, a) for a, b in shuffled]
    a = _labels(connected_components(spark.createDataFrame(edges, "a_id long, b_id long")))
    b = _labels(
        connected_components(spark.createDataFrame(flipped, "a_id long, b_id long"))
    )
    assert a == b
    assert a[1] == a[2] == a[5] == a[9] == 1
