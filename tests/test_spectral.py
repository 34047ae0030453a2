"""Quantized power-iteration contracts: bit-equality with a Python
model of the integer recurrence, dominant-direction sanity, the
zero-corpus guard, and all-but-the-top orthogonality.  Cross-engine
parity (x130/x131) lives in test_oracle_parity.py."""

from __future__ import annotations

import math

import pytest

from trimet_bytes__data_engineering_project_spark.operators.spectral import (
    power_iteration_top_component,
    remove_top_component,
    row_ceiling,
)

SX, SV = 1 << 10, 1 << 16


def _model(X, iters, sx=SX, sv=SV):
    xq = [[math.floor(x * sx) for x in row] for row in X]
    d = len(X[0])
    v = [math.isqrt(sv * sv // d)] * d
    for _ in range(iters):
        u = [math.floor(sum(xi * vi for xi, vi in zip(r, v)) / sx) for r in xq]
        y = [sum(xq[i][j] * u[i] for i in range(len(xq))) for j in range(d)]
        n2 = float(sum(yy * yy for yy in y))
        v = [
            math.floor(float(yy) * float(sv) / math.sqrt(n2)) if n2 > 0 else 0
            for yy in y
        ]
    return v


def _emb(spark, X):
    return spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(X)],
        "vec_id long, embedding array<double>",
    )


@pytest.mark.parametrize(
    "X",
    [
        [[1.0, 0.0, 0.0, 0.0]] * 3 + [[0.6, 0.8, 0.0, 0.0]],
        [[0.3, -0.4, 0.1, 0.2], [-0.5, 0.2, 0.0, 0.1], [0.25, 0.25, -0.25, 0.5]],
        [[0.9, 0.1], [0.8, 0.2], [-0.1, 0.95]],
    ],
)
def test_power_iteration_matches_python_model(spark, X):
    got = {
        r.dim_idx: r.v_fp
        for r in power_iteration_top_component(_emb(spark, X), iters=3).collect()
    }
    want = dict(enumerate(_model(X, 3)))
    assert got == want


def test_power_iteration_finds_dominant_axis(spark):
    X = [[1.0, 0.0, 0.0, 0.0]] * 5 + [[0.0, 0.3, 0.0, 0.0]]
    got = {
        r.dim_idx: r.v_fp
        for r in power_iteration_top_component(_emb(spark, X), iters=3).collect()
    }
    # component 0 carries nearly all the mass: |v0| ~ SV, rest tiny
    assert got[0] > 0.99 * SV
    assert all(abs(got[j]) < 0.05 * SV for j in (1, 2, 3))


def test_power_iteration_zero_corpus_guard(spark):
    X = [[0.0, 0.0, 0.0, 0.0]] * 3
    got = {
        r.dim_idx: r.v_fp
        for r in power_iteration_top_component(_emb(spark, X), iters=2).collect()
    }
    assert got == {0: 0, 1: 0, 2: 0, 3: 0}


def test_remove_top_component_orthogonal(spark):
    X = [[1.0, 0.1, 0.0, 0.0], [0.9, -0.2, 0.1, 0.0], [0.8, 0.0, 0.3, 0.1]]
    emb = _emb(spark, X)
    comp = power_iteration_top_component(emb, iters=3)
    cleaned = remove_top_component(emb, comp)
    cvec = {r.dim_idx: r.v_fp for r in comp.collect()}
    c = [cvec[j] for j in range(4)]
    for r in cleaned.collect():
        resid_dot = sum(x * w for x, w in zip(r.embedding, c))
        # orthogonal up to float eps relative to the component scale
        assert abs(resid_dot) < 1e-6 * SV
    # zero component (zero corpus) passes vectors through unchanged
    zcomp = power_iteration_top_component(_emb(spark, [[0.0] * 4] * 2), iters=1)
    thru = {
        r.vec_id: r.embedding for r in remove_top_component(emb, zcomp).collect()
    }
    assert thru[0] == X[0]


def test_default_row_ceiling_covers_1e8_rows(spark):
    """Pin the 100-TB sizing contract (r8 verdict item 5): the DEFAULT
    fixed-point scales must be proven exact past 1e8 embedding rows —
    no tuning required on the default path.  Also pin the worst-case
    chain itself on a tiny corpus: the model's intermediates stay
    inside the bounds row_ceiling derives from."""
    assert row_ceiling() >= 100_000_000
    # the old default (sv=2^20) is the documented small-corpus tradeoff
    # (more fixed-point bits, lower ceiling) — keep the ordering pinned
    assert row_ceiling(sv=1 << 20) < row_ceiling()
    # the binding term is the decimal sum of squares, not int64:
    # raising d (more terms in the sum) must lower the ceiling
    assert row_ceiling(d=256) < row_ceiling(d=64)

    # bound-chain sanity at the defaults on real arithmetic
    d, xmax = 4, 2.0
    X = [[1.9, -1.9, 1.9, -1.9]] * 3  # adversarial: |x| at the bound
    xq = [[math.floor(x * SX) for x in row] for row in X]
    v = [math.isqrt(SV * SV // d)] * d
    rd = math.isqrt(d - 1) + 1
    u_bound = int(xmax * rd * (SV + rd)) + 1
    for _ in range(3):
        u = [math.floor(sum(xi * vi for xi, vi in zip(r, v)) / SX) for r in xq]
        assert all(abs(ui) <= u_bound for ui in u)
        y = [sum(xq[i][j] * u[i] for i in range(len(xq))) for j in range(d)]
        assert all(abs(yy) <= len(X) * int(xmax * SX) * u_bound for yy in y)
        n2 = float(sum(yy * yy for yy in y))
        v = [
            math.floor(float(yy) * float(SV) / math.sqrt(n2)) if n2 > 0 else 0
            for yy in y
        ]
        # the restored invariant, with per-coordinate floor slack
        assert sum(vi * vi for vi in v) <= (SV + rd) ** 2
