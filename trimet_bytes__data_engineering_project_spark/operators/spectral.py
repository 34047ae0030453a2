"""Spectral embedding analytics: the corpus's dominant principal
direction by quantized power iteration, and the "all-but-the-top"
common-component removal built on it (Mu & Viswanath 2018, public —
embedding sets share a large common direction; removing it measurably
improves retrieval/similarity).  The training-data use: audit and
de-bias an embedding column before ANN indexing or semantic dedup.

Determinism contract (the repo's fixed-point conventions): a float
power iteration is NOT reproducible across engines — every matrix-
vector product is an order-dependent float reduction.  Here the matrix
is quantized ONCE (``floor(x * Sx)``, Sx a power of two so the scaling
is exact), the iterate is an int64 vector at scale Sv, and each
half-step is an INTEGER sum (exact, order-free):

    u_i  = floor( (sum_j xq_ij * v_j) / Sx )        -- int dot, exact /2^k
    y_j  = sum_i xq_ij * u_i                         -- int64, exact
    v'_j = floor( y_j * Sv / sqrt(sum_j y_j^2) )     -- ONE IEEE divide/row

The only floats are the final normalize (sum of squares is computed
EXACTLY in wide integers — DECIMAL(38,0) Spark-side, HUGEINT in an
ANSI oracle — then one deterministic sqrt and one floor) — so a fixed
iteration count is bit-reproducible in any engine.

Row ceiling (the 100-TB sizing rule, computed by ``row_ceiling``):
the start iterate is norm-bounded — ``v0_j = isqrt(sv²/d)`` so
``||v0||₂ ≤ sv``, the same invariant normalization restores every
round (``v'_j = floor(y_j·sv/||y||)`` ⇒ ``||v'||₂ ≤ sv + √d``, the
√d from per-coordinate floor slack) — which makes the FIRST round
obey the same bounds as every later one:

    |u_i| ≤ ||xq_i||·||v||/sx ≤ xmax·√d·(sv+√d)   (+1 for the floor)
    |y_j| ≤ n · xmax·sx · |u|max
    Σ_j y_j² ≤ d·|y|max²  < 10^38  (DECIMAL(38,0), the binding term)
    |y|max                < 2^63   (int64)

At the defaults (sx=2^10, **sv=2^16**, |x|<2, d=64) the binding
DECIMAL ceiling is **n < 5.8e8 rows** (int64: 4.3e9) — wide enough
for a 100-TB embedding shard without tuning.  sv=2^20 buys 4 more
fixed-point bits for small corpora at a ~3.6e7-row ceiling; the
tradeoff is a ``row_ceiling`` call away.  A breach cannot pass
silently: a decimal overflow NULLs the sum (non-ANSI), and the
normalize step treats a NULL norm as a hard error (raise_error),
never as the zero-corpus zero vector.

Scale shape per iteration: one broadcast of the 1-row iterate into the
scan (crossJoin of a single row), an array-local integer fold for u,
and ONE shuffle — the 64-group y aggregation, map-side combined to 64
rows per task.  The quantized matrix is derived once and
localCheckpointed (the x100 multi-consumer rule: 2 reads per
iteration).  Power iteration is an anytime algorithm; 3 rounds
separate the top direction on anything with a spectral gap.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import as_double_vec


def row_ceiling(
    d: int = 64, xmax: float = 2.0, sx: int = 1 << 10, sv: int = 1 << 16
) -> int:
    """Largest corpus row count the quantized power iteration is
    PROVEN exact for at these scales — min of the DECIMAL(38,0)
    sum-of-squares ceiling (the binding one at the defaults) and the
    int64 ceiling on y_j, via the module-docstring worst-case chain
    (norm-bounded iterate, so every round including the first obeys
    it).  The 100-TB contract: callers sizing a corpus beyond this
    must lower ``sv`` or shard-and-average."""
    rd = math.isqrt(d - 1) + 1            # ceil(sqrt(d))
    # normalize floors toward -inf: each |v'_j| picks up < 1 of slack,
    # so the restored invariant is ||v'|| <= sv + sqrt(d), and
    # |u_i| <= ||xq_i||*||v||/sx + 1 <= xmax*sqrt(d)*(sv+sqrt(d)) + 1
    u_max = int(xmax * rd * (sv + rd)) + 1
    y_per_row = int(xmax * sx) * u_max
    n_decimal = math.isqrt(10**38 // d) // y_per_row
    n_int64 = (2**63 - 1) // y_per_row
    return min(n_decimal, n_int64)


def _v0_fp(sv: int, d: int) -> int:
    """Start-iterate coordinate: ``isqrt(sv²/d)`` — the largest
    integer constant with ``||v0||₂ ≤ sv``, so round 1 is bounded by
    the same invariant the normalization restores (exact integer
    arithmetic; both engines inline the same literal)."""
    return math.isqrt(sv * sv // d)


def _assemble(vecs: DataFrame, j_col: str, val_col: str, out_col: str) -> DataFrame:
    """(j, val) rows -> one row holding the j-ordered array."""
    return vecs.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct(F.col(j_col), F.col(val_col)))),
            lambda s: s[val_col],
        ).alias(out_col)
    )


def quantize_embeddings(
    emb: DataFrame,
    sx: int = 1 << 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(vec_id, xq): the embedding quantized to int64 at ``sx`` —
    ``floor(x * sx)`` with sx a power of two, so the scaling itself is
    float-exact and the floor deterministic."""
    return emb.select(
        F.col(id_col).alias("vec_id"),
        F.transform(
            as_double_vec(vec_col), lambda x: F.floor(x * F.lit(float(sx))).cast("long")
        ).alias("xq"),
    )


def power_iteration_top_component(
    emb: DataFrame,
    iters: int = 3,
    sx: int = 1 << 10,
    sv: int = 1 << 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(dim_idx, v_fp): the dominant right-singular direction of the
    (uncentered) embedding matrix after ``iters`` quantized power
    rounds, as an int64 unit vector at scale ``sv``.  Start iterate is
    all-ones at ``isqrt(sv²/d)`` (deterministic sign, norm-bounded so
    round 1 obeys the ``row_ceiling`` chain).  A zero corpus yields
    the all-zero vector (norm guard), never NULLs.  Fully declarative —
    no driver collect; the iterate lives as a 1-row DataFrame."""
    xq = quantize_embeddings(emb, sx, vec_col, id_col).localCheckpoint(eager=False)
    # r15: the start iterate derives IN-PLAN from the first row's array
    # instead of a per-invocation first() driver action (one job + py4j
    # fetch per call, serialized with plan build).  The value is the
    # same _v0_fp(sv, d) = isqrt(sv²/d) exactly: sv² div d is exact
    # int64, and floor(sqrt(m)) == isqrt(m) for every m < 2^52 in IEEE
    # double (sqrt is correctly rounded and adjacent doubles around
    # integers k ≤ 2^26 are spaced far tighter than the k − 1/(2k) gap,
    # so sqrt(k²−1) never rounds up to k) — sv ≤ 2^20 keeps sv² ≤ 2^40.
    # A zero-row corpus now yields the empty result instead of the
    # former first()[...] TypeError.
    q_fp = F.expr(f"CAST({sv}L * {sv}L AS LONG) div CAST(size(xq) AS LONG)")
    v = xq.limit(1).select(
        F.transform(
            F.col("xq"),
            # integer div FIRST (matching isqrt(sv*sv // d)), then the
            # exact-for-<2^52 double sqrt + floor
            lambda _: F.floor(F.sqrt(q_fp.cast("double"))).cast("long"),
        ).alias("varr")
    )
    for _ in range(iters):
        u = (
            xq.crossJoin(F.broadcast(v))
            .select(
                "vec_id",
                "xq",
                F.floor(
                    F.aggregate(
                        F.zip_with(
                            F.col("xq"), F.col("varr"), lambda x, w: x * w
                        ),
                        F.lit(0).cast("long"),
                        lambda acc, p: acc + p,
                    )
                    / F.lit(float(sx))
                )
                .cast("long")
                .alias("u"),
            )
        )
        y = (
            u.select(F.posexplode("xq").alias("j", "xv"), "u")
            .groupBy("j")
            .agg(F.sum(F.col("xv") * F.col("u")).cast("long").alias("y"))
        )
        # r14: the norm + normalize run ARRAY-LOCALLY on the assembled
        # 1-row iterate instead of a separate n² aggregation plus a
        # broadcast back onto the y rows — the decimal fold below is the
        # same per-element DECIMAL(19,0)² product summed in
        # DECIMAL(38,0) (exact, associative ⇒ fold ≡ SUM, identical
        # overflow-to-NULL behavior), and the per-element normalize is
        # the identical expression, so the iterate is bit-identical
        # while each round drops one aggregation job and one broadcast
        # exchange — pure stage-barrier overhead at any scale, and the
        # dominant wall term of this operator at bench scale.  An empty
        # corpus still yields the empty iterate (transform over [] is
        # [], the fold over [] is 0 — no branch ever evaluates).
        yarr = _assemble(y, "j", "y", "yarr")
        n2 = F.aggregate(
            F.transform(
                F.col("yarr"),
                lambda yv: yv.cast("decimal(19,0)") * yv.cast("decimal(19,0)"),
            ),
            F.lit(0).cast("decimal(38,0)"),
            lambda acc, p: acc + p,
        ).cast("double")
        # NULL n2 = the DECIMAL(38,0) sum of squares overflowed (corpus
        # beyond the module-docstring ceiling) — hard error, NOT the
        # zero-corpus zero vector (n2 == 0) it would otherwise alias.
        v = yarr.select(n2.alias("n2"), "yarr").select(
            F.transform(
                F.col("yarr"),
                lambda yv: F.when(
                    F.col("n2") > 0,
                    F.floor(
                        yv.cast("double") * F.lit(float(sv)) / F.sqrt("n2")
                    ).cast("long"),
                )
                .when(F.col("n2") == 0, F.lit(0).cast("long"))
                .otherwise(
                    F.expr(
                        "CAST(raise_error('power_iteration_top_component: sum of"
                        " squares overflowed DECIMAL(38,0) — corpus exceeds"
                        " row_ceiling(d, xmax, sx, sv) (~5.8e8 at the defaults);"
                        " lower sv or shard-and-average') AS BIGINT)"
                    )
                ),
            ).alias("varr")
        )
    return (
        v.select(F.posexplode("varr").alias("dim_idx", "v_fp"))
        .select(F.col("dim_idx").cast("int"), "v_fp")
    )


def remove_top_component(
    emb: DataFrame,
    component: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """All-but-the-top: subtract each vector's projection onto the
    (quantized) top direction — x' = x - (x.v_hat) v_hat with
    v_hat = v_fp / |v_fp| rebuilt in floats from the DETERMINISTIC
    integer component, so the output is as reproducible as its input.
    Returns (vec_id, embedding array<double>) — drop-in for any
    downstream similarity/ANN operator.  One broadcast of the 64-int
    component row into the scan; array-local arithmetic; no shuffle."""
    comp = _assemble(
        component.select(F.col("dim_idx").alias("j"), F.col("v_fp").alias("v")),
        "j",
        "v",
        "carr",
    )
    x = F.col("_x")
    c = F.col("carr")
    cn2 = F.aggregate(
        F.transform(c, lambda w: w.cast("double") * w.cast("double")),
        F.lit(0.0),
        lambda acc, p: acc + p,
    )
    dotxc = F.aggregate(
        F.zip_with(x, c, lambda xi, wi: xi * wi.cast("double")),
        F.lit(0.0),
        lambda acc, p: acc + p,
    )
    return (
        emb.select(
            F.col(id_col).alias("vec_id"), as_double_vec(vec_col).alias("_x")
        )
        .crossJoin(F.broadcast(comp))
        .withColumn("_s", F.when(cn2 > 0, dotxc / cn2).otherwise(F.lit(0.0)))
        .select(
            "vec_id",
            F.zip_with(
                x, c, lambda xi, wi: xi - F.col("_s") * wi.cast("double")
            ).alias("embedding"),
        )
    )
