"""Product quantization (PQ) with asymmetric distance computation —
the compressed-codes tier of the ANN family.

The quantization ladder so far (``operators/ann_index.py``): float
indexes -> int8 SCALAR quantization (~4x fewer scan bytes, measured
38 MB vs 70 MB at x100).  PQ is the next rung: each vector is stored
as ``m`` one-byte CODES (m=8 at dim=64 -> 8 bytes + a stored
reconstruction norm vs 512 bytes of float64 — the representation
FAISS-scale systems serve billions of vectors from).  A vector is
split into ``m`` subvectors of dim/m dims; each subspace has its own
``ks``-entry codebook; the stored code is the index of the nearest
(squared-L2) centroid per subspace.  Serving is ADC: the QUERY stays
full-precision — its per-subspace dot products against every codebook
entry form an m x ks distance table (bounded: 128 doubles at the
defaults, driver-collected per the bounded-collect convention), and a
candidate's approximate inner product is the sequential m-fold sum of
table lookups at its codes.  Approximate cosine divides by the stored
reconstruction norm (||recon|| = sqrt of the m-fold sum of chosen
centroids' squared norms — reconstruction subvectors are orthogonal
blocks, so the norm is exact, not approximated).

Determinism / oracle contract: every float reduction is the repo's
sequential fold (``similarity.dot`` / the DuckDB ``list_reduce``
twin), argmin encoding breaks ties by code ascending, and the
cross-subspace sums fold in m order — bit-identical across engines,
so the whole encode -> store -> ADC lifecycle sits under the oracle
gate (x105).  Two codebook sources:

- :func:`pq_codebook_first_n` — deterministic first-``ks``-by-id
  subvectors, train-free: the oracle-compact registered form (the same
  convention as the pre-trained IVF quantizer, x12/x21).
- :func:`pq_codebook_kmeans` — per-subspace Lloyd via
  ``ann_index.kmeans_centroids`` (the trained form; x27's oracle shows
  the training chain is SQL-expressible, but at m chains it is pytest-
  covered instead, with the deterministic codebook carrying the oracle
  gate).

Scale shape: encoding is one corpus pass (posexplode to (vec, m) rows
-> broadcast codebook join -> per-(vec, m) argmin window); the codes
table is ~dim/ (m) x smaller than the float index, unpartitioned ON
PURPOSE — an ADC scan reads every code (no pruning dimension), and the
point is that reading ALL codes costs less than reading one float
inverted list.  Compose with the IVF coarse quantizer (store codes
partitioned by centroid_id) when corpus size outgrows the full-scan
budget — the codebook/ADC machinery is unchanged.

Zero-norm contract: a zero query or a zero reconstruction scores NULL
(never a fake 0.0 ordering mid-list) — the same NULL-score contract as
the float/int8 serves (round-6 hardening, ``ann_index.py``).
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .similarity import as_double_vec, dot, vector_literal

PQ_M = 8  # subspaces
PQ_KS = 16  # codebook entries per subspace


def _sq_norm(a: F.Column) -> F.Column:
    """Sequential-fold squared norm (l2_norm without the sqrt — kept as
    its own fold so build-time cn2 and the oracle share one shape)."""
    return F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)


def _l2sq(a: F.Column, b: F.Column) -> F.Column:
    """Sequential-fold squared L2 distance (the encode argmin metric)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _subspaces(vec: F.Column, dim: int, m: int) -> F.Column:
    """array of m subvector slices (dim/m dims each, 1-based slicing)."""
    d = dim // m
    return F.array(*[F.slice(vec, i * d + 1, d) for i in range(m)])


def pq_codebook_first_n(
    emb: DataFrame,
    dim: int,
    m: int = PQ_M,
    ks: int = PQ_KS,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Deterministic train-free codebook: subspace ``j``'s entries are
    the ``j``-th subvectors of the first ``ks`` vectors by id, code =
    id rank (0-based).  (m, code, cvec, cn2) — cn2 is the build-time
    squared norm every consumer folds from."""
    # limit-first, then rank: the single-partition row_number window
    # runs over ks rows (bounded), never the corpus
    w = Window.orderBy("_id")
    base = (
        emb.select(F.col(id_col).alias("_id"), as_double_vec(vec_col).alias("v"))
        .orderBy("_id")
        .limit(ks)
        .withColumn("code", (F.row_number().over(w) - 1).cast("int"))
    )
    sub = base.select(
        "code",
        F.posexplode(_subspaces(F.col("v"), dim, m)).alias("m", "cvec"),
    )
    return sub.select(
        F.col("m").cast("int"), "code", "cvec", _sq_norm(F.col("cvec")).alias("cn2")
    )


def pq_codebook_kmeans(
    emb: DataFrame,
    dim: int,
    m: int = PQ_M,
    ks: int = PQ_KS,
    n_iter: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Trained codebook: ``ann_index.kmeans_centroids`` run per
    subspace over that subspace's slices (m independent Lloyd chains,
    each deterministic — farthest-first seeding + the two-level
    bit-stable fold mean).  code = centroid_id rank within the
    subspace (0-based), so downstream encode/ADC are source-agnostic."""
    from .ann_index import kmeans_centroids

    d = dim // m
    parts = []
    for j in range(m):
        sl = emb.select(
            F.col(id_col).alias("vec_id"),
            F.slice(as_double_vec(vec_col), j * d + 1, d).alias("embedding"),
        )
        cents = kmeans_centroids(sl, n_centroids=ks, n_iter=n_iter)
        w = Window.orderBy("centroid_id")
        parts.append(
            cents.select(
                F.lit(j).cast("int").alias("m"),
                (F.row_number().over(w) - 1).cast("int").alias("code"),
                F.col("cvec"),
            )
        )
    cb = parts[0]
    for p in parts[1:]:
        cb = cb.unionByName(p)
    return cb.withColumn("cn2", _sq_norm(F.col("cvec")))


def pq_encode(
    emb: DataFrame,
    codebook: DataFrame,
    dim: int,
    m: int = PQ_M,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """One corpus pass: (vec_id, codes array<int>, recon_norm).

    posexplode to (vec, m, subvector) rows, broadcast-join the codebook
    on m (ks candidates per row), keep the squared-L2 argmin per
    (vec, m) — ties by code ascending — then reassemble per vector:
    codes in m order, recon_norm = sqrt of the m-ORDERED sequential
    fold of chosen cn2 (a groupBy float SUM would have engine-dependent
    partial order; the fold is bit-stable)."""
    sub = emb.select(
        F.col(id_col).alias("vec_id"),
        F.posexplode(_subspaces(as_double_vec(vec_col), dim, m)).alias("m", "sub"),
    )
    cand = sub.join(F.broadcast(codebook), "m").withColumn(
        "d2", _l2sq(F.col("sub"), F.col("cvec"))
    )
    w = Window.partitionBy("vec_id", "m").orderBy(F.asc("d2"), F.asc("code"))
    best = cand.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    grouped = best.groupBy("vec_id").agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("m"), F.col("code"), F.col("cn2")))
        ).alias("ms")
    )
    codes = F.transform(F.col("ms"), lambda s: s["code"])
    rn2 = F.aggregate(
        F.transform(F.col("ms"), lambda s: s["cn2"]), F.lit(0.0), lambda acc, x: acc + x
    )
    return grouped.select(
        "vec_id", codes.alias("codes"), F.sqrt(rn2).alias("recon_norm")
    )


def write_pq_index(
    emb: DataFrame,
    path: str,
    dim: int,
    m: int = PQ_M,
    ks: int = PQ_KS,
    codebook: DataFrame | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    mode: str = "overwrite",
) -> None:
    """Persist codebook + codes.  Layout: ``{path}/codebook`` (m x ks
    rows) and ``{path}/codes`` (vec_id, codes, recon_norm) — the whole
    serving state; ~m bytes/vector of codes vs 8*dim of float64.  The
    default codebook is the deterministic first-``ks`` form; pass the
    kmeans one for trained quality (identical layout).  Appends: new
    vectors encode against the PERSISTED codebook (codes never move
    with corpus growth — the same frozen-quantizer contract as the
    streaming IVF lands)."""
    cb = codebook if codebook is not None else pq_codebook_first_n(
        emb, dim, m, ks, vec_col, id_col
    )
    cb.write.mode(mode).parquet(os.path.join(path, "codebook"))
    spark = emb.sparkSession
    persisted = spark.read.parquet(os.path.join(path, "codebook"))
    pq_encode(emb, persisted, dim, m, vec_col, id_col).write.mode(mode).parquet(
        os.path.join(path, "codes")
    )



def _rank_coarse(cents_rows, qvec: list[float], nprobe: int) -> list[int]:
    """Driver-side coarse-centroid ranking shared by the IVFPQ probes:
    the same left-to-right sequential cosine as the scan-side fold,
    with the scan path's NULL-score contract mirrored — a zero-norm
    centroid (possible: centroids are the first n vectors by id) or a
    zero query yields an UNDEFINED cosine, which ranks LAST (ties by
    centroid_id), never a ZeroDivisionError.  A zero query therefore
    probes the first ``nprobe`` centroids by id and its candidates
    score NULL downstream, exactly as the scan-side scorer would."""

    def _cos(cvec: list[float]) -> float | None:
        dd = 0.0
        for a, b in zip(cvec, qvec):
            dd += a * b
        na = 0.0
        for a in cvec:
            na += a * a
        nb = 0.0
        for b in qvec:
            nb += b * b
        if na == 0.0 or nb == 0.0:
            return None
        return dd / ((na**0.5) * (nb**0.5))

    def _key(r):
        c = _cos(r["cvec"])
        return (c is None, -(c if c is not None else 0.0), r["centroid_id"])

    return [r["centroid_id"] for r in sorted(cents_rows, key=_key)[:nprobe]]


def _adc_parts(spark: SparkSession, path: str, qvec: list[float], m: int):
    """Shared ADC probe machinery: the query's m x ks partial-dot table
    as a nested literal column (computed with the build's sequential
    folds in one tiny Spark job over the codebook — bounded driver
    collect) plus the query norm (same fold)."""
    d = len(qvec) // m
    cb = spark.read.parquet(os.path.join(path, "codebook"))
    qsub = F.array(
        *[vector_literal(qvec[j * d : (j + 1) * d]) for j in range(m)]
    )
    dtab = (
        cb.withColumn("p", dot(F.element_at(qsub, F.col("m") + 1), F.col("cvec")))
        .select("m", "code", "p")
        .collect()
    )
    table: dict[tuple[int, int], float] = {(r.m, r.code): r.p for r in dtab}
    ks = 1 + max(c for (_, c) in table)
    dt_rows = [[float(table[(j, c)]) for c in range(ks)] for j in range(m)]
    # r15: one parsed array literal per subspace row (vector_literal —
    # bit-exact, pinned by test) instead of m x ks F.lit py4j round
    # trips, and the query norm computed DRIVER-SIDE with the identical
    # left-fold sequence _sq_norm evaluates (acc = (acc + x*x) in array
    # order, IEEE doubles, math.sqrt == Math.sqrt correctly rounded) —
    # drops the one-row Spark job this helper launched per probe.
    dt_col = F.array(*[vector_literal(row) for row in dt_rows])
    acc = 0.0
    for x in qvec:
        acc += float(x) * float(x)
    return dt_col, math.sqrt(acc)


def pq_adc_probe(
    spark: SparkSession, path: str, qvec: list[float], k: int = 5, m: int = PQ_M
) -> DataFrame:
    """ADC top-``k`` from the persisted PQ index: build the query's
    m x ks partial-dot table with the SAME sequential folds the index
    was built with (one tiny Spark job over the m x ks codebook,
    driver-collected — bounded, 128 doubles at the defaults), then one
    scan of the codes table where each row's approximate inner product
    is the m-ordered fold of table lookups at its codes.  Approximate
    cosine divides by the stored reconstruction norm and the query
    norm; zero norms score NULL (the serve NULL-score contract).
    Returns (vec_id, cos_approx), top-k by (cos_approx desc, vec_id).
    TakeOrderedAndProject over a scan that reads ~m bytes + one double
    per vector — the point of the representation."""
    dt_col, qn = _adc_parts(spark, path, qvec, m)
    codes = spark.read.parquet(os.path.join(path, "codes"))
    raw = F.aggregate(
        F.transform(
            F.col("codes"),
            lambda c, i: F.element_at(F.element_at(dt_col, i + 1), c + 1),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cos = F.when(
        (F.col("recon_norm") > 0) & (F.lit(qn) > 0),
        raw / (F.lit(qn) * F.col("recon_norm")),
    )
    return (
        codes.select("vec_id", cos.alias("cos_approx"))
        .orderBy(F.desc("cos_approx"), F.asc("vec_id"))
        .limit(k)
    )


def append_pq_codes(
    emb_new: DataFrame,
    path: str,
    dim: int,
    m: int = PQ_M,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> None:
    """Incremental append: encode NEW vectors against the PERSISTED
    codebook (codes never move with corpus growth — the frozen-
    quantizer contract of the streaming IVF lands) and append to the
    codes table.  New generations must carry new vec_ids (the shared
    append contract)."""
    spark = emb_new.sparkSession
    cb = spark.read.parquet(os.path.join(path, "codebook"))
    pq_encode(emb_new, cb, dim, m, vec_col, id_col).write.mode("append").parquet(
        os.path.join(path, "codes")
    )


def pq_knn_join(
    spark: SparkSession,
    queries: DataFrame,
    path: str,
    k: int = 3,
    m: int = PQ_M,
    dim: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Batch ADC kNN join — every full-precision query against the
    PERSISTED codes table: the batch twin of :func:`pq_adc_probe` and
    the compressed sibling of ``similarity.knn_join_exact``.

    Per query the scoring is a distance-TABLE lookup fold (m array
    accesses + m adds) instead of a dim-element dot — ~dim/m less
    arithmetic per candidate at recall bounded by the quantizer.  The
    per-query tables are built distributed (query subspaces x broadcast
    codebook -> per-(q, m) code rows -> two-level reassembly into
    array<array<double>>, code-sorted inside m-sorted), then the
    O(batch) table side broadcasts over one codes scan.  All
    reductions are the sequential folds of the build, so the batch
    join sits under the oracle gate (x106).

    Returns (q_id, c_id, cos_approx, rn), rn = 1..k, ties by c_id;
    zero-norm rows score NULL and rank after every real score (the
    serve NULL-score contract)."""
    cb = spark.read.parquet(os.path.join(path, "codebook"))
    if dim is None:
        dim = m * len(cb.select("cvec").first()["cvec"])
    q = queries.select(
        F.col(id_col).alias("q_id"),
        as_double_vec(vec_col).alias("qv"),
    ).withColumn("qn", F.sqrt(_sq_norm(F.col("qv"))))
    qsub = q.select(
        "q_id", F.posexplode(_subspaces(F.col("qv"), dim, m)).alias("m", "sub")
    )
    qdt_flat = qsub.join(F.broadcast(cb), "m").select(
        "q_id", "m", "code", dot(F.col("sub"), F.col("cvec")).alias("p")
    )
    per_m = qdt_flat.groupBy("q_id", "m").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("code", "p"))), lambda s: s["p"]
        ).alias("row")
    )
    qdt = per_m.groupBy("q_id").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("m", "row"))), lambda s: s["row"]
        ).alias("dt")
    )
    qside = qdt.join(q.select("q_id", "qn"), "q_id")

    codes = spark.read.parquet(os.path.join(path, "codes"))
    raw = F.aggregate(
        F.transform(
            F.col("codes"),
            lambda c, i: F.element_at(F.element_at(F.col("dt"), i + 1), c + 1),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cos = F.when(
        (F.col("recon_norm") > 0) & (F.col("qn") > 0),
        raw / (F.col("qn") * F.col("recon_norm")),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_approx"), F.asc("c_id"))
    return (
        F.broadcast(qside)
        .crossJoin(codes.select(F.col("vec_id").alias("c_id"), "codes", "recon_norm"))
        .withColumn("cos_approx", cos)
        .withColumn("rn", F.row_number().over(w).cast("int"))
        .filter(F.col("rn") <= k)
        .select("q_id", "c_id", "cos_approx", "rn")
    )


def pq_refine_knn_join(
    spark: SparkSession,
    queries: DataFrame,
    corpus: DataFrame,
    path: str,
    k: int = 3,
    k_shortlist: int = 10,
    m: int = PQ_M,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Two-stage retrieval: PQ shortlist, exact rerank — the classic
    refine step (FAISS's IndexRefineFlat shape, public knowledge): the
    CORPUS pass stays compressed (:func:`pq_knn_join` over the codes
    table, ~m bytes + one double per vector), producing a
    ``k_shortlist``-deep candidate set per query; only the shortlist's
    O(batch * k_shortlist) rows fetch their full-precision vectors for
    an exact cosine rerank.  Recall is bounded by whether the true
    top-k survive the ADC shortlist (the x108 audit measures exactly
    that); the rerank removes the quantizer's RANKING error within the
    shortlist for free.

    Scale shape: stage 1 is the x106 plan (broadcast O(batch) distance
    tables over one codes scan); stage 2 broadcasts the shortlist's
    distinct candidate ids as a semi-join against the float table —
    the ONLY full-precision rows read all run are the fetched
    candidates, so the float scan cost is a hash-semi-join scan, never
    a shuffle of the corpus.  All reductions are the build's
    sequential folds (the same exact-cosine expression as
    ``similarity.knn_join_exact``), so the whole two-stage lifecycle
    is oracle-expressible (x114).

    Returns (q_id, c_id, cos_exact, rn), rn = 1..k by (cos_exact desc,
    c_id asc); a zero-norm side scores NULL and ranks after every real
    score (the serve NULL-score contract)."""
    short = pq_knn_join(
        spark, queries, path, k=k_shortlist, m=m, vec_col=vec_col, id_col=id_col
    ).select("q_id", "c_id")
    qv = queries.select(
        F.col(id_col).alias("q_id"), as_double_vec(vec_col).alias("qvec")
    ).withColumn("qn", F.sqrt(_sq_norm(F.col("qvec"))))
    cv = corpus.select(
        F.col(id_col).alias("c_id"), as_double_vec(vec_col).alias("cvec")
    ).withColumn("cn", F.sqrt(_sq_norm(F.col("cvec"))))
    fetched = cv.join(
        F.broadcast(short.select("c_id").distinct()), "c_id", "left_semi"
    )
    exact = (
        short.join(F.broadcast(qv), "q_id")
        .join(fetched, "c_id")
        .withColumn(
            "cos_exact",
            F.when(
                (F.col("qn") > 0) & (F.col("cn") > 0),
                dot(F.col("qvec"), F.col("cvec")) / (F.col("qn") * F.col("cn")),
            ),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_exact"), F.asc("c_id"))
    return (
        exact.withColumn("rn", F.row_number().over(w).cast("int"))
        .filter(F.col("rn") <= k)
        .select("q_id", "c_id", "cos_exact", "rn")
    )


# ---------------------------------------------------------------------------
# IVF + PQ composite: pruned AND compressed
# ---------------------------------------------------------------------------


def write_ivfpq_index(
    emb: DataFrame,
    path: str,
    dim: int,
    n_centroids: int = 16,
    m: int = PQ_M,
    ks: int = PQ_KS,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    mode: str = "overwrite",
) -> None:
    """IVF + PQ: codes PARTITIONED by coarse centroid — the composite
    that makes the full-scan ADC probe (:func:`pq_adc_probe`) pruned:
    an nprobe probe reads only the probed lists' code files, each
    ~dim*8/m x smaller than float rows.  This is the FAISS IVFPQ
    layout; at 100 TB it is the serving architecture — partition
    pruning bounds the scan, PQ bounds the bytes per scanned row.

    Coarse quantizer: the deterministic first-``n_centroids``-by-id
    table with ``ann_index.assign_to_centroids``'s argmax-cosine
    assignment (bit-identical to the plain IVF build, so the oracle
    chains compose).  PQ codebook: the GLOBAL raw-vector codebook
    shared across lists — list-independent, so appends and the oracle
    stay simple; encoding per-list RESIDUALS (v - centroid) is the
    classic refinement and drops in here as one zip_with subtraction
    before :func:`pq_encode` plus the matching term in the ADC table.

    Layout: ``{path}/centroids`` (coarse), ``{path}/codebook`` (PQ),
    ``{path}/codes/centroid_id=C`` (vec_id, codes, recon_norm)."""
    from .ann_index import assign_to_centroids

    spark = emb.sparkSession
    cents = (
        emb.orderBy(id_col)
        .limit(n_centroids)
        .select(F.col(id_col).alias("centroid_id"), as_double_vec(vec_col).alias("cvec"))
    )
    cents.write.mode(mode).parquet(os.path.join(path, "centroids"))
    cb = pq_codebook_first_n(emb, dim, m, ks, vec_col, id_col)
    cb.write.mode(mode).parquet(os.path.join(path, "codebook"))
    persisted_cb = spark.read.parquet(os.path.join(path, "codebook"))
    persisted_cents = spark.read.parquet(os.path.join(path, "centroids"))

    assigned = assign_to_centroids(emb, persisted_cents, vec_col, id_col).select(
        id_col, "centroid_id"
    )
    codes = pq_encode(emb, persisted_cb, dim, m, vec_col, id_col).join(
        assigned.withColumnRenamed(id_col, "vec_id"), "vec_id"
    )
    (
        codes.repartition(F.col("centroid_id"))
        .write.mode(mode)
        .partitionBy("centroid_id")
        .parquet(os.path.join(path, "codes"))
    )


def ivfpq_probe(
    spark: SparkSession,
    path: str,
    qvec: list[float],
    k: int = 5,
    nprobe: int = 1,
    m: int = PQ_M,
) -> DataFrame:
    """ADC top-``k`` over the ``nprobe`` nearest inverted lists of an
    IVFPQ index: centroid selection is a driver-side fetch of the
    n_c-row coarse table (the ``ivf_index_probe`` convention — the
    Python cosine is the same left-to-right sequential sum as the
    fold, bit-equal), the codes scan carries a literal IN-list
    PARTITION filter, and each scanned row pays m table lookups.
    Recall follows the coarse quantizer exactly as for plain IVF —
    the PQ stage changes bytes-per-row, never which rows are read."""
    cents = spark.read.parquet(os.path.join(path, "centroids")).collect()
    probe_ids = _rank_coarse(cents, qvec, nprobe)

    dt_col, qn = _adc_parts(spark, path, qvec, m)
    codes = spark.read.parquet(os.path.join(path, "codes")).filter(
        F.col("centroid_id").isin(probe_ids)
    )
    raw = F.aggregate(
        F.transform(
            F.col("codes"),
            lambda c, i: F.element_at(F.element_at(dt_col, i + 1), c + 1),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cos = F.when(
        (F.col("recon_norm") > 0) & (F.lit(qn) > 0),
        raw / (F.lit(qn) * F.col("recon_norm")),
    )
    return (
        codes.select("vec_id", cos.alias("cos_approx"))
        .orderBy(F.desc("cos_approx"), F.asc("vec_id"))
        .limit(k)
    )


# ---------------------------------------------------------------------------
# Residual IVFPQ: the classic form (encode v - centroid)
# ---------------------------------------------------------------------------


def write_ivfpq_residual_index(
    emb: DataFrame,
    path: str,
    dim: int,
    n_centroids: int = 16,
    m: int = PQ_M,
    ks: int = PQ_KS,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    mode: str = "overwrite",
) -> None:
    """Classic IVFPQ: codes quantize the RESIDUAL v - c(v) against a
    residual codebook (first-``ks`` residuals by id, deterministic),
    and each row stores the exact reconstruction norm
    ||c(v) + decode(codes)|| (per-subspace recon folds summed in m
    order).  HONEST quality note: residual encoding pays off when the
    coarse assignment is TIGHT (real clustered embeddings — residual
    magnitudes shrink, so the same ks resolves finer structure); on
    isotropic random vectors the residual is no smaller than the
    vector (c(v) is nearly orthogonal to v) and the raw-vector form
    (:func:`write_ivfpq_index`) measures equal-or-better — which is
    why both forms exist and the recall audit (x108's machinery) is
    how you choose per corpus.

    Layout matches :func:`write_ivfpq_index` plus the residual
    codebook semantics: ``centroids``, ``codebook`` (residual),
    ``codes/centroid_id=C`` (vec_id, codes, recon_norm)."""
    from .ann_index import assign_to_centroids

    spark = emb.sparkSession
    cents = (
        emb.orderBy(id_col)
        .limit(n_centroids)
        .select(F.col(id_col).alias("centroid_id"), as_double_vec(vec_col).alias("cvec"))
    )
    cents.write.mode(mode).parquet(os.path.join(path, "centroids"))
    p_cents = spark.read.parquet(os.path.join(path, "centroids"))

    assigned = assign_to_centroids(emb, p_cents, vec_col, id_col).select(
        F.col(id_col).alias("vec_id"), vec_col, "centroid_id"
    )
    av = assigned.join(F.broadcast(p_cents), "centroid_id").select(
        "vec_id",
        "centroid_id",
        F.zip_with(as_double_vec(vec_col), F.col("cvec"), lambda a, b: a - b).alias(
            "resid"
        ),
        F.col("cvec"),
    )
    rcb = pq_codebook_first_n(av, dim, m, ks, vec_col="resid", id_col="vec_id")
    rcb.write.mode(mode).parquet(os.path.join(path, "codebook"))
    p_rcb = spark.read.parquet(os.path.join(path, "codebook"))

    sub = av.select(
        "vec_id",
        "centroid_id",
        F.posexplode(_subspaces(F.col("resid"), dim, m)).alias("m", "sub"),
        _subspaces(F.col("cvec"), dim, m).alias("csubs"),
    ).withColumn("csub", F.element_at(F.col("csubs"), F.col("m") + 1))
    cand = sub.join(F.broadcast(p_rcb), "m").withColumn(
        "d2", _l2sq(F.col("sub"), F.col("cvec"))
    )
    w = Window.partitionBy("vec_id", "m").orderBy(F.asc("d2"), F.asc("code"))
    best = (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .withColumn("recon_m", F.zip_with(F.col("csub"), F.col("cvec"), lambda a, b: a + b))
        .withColumn("cn2", _sq_norm(F.col("recon_m")))
    )
    grouped = best.groupBy("vec_id", "centroid_id").agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("m"), F.col("code"), F.col("cn2")))
        ).alias("ms")
    )
    codes = F.transform(F.col("ms"), lambda s: s["code"])
    rn2 = F.aggregate(
        F.transform(F.col("ms"), lambda s: s["cn2"]), F.lit(0.0), lambda acc, x: acc + x
    )
    out = grouped.select(
        "vec_id", codes.alias("codes"), F.sqrt(rn2).alias("recon_norm"), "centroid_id"
    )
    (
        out.repartition(F.col("centroid_id"))
        .write.mode(mode)
        .partitionBy("centroid_id")
        .parquet(os.path.join(path, "codes"))
    )


def ivfpq_residual_probe(
    spark: SparkSession,
    path: str,
    qvec: list[float],
    k: int = 5,
    nprobe: int = 1,
    m: int = PQ_M,
) -> DataFrame:
    """ADC over the residual-encoded lists: a candidate's approximate
    inner product is dot(q, c_list) + the m-ordered fold of residual
    table lookups (the fold's INITIAL accumulator is the per-list
    centroid dot, mirrored exactly by the oracle's list_prepend) —
    both terms computed with the build's sequential folds in one tiny
    Spark job.  Same pruning and NULL-score contract as
    :func:`ivfpq_probe`."""
    cents_rows = spark.read.parquet(os.path.join(path, "centroids")).collect()
    probe_ids = _rank_coarse(cents_rows, qvec, nprobe)

    dt_col, qn = _adc_parts(spark, path, qvec, m)
    # per-probed-list centroid dot, with the SAME fold as the scoring
    cents_df = spark.read.parquet(os.path.join(path, "centroids")).filter(
        F.col("centroid_id").isin(probe_ids)
    )
    qc_rows = cents_df.select(
        "centroid_id", dot(vector_literal(qvec), F.col("cvec")).alias("qc")
    ).collect()
    qc_df = spark.createDataFrame(
        [(int(r.centroid_id), float(r.qc)) for r in qc_rows], "centroid_id long, qc double"
    )

    codes = (
        spark.read.parquet(os.path.join(path, "codes"))
        .filter(F.col("centroid_id").isin(probe_ids))
        .join(F.broadcast(qc_df), "centroid_id")
    )
    raw = F.aggregate(
        F.transform(
            F.col("codes"),
            lambda c, i: F.element_at(F.element_at(dt_col, i + 1), c + 1),
        ),
        F.col("qc"),
        lambda acc, x: acc + x,
    )
    cos = F.when(
        (F.col("recon_norm") > 0) & (F.lit(qn) > 0),
        raw / (F.lit(qn) * F.col("recon_norm")),
    )
    return (
        codes.select("vec_id", cos.alias("cos_approx"))
        .orderBy(F.desc("cos_approx"), F.asc("vec_id"))
        .limit(k)
    )


# ---------------------------------------------------------------------------
# OPQ-lite: variance-balanced dimension permutation (structured OPQ)
# ---------------------------------------------------------------------------


def opq_dim_permutation(
    emb: DataFrame,
    dim: int,
    m: int = PQ_M,
    sample_n: int = 256,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[int]:
    """A deterministic, oracle-expressible stand-in for OPQ's learned
    rotation (Ge et al., CVPR 2013 — public knowledge): PERMUTE
    dimensions so per-subspace energy is balanced before product
    quantization.  The paper's non-parametric form learns an
    orthogonal rotation by alternating SVD (libm-bound, outside the
    no-libm oracle contract); its structured cousin — reorder
    dimensions so each codebook sees a comparable energy budget — is
    the standard cheap variant (FAISS ships random rotation for the
    same purpose) and is a permutation matrix, i.e. exactly an
    orthogonal rotation restricted to {0,1} entries: inner products
    and norms are invariant, so ADC semantics are unchanged.

    Energy statistic: sum of squares per dimension over the FIRST
    ``sample_n`` vectors by id — a bounded deterministic sample
    (bounded-collect convention), folded in id order left-to-right so
    Python, Spark and DuckDB agree bitwise.  Allocation: rank
    dimensions by (energy desc, dim asc) and deal them to the m
    subspaces in SNAKE order (0..m-1, m-1..0, ...) — each subspace
    gets dim/m dims with matched energy mix (the greedy balanced-
    allocation heuristic).  Returns the permutation P as a list:
    permuted[i] = v[P[i]], subspace j owning P[j*dim/m : (j+1)*dim/m].
    """
    rows = (
        emb.orderBy(id_col)
        .limit(sample_n)
        .select(F.col(id_col).alias("_id"), as_double_vec(vec_col).alias("v"))
        .collect()
    )
    rows.sort(key=lambda r: r._id)
    energy = [0.0] * dim
    for r in rows:
        v = r.v
        for i in range(dim):
            energy[i] += v[i] * v[i]
    ranked = sorted(range(dim), key=lambda i: (-energy[i], i))
    subs: list[list[int]] = [[] for _ in range(m)]
    for r, d in enumerate(ranked):
        rnd, p = divmod(r, m)
        j = p if rnd % 2 == 0 else m - 1 - p
        subs[j].append(d)
    return [d for j in range(m) for d in subs[j]]


def write_opq_index(
    emb: DataFrame,
    path: str,
    dim: int,
    m: int = PQ_M,
    ks: int = PQ_KS,
    sample_n: int = 256,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    mode: str = "overwrite",
) -> None:
    """PQ index over PERMUTED vectors: the permutation is computed
    once (:func:`opq_dim_permutation`), persisted at ``{path}/perm``
    (the index's rotation parameter — appends and probes read it, the
    frozen-quantizer contract extended to the transform), and the
    standard :func:`write_pq_index` machinery runs on the permuted
    corpus.  Inner products are permutation-invariant, so scores are
    exact cosines of the same vectors — only the SUBSPACE BOUNDARIES
    move, which is the entire point: a subspace that mixes high- and
    low-energy dimensions spends its ks codes on structure instead of
    wasting codebook entries on near-constant blocks."""
    spark = emb.sparkSession
    perm = opq_dim_permutation(emb, dim, m, sample_n, vec_col, id_col)
    spark.createDataFrame([(perm,)], "perm array<int>").write.mode(mode).parquet(
        os.path.join(path, "perm")
    )
    stored = [int(i) for i in
              spark.read.parquet(os.path.join(path, "perm")).first()["perm"]]
    pv = as_double_vec(vec_col)
    permuted = emb.select(
        F.col(id_col),
        F.array(*[pv.getItem(i) for i in stored]).alias(vec_col),
    )
    write_pq_index(permuted, path, dim, m, ks, vec_col=vec_col, id_col=id_col, mode=mode)


def opq_adc_probe(
    spark: SparkSession, path: str, qvec: list[float], k: int = 5, m: int = PQ_M
) -> DataFrame:
    """ADC probe of an OPQ index: the stored permutation applies to
    the QUERY (driver-side — the perm table is one bounded row), then
    the scan is exactly :func:`pq_adc_probe` over the permuted codes.
    Same NULL-score contract, same top-k total order."""
    perm = [int(i) for i in spark.read.parquet(os.path.join(path, "perm")).first()["perm"]]
    return pq_adc_probe(spark, path, [float(qvec[i]) for i in perm], k=k, m=m)
