"""Similarity search over embedding columns (north-star extension).

Design for 100 TB / billions of vectors:

- **Brute-force cosine top-k** is the correctness baseline: one scan,
  the query vector is a literal (broadcast into codegen), per-partition
  top-k then a driver merge (``TakeOrderedAndProject``) — no shuffle of
  the vector column at all.
- **LSH (random hyperplanes)**: each vector gets a small integer bucket
  signature; the persisted form — table WRITTEN partitioned by bucket,
  probe = partition-pruned scan — is ``operators/ann_index.py``
  (write_lsh_index / lsh_index_probe, x20).  The query-time form here
  is the oracle-checked baseline.
- **IVF**: coarse centroids, assignment = argmax cosine, probe
  ``nprobe`` inverted lists.  Persisted inverted-list layout and the
  k-means-trained quantizer live in ``operators/ann_index.py``
  (write_ivf_index / ivf_index_probe / kmeans_centroids, x21/x27).

All float math is double-precision sequential folds — bit-identical to
the DuckDB oracle's ``list_reduce`` twin (verified, not assumed).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def as_double_vec(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (deterministic summation order)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def vector_literal(values: list[float]) -> Column:
    """One ``array<double>`` literal in a single py4j round trip.

    ``F.lit(list)`` is NOT one call in this PySpark: it expands to
    ``array(lit(v0), lit(v1), …)`` — one gateway round trip per
    element, measured ~33 ms per 64-float plane, which made literal
    construction (32 planes × 64 floats ≈ 1.0 s) the single largest
    term of the ANN queries' plan-build time.  Rendering the literal
    as SQL text instead hands the whole array to the parser in one
    call.  Values are bit-identical: ``repr`` round-trips doubles and
    Spark's decimal-literal parse is correctly rounded; the rare
    exponent-form repr goes through a string CAST, which parses the
    same shortest-round-trip decimal.  Schema note: that CAST path
    makes the array type ``containsNull=true`` (vs the non-null
    ``F.lit`` array) — harmless while literals only feed intermediate
    expressions, but assert non-null first if one ever reaches an
    output schema."""
    parts = []
    for v in values:
        r = repr(float(v))
        if "e" in r or "E" in r or "n" in r or "f" in r:  # 1e-05 / nan / inf
            parts.append(f"CAST('{r}' AS DOUBLE)")
        else:
            parts.append(f"{r}D")
    return F.expr(f"array({', '.join(parts)})")


def brute_force_topk(emb: DataFrame, query_vec: list[float], k: int, vec_col: str = "embedding") -> DataFrame:
    """Baseline ANN: exact cosine top-k against a literal query vector."""
    v = as_double_vec(vec_col)
    q = vector_literal(query_vec)
    return (
        emb.select("vec_id", cosine(v, q).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), "vec_id")
        .limit(k)
    )


def brute_force_topk_arrow(
    emb: DataFrame, query_vec: list[float], k: int, vec_col: str = "embedding"
) -> DataFrame:
    """Throughput variant of :func:`brute_force_topk`: the cosine is an
    Arrow-batched Pandas UDF doing one BLAS matrix-vector product per
    batch instead of an interpreted per-element fold.

    Spark's higher-order-function evaluator interprets the fold per
    element — fine for the oracle-exact baseline, ~10-40× too slow for
    a billion-vector scan.  Here each Arrow batch becomes one
    ``(batch, dim) @ (dim,)`` numpy product.  Top-k stays
    ``TakeOrderedAndProject`` (no shuffle of vectors).

    numpy's pairwise-blocked summation ≠ the fold's sequential order,
    so results may differ in the last ulp — this variant is pinned to
    the fold baseline within 1e-9 by test, and the fold variant remains
    the DuckDB-oracle path."""
    qv = np.asarray(query_vec, dtype=np.float64)
    qn = float(np.linalg.norm(qv))

    @pandas_udf("double")
    def _cos(col: pd.Series) -> pd.Series:
        m = np.stack(col.to_numpy()).astype(np.float64, copy=False)
        return pd.Series((m @ qv) / (np.linalg.norm(m, axis=1) * qn))

    return (
        emb.select("vec_id", _cos(F.col(vec_col)).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), "vec_id")
        .limit(k)
    )


def hyperplanes(n_planes: int, dim: int, seed: str = "lsh") -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes from md5 — reproducible in
    any engine (the oracle embeds the same literals).  Component =
    first-8-hex-digits of md5(seed:plane:dim) scaled to [-1, 1)."""
    planes = []
    for p in range(n_planes):
        row = []
        for j in range(dim):
            h = int(hashlib.md5(f"{seed}:{p}:{j}".encode()).hexdigest()[:8], 16)
            row.append(h / float(1 << 31) - 1.0)
        planes.append(row)
    return planes


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit signature as a small int: bit p set ⇔ v·plane_p > 0."""
    bucket = F.lit(0)
    for p, plane in enumerate(planes):
        bit = F.when(dot(vec, vector_literal(plane)) > 0, F.lit(1 << p)).otherwise(F.lit(0))
        bucket = bucket + bit
    return bucket


def lsh_topk(emb: DataFrame, query_vec: list[float], k: int, n_planes: int = 4, vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k: probe only the query's sign bucket, computed
    at query time over the full scan — the oracle-checked baseline.
    The write-once / probe-one-partition form is
    ``ann_index.write_lsh_index`` / ``lsh_index_probe`` (x20, plan-
    pinned partition pruning)."""
    dim = len(query_vec)
    planes = hyperplanes(n_planes, dim)
    v = as_double_vec(vec_col)
    # query bucket computed driver-side (plain python, same md5 planes)
    qb = 0
    for p, plane in enumerate(planes):
        if sum(a * b for a, b in zip(query_vec, plane)) > 0:
            qb |= 1 << p
    q = vector_literal(query_vec)
    return (
        emb.withColumn("bucket", lsh_bucket(v, planes))
        .filter(F.col("bucket") == qb)
        .select("vec_id", cosine(v, q).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), "vec_id")
        .limit(k)
    )


def ivf_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int,
    n_centroids: int = 16,
    vec_col: str = "embedding",
    nprobe: int = 1,
) -> DataFrame:
    """IVF: centroids are the first ``n_centroids`` vectors by id
    (deterministic, oracle-expressible coarse quantizer — the k-means
    trained one is ``ann_index.kmeans_centroids``), every vector is
    assigned to its argmax-cosine centroid, the query probes its
    ``nprobe`` nearest centroids' inverted lists (recall dial:
    nprobe=1 fastest, nprobe=n_centroids ≡ brute force — pinned by
    test).

    The centroid set is collected once (tiny) and joined as a literal-
    free broadcast; assignment is a rank-1 window over n_centroids rows
    per vector.  This recompute-per-query form is the oracle baseline;
    the persisted inverted-list layout with partition-pruned probes is
    ``ann_index.write_ivf_index`` / ``ivf_index_probe`` (x21/x27)."""
    spark = emb.sparkSession
    # centroid norms ride in the broadcast frame and each vector's norm
    # is folded once, not once per centroid (identical expression —
    # c_cos stays bit-exact)
    cents = (
        emb.orderBy("vec_id")
        .limit(n_centroids)
        .select(
            F.col("vec_id").alias("centroid_id"),
            as_double_vec(vec_col).alias("cvec"),
            l2_norm(as_double_vec(vec_col)).alias("c_n"),
        )
    )
    v = as_double_vec(vec_col)
    q = vector_literal(query_vec)

    assigned = (
        emb.select("vec_id", v.alias("v"), l2_norm(v).alias("v_n"))
        .crossJoin(F.broadcast(cents))
        .withColumn(
            "c_cos", dot(F.col("v"), F.col("cvec")) / (F.col("v_n") * F.col("c_n"))
        )
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("c_cos"), "centroid_id")
    assigned = assigned.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)

    # query's nprobe nearest centroids, computed the same way
    qdf = spark.range(1).select(q.alias("v"), l2_norm(q).alias("v_n"))
    qc = (
        qdf.crossJoin(F.broadcast(cents))
        .withColumn(
            "c_cos", dot(F.col("v"), F.col("cvec")) / (F.col("v_n") * F.col("c_n"))
        )
        .orderBy(F.desc("c_cos"), "centroid_id")
        .limit(nprobe)
        .select("centroid_id")
    )
    return (
        assigned.join(F.broadcast(qc), "centroid_id")
        .select("vec_id", cosine(F.col("v"), q).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), "vec_id")
        .limit(k)
    )


def quantize_vec(vec: Column) -> Column:
    """Symmetric int8 quantization: q_i = round(x_i / scale · 127) with
    scale = max|x| per vector — 4× smaller storage and integer-math
    search at 100 TB.  All-zero vectors quantize to NULL (no scale).
    round() is half-away-from-zero in both Spark (HALF_UP) and DuckDB
    (C round), so the oracle mirrors this expression verbatim."""
    scale = F.nullif(F.array_max(F.transform(vec, lambda x: F.abs(x))), F.lit(0.0))
    return F.transform(vec, lambda x: F.round(x / scale * 127, 0).cast("int"))


def quantized_cosine(qa: Column, qb: Column) -> Column:
    """Cosine over int8-quantized vectors: integer dot / integer norms
    — the sums are exact integer folds (order-independent!), the two
    sqrts and one division are single IEEE ops, so the result is
    bit-deterministic in any engine."""
    def int_fold(products: Column) -> Column:
        return F.aggregate(products, F.lit(0).cast("long"), lambda acc, x: acc + x)

    dot_q = int_fold(F.zip_with(qa, qb, lambda x, y: (x * y).cast("long")))
    na = F.sqrt(int_fold(F.transform(qa, lambda x: (x * x).cast("long"))).cast("double"))
    nb = F.sqrt(int_fold(F.transform(qb, lambda x: (x * x).cast("long"))).cast("double"))
    return dot_q.cast("double") / (na * nb)


def quantized_topk(
    emb: DataFrame, query_vec: list[float], k: int, vec_col: str = "embedding"
) -> DataFrame:
    """Brute-force top-k over int8-quantized vectors — the compressed
    search path: ~4× less data scanned per query at an accuracy cost
    bounded by the quantization step."""
    v_q = quantize_vec(as_double_vec(vec_col))
    q_q = quantize_vec(vector_literal(query_vec))
    return (
        emb.select("vec_id", quantized_cosine(v_q, q_q).alias("q_cos"))
        .filter(F.col("q_cos").isNotNull())
        .orderBy(F.desc("q_cos"), "vec_id")
        .limit(k)
    )


def quantized_topk_arrow(
    emb: DataFrame, query_vec: list[float], k: int, vec_col: str = "embedding"
) -> DataFrame:
    """Throughput variant of :func:`quantized_topk` — same int8
    quantization + integer cosine, executed as one numpy integer
    matmul per Arrow batch instead of ~5 interpreted HOF folds per
    vector.

    EXACTLY equal to the fold path (pinned by test, not ≤ε): the
    integer dot/norm sums are order-independent, quantization runs the
    identical double expression ``(x / scale) * 127`` with
    half-away-from-zero rounding, and the final division is the same
    single IEEE op — so unlike the float Arrow path (1e-9 pin), this
    one is bit-deterministic and the driver oracle stays green on it."""
    qv = np.asarray(query_vec, dtype=np.float64)
    qscale = float(np.abs(qv).max()) if qv.size else 0.0
    if qscale == 0.0:
        return quantized_topk(emb, query_vec, k, vec_col)  # degenerate: empty result
    qs = (qv / qscale) * 127.0
    qq = (np.sign(qs) * np.floor(np.abs(qs) + 0.5)).astype(np.int64)
    qnorm = float(np.sqrt(float(qq @ qq)))

    @pandas_udf("double")
    def _qcos(col: pd.Series) -> pd.Series:
        m = np.stack(col.to_numpy()).astype(np.float64, copy=False)
        s = np.abs(m).max(axis=1)
        safe = np.where(s == 0.0, 1.0, s)
        ms = (m / safe[:, None]) * 127.0
        mq = (np.sign(ms) * np.floor(np.abs(ms) + 0.5)).astype(np.int64)
        dot = (mq @ qq).astype(np.float64)
        norms = np.sqrt((mq * mq).sum(axis=1).astype(np.float64))
        out = pd.Series(dot / (norms * qnorm))
        return out.mask(s == 0.0)  # all-zero vectors quantize to NULL

    return (
        emb.select("vec_id", _qcos(F.col(vec_col)).alias("q_cos"))
        .filter(F.col("q_cos").isNotNull())
        .orderBy(F.desc("q_cos"), "vec_id")
        .limit(k)
    )


def embedding_near_dup_lsh(
    emb: DataFrame,
    threshold: float,
    dim: int,
    n_planes: int = 4,
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-dup pairs blocked by the LSH sign bucket —
    the unsupervised form of :func:`embedding_near_dup_pairs` for the
    realistic corpus that has NO label column: the random-hyperplane
    bucket is the blocking/shuffle key, candidate generation is a
    same-bucket self-join (never O(n²)), and the exact cosine re-check
    keeps only true near-dups.  Approximate by construction: a pair
    split across buckets is missed with probability growing in its
    angle — the standard LSH recall trade, tunable via ``n_planes``
    (fewer planes = bigger buckets = higher recall, more join work).

    **Sizing contract**: the self-join is quadratic WITHIN a bucket, so
    ``n_planes`` must scale with corpus cardinality to hold per-bucket
    membership roughly constant — ``n_planes ≈ lg(n / target_bucket)``.
    Measured (BENCH_NOTES.md): 4 planes at 200 K vectors is ~12.5 K per
    bucket ≈ 1.2 B candidate pairs, unfinishable on local[32]; 11
    planes (~100/bucket) finishes in 15.5 s.  The default of 4 fits the
    ~2 K-vector driver fixture only."""
    planes = hyperplanes(n_planes, dim)
    # per-side norm precompute: within-bucket pairs are quadratic in
    # bucket size, so folding each vector's norm per PAIR would cost
    # |pairs|/|vectors| redundant 64-element folds; the precomputed
    # value is the identical expression — cos_sim stays bit-exact
    e = emb.select(
        "vec_id", as_double_vec(vec_col).alias("v")
    ).withColumn("bucket", lsh_bucket(F.col("v"), planes)).withColumn(
        "nrm", l2_norm(F.col("v"))
    )
    a = e.select(
        F.col("vec_id").alias("a_id"), "bucket",
        F.col("v").alias("a_vec"), F.col("nrm").alias("a_n"),
    )
    b = e.select(
        F.col("vec_id").alias("b_id"), "bucket",
        F.col("v").alias("b_vec"), F.col("nrm").alias("b_n"),
    )
    return (
        a.join(b, "bucket")
        .filter(F.col("a_id") < F.col("b_id"))
        .withColumn(
            "cos_sim",
            dot(F.col("a_vec"), F.col("b_vec")) / (F.col("a_n") * F.col("b_n")),
        )
        .filter(F.col("cos_sim") >= threshold)
        .select("a_id", "b_id", "cos_sim")
    )


def vector_centroids(
    vecs: DataFrame,
    group_col: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-group embedding centroid ``(group, n_members, centroid)``
    with a DETERMINISTIC summation order: members are collected sorted
    by id and summed by a sequential fold, so the centroid is bit-stable
    across runs, partitionings and engines — float addition is not
    associative, so a partial-agg ``avg`` drifts in the last ulp
    depending on which partition merges first.

    Cost: one shuffle of the vectors on the group key plus an
    O(members) fold per group — the right shape for near-dup clusters,
    whose groups are small by construction.  For huge groups where ulp
    determinism doesn't matter, ``posexplode → avg(group, dim)`` is the
    mergeable constant-memory alternative (the k-means update step in
    ``ann_index.py:kmeans_centroids`` is exactly that shape)."""
    member = F.struct(
        F.col(id_col).alias("i"), as_double_vec(vec_col).alias("v")
    )
    agg = (
        vecs.select(F.col(group_col), member.alias("m"))
        .groupBy(group_col)
        .agg(F.sort_array(F.collect_list("m")).alias("ms"))
    )
    zero = F.transform(F.element_at(F.col("ms"), 1)["v"], lambda x: F.lit(0.0))
    total = F.aggregate(
        F.col("ms"), zero, lambda acc, m: F.zip_with(acc, m["v"], lambda a, b: a + b)
    )
    n = F.size("ms")
    return agg.select(
        F.col(group_col),
        n.cast("long").alias("n_members"),
        F.transform(total, lambda x: x / n.cast("double")).alias("centroid"),
    )


def embedding_near_dup_pairs(
    emb: DataFrame, threshold: float, vec_col: str = "embedding"
) -> DataFrame:
    """Embedding-cosine near-dup pairs, blocked by label (the coarse
    cluster key): candidate generation is a same-label self-join —
    at 100 TB the label/bucket column is the shuffle key and no O(n²)
    cross join ever materializes."""
    v = as_double_vec(vec_col)
    a = emb.select(
        F.col("vec_id").alias("a_id"), F.col("label"),
        v.alias("a_vec"), l2_norm(v).alias("a_n"),
    )
    b = emb.select(
        F.col("vec_id").alias("b_id"), F.col("label"),
        v.alias("b_vec"), l2_norm(v).alias("b_n"),
    )
    return (
        a.join(b, "label")
        .filter(F.col("a_id") < F.col("b_id"))
        .withColumn(
            "cos_sim",
            dot(F.col("a_vec"), F.col("b_vec")) / (F.col("a_n") * F.col("b_n")),
        )
        .filter(F.col("cos_sim") >= threshold)
        .select("a_id", "b_id", "cos_sim")
    )


def random_projection(
    emb: DataFrame,
    dim: int,
    out_dim: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: str = "rp",
) -> DataFrame:
    """Johnson–Lindenstrauss-style dimensionality reduction: project
    each ``dim``-dim vector onto ``out_dim`` deterministic pseudo-random
    directions (:func:`hyperplanes` md5 literals — reproducible in any
    engine, no fitted PCA state to ship).  The embedding-compression
    step in front of clustering / coarse ANN when the full width is
    too expensive to shuffle.

    Values are raw direction dot-products (rescale by
    ``1/sqrt(out_dim)`` for distance-preserving JL estimates — a
    constant factor that doesn't change neighbors, left to the caller
    to keep the op exact).  Output is LONG format (vec_id, dim_idx,
    value), one row per output component, so downstream hash checks
    compare scalars.

    Exactness: each component is one sequential-fold dot product
    (fixed summation order ≡ DuckDB ``list_reduce``) — bit-identical
    across engines and partitionings.

    Scale shape: a pure per-row projection in the scan's codegen —
    no shuffle, no Python, ``out_dim × dim`` fused multiply-adds per
    row; output is ``out_dim`` rows per vector produced streaming."""
    planes = hyperplanes(out_dim, dim, seed=seed)
    v = as_double_vec(vec_col)
    proj = F.array(*[dot(v, vector_literal(p)) for p in planes])
    return emb.select(
        F.col(id_col),
        F.posexplode(proj).alias("dim_idx", "value"),
    ).select(id_col, F.col("dim_idx").cast("long").alias("dim_idx"), "value")


def knn_join(
    queries: DataFrame,
    corpus: DataFrame,
    dim: int,
    k: int = 3,
    n_planes: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    hamming_radius: int = 0,
) -> DataFrame:
    """Batch k-nearest-neighbor JOIN: for EVERY query vector, its top-k
    corpus neighbors by cosine — the retrieval workhorse (RAG context
    fetch, hard-negative mining, embedding-based label propagation)
    that the single-query operators (lsh_topk et al.) don't cover.

    Approximate by sign-bucket blocking: both sides are signatured with
    the same deterministic md5 hyperplanes and only same-bucket pairs
    are compared — recall follows the LSH collision probability, and
    a query whose bucket holds no corpus vector returns no rows (the
    multi-probe expansion of ``expand_buckets`` is the recall dial).

    Returns (q_id, c_id, cos_sim, rn), rn = 1..k per query, ties broken
    by c_id — a total order, so the selected set is deterministic and
    engine-portable (cosines are sequential-fold dots, bit-exact).

    Scale shape: ONE shuffle equi-join on the bucket key (never a
    cross join), then a per-query streaming row_number.  Within-bucket
    work is |Q_b|·|C_b| — size n_planes to the corpus (lg(n/target)
    rule, BENCH_NOTES) exactly as for the self-join dedup; at index
    scale, replace the corpus side with the PERSISTED bucket-partitioned
    table (write_lsh_index) so the join reads only matching bucket
    partitions."""
    planes = hyperplanes(n_planes, dim)
    qv = as_double_vec(vec_col)
    # norms are precomputed PER SIDE, not per candidate pair: the naive
    # cosine(qvec, cvec) recomputes each vector's 64-element norm fold
    # once per joined pair — |pairs|/|vectors| redundant folds.  The
    # precomputed value is the IDENTICAL expression (same fold, same
    # sqrt), so cos_sim stays bit-exact and the oracle is unchanged.
    q = queries.select(
        F.col(id_col).alias("q_id"),
        qv.alias("qvec"),
        l2_norm(qv).alias("qn"),
        lsh_bucket(qv, planes).alias("bucket"),
    )
    if hamming_radius > 0:
        # multi-probe: each query also probes every bucket within the
        # Hamming radius — the probe set is a tiny driver-side literal
        # per bucket value, exploded BEFORE the join so the join stays
        # an equi-join (each (q, c) pair still appears once: a corpus
        # vector lives in exactly one bucket)
        from .ann_index import expand_buckets

        probe_map = F.map_from_arrays(
            F.lit(list(range(1 << n_planes))),
            F.lit([
                expand_buckets(b, n_planes, hamming_radius)
                for b in range(1 << n_planes)
            ]),
        )
        q = q.withColumn("bucket", F.explode(F.element_at(probe_map, F.col("bucket"))))
    c = corpus.select(
        F.col(id_col).alias("c_id"),
        qv.alias("cvec"),
        l2_norm(qv).alias("cn"),
        lsh_bucket(qv, planes).alias("bucket"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), "c_id")
    return (
        q.join(c, "bucket")
        .withColumn(
            "cos_sim",
            dot(F.col("qvec"), F.col("cvec")) / (F.col("qn") * F.col("cn")),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("q_id", "c_id", "cos_sim", "rn")
    )


def ann_recall_audit(
    sample_queries: DataFrame,
    corpus: DataFrame,
    dim: int,
    k: int = 3,
    n_planes: int = 4,
    hamming_radius: int = 0,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Recall@k of the bucket-blocked :func:`knn_join` against the
    exact brute-force top-k, per sampled query — the audit that
    justifies (n_planes, hamming_radius) before anyone trusts the
    approximate index (x42's MinHash-accuracy twin for the ANN tier).

    Returns (q_id, n_hit, recall): |approx ∩ exact| and its ratio to
    ``k``.  Queries whose probe buckets hold no corpus vector appear
    with recall 0 — silently dropping them would overstate recall.

    Exactness: hit counts are integers; recall is one IEEE division by
    the constant ``k``.  Ties in the exact top-k break by c_id (total
    order) so both engines pick the identical reference set.

    Scale shape: the exact side is a deliberate broadcast cross join —
    affordable precisely because the audit runs on a SAMPLE of queries
    (tiny side broadcast, corpus streamed once); that is how recall is
    measured in production, never on the full query load.  The approx
    side is the normal bucket equi-join."""
    from pyspark.sql import Window

    qv = as_double_vec(vec_col)
    # per-side norm precompute (not per pair): the exact side touches
    # sample x CORPUS pairs, so the naive cosine would fold each corpus
    # vector's norm once per sampled query — identical expression, so
    # cos_sim stays bit-exact
    q = sample_queries.select(
        F.col(id_col).alias("q_id"), qv.alias("qvec"), l2_norm(qv).alias("qn")
    )
    c = corpus.select(
        F.col(id_col).alias("c_id"), qv.alias("cvec"), l2_norm(qv).alias("cn")
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), "c_id")
    exact = (
        F.broadcast(q).crossJoin(c)
        .withColumn(
            "cos_sim",
            dot(F.col("qvec"), F.col("cvec")) / (F.col("qn") * F.col("cn")),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("q_id", "c_id")
    )
    approx = knn_join(
        sample_queries, corpus, dim, k=k, n_planes=n_planes,
        hamming_radius=hamming_radius, vec_col=vec_col, id_col=id_col,
    ).select("q_id", F.col("c_id").alias("a_c_id"))
    hits = (
        exact.join(
            approx,
            (exact.q_id == approx.q_id) & (exact.c_id == approx.a_c_id),
            "left",
        )
        .groupBy(exact.q_id)
        .agg(F.count("a_c_id").cast("long").alias("n_hit"))
    )
    return hits.withColumn(
        "recall", F.col("n_hit").cast("double") / F.lit(float(k))
    )


def knn_join_exact(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """EXACT batch kNN join — every query against the FULL corpus, no
    blocking: the recall=1 baseline the approximate paths (knn_join,
    the persisted-index serves) are audited against, and the dense arm
    of hybrid retrieval (``retrieval.rrf_fuse``) where exact ranks
    matter.

    Returns (q_id, c_id, cos_sim, rn), rn = 1..k per query, ties by
    c_id ascending (total order, engine-portable).

    Scale shape: the O(batch) query side BROADCASTS over the corpus
    scan — a broadcast nested loop whose bounded side is the batch, so
    per-run work is |batch| x |corpus| dot products in one pass with
    no shuffle of the corpus; norms are folded per SIDE before the
    join (the BENCH_NOTES norm-hoisting rule).  This is the
    deliberate brute-force regime: it holds while |batch| x |corpus|
    compute fits the cluster (an audit sample, a small serving batch);
    beyond that, compose the bucketed/index forms instead — the fusion
    consumes (id, rank) from ANY arm."""
    qv = as_double_vec(vec_col)
    q = queries.select(
        F.col(id_col).alias("q_id"), qv.alias("qvec"), l2_norm(qv).alias("qn")
    )
    c = corpus.select(
        F.col(id_col).alias("c_id"), qv.alias("cvec"), l2_norm(qv).alias("cn")
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), "c_id")
    return (
        F.broadcast(q)
        .crossJoin(c)
        .withColumn(
            "cos_sim", dot(F.col("qvec"), F.col("cvec")) / (F.col("qn") * F.col("cn"))
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("q_id", "c_id", "cos_sim", "rn")
    )


# ---------------------------------------------------------------------------
# Contrastive-training mining: hard negatives and (anchor, pos, neg) triplets
# ---------------------------------------------------------------------------


def hard_negative_mining(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 3,
    max_sim: float | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    group_col: str = "label",
) -> DataFrame:
    """Hard negatives for contrastive training (the DPR/dense-retriever
    recipe, Karpukhin et al. 2020, public): for each anchor, the
    top-``k`` most-similar corpus vectors whose ``group_col`` DIFFERS
    from the anchor's — maximally confusable, definitely-wrong
    examples.  ``max_sim`` optionally drops candidates ABOVE a cosine
    ceiling (the false-negative guard: a near-duplicate with a
    different label is more likely mislabeled than hard).

    Returns (q_id, q_group, c_id, c_group, cos_sim, rn), rn = 1..k per
    anchor by (cos_sim desc, c_id asc).

    Scale shape: the exact form — O(batch) anchors broadcast over one
    corpus scan, norms folded per side, the group predicate applied
    BEFORE the top-k window (never a post-filter on a ranked list,
    which would under-fill k).  For corpus-scale anchor sets compose
    the index shortlist instead: over-fetch k_shortlist from any
    persisted index, anti-filter on group, rerank — the shortlist
    depth then bounds recall exactly as in the refine family."""
    qv = as_double_vec(vec_col)
    q = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(group_col).alias("q_group"),
        qv.alias("qvec"),
        l2_norm(qv).alias("qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("c_id"),
        F.col(group_col).alias("c_group"),
        qv.alias("cvec"),
        l2_norm(qv).alias("cn"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), "c_id")
    sim = dot(F.col("qvec"), F.col("cvec")) / (F.col("qn") * F.col("cn"))
    joined = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("c_group") != F.col("q_group"))
        .withColumn("cos_sim", sim)
    )
    if max_sim is not None:
        joined = joined.filter(F.col("cos_sim") < F.lit(float(max_sim)))
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("q_id", "q_group", "c_id", "c_group", "cos_sim", "rn")
    )


def contrastive_triplets(
    queries: DataFrame,
    corpus: DataFrame,
    n_neg: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    group_col: str = "label",
) -> DataFrame:
    """(anchor, positive, negative) triplets: the positive is the
    anchor's nearest SAME-group corpus vector (excluding itself), the
    negatives its ``n_neg`` hardest different-group vectors — the
    training-row assembly behind triplet/InfoNCE losses.  Anchors with
    no same-group neighbor in the corpus yield no rows (a triplet
    needs all three legs; the inner join enforces it declaratively).

    Returns (q_id, pos_id, pos_sim, neg_id, neg_sim, rn), rn = 1..n_neg
    over the negatives; the positive repeats per negative row (the
    standard flat triplet layout).

    Scale shape: both arms are one broadcast-anchors pass over the
    corpus scan (two scans total); the join back to anchors is by q_id
    on two O(batch·k) sides."""
    qv = as_double_vec(vec_col)
    q = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(group_col).alias("q_group"),
        qv.alias("qvec"),
        l2_norm(qv).alias("qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("c_id"),
        F.col(group_col).alias("c_group"),
        qv.alias("cvec"),
        l2_norm(qv).alias("cn"),
    )
    sim = dot(F.col("qvec"), F.col("cvec")) / (F.col("qn") * F.col("cn"))
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), "c_id")
    pos = (
        F.broadcast(q)
        .crossJoin(c)
        .filter((F.col("c_group") == F.col("q_group")) & (F.col("c_id") != F.col("q_id")))
        .withColumn("cos_sim", sim)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("q_id", F.col("c_id").alias("pos_id"), F.col("cos_sim").alias("pos_sim"))
    )
    neg = hard_negative_mining(
        queries, corpus, k=n_neg, vec_col=vec_col, id_col=id_col, group_col=group_col
    ).select("q_id", F.col("c_id").alias("neg_id"), F.col("cos_sim").alias("neg_sim"), "rn")
    return pos.join(neg, "q_id").select(
        "q_id", "pos_id", "pos_sim", "neg_id", "neg_sim", "rn"
    )


def mmr_rerank(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 3,
    k_shortlist: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Maximal-marginal-relevance rerank (Carbonell & Goldstein 1998,
    public): greedily select ``k`` of the top-``k_shortlist``
    candidates, each step taking the argmax of ``rel(c) - max_{s in S}
    sim(c, s)`` — relevance minus redundancy against what's already
    selected.  This is MMR at lambda=1/2 up to a positive scale (the
    order is identical and the subtraction of two identically-derived
    cosines is EXACT IEEE, so no float constant ever enters), the
    embedding-space sibling of ``retrieval.diversified_topk``'s
    per-source cap: the cap diversifies by a label, MMR by the
    geometry itself.

    Greedy selection is inherently sequential, but over an
    O(batch * k_shortlist) shortlist — so the loop UNROLLS into k
    declarative steps (window argmax + anti-join per step) instead of
    reaching for a UDF: pairwise candidate sims are computed ONCE
    (O(batch * k_shortlist^2) rows, every vector side broadcast),
    checkpointed, and each step is joins over that small table.  The
    corpus-sized work is exactly one exact-kNN shortlist pass;
    compose with any index shortlist (PQ/prefix/Hamming refine
    family) to keep round 1 off the corpus too.

    Self-matches are excluded (a query drawn from the corpus never
    selects itself).  Returns (q_id, c_id, rel, mmr_rn), mmr_rn =
    1..k in selection order; ties by c_id ascending at every step."""
    sl = knn_join_exact(
        queries, corpus, k=k_shortlist + 1, vec_col=vec_col, id_col=id_col
    ).filter(F.col("c_id") != F.col("q_id"))
    wq = Window.partitionBy("q_id").orderBy(
        F.desc_nulls_last("cos_sim"), F.asc("c_id")
    )
    cand = (
        sl.withColumn("srn", F.row_number().over(wq))
        .filter(F.col("srn") <= k_shortlist)
        .select("q_id", "c_id", F.col("cos_sim").alias("rel"))
        .localCheckpoint(eager=False)
    )
    ids = cand.select(F.col("c_id").alias("cid")).distinct()
    vecs = (
        corpus.select(
            F.col(id_col).alias("cid"), as_double_vec(vec_col).alias("v")
        )
        .join(F.broadcast(ids), "cid", "left_semi")
        .withColumn("n", l2_norm(F.col("v")))
    )
    va = vecs.select(
        F.col("cid").alias("a"), F.col("v").alias("va"), F.col("n").alias("na")
    )
    vb = vecs.select(
        F.col("cid").alias("b"), F.col("v").alias("vb"), F.col("n").alias("nb")
    )
    pairs = (
        cand.select("q_id", F.col("c_id").alias("a"))
        .join(cand.select("q_id", F.col("c_id").alias("b")), "q_id")
        .filter(F.col("a") != F.col("b"))
        .join(F.broadcast(va), "a")
        .join(F.broadcast(vb), "b")
        .withColumn(
            "sim",
            F.when(
                (F.col("na") > 0) & (F.col("nb") > 0),
                dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")),
            ),
        )
        .select("q_id", "a", "b", "sim")
        .localCheckpoint(eager=False)
    )
    w1 = Window.partitionBy("q_id").orderBy(F.desc_nulls_last("rel"), F.asc("c_id"))
    selu = (
        cand.withColumn("rn", F.row_number().over(w1))
        .filter(F.col("rn") == 1)
        .select("q_id", "c_id", "rel", F.lit(1).cast("int").alias("mmr_rn"))
        .localCheckpoint(eager=False)
    )
    for t in range(2, k + 1):
        ms = (
            pairs.join(selu.select("q_id", F.col("c_id").alias("b")), ["q_id", "b"])
            .groupBy("q_id", F.col("a").alias("c_id"))
            .agg(F.max("sim").alias("ms"))
        )
        rem = cand.join(selu.select("q_id", "c_id"), ["q_id", "c_id"], "left_anti")
        ws = Window.partitionBy("q_id").orderBy(
            F.desc_nulls_last("score"), F.asc("c_id")
        )
        step = (
            rem.join(ms, ["q_id", "c_id"])
            .withColumn("score", F.col("rel") - F.col("ms"))
            .withColumn("rn", F.row_number().over(ws))
            .filter(F.col("rn") == 1)
            .select("q_id", "c_id", "rel", F.lit(t).cast("int").alias("mmr_rn"))
        )
        selu = selu.unionByName(step).localCheckpoint(eager=False)
    return selu


def _semantic_assigned(
    emb: DataFrame,
    centroids: DataFrame | None,
    vec_col: str,
    assigned: DataFrame | None,
) -> DataFrame:
    """Normalized (vec_id, centroid_id, v, _vn) assignment — inline
    (shared ``ann_index.assign_to_centroids``) or from a persisted
    index table.  Exactly one of centroids/assigned."""
    if (centroids is None) == (assigned is None):
        raise ValueError("pass exactly one of centroids= or assigned=")
    if assigned is None:
        # lazy import: ann_index imports this module at load time
        from .ann_index import assign_to_centroids

        assigned = assign_to_centroids(emb, centroids, vec_col)
    return assigned.select(
        "vec_id",
        "centroid_id",
        as_double_vec(vec_col).alias("v"),
        F.col("norm").alias("_vn"),
    )


def semantic_pairs(
    emb: DataFrame,
    centroids: DataFrame | None,
    tau: float,
    vec_col: str = "embedding",
    assigned: DataFrame | None = None,
) -> DataFrame:
    """Within-cluster semantic near-dup PAIRS (a_id < b_id, cosine ≥
    tau) — the candidate stream SemDeDup's flags (x157) and the
    semantic leakage matrix (x166) both consume.  Pairs never cross
    clusters; norms folded per side before the join."""
    return _pairs_from_assigned(
        _semantic_assigned(emb, centroids, vec_col, assigned), tau
    )


def _pairs_from_assigned(assigned: DataFrame, tau: float) -> DataFrame:
    a = assigned.select(
        F.col("vec_id").alias("a_id"), "centroid_id",
        F.col("v").alias("a_vec"), F.col("_vn").alias("a_n"),
    )
    b = assigned.select(
        F.col("vec_id").alias("b_id"), "centroid_id",
        F.col("v").alias("b_vec"), F.col("_vn").alias("b_n"),
    )
    return (
        a.join(b, "centroid_id")
        .filter(F.col("a_id") < F.col("b_id"))
        .withColumn(
            "cs",
            dot(F.col("a_vec"), F.col("b_vec")) / (F.col("a_n") * F.col("b_n")),
        )
        .filter(F.col("cs") >= F.lit(float(tau)))
        .select("a_id", "b_id", "centroid_id", "cs")
    )


def semantic_dedup(
    emb: DataFrame,
    centroids: DataFrame | None,
    tau: float,
    vec_col: str = "embedding",
    assigned: DataFrame | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication scoped to k-means clusters.  Every vector is assigned
    to its nearest centroid; within each cluster a vector is flagged as
    a semantic duplicate when its cosine to ANY lower-``vec_id`` cluster
    member reaches ``tau`` (keep-lowest-id — the deterministic stand-in
    for the paper's keep-farthest-from-centroid rule, which varies with
    random seeds; the flag rule, not the representative choice, is what
    the operator contracts).

    Scale shape: the only corpus-sized shuffle is the self-join keyed on
    ``centroid_id`` — candidate pairs never leave their cluster, so the
    cost is Σ m_c² over cluster sizes, and the published recipe holds:
    ``n_centroids`` must scale with the corpus (the compute-optimal
    count is c = √(n/2), minimizing assignment + pair folds — the
    square-root sibling of the LSH plane-count rule, BENCH_NOTES).
    Norms are folded once per vector BEFORE the join, never per pair —
    assignment reuses the shared ``ann_index.assign_to_centroids``
    (map-side-combinable max_by, persisted norm), so one quantizer
    serves both the IVF index and the dedup pass.

    ``assigned``: a pre-assigned ``(vec_id, <vec_col>, norm,
    centroid_id)`` table — exactly what ``ann_index.write_ivf_index``
    persists — making the dedup pass PAIRS-ONLY: the n·c assignment
    term (the n^1.5 driver in the measured scale curve, BENCH_NOTES
    x157) drops entirely, and the standing ANN index's coarse
    quantization is reused instead of recomputed.  Pinned equal to the
    inline path by test.  Exactly one of ``centroids`` / ``assigned``
    must be given.

    Returns one row per vector: ``vec_id, centroid_id, is_dup,
    max_prior_sim`` (0.0 when no earlier member reaches ``tau`` — MAX
    over bit-equal pair cosines is order-free, so the column is
    hash-stable)."""
    # materialize the assignment ONCE: it feeds three consumers (both
    # pair sides + the output base), and Spark re-executes a shared
    # sub-plan per consumer — for the deeper two-level assignment that
    # re-derivation measured SLOWER than flat despite 9× fewer folds
    # (the BENCH_NOTES multi-consumer rule applied to a DAG, not a
    # count table)
    norm = _semantic_assigned(emb, centroids, vec_col, assigned).localCheckpoint(
        eager=False
    )
    dups = (
        _pairs_from_assigned(norm, tau)
        .groupBy(F.col("b_id").alias("vec_id"))
        .agg(F.max("cs").alias("max_prior_sim"))
    )
    return (
        norm.join(dups, "vec_id", "left")
        .select(
            "vec_id",
            "centroid_id",
            F.when(F.col("max_prior_sim").isNotNull(), F.lit(1))
            .otherwise(F.lit(0))
            .cast("int")
            .alias("is_dup"),
            F.coalesce(F.col("max_prior_sim"), F.lit(0.0)).alias("max_prior_sim"),
        )
    )
