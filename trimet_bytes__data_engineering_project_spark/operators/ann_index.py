"""Persisted ANN indexes — the write-once / probe-many lifecycle that
makes LSH and IVF actually scale (similarity.py computes both
assignments at query time; that is the correctness baseline, this is
the 100 TB path).

- **LSH index**: the table is *written* ``partitionBy("bucket")`` where
  bucket is the sign signature over deterministic md5 hyperplanes.  A
  probe computes the query's bucket driver-side (pure python on one
  vector) and filters on the partition column — the scan plans with a
  ``PartitionFilters: [bucket = q]`` entry and reads ~1/2^p of the
  files, no shuffle, no recomputed signatures (pinned by plan test).
- **IVF index**: vectors are written ``partitionBy("centroid_id")``
  under their argmax-cosine coarse centroid; the (tiny) centroid table
  is persisted next to it.  A probe reads the centroid table (n_c rows,
  one driver fetch — the same cost class as fetching the query vector),
  picks the ``nprobe`` nearest centroid ids driver-side, and scans only
  those inverted-list partitions via an IN-list partition filter.

Both probes return results identical to the query-time operators
(lsh_topk / ivf_topk) on the same data — the driver oracle for the
probe queries is literally the same SQL as x11/x12.
"""

from __future__ import annotations

import math
import os
from functools import reduce

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .similarity import (
    as_double_vec,
    cosine,
    dot,
    hyperplanes,
    l2_norm,
    lsh_bucket,
    vector_literal,
)

LSH_PLANES = 4


def write_lsh_index(
    emb: DataFrame,
    path: str,
    dim: int,
    n_planes: int = LSH_PLANES,
    vec_col: str = "embedding",
    mode: str = "overwrite",
) -> None:
    """One pass over the corpus: signature every vector and lay the
    table out partitioned by bucket.  At 100 TB this is the index build
    job.

    ``mode="append"`` is the incremental path: the hyperplanes are a
    deterministic function of (n_planes, dim) — identical across build
    and append jobs — so new vectors land in the same bucket directory
    scheme and every subsequent probe sees both generations (tested:
    build → append → probe).

    The index also stores each vector's l2 ``norm`` — computed once at
    BUILD time with the identical fold expression probes use, so a
    batch kNN probe (:func:`knn_join_index`) skips the per-corpus-row
    norm fold entirely (bit-exact: same expression, same data).
    Single-vector probes never select the column, so column pruning
    makes it free for them.

    The write REPARTITIONS on the bucket key first: without it every
    scan task appends its own file to every bucket directory —
    tasks × 2^p small files, and at scaled n_planes the probe pays a
    file-open per file (measured: a 55K-file index read 16× slower
    than the same rows in 2K files).  Aligning the shuffle with
    ``partitionBy`` writes each bucket as one file; the build pays one
    extra shuffle ONCE, every probe forever reads contiguous
    buckets."""
    planes = hyperplanes(n_planes, dim)
    v = as_double_vec(vec_col)
    (
        emb.withColumn("bucket", lsh_bucket(v, planes))
        .withColumn("norm", l2_norm(v))
        .repartition(F.col("bucket"))
        .write.mode(mode)
        .partitionBy("bucket")
        .parquet(path)
    )


def expand_buckets(qbucket: int, n_planes: int, hamming_radius: int) -> list[int]:
    """All bucket ids within Hamming distance ``hamming_radius`` of the
    query's bucket — the multi-probe set.  Pure driver-side arithmetic
    over 2^n_planes ids; the probe stays an IN-list partition filter."""
    from itertools import combinations

    buckets: list[int] = []
    for d in range(min(hamming_radius, n_planes) + 1):
        for flips in combinations(range(n_planes), d):
            b = qbucket
            for f in flips:
                b ^= 1 << f
            buckets.append(b)
    return sorted(buckets)


def lsh_index_probe(
    spark: SparkSession,
    path: str,
    query_vec: list[float],
    k: int,
    n_planes: int = LSH_PLANES,
    vec_col: str = "embedding",
    hamming_radius: int = 0,
) -> DataFrame:
    """Top-k over the bucket partitions of a written LSH index within
    ``hamming_radius`` of the query's bucket.  The bucket set is
    computed driver-side from the query vector (no Spark job), so the
    only cluster work is a pruned scan + TakeOrderedAndProject.

    ``hamming_radius`` is LSH's recall dial (the analogue of IVF's
    ``nprobe``): radius 0 reads 1 of 2^p partitions but a true neighbor
    whose signature differs by one sign bit is invisible; radius r
    reads sum(C(p, 0..r)) partitions and recovers exactly those
    neighbors.  The filter stays a literal IN-list partition prune —
    identical plan shape at every radius."""
    planes = hyperplanes(n_planes, len(query_vec))
    qb = 0
    for p, plane in enumerate(planes):
        if sum(a * b for a, b in zip(query_vec, plane)) > 0:
            qb |= 1 << p
    probe = expand_buckets(qb, n_planes, hamming_radius)
    idx = spark.read.parquet(path)
    v = as_double_vec(vec_col)
    q = vector_literal(query_vec)
    return (
        idx.filter(F.col("bucket").isin(probe))
        .select("vec_id", cosine(v, q).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), "vec_id")
        .limit(k)
    )


def write_quantized_lsh_index(
    emb: DataFrame,
    path: str,
    dim: int,
    n_planes: int = LSH_PLANES,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    mode: str = "overwrite",
) -> None:
    """LSH index storing INT8-QUANTIZED vectors — the compressed
    serving layout: each vector keeps only its symmetric-int8
    quantization (``similarity.quantize_vec``, values in [-127, 127]
    stored as ``array<tinyint>``) plus its integer-sum norm, at ~4×
    fewer scan bytes than the float index (measured: see BENCH_NOTES).
    Bucketing runs on the ORIGINAL float vector — quantization moves
    scores, never bucket membership — so the probe-side bucket
    arithmetic is identical to the float index's.

    All-zero vectors quantize to NULL and are stored as such; serving
    filters their NULL scores exactly as ``quantized_topk`` does.
    Same bucket-aligned one-file-per-partition write as
    :func:`write_lsh_index`."""
    from .similarity import quantize_vec

    planes = hyperplanes(n_planes, dim)
    v = as_double_vec(vec_col)
    qv = quantize_vec(v)
    qnorm = F.sqrt(
        F.aggregate(
            F.transform(qv, lambda x: (x * x).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).cast("double")
    )
    (
        # the id column keeps its caller-given name so a probe passing
        # the same id_col (quantized_knn_join_index mirrors this
        # parameter) reads back exactly what was written
        emb.select(
            id_col,
            F.transform(qv, lambda x: x.cast("tinyint")).alias("qvec"),
            qnorm.alias("qnorm"),
            lsh_bucket(v, planes).alias("bucket"),
        )
        .repartition(F.col("bucket"))
        .write.mode(mode)
        .partitionBy("bucket")
        .parquet(path)
    )


def quantized_knn_join_index(
    spark: SparkSession,
    queries: DataFrame,
    index_path: str,
    dim: int,
    k: int = 3,
    n_planes: int = LSH_PLANES,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Batch kNN join against the QUANTIZED index — x89's compressed
    sibling: per-pair work is an integer dot (exact, order-independent
    int64 sums) against the stored int8 vectors, divided once by the
    two precomputed norms.  Scores are the int8-quantized cosine —
    ``quantized_topk``'s accuracy contract, not the float cosine — so
    the recall trade is the quantization step, bounded and auditable
    against x89 on the same corpus.

    Returns (q_id, c_id, q_cos, rn); query vectors that quantize to
    NULL (all-zero) produce no rows, exactly as ``quantized_topk``."""
    from pyspark.sql import Window

    from .similarity import quantize_vec

    planes = hyperplanes(n_planes, dim)
    v = as_double_vec(vec_col)
    qq = quantize_vec(v)

    def int_fold(products):
        return F.aggregate(
            products, F.lit(0).cast("long"), lambda acc, x: acc + x
        )

    qn = F.sqrt(int_fold(F.transform(qq, lambda x: (x * x).cast("long"))).cast("double"))
    q = queries.select(
        F.col(id_col).alias("q_id"),
        qq.alias("qq"),
        qn.alias("qn"),
        lsh_bucket(v, planes).alias("bucket"),
    )
    probed = [r["bucket"] for r in q.select("bucket").distinct().collect()]
    # stored tinyint elements are widened before multiplying: byte*byte
    # arithmetic would wrap at 127*127 under non-ANSI semantics
    c = (
        spark.read.parquet(index_path)
        .filter(F.col("bucket").isin(probed))
        .select(
            F.col(id_col).alias("c_id"),
            F.transform(F.col("qvec"), lambda x: x.cast("int")).alias("cq"),
            F.col("qnorm").alias("cn"),
            "bucket",
        )
    )
    dot_q = int_fold(
        F.zip_with(F.col("qq"), F.col("cq"), lambda x, y: (x * y).cast("long"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("q_cos"), "c_id")
    return (
        q.join(c, "bucket")
        .withColumn("q_cos", dot_q.cast("double") / (F.col("qn") * F.col("cn")))
        .filter(F.col("q_cos").isNotNull())
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("q_id", "c_id", "q_cos", "rn")
    )


def knn_join_index(
    spark: SparkSession,
    queries: DataFrame,
    index_path: str,
    dim: int,
    k: int = 3,
    n_planes: int = LSH_PLANES,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Batch kNN JOIN against a PERSISTED LSH index — the batch twin of
    ``streaming.index.run_streaming_knn_serve`` (which delegates here
    per micro-batch) and the index-backed form of
    ``similarity.knn_join``: the corpus is never re-signatured, the
    batch's distinct bucket set (≤ 2^p ids — a bounded driver collect,
    same cost class as the single-query probe's literal) becomes an
    IN-list PARTITION FILTER on the index scan, and corpus norms come
    from the index (stored at build time with the identical fold
    expression, so cosines stay bit-exact; older indexes without the
    column fall back to computing it on scan).

    Results are identical to ``knn_join(queries, corpus)`` over the
    indexed corpus with the same planes (pinned by test) — what the
    index buys is the per-run cost: signature O(batch), scan only the
    probed partitions, one bucket equi-join, per-query streaming
    top-k."""
    from pyspark.sql import Window

    planes = hyperplanes(n_planes, dim)
    qv = as_double_vec(vec_col)
    q = queries.select(
        F.col(id_col).alias("q_id"),
        qv.alias("qvec"),
        l2_norm(qv).alias("qn"),
        lsh_bucket(qv, planes).alias("bucket"),
    )
    probed = [r["bucket"] for r in q.select("bucket").distinct().collect()]
    idx = spark.read.parquet(index_path)
    cv = as_double_vec(vec_col)
    # per-ROW fallback, not per-schema: an index mixing generations (a
    # pre-norm index extended via mode="append", or a streaming lander
    # adding batches beside old ones) has "norm" in the merged schema
    # but NULL for old-generation rows — a schema-level branch would
    # NULL their cosines and silently drop them from every top-k.
    cn = (
        F.coalesce(F.col("norm"), l2_norm(cv)) if "norm" in idx.columns else l2_norm(cv)
    )
    c = idx.filter(F.col("bucket").isin(probed)).select(
        F.col(id_col).alias("c_id"), cv.alias("cvec"), cn.alias("cn"), "bucket"
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), "c_id")
    return (
        q.join(c, "bucket")
        .withColumn(
            "cos_sim", dot(F.col("qvec"), F.col("cvec")) / (F.col("qn") * F.col("cn"))
        )
        # NULL-scored rows (NULL vectors) never occupy top-k slots —
        # the same contract quantized_knn_join_index already enforces
        .filter(F.col("cos_sim").isNotNull())
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("q_id", "c_id", "cos_sim", "rn")
    )


def _centroids_path(path: str) -> str:
    return path.rstrip("/") + "_centroids"


def write_ivf_index(
    emb: DataFrame,
    path: str,
    n_centroids: int = 16,
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
    mode: str = "overwrite",
) -> None:
    """Assign every vector to its argmax-cosine coarse centroid and
    write the corpus partitioned by ``centroid_id`` (the inverted
    lists), plus the centroid table alongside.

    ``centroids`` defaults to the deterministic first-``n_centroids``
    by id (ivf_topk's quantizer, oracle-expressible); pass the output
    of :func:`kmeans_centroids` for trained lists.

    ``mode="append"`` is the incremental path: new vectors are assigned
    against the ALREADY-PERSISTED centroid table (never recomputed — a
    re-derived quantizer would scatter old and new generations across
    incompatible lists) and appended into their inverted-list
    partitions; probes see both generations (tested)."""
    if mode == "append":
        centroids = emb.sparkSession.read.parquet(_centroids_path(path))
    elif centroids is None:
        centroids = (
            emb.orderBy("vec_id")
            .limit(n_centroids)
            .select(F.col("vec_id").alias("centroid_id"), as_double_vec(vec_col).alias("cvec"))
        )
    cents = centroids
    assigned = assign_to_centroids(emb, cents, vec_col)
    if mode != "append":  # append reuses the persisted quantizer untouched
        cents.write.mode("overwrite").parquet(_centroids_path(path))
    # align the shuffle with partitionBy: one file per inverted list,
    # not tasks x lists small files (see write_lsh_index)
    assigned.repartition(F.col("centroid_id")).write.mode(mode).partitionBy(
        "centroid_id"
    ).parquet(path)


def assign_to_centroids(
    emb: DataFrame, cents: DataFrame, vec_col: str, id_col: str = "vec_id"
) -> DataFrame:
    """Argmax-cosine coarse assignment of every vector to a centroid —
    shared by the batch build/append paths, the streaming landing, and
    SemDeDup (x157).  Vector norm folded once per vector (not per
    centroid); centroid norm derived inside the broadcast side — c_cos
    is the identical expression value, bit-exact vs the naive per-pair
    cosine.

    The argmax is ``max_by`` over the struct key ``(c_cos,
    -centroid_id)`` — ties to the LOWEST centroid id, the same order
    the old rank-1 window used, but map-side combinable: the n×n_c
    crossJoin rows fold to one row per vector BEFORE any exchange,
    where the window shape shuffled all of them.  (Spark orders NaN
    greatest in both window sorts and struct comparisons, so degenerate
    zero-norm cosines break ties identically.)"""
    v = as_double_vec(vec_col)
    cents_n = cents.withColumn("c_n", l2_norm(F.col("cvec")))
    scored = (
        emb.select(id_col, F.col(vec_col), v.alias("_v"), l2_norm(v).alias("_vn"))
        .crossJoin(F.broadcast(cents_n))
        .withColumn(
            "c_cos", dot(F.col("_v"), F.col("cvec")) / (F.col("_vn") * F.col("c_n"))
        )
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.expr("max_by(centroid_id, struct(c_cos, -centroid_id))").alias(
                "centroid_id"
            ),
            # constant per id; the norm was already folded for the
            # assignment — persist it so batch probes (ivf_knn_join)
            # read it instead of re-folding
            F.any_value(F.col(vec_col)).alias(vec_col),
            F.any_value(F.col("_vn")).alias("norm"),
        )
        .select(id_col, vec_col, "norm", "centroid_id")
    )


def land_ivf_batch(
    batch_df: DataFrame,
    cents: DataFrame,
    index_path: str,
    batch_id: int,
    vec_col: str = "embedding",
) -> None:
    """Land one generation of an incrementally-built IVF index:
    assign against the (frozen) quantizer and overwrite
    ``batch_id=N/centroid_id=C`` — the per-batch_id idempotence
    contract.  The SAME implementation the streaming landing
    (``streaming/index.py:run_streaming_ivf_index``) wraps in
    foreachBatch, so batch backfills and streamed generations are
    bit-identical layouts."""
    (
        assign_to_centroids(batch_df, cents, vec_col)
        .repartition(F.col("centroid_id"))
        .write.mode("overwrite")
        .partitionBy("centroid_id")
        .parquet(f"{index_path}/batch_id={batch_id}")
    )


def compact_ivf_index(
    spark: SparkSession,
    seg_path: str,
    out_path: str,
    n_centroids: int | None = None,
    vec_col: str = "embedding",
) -> None:
    """The LSM maintenance job for a segmented IVF index — the vector
    analogue of ``retrieval.compact_inverted_index``: read every
    ``batch_id=N`` generation, RE-DERIVE the coarse quantizer from the
    merged corpus (the streamed generations were assigned against a
    FROZEN bootstrap quantizer — correct for homogeneity, but as the
    corpus outgrows the bootstrap the lists skew, which is exactly
    what the health audit (x176) flags), re-assign everything, and
    rewrite the batch root-level layout (one file per inverted list,
    fresh norms).  ``n_centroids=None`` re-sizes the quantizer by the
    compute-optimal ``max(16, isqrt(n/2))`` rule — compaction is WHERE
    the index re-buckets as the corpus grows (the blocking-key rule;
    a constant list count becomes the Σm² bomb at 100 TB).  Results
    served from the compacted index are bit-equal to a fresh batch
    ``write_ivf_index`` over the union (same deterministic first-n
    quantizer; pinned by test and by x180's oracle)."""
    import math

    merged = spark.read.parquet(seg_path).select("vec_id", vec_col)
    if n_centroids is None:
        n_centroids = max(16, math.isqrt(merged.count() // 2))
    write_ivf_index(merged, out_path, n_centroids=n_centroids, vec_col=vec_col)


def compact_lsh_index(
    spark: SparkSession,
    seg_path: str,
    out_path: str,
    dim: int,
    n_planes: int | None = None,
    vec_col: str = "embedding",
) -> None:
    """LSM maintenance for a segmented LSH index — the third index
    family's compaction, completing the triple (inverted index:
    ``retrieval.compact_inverted_index``; IVF: :func:`compact_ivf_index`):
    read every ``batch_id=N`` generation, RE-SIGNATURE at a plane
    count sized to the MERGED corpus, and rewrite the batch root-level
    layout.  This is where the LSH index re-buckets: streamed
    generations signature with the bootstrap plane count (frozen for
    layout homogeneity), but bucket population grows as n/2^p — the
    measured unfinishable-at-200K case in BENCH_NOTES ("blocking-key
    cardinality must scale with the corpus").  ``n_planes=None``
    applies that sizing rule, ``max(4, floor(lg(n/125)))`` — ~125
    vectors per bucket.  Hyperplanes are a deterministic function of
    (n_planes, dim), so the compacted index is bit-equal to a fresh
    batch build at the same plane count (pinned by test) and probes
    pass the new plane count exactly as for a batch-built index."""
    import math

    merged = spark.read.parquet(seg_path).select("vec_id", vec_col)
    if n_planes is None:
        n = merged.count()
        n_planes = max(4, int(math.log2(max(1, n // 125))) if n >= 250 else 4)
    write_lsh_index(merged, out_path, dim, n_planes=n_planes, vec_col=vec_col)


def ivf_index_probe(
    spark: SparkSession,
    path: str,
    query_vec: list[float],
    k: int,
    nprobe: int = 1,
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k over the ``nprobe`` nearest inverted lists of a written IVF
    index.  Centroid selection is a driver-side fetch of the n_c-row
    centroid table (same cost class as fetching the query vector); the
    corpus scan carries a literal IN-list partition filter — pruned at
    planning time, no join, no assignment recompute."""
    from .pq import _rank_coarse  # zero-norm/zero-query guard shared

    cents = spark.read.parquet(_centroids_path(path)).collect()
    probe_ids = _rank_coarse(cents, query_vec, nprobe)

    idx = spark.read.parquet(path)
    v = as_double_vec(vec_col)
    q = vector_literal(query_vec)
    return (
        idx.filter(F.col("centroid_id").isin(probe_ids))
        .select("vec_id", cosine(v, q).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), "vec_id")
        .limit(k)
    )


def ivf_knn_join(
    spark: SparkSession,
    queries: DataFrame,
    index_path: str,
    k: int = 3,
    nprobe: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Batch kNN JOIN against a PERSISTED IVF index —
    :func:`knn_join_index`'s inverted-list sibling: every query is
    assigned its ``nprobe`` nearest coarse centroids against the
    index's persisted quantizer (a broadcast of n_c rows — never a
    shuffle), the batch's distinct probed centroid set (≤ n_c ids, a
    bounded driver collect) becomes an IN-list PARTITION FILTER on the
    inverted-list scan, corpus norms come from the index (folded once
    at build), and one centroid-keyed equi-join + per-query streaming
    row_number yields the top-k.

    ``nprobe`` is the recall dial exactly as in ``ivf_index_probe``;
    with ``nprobe=1`` each query reads only its own inverted list.
    Returns (q_id, c_id, cos_sim, rn) — per-query results identical to
    running ``ivf_index_probe`` per query vector (same quantizer, same
    assignment, same tie order)."""
    from pyspark.sql import Window

    cents_n = spark.read.parquet(_centroids_path(index_path)).withColumn(
        "c_n", l2_norm(F.col("cvec"))
    )
    qv = as_double_vec(vec_col)
    q = queries.select(
        F.col(id_col).alias("q_id"), qv.alias("qvec"), l2_norm(qv).alias("qn")
    )
    wq = Window.partitionBy("q_id").orderBy(F.desc("q_cos"), "centroid_id")
    qc = (
        q.crossJoin(F.broadcast(cents_n))
        .withColumn(
            "q_cos", dot(F.col("qvec"), F.col("cvec")) / (F.col("qn") * F.col("c_n"))
        )
        .withColumn("crn", F.row_number().over(wq))
        .filter(F.col("crn") <= nprobe)
        .select("q_id", "qvec", "qn", "centroid_id")
    )
    probed = [r["centroid_id"] for r in qc.select("centroid_id").distinct().collect()]
    idx = spark.read.parquet(index_path)
    cv = as_double_vec(vec_col)
    # per-row fallback for mixed-generation indexes — see knn_join_index
    cn = (
        F.coalesce(F.col("norm"), l2_norm(cv)) if "norm" in idx.columns else l2_norm(cv)
    )
    c = idx.filter(F.col("centroid_id").isin(probed)).select(
        F.col(id_col).alias("c_id"), cv.alias("cvec_c"), cn.alias("cn"), "centroid_id"
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), "c_id")
    return (
        qc.join(c, "centroid_id")
        .withColumn(
            "cos_sim", dot(F.col("qvec"), F.col("cvec_c")) / (F.col("qn") * F.col("cn"))
        )
        # same NULL-score contract as the quantized serving path
        .filter(F.col("cos_sim").isNotNull())
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("q_id", "c_id", "cos_sim", "rn")
    )


def write_quantized_ivf_index(
    emb: DataFrame,
    path: str,
    n_centroids: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: DataFrame | None = None,
    mode: str = "overwrite",
) -> None:
    """IVF index storing INT8-QUANTIZED inverted lists — the layout
    that wins at serving (the inverted-list scan is the probe's whole
    read cost, and int8 lists are ~4× fewer scan bytes) with the same
    compression contract as :func:`write_quantized_lsh_index`: each
    vector keeps its symmetric-int8 quantization plus its integer-sum
    norm.  Coarse ASSIGNMENT runs on the ORIGINAL float vector against
    a FULL-PRECISION centroid table (quantization moves scores, never
    list membership — the standard IVF-PQ discipline of a float coarse
    quantizer over compressed lists), so probes assign queries with
    identical arithmetic to the float index's.

    ``centroids`` defaults to the deterministic first-``n_centroids``
    by id; ``mode="append"`` reuses the persisted quantizer exactly as
    :func:`write_ivf_index`.  All-zero vectors quantize to NULL and
    serving filters their NULL scores.  Same list-aligned
    one-file-per-partition write as the float build."""
    from .similarity import quantize_vec

    if mode == "append":
        centroids = emb.sparkSession.read.parquet(_centroids_path(path))
    elif centroids is None:
        centroids = (
            emb.orderBy(id_col)
            .limit(n_centroids)
            .select(
                F.col(id_col).alias("centroid_id"),
                as_double_vec(vec_col).alias("cvec"),
            )
        )
    assigned = assign_to_centroids(emb, centroids, vec_col, id_col=id_col)
    if mode != "append":
        centroids.write.mode("overwrite").parquet(_centroids_path(path))
    qv = quantize_vec(as_double_vec(vec_col))
    qnorm = F.sqrt(
        F.aggregate(
            F.transform(qv, lambda x: (x * x).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).cast("double")
    )
    (
        assigned.select(
            id_col,
            F.transform(qv, lambda x: x.cast("tinyint")).alias("qvec"),
            qnorm.alias("qnorm"),
            "centroid_id",
        )
        .repartition(F.col("centroid_id"))
        .write.mode(mode)
        .partitionBy("centroid_id")
        .parquet(path)
    )


def quantized_ivf_knn_join(
    spark: SparkSession,
    queries: DataFrame,
    index_path: str,
    k: int = 3,
    nprobe: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Batch kNN JOIN against a QUANTIZED IVF index — x90's serving
    plan over x91's storage: queries are assigned their ``nprobe``
    nearest coarse centroids in FLOAT against the index's persisted
    full-precision quantizer (identical assignment to the float IVF
    serve — list membership never moves), quantized in flight, and
    scored against the int8 inverted lists with integer-exact dots
    (order-independent int64 sums, one IEEE division by the two
    precomputed norms).  Scores are the int8-quantized cosine —
    ``quantized_topk``'s accuracy contract; the float ``ivf_knn_join``
    is the recall baseline on the same corpus and quantizer.

    The probed-list set stays an IN-list PARTITION FILTER; the only
    join is centroid-keyed; per-pair work is the integer dot.  Query
    vectors that quantize to NULL (all-zero) produce no rows."""
    from pyspark.sql import Window

    from .similarity import quantize_vec

    cents_n = spark.read.parquet(_centroids_path(index_path)).withColumn(
        "c_n", l2_norm(F.col("cvec"))
    )
    v = as_double_vec(vec_col)
    qq = quantize_vec(v)

    def int_fold(products):
        return F.aggregate(products, F.lit(0).cast("long"), lambda acc, x: acc + x)

    qn = F.sqrt(int_fold(F.transform(qq, lambda x: (x * x).cast("long"))).cast("double"))
    q = queries.select(
        F.col(id_col).alias("q_id"),
        v.alias("fvec"),
        l2_norm(v).alias("fn"),
        qq.alias("qq"),
        qn.alias("qn"),
    )
    wq = Window.partitionBy("q_id").orderBy(F.desc("a_cos"), "centroid_id")
    qc = (
        q.crossJoin(F.broadcast(cents_n))
        .withColumn(
            "a_cos", dot(F.col("fvec"), F.col("cvec")) / (F.col("fn") * F.col("c_n"))
        )
        .withColumn("crn", F.row_number().over(wq))
        .filter(F.col("crn") <= nprobe)
        .select("q_id", "qq", "qn", "centroid_id")
    )
    probed = [r["centroid_id"] for r in qc.select("centroid_id").distinct().collect()]
    # stored tinyint elements widened before multiplying (byte*byte wraps)
    c = (
        spark.read.parquet(index_path)
        .filter(F.col("centroid_id").isin(probed))
        .select(
            F.col(id_col).alias("c_id"),
            F.transform(F.col("qvec"), lambda x: x.cast("int")).alias("cq"),
            F.col("qnorm").alias("cn"),
            "centroid_id",
        )
    )
    dot_q = int_fold(
        F.zip_with(F.col("qq"), F.col("cq"), lambda x, y: (x * y).cast("long"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("q_cos"), "c_id")
    return (
        qc.join(c, "centroid_id")
        .withColumn("q_cos", dot_q.cast("double") / (F.col("qn") * F.col("cn")))
        .filter(F.col("q_cos").isNotNull())
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("q_id", "c_id", "q_cos", "rn")
    )


def kmeans_centroids(
    emb: DataFrame,
    n_centroids: int = 16,
    n_iter: int = 3,
    vec_col: str = "embedding",
    checkpoint: bool = True,
) -> DataFrame:
    """Spherical k-means coarse quantizer as DataFrame ops — the trained
    replacement for the deterministic first-``n_centroids``-by-id
    quantizer.

    Init is a deterministic farthest-first traversal over the first-256
    -by-id sample (collected driver-side — a few KB — and swept with
    numpy): start from the lowest id, repeatedly add the sample vector
    with the smallest max-cosine to the chosen set.  This spreads the
    seeds across the cone of directions, which first-N-by-id does not
    (measured: probe-1 recall@10 0.26 → 0.33 on the driver embeddings).

    Each Lloyd iteration is: assign = broadcast-centroid crossJoin
    folded per vector by map-side-combinable ``max_by(centroid_id,
    struct(c_cos, -centroid_id))`` (identical selection and tie order
    to the rank-1 window it replaced — see ``assign_to_centroids`` for
    the equivalence argument); update = a deterministic
    TWO-LEVEL sequential fold — members fold in vec_id order inside
    fixed ``vec_id DIV 1024`` chunks, then the per-chunk partial sums
    fold in chunk order — so the mean is bit-stable across runs,
    partitionings and engines (float addition is not associative; the
    ``posexplode → avg`` shape this replaces drifts in the last ulp
    depending on which partition merges first, which is why x27 could
    never carry an oracle before round 4).  Memory stays bounded at
    scale: level 1 holds ≤1024 vectors per group, level 2 one partial
    sum per chunk — never a whole inverted list in one buffer.  The
    fold is array-op codegen, dimension-independent (same plan at dim
    8 or 8192).  The updated centroids (n_c × dim doubles — a few KB)
    chain round to round as a DataFrame broadcast — no driver sync in
    the loop (r15; each round consumes the previous exactly once, so
    the plan grows linearly with ``n_iter``), and the final table is
    lazily checkpointed for its multi-consumer callers.  The whole
    procedure is deterministic given the corpus; empty clusters simply
    drop out (their id stops appearing), matching standard Lloyd
    behavior."""
    import numpy as np
    from pyspark.sql import Window

    spark = emb.sparkSession
    data = emb.select("vec_id", as_double_vec(vec_col).alias("v"))
    sample = data.orderBy("vec_id").limit(max(256, n_centroids)).collect()
    sids = [int(r["vec_id"]) for r in sample]
    mat = np.stack([np.asarray(r["v"], dtype=np.float64) for r in sample])
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    unit = mat / np.where(norms == 0.0, 1.0, norms)
    chosen = [0]
    while len(chosen) < min(n_centroids, len(sids)):
        max_sim = (unit @ unit[chosen].T).max(axis=1)
        max_sim[chosen] = np.inf  # never re-pick a chosen seed
        chosen.append(int(np.argmin(max_sim)))
    cents = spark.createDataFrame(
        [(sids[c], [float(x) for x in mat[c]]) for c in chosen],
        "centroid_id long, cvec array<double>",
    )
    chunk = F.expr("vec_id DIV 1024").alias("chunk")
    member = F.struct(F.col("vec_id").alias("i"), F.col("v").alias("v")).alias("m")
    data_n = data.withColumn("_vn", l2_norm(F.col("v")))
    for _ in range(n_iter):
        # argmax via map-side-combinable max_by over (c_cos, -centroid_id)
        # — identical selection and tie order to the rank-1 window this
        # replaced (see assign_to_centroids: NaN orders greatest in both
        # window sorts and struct comparisons), but the n×n_c scored
        # rows fold to one row per vector BEFORE any exchange instead of
        # all shuffling into a window sort — one full shuffle of the
        # scored crossJoin removed per Lloyd round.
        best = (
            data_n.crossJoin(F.broadcast(cents.withColumn("c_n", l2_norm(F.col("cvec")))))
            .withColumn(
                "c_cos", dot(F.col("v"), F.col("cvec")) / (F.col("_vn") * F.col("c_n"))
            )
            .groupBy("vec_id")
            .agg(
                F.expr("max_by(centroid_id, struct(c_cos, -centroid_id))").alias(
                    "centroid_id"
                ),
                F.any_value(F.col("v")).alias("v"),
            )
        )
        lvl1 = (
            best.select("centroid_id", chunk, member)
            .groupBy("centroid_id", "chunk")
            .agg(F.sort_array(F.collect_list("m")).alias("ms"), F.count("*").alias("pn"))
        )
        zero1 = F.transform(F.element_at(F.col("ms"), 1)["v"], lambda x: F.lit(0.0))
        psum = F.aggregate(
            F.col("ms"), zero1, lambda acc, m: F.zip_with(acc, m["v"], lambda a, b: a + b)
        )
        lvl2 = (
            lvl1.select(
                "centroid_id",
                F.struct(F.col("chunk").alias("c"), psum.alias("s")).alias("p"),
                "pn",
            )
            .groupBy("centroid_id")
            .agg(F.sort_array(F.collect_list("p")).alias("ps"), F.sum("pn").alias("n"))
        )
        zero2 = F.transform(F.element_at(F.col("ps"), 1)["s"], lambda x: F.lit(0.0))
        total = F.aggregate(
            F.col("ps"), zero2, lambda acc, p: F.zip_with(acc, p["s"], lambda a, b: a + b)
        )
        # r15: the per-round driver sync (collect + createDataFrame) is
        # gone — the centroid table chains declaratively round to round
        # (each round consumes the previous one exactly once, via the
        # broadcast into the assignment, so the plan grows LINEARLY with
        # n_iter — the power-iteration iterate pattern).  Values are
        # bit-identical: the old round trip was an exact IEEE double
        # round trip, every fold below is unchanged.
        cents = lvl2.select(
            "centroid_id",
            F.transform(total, lambda x: x / F.col("n").cast("double")).alias("cvec"),
        )
    if checkpoint and n_iter > 0:
        # consumers read the centroid table more than once (assignment +
        # verify in semantic_dedup, build + probe in the IVF path); the
        # lazy checkpoint keeps the Lloyd chain single-execution, the
        # same cost profile as the LocalRelation it replaces.
        # checkpoint=False exposes the raw round chain (plan inspection,
        # or a single-consumer caller that wants pure lineage).
        cents = cents.localCheckpoint(eager=False)
    return cents


def ensure_index(
    build_fn, marker_dir: str, marker: str = "_SUCCESS", fingerprint: str | None = None
) -> None:
    """Build-once guard for query-registered probes: run ``build_fn()``
    unless ``marker_dir/<marker>`` already exists (parquet writes drop
    ``_SUCCESS`` atomically at commit, so a partial write never passes).
    Multi-phase builds (e.g. build + append) pass a custom ``marker``
    their ``build_fn`` writes only after the LAST phase — ``_SUCCESS``
    alone would pass after phase one.

    ``fingerprint`` guards against a STALE index, not just a missing
    one: pass a cheap summary of the corpus the index should reflect
    (e.g. :func:`corpus_fingerprint` — row count + max id, a metadata-
    only parquet scan) and the guard rebuilds whenever the stored stamp
    differs — the case where a pipeline re-lands a corrected corpus
    under the SAME path, which a marker-only guard would silently keep
    serving.  The stamp is written only AFTER a successful build (and a
    mode="overwrite" build wipes the old stamp with the directory), so
    a crashed rebuild re-runs.

    CONTRACT when ``fingerprint`` is passed: ``build_fn`` must be
    overwrite-idempotent — a staleness rebuild runs it against an
    ALREADY-POPULATED directory (the marker-only era only ever ran it
    against a missing/partial one), so a build_fn relying on Spark's
    default ``errorifexists`` write mode fails on every rebuild.  All
    in-repo index writers take ``mode="overwrite"``."""
    fp_path = os.path.join(marker_dir, "_FINGERPRINT")
    fresh = os.path.exists(os.path.join(marker_dir, marker))
    if fresh and fingerprint is not None:
        try:
            with open(fp_path) as f:
                fresh = f.read() == fingerprint
        except OSError:
            fresh = False
    if not fresh:
        build_fn()
        if fingerprint is not None:
            with open(fp_path, "w") as f:
                f.write(fingerprint)


def corpus_fingerprint(
    df: DataFrame, id_col: str = "vec_id", content_col: str | None = None
) -> str:
    """Cheap corpus identity for :func:`ensure_index`'s staleness
    guard.  Default form: row count + max id — both answered from
    parquet row-group statistics (footer reads, no data scan).  This
    detects CARDINALITY and ID-RANGE changes only (append, truncate,
    re-land with different ids); a content-only fix that keeps the same
    row count and id range — e.g. re-embedded vectors for unchanged
    ids — yields an identical stamp and the stale index keeps serving.

    Pass ``content_col`` to add an order-independent content term —
    ``sum(crc32(string(content_col)))`` — which moves on any value
    change in that column.  That term is a full data scan of the one
    column (column-pruned, no shuffle beyond the scalar agg), so it is
    the opt-in tier: footer-only for immutable-landing pipelines,
    content-summed where corrected re-lands are a real possibility."""
    aggs = [F.count("*").alias("n"), F.max(F.col(id_col)).alias("mx")]
    if content_col is not None:
        aggs.append(
            F.sum(F.crc32(F.col(content_col).cast("string"))).alias("cs")
        )
    row = df.agg(*aggs).first()
    stamp = f"n={row['n']},max={row['mx']}"
    if content_col is not None:
        stamp += f",crc={row['cs']}"
    return stamp


# ---------------------------------------------------------------------------
# Prefix-dimension (Matryoshka-style) index: truncated shortlist, exact rerank
# ---------------------------------------------------------------------------


def write_prefix_index(
    emb: DataFrame,
    path: str,
    prefix_dim: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    mode: str = "overwrite",
) -> None:
    """Persist a TRUNCATED-dimension serving table: (vec_id, pvec =
    the first ``prefix_dim`` dims, pn = the prefix norm) — the
    Matryoshka-retrieval serving layout (Kusupati et al. 2022, public:
    embeddings trained so prefixes are themselves usable embeddings;
    for untrained embeddings the prefix is a lossy projection and the
    recall audit chooses the prefix width).  At dim=64, prefix 16 the
    scan reads 4x fewer vector bytes than the full table; candidates
    found on the prefix are REFINED against full vectors (see
    :func:`prefix_refine_knn_join`), the same two-stage shape as the
    PQ refine (x114) with truncation instead of quantization as the
    compressor.  Norms are stored at build (the norm-hoisting rule)."""
    from .similarity import as_double_vec, l2_norm

    pv = F.slice(as_double_vec(vec_col), 1, prefix_dim)
    (
        emb.select(
            F.col(id_col).alias("vec_id"),
            pv.alias("pvec"),
            l2_norm(pv).alias("pn"),
        )
        .write.mode(mode)
        .parquet(os.path.join(path, "prefix"))
    )


def prefix_refine_knn_join(
    spark: SparkSession,
    queries: DataFrame,
    corpus: DataFrame,
    path: str,
    k: int = 3,
    k_shortlist: int = 10,
    prefix_dim: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Two-stage kNN over the prefix index: stage 1 scores every query
    against the TRUNCATED table (prefix cosine — sequential folds,
    stored prefix norms, broadcast O(batch) query side, top
    ``k_shortlist`` per query); stage 2 fetches only the shortlisted
    candidates' FULL vectors (broadcast semi-join) and reranks by
    exact full-dimension cosine, top-``k``.  Recall is bounded by
    whether true neighbors rank into the prefix shortlist — on
    Matryoshka-trained embeddings the prefix is faithful by
    construction; on arbitrary embeddings audit with the x60/x108
    machinery.  A zero PREFIX with a nonzero full vector is a real
    case (first dims all zero): it scores NULL in stage 1 (ranked
    last, the serve NULL-score contract) but reranks exactly if
    shortlisted.

    Returns (q_id, c_id, cos_exact, rn), ties by c_id — total order."""
    from .similarity import as_double_vec, dot, l2_norm

    qv = queries.select(
        F.col(id_col).alias("q_id"), as_double_vec(vec_col).alias("qvec")
    )
    qp = qv.select(
        "q_id",
        F.slice(F.col("qvec"), 1, prefix_dim).alias("qp"),
    ).withColumn("qpn", l2_norm(F.col("qp")))
    prefix = spark.read.parquet(os.path.join(path, "prefix"))
    w_s = Window.partitionBy("q_id").orderBy(F.desc("pcos"), F.asc("c_id"))
    short = (
        F.broadcast(qp)
        .crossJoin(prefix.select(F.col("vec_id").alias("c_id"), "pvec", "pn"))
        .withColumn(
            "pcos",
            F.when(
                (F.col("qpn") > 0) & (F.col("pn") > 0),
                dot(F.col("qp"), F.col("pvec")) / (F.col("qpn") * F.col("pn")),
            ),
        )
        .withColumn("srn", F.row_number().over(w_s))
        .filter(F.col("srn") <= k_shortlist)
        .select("q_id", "c_id")
    )
    cv = corpus.select(
        F.col(id_col).alias("c_id"), as_double_vec(vec_col).alias("cvec")
    ).withColumn("cn", l2_norm(F.col("cvec")))
    fetched = cv.join(F.broadcast(short.select("c_id").distinct()), "c_id", "left_semi")
    qn = qv.withColumn("qn", l2_norm(F.col("qvec")))
    exact = (
        short.join(F.broadcast(qn), "q_id")
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
# Bit-packed sign sketch (Hamming) index: 1 bit/dim shortlist, exact rerank
# ---------------------------------------------------------------------------


def sign_sketch_words(vec, planes, word_bits: int = 32) -> list:
    """Sign-bit signature packed into 32-bit words carried as BIGINTs:
    word w's bit i is set iff v . plane_(w*32+i) > 0.  Bits are
    DISJOINT so plain addition assembles the word — identical in any
    ANSI engine (no 1<<63 overflow; DuckDB range-checks the shift,
    Spark wraps — 32-bit words sidestep both).  The charikar-style
    sketch (random-hyperplane SimHash for vectors): E[hamming]/bits =
    theta/pi, so integer Hamming distance ORDERS candidates by angular
    proximity with no floats past the sign test."""
    from .similarity import dot, vector_literal

    words = []
    for w0 in range(0, len(planes), word_bits):
        word = F.lit(0).cast("long")
        for i, plane in enumerate(planes[w0 : w0 + word_bits]):
            word = word + F.when(
                dot(vec, vector_literal(plane)) > 0, F.lit(1 << i).cast("long")
            ).otherwise(F.lit(0).cast("long"))
        words.append(word)
    return words


def write_hamming_sketch(
    emb: DataFrame,
    path: str,
    dim: int = 64,
    n_bits: int = 32,
    seed: str = "hamming",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    mode: str = "overwrite",
) -> None:
    """Persist the bit-packed serving table: (vec_id, sig_0..sig_W) —
    ceil(n_bits/32) BIGINT words per vector.  At n_bits=64 that is 16
    sketch bytes against 512 B of float64 (32x fewer scan bytes; PQ's
    x105 stores ~8 code bytes + a norm, the prefix table 128 B) — the
    1-bit-per-projection end of the compressor family.  Planes are the
    deterministic md5 family (similarity.hyperplanes), so any engine
    rebuilds the same sketch and APPENDS never fork generations."""
    from .similarity import as_double_vec, hyperplanes

    planes = hyperplanes(n_bits, dim, seed=seed)
    words = sign_sketch_words(as_double_vec(vec_col), planes)
    cols = [F.col(id_col).alias("vec_id")] + [
        w.alias(f"sig_{i}") for i, w in enumerate(words)
    ]
    emb.select(*cols).write.mode(mode).parquet(os.path.join(path, "sketch"))


def hamming_refine_knn_join(
    spark: SparkSession,
    queries: DataFrame,
    corpus: DataFrame,
    path: str,
    k: int = 3,
    k_shortlist: int = 10,
    dim: int = 64,
    n_bits: int = 32,
    seed: str = "hamming",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Two-stage kNN over the sign sketch: stage 1 scans the bit-packed
    table and ranks by INTEGER Hamming distance — per word
    ``bit_count(sig ^ qsig)``, summed; smaller = angularly closer
    (Charikar 2002, public) — top ``k_shortlist`` per query by
    (hd asc, c_id asc), a TOTAL integer order (no float ties, no NULL
    contract: a zero vector still has a well-defined sign word).
    Stage 2 fetches only the shortlisted candidates' full vectors
    (broadcast semi-join) and reranks by exact cosine, top-``k`` —
    the same refine contract as the PQ (x114) and prefix (x121)
    stages, with the cheapest possible stage-1 bytes.

    Returns (q_id, c_id, cos_exact, rn), ties by c_id."""
    from .similarity import as_double_vec, dot, hyperplanes, l2_norm

    planes = hyperplanes(n_bits, dim, seed=seed)
    qv = queries.select(
        F.col(id_col).alias("q_id"), as_double_vec(vec_col).alias("qvec")
    )
    qwords = sign_sketch_words(F.col("qvec"), planes)
    qs = qv.select(
        "q_id", *[w.alias(f"qsig_{i}") for i, w in enumerate(qwords)]
    )
    sketch = spark.read.parquet(os.path.join(path, "sketch"))
    n_words = len(qwords)
    hd = reduce(
        lambda a, b: a + b,
        [
            F.bit_count(
                F.col(f"sig_{i}").bitwiseXOR(F.col(f"qsig_{i}"))
            ).cast("long")
            for i in range(n_words)
        ],
    )
    w_s = Window.partitionBy("q_id").orderBy(F.asc("hd"), F.asc("c_id"))
    short = (
        F.broadcast(qs)
        .crossJoin(sketch.withColumnRenamed("vec_id", "c_id"))
        .withColumn("hd", hd)
        .withColumn("srn", F.row_number().over(w_s))
        .filter(F.col("srn") <= k_shortlist)
        .select("q_id", "c_id")
    )
    cv = corpus.select(
        F.col(id_col).alias("c_id"), as_double_vec(vec_col).alias("cvec")
    ).withColumn("cn", l2_norm(F.col("cvec")))
    fetched = cv.join(F.broadcast(short.select("c_id").distinct()), "c_id", "left_semi")
    qn = qv.withColumn("qn", l2_norm(F.col("qvec")))
    exact = (
        short.join(F.broadcast(qn), "q_id")
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


def assign_to_centroids_hier(
    emb: DataFrame,
    cents: DataFrame,
    vec_col: str,
    id_col: str = "vec_id",
    fanout: int | None = None,
) -> DataFrame:
    """Two-level coarse assignment — the scale remedy for the flat
    argmax's n·c fold bill (BENCH_NOTES x157: with c=√(n/2) centroids
    the flat form's total work grows as n^1.5):

      1. supers = the first ``fanout`` centroids by id (default ⌊√c⌋)
         — a quantizer OF the quantizer;
      2. each centroid maps to its argmax-cosine super (c·√c folds —
         driver-trivial);
      3. every vector picks its super (n·√c folds), then argmaxes only
         over THAT super's centroids (n·c/√c expected) — total ~2n√c,
         near-linear where the flat form is n^1.5.

    The price is boundary misses: a vector whose true nearest centroid
    lives under a different super gets its second-best — the
    approximation IVF's own coarse level makes and SemDeDup tolerates
    (cluster scoping is already heuristic).  The procedure itself is
    DETERMINISTIC (every argmax ties to the lowest id), so it oracles
    exactly like the flat form.

    MEASURED CAVEAT (BENCH_NOTES x167): the fold savings only convert
    to wall-clock when the hierarchy keeps clusters BALANCED.  On the
    isotropic synthetic corpus the super constraint skews final
    cluster sizes (Σm² 2.2× the flat assignment's at ×100 — max
    cluster 5×), and the downstream pair stage's Σm²/2 folds erase the
    assignment savings; a farthest-first super sweep measured worse
    still.  Use this operator when the data has real cluster structure
    (or with a balance-constrained trained hierarchy); on flat-ish
    corpora prefer the flat ``assign_to_centroids`` or, best, the
    pairs-only reuse of a persisted IVF assignment.

    Output schema matches :func:`assign_to_centroids` — (id, vec_col,
    norm, centroid_id) — so SemDeDup's ``assigned=`` path and the
    index writers consume either interchangeably."""
    n_c = cents.count()  # centroid table is tiny by contract
    s = int(fanout) if fanout is not None else max(1, math.isqrt(n_c))
    cn = cents.select(
        "centroid_id", F.col("cvec"), l2_norm(F.col("cvec")).alias("c_n")
    )
    sups = (
        cn.orderBy("centroid_id")
        .limit(s)
        .select(
            F.col("centroid_id").alias("super_id"),
            F.col("cvec").alias("svec"),
            F.col("c_n").alias("s_n"),
        )
    )
    # child -> super map (c x s rows — trivial)
    c2s = (
        cn.crossJoin(F.broadcast(sups))
        .withColumn(
            "sc", dot(F.col("cvec"), F.col("svec")) / (F.col("c_n") * F.col("s_n"))
        )
        .groupBy("centroid_id")
        .agg(
            F.expr("max_by(super_id, struct(sc, -super_id))").alias("super_id"),
            F.any_value(F.col("cvec")).alias("cvec"),
            F.any_value(F.col("c_n")).alias("c_n"),
        )
    )
    v = as_double_vec(vec_col)
    base = emb.select(id_col, F.col(vec_col), v.alias("_v"), l2_norm(v).alias("_vn"))
    v2s = (
        base.crossJoin(F.broadcast(sups))
        .withColumn(
            "sc", dot(F.col("_v"), F.col("svec")) / (F.col("_vn") * F.col("s_n"))
        )
        .groupBy(id_col)
        .agg(
            F.expr("max_by(super_id, struct(sc, -super_id))").alias("super_id"),
            F.any_value(F.col(vec_col)).alias(vec_col),
            F.any_value(F.col("_v")).alias("_v"),
            F.any_value(F.col("_vn")).alias("_vn"),
        )
    )
    return (
        v2s.join(F.broadcast(c2s), "super_id")
        .withColumn(
            "c_cos", dot(F.col("_v"), F.col("cvec")) / (F.col("_vn") * F.col("c_n"))
        )
        .groupBy(id_col)
        .agg(
            F.expr("max_by(centroid_id, struct(c_cos, -centroid_id))").alias(
                "centroid_id"
            ),
            F.any_value(F.col(vec_col)).alias(vec_col),
            F.any_value(F.col("_vn")).alias("norm"),
        )
        .select(id_col, vec_col, "norm", "centroid_id")
    )
