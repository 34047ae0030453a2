"""Streaming ANN-index maintenance — the streaming twin of the batch
build/append lifecycle in ``operators/ann_index.py`` (x20/x30).

A production retrieval index is not rebuilt per crawl: new embedding
batches stream in and must land in the SAME bucket-partitioned layout
every probe already reads.  The batch ``write_lsh_index(mode="append")``
path is at-least-once under foreachBatch replay (a replayed micro-batch
would append its rows twice); here each micro-batch instead OVERWRITES
its own ``batch_id=N`` directory — the same per-batch_id idempotence
contract as the streaming dedup store (``streaming/dedup.py`` module
docstring) — so a crash-and-replay repairs the index instead of
duplicating vectors.

Layout: ``{index}/batch_id=N/bucket=B/part-*.parquet``.  A root read
discovers both hive partition columns, and the probe's bucket IN-list
filter prunes at the bucket level exactly as for the batch-built index
(same hyperplanes — they are a deterministic function of
(n_planes, dim)), so ``lsh_index_probe`` works on either layout
unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.ann_index import LSH_PLANES
from ..operators.similarity import as_double_vec, hyperplanes, l2_norm, lsh_bucket


def run_streaming_lsh_index(
    spark: SparkSession,
    landing_dir: str,
    index_path: str,
    dim: int,
    checkpoint_dir: str,
    n_planes: int = LSH_PLANES,
    vec_col: str = "embedding",
    vec_element_type: str = "float",
) -> None:
    """availableNow stream over a parquet embedding landing: signature
    each micro-batch with the deterministic hyperplanes and land it
    bucket-partitioned under its own ``batch_id=N`` directory
    (idempotent overwrite — exactly-once net effect under replay)."""
    planes = hyperplanes(n_planes, dim)

    def land(batch_df: DataFrame, batch_id: int) -> None:
        v = as_double_vec(vec_col)
        (
            # same layout as write_lsh_index, incl. the build-time norm
            # and the bucket-aligned shuffle (one file per bucket per
            # batch, not tasks x buckets)
            batch_df.withColumn("bucket", lsh_bucket(v, planes))
            .withColumn("norm", l2_norm(v))
            .repartition(F.col("bucket"))
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(f"{index_path}/batch_id={batch_id}")
        )

    # a landing written with double embeddings streams with
    # vec_element_type="double" — downstream as_double_vec normalizes
    # either dtype, matching the batch path's load_table tolerance
    schema = f"vec_id long, {vec_col} array<{vec_element_type}>"
    (
        spark.readStream.schema(schema)
        .parquet(landing_dir)
        .writeStream.foreachBatch(land)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def bootstrap_ivf_quantizer(
    centroids: DataFrame,
    index_path: str,
) -> None:
    """Persist the coarse quantizer for a streaming IVF index WITHOUT
    writing any vectors — the streamed index must stay homogeneous
    (every vector under ``batch_id=N/centroid_id=C``), so the batch
    build's root-level layout cannot be mixed in.  ``centroids`` is
    (centroid_id, cvec) — the deterministic first-n table or
    ``kmeans_centroids`` output."""
    from ..operators.ann_index import _centroids_path

    centroids.write.mode("overwrite").parquet(_centroids_path(index_path))


def run_streaming_ivf_index(
    spark: SparkSession,
    landing_dir: str,
    index_path: str,
    checkpoint_dir: str,
    vec_col: str = "embedding",
    vec_element_type: str = "float",
) -> None:
    """Streaming twin of ``write_ivf_index(mode="append")`` with the
    exactly-once contract append lacks: each micro-batch is assigned
    against the FROZEN persisted quantizer
    (:func:`bootstrap_ivf_quantizer` must have run — a re-derived
    quantizer would scatter generations across incompatible lists)
    and lands centroid-partitioned under its own ``batch_id=N``
    directory (idempotent overwrite on replay).  ``ivf_index_probe``
    reads the root unchanged: partition discovery adds batch_id, the
    nprobe IN-list still prunes on centroid_id."""
    from ..operators.ann_index import _centroids_path, land_ivf_batch

    cents = spark.read.parquet(_centroids_path(index_path))

    def land(batch_df: DataFrame, batch_id: int) -> None:
        land_ivf_batch(batch_df, cents, index_path, batch_id, vec_col)

    # a landing written with double embeddings streams with
    # vec_element_type="double" — downstream as_double_vec normalizes
    # either dtype, matching the batch path's load_table tolerance
    schema = f"vec_id long, {vec_col} array<{vec_element_type}>"
    (
        spark.readStream.schema(schema)
        .parquet(landing_dir)
        .writeStream.foreachBatch(land)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def run_streaming_knn_serve(
    spark: SparkSession,
    landing_dir: str,
    index_path: str,
    results_path: str,
    checkpoint_dir: str,
    dim: int,
    k: int = 3,
    n_planes: int | None = None,
    vec_col: str = "embedding",
    vec_element_type: str = "float",
    quantized: bool = False,
) -> None:
    """Streaming retrieval SERVING over a persisted LSH index: each
    micro-batch of query vectors is signatured with the index's own
    deterministic hyperplanes, the batch's distinct bucket set (≤ 2^p
    ids — a bounded driver-side collect, same cost class as the probe's
    literal bucket) becomes an IN-list PARTITION FILTER on the index
    scan, and the per-query top-k lands under ``batch_id=N`` with the
    idempotent-overwrite exactly-once contract.

    The serving plan per batch is exactly ``knn_join``'s shape — one
    bucket-keyed equi-join + per-query streaming row_number — except
    the corpus side reads ONLY the probed bucket partitions instead of
    re-signaturing the corpus (the entire point of persisting the
    index).  Each micro-batch delegates to the batch operator
    ``ann_index.knn_join_index`` — serving IS the batch plan driven by
    the stream.  Results are pinned identical to query-time
    ``knn_join`` over the same corpus (test)."""
    from ..operators.ann_index import (
        LSH_PLANES,
        knn_join_index,
        quantized_knn_join_index,
    )

    if n_planes is None:
        n_planes = LSH_PLANES
    # quantized=True serves from an int8 index written by
    # write_quantized_lsh_index — same bucket arithmetic, scores are
    # the quantized cosine (x91's contract)
    join_fn = quantized_knn_join_index if quantized else knn_join_index

    def serve(batch_df: DataFrame, batch_id: int) -> None:
        (
            join_fn(spark, batch_df, index_path, dim, k, n_planes, vec_col)
            .write.mode("overwrite")
            .parquet(f"{results_path}/batch_id={batch_id}")
        )

    # a landing written with double embeddings streams with
    # vec_element_type="double" — downstream as_double_vec normalizes
    # either dtype, matching the batch path's load_table tolerance
    schema = f"vec_id long, {vec_col} array<{vec_element_type}>"
    (
        spark.readStream.schema(schema)
        .parquet(landing_dir)
        .writeStream.foreachBatch(serve)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def run_streaming_ivf_serve(
    spark: SparkSession,
    landing_dir: str,
    index_path: str,
    results_path: str,
    checkpoint_dir: str,
    k: int = 3,
    nprobe: int = 1,
    vec_col: str = "embedding",
    vec_element_type: str = "float",
    quantized: bool = False,
) -> None:
    """Streaming retrieval serving over a persisted IVF index —
    :func:`run_streaming_knn_serve`'s inverted-list sibling: each
    micro-batch of query vectors is assigned its ``nprobe`` nearest
    coarse centroids against the index's FROZEN persisted quantizer,
    the batch's probed-list set becomes an IN-list partition filter,
    and the per-query top-k lands under ``batch_id=N`` with the
    idempotent-overwrite exactly-once contract.  Each micro-batch
    delegates to the batch operator (``ivf_knn_join``, or
    ``quantized_ivf_knn_join`` with ``quantized=True`` over an int8
    index written by ``write_quantized_ivf_index``) — serving IS the
    batch plan driven by the stream, so results are pinned identical
    to the batch join per batch (test)."""
    from ..operators.ann_index import ivf_knn_join, quantized_ivf_knn_join

    join_fn = quantized_ivf_knn_join if quantized else ivf_knn_join

    def serve(batch_df: DataFrame, batch_id: int) -> None:
        (
            join_fn(spark, batch_df, index_path, k=k, nprobe=nprobe, vec_col=vec_col)
            .write.mode("overwrite")
            .parquet(f"{results_path}/batch_id={batch_id}")
        )

    schema = f"vec_id long, {vec_col} array<{vec_element_type}>"
    (
        spark.readStream.schema(schema)
        .parquet(landing_dir)
        .writeStream.foreachBatch(serve)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def run_streaming_inverted_index(
    spark: SparkSession,
    landing_dir: str,
    index_path: str,
    checkpoint_dir: str,
    n_buckets: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Streaming maintenance for the LEXICAL inverted index — the
    ``run_streaming_lsh_index`` contract applied to BM25 postings
    (``operators/retrieval.py``): an availableNow stream over a parquet
    document landing tokenizes each micro-batch and lands its postings
    under ``postings/batch_id=N/term_bucket=B`` (idempotent overwrite
    per batch_id — a replayed micro-batch repairs, never duplicates)
    with the same bucket-aligned shuffle + per-bucket term sort as the
    batch build, so the serve path's partition IN-list and pushed term
    predicate prune identically on either layout.

    What streaming CANNOT maintain is the batch build's denormalized
    ``df`` — document frequency is a global statistic, and every new
    generation would stale it across all older ones.  Streamed
    postings therefore omit df, and serving uses
    ``bm25_serve(derived_df=True)``, which re-derives df from the
    probed postings (O(probed postings); correct because pruning keeps
    whole posting lists).  Stats land per batch as RAW (n, l) rows —
    additive, so the serve-time sum is exactly the full-corpus value.
    Generations must carry disjoint doc_ids (the new-ids append
    contract shared with the ANN indexes)."""
    from ..operators.retrieval import N_TERM_BUCKETS, land_inverted_batch

    nb = n_buckets or N_TERM_BUCKETS

    def land(batch_df: DataFrame, batch_id: int) -> None:
        # one shared implementation with batch backfills and the
        # compaction source layout (operators/retrieval.py)
        land_inverted_batch(batch_df, index_path, batch_id, nb, id_col, text_col)

    (
        spark.readStream.schema(
            spark.read.parquet(landing_dir).schema
        )
        .parquet(landing_dir)
        .writeStream.foreachBatch(land)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def run_streaming_pq_serve(
    spark: SparkSession,
    landing_dir: str,
    index_path: str,
    results_path: str,
    checkpoint_dir: str,
    k: int = 3,
    m: int | None = None,
    vec_col: str = "embedding",
    vec_element_type: str = "float",
) -> None:
    """Streaming ADC serving over a persisted PQ index — the
    compressed-codes member of the serving family (LSH float, LSH
    int8, IVF float/int8, and now PQ): each micro-batch of
    full-precision query vectors delegates to the batch operator
    ``pq.pq_knn_join`` (per-query distance tables over the frozen
    codebook, one codes scan), landing per-query top-k under
    ``batch_id=N`` with the idempotent-overwrite exactly-once
    contract.  Results pinned identical to the batch join over the
    same queries (test)."""
    from ..operators.pq import PQ_M, pq_knn_join

    mm = m or PQ_M

    def serve(batch_df: DataFrame, batch_id: int) -> None:
        (
            pq_knn_join(spark, batch_df, index_path, k=k, m=mm, vec_col=vec_col)
            .write.mode("overwrite")
            .parquet(f"{results_path}/batch_id={batch_id}")
        )

    schema = f"vec_id long, {vec_col} array<{vec_element_type}>"
    (
        spark.readStream.schema(schema)
        .parquet(landing_dir)
        .writeStream.foreachBatch(serve)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def run_streaming_bm25_serve(
    spark: SparkSession,
    landing_dir: str,
    index_path: str,
    results_path: str,
    checkpoint_dir: str,
    k: int = 5,
    n_buckets: int | None = None,
    derived_df: bool = False,
) -> None:
    """Streaming LEXICAL serving over a persisted inverted index — the
    :func:`run_streaming_knn_serve` contract for BM25: each micro-batch
    of (query_id, term) rows probes the index through the batch
    operator ``retrieval.bm25_serve`` (bucket IN-list partition filter
    + pushed term predicate — serving IS the batch plan driven by the
    stream), and the per-query top-k lands under ``batch_id=N`` with
    the idempotent-overwrite exactly-once contract.  Results are
    pinned identical to the query-time serve per batch (test).

    ``derived_df=True`` serves a SEGMENTED (streamed-maintenance)
    index whose stored df is absent — the bm25_serve append-tolerant
    mode; after :func:`...retrieval.compact_inverted_index` runs, flip
    it back to the stored-df fast path, results unchanged."""
    from ..operators.retrieval import N_TERM_BUCKETS, bm25_serve

    nb = n_buckets or N_TERM_BUCKETS

    def serve(batch_df: DataFrame, batch_id: int) -> None:
        (
            bm25_serve(spark, batch_df, index_path, k=k, n_buckets=nb, derived_df=derived_df)
            .write.mode("overwrite")
            .parquet(f"{results_path}/batch_id={batch_id}")
        )

    (
        spark.readStream.schema("query_id long, term string")
        .parquet(landing_dir)
        .writeStream.foreachBatch(serve)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def run_streaming_forward_index(
    spark: SparkSession,
    landing_dir: str,
    index_path: str,
    checkpoint_dir: str,
    n_buckets: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Streaming maintenance for the FORWARD (doc-major) table — the
    ``run_streaming_inverted_index`` contract applied to
    ``operators/retrieval.py:write_forward_index``'s layout: each
    micro-batch lands its (doc_id, term, tf) rows under
    ``forward/batch_id=N/doc_bucket=B`` (idempotent overwrite per
    batch_id).  No df/stats sidecar exists to stale, so the streamed
    layout serves ``fetch_doc_terms`` with NO degraded mode — the
    doc-bucket IN-list prunes inside every generation and the
    projection drops the batch_id column.  Disjoint doc_ids per
    generation (the shared append contract)."""
    from ..operators.retrieval import N_TERM_BUCKETS, land_forward_batch

    nb = n_buckets or N_TERM_BUCKETS

    def land(batch_df: DataFrame, batch_id: int) -> None:
        land_forward_batch(batch_df, index_path, batch_id, nb, id_col, text_col)

    (
        spark.readStream.schema(spark.read.parquet(landing_dir).schema)
        .parquet(landing_dir)
        .writeStream.foreachBatch(land)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def run_streaming_passage_index(
    spark: SparkSession,
    landing_dir: str,
    index_path: str,
    checkpoint_dir: str,
    size: int = 200,
    stride: int = 150,
    n_buckets: int | None = None,
) -> None:
    """Streaming maintenance for the PASSAGE-level inverted index (the
    RAG serving stack's ingest edge): each micro-batch of documents is
    chunked into overlapping windows (``chunk_documents`` is a pure
    per-document projection, so streamed chunking is EXACT), passage
    keys pack as doc_id·2^20+chunk_idx (the x178 pooling contract),
    and the passages land through the same
    ``land_inverted_batch`` generation layout as the document index —
    derived-df serving (``bm25_serve(derived_df=True)``) then scores
    bit-equal to an in-flight pass over the union (pinned by test).
    Generations must carry disjoint doc_ids, which makes passage ids
    disjoint by construction."""
    from ..operators.retrieval import N_TERM_BUCKETS, land_inverted_batch
    from ..operators.textstats import chunk_documents

    nb = n_buckets or N_TERM_BUCKETS

    def land(batch_df: DataFrame, batch_id: int) -> None:
        passages = chunk_documents(batch_df, size=size, stride=stride).select(
            (F.col("doc_id") * F.lit(1048576) + F.col("chunk_idx"))
            .cast("long")
            .alias("doc_id"),
            F.col("chunk_text").alias("text"),
        )
        land_inverted_batch(passages, index_path, batch_id, nb)

    (
        spark.readStream.schema(spark.read.parquet(landing_dir).schema)
        .parquet(landing_dir)
        .writeStream.foreachBatch(land)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
