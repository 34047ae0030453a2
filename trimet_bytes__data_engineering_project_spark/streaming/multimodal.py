"""Streaming multimodal blob landing: feature extraction + frame
sampling over micro-batches of opaque BINARY media rows.

Both extractors are pure per-blob functions (``extract_features``'s
digest/length/codepoint projection and ``sample_frames``'s
deterministic 1→N fan-out depend only on the payload bytes), so the
streamed form is EXACT: a blob processed in batch 3 lands the same
rows it would get from one batch pass over the union — the same
argument that makes ``streaming/quality.py``'s scorers exact.  Each
micro-batch lands under ``features/batch_id=N`` and
``frames/batch_id=N`` (idempotent overwrite per batch_id — the shared
landing contract of ``streaming/index.py``), and serving reads the
store, never the blobs.

Scale shape per batch: one scan of the batch's blobs through ONE
Arrow-batched mapInPandas boundary per extractor (never per-row
Python), two partition writes.  Parquet column chunks keep the
payload bytes out of every metadata-only read of the store, and the
frame fan-out happens executor-side inside the UDF — frame rows never
transit the driver.  At 100 TB this is the ingest-edge shape: decode
work rides the landing (paid once per blob, per generation), and
downstream training-data queries touch only the narrow numeric
feature table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def run_streaming_media_features(
    spark: SparkSession,
    landing_dir: str,
    store_path: str,
    checkpoint_dir: str,
    max_frames: int = 4,
) -> None:
    """availableNow stream over a parquet media landing (the
    ``MEDIA_SCHEMA`` layout); each micro-batch lands its feature rows
    under ``features/batch_id=N`` and its sampled frames (payload
    slices — real bytes, blob in / blob out) under
    ``frames/batch_id=N``."""
    from ..operators.multimodal import extract_features, sample_frames

    def land(batch_df: DataFrame, batch_id: int) -> None:
        extract_features(batch_df).write.mode("overwrite").parquet(
            f"{store_path}/features/batch_id={batch_id}"
        )
        sample_frames(batch_df, max_frames=max_frames).write.mode(
            "overwrite"
        ).parquet(f"{store_path}/frames/batch_id={batch_id}")

    (
        spark.readStream.schema(spark.read.parquet(landing_dir).schema)
        .parquet(landing_dir)
        .writeStream.foreachBatch(land)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def features_from_store(spark: SparkSession, store_path: str) -> DataFrame:
    """All landed feature generations — row-equal to one batch
    ``extract_features`` pass over the union of the landings (pinned
    by test)."""
    return spark.read.parquet(f"{store_path}/features")


def frames_from_store(spark: SparkSession, store_path: str) -> DataFrame:
    """All landed frame generations — row-equal to one batch
    ``sample_frames`` pass over the union (pinned by test)."""
    return spark.read.parquet(f"{store_path}/frames")


def run_streaming_blob_dedup(
    spark: SparkSession,
    landing_dir: str,
    store_path: str,
    dup_log_path: str,
    checkpoint_dir: str,
    bits: int = 32,
    n_bands: int = 4,
    radius: int = 3,
    max_bucket: int = 50,
) -> None:
    """Incremental BLOB near-dup against an accumulated signature store
    — x186's lifecycle pair, and the multimodal instance of the MinHash
    streaming-dedup contract (streaming/dedup.py): each arriving blob
    batch signatures once (byte-shingle SimHash — no decoder), LSH-joins
    its bands against the store (new-vs-store plus intra-batch pairs,
    higher id = the duplicate), Hamming-verifies on the full signature,
    appends its dup findings under ``dup_log/batch_id=N`` and its bands
    under ``store/batch_id=N`` — both idempotent per-batch_id overwrites
    (replay rewrites identical partitions; the store read filters out
    the replaying batch's own prior partial write).  The degenerate-
    bucket cap is computed over store ∪ batch, so a bucket that grew hot
    across generations is capped exactly as a batch build would cap it.
    Per batch the work is O(batch signatures + probed buckets) — the
    accumulated corpus is touched only through its band index, never
    re-signatured."""
    from ..operators.multimodal import blob_store_probe

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        sess = batch_df.sparkSession
        try:
            store = sess.read.parquet(store_path).filter(
                F.col("batch_id") != batch_id
            )
        except Exception:
            store = None
        dups, bands = blob_store_probe(
            batch_df, store, bits=bits, n_bands=n_bands,
            radius=radius, max_bucket=max_bucket,
        )
        bands = bands.persist()
        dups.write.mode("overwrite").parquet(f"{dup_log_path}/batch_id={batch_id}")
        (
            bands.sortWithinPartitions("band_val")
            .write.mode("overwrite")
            .parquet(f"{store_path}/batch_id={batch_id}")
        )
        bands.unpersist()

    (
        spark.readStream.schema(spark.read.parquet(landing_dir).schema)
        .parquet(landing_dir)
        .writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
