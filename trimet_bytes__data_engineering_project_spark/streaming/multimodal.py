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
