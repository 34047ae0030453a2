"""Incremental (streaming) near-duplicate detection — the continuous
form of the MinHash-LSH batch operator, for a corpus that never stops
arriving (the 100 TB training-data ingestion shape).

Per micro-batch (``foreachBatch``):

1. signature the batch (``minhash_signatures`` — explode → md5 →
   hash-agg, same operator as batch dedup);
2. LSH-join the batch's bands against the ACCUMULATED signature store
   on (band_idx, band_hash) — cost scales with bucket collisions, not
   store size, and at fleet scale the store is written bucketed by
   band_hash so the probe is a co-located join;
3. batch docs whose estimated Jaccard against any stored doc clears
   the threshold are appended to the duplicate log (new_id, dup_of,
   est_sim);
4. the batch's bands are appended to the store — including the
   duplicates', so later copies point at the earliest-seen original
   OR any prior copy, and intra-batch duplicates are caught by the
   next batch's probe of the store plus the in-batch self-join.

State lives in parquet, not executor memory: restartable from the
stream checkpoint + the store, and bounded by corpus size, never by
stream history × corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import (
    minhash_estimate,
    minhash_signatures,
    signature_bands,
)

DOC_STREAM_SCHEMA = "doc_id long, text string"


def _cross_candidates(new_bands: DataFrame, store: DataFrame) -> DataFrame:
    """(new_id, dup_of, est_sim ≥ 0) candidates of new-vs-store."""
    a = new_bands.select(
        "band_idx", "band_hash", F.col("doc_id").alias("new_id"), F.col("sig").alias("a_sig")
    )
    b = store.select(
        "band_idx", "band_hash", F.col("doc_id").alias("dup_of"), F.col("sig").alias("b_sig")
    )
    return (
        a.join(b, ["band_idx", "band_hash"])
        .filter(F.col("new_id") != F.col("dup_of"))
        .select("new_id", "dup_of", "a_sig", "b_sig")
        .distinct()
    )


def run_streaming_dedup(
    spark: SparkSession,
    landing_dir: str,
    store_path: str,
    dup_log_path: str,
    checkpoint_dir: str,
    est_threshold: float = 0.25,
) -> None:
    """availableNow incremental dedup over a JSON document landing.

    Appends (new_id, dup_of, est_sim) rows to ``dup_log_path`` for
    every arriving doc whose MinHash estimate against an already-seen
    doc clears ``est_threshold``; maintains the signature store at
    ``store_path``."""

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        sess = batch_df.sparkSession
        bands = signature_bands(minhash_signatures(batch_df)).persist()
        try:
            store = sess.read.parquet(store_path)
        except Exception:
            store = None  # first batch: empty store

        # intra-batch pairs count too (earlier id wins as the original)
        intra = _cross_candidates(bands, bands).filter(F.col("new_id") > F.col("dup_of"))
        cands = (
            intra if store is None else intra.unionByName(_cross_candidates(bands, store))
        )
        dups = (
            cands.withColumn("est_sim", minhash_estimate(F.col("a_sig"), F.col("b_sig")))
            .filter(F.col("est_sim") >= est_threshold)
            .select("new_id", "dup_of", "est_sim")
        )
        dups.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(
            dup_log_path
        )
        bands.write.mode("append").parquet(store_path)
        bands.unpersist()

    (
        spark.readStream.schema(DOC_STREAM_SCHEMA)
        .json(landing_dir)
        .writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
