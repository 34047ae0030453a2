"""Incremental (streaming) near-duplicate detection — the continuous
form of the MinHash-LSH batch operator, for a corpus that never stops
arriving (the 100 TB training-data ingestion shape).

Per micro-batch (``foreachBatch``):

1. signature the batch (``minhash_signatures`` — explode → md5 →
   hash-agg, same operator as batch dedup);
2. LSH-join the batch's bands against the ACCUMULATED signature store
   on (band_idx, band_hash), with the SAME ``MAX_BUCKET`` skew cap as
   the batch operator (``minhash_candidates``): bucket sizes are
   counted over store ∪ batch, and oversized buckets — boilerplate /
   near-empty docs all colliding on one band_hash — are excluded from
   BOTH sides of the probe.  Cost therefore scales with bounded bucket
   collisions, never quadratically in a degenerate bucket's history;
3. batch docs whose estimated Jaccard against any stored doc clears
   the threshold are appended to the duplicate log (new_id, dup_of,
   est_sim);
4. the batch's bands are appended to the store — including the
   duplicates', so later copies point at the earliest-seen original
   OR any prior copy, and intra-batch duplicates are caught by the
   in-batch self-join.

**Idempotency / at-least-once:** ``foreachBatch`` may re-run a batch
after a failure, so each write lands in its own partition directory
(``.../batch_id=N``, parquet partition discovery turns it back into a
column) with ``mode("overwrite")`` — a retried batch OVERWRITES its own
partition instead of appending twice, making both the store and the
dup log exactly-once under replay.  Rows within each store partition
are sorted by ``band_hash`` so probe-side row groups cluster by bucket.

State lives in parquet, not executor memory: restartable from the
stream checkpoint + the store, and bounded by corpus size, never by
stream history × corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import (
    MAX_BUCKET,
    minhash_estimate,
    minhash_signatures,
    signature_bands,
)

DOC_STREAM_SCHEMA = "doc_id long, text string"


def _cap_oversized_buckets(bands: DataFrame, universe: DataFrame) -> DataFrame:
    """Drop rows of ``bands`` whose (band_idx, band_hash) bucket holds
    more than MAX_BUCKET rows in ``universe`` (= store ∪ batch) — the
    operator-contract cap of ``minhash_candidates``, applied to the
    streaming probe."""
    keep = (
        universe.groupBy("band_idx", "band_hash")
        .count()
        .filter(F.col("count") <= MAX_BUCKET)
        .select("band_idx", "band_hash")
    )
    return bands.join(keep, ["band_idx", "band_hash"])


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
    ``store_path``.  Both writes are idempotent on batch_id (see module
    docstring), so a crash between them is repaired by the checkpoint
    replay instead of duplicating rows."""

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        sess = batch_df.sparkSession
        bands = signature_bands(minhash_signatures(batch_df)).persist()
        try:
            store = sess.read.parquet(store_path).filter(
                F.col("batch_id") != batch_id  # replay: ignore own partial prior write
            )
        except Exception:
            store = None  # first batch: empty store

        universe = bands if store is None else bands.unionByName(
            store.select("doc_id", "sig", "band_idx", "band_hash")
        )
        capped_new = _cap_oversized_buckets(bands, universe)

        # intra-batch pairs count too (earlier id wins as the original)
        intra = _cross_candidates(capped_new, capped_new).filter(
            F.col("new_id") > F.col("dup_of")
        )
        if store is None:
            cands = intra
        else:
            capped_store = _cap_oversized_buckets(store, universe)
            cands = intra.unionByName(_cross_candidates(capped_new, capped_store))
        dups = (
            cands.withColumn("est_sim", minhash_estimate(F.col("a_sig"), F.col("b_sig")))
            .filter(F.col("est_sim") >= est_threshold)
            .select("new_id", "dup_of", "est_sim")
        )
        dups.write.mode("overwrite").parquet(f"{dup_log_path}/batch_id={batch_id}")
        (
            bands.sortWithinPartitions("band_hash")
            .write.mode("overwrite")
            .parquet(f"{store_path}/batch_id={batch_id}")
        )
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
