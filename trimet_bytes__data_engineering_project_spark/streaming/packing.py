"""Streaming sequence packing: concat-and-chunk global token offsets
maintained ACROSS micro-batches — the data-loader view of an
append-only corpus, computed incrementally.

State contract (the streaming-perceptron convention applied to a
counter): the only cross-batch state is the running token total, and
batch N's landing is a pure function of (offset after N-1, batch N's
rows).  Both land per batch_id — ``spans/batch_id=N`` (the per-doc
window spans) and ``state/batch_id=N`` (one row: the offset after this
batch) — so an at-least-once replay of batch N re-reads generation N-1
and overwrites identically.  Documents stream in id order (landings
are appended in id order by contract, matching the batch form's
ORDER BY id), so the streamed spans are bit-equal to one batch
``concat_chunk_spans`` pass over the union — pinned by test.

Scale shape per batch: ``concat_chunk_spans`` over the BATCH (its
two-level prefix sum runs on O(batch) rows) + one broadcast of the
1-row offset; nothing corpus-sized anywhere.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def run_streaming_packer(
    spark: SparkSession,
    landing_dir: str,
    store_path: str,
    checkpoint_dir: str,
    context_len: int,
) -> None:
    """availableNow stream over a parquet (doc_id, n_tok) landing; each
    micro-batch lands its documents' GLOBAL chunk spans under
    ``spans/batch_id=N`` and the advanced offset under
    ``state/batch_id=N``."""
    from ..operators.sampling import concat_chunk_spans

    def land(batch_df: DataFrame, batch_id: int) -> None:
        prev_path = f"{store_path}/state/batch_id={batch_id - 1}"
        prev_off = (
            int(spark.read.parquet(prev_path).collect()[0]["next_off"])
            if batch_id > 0 and os.path.exists(prev_path)
            else 0
        )
        rel = concat_chunk_spans(batch_df, "doc_id", "n_tok", context_len)
        c = F.lit(int(context_len))
        g = F.col("start_off") + F.lit(prev_off)
        out = rel.select(
            "doc_id",
            "n_tok",
            g.alias("start_off"),
            F.floor(g / c).cast("long").alias("first_chunk"),
            F.floor((g + F.col("n_tok") - F.lit(1)) / c).cast("long").alias("last_chunk"),
        ).withColumn(
            "n_chunks",
            (F.col("last_chunk") - F.col("first_chunk") + F.lit(1)).cast("long"),
        ).withColumn(
            "crosses",
            F.when(F.col("last_chunk") > F.col("first_chunk"), F.lit(1))
            .otherwise(F.lit(0))
            .cast("int"),
        )
        out.write.mode("overwrite").parquet(f"{store_path}/spans/batch_id={batch_id}")
        total = batch_df.agg(F.sum("n_tok").cast("long").alias("t")).collect()[0]["t"] or 0
        spark.createDataFrame(
            [(int(prev_off + total),)], "next_off long"
        ).write.mode("overwrite").parquet(f"{store_path}/state/batch_id={batch_id}")

    (
        spark.readStream.schema(spark.read.parquet(landing_dir).schema)
        .parquet(landing_dir)
        .writeStream.foreachBatch(land)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def spans_from_store(spark: SparkSession, store_path: str) -> DataFrame:
    """All landed spans — row-equal to one batch concat_chunk_spans
    pass over the union when landings append in id order (pinned)."""
    return spark.read.parquet(f"{store_path}/spans")
