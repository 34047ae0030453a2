"""Streaming corpus statistics: mergeable fixed-bin histograms.

``operators/sampling.py:value_histogram`` is additive — generation
histograms sum bin-wise to the union's histogram — so the streamed form
is EXACT, not approximate: each micro-batch lands its own (bin_idx,
cnt) rows under ``hist/batch_id=N`` (idempotent overwrite per batch_id,
the shared landing contract of ``streaming/index.py``), and serving
sums the stored generations before the shared quantile read-off.
Quantiles served from the store are bit-equal to an in-flight pass over
the union (pinned by test) — the streaming analogue of the additive
raw-(n, l) stats the inverted index keeps.

Scale shape: per batch one n_bins-group count (map-side combined — the
shuffle carries n_bins rows/task); serving reads only the tiny
histogram store, NEVER the corpus.  This is how a 100 TB pipeline keeps
live length/quality distributions: the corpus is scanned once per
landing, and every threshold decision afterwards reads kilobytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def run_streaming_histogram(
    spark: SparkSession,
    landing_dir: str,
    store_path: str,
    checkpoint_dir: str,
    value_expr: str,
    lo: int,
    hi: int,
    n_bins: int,
) -> None:
    """availableNow stream over a parquet landing; each micro-batch
    lands ``value_histogram(value_expr)`` under ``hist/batch_id=N``.
    ``value_expr`` is a SQL expression evaluated against the landed
    rows (e.g. a token count), so the histogram column need not exist
    in the landing schema."""
    from ..operators.sampling import value_histogram

    def land(batch_df: DataFrame, batch_id: int) -> None:
        hist = value_histogram(
            batch_df.selectExpr(f"({value_expr}) AS _v"), "_v", lo, hi, n_bins
        )
        hist.write.mode("overwrite").parquet(
            f"{store_path}/hist/batch_id={batch_id}"
        )

    (
        spark.readStream.schema(spark.read.parquet(landing_dir).schema)
        .parquet(landing_dir)
        .writeStream.foreachBatch(land)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def quantiles_from_store(
    spark: SparkSession,
    store_path: str,
    probs: list[tuple[int, int]],
    lo: int,
    hi: int,
    n_bins: int,
) -> DataFrame:
    """Quantile read-off over the summed stored generations —
    bit-equal to the in-flight form over the union (additivity)."""
    from ..operators.sampling import quantiles_from_histogram

    hist = (
        spark.read.parquet(f"{store_path}/hist")
        .groupBy("bin_idx")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )
    return quantiles_from_histogram(hist, probs, lo, hi, n_bins)
