"""Streaming classifier training: one batch-perceptron epoch per
micro-batch, warm-started from the previous batch's stored weights —
the online-learning form of ``operators/classifier.py``.

State contract: the weight table for batch N is a pure function of
(weights at N-1, batch N's rows), and it lands under
``weights/batch_id=N`` (overwrite).  A replay of batch N re-reads the
N-1 generation — never "latest" — and recomputes the identical table,
so the landing is idempotent under at-least-once delivery even though
the state evolves (the same per-batch_id determinism argument as the
streaming dedup store, applied to model state).  The stored history of
generations doubles as the training curve.

Scale shape per batch: the tf build + two aggregations of
``perceptron_train`` over the MICRO-BATCH only; the only cross-batch
state is the bounded 16^hex_digits-row weight vector.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .hadoopfs import fs_exists, fs_list_names


def _load_weights(spark: SparkSession, path: str, n_buckets: int) -> list[int]:
    rows = spark.read.parquet(path).collect()
    w = [0] * n_buckets
    for r in rows:
        w[int(r["b"])] = int(r["w"])
    return w


def run_streaming_perceptron(
    spark: SparkSession,
    landing_dir: str,
    store_path: str,
    checkpoint_dir: str,
    positive_expr: str = "lang = 'en'",
    hex_digits: int = 2,
) -> None:
    """availableNow stream over a parquet document landing; each
    micro-batch runs ONE perceptron epoch warm-started from
    ``weights/batch_id=N-1`` (zeros for the first batch) and lands the
    updated (b, w) table under ``weights/batch_id=N``."""
    from ..operators.classifier import perceptron_train

    n_buckets = 16**hex_digits

    def land(batch_df: DataFrame, batch_id: int) -> None:
        prev = f"{store_path}/weights/batch_id={batch_id - 1}"
        init = (
            _load_weights(spark, prev, n_buckets)
            if batch_id > 0 and fs_exists(spark, prev)
            else None
        )
        out = perceptron_train(
            batch_df,
            F.expr(positive_expr),
            hex_digits=hex_digits,
            n_epochs=1,
            init_weights=init,
        ).select("b", F.col("w1").alias("w"))
        out.write.mode("overwrite").parquet(f"{store_path}/weights/batch_id={batch_id}")

    (
        spark.readStream.schema(spark.read.parquet(landing_dir).schema)
        .parquet(landing_dir)
        .writeStream.foreachBatch(land)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def latest_weights(spark: SparkSession, store_path: str) -> DataFrame:
    """The newest weight generation — the serving vector for
    ``classifier.perceptron_margins``."""
    root = f"{store_path}/weights"
    gens = [
        int(d.split("=", 1)[1])
        for d in fs_list_names(spark, root)
        if d.startswith("batch_id=")
    ]
    return spark.read.parquet(f"{root}/batch_id={max(gens)}")
