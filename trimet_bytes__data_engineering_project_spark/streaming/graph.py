"""Streaming dedup-graph maintenance: incremental connected components.

The batch operator (``operators/graph.py:merge_components``) folds a
new edge batch into a stored ``(node, cluster_id)`` labeling with
labels BIT-EQUAL to a full recompute.  This module gives it the landing
lifecycle the other state stores have — with one deliberate difference
in the generation contract:

* the sum/max stores (``stats.py``) land INDEPENDENT per-batch tables
  and serving folds ALL generations (additivity);
* the label store is CUMULATIVE — generation N is the post-fold
  labeling after batch N, a pure function of (generation N-1,
  batch N) — so serving reads ONLY the newest generation.

Replay safety comes from the fold's algebra, not from bookkeeping:
re-folding an already-folded batch is a no-op (its edges connect nodes
that already share labels), so a replay of batch N against EITHER
generation N-1 or an already-written generation N rewrites an
identical generation N.  Every crash point is therefore recoverable:
generation dirs are only ever rewritten with their own contents.

Scale shape per batch: the merge graph is O(|store nodes| + |batch|)
star+batch edges with star diameter 2 — rounds converge in the batch's
diameter, historical pair lists are never re-read (measured 6.5 s vs
the 9.3 s full recompute at the ×100 chain fixture, BENCH_NOTES).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .hadoopfs import fs_exists, fs_list_names


def latest_label_generation(spark: SparkSession, store_path: str) -> int | None:
    """Newest ``batch_id`` under ``labels/`` via the Hadoop FS API
    (scheme-safe — an ``os.path`` probe on S3A would silently reset the
    store to its zero generation)."""
    root = f"{store_path}/labels"
    if not fs_exists(spark, root):
        return None
    gens = [
        int(n.split("=", 1)[1])
        for n in fs_list_names(spark, root)
        if n.startswith("batch_id=")
    ]
    return max(gens) if gens else None


def components_from_store(spark: SparkSession, store_path: str) -> DataFrame:
    """The current labeling: the newest generation alone (cumulative
    contract — NOT a fold over generations)."""
    gen = latest_label_generation(spark, store_path)
    if gen is None:
        raise FileNotFoundError(f"no label generations under {store_path}/labels")
    return spark.read.parquet(f"{store_path}/labels/batch_id={gen}")


def run_streaming_components(
    spark: SparkSession,
    landing_dir: str,
    store_path: str,
    checkpoint_dir: str,
    a_col: str = "a_id",
    b_col: str = "b_id",
) -> None:
    """availableNow stream over a parquet landing of candidate pairs;
    each micro-batch folds into the stored labeling via
    ``merge_components`` (or seeds it via ``connected_components`` on
    the first batch) and writes the post-fold labeling under
    ``labels/batch_id=N``.  Pinned by test: the served labeling equals
    the batch operator over the UNION of all landed pairs, and replay
    is a no-op."""
    from ..operators.graph import connected_components, merge_components

    def land(batch_df: DataFrame, batch_id: int) -> None:
        pairs = batch_df.select(a_col, b_col)
        gen = latest_label_generation(spark, store_path)
        # a replayed batch may see its own generation as newest; the
        # fold is idempotent either way (see module docstring)
        if gen is None:
            labels = connected_components(pairs, a_col, b_col)
        else:
            prev = spark.read.parquet(f"{store_path}/labels/batch_id={gen}")
            labels = merge_components(prev, pairs, a_col=a_col, b_col=b_col)
        labels.write.mode("overwrite").parquet(
            f"{store_path}/labels/batch_id={batch_id}"
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
