"""Distributed linear-classifier TRAINING over hashed token features —
the missing half of the quality-classifier story (inference has been
x47's ``hashed_linear_score`` since round 2): a fasttext-shaped model
(bag of hashed unigrams → linear score) trained by the batch
perceptron, entirely as DataFrame ops.

Why the batch perceptron and not SGD: the sequential perceptron visits
samples one at a time (inherently serial — wrong for a cluster), while
the batch variant scores EVERY doc against the frozen epoch weights and
applies the summed update of all misclassified docs at once.  Each
epoch is two corpus-shaped aggregations; the weight vector itself is
bounded (16^hex_digits buckets — DSIR's hashed-feature trick, x143), so
the driver sync per epoch moves a few KB, exactly like the Lloyd
centroid sync in ``ann_index.kmeans_centroids``.

Everything checked is integer: counts, ±1 labels, learning-rate-1
updates — bit-identical across engines with no float in sight, and
deterministic regardless of partitioning because every update is a
SUM over a set (order-free), never a sequential walk.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textstats import _bucketed_tokens


def _tf_with_labels(
    docs: DataFrame,
    positive: Column,
    id_col: str,
    text_col: str,
    hex_digits: int,
) -> DataFrame:
    """(doc_id, b, c, y): per-doc hashed-bucket term frequencies with
    the ±1 label.  Zero-token docs drop out — they carry no features,
    so they can never contribute an update (both engines agree)."""
    lab = docs.select(
        F.col(id_col).alias("doc_id"),
        F.when(positive, F.lit(1)).otherwise(F.lit(-1)).cast("long").alias("y"),
    )
    toks = _bucketed_tokens(
        docs.select(F.col(id_col).alias("doc_id"), F.col(text_col)),
        ["doc_id"],
        text_col,
        hex_digits,
    )
    return (
        toks.groupBy("doc_id", "b")
        .agg(F.count("*").cast("long").alias("c"))
        .join(lab, "doc_id")
    )


def perceptron_train(
    docs: DataFrame,
    positive: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    hex_digits: int = 2,
    n_epochs: int = 3,
    init_weights: list[int] | None = None,
) -> DataFrame:
    """Train a hashed-unigram linear classifier by the batch perceptron
    and return the FULL weight trajectory: one row per bucket ``b`` in
    ``[0, 16^hex_digits)`` with columns ``w1..w{n_epochs}`` (the weight
    after each epoch) — the trajectory, not just the final vector, so a
    training run is checkable epoch-by-epoch.

    Epoch t (learning rate 1, w_0 = 0):

        margin_d = Σ_b tf(d,b) · w_{t-1}(b)          (broadcast join)
        mis      = { d : y_d · margin_d ≤ 0 }
        w_t      = w_{t-1} + Σ_{d ∈ mis} y_d · tf(d,·)

    With w_0 = 0 every doc is misclassified in epoch 1 (margin 0), so
    w_1 is the class-difference count vector — the Rocchio/centroid
    baseline — and later epochs correct it where it errs.

    Scale shape: the tf table is built ONCE and checkpointed; each
    epoch is (a) one broadcast join against the ≤256-row weight table
    plus a map-side-combinable per-doc sum, and (b) one per-bucket sum
    over misclassified docs (leftsemi join on doc_id — no payload
    widening).  Nothing corpus-sized is ever collected: the driver
    round-trip per epoch is the bounded weight vector, the same
    contract as the Lloyd sync.  Int64 ceiling: |w(b)| ≤ epochs ·
    total tokens in bucket b, and margins ≤ doc tokens · max|w| —
    overflow needs > 2^63 token-instances·weight, unreachable before
    per-language sharding would apply anyway.

    ``positive``: boolean Column over ``docs`` defining the +1 class
    (e.g. ``F.col("lang") == "en"`` — the DSIR target convention).
    ``init_weights``: warm-start vector (len ``16^hex_digits``) — the
    continued-training contract the streaming landing uses (train one
    epoch per micro-batch from the previous batch's stored weights);
    defaults to zeros.
    """
    spark = docs.sparkSession
    n_buckets = 16**hex_digits
    tf = _tf_with_labels(docs, positive, id_col, text_col, hex_digits)
    tf = tf.localCheckpoint(eager=False)
    if init_weights is not None and len(init_weights) != n_buckets:
        raise ValueError(f"init_weights must have {n_buckets} entries")
    w = [int(x) for x in init_weights] if init_weights is not None else [0] * n_buckets
    trajectory: list[list[int]] = []
    for _ in range(n_epochs):
        wdf = spark.createDataFrame(
            [(b, w[b]) for b in range(n_buckets)], "b long, w long"
        )
        mis = (
            tf.join(F.broadcast(wdf), "b")
            .groupBy("doc_id", "y")
            .agg(F.sum(F.col("c") * F.col("w")).alias("margin"))
            .filter(F.col("y") * F.col("margin") <= 0)
            .select("doc_id")
        )
        upd = (
            tf.join(mis, "doc_id", "leftsemi")
            .groupBy("b")
            .agg(F.sum(F.col("y") * F.col("c")).alias("du"))
            .collect()  # ≤ n_buckets rows — the bounded epoch sync
        )
        for r in upd:
            w[int(r["b"])] += int(r["du"])
        trajectory.append(list(w))
    cols = ", ".join(f"w{e + 1} long" for e in range(n_epochs))
    return spark.createDataFrame(
        [
            (b, *[trajectory[e][b] for e in range(n_epochs)])
            for b in range(n_buckets)
        ],
        f"b long, {cols}",
    )


def perceptron_margins(
    docs: DataFrame,
    weights: DataFrame,
    positive: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    hex_digits: int = 2,
    w_col: str = "w",
) -> DataFrame:
    """Score docs against a trained weight table: (doc_id, y, margin).
    The inference pass — one broadcast join + one per-doc sum, the
    serving shape of x47 with trained instead of fixed weights."""
    tf = _tf_with_labels(docs, positive, id_col, text_col, hex_digits)
    return (
        tf.join(F.broadcast(weights.select("b", F.col(w_col).alias("_w"))), "b")
        .groupBy("doc_id", "y")
        .agg(F.sum(F.col("c") * F.col("_w")).cast("long").alias("margin"))
    )
