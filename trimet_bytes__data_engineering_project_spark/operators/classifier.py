"""Distributed linear-classifier TRAINING over hashed token features —
the missing half of the quality-classifier story (inference has been
x47's ``hashed_linear_score`` since round 2): a fasttext-shaped model
(bag of hashed unigrams → linear score) trained by the batch
perceptron, entirely as DataFrame ops.

Why the batch perceptron and not SGD: the sequential perceptron visits
samples one at a time (inherently serial — wrong for a cluster), while
the batch variant scores EVERY doc against the frozen epoch weights and
applies the summed update of all misclassified docs at once.  Each
epoch is two corpus-shaped passes; the weight vector itself is
bounded (16^hex_digits buckets — DSIR's hashed-feature trick, x143)
and rides the epoch chain as a 1-row array DataFrame — the
power-iteration iterate pattern (``spectral.py``), no driver sync in
the loop.

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

    Scale shape (r15, fully declarative — no driver collect in the
    loop): the per-doc sparse feature arrays (≤ 16^hex_digits entries,
    a few KB/doc) are built ONCE — one shuffle — and checkpointed; each
    epoch then (a) broadcasts the 1-row weight ARRAY into the scan and
    computes every margin with an array-local integer fold (zero
    shuffles), and (b) pays exactly ONE exchange: the per-bucket update
    sum over misclassified docs, folded back into the iterate
    array-locally.  The weights cross the cluster as one bounded row
    per epoch — the power-iteration iterate contract — and nothing
    corpus-sized is ever collected.  Int64 ceiling: |w(b)| ≤ epochs ·
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
    if init_weights is not None and len(init_weights) != n_buckets:
        raise ValueError(f"init_weights must have {n_buckets} entries")
    # r15: the per-epoch driver collect + createDataFrame round trip is
    # gone — the weight vector lives as a 1-row ARRAY DataFrame chained
    # through the epochs (the power-iteration pattern, spectral.py), and
    # the per-doc features are pre-grouped ONCE into a sparse array so
    # an epoch's margin pass is a broadcast of the 1-row iterate plus an
    # ARRAY-LOCAL integer fold — no join, no shuffle; the only exchange
    # per epoch is the misclassified-docs update aggregation.  Measured
    # (sf0.1, same-epoch A/B): 2.32 s -> 1.20 s, REST jobs 21 -> 15.
    #
    # Bit-equality vs the collect loop, step by step:
    #   margin_d = Σ_b c·w(b) — the fold over the collect_list order is
    #     an int64 sum, associative and commutative, so any order gives
    #     the join-form SUM exactly;
    #   mis — identical predicate on identical margins;
    #   du(b) = Σ_{d∈mis} y·c — the exploded features of the mis docs
    #     ARE the leftsemi-joined tf rows, same map-side-combinable sum;
    #   w'(b) = w(b) + du(b) (absent bucket -> +0, the coalesce) — the
    #     Python dict add, now in int64 (the module ceiling argument
    #     bounds |w| and margins far inside int64 either way).
    tf = _tf_with_labels(docs, positive, id_col, text_col, hex_digits)
    feats = (
        tf.groupBy("doc_id", "y")
        .agg(F.collect_list(F.struct("b", "c")).alias("feats"))
        .localCheckpoint(eager=False)
    )
    w0 = [int(x) for x in init_weights] if init_weights is not None else [0] * n_buckets
    w = spark.range(1).select(
        F.expr("array(" + ",".join(f"{v}L" for v in w0) + ")").alias("warr")
    )
    epochs: list[DataFrame] = []
    for _ in range(n_epochs):
        scored = feats.crossJoin(F.broadcast(w)).withColumn(
            "margin",
            F.aggregate(
                F.col("feats"),
                F.lit(0).cast("long"),
                lambda acc, f: acc
                + f["c"] * F.element_at(F.col("warr"), f["b"].cast("int") + 1),
            ),
        )
        updmap = (
            scored.filter(F.col("y") * F.col("margin") <= 0)
            .select(F.col("y"), F.explode("feats").alias("f"))
            .groupBy(F.col("f.b").alias("b"))
            .agg(F.sum(F.col("y") * F.col("f.c")).alias("du"))
            .agg(F.map_from_entries(F.collect_list(F.struct("b", "du"))).alias("m"))
        )
        # the 1-row iterate is consumed three times (next epoch's
        # broadcast, next epoch's add, trajectory assembly) — the lazy
        # localCheckpoint keeps the epoch chain LINEAR instead of
        # duplicating each epoch subtree into the next (2^epochs growth)
        w = (
            w.crossJoin(updmap)
            .select(
                F.transform(
                    F.sequence(F.lit(0), F.lit(n_buckets - 1)),
                    # try_element_at: NULL (not a raise) on a bucket with
                    # no update, under ANSI and non-ANSI sessions alike
                    lambda i: F.element_at(F.col("warr"), i + 1)
                    + F.coalesce(
                        F.try_element_at(F.col("m"), i.cast("long")),
                        F.lit(0).cast("long"),
                    ),
                ).alias("warr")
            )
            .localCheckpoint(eager=False)
        )
        epochs.append(w)
    # trajectory: crossJoin the 1-row epoch iterates and explode b-wise —
    # rows come out b ascending 0..n_buckets-1, the createDataFrame order
    joined = epochs[0].select(F.col("warr").alias("w1arr"))
    for e, frame in enumerate(epochs[1:], start=2):
        joined = joined.crossJoin(frame.select(F.col("warr").alias(f"w{e}arr")))
    return joined.select(
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_buckets - 1)),
                lambda i: F.struct(
                    *[
                        F.element_at(F.col(f"w{e + 1}arr"), i + 1).alias(f"w{e + 1}")
                        for e in range(n_epochs)
                    ]
                ),
            )
        ).alias("b", "s")
    ).select(
        F.col("b").cast("long"),
        *[F.col(f"s.w{e + 1}").alias(f"w{e + 1}") for e in range(n_epochs)],
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
