"""Batch-perceptron trainer: convergence, trajectory semantics, and
the epoch-1 = class-difference identity."""

from __future__ import annotations

from pyspark.sql import functions as F

from trimet_bytes__data_engineering_project_spark.operators.classifier import (
    perceptron_margins,
    perceptron_train,
)


def _toy(spark):
    # linearly separable by construction: positive docs use one token
    # vocabulary, negative docs a disjoint one
    rows = [
        (1, "alpha alpha beta", "en"),
        (2, "beta alpha", "en"),
        (3, "gamma delta delta", "fr"),
        (4, "delta gamma gamma", "fr"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_epoch1_is_class_difference(spark):
    """w_0 = 0 makes every doc misclassified in epoch 1, so w1 must be
    exactly sum(y_d * tf(d, b)) — the Rocchio/centroid difference."""
    docs = _toy(spark)
    w = perceptron_train(docs, F.col("lang") == "en", n_epochs=1)
    got = {r.b: r.w1 for r in w.collect()}
    from trimet_bytes__data_engineering_project_spark.operators.textstats import (
        _bucketed_tokens,
    )

    tf = (
        _bucketed_tokens(docs.select("doc_id", "text"), ["doc_id"], "text", 2)
        .groupBy("doc_id", "b")
        .agg(F.count("*").alias("c"))
        .collect()
    )
    expect: dict[int, int] = {}
    for r in tf:
        y = 1 if r.doc_id in (1, 2) else -1
        expect[r.b] = expect.get(r.b, 0) + y * r.c
    assert {b: w_ for b, w_ in got.items() if w_ != 0} == expect


def test_converges_on_separable_data(spark):
    """On a separable toy set the class-difference vector already
    separates, so epochs 2-3 see no misclassified docs and the weights
    freeze; every margin ends strictly correct."""
    docs = _toy(spark)
    w = perceptron_train(docs, F.col("lang") == "en", n_epochs=3)
    rows = w.collect()
    assert all(r.w1 == r.w2 == r.w3 for r in rows)
    final = w.select("b", F.col("w3").alias("w"))
    margins = perceptron_margins(docs, final, F.col("lang") == "en").collect()
    assert len(margins) == 4
    assert all(r.y * r.margin > 0 for r in margins)


def test_update_actually_moves_weights(spark):
    """A doc set where epoch 1's centroid-difference misclassifies
    (shared vocabulary, unbalanced counts) must produce a second-epoch
    update — trajectory columns differ somewhere."""
    rows = [
        (1, "tok tok tok rare", "en"),
        (2, "tok", "fr"),
        (3, "tok tok", "fr"),
        (4, "tok tok tok", "fr"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    w = perceptron_train(docs, F.col("lang") == "en", n_epochs=3)
    assert any(r.w1 != r.w2 or r.w2 != r.w3 for r in w.collect())


def test_zero_token_docs_are_inert(spark):
    """Docs with no letter runs carry no features: they must not crash
    the trainer nor perturb any weight."""
    base = _toy(spark)
    noisy = base.unionByName(
        base.sparkSession.createDataFrame(
            [(9, "12345 !!!", "en")], "doc_id long, text string, lang string"
        )
    )
    wa = {(r.b, r.w3) for r in perceptron_train(base, F.col("lang") == "en").collect()}
    wb = {(r.b, r.w3) for r in perceptron_train(noisy, F.col("lang") == "en").collect()}
    assert wa == wb


def test_streaming_perceptron_continues_batch_training(spark, tmp_path):
    """Two landings processed as successive micro-batches equal the
    sequential batch twin: one epoch on A from zeros, then one epoch on
    B warm-started from A's weights.  Replay on the same checkpoint is
    a no-op; latest_weights serves the newest generation."""
    import glob
    import os
    import shutil

    from trimet_bytes__data_engineering_project_spark.streaming.classifier import (
        latest_weights,
        run_streaming_perceptron,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(40)
    a = docs.filter("doc_id % 2 = 0")
    b = docs.filter("doc_id % 2 = 1")

    landing = str(tmp_path / "landing")
    os.makedirs(landing)

    def land_file(df, name):
        t = str(tmp_path / f"w_{name}")
        df.coalesce(1).write.parquet(t)
        shutil.move(glob.glob(f"{t}/part-*.parquet")[0], f"{landing}/{name}.parquet")

    store = str(tmp_path / "store")
    ck = str(tmp_path / "ck")
    # sequential landings => two distinct micro-batches with a
    # deterministic order (the restart-continuation contract)
    land_file(a, "a")
    run_streaming_perceptron(spark, landing, store, ck)
    land_file(b, "b")
    run_streaming_perceptron(spark, landing, store, ck)

    wa = perceptron_train(a, F.col("lang") == "en", n_epochs=1)
    init = [0] * 256
    for r in wa.collect():
        init[int(r.b)] = int(r.w1)
    wb = perceptron_train(b, F.col("lang") == "en", n_epochs=1, init_weights=init)
    want = {int(r.b): int(r.w1) for r in wb.collect()}

    got = {int(r.b): int(r.w) for r in latest_weights(spark, store).collect()}
    assert got == want
    gens = sorted(os.listdir(f"{store}/weights"))
    assert len([g for g in gens if g.startswith("batch_id=")]) == 2
    # replay: no new generations, same weights
    run_streaming_perceptron(spark, landing, store, ck)
    assert {int(r.b): int(r.w) for r in latest_weights(spark, store).collect()} == want


def test_perceptron_warm_start_continues(spark):
    """n_epochs=2 from zeros == epoch 1 from zeros, then epoch 1
    warm-started from its weights (the continued-training identity the
    streaming landing relies on)."""
    docs = _toy(spark)
    two = {(r.b, r.w2) for r in perceptron_train(docs, F.col("lang") == "en", n_epochs=2).collect()}
    one = perceptron_train(docs, F.col("lang") == "en", n_epochs=1)
    init = [0] * 256
    for r in one.collect():
        init[int(r.b)] = int(r.w1)
    cont = {
        (r.b, r.w1)
        for r in perceptron_train(
            docs, F.col("lang") == "en", n_epochs=1, init_weights=init
        ).collect()
    }
    assert two == cont
