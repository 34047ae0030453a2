"""Streaming quality scoring: the Gopher gate + DSIR affinity over
micro-batch landings, against a FROZEN profile snapshot.

Both scorers are pure per-document functions — the Gopher flags are a
codegen projection and the DSIR affinity depends only on the persisted
256-row ratio snapshot (``textstats.importance_ratio_table``) — so the
streamed form is EXACT: scoring a document in batch 3 gives the same
row it would get in one batch pass over the union.  Each micro-batch
lands its scored rows under ``scored/batch_id=N`` (idempotent
overwrite per batch_id — the shared landing contract of
``streaming/index.py``), and serving reads the store, never the
corpus.

The profile is frozen by contract, exactly like the streaming IVF
serve's frozen coarse quantizer (``streaming/index.py``): refreshing
it is a BATCH maintenance job (``textstats.refresh_counts``'s
lifecycle argument) — re-scoring history under a moved profile is a
policy decision, not something a landing should do implicitly.

Scale shape per batch: one scan of the batch (the gate rides the
scan's project), one O(batch) token agg against the broadcast 256-row
profile, one partition write — nothing corpus-sized anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def run_streaming_quality(
    spark: SparkSession,
    landing_dir: str,
    store_path: str,
    checkpoint_dir: str,
    profile_path: str,
) -> None:
    """availableNow stream over a parquet document landing; each
    micro-batch lands (doc_id, the seven Gopher flags + passes,
    n_tokens, affinity_sum, avg_affinity) under ``scored/batch_id=N``.
    Letterless docs carry NULL affinity columns (nothing to score —
    the inner-join contract of the batch scorer, surfaced instead of
    dropped so the gate flags still land)."""
    from ..operators.textstats import gopher_quality_flags, hashed_importance_weights

    ratios = spark.read.parquet(profile_path)

    def land(batch_df: DataFrame, batch_id: int) -> None:
        flags = gopher_quality_flags(batch_df)
        aff = hashed_importance_weights(batch_df, ratios=ratios).drop("n_tokens")
        flags.join(aff, "doc_id", "left").write.mode("overwrite").parquet(
            f"{store_path}/scored/batch_id={batch_id}"
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


def scored_from_store(spark: SparkSession, store_path: str) -> DataFrame:
    """All scored generations — row-equal to one batch pass over the
    union of the landings (pinned by test; per-doc scorers + frozen
    profile = exact streaming)."""
    return spark.read.parquet(f"{store_path}/scored")


def run_streaming_pii_scrub(
    spark: SparkSession,
    landing_dir: str,
    store_path: str,
    checkpoint_dir: str,
) -> None:
    """Streaming PII scrub: each micro-batch lands the REDACTED text
    (``redact_pii`` cascade) plus the per-doc audit row
    (``pii_scan`` counts / redacted md5 / char delta) under
    ``scrubbed/batch_id=N`` — idempotent overwrite per batch_id, the
    shared landing contract.  Redaction is a pure per-document
    projection, so the streamed store is EXACT: row-for-row what one
    batch pass over the union would produce (pinned by test).  This is
    the hygiene pass positioned where it belongs at 100 TB — on the
    ingest stream, so raw PII never lands in the lake at all."""
    from ..operators.textstats import pii_scan, redact_pii
    from pyspark.sql import functions as F

    def land(batch_df: DataFrame, batch_id: int) -> None:
        audit = pii_scan(batch_df)
        out = batch_df.select(
            "doc_id", redact_pii(F.col("text")).alias("clean_text")
        ).join(audit, "doc_id")
        out.write.mode("overwrite").parquet(
            f"{store_path}/scrubbed/batch_id={batch_id}"
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


def scrubbed_from_store(spark: SparkSession, store_path: str) -> DataFrame:
    """The scrubbed corpus + audit — the only text downstream consumers
    ever see."""
    return spark.read.parquet(f"{store_path}/scrubbed")


def run_streaming_lang_router(
    spark: SparkSession,
    landing_dir: str,
    store_path: str,
    checkpoint_dir: str,
    ratios_path: str,
    masks_path: str,
) -> None:
    """Streaming language routing against the FROZEN x170 snapshot
    (``textstats.lang_ratio_profiles`` / ``lang_script_masks``): each
    micro-batch predicts every document's language (pivoted-profile
    scoring, script prefilter — one doc-keyed agg per batch, the x170
    plan) and lands (doc_id, claimed, pred, agree) under
    ``routed/batch_id=N``.  Downstream per-language consumers
    partition-read their slice; 'und' rows are the quarantine lane
    (no profile's script matched).  Pure per-document function of
    (batch, frozen snapshot) → streamed == one batch pass over the
    union (pinned by test); profile refresh is a batch maintenance
    job, exactly the frozen-quantizer contract of streaming/index.py.
    Token-less documents are absent from a batch's landing (nothing to
    score — the batch scorer's documented contract)."""
    from ..operators.textstats import lang_id_from_snapshot

    ratios = spark.read.parquet(ratios_path)
    masks = spark.read.parquet(masks_path)

    def land(batch_df: DataFrame, batch_id: int) -> None:
        # partitioned by predicted language so a per-language consumer
        # partition-prunes to its slice ('und' = the quarantine dir)
        lang_id_from_snapshot(batch_df, ratios, masks).write.mode(
            "overwrite"
        ).partitionBy("pred").parquet(f"{store_path}/routed/batch_id={batch_id}")

    (
        spark.readStream.schema(spark.read.parquet(landing_dir).schema)
        .parquet(landing_dir)
        .writeStream.foreachBatch(land)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def routed_from_store(spark: SparkSession, store_path: str) -> DataFrame:
    """All routed generations — row-equal to one batch
    ``lang_id_from_snapshot`` pass over the union (pinned)."""
    return spark.read.parquet(f"{store_path}/routed")
