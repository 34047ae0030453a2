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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .hadoopfs import fs_exists


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
            if batch_id > 0 and fs_exists(spark, prev_path)
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


def run_streaming_window_digests(
    spark: SparkSession,
    landing_dir: str,
    store_path: str,
    checkpoint_dir: str,
    context_len: int,
    text_col: str = "text",
) -> None:
    """Streaming form of the window-level dedup audit (x163): each
    micro-batch digests the context windows its tokens COMPLETE, with
    the cross-batch state being (global offset, the tail tokens of the
    last incomplete window) — a window that straddles a batch boundary
    is digested exactly once, by the batch that completes it, over the
    stitched token run.

    State contract: ``wstate/batch_id=N`` holds one row
    (next_off, tail tokens array, ≤ context_len-1 entries); the
    landing ``wdigests/batch_id=N`` holds (chunk, h) for every window
    whose LAST token arrived in batch N.  Both are pure functions of
    generation N-1 + batch N, so replay overwrites identically.  The
    final flush (the trailing partial window) is NOT digested — exactly
    like the batch form, whose last window is still a full window only
    when the corpus length divides evenly; the store therefore equals
    the batch digest table restricted to COMPLETE windows (pinned).

    Scale note: only the batch's own token stream shuffles (keyed on
    window id); the carried tail is < context_len tokens — constant
    state, the streaming-packer counter plus a bounded text remnant."""
    from pyspark.sql import functions as F

    def land(batch_df: DataFrame, batch_id: int) -> None:
        prev_state = f"{store_path}/wstate/batch_id={batch_id - 1}"
        if batch_id > 0 and fs_exists(spark, prev_state):
            srow = spark.read.parquet(prev_state).collect()[0]
            prev_off, tail = int(srow["next_off"]), list(srow["tail"])
        else:
            prev_off, tail = 0, []
        toks_arr = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
        tk = batch_df.select(
            "doc_id", F.posexplode(toks_arr).alias("p", "t")
        )
        # within-batch doc offsets (batch-local two-level prefix sum)
        from ..operators.sampling import concat_chunk_spans

        withn = batch_df.select(
            "doc_id", F.size(toks_arr).cast("long").alias("n_tok")
        )
        offs = concat_chunk_spans(withn, "doc_id", "n_tok", context_len).select(
            "doc_id", "start_off"
        )
        base = prev_off - len(tail)  # global offset where the tail run began
        g = tk.join(offs, "doc_id").select(
            (F.col("start_off") + F.col("p") + F.lit(prev_off)).alias("gp"),
            F.col("t"),
        )
        tail_rows = [(base + i, t) for i, t in enumerate(tail)]
        if tail_rows:
            g = spark.createDataFrame(tail_rows, "gp long, t string").unionByName(g)
        total = withn.agg(F.sum("n_tok").cast("long").alias("s")).collect()[0]["s"] or 0
        next_off = prev_off + int(total)
        n_complete = next_off // context_len  # windows fully fed so far
        win = g.withColumn(
            "chunk", (F.col("gp") / F.lit(context_len)).cast("long")
        ).filter(F.col("chunk") < n_complete)
        # only windows whose last token arrived THIS batch
        first_new = base // context_len
        out = (
            win.filter(F.col("chunk") >= first_new)
            .groupBy("chunk")
            .agg(
                F.md5(
                    F.concat_ws(
                        " ",
                        F.transform(
                            F.sort_array(F.collect_list(F.struct("gp", "t"))),
                            lambda s: s["t"],
                        ),
                    )
                ).alias("h")
            )
        )
        out.write.mode("overwrite").parquet(
            f"{store_path}/wdigests/batch_id={batch_id}"
        )
        new_tail_start = n_complete * context_len
        new_tail = [
            r["t"]
            for r in g.filter(F.col("gp") >= new_tail_start)
            .orderBy("gp")
            .collect()  # < context_len rows by construction
        ]
        spark.createDataFrame(
            [(next_off, new_tail)], "next_off long, tail array<string>"
        ).write.mode("overwrite").parquet(f"{store_path}/wstate/batch_id={batch_id}")

    (
        spark.readStream.schema(spark.read.parquet(landing_dir).schema)
        .parquet(landing_dir)
        .writeStream.foreachBatch(land)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def window_digests_from_store(spark: SparkSession, store_path: str) -> DataFrame:
    """All landed (chunk, h) window digests — equal to the batch
    x163 digest table over the union, restricted to complete windows
    (pinned by test)."""
    return spark.read.parquet(f"{store_path}/wdigests")
