"""Scale-step benchmark for the heavy extension queries.

At sf0.1 every corpus query is dominated by Spark's fixed per-job
latency (~0.5-1.3 s of plan build + scheduling), so plan COSTS are
invisible — a quadratic join and a pruned scan both read as "about a
second".  This tool replicates the sf0.1 heavy tables 10x and 100x into
``.scratch/scale/x{N}`` (re-keyed ids; replicated text/vectors are
re-derived from md5 / deterministic sign flips so copies are mutually
DISSIMILAR — a corpus of N near-identical copies of each document would
measure the skew caps, not the scaling) and times the registered HEAVY
pipelines at every scale with bench.py's min-of-2 protocol.

Interpretation: a query whose plan does real pruning/blocking should
scale AT MOST linearly in input rows (the work is the hashing/scan
itself) and far below the quadratic envelope of its join shape; the
persisted-index probe (x21) should scale SUB-linearly (the probe reads
1/16 of the corpus, partition-pruned).  Results are recorded in
BENCH_NOTES.md.

Usage: python scale_bench.py [--rebuild]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from functools import reduce

from pyspark.sql import functions as F

from trimet_bytes__data_engineering_project_spark.plans import QUERIES, load_table
from trimet_bytes__data_engineering_project_spark.session import get_session

SF01 = "/root/testdata/sf0.1"
_SCALE_ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".scratch", "scale")
# replica factors: 10x stays latency-dominated (proves no plan blow-up);
# 100x makes the hash/scan/join work visible (proves the scaling curve)
STEPS = (10, 100)
_ID_STRIDE = 10_000_000


# The registered x07/x08/x28 queries cap their fixture at doc_id/vec_id
# < 1000 (oracle-size control), which would exclude every replica row —
# so the dedup/similarity entries here drive the UNDERLYING OPERATORS
# over the full scaled tables; q27/x21 run their registered queries.
def _q27(spark, d):
    return QUERIES["q27_pricing_summary"](spark, d)


def _x21(spark, d):
    return QUERIES["x21_ann_ivf_index_probe"](spark, d)


def _minhash_pairs(spark, d):
    from trimet_bytes__data_engineering_project_spark.operators.dedup import (
        minhash_candidates,
        minhash_estimate,
    )

    docs = spark.read.parquet(f"{d}/documents.parquet")
    return (
        minhash_candidates(docs)
        .withColumn("est_sim", minhash_estimate(F.col("a_sig"), F.col("b_sig")))
        .filter(F.col("est_sim") >= 0.25)
        .select("a_id", "b_id", "est_sim")
    )


def _jaccard_pairs(spark, d):
    from trimet_bytes__data_engineering_project_spark.operators.dedup import (
        exact_jaccard,
        minhash_candidates,
        shingles,
    )

    docs = spark.read.parquet(f"{d}/documents.parquet")
    sh = docs.select("doc_id", shingles(F.col("text")).alias("s"))
    cands = minhash_candidates(docs).select("a_id", "b_id")
    a = sh.select(F.col("doc_id").alias("a_id"), F.col("s").alias("sa"))
    b = sh.select(F.col("doc_id").alias("b_id"), F.col("s").alias("sb"))
    return (
        cands.join(a, "a_id")
        .join(b, "b_id")
        .withColumn("jaccard", exact_jaccard(F.col("sa"), F.col("sb")))
        .filter(F.col("jaccard") >= 0.2)
        .select("a_id", "b_id", "jaccard")
    )


def _embedding_near_dup(spark, d):
    """n_planes grows with the corpus: sign-bucket blocking is quadratic
    WITHIN a bucket, so bucket count (2^planes) must track corpus size
    to hold per-bucket membership roughly constant.  4 planes at 2k
    vectors ≈ 125/bucket; the same 4 planes at 200k vectors would be
    12.5k/bucket ≈ 1.2B within-bucket pairs — measured unfinishable on
    local[32].  10 planes at 200k restores ~200/bucket.  This is the
    LSH analogue of sizing shuffle partitions to data volume."""
    from trimet_bytes__data_engineering_project_spark.operators.similarity import (
        embedding_near_dup_lsh,
    )

    emb = spark.read.parquet(f"{d}/embeddings.parquet")
    n = emb.count()
    n_planes = max(4, (max(1, n // 125) - 1).bit_length())  # ~125 vectors/bucket
    return embedding_near_dup_lsh(emb, threshold=0.35, dim=64, n_planes=n_planes)


def _x39(spark, d):
    # full-corpus (no id cap): replica text is unique md5 words, so the
    # duplicate fraction falls with scale — what's measured is the
    # count-agg + anti-join + reassembly machinery over N× lines
    return QUERIES["x39_line_dedup"](spark, d)


def _x40(spark, d):
    return QUERIES["x40_tfidf_top_terms"](spark, d)


def _x47_scorer(spark, d):
    # full-corpus classifier inference (no id cap); reduced to one agg
    # row so what's timed is the scoring pass, not a 500k-row collect
    from trimet_bytes__data_engineering_project_spark.operators.textstats import (
        hashed_linear_score,
    )

    docs = spark.read.parquet(f"{d}/documents.parquet")
    return docs.select(hashed_linear_score(F.col("text")).alias("s")).agg(
        F.count("*").alias("n"), F.sum("s").alias("sum_s")
    )


def _x49_probe(spark, d):
    """Incremental probe with a PREBUILT store (90% of the corpus;
    built once per scale dir on the warm-up run via the _SUCCESS
    marker): the timed work is signaturing the 10% batch + the
    bucket join against the store scan.  Compare against
    minhash_near_dup_pairs_full at the same scale — the full rerun
    this probe replaces."""
    from trimet_bytes__data_engineering_project_spark.operators.ann_index import (
        ensure_index,
    )
    from trimet_bytes__data_engineering_project_spark.operators.dedup import (
        incremental_dedup_probe,
        write_signature_store,
    )

    docs = spark.read.parquet(f"{d}/documents.parquet")
    old = docs.filter(F.pmod(F.col("doc_id"), F.lit(10)) != 0)
    new = docs.filter(F.pmod(F.col("doc_id"), F.lit(10)) == 0)
    # store lives under .scratch (testdata dirs are read-only), keyed
    # by the scale dir's basename so each scale gets its own store
    path = os.path.join(_SCALE_ROOT, "sig_store", os.path.basename(d.rstrip("/")))
    ensure_index(lambda: write_signature_store(old, path), path)
    store = spark.read.parquet(path)
    return incremental_dedup_probe(store, new)



def _x50_chunks(spark, d):
    # chunk the full corpus; reduced to one agg row so what's timed is
    # the sequence+posexplode pass, not a chunk-row collect
    from trimet_bytes__data_engineering_project_spark.operators.textstats import (
        chunk_documents,
    )

    docs = spark.read.parquet(f"{d}/documents.parquet")
    return chunk_documents(docs, size=200, stride=150).agg(
        F.count("*").alias("n_chunks"), F.sum("chunk_len").alias("total_len")
    )


def _x51(spark, d):
    # full-corpus surprisal: the term-keyed join's BOTH sides grow with
    # the corpus (vocabulary of md5 words ~ rows), the worst case for
    # this op — reduced to one agg row
    from trimet_bytes__data_engineering_project_spark.operators.textstats import (
        unigram_surprisal,
    )

    docs = spark.read.parquet(f"{d}/documents.parquet")
    return unigram_surprisal(docs).agg(
        F.count("*").alias("n_docs"), F.sum("surprisal_sum").alias("total")
    )


def _x52_bloom(spark, d):
    # benchmark side stays the base copy's 20 docs (eval suites don't
    # grow with the corpus); the corpus-side bitmap probe is the scaled
    # pass being measured
    from trimet_bytes__data_engineering_project_spark.operators.dedup import (
        bloom_decontaminate,
    )

    docs = spark.read.parquet(f"{d}/documents.parquet")
    return bloom_decontaminate(
        docs.filter(F.col("doc_id") >= 20), docs.filter(F.col("doc_id") < 20), n=5
    ).agg(F.count("*").alias("n_flagged"))


def _x53_rp(spark, d):
    from trimet_bytes__data_engineering_project_spark.operators.similarity import (
        random_projection,
    )

    emb = spark.read.parquet(f"{d}/embeddings.parquet")
    return random_projection(emb, dim=64, out_dim=8).agg(
        F.count("*").alias("n"), F.sum("value").alias("s")
    )



def _x58_knn(spark, d):
    # every 10th vector queries the rest; n_planes scales with the
    # corpus (same lg(n/target) rule as the near-dup blocking) so
    # within-bucket |Q_b|*|C_b| stays bounded; reduced to one agg row
    from trimet_bytes__data_engineering_project_spark.operators.similarity import (
        knn_join,
    )

    emb = spark.read.parquet(f"{d}/embeddings.parquet")
    n = emb.count()
    n_planes = max(4, (max(1, n // 125) - 1).bit_length())
    q = emb.filter(F.col("vec_id") % 10 == 0)
    c = emb.filter(F.col("vec_id") % 10 != 0)
    return knn_join(q, c, dim=64, k=3, n_planes=n_planes).agg(
        F.count("*").alias("n_pairs"), F.sum("cos_sim").alias("s")
    )



def _x89_knn_index_serve(spark, d, batch_queries=128):
    # x58's index-backed twin in the SERVING regime: the 90% corpus is
    # indexed ONCE per scale dir (ensure_index marker, bucket-aligned
    # one-file-per-bucket layout, norms stored at build) and a
    # fixed-size query batch probes it — a serving batch does not grow
    # with the corpus, so its <=128 distinct buckets prune to an
    # ever-smaller fraction of the 2^p partitions as n_planes scales
    # (the x21 sub-linear argument, batched).  The corpus-growing-batch
    # variant (10% of vectors = a reprocessing job, all buckets probed)
    # was also measured and recorded in BENCH_NOTES: there the index
    # only pays off once signatures cost more than the scan.
    from trimet_bytes__data_engineering_project_spark.operators.ann_index import (
        ensure_index,
        knn_join_index,
        write_lsh_index,
    )

    emb = spark.read.parquet(f"{d}/embeddings.parquet")
    n = emb.count()
    n_planes = max(4, (max(1, n // 125) - 1).bit_length())
    modulus = max(10, n // batch_queries)
    q = emb.filter(F.pmod(F.col("vec_id"), F.lit(modulus)) == 0)
    c = emb.filter(F.pmod(F.col("vec_id"), F.lit(10)) != 0)
    path = os.path.join(_SCALE_ROOT, "knn_lsh_index", os.path.basename(d.rstrip("/")))
    ensure_index(lambda: write_lsh_index(c, path, dim=64, n_planes=n_planes), path)
    return knn_join_index(spark, q, path, dim=64, k=3, n_planes=n_planes).agg(
        F.count("*").alias("n_pairs"), F.sum("cos_sim").alias("s")
    )


def _x90_ivf_knn_serve(spark, d, batch_queries=128):
    # the IVF sibling of the x89 serving row: fixed 128-query batch
    # against the 90% corpus's persisted inverted lists (16 centroids,
    # norms stored at build) — nprobe=1 reads only the batch's probed
    # lists, so the scan tracks (probed lists)/16 of the corpus
    from trimet_bytes__data_engineering_project_spark.operators.ann_index import (
        ensure_index,
        ivf_knn_join,
        write_ivf_index,
    )

    emb = spark.read.parquet(f"{d}/embeddings.parquet")
    n = emb.count()
    modulus = max(10, n // batch_queries)
    q = emb.filter(F.pmod(F.col("vec_id"), F.lit(modulus)) == 0)
    c = emb.filter(F.pmod(F.col("vec_id"), F.lit(10)) != 0)
    path = os.path.join(_SCALE_ROOT, "knn_ivf_index", os.path.basename(d.rstrip("/")))
    ensure_index(lambda: write_ivf_index(c, path), path)
    return ivf_knn_join(spark, q, path, k=3).agg(
        F.count("*").alias("n_pairs"), F.sum("cos_sim").alias("s")
    )


def _x91_quantized_knn_serve(spark, d, batch_queries=128):
    # the compressed serving row: same fixed-batch regime as x89 but the
    # index stores int8 vectors + integer-sum norms — the scan pays ~4x
    # fewer bytes and the per-pair work is an integer dot
    from trimet_bytes__data_engineering_project_spark.operators.ann_index import (
        ensure_index,
        quantized_knn_join_index,
        write_quantized_lsh_index,
    )

    emb = spark.read.parquet(f"{d}/embeddings.parquet")
    n = emb.count()
    n_planes = max(4, (max(1, n // 125) - 1).bit_length())
    modulus = max(10, n // batch_queries)
    q = emb.filter(F.pmod(F.col("vec_id"), F.lit(modulus)) == 0)
    c = emb.filter(F.pmod(F.col("vec_id"), F.lit(10)) != 0)
    path = os.path.join(_SCALE_ROOT, "knn_qlsh_index", os.path.basename(d.rstrip("/")))
    ensure_index(
        lambda: write_quantized_lsh_index(c, path, dim=64, n_planes=n_planes), path
    )
    return quantized_knn_join_index(
        spark, q, path, dim=64, k=3, n_planes=n_planes
    ).agg(F.count("*").alias("n_pairs"), F.sum("q_cos").alias("s"))


def _x96_quantized_ivf_serve(spark, d, batch_queries=128):
    # the compressed INVERTED-LIST serving row — x90's regime (the best
    # serving ratio of round 5) over int8 lists + integer-sum norms:
    # nprobe=1 reads only the batch's probed lists AND each list is ~4x
    # fewer scan bytes; assignment stays float against the persisted
    # full-precision quantizer
    from trimet_bytes__data_engineering_project_spark.operators.ann_index import (
        ensure_index,
        quantized_ivf_knn_join,
        write_quantized_ivf_index,
    )

    emb = spark.read.parquet(f"{d}/embeddings.parquet")
    n = emb.count()
    modulus = max(10, n // batch_queries)
    q = emb.filter(F.pmod(F.col("vec_id"), F.lit(modulus)) == 0)
    c = emb.filter(F.pmod(F.col("vec_id"), F.lit(10)) != 0)
    path = os.path.join(_SCALE_ROOT, "knn_qivf_index", os.path.basename(d.rstrip("/")))
    ensure_index(lambda: write_quantized_ivf_index(c, path), path)
    return quantized_ivf_knn_join(spark, q, path, k=3).agg(
        F.count("*").alias("n_pairs"), F.sum("q_cos").alias("s")
    )


def _x97_snapshot_refresh(spark, d):
    # the nightly-snapshot maintenance row: a persisted base (term, c)
    # table (all docs except the ~500-doc daily batch, i.e. 1 - 1/modulus
    # of docs — 90% only at the min-clamped modulus of 10; ~99.8% at
    # scale), built once per scale dir, refreshed with the batch's deltas — the snapshot streams through one
    # broadcast LEFT join and is never shuffled, so the refresh should
    # track batch vocabulary plus a linear snapshot scan, not corpus
    # re-aggregation (compare the x86 self-scored 8.55x history)
    from trimet_bytes__data_engineering_project_spark.operators.ann_index import (
        ensure_index,
    )
    from trimet_bytes__data_engineering_project_spark.operators.textstats import (
        refresh_counts,
        unigram_counts,
    )

    docs = spark.read.parquet(f"{d}/documents.parquet")
    n = docs.count()
    modulus = max(10, n // 500)  # fixed ~500-doc daily batch
    base = docs.filter(F.pmod(F.col("doc_id"), F.lit(modulus)) != 0)
    batch = docs.filter(F.pmod(F.col("doc_id"), F.lit(modulus)) == 0)
    path = os.path.join(
        _SCALE_ROOT, "refresh_snapshot", os.path.basename(d.rstrip("/"))
    )
    ensure_index(
        lambda: unigram_counts(base).write.mode("overwrite").parquet(path), path
    )
    merged = refresh_counts(spark.read.parquet(path), unigram_counts(batch))
    return merged.agg(F.count("*").alias("n_terms"), F.sum("c").alias("total"))


def _x59_knn_multiprobe(spark, d):
    # x58 with the Hamming-radius-1 recall dial: the probe-set explode
    # multiplies the join's LEFT side by (1 + n_planes) — with n_planes
    # growing by the lg(n/125) rule the multiplier itself grows
    # logarithmically with the corpus, so the expected envelope is
    # slightly super-linear in rows and this row makes that measured
    # rather than assumed (round-3 verdict item 6)
    from trimet_bytes__data_engineering_project_spark.operators.similarity import (
        knn_join,
    )

    emb = spark.read.parquet(f"{d}/embeddings.parquet")
    n = emb.count()
    n_planes = max(4, (max(1, n // 125) - 1).bit_length())
    q = emb.filter(F.col("vec_id") % 10 == 0)
    c = emb.filter(F.col("vec_id") % 10 != 0)
    return knn_join(q, c, dim=64, k=3, n_planes=n_planes, hamming_radius=1).agg(
        F.count("*").alias("n_pairs"), F.sum("cos_sim").alias("s")
    )


def _x60_recall_audit(spark, d):
    # recall audit at scale: the exact side is a broadcast cross join
    # sample x corpus, so a FIXED-RATE sample (x60's % 50 at sf0.1)
    # would grow the audit quadratically with the corpus.  Production
    # contract: the audit budget is a fixed QUERY COUNT — the sampling
    # modulus scales with n to hold ~128 audited queries at any corpus
    # size, leaving the cross join linear in corpus rows (same
    # budget-not-rate shape as x60's docstring states)
    from trimet_bytes__data_engineering_project_spark.operators.similarity import (
        ann_recall_audit,
    )

    emb = spark.read.parquet(f"{d}/embeddings.parquet")
    n = emb.count()
    n_planes = max(4, (max(1, n // 125) - 1).bit_length())
    modulus = max(50, n // 128)
    sample = emb.filter(F.col("vec_id") % modulus == 0)
    corpus = emb.filter(F.col("vec_id") % 10 != 0)
    return ann_recall_audit(sample, corpus, dim=64, k=3, n_planes=n_planes).agg(
        F.count("*").alias("n_queries"), F.avg("recall").alias("mean_recall")
    )


def _x80_bigram_surprisal(spark, d):
    # both the bigram table and its prefix-count side grow with the
    # corpus (vocabulary-squared pressure) — the honest successor to
    # x51's "BOTH sides grow" row; array-side bigram build keeps the
    # pre-agg stage shuffle-free
    from trimet_bytes__data_engineering_project_spark.operators.textstats import (
        bigram_surprisal,
    )

    docs = spark.read.parquet(f"{d}/documents.parquet")
    return bigram_surprisal(docs).agg(
        F.count("*").alias("n_docs"), F.sum("surprisal_sum").alias("s")
    )


def _x81_pps_sample(spark, d):
    # the two-level prefix must hold its shape as rows grow: chunk
    # count rises linearly but the only global-order window runs over
    # CHUNKS (rows/1024), never rows
    from trimet_bytes__data_engineering_project_spark.operators.sampling import (
        systematic_pps_sample,
    )
    from trimet_bytes__data_engineering_project_spark.operators.textstats import (
        token_count_col,
    )

    docs = spark.read.parquet(f"{d}/documents.parquet")
    d2 = docs.select("doc_id", token_count_col(F.col("text")).cast("long").alias("w"))
    return systematic_pps_sample(d2, "w", "doc_id", 1000).agg(
        F.count("*").alias("n"), F.sum("w").alias("w_sum")
    )


def _x72_exact_top_terms(spark, d):
    # comparator row for the sketch: the exact path's shuffle is the
    # distinct-term table, and replica text is md5-re-derived so the
    # vocabulary GROWS with the corpus (the same growth that makes
    # tf-idf the table's worst ratio)
    from trimet_bytes__data_engineering_project_spark.operators.textstats import (
        top_terms,
    )

    docs = spark.read.parquet(f"{d}/documents.parquet")
    return top_terms(docs, k=20, approx=False)


def _x79_sketch_top_terms(spark, d):
    # count-min path: the (row, bucket) agg is bounded at depth*4096
    # rows whatever the vocabulary — only the scan and the candidate
    # sample grow with the corpus
    from trimet_bytes__data_engineering_project_spark.operators.textstats import (
        top_terms,
    )

    docs = spark.read.parquet(f"{d}/documents.parquet")
    return top_terms(docs, k=20, approx=True, candidate_hex_lt=1)


def ensure_scale_events(spark, scale_dir: str, copies: int) -> None:
    """Replicate events into an existing scale dir (added after the
    first build — marker-guarded separately so earlier dirs upgrade in
    place).  user_id offsets per copy keep per-user event counts
    realistic instead of creating 100x mega-users."""
    marker = os.path.join(scale_dir, "_EVENTS_BUILT")
    if os.path.exists(marker):
        return
    # load_table, not a raw read: it branches on the scanned ts dtype so
    # both testdata generations (TIMESTAMP(NANOS) needing nanosAsLong vs
    # native MICROS) normalize to the same µs TIMESTAMP_NTZ before the
    # copies are written
    ev = load_table(spark, SF01, "events")
    n_out = 32 if copies <= 10 else 128
    ev_copies = [ev] + [
        ev.select(
            (F.col("event_id") + c * _ID_STRIDE).alias("event_id"),
            "ts",
            (F.col("user_id") + c * _ID_STRIDE).alias("user_id"),
            "event_type",
            "value",
            "props",
        )
        for c in range(1, copies)
    ]
    _union_all(ev_copies).repartition(n_out).write.mode("overwrite").parquet(
        f"{scale_dir}/events.parquet"
    )
    with open(marker, "w"):
        pass


def _x54_pipeline(spark, d):
    # the end-to-end selection composite over the full scaled corpus;
    # benchmark side stays the base copy's 20 docs
    from trimet_bytes__data_engineering_project_spark.operators.dedup import decontaminate
    from trimet_bytes__data_engineering_project_spark.operators.sampling import (
        select_token_budget,
    )
    from trimet_bytes__data_engineering_project_spark.operators.textstats import (
        hashed_linear_score,
        token_count_col,
    )

    docs = spark.read.parquet(f"{d}/documents.parquet")
    scored = docs.select(
        "doc_id",
        "text",
        token_count_col(F.col("text")).alias("n_tokens"),
        hashed_linear_score(F.col("text")).alias("score"),
    )
    corpus = scored.filter((F.col("doc_id") >= 20) & (F.col("score") > 0.0))
    bench = docs.filter(F.col("doc_id") < 20)
    flagged = decontaminate(corpus, bench, n=5)
    clean = corpus.join(F.broadcast(flagged), "doc_id", "left_anti").select(
        "doc_id", "n_tokens", "score"
    )
    sel = select_token_budget(clean, "score", "doc_id", "n_tokens", 2_000_000)
    return sel.agg(F.count("*").alias("n_docs"), F.sum("n_tokens").alias("toks"))


def _x63_sessions(spark, d):
    from trimet_bytes__data_engineering_project_spark.functions.windows import sessionize

    # scaled events were written by ensure_scale_events from load_table
    # output (µs TIMESTAMP_NTZ), but dirs built before that fix may hold
    # the raw old-generation layout — load_table normalizes either
    ev = load_table(spark, d, "events")
    s = sessionize(ev, "user_id", "ts", 1800, "event_id")
    return s.groupBy("user_id", "session_id").agg(F.count("*").alias("n")).agg(
        F.count("*").alias("n_sessions"), F.sum("n").alias("n_events")
    )



def _x82_trigram_backoff_10pct(spark, d):
    # the n-gram ladder's honest worst case one level up from x51/x80:
    # the batch side stays 10% but the BASE trigram/bigram/unigram
    # count tables grow with the corpus (replica text re-derivation
    # grows the n-gram vocabulary superlinearly) — measures the
    # nightly-snapshot contract under vocabulary growth
    from trimet_bytes__data_engineering_project_spark.operators.textstats import (
        trigram_backoff_surprisal,
    )

    docs = spark.read.parquet(f"{d}/documents.parquet")
    out = trigram_backoff_surprisal(
        docs.filter(F.col("doc_id") % 10 == 0), docs.filter(F.col("doc_id") % 10 != 0)
    )
    return out.agg(F.count("*").alias("n_docs"), F.sum("surprisal_sum").alias("s"))


def _x95_kneser_ney_10pct(spark, d):
    # the KN rung under the same regime as x82: 10% batch against
    # base-corpus-grown bigram + continuation tables — adds the two
    # continuation aggregates (fan-out per w1, distinct-left-context
    # per w2) on top of x80's vocabulary-squared pressure, still with
    # the batch side of every shuffle O(batch)
    from trimet_bytes__data_engineering_project_spark.operators.textstats import (
        kneser_ney_surprisal,
    )

    docs = spark.read.parquet(f"{d}/documents.parquet")
    out = kneser_ney_surprisal(
        docs.filter(F.col("doc_id") % 10 == 0), docs.filter(F.col("doc_id") % 10 != 0)
    )
    return out.agg(F.count("*").alias("n_docs"), F.sum("surprisal_sum").alias("s"))


def _x98_modified_kn_10pct(spark, d):
    # x95's regime plus the count-of-count discount derivation: the
    # extra per-prefix class fan-outs ride the SAME groupBy as c1p and
    # the discounts are one more 1-row broadcast — the scaling shape
    # must stay x95's (both-sides-grow, batch side of shuffles O(batch))
    from trimet_bytes__data_engineering_project_spark.operators.textstats import (
        modified_kneser_ney_surprisal,
    )

    docs = spark.read.parquet(f"{d}/documents.parquet")
    out = modified_kneser_ney_surprisal(
        docs.filter(F.col("doc_id") % 10 == 0), docs.filter(F.col("doc_id") % 10 != 0)
    )
    return out.agg(F.count("*").alias("n_docs"), F.sum("surprisal_sum").alias("s"))


def _x99_trigram_kn_10pct(spark, d):
    # recursive trigram KN under x82's regime: trigram-type tables and
    # their three derived rollups on the base side (vocabulary-cubed
    # pressure class, like the JM trigram rungs) — expect the ~x82/x84
    # shape, NOT x95's bigram shape
    from trimet_bytes__data_engineering_project_spark.operators.textstats import (
        trigram_kneser_ney_surprisal,
    )

    docs = spark.read.parquet(f"{d}/documents.parquet")
    out = trigram_kneser_ney_surprisal(
        docs.filter(F.col("doc_id") % 10 == 0), docs.filter(F.col("doc_id") % 10 != 0)
    )
    return out.agg(F.count("*").alias("n_docs"), F.sum("surprisal_sum").alias("s"))


def _x82_trigram_backoff_snapshot(spark, d):
    # the chassis twin of the x99 snapshot row: x82's in-flight 6.03x
    # carries the same per-consumer re-derivation (three explodes, one
    # per order, each with two consumers) — with the persisted
    # ngram_counts tables the base side is four vocabulary-sized scans
    from trimet_bytes__data_engineering_project_spark.operators.ann_index import (
        ensure_index,
    )
    from trimet_bytes__data_engineering_project_spark.operators.textstats import (
        ngram_counts,
        trigram_backoff_surprisal,
    )

    docs = spark.read.parquet(f"{d}/documents.parquet")
    base = docs.filter(F.col("doc_id") % 10 != 0)
    root = os.path.join(_SCALE_ROOT, "ngram_snapshot", os.path.basename(d.rstrip("/")))
    ps = {n: os.path.join(root, f"t{n}") for n in (1, 2, 3)}
    for n, p in ps.items():
        ensure_index(
            lambda n=n, p=p: ngram_counts(base, n).write.mode("overwrite").parquet(p), p
        )
    out = trigram_backoff_surprisal(
        docs.filter(F.col("doc_id") % 10 == 0),
        t3_counts=spark.read.parquet(ps[3]),
        t2_counts=spark.read.parquet(ps[2]),
        t1_counts=spark.read.parquet(ps[1]),
    )
    return out.agg(F.count("*").alias("n_docs"), F.sum("surprisal_sum").alias("s"))


def _x99_trigram_kn_snapshot(spark, d):
    # the job-audit answer for _x99's in-flight ratio: the trigram/
    # bigram TYPE tables are persisted once per corpus refresh
    # (ensure_index marker) and each run derives the five KN rollups
    # from vocabulary-sized snapshot scans instead of re-running the
    # corpus explode once per derived-table consumer — expect the
    # snapshot-probe band (x85/x86/x97), not the both-sides-grow band
    from trimet_bytes__data_engineering_project_spark.operators.ann_index import (
        ensure_index,
    )
    from trimet_bytes__data_engineering_project_spark.operators.textstats import (
        ngram_counts,
        trigram_kneser_ney_surprisal,
    )

    docs = spark.read.parquet(f"{d}/documents.parquet")
    base = docs.filter(F.col("doc_id") % 10 != 0)
    root = os.path.join(_SCALE_ROOT, "ngram_snapshot", os.path.basename(d.rstrip("/")))
    p2, p3 = os.path.join(root, "t2"), os.path.join(root, "t3")
    ensure_index(lambda: ngram_counts(base, 2).write.mode("overwrite").parquet(p2), p2)
    ensure_index(lambda: ngram_counts(base, 3).write.mode("overwrite").parquet(p3), p3)
    out = trigram_kneser_ney_surprisal(
        docs.filter(F.col("doc_id") % 10 == 0),
        t3_counts=spark.read.parquet(p3),
        t2_counts=spark.read.parquet(p2),
    )
    return out.agg(F.count("*").alias("n_docs"), F.sum("surprisal_sum").alias("s"))


def _x62_merge_upsert(spark, d):
    # warehouse MERGE at scale: a daily-batch-sized update (1% of keys,
    # half updates / half inserts) against the full scaled events table
    # — the anti join must track BASE scan cost (rows stream through
    # against a broadcast key set), never re-shuffle the base
    ev = load_table(spark, d, "events")
    from trimet_bytes__data_engineering_project_spark.plans.warehouse import (
        merge_upsert,
    )

    updates = (
        ev.filter(F.col("event_id") % 200 == 0)
        .withColumn("value", F.col("value") + 1.0)
        .withColumn(
            "event_id",
            F.when(F.col("event_id") % 400 == 0, F.col("event_id"))  # update half
            # insert half: re-keyed past every scaled id space (ids are
            # dense sequential plus copy strides, so +1 would collide)
            .otherwise(F.col("event_id") + F.lit(10**15)),
        )
    )
    merged = merge_upsert(ev, updates, ["event_id"])
    return merged.agg(F.count("*").alias("n"), F.sum("value").alias("s"))


def _snapshot_probe_10pct(spark, d, kind):
    """Shared driver for the x85/x86 snapshot-probe rows: the 90% side's
    count table is PREBUILT once per scale dir (ensure_index marker,
    same protocol as _x49_probe) — the timed work is the 10% batch's
    tf agg + the join against the snapshot scan.  The contrast rows are
    x40_tfidf_top_terms / x51_unigram_surprisal_full, which re-aggregate
    the corpus every run (19.1x / 8.55x at x100 in round 4)."""
    from trimet_bytes__data_engineering_project_spark.operators.ann_index import (
        ensure_index,
    )
    from trimet_bytes__data_engineering_project_spark.operators.textstats import (
        doc_frequencies,
        tfidf_top_terms,
        unigram_counts,
        unigram_surprisal,
    )

    docs = spark.read.parquet(f"{d}/documents.parquet")
    base = docs.filter(F.pmod(F.col("doc_id"), F.lit(10)) != 0)
    batch = docs.filter(F.pmod(F.col("doc_id"), F.lit(10)) == 0)
    path = os.path.join(_SCALE_ROOT, f"{kind}_snapshot", os.path.basename(d.rstrip("/")))
    # mode("overwrite"): a crashed partial build leaves the directory
    # without _SUCCESS, so ensure_index re-runs the lambda — the default
    # errorifexists would then fail on the leftover path forever
    if kind == "df":
        ensure_index(
            lambda: doc_frequencies(base).write.mode("overwrite").parquet(path), path
        )
        out = tfidf_top_terms(batch, k=3, df_counts=spark.read.parquet(path))
        return out.agg(F.count("*").alias("n"), F.sum("score").alias("s"))
    ensure_index(
        lambda: unigram_counts(base).write.mode("overwrite").parquet(path), path
    )
    out = unigram_surprisal(batch, base_counts=spark.read.parquet(path))
    return out.agg(F.count("*").alias("n_docs"), F.sum("surprisal_sum").alias("total"))


def _x83_span_dedup(spark, d):
    # full-corpus ExactSubstr covering mask (no id cap): replica text is
    # unique md5 words so the duplicated-gram fraction falls with scale
    # — what's measured is the single explode + digest count-agg +
    # digest join + per-doc RANGE window + reassembly over Nx tokens
    # (x39's machinery one level up, with positions); reduced to one
    # agg row so a 500k-doc collect isn't what's timed
    from trimet_bytes__data_engineering_project_spark.operators.dedup import dedup_spans

    docs = spark.read.parquet(f"{d}/documents.parquet")
    return dedup_spans(docs).agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens_removed").alias("n_removed"),
    )


def _x85_tfidf_snapshot_10pct(spark, d):
    return _snapshot_probe_10pct(spark, d, "df")


def _x86_surprisal_snapshot_10pct(spark, d):
    return _snapshot_probe_10pct(spark, d, "unigram")


_EVENTS_STREAM_SCHEMA = (
    "event_id long, ts timestamp_ntz, user_id long, event_type string, "
    "value double, props string"
)
_STREAM_RUN = [0]


def ensure_stream_events_x1(spark) -> str:
    """Normalized µs-TIMESTAMP_NTZ copy of the sf0.1 events for the
    streaming row's ×1 point — readStream needs an explicit schema and
    cannot go through load_table's dtype branch, so the copy IS the
    normalization (same guard the scaled dirs get via
    ensure_scale_events)."""
    out = os.path.join(_SCALE_ROOT, "x1_events")
    marker = os.path.join(out, "_BUILT")
    if not os.path.exists(marker):
        ev = load_table(spark, SF01, "events")
        ev.repartition(8).write.mode("overwrite").parquet(f"{out}/events.parquet")
        with open(marker, "w"):
            pass
    return out


def _t4_stream_rollup(spark, d):
    # the FIRST streaming scale row: the T4 watermarked hourly rollup
    # driven as an availableNow micro-batch stream over the scaled
    # events table — measures the Structured Streaming engine (offset
    # tracking, state store, watermark bookkeeping) on top of the same
    # windowed-agg plan the batch tier runs.  Fresh checkpoint + sink
    # per call so every timed run re-processes the full input (a reused
    # checkpoint would measure a no-op).
    import tempfile

    if d == SF01:
        d = ensure_stream_events_x1(spark)
    ck = tempfile.mkdtemp(prefix="sb_ck_")
    name = f"sb_rollup_{_STREAM_RUN[0]}"
    _STREAM_RUN[0] += 1
    stream = spark.readStream.schema(_EVENTS_STREAM_SCHEMA).parquet(f"{d}/events.parquet")
    # watermarks require TIMESTAMP (ltz) — the NTZ wall clock maps 1:1
    # under the fixed session timezone, so the hourly windows are stable
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    agg = (
        stream.withWatermark("ts", "1 day")
        .groupBy(F.window("ts", "1 hour").alias("win"))
        .agg(F.count("*").alias("n_events"))
        .select(F.col("win.start").alias("hour_start"), "n_events")
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    shutil.rmtree(ck, ignore_errors=True)
    return spark.table(name).agg(
        F.count("*").alias("n_hours"), F.sum("n_events").alias("n_events")
    )


def _ss_join_stream(spark, d):
    # the SECOND streaming scale row, and the first with JOIN state:
    # click and view events stream as two sources from the same scaled
    # table, both-side watermarked, inner-joined on user_id with the
    # view inside [click_ts, click_ts + 600 s] — the stateful shape
    # whose buffers the watermark + interval condition keep evictable.
    # availableNow + fresh checkpoint/sink per call, parquet sink
    # (stream-stream joins reject the memory sink's complete mode), one
    # count over the landed output
    import tempfile

    from trimet_bytes__data_engineering_project_spark.streaming.pipeline import (
        stream_stream_interval_join,
    )

    if d == SF01:
        d = ensure_stream_events_x1(spark)
    ck = tempfile.mkdtemp(prefix="sb_ssj_ck_")
    out = tempfile.mkdtemp(prefix="sb_ssj_out_")

    def src(event_type, ts_alias):
        s = spark.readStream.schema(_EVENTS_STREAM_SCHEMA).parquet(f"{d}/events.parquet")
        return (
            s.filter(F.col("event_type") == event_type)
            .select("user_id", F.col("ts").cast("timestamp").alias(ts_alias))
        )

    joined = stream_stream_interval_join(
        src("click", "click_ts"), src("view", "view_ts"),
        "user_id", "click_ts", "view_ts", 600,
    )
    q = (
        joined.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    shutil.rmtree(ck, ignore_errors=True)
    res = spark.read.parquet(out).agg(F.count("*").alias("n_pairs"))
    n = res.collect()[0][0]
    shutil.rmtree(out, ignore_errors=True)
    return spark.createDataFrame([(n,)], "n_pairs long")


def _cc_distributed(spark, d):
    # connected components over the scaled near-dup pair graph with the
    # small-graph fast path DISABLED — measures the iterative
    # label-propagation rounds themselves (the path a >50K-edge graph
    # takes in production); pairs come from the same sized-blocking
    # flow as embedding_near_dup_lsh_full
    from trimet_bytes__data_engineering_project_spark.operators.graph import (
        connected_components,
    )
    from trimet_bytes__data_engineering_project_spark.operators.similarity import (
        embedding_near_dup_lsh,
    )

    emb = spark.read.parquet(f"{d}/embeddings.parquet")
    n = emb.count()
    n_planes = max(4, (max(1, n // 125) - 1).bit_length())
    pairs = embedding_near_dup_lsh(emb, threshold=0.35, dim=64, n_planes=n_planes)
    comp = connected_components(pairs.select("a_id", "b_id"), small_graph_threshold=0)
    return comp.agg(F.count("*").alias("n_nodes"),
                    F.countDistinct("cluster_id").alias("n_clusters"))


def _bm25_query_workload(spark, d, path, batch_queries=128):
    # fixed-size SERVING workload: ~batch_queries query docs regardless of
    # corpus size (a query batch does not grow with the corpus), each
    # contributing its top-3 index-side tf-idf terms
    from trimet_bytes__data_engineering_project_spark.operators.retrieval import (
        materialize_queries,
        top_terms_from_index,
    )

    n = spark.read.parquet(f"{d}/documents.parquet").count()
    modulus = max(50, n // batch_queries)
    return materialize_queries(
        top_terms_from_index(
            spark, path, F.pmod(F.col("doc_id"), F.lit(modulus)) == 0, n_terms=3
        )
    )


def _bm25_index_path_and_buckets(spark, d):
    # bucket-count sizing follows the blocking-key-cardinality rule
    # (BENCH_NOTES): hold per-bucket posting volume ~constant as the
    # vocabulary grows — n_buckets doubles with each ~1000-doc step,
    # floored at the registered query's 64.  At 100 TB the bucket count
    # is a function of corpus cardinality, never a constant.
    n = spark.read.parquet(f"{d}/documents.parquet").count()
    n_buckets = max(64, 1 << max(0, (n // 1000)).bit_length())
    path = os.path.join(_SCALE_ROOT, "bm25_index_v2", os.path.basename(d.rstrip("/")))
    return path, n_buckets


def _x102_bm25_serve(spark, d, batch_queries=128):
    # the lexical serving row: the inverted index (postings partitioned
    # by term bucket, df/dl denormalized at build) is built ONCE per
    # scale dir; a fixed ~128-doc query batch probes it via an IN-list
    # partition filter over <=384 distinct term buckets.  Per-run work
    # is O(matched postings in the probed buckets) — the fraction of
    # the index read per batch SHRINKS as n_buckets scales with the
    # vocabulary (the x21/x89 sub-linear serving argument, lexical).
    from trimet_bytes__data_engineering_project_spark.operators.ann_index import ensure_index
    from trimet_bytes__data_engineering_project_spark.operators.retrieval import (
        bm25_serve,
        write_inverted_index,
    )

    docs = spark.read.parquet(f"{d}/documents.parquet")
    path, n_buckets = _bm25_index_path_and_buckets(spark, d)
    ensure_index(
        lambda: write_inverted_index(docs, path, n_buckets=n_buckets),
        os.path.join(path, "stats"),
    )
    q = _bm25_query_workload(spark, d, path, batch_queries)
    return bm25_serve(spark, q, path, k=5, n_buckets=n_buckets).agg(
        F.count("*").alias("n_hits"), F.sum("score_fp").alias("s")
    )


def _x101_bm25_inflight(spark, d, batch_queries=128):
    # the honest comparison pair for the serving row (the x85/x86
    # snapshot-vs-self-scored convention): the SAME fixed query batch
    # scored in-flight — tokenize + aggregate the whole corpus per run.
    # Expected to scale ~linearly in corpus rows where the serve row
    # stays near-flat; reuses the index only to derive the identical
    # workload (query construction is not the measured regime).
    from trimet_bytes__data_engineering_project_spark.operators.ann_index import ensure_index
    from trimet_bytes__data_engineering_project_spark.operators.retrieval import (
        bm25_topk,
        write_inverted_index,
    )

    docs = spark.read.parquet(f"{d}/documents.parquet")
    path, n_buckets = _bm25_index_path_and_buckets(spark, d)
    ensure_index(
        lambda: write_inverted_index(docs, path, n_buckets=n_buckets),
        os.path.join(path, "stats"),
    )
    q = _bm25_query_workload(spark, d, path, batch_queries)
    return bm25_topk(docs, q, k=5).agg(
        F.count("*").alias("n_hits"), F.sum("score_fp").alias("s")
    )



def _x102_bm25_serve_fixedq(spark, d, batch_queries=128):
    # the PURE serving regime: the query workload is persisted once per
    # scale dir (a serving system receives queries, it does not re-mine
    # them from the index per request) — the timed region is ONLY the
    # probe: bounded term collect -> partition IN-list + pushed term
    # predicate -> score -> top-k.  The delta between this row and
    # x102_bm25_serve_128q is the workload-construction scan, which
    # grows with the vocabulary; this row is the x89 analogue.
    from trimet_bytes__data_engineering_project_spark.operators.ann_index import ensure_index
    from trimet_bytes__data_engineering_project_spark.operators.retrieval import (
        bm25_serve,
        write_inverted_index,
    )

    docs = spark.read.parquet(f"{d}/documents.parquet")
    path, n_buckets = _bm25_index_path_and_buckets(spark, d)
    ensure_index(
        lambda: write_inverted_index(docs, path, n_buckets=n_buckets),
        os.path.join(path, "stats"),
    )
    qpath = os.path.join(path, "workload")
    ensure_index(
        lambda: _bm25_query_workload(spark, d, path, batch_queries)
        .write.mode("overwrite")
        .parquet(qpath),
        qpath,
    )
    q = spark.read.parquet(qpath)
    return bm25_serve(spark, q, path, k=5, n_buckets=n_buckets).agg(
        F.count("*").alias("n_hits"), F.sum("score_fp").alias("s")
    )



def _x105_pq_probe(spark, d):
    # the compressed-codes serving row: the PQ index stores ~8 code
    # bytes + one double per vector (vs 512 B of float64 — ~40x fewer
    # scan bytes than the float index and ~10x fewer than int8); the
    # ADC probe is one TakeOrderedAndProject scan of the codes table,
    # no join, no shuffle.  Expected ~linear in rows with a tiny
    # constant — the regime where scanning EVERYTHING beats pruning.
    from trimet_bytes__data_engineering_project_spark.operators.ann_index import ensure_index
    from trimet_bytes__data_engineering_project_spark.operators.pq import (
        pq_adc_probe,
        write_pq_index,
    )

    emb = spark.read.parquet(f"{d}/embeddings.parquet")
    qv = [float(x) for x in emb.filter("vec_id = 0").first()["embedding"]]
    path = os.path.join(_SCALE_ROOT, "pq_index", os.path.basename(d.rstrip("/")))
    ensure_index(
        lambda: write_pq_index(emb, path, dim=64), os.path.join(path, "codes")
    )
    return pq_adc_probe(spark, path, qv, k=5)



def _x107_ivfpq_probe(spark, d):
    # pruned AND compressed: the probe reads ONE inverted list's code
    # files — partition pruning bounds rows, PQ bounds bytes/row.
    # Expect at-or-below the flat PQ row (x105) with the margin growing
    # as list count scales with the corpus (n_centroids here fixed at
    # 16 — at 100 TB the list count scales like the IVF rows' sizing).
    from trimet_bytes__data_engineering_project_spark.operators.ann_index import ensure_index
    from trimet_bytes__data_engineering_project_spark.operators.pq import (
        ivfpq_probe,
        write_ivfpq_index,
    )

    emb = spark.read.parquet(f"{d}/embeddings.parquet")
    qv = [float(x) for x in emb.filter("vec_id = 0").first()["embedding"]]
    path = os.path.join(_SCALE_ROOT, "ivfpq_index", os.path.basename(d.rstrip("/")))
    ensure_index(
        lambda: write_ivfpq_index(emb, path, dim=64), os.path.join(path, "codes")
    )
    return ivfpq_probe(spark, path, qv, k=5, nprobe=1)


def _x115_prf_serve(spark, d, batch_queries=128):
    # PRF through the persisted index, pure-serve regime (workload
    # persisted once): the timed region is round-1 serve -> feedback
    # fetch (O(batch*fb_k) docs tokenize) -> expansion -> round-2
    # serve.  Every stage is O(batch) or O(probed postings); the
    # corpus-growing terms are the probed posting lists (the x102
    # band) and nothing else — the multi-stage shape costs fixed
    # per-job latency, not scan growth.
    from trimet_bytes__data_engineering_project_spark.operators.ann_index import ensure_index
    from trimet_bytes__data_engineering_project_spark.operators.retrieval import (
        bm25_serve,
        index_df_stats,
        materialize_queries,
        prf_expand_queries,
        write_inverted_index,
    )

    docs = spark.read.parquet(f"{d}/documents.parquet")
    path, n_buckets = _bm25_index_path_and_buckets(spark, d)
    ensure_index(
        lambda: write_inverted_index(docs, path, n_buckets=n_buckets),
        os.path.join(path, "stats"),
    )
    qpath = os.path.join(path, "workload")
    ensure_index(
        lambda: _bm25_query_workload(spark, d, path, batch_queries)
        .write.mode("overwrite")
        .parquet(qpath),
        qpath,
    )
    q = spark.read.parquet(qpath)
    serve = lambda qq, k: bm25_serve(spark, qq, path, k=k, n_buckets=n_buckets)  # noqa: E731
    expanded = materialize_queries(
        prf_expand_queries(
            docs, q, fb_k=3, n_expand=2, retrieve=serve,
            df_stats=index_df_stats(spark, path, n_buckets),
        )
    )
    return bm25_serve(spark, expanded, path, k=5, n_buckets=n_buckets).agg(
        F.count("*").alias("n_hits"), F.sum("score_fp").alias("s")
    )


def _x116_compaction(spark, d):
    # the compaction JOB is the measured thing: two segmented
    # generations (landed once per scale dir) merge into the batch
    # layout — one postings pass for the df window + the bucket-aligned
    # write, expected ~linear in postings (the index-build class, paid
    # nightly and amortized over every stored-df serve).
    from trimet_bytes__data_engineering_project_spark.operators.ann_index import ensure_index
    from trimet_bytes__data_engineering_project_spark.operators.retrieval import (
        compact_inverted_index,
        land_inverted_batch,
    )

    docs = spark.read.parquet(f"{d}/documents.parquet")
    _, n_buckets = _bm25_index_path_and_buckets(spark, d)
    seg = os.path.join(_SCALE_ROOT, "bm25_segmented", os.path.basename(d.rstrip("/")))
    dst = os.path.join(_SCALE_ROOT, "bm25_compacted", os.path.basename(d.rstrip("/")))

    def build():
        land_inverted_batch(docs.filter(F.pmod(F.col("doc_id"), F.lit(2)) == 0), seg, 0, n_buckets)
        land_inverted_batch(docs.filter(F.pmod(F.col("doc_id"), F.lit(2)) == 1), seg, 1, n_buckets)

    ensure_index(build, f"{seg}/stats/batch_id=1")
    compact_inverted_index(spark, seg, dst, n_buckets=n_buckets)
    return spark.read.parquet(os.path.join(dst, "stats"))


def _x117_snippet_serve(spark, d, batch_queries=128):
    # the request path: persisted workload -> top-3 serve -> best-window
    # snippets.  Only HIT docs tokenize (O(batch*k) semi-join rows), the
    # window scoring is O(matched occurrences) — expect the x102-fixedq
    # band with the probed posting lists as the only growing term.
    from trimet_bytes__data_engineering_project_spark.operators.ann_index import ensure_index
    from trimet_bytes__data_engineering_project_spark.operators.retrieval import (
        best_window_snippets,
        bm25_serve,
        materialize_queries,
        write_inverted_index,
    )

    docs = spark.read.parquet(f"{d}/documents.parquet")
    path, n_buckets = _bm25_index_path_and_buckets(spark, d)
    ensure_index(
        lambda: write_inverted_index(docs, path, n_buckets=n_buckets),
        os.path.join(path, "stats"),
    )
    qpath = os.path.join(path, "workload")
    ensure_index(
        lambda: _bm25_query_workload(spark, d, path, batch_queries)
        .write.mode("overwrite")
        .parquet(qpath),
        qpath,
    )
    q = spark.read.parquet(qpath)
    hits = materialize_queries(
        bm25_serve(spark, q, path, k=3, n_buckets=n_buckets).select("query_id", "doc_id")
    )
    return best_window_snippets(docs, q, hits, width=8).agg(
        F.count("*").alias("n"), F.sum("n_hits").alias("s")
    )


def _x118_opq_probe(spark, d):
    # OPQ-lite serving: the scan is byte-identical to x105's flat row
    # (8 codes + a double per vector) — the permutation costs one
    # driver-side query transform; the row exists to pin that the
    # transform adds nothing at serve time.
    from trimet_bytes__data_engineering_project_spark.operators.ann_index import ensure_index
    from trimet_bytes__data_engineering_project_spark.operators.pq import (
        opq_adc_probe,
        write_opq_index,
    )

    emb = spark.read.parquet(f"{d}/embeddings.parquet")
    qv = [float(x) for x in emb.filter("vec_id = 0").first()["embedding"]]
    path = os.path.join(_SCALE_ROOT, "opq_index", os.path.basename(d.rstrip("/")))
    ensure_index(
        lambda: write_opq_index(emb, path, dim=64), os.path.join(path, "codes")
    )
    return opq_adc_probe(spark, path, qv, k=5)


def _x119_diversified_serve(spark, d, batch_queries=128):
    # diversification rides the serve: fixed 128-query workload ->
    # top-20 shortlist off the persisted index -> per-source cap
    # rerank.  The cap stage is two windows over the O(batch*20)
    # shortlist plus one doc_id join against the documents dimension
    # (broadcast the shortlist side); the ONLY corpus-growing term is
    # the probed posting lists — expect the x102 serve band, with the
    # rerank adding a constant.
    from trimet_bytes__data_engineering_project_spark.operators.ann_index import ensure_index
    from trimet_bytes__data_engineering_project_spark.operators.retrieval import (
        bm25_serve,
        diversified_topk,
        write_inverted_index,
    )

    docs = spark.read.parquet(f"{d}/documents.parquet")
    path, n_buckets = _bm25_index_path_and_buckets(spark, d)
    ensure_index(
        lambda: write_inverted_index(docs, path, n_buckets=n_buckets),
        os.path.join(path, "stats"),
    )
    qpath = os.path.join(path, "workload")
    ensure_index(
        lambda: _bm25_query_workload(spark, d, path, batch_queries)
        .write.mode("overwrite")
        .parquet(qpath),
        qpath,
    )
    q = spark.read.parquet(qpath)
    short = bm25_serve(spark, q, path, k=20, n_buckets=n_buckets).select(
        "query_id", "doc_id", "score_fp"
    )
    return diversified_topk(
        short, docs.select("doc_id", "source"), k=5, cap=2, group_col="source"
    ).agg(F.count("*").alias("n"), F.sum("score_fp").alias("s"))


def _x120_bm25f_inflight(spark, d, batch_queries=128):
    # fielded scoring in the IN-FLIGHT regime (the x101 band): weighted
    # tf and weighted dl are derived from the corpus per run — both
    # grow with it — so this prices what field weighting adds to the
    # full in-flight chain (one extra CASE per token occurrence, zero
    # extra shuffles).  Expect ~x101's ratio; the serve form would ride
    # x102 (weighted stats are index-build-time, same postings layout).
    from trimet_bytes__data_engineering_project_spark.operators.retrieval import (
        bm25f_topk,
        materialize_queries,
        top_fielded_terms_queries,
    )

    docs = spark.read.parquet(f"{d}/documents.parquet")
    n = docs.count()
    modulus = max(50, n // batch_queries)
    q = materialize_queries(
        top_fielded_terms_queries(
            docs, F.pmod(F.col("doc_id"), F.lit(modulus)) == 0, n_terms=3
        )
    )
    return bm25f_topk(docs, q, k=5).agg(
        F.count("*").alias("n"), F.sum("score_fp").alias("s")
    )


def _x121_prefix_probe(spark, d, batch_queries=16):
    # truncated-dimension serving: stage 1 scans the WHOLE prefix table
    # (brute force over 16 of 64 dims — 4x fewer vector bytes than the
    # float table, the compressor-vs-fidelity sibling of x105's codes
    # scan), stage 2 fetches only O(batch*shortlist) full rows.
    # Expect ~linear in rows with a smaller constant than the float
    # brute-force row (x58's band) — the row prices the byte saving.
    from trimet_bytes__data_engineering_project_spark.operators.ann_index import (
        ensure_index,
        prefix_refine_knn_join,
        write_prefix_index,
    )

    emb = spark.read.parquet(f"{d}/embeddings.parquet")
    n = emb.count()
    modulus = max(10, n // batch_queries)
    q = emb.filter(F.pmod(F.col("vec_id"), F.lit(modulus)) == 0)
    path = os.path.join(_SCALE_ROOT, "prefix_index", os.path.basename(d.rstrip("/")))
    ensure_index(
        lambda: write_prefix_index(emb, path, prefix_dim=16),
        os.path.join(path, "prefix"),
    )
    return prefix_refine_knn_join(
        spark, q, emb, path, k=3, k_shortlist=10, prefix_dim=16
    ).agg(F.count("*").alias("n"), F.sum("cos_exact").alias("s"))


def _x122_hamming_probe(spark, d, batch_queries=16):
    # the 1-bit compressor's serving row: stage 1 scans 8 sketch
    # bytes/vector (vs PQ's ~16, prefix's 128, float's 512) and ranks
    # by integer popcount — expect the x105 flat band or below; the
    # rerank fetch is O(batch*shortlist).
    from trimet_bytes__data_engineering_project_spark.operators.ann_index import (
        ensure_index,
        hamming_refine_knn_join,
        write_hamming_sketch,
    )

    emb = spark.read.parquet(f"{d}/embeddings.parquet")
    n = emb.count()
    modulus = max(10, n // batch_queries)
    q = emb.filter(F.pmod(F.col("vec_id"), F.lit(modulus)) == 0)
    path = os.path.join(_SCALE_ROOT, "hamming_index", os.path.basename(d.rstrip("/")))
    ensure_index(
        lambda: write_hamming_sketch(emb, path, dim=64, n_bits=32),
        os.path.join(path, "sketch"),
    )
    return hamming_refine_knn_join(
        spark, q, emb, path, k=3, k_shortlist=10, dim=64, n_bits=32
    ).agg(F.count("*").alias("n"), F.sum("cos_exact").alias("s"))


def _x125_pagerank(spark, d):
    # link centrality over the near-dup pair graph at full scale: the
    # corpus-growing stage is the LSH pair generation (the
    # minhash_near_dup_pairs_full band, ~2.5x); the 3 fixed-point
    # rounds themselves shuffle two longs per edge and the replica
    # design keeps the pair graph sparse, so expect the pair band plus
    # a near-constant iteration tail.
    from trimet_bytes__data_engineering_project_spark.operators.graph import pagerank

    docs = spark.read.parquet(f"{d}/documents.parquet")
    pairs = _minhash_pairs(spark, d).select("a_id", "b_id")
    edges = pairs.select(
        F.col("a_id").alias("src"), F.col("b_id").alias("dst")
    ).unionByName(pairs.select(F.col("b_id").alias("src"), F.col("a_id").alias("dst")))
    return pagerank(edges, docs.select(F.col("doc_id").alias("node_id")), iters=3).agg(
        F.count("*").alias("n"), F.sum("rank_fp").alias("s")
    )


def _x126_bpe_learn(spark, d):
    # vocabulary induction at full scale: ONE corpus-sized word count
    # (the Zipf collapse to the type table), then 3 learning steps
    # each a char explode + weighted (a,b) count over VOCABULARY rows.
    # The replica design's md5-derived text makes vocab grow ~linearly
    # (worst case for the collapse), so expect the word-count band —
    # the per-occurrence form measured 22.16x/131 s here before the
    # type refactor.
    from trimet_bytes__data_engineering_project_spark.operators.bpe import bpe_learn

    docs = spark.read.parquet(f"{d}/documents.parquet")
    return bpe_learn(docs, 3)


def _x123_hard_negatives(spark, d, batch_queries=16):
    # contrastive mining at full scale: one broadcast-anchors pass over
    # the corpus scan with the cross-label predicate before the top-k
    # window — expect the exact-kNN band (x58), the label filter adds
    # no shuffle.
    from trimet_bytes__data_engineering_project_spark.operators.similarity import (
        hard_negative_mining,
    )

    emb = spark.read.parquet(f"{d}/embeddings.parquet")
    n = emb.count()
    modulus = max(10, n // batch_queries)
    q = emb.filter(F.pmod(F.col("vec_id"), F.lit(modulus)) == 0)
    return hard_negative_mining(q, emb, k=3).agg(
        F.count("*").alias("n"), F.sum("rn").alias("s")
    )


def _x126_bpe_learn_incr(spark, d):
    # the delta-count rung: full pair count once, then each step
    # recounts only affected word types and folds signed deltas into
    # the standing counts table — expect the full-recount row minus
    # ~one vocab-wide explode+shuffle per later step.
    from trimet_bytes__data_engineering_project_spark.operators.bpe import (
        bpe_learn_incremental,
    )

    docs = spark.read.parquet(f"{d}/documents.parquet")
    return bpe_learn_incremental(docs, 3)


def ensure_zipf_docs(spark, copies: int) -> str:
    """A HEAPS-REALISTIC text fixture for the BPE trainer rows: the
    replica rig derives fresh md5 words per copy, so VOCABULARY grows
    ~linearly with rows — the documented worst case for the trainer's
    word-TYPE collapse (a real crawl follows Heaps' law, V ≈ K·n^0.5).
    Here every scale draws its 8-word docs from a pool of
    V = 400·ceil(√copies) word types with Zipf(1) frequencies
    (inverse-CDF rank = floor(V^u), u a deterministic hash fraction —
    pow is fine here: fixture GENERATION only, never an oracle-checked
    value), so ×100 rows carries ×10 word types.  Built once per scale
    under .scratch/scale/zipf/x{copies}."""
    import math

    out = os.path.join(_SCALE_ROOT, "zipf", f"x{copies}")
    marker = os.path.join(out, "_BUILT")
    if os.path.exists(marker):
        return out
    v = 400 * int(math.ceil(math.sqrt(copies)))
    base = spark.read.parquet(f"{SF01}/documents.parquet").select("doc_id")
    frames = []
    for c in range(copies):
        words = []
        for i in range(8):
            u = (
                F.pmod(
                    F.hash(F.col("doc_id"), F.lit(c), F.lit(i)), F.lit(1_000_000)
                ).cast("double")
                / F.lit(1_000_000.0)
            )
            rank = F.floor(F.pow(F.lit(float(v)), u)).cast("long")
            words.append(F.concat(F.lit("w"), rank.cast("string")))
        frames.append(
            base.select(
                (F.col("doc_id") + c * _ID_STRIDE).alias("doc_id"),
                F.concat_ws(" ", *words).alias("text"),
            )
        )
    n_out = 32 if copies <= 10 else 128
    _union_all(frames).repartition(n_out).write.mode("overwrite").parquet(
        f"{out}/documents.parquet"
    )
    with open(marker, "w"):
        pass
    return out


def _zipf_copies(d: str) -> int:
    return 1 if d == SF01 else int(os.path.basename(d.rstrip("/"))[1:])


def _x126_bpe_incr_zipf(spark, d):
    # the registered delta-count trainer on the Heaps-realistic corpus
    # — separates the trainer's OWN scaling from the replica rig's
    # linear-vocab artifact (r7 verdict item 4): vocabulary grows √rows
    # here, so the per-step type-table work should track ~√scale while
    # the one corpus word count stays the linear term.
    from trimet_bytes__data_engineering_project_spark.operators.bpe import (
        bpe_learn_incremental,
    )

    zd = ensure_zipf_docs(spark, _zipf_copies(d))
    docs = spark.read.parquet(f"{zd}/documents.parquet")
    return bpe_learn_incremental(docs, 3)


def _x126_bpe_full_zipf(spark, d):
    # the full-recount trainer on the same Heaps-realistic corpus —
    # the delta-vs-full comparison at realistic vocabulary growth.
    from trimet_bytes__data_engineering_project_spark.operators.bpe import bpe_learn

    zd = ensure_zipf_docs(spark, _zipf_copies(d))
    docs = spark.read.parquet(f"{zd}/documents.parquet")
    return bpe_learn(docs, 3)


def _x136_snapshot_diff(spark, d):
    # version diff at full scale: digests in each scan's project, ONE
    # full-outer id join carrying (id, 32-hex) rows — expect ~linear
    # in rows (the join IS the operator); on an id-bucketed layout the
    # shuffle disappears entirely (plans/warehouse.py:write_bucketed).
    from trimet_bytes__data_engineering_project_spark.plans.warehouse import (
        snapshot_diff,
    )

    docs = spark.read.parquet(f"{d}/documents.parquet")
    old = docs.filter(F.col("doc_id") % 10 != 9)
    new = docs.filter(F.col("doc_id") % 10 != 0).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 97 == 0, F.concat(F.col("text"), F.lit(" updated"))
        ).otherwise(F.col("text")),
    )
    return (
        snapshot_diff(old, new, "doc_id", ["text"])
        .groupBy("status")
        .agg(F.count("*").alias("n"))
    )


def _x139_grouped_quantiles(spark, d):
    # per-group mergeable quantiles at full scale: one (group, bin)
    # count with map-side combine; the windows run over per-group
    # 64-row histograms — expect near-flat (the scan is the only
    # corpus term, and it reads two columns).
    from trimet_bytes__data_engineering_project_spark.operators.sampling import (
        grouped_histogram_quantiles,
    )
    from trimet_bytes__data_engineering_project_spark.operators.textstats import (
        token_count_col,
    )

    docs = spark.read.parquet(f"{d}/documents.parquet")
    with_v = docs.select("lang", token_count_col(F.col("text")).alias("v"))
    return grouped_histogram_quantiles(
        with_v, "v", "lang", [(1, 2), (9, 10), (99, 100)], lo=0, hi=128, n_bins=64
    )


def _x130_power_iteration(spark, d):
    # spectral pass at full scale: per round, one broadcast-iterate
    # fold (narrow) + one 64-group agg with map-side combine — the
    # shuffle carries 64 rows/task, so expect near-linear in the scan
    # with a small constant (3 rounds over the checkpointed quantized
    # matrix).
    from trimet_bytes__data_engineering_project_spark.operators.spectral import (
        power_iteration_top_component,
    )

    emb = spark.read.parquet(f"{d}/embeddings.parquet")
    return power_iteration_top_component(emb, iters=3).agg(
        F.count("*").alias("n"), F.sum(F.abs(F.col("v_fp"))).alias("s")
    )


def _x128_mmr(spark, d, batch_queries=16):
    # MMR at full scale: corpus-sized work is the one exact shortlist
    # pass (x58's band); the pairwise-sim table and the k unrolled
    # greedy steps are O(batch*shortlist^2) constants.
    from trimet_bytes__data_engineering_project_spark.operators.similarity import (
        mmr_rerank,
    )

    emb = spark.read.parquet(f"{d}/embeddings.parquet")
    n = emb.count()
    modulus = max(10, n // batch_queries)
    q = emb.filter(F.pmod(F.col("vec_id"), F.lit(modulus)) == 0)
    return mmr_rerank(q, emb, k=3, k_shortlist=10).agg(
        F.count("*").alias("n"), F.sum("mmr_rn").alias("s")
    )


def _x111_ivfpq_residual_probe(spark, d):
    # the classic residual-encoded form: identical pruning to x107 (the
    # partition IN-list bounds rows, the codes bound bytes/row) plus one
    # broadcast join against the probed lists' centroid-dot table (a
    # bounded nprobe-row side).  Expect the x107 band — the residual
    # arithmetic changes encode-time work, not the probe scan.
    from trimet_bytes__data_engineering_project_spark.operators.ann_index import ensure_index
    from trimet_bytes__data_engineering_project_spark.operators.pq import (
        ivfpq_residual_probe,
        write_ivfpq_residual_index,
    )

    emb = spark.read.parquet(f"{d}/embeddings.parquet")
    qv = [float(x) for x in emb.filter("vec_id = 0").first()["embedding"]]
    path = os.path.join(_SCALE_ROOT, "ivfpq_resid_index", os.path.basename(d.rstrip("/")))
    ensure_index(
        lambda: write_ivfpq_residual_index(emb, path, dim=64), os.path.join(path, "codes")
    )
    return ivfpq_residual_probe(spark, path, qv, k=5, nprobe=1)


def _x113_collocations(spark, d):
    # corpus-wide mining (not serving): two tokenization passes feed the
    # bigram and unigram count tables, the candidate set joins the
    # unigram table twice, totals broadcast.  Both count tables grow
    # with vocabulary — expect the both-sides-grow n-gram band (x80's
    # ~9x), NOT the serving band; the snapshot contract is the remedy
    # when this runs nightly.
    from trimet_bytes__data_engineering_project_spark.operators.retrieval import collocations

    docs = spark.read.parquet(f"{d}/documents.parquet")
    return collocations(docs, n_top=20, min_count=5)


def _x110_phrase_serve(spark, d):
    # phrase serving from the positional index: the postings for the 20
    # phrase words are read via the bucket IN-list + pushed term
    # predicate; per-run work tracks the MATCHED posting lists (which
    # grow with corpus df of those words), never the corpus text.  The
    # workload (top-10 bigrams) is persisted with the index — mining it
    # is an index-build-time job, not a serving cost.
    from trimet_bytes__data_engineering_project_spark.operators.ann_index import ensure_index
    from trimet_bytes__data_engineering_project_spark.operators.retrieval import (
        phrase_search,
        term_bucket,
        top_bigram_phrases,
        write_inverted_index,
    )

    docs = spark.read.parquet(f"{d}/documents.parquet")
    _, n_buckets = _bm25_index_path_and_buckets(spark, d)
    path = os.path.join(_SCALE_ROOT, "pos_index", os.path.basename(d.rstrip("/")))

    def build():
        write_inverted_index(docs, path, n_buckets=n_buckets, store_positions=True)
        top_bigram_phrases(docs, n_phrases=10).write.mode("overwrite").parquet(
            os.path.join(path, "phrases")
        )

    ensure_index(build, os.path.join(path, "stats"))
    phrases = spark.read.parquet(os.path.join(path, "phrases"))
    words = sorted({w for r in phrases.collect() for w in r.phrase.split(" ")})
    buckets = sorted(
        {
            r.b
            for r in spark.createDataFrame([(w,) for w in words], ["term"])
            .select(term_bucket(F.col("term"), n_buckets).alias("b"))
            .collect()
        }
    )
    postings = spark.read.parquet(os.path.join(path, "postings")).filter(
        F.col("term_bucket").isin(buckets) & F.col("term").isin(words)
    )
    return phrase_search(docs, phrases, k=3, postings=postings)


def _x141_weighted_pagerank(spark, d):
    # x125 with weighted rank splits: the corpus-growing stage is the
    # same LSH pair generation; each round's contribution carries ONE
    # extra long (the match weight) and an extra multiply — expect the
    # x125 band (~2.4x), any excess means the weight column leaked
    # into a wider shuffle payload than designed.
    from trimet_bytes__data_engineering_project_spark.operators.dedup import MINHASH_K
    from trimet_bytes__data_engineering_project_spark.operators.graph import pagerank

    docs = spark.read.parquet(f"{d}/documents.parquet")
    pairs = _minhash_pairs(spark, d).select(
        "a_id", "b_id", (F.col("est_sim") * MINHASH_K).cast("long").alias("w")
    )
    edges = pairs.select(
        F.col("a_id").alias("src"), F.col("b_id").alias("dst"), "w"
    ).unionByName(
        pairs.select(F.col("b_id").alias("src"), F.col("a_id").alias("dst"), "w")
    )
    return pagerank(
        edges, docs.select(F.col("doc_id").alias("node_id")), iters=3, weight_col="w"
    ).agg(F.count("*").alias("n"), F.sum("rank_fp").alias("s"))


def _x142_hits(spark, d):
    # hubs/authorities over the containment-oriented pair graph: pair
    # generation dominates (the minhash band); the 2 rounds are four
    # half-steps of (join + agg) on two-long payloads plus a 1-row
    # normalizer broadcast each — expect the x125/x141 band.
    from trimet_bytes__data_engineering_project_spark.operators.graph import hits

    docs = spark.read.parquet(f"{d}/documents.parquet")
    pairs = _minhash_pairs(spark, d).select("a_id", "b_id")
    nc = docs.select("doc_id", "n_chars")
    j = (
        pairs.join(
            nc.select(F.col("doc_id").alias("a_id"), F.col("n_chars").alias("na")),
            "a_id",
        )
        .join(
            nc.select(F.col("doc_id").alias("b_id"), F.col("n_chars").alias("nb")),
            "b_id",
        )
    )
    a_first = (F.col("na") < F.col("nb")) | (
        (F.col("na") == F.col("nb")) & (F.col("a_id") < F.col("b_id"))
    )
    edges = j.select(
        F.when(a_first, F.col("a_id")).otherwise(F.col("b_id")).alias("src"),
        F.when(a_first, F.col("b_id")).otherwise(F.col("a_id")).alias("dst"),
    )
    return hits(edges, docs.select(F.col("doc_id").alias("node_id")), iters=2).agg(
        F.count("*").alias("n"),
        F.sum("hub_fp").alias("sh"),
        F.sum("auth_fp").alias("sa"),
    )


def _x143_importance_weights(spark, d):
    # DSIR hashed affinity at full scale: two token streams (corpus +
    # target subset) each collapse map-side into a 256-group count, the
    # bucket table broadcasts back, and the only corpus-keyed shuffle
    # is the per-doc agg — expect the cheap-text-pass band (x51's ~6x
    # upper bound, likely much flatter since no vocabulary join).
    from trimet_bytes__data_engineering_project_spark.operators.textstats import (
        hashed_importance_weights,
    )

    docs = spark.read.parquet(f"{d}/documents.parquet")
    return hashed_importance_weights(docs, docs.filter(F.col("lang") == "en")).agg(
        F.count("*").alias("n"), F.sum("affinity_sum").alias("s")
    )


def _x146_triangles(spark, d):
    # exact triangle counting on the near-dup graph: pair generation is
    # the corpus band; the count itself is two joins on the ORIENTED
    # edge list whose fan-out is bounded by oriented out-degree (the
    # arboricity bound) — the replica design keeps the graph sparse, so
    # expect the pair band with a small join tail.
    from trimet_bytes__data_engineering_project_spark.operators.graph import (
        triangle_stats,
    )

    pairs = _minhash_pairs(spark, d).select("a_id", "b_id")
    return triangle_stats(pairs).agg(
        F.count("*").alias("n"),
        F.sum("n_triangles").alias("t"),
        F.sum("degree").alias("dg"),
    )


def _x147_winnow(spark, d):
    # winnowing candidates at full scale: the fold is array-local per
    # doc (O(m*window), no shuffle), the exploded fingerprint stream is
    # ~2/(window+1) of the k-gram count, and the pair join blocks on
    # int64 fingerprints with the MAX_BUCKET cap — the same shape as
    # the minhash band (explode -> hash agg -> capped equi-join).
    from trimet_bytes__data_engineering_project_spark.operators.dedup import (
        winnow_candidates,
    )

    docs = spark.read.parquet(f"{d}/documents.parquet")
    return winnow_candidates(docs, k=3, window=4, min_shared=2).agg(
        F.count("*").alias("n"), F.sum("n_shared").alias("s")
    )


def _x148_gopher(spark, d):
    # one codegen projection over (doc_id, text) — the only corpus term
    # is the scan itself; expect near-flat (the x139 class), and any
    # ratio above ~2x means a shuffle crept into the gate.
    from trimet_bytes__data_engineering_project_spark.operators.textstats import (
        gopher_quality_flags,
    )

    docs = spark.read.parquet(f"{d}/documents.parquet")
    return gopher_quality_flags(docs).agg(
        F.count("*").alias("n"), F.sum("passes").alias("p")
    )


def _x149_lang_reid(spark, d):
    # x143's shape with a |langs| fan-out of the BUCKET table (never
    # the token stream) and one extra per-doc argmax window over
    # |langs| rows — expect the x143 band.
    from trimet_bytes__data_engineering_project_spark.operators.textstats import (
        hashed_lang_id,
    )

    docs = spark.read.parquet(f"{d}/documents.parquet")
    return hashed_lang_id(docs).agg(
        F.count("*").alias("n"), F.sum("agree").alias("a")
    )


def _x170_lang_snapshot(spark, d):
    # the x149 remedy (r7 verdict item 3): per-language profiles +
    # script masks prebuilt once per scale dir (ensure_index marker);
    # the timed work is the 10% batch's token-instance join against the
    # broadcast PIVOTED profile + ONE doc-keyed agg — no |langs| fanout
    # anywhere, so expect the x85/x155 snapshot band (<3x), replacing
    # x149's 10.57x as the nightly shape.
    from trimet_bytes__data_engineering_project_spark.operators.ann_index import (
        ensure_index,
    )
    from trimet_bytes__data_engineering_project_spark.operators.textstats import (
        lang_id_from_snapshot,
        lang_ratio_profiles,
        lang_script_masks,
    )

    docs = spark.read.parquet(f"{d}/documents.parquet")
    base = docs.filter(F.pmod(F.col("doc_id"), F.lit(10)) != 0)
    batch = docs.filter(F.pmod(F.col("doc_id"), F.lit(10)) == 0)
    root = os.path.join(_SCALE_ROOT, "lang_snapshot", os.path.basename(d.rstrip("/")))
    rpath, mpath = os.path.join(root, "ratios"), os.path.join(root, "masks")
    ensure_index(
        lambda: lang_ratio_profiles(base).write.mode("overwrite").parquet(rpath),
        rpath,
    )
    ensure_index(
        lambda: lang_script_masks(base).write.mode("overwrite").parquet(mpath),
        mpath,
    )
    out = lang_id_from_snapshot(
        batch, spark.read.parquet(rpath), spark.read.parquet(mpath)
    )
    return out.agg(F.count("*").alias("n"), F.sum("agree").alias("a"))


def _x174_label_impact(spark, d):
    # label-correction impact (r8 verdict item 4: measure the row its
    # class-mates all have): the x170 snapshot probe over the SAME
    # persisted profile artifact, then two <=|langs|-row group-counts
    # and one full-outer on those tables — the composition tail adds
    # two map-side-combined exchanges over |langs| keys, so expect the
    # x170 curve (~1x flat) plus noise.
    from trimet_bytes__data_engineering_project_spark.operators.ann_index import (
        ensure_index,
    )
    from trimet_bytes__data_engineering_project_spark.operators.textstats import (
        lang_id_from_snapshot,
        lang_ratio_profiles,
        lang_script_masks,
    )

    docs = spark.read.parquet(f"{d}/documents.parquet")
    base = docs.filter(F.pmod(F.col("doc_id"), F.lit(10)) != 0)
    batch = docs.filter(F.pmod(F.col("doc_id"), F.lit(10)) == 0)
    root = os.path.join(_SCALE_ROOT, "lang_snapshot", os.path.basename(d.rstrip("/")))
    rpath, mpath = os.path.join(root, "ratios"), os.path.join(root, "masks")
    ensure_index(
        lambda: lang_ratio_profiles(base).write.mode("overwrite").parquet(rpath),
        rpath,
    )
    ensure_index(
        lambda: lang_script_masks(base).write.mode("overwrite").parquet(mpath),
        mpath,
    )
    out = lang_id_from_snapshot(
        batch, spark.read.parquet(rpath), spark.read.parquet(mpath)
    )
    cc = out.groupBy(F.col("claimed").alias("lang")).agg(
        F.count("*").cast("long").alias("n_claimed")
    )
    pc = out.groupBy(F.col("pred").alias("lang")).agg(
        F.count("*").cast("long").alias("n_pred")
    )
    return (
        cc.join(pc, "lang", "full_outer")
        .na.fill(0, ["n_claimed", "n_pred"])
        .select("lang", "n_claimed", "n_pred")
    )


def _x14_media_features(spark, d):
    # multimodal feature extraction over the full scaled blob table
    # (r8 verdict item 6: the plumbing tier's first measured row):
    # one blob scan through ONE Arrow mapInPandas boundary — sha256 +
    # length + codepoint per payload, no shuffle; the corpus term is
    # the Python-side digest work, so expect ~linear in bytes and
    # NO join/shuffle blow-up (the ratio reads the Arrow path's
    # throughput, not a plan shape).
    from trimet_bytes__data_engineering_project_spark.operators.multimodal import (
        extract_features,
        media_from_documents,
    )

    docs = spark.read.parquet(f"{d}/documents.parquet")
    feats = extract_features(media_from_documents(docs))
    return feats.agg(
        F.count("*").alias("n"),
        F.sum("byte_len").alias("total_bytes"),
        F.sum(F.length("sha256_hex")).alias("sha_chars"),
    )


def _x175_frame_manifest(spark, d):
    # the 1-to-N frame fan-out at full scale: executor-side explode
    # inside mapInPandas (frame rows never transit the driver), then
    # per-frame sha — expect the x14 curve x the ~4x row fan-out,
    # still shuffle-free.
    from trimet_bytes__data_engineering_project_spark.operators.multimodal import (
        media_from_documents,
        sample_frames,
    )

    docs = spark.read.parquet(f"{d}/documents.parquet")
    frames = sample_frames(media_from_documents(docs), max_frames=4)
    return frames.agg(
        F.count("*").alias("n_frames"),
        F.sum(F.octet_length("frame_bytes")).alias("total_bytes"),
    )


def _x176_ivf_health(spark, d):
    # index health audit at scale: the compute-optimal c = sqrt(n/2)
    # index (shared artifact with the x168 build — ensure_index
    # amortizes), ONE map-side-combined n_c-group agg over the index
    # scan with stored norms (no re-fold); everything after the agg is
    # <=n_c rows — expect near-linear in index bytes, no join term.
    import math

    from trimet_bytes__data_engineering_project_spark.operators.ann_index import (
        _centroids_path,
        ensure_index,
        write_ivf_index,
    )
    from trimet_bytes__data_engineering_project_spark.operators.similarity import (
        as_double_vec,
        dot,
        l2_norm,
    )

    emb = spark.read.parquet(f"{d}/embeddings.parquet")
    n = emb.count()
    n_c = max(16, math.isqrt(n // 2))
    path = os.path.join(_SCALE_ROOT, "semdedup_ivf", os.path.basename(d.rstrip("/")))
    ensure_index(lambda: write_ivf_index(emb, path, n_centroids=n_c), path)
    idx = spark.read.parquet(path)
    cents = spark.read.parquet(_centroids_path(path)).withColumn(
        "c_n", l2_norm(F.col("cvec"))
    )
    cos = dot(as_double_vec("embedding"), F.col("cvec")) / (
        F.col("norm") * F.col("c_n")
    )
    g = (
        idx.join(F.broadcast(cents), "centroid_id")
        .select(
            "centroid_id",
            F.floor(cos * F.lit(1048576.0)).cast("long").alias("cos_fp"),
        )
        .groupBy("centroid_id")
        .agg(
            F.count("*").alias("n_vecs"),
            F.sum("cos_fp").alias("sum_cos_fp"),
            F.min("cos_fp").alias("min_cos_fp"),
        )
    )
    return g.agg(
        F.count("*").alias("n_lists"),
        F.max("n_vecs").alias("max_list"),
        F.sum("sum_cos_fp").alias("s"),
    )


def _x177_drift(spark, d):
    # generation drift at scale: the registered query verbatim — one
    # scan, one 64-group exchange, d-row output; expect the x130
    # single-round band (near-linear in the posexplode).
    return QUERIES["x177_embedding_drift"](spark, d)


def _x178_passage_retrieval(spark, d, batch_queries=128):
    # passage retrieval with max-passage pooling at scale: FIXED
    # ~128-query workload (the x137 eval convention — a serving batch
    # does not grow with the corpus) against the FULL chunked corpus,
    # scored in-flight; the corpus term is the matched passage
    # postings, so expect the x101 in-flight band; the serve path is
    # write_inverted_index over passages (the x102 contract unchanged).
    from trimet_bytes__data_engineering_project_spark.operators.retrieval import (
        bm25_topk,
        materialize_queries,
        top_terms_queries,
    )
    from trimet_bytes__data_engineering_project_spark.operators.textstats import (
        chunk_documents,
    )
    from pyspark.sql import Window as W

    docs = spark.read.parquet(f"{d}/documents.parquet")
    n = docs.count()
    modulus = max(50, n // batch_queries)
    queries = materialize_queries(
        top_terms_queries(docs, F.pmod(F.col("doc_id"), F.lit(modulus)) == 0, 3)
    )
    passages = chunk_documents(docs, size=200, stride=150).select(
        (F.col("doc_id") * F.lit(1048576) + F.col("chunk_idx"))
        .cast("long")
        .alias("passage_id"),
        F.col("chunk_text").alias("text"),
    )
    hits = bm25_topk(passages, queries, k=50, id_col="passage_id", text_col="text")
    pool = (
        hits.select(
            "query_id",
            F.expr("doc_id DIV 1048576").cast("long").alias("src_doc"),
            "score_fp",
        )
        .groupBy("query_id", "src_doc")
        .agg(F.max("score_fp").alias("best_fp"), F.count("*").alias("n_passages"))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("best_fp"), F.asc("src_doc"))
    return (
        pool.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .agg(F.count("*").alias("n"), F.sum("best_fp").alias("s"))
    )


def _x181_passage_serve(spark, d, batch_queries=128):
    # x178's serve twin: the passage index is built once per scale dir
    # (chunking + tokenization amortized to the build); the timed work
    # is the FIXED ~128-query probe of the term-bucket-pruned postings
    # + shortlist pooling — expect the x102/x90 serve band (near-flat).
    from trimet_bytes__data_engineering_project_spark.operators.ann_index import (
        ensure_index,
    )
    from trimet_bytes__data_engineering_project_spark.operators.retrieval import (
        bm25_serve,
        materialize_queries,
        top_terms_queries,
        write_inverted_index,
    )
    from trimet_bytes__data_engineering_project_spark.operators.textstats import (
        chunk_documents,
    )
    from pyspark.sql import Window as W

    docs = spark.read.parquet(f"{d}/documents.parquet")
    n = docs.count()
    modulus = max(50, n // batch_queries)
    ppath = os.path.join(
        _SCALE_ROOT, "passage_index", os.path.basename(d.rstrip("/")), "full"
    )

    def build() -> None:
        passages = chunk_documents(docs, size=200, stride=150).select(
            (F.col("doc_id") * F.lit(1048576) + F.col("chunk_idx"))
            .cast("long")
            .alias("doc_id"),
            F.col("chunk_text").alias("text"),
        )
        write_inverted_index(passages, ppath)

    ensure_index(build, os.path.join(ppath, "stats"))
    queries = materialize_queries(
        top_terms_queries(docs, F.pmod(F.col("doc_id"), F.lit(modulus)) == 0, 3)
    )
    hits = bm25_serve(spark, queries, ppath, k=50)
    pool = (
        hits.select(
            "query_id",
            F.expr("doc_id DIV 1048576").cast("long").alias("src_doc"),
            "score_fp",
        )
        .groupBy("query_id", "src_doc")
        .agg(F.max("score_fp").alias("best_fp"), F.count("*").alias("n_passages"))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("best_fp"), F.asc("src_doc"))
    return (
        pool.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .agg(F.count("*").alias("n"), F.sum("best_fp").alias("s"))
    )


def _x182_vector_hygiene(spark, d):
    # corpus hygiene audit: one scan with an array-local norm fold +
    # finiteness test, three 1-row counts and a <=64-group octave agg
    # off the checkpointed (n2, bad) table — expect the cheap band.
    return QUERIES["x182_vector_hygiene"](spark, d)


def _x183_heavy_keys(spark, d):
    # skew diagnostic over the full scaled events table: one map-side-
    # combined count shuffle on the key + stats over the COUNT table +
    # TakeOrderedAndProject — expect the scan-bound band.
    return QUERIES["x183_heavy_key_audit"](spark, d)


def _x185_cms_sketch(spark, d):
    # count-min sketch + exact top-20 over the full scaled events
    # table: the same single key-count shuffle as x183 (the count
    # table derives once, lazily checkpointed) plus the <=4096-cell
    # fold and a broadcast probe — expect x183's scan-bound band.
    return QUERIES["x185_cms_heavy_hitters"](spark, d)


def _cc_chain_edges(spark, d):
    # deterministic 64-node chains over the scaled doc ids: the long-
    # diameter shape that separates incremental maintenance (star
    # store, diameter 2) from full recomputes (log2(64) jump rounds)
    docs = spark.read.parquet(f"{d}/documents.parquet").select("doc_id")
    return docs.filter("doc_id % 64 < 63").selectExpr(
        "doc_id AS a_id", "doc_id + 1 AS b_id"
    )


def _x188_incremental_cc(spark, d):
    # the maintenance form: fold the newest ~11% of edges into a
    # PERSISTED label store built from the historical ~89% (the star
    # side has diameter 2, so rounds converge in the batch's diameter,
    # not the chain's); _x188_full_recompute prices what it avoids.
    from trimet_bytes__data_engineering_project_spark.operators.ann_index import (
        ensure_index,
    )
    from trimet_bytes__data_engineering_project_spark.operators.graph import (
        connected_components,
        merge_components,
    )

    edges = _cc_chain_edges(spark, d)
    store = os.path.join(_SCALE_ROOT, "cc_store", os.path.basename(d.rstrip("/")))

    def build() -> None:
        connected_components(
            edges.filter("a_id % 64 < 56"), small_graph_threshold=0
        ).write.mode("overwrite").parquet(store)

    ensure_index(build, store)
    labels = spark.read.parquet(store)
    return merge_components(
        labels, edges.filter("a_id % 64 >= 56"), small_graph_threshold=0
    )


def _x188_full_recompute(spark, d):
    # the recompute the store replaces: connected components over the
    # WHOLE accumulated edge set, every landing
    from trimet_bytes__data_engineering_project_spark.operators.graph import (
        connected_components,
    )

    return connected_components(_cc_chain_edges(spark, d), small_graph_threshold=0)


def ensure_scale_tpch(spark, scale_dir: str, copies: int) -> None:
    """Upgrade a scale dir with the TPC-H join tables (marker-guarded
    like ensure_scale_events): ORDERS scales with the fact side
    (o_orderkey shifted per copy to match the lineitem copies,
    o_custkey UNSHIFTED — more orders from the same customers, the way
    a fact grows against fixed dims), and customer/supplier/nation/
    region land verbatim (dims do not grow with the corpus), so the
    registered x193/x194 plans run against the scale dir unmodified.

    CONTRACT (r9 verdict nit): only KEYS shift per copy — o_orderdate
    and every other attribute land verbatim, so the TPC-H date horizon
    never moves and the literal date windows hard-coded in
    x193/x194/x204's oracles select the same fraction at every scale.
    If copies ever perturb dates, those oracles must parameterize."""
    if os.path.abspath(scale_dir) == os.path.abspath(SF01):
        return  # x1 IS the (read-only) testdata dir — all tables present
    marker = os.path.join(scale_dir, "_TPCH_BUILT")
    if os.path.exists(marker):
        return
    n_out = 32 if copies <= 10 else 128
    o = spark.read.parquet(f"{SF01}/orders.parquet")
    o_copies = [o] + [
        o.withColumn("o_orderkey", F.col("o_orderkey") + c * _ID_STRIDE)
        for c in range(1, copies)
    ]
    _union_all(o_copies).repartition(n_out).write.mode("overwrite").parquet(
        f"{scale_dir}/orders.parquet"
    )
    for t in ("customer", "supplier", "nation", "region"):
        spark.read.parquet(f"{SF01}/{t}.parquet").write.mode("overwrite").parquet(
            f"{scale_dir}/{t}.parquet"
        )
    with open(marker, "w"):
        pass


def _x193_supplier_volume(spark, d):
    # the six-table star-chain at scale: lineitem and orders x100, dims
    # fixed; one fact-fact shuffle, dims broadcast.
    ensure_scale_tpch(spark, d, 100 if "x100" in d else (10 if "x10" in d else 1))
    return QUERIES["x193_local_supplier_volume"](spark, d)


def _x194_shipping_priority(spark, d):
    # Q3 shape at scale: both date predicates push to the scans, the
    # one shuffle is lineitem JOIN orders, top-10 TakeOrderedAndProject.
    ensure_scale_tpch(spark, d, 100 if "x100" in d else (10 if "x10" in d else 1))
    return QUERIES["x194_shipping_priority"](spark, d)


def _x202_feed_outage(spark, d):
    # feed-outage audit over the full scaled events table: two-level
    # lag — (day, 15-min-shard) interior window with rate×width-bounded
    # sort partitions + a tiny per-day boundary frame — the window-
    # shuffle band.
    return QUERIES["x202_feed_outage_audit"](spark, d)


def _x190_column_stats_approx(spark, d):
    # the built 100-TB swap for x190: HLL++ NDVs drop the map-side
    # Expand and the 60M-distinct shuffle; everything else stays exact.
    from trimet_bytes__data_engineering_project_spark.plans.extensions import (
        column_stats_approx,
    )

    return column_stats_approx(spark, d)


def _x203_salted_join(spark, d):
    # the skew demo over the full scaled events table: 70% of rows on
    # one hot key, salted x16 against the replicated 50-row dim.
    return QUERIES["x203_salted_hot_join"](spark, d)


def _x204_q18(spark, d):
    # Q18 shape at scale: one lineitem scan -> two-phase agg -> tiny
    # broadcast build side against scaled orders, then fixed customers.
    ensure_scale_tpch(spark, d, 100 if "x100" in d else (10 if "x10" in d else 1))
    return QUERIES["x204_large_customer_orders"](spark, d)


def _x205_point_in_any(spark, d):
    # 100 polygons as data over the full scaled lineitem table: bbox-
    # bucket blocking (broadcast cell table), row-local ray-cast fold,
    # <=100-key count — must scale in points, never points x polygons.
    return QUERIES["x205_point_in_any_polygon"](spark, d)


def _x206_exists_semi_anti(spark, d):
    # correlated EXISTS/NOT EXISTS over the scaled facts: Catalyst's
    # decorrelation -> one LeftSemi + one LeftAnti on orderkey, the
    # date window pruning orders first; both fact sides x100 — the
    # honest fact-fact shuffle band (cf. x193/x204).
    ensure_scale_tpch(spark, d, 100 if "x100" in d else (10 if "x10" in d else 1))
    return QUERIES["x206_returned_orders_exists"](spark, d)


def _x207_stats_gate(spark, d):
    # the accuracy gate: exact stats agg (with the multi-distinct
    # Expand — the truth side) + the Expand-free HLL pass, cross-joined
    # 1-row x 1-row.  Expect ~x190's exact band; the deployable approx
    # form is the separate x190_column_stats_approx entry.
    return QUERIES["x207_column_stats_approx_gate"](spark, d)


def _x208_null_aware_notin(spark, d):
    # the deliberate broadcast cliff, priced: the null-aware anti join
    # must broadcast the 1995 order-key set (x100 here); past the
    # broadcast threshold Spark falls back to BNLJ — the docstring
    # routes provably-non-null keys to x206's shuffle-able NOT EXISTS.
    ensure_scale_tpch(spark, d, 100 if "x100" in d else (10 if "x10" in d else 1))
    return QUERIES["x208_unmatched_customers_notin"](spark, d)


def _x209_dpp(spark, d):
    # dynamic partition pruning over the engine-written date-partitioned
    # fact (events x100 -> ~60M-row fact, one-time ensure_index write
    # absorbed by min-of-2): the dim's runtime date set prunes the scan
    # to ~9/30 partitions — expect well under the full-scan envelope.
    return QUERIES["x209_dynamic_partition_pruning"](spark, d)


def _x210_evolved_landing(spark, d):
    # pinned-schema read over the two-generation evolved landing (built
    # once per scale dir by the query's ensure_index guard, absorbed by
    # the warm run): a multi-path scan with per-file projection + one
    # 5-group map-side-combined agg — expect the scan-bound flat band;
    # the point is that NO footer sweep appears at any corpus size.
    return QUERIES["x210_evolved_landing_stats"](spark, d)


def _x211_registered_landing(spark, d):
    # registry-served two-generation landing (register/land/evolve built
    # once per scale dir by ensure_index, absorbed by the warm run): one
    # text GET for _schema/current + the pinned multi-path scan + a
    # 3-group map-side-combined agg — expect x210's scan-bound flat
    # band; the catalog adds nothing per-row.
    return QUERIES["x211_registered_landing_serve"](spark, d)


def _x212_compacted_cms(spark, d):
    # heavy-hitter probe over the COMPACTED cms store (land/fold/land/
    # replay built once per scale dir): the serve folds <= depth*width
    # counter rows regardless of corpus size, the exact-count side is
    # one map-side-combined key shuffle — expect the count shuffle to
    # dominate, counters O(1).
    return QUERIES["x212_compacted_cms_serve"](spark, d)


def _x213_outage_day_compacted(spark, d):
    # per-day outage audit from the day-compacted id-exact segment
    # store (time-sliced landings + compaction built once per scale
    # dir): the serve chains O(non-empty shards) segment rows — KB-scale
    # state independent of corpus rows — expect flat.
    return QUERIES["x213_outage_day_compaction"](spark, d)


def _x214_streamed_ingest(spark, d):
    # per-vehicle audit over the STREAM-BUILT warehouse (two-landing
    # checkpointed availableNow ingest built once per scale dir,
    # absorbed by the warm run): the serve is one broadcast fact⋈dim
    # join + a 97-key map-side-combined agg over the landed crumbs —
    # expect linear-ish in corpus rows (the crumb scan), no state term.
    return QUERIES["x214_streamed_ingest_serve"](spark, d)


def _x215_compacted_funnel(spark, d):
    # stage histogram over the COMPACTED funnel store (land x3/compact/
    # replay built once per scale dir): the serve min-folds
    # O(users) x 3 epoch-µs rows from consolidated ∪ tail — state
    # scales with USERS, not events — then a 4-bucket agg; expect the
    # x212 band (small key shuffle dominates, store O(1) dirs).
    return QUERIES["x215_compacted_funnel_serve"](spark, d)


def _x216_recompacted_cms(spark, d):
    # x212's probe served through the TWICE-compacted store: the gen-2
    # consolidated counters are the same <= depth*width rows as gen-1 —
    # re-compaction must add NOTHING to the serve cost at any scale
    # (the exact-count shuffle is the only O(rows) term).
    return QUERIES["x216_recompacted_cms_serve"](spark, d)


def _x217_version_pinned(spark, d):
    # per-column profile at pinned schema v1 over the registered
    # landing (shared store with x211, built once): one text GET + the
    # pruned two-column scan + a single-row agg + stack — expect
    # x211's scan-bound flat band; time travel is a projection, so the
    # pin must cost nothing vs the current-pointer serve.
    return QUERIES["x217_registered_version_pinned_serve"](spark, d)


def _x199_point_in_polygon(spark, d):
    # integer ray casting over the full scaled lineitem table: a
    # shuffle-free codegen scan + a <=3-group fold — flat band.
    return QUERIES["x199_point_in_polygon"](spark, d)


def _x200_grid_density(spark, d):
    # 3x3 stencil density: 9x map-side fan-out absorbed by the partial
    # agg; shuffle = one row per live cell per task — flat band.
    return QUERIES["x200_grid_density"](spark, d)


def _x201_nearest_station(spark, d):
    # constant-folded nearest-facility assignment: shuffle-free argmin
    # projection + an 8-group fold — flat band.
    return QUERIES["x201_nearest_station"](spark, d)


def _x198_k_anonymity(spark, d):
    # quasi-identifier class audit over the full scaled documents
    # table: one class-keyed count shuffle + a 4-field fold — flat band.
    return QUERIES["x198_k_anonymity"](spark, d)


def _x195_transitions(spark, d):
    # Markov bigrams over the full scaled events table: one user-keyed
    # sequence window + a <=|types|^2 count — the window shuffle band.
    return QUERIES["x195_event_transitions"](spark, d)


def _x196_trend(spark, d):
    # per-key OLS over daily counts: one (key, day) count shuffle +
    # one key agg of five integer sums — the x183/x191 band.
    return QUERIES["x196_trend_slope"](spark, d)


def _x197_ref_audit(spark, d):
    # four anti-joins over the scaled facts (dims fixed): lineitem ->
    # orders is the one fact-fact check, rest broadcast.
    ensure_scale_tpch(spark, d, 100 if "x100" in d else (10 if "x10" in d else 1))
    return QUERIES["x197_referential_audit"](spark, d)


def _x192_funnel(spark, d):
    # strict-order funnel over the full scaled events table: one
    # map-side-combined groupBy(user) with three conditional MINs —
    # expect the scan-bound flat band.
    return QUERIES["x192_event_funnel"](spark, d)


def _x191_burst(spark, d):
    # per-key burst scan over the full scaled events table: one
    # (key, day) count shuffle + one key-partitioned window over the
    # count table — expect the x183 scan-bound band.
    return QUERIES["x191_burst_detection"](spark, d)


def _x190_column_stats(spark, d):
    # ANALYZE pass over the full scaled events table: one scan, the
    # multi-distinct Expand, exact NDVs (event_id NDV = row count, the
    # worst case — at x100 that is a genuine 60M-distinct shuffle).
    return QUERIES["x190_column_stats"](spark, d)


def _x189_rollup(spark, d):
    # grouping-sets datasheet over the full scaled documents table:
    # one scan, map-side Expand (x|sets| fan-out compressed by the
    # partial agg), one exchange — expect the scan-bound flat band.
    return QUERIES["x189_rollup_datasheet"](spark, d)


def _x187_hll_registers(spark, d):
    # HLL registers over the full scaled events table: one scan with a
    # map-side partial MAX — 256 rows per task on the wire, no distinct
    # shuffle at any corpus size.  Expect the scan-bound flat band.
    from trimet_bytes__data_engineering_project_spark.operators.sketch import (
        hll_registers,
    )
    from trimet_bytes__data_engineering_project_spark.plans.tables import load_table

    return hll_registers(load_table(spark, d, "events"), "user_id", p=8)


def _x186_store_probe_10pct(spark, d):
    # x186's lifecycle pair at scale: the accumulated signature store
    # (90% of blobs, prebuilt once per scale dir) is touched only
    # through its band index; the timed work is signaturing the 10%
    # batch + the bucket join — the _x49 protocol for blobs.
    import math

    from trimet_bytes__data_engineering_project_spark.operators.ann_index import (
        ensure_index,
    )
    from trimet_bytes__data_engineering_project_spark.operators.multimodal import (
        blob_bands,
        blob_simhash,
        blob_store_probe,
        media_from_documents,
    )

    docs = spark.read.parquet(f"{d}/documents.parquet")
    n = docs.count()
    w = min(15, max(8, int(math.log2(max(1, n // 25)))))
    media = media_from_documents(docs).select("media_id", "payload")
    old = media.filter(F.pmod(F.col("media_id"), F.lit(10)) != 0)
    new = media.filter(F.pmod(F.col("media_id"), F.lit(10)) == 0)
    path = os.path.join(_SCALE_ROOT, "blob_store", os.path.basename(d.rstrip("/")))
    ensure_index(
        lambda: blob_bands(blob_simhash(old, bits=4 * w), 4 * w)
        .repartition("band_val").write.mode("overwrite").parquet(path),
        path,
    )
    store = spark.read.parquet(path)
    dups, _ = blob_store_probe(new, store, bits=4 * w)
    return dups


def _x186_blob_near_dup(spark, d):
    # multimodal byte near-dup over the full scaled documents-as-blobs
    # table: the signature pass is row-local md5 folds (linear, no
    # shuffle); the band join obeys the blocking-key rule — band width
    # sized so expected bucket population stays ~25 (w = lg(n/25), the
    # LSH plane rule's shape), so the pair join never degenerates.
    import math

    from trimet_bytes__data_engineering_project_spark.operators.multimodal import (
        blob_near_dup,
        media_from_documents,
    )

    docs = spark.read.parquet(f"{d}/documents.parquet")
    n = docs.count()
    w = min(15, max(8, int(math.log2(max(1, n // 25)))))
    return blob_near_dup(media_from_documents(docs), bits=4 * w, n_bands=4)


def _x184_lsh_compaction(spark, d):
    # the LSH compaction JOB at scale: generations land once per scale
    # dir (ensure marker); the timed work is merge + re-signature at
    # the corpus-sized plane count + rewrite — one linear signature
    # pass, the build band (the re-bucketing the blocking-key rule
    # demands, measured as the nightly job it is).
    from trimet_bytes__data_engineering_project_spark.operators.ann_index import (
        compact_lsh_index,
        ensure_index,
    )
    from trimet_bytes__data_engineering_project_spark.operators.similarity import (
        as_double_vec,
        hyperplanes,
        l2_norm,
        lsh_bucket,
    )

    emb = spark.read.parquet(f"{d}/embeddings.parquet")
    root = os.path.join(_SCALE_ROOT, "lsh_lsm", os.path.basename(d.rstrip("/")))
    seg, comp = os.path.join(root, "segmented"), os.path.join(root, "compacted")

    def land() -> None:
        planes = hyperplanes(4, 64)
        for gen, par in ((0, 0), (1, 1)):
            v = as_double_vec("embedding")
            (
                emb.filter(F.col("vec_id") % 2 == par)
                .withColumn("bucket", lsh_bucket(v, planes))
                .withColumn("norm", l2_norm(v))
                .repartition(F.col("bucket"))
                .write.mode("overwrite")
                .partitionBy("bucket")
                .parquet(os.path.join(seg, f"batch_id={gen}"))
            )

    ensure_index(land, os.path.join(seg, "batch_id=1"))
    compact_lsh_index(spark, seg, comp, 64)  # corpus-sized plane count
    return spark.read.parquet(comp).groupBy().agg(F.count("*").alias("n"))


def _x179_padding_waste(spark, d):
    # whole-corpus padding-tax audit: one bucket-keyed shuffle, per-
    # bucket sorts, two map-side-combined aggs, <=max_len/64-row output
    # — expect the x148/x172 cheap band (near-linear in the token-count
    # projection).
    return QUERIES["x179_padding_waste_audit"](spark, d)


def _x180_ivf_compaction(spark, d):
    # the compaction JOB itself at scale (a nightly build, not a probe):
    # two bootstrap-quantized generations land once per scale dir
    # (ensure marker), and the timed work is merge + re-derived
    # sqrt(n/2) quantizer + re-assignment + rewrite — one linear
    # assignment pass over the corpus, so expect the dedup/build band
    # (~linear envelope, the honest cost of the nightly job).
    import math

    from trimet_bytes__data_engineering_project_spark.operators.ann_index import (
        _centroids_path,
        compact_ivf_index,
        ensure_index,
        land_ivf_batch,
    )
    from trimet_bytes__data_engineering_project_spark.operators.similarity import (
        as_double_vec,
    )

    emb = spark.read.parquet(f"{d}/embeddings.parquet")
    root = os.path.join(_SCALE_ROOT, "ivf_lsm", os.path.basename(d.rstrip("/")))
    seg, comp = os.path.join(root, "segmented"), os.path.join(root, "compacted")

    def land() -> None:
        gen0 = emb.filter(F.col("vec_id") % 2 == 0)
        boot = (
            gen0.orderBy("vec_id")
            .limit(16)
            .select(
                F.col("vec_id").alias("centroid_id"),
                as_double_vec("embedding").alias("cvec"),
            )
        )
        boot.write.mode("overwrite").parquet(_centroids_path(seg))
        land_ivf_batch(gen0, boot, seg, 0)
        land_ivf_batch(emb.filter(F.col("vec_id") % 2 == 1), boot, seg, 1)

    ensure_index(land, os.path.join(seg, "batch_id=1"))
    n_c = max(16, math.isqrt(emb.count() // 2))
    compact_ivf_index(spark, seg, comp, n_centroids=n_c)
    return spark.read.parquet(comp).groupBy().agg(F.count("*").alias("n"))


def _x140_retention(spark, d):
    # cohort retention over the full scaled events table: one distinct
    # (user, week) shuffle, a user-keyed min-agg reusing the same key,
    # and a (cohort, offset)-keyed cell agg — events text/properties
    # never leave the scan, so cost tracks the distinct pass (expect
    # the x63 sessionize band).
    from trimet_bytes__data_engineering_project_spark.plans.tables import epoch_us

    ev = load_table(spark, d, "events")
    u = (
        ev.withColumn("us", epoch_us(F.col("ts")))
        .selectExpr("user_id", "us div 604800000000 as wk")
        .distinct()
    )
    c = u.groupBy("user_id").agg(F.min("wk").cast("long").alias("cohort_wk"))
    r = (
        u.join(c, "user_id")
        .groupBy(
            "cohort_wk",
            (F.col("wk") - F.col("cohort_wk")).cast("long").alias("weeks_since"),
        )
        .agg(F.count_distinct("user_id").cast("long").alias("n_users"))
    )
    return r.agg(F.count("*").alias("n_cells"), F.sum("n_users").alias("s"))


HEAVY = [
    ("q27_pricing_summary", _q27),
    ("minhash_near_dup_pairs_full", _minhash_pairs),
    ("ngram_jaccard_pairs_full", _jaccard_pairs),
    ("embedding_near_dup_lsh_full", _embedding_near_dup),
    ("x21_ann_ivf_index_probe", _x21),
    ("x39_line_dedup", _x39),
    ("x40_tfidf_top_terms", _x40),
    ("x47_hashed_linear_score_full", _x47_scorer),
    ("x49_incremental_probe_10pct", _x49_probe),
    ("x50_doc_chunking_full", _x50_chunks),
    ("x51_unigram_surprisal_full", _x51),
    ("x52_bloom_decontamination_full", _x52_bloom),
    ("x53_random_projection_full", _x53_rp),
    ("x58_knn_join_full", _x58_knn),
    ("x89_knn_index_serve_128q", _x89_knn_index_serve),
    ("x90_ivf_knn_serve_128q", _x90_ivf_knn_serve),
    ("x91_quantized_knn_serve_128q", _x91_quantized_knn_serve),
    ("x96_quantized_ivf_serve_128q", _x96_quantized_ivf_serve),
    ("x97_snapshot_refresh_500d", _x97_snapshot_refresh),
    ("x102_bm25_serve_128q", _x102_bm25_serve),
    ("x102_bm25_serve_fixedq_128q", _x102_bm25_serve_fixedq),
    ("x105_pq_adc_probe", _x105_pq_probe),
    ("x107_ivfpq_probe", _x107_ivfpq_probe),
    ("x111_ivfpq_residual_probe", _x111_ivfpq_residual_probe),
    ("x113_collocations", _x113_collocations),
    ("x115_prf_serve_128q", _x115_prf_serve),
    ("x116_compaction", _x116_compaction),
    ("x117_snippet_serve_128q", _x117_snippet_serve),
    ("x118_opq_probe", _x118_opq_probe),
    ("x119_diversified_serve_128q", _x119_diversified_serve),
    ("x120_bm25f_inflight_128q", _x120_bm25f_inflight),
    ("x121_prefix_probe_16q", _x121_prefix_probe),
    ("x122_hamming_probe_16q", _x122_hamming_probe),
    ("x123_hard_negatives_16q", _x123_hard_negatives),
    ("x125_pagerank_full", _x125_pagerank),
    ("x126_bpe_learn_full", _x126_bpe_learn),
    ("x126_bpe_learn_incr_full", _x126_bpe_learn_incr),
    ("x128_mmr_16q", _x128_mmr),
    ("x130_power_iteration_full", _x130_power_iteration),
    ("x136_snapshot_diff_full", _x136_snapshot_diff),
    ("x139_grouped_quantiles_full", _x139_grouped_quantiles),
    ("x110_phrase_serve", _x110_phrase_serve),
    ("x101_bm25_inflight_128q", _x101_bm25_inflight),
    ("x59_knn_multiprobe_full", _x59_knn_multiprobe),
    ("x60_recall_audit_full", _x60_recall_audit),
    ("x72_exact_top_terms_full", _x72_exact_top_terms),
    ("x79_sketch_top_terms_full", _x79_sketch_top_terms),
    ("x80_bigram_surprisal_full", _x80_bigram_surprisal),
    ("x81_pps_sample_full", _x81_pps_sample),
    ("x54_pipeline_full", _x54_pipeline),
    ("x63_sessions_full", _x63_sessions),
    ("x62_merge_upsert_full", _x62_merge_upsert),
    ("x82_trigram_backoff_10pct", _x82_trigram_backoff_10pct),
    ("x95_kneser_ney_10pct", _x95_kneser_ney_10pct),
    ("x98_modified_kn_10pct", _x98_modified_kn_10pct),
    ("x99_trigram_kn_10pct", _x99_trigram_kn_10pct),
    ("x99_trigram_kn_snapshot_10pct", _x99_trigram_kn_snapshot),
    ("x82_trigram_backoff_snapshot_10pct", _x82_trigram_backoff_snapshot),
    ("x83_span_dedup_full", _x83_span_dedup),
    ("x85_tfidf_snapshot_10pct", _x85_tfidf_snapshot_10pct),
    ("x86_surprisal_snapshot_10pct", _x86_surprisal_snapshot_10pct),
    ("x140_retention_full", _x140_retention),
    ("x141_weighted_pagerank_full", _x141_weighted_pagerank),
    ("x142_hits_full", _x142_hits),
    ("x143_importance_weights_full", _x143_importance_weights),
    ("x146_triangles_full", _x146_triangles),
    ("x147_winnow_full", _x147_winnow),
    ("x148_gopher_full", _x148_gopher),
    ("x149_lang_reid_full", _x149_lang_reid),
    ("t4_stream_rollup_full", _t4_stream_rollup),
    ("ss_join_stream_full", _ss_join_stream),
    ("cc_distributed_full", _cc_distributed),
]



# --- round-7 session-5 entries ---------------------------------------------


def _x144_label_prop(spark, d):
    # label spreading over the FULL near-dup graph (no id cap): pair
    # generation is the cc_distributed band; each round adds one
    # id-keyed join + one (node, label) agg + an argmax window over the
    # VOTE table (<< corpus) — expect the LSH-pair band.
    from trimet_bytes__data_engineering_project_spark.operators.dedup import (
        minhash_candidates,
        minhash_estimate,
    )
    from trimet_bytes__data_engineering_project_spark.operators.graph import (
        propagate_labels,
    )

    docs = spark.read.parquet(f"{d}/documents.parquet")
    pairs = (
        minhash_candidates(docs)
        .withColumn("est_sim", minhash_estimate(F.col("a_sig"), F.col("b_sig")))
        .filter(F.col("est_sim") >= 0.25)
        .select("a_id", "b_id")
    )
    edges = pairs.select(
        F.col("a_id").alias("src"), F.col("b_id").alias("dst")
    ).unionByName(pairs.select(F.col("b_id").alias("src"), F.col("a_id").alias("dst")))
    seeds = docs.filter(F.col("doc_id") % 5 == 0).select(
        F.col("doc_id").alias("node_id"),
        (F.col("doc_id") % 7).cast("int").alias("label"),
    )
    return propagate_labels(edges, seeds, iters=2).agg(
        F.count("*").alias("n"), F.sum("label").alias("s")
    )


def _x145_ccnet(spark, d):
    # full-corpus surprisal scorer + one per-lang rank window; the
    # window shuffles by lang (few keys) but sorting is distributed —
    # expect the x51_unigram_full band (the snapshot-mode contrast is
    # x86's row).
    return QUERIES["x145_ccnet_buckets"](spark, d).groupBy("lang", "bucket").count()


def _x151_cluster_split(spark, d):
    # cluster-aware split at full scale: components over the banded
    # pair graph (cc band) + coalesce(component, id) hash split + the
    # 9-cell leakage matrix — everything after the pair graph is an
    # id-keyed join and a tiny agg.
    from trimet_bytes__data_engineering_project_spark.operators.dedup import (
        minhash_candidates,
        minhash_estimate,
    )
    from trimet_bytes__data_engineering_project_spark.operators.graph import (
        connected_components,
    )
    from trimet_bytes__data_engineering_project_spark.operators.sampling import (
        train_val_test_split,
    )

    docs = spark.read.parquet(f"{d}/documents.parquet")
    pairs = (
        minhash_candidates(docs)
        .withColumn("est_sim", minhash_estimate(F.col("a_sig"), F.col("b_sig")))
        .filter(F.col("est_sim") >= 0.25)
        .select("a_id", "b_id")
    )
    comp = connected_components(pairs)
    keyed = docs.join(
        comp.select(F.col("node").alias("doc_id"), "cluster_id"), "doc_id", "left"
    ).select(
        "doc_id", F.coalesce(F.col("cluster_id"), F.col("doc_id")).alias("skey")
    )
    sp = train_val_test_split(keyed, "skey").select("doc_id", "split")
    a = sp.select(F.col("doc_id").alias("a_id"), F.col("split").alias("sa"))
    b = sp.select(F.col("doc_id").alias("b_id"), F.col("split").alias("sb"))
    return pairs.join(a, "a_id").join(b, "b_id").groupBy("sa", "sb").count()


def _x154_dup_ngram(spark, d):
    # the Gopher repetition rules over the full corpus: two (doc, gram)
    # hash aggs (2- and 5-gram char masses) — the heaviest pure-text
    # stats row; expect the explode-band (x32/x40 class).
    return QUERIES["x154_dup_ngram_stats"](spark, d).agg(
        F.count("*").alias("n"),
        F.sum("r_top").alias("rt"),
        F.sum("r_dup").alias("rd"),
    )


def _x155_dsir_snapshot(spark, d):
    # DSIR snapshot-probe lifecycle: the 256-row ratio profile is
    # prebuilt once per scale dir (ensure_index marker, _x49 protocol);
    # the timed work is the 10% batch's token agg against the broadcast
    # grid — expect the x85/x86 snapshot band (near-flat in the corpus,
    # linear in the batch).
    from trimet_bytes__data_engineering_project_spark.operators.ann_index import (
        ensure_index,
    )
    from trimet_bytes__data_engineering_project_spark.operators.textstats import (
        hashed_importance_weights,
        importance_ratio_table,
    )

    docs = spark.read.parquet(f"{d}/documents.parquet")
    base = docs.filter(F.pmod(F.col("doc_id"), F.lit(10)) != 0)
    batch = docs.filter(F.pmod(F.col("doc_id"), F.lit(10)) == 0)
    path = os.path.join(_SCALE_ROOT, "dsir_snapshot", os.path.basename(d.rstrip("/")))
    ensure_index(
        lambda: importance_ratio_table(base, base.filter(F.col("lang") == "en"))
        .write.mode("overwrite")
        .parquet(path),
        path,
    )
    out = hashed_importance_weights(batch, ratios=spark.read.parquet(path))
    return out.agg(F.count("*").alias("n"), F.sum("affinity_sum").alias("a"))


def _x157_semdedup(spark, d):
    # SemDeDup pass with the compute-optimal centroid count: total fold
    # work n·c + Σm²/2 ≈ n·c + n²/(2c) is minimized at c = √(n/2), so
    # the centroid count grows with √corpus (the LSH plane-count rule's
    # square-root sibling).  Centroids are the deterministic
    # first-c-by-id table: this row measures the DEDUP pass (assignment
    # + within-cluster pairs); quantizer TRAINING cost is x27's row.
    import math

    from trimet_bytes__data_engineering_project_spark.operators.similarity import (
        as_double_vec,
        semantic_dedup,
    )

    emb = spark.read.parquet(f"{d}/embeddings.parquet")
    n = emb.count()
    n_c = max(16, math.isqrt(n // 2))
    cents = (
        emb.orderBy("vec_id")
        .limit(n_c)
        .select(
            F.col("vec_id").alias("centroid_id"),
            as_double_vec("embedding").alias("cvec"),
        )
    )
    return semantic_dedup(emb, cents, tau=0.35).agg(
        F.count("*").alias("n"), F.sum("is_dup").alias("dups")
    )


def _x158_perceptron(spark, d):
    # classifier training: the tf table builds once (checkpointed);
    # each of the 3 epochs is one broadcast-weights margin agg + one
    # bucket-sum update — expect ~linear in corpus tokens.
    from trimet_bytes__data_engineering_project_spark.operators.classifier import (
        perceptron_train,
    )

    docs = spark.read.parquet(f"{d}/documents.parquet")
    return perceptron_train(docs, F.col("lang") == "en").agg(
        F.count("*").alias("n"), F.sum("w3").alias("s")
    )


def _x159_chunk_spans(spark, d):
    # two-level prefix sum: a per-bucket window + a bucket-table window
    # + one broadcast join — expect near-flat (the x139/x148 class; the
    # only corpus-sized exchange is the bucket partition shuffle).
    from trimet_bytes__data_engineering_project_spark.operators.sampling import (
        concat_chunk_spans,
    )
    from trimet_bytes__data_engineering_project_spark.operators.textstats import (
        token_count_col,
    )

    docs = spark.read.parquet(f"{d}/documents.parquet")
    withn = docs.select(
        "doc_id", token_count_col(F.col("text")).cast("long").alias("n_tok")
    )
    out = concat_chunk_spans(withn, "doc_id", "n_tok", context_len=64)
    return out.agg(
        F.count("*").alias("n"),
        F.sum("crosses").alias("x"),
        F.max("last_chunk").alias("m"),
    )


def _x160_pii(spark, d):
    # five regexp_extract_all + five regexp_replace per doc, all in the
    # scan's project: the row measures raw regex-engine throughput —
    # expect near-flat-to-linear with zero shuffle beyond the one agg.
    from trimet_bytes__data_engineering_project_spark.operators.textstats import (
        pii_scan,
    )

    docs = spark.read.parquet(f"{d}/documents.parquet")
    return pii_scan(docs).agg(
        F.count("*").alias("n"),
        F.sum("n_email").alias("e"),
        F.sum("chars_delta").alias("dl"),
    )


def _x161_vocab_growth(spark, d):
    # one explode feeding a term-keyed min-agg (the only
    # vocabulary-sized table) and a bucket-keyed count — the md5
    # replica text makes the type table grow ~linearly, so this is the
    # worst case for the min-agg; expect the x40 explode band.
    from trimet_bytes__data_engineering_project_spark.operators.textstats import (
        vocab_growth_curve,
    )

    docs = spark.read.parquet(f"{d}/documents.parquet")
    return vocab_growth_curve(docs)



def _x163_chunk_dedup(spark, d):
    # x159's offset pass + ONE linear shuffle of the token stream keyed
    # on window id (contents must meet once to digest), per-group state
    # bounded by the context length; the histogram aggregates the
    # DIGEST table only — expect linear-ish (the token-shuffle floor,
    # heavier than x159's (id, n) shuffle by the text payload).
    from trimet_bytes__data_engineering_project_spark.operators.dedup import (
        chunk_dedup_stats,
    )

    docs = spark.read.parquet(f"{d}/documents.parquet")
    return chunk_dedup_stats(docs, context_len=16)



def _x167_semdedup_hier(spark, d):
    # the x157 remedy measured: same compute-optimal c = sqrt(n/2)
    # centroid count and tau, but assignment runs two-level (fanout
    # sqrt(c)) — ~2n*sqrt(c) folds instead of n*c, so the curve should
    # collapse from x157's ~n^1.5 (40.9x) toward the pair-stage floor.
    import math

    from trimet_bytes__data_engineering_project_spark.operators.ann_index import (
        assign_to_centroids_hier,
    )
    from trimet_bytes__data_engineering_project_spark.operators.similarity import (
        as_double_vec,
        semantic_dedup,
    )

    emb = spark.read.parquet(f"{d}/embeddings.parquet")
    n = emb.count()
    n_c = max(16, math.isqrt(n // 2))
    cents = (
        emb.orderBy("vec_id")
        .limit(n_c)
        .select(
            F.col("vec_id").alias("centroid_id"),
            as_double_vec("embedding").alias("cvec"),
        )
    )
    assigned = assign_to_centroids_hier(emb, cents, "embedding")
    return semantic_dedup(emb, None, tau=0.35, assigned=assigned).agg(
        F.count("*").alias("n"), F.sum("is_dup").alias("dups")
    )



def _x168_semdedup_from_index(spark, d):
    # the winning remedy measured: the IVF index (ensure_index marker,
    # one-time build per scale dir with the same c = sqrt(n/2) count)
    # already persists the assignment, so the warm runs time the
    # PAIRS-ONLY dedup pass — expect roughly the pair-stage share of
    # x157's 43.8 s.
    import math

    from trimet_bytes__data_engineering_project_spark.operators.ann_index import (
        ensure_index,
        write_ivf_index,
    )
    from trimet_bytes__data_engineering_project_spark.operators.similarity import (
        semantic_dedup,
    )

    emb = spark.read.parquet(f"{d}/embeddings.parquet")
    n = emb.count()
    n_c = max(16, math.isqrt(n // 2))
    path = os.path.join(_SCALE_ROOT, "semdedup_ivf", os.path.basename(d.rstrip("/")))
    ensure_index(
        lambda: write_ivf_index(emb, path, n_centroids=n_c), path
    )
    assigned = spark.read.parquet(path)
    return semantic_dedup(emb, None, tau=0.35, assigned=assigned).agg(
        F.count("*").alias("n"), F.sum("is_dup").alias("dups")
    )


def _x171_calibration(spark, d):
    # calibration audit at full scale: the x158 training band (tf build
    # dominates, checkpointed once) + one margins agg over the test
    # split + a <=128-row bucket agg — expect the x158/x169 band.
    from trimet_bytes__data_engineering_project_spark.operators.classifier import (
        perceptron_margins,
        perceptron_train,
    )
    from trimet_bytes__data_engineering_project_spark.operators.sampling import (
        train_val_test_split,
    )

    docs = spark.read.parquet(f"{d}/documents.parquet")
    sp = train_val_test_split(docs, "doc_id")
    pos = F.col("lang") == "en"
    w = perceptron_train(sp.filter(F.col("split") == "train"), pos)
    final = w.select("b", F.col("w3").alias("w"))
    m = perceptron_margins(sp.filter(F.col("split") == "test"), final, pos)
    octave = (
        F.length(F.conv((F.abs(F.col("margin")) + 1).cast("string"), 10, 2)) - 1
    ).cast("long")
    mbucket = F.when(F.col("margin") > 0, octave).otherwise(-octave)
    ok = ((F.col("y") == 1) == (F.col("margin") > 0)).cast("long")
    return (
        m.select(mbucket.alias("mb"), ok.alias("ok"))
        .groupBy("mb")
        .agg(F.count("*").alias("n"), F.sum("ok").alias("k"))
    )


def _x172_concentration(spark, d):
    # composition concentration: two scans, each collapsing to a
    # <=|groups|-row agg with a window over the GROUP table — expect
    # the cheapest (scan-bound, near-flat) band.
    return QUERIES["x172_composition_concentration"](spark, d)


def _x173_debias_served(spark, d):
    # the de-bias serve twin: spectral rounds + cleaned-index build are
    # one-time (ensure_index marker, excluded by the warm run); the
    # timed work is a FIXED ~128-query probe of the cleaned inverted
    # lists (serving batches do not grow with the corpus) — expect the
    # x90 IVF-serve band.
    import math

    from trimet_bytes__data_engineering_project_spark.operators.ann_index import (
        ensure_index,
        ivf_knn_join,
        write_ivf_index,
    )
    from trimet_bytes__data_engineering_project_spark.operators.spectral import (
        power_iteration_top_component,
        remove_top_component,
    )

    emb = spark.read.parquet(f"{d}/embeddings.parquet")
    n = emb.count()
    n_c = max(16, math.isqrt(n // 2))
    path = os.path.join(_SCALE_ROOT, "debias_ivf_sv16", os.path.basename(d.rstrip("/")))

    def build():
        comp = power_iteration_top_component(emb, iters=3)
        write_ivf_index(remove_top_component(emb, comp), path, n_centroids=n_c)

    ensure_index(build, path)
    modulus = max(50, n // 128)
    q = spark.read.parquet(path).filter(F.pmod(F.col("vec_id"), F.lit(modulus)) == 0)
    sl = ivf_knn_join(spark, q, path, k=4, nprobe=1).filter(
        F.col("c_id") != F.col("q_id")
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("q_id").orderBy(F.desc_nulls_last("cos_sim"), F.asc("c_id"))
    return (
        sl.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .agg(F.count("*").alias("n"), F.sum("rn").alias("s"))
    )


def _x137_mrr_served(spark, d):
    # the round-8 served form in its AT-SCALE regime: a FIXED ~128-query
    # eval workload (benchmark sets do not grow with the corpus — the
    # registered query's %50 modulus is an sf0.1 fixture convention,
    # and letting it scale makes the "eval" a 10K-query corpus crawl)
    # served off the persisted inverted index — expect the x102 band.
    import os as _os

    from trimet_bytes__data_engineering_project_spark.operators.ann_index import (
        ensure_index,
    )
    from trimet_bytes__data_engineering_project_spark.operators.retrieval import (
        bm25_serve,
        retrieval_metrics,
        top_terms_from_index,
        write_inverted_index,
    )
    from trimet_bytes__data_engineering_project_spark.plans.extensions import (
        _SCRATCH,
        _tagged_dir,
    )

    docs = spark.read.parquet(f"{d}/documents.parquet")
    n = docs.count()
    modulus = max(50, n // 128)
    path = _os.path.join(
        _tagged_dir(_SCRATCH, "bm25_index", "v2", sf_dir=d), "full"
    )
    ensure_index(
        lambda: write_inverted_index(docs, path), _os.path.join(path, "stats")
    )
    queries = top_terms_from_index(
        spark, path, F.pmod(F.col("doc_id"), F.lit(modulus)) == 0, n_terms=3
    )
    run = bm25_serve(spark, queries, path, k=5).select("query_id", "doc_id", "rank")
    qrels = queries.select("query_id", F.col("query_id").alias("doc_id")).distinct()
    return retrieval_metrics(run, qrels, k=5)


def _x166_leakage_served(spark, d):
    # leakage matrix over the persisted IVF assignment: pairs-only
    # (the x168 shape — SAME c = sqrt(n/2) sizing; the registered
    # query's fixed 16 centroids are an oracle-size convention that
    # becomes a Σm² bomb at 200 K vectors) + two id joins + a 9-cell
    # agg — expect the x168 curve.
    import math

    from trimet_bytes__data_engineering_project_spark.operators.ann_index import (
        ensure_index,
        write_ivf_index,
    )
    from trimet_bytes__data_engineering_project_spark.operators.sampling import (
        train_val_test_split,
    )
    from trimet_bytes__data_engineering_project_spark.operators.similarity import (
        semantic_pairs,
    )

    emb = spark.read.parquet(f"{d}/embeddings.parquet")
    n = emb.count()
    n_c = max(16, math.isqrt(n // 2))
    path = os.path.join(_SCALE_ROOT, "semdedup_ivf", os.path.basename(d.rstrip("/")))
    ensure_index(lambda: write_ivf_index(emb, path, n_centroids=n_c), path)
    pairs = semantic_pairs(emb, None, tau=0.35, assigned=spark.read.parquet(path))
    sp = train_val_test_split(emb.select("vec_id"), "vec_id").select(
        "vec_id", "split"
    )
    a = sp.select(F.col("vec_id").alias("a_id"), F.col("split").alias("split_a"))
    b = sp.select(F.col("vec_id").alias("b_id"), F.col("split").alias("split_b"))
    return (
        pairs.join(a, "a_id")
        .join(b, "b_id")
        .groupBy("split_a", "split_b")
        .agg(F.count("*").alias("n_pairs"))
    )


HEAVY += [
    ("x144_label_prop_full", _x144_label_prop),
    ("x145_ccnet_terciles_full", _x145_ccnet),
    ("x151_cluster_split_full", _x151_cluster_split),
    ("x154_dup_ngram_full", _x154_dup_ngram),
    ("x155_dsir_snapshot_10pct", _x155_dsir_snapshot),
    ("x157_semdedup_full", _x157_semdedup),
    ("x158_perceptron_full", _x158_perceptron),
    ("x159_chunk_spans_full", _x159_chunk_spans),
    ("x160_pii_scan_full", _x160_pii),
    ("x161_vocab_growth_full", _x161_vocab_growth),
    ("x163_chunk_dedup_full", _x163_chunk_dedup),
    ("x167_semdedup_hier_full", _x167_semdedup_hier),
    ("x168_semdedup_from_index_full", _x168_semdedup_from_index),
    ("x170_lang_snapshot_10pct", _x170_lang_snapshot),
    ("x174_label_impact_10pct", _x174_label_impact),
    ("x14_media_features_full", _x14_media_features),
    ("x175_frame_manifest_full", _x175_frame_manifest),
    ("x176_ivf_health_full", _x176_ivf_health),
    ("x177_embedding_drift_full", _x177_drift),
    ("x178_passage_retrieval_128q", _x178_passage_retrieval),
    ("x179_padding_waste_full", _x179_padding_waste),
    ("x180_ivf_compaction_job", _x180_ivf_compaction),
    ("x181_passage_serve_128q", _x181_passage_serve),
    ("x182_vector_hygiene_full", _x182_vector_hygiene),
    ("x183_heavy_keys_full", _x183_heavy_keys),
    ("x184_lsh_compaction_job", _x184_lsh_compaction),
    ("x185_cms_sketch_full", _x185_cms_sketch),
    ("x186_blob_near_dup_full", _x186_blob_near_dup),
    ("x186_store_probe_10pct", _x186_store_probe_10pct),
    ("x187_hll_registers_full", _x187_hll_registers),
    ("x189_rollup_datasheet_full", _x189_rollup),
    ("x190_column_stats_full", _x190_column_stats),
    ("x191_burst_detection_full", _x191_burst),
    ("x192_event_funnel_full", _x192_funnel),
    ("x193_supplier_volume_full", _x193_supplier_volume),
    ("x195_transitions_full", _x195_transitions),
    ("x198_k_anonymity_full", _x198_k_anonymity),
    ("x199_point_in_polygon_full", _x199_point_in_polygon),
    ("x202_feed_outage_full", _x202_feed_outage),
    ("x203_salted_join_full", _x203_salted_join),
    ("x190_column_stats_approx", _x190_column_stats_approx),
    ("x204_q18_full", _x204_q18),
    ("x205_point_in_any_full", _x205_point_in_any),
    ("x206_exists_semi_anti_full", _x206_exists_semi_anti),
    ("x207_stats_gate_full", _x207_stats_gate),
    ("x208_null_aware_notin_full", _x208_null_aware_notin),
    ("x209_dpp_full", _x209_dpp),
    ("x210_evolved_landing_full", _x210_evolved_landing),
    ("x211_registered_landing_full", _x211_registered_landing),
    ("x212_compacted_cms_full", _x212_compacted_cms),
    ("x213_outage_day_full", _x213_outage_day_compacted),
    ("x214_streamed_ingest_full", _x214_streamed_ingest),
    ("x215_compacted_funnel_full", _x215_compacted_funnel),
    ("x216_recompacted_cms_full", _x216_recompacted_cms),
    ("x217_version_pinned_full", _x217_version_pinned),
    ("x200_grid_density_full", _x200_grid_density),
    ("x201_nearest_station_full", _x201_nearest_station),
    ("x196_trend_slope_full", _x196_trend),
    ("x197_ref_audit_full", _x197_ref_audit),
    ("x194_shipping_priority_full", _x194_shipping_priority),
    ("x188_incremental_cc_store", _x188_incremental_cc),
    ("x188_cc_full_recompute", _x188_full_recompute),
    ("x126_bpe_incr_zipf", _x126_bpe_incr_zipf),
    ("x126_bpe_full_zipf", _x126_bpe_full_zipf),
    ("x171_calibration_full", _x171_calibration),
    ("x172_concentration_full", _x172_concentration),
    ("x137_mrr_served", _x137_mrr_served),
    ("x166_leakage_served", _x166_leakage_served),
    ("x173_debias_knn_served", _x173_debias_served),
]


def _union_all(frames):
    return reduce(lambda a, b: a.unionByName(b), frames)


def build_scale_tables(spark, copies: int, rebuild: bool = False) -> str:
    scale_dir = os.path.join(_SCALE_ROOT, f"x{copies}")
    marker = os.path.join(scale_dir, "_BUILT")
    if os.path.exists(marker) and not rebuild:
        return scale_dir
    shutil.rmtree(scale_dir, ignore_errors=True)
    os.makedirs(scale_dir, exist_ok=True)
    n_out = 32 if copies <= 10 else 128

    docs = spark.read.parquet(f"{SF01}/documents.parquet")
    doc_copies = [docs]
    for c in range(1, copies):
        # fresh pseudo-random text per copy (8 md5 hex words keyed by
        # (doc_id, copy)): realistic "more documents", not Nx dup sets
        words = [
            F.md5(F.concat_ws("-", F.col("doc_id").cast("string"), F.lit(c), F.lit(i)))
            for i in range(8)
        ]
        doc_copies.append(
            docs.select(
                (F.col("doc_id") + c * _ID_STRIDE).alias("doc_id"),
                F.concat_ws(" ", *words).alias("text"),
                "lang",
                "source",
                "n_chars",
            )
        )
    _union_all(doc_copies).repartition(n_out).write.mode("overwrite").parquet(
        f"{scale_dir}/documents.parquet"
    )

    emb = spark.read.parquet(f"{SF01}/embeddings.parquet")
    emb_copies = [emb]
    for c in range(1, copies):
        # per-(copy, dim) deterministic sign flips decorrelate each copy
        # from the original (cosine ~ 0) while keeping norms identical
        flipped = F.transform(
            "embedding",
            lambda x, i: x
            * F.when(F.pmod(F.hash(F.col("vec_id"), i, F.lit(c)), F.lit(2)) == 0, 1.0).otherwise(
                -1.0
            ),
        ).cast("array<float>")
        emb_copies.append(
            emb.select(
                (F.col("vec_id") + c * _ID_STRIDE).alias("vec_id"),
                flipped.alias("embedding"),
                "label",
            )
        )
    _union_all(emb_copies).repartition(n_out).write.mode("overwrite").parquet(
        f"{scale_dir}/embeddings.parquet"
    )

    li = spark.read.parquet(f"{SF01}/lineitem.parquet")
    li_copies = [li] + [
        li.withColumn("l_orderkey", F.col("l_orderkey") + c * _ID_STRIDE)
        for c in range(1, copies)
    ]
    _union_all(li_copies).repartition(n_out).write.mode("overwrite").parquet(
        f"{scale_dir}/lineitem.parquet"
    )

    with open(marker, "w"):
        pass
    return scale_dir


def time_query(spark, fn, sf_dir: str, runs: int = 2) -> float:
    fn(spark, sf_dir).collect()  # warm: index builds, JVM init
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn(spark, sf_dir).collect()
        best = min(best, time.perf_counter() - t0)
    return round(best, 4)


def main() -> None:
    spark = get_session("trimet-scale-bench")
    spark.sparkContext.setLogLevel("ERROR")
    rebuild = "--rebuild" in sys.argv
    only = None
    for i, a in enumerate(sys.argv):
        if a == "--only":
            only = set(sys.argv[i + 1].split(","))
    dirs = {1: SF01}
    for copies in STEPS:
        dirs[copies] = build_scale_tables(spark, copies, rebuild=rebuild)
        ensure_scale_events(spark, dirs[copies], copies)

    out: dict[str, dict[str, float]] = {}
    for name, fn in HEAVY:
        if only and name not in only:
            continue
        times = {}
        for c, d in dirs.items():
            times[f"x{c}_sec"] = time_query(spark, fn, d)
            print(f"# {name} x{c}: {times[f'x{c}_sec']} s", flush=True)
        times["time_ratio_at_100x_rows"] = round(times["x100_sec"] / times["x1_sec"], 2)
        out[name] = times
        print(json.dumps({name: times}), flush=True)

    print(json.dumps({"metric": "scale_step_heavy_queries", "steps": list(dirs), "results": out}))
    spark.stop()


if __name__ == "__main__":
    main()
