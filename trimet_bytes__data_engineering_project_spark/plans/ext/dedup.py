"""Deduplication tier: exact, MinHash-LSH, n-gram Jaccard, SimHash,
embedding-cosine near-dup.

Split from ``plans/extensions.py`` at the round-14 close (r13 verdict
item 8) — code moved VERBATIM; the aggregator re-exports every name, so
``plans.extensions.<name>`` remains the stable public path."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from ..registry import query
from ..tables import load_table
from ...operators.dedup import (
    MINHASH_K,
    SIMHASH_BITS,
    exact_jaccard,
    minhash_candidates,
    minhash_estimate,
    minhash_signatures,
    shingles,
    simhashes,
)
from ...operators.similarity import embedding_near_dup_pairs
from .fragments import (
    _CAND_CTES,
    _MATCHES,
    _SHINGLES,
    _SIG_ELEMS,
    _TOKS,
    _VEC,
    _cos_sql,
)

# ---------------------------------------------------------------------------
# Deduplication
# ---------------------------------------------------------------------------


@query(
    "x01_exact_dedup",
    oracle="""
    SELECT md5(text) AS text_hash, min(doc_id) AS keep_id, count(*) AS n_copies
    FROM documents GROUP BY 1
    """,
)
def x01_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup — content-hash groupBy keeping the lowest doc_id.
    The 128-bit digest (not the body) is the shuffle key, so at 100 TB
    skew tracks true duplicate multiplicity only."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy(F.md5("text").alias("text_hash")).agg(
        F.min("doc_id").alias("keep_id"), F.count("*").alias("n_copies")
    )


@query(
    "x06_minhash_signature",
    oracle=f"""
    WITH sh AS (SELECT doc_id, {_SHINGLES} AS s FROM documents)
    SELECT doc_id, array_to_string([{_SIG_ELEMS}], '|') AS sig_str
    FROM sh WHERE len(s) > 0
    """,
)
def x06_minhash_signature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures (k=8, single md5 digest per shingle sliced into
    the hash family): explode → codegen md5 → map-side-combined min-agg;
    the signature column is what gets banded/bucketed at scale."""
    docs = load_table(spark, sf_dir, "documents")
    return minhash_signatures(docs).select(
        "doc_id", F.concat_ws("|", "sig").alias("sig_str")
    )


@query(
    "x07_minhash_near_dup_pairs",
    oracle=f"""
    WITH {_CAND_CTES}
    SELECT a_id, b_id, {_MATCHES} / {float(MINHASH_K)} AS est_sim
    FROM cands WHERE {_MATCHES} / {float(MINHASH_K)} >= 0.25
    """,
)
def x07_minhash_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup pairs: shingle → signature → band-bucket
    equi-join (never O(n²)), oversized buckets capped at 50, estimated
    Jaccard = matching signature fraction ≥ 0.25."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 1000)
    cands = minhash_candidates(docs)
    est = minhash_estimate(F.col("a_sig"), F.col("b_sig"))
    return (
        cands.withColumn("est_sim", est)
        .filter(F.col("est_sim") >= 0.25)
        .select("a_id", "b_id", "est_sim")
    )


@query(
    "x08_ngram_jaccard_pairs",
    oracle=f"""
    WITH {_CAND_CTES}
    SELECT a_id, b_id, jaccard FROM (
      SELECT c.a_id, c.b_id,
             len(list_intersect(sa.s, sb.s))
               / CAST(len(list_distinct(list_concat(sa.s, sb.s))) AS DOUBLE) AS jaccard
      FROM cands c
      JOIN sh sa ON sa.doc_id = c.a_id
      JOIN sh sb ON sb.doc_id = c.b_id
    ) WHERE jaccard >= 0.2
    """,
)
def x08_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard verification of the LSH candidates (the
    verify step of the dedup pipeline): intersection/union over distinct
    3-gram shingle sets, threshold 0.2."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 1000)
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


def _simhash_sql(bits: int = SIMHASH_BITS) -> str:
    terms = []
    for j in range(bits):
        bit_sum = (
            "list_reduce(list_prepend(0, list_transform(toks, "
            f"t -> CASE WHEN substr(md5(t), {j + 1}, 1) >= '8' THEN 1 ELSE -1 END)), "
            "(acc, x) -> acc + x)"
        )
        terms.append(f"CASE WHEN {bit_sum} > 0 THEN CAST({1 << j} AS BIGINT) ELSE 0 END")
    return " + ".join(terms)


@query(
    "x09_simhash",
    oracle=f"""
    WITH tok AS (SELECT doc_id, list_distinct({_TOKS}) AS toks FROM documents WHERE doc_id < 1000)
    SELECT doc_id, {_simhash_sql()} AS simhash FROM tok
    """,
)
def x09_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash (16-bit, one md5 digest per token serving all bit
    positions): near-dup fingerprint whose Hamming-distance bands bucket
    at scale the same way MinHash bands do."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 1000)
    return simhashes(docs)


@query(
    "x13_embedding_near_dup",
    oracle=f"""
    WITH e AS (SELECT vec_id, label, {_VEC} AS v FROM embeddings WHERE vec_id < 1000)
    SELECT a.vec_id AS a_id, b.vec_id AS b_id, {_cos_sql('a.v', 'b.v')} AS cos_sim
    FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE {_cos_sql('a.v', 'b.v')} >= 0.35
    """,
)
def x13_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs, blocked by label (the cluster
    key is the shuffle key — no O(n²) cross join at scale)."""
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 1000)
    return embedding_near_dup_pairs(emb, threshold=0.35)


