"""Scale extensions — the training-data-pipeline operators (BASELINE.json
north star): dedup, text analysis, similarity search over the driver's
``documents``/``embeddings`` tables.  Beyond the reference's surface;
designed for the 100 TB path (hash-partitioned group-bys, band-bucketed
candidate generation instead of O(n²) cross joins, broadcast of the
single query vector).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.textstats import quality_stats, token_count_col
from .registry import query
from .tables import load_table


@query(
    "x01_exact_dedup",
    oracle="""
    SELECT md5(text) AS text_hash, min(doc_id) AS keep_id, count(*) AS n_copies
    FROM documents GROUP BY 1
    """,
)
def x01_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup — content-hash groupBy keeping the lowest doc_id.
    One shuffle on the 128-bit digest; at 100 TB the digest (not the
    document body) is the shuffle key, so skew tracks true duplicate
    multiplicity only."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy(F.md5("text").alias("text_hash"))
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("n_copies"))
    )


@query(
    "x02_token_count",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split_regex(trim(text), '\\s+')) AS INT) AS n_tokens,
           length(text) AS n_chars_measured
    FROM documents
    """,
)
def x02_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting — whitespace tokenizer as a native split (no UDF);
    the BPE-ish regex variant lives in operators/textstats.py."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        token_count_col(F.col("text")).alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars_measured"),
    )


@query(
    "x03_quality_stats",
    oracle="""
    SELECT doc_id,
           length(text) AS n_chars_measured,
           length(text) - length(regexp_replace(text, '[aeiou]', '', 'g')) AS n_vowels,
           length(text) - length(regexp_replace(text, '[ ]', '', 'g')) AS n_spaces,
           CAST(len(string_split_regex(trim(text), '\\s+')) AS INT) AS n_tokens,
           CAST(length(text) AS DOUBLE)
             / CAST(len(string_split_regex(trim(text), '\\s+')) AS INT) AS avg_token_len
    FROM documents
    """,
)
def x03_quality_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring — length/char-class/token-shape signals, all
    integer counts + one IEEE division (hash-stable across engines)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", *quality_stats(F.col("text")))
