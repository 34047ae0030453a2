"""Multimodal plumbing: binary media columns with typed metadata through
Arrow-batched feature extraction.

Split from ``plans/extensions.py`` at the round-14 close (r13 verdict
item 8) — code moved VERBATIM; the aggregator re-exports every name, so
``plans.extensions.<name>`` remains the stable public path."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from ..registry import query
from ..tables import load_table
from ...operators.multimodal import extract_features, media_from_documents

# ---------------------------------------------------------------------------
# Multimodal plumbing
# ---------------------------------------------------------------------------


@query(
    "x14_multimodal_features",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(strlen(text) AS BIGINT) AS byte_len,
           CASE WHEN length(text) = 0 THEN -1 ELSE unicode(text) END AS first_codepoint,
           sha256(text) AS sha256_hex,
           false AS decoded
    FROM documents
    """,
)
def x14_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal binary plumbing: documents → fake media blobs (utf-8
    payload, typed metadata) → Arrow-batched mapInPandas feature
    extraction (byte length, first codepoint, sha256, decode status).
    The codec is stubbed (no image libs in container); the Spark-side
    schema/batching/UDF machinery is real and oracle-checked."""
    docs = load_table(spark, sf_dir, "documents")
    media = media_from_documents(docs)
    return extract_features(media)


