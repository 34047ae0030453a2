"""Multimodal frame-sampling manifest (deterministic fake decode, real
Spark plumbing).

Split from ``plans/extensions.py`` at the round-14 close (r13 verdict
item 8) — code moved VERBATIM; the aggregator re-exports every name, so
``plans.extensions.<name>`` remains the stable public path."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from ..registry import query
from ..tables import load_table
from ...operators.multimodal import media_from_documents

# ---------------------------------------------------------------------------
# Multimodal tier, round 9 (r8 verdict item 6): the frame-sampling
# fan-out as a first-class oracle-gated query — x14 checked the 1:1
# feature projection; this checks the 1→N table-generating path.
# ---------------------------------------------------------------------------

_X175_ORACLE = """
    WITH m AS (SELECT doc_id AS media_id, text, strlen(text) AS L
               FROM documents),
    p AS (SELECT media_id, text, L,
                 least(4, greatest(1, L // 64)) AS n
          FROM m),
    s AS (SELECT media_id, text, L, n,
                 CASE WHEN n > 1 THEN greatest(1, (L - 64) // (n - 1))
                      ELSE 1 END AS step
          FROM p),
    fr AS (SELECT media_id, text, step,
                  CAST(unnest(range(n)) AS INT) AS frame_idx
           FROM s)
    SELECT media_id, frame_idx,
           CAST(strlen(substr(text, CAST(frame_idx * step AS INT) + 1, 64))
                AS BIGINT) AS frame_len,
           sha256(substr(text, CAST(frame_idx * step AS INT) + 1, 64))
               AS frame_sha,
           false AS decoded
    FROM fr
"""


@query("x175_frame_sample_manifest", oracle=_X175_ORACLE)
def x175_frame_sample_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-frame sampling manifest over opaque media blobs: each blob
    explodes into ≤4 evenly-spaced frames EXECUTOR-SIDE inside one
    Arrow-batched mapInPandas boundary (``sample_frames`` — the one
    genuinely table-generating multimodal op; frame rows never transit
    the driver), and the manifest projects per-frame length + sha256 —
    the dedup/audit key a frame store needs before any training-data
    join.  The codec is the deterministic byte-slice stub (decode libs
    absent by brief; ``decoded=false`` lands honestly), so the oracle
    can model the SAME slicing in SQL and the gate checks the real
    fan-out path bit-for-bit: stub frame boundaries, 1→N batch shape,
    binary→digest round-trip (operators/multimodal.py:sample_frames).
    Scale shape: one blob scan, no shuffle — rows stream out at
    ~n_blobs·4; the sha is computed where the bytes already are."""
    from ...operators.multimodal import media_from_documents, sample_frames

    docs = load_table(spark, sf_dir, "documents")
    frames = sample_frames(media_from_documents(docs), max_frames=4)
    return frames.select(
        "media_id",
        F.col("frame_idx").cast("int").alias("frame_idx"),
        F.octet_length("frame_bytes").cast("long").alias("frame_len"),
        F.sha2("frame_bytes", 256).alias("frame_sha"),
        "decoded",
    )


