"""Multimodal column plumbing (north-star extension).

Image/audio/video are opaque ``BINARY`` columns with a typed metadata
struct.  The Spark-side machinery — schema, partition-friendly layout,
Arrow-batched Pandas-UDF feature extraction over ``mapInPandas`` — is
real and tested; the actual codec step is stubbed (decode libraries are
not in this container) behind ``try``-imports with a deterministic
fallback, exactly as the repo brief prescribes.

At 100 TB: blobs live in their own column chunk (parquet column
pruning means metadata-only queries never touch the bytes), feature
extraction streams per-partition Arrow batches through one Python
worker per core, and the output is a narrow numeric table.
"""

from __future__ import annotations

import hashlib
import sys
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("n_bytes", T.LongType()),
                    T.StructField("declared_format", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("byte_len", T.LongType()),
        T.StructField("first_codepoint", T.IntegerType()),
        T.StructField("sha256_hex", T.StringType()),
        T.StructField("decoded", T.BooleanType()),
    ]
)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic fake media table: each document's utf-8 bytes stand
    in for an encoded blob (schema/partitioning identical to the real
    thing)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("media_type"),
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.octet_length("text").cast("long").alias("n_bytes"),
            F.lit("fake/utf8").alias("declared_format"),
        ).alias("meta"),
    )


def _decode_stub(payload: bytes) -> bool:
    """The codec step.  Real decoders (PIL / soundfile / av) are gated
    behind imports; absent here, so this returns False ('not decoded')
    deterministically rather than synthesizing fake pixels."""
    try:  # pragma: no cover - library not present in this container
        from PIL import Image  # noqa: F401
        import io

        Image.open(io.BytesIO(payload))
        return True
    except Exception:
        return False


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over mapInPandas: byte length,
    first code point, content digest, decode status.  One Python
    boundary for the whole batch, never per-row."""
    from ..sources.readers import _pickle_module_by_value

    _pickle_module_by_value(__name__)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "byte_len": payloads.map(len).astype("int64"),
                    "first_codepoint": payloads.map(
                        lambda b: ord(bytes(b).decode("utf-8", "replace")[0]) if len(b) else -1
                    ).astype("int32"),
                    "sha256_hex": payloads.map(lambda b: hashlib.sha256(bytes(b)).hexdigest()),
                    "decoded": payloads.map(lambda b: _decode_stub(bytes(b))),
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType()),
        T.StructField("target_w", T.IntegerType()),
        T.StructField("target_h", T.IntegerType()),
        T.StructField("resized", T.BooleanType()),
    ]
)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize over mapInPandas — 1:1 row mapping, blob in / blob
    out.  The decode-resize-reencode core is gated behind a PIL
    try-import (absent in this container): the stub passes the payload
    through unchanged with ``resized=False``, so the Spark-side
    contract (schema, Arrow batch shape, binary round-trip) is real and
    tested while the codec is not faked."""
    from ..sources.readers import _pickle_module_by_value

    _pickle_module_by_value(__name__)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def _resize(b: bytes) -> tuple[bytes, bool]:
            try:  # pragma: no cover - library not present in this container
                import io

                from PIL import Image

                img = Image.open(io.BytesIO(bytes(b)))
                fmt = img.format or "PNG"  # resize() drops .format — capture first
                out = io.BytesIO()
                img.resize((width, height)).save(out, format=fmt)
                return out.getvalue(), True
            except Exception:
                return bytes(b), False

        for pdf in batches:
            pairs = pdf["payload"].map(_resize)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": pairs.map(lambda p: p[0]),
                    "target_w": width,
                    "target_h": height,
                    "resized": pairs.map(lambda p: p[1]),
                }
            )

    return media.mapInPandas(run, schema=RESIZED_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_bytes", T.BinaryType()),
        T.StructField("decoded", T.BooleanType()),
    ]
)

_STUB_FRAME_SIZE = 64


def _stub_frames(raw: bytes, max_frames: int) -> list[bytes]:
    """Deterministic stand-in frames: ≤ ``max_frames`` evenly-spaced
    fixed-width byte slices of the payload (``decoded=False``
    downstream) — exercises exactly the 1→N batch shape the real codec
    produces, without faking pixels."""
    n = min(max_frames, max(1, len(raw) // _STUB_FRAME_SIZE))
    step = max(1, (len(raw) - _STUB_FRAME_SIZE) // max(1, n - 1)) if n > 1 else 1
    return [raw[i * step : i * step + _STUB_FRAME_SIZE] for i in range(n)]


def _sample_frame_bytes(raw: bytes, max_frames: int) -> tuple[list[bytes], bool]:
    """(frames, decoded) for one blob.  The real decoder (``av``) is
    gated behind a try-import; any failure of the real path — the
    library being absent, a not-yet-implemented branch, or a payload
    the codec rejects — falls through to the deterministic stub so the
    operator degrades instead of crashing."""
    try:
        import av
        import io

        frames: list[bytes] = []
        with av.open(io.BytesIO(raw)) as container:  # pragma: no cover - av absent here
            stream = container.streams.video[0]
            total = stream.frames or 0
            want = (
                set(range(max_frames))
                if total <= max_frames
                else {i * (total - 1) // max(1, max_frames - 1) for i in range(max_frames)}
            )
            for i, frame in enumerate(container.decode(stream)):
                if i in want:
                    frames.append(frame.to_ndarray(format="rgb24").tobytes())
                if len(frames) >= max_frames:
                    break
        if not frames:
            raise ValueError("no decodable video frames")
        return frames, True
    except Exception:
        return _stub_frames(raw, max_frames), False


def sample_frames(media: DataFrame, max_frames: int = 4) -> DataFrame:
    """Video frame sampling — the one genuinely table-generating
    multimodal op: each blob row explodes into ≤ ``max_frames`` frame
    rows via :func:`_sample_frame_bytes` (real ``av`` decode when the
    library is importable, deterministic byte-slice stub otherwise —
    the fallback also catches decode failures, so a present-but-broken
    codec degrades instead of crashing the operator).

    At 100 TB the fan-out happens executor-side inside mapInPandas (no
    explode of a collected array column), so frame rows never transit
    the driver and downstream repartitioning sees a plain long table."""
    from ..sources.readers import _pickle_module_by_value

    _pickle_module_by_value(__name__)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames, decs = [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                frs, decoded = _sample_frame_bytes(bytes(payload), max_frames)
                for i, fr in enumerate(frs):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(fr)
                    decs.append(decoded)
            yield pd.DataFrame(
                {
                    "media_id": pd.array(ids, dtype="int64"),
                    "frame_idx": pd.array(idxs, dtype="int32"),
                    "frame_bytes": frames,
                    "decoded": pd.array(decs, dtype="bool"),
                }
            )

    return media.mapInPandas(run, schema=FRAME_SCHEMA)
