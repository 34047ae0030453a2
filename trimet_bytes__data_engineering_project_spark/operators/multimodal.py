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


def blob_simhash(
    media: DataFrame,
    gram: int = 8,
    stride: int = 4,
    bits: int = 32,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """Codec-free fuzzy fingerprint over the raw BYTES of a blob — the
    multimodal near-dup signal that needs NO decoder (the ssdeep/TLSH
    family's approach): overlapping ``gram``-byte shingles taken every
    ``stride`` bytes, one md5 per shingle, SimHash sign-fold into a
    ``bits``-bit integer.  Byte-identical blobs collide exactly; blobs
    sharing most byte runs (re-chunked uploads, metadata-stamped
    re-saves, prefix-trimmed copies) land within a small Hamming
    radius, because each shared shingle pushes every bit the same way.

    Scale shape: the x09 ``simhashes`` shape — explode shingle OFFSETS
    (the blob itself never duplicates across the wire: the md5 digit
    stream is projected in the SAME stage and the payload column is
    pruned before any exchange), then ``bits`` conditional sums under
    one map-side-combined groupBy, so the shuffle carries ``bits``
    small integers per blob.  Everything is whole-stage codegen — a
    first cut used row-local ``aggregate``/``zip_with`` higher-order
    folds (zero shuffle) and measured ~6× slower at sf0.1: interpreted
    per-element lambdas lose to codegen'd hash aggregation even paying
    for the exchange.  ``bits`` plays the blocking-key role downstream
    and must grow with the corpus like LSH plane counts do
    (BENCH_NOTES: blocking-key cardinality scales with the corpus);
    beyond 32 bits (one md5's 32 hex digits) the digit stream extends
    by digest CHAINING — ``md5(slice) || md5(md5(slice)) || …`` — so
    any ``bits ≤ 63`` costs ⌈bits/32⌉ cheap md5s per shingle and stays
    engine-portable (md5 of a hex STRING is the same everywhere)."""
    from .dedup import _bit_col, ensure_parallelism

    if not 1 <= bits <= 63:
        raise ValueError("bits must be in [1, 63] (sign-free long)")
    digit_stream = f"md5(substring({payload_col}, i, {gram}))"
    chained = digit_stream
    for _ in range((bits + 31) // 32 - 1):
        chained = f"md5({chained})"
        digit_stream = f"concat({digit_stream}, {chained})"
    n_sh = f"greatest(octet_length({payload_col}) - {gram} + 1, 1)"
    # a single input file must not serialize the md5 folds onto one
    # core (the shingle work is ~len/stride hashes per blob — the
    # expensive stage): same contract as dedup.simhashes
    media = ensure_parallelism(media)
    ex = media.select(
        F.col(id_col),
        F.expr(f"explode(sequence(1, {n_sh}, {stride}))").alias("i"),
        F.col(payload_col),
    ).select(F.col(id_col), F.expr(digit_stream).alias("h"))
    agg = ex.groupBy(id_col).agg(
        *[F.sum(_bit_col(F.col("h"), j)).alias(f"b{j}") for j in range(bits)]
    )
    sig = F.lit(0).cast("long")
    for j in range(bits):
        sig = sig + F.when(
            F.col(f"b{j}") > 0, F.lit(1 << j).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return agg.select(F.col(id_col), sig.alias("blob_sig"))


def _hamming(a: str, b: str, bits: int) -> F.Column:
    """Popcount of a XOR b as an explicit per-bit sum — portable to any
    engine (no bit_count builtin divergence)."""
    x = f"({a} ^ {b})"
    return sum(
        F.expr(f"CAST(({x} DIV {1 << j}) % 2 AS INT)") for j in range(bits)
    ).alias("hamming")


def blob_near_dup(
    media: DataFrame,
    gram: int = 8,
    stride: int = 4,
    bits: int = 32,
    n_bands: int = 4,
    radius: int = 3,
    max_bucket: int = 50,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """Blob near-duplicate pairs without decoding a single byte:
    :func:`blob_simhash` signatures, banded into ``n_bands`` bit slices
    (a pair within Hamming radius r < n_bands must agree on ≥1 band —
    the pigeonhole guarantee SimHash banding shares with MinHash LSH),
    bucket-local self-join on (band_idx, band_val), then the exact
    Hamming verify on the full signature.

    Scale shape: ONE shuffle on (band_idx, band_val); buckets larger
    than ``max_bucket`` are dropped before the pair join (the dedup
    tier's degenerate-bucket cap — an all-zeros-payload pileup cannot
    own the stage); the verify is a row-local popcount on the joined
    pairs, never a second corpus pass."""
    w = bits // n_bands
    sig = blob_simhash(media, gram, stride, bits, payload_col, id_col)
    bands = sig.select(
        F.col(id_col),
        "blob_sig",
        F.posexplode(
            F.array(
                *[
                    F.expr(f"CAST((blob_sig DIV {1 << (b * w)}) % {1 << w} AS INT)")
                    for b in range(n_bands)
                ]
            )
        ).alias("band_idx", "band_val"),
    # three consumers (bucket sizes, a-side, b-side) would re-run the
    # whole signature scan three times — the type-table finding; the
    # 4·|blobs|-row band table is checkpointed once instead
    ).localCheckpoint(eager=False)
    ok = (
        bands.groupBy("band_idx", "band_val")
        .count()
        .filter(F.col("count") <= max_bucket)
        .select("band_idx", "band_val")
    )
    bands = bands.join(ok, ["band_idx", "band_val"])
    a = bands.select(
        "band_idx", "band_val",
        F.col(id_col).alias("a_id"), F.col("blob_sig").alias("a_sig"),
    )
    b = bands.select(
        "band_idx", "band_val",
        F.col(id_col).alias("b_id"), F.col("blob_sig").alias("b_sig"),
    )
    pairs = (
        a.join(b, ["band_idx", "band_val"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", "a_sig", "b_sig")
        .distinct()
    )
    return (
        pairs.withColumn("hamming", _hamming("a_sig", "b_sig", bits))
        .filter(F.col("hamming") <= radius)
        .select("a_id", "b_id", "hamming")
    )


def blob_bands(
    sig_df: DataFrame, bits: int = 32, n_bands: int = 4
) -> DataFrame:
    """(media_id, blob_sig, band_idx, band_val) — the band table both
    the batch near-dup join and the incremental store keep."""
    w = bits // n_bands
    return sig_df.select(
        "media_id",
        "blob_sig",
        F.posexplode(
            F.array(
                *[
                    F.expr(f"CAST((blob_sig DIV {1 << (b * w)}) % {1 << w} AS INT)")
                    for b in range(n_bands)
                ]
            )
        ).alias("band_idx", "band_val"),
    )


def blob_store_probe(
    new_media: DataFrame,
    store: DataFrame | None,
    bits: int = 32,
    n_bands: int = 4,
    radius: int = 3,
    max_bucket: int = 50,
) -> "tuple[DataFrame, DataFrame]":
    """The incremental blob-dedup core (x186's lifecycle pair; the
    streaming wrapper in streaming/multimodal.py delegates here):
    signature the NEW blobs once, band-join them against the
    accumulated ``store`` band table plus themselves (higher id = the
    duplicate intra-batch), Hamming-verify on the full signature.
    Returns (dups, new_bands) — the findings and the band rows the
    caller appends to the store.  The degenerate-bucket cap is computed
    over store ∪ batch, so a bucket that grew hot across generations is
    capped exactly as a batch build would cap it.  Per call the work is
    O(batch signatures + probed buckets): the accumulated corpus is
    touched only through its band index, never re-signatured."""
    bands = blob_bands(blob_simhash(new_media, bits=bits), bits, n_bands)
    universe = bands if store is None else bands.unionByName(
        store.select("media_id", "blob_sig", "band_idx", "band_val")
    )
    ok = (
        universe.groupBy("band_idx", "band_val")
        .count()
        .filter(F.col("count") <= max_bucket)
        .select("band_idx", "band_val")
    )

    def side(df: DataFrame, tag: str) -> DataFrame:
        return df.join(ok, ["band_idx", "band_val"]).select(
            "band_idx", "band_val",
            F.col("media_id").alias(f"{tag}_id"),
            F.col("blob_sig").alias(f"{tag}_sig"),
        )

    new_a = side(bands, "new")
    cands = new_a.join(side(bands, "old"), ["band_idx", "band_val"]).filter(
        F.col("new_id") > F.col("old_id")
    )
    if store is not None:
        # new_id != old_id: under at-least-once delivery the same
        # media_id can arrive again in a LATER batch_id — without the
        # guard it band-matches its own stored signature at Hamming 0
        # and reports itself as its own duplicate.
        cands = cands.unionByName(
            new_a.join(side(store, "old"), ["band_idx", "band_val"]).filter(
                F.col("new_id") != F.col("old_id")
            )
        )
    dups = (
        cands.select("new_id", "old_id", "new_sig", "old_sig")
        .distinct()
        .withColumn("hamming", _hamming("new_sig", "old_sig", bits))
        .filter(F.col("hamming") <= radius)
        .select("new_id", F.col("old_id").alias("dup_of"), "hamming")
    )
    return dups, bands
