"""Document deduplication operators (north-star extension): exact,
MinHash+LSH, SimHash, n-gram Jaccard.

Scale design: every candidate-generation step is a *bucketed equi-join*
(band hash, simhash band, label) — never an O(n²) cross join.  Oversized
buckets (degenerate hash collisions / boilerplate docs) are capped and
the cap is part of the operator contract, mirrored in the oracles.

All hashing is md5-based and engine-portable: a MinHash element is the
lexicographic min of fixed-width hex digests, which equals the numeric
min — so Spark and DuckDB agree byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MINHASH_K = 8
BAND_ROWS = 2  # 4 bands × 2 rows
MAX_BUCKET = 50  # LSH bucket cap (skew control, part of the contract)


def tokens(text: Column) -> Column:
    """Lowercased whitespace tokens."""
    return F.split(F.lower(F.trim(text)), r"\s+")


def shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles.  Pure array exprs (sequence →
    slice → array_join) — stays in codegen, no UDF.

    Guarded for short docs: Spark's ``sequence(1, 0)`` yields a
    *descending* [1, 0], not empty, so docs with < n tokens must map to
    an explicit empty array."""
    toks = tokens(text)
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(grams)


def minhash_signature(shingle_col: Column, k: int = MINHASH_K) -> Column:
    """k-element MinHash signature: element i = min over shingles of
    md5(i:shingle) (first 15 hex chars; fixed width ⇒ string min ≡
    numeric min).  Empty shingle set → array of NULLs."""
    def hasher(i: int):
        # closure factory, not a default-arg lambda: PySpark infers the
        # HOF arity from the Python signature, so extra params break it
        return lambda s: F.substring(F.md5(F.concat(F.lit(f"{i}:"), s)), 1, 15)

    return F.array(*[F.array_min(F.transform(shingle_col, hasher(i))) for i in range(k)])


def band_hashes(sig: Column, band_rows: int = BAND_ROWS, k: int = MINHASH_K) -> list[Column]:
    """LSH bands: hash of each consecutive ``band_rows`` signature slice."""
    return [
        F.md5(F.concat_ws("|", F.slice(sig, b * band_rows + 1, band_rows))).alias(f"band_{b}")
        for b in range(k // band_rows)
    ]


def minhash_candidates(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """MinHash-LSH candidate pairs: explode (band_idx, band_hash), join
    within buckets, cap oversized buckets.

    One shuffle on (band_idx, band_hash); the pair join is bucket-local.
    Returns (a_id, b_id, a_sig, b_sig) for downstream verification."""
    sig = minhash_signature(shingles(F.col(text_col)))
    with_sig = docs.select(F.col(id_col).alias("doc_id"), sig.alias("sig"))

    bands = with_sig.select(
        "doc_id",
        "sig",
        F.posexplode(F.array(*band_hashes(F.col("sig")))).alias("band_idx", "band_hash"),
    )
    # cap degenerate buckets (boilerplate/empty docs all colliding)
    bucket_sizes = bands.groupBy("band_idx", "band_hash").count()
    bands = bands.join(
        bucket_sizes.filter(F.col("count") <= MAX_BUCKET).select("band_idx", "band_hash"),
        ["band_idx", "band_hash"],
    )
    a = bands.select(
        "band_idx", "band_hash", F.col("doc_id").alias("a_id"), F.col("sig").alias("a_sig")
    )
    b = bands.select(
        "band_idx", "band_hash", F.col("doc_id").alias("b_id"), F.col("sig").alias("b_sig")
    )
    return (
        a.join(b, ["band_idx", "band_hash"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", "a_sig", "b_sig")
        .distinct()
    )


def minhash_estimate(a_sig: Column, b_sig: Column, k: int = MINHASH_K) -> Column:
    """Estimated Jaccard = fraction of matching signature elements."""
    matches = F.aggregate(
        F.zip_with(a_sig, b_sig, lambda x, y: F.when(x == y, 1).otherwise(0)),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return matches.cast("double") / F.lit(float(k))


def exact_jaccard(a_shingles: Column, b_shingles: Column) -> Column:
    """Exact Jaccard over distinct shingle sets (verification step for
    LSH candidates)."""
    inter = F.size(F.array_intersect(a_shingles, b_shingles))
    union = F.size(F.array_union(a_shingles, b_shingles))
    return inter.cast("double") / F.nullif(union, F.lit(0))


SIMHASH_BITS = 16


def simhash(text: Column, bits: int = SIMHASH_BITS) -> Column:
    """SimHash: signature bit j is the sign of Σ over distinct tokens of
    ±1, where the per-token bit is the high bit of md5(j:token)'s first
    hex digit (an engine-portable hash family: '8' ≤ digit ≤ 'f' ⇔ 1).
    ``bits`` conditional array-fold sums — pure codegen, one pass, and
    byte-for-byte reproducible in the DuckDB oracle."""
    toks = F.array_distinct(tokens(text))

    def bit_merge(j: int):
        return lambda acc, t: acc + F.when(
            F.substring(F.md5(F.concat(F.lit(f"{j}:"), t)), 1, 1) >= "8", 1
        ).otherwise(-1)

    out = F.lit(0).cast("long")
    for j in range(bits):
        bit_sum = F.aggregate(toks, F.lit(0), bit_merge(j))
        out = out + F.when(bit_sum > 0, F.lit(1 << j).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return out
