"""Document deduplication operators (north-star extension): exact,
MinHash+LSH, SimHash, n-gram Jaccard.

Scale design: every candidate-generation step is a *bucketed equi-join*
(band hash, simhash band, label) — never an O(n²) cross join.  Oversized
buckets (degenerate hash collisions / boilerplate docs) are capped and
the cap is part of the operator contract, mirrored in the oracles.

Hashing is md5-based and engine-portable, and deliberately *single-digest*:
each shingle/token is hashed ONCE and the k hash-family members are
fixed-width hex slices of that one digest.  A MinHash element is then the
lexicographic min of a fixed-width hex slice, which equals the numeric
min — so Spark and DuckDB agree byte-for-byte.

Execution shape: the hot path is ``explode → md5 → groupBy(min…)`` —
whole-stage-codegen end to end with map-side partial aggregation, so at
100 TB the shuffle carries k short strings per document, never the
shingle sets.  (The per-row higher-order-function formulation is ~25×
slower in Spark's interpreted HOF evaluator and is kept only as a
Column-level equivalent for row-scoped contexts; a test pins the two to
identical output.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MINHASH_K = 8
SLICE_W = 4  # hex chars per hash-family slice (8 × 4 = 32 = full md5 hex)
BAND_ROWS = 2  # 4 bands × 2 rows
MAX_BUCKET = 50  # LSH bucket cap (skew control, part of the contract)


def tokens(text: Column) -> Column:
    """Lowercased whitespace tokens."""
    return F.split(F.lower(F.trim(text)), r"\s+")


def all_shingles(text: Column, n: int = 3) -> Column:
    """Word n-gram shingles in document order, repeats kept.  Pure array
    exprs (sequence → slice → array_join) — stays in codegen, no UDF.

    Guarded for short docs: Spark's ``sequence(1, 0)`` yields a
    *descending* [1, 0], not empty, so docs with < n tokens must map to
    an explicit empty array.

    The token array is bound ONCE via a single-element-array lambda:
    Catalyst does not common-subexpression-eliminate across lambda
    boundaries, so referencing ``split(text)`` directly inside the
    per-shingle lambda would re-split the whole document once per
    shingle — O(tokens²) per doc, measured ~4× slower at sf0.1."""

    def _grams(t: Column) -> Column:
        return F.when(
            F.size(t) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(t) - (n - 1)),
                lambda i: F.array_join(F.slice(t, i, n), " "),
            ),
        ).otherwise(F.array().cast("array<string>"))

    return F.element_at(F.transform(F.array(tokens(text)), _grams), 1)


def shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles (see :func:`all_shingles`)."""
    return F.array_distinct(all_shingles(text, n))


def _slice(h: Column, i: int) -> Column:
    return F.substring(h, SLICE_W * i + 1, SLICE_W)


def ensure_parallelism(df: DataFrame) -> DataFrame:
    """Fan a under-split scan out to the session's default parallelism.

    The hash stages below are CPU-bound, and a small local parquet file
    arrives as ONE split — which would serialize the whole operator on a
    single core.  On the 100 TB path the scan already has thousands of
    splits and this is a structural no-op (no shuffle is added).

    Split estimate comes from ``inputFiles()`` — a metadata-only listing
    — never ``df.rdd`` (which forces a full plan→RDD conversion on the
    driver per call).  An in-memory/derived frame lists no files and is
    treated as under-split, which is correct for the tiny literal frames
    that hit that path."""
    target = df.sparkSession.sparkContext.defaultParallelism
    try:
        n_splits = len(df.inputFiles())
    except Exception:
        n_splits = 0
    if n_splits * 2 < target:
        return df.repartition(target)
    return df


def minhash_signatures(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = MINHASH_K
) -> DataFrame:
    """(doc_id, sig) per document with ≥1 shingle.  Signature element i =
    min over shingles of md5-hex slice [4i+1 .. 4i+4] — one digest per
    shingle, k mins per doc.

    explode → codegen md5 → hash-agg with map-side combine: the shuffle
    key is doc_id and the shuffled payload is k small ints, so the
    stage scales with document count, not corpus bytes.

    The min-agg runs on the hash family's *numeric* value (each 4-hex
    slice is 16 bits): ``min(string)`` carries a string agg buffer,
    which forces Spark's SortAggregate fallback (two extra sorts of the
    exploded rows); ``min(int)`` keeps the partial+final HashAggregate.
    Numeric min equals lexicographic min for fixed-width hex, so the
    hex signature re-formatted after the agg is byte-identical."""
    ex = ensure_parallelism(docs).select(
        F.col(id_col).alias("doc_id"), F.explode(shingles(F.col(text_col))).alias("sh")
    ).withColumn("h", F.md5("sh"))
    agg = ex.groupBy("doc_id").agg(
        *[
            F.min(F.conv(_slice(F.col("h"), i), 16, 10).cast("int")).alias(f"m{i}")
            for i in range(k)
        ]
    )
    hex_elems = [
        F.lower(F.lpad(F.hex(F.col(f"m{i}")), SLICE_W, "0")) for i in range(k)
    ]
    return agg.select("doc_id", F.array(*hex_elems).alias("sig"))


def minhash_signature(shingle_col: Column, k: int = MINHASH_K) -> Column:
    """Column-level equivalent of :func:`minhash_signatures` for
    row-scoped contexts (streaming rows, tests): a single fold over the
    shingle array, one md5 per shingle.  Empty shingle set → NULL."""
    init = F.array_repeat(F.lit("z" * SLICE_W), k)

    def merge(acc: Column, x: Column) -> Column:
        h = F.md5(x)
        return F.zip_with(
            acc, F.array(*[_slice(h, i) for i in range(k)]), lambda a, b: F.least(a, b)
        )

    return F.when(F.size(shingle_col) > 0, F.aggregate(shingle_col, init, merge))


def band_hashes(sig: Column, band_rows: int = BAND_ROWS, k: int = MINHASH_K) -> list[Column]:
    """LSH bands: hash of each consecutive ``band_rows`` signature slice."""
    return [
        F.md5(F.concat_ws("|", F.slice(sig, b * band_rows + 1, band_rows))).alias(f"band_{b}")
        for b in range(k // band_rows)
    ]


def signature_bands(with_sig: DataFrame) -> DataFrame:
    """(doc_id, sig, band_idx, band_hash) — one row per signature band;
    the LSH index shape, both for in-query candidate joins and as the
    persisted signature-store layout for incremental dedup."""
    return with_sig.select(
        "doc_id",
        "sig",
        F.posexplode(F.array(*band_hashes(F.col("sig")))).alias("band_idx", "band_hash"),
    )


def minhash_candidates(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """MinHash-LSH candidate pairs: explode (band_idx, band_hash), join
    within buckets, cap oversized buckets.

    One shuffle on (band_idx, band_hash); the pair join is bucket-local.
    Returns (a_id, b_id, a_sig, b_sig) for downstream verification."""
    bands = signature_bands(minhash_signatures(docs, id_col, text_col))
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
    LSH candidates).

    CONTRACT: inputs MUST be duplicate-free arrays (:func:`shingles`,
    never :func:`all_shingles`).  The inclusion–exclusion identity
    |a ∪ b| = |a| + |b| − |a ∩ b| holds only for sets: an array with
    repeats inflates ``size(a)`` while ``array_intersect`` stays
    distinct, silently DEFLATING the result where the old
    ``array_union`` form still computed correct set Jaccard.  Pinned
    by test (test_exact_jaccard_requires_distinct_inputs).

    Inclusion–exclusion on distinct sets yields the same integers as
    materializing ``array_union`` (so the IEEE division is
    bit-identical and every oracle is unchanged) without allocating a
    second merged array per candidate pair."""
    inter = F.size(F.array_intersect(a_shingles, b_shingles))
    union = F.size(a_shingles) + F.size(b_shingles) - inter
    return inter.cast("double") / F.nullif(union, F.lit(0))


def containment(a_shingles: Column, b_shingles: Column) -> Column:
    """Asymmetric set containment C(A→B) = |A ∩ B| / |A| — the
    quote/subset signal Jaccard misses: a short document fully embedded
    in a long one has low Jaccard (the union is big) but containment
    1.0.  Same DISTINCT-input contract as :func:`exact_jaccard`
    (``shingles``, never ``all_shingles``); NULL when A is empty."""
    inter = F.size(F.array_intersect(a_shingles, b_shingles))
    return inter.cast("double") / F.nullif(F.size(a_shingles), F.lit(0))


SIMHASH_BITS = 16


def _bit_col(h: Column, j: int) -> Column:
    """±1 contribution of a token digest to simhash bit j: the high bit
    of hex digit j+1 ('8' ≤ digit ⇔ +1).  One digest serves all bits."""
    return F.when(F.substring(h, j + 1, 1) >= "8", 1).otherwise(-1)


def simhashes(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = SIMHASH_BITS
) -> DataFrame:
    """(doc_id, simhash) per document.  Bit j of the fingerprint is the
    sign of Σ over distinct tokens of ±1 taken from hex digit j+1 of the
    token's single md5 digest.

    Same explode → md5 → partial-agg shape as minhash_signatures: the
    shuffle payload is ``bits`` small integers per doc.  Whitespace
    split never yields an empty array (splitting "" gives [""]) so every
    input row survives the explode."""
    ex = ensure_parallelism(docs).select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("t"),
    ).withColumn("h", F.md5("t"))
    agg = ex.groupBy("doc_id").agg(
        *[F.sum(_bit_col(F.col("h"), j)).alias(f"b{j}") for j in range(bits)]
    )
    out = F.lit(0).cast("long")
    for j in range(bits):
        out = out + F.when(F.col(f"b{j}") > 0, F.lit(1 << j).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return agg.select("doc_id", out.alias("simhash"))


def simhash(text: Column, bits: int = SIMHASH_BITS) -> Column:
    """Column-level equivalent of :func:`simhashes` (row-scoped
    contexts): one fold over distinct tokens accumulating the ``bits``
    ±1 sums as an int array, then sign → bit assembly."""
    toks = F.array_distinct(tokens(text))

    def merge(acc: Column, t: Column) -> Column:
        h = F.md5(t)
        return F.zip_with(
            acc, F.array(*[_bit_col(h, j) for j in range(bits)]), lambda a, b: a + b
        )

    sums = F.aggregate(toks, F.array_repeat(F.lit(0), bits), merge)
    out = F.lit(0).cast("long")
    for j in range(bits):
        out = out + F.when(F.element_at(sums, j + 1) > 0, F.lit(1 << j).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return out


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
) -> DataFrame:
    """Benchmark decontamination — flag corpus documents sharing ANY
    word ``n``-gram with an evaluation/benchmark set (the overlap scan
    every training pipeline runs before a model sees the data; n-gram
    matching per GPT-3 appendix C / PaLM-style 8-gram screens — ``n``
    defaults low only because the fixture texts are short).

    Returns the distinct flagged ``id_col`` values.

    Scale shape: the benchmark side is TINY (eval sets are thousands of
    rows) — its distinct n-gram *hashes* broadcast to every executor,
    and the corpus side is explode → md5 → **broadcast left-semi join**
    → distinct ids.  No shuffle touches corpus text: the only exchange
    is the distinct over already-matched ids (≪ corpus).  Hashing the
    n-grams bounds the broadcast payload at 32 hex chars per gram no
    matter how long the benchmark strings are."""
    bench_hashes = (
        benchmark.select(F.explode(shingles(F.col(text_col), n)).alias("g"))
        .select(F.md5("g").alias("h"))
        .distinct()
    )
    corp = ensure_parallelism(corpus).select(
        F.col(id_col), F.explode(shingles(F.col(text_col), n)).alias("g")
    )
    return (
        corp.select(id_col, F.md5("g").alias("h"))
        .join(F.broadcast(bench_hashes), "h", "leftsemi")
        .select(id_col)
        .distinct()
    )


def chunk_line_array(text: Column, n: int = 4) -> Column:
    """The fixed-stride chunk segmentation as an ARRAY column — one
    element per would-be line, :func:`chunk_lines` without the newline
    join.  Composing with :func:`dedup_line_arrays` skips the
    join("\\n") → re-split round trip entirely (two full string
    materializations of the corpus — r15); the equivalence is exact
    because chunks are space-joined whitespace-split tokens (never
    contain a newline) and ``tokens`` never yields an empty array
    (split of "" is [""]), so split(join(arr, "\\n"), "\\n") == arr.

    Same single-bind lambda trick as :func:`all_shingles` (Catalyst
    does not CSE across lambda boundaries), all array exprs, codegen
    end-to-end."""

    def _chunks(t: Column) -> Column:
        return F.transform(
            F.sequence(
                F.lit(1), F.ceil(F.size(t) / F.lit(float(n))).cast("int")
            ),
            lambda i: F.array_join(F.slice(t, (i - 1) * n + 1, n), " "),
        )

    return F.element_at(F.transform(F.array(tokens(text)), _chunks), 1)


def chunk_lines(text: Column, n: int = 4) -> Column:
    """Re-segment a flat text into newline-joined fixed-stride word
    chunks (``n`` tokens per line, last line short).  Two uses: a
    fixed-window segmenter in its own right (the chunking step of
    context packing), and the line fabricator for corpora whose
    synthetic text carries no newline structure — :func:`dedup_lines`
    needs lines to operate on.  (:func:`chunk_line_array` is the
    un-joined form for composition with :func:`dedup_line_arrays`.)"""
    return F.array_join(chunk_line_array(text, n), "\n")


def dedup_lines(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_dup: int = 2,
) -> DataFrame:
    """Line-level corpus dedup (the RefinedWeb/CCNet boilerplate
    filter): drop every line whose exact text occurs ``min_dup`` or
    more times across the WHOLE corpus (nav bars, cookie banners,
    license headers), then reassemble each document from its surviving
    lines in original order.  Documents with no surviving line are
    dropped (their text was pure boilerplate).

    Returns (doc_id, clean_text, n_lines_kept).

    Scale shape: the occurrence count groups on ``md5(line)`` — a
    map-side-combined hash agg whose shuffle carries 32 hex chars per
    DISTINCT line, never line text.  The duplicate-hash set (only
    lines crossing the threshold — a tiny fraction of a real corpus)
    feeds a LEFT ANTI equi-join on the hash (AQE broadcasts it when it
    fits); reassembly is the one shuffle that moves surviving text,
    keyed on doc_id.  Line order is restored via ``array_sort`` over
    (pos, line) structs — pos is unique per doc, so the sort is total
    and the rebuilt text is byte-stable under any partitioning."""
    lines = ensure_parallelism(docs).select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    ).withColumn("h", F.md5("line"))
    return _dedup_line_rows(lines, min_dup)


def dedup_line_arrays(
    docs: DataFrame,
    id_col: str = "doc_id",
    lines_col: str = "lines",
    min_dup: int = 2,
) -> DataFrame:
    """:func:`dedup_lines` over a pre-split ARRAY of lines (e.g.
    :func:`chunk_line_array`'s output) — identical result, minus the
    newline join + re-split the text form pays when the lines were
    fabricated from arrays in the first place (r15; the equivalence
    argument is at chunk_line_array)."""
    lines = ensure_parallelism(docs).select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.col(lines_col)).alias("pos", "line"),
    ).withColumn("h", F.md5("line"))
    return _dedup_line_rows(lines, min_dup)


def _dedup_line_rows(lines: DataFrame, min_dup: int) -> DataFrame:
    """Shared tail of the line-dedup pair: occurrence count on the line
    hash, anti-join, order-restoring reassembly."""
    dup = (
        lines.groupBy("h")
        .agg(F.count("*").alias("n_occ"))
        .filter(F.col("n_occ") >= min_dup)
        .select("h")
    )
    kept = lines.join(dup, "h", "left_anti")
    return kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("clean_text"),
        F.count("*").alias("n_lines_kept"),
    )


def contamination_fraction(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
) -> DataFrame:
    """:func:`decontaminate`'s graded twin: instead of a boolean flag,
    the FRACTION of each corpus document's distinct word ``n``-grams
    that appear anywhere in the benchmark set — the contamination score
    a pipeline thresholds (drop > 0.x) or reports per eval suite,
    rather than the hard any-overlap screen.

    Returns (id, n_grams, n_matched, contamination_frac) for every
    corpus document with ≥1 shingle (shorter docs have no defined
    fraction and are excluded — mirror of the signature operators'
    domain).

    Scale shape: identical to :func:`decontaminate` — benchmark n-gram
    hashes broadcast, corpus explode → md5 → broadcast LEFT join
    scoring each gram 0/1, then one (id, n_grams)-keyed count shuffle
    whose payload is two ints per document.  The fraction is a single
    IEEE division of two exact integers."""
    bench_hashes = (
        benchmark.select(F.explode(shingles(F.col(text_col), n)).alias("g"))
        .select(F.md5("g").alias("h"))
        .distinct()
        .withColumn("_m", F.lit(1))
    )
    corp = ensure_parallelism(corpus).select(
        F.col(id_col), shingles(F.col(text_col), n).alias("s")
    )
    ex = (
        corp.filter(F.size("s") > 0)
        .select(
            id_col,
            F.size("s").cast("long").alias("n_grams"),
            F.explode("s").alias("g"),
        )
        .select(id_col, "n_grams", F.md5("g").alias("h"))
    )
    return (
        ex.join(F.broadcast(bench_hashes), "h", "left")
        .groupBy(id_col, "n_grams")
        .agg(F.sum(F.coalesce("_m", F.lit(0))).alias("n_matched"))
        .withColumn(
            "contamination_frac",
            F.col("n_matched").cast("double") / F.col("n_grams").cast("double"),
        )
    )


def dedup_keep_representatives(
    docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Near-dup REMOVAL policy over a candidate-pair list: every pair
    (a_id < b_id) drops its higher id, keeping the lower as the
    representative — the standard one-pass policy pipelines apply to an
    LSH pair list.  (This is pairwise, not transitive-closure
    clustering: in a chain a~b, b~c with a≁c, both b and c are dropped
    because each loses some pair.  Deterministic and safe — survivors
    are never near-dups of each other; full graph clustering is the
    iterative alternative when maximal retention matters.)

    Scale shape: the dropped-id set (≪ corpus) is DISTINCT'd and
    broadcast; the removal itself is a broadcast LEFT ANTI join — the
    corpus is never shuffled."""
    dropped = pairs.select(F.col("b_id").alias(id_col)).distinct()
    return docs.join(F.broadcast(dropped), id_col, "left_anti")


def write_signature_store(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    mode: str = "overwrite",
) -> None:
    """Persist the banded signature table — (doc_id, sig, band_idx,
    band_hash) — as the corpus's standing dedup INDEX: incremental
    crawls probe new batches against it (:func:`incremental_dedup_probe`)
    without ever re-shingling or re-signaturing the existing corpus.
    The batch twin of ``streaming/dedup.py``'s accumulated store.

    Rows are clustered so a probe reads narrow slices: repartitioned on
    (band_idx, band_hash) and sorted within partitions, giving parquet
    row-group min/max stats on the join key.  At warehouse scale,
    ``plans/warehouse.write_bucketed`` on the same keys is the
    shuffle-free co-located-join upgrade.  ``mode="append"`` adds a new
    generation of documents in the same layout (the x30 pattern)."""
    bands = signature_bands(minhash_signatures(docs, id_col, text_col))
    (
        bands.repartition("band_idx", "band_hash")
        .sortWithinPartitions("band_idx", "band_hash")
        .write.mode(mode)
        .parquet(path)
    )


def incremental_dedup_probe(
    store: DataFrame,
    batch: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.25,
) -> DataFrame:
    """Probe a NEW batch of documents against a persisted signature
    store: returns (a_id, b_id, est_sim) for every near-dup pair with
    at least one member in the batch — both batch-vs-corpus and
    batch-internal duplicates, exactly the pair set a full-corpus
    re-run (x07) would emit restricted to pairs touching the batch
    (pinned by test).  Only the batch is shingled/signatured; the
    corpus side is the store scan.

    The ``MAX_BUCKET`` skew cap is computed over store ∪ batch — the
    same contract as ``minhash_candidates`` and the streaming probe,
    so a boilerplate bucket that was capped in the batch operator is
    capped here too (and a bucket pushed over the cap BY the batch is
    excluded from both sides).

    Scale shape: one shuffle of the batch's bands onto the store's
    (band_idx, band_hash) clustering; the store is never re-hashed,
    and cost scales with batch size × bounded bucket width."""
    new_bands = signature_bands(minhash_signatures(batch, id_col, text_col))
    cols = ["band_idx", "band_hash", "doc_id", "sig"]
    universe = store.select(*cols).union(new_bands.select(*cols))
    keep = (
        universe.groupBy("band_idx", "band_hash")
        .count()
        .filter(F.col("count") <= MAX_BUCKET)
        .select("band_idx", "band_hash")
    )
    a = universe.join(keep, ["band_idx", "band_hash"]).select(
        "band_idx", "band_hash", F.col("doc_id").alias("u_id"), F.col("sig").alias("u_sig")
    )
    b = new_bands.join(keep, ["band_idx", "band_hash"]).select(
        "band_idx", "band_hash", F.col("doc_id").alias("n_id"), F.col("sig").alias("n_sig")
    )
    pairs = (
        a.join(b, ["band_idx", "band_hash"])
        .filter(F.col("u_id") != F.col("n_id"))
        .select(
            F.least("u_id", "n_id").alias("a_id"),
            F.greatest("u_id", "n_id").alias("b_id"),
            F.when(F.col("u_id") < F.col("n_id"), F.col("u_sig"))
            .otherwise(F.col("n_sig"))
            .alias("a_sig"),
            F.when(F.col("u_id") < F.col("n_id"), F.col("n_sig"))
            .otherwise(F.col("u_sig"))
            .alias("b_sig"),
        )
        .distinct()
    )
    est = minhash_estimate(F.col("a_sig"), F.col("b_sig"))
    return (
        pairs.withColumn("est_sim", est)
        .filter(F.col("est_sim") >= F.lit(threshold))
        .select("a_id", "b_id", "est_sim")
    )


def dedup_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """Exact-substring span dedup (the distributed form of Lee et al.
    2021's ExactSubstr policy): any token covered by an occurrence of a
    word ``n``-gram that appears ≥ 2 times ANYWHERE in the corpus
    (cross-document or within-document) is removed; the survivors are
    reassembled in original order.  Returns one row per input document:
    (id, clean_text, n_tokens_kept, n_tokens_removed) — fully-duplicated
    documents survive with an empty ``clean_text``, never vanish.

    The reference policy builds a corpus-wide suffix array, which needs
    a global sort of the concatenated corpus; the fixed-``n`` covering
    mask is the shuffle-friendly approximation (every duplicated
    substring of ≥ n tokens is a union of duplicated n-grams, so its
    tokens are all covered; shorter repeats are deliberately kept).
    As with ExactSubstr, removal can splice previously-distant tokens
    together — the policy contract, not a defect.

    Scale shape: ONE explode of the corpus yields a (id, pos, tok, h)
    stream where ``h`` is the md5 of the n-gram STARTING at pos (null
    for the last n−1 positions) — token and gram ride the same row, so
    no (id, pos) join reunites them later.  Occurrence counting groups
    on the digest — a two-phase hash agg whose shuffle carries 32-char
    digests, never gram text; the duplicated-digest set comes back as
    one LEFT equi-join on ``h``; the covering mask is a per-document
    streaming RANGE window (no join explosion — a token is covered iff
    a dup-gram START lies in the trailing n−1 window); reassembly is
    the final shuffle.  Every stage is token- or digest-narrow and
    partitions on id or digest — no stage ever holds a whole document
    except the per-doc array expressions, bounded by document length.
    (The earlier two-explode formulation re-joined tokens to gram
    starts on (id, pos) — a second join and its two-sided shuffle,
    measured ~10% slower at sf0.1 and 3× slower to plan.  Catalyst
    still scans the table twice — the dup-count branch and the mask
    branch diverge before any exchange — but the dup-count scan prunes
    to the text column alone and no (id, pos) join reunites the
    streams; the plan's ONLY join is the digest equi-join, pinned by
    test.)"""
    from pyspark.sql import Window

    toks = tokens(F.col(text_col))
    # bind the token array once (lambda CSE guard, see all_shingles)
    st = F.element_at(
        F.transform(
            F.array(toks),
            lambda t: F.transform(
                F.sequence(F.lit(0), F.size(t) - 1),
                lambda p: F.struct(
                    F.element_at(t, p + 1).alias("tok"),
                    F.when(
                        p <= F.size(t) - n,
                        F.md5(F.array_join(F.slice(t, p + 1, n), " ")),
                    ).alias("h"),
                ),
            ),
        ),
        1,
    )
    rows = docs.select(
        F.col(id_col).alias(id_col), F.posexplode(st).alias("pos", "s")
    ).select(id_col, "pos", F.col("s.tok").alias("tok"), F.col("s.h").alias("h"))
    dup = (
        rows.where(F.col("h").isNotNull())
        .groupBy("h")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") >= 2)
        .select("h", F.lit(1).alias("is_start"))
    )
    w = Window.partitionBy(id_col).orderBy("pos").rangeBetween(-(n - 1), 0)
    cov = rows.join(dup, "h", "left").withColumn(
        "covered", F.coalesce(F.max("is_start").over(w), F.lit(0))
    )
    kept_struct = F.when(F.col("covered") == 0, F.struct("pos", "tok"))
    return cov.groupBy(id_col).agg(
        F.array_join(
            F.transform(F.array_sort(F.collect_list(kept_struct)), lambda s: s["tok"]),
            " ",
        ).alias("clean_text"),
        F.sum(F.lit(1) - F.col("covered")).alias("n_tokens_kept"),
        F.sum("covered").alias("n_tokens_removed"),
    )


def _bloom_positions(h: Column, m_bits: int, k: int) -> list[Column]:
    """``k`` bit positions in ``[0, m_bits)`` derived from disjoint
    8-hex-char windows of an md5 hex digest — the same expressions on
    the build and probe side, so membership is exact by construction.
    ``conv`` yields a string; the cast to long is safe (8 hex chars
    < 2^32).  ``k <= 4`` because a digest has four disjoint windows."""
    if not 1 <= k <= 4:
        raise ValueError(f"k must be in [1, 4], got {k}")
    return [
        F.pmod(F.conv(F.substring(h, 1 + 8 * i, 8), 16, 10).cast("long"), F.lit(m_bits))
        for i in range(k)
    ]


def bloom_bitmap(
    benchmark: DataFrame,
    text_col: str = "text",
    n: int = 5,
    m_bits: int = 1 << 16,
    k: int = 3,
) -> list[int]:
    """Build a Bloom bitmap over the benchmark set's distinct word
    ``n``-gram hashes, packed into ``m_bits/64`` int64 words.  Only the
    bit POSITIONS are collected to the driver (k ints per distinct
    gram — never text), so the build is one tiny job over the eval
    suite."""
    if m_bits % 64:
        raise ValueError("m_bits must be a multiple of 64")
    h = (
        benchmark.select(F.explode(shingles(F.col(text_col), n)).alias("g"))
        .select(F.md5("g").alias("h"))
        .distinct()
    )
    pos_rows = h.select(F.array(*_bloom_positions(F.col("h"), m_bits, k)).alias("ps")).collect()
    words = [0] * (m_bits // 64)
    for r in pos_rows:
        for p in r["ps"]:
            words[p // 64] |= 1 << (p % 64)
    # to signed int64 (Spark long literals)
    return [w - (1 << 64) if w >= 1 << 63 else w for w in words]


def bloom_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    m_bits: int = 1 << 16,
    k: int = 3,
) -> DataFrame:
    """:func:`decontaminate` with a Bloom prefilter — the shape that
    survives a benchmark set too large to broadcast as a join table.

    Stage 1 (prefilter): every corpus n-gram hash probes a broadcast
    int64-array BITMAP literal with ``k`` bit tests — pure shift/and
    arithmetic inside the scan's codegen, no join, no shuffle.  A Bloom
    filter has no false negatives, so no true match can be lost; false
    positives pass ~(1-e^{-kn/m})^k of clean grams.  Stage 2 (confirm):
    only the surviving grams join the exact benchmark hash set, making
    the result exactly ≡ :func:`decontaminate` (pinned by test).

    Why this matters at 100 TB: an eval-suite union can reach 10^8+
    distinct n-grams — gigabytes as a broadcast join table, but ~10
    bits/element as a bitmap (125 MB at 10^8), and the confirm join's
    input is the prefilter's survivors (≈ true matches + the tiny FP
    stream), so it can shuffle on the hash key without ever carrying
    the corpus.  At fixture scale the confirm side still broadcasts;
    the two-stage plan is what changes."""
    bits = bloom_bitmap(benchmark, text_col, n, m_bits, k)
    # pin array<bigint>: lit() infers array<int> when every packed word
    # happens to fit in 32 bits (tiny benchmark sets), and bit_get on an
    # int rejects positions >= 32
    warr = F.lit(bits).cast("array<bigint>")
    bench_hashes = (
        benchmark.select(F.explode(shingles(F.col(text_col), n)).alias("g"))
        .select(F.md5("g").alias("h"))
        .distinct()
    )
    corp = ensure_parallelism(corpus).select(
        F.col(id_col), F.explode(shingles(F.col(text_col), n)).alias("g")
    ).select(id_col, F.md5("g").alias("h"))
    hit = None
    for p in _bloom_positions(F.col("h"), m_bits, k):
        word = F.element_at(warr, F.floor(p / F.lit(64)).cast("int") + F.lit(1))
        test = F.bit_get(word, (p % F.lit(64)).cast("int")) == F.lit(1)
        hit = test if hit is None else hit & test
    return (
        corp.filter(hit)
        .join(F.broadcast(bench_hashes), "h", "leftsemi")
        .select(id_col)
        .distinct()
    )


def winnow_fingerprints(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    window: int = 4,
    hex_digits: int = 8,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD'03 — the MOSS algorithm): hash every word ``k``-gram in
    document order, slide a ``window`` of consecutive hashes, and
    select each window's MINIMUM hash (rightmost position on ties —
    the paper's robust-winnowing rule); the distinct selected
    (position, hash) pairs are the document's fingerprint set.

    Why this beats plain MinHash for overlap detection: winnowing
    GUARANTEES any shared run of at least ``window + k - 1`` tokens
    yields at least one identical fingerprint in both documents (the
    paper's coverage theorem), while keeping the fingerprint density
    ~2/(window+1) — a tunable, position-aware sample of the document,
    the standard tool for plagiarism/clone detection and a
    local-alignment complement to x83's global ExactSubstr mask.

    Everything is array-local codegen — one md5 per k-gram, one
    O(m·window) fold per document, NO shuffle until the caller
    aggregates fingerprints; hashes are the portable md5-slice family
    (first ``hex_digits`` hex chars as int64, DuckDB strpos-ladder
    reproducible).  Short docs: fewer than ``window`` k-grams → one
    fingerprint (the whole-doc minimum, same rightmost-tie rule);
    no k-grams → no rows.

    Returns (``id_col``, pos, fp) — pos is the 1-based k-gram index
    the fingerprint was selected at.

    Scale note: selection density is 2/(window+1) of k-grams, so the
    exploded output is a bounded fraction of the token stream; the
    downstream pair join (:func:`winnow_candidates`) carries int64
    fingerprints, never text."""
    if window < 2:
        raise ValueError("winnow window must be >= 2")
    grams = all_shingles(F.col(text_col), k)

    def _hashes(g: Column) -> Column:
        return F.transform(
            g,
            lambda x: F.conv(F.substring(F.md5(x), 1, hex_digits), 16, 10).cast(
                "long"
            ),
        )

    # bind the hash array once (the all_shingles lambda-binding rule)
    hs = F.element_at(F.transform(F.array(grams), _hashes), 1)
    with_hs = docs.select(F.col(id_col).alias("doc_id"), hs.alias("hs"))
    fold = (
        "aggregate(sequence(j + 1, j + {last}), "
        "named_struct('fp', element_at(hs, j), 'pos', j), "
        "(acc, q) -> IF(element_at(hs, q) <= acc.fp, "
        "named_struct('fp', element_at(hs, q), 'pos', q), acc))"
    )
    sel = F.expr(
        f"""
        CASE
          WHEN size(hs) >= {window} THEN
            array_distinct(transform(sequence(1, size(hs) - {window} + 1),
                                     j -> {fold.format(last=window - 1)}))
          WHEN size(hs) >= 2 THEN
            transform(sequence(1, 1), j -> {fold.format(last='size(hs) - 1')})
          WHEN size(hs) = 1 THEN
            array(named_struct('fp', element_at(hs, 1), 'pos', 1))
          ELSE array()
        END
        """
    )
    return (
        with_hs.select("doc_id", F.explode(sel).alias("s"))
        .select("doc_id", F.col("s.pos").alias("pos"), F.col("s.fp").alias("fp"))
    )


def winnow_candidates(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    window: int = 4,
    min_shared: int = 2,
    max_bucket: int = MAX_BUCKET,
) -> DataFrame:
    """Shared-fingerprint candidate pairs from :func:`winnow_fingerprints`
    — two documents sharing ``min_shared`` or more winnowed
    fingerprints have (with the coverage guarantee) overlapping runs
    of at least ``window + k - 1`` tokens each, the clone/plagiarism
    candidate set.

    Scale shape: distinct (doc, fp) → fingerprint-keyed self-join →
    (a, b) count agg — the LSH band-bucket shape with fp as the
    blocking key, including the same degenerate-bucket cap
    (fingerprints shared by more than ``max_bucket`` docs are
    boilerplate, dropped BEFORE the quadratic join — the
    MAX_BUCKET/BENCH_NOTES sizing rule).

    Returns (a_id, b_id, n_shared), a_id < b_id."""
    fps = (
        winnow_fingerprints(docs, id_col, text_col, k, window)
        .select("doc_id", "fp")
        .distinct()
    )
    keep = (
        fps.groupBy("fp")
        .agg(F.count("*").alias("_n"))
        .filter(F.col("_n") <= max_bucket)
        .select("fp")
    )
    kept = fps.join(keep, "fp")
    a = kept.select(F.col("fp"), F.col("doc_id").alias("a_id"))
    b = kept.select(F.col("fp"), F.col("doc_id").alias("b_id"))
    return (
        a.join(b, "fp")
        .where(F.col("a_id") < F.col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(F.count("*").cast("long").alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )


def chunk_dedup_stats(
    docs: DataFrame,
    context_len: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Training-WINDOW dedup audit: after GPT-style concat-and-chunk
    packing (``sampling.concat_chunk_spans``' global offsets), how many
    context windows are byte-identical repeats?  Document-level dedup
    (x01-x09) can pass a corpus whose PACKED windows still repeat —
    boilerplate shorter than a doc, or identical docs concatenated in
    different neighborhoods still yield duplicate windows whenever
    their offsets align; this measures the duplication the MODEL
    actually sees at the context granularity it sees it.

    Each token instance gets its exact global position (two-level
    prefix sum), windows are ``position div context_len``, each
    window's content digests to one md5 over its in-order tokens, and
    the output is the multiplicity histogram over window digests
    (mult, n_hashes, n_chunks).

    Scale shape: ONE shuffle of the token stream keyed on the window id
    (linear, unavoidable — window contents must meet once to digest),
    with per-group state bounded by ``context_len``; the histogram
    aggregates the DIGEST table (corpus_tokens/context_len rows, md5s
    only, never text)."""
    from .sampling import concat_chunk_spans

    toks_arr = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    withn = docs.select(
        F.col(id_col).alias("doc_id"), F.size(toks_arr).cast("long").alias("n_tok")
    )
    offs = concat_chunk_spans(withn, "doc_id", "n_tok", context_len).select(
        "doc_id", "start_off"
    )
    tk = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(toks_arr).alias("p", "t"),
    )
    g = tk.join(offs, "doc_id").select(
        (F.col("start_off") + F.col("p")).alias("gp"),
        ((F.col("start_off") + F.col("p")) / F.lit(context_len))
        .cast("long")
        .alias("chunk"),
        "t",
    )
    ch = g.groupBy("chunk").agg(
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
    hc = ch.groupBy("h").agg(F.count("*").cast("long").alias("mult"))
    return hc.groupBy("mult").agg(
        F.count("*").cast("long").alias("n_hashes"),
        (F.col("mult") * F.count("*")).cast("long").alias("n_chunks"),
    )


def bloom_words(
    benchmark: DataFrame,
    text_col: str = "text",
    n: int = 5,
    m_bits: int = 1 << 16,
    k: int = 3,
) -> DataFrame:
    """:func:`bloom_bitmap`'s distributed twin: the bitmap as a
    ``(word_idx, word)`` TABLE (≤ m_bits/64 rows, only set words
    present) built entirely executor-side — ``bit_or`` of per-position
    one-hot longs under one tiny groupBy, no driver fold.  This is the
    OR-MERGEABLE form: bitmaps over any split of the benchmark
    bit_or-fold to the union's bitmap (set bits only accumulate), so a
    blocklist that GROWS by landings maintains incrementally —
    ``streaming/stats.py:run_streaming_bloom``.  ``to_bitmap_literal``
    reconstructs the probe-side array; equality with the driver-built
    :func:`bloom_bitmap` is pinned by test."""
    if m_bits % 64:
        raise ValueError("m_bits must be a multiple of 64")
    h = (
        benchmark.select(F.explode(shingles(F.col(text_col), n)).alias("g"))
        .select(F.md5("g").alias("h"))
        .distinct()
    )
    pos = h.select(
        F.explode(F.array(*_bloom_positions(F.col("h"), m_bits, k))).alias("p")
    )
    return (
        pos.select(
            F.floor(F.col("p") / 64).cast("long").alias("word_idx"),
            # SQL shiftleft: the Python API only takes literal shifts
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT))").alias("w"),
        )
        .groupBy("word_idx")
        .agg(F.expr("bit_or(w)").alias("word"))
    )


def to_bitmap_literal(words: DataFrame, m_bits: int = 1 << 16) -> list[int]:
    """Collect a ``(word_idx, word)`` table (≤ m_bits/64 rows — the
    bounded-collect class) into the dense int64 list
    :func:`bloom_decontaminate` probes."""
    dense = [0] * (m_bits // 64)
    for r in words.collect():
        dense[int(r["word_idx"])] = int(r["word"])
    return dense
