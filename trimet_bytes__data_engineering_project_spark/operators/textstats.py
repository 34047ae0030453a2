"""Text-analysis operators (north-star extensions): token counting,
quality signals, language-ID heuristics, fingerprinting.

All native column expressions — these run inside whole-stage codegen on
the scan, so at 100 TB they cost one pass over the text column with no
Python boundary.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def token_count_col(text: Column) -> Column:
    """Whitespace token count (split on runs of whitespace)."""
    return F.size(F.split(F.trim(text), r"\s+")).cast("int")


# BPE-ish pre-tokenizer: letter runs | digit runs | single non-space
# symbol — the coarse split every BPE-family tokenizer (GPT-2 et al.)
# applies before merges.  Restricted to constructs RE2 (DuckDB) and
# Java regex compile identically, so the oracle can run the same
# pattern verbatim.
BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def bpe_token_count_col(text: Column) -> Column:
    """Subword-style token count under :data:`BPE_PATTERN` — the cheap
    proxy for "how many LLM tokens is this document" that a training-
    data pipeline budgets with (whitespace counting undercounts code
    and punctuation-heavy text badly)."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_PATTERN), F.lit(0))).cast("int")


STOPWORDS = ("the", "a", "and", "of", "to", "in", "is")


def stopword_ratio_col(text: Column) -> Column:
    """Fraction of whitespace tokens that are stopwords — the classic
    quality signal (near-0 for keyword spam / boilerplate lists, ~0.3-
    0.5 for natural prose).  Exact: int/int → one IEEE division."""
    toks = F.split(F.lower(F.trim(text)), r"\s+")
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    return n_stop.cast("double") / F.size(toks)


def char_class_count(text: Column, char_class: str) -> Column:
    """Count of characters matching a regex character class, computed as
    length delta after global removal (identical semantics in DuckDB via
    regexp_replace(..., 'g'))."""
    return F.length(text) - F.length(F.regexp_replace(text, char_class, ""))


def quality_stats(text: Column) -> list[Column]:
    """Quality-scoring signal set (doc length, vowel/space/punctuation
    density, token shape, stopword ratio).  Integer counts + single
    IEEE divisions — deterministic across engines."""
    n_chars = F.length(text).cast("long").alias("n_chars_measured")
    n_vowels = char_class_count(text, "[aeiou]").cast("long").alias("n_vowels")
    n_spaces = char_class_count(text, "[ ]").cast("long").alias("n_spaces")
    n_punct = char_class_count(text, "[^A-Za-z0-9 ]").cast("long").alias("n_punct")
    n_tokens = token_count_col(text)
    return [
        n_chars,
        n_vowels,
        n_spaces,
        n_punct,
        n_tokens.alias("n_tokens"),
        (F.length(text).cast("double") / n_tokens).alias("avg_token_len"),
        stopword_ratio_col(text).alias("stopword_ratio"),
    ]


def repetition_ratio_col(text: Column, n: int = 3) -> Column:
    """Gopher-style intra-document repetition signal: the fraction of
    word ``n``-grams that are repeats of an earlier n-gram in the same
    document (``1 - distinct/total``; 0.0 for docs too short to have
    one).  High values flag boilerplate/spam — a standard pretraining
    quality filter.  Pure array expressions over one tokenization, two
    integer counts and one IEEE division — codegen end-to-end, and the
    signal needs no shuffle at all (computed in the scan's project)."""
    from .dedup import all_shingles

    grams = all_shingles(text, n)
    total = F.size(grams)
    return F.when(
        total > 0,
        F.lit(1.0) - F.size(F.array_distinct(grams)).cast("double") / total.cast("double"),
    ).otherwise(F.lit(0.0))


WORD_PATTERN = "[a-z]+"  # letter runs over lowered text; RE2/Java-identical


def doc_frequencies(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """The (term, df) document-frequency table of a corpus — the
    persistable snapshot :func:`tfidf_top_terms` scores batches
    against.  At 100 TB this is the nightly artifact: build once per
    corpus refresh, write to parquet, and every subsequent batch pays
    O(batch) instead of re-aggregating the corpus vocabulary."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(WORD_PATTERN), F.lit(0))
        ).alias("term"),
    )
    return (
        toks.groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
        .groupBy("term")
        .agg(F.count("*").cast("long").alias("df"))
    )


def unigram_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """The (term, c) corpus unigram-count table — the persistable
    snapshot :func:`unigram_surprisal` scores batches against (same
    nightly-artifact contract as :func:`doc_frequencies`)."""
    return (
        docs.select(
            F.explode(
                F.regexp_extract_all(
                    F.lower(F.col(text_col)), F.lit(WORD_PATTERN), F.lit(0)
                )
            ).alias("term")
        )
        .groupBy("term")
        .agg(F.count("*").cast("long").alias("c"))
    )


def tfidf_top_terms(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    df_counts: DataFrame | None = None,
) -> DataFrame:
    """Top-``k`` distinguishing terms per document by tf·idf with
    LINEAR idf — score = tf / df (term count in the doc over the
    number of docs containing it).  The linear form is chosen for
    bit-exact cross-engine parity: one integer/integer IEEE division,
    where ``ln(N/df)`` would compare two libm implementations that
    only promise 1-ulp accuracy (swapping ``F.log`` in is a one-line
    change if absolute tf-idf values matter more than portability).

    Returns (doc_id, term, tf, df, score), ``k`` rows per document
    with ≥1 term; ties broken by term ascending (total order, so the
    kept set is deterministic).

    Scale shape: the token explode feeds a two-phase hash agg on
    (doc_id, term) — the shuffle carries one count per distinct
    doc-term, never the token stream.  df aggregates the tf table
    (already ≪ corpus) per term; the tf⋈df equi-join shuffles on the
    term key (AQE broadcasts the df side when it fits); the final
    top-k is one window on doc_id with a streaming row counter —
    the same bounded-state shape as ``sampling.cap_per_group``.

    ``df_counts``: a persisted (term, df) snapshot (see
    :func:`doc_frequencies`) to score against instead of the input's
    own df — the x56-style snapshot-probe form where only the BATCH
    side of every shuffle grows with the batch and the corpus is never
    re-aggregated per run.  A batch term absent from the snapshot
    scores with df = 1 (maximally distinguishing — the rarest a seen
    term can be), so the probe is total.  When the snapshot is built
    from ``docs`` itself the result is identical to the self-scored
    path (no OOV terms exist; pinned by test)."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(WORD_PATTERN), F.lit(0))
        ).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    if df_counts is None:
        # each (doc, term) row is one containing doc → df = plain count
        df = tf.groupBy("term").agg(F.count("*").alias("df"))
        scored = tf.join(df, "term")
    else:
        scored = tf.join(df_counts, "term", "left").withColumn(
            "df", F.coalesce(F.col("df"), F.lit(1)).cast("long")
        )
    scored = scored.withColumn(
        "score", F.col("tf").cast("double") / F.col("df").cast("double")
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), "term")
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select("doc_id", "term", "tf", "df", "score")
    )


# Conservative, engine-portable patterns (no lookaround — identical
# semantics in Java regex and RE2-family engines)
_PII_PATTERNS: dict[str, str] = {
    "EMAIL": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "URL": r"https?://[^\s]+",
    "PHONE": r"\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b",
    # round-7 additions (RefinedWeb's extra redaction classes); dict
    # order IS the cascade order — EMAIL consumes an address before
    # DIGITRUN could see its local part, PHONE before DIGITRUN so a
    # hyphenated number never half-matches
    "IPV4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
    "DIGITRUN": r"\b[0-9]{7,}\b",  # account/SSN/raw-phone shaped
}


def redact_pii(text: Column) -> Column:
    """Replace emails, URLs and phone-shaped strings with typed
    placeholders (``<EMAIL>`` etc.) — the scrubbing pass a training
    pipeline runs before text reaches a model.  A fixed chain of native
    ``regexp_replace`` calls: shuffle-free, codegen, no UDF.  Pattern
    order matters (emails first, so the URL pattern never eats a
    mailto-adjacent address)."""
    out = text
    for tag, pattern in _PII_PATTERNS.items():
        out = F.regexp_replace(out, pattern, f"<{tag}>")
    return out


def pii_counts(text: Column) -> list[Column]:
    """Per-document counts of each PII pattern (audit signal for the
    redaction pass)."""
    return [
        F.size(F.regexp_extract_all(text, F.lit(p), F.lit(0))).alias(f"n_{t.lower()}")
        for t, p in _PII_PATTERNS.items()
    ]


def pii_scan(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """PII scan + redaction audit — the pre-training hygiene pass every
    published pipeline runs before releasing text.  Per document: match
    counts per class (measured on the RAW text), the redacted text's
    md5 (a portable content fingerprint — never the text itself, so
    the audit table is safe to ship), its length and the char delta.

    All matching is native ``regexp_extract_all`` / ``regexp_replace``
    inside the scan's codegen — one pass, no UDF, no shuffle until
    whatever aggregation the caller adds: the textbook embarrassingly
    parallel map at 100 TB.  Patterns are the RE2∩Java-portable set in
    ``_PII_PATTERNS``; the cascade order is part of the contract (see
    the dict's comment)."""
    text = F.col(text_col)
    red = redact_pii(text)
    return df.select(
        F.col(id_col),
        *[c.cast("long").alias(n) for c, n in zip(pii_counts(text),
                                                  [f"n_{t.lower()}" for t in _PII_PATTERNS])],
        F.md5(red).alias("redacted_md5"),
        F.length(red).cast("long").alias("redacted_len"),
        (F.length(red) - F.length(text)).cast("long").alias("chars_delta"),
    )


# Hashed linear model (fasttext-style) — dimensions of the feature space
HASH_DIM_HEX = 3          # feature index = first 3 hex chars of md5(token)
HASH_DIM = 16**HASH_DIM_HEX  # 4096 buckets
WEIGHT_SCALE = HASH_DIM // 2  # weights span [-2048, 2047]
_KNUTH = 2654435761       # multiplicative-hash constant for pseudo-weights


def pseudo_weight(idx: int) -> int:
    """The deterministic pseudo-weight for feature bucket ``idx`` —
    ``(idx * 2654435761) mod 4096 - 2048`` — standing in for a trained
    parameter vector (see :func:`hashed_linear_score`)."""
    return (idx * _KNUTH) % HASH_DIM - WEIGHT_SCALE


def hashed_linear_score(text: Column, weights: list[int] | None = None) -> Column:
    """fasttext-style quality-classifier INFERENCE as one codegen
    expression: tokenize, hash each token into one of 4096 feature
    buckets (hashing trick), sum the buckets' integer weights, divide
    once by ``n_tokens * 2048`` → mean-pooled score in ≈[-1, 1].  This
    is the model-based quality gate (wiki-vs-crawl classifiers à la
    GPT-3/CCNet) that complements the heuristic signals above.

    ``weights``: a trained parameter vector (len 4096, ints) applied
    via an array-literal lookup — ONE broadcast literal, so at 100 TB
    inference is still a narrow, shuffle-free pass over the scan with
    no Python boundary and no join.  Default ``None`` uses
    :func:`pseudo_weight`'s multiplicative-hash formula inline —
    deterministic placeholder parameters that any engine can reproduce
    (the cross-engine oracle form; a real model just swaps the list in).

    Exactness: token→bucket is md5-prefix arithmetic (integer), the
    accumulator is an int64 sum, and the only float op is one IEEE
    division of two exactly-representable integers — bit-identical
    across engines and partitionings.  Empty docs score 0.0."""
    toks = F.regexp_extract_all(F.lower(text), F.lit(WORD_PATTERN), F.lit(0))
    idx = lambda t: F.conv(F.substring(F.md5(t), 1, HASH_DIM_HEX), 16, 10).cast("long")  # noqa: E731
    if weights is None:
        w = lambda t: F.pmod(idx(t) * F.lit(_KNUTH), F.lit(HASH_DIM)) - F.lit(WEIGHT_SCALE)  # noqa: E731
    else:
        if len(weights) != HASH_DIM:
            raise ValueError(f"weights must have len {HASH_DIM}, got {len(weights)}")
        warr = F.lit([int(v) for v in weights])
        w = lambda t: F.element_at(warr, (idx(t) + F.lit(1)).cast("int")).cast("long")  # noqa: E731
    wsum = F.aggregate(
        F.transform(toks, w), F.lit(0).cast("long"), lambda acc, x: acc + x
    )
    n = F.size(toks)
    return F.when(
        n > 0,
        wsum.cast("double") / (n.cast("long") * F.lit(WEIGHT_SCALE)).cast("double"),
    ).otherwise(F.lit(0.0))


def chunk_documents(
    docs: DataFrame,
    size: int = 200,
    stride: int = 150,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split every document into fixed-width character windows with
    overlap — the context-window chunking stage in front of embedding /
    retrieval indexing (a 100 KB doc cannot go through an encoder in
    one piece; ``size - stride`` chars of overlap keep boundary
    sentences visible to both neighbors).

    Chunks start at offsets ``0, stride, 2·stride, …`` while the
    offset is inside the text; the final chunk may be shorter than
    ``size``.  Empty documents produce no chunks.  Returns
    (doc_id, chunk_idx, chunk_start, chunk_text, chunk_len), all
    offsets 0-based, ``chunk_idx = chunk_start / stride``.

    Scale shape: one ``sequence`` + ``posexplode`` inside the scan's
    codegen — no shuffle, no Python, output rows ≈ corpus_chars /
    stride produced streaming.  Character windows (not token windows)
    keep the op a pure projection; token-aware chunking composes this
    with a tokenizer upstream."""
    if not (0 < stride <= size):
        raise ValueError(f"need 0 < stride <= size, got stride={stride} size={size}")
    n = F.length(F.col(text_col))
    offs = F.when(n > 0, F.sequence(F.lit(0), n - 1, F.lit(stride))).otherwise(
        F.array().cast("array<int>")
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(offs).alias("chunk_idx", "chunk_start"),
        F.col(text_col).alias("_text"),
    ).select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.col("chunk_start").cast("long").alias("chunk_start"),
        F.expr(f"substring(_text, chunk_start + 1, {size})").alias("chunk_text"),
        F.length(F.expr(f"substring(_text, chunk_start + 1, {size})"))
        .cast("long")
        .alias("chunk_len"),
    )


def unigram_surprisal(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    base_counts: DataFrame | None = None,
) -> DataFrame:
    """Per-document average unigram surprisal against the corpus's own
    unigram distribution — the cheap language-model perplexity proxy
    used to rank pretraining data (docs full of corpus-rare words score
    high; stopword soup scores low).

    Exactness contract: the per-token surprisal is the INTEGER ratio
    ``n_total div c(term)`` (corpus token count over the term's count)
    — rare terms contribute large integers, the most common terms
    contribute small ones.  An ``ln``-based surprisal would compare two
    libm implementations; the integer form is bit-identical across
    engines and partitionings, and is order-preserving in 1/p just like
    ``-ln p``.  Per-doc totals are int64 sums (associative, shuffle-
    safe); the mean is ONE IEEE division of two exact integers.

    Returns (doc_id, n_tokens, surprisal_sum, avg_surprisal) for every
    doc with ≥1 ``[a-z]+`` token (letterless docs have no distribution
    to score and are dropped, mirroring the SQL's natural inner join).

    Scale shape: token explode → two-phase (doc, term) hash agg (the
    shuffle carries one count per distinct doc-term); the term-count
    table aggregates the tf table per term; tf⋈counts shuffles on the
    term key (the vocabulary grows with the corpus, so this join is
    NOT broadcastable by design — AQE may still broadcast small
    vocabularies); the grand total is a 1-row broadcast cross join;
    the final per-doc agg is the second and last corpus-sized
    shuffle.

    ``base_counts``: a persisted (term, c) snapshot (see
    :func:`unigram_counts`) to score against instead of the input's
    own distribution — the snapshot-probe form where the corpus
    distribution is built ONCE and every batch run pays O(batch).
    ``n_total`` becomes the snapshot's total; a batch term absent
    from the snapshot scores as if its count were 1 (``n_total div 1``
    — the add-one OOV ceiling, exactly :func:`novelty_score`'s rule).
    When the snapshot is built from ``docs`` itself the result is
    identical to the self-scored path (pinned by test)."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(WORD_PATTERN), F.lit(0))
        ).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    if base_counts is None:
        counts = tf.groupBy("term").agg(F.sum("tf").cast("long").alias("c"))
        total = tf.agg(F.sum("tf").cast("long").alias("n_total"))
        joined = tf.join(counts, "term")
    else:
        counts = base_counts
        # F.sum over an EMPTY snapshot is NULL and would null-propagate
        # through the integer expression; coalesce to 0 so an empty base
        # scores every term at the documented OOV rule (n_total div 1 = 0).
        total = counts.agg(
            F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("n_total")
        )
        joined = tf.join(counts, "term", "left").withColumn(
            "c", F.coalesce(F.col("c"), F.lit(1)).cast("long")
        )
    scored = (
        joined.join(F.broadcast(total))
        .withColumn("inst_surprisal", F.col("tf") * F.expr("n_total div c"))
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.sum("tf").cast("long").alias("n_tokens"),
            F.sum("inst_surprisal").cast("long").alias("surprisal_sum"),
        )
        .withColumn(
            "avg_surprisal",
            F.col("surprisal_sum").cast("double") / F.col("n_tokens").cast("double"),
        )
    )


def bigram_surprisal(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document average BIGRAM surprisal against the corpus's own
    bigram model — the next step up from :func:`unigram_surprisal`
    toward the KenLM-style n-gram perplexity filter CCNet uses to rank
    pretraining data: a doc of individually-common words in improbable
    ORDER (shuffled text, keyword stuffing, bad OCR) now scores high
    where the unigram proxy scores it low.

    Per-token conditional surprisal is the INTEGER ratio
    ``C(w1·) div C(w1 w2)`` — the count of bigrams *starting with* w1
    over the count of this exact bigram, i.e. the reciprocal of the
    maximum-likelihood conditional P(w2|w1) rounded to an integer.
    Same exactness contract as unigram_surprisal: integer ratios, int64
    sums, ONE IEEE division for the mean — bit-identical across engines
    and partitionings where an ``ln``-based perplexity would compare
    libm implementations.

    Bigrams are built ARRAY-SIDE (zip of the token array with its own
    tail) — pure codegen on the scan, no window/lag shuffle; the first
    shuffle is the (doc, bigram) count agg, carrying one row per
    distinct doc-bigram.  Prefix counts C(w1·) aggregate the bigram
    table by its first token (``substring_index``).  Docs with < 2
    tokens have no bigram distribution and drop (inner-join semantics,
    mirroring unigram_surprisal's ≥1-token rule).

    Returns (doc_id, n_bigrams, surprisal_sum, avg_surprisal).
    """
    toks = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(WORD_PATTERN), F.lit(0))
    n = F.size(toks)
    bigrams = F.zip_with(
        F.slice(toks, 1, n - 1),
        F.slice(toks, 2, n - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    bg = docs.where(n >= 2).select(
        F.col(id_col).alias("doc_id"), F.explode(bigrams).alias("bg")
    )
    tf = bg.groupBy("doc_id", "bg").agg(F.count("*").alias("tf"))
    cb = tf.groupBy("bg").agg(F.sum("tf").cast("long").alias("cb"))
    cp = (
        tf.groupBy(F.substring_index("bg", " ", 1).alias("w1"))
        .agg(F.sum("tf").cast("long").alias("cp"))
    )
    scored = (
        tf.join(cb, "bg")
        .withColumn("w1", F.substring_index("bg", " ", 1))
        .join(cp, "w1")
        .withColumn("inst", F.col("tf") * F.expr("cp div cb"))
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.sum("tf").cast("long").alias("n_bigrams"),
            F.sum("inst").cast("long").alias("surprisal_sum"),
        )
        .withColumn(
            "avg_surprisal",
            F.col("surprisal_sum").cast("double") / F.col("n_bigrams").cast("double"),
        )
    )


def novelty_score(
    batch: DataFrame,
    base: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Cross-corpus novelty: score each BATCH document's tokens against
    the BASE corpus's unigram distribution — :func:`unigram_surprisal`'s
    incremental twin, answering "how much does today's crawl add that
    the corpus hasn't seen?" (high = novel vocabulary worth keeping,
    low = more of the same).

    Same exactness contract as unigram_surprisal (integer ratio
    ``n_total div c``, int64 sums, one IEEE division), with the OOV
    rule made explicit: a batch term absent from the base corpus is
    scored as if its count were 1 (``n_total div 1 = n_total`` — the
    ceiling a seen-once term gets; add-one smoothing's integer form).
    Batch docs with no ``[a-z]+`` tokens are dropped.

    Scale shape: the base side reduces to a (term, count) table once
    per batch (two-phase agg — at 100 TB this is the nightly
    distribution snapshot a pipeline would persist and reuse); the
    batch side explodes and LEFT-joins it on the term key; the
    distribution table is corpus-vocabulary-sized so the join shuffles
    — but the BATCH side of the shuffle is O(batch), and the final
    per-doc agg touches only batch rows."""
    base_tf = base.select(
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(WORD_PATTERN), F.lit(0))
        ).alias("term")
    ).groupBy("term").agg(F.count("*").cast("long").alias("c"))
    # empty base corpus → F.sum is NULL; coalesce so the OOV rule still
    # yields an exact integer (n_total div 1 = 0) instead of NULL rows.
    total = base_tf.agg(F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("n_total"))
    batch_tf = (
        batch.select(
            F.col(id_col).alias("doc_id"),
            F.explode(
                F.regexp_extract_all(
                    F.lower(F.col(text_col)), F.lit(WORD_PATTERN), F.lit(0)
                )
            ).alias("term"),
        )
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    scored = (
        batch_tf.join(base_tf, "term", "left")
        .join(F.broadcast(total))
        .withColumn("inst", F.col("tf") * F.expr("n_total div coalesce(c, 1)"))
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.sum("tf").cast("long").alias("n_tokens"),
            F.sum("inst").cast("long").alias("novelty_sum"),
        )
        .withColumn(
            "avg_novelty",
            F.col("novelty_sum").cast("double") / F.col("n_tokens").cast("double"),
        )
    )


BACKOFF_PENALTY = 4  # reciprocal of stupid backoff's alpha=0.4 is 2.5;
# rounded UP to the next integer so the penalty stays exact int64
# arithmetic (a float alpha would break cross-engine bit parity) and a
# backed-off estimate is always strictly worse than a direct hit.


def _ngram_join(toks: Column, n: int) -> Column:
    """Space-joined n-gram strings from a token array, built array-side
    (zip of the array against its own shifted tails — no window)."""
    size = F.size(toks)
    grams = F.slice(toks, 1, size - (n - 1))
    for off in range(1, n):
        grams = F.zip_with(
            grams,
            F.slice(toks, 1 + off, size - (n - 1)),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    return grams


def _trigram_scored(
    batch: DataFrame,
    base: DataFrame | None,
    id_col: str,
    text_col: str,
    inst_sql: str,
    t3_counts: DataFrame | None = None,
    t2_counts: DataFrame | None = None,
    t1_counts: DataFrame | None = None,
) -> DataFrame:
    """Shared chassis of the trigram scorers (stupid backoff x82, JM
    interpolation x84): build the BASE corpus's four persisted-snapshot
    count tables (trigram c3 / trigram-prefix c3p / bigram c2 /
    bigram-prefix c2p / unigram c1 + grand total), aggregate the BATCH
    to one row per distinct (doc, trigram), LEFT-join every level's
    counts, and score each instance with ``inst_sql`` (a SQL expression
    over c3/c3p/c2/c2p/c1/n_total — integer arithmetic only).  The
    batch side of every shuffle is O(batch); the base tables are
    corpus-vocabulary-sized so those joins deliberately do not
    broadcast.

    SNAPSHOT-PROBE mode: pass the three persisted :func:`ngram_counts`
    tables (all or none) instead of ``base`` — the prefix totals and
    grand total derive from vocabulary-sized snapshot scans instead of
    re-running the corpus explodes (the in-flight form re-executes
    each explode per derived-table consumer; BENCH_NOTES round 7)."""
    snaps = (t3_counts, t2_counts, t1_counts)
    if any(s is not None for s in snaps) and any(s is None for s in snaps):
        raise ValueError("pass all of t3_counts/t2_counts/t1_counts, or none")
    if base is None and t3_counts is None:
        raise ValueError("pass base, or the t3/t2/t1_counts snapshots")
    toks = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(WORD_PATTERN), F.lit(0))

    def explode_grams(df: DataFrame, n: int, *extra: Column) -> DataFrame:
        return df.where(F.size(toks) >= n).select(
            *extra, F.explode(_ngram_join(toks, n)).alias("g")
        )

    def level(n: int, snap: DataFrame | None, cname: str) -> DataFrame:
        if snap is not None:
            return snap.select("g", F.col("c").cast("long").alias(cname))
        return (
            explode_grams(base, n)
            .groupBy("g")
            .agg(F.count("*").cast("long").alias(cname))
        )

    t3 = level(3, t3_counts, "c3")
    c3p = (
        t3.groupBy(F.substring_index("g", " ", 2).alias("p2"))
        .agg(F.sum("c3").cast("long").alias("c3p"))
    )
    t2 = level(2, t2_counts, "c2")
    c2p = (
        t2.groupBy(F.substring_index("g", " ", 1).alias("p1"))
        .agg(F.sum("c2").cast("long").alias("c2p"))
    )
    c1 = level(1, t1_counts, "c1")
    # empty base corpus → F.sum is NULL and null-propagates through
    # inst_sql; coalesce to 0 so the CASE guards (all c* NULL) reduce the
    # score to the documented full-OOV ceiling at N=0.
    n_total = c1.agg(F.coalesce(F.sum("c1"), F.lit(0)).cast("long").alias("n_total"))

    tf = (
        explode_grams(batch, 3, F.col(id_col).alias("doc_id"))
        .groupBy("doc_id", "g")
        .agg(F.count("*").alias("tf"))
        .withColumn("p2", F.substring_index("g", " ", 2))
        .withColumn("b23", F.substring_index("g", " ", -2))
        .withColumn("w2", F.substring_index(F.col("b23"), " ", 1))
        .withColumn("w3", F.substring_index("g", " ", -1))
    )
    return (
        tf.join(t3, "g", "left")
        .join(c3p, "p2", "left")
        .join(t2.withColumnRenamed("g", "b23"), "b23", "left")
        .join(c2p.withColumnRenamed("p1", "w2"), "w2", "left")
        .join(c1.withColumnRenamed("g", "w3"), "w3", "left")
        .join(F.broadcast(n_total))
        .withColumn("inst", F.col("tf") * F.expr(inst_sql))
    )


def trigram_backoff_surprisal(
    batch: DataFrame,
    base: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    t3_counts: DataFrame | None = None,
    t2_counts: DataFrame | None = None,
    t1_counts: DataFrame | None = None,
) -> DataFrame:
    """Cross-corpus TRIGRAM surprisal with stupid backoff — the top of
    the engine's n-gram ladder (x51 unigram → x80 bigram → this), the
    integer-exact stand-in for the KenLM 5-gram perplexity filter CCNet
    uses: each batch trigram is scored against the BASE corpus's counts,
    and an unseen trigram BACKS OFF to the trailing bigram, then the
    last unigram, then the OOV ceiling — multiplying by an integer
    :data:`BACKOFF_PENALTY` per level (stupid backoff's α=0.4 as the
    reciprocal-integer 4, so backed-off scores are exact int64 and
    strictly worse than direct hits).

    Per-trigram-instance score (all integer ratios, x80's prefix-count
    convention):

    - seen trigram:          C3(w1w2·) div C3(w1w2w3)
    - else seen bigram w2w3: PEN · (C2(w2·) div C2(w2w3))
    - else seen unigram w3:  PEN² · (N div C1(w3))
    - else OOV:              PEN² · (N + 1)   (x56's add-one ceiling)

    Scale shape: the base reduces once to four count tables (the
    persisted nightly n-gram snapshot at 100 TB); the batch side
    aggregates to one row per distinct (doc, trigram) and LEFT-joins
    the tables on trigram/bigram/unigram keys — the batch side of every
    shuffle is O(batch), and base tables are corpus-vocabulary-sized so
    the joins deliberately do not broadcast.  Batch docs with < 3
    tokens drop (no trigram to score).

    SNAPSHOT-PROBE mode: pass the persisted :func:`ngram_counts`
    tables ``t3_counts``/``t2_counts``/``t1_counts`` (all or none)
    instead of ``base`` — see :func:`_trigram_scored`.  Pinned
    bit-equal to the in-flight form by test.

    Returns (doc_id, n_trigrams, surprisal_sum, avg_surprisal).
    """
    pen = BACKOFF_PENALTY
    scored = _trigram_scored(
        batch,
        base,
        id_col,
        text_col,
        f"CASE WHEN c3 IS NOT NULL THEN c3p div c3 "
        f"WHEN c2 IS NOT NULL THEN {pen} * (c2p div c2) "
        f"WHEN c1 IS NOT NULL THEN {pen * pen} * (n_total div c1) "
        f"ELSE {pen * pen} * (n_total + 1) END",
        t3_counts=t3_counts,
        t2_counts=t2_counts,
        t1_counts=t1_counts,
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.sum("tf").cast("long").alias("n_trigrams"),
            F.sum("inst").cast("long").alias("surprisal_sum"),
        )
        .withColumn(
            "avg_surprisal",
            F.col("surprisal_sum").cast("double") / F.col("n_trigrams").cast("double"),
        )
    )


# Jelinek-Mercer interpolation weights as exact rationals over a power-
# of-two denominator: λ3 = 1/2, λ2 = 1/4, λ1 = 1/8, λ0 = 1/8.
JM_DENOM = 8


def trigram_jm_surprisal(
    batch: DataFrame,
    base: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    t3_counts: DataFrame | None = None,
    t2_counts: DataFrame | None = None,
    t1_counts: DataFrame | None = None,
) -> DataFrame:
    """Cross-corpus trigram surprisal with INTEGER-EXACT Jelinek-Mercer
    interpolation — the CCNet-grade upgrade over x82's stupid backoff:
    instead of falling through to the FIRST level that has a count,
    every level contributes, weighted λ3=1/2, λ2=1/4, λ1=1/8, λ0=1/8
    (rational weights over the same four persisted base count tables;
    a seen trigram whose trailing bigram is ALSO common now scores
    better than one whose bigram is rare — backoff can't see that).

    Exactness contract (no libm, no float sums): the interpolated
    probability is evaluated in FIXED POINT with the data-adaptive
    scale ``S = 8·(n_total+1)`` — chosen so the λ0 uniform floor
    ``S div (8·(n_total+1))`` is EXACTLY 1, which makes ``p_fp ≥ 1``
    always (no zero-division guard, and full-OOV trigrams score the
    ceiling ``S = 8·(N+1)`` — x56's add-one ceiling ×8):

    - p_fp = [c3 seen] (c3·S) div (2·c3p)
           + [c2 seen] (c2·S) div (4·c2p)
           + [c1 seen] (c1·S) div (8·N)
           + 1
    - inst = S div p_fp

    Every operation is int64 floor division/addition — bit-identical
    across engines and partitionings.  int64-safe while
    ``8·N·(N+1) < 2^63``, i.e. snapshots to ~10⁹ tokens; beyond that
    shard the snapshot (per-language/per-source n-gram tables, the
    standard layout anyway) or run the same expressions in
    DECIMAL(38,0).

    Same plan shape as :func:`trigram_backoff_surprisal` (shared
    chassis): batch side of every shuffle is O(batch); the four base
    tables are the persisted nightly n-gram snapshot at 100 TB — and
    SNAPSHOT-PROBE mode makes that literal: pass the persisted
    :func:`ngram_counts` tables ``t3_counts``/``t2_counts``/
    ``t1_counts`` instead of ``base`` (pinned bit-equal by test).

    Returns (doc_id, n_trigrams, surprisal_sum, avg_surprisal)."""
    d = JM_DENOM
    scored = _trigram_scored(
        batch,
        base,
        id_col,
        text_col,
        f"({d} * (n_total + 1)) div ("
        f"  CASE WHEN c3 IS NOT NULL THEN (c3 * {d} * (n_total + 1)) div (2 * c3p) ELSE 0 END"
        f"+ CASE WHEN c2 IS NOT NULL THEN (c2 * {d} * (n_total + 1)) div (4 * c2p) ELSE 0 END"
        f"+ CASE WHEN c1 IS NOT NULL THEN (c1 * {d} * (n_total + 1)) div ({d} * n_total) ELSE 0 END"
        f"+ 1)",
        t3_counts=t3_counts,
        t2_counts=t2_counts,
        t1_counts=t1_counts,
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.sum("tf").cast("long").alias("n_trigrams"),
            F.sum("inst").cast("long").alias("surprisal_sum"),
        )
        .withColumn(
            "avg_surprisal",
            F.col("surprisal_sum").cast("double") / F.col("n_trigrams").cast("double"),
        )
    )


def fourgram_jm_surprisal(
    batch: DataFrame,
    base: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    t4_counts: DataFrame | None = None,
    t3_counts: DataFrame | None = None,
    t2_counts: DataFrame | None = None,
    t1_counts: DataFrame | None = None,
) -> DataFrame:
    """The n-gram ladder's 4-gram rung (x51 uni → x80 bi → x82/x84 tri
    → this): cross-corpus FOURGRAM surprisal with integer-exact
    Jelinek-Mercer interpolation over five levels, λ = 1/2, 1/4, 1/8,
    1/16, 1/16 — one step closer to the KenLM 5-gram CCNet runs, built
    from SIX persisted base count tables (4-gram + prefix, trigram +
    prefix, bigram + prefix, unigram, total — the nightly snapshot set
    at 100 TB).

    Same fixed-point contract as :func:`trigram_jm_surprisal` with
    scale ``S = 16·(N+1)`` (λ0 floor exactly 1, p_fp ≥ 1 guard-free,
    full-OOV scores the S ceiling); every operation int64, no libm,
    int64-safe while ``16·N·(N+1) < 2^63`` (~7×10⁸-token snapshot
    shards).  Batch docs with < 4 tokens drop.  The batch aggregates
    to one row per distinct (doc, 4-gram); every shuffle's batch side
    is O(batch); the base tables deliberately do not broadcast.

    SNAPSHOT-PROBE mode: pass the persisted :func:`ngram_counts`
    tables ``t4_counts``..``t1_counts`` (all or none) instead of
    ``base`` — the six derived tables become vocabulary-sized snapshot
    scans (pinned bit-equal by test).

    Returns (doc_id, n_fourgrams, surprisal_sum, avg_surprisal)."""
    toks = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(WORD_PATTERN), F.lit(0))

    def explode_grams(df: DataFrame, n: int, *extra: Column) -> DataFrame:
        return df.where(F.size(toks) >= n).select(
            *extra, F.explode(_ngram_join(toks, n)).alias("g")
        )

    snaps = (t4_counts, t3_counts, t2_counts, t1_counts)
    if any(s is not None for s in snaps) and any(s is None for s in snaps):
        raise ValueError("pass all of t4/t3/t2/t1_counts, or none")
    if base is None and t4_counts is None:
        raise ValueError("pass base, or the t4/t3/t2/t1_counts snapshots")

    def level(n, snap, cname):
        if snap is not None:
            return snap.select("g", F.col("c").cast("long").alias(cname))
        return (
            explode_grams(base, n)
            .groupBy("g")
            .agg(F.count("*").cast("long").alias(cname))
        )

    t4 = level(4, t4_counts, "c4")
    c4p = (
        t4.groupBy(F.substring_index("g", " ", 3).alias("p3"))
        .agg(F.sum("c4").cast("long").alias("c4p"))
    )
    t3 = level(3, t3_counts, "c3")
    c3p = (
        t3.groupBy(F.substring_index("g", " ", 2).alias("p2"))
        .agg(F.sum("c3").cast("long").alias("c3p"))
    )
    t2 = level(2, t2_counts, "c2")
    c2p = (
        t2.groupBy(F.substring_index("g", " ", 1).alias("p1"))
        .agg(F.sum("c2").cast("long").alias("c2p"))
    )
    c1 = level(1, t1_counts, "c1")
    # same empty-base NULL guard as _trigram_scored: N=0 must reduce the
    # five-level cascade to the S = 16·(N+1) = 16 full-OOV ceiling.
    n_total = c1.agg(F.coalesce(F.sum("c1"), F.lit(0)).cast("long").alias("n_total"))

    tf = (
        explode_grams(batch, 4, F.col(id_col).alias("doc_id"))
        .groupBy("doc_id", "g")
        .agg(F.count("*").alias("tf"))
        .withColumn("p3", F.substring_index("g", " ", 3))
        .withColumn("b234", F.substring_index("g", " ", -3))
        .withColumn("p23", F.substring_index(F.col("b234"), " ", 2))
        .withColumn("b34", F.substring_index("g", " ", -2))
        .withColumn("w3", F.substring_index(F.col("b34"), " ", 1))
        .withColumn("w4", F.substring_index("g", " ", -1))
    )
    scored = (
        tf.join(t4, "g", "left")
        .join(c4p, "p3", "left")
        .join(t3.withColumnRenamed("g", "b234"), "b234", "left")
        .join(c3p.withColumnRenamed("p2", "p23"), "p23", "left")
        .join(t2.withColumnRenamed("g", "b34"), "b34", "left")
        .join(c2p.withColumnRenamed("p1", "w3"), "w3", "left")
        .join(c1.withColumnRenamed("g", "w4"), "w4", "left")
        .join(F.broadcast(n_total))
        .withColumn(
            "inst",
            F.col("tf")
            * F.expr(
                "(16 * (n_total + 1)) div ("
                "  CASE WHEN c4 IS NOT NULL"
                "       THEN (c4 * 16 * (n_total + 1)) div (2 * c4p) ELSE 0 END"
                "+ CASE WHEN c3 IS NOT NULL"
                "       THEN (c3 * 16 * (n_total + 1)) div (4 * c3p) ELSE 0 END"
                "+ CASE WHEN c2 IS NOT NULL"
                "       THEN (c2 * 16 * (n_total + 1)) div (8 * c2p) ELSE 0 END"
                "+ CASE WHEN c1 IS NOT NULL"
                "       THEN (c1 * 16 * (n_total + 1)) div (16 * n_total) ELSE 0 END"
                "+ 1)"
            ),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.sum("tf").cast("long").alias("n_fourgrams"),
            F.sum("inst").cast("long").alias("surprisal_sum"),
        )
        .withColumn(
            "avg_surprisal",
            F.col("surprisal_sum").cast("double") / F.col("n_fourgrams").cast("double"),
        )
    )


def kneser_ney_surprisal(
    batch: DataFrame,
    base: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    t2_counts: DataFrame | None = None,
) -> DataFrame:
    """Cross-corpus BIGRAM surprisal with INTEGER-EXACT interpolated
    Kneser-Ney smoothing — the smoothing family KenLM actually ships
    (absolute discounting + continuation counts), one rung beyond the
    ladder's Jelinek-Mercer forms: instead of interpolating RAW lower-
    order frequencies, the backoff distribution is the CONTINUATION
    count — how many distinct left-contexts a word appears after — so
    a word that is frequent only inside one fixed phrase ("francisco")
    stops looking probable in novel contexts, which is exactly the
    signal JM cannot express.

    With the single rational discount D = 1/2 (a fixed-point-friendly
    choice of the standard c(c-D)/c form; modified KN's three count-of-
    count-estimated discounts are a straight extension of the same
    derived tables):

    - P(w2|w1)        = (c2(w1w2) − ½)/c1p(w1)                [seen bigram]
                       + (½·n1p(w1)/c1p(w1)) · (ncont(w2)/nt) [λ·P_cont]
    - unseen history  = ncont(w2)/nt                          [pure continuation]

    where c1p(w1) = Σ c2(w1 ·), n1p(w1) = |{w2 : c2(w1w2)>0}| (the
    discount mass fan-out), ncont(w2) = |{w1 : c2(w1w2)>0}| (the
    continuation count), nt = total bigram TYPES.  The continuation
    tables are one more derived aggregate over the SAME persisted
    bigram snapshot the JM rungs read — at 100 TB they ship with the
    nightly n-gram snapshot set.

    Exactness contract (no libm): evaluated in fixed point at scale
    ``S = 2·(nt+1)`` with every term an int64 floor division — the
    discount becomes exact via 2·c2−1 (so max(c−½,0) never needs a
    float), and the engine interpolates a uniform floor of exactly 1
    fixed-point unit (the JM rungs' guard-free convention: p_fp ≥ 1
    always, a full-OOV bigram scores the S ceiling; an EMPTY base
    corpus gives nt = 0 → every score is S = 2).  int64-safe while
    ``2·(nt+1)·nt² < 2^63``, i.e. snapshots to ~10⁶ bigram types;
    shard the snapshot beyond that (per-language/per-source tables).

    Scale shape: the base reduces once to four count tables (bigram,
    prefix totals + fan-outs, continuation counts, the 1-row type
    total); the batch aggregates to one row per distinct (doc, bigram)
    and LEFT-joins them on bigram/w1/w2 keys — the batch side of every
    shuffle is O(batch); the base tables are corpus-vocabulary-sized so
    the joins deliberately do not broadcast.  Batch docs with < 2
    tokens drop.

    SNAPSHOT-PROBE mode (the x85/x86 contract): pass ``t2_counts`` — a
    persisted :func:`ngram_counts` bigram table — instead of ``base``;
    the derived aggregates become vocabulary-sized scans of the
    snapshot rather than re-derivations of the corpus explode (the
    in-flight form runs the explode+count once per derived-table
    consumer).  Pinned bit-equal to the in-flight form by test.

    Returns (doc_id, n_bigrams, surprisal_sum, avg_surprisal)."""
    if base is None and t2_counts is None:
        raise ValueError("pass base, or the t2_counts snapshot")
    toks = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(WORD_PATTERN), F.lit(0))

    def explode_grams(df: DataFrame, n: int, *extra: Column) -> DataFrame:
        return df.where(F.size(toks) >= n).select(
            *extra, F.explode(_ngram_join(toks, n)).alias("g")
        )

    t2 = (
        t2_counts.select("g", F.col("c").cast("long").alias("c2"))
        if t2_counts is not None
        else explode_grams(base, 2)
        .groupBy("g")
        .agg(F.count("*").cast("long").alias("c2"))
    )
    pre = (
        t2.groupBy(F.substring_index("g", " ", 1).alias("w1"))
        .agg(
            F.sum("c2").cast("long").alias("c1p"),
            F.count("*").cast("long").alias("n1p"),
        )
    )
    nc = (
        t2.groupBy(F.substring_index("g", " ", -1).alias("w2"))
        .agg(F.count("*").cast("long").alias("ncont"))
    )
    # count(*) over an empty table is 0, not NULL — nt needs no coalesce
    nt = t2.agg(F.count("*").cast("long").alias("nt"))

    tf = (
        explode_grams(batch, 2, F.col(id_col).alias("doc_id"))
        .groupBy("doc_id", "g")
        .agg(F.count("*").alias("tf"))
        .withColumn("w1", F.substring_index("g", " ", 1))
        .withColumn("w2", F.substring_index("g", " ", -1))
    )
    # branch guards double as division guards: every taken branch's
    # divisor is ≥ 1 by construction (c1p ≥ c2 ≥ 1 when c2 is non-NULL;
    # ncont non-NULL implies nt ≥ 1), so ANSI mode never sees x div 0
    scored = (
        tf.join(t2, "g", "left")
        .join(pre, "w1", "left")
        .join(nc, "w2", "left")
        .join(F.broadcast(nt))
        .withColumn(
            "inst",
            F.col("tf")
            * F.expr(
                "(2 * (nt + 1)) div ("
                "  CASE WHEN c2 IS NOT NULL"
                "       THEN ((2 * (nt + 1)) * (2 * c2 - 1)) div (2 * c1p) ELSE 0 END"
                "+ CASE WHEN c1p IS NOT NULL"
                "       THEN ((2 * (nt + 1)) * n1p * coalesce(ncont, 0))"
                "            div (2 * c1p * nt) ELSE 0 END"
                "+ CASE WHEN c1p IS NULL AND ncont IS NOT NULL"
                "       THEN ((2 * (nt + 1)) * ncont) div nt ELSE 0 END"
                "+ 1)"
            ),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.sum("tf").cast("long").alias("n_bigrams"),
            F.sum("inst").cast("long").alias("surprisal_sum"),
        )
        .withColumn(
            "avg_surprisal",
            F.col("surprisal_sum").cast("double") / F.col("n_bigrams").cast("double"),
        )
    )


def ngram_counts(docs: DataFrame, n: int, text_col: str = "text") -> DataFrame:
    """The (g, c) corpus n-gram-count TYPE table — the persistable
    snapshot the n-gram scorers' base sides reduce to (same nightly-
    artifact contract as :func:`unigram_counts`/:func:`doc_frequencies`).
    Every derived statistic the KN/JM rungs need (prefix totals,
    fan-outs, continuation counts, count-of-counts, type totals) is an
    aggregate of THIS table, so persisting it once per corpus refresh
    turns each scorer's base side from N re-derivations of the
    corpus-wide explode into vocabulary-sized scans of one parquet
    table — the measured fix for the in-flight forms' re-derivation
    multiplier (BENCH_NOTES round 7)."""
    toks = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(WORD_PATTERN), F.lit(0))
    return (
        docs.where(F.size(toks) >= n)
        .select(F.explode(_ngram_join(toks, n)).alias("g"))
        .groupBy("g")
        .agg(F.count("*").cast("long").alias("c"))
    )


def trigram_kneser_ney_surprisal(
    batch: DataFrame,
    base: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    t3_counts: DataFrame | None = None,
    t2_counts: DataFrame | None = None,
) -> DataFrame:
    """Cross-corpus TRIGRAM surprisal with RECURSIVE interpolated
    Kneser-Ney — the rung that makes the CCNet-style quality filter
    real: the ladder's orders (x82/x84 trigram, x94 4-gram) and its
    smoothing families (x95/x98 bigram KN) were orthogonal until here.
    The lower-order model is KN's CONTINUATION distribution, not raw
    frequencies: P(w3|w2) is estimated from how many distinct left
    contexts each suffix bigram appears in (the recursive-KN discipline
    — a word frequent only inside one fixed trigram stops looking
    probable after novel histories), and the final unigram backoff is
    the bigram-table continuation count x95 reads.

    Model (single rational discount D = 1/2 at both levels — the
    count-of-count discounts are x98's orthogonal axis):

    - P(w3|w1w2) = max(c3−½,0)/c12p + (½·n12p/c12p)·P(w3|w2)
    - P(w3|w2)   = max(nc23−½,0)/nm2 + (½·nf2/nm2)·Pc(w3)
    - Pc(w3)     = nc3/ntb

    where c12p/n12p are the trigram prefix total/fan-out, nc23 =
    |{w1 : c(w1 w2 w3) > 0}| (continuation count of the suffix
    bigram), nm2 = Σ_w3 nc23 (trigram types with middle w2), nf2 =
    |{w3 : nc23 > 0}|, and nc3/ntb are x95's bigram continuation
    tables.  Unseen-history backoff drops to the highest defined rung
    (P(w3|w2), then Pc, then the uniform floor).

    Exactness contract (no libm): fixed point at ``S = 4·(nt3+1)``
    (one factor 2 per discount level), every term an int64 floor
    division with ½ made exact via 2c−1; branch guards double as
    division guards (c3 non-NULL → c12p ≥ 1; c12p non-NULL → nm2 ≥ 1,
    nf2 ≥ 1, ntb ≥ 1 — a base trigram implies a base bigram; nc23
    non-NULL → nm2 ≥ 1; nc3 non-NULL → ntb ≥ 1), so ANSI never divides
    by zero and p_fp ≥ 1 always.  A full-OOV trigram scores the S
    ceiling; an EMPTY base gives nt3 = 0 → every score is S = 4.
    int64-safe while ``4·(nt3+1)·n12p·nf2·nc3 < 2^63`` at the realized
    per-key maxima (the λ·λ·Pc term dominates); Zipfian fan-outs keep
    natural-language snapshots inside this to ~10⁶ trigram types —
    shard per-language/per-source beyond.

    Scale shape: the base reduces once to the trigram table and FOUR
    derived aggregates of it (prefix, suffix-continuation, middle
    rollup) plus x95's bigram continuation pair — all members of the
    persisted nightly n-gram snapshot set; the batch aggregates to one
    row per distinct (doc, trigram) and LEFT-joins each level on its
    key, so the batch side of every shuffle is O(batch) and the
    corpus-vocabulary-sized tables deliberately do not broadcast.
    Batch docs with < 3 tokens drop.

    SNAPSHOT-PROBE mode (the x85/x86 contract): pass ``t3_counts`` /
    ``t2_counts`` — persisted :func:`ngram_counts` tables — instead of
    ``base``, and the five derived aggregates become vocabulary-sized
    scans of the snapshots rather than re-derivations of the corpus
    explode.  The in-flight form executes the trigram explode+count
    once per derived-table consumer (Spark materializes no shared
    sub-plans), so at scale the snapshot form is the nightly-pipeline
    shape; pinned bit-equal to the in-flight form by test.

    Returns (doc_id, n_trigrams, surprisal_sum, avg_surprisal)."""
    if (t3_counts is None) != (t2_counts is None):
        raise ValueError("pass both t3_counts and t2_counts, or neither")
    if base is None and t3_counts is None:
        raise ValueError("pass base, or the t3_counts/t2_counts snapshots")
    toks = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(WORD_PATTERN), F.lit(0))

    def explode_grams(df: DataFrame, n: int, *extra: Column) -> DataFrame:
        return df.where(F.size(toks) >= n).select(
            *extra, F.explode(_ngram_join(toks, n)).alias("g")
        )

    t3 = (
        t3_counts.select("g", F.col("c").cast("long").alias("c3"))
        if t3_counts is not None
        else explode_grams(base, 3)
        .groupBy("g")
        .agg(F.count("*").cast("long").alias("c3"))
    )
    c12 = (
        t3.groupBy(F.substring_index("g", " ", 2).alias("h"))
        .agg(
            F.sum("c3").cast("long").alias("c12p"),
            F.count("*").cast("long").alias("n12p"),
        )
    )
    m23 = (
        t3.groupBy(F.substring_index("g", " ", -2).alias("s23"))
        .agg(F.count("*").cast("long").alias("nc23"))
    )
    mid = (
        m23.groupBy(F.substring_index("s23", " ", 1).alias("w2"))
        .agg(
            F.sum("nc23").cast("long").alias("nm2"),
            F.count("*").cast("long").alias("nf2"),
        )
    )
    t2 = (
        t2_counts.select("g", F.col("c").cast("long").alias("c2"))
        if t2_counts is not None
        else explode_grams(base, 2)
        .groupBy("g")
        .agg(F.count("*").cast("long").alias("c2"))
    )
    nc = (
        t2.groupBy(F.substring_index("g", " ", -1).alias("w3"))
        .agg(F.count("*").cast("long").alias("nc3"))
    )
    # count(*) over an empty table is 0, not NULL — no coalesce needed
    tots = t3.agg(F.count("*").cast("long").alias("nt3")).crossJoin(
        t2.agg(F.count("*").cast("long").alias("ntb"))
    )

    tf = (
        explode_grams(batch, 3, F.col(id_col).alias("doc_id"))
        .groupBy("doc_id", "g")
        .agg(F.count("*").alias("tf"))
        .withColumn("h", F.substring_index("g", " ", 2))
        .withColumn("s23", F.substring_index("g", " ", -2))
        .withColumn("w2", F.substring_index(F.col("s23"), " ", 1))
        .withColumn("w3", F.substring_index("g", " ", -1))
    )
    scored = (
        tf.join(t3, "g", "left")
        .join(c12, "h", "left")
        .join(m23, "s23", "left")
        .join(mid, "w2", "left")
        .join(nc, "w3", "left")
        .join(F.broadcast(tots))
        .withColumn(
            "inst",
            F.col("tf")
            * F.expr(
                "(4 * (nt3 + 1)) div ("
                "  CASE WHEN c3 IS NOT NULL"
                "       THEN ((4 * (nt3 + 1)) * (2 * c3 - 1)) div (2 * c12p)"
                "       ELSE 0 END"
                "+ CASE WHEN c12p IS NOT NULL AND nc23 IS NOT NULL"
                "       THEN ((4 * (nt3 + 1)) * n12p * (2 * nc23 - 1))"
                "            div (4 * c12p * nm2) ELSE 0 END"
                "+ CASE WHEN c12p IS NOT NULL"
                "       THEN ((4 * (nt3 + 1)) * n12p * nf2 * coalesce(nc3, 0))"
                "            div (4 * c12p * nm2 * ntb) ELSE 0 END"
                "+ CASE WHEN c12p IS NULL AND nc23 IS NOT NULL"
                "       THEN ((4 * (nt3 + 1)) * (2 * nc23 - 1)) div (2 * nm2)"
                "       ELSE 0 END"
                "+ CASE WHEN c12p IS NULL AND nm2 IS NOT NULL"
                "       THEN ((4 * (nt3 + 1)) * nf2 * coalesce(nc3, 0))"
                "            div (2 * nm2 * ntb) ELSE 0 END"
                "+ CASE WHEN c12p IS NULL AND nm2 IS NULL AND nc3 IS NOT NULL"
                "       THEN ((4 * (nt3 + 1)) * nc3) div ntb ELSE 0 END"
                "+ 1)"
            ),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.sum("tf").cast("long").alias("n_trigrams"),
            F.sum("inst").cast("long").alias("surprisal_sum"),
        )
        .withColumn(
            "avg_surprisal",
            F.col("surprisal_sum").cast("double") / F.col("n_trigrams").cast("double"),
        )
    )


# Modified Kneser-Ney discount granularity: each Chen-Goodman discount
# is carried as an integer numerator over this power-of-two denominator
# (D_i = d_iq / MKN_DENOM), so the whole cascade stays int64 floor
# divisions — the bounded-denominator approximation that keeps the
# no-libm contract while tracking the count-of-count estimates to 1/64.
MKN_DENOM = 64


def modified_kneser_ney_surprisal(
    batch: DataFrame,
    base: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    t2_counts: DataFrame | None = None,
) -> DataFrame:
    """Cross-corpus BIGRAM surprisal with MODIFIED Kneser-Ney smoothing
    — :func:`kneser_ney_surprisal`'s single rational discount D = 1/2
    replaced by the three count-of-count-estimated discounts KenLM's
    estimator ships (Chen & Goodman 1998): D₁ for singleton bigrams, D₂
    for doubletons, D₃₊ for everything ≥ 3, estimated from the bigram
    count-of-counts n₁..n₄ of the SAME persisted snapshot.

    With Y = n₁/(n₁+2n₂) the Chen-Goodman closed forms reduce to exact
    rationals of the count-of-counts:

    - D₁  = 1 − 2Y·n₂/n₁ = n₁/(n₁+2n₂)          (= Y exactly)
    - D₂  = 2 − 3Y·n₃/n₂
    - D₃₊ = 3 − 4Y·n₄/n₃

    carried as integer numerators d_iq over :data:`MKN_DENOM` (floor of
    Q·D_i, clamped into [0, i·Q] so c − D(c) ≥ 0 for every count class
    by construction); a zero count-of-count denominator (no singletons,
    no doubletons, …) makes that rung's estimate undefined and it falls
    back to x95's single discount Q/2 — defined for every class.  The
    per-history discount MASS becomes class-weighted:
    λ(w1) = (D₁·N₁(w1) + D₂·N₂(w1) + D₃₊·N₃₊(w1)) / c1p(w1), where
    N_i(w1) counts w1's continuations with bigram count in class i —
    one extra conditional-count triple on the SAME per-prefix aggregate
    x95 already derives, and the count-of-count table is one 1-row
    aggregate over the bigram snapshot (the 'straight extension of the
    same derived tables' x95's docstring promised).

    Probability model per batch bigram (w1,w2), all at fixed point
    S = 2·(nt+1) with Q = MKN_DENOM, every term an int64 floor div:

    - seen bigram:    (S·(Q·c2 − d_q(c2)))            div (Q·c1p)
    - seen history:   (S·lam_num·ncont(w2))           div (Q·c1p·nt)
    - unseen history: (S·ncont(w2))                   div nt
    - + uniform floor 1; full-OOV scores the S ceiling; an EMPTY base
      gives nt = 0 → every score is S = 2 (the family convention,
      pinned from day one).

    int64-safe while ``2·(nt+1)·3Q·nt² < 2^63`` (the λ-mass term
    dominates), i.e. snapshots to ~3·10⁵ bigram types at Q = 64 —
    lower than x95's ~10⁶ ceiling by the Q factor; shard the snapshot
    (per-language/per-source tables) beyond that.

    Scale shape is x95's exactly: the base reduces once to the bigram
    table + per-prefix aggregate + continuation counts + TWO 1-row
    broadcasts (type total, count-of-counts→discounts); the batch side
    of every shuffle is O(batch).  Batch docs with < 2 tokens drop.

    SNAPSHOT-PROBE mode (the x85/x86 contract): pass ``t2_counts`` — a
    persisted :func:`ngram_counts` bigram table — instead of ``base``;
    see :func:`kneser_ney_surprisal`.  Pinned bit-equal to the
    in-flight form by test.

    Returns (doc_id, n_bigrams, surprisal_sum, avg_surprisal)."""
    if base is None and t2_counts is None:
        raise ValueError("pass base, or the t2_counts snapshot")
    toks = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(WORD_PATTERN), F.lit(0))

    def explode_grams(df: DataFrame, n: int, *extra: Column) -> DataFrame:
        return df.where(F.size(toks) >= n).select(
            *extra, F.explode(_ngram_join(toks, n)).alias("g")
        )

    q = MKN_DENOM
    t2 = (
        t2_counts.select("g", F.col("c").cast("long").alias("c2"))
        if t2_counts is not None
        else explode_grams(base, 2)
        .groupBy("g")
        .agg(F.count("*").cast("long").alias("c2"))
    )
    pre = (
        t2.groupBy(F.substring_index("g", " ", 1).alias("w1"))
        .agg(
            F.sum("c2").cast("long").alias("c1p"),
            F.count(F.when(F.col("c2") == 1, 1)).cast("long").alias("nw1_1"),
            F.count(F.when(F.col("c2") == 2, 1)).cast("long").alias("nw1_2"),
            F.count(F.when(F.col("c2") >= 3, 1)).cast("long").alias("nw1_3p"),
        )
    )
    nc = (
        t2.groupBy(F.substring_index("g", " ", -1).alias("w2"))
        .agg(F.count("*").cast("long").alias("ncont"))
    )
    # count(when(...)) over an empty/filtered table is 0, never NULL —
    # the count-of-counts need no coalesce (the round-5 empty-base
    # lesson, applied at the aggregate-function choice)
    cc = (
        t2.agg(
            F.count("*").cast("long").alias("nt"),
            F.count(F.when(F.col("c2") == 1, 1)).cast("long").alias("n1"),
            F.count(F.when(F.col("c2") == 2, 1)).cast("long").alias("n2"),
            F.count(F.when(F.col("c2") == 3, 1)).cast("long").alias("n3"),
            F.count(F.when(F.col("c2") == 4, 1)).cast("long").alias("n4"),
        )
        .withColumn(
            "d1q",
            F.expr(
                f"CASE WHEN n1 + 2 * n2 > 0"
                f"     THEN ({q} * n1) div (n1 + 2 * n2) ELSE {q // 2} END"
            ).cast("long"),
        )
        .withColumn(
            "d2q",
            F.expr(
                f"CASE WHEN n1 + 2 * n2 > 0 AND n2 > 0"
                f"     THEN greatest(0L, least({2 * q}L,"
                f"          2 * {q} - (3 * {q} * n1 * n3) div ((n1 + 2 * n2) * n2)))"
                f"     ELSE {q // 2} END"
            ).cast("long"),
        )
        .withColumn(
            "d3q",
            F.expr(
                f"CASE WHEN n1 + 2 * n2 > 0 AND n3 > 0"
                f"     THEN greatest(0L, least({3 * q}L,"
                f"          3 * {q} - (4 * {q} * n1 * n4) div ((n1 + 2 * n2) * n3)))"
                f"     ELSE {q // 2} END"
            ).cast("long"),
        )
        .select("nt", "d1q", "d2q", "d3q")
    )

    tf = (
        explode_grams(batch, 2, F.col(id_col).alias("doc_id"))
        .groupBy("doc_id", "g")
        .agg(F.count("*").alias("tf"))
        .withColumn("w1", F.substring_index("g", " ", 1))
        .withColumn("w2", F.substring_index("g", " ", -1))
    )
    # branch guards double as division guards (x95's convention): every
    # taken branch's divisor is ≥ 1 by construction (c1p ≥ c2 ≥ 1 when
    # c2 is non-NULL; c1p non-NULL → nt ≥ 1; ncont non-NULL → nt ≥ 1),
    # and Q·c2 − d_q(c2) ≥ 0 by the per-class clamps, so ANSI mode
    # never sees x div 0 and the probability terms never go negative
    scored = (
        tf.join(t2, "g", "left")
        .join(pre, "w1", "left")
        .join(nc, "w2", "left")
        .join(F.broadcast(cc))
        .withColumn(
            "inst",
            F.col("tf")
            * F.expr(
                f"(2 * (nt + 1)) div ("
                f"  CASE WHEN c2 IS NOT NULL"
                f"       THEN ((2 * (nt + 1)) * ({q} * c2 -"
                f"             CASE WHEN c2 = 1 THEN d1q"
                f"                  WHEN c2 = 2 THEN d2q ELSE d3q END))"
                f"            div ({q} * c1p) ELSE 0 END"
                f"+ CASE WHEN c1p IS NOT NULL"
                f"       THEN ((2 * (nt + 1))"
                f"             * (d1q * nw1_1 + d2q * nw1_2 + d3q * nw1_3p)"
                f"             * coalesce(ncont, 0))"
                f"            div ({q} * c1p * nt) ELSE 0 END"
                f"+ CASE WHEN c1p IS NULL AND ncont IS NOT NULL"
                f"       THEN ((2 * (nt + 1)) * ncont) div nt ELSE 0 END"
                f"+ 1)"
            ),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.sum("tf").cast("long").alias("n_bigrams"),
            F.sum("inst").cast("long").alias("surprisal_sum"),
        )
        .withColumn(
            "avg_surprisal",
            F.col("surprisal_sum").cast("double") / F.col("n_bigrams").cast("double"),
        )
    )


def refresh_counts(
    snapshot: DataFrame,
    batch_counts: DataFrame,
    key_col: str = "term",
    count_col: str = "c",
    max_batch_keys: int | None = 5_000_000,
) -> DataFrame:
    """Incremental MERGE of a day's batch count DELTAS into a persisted
    (key, count) snapshot — the maintenance step the nightly-snapshot
    contract (x85/x86 and the n-gram rungs) needs so real pipelines
    append a day instead of rebuilding the corpus distribution from
    scratch.  Counts are additive, so the merge is exact: the result is
    bit-equal to recounting the full corpus (pinned by test).

    Scale shape — the snapshot is NEVER shuffled and the merge cost
    tracks BATCH vocabulary: ``batch_counts`` (a day's distinct terms)
    broadcasts; the snapshot streams through one broadcast LEFT join
    adding each matched delta; brand-new batch keys are found by anti-
    joining the batch against the (O(batch)-sized, broadcast) set of
    snapshot keys the batch touched — derived from a broadcast SEMI
    join, so the snapshot pays two scans and zero shuffles, and no
    corpus-vocabulary-sized set ever reaches the driver or a broadcast.

    The broadcast plan is only safe while the BATCH vocabulary is
    broadcast-sized, and nothing in the plan itself enforces that — a
    caller streaming a month's backfill through the daily path would
    OOM the driver at scale.  ``max_batch_keys`` is the ENFORCED
    guard: one cheap ``count()`` on the O(batch) side, and when the
    batch vocabulary exceeds it the function falls back to the
    rebuild-class SHUFFLE merge (``unionByName`` + ``groupBy(key)``
    SUM — the snapshot shuffles once on the key, nothing broadcasts),
    which is bit-equal by count additivity (pinned both sides of the
    threshold by test).  ``max_batch_keys=None`` disables the count
    for callers that already know their batch is daily-sized.

    Write the result to a NEW versioned directory, not over the input
    (Spark cannot overwrite a path it is reading), then swap markers —
    the lifecycle :func:`plans.extensions` drives for x97."""
    batch_long = batch_counts.select(
        F.col(key_col), F.col(count_col).cast("long").alias(count_col)
    )
    if max_batch_keys is not None and batch_long.count() > max_batch_keys:
        # backfill-sized batch: broadcast would OOM — shuffle merge instead
        return (
            snapshot.select(key_col, F.col(count_col).cast("long").alias(count_col))
            .unionByName(batch_long)
            .groupBy(key_col)
            .agg(F.sum(count_col).cast("long").alias(count_col))
        )
    delta = F.broadcast(
        batch_counts.select(
            F.col(key_col), F.col(count_col).cast("long").alias("_delta")
        )
    )
    merged = snapshot.join(delta, key_col, "left").select(
        key_col,
        (F.col(count_col) + F.coalesce(F.col("_delta"), F.lit(0)))
        .cast("long")
        .alias(count_col),
    )
    seen = F.broadcast(
        snapshot.join(
            F.broadcast(batch_counts.select(key_col)), key_col, "left_semi"
        ).select(key_col)
    )
    fresh = batch_counts.join(seen, key_col, "left_anti").select(
        key_col, F.col(count_col).cast("long").alias(count_col)
    )
    return merged.unionByName(fresh)


def vocab_coverage(
    docs: DataFrame, text_col: str = "text", coverage_pct: int = 95
) -> DataFrame:
    """Tokenizer-sizing report: the SMALLEST vocabulary (terms taken in
    descending count order) covering ≥ ``coverage_pct`` % of the
    corpus's token mass — the number a BPE/WordPiece training run
    budgets its merges against, and the coverage curve's one
    load-bearing point.

    Exact and deterministic WITHOUT a vocabulary-sized sort: terms
    with equal counts are interchangeable for coverage, so the prefix
    runs over the DISTINCT-COUNT table (x57's decomposition — counts
    are heavy-tailed, so distinct count values ≪ vocabulary ≪ tokens);
    the crossing group contributes ``ceil((thr − prev_mass)/c)`` terms.
    All integer arithmetic (threshold = ``(pct·N + 99) div 100``, one
    IEEE division for the final ratio) — bit-identical across engines.

    Returns ONE row: (vocab_size, covered_tokens, total_tokens,
    coverage).

    Scale shape: token explode → two-phase (term) count (the only
    corpus-sized shuffle) → per-count agg (map-side combined) → a
    global-order window over distinct counts only → one crossing row.
    At 100 TB the distinct-count table is thousands of rows whatever
    the vocabulary size."""
    counts = unigram_counts(docs, text_col)
    g = counts.groupBy("c").agg(F.count("*").cast("long").alias("n_terms"))
    w = Window.orderBy(F.desc("c"))
    p = g.select(
        "c",
        "n_terms",
        F.sum(F.col("c") * F.col("n_terms")).over(w).alias("cum_mass"),
        F.sum("n_terms").over(w).alias("cum_terms"),
    )
    total = g.agg(F.sum(F.col("c") * F.col("n_terms")).cast("long").alias("n_total"))
    x = (
        p.join(F.broadcast(total))
        .withColumn("thr", F.expr(f"({coverage_pct} * n_total + 99) div 100"))
        .filter(F.col("cum_mass") >= F.col("thr"))
        .orderBy("cum_mass")
        .limit(1)
        .withColumn("prev_mass", F.expr("cum_mass - c * n_terms"))
        .withColumn("prev_terms", F.expr("cum_terms - n_terms"))
        # first-crossing invariant: prev_mass < thr <= cum_mass, so
        # 1 <= k_extra <= n_terms
        .withColumn("k_extra", F.expr("(thr - prev_mass + c - 1) div c"))
    )
    return x.select(
        F.expr("prev_terms + k_extra").cast("long").alias("vocab_size"),
        F.expr("prev_mass + k_extra * c").cast("long").alias("covered_tokens"),
        F.col("n_total").cast("long").alias("total_tokens"),
        (
            F.expr("prev_mass + k_extra * c").cast("double")
            / F.col("n_total").cast("double")
        ).alias("coverage"),
    )


def normalize_text(text: Column) -> Column:
    """C4-style cleaning normalization as one codegen expression chain:
    lowercase → strip non-printable/control chars → collapse whitespace
    runs to single spaces → trim.  Patterns restricted to constructs
    Java regex and RE2-family engines compile identically (explicit
    char classes, no \\p{...} properties, no lookaround), so an oracle
    can run the same chain verbatim.  Idempotent: applying it twice is
    the identity on its own output (pinned by test)."""
    c = F.lower(text)
    c = F.regexp_replace(c, "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]", "")
    c = F.regexp_replace(c, "[ \\t\\n\\r]+", " ")
    return F.trim(c)

def _cm_bucket(term: Column, d: int, hex_digits: int) -> Column:
    """Count-min bucket for sketch row ``d``: ``hex_digits`` hex chars
    of the term's single md5 digest, sliced at offset 3·d — ONE digest
    serves every row (the minhash slice trick, dedup.py), and the value
    is reproducible verbatim in DuckDB via the strpos hex ladder."""
    return F.conv(F.substring(F.md5(term), 3 * d + 1, hex_digits), 16, 10).cast("int")


def top_terms(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 20,
    approx: bool = False,
    depth: int = 5,
    hex_digits: int = 3,
    candidate_hex_lt: int = 16,
) -> DataFrame:
    """Corpus-wide top-``k`` terms (the x72 vocabulary-head monitor) with
    an optional count-min-sketch path for corpora whose *distinct-term
    table* is itself too large to shuffle comfortably.

    ``approx=False`` (default, what x72 ships): token explode →
    two-phase (term) count → top-k window.  Exact; shuffle cardinality
    is the vocabulary.

    ``approx=True``: the sub-linear swap, oracle-checkable end to end
    (query x79).  Two bounded structures replace the vocabulary-sized
    agg, both built from the repo's portable md5 hash family so DuckDB
    can recompute the identical sketch:

    1. **Count-min sketch** — row ``d``'s bucket is ``hex_digits`` hex
       chars of md5(term) sliced at offset 3·d (one digest per token,
       ``depth`` slices — the minhash slice trick; width = 16^hex_digits,
       default 4096).  A two-phase count over (row, bucket) yields
       ≤ depth·width rows *after map-side combine*, independent of
       vocabulary size.  Estimates are min-over-rows and **never
       under-count** (classic CM one-sided guarantee; over-count
       ≤ e·N/width w.p. 1−e^−depth).
    2. **Candidate discovery by hash-threshold token sampling** — keep
       tokens whose md5(doc_id:pos) first hex digit < ``candidate_hex_lt``
       (rate = candidate_hex_lt/16; 16 ⇒ every token).  A term with true
       count c survives a rate-r sample w.p. 1−(1−r)^c, so heavy terms
       always appear; rand-free and deterministic under any partitioning.

    Candidates probe the sketch via posexplode(depth buckets) → an
    equi-join against the ≤ depth·width-row sketch (broadcast — a few
    thousand rows at any corpus scale) → min() per term → top-k.

    100 TB sizing rule (same spirit as BENCH_NOTES' n_planes rule):
    ``16^hex_digits ≥ e·N_tokens/(allowed absolute error)`` and
    ``candidate rate ≥ ~5/expected-min-top-k-count`` — both independent
    of vocabulary, which is the point.

    Returns (term, n, rn) — identical shape/semantics to x72; on the
    approx path ``n`` is the CM estimate (= exact when the sketch is
    collision-free at the probed terms, pinned by test on the fixture).
    """
    if approx and 3 * (depth - 1) + hex_digits > 32:
        raise ValueError("depth*3 + hex_digits exceeds the md5 digest length")
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(WORD_PATTERN), F.lit(0))
        ).alias("pos", "term"),
    )
    if not approx:
        counted = toks.groupBy("term").agg(F.count("*").cast("long").alias("n"))
    else:
        buckets = F.array(
            *[_cm_bucket(F.col("term"), d, hex_digits) for d in range(depth)]
        )
        sketch = (
            toks.select(F.posexplode(buckets).alias("row", "bucket"))
            .groupBy("row", "bucket")
            .agg(F.count("*").cast("long").alias("n"))
        )
        candidates = (
            toks.where(
                F.substring(
                    F.md5(F.concat_ws(":", F.col("doc_id"), F.col("pos"))), 1, 1
                )
                < F.lit(format(candidate_hex_lt, "x"))
                if candidate_hex_lt < 16
                else F.lit(True)
            )
            .select("term")
            .distinct()
        )
        counted = (
            candidates.select("term", F.posexplode(buckets).alias("row", "bucket"))
            .join(F.broadcast(sketch), ["row", "bucket"])
            .groupBy("term")
            .agg(F.min("n").alias("n"))
        )
    w = Window.orderBy(F.desc("n"), "term")
    return (
        counted.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= k)
        .select("term", "n", "rn")
    )


def _bucketed_tokens(
    df: DataFrame, cols: list[str], text_col: str, hex_digits: int,
    word_pattern: str = WORD_PATTERN,
) -> DataFrame:
    """(cols..., b) — one row per token instance, bucketed by the
    portable md5 slice (first ``hex_digits`` hex chars as int64)."""
    return df.select(
        *cols,
        F.explode(
            F.regexp_extract_all(
                F.lower(F.col(text_col)), F.lit(word_pattern), F.lit(0)
            )
        ).alias("t"),
    ).select(
        *cols,
        F.conv(F.substring(F.md5(F.col("t")), 1, hex_digits), 16, 10)
        .cast("long")
        .alias("b"),
    )


def importance_ratio_table(
    docs: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    hex_digits: int = 2,
    scale: int = 10**6,
) -> DataFrame:
    """The (b, ratio_fp) bucket-ratio profile behind
    :func:`hashed_importance_weights`, exposed for the snapshot-probe
    lifecycle: build ONCE from the standing corpus + target, persist
    the FULL 16^``hex_digits``-row grid (every bucket present, so a
    later batch token can never miss the table), and score each daily
    batch against the snapshot at O(batch) — the x85/x86 contract
    applied to DSIR scoring.  Buckets neither corpus touched carry
    the add-one floor ratio."""
    n_buckets = 16**hex_digits
    toks = _bucketed_tokens(docs, [], text_col, hex_digits)
    t_toks = _bucketed_tokens(target, [], text_col, hex_digits)
    raw_counts = toks.groupBy("b").agg(F.count("*").cast("long").alias("c_r"))
    t_counts = t_toks.groupBy("b").agg(F.count("*").cast("long").alias("c_t"))
    raw_total = raw_counts.agg(
        F.coalesce(F.sum("c_r"), F.lit(0)).cast("long").alias("n_r")
    )
    t_total = t_counts.agg(
        F.coalesce(F.sum("c_t"), F.lit(0)).cast("long").alias("n_t")
    )
    grid = docs.sparkSession.range(n_buckets).select(F.col("id").alias("b"))
    return (
        grid.join(raw_counts, "b", "left")
        .join(t_counts, "b", "left")
        .join(F.broadcast(raw_total))
        .join(F.broadcast(t_total))
        .selectExpr(
            "b",
            f"CAST((coalesce(c_t, CAST(0 AS LONG)) + 1) * CAST({scale} AS LONG)"
            f" div (n_t + {n_buckets}) AS LONG) AS pt_fp",
            f"CAST((coalesce(c_r, CAST(0 AS LONG)) + 1) * CAST({scale} AS LONG)"
            f" div (n_r + {n_buckets}) AS LONG) AS pr_fp",
        )
        .selectExpr(
            "b",
            f"CAST(pt_fp * CAST({scale} AS LONG)"
            " div greatest(CAST(1 AS LONG), pr_fp) AS LONG) AS ratio_fp",
        )
    )


def hashed_importance_weights(
    docs: DataFrame,
    target: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    hex_digits: int = 2,
    scale: int = 10**6,
    ratios: DataFrame | None = None,
) -> DataFrame:
    """DSIR-style data-selection affinity scores (cf. Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling"):
    score every raw document by how much its HASHED-unigram profile
    looks like a small target corpus (the high-quality set you wish
    the whole crawl resembled) relative to the raw distribution —
    the published recipe for choosing pretraining data that matches a
    target domain without training a classifier.

    Feature space: tokens hash into 16^``hex_digits`` buckets via the
    repo's portable md5 slice (first ``hex_digits`` hex chars — the
    DuckDB strpos-ladder family), so both distributions are BOUNDED
    tables (default 256 rows) regardless of vocabulary — DSIR's
    hashed-n-gram trick, and the reason this scales: the raw corpus
    contributes one 256-group count, never a vocabulary-sized table.

    Arithmetic contract (the no-libm convention, unigram_surprisal's
    integer-ratio surrogate): DSIR weights are products of per-token
    probability ratios (sums of logs); this operator scores the
    order-preserving integer surrogate

        p_fp(b)     = (c(b)+1) * scale  div (N+B)      (add-one smoothed,
                                                        fixed point)
        ratio_fp(b) = p_t_fp(b) * scale div max(1, p_r_fp(b))
        affinity    = sum over token instances of ratio_fp(bucket)

    — per-token monotone in the true ratio, bit-identical across
    engines (integer div only; the mean is ONE IEEE division).
    Ceilings: ratio_fp ≤ scale², so a doc's int64 sum holds to
    n_tokens < 2^63/scale² ≈ 9e5 tokens per doc at the default scale
    (drop ``scale`` to 10**4 for book-length docs); bucket counts and
    totals are plain int64 corpus counts.

    Scale shape: the target profile is a ≤B-row table built from the
    (small) target corpus; the raw profile is one map-side-combined
    B-group count over the corpus; both broadcast into the token
    stream (B rows), so the only corpus-sized shuffle is the final
    per-doc aggregation — the same two-shuffle shape as
    unigram_surprisal with the vocabulary join replaced by a bounded
    broadcast.

    ``ratios``: a persisted (b, ratio_fp) snapshot from
    :func:`importance_ratio_table` — scoring skips both profile
    builds and the run costs O(batch) (the snapshot-probe lifecycle);
    ``target`` is ignored and may be None.  Exactly one of ``target``
    / ``ratios`` must be given.

    Returns (doc_id, n_tokens, affinity_sum, avg_affinity) for every
    raw doc with ≥1 token; rank by avg_affinity and keep the top
    slice (or sample ∝ affinity via sampling.systematic_pps_sample)
    to assemble the target-matched training set."""
    if (target is None) == (ratios is None):
        raise ValueError("pass exactly one of target= or ratios=")
    toks = _bucketed_tokens(
        docs.select(F.col(id_col).alias("doc_id"), F.col(text_col)),
        ["doc_id"],
        text_col,
        hex_digits,
    )
    buckets = (
        ratios
        if ratios is not None
        else importance_ratio_table(docs, target, text_col, hex_digits, scale)
    )
    return (
        toks.join(F.broadcast(buckets.select("b", "ratio_fp")), "b")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum("ratio_fp").cast("long").alias("affinity_sum"),
        )
        .withColumn(
            "avg_affinity",
            F.col("affinity_sum").cast("double") / F.col("n_tokens").cast("double"),
        )
    )


GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality_flags(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """The Gopher/MassiveText repetition-free quality rule set (Rae et
    al. 2021, Appendix A1 — the published heuristic filter every
    modern pretraining pipeline starts from), evaluated as PURE
    INTEGER comparisons so every rule is bit-identical across engines
    (ratios become cross-multiplications: mean word length in [3,10]
    is ``3·n ≤ Σlen ≤ 10·n`` — no division anywhere):

      r_word_count     50 ≤ words ≤ 100 000
      r_mean_word_len  3 ≤ Σlen(word)/words ≤ 10
      r_alpha_words    ≥ 80% of words contain a letter (5·alpha ≥ 4·n)
      r_stopwords      ≥ 2 distinct stopwords of the canonical 8
      r_ellipsis_lines ≤ 30% of lines end with "..."
      r_bullet_lines   ≤ 90% of lines start with a bullet (-, *, •)
      r_symbol_ratio   (# + ellipsis occurrences) ≤ 10% of words

    Words are the whitespace-token convention (dedup.tokens); lines
    split on newline.  Everything is one codegen projection over the
    scan — array_size/filter/aggregate on per-doc arrays, NO shuffle,
    NO UDF; a 100 TB corpus pays exactly one pass.  Flags are int
    0/1 (the is_seed convention) plus ``passes`` = AND of all seven.

    Returns (doc_id, n_words, r_word_count, r_mean_word_len,
    r_alpha_words, r_stopwords, r_ellipsis_lines, r_bullet_lines,
    r_symbol_ratio, passes)."""
    ws = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    lines = F.split(F.col(text_col), "\n")

    def _b(c: Column) -> Column:
        return c.cast("int")

    bound = F.array(ws)  # bind token array once (the all_shingles rule)

    def _over_ws(f) -> Column:
        return F.element_at(F.transform(bound, f), 1)

    n_words = _over_ws(lambda t: F.size(F.filter(t, lambda w: w != "")))
    sum_len = _over_ws(
        lambda t: F.aggregate(
            t, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
        )
    )
    n_alpha = _over_ws(
        lambda t: F.size(F.filter(t, lambda w: w.rlike("[a-z]")))
    )
    n_stop = _over_ws(
        lambda t: F.size(
            F.filter(
                F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]),
                lambda s: F.array_contains(t, s),
            )
        )
    )
    n_lines = F.size(lines)
    n_ellipsis = F.size(F.filter(lines, lambda l: l.endswith("...")))
    n_bullet = F.size(
        F.filter(
            lines,
            lambda l: F.ltrim(l).startswith("-")
            | F.ltrim(l).startswith("*")
            | F.ltrim(l).startswith("•"),
        )
    )
    c_hash = F.length(F.col(text_col)) - F.length(
        F.regexp_replace(F.col(text_col), "#", "")
    )
    c_ell = (
        F.length(F.col(text_col))
        - F.length(F.regexp_replace(F.col(text_col), r"\.\.\.", ""))
    ) / 3
    flags = docs.select(
        F.col(id_col).alias("doc_id"),
        n_words.cast("long").alias("n_words"),
        sum_len.alias("_sum_len"),
        n_alpha.cast("long").alias("_n_alpha"),
        n_stop.cast("long").alias("_n_stop"),
        n_lines.cast("long").alias("_n_lines"),
        n_ellipsis.cast("long").alias("_n_ell"),
        n_bullet.cast("long").alias("_n_bul"),
        (c_hash + c_ell).cast("long").alias("_c_sym"),
    )
    out = flags.select(
        "doc_id",
        "n_words",
        _b((F.col("n_words") >= 50) & (F.col("n_words") <= 100_000)).alias(
            "r_word_count"
        ),
        _b(
            (F.col("_sum_len") >= 3 * F.col("n_words"))
            & (F.col("_sum_len") <= 10 * F.col("n_words"))
        ).alias("r_mean_word_len"),
        _b(5 * F.col("_n_alpha") >= 4 * F.col("n_words")).alias("r_alpha_words"),
        _b(F.col("_n_stop") >= 2).alias("r_stopwords"),
        _b(10 * F.col("_n_ell") <= 3 * F.col("_n_lines")).alias(
            "r_ellipsis_lines"
        ),
        _b(10 * F.col("_n_bul") <= 9 * F.col("_n_lines")).alias("r_bullet_lines"),
        _b(10 * F.col("_c_sym") <= F.col("n_words")).alias("r_symbol_ratio"),
    )
    rule_cols = [c for c in out.columns if c.startswith("r_")]
    expr = F.col(rule_cols[0])
    for c in rule_cols[1:]:
        expr = expr * F.col(c)
    return out.withColumn("passes", expr.cast("int"))


def hashed_lang_id(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    hex_digits: int = 2,
    scale: int = 10**6,
) -> DataFrame:
    """Language RE-identification by hashed-profile argmax — the
    multi-target generalization of :func:`hashed_importance_weights`:
    build one hashed-unigram profile PER declared language, score
    every document against every profile (the integer likelihood-
    ratio surrogate vs the corpus-wide distribution), and predict the
    argmax language.  Comparing the prediction against the document's
    declared ``lang_col`` is the metadata-trust audit a multilingual
    pipeline runs before per-language processing — mislabeled
    documents poison per-language thresholds (x139/x145) and
    per-language models.

    Determinism: scores are exact int64 sums of fixed-point bucket
    ratios (same arithmetic as x143 — add-one smoothing, truncating
    div only), argmax ties break on the SMALLEST language string —
    bit-stable across engines and partitionings.

    Scale shape: the token stream collapses once into a per-doc
    bucket tf table (≤ 16^``hex_digits`` rows per doc); per-language
    profiles are (lang, bucket) counts — |langs|·B rows, broadcast;
    the scoring join fans the BUCKET TABLE (not the token stream) out
    by |langs|, and the argmax window partitions by doc over |langs|
    rows — the corpus is shuffled exactly twice (bucket agg, score
    agg), independent of language count.

    Returns (doc_id, claimed, pred, agree) — agree int 0/1; docs with
    no tokens are absent (nothing to score)."""
    n_buckets = 16**hex_digits
    bucket = lambda c: F.conv(F.substring(F.md5(c), 1, hex_digits), 16, 10).cast(  # noqa: E731
        "long"
    )
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(lang_col).alias("claimed"),
        F.explode(
            F.regexp_extract_all(
                F.lower(F.col(text_col)), F.lit(WORD_PATTERN), F.lit(0)
            )
        ).alias("t"),
    ).select("doc_id", "claimed", bucket(F.col("t")).alias("b"))
    doc_tf = toks.groupBy("doc_id", "claimed", "b").agg(
        F.count("*").cast("long").alias("tf")
    )
    lang_counts = toks.groupBy(F.col("claimed").alias("lang"), "b").agg(
        F.count("*").cast("long").alias("c_t")
    )
    lang_totals = lang_counts.groupBy("lang").agg(
        F.sum("c_t").cast("long").alias("n_t")
    )
    raw_counts = toks.groupBy("b").agg(F.count("*").cast("long").alias("c_r"))
    raw_total = raw_counts.agg(
        F.coalesce(F.sum("c_r"), F.lit(0)).cast("long").alias("n_r")
    )
    # every (lang, bucket-any-corpus-touched) cell, add-one smoothed
    all_b = raw_counts.select("b").distinct()
    grid = lang_totals.crossJoin(all_b)
    ratios = (
        grid.join(lang_counts, ["lang", "b"], "left")
        .join(raw_counts, "b")
        .join(F.broadcast(raw_total))
        .selectExpr(
            "lang",
            "b",
            f"CAST((coalesce(c_t, CAST(0 AS LONG)) + 1) * CAST({scale} AS LONG)"
            f" div (n_t + {n_buckets}) AS LONG) AS pt_fp",
            f"CAST((c_r + 1) * CAST({scale} AS LONG)"
            f" div (n_r + {n_buckets}) AS LONG) AS pr_fp",
        )
        .selectExpr(
            "lang",
            "b",
            f"CAST(pt_fp * CAST({scale} AS LONG)"
            " div greatest(CAST(1 AS LONG), pr_fp) AS LONG) AS ratio_fp",
        )
    )
    scored = (
        doc_tf.join(F.broadcast(ratios), "b")
        .groupBy("doc_id", "claimed", "lang")
        .agg(F.sum(F.col("tf") * F.col("ratio_fp")).cast("long").alias("score"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("lang"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "doc_id",
            "claimed",
            F.col("lang").alias("pred"),
            (F.col("lang") == F.col("claimed")).cast("int").alias("agree"),
        )
    )


# Script classes for the language-ID candidate prefilter: bit i of a
# text's script mask is set when the lowered text contains at least one
# character of class i.  Deliberately coarse (a handful of Unicode
# ranges, not a full property database) — the mask's job is CANDIDATE
# PRUNING, never classification: a Cyrillic-only document should never
# pay a score against 40 Latin-script profiles.  Orthogonal languages
# sharing a script (en/es/de/fr) stay mutual candidates by design.
SCRIPT_CLASSES: tuple[tuple[str, str], ...] = (
    ("latin", "[a-z]"),
    ("cyrillic", "[а-яё]"),
    ("greek", "[α-ω]"),
    ("cjk", "[一-鿿]"),
    ("arabic", "[؀-ۿ]"),
)

# Token pattern for the LANGUAGE-ID family: runs of characters from ANY
# script class above (explicit BMP ranges only — identical semantics in
# Java regex and RE2/DuckDB, unlike \\p{L}) — the repo-wide WORD_PATTERN
# is [a-z]+, which would make non-Latin documents token-invisible to
# the very operator whose job is telling scripts apart.  CJK "words"
# are character runs (no segmentation) — deterministic, and adequate
# for hashed-bucket profiles.
LANG_WORD_PATTERN = "[" + "".join(pat[1:-1] for _, pat in SCRIPT_CLASSES) + "]+"


def script_mask(text_col: Column) -> Column:
    """int64 bitmask of :data:`SCRIPT_CLASSES` present in the lowered
    text — one codegen projection (|classes| rlike tests), no UDF."""
    lowered = F.lower(text_col)
    mask = F.lit(0).cast("long")
    for i, (_, pat) in enumerate(SCRIPT_CLASSES):
        mask = mask + F.when(lowered.rlike(pat), F.lit(1 << i)).otherwise(
            F.lit(0)
        ).cast("long")
    return mask


def lang_ratio_profiles(
    base: DataFrame,
    lang_col: str = "lang",
    text_col: str = "text",
    hex_digits: int = 2,
    scale: int = 10**6,
) -> DataFrame:
    """The PER-LANGUAGE (lang, b, ratio_fp) bucket-ratio profiles
    behind :func:`hashed_lang_id`, exposed for the snapshot-probe
    lifecycle (:func:`importance_ratio_table`'s multi-target sibling):
    build ONCE from a standing labeled corpus, persist the FULL
    |langs| × 16^``hex_digits`` grid (every bucket present for every
    language, so a later batch token can never miss the table —
    untouched cells carry the add-one floor), and score daily batches
    against the snapshot at O(batch).  Same integer arithmetic as
    :func:`hashed_lang_id` (add-one smoothing, truncating div only),
    with the grid extended from corpus-touched buckets to ALL buckets
    — the snapshot must cover tokens the base corpus never saw.

    Scale shape: the base corpus is shuffled twice (per-lang bucket
    agg, raw bucket agg — both map-side combined to ≤ |langs|·B and B
    groups); the grid join is |langs|·B rows.  The profile is the
    nightly-build artifact; probing never re-runs it."""
    n_buckets = 16**hex_digits
    toks = _bucketed_tokens(
        base.select(F.col(lang_col).alias("lang"), F.col(text_col)),
        ["lang"],
        text_col,
        hex_digits,
        word_pattern=LANG_WORD_PATTERN,
    )
    lang_counts = toks.groupBy("lang", "b").agg(
        F.count("*").cast("long").alias("c_t")
    )
    lang_totals = lang_counts.groupBy("lang").agg(
        F.sum("c_t").cast("long").alias("n_t")
    )
    raw_counts = toks.groupBy("b").agg(F.count("*").cast("long").alias("c_r"))
    raw_total = raw_counts.agg(
        F.coalesce(F.sum("c_r"), F.lit(0)).cast("long").alias("n_r")
    )
    grid = base.sparkSession.range(n_buckets).select(F.col("id").alias("b"))
    return (
        lang_totals.crossJoin(grid)
        .join(lang_counts, ["lang", "b"], "left")
        .join(raw_counts, "b", "left")
        .join(F.broadcast(raw_total))
        .selectExpr(
            "lang",
            "b",
            f"CAST((coalesce(c_t, CAST(0 AS LONG)) + 1) * CAST({scale} AS LONG)"
            f" div (n_t + {n_buckets}) AS LONG) AS pt_fp",
            f"CAST((coalesce(c_r, CAST(0 AS LONG)) + 1) * CAST({scale} AS LONG)"
            f" div (n_r + {n_buckets}) AS LONG) AS pr_fp",
        )
        .selectExpr(
            "lang",
            "b",
            f"CAST(pt_fp * CAST({scale} AS LONG)"
            " div greatest(CAST(1 AS LONG), pr_fp) AS LONG) AS ratio_fp",
        )
    )


def lang_script_masks(
    base: DataFrame, lang_col: str = "lang", text_col: str = "text"
) -> DataFrame:
    """(lang, mask): each language's observed script signature —
    the bit-OR of its base documents' :func:`script_mask` — persisted
    next to the ratio profiles as the candidate-prefilter sidecar."""
    return (
        base.select(
            F.col(lang_col).alias("lang"), script_mask(F.col(text_col)).alias("m")
        )
        .groupBy("lang")
        .agg(F.bit_or("m").cast("long").alias("mask"))
    )


def lang_id_from_snapshot(
    batch: DataFrame,
    ratios: DataFrame,
    masks: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    hex_digits: int = 2,
) -> DataFrame:
    """Language re-identification against a PERSISTED profile snapshot
    — the measured remedy for :func:`hashed_lang_id`'s scale curve
    (BENCH_NOTES x149, 10.57× at ×100: profiles rebuilt in-query AND
    the per-doc bucket table fanned out by |langs| through the score
    shuffle).  Two structural changes:

    1. **Snapshot probe** (the x85/x155 contract): ``ratios`` /
       ``masks`` come from :func:`lang_ratio_profiles` /
       :func:`lang_script_masks` persisted once per corpus refresh;
       per-run work is O(batch).
    2. **No per-language fanout**: the |langs|·B profile is PIVOTED to
       one ratio column per language (a plan-time broadcast — the
       language list is a bounded collect, the deliberate-collect
       convention) and joined into the batch's bucket table map-side,
       so the ONLY shuffle is the per-doc aggregation carrying |langs|
       int64 partial sums per group — rows = batch docs, independent
       of language count, map-side combined.  The x149 form shuffled
       docs × |langs| rows.

    **Script-range candidate prefilter**: a document only competes
    among languages whose persisted script mask intersects its own
    (:func:`script_mask`); a zero mask on either side keeps the
    candidate (never silently unpredictable).  With 100+ languages the
    prefilter turns the argmax over all profiles into an argmax over
    the document's script family; on a single-script corpus it prunes
    nothing and costs one projection (documented fixture limitation).
    A document with NO candidate scores predicts ``'und'``.

    Determinism: integer scores (ceiling: doc tokens < 2^63/scale² ≈
    9e5 at the default scale — x143's bound), argmax ties break on the
    SMALLEST language string (greatest + first-match-in-sorted-order).
    Docs with no tokens are absent (nothing to score).

    Returns (doc_id, claimed, pred, agree)."""
    langs = sorted(r["lang"] for r in masks.select("lang").distinct().collect())
    if not langs:
        raise ValueError("empty language snapshot")
    mask_of = {
        r["lang"]: int(r["mask"]) for r in masks.select("lang", "mask").collect()
    }
    piv = (
        ratios.groupBy("b")
        .pivot("lang", langs)
        .agg(F.first("ratio_fp"))
        .select("b", *[F.col(f"`{g}`").alias(f"_r{i}") for i, g in enumerate(langs)])
    )
    toks = _bucketed_tokens(
        batch.select(
            F.col(id_col).alias("doc_id"),
            F.col(lang_col).alias("claimed"),
            script_mask(F.col(text_col)).alias("dmask"),
            F.col(text_col),
        ),
        ["doc_id", "claimed", "dmask"],
        text_col,
        hex_digits,
        word_pattern=LANG_WORD_PATTERN,
    )
    # one row per token INSTANCE joins the broadcast pivot map-side, so
    # the per-doc sum of ratio columns IS Σ tf·ratio — the corpus pays
    # exactly ONE shuffle (the doc-keyed agg, map-side combined),
    # independent of |langs|
    scored = (
        toks.join(F.broadcast(piv), "b")
        .groupBy("doc_id", "claimed", "dmask")
        .agg(
            *[
                F.sum(F.col(f"_r{i}")).cast("long").alias(f"_s{i}")
                for i in range(len(langs))
            ]
        )
    )
    # candidate gate per language: lang mask 0 / doc mask 0 keep it
    eff = []
    for i, g in enumerate(langs):
        m = mask_of[g]
        cand = (
            F.lit(m == 0)
            | (F.col("dmask") == 0)
            | (F.col("dmask").bitwiseAND(F.lit(m)) != 0)
        )
        eff.append(F.when(cand, F.col(f"_s{i}")))
    best = F.greatest(*eff) if len(eff) > 1 else eff[0]
    pred = F.lit(None).cast("string")
    for i, g in reversed(list(enumerate(langs))):
        pred = F.when(eff[i] == best, F.lit(g)).otherwise(pred)
    return scored.select(
        "doc_id",
        "claimed",
        F.coalesce(pred, F.lit("und")).alias("pred"),
        (F.coalesce(pred, F.lit("und")) == F.col("claimed")).cast("int").alias(
            "agree"
        ),
    )


def dup_ngram_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_top: int = 2,
    n_dup: int = 5,
) -> DataFrame:
    """The REPETITION half of the Gopher filter (Rae et al. 2021,
    Appendix A1's dup-ngram rules — :func:`gopher_quality_flags`
    covers the structural half): per document,

      top{n}_frac  — characters covered by occurrences of the single
                     most frequent word ``n_top``-gram / all
                     ``n_top``-gram characters (rule: ≤ 0.20)
      dup{n}_frac  — characters in word ``n_dup``-grams occurring ≥ 2
                     times / all ``n_dup``-gram characters
                     (rule: ≤ 0.15)

    — the machine-generated-boilerplate detector (SEO spam repeats a
    2-gram; templated pages repeat whole 5-grams).  Character mass is
    ``length(gram)·count`` over the joined gram string (separators
    included — documented convention); rules are integer
    cross-multiplications (5·top ≤ total, 20·dup ≤ 3·total), the
    fractions one display division each.  Docs too short for a gram
    score 0.0 and pass vacuously.

    Scale shape: two explode → (doc, gram) two-phase hash aggs (the
    x51 shuffle shape, keyed on doc+gram) → per-doc aggregates →
    id-keyed joins back to the doc list — no corpus-wide window, no
    UDF.

    Returns (doc_id, top_frac, dup_frac, r_top, r_dup)."""
    from .dedup import all_shingles

    def _per_n(n: int, pref: str) -> DataFrame:
        g = docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(all_shingles(F.col(text_col), n)).alias("g"),
        )
        c = g.groupBy("doc_id", "g").agg(F.count("*").alias("c"))
        mass = F.length("g").cast("long") * F.col("c")
        return c.groupBy("doc_id").agg(
            F.sum(mass).cast("long").alias(f"{pref}_total"),
            F.max(mass).cast("long").alias(f"{pref}_top"),
            F.sum(F.when(F.col("c") >= 2, mass).otherwise(F.lit(0).cast("long")))
            .cast("long")
            .alias(f"{pref}_dup"),
        )
    base = docs.select(F.col(id_col).alias("doc_id"))
    j = (
        base.join(_per_n(n_top, "t"), "doc_id", "left")
        .join(_per_n(n_dup, "d"), "doc_id", "left")
        .na.fill(0, ["t_total", "t_top", "t_dup", "d_total", "d_top", "d_dup"])
    )
    return j.select(
        "doc_id",
        F.when(
            F.col("t_total") > 0,
            F.col("t_top").cast("double") / F.col("t_total").cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("top_frac"),
        F.when(
            F.col("d_total") > 0,
            F.col("d_dup").cast("double") / F.col("d_total").cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("dup_frac"),
        (5 * F.col("t_top") <= F.col("t_total")).cast("int").alias("r_top"),
        (20 * F.col("d_dup") <= 3 * F.col("d_total")).cast("int").alias("r_dup"),
    )



def _log2_bucket(col: Column) -> Column:
    """floor(log2(v+1)) as pure integer/string ops — length of the
    binary expansion minus one (``conv`` base-2 ↔ DuckDB ``bin``), so
    the bucket id is engine-exact with no libm in sight."""
    return (
        F.length(F.conv((col + F.lit(1)).cast("string"), 10, 2)) - F.lit(1)
    ).cast("long")


def vocab_growth_curve(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Heaps'-law vocabulary growth audit — will MORE data keep buying
    new vocabulary, or has the type inventory saturated?  The planning
    twin of x87's coverage question (that one sizes a tokenizer for the
    corpus you have; this one says what the next decade of corpus does
    to it).

    Doc-id prefixes double per bucket (``bucket = floor(log2(id+1))``),
    and every distinct term is charged to the bucket of its FIRST
    document: ``cum_types`` at bucket b is then exactly the vocabulary
    of the prefix ``id < 2^{b+1}-1``, and (cum_tokens, cum_types) are
    points on the Heaps curve V = K·N^β — computed without ever
    scanning prefixes repeatedly.  One explode feeds two aggregations:
    per-term min-id (the only vocabulary-sized table, grouped on the
    term key) and per-bucket token totals (map-side combined); the
    cumulative windows run over the ≤64-row bucket table.  All
    integers; the log2 bucket is a binary-string length, not a float
    log."""
    toks = df.select(
        F.col(id_col).alias("_id"),
        F.explode(
            F.regexp_extract_all(
                F.lower(F.col(text_col)), F.lit(WORD_PATTERN), F.lit(0)
            )
        ).alias("t"),
    )
    first = toks.groupBy("t").agg(F.min("_id").alias("fd"))
    types_b = first.groupBy(_log2_bucket(F.col("fd")).alias("bucket")).agg(
        F.count("*").cast("long").alias("n_new_types")
    )
    toks_b = toks.groupBy(_log2_bucket(F.col("_id")).alias("bucket")).agg(
        F.count("*").cast("long").alias("n_tokens")
    )
    j = toks_b.join(types_b, "bucket", "left").select(
        "bucket",
        F.coalesce(F.col("n_new_types"), F.lit(0)).cast("long").alias("n_new_types"),
        "n_tokens",
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return j.select(
        "bucket",
        "n_new_types",
        F.sum("n_new_types").over(w).cast("long").alias("cum_types"),
        "n_tokens",
        F.sum("n_tokens").over(w).cast("long").alias("cum_tokens"),
    )


def zipf_bucket_histogram(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Zipf rank-frequency audit WITHOUT the rank: under Zipf's law the
    number of types with frequency in [2^b, 2^{b+1}) falls by ~2^s per
    bucket (s = the Zipf exponent), so the count-bucket histogram
    carries the whole diagnostic — no vocabulary-sized sort or global
    rank window anywhere (the rank formulation needs exactly that, and
    is why naive Zipf audits don't scale).  Output per bucket: type and
    token-instance counts plus the consecutive-bucket decay ratio
    ``ratio_fp = n_types(b) · 1000 div n_types(b+1)`` (≈ 2^s · 1000;
    2000 ⇒ s=1, the natural-text line; well under that ⇒ synthetic or
    truncated-vocabulary text — a fast corpus-forensics signal).

    One explode → term-keyed count (the only vocabulary-sized table,
    grouped on its key) → ≤64-row bucket histogram; the lead window
    runs over the bucket table only.  Integer log2 is the
    binary-string length (``_log2_bucket``), libm-free."""
    toks = df.select(
        F.explode(
            F.regexp_extract_all(
                F.lower(F.col(text_col)), F.lit(WORD_PATTERN), F.lit(0)
            )
        ).alias("t")
    )
    counts = toks.groupBy("t").agg(F.count("*").cast("long").alias("c"))
    hist = counts.groupBy(
        _log2_bucket(F.col("c") - F.lit(1)).alias("bucket")
    ).agg(
        F.count("*").cast("long").alias("n_types"),
        F.sum("c").cast("long").alias("n_tokens"),
    )
    w = Window.orderBy("bucket")
    return (
        hist.withColumn("lead_types", F.lead("n_types").over(w))
        .select(
            "bucket",
            "n_types",
            "n_tokens",
            F.when(
                F.col("lead_types").isNotNull(),
                F.expr("n_types * 1000 DIV lead_types"),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("ratio_fp"),
        )
    )


def corpus_datasheet(df: DataFrame, text_col: str = "text") -> DataFrame:
    """The "datasheet for the dataset" headline table (cf. Gebru et al.
    2021): one long-format (metric, value) summary a release pipeline
    stamps on every corpus snapshot — sizes, composition cardinality,
    exact-duplicate mass, vocabulary, and the longest document, each an
    integer so the sheet diffs cleanly between snapshots (the x136
    snapshot-diff audit consumes exactly this shape).

    TWO scans total: every row-level metric — counts, sums, the three
    distinct cardinalities (langs, sources, x01's digest distinct) and
    the max — folds into ONE aggregate over one scan (Spark plans the
    mixed distinct aggregates with a single Expand, not one pass per
    metric; the naive one-union-per-metric form read the table eight
    times), unpivoted to long format via stack; the vocabulary size
    needs the token explode and is the second scan.  Nothing here is
    new machinery; the value is the single-call composition."""
    ntok = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    wide = df.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(ntok).cast("long").alias("n_tokens"),
        F.sum(F.length(text_col)).cast("long").alias("n_chars"),
        F.countDistinct("lang").cast("long").alias("n_langs"),
        F.countDistinct("source").cast("long").alias("n_sources"),
        (F.count("*") - F.countDistinct(F.md5(F.col(text_col))))
        .cast("long")
        .alias("n_exact_dup_docs"),
        F.max(ntok).cast("long").alias("max_doc_tokens"),
    )
    row_metrics = wide.select(
        F.expr(
            "stack(7, 'n_docs', n_docs, 'n_tokens', n_tokens, 'n_chars', n_chars, "
            "'n_langs', n_langs, 'n_sources', n_sources, "
            "'n_exact_dup_docs', n_exact_dup_docs, 'max_doc_tokens', max_doc_tokens) "
            "AS (metric, value)"
        )
    )
    vocab = (
        df.select(
            F.explode(
                F.regexp_extract_all(
                    F.lower(F.col(text_col)), F.lit(WORD_PATTERN), F.lit(0)
                )
            ).alias("t")
        )
        .agg(F.countDistinct("t").cast("long").alias("value"))
        .select(F.lit("vocab_size").alias("metric"), "value")
    )
    return row_metrics.unionByName(vocab)
