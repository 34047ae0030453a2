"""Lexical retrieval: BM25 scoring, top-k search, and a persisted
inverted index with partition-pruned serving.

The reference has no lexical retrieval surface (its analytics stop at
SQL aggregates — SURVEY.md §2); this module belongs to the
training-data-pipeline extension tier: BM25 top-k is the workhorse
behind retrieval-based decontamination (flag training documents an
eval-suite query would retrieve), hard-negative mining for embedding
training, and corpus QA ("what does the corpus say about X").  It
complements the ANN tier (``operators/similarity.py`` /
``operators/ann_index.py``): same serve-from-a-persisted-index shape,
lexical instead of dense.

Tokenization is shared with ``operators/textstats.py``
(``WORD_PATTERN`` letter runs over lowered text — RE2/Java-identical),
so tf tables here and n-gram tables there agree on what a term is.

Fixed-point BM25 (cross-engine exact)
-------------------------------------
Okapi BM25 with k1 = 6/5 and b = 3/4 (the textbook 1.2/0.75 as exact
rationals).  The float form is

    idf(t)      = (N - df + 1/2) / (df + 1/2)          [Robertson's
                  odds ratio WITHOUT the log — see below]
    satur(t, d) = tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
    score(q, d) = sum over matched terms of idf * satur

Per the repo's no-libm contract (BENCH_NOTES / the surprisal ladder):
``ln`` would compare two libm implementations that only promise 1-ulp
accuracy, so the idf keeps the raw odds ratio — a monotone per-term
transform of the classic log idf.  Rankings for single-term matches
are identical; multi-term sums weight rare terms more sharply than
the log form (documented, deterministic, and what the oracle
computes).  Everything is then carried in int64 fixed point:

    A        = (L*Q) div N          avgdl at scale Q=1024; L = total
                                    tokens, N = docs with >=1 token
    idf_fp   = (S1*(2N - 2df + 1)) div (2df + 1)           S1 = 1024
    satur_fp = (S2*22*tf*A) div (10*tf*A + 3*A + 9*dl*Q)   S2 = 1024
    score_fp = sum(idf_fp * satur_fp)        scale S1*S2 = 2**20
    score    = score_fp / 2**20              one IEEE division, last

(22 = 10*(k1+1); the denominator is 10*A*(tf + 3/10 + (9/10)*dl*Q/A)
multiplied through.)  Every operation before the final display
division is int64 arithmetic — bit-identical in Spark and DuckDB.
Ties in score_fp break by doc_id ascending: the top-k set is a total
order.  Bounds: A fits while L*Q < 2**63 (L < 9e15 tokens, ~36 PB of
text); the per-term product is <= S1*(2N+1)*S2*2.2, so a 32-term query
sum stays inside int64 for N < ~1.2e12 documents — both documented
ceilings sit above the 100 TB design point, with per-language sharding
as the remedy beyond (same remedy as the KN ladder's nt**2 bound,
``operators/textstats.py``).

Edge cases (pinned by tests from day one — the round-5 empty-base
lesson): an empty corpus yields an empty result (A is NULL-guarded, no
division fires); a query term absent from the corpus contributes
nothing (inner join); a query whose terms all miss returns no rows for
that query_id; zero-token documents are unretrievable and excluded
from N and avgdl (they cannot match any term).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .textstats import WORD_PATTERN

Q_AVGDL = 1024  # avgdl fixed-point scale
S1_IDF = 1024  # idf fixed-point scale
S2_SATUR = 1024  # saturation fixed-point scale
SCORE_SCALE = S1_IDF * S2_SATUR  # 2**20
N_TERM_BUCKETS = 64  # inverted-index partition count


def doc_tokens(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, term) token stream — the single tokenization every
    consumer derives from."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(WORD_PATTERN), F.lit(0))
        ).alias("term"),
    )


def doc_term_freqs(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, term, tf) — one row per distinct doc-term.  The explode
    feeds a two-phase hash agg keyed (doc_id, term): the shuffle
    carries one count per distinct doc-term, never the token stream."""
    return (
        doc_tokens(docs, id_col, text_col)
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("long").alias("tf"))
    )


def doc_lengths(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, dl) in tokens — a SCAN-SIDE array-size projection (no
    explode, no aggregation, no shuffle): dl = |tokens| is computable
    per row, and Spark's in-flight plans re-execute every aggregation
    subtree per consumer (the x100 finding), so the cheap projection
    form matters.  Zero-token docs are excluded — by design (module
    docstring: unretrievable, outside N and avgdl)."""
    dl = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(WORD_PATTERN), F.lit(0))
        )
        .cast("long")
        .alias("dl"),
    )
    return dl.filter(F.col("dl") > 0)


def _raw_stats(dl: DataFrame) -> DataFrame:
    """One-row (n, l): docs-with-tokens count and total token count.
    Raw sums — ADDITIVE across index generations, so a streamed index's
    per-batch stats rows aggregate to exactly the full-corpus values."""
    return dl.agg(
        F.count("*").cast("long").alias("n"),
        F.coalesce(F.sum("dl"), F.lit(0)).cast("long").alias("l"),
    )


def _avgdl_from_raw(raw: DataFrame) -> DataFrame:
    """(n, avgdl_fp) from (possibly multi-row) raw stats.  The fixed-
    point division happens ONCE, after summation — computing it at
    build time and again at serve time from the same (n, l) is the
    identical integer expression, so batch-built and streamed indexes
    score bit-equally.  NULL-guarded so an empty corpus never divides
    by zero."""
    return raw.agg(
        F.coalesce(F.sum("n"), F.lit(0)).cast("long").alias("n"),
        F.coalesce(F.sum("l"), F.lit(0)).cast("long").alias("l"),
    ).select(
        "n",
        F.when(F.col("n") > 0, F.expr(f"(l * {Q_AVGDL}) div n")).cast("long").alias("avgdl_fp"),
    )


def _avgdl_stats(dl: DataFrame) -> DataFrame:
    """One-row (n, avgdl_fp) straight from a dl table (the in-flight
    scoring path)."""
    return _avgdl_from_raw(_raw_stats(dl))


def _score_fp_col() -> F.Column:
    """The per-term fixed-point BM25 contribution (module docstring).
    Expects columns n, df, tf, dl, avgdl_fp in scope."""
    idf_fp = f"(({S1_IDF} * (2*n - 2*df + 1)) div (2*df + 1))"
    satur_fp = (
        f"(({S2_SATUR} * 22 * tf * avgdl_fp) div "
        f"(10 * tf * avgdl_fp + 3 * avgdl_fp + 9 * dl * {Q_AVGDL}))"
    )
    return F.expr(f"{idf_fp} * {satur_fp}").cast("long")


def _topk(scored: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(F.desc("score_fp"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "doc_id",
            "score_fp",
            "rank",
            (F.col("score_fp").cast("double") / float(SCORE_SCALE)).alias("score"),
        )
    )


def _top_terms(qtf: DataFrame, df_m: DataFrame, n_terms: int) -> DataFrame:
    """Top-``n_terms`` per query_id by LINEAR tf-idf (tf/df — the x40
    scorer: one integer/integer IEEE division, bit-exact cross-engine),
    ties by term ascending (total order).  A candidate term absent from
    ``df_m`` drops out (inner join — it cannot retrieve anything)."""
    scored = qtf.join(F.broadcast(df_m), "term").withColumn(
        "s", F.col("tf").cast("double") / F.col("df").cast("double")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("s"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= n_terms)
        .select("query_id", "term")
    )


def top_terms_queries(
    docs: DataFrame,
    doc_filter: F.Column,
    n_terms: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Derive a deterministic query workload from the corpus itself:
    for each document passing ``doc_filter``, its top-``n_terms`` most
    distinguishing terms by linear tf-idf (:func:`_top_terms`).
    Returns (query_id, term) = the benchmark-harness query set for
    :func:`bm25_topk` and the serving paths.

    df values are corpus-wide document frequencies, but aggregated only
    for the candidate docs' terms: the candidate term set broadcasts
    into the token stream, so the distinct-(term, doc) count covers
    O(candidate-term postings) rows — the full vocabulary is never
    aggregated.  Two documents scans total: the filter-pushed candidate
    scan and the df scan.  :func:`top_terms_from_index` is the
    zero-tokenization form when an inverted index exists."""
    qtf = (
        doc_tokens(docs.filter(doc_filter), id_col, text_col)
        .groupBy(F.col("doc_id").alias("query_id"), "term")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    cand_terms = qtf.select("term").distinct()
    df_m = (
        doc_tokens(docs, id_col, text_col)
        .join(F.broadcast(cand_terms), "term")
        .groupBy("term")
        .agg(F.count_distinct("doc_id").cast("long").alias("df"))
    )
    return _top_terms(qtf, df_m, n_terms)


def materialize_queries(queries: DataFrame) -> DataFrame:
    """Collect an O(batch) query workload and re-emit it as a LOCAL
    relation.  The scoring plan consumes the workload at two points
    (the distinct-term match filter and the query_id fan-out), and
    Spark materializes no shared subplans across consumers (the x100
    finding) — a DERIVED workload (e.g. :func:`top_terms_queries`)
    would re-run its tokenization per consumer.  A query workload is
    bounded by contract (the same bounded-collect class as the serve
    path's bucket list), so the collect is O(batch) and the local
    relation broadcasts for free."""
    spark = queries.sparkSession
    return spark.createDataFrame(queries.collect(), queries.schema)


def top_terms_from_index(
    spark: SparkSession, path: str, doc_filter: F.Column, n_terms: int = 3
) -> DataFrame:
    """:func:`top_terms_queries` read off the persisted inverted index:
    postings already carry (doc_id, term, tf, df), so query
    construction is one postings scan with a projection and the top-k
    window — no tokenization, no aggregation at all.  Selection is
    bit-identical (same tf/df values, same tie order)."""
    postings = spark.read.parquet(os.path.join(path, "postings"))
    qtf = postings.filter(doc_filter).select(
        F.col("doc_id").alias("query_id"), "term", "tf", "df"
    )
    scored = qtf.withColumn("s", F.col("tf").cast("double") / F.col("df").cast("double"))
    w = Window.partitionBy("query_id").orderBy(F.desc("s"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= n_terms)
        .select("query_id", "term")
    )


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """In-flight BM25 top-``k``: score every document of ``docs``
    against every query of ``queries`` (query_id, term) and keep each
    query's ``k`` best by (score_fp desc, doc_id asc).

    Returns (query_id, doc_id, score_fp, rank, score).

    ``queries`` must be DISTINCT (query_id, term) rows — a duplicated
    row would double-count its term (``top_terms_queries`` and
    ``top_terms_from_index`` emit distinct rows by construction).

    Scale shape: the query term set broadcasts (a query workload is
    O(batch)); token-stream rows survive the broadcast join only for
    matched terms, so the (doc_id, term) tf aggregation and everything
    after it carry O(matched postings) — integer counts, never text.
    df rides the matched tf table as a count window keyed term (one
    row per distinct matched doc-term, so the window count IS the
    document frequency — no separate corpus aggregation, no extra
    join).  dl is a scan-side array-size projection (no shuffle); AQE
    broadcasts the matched side of the dl join when it fits.  The
    final top-k is one window keyed query_id with a streaming row
    counter.  Two documents scans total: one for the match pass, one
    for the checkpointed (doc_id, dl) projection that serves both the
    per-doc join and the corpus stats (Spark materializes no shared
    subplans across consumers — the x100 finding — so without the
    checkpoint dl would tokenize twice, three scans in all); the
    persisted-index serve (:func:`bm25_serve`) is the at-scale form
    with ONE pruned postings scan."""
    qterms = queries.select("query_id", "term")
    matched_tf = (
        doc_tokens(docs, id_col, text_col)
        .join(F.broadcast(qterms.select("term").distinct()), "term")
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    w_df = Window.partitionBy("term")
    # dl is consumed twice (per-doc join + corpus stats) and Spark
    # re-executes shared subtrees per consumer (the x100 finding) — a
    # full regexp tokenization pass each.  Checkpointing the (doc_id,
    # dl) projection (8 B/doc) halves the operator's corpus scans:
    # tokenize once for the match pass, once for dl, instead of thrice.
    dl = doc_lengths(docs, id_col, text_col).localCheckpoint(eager=False)
    matched = (
        matched_tf.withColumn("df", F.count("*").over(w_df).cast("long"))
        .join(F.broadcast(qterms), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(_avgdl_stats(dl)))
    )
    scored = matched.groupBy("query_id", "doc_id").agg(
        F.sum(_score_fp_col()).cast("long").alias("score_fp")
    )
    return _topk(scored, k)


# ---------------------------------------------------------------------------
# Persisted inverted index
# ---------------------------------------------------------------------------


def term_bucket(term: F.Column, n_buckets: int = N_TERM_BUCKETS) -> F.Column:
    """Stable term -> partition mapping (Spark-side only; the oracle
    re-derives results from scratch and never needs it).  xxhash64 is
    deterministic across sessions and versions, so build and probe jobs
    agree on the layout — the same contract as the LSH/IVF bucket
    functions in ``operators/ann_index.py``."""
    return F.pmod(F.xxhash64(term), F.lit(n_buckets)).cast("int")


def write_inverted_index(
    docs: DataFrame,
    path: str,
    n_buckets: int = N_TERM_BUCKETS,
    id_col: str = "doc_id",
    text_col: str = "text",
    mode: str = "overwrite",
    store_positions: bool = False,
) -> None:
    """One pass over the corpus: the index build job.  Lays out

    - ``path/postings`` — (term, doc_id, tf, dl, df) partitioned by
      ``term_bucket``: df and dl are DENORMALIZED into the posting rows
      at build time (8 bytes each), so a probe needs ZERO corpus-side
      aggregation — it reads pruned buckets and scores.  All postings
      of a term live in exactly one partition.
    - ``path/stats`` — one row (n, avgdl_fp): the corpus stats the
      scoring formula needs.

    The write repartitions on the bucket key before ``partitionBy``
    (the x89 finding: misaligned writes make tasks x buckets small
    files and a measured 16x slower probe; aligned, each bucket is one
    contiguous file) and SORTS each bucket file by term: parquet
    row-group min/max stats on a sorted column turn the serve path's
    pushed ``term IN (batch terms)`` predicate into row-group
    SKIPPING — a probe reads only the row groups whose term range
    intersects the batch, not the whole bucket (the lexical analogue
    of partition pruning, one level finer).  ``build_fn`` contract
    with :func:`...ann_index.ensure_index`: overwrite-idempotent via
    ``mode="overwrite"``."""
    tf = doc_term_freqs(docs, id_col, text_col)
    dl = doc_lengths(docs, id_col, text_col)
    dfx = tf.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    postings = (
        tf.join(dl, "doc_id")
        .join(dfx, "term")
        .withColumn("term_bucket", term_bucket(F.col("term"), n_buckets))
    )
    if store_positions:
        # positional payload: ~1 int per token corpus-wide, the price
        # of phrase/proximity queries (phrase_search serves from it);
        # tf column is redundant with size(positions) but kept so the
        # BM25 serve path reads either layout unchanged
        pos = positional_postings(docs, id_col, text_col).select(
            "doc_id", "term", "positions"
        )
        postings = postings.join(pos, ["doc_id", "term"])
    (
        postings.repartition(F.col("term_bucket"))
        .sortWithinPartitions("term")
        .write.mode(mode)
        .partitionBy("term_bucket")
        .parquet(os.path.join(path, "postings"))
    )
    # raw (n, l), not the derived avgdl: raw sums are ADDITIVE, so a
    # streamed index's per-batch stats rows aggregate to the same
    # values and both layouts serve through one code path
    _raw_stats(dl).write.mode(mode).parquet(os.path.join(path, "stats"))


def bm25_serve(
    spark: SparkSession,
    queries: DataFrame,
    path: str,
    k: int = 5,
    n_buckets: int = N_TERM_BUCKETS,
    derived_df: bool = False,
) -> DataFrame:
    """BM25 top-``k`` served from the PERSISTED inverted index: the
    at-scale form of :func:`bm25_topk` (oracle-pinned bit-equal when
    the index was built from the same corpus).

    Per-run work is O(matched postings in the probed buckets): the
    batch's distinct terms are collected ONCE (bounded O(batch) — the
    bounded-collect convention of ``ann_index.knn_join_index``) and
    pushed down twice: their buckets as an IN-list PARTITION filter
    (directory pruning) and the terms themselves as a parquet IN
    predicate, which skips row groups inside each bucket because the
    build sorted bucket files by term (see
    :func:`write_inverted_index`).  df/dl were denormalized at build
    time and the raw (n, l) stats rows sum to the corpus totals, so no
    aggregation ever touches corpus-sized tables.

    ``derived_df=True`` is the APPEND-TOLERANT mode for indexes whose
    generations land incrementally (the streaming layout,
    ``streaming/index.py:run_streaming_inverted_index``): a stored df
    is a GLOBAL statistic that appending a new batch silently stales
    across every older generation, so this mode ignores/omits the
    stored column and re-derives df as a count window over the probed
    postings — correct because the bucket+term pushdown keeps each
    matched term's ENTIRE posting list, and still O(probed postings).
    Incremental generations must carry disjoint doc_ids (the same
    new-ids append contract as the ANN indexes); per-batch (n, l)
    stats rows make avgdl exact by additivity."""
    qterms = queries.select("query_id", "term")
    pairs = (
        qterms.select("term", term_bucket(F.col("term"), n_buckets).alias("b"))
        .distinct()
        .collect()
    )
    term_rows = sorted({r.term for r in pairs})
    buckets = sorted({r.b for r in pairs})
    postings = spark.read.parquet(os.path.join(path, "postings")).filter(
        F.col("term_bucket").isin(buckets) & F.col("term").isin(term_rows)
    )
    if derived_df:
        postings = postings.select("term", "doc_id", "tf", "dl").withColumn(
            "df", F.count("*").over(Window.partitionBy("term")).cast("long")
        )
    stats = _avgdl_from_raw(spark.read.parquet(os.path.join(path, "stats")))
    matched = (
        F.broadcast(qterms)
        .join(postings, "term")
        .crossJoin(F.broadcast(stats))
    )
    scored = matched.groupBy("query_id", "doc_id").agg(
        F.sum(_score_fp_col()).cast("long").alias("score_fp")
    )
    return _topk(scored, k)


def retrieval_decontaminate(
    docs: DataFrame,
    bench_filter: F.Column,
    n_terms: int = 3,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Retrieval-based decontamination: treat each benchmark document
    (rows passing ``bench_filter``) as a query — its top-``n_terms``
    linear-tf-idf terms, df taken over the TRAINING side — and flag
    every training document that lands in any query's BM25 top-``k``.
    The lexical complement of x31's exact n-gram screen: n-gram overlap
    catches verbatim leakage, retrieval catches the paraphrased/
    reformatted benchmark item that still shares its distinguishing
    vocabulary.

    Returns (doc_id, n_queries, best_rank): how many benchmark queries
    retrieved the doc and its best rank — the triage columns a
    decontamination review sorts by.  Training-side N/avgdl/df feed the
    scoring (the benchmark split must not perturb corpus statistics)."""
    corpus = docs.filter(~bench_filter)

    # query terms: benchmark tf against TRAINING-side df
    qtf = (
        doc_tokens(docs.filter(bench_filter), id_col, text_col)
        .groupBy(F.col("doc_id").alias("query_id"), "term")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    df_m = (
        doc_tokens(corpus, id_col, text_col)
        .join(F.broadcast(qtf.select("term").distinct()), "term")
        .groupBy("term")
        .agg(F.count_distinct("doc_id").cast("long").alias("df"))
    )
    queries = materialize_queries(_top_terms(qtf, df_m, n_terms))
    hits = bm25_topk(corpus, queries, k=k, id_col=id_col, text_col=text_col)
    return hits.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_queries"),
        F.min("rank").cast("int").alias("best_rank"),
    )


# ---------------------------------------------------------------------------
# Hybrid retrieval: reciprocal rank fusion
# ---------------------------------------------------------------------------

RRF_K = 60  # the standard Cormack/Clarke/Buettcher smoothing constant


def rrf_scale(k: int, rrf_k: int = RRF_K) -> int:
    """The common-denominator fixed-point scale for :func:`rrf_fuse`:
    lcm(rrf_k+1 .. rrf_k+k), so every per-rank contribution
    S // (rrf_k + rank) is EXACT (the divisor divides S) — reciprocal
    rank fusion carried entirely in int64, per the no-libm contract.
    For the defaults (K=60, k=5): lcm(61..65) = 495,593,280; the fused
    sum is bounded by n_arms * k * S, far inside int64 for any sane
    arm count."""
    import math

    return math.lcm(*range(rrf_k + 1, rrf_k + k + 1))


def rrf_fuse(
    arms: list[DataFrame], k: int = 5, rrf_k: int = RRF_K, max_rank: int | None = None
) -> DataFrame:
    """Reciprocal rank fusion of retrieval arms — the standard hybrid-
    search combiner (lexical BM25 + dense kNN, or any mix: each arm is
    just a (query_id, doc_id, rank) DataFrame, so approximate/index-
    served arms plug in unchanged at scale).

    rrf(q, d) = sum over arms ranking d of 1 / (rrf_k + rank), carried
    as integer ``rrf_fp = sum(S // (rrf_k + rank))`` at the exact
    common-denominator scale S = :func:`rrf_scale` — cross-engine
    bit-exact, no float summation order to disagree on.  Rows with
    rank > max_rank (default: ``k``) are filtered first: their divisor
    would not divide S (the contribution would floor, silently
    inexact), and a well-formed arm never emits them.

    Returns (query_id, doc_id, rrf_fp, n_arms, rank, rrf): each
    query's top-``k`` by (rrf_fp desc, doc_id asc — total order),
    n_arms = how many arms retrieved the doc, rrf = rrf_fp / S (one
    IEEE division, display only).

    Scale shape: arms are already top-k-per-query (O(batch·k) rows
    each); the fusion is a unionByName + one (query_id, doc_id)
    aggregation + one per-query window — every stage O(batch)."""
    cap = k if max_rank is None else max_rank
    s = rrf_scale(cap, rrf_k)
    parts = [
        a.select("query_id", "doc_id", "rank").filter(F.col("rank") <= cap)
        for a in arms
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    fused = u.groupBy("query_id", "doc_id").agg(
        F.sum(F.expr(f"{s} div ({rrf_k} + rank)")).cast("long").alias("rrf_fp"),
        F.count("*").cast("int").alias("n_arms"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("rrf_fp"), F.asc("doc_id"))
    return (
        fused.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "doc_id",
            "rrf_fp",
            "n_arms",
            "rank",
            (F.col("rrf_fp").cast("double") / float(s)).alias("rrf"),
        )
    )


# ---------------------------------------------------------------------------
# Positional postings and phrase retrieval
# ---------------------------------------------------------------------------


def positional_postings(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, term, tf, positions): the positional posting list —
    0-based token offsets, sorted ascending.  One tokenization; the
    (doc, term) aggregation shuffles one row per distinct doc-term
    carrying an int array bounded by tf (the standard positional-index
    payload: ~1 int per token corpus-wide)."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(WORD_PATTERN), F.lit(0))
        ).alias("pos", "term"),
    )
    return toks.groupBy("doc_id", "term").agg(
        F.count("*").cast("long").alias("tf"),
        F.sort_array(F.collect_list("pos")).alias("positions"),
    )


def top_bigram_phrases(
    docs: DataFrame, n_phrases: int = 10, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Deterministic phrase workload: the corpus's ``n_phrases`` most
    frequent word bigrams (ties by phrase ascending — total order).
    Bigrams build ARRAY-SIDE by zipping the token array with its own
    tail (the x80 shape — no lag-window shuffle); the count is one
    two-phase hash agg and the top-N a single bounded sort."""
    toks = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(WORD_PATTERN), F.lit(0))
    grams = docs.select(
        F.explode(
            F.zip_with(
                F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
                F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
                lambda a, b: F.concat_ws(" ", a, b),
            )
        ).alias("phrase")
    )
    return (
        grams.groupBy("phrase")
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy(F.desc("n"), F.asc("phrase"))
        .limit(n_phrases)
        .select("phrase")
    )


def phrase_search(
    docs: DataFrame,
    phrases: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    postings: DataFrame | None = None,
    slop: int = 1,
) -> DataFrame:
    """Exact phrase retrieval over positional postings: for each
    two-word phrase, the documents where the words occur ADJACENTLY
    (position p in w1's list with p+1 in w2's list), ranked by
    occurrence count then doc_id — the query class bag-of-words BM25
    cannot express ("new york" vs "york new").

    ``phrases``: (phrase) rows of two space-joined terms (the
    :func:`top_bigram_phrases` workload or any external list).
    Returns (phrase, doc_id, phrase_tf, rank), rank = 1..k.

    Scale shape: the phrase word set broadcasts; posting rows survive
    only for phrase words, so the doc_id-keyed self-join carries
    O(matched postings) rows whose arrays are tf-bounded; the
    adjacency test is an array-op codegen filter (no explode of the
    position lists); top-k is one window per phrase.  Pass
    ``postings`` to serve from a PERSISTED positional index
    (:func:`write_inverted_index` with ``store_positions=True``) —
    identical results, pruned scan.  ``slop`` widens adjacency to a
    PROXIMITY window: w2 within ``slop`` positions AFTER w1 (slop=1 is
    exact phrase; slop=3 catches "new [york] state" insertions) —
    phrase_tf counts w1 occurrences with any in-window w2, identical
    to the adjacency count at slop=1."""
    pw = phrases.select(
        "phrase",
        F.split(F.col("phrase"), " ").getItem(0).alias("w1"),
        F.split(F.col("phrase"), " ").getItem(1).alias("w2"),
    )
    pp = (
        postings.select("doc_id", "term", "positions")
        if postings is not None
        else positional_postings(docs, id_col, text_col)
    )
    p1 = pp.select("doc_id", F.col("term").alias("w1"), F.col("positions").alias("pos1"))
    p2 = pp.select("doc_id", F.col("term").alias("w2"), F.col("positions").alias("pos2"))
    matched = (
        F.broadcast(pw)
        .join(p1, "w1")
        .join(p2, ["w2", "doc_id"])
        .withColumn(
            "phrase_tf",
            F.size(
                F.filter(
                    F.col("pos1"),
                    lambda x: F.exists(
                        F.col("pos2"), lambda y: (y > x) & (y <= x + slop)
                    ),
                )
            ).cast("long"),
        )
        .filter(F.col("phrase_tf") > 0)
    )
    w = Window.partitionBy("phrase").orderBy(F.desc("phrase_tf"), F.asc("doc_id"))
    return (
        matched.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("phrase", "doc_id", "phrase_tf", "rank")
    )


def collocations(
    docs: DataFrame,
    n_top: int = 20,
    min_count: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """PMI-lift collocation mining — the corpus's most associated word
    pairs: lift(x,y) = p(xy) / (p(x)·p(y)) with bigram probability over
    bigram positions (Nb) and unigram probabilities over tokens (Nt),
    i.e. c(xy)·Nt² / (Nb·c(x)·c(y)), thresholded at ``min_count``
    occurrences (PMI's low-count pathology screened the standard way).
    The score is a FIXED-ORDER float product chain — products and
    single divisions are correctly rounded, so with no summation there
    is nothing for engines to disagree on (the no-libm contract's
    multiplicative cousin; log-PMI would be a monotone transform).

    Returns (phrase, n, lift, rank): top ``n_top`` by (lift desc,
    phrase asc — total order).

    Scale shape: bigram and unigram counts are two-phase hash aggs over
    one tokenization each; the candidate set (pairs above min_count)
    joins the unigram table on each word key; totals are 1-row
    broadcasts.  Both count tables grow with vocabulary — the same
    both-sides-grow class as the n-gram surprisal rungs, with the same
    persisted-snapshot remedy."""
    toks_arr = F.regexp_extract_all(
        F.lower(F.col(text_col)), F.lit(WORD_PATTERN), F.lit(0)
    )
    grams = docs.select(
        F.explode(
            F.zip_with(
                F.slice(toks_arr, 1, F.greatest(F.size(toks_arr) - 1, F.lit(0))),
                F.slice(toks_arr, 2, F.greatest(F.size(toks_arr) - 1, F.lit(0))),
                lambda a, b: F.concat_ws(" ", a, b),
            )
        ).alias("phrase")
    )
    bg = grams.groupBy("phrase").agg(F.count("*").cast("long").alias("cxy"))
    nb = bg.agg(F.coalesce(F.sum("cxy"), F.lit(0)).cast("long").alias("nb"))
    uni = doc_tokens(docs, id_col, text_col).groupBy("term").agg(
        F.count("*").cast("long").alias("c")
    )
    nt = uni.agg(F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("nt"))
    cand = bg.filter(F.col("cxy") >= min_count).select(
        "phrase",
        "cxy",
        F.split(F.col("phrase"), " ").getItem(0).alias("w1"),
        F.split(F.col("phrase"), " ").getItem(1).alias("w2"),
    )
    j = (
        cand.join(uni.select(F.col("term").alias("w1"), F.col("c").alias("cx")), "w1")
        .join(uni.select(F.col("term").alias("w2"), F.col("c").alias("cy")), "w2")
        .crossJoin(F.broadcast(nt))
        .crossJoin(F.broadcast(nb))
    )
    lift = (
        (F.col("cxy").cast("double") * F.col("nt").cast("double"))
        * F.col("nt").cast("double")
    ) / (
        (F.col("nb").cast("double") * F.col("cx").cast("double"))
        * F.col("cy").cast("double")
    )
    ranked = (
        j.select("phrase", F.col("cxy").alias("n"), lift.alias("lift"))
        .orderBy(F.desc("lift"), F.asc("phrase"))
        .limit(n_top)
    )
    w = Window.orderBy(F.desc("lift"), F.asc("phrase"))
    return ranked.withColumn("rank", F.row_number().over(w).cast("int"))


# ---------------------------------------------------------------------------
# Pseudo-relevance feedback: Rocchio-style query expansion
# ---------------------------------------------------------------------------


def prf_expand_queries(
    docs: DataFrame,
    queries: DataFrame,
    fb_k: int = 3,
    n_expand: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    retrieve=None,
    df_stats=None,
    fetch_tf=None,
) -> DataFrame:
    """Pseudo-relevance feedback (the Rocchio shape, kept
    integer-exact): run the original workload once, treat each query's
    top-``fb_k`` documents as relevant, and add the ``n_expand``
    strongest feedback terms to the query — the classic fix for
    vocabulary mismatch (a query phrased differently from the corpus
    still retrieves, because the expansion terms come FROM the
    corpus).

    Expansion weight is IDF-WEIGHTED summed tf:
    ``w = sum_fb(tf) * idf_fp(df)`` with the BM25 chain's own integer
    idf — Rocchio's idf weighting, and NOT optional at scale: the
    naive tf-only weight elects corpus stop-words ("the", "and") as
    expansion terms, and one stop-word expansion hands a single
    query's top-k window the term's ENTIRE posting list (measured on
    this corpus at x100: 93 s of one-task window crawl vs ~3 s with
    idf weighting — the known naive-PRF pathology, as a skew
    mechanism).  Everything stays int64 (tf, df, idf_fp and their
    product), ties by term ascending; terms already in the query are
    excluded (anti-join), so the expanded workload stays DISTINCT
    (query_id, term) as :func:`bm25_topk` requires.

    Returns the expanded (query_id, term) workload: original rows
    UNION the expansion rows.

    Scale shape: round 1 is the bm25 plan (O(matched postings) past
    the broadcast); the feedback set is O(batch * fb_k) ids and
    broadcasts as a semi-join against the corpus, so ONLY feedback
    docs are re-tokenized; candidate-term df aggregates over the
    candidate set's postings only (broadcast semi-join into the token
    stream — the top_terms_queries shape); every other stage is
    O(feedback tokens).  The caller should :func:`materialize_queries`
    the result before scoring — it feeds the round-2 plan at two
    points (the x100 multi-consumer finding).

    ``retrieve``: optional ``(queries, k) -> (query_id, doc_id, ...)``
    callable for round 1 — pass a :func:`bm25_serve` closure to run
    the feedback retrieval off the PERSISTED index (the at-scale form;
    in-flight :func:`bm25_topk` re-derives the corpus stat tables per
    pass).  Results are bit-equal either way (the x102 contract).
    ``df_stats``: optional ``(cand_terms) -> (term, df, n)`` callable
    supplying candidate document frequencies and the corpus doc count
    — pass an index-backed lookup (df is denormalized in postings,
    n in the stats sidecar) to keep the serve path off the corpus;
    default derives both in-flight.
    ``fetch_tf``: optional ``(fb_doc_ids) -> (doc_id, term, tf)``
    callable supplying the feedback docs' term frequencies — pass a
    :func:`fetch_doc_terms` closure over a FORWARD index to make the
    feedback fetch a bucket-pruned read of O(batch*fb_k) docs instead
    of a corpus semi-join + re-tokenization (tf values are bit-equal
    by the shared-tokenization build contract)."""
    qterms = queries.select("query_id", "term")
    if retrieve is None:
        retrieve = lambda q, k: bm25_topk(  # noqa: E731
            docs, q, k=k, id_col=id_col, text_col=text_col
        )
    fb = retrieve(queries, fb_k).select("query_id", "doc_id")
    fb = materialize_queries(fb)  # bounded O(batch*fb_k); feeds two consumers
    if fetch_tf is not None:
        ftf = fetch_tf(fb.select("doc_id").distinct())
    else:
        fetched = docs.join(
            F.broadcast(
                fb.select("doc_id").distinct().withColumnRenamed("doc_id", id_col)
            ),
            id_col,
            "left_semi",
        )
        ftf = doc_term_freqs(fetched, id_col, text_col)
    # checkpoint: cand feeds TWO consumers (the df-stats term collect
    # and the expanded-workload collect) — without materialization the
    # whole feedback chain (round-1 serve + tf fetch + agg + anti-join)
    # executes once PER consumer (the x100 multi-consumer rule;
    # measured ~1.5 s of the x115 gate wall at sf0.1)
    cand = (
        fb.join(ftf, "doc_id")
        .groupBy("query_id", "term")
        .agg(F.sum("tf").cast("long").alias("w"))
        .join(qterms, ["query_id", "term"], "left_anti")
        .localCheckpoint(eager=False)
    )
    if df_stats is None:
        cand_terms = cand.select("term").distinct()
        df_m = (
            doc_tokens(docs, id_col, text_col)
            .join(F.broadcast(cand_terms), "term")
            .groupBy("term")
            .agg(F.count_distinct("doc_id").cast("long").alias("df"))
        )
        dfn = df_m.crossJoin(
            F.broadcast(
                _raw_stats(doc_lengths(docs, id_col, text_col)).select("n")
            )
        )
    else:
        dfn = df_stats(cand.select("term").distinct())
    idf_fp = F.expr(f"({S1_IDF} * (2*n - 2*df + 1)) div (2*df + 1)").cast("long")
    weighted = cand.join(F.broadcast(dfn), "term").withColumn(
        "wi", (F.col("w") * idf_fp).cast("long")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("wi"), F.asc("term"))
    exp = (
        weighted.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= n_expand)
        .select("query_id", "term")
    )
    return qterms.unionByName(exp)


def index_df_stats(spark: SparkSession, path: str, n_buckets: int = N_TERM_BUCKETS):
    """An index-backed ``df_stats`` for :func:`prf_expand_queries`:
    candidate df comes off the DENORMALIZED postings column (bucket
    IN-list + pushed term predicate, column-pruned to (term, df) —
    never the corpus), n off the one-row stats sidecar.  The candidate
    set is collected once (bounded: the distinct vocabulary of
    O(batch*fb_k) feedback docs — the bm25_serve bounded-collect
    class)."""

    def look(cand_terms: DataFrame) -> DataFrame:
        # one bounded collect computes term AND bucket together (was
        # two driver round-trips — the round-8 stage-count trim)
        rows = cand_terms.select(
            "term", term_bucket(F.col("term"), n_buckets).alias("b")
        ).collect()
        terms = sorted({r.term for r in rows})
        buckets = sorted({r.b for r in rows})
        postings = spark.read.parquet(os.path.join(path, "postings")).filter(
            F.col("term_bucket").isin(buckets) & F.col("term").isin(terms)
        )
        df_m = postings.select("term", "df").distinct()
        n1 = _avgdl_from_raw(spark.read.parquet(os.path.join(path, "stats"))).select("n")
        return df_m.crossJoin(F.broadcast(n1))

    return look


# ---------------------------------------------------------------------------
# Forward (doc-major) index: pruned fetch of a bounded doc set's terms
# ---------------------------------------------------------------------------


def write_forward_index(
    docs: DataFrame,
    path: str,
    n_buckets: int = N_TERM_BUCKETS,
    id_col: str = "doc_id",
    text_col: str = "text",
    mode: str = "overwrite",
) -> None:
    """The doc-major companion of :func:`write_inverted_index`:
    ``path/forward`` holds (doc_id, term, tf) partitioned by
    ``doc_bucket = pmod(doc_id, n_buckets)`` with files SORTED by
    doc_id — the exact mirror of the postings layout's term-side
    pruning, but keyed by document.  A fetch of a bounded doc set
    pushes its buckets as a partition IN-list and the ids as a parquet
    predicate (row-group skipping via the sorted column), so serving
    paths that need "the terms of THESE docs" — PRF feedback
    expansion, snippet construction, any rerank that re-reads matched
    documents — touch O(fetched docs) storage instead of re-tokenizing
    or corpus-scanning (an inverted index cannot prune on doc_id: a
    doc's terms are scattered across every term bucket).  Same
    tokenization as the inverted build, so tf values are bit-equal.
    Overwrite-idempotent (the ``ensure_index`` build_fn contract)."""
    tf = doc_term_freqs(docs, id_col, text_col)
    (
        tf.withColumn(
            "doc_bucket", F.pmod(F.col("doc_id"), F.lit(n_buckets)).cast("int")
        )
        .repartition(F.col("doc_bucket"))
        .sortWithinPartitions("doc_id")
        .write.mode(mode)
        .partitionBy("doc_bucket")
        .parquet(os.path.join(path, "forward"))
    )


def fetch_doc_terms(
    spark: SparkSession,
    path: str,
    doc_ids: DataFrame,
    n_buckets: int = N_TERM_BUCKETS,
) -> DataFrame:
    """(doc_id, term, tf) for a BOUNDED doc-id set, served from the
    forward index: the id list is collected once (the bm25_serve
    bounded-collect class — serving batches are O(batch) by contract)
    and pushed down twice — bucket partition IN-list, then the ids as
    a parquet predicate that skips row groups because the build sorted
    by doc_id."""
    ids = sorted({r[0] for r in doc_ids.select(doc_ids.columns[0]).collect()})
    buckets = sorted({i % n_buckets for i in ids})
    return (
        spark.read.parquet(os.path.join(path, "forward"))
        .filter(F.col("doc_bucket").isin(buckets) & F.col("doc_id").isin(ids))
        .select("doc_id", "term", "tf")
    )


# ---------------------------------------------------------------------------
# Segmented landings and compaction (the LSM shape for inverted indexes)
# ---------------------------------------------------------------------------


def land_inverted_batch(
    docs_batch: DataFrame,
    index_path: str,
    batch_id: int,
    n_buckets: int = N_TERM_BUCKETS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Land ONE generation of postings under
    ``postings/batch_id=N/term_bucket=B`` + raw per-batch stats — the
    single implementation behind both the streaming maintainer
    (``streaming/index.py:run_streaming_inverted_index`` wraps this in
    foreachBatch) and batch backfills.  Per-batch overwrite is
    idempotent (a replayed batch repairs, never duplicates); postings
    carry NO df (a global statistic that appends would stale — the
    derived_df serve mode or :func:`compact_inverted_index` restores
    it); the same bucket-aligned shuffle + per-bucket term sort as the
    batch build, so pruning is identical on either layout.
    Generations must carry disjoint doc_ids (the shared append
    contract)."""
    tf = doc_term_freqs(docs_batch, id_col, text_col)
    dl = doc_lengths(docs_batch, id_col, text_col)
    postings = tf.join(dl, "doc_id").withColumn(
        "term_bucket", term_bucket(F.col("term"), n_buckets)
    )
    (
        postings.repartition(F.col("term_bucket"))
        .sortWithinPartitions("term")
        .write.mode("overwrite")
        .partitionBy("term_bucket")
        .parquet(f"{index_path}/postings/batch_id={batch_id}")
    )
    _raw_stats(dl).write.mode("overwrite").parquet(
        f"{index_path}/stats/batch_id={batch_id}"
    )


def compact_inverted_index(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    n_buckets: int = N_TERM_BUCKETS,
    mode: str = "overwrite",
) -> None:
    """Merge a SEGMENTED index (per-batch_id generations from
    :func:`land_inverted_batch` / the streaming maintainer) into the
    batch layout :func:`write_inverted_index` produces — the LSM
    compaction step: one linear pass over all postings re-derives the
    global df (a count window per term; one row per (doc, term)
    because generations carry disjoint doc_ids), rewrites
    bucket-aligned term-sorted files, and collapses the per-batch raw
    stats to one row.  After compaction the index serves on the
    STORED-df fast path (``bm25_serve(derived_df=False)``) — bit-equal
    to a from-scratch batch build over the union corpus, pinned by
    test.

    ``n_buckets`` may DIFFER from the source's: compaction is where an
    index re-buckets as vocabulary grows (the blocking-key rule —
    bucket count scales with corpus cardinality), since the bucket map
    is recomputed from the term, not read from the layout.

    Scale shape: one shuffle keyed term (the df window) + the
    bucket-aligned write shuffle — both linear in postings; stats are
    a bounded per-batch-row sum.  This is the nightly/weekly amortized
    job that keeps serving O(probed postings) with zero per-probe df
    derivation."""
    postings = spark.read.parquet(os.path.join(src_path, "postings")).select(
        "term", "doc_id", "tf", "dl"
    )
    w_df = Window.partitionBy("term")
    merged = (
        postings.withColumn("df", F.count("*").over(w_df).cast("long"))
        .withColumn("term_bucket", term_bucket(F.col("term"), n_buckets))
    )
    (
        merged.repartition(F.col("term_bucket"))
        .sortWithinPartitions("term")
        .write.mode(mode)
        .partitionBy("term_bucket")
        .parquet(os.path.join(dst_path, "postings"))
    )
    raw = spark.read.parquet(os.path.join(src_path, "stats"))
    raw.agg(
        F.coalesce(F.sum("n"), F.lit(0)).cast("long").alias("n"),
        F.coalesce(F.sum("l"), F.lit(0)).cast("long").alias("l"),
    ).write.mode(mode).parquet(os.path.join(dst_path, "stats"))


# ---------------------------------------------------------------------------
# Snippet extraction: best query-term window per retrieved document
# ---------------------------------------------------------------------------


def best_window_snippets(
    docs: DataFrame,
    queries: DataFrame,
    hits: DataFrame,
    width: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """For each retrieved (query, document) pair, the best snippet
    window: the token offset ``start`` whose ``width``-token window
    [start, start+width) covers the MOST query-term occurrences, ties
    by earliest start — the highlighting step every retrieval UI runs
    after top-k.  Candidate starts are exactly the matched positions
    (an optimal window can always shift right until its left edge hits
    a match), so the search is over matched occurrences, not all
    offsets.

    ``queries``: (query_id, term) rows; ``hits``: (query_id, doc_id)
    pairs to annotate (a top-k result projection — the caller should
    :func:`materialize_queries` it, it feeds the plan at two points).
    Returns (query_id, doc_id, start, n_hits) with n_hits = matched
    occurrences in the winning window; pairs whose doc contains no
    query term emit nothing (they cannot be hits of a lexical
    retriever).

    Scale shape: only HIT documents tokenize (broadcast semi-join of
    the O(batch*k) hit ids); matched occurrences survive the broadcast
    term join, so the window scoring — one count window with an
    integer RANGE frame [current, +width-1], then one argmax window —
    runs over O(hits * per-doc matched occurrences) rows.  All counts
    integer; ties total-ordered; no floats anywhere."""
    hit_ids = hits.select("doc_id").distinct().withColumnRenamed("doc_id", id_col)
    toks = docs.join(F.broadcast(hit_ids), id_col, "left_semi").select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(WORD_PATTERN), F.lit(0))
        ).alias("pos", "term"),
    )
    matched = (
        toks.join(F.broadcast(queries.select("query_id", "term")), "term")
        .join(F.broadcast(hits.select("query_id", "doc_id")), ["query_id", "doc_id"])
        .select("query_id", "doc_id", "pos")
    )
    w_cnt = (
        Window.partitionBy("query_id", "doc_id")
        .orderBy("pos")
        .rangeBetween(Window.currentRow, width - 1)
    )
    scored = matched.withColumn("n_hits", F.count("*").over(w_cnt).cast("long"))
    w_best = Window.partitionBy("query_id", "doc_id").orderBy(
        F.desc("n_hits"), F.asc("pos")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w_best))
        .filter(F.col("rn") == 1)
        .select("query_id", "doc_id", F.col("pos").alias("start"), "n_hits")
    )


# ---------------------------------------------------------------------------
# Result diversification: per-group caps over a retrieved shortlist
# ---------------------------------------------------------------------------


def diversified_topk(
    scored: DataFrame,
    groups: DataFrame,
    k: int = 5,
    cap: int = 2,
    group_col: str = "grp",
) -> DataFrame:
    """Diversify a retrieved shortlist: per query, keep the top-``k``
    results with AT MOST ``cap`` documents from any one group (source
    domain, duplicate cluster, site — whatever ``groups`` maps
    doc_id to).  The SQL-expressible diversification (MMR's greedy
    similarity trade-off is order-dependent and float-laden; the
    per-group cap is the form production search stacks actually ship
    — host crowding in web search is exactly this operator).

    ``scored``: (query_id, doc_id, score_fp) shortlist rows (deeper
    than ``k`` — diversification reranks WITHIN the shortlist, the
    standard two-stage shape).  ``groups``: (doc_id, ``group_col``).
    Docs missing from ``groups`` form their own singleton group (left
    join; NULL group never collides — it is filled with the doc_id).

    Returns (query_id, doc_id, score_fp, grp, rank): rank 1..k by
    (score_fp desc, doc_id asc) over the cap survivors.

    Scale shape: the shortlist is O(batch * shortlist_k); the group
    map joins by doc_id (broadcast the shortlist side against a big
    dimension, or the dimension when it is small); both windows are
    keyed by query — every stage O(batch)."""
    g = groups.select("doc_id", F.col(group_col).alias("grp"))
    with_g = scored.select("query_id", "doc_id", "score_fp").join(
        g, "doc_id", "left"
    ).withColumn("grp", F.coalesce(F.col("grp"), F.col("doc_id").cast("string")))
    w_grp = Window.partitionBy("query_id", "grp").orderBy(
        F.desc("score_fp"), F.asc("doc_id")
    )
    capped = with_g.withColumn("gr", F.row_number().over(w_grp)).filter(
        F.col("gr") <= cap
    )
    w_fin = Window.partitionBy("query_id").orderBy(F.desc("score_fp"), F.asc("doc_id"))
    return (
        capped.withColumn("rank", F.row_number().over(w_fin).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "score_fp", "grp", "rank")
    )


# ---------------------------------------------------------------------------
# BM25F-lite: fielded scoring with integer field weights
# ---------------------------------------------------------------------------


def _weighted_tokens(
    docs: DataFrame,
    title_len: int,
    w_title: int,
    w_body: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, term, wt) token stream with per-occurrence FIELD
    weights: the first ``title_len`` tokens are the title field at
    weight ``w_title``, the rest body at ``w_body``.  One posexplode;
    the weighted tf is then a plain integer SUM of wt."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(WORD_PATTERN), F.lit(0))
        ).alias("pos", "term"),
    ).select(
        "doc_id",
        "term",
        F.when(F.col("pos") < title_len, F.lit(w_title))
        .otherwise(F.lit(w_body))
        .cast("long")
        .alias("wt"),
    )


def _weighted_doc_lengths(
    docs: DataFrame,
    title_len: int,
    w_title: int,
    w_body: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, dl) with dl = the WEIGHTED length
    w_title*min(|toks|, title_len) + w_body*max(|toks|-title_len, 0) —
    scan-side, no shuffle (the doc_lengths convention).  Zero-token
    docs excluded as unretrievable."""
    n_toks = F.size(
        F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(WORD_PATTERN), F.lit(0))
    ).cast("long")
    wdl = (
        F.lit(w_title) * F.least(n_toks, F.lit(title_len))
        + F.lit(w_body) * F.greatest(n_toks - title_len, F.lit(0))
    ).cast("long")
    return docs.select(F.col(id_col).alias("doc_id"), wdl.alias("dl")).filter(
        n_toks > 0
    )


def top_fielded_terms_queries(
    docs: DataFrame,
    doc_filter: F.Column,
    n_terms: int = 3,
    title_len: int = 8,
    w_title: int = 2,
    w_body: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """:func:`top_terms_queries` over WEIGHTED tf — the workload
    constructor matched to :func:`bm25f_topk` (a title term counts
    ``w_title`` per occurrence toward the query's distinguishing-term
    ranking, mirroring how it will score).  df is weight-independent
    (a doc either contains the term or not)."""
    wq = _weighted_tokens(docs.filter(doc_filter), title_len, w_title, w_body, id_col, text_col)
    qtf = wq.groupBy(F.col("doc_id").alias("query_id"), "term").agg(
        F.sum("wt").cast("long").alias("tf")
    )
    cand_terms = qtf.select("term").distinct()
    df_m = (
        doc_tokens(docs, id_col, text_col)
        .join(F.broadcast(cand_terms), "term")
        .groupBy("term")
        .agg(F.count_distinct("doc_id").cast("long").alias("df"))
    )
    return _top_terms(qtf, df_m, n_terms)


def bm25f_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 5,
    title_len: int = 8,
    w_title: int = 2,
    w_body: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """BM25F-lite: fielded BM25 (Robertson & Zaragoza's weighted-field
    model, the simple variant production engines ship): term
    frequencies and document lengths are FIELD-WEIGHTED before the
    standard saturation —

        wtf(t, d) = w_title*tf_title + w_body*tf_body
        wdl(d)    = w_title*len_title + w_body*len_body

    — then score exactly as BM25 over (wtf, wdl, avg wdl).  Fields
    here are structural (title = first ``title_len`` tokens of the
    document; the corpus has one text column), but the operator is
    field-source-agnostic: any (doc_id, term, wt) stream composes.
    INTEGER weights keep every pre-division op in int64, so the whole
    fielded chain sits under the oracle gate; the int64 ceilings of
    the module docstring scale by max(w) (w=2 halves the documented
    L bound — still ~18 PB of text).

    Same plan shape as :func:`bm25_topk`: query terms broadcast, all
    post-match shuffles O(matched postings), df as a count window,
    weighted dl scan-side, one top-k window."""
    qterms = queries.select("query_id", "term")
    matched_wtf = (
        _weighted_tokens(docs, title_len, w_title, w_body, id_col, text_col)
        .join(F.broadcast(qterms.select("term").distinct()), "term")
        .groupBy("doc_id", "term")
        .agg(F.sum("wt").cast("long").alias("tf"))
    )
    # same dl-checkpoint rationale as bm25_topk: wdl feeds two
    # consumers and each re-execution is a full weighted-tokenization
    # pass over the corpus
    wdl = _weighted_doc_lengths(
        docs, title_len, w_title, w_body, id_col, text_col
    ).localCheckpoint(eager=False)
    w_df = Window.partitionBy("term")
    matched = (
        matched_wtf.withColumn("df", F.count("*").over(w_df).cast("long"))
        .join(F.broadcast(qterms), "term")
        .join(wdl, "doc_id")
        .crossJoin(F.broadcast(_avgdl_stats(wdl)))
    )
    scored = matched.groupBy("query_id", "doc_id").agg(
        F.sum(_score_fp_col()).cast("long").alias("score_fp")
    )
    return _topk(scored, k)


def write_lexicon(
    docs: DataFrame,
    path: str,
    n_ranges: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    mode: str = "overwrite",
) -> None:
    """``path/lexicon``: the vocabulary (term, df) RANGE-partitioned
    and sorted by term — the third index layout next to the
    hash-bucketed postings (term-equality probes) and the doc-bucketed
    forward table (id fetches).  Hash buckets scatter a lexical RANGE
    across every partition, so prefix/range queries over the postings
    must touch all buckets; a range-partitioned, term-sorted lexicon
    makes them file- and row-group-prunable (parquet min/max on the
    sort column; Spark pushes StartsWith down).  The lexicon is
    vocabulary-sized — tiny next to postings — and serves
    autocomplete, wildcard expansion, and vocabulary audits without
    touching posting lists."""
    dfx = doc_term_freqs(docs, id_col, text_col).groupBy("term").agg(
        F.count("*").cast("long").alias("df")
    )
    (
        dfx.repartitionByRange(n_ranges, "term")
        .sortWithinPartitions("term")
        .write.mode(mode)
        .parquet(os.path.join(path, "lexicon"))
    )


def prefix_terms(spark: SparkSession, path: str, prefix: str) -> DataFrame:
    """(term, df) for every vocabulary term starting with ``prefix``,
    served from the lexicon with the StartsWith predicate pushed to
    the scan — file pruning via range partitioning, row-group skipping
    via the sorted column.  The expansion step of a wildcard query:
    feed the result's terms into bm25_serve as additional workload
    rows."""
    return (
        spark.read.parquet(os.path.join(path, "lexicon"))
        .filter(F.col("term").startswith(prefix))
        .select("term", "df")
    )


def land_forward_batch(
    docs_batch: DataFrame,
    index_path: str,
    batch_id: int,
    n_buckets: int = N_TERM_BUCKETS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Land ONE generation of the forward table under
    ``forward/batch_id=N/doc_bucket=B`` — the doc-major mirror of
    :func:`land_inverted_batch` (idempotent per-batch overwrite, same
    bucket-aligned shuffle + per-file doc_id sort as the batch build).
    Unlike postings, the forward layout is FULLY append-friendly:
    (doc_id, term, tf) rows are per-document facts with no global
    statistic to stale, so :func:`fetch_doc_terms` reads a segmented
    and a compacted layout identically (the batch_id partition column
    is just dropped by the projection).  Generations must carry
    disjoint doc_ids (the shared append contract)."""
    tf = doc_term_freqs(docs_batch, id_col, text_col)
    (
        tf.withColumn(
            "doc_bucket", F.pmod(F.col("doc_id"), F.lit(n_buckets)).cast("int")
        )
        .repartition(F.col("doc_bucket"))
        .sortWithinPartitions("doc_id")
        .write.mode("overwrite")
        .partitionBy("doc_bucket")
        .parquet(f"{index_path}/forward/batch_id={batch_id}")
    )


def retrieval_metrics(
    run: DataFrame, qrels: DataFrame, k: int = 5, rr_scale: int = 60
) -> DataFrame:
    """IR evaluation over a retrieval run — the audit rung for the
    lexical tier (x60/x108's convention applied to ranked retrieval):
    given ``run`` (query_id, doc_id, rank) and relevance judgments
    ``qrels`` (query_id, doc_id), one summary row of

      n_queries, n_rel (judged pairs), n_found (judged pairs ranked
      <= k), sum_rr_fp (per-query reciprocal rank of the FIRST
      relevant hit, fixed point at ``rr_scale``), recall_at_k, mrr

    Reciprocal ranks stay integer-exact: ``rr_scale`` defaults to 60 =
    lcm(1..5), so 1/rank is an exact int for every rank <= k=5 (choose
    lcm(1..k) for other k: 2520 covers k<=10, 360360 k<=13 — assert
    guards the divisibility).  The ONLY floats are the two final
    display divisions — mean metrics over millions of queries carry no
    float-summation order, the same no-libm discipline as the scorer
    itself.  Unjudged queries in ``run`` are ignored; judged queries
    with no hit contribute 0 to both metrics (never silently dropped).

    Scale shape: one equi-join of the run against the judged pairs
    (qrels broadcast — judgment sets are small by contract), a min-agg
    per query, and a 1-row final aggregate."""
    for r in range(1, k + 1):
        assert rr_scale % r == 0, "rr_scale must be divisible by 1..k"
    judged = qrels.select("query_id", "doc_id").distinct()
    hits = run.filter(F.col("rank") <= k).join(
        F.broadcast(judged), ["query_id", "doc_id"]
    )
    best = hits.groupBy("query_id").agg(
        F.min("rank").alias("first_rank"), F.count("*").cast("long").alias("n_hit")
    )
    per_q = (
        judged.groupBy("query_id")
        .agg(F.count("*").cast("long").alias("n_rel_q"))
        .join(best, "query_id", "left")
        .select(
            "query_id",
            "n_rel_q",
            F.coalesce(F.col("n_hit"), F.lit(0)).cast("long").alias("n_hit"),
            F.coalesce(
                F.expr(f"{rr_scale} div first_rank"), F.lit(0)
            ).cast("long").alias("rr_fp"),
        )
    )
    return per_q.agg(
        F.count("*").cast("long").alias("n_queries"),
        F.sum("n_rel_q").cast("long").alias("n_rel"),
        F.sum("n_hit").cast("long").alias("n_found"),
        F.sum("rr_fp").cast("long").alias("sum_rr_fp"),
    ).select(
        "n_queries",
        "n_rel",
        "n_found",
        "sum_rr_fp",
        (F.col("n_found").cast("double") / F.col("n_rel").cast("double")).alias(
            "recall_at_k"
        ),
        (
            F.col("sum_rr_fp").cast("double")
            / (F.lit(float(rr_scale)) * F.col("n_queries").cast("double"))
        ).alias("mrr"),
    )
