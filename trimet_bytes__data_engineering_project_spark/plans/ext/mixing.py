"""Data mixing: deterministic split / stratified sample / sequence packing
/ domain mixture / PPS sampling.

Split from ``plans/extensions.py`` at the round-14 close (r13 verdict
item 8) — code moved VERBATIM; the aggregator re-exports every name, so
``plans.extensions.<name>`` remains the stable public path."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from ..registry import query
from ..tables import load_table
from ...operators.dedup import (
    MINHASH_K,
    exact_jaccard,
    minhash_candidates,
    minhash_estimate,
    shingles,
)
from ...operators.textstats import token_count_col
from .fragments import _CAND_CTES, _MATCHES, _TOKS, _all_shingles_sql, _shingles_sql
from .scratch import _SCRATCH, _tagged_dir

# ---------------------------------------------------------------------------
# Data mixing: deterministic split / sample / packing / mixture
# ---------------------------------------------------------------------------


@query(
    "x22_hash_split",
    oracle="""
    SELECT CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'cccc' THEN 'train'
                WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'e666' THEN 'val'
                ELSE 'test' END AS split,
           count(*) AS n_docs
    FROM documents GROUP BY 1
    """,
)
def x22_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split (80/10/10): a document's
    split is a pure function of md5(doc_id) — hex-prefix thresholding,
    portable to any engine, stable under retries and corpus growth
    (docs never migrate).  No shuffle for the assignment itself; the
    count here just audits the split sizes."""
    from ...operators.sampling import train_val_test_split

    docs = load_table(spark, sf_dir, "documents")
    return train_val_test_split(docs, "doc_id").groupBy("split").agg(
        F.count("*").alias("n_docs")
    )


@query(
    "x23_stratified_sample",
    oracle="""
    SELECT lang, count(*) AS n_kept FROM documents
    WHERE lang <> 'en'
       OR substr(md5(concat_ws('|', lang, CAST(doc_id AS VARCHAR))), 1, 4) < '8000'
    GROUP BY 1
    """,
)
def x23_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified downsampling (rebalance a dominant
    language: keep 50% of 'en', all others whole) — per-stratum
    hash-threshold draw on (stratum, id), no rand(), retry-safe,
    filter-only (no shuffle)."""
    from ...operators.sampling import stratified_sample

    docs = load_table(spark, sf_dir, "documents")
    return stratified_sample(docs, "doc_id", "lang", {"en": 0.5}).groupBy("lang").agg(
        F.count("*").alias("n_kept")
    )


@query(
    "x24_sequence_packing",
    oracle=f"""
    WITH t AS (SELECT doc_id, doc_id % 32 AS shard,
                      CAST(len({_TOKS}) AS INT) AS n_tokens FROM documents),
    r AS (SELECT shard, doc_id, n_tokens,
                 SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_tokens
          FROM t)
    SELECT shard, CAST((running_tokens - 1) // 2048 AS BIGINT) AS pack_id,
           count(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens
    FROM r GROUP BY 1, 2
    """,
)
def x24_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy fixed-budget sequence packing (budget 2048 tokens, 32
    shards): running-token window per shard assigns each doc its pack —
    the first-fit-by-order packing a pretraining loader performs,
    shaped as ONE shuffle on the shard key with per-shard parallelism
    (never a global sort)."""
    from ...operators.sampling import pack_sequences
    from ...operators.textstats import token_count_col

    docs = load_table(spark, sf_dir, "documents")
    with_tokens = docs.select("doc_id", token_count_col(F.col("text")).alias("n_tokens"))
    packed = pack_sequences(with_tokens, "doc_id", "n_tokens", budget=2048, n_shards=32)
    return packed.groupBy("shard", "pack_id").agg(
        F.count("*").alias("n_docs"), F.sum("n_tokens").alias("pack_tokens")
    )


@query(
    "x25_domain_mixture",
    oracle=f"""
    WITH t AS (SELECT lang, CAST(len({_TOKS}) AS INT) AS n_tokens FROM documents),
    per AS (SELECT lang, count(*) AS docs, CAST(SUM(n_tokens) AS BIGINT) AS tokens
            FROM t GROUP BY 1)
    SELECT lang, docs, tokens,
           CAST(tokens AS DOUBLE) / CAST(SUM(tokens) OVER () AS DOUBLE) AS token_share
    FROM per
    """,
)
def x25_domain_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain mixing-weight table (docs, tokens, token share) —
    exact integer sums, one IEEE division per row; the input every
    mixture-reweighting decision needs."""
    from ...operators.sampling import domain_mixture
    from ...operators.textstats import token_count_col

    docs = load_table(spark, sf_dir, "documents")
    with_tokens = docs.select("lang", token_count_col(F.col("text")).alias("n_tokens"))
    return domain_mixture(with_tokens, "lang", "n_tokens")


@query(
    "x31_benchmark_decontamination",
    oracle=f"""
    WITH bg AS (SELECT unnest({_shingles_sql(5)}) AS g FROM documents WHERE doc_id < 20),
         bh AS (SELECT DISTINCT md5(g) AS h FROM bg),
         cg AS (SELECT doc_id, unnest({_shingles_sql(5)}) AS g FROM documents WHERE doc_id >= 20),
         ch AS (SELECT doc_id, md5(g) AS h FROM cg)
    SELECT DISTINCT doc_id FROM ch JOIN bh USING (h)
    """,
)
def x31_benchmark_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: corpus documents (doc_id >= 20, the
    training side) sharing ANY word 5-gram with the benchmark set
    (doc_id < 20 standing in for an eval suite) — the overlap screen a
    training pipeline runs before data reaches a model.  The benchmark
    side's distinct n-gram HASHES broadcast (an eval suite is tiny);
    the corpus side is explode → md5 → broadcast left-semi join, so no
    shuffle ever carries corpus text (plan-pinned)."""
    from ...operators.dedup import decontaminate

    docs = load_table(spark, sf_dir, "documents")
    return decontaminate(
        docs.filter(F.col("doc_id") >= 20), docs.filter(F.col("doc_id") < 20), n=5
    )


@query(
    "x33_near_dup_removal",
    oracle=f"""
    WITH {_CAND_CTES},
    pairs AS (SELECT a_id, b_id FROM cands
              WHERE CAST({_MATCHES} AS DOUBLE) / {MINHASH_K} >= 0.25),
    dropped AS (SELECT DISTINCT b_id FROM pairs)
    SELECT doc_id FROM documents
    WHERE doc_id < 1000 AND doc_id NOT IN (SELECT b_id FROM dropped)
    """,
)
def x33_near_dup_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The removal step that consumes x07's pair list: each near-dup
    pair (a_id < b_id) drops its higher id, keeping the lower as the
    representative (pairwise policy, documented in
    ``operators/dedup.py:dedup_keep_representatives``).  The dropped-id
    set is tiny and broadcast; the corpus leaves through a broadcast
    LEFT ANTI join — never shuffled."""
    from ...operators.dedup import (
        dedup_keep_representatives,
        minhash_candidates,
        minhash_estimate,
    )

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 1000)
    pairs = (
        minhash_candidates(docs)
        .withColumn("est_sim", minhash_estimate(F.col("a_sig"), F.col("b_sig")))
        .filter(F.col("est_sim") >= 0.25)
        .select("a_id", "b_id")
    )
    return dedup_keep_representatives(docs, pairs).select("doc_id")


@query(
    "x32_repetition_ratio",
    oracle=f"""
    WITH g AS (SELECT doc_id, {_all_shingles_sql(3)} AS grams FROM documents)
    SELECT doc_id,
           CASE WHEN len(grams) > 0
                THEN 1.0 - CAST(len(list_distinct(grams)) AS DOUBLE) / CAST(len(grams) AS DOUBLE)
                ELSE 0.0 END AS rep_ratio
    FROM g
    """,
)
def x32_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style intra-document repetition quality signal: fraction
    of word 3-grams that repeat an earlier 3-gram in the same document
    (1 − distinct/total).  Shuffle-free — one tokenization and two
    integer counts in the scan's project, codegen end-to-end."""
    from ...operators.textstats import repetition_ratio_col

    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", repetition_ratio_col(F.col("text")).alias("rep_ratio"))


@query(
    "x34_duplicate_clusters",
    oracle=f"""
    WITH RECURSIVE {_CAND_CTES},
    pairs AS (SELECT a_id, b_id FROM cands
              WHERE CAST({_MATCHES} AS DOUBLE) / {MINHASH_K} >= 0.25),
    edges AS (SELECT a_id AS src, b_id AS dst FROM pairs
              UNION ALL SELECT b_id, a_id FROM pairs),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    reach(node, lbl) AS (
      SELECT node, node FROM nodes
      UNION
      SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node
    )
    SELECT node AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY node
    """,
)
def x34_duplicate_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive duplicate clusters over x07's near-dup pair list:
    connected components by hash-min label propagation with pointer
    jumping (``operators/graph.py``) — cluster_id = min doc_id
    reachable through the pair graph.  This is the clustering x33's
    pairwise policy documents as its maximal-retention alternative:
    a chain a~b~c keeps exactly one representative instead of two
    drops.  O(log diameter) rounds, each two id-keyed equi-joins; the
    oracle is the same closure as a recursive CTE."""
    from ...operators.graph import connected_components

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 1000)
    pairs = (
        minhash_candidates(docs)
        .withColumn("est_sim", minhash_estimate(F.col("a_sig"), F.col("b_sig")))
        .filter(F.col("est_sim") >= 0.25)
        .select("a_id", "b_id")
    )
    comp = connected_components(pairs)
    return comp.select(F.col("node").alias("doc_id"), "cluster_id")


@query(
    "x35_per_domain_cap",
    oracle="""
    SELECT doc_id, source FROM (
      SELECT doc_id, source,
             row_number() OVER (PARTITION BY source
                                ORDER BY n_chars DESC, doc_id) AS rn
      FROM documents
    ) WHERE rn <= 10
    """,
)
def x35_per_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain document cap (the C4/RefinedWeb "at most k pages per
    host" rule): keep the 10 longest docs per source, doc_id tiebreak.
    One shuffle on the domain key, streaming per-group row counter —
    ``operators/sampling.py:cap_per_group`` documents the hot-domain
    skew mitigation."""
    from ...operators.sampling import cap_per_group

    docs = load_table(spark, sf_dir, "documents")
    capped = cap_per_group(
        docs, "source", [F.col("n_chars").desc(), F.col("doc_id")], k=10
    )
    return capped.select("doc_id", "source")


@query(
    "x36_quality_percentile_filter",
    oracle="""
    WITH t AS (SELECT quantile_cont(CAST(n_chars AS DOUBLE), 0.25) AS thr
               FROM documents)
    SELECT doc_id, n_chars FROM documents, t
    WHERE CAST(n_chars AS DOUBLE) >= thr
    """,
)
def x36_quality_percentile_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide quality gate: drop the bottom quartile by length
    (stand-in for any scalar quality score).  Exact interpolated
    percentile here — bit-identical to ``quantile_cont`` on integer
    inputs (< 2^52: the interpolation arithmetic is exact in doubles);
    the 100 TB path is the same operator with ``approx=True``
    (mergeable ``approx_percentile`` sketch), pinned within tolerance
    by ``tests/test_sampling.py``.  Threshold broadcast into a filter;
    the corpus is never shuffled."""
    from ...operators.sampling import percentile_filter

    docs = load_table(spark, sf_dir, "documents")
    return percentile_filter(docs, "n_chars", 0.25).select("doc_id", "n_chars")


@query(
    "x37_uniform_rebalance",
    oracle="""
    WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
    m AS (SELECT min(n) AS mn FROM c),
    t AS (SELECT lang,
                 CASE WHEN n = mn THEN 'g'
                      ELSE lpad(lower(to_hex(CAST(floor(
                             CAST(mn AS DOUBLE) / CAST(n AS DOUBLE) * 65536
                           ) AS BIGINT))), 4, '0')
                 END AS thr
          FROM c, m)
    SELECT d.lang, count(*) AS n_kept
    FROM documents d JOIN t USING (lang)
    WHERE substr(md5(concat_ws('|', d.lang, CAST(d.doc_id AS VARCHAR))), 1, 4) < t.thr
    GROUP BY d.lang
    """,
)
def x37_uniform_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply-side of the mixture table (x25): deterministically thin
    every language to the smallest language's count — per-group keep
    fraction ``min_n / n`` as a computed hex threshold over the same
    (group, id) hash draw as x23.  The smallest group survives whole
    ('g' keep-all sentinel); counts shuffle one long per group; the
    corpus itself is filter-only.  The count here audits the kept
    mixture."""
    from ...operators.sampling import rebalance_to_uniform

    docs = load_table(spark, sf_dir, "documents")
    kept = rebalance_to_uniform(docs, "lang", "doc_id")
    return kept.groupBy("lang").agg(F.count("*").alias("n_kept"))


_CHUNK_N = 4
_CHUNKED_DOCS = f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    ch AS (SELECT doc_id,
             array_to_string(
               list_transform(range(1, CAST(ceil(len(toks) / {_CHUNK_N}.0) AS BIGINT) + 1),
                 i -> array_to_string(
                        list_slice(toks, (i-1)*{_CHUNK_N} + 1, (i-1)*{_CHUNK_N} + {_CHUNK_N}),
                        ' ')),
               chr(10)) AS text
           FROM t)
"""


@query(
    "x39_line_dedup",
    oracle=f"""
    {_CHUNKED_DOCS},
    l AS (SELECT doc_id, unnest(range(1, len(ls)+1)) AS pos, unnest(ls) AS line
          FROM (SELECT doc_id, string_split(text, chr(10)) AS ls FROM ch)),
    d AS (SELECT md5(line) AS h FROM l GROUP BY 1 HAVING count(*) >= 2),
    k AS (SELECT doc_id, pos, line FROM l WHERE md5(line) NOT IN (SELECT h FROM d))
    SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS clean_text,
           count(*) AS n_lines_kept
    FROM k GROUP BY doc_id
    """,
)
def x39_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-level corpus dedup (the RefinedWeb/CCNet boilerplate
    filter): any line occurring ≥2 times across the corpus is removed
    from EVERY document, survivors reassembled in original order.  The
    synthetic corpus has no newline structure, so lines are fabricated
    first as fixed 4-word chunks (``dedup.chunk_lines`` — itself the
    fixed-window segmentation step of context packing); at sf0.01 that
    yields ~10 % genuine cross-document line duplication.  Occurrence
    counting groups on md5(line) (shuffle carries hashes, not text);
    removal is a LEFT ANTI join against the duplicate-hash set;
    reassembly is the one shuffle that moves surviving text."""
    from ...operators.dedup import chunk_line_array, dedup_line_arrays

    docs = load_table(spark, sf_dir, "documents")
    # r15: compose on the chunk ARRAY directly — split(join(arr)) == arr
    # here (chunk_line_array's equivalence note), so the join("\n") +
    # re-split string round trip over the whole corpus is pure waste
    lined = docs.select(
        "doc_id", chunk_line_array(F.col("text"), _CHUNK_N).alias("lines")
    )
    return dedup_line_arrays(lined)


_SPAN_N = 8


@query(
    "x83_span_dedup",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    g AS (SELECT doc_id, s.pos AS pos, s.g AS g FROM (
            SELECT doc_id, unnest(list_transform(range(len(toks) - {_SPAN_N - 1}),
                   i -> struct_pack(pos := i,
                        g := array_to_string(toks[i + 1:i + {_SPAN_N}], ' ')))) AS s
            FROM t WHERE len(toks) >= {_SPAN_N})),
    dup AS (SELECT g FROM g GROUP BY g HAVING count(*) >= 2),
    starts AS (SELECT doc_id, pos, 1 AS is_start FROM g JOIN dup USING (g)),
    tk AS (SELECT doc_id, s.pos AS pos, s.tok AS tok FROM (
            SELECT doc_id, unnest(list_transform(range(len(toks)),
                   i -> struct_pack(pos := i, tok := toks[i + 1]))) AS s
            FROM t)),
    cov AS (SELECT tk.doc_id, tk.pos, tk.tok,
                   coalesce(max(s.is_start) OVER (PARTITION BY tk.doc_id ORDER BY tk.pos
                            RANGE BETWEEN {_SPAN_N - 1} PRECEDING AND CURRENT ROW), 0)
                     AS covered
            FROM tk LEFT JOIN starts s USING (doc_id, pos))
    SELECT doc_id,
           md5(coalesce(string_agg(CASE WHEN covered = 0 THEN tok END,
                                   ' ' ORDER BY pos), '')) AS clean_digest,
           CAST(sum(1 - covered) AS BIGINT) AS n_tokens_kept,
           CAST(sum(covered) AS BIGINT) AS n_tokens_removed
    FROM cov GROUP BY doc_id
    """,
)
def x83_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring SPAN dedup (Lee et al. 2021's ExactSubstr policy
    in its shuffle-friendly fixed-n covering-mask form,
    ``dedup.dedup_spans``): every token covered by an occurrence of a
    word 8-gram appearing ≥2 times ANYWHERE in the corpus — cross-
    document or within-document — is removed; survivors reassemble in
    original order, and fully-duplicated documents survive with empty
    text rather than vanish.  At sf0.01 the corpus genuinely carries
    ~1,000 duplicated 8-grams, so the mask fires without fabrication.
    The driver hashes ``md5(clean_text)`` (digest, not the text) plus
    the integer kept/removed token counts.  Scale shape: occurrence
    counting groups on md5(gram) — the shuffle carries digests, never
    gram text; the covering mask is ONE per-document streaming RANGE
    window (a token is covered iff a dup-gram START lies in its
    trailing n−1 window — no join explosion); the oracle recomputes
    the identical mask with DuckDB's RANGE frame."""
    from ...operators.dedup import dedup_spans

    docs = load_table(spark, sf_dir, "documents")
    spans = dedup_spans(docs, n=_SPAN_N)
    return spans.select(
        "doc_id",
        F.md5("clean_text").alias("clean_digest"),
        "n_tokens_kept",
        "n_tokens_removed",
    )


@query(
    "x40_tfidf_top_terms",
    oracle="""
    WITH toks AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term
                  FROM documents),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
    df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
    s AS (SELECT doc_id, term, tf, df,
                 CAST(tf AS DOUBLE) / CAST(df AS DOUBLE) AS score,
                 row_number() OVER (PARTITION BY doc_id
                                    ORDER BY CAST(tf AS DOUBLE) / CAST(df AS DOUBLE) DESC,
                                             term) AS rn
          FROM tf JOIN df USING (term))
    SELECT doc_id, term, tf, df, score FROM s WHERE rn <= 3
    """,
)
def x40_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 distinguishing terms per document by tf·idf with linear
    idf (score = tf/df — one IEEE division, bit-exact across engines
    where ``ln(N/df)`` would race two libm implementations; see
    ``textstats.tfidf_top_terms``).  Token explode → two-phase
    (doc, term) hash agg → per-term df over the tf table → term-keyed
    equi-join → one streaming window for the top-k.  The keyword/
    topic-signal extraction stage of a corpus analysis pipeline."""
    from ...operators.textstats import tfidf_top_terms

    docs = load_table(spark, sf_dir, "documents")
    return tfidf_top_terms(docs, k=3)


@query(
    "x85_tfidf_snapshot_probe",
    oracle="""
    WITH bt AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term
                FROM documents WHERE doc_id < 250),
    tfb AS (SELECT doc_id, term, count(*) AS tf FROM bt GROUP BY 1, 2),
    df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tfb GROUP BY 1),
    qt AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term
           FROM documents WHERE doc_id >= 250),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM qt GROUP BY 1, 2),
    s AS (SELECT doc_id, term, tf, CAST(coalesce(df, 1) AS BIGINT) AS df,
                 CAST(tf AS DOUBLE) / CAST(coalesce(df, 1) AS DOUBLE) AS score,
                 row_number() OVER (PARTITION BY doc_id
                                    ORDER BY CAST(tf AS DOUBLE)
                                             / CAST(coalesce(df, 1) AS DOUBLE) DESC,
                                             term) AS rn
          FROM tf LEFT JOIN df USING (term))
    SELECT doc_id, term, tf, df, score FROM s WHERE rn <= 3
    """,
)
def x85_tfidf_snapshot_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x40's snapshot-probe form — the round-4 verdict's fix for its
    19× both-sides-grow scale ratio: the standing corpus's (term, df)
    table (doc_id < 250) is PERSISTED once to parquet
    (``textstats.doc_frequencies``, build-once scratch) and each batch
    run (doc_id ≥ 250) scores its tf against the snapshot — the df
    side never re-aggregates, so a daily run costs O(batch) with the
    batch side of every shuffle O(batch).  A batch term the snapshot
    never saw scores with df = 1 (maximally distinguishing).  Pinned
    equal to the self-scored path when snapshot source == batch."""
    from ...operators.ann_index import ensure_index
    from ...operators.textstats import doc_frequencies, tfidf_top_terms

    docs = load_table(spark, sf_dir, "documents")
    path = _tagged_dir(_SCRATCH, "df_snapshot", "v1-split250", sf_dir=sf_dir)
    ensure_index(
        lambda: doc_frequencies(docs.filter(F.col("doc_id") < 250))
        .write.mode("overwrite")
        .parquet(path),
        path,
    )
    snap = spark.read.parquet(path)
    return tfidf_top_terms(docs.filter(F.col("doc_id") >= 250), k=3, df_counts=snap)


@query(
    "x41_shard_manifest",
    oracle=f"""
    WITH t AS (SELECT doc_id, CAST(len({_TOKS}) AS INT) AS n_tokens,
                      md5(CAST(doc_id AS VARCHAR)) AS sort_key
               FROM documents),
    s AS (SELECT *, CAST(strpos('0123456789abcdef', substr(sort_key, 1, 1)) - 1 AS BIGINT)
                    AS shard
          FROM t)
    SELECT shard, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
           min(substr(sort_key, 1, 15)) AS first_key, max(substr(sort_key, 1, 15)) AS last_key
    FROM s GROUP BY shard
    """,
)
def x41_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-export sharding + the manifest a
    dataloader verifies against: every document lands in shard = first
    hex digit of md5(id) with within-shard order md5(id) — a pure
    function of the id, so re-runs/appends/backfills reproduce the
    same shard files (``sampling.assign_shards``).  The manifest
    aggregates per-shard doc and token totals plus the key range —
    one map-side-combined groupBy over a narrow projection; the
    assignment itself never shuffles.

    The key range is the 60-bit (15 hex char) prefix of the sort key,
    min/max'd NUMERICALLY: ``min(string)`` carries an immutable agg
    buffer that forces Spark's SortAggregate fallback (an extra sort
    of the corpus on both sides of the shuffle), while ``min(long)``
    keeps the two-phase HashAggregate — the same trick
    ``dedup.minhash_signatures`` documents.  Numeric min equals
    lexicographic min for fixed-width hex, so the re-formatted prefix
    is byte-identical to the string form, and 60 bits is ample for
    shard-boundary bookkeeping."""
    from ...operators.sampling import assign_shards

    docs = load_table(spark, sf_dir, "documents")
    with_tokens = docs.select("doc_id", token_count_col(F.col("text")).alias("n_tokens"))
    kpfx = F.conv(F.substring("sort_key", 1, 15), 16, 10).cast("long")
    agg = (
        assign_shards(with_tokens, "doc_id")
        .withColumn("_kp", kpfx)
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.min("_kp").alias("_min_kp"),
            F.max("_kp").alias("_max_kp"),
        )
    )
    to_hex = lambda c: F.lower(F.lpad(F.hex(F.col(c)), 15, "0"))  # noqa: E731
    return agg.select(
        "shard",
        "n_docs",
        "n_tokens",
        to_hex("_min_kp").alias("first_key"),
        to_hex("_max_kp").alias("last_key"),
    )


@query(
    "x42_minhash_accuracy_audit",
    oracle=f"""
    WITH {_CAND_CTES},
    err AS (
      SELECT c.a_id, c.b_id,
             CAST({_MATCHES} AS DOUBLE) / {MINHASH_K} AS est,
             len(list_intersect(sa.s, sb.s))
               / CAST(len(list_distinct(list_concat(sa.s, sb.s))) AS DOUBLE) AS jac
      FROM cands c
      JOIN sh sa ON sa.doc_id = c.a_id
      JOIN sh sb ON sb.doc_id = c.b_id
    )
    SELECT CAST(floor(abs(est - jac) * 10) AS BIGINT) AS err_band,
           count(*) AS n_pairs
    FROM err GROUP BY 1
    """,
)
def x42_minhash_accuracy_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The tuning audit every MinHash deployment runs: per LSH
    candidate pair, |estimated − exact| Jaccard error, histogrammed in
    0.1-wide bands — the evidence for choosing k (signature width) and
    the band layout.  est = matches/k and exact = |∩|/|∪| are both
    single IEEE divisions of exact integers, the abs-difference is one
    subtraction, and the band is its floor — bit-identical across
    engines, so the histogram is hash-exact with no float-sum drift
    (a mean-absolute-error aggregate would order-race; the histogram
    carries strictly more information and only integer counts cross
    the shuffle)."""
    from ...operators.dedup import exact_jaccard, shingles

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 1000)
    sh = docs.select("doc_id", shingles(F.col("text")).alias("s"))
    cands = minhash_candidates(docs).withColumn(
        "est", minhash_estimate(F.col("a_sig"), F.col("b_sig"))
    )
    a = sh.select(F.col("doc_id").alias("a_id"), F.col("s").alias("sa"))
    b = sh.select(F.col("doc_id").alias("b_id"), F.col("s").alias("sb"))
    err = (
        cands.join(a, "a_id")
        .join(b, "b_id")
        .withColumn("jac", exact_jaccard(F.col("sa"), F.col("sb")))
    )
    return (
        err.select(
            F.floor(F.abs(F.col("est") - F.col("jac")) * 10).cast("long").alias("err_band")
        )
        .groupBy("err_band")
        .agg(F.count("*").alias("n_pairs"))
    )


@query(
    "x43_contamination_fraction",
    oracle=f"""
    WITH bg AS (SELECT unnest({_shingles_sql(5)}) AS g FROM documents WHERE doc_id < 20),
    bh AS (SELECT DISTINCT md5(g) AS h FROM bg),
    cs AS (SELECT doc_id, {_shingles_sql(5)} AS s FROM documents WHERE doc_id >= 20),
    ex AS (SELECT doc_id, CAST(len(s) AS BIGINT) AS n_grams, unnest(s) AS g
           FROM cs WHERE len(s) > 0),
    m AS (SELECT doc_id, n_grams,
                 CASE WHEN md5(g) IN (SELECT h FROM bh) THEN 1 ELSE 0 END AS hit
          FROM ex)
    SELECT doc_id, n_grams, CAST(sum(hit) AS BIGINT) AS n_matched,
           CAST(sum(hit) AS DOUBLE) / CAST(n_grams AS DOUBLE) AS contamination_frac
    FROM m GROUP BY doc_id, n_grams
    """,
)
def x43_contamination_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x31's graded twin: per corpus document, the FRACTION of its
    distinct word 5-grams appearing anywhere in the benchmark set
    (doc_id < 20) — the contamination score a pipeline thresholds or
    reports per eval suite instead of the hard any-overlap drop.
    Benchmark hashes broadcast; corpus explode → 0/1 score → one
    count shuffle of two ints per doc; fraction is a single IEEE
    division of exact integers (``dedup.contamination_fraction``)."""
    from ...operators.dedup import contamination_fraction

    docs = load_table(spark, sf_dir, "documents")
    return contamination_fraction(
        docs.filter(F.col("doc_id") >= 20), docs.filter(F.col("doc_id") < 20), n=5
    )


@query(
    "x44_token_budget_selection",
    oracle=f"""
    WITH t AS (SELECT doc_id, CAST(len({_TOKS}) AS INT) AS n_tokens, n_chars
               FROM documents),
    r AS (SELECT doc_id, n_tokens,
                 CAST(sum(n_tokens) OVER (ORDER BY n_chars DESC, doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                   AS cum_tokens
          FROM t)
    SELECT doc_id, n_tokens, cum_tokens FROM r WHERE cum_tokens <= 8000
    """,
)
def x44_token_budget_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy data selection under a token budget: best documents
    first (n_chars standing in for any quality score, doc_id
    tiebreak) until 8,000 tokens are spent.  The oracle states the
    naive global-window form; the engine runs
    ``sampling.select_token_budget`` — the two-phase decomposition
    whose only globally-ordered window covers the per-score aggregate
    table, never the corpus (prefix-per-score + per-score streaming
    cumsum ≡ the global running sum; pinned equal by test)."""
    from ...operators.sampling import select_token_budget

    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id", token_count_col(F.col("text")).alias("n_tokens"), "n_chars"
    )
    return select_token_budget(t, "n_chars", "doc_id", "n_tokens", 8000).select(
        "doc_id", "n_tokens", "cum_tokens"
    )


@query(
    "x45_mixture_drift",
    oracle="""
    WITH a AS (SELECT lang, count(*) AS n_a FROM documents WHERE doc_id % 2 = 0 GROUP BY 1),
    b AS (SELECT lang, count(*) AS n_b FROM documents WHERE doc_id % 2 = 1 GROUP BY 1),
    j AS (SELECT coalesce(a.lang, b.lang) AS lang,
                 coalesce(n_a, 0) AS n_a, coalesce(n_b, 0) AS n_b
          FROM a FULL OUTER JOIN b ON a.lang = b.lang),
    s AS (SELECT lang, n_a, n_b,
                 CAST(n_a AS DOUBLE) / CAST(sum(n_a) OVER () AS DOUBLE) AS share_a,
                 CAST(n_b AS DOUBLE) / CAST(sum(n_b) OVER () AS DOUBLE) AS share_b
          FROM j)
    SELECT lang, n_a, n_b, share_a, share_b, abs(share_a - share_b) AS drift FROM s
    """,
)
def x45_mixture_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot mixture-drift monitor: per-language doc counts, shares
    and |Δshare| between two corpus snapshots (doc_id parity standing
    in for crawl N vs crawl N+1) — the alarm signal for a silently
    shifted language/domain mix after a refresh or filter change.
    Per-group integer counts + single IEEE divisions, bit-exact
    (``sampling.mixture_drift``; the TV-distance Σ is left to the
    caller because a float sum over an unordered shuffle isn't
    reproducible — the per-group rows are)."""
    from ...operators.sampling import mixture_drift

    docs = load_table(spark, sf_dir, "documents")
    return mixture_drift(
        docs.filter(F.col("doc_id") % 2 == 0),
        docs.filter(F.col("doc_id") % 2 == 1),
        "lang",
    )


@query(
    "x46_quality_distribution",
    oracle="""
    WITH t AS (SELECT lang, CAST(n_chars AS DOUBLE) AS v FROM documents),
    thr AS (SELECT quantile_cont(v, 0.25) AS p25, quantile_cont(v, 0.5) AS p50,
                   quantile_cont(v, 0.75) AS p75 FROM t)
    SELECT lang,
           CAST(CASE WHEN v <= p25 THEN 0 WHEN v <= p50 THEN 1
                     WHEN v <= p75 THEN 2 ELSE 3 END AS BIGINT) AS quartile,
           count(*) AS n_docs
    FROM t, thr GROUP BY 1, 2
    """,
)
def x46_quality_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain quality-quartile report: every document bucketed
    against the corpus-wide p25/p50/p75 of its length score, counted
    per (lang, quartile) — the "is this domain all low-quality?"
    evidence behind per-domain filtering policy.  Exact interpolated
    percentiles (bit-identical to ``quantile_cont`` on integer inputs,
    the x36 contract; ``approx_percentile`` is the documented 100 TB
    swap); thresholds broadcast, one integer count shuffle
    (``sampling.quality_distribution``)."""
    from ...operators.sampling import quality_distribution

    docs = load_table(spark, sf_dir, "documents")
    return quality_distribution(docs, "lang", "n_chars")


@query(
    "x49_incremental_dedup_probe",
    oracle=f"""
    WITH {_CAND_CTES}
    SELECT a_id, b_id, {_MATCHES} / {float(MINHASH_K)} AS est_sim
    FROM cands
    WHERE b_id >= 250 AND {_MATCHES} / {float(MINHASH_K)} >= 0.25
    """,
)
def x49_incremental_dedup_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental crawl dedup: docs < 250 are the EXISTING corpus,
    persisted once as a banded signature store
    (``dedup.write_signature_store``, build-once scratch); docs
    250–999 are the new crawl, probed against store ∪ batch with the
    shared MAX_BUCKET cap (``dedup.incremental_dedup_probe``).  The
    result is exactly x07's full-corpus pair set restricted to pairs
    touching the new batch — the oracle says so literally (same
    candidate CTE chain, ``b_id >= 500``) — but the existing corpus
    was never re-shingled: at 100 TB each day's probe costs
    O(batch), not O(corpus)."""
    from ...operators.dedup import incremental_dedup_probe, write_signature_store
    from ...operators.ann_index import ensure_index

    docs = load_table(spark, sf_dir, "documents")
    old = docs.filter(F.col("doc_id") < 250)
    new = docs.filter((F.col("doc_id") >= 250) & (F.col("doc_id") < 1000))
    store_path = _tagged_dir(_SCRATCH, "dedup_store", "v2-split250", sf_dir=sf_dir)
    ensure_index(lambda: write_signature_store(old, store_path), store_path)
    store = spark.read.parquet(store_path)
    return incremental_dedup_probe(store, new)


def _x48_pairs(spark: SparkSession, sf_dir: str):
    from ...operators.dedup import minhash_candidates, minhash_estimate

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 1000)
    pairs = (
        minhash_candidates(docs)
        .withColumn("est_sim", minhash_estimate(F.col("a_sig"), F.col("b_sig")))
        .filter(F.col("est_sim") >= 0.25)
        .select("a_id", "b_id")
    )
    return docs, pairs


@query(
    "x93_quality_cluster_dedup",
    oracle=f"""
    WITH RECURSIVE {_CAND_CTES},
    pairs AS (SELECT a_id, b_id FROM cands
              WHERE CAST({_MATCHES} AS DOUBLE) / {MINHASH_K} >= 0.25),
    edges AS (SELECT a_id AS src, b_id AS dst FROM pairs
              UNION ALL SELECT b_id, a_id FROM pairs),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    reach(node, lbl) AS (
      SELECT node, node FROM nodes
      UNION
      SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node
    ),
    comp AS (SELECT node, min(lbl) AS cluster_id FROM reach GROUP BY node),
    sizes AS (SELECT cluster_id, count(*) AS n FROM comp GROUP BY 1),
    sel AS (SELECT c.node, c.cluster_id,
                   row_number() OVER (PARTITION BY c.cluster_id
                                      ORDER BY d2.n_chars DESC, c.node) AS rn
            FROM comp c JOIN documents d2 ON d2.doc_id = c.node)
    SELECT d.doc_id, CAST(coalesce(s.n, 1) AS BIGINT) AS n_members
    FROM (SELECT doc_id FROM documents WHERE doc_id < 1000) d
    LEFT JOIN sel ON sel.node = d.doc_id
    LEFT JOIN sizes s ON sel.cluster_id = s.cluster_id
    WHERE sel.node IS NULL OR sel.rn = 1
    """,
)
def x93_quality_cluster_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x48's cluster dedup with QUALITY-AWARE representative selection:
    each transitive near-dup cluster keeps its LONGEST member
    (n_chars desc, ties by min id) instead of the min-id accident —
    the policy real pipelines want, since dedup should never discard
    the best copy of a near-dup family.  Same LSH pairs → connected
    components chain as x48; the representative pick is one window
    over the component table (≪ corpus), never a corpus-wide window
    (``graph.cluster_dedup(score_col=...)``)."""
    from ...operators.graph import cluster_dedup, connected_components

    docs, pairs = _x48_pairs(spark, sf_dir)
    comp = connected_components(pairs)
    return cluster_dedup(
        docs.select("doc_id", "n_chars"), "doc_id", comp, score_col="n_chars"
    )


@query(
    "x48_cluster_dedup",
    oracle=f"""
    WITH RECURSIVE {_CAND_CTES},
    pairs AS (SELECT a_id, b_id FROM cands
              WHERE CAST({_MATCHES} AS DOUBLE) / {MINHASH_K} >= 0.25),
    edges AS (SELECT a_id AS src, b_id AS dst FROM pairs
              UNION ALL SELECT b_id, a_id FROM pairs),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    reach(node, lbl) AS (
      SELECT node, node FROM nodes
      UNION
      SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node
    ),
    comp AS (SELECT node, min(lbl) AS cluster_id FROM reach GROUP BY node),
    sizes AS (SELECT cluster_id, count(*) AS n FROM comp GROUP BY 1)
    SELECT d.doc_id, CAST(coalesce(s.n, 1) AS BIGINT) AS n_members
    FROM (SELECT doc_id FROM documents WHERE doc_id < 1000) d
    LEFT JOIN comp c ON d.doc_id = c.node
    LEFT JOIN sizes s ON c.cluster_id = s.cluster_id
    WHERE c.node IS NULL OR c.cluster_id = d.doc_id
    """,
)
def x48_cluster_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style cluster-retention dedup end-to-end: x07's LSH
    candidate pairs → connected components (x34) → keep the min-id
    representative per transitive cluster plus all unclustered docs,
    each with the size of the cluster it represents
    (``operators/graph.py:cluster_dedup``).  The maximal-retention
    counterpart to x33's pairwise policy — a chain a~b~c keeps exactly
    one doc instead of one-per-pair-accident.  Components cover only
    candidate nodes (tiny after blocking), so the corpus-side joins
    broadcast; the oracle closes the same graph with a recursive CTE."""
    from ...operators.graph import cluster_dedup, connected_components

    docs, pairs = _x48_pairs(spark, sf_dir)
    comp = connected_components(pairs)
    return cluster_dedup(docs, "doc_id", comp)


_HEXPOS = "strpos('0123456789abcdef', substr(md5(t), {i}, 1)) - 1"
_BUCKET = (
    f"(({_HEXPOS.format(i=1)}) * 256 + ({_HEXPOS.format(i=2)}) * 16"
    f" + ({_HEXPOS.format(i=3)}))"
)


@query(
    "x47_hashed_linear_score",
    oracle=f"""
    WITH t AS (SELECT doc_id,
                      regexp_extract_all(lower(text), '[a-z]+') AS toks
               FROM documents),
    s AS (SELECT doc_id, len(toks) AS n_tokens,
                 CAST(list_sum(list_transform(toks,
                      t -> ({_BUCKET} * 2654435761) % 4096 - 2048)) AS BIGINT)
                 AS wsum
          FROM t)
    SELECT doc_id, CAST(n_tokens AS INT) AS n_tokens,
           CASE WHEN n_tokens > 0
                THEN CAST(wsum AS DOUBLE) / CAST(n_tokens * 2048 AS DOUBLE)
                ELSE 0.0 END AS score
    FROM s
    """,
)
def x47_hashed_linear_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality gate: fasttext-style hashed linear-model
    inference over every document — tokenize, hash each token into
    4096 feature buckets, mean-pool integer bucket weights into a
    score in ≈[-1, 1] (``textstats.hashed_linear_score``).  The
    pseudo-weight formula stands in for trained parameters; a real
    model is one broadcast array literal away (tested equivalent in
    ``tests/test_textstats.py``).  Whole plan is a single codegen
    projection on the scan — no shuffle, no join, no Python — so at
    100 TB classifier inference costs exactly one pass over the text
    column.  int64 accumulation + one IEEE division keeps the score
    bit-identical across engines and partitionings."""
    from ...operators.textstats import hashed_linear_score

    docs = load_table(spark, sf_dir, "documents")
    toks = F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z]+"), F.lit(0))
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        hashed_linear_score(F.col("text")).alias("score"),
    )


