"""Curation tier: SemDeDup, perceptron quality classifier, PII scan,
selection pipelines, leakage audits.

Split from ``plans/extensions.py`` at the round-14 close (r13 verdict
item 8) — code moved VERBATIM; the aggregator re-exports every name, so
``plans.extensions.<name>`` remains the stable public path."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from ..registry import query
from ..tables import load_table
from ...operators.similarity import as_double_vec
from ...operators.textstats import token_count_col
from .fragments import _TOKS, _VEC, _cos_sql
from .ann import _ensure_ivf_index
from .text import _kmeans_fasg_parts
from .retrieval import _hex_ladder

# ---------------------------------------------------------------------------
# Session-5 tier: SemDeDup, classifier training, packing, PII, curves
# ---------------------------------------------------------------------------


def _build_semdedup_oracle(tau: float, n_centroids: int = 16, n_iter: int = 3) -> str:
    """SemDeDup's full lifecycle in one DuckDB statement: the shared
    k-means chain (``_kmeans_fasg_parts`` — identical CTEs to the x27
    oracle) down to the converged assignment, then within-cluster
    lower-id pairs, the same sequential-fold cosine, and the
    keep-lowest-id dup flag.  MAX over bit-equal pair cosines is
    order-free, so ``max_prior_sim`` hash-compares exactly."""
    parts = _kmeans_fasg_parts(n_centroids, n_iter)
    ctes = ",\n".join(parts)
    return (
        f"WITH e AS MATERIALIZED (SELECT vec_id, {_VEC} AS v FROM embeddings),\n"
        f"{ctes},\n"
        f"prs AS (SELECT b.vec_id AS vec_id, {_cos_sql('a.v', 'b.v')} AS cs\n"
        f"        FROM fasg a JOIN fasg b ON a.centroid_id = b.centroid_id\n"
        f"                               AND a.vec_id < b.vec_id),\n"
        f"dups AS (SELECT vec_id, max(cs) AS max_prior_sim FROM prs\n"
        f"         WHERE cs >= {tau!r} GROUP BY 1)\n"
        f"SELECT f.vec_id, f.centroid_id,\n"
        f"       CAST(CASE WHEN d.vec_id IS NULL THEN 0 ELSE 1 END AS INT) AS is_dup,\n"
        f"       COALESCE(d.max_prior_sim, 0.0) AS max_prior_sim\n"
        f"FROM fasg f LEFT JOIN dups d ON d.vec_id = f.vec_id"
    )


@query("x157_semdedup", oracle=_build_semdedup_oracle(tau=0.35))
def x157_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): embedding-space dedup scoped to
    k-means clusters — the semantic rung of the dedup ladder (exact
    x01 → MinHash x06 → SimHash x09 → embedding-LSH x13 → semantic
    x157: catches paraphrases that share no shingles at all).  The
    quantizer is the SAME trained k-means as x27's IVF (farthest-first
    + 3 Lloyd rounds), so one training pass serves both the ANN index
    and the dedup pass; candidate pairs never cross clusters, keeping
    the pair count Σ m_c² with ``n_centroids`` sized to the corpus
    (the LSH plane-count rule applied to centroid count).  Oracle runs
    the entire lifecycle — seeds, 3 Lloyd rounds, assignment, pair
    scan, flags — as one chained-CTE statement
    (operators/similarity.py:semantic_dedup)."""
    from ...operators.ann_index import kmeans_centroids
    from ...operators.similarity import semantic_dedup

    emb = load_table(spark, sf_dir, "embeddings")
    cents = kmeans_centroids(emb, n_centroids=16, n_iter=3)
    return semantic_dedup(emb, cents, tau=0.35)


def _perceptron_cte_parts(
    n_epochs: int, hex_digits: int, train_where: str = ""
) -> list[str]:
    """The training-run CTE chain (tok/tf/lab/tfl/grid/w0..wN) shared
    by the x158 trajectory oracle and the x169 held-out evaluation —
    ``train_where`` restricts which documents the epochs see (the
    hash-split filter), while ``tf`` stays corpus-wide so the eval side
    can reuse it."""
    n_buckets = 16**hex_digits
    parts = [
        f"""tok AS (SELECT doc_id, {_hex_ladder('t', hex_digits)} AS b FROM (
      SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS t
      FROM documents))""",
        "tf AS MATERIALIZED (SELECT doc_id, b, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY 1, 2)",
        "lab AS (SELECT doc_id, CAST(CASE WHEN lang = 'en' THEN 1 ELSE -1 END AS BIGINT) AS y FROM documents)",
        "tfl AS MATERIALIZED (SELECT tf.doc_id, tf.b, tf.c, lab.y FROM tf JOIN lab USING (doc_id)"
        + (f" WHERE {train_where}" if train_where else "")
        + ")",
        f"grid AS (SELECT CAST(unnest(range(0, {n_buckets})) AS BIGINT) AS b)",
        "w0 AS (SELECT b, CAST(0 AS BIGINT) AS w FROM grid)",
    ]
    for e in range(1, n_epochs + 1):
        parts.append(
            f"m{e} AS (SELECT doc_id, y, CAST(SUM(c * w) AS BIGINT) AS margin "
            f"FROM tfl JOIN w{e - 1} USING (b) GROUP BY 1, 2)"
        )
        parts.append(
            f"u{e} AS (SELECT b, CAST(SUM(y * c) AS BIGINT) AS du FROM tfl "
            f"WHERE doc_id IN (SELECT doc_id FROM m{e} WHERE y * margin <= 0) "
            f"GROUP BY 1)"
        )
        parts.append(
            f"w{e} AS MATERIALIZED (SELECT p.b, p.w + COALESCE(u.du, CAST(0 AS BIGINT)) AS w "
            f"FROM w{e - 1} p LEFT JOIN u{e} u ON u.b = p.b)"
        )
    return parts


def _build_perceptron_oracle(n_epochs: int = 3, hex_digits: int = 2) -> str:
    """The whole training run as one DuckDB statement: the epoch loop
    is FIXED-length, so it unrolls into chained CTEs (the x27 k-means
    precedent applied to a classifier) — per epoch one margin
    aggregation against the previous weight table, one summed update
    over the misclassified set, one weight refresh over the full
    bucket grid.  All integer arithmetic; DuckDB's HUGEINT sums cast
    back to BIGINT at every checked boundary."""
    parts = _perceptron_cte_parts(n_epochs, hex_digits)
    sel = ", ".join(f"w{e}.w AS w{e}" for e in range(1, n_epochs + 1))
    joins = " ".join(
        f"JOIN w{e} ON w{e}.b = w1.b" for e in range(2, n_epochs + 1)
    )
    return (
        "WITH " + ",\n".join(parts) + f"\nSELECT w1.b, {sel} FROM w1 {joins}"
    )


_TEST_SPLIT_WHERE = "substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) >= 'e666'"
_TRAIN_SPLIT_WHERE = "substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'cccc'"


def _build_perceptron_eval_oracle(n_epochs: int = 3, hex_digits: int = 2) -> str:
    """Held-out evaluation: epochs run over the hash-split TRAIN docs
    only (the ``train_where`` filter on tfl), then the final weights
    score the TEST split's tf rows and reduce to one confusion row.
    pred is ``margin > 0`` (a zero margin counts negative — documented
    tie rule); only test docs with ≥1 token appear (no features ⇒ no
    prediction, both engines agree)."""
    parts = _perceptron_cte_parts(n_epochs, hex_digits, _TRAIN_SPLIT_WHERE)
    parts.append(
        f"mt AS (SELECT tf.doc_id, lab.y, CAST(SUM(tf.c * w{n_epochs}.w) AS BIGINT) AS margin "
        f"FROM tf JOIN lab USING (doc_id) JOIN w{n_epochs} ON w{n_epochs}.b = tf.b "
        f"WHERE {_TEST_SPLIT_WHERE} GROUP BY 1, 2)"
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + """
    SELECT CAST(SUM(CASE WHEN y = 1 AND margin > 0 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
           CAST(SUM(CASE WHEN y = -1 AND margin > 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
           CAST(SUM(CASE WHEN y = 1 AND margin <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
           CAST(SUM(CASE WHEN y = -1 AND margin <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn,
           CAST(count(*) AS BIGINT) AS n_scored,
           CAST(SUM(CASE WHEN (y = 1) = (margin > 0) THEN 1 ELSE 0 END) * 1000000
                // count(*) AS BIGINT) AS acc_fp
    FROM mt"""
    )


@query("x158_perceptron_train", oracle=_build_perceptron_oracle())
def x158_perceptron_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-classifier TRAINING at corpus scale — the batch
    perceptron over hashed-unigram features (fasttext's model shape,
    DSIR's bounded feature space), with ``lang = 'en'`` as the +1
    class (the same target convention as x143's importance weights).
    Three epochs, learning rate 1, integer-exact; the result is the
    full weight trajectory (w1..w3 per bucket), so the oracle checks
    every epoch's update, not just the converged vector.  Each epoch
    costs two corpus aggregations; the driver round-trip is the
    256-row weight table (the Lloyd-sync contract)
    (operators/classifier.py:perceptron_train)."""
    from ...operators.classifier import perceptron_train

    docs = load_table(spark, sf_dir, "documents")
    return perceptron_train(docs, positive=F.col("lang") == "en")


@query(
    "x159_concat_chunk_spans",
    oracle=f"""
    WITH n AS (SELECT doc_id, CAST(len({_TOKS}) AS BIGINT) AS n_tok FROM documents),
    s AS (SELECT doc_id, n_tok,
                 CAST(COALESCE(SUM(n_tok) OVER (ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0) AS BIGINT) AS start_off
          FROM n)
    SELECT doc_id, n_tok, start_off,
           CAST(start_off // 64 AS BIGINT) AS first_chunk,
           CAST((start_off + n_tok - 1) // 64 AS BIGINT) AS last_chunk,
           CAST((start_off + n_tok - 1) // 64 - start_off // 64 + 1 AS BIGINT) AS n_chunks,
           CAST(CASE WHEN (start_off + n_tok - 1) // 64 > start_off // 64
                THEN 1 ELSE 0 END AS INT) AS crosses
    FROM s
    """,
)
def x159_concat_chunk_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style concat-and-chunk packing audit: exact GLOBAL token
    offsets (two-level distributed prefix sum — never a global
    single-partition window; the oracle's one-window form is the
    semantic spec, the Spark plan is the scale-correct scan algorithm)
    and each document's context-window span at C=64 — which training
    windows contain it and whether the loader fragments it across a
    boundary.  The aggregate crossing fraction is the knob behind
    "should we pack with document masking or pad" decisions
    (operators/sampling.py:concat_chunk_spans)."""
    from ...operators.sampling import concat_chunk_spans
    from ...operators.textstats import token_count_col

    docs = load_table(spark, sf_dir, "documents")
    withn = docs.select(
        "doc_id", token_count_col(F.col("text")).cast("long").alias("n_tok")
    )
    return concat_chunk_spans(withn, "doc_id", "n_tok", context_len=64)


_PII_AUG_SQL = """text
  || CASE WHEN doc_id % 3 = 0
          THEN ' user' || CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END
  || CASE WHEN doc_id % 5 = 0
          THEN ' 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.1' ELSE '' END
  || CASE WHEN doc_id % 7 = 0
          THEN ' 202655' || CAST(doc_id AS VARCHAR) ELSE '' END"""


_PII_ORACLE_PATS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("url", r"https?://[^\s]+", "<URL>"),
    ("phone", r"\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b", "<PHONE>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IPV4>"),
    ("digitrun", r"\b[0-9]{7,}\b", "<DIGITRUN>"),
]


def _pii_redact_sql(expr: str) -> str:
    for _, pat, tag in _PII_ORACLE_PATS:
        expr = f"regexp_replace({expr}, '{pat}', '{tag}', 'g')"
    return expr


_PII_COUNT_COLS = ",\n           ".join(
    f"CAST(len(regexp_extract_all(t, '{pat}')) AS BIGINT) AS n_{name}"
    for name, pat, _ in _PII_ORACLE_PATS
)


@query(
    "x160_pii_scan",
    oracle=f"""
    WITH aug AS (SELECT doc_id, {_PII_AUG_SQL} AS t FROM documents),
    red AS (SELECT doc_id, t, {_pii_redact_sql('t')} AS r FROM aug)
    SELECT doc_id,
           {_PII_COUNT_COLS},
           md5(r) AS redacted_md5,
           CAST(length(r) AS BIGINT) AS redacted_len,
           CAST(length(r) - length(t) AS BIGINT) AS chars_delta
    FROM red
    """,
)
def x160_pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scan + redaction over the corpus.  The synthetic documents
    carry no natural PII, so the fixture PLANTS deterministic markers
    (an email on every 3rd doc, an IPv4 on every 5th, a long digit run
    on every 7th — the identical concat expression on both engines)
    and the scanner runs on the augmented text; at scale the operator
    runs on raw text unchanged.  Counts are measured on the raw side,
    the redaction cascade (email → IP → digit run) on the output side,
    and only the redacted md5 leaves the engine — the no-PII-in-the-
    output contract (operators/textstats.py:pii_scan)."""
    from ...operators.textstats import pii_scan

    docs = load_table(spark, sf_dir, "documents")
    did = F.col("doc_id")
    aug = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                did % 3 == 0,
                F.concat(
                    F.lit(" user"), did.cast("string"), F.lit("@example.com")
                ),
            ).otherwise(F.lit("")),
            F.when(
                did % 5 == 0,
                F.concat(
                    F.lit(" 10.0."), (did % 256).cast("string"), F.lit(".1")
                ),
            ).otherwise(F.lit("")),
            F.when(
                did % 7 == 0, F.concat(F.lit(" 202655"), did.cast("string"))
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    return pii_scan(aug)


@query(
    "x161_vocab_growth",
    oracle="""
    WITH tok AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS t
                 FROM documents),
    ft AS (SELECT t, CAST(min(doc_id) AS BIGINT) AS fd FROM tok GROUP BY 1),
    tb AS (SELECT CAST(length(bin(fd + 1)) - 1 AS BIGINT) AS bucket,
                  CAST(count(*) AS BIGINT) AS n_new_types
           FROM ft GROUP BY 1),
    db AS (SELECT CAST(length(bin(doc_id + 1)) - 1 AS BIGINT) AS bucket,
                  CAST(count(*) AS BIGINT) AS n_tokens
           FROM tok GROUP BY 1),
    j AS (SELECT db.bucket,
                 COALESCE(tb.n_new_types, CAST(0 AS BIGINT)) AS n_new_types,
                 db.n_tokens
          FROM db LEFT JOIN tb ON tb.bucket = db.bucket)
    SELECT bucket, n_new_types,
           CAST(SUM(n_new_types) OVER (ORDER BY bucket) AS BIGINT) AS cum_types,
           n_tokens,
           CAST(SUM(n_tokens) OVER (ORDER BY bucket) AS BIGINT) AS cum_tokens
    FROM j
    """,
)
def x161_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary growth curve: doc-id prefixes that double
    per bucket, each distinct term charged to the bucket of its first
    document — (cum_tokens, cum_types) are exact Heaps points V=K·N^β
    from ONE corpus pass (no repeated prefix scans).  The tokenizer-
    budget planning audit x87 sizes against today's corpus; this one
    projects tomorrow's (operators/textstats.py:vocab_growth_curve)."""
    from ...operators.textstats import vocab_growth_curve

    docs = load_table(spark, sf_dir, "documents")
    return vocab_growth_curve(docs)


@query(
    "x162_doremi_reweight",
    oracle="""
    WITH toks AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term
                  FROM documents),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
    c AS (SELECT term, CAST(sum(tf) AS BIGINT) AS c FROM tf GROUP BY 1),
    n AS (SELECT CAST(sum(tf) AS BIGINT) AS n_total FROM tf),
    ds AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tok,
                  CAST(sum(tf * (n_total // c)) AS BIGINT) AS s_sum
           FROM tf JOIN c USING (term) CROSS JOIN n GROUP BY doc_id),
    dom AS (SELECT source, CAST(SUM(n_tok) AS BIGINT) AS n_d,
                   CAST(SUM(s_sum) AS BIGINT) AS s_d
            FROM ds JOIN documents USING (doc_id) GROUP BY 1),
    tot AS (SELECT CAST(SUM(n_d) AS BIGINT) AS n_all,
                   CAST(SUM(s_d) AS BIGINT) AS s_all FROM dom),
    sc AS (SELECT source, n_d,
                  CAST(s_d * 10000 // n_d AS BIGINT) AS avg_fp,
                  CAST(s_all * 10000 // n_all AS BIGINT) AS base_fp,
                  CAST(n_d * 10000 // n_all AS BIGINT) AS w0_fp
           FROM dom CROSS JOIN tot),
    up AS (SELECT source, n_d, avg_fp,
                  CAST(greatest(CAST(0 AS BIGINT), avg_fp - base_fp) AS BIGINT) AS excess_fp,
                  w0_fp,
                  CAST(w0_fp * (10000 + least(CAST(10000 AS BIGINT),
                       greatest(CAST(0 AS BIGINT), avg_fp - base_fp))) // 10000
                       AS BIGINT) AS w1_raw
           FROM sc),
    ut AS (SELECT CAST(SUM(w1_raw) AS BIGINT) AS w1_tot FROM up)
    SELECT source, n_d AS n_tokens, avg_fp, excess_fp, w0_fp,
           CAST(w1_raw * 10000 // w1_tot AS BIGINT) AS w1_fp
    FROM up CROSS JOIN ut
    """,
)
def x162_doremi_reweight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One DoReMi mixture-reweighting step over the source domains:
    domains whose average unigram surprisal exceeds the corpus baseline
    (the excess-loss proxy) get their token-share weight multiplied by
    the bounded integer exp-surrogate (1 + min(1, excess)), then
    renormalized — the data-mixture optimization loop's inner update,
    libm-free and bit-identical across engines.  At scale the scorer
    runs in snapshot mode (x86) so the step never re-aggregates the
    corpus; everything after the per-domain aggregate is arithmetic
    over the |domains|-row table
    (operators/sampling.py:doremi_reweight)."""
    from ...operators.sampling import doremi_reweight
    from ...operators.textstats import unigram_surprisal

    docs = load_table(spark, sf_dir, "documents")
    scores = unigram_surprisal(docs).select("doc_id", "n_tokens", "surprisal_sum")
    return doremi_reweight(docs, scores)


@query(
    "x163_chunk_dedup",
    oracle=f"""
    WITH n AS (SELECT doc_id, CAST(len({_TOKS}) AS BIGINT) AS n_tok FROM documents),
    s AS (SELECT doc_id,
                 CAST(COALESCE(SUM(n_tok) OVER (ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0) AS BIGINT) AS start_off
          FROM n),
    tk AS (SELECT doc_id, unnest({_TOKS}) AS t,
                  generate_subscripts({_TOKS}, 1) AS p
           FROM documents),
    g AS (SELECT s.start_off + p - 1 AS gp,
                 CAST((s.start_off + p - 1) // 16 AS BIGINT) AS chunk, t
          FROM tk JOIN s USING (doc_id)),
    ch AS (SELECT chunk, md5(array_to_string(list(t ORDER BY gp), ' ')) AS h
           FROM g GROUP BY 1),
    hc AS (SELECT h, CAST(count(*) AS BIGINT) AS mult FROM ch GROUP BY 1)
    SELECT mult, CAST(count(*) AS BIGINT) AS n_hashes,
           CAST(mult * count(*) AS BIGINT) AS n_chunks
    FROM hc GROUP BY 1
    """,
)
def x163_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-WINDOW dedup audit: document-level dedup can pass a
    corpus whose PACKED context windows still repeat (boilerplate
    shorter than a doc; identical docs whose global offsets happen to
    align) — this measures duplication at the granularity the model
    actually trains on.  Exact global token positions (x159's
    two-level prefix sum) → window = pos div 16 → one md5 per window
    over its in-order tokens → multiplicity histogram over window
    digests.  One linear token-stream shuffle keyed on window id,
    per-group state bounded by the context length, histogram over the
    digest table only (operators/dedup.py:chunk_dedup_stats)."""
    from ...operators.dedup import chunk_dedup_stats

    docs = load_table(spark, sf_dir, "documents")
    return chunk_dedup_stats(docs, context_len=16)


@query(
    "x164_zipf_histogram",
    oracle="""
    WITH toks AS (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS t
                  FROM documents),
    c AS (SELECT t, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY 1),
    h AS (SELECT CAST(length(bin(c)) - 1 AS BIGINT) AS bucket,
                 CAST(count(*) AS BIGINT) AS n_types,
                 CAST(sum(c) AS BIGINT) AS n_tokens
          FROM c GROUP BY 1),
    l AS (SELECT h.*, lead(n_types) OVER (ORDER BY bucket) AS lead_types FROM h)
    SELECT bucket, n_types, n_tokens,
           CAST(CASE WHEN lead_types IS NOT NULL THEN n_types * 1000 // lead_types
                ELSE 0 END AS BIGINT) AS ratio_fp
    FROM l
    """,
)
def x164_zipf_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law corpus forensics without a rank: the count-bucket
    (frequency-octave) histogram — types per octave should decay by
    ~2^s per bucket under Zipf, and the decay ratio lands in
    ``ratio_fp`` (2000 ≈ the natural-text s=1 line).  The rank-based
    formulation needs a vocabulary-wide sort; this one needs a term
    count and a ≤64-row histogram.  Heaps (x161) asks "does more data
    buy vocabulary"; Zipf asks "is the frequency structure natural" —
    the two standard sanity curves a corpus datasheet carries
    (operators/textstats.py:zipf_bucket_histogram)."""
    from ...operators.textstats import zipf_bucket_histogram

    docs = load_table(spark, sf_dir, "documents")
    return zipf_bucket_histogram(docs)


@query(
    "x165_corpus_datasheet",
    oracle=f"""
    SELECT 'n_docs' AS metric, CAST(count(*) AS BIGINT) AS value FROM documents
    UNION ALL
    SELECT 'n_tokens', CAST(sum(len({_TOKS})) AS BIGINT) FROM documents
    UNION ALL
    SELECT 'n_chars', CAST(sum(length(text)) AS BIGINT) FROM documents
    UNION ALL
    SELECT 'n_langs', CAST(count(DISTINCT lang) AS BIGINT) FROM documents
    UNION ALL
    SELECT 'n_sources', CAST(count(DISTINCT source) AS BIGINT) FROM documents
    UNION ALL
    SELECT 'n_exact_dup_docs',
           CAST(count(*) - count(DISTINCT md5(text)) AS BIGINT) FROM documents
    UNION ALL
    SELECT 'vocab_size', CAST(count(DISTINCT t) AS BIGINT) FROM (
      SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS t FROM documents)
    UNION ALL
    SELECT 'max_doc_tokens', CAST(max(len({_TOKS})) AS BIGINT) FROM documents
    """,
)
def x165_corpus_datasheet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dataset-card headline table: sizes, composition cardinality,
    exact-duplicate mass, vocabulary, longest doc — one long-format
    (metric, value) row set per corpus snapshot, all integers so
    snapshots diff cleanly (feed two of these to the x136 diff audit).
    Composition of existing aggregates; the release-pipeline stamp
    (operators/textstats.py:corpus_datasheet)."""
    from ...operators.textstats import corpus_datasheet

    docs = load_table(spark, sf_dir, "documents")
    return corpus_datasheet(docs)


def _build_index_leakage_oracle(tau: float, n_c: int = 16) -> str:
    """The leakage matrix over the FLAT deterministic
    first-``n_c``-by-id assignment — the assignment the x21 IVF index
    persists (same CTEs as ``_build_index_semdedup_oracle``), with the
    x22 hash-split CASE on both pair ends."""

    def split(col: str) -> str:
        return (
            f"CASE WHEN substr(md5(CAST({col} AS VARCHAR)), 1, 4) < 'cccc' THEN 'train' "
            f"WHEN substr(md5(CAST({col} AS VARCHAR)), 1, 4) < 'e666' THEN 'val' "
            f"ELSE 'test' END"
        )

    return f"""
    WITH e AS MATERIALIZED (SELECT vec_id, {_VEC} AS v FROM embeddings),
    cents AS MATERIALIZED (SELECT vec_id AS centroid_id, v AS cvec FROM e
                           ORDER BY vec_id LIMIT {n_c}),
    asgA AS (SELECT e.vec_id, e.v, c.centroid_id,
                    row_number() OVER (PARTITION BY e.vec_id
                      ORDER BY {_cos_sql('e.v', 'c.cvec')} DESC, c.centroid_id) AS rn
             FROM e CROSS JOIN cents c),
    fasg AS (SELECT vec_id, v, centroid_id FROM asgA WHERE rn = 1),
    prs AS (SELECT a.vec_id AS a_id, b.vec_id AS b_id, {_cos_sql('a.v', 'b.v')} AS cs
            FROM fasg a JOIN fasg b ON a.centroid_id = b.centroid_id
                                   AND a.vec_id < b.vec_id)
    SELECT {split('a_id')} AS split_a, {split('b_id')} AS split_b,
           CAST(count(*) AS BIGINT) AS n_pairs
    FROM prs WHERE cs >= {tau!r} GROUP BY 1, 2
    """


@query("x166_semantic_split_leakage", oracle=_build_index_leakage_oracle(0.35))
def x166_semantic_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic eval-split leakage: x150 counts near-dup pairs that
    straddle the train/val/test cut using LEXICAL (MinHash) pairs —
    paraphrases sharing no shingles sail through that audit.  This is
    the same matrix over SemDeDup's cluster-scoped cosine pairs,
    catching embedding-level leakage; every off-diagonal cell
    overestimates held-out performance.  Remedy unchanged:
    cluster-aware splitting (x151) keyed on the SEMANTIC component
    instead (operators/similarity.py:semantic_pairs).

    SERVED FORM (round 8, per the r7 verdict): the candidate pairs
    ride the PERSISTED x21/x168 IVF assignment (``semantic_pairs``
    with ``assigned=`` — pairs-only, no in-query k-means; the measured
    remedy, BENCH_NOTES x168: 43.8 → 21.8 s at ×100), so the audit
    shares one coarse quantization with ANN serving and SemDeDup.  The
    oracle is the flat first-16-by-id assignment the index persists;
    the k-means lifecycle stays covered by x157."""
    from ...operators.sampling import train_val_test_split
    from ...operators.similarity import semantic_pairs

    emb = load_table(spark, sf_dir, "embeddings")
    path = _ensure_ivf_index(spark, sf_dir)
    assigned = spark.read.parquet(path)
    pairs = semantic_pairs(emb, None, tau=0.35, assigned=assigned)
    # the split side's id universe comes off the index too (it persists
    # every vector), so the whole query reads ONLY index files —
    # plan-pinned: zero embeddings/documents scans
    sp = train_val_test_split(assigned.select("vec_id"), "vec_id").select(
        "vec_id", "split"
    )
    a = sp.select(F.col("vec_id").alias("a_id"), F.col("split").alias("split_a"))
    b = sp.select(F.col("vec_id").alias("b_id"), F.col("split").alias("split_b"))
    return (
        pairs.join(a, "a_id")
        .join(b, "b_id")
        .groupBy("split_a", "split_b")
        .agg(F.count("*").cast("long").alias("n_pairs"))
    )


def _build_hier_semdedup_oracle(tau: float, n_c: int = 16, s: int = 4) -> str:
    """x157's flags over the TWO-LEVEL deterministic assignment: first
    ``n_c``-by-id centroids, first ``s`` of those as supers, every
    argmax tied to the lowest id — no Lloyd chain needed, so the whole
    lifecycle is four window CTEs plus the x157 pair/flag tail."""
    return f"""
    WITH e AS MATERIALIZED (SELECT vec_id, {_VEC} AS v FROM embeddings),
    cents AS MATERIALIZED (SELECT vec_id AS centroid_id, v AS cvec FROM e
                           ORDER BY vec_id LIMIT {n_c}),
    sups AS MATERIALIZED (SELECT centroid_id AS super_id, cvec AS svec FROM cents
                          ORDER BY centroid_id LIMIT {s}),
    c2sA AS (SELECT c.centroid_id, c.cvec, s.super_id,
                    row_number() OVER (PARTITION BY c.centroid_id
                      ORDER BY {_cos_sql('c.cvec', 's.svec')} DESC, s.super_id) AS rn
             FROM cents c CROSS JOIN sups s),
    c2s AS (SELECT centroid_id, cvec, super_id FROM c2sA WHERE rn = 1),
    v2sA AS (SELECT e.vec_id, e.v, s.super_id,
                    row_number() OVER (PARTITION BY e.vec_id
                      ORDER BY {_cos_sql('e.v', 's.svec')} DESC, s.super_id) AS rn
             FROM e CROSS JOIN sups s),
    v2s AS (SELECT vec_id, v, super_id FROM v2sA WHERE rn = 1),
    v2cA AS (SELECT v2s.vec_id, v2s.v, c.centroid_id,
                    row_number() OVER (PARTITION BY v2s.vec_id
                      ORDER BY {_cos_sql('v2s.v', 'c.cvec')} DESC, c.centroid_id) AS rn
             FROM v2s JOIN c2s c ON c.super_id = v2s.super_id),
    fasg AS (SELECT vec_id, v, centroid_id FROM v2cA WHERE rn = 1),
    prs AS (SELECT b.vec_id AS vec_id, {_cos_sql('a.v', 'b.v')} AS cs
            FROM fasg a JOIN fasg b ON a.centroid_id = b.centroid_id
                                   AND a.vec_id < b.vec_id),
    dups AS (SELECT vec_id, max(cs) AS max_prior_sim FROM prs
             WHERE cs >= {tau!r} GROUP BY 1)
    SELECT f.vec_id, f.centroid_id,
           CAST(CASE WHEN d.vec_id IS NULL THEN 0 ELSE 1 END AS INT) AS is_dup,
           COALESCE(d.max_prior_sim, 0.0) AS max_prior_sim
    FROM fasg f LEFT JOIN dups d ON d.vec_id = f.vec_id
    """


@query("x167_semdedup_hier", oracle=_build_hier_semdedup_oracle(0.35))
def x167_semdedup_hier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over the TWO-LEVEL coarse assignment — the measured
    remedy for x157's n^1.5 fold bill (BENCH_NOTES: 40.9× at ×100):
    vectors pick a super first (√c candidates), then argmax only over
    that super's children, ~2n√c total folds vs n·c.  Boundary misses
    are the accepted approximation (IVF's own coarse level makes the
    same one), and the procedure stays deterministic, so the ENTIRE
    lifecycle — both quantizer levels, both assignment hops, pairs,
    flags — oracles exactly.  Deterministic first-16 centroids here
    (the trained-quantizer variant composes via kmeans_centroids
    unchanged) (operators/ann_index.py:assign_to_centroids_hier)."""
    from ...operators.ann_index import assign_to_centroids_hier
    from ...operators.similarity import as_double_vec, semantic_dedup

    emb = load_table(spark, sf_dir, "embeddings")
    cents = (
        emb.orderBy("vec_id")
        .limit(16)
        .select(
            F.col("vec_id").alias("centroid_id"),
            as_double_vec("embedding").alias("cvec"),
        )
    )
    assigned = assign_to_centroids_hier(emb, cents, "embedding", fanout=4)
    return semantic_dedup(emb, None, tau=0.35, assigned=assigned)


def _build_index_semdedup_oracle(tau: float, n_c: int = 16) -> str:
    """x157's pair/flag tail over the FLAT deterministic
    first-``n_c``-by-id assignment — exactly what the x21 IVF index
    persists, so this oracle doubles as the spec of the
    index-assignment-reuse path."""
    return f"""
    WITH e AS MATERIALIZED (SELECT vec_id, {_VEC} AS v FROM embeddings),
    cents AS MATERIALIZED (SELECT vec_id AS centroid_id, v AS cvec FROM e
                           ORDER BY vec_id LIMIT {n_c}),
    asgA AS (SELECT e.vec_id, e.v, c.centroid_id,
                    row_number() OVER (PARTITION BY e.vec_id
                      ORDER BY {_cos_sql('e.v', 'c.cvec')} DESC, c.centroid_id) AS rn
             FROM e CROSS JOIN cents c),
    fasg AS (SELECT vec_id, v, centroid_id FROM asgA WHERE rn = 1),
    prs AS (SELECT b.vec_id AS vec_id, {_cos_sql('a.v', 'b.v')} AS cs
            FROM fasg a JOIN fasg b ON a.centroid_id = b.centroid_id
                                   AND a.vec_id < b.vec_id),
    dups AS (SELECT vec_id, max(cs) AS max_prior_sim FROM prs
             WHERE cs >= {tau!r} GROUP BY 1)
    SELECT f.vec_id, f.centroid_id,
           CAST(CASE WHEN d.vec_id IS NULL THEN 0 ELSE 1 END AS INT) AS is_dup,
           COALESCE(d.max_prior_sim, 0.0) AS max_prior_sim
    FROM fasg f LEFT JOIN dups d ON d.vec_id = f.vec_id
    """


@query("x168_semdedup_from_index", oracle=_build_index_semdedup_oracle(0.35))
def x168_semdedup_from_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MEASURED best remedy for SemDeDup's assignment bill
    (BENCH_NOTES x157/x167): consume the assignment the standing x21
    IVF index ALREADY persists — ``write_ivf_index`` stores (vec_id,
    embedding, norm, centroid_id) partitioned by list, which is
    byte-for-byte the ``assigned=`` contract — so the dedup pass is
    PAIRS-ONLY and the n·c assignment folds are paid once by the index
    build the ANN serving tier needs anyway.  One artifact, two
    consumers: kNN serving and dedup (the forward-index/PRF sharing
    argument applied to the vector tier)
    (operators/similarity.py:semantic_dedup(assigned=...)).  Index
    build content-fingerprinted via ``_ensure_ivf_index``."""
    from ...operators.similarity import semantic_dedup

    emb = load_table(spark, sf_dir, "embeddings")
    path = _ensure_ivf_index(spark, sf_dir)
    assigned = spark.read.parquet(path)
    return semantic_dedup(emb, None, tau=0.35, assigned=assigned)


@query("x169_perceptron_heldout_eval", oracle=_build_perceptron_eval_oracle())
def x169_perceptron_heldout_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The train→evaluate loop closed: the batch perceptron trains on
    the deterministic hash split's TRAIN docs only (x22's thresholds),
    the converged weights score the held-out TEST split, and the
    output is the one-row confusion matrix + fixed-point accuracy —
    the classifier-quality gate a selection pipeline checks before
    trusting x158's weights on a crawl.  pred = margin > 0 (zero
    margins count negative — the documented tie rule); every quantity
    integer, the oracle unrolls training AND scoring in one statement
    (operators/classifier.py:perceptron_train/perceptron_margins)."""
    from ...operators.classifier import perceptron_margins, perceptron_train
    from ...operators.sampling import train_val_test_split

    docs = load_table(spark, sf_dir, "documents")
    sp = train_val_test_split(docs, "doc_id")
    pos = F.col("lang") == "en"
    w = perceptron_train(sp.filter(F.col("split") == "train"), pos)
    final = w.select("b", F.col("w3").alias("w"))
    m = perceptron_margins(sp.filter(F.col("split") == "test"), final, pos)
    pred_pos = F.col("margin") > 0
    is_pos = F.col("y") == 1
    return m.agg(
        F.sum(F.when(is_pos & pred_pos, 1).otherwise(0)).cast("long").alias("tp"),
        F.sum(F.when(~is_pos & pred_pos, 1).otherwise(0)).cast("long").alias("fp"),
        F.sum(F.when(is_pos & ~pred_pos, 1).otherwise(0)).cast("long").alias("fn"),
        F.sum(F.when(~is_pos & ~pred_pos, 1).otherwise(0)).cast("long").alias("tn"),
        F.count("*").cast("long").alias("n_scored"),
        F.expr(
            "CAST(sum(CASE WHEN (y = 1) = (margin > 0) THEN 1 ELSE 0 END) * 1000000"
            " DIV count(*) AS BIGINT)"
        ).alias("acc_fp"),
    )


