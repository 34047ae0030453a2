"""Context-window chunking + LM-score data selection: n-gram LM surprisal
families, span dedup, KNN serves.

Split from ``plans/extensions.py`` at the round-14 close (r13 verdict
item 8) — code moved VERBATIM; the aggregator re-exports every name, so
``plans.extensions.<name>`` remains the stable public path."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window, functions as F
from ..registry import query
from ..tables import epoch_us, load_table
from ...operators.dedup import minhash_candidates, shingles
from ...operators.similarity import hyperplanes
from ...operators.textstats import token_count_col
from .fragments import _CAND_CTES, _TOKS, _VEC, _cos_sql, _shingles_sql
from .scratch import _SCRATCH, _fp_cached, _index_dir, _tagged_dir
from .ann import _QUANT, _dot_sql, _qcos_sql
from .mixing import _BUCKET

# ---------------------------------------------------------------------------
# Context-window chunking + LM-score data selection
# ---------------------------------------------------------------------------


@query(
    "x50_doc_chunking",
    oracle="""
    WITH offs AS (SELECT doc_id, text,
                         unnest(range(0, length(text), 150)) AS off
                  FROM documents)
    SELECT doc_id,
           CAST(off // 150 AS BIGINT) AS chunk_idx,
           CAST(off AS BIGINT) AS chunk_start,
           substr(text, CAST(off AS INT) + 1, 200) AS chunk_text,
           CAST(length(substr(text, CAST(off AS INT) + 1, 200)) AS BIGINT) AS chunk_len
    FROM offs
    """,
)
def x50_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping context-window chunking (200-char windows, 150-char
    stride → 50 chars of overlap): the stage in front of embedding /
    retrieval indexing for long documents.  One sequence+posexplode in
    the scan's codegen — no shuffle, no Python; rows stream out at
    ~corpus_chars/stride."""
    from ...operators.textstats import chunk_documents

    docs = load_table(spark, sf_dir, "documents")
    return chunk_documents(docs, size=200, stride=150)


@query(
    "x51_unigram_surprisal",
    oracle="""
    WITH toks AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term
                  FROM documents),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
    c AS (SELECT term, CAST(sum(tf) AS BIGINT) AS c FROM tf GROUP BY 1),
    n AS (SELECT CAST(sum(tf) AS BIGINT) AS n_total FROM tf)
    SELECT doc_id,
           CAST(sum(tf) AS BIGINT) AS n_tokens,
           CAST(sum(tf * (n_total // c)) AS BIGINT) AS surprisal_sum,
           CAST(CAST(sum(tf * (n_total // c)) AS BIGINT) AS DOUBLE)
             / CAST(CAST(sum(tf) AS BIGINT) AS DOUBLE) AS avg_surprisal
    FROM tf JOIN c USING (term) CROSS JOIN n
    GROUP BY doc_id
    """,
)
def x51_unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-self unigram surprisal per document — the LM-perplexity
    proxy for data selection, in exact integer arithmetic (``n_total
    div c`` per token instance; int64 sums; one IEEE division for the
    mean) so Spark and DuckDB agree bit-for-bit where an ``ln`` form
    would race libm implementations."""
    from ...operators.textstats import unigram_surprisal

    docs = load_table(spark, sf_dir, "documents")
    return unigram_surprisal(docs)


@query(
    "x80_bigram_surprisal",
    oracle="""
    WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS toks
               FROM documents),
    bg AS (SELECT doc_id,
                  unnest(list_transform(range(len(toks) - 1),
                         i -> toks[i + 1] || ' ' || toks[i + 2])) AS bg
           FROM t WHERE len(toks) >= 2),
    tf AS (SELECT doc_id, bg, count(*) AS tf FROM bg GROUP BY 1, 2),
    cb AS (SELECT bg, CAST(sum(tf) AS BIGINT) AS cb FROM tf GROUP BY 1),
    cp AS (SELECT split_part(bg, ' ', 1) AS w1, CAST(sum(tf) AS BIGINT) AS cp
           FROM tf GROUP BY 1)
    SELECT tf.doc_id,
           CAST(sum(tf) AS BIGINT) AS n_bigrams,
           CAST(sum(tf * (cp // cb)) AS BIGINT) AS surprisal_sum,
           CAST(CAST(sum(tf * (cp // cb)) AS BIGINT) AS DOUBLE)
             / CAST(CAST(sum(tf) AS BIGINT) AS DOUBLE) AS avg_surprisal
    FROM tf JOIN cb USING (bg)
            JOIN cp ON cp.w1 = split_part(tf.bg, ' ', 1)
    GROUP BY tf.doc_id
    """,
)
def x80_bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-self BIGRAM surprisal per document — x51's next step
    toward the KenLM-style n-gram perplexity filter CCNet uses: a doc
    of individually-common words in improbable ORDER (shuffled text,
    keyword stuffing, OCR soup) now scores high where the unigram
    proxy cannot see anything wrong.  Conditional surprisal is the
    integer ratio C(w1·) div C(w1 w2) (bigram-prefix count over exact-
    bigram count — reciprocal ML conditional), int64 sums, one IEEE
    division; bigrams are built array-side (zip of the token array
    with its own tail — no lag-window shuffle)."""
    from ...operators.textstats import bigram_surprisal

    docs = load_table(spark, sf_dir, "documents")
    return bigram_surprisal(docs)


def _build_pps_oracle(k: int = 64) -> str:
    """DuckDB twin of the systematic PPS draw: global cumulative weight
    line in doc_id order (plain window here; the engine builds the same
    prefix two-level for scale), stride = total div k, md5-derived
    offset — identical integer arithmetic end to end."""
    hex8 = " + ".join(
        f"(strpos('0123456789abcdef', substr(h, {i + 1}, 1)) - 1) * {16 ** (7 - i)}"
        for i in range(8)
    )
    return f"""
    WITH t AS (SELECT doc_id,
                      CAST(len(regexp_extract_all(lower(text), '[a-z]+')) AS BIGINT) AS w
               FROM documents),
    p AS (SELECT doc_id, w FROM t WHERE w > 0),
    c AS (SELECT doc_id, w,
                 CAST(SUM(w) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
          FROM p),
    tot AS (SELECT CAST(SUM(w) AS BIGINT) AS total FROM p),
    par AS (SELECT total, total // {k} AS stride,
                   ({hex8}) % (total // {k}) AS off
            FROM (SELECT total, md5('pps:{k}:' || CAST(total AS VARCHAR)) AS h FROM tot))
    SELECT doc_id, w AS n_tokens,
           CAST((cum + stride - 1 - off) // stride AS BIGINT) AS pick
    FROM c, par
    WHERE (cum + stride - 1 - off) // stride
        > (cum - w + stride - 1 - off) // stride
    """


@query("x81_weighted_sample", oracle=_build_pps_oracle())
def x81_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic token-weighted document draw (~64 docs, inclusion
    probability ∝ token count) by systematic PPS sampling
    (``sampling.systematic_pps_sample``) — the doc-level draw for
    assembling mixture subsets where big documents should be
    proportionally likelier, WITHOUT rand() (md5-derived offset) and
    WITHOUT pow/ln (an Efraimidis–Spirakis exponential key would race
    libm across engines; the systematic design is pure int64).  The
    global cumulative-weight line is built as a two-level prefix
    (per-chunk totals → tiny prefix window → broadcast back) so no
    single task ever sees the whole corpus."""
    from ...operators.sampling import systematic_pps_sample
    from ...operators.textstats import WORD_PATTERN

    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        F.size(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit(WORD_PATTERN), F.lit(0))
        )
        .cast("long")
        .alias("n_tokens"),
    )
    return systematic_pps_sample(d, "n_tokens", "doc_id", 64)


_TRI = "toks[i + 1] || ' ' || toks[i + 2] || ' ' || toks[i + 3]"
_BI = "toks[i + 1] || ' ' || toks[i + 2]"


@query(
    "x82_trigram_backoff_surprisal",
    oracle=f"""
    WITH bt AS (SELECT regexp_extract_all(lower(text), '[a-z]+') AS toks
                FROM documents WHERE doc_id < 250),
    qt AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS toks
           FROM documents WHERE doc_id >= 250),
    t3 AS (SELECT g, CAST(count(*) AS BIGINT) AS c3
           FROM (SELECT unnest(list_transform(range(len(toks) - 2), i -> {_TRI})) AS g
                 FROM bt WHERE len(toks) >= 3) GROUP BY 1),
    c3p AS (SELECT split_part(g, ' ', 1) || ' ' || split_part(g, ' ', 2) AS p2,
                   CAST(sum(c3) AS BIGINT) AS c3p FROM t3 GROUP BY 1),
    t2 AS (SELECT b23, CAST(count(*) AS BIGINT) AS c2
           FROM (SELECT unnest(list_transform(range(len(toks) - 1), i -> {_BI})) AS b23
                 FROM bt WHERE len(toks) >= 2) GROUP BY 1),
    c2p AS (SELECT split_part(b23, ' ', 1) AS w2, CAST(sum(c2) AS BIGINT) AS c2p
            FROM t2 GROUP BY 1),
    t1 AS (SELECT w3, CAST(count(*) AS BIGINT) AS c1
           FROM (SELECT unnest(toks) AS w3 FROM bt) GROUP BY 1),
    n AS (SELECT CAST(sum(c1) AS BIGINT) AS n_total FROM t1),
    tf AS (SELECT doc_id, g, count(*) AS tf
           FROM (SELECT doc_id,
                        unnest(list_transform(range(len(toks) - 2), i -> {_TRI})) AS g
                 FROM qt WHERE len(toks) >= 3) GROUP BY 1, 2),
    k AS (SELECT doc_id, tf, g,
                 split_part(g, ' ', 1) || ' ' || split_part(g, ' ', 2) AS p2,
                 split_part(g, ' ', 2) || ' ' || split_part(g, ' ', 3) AS b23,
                 split_part(g, ' ', 2) AS w2, split_part(g, ' ', 3) AS w3
          FROM tf),
    s AS (SELECT k.doc_id, k.tf,
                 CASE WHEN c3 IS NOT NULL THEN c3p // c3
                      WHEN c2 IS NOT NULL THEN 4 * (c2p // c2)
                      WHEN c1 IS NOT NULL THEN 16 * (n_total // c1)
                      ELSE 16 * (n_total + 1) END AS inst
          FROM k LEFT JOIN t3 USING (g) LEFT JOIN c3p USING (p2)
                 LEFT JOIN t2 USING (b23) LEFT JOIN c2p USING (w2)
                 LEFT JOIN t1 USING (w3) CROSS JOIN n)
    SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_trigrams,
           CAST(sum(tf * inst) AS BIGINT) AS surprisal_sum,
           CAST(CAST(sum(tf * inst) AS BIGINT) AS DOUBLE)
             / CAST(CAST(sum(tf) AS BIGINT) AS DOUBLE) AS avg_surprisal
    FROM s GROUP BY 1
    """,
)
def x82_trigram_backoff_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top of the n-gram ladder (x51 unigram → x80 bigram → this): the
    new batch (doc_id ≥ 250) scored against the standing corpus's
    (doc_id < 250) TRIGRAM model with STUPID BACKOFF — unseen trigram
    → trailing bigram → last unigram → OOV ceiling, each level paying
    an integer ×4 penalty (α=0.4's reciprocal rounded up, so backoff
    stays exact int64 and is strictly worse than a direct hit).  The
    integer-exact stand-in for CCNet's KenLM perplexity filter; backoff
    genuinely fires at sf0.01 (the batch holds trigrams the base never
    saw).  Batch side of every shuffle is O(batch); the four base
    count tables are the persisted nightly n-gram snapshot at scale."""
    from ...operators.textstats import trigram_backoff_surprisal

    docs = load_table(spark, sf_dir, "documents")
    return trigram_backoff_surprisal(
        docs.filter(F.col("doc_id") >= 250), docs.filter(F.col("doc_id") < 250)
    )


_JM_S = "(8 * (n_total + 1))"


@query(
    "x84_trigram_jm_surprisal",
    oracle=f"""
    WITH bt AS (SELECT regexp_extract_all(lower(text), '[a-z]+') AS toks
                FROM documents WHERE doc_id < 250),
    qt AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS toks
           FROM documents WHERE doc_id >= 250),
    t3 AS (SELECT g, CAST(count(*) AS BIGINT) AS c3
           FROM (SELECT unnest(list_transform(range(len(toks) - 2), i -> {_TRI})) AS g
                 FROM bt WHERE len(toks) >= 3) GROUP BY 1),
    c3p AS (SELECT split_part(g, ' ', 1) || ' ' || split_part(g, ' ', 2) AS p2,
                   CAST(sum(c3) AS BIGINT) AS c3p FROM t3 GROUP BY 1),
    t2 AS (SELECT b23, CAST(count(*) AS BIGINT) AS c2
           FROM (SELECT unnest(list_transform(range(len(toks) - 1), i -> {_BI})) AS b23
                 FROM bt WHERE len(toks) >= 2) GROUP BY 1),
    c2p AS (SELECT split_part(b23, ' ', 1) AS w2, CAST(sum(c2) AS BIGINT) AS c2p
            FROM t2 GROUP BY 1),
    t1 AS (SELECT w3, CAST(count(*) AS BIGINT) AS c1
           FROM (SELECT unnest(toks) AS w3 FROM bt) GROUP BY 1),
    n AS (SELECT CAST(sum(c1) AS BIGINT) AS n_total FROM t1),
    tf AS (SELECT doc_id, g, count(*) AS tf
           FROM (SELECT doc_id,
                        unnest(list_transform(range(len(toks) - 2), i -> {_TRI})) AS g
                 FROM qt WHERE len(toks) >= 3) GROUP BY 1, 2),
    k AS (SELECT doc_id, tf, g,
                 split_part(g, ' ', 1) || ' ' || split_part(g, ' ', 2) AS p2,
                 split_part(g, ' ', 2) || ' ' || split_part(g, ' ', 3) AS b23,
                 split_part(g, ' ', 2) AS w2, split_part(g, ' ', 3) AS w3
          FROM tf),
    s AS (SELECT k.doc_id, k.tf,
                 {_JM_S} // (
                   CASE WHEN c3 IS NOT NULL
                        THEN (c3 * {_JM_S}) // (2 * c3p) ELSE 0 END
                 + CASE WHEN c2 IS NOT NULL
                        THEN (c2 * {_JM_S}) // (4 * c2p) ELSE 0 END
                 + CASE WHEN c1 IS NOT NULL
                        THEN (c1 * {_JM_S}) // (8 * n_total) ELSE 0 END
                 + 1) AS inst
          FROM k LEFT JOIN t3 USING (g) LEFT JOIN c3p USING (p2)
                 LEFT JOIN t2 USING (b23) LEFT JOIN c2p USING (w2)
                 LEFT JOIN t1 USING (w3) CROSS JOIN n)
    SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_trigrams,
           CAST(sum(tf * inst) AS BIGINT) AS surprisal_sum,
           CAST(CAST(sum(tf * inst) AS BIGINT) AS DOUBLE)
             / CAST(CAST(sum(tf) AS BIGINT) AS DOUBLE) AS avg_surprisal
    FROM s GROUP BY 1
    """,
)
def x84_trigram_jm_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jelinek-Mercer INTERPOLATED trigram surprisal — x82's CCNet-
    grade upgrade: every n-gram order contributes (λ = 1/2, 1/4, 1/8,
    1/8 as exact rationals) instead of falling through to the first
    level with a count, so a seen trigram with a common trailing
    bigram outranks one whose bigram is rare.  Fixed-point integer
    arithmetic with data-adaptive scale S = 8·(N+1) — the λ0 uniform
    floor is exactly 1, so p_fp ≥ 1 with no guard and full-OOV scores
    the S ceiling; no libm, no float sums, bit-identical across
    engines (``textstats.trigram_jm_surprisal``).  Same four base
    count tables (the persisted nightly n-gram snapshot) and the same
    O(batch) shuffle contract as x82."""
    from ...operators.textstats import trigram_jm_surprisal

    docs = load_table(spark, sf_dir, "documents")
    return trigram_jm_surprisal(
        docs.filter(F.col("doc_id") >= 250), docs.filter(F.col("doc_id") < 250)
    )


_QUAD = "toks[i + 1] || ' ' || toks[i + 2] || ' ' || toks[i + 3] || ' ' || toks[i + 4]"
_JM4_S = "(16 * (n_total + 1))"


@query(
    "x94_fourgram_jm_surprisal",
    oracle=f"""
    WITH bt AS (SELECT regexp_extract_all(lower(text), '[a-z]+') AS toks
                FROM documents WHERE doc_id < 250),
    qt AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS toks
           FROM documents WHERE doc_id >= 250),
    t4 AS (SELECT g, CAST(count(*) AS BIGINT) AS c4
           FROM (SELECT unnest(list_transform(range(len(toks) - 3), i -> {_QUAD})) AS g
                 FROM bt WHERE len(toks) >= 4) GROUP BY 1),
    c4p AS (SELECT split_part(g, ' ', 1) || ' ' || split_part(g, ' ', 2)
                     || ' ' || split_part(g, ' ', 3) AS p3,
                   CAST(sum(c4) AS BIGINT) AS c4p FROM t4 GROUP BY 1),
    t3 AS (SELECT b234, CAST(count(*) AS BIGINT) AS c3
           FROM (SELECT unnest(list_transform(range(len(toks) - 2), i -> {_TRI})) AS b234
                 FROM bt WHERE len(toks) >= 3) GROUP BY 1),
    c3p AS (SELECT split_part(b234, ' ', 1) || ' ' || split_part(b234, ' ', 2) AS p23,
                   CAST(sum(c3) AS BIGINT) AS c3p FROM t3 GROUP BY 1),
    t2 AS (SELECT b34, CAST(count(*) AS BIGINT) AS c2
           FROM (SELECT unnest(list_transform(range(len(toks) - 1), i -> {_BI})) AS b34
                 FROM bt WHERE len(toks) >= 2) GROUP BY 1),
    c2p AS (SELECT split_part(b34, ' ', 1) AS w3, CAST(sum(c2) AS BIGINT) AS c2p
            FROM t2 GROUP BY 1),
    t1 AS (SELECT w4, CAST(count(*) AS BIGINT) AS c1
           FROM (SELECT unnest(toks) AS w4 FROM bt) GROUP BY 1),
    n AS (SELECT CAST(sum(c1) AS BIGINT) AS n_total FROM t1),
    tf AS (SELECT doc_id, g, count(*) AS tf
           FROM (SELECT doc_id,
                        unnest(list_transform(range(len(toks) - 3), i -> {_QUAD})) AS g
                 FROM qt WHERE len(toks) >= 4) GROUP BY 1, 2),
    k AS (SELECT doc_id, tf, g,
                 split_part(g, ' ', 1) || ' ' || split_part(g, ' ', 2)
                   || ' ' || split_part(g, ' ', 3) AS p3,
                 split_part(g, ' ', 2) || ' ' || split_part(g, ' ', 3)
                   || ' ' || split_part(g, ' ', 4) AS b234,
                 split_part(g, ' ', 2) || ' ' || split_part(g, ' ', 3) AS p23,
                 split_part(g, ' ', 3) || ' ' || split_part(g, ' ', 4) AS b34,
                 split_part(g, ' ', 3) AS w3, split_part(g, ' ', 4) AS w4
          FROM tf),
    s AS (SELECT k.doc_id, k.tf,
                 {_JM4_S} // (
                   CASE WHEN c4 IS NOT NULL
                        THEN (c4 * {_JM4_S}) // (2 * c4p) ELSE 0 END
                 + CASE WHEN c3 IS NOT NULL
                        THEN (c3 * {_JM4_S}) // (4 * c3p) ELSE 0 END
                 + CASE WHEN c2 IS NOT NULL
                        THEN (c2 * {_JM4_S}) // (8 * c2p) ELSE 0 END
                 + CASE WHEN c1 IS NOT NULL
                        THEN (c1 * {_JM4_S}) // (16 * n_total) ELSE 0 END
                 + 1) AS inst
          FROM k LEFT JOIN t4 USING (g) LEFT JOIN c4p USING (p3)
                 LEFT JOIN t3 USING (b234) LEFT JOIN c3p USING (p23)
                 LEFT JOIN t2 USING (b34) LEFT JOIN c2p USING (w3)
                 LEFT JOIN t1 USING (w4) CROSS JOIN n)
    SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_fourgrams,
           CAST(sum(tf * inst) AS BIGINT) AS surprisal_sum,
           CAST(CAST(sum(tf * inst) AS BIGINT) AS DOUBLE)
             / CAST(CAST(sum(tf) AS BIGINT) AS DOUBLE) AS avg_surprisal
    FROM s GROUP BY 1
    """,
)
def x94_fourgram_jm_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The n-gram ladder's 4-gram rung: the batch (doc_id ≥ 250) scored
    against the standing corpus's (doc_id < 250) FOURGRAM model with
    five-level integer-exact Jelinek-Mercer interpolation (λ = 1/2,
    1/4, 1/8, 1/16, 1/16; fixed point at S = 16·(N+1) so the λ0 floor
    is exactly 1) — one rung below the KenLM 5-gram CCNet runs, built
    from six persisted base count tables, batch side of every shuffle
    O(batch) (``textstats.fourgram_jm_surprisal``; hand-built corpus
    pins all five interpolation levels, hypothesis property recomputes
    the whole cascade in Python)."""
    from ...operators.textstats import fourgram_jm_surprisal

    docs = load_table(spark, sf_dir, "documents")
    return fourgram_jm_surprisal(
        docs.filter(F.col("doc_id") >= 250), docs.filter(F.col("doc_id") < 250)
    )


@query(
    "x52_bloom_decontamination",
    oracle=f"""
    WITH bg AS (SELECT unnest({_shingles_sql(5)}) AS g FROM documents WHERE doc_id < 20),
         bh AS (SELECT DISTINCT md5(g) AS h FROM bg),
         cg AS (SELECT doc_id, unnest({_shingles_sql(5)}) AS g FROM documents WHERE doc_id >= 20),
         ch AS (SELECT doc_id, md5(g) AS h FROM cg)
    SELECT DISTINCT doc_id FROM ch JOIN bh USING (h)
    """,
)
def x52_bloom_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x31's decontamination with a Bloom prefilter — the shape for a
    benchmark union too large to broadcast as a join table: corpus
    n-gram hashes probe a broadcast int64-bitmap literal (pure bit
    arithmetic in the scan's codegen, ~10 bits/element instead of a
    32-hex-char join row), and only survivors reach the exact confirm
    join.  No false negatives by construction, so the result — and the
    oracle — is exactly x31's."""
    from ...operators.dedup import bloom_decontaminate

    docs = load_table(spark, sf_dir, "documents")
    return bloom_decontaminate(
        docs.filter(F.col("doc_id") >= 20), docs.filter(F.col("doc_id") < 20), n=5
    )


def _build_rp_oracle(out_dim: int = 8, dim: int = 64) -> str:
    # exponent-notation literals (1.23e-01) parse as DOUBLE in DuckDB;
    # bare decimal literals parse as DECIMAL and get rounded to 17
    # decimal digits BEFORE any cast — last-ulp divergence from Spark's
    # exact binary literals.  (x11's oracle tolerates the DECIMAL path
    # because it only uses dot-product SIGNS; here the projected values
    # themselves are hash-compared.)
    planes = hyperplanes(out_dim, dim, seed="rp")
    lits = [f"[{', '.join(f'{x:.17e}' for x in p)}]" for p in planes]
    dots = ", ".join(_dot_sql("v", lit) for lit in lits)
    return f"""
    WITH e AS (SELECT vec_id, {_VEC} AS v FROM embeddings)
    SELECT vec_id,
           unnest(range({out_dim})) AS dim_idx,
           unnest([{dots}]) AS value
    FROM e
    """


@query("x53_random_projection", oracle=_build_rp_oracle())
def x53_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JL-style 64→8 dimensionality reduction onto deterministic md5
    hyperplane directions — the embedding-compression pass in front of
    clustering / coarse ANN.  Pure per-row codegen projection (no
    shuffle, no Python); each component a sequential-fold dot product,
    bit-identical to DuckDB's list_reduce."""
    from ...operators.similarity import random_projection

    emb = load_table(spark, sf_dir, "embeddings")
    return random_projection(emb, dim=64, out_dim=8)


@query(
    "x54_pretraining_pipeline",
    oracle=f"""
    WITH sc AS (SELECT doc_id, CAST(len({_TOKS}) AS INT) AS n_tokens,
                       regexp_extract_all(lower(text), '[a-z]+') AS ltoks
                FROM documents),
    s AS (SELECT doc_id, n_tokens,
                 CASE WHEN len(ltoks) > 0
                      THEN CAST(CAST(list_sum(list_transform(ltoks,
                               t -> ({_BUCKET} * 2654435761) % 4096 - 2048)) AS BIGINT)
                               AS DOUBLE)
                           / CAST(len(ltoks) * 2048 AS DOUBLE)
                      ELSE 0.0 END AS score
          FROM sc),
    corpus AS (SELECT * FROM s WHERE doc_id >= 20 AND score > 0.0),
    bg AS (SELECT unnest({_shingles_sql(5)}) AS g FROM documents WHERE doc_id < 20),
    bh AS (SELECT DISTINCT md5(g) AS h FROM bg),
    cg AS (SELECT doc_id, unnest({_shingles_sql(5)}) AS g FROM documents
           WHERE doc_id >= 20),
    flagged AS (SELECT DISTINCT doc_id
                FROM (SELECT doc_id, md5(g) AS h FROM cg) ch JOIN bh USING (h)),
    clean AS (SELECT * FROM corpus
              WHERE doc_id NOT IN (SELECT doc_id FROM flagged)),
    r AS (SELECT doc_id, n_tokens, score,
                 CAST(sum(n_tokens) OVER (ORDER BY score DESC, doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                   AS cum_tokens
          FROM clean)
    SELECT doc_id, n_tokens, score, cum_tokens FROM r WHERE cum_tokens <= 5000
    """,
)
def x54_pretraining_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end data-selection pipeline as ONE declarative plan —
    the composition a real pretraining run executes nightly:

    1. model-based quality gate (x47's hashed linear scorer, codegen
       projection, keep score > 0);
    2. benchmark decontamination (x31's broadcast n-gram screen against
       the doc_id < 20 eval stand-in, broadcast anti-join);
    3. greedy token-budget selection (x44's two-phase decomposition —
       best score first until 5,000 whitespace tokens).

    Because every stage is declarative, Catalyst fuses the scorer and
    the broadcast screens into the scan on BOTH of the selection
    algorithm's corpus passes (its agg pass and its join-back pass —
    the same two passes standalone x44 makes), every join broadcasts
    (plan-pinned: no SortMergeJoin anywhere), and the only corpus
    shuffles are the selection's score-key exchanges.  An orchestrated
    three-script pipeline would materialize two corpus-sized
    intermediates between the stages instead."""
    from ...operators.dedup import decontaminate
    from ...operators.sampling import select_token_budget
    from ...operators.textstats import hashed_linear_score

    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        "text",
        token_count_col(F.col("text")).alias("n_tokens"),
        hashed_linear_score(F.col("text")).alias("score"),
    )
    corpus = scored.filter((F.col("doc_id") >= 20) & (F.col("score") > 0.0))
    bench = docs.filter(F.col("doc_id") < 20)
    flagged = decontaminate(corpus, bench, n=5)
    clean = corpus.join(F.broadcast(flagged), "doc_id", "left_anti").select(
        "doc_id", "n_tokens", "score"
    )
    return select_token_budget(clean, "score", "doc_id", "n_tokens", 5000).select(
        "doc_id", "n_tokens", "score", "cum_tokens"
    )


@query(
    "x55_temperature_rebalance",
    oracle="""
    WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
    w AS (SELECT lang, CAST(floor(sqrt(CAST(n AS DOUBLE))) AS BIGINT) AS w FROM c),
    tw AS (SELECT CAST(sum(w) AS BIGINT) AS tw FROM w),
    t AS (SELECT lang, (300 * w) // tw AS target FROM w, tw),
    r AS (SELECT doc_id, lang,
                 row_number() OVER (PARTITION BY lang
                                    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
          FROM documents)
    SELECT r.doc_id, r.lang FROM r JOIN t USING (lang) WHERE rn <= target
    """,
)
def x55_temperature_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """α = 1/2 temperature-flattened language mixture under a 300-doc
    budget — each language's allocation ∝ isqrt(its count), selected
    deterministically in md5-of-id order.  Integer-exact throughout
    (isqrt weights, integer div split), so both engines pick the
    identical document set."""
    from ...operators.sampling import temperature_rebalance

    docs = load_table(spark, sf_dir, "documents")
    return temperature_rebalance(docs, "lang", "doc_id", 300).select("doc_id", "lang")


@query(
    "x56_novelty_score",
    oracle="""
    WITH bt AS (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term
                FROM documents WHERE doc_id < 250),
    c AS (SELECT term, CAST(count(*) AS BIGINT) AS c FROM bt GROUP BY 1),
    n AS (SELECT CAST(sum(c) AS BIGINT) AS n_total FROM c),
    qt AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term
           FROM documents WHERE doc_id >= 250),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM qt GROUP BY 1, 2)
    SELECT doc_id,
           CAST(sum(tf) AS BIGINT) AS n_tokens,
           CAST(sum(tf * (n_total // coalesce(c, 1))) AS BIGINT) AS novelty_sum,
           CAST(CAST(sum(tf * (n_total // coalesce(c, 1))) AS BIGINT) AS DOUBLE)
             / CAST(CAST(sum(tf) AS BIGINT) AS DOUBLE) AS avg_novelty
    FROM tf LEFT JOIN c USING (term) CROSS JOIN n
    GROUP BY doc_id
    """,
)
def x56_novelty_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental crawl triage: score the new batch (doc_id >= 250)
    against the standing corpus's (doc_id < 250) unigram distribution —
    unseen vocabulary scores at the OOV ceiling, boilerplate re-crawls
    score low.  Exact integer arithmetic end-to-end; the batch side of
    every shuffle is O(batch)."""
    from ...operators.textstats import novelty_score

    docs = load_table(spark, sf_dir, "documents")
    return novelty_score(
        docs.filter(F.col("doc_id") >= 250), docs.filter(F.col("doc_id") < 250)
    )


@query(
    "x86_surprisal_snapshot_probe",
    oracle="""
    WITH bt AS (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term
                FROM documents WHERE doc_id < 250),
    c AS (SELECT term, CAST(count(*) AS BIGINT) AS c FROM bt GROUP BY 1),
    n AS (SELECT CAST(sum(c) AS BIGINT) AS n_total FROM c),
    qt AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term
           FROM documents WHERE doc_id >= 250),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM qt GROUP BY 1, 2)
    SELECT doc_id,
           CAST(sum(tf) AS BIGINT) AS n_tokens,
           CAST(sum(tf * (n_total // coalesce(c, 1))) AS BIGINT) AS surprisal_sum,
           CAST(CAST(sum(tf * (n_total // coalesce(c, 1))) AS BIGINT) AS DOUBLE)
             / CAST(CAST(sum(tf) AS BIGINT) AS DOUBLE) AS avg_surprisal
    FROM tf LEFT JOIN c USING (term) CROSS JOIN n
    GROUP BY doc_id
    """,
)
def x86_surprisal_snapshot_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x51's snapshot-probe form (the round-4 verdict's fix for its
    8.55× both-sides-grow scale ratio): the standing corpus's
    (term, count) unigram table (doc_id < 250) is PERSISTED once to
    parquet (``textstats.unigram_counts``, build-once scratch) and
    each batch run (doc_id ≥ 250) scores against the snapshot with the
    add-one OOV ceiling — where x56 re-aggregates the base corpus per
    run, here the distribution is READ, so a daily run costs O(batch)
    plus one snapshot scan.  Pinned equal to x51's self-scored path
    when the snapshot is built from the scored docs themselves."""
    from ...operators.ann_index import ensure_index
    from ...operators.textstats import unigram_counts, unigram_surprisal

    docs = load_table(spark, sf_dir, "documents")
    path = _tagged_dir(_SCRATCH, "unigram_snapshot", "v1-split250", sf_dir=sf_dir)
    ensure_index(
        lambda: unigram_counts(docs.filter(F.col("doc_id") < 250))
        .write.mode("overwrite")
        .parquet(path),
        path,
    )
    snap = spark.read.parquet(path)
    return unigram_surprisal(docs.filter(F.col("doc_id") >= 250), base_counts=snap)


@query(
    "x87_vocab_coverage",
    oracle="""
    WITH toks AS (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term
                  FROM documents),
    c AS (SELECT term, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY 1),
    g AS (SELECT c, CAST(count(*) AS BIGINT) AS n_terms FROM c GROUP BY 1),
    n AS (SELECT CAST(sum(c * n_terms) AS BIGINT) AS n_total FROM g),
    p AS (SELECT c, n_terms,
                 CAST(SUM(c * n_terms) OVER (ORDER BY c DESC) AS BIGINT) AS cum_mass,
                 CAST(SUM(n_terms) OVER (ORDER BY c DESC) AS BIGINT) AS cum_terms
          FROM g),
    x AS (SELECT p.*, (95 * n_total + 99) // 100 AS thr, n_total
          FROM p CROSS JOIN n
          WHERE cum_mass >= (95 * n_total + 99) // 100
          ORDER BY cum_mass LIMIT 1),
    y AS (SELECT cum_terms - n_terms AS prev_terms,
                 cum_mass - c * n_terms AS prev_mass,
                 (thr - (cum_mass - c * n_terms) + c - 1) // c AS k_extra,
                 c, n_total
          FROM x)
    SELECT CAST(prev_terms + k_extra AS BIGINT) AS vocab_size,
           CAST(prev_mass + k_extra * c AS BIGINT) AS covered_tokens,
           n_total AS total_tokens,
           CAST(prev_mass + k_extra * c AS DOUBLE) / CAST(n_total AS DOUBLE) AS coverage
    FROM y
    """,
)
def x87_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer sizing: the smallest vocabulary (terms in descending
    count order) covering ≥95% of the corpus token mass — computed
    WITHOUT a vocabulary-sized sort by prefixing over the
    DISTINCT-COUNT table only (equal-count terms are interchangeable
    for coverage, so the crossing group contributes
    ceil((thr−prev)/c) terms; x57's decomposition).  Exact integer
    threshold arithmetic, one IEEE division for the ratio
    (``textstats.vocab_coverage``)."""
    from ...operators.textstats import vocab_coverage

    docs = load_table(spark, sf_dir, "documents")
    return vocab_coverage(docs)


@query(
    "x88_containment_pairs",
    oracle=f"""
    WITH {_CAND_CTES}
    SELECT a_id, b_id, c_ab, c_ba FROM (
      SELECT c.a_id, c.b_id,
             len(list_intersect(sa.s, sb.s)) / CAST(len(sa.s) AS DOUBLE) AS c_ab,
             len(list_intersect(sa.s, sb.s)) / CAST(len(sb.s) AS DOUBLE) AS c_ba
      FROM cands c
      JOIN sh sa ON sa.doc_id = c.a_id
      JOIN sh sb ON sb.doc_id = c.b_id
    ) WHERE greatest(c_ab, c_ba) >= 0.4
    """,
)
def x88_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quote/subset detection over the LSH candidates: asymmetric
    containment |A∩B|/|A| in BOTH directions — a short document fully
    embedded in a long one has low Jaccard (the union is big) but
    containment ~1.0, the case x08's symmetric verify under-ranks.
    Pairs kept when either direction ≥ 0.4.  Same candidate chain and
    scale shape as x08 (banded equi-join, never all-pairs); the exact
    check touches only candidate pairs."""
    from ...operators.dedup import containment, minhash_candidates

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 1000)
    sh = docs.select("doc_id", shingles(F.col("text")).alias("s"))
    cands = minhash_candidates(docs).select("a_id", "b_id")
    a = sh.select(F.col("doc_id").alias("a_id"), F.col("s").alias("sa"))
    b = sh.select(F.col("doc_id").alias("b_id"), F.col("s").alias("sb"))
    return (
        cands.join(a, "a_id")
        .join(b, "b_id")
        .withColumn("c_ab", containment(F.col("sa"), F.col("sb")))
        .withColumn("c_ba", containment(F.col("sb"), F.col("sa")))
        .filter(F.greatest("c_ab", "c_ba") >= 0.4)
        .select("a_id", "b_id", "c_ab", "c_ba")
    )


@query(
    "x57_percentile_rank",
    oracle="""
    WITH n AS (SELECT count(*) AS n FROM documents)
    SELECT doc_id, n_chars,
           CAST(rank() OVER (ORDER BY n_chars DESC) AS BIGINT) AS rank,
           CASE WHEN n > 1
                THEN CAST(rank() OVER (ORDER BY n_chars DESC) - 1 AS DOUBLE)
                     / CAST(n - 1 AS DOUBLE)
                ELSE 0.0 END AS pct
    FROM documents CROSS JOIN n
    """,
)
def x57_percentile_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact global percentile rank of every document's length score,
    computed WITHOUT a global sort: per-score counts, a prefix window
    over the distinct-score table only, broadcast back — ties share the
    min rank exactly like SQL rank().  The oracle states the naive
    global-window form this decomposition replaces."""
    from ...operators.sampling import percentile_rank

    docs = load_table(spark, sf_dir, "documents")
    return percentile_rank(docs.select("doc_id", "n_chars"), "n_chars", "doc_id").select(
        "doc_id", "n_chars", "rank", "pct"
    )


def _build_knn_oracle(k: int = 3, n_planes: int = 4, dim: int = 64) -> str:
    planes = hyperplanes(n_planes, dim)
    lits = [f"[{', '.join(repr(x) for x in p)}]" for p in planes]

    def bucket(v: str) -> str:
        return " + ".join(
            f"CASE WHEN {_dot_sql(v, lits[p])} > 0 THEN {1 << p} ELSE 0 END"
            for p in range(n_planes)
        )

    return f"""
    WITH q AS (SELECT vec_id AS q_id, {_VEC} AS qv FROM embeddings
               WHERE vec_id % 10 = 0),
         c AS (SELECT vec_id AS c_id, {_VEC} AS cv FROM embeddings
               WHERE vec_id % 10 <> 0),
         qb AS (SELECT q_id, qv, {bucket('qv')} AS bucket FROM q),
         cb AS (SELECT c_id, cv, {bucket('cv')} AS bucket FROM c),
         j AS (SELECT q_id, c_id, {_cos_sql('qv', 'cv')} AS cos_sim
               FROM qb JOIN cb USING (bucket)),
         r AS (SELECT q_id, c_id, cos_sim,
                      CAST(row_number() OVER (PARTITION BY q_id
                           ORDER BY cos_sim DESC, c_id) AS BIGINT) AS rn
               FROM j)
    SELECT q_id, c_id, cos_sim, rn FROM r WHERE rn <= {k}
    """


def _build_qknn_oracle(k: int = 3, n_planes: int = 4, dim: int = 64) -> str:
    planes = hyperplanes(n_planes, dim)
    lits = [f"[{', '.join(repr(x) for x in p)}]" for p in planes]

    def bucket(v: str) -> str:
        return " + ".join(
            f"CASE WHEN {_dot_sql(v, lits[p])} > 0 THEN {1 << p} ELSE 0 END"
            for p in range(n_planes)
        )

    return f"""
    WITH q AS (SELECT vec_id AS q_id, {_VEC} AS qv FROM embeddings
               WHERE vec_id % 10 = 0),
         c AS (SELECT vec_id AS c_id, {_VEC} AS cv FROM embeddings
               WHERE vec_id % 10 <> 0),
         qb AS (SELECT q_id, {bucket('qv')} AS bucket,
                       {_QUANT.format(v='qv')} AS qq FROM q),
         cb AS (SELECT c_id, {bucket('cv')} AS bucket,
                       {_QUANT.format(v='cv')} AS cq FROM c),
         j AS (SELECT q_id, c_id, {_qcos_sql('qb.qq', 'cb.cq')} AS q_cos
               FROM qb JOIN cb USING (bucket)),
         r AS (SELECT q_id, c_id, q_cos,
                      CAST(row_number() OVER (PARTITION BY q_id
                           ORDER BY q_cos DESC, c_id) AS BIGINT) AS rn
               FROM j WHERE q_cos IS NOT NULL)
    SELECT q_id, c_id, q_cos, rn FROM r WHERE rn <= {k}
    """


@query("x91_quantized_knn_index_join", oracle=_build_qknn_oracle())
def x91_quantized_knn_index_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x89 over the COMPRESSED index: the 90% corpus persists only its
    int8 quantization (array<tinyint> + integer-sum norm — ~4× fewer
    scan bytes than the float index) bucketed by the ORIGINAL float
    signature, and the 10% batch probes it with integer-exact dot
    products (order-independent int64 sums, one IEEE division — x18's
    arithmetic at index scale).  Scores are the quantized cosine by
    contract; the float path x89 is the accuracy baseline on the same
    corpus (``ann_index.write_quantized_lsh_index`` /
    ``quantized_knn_join_index``)."""
    from ...operators.ann_index import (
        ensure_index,
        quantized_knn_join_index,
        write_quantized_lsh_index,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    path = _index_dir(sf_dir, "qlsh_c90")
    ensure_index(
        lambda: write_quantized_lsh_index(
            emb.filter(F.col("vec_id") % 10 != 0), path, dim=64
        ),
        path,
    )
    return quantized_knn_join_index(
        spark, emb.filter(F.col("vec_id") % 10 == 0), path, dim=64, k=3
    )


@query(
    "x92_quantization_recall",
    oracle=f"""
    WITH f AS (SELECT q_id, c_id FROM ({_build_knn_oracle()}) t),
         qq AS (SELECT q_id, c_id FROM ({_build_qknn_oracle()}) t)
    SELECT f.q_id,
           CAST(sum(CASE WHEN m.c_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_overlap,
           CAST(count(*) AS BIGINT) AS n_float,
           CAST(sum(CASE WHEN m.c_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(count(*) AS DOUBLE) AS recall
    FROM f LEFT JOIN qq m ON f.q_id = m.q_id AND f.c_id = m.c_id
    GROUP BY f.q_id
    """,
)
def x92_quantization_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The int8 accuracy cost MEASURED, not asserted: per query, the
    overlap between the quantized index's top-3 (x91) and the float
    index's top-3 (x89) over the same corpus, buckets, and tie order —
    recall = |quantized ∩ float| / |float|.  The audit a pipeline runs
    before switching retrieval to the compressed layout (x60's recall
    discipline applied to quantization instead of blocking).  Both
    sides are the PERSISTED indexes; the oracle recomputes both chains
    in-flight and intersects them identically."""
    from ...operators.ann_index import (
        ensure_index,
        knn_join_index,
        quantized_knn_join_index,
        write_lsh_index,
        write_quantized_lsh_index,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") % 10 != 0)
    queries = emb.filter(F.col("vec_id") % 10 == 0)
    fpath = _index_dir(sf_dir, "lsh_c90")
    qpath = _index_dir(sf_dir, "qlsh_c90")
    ensure_index(lambda: write_lsh_index(corpus, fpath, dim=64), fpath)
    ensure_index(lambda: write_quantized_lsh_index(corpus, qpath, dim=64), qpath)
    f = knn_join_index(spark, queries, fpath, dim=64, k=3).select("q_id", "c_id")
    qk = (
        quantized_knn_join_index(spark, queries, qpath, dim=64, k=3)
        .select("q_id", F.col("c_id").alias("m_id"))
    )
    return (
        f.join(qk, (f["q_id"] == qk["q_id"]) & (f["c_id"] == qk["m_id"]), "left")
        .drop(qk["q_id"])
        .groupBy("q_id")
        .agg(
            F.sum(F.when(F.col("m_id").isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_overlap"),
            F.count("*").cast("long").alias("n_float"),
        )
        .withColumn(
            "recall",
            F.col("n_overlap").cast("double") / F.col("n_float").cast("double"),
        )
    )


@query(
    "x90_ivf_knn_join",
    oracle=f"""
    WITH e AS (SELECT vec_id, {_VEC} AS v FROM embeddings WHERE vec_id % 10 <> 0),
         qs AS (SELECT vec_id AS q_id, {_VEC} AS qv FROM embeddings
                WHERE vec_id % 10 = 0),
         cents AS (SELECT vec_id AS centroid_id, v AS cvec FROM e
                   ORDER BY vec_id LIMIT 16),
         assigned AS (
           SELECT e.vec_id, e.v, c.centroid_id,
                  row_number() OVER (PARTITION BY e.vec_id
                                     ORDER BY {_cos_sql('e.v', 'c.cvec')} DESC,
                                              c.centroid_id) AS rn
           FROM e CROSS JOIN cents c),
         best AS (SELECT vec_id AS c_id, v, centroid_id FROM assigned WHERE rn = 1),
         qassign AS (
           SELECT q_id, qv, centroid_id,
                  row_number() OVER (PARTITION BY q_id
                                     ORDER BY {_cos_sql('qv', 'cvec')} DESC,
                                              centroid_id) AS crn
           FROM qs CROSS JOIN cents),
         j AS (SELECT q_id, c_id, {_cos_sql('qv', 'v')} AS cos_sim
               FROM (SELECT * FROM qassign WHERE crn <= 1) qa
               JOIN best USING (centroid_id)),
         r AS (SELECT q_id, c_id, cos_sim,
                      CAST(row_number() OVER (PARTITION BY q_id
                           ORDER BY cos_sim DESC, c_id) AS BIGINT) AS rn
               FROM j)
    SELECT q_id, c_id, cos_sim, rn FROM r WHERE rn <= 3
    """,
)
def x90_ivf_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch kNN join against the persisted IVF index — x89's
    inverted-list sibling, completing the batch-serving pair for both
    index families: the 90% corpus's index is built once (first-16
    quantizer, centroid-partitioned, norms stored at build), each
    query in the 10% batch is assigned its nearest centroid against
    the broadcast quantizer, and the probed centroid set partition-
    prunes the inverted-list scan.  nprobe=1, k=3; per-query results
    identical to ivf_index_probe on the same index
    (``ann_index.ivf_knn_join``)."""
    from ...operators.ann_index import ensure_index, ivf_knn_join, write_ivf_index

    emb = load_table(spark, sf_dir, "embeddings")
    path = _index_dir(sf_dir, "ivf_c90")
    ensure_index(
        lambda: write_ivf_index(emb.filter(F.col("vec_id") % 10 != 0), path),
        path,
    )
    return ivf_knn_join(spark, emb.filter(F.col("vec_id") % 10 == 0), path, k=3)


@query("x89_knn_index_join", oracle=_build_knn_oracle())
def x89_knn_index_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x58's kNN join served from the PERSISTED index instead of
    re-signaturing the corpus (``ann_index.knn_join_index`` — the
    batch twin the streaming server delegates to): the 90% corpus is
    indexed once (bucket-partitioned, norms stored at build time), the
    10% query batch computes its ≤2^p distinct buckets and the index
    scan is partition-pruned to exactly those.  The oracle is x58's
    verbatim — the index changes the COST (per-run work is O(batch) +
    the probed partitions), never the result."""
    from ...operators.ann_index import (
        corpus_fingerprint,
        ensure_index,
        knn_join_index,
        write_lsh_index,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    path = _index_dir(sf_dir, "lsh_c90")
    corpus = emb.filter(F.col("vec_id") % 10 != 0)
    # staleness-guarded: the stamp is the indexed corpus's count+max(id)
    # (footer-class scan, ~ms) — a re-landed sf dir rebuilds the index
    ensure_index(
        lambda: write_lsh_index(corpus, path, dim=64),
        path,
        fingerprint=_fp_cached(spark, sf_dir, "emb90", lambda: corpus_fingerprint(corpus)),
    )
    return knn_join_index(spark, emb.filter(F.col("vec_id") % 10 == 0), path, dim=64, k=3)


@query("x58_knn_join", oracle=_build_knn_oracle())
def x58_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch kNN join — every 10th vector plays the query batch, the
    rest the corpus; top-3 same-bucket cosine neighbors per query via
    ONE bucket-keyed equi-join + streaming per-query row_number (the
    retrieval/hard-negative-mining shape; at index scale the corpus
    side is the persisted bucket-partitioned table)."""
    from ...operators.similarity import knn_join

    emb = load_table(spark, sf_dir, "embeddings")
    return knn_join(
        emb.filter(F.col("vec_id") % 10 == 0),
        emb.filter(F.col("vec_id") % 10 != 0),
        dim=64,
        k=3,
    )


def _build_knn_mp_oracle(k: int = 3, n_planes: int = 4, dim: int = 64, radius: int = 1) -> str:
    planes = hyperplanes(n_planes, dim)
    lits = [f"[{', '.join(repr(x) for x in p)}]" for p in planes]

    def bucket(v: str) -> str:
        return " + ".join(
            f"CASE WHEN {_dot_sql(v, lits[p])} > 0 THEN {1 << p} ELSE 0 END"
            for p in range(n_planes)
        )

    ham = " + ".join(
        f"CASE WHEN ((qb.bucket // {1 << p}) % 2) <> ((cb.bucket // {1 << p}) % 2)"
        f" THEN 1 ELSE 0 END"
        for p in range(n_planes)
    )
    return f"""
    WITH q AS (SELECT vec_id AS q_id, {_VEC} AS qv FROM embeddings
               WHERE vec_id % 10 = 0),
         c AS (SELECT vec_id AS c_id, {_VEC} AS cv FROM embeddings
               WHERE vec_id % 10 <> 0),
         qb AS (SELECT q_id, qv, {bucket('qv')} AS bucket FROM q),
         cb AS (SELECT c_id, cv, {bucket('cv')} AS bucket FROM c),
         j AS (SELECT q_id, c_id, {_cos_sql('qv', 'cv')} AS cos_sim
               FROM qb JOIN cb ON ({ham}) <= {radius}),
         r AS (SELECT q_id, c_id, cos_sim,
                      CAST(row_number() OVER (PARTITION BY q_id
                           ORDER BY cos_sim DESC, c_id) AS BIGINT) AS rn
               FROM j)
    SELECT q_id, c_id, cos_sim, rn FROM r WHERE rn <= {k}
    """


@query("x59_knn_join_multiprobe", oracle=_build_knn_mp_oracle())
def x59_knn_join_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x58 with the Hamming-radius-1 recall dial: each query probes its
    own bucket plus every 1-bit-flip neighbor (5 of 16) — the probe set
    explodes BEFORE the join, so the plan stays one bucket-keyed
    equi-join (the oracle states the Hamming-distance inequality form
    this expansion is equivalent to)."""
    from ...operators.similarity import knn_join

    emb = load_table(spark, sf_dir, "embeddings")
    return knn_join(
        emb.filter(F.col("vec_id") % 10 == 0),
        emb.filter(F.col("vec_id") % 10 != 0),
        dim=64,
        k=3,
        hamming_radius=1,
    )


def _build_recall_oracle(k: int = 3, n_planes: int = 4, dim: int = 64) -> str:
    planes = hyperplanes(n_planes, dim)
    lits = [f"[{', '.join(repr(x) for x in p)}]" for p in planes]

    def bucket(v: str) -> str:
        return " + ".join(
            f"CASE WHEN {_dot_sql(v, lits[p])} > 0 THEN {1 << p} ELSE 0 END"
            for p in range(n_planes)
        )

    return f"""
    WITH q AS (SELECT vec_id AS q_id, {_VEC} AS qv FROM embeddings
               WHERE vec_id % 50 = 0),
         c AS (SELECT vec_id AS c_id, {_VEC} AS cv FROM embeddings
               WHERE vec_id % 10 <> 0),
         ex AS (SELECT q_id, c_id,
                       row_number() OVER (PARTITION BY q_id
                            ORDER BY {_cos_sql('qv', 'cv')} DESC, c_id) AS rn
                FROM q CROSS JOIN c),
         exact AS (SELECT q_id, c_id FROM ex WHERE rn <= {k}),
         qb AS (SELECT q_id, qv, {bucket('qv')} AS bucket FROM q),
         cb AS (SELECT c_id, cv, {bucket('cv')} AS bucket FROM c),
         aj AS (SELECT q_id, c_id,
                       row_number() OVER (PARTITION BY q_id
                            ORDER BY {_cos_sql('qv', 'cv')} DESC, c_id) AS rn
                FROM qb JOIN cb USING (bucket)),
         approx AS (SELECT q_id, c_id FROM aj WHERE rn <= {k})
    SELECT e.q_id,
           CAST(count(a.c_id) AS BIGINT) AS n_hit,
           CAST(count(a.c_id) AS DOUBLE) / {float(k)} AS recall
    FROM exact e LEFT JOIN approx a ON a.q_id = e.q_id AND a.c_id = e.c_id
    GROUP BY e.q_id
    """


@query("x60_ann_recall_audit", oracle=_build_recall_oracle())
def x60_ann_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@3 of the bucket-blocked kNN join against brute force on a
    query SAMPLE (every 50th vector) — the audit that justifies the
    blocking parameters, x42's twin for the ANN tier.  The exact side
    is a deliberate broadcast cross join over the sample (how recall is
    measured in production — never on the full query load)."""
    from ...operators.similarity import ann_recall_audit

    emb = load_table(spark, sf_dir, "embeddings")
    return ann_recall_audit(
        emb.filter(F.col("vec_id") % 50 == 0),
        emb.filter(F.col("vec_id") % 10 != 0),
        dim=64,
        k=3,
    )


@query(
    "x61_length_bucketed_batches",
    oracle=f"""
    WITH t AS (SELECT doc_id, CAST(len({_TOKS}) AS BIGINT) AS n_tokens FROM documents),
    b AS (SELECT doc_id, n_tokens,
                 CASE WHEN n_tokens <= 16 THEN 0 WHEN n_tokens <= 32 THEN 1
                      WHEN n_tokens <= 64 THEN 2 WHEN n_tokens <= 128 THEN 3
                      WHEN n_tokens <= 256 THEN 4 WHEN n_tokens <= 512 THEN 5
                      ELSE 6 END AS bucket,
                 CAST(strpos('0123456789abcdef',
                      substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 AS BIGINT)
                   AS shard
          FROM t),
    r AS (SELECT *, row_number() OVER (PARTITION BY bucket, shard
                 ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
          FROM b)
    SELECT bucket, shard, (rn - 1) // 8 AS batch_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(max(n_tokens) AS BIGINT) AS max_tokens,
           CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
           CAST(count(*) * max(n_tokens) - sum(n_tokens) AS BIGINT) AS padding_waste
    FROM r GROUP BY 1, 2, 3
    """,
)
def x61_length_bucketed_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic-batching assembly: whitespace-token counts bucketed by a
    CASE ladder (integer compares — no floor(log2) libm race), 16-way
    md5 sharding to bound per-task skew, batches of 8 numbered in
    md5-of-id order, and the padding_waste each rectangular batch
    tensor would cost — one corpus shuffle on (bucket, shard), agg
    reuses the partitioning."""
    from ...operators.sampling import length_bucketed_batches
    from ...operators.textstats import token_count_col

    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id", token_count_col(F.col("text")).cast("long").alias("n_tokens")
    )
    return length_bucketed_batches(t, "n_tokens", "doc_id", batch_size=8)


@query(
    "x62_merge_upsert",
    oracle="""
    WITH upd AS (SELECT event_id, ts, user_id, event_type,
                        value * 2 AS value, props
                 FROM events WHERE event_id % 5 = 0),
    merged AS (SELECT * FROM upd
               UNION ALL
               SELECT * FROM events
               WHERE event_id NOT IN (SELECT event_id FROM upd)),
    agg AS (SELECT event_type, count(*) AS n,
                   CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
            FROM merged GROUP BY 1)
    SELECT event_type, n, value_sum FROM agg
    """,
)
def x62_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE upsert driven end-to-end: a synthetic update batch (every
    5th event, value doubled) merged into the events table with
    updates-win semantics, verified through a per-type aggregate that
    only matches if exactly the updated rows changed and no base row
    was lost or duplicated.  One broadcast anti join + union — base
    rows never shuffle."""
    from ..warehouse import merge_upsert

    ev = load_table(spark, sf_dir, "events")
    upd = ev.filter(F.col("event_id") % 5 == 0).withColumn(
        "value", F.col("value") * 2
    )
    merged = merge_upsert(ev, upd, ["event_id"])
    return merged.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("value_sum"),
    )


@query(
    "x63_event_sessions",
    oracle="""
    WITH o AS (SELECT user_id, ts, event_id,
                      lag(ts) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS prev
               FROM events),
    f AS (SELECT user_id, ts, event_id,
                 CASE WHEN prev IS NULL
                           OR epoch_us(ts) - epoch_us(prev) > 1800 * 1000000
                      THEN 1 ELSE 0 END AS nf
          FROM o),
    s AS (SELECT user_id, ts,
                 CAST(sum(nf) OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1
                      AS BIGINT) AS session_id
          FROM f)
    SELECT user_id, session_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(epoch_us(min(ts)) AS BIGINT) AS start_us,
           CAST(epoch_us(max(ts)) AS BIGINT) AS end_us
    FROM s GROUP BY 1, 2
    """,
)
def x63_event_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (30-min gap) by islands-and-gaps — the
    hash-checked twin of the streaming ``session_window`` pipeline:
    one key shuffle, lag + running-sum windows sharing a single sort,
    session bounds emitted as exact epoch-µs."""
    from ...functions.windows import sessionize

    ev = load_table(spark, sf_dir, "events")
    s = sessionize(ev, "user_id", "ts", 1800, "event_id")
    return s.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        epoch_us(F.min("ts")).alias("start_us"),
        epoch_us(F.max("ts")).alias("end_us"),
    )


@query(
    "x64_scd2_history",
    oracle="""
    WITH v AS (SELECT user_id, ts, event_id, value,
                      lead(ts) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS next_ts
               FROM events WHERE event_type = 'signup'),
    h AS (SELECT user_id, value,
                 CAST(epoch_us(ts) AS BIGINT) AS valid_from_us,
                 CAST(epoch_us(next_ts) AS BIGINT) AS valid_to_us,
                 CASE WHEN next_ts IS NULL THEN true ELSE false END AS is_current
          FROM v)
    SELECT * FROM h
    """,
)
def x64_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 history assembly: each user's
    signup events become versioned rows with [valid_from, valid_to)
    ranges via one lead() over the key — the change-capture shape that
    turns an event log into a point-in-time-joinable dimension (the
    as-of join x16 is its consumer).  One key shuffle; epoch-µs bounds
    and an explicit event_id tiebreak keep both engines bit-identical;
    the open version carries a NULL valid_to and is_current=true."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "signup")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    v = ev.withColumn("next_ts", F.lead("ts").over(w))
    return v.select(
        "user_id",
        "value",
        epoch_us(F.col("ts")).alias("valid_from_us"),
        epoch_us(F.col("next_ts")).alias("valid_to_us"),
        F.col("next_ts").isNull().alias("is_current"),
    )


@query(
    "x65_pivot_counts",
    oracle="""
    SELECT CAST(dayofweek(CAST(ts AS DATE)) AS BIGINT) AS dow,
           CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS click,
           CAST(count(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS error,
           CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS purchase,
           CAST(count(*) FILTER (WHERE event_type = 'signup') AS BIGINT) AS signup,
           CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS view
    FROM events GROUP BY 1
    """,
)
def x65_pivot_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT surface: per-day-of-week event counts spread into one
    column per event type via ``pivot`` with an EXPLICIT value list —
    the only scalable form (data-driven pivot schemas need an extra
    distinct pass and break schema stability); compiles to one
    two-phase hash agg, exactly the conditional-count FILTER aggregation
    the oracle states.  Sunday=0 dow via ``pg_dow`` (Spark dayofweek is
    Sunday=1, DuckDB's already Sunday=0 — the F4 convention table)."""
    from ...functions.scalar import pg_dow

    ev = load_table(spark, sf_dir, "events")
    dow = pg_dow(F.col("ts").cast("date")).cast("long")
    return (
        ev.withColumn("dow", dow)
        .groupBy("dow")
        .pivot("event_type", ["click", "error", "purchase", "signup", "view"])
        .count()
        .na.fill(0)
    )


@query(
    "x66_rollup_counts",
    oracle="""
    SELECT event_type,
           CAST(dayofweek(CAST(ts AS DATE)) AS BIGINT) AS dow,
           CAST(count(*) AS BIGINT) AS n
    FROM events
    GROUP BY ROLLUP (event_type, dayofweek(CAST(ts AS DATE)))
    """,
)
def x66_rollup_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP surface: (event_type, dow) counts with per-type subtotals
    and a grand total in ONE pass — Spark expands the grouping sets
    into a single two-phase hash agg (the repeated-scan UNION ALL
    formulation this replaces would read the corpus once per level).
    NULL marks the rolled-up level in both engines identically."""
    from ...functions.scalar import pg_dow

    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn("dow", pg_dow(F.col("ts").cast("date")).cast("long"))
        .rollup("event_type", "dow")
        .agg(F.count("*").alias("n"))
    )


@query(
    "x67_set_ops",
    oracle="""
    WITH clickers AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
         erroring AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'error'),
         only_click AS (SELECT user_id FROM clickers EXCEPT SELECT user_id FROM erroring),
         both_sets AS (SELECT user_id FROM clickers INTERSECT SELECT user_id FROM erroring)
    SELECT 'click_only' AS segment, CAST(count(*) AS BIGINT) AS n FROM only_click
    UNION ALL
    SELECT 'click_and_error' AS segment, CAST(count(*) AS BIGINT) AS n FROM both_sets
    """,
)
def x67_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT / INTERSECT surface (audience segmentation): users who
    click but never error vs users who do both.  Spark plans both set
    ops as left-anti / left-semi hash joins over the distinct key sets
    — the same physical shapes the engine's dedup tier leans on, here
    through the declarative set-operator API."""
    ev = load_table(spark, sf_dir, "events")
    clickers = ev.filter(F.col("event_type") == "click").select("user_id").distinct()
    erroring = ev.filter(F.col("event_type") == "error").select("user_id").distinct()
    only_click = clickers.exceptAll(erroring).agg(F.count("*").alias("n")).select(
        F.lit("click_only").alias("segment"), "n"
    )
    both = clickers.intersect(erroring).agg(F.count("*").alias("n")).select(
        F.lit("click_and_error").alias("segment"), "n"
    )
    return only_click.unionByName(both)


@query(
    "x68_unpivot_metrics",
    oracle="""
    WITH w AS (SELECT lang,
                      CAST(count(*) AS DOUBLE) AS n_docs,
                      CAST(sum(n_chars) AS DOUBLE) AS total_chars,
                      CAST(max(n_chars) AS DOUBLE) AS max_chars
               FROM documents GROUP BY lang)
    SELECT lang, 'n_docs' AS metric, n_docs AS value FROM w
    UNION ALL SELECT lang, 'total_chars', total_chars FROM w
    UNION ALL SELECT lang, 'max_chars', max_chars FROM w
    """,
)
def x68_unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT surface (x65's inverse): a wide per-language metric row
    melted to (lang, metric, value) long form via the ``unpivot`` API —
    one Generate over the already-tiny aggregate, no extra shuffle
    (the metric table is one row per group; melting corpus-wide wide
    tables costs a width-factor row multiply, still scan-local).  All
    metrics cast to DOUBLE of exact integers, so the long column is
    hash-exact."""
    docs = load_table(spark, sf_dir, "documents")
    w = docs.groupBy("lang").agg(
        F.count("*").cast("double").alias("n_docs"),
        F.sum("n_chars").cast("double").alias("total_chars"),
        F.max("n_chars").cast("double").alias("max_chars"),
    )
    return w.unpivot(
        ["lang"], ["n_docs", "total_chars", "max_chars"], "metric", "value"
    )


@query(
    "x69_text_normalize",
    oracle="""
    WITH n AS (SELECT doc_id,
                      trim(regexp_replace(
                           regexp_replace(lower(text),
                                '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]', '', 'g'),
                           '[ \\t\\n\\r]+', ' ', 'g')) AS norm
               FROM documents)
    SELECT doc_id, md5(norm) AS norm_md5,
           CAST(length(norm) AS BIGINT) AS n_chars_norm
    FROM n
    """,
)
def x69_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus cleaning normalization (lowercase, control-char strip,
    whitespace collapse, trim) — one codegen regexp chain per row, no
    shuffle; emitted as md5 + length so the driver hashes 32-char
    digests instead of shipping normalized text.  The same chain runs
    verbatim in the oracle (patterns restricted to the Java∩RE2
    portable subset)."""
    from ...operators.textstats import normalize_text

    docs = load_table(spark, sf_dir, "documents")
    norm = normalize_text(F.col("text"))
    return docs.select(
        "doc_id",
        F.md5(norm).alias("norm_md5"),
        F.length(norm).cast("long").alias("n_chars_norm"),
    )


@query(
    "x70_conversion_funnel",
    oracle="""
    WITH v AS (SELECT user_id, min(ts) AS t_view FROM events
               WHERE event_type = 'view' GROUP BY 1),
    c AS (SELECT e.user_id, min(e.ts) AS t_click
          FROM events e JOIN v ON e.user_id = v.user_id
          WHERE e.event_type = 'click' AND e.ts >= v.t_view GROUP BY 1),
    p AS (SELECT e.user_id, min(e.ts) AS t_buy
          FROM events e JOIN c ON e.user_id = c.user_id
          WHERE e.event_type = 'purchase' AND e.ts >= c.t_click GROUP BY 1)
    SELECT 'view' AS stage, CAST(count(*) AS BIGINT) AS n_users FROM v
    UNION ALL SELECT 'click_after_view', CAST(count(*) AS BIGINT) FROM c
    UNION ALL SELECT 'purchase_after_click', CAST(count(*) AS BIGINT) FROM p
    """,
)
def x70_conversion_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (view → click → purchase): each stage
    counts users whose FIRST qualifying event follows their previous
    stage's first event — the product-analytics query every event
    pipeline serves.  Three min-aggs + two user-keyed equi-joins (all
    two-phase, AQE broadcasts the shrinking stage tables); timestamp
    comparisons on exact µs values, so both engines pick identical
    stage populations."""
    ev = load_table(spark, sf_dir, "events")

    def first_after(etype: str, prev: DataFrame | None, prev_col: str | None, out: str) -> DataFrame:
        e = ev.filter(F.col("event_type") == etype)
        if prev is not None:
            e = e.join(prev, "user_id").filter(F.col("ts") >= F.col(prev_col))
        return e.groupBy("user_id").agg(F.min("ts").alias(out))

    v = first_after("view", None, None, "t_view")
    c = first_after("click", v, "t_view", "t_click")
    p = first_after("purchase", c, "t_click", "t_buy")
    rows = [
        v.agg(F.count("*").alias("n_users")).select(F.lit("view").alias("stage"), "n_users"),
        c.agg(F.count("*").alias("n_users")).select(
            F.lit("click_after_view").alias("stage"), "n_users"
        ),
        p.agg(F.count("*").alias("n_users")).select(
            F.lit("purchase_after_click").alias("stage"), "n_users"
        ),
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


@query(
    "x71_dedup_rate_by_source",
    oracle="""
    WITH h AS (SELECT source, md5(text) AS th FROM documents),
    g AS (SELECT source, th, count(*) AS n FROM h GROUP BY 1, 2)
    SELECT source,
           CAST(sum(n) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_distinct_texts,
           CAST(sum(n) - count(*) AS BIGINT) AS n_exact_dups,
           CAST(CAST(sum(n) - count(*) AS BIGINT) AS DOUBLE)
             / CAST(CAST(sum(n) AS BIGINT) AS DOUBLE) AS dup_rate
    FROM g GROUP BY source
    """,
)
def x71_dedup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source exact-duplicate rate — the ingest-health monitor that
    catches a crawler re-fetching a site: md5(text) two-phase group
    (the shuffle carries 32-char hashes, never text), one more 1-row-
    per-source agg, one IEEE division."""
    docs = load_table(spark, sf_dir, "documents")
    g = (
        docs.select("source", F.md5("text").alias("th"))
        .groupBy("source", "th")
        .agg(F.count("*").alias("n"))
    )
    return (
        g.groupBy("source")
        .agg(
            F.sum("n").cast("long").alias("n_docs"),
            F.count("*").cast("long").alias("n_distinct_texts"),
        )
        .withColumn("n_exact_dups", F.col("n_docs") - F.col("n_distinct_texts"))
        .withColumn(
            "dup_rate",
            F.col("n_exact_dups").cast("double") / F.col("n_docs").cast("double"),
        )
    )


@query(
    "x72_top_terms_global",
    oracle="""
    WITH toks AS (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term
                  FROM documents),
    c AS (SELECT term, count(*) AS n FROM toks GROUP BY 1),
    r AS (SELECT term, CAST(n AS BIGINT) AS n,
                 row_number() OVER (ORDER BY n DESC, term) AS rn
          FROM c)
    SELECT term, n, CAST(rn AS BIGINT) AS rn FROM r WHERE rn <= 20
    """,
)
def x72_top_terms_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-20 terms — the vocabulary-head monitor (stopword
    drift, boilerplate takeover).  Token explode → two-phase count →
    TakeOrderedAndProject over the (term, n) table; term tiebreak makes
    the selected set deterministic.  When even the distinct-term table
    is too large to shuffle, ``textstats.top_terms(approx=True)`` is
    the drop-in count-min-sketch swap: depth x width bounded agg +
    hash-sampled candidate probe, pinned bit-equal to this exact path
    on the fixture (test_top_terms_count_min_pinned_to_exact)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z]+"), F.lit(0))
        ).alias("term")
    )
    c = toks.groupBy("term").agg(F.count("*").cast("long").alias("n"))
    w = Window.orderBy(F.desc("n"), "term")
    return (
        c.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 20)
        .select("term", "n", "rn")
    )


def _build_cm_top_terms_oracle(k: int = 20, depth: int = 5) -> str:
    """DuckDB twin of the count-min sketch: one md5 per term, sketch row
    d's bucket = hex digits [3d+1 .. 3d+3] (width 4096), identical to
    Spark's ``conv(substring(md5(term), 3d+1, 3), 16, 10)``."""

    def hx(i: str) -> str:
        return f"(strpos('0123456789abcdef', substr(hh, {i}, 1)) - 1)"

    bucket = (
        f"({hx('3*d + 1')} * 256 + {hx('3*d + 2')} * 16 + {hx('3*d + 3')})"
    )
    depths = ", ".join(f"({d})" for d in range(depth))
    return f"""
    WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS toks
               FROM documents),
    tok AS (SELECT doc_id, unnest(toks) AS term,
                   unnest(range(len(toks))) AS pos
            FROM t),
    h AS (SELECT doc_id, pos, term, md5(term) AS hh FROM tok),
    sk AS (SELECT d, {bucket} AS bucket, count(*) AS n
           FROM h, (VALUES {depths}) AS ds(d)
           GROUP BY 1, 2),
    cand AS (SELECT DISTINCT term, md5(term) AS hh FROM h
             WHERE substr(md5(CAST(doc_id AS VARCHAR) || ':' ||
                              CAST(pos AS VARCHAR)), 1, 1) < '1'),
    probe AS (SELECT c.term, min(sk.n) AS n
              FROM (SELECT term, hh, d, {bucket} AS bucket
                    FROM cand, (VALUES {depths}) AS ds(d)) c
              JOIN sk ON sk.d = c.d AND sk.bucket = c.bucket
              GROUP BY 1),
    r AS (SELECT term, CAST(n AS BIGINT) AS n,
                 row_number() OVER (ORDER BY n DESC, term) AS rn
          FROM probe)
    SELECT term, n, CAST(rn AS BIGINT) AS rn FROM r WHERE rn <= {k}
    """


@query("x79_top_terms_sketch", oracle=_build_cm_top_terms_oracle())
def x79_top_terms_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x72's top-terms monitor through the COUNT-MIN SKETCH path
    (``textstats.top_terms(approx=True)``) — the sub-linear swap for
    corpora whose distinct-term table is itself too large to shuffle,
    here value-hash-checked against a DuckDB twin that recomputes the
    identical sketch (portable md5 slice family, width 4096 so the
    sf0.01 vocabulary genuinely collides — the oracle checks the
    sketch MATH, not a collision-free fast path).

    Plan shape at 100 TB: token scan → (row, bucket) two-phase count
    bounded at depth·4096 rows after map-side combine (vocabulary-
    independent — the reason this operator exists) → hash-threshold
    candidate sample (rate 1/16) → broadcast sketch probe → top-20.
    Measured crossover (BENCH_NOTES 2026-08-14): the exact path still
    wins at 500 K docs (its map-side combine absorbs this vocabulary);
    the sketch's regime is distinct-term tables too large to shuffle
    at all — billions of terms — where exact grows unboundedly and the
    sketch stays 20 K rows."""
    from ...operators.textstats import top_terms

    docs = load_table(spark, sf_dir, "documents")
    return top_terms(docs, k=20, approx=True, candidate_hex_lt=1)


@query(
    "x73_length_histogram",
    oracle="""
    SELECT CASE WHEN n_chars <= 100 THEN 0 WHEN n_chars <= 200 THEN 1
                WHEN n_chars <= 400 THEN 2 WHEN n_chars <= 800 THEN 3
                ELSE 4 END AS bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(n_chars) AS BIGINT) AS min_chars,
           CAST(max(n_chars) AS BIGINT) AS max_chars
    FROM documents GROUP BY 1
    """,
)
def x73_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doc-length distribution in doubling buckets (CASE ladder —
    integer compares, engine-exact) — the shape monitor that catches
    truncation bugs and boilerplate floods; one two-phase hash agg."""
    docs = load_table(spark, sf_dir, "documents")
    b = F.lit(4)
    for i, bound in [(3, 800), (2, 400), (1, 200), (0, 100)]:
        b = F.when(F.col("n_chars") <= bound, F.lit(i)).otherwise(b)
    return docs.groupBy(b.alias("bucket")).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.min("n_chars").cast("long").alias("min_chars"),
        F.max("n_chars").cast("long").alias("max_chars"),
    )


@query(
    "x74_cross_source_dups",
    oracle="""
    WITH h AS (SELECT source, md5(text) AS th FROM documents),
    d AS (SELECT th, count(DISTINCT source) AS n_sources FROM h GROUP BY 1)
    SELECT CAST(n_sources AS BIGINT) AS n_sources,
           CAST(count(*) AS BIGINT) AS n_texts
    FROM d GROUP BY 1
    """,
)
def x74_cross_source_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplication profile: for each distinct text, how
    many sources carry it — syndicated/boilerplate content shows up as
    texts spanning many sources (the dedup-policy input: drop per
    source or per corpus?).  Two two-phase aggs over 32-char hashes."""
    docs = load_table(spark, sf_dir, "documents")
    d = (
        docs.select(F.md5("text").alias("th"), "source")
        .groupBy("th")
        .agg(F.countDistinct("source").cast("long").alias("n_sources"))
    )
    return d.groupBy("n_sources").agg(F.count("*").cast("long").alias("n_texts"))


@query(
    "x75_asof_tolerance",
    oracle="""
    WITH clicks AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'),
         v1 AS (SELECT user_id, ts, max(event_id) AS view_id
                FROM events WHERE event_type = 'view' GROUP BY 1, 2)
    SELECT c.event_id,
           CASE WHEN epoch_us(c.ts) - epoch_us(v.ts) <= 3600000000
                THEN v.view_id END AS view_id
    FROM clicks c ASOF LEFT JOIN v1 v ON c.user_id = v.user_id AND v.ts <= c.ts
    """,
)
def x75_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x16's as-of join with a 1-hour tolerance (pandas ``merge_asof
    (tolerance=...)`` parity): a click more than an hour after the
    user's latest view gets NULL instead of a stale attribution.  The
    latest match is always the closest, so "latest, then discard if
    stale" ≡ "latest within the window" — the oracle states it as a
    post-filter on DuckDB's native ASOF join; plan shape unchanged
    (one union + one keyed window, no extra shuffle)."""
    from ...operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts", "event_id")
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("view_id"))
    )
    return asof_join(
        clicks, views, key="user_id", ts="ts", payload_cols=["view_id"],
        tolerance_us=3_600_000_000,
    ).select("event_id", "view_id")


@query(
    "x76_sliding_window_avg",
    oracle="""
    WITH h AS (SELECT CAST(epoch_us(date_trunc('hour', ts)) AS BIGINT) AS hour_us,
                      CAST(count(*) AS BIGINT) AS n
               FROM events GROUP BY 1)
    SELECT hour_us, n,
           CAST(sum(n) OVER w AS BIGINT) AS n_3h,
           CAST(count(*) OVER w AS BIGINT) AS hours_present,
           CAST(CAST(sum(n) OVER w AS BIGINT) AS DOUBLE)
             / CAST(count(*) OVER w AS DOUBLE) AS avg_3h
    FROM h
    WINDOW w AS (ORDER BY hour_us
                 RANGE BETWEEN 7200000000 PRECEDING AND CURRENT ROW)
    """,
)
def x76_sliding_window_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding RANGE-frame window (3-hour moving event-rate average) —
    the bounded time-frame surface q04's cumulative window doesn't
    cover; gaps in the hour sequence are handled by the RANGE frame
    (a missing hour simply isn't in the window — the rows-frame
    formulation would silently average the wrong hours).

    Scale note: the window is ordered over the HOURLY aggregate (tiny —
    hours, not events), so the single-partition window sort is
    bounded; at fleet scale the same frame runs partitioned per entity.
    Integer window sums + one IEEE division per row keep both engines
    bit-identical."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        epoch_us(F.date_trunc("hour", F.col("ts"))).alias("hour_us")
    ).agg(F.count("*").cast("long").alias("n"))
    w = Window.orderBy("hour_us").rangeBetween(-7_200_000_000, 0)
    return hourly.select(
        "hour_us",
        "n",
        F.sum("n").over(w).cast("long").alias("n_3h"),
        F.count("*").over(w).cast("long").alias("hours_present"),
        (
            F.sum("n").over(w).cast("long").cast("double")
            / F.count("*").over(w).cast("double")
        ).alias("avg_3h"),
    )


@query(
    "x77_daily_growth",
    oracle="""
    WITH d AS (SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS n
               FROM events GROUP BY 1),
    g AS (SELECT day, n, lag(n) OVER (ORDER BY day) AS prev FROM d)
    SELECT day, n, CAST(prev AS BIGINT) AS prev,
           CAST(n - prev AS BIGINT) AS delta,
           CAST((n - prev) * 10000 // prev AS BIGINT) AS growth_bp
    FROM g
    """,
)
def x77_daily_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day volume growth monitor: daily counts, lag delta, and
    growth in integer basis points (``(n-prev)*10000 div prev`` — exact
    where a float percentage could differ in the last ulp); first day's
    lag is NULL in both engines.  The window orders the DAILY table
    (tiny), not events."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count("*").cast("long").alias("n")
    )
    w = Window.orderBy("day")
    g = d.withColumn("prev", F.lag("n").over(w).cast("long"))
    return g.select(
        "day",
        "n",
        "prev",
        (F.col("n") - F.col("prev")).cast("long").alias("delta"),
        F.expr("(n - prev) * 10000 div prev").cast("long").alias("growth_bp"),
    )


@query(
    "x78_grouped_percentile_rank",
    oracle="""
    WITH n AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1)
    SELECT d.doc_id, d.lang, d.n_chars,
           CAST(rank() OVER (PARTITION BY d.lang ORDER BY d.n_chars DESC) AS BIGINT)
             AS rank,
           CASE WHEN n.n > 1
                THEN CAST(rank() OVER (PARTITION BY d.lang ORDER BY d.n_chars DESC) - 1
                          AS DOUBLE) / CAST(n.n - 1 AS DOUBLE)
                ELSE 0.0 END AS pct
    FROM documents d JOIN n ON d.lang = n.lang
    """,
)
def x78_grouped_percentile_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language percentile calibration — x57's sort-free two-phase
    rank decomposition with every stage partitioned by the group key:
    per-(lang, score) counts, prefix window over each language's
    distinct-score table, broadcast join back.  The within-group
    calibration a multilingual pipeline needs before mixing quality
    scores across languages (a 'long' doc in zh is not a 'long' doc in
    en).  Ties share the min rank exactly like SQL rank()."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    counts = docs.groupBy("lang", "n_chars").agg(F.count("*").cast("long").alias("_c"))
    w_pre = (
        Window.partitionBy("lang")
        .orderBy(F.desc("n_chars"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pre = counts.withColumn("_better", F.coalesce(F.sum("_c").over(w_pre), F.lit(0)))
    totals = counts.groupBy("lang").agg(F.sum("_c").cast("long").alias("_n"))
    return (
        docs.join(F.broadcast(pre.select("lang", "n_chars", "_better")), ["lang", "n_chars"])
        .join(F.broadcast(totals), "lang")
        .withColumn("rank", (F.col("_better") + 1).cast("long"))
        .withColumn(
            "pct",
            F.when(
                F.col("_n") > 1,
                F.col("_better").cast("double") / (F.col("_n") - 1).cast("double"),
            ).otherwise(F.lit(0.0)),
        )
        .select("doc_id", "lang", "n_chars", "rank", "pct")
    )


@query(
    "x95_kneser_ney_surprisal",
    oracle=f"""
    WITH bt AS (SELECT regexp_extract_all(lower(text), '[a-z]+') AS toks
                FROM documents WHERE doc_id < 250),
    qt AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS toks
           FROM documents WHERE doc_id >= 250),
    t2 AS (SELECT g, CAST(count(*) AS BIGINT) AS c2
           FROM (SELECT unnest(list_transform(range(len(toks) - 1), i -> {_BI})) AS g
                 FROM bt WHERE len(toks) >= 2) GROUP BY 1),
    pre AS (SELECT split_part(g, ' ', 1) AS w1, CAST(sum(c2) AS BIGINT) AS c1p,
                   CAST(count(*) AS BIGINT) AS n1p FROM t2 GROUP BY 1),
    nc AS (SELECT split_part(g, ' ', 2) AS w2, CAST(count(*) AS BIGINT) AS ncont
           FROM t2 GROUP BY 1),
    n AS (SELECT CAST(count(*) AS BIGINT) AS nt FROM t2),
    tf AS (SELECT doc_id, g, count(*) AS tf
           FROM (SELECT doc_id,
                        unnest(list_transform(range(len(toks) - 1), i -> {_BI})) AS g
                 FROM qt WHERE len(toks) >= 2) GROUP BY 1, 2),
    k AS (SELECT doc_id, tf, g, split_part(g, ' ', 1) AS w1,
                 split_part(g, ' ', 2) AS w2
          FROM tf),
    s AS (SELECT k.doc_id, k.tf,
                 (2 * (nt + 1)) // (
                   CASE WHEN c2 IS NOT NULL
                        THEN ((2 * (nt + 1)) * (2 * c2 - 1)) // (2 * c1p) ELSE 0 END
                 + CASE WHEN c1p IS NOT NULL
                        THEN ((2 * (nt + 1)) * n1p * coalesce(ncont, 0))
                             // (2 * c1p * nt) ELSE 0 END
                 + CASE WHEN c1p IS NULL AND ncont IS NOT NULL
                        THEN ((2 * (nt + 1)) * ncont) // nt ELSE 0 END
                 + 1) AS inst
          FROM k LEFT JOIN t2 USING (g) LEFT JOIN pre USING (w1)
                 LEFT JOIN nc USING (w2) CROSS JOIN n)
    SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_bigrams,
           CAST(sum(tf * inst) AS BIGINT) AS surprisal_sum,
           CAST(CAST(sum(tf * inst) AS BIGINT) AS DOUBLE)
             / CAST(CAST(sum(tf) AS BIGINT) AS DOUBLE) AS avg_surprisal
    FROM s GROUP BY 1
    """,
)
def x95_kneser_ney_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The smoothing-family rung the JM ladder was building toward:
    the batch (doc_id ≥ 250) scored against the standing corpus's
    (doc_id < 250) bigram model with INTERPOLATED KNESER-NEY smoothing
    — absolute discounting (rational D = 1/2, exact via 2c−1 in fixed
    point at S = 2·(nt+1)) plus CONTINUATION counts, the distinct-left-
    context statistic KenLM's modified-KN estimator is built on.  The
    continuation tables are one more derived aggregate over the same
    persisted bigram snapshot the JM rungs read; batch side of every
    shuffle stays O(batch) (``textstats.kneser_ney_surprisal``;
    hand-built corpus pins the discount, λ·continuation, pure-
    continuation and OOV-ceiling branches, hypothesis property
    recomputes the cascade in Python, empty-base example pinned from
    day one)."""
    from ...operators.textstats import kneser_ney_surprisal

    docs = load_table(spark, sf_dir, "documents")
    return kneser_ney_surprisal(
        docs.filter(F.col("doc_id") >= 250), docs.filter(F.col("doc_id") < 250)
    )


@query(
    "x97_snapshot_refresh",
    oracle="""
    WITH t AS (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term
               FROM documents),
    c AS (SELECT term, CAST(count(*) AS BIGINT) AS c FROM t GROUP BY 1)
    SELECT term, c FROM c ORDER BY c DESC, term LIMIT 500
    """,
)
def x97_snapshot_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The nightly-snapshot MAINTENANCE step: the standing corpus's
    persisted (term, c) table (doc_id < 250, built once per scale dir)
    is refreshed with the day's batch deltas (doc_id ≥ 250) via
    ``textstats.refresh_counts`` — the snapshot streams through one
    broadcast LEFT join (never shuffles, no corpus-vocabulary set ever
    broadcast or collected), the merged table lands in a NEW versioned
    directory (idempotent overwrite — Spark cannot write over its own
    input), and the oracle proves EXACTNESS: the refreshed snapshot is
    bit-equal to recounting the full corpus.  Returns the top-500
    terms of the refreshed persisted table (c DESC, term)."""
    from ...operators.ann_index import ensure_index
    from ...operators.textstats import refresh_counts, unigram_counts

    docs = load_table(spark, sf_dir, "documents")
    v0 = _tagged_dir(_SCRATCH, "unigram_snapshot", "v1-split250", sf_dir=sf_dir)
    ensure_index(
        lambda: unigram_counts(docs.filter(F.col("doc_id") < 250))
        .write.mode("overwrite")
        .parquet(v0),
        v0,
    )
    v1 = _tagged_dir(_SCRATCH, "unigram_snapshot_refreshed", "v1-split250", sf_dir=sf_dir)
    refresh_counts(
        spark.read.parquet(v0),
        unigram_counts(docs.filter(F.col("doc_id") >= 250)),
    ).write.mode("overwrite").parquet(v1)
    return (
        spark.read.parquet(v1)
        .orderBy(F.desc("c"), "term")
        .limit(500)
        .select("term", "c")
    )


@query(
    "x96_quantized_ivf_knn_join",
    oracle=f"""
    WITH e AS (SELECT vec_id, {_VEC} AS v FROM embeddings WHERE vec_id % 10 <> 0),
         qs AS (SELECT vec_id AS q_id, {_VEC} AS qv FROM embeddings
                WHERE vec_id % 10 = 0),
         cents AS (SELECT vec_id AS centroid_id, v AS cvec FROM e
                   ORDER BY vec_id LIMIT 16),
         assigned AS (
           SELECT e.vec_id, e.v, c.centroid_id,
                  row_number() OVER (PARTITION BY e.vec_id
                                     ORDER BY {_cos_sql('e.v', 'c.cvec')} DESC,
                                              c.centroid_id) AS rn
           FROM e CROSS JOIN cents c),
         best AS (SELECT vec_id AS c_id, {_QUANT.format(v='v')} AS cq, centroid_id
                  FROM assigned WHERE rn = 1),
         qassign AS (
           SELECT q_id, qv, centroid_id,
                  row_number() OVER (PARTITION BY q_id
                                     ORDER BY {_cos_sql('qv', 'cvec')} DESC,
                                              centroid_id) AS crn
           FROM qs CROSS JOIN cents),
         qa AS (SELECT q_id, {_QUANT.format(v='qv')} AS qq, centroid_id
                FROM qassign WHERE crn <= 1),
         j AS (SELECT q_id, c_id, {_qcos_sql('qa.qq', 'best.cq')} AS q_cos
               FROM qa JOIN best USING (centroid_id)),
         r AS (SELECT q_id, c_id, q_cos,
                      CAST(row_number() OVER (PARTITION BY q_id
                           ORDER BY q_cos DESC, c_id) AS BIGINT) AS rn
               FROM j WHERE q_cos IS NOT NULL)
    SELECT q_id, c_id, q_cos, rn FROM r WHERE rn <= 3
    """,
)
def x96_quantized_ivf_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x90's inverted-list serving plan over x91's int8 storage — the
    layout that wins at serving gets the compressed variant: the 90%
    corpus persists int8 lists + integer-sum norms under a FULL-
    PRECISION coarse quantizer (assignment never moves with
    quantization), and the 10% batch assigns in float, quantizes in
    flight, and scores with integer-exact dots against only its probed
    lists (IN-list partition filter).  Scores are the quantized cosine
    by contract; float x90 is the recall baseline on the same corpus
    and quantizer (``ann_index.write_quantized_ivf_index`` /
    ``quantized_ivf_knn_join``; size assertion + recall audit + the
    streaming quantized serve are pytest-pinned)."""
    from ...operators.ann_index import (
        corpus_fingerprint,
        ensure_index,
        quantized_ivf_knn_join,
        write_quantized_ivf_index,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    path = _index_dir(sf_dir, "qivf_c90")
    corpus = emb.filter(F.col("vec_id") % 10 != 0)
    # staleness-guarded (see x89): count+max(id) stamp of the indexed slice
    ensure_index(
        lambda: write_quantized_ivf_index(corpus, path),
        path,
        fingerprint=_fp_cached(spark, sf_dir, "emb90", lambda: corpus_fingerprint(corpus)),
    )
    return quantized_ivf_knn_join(
        spark, emb.filter(F.col("vec_id") % 10 == 0), path, k=3
    )


@query(
    "x98_modified_kneser_ney",
    oracle=f"""
    WITH bt AS (SELECT regexp_extract_all(lower(text), '[a-z]+') AS toks
                FROM documents WHERE doc_id < 250),
    qt AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS toks
           FROM documents WHERE doc_id >= 250),
    t2 AS (SELECT g, CAST(count(*) AS BIGINT) AS c2
           FROM (SELECT unnest(list_transform(range(len(toks) - 1), i -> {_BI})) AS g
                 FROM bt WHERE len(toks) >= 2) GROUP BY 1),
    pre AS (SELECT split_part(g, ' ', 1) AS w1, CAST(sum(c2) AS BIGINT) AS c1p,
                   CAST(count(*) FILTER (WHERE c2 = 1) AS BIGINT) AS nw1_1,
                   CAST(count(*) FILTER (WHERE c2 = 2) AS BIGINT) AS nw1_2,
                   CAST(count(*) FILTER (WHERE c2 >= 3) AS BIGINT) AS nw1_3p
            FROM t2 GROUP BY 1),
    nc AS (SELECT split_part(g, ' ', 2) AS w2, CAST(count(*) AS BIGINT) AS ncont
           FROM t2 GROUP BY 1),
    cc0 AS (SELECT CAST(count(*) AS BIGINT) AS nt,
                   CAST(count(*) FILTER (WHERE c2 = 1) AS BIGINT) AS n1,
                   CAST(count(*) FILTER (WHERE c2 = 2) AS BIGINT) AS n2,
                   CAST(count(*) FILTER (WHERE c2 = 3) AS BIGINT) AS n3,
                   CAST(count(*) FILTER (WHERE c2 = 4) AS BIGINT) AS n4
            FROM t2),
    cc AS (SELECT nt,
                  CAST(CASE WHEN n1 + 2 * n2 > 0
                            THEN (64 * n1) // (n1 + 2 * n2) ELSE 32 END
                       AS BIGINT) AS d1q,
                  CAST(CASE WHEN n1 + 2 * n2 > 0 AND n2 > 0
                            THEN greatest(0, least(128,
                                 128 - (192 * n1 * n3) // ((n1 + 2 * n2) * n2)))
                            ELSE 32 END AS BIGINT) AS d2q,
                  CAST(CASE WHEN n1 + 2 * n2 > 0 AND n3 > 0
                            THEN greatest(0, least(192,
                                 192 - (256 * n1 * n4) // ((n1 + 2 * n2) * n3)))
                            ELSE 32 END AS BIGINT) AS d3q
           FROM cc0),
    tf AS (SELECT doc_id, g, count(*) AS tf
           FROM (SELECT doc_id,
                        unnest(list_transform(range(len(toks) - 1), i -> {_BI})) AS g
                 FROM qt WHERE len(toks) >= 2) GROUP BY 1, 2),
    k AS (SELECT doc_id, tf, g, split_part(g, ' ', 1) AS w1,
                 split_part(g, ' ', 2) AS w2
          FROM tf),
    s AS (SELECT k.doc_id, k.tf,
                 (2 * (nt + 1)) // (
                   CASE WHEN c2 IS NOT NULL
                        THEN ((2 * (nt + 1)) * (64 * c2 -
                              CASE WHEN c2 = 1 THEN d1q
                                   WHEN c2 = 2 THEN d2q ELSE d3q END))
                             // (64 * c1p) ELSE 0 END
                 + CASE WHEN c1p IS NOT NULL
                        THEN ((2 * (nt + 1))
                              * (d1q * nw1_1 + d2q * nw1_2 + d3q * nw1_3p)
                              * coalesce(ncont, 0))
                             // (64 * c1p * nt) ELSE 0 END
                 + CASE WHEN c1p IS NULL AND ncont IS NOT NULL
                        THEN ((2 * (nt + 1)) * ncont) // nt ELSE 0 END
                 + 1) AS inst
          FROM k LEFT JOIN t2 USING (g) LEFT JOIN pre USING (w1)
                 LEFT JOIN nc USING (w2) CROSS JOIN cc)
    SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_bigrams,
           CAST(sum(tf * inst) AS BIGINT) AS surprisal_sum,
           CAST(CAST(sum(tf * inst) AS BIGINT) AS DOUBLE)
             / CAST(CAST(sum(tf) AS BIGINT) AS DOUBLE) AS avg_surprisal
    FROM s GROUP BY 1
    """,
)
def x98_modified_kneser_ney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MODIFIED Kneser-Ney — x95's single D = 1/2 replaced by the
    three Chen-Goodman count-of-count discounts KenLM's estimator
    ships, each carried as a rational over Q = 64 (floor of Q·D_i,
    clamped into [0, i·Q]; undefined estimates fall back to x95's
    Q/2), with the per-history discount mass class-weighted by the
    per-prefix count-class fan-outs.  The count-of-count table is one
    more 1-row aggregate over the SAME persisted bigram snapshot —
    the 'straight extension of the same derived tables' x95 promised
    (``textstats.modified_kneser_ney_surprisal``; every discount
    branch hand-pinned, hypothesis property recomputes the cascade in
    Python with the empty-base example pinned from day one)."""
    from ...operators.textstats import modified_kneser_ney_surprisal

    docs = load_table(spark, sf_dir, "documents")
    return modified_kneser_ney_surprisal(
        docs.filter(F.col("doc_id") >= 250), docs.filter(F.col("doc_id") < 250)
    )


_X99_KN_ORACLE = f"""
    WITH bt AS (SELECT regexp_extract_all(lower(text), '[a-z]+') AS toks
                FROM documents WHERE doc_id < 250),
    qt AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS toks
           FROM documents WHERE doc_id >= 250),
    t3 AS (SELECT g, CAST(count(*) AS BIGINT) AS c3
           FROM (SELECT unnest(list_transform(range(len(toks) - 2), i -> {_TRI})) AS g
                 FROM bt WHERE len(toks) >= 3) GROUP BY 1),
    c12 AS (SELECT split_part(g, ' ', 1) || ' ' || split_part(g, ' ', 2) AS h,
                   CAST(sum(c3) AS BIGINT) AS c12p,
                   CAST(count(*) AS BIGINT) AS n12p
            FROM t3 GROUP BY 1),
    m23 AS (SELECT split_part(g, ' ', 2) || ' ' || split_part(g, ' ', 3) AS s23,
                   CAST(count(*) AS BIGINT) AS nc23
            FROM t3 GROUP BY 1),
    mid AS (SELECT split_part(s23, ' ', 1) AS w2,
                   CAST(sum(nc23) AS BIGINT) AS nm2,
                   CAST(count(*) AS BIGINT) AS nf2
            FROM m23 GROUP BY 1),
    t2 AS (SELECT g, CAST(count(*) AS BIGINT) AS c2
           FROM (SELECT unnest(list_transform(range(len(toks) - 1), i -> {_BI})) AS g
                 FROM bt WHERE len(toks) >= 2) GROUP BY 1),
    nc AS (SELECT split_part(g, ' ', 2) AS w3, CAST(count(*) AS BIGINT) AS nc3
           FROM t2 GROUP BY 1),
    tots AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM t3) AS nt3,
                    (SELECT CAST(count(*) AS BIGINT) FROM t2) AS ntb),
    tf AS (SELECT doc_id, g, count(*) AS tf
           FROM (SELECT doc_id,
                        unnest(list_transform(range(len(toks) - 2), i -> {_TRI})) AS g
                 FROM qt WHERE len(toks) >= 3) GROUP BY 1, 2),
    k AS (SELECT doc_id, tf, g,
                 split_part(g, ' ', 1) || ' ' || split_part(g, ' ', 2) AS h,
                 split_part(g, ' ', 2) || ' ' || split_part(g, ' ', 3) AS s23,
                 split_part(g, ' ', 2) AS w2,
                 split_part(g, ' ', 3) AS w3
          FROM tf),
    s AS (SELECT k.doc_id, k.tf,
                 (4 * (nt3 + 1)) // (
                   CASE WHEN c3 IS NOT NULL
                        THEN ((4 * (nt3 + 1)) * (2 * c3 - 1)) // (2 * c12p)
                        ELSE 0 END
                 + CASE WHEN c12p IS NOT NULL AND nc23 IS NOT NULL
                        THEN ((4 * (nt3 + 1)) * n12p * (2 * nc23 - 1))
                             // (4 * c12p * nm2) ELSE 0 END
                 + CASE WHEN c12p IS NOT NULL
                        THEN ((4 * (nt3 + 1)) * n12p * nf2 * coalesce(nc3, 0))
                             // (4 * c12p * nm2 * ntb) ELSE 0 END
                 + CASE WHEN c12p IS NULL AND nc23 IS NOT NULL
                        THEN ((4 * (nt3 + 1)) * (2 * nc23 - 1)) // (2 * nm2)
                        ELSE 0 END
                 + CASE WHEN c12p IS NULL AND nm2 IS NOT NULL
                        THEN ((4 * (nt3 + 1)) * nf2 * coalesce(nc3, 0))
                             // (2 * nm2 * ntb) ELSE 0 END
                 + CASE WHEN c12p IS NULL AND nm2 IS NULL AND nc3 IS NOT NULL
                        THEN ((4 * (nt3 + 1)) * nc3) // ntb ELSE 0 END
                 + 1) AS inst
          FROM k LEFT JOIN t3 USING (g) LEFT JOIN c12 USING (h)
                 LEFT JOIN m23 USING (s23) LEFT JOIN mid USING (w2)
                 LEFT JOIN nc USING (w3) CROSS JOIN tots)
    SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_trigrams,
           CAST(sum(tf * inst) AS BIGINT) AS surprisal_sum,
           CAST(CAST(sum(tf * inst) AS BIGINT) AS DOUBLE)
             / CAST(CAST(sum(tf) AS BIGINT) AS DOUBLE) AS avg_surprisal
    FROM s GROUP BY 1
"""


@query(
    "x99_trigram_kneser_ney",
    oracle=_X99_KN_ORACLE,
)
def x99_trigram_kneser_ney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RECURSIVE trigram Kneser-Ney — the rung that joins the ladder's
    two axes (order: x82/x84/x94; smoothing family: x95/x98): the
    lower-order model backs off through the CONTINUATION distribution
    (distinct-left-context counts of the suffix bigram, then x95's
    bigram-table continuation unigram), not raw frequencies — the
    CCNet-style quality-filter shape
    (``textstats.trigram_kneser_ney_surprisal``; hand-built pins cover
    every recursive continuation branch, hypothesis property recomputes
    the cascade in Python with the empty-base example from day one)."""
    from ...operators.textstats import trigram_kneser_ney_surprisal

    docs = load_table(spark, sf_dir, "documents")
    return trigram_kneser_ney_surprisal(
        docs.filter(F.col("doc_id") >= 250), docs.filter(F.col("doc_id") < 250)
    )


@query("x100_kn_snapshot_probe", oracle=_X99_KN_ORACLE)
def x100_kn_snapshot_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x99 through the SNAPSHOT-PROBE lifecycle (the x85/x86 contract
    for the n-gram family): the base corpus's trigram/bigram TYPE
    tables (``textstats.ngram_counts``) are persisted once per corpus
    refresh (ensure_index marker) and the recursive trigram-KN scorer
    derives its five rollups from vocabulary-sized snapshot scans —
    the oracle is x99's VERBATIM because the snapshot form is
    bit-equal to the in-flight form (pinned by test; the in-flight
    form re-executes the corpus explode once per derived-table
    consumer, measured 23.0 → 4.8 s at ×100 in BENCH_NOTES round 7).
    Plan-pinned: exactly one documents scan (the batch side)."""
    from ...operators.ann_index import ensure_index
    from ...operators.textstats import ngram_counts, trigram_kneser_ney_surprisal

    docs = load_table(spark, sf_dir, "documents")
    base = docs.filter(F.col("doc_id") < 250)
    root = _tagged_dir(_SCRATCH, "ngram_snapshot", "v1-split250", sf_dir=sf_dir)
    p2, p3 = os.path.join(root, "t2"), os.path.join(root, "t3")
    ensure_index(lambda: ngram_counts(base, 2).write.mode("overwrite").parquet(p2), p2)
    ensure_index(lambda: ngram_counts(base, 3).write.mode("overwrite").parquet(p3), p3)
    return trigram_kneser_ney_surprisal(
        docs.filter(F.col("doc_id") >= 250),
        t3_counts=spark.read.parquet(p3),
        t2_counts=spark.read.parquet(p2),
    )


