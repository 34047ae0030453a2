"""Lexical + vector retrieval tier: BM25 top-k, inverted/forward indexes,
PQ/IVFPQ/OPQ, graph ranking.

Split from ``plans/extensions.py`` at the round-14 close (r13 verdict
item 8) — code moved VERBATIM; the aggregator re-exports every name, so
``plans.extensions.<name>`` remains the stable public path."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window, functions as F
from ..registry import query
from ..tables import epoch_us, load_table
from ...operators.dedup import (
    BAND_ROWS,
    MAX_BUCKET,
    MINHASH_K,
    exact_jaccard,
    minhash_candidates,
    minhash_estimate,
    shingles,
)
from ...operators.similarity import hyperplanes
from ...operators.textstats import token_count_col
from .fragments import (
    _CAND_CTES,
    _MATCHES,
    _N_BANDS,
    _SHINGLES,
    _SIG_ELEMS,
    _TOKS,
    _VEC,
    _all_shingles_sql,
    _cos_sql,
)
from .scratch import _SCRATCH, _fp_cached, _index_dir, _tagged_dir
from .ann import _QV_SQL, _dot_sql, _query_vec

# ---------------------------------------------------------------------------
# Lexical retrieval tier (round 7): BM25 top-k, persisted inverted index,
# retrieval-based decontamination (operators/retrieval.py)
# ---------------------------------------------------------------------------

# Shared oracle prefix: corpus term/length/df tables + the fixed-point BM25
# scoring chain (constants mirror operators/retrieval.py: Q=S1=S2=1024,
# k1=6/5, b=3/4 multiplied through to integers — module docstring derivation).
_BM25_TABLES = """
    toks AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term
             FROM documents),
    tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM toks GROUP BY 1, 2),
    dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY 1),
    st AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(dl) AS BIGINT) AS l FROM dl),
    a AS (SELECT n, (l * 1024) // n AS avgdl_fp FROM st WHERE n > 0),
    dfx AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1)
"""

_BM25_SCORE_TOPK = """
    sc AS (SELECT query_id, m.doc_id,
                  CAST(sum(  ((1024 * (2*n - 2*df + 1)) // (2*df + 1))
                           * ((1024 * 22 * tf * avgdl_fp)
                              // (10 * tf * avgdl_fp + 3 * avgdl_fp + 9 * dl * 1024))
                        ) AS BIGINT) AS score_fp
           FROM m CROSS JOIN a GROUP BY 1, 2),
    tk AS (SELECT query_id, doc_id, score_fp,
                  CAST(row_number() OVER (PARTITION BY query_id
                                          ORDER BY score_fp DESC, doc_id ASC) AS INT) AS rank
           FROM sc)
"""

_BM25_TOPK_ORACLE = f"""
    WITH {_BM25_TABLES},
    qtf AS (SELECT doc_id AS query_id, term, tf FROM tf WHERE doc_id % 50 = 0),
    qs AS (SELECT query_id, q.term,
                  CAST(q.tf AS DOUBLE) / CAST(d.df AS DOUBLE) AS s
           FROM qtf q JOIN dfx d USING (term)),
    qt AS (SELECT query_id, term FROM (
             SELECT query_id, term,
                    row_number() OVER (PARTITION BY query_id
                                       ORDER BY s DESC, term ASC) AS rn
             FROM qs) WHERE rn <= 3),
    m AS (SELECT qt.query_id, tf.doc_id, tf.tf, dl.dl, dfx.df
          FROM qt JOIN tf USING (term) JOIN dl USING (doc_id) JOIN dfx USING (term)),
    {_BM25_SCORE_TOPK}
    SELECT query_id, doc_id, score_fp, rank,
           CAST(score_fp AS DOUBLE) / 1048576.0 AS score
    FROM tk WHERE rank <= 5
"""


@query("x101_bm25_topk", oracle=_BM25_TOPK_ORACLE)
def x101_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical retrieval: BM25 top-5 documents per query, the query
    workload derived from the corpus itself (every 50th doc's top-3
    linear-tf-idf terms — the x40 scorer, so the workload is
    deterministic and oracle-expressible).  Fixed-point integer BM25
    (k1=6/5, b=3/4, raw-odds idf — no libm in checked values; the
    derivation and the int64 ceilings are in
    ``operators/retrieval.py``'s module docstring).  Scale shape:
    query terms broadcast; every shuffle after the match carries
    O(matched postings) integer rows; top-k is one window with a
    streaming row counter.  The persisted-index serve (x102) is the
    at-scale form."""
    from ...operators.retrieval import bm25_topk, materialize_queries, top_terms_queries

    docs = load_table(spark, sf_dir, "documents")
    queries = materialize_queries(top_terms_queries(docs, F.col("doc_id") % 50 == 0, n_terms=3))
    return bm25_topk(docs, queries, k=5)


@query("x102_bm25_index_serve", oracle=_BM25_TOPK_ORACLE)
def x102_bm25_index_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x101 served from the PERSISTED inverted index
    (``retrieval.write_inverted_index`` — tf/dl/df denormalized into
    term-bucket-partitioned postings at build time, one-row stats
    sidecar): the oracle is x101's VERBATIM because the index changes
    the COST, never the result (pinned bit-equal by test).  Per-run
    work is O(matched postings in the probed buckets): the batch's
    distinct term buckets become an IN-list partition filter
    (plan-pinned), and no aggregation touches corpus-sized tables —
    even the query workload is read off the index postings
    (``top_terms_from_index``: tf/df are denormalized there, so query
    construction is a projection + window, zero tokenization; the
    selection is bit-identical to x101's).  Staleness-guarded by the
    corpus fingerprint (count + max doc_id, footer-only)."""
    from ...operators.ann_index import corpus_fingerprint, ensure_index
    from ...operators.retrieval import (
        bm25_serve,
        top_terms_from_index,
        write_inverted_index,
    )

    docs = load_table(spark, sf_dir, "documents")
    path = os.path.join(_tagged_dir(_SCRATCH, "bm25_index", "v2", sf_dir=sf_dir), "full")
    ensure_index(
        lambda: write_inverted_index(docs, path),
        os.path.join(path, "stats"),
        fingerprint=_fp_cached(spark, sf_dir, "docs",
                                lambda: corpus_fingerprint(docs, id_col="doc_id")),
    )
    queries = top_terms_from_index(spark, path, F.col("doc_id") % 50 == 0, n_terms=3)
    return bm25_serve(spark, queries, path, k=5)


@query(
    "x103_retrieval_decontamination",
    oracle="""
    WITH ctoks AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term
                   FROM documents WHERE doc_id >= 20),
    tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM ctoks GROUP BY 1, 2),
    dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY 1),
    st AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(dl) AS BIGINT) AS l FROM dl),
    a AS (SELECT n, (l * 1024) // n AS avgdl_fp FROM st WHERE n > 0),
    dfx AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
    btoks AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term
              FROM documents WHERE doc_id < 20),
    btf AS (SELECT doc_id AS query_id, term, CAST(count(*) AS BIGINT) AS tf
            FROM btoks GROUP BY 1, 2),
    qs AS (SELECT query_id, q.term,
                  CAST(q.tf AS DOUBLE) / CAST(d.df AS DOUBLE) AS s
           FROM btf q JOIN dfx d USING (term)),
    qt AS (SELECT query_id, term FROM (
             SELECT query_id, term,
                    row_number() OVER (PARTITION BY query_id
                                       ORDER BY s DESC, term ASC) AS rn
             FROM qs) WHERE rn <= 3),
    m AS (SELECT qt.query_id, tf.doc_id, tf.tf, dl.dl, dfx.df
          FROM qt JOIN tf USING (term) JOIN dl USING (doc_id) JOIN dfx USING (term)),
    sc AS (SELECT query_id, m.doc_id,
                  CAST(sum(  ((1024 * (2*n - 2*df + 1)) // (2*df + 1))
                           * ((1024 * 22 * tf * avgdl_fp)
                              // (10 * tf * avgdl_fp + 3 * avgdl_fp + 9 * dl * 1024))
                        ) AS BIGINT) AS score_fp
           FROM m CROSS JOIN a GROUP BY 1, 2),
    tk AS (SELECT query_id, doc_id, score_fp,
                  CAST(row_number() OVER (PARTITION BY query_id
                                          ORDER BY score_fp DESC, doc_id ASC) AS INT) AS rank
           FROM sc)
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_queries,
           CAST(min(rank) AS INT) AS best_rank
    FROM tk WHERE rank <= 5 GROUP BY 1
    """,
)
def x103_retrieval_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-based decontamination: each benchmark document
    (doc_id < 20, the x31 eval-suite stand-in) becomes a query — its
    top-3 distinguishing terms against TRAINING-side df — and every
    training document (doc_id >= 20) landing in any query's BM25 top-5
    is flagged with (n_queries, best_rank).  The lexical complement of
    x31's exact 5-gram screen: n-gram overlap catches verbatim
    leakage, retrieval catches the paraphrased benchmark item that
    shares its distinguishing vocabulary.  A benchmark term absent
    from the training side drops out of query construction (it cannot
    retrieve; documented inner-join semantics, mirrored by the
    oracle)."""
    from ...operators.retrieval import retrieval_decontaminate

    docs = load_table(spark, sf_dir, "documents")
    return retrieval_decontaminate(docs, F.col("doc_id") < 20, n_terms=3, k=5)


_RRF_S = 495593280  # lcm(61..65) — retrieval.rrf_scale(5), exact divisors


@query(
    "x104_hybrid_rrf",
    oracle=f"""
    WITH edocs AS (SELECT d.doc_id, d.text FROM documents d
                   JOIN embeddings e ON d.doc_id = e.vec_id),
    toks AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term
             FROM edocs),
    tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM toks GROUP BY 1, 2),
    dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY 1),
    st AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(dl) AS BIGINT) AS l FROM dl),
    a AS (SELECT n, (l * 1024) // n AS avgdl_fp FROM st WHERE n > 0),
    dfx AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
    qtf AS (SELECT doc_id AS query_id, term, tf FROM tf WHERE doc_id % 50 = 0),
    qs AS (SELECT query_id, q.term,
                  CAST(q.tf AS DOUBLE) / CAST(d.df AS DOUBLE) AS s
           FROM qtf q JOIN dfx d USING (term)),
    qt AS (SELECT query_id, term FROM (
             SELECT query_id, term,
                    row_number() OVER (PARTITION BY query_id
                                       ORDER BY s DESC, term ASC) AS rn
             FROM qs) WHERE rn <= 3),
    m AS (SELECT qt.query_id, tf.doc_id, tf.tf, dl.dl, dfx.df
          FROM qt JOIN tf USING (term) JOIN dl USING (doc_id) JOIN dfx USING (term)),
    sc AS (SELECT query_id, m.doc_id,
                  CAST(sum(  ((1024 * (2*n - 2*df + 1)) // (2*df + 1))
                           * ((1024 * 22 * tf * avgdl_fp)
                              // (10 * tf * avgdl_fp + 3 * avgdl_fp + 9 * dl * 1024))
                        ) AS BIGINT) AS score_fp
           FROM m CROSS JOIN a GROUP BY 1, 2),
    lex AS (SELECT query_id, doc_id,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY score_fp DESC, doc_id ASC) AS rank
            FROM sc),
    qv AS (SELECT vec_id AS q_id, {_VEC} AS qvec FROM embeddings WHERE vec_id % 50 = 0),
    cv AS (SELECT vec_id AS c_id, {_VEC} AS cvec FROM embeddings),
    dj AS (SELECT q_id, c_id, {_cos_sql('qvec', 'cvec')} AS cos
           FROM qv CROSS JOIN cv),
    den AS (SELECT q_id AS query_id, c_id AS doc_id,
                   row_number() OVER (PARTITION BY q_id
                                      ORDER BY cos DESC, c_id ASC) AS rank
            FROM dj),
    u AS (SELECT query_id, doc_id, rank FROM lex WHERE rank <= 5
          UNION ALL
          SELECT query_id, doc_id, rank FROM den WHERE rank <= 5),
    f AS (SELECT query_id, doc_id,
                 CAST(sum({_RRF_S} // (60 + rank)) AS BIGINT) AS rrf_fp,
                 CAST(count(*) AS INT) AS n_arms
          FROM u GROUP BY 1, 2),
    tk AS (SELECT query_id, doc_id, rrf_fp, n_arms,
                  CAST(row_number() OVER (PARTITION BY query_id
                                          ORDER BY rrf_fp DESC, doc_id ASC) AS INT) AS rank
           FROM f)
    SELECT query_id, doc_id, rrf_fp, n_arms, rank,
           CAST(rrf_fp AS DOUBLE) / {_RRF_S}.0 AS rrf
    FROM tk WHERE rank <= 5
    """,
)
def x104_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: the lexical arm (x101's BM25 top-5) and the
    dense arm (EXACT cosine top-5, ``similarity.knn_join_exact``) over
    the embedded slice of the corpus (documents semi-joined to
    embeddings on doc_id = vec_id), fused by reciprocal rank fusion at
    the exact common-denominator scale S = lcm(61..65) — the fused
    score is an int64 sum of exact divisions (``retrieval.rrf_fuse``),
    no float summation order to disagree on.  The composition contract
    is (query_id, doc_id, rank) per arm, so at scale either arm swaps
    for its index-served form (x102 / x90) without touching the
    fusion.  Arms may disagree on which queries they answer (a
    zero-token query doc has no lexical terms) — fusion is a union +
    one O(batch) aggregation, never an outer join.  The lexical arm
    runs through the PERSISTED inverted index built for the embedded
    slice (bm25_serve — bit-equal to in-flight bm25_topk by the x102
    contract, so the oracle stays the in-flight chain verbatim): the
    at-scale composition this operator exists for."""
    from ...operators.ann_index import corpus_fingerprint, ensure_index
    from ...operators.retrieval import (
        bm25_serve,
        rrf_fuse,
        top_terms_from_index,
        write_inverted_index,
    )
    from ...operators.similarity import knn_join_exact

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    edocs = docs.join(
        emb.select(F.col("vec_id").alias("doc_id")), "doc_id", "left_semi"
    )
    path = os.path.join(
        _tagged_dir(_SCRATCH, "bm25_index", "v2", sf_dir=sf_dir), "embedded"
    )
    ensure_index(
        lambda: write_inverted_index(edocs, path),
        os.path.join(path, "stats"),
        fingerprint=_fp_cached(spark, sf_dir, "edocs",
                                lambda: corpus_fingerprint(edocs, id_col="doc_id")),
    )
    queries = top_terms_from_index(spark, path, F.col("doc_id") % 50 == 0, n_terms=3)
    lex = bm25_serve(spark, queries, path, k=5).select("query_id", "doc_id", "rank")
    den = knn_join_exact(emb.filter(F.col("vec_id") % 50 == 0), emb, k=5).select(
        F.col("q_id").alias("query_id"),
        F.col("c_id").alias("doc_id"),
        F.col("rn").alias("rank"),
    )
    return rrf_fuse([lex, den], k=5)


def _build_pq_oracle(dim: int = 64, m: int = 8, ks: int = 16, k: int = 5) -> str:
    """The full PQ lifecycle — deterministic first-ks codebook per
    subspace, squared-L2 argmin encode, stored reconstruction norms,
    ADC scoring — as one DuckDB statement (operators/pq.py).  Every
    float reduction is the sequential-fold twin of the Spark side
    (the x27 lesson: fold order IS the correctness contract), and the
    cross-subspace sums fold in m order via list(p ORDER BY m)."""
    d = dim // m

    def foldsum(lst: str) -> str:
        return f"list_reduce(list_prepend(0.0, {lst}), (acc, x) -> acc + x)"

    def dot_sql(a: str, b: str) -> str:
        return foldsum(f"list_transform(list_zip({a}, {b}), p -> p[1] * p[2])")

    def l2sq_sql(a: str, b: str) -> str:
        return foldsum(
            f"list_transform(list_zip({a}, {b}), p -> (p[1] - p[2]) * (p[1] - p[2]))"
        )

    def sqn_sql(a: str) -> str:
        return foldsum(f"list_transform({a}, x -> x * x)")

    qsub = f"list_slice((SELECT qv FROM q), m*{d}+1, m*{d}+{d})"
    return f"""
    WITH e AS MATERIALIZED (SELECT vec_id, {_VEC} AS v FROM embeddings),
    q AS MATERIALIZED (SELECT {_QV_SQL} AS qv),
    ms AS (SELECT CAST(unnest(range({m})) AS INT) AS m),
    cb0 AS MATERIALIZED (SELECT v, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS code
                         FROM (SELECT * FROM e ORDER BY vec_id LIMIT {ks})),
    cbn AS MATERIALIZED (SELECT m, code, list_slice(v, m*{d}+1, m*{d}+{d}) AS cvec,
                                {sqn_sql(f'list_slice(v, m*{d}+1, m*{d}+{d})')} AS cn2
                         FROM cb0 CROSS JOIN ms),
    sv AS (SELECT vec_id, m, list_slice(v, m*{d}+1, m*{d}+{d}) AS sub FROM e CROSS JOIN ms),
    asg AS (SELECT vec_id, m, code, cn2,
                   row_number() OVER (PARTITION BY vec_id, m
                                      ORDER BY {l2sq_sql('sub', 'cvec')} ASC, code ASC) AS rn
            FROM sv JOIN cbn USING (m)),
    enc AS MATERIALIZED (SELECT vec_id, m, code, cn2 FROM asg WHERE rn = 1),
    rn1 AS (SELECT vec_id, list(cn2 ORDER BY m) AS cs FROM enc GROUP BY 1),
    rnv AS (SELECT vec_id, sqrt({foldsum('cs')}) AS recon_norm FROM rn1),
    dt AS (SELECT m, code, {dot_sql(qsub, 'cvec')} AS p FROM cbn),
    sc1 AS (SELECT vec_id, list(p ORDER BY m) AS ps FROM enc JOIN dt USING (m, code) GROUP BY 1),
    sc AS (SELECT vec_id, {foldsum('ps')} AS raw FROM sc1),
    qn AS (SELECT sqrt({sqn_sql('(SELECT qv FROM q)')}) AS qn)
    SELECT s.vec_id,
           CASE WHEN r.recon_norm > 0 AND qn.qn > 0
                THEN s.raw / (qn.qn * r.recon_norm) END AS cos_approx
    FROM sc s JOIN rnv r USING (vec_id) CROSS JOIN qn
    ORDER BY cos_approx DESC NULLS LAST, vec_id LIMIT {k}
    """


@query("x105_pq_adc_probe", oracle=_build_pq_oracle())
def x105_pq_adc_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantized index + asymmetric-distance probe — the
    compressed-codes rung of the quantization ladder (float -> int8
    scalar -> PQ, ``operators/pq.py``): vectors stored as m=8 one-byte
    codes + a reconstruction norm (~8 bytes vs 512 of float64), the
    query full-precision, scoring = m-ordered fold of distance-table
    lookups.  The registered form uses the deterministic first-16
    per-subspace codebook (the pre-trained-quantizer convention of
    x12/x21) so the ENTIRE encode -> store -> ADC lifecycle sits under
    the oracle gate; the per-subspace-kmeans trained codebook is the
    pytest-covered quality path.  Staleness-guarded build-once index;
    the probe scan reads only (vec_id, codes, recon_norm)."""
    from ...operators.ann_index import corpus_fingerprint, ensure_index
    from ...operators.pq import pq_adc_probe, write_pq_index

    emb = load_table(spark, sf_dir, "embeddings")
    qv = _query_vec(spark, sf_dir)
    path = _index_dir(sf_dir, "pq_v1")
    ensure_index(
        lambda: write_pq_index(emb, path, dim=64),
        os.path.join(path, "codes"),
        fingerprint=_fp_cached(spark, sf_dir, "emb", lambda: corpus_fingerprint(emb)),
    )
    return pq_adc_probe(spark, path, qv, k=5)


def _build_pq_knn_oracle(
    dim: int = 64, m: int = 8, ks: int = 16, k: int = 3, modulus: int = 50
) -> str:
    """x105's lifecycle CTEs with a QUERY BATCH: per-query distance
    tables over the same deterministic codebook, ADC scores grouped
    (q, candidate), m-ordered folds, per-query top-k."""
    d = dim // m

    def foldsum(lst: str) -> str:
        return f"list_reduce(list_prepend(0.0, {lst}), (acc, x) -> acc + x)"

    def dot_sql(a: str, b: str) -> str:
        return foldsum(f"list_transform(list_zip({a}, {b}), p -> p[1] * p[2])")

    def l2sq_sql(a: str, b: str) -> str:
        return foldsum(
            f"list_transform(list_zip({a}, {b}), p -> (p[1] - p[2]) * (p[1] - p[2]))"
        )

    def sqn_sql(a: str) -> str:
        return foldsum(f"list_transform({a}, x -> x * x)")

    return f"""
    WITH e AS MATERIALIZED (SELECT vec_id, {_VEC} AS v FROM embeddings),
    ms AS (SELECT CAST(unnest(range({m})) AS INT) AS m),
    cb0 AS MATERIALIZED (SELECT v, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS code
                         FROM (SELECT * FROM e ORDER BY vec_id LIMIT {ks})),
    cbn AS MATERIALIZED (SELECT m, code, list_slice(v, m*{d}+1, m*{d}+{d}) AS cvec,
                                {sqn_sql(f'list_slice(v, m*{d}+1, m*{d}+{d})')} AS cn2
                         FROM cb0 CROSS JOIN ms),
    sv AS (SELECT vec_id, m, list_slice(v, m*{d}+1, m*{d}+{d}) AS sub FROM e CROSS JOIN ms),
    asg AS (SELECT vec_id, m, code, cn2,
                   row_number() OVER (PARTITION BY vec_id, m
                                      ORDER BY {l2sq_sql('sub', 'cvec')} ASC, code ASC) AS rn
            FROM sv JOIN cbn USING (m)),
    enc AS MATERIALIZED (SELECT vec_id, m, code, cn2 FROM asg WHERE rn = 1),
    rn1 AS (SELECT vec_id, list(cn2 ORDER BY m) AS cs FROM enc GROUP BY 1),
    rnv AS (SELECT vec_id, sqrt({foldsum('cs')}) AS recon_norm FROM rn1),
    qv AS (SELECT vec_id AS q_id, v AS qvec FROM e WHERE vec_id % {modulus} = 0),
    qns AS (SELECT q_id, sqrt({sqn_sql('qvec')}) AS qn FROM qv),
    qsub AS (SELECT q_id, m, list_slice(qvec, m*{d}+1, m*{d}+{d}) AS sub
             FROM qv CROSS JOIN ms),
    dt AS (SELECT q_id, m, code, {dot_sql('sub', 'cvec')} AS p FROM qsub JOIN cbn USING (m)),
    sc1 AS (SELECT q_id, vec_id, list(p ORDER BY m) AS ps
            FROM enc JOIN dt USING (m, code) GROUP BY 1, 2),
    sc AS (SELECT q_id, vec_id, {foldsum('ps')} AS raw FROM sc1),
    fin AS (SELECT q_id, vec_id AS c_id,
                   CASE WHEN recon_norm > 0 AND qn > 0
                        THEN raw / (qn * recon_norm) END AS cos_approx
            FROM sc JOIN rnv USING (vec_id) JOIN qns USING (q_id)),
    rk AS (SELECT q_id, c_id, cos_approx,
                  CAST(row_number() OVER (PARTITION BY q_id
                                          ORDER BY cos_approx DESC NULLS LAST, c_id ASC) AS INT) AS rn
           FROM fin)
    SELECT q_id, c_id, cos_approx, rn FROM rk WHERE rn <= {k}
    """


@query("x106_pq_knn_join", oracle=_build_pq_knn_oracle())
def x106_pq_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch ADC kNN join over the persisted PQ index — x105's batch
    twin and the compressed sibling of x104's exact dense arm: every
    50th vector queries the codes table, scoring = per-query distance-
    table lookups folded in m order (m array accesses + adds per
    candidate instead of a dim-element dot).  Per-query tables build
    distributed (query subspaces x broadcast codebook, two-level
    code-in-m-ordered reassembly) and the O(batch) table side
    broadcasts over ONE codes scan — no corpus shuffle.  Same frozen
    deterministic codebook as x105, so the whole batch lifecycle is
    oracle-gated; NULL scores (zero norms) rank after every real
    score."""
    from ...operators.ann_index import corpus_fingerprint, ensure_index
    from ...operators.pq import pq_knn_join, write_pq_index

    emb = load_table(spark, sf_dir, "embeddings")
    path = _index_dir(sf_dir, "pq_v1")
    ensure_index(
        lambda: write_pq_index(emb, path, dim=64),
        os.path.join(path, "codes"),
        fingerprint=_fp_cached(spark, sf_dir, "emb", lambda: corpus_fingerprint(emb)),
    )
    return pq_knn_join(spark, emb.filter(F.col("vec_id") % 50 == 0), path, k=3)


def _build_ivfpq_oracle(
    dim: int = 64, m: int = 8, ks: int = 16, n_centroids: int = 16,
    nprobe: int = 1, k: int = 5,
) -> str:
    """x105's PQ lifecycle + the deterministic-IVF coarse chain (x12's
    quantizer): assignment by argmax fold-cosine, probe list selection
    by the same ranking, ADC restricted to the probed lists."""
    d = dim // m

    def foldsum(lst: str) -> str:
        return f"list_reduce(list_prepend(0.0, {lst}), (acc, x) -> acc + x)"

    def dot_sql(a: str, b: str) -> str:
        return foldsum(f"list_transform(list_zip({a}, {b}), p -> p[1] * p[2])")

    def l2sq_sql(a: str, b: str) -> str:
        return foldsum(
            f"list_transform(list_zip({a}, {b}), p -> (p[1] - p[2]) * (p[1] - p[2]))"
        )

    def sqn_sql(a: str) -> str:
        return foldsum(f"list_transform({a}, x -> x * x)")

    qsub = f"list_slice((SELECT qv FROM q), m*{d}+1, m*{d}+{d})"
    return f"""
    WITH e AS MATERIALIZED (SELECT vec_id, {_VEC} AS v FROM embeddings),
    q AS MATERIALIZED (SELECT {_QV_SQL} AS qv),
    ms AS (SELECT CAST(unnest(range({m})) AS INT) AS m),
    cb0 AS MATERIALIZED (SELECT v, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS code
                         FROM (SELECT * FROM e ORDER BY vec_id LIMIT {ks})),
    cbn AS MATERIALIZED (SELECT m, code, list_slice(v, m*{d}+1, m*{d}+{d}) AS cvec,
                                {sqn_sql(f'list_slice(v, m*{d}+1, m*{d}+{d})')} AS cn2
                         FROM cb0 CROSS JOIN ms),
    sv AS (SELECT vec_id, m, list_slice(v, m*{d}+1, m*{d}+{d}) AS sub FROM e CROSS JOIN ms),
    asg AS (SELECT vec_id, m, code, cn2,
                   row_number() OVER (PARTITION BY vec_id, m
                                      ORDER BY {l2sq_sql('sub', 'cvec')} ASC, code ASC) AS rn
            FROM sv JOIN cbn USING (m)),
    enc AS MATERIALIZED (SELECT vec_id, m, code, cn2 FROM asg WHERE rn = 1),
    rn1 AS (SELECT vec_id, list(cn2 ORDER BY m) AS cs FROM enc GROUP BY 1),
    rnv AS (SELECT vec_id, sqrt({foldsum('cs')}) AS recon_norm FROM rn1),
    dtq AS (SELECT m, code, {dot_sql(qsub, 'cvec')} AS p FROM cbn),
    sc1 AS (SELECT vec_id, list(p ORDER BY m) AS ps FROM enc JOIN dtq USING (m, code) GROUP BY 1),
    sc AS (SELECT vec_id, {foldsum('ps')} AS raw FROM sc1),
    qn AS (SELECT sqrt({sqn_sql('(SELECT qv FROM q)')}) AS qn),
    cents AS MATERIALIZED (SELECT vec_id AS centroid_id, v AS cvec
                           FROM (SELECT * FROM e ORDER BY vec_id LIMIT {n_centroids})),
    casgA AS (SELECT e.vec_id, c.centroid_id,
                     row_number() OVER (PARTITION BY e.vec_id
                                        ORDER BY {_cos_sql('e.v', 'c.cvec')} DESC,
                                                 c.centroid_id) AS rn
              FROM e CROSS JOIN cents c),
    casg AS (SELECT vec_id, centroid_id FROM casgA WHERE rn = 1),
    qc AS (SELECT centroid_id FROM cents
           ORDER BY {_cos_sql('cvec', '(SELECT qv FROM q)')} DESC, centroid_id
           LIMIT {nprobe})
    SELECT s.vec_id,
           CASE WHEN r.recon_norm > 0 AND qn.qn > 0
                THEN s.raw / (qn.qn * r.recon_norm) END AS cos_approx
    FROM sc s JOIN rnv r USING (vec_id) JOIN casg USING (vec_id)
              JOIN qc USING (centroid_id) CROSS JOIN qn
    ORDER BY cos_approx DESC NULLS LAST, vec_id LIMIT {k}
    """


@query("x107_ivfpq_probe", oracle=_build_ivfpq_oracle())
def x107_ivfpq_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF + PQ composite — pruned AND compressed (the FAISS IVFPQ
    layout, ``operators/pq.py:write_ivfpq_index``): codes partitioned
    by the deterministic coarse quantizer's argmax-cosine assignment
    (x12's chain, bit-identical), probed with a literal IN-list
    partition filter, each scanned row paying m table lookups on ~8
    code bytes.  At 100 TB this is the serving architecture: partition
    pruning bounds WHICH rows are scanned (exactly plain IVF's
    recall), PQ bounds the BYTES per scanned row — the two compose
    orthogonally and so do their oracle chains."""
    from ...operators.ann_index import corpus_fingerprint, ensure_index
    from ...operators.pq import ivfpq_probe, write_ivfpq_index

    emb = load_table(spark, sf_dir, "embeddings")
    qv = _query_vec(spark, sf_dir)
    path = _index_dir(sf_dir, "ivfpq_v1")
    ensure_index(
        lambda: write_ivfpq_index(emb, path, dim=64),
        os.path.join(path, "codes"),
        fingerprint=_fp_cached(spark, sf_dir, "emb", lambda: corpus_fingerprint(emb)),
    )
    return ivfpq_probe(spark, path, qv, k=5, nprobe=1)


def _build_pq_recall_oracle(
    dim: int = 64, m: int = 8, ks: int = 16, k: int = 5, modulus: int = 100
) -> str:
    """x106's batch-ADC chain and the exact-cosine chain over the same
    query batch, intersected per query: recall@k of the PQ codes
    against full-precision search."""
    approx = _build_pq_knn_oracle(dim=dim, m=m, ks=ks, k=k, modulus=modulus)
    # the exact side (knn_join_exact's twin)
    return f"""
    WITH ap AS MATERIALIZED ({approx}),
    e2 AS (SELECT vec_id, {_VEC} AS v FROM embeddings),
    q2 AS (SELECT vec_id AS q_id, v AS qv FROM e2 WHERE vec_id % {modulus} = 0),
    xj AS (SELECT q_id, e2.vec_id AS c_id, {_cos_sql('qv', 'v')} AS cos
           FROM q2 CROSS JOIN e2),
    xr AS (SELECT q_id, c_id,
                  row_number() OVER (PARTITION BY q_id
                                     ORDER BY cos DESC, c_id ASC) AS rn
           FROM xj),
    ex AS (SELECT q_id, c_id FROM xr WHERE rn <= {k}),
    hits AS (SELECT ap.q_id, CAST(count(*) AS BIGINT) AS n_hit
             FROM ap JOIN ex ON ap.q_id = ex.q_id AND ap.c_id = ex.c_id
             GROUP BY 1)
    SELECT q.q_id, CAST(coalesce(n_hit, 0) AS BIGINT) AS n_hit,
           CAST(coalesce(n_hit, 0) AS DOUBLE) / {k}.0 AS recall
    FROM (SELECT DISTINCT q_id FROM q2) q LEFT JOIN hits USING (q_id)
    """


@query("x108_pq_recall_audit", oracle=_build_pq_recall_oracle())
def x108_pq_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The accuracy cost of the PQ representation, measured under the
    oracle gate (the x92 convention, PQ edition): every 100th vector's
    ADC top-5 from the persisted codes (x106's join) intersected with
    its EXACT full-precision top-5 (``knn_join_exact``), recall@5 per
    query.  Queries whose ADC list misses everything still appear
    (recall 0.0 — a LEFT join against the query id set, never a
    silently dropped row).  At 100 TB this is the audit run on a
    sampled query budget after every index build — the number that
    tells you whether m/ks are sized right before serving traffic."""
    from ...operators.ann_index import corpus_fingerprint, ensure_index
    from ...operators.pq import pq_knn_join, write_pq_index
    from ...operators.similarity import knn_join_exact

    emb = load_table(spark, sf_dir, "embeddings")
    path = _index_dir(sf_dir, "pq_v1")
    ensure_index(
        lambda: write_pq_index(emb, path, dim=64),
        os.path.join(path, "codes"),
        fingerprint=_fp_cached(spark, sf_dir, "emb", lambda: corpus_fingerprint(emb)),
    )
    q = emb.filter(F.col("vec_id") % 100 == 0)
    approx = pq_knn_join(spark, q, path, k=5).select("q_id", "c_id")
    exact = knn_join_exact(q, emb, k=5).select("q_id", "c_id")
    hits = approx.join(exact, ["q_id", "c_id"]).groupBy("q_id").agg(
        F.count("*").cast("long").alias("n_hit")
    )
    qids = q.select(F.col("vec_id").alias("q_id")).distinct()
    return qids.join(hits, "q_id", "left").select(
        "q_id",
        F.coalesce(F.col("n_hit"), F.lit(0)).cast("long").alias("n_hit"),
        (F.coalesce(F.col("n_hit"), F.lit(0)).cast("double") / 5.0).alias("recall"),
    )


_PHRASE_ORACLE = """
    WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS l
               FROM documents),
    toks AS (SELECT doc_id, unnest(l) AS term, unnest(range(len(l))) AS pos FROM t),
    pp AS (SELECT doc_id, term, list(pos ORDER BY pos) AS positions
           FROM toks GROUP BY 1, 2),
    bg AS (SELECT unnest(list_transform(range(len(l) - 1), i -> l[i+1] || ' ' || l[i+2])) AS phrase
           FROM t WHERE len(l) >= 2),
    topb AS (SELECT phrase FROM (SELECT phrase, count(*) AS n FROM bg GROUP BY 1)
             ORDER BY n DESC, phrase ASC LIMIT 10),
    pw AS (SELECT phrase, split_part(phrase, ' ', 1) AS w1,
                  split_part(phrase, ' ', 2) AS w2 FROM topb),
    m AS (SELECT phrase, p1.doc_id,
                 CAST(len(list_filter(p1.positions,
                                      x -> list_contains(p2.positions, x + 1)))
                      AS BIGINT) AS phrase_tf
          FROM pw JOIN pp p1 ON p1.term = pw.w1
                  JOIN pp p2 ON p2.term = pw.w2 AND p2.doc_id = p1.doc_id),
    tk AS (SELECT phrase, doc_id, phrase_tf,
                  CAST(row_number() OVER (PARTITION BY phrase
                                          ORDER BY phrase_tf DESC, doc_id ASC) AS INT) AS rank
           FROM m WHERE phrase_tf > 0)
    SELECT phrase, doc_id, phrase_tf, rank FROM tk WHERE rank <= 3
"""


@query("x109_phrase_search", oracle=_PHRASE_ORACLE)
def x109_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phrase retrieval over POSITIONAL postings — the query
    class bag-of-words BM25 cannot express ("new york" != "york new"):
    for the corpus's 10 most frequent word bigrams (ties by phrase —
    deterministic workload), the top-3 documents by adjacent-occurrence
    count.  Positions aggregate once per (doc, term) (~1 int per token
    corpus-wide, the standard positional-index payload); the adjacency
    test is an array-op codegen filter over the two position lists —
    the position lists are never exploded; the phrase word set
    broadcasts so the doc-keyed self-join carries O(matched postings).
    x110 serves the identical results from the persisted positional
    index."""
    from ...operators.retrieval import phrase_search, top_bigram_phrases

    docs = load_table(spark, sf_dir, "documents")
    phrases = top_bigram_phrases(docs, n_phrases=10)
    return phrase_search(docs, phrases, k=3)


@query("x110_phrase_index_serve", oracle=_PHRASE_ORACLE)
def x110_phrase_index_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x109 served from the PERSISTED positional inverted index
    (``write_inverted_index(store_positions=True)`` — position arrays
    ride the same term-bucket-partitioned, term-sorted postings):
    oracle is x109's VERBATIM (the index changes the cost, never the
    result).  The phrase workload is the persisted corpus-derived
    top-10 (built once with the index); serving reads only the pruned
    postings for the phrase words."""
    from ...operators.ann_index import corpus_fingerprint, ensure_index
    from ...operators.retrieval import (
        phrase_search,
        top_bigram_phrases,
        write_inverted_index,
    )

    docs = load_table(spark, sf_dir, "documents")
    path = os.path.join(
        _tagged_dir(_SCRATCH, "bm25_index", "v2", sf_dir=sf_dir), "positional"
    )

    def build() -> None:
        write_inverted_index(docs, path, store_positions=True)
        top_bigram_phrases(docs, n_phrases=10).write.mode("overwrite").parquet(
            os.path.join(path, "phrases")
        )

    ensure_index(
        build,
        os.path.join(path, "stats"),
        fingerprint=_fp_cached(spark, sf_dir, "docs",
                                lambda: corpus_fingerprint(docs, id_col="doc_id")),
    )
    phrases = spark.read.parquet(os.path.join(path, "phrases"))
    # prune the postings scan to the phrase words' buckets + terms
    # (the bm25_serve pushdown pair, phrase edition)
    words = sorted(
        {w for r in phrases.collect() for w in r.phrase.split(" ")}
    )
    from ...operators.retrieval import term_bucket

    import pyspark.sql.functions as _F

    buckets = sorted(
        {
            r.b
            for r in spark.createDataFrame([(w,) for w in words], ["term"])
            .select(term_bucket(_F.col("term")).alias("b"))
            .collect()
        }
    )
    postings = spark.read.parquet(os.path.join(path, "postings")).filter(
        _F.col("term_bucket").isin(buckets) & _F.col("term").isin(words)
    )
    return phrase_search(docs, phrases, k=3, postings=postings)


def _build_ivfpq_residual_oracle(
    dim: int = 64, m: int = 8, ks: int = 16, n_centroids: int = 16,
    nprobe: int = 1, k: int = 5,
) -> str:
    """The residual-IVFPQ lifecycle: coarse assignment, residual
    codebook from the first-ks residuals, residual encode, EXACT
    reconstruction norms ||c + decode||, and ADC whose fold STARTS
    from the probed list's centroid dot (list_prepend mirrors Spark's
    aggregate initial accumulator)."""
    d = dim // m

    def foldsum(lst: str) -> str:
        return f"list_reduce(list_prepend(0.0, {lst}), (acc, x) -> acc + x)"

    def foldfrom(init: str, lst: str) -> str:
        return f"list_reduce(list_prepend({init}, {lst}), (acc, x) -> acc + x)"

    def dot_sql(a: str, b: str) -> str:
        return foldsum(f"list_transform(list_zip({a}, {b}), p -> p[1] * p[2])")

    def l2sq_sql(a: str, b: str) -> str:
        return foldsum(
            f"list_transform(list_zip({a}, {b}), p -> (p[1] - p[2]) * (p[1] - p[2]))"
        )

    def sqn_sql(a: str) -> str:
        return foldsum(f"list_transform({a}, x -> x * x)")

    qsub = f"list_slice((SELECT qv FROM q), m*{d}+1, m*{d}+{d})"
    return f"""
    WITH e AS MATERIALIZED (SELECT vec_id, {_VEC} AS v FROM embeddings),
    q AS MATERIALIZED (SELECT {_QV_SQL} AS qv),
    ms AS (SELECT CAST(unnest(range({m})) AS INT) AS m),
    cents AS MATERIALIZED (SELECT vec_id AS centroid_id, v AS cvec
                           FROM (SELECT * FROM e ORDER BY vec_id LIMIT {n_centroids})),
    casgA AS (SELECT e.vec_id, c.centroid_id,
                     row_number() OVER (PARTITION BY e.vec_id
                                        ORDER BY {_cos_sql('e.v', 'c.cvec')} DESC,
                                                 c.centroid_id) AS rn
              FROM e CROSS JOIN cents c),
    casg AS MATERIALIZED (SELECT vec_id, centroid_id FROM casgA WHERE rn = 1),
    res AS MATERIALIZED (SELECT e.vec_id, casg.centroid_id,
                                list_transform(list_zip(e.v, c.cvec), p -> p[1] - p[2]) AS rv,
                                c.cvec
                         FROM e JOIN casg USING (vec_id) JOIN cents c USING (centroid_id)),
    rcb0 AS MATERIALIZED (SELECT rv, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS code
                          FROM (SELECT * FROM res ORDER BY vec_id LIMIT {ks})),
    rcbn AS MATERIALIZED (SELECT m, code, list_slice(rv, m*{d}+1, m*{d}+{d}) AS rcvec
                          FROM rcb0 CROSS JOIN ms),
    sv AS (SELECT vec_id, m, list_slice(rv, m*{d}+1, m*{d}+{d}) AS sub,
                  list_slice(cvec, m*{d}+1, m*{d}+{d}) AS csub
           FROM res CROSS JOIN ms),
    asg AS (SELECT vec_id, m, code, csub, rcvec,
                   row_number() OVER (PARTITION BY vec_id, m
                                      ORDER BY {l2sq_sql('sub', 'rcvec')} ASC, code ASC) AS rn
            FROM sv JOIN rcbn USING (m)),
    enc AS MATERIALIZED (SELECT vec_id, m, code,
                                {sqn_sql("list_transform(list_zip(csub, rcvec), p -> p[1] + p[2])")} AS cn2
                         FROM asg WHERE rn = 1),
    rn1 AS (SELECT vec_id, list(cn2 ORDER BY m) AS cs FROM enc GROUP BY 1),
    rnv AS (SELECT vec_id, sqrt({foldsum('cs')}) AS recon_norm FROM rn1),
    dtq AS (SELECT m, code, {dot_sql(qsub, 'rcvec')} AS p FROM rcbn),
    qcd AS (SELECT centroid_id, {dot_sql('(SELECT qv FROM q)', 'cvec')} AS qc FROM cents),
    qc AS (SELECT centroid_id FROM cents
           ORDER BY {_cos_sql('cvec', '(SELECT qv FROM q)')} DESC, centroid_id
           LIMIT {nprobe}),
    sc1 AS (SELECT vec_id, list(p ORDER BY m) AS ps FROM enc JOIN dtq USING (m, code) GROUP BY 1),
    sc AS (SELECT s.vec_id, {foldfrom('qcd.qc', 's.ps')} AS raw
           FROM sc1 s JOIN casg USING (vec_id) JOIN qcd USING (centroid_id)),
    qn AS (SELECT sqrt({sqn_sql('(SELECT qv FROM q)')}) AS qn)
    SELECT s.vec_id,
           CASE WHEN r.recon_norm > 0 AND qn.qn > 0
                THEN s.raw / (qn.qn * r.recon_norm) END AS cos_approx
    FROM sc s JOIN rnv r USING (vec_id) JOIN casg USING (vec_id)
              JOIN qc USING (centroid_id) CROSS JOIN qn
    ORDER BY cos_approx DESC NULLS LAST, vec_id LIMIT {k}
    """


@query("x111_ivfpq_residual_probe", oracle=_build_ivfpq_residual_oracle())
def x111_ivfpq_residual_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Residual-encoded IVFPQ — the CLASSIC form (codes quantize
    v - c(v) against a residual codebook; stored norms are the exact
    ||c + decode||; the ADC fold's initial accumulator is the probed
    list's centroid dot).  Registered alongside the raw-vector
    composite (x107) because the two trade places by corpus geometry:
    residuals shrink on genuinely clustered embeddings (classic wins),
    but on isotropic synthetic vectors c(v) is nearly orthogonal to v
    and the residual is no smaller — the recall audit machinery
    (x108) is how a real corpus chooses.  Whole lifecycle under the
    oracle gate including the fold-from-centroid-dot scoring."""
    from ...operators.ann_index import corpus_fingerprint, ensure_index
    from ...operators.pq import ivfpq_residual_probe, write_ivfpq_residual_index

    emb = load_table(spark, sf_dir, "embeddings")
    qv = _query_vec(spark, sf_dir)
    path = _index_dir(sf_dir, "ivfpq_res_v1")
    ensure_index(
        lambda: write_ivfpq_residual_index(emb, path, dim=64),
        os.path.join(path, "codes"),
        fingerprint=_fp_cached(spark, sf_dir, "emb", lambda: corpus_fingerprint(emb)),
    )
    return ivfpq_residual_probe(spark, path, qv, k=5, nprobe=1)


_PROXIMITY_ORACLE = """
    WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS l
               FROM documents),
    toks AS (SELECT doc_id, unnest(l) AS term, unnest(range(len(l))) AS pos FROM t),
    pp AS (SELECT doc_id, term, list(pos ORDER BY pos) AS positions
           FROM toks GROUP BY 1, 2),
    bg AS (SELECT unnest(list_transform(range(len(l) - 1), i -> l[i+1] || ' ' || l[i+2])) AS phrase
           FROM t WHERE len(l) >= 2),
    topb AS (SELECT phrase FROM (SELECT phrase, count(*) AS n FROM bg GROUP BY 1)
             ORDER BY n DESC, phrase ASC LIMIT 10),
    pw AS (SELECT phrase, split_part(phrase, ' ', 1) AS w1,
                  split_part(phrase, ' ', 2) AS w2 FROM topb),
    m AS (SELECT phrase, p1.doc_id,
                 CAST(len(list_filter(p1.positions,
                                      x -> len(list_filter(p2.positions,
                                                           y -> y > x AND y <= x + 3)) > 0))
                      AS BIGINT) AS phrase_tf
          FROM pw JOIN pp p1 ON p1.term = pw.w1
                  JOIN pp p2 ON p2.term = pw.w2 AND p2.doc_id = p1.doc_id),
    tk AS (SELECT phrase, doc_id, phrase_tf,
                  CAST(row_number() OVER (PARTITION BY phrase
                                          ORDER BY phrase_tf DESC, doc_id ASC) AS INT) AS rank
           FROM m WHERE phrase_tf > 0)
    SELECT phrase, doc_id, phrase_tf, rank FROM tk WHERE rank <= 3
"""


@query("x112_proximity_search", oracle=_PROXIMITY_ORACLE)
def x112_proximity_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x109's adjacency widened to a PROXIMITY window (slop=3: w2
    within three positions after w1 — the "new [york] state" query
    class): same positional postings, same broadcast-workload plan,
    the window test still an array-op codegen filter with the
    position lists never exploded.  phrase_tf counts w1 occurrences
    with any in-window w2, so slop=1 degenerates to x109 exactly
    (pinned by the shared operator)."""
    from ...operators.retrieval import phrase_search, top_bigram_phrases

    docs = load_table(spark, sf_dir, "documents")
    phrases = top_bigram_phrases(docs, n_phrases=10)
    return phrase_search(docs, phrases, k=3, slop=3)


@query(
    "x113_collocations",
    oracle="""
    WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS l
               FROM documents),
    toks AS (SELECT doc_id, unnest(l) AS term FROM t),
    bgr AS (SELECT unnest(list_transform(range(len(l) - 1), i -> l[i+1] || ' ' || l[i+2])) AS phrase
            FROM t WHERE len(l) >= 2),
    bg AS (SELECT phrase, CAST(count(*) AS BIGINT) AS cxy FROM bgr GROUP BY 1),
    nbt AS (SELECT CAST(coalesce(sum(cxy), 0) AS BIGINT) AS nb FROM bg),
    uni AS (SELECT term, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY 1),
    ntt AS (SELECT CAST(coalesce(sum(c), 0) AS BIGINT) AS nt FROM uni),
    cand AS (SELECT phrase, cxy, split_part(phrase, ' ', 1) AS w1,
                    split_part(phrase, ' ', 2) AS w2
             FROM bg WHERE cxy >= 5),
    j AS (SELECT phrase, cxy, ux.c AS cx, uy.c AS cy
          FROM cand JOIN uni ux ON ux.term = cand.w1
                    JOIN uni uy ON uy.term = cand.w2),
    sc AS (SELECT phrase, cxy AS n,
                  ((CAST(cxy AS DOUBLE) * CAST(nt AS DOUBLE)) * CAST(nt AS DOUBLE))
                  / ((CAST(nb AS DOUBLE) * CAST(cx AS DOUBLE)) * CAST(cy AS DOUBLE)) AS lift
           FROM j CROSS JOIN ntt CROSS JOIN nbt),
    tk AS (SELECT phrase, n, lift FROM sc ORDER BY lift DESC, phrase ASC LIMIT 20)
    SELECT phrase, n, lift,
           CAST(row_number() OVER (ORDER BY lift DESC, phrase ASC) AS INT) AS rank
    FROM tk
    """,
)
def x113_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PMI-lift collocation mining: the corpus's 20 most associated
    word pairs by c(xy)·Nt²/(Nb·c(x)·c(y)) at min_count=5 (the
    low-count screen) — the phrase-discovery complement of x109's
    phrase RETRIEVAL (mine the collocations, then serve them as phrase
    queries).  The score is a fixed-order float product chain: with no
    summation, every op is correctly rounded and engines cannot
    disagree (log-PMI would be a monotone transform of the same
    ranking per pair).  Count tables are the x80 bigram class;
    persisted-snapshot remedy documented."""
    from ...operators.retrieval import collocations

    docs = load_table(spark, sf_dir, "documents")
    return collocations(docs, n_top=20, min_count=5)


def _build_pq_refine_oracle(
    dim: int = 64, m: int = 8, ks: int = 16, k: int = 3,
    k_shortlist: int = 10, modulus: int = 50,
) -> str:
    """x106's batch-ADC chain at shortlist depth, then the exact-cosine
    rerank over only the shortlisted (q, candidate) pairs — the same
    sequential folds as ``similarity.knn_join_exact``."""
    shortlist = _build_pq_knn_oracle(dim=dim, m=m, ks=ks, k=k_shortlist, modulus=modulus)

    def foldsum(lst: str) -> str:
        return f"list_reduce(list_prepend(0.0, {lst}), (acc, x) -> acc + x)"

    dot_qc = foldsum("list_transform(list_zip(qv, v), p -> p[1] * p[2])")
    qn = f"sqrt({foldsum('list_transform(qv, x -> x * x)')})"
    cn = f"sqrt({foldsum('list_transform(v, x -> x * x)')})"
    return f"""
    WITH sh AS MATERIALIZED ({shortlist}),
    e2 AS (SELECT vec_id, {_VEC} AS v FROM embeddings),
    qv2 AS (SELECT vec_id AS q_id, v AS qv FROM e2 WHERE vec_id % {modulus} = 0),
    ex AS (SELECT sh.q_id, sh.c_id,
                  CASE WHEN {qn} > 0 AND {cn} > 0
                       THEN {dot_qc} / ({qn} * {cn}) END AS cos_exact
           FROM sh JOIN qv2 ON qv2.q_id = sh.q_id
                   JOIN e2 ON e2.vec_id = sh.c_id),
    rk AS (SELECT q_id, c_id, cos_exact,
                  CAST(row_number() OVER (PARTITION BY q_id
                                          ORDER BY cos_exact DESC NULLS LAST, c_id ASC) AS INT) AS rn
           FROM ex)
    SELECT q_id, c_id, cos_exact, rn FROM rk WHERE rn <= {k}
    """


@query("x114_pq_refine_knn", oracle=_build_pq_refine_oracle())
def x114_pq_refine_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage retrieval: PQ shortlist, exact rerank (the classic
    refine step — FAISS's IndexRefineFlat shape): stage 1 is x106's
    batch ADC join at shortlist depth 10 (the corpus pass reads ~8
    code bytes + a double per vector), stage 2 fetches ONLY the
    shortlisted candidates' full-precision vectors (a broadcast
    semi-join of O(batch*10) ids against the float table) and reranks
    by exact sequential-fold cosine, top-3 per query.  The rerank
    erases the quantizer's ranking error WITHIN the shortlist; recall
    is bounded by shortlist membership, which the x108 audit measures.
    At 100 TB this is the standard serving stack: compressed scan for
    candidates, exact arithmetic for the final order, float bytes read
    proportional to the batch — never the corpus."""
    from ...operators.ann_index import corpus_fingerprint, ensure_index
    from ...operators.pq import pq_refine_knn_join, write_pq_index

    emb = load_table(spark, sf_dir, "embeddings")
    path = _index_dir(sf_dir, "pq_v1")
    ensure_index(
        lambda: write_pq_index(emb, path, dim=64),
        os.path.join(path, "codes"),
        fingerprint=_fp_cached(spark, sf_dir, "emb", lambda: corpus_fingerprint(emb)),
    )
    return pq_refine_knn_join(
        spark, emb.filter(F.col("vec_id") % 50 == 0), emb, path, k=3, k_shortlist=10
    )


_PRF_ORACLE = f"""
    WITH {_BM25_TABLES},
    qtf AS (SELECT doc_id AS query_id, term, tf FROM tf WHERE doc_id % 50 = 0),
    qs AS (SELECT query_id, q.term,
                  CAST(q.tf AS DOUBLE) / CAST(d.df AS DOUBLE) AS s
           FROM qtf q JOIN dfx d USING (term)),
    qt AS (SELECT query_id, term FROM (
             SELECT query_id, term,
                    row_number() OVER (PARTITION BY query_id
                                       ORDER BY s DESC, term ASC) AS rn
             FROM qs) WHERE rn <= 3),
    m1 AS (SELECT qt.query_id, tf.doc_id, tf.tf, dl.dl, dfx.df
           FROM qt JOIN tf USING (term) JOIN dl USING (doc_id) JOIN dfx USING (term)),
    sc1 AS (SELECT query_id, m1.doc_id,
                   CAST(sum(  ((1024 * (2*n - 2*df + 1)) // (2*df + 1))
                            * ((1024 * 22 * tf * avgdl_fp)
                               // (10 * tf * avgdl_fp + 3 * avgdl_fp + 9 * dl * 1024))
                         ) AS BIGINT) AS score_fp
            FROM m1 CROSS JOIN a GROUP BY 1, 2),
    r1 AS (SELECT query_id, doc_id FROM (
             SELECT query_id, doc_id,
                    row_number() OVER (PARTITION BY query_id
                                       ORDER BY score_fp DESC, doc_id ASC) AS rank
             FROM sc1) WHERE rank <= 3),
    cand AS (SELECT r1.query_id, tf.term, CAST(sum(tf.tf) AS BIGINT) AS w2
             FROM r1 JOIN tf USING (doc_id) GROUP BY 1, 2),
    cand2 AS (SELECT c.query_id, c.term, c.w2 FROM cand c
              LEFT JOIN qt ON qt.query_id = c.query_id AND qt.term = c.term
              WHERE qt.term IS NULL),
    expd AS (SELECT query_id, term FROM (
              SELECT c.query_id, c.term,
                     row_number() OVER (PARTITION BY c.query_id
                                        ORDER BY c.w2 * ((1024 * (2*a.n - 2*d.df + 1))
                                                         // (2*d.df + 1)) DESC,
                                                 c.term ASC) AS rn
              FROM cand2 c JOIN dfx d USING (term) CROSS JOIN a) WHERE rn <= 2),
    q2 AS (SELECT query_id, term FROM qt
           UNION ALL SELECT query_id, term FROM expd),
    m AS (SELECT q2.query_id, tf.doc_id, tf.tf, dl.dl, dfx.df
          FROM q2 JOIN tf USING (term) JOIN dl USING (doc_id) JOIN dfx USING (term)),
    {_BM25_SCORE_TOPK}
    SELECT query_id, doc_id, score_fp, rank,
           CAST(score_fp AS DOUBLE) / 1048576.0 AS score
    FROM tk WHERE rank <= 5
"""


@query("x115_prf_expansion", oracle=_PRF_ORACLE)
def x115_prf_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pseudo-relevance-feedback retrieval (Rocchio-style, integer-
    exact): x101's workload runs once, each query's top-3 documents
    are presumed relevant, the 2 strongest feedback terms join the
    query (weight = summed tf x the chain's integer idf — Rocchio's
    idf weighting, all int64, not RM3's float mixtures; the tf-only
    weight elects stop-words and hands a query's top-k window an
    entire stop-word posting list — measured 93 s -> ~3 s at x100,
    operator docstring), and the EXPANDED workload scores the corpus
    again for the final top-5 — the classic vocabulary-mismatch fix,
    two passes total.  Scale shape: the feedback set is O(batch*3)
    ids whose term frequencies come off the FORWARD index
    (``fetch_doc_terms`` — doc-bucket partition IN-list + sorted-file
    row-group skipping; no corpus semi-join, no re-tokenization, tf
    bit-equal by the shared-tokenization build);
    candidate df comes off the index's denormalized postings column
    (``index_df_stats`` — never the corpus); both scoring passes
    carry O(matched postings); the
    expanded workload is materialized once (the x100 multi-consumer
    rule).  BOTH retrieval passes run through the PERSISTED inverted
    index (``bm25_serve`` — bit-equal to in-flight scoring by the x102
    contract, so the oracle is the in-flight chain verbatim): the
    workload contract is (query_id, term) rows either way, and the
    index is the shared x102 build (amortized via ensure_index).

    Round 9 (r8 verdict item 7): the EXPANDED workload is itself a
    derived artifact — a (query_id, term) table of O(batch·5) rows
    fully determined by the corpus — so round 1 + the feedback
    expansion run inside the ensure_index build (same chain verbatim,
    bit-equal by construction) and persist next to the index; the
    per-run gate work is ONE serve pass over the persisted workload.
    At 100 TB this is the standing-query-rewrite nightly: expansion
    re-derives only when the corpus fingerprint moves."""
    from ...operators.ann_index import corpus_fingerprint, ensure_index
    from ...operators.retrieval import (
        bm25_serve,
        fetch_doc_terms,
        index_df_stats,
        materialize_queries,
        prf_expand_queries,
        top_terms_from_index,
        write_forward_index,
        write_inverted_index,
    )

    docs = load_table(spark, sf_dir, "documents")
    path = os.path.join(_tagged_dir(_SCRATCH, "bm25_index", "v2", sf_dir=sf_dir), "full")
    ensure_index(
        lambda: write_inverted_index(docs, path),
        os.path.join(path, "stats"),
        fingerprint=_fp_cached(spark, sf_dir, "docs",
                                lambda: corpus_fingerprint(docs, id_col="doc_id")),
    )
    fpath = os.path.join(
        _tagged_dir(_SCRATCH, "bm25_forward", "v1", sf_dir=sf_dir), "full"
    )
    ensure_index(
        lambda: write_forward_index(docs, fpath),
        os.path.join(fpath, "forward"),
        fingerprint=_fp_cached(spark, sf_dir, "docs",
                                lambda: corpus_fingerprint(docs, id_col="doc_id")),
    )
    epath = os.path.join(
        _tagged_dir(_SCRATCH, "bm25_prf", "v1", sf_dir=sf_dir), "expanded"
    )

    def build_expanded() -> None:
        queries = materialize_queries(
            top_terms_from_index(spark, path, F.col("doc_id") % 50 == 0, n_terms=3)
        )
        serve = lambda q, k: bm25_serve(spark, q, path, k=k)  # noqa: E731
        prf_expand_queries(
            docs, queries, fb_k=3, n_expand=2, retrieve=serve,
            df_stats=index_df_stats(spark, path),
            fetch_tf=lambda ids: fetch_doc_terms(spark, fpath, ids),
        ).write.mode("overwrite").parquet(epath)

    ensure_index(
        build_expanded,
        epath,
        fingerprint=_fp_cached(spark, sf_dir, "docs",
                                lambda: corpus_fingerprint(docs, id_col="doc_id")),
    )
    expanded = materialize_queries(spark.read.parquet(epath))
    return bm25_serve(spark, expanded, path, k=5)


@query("x116_index_compaction", oracle=_BM25_TOPK_ORACLE)
def x116_index_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LSM lifecycle for the inverted index: two disjoint
    generations land in the segmented per-batch_id layout
    (``land_inverted_batch`` — the same implementation foreachBatch
    wraps), ``compact_inverted_index`` merges them into the batch
    layout (one linear pass re-derives the global df, rewrites
    bucket-aligned term-sorted files, collapses per-batch stats), and
    the compacted index serves x101's workload on the STORED-df fast
    path.  Oracle is x101's VERBATIM: segmentation + compaction
    change cost and layout, never results.  At 100 TB this is the
    nightly amortized job that keeps serving free of per-probe df
    derivation while ingest stays streaming; compaction is also where
    the index RE-BUCKETS as vocabulary grows (n_buckets is recomputed
    from terms, not read from the layout — the blocking-key rule)."""
    from ...operators.ann_index import corpus_fingerprint, ensure_index
    from ...operators.retrieval import (
        bm25_serve,
        compact_inverted_index,
        land_inverted_batch,
        top_terms_from_index,
    )

    docs = load_table(spark, sf_dir, "documents")
    root = _tagged_dir(_SCRATCH, "bm25_index", "v2", sf_dir=sf_dir)
    seg, comp = os.path.join(root, "segmented"), os.path.join(root, "compacted")

    def build() -> None:
        land_inverted_batch(docs.filter(F.col("doc_id") < 250), seg, 0)
        land_inverted_batch(docs.filter(F.col("doc_id") >= 250), seg, 1)
        compact_inverted_index(spark, seg, comp)

    ensure_index(
        build,
        os.path.join(comp, "stats"),
        fingerprint=_fp_cached(spark, sf_dir, "docs",
                                lambda: corpus_fingerprint(docs, id_col="doc_id")),
    )
    queries = top_terms_from_index(spark, comp, F.col("doc_id") % 50 == 0, n_terms=3)
    return bm25_serve(spark, queries, comp, k=5)


_SNIPPET_ORACLE = f"""
    WITH {_BM25_TABLES},
    qtf AS (SELECT doc_id AS query_id, term, tf FROM tf WHERE doc_id % 50 = 0),
    qs AS (SELECT query_id, q.term,
                  CAST(q.tf AS DOUBLE) / CAST(d.df AS DOUBLE) AS s
           FROM qtf q JOIN dfx d USING (term)),
    qt AS (SELECT query_id, term FROM (
             SELECT query_id, term,
                    row_number() OVER (PARTITION BY query_id
                                       ORDER BY s DESC, term ASC) AS rn
             FROM qs) WHERE rn <= 3),
    m AS (SELECT qt.query_id, tf.doc_id, tf.tf, dl.dl, dfx.df
          FROM qt JOIN tf USING (term) JOIN dl USING (doc_id) JOIN dfx USING (term)),
    {_BM25_SCORE_TOPK},
    hits AS (SELECT query_id, doc_id FROM tk WHERE rank <= 3),
    ptoks AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term,
                     CAST(unnest(range(len(regexp_extract_all(lower(text), '[a-z]+')))) AS INT) AS pos
              FROM documents),
    mt AS (SELECT qt.query_id, p.doc_id, p.pos
           FROM ptoks p JOIN qt USING (term) JOIN hits USING (query_id, doc_id)),
    wcnt AS (SELECT query_id, doc_id, pos,
                    CAST(count(*) OVER (PARTITION BY query_id, doc_id ORDER BY pos
                                        RANGE BETWEEN CURRENT ROW AND 7 FOLLOWING)
                         AS BIGINT) AS n_hits
             FROM mt),
    best AS (SELECT query_id, doc_id, pos AS start, n_hits,
                    row_number() OVER (PARTITION BY query_id, doc_id
                                       ORDER BY n_hits DESC, pos ASC) AS rn
             FROM wcnt)
    SELECT query_id, doc_id, start, n_hits FROM best WHERE rn = 1
"""


@query("x117_snippet_extraction", oracle=_SNIPPET_ORACLE)
def x117_snippet_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best-window snippet extraction over x101's top-3 hits: for each
    retrieved (query, doc) pair, the 8-token window start covering the
    most query-term occurrences (ties earliest — total order) — the
    highlighting step after top-k, as a distributed operator.  Only
    HIT docs tokenize (broadcast semi-join of O(batch*k) ids);
    candidate starts are exactly the matched positions; scoring is one
    integer RANGE-frame count window + one argmax window over
    O(matched occurrences) rows.  No floats: the whole result is
    integer columns under the oracle gate.  The workload and top-3
    hits come off the PERSISTED index (bm25_serve — bit-equal by the
    x102 contract, so the oracle stays the in-flight chain); only the
    hit docs themselves tokenize for positions."""
    from ...operators.ann_index import corpus_fingerprint, ensure_index
    from ...operators.retrieval import (
        best_window_snippets,
        bm25_serve,
        materialize_queries,
        top_terms_from_index,
        write_inverted_index,
    )

    docs = load_table(spark, sf_dir, "documents")
    path = os.path.join(_tagged_dir(_SCRATCH, "bm25_index", "v2", sf_dir=sf_dir), "full")
    ensure_index(
        lambda: write_inverted_index(docs, path),
        os.path.join(path, "stats"),
        fingerprint=_fp_cached(spark, sf_dir, "docs",
                                lambda: corpus_fingerprint(docs, id_col="doc_id")),
    )
    queries = materialize_queries(
        top_terms_from_index(spark, path, F.col("doc_id") % 50 == 0, n_terms=3)
    )
    hits = materialize_queries(
        bm25_serve(spark, queries, path, k=3).select("query_id", "doc_id")
    )
    return best_window_snippets(docs, queries, hits, width=8)


def _build_opq_oracle(
    dim: int = 64, m: int = 8, ks: int = 16, k: int = 5, sample_n: int = 256
) -> str:
    """x105's PQ lifecycle over PERMUTED vectors: the variance-balanced
    snake permutation (energy = per-dim sum of squares over the first
    ``sample_n`` vectors, folded in id order — Python/Spark/DuckDB
    bit-equal), then the identical codebook/encode/ADC chain with e/q
    swapped for their permuted forms (operators/pq.py:write_opq_index /
    opq_adc_probe)."""
    d = dim // m

    def foldsum(lst: str) -> str:
        return f"list_reduce(list_prepend(0.0, {lst}), (acc, x) -> acc + x)"

    def dot_sql(a: str, b: str) -> str:
        return foldsum(f"list_transform(list_zip({a}, {b}), p -> p[1] * p[2])")

    def l2sq_sql(a: str, b: str) -> str:
        return foldsum(
            f"list_transform(list_zip({a}, {b}), p -> (p[1] - p[2]) * (p[1] - p[2]))"
        )

    def sqn_sql(a: str) -> str:
        return foldsum(f"list_transform({a}, x -> x * x)")

    qsub = f"list_slice((SELECT qv FROM q), m*{d}+1, m*{d}+{d})"
    return f"""
    WITH e0 AS MATERIALIZED (SELECT vec_id, {_VEC} AS v FROM embeddings),
    samp AS (SELECT vec_id, v FROM e0 ORDER BY vec_id LIMIT {sample_n}),
    dims AS (SELECT CAST(unnest(range({dim})) AS INT) AS dim),
    en AS (SELECT dim,
                  list_reduce(list_prepend(0.0, list(v[dim+1] * v[dim+1] ORDER BY vec_id)),
                              (acc, x) -> acc + x) AS energy
           FROM samp CROSS JOIN dims GROUP BY dim),
    rk AS (SELECT dim, CAST(row_number() OVER (ORDER BY energy DESC, dim ASC) - 1 AS INT) AS r
           FROM en),
    al AS (SELECT dim, r,
                  CASE WHEN (r // {m}) % 2 = 0 THEN r % {m} ELSE {m - 1} - (r % {m}) END AS sub
           FROM rk),
    pr AS (SELECT list(dim ORDER BY sub ASC, r ASC) AS perm FROM al),
    e AS MATERIALIZED (SELECT vec_id,
                              list_transform((SELECT perm FROM pr), i -> v[i+1]) AS v
                       FROM e0),
    q AS MATERIALIZED (SELECT list_transform((SELECT perm FROM pr), i -> qv0[i+1]) AS qv
                       FROM (SELECT {_QV_SQL} AS qv0)),
    ms AS (SELECT CAST(unnest(range({m})) AS INT) AS m),
    cb0 AS MATERIALIZED (SELECT v, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS code
                         FROM (SELECT * FROM e ORDER BY vec_id LIMIT {ks})),
    cbn AS MATERIALIZED (SELECT m, code, list_slice(v, m*{d}+1, m*{d}+{d}) AS cvec,
                                {sqn_sql(f'list_slice(v, m*{d}+1, m*{d}+{d})')} AS cn2
                         FROM cb0 CROSS JOIN ms),
    sv AS (SELECT vec_id, m, list_slice(v, m*{d}+1, m*{d}+{d}) AS sub FROM e CROSS JOIN ms),
    asg AS (SELECT vec_id, m, code, cn2,
                   row_number() OVER (PARTITION BY vec_id, m
                                      ORDER BY {l2sq_sql('sub', 'cvec')} ASC, code ASC) AS rn
            FROM sv JOIN cbn USING (m)),
    enc AS MATERIALIZED (SELECT vec_id, m, code, cn2 FROM asg WHERE rn = 1),
    rn1 AS (SELECT vec_id, list(cn2 ORDER BY m) AS cs FROM enc GROUP BY 1),
    rnv AS (SELECT vec_id, sqrt({foldsum('cs')}) AS recon_norm FROM rn1),
    dt AS (SELECT m, code, {dot_sql(qsub, 'cvec')} AS p FROM cbn),
    sc1 AS (SELECT vec_id, list(p ORDER BY m) AS ps FROM enc JOIN dt USING (m, code) GROUP BY 1),
    sc AS (SELECT vec_id, {foldsum('ps')} AS raw FROM sc1),
    qn AS (SELECT sqrt({sqn_sql('(SELECT qv FROM q)')}) AS qn)
    SELECT s.vec_id,
           CASE WHEN r.recon_norm > 0 AND qn.qn > 0
                THEN s.raw / (qn.qn * r.recon_norm) END AS cos_approx
    FROM sc s JOIN rnv r USING (vec_id) CROSS JOIN qn
    ORDER BY cos_approx DESC NULLS LAST, vec_id LIMIT {k}
    """


@query("x118_opq_probe", oracle=_build_opq_oracle())
def x118_opq_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPQ-lite: product quantization over a variance-BALANCED
    dimension permutation (the structured stand-in for OPQ's learned
    rotation — Ge et al. 2013; a permutation IS an orthogonal rotation
    with {0,1} entries, so inner products/norms are invariant and ADC
    semantics unchanged).  The permutation ranks dimensions by energy
    over a bounded deterministic sample (first 256 by id, id-ordered
    fold — bit-equal in Python/Spark/DuckDB) and snake-deals them to
    the m subspaces, so no codebook wastes its ks entries on a block
    of near-constant dims.  Persisted with the index as its rotation
    parameter (the frozen-quantizer contract extended to the
    transform); the probe permutes the QUERY driver-side and runs the
    x105 scan unchanged.  Whole lifecycle — sample, permutation,
    encode, ADC — under the oracle gate."""
    from ...operators.ann_index import corpus_fingerprint, ensure_index
    from ...operators.pq import opq_adc_probe, write_opq_index

    emb = load_table(spark, sf_dir, "embeddings")
    qv = _query_vec(spark, sf_dir)
    path = _index_dir(sf_dir, "opq_v1")
    ensure_index(
        lambda: write_opq_index(emb, path, dim=64),
        os.path.join(path, "codes"),
        fingerprint=_fp_cached(spark, sf_dir, "emb", lambda: corpus_fingerprint(emb)),
    )
    return opq_adc_probe(spark, path, qv, k=5)


_DIVERSIFIED_ORACLE = f"""
    WITH {_BM25_TABLES},
    qtf AS (SELECT doc_id AS query_id, term, tf FROM tf WHERE doc_id % 50 = 0),
    qs AS (SELECT query_id, q.term,
                  CAST(q.tf AS DOUBLE) / CAST(d.df AS DOUBLE) AS s
           FROM qtf q JOIN dfx d USING (term)),
    qt AS (SELECT query_id, term FROM (
             SELECT query_id, term,
                    row_number() OVER (PARTITION BY query_id
                                       ORDER BY s DESC, term ASC) AS rn
             FROM qs) WHERE rn <= 3),
    m AS (SELECT qt.query_id, tf.doc_id, tf.tf, dl.dl, dfx.df
          FROM qt JOIN tf USING (term) JOIN dl USING (doc_id) JOIN dfx USING (term)),
    {_BM25_SCORE_TOPK},
    short AS (SELECT query_id, doc_id, score_fp FROM tk WHERE rank <= 20),
    wg AS (SELECT s.query_id, s.doc_id, s.score_fp,
                  coalesce(d.source, CAST(s.doc_id AS VARCHAR)) AS grp
           FROM short s LEFT JOIN documents d USING (doc_id)),
    capd AS (SELECT query_id, doc_id, score_fp, grp,
                    row_number() OVER (PARTITION BY query_id, grp
                                       ORDER BY score_fp DESC, doc_id ASC) AS gr
             FROM wg),
    fin AS (SELECT query_id, doc_id, score_fp, grp,
                   CAST(row_number() OVER (PARTITION BY query_id
                                           ORDER BY score_fp DESC, doc_id ASC) AS INT) AS rank
            FROM capd WHERE gr <= 2)
    SELECT query_id, doc_id, score_fp, grp, rank FROM fin WHERE rank <= 5
"""


@query("x119_diversified_topk", oracle=_DIVERSIFIED_ORACLE)
def x119_diversified_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Result diversification by per-group caps (host crowding): the
    top-20 BM25 shortlist per query reranks to a top-5 allowing at
    most 2 documents per source domain — the production form of search
    diversification (MMR's greedy float trade-off is order-dependent;
    the cap is deterministic, integer-only, and what web search
    ships).  Two windows over the O(batch*20) shortlist: rank within
    (query, group), keep <= cap, re-rank per query.  The shortlist
    comes off the persisted index (bm25_serve, bit-equal by the x102
    contract — oracle stays the in-flight chain); the group map is the
    documents dimension joined by doc_id."""
    from ...operators.ann_index import corpus_fingerprint, ensure_index
    from ...operators.retrieval import (
        bm25_serve,
        diversified_topk,
        materialize_queries,
        top_terms_from_index,
        write_inverted_index,
    )

    docs = load_table(spark, sf_dir, "documents")
    path = os.path.join(_tagged_dir(_SCRATCH, "bm25_index", "v2", sf_dir=sf_dir), "full")
    ensure_index(
        lambda: write_inverted_index(docs, path),
        os.path.join(path, "stats"),
        fingerprint=_fp_cached(spark, sf_dir, "docs",
                                lambda: corpus_fingerprint(docs, id_col="doc_id")),
    )
    queries = materialize_queries(
        top_terms_from_index(spark, path, F.col("doc_id") % 50 == 0, n_terms=3)
    )
    short = bm25_serve(spark, queries, path, k=20).select(
        "query_id", "doc_id", "score_fp"
    )
    return diversified_topk(
        short, docs.select("doc_id", "source"), k=5, cap=2, group_col="source"
    )


_BM25F_ORACLE = """
    WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS l
               FROM documents),
    toksp AS (SELECT doc_id, unnest(l) AS term,
                     CAST(unnest(range(len(l))) AS INT) AS pos FROM t),
    wtf AS (SELECT doc_id, term,
                   CAST(sum(CASE WHEN pos < 8 THEN 2 ELSE 1 END) AS BIGINT) AS tf
            FROM toksp GROUP BY 1, 2),
    dl AS (SELECT doc_id,
                  CAST(2 * least(len(l), 8) + greatest(len(l) - 8, 0) AS BIGINT) AS dl
           FROM t WHERE len(l) > 0),
    st AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(dl) AS BIGINT) AS l FROM dl),
    a AS (SELECT n, (l * 1024) // n AS avgdl_fp FROM st WHERE n > 0),
    dfx AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM wtf GROUP BY 1),
    qtf AS (SELECT doc_id AS query_id, term, tf FROM wtf WHERE doc_id % 50 = 0),
    qs AS (SELECT query_id, q.term,
                  CAST(q.tf AS DOUBLE) / CAST(d.df AS DOUBLE) AS s
           FROM qtf q JOIN dfx d USING (term)),
    qt AS (SELECT query_id, term FROM (
             SELECT query_id, term,
                    row_number() OVER (PARTITION BY query_id
                                       ORDER BY s DESC, term ASC) AS rn
             FROM qs) WHERE rn <= 3),
    m AS (SELECT qt.query_id, wtf.doc_id, wtf.tf, dl.dl, dfx.df
          FROM qt JOIN wtf USING (term) JOIN dl USING (doc_id) JOIN dfx USING (term)),
    sc AS (SELECT query_id, m.doc_id,
                  CAST(sum(  ((1024 * (2*n - 2*df + 1)) // (2*df + 1))
                           * ((1024 * 22 * tf * avgdl_fp)
                              // (10 * tf * avgdl_fp + 3 * avgdl_fp + 9 * dl * 1024))
                        ) AS BIGINT) AS score_fp
           FROM m CROSS JOIN a GROUP BY 1, 2),
    tk AS (SELECT query_id, doc_id, score_fp,
                  CAST(row_number() OVER (PARTITION BY query_id
                                          ORDER BY score_fp DESC, doc_id ASC) AS INT) AS rank
           FROM sc)
    SELECT query_id, doc_id, score_fp, rank,
           CAST(score_fp AS DOUBLE) / 1048576.0 AS score
    FROM tk WHERE rank <= 5
"""


@query("x120_bm25f_topk", oracle=_BM25F_ORACLE)
def x120_bm25f_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fielded BM25 (BM25F-lite, Robertson & Zaragoza's weighted-field
    model): term frequencies and document lengths FIELD-WEIGHT before
    the standard saturation — title occurrences (the document's first
    8 tokens) count double, body single; weighted lengths keep the
    normalization honest.  Integer weights keep the whole chain in
    int64 (one display division at the end), so fielded scoring sits
    under the same oracle gate as x101; df is weight-independent.  The
    workload constructor weights identically (a title term counts
    double toward what distinguishes a query doc), and the workload's
    query docs rank their own titles highest — the observable BM25F
    behavior this operator exists for."""
    from ...operators.retrieval import (
        bm25f_topk,
        materialize_queries,
        top_fielded_terms_queries,
    )

    docs = load_table(spark, sf_dir, "documents")
    queries = materialize_queries(
        top_fielded_terms_queries(docs, F.col("doc_id") % 50 == 0, n_terms=3)
    )
    return bm25f_topk(docs, queries, k=5)


def _build_prefix_refine_oracle(
    dim: int = 64, prefix_dim: int = 16, k: int = 3,
    k_shortlist: int = 10, modulus: int = 50,
) -> str:
    """Prefix-cosine shortlist (truncated dims, stored-norm folds) +
    exact full-dimension rerank — operators/ann_index.py:
    prefix_refine_knn_join's lifecycle as one statement."""

    def foldsum(lst: str) -> str:
        return f"list_reduce(list_prepend(0.0, {lst}), (acc, x) -> acc + x)"

    def dot_sql(a: str, b: str) -> str:
        return foldsum(f"list_transform(list_zip({a}, {b}), p -> p[1] * p[2])")

    def nrm(a: str) -> str:
        return f"sqrt({foldsum(f'list_transform({a}, x -> x * x)')})"

    return f"""
    WITH e AS MATERIALIZED (SELECT vec_id, {_VEC} AS v FROM embeddings),
    qv AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id % {modulus} = 0),
    pfx AS (SELECT vec_id AS c_id, list_slice(v, 1, {prefix_dim}) AS pvec FROM e),
    qp AS (SELECT q_id, list_slice(qv, 1, {prefix_dim}) AS qp FROM qv),
    sc AS (SELECT q_id, c_id,
                  CASE WHEN {nrm('qp')} > 0 AND {nrm('pvec')} > 0
                       THEN {dot_sql('qp', 'pvec')} / ({nrm('qp')} * {nrm('pvec')}) END AS pcos
           FROM qp CROSS JOIN pfx),
    sh AS (SELECT q_id, c_id FROM (
             SELECT q_id, c_id,
                    row_number() OVER (PARTITION BY q_id
                                       ORDER BY pcos DESC NULLS LAST, c_id ASC) AS srn
             FROM sc) WHERE srn <= {k_shortlist}),
    ex AS (SELECT sh.q_id, sh.c_id,
                  CASE WHEN {nrm('qv')} > 0 AND {nrm('v')} > 0
                       THEN {dot_sql('qv', 'v')} / ({nrm('qv')} * {nrm('v')}) END AS cos_exact
           FROM sh JOIN qv ON qv.q_id = sh.q_id
                   JOIN e ON e.vec_id = sh.c_id),
    rk AS (SELECT q_id, c_id, cos_exact,
                  CAST(row_number() OVER (PARTITION BY q_id
                                          ORDER BY cos_exact DESC NULLS LAST, c_id ASC) AS INT) AS rn
           FROM ex)
    SELECT q_id, c_id, cos_exact, rn FROM rk WHERE rn <= {k}
    """


@query("x121_prefix_refine_knn", oracle=_build_prefix_refine_oracle())
def x121_prefix_refine_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-style two-stage kNN: the shortlist stage scans a
    persisted TRUNCATED-dimension table (first 16 of 64 dims + stored
    prefix norm — 4x fewer vector bytes than the float table; the
    Matryoshka-retrieval layout, Kusupati et al. 2022) and the top-10
    prefix-cosine candidates per query rerank by exact full-dimension
    cosine (broadcast semi-join fetch of O(batch*10) full rows).
    Truncation joins quantization (x114's PQ refine) as the second
    compressor in the shortlist-then-refine family — same contract,
    different bytes-vs-fidelity trade; a zero prefix with a nonzero
    full vector scores NULL in stage 1 (ranked last) and exactly if
    shortlisted.  Whole lifecycle under the oracle gate."""
    from ...operators.ann_index import (
        corpus_fingerprint,
        ensure_index,
        prefix_refine_knn_join,
        write_prefix_index,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    path = _index_dir(sf_dir, "prefix_v1")
    ensure_index(
        lambda: write_prefix_index(emb, path, prefix_dim=16),
        os.path.join(path, "prefix"),
        fingerprint=_fp_cached(spark, sf_dir, "emb", lambda: corpus_fingerprint(emb)),
    )
    return prefix_refine_knn_join(
        spark, emb.filter(F.col("vec_id") % 50 == 0), emb, path,
        k=3, k_shortlist=10, prefix_dim=16,
    )


def _build_hamming_refine_oracle(
    k: int = 3, k_shortlist: int = 10, n_bits: int = 32, dim: int = 64,
    modulus: int = 50,
) -> str:
    """Bit-packed sign-sketch shortlist (integer Hamming distance) +
    exact cosine rerank — operators/ann_index.py:
    hamming_refine_knn_join's lifecycle as one statement."""
    planes = hyperplanes(n_bits, dim, seed="hamming")
    lits = [f"[{', '.join(repr(x) for x in p)}]" for p in planes]
    sig = " + ".join(
        f"CASE WHEN {_dot_sql('v', lits[p])} > 0 THEN CAST({1 << p} AS BIGINT) ELSE CAST(0 AS BIGINT) END"
        for p in range(n_bits)
    )

    def foldsum(lst: str) -> str:
        return f"list_reduce(list_prepend(0.0, {lst}), (acc, x) -> acc + x)"

    def nrm(a: str) -> str:
        return f"sqrt({foldsum(f'list_transform({a}, x -> x * x)')})"

    return f"""
    WITH e AS MATERIALIZED (SELECT vec_id, {_VEC} AS v FROM embeddings),
    sk AS MATERIALIZED (SELECT vec_id AS c_id, CAST({sig} AS BIGINT) AS sig FROM e),
    q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id % {modulus} = 0),
    qs AS (SELECT q_id, sig AS qsig FROM sk JOIN q ON sk.c_id = q.q_id),
    hd AS (SELECT q_id, c_id,
                  CAST(bit_count(xor(sk.sig, qs.qsig)) AS BIGINT) AS hd
           FROM qs CROSS JOIN sk),
    sh AS (SELECT q_id, c_id FROM (
             SELECT q_id, c_id,
                    row_number() OVER (PARTITION BY q_id
                                       ORDER BY hd ASC, c_id ASC) AS srn
             FROM hd) WHERE srn <= {k_shortlist}),
    ex AS (SELECT sh.q_id, sh.c_id,
                  CASE WHEN {nrm('qv')} > 0 AND {nrm('v')} > 0
                       THEN {_dot_sql('qv', 'v')} / ({nrm('qv')} * {nrm('v')}) END AS cos_exact
           FROM sh JOIN q ON q.q_id = sh.q_id
                   JOIN e ON e.vec_id = sh.c_id),
    rk AS (SELECT q_id, c_id, cos_exact,
                  CAST(row_number() OVER (PARTITION BY q_id
                                          ORDER BY cos_exact DESC NULLS LAST, c_id ASC) AS INT) AS rn
           FROM ex)
    SELECT q_id, c_id, cos_exact, rn FROM rk WHERE rn <= {k}
    """


@query("x122_hamming_refine_knn", oracle=_build_hamming_refine_oracle())
def x122_hamming_refine_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-sketch (SimHash-for-vectors) two-stage kNN: the shortlist
    stage scans a persisted BIT-PACKED table (32 sign bits in one
    BIGINT word — 8 sketch bytes/vector, 64x fewer than the float
    table; Charikar 2002's random-hyperplane sketch, E[hamming]
    proportional to angle) and ranks by INTEGER Hamming distance
    (bit_count(xor), total order — no float ties in stage 1 at all);
    the top-10 per query rerank by exact full-dimension cosine.
    Completes the shortlist-then-refine compressor family: PQ codes
    (x114, ~8 B + norm), dimension truncation (x121, 128 B), and now
    1-bit projections (8 B, integer distance) — same refine contract,
    three different bytes-vs-fidelity points.  Whole lifecycle under
    the oracle gate."""
    from ...operators.ann_index import (
        corpus_fingerprint,
        ensure_index,
        hamming_refine_knn_join,
        write_hamming_sketch,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    path = _index_dir(sf_dir, "hamming_v1")
    ensure_index(
        lambda: write_hamming_sketch(emb, path, dim=64, n_bits=32),
        os.path.join(path, "sketch"),
        fingerprint=_fp_cached(spark, sf_dir, "emb", lambda: corpus_fingerprint(emb)),
    )
    return hamming_refine_knn_join(
        spark, emb.filter(F.col("vec_id") % 50 == 0), emb, path,
        k=3, k_shortlist=10, dim=64, n_bits=32,
    )


_HARD_NEG_ORACLE = f"""
    WITH e AS (SELECT vec_id, label, {_VEC} AS v FROM embeddings),
    q AS (SELECT vec_id AS q_id, label AS q_group, v AS qv FROM e
          WHERE vec_id % 50 = 0),
    j AS (SELECT q_id, q_group, e.vec_id AS c_id, e.label AS c_group,
                 {_cos_sql('qv', 'v')} AS cos_sim
          FROM q CROSS JOIN e WHERE e.label <> q.q_group),
    r AS (SELECT q_id, q_group, c_id, c_group, cos_sim,
                 row_number() OVER (PARTITION BY q_id
                                    ORDER BY cos_sim DESC, c_id ASC) AS rn
          FROM j)
    SELECT q_id, q_group, c_id, c_group, cos_sim, rn FROM r WHERE rn <= 3
"""


@query("x123_hard_negative_mining", oracle=_HARD_NEG_ORACLE)
def x123_hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training (the DPR recipe,
    Karpukhin et al. 2020): each anchor's top-3 most-similar vectors
    whose label DIFFERS — maximally confusable, definitely-wrong
    training examples.  The group predicate applies BEFORE the top-k
    window (a post-filter on a ranked list would under-fill k);
    O(batch) anchors broadcast over one corpus scan, norms folded per
    side.  At corpus-scale anchor sets the shortlist comes off any
    persisted index (over-fetch, anti-filter, rerank — the refine
    family's contract); this registered form is the exact baseline the
    index form is audited against."""
    from ...operators.similarity import hard_negative_mining

    emb = load_table(spark, sf_dir, "embeddings")
    return hard_negative_mining(
        emb.filter(F.col("vec_id") % 50 == 0), emb, k=3
    )


_TRIPLETS_ORACLE = f"""
    WITH e AS (SELECT vec_id, label, {_VEC} AS v FROM embeddings),
    q AS (SELECT vec_id AS q_id, label AS q_group, v AS qv FROM e
          WHERE vec_id % 50 = 0),
    pj AS (SELECT q_id, e.vec_id AS pos_id, {_cos_sql('qv', 'v')} AS pos_sim
           FROM q CROSS JOIN e
           WHERE e.label = q.q_group AND e.vec_id <> q.q_id),
    p AS (SELECT q_id, pos_id, pos_sim FROM (
            SELECT q_id, pos_id, pos_sim,
                   row_number() OVER (PARTITION BY q_id
                                      ORDER BY pos_sim DESC, pos_id ASC) AS rn
            FROM pj) WHERE rn = 1),
    nj AS (SELECT q_id, e.vec_id AS neg_id, {_cos_sql('qv', 'v')} AS neg_sim
           FROM q CROSS JOIN e WHERE e.label <> q.q_group),
    n AS (SELECT q_id, neg_id, neg_sim, rn FROM (
            SELECT q_id, neg_id, neg_sim,
                   row_number() OVER (PARTITION BY q_id
                                      ORDER BY neg_sim DESC, neg_id ASC) AS rn
            FROM nj) WHERE rn <= 2)
    SELECT p.q_id, pos_id, pos_sim, neg_id, neg_sim, rn
    FROM p JOIN n ON n.q_id = p.q_id
"""


@query("x124_contrastive_triplets", oracle=_TRIPLETS_ORACLE)
def x124_contrastive_triplets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(anchor, positive, negative) triplet assembly — the training-row
    layout behind triplet/InfoNCE losses: positive = nearest same-label
    vector (self excluded), negatives = the 2 hardest different-label
    vectors, positive repeated per negative row.  Anchors with no
    same-label neighbor yield no rows (the inner join enforces the
    three-legged contract declaratively).  Two broadcast-anchor passes
    over the corpus scan; the final join is by q_id on two O(batch·k)
    sides."""
    from ...operators.similarity import contrastive_triplets

    emb = load_table(spark, sf_dir, "embeddings")
    return contrastive_triplets(
        emb.filter(F.col("vec_id") % 50 == 0), emb, n_neg=2
    )


def _build_pagerank_oracle(
    iters: int = 3, scale: int = 10**9, num: int = 85, den: int = 100
) -> str:
    """Unrolled fixed-point PageRank over the x33 near-dup pair graph —
    one CTE per iteration, integer `//` at every step (non-negative, so
    DuckDB floor == Spark div truncation), SUMs cast back from HUGEINT
    to BIGINT before the damping multiply."""
    teleport = (den - num) * scale
    its = []
    prev = "n0"
    for k in range(1, iters + 1):
        its.append(f"""
    it{k} AS (
      SELECT n.node_id,
             CAST(({teleport} + {num} * COALESCE(s.c, CAST(0 AS BIGINT))) // {den}
                  AS BIGINT) AS r
      FROM {prev} n LEFT JOIN (
        SELECT e.dst AS node_id, CAST(SUM({prev}.r // deg.deg) AS BIGINT) AS c
        FROM e JOIN deg USING (src)
               JOIN {prev} ON {prev}.node_id = e.src
        GROUP BY 1) s ON s.node_id = n.node_id)""")
        prev = f"it{k}"
    return f"""
    WITH {_CAND_CTES},
    pairs AS (SELECT a_id, b_id FROM cands
              WHERE CAST({_MATCHES} AS DOUBLE) / {MINHASH_K} >= 0.25),
    e AS (SELECT a_id AS src, b_id AS dst FROM pairs
          UNION ALL SELECT b_id AS src, a_id AS dst FROM pairs),
    deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY 1),
    n0 AS (SELECT doc_id AS node_id, CAST({scale} AS BIGINT) AS r FROM docs),
    {", ".join(its)}
    SELECT node_id AS doc_id, r AS rank_fp FROM {prev}
    """


@query("x125_link_centrality", oracle=_build_pagerank_oracle())
def x125_link_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link-analysis centrality (fixed-point PageRank, 3 rounds,
    d=85/100, scale 1e9) over the near-dup similarity graph x33's
    pair policy consumes — the representativeness signal of the
    quality family: a document centrally placed in a near-dup family
    outranks its satellites, isolated documents hold the teleport
    floor.  The whole loop is int64 (teleport + damping in rationals,
    per-edge contribution r div deg), so three rounds are
    bit-reproducible in any ANSI engine — no float enters until
    nothing at all (ranks STAY fixed-point).  Graph derivation (LSH
    banding) is checkpointed once inside the operator, not re-executed
    per round (the x100 multi-consumer rule); each round is one join
    on src + one agg shuffle on dst carrying two longs.  Int64
    ceiling n < 1.08e8 nodes at scale 1e9 (drop scale for more), cf.
    operators/graph.py:pagerank."""
    from ...operators.dedup import minhash_candidates, minhash_estimate
    from ...operators.graph import pagerank

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 1000)
    pairs = (
        minhash_candidates(docs)
        .withColumn("est_sim", minhash_estimate(F.col("a_sig"), F.col("b_sig")))
        .filter(F.col("est_sim") >= 0.25)
        .select("a_id", "b_id")
    )
    edges = pairs.select(
        F.col("a_id").alias("src"), F.col("b_id").alias("dst")
    ).unionByName(pairs.select(F.col("b_id").alias("src"), F.col("a_id").alias("dst")))
    return pagerank(
        edges, docs.select(F.col("doc_id").alias("node_id")), iters=3
    ).select(F.col("node_id").alias("doc_id"), "rank_fp")


def _build_bpe_oracle(
    n_merges: int = 3,
    doc_cap: int = 500,
    encode_topn: int | None = None,
    fertility: bool = False,
) -> str:
    """Windowed twin of operators/bpe.py's greedy fold: per learning
    step, count adjacent pairs with one lead() window, argmax (cnt
    desc, pair asc), then apply the merge via run-parity — consecutive
    match positions group into runs (pos - row_number) and every odd
    member merges, which IS greedy left-to-right including the a==b
    overlap case.  Positions are RENUMBERED dense at every rebuild so
    run-adjacency stays positional at step k>1.  With ``encode_topn``
    the final merge is applied too and the result is the top-n symbol
    histogram of the fully-encoded corpus (the x127 twin)."""
    ctes = ["""
    s0 AS (SELECT doc_id, wp, CAST(pos AS BIGINT) AS pos, s FROM (
             SELECT doc_id, wp,
                    unnest(range(1, length(w)+1)) AS pos,
                    unnest(list_transform(range(1, length(w)+1),
                                          i -> substring(w, CAST(i AS INT), 1))) AS s
             FROM (SELECT doc_id, unnest(range(len(toks))) AS wp,
                          unnest(toks) AS word
                   FROM (SELECT doc_id, """ + _TOKS + f""" AS toks
                         FROM documents WHERE doc_id < {doc_cap})) t(doc_id, wp, w)))"""]
    for k in range(1, n_merges + 1):
        prev = f"s{k-1}"
        ctes.append(f"""
    top{k} AS (SELECT a, b, CAST(count(*) AS BIGINT) AS cnt FROM (
                 SELECT s AS a,
                        lead(s) OVER (PARTITION BY doc_id, wp ORDER BY pos) AS b
                 FROM {prev}) WHERE b IS NOT NULL
               GROUP BY 1, 2 ORDER BY cnt DESC, a ASC, b ASC LIMIT 1)""")
        if k < n_merges or encode_topn is not None or fertility:
            ctes.append(f"""
    sel{k} AS (SELECT doc_id, wp, pos FROM (
                 SELECT doc_id, wp, pos,
                        row_number() OVER (PARTITION BY doc_id, wp, rid
                                           ORDER BY pos) AS rr
                 FROM (SELECT doc_id, wp, pos,
                              pos - row_number() OVER (PARTITION BY doc_id, wp
                                                       ORDER BY pos) AS rid
                       FROM (SELECT x.doc_id, x.wp, x.pos
                             FROM (SELECT doc_id, wp, pos, s,
                                          lead(s) OVER (PARTITION BY doc_id, wp
                                                        ORDER BY pos) AS nx
                                   FROM {prev}) x CROSS JOIN top{k} t
                             WHERE x.s = t.a AND x.nx = t.b)))
               WHERE rr % 2 = 1),
    s{k} AS (SELECT doc_id, wp,
                    row_number() OVER (PARTITION BY doc_id, wp ORDER BY pos) AS pos,
                    s
             FROM (SELECT s.doc_id, s.wp, s.pos,
                          CASE WHEN m.pos IS NOT NULL THEN t.a || t.b
                               ELSE s.s END AS s
                   FROM {prev} s CROSS JOIN top{k} t
                   LEFT JOIN sel{k} m ON m.doc_id = s.doc_id AND m.wp = s.wp
                                      AND m.pos = s.pos
                   LEFT JOIN sel{k} d ON d.doc_id = s.doc_id AND d.wp = s.wp
                                      AND d.pos = s.pos - 1
                   WHERE d.pos IS NULL))""")
    if fertility:
        finals = f"""SELECT n_symbols, n_words, n_chars,
           CASE WHEN n_words > 0
                THEN CAST(n_symbols AS DOUBLE) / CAST(n_words AS DOUBLE)
                ELSE 0.0 END AS symbols_per_word
    FROM (SELECT CAST(count(*) AS BIGINT) AS n_symbols,
                 CAST((SELECT count(*) FROM (SELECT DISTINCT doc_id, wp
                       FROM s{n_merges})) AS BIGINT) AS n_words,
                 CAST(sum(length(s)) AS BIGINT) AS n_chars
          FROM s{n_merges})"""
    elif encode_topn is not None:
        finals = f"""SELECT symbol, cnt, rn FROM (
      SELECT s AS symbol, CAST(count(*) AS BIGINT) AS cnt,
             CAST(row_number() OVER (ORDER BY count(*) DESC, s ASC) AS INT) AS rn
      FROM s{n_merges} GROUP BY s) WHERE rn <= {encode_topn}"""
    else:
        finals = " UNION ALL ".join(
            f"SELECT CAST({k} AS INT) AS step, a, b, cnt FROM top{k}"
            for k in range(1, n_merges + 1)
        )
    return "WITH " + ",".join(ctes) + "\n    " + finals


@query("x126_bpe_vocabulary", oracle=_build_bpe_oracle())
def x126_bpe_vocabulary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE vocabulary induction (Sennrich et al. 2016) — learn the
    corpus's first 3 subword merge rules, the tokenizer-construction
    step of a pretraining pipeline.  Each step: corpus-wide adjacent
    symbol-pair count (pairs assembled array-locally via
    zip_with(slice, slice) — ONE explode + one map-side-combining
    count shuffle), deterministic argmax (cnt desc, pair asc, a
    bounded 1-row collect — the loop-control of every iterative
    operator here), then the merge applied as a pure ARRAY-LOCAL
    greedy fold (F.aggregate, no shuffle, merge pair parameterized as
    lit columns never spliced into SQL text).  Step k's count runs on
    step k-1's rewritten corpus — the trainer dependence the oracle
    reproduces with lead() windows + run-parity selection.  Symbol
    totals only shrink as merges apply; at 100 TB the merge table is
    learned on a hash-threshold sample and applied corpus-wide
    (operators/bpe.py module docstring).

    REGISTERED TRAINER (round 8): the DELTA-COUNT form
    (``bpe_learn_incremental`` — full pair count paid once, each step
    recounts only affected word types and folds the signed difference
    in), pinned bit-identical to the full-recount ``bpe_learn`` by
    test; the full form stays as the spec/reference implementation."""
    from ...operators.bpe import bpe_learn_incremental

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    return bpe_learn_incremental(docs, 3)


@query("x127_bpe_encode_vocab", oracle=_build_bpe_oracle(encode_topn=10))
def x127_bpe_encode_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The tokenize step: encode the corpus with its own learned
    3-rule BPE table (rules applied in priority order — n chained
    array-local folds, ONE narrow stage, zero shuffles) and audit the
    resulting vocabulary — top-10 symbols by occurrence (cnt desc,
    symbol asc).  This is the apply-side of x126: at 100 TB the table
    is learned once on a sample and THIS plan shape — fold chain +
    one histogram count — is what touches the full corpus.  Merge
    table learned by the registered delta-count trainer (x126)."""
    from ...operators.bpe import (
        bpe_encode,
        bpe_learn_incremental,
        vocab_histogram,
        word_symbol_arrays,
    )

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    merges = [
        (r.a, r.b) for r in bpe_learn_incremental(docs, 3).orderBy("step").collect()
    ]
    hist = vocab_histogram(bpe_encode(word_symbol_arrays(docs), merges))
    w = Window.orderBy(F.desc("cnt"), F.asc("symbol"))
    return (
        hist.withColumn("rn", F.row_number().over(w).cast("int"))
        .filter(F.col("rn") <= 10)
        .select("symbol", "cnt", "rn")
    )


def _build_mmr_oracle(k: int = 3, k_shortlist: int = 10, modulus: int = 50) -> str:
    """Unrolled greedy MMR: shortlist by exact cosine, pairwise sims
    once, then one (window-argmax + NOT EXISTS) CTE per selection step
    — the relational twin of operators/similarity.py:mmr_rerank.  All
    floats are identically-derived sequential-fold cosines; the step
    score rel - max(sim) is one exact IEEE subtraction."""
    ctes = [f"""
    e AS MATERIALIZED (SELECT vec_id, {_VEC} AS v FROM embeddings),
    q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id % {modulus} = 0),
    sc AS (SELECT q_id, e.vec_id AS c_id, {_cos_sql('qv', 'v')} AS rel
           FROM q CROSS JOIN e WHERE e.vec_id <> q.q_id),
    short AS MATERIALIZED (SELECT q_id, c_id, rel FROM (
               SELECT q_id, c_id, rel,
                      row_number() OVER (PARTITION BY q_id
                                         ORDER BY rel DESC NULLS LAST, c_id ASC) AS srn
               FROM sc) WHERE srn <= {k_shortlist}),
    pairs AS MATERIALIZED (
      SELECT s1.q_id, s1.c_id AS a, s2.c_id AS b,
             {_cos_sql('e1.v', 'e2.v')} AS sim
      FROM short s1 JOIN short s2 ON s1.q_id = s2.q_id AND s1.c_id <> s2.c_id
           JOIN e e1 ON e1.vec_id = s1.c_id
           JOIN e e2 ON e2.vec_id = s2.c_id),
    sel1 AS (SELECT q_id, c_id, rel, CAST(1 AS INT) AS mmr_rn FROM (
               SELECT q_id, c_id, rel,
                      row_number() OVER (PARTITION BY q_id
                                         ORDER BY rel DESC NULLS LAST, c_id ASC) AS rn
               FROM short) WHERE rn = 1),
    selu1 AS (SELECT * FROM sel1)"""]
    for t in range(2, k + 1):
        ctes.append(f"""
    sel{t} AS (SELECT q_id, c_id, rel, CAST({t} AS INT) AS mmr_rn FROM (
                 SELECT r.q_id, r.c_id, r.rel,
                        row_number() OVER (PARTITION BY r.q_id
                                           ORDER BY (r.rel - m.ms) DESC NULLS LAST,
                                                    r.c_id ASC) AS rn
                 FROM short r
                 JOIN (SELECT p.q_id, p.a AS c_id, max(p.sim) AS ms
                       FROM pairs p JOIN selu{t-1} s
                            ON s.q_id = p.q_id AND s.c_id = p.b
                       GROUP BY 1, 2) m
                      ON m.q_id = r.q_id AND m.c_id = r.c_id
                 WHERE NOT EXISTS (SELECT 1 FROM selu{t-1} s
                                   WHERE s.q_id = r.q_id AND s.c_id = r.c_id))
               WHERE rn = 1),
    selu{t} AS (SELECT * FROM selu{t-1} UNION ALL SELECT * FROM sel{t})""")
    return (
        "WITH " + ",".join(ctes)
        + f"\n    SELECT q_id, c_id, rel, mmr_rn FROM selu{k}"
    )


@query("x128_mmr_rerank", oracle=_build_mmr_oracle())
def x128_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-diversity rerank: greedy maximal marginal relevance
    (Carbonell & Goldstein 1998) over the exact top-10 shortlist —
    each of 3 steps takes argmax(rel - max sim to already-selected),
    lambda=1/2 up to positive scale so NO float constant enters and
    the step score is one exact IEEE subtraction of two sequential-
    fold cosines.  The geometric sibling of x119's per-source cap.
    Corpus-sized work is the one shortlist pass; pairwise sims are
    O(batch*10^2) computed once and checkpointed (x100 rule); each
    greedy step is a window argmax + anti-join on that small table —
    the sequential loop UNROLLS declaratively, no UDF."""
    from ...operators.similarity import mmr_rerank

    emb = load_table(spark, sf_dir, "embeddings")
    return mmr_rerank(
        emb.filter(F.col("vec_id") % 50 == 0), emb, k=3, k_shortlist=10
    )


@query(
    "x129_forward_index_fetch",
    oracle=f"""
    WITH {_BM25_TABLES}
    SELECT doc_id, term, tf FROM tf WHERE doc_id % 40 = 0
    """,
)
def x129_forward_index_fetch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward (doc-major) index lifecycle: build (doc_id, term, tf)
    partitioned by pmod(doc_id, 64) with doc_id-sorted files, then
    FETCH a bounded doc set's terms — bucket partition IN-list + the
    ids as a pushed parquet predicate (row-group skipping on the
    sorted column).  The doc-side mirror of x102's term-side pruning:
    an inverted index scatters a doc's terms across every term bucket
    and cannot serve "the terms of THESE docs" without a full-postings
    doc_id filter — the measured growing term of the serve-side
    workload constructors; the forward sidecar makes that fetch
    O(fetched docs).  x115's feedback expansion now rides this path.
    Whole lifecycle (build + pruned fetch) under the oracle gate: the
    oracle re-derives tf from tokenization, so the fetch must be
    byte-faithful to the build and the build to the tokenizer."""
    from ...operators.ann_index import corpus_fingerprint, ensure_index
    from ...operators.retrieval import fetch_doc_terms, write_forward_index

    docs = load_table(spark, sf_dir, "documents")
    fpath = os.path.join(
        _tagged_dir(_SCRATCH, "bm25_forward", "v1", sf_dir=sf_dir), "full"
    )
    ensure_index(
        lambda: write_forward_index(docs, fpath),
        os.path.join(fpath, "forward"),
        fingerprint=_fp_cached(spark, sf_dir, "docs",
                                lambda: corpus_fingerprint(docs, id_col="doc_id")),
    )
    ids = docs.filter(F.col("doc_id") % 40 == 0).select("doc_id")
    return fetch_doc_terms(spark, fpath, ids)


def _build_power_iteration_ctes(iters: int = 3, sx: int = 1 << 10, sv: int = 1 << 16) -> str:
    """Shared CTE chain for x130/x131: the quantized power recurrence
    unrolled — integer half-steps (HUGEINT-exact sums), one
    deterministic sqrt + floor per round; start iterate norm-bounded at
    isqrt(sv²/d), the row_ceiling invariant (operators/spectral.py)."""
    import math as _math

    v0 = _math.isqrt(sv * sv // 64)
    ctes = [f"""
    e AS (SELECT vec_id,
                 list_transform({_VEC}, x -> CAST(floor(x * {float(sx)}) AS BIGINT)) AS xq
          FROM embeddings),
    x AS MATERIALIZED (SELECT vec_id, unnest(xq) AS xv,
                              CAST(unnest(range(len(xq))) AS BIGINT) AS j
                       FROM e),
    v0 AS (SELECT CAST(unnest(range(64)) AS BIGINT) AS j,
                  CAST({v0} AS BIGINT) AS v)"""]
    for k in range(1, iters + 1):
        ctes.append(f"""
    u{k} AS (SELECT x.vec_id,
                    CAST(floor(CAST(SUM(x.xv * v.v) AS DOUBLE) / {float(sx)}) AS BIGINT) AS u
             FROM x JOIN v{k-1} v USING (j) GROUP BY x.vec_id),
    y{k} AS (SELECT x.j, CAST(SUM(x.xv * u.u) AS BIGINT) AS y
             FROM x JOIN u{k} u USING (vec_id) GROUP BY x.j),
    n{k} AS (SELECT CAST(SUM(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS DOUBLE) AS n2
             FROM y{k}),
    v{k} AS (SELECT j, CASE WHEN n2 > 0
                            THEN CAST(floor(CAST(y AS DOUBLE) * {float(sv)} / sqrt(n2)) AS BIGINT)
                            ELSE CAST(0 AS BIGINT) END AS v
             FROM y{k} CROSS JOIN n{k})""")
    return ",".join(ctes)


@query(
    "x130_top_component",
    oracle=f"""
    WITH {_build_power_iteration_ctes()}
    SELECT CAST(j AS INT) AS dim_idx, v AS v_fp FROM v3
    """,
)
def x130_top_component(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dominant principal direction of the embedding corpus by
    QUANTIZED power iteration (3 rounds): the matrix is quantized once
    (floor(x*2^10) — power-of-two scale, float-exact), the iterate is
    an int64 vector at 2^16, and every matrix-vector half-step is an
    exact integer sum — order-free, so a fixed round count is
    bit-reproducible in any engine (a float power iteration is not:
    its reductions are order-dependent).  The only float per round is
    the normalize: sum-of-squares EXACT in wide integers
    (decimal(38,0) / HUGEINT), one IEEE sqrt, one floor.  Scale
    shape per round: broadcast the 1-row iterate into the scan,
    array-local fold for u, ONE 64-group shuffle for y (map-side
    combined); proven-exact to row_ceiling() ≈ 5.8e8 rows at the
    defaults — a 100-TB shard fits the DEFAULT path
    (operators/spectral.py).  The direction feeds x131's
    all-but-the-top cleanup."""
    from ...operators.spectral import power_iteration_top_component

    emb = load_table(spark, sf_dir, "embeddings")
    return power_iteration_top_component(emb, iters=3)


@query(
    "x131_remove_top_component",
    oracle=f"""
    WITH {_build_power_iteration_ctes()},
    c AS (SELECT list(v ORDER BY j) AS carr FROM v3),
    s AS (SELECT vec_id, {_VEC} AS xv, carr FROM embeddings CROSS JOIN c
          WHERE vec_id % 25 = 0),
    pr AS (SELECT vec_id, xv, carr,
                  CASE WHEN list_reduce(list_prepend(0.0,
                           list_transform(carr, w -> CAST(w AS DOUBLE) * CAST(w AS DOUBLE))),
                           (acc, p) -> acc + p) > 0
                       THEN list_reduce(list_prepend(0.0,
                           list_transform(list_zip(xv, carr),
                                          p -> p[1] * CAST(p[2] AS DOUBLE))),
                           (acc, q) -> acc + q)
                          / list_reduce(list_prepend(0.0,
                           list_transform(carr, w -> CAST(w AS DOUBLE) * CAST(w AS DOUBLE))),
                           (acc, p) -> acc + p)
                       ELSE 0.0 END AS sc
           FROM s)
    SELECT vec_id,
           sqrt(list_reduce(list_prepend(0.0,
               list_transform(list_zip(xv, carr),
                              p -> (p[1] - sc * CAST(p[2] AS DOUBLE))
                                 * (p[1] - sc * CAST(p[2] AS DOUBLE)))),
               (acc, q) -> acc + q)) AS resid_norm
    FROM pr
    """,
)
def x131_remove_top_component(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-but-the-top (Mu & Viswanath 2018): subtract each vector's
    projection onto x130's top direction and report the residual norm
    for the probe set — the de-biasing pass run before ANN indexing /
    semantic dedup when an embedding set shares a large common
    component.  The component is the DETERMINISTIC integer vector, so
    the float projection/residual chain (sequential folds, one
    division, one sqrt) is as reproducible as its input; one broadcast
    of the 64-int row into the scan, array-local arithmetic, no
    shuffle past x130's own."""
    from ...operators.similarity import dot, l2_norm
    from ...operators.spectral import (
        power_iteration_top_component,
        remove_top_component,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    comp = power_iteration_top_component(emb, iters=3)
    cleaned = remove_top_component(emb.filter(F.col("vec_id") % 25 == 0), comp)
    return cleaned.select(
        "vec_id", l2_norm(F.col("embedding")).alias("resid_norm")
    )


@query(
    "x132_histogram_quantiles",
    oracle=f"""
    WITH t AS (SELECT CAST(len({_TOKS}) AS BIGINT) AS v FROM documents),
    b AS (SELECT least(CAST(127 AS BIGINT), greatest(CAST(0 AS BIGINT), v)) // 2 AS bin_idx FROM t),
    h AS (SELECT bin_idx, CAST(count(*) AS BIGINT) AS cnt FROM b GROUP BY 1),
    c AS (SELECT bin_idx, cnt,
                 CAST(SUM(cnt) OVER (ORDER BY bin_idx
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
                 CAST(SUM(cnt) OVER () AS BIGINT) AS n
          FROM h),
    p AS (SELECT CAST(p_num AS BIGINT) AS p_num, CAST(p_den AS BIGINT) AS p_den
          FROM (VALUES (1, 2), (9, 10), (99, 100)) AS t(p_num, p_den)),
    j AS (SELECT c.*, p.p_num, p.p_den,
                 CAST((n * p_num + p_den - 1) // p_den AS BIGINT) AS target_rank
          FROM c CROSS JOIN p),
    f AS (SELECT *, row_number() OVER (PARTITION BY p_num, p_den
                                       ORDER BY bin_idx) AS rn
          FROM j WHERE cum >= target_rank)
    SELECT p_num, p_den, target_rank, bin_idx,
           CAST(bin_idx * 2 AS BIGINT) AS bin_lo,
           CAST(bin_idx * 2 AS DOUBLE)
             + 2.0 * CAST(target_rank - (cum - cnt) AS DOUBLE) / CAST(cnt AS DOUBLE) AS est
    FROM f WHERE rn = 1
    """,
)
def x132_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed quantile estimation of document token counts
    (p50/p90/p99) by fixed-bin histogram — the engine-portable,
    mergeable form: exact `percentile` is a single-reducer buffer and
    `approx_percentile`'s sketch is implementation-defined, while an
    integer binning (64 width-2 bins over [0,128), clamped edges) is
    one map-side-combined 64-group count plus a window over the
    64-row histogram — the corpus is never shuffled, never sorted.
    Target ranks are rational-exact (ceil(p*n) as int div); the only
    float is one interpolation division per quantile, bounded by one
    bin width.  The length-distribution audit every filtering
    pipeline runs before choosing thresholds."""
    from ...operators.sampling import histogram_quantiles
    from ...operators.textstats import token_count_col

    docs = load_table(spark, sf_dir, "documents")
    with_v = docs.select(token_count_col(F.col("text")).alias("v"))
    return histogram_quantiles(
        with_v, "v", [(1, 2), (9, 10), (99, 100)], lo=0, hi=128, n_bins=64
    )


@query(
    "x133_prefix_term_search",
    oracle=f"""
    WITH {_BM25_TABLES}
    SELECT term, df FROM dfx WHERE term LIKE 's%'
    """,
)
def x133_prefix_term_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wildcard/prefix term lookup off the RANGE-partitioned lexicon
    sidecar: the hash-bucketed postings layout scatters a lexical
    range across all 64 buckets (term_bucket is md5-based — a prefix
    prunes NOTHING there), so range queries get their own layout —
    (term, df) repartitionByRange + sorted files, StartsWith pushed to
    the parquet scan (file pruning via range partitioning, row-group
    skipping via min/max on the sorted column).  Vocabulary-sized, so
    the build is one df aggregation; the serve path never touches
    posting lists.  Completes the index-layout triple: term-equality
    (x102 hash buckets), doc fetch (x129 doc buckets), lexical range
    (this)."""
    from ...operators.ann_index import corpus_fingerprint, ensure_index
    from ...operators.retrieval import prefix_terms, write_lexicon

    docs = load_table(spark, sf_dir, "documents")
    path = os.path.join(
        _tagged_dir(_SCRATCH, "lexicon", "v1", sf_dir=sf_dir), "full"
    )
    ensure_index(
        lambda: write_lexicon(docs, path),
        os.path.join(path, "lexicon"),
        fingerprint=_fp_cached(spark, sf_dir, "docs",
                                lambda: corpus_fingerprint(docs, id_col="doc_id")),
    )
    return prefix_terms(spark, path, "s")


@query("x134_tokenizer_fertility", oracle=_build_bpe_oracle(fertility=True))
def x134_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility audit: encode the corpus with its learned
    3-rule BPE table and report (n_symbols, n_words, n_chars,
    symbols_per_word) — fertility (tokens/word) is THE tokenizer
    quality metric a pretraining pipeline tracks per language/domain
    (high fertility = wasted context window), and chars vs symbols
    gives the compression the merge table bought.  Integer counts
    (hashable contract) + one guarded division; plan shape is x127's
    fold chain plus one ungrouped aggregate.  Merge table learned by
    the registered delta-count trainer (x126)."""
    from ...operators.bpe import bpe_encode, bpe_learn_incremental, word_symbol_arrays

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    merges = [
        (r.a, r.b) for r in bpe_learn_incremental(docs, 3).orderBy("step").collect()
    ]
    enc = bpe_encode(word_symbol_arrays(docs), merges).filter(F.size("syms") > 0)
    return enc.agg(
        F.sum(F.size("syms")).cast("long").alias("n_symbols"),
        F.count("*").cast("long").alias("n_words"),
        F.sum(
            F.aggregate(
                F.col("syms"),
                F.lit(0).cast("long"),
                lambda acc, s: acc + F.length(s).cast("long"),
            )
        )
        .cast("long")
        .alias("n_chars"),
    ).select(
        "n_symbols",
        "n_words",
        "n_chars",
        F.when(
            F.col("n_words") > 0,
            F.col("n_symbols").cast("double") / F.col("n_words").cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("symbols_per_word"),
    )


def _build_ppr_oracle(
    iters: int = 3, scale: int = 10**9, num: int = 85, den: int = 100,
    seed_pred: str = "doc_id < 50",
) -> str:
    """Personalized-PageRank twin of _build_pagerank_oracle: teleport
    CASEd on seed membership, start vector = seed indicator * scale."""
    teleport = (den - num) * scale
    its = []
    prev = "n0"
    for k in range(1, iters + 1):
        its.append(f"""
    it{k} AS (
      SELECT n.node_id,
             CAST((n.seed * {teleport} + {num} * COALESCE(s.c, CAST(0 AS BIGINT))) // {den}
                  AS BIGINT) AS r, n.seed
      FROM {prev} n LEFT JOIN (
        SELECT e.dst AS node_id, CAST(SUM({prev}.r // deg.deg) AS BIGINT) AS c
        FROM e JOIN deg USING (src)
               JOIN {prev} ON {prev}.node_id = e.src
        GROUP BY 1) s ON s.node_id = n.node_id)""")
        prev = f"it{k}"
    return f"""
    WITH {_CAND_CTES},
    pairs AS (SELECT a_id, b_id FROM cands
              WHERE CAST({_MATCHES} AS DOUBLE) / {MINHASH_K} >= 0.25),
    e AS (SELECT a_id AS src, b_id AS dst FROM pairs
          UNION ALL SELECT b_id AS src, a_id AS dst FROM pairs),
    deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY 1),
    n0 AS (SELECT doc_id AS node_id,
                  CAST(CASE WHEN {seed_pred} THEN 1 ELSE 0 END AS BIGINT) AS seed,
                  CAST(CASE WHEN {seed_pred} THEN {scale} ELSE 0 END AS BIGINT) AS r
           FROM docs),
    {", ".join(its)}
    SELECT node_id AS doc_id, r AS rank_fp FROM {prev}
    """


@query("x135_personalized_pagerank", oracle=_build_ppr_oracle())
def x135_personalized_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank from a curated seed set (doc_id < 50
    standing in for a vetted collection): teleport mass lands ONLY on
    seeds and the start vector is the seed indicator, so the
    fixed-point score becomes graph proximity to the trusted set —
    the propagate-quality-labels recipe over the near-dup graph
    (documents connected to vetted content inherit score; nodes
    unreachable from any seed stay EXACTLY 0, integer arithmetic, no
    epsilon floor).  Same bit-reproducible integer loop, ceilings and
    checkpoint discipline as x125; the seed set broadcasts (curated
    sets are small by contract)."""
    from ...operators.dedup import minhash_candidates, minhash_estimate
    from ...operators.graph import pagerank

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 1000)
    pairs = (
        minhash_candidates(docs)
        .withColumn("est_sim", minhash_estimate(F.col("a_sig"), F.col("b_sig")))
        .filter(F.col("est_sim") >= 0.25)
        .select("a_id", "b_id")
    )
    edges = pairs.select(
        F.col("a_id").alias("src"), F.col("b_id").alias("dst")
    ).unionByName(pairs.select(F.col("b_id").alias("src"), F.col("a_id").alias("dst")))
    return pagerank(
        edges,
        docs.select(F.col("doc_id").alias("node_id")),
        iters=3,
        seeds=docs.filter(F.col("doc_id") < 50).select("doc_id"),
    ).select(F.col("node_id").alias("doc_id"), "rank_fp")


@query(
    "x136_snapshot_diff",
    oracle="""
    WITH o AS (SELECT doc_id, md5(concat_ws(chr(31), coalesce(text, ''))) AS h
               FROM documents WHERE doc_id < 900),
    n AS (SELECT doc_id,
                 md5(concat_ws(chr(31), coalesce(
                     CASE WHEN doc_id % 97 = 0 THEN text || ' updated'
                          ELSE text END, ''))) AS h
          FROM documents WHERE doc_id >= 100),
    j AS (SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
                 CASE WHEN o.h IS NULL THEN 'added'
                      WHEN n.h IS NULL THEN 'removed'
                      WHEN o.h <> n.h THEN 'changed'
                      ELSE 'unchanged' END AS status
          FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id)
    SELECT status, CAST(count(*) AS BIGINT) AS n_docs
    FROM j GROUP BY 1
    """,
)
def x136_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus version diff audit: a simulated re-crawl (drops the
    oldest tail, adds a new head, edits every 97th doc) is diffed
    against the standing snapshot by content digest — per-status
    counts of added/removed/changed/unchanged, the ingest-regression
    check run before a landed batch replaces production data (the
    read-side complement of x62's MERGE).  Digests computed in the
    scan's project; the one shuffle is the full-outer id join
    carrying (id, 32-hex) rows — never text; co-located to zero on an
    id-bucketed layout (plans/warehouse.py:write_bucketed)."""
    from ...plans.warehouse import snapshot_diff

    docs = load_table(spark, sf_dir, "documents")
    old = docs.filter(F.col("doc_id") < 900)
    new = docs.filter(F.col("doc_id") >= 100).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 97 == 0, F.concat(F.col("text"), F.lit(" updated"))
        ).otherwise(F.col("text")),
    )
    return (
        snapshot_diff(old, new, "doc_id", ["text"])
        .groupBy("status")
        .agg(F.count("*").cast("long").alias("n_docs"))
    )


@query(
    "x137_retrieval_mrr",
    oracle=f"""
    WITH {_BM25_TABLES},
    qtf AS (SELECT doc_id AS query_id, term, tf FROM tf WHERE doc_id % 50 = 0),
    qs AS (SELECT query_id, q.term,
                  CAST(q.tf AS DOUBLE) / CAST(d.df AS DOUBLE) AS s
           FROM qtf q JOIN dfx d USING (term)),
    qt AS (SELECT query_id, term FROM (
             SELECT query_id, term,
                    row_number() OVER (PARTITION BY query_id
                                       ORDER BY s DESC, term ASC) AS rn
             FROM qs) WHERE rn <= 3),
    m AS (SELECT qt.query_id, tf.doc_id, tf.tf, dl.dl, dfx.df
          FROM qt JOIN tf USING (term) JOIN dl USING (doc_id) JOIN dfx USING (term)),
    {_BM25_SCORE_TOPK},
    hits AS (SELECT query_id, rank FROM tk
             WHERE rank <= 5 AND doc_id = query_id),
    perq AS (SELECT q.query_id,
                    coalesce(h.n_hit, CAST(0 AS BIGINT)) AS n_hit,
                    coalesce(h.rr_fp, CAST(0 AS BIGINT)) AS rr_fp
             FROM (SELECT DISTINCT query_id FROM qt) q
             LEFT JOIN (SELECT query_id,
                               CAST(count(*) AS BIGINT) AS n_hit,
                               CAST(60 // min(rank) AS BIGINT) AS rr_fp
                        FROM hits GROUP BY 1) h USING (query_id))
    SELECT CAST(count(*) AS BIGINT) AS n_queries,
           CAST(count(*) AS BIGINT) AS n_rel,
           CAST(sum(n_hit) AS BIGINT) AS n_found,
           CAST(sum(rr_fp) AS BIGINT) AS sum_rr_fp,
           CAST(sum(n_hit) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS recall_at_k,
           CAST(sum(rr_fp) AS DOUBLE) / (60.0 * CAST(count(*) AS DOUBLE)) AS mrr
    FROM perq
    """,
)
def x137_retrieval_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-quality audit for the lexical tier: SELF-RETRIEVAL
    MRR/recall@5 — every workload query is derived from a source
    document (x101's construction), the source doc is its own
    relevance judgment, and the metric asks "does BM25 rank the
    document its query came from in the top 5, and how high?" — the
    standard no-ground-truth sanity eval for a retrieval stack
    (x60/x108's audit convention applied to ranked lexical search).
    Reciprocal ranks in exact fixed point (60 = lcm(1..5) — 1/rank is
    an integer for every rank <= 5), so the aggregate carries NO
    float-summation order; the two display divisions are the only
    floats.  One broadcast judged-pairs join + a min-agg per query
    over the run.

    SERVED FORM (round 8, per the r7 verdict): the run comes off the
    STANDING x102 inverted index (``top_terms_from_index`` +
    ``bm25_serve`` — workload mining and scoring both O(probed
    postings), zero tokenization), not an in-flight BM25 pass; the
    oracle is unchanged because the serve path is bit-equal to the
    in-flight form (pinned by tests/test_retrieval.py).  This is the
    shape a production gate prices: the eval rides the index the
    serving tier already maintains."""
    from ...operators.ann_index import corpus_fingerprint, ensure_index
    from ...operators.retrieval import (
        bm25_serve,
        retrieval_metrics,
        top_terms_from_index,
        write_inverted_index,
    )

    docs = load_table(spark, sf_dir, "documents")
    path = os.path.join(
        _tagged_dir(_SCRATCH, "bm25_index", "v2", sf_dir=sf_dir), "full"
    )
    ensure_index(
        lambda: write_inverted_index(docs, path),
        os.path.join(path, "stats"),
        fingerprint=_fp_cached(spark, sf_dir, "docs",
                                lambda: corpus_fingerprint(docs, id_col="doc_id")),
    )
    queries = top_terms_from_index(spark, path, F.col("doc_id") % 50 == 0, n_terms=3)
    run = bm25_serve(spark, queries, path, k=5).select("query_id", "doc_id", "rank")
    qrels = queries.select(
        "query_id", F.col("query_id").alias("doc_id")
    ).distinct()
    return retrieval_metrics(run, qrels, k=5)


def _fold_sql(products: str) -> str:
    """Sequential float fold (list_reduce with a 0.0 prepend) — the
    cross-engine twin of operators.similarity's F.aggregate folds."""
    return f"list_reduce(list_prepend(0.0, {products}), (acc, x) -> acc + x)"


@query(
    "x138_debias_knn",
    oracle=f"""
    WITH {_build_power_iteration_ctes()},
    c AS (SELECT list(v ORDER BY j) AS carr FROM v3),
    s AS (SELECT vec_id, {_VEC} AS xv, carr FROM embeddings CROSS JOIN c),
    cl AS (SELECT vec_id,
                  list_transform(list_zip(xv, carr),
                                 p -> p[1] - (CASE WHEN {_fold_sql('list_transform(carr, w -> CAST(w AS DOUBLE) * CAST(w AS DOUBLE))')} > 0
                                              THEN {_fold_sql('list_transform(list_zip(xv, carr), q -> q[1] * CAST(q[2] AS DOUBLE))')}
                                                 / {_fold_sql('list_transform(carr, w -> CAST(w AS DOUBLE) * CAST(w AS DOUBLE))')}
                                              ELSE 0.0 END) * CAST(p[2] AS DOUBLE)) AS v
           FROM s),
    q AS (SELECT vec_id AS q_id, v AS qv FROM cl WHERE vec_id % 50 = 0),
    sc AS (SELECT q_id, cl.vec_id AS c_id, {_cos_sql('qv', 'v')} AS cos_sim
           FROM q CROSS JOIN cl WHERE cl.vec_id <> q.q_id),
    rk AS (SELECT q_id, c_id, cos_sim,
                  CAST(row_number() OVER (PARTITION BY q_id
                                          ORDER BY cos_sim DESC NULLS LAST, c_id ASC) AS INT) AS rn
           FROM sc)
    SELECT q_id, c_id, cos_sim, rn FROM rk WHERE rn <= 3
    """,
)
def x138_debias_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The de-biasing pipeline composed end-to-end: x130's quantized
    top component -> x131's all-but-the-top removal -> exact kNN over
    the CLEANED embeddings (self excluded) — the similarity search a
    pipeline actually runs after removing the common direction (Mu &
    Viswanath 2018 report retrieval gains from exactly this chain).
    Every stage keeps its determinism contract (integer component,
    sequential-fold projections and cosines), so the three-operator
    composition stays oracle-exact — the point of the query: pipelines
    compose without losing the correctness gate.  Corpus work = the
    spectral rounds + one brute-force shortlist pass; swap the last
    stage for any index family at scale (the x128 note applies)."""
    from ...operators.similarity import knn_join_exact
    from ...operators.spectral import (
        power_iteration_top_component,
        remove_top_component,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    comp = power_iteration_top_component(emb, iters=3)
    cleaned = remove_top_component(emb, comp).localCheckpoint(eager=False)
    q = cleaned.filter(F.col("vec_id") % 50 == 0)
    # self-exclusion (a query drawn from the corpus never reports
    # itself): over-fetch one, drop self, re-rank — the x128 recipe
    sl = knn_join_exact(q, cleaned, k=4).filter(F.col("c_id") != F.col("q_id"))
    w = Window.partitionBy("q_id").orderBy(
        F.desc_nulls_last("cos_sim"), F.asc("c_id")
    )
    return (
        sl.withColumn("rn", F.row_number().over(w).cast("int"))
        .filter(F.col("rn") <= 3)
        .select("q_id", "c_id", "cos_sim", "rn")
    )


@query(
    "x139_grouped_quantiles",
    oracle=f"""
    WITH t AS (SELECT lang, CAST(len({_TOKS}) AS BIGINT) AS v FROM documents),
    b AS (SELECT lang, least(CAST(127 AS BIGINT), greatest(CAST(0 AS BIGINT), v)) // 2 AS bin_idx FROM t),
    h AS (SELECT lang, bin_idx, CAST(count(*) AS BIGINT) AS cnt FROM b GROUP BY 1, 2),
    c AS (SELECT lang, bin_idx, cnt,
                 CAST(SUM(cnt) OVER (PARTITION BY lang ORDER BY bin_idx
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
                 CAST(SUM(cnt) OVER (PARTITION BY lang) AS BIGINT) AS n
          FROM h),
    p AS (SELECT CAST(p_num AS BIGINT) AS p_num, CAST(p_den AS BIGINT) AS p_den
          FROM (VALUES (1, 2), (9, 10)) AS t(p_num, p_den)),
    j AS (SELECT c.*, p.p_num, p.p_den,
                 CAST((n * p_num + p_den - 1) // p_den AS BIGINT) AS target_rank
          FROM c CROSS JOIN p),
    f AS (SELECT *, row_number() OVER (PARTITION BY lang, p_num, p_den
                                       ORDER BY bin_idx) AS rn
          FROM j WHERE cum >= target_rank)
    SELECT lang, p_num, p_den, target_rank, bin_idx,
           CAST(bin_idx * 2 AS BIGINT) AS bin_lo,
           CAST(bin_idx * 2 AS DOUBLE)
             + 2.0 * CAST(target_rank - (cum - cnt) AS DOUBLE) / CAST(cnt AS DOUBLE) AS est
    FROM f WHERE rn = 1
    """,
)
def x139_grouped_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x132 per language: p50/p90 token-count quantiles per ``lang`` —
    thresholds are set per stratum in practice (a global p90 length
    cut tuned on the dominant language truncates the rest; the same
    argument as x78's per-group percentile calibration, here in the
    mergeable histogram form).  The histogram shuffle keys on
    (lang, bin); every window runs over per-group 64-row tables —
    adding languages adds histogram rows, never corpus passes."""
    from ...operators.sampling import grouped_histogram_quantiles
    from ...operators.textstats import token_count_col

    docs = load_table(spark, sf_dir, "documents")
    with_v = docs.select("lang", token_count_col(F.col("text")).alias("v"))
    return grouped_histogram_quantiles(
        with_v, "v", "lang", [(1, 2), (9, 10)], lo=0, hi=128, n_bins=64
    )


@query(
    "x140_retention_cohorts",
    oracle="""
    WITH u AS (SELECT DISTINCT user_id,
                      epoch_us(ts) // 604800000000 AS wk FROM events),
    c AS (SELECT user_id, CAST(min(wk) AS BIGINT) AS cohort_wk FROM u GROUP BY 1),
    sz AS (SELECT cohort_wk, CAST(count(*) AS BIGINT) AS cohort_size
           FROM c GROUP BY 1),
    r AS (SELECT c.cohort_wk, CAST(u.wk - c.cohort_wk AS BIGINT) AS weeks_since,
                 CAST(count(DISTINCT u.user_id) AS BIGINT) AS n_users
          FROM u JOIN c USING (user_id) GROUP BY 1, 2)
    SELECT r.cohort_wk, r.weeks_since, r.n_users, sz.cohort_size,
           CAST(r.n_users AS DOUBLE) / CAST(sz.cohort_size AS DOUBLE) AS retention
    FROM r JOIN sz USING (cohort_wk)
    """,
)
def x140_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users cohorted by first-active epoch
    week (integer µs div — no date/timezone arithmetic to diverge
    between engines), each cell = distinct users from that cohort
    active k weeks later, with the cohort-size denominator and one
    display division — the product-analytics complement of x63's
    sessions and x70's funnel.  Scale shape: one distinct
    (user, week) shuffle; the cohort min REUSES the user key; the
    cell aggregate keys on (cohort, weeks_since) — events text/props
    never leave the scan."""
    ev = load_table(spark, sf_dir, "events")
    u = (
        ev.withColumn("us", epoch_us(F.col("ts")))
        .selectExpr("user_id", "us div 604800000000 as wk")
        .distinct()
    )
    c = u.groupBy("user_id").agg(F.min("wk").cast("long").alias("cohort_wk"))
    sz = c.groupBy("cohort_wk").agg(
        F.count("*").cast("long").alias("cohort_size")
    )
    r = (
        u.join(c, "user_id")
        .groupBy(
            "cohort_wk", (F.col("wk") - F.col("cohort_wk")).cast("long").alias("weeks_since")
        )
        .agg(F.count_distinct("user_id").cast("long").alias("n_users"))
    )
    return r.join(sz, "cohort_wk").select(
        "cohort_wk",
        "weeks_since",
        "n_users",
        "cohort_size",
        (F.col("n_users").cast("double") / F.col("cohort_size").cast("double")).alias(
            "retention"
        ),
    )


def _build_weighted_pagerank_oracle(
    iters: int = 3, scale: int = 10**9, num: int = 85, den: int = 100
) -> str:
    """Weighted twin of _build_pagerank_oracle: edge weight = the
    MinHash match count (an exact small integer), contributions split
    (r*w) // sum_w — still pure int64."""
    teleport = (den - num) * scale
    its = []
    prev = "n0"
    for k in range(1, iters + 1):
        its.append(f"""
    it{k} AS (
      SELECT n.node_id,
             CAST(({teleport} + {num} * COALESCE(s.c, CAST(0 AS BIGINT))) // {den}
                  AS BIGINT) AS r
      FROM {prev} n LEFT JOIN (
        SELECT e.dst AS node_id,
               CAST(SUM(({prev}.r * e.w) // deg.deg) AS BIGINT) AS c
        FROM e JOIN deg USING (src)
               JOIN {prev} ON {prev}.node_id = e.src
        GROUP BY 1) s ON s.node_id = n.node_id)""")
        prev = f"it{k}"
    return f"""
    WITH {_CAND_CTES},
    pairs AS (SELECT a_id, b_id, CAST({_MATCHES} AS BIGINT) AS w FROM cands
              WHERE CAST({_MATCHES} AS DOUBLE) / {MINHASH_K} >= 0.25),
    e AS (SELECT a_id AS src, b_id AS dst, w FROM pairs
          UNION ALL SELECT b_id AS src, a_id AS dst, w FROM pairs),
    deg AS (SELECT src, CAST(SUM(w) AS BIGINT) AS deg FROM e GROUP BY 1),
    n0 AS (SELECT doc_id AS node_id, CAST({scale} AS BIGINT) AS r FROM docs),
    {", ".join(its)}
    SELECT node_id AS doc_id, r AS rank_fp FROM {prev}
    """


@query("x141_weighted_pagerank", oracle=_build_weighted_pagerank_oracle())
def x141_weighted_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x125 with SIMILARITY-WEIGHTED edges: a node's rank splits
    proportionally to the MinHash match count (an exact integer
    1..128) instead of evenly — a 120/128-band near-dup pulls more
    rank than a marginal 32/128 one, which is the right physics for a
    representativeness score over a similarity graph.  Contribution =
    (r*w) div sum_w, still pure int64 and bit-reproducible; tightened
    ceiling (num*n*scale*max_w < 2^63) documented in
    operators/graph.py with the drop-scale remedy.  Same checkpointed
    two-shuffle rounds as x125."""
    from ...operators.dedup import MINHASH_K, minhash_candidates, minhash_estimate
    from ...operators.graph import pagerank

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 1000)
    cands = minhash_candidates(docs).withColumn(
        "est_sim", minhash_estimate(F.col("a_sig"), F.col("b_sig"))
    )
    pairs = (
        cands.filter(F.col("est_sim") >= 0.25)
        .select(
            "a_id",
            "b_id",
            (F.col("est_sim") * MINHASH_K).cast("long").alias("w"),
        )
    )
    edges = pairs.select(
        F.col("a_id").alias("src"), F.col("b_id").alias("dst"), "w"
    ).unionByName(
        pairs.select(F.col("b_id").alias("src"), F.col("a_id").alias("dst"), "w")
    )
    return pagerank(
        edges,
        docs.select(F.col("doc_id").alias("node_id")),
        iters=3,
        weight_col="w",
    ).select(F.col("node_id").alias("doc_id"), "rank_fp")


def _build_hits_oracle(iters: int = 2, scale: int = 10**6) -> str:
    """Integer-HITS twin of _build_pagerank_oracle: each half-step is a
    raw in/out-sum CTE plus an L1 divide-by-quotient normalization
    (raw // greatest(1, sum(raw) // scale)) — bit-identical to
    operators/graph.py:hits."""
    parts = []
    prev_h = "n0"
    for k in range(1, iters + 1):
        parts.append(f"""
    ar{k} AS (SELECT n.node_id, COALESCE(s.c, CAST(0 AS BIGINT)) AS raw
              FROM n0 n LEFT JOIN (
                SELECT e.dst AS node_id, CAST(SUM(h.hub) AS BIGINT) AS c
                FROM e JOIN {prev_h} h ON h.node_id = e.src GROUP BY 1) s
              ON s.node_id = n.node_id),
    a{k} AS (SELECT node_id,
                    CAST(raw // greatest(CAST(1 AS BIGINT),
                         (SELECT SUM(raw) FROM ar{k}) // {scale}) AS BIGINT) AS auth
             FROM ar{k}),
    hr{k} AS (SELECT n.node_id, COALESCE(s.c, CAST(0 AS BIGINT)) AS raw
              FROM n0 n LEFT JOIN (
                SELECT e.src AS node_id, CAST(SUM(a.auth) AS BIGINT) AS c
                FROM e JOIN a{k} a ON a.node_id = e.dst GROUP BY 1) s
              ON s.node_id = n.node_id),
    h{k} AS (SELECT node_id,
                    CAST(raw // greatest(CAST(1 AS BIGINT),
                         (SELECT SUM(raw) FROM hr{k}) // {scale}) AS BIGINT) AS hub
             FROM hr{k})""")
        prev_h = f"h{k}"
    orient = "da.n_chars < db.n_chars OR (da.n_chars = db.n_chars AND p.a_id < p.b_id)"
    return f"""
    WITH {_CAND_CTES},
    pairs AS (SELECT a_id, b_id FROM cands
              WHERE CAST({_MATCHES} AS DOUBLE) / {MINHASH_K} >= 0.25),
    nc AS (SELECT doc_id, n_chars FROM documents WHERE doc_id < 1000),
    e AS (SELECT CASE WHEN {orient} THEN p.a_id ELSE p.b_id END AS src,
                 CASE WHEN {orient} THEN p.b_id ELSE p.a_id END AS dst
          FROM pairs p JOIN nc da ON da.doc_id = p.a_id
                       JOIN nc db ON db.doc_id = p.b_id),
    n0 AS (SELECT doc_id AS node_id, CAST({scale} AS BIGINT) AS hub FROM docs),
    {", ".join(parts)}
    SELECT h.node_id AS doc_id, h.hub AS hub_fp, a.auth AS auth_fp
    FROM h{iters} h JOIN a{iters} a USING (node_id)
    """


@query("x142_hits_containment", oracle=_build_hits_oracle())
def x142_hits_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs/authorities over the CONTAINMENT-ORIENTED near-dup
    graph: each candidate pair is directed fragment → container
    (fewer n_chars → more, ties by id), so authority scores surface
    the canonical long documents that many fragments point into and
    hub scores the stitched-together aggregator pages — the two roles
    a dedup retention policy treats oppositely (keep authorities,
    drop hubs), which PageRank's single score cannot separate.
    Integer fixed point with L1 divide-by-quotient normalization per
    half-step — bit-reproducible, no libm (operators/graph.py:hits);
    same checkpointed two-shuffle rounds + 1-row normalizer broadcast
    as x125."""
    from ...operators.dedup import minhash_candidates, minhash_estimate
    from ...operators.graph import hits

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 1000)
    pairs = (
        minhash_candidates(docs)
        .withColumn("est_sim", minhash_estimate(F.col("a_sig"), F.col("b_sig")))
        .filter(F.col("est_sim") >= 0.25)
        .select("a_id", "b_id")
    )
    nc = docs.select("doc_id", "n_chars")
    j = (
        pairs.join(nc.select(F.col("doc_id").alias("a_id"), F.col("n_chars").alias("na")), "a_id")
        .join(nc.select(F.col("doc_id").alias("b_id"), F.col("n_chars").alias("nb")), "b_id")
    )
    a_first = (F.col("na") < F.col("nb")) | (
        (F.col("na") == F.col("nb")) & (F.col("a_id") < F.col("b_id"))
    )
    edges = j.select(
        F.when(a_first, F.col("a_id")).otherwise(F.col("b_id")).alias("src"),
        F.when(a_first, F.col("b_id")).otherwise(F.col("a_id")).alias("dst"),
    )
    return hits(
        edges, docs.select(F.col("doc_id").alias("node_id")), iters=2
    ).select(F.col("node_id").alias("doc_id"), "hub_fp", "auth_fp")


def _build_label_prop_oracle(iters: int = 2) -> str:
    """Synchronous majority-vote rounds with clamped seeds — the SQL
    twin of operators/graph.py:propagate_labels (votes desc, label asc
    argmax; seeds re-clamped by anti-join each round)."""
    parts = []
    prev = "l0"
    for k in range(1, iters + 1):
        parts.append(f"""
    v{k} AS (SELECT e.dst AS node_id, l.label, CAST(count(*) AS BIGINT) AS votes
             FROM e JOIN {prev} l ON l.node_id = e.src GROUP BY 1, 2),
    w{k} AS (SELECT node_id, label FROM (
               SELECT node_id, label,
                      row_number() OVER (PARTITION BY node_id
                                         ORDER BY votes DESC, label ASC) AS rn
               FROM v{k}) WHERE rn = 1),
    l{k} AS (SELECT * FROM l0
             UNION ALL
             SELECT w.node_id, w.label FROM w{k} w
             LEFT JOIN l0 ON l0.node_id = w.node_id
             WHERE l0.node_id IS NULL)""")
        prev = f"l{k}"
    return f"""
    WITH {_CAND_CTES},
    pairs AS (SELECT a_id, b_id FROM cands
              WHERE CAST({_MATCHES} AS DOUBLE) / {MINHASH_K} >= 0.25),
    e AS (SELECT a_id AS src, b_id AS dst FROM pairs
          UNION ALL SELECT b_id AS src, a_id AS dst FROM pairs),
    l0 AS (SELECT vec_id AS node_id, CAST(min(label) AS BIGINT) AS label
           FROM embeddings WHERE vec_id % 5 = 0 AND vec_id < 1000
           GROUP BY 1),
    {", ".join(parts)}
    SELECT l.node_id AS doc_id, l.label,
           CAST(CASE WHEN s.node_id IS NULL THEN 0 ELSE 1 END AS INT) AS is_seed
    FROM l{iters} l LEFT JOIN l0 s ON s.node_id = l.node_id
    """


@query("x144_label_propagation", oracle=_build_label_prop_oracle())
def x144_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-supervised label spreading: every fifth document carries a
    vetted label (the embeddings table's label column standing in for
    a human-rated quality/domain tag); two majority-vote rounds over
    the symmetrized near-dup graph extend those labels to unlabeled
    neighbors — the transductive-classifier recipe for scaling a
    small labeled set across a 100 TB corpus without training a
    model.  Hard integer votes (no float diffusion), ties to the
    smallest label, seeds clamped, unreached docs stay unlabeled —
    all engine-portable (operators/graph.py:propagate_labels); per
    round one id-keyed join + one (node,label) agg + one argmax
    window over the VOTE table only."""
    from ...operators.dedup import minhash_candidates, minhash_estimate
    from ...operators.graph import propagate_labels

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 1000)
    emb = load_table(spark, sf_dir, "embeddings")
    pairs = (
        minhash_candidates(docs)
        .withColumn("est_sim", minhash_estimate(F.col("a_sig"), F.col("b_sig")))
        .filter(F.col("est_sim") >= 0.25)
        .select("a_id", "b_id")
    )
    edges = pairs.select(
        F.col("a_id").alias("src"), F.col("b_id").alias("dst")
    ).unionByName(pairs.select(F.col("b_id").alias("src"), F.col("a_id").alias("dst")))
    seeds = emb.filter((F.col("vec_id") % 5 == 0) & (F.col("vec_id") < 1000)).select(
        F.col("vec_id").alias("node_id"), F.col("label")
    )
    return propagate_labels(edges, seeds, iters=2).select(
        F.col("node_id").alias("doc_id"), "label", "is_seed"
    )


@query(
    "x146_triangle_stats",
    oracle=f"""
    WITH {_CAND_CTES},
    pairs AS (SELECT a_id, b_id FROM cands
              WHERE CAST({_MATCHES} AS DOUBLE) / {MINHASH_K} >= 0.25),
    und AS (SELECT DISTINCT least(a_id, b_id) AS u, greatest(a_id, b_id) AS v
            FROM pairs WHERE a_id <> b_id),
    sym AS (SELECT u AS node, v AS nbr FROM und
            UNION ALL SELECT v AS node, u AS nbr FROM und),
    deg AS (SELECT node, CAST(count(*) AS BIGINT) AS degree FROM sym GROUP BY 1),
    o AS (SELECT CASE WHEN du.degree < dv.degree
                        OR (du.degree = dv.degree AND u < v)
                      THEN u ELSE v END AS s,
                 CASE WHEN du.degree < dv.degree
                        OR (du.degree = dv.degree AND u < v)
                      THEN v ELSE u END AS d
          FROM und JOIN deg du ON du.node = u JOIN deg dv ON dv.node = v),
    w AS (SELECT e1.s AS s, e1.d AS d1, e2.d AS d2
          FROM o e1 JOIN o e2 ON e1.s = e2.s WHERE e1.d <> e2.d),
    tri AS (SELECT w.s AS n1, w.d1 AS n2, w.d2 AS n3
            FROM w JOIN o ON o.s = w.d1 AND o.d = w.d2),
    pn AS (SELECT node, CAST(count(*) AS BIGINT) AS n_triangles FROM (
             SELECT n1 AS node FROM tri
             UNION ALL SELECT n2 FROM tri
             UNION ALL SELECT n3 FROM tri) GROUP BY 1)
    SELECT deg.node AS doc_id, deg.degree,
           COALESCE(pn.n_triangles, CAST(0 AS BIGINT)) AS n_triangles,
           CASE WHEN deg.degree >= 2
                THEN 2.0 * CAST(COALESCE(pn.n_triangles, 0) AS DOUBLE)
                     / (CAST(deg.degree AS DOUBLE) * CAST(deg.degree - 1 AS DOUBLE))
                ELSE 0.0 END AS clustering
    FROM deg LEFT JOIN pn ON pn.node = deg.node
    """,
)
def x146_triangle_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counts + local clustering coefficient over the
    near-dup graph: boilerplate families are near-cliques (triangles
    ~ degree²) while LSH chaining artifacts are triangle-poor, so the
    coefficient separates "true duplicate cluster" from "transitive
    accident" BEFORE cluster_dedup merges a chain — the structural
    audit for x33/x93's clustering step.  Degree-ordered orientation
    (Suri & Vassilvitskii, WWW'11) bounds the wedge-join fan-out by
    the oriented out-degree (≤ O(sqrt E) — the arboricity bound), the
    property that makes exact triangle counting survive power-law hub
    nodes at 100 TB.  Exact integer counts; the coefficient is the
    one display division (operators/graph.py:triangle_stats)."""
    from ...operators.dedup import minhash_candidates, minhash_estimate
    from ...operators.graph import triangle_stats

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 1000)
    pairs = (
        minhash_candidates(docs)
        .withColumn("est_sim", minhash_estimate(F.col("a_sig"), F.col("b_sig")))
        .filter(F.col("est_sim") >= 0.25)
        .select("a_id", "b_id")
    )
    t = triangle_stats(pairs)
    return t.select(
        F.col("node").alias("doc_id"),
        "degree",
        "n_triangles",
        F.when(
            F.col("degree") >= 2,
            2.0
            * F.col("n_triangles").cast("double")
            / (F.col("degree").cast("double") * (F.col("degree") - 1).cast("double")),
        )
        .otherwise(F.lit(0.0))
        .alias("clustering"),
    )


def _hex_ladder(expr: str, hex_digits: int) -> str:
    """md5-hex -> integer bucket, the DuckDB twin of
    conv(substring(md5(x), 1, hex_digits), 16, 10)."""
    terms = [
        f"(strpos('0123456789abcdef', substr(md5({expr}), {i + 1}, 1)) - 1)"
        f" * {16 ** (hex_digits - 1 - i)}"
        for i in range(hex_digits)
    ]
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


@query(
    "x143_importance_weights",
    oracle=f"""
    WITH tb AS (SELECT doc_id, {_hex_ladder('t', 2)} AS b FROM (
                  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS t
                  FROM documents)),
    ttb AS (SELECT {_hex_ladder('t', 2)} AS b FROM (
              SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS t
              FROM documents WHERE lang = 'en')),
    rc AS (SELECT b, CAST(count(*) AS BIGINT) AS c_r FROM tb GROUP BY 1),
    tc AS (SELECT b, CAST(count(*) AS BIGINT) AS c_t FROM ttb GROUP BY 1),
    rt AS (SELECT CAST(COALESCE(SUM(c_r), 0) AS BIGINT) AS n_r FROM rc),
    tt AS (SELECT CAST(COALESCE(SUM(c_t), 0) AS BIGINT) AS n_t FROM tc),
    bk AS (SELECT ab.b,
                  CAST((COALESCE(c_t, CAST(0 AS BIGINT)) + 1) * CAST(1000000 AS BIGINT)
                       // (n_t + 256) AS BIGINT) AS pt_fp,
                  CAST((COALESCE(c_r, CAST(0 AS BIGINT)) + 1) * CAST(1000000 AS BIGINT)
                       // (n_r + 256) AS BIGINT) AS pr_fp
           FROM (SELECT b FROM rc UNION SELECT b FROM tc) ab
           LEFT JOIN rc ON rc.b = ab.b
           LEFT JOIN tc ON tc.b = ab.b
           CROSS JOIN rt CROSS JOIN tt),
    br AS (SELECT b, CAST(pt_fp * CAST(1000000 AS BIGINT)
                          // greatest(CAST(1 AS BIGINT), pr_fp) AS BIGINT) AS ratio_fp
           FROM bk)
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(SUM(ratio_fp) AS BIGINT) AS affinity_sum,
           CAST(SUM(ratio_fp) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_affinity
    FROM tb JOIN br USING (b) GROUP BY 1
    """,
)
def x143_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style target-affinity scoring (Xie et al. 2023): score
    every document by how much its hashed-unigram profile matches the
    English subset (the stand-in target domain) relative to the whole
    crawl, in the integer-ratio fixed-point surrogate of the
    log-ratio importance weight — the published select-by-domain
    recipe with the repo's no-libm exactness contract
    (operators/textstats.py:hashed_importance_weights).  Both
    distributions live in 256 hashed buckets, so the corpus
    contributes one bounded-group count and one per-doc agg; the
    bucket table broadcasts — no vocabulary-sized shuffle anywhere."""
    from ...operators.textstats import hashed_importance_weights

    docs = load_table(spark, sf_dir, "documents")
    return hashed_importance_weights(docs, docs.filter(F.col("lang") == "en"))


@query(
    "x145_ccnet_buckets",
    oracle="""
    WITH toks AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term
                  FROM documents),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
    c AS (SELECT term, CAST(sum(tf) AS BIGINT) AS c FROM tf GROUP BY 1),
    n AS (SELECT CAST(sum(tf) AS BIGINT) AS n_total FROM tf),
    s AS (SELECT doc_id,
                 CAST(sum(tf) AS BIGINT) AS n_tokens,
                 CAST(sum(tf * (n_total // c)) AS BIGINT) AS surprisal_sum,
                 CAST(CAST(sum(tf * (n_total // c)) AS BIGINT) AS DOUBLE)
                   / CAST(CAST(sum(tf) AS BIGINT) AS DOUBLE) AS avg_surprisal
          FROM tf JOIN c USING (term) CROSS JOIN n
          GROUP BY doc_id),
    r AS (SELECT s.doc_id, d.lang, s.avg_surprisal,
                 CAST(row_number() OVER (PARTITION BY d.lang
                                         ORDER BY s.avg_surprisal ASC,
                                                  s.doc_id ASC) AS BIGINT) AS rnk,
                 CAST(count(*) OVER (PARTITION BY d.lang) AS BIGINT) AS n_lang
          FROM s JOIN documents d USING (doc_id))
    SELECT doc_id, lang, avg_surprisal, rnk, n_lang,
           CASE WHEN 3 * rnk <= n_lang THEN 'head'
                WHEN 3 * rnk <= 2 * n_lang THEN 'middle'
                ELSE 'tail' END AS bucket
    FROM r
    """,
)
def x145_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style quality bucketing (Wenzek et al. 2020): rank every
    document WITHIN ITS LANGUAGE by LM surprisal (the perplexity
    proxy, x51's integer-exact unigram scorer) and cut each language
    into head/middle/tail terciles — the published recipe for
    stratifying a crawl before sampling (train mostly on head+middle,
    keep tail for diversity ablations).  Per-language ranking is the
    point (a global cut would call every non-dominant-language doc
    'tail' — x139's argument); tercile edges are exact integer
    comparisons 3·rank ≤ n, not a float quantile, so the assignment
    is bit-stable across engines.  Composition query: surprisal
    scorer → lang join → one per-lang window — each stage keeps its
    exactness contract (the x138 composition argument).  At 100 TB
    the scorer runs in snapshot mode (x85/x86) and the window keys on
    (lang), salting-free because scores ride a per-lang SORT, not a
    single reducer: rank windows shuffle by lang but Spark sorts
    within partitions distributively."""
    from ...operators.textstats import unigram_surprisal

    docs = load_table(spark, sf_dir, "documents")
    s = unigram_surprisal(docs)
    j = s.join(docs.select("doc_id", "lang"), "doc_id")
    w = Window.partitionBy("lang").orderBy(F.asc("avg_surprisal"), F.asc("doc_id"))
    wn = Window.partitionBy("lang")
    r = j.select(
        "doc_id",
        "lang",
        "avg_surprisal",
        F.row_number().over(w).cast("long").alias("rnk"),
        F.count("*").over(wn).cast("long").alias("n_lang"),
    )
    return r.withColumn(
        "bucket",
        F.when(3 * F.col("rnk") <= F.col("n_lang"), F.lit("head"))
        .when(3 * F.col("rnk") <= 2 * F.col("n_lang"), F.lit("middle"))
        .otherwise(F.lit("tail")),
    )


def _build_winnow_oracle(k: int = 3, w: int = 4, min_shared: int = 2) -> str:
    """DuckDB twin of winnow_fingerprints/winnow_candidates: same
    k-gram md5-8hex hashes, same left-fold rightmost-min selection
    (list_reduce's first-element init == the Spark aggregate's
    init-at-window-start), same MAX_BUCKET cap."""
    ladder = _hex_ladder("x", 8)
    fold = (
        "list_reduce(list_transform(range({lo}, {hi}), "
        "q -> {{'fp': hs[q], 'pos': q}}), "
        "(acc, x) -> CASE WHEN x.fp <= acc.fp THEN x ELSE acc END)"
    )
    return f"""
    WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 1000),
    g AS (SELECT doc_id, {_all_shingles_sql(k)} AS grams FROM d),
    h AS (SELECT doc_id, list_transform(grams, x -> {ladder}) AS hs FROM g),
    sel AS (SELECT doc_id, CASE
             WHEN len(hs) >= {w} THEN
               list_transform(range(1, len(hs) - {w} + 2),
                              j -> {fold.format(lo='j', hi=f'j + {w}')})
             WHEN len(hs) >= 1 THEN
               [{fold.format(lo='1', hi='len(hs) + 1')}]
             ELSE [] END AS sels FROM h),
    fp AS (SELECT DISTINCT doc_id, s.fp AS fp FROM (
             SELECT doc_id, unnest(sels) AS s FROM sel)),
    keep AS (SELECT fp FROM fp GROUP BY fp HAVING count(*) <= {MAX_BUCKET}),
    kept AS (SELECT fp.doc_id, fp.fp FROM fp JOIN keep USING (fp))
    SELECT a.doc_id AS a_id, b.doc_id AS b_id,
           CAST(count(*) AS BIGINT) AS n_shared
    FROM kept a JOIN kept b USING (fp) WHERE a.doc_id < b.doc_id
    GROUP BY 1, 2 HAVING count(*) >= {min_shared}
    """


@query("x147_winnow_candidates", oracle=_build_winnow_oracle())
def x147_winnow_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprint matching (Schleimer et al., SIGMOD'03 —
    the MOSS algorithm): per-document position-aware fingerprints by
    rightmost-min selection over sliding hash windows, then pairs
    sharing >= 2 fingerprints — GUARANTEED to catch any shared token
    run of length >= window+k-1 (the coverage theorem), which MinHash
    only catches probabilistically; the local-overlap complement of
    x07 (whole-doc similarity) and x83 (global substring mask).
    Selection is pure array-local codegen (one O(m·window) fold per
    doc, density ~2/(window+1)); the pair join blocks on int64
    fingerprints with the MAX_BUCKET degenerate-key cap BEFORE the
    quadratic step (operators/dedup.py:winnow_candidates)."""
    from ...operators.dedup import winnow_candidates

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 1000)
    return winnow_candidates(docs, k=3, window=4, min_shared=2)


@query(
    "x148_gopher_rules",
    oracle=r"""
    WITH m AS (
      SELECT doc_id,
             CAST(len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                                  x -> x <> '')) AS BIGINT) AS n_words,
             CAST(COALESCE(list_aggregate(
                    list_transform(string_split_regex(lower(trim(text)), '\s+'),
                                   x -> len(x)), 'sum'), 0) AS BIGINT) AS sum_len,
             CAST(len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                                  x -> regexp_matches(x, '[a-z]'))) AS BIGINT) AS n_alpha,
             CAST(len(list_filter(['the','be','to','of','and','that','have','with'],
                                  s -> list_contains(string_split_regex(lower(trim(text)), '\s+'), s)))
                  AS BIGINT) AS n_stop,
             CAST(len(string_split(text, chr(10))) AS BIGINT) AS n_lines,
             CAST(len(list_filter(string_split(text, chr(10)),
                                  l -> l LIKE '%...')) AS BIGINT) AS n_ell,
             CAST(len(list_filter(string_split(text, chr(10)),
                                  l -> ltrim(l) LIKE '-%' OR ltrim(l) LIKE '*%'
                                       OR ltrim(l) LIKE '•%')) AS BIGINT) AS n_bul,
             CAST((len(text) - len(replace(text, '#', '')))
                  + (len(text) - len(replace(text, '...', ''))) // 3
                  AS BIGINT) AS c_sym
      FROM documents),
    r AS (SELECT doc_id, n_words,
                 CAST(CASE WHEN n_words >= 50 AND n_words <= 100000 THEN 1 ELSE 0 END AS INT) AS r_word_count,
                 CAST(CASE WHEN sum_len >= 3 * n_words AND sum_len <= 10 * n_words THEN 1 ELSE 0 END AS INT) AS r_mean_word_len,
                 CAST(CASE WHEN 5 * n_alpha >= 4 * n_words THEN 1 ELSE 0 END AS INT) AS r_alpha_words,
                 CAST(CASE WHEN n_stop >= 2 THEN 1 ELSE 0 END AS INT) AS r_stopwords,
                 CAST(CASE WHEN 10 * n_ell <= 3 * n_lines THEN 1 ELSE 0 END AS INT) AS r_ellipsis_lines,
                 CAST(CASE WHEN 10 * n_bul <= 9 * n_lines THEN 1 ELSE 0 END AS INT) AS r_bullet_lines,
                 CAST(CASE WHEN 10 * c_sym <= n_words THEN 1 ELSE 0 END AS INT) AS r_symbol_ratio
          FROM m)
    SELECT *, CAST(r_word_count * r_mean_word_len * r_alpha_words * r_stopwords
                   * r_ellipsis_lines * r_bullet_lines * r_symbol_ratio AS INT) AS passes
    FROM r
    """,
)
def x148_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Gopher/MassiveText heuristic quality gate (Rae et al. 2021,
    Appendix A1) as one codegen projection: seven published rules
    (word count, mean word length, alphabetic-word fraction, stopword
    presence, ellipsis/bullet line fractions, symbol ratio) evaluated
    as pure integer cross-multiplications — no division, no libm, so
    the pass/fail bit is identical on any engine and the whole filter
    costs exactly ONE corpus pass with no shuffle and no UDF
    (operators/textstats.py:gopher_quality_flags).  The standard
    pre-filter that runs BEFORE dedup/scoring tiers in a pretraining
    pipeline."""
    from ...operators.textstats import gopher_quality_flags

    docs = load_table(spark, sf_dir, "documents")
    return gopher_quality_flags(docs)


@query(
    "x149_lang_reid_confusion",
    oracle=f"""
    WITH tb AS (SELECT doc_id, claimed, {_hex_ladder('t', 2)} AS b FROM (
                  SELECT doc_id, lang AS claimed,
                         unnest(regexp_extract_all(lower(text), '[a-z]+')) AS t
                  FROM documents)),
    dtf AS (SELECT doc_id, claimed, b, CAST(count(*) AS BIGINT) AS tf
            FROM tb GROUP BY 1, 2, 3),
    lc AS (SELECT claimed AS lang, b, CAST(count(*) AS BIGINT) AS c_t
           FROM tb GROUP BY 1, 2),
    lt AS (SELECT lang, CAST(SUM(c_t) AS BIGINT) AS n_t FROM lc GROUP BY 1),
    rc AS (SELECT b, CAST(count(*) AS BIGINT) AS c_r FROM tb GROUP BY 1),
    rt AS (SELECT CAST(COALESCE(SUM(c_r), 0) AS BIGINT) AS n_r FROM rc),
    rat AS (SELECT g.lang, g.b,
                   CAST((COALESCE(lc.c_t, CAST(0 AS BIGINT)) + 1) * CAST(1000000 AS BIGINT)
                        // (g.n_t + 256) AS BIGINT) AS pt_fp,
                   CAST((g.c_r + 1) * CAST(1000000 AS BIGINT)
                        // (n_r + 256) AS BIGINT) AS pr_fp
            FROM (SELECT lt.lang, lt.n_t, rc.b, rc.c_r
                  FROM lt CROSS JOIN rc) g
            LEFT JOIN lc ON lc.lang = g.lang AND lc.b = g.b
            CROSS JOIN rt),
    rr AS (SELECT lang, b,
                  CAST(pt_fp * CAST(1000000 AS BIGINT)
                       // greatest(CAST(1 AS BIGINT), pr_fp) AS BIGINT) AS ratio_fp
           FROM rat),
    sc AS (SELECT d.doc_id, d.claimed, r.lang,
                  CAST(SUM(d.tf * r.ratio_fp) AS BIGINT) AS score
           FROM dtf d JOIN rr r ON r.b = d.b GROUP BY 1, 2, 3),
    pr AS (SELECT doc_id, claimed, lang AS pred FROM (
             SELECT *, row_number() OVER (PARTITION BY doc_id
                                          ORDER BY score DESC, lang ASC) AS rn
             FROM sc) WHERE rn = 1)
    SELECT claimed, pred, CAST(count(*) AS BIGINT) AS n_docs
    FROM pr GROUP BY 1, 2
    """,
)
def x149_lang_reid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language re-identification confusion matrix: every document is
    scored against every declared language's hashed-unigram profile
    (the x143 integer-ratio machinery, one profile per language) and
    the argmax prediction is cross-tabulated against the declared
    ``lang`` — the metadata-trust audit run before any per-language
    threshold (x139/x145) is trusted, since mislabeled documents
    poison per-language statistics.  Profiles are |langs|·256 rows
    broadcast; the corpus shuffles exactly twice (bucket agg, score
    agg) regardless of language count; argmax ties break on the
    smallest language string — fully engine-portable
    (operators/textstats.py:hashed_lang_id)."""
    from ...operators.textstats import hashed_lang_id

    docs = load_table(spark, sf_dir, "documents")
    return (
        hashed_lang_id(docs)
        .groupBy("claimed", "pred")
        .agg(F.count("*").cast("long").alias("n_docs"))
    )


@query(
    "x150_split_leakage",
    oracle=f"""
    WITH {_CAND_CTES},
    pairs AS (SELECT a_id, b_id FROM cands
              WHERE CAST({_MATCHES} AS DOUBLE) / {MINHASH_K} >= 0.25),
    sp AS (SELECT doc_id,
                  CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'cccc' THEN 'train'
                       WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'e666' THEN 'val'
                       ELSE 'test' END AS split
           FROM documents WHERE doc_id < 1000),
    j AS (SELECT least(sa.split, sb.split) AS split_a,
                 greatest(sa.split, sb.split) AS split_b
          FROM pairs p JOIN sp sa ON sa.doc_id = p.a_id
                       JOIN sp sb ON sb.doc_id = p.b_id)
    SELECT split_a, split_b, CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(CASE WHEN split_a <> split_b THEN 1 ELSE 0 END AS INT) AS cross_split
    FROM j GROUP BY 1, 2
    """,
)
def x150_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-split LEAKAGE audit: the deterministic 80/10/10 hash split
    (x22) is safe against exact duplicates only if near-dups don't
    straddle the cut — this query counts MinHash near-dup pairs by
    (split, split) cell, and every off-diagonal row is memorization
    leakage (a test doc whose near-copy sits in train overestimates
    held-out performance; cf. Lee et al. 2022, "Deduplicating
    training data makes language models better", which measured
    exactly this effect).  The composition is the point: split
    assignment is a pure hash projection, the pair generation is the
    x07 banded pipeline, and the audit join keys on doc id — at
    100 TB this is the decontamination gate run BEFORE exporting
    shards, with the remedy being cluster-aware splitting (assign
    whole x34 components to one split)."""
    from ...operators.dedup import minhash_candidates, minhash_estimate
    from ...operators.sampling import train_val_test_split

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 1000)
    sp = train_val_test_split(docs, "doc_id").select("doc_id", "split")
    pairs = (
        minhash_candidates(docs)
        .withColumn("est_sim", minhash_estimate(F.col("a_sig"), F.col("b_sig")))
        .filter(F.col("est_sim") >= 0.25)
        .select("a_id", "b_id")
    )
    j = (
        pairs.join(
            sp.select(F.col("doc_id").alias("a_id"), F.col("split").alias("sa")),
            "a_id",
        )
        .join(
            sp.select(F.col("doc_id").alias("b_id"), F.col("split").alias("sb")),
            "b_id",
        )
        .select(
            F.least("sa", "sb").alias("split_a"),
            F.greatest("sa", "sb").alias("split_b"),
        )
    )
    return j.groupBy("split_a", "split_b").agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.when(F.col("split_a") != F.col("split_b"), 1)
        .otherwise(0)
        .cast("int")
        .alias("cross_split"),
    )


@query(
    "x151_cluster_aware_split",
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
    comp AS (SELECT node AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY node),
    sp AS (SELECT d.doc_id,
                  CASE WHEN substr(md5(CAST(COALESCE(c.cluster_id, d.doc_id) AS VARCHAR)), 1, 4) < 'cccc' THEN 'train'
                       WHEN substr(md5(CAST(COALESCE(c.cluster_id, d.doc_id) AS VARCHAR)), 1, 4) < 'e666' THEN 'val'
                       ELSE 'test' END AS split
           FROM docs d LEFT JOIN comp c ON c.doc_id = d.doc_id),
    j AS (SELECT least(sa.split, sb.split) AS split_a,
                 greatest(sa.split, sb.split) AS split_b
          FROM pairs p JOIN sp sa ON sa.doc_id = p.a_id
                       JOIN sp sb ON sb.doc_id = p.b_id)
    SELECT split_a, split_b, CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(CASE WHEN split_a <> split_b THEN 1 ELSE 0 END AS INT) AS cross_split
    FROM j GROUP BY 1, 2
    """,
)
def x151_cluster_aware_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The x150 remedy, proven: split on the NEAR-DUP COMPONENT id
    (min reachable doc id, x34's clustering) instead of the raw doc
    id, so every member of a duplicate family lands in the same split
    — re-running the leakage matrix over the same pair graph now
    yields ZERO off-diagonal cells by construction (the oracle
    verifies the matrix, not just the claim).  Unclustered docs fall
    back to their own id (coalesce), keeping the 80/10/10 hash split
    stable under corpus growth; the only additions over x22 are the
    component labeling (O(log diameter) id-keyed rounds over the
    post-blocking pair graph) and one left join — the
    cluster-then-split recipe every decontamination-aware pipeline
    ships."""
    from ...operators.dedup import minhash_candidates, minhash_estimate
    from ...operators.graph import connected_components
    from ...operators.sampling import hash_fraction_prefix, hex_threshold

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 1000)
    pairs = (
        minhash_candidates(docs)
        .withColumn("est_sim", minhash_estimate(F.col("a_sig"), F.col("b_sig")))
        .filter(F.col("est_sim") >= 0.25)
        .select("a_id", "b_id")
    )
    comp = connected_components(pairs).select(
        F.col("node").alias("doc_id"), "cluster_id"
    )
    keyed = docs.select("doc_id").join(comp, "doc_id", "left").withColumn(
        "skey", F.coalesce("cluster_id", "doc_id")
    )
    h = hash_fraction_prefix(F.col("skey"))
    sp = keyed.withColumn(
        "split",
        F.when(h < hex_threshold(0.8), "train")
        .when(h < hex_threshold(0.9), "val")
        .otherwise("test"),
    ).select("doc_id", "split")
    j = (
        pairs.join(
            sp.select(F.col("doc_id").alias("a_id"), F.col("split").alias("sa")),
            "a_id",
        )
        .join(
            sp.select(F.col("doc_id").alias("b_id"), F.col("split").alias("sb")),
            "b_id",
        )
        .select(
            F.least("sa", "sb").alias("split_a"),
            F.greatest("sa", "sb").alias("split_b"),
        )
    )
    return j.groupBy("split_a", "split_b").agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.when(F.col("split_a") != F.col("split_b"), 1)
        .otherwise(0)
        .cast("int")
        .alias("cross_split"),
    )


def _build_lsh_audit_oracle(max_id: int = 300, threshold: str = "0.25") -> str:
    """x152: the _CAND_CTES chain re-parameterized to the audit sample,
    plus the exact quadratic truth set over the same sample."""
    return f"""
    WITH docs AS (SELECT doc_id, text FROM documents WHERE doc_id < {max_id}),
    sh AS (SELECT doc_id, {_SHINGLES} AS s FROM docs),
    sigs AS (SELECT doc_id, s, [{_SIG_ELEMS}] AS sig FROM sh WHERE len(s) > 0),
    bands AS (
      SELECT doc_id, b.band_idx,
             md5(array_to_string(list_slice(sig, b.band_idx * {BAND_ROWS} + 1,
                                            b.band_idx * {BAND_ROWS} + {BAND_ROWS}), '|')) AS band_hash
      FROM sigs, (SELECT unnest(range(0, {_N_BANDS})) AS band_idx) b
    ),
    keep AS (SELECT band_idx, band_hash FROM bands GROUP BY 1, 2 HAVING count(*) <= {MAX_BUCKET}),
    kept AS (SELECT bands.* FROM bands JOIN keep USING (band_idx, band_hash)),
    cands AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
              FROM kept a JOIN kept b USING (band_idx, band_hash)
              WHERE a.doc_id < b.doc_id),
    truth AS (SELECT sa.doc_id AS a_id, sb.doc_id AS b_id
              FROM sigs sa JOIN sigs sb ON sa.doc_id < sb.doc_id
              WHERE len(list_intersect(sa.s, sb.s))
                    / CAST(len(list_distinct(list_concat(sa.s, sb.s))) AS DOUBLE) >= {threshold}),
    hit AS (SELECT t.a_id, t.b_id FROM truth t JOIN cands c
            ON c.a_id = t.a_id AND c.b_id = t.b_id),
    m AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM truth) AS n_true,
                 (SELECT CAST(count(*) AS BIGINT) FROM cands) AS n_cand,
                 (SELECT CAST(count(*) AS BIGINT) FROM hit) AS n_hit)
    SELECT n_true, n_cand, n_hit,
           CASE WHEN n_true > 0 THEN CAST(n_hit AS DOUBLE) / CAST(n_true AS DOUBLE)
                ELSE 0.0 END AS recall,
           CASE WHEN n_cand > 0 THEN CAST(n_hit AS DOUBLE) / CAST(n_cand AS DOUBLE)
                ELSE 0.0 END AS precision
    FROM m
    """


@query("x152_lsh_recall_audit", oracle=_build_lsh_audit_oracle())
def x152_lsh_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH PARAMETER audit: on a bounded sample (300 docs by
    contract — the truth set is quadratic, which is exactly why the
    production path uses banding), compare the banded candidate set
    against the exact-Jaccard >= 0.25 truth set and report
    recall/precision — the empirical check of the (bands, rows)
    S-curve that BENCH_NOTES' n_planes sizing rule demands before
    trusting a blocking config at 100 TB (the x60/x108/x137 audit
    convention applied to the MinHash tier).  Counts are exact
    integers; the two display divisions are the only floats.  The
    quadratic truth join is the AUDIT's cost, not the pipeline's, and
    is bounded by the sample cap."""
    from ...operators.dedup import exact_jaccard, minhash_candidates, shingles

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    sh = docs.select("doc_id", shingles(F.col("text")).alias("s")).filter(
        F.size("s") > 0
    )
    a = sh.select(F.col("doc_id").alias("a_id"), F.col("s").alias("sa"))
    b = sh.select(F.col("doc_id").alias("b_id"), F.col("s").alias("sb"))
    truth = (
        a.join(b, F.col("a_id") < F.col("b_id"))
        .withColumn("jac", exact_jaccard(F.col("sa"), F.col("sb")))
        .filter(F.col("jac") >= 0.25)
        .select("a_id", "b_id")
        .localCheckpoint(eager=False)
    )
    cands = minhash_candidates(docs).select("a_id", "b_id").localCheckpoint(
        eager=False
    )
    hit = truth.join(cands, ["a_id", "b_id"])
    m = (
        truth.agg(F.count("*").cast("long").alias("n_true"))
        .crossJoin(cands.agg(F.count("*").cast("long").alias("n_cand")))
        .crossJoin(hit.agg(F.count("*").cast("long").alias("n_hit")))
    )
    return m.select(
        "n_true",
        "n_cand",
        "n_hit",
        F.when(
            F.col("n_true") > 0,
            F.col("n_hit").cast("double") / F.col("n_true").cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("recall"),
        F.when(
            F.col("n_cand") > 0,
            F.col("n_hit").cast("double") / F.col("n_cand").cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("precision"),
    )


@query(
    "x153_modern_selection_pipeline",
    oracle=rf"""
    WITH m AS (
      SELECT doc_id,
             CAST(len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                                  x -> x <> '')) AS BIGINT) AS n_words,
             CAST(COALESCE(list_aggregate(
                    list_transform(string_split_regex(lower(trim(text)), '\s+'),
                                   x -> len(x)), 'sum'), 0) AS BIGINT) AS sum_len,
             CAST(len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                                  x -> regexp_matches(x, '[a-z]'))) AS BIGINT) AS n_alpha,
             CAST((len(text) - len(replace(text, '#', '')))
                  + (len(text) - len(replace(text, '...', ''))) // 3
                  AS BIGINT) AS c_sym
      FROM documents),
    gate AS (SELECT doc_id FROM m
             WHERE n_words >= 50 AND n_words <= 100000
               AND sum_len >= 3 * n_words AND sum_len <= 10 * n_words
               AND 5 * n_alpha >= 4 * n_words
               AND 10 * c_sym <= n_words),
    tb AS (SELECT doc_id, {_hex_ladder('t', 2)} AS b FROM (
             SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS t
             FROM documents)),
    ttb AS (SELECT {_hex_ladder('t', 2)} AS b FROM (
              SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS t
              FROM documents WHERE lang = 'en')),
    rc AS (SELECT b, CAST(count(*) AS BIGINT) AS c_r FROM tb GROUP BY 1),
    tc AS (SELECT b, CAST(count(*) AS BIGINT) AS c_t FROM ttb GROUP BY 1),
    rt AS (SELECT CAST(COALESCE(SUM(c_r), 0) AS BIGINT) AS n_r FROM rc),
    tt AS (SELECT CAST(COALESCE(SUM(c_t), 0) AS BIGINT) AS n_t FROM tc),
    bk AS (SELECT ab.b,
                  CAST((COALESCE(c_t, CAST(0 AS BIGINT)) + 1) * CAST(1000000 AS BIGINT)
                       // (n_t + 256) AS BIGINT) AS pt_fp,
                  CAST((COALESCE(c_r, CAST(0 AS BIGINT)) + 1) * CAST(1000000 AS BIGINT)
                       // (n_r + 256) AS BIGINT) AS pr_fp
           FROM (SELECT b FROM rc UNION SELECT b FROM tc) ab
           LEFT JOIN rc ON rc.b = ab.b
           LEFT JOIN tc ON tc.b = ab.b
           CROSS JOIN rt CROSS JOIN tt),
    br AS (SELECT b, CAST(pt_fp * CAST(1000000 AS BIGINT)
                          // greatest(CAST(1 AS BIGINT), pr_fp) AS BIGINT) AS ratio_fp
           FROM bk),
    aff AS (SELECT doc_id,
                   CAST(SUM(ratio_fp) AS BIGINT) AS affinity_sum,
                   CAST(SUM(ratio_fp) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_affinity
            FROM tb JOIN br USING (b) GROUP BY 1),
    wt AS (SELECT doc_id, CAST(len({_TOKS}) AS BIGINT) AS n_tokens FROM documents),
    sel AS (SELECT a.doc_id, wt.n_tokens, a.avg_affinity
            FROM aff a JOIN gate USING (doc_id) JOIN wt USING (doc_id)),
    r AS (SELECT doc_id, n_tokens, avg_affinity,
                 CAST(SUM(n_tokens) OVER (ORDER BY avg_affinity DESC, doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                   AS cum_tokens
          FROM sel)
    SELECT doc_id, n_tokens, avg_affinity, cum_tokens FROM r WHERE cum_tokens <= 5000
    """,
)
def x153_modern_selection_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 2023-vintage selection pipeline composed as ONE Catalyst
    plan — the successor to x54's hashed-classifier chain, built
    entirely from this round's tier:

    1. Gopher STRUCTURAL gate (x148's word-count, mean-word-length,
       alphabetic and symbol rules — the stopword/line rules are for
       natural prose and stay available on the flags table);
    2. DSIR target-affinity scoring (x143 — rank what's left by
       hashed-profile closeness to the English target);
    3. greedy token-budget selection (x44's two-phase prefix
       decomposition, 5 000 whitespace tokens).

    The gate is a codegen projection fused into the scan and the
    256-row profile broadcasts; corpus-sized shuffles are the
    affinity agg, the gate⋈affinity⋈tokens joins (all keyed on doc
    id — AQE broadcasts them at audit scale, and an id-bucketed
    layout co-locates them to zero at 100 TB), and the selection
    step's score-key exchanges.
    Gate → score → budget is exactly the DoReMi/DSIR-era recipe:
    cheap structural filters first, importance weighting second,
    budget cut last."""
    from ...operators.sampling import select_token_budget
    from ...operators.textstats import (
        gopher_quality_flags,
        hashed_importance_weights,
        token_count_col,
    )

    docs = load_table(spark, sf_dir, "documents")
    flags = gopher_quality_flags(docs)
    gate = flags.filter(
        (F.col("r_word_count") == 1)
        & (F.col("r_mean_word_len") == 1)
        & (F.col("r_alpha_words") == 1)
        & (F.col("r_symbol_ratio") == 1)
    ).select("doc_id")
    aff = hashed_importance_weights(docs, docs.filter(F.col("lang") == "en"))
    wt = docs.select("doc_id", token_count_col(F.col("text")).cast("long").alias("n_tokens"))
    sel = (
        aff.select("doc_id", "avg_affinity")
        .join(gate, "doc_id")
        .join(wt, "doc_id")
    )
    return select_token_budget(sel, "avg_affinity", "doc_id", "n_tokens", 5000).select(
        "doc_id", "n_tokens", "avg_affinity", "cum_tokens"
    )


@query(
    "x154_dup_ngram_stats",
    oracle=f"""
    WITH g2 AS (SELECT doc_id, unnest({_all_shingles_sql(2)}) AS g FROM documents),
    c2 AS (SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY 1, 2),
    a2 AS (SELECT doc_id,
                  CAST(SUM(len(g) * c) AS BIGINT) AS t_total,
                  CAST(MAX(len(g) * c) AS BIGINT) AS t_top
           FROM c2 GROUP BY 1),
    g5 AS (SELECT doc_id, unnest({_all_shingles_sql(5)}) AS g FROM documents),
    c5 AS (SELECT doc_id, g, count(*) AS c FROM g5 GROUP BY 1, 2),
    a5 AS (SELECT doc_id,
                  CAST(SUM(len(g) * c) AS BIGINT) AS d_total,
                  CAST(SUM(CASE WHEN c >= 2 THEN len(g) * c ELSE 0 END) AS BIGINT) AS d_dup
           FROM c5 GROUP BY 1),
    j AS (SELECT d.doc_id,
                 COALESCE(a2.t_total, CAST(0 AS BIGINT)) AS t_total,
                 COALESCE(a2.t_top, CAST(0 AS BIGINT)) AS t_top,
                 COALESCE(a5.d_total, CAST(0 AS BIGINT)) AS d_total,
                 COALESCE(a5.d_dup, CAST(0 AS BIGINT)) AS d_dup
          FROM documents d LEFT JOIN a2 ON a2.doc_id = d.doc_id
                           LEFT JOIN a5 ON a5.doc_id = d.doc_id)
    SELECT doc_id,
           CASE WHEN t_total > 0 THEN CAST(t_top AS DOUBLE) / CAST(t_total AS DOUBLE)
                ELSE 0.0 END AS top_frac,
           CASE WHEN d_total > 0 THEN CAST(d_dup AS DOUBLE) / CAST(d_total AS DOUBLE)
                ELSE 0.0 END AS dup_frac,
           CAST(CASE WHEN 5 * t_top <= t_total THEN 1 ELSE 0 END AS INT) AS r_top,
           CAST(CASE WHEN 20 * d_dup <= 3 * d_total THEN 1 ELSE 0 END AS INT) AS r_dup
    FROM j
    """,
)
def x154_dup_ngram_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The repetition half of the Gopher filter (dup/top n-gram
    character fractions — x148 covers the structural half, x32 the
    distinct-shingle ratio): top-2-gram char coverage ≤ 0.20 and
    duplicated-5-gram char mass ≤ 0.15, the published boilerplate/SEO
    detector.  Integer character-mass aggregates over (doc, gram)
    two-phase hash aggs; rules are cross-multiplications, fractions
    one display division each
    (operators/textstats.py:dup_ngram_stats)."""
    from ...operators.textstats import dup_ngram_stats

    docs = load_table(spark, sf_dir, "documents")
    return dup_ngram_stats(docs)


@query(
    "x155_importance_snapshot_probe",
    oracle=f"""
    WITH tbb AS (SELECT {_hex_ladder('t', 2)} AS b FROM (
                   SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS t
                   FROM documents WHERE doc_id < 250)),
    ttb AS (SELECT {_hex_ladder('t', 2)} AS b FROM (
              SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS t
              FROM documents WHERE doc_id < 250 AND lang = 'en')),
    rc AS (SELECT b, CAST(count(*) AS BIGINT) AS c_r FROM tbb GROUP BY 1),
    tc AS (SELECT b, CAST(count(*) AS BIGINT) AS c_t FROM ttb GROUP BY 1),
    rt AS (SELECT CAST(COALESCE(SUM(c_r), 0) AS BIGINT) AS n_r FROM rc),
    tt AS (SELECT CAST(COALESCE(SUM(c_t), 0) AS BIGINT) AS n_t FROM tc),
    grid AS (SELECT CAST(unnest(range(0, 256)) AS BIGINT) AS b),
    bk AS (SELECT g.b,
                  CAST((COALESCE(c_t, CAST(0 AS BIGINT)) + 1) * CAST(1000000 AS BIGINT)
                       // (n_t + 256) AS BIGINT) AS pt_fp,
                  CAST((COALESCE(c_r, CAST(0 AS BIGINT)) + 1) * CAST(1000000 AS BIGINT)
                       // (n_r + 256) AS BIGINT) AS pr_fp
           FROM grid g LEFT JOIN rc ON rc.b = g.b
                       LEFT JOIN tc ON tc.b = g.b
           CROSS JOIN rt CROSS JOIN tt),
    br AS (SELECT b, CAST(pt_fp * CAST(1000000 AS BIGINT)
                          // greatest(CAST(1 AS BIGINT), pr_fp) AS BIGINT) AS ratio_fp
           FROM bk),
    batch AS (SELECT doc_id, {_hex_ladder('t', 2)} AS b FROM (
                SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS t
                FROM documents WHERE doc_id >= 250))
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(SUM(ratio_fp) AS BIGINT) AS affinity_sum,
           CAST(SUM(ratio_fp) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_affinity
    FROM batch JOIN br USING (b) GROUP BY 1
    """,
)
def x155_importance_snapshot_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x143's snapshot-probe lifecycle (the x85/x86 contract applied
    to DSIR scoring): the standing corpus's 256-row bucket-ratio
    profile (doc_id < 250 as base, its English subset as target) is
    PERSISTED once and each daily batch (doc_id ≥ 250) scores against
    the snapshot — the profile builds never re-run, every shuffle's
    batch side is O(batch), and the full-grid persistence means a
    batch token can never miss the table (absent buckets carry the
    add-one floor).  The is-the-new-crawl-on-distribution gate a
    target-matched pipeline runs nightly
    (operators/textstats.py:importance_ratio_table)."""
    from ...operators.ann_index import ensure_index
    from ...operators.textstats import hashed_importance_weights, importance_ratio_table

    docs = load_table(spark, sf_dir, "documents")
    base = docs.filter(F.col("doc_id") < 250)
    path = _tagged_dir(_SCRATCH, "dsir_profile", "v1-split250", sf_dir=sf_dir)
    ensure_index(
        lambda: importance_ratio_table(base, base.filter(F.col("lang") == "en"))
        .write.mode("overwrite")
        .parquet(path),
        path,
    )
    snap = spark.read.parquet(path)
    return hashed_importance_weights(
        docs.filter(F.col("doc_id") >= 250), ratios=snap
    )


@query(
    "x156_cluster_size_histogram",
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
    sizes AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size
              FROM comp GROUP BY 1)
    SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters,
           CAST((cluster_size - 1) * count(*) AS BIGINT) AS docs_removable
    FROM sizes GROUP BY 1
    """,
)
def x156_cluster_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup PLANNING audit: the duplicate-family size distribution —
    for each component size, how many families exist and how many
    documents a keep-one-representative policy would remove
    ((size−1)·families).  Run BEFORE committing to a dedup pass: the
    histogram's tail says whether savings come from a few giant
    boilerplate families (investigate them first — they're often one
    template) or a long tail of pairs (safe to bulk-drop), and its
    total is the exact storage/compute savings estimate.  Components
    via the O(log diameter) hash-min rounds (x34); every aggregate
    runs over the COMPONENT table (≪ corpus after blocking)."""
    from ...operators.dedup import minhash_candidates, minhash_estimate
    from ...operators.graph import connected_components

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 1000)
    pairs = (
        minhash_candidates(docs)
        .withColumn("est_sim", minhash_estimate(F.col("a_sig"), F.col("b_sig")))
        .filter(F.col("est_sim") >= 0.25)
        .select("a_id", "b_id")
    )
    sizes = (
        connected_components(pairs)
        .groupBy("cluster_id")
        .agg(F.count("*").cast("long").alias("cluster_size"))
    )
    return sizes.groupBy("cluster_size").agg(
        F.count("*").cast("long").alias("n_clusters"),
        ((F.col("cluster_size") - 1) * F.count("*")).cast("long").alias(
            "docs_removable"
        ),
    )


