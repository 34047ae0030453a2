"""Standing audits: index health, drift, heavy keys, sketch stores
(CMS/HLL/Bloom), geo, referential, k-anonymity.

Split from ``plans/extensions.py`` at the round-14 close (r13 verdict
item 8) — code moved VERBATIM; the aggregator re-exports every name, so
``plans.extensions.<name>`` remains the stable public path."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window, functions as F
from ..registry import query
from ..tables import epoch_us, load_table
from ...operators.dedup import minhash_candidates, minhash_estimate
from ...operators.multimodal import media_from_documents
from ...operators.similarity import as_double_vec, hyperplanes
from ...operators.textstats import token_count_col
from .fragments import _TOKS, _VEC, _cos_sql
from .scratch import _SCRATCH, _fp_cached, _index_dir, _tagged_dir
from .ann import _QV_SQL, _build_lsh_oracle, _ensure_ivf_index, _query_vec
from .retrieval import _BM25_TABLES, _fold_sql

# ---------------------------------------------------------------------------
# Index-health + corpus-drift audits, round 9: the two standing checks
# a serving stack runs against its OWN artifacts — list-skew detection
# on the persisted IVF index (the Σm² bomb's early warning) and
# between-generation embedding drift (the re-embed trigger).
# ---------------------------------------------------------------------------

_X176_ORACLE = f"""
    WITH e AS (SELECT vec_id, {_VEC} AS v FROM embeddings),
    cents AS (SELECT vec_id AS centroid_id, v AS cvec FROM e WHERE vec_id < 16),
    assigned AS (
      SELECT e.vec_id, e.v, c.centroid_id,
             row_number() OVER (PARTITION BY e.vec_id
                                ORDER BY {_cos_sql('e.v', 'c.cvec')} DESC,
                                         c.centroid_id) AS rn
      FROM e CROSS JOIN cents c),
    best AS (SELECT vec_id, v, centroid_id FROM assigned WHERE rn = 1),
    sc AS (SELECT b.centroid_id,
                  CAST(floor({_cos_sql('b.v', 'c.cvec')} * 1048576.0) AS BIGINT)
                      AS cos_fp
           FROM best b JOIN cents c USING (centroid_id)),
    g AS (SELECT centroid_id,
                 CAST(count(*) AS BIGINT) AS n_vecs,
                 CAST(sum(cos_fp) AS BIGINT) AS sum_cos_fp,
                 CAST(min(cos_fp) AS BIGINT) AS min_cos_fp
          FROM sc GROUP BY centroid_id),
    t AS (SELECT CAST(sum(n_vecs) AS BIGINT) AS total FROM g)
    SELECT c.centroid_id,
           CAST(COALESCE(g.n_vecs, 0) AS BIGINT) AS n_vecs,
           CAST(COALESCE(g.n_vecs, 0) * 1000000 // t.total AS BIGINT) AS share_fp,
           g.sum_cos_fp, g.min_cos_fp
    FROM cents c LEFT JOIN g USING (centroid_id) CROSS JOIN t
"""


@query("x176_ivf_health_audit", oracle=_X176_ORACLE)
def x176_ivf_health_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Health audit of the STANDING IVF index (x21/x166/x168's shared
    artifact), read off the index itself — the nightly check that
    catches list skew BEFORE it becomes the pair stage's Σm² bomb
    (BENCH_NOTES: a within-list stage is quadratic in its largest
    list) or a probe-latency cliff: per inverted list, its size, its
    corpus share (ppm, integer), and the sum/min of member→centroid
    cosine in 2^20 fixed point — sum not mean, so every value is an
    order-free integer fold (the repo's determinism convention); min
    is the worst-assigned member, the boundary-quality signal that
    says "this list needs a re-trained quantizer".  LEFT join from
    the centroid sidecar keeps EMPTY lists visible (n_vecs=0, NULL
    cosines) — a dead list is exactly what the audit exists to
    surface.  Scale shape: one scan of the index (stored norms reused
    — no re-fold), a broadcast of the 16-row quantizer, ONE map-side-
    combined 16-group agg; the share window runs over the 16-row agg
    table, never the corpus (operators/ann_index.py:write_ivf_index,
    assign_to_centroids)."""
    from ...operators.ann_index import _centroids_path
    from ...operators.similarity import as_double_vec, dot, l2_norm

    path = _ensure_ivf_index(spark, sf_dir)
    idx = spark.read.parquet(path)
    cents = (
        spark.read.parquet(_centroids_path(path))
        .withColumn("c_n", l2_norm(F.col("cvec")))
    )
    cos = dot(as_double_vec("embedding"), F.col("cvec")) / (
        F.col("norm") * F.col("c_n")
    )
    scored = idx.join(F.broadcast(cents), "centroid_id").select(
        "centroid_id",
        F.floor(cos * F.lit(1048576.0)).cast("long").alias("cos_fp"),
    )
    g = scored.groupBy("centroid_id").agg(
        F.count("*").cast("long").alias("n_vecs"),
        F.sum("cos_fp").cast("long").alias("sum_cos_fp"),
        F.min("cos_fp").cast("long").alias("min_cos_fp"),
    )
    return (
        cents.select("centroid_id")
        .join(F.broadcast(g), "centroid_id", "left")
        .na.fill(0, ["n_vecs"])
        .select(
            "centroid_id",
            "n_vecs",
            F.expr("n_vecs * 1000000 DIV sum(n_vecs) OVER ()")
            .cast("long")
            .alias("share_fp"),
            "sum_cos_fp",
            "min_cos_fp",
        )
    )


_X177_ORACLE = f"""
    WITH e AS (SELECT vec_id,
                      list_transform({_VEC},
                                     x -> CAST(floor(x * 1024.0) AS BIGINT)) AS xq
               FROM embeddings),
    x AS (SELECT vec_id, unnest(xq) AS xv,
                 CAST(unnest(range(len(xq))) AS BIGINT) AS j
          FROM e),
    g AS (SELECT j,
                 CAST(sum(CASE WHEN vec_id % 2 = 0 THEN xv END) AS BIGINT) AS sum_a,
                 CAST(count(CASE WHEN vec_id % 2 = 0 THEN 1 END) AS BIGINT) AS n_a,
                 CAST(sum(CASE WHEN vec_id % 2 = 1 THEN xv END) AS BIGINT) AS sum_b,
                 CAST(count(CASE WHEN vec_id % 2 = 1 THEN 1 END) AS BIGINT) AS n_b
          FROM x GROUP BY j)
    SELECT CAST(j AS INT) AS dim_idx, sum_a, n_a, sum_b, n_b,
           CAST(floor((CAST(sum_b AS DOUBLE) / CAST(n_b AS DOUBLE)
                       - CAST(sum_a AS DOUBLE) / CAST(n_a AS DOUBLE))
                      * 1048576.0) AS BIGINT) AS drift_fp
    FROM g
"""


@query("x177_embedding_drift", oracle=_X177_ORACLE)
def x177_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension drift between two embedding GENERATIONS (even/odd
    vec_id as the stand-in generation split — the operator takes any
    predicate): the audit that decides when a re-embed or quantizer
    re-train is due, because every persisted ANN artifact (IVF lists,
    PQ codebooks, the spectral component) was fit to generation A's
    distribution and silently degrades as generation B drifts.  Each
    side's per-dim mean is derived from an ORDER-FREE integer sum of
    the 2^10-quantized matrix (the spectral module's quantization —
    exact), and drift_fp is the mean difference in 2^20 fixed point
    via elementwise IEEE ops on identical operands (deterministic
    cross-engine; the float risk is order-dependent REDUCTIONS, which
    this never does).  Scale shape: one scan, an array-local
    conditional fold widened by posexplode, ONE 64-group map-side-
    combined shuffle — the x130 shape without the iteration; output
    is d rows regardless of corpus size."""
    emb = load_table(spark, sf_dir, "embeddings")
    xq = F.transform(
        as_double_vec("embedding"),
        lambda x: F.floor(x * F.lit(1024.0)).cast("long"),
    )
    rows = emb.select(F.col("vec_id"), F.posexplode(xq).alias("j", "xv"))
    even = F.col("vec_id") % 2 == 0
    g = rows.groupBy("j").agg(
        F.sum(F.when(even, F.col("xv"))).cast("long").alias("sum_a"),
        F.count(F.when(even, F.lit(1))).cast("long").alias("n_a"),
        F.sum(F.when(~even, F.col("xv"))).cast("long").alias("sum_b"),
        F.count(F.when(~even, F.lit(1))).cast("long").alias("n_b"),
    )
    drift = F.floor(
        (
            F.col("sum_b").cast("double") / F.col("n_b").cast("double")
            - F.col("sum_a").cast("double") / F.col("n_a").cast("double")
        )
        * F.lit(1048576.0)
    ).cast("long")
    return g.select(
        F.col("j").cast("int").alias("dim_idx"),
        "sum_a", "n_a", "sum_b", "n_b",
        drift.alias("drift_fp"),
    )


_X178_ORACLE = f"""
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
    offs AS (SELECT doc_id, text, unnest(range(0, length(text), 150)) AS off
             FROM documents),
    pc AS (SELECT doc_id * 1048576 + off // 150 AS pid,
                  substr(text, CAST(off AS INT) + 1, 200) AS ptext
           FROM offs),
    ptoks AS (SELECT pid, unnest(regexp_extract_all(lower(ptext), '[a-z]+')) AS term
              FROM pc),
    ptf AS (SELECT pid, term, CAST(count(*) AS BIGINT) AS tf
            FROM ptoks GROUP BY 1, 2),
    pdl AS (SELECT pid, CAST(sum(tf) AS BIGINT) AS dl FROM ptf GROUP BY 1),
    pst AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(dl) AS BIGINT) AS l
            FROM pdl),
    pa AS (SELECT n, (l * 1024) // n AS avgdl_fp FROM pst WHERE n > 0),
    pdf AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM ptf GROUP BY 1),
    pm AS (SELECT qt.query_id, ptf.pid, ptf.tf, pdl.dl, pdf.df
           FROM qt JOIN ptf USING (term) JOIN pdl USING (pid)
                   JOIN pdf USING (term)),
    psc AS (SELECT query_id, pid,
                   CAST(sum(  ((1024 * (2*n - 2*df + 1)) // (2*df + 1))
                            * ((1024 * 22 * tf * avgdl_fp)
                               // (10 * tf * avgdl_fp + 3 * avgdl_fp
                                   + 9 * dl * 1024))
                         ) AS BIGINT) AS score_fp
            FROM pm CROSS JOIN pa GROUP BY 1, 2),
    sl AS (SELECT query_id, pid, score_fp FROM (
             SELECT query_id, pid, score_fp,
                    row_number() OVER (PARTITION BY query_id
                                       ORDER BY score_fp DESC, pid ASC) AS prank
             FROM psc) WHERE prank <= 50),
    best AS (SELECT query_id, pid // 1048576 AS doc_id,
                    pid % 1048576 AS chunk_idx, score_fp,
                    row_number() OVER (PARTITION BY query_id, pid // 1048576
                                       ORDER BY score_fp DESC,
                                                pid % 1048576 ASC) AS brn,
                    CAST(count(*) OVER (PARTITION BY query_id, pid // 1048576)
                         AS BIGINT) AS n_passages
             FROM sl),
    pool AS (SELECT query_id, doc_id, score_fp AS best_score_fp,
                    CAST(chunk_idx AS BIGINT) AS best_chunk, n_passages
             FROM best WHERE brn = 1),
    fin AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                           ORDER BY best_score_fp DESC, doc_id ASC) AS INT)
                       AS rank
            FROM pool)
    SELECT query_id, doc_id, best_score_fp, best_chunk, n_passages, rank,
           CAST(best_score_fp AS DOUBLE) / 1048576.0 AS best_score
    FROM fin WHERE rank <= 5
"""


@query("x178_passage_retrieval", oracle=_X178_ORACLE)
def x178_passage_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Passage-level retrieval with MAX-PASSAGE document pooling — the
    RAG serving shape: long documents are chunked into overlapping
    200-char windows (x50's chunker, zero-shuffle), the chunk corpus
    is scored as its own BM25 collection (passage-level dl/df/avgdl —
    a passage hit means THIS WINDOW answers the query, which document-
    level BM25 dilutes across the whole doc), each query keeps a
    50-passage shortlist, and documents rank by their BEST passage
    (max-pool, ties to the lowest chunk) with the passage count and
    winning chunk_idx carried for snippet routing.  Passage keys pack
    as doc_id·2^20+chunk_idx so the pooling is integer arithmetic, not
    a join back to the chunk table.  All integer fixed-point (the BM25
    chain's own scales).  Scale shape: chunking rides the scan's
    codegen; the scorer's shuffles carry O(matched passage postings)
    integer rows; pooling folds the 50-row-per-query shortlist.  At
    100 TB the chunk corpus becomes the persisted inverted index
    (write_inverted_index over passages — the x102 serve contract
    applies unchanged since passages ARE documents to the index)
    (operators/retrieval.py:bm25_topk; operators/textstats.py:
    chunk_documents)."""
    from ...operators.retrieval import (
        bm25_topk,
        materialize_queries,
        top_terms_queries,
    )
    from ...operators.textstats import chunk_documents

    docs = load_table(spark, sf_dir, "documents")
    queries = materialize_queries(
        top_terms_queries(docs, F.col("doc_id") % 50 == 0, n_terms=3)
    )
    # checkpoint the chunk corpus: bm25_topk scans its docs input twice
    # (token match + dl), and each scan would otherwise re-run the whole
    # chunker — the operator's dominant CPU term (measured r14)
    passages = chunk_documents(docs, size=200, stride=150).select(
        (F.col("doc_id") * F.lit(1048576) + F.col("chunk_idx"))
        .cast("long")
        .alias("passage_id"),
        F.col("chunk_text").alias("text"),
    ).localCheckpoint(eager=False)
    hits = bm25_topk(passages, queries, k=50, id_col="passage_id", text_col="text")
    parts = hits.select(
        "query_id",
        F.expr("doc_id DIV 1048576").cast("long").alias("src_doc"),
        (F.col("doc_id") % 1048576).cast("long").alias("chunk_idx"),
        "score_fp",
    )
    pool = parts.groupBy("query_id", "src_doc").agg(
        F.max("score_fp").cast("long").alias("best_score_fp"),
        F.expr("max_by(chunk_idx, struct(score_fp, -chunk_idx))")
        .cast("long")
        .alias("best_chunk"),
        F.count("*").cast("long").alias("n_passages"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("best_score_fp"), F.asc("src_doc")
    )
    return (
        pool.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 5)
        .select(
            "query_id",
            F.col("src_doc").alias("doc_id"),
            "best_score_fp",
            "best_chunk",
            "n_passages",
            "rank",
            (F.col("best_score_fp").cast("double") / F.lit(1048576.0)).alias(
                "best_score"
            ),
        )
    )


_X179_ORACLE = f"""
    WITH t AS (SELECT doc_id, CAST(len({_TOKS}) AS BIGINT) AS n_tok
               FROM documents),
    b AS (SELECT doc_id, n_tok, n_tok // 64 AS bucket FROM t),
    r AS (SELECT bucket, n_tok,
                 (row_number() OVER (PARTITION BY bucket
                                     ORDER BY n_tok, doc_id) - 1) // 32
                     AS batch_idx
          FROM b),
    g AS (SELECT bucket, batch_idx,
                 CAST(count(*) AS BIGINT) AS n_in_batch,
                 CAST(max(n_tok) AS BIGINT) AS max_tok,
                 CAST(sum(n_tok) AS BIGINT) AS sum_tok
          FROM r GROUP BY 1, 2)
    SELECT bucket,
           CAST(count(*) AS BIGINT) AS n_batches,
           CAST(sum(n_in_batch) AS BIGINT) AS n_docs,
           CAST(sum(sum_tok) AS BIGINT) AS real_tokens,
           CAST(sum(n_in_batch * max_tok - sum_tok) AS BIGINT) AS padded_tokens,
           CAST(sum(n_in_batch * max_tok - sum_tok) * 1000000
                // sum(n_in_batch * max_tok) AS BIGINT) AS waste_ppm
    FROM g GROUP BY 1
"""


@query("x179_padding_waste_audit", oracle=_X179_ORACLE)
def x179_padding_waste_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The padding tax: what a pad-to-longest training loader wastes
    per length bucket — docs bucket by n_tok/64, sort within bucket,
    batch in 32s, and every batch pads each member to its own max
    (n·max−Σ slots burned on pad tokens).  waste_ppm per bucket is the
    number that justifies the packing tier (x24/x159): compare against
    packed utilization and the decision is arithmetic, not folklore —
    and the per-bucket breakdown shows WHERE the tax is paid (wide
    buckets with fat tails, the last short batch of each bucket).
    All integers (counts, maxes, ppm by integer division).  Scale
    shape: the in-bucket (n_tok, doc_id) rank is a TWO-LEVEL prefix
    decomposition (the x159 machinery — a per-bucket window would put
    every same-length-range doc in ONE task at 100 TB): rank = docs of
    shorter lengths in the bucket (prefix over the ≤64-row
    (bucket, n_tok) count table) + docs of the same length in earlier
    doc_id chunks (prefix over the chunk count table) + row_number
    within a ≤4096-row (bucket, n_tok, chunk) partition.  Every window
    partition is bounded; both aggs are map-side combinable; output is
    ≤ max_len/64 rows at any corpus size."""
    from ...operators.textstats import token_count_col

    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id", token_count_col(F.col("text")).cast("long").alias("n_tok")
    )
    b = (
        t.withColumn("bucket", F.expr("n_tok DIV 64").cast("long"))
        .withColumn("chunk", F.expr("doc_id DIV 4096").cast("long"))
    )
    c1 = b.groupBy("bucket", "n_tok").agg(F.count("*").alias("c1"))
    w1 = Window.partitionBy("bucket").orderBy("n_tok")  # <=64 rows/bucket
    off1 = c1.withColumn("off1", F.sum("c1").over(w1) - F.col("c1")).drop("c1")
    c2 = b.groupBy("bucket", "n_tok", "chunk").agg(F.count("*").alias("c2"))
    w2 = Window.partitionBy("bucket", "n_tok").orderBy("chunk")  # chunk table
    off2 = c2.withColumn("off2", F.sum("c2").over(w2) - F.col("c2")).drop("c2")
    w3 = Window.partitionBy("bucket", "n_tok", "chunk").orderBy("doc_id")  # <=4096
    r = (
        b.withColumn("r3", F.row_number().over(w3).cast("long"))
        .join(off2, ["bucket", "n_tok", "chunk"])
        .join(off1, ["bucket", "n_tok"])
        .withColumn("rn", F.col("off1") + F.col("off2") + F.col("r3"))
        .withColumn("batch_idx", F.expr("CAST((rn - 1) DIV 32 AS BIGINT)")))
    g = r.groupBy("bucket", "batch_idx").agg(
        F.count("*").cast("long").alias("n_in_batch"),
        F.max("n_tok").cast("long").alias("max_tok"),
        F.sum("n_tok").cast("long").alias("sum_tok"),
    )
    return g.groupBy("bucket").agg(
        F.count("*").cast("long").alias("n_batches"),
        F.sum("n_in_batch").cast("long").alias("n_docs"),
        F.sum("sum_tok").cast("long").alias("real_tokens"),
        F.sum(F.col("n_in_batch") * F.col("max_tok") - F.col("sum_tok"))
        .cast("long")
        .alias("padded_tokens"),
        F.expr(
            "CAST(sum(n_in_batch * max_tok - sum_tok) * 1000000"
            " DIV sum(n_in_batch * max_tok) AS BIGINT)"
        ).alias("waste_ppm"),
    )


_X180_ORACLE = f"""
    WITH e AS (SELECT vec_id, {_VEC} AS v FROM embeddings),
         cents AS (SELECT vec_id AS centroid_id, v AS cvec FROM e WHERE vec_id < 16),
         q AS (SELECT {_QV_SQL} AS qv),
         assigned AS (
           SELECT e.vec_id, e.v, c.centroid_id,
                  row_number() OVER (PARTITION BY e.vec_id
                                     ORDER BY {_cos_sql('e.v', 'c.cvec')} DESC, c.centroid_id) AS rn
           FROM e CROSS JOIN cents c
         ),
         best AS (SELECT vec_id, v, centroid_id FROM assigned WHERE rn = 1),
         qc AS (SELECT centroid_id FROM cents
                ORDER BY {_cos_sql('cvec', '(SELECT qv FROM q)')} DESC, centroid_id LIMIT 1)
    SELECT vec_id, {_cos_sql('v', '(SELECT qv FROM q)')} AS cos_sim
    FROM best JOIN qc USING (centroid_id)
    ORDER BY cos_sim DESC, vec_id LIMIT 5
"""


@query("x180_ivf_compaction", oracle=_X180_ORACLE)
def x180_ivf_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LSM lifecycle for the VECTOR index — x116's IVF analogue,
    closing the maintenance loop x176's health audit opens: two
    disjoint generations land segmented under ``batch_id=N`` against a
    FROZEN bootstrap quantizer (first-16 of generation 0 — correct for
    layout homogeneity, but the lists skew as the corpus outgrows the
    bootstrap), ``compact_ivf_index`` merges them, RE-DERIVES the
    quantizer from the merged corpus and rewrites the batch layout
    (one file per list, fresh norms, re-bucketing point for the
    compute-optimal √(n/2) list count — fixed 16 here as the oracle-
    size convention), and the compacted index serves x21's probe.
    Oracle is x21's VERBATIM: compaction changes cost and layout,
    never results — the compacted index is bit-equal to a fresh batch
    build over the union because the re-derived first-n quantizer is
    deterministic (pinned by test).  At 100 TB this is the nightly
    job that keeps probe latency off the generation count while
    ingest stays streaming (operators/ann_index.py:compact_ivf_index,
    land_ivf_batch)."""
    from ...operators.ann_index import (
        compact_ivf_index,
        corpus_fingerprint,
        ensure_index,
        ivf_index_probe,
        land_ivf_batch,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    root = _index_dir(sf_dir, "ivf_lsm")
    seg, comp = os.path.join(root, "segmented"), os.path.join(root, "compacted")

    def build() -> None:
        from ...streaming.index import bootstrap_ivf_quantizer

        gen0 = emb.filter(F.col("vec_id") % 2 == 0)
        boot = (
            gen0.orderBy("vec_id")
            .limit(16)
            .select(
                F.col("vec_id").alias("centroid_id"),
                as_double_vec("embedding").alias("cvec"),
            )
        )
        bootstrap_ivf_quantizer(boot, seg)
        cents = boot
        land_ivf_batch(gen0, cents, seg, 0)
        land_ivf_batch(emb.filter(F.col("vec_id") % 2 == 1), cents, seg, 1)
        compact_ivf_index(spark, seg, comp, n_centroids=16)

    ensure_index(
        build,
        comp,
        fingerprint=_fp_cached(
            spark, sf_dir, "emb",
            lambda: corpus_fingerprint(emb, id_col="vec_id"),
        ),
    )
    return ivf_index_probe(spark, comp, _query_vec(spark, sf_dir), k=5, nprobe=1)


@query("x181_passage_index_serve", oracle=_X178_ORACLE)
def x181_passage_index_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x178 served from a PERSISTED passage-level inverted index — the
    lifecycle pair the retrieval tier keeps (x101→x102, x138→x173,
    x157→x168): passages ARE documents to the index, so
    ``write_inverted_index`` over the chunk corpus needs no new code
    (passage dl/df/avgdl denormalized at build exactly as doc-level),
    and the oracle is x178's VERBATIM because the index changes cost,
    never results.  Per-run work: the query workload is the SAME
    doc-level top-terms selection (bit-equal by the x101 contract),
    ``bm25_serve`` reads only the probed term buckets (IN-list
    partition filter + row-group skipping on the term-sorted files),
    and pooling folds the 50-row shortlists — chunking and passage
    tokenization are paid ONCE per corpus refresh inside the
    ensure_index build, never per query.  At 100 TB this is the RAG
    serving stack: a standing passage index + integer max-passage
    pooling (operators/retrieval.py:write_inverted_index/bm25_serve)."""
    from ...operators.ann_index import corpus_fingerprint, ensure_index
    from ...operators.retrieval import (
        bm25_serve,
        materialize_queries,
        top_terms_queries,
        write_inverted_index,
    )
    from ...operators.textstats import chunk_documents

    docs = load_table(spark, sf_dir, "documents")
    ppath = os.path.join(
        _tagged_dir(_SCRATCH, "passage_index", "v1", sf_dir=sf_dir), "full"
    )

    def build() -> None:
        passages = chunk_documents(docs, size=200, stride=150).select(
            (F.col("doc_id") * F.lit(1048576) + F.col("chunk_idx"))
            .cast("long")
            .alias("doc_id"),
            F.col("chunk_text").alias("text"),
        )
        write_inverted_index(passages, ppath)

    ensure_index(
        build,
        os.path.join(ppath, "stats"),
        fingerprint=_fp_cached(spark, sf_dir, "docs",
                                lambda: corpus_fingerprint(docs, id_col="doc_id")),
    )
    queries = materialize_queries(
        top_terms_queries(docs, F.col("doc_id") % 50 == 0, n_terms=3)
    )
    hits = bm25_serve(spark, queries, ppath, k=50)
    parts = hits.select(
        "query_id",
        F.expr("doc_id DIV 1048576").cast("long").alias("src_doc"),
        (F.col("doc_id") % 1048576).cast("long").alias("chunk_idx"),
        "score_fp",
    )
    pool = parts.groupBy("query_id", "src_doc").agg(
        F.max("score_fp").cast("long").alias("best_score_fp"),
        F.expr("max_by(chunk_idx, struct(score_fp, -chunk_idx))")
        .cast("long")
        .alias("best_chunk"),
        F.count("*").cast("long").alias("n_passages"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("best_score_fp"), F.asc("src_doc")
    )
    return (
        pool.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 5)
        .select(
            "query_id",
            F.col("src_doc").alias("doc_id"),
            "best_score_fp",
            "best_chunk",
            "n_passages",
            "rank",
            (F.col("best_score_fp").cast("double") / F.lit(1048576.0)).alias(
                "best_score"
            ),
        )
    )


_X182_ORACLE = f"""
    WITH e AS (SELECT vec_id, {_VEC} AS v FROM embeddings),
    b AS (SELECT vec_id,
                 {_fold_sql('list_transform(v, x -> x * x)')} AS n2,
                 len(list_filter(v, x -> isnan(x) OR isinf(x))) > 0 AS bad
          FROM e),
    oct AS (SELECT CAST(length(bin(CAST(floor(n2 * 1048576.0) AS BIGINT) + 1))
                        - 1 AS BIGINT) AS k,
                   CAST(count(*) AS BIGINT) AS n
            FROM b WHERE NOT bad AND n2 > 0 GROUP BY 1)
    SELECT 'octave' AS stat, k, n FROM oct
    UNION ALL
    SELECT 'total', CAST(0 AS BIGINT), CAST(count(*) AS BIGINT) FROM b
    UNION ALL
    SELECT 'zero_norm', CAST(0 AS BIGINT), CAST(count(*) AS BIGINT)
    FROM b WHERE NOT bad AND n2 = 0
    UNION ALL
    SELECT 'nonfinite', CAST(0 AS BIGINT), CAST(count(*) AS BIGINT)
    FROM b WHERE bad
"""


@query("x182_vector_hygiene", oracle=_X182_ORACLE)
def x182_vector_hygiene(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector-hygiene audit — the corpus-level check behind every
    zero-norm guard in the ANN/PQ tier (a zero or non-finite vector
    reaching cosine turns a top-k window into NaN ordering; the serve
    paths guard per-probe, this audits the CORPUS before an index
    build): per run, total vectors, zero-norm count, vectors with any
    NaN/±Inf element, and the norm² octave histogram (floor(log2) via
    binary-string length — the x164 libm-free convention, on the
    2^20-fixed-point norm²) whose shape flags silently re-scaled or
    truncated embedding generations (a 4-octave shift = someone
    re-normalized half the corpus; feeds the same decision as x177's
    drift).  The norm² fold is the array-sequential float fold both
    engines share (cosine's own convention).  Scale shape: ONE scan
    derives (n2, bad) — localCheckpointed for its four consumers (the
    x100 rule) — then three 1-row counts and a ≤64-group octave agg;
    output is O(octaves) at any corpus size."""
    from ...operators.similarity import as_double_vec

    emb = load_table(spark, sf_dir, "embeddings")
    v = as_double_vec("embedding")
    b = emb.select(
        F.aggregate(
            F.transform(v, lambda x: x * x), F.lit(0.0), lambda a, p: a + p
        ).alias("n2"),
        F.exists(
            v, lambda x: F.isnan(x) | (F.abs(x) == F.lit(float("inf")))
        ).alias("bad"),
    ).localCheckpoint(eager=False)
    nf = F.floor(F.col("n2") * F.lit(1048576.0)).cast("long")
    octave = (
        F.length(F.conv((nf + F.lit(1)).cast("string"), 10, 2)) - F.lit(1)
    ).cast("long")
    oct_rows = (
        b.filter(~F.col("bad") & (F.col("n2") > 0))
        .groupBy(octave.alias("k"))
        .agg(F.count("*").cast("long").alias("n"))
        .select(F.lit("octave").alias("stat"), "k", "n")
    )

    def one(name: str, frame) -> DataFrame:
        return frame.agg(F.count("*").cast("long").alias("n")).select(
            F.lit(name).alias("stat"), F.lit(0).cast("long").alias("k"), "n"
        )

    return (
        oct_rows.unionByName(one("total", b))
        .unionByName(one("zero_norm", b.filter(~F.col("bad") & (F.col("n2") == 0))))
        .unionByName(one("nonfinite", b.filter(F.col("bad"))))
    )


_X183_ORACLE = """
    WITH c AS (SELECT user_id, CAST(count(*) AS BIGINT) AS c
               FROM events GROUP BY 1),
    t AS (SELECT CAST(sum(c) AS BIGINT) AS total,
                 CAST(count(*) AS BIGINT) AS n_keys FROM c)
    SELECT user_id, c,
           CAST(c * 1000000 // total AS BIGINT) AS share_ppm,
           CAST((c * 1024 + total - 1) // total AS BIGINT) AS salt_factor,
           n_keys, total
    FROM c CROSS JOIN t
    ORDER BY c DESC, user_id ASC LIMIT 20
"""


@query("x183_heavy_key_audit", oracle=_X183_ORACLE)
def x183_heavy_key_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter join-key audit — the diagnostic that SIZES the
    skew remedy before a key-partitioned join or agg ships (the
    warehouse tier carries deterministic salting; this query computes
    the salt factor instead of guessing it): per top-20 key, its row
    count, corpus share in ppm, and ``salt_factor = ceil(c·1024 /
    total)`` — how many ways the key must split so no salted partition
    exceeds ~1/1024 of the corpus (integer ceiling division, no
    floats), alongside total/n_keys for the uniform baseline.  A
    salt_factor of 1 everywhere = skip salting (it costs a second
    shuffle); one key at 50+ = the key that would have owned the
    stage.  Scale shape: ONE map-side-combined count shuffle on the
    key; total/n_keys aggregate the COUNT table (never the corpus
    twice); the top-20 is TakeOrderedAndProject over the count table;
    the 1-row stats broadcast into the final projection."""
    events = load_table(spark, sf_dir, "events")
    c = events.groupBy("user_id").agg(F.count("*").cast("long").alias("c"))
    t = c.agg(
        F.sum("c").cast("long").alias("total"),
        F.count("*").cast("long").alias("n_keys"),
    )
    return (
        c.crossJoin(F.broadcast(t))
        .select(
            "user_id",
            "c",
            F.expr("CAST(c * 1000000 DIV total AS BIGINT)").alias("share_ppm"),
            F.expr("CAST((c * 1024 + total - 1) DIV total AS BIGINT)").alias(
                "salt_factor"
            ),
            "n_keys",
            "total",
        )
        .orderBy(F.desc("c"), F.asc("user_id"))
        .limit(20)
    )


@query("x184_lsh_compaction", oracle=_build_lsh_oracle(n_planes=5))
def x184_lsh_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH re-bucketing compaction — the third index family's LSM job,
    completing the maintenance triple (x116 inverted index, x180 IVF):
    two generations land segmented at the BOOTSTRAP plane count
    (4 planes — frozen for layout homogeneity while streaming), and
    ``compact_lsh_index`` merges them and RE-SIGNATURES at 5 planes
    (fixed here as the oracle convention; the production default is
    the measured ``lg(n/125)`` sizing rule — BENCH_NOTES' "blocking-key
    cardinality must scale with the corpus", whose violation was the
    unfinishable 1.2-billion-pair case).  The probe then reads 1 of 32
    partitions instead of 1 of 16 with half the expected bucket
    population — compaction is WHERE that dial turns without touching
    ingest.  Oracle: the 5-plane bucket probe derived from scratch —
    the compacted index is bit-equal to a fresh 5-plane batch build
    because hyperplanes are a deterministic function of (n_planes,
    dim) (operators/ann_index.py:compact_lsh_index)."""
    from ...operators.ann_index import (
        compact_lsh_index,
        corpus_fingerprint,
        ensure_index,
        lsh_index_probe,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    dim = 64
    root = _index_dir(sf_dir, "lsh_lsm")
    seg, comp = os.path.join(root, "segmented"), os.path.join(root, "compacted")

    def build() -> None:
        from ...operators.similarity import as_double_vec, hyperplanes, l2_norm, lsh_bucket

        planes = hyperplanes(4, dim)
        for gen, part in ((0, 0), (1, 1)):
            v = as_double_vec("embedding")
            (
                emb.filter(F.col("vec_id") % 2 == part)
                .withColumn("bucket", lsh_bucket(v, planes))
                .withColumn("norm", l2_norm(v))
                .repartition(F.col("bucket"))
                .write.mode("overwrite")
                .partitionBy("bucket")
                .parquet(os.path.join(seg, f"batch_id={gen}"))
            )
        compact_lsh_index(spark, seg, comp, dim, n_planes=5)

    ensure_index(
        build,
        comp,
        fingerprint=_fp_cached(
            spark, sf_dir, "emb",
            lambda: corpus_fingerprint(emb, id_col="vec_id"),
        ),
    )
    return lsh_index_probe(spark, comp, _query_vec(spark, sf_dir), k=5, n_planes=5)


def _cms_bucket_sql(key_expr: str, row_expr: str, width: int) -> str:
    """DuckDB twin of ``operators/sketch.py:cms_bucket`` — the first 8
    hex chars of md5(key || ':' || row) as an integer via the strpos
    ladder (no hex→int builtin portability trap), mod width."""
    h = f"md5(CAST({key_expr} AS VARCHAR) || ':' || CAST({row_expr} AS VARCHAR))"
    ladder = " + ".join(
        f"(strpos('0123456789abcdef', substr({h}, {j + 1}, 1)) - 1) * {16 ** (7 - j)}"
        for j in range(8)
    )
    return f"(CAST({ladder} AS BIGINT) % {width})"


def _build_cms_oracle(depth: int = 4, width: int = 1024, k: int = 20) -> str:
    rows = ", ".join(f"({i})" for i in range(depth))
    return f"""
    WITH c AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS c
               FROM events GROUP BY user_id),
    rws AS (SELECT * FROM (VALUES {rows}) AS r(i)),
    cells AS (SELECT r.i AS row,
                     {_cms_bucket_sql("c.user_id", "r.i", width)} AS bucket,
                     CAST(SUM(c.c) AS BIGINT) AS cell
              FROM c CROSS JOIN rws r GROUP BY 1, 2),
    top AS (SELECT user_id, c FROM c ORDER BY c DESC, user_id ASC LIMIT {k})
    SELECT t.user_id, t.c,
           CAST(MIN(cl.cell) AS BIGINT) AS est
    FROM top t CROSS JOIN rws r
    JOIN cells cl ON cl.row = r.i
                 AND cl.bucket = {_cms_bucket_sql("t.user_id", "r.i", width)}
    GROUP BY t.user_id, t.c
    ORDER BY c DESC, user_id ASC
    """


@query("x185_cms_heavy_hitters", oracle=_build_cms_oracle())
def x185_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch vs exact — the CONTINUOUS form of x183's
    heavy-key audit: the sketch's depth·width counters are what a
    100 TB pipeline keeps live (kilobytes, additive across landings —
    see ``streaming/stats.py:run_streaming_cms``), and this query pins
    its quality against ground truth: for the exact top-20 keys, the
    exact count beside the sketch estimate (min over the key's depth
    cells; overestimate-only, collisions only add — the property
    ``tests/test_sketch.py`` pins for EVERY key).  Scale shape: the
    count table derives once (lazy localCheckpoint — the
    type-table-with-N-consumers finding) from ONE map-side-combined
    key shuffle; the cell fold shuffles ≤ depth·width rows; counters
    broadcast into the probe.  Oracle: identical md5-slice arithmetic
    cell by cell (operators/sketch.py)."""
    from ...operators.sketch import cms_estimate, cms_from_counts

    events = load_table(spark, sf_dir, "events")
    counts = (
        events.groupBy("user_id")
        .agg(F.count("*").cast("long").alias("c"))
        .localCheckpoint(eager=False)
    )
    counters = cms_from_counts(counts, "user_id", "c", depth=4, width=1024)
    top = counts.orderBy(F.desc("c"), F.asc("user_id")).limit(20)
    return (
        cms_estimate(top, counters, "user_id", depth=4, width=1024)
        .select("user_id", "c", "est")
        .orderBy(F.desc("c"), F.asc("user_id"))
    )


def _blob_sig_sql(bits: int = 32) -> str:
    """DuckDB twin of ``multimodal.blob_simhash``'s sign-fold, over a
    precomputed shingle-md5 list column ``hs``."""
    terms = []
    for j in range(bits):
        bit_sum = (
            "list_reduce(list_prepend(0, list_transform(hs, "
            f"h -> CASE WHEN substr(h, {j + 1}, 1) >= '8' THEN 1 ELSE -1 END)), "
            "(acc, x) -> acc + x)"
        )
        terms.append(f"CASE WHEN {bit_sum} > 0 THEN CAST({1 << j} AS BIGINT) ELSE 0 END")
    return " + ".join(terms)


def _build_blob_near_dup_oracle(
    gram: int = 8, stride: int = 4, bits: int = 32, n_bands: int = 4,
    radius: int = 3, max_bucket: int = 50,
) -> str:
    w = bits // n_bands
    divisors = ", ".join(f"({b}, {1 << (b * w)})" for b in range(n_bands))
    ham = " + ".join(
        f"CAST((xor(a_sig, b_sig) // {1 << j}) % 2 AS INT)" for j in range(bits)
    )
    return f"""
    WITH m AS (SELECT doc_id AS media_id, text AS t FROM documents),
    sh AS (SELECT media_id,
                  [md5(substr(t, i, {gram}))
                   FOR i IN range(1, greatest(length(t) - {gram} + 1, 1) + 1, {stride})] AS hs
           FROM m),
    sig AS (SELECT media_id, {_blob_sig_sql(bits)} AS sig FROM sh),
    bands AS (SELECT media_id, sig, d.b AS band_idx,
                     CAST((sig // d.dv) % {1 << w} AS INT) AS band_val
              FROM sig CROSS JOIN (VALUES {divisors}) AS d(b, dv)
              QUALIFY COUNT(*) OVER (PARTITION BY d.b, (sig // d.dv) % {1 << w}) <= {max_bucket}),
    cand AS (SELECT DISTINCT a.media_id AS a_id, b.media_id AS b_id,
                    a.sig AS a_sig, b.sig AS b_sig
             FROM bands a JOIN bands b
               ON a.band_idx = b.band_idx AND a.band_val = b.band_val
              AND a.media_id < b.media_id)
    SELECT a_id, b_id, ({ham}) AS hamming
    FROM cand WHERE ({ham}) <= {radius}
    """


@query("x186_blob_near_dup", oracle=_build_blob_near_dup_oracle())
def x186_blob_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal near-duplicate pairs WITHOUT a decoder — the dedup
    semantics the brief's multimodal tier was missing: blobs are
    fingerprinted from their raw bytes (``blob_simhash``: 8-byte
    shingles every 4 bytes, one md5 each, 32-bit SimHash sign-fold —
    executed as posexplode + one map-side-combined groupBy, all JVM
    expressions, no Python; the earlier row-local higher-order-fold
    form measured ~6x slower and was dropped — see blob_simhash's
    docstring), banded into 4 × 8-bit slices, bucket-joined, and verified
    by exact Hamming popcount ≤ 3 (pigeonhole: radius < n_bands ⇒ a
    true pair agrees on ≥1 band).  The media table is the deterministic
    fake (utf-8 bytes — brief contract: codecs stubbed, plumbing real);
    the operator itself reads only ``BINARY`` payload bytes, so a real
    image/audio corpus runs the identical plan.  Scale shape: one
    band-bucket shuffle + the degenerate-bucket cap (≤50) shared with
    the MinHash tier; the oracle reproduces shingles, fold, banding,
    cap, and popcount bit-for-bit (ASCII corpus ⇒ DuckDB char slices =
    byte slices)."""
    from ...operators.multimodal import blob_near_dup

    docs = load_table(spark, sf_dir, "documents")
    return blob_near_dup(media_from_documents(docs)).orderBy("a_id", "b_id")


def _build_hll_oracle(p: int = 8) -> str:
    nhex = (p + 3) // 4
    hexn = " + ".join(
        f"(strpos('0123456789abcdef', substr(h, {j + 1}, 1)) - 1) * {16 ** (nhex - 1 - j)}"
        for j in range(nhex)
    )
    hex8 = " + ".join(
        f"(strpos('0123456789abcdef', substr(h, {nhex + j + 1}, 1)) - 1) * {16 ** (7 - j)}"
        for j in range(8)
    )
    return f"""
    WITH k AS (SELECT md5(CAST(o_custkey AS VARCHAR)) AS h FROM orders),
    rr AS (SELECT CAST(({hexn}) % {1 << p} AS BIGINT) AS reg,
                  CAST({hex8} AS BIGINT) AS v
           FROM k)
    SELECT reg,
           CAST(MAX(CASE WHEN v = 0 THEN 33 ELSE 33 - length(bin(v)) END) AS INTEGER)
             AS rho_max
    FROM rr GROUP BY reg
    """


@query("x187_hll_registers", oracle=_build_hll_oracle())
def x187_hll_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable HyperLogLog registers — x15's A4-at-scale claim made
    INSPECTABLE and mergeable: where x15 trusts Spark's built-in HLL++
    aggregate, this query materializes the sketch itself (2^8 (reg,
    rho_max) rows over the same ``o_custkey`` universe) in the repo's
    portable md5-slice arithmetic, so (a) a DuckDB oracle reproduces
    every register bit-for-bit, (b) the registers MAX-merge across any
    corpus split — the streamed landing (streaming/stats.py:
    run_streaming_hll) is exact by algebra, completing the mergeable-
    sketch trio: sum-merge (CMS x185, histograms, drift sums) and now
    max-merge, and (c) the estimate read-off (``hll_estimate``) is a
    driver-side fold over kilobytes, accuracy pinned in pytest at
    planted cardinalities.  Scale shape: ONE scan, map-side partial
    max, 2^p rows per task on the wire — no distinct shuffle at any
    corpus size (operators/sketch.py:hll_registers)."""
    from ...operators.sketch import hll_registers

    orders = load_table(spark, sf_dir, "orders")
    return hll_registers(orders, "o_custkey", p=8).orderBy("reg")


from ..registry import ORACLES as _ORACLES  # noqa: E402  (x188 reuses x34's closure verbatim)


@query("x188_incremental_components", oracle=_ORACLES["x34_duplicate_clusters"])
def x188_incremental_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental connected components — x34's clustering as the
    MAINTENANCE job a streaming dedup pipeline runs per landing: the
    x34 near-dup pair graph is split into two deterministic edge
    generations ((a_id+b_id) parity), generation 0 is labeled and
    STORED, and the new generation folds into the store via
    ``merge_components`` — each stored component compresses to a star,
    so the merge never re-reads historical edges and its rounds
    converge in the BATCH's diameter, not the accumulated graph's.
    The oracle is x34's recursive-CTE closure over ALL pairs,
    verbatim: star-compression preserves connectivity and min-id
    labels exactly (operators/graph.py:merge_components; chained-
    increment bit-equality pinned in tests/test_graph.py)."""
    from ...operators.graph import connected_components, merge_components

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 1000)
    pairs = (
        minhash_candidates(docs)
        .withColumn("est_sim", minhash_estimate(F.col("a_sig"), F.col("b_sig")))
        .filter(F.col("est_sim") >= 0.25)
        .select("a_id", "b_id")
        .localCheckpoint(eager=False)
    )
    parity = (F.col("a_id") + F.col("b_id")) % 2
    store = connected_components(pairs.filter(parity == 0))
    merged = merge_components(store, pairs.filter(parity == 1))
    return merged.select(F.col("node").alias("doc_id"), "cluster_id")


@query(
    "x189_rollup_datasheet",
    oracle="""
    SELECT coalesce(lang, '(all)') AS lang,
           coalesce(source, '(all)') AS source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS n_chars,
           CAST(CASE WHEN lang IS NULL AND source IS NULL THEN 3
                     WHEN source IS NULL THEN 1
                     WHEN lang IS NULL THEN 2
                     ELSE 0 END AS BIGINT) AS gid
    FROM documents
    GROUP BY GROUPING SETS ((lang, source), (lang), (source), ())
    """,
)
def x189_rollup_datasheet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus composition at every aggregation level in ONE pass —
    ``GROUPING SETS ((lang, source), (lang), (source), ())``, the
    datasheet query a mixture designer reads before touching weights
    (per-cell, per-language, per-source, and grand-total doc/char
    masses).  Spark executes grouping sets with a map-side Expand (each
    input row fans to |sets| grouping tuples BEFORE the exchange, then
    one ordinary partial-agg shuffle) — one corpus scan replaces four,
    and the fan-out compresses in the map-side combine, so the wire
    still carries one row per live group per task.  ``grouping_id``
    disambiguates a real NULL group value from a rolled-up level (both
    engines' NULL placeholder) — the output coalesces display labels
    and keeps ``gid`` so no (lang='(all)') string collision can alias a
    rollup row.  Oracle: DuckDB's GROUPING SETS with the same gid
    arithmetic."""
    docs = load_table(spark, sf_dir, "documents")
    # the exact grouping-set list needs the SQL surface (DataFrame
    # cube()/rollup() cover only their fixed lattices)
    docs.createOrReplaceTempView("x189_docs")
    return spark.sql(
        """
        SELECT coalesce(lang, '(all)') AS lang,
               coalesce(source, '(all)') AS source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS n_chars,
               CAST(grouping_id(lang, source) AS BIGINT) AS gid
        FROM x189_docs
        GROUP BY GROUPING SETS ((lang, source), (lang), (source), ())
        """
    )


@query(
    "x190_column_stats",
    oracle="""
    SELECT 'event_id' AS col_name, CAST(COUNT(event_id) AS BIGINT) AS n,
           CAST(COUNT(*) - COUNT(event_id) AS BIGINT) AS n_nulls,
           CAST(COUNT(DISTINCT event_id) AS BIGINT) AS ndv,
           CAST(MIN(event_id) AS DOUBLE) AS min_num,
           CAST(MAX(event_id) AS DOUBLE) AS max_num,
           CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
    FROM events
    UNION ALL
    SELECT 'user_id', CAST(COUNT(user_id) AS BIGINT),
           CAST(COUNT(*) - COUNT(user_id) AS BIGINT),
           CAST(COUNT(DISTINCT user_id) AS BIGINT),
           CAST(MIN(user_id) AS DOUBLE), CAST(MAX(user_id) AS DOUBLE),
           NULL, NULL
    FROM events
    UNION ALL
    SELECT 'value', CAST(COUNT(value) AS BIGINT),
           CAST(COUNT(*) - COUNT(value) AS BIGINT),
           CAST(COUNT(DISTINCT value) AS BIGINT),
           CAST(MIN(value) AS DOUBLE), CAST(MAX(value) AS DOUBLE),
           NULL, NULL
    FROM events
    UNION ALL
    SELECT 'event_type', CAST(COUNT(event_type) AS BIGINT),
           CAST(COUNT(*) - COUNT(event_type) AS BIGINT),
           CAST(COUNT(DISTINCT event_type) AS BIGINT),
           CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
           MIN(event_type), MAX(event_type)
    FROM events
    """,
)
def x190_column_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-TABLE-equivalent column statistics in ONE corpus pass —
    per column: non-null count, null count, exact NDV, min/max (typed:
    numeric columns report doubles, string columns report strings) —
    the statistics a cost-based optimizer, a salt-factor sizer (x183),
    or a register-sketch consumer (x187 estimates NDV where exact is
    too dear) reads before planning.  Spark executes the four
    COUNT(DISTINCT)s in one aggregate via a map-side Expand (the x165
    datasheet shape — one scan, not one per column; plan-pinned), and
    the wide 1-row result unpivots to long form with ``stack`` — no
    second scan, no driver loop.  The oracle is the spec form: one
    UNION-ALL arm per column.  The 100-TB form is
    :func:`column_stats_approx` below — built and ×100-priced, not
    just documented."""
    events = load_table(spark, sf_dir, "events")
    return _column_stats(events, approx_ndv=False)


def _column_stats(events: DataFrame, approx_ndv: bool) -> DataFrame:
    """Shared body of x190: ``approx_ndv=False`` is the exact spec form
    (multi-COUNT(DISTINCT) via map-side Expand — the plan multiplies
    every row ×|distinct-columns|+1 before the partial agg, and the
    shuffle carries the full per-column distinct key space).
    ``approx_ndv=True`` is the scale form: ``approx_count_distinct``
    (Spark's native HLL++, rsd 2.5%) — ONE un-expanded pass, sketch-
    sized shuffle, everything else (counts, nulls, min/max) identical
    and still exact."""
    ndv = (
        (lambda c: F.approx_count_distinct(c, rsd=0.025))
        if approx_ndv
        else F.countDistinct
    )
    wide = events.agg(
        *[
            F.count(c).cast("long").alias(f"n_{c}")
            for c in ("event_id", "user_id", "value", "event_type")
        ],
        F.count("*").cast("long").alias("n_all"),
        *[
            ndv(c).cast("long").alias(f"ndv_{c}")
            for c in ("event_id", "user_id", "value", "event_type")
        ],
        *[
            F.min(c).cast("double").alias(f"min_{c}")
            for c in ("event_id", "user_id", "value")
        ],
        *[
            F.max(c).cast("double").alias(f"max_{c}")
            for c in ("event_id", "user_id", "value")
        ],
        F.min("event_type").alias("mins_event_type"),
        F.max("event_type").alias("maxs_event_type"),
    )
    arms = []
    for c in ("event_id", "user_id", "value"):
        arms.append(
            f"'{c}', n_{c}, n_all - n_{c}, ndv_{c}, min_{c}, max_{c}, "
            "CAST(NULL AS STRING), CAST(NULL AS STRING)"
        )
    arms.append(
        "'event_type', n_event_type, n_all - n_event_type, ndv_event_type, "
        "CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), mins_event_type, maxs_event_type"
    )
    return wide.selectExpr(
        f"stack(4, {', '.join(arms)}) AS "
        "(col_name, n, n_nulls, ndv, min_num, max_num, min_str, max_str)"
    )


def column_stats_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x190's 100-TB form (the swap BENCH_NOTES documents, built): the
    exact multi-distinct Expand carries a worst-case 60 M-distinct
    shuffle at ×100; HLL++ replaces it with a sketch-sized one and the
    plan loses the Expand entirely.  Not oracle-registered (the NDVs
    are estimates); pinned by pytest within 3×rsd of the exact form and
    plan-pinned Expand-free, priced at ×100 in scale_bench."""
    events = load_table(spark, sf_dir, "events")
    return _column_stats(events, approx_ndv=True)


@query(
    "x191_burst_detection",
    oracle="""
    WITH d AS (SELECT user_id, CAST(ts AS DATE) AS day,
                      CAST(COUNT(*) AS BIGINT) AS c
               FROM events GROUP BY 1, 2),
    s AS (SELECT user_id, day, c,
                 CAST(COUNT(*) OVER w AS BIGINT) AS n_days,
                 CAST(SUM(c) OVER w AS BIGINT) AS s_c,
                 CAST(SUM(c * c) OVER w AS BIGINT) AS q_c
          FROM d WINDOW w AS (PARTITION BY user_id)),
    z AS (SELECT user_id, day, c, n_days,
                 n_days * c - s_c AS dev_n,
                 CASE WHEN n_days * c - s_c > 0
                       AND CAST(n_days * c - s_c AS DECIMAL(38,0))
                           * CAST(n_days * c - s_c AS DECIMAL(38,0))
                           > 4 * (CAST(n_days AS DECIMAL(38,0)) * q_c - CAST(s_c AS DECIMAL(38,0)) * s_c)
                      THEN true ELSE false END AS burst
          FROM s)
    SELECT user_id, day, c, n_days, dev_n, burst
    FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                                       ORDER BY dev_n DESC, day ASC) AS rn
          FROM z)
    WHERE rn = 1
    ORDER BY user_id
    """,
)
def x191_burst_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key burst detection — the operational question AFTER the
    heavy-hitter audits (x183 exact, x185 continuous): not "which keys
    are big" but "which key just SPIKED against its own history".  For
    every user, the peak day (max deviation, day tiebreak) with an
    exact 2σ flag computed entirely in cross-multiplied INTEGER
    arithmetic — ``(n·c − S) > 0 ∧ (n·c − S)² > 4(nQ − S²)`` is the
    z-score test with both sides scaled by n², no sqrt, no float, no
    libm (squares in DECIMAL(38,0): |n·c − S| < 10¹⁰ at any plausible
    per-key daily scale, so the square fits with 18 digits to spare).
    Scale shape: one (key, day) count shuffle (map-side combined), one
    key-partitioned window over the ≤|keys|·|days| count table — the
    corpus is touched once."""
    events = load_table(spark, sf_dir, "events")
    d = events.groupBy(
        "user_id", F.to_date("ts").alias("day")
    ).agg(F.count("*").cast("long").alias("c"))
    w = Window.partitionBy("user_id")
    s = d.select(
        "user_id", "day", "c",
        F.count("*").over(w).cast("long").alias("n_days"),
        F.sum("c").over(w).cast("long").alias("s_c"),
        F.sum(F.col("c") * F.col("c")).over(w).cast("long").alias("q_c"),
    )
    dev = (F.col("n_days") * F.col("c") - F.col("s_c")).alias("dev_n")
    dev_d = (F.col("n_days") * F.col("c") - F.col("s_c")).cast("decimal(38,0)")
    var_d = (
        F.col("n_days").cast("decimal(38,0)") * F.col("q_c")
        - F.col("s_c").cast("decimal(38,0)") * F.col("s_c")
    )
    z = s.select(
        "user_id", "day", "c", "n_days", dev,
        ((F.col("n_days") * F.col("c") - F.col("s_c") > 0) & (dev_d * dev_d > 4 * var_d)).alias("burst"),
    )
    peak = Window.partitionBy("user_id").orderBy(F.desc("dev_n"), F.asc("day"))
    return (
        z.withColumn("rn", F.row_number().over(peak))
        .filter(F.col("rn") == 1)
        .drop("rn")
        .orderBy("user_id")
    )


@query(
    "x192_event_funnel",
    oracle="""
    WITH f AS (SELECT user_id,
                      min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS t_view,
                      min(CASE WHEN event_type = 'click' THEN epoch_us(ts) END) AS t_click,
                      min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS t_buy
               FROM events GROUP BY user_id),
    s AS (SELECT user_id,
                 CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END
               + CASE WHEN t_view IS NOT NULL AND t_click > t_view THEN 1 ELSE 0 END
               + CASE WHEN t_view IS NOT NULL AND t_click > t_view AND t_buy > t_click
                      THEN 1 ELSE 0 END AS stages
          FROM f)
    SELECT stages, CAST(COUNT(*) AS BIGINT) AS n_users
    FROM s GROUP BY stages ORDER BY stages
    """,
)
def x192_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIRST-TOUCH funnel (view → click → purchase): a stage counts
    only if the user's GLOBAL first occurrence of it strictly follows
    the previous stage's global first occurrence — the attribution
    convention, and deliberately NOT x70's semantics (x70 is the
    PROGRESSIVE funnel: each stage re-anchors, so a later re-click
    still qualifies; the two disagree on users whose first click
    precedes their first view).  The semantic difference buys a plan
    difference: x70 must join stage tables (each stage filters on the
    previous stage's time), while first-touch needs ONE map-side-
    combined groupBy(user) with three conditional MINs — the corpus
    never shuffles, only (user, 3×µs) rows; the stage fold and the
    ≤4-row histogram are trivial.  NULL comparisons fail closed in
    both engines (clicks-but-no-views ⇒ stage 0); timestamps compare
    as exact epoch-µs bigints."""
    events = load_table(spark, sf_dir, "events")
    t = lambda et: F.min(  # noqa: E731
        F.when(F.col("event_type") == et, epoch_us(F.col("ts")))
    )
    f = events.groupBy("user_id").agg(
        t("view").alias("t_view"),
        t("click").alias("t_click"),
        t("purchase").alias("t_buy"),
    )
    stage1 = F.when(F.col("t_view").isNotNull(), 1).otherwise(0)
    stage2 = F.when(
        F.col("t_view").isNotNull() & (F.col("t_click") > F.col("t_view")), 1
    ).otherwise(0)
    stage3 = F.when(
        F.col("t_view").isNotNull()
        & (F.col("t_click") > F.col("t_view"))
        & (F.col("t_buy") > F.col("t_click")),
        1,
    ).otherwise(0)
    return (
        f.select((stage1 + stage2 + stage3).alias("stages"))
        .groupBy("stages")
        .agg(F.count("*").cast("long").alias("n_users"))
        .orderBy("stages")
    )


@query(
    "x193_local_supplier_volume",
    oracle="""
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1998-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)
def x193_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape — the canonical six-table star-chain join
    (region→nation→supplier⋈lineitem⋈orders⋈customer with the
    same-nation correlation c_nationkey = s_nationkey): revenue by
    nation for one region and a two-year order window.  The OLAP
    completeness probe for join planning: region/nation/supplier/
    customer are dims (auto-broadcast under AQE), lineitem⋈orders is
    the one fact-fact shuffle, and the date predicate pushes to the
    orders scan before the join (both plan properties in the
    `tests/test_plans.py` gate family).  Revenue follows the repo's
    decimal-sum convention — order-independent exact aggregation,
    one cast to double at the end."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(4,2)")
    )
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, (o.o_custkey == c.c_custkey))
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return (
        j.groupBy("n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


@query(
    "x194_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < DATE '1998-06-01' AND l_shipdate > DATE '1998-06-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def x194_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape — the unshipped-revenue top-k: orders from one
    market segment placed before a date whose lineitems ship after it,
    ranked by discounted revenue, top 10 (l_orderkey added to the tie
    order so the LIMIT edge is deterministic in both engines).  Plan
    shape: both date predicates push to their scans, the segment
    filter shrinks customer before its broadcast, the one shuffle is
    lineitem⋈orders, and the top-10 is TakeOrderedAndProject — never a
    global sort of the aggregate."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > "1998-06-01"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < "1998-06-01"
    )
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(4,2)")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("o_orderdate"), F.asc("l_orderkey"))
        .limit(10)
    )


@query(
    "x195_event_transitions",
    oracle="""
    WITH s AS (SELECT user_id, event_type,
                      lag(event_type) OVER (PARTITION BY user_id
                                            ORDER BY epoch_us(ts), event_id) AS prev
               FROM events)
    SELECT prev, event_type AS next, CAST(COUNT(*) AS BIGINT) AS n,
           CAST((COUNT(*) * 1000000)
                // SUM(COUNT(*)) OVER (PARTITION BY prev) AS BIGINT) AS p_ppm
    FROM s WHERE prev IS NOT NULL
    GROUP BY prev, event_type
    ORDER BY prev, next
    """,
)
def x195_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences — the journey model behind funnel design (which edges
    actually carry mass) and session anomaly detection (a generation
    whose matrix shifts).  Per user, events order by (epoch-µs,
    event_id) — the id tiebreak makes same-microsecond pairs
    deterministic in both engines — and each (prev → next) bigram
    counts once; probabilities are integer ppm (count·10⁶ DIV row
    total, DECIMAL(38,0) cross-multiply — no float accumulation).
    Scale shape: one user-keyed window (the sequence shuffle), one
    (prev, next) map-side-combined count over ≤|types|² groups, and a
    tiny window over the count table for row totals — the corpus
    crosses the wire once."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(epoch_us(F.col("ts")), F.col("event_id"))
    s = events.select(
        "user_id", "event_type", F.lag("event_type").over(w).alias("prev")
    ).filter(F.col("prev").isNotNull())
    counts = s.groupBy("prev", F.col("event_type").alias("next")).agg(
        F.count("*").cast("long").alias("n")
    )
    tot = Window.partitionBy("prev")
    return (
        counts.withColumn("t", F.sum("n").over(tot))
        .selectExpr(
            "prev", "next", "n",
            "CAST((n * 1000000) DIV t AS BIGINT) AS p_ppm",
        )
        .orderBy("prev", "next")
    )


@query(
    "x196_trend_slope",
    oracle="""
    WITH d AS (SELECT user_id,
                      CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) AS x,
                      CAST(COUNT(*) AS BIGINT) AS y
               FROM events GROUP BY 1, 2),
    s AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
                 CAST(SUM(x * y) AS BIGINT) AS sxy, CAST(SUM(x * x) AS BIGINT) AS sxx
          FROM d GROUP BY user_id)
    SELECT user_id, n,
           CAST(n * sxy - sx * sy AS BIGINT) AS slope_num,
           CAST(n * sxx - sx * sx AS BIGINT) AS slope_den,
           CASE WHEN n * sxx - sx * sx = 0 THEN 0
                ELSE CAST(((n * sxy - sx * sy) * 1000000) // (n * sxx - sx * sx) AS BIGINT)
           END AS slope_ppm
    FROM s ORDER BY user_id
    """,
)
def x196_trend_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key least-squares TREND over the daily count series — the
    level-shift companion to x191's spike test (a key can burst once
    yet trend flat, or never burst yet drift upward): ordinary least
    squares slope = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²) carried as an exact
    integer numerator/denominator pair plus a ppm fixed-point read-off
    (BIGINT floor division; x = days since a fixed epoch keeps Σx²
    small).  Degenerate one-day histories report slope 0 (den = 0).
    Scale shape: one (key, day) map-side-combined count shuffle, one
    key-level agg of five integer sums — the corpus crosses the wire
    once, and the regression is algebra over the ≤|keys|-row sum
    table, never a per-key iterative fit."""
    events = load_table(spark, sf_dir, "events")
    d = events.groupBy(
        "user_id",
        F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date"))
        .cast("long").alias("x"),
    ).agg(F.count("*").cast("long").alias("y"))
    s = d.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    return s.selectExpr(
        "user_id", "n",
        "CAST(n * sxy - sx * sy AS BIGINT) AS slope_num",
        "CAST(n * sxx - sx * sx AS BIGINT) AS slope_den",
        "CASE WHEN n * sxx - sx * sx = 0 THEN 0L "
        "ELSE CAST(((n * sxy - sx * sy) * 1000000) DIV (n * sxx - sx * sx) AS BIGINT) "
        "END AS slope_ppm",
    ).orderBy("user_id")


@query(
    "x197_referential_audit",
    oracle="""
    SELECT 'lineitem->orders' AS fk, CAST(COUNT(*) AS BIGINT) AS orphans
    FROM lineitem l WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
    UNION ALL
    SELECT 'orders->customer', CAST(COUNT(*) AS BIGINT)
    FROM orders o WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
    UNION ALL
    SELECT 'lineitem->supplier', CAST(COUNT(*) AS BIGINT)
    FROM lineitem l WHERE NOT EXISTS (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey)
    UNION ALL
    SELECT 'customer->nation', CAST(COUNT(*) AS BIGINT)
    FROM customer c WHERE NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)
    ORDER BY fk
    """,
)
def x197_referential_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit — orphaned foreign keys per
    relationship, the data-quality gate a warehouse runs after every
    load (an orphan count that moves means a partial ingest or an
    id-space collision upstream).  Each relationship is ONE LEFT ANTI
    join; the three dim-side checks broadcast (supplier/customer/
    nation never outgrow memory), and the one fact-fact check
    (lineitem→orders) anti-joins on the already-shuffled key.  Counts
    union into a 4-row report — the corpus is never collected."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")

    def orphans(fact, dim, fk, pk, name, bcast):
        d = dim.select(pk).distinct()
        d = F.broadcast(d) if bcast else d
        return (
            fact.join(d, fact[fk] == d[pk], "left_anti")
            .agg(F.count("*").cast("long").alias("orphans"))
            .select(F.lit(name).alias("fk"), "orphans")
        )
    parts = [
        orphans(li, o, "l_orderkey", "o_orderkey", "lineitem->orders", False),
        orphans(o, c, "o_custkey", "c_custkey", "orders->customer", True),
        orphans(li, s, "l_suppkey", "s_suppkey", "lineitem->supplier", True),
        orphans(c, n, "c_nationkey", "n_nationkey", "customer->nation", True),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("fk")


@query(
    "x198_k_anonymity",
    oracle="""
    WITH q AS (SELECT lang, source,
                      CAST(length(bin(n_chars // 256 + 1)) - 1 AS BIGINT) AS size_octave,
                      CAST(COUNT(*) AS BIGINT) AS class_size
               FROM documents GROUP BY 1, 2, 3)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_classes,
           CAST(MIN(class_size) AS BIGINT) AS k_anonymity,
           CAST(SUM(CASE WHEN class_size < 5 THEN 1 ELSE 0 END) AS BIGINT) AS classes_lt5,
           CAST(SUM(CASE WHEN class_size < 5 THEN class_size ELSE 0 END) AS BIGINT) AS rows_lt5
    FROM q
    """,
)
def x198_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the corpus's quasi-identifiers — the
    re-identification measure that complements the PII tier's direct-
    identifier scan (x158-family): rows sharing a (lang, source,
    size-octave) signature form an equivalence class, k = the smallest
    class, and every row in a class below the policy threshold (5) is
    individually distinguishable enough to flag.  The size octave uses
    the repo's bin()-length log2 (n_chars DIV 256 granularity) so the
    quasi-identifier is engine-portable integer arithmetic.  Scale
    shape: one map-side-combined groupBy over the quasi-identifier
    tuple (the shuffle carries one row per class per task), then a
    4-field fold over the ≤|classes|-row table — the audit cost does
    not grow with row width, and the corpus crosses the wire once."""
    docs = load_table(spark, sf_dir, "documents")
    q = docs.groupBy(
        "lang", "source",
        F.expr("CAST(length(bin(n_chars DIV 256 + 1)) - 1 AS BIGINT)").alias(
            "size_octave"
        ),
    ).agg(F.count("*").cast("long").alias("class_size"))
    return q.agg(
        F.count("*").cast("long").alias("n_classes"),
        F.min("class_size").cast("long").alias("k_anonymity"),
        F.sum(F.when(F.col("class_size") < 5, 1).otherwise(0))
        .cast("long").alias("classes_lt5"),
        F.sum(F.when(F.col("class_size") < 5, F.col("class_size")).otherwise(0))
        .cast("long").alias("rows_lt5"),
    )


_SERVICE_POLY = [(5, 100_000), (25, 50_000), (45, 200_000), (40, 900_000), (20, 700_000)]


def _ray_cast_sql(x: str, y: str, poly: "list[tuple[int, int]]") -> str:
    """Odd-crossings point-in-polygon test as ONE integer SQL
    expression — per edge, the straddle test plus the intercept
    comparison cross-multiplied by D = yj − yi (sign-aware flip, so no
    division and no floats anywhere).  The same generated string feeds
    the Spark plan and the DuckDB oracle: parity by construction."""
    terms = []
    n = len(poly)
    for i in range(n):
        xi, yi = poly[i]
        xj, yj = poly[(i + 1) % n]
        d = yj - yi
        straddle = f"(({yi} > {y}) <> ({yj} > {y}))"
        lhs = f"(({x} - {xi}) * {d})"
        rhs = f"(({xj} - {xi}) * ({y} - {yi}))"
        cmp_ = f"{lhs} < {rhs}" if d > 0 else f"{lhs} > {rhs}"
        terms.append(f"CASE WHEN {straddle} AND ({cmp_}) THEN 1 ELSE 0 END")
    return f"(({' + '.join(terms)}) % 2 = 1)"


_X199_X = "CAST(l_quantity AS BIGINT)"
_X199_Y = "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
_X199_INSIDE = _ray_cast_sql(_X199_X, _X199_Y, _SERVICE_POLY)


@query(
    "x199_point_in_polygon",
    oracle=f"""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN {_X199_INSIDE} THEN 1 ELSE 0 END) AS BIGINT) AS n_inside,
           CAST(COUNT(*) AS BIGINT) AS n_total
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def x199_point_in_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-polygon containment — the geo predicate one step past
    P8's bounding box (the reference is a transit system; real service
    areas are polygons, not boxes): odd-crossings ray casting against a
    fixed 5-vertex polygon in the (quantity, price-cents) stand-in
    plane (q22's documented coordinate convention), every edge test
    CROSS-MULTIPLIED into exact integer arithmetic — no division, no
    floats, no GIS library, the whole predicate one codegen projection
    (the haversine/z-order tier's no-UDF discipline).  The edge
    expressions come from ONE Python generator (``_ray_cast_sql``)
    feeding both the Spark plan and the DuckDB oracle — parity by
    construction.  Scale shape: shuffle-free scan + a ≤3-group fold."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.selectExpr(
            "l_returnflag",
            f"CASE WHEN {_X199_INSIDE} THEN 1 ELSE 0 END AS ins",
        )
        .groupBy("l_returnflag")
        .agg(
            F.sum("ins").cast("long").alias("n_inside"),
            F.count("*").cast("long").alias("n_total"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "x200_grid_density",
    oracle="""
    WITH p AS (SELECT CAST(l_quantity AS BIGINT) // 5 AS cx,
                      CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) // 100000 AS cy
               FROM lineitem),
    sm AS (SELECT p.cx + dx.d AS cx, p.cy + dy.d AS cy, CAST(COUNT(*) AS BIGINT) AS density
           FROM p
           CROSS JOIN (VALUES (-1), (0), (1)) AS dx(d)
           CROSS JOIN (VALUES (-1), (0), (1)) AS dy(d)
           GROUP BY 1, 2)
    SELECT cx, cy, density FROM sm
    ORDER BY density DESC, cx, cy LIMIT 10
    """,
)
def x200_grid_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3×3-smoothed grid density surface — the hotspot map over the
    (quantity, price-cents) stand-in plane: each point CONTRIBUTES to
    its nine surrounding cells (a distributed stencil: posexplode of
    the nine offsets map-side, then one cell-keyed count — smoothing
    costs a constant 9× fan-in absorbed by the partial agg, never a
    neighbor self-join of the cell table), and the top-10 densest
    cells come off the ≤|cells|-row table via TakeOrderedAndProject.
    This is how a density surface scales: the corpus crosses the wire
    as at most one row per live cell per task, and the smoothing radius
    changes the fan-out constant, not the shuffle key space."""
    li = load_table(spark, sf_dir, "lineitem")
    p = li.selectExpr(
        "CAST(l_quantity AS BIGINT) DIV 5 AS cx",
        "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) DIV 100000 AS cy",
    )
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    return (
        p.select("cx", "cy", F.explode(offsets).alias("o"))
        .selectExpr("cx + o.dx AS cx", "cy + o.dy AS cy")
        .groupBy("cx", "cy")
        .agg(F.count("*").cast("long").alias("density"))
        .orderBy(F.desc("density"), "cx", "cy")
        .limit(10)
    )


_STATIONS = [(4, 80_000), (12, 150_000), (20, 300_000), (28, 450_000),
             (34, 600_000), (40, 750_000), (46, 900_000), (10, 500_000)]


def _nearest_station_sql() -> "tuple[list[str], list[str]]":
    """(per-station distance projection, argmin CASE chain) — one
    Python generator feeding both engines.  Squared integer distance in
    the stand-in plane with the x axis UP-SCALED by K = (2·10⁵)²
    instead of dividing the y axis (division is the one operator whose
    cast semantics differ across engines — truncate vs round; pure
    multiplication is bit-identical everywhere, and every term stays
    well inside a BIGINT: K·dx² ≤ 10¹⁴, dy² ≤ 10¹⁴); strict < in the
    fold keeps the lowest station id on ties."""
    K = 40_000_000_000  # (2e5)^2 — puts a 50-unit x range on the y-cents scale
    x = "CAST(l_quantity AS BIGINT)"
    y = "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
    ds = []
    for i, (sx, sy) in enumerate(_STATIONS):
        ds.append(
            f"({K} * ({x} - {sx}) * ({x} - {sx})"
            f" + ({y} - {sy}) * ({y} - {sy})) AS d{i}"
        )
    # argmin as least() + a LINEAR first-match chain — a nested
    # min-tracking CASE fold doubles per station (2^k expression
    # copies; the first cut measured 12.9x at x100 from exactly that)
    names = [f"d{i}" for i in range(len(_STATIONS))]
    m = f"least({', '.join(names)})"
    sid = " ".join(
        [f"CASE WHEN d0 = {m} THEN 0"]
        + [f"WHEN d{i} = {m} THEN {i}" for i in range(1, len(_STATIONS))]
        + ["END"]
    )
    return ds, [f"CAST({sid} AS BIGINT) AS station_id", f"CAST({m} AS BIGINT) AS d2"]


@query(
    "x201_nearest_station",
    oracle=f"""
    WITH d AS (SELECT {", ".join(_nearest_station_sql()[0])} FROM lineitem),
    a AS (SELECT {", ".join(_nearest_station_sql()[1])} FROM d)
    SELECT station_id, CAST(COUNT(*) AS BIGINT) AS n_points,
           CAST(MIN(d2) AS BIGINT) AS min_d2, CAST(MAX(d2) AS BIGINT) AS max_d2
    FROM a GROUP BY station_id ORDER BY station_id
    """,
)
def x201_nearest_station(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-facility assignment — every point labeled with its
    closest of 8 fixed stations (the stop-assignment shape a transit
    pipeline runs on every breadcrumb): squared INTEGER distances in
    the stand-in plane and an argmin CASE fold with a strict-< lowest-
    id tie rule, all generated by one Python helper feeding both
    engines (``_nearest_station_sql``).  With a literal station table
    the whole assignment is a shuffle-free codegen projection — the
    broadcast-join analogue where the dim side is small enough to
    CONSTANT-FOLD into the plan, one step cheaper than broadcasting;
    the per-station report is a ≤8-group fold.  At fleet scale the
    station list grows into a broadcast table and the argmin becomes
    the x58 kNN-join shape — this query pins the k≪n endpoint."""
    li = load_table(spark, sf_dir, "lineitem")
    dists, arg = _nearest_station_sql()
    return (
        li.selectExpr(*dists)
        .selectExpr(*arg)
        .groupBy("station_id")
        .agg(
            F.count("*").cast("long").alias("n_points"),
            F.min("d2").cast("long").alias("min_d2"),
            F.max("d2").cast("long").alias("max_d2"),
        )
        .orderBy("station_id")
    )


@query(
    "x202_feed_outage_audit",
    oracle="""
    WITH s AS (SELECT CAST(ts AS DATE) AS day, epoch_us(ts) AS t,
                      lag(epoch_us(ts)) OVER (PARTITION BY CAST(ts AS DATE)
                                              ORDER BY epoch_us(ts), event_id) AS prev
               FROM events)
    SELECT day,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(MAX(t - prev) AS BIGINT) AS max_gap_us,
           MAX(t - prev) > 3600000000 AS outage
    FROM s WHERE prev IS NOT NULL
    GROUP BY day
    ORDER BY day
    """,
)
def x202_feed_outage_audit(
    spark: SparkSession, sf_dir: str, shard_us: int = 900_000_000
) -> DataFrame:
    """Feed-level outage detection — the ingest-ops staple the
    reference's 6-hour-window pipeline lives or dies by: per service
    day, the LONGEST silence between consecutive events across the
    whole feed (not per vehicle — x63's sessionizer covers that), with
    a >1 h outage flag.  Exact epoch-µs gaps under a deterministic
    (t, event_id) order; single-event days have no gap and drop (the
    lag-domain contract the speed/backfill windows share).

    Scale shape — a TWO-LEVEL lag (the x159/x81 two-level-prefix
    pattern; the oracle's one-window-per-day form is the semantic
    spec, not the plan).  A day-partitioned window is NOT bounded: its
    partition grows linearly with per-day feed volume, so one task
    would sort one full feed-day at fleet scale.  Instead:

      1. range-shard within the day on ``shard = t div shard_us``
         (15-min shards by default) and lag within ``(day, shard)`` —
         every interior gap lives inside one shard because shards
         partition the time axis, and the sort partition is bounded by
         feed-rate × shard-width (a knob), not day volume;
      2. straddling gaps come from a TINY boundary frame — one
         ``(min_t, max_t)`` row per NON-EMPTY shard (empty shards
         vanish, so the lag over shard order jumps them exactly) —
         ≤ 96 rows/day at 15-min shards, windowed per day;
      3. union both gap streams into one map-side-combined day agg.

    Exactness: shards tile the time axis, so consecutive-event pairs
    split exactly into same-shard (level 1) and cross-shard (level 2)
    pairs — counts sum to day_events − 1 and the max is the max over
    the union; ties in ``t`` share a shard, so the (t, event_id)
    tie-break never crosses the boundary frame.  Pinned bit-equal to
    the naive day-window form in tests/test_plans.py."""
    events = load_table(spark, sf_dir, "events")
    s = events.select(
        F.to_date("ts").alias("day"),
        epoch_us(F.col("ts")).alias("t"),
        F.col("event_id"),
    ).withColumn("shard", F.floor(F.col("t") / F.lit(int(shard_us))))
    # level 1: interior gaps — lag within the (day, shard) range shard
    w_in = Window.partitionBy("day", "shard").orderBy("t", "event_id")
    interior = (
        s.withColumn("prev", F.lag("t").over(w_in))
        .filter(F.col("prev").isNotNull())
        .select("day", (F.col("t") - F.col("prev")).alias("gap"))
    )
    # level 2: straddling gaps — one row per non-empty shard, lagged
    # over shard order within the day (empty shards are skipped by
    # construction because they contribute no row)
    bounds = s.groupBy("day", "shard").agg(
        F.min("t").alias("min_t"), F.max("t").alias("max_t")
    )
    w_b = Window.partitionBy("day").orderBy("shard")
    boundary = (
        bounds.withColumn("prev_max", F.lag("max_t").over(w_b))
        .filter(F.col("prev_max").isNotNull())
        .select("day", (F.col("min_t") - F.col("prev_max")).alias("gap"))
    )
    return (
        interior.unionByName(boundary)
        .groupBy("day")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.max("gap").cast("long").alias("max_gap_us"),
            (F.max("gap") > 3600000000).alias("outage"),
        )
        .orderBy("day")
    )


@query(
    "x203_salted_hot_join",
    oracle="""
    WITH ev AS (SELECT CASE WHEN user_id % 10 < 7 THEN 0
                            ELSE user_id % 50 END AS k, value
                FROM events),
    d AS (SELECT k,
                 'grp-' || CAST(k AS VARCHAR) AS label,
                 (k * k) % 97 AS weight
          FROM range(0, 50) t(k))
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
           CAST(MAX(weight) AS BIGINT) AS weight
    FROM ev JOIN d USING (k)
    GROUP BY label
    ORDER BY label
    """,
)
def x203_salted_hot_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The skew path end-to-end, oracle-gated (the r9 verdict's item 6:
    x183 SIZES salt factors and salted_join is pytest-pinned equal to
    naive, but no registered query had demonstrated it against the
    driver's oracle).  The fixture makes the hot key deliberately: 70%
    of events collapse onto key 0 (``user_id % 10 < 7``), the rest
    spread over ``user_id % 50`` — the one-busy-route shape the
    reference's fleet data has.  The join runs through
    ``operators/skew.py:salted_join``: the fact side salts on
    ``pmod(hash(event_id), 16)`` (deterministic — retry-safe and
    oracle-comparable, never rand()), the 50-row dim replicates ×16 via
    explode(sequence), and the join keys on (k, _salt) so the hot key's
    rows land on 16 reduce slots instead of one.  The oracle is the
    NAIVE join — salting must be invisible in the result.  Plan pin
    (tests/test_plans.py): with broadcast disabled the join is
    SortMergeJoin keyed on (k, _salt); under the default session the
    replicated dim broadcasts, which is equally skew-immune.  The
    post-join groupBy(label) is NOT skew-prone: 50 groups partial-agg
    map-side, so the shuffle carries ≤50 rows per task."""
    from ...operators.skew import salted_join

    ev = load_table(spark, sf_dir, "events").select(
        F.when(F.col("user_id") % 10 < 7, F.lit(0).cast("long"))
        .otherwise(F.col("user_id") % 50)
        .alias("k"),
        "event_id",
        "value",
    )
    dim = spark.range(50).select(
        F.col("id").alias("k"),
        F.concat(F.lit("grp-"), F.col("id").cast("string")).alias("label"),
        ((F.col("id") * F.col("id")) % 97).cast("long").alias("weight"),
    )
    j = salted_join(ev, dim, key="k", fine_col="event_id", n_salts=16)
    return (
        j.groupBy("label")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
            F.max("weight").cast("long").alias("weight"),
        )
        .orderBy("label")
    )


@query(
    "x204_large_customer_orders",
    oracle="""
    WITH big AS (SELECT l_orderkey,
                        CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
                 FROM lineitem
                 GROUP BY l_orderkey
                 HAVING SUM(CAST(l_quantity AS BIGINT)) > 300)
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, sum_qty
    FROM big
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
    LIMIT 100
    """,
)
def x204_large_customer_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape — the aggregate-then-join-back probe (r9 verdict
    item 7): customers whose orders total > 300 units, ranked by order
    value.  The textbook SQL is a HAVING subquery semi-joined back to a
    second lineitem pass; the Spark-first form collapses it — the
    per-order quantity sum IS the outer aggregate (l_orderkey
    functionally determines the Q18 group), so ONE lineitem scan feeds
    the two-phase agg whose survivors (a few dozen orders) become the
    join keys against orders and customer.  Plan pins
    (tests/test_plans.py): exactly one lineitem scan — the
    semi-join-back never re-reads the fact — and the top-100 is
    TakeOrderedAndProject, never a global sort.  Quantities are
    integral doubles in the testdata; the BIGINT cast keeps the sum and
    the HAVING edge exact in both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"))
        .filter(F.col("sum_qty") > 300)
    )
    # the HAVING survivors (dozens of rows) are the BUILD side both
    # times — orders and customer stream past them un-shuffled, which
    # is the plan that survives 100 TB (static estimates would instead
    # broadcast the dims at toy scale)
    j1 = o.join(F.broadcast(big), o.o_orderkey == big.l_orderkey)
    return (
        c.join(F.broadcast(j1), j1.o_custkey == c.c_custkey)
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate",
            "o_totalprice", "sum_qty",
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderdate"), F.asc("o_orderkey"))
        .limit(100)
    )


