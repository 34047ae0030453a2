"""Scale extensions — the training-data-pipeline operators (BASELINE.json
north star): dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard /
embedding-cosine), similarity search (brute-force, LSH, IVF), text
analysis (tokens, quality, language-ID, fingerprints), and multimodal
binary plumbing — over the driver's ``documents``/``embeddings`` tables.

Every query has a DuckDB oracle twin.  Float-valued results are
bit-exact across engines: cosine similarity is a *sequential fold*
(``F.aggregate`` ↔ ``list_reduce``) in both — verified, not assumed.
The oracle SQL for hash/LSH operators is generated from the same
constants (hyperplane literals, band layout, md5 scheme) the Spark
operators use.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.dedup import (
    BAND_ROWS,
    MAX_BUCKET,
    MINHASH_K,
    SIMHASH_BITS,
    SLICE_W,
    exact_jaccard,
    minhash_candidates,
    minhash_estimate,
    minhash_signatures,
    shingles,
    simhashes,
)
from ..operators.multimodal import extract_features, media_from_documents
from ..operators.similarity import (
    as_double_vec,
    brute_force_topk,
    embedding_near_dup_pairs,
    hyperplanes,
    ivf_topk,
    lsh_topk,
    quantized_topk_arrow,
)
from ..operators.textstats import (
    LANG_WORD_PATTERN,
    bpe_token_count_col,
    quality_stats,
    token_count_col,
)
from .registry import query
from .tables import _session_cache, epoch_us, load_table

# ---------------------------------------------------------------------------
# Oracle SQL fragments (DuckDB) mirroring the Spark operators exactly
# ---------------------------------------------------------------------------

_TOKS = r"string_split_regex(lower(trim(text)), '\s+')"

def _all_shingles_sql(n: int) -> str:
    """Word n-grams in document order, repeats kept (dedup.all_shingles twin)."""
    return f"""CASE WHEN len({_TOKS}) >= {n} THEN
  list_transform(range(1, len({_TOKS}) - {n - 2}),
                 i -> array_to_string(list_slice({_TOKS}, i, i + {n - 1}), ' '))
ELSE [] END"""


def _shingles_sql(n: int) -> str:
    """Distinct word n-grams (dedup.shingles twin)."""
    return f"list_distinct({_all_shingles_sql(n)})"


_SHINGLES = _shingles_sql(3)

_SIG_ELEMS = ", ".join(
    f"list_min(list_transform(s, x -> substr(md5(x), {SLICE_W * i + 1}, {SLICE_W})))"
    for i in range(MINHASH_K)
)

_N_BANDS = MINHASH_K // BAND_ROWS

_MATCHES = f"len(list_filter(range(1, {MINHASH_K + 1}), i -> a_sig[i] = b_sig[i]))"

# candidate-pair CTE chain shared by x07/x08 (docs capped at doc_id < 1000)
_CAND_CTES = f"""
docs AS (SELECT doc_id, text FROM documents WHERE doc_id < 1000),
sh AS (SELECT doc_id, {_SHINGLES} AS s FROM docs),
sigs AS (SELECT doc_id, s, [{_SIG_ELEMS}] AS sig FROM sh WHERE len(s) > 0),
bands AS (
  SELECT doc_id, s, sig, b.band_idx,
         md5(array_to_string(list_slice(sig, b.band_idx * {BAND_ROWS} + 1,
                                        b.band_idx * {BAND_ROWS} + {BAND_ROWS}), '|')) AS band_hash
  FROM sigs, (SELECT unnest(range(0, {_N_BANDS})) AS band_idx) b
),
keep AS (SELECT band_idx, band_hash FROM bands GROUP BY 1, 2 HAVING count(*) <= {MAX_BUCKET}),
kept AS (SELECT bands.* FROM bands JOIN keep USING (band_idx, band_hash)),
cands AS (
  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id, a.sig AS a_sig, b.sig AS b_sig
  FROM kept a JOIN kept b USING (band_idx, band_hash)
  WHERE a.doc_id < b.doc_id
)
"""


def _cos_sql(a: str, b: str) -> str:
    """Sequential-fold cosine — bit-identical to operators.similarity.cosine."""
    def _fold(products: str) -> str:
        return (
            f"list_reduce(list_prepend(0.0, {products}), (acc, x) -> acc + x)"
        )

    dot = _fold(f"list_transform(list_zip({a}, {b}), p -> p[1] * p[2])")
    na = f"sqrt({_fold(f'list_transform({a}, x -> x * x)')})"
    nb = f"sqrt({_fold(f'list_transform({b}, x -> x * x)')})"
    return f"({dot} / ({na} * {nb}))"


_VEC = "list_transform(embedding, x -> CAST(x AS DOUBLE))"


# ---------------------------------------------------------------------------
# Deduplication
# ---------------------------------------------------------------------------


@query(
    "x01_exact_dedup",
    oracle="""
    SELECT md5(text) AS text_hash, min(doc_id) AS keep_id, count(*) AS n_copies
    FROM documents GROUP BY 1
    """,
)
def x01_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup — content-hash groupBy keeping the lowest doc_id.
    The 128-bit digest (not the body) is the shuffle key, so at 100 TB
    skew tracks true duplicate multiplicity only."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy(F.md5("text").alias("text_hash")).agg(
        F.min("doc_id").alias("keep_id"), F.count("*").alias("n_copies")
    )


@query(
    "x06_minhash_signature",
    oracle=f"""
    WITH sh AS (SELECT doc_id, {_SHINGLES} AS s FROM documents)
    SELECT doc_id, array_to_string([{_SIG_ELEMS}], '|') AS sig_str
    FROM sh WHERE len(s) > 0
    """,
)
def x06_minhash_signature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures (k=8, single md5 digest per shingle sliced into
    the hash family): explode → codegen md5 → map-side-combined min-agg;
    the signature column is what gets banded/bucketed at scale."""
    docs = load_table(spark, sf_dir, "documents")
    return minhash_signatures(docs).select(
        "doc_id", F.concat_ws("|", "sig").alias("sig_str")
    )


@query(
    "x07_minhash_near_dup_pairs",
    oracle=f"""
    WITH {_CAND_CTES}
    SELECT a_id, b_id, {_MATCHES} / {float(MINHASH_K)} AS est_sim
    FROM cands WHERE {_MATCHES} / {float(MINHASH_K)} >= 0.25
    """,
)
def x07_minhash_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup pairs: shingle → signature → band-bucket
    equi-join (never O(n²)), oversized buckets capped at 50, estimated
    Jaccard = matching signature fraction ≥ 0.25."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 1000)
    cands = minhash_candidates(docs)
    est = minhash_estimate(F.col("a_sig"), F.col("b_sig"))
    return (
        cands.withColumn("est_sim", est)
        .filter(F.col("est_sim") >= 0.25)
        .select("a_id", "b_id", "est_sim")
    )


@query(
    "x08_ngram_jaccard_pairs",
    oracle=f"""
    WITH {_CAND_CTES}
    SELECT a_id, b_id, jaccard FROM (
      SELECT c.a_id, c.b_id,
             len(list_intersect(sa.s, sb.s))
               / CAST(len(list_distinct(list_concat(sa.s, sb.s))) AS DOUBLE) AS jaccard
      FROM cands c
      JOIN sh sa ON sa.doc_id = c.a_id
      JOIN sh sb ON sb.doc_id = c.b_id
    ) WHERE jaccard >= 0.2
    """,
)
def x08_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard verification of the LSH candidates (the
    verify step of the dedup pipeline): intersection/union over distinct
    3-gram shingle sets, threshold 0.2."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 1000)
    sh = docs.select("doc_id", shingles(F.col("text")).alias("s"))
    cands = minhash_candidates(docs).select("a_id", "b_id")
    a = sh.select(F.col("doc_id").alias("a_id"), F.col("s").alias("sa"))
    b = sh.select(F.col("doc_id").alias("b_id"), F.col("s").alias("sb"))
    return (
        cands.join(a, "a_id")
        .join(b, "b_id")
        .withColumn("jaccard", exact_jaccard(F.col("sa"), F.col("sb")))
        .filter(F.col("jaccard") >= 0.2)
        .select("a_id", "b_id", "jaccard")
    )


def _simhash_sql(bits: int = SIMHASH_BITS) -> str:
    terms = []
    for j in range(bits):
        bit_sum = (
            "list_reduce(list_prepend(0, list_transform(toks, "
            f"t -> CASE WHEN substr(md5(t), {j + 1}, 1) >= '8' THEN 1 ELSE -1 END)), "
            "(acc, x) -> acc + x)"
        )
        terms.append(f"CASE WHEN {bit_sum} > 0 THEN CAST({1 << j} AS BIGINT) ELSE 0 END")
    return " + ".join(terms)


@query(
    "x09_simhash",
    oracle=f"""
    WITH tok AS (SELECT doc_id, list_distinct({_TOKS}) AS toks FROM documents WHERE doc_id < 1000)
    SELECT doc_id, {_simhash_sql()} AS simhash FROM tok
    """,
)
def x09_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash (16-bit, one md5 digest per token serving all bit
    positions): near-dup fingerprint whose Hamming-distance bands bucket
    at scale the same way MinHash bands do."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 1000)
    return simhashes(docs)


@query(
    "x13_embedding_near_dup",
    oracle=f"""
    WITH e AS (SELECT vec_id, label, {_VEC} AS v FROM embeddings WHERE vec_id < 1000)
    SELECT a.vec_id AS a_id, b.vec_id AS b_id, {_cos_sql('a.v', 'b.v')} AS cos_sim
    FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE {_cos_sql('a.v', 'b.v')} >= 0.35
    """,
)
def x13_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs, blocked by label (the cluster
    key is the shuffle key — no O(n²) cross join at scale)."""
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 1000)
    return embedding_near_dup_pairs(emb, threshold=0.35)


# ---------------------------------------------------------------------------
# Similarity search (ANN)
# ---------------------------------------------------------------------------


def _query_vec(spark: SparkSession, sf_dir: str) -> list[float]:
    """The corpus query vector (vec_id = 0) — one driver-side row fetch,
    memoized per (session, dir) via the session-attached cache in
    plans/tables.py (dies with the session, immune to id() reuse) so
    the six ANN queries don't re-run the lookup job each (inputs are
    immutable driver tables)."""
    cache = _session_cache(spark)
    key = ("_query_vec", sf_dir)
    if key not in cache:
        emb = load_table(spark, sf_dir, "embeddings")
        cache[key] = [
            float(v) for v in emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
        ]
    return cache[key]


_QV_SQL = f"(SELECT {_VEC} FROM embeddings WHERE vec_id = 0)"


@query(
    "x10_ann_bruteforce",
    oracle=f"""
    WITH e AS (SELECT vec_id, {_VEC} AS v FROM embeddings), q AS (SELECT {_QV_SQL} AS qv)
    SELECT vec_id, {_cos_sql('v', '(SELECT qv FROM q)')} AS cos_sim
    FROM e ORDER BY cos_sim DESC, vec_id LIMIT 10
    """,
)
def x10_ann_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k (the ANN correctness baseline): one scan,
    literal query vector in codegen, per-partition top-k merge — no
    shuffle of vectors."""
    emb = load_table(spark, sf_dir, "embeddings")
    return brute_force_topk(emb, _query_vec(spark, sf_dir), k=10)


def _dot_sql(a: str, b: str) -> str:
    return (
        f"list_reduce(list_prepend(0.0, list_transform(list_zip({a}, {b}), "
        "p -> p[1] * p[2])), (acc, x) -> acc + x)"
    )


def _build_lsh_oracle(hamming_radius: int = 0, n_planes: int = 4) -> str:
    planes = hyperplanes(n_planes, 64)
    lits = [f"[{', '.join(repr(x) for x in p)}]" for p in planes]
    bucket = " + ".join(
        f"CASE WHEN {_dot_sql('v', lits[p])} > 0 THEN {1 << p} ELSE 0 END"
        for p in range(n_planes)
    )
    qbucket = " + ".join(
        f"CASE WHEN {_dot_sql('qv', lits[p])} > 0 THEN {1 << p} ELSE 0 END"
        for p in range(n_planes)
    )
    if hamming_radius == 0:
        cond = "bucket = (SELECT bucket FROM qb)"
    else:
        # per-bit mismatch sum — portable Hamming distance, no engine
        # bit-op functions needed
        ham = " + ".join(
            f"CASE WHEN ((bucket // {1 << p}) % 2) <> "
            f"(((SELECT bucket FROM qb)) // {1 << p}) % 2 THEN 1 ELSE 0 END"
            for p in range(n_planes)
        )
        cond = f"({ham}) <= {hamming_radius}"
    return f"""
    WITH e AS (SELECT vec_id, {_VEC} AS v FROM embeddings),
         q AS (SELECT {_QV_SQL} AS qv),
         eb AS (SELECT vec_id, v, {bucket} AS bucket FROM e),
         qb AS (SELECT {qbucket} AS bucket FROM q)
    SELECT vec_id, {_cos_sql('v', '(SELECT qv FROM q)')} AS cos_sim
    FROM eb WHERE {cond}
    ORDER BY cos_sim DESC, vec_id LIMIT 5
    """


@query("x11_ann_lsh", oracle=_build_lsh_oracle())
def x11_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate top-k: 4 deterministic md5-derived
    hyperplanes → 16 sign buckets; the query probes only its own bucket
    (at scale: a storage partition)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return lsh_topk(emb, _query_vec(spark, sf_dir), k=5, n_planes=4)


@query(
    "x12_ann_ivf",
    oracle=f"""
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
    """,
)
def x12_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF probe-1 approximate top-k: 16 deterministic coarse centroids,
    argmax-cosine assignment, query probes its own inverted list only
    (at scale: a bucketed table keyed by centroid_id)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return ivf_topk(emb, _query_vec(spark, sf_dir), k=5, n_centroids=16)


_SCRATCH = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".scratch")

# bump when index-building logic changes: the scratch dir outlives a code
# round (gitignored, build-once), and a stale layout must never serve a
# probe built by newer code
_INDEX_VERSION = "v5"  # v5: indexes store the build-time l2 norm column

_DATA_TAG_CACHE: dict[str, str] = {}


def _data_tag(sf_dir: str) -> str:
    """Short fingerprint of the source parquet files under ``sf_dir``
    ((name, size, mtime_ns) of every *.parquet, hashed).  Every
    scratch-store path embeds it, so a driver testdata refresh — same
    directory, new files — lands the build-once guard on a NEW path and
    forces a rebuild instead of silently probing an index of the old
    data.  Cached per-process: stores built mid-run stay addressable
    even though their own mtimes change."""
    tag = _DATA_TAG_CACHE.get(sf_dir)
    if tag is None:
        import hashlib

        parts = []
        for fn in sorted(os.listdir(sf_dir)):
            if fn.endswith(".parquet"):
                st = os.stat(os.path.join(sf_dir, fn))
                parts.append(f"{fn}:{st.st_size}:{st.st_mtime_ns}")
        tag = hashlib.md5("|".join(parts).encode()).hexdigest()[:10]
        _DATA_TAG_CACHE[sf_dir] = tag
    return tag


def _sf_tag(sf_dir: str) -> str:
    return os.path.basename(sf_dir.rstrip("/")) + "-" + _data_tag(sf_dir)


def _tagged_dir(*parts: str, sf_dir: str) -> str:
    """Scratch path ``<parts...>/<sf>-<data_tag>``, pruning sibling
    dirs for the SAME sf at a DIFFERENT data tag (stores of a previous
    testdata generation — unreachable now that paths embed the tag,
    so they'd only leak disk).  Best-effort: a concurrent process
    mid-build of the same stale dir loses nothing it can't rebuild."""
    import shutil

    parent = os.path.join(*parts)
    tag = _sf_tag(sf_dir)
    prefix = os.path.basename(sf_dir.rstrip("/")) + "-"
    if os.path.isdir(parent):
        for d in os.listdir(parent):
            if d.startswith(prefix) and d != tag:
                shutil.rmtree(os.path.join(parent, d), ignore_errors=True)
    return os.path.join(parent, tag)


def _index_dir(sf_dir: str, kind: str) -> str:
    return os.path.join(
        _tagged_dir(_SCRATCH, "ann_index", _INDEX_VERSION, sf_dir=sf_dir), kind
    )


def _fp_cached(spark: SparkSession, sf_dir: str, tag: str, make) -> str:
    """Session-memoized index fingerprint: the driver tables under an
    ``sf_dir`` are immutable inputs within a session (the ``load_table``
    memoization contract), so each stamp recipe is computed ONCE per
    (session, sf_dir) instead of once per query invocation — ~0.2-0.4 s
    of driver-job latency × 23 ensure_index callers per corpus run.
    ``tag`` names the RECIPE (which frame + which columns); two sites
    may share a tag only if their frame derivation is identical.  The
    staleness guard is unchanged across sessions: a fresh session (the
    nightly run) recomputes every stamp."""
    cache = _session_cache(spark)
    key = ("_fingerprint", sf_dir, tag)
    if key not in cache:
        cache[key] = make()
    return cache[key]


def _ensure_ivf_index(spark: SparkSession, sf_dir: str) -> str:
    """The STANDING IVF index shared by x21 (ANN probe), x166 (leakage
    matrix) and x168 (SemDeDup) — one coarse quantization, three
    consumers.  Staleness-guarded by the CONTENT-SENSITIVE corpus
    fingerprint (count + max id + an order-independent crc32 sum over
    the embedding column — ``ann_index.corpus_fingerprint``'s opt-in
    tier, r7 verdict item 6): re-embedded vectors under UNCHANGED ids
    now trigger a rebuild, which the footer-only stamp missed.  The
    crc term is one column-pruned scan per ensure — the price of
    correctness for a re-land-able corpus; rebuild-trip pinned by
    tests/test_ann_index.py."""
    from ..operators.ann_index import (
        corpus_fingerprint,
        ensure_index,
        write_ivf_index,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    path = _index_dir(sf_dir, "ivf")
    ensure_index(
        lambda: write_ivf_index(emb, path, n_centroids=16),
        path,
        fingerprint=_fp_cached(spark, sf_dir, "emb_content",
                               lambda: corpus_fingerprint(emb, content_col="embedding")),
    )
    return path


@query(
    "q33_warehouse_roundtrip",
    oracle="""
    SELECT count(*) AS cnt,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS speed_sum
    FROM events WHERE CAST(ts AS DATE) = DATE '2024-01-15'
    """,
)
def q33_warehouse_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8 end-to-end through the engine's OWN warehouse layout: the
    events stream is shaped into the breadcrumb fact, written via
    ``write_breadcrumb`` (date-partitioned parquet, rows sorted by
    (trip_id, tstamp) within partitions), and the date-filtered
    aggregate is re-run THROUGH the written table — so the driver's
    hash check covers the partitioned write path itself, not just the
    plan tests.  The date predicate prunes to one service_date
    directory (pinned by plan test); the oracle computes the same
    answer straight from the source events."""
    from ..operators.ann_index import ensure_index
    from .warehouse import write_breadcrumb

    ev = load_table(spark, sf_dir, "events")
    bc = ev.select(
        F.col("ts").alias("tstamp"),
        F.lit(None).cast("double").alias("latitude"),
        F.lit(None).cast("double").alias("longitude"),
        F.col("value").alias("speed"),
        F.col("user_id").alias("trip_id"),
    )
    path = os.path.join(_tagged_dir(_SCRATCH, "warehouse", sf_dir=sf_dir), "breadcrumb")
    ensure_index(lambda: write_breadcrumb(bc, path, mode="overwrite"), path)
    wh = spark.read.parquet(path)
    return wh.filter(F.col("service_date") == F.lit("2024-01-15").cast("date")).agg(
        F.count("*").alias("cnt"),
        F.sum(F.col("speed").cast("decimal(18,2)")).cast("double").alias("speed_sum"),
    )


@query("x20_ann_lsh_index_probe", oracle=_build_lsh_oracle())
def x20_ann_lsh_index_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x11's scale path made real: the corpus is WRITTEN partitioned by
    LSH bucket (one build pass), and the probe filters on the partition
    column — the scan plans with ``PartitionFilters: [bucket = q]``
    (pinned by plan test) and reads ~1/16 of the files, recomputing no
    signatures.  Result ≡ x11 (identical oracle SQL)."""
    from ..operators.ann_index import ensure_index, lsh_index_probe, write_lsh_index

    qv = _query_vec(spark, sf_dir)
    path = _index_dir(sf_dir, "lsh")
    ensure_index(
        lambda: write_lsh_index(load_table(spark, sf_dir, "embeddings"), path, dim=len(qv)),
        path,
    )
    return lsh_index_probe(spark, path, qv, k=5)


@query(
    "x21_ann_ivf_index_probe",
    oracle=f"""
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
    """,
)
def x21_ann_ivf_index_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x12's scale path made real: vectors are WRITTEN into inverted
    lists (``partitionBy(centroid_id)``) with the centroid table
    persisted alongside; the probe picks its nprobe centroids from a
    driver-side read of that tiny table and scans only the matching
    list partitions (IN-list partition filter, pinned by plan test).
    No per-query assignment recompute.  Result ≡ x12 (same oracle).
    Index build content-fingerprinted via ``_ensure_ivf_index``."""
    from ..operators.ann_index import ivf_index_probe

    qv = _query_vec(spark, sf_dir)
    path = _ensure_ivf_index(spark, sf_dir)
    return ivf_index_probe(spark, path, qv, k=5, nprobe=1)


@query("x29_ann_lsh_multiprobe", oracle=_build_lsh_oracle(hamming_radius=1))
def x29_ann_lsh_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe LSH — the recall dial x20 lacks (the analogue of
    IVF's nprobe): probe every bucket within Hamming distance 1 of the
    query's signature (5 of 16 partitions at 4 planes), recovering true
    neighbors that differ by one sign bit and are invisible to a
    single-bucket probe.  The filter is still a literal IN-list
    partition prune over the SAME persisted index x20 reads — identical
    plan shape, no recompute (pinned by plan test)."""
    from ..operators.ann_index import ensure_index, lsh_index_probe, write_lsh_index

    qv = _query_vec(spark, sf_dir)
    path = _index_dir(sf_dir, "lsh")
    ensure_index(
        lambda: write_lsh_index(load_table(spark, sf_dir, "embeddings"), path, dim=len(qv)),
        path,
    )
    return lsh_index_probe(spark, path, qv, k=5, hamming_radius=1)


@query("x30_index_append_probe", oracle=_build_lsh_oracle())
def x30_index_append_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental index lifecycle: build the LSH index from the even
    vec_ids, APPEND the odd ones (same deterministic hyperplanes, so
    they land in the same bucket scheme), then probe — the result is
    identical to probing a one-shot index over the full corpus, which
    is exactly x11/x20's oracle.  The build gate is a post-append
    marker: ``_SUCCESS`` alone exists after phase one, so a crash
    between phases triggers a clean rebuild instead of serving half an
    index."""
    from ..operators.ann_index import ensure_index, lsh_index_probe, write_lsh_index

    qv = _query_vec(spark, sf_dir)
    path = _index_dir(sf_dir, "lsh_app")

    def _build() -> None:
        emb = load_table(spark, sf_dir, "embeddings")
        write_lsh_index(emb.filter(F.col("vec_id") % 2 == 0), path, dim=len(qv))
        write_lsh_index(
            emb.filter(F.col("vec_id") % 2 == 1), path, dim=len(qv), mode="append"
        )
        with open(os.path.join(path, "_APPEND_DONE"), "w"):
            pass

    ensure_index(_build, path, marker="_APPEND_DONE")
    return lsh_index_probe(spark, path, qv, k=5)


@query(
    "x15_approx_distinct",
    oracle="""
    SELECT count(DISTINCT o_custkey) AS exact_vehicles,
           true AS approx_within_5pct
    FROM orders
    """,
)
def x15_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 at scale — the ``approx_count_distinct`` (HyperLogLog++)
    variant SURVEY §2.4 calls for at 100 TB, where an exact per-key
    distinct shuffles every key.  The sketch is mergeable (one map-side
    partial per partition, constant-size state), so cardinality costs
    one scan with no distinct shuffle.  The oracle pins the exact count
    and the ≤5 % error contract (HLL++ rsd 0.02; measured ≤0.6 % on the
    driver tables at sf0.01/0.1 — deterministic, not statistical, for a
    fixed dataset)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.agg(
        F.countDistinct("o_custkey").alias("exact_vehicles"),
        (
            F.abs(
                F.approx_count_distinct("o_custkey", 0.02) - F.countDistinct("o_custkey")
            )
            <= F.lit(0.05) * F.countDistinct("o_custkey")
        ).alias("approx_within_5pct"),
    )


_QUANT = (
    "list_transform({v}, x -> CAST(round(x / "
    "nullif(list_max(list_transform({v}, y -> abs(y))), 0.0) * 127) AS INTEGER))"
)


def _int_fold_sql(products: str) -> str:
    return f"list_reduce(list_prepend(CAST(0 AS BIGINT), {products}), (acc, x) -> acc + x)"


def _qcos_sql(a: str, b: str) -> str:
    dot = _int_fold_sql(f"list_transform(list_zip({a}, {b}), p -> CAST(p[1] * p[2] AS BIGINT))")
    na = f"sqrt(CAST({_int_fold_sql(f'list_transform({a}, x -> CAST(x * x AS BIGINT))')} AS DOUBLE))"
    nb = f"sqrt(CAST({_int_fold_sql(f'list_transform({b}, x -> CAST(x * x AS BIGINT))')} AS DOUBLE))"
    return f"(CAST({dot} AS DOUBLE) / ({na} * {nb}))"


@query(
    "x18_quantized_topk",
    oracle=f"""
    WITH e AS (SELECT vec_id, {_VEC} AS v FROM embeddings),
         q AS (SELECT {_QV_SQL} AS qv),
         eq AS (SELECT vec_id, {_QUANT.format(v='v')} AS vq FROM e),
         qq AS (SELECT {_QUANT.format(v='qv')} AS vq FROM q)
    SELECT vec_id, {_qcos_sql('eq.vq', '(SELECT vq FROM qq)')} AS q_cos
    FROM eq WHERE {_qcos_sql('eq.vq', '(SELECT vq FROM qq)')} IS NOT NULL
    ORDER BY q_cos DESC, vec_id LIMIT 10
    """,
)
def x18_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """int8-quantized vector search: symmetric per-vector quantization
    (4× storage/scan reduction at 100 TB), integer-exact dot/norm sums
    (order-independent — no float summation nondeterminism at all),
    single IEEE division.  The compressed path of the ANN tier; the
    fold-exact float path (x10) is the accuracy baseline.

    Runs the Arrow/numpy int-matmul variant — pinned EXACTLY equal to
    the interpreted fold path by test (integer math is order-free), so
    the oracle stays green while the scan is one BLAS-shaped batch op
    instead of ~5 interpreted HOF folds per vector (~10× at sf0.1)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return quantized_topk_arrow(emb, _query_vec(spark, sf_dir), k=10)


@query(
    "x16_asof_join",
    oracle="""
    WITH clicks AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'),
         v1 AS (SELECT user_id, ts, max(event_id) AS view_id
                FROM events WHERE event_type = 'view' GROUP BY 1, 2)
    SELECT c.event_id, v.view_id
    FROM clicks c ASOF LEFT JOIN v1 v ON c.user_id = v.user_id AND v.ts <= c.ts
    """,
)
def x16_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join — each click attached to the user's latest view at or
    before it (the session-attribution primitive; transit form: each
    ping to the stop-event window it follows).  Spark lacks the
    operator; `operators/asof.py` composes it as union → one keyed
    window → last(ignorenulls) carry: one equi-shuffle, linear pass, no
    range explosion.  The oracle is DuckDB's NATIVE ``ASOF LEFT JOIN``
    — the composition is pinned bit-exact against a first-class
    implementation, inclusive-tie semantics and NULL no-prior rows
    included."""
    from ..operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts", "event_id")
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("view_id"))
    )
    return asof_join(clicks, views, key="user_id", ts="ts", payload_cols=["view_id"]).select(
        "event_id", "view_id"
    )


@query(
    "x17_range_join",
    oracle="""
    WITH purchases AS (
      SELECT user_id, event_id AS purchase_id,
             ts - INTERVAL 30 MINUTE AS win_start, ts AS win_end
      FROM events WHERE event_type = 'purchase'
    ),
    clicks AS (SELECT user_id, ts, event_id AS click_id FROM events
               WHERE event_type = 'click')
    SELECT c.click_id, p.purchase_id
    FROM clicks c JOIN purchases p
      ON c.user_id = p.user_id AND c.ts BETWEEN p.win_start AND p.win_end
    """,
)
def x17_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join — every click inside the 30-minute window before a
    same-user purchase (attribution primitive; transit form: each ping
    inside a stop-event [arrive, leave] dwell).  Spark plans the raw
    BETWEEN predicate as a nested loop; `operators/rangejoin.py` bins
    both sides (bin = interval length here → ≤ 2 bins per interval) and
    equi-joins on (key, bin) + exact re-check — one shuffle per side,
    no range explosion, multiplicity identical to the naive join (the
    oracle runs it without DISTINCT); the plan test pins the Spark side
    to a hash/merge join."""
    from ..operators.rangejoin import interval_range_join

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        (F.col("ts") - F.expr("INTERVAL 30 MINUTES")).alias("win_start"),
        F.col("ts").alias("win_end"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    return interval_range_join(
        clicks,
        purchases,
        key="user_id",
        point_ts="ts",
        start_ts="win_start",
        end_ts="win_end",
        bin_width_s=1800,
    ).select("click_id", "purchase_id")


@query(
    "x19_range_join_long_intervals",
    oracle="""
    WITH purchases AS (
      SELECT user_id, event_id AS purchase_id,
             ts - INTERVAL 2 HOUR AS win_start, ts AS win_end
      FROM events WHERE event_type = 'purchase'
    ),
    clicks AS (SELECT user_id, ts, event_id AS click_id FROM events
               WHERE event_type = 'click')
    SELECT c.click_id, p.purchase_id
    FROM clicks c JOIN purchases p
      ON c.user_id = p.user_id AND c.ts BETWEEN p.win_start AND p.win_end
    """,
)
def x19_range_join_long_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join with intervals LONGER than the bin width (2-hour
    windows over 10-minute bins → each interval explodes to 13 bins):
    proves the operator's correctness does not depend on the width
    bound — oversized intervals cost more bins, never lose matches.
    Same naive-BETWEEN oracle shape as x17."""
    from ..operators.rangejoin import interval_range_join

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        (F.col("ts") - F.expr("INTERVAL 2 HOURS")).alias("win_start"),
        F.col("ts").alias("win_end"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    return interval_range_join(
        clicks,
        purchases,
        key="user_id",
        point_ts="ts",
        start_ts="win_start",
        end_ts="win_end",
        bin_width_s=600,
    ).select("click_id", "purchase_id")


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------


@query(
    "x02_token_count",
    oracle=rf"""
    SELECT doc_id,
           CAST(len({_TOKS}) AS INT) AS n_tokens,
           CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))
                AS INT) AS n_tokens_bpe,
           length(text) AS n_chars_measured
    FROM documents
    """,
)
def x02_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting — whitespace tokenizer plus the BPE-ish
    pre-tokenizer regex (letters|digits|symbol), both native exprs, no
    UDF; the pattern is RE2/Java-portable so the oracle runs it
    verbatim."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        token_count_col(F.col("text")).alias("n_tokens"),
        bpe_token_count_col(F.col("text")).alias("n_tokens_bpe"),
        F.length("text").cast("long").alias("n_chars_measured"),
    )


@query(
    "x03_quality_stats",
    oracle=f"""
    SELECT doc_id,
           length(text) AS n_chars_measured,
           length(text) - length(regexp_replace(text, '[aeiou]', '', 'g')) AS n_vowels,
           length(text) - length(regexp_replace(text, '[ ]', '', 'g')) AS n_spaces,
           length(text) - length(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g')) AS n_punct,
           CAST(len({_TOKS}) AS INT) AS n_tokens,
           CAST(length(text) AS DOUBLE) / CAST(len({_TOKS}) AS INT) AS avg_token_len,
           CAST(len(list_filter({_TOKS},
                t -> list_contains(['the','a','and','of','to','in','is'], t))) AS DOUBLE)
             / len({_TOKS}) AS stopword_ratio
    FROM documents
    """,
)
def x03_quality_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring — length / char-class (vowel, space, punct)
    densities, token shape, stopword ratio: all integer counts + single
    IEEE divisions (hash-stable across engines)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", *quality_stats(F.col("text")))


_LANG_CASE_SQL = """
CASE WHEN contains(text, ' der ') OR contains(text, ' und ') THEN 'de'
     WHEN contains(text, ' el ') OR contains(text, ' los ') THEN 'es'
     WHEN contains(text, ' le ') OR contains(text, ' une ') THEN 'fr'
     WHEN contains(text, ' de ') THEN 'pt'
     ELSE 'en' END
"""


@query(
    "x04_lang_id",
    oracle=f"""
    SELECT lang, {_LANG_CASE_SQL} AS lang_pred, count(*) AS cnt
    FROM documents GROUP BY 1, 2
    """,
)
def x04_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic — stopword-marker classifier as a chained
    CASE (the n-gram profile approach degenerates to marker words at
    this corpus size); output is the (labeled, predicted) confusion
    table."""
    docs = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    pred = (
        F.when(t.contains(" der ") | t.contains(" und "), "de")
        .when(t.contains(" el ") | t.contains(" los "), "es")
        .when(t.contains(" le ") | t.contains(" une "), "fr")
        .when(t.contains(" de "), "pt")
        .otherwise("en")
    )
    return docs.groupBy("lang", pred.alias("lang_pred")).agg(F.count("*").alias("cnt"))


@query(
    "x05_doc_fingerprint",
    oracle="""
    SELECT doc_id,
           substr(md5(text), 1, 16) AS md5_fp,
           list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_transform(range(1, length(text) + 1),
                              i -> CAST(unicode(text[i]) AS BIGINT))),
             (acc, c) -> (acc * 31 + c) % 2147483647) AS poly_hash
    FROM documents WHERE doc_id < 1000
    """,
)
def x05_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: a content digest prefix plus a true
    rolling polynomial hash (Rabin-Karp base-31 mod 2^31-1) computed as
    a character fold — exact integer math, engine-identical."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 1000)
    poly = F.aggregate(
        F.sequence(F.lit(1), F.length("text")),
        F.lit(0).cast("long"),
        lambda acc, i: (acc * 31 + F.ascii(F.col("text").substr(i, F.lit(1)))) % 2147483647,
    )
    return docs.select(
        "doc_id",
        F.substring(F.md5("text"), 1, 16).alias("md5_fp"),
        poly.alias("poly_hash"),
    )


def _build_lsh_pairs_oracle() -> str:
    planes = hyperplanes(4, 64)
    lits = [f"[{', '.join(repr(x) for x in p)}]" for p in planes]
    bucket = " + ".join(
        f"CASE WHEN {_dot_sql('v', lits[p])} > 0 THEN {1 << p} ELSE 0 END" for p in range(4)
    )
    return f"""
    WITH e AS (SELECT vec_id, {_VEC} AS v FROM embeddings WHERE vec_id < 1000),
         eb AS (SELECT vec_id, v, {bucket} AS bucket FROM e)
    SELECT a.vec_id AS a_id, b.vec_id AS b_id, {_cos_sql('a.v', 'b.v')} AS cos_sim
    FROM eb a JOIN eb b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    WHERE {_cos_sql('a.v', 'b.v')} >= 0.35
    """


@query("x28_embedding_near_dup_lsh", oracle=_build_lsh_pairs_oracle())
def x28_embedding_near_dup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x13's unsupervised twin: near-dup pairs blocked by the LSH sign
    bucket instead of a provided label — the realistic 100 TB shape
    where no cluster key exists.  Bucket is the shuffle key (16-way
    self-join, never O(n²)); exact cosine re-check above 0.35."""
    from ..operators.similarity import embedding_near_dup_lsh

    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 1000)
    return embedding_near_dup_lsh(emb, threshold=0.35, dim=64, n_planes=4)


def _build_semantic_centroid_oracle() -> str:
    planes = hyperplanes(4, 64)
    lits = [f"[{', '.join(repr(x) for x in p)}]" for p in planes]
    bucket = " + ".join(
        f"CASE WHEN {_dot_sql('v', lits[p])} > 0 THEN {1 << p} ELSE 0 END" for p in range(4)
    )
    fold = (
        "list_reduce(list_prepend(list_transform(ms[1], x -> 0.0), ms), "
        "(acc, m) -> list_transform(list_zip(acc, m), p -> p[1] + p[2]))"
    )
    return f"""
    WITH RECURSIVE
    e AS (SELECT vec_id, {_VEC} AS v FROM embeddings WHERE vec_id < 1000),
    eb AS (SELECT vec_id, v, {bucket} AS bucket FROM e),
    pairs AS (
      SELECT a.vec_id AS a_id, b.vec_id AS b_id
      FROM eb a JOIN eb b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
      WHERE {_cos_sql('a.v', 'b.v')} >= 0.35
    ),
    edges AS (SELECT a_id AS src, b_id AS dst FROM pairs
              UNION ALL SELECT b_id, a_id FROM pairs),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    reach(node, lbl) AS (
      SELECT node, node FROM nodes
      UNION
      SELECT g.dst, r.lbl FROM reach r JOIN edges g ON g.src = r.node
    ),
    comp AS (SELECT node, min(lbl) AS cluster_id FROM reach GROUP BY node),
    agg AS (
      SELECT c.cluster_id, CAST(count(*) AS BIGINT) AS n_members,
             list(e.v ORDER BY e.vec_id) AS ms
      FROM comp c JOIN e ON e.vec_id = c.node
      GROUP BY c.cluster_id
    ),
    ctr AS (SELECT cluster_id, n_members,
                   list_transform({fold}, x -> x / CAST(n_members AS DOUBLE)) AS centroid
            FROM agg)
    SELECT cluster_id, n_members, CAST(d.d AS BIGINT) AS dim_idx, centroid[d.d] AS val
    FROM ctr, (SELECT unnest(range(1, 65)) AS d) d
    """


@query("x38_semantic_cluster_centroids", oracle=_build_semantic_centroid_oracle())
def x38_semantic_cluster_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end semantic dedup composition: x28's unsupervised
    embedding near-dup pairs → x34's connected components → one
    centroid per transitive cluster (``similarity.py:vector_centroids``
    — deterministic sequential-fold mean, bit-exact vs the oracle's
    ``list_reduce``).  The centroid is the cluster's replacement
    representative for semantic dedup, and the per-dimension row output
    keeps the driver's hash compare on scalar columns."""
    from ..operators.graph import connected_components
    from ..operators.similarity import embedding_near_dup_lsh, vector_centroids

    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 1000)
    pairs = embedding_near_dup_lsh(emb, threshold=0.35, dim=64, n_planes=4).select(
        "a_id", "b_id"
    )
    comp = connected_components(pairs)
    mem = emb.join(comp, emb["vec_id"] == comp["node"]).select(
        "cluster_id", "vec_id", "embedding"
    )
    cent = vector_centroids(mem, "cluster_id")
    ex = cent.select(
        "cluster_id", "n_members", F.posexplode("centroid").alias("pos", "val")
    )
    return ex.select(
        "cluster_id",
        "n_members",
        (F.col("pos") + 1).cast("long").alias("dim_idx"),
        "val",
    )


@query(
    "x26_asof_join_skewed",
    oracle="""
    WITH clicks AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'),
         v1 AS (SELECT user_id, ts, max(event_id) AS view_id
                FROM events WHERE event_type = 'view' GROUP BY 1, 2)
    SELECT c.event_id, v.view_id
    FROM clicks c ASOF LEFT JOIN v1 v ON c.user_id = v.user_id AND v.ts <= c.ts
    """,
)
def x26_asof_join_skewed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x16's hot-key composition under the hash gate: the busiest
    user's rows take the salted path (left split n ways, that key's
    right rows replicated per salt — exact per-partition carry, no
    cross-salt patch-up), everyone else the plain one-shuffle path.
    Same DuckDB-native ASOF oracle as x16 — the skew treatment changes
    partition sizes, never the answer.

    Hot-key contract: ``asof_join_skewed`` takes CALLER-SUPPLIED hot
    keys; at scale they come from maintained table statistics (an
    ANALYZE sketch, AQE skew metrics, yesterday's key histogram) —
    never a per-query exact count over the fact table.  Here discovery
    runs over a deterministic 5% hash sample as the stand-in for that
    stats source.  Correctness never depends on the choice: the skewed
    path ≡ asof_join for ANY hot set (pinned by test), only partition
    sizes change."""
    from ..operators.asof import asof_join_skewed

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts", "event_id")
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("view_id"))
    )
    hot = [
        r["user_id"]
        for r in clicks.filter(F.pmod(F.hash("event_id"), F.lit(20)) == 0)
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "user_id")
        .limit(1)
        .collect()
    ]
    return asof_join_skewed(
        clicks, views, key="user_id", ts="ts", payload_cols=["view_id"], hot_keys=hot
    ).select("event_id", "view_id")


def _kmeans_fasg_parts(n_centroids: int = 16, n_iter: int = 3) -> list[str]:
    """The k-means lifecycle as chained-CTE parts ending at ``fasg``
    (the converged assignment): farthest-first seeds, ``n_iter``
    unrolled Lloyd iterations with the two-level deterministic fold
    mean, final argmax-cosine assignment.  Shared by the x27 IVF-probe
    oracle and the x157 SemDeDup oracle — the caller supplies the
    ``e`` CTE (vec_id, v) and the final SELECT."""

    def fold_vec(lst: str) -> str:
        return (
            f"list_reduce(list_prepend(list_transform({lst}[1], x -> 0.0), {lst}), "
            "(acc, x) -> list_transform(list_zip(acc, x), p -> p[1] + p[2]))"
        )

    parts = [
        f"samp AS MATERIALIZED (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 256)",
        "s1 AS MATERIALIZED (SELECT vec_id, v FROM samp ORDER BY vec_id LIMIT 1)",
    ]
    for j in range(2, n_centroids + 1):
        parts.append(
            f"p{j} AS MATERIALIZED (SELECT s.vec_id, s.v FROM samp s "
            f"WHERE s.vec_id NOT IN (SELECT vec_id FROM s{j - 1}) "
            f"ORDER BY (SELECT max({_cos_sql('s.v', 'c.v')}) FROM s{j - 1} c) ASC, "
            f"s.vec_id ASC LIMIT 1)"
        )
        parts.append(f"s{j} AS MATERIALIZED (SELECT * FROM s{j - 1} UNION ALL SELECT * FROM p{j})")
    parts.append(
        f"cents0 AS MATERIALIZED (SELECT vec_id AS centroid_id, v AS cvec FROM s{n_centroids})"
    )
    for i in range(1, n_iter + 1):
        parts.append(
            f"asgA{i} AS MATERIALIZED (SELECT e.vec_id, e.v, c.centroid_id, "
            f"row_number() OVER (PARTITION BY e.vec_id "
            f"ORDER BY {_cos_sql('e.v', 'c.cvec')} DESC, c.centroid_id) AS rn "
            f"FROM e CROSS JOIN cents{i - 1} c)"
        )
        parts.append(f"asg{i} AS MATERIALIZED (SELECT vec_id, v, centroid_id FROM asgA{i} WHERE rn = 1)")
        parts.append(
            f"u1_{i} AS MATERIALIZED (SELECT centroid_id, vec_id // 1024 AS chunk, "
            f"list(v ORDER BY vec_id) AS vs, count(*) AS pn FROM asg{i} GROUP BY 1, 2)"
        )
        parts.append(
            f"u2_{i} AS MATERIALIZED (SELECT centroid_id, chunk, {fold_vec('vs')} AS psum, pn FROM u1_{i})"
        )
        parts.append(
            f"u3_{i} AS MATERIALIZED (SELECT centroid_id, list(psum ORDER BY chunk) AS ps, "
            f"CAST(sum(pn) AS BIGINT) AS n FROM u2_{i} GROUP BY 1)"
        )
        parts.append(
            f"cents{i} AS MATERIALIZED (SELECT centroid_id, "
            f"list_transform({fold_vec('ps')}, x -> x / CAST(n AS DOUBLE)) AS cvec "
            f"FROM u3_{i})"
        )
    parts.append(
        f"fasgA AS MATERIALIZED (SELECT e.vec_id, e.v, c.centroid_id, "
        f"row_number() OVER (PARTITION BY e.vec_id "
        f"ORDER BY {_cos_sql('e.v', 'c.cvec')} DESC, c.centroid_id) AS rn "
        f"FROM e CROSS JOIN cents{n_iter} c)"
    )
    parts.append("fasg AS MATERIALIZED (SELECT vec_id, v, centroid_id FROM fasgA WHERE rn = 1)")
    return parts


def _build_kmeans_ivf_oracle(n_centroids: int = 16, n_iter: int = 3, k: int = 5) -> str:
    """The ENTIRE trained-IVF lifecycle as one DuckDB statement — the
    hard correctness signal x27 lacked for three rounds.  k-means is
    iterative but its iteration count is FIXED (3), so the loop unrolls
    into chained CTEs (``_kmeans_fasg_parts``): 15 farthest-first
    seed-selection steps, then per-iteration (argmax-cosine assignment
    -> two-level deterministic fold mean), then the final assignment
    (what ``write_ivf_index`` persists) and the probe-1 top-k.  Bit
    parity holds because every float op mirrors the Spark side exactly:
    cosines are the ``_cos_sql`` sequential fold (the shape x21 proved
    hash-green) and the Lloyd mean is the same two-level
    vec_id-then-chunk-ordered fold ``ann_index.kmeans_centroids``
    switched to in round 4 — the old ``posexplode -> avg`` update had
    engine-dependent partial-agg order, which is exactly why no oracle
    was possible before."""
    parts = _kmeans_fasg_parts(n_centroids, n_iter)
    parts.append(
        f"qc AS MATERIALIZED (SELECT centroid_id FROM cents{n_iter} "
        f"ORDER BY {_cos_sql('cvec', '(SELECT qv FROM q)')} DESC, centroid_id LIMIT 1)"
    )
    ctes = ",\n".join(parts)
    return (
        f"WITH e AS MATERIALIZED (SELECT vec_id, {_VEC} AS v FROM embeddings),\n"
        f"q AS MATERIALIZED (SELECT {_QV_SQL} AS qv),\n"
        f"{ctes}\n"
        f"SELECT vec_id, {_cos_sql('v', '(SELECT qv FROM q)')} AS cos_sim "
        f"FROM fasg JOIN qc USING (centroid_id) "
        f"ORDER BY cos_sim DESC, vec_id LIMIT {k}"
    )


@query("x27_ann_ivf_kmeans_probe", oracle=_build_kmeans_ivf_oracle())
def x27_ann_ivf_kmeans_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The TRAINED IVF lifecycle end-to-end: k-means coarse quantizer
    (farthest-first init + Lloyd as DataFrame ops), index written as
    inverted-list partitions, probe-1 over the pruned scan.  Oracle-
    backed since round 4: the fixed-iteration k-means unrolls into
    chained CTEs (see ``_build_kmeans_ivf_oracle``), possible because
    the Lloyd update is now a deterministic two-level sequential fold
    — bit-identical across Spark and DuckDB like every other float op
    in the ANN tier."""
    from ..operators.ann_index import (
        ensure_index,
        ivf_index_probe,
        kmeans_centroids,
        write_ivf_index,
    )

    qv = _query_vec(spark, sf_dir)
    path = _index_dir(sf_dir, "ivf_kmeans")
    ensure_index(
        lambda: write_ivf_index(
            load_table(spark, sf_dir, "embeddings"),
            path,
            centroids=kmeans_centroids(
                load_table(spark, sf_dir, "embeddings"), n_centroids=16, n_iter=3
            ),
        ),
        path,
    )
    return ivf_index_probe(spark, path, qv, k=5, nprobe=1)


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
    from ..operators.sampling import train_val_test_split

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
    from ..operators.sampling import stratified_sample

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
    from ..operators.sampling import pack_sequences
    from ..operators.textstats import token_count_col

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
    from ..operators.sampling import domain_mixture
    from ..operators.textstats import token_count_col

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
    from ..operators.dedup import decontaminate

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
    from ..operators.dedup import (
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
    from ..operators.textstats import repetition_ratio_col

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
    from ..operators.graph import connected_components

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
    from ..operators.sampling import cap_per_group

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
    from ..operators.sampling import percentile_filter

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
    from ..operators.sampling import rebalance_to_uniform

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
    from ..operators.dedup import chunk_lines, dedup_lines

    docs = load_table(spark, sf_dir, "documents")
    lined = docs.select("doc_id", chunk_lines(F.col("text"), _CHUNK_N).alias("text"))
    return dedup_lines(lined)


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
    from ..operators.dedup import dedup_spans

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
    from ..operators.textstats import tfidf_top_terms

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
    from ..operators.ann_index import ensure_index
    from ..operators.textstats import doc_frequencies, tfidf_top_terms

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
    from ..operators.sampling import assign_shards

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
    from ..operators.dedup import exact_jaccard, shingles

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
    from ..operators.dedup import contamination_fraction

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
    from ..operators.sampling import select_token_budget

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
    from ..operators.sampling import mixture_drift

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
    from ..operators.sampling import quality_distribution

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
    from ..operators.dedup import incremental_dedup_probe, write_signature_store
    from ..operators.ann_index import ensure_index

    docs = load_table(spark, sf_dir, "documents")
    old = docs.filter(F.col("doc_id") < 250)
    new = docs.filter((F.col("doc_id") >= 250) & (F.col("doc_id") < 1000))
    store_path = _tagged_dir(_SCRATCH, "dedup_store", "v2-split250", sf_dir=sf_dir)
    ensure_index(lambda: write_signature_store(old, store_path), store_path)
    store = spark.read.parquet(store_path)
    return incremental_dedup_probe(store, new)


def _x48_pairs(spark: SparkSession, sf_dir: str):
    from ..operators.dedup import minhash_candidates, minhash_estimate

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
    from ..operators.graph import cluster_dedup, connected_components

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
    from ..operators.graph import cluster_dedup, connected_components

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
    from ..operators.textstats import hashed_linear_score

    docs = load_table(spark, sf_dir, "documents")
    toks = F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z]+"), F.lit(0))
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        hashed_linear_score(F.col("text")).alias("score"),
    )


# ---------------------------------------------------------------------------
# Multimodal plumbing
# ---------------------------------------------------------------------------


@query(
    "x14_multimodal_features",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(strlen(text) AS BIGINT) AS byte_len,
           CASE WHEN length(text) = 0 THEN -1 ELSE unicode(text) END AS first_codepoint,
           sha256(text) AS sha256_hex,
           false AS decoded
    FROM documents
    """,
)
def x14_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal binary plumbing: documents → fake media blobs (utf-8
    payload, typed metadata) → Arrow-batched mapInPandas feature
    extraction (byte length, first codepoint, sha256, decode status).
    The codec is stubbed (no image libs in container); the Spark-side
    schema/batching/UDF machinery is real and oracle-checked."""
    docs = load_table(spark, sf_dir, "documents")
    media = media_from_documents(docs)
    return extract_features(media)


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
    from ..operators.textstats import chunk_documents

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
    from ..operators.textstats import unigram_surprisal

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
    from ..operators.textstats import bigram_surprisal

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
    from ..operators.sampling import systematic_pps_sample
    from ..operators.textstats import WORD_PATTERN

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
    from ..operators.textstats import trigram_backoff_surprisal

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
    from ..operators.textstats import trigram_jm_surprisal

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
    from ..operators.textstats import fourgram_jm_surprisal

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
    from ..operators.dedup import bloom_decontaminate

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
    from ..operators.similarity import random_projection

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
    from ..operators.dedup import decontaminate
    from ..operators.sampling import select_token_budget
    from ..operators.textstats import hashed_linear_score

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
    from ..operators.sampling import temperature_rebalance

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
    from ..operators.textstats import novelty_score

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
    from ..operators.ann_index import ensure_index
    from ..operators.textstats import unigram_counts, unigram_surprisal

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
    from ..operators.textstats import vocab_coverage

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
    from ..operators.dedup import containment, minhash_candidates

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
    from ..operators.sampling import percentile_rank

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
    from ..operators.ann_index import (
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
    from ..operators.ann_index import (
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
    from ..operators.ann_index import ensure_index, ivf_knn_join, write_ivf_index

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
    from ..operators.ann_index import (
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
    from ..operators.similarity import knn_join

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
    from ..operators.similarity import knn_join

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
    from ..operators.similarity import ann_recall_audit

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
    from ..operators.sampling import length_bucketed_batches
    from ..operators.textstats import token_count_col

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
    from .warehouse import merge_upsert

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
    from ..functions.windows import sessionize

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
    from ..functions.scalar import pg_dow

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
    from ..functions.scalar import pg_dow

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
    from ..operators.textstats import normalize_text

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
    from ..operators.textstats import top_terms

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
    from ..operators.asof import asof_join

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
    from ..operators.textstats import kneser_ney_surprisal

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
    from ..operators.ann_index import ensure_index
    from ..operators.textstats import refresh_counts, unigram_counts

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
    from ..operators.ann_index import (
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
    from ..operators.textstats import modified_kneser_ney_surprisal

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
    from ..operators.textstats import trigram_kneser_ney_surprisal

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
    from ..operators.ann_index import ensure_index
    from ..operators.textstats import ngram_counts, trigram_kneser_ney_surprisal

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
    from ..operators.retrieval import bm25_topk, materialize_queries, top_terms_queries

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
    from ..operators.ann_index import corpus_fingerprint, ensure_index
    from ..operators.retrieval import (
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
    from ..operators.retrieval import retrieval_decontaminate

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
    from ..operators.ann_index import corpus_fingerprint, ensure_index
    from ..operators.retrieval import (
        bm25_serve,
        rrf_fuse,
        top_terms_from_index,
        write_inverted_index,
    )
    from ..operators.similarity import knn_join_exact

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
    from ..operators.ann_index import corpus_fingerprint, ensure_index
    from ..operators.pq import pq_adc_probe, write_pq_index

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
    from ..operators.ann_index import corpus_fingerprint, ensure_index
    from ..operators.pq import pq_knn_join, write_pq_index

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
    from ..operators.ann_index import corpus_fingerprint, ensure_index
    from ..operators.pq import ivfpq_probe, write_ivfpq_index

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
    from ..operators.ann_index import corpus_fingerprint, ensure_index
    from ..operators.pq import pq_knn_join, write_pq_index
    from ..operators.similarity import knn_join_exact

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
    from ..operators.retrieval import phrase_search, top_bigram_phrases

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
    from ..operators.ann_index import corpus_fingerprint, ensure_index
    from ..operators.retrieval import (
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
    from ..operators.retrieval import term_bucket

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
    from ..operators.ann_index import corpus_fingerprint, ensure_index
    from ..operators.pq import ivfpq_residual_probe, write_ivfpq_residual_index

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
    from ..operators.retrieval import phrase_search, top_bigram_phrases

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
    from ..operators.retrieval import collocations

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
    from ..operators.ann_index import corpus_fingerprint, ensure_index
    from ..operators.pq import pq_refine_knn_join, write_pq_index

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
    from ..operators.ann_index import corpus_fingerprint, ensure_index
    from ..operators.retrieval import (
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
    from ..operators.ann_index import corpus_fingerprint, ensure_index
    from ..operators.retrieval import (
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
    from ..operators.ann_index import corpus_fingerprint, ensure_index
    from ..operators.retrieval import (
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
    from ..operators.ann_index import corpus_fingerprint, ensure_index
    from ..operators.pq import opq_adc_probe, write_opq_index

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
    from ..operators.ann_index import corpus_fingerprint, ensure_index
    from ..operators.retrieval import (
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
    from ..operators.retrieval import (
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
    from ..operators.ann_index import (
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
    from ..operators.ann_index import (
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
    from ..operators.similarity import hard_negative_mining

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
    from ..operators.similarity import contrastive_triplets

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
    from ..operators.dedup import minhash_candidates, minhash_estimate
    from ..operators.graph import pagerank

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
    from ..operators.bpe import bpe_learn_incremental

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
    from ..operators.bpe import (
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
    from ..operators.similarity import mmr_rerank

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
    from ..operators.ann_index import corpus_fingerprint, ensure_index
    from ..operators.retrieval import fetch_doc_terms, write_forward_index

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
    from ..operators.spectral import power_iteration_top_component

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
    from ..operators.similarity import dot, l2_norm
    from ..operators.spectral import (
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
    from ..operators.sampling import histogram_quantiles
    from ..operators.textstats import token_count_col

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
    from ..operators.ann_index import corpus_fingerprint, ensure_index
    from ..operators.retrieval import prefix_terms, write_lexicon

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
    from ..operators.bpe import bpe_encode, bpe_learn_incremental, word_symbol_arrays

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
    from ..operators.dedup import minhash_candidates, minhash_estimate
    from ..operators.graph import pagerank

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
    from ..plans.warehouse import snapshot_diff

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
    from ..operators.ann_index import corpus_fingerprint, ensure_index
    from ..operators.retrieval import (
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
    from ..operators.similarity import knn_join_exact
    from ..operators.spectral import (
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
    from ..operators.sampling import grouped_histogram_quantiles
    from ..operators.textstats import token_count_col

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
    from ..operators.dedup import MINHASH_K, minhash_candidates, minhash_estimate
    from ..operators.graph import pagerank

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
    from ..operators.dedup import minhash_candidates, minhash_estimate
    from ..operators.graph import hits

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
    from ..operators.dedup import minhash_candidates, minhash_estimate
    from ..operators.graph import propagate_labels

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
    from ..operators.dedup import minhash_candidates, minhash_estimate
    from ..operators.graph import triangle_stats

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
    from ..operators.textstats import hashed_importance_weights

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
    from ..operators.textstats import unigram_surprisal

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
    from ..operators.dedup import winnow_candidates

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
    from ..operators.textstats import gopher_quality_flags

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
    from ..operators.textstats import hashed_lang_id

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
    from ..operators.dedup import minhash_candidates, minhash_estimate
    from ..operators.sampling import train_val_test_split

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
    from ..operators.dedup import minhash_candidates, minhash_estimate
    from ..operators.graph import connected_components
    from ..operators.sampling import hash_fraction_prefix, hex_threshold

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
    from ..operators.dedup import exact_jaccard, minhash_candidates, shingles

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
    from ..operators.sampling import select_token_budget
    from ..operators.textstats import (
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
    from ..operators.textstats import dup_ngram_stats

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
    from ..operators.ann_index import ensure_index
    from ..operators.textstats import hashed_importance_weights, importance_ratio_table

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
    from ..operators.dedup import minhash_candidates, minhash_estimate
    from ..operators.graph import connected_components

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
    from ..operators.ann_index import kmeans_centroids
    from ..operators.similarity import semantic_dedup

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
    from ..operators.classifier import perceptron_train

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
    from ..operators.sampling import concat_chunk_spans
    from ..operators.textstats import token_count_col

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
    from ..operators.textstats import pii_scan

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
    from ..operators.textstats import vocab_growth_curve

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
    from ..operators.sampling import doremi_reweight
    from ..operators.textstats import unigram_surprisal

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
    from ..operators.dedup import chunk_dedup_stats

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
    from ..operators.textstats import zipf_bucket_histogram

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
    from ..operators.textstats import corpus_datasheet

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
    from ..operators.sampling import train_val_test_split
    from ..operators.similarity import semantic_pairs

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
    from ..operators.ann_index import assign_to_centroids_hier
    from ..operators.similarity import as_double_vec, semantic_dedup

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
    from ..operators.similarity import semantic_dedup

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
    from ..operators.classifier import perceptron_margins, perceptron_train
    from ..operators.sampling import train_val_test_split

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


# ---------------------------------------------------------------------------
# Round-8 tier: language-ID snapshot serving, content-fingerprinted indexes
# ---------------------------------------------------------------------------


def _script_mask_sql(text_expr: str) -> str:
    """DuckDB twin of operators.textstats.script_mask — generated from
    the SAME SCRIPT_CLASSES tuple so the two sides cannot drift."""
    from ..operators.textstats import SCRIPT_CLASSES

    terms = [
        f"{1 << i} * CASE WHEN regexp_matches(lower({text_expr}), '{pat}')"
        " THEN 1 ELSE 0 END"
        for i, (_, pat) in enumerate(SCRIPT_CLASSES)
    ]
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


_X170_ORACLE = f"""
    WITH tb AS (SELECT lang, {_hex_ladder('t', 2)} AS b FROM (
                  SELECT lang, unnest(regexp_extract_all(lower(text), '{LANG_WORD_PATTERN}')) AS t
                  FROM documents WHERE doc_id < 250)),
    lc AS (SELECT lang, b, CAST(count(*) AS BIGINT) AS c_t FROM tb GROUP BY 1, 2),
    lt AS (SELECT lang, CAST(SUM(c_t) AS BIGINT) AS n_t FROM lc GROUP BY 1),
    rc AS (SELECT b, CAST(count(*) AS BIGINT) AS c_r FROM tb GROUP BY 1),
    rt AS (SELECT CAST(COALESCE(SUM(c_r), 0) AS BIGINT) AS n_r FROM rc),
    grid AS (SELECT CAST(unnest(range(0, 256)) AS BIGINT) AS b),
    rat AS (SELECT g.lang, g.b,
                   CAST((COALESCE(lc.c_t, CAST(0 AS BIGINT)) + 1) * CAST(1000000 AS BIGINT)
                        // (g.n_t + 256) AS BIGINT) AS pt_fp,
                   CAST((COALESCE(rc.c_r, CAST(0 AS BIGINT)) + 1) * CAST(1000000 AS BIGINT)
                        // (rt.n_r + 256) AS BIGINT) AS pr_fp
            FROM (SELECT lt.lang, lt.n_t, grid.b FROM lt CROSS JOIN grid) g
            LEFT JOIN lc ON lc.lang = g.lang AND lc.b = g.b
            LEFT JOIN rc ON rc.b = g.b
            CROSS JOIN rt),
    rr AS (SELECT lang, b,
                  CAST(pt_fp * CAST(1000000 AS BIGINT)
                       // greatest(CAST(1 AS BIGINT), pr_fp) AS BIGINT) AS ratio_fp
           FROM rat),
    mk AS (SELECT lang, CAST(bit_or({_script_mask_sql('text')}) AS BIGINT) AS mask
           FROM documents WHERE doc_id < 250 GROUP BY 1),
    batch AS (SELECT doc_id, claimed, dmask, {_hex_ladder('t', 2)} AS b FROM (
                SELECT doc_id, lang AS claimed, {_script_mask_sql('text')} AS dmask,
                       unnest(regexp_extract_all(lower(text), '{LANG_WORD_PATTERN}')) AS t
                FROM documents WHERE doc_id >= 250)),
    sc AS (SELECT doc_id, claimed, dmask, r.lang,
                  CAST(SUM(ratio_fp) AS BIGINT) AS score
           FROM batch JOIN rr r USING (b) GROUP BY 1, 2, 3, 4),
    cand AS (SELECT sc.* FROM sc JOIN mk ON mk.lang = sc.lang
             WHERE mk.mask = 0 OR sc.dmask = 0 OR (sc.dmask & mk.mask) <> 0),
    pr AS (SELECT doc_id, lang AS pred FROM (
             SELECT *, row_number() OVER (PARTITION BY doc_id
                                          ORDER BY score DESC, lang ASC) AS rn
             FROM cand) WHERE rn = 1),
    prd AS (SELECT b2.doc_id, b2.claimed, COALESCE(pr.pred, 'und') AS pred
            FROM (SELECT DISTINCT doc_id, claimed FROM batch) b2
            LEFT JOIN pr USING (doc_id))
    SELECT claimed, pred, CAST(count(*) AS BIGINT) AS n_docs
    FROM prd GROUP BY 1, 2
"""


@query("x170_lang_snapshot_reid", oracle=_X170_ORACLE)
def x170_lang_snapshot_reid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x149's language re-ID as a SNAPSHOT PROBE — the remedy
    BENCH_NOTES named for its 10.57× scale row, built per the r7
    verdict (item 3): the per-language bucket-ratio profiles and
    script masks are PERSISTED once from the standing labeled corpus
    (doc_id < 250; the x85/x155 ensure_index contract), and each batch
    (doc_id ≥ 250) scores against the snapshot with (1) NO
    per-language shuffle fanout — the profile pivots to one ratio
    column per language at plan time, so the only corpus shuffle is
    the doc-keyed aggregation, rows independent of |langs| — and (2)
    the SCRIPT-RANGE candidate prefilter: a doc competes only among
    languages whose persisted script signature intersects its own (on
    this single-script fixture the gate prunes nothing — documented —
    but at 100+ languages it bounds the argmax to the doc's script
    family).  Confusion matrix out, 'und' for no-candidate docs
    (operators/textstats.py:lang_id_from_snapshot)."""
    from ..operators.ann_index import ensure_index
    from ..operators.textstats import (
        lang_id_from_snapshot,
        lang_ratio_profiles,
        lang_script_masks,
    )

    docs = load_table(spark, sf_dir, "documents")
    base = docs.filter(F.col("doc_id") < 250)
    root = _tagged_dir(_SCRATCH, "lang_profiles", "v1-split250", sf_dir=sf_dir)
    rpath, mpath = os.path.join(root, "ratios"), os.path.join(root, "masks")
    ensure_index(
        lambda: lang_ratio_profiles(base).write.mode("overwrite").parquet(rpath),
        rpath,
    )
    ensure_index(
        lambda: lang_script_masks(base).write.mode("overwrite").parquet(mpath),
        mpath,
    )
    return (
        lang_id_from_snapshot(
            docs.filter(F.col("doc_id") >= 250),
            spark.read.parquet(rpath),
            spark.read.parquet(mpath),
        )
        .groupBy("claimed", "pred")
        .agg(F.count("*").cast("long").alias("n_docs"))
    )


def _build_calibration_oracle(n_epochs: int = 3, hex_digits: int = 2) -> str:
    """x169's margin table bucketed into signed |margin| octaves
    (length-of-binary-expansion — the x164 bin() convention), accuracy
    per bucket."""
    parts = _perceptron_cte_parts(n_epochs, hex_digits, _TRAIN_SPLIT_WHERE)
    parts.append(
        f"mt AS (SELECT tf.doc_id, lab.y, CAST(SUM(tf.c * w{n_epochs}.w) AS BIGINT) AS margin "
        f"FROM tf JOIN lab USING (doc_id) JOIN w{n_epochs} ON w{n_epochs}.b = tf.b "
        f"WHERE {_TEST_SPLIT_WHERE} GROUP BY 1, 2)"
    )
    parts.append(
        "mb AS (SELECT CASE WHEN margin > 0 "
        "THEN CAST(length(bin(abs(margin) + 1)) - 1 AS BIGINT) "
        "ELSE -CAST(length(bin(abs(margin) + 1)) - 1 AS BIGINT) END AS mbucket, "
        "CAST(CASE WHEN (y = 1) = (margin > 0) THEN 1 ELSE 0 END AS BIGINT) AS ok "
        "FROM mt)"
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + """
    SELECT mbucket, CAST(count(*) AS BIGINT) AS n,
           CAST(SUM(ok) AS BIGINT) AS n_correct,
           CAST(SUM(ok) * 1000000 // count(*) AS BIGINT) AS acc_fp
    FROM mb GROUP BY 1"""
    )


@query("x171_classifier_calibration", oracle=_build_calibration_oracle())
def x171_classifier_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier CALIBRATION audit — the follow-up question to x169's
    single accuracy number: bucket the held-out margins into signed
    |margin| octaves (floor(log2(|m|+1)), positive buckets = predicted
    positive; the integer-exact x164 octave trick, so the histogram is
    engine-portable) and report accuracy per bucket.  A selection
    pipeline that uses classifier scores as QUALITY WEIGHTS (x153's
    gate, DoReMi-style reweighting) is implicitly trusting that a
    larger margin means a more reliable call — this table is the
    evidence (monotone accuracy ⇒ margins are usable as confidence;
    flat ⇒ threshold-only).  Composition of the x169 chain + one
    projection; bucket 0 is exactly the zero-margin tie lane
    (operators/classifier.py:perceptron_margins)."""
    from ..operators.classifier import perceptron_margins, perceptron_train
    from ..operators.sampling import train_val_test_split

    docs = load_table(spark, sf_dir, "documents")
    sp = train_val_test_split(docs, "doc_id")
    pos = F.col("lang") == "en"
    w = perceptron_train(sp.filter(F.col("split") == "train"), pos)
    final = w.select("b", F.col("w3").alias("w"))
    m = perceptron_margins(sp.filter(F.col("split") == "test"), final, pos)
    octave = (
        F.length(F.conv((F.abs(F.col("margin")) + 1).cast("string"), 10, 2)) - 1
    ).cast("long")
    mbucket = F.when(F.col("margin") > 0, octave).otherwise(-octave)
    ok = ((F.col("y") == 1) == (F.col("margin") > 0)).cast("long")
    return (
        m.select(mbucket.alias("mbucket"), ok.alias("ok"))
        .groupBy("mbucket")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("ok").cast("long").alias("n_correct"),
            F.expr(
                "CAST(sum(ok) * 1000000 DIV count(*) AS BIGINT)"
            ).alias("acc_fp"),
        )
    )


_X172_ORACLE = """
    WITH l AS (SELECT lang AS grp, CAST(count(*) AS BIGINT) AS c
               FROM documents GROUP BY 1),
    s AS (SELECT source AS grp, CAST(count(*) AS BIGINT) AS c
          FROM documents GROUP BY 1),
    la AS (SELECT 'lang' AS axis, CAST(count(*) AS BIGINT) AS n_groups,
                  CAST(SUM(c) AS BIGINT) AS n_docs,
                  CAST(MAX(c) * 1000000 // SUM(c) AS BIGINT) AS top_share_fp,
                  CAST(SUM(POW_SH) // 1000000 AS BIGINT) AS hhi_fp
           FROM (SELECT c, SUM(c) OVER () AS n,
                        (c * 1000000 // SUM(c) OVER ())
                        * (c * 1000000 // SUM(c) OVER ()) AS POW_SH
                 FROM l)),
    sa AS (SELECT 'source' AS axis, CAST(count(*) AS BIGINT) AS n_groups,
                  CAST(SUM(c) AS BIGINT) AS n_docs,
                  CAST(MAX(c) * 1000000 // SUM(c) AS BIGINT) AS top_share_fp,
                  CAST(SUM(POW_SH) // 1000000 AS BIGINT) AS hhi_fp
           FROM (SELECT c, SUM(c) OVER () AS n,
                        (c * 1000000 // SUM(c) OVER ())
                        * (c * 1000000 // SUM(c) OVER ()) AS POW_SH
                 FROM s))
    SELECT * FROM la UNION ALL SELECT * FROM sa
"""


@query("x172_composition_concentration", oracle=_X172_ORACLE)
def x172_composition_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus composition CONCENTRATION — the datasheet's missing
    risk number: per axis (lang, source), the group count, the top
    group's share, and the Herfindahl–Hirschman index in fixed point
    (hhi_fp = Σ share_fp² div 10⁶, share_fp = c·10⁶ div N — per-group
    floors make it integer-exact and engine-portable; int64-safe to
    N < 9·10¹² docs).  HHI near 10⁶ = one group dominates (a 'diverse'
    corpus that is 95% one source memorizes that source's artifacts);
    HHI ≈ 10⁶/k = balanced over k groups.  The x55/x162 rebalancers
    consume exactly this diagnosis.  One scan per axis, each collapsing
    to a ≤|groups|-row aggregate (operators-free composition —
    group-count + two integer folds)."""

    def _axis(col: str) -> DataFrame:
        docs = load_table(spark, sf_dir, "documents")
        g = docs.groupBy(F.col(col).alias("grp")).agg(
            F.count("*").cast("long").alias("c")
        )
        share_fp = F.expr("CAST(c * 1000000 DIV (SUM(c) OVER ()) AS BIGINT)")
        return (
            g.select("c", share_fp.alias("sfp"))
            .agg(
                F.count("*").cast("long").alias("n_groups"),
                F.sum("c").cast("long").alias("n_docs"),
                F.expr(
                    "CAST(MAX(c) * 1000000 DIV SUM(c) AS BIGINT)"
                ).alias("top_share_fp"),
                F.expr(
                    "CAST(SUM(sfp * sfp) DIV 1000000 AS BIGINT)"
                ).alias("hhi_fp"),
            )
            .select(
                F.lit(col).alias("axis"),
                "n_groups",
                "n_docs",
                "top_share_fp",
                "hhi_fp",
            )
        )

    return _axis("lang").unionByName(_axis("source"))


_X173_ORACLE = f"""
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
    cents AS MATERIALIZED (SELECT vec_id AS centroid_id, v AS cvec FROM cl
                           ORDER BY vec_id LIMIT 16),
    asgA AS (SELECT cl.vec_id, cl.v, ct.centroid_id,
                    row_number() OVER (PARTITION BY cl.vec_id
                      ORDER BY {_cos_sql('cl.v', 'ct.cvec')} DESC, ct.centroid_id) AS rn
             FROM cl CROSS JOIN cents ct),
    fasg AS (SELECT vec_id, v, centroid_id FROM asgA WHERE rn = 1),
    q AS (SELECT vec_id AS q_id, v AS qv FROM cl WHERE vec_id % 50 = 0),
    qcA AS (SELECT q.q_id, q.qv, ct.centroid_id,
                   row_number() OVER (PARTITION BY q.q_id
                     ORDER BY {_cos_sql('q.qv', 'ct.cvec')} DESC, ct.centroid_id) AS rn
            FROM q CROSS JOIN cents ct),
    qc AS (SELECT q_id, qv, centroid_id FROM qcA WHERE rn = 1),
    sc AS (SELECT qc.q_id, f.vec_id AS c_id, {_cos_sql('qc.qv', 'f.v')} AS cos_sim
           FROM qc JOIN fasg f USING (centroid_id)),
    rk AS (SELECT q_id, c_id, cos_sim,
                  CAST(row_number() OVER (PARTITION BY q_id
                       ORDER BY cos_sim DESC, c_id ASC) AS INT) AS rn
           FROM sc WHERE cos_sim IS NOT NULL AND c_id <> q_id)
    SELECT q_id, c_id, cos_sim, rn FROM rk WHERE rn <= 3
"""


@query("x173_debias_knn_served", oracle=_X173_ORACLE)
def x173_debias_knn_served(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x138's SERVE twin, completing the de-biasing lifecycle pair the
    way x168 completed SemDeDup's: the all-but-the-top CLEANED
    embedding table is a derived ARTIFACT — the spectral rounds and the
    projection removal run ONCE per corpus refresh, and the standing
    IVF index is built over the cleaned vectors (ensure_index guarded
    by the CONTENT-sensitive corpus fingerprint: a re-embedded corpus
    moves the crc term, which moves the component, which must rebuild
    the cleaned index — exactly the staleness case content_col exists
    for).  Serving is then ``ivf_knn_join``: queries read their cleaned
    vectors OFF the index, probe their nprobe=1 inverted list
    (partition-pruned), and the x128/x138 over-fetch-drop-self recipe
    yields top-3 — per-query work O(probed list), the spectral bill
    amortized to zero.  Coarse recall bound is IVF's own (a true
    neighbor in another list is missed; the oracle models the SAME
    quantizer, so the gate checks the serve semantics exactly)
    (operators/spectral.py + operators/ann_index.py:ivf_knn_join)."""
    from ..operators.ann_index import (
        corpus_fingerprint,
        ensure_index,
        ivf_knn_join,
        write_ivf_index,
    )
    from ..operators.spectral import (
        power_iteration_top_component,
        remove_top_component,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    path = _index_dir(sf_dir, "debias_ivf_sv16")

    def build() -> None:
        comp = power_iteration_top_component(emb, iters=3)
        write_ivf_index(remove_top_component(emb, comp), path, n_centroids=16)

    ensure_index(
        build,
        path,
        fingerprint=_fp_cached(
            spark,
            sf_dir,
            "emb_content",
            lambda: corpus_fingerprint(emb, content_col="embedding"),
        ),
    )
    q = spark.read.parquet(path).filter(F.col("vec_id") % 50 == 0)
    sl = ivf_knn_join(spark, q, path, k=4, nprobe=1).filter(
        F.col("c_id") != F.col("q_id")
    )
    w = Window.partitionBy("q_id").orderBy(F.desc_nulls_last("cos_sim"), F.asc("c_id"))
    return (
        sl.withColumn("rn", F.row_number().over(w).cast("int"))
        .filter(F.col("rn") <= 3)
        .select("q_id", "c_id", "cos_sim", "rn")
    )


_X174_ORACLE = _X170_ORACLE.replace(
    """    SELECT claimed, pred, CAST(count(*) AS BIGINT) AS n_docs
    FROM prd GROUP BY 1, 2
""",
    """,
    cc AS (SELECT claimed AS lang, CAST(count(*) AS BIGINT) AS n_claimed
           FROM prd GROUP BY 1),
    pc AS (SELECT pred AS lang, CAST(count(*) AS BIGINT) AS n_pred
           FROM prd GROUP BY 1)
    SELECT COALESCE(cc.lang, pc.lang) AS lang,
           CAST(COALESCE(n_claimed, 0) AS BIGINT) AS n_claimed,
           CAST(COALESCE(n_pred, 0) AS BIGINT) AS n_pred,
           CAST(COALESCE(n_pred, 0) - COALESCE(n_claimed, 0) AS BIGINT) AS delta
    FROM cc FULL OUTER JOIN pc ON cc.lang = pc.lang
""",
)


@query("x174_label_correction_impact", oracle=_X174_ORACLE)
def x174_label_correction_impact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What trusting PREDICTED language labels (x170's routing) does to
    corpus COMPOSITION: per language, the batch's claimed count vs its
    predicted count and the delta — the number a multilingual pipeline
    needs BEFORE per-language budgets (x25/x162) are computed from
    claimed metadata, because a language whose count moves is a
    language whose thresholds (x139/x145) were fit on polluted data;
    the 'und' row sizes the quarantine lane.  Pure composition: the
    x170 probe (same persisted snapshot artifact — ensure_index
    amortizes across both queries) + two group-counts + one full-outer
    on a ≤\\|langs\\|+1-row pair of tables
    (operators/textstats.py:lang_id_from_snapshot)."""
    from ..operators.ann_index import ensure_index
    from ..operators.textstats import (
        lang_id_from_snapshot,
        lang_ratio_profiles,
        lang_script_masks,
    )

    docs = load_table(spark, sf_dir, "documents")
    base = docs.filter(F.col("doc_id") < 250)
    root = _tagged_dir(_SCRATCH, "lang_profiles", "v1-split250", sf_dir=sf_dir)
    rpath, mpath = os.path.join(root, "ratios"), os.path.join(root, "masks")
    ensure_index(
        lambda: lang_ratio_profiles(base).write.mode("overwrite").parquet(rpath),
        rpath,
    )
    ensure_index(
        lambda: lang_script_masks(base).write.mode("overwrite").parquet(mpath),
        mpath,
    )
    out = lang_id_from_snapshot(
        docs.filter(F.col("doc_id") >= 250),
        spark.read.parquet(rpath),
        spark.read.parquet(mpath),
    )
    cc = out.groupBy(F.col("claimed").alias("lang")).agg(
        F.count("*").cast("long").alias("n_claimed")
    )
    pc = out.groupBy(F.col("pred").alias("lang")).agg(
        F.count("*").cast("long").alias("n_pred")
    )
    return (
        cc.join(pc, "lang", "full_outer")
        .na.fill(0, ["n_claimed", "n_pred"])
        .select(
            "lang",
            "n_claimed",
            "n_pred",
            (F.col("n_pred") - F.col("n_claimed")).cast("long").alias("delta"),
        )
    )


# ---------------------------------------------------------------------------
# Multimodal tier, round 9 (r8 verdict item 6): the frame-sampling
# fan-out as a first-class oracle-gated query — x14 checked the 1:1
# feature projection; this checks the 1→N table-generating path.
# ---------------------------------------------------------------------------

_X175_ORACLE = """
    WITH m AS (SELECT doc_id AS media_id, text, strlen(text) AS L
               FROM documents),
    p AS (SELECT media_id, text, L,
                 least(4, greatest(1, L // 64)) AS n
          FROM m),
    s AS (SELECT media_id, text, L, n,
                 CASE WHEN n > 1 THEN greatest(1, (L - 64) // (n - 1))
                      ELSE 1 END AS step
          FROM p),
    fr AS (SELECT media_id, text, step,
                  CAST(unnest(range(n)) AS INT) AS frame_idx
           FROM s)
    SELECT media_id, frame_idx,
           CAST(strlen(substr(text, CAST(frame_idx * step AS INT) + 1, 64))
                AS BIGINT) AS frame_len,
           sha256(substr(text, CAST(frame_idx * step AS INT) + 1, 64))
               AS frame_sha,
           false AS decoded
    FROM fr
"""


@query("x175_frame_sample_manifest", oracle=_X175_ORACLE)
def x175_frame_sample_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-frame sampling manifest over opaque media blobs: each blob
    explodes into ≤4 evenly-spaced frames EXECUTOR-SIDE inside one
    Arrow-batched mapInPandas boundary (``sample_frames`` — the one
    genuinely table-generating multimodal op; frame rows never transit
    the driver), and the manifest projects per-frame length + sha256 —
    the dedup/audit key a frame store needs before any training-data
    join.  The codec is the deterministic byte-slice stub (decode libs
    absent by brief; ``decoded=false`` lands honestly), so the oracle
    can model the SAME slicing in SQL and the gate checks the real
    fan-out path bit-for-bit: stub frame boundaries, 1→N batch shape,
    binary→digest round-trip (operators/multimodal.py:sample_frames).
    Scale shape: one blob scan, no shuffle — rows stream out at
    ~n_blobs·4; the sha is computed where the bytes already are."""
    from ..operators.multimodal import media_from_documents, sample_frames

    docs = load_table(spark, sf_dir, "documents")
    frames = sample_frames(media_from_documents(docs), max_frames=4)
    return frames.select(
        "media_id",
        F.col("frame_idx").cast("int").alias("frame_idx"),
        F.octet_length("frame_bytes").cast("long").alias("frame_len"),
        F.sha2("frame_bytes", 256).alias("frame_sha"),
        "decoded",
    )


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
    from ..operators.ann_index import _centroids_path
    from ..operators.similarity import as_double_vec, dot, l2_norm

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
    from ..operators.retrieval import (
        bm25_topk,
        materialize_queries,
        top_terms_queries,
    )
    from ..operators.textstats import chunk_documents

    docs = load_table(spark, sf_dir, "documents")
    queries = materialize_queries(
        top_terms_queries(docs, F.col("doc_id") % 50 == 0, n_terms=3)
    )
    passages = chunk_documents(docs, size=200, stride=150).select(
        (F.col("doc_id") * F.lit(1048576) + F.col("chunk_idx"))
        .cast("long")
        .alias("passage_id"),
        F.col("chunk_text").alias("text"),
    )
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
    from ..operators.textstats import token_count_col

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
    from ..operators.ann_index import (
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
        from ..streaming.index import bootstrap_ivf_quantizer

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
    from ..operators.ann_index import corpus_fingerprint, ensure_index
    from ..operators.retrieval import (
        bm25_serve,
        materialize_queries,
        top_terms_queries,
        write_inverted_index,
    )
    from ..operators.textstats import chunk_documents

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
    from ..operators.similarity import as_double_vec

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
    from ..operators.ann_index import (
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
        from ..operators.similarity import as_double_vec, hyperplanes, l2_norm, lsh_bucket

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
    from ..operators.sketch import cms_estimate, cms_from_counts

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
    from ..operators.multimodal import blob_near_dup

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
    from ..operators.sketch import hll_registers

    orders = load_table(spark, sf_dir, "orders")
    return hll_registers(orders, "o_custkey", p=8).orderBy("reg")


from .registry import ORACLES as _ORACLES  # noqa: E402  (x188 reuses x34's closure verbatim)


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
    from ..operators.graph import connected_components, merge_components

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
    from ..operators.skew import salted_join

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


# ---------------------------------------------------------------------------
# x205: the fleet-scale geo form — ~100 polygons, point-in-ANY via
# bbox-bucket blocking then the exact ray-cast (r9 verdict item 8).
# One Python generator emits the polygon fleet for BOTH engines.
# ---------------------------------------------------------------------------
_X205_HW, _X205_HH = 2, 400_000          # diamond half-width / half-height
_X205_XC, _X205_YC = 5, 1_000_000        # blocking cell size per axis


def _x205_polys() -> "list[tuple[int, int, int]]":
    """100 deterministic diamonds tiling the (quantity, price-cents)
    plane: centers on a 10×10 grid covering x∈[2,47], y∈[0.5M,9.5M]."""
    return [
        (k, 2 + (k % 10) * 5, 500_000 + (k // 10) * 1_000_000)
        for k in range(100)
    ]


def _x205_edges() -> "list[tuple[int, int, int, int, int, int]]":
    """(poly_id, xi, yi, xj, yj, d=yj-yi) rows — 4 diamond edges per
    polygon, consumed as DATA by both engines (the data-driven twin of
    x199's per-polygon literal expression)."""
    rows = []
    for k, cx, cy in _x205_polys():
        verts = [
            (cx - _X205_HW, cy), (cx, cy + _X205_HH),
            (cx + _X205_HW, cy), (cx, cy - _X205_HH),
        ]
        for i in range(4):
            xi, yi = verts[i]
            xj, yj = verts[(i + 1) % 4]
            rows.append((k, xi, yi, xj, yj, yj - yi))
    return rows


# the data-driven crossing term — identical string in both engines;
# d != 0 is implied by the straddle test, so the sign-aware flip
# ((lhs < rhs) = (d > 0)) replaces x199's per-edge compile-time branch
_X205_TERM = (
    "CASE WHEN (({yi} > {y}) <> ({yj} > {y}))"
    " AND ((({x} - {xi}) * {d} < ({xj} - {xi}) * ({y} - {yi})) = ({d} > 0))"
    " THEN 1 ELSE 0 END"
)


def _x205_oracle() -> str:
    vals = ",\n          ".join(
        f"({k}, {xi}, {yi}, {xj}, {yj}, {d})" for k, xi, yi, xj, yj, d in _x205_edges()
    )
    term = _X205_TERM.format(
        x="x", y="y", xi="xi", yi="yi", xj="xj", yj="yj", d="d"
    )
    return f"""
    WITH p AS (SELECT x, y, COUNT(*) AS w
               FROM (SELECT CAST(l_quantity AS BIGINT) AS x,
                            CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS y
                     FROM lineitem)
               GROUP BY 1, 2),
    e(poly_id, xi, yi, xj, yj, d) AS (VALUES {vals}),
    hits AS (SELECT e.poly_id, p.x, p.y, p.w,
                    SUM({term}) AS crossings
             FROM p CROSS JOIN e
             GROUP BY 1, 2, 3, 4)
    SELECT polys.poly_id,
           CAST(COALESCE(cnt, 0) AS BIGINT) AS n_points
    FROM (SELECT DISTINCT poly_id FROM e) polys
    LEFT JOIN (SELECT poly_id, SUM(w) AS cnt
               FROM hits WHERE crossings % 2 = 1
               GROUP BY poly_id) agg USING (poly_id)
    ORDER BY poly_id
    """


@query("x205_point_in_any_polygon", oracle=_x205_oracle())
def x205_point_in_any_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-ANY-of-100-polygons — x199 priced the single broadcast
    literal polygon; the fleet-scale form makes the polygons DATA and
    blocks candidates by bbox bucket before the exact test (the same
    bin-and-conquer shape as operators/rangejoin.py), so cost scales in
    POINTS, never points × polygons:

      1. each polygon's edge list is packed into ONE array column of a
         100-row table; its bbox fans out to every blocking cell it
         overlaps (≤4 rows per polygon) — broadcast;
      2. each point computes its (cell_x, cell_y) and BroadcastHashJoins
         the cell table — candidates are per-cell, points never shuffle;
      3. an exact bbox prefilter, then the full ray cast as ONE
         row-local ``aggregate()`` fold over the polygon's edge array —
         integer cross-multiplied, no division, no floats, no
         per-(point, edge) explosion on the wire;
      4. contained candidates map-side-combine into a ≤100-key count.

    The oracle brute-forces points × all 400 edge rows from the SAME
    generator — the blocking must be invisible in the result (a
    candidate the buckets drop is a correctness bug, not a perf one).
    Empty polygons survive via the final LEFT join from the polygon
    table."""
    li = load_table(spark, sf_dir, "lineitem")
    edges = {}
    for k, xi, yi, xj, yj, d in _x205_edges():
        edges.setdefault(k, []).append((xi, yi, xj, yj, d))
    polys = spark.createDataFrame(
        [(k, cx, cy, edges[k]) for k, cx, cy in _x205_polys()],
        "poly_id long, cx long, cy long, "
        "edges array<struct<xi:long,yi:long,xj:long,yj:long,d:long>>",
    )
    hw, hh = F.lit(_X205_HW), F.lit(_X205_HH)
    xc, yc = F.lit(_X205_XC), F.lit(_X205_YC)
    pc = (
        polys.withColumn(
            "cell_x",
            F.explode(
                F.sequence(
                    F.floor((F.col("cx") - hw) / xc), F.floor((F.col("cx") + hw) / xc)
                )
            ),
        )
        .withColumn(
            "cell_y",
            F.explode(
                F.sequence(
                    F.floor((F.col("cy") - hh) / yc), F.floor((F.col("cy") + hh) / yc)
                )
            ),
        )
    )
    pts = li.selectExpr(
        "CAST(l_quantity AS BIGINT) AS x",
        "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS y",
    ).withColumn("cell_x", F.floor(F.col("x") / xc)).withColumn(
        "cell_y", F.floor(F.col("y") / yc)
    )
    term = _X205_TERM.format(
        x="x", y="y", xi="e.xi", yi="e.yi", xj="e.xj", yj="e.yj", d="e.d"
    )
    cand = (
        pts.join(F.broadcast(pc), ["cell_x", "cell_y"])
        .filter(
            (F.col("x") >= F.col("cx") - hw) & (F.col("x") <= F.col("cx") + hw)
            & (F.col("y") >= F.col("cy") - hh) & (F.col("y") <= F.col("cy") + hh)
        )
        .withColumn(
            "crossings",
            F.expr(f"aggregate(edges, CAST(0 AS BIGINT), (acc, e) -> acc + {term})"),
        )
        .filter(F.col("crossings") % 2 == 1)
    )
    counts = cand.groupBy("poly_id").agg(F.count("*").alias("cnt"))
    return (
        polys.select("poly_id")
        .join(F.broadcast(counts), "poly_id", "left")
        .select(
            "poly_id", F.coalesce(F.col("cnt"), F.lit(0)).cast("long").alias("n_points")
        )
        .orderBy("poly_id")
    )


# ---------------------------------------------------------------------------
# x206: correlated EXISTS / NOT EXISTS — the decorrelation probe (r10
# verdict item 4).  The OLAP tier pins scan-agg (q27), star-chain
# (x193), top-k (x194), and agg-join-back (x204); the remaining
# canonical optimizer shape is the correlated predicate subquery
# (TPC-H Q4/Q21 class), which Catalyst's RewritePredicateSubquery must
# turn into semi/anti joins — never a per-row nested loop.
# ---------------------------------------------------------------------------
_X206_SQL = """
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders
    WHERE o_orderdate >= DATE '1995-01-01'
      AND o_orderdate <  DATE '1995-07-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
      AND NOT EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_discount > 0.08)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
"""


@query("x206_returned_orders_exists", oracle=_X206_SQL)
def x206_returned_orders_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4/Q21 shape — orders in a six-month window that have at
    least one returned line (correlated EXISTS) and no deep-discount
    line (correlated NOT EXISTS), counted per priority.

    Deliberately declared as the correlated SQL — the DataFrame API
    cannot express a correlated predicate subquery without hand-writing
    the join, and the POINT of this probe is that the OPTIMIZER does
    the rewrite: RewritePredicateSubquery turns EXISTS into a LeftSemi
    and NOT EXISTS into a LeftAnti join on l_orderkey, both fed by a
    filtered, column-pruned lineitem scan (only l_orderkey survives the
    project).  Plan-pinned in tests/test_plans.py: LeftSemi + LeftAnti
    present, no BroadcastNestedLoopJoin / CartesianProduct, and the
    o_orderdate range reaches the orders scan as a pushed filter.

    Scale shape: the date window prunes orders to ~8 % before either
    join; the two lineitem sides carry one bigint column each after
    pruning.  At 100 TB both sides hash-shuffle on orderkey — the
    honest fact-fact band (cf. x193/x204); on an orderkey-bucketed
    layout (write_bucketed) even that shuffle disappears.  The NOT
    EXISTS side uses a null-safe-free equality (l_orderkey is NOT NULL
    in the model), so the anti join needs no null-aware machinery."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_X206_SQL)


# ---------------------------------------------------------------------------
# x207: the approx column-stats gate (r10 verdict item 8) —
# column_stats_approx (x190's built 100-TB swap) under the driver's
# oracle protocol, the x15 convention: exact columns checked exactly,
# the HLL++ NDV pinned by a boolean bound computed Spark-side.
# ---------------------------------------------------------------------------
_X207_ARMS = """
    SELECT 'event_id' AS col_name, CAST(COUNT(event_id) AS BIGINT) AS n,
           CAST(COUNT(*) - COUNT(event_id) AS BIGINT) AS n_nulls,
           CAST(MIN(event_id) AS DOUBLE) AS min_num,
           CAST(MAX(event_id) AS DOUBLE) AS max_num,
           CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str,
           true AS ndv_within_3rsd
    FROM events
    UNION ALL
    SELECT 'event_type', CAST(COUNT(event_type) AS BIGINT),
           CAST(COUNT(*) - COUNT(event_type) AS BIGINT),
           CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
           MIN(event_type), MAX(event_type), true
    FROM events
    UNION ALL
    SELECT 'user_id', CAST(COUNT(user_id) AS BIGINT),
           CAST(COUNT(*) - COUNT(user_id) AS BIGINT),
           CAST(MIN(user_id) AS DOUBLE), CAST(MAX(user_id) AS DOUBLE),
           NULL, NULL, true
    FROM events
    UNION ALL
    SELECT 'value', CAST(COUNT(value) AS BIGINT),
           CAST(COUNT(*) - COUNT(value) AS BIGINT),
           CAST(MIN(value) AS DOUBLE), CAST(MAX(value) AS DOUBLE),
           NULL, NULL, true
    FROM events
"""


@query(
    "x207_column_stats_approx_gate",
    oracle=f"SELECT * FROM ({_X207_ARMS}) ORDER BY col_name",
)
def x207_column_stats_approx_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """column_stats_approx under the oracle gate.  The approx form
    itself (x190's documented-and-built 100-TB swap: HLL++ NDVs, no
    Expand, sketch-sized shuffle) was pytest-pinned within 3×rsd but
    had no driver row; this query puts its accuracy contract under the
    driver's rows+schema+value-hash protocol, the x15/x79 convention
    for estimate-valued operators:

    - n / n_nulls / min / max come from the SAME single-pass agg the
      approx form runs and are checked EXACTLY against DuckDB;
    - the HLL++ NDV (deterministic for a fixed dataset) is checked as
      a boolean: |approx − exact| ≤ 3·rsd·exact per column, which the
      oracle pins as literal ``true`` — a sketch regression past its
      advertised error flips the hash, failing the driver row.

    The exact-NDV comparison side necessarily pays x190's Expand once
    HERE (the gate needs the truth); column_stats_approx itself stays
    Expand-free — the gate prices accuracy, the swap prices scale.

    Plan note: the exact and approx aggregates run as two SEPARATE
    one-row aggregations cross-joined at the end — mixing
    approx_count_distinct into the multi-COUNT(DISTINCT) agg drags the
    HLL sketches through the Expand (every sketch update replays on
    every ×5-expanded row: measured 5.1 s vs x190's 1.0 s at sf0.1);
    split, each plans optimally and the join is 1 row × 1 row."""
    events = load_table(spark, sf_dir, "events")
    rsd = 0.025
    cols = ("event_id", "event_type", "user_id", "value")
    exact = events.agg(
        F.count("*").cast("long").alias("n_all"),
        *[F.count(c).cast("long").alias(f"n_{c}") for c in cols],
        *[F.countDistinct(c).cast("long").alias(f"ndv_{c}") for c in cols],
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
    approx = events.agg(
        *[
            F.approx_count_distinct(c, rsd=rsd).cast("long").alias(f"andv_{c}")
            for c in cols
        ]
    )
    wide = exact.crossJoin(F.broadcast(approx))
    arms = []
    for c in cols:
        bound = (
            f"abs(andv_{c} - ndv_{c}) <= CAST({3 * rsd} * ndv_{c} AS DOUBLE)"
        )
        if c == "event_type":
            arms.append(
                f"'{c}', n_{c}, n_all - n_{c}, CAST(NULL AS DOUBLE), "
                f"CAST(NULL AS DOUBLE), mins_{c}, maxs_{c}, {bound}"
            )
        else:
            arms.append(
                f"'{c}', n_{c}, n_all - n_{c}, min_{c}, max_{c}, "
                f"CAST(NULL AS STRING), CAST(NULL AS STRING), {bound}"
            )
    return wide.selectExpr(
        f"stack(4, {', '.join(arms)}) AS "
        "(col_name, n, n_nulls, min_num, max_num, min_str, max_str, ndv_within_3rsd)"
    ).orderBy("col_name")


# ---------------------------------------------------------------------------
# x208: NOT IN over a NULLABLE subquery key — the null-aware anti join,
# the last canonical join shape the optimizer tier did not pin (x206
# pinned EXISTS/NOT EXISTS -> semi/anti on non-null keys).  NOT IN is
# NOT an anti join under three-valued logic: one NULL in the subquery
# empties the whole result, and a NULL probe row never qualifies.
# ---------------------------------------------------------------------------
_X208_SQL = """
    SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM customer
    WHERE c_custkey NOT IN (
      SELECT NULLIF(o_custkey, -1) FROM orders
      WHERE o_orderdate >= DATE '1995-01-01' AND o_orderdate < DATE '1996-01-01')
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
"""


@query("x208_unmatched_customers_notin", oracle=_X208_SQL)
def x208_unmatched_customers_notin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no order in 1995, per market segment — declared
    as ``NOT IN`` over a NULLABLE key.  ``NULLIF(o_custkey, -1)`` never
    fires on real data (custkeys are positive) but makes the column
    nullable BY TYPE, which models the late-arriving-dimension shape
    (an unresolved foreign key lands as NULL) and forces the planner to
    honor three-valued logic: Spark cannot rewrite this to a plain anti
    join, so it plans the single-column NULL-AWARE anti join
    (``BroadcastHashJoin ... LeftAnti, BuildRight, true`` — the
    trailing flag is isNullAwareAntiJoin; plan-pinned in
    tests/test_plans.py).  DuckDB evaluates the same SQL under the
    same semantics — the oracle pins cross-engine agreement, and the
    three-valued edge (one actual NULL in the subquery → ZERO rows
    out) is pinned by a fixture pytest against both engines.

    Scale note — this shape is a deliberate anti-pattern cliff: the
    null-aware path REQUIRES broadcasting the subquery side (Spark
    falls back to BroadcastNestedLoopJoin past the broadcast threshold,
    quadratic at fleet scale).  The production rewrite when the key is
    provably non-null is NOT EXISTS (x206's LeftAnti, shuffle-able and
    bucketable); this query exists to pin that the engine gets the
    TRICKY semantics right, and its docstring is the routing advice."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_X208_SQL)


# ---------------------------------------------------------------------------
# x209: dynamic partition pruning — the remaining flagship Spark scale
# mechanism the plan tier did not pin.  Static pruning (q33/P12) needs
# the partition predicate as a literal; at 100 TB the date set usually
# comes from a DIMENSION filter ("peak days", "billing period", "days
# in this campaign"), and without DPP the fact scan reads every
# partition before the join drops 70% of them.
# ---------------------------------------------------------------------------
@query(
    "x209_dynamic_partition_pruning",
    oracle="""
    WITH ev AS (SELECT CAST(ts AS DATE) AS d, value FROM events),
         peak AS (SELECT DISTINCT d FROM ev
                  WHERE (((d - DATE '2024-01-01') % 7) + 7) % 7 IN (0, 3))
    SELECT d AS service_date, CAST(COUNT(*) AS BIGINT) AS cnt,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS speed_sum
    FROM ev JOIN peak USING (d)
    GROUP BY d
    ORDER BY d
    """,
)
def x209_dynamic_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact⋈dim where the partition predicate is only known at RUNTIME:
    the q33-written date-partitioned warehouse fact joins a derived
    calendar dim filtered to "peak" days (2 of every 7, keyed off an
    anchor date with the engine-neutral pmod form).  Catalyst's
    DynamicPartitionPruning injects the dim's date set into the fact
    scan as a ``dynamicpruningexpression`` partition filter REUSING the
    join's broadcast — the fact reads ~2/7 of its partitions and the
    filter costs nothing extra (plan-pinned in tests/test_plans.py:
    the fact scan carries the dynamic filter, the dim broadcasts, and
    the literal-free join would otherwise scan every partition).

    Scale shape: this is THE mechanism that makes date-partitioned
    100 TB facts queryable through dimension filters — static pruning
    (q33) covers literal predicates, DPP covers the join-derived ones;
    together with partitioned writes (S8) the fact never reads a
    partition the query provably does not need.  The oracle recomputes
    from raw events, so the answer also re-verifies the warehouse
    write path q33 exercises."""
    from ..operators.ann_index import ensure_index
    from .warehouse import write_breadcrumb

    ev = load_table(spark, sf_dir, "events")
    bc = ev.select(
        F.col("ts").alias("tstamp"),
        F.lit(None).cast("double").alias("latitude"),
        F.lit(None).cast("double").alias("longitude"),
        F.col("value").alias("speed"),
        F.col("user_id").alias("trip_id"),
    )
    path = os.path.join(_tagged_dir(_SCRATCH, "warehouse", sf_dir=sf_dir), "breadcrumb")
    ensure_index(lambda: write_breadcrumb(bc, path, mode="overwrite"), path)
    wh = spark.read.parquet(path)
    anchor = F.lit("2024-01-01").cast("date")
    peak = (
        ev.select(F.to_date("ts").alias("d")).distinct()
        .filter((((F.datediff(F.col("d"), anchor) % 7) + 7) % 7).isin(0, 3))
    )
    return (
        wh.join(F.broadcast(peak), wh.service_date == peak.d)
        .groupBy("service_date")
        .agg(
            F.count("*").cast("long").alias("cnt"),
            F.sum(F.col("speed").cast("decimal(18,2)")).cast("double").alias("speed_sum"),
        )
        .orderBy("service_date")
    )


# ---------------------------------------------------------------------------
# x210: multi-generation landing served through the pinned-schema scale
# read — the r11 schema-evolution readers (sources/readers.py) under the
# driver's rows+schema+value-hash oracle protocol (round-11 verdict
# item 6).  Evolving landings are the standing shape of a training-data
# store: batches gain columns (new quality scores) over time, and the
# production read must serve every generation through ONE declared
# schema with zero footer sweep.
# ---------------------------------------------------------------------------
@query(
    "x210_evolved_landing_stats",
    oracle="""
    WITH landing AS (
        SELECT doc_id, n_chars,
               CASE WHEN doc_id % 2 = 1
                    THEN CAST(n_chars % 100 AS DOUBLE) / 4 END AS quality
        FROM documents
    )
    SELECT doc_id % 5 AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           CAST(COUNT(quality) AS BIGINT) AS n_quality,
           SUM(quality) / COUNT(quality) AS avg_quality
    FROM landing
    GROUP BY doc_id % 5
    ORDER BY bucket
    """,
)
def x210_evolved_landing_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate over a TWO-GENERATION landing read with the pinned
    declared schema (``sources.read_with_schema`` — zero footer sweep):
    generation 0 landed (doc_id, n_chars) for even doc_ids; the feed
    then gained a quality column and generation 1 landed
    (doc_id, n_chars, quality) for odd doc_ids.  The pinned read
    null-fills quality across generation 0 — visible in the result as
    ``n_quality < n_docs`` in every bucket — and the oracle recomputes
    the same rows from the raw documents table, so the driver's
    value-hash verifies the multi-generation landing contract
    end-to-end (write → schema evolution → pinned union read).

    quality is quarter-integer-valued (``(n_chars % 100) / 4``), so
    SUM(DOUBLE) is order-independent-exact in both engines and the avg
    is one IEEE division — the corpus float-parity convention.

    Scale shape: read_with_schema trusts the catalog schema and plans
    straight to a multi-path scan — no O(files) mergeSchema footer
    sweep (pinned by the job-count test in tests/test_sources.py), the
    per-file projection adapts each generation, and the agg is one
    map-side-combined shuffle of 5 groups.  This is the 100 TB evolving
    -landing read: list once, never touch 100k footers."""
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    from ..operators.ann_index import corpus_fingerprint, ensure_index
    from ..sources.readers import read_with_schema

    docs = load_table(spark, sf_dir, "documents")
    store = os.path.join(_tagged_dir(_SCRATCH, "evolved_landing", sf_dir=sf_dir), "gen")

    def build() -> None:
        base = docs.select("doc_id", "n_chars")
        base.filter(F.col("doc_id") % 2 == 0).write.mode("overwrite").parquet(
            f"{store}/batch_id=0"
        )
        base.filter(F.col("doc_id") % 2 == 1).withColumn(
            "quality", (F.col("n_chars") % 100).cast("double") / F.lit(4)
        ).write.mode("overwrite").parquet(f"{store}/batch_id=1")

    # batch_id=1 is written LAST, so its _SUCCESS is the whole-build marker
    ensure_index(
        build,
        f"{store}/batch_id=1",
        fingerprint=_fp_cached(
            spark, sf_dir, "docs",
            lambda: corpus_fingerprint(docs, id_col="doc_id"),
        ),
    )
    pinned = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("n_chars", LongType()),
            StructField("quality", DoubleType()),
        ]
    )
    landing = read_with_schema(spark, store, pinned)
    return (
        landing.groupBy((F.col("doc_id") % 5).alias("bucket"))
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
            F.count("quality").cast("long").alias("n_quality"),
            (F.sum("quality") / F.count("quality")).alias("avg_quality"),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# x211: the schema REGISTRY's serve path under the oracle gate (r12
# verdict item 3).  x210 gates read_with_schema (caller-supplied
# StructType); this query drives the full catalog loop — register v1,
# land gen 0, register v2 (added nullable column), land gen 1, serve via
# read_registered (the landing's OWN _schema/current pointer) — so the
# registry half of the evolution path gets a driver row, not just
# pytest coverage.  The two-generation store build is shared with x217
# (the pinned-historical-version serve, round 14).
# ---------------------------------------------------------------------------
def _ensure_registered_landing(spark: SparkSession, sf_dir: str) -> str:
    """Build-once the two-generation REGISTERED landing shared by x211
    (current-pointer serve) and x217 (pinned v1 serve): register v1
    (doc_id, n_chars), land generation 0 (even doc_ids), register v2
    adding a nullable ``tok_est`` (``floor(n_chars / 4)`` as double —
    integral-valued, so sums are order-independent-exact), land
    generation 1 (odd doc_ids) under it.  Returns the store path."""
    import shutil

    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    from ..operators.ann_index import corpus_fingerprint, ensure_index
    from ..sources.readers import register_landing_schema

    docs = load_table(spark, sf_dir, "documents")
    store = os.path.join(_tagged_dir(_SCRATCH, "registered_landing", sf_dir=sf_dir), "gen")

    v1 = StructType([StructField("doc_id", LongType()), StructField("n_chars", LongType())])
    v2 = StructType(list(v1.fields) + [StructField("tok_est", DoubleType())])

    def build() -> None:
        # a REBUILD must start from an empty registry: re-registering v1
        # over a surviving v2 pointer is a column drop, which the
        # add-only contract rejects loudly (by design)
        shutil.rmtree(store, ignore_errors=True)
        base = docs.select("doc_id", "n_chars")
        register_landing_schema(spark, store, v1)
        base.filter(F.col("doc_id") % 2 == 0).write.parquet(f"{store}/batch_id=0")
        register_landing_schema(spark, store, v2)
        base.filter(F.col("doc_id") % 2 == 1).withColumn(
            "tok_est", F.floor(F.col("n_chars") / 4).cast("double")
        ).write.parquet(f"{store}/batch_id=1")

    # batch_id=1 is written LAST, so its _SUCCESS is the whole-build marker
    ensure_index(
        build,
        f"{store}/batch_id=1",
        fingerprint=_fp_cached(
            spark, sf_dir, "docs",
            lambda: corpus_fingerprint(docs, id_col="doc_id"),
        ),
    )
    return store
@query(
    "x211_registered_landing_serve",
    oracle="""
    WITH landing AS (
        SELECT doc_id, n_chars,
               CASE WHEN doc_id % 2 = 1
                    THEN CAST(n_chars // 4 AS DOUBLE) END AS tok_est
        FROM documents
    )
    SELECT doc_id % 3 AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(tok_est) AS BIGINT) AS n_tok,
           CAST(SUM(tok_est) AS BIGINT) AS sum_tok,
           CAST(MAX(n_chars) AS BIGINT) AS max_chars
    FROM landing
    GROUP BY doc_id % 3
    ORDER BY bucket
    """,
)
def x211_registered_landing_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate over a two-generation landing served through its OWN
    registered schema (``sources.read_registered``): the build registers
    v1 (doc_id, n_chars), lands generation 0 (even doc_ids), registers
    v2 adding a nullable ``tok_est`` (a whitespace-free token estimate,
    ``floor(n_chars / 4)`` — integral-valued double, so sums are
    order-independent-exact), and lands generation 1 (odd doc_ids) under
    it.  The serve resolves ``_schema/current`` — one small text GET —
    and projects every generation onto v2 with ZERO footer sweep
    (job-count-pinned for this exact path in tests/test_sources.py);
    generation 0 null-fills ``tok_est``, visible as ``n_tok < n_docs``
    per bucket.  The oracle recomputes from the raw documents table, so
    the driver's value-hash verifies register → land → evolve → serve
    end-to-end.

    Scale shape: the catalog lives next to the data (the warehouse's
    one-object-PUT pointer idiom), readers thread no StructTypes, and
    the read plans straight to a multi-path scan — at a 100k-file
    landing this is the difference between one GET and an O(files)
    mergeSchema footer sweep.  The add-only registry contract
    (type/drop/non-nullable/tightening rejections) is pinned in
    tests/test_sources.py."""
    from ..sources.readers import read_registered

    store = _ensure_registered_landing(spark, sf_dir)
    landing = read_registered(spark, store)
    return (
        landing.groupBy((F.col("doc_id") % 3).alias("bucket"))
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.count("tok_est").cast("long").alias("n_tok"),
            F.sum("tok_est").cast("long").alias("sum_tok"),
            F.max("n_chars").cast("long").alias("max_chars"),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# x212: a COMPACTED maintenance store under the oracle gate (r12 verdict
# item 4).  compact_store's consolidated-∪-tail serve is pinned
# bit-equal in pytest; this query runs the full lifecycle — land, fold,
# land more, fresh-checkpoint REPLAY — and serves the result against an
# oracle that recomputes the sketch from raw events, so the replay-
# safety contract gets a rows+schema+value-hash driver row.
# ---------------------------------------------------------------------------
@query("x212_compacted_cms_serve", oracle=_build_cms_oracle())
def x212_compacted_cms_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x185's heavy-hitter probe served from a COMPACTED CMS store: the
    build lands per-batch counters for two thirds of the feed
    (event_id % 3 ∈ {0, 1}), folds them into one consolidated
    generation (``compact_store`` — hidden gen + atomic pointer,
    hwm = 1), lands the third slice as a live tail dir, then re-lands
    slice 0 at batch_id=0 — the fresh-checkpoint replay shape.  The
    serve (``cms_from_store``) reads consolidated ∪ dirs above the hwm:
    the replay is IGNORED (its content is already in the fold), so the
    estimates equal a single sketch over the whole feed — which is
    exactly what the oracle recomputes cell-by-cell from raw events
    with the portable md5-slice hash.  A double-counted replay or a
    dropped consolidated generation (the f47e29c hazard class) would
    inflate or deflate ``est`` and fail the value-hash.

    Scale shape: counters are ≤ depth·width rows per landing — the
    store compaction bounds METADATA (one landing per 15 min = ~35k
    dirs/year → O(1) consolidated + current tail), not data volume; the
    serve fold shuffles ≤ depth·width rows and the probe broadcasts the
    counters (x185's plan).  Replay safety is the part a naive
    file-merge gets wrong (streaming/compaction.py docstring)."""
    import shutil

    from ..operators.ann_index import corpus_fingerprint, ensure_index
    from ..operators.sketch import cms_counters, cms_estimate
    from ..streaming.compaction import compact_store
    from ..streaming.stats import cms_from_store

    events = load_table(spark, sf_dir, "events")
    store = _tagged_dir(_SCRATCH, "compacted_cms", sf_dir=sf_dir)

    def build() -> None:
        shutil.rmtree(store, ignore_errors=True)
        slices = [
            events.filter(F.col("event_id") % 3 == i).selectExpr("user_id AS _k")
            for i in range(3)
        ]
        for i in (0, 1):
            cms_counters(slices[i], "_k", 4, 1024).write.parquet(
                f"{store}/cms/batch_id={i}"
            )
        compact_store(spark, store, "cms")  # folds 0,1 -> gen 1, hwm 1
        cms_counters(slices[2], "_k", 4, 1024).write.parquet(f"{store}/cms/batch_id=2")
        # fresh-checkpoint replay: slice 0 re-lands at batch_id 0 <= hwm
        cms_counters(slices[0], "_k", 4, 1024).write.parquet(f"{store}/cms/batch_id=0")
        with open(os.path.join(store, "_STORE_DONE"), "w"):
            pass

    ensure_index(
        build,
        store,
        marker="_STORE_DONE",
        fingerprint=_fp_cached(
            spark, sf_dir, "events",
            lambda: corpus_fingerprint(events, id_col="event_id"),
        ),
    )
    counters = cms_from_store(spark, store)
    counts = events.groupBy("user_id").agg(F.count("*").cast("long").alias("c"))
    top = counts.orderBy(F.desc("c"), F.asc("user_id")).limit(20)
    return (
        cms_estimate(top, counters, "user_id", depth=4, width=1024)
        .select("user_id", "c", "est")
        .orderBy(F.desc("c"), F.asc("user_id"))
    )


# ---------------------------------------------------------------------------
# x213: the outage store's DAY-COMPACTION under the oracle gate (r12
# verdict item 7's implementation, driver-gated): land time-sliced
# batches, re-segment the closed days into one consolidated generation
# (compact_outage_day — the order-aware compactor compact_store refuses
# to be), land a later slice, replay a folded one, and serve the audit
# against x202's raw-event oracle.
# ---------------------------------------------------------------------------
@query(
    "x213_outage_day_compaction",
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
def x213_outage_day_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x202's per-day outage audit served from a DAY-COMPACTED id-exact
    segment store: the build lands the feed as three event-time slices
    (hours [0,8), [8,16), [16,24) — each batch's segments are range-
    disjoint within every day, the arrival-order contract of the
    store), day-compacts through the day BEFORE the feed's last (closed
    days collapse to one chained row each, the open day passes through
    verbatim), lands the evening slice as a live tail — its closed-day
    segments chain against the consolidated rows — and re-lands slice 0
    at batch_id 0, the fresh-checkpoint replay the hwm ignores.  The
    serve (``outage_from_store_with_ids``) must then equal x202
    recomputed from raw events: a compaction that mis-folded a cross-
    segment gap, double-served a replay, or lost the open day's rows
    fails the value-hash on max_gap_us / n_events.

    Scale shape: the store holds O(non-empty shards) rows per batch;
    day-compaction bounds its directory count at O(1) consolidated
    generation + one day's live dirs (vs ~35k dirs/year), preserving
    the serve algebra exactly (pinned in tests/test_sketch.py) because
    a closed day's chain folds losslessly into (min, max, Σcnt,
    max-gap) — the serve's own quantities."""
    import shutil

    from ..operators.ann_index import corpus_fingerprint, ensure_index
    from ..streaming.compaction import compact_outage_day
    from ..streaming.stats import outage_from_store_with_ids, outage_segments_with_ids

    events = load_table(spark, sf_dir, "events")
    store = _tagged_dir(_SCRATCH, "outage_day_store", sf_dir=sf_dir)

    def build() -> None:
        shutil.rmtree(store, ignore_errors=True)
        slices = [
            events.filter((F.hour("ts") >= lo) & (F.hour("ts") < hi))
            for lo, hi in ((0, 8), (8, 16), (16, 24))
        ]
        for i in (0, 1):
            outage_segments_with_ids(slices[i], 900_000_000).write.parquet(
                f"{store}/outage/batch_id={i}"
            )
        # closed days = everything before the feed's last day (one
        # scalar read — a maintenance job computing its own cutoff)
        through = events.select(
            F.date_sub(F.max(F.to_date("ts")), 1).alias("d")
        ).first()["d"]
        compact_outage_day(spark, store, str(through), with_ids=True)
        outage_segments_with_ids(slices[2], 900_000_000).write.parquet(
            f"{store}/outage/batch_id=2"
        )
        # fresh-checkpoint replay: slice 0 re-lands at batch_id 0 <= hwm
        outage_segments_with_ids(slices[0], 900_000_000).write.parquet(
            f"{store}/outage/batch_id=0"
        )
        with open(os.path.join(store, "_STORE_DONE"), "w"):
            pass

    ensure_index(
        build,
        store,
        marker="_STORE_DONE",
        fingerprint=_fp_cached(
            spark, sf_dir, "events",
            lambda: corpus_fingerprint(events, id_col="event_id"),
        ),
    )
    return outage_from_store_with_ids(spark, store)


# ---------------------------------------------------------------------------
# x214: the STREAMING INGEST pipeline under the oracle gate (r13 verdict
# item 3 — the whole T1-T5 tier was pytest-only by construction).  The
# build derives a breadcrumb-shaped JSON feed from the events corpus,
# runs the checkpointed availableNow ingest (run_ingest_pipeline:
# readStream → enrich → validate/quarantine → foreachBatch dedup-upsert)
# over it in two landings plus a no-new-files restart, and serves the
# STREAMED warehouse against an oracle that recomputes the same
# aggregate from raw events — putting foreachBatch/checkpoint semantics
# under rows+schema+value-hash for the first time.
# ---------------------------------------------------------------------------
@query(
    "x214_streamed_ingest_serve",
    oracle="""
    WITH b AS (
        SELECT CAST(user_id % 97 + 1 AS BIGINT) AS vehicle_id,
               user_id * 1000000
                 + date_diff('day', DATE '2020-01-01', CAST(ts AS DATE)) AS trip_id,
               ((event_id % 180) - 90) + 0.25 AS lat,
               CASE WHEN event_id % 11 = 0 THEN 0.0
                    ELSE ((event_id % 360) - 180) + 0.25 END AS lon
        FROM events
        WHERE event_id % 37 <> 0
    )
    SELECT vehicle_id,
           CAST(COUNT(DISTINCT trip_id) AS BIGINT) AS n_trips,
           CAST(COUNT(*) AS BIGINT) AS n_crumbs,
           SUM(lat) AS sum_lat,
           SUM(lon) AS sum_lon
    FROM b GROUP BY vehicle_id ORDER BY vehicle_id
    """,
)
def x214_streamed_ingest_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vehicle warehouse audit served from a STREAM-BUILT warehouse:
    the build maps events onto the breadcrumb wire shape
    deterministically — trip = (user, day) as ``user_id·10^6 + days
    since 2020-01-01``, vehicle = ``user_id % 97 + 1``, OPD_DATE/
    ACT_TIME from ts, METERS = seconds-of-day (so per-trip Δmeters/Δt
    speeds are non-negative by construction), quarter-integral GPS
    (order-independent-exact SUMs), every 37th event poisoned with
    VEHICLE_ID=0 (fails P16's vehicle_id_positive → quarantined), every
    11th with NULL longitude (P5 null-fill → 0.0) — writes it as a JSON
    landing in two generations, and runs ``run_ingest_pipeline`` after
    each plus once more with no new files: T1 (availableNow trigger),
    T2 (validator quarantine), T3 (foreachBatch trip dedup-upsert +
    breadcrumb append), T5 (checkpointed restart lands each file
    exactly once — the second run processes only generation B, the
    third nothing).  The serve joins the streamed breadcrumb fact to
    the trip dim (J3's shape, dim broadcast) and aggregates per
    vehicle; the oracle recomputes from raw events with the same
    mapping minus the quarantined rows, so a double-landed file, a
    replayed batch, a dropped generation, an un-filled GPS null, or a
    quarantine leak all fail the value-hash on n_crumbs / n_trips /
    sum_lon.  The build raises unless the checkpoint's offsets log
    exists — the lifecycle demonstrably went through writeStream.

    Scale shape: the ingest is one file-source stream — per batch one
    window shuffle on trip for the enrich chain (W1/W2), one map-side
    validator pass, and a broadcast-able anti-join against landed trip
    ids; state is the checkpoint's file log, not data.  Reference:
    Part1/subscriber_project.py:17-100 (the daily Pub/Sub pull this
    re-architects as a checkpointed stream)."""
    import shutil

    from ..operators.ann_index import corpus_fingerprint, ensure_index
    from ..streaming.pipeline import run_ingest_pipeline

    events = load_table(spark, sf_dir, "events")
    store = _tagged_dir(_SCRATCH, "streamed_warehouse", sf_dir=sf_dir)
    trip_path = os.path.join(store, "trip")
    crumb_path = os.path.join(store, "breadcrumb")

    def build() -> None:
        shutil.rmtree(store, ignore_errors=True)
        landing = os.path.join(store, "landing")
        ck = os.path.join(store, "checkpoint")
        secs = (F.hour("ts") * 3600 + F.minute("ts") * 60 + F.second("ts")).cast("int")
        trip = (
            F.col("user_id") * F.lit(1000000)
            + F.datediff(F.to_date("ts"), F.lit("2020-01-01").cast("date"))
        ).cast("long")
        feed = events.select(
            trip.alias("EVENT_NO_TRIP"),
            trip.alias("EVENT_NO_STOP"),
            F.concat(F.date_format("ts", "ddMMMyyyy"), F.lit(":00:00:00")).alias(
                "OPD_DATE"
            ),
            F.when(F.col("event_id") % 37 == 0, F.lit(0))
            .otherwise((F.col("user_id") % 97 + 1).cast("int"))
            .cast("int")
            .alias("VEHICLE_ID"),
            secs.cast("long").alias("METERS"),
            secs.alias("ACT_TIME"),
            F.when(F.col("event_id") % 11 == 0, F.lit(None).cast("double"))
            .otherwise(((F.col("event_id") % 360) - 180).cast("double") + F.lit(0.25))
            .alias("GPS_LONGITUDE"),
            (((F.col("event_id") % 180) - 90).cast("double") + F.lit(0.25)).alias(
                "GPS_LATITUDE"
            ),
            F.lit(7).alias("GPS_SATELLITES"),
            F.lit(1.0).alias("GPS_HDOP"),
            (F.col("event_id") % 2).alias("_gen"),
        )
        for g in (0, 1):
            feed.filter(F.col("_gen") == g).drop("_gen").coalesce(4).write.mode(
                "append"
            ).json(landing)
            run_ingest_pipeline(
                spark, landing, trip_path, crumb_path, ck,
                quarantine_path=os.path.join(store, "quarantine"),
            )
        # T5: a restart with nothing new must land nothing (the serve's
        # exact counts are the witness)
        run_ingest_pipeline(
            spark, landing, trip_path, crumb_path, ck,
            quarantine_path=os.path.join(store, "quarantine"),
        )
        if not os.path.isdir(os.path.join(ck, "offsets")):
            raise IOError(
                f"{ck}/offsets missing after the ingest runs — the build "
                "did not go through a checkpointed writeStream; refusing "
                "to mark the store done"
            )
        with open(os.path.join(store, "_STORE_DONE"), "w"):
            pass

    ensure_index(
        build,
        store,
        marker="_STORE_DONE",
        fingerprint=_fp_cached(
            spark, sf_dir, "events",
            lambda: corpus_fingerprint(events, id_col="event_id"),
        ),
    )
    trips = spark.read.parquet(trip_path).select(
        "trip_id", F.col("vehicle_id").cast("long").alias("vehicle_id")
    )
    crumbs = spark.read.parquet(crumb_path)
    return (
        crumbs.join(F.broadcast(trips), "trip_id")
        .groupBy("vehicle_id")
        .agg(
            F.count_distinct("trip_id").cast("long").alias("n_trips"),
            F.count("*").cast("long").alias("n_crumbs"),
            F.sum("latitude").alias("sum_lat"),
            F.sum("longitude").alias("sum_lon"),
        )
        .orderBy("vehicle_id")
    )


# ---------------------------------------------------------------------------
# x215: a SECOND compact_store kind under the oracle gate (r13 verdict
# item 4): the FUNNEL store exercises the explicit group_cols/folds
# argument path (its columns are parameterized by the stage tuple, so
# it has no STORE_SPECS entry) and a different fold (min vs x212's
# sum) — same land → fold → land → replay lifecycle, served against
# x192's raw-event funnel oracle.
# ---------------------------------------------------------------------------
@query(
    "x215_compacted_funnel_serve",
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
def x215_compacted_funnel_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x192's first-touch funnel served from a COMPACTED funnel store:
    the build lands per-batch (user, first-touch-µs) min tables for two
    thirds of the feed (event_id % 3 ∈ {0, 1}), folds them through
    ``compact_store``'s EXPLICIT-arguments path — group ``user_id``,
    fold ``min`` per stage column, the kind with no built-in spec —
    lands the third slice as a live tail, and re-lands slice 0 at
    batch_id=0 (the fresh-checkpoint replay the hwm ignores).  The
    serve (``funnel_from_store``) min-folds consolidated ∪ tail per
    user and only THEN applies the strict-order stage test — which is
    why the fold is exact: a user's first view may land in a different
    slice than their first click, and the folded mins still order
    correctly.  The oracle recomputes the stage histogram from raw
    events (x192's SQL verbatim): a double-counted replay cannot move a
    MIN, so the discriminating failures here are a LOST fold input
    (stage times regress to a later slice's min — users shift between
    histogram buckets) and a mis-grouped explicit fold.

    Scale shape: the store holds O(users) rows per landing; compaction
    bounds the metadata tier (one landing per 15 min = ~35k dirs/year →
    O(1) consolidated + live tail) while the serve fold shuffles only
    (user, 3×µs) rows — the corpus is scanned once per landing, never
    at serve time."""
    import shutil

    from ..operators.ann_index import corpus_fingerprint, ensure_index
    from ..streaming.compaction import compact_store
    from ..streaming.stats import funnel_from_store, funnel_min_table

    events = load_table(spark, sf_dir, "events")
    store = _tagged_dir(_SCRATCH, "compacted_funnel", sf_dir=sf_dir)

    def build() -> None:
        shutil.rmtree(store, ignore_errors=True)
        slices = [events.filter(F.col("event_id") % 3 == i) for i in range(3)]
        for i in (0, 1):
            funnel_min_table(slices[i]).write.parquet(f"{store}/funnel/batch_id={i}")
        compact_store(
            spark, store, "funnel",
            group_cols=["user_id"],
            folds={"t_view": "min", "t_click": "min", "t_purchase": "min"},
        )  # folds 0,1 -> gen 1, hwm 1
        funnel_min_table(slices[2]).write.parquet(f"{store}/funnel/batch_id=2")
        # fresh-checkpoint replay: slice 0 re-lands at batch_id 0 <= hwm
        funnel_min_table(slices[0]).write.parquet(f"{store}/funnel/batch_id=0")
        with open(os.path.join(store, "_STORE_DONE"), "w"):
            pass

    ensure_index(
        build,
        store,
        marker="_STORE_DONE",
        fingerprint=_fp_cached(
            spark, sf_dir, "events",
            lambda: corpus_fingerprint(events, id_col="event_id"),
        ),
    )
    return funnel_from_store(spark, store)


# ---------------------------------------------------------------------------
# x216: a MULTI-GENERATION compaction chain under the oracle gate (r13
# verdict item 5): x212/x213 commit generation 1; this lifecycle
# compacts TWICE with landings between — the gen-n pointer arithmetic
# (consolidated gen-1 ∪ new tail → gen-2, hwm re-derived) was
# hypothesis-pinned but had no driver row.
# ---------------------------------------------------------------------------
@query("x216_recompacted_cms_serve", oracle=_build_cms_oracle())
def x216_recompacted_cms_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x185's heavy-hitter probe served through a TWICE-compacted CMS
    store: land slices 0,1 (event_id % 5) → compact (gen-1, hwm 1) →
    land slices 2,3 → compact AGAIN — the re-compaction folds the
    PRIOR CONSOLIDATED GENERATION together with the new dirs into
    gen-2 (hwm 3) and retires gen-1 — → land slice 4 as the live tail
    → re-land slice 1 at batch_id=1 (≤ hwm: the fresh-checkpoint
    replay the serve ignores).  The build refuses to mark itself done
    unless the pointer reads exactly ``.consolidated-gen-2:3`` — the
    lifecycle demonstrably chained generations.  The serve
    (``cms_from_store``) then equals one sketch over the whole feed,
    which the oracle recomputes cell-by-cell from raw events with the
    portable md5-slice hash: losing the gen-1 rows in the re-fold,
    double-folding them, or serving the replay all move ``est``.

    Scale shape: re-compaction is the STEADY-STATE maintenance shape —
    a store compacted nightly folds gen-(n−1) ∪ ~96 tail dirs into
    gen-n, keeping the directory count O(1) forever, and each fold
    shuffles ≤ depth·width counter rows regardless of generation
    count (the x212 broadcast-probe plan pin applies unchanged)."""
    import shutil

    from ..operators.ann_index import corpus_fingerprint, ensure_index
    from ..operators.sketch import cms_counters, cms_estimate
    from ..streaming.compaction import _read_pointer, compact_store
    from ..streaming.stats import cms_from_store

    events = load_table(spark, sf_dir, "events")
    store = _tagged_dir(_SCRATCH, "recompacted_cms", sf_dir=sf_dir)

    def build() -> None:
        shutil.rmtree(store, ignore_errors=True)
        slices = [
            events.filter(F.col("event_id") % 5 == i).selectExpr("user_id AS _k")
            for i in range(5)
        ]

        def land(i: int) -> None:
            cms_counters(slices[i], "_k", 4, 1024).write.mode("overwrite").parquet(
                f"{store}/cms/batch_id={i}"
            )

        land(0), land(1)
        compact_store(spark, store, "cms")  # gen-1, hwm 1
        land(2), land(3)
        compact_store(spark, store, "cms")  # gen-1 ∪ {2,3} -> gen-2, hwm 3
        land(4)  # live tail above the hwm
        land(1)  # fresh-checkpoint replay at batch_id 1 <= hwm
        ptr = _read_pointer(f"{store}/cms")
        if ptr != (".consolidated-gen-2", 3):
            raise IOError(
                f"{store}/cms pointer reads {ptr!r}, expected "
                "('.consolidated-gen-2', 3) — the build did not chain two "
                "compaction generations; refusing to mark the store done"
            )
        with open(os.path.join(store, "_STORE_DONE"), "w"):
            pass

    ensure_index(
        build,
        store,
        marker="_STORE_DONE",
        fingerprint=_fp_cached(
            spark, sf_dir, "events",
            lambda: corpus_fingerprint(events, id_col="event_id"),
        ),
    )
    counters = cms_from_store(spark, store)
    counts = events.groupBy("user_id").agg(F.count("*").cast("long").alias("c"))
    top = counts.orderBy(F.desc("c"), F.asc("user_id")).limit(20)
    return (
        cms_estimate(top, counters, "user_id", depth=4, width=1024)
        .select("user_id", "c", "est")
        .orderBy(F.desc("c"), F.asc("user_id"))
    )


# ---------------------------------------------------------------------------
# x217: the registry's PINNED HISTORICAL VERSION serve under the oracle
# gate (r13 verdict item 7): x211 serves _schema/current; this serves
# version 1 explicitly over the SAME two-generation store — time-travel
# for a downstream job that validated against v1 and must keep its
# exact column view while the landing evolves.  The result is shaped so
# a broken pin is VISIBLE: one output row per column of the served
# view, so silently serving v2 emits a third (tok_est) row and fails
# rows_match, not just values.
# ---------------------------------------------------------------------------
@query(
    "x217_registered_version_pinned_serve",
    oracle="""
    WITH a AS (SELECT CAST(COUNT(doc_id) AS BIGINT) AS n1,
                      CAST(SUM(doc_id) AS BIGINT) AS s1,
                      CAST(COUNT(n_chars) AS BIGINT) AS n2,
                      CAST(SUM(n_chars) AS BIGINT) AS s2
               FROM documents)
    SELECT 'doc_id' AS col_name, n1 AS n_nonnull, s1 AS col_sum FROM a
    UNION ALL
    SELECT 'n_chars' AS col_name, n2 AS n_nonnull, s2 AS col_sum FROM a
    ORDER BY col_name
    """,
)
def x217_registered_version_pinned_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column (count, sum) profile of the landing served at PINNED
    schema version 1 (``read_registered(..., version=1)``) — the
    columns come from the served view itself, not a hand-written list,
    so the query's row set IS the version pin: v1 yields exactly the
    (doc_id, n_chars) rows the oracle recomputes from raw documents,
    while a pin that silently resolved the current pointer would emit a
    third ``tok_est`` row and fail rows_match.  Generation 1's files
    carry the v2 column on disk; parquet's per-file projection drops it
    under the pinned schema (the add-only registration contract
    guarantees every v1 column still exists, exactly typed, in every
    later generation — so a pinned read is total, never a cast).

    Scale shape: one small text GET for the version file, one
    column-pruned multi-path scan, one single-row aggregate unpivoted
    driver-side-free via ``stack`` — no footer sweep, no per-version
    data copies (time travel is a PROJECTION, not a snapshot)."""
    from ..sources.readers import read_registered

    store = _ensure_registered_landing(spark, sf_dir)
    landing = read_registered(spark, store, version=1)
    cols = landing.columns
    agg = landing.agg(
        *[F.count(c).cast("long").alias(f"n_{c}") for c in cols],
        *[F.sum(c).cast("long").alias(f"s_{c}") for c in cols],
    )
    stack = ", ".join(f"'{c}', n_{c}, s_{c}" for c in cols)
    return agg.select(
        F.expr(
            f"stack({len(cols)}, {stack}) AS (col_name, n_nonnull, col_sum)"
        )
    ).orderBy("col_name")
