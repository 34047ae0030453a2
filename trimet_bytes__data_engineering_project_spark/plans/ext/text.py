"""Text analysis: token counts, quality stats, language-ID, fingerprints,
k-means centroid audit.

Split from ``plans/extensions.py`` at the round-14 close (r13 verdict
item 8) — code moved VERBATIM; the aggregator re-exports every name, so
``plans.extensions.<name>`` remains the stable public path."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from ..registry import query
from ..tables import load_table
from ...operators.similarity import hyperplanes
from ...operators.textstats import bpe_token_count_col, quality_stats, token_count_col
from .fragments import _TOKS, _VEC, _cos_sql
from .scratch import _index_dir
from .ann import _QV_SQL, _dot_sql, _query_vec

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
    from ...operators.similarity import embedding_near_dup_lsh

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
    from ...operators.graph import connected_components
    from ...operators.similarity import embedding_near_dup_lsh, vector_centroids

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
    from ...operators.asof import asof_join_skewed

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
    from ...operators.ann_index import (
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


