"""Snapshot-serving tier: language-ID re-identification, content-
fingerprinted snapshot probes.

Split from ``plans/extensions.py`` at the round-14 close (r13 verdict
item 8) — code moved VERBATIM; the aggregator re-exports every name, so
``plans.extensions.<name>`` remains the stable public path."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window, functions as F
from ..registry import query
from ..tables import load_table
from ...operators.textstats import LANG_WORD_PATTERN
from .fragments import _VEC, _cos_sql
from .scratch import _SCRATCH, _fp_cached, _index_dir, _tagged_dir
from .retrieval import _build_power_iteration_ctes, _fold_sql, _hex_ladder
from .selection import _TEST_SPLIT_WHERE, _TRAIN_SPLIT_WHERE, _perceptron_cte_parts

# ---------------------------------------------------------------------------
# Round-8 tier: language-ID snapshot serving, content-fingerprinted indexes
# ---------------------------------------------------------------------------


def _script_mask_sql(text_expr: str) -> str:
    """DuckDB twin of operators.textstats.script_mask — generated from
    the SAME SCRIPT_CLASSES tuple so the two sides cannot drift."""
    from ...operators.textstats import SCRIPT_CLASSES

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
    from ...operators.ann_index import ensure_index
    from ...operators.textstats import (
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
    from ...operators.classifier import perceptron_margins, perceptron_train
    from ...operators.sampling import train_val_test_split

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
    from ...operators.ann_index import (
        corpus_fingerprint,
        ensure_index,
        ivf_knn_join,
        write_ivf_index,
    )
    from ...operators.spectral import (
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
    from ...operators.ann_index import ensure_index
    from ...operators.textstats import (
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


