"""Persisted-ANN-index lifecycle tests: build → probe parity, k-means
training quality.  (Partition-pruning plan shape is pinned in
test_plans.py; x20/x21 oracle parity in test_oracle_parity.py.)
"""

from __future__ import annotations

import os

import pytest

from trimet_bytes__data_engineering_project_spark.operators.ann_index import (
    ivf_index_probe,
    kmeans_centroids,
    lsh_index_probe,
    write_ivf_index,
    write_lsh_index,
)
from trimet_bytes__data_engineering_project_spark.operators.similarity import (
    brute_force_topk,
    ivf_topk,
    lsh_topk,
)
from trimet_bytes__data_engineering_project_spark.plans.tables import load_table

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_DIR, "embeddings")


@pytest.fixture(scope="module")
def qvec(emb):
    return [float(v) for v in emb.filter("vec_id = 0").first()["embedding"]]


def test_lsh_index_probe_equals_query_time(spark, emb, qvec, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("lsh") / "idx")
    write_lsh_index(emb, path, dim=len(qvec))
    probe = lsh_index_probe(spark, path, qvec, k=5).collect()
    base = lsh_topk(emb, qvec, k=5).collect()
    assert [tuple(r) for r in probe] == [tuple(r) for r in base]


def test_lsh_multiprobe_recall_dial(spark, emb, qvec, tmp_path_factory):
    """Hamming-radius multi-probe: (a) expand_buckets generates exactly
    the <=r-distance ids; (b) a larger radius scans a superset, so
    recall@k vs brute force is monotone non-decreasing in r, and at
    r = n_planes (every bucket) the probe IS brute force; (c) measured
    over spread query vectors, radius 1 strictly recovers neighbors a
    single-bucket probe misses on this corpus."""
    from trimet_bytes__data_engineering_project_spark.operators.ann_index import (
        expand_buckets,
    )

    assert expand_buckets(0b0101, 4, 0) == [0b0101]
    assert expand_buckets(0b0101, 4, 1) == sorted([0b0101, 0b0100, 0b0111, 0b0001, 0b1101])
    assert expand_buckets(0, 4, 4) == list(range(16))

    path = str(tmp_path_factory.mktemp("multiprobe") / "idx")
    write_lsh_index(emb, path, dim=len(qvec))

    n = emb.count()
    ids = sorted(int(r["vec_id"]) for r in emb.select("vec_id").collect())
    qids = ids[:: max(1, n // 12)][:12]
    rows = emb.filter(emb["vec_id"].isin(qids)).collect()
    vecs = {int(r["vec_id"]): [float(x) for x in r["embedding"]] for r in rows}
    truth = {
        q: {r["vec_id"] for r in brute_force_topk(emb, vecs[q], 10).collect()} for q in qids
    }

    def recall(radius: int) -> float:
        hits = sum(
            len(
                {
                    r["vec_id"]
                    for r in lsh_index_probe(
                        spark, path, vecs[q], 10, hamming_radius=radius
                    ).collect()
                }
                & truth[q]
            )
            for q in qids
        )
        return hits / (10 * len(qids))

    recalls = [recall(r) for r in range(5)]
    assert all(b >= a for a, b in zip(recalls, recalls[1:])), recalls
    assert recalls[4] == 1.0  # radius = n_planes ≡ brute force
    assert recalls[1] > recalls[0], recalls  # the dial actually buys recall here


def test_lsh_index_append_probe_sees_both_generations(spark, emb, qvec, tmp_path_factory):
    """build(evens) → append(odds) → probe ≡ one-shot full-corpus index:
    the deterministic hyperplanes put appended vectors in the same
    bucket scheme, so every probe radius sees both generations."""
    base = tmp_path_factory.mktemp("lsh_append")
    inc, full = str(base / "inc"), str(base / "full")
    write_lsh_index(emb.filter("vec_id % 2 = 0"), inc, dim=len(qvec))
    before = {r["vec_id"] for r in lsh_index_probe(spark, inc, qvec, k=50).collect()}
    assert all(v % 2 == 0 for v in before)
    write_lsh_index(emb.filter("vec_id % 2 = 1"), inc, dim=len(qvec), mode="append")
    write_lsh_index(emb, full, dim=len(qvec))
    got = lsh_index_probe(spark, inc, qvec, k=50).collect()
    want = lsh_index_probe(spark, full, qvec, k=50).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    assert {r["vec_id"] % 2 for r in got} == {0, 1}  # both generations served


def test_ivf_index_append_reuses_persisted_quantizer(spark, emb, qvec, tmp_path_factory):
    """IVF append assigns new vectors against the ALREADY-PERSISTED
    centroid table (recomputing the quantizer from the append batch
    would scatter generations across incompatible lists): probe after
    append ≡ one-shot index built with the same centroids."""
    base = tmp_path_factory.mktemp("ivf_append")
    inc, full = str(base / "inc"), str(base / "full")
    evens, n_c = emb.filter("vec_id % 2 = 0"), 8
    write_ivf_index(evens, inc, n_centroids=n_c)
    cents = spark.read.parquet(inc + "_centroids")
    write_ivf_index(emb.filter("vec_id % 2 = 1"), inc, mode="append")
    # quantizer untouched by the append
    assert sorted(r["centroid_id"] for r in spark.read.parquet(inc + "_centroids").collect()) == \
        sorted(r["centroid_id"] for r in cents.collect())
    write_ivf_index(emb, full, centroids=cents)
    for nprobe in (1, n_c):
        got = ivf_index_probe(spark, inc, qvec, k=20, nprobe=nprobe).collect()
        want = ivf_index_probe(spark, full, qvec, k=20, nprobe=nprobe).collect()
        assert [tuple(r) for r in got] == [tuple(r) for r in want], nprobe


def test_ivf_index_probe_equals_query_time(spark, emb, qvec, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ivf") / "idx")
    write_ivf_index(emb, path, n_centroids=16)
    for nprobe in (1, 16):
        probe = ivf_index_probe(spark, path, qvec, k=5, nprobe=nprobe).collect()
        base = ivf_topk(emb, qvec, k=5, n_centroids=16, nprobe=nprobe).collect()
        assert [tuple(r) for r in probe] == [tuple(r) for r in base], nprobe


def test_ivf_full_probe_is_brute_force(spark, emb, qvec, tmp_path_factory):
    """nprobe = n_centroids scans every inverted list — must equal the
    exact answer (the recall dial's top end)."""
    path = str(tmp_path_factory.mktemp("ivf_full") / "idx")
    write_ivf_index(emb, path, n_centroids=16)
    probe = ivf_index_probe(spark, path, qvec, k=10, nprobe=16).collect()
    exact = brute_force_topk(emb, qvec, k=10).collect()
    assert [tuple(r) for r in probe] == [tuple(r) for r in exact]


def test_kmeans_centroids_beat_first_n_recall(spark, emb, tmp_path_factory):
    """Trained coarse quantizer: probe-1 recall@10 with k-means
    centroids must be >= the deterministic first-16-by-id quantizer,
    measured over query vectors spread across the whole corpus (not the
    first ids, which ARE the first-16 centroids)."""
    n = emb.count()
    ids = sorted(int(r["vec_id"]) for r in emb.select("vec_id").collect())
    qids = ids[:: max(1, n // 15)][:15]
    rows = emb.filter(emb["vec_id"].isin(qids)).collect()
    vecs = {int(r["vec_id"]): [float(x) for x in r["embedding"]] for r in rows}
    truth = {
        q: {r["vec_id"] for r in brute_force_topk(emb, vecs[q], 10).collect()} for q in qids
    }

    base = tmp_path_factory.mktemp("recall")
    p_first, p_km = str(base / "first16"), str(base / "kmeans")
    write_ivf_index(emb, p_first, n_centroids=16)
    km = kmeans_centroids(emb, n_centroids=16, n_iter=3)
    assert km.count() <= 16
    write_ivf_index(emb, p_km, centroids=km)

    def recall(path: str) -> float:
        hits = sum(
            len(
                {r["vec_id"] for r in ivf_index_probe(spark, path, vecs[q], 10, 1).collect()}
                & truth[q]
            )
            for q in qids
        )
        return hits / (10 * len(qids))

    r_first, r_km = recall(p_first), recall(p_km)
    assert r_km >= r_first, (r_km, r_first)


def test_kmeans_update_matches_exact_averages(spark, emb):
    """The posexplode-based (centroid_id, dim) update — the
    dimension-independent form that survives dim=768+ — must produce
    exactly the Lloyd iterate: an independent numpy twin (same
    deterministic farthest-first init, same argmax-cosine assignment,
    exact per-cluster means) reproduces the returned centroids."""
    import numpy as np

    rows = emb.select("vec_id", "embedding").orderBy("vec_id").collect()
    ids = np.array([int(r["vec_id"]) for r in rows])
    mat = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    n_c, n_iter = 6, 2

    # init: farthest-first over the first-256-by-id sample
    smat = mat[:256]
    norms = np.linalg.norm(smat, axis=1, keepdims=True)
    unit = smat / np.where(norms == 0.0, 1.0, norms)
    chosen = [0]
    while len(chosen) < n_c:
        max_sim = (unit @ unit[chosen].T).max(axis=1)
        max_sim[chosen] = np.inf
        chosen.append(int(np.argmin(max_sim)))
    cids = ids[chosen]
    cvecs = mat[chosen]

    def unit_rows(m):
        n = np.linalg.norm(m, axis=1, keepdims=True)
        return m / np.where(n == 0.0, 1.0, n)

    for _ in range(n_iter):
        sims = unit_rows(mat) @ unit_rows(cvecs).T
        # argmax cosine, ties to the LOWEST centroid_id (the window's
        # ORDER BY desc(cos), centroid_id) — centroids sorted by id first
        order = np.argsort(cids)
        sims = sims[:, order]
        best = order[np.argmax(sims, axis=1)]
        keep = sorted(set(best))
        cids = np.array([cids[b] for b in keep])
        cvecs = np.stack([mat[best == b].mean(axis=0) for b in keep])

    got = {int(r["centroid_id"]): np.asarray(r["cvec"]) for r in
           kmeans_centroids(emb, n_c, n_iter=n_iter).collect()}
    assert sorted(got) == sorted(int(c) for c in cids)
    for cid, vec in zip(cids, cvecs):
        np.testing.assert_allclose(got[int(cid)], vec, rtol=1e-9, atol=1e-12)


def test_kmeans_is_deterministic(spark, emb):
    a = sorted(tuple(r) for r in kmeans_centroids(emb, 8, n_iter=2).collect())
    b = sorted(tuple(r) for r in kmeans_centroids(emb, 8, n_iter=2).collect())
    assert [c[0] for c in a] == [c[0] for c in b]


def test_index_build_once_guard(spark, emb, qvec, tmp_path_factory):
    from trimet_bytes__data_engineering_project_spark.operators.ann_index import ensure_index

    path = str(tmp_path_factory.mktemp("guard") / "idx")
    calls = []

    def build():
        calls.append(1)
        write_lsh_index(emb, path, dim=len(qvec))

    ensure_index(build, path)
    ensure_index(build, path)
    assert calls == [1]
    assert os.path.exists(os.path.join(path, "_SUCCESS"))


def test_knn_join_index_equals_query_time_join(spark, emb, tmp_path_factory):
    """The index-backed batch kNN join returns EXACTLY knn_join's rows
    over the same corpus and planes — the index changes per-run cost
    (O(batch) signatures + partition-pruned scan + stored norms), never
    the result.  Also pins the norm fallback: an index written WITHOUT
    the norm column (pre-v5 layout) yields identical cosines."""
    from pyspark.sql import functions as F

    from trimet_bytes__data_engineering_project_spark.operators.ann_index import (
        knn_join_index,
    )
    from trimet_bytes__data_engineering_project_spark.operators.similarity import (
        knn_join,
    )

    dim = len(emb.first()["embedding"])
    queries = emb.filter(F.col("vec_id") % 10 == 0)
    corpus = emb.filter(F.col("vec_id") % 10 != 0)
    path = str(tmp_path_factory.mktemp("knnidx") / "idx")
    write_lsh_index(corpus, path, dim=dim)
    got = sorted(tuple(r) for r in knn_join_index(spark, queries, path, dim, k=3).collect())
    want = sorted(tuple(r) for r in knn_join(queries, corpus, dim=dim, k=3).collect())
    assert got == want and len(got) > 0

    # pre-v5 index (no norm column): fallback computes it on scan
    old = str(tmp_path_factory.mktemp("knnidx") / "old")
    spark.read.parquet(path).drop("norm").write.partitionBy("bucket").parquet(old)
    got_old = sorted(tuple(r) for r in knn_join_index(spark, queries, old, dim, k=3).collect())
    assert got_old == want

    # MIXED-generation index: half the corpus written pre-v5 (no norm),
    # the other half appended by the current writer — the merged schema
    # HAS "norm" but old-generation rows read it as NULL, so the norm
    # fallback must be per-ROW (coalesce), not per-schema: every
    # old-generation vector still scores and the result is unchanged
    mixed = str(tmp_path_factory.mktemp("knnidx") / "mixed")
    old_gen = corpus.filter(F.col("vec_id") % 2 == 0)
    new_gen = corpus.filter(F.col("vec_id") % 2 != 0)
    (
        spark.read.parquet(path)
        .join(old_gen.select("vec_id"), "vec_id", "left_semi")
        .drop("norm")
        .write.partitionBy("bucket")
        .parquet(mixed)
    )
    write_lsh_index(new_gen, mixed, dim=dim, mode="append")
    got_mixed = sorted(
        tuple(r) for r in knn_join_index(spark, queries, mixed, dim, k=3).collect()
    )
    assert got_mixed == want


def test_ivf_knn_join_equals_per_query_probe(spark, emb, tmp_path_factory):
    """The batch IVF kNN join returns, for every query, exactly what
    ivf_index_probe returns for that query vector alone on the same
    index (same quantizer, same assignment, same tie order) — and at
    nprobe = n_centroids it degrades to exact per-query brute force
    over the indexed corpus."""
    from pyspark.sql import functions as F

    from trimet_bytes__data_engineering_project_spark.operators.ann_index import (
        ivf_index_probe,
        ivf_knn_join,
        write_ivf_index,
    )

    corpus = emb.filter(F.col("vec_id") % 10 != 0)
    queries = emb.filter(F.col("vec_id") % 10 == 0).limit(5)
    path = str(tmp_path_factory.mktemp("ivfknn") / "idx")
    write_ivf_index(corpus, path)

    got = {}
    for r in ivf_knn_join(spark, queries, path, k=3).collect():
        got.setdefault(r.q_id, []).append((r.c_id, r.cos_sim))
    for q in queries.collect():
        vec = [float(x) for x in q["embedding"]]
        want = [(r.vec_id, r.cos_sim) for r in ivf_index_probe(spark, path, vec, k=3).collect()]
        assert got.get(q.vec_id, []) == want, q.vec_id

    # nprobe = n_centroids degrades to exact per-query brute force over
    # the indexed corpus (every inverted list probed)
    from trimet_bytes__data_engineering_project_spark.operators.similarity import (
        brute_force_topk,
    )

    full = {}
    for r in ivf_knn_join(spark, queries, path, k=3, nprobe=16).collect():
        full.setdefault(r.q_id, []).append((r.c_id, r.cos_sim))
    for q in queries.collect():
        vec = [float(x) for x in q["embedding"]]
        want = [
            (r.vec_id, r.cos_sim)
            for r in brute_force_topk(corpus, vec, k=3).collect()
        ]
        assert full.get(q.vec_id, []) == want, q.vec_id


def test_quantized_index_join_matches_inflight_quantized(spark, emb, tmp_path_factory):
    """The compressed index serve equals computing the same quantized
    bucket join in-flight (quantize_vec + quantized_cosine over the
    float corpus) — persisting int8 changes the bytes scanned, never
    the scores — and the stored layout is genuinely smaller than the
    float index over the same rows."""
    import os as _os

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from trimet_bytes__data_engineering_project_spark.operators.ann_index import (
        quantized_knn_join_index,
        write_lsh_index,
        write_quantized_lsh_index,
    )
    from trimet_bytes__data_engineering_project_spark.operators.similarity import (
        as_double_vec,
        hyperplanes,
        lsh_bucket,
        quantize_vec,
        quantized_cosine,
    )

    dim = len(emb.first()["embedding"])
    queries = emb.filter(F.col("vec_id") % 10 == 0)
    corpus = emb.filter(F.col("vec_id") % 10 != 0)
    qpath = str(tmp_path_factory.mktemp("qidx") / "q")
    write_quantized_lsh_index(corpus, qpath, dim=dim)
    got = sorted(
        tuple(r) for r in quantized_knn_join_index(spark, queries, qpath, dim, k=3).collect()
    )

    planes = hyperplanes(4, dim)
    v = as_double_vec("embedding")
    qs = queries.select(
        F.col("vec_id").alias("q_id"), quantize_vec(v).alias("qq"),
        lsh_bucket(v, planes).alias("bucket"))
    cs = corpus.select(
        F.col("vec_id").alias("c_id"), quantize_vec(v).alias("cq"),
        lsh_bucket(v, planes).alias("bucket"))
    w = Window.partitionBy("q_id").orderBy(F.desc("q_cos"), "c_id")
    want = sorted(
        tuple(r)
        for r in qs.join(cs, "bucket")
        .withColumn("q_cos", quantized_cosine(F.col("qq"), F.col("cq")))
        .filter(F.col("q_cos").isNotNull())
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("q_id", "c_id", "q_cos", "rn")
        .collect()
    )
    assert got == want and len(got) > 0

    fpath = str(tmp_path_factory.mktemp("qidx") / "f")
    write_lsh_index(corpus, fpath, dim=dim)

    def nbytes(p):
        return sum(
            _os.path.getsize(_os.path.join(r, f))
            for r, _, fs in _os.walk(p) for f in fs if f.endswith(".parquet")
        )

    assert nbytes(qpath) < 0.55 * nbytes(fpath)  # compressed layout is real


def test_quantized_ivf_join_matches_python_model(spark, emb, tmp_path_factory):
    """quantized_ivf_knn_join pinned per-query to an independent Python
    recomputation of the in-flight quantize+cosine path: float coarse
    assignment against the same first-16 quantizer, symmetric-int8
    quantization (round half-away-from-zero, scale = max|x|), exact
    integer dots, (q_cos DESC, c_id) tie order."""
    import math

    from pyspark.sql import functions as F

    from trimet_bytes__data_engineering_project_spark.operators.ann_index import (
        quantized_ivf_knn_join,
        write_quantized_ivf_index,
    )

    corpus = emb.filter(F.col("vec_id") % 10 != 0)
    queries = emb.filter(F.col("vec_id") % 10 == 0).limit(5)
    path = str(tmp_path_factory.mktemp("qivf") / "idx")
    write_quantized_ivf_index(corpus, path)

    def fcos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(y * y for y in b))
        return d / (na * nb)

    def quant(v):
        s = max(abs(x) for x in v)
        if s == 0.0:
            return None
        return [math.copysign(math.floor(abs(x / s * 127) + 0.5), x) for x in v]

    cents = sorted(
        ((r["centroid_id"], [float(x) for x in r["cvec"]])
         for r in spark.read.parquet(path + "_centroids").collect())
    )
    cvecs = {
        r["vec_id"]: [float(x) for x in r["embedding"]] for r in corpus.collect()
    }
    assign = lambda v: min(cents, key=lambda c: (-fcos(v, c[1]), c[0]))[0]  # noqa: E731
    lists: dict[int, list[int]] = {}
    for cid, cv in cvecs.items():
        lists.setdefault(assign(cv), []).append(cid)

    got = {}
    for r in quantized_ivf_knn_join(spark, queries, path, k=3).collect():
        got.setdefault(r.q_id, []).append((r.c_id, r.q_cos, r.rn))
    for q in queries.collect():
        qv = [float(x) for x in q["embedding"]]
        qq = quant(qv)
        scored = []
        for cid in lists.get(assign(qv), []):
            cq = quant(cvecs[cid])
            if qq is None or cq is None:
                continue
            d = sum(int(x) * int(y) for x, y in zip(qq, cq))
            na = math.sqrt(sum(int(x) ** 2 for x in qq))
            nb = math.sqrt(sum(int(y) ** 2 for y in cq))
            scored.append((cid, d / (na * nb)))
        scored.sort(key=lambda t: (-t[1], t[0]))
        want = [(cid, cos, i + 1) for i, (cid, cos) in enumerate(scored[:3])]
        assert got.get(q["vec_id"], []) == want, q["vec_id"]


def test_quantized_ivf_index_smaller_and_recall(spark, emb, tmp_path_factory):
    """The int8 IVF layout is measurably smaller than the float layout
    over the same corpus and quantizer (the point of the compressed
    lists), and its top-3 recall against the float IVF serve on the
    same index geometry stays high — the audit a pipeline runs before
    switching serving to the compressed lists."""
    import os

    from pyspark.sql import functions as F

    from trimet_bytes__data_engineering_project_spark.operators.ann_index import (
        ivf_knn_join,
        quantized_ivf_knn_join,
        write_ivf_index,
        write_quantized_ivf_index,
    )

    corpus = emb.filter(F.col("vec_id") % 10 != 0)
    queries = emb.filter(F.col("vec_id") % 10 == 0)
    fpath = str(tmp_path_factory.mktemp("qivf_cmp") / "f")
    qpath = str(tmp_path_factory.mktemp("qivf_cmp") / "q")
    write_ivf_index(corpus, fpath)
    write_quantized_ivf_index(corpus, qpath)

    def du(p):
        return sum(
            os.path.getsize(os.path.join(d, f))
            for d, _, fs in os.walk(p)
            for f in fs
            if f.endswith(".parquet")
        )

    assert du(qpath) < 0.5 * du(fpath), (du(qpath), du(fpath))

    f = {(r.q_id, r.c_id) for r in ivf_knn_join(spark, queries, fpath, k=3).collect()}
    q = {
        (r.q_id, r.c_id)
        for r in quantized_ivf_knn_join(spark, queries, qpath, k=3).collect()
    }
    recall = len(f & q) / len(f)
    assert recall >= 0.9, recall


def test_quantized_ivf_append_generations(spark, emb, qvec, tmp_path_factory):
    """mode='append' reuses the persisted full-precision quantizer (a
    re-derived one would scatter generations across incompatible
    lists); a probe over the two-generation index equals one over a
    single-shot build of the full corpus."""
    from pyspark.sql import functions as F

    from trimet_bytes__data_engineering_project_spark.operators.ann_index import (
        quantized_ivf_knn_join,
        write_quantized_ivf_index,
    )

    corpus = emb.filter(F.col("vec_id") % 10 != 0)
    queries = emb.filter(F.col("vec_id") % 10 == 0).limit(5)
    gen0 = corpus.filter(F.col("vec_id") % 2 == 0)
    gen1 = corpus.filter(F.col("vec_id") % 2 != 0)

    base = tmp_path_factory.mktemp("qivf_append")
    inc = str(base / "inc")
    # the quantizer must span the same first-16 ids as the single-shot
    # build for the comparison to be exact
    cents = (
        corpus.orderBy("vec_id")
        .limit(16)
        .select(
            F.col("vec_id").alias("centroid_id"),
            F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("cvec"),
        )
    )
    write_quantized_ivf_index(gen0, inc, centroids=cents)
    write_quantized_ivf_index(gen1, inc, mode="append")
    full = str(base / "full")
    write_quantized_ivf_index(corpus, full, centroids=cents)

    got = sorted(tuple(r) for r in quantized_ivf_knn_join(spark, queries, inc, k=3).collect())
    want = sorted(tuple(r) for r in quantized_ivf_knn_join(spark, queries, full, k=3).collect())
    assert got == want and len(got) > 0


def test_ensure_index_fingerprint_staleness(spark, emb, tmp_path_factory):
    """The build-once guard rebuilds when the corpus fingerprint moves
    (a corrected corpus re-landed under the SAME path) and stays a
    no-op while it doesn't — marker-only behavior is unchanged when no
    fingerprint is passed."""
    from pyspark.sql import functions as F

    from trimet_bytes__data_engineering_project_spark.operators.ann_index import (
        corpus_fingerprint,
        ensure_index,
    )

    path = str(tmp_path_factory.mktemp("fp") / "idx")
    builds = []

    def build(df, n):
        def _b():
            builds.append(n)
            df.select("vec_id").write.mode("overwrite").parquet(path)

        return _b

    v1 = emb.filter(F.col("vec_id") < 100)
    v2 = emb.filter(F.col("vec_id") < 120)  # "corrected" corpus, same path
    fp1, fp2 = corpus_fingerprint(v1), corpus_fingerprint(v2)
    assert fp1 != fp2

    ensure_index(build(v1, 1), path, fingerprint=fp1)
    ensure_index(build(v1, 1), path, fingerprint=fp1)  # unchanged → no-op
    assert builds == [1]
    ensure_index(build(v2, 2), path, fingerprint=fp2)  # moved → rebuild
    assert builds == [1, 2]
    ensure_index(build(v2, 2), path, fingerprint=fp2)
    assert builds == [1, 2]
    # no fingerprint given → marker-only, serves whatever is there
    ensure_index(build(v2, 3), path)
    assert builds == [1, 2]


def test_quantized_ivf_writer_custom_id_col(spark, emb, tmp_path_factory):
    """Round-6 ADVICE item: write_quantized_ivf_index advertises id_col
    (writer/probe symmetry convention) but assign_to_centroids used to
    hardcode "vec_id", so any non-default id raised AnalysisException.
    Now the id threads through end-to-end: an index built over a
    doc_id-keyed corpus serves identically (modulo the id rename) to
    the default-keyed build on the same vectors."""
    from pyspark.sql import functions as F

    from trimet_bytes__data_engineering_project_spark.operators.ann_index import (
        quantized_ivf_knn_join,
        write_quantized_ivf_index,
    )

    base = tmp_path_factory.mktemp("qivf_id")
    corpus = emb.filter(F.col("vec_id") < 200)
    queries = emb.filter((F.col("vec_id") >= 200) & (F.col("vec_id") < 220))
    renamed = corpus.withColumnRenamed("vec_id", "doc_id")
    q_renamed = queries.withColumnRenamed("vec_id", "doc_id")

    p_def = str(base / "default")
    p_doc = str(base / "docid")
    write_quantized_ivf_index(corpus, p_def)
    write_quantized_ivf_index(renamed, p_doc, id_col="doc_id")

    want = sorted(
        tuple(r) for r in quantized_ivf_knn_join(spark, queries, p_def, k=3).collect()
    )
    got = sorted(
        tuple(r)
        for r in quantized_ivf_knn_join(
            spark, q_renamed, p_doc, k=3, id_col="doc_id"
        ).collect()
    )
    assert got == want and len(got) > 0


def test_corpus_fingerprint_content_col(spark, emb):
    """count+max(id) is blind to content-only corrections (same rows,
    same ids, different values); the opt-in content_col term moves on
    any value change.  Both behaviors pinned."""
    from pyspark.sql import functions as F

    from trimet_bytes__data_engineering_project_spark.operators.ann_index import (
        corpus_fingerprint,
    )

    v1 = emb.filter(F.col("vec_id") < 100)
    # "re-embedded" corpus: same ids, same count, perturbed vectors
    v2 = v1.withColumn(
        "embedding", F.transform(F.col("embedding"), lambda x: x + F.lit(1.0))
    )
    assert corpus_fingerprint(v1) == corpus_fingerprint(v2)  # documented blindness
    assert corpus_fingerprint(v1, content_col="embedding") != corpus_fingerprint(
        v2, content_col="embedding"
    )
    # deterministic: same corpus, same stamp
    assert corpus_fingerprint(v1, content_col="embedding") == corpus_fingerprint(
        v1, content_col="embedding"
    )


def test_prefix_refine_full_shortlist_equals_exact(spark, tmp_path):
    """With the shortlist as deep as the corpus the prefix stage only
    gates membership trivially — the refine output equals exact kNN
    bit-for-bit (same folds, same ties)."""
    from trimet_bytes__data_engineering_project_spark.operators.ann_index import (
        prefix_refine_knn_join,
        write_prefix_index,
    )
    from trimet_bytes__data_engineering_project_spark.operators.similarity import (
        knn_join_exact,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").filter(
        "vec_id < 200"
    )
    path = str(tmp_path / "pfx")
    write_prefix_index(emb, path, prefix_dim=16)
    q = emb.filter("vec_id % 40 = 0")
    got = {
        (r.q_id, r.rn): (r.c_id, r.cos_exact)
        for r in prefix_refine_knn_join(
            spark, q, emb, path, k=3, k_shortlist=200, prefix_dim=16
        ).collect()
    }
    want = {
        (r.q_id, r.rn): (r.c_id, r.cos_sim)
        for r in knn_join_exact(q, emb, k=3).collect()
    }
    assert got == want and len(got) == 15


def test_prefix_refine_zero_prefix_real_tail(spark, tmp_path):
    """A vector whose PREFIX is zero but whose tail is not: NULL
    prefix-cosine (ranked last in stage 1) yet — shortlisted in a small
    corpus — it reranks with its REAL full-dimension score and can win
    stage 2 (the truncation blind spot the refine stage exists for)."""
    from trimet_bytes__data_engineering_project_spark.operators.ann_index import (
        prefix_refine_knn_join,
        write_prefix_index,
    )

    rows = [
        (0, [0.0, 0.0, 5.0, 5.0]),   # zero PREFIX (p=2), strong tail
        (1, [1.0, 1.0, 0.0, 0.0]),
        (2, [1.0, 0.5, 1.0, 1.0]),
    ]
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows], ["vec_id", "embedding"]
    )
    path = str(tmp_path / "pfx")
    write_prefix_index(emb, path, prefix_dim=2)
    q = spark.createDataFrame(
        [(9, [0.0, 0.0, 1.0, 1.0])], ["vec_id", "embedding"]
    )
    got = [(r.c_id, r.rn) for r in prefix_refine_knn_join(
        spark, q, emb, path, k=3, k_shortlist=3, prefix_dim=2
    ).collect()]
    # exact cosine: c0 = 1.0 (parallel tails), c2 ~ 0.76, c1 = 0.0
    assert got[0] == (0, 1)


def test_hamming_refine_full_shortlist_equals_exact(spark, tmp_path):
    """With the shortlist as deep as the corpus, stage 1 only gates
    membership trivially — the refine output equals exact kNN
    bit-for-bit (same folds, same ties)."""
    from trimet_bytes__data_engineering_project_spark.operators.ann_index import (
        hamming_refine_knn_join,
        write_hamming_sketch,
    )
    from trimet_bytes__data_engineering_project_spark.operators.similarity import (
        knn_join_exact,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").filter(
        "vec_id < 200"
    )
    path = str(tmp_path / "ham")
    write_hamming_sketch(emb, path, dim=64, n_bits=32)
    q = emb.filter("vec_id % 40 = 0")
    got = {
        (r.q_id, r.rn): (r.c_id, r.cos_exact)
        for r in hamming_refine_knn_join(
            spark, q, emb, path, k=3, k_shortlist=200, dim=64, n_bits=32
        ).collect()
    }
    want = {
        (r.q_id, r.rn): (r.c_id, r.cos_sim)
        for r in knn_join_exact(q, emb, k=3).collect()
    }
    assert got == want and len(got) == 15


def test_hamming_sketch_word_packing(spark, tmp_path):
    """n_bits=64 packs into TWO 32-bit words and the distance sums
    across them; a vector and its negation differ in every determined
    bit, the vector and itself in none."""
    from trimet_bytes__data_engineering_project_spark.operators.ann_index import (
        sign_sketch_words,
    )
    from trimet_bytes__data_engineering_project_spark.operators.similarity import (
        as_double_vec,
        hyperplanes,
    )
    from pyspark.sql import functions as F

    planes = hyperplanes(64, 8, seed="hamming")
    emb = spark.createDataFrame(
        [(0, [1.0, -2.0, 3.0, 0.5, -1.0, 2.0, -0.5, 1.5]),
         (1, [-1.0, 2.0, -3.0, -0.5, 1.0, -2.0, 0.5, -1.5])],
        ["vec_id", "embedding"],
    )
    words = sign_sketch_words(as_double_vec("embedding"), planes)
    rows = {r.vec_id: (r.s0, r.s1) for r in emb.select(
        "vec_id", words[0].alias("s0"), words[1].alias("s1")
    ).collect()}
    for s in rows.values():
        assert 0 <= s[0] < (1 << 32) and 0 <= s[1] < (1 << 32)
    # negation flips every sign bit where dot != 0 (all 64 here:
    # md5-derived planes are never exactly orthogonal to this vector)
    hd = bin(rows[0][0] ^ rows[1][0]).count("1") + bin(rows[0][1] ^ rows[1][1]).count("1")
    assert hd == 64
    assert rows[0][0] ^ rows[0][0] == 0


def test_hamming_shortlist_orders_by_angle(spark, tmp_path):
    """An exact-duplicate candidate has Hamming distance 0 and always
    heads the shortlist; the near-duplicate beats the unrelated one —
    integer distance, deterministic at every tie."""
    from trimet_bytes__data_engineering_project_spark.operators.ann_index import (
        hamming_refine_knn_join,
        write_hamming_sketch,
    )

    base = [float((i * 7) % 13 - 6) for i in range(64)]
    near = list(base); near[0] += 0.01
    anti = [-x for x in base]
    emb = spark.createDataFrame(
        [(0, base), (1, near), (2, anti)], ["vec_id", "embedding"]
    )
    path = str(tmp_path / "ham")
    write_hamming_sketch(emb, path, dim=64, n_bits=32)
    q = spark.createDataFrame([(9, base)], ["vec_id", "embedding"])
    got = [(r.c_id, r.rn) for r in hamming_refine_knn_join(
        spark, q, emb, path, k=3, k_shortlist=2, dim=64, n_bits=32
    ).collect()]
    # shortlist of 2 keeps {0, 1} (hd 0 and ~0); anti never enters
    assert got == [(0, 1), (1, 2)]


def test_hier_assignment_degenerates_to_flat_at_full_fanout(spark):
    """With fanout == n_centroids every centroid is its own super and
    the vector's super pick IS the flat argmax, so the two-level
    assignment must equal assign_to_centroids exactly; at smaller
    fanout the output stays schema-identical and deterministic."""
    from pyspark.sql import functions as F

    from trimet_bytes__data_engineering_project_spark.operators.ann_index import (
        assign_to_centroids,
        assign_to_centroids_hier,
    )
    from trimet_bytes__data_engineering_project_spark.operators.similarity import (
        as_double_vec,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(80)
    cents = (
        emb.orderBy("vec_id")
        .limit(8)
        .select(
            F.col("vec_id").alias("centroid_id"),
            as_double_vec("embedding").alias("cvec"),
        )
    )
    flat = {
        r.vec_id: (r.centroid_id, r.norm)
        for r in assign_to_centroids(emb, cents, "embedding").collect()
    }
    full = {
        r.vec_id: (r.centroid_id, r.norm)
        for r in assign_to_centroids_hier(emb, cents, "embedding", fanout=8).collect()
    }
    assert flat == full
    small = assign_to_centroids_hier(emb, cents, "embedding", fanout=2)
    rows = small.collect()
    assert sorted(small.columns) == ["centroid_id", "embedding", "norm", "vec_id"]
    assert len(rows) == 80
    # deterministic on re-run
    again = {r.vec_id: r.centroid_id for r in assign_to_centroids_hier(
        emb, cents, "embedding", fanout=2
    ).collect()}
    assert again == {r.vec_id: r.centroid_id for r in rows}


def test_content_fingerprint_rebuild_trip(spark, tmp_path, emb):
    """The re-embedded-vectors-same-ids staleness case END TO END (r7
    verdict item 6): an IVF index built under a content-sensitive
    fingerprint is REBUILT when the embedding values change with ids
    and count unchanged — and correctly kept when nothing changed.
    The footer-only stamp would have kept serving the stale index."""
    from pyspark.sql import functions as F

    from trimet_bytes__data_engineering_project_spark.operators.ann_index import (
        corpus_fingerprint,
        ensure_index,
        write_ivf_index,
    )

    v1 = emb.filter(F.col("vec_id") < 100)
    v2 = v1.withColumn(
        "embedding",
        F.transform(F.col("embedding"), lambda x: x + F.lit(1.0)).cast(
            "array<float>"
        ),
    )
    path = str(tmp_path / "ivf_content")
    builds = []

    def _build(df, tag):
        def go():
            builds.append(tag)
            write_ivf_index(df, path, n_centroids=8)
        return go

    ensure_index(
        _build(v1, "v1"), path,
        fingerprint=corpus_fingerprint(v1, content_col="embedding"),
    )
    assert builds == ["v1"]
    # unchanged corpus: stamp matches, no rebuild
    ensure_index(
        _build(v1, "v1-again"), path,
        fingerprint=corpus_fingerprint(v1, content_col="embedding"),
    )
    assert builds == ["v1"]
    # re-embedded corpus (same ids/count): stamp moves, rebuild fires
    ensure_index(
        _build(v2, "v2"), path,
        fingerprint=corpus_fingerprint(v2, content_col="embedding"),
    )
    assert builds == ["v1", "v2"]
    # the served index now holds v2's vectors (spot-check one value)
    got = spark.read.parquet(path).filter(F.col("vec_id") == 0).first()
    want = v2.filter(F.col("vec_id") == 0).first()
    assert list(got["embedding"]) == list(want["embedding"])


def test_fp_cached_memoizes_per_recipe(spark, emb):
    """_fp_cached computes each (sf_dir, tag) stamp recipe once per
    session and distinguishes recipes by tag — the round-8 fix for the
    per-invocation stamp jobs; staleness semantics across sessions are
    unchanged because the cache dies with the session."""
    from trimet_bytes__data_engineering_project_spark.plans.extensions import (
        _fp_cached,
    )

    calls = []

    def make(v):
        def go():
            calls.append(v)
            return f"stamp-{v}"
        return go

    a1 = _fp_cached(spark, "/dir/a", "docs", make("a"))
    a2 = _fp_cached(spark, "/dir/a", "docs", make("a-again"))
    b = _fp_cached(spark, "/dir/a", "emb", make("b"))
    c = _fp_cached(spark, "/dir/b", "docs", make("c"))
    assert a1 == a2 == "stamp-a"
    assert b == "stamp-b" and c == "stamp-c"
    assert calls == ["a", "b", "c"]  # the second docs call never ran


def test_ivf_compaction_bit_equal_to_batch_build(spark, tmp_path):
    """compact_ivf_index over two bootstrap-quantized generations is
    BIT-EQUAL to one fresh write_ivf_index over the union — same rows
    (vec_id, embedding, norm, centroid_id), same centroid sidecar, and
    identical probe results — because the re-derived first-n quantizer
    is deterministic.  Also pins that the pre-compaction segmented
    index really did use the DIFFERENT bootstrap quantizer (otherwise
    the test proves nothing about re-derivation)."""
    from trimet_bytes__data_engineering_project_spark.operators.ann_index import (
        _centroids_path,
        compact_ivf_index,
        ivf_index_probe,
        land_ivf_batch,
        write_ivf_index,
    )
    from trimet_bytes__data_engineering_project_spark.operators.similarity import (
        as_double_vec,
    )
    from pyspark.sql import functions as F

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    seg, comp, fresh = (str(tmp_path / d) for d in ("seg", "comp", "fresh"))

    gen0 = emb.filter(F.col("vec_id") % 2 == 0)
    boot = (
        gen0.orderBy("vec_id")
        .limit(16)
        .select(
            F.col("vec_id").alias("centroid_id"),
            as_double_vec("embedding").alias("cvec"),
        )
    )
    boot.write.parquet(_centroids_path(seg))
    land_ivf_batch(gen0, boot, seg, 0)
    land_ivf_batch(emb.filter(F.col("vec_id") % 2 == 1), boot, seg, 1)
    compact_ivf_index(spark, seg, comp, n_centroids=16)
    write_ivf_index(emb, fresh, n_centroids=16)

    def table(path):
        return sorted(
            (r.vec_id, tuple(r.embedding), r.norm, r.centroid_id)
            for r in spark.read.parquet(path).collect()
        )

    assert table(comp) == table(fresh) and len(table(comp)) == emb.count()
    cc = sorted(map(tuple, spark.read.parquet(_centroids_path(comp)).collect()))
    fc = sorted(map(tuple, spark.read.parquet(_centroids_path(fresh)).collect()))
    assert cc == fc
    # the bootstrap quantizer was genuinely different (even ids only)
    assert {r.centroid_id for r in boot.collect()} != {r[0] for r in cc}

    qv = [float(x) for x in emb.filter("vec_id = 0").first()["embedding"]]
    got = [tuple(r) for r in ivf_index_probe(spark, comp, qv, k=5).collect()]
    want = [tuple(r) for r in ivf_index_probe(spark, fresh, qv, k=5).collect()]
    assert got == want and len(got) == 5


def test_lsh_compaction_bit_equal_to_batch_build(spark, tmp_path):
    """compact_lsh_index over two 4-plane generations re-signatured at
    5 planes is BIT-EQUAL to a fresh 5-plane batch build over the
    union (hyperplanes are a deterministic function of (n_planes,
    dim)); probes at the new plane count agree; and the auto-sizing
    rule max(4, lg(n/125)) picks a growing plane count."""
    from pyspark.sql import functions as F

    from trimet_bytes__data_engineering_project_spark.operators.ann_index import (
        compact_lsh_index,
        lsh_index_probe,
        write_lsh_index,
    )
    from trimet_bytes__data_engineering_project_spark.operators.similarity import (
        as_double_vec,
        hyperplanes,
        l2_norm,
        lsh_bucket,
    )

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    dim = len(emb.first()["embedding"])
    seg, comp, fresh = (str(tmp_path / d) for d in ("seg", "comp", "fresh"))

    planes4 = hyperplanes(4, dim)
    for gen, par in ((0, 0), (1, 1)):
        v = as_double_vec("embedding")
        (
            emb.filter(F.col("vec_id") % 2 == par)
            .withColumn("bucket", lsh_bucket(v, planes4))
            .withColumn("norm", l2_norm(v))
            .repartition(F.col("bucket"))
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(f"{seg}/batch_id={gen}")
        )
    compact_lsh_index(spark, seg, comp, dim, n_planes=5)
    write_lsh_index(emb, fresh, dim, n_planes=5)

    def table(path):
        return sorted(
            (r.vec_id, tuple(r.embedding), r.norm, r.bucket)
            for r in spark.read.parquet(path).collect()
        )

    assert table(comp) == table(fresh) and len(table(comp)) == emb.count()
    qv = [float(x) for x in emb.filter("vec_id = 0").first()["embedding"]]
    got = [tuple(r) for r in lsh_index_probe(spark, comp, qv, k=5, n_planes=5).collect()]
    want = [tuple(r) for r in lsh_index_probe(spark, fresh, qv, k=5, n_planes=5).collect()]
    assert got == want and len(got) == 5

    # auto-sizing: n=1000 -> lg(8) = 3 -> floor stays at the 4 min;
    # n=128_000 -> lg(1024) = 10
    import math
    for n, expect in ((1000, 4), (128_000, 10)):
        np = max(4, int(math.log2(max(1, n // 125))) if n >= 250 else 4)
        assert np == expect
