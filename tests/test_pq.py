"""Product quantization (operators/pq.py): hand-pinned encode/ADC on a
tiny integer corpus, the frozen-codebook append contract, the zero-norm
NULL guard, and the trained (per-subspace kmeans) codebook path."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from trimet_bytes__data_engineering_project_spark.operators.pq import (
    append_pq_codes,
    pq_adc_probe,
    pq_codebook_first_n,
    pq_codebook_kmeans,
    pq_encode,
    write_pq_index,
)


def _emb(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows], ["vec_id", "embedding"]
    )


def test_pq_encode_hand_pin(spark):
    """dim=4, m=2, ks=2.  Codebook (first 2 by id):
      m=0: code0=[1,0] (v0), code1=[0,1] (v1); m=1: code0=[0,2], code1=[2,0].
    v2=[1,1,2,2] encodes: m0 sub=[1,1]: d2 to c0=(0+1)=1, c1=(1+0)=1 ->
    TIE -> code 0; m1 sub=[2,2]: d2 to c0=(4+0)=4, c1=(0+4)=4 -> tie ->
    code 0.  recon = [1,0,0,2], recon_norm = sqrt(1+4)=sqrt(5)."""
    corpus = _emb(
        spark, [(0, [1, 0, 0, 2]), (1, [0, 1, 2, 0]), (2, [1, 1, 2, 2])]
    )
    cb = pq_codebook_first_n(corpus, dim=4, m=2, ks=2)
    enc = {r.vec_id: (list(r.codes), r.recon_norm) for r in
           pq_encode(corpus, cb, dim=4, m=2).collect()}
    assert enc[0] == ([0, 0], pytest.approx(math.sqrt(5), abs=0))
    assert enc[1] == ([1, 1], pytest.approx(math.sqrt(5), abs=0))
    assert enc[2][0] == [0, 0]
    assert enc[2][1] == pytest.approx(math.sqrt(5), abs=0)


def test_pq_adc_probe_hand_pin(spark, tmp_path):
    """ADC score of v0 for query [1,0,0,2] (= v0 itself): raw =
    dot([1,0],[1,0]) + dot([0,2],[0,2]) = 1 + 4 = 5 exactly; cos =
    5 / (sqrt(5)*sqrt(5)) — float sqrt(5)**2 is 5+1ulp, so the
    self-match reads 1.0 only to ~1e-16 (the division is the single
    inexact step; everything upstream is exact on integer floats)."""
    corpus = _emb(
        spark, [(0, [1, 0, 0, 2]), (1, [0, 1, 2, 0]), (2, [1, 1, 2, 2])]
    )
    path = str(tmp_path / "pq")
    write_pq_index(corpus, path, dim=4, m=2, ks=2)
    got = [(r.vec_id, r.cos_approx) for r in
           pq_adc_probe(spark, path, [1.0, 0.0, 0.0, 2.0], k=3, m=2).collect()]
    assert got[0][0] == 0 and got[0][1] == pytest.approx(1.0, rel=1e-12)
    assert [v for v, _ in got] == [0, 2, 1]


def test_pq_append_frozen_codebook(spark, tmp_path):
    """Append encodes against the persisted codebook; when the base
    build already contains the first-ks id range, append-then-probe is
    bit-equal to a single full build."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qv = [float(x) for x in emb.filter("vec_id = 0").first()["embedding"]]
    base, late = emb.filter("vec_id < 300"), emb.filter("vec_id >= 300")

    p_inc = str(tmp_path / "inc")
    write_pq_index(base, p_inc, dim=64)
    append_pq_codes(late, p_inc, dim=64)

    p_full = str(tmp_path / "full")
    write_pq_index(emb, p_full, dim=64)

    inc = [tuple(r) for r in pq_adc_probe(spark, p_inc, qv, k=5).collect()]
    full = [tuple(r) for r in pq_adc_probe(spark, p_full, qv, k=5).collect()]
    assert inc == full and len(inc) == 5


def test_pq_zero_vector_scores_null(spark, tmp_path):
    """A corpus row that encodes to the zero codeword (the codebook's
    code 0 here IS a zero vector) has recon_norm 0 -> NULL score,
    sorted after every real score (the serve NULL-score contract),
    never a fake 0.0 mid-list."""
    corpus = _emb(
        spark,
        [(0, [0, 0, 0, 0]), (1, [1, 1, 1, 1]), (2, [0, 0, 0, 0]), (3, [2, 2, 2, 2])],
    )
    path = str(tmp_path / "pq")
    write_pq_index(corpus, path, dim=4, m=2, ks=2)
    got = [(r.vec_id, r.cos_approx) for r in
           pq_adc_probe(spark, path, [1.0, 1.0, 1.0, 1.0], k=4, m=2).collect()]
    real = [g for g in got if g[1] is not None]
    nulls = [g for g in got if g[1] is None]
    assert {g[0] for g in real} == {1, 3} and {g[0] for g in nulls} == {0, 2}
    assert got[:2] == real  # NULLs sort last


def test_pq_kmeans_codebook_path(spark):
    """The trained per-subspace codebook drives the same encode/ADC
    machinery: codes stay in range, every (vec, m) encodes, and the
    ADC score of a vector equals the exact cosine of its
    RECONSTRUCTION within float tolerance (the different summation
    grouping — per-subspace folds vs one 64-fold — bounds the drift)."""
    import numpy as np

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").filter(
        "vec_id < 120"
    )
    cb = pq_codebook_kmeans(emb, dim=64, m=4, ks=4, n_iter=1)
    rows = cb.collect()
    assert {(r.m, r.code) for r in rows} == {(m, c) for m in range(4) for c in range(4)}
    enc = pq_encode(emb, cb, dim=64, m=4)
    e = enc.collect()
    assert len(e) == 120 and all(len(r.codes) == 4 for r in e)
    # reconstruction-consistency: ADC(q, v) == cos(q, recon(v)) +- eps
    cbm = {(r.m, r.code): np.asarray(r.cvec) for r in rows}
    q = np.asarray(
        [float(x) for x in emb.filter("vec_id = 0").first()["embedding"]]
    )
    first = sorted(e, key=lambda r: r.vec_id)[0]
    recon = np.concatenate([cbm[(m, first.codes[m])] for m in range(4)])
    want = float(q @ recon / (np.linalg.norm(q) * np.linalg.norm(recon)))
    import os

    import tempfile

    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "pq")
        write_pq_index(emb, path, dim=64, m=4, ks=4, codebook=cb)
        got = {
            r.vec_id: r.cos_approx
            for r in pq_adc_probe(spark, path, [float(x) for x in q], k=120, m=4).collect()
        }
    assert got[first.vec_id] == pytest.approx(want, rel=1e-9)


def test_pq_knn_join_agrees_with_single_probes(spark, tmp_path):
    """The batch ADC join is bit-equal to per-query single probes (same
    folds, same codebook — the table side just builds distributed)."""
    from trimet_bytes__data_engineering_project_spark.operators.pq import pq_knn_join

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    path = str(tmp_path / "pq")
    write_pq_index(emb, path, dim=64)
    batch = pq_knn_join(spark, emb.filter("vec_id % 100 = 0"), path, k=4)
    got = {(r.q_id, r.rn): (r.c_id, r.cos_approx) for r in batch.collect()}
    assert len(got) > 0
    for qid in [r.vec_id for r in emb.filter("vec_id % 100 = 0").select("vec_id").collect()]:
        qv = [float(x) for x in emb.filter(f"vec_id = {qid}").first()["embedding"]]
        single = pq_adc_probe(spark, path, qv, k=4).collect()
        for rn, r in enumerate(single, 1):
            assert got[(qid, rn)] == (r.vec_id, r.cos_approx)


def test_streaming_pq_serve_equals_batch(spark, tmp_path):
    """Streaming ADC serving (streaming/index.py:run_streaming_pq_serve)
    lands per-batch_id results identical to the batch pq_knn_join over
    the same queries; a replay on the same checkpoint is a no-op."""
    import glob
    import os
    import shutil

    from trimet_bytes__data_engineering_project_spark.operators.pq import pq_knn_join
    from trimet_bytes__data_engineering_project_spark.streaming.index import (
        run_streaming_pq_serve,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    path = str(tmp_path / "pq")
    write_pq_index(emb, path, dim=64)

    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    q = emb.filter("vec_id % 100 = 0")
    t = str(tmp_path / "w")
    q.coalesce(1).write.parquet(t)
    shutil.move(glob.glob(f"{t}/part-*.parquet")[0], f"{landing}/q.parquet")

    results = str(tmp_path / "results")
    ck = str(tmp_path / "ck")
    run_streaming_pq_serve(spark, landing, path, results, ck, k=4)

    got = sorted(map(tuple, spark.read.parquet(results).drop("batch_id").collect()))
    want = sorted(map(tuple, pq_knn_join(spark, q, path, k=4).collect()))
    assert got == want and len(got) > 0

    n = spark.read.parquet(results).count()
    run_streaming_pq_serve(spark, landing, path, results, ck, k=4)
    assert spark.read.parquet(results).count() == n


def test_ivfpq_probe_prunes_and_composes(spark, tmp_path):
    """The IVFPQ probe (a) carries the probed list as a PARTITION
    filter on the codes scan, and (b) with nprobe = all lists is
    bit-equal to the unpartitioned full-scan ADC probe — the coarse
    stage changes WHICH rows are read, never their scores."""
    import contextlib
    import io

    from trimet_bytes__data_engineering_project_spark.operators.pq import (
        ivfpq_probe,
        write_ivfpq_index,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qv = [float(x) for x in emb.filter("vec_id = 7").first()["embedding"]]
    path = str(tmp_path / "ivfpq")
    write_ivfpq_index(emb, path, dim=64, n_centroids=8)

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        ivfpq_probe(spark, path, qv, k=5, nprobe=1).explain("formatted")
    pf = next(ln for ln in buf.getvalue().splitlines() if "PartitionFilters" in ln)
    assert "centroid_id" in pf

    flat = str(tmp_path / "pq")
    write_pq_index(emb, flat, dim=64)
    all_lists = [tuple(r) for r in ivfpq_probe(spark, path, qv, k=5, nprobe=8).collect()]
    full = [tuple(r) for r in pq_adc_probe(spark, flat, qv, k=5).collect()]
    assert all_lists == full and len(full) == 5


def test_ivfpq_residual_self_reconstruction(spark, tmp_path):
    """A vector whose residual is IN the residual codebook (any of the
    first ks ids) encodes with d2=0 per subspace, so its reconstruction
    is exactly c + (v - c) = v — the ADC self-score reads ~1.0 and it
    tops its own list's probe."""
    from trimet_bytes__data_engineering_project_spark.operators.pq import (
        ivfpq_residual_probe,
        write_ivfpq_residual_index,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qv = [float(x) for x in emb.filter("vec_id = 3").first()["embedding"]]
    path = str(tmp_path / "ivfpq_res")
    write_ivfpq_residual_index(emb, path, dim=64, n_centroids=8)
    got = [(r.vec_id, r.cos_approx) for r in
           ivfpq_residual_probe(spark, path, qv, k=3, nprobe=8).collect()]
    assert got[0][0] == 3 and got[0][1] == pytest.approx(1.0, rel=1e-9)


def test_pq_refine_full_shortlist_equals_exact(spark, tmp_path):
    """With the shortlist as deep as the corpus, the refine stage IS
    exact kNN: pq_refine_knn_join == knn_join_exact bit-for-bit (same
    sequential-fold cosine, same tie order) — the shortlist only
    gates membership, never the rerank arithmetic."""
    from trimet_bytes__data_engineering_project_spark.operators.pq import (
        pq_refine_knn_join,
    )
    from trimet_bytes__data_engineering_project_spark.operators.similarity import (
        knn_join_exact,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").filter(
        "vec_id < 200"
    )
    path = str(tmp_path / "pq")
    write_pq_index(emb, path, dim=64)
    q = emb.filter("vec_id % 40 = 0")
    got = {
        (r.q_id, r.rn): (r.c_id, r.cos_exact)
        for r in pq_refine_knn_join(
            spark, q, emb, path, k=3, k_shortlist=200
        ).collect()
    }
    want = {
        (r.q_id, r.rn): (r.c_id, r.cos_sim)
        for r in knn_join_exact(q, emb, k=3).collect()
    }
    assert got == want and len(got) == 15


def test_pq_refine_result_within_shortlist(spark, tmp_path):
    """With a shallow shortlist the refined top-k is a reranking OF the
    shortlist: every returned candidate appears in the stage-1 ADC
    top-k_shortlist, and the rerank order is the exact cosine order
    within it."""
    from trimet_bytes__data_engineering_project_spark.operators.pq import (
        pq_knn_join,
        pq_refine_knn_join,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    path = str(tmp_path / "pq")
    write_pq_index(emb, path, dim=64)
    q = emb.filter("vec_id % 100 = 0")
    short = {
        (r.q_id, r.c_id)
        for r in pq_knn_join(spark, q, path, k=6).collect()
    }
    ref = pq_refine_knn_join(spark, q, emb, path, k=3, k_shortlist=6).collect()
    assert len(ref) > 0
    for r in ref:
        assert (r.q_id, r.c_id) in short
    # per query, exact scores are non-increasing in rn
    by_q: dict = {}
    for r in ref:
        by_q.setdefault(r.q_id, []).append((r.rn, r.cos_exact))
    for rows in by_q.values():
        rows.sort()
        scores = [s for _, s in rows]
        assert scores == sorted(scores, reverse=True)


def test_pq_refine_zero_norm_scores_null(spark, tmp_path):
    """A zero-vector candidate in the shortlist gets NULL exact cosine
    and ranks after every real score (the serve NULL-score contract,
    refine edition)."""
    from trimet_bytes__data_engineering_project_spark.operators.pq import (
        pq_refine_knn_join,
    )

    corpus = _emb(
        spark,
        [(0, [0, 0, 0, 0]), (1, [1, 1, 1, 1]), (2, [1, 2, 1, 2]), (3, [2, 1, 2, 1])],
    )
    path = str(tmp_path / "pq")
    write_pq_index(corpus, path, dim=4, m=2, ks=2)
    q = _emb(spark, [(9, [1, 1, 1, 1])])
    got = [
        (r.c_id, r.cos_exact)
        for r in pq_refine_knn_join(
            spark, q, corpus, path, k=4, k_shortlist=4
        ).collect()
    ]
    reals = [g for g in got if g[1] is not None]
    assert got[: len(reals)] == reals  # NULL ranks last
    assert got[-1][0] == 0 and got[-1][1] is None


def _py_opq_perm(vecs, dim, m):
    """Independent Python model of opq_dim_permutation (id-ordered
    energy fold + snake allocation)."""
    energy = [0.0] * dim
    for _, v in vecs:
        for i in range(dim):
            energy[i] += v[i] * v[i]
    ranked = sorted(range(dim), key=lambda i: (-energy[i], i))
    subs = [[] for _ in range(m)]
    for r, d in enumerate(ranked):
        rnd, p = divmod(r, m)
        j = p if rnd % 2 == 0 else m - 1 - p
        subs[j].append(d)
    return [d for j in range(m) for d in subs[j]]


def test_opq_permutation_matches_python_model(spark):
    from trimet_bytes__data_engineering_project_spark.operators.pq import (
        opq_dim_permutation,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    got = opq_dim_permutation(emb, dim=64, m=8, sample_n=256)
    rows = sorted(
        [(r.vec_id, [float(x) for x in r.embedding]) for r in
         emb.orderBy("vec_id").limit(256).collect()]
    )
    want = _py_opq_perm(rows, 64, 8)
    assert got == want
    assert sorted(got) == list(range(64))  # a true permutation
    # balanced: each subspace block is exactly dim/m dims
    assert all(len(got[j * 8:(j + 1) * 8]) == 8 for j in range(8))


def test_opq_m1_equals_plain_pq_on_integer_vectors(spark, tmp_path):
    """At m=1 the permutation only reorders dims inside the single
    subspace: with integer-valued vectors every fold is exact, so OPQ
    scores equal plain PQ scores EXACTLY (permutation invariance of
    dot/norm, no rounding to hide behind)."""
    from trimet_bytes__data_engineering_project_spark.operators.pq import (
        opq_adc_probe,
        write_opq_index,
    )

    corpus = _emb(
        spark,
        [(0, [1, 0, 2, 0]), (1, [0, 3, 0, 1]), (2, [2, 2, 1, 1]), (3, [1, 1, 1, 1])],
    )
    q = [1.0, 0.0, 2.0, 0.0]
    p_opq, p_pq = str(tmp_path / "opq"), str(tmp_path / "pq")
    write_opq_index(corpus, p_opq, dim=4, m=1, ks=2, sample_n=4)
    write_pq_index(corpus, p_pq, dim=4, m=1, ks=2)
    got = [(r.vec_id, r.cos_approx) for r in
           opq_adc_probe(spark, p_opq, q, k=4, m=1).collect()]
    want = [(r.vec_id, r.cos_approx) for r in
            pq_adc_probe(spark, p_pq, q, k=4, m=1).collect()]
    assert got == want and len(got) == 4


def test_opq_self_match_scores_one(spark, tmp_path):
    """A codebook member probes itself at cos ~ 1.0 through the
    permuted chain (the x105 self-match pin, OPQ edition)."""
    from trimet_bytes__data_engineering_project_spark.operators.pq import (
        opq_adc_probe,
        write_opq_index,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").filter(
        "vec_id < 200"
    )
    qv = [float(x) for x in emb.filter("vec_id = 0").first()["embedding"]]
    path = str(tmp_path / "opq")
    write_opq_index(emb, path, dim=64)
    got = opq_adc_probe(spark, path, qv, k=1).collect()
    assert got[0].vec_id == 0 and got[0].cos_approx == pytest.approx(1.0, rel=1e-12)


def test_coarse_ranking_guards_zero_norms(spark, tmp_path):
    """The driver-side coarse-centroid cosine mirrors the scan path's
    NULL-score contract instead of dividing by zero: a zero-norm
    centroid ranks LAST (it can still be probed when nprobe covers
    it), and a zero QUERY ranks all centroids as undefined — probed in
    centroid_id order, candidates scoring NULL downstream, no
    ZeroDivisionError anywhere (ADVICE r7: operators/pq.py)."""
    from trimet_bytes__data_engineering_project_spark.operators.pq import (
        _rank_coarse,
        ivfpq_probe,
        write_ivfpq_index,
    )

    cents = [
        {"centroid_id": 0, "cvec": [0.0, 0.0]},  # zero-norm: ranks last
        {"centroid_id": 1, "cvec": [1.0, 0.0]},
        {"centroid_id": 2, "cvec": [0.0, 1.0]},
    ]
    assert _rank_coarse(cents, [1.0, 0.0], 3) == [1, 2, 0]
    # zero query: all undefined -> centroid_id order, nprobe respected
    assert _rank_coarse(cents, [0.0, 0.0], 2) == [0, 1]

    # end-to-end: a zero query against a real index must not raise,
    # and its candidates carry NULL scores (the scan-side contract)
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    path = str(tmp_path / "ivfpq_zero")
    write_ivfpq_index(emb, path, dim=64, n_centroids=8)
    rows = ivfpq_probe(spark, path, [0.0] * 64, k=3, nprobe=1).collect()
    assert len(rows) == 3 and all(r.cos_approx is None for r in rows)
