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
