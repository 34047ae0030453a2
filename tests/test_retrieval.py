"""BM25 retrieval tier (operators/retrieval.py): hand-built pins, a
Python-model hypothesis property over the full fixed-point scoring
chain, the empty-base / OOV edge cases from day one (the round-5
lesson), the serve==in-flight bit-equality pin, and the partition-
pruning plan pin for the persisted inverted index."""

from __future__ import annotations

import re
from collections import Counter

import pytest
from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from trimet_bytes__data_engineering_project_spark.operators.retrieval import (
    Q_AVGDL,
    materialize_queries,
    S1_IDF,
    S2_SATUR,
    bm25_serve,
    bm25_topk,
    retrieval_decontaminate,
    top_terms_queries,
    write_inverted_index,
)

SETTINGS = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

words = st.text(alphabet="abcd", min_size=1, max_size=3)
texts = st.lists(words, min_size=0, max_size=12).map(" ".join)


def bm25_model(doc_texts: dict[int, str], queries: dict[int, set[str]], k: int = 5):
    """Independent pure-Python recomputation of the module's fixed-point
    BM25 (same integer floor divisions, same constants) — the property
    oracle.  Returns {(query_id, doc_id): (score_fp, rank)}."""
    tf = {d: Counter(re.findall("[a-z]+", t.lower())) for d, t in doc_texts.items()}
    tf = {d: c for d, c in tf.items() if c}  # zero-token docs unretrievable
    dl = {d: sum(c.values()) for d, c in tf.items()}
    n, total = len(dl), sum(dl.values())
    if n == 0:
        return {}
    avgdl_fp = (total * Q_AVGDL) // n
    df: Counter = Counter()
    for c in tf.values():
        for t in c:
            df[t] += 1
    out = {}
    for qid, terms in queries.items():
        scores = {}
        for d, c in tf.items():
            s, hit = 0, False
            for t in terms:
                if t in c:
                    hit = True
                    idf = (S1_IDF * (2 * n - 2 * df[t] + 1)) // (2 * df[t] + 1)
                    sat = (S2_SATUR * 22 * c[t] * avgdl_fp) // (
                        10 * c[t] * avgdl_fp + 3 * avgdl_fp + 9 * dl[d] * Q_AVGDL
                    )
                    s += idf * sat
            if hit:
                scores[d] = s
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        for r, (d, s) in enumerate(ranked):
            out[(qid, d)] = (s, r + 1)
    return out


def _queries_df(spark, queries: dict[int, set[str]]):
    rows = [(q, t) for q, ts in queries.items() for t in sorted(ts)]
    return spark.createDataFrame(rows or [(0, "zzz")], ["query_id", "term"]).filter(
        F.lit(bool(rows))
    )


def _docs_df(spark, doc_texts: dict[int, str]):
    return spark.createDataFrame(
        [(d, t) for d, t in doc_texts.items()], ["doc_id", "text"]
    )


def test_bm25_hand_pin(spark):
    """Every fixed-point stage checked by hand on a 3-doc corpus.

    corpus: d0='a a b', d1='a c', d2='b b b c'  -> N=3, L=9,
    avgdl_fp=(9*1024)//3=3072.  df: a=2, b=2, c=2.
    query q0 = {a, b}.

    idf (df=2): (1024*(6-4+1))//5 = 3072//5 = 614.
    satur(tf,dl): (1024*22*tf*3072) // (10*tf*3072 + 3*3072 + 9*dl*1024)
      d0 a: tf=2,dl=3 -> 138412032 // (61440+9216+27648)=98304 -> 1408
      d0 b: tf=1,dl=3 -> 69206016 // (30720+9216+27648)=67584  -> 1024
      d1 a: tf=1,dl=2 -> 69206016 // (30720+9216+18432)=58368  -> 1185
      d2 b: tf=3,dl=4 -> 207618048 // (92160+9216+36864)=138240 -> 1501
    scores: d0=614*(1408+1024)=1493248; d1=614*1185=727590;
            d2=614*1501=921614.  Order: d0, d2, d1."""
    docs = _docs_df(spark, {0: "a a b", 1: "a c", 2: "b b b c"})
    q = _queries_df(spark, {0: {"a", "b"}})
    got = [
        (r.query_id, r.doc_id, r.score_fp, r.rank)
        for r in bm25_topk(docs, q, k=5).orderBy("rank").collect()
    ]
    assert got == [(0, 0, 1493248, 1), (0, 2, 921614, 2), (0, 1, 727590, 3)]


@given(
    st.dictionaries(st.integers(0, 9), texts, max_size=8),
    st.dictionaries(st.integers(0, 3), st.sets(words, min_size=1, max_size=3), max_size=3),
)
@example({}, {0: {"a"}})  # empty corpus: no rows, no division fires
@example({0: "a b", 1: ""}, {0: {"a"}})  # zero-token doc excluded from N/avgdl
@example({0: "a b"}, {0: {"zzz"}})  # all-OOV query: absent from output
@example({0: "a", 1: "a"}, {0: {"a"}})  # score tie: doc_id-asc break
@SETTINGS
def test_bm25_matches_python_model(spark, doc_texts, queries):
    docs = _docs_df(spark, doc_texts) if doc_texts else _docs_df(spark, {0: ""})
    if not doc_texts:
        docs = docs.filter(F.lit(False))
    expected = bm25_model(doc_texts, queries)
    got = {
        (r.query_id, r.doc_id): (r.score_fp, r.rank)
        for r in bm25_topk(docs, _queries_df(spark, queries), k=5).collect()
    }
    assert got == expected


def test_bm25_serve_equals_inflight(spark, tmp_path):
    """The persisted-index serve is bit-equal to in-flight scoring on
    the same corpus — the index changes the cost, never the result
    (the x89/x102 contract)."""
    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    queries = top_terms_queries(docs, F.col("doc_id") % 50 == 0, n_terms=3)
    path = str(tmp_path / "bm25")
    write_inverted_index(docs, path)
    inflight = sorted(map(tuple, bm25_topk(docs, queries, k=5).collect()))
    served = sorted(map(tuple, bm25_serve(spark, queries, path, k=5).collect()))
    assert served == inflight and len(served) > 0
    # index-side query construction selects the identical workload
    from trimet_bytes__data_engineering_project_spark.operators.retrieval import (
        top_terms_from_index,
    )

    q_idx = sorted(
        map(tuple, top_terms_from_index(spark, path, F.col("doc_id") % 50 == 0, 3).collect())
    )
    assert q_idx == sorted(map(tuple, queries.collect()))


def test_bm25_serve_prunes_partitions(spark, tmp_path):
    """The posting scan carries the batch's term buckets as a PARTITION
    filter (pruned directories), not a post-scan predicate."""
    import contextlib
    import io

    docs = _docs_df(
        spark, {i: t for i, t in enumerate(["a b c", "b c d", "c d e", "e f g"] * 3)}
    )
    path = str(tmp_path / "bm25")
    write_inverted_index(docs, path)
    q = _queries_df(spark, {0: {"b"}, 1: {"e"}})
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        bm25_serve(spark, q, path, k=3).explain("formatted")
    plan = buf.getvalue()
    pf = next(ln for ln in plan.splitlines() if "PartitionFilters" in ln)
    assert "term_bucket" in pf and ("IN" in pf or "in(" in pf.lower())


def test_decontamination_flags_planted_copy(spark):
    """A training doc that verbatim-copies a benchmark doc's text is
    retrieved at rank 1 by that benchmark's query (self-evidently the
    best lexical match); unrelated-vocabulary docs are not flagged."""
    doc_texts = {
        0: "quark lepton boson hadron",  # benchmark (id < 2)
        1: "sonnet stanza meter rhyme",  # benchmark
        2: "quark lepton boson hadron",  # planted copy of 0
        3: "gradient descent loss epoch",  # unrelated
        4: "stanza rhyme couplet verse",  # partial overlap with 1
    }
    out = {
        r.doc_id: (r.n_queries, r.best_rank)
        for r in retrieval_decontaminate(
            _docs_df(spark, doc_texts), F.col("doc_id") < 2, n_terms=3, k=2
        ).collect()
    }
    assert out[2] == (1, 1)  # the copy: flagged by exactly its source query, rank 1
    assert 3 not in out  # no shared vocabulary -> never retrieved
    assert out[4][1] == 1  # best (only) match for benchmark 1


def test_top_terms_queries_rare_term_preference(spark):
    """tf/df ranks a doc's unique term above a corpus-wide one; ties
    break by term ascending (total order -> deterministic workload)."""
    docs = _docs_df(spark, {0: "common rare rare", 1: "common x", 2: "common y"})
    got = [
        (r.query_id, r.term)
        for r in top_terms_queries(docs, F.col("doc_id") == 0, n_terms=1).collect()
    ]
    # rare: tf/df = 2/1 = 2.0 beats common: 1/3 -> the single kept term
    assert got == [(0, "rare")]
    # tie case: equal tf/df scores keep the lexicographically first term
    tie_docs = _docs_df(spark, {0: "beta alpha", 1: "gamma"})
    tie = [
        (r.query_id, r.term)
        for r in top_terms_queries(tie_docs, F.col("doc_id") == 0, n_terms=1).collect()
    ]
    assert tie == [(0, "alpha")]


def test_rrf_fuse_hand_pin(spark):
    """Exact fusion arithmetic on hand-built arms (S = lcm(61..65) =
    495,593,280): doc 10 in both arms (rank 1 + rank 2), doc 11 lexical
    only (rank 2), doc 12 dense only (rank 1).
      d10: S//61 + S//62 = 8124480 + 7993440 = 16117920
      d11: S//62 = 7993440;  d12: S//61 = 8124480
    order: d10, d12, d11 (and an exact tie would break by doc_id)."""
    from trimet_bytes__data_engineering_project_spark.operators.retrieval import (
        rrf_fuse,
        rrf_scale,
    )

    assert rrf_scale(5) == 495593280
    # every divisor divides S exactly — the no-floor contract
    assert all(495593280 % (60 + r) == 0 for r in range(1, 6))
    lex = spark.createDataFrame(
        [(0, 10, 1), (0, 11, 2)], ["query_id", "doc_id", "rank"]
    )
    den = spark.createDataFrame(
        [(0, 12, 1), (0, 10, 2)], ["query_id", "doc_id", "rank"]
    )
    got = [
        (r.doc_id, r.rrf_fp, r.n_arms, r.rank)
        for r in rrf_fuse([lex, den], k=5).orderBy("rank").collect()
    ]
    assert got == [(10, 16117920, 2, 1), (12, 8124480, 1, 2), (11, 7993440, 1, 3)]
    # out-of-contract ranks (> k) are filtered, not floored
    junk = spark.createDataFrame([(0, 13, 9)], ["query_id", "doc_id", "rank"])
    assert rrf_fuse([junk], k=5).count() == 0


def test_knn_join_exact_matches_numpy(spark):
    """The exact batch kNN join agrees with a numpy brute force on
    ranks (cosine ties broken by c_id ascending)."""
    import numpy as np

    from trimet_bytes__data_engineering_project_spark.operators.similarity import (
        knn_join_exact,
    )

    rng = np.random.RandomState(7)
    vecs = rng.randn(20, 8).astype("float64")
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(20)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    q = df.filter(F.col("vec_id") < 3)
    got = {
        (r.q_id, r.rn): r.c_id for r in knn_join_exact(q, df, k=4).collect()
    }
    norms = np.linalg.norm(vecs, axis=1)
    cos = (vecs @ vecs.T) / np.outer(norms, norms)
    for qi in range(3):
        order = sorted(range(20), key=lambda c: (-cos[qi, c], c))[:4]
        for rank, c in enumerate(order, 1):
            assert got[(qi, rank)] == c


def test_derived_df_serve_equals_stored(spark, tmp_path):
    """derived_df=True re-derives df from the probed postings and must
    score bit-equally to the build-time stored column on a fresh
    single-generation index (same df values by construction)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    queries = top_terms_queries(docs, F.col("doc_id") % 50 == 0, n_terms=3)
    path = str(tmp_path / "bm25")
    write_inverted_index(docs, path)
    stored = sorted(map(tuple, bm25_serve(spark, queries, path, k=5).collect()))
    derived = sorted(
        map(tuple, bm25_serve(spark, queries, path, k=5, derived_df=True).collect())
    )
    assert derived == stored and len(derived) > 0


def test_streaming_inverted_index_equals_batch(spark, tmp_path):
    """Streaming inverted-index maintenance (streaming/index.py):
    document batches land per-batch_id; derived-df serving over the
    streamed layout equals in-flight BM25 over the full corpus; a
    restart on the same checkpoint is a no-op; a late landing is
    processed incrementally and serving stays bit-equal."""
    import glob
    import os
    import shutil

    from trimet_bytes__data_engineering_project_spark.streaming.index import (
        run_streaming_inverted_index,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    landing = str(tmp_path / "landing")
    os.makedirs(landing)

    def land_file(df, name):
        t = str(tmp_path / f"w_{name}")
        df.coalesce(1).write.parquet(t)
        shutil.move(glob.glob(f"{t}/part-*.parquet")[0], f"{landing}/{name}.parquet")

    land_file(docs.filter("doc_id % 3 = 0"), "a")
    land_file(docs.filter("doc_id % 3 = 1"), "b")

    idx = str(tmp_path / "stream_idx")
    ck = str(tmp_path / "ck")
    run_streaming_inverted_index(spark, landing, idx, ck)

    part = docs.filter("doc_id % 3 != 2")
    queries = materialize_queries(
        top_terms_queries(part, F.col("doc_id") % 50 == 0, n_terms=3)
    )
    got = sorted(
        map(tuple, bm25_serve(spark, queries, idx, k=5, derived_df=True).collect())
    )
    want = sorted(map(tuple, bm25_topk(part, queries, k=5).collect()))
    assert got == want and len(got) > 0

    # restart, no new input: postings unchanged
    n_before = spark.read.parquet(f"{idx}/postings").count()
    run_streaming_inverted_index(spark, landing, idx, ck)
    assert spark.read.parquet(f"{idx}/postings").count() == n_before

    # late batch: processed incrementally, serving == full-corpus batch
    land_file(docs.filter("doc_id % 3 = 2"), "c")
    run_streaming_inverted_index(spark, landing, idx, ck)
    q_full = materialize_queries(
        top_terms_queries(docs, F.col("doc_id") % 50 == 0, n_terms=3)
    )
    got_full = sorted(
        map(tuple, bm25_serve(spark, q_full, idx, k=5, derived_df=True).collect())
    )
    want_full = sorted(map(tuple, bm25_topk(docs, q_full, k=5).collect()))
    assert got_full == want_full and len(got_full) > 0


def test_phrase_search_hand_pin(spark):
    """Adjacency semantics on a hand corpus: "b c" occurs twice in d0
    ('a b c b c'), once in d1 ('b c d'), zero in d2 ('c b' — reversed
    order must NOT match).  Overlapping runs count per-start: "a a" in
    'a a a' has phrase_tf 2."""
    from trimet_bytes__data_engineering_project_spark.operators.retrieval import (
        phrase_search,
    )

    docs = _docs_df(spark, {0: "a b c b c", 1: "b c d", 2: "c b", 3: "a a a"})
    phrases = spark.createDataFrame([("b c",), ("a a",)], ["phrase"])
    got = {
        (r.phrase, r.doc_id): (r.phrase_tf, r.rank)
        for r in phrase_search(docs, phrases, k=3).collect()
    }
    assert got == {
        ("b c", 0): (2, 1),
        ("b c", 1): (1, 2),
        ("a a", 3): (2, 1),
    }


def test_phrase_serve_from_positional_index(spark, tmp_path):
    """phrase_search over the persisted positional postings returns the
    identical result set as the in-flight form."""
    from trimet_bytes__data_engineering_project_spark.operators.retrieval import (
        phrase_search,
        top_bigram_phrases,
        write_inverted_index,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    phrases = top_bigram_phrases(docs, n_phrases=5)
    path = str(tmp_path / "posidx")
    write_inverted_index(docs, path, store_positions=True)
    postings = spark.read.parquet(f"{path}/postings")
    inflight = sorted(map(tuple, phrase_search(docs, phrases, k=3).collect()))
    served = sorted(
        map(tuple, phrase_search(docs, phrases, k=3, postings=postings).collect())
    )
    assert served == inflight and len(served) > 0


def test_proximity_slop_semantics(spark):
    """slop=3: 'a x x b' matches phrase "a b" (gap 3), 'a x x x b'
    (gap 4) does not; slop=1 reduces to exact adjacency."""
    from trimet_bytes__data_engineering_project_spark.operators.retrieval import (
        phrase_search,
    )

    docs = _docs_df(spark, {0: "a x x b", 1: "a x x x b", 2: "a b"})
    phrases = spark.createDataFrame([("a b",)], ["phrase"])
    prox = {r.doc_id: r.phrase_tf for r in
            phrase_search(docs, phrases, k=5, slop=3).collect()}
    assert prox == {0: 1, 2: 1}  # doc 1's gap of 4 is outside the window
    adj = {r.doc_id: r.phrase_tf for r in
           phrase_search(docs, phrases, k=5, slop=1).collect()}
    assert adj == {2: 1}


def test_collocations_hand_pin(spark):
    """Corpus engineered so 'q z' is a perfect collocation: q and z
    occur ONLY together (5 times), against a 'c c ...' background.
    Tokens: 5x'q z' + 30x'c' -> Nt=40; bigrams: within one doc per
    line...  Use one doc per pair occurrence plus filler docs so the
    counts are hand-checkable: c(q)=c(z)=c(qz)=5, Nb=5 (each 'q z' doc
    contributes exactly 1 bigram), filler docs are single tokens (no
    bigrams).  lift = (5*40*40)/(5*5*5) = 64.0 exactly."""
    from trimet_bytes__data_engineering_project_spark.operators.retrieval import (
        collocations,
    )

    rows = {i: "q z" for i in range(5)}
    rows.update({100 + i: "c" for i in range(30)})
    got = [(r.phrase, r.n, r.lift, r.rank) for r in
           collocations(_docs_df(spark, rows), n_top=5, min_count=5).collect()]
    assert got == [("q z", 5, 64.0, 1)]


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_prf_expansion_hand_pin(spark):
    """Hand-built vocabulary-mismatch corpus: query {q} retrieves doc 1
    (the only 'q' doc); doc 1's dominant distinctive term is 'z'
    (tf 3, df 3 -> weight 3*idf(3)=1314 beats 'a' at 1*idf(4)=113 —
    'a' is in every doc, the idf weighting's point), so the expanded
    query becomes {q, z} and now also retrieves docs 2/3 (z docs the
    original query missed).  The original term is never re-added
    (anti-join)."""
    from trimet_bytes__data_engineering_project_spark.operators.retrieval import (
        prf_expand_queries,
    )

    docs = _docs(
        spark,
        [
            (1, "q z z z a"),
            (2, "z z b a"),
            (3, "z c a"),
            (4, "w w w a"),
        ],
    )
    queries = spark.createDataFrame([(100, "q")], ["query_id", "term"])
    exp = prf_expand_queries(docs, queries, fb_k=1, n_expand=1)
    got = {(r.query_id, r.term) for r in exp.collect()}
    assert got == {(100, "q"), (100, "z")}
    # round 2 with the expanded workload now retrieves the z docs
    hits = {r.doc_id for r in bm25_topk(docs, materialize_queries(exp), k=5).collect()}
    assert {1, 2, 3} <= hits and 4 not in hits


def test_prf_expansion_idf_weighting_rejects_stopword(spark):
    """The naive tf-only weight would elect the stop-word: 's' appears
    twice in the feedback doc and in EVERY doc (df=n=4 -> idf_fp=113,
    weight 2*113=226); 'z' appears once in feedback but in only two
    docs (df=2 -> idf_fp=1024, weight 1024).  idf-weighted Rocchio
    picks 'z' — the 100 TB skew guard, pinned small."""
    from trimet_bytes__data_engineering_project_spark.operators.retrieval import (
        prf_expand_queries,
    )

    docs = _docs(
        spark,
        [
            (1, "q s s z"),
            (2, "s z b"),
            (3, "s c d"),
            (4, "s e f"),
        ],
    )
    queries = spark.createDataFrame([(7, "q")], ["query_id", "term"])
    exp = {(r.query_id, r.term) for r in
           prf_expand_queries(docs, queries, fb_k=1, n_expand=1).collect()}
    assert exp == {(7, "q"), (7, "z")}


def test_prf_index_df_stats_matches_inflight(spark, tmp_path):
    """The index-backed df lookup (denormalized postings column + the
    stats sidecar) yields the same expansion as the in-flight
    derivation — the serve path never touches the corpus for df."""
    from trimet_bytes__data_engineering_project_spark.operators.retrieval import (
        index_df_stats,
        prf_expand_queries,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").filter(
        "doc_id < 300"
    )
    path = str(tmp_path / "idx")
    write_inverted_index(docs, path)
    queries = materialize_queries(
        top_terms_queries(docs, F.col("doc_id") % 60 == 0, n_terms=3)
    )
    infl = {(r.query_id, r.term) for r in
            prf_expand_queries(docs, queries, fb_k=3, n_expand=2).collect()}
    served = {(r.query_id, r.term) for r in
              prf_expand_queries(
                  docs, queries, fb_k=3, n_expand=2,
                  df_stats=index_df_stats(spark, path),
              ).collect()}
    assert infl == served and len(infl) > 0


def test_prf_expansion_tie_and_anti_join(spark):
    """Two feedback terms with equal summed tf break by term ascending;
    a term present in the ORIGINAL query never re-enters even when it
    dominates the feedback docs."""
    from trimet_bytes__data_engineering_project_spark.operators.retrieval import (
        prf_expand_queries,
    )

    docs = _docs(
        spark,
        [
            (1, "q q q m n"),  # feedback doc: m and n tie at tf 1; q dominates
            (2, "m x"),
            (3, "n y"),
        ],
    )
    queries = spark.createDataFrame([(7, "q")], ["query_id", "term"])
    exp = {(r.query_id, r.term) for r in
           prf_expand_queries(docs, queries, fb_k=1, n_expand=1).collect()}
    assert exp == {(7, "q"), (7, "m")}  # m < n on the tie; q not duplicated


def test_prf_expansion_no_hits_keeps_original(spark):
    """A query whose terms miss the corpus entirely has no feedback
    docs — the expanded workload is exactly the original workload
    (no NULL rows, no dropped queries)."""
    from trimet_bytes__data_engineering_project_spark.operators.retrieval import (
        prf_expand_queries,
    )

    docs = _docs(spark, [(1, "a b"), (2, "c d")])
    queries = spark.createDataFrame([(5, "zzz")], ["query_id", "term"])
    exp = [(r.query_id, r.term) for r in
           prf_expand_queries(docs, queries, fb_k=2, n_expand=2).collect()]
    assert exp == [(5, "zzz")]


def test_compaction_equals_batch_build(spark, tmp_path):
    """Segmented landings (disjoint generations) + compaction serve
    BIT-EQUAL to a from-scratch batch build on the stored-df fast
    path, and the compacted postings carry the true global df."""
    from trimet_bytes__data_engineering_project_spark.operators.retrieval import (
        compact_inverted_index,
        land_inverted_batch,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    seg, comp, full = str(tmp_path / "seg"), str(tmp_path / "comp"), str(tmp_path / "full")
    land_inverted_batch(docs.filter("doc_id < 250"), seg, 0)
    land_inverted_batch(docs.filter("doc_id >= 250"), seg, 1)
    compact_inverted_index(spark, seg, comp)
    write_inverted_index(docs, full)

    queries = materialize_queries(
        top_terms_queries(docs, F.col("doc_id") % 100 == 0, n_terms=3)
    )
    got = [tuple(r) for r in bm25_serve(spark, queries, comp, k=5).collect()]
    want = [tuple(r) for r in bm25_serve(spark, queries, full, k=5).collect()]
    assert got == want and len(got) > 0

    # stored df is the global document frequency, not a per-segment one
    import os
    cdf = {
        (r.term, r.doc_id): r.df
        for r in spark.read.parquet(os.path.join(comp, "postings")).collect()
    }
    fdf = {
        (r.term, r.doc_id): r.df
        for r in spark.read.parquet(os.path.join(full, "postings")).collect()
    }
    assert cdf == fdf


def test_compaction_rebuckets(spark, tmp_path):
    """Compaction re-derives the bucket map from terms, so the
    compacted index may carry a DIFFERENT n_buckets than its source —
    results unchanged when the serve passes the matching count."""
    from trimet_bytes__data_engineering_project_spark.operators.retrieval import (
        compact_inverted_index,
        land_inverted_batch,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").filter(
        "doc_id < 200"
    )
    seg, comp = str(tmp_path / "seg"), str(tmp_path / "comp")
    land_inverted_batch(docs, seg, 0, n_buckets=8)
    compact_inverted_index(spark, seg, comp, n_buckets=16)

    queries = materialize_queries(
        top_terms_queries(docs, F.col("doc_id") % 50 == 0, n_terms=2)
    )
    got = [tuple(r) for r in
           bm25_serve(spark, queries, comp, k=3, n_buckets=16).collect()]
    want = [tuple(r) for r in bm25_topk(docs, queries, k=3).collect()]
    assert got == want and len(got) > 0


def test_snippet_hand_pin(spark):
    """doc: 'a b a c a x x x x x b', query {a,b} -> matched positions
    {0,1,2,4,10}; width=4 windows score 3,3,2,1,1 -> best start 0
    (ties break earliest)."""
    from trimet_bytes__data_engineering_project_spark.operators.retrieval import (
        best_window_snippets,
    )

    docs = spark.createDataFrame(
        [(1, "a b a c a x x x x x b"), (2, "no terms here")], ["doc_id", "text"]
    )
    queries = spark.createDataFrame(
        [(9, "a"), (9, "b")], ["query_id", "term"]
    )
    hits = spark.createDataFrame([(9, 1), (9, 2)], ["query_id", "doc_id"])
    got = [tuple(r) for r in best_window_snippets(docs, queries, hits, width=4).collect()]
    # doc 2 has no matched term -> no row; doc 1 pins (start 0, 3 hits)
    assert got == [(9, 1, 0, 3)]


def test_snippet_window_width_one(spark):
    """width=1 degenerates to 'any single match': n_hits 1, earliest
    matched position wins."""
    from trimet_bytes__data_engineering_project_spark.operators.retrieval import (
        best_window_snippets,
    )

    docs = spark.createDataFrame([(1, "x y z q z")], ["doc_id", "text"])
    queries = spark.createDataFrame([(5, "z")], ["query_id", "term"])
    hits = spark.createDataFrame([(5, 1)], ["query_id", "doc_id"])
    got = [tuple(r) for r in best_window_snippets(docs, queries, hits, width=1).collect()]
    assert got == [(5, 1, 2, 1)]


def test_diversified_topk_cap_binds(spark):
    """Three same-group docs outscore the rest; cap=1 keeps only the
    best of them, promoting the next group's doc — and a doc missing
    from the group map forms its own singleton group."""
    from trimet_bytes__data_engineering_project_spark.operators.retrieval import (
        diversified_topk,
    )

    scored = spark.createDataFrame(
        [(1, 10, 100), (1, 11, 90), (1, 12, 80), (1, 20, 70), (1, 30, 60)],
        ["query_id", "doc_id", "score_fp"],
    )
    groups = spark.createDataFrame(
        [(10, "a"), (11, "a"), (12, "a"), (20, "b")], ["doc_id", "grp"]
    )  # doc 30 unmapped -> singleton
    got = [(r.doc_id, r.grp, r.rank) for r in
           diversified_topk(scored, groups, k=3, cap=1).collect()]
    assert got == [(10, "a", 1), (20, "b", 2), (30, "30", 3)]


def test_diversified_topk_cap_two(spark):
    """cap=2 keeps the two best per group; ranks re-number densely
    over the survivors by (score desc, doc asc)."""
    from trimet_bytes__data_engineering_project_spark.operators.retrieval import (
        diversified_topk,
    )

    scored = spark.createDataFrame(
        [(1, 10, 100), (1, 11, 90), (1, 12, 80), (1, 20, 70)],
        ["query_id", "doc_id", "score_fp"],
    )
    groups = spark.createDataFrame(
        [(10, "a"), (11, "a"), (12, "a"), (20, "b")], ["doc_id", "grp"]
    )
    got = [(r.doc_id, r.rank) for r in
           diversified_topk(scored, groups, k=4, cap=2).collect()]
    assert got == [(10, 1), (11, 2), (20, 3)]  # doc 12 capped out


def test_bm25f_title_occurrence_outranks_body(spark):
    """Equal raw tf, equal length — the doc carrying the term in its
    TITLE (first title_len tokens) outscores the body-only doc, which
    is the observable BM25F behavior."""
    from trimet_bytes__data_engineering_project_spark.operators.retrieval import (
        bm25f_topk,
    )

    docs = _docs(spark, [(1, "z a b c"), (2, "a b z c")])
    queries = spark.createDataFrame([(9, "z")], ["query_id", "term"])
    got = [(r.doc_id, r.rank) for r in
           bm25f_topk(docs, queries, k=2, title_len=2).collect()]
    assert got == [(1, 1), (2, 2)]


def test_bm25f_unit_weights_equal_bm25(spark):
    """w_title = w_body = 1 degenerates BM25F to plain BM25 exactly
    (wtf = tf, wdl = dl — bit-equal fixed-point scores)."""
    from trimet_bytes__data_engineering_project_spark.operators.retrieval import (
        bm25f_topk,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").filter(
        "doc_id < 200"
    )
    queries = materialize_queries(
        top_terms_queries(docs, F.col("doc_id") % 50 == 0, n_terms=3)
    )
    got = [tuple(r) for r in
           bm25f_topk(docs, queries, k=5, w_title=1, w_body=1).collect()]
    want = [tuple(r) for r in bm25_topk(docs, queries, k=5).collect()]
    assert got == want and len(got) > 0


def test_streaming_bm25_serve_equals_query_time(spark, tmp_path):
    """Streaming lexical serving: micro-batches of (query_id, term)
    workloads probe the persisted inverted index through bm25_serve
    and land per-batch_id top-k pinned IDENTICAL to the query-time
    serve over the union workload."""
    import glob
    import os
    import shutil

    from trimet_bytes__data_engineering_project_spark.streaming.index import (
        run_streaming_bm25_serve,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    idx = str(tmp_path / "idx")
    write_inverted_index(docs, idx)
    queries = materialize_queries(
        top_terms_queries(docs, F.col("doc_id") % 50 == 0, n_terms=3)
    )

    landing = str(tmp_path / "qs")
    os.makedirs(landing)
    for name, flt in (("a", "query_id % 100 = 0"), ("b", "query_id % 100 = 50")):
        t = str(tmp_path / f"w_{name}")
        queries.filter(flt).coalesce(1).write.parquet(t)
        shutil.move(glob.glob(f"{t}/part-*.parquet")[0], f"{landing}/{name}.parquet")

    results = str(tmp_path / "res")
    run_streaming_bm25_serve(spark, landing, idx, results, str(tmp_path / "ck"), k=5)

    got = sorted(
        tuple(r)
        for r in spark.read.parquet(results)
        .select("query_id", "doc_id", "score_fp", "rank", "score")
        .collect()
    )
    want = sorted(tuple(r) for r in bm25_serve(spark, queries, idx, k=5).collect())
    assert got == want and len(got) > 0


def test_forward_index_fetch_matches_tokenization(spark, tmp_path):
    """Pruned forward fetch returns exactly the fetched docs' (term,
    tf) rows — bit-equal to re-tokenizing those docs — and never rows
    for unfetched ids."""
    from trimet_bytes__data_engineering_project_spark.operators.retrieval import (
        doc_term_freqs,
        fetch_doc_terms,
        write_forward_index,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").filter(
        "doc_id < 300"
    )
    path = str(tmp_path / "fwd")
    write_forward_index(docs, path)
    ids = docs.filter("doc_id % 37 = 0").select("doc_id")
    got = {
        (r.doc_id, r.term): r.tf
        for r in fetch_doc_terms(spark, path, ids).collect()
    }
    fetched_docs = docs.filter("doc_id % 37 = 0")
    want = {
        (r.doc_id, r.term): r.tf for r in doc_term_freqs(fetched_docs).collect()
    }
    assert got == want and len(got) > 0
    assert {d for d, _ in got} == {r.doc_id for r in ids.collect()}


def test_prf_forward_fetch_bit_equal(spark, tmp_path):
    """prf_expand_queries through a forward-index fetch_tf produces the
    IDENTICAL expanded workload as the default corpus semi-join path
    (the shared-tokenization contract)."""
    from trimet_bytes__data_engineering_project_spark.operators.retrieval import (
        fetch_doc_terms,
        materialize_queries,
        prf_expand_queries,
        top_terms_queries,
        write_forward_index,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").filter(
        "doc_id < 400"
    )
    path = str(tmp_path / "fwd")
    write_forward_index(docs, path)
    queries = materialize_queries(
        top_terms_queries(docs, F.col("doc_id") % 100 == 0, n_terms=3)
    )
    base = {
        (r.query_id, r.term)
        for r in prf_expand_queries(docs, queries, fb_k=3, n_expand=2).collect()
    }
    via_fwd = {
        (r.query_id, r.term)
        for r in prf_expand_queries(
            docs, queries, fb_k=3, n_expand=2,
            fetch_tf=lambda ids: fetch_doc_terms(spark, path, ids),
        ).collect()
    }
    assert via_fwd == base and len(base) > 0


def test_streaming_forward_index_serves_fetch(spark, tmp_path):
    """Per-batch forward landings serve fetch_doc_terms identically to
    a batch build over the union (no degraded mode — nothing global to
    stale); a restart on the same checkpoint is a no-op; a late
    landing extends the fetchable set."""
    import glob
    import os
    import shutil

    from trimet_bytes__data_engineering_project_spark.operators.retrieval import (
        doc_term_freqs,
        fetch_doc_terms,
    )
    from trimet_bytes__data_engineering_project_spark.streaming.index import (
        run_streaming_forward_index,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").filter(
        "doc_id < 600"
    )
    landing = str(tmp_path / "landing")
    os.makedirs(landing)

    def land_file(df, name):
        t = str(tmp_path / f"w_{name}")
        df.coalesce(1).write.parquet(t)
        shutil.move(glob.glob(f"{t}/part-*.parquet")[0], f"{landing}/{name}.parquet")

    land_file(docs.filter("doc_id % 2 = 0"), "a")
    idx = str(tmp_path / "fwd_idx")
    ck = str(tmp_path / "ck")
    run_streaming_forward_index(spark, landing, idx, ck)

    ids = docs.filter("doc_id % 74 = 0").select("doc_id")
    got = {
        (r.doc_id, r.term): r.tf
        for r in fetch_doc_terms(spark, idx, ids).collect()
    }
    want = {
        (r.doc_id, r.term): r.tf
        for r in doc_term_freqs(docs.filter("doc_id % 74 = 0")).collect()
    }
    assert got == want and len(got) > 0

    # restart: no-op
    n_before = spark.read.parquet(f"{idx}/forward").count()
    run_streaming_forward_index(spark, landing, idx, ck)
    assert spark.read.parquet(f"{idx}/forward").count() == n_before

    # late odd-ids landing: fetch now covers them too
    land_file(docs.filter("doc_id % 2 = 1"), "b")
    run_streaming_forward_index(spark, landing, idx, ck)
    ids2 = docs.filter("doc_id % 37 = 0").select("doc_id")
    got2 = {
        (r.doc_id, r.term): r.tf
        for r in fetch_doc_terms(spark, idx, ids2).collect()
    }
    want2 = {
        (r.doc_id, r.term): r.tf
        for r in doc_term_freqs(docs.filter("doc_id % 37 = 0")).collect()
    }
    assert got2 == want2 and len(got2) > len(got) // 2


def test_retrieval_metrics_hand_pin(spark):
    """Query 1: first hit at rank 2 (rr=30/60), 1 of 2 judged found.
    Query 2: judged doc at rank 6 -> beyond k, contributes 0 but is
    NOT dropped.  Query 3: unjudged run rows ignored entirely."""
    from trimet_bytes__data_engineering_project_spark.operators.retrieval import (
        retrieval_metrics,
    )

    run = spark.createDataFrame(
        [(1, 10, 1), (1, 20, 2), (1, 30, 3), (2, 40, 6), (3, 50, 1)],
        "query_id long, doc_id long, rank int",
    )
    qrels = spark.createDataFrame(
        [(1, 20), (1, 99), (2, 40)], "query_id long, doc_id long"
    )
    r = retrieval_metrics(run, qrels, k=5).collect()[0]
    assert (r.n_queries, r.n_rel, r.n_found, r.sum_rr_fp) == (2, 3, 1, 30)
    assert r.recall_at_k == 1 / 3 and r.mrr == 30 / 120


def test_x137_served_equals_inflight(spark):
    """The registered x137 (MRR/recall served off the standing x102
    inverted index) is BIT-EQUAL to the in-flight form (tokenize +
    bm25_topk) — the serve path changes the cost, never the metrics
    (the r7-verdict re-registration keeps the in-flight twin pinned
    here)."""
    from pyspark.sql import functions as F

    from trimet_bytes__data_engineering_project_spark.operators.retrieval import (
        bm25_topk,
        materialize_queries,
        retrieval_metrics,
        top_terms_queries,
    )
    from trimet_bytes__data_engineering_project_spark.plans import QUERIES

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    queries = materialize_queries(
        top_terms_queries(docs, F.col("doc_id") % 50 == 0, n_terms=3)
    )
    run = bm25_topk(docs, queries, k=5).select("query_id", "doc_id", "rank")
    qrels = queries.select("query_id", F.col("query_id").alias("doc_id")).distinct()
    want = [tuple(r) for r in retrieval_metrics(run, qrels, k=5).collect()]
    got = [tuple(r) for r in QUERIES["x137_retrieval_mrr"](spark, sf).collect()]
    assert got == want


def test_passage_pooling_matches_bruteforce(spark, tmp_path):
    """x178/x181's max-passage pooling pinned against a pure-Python
    model on a hand-sized corpus: chunking → passage BM25 (the chain's
    own integer arithmetic via bm25_topk) → per-doc max-pool with
    ties to the lowest chunk — and the SERVED form (persisted passage
    index) is bit-equal to the in-flight form."""
    from trimet_bytes__data_engineering_project_spark.operators.retrieval import (
        bm25_serve,
        bm25_topk,
        materialize_queries,
        top_terms_queries,
        write_inverted_index,
    )
    from trimet_bytes__data_engineering_project_spark.operators.textstats import (
        chunk_documents,
    )
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    # docs long enough to chunk into several overlapping windows; doc 0
    # repeats its key term in ONE late window so max-pool must pick a
    # non-zero chunk
    texts = {
        0: ("alpha beta gamma " * 12) + ("zeta zeta zeta " * 14),
        1: ("zeta epsilon delta " * 20),
        2: ("omega psi chi " * 25),
        50: ("zeta omega alpha " * 18),  # query doc (id % 50 == 0)
    }
    docs = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    queries = materialize_queries(
        top_terms_queries(docs, F.col("doc_id") % 50 == 0, n_terms=3)
    )
    passages = chunk_documents(docs, size=200, stride=150).select(
        (F.col("doc_id") * F.lit(1048576) + F.col("chunk_idx"))
        .cast("long")
        .alias("passage_id"),
        F.col("chunk_text").alias("text"),
    )

    def pool(hits):
        parts = hits.select(
            "query_id",
            F.expr("doc_id DIV 1048576").cast("long").alias("src_doc"),
            (F.col("doc_id") % 1048576).cast("long").alias("chunk_idx"),
            "score_fp",
        )
        g = parts.groupBy("query_id", "src_doc").agg(
            F.max("score_fp").alias("best_fp"),
            F.expr("max_by(chunk_idx, struct(score_fp, -chunk_idx))").alias(
                "best_chunk"
            ),
        )
        w = W.partitionBy("query_id").orderBy(F.desc("best_fp"), F.asc("src_doc"))
        return (
            g.withColumn("rank", F.row_number().over(w))
            .filter("rank <= 5")
            .select("query_id", "src_doc", "best_fp", "best_chunk", "rank")
        )

    inflight = bm25_topk(passages, queries, k=50, id_col="passage_id", text_col="text")
    got = sorted(map(tuple, pool(inflight).collect()))

    # pure-Python model of the pooling over the Spark-scored passages
    rows = [tuple(r) for r in inflight.collect()]
    by_q = {}
    for qid, pid, fp, _rank, _s in rows:
        doc, chunk = pid // 1048576, pid % 1048576
        cur = by_q.setdefault(qid, {}).get(doc)
        if cur is None or (fp, -chunk) > (cur[0], -cur[1]):
            by_q[qid][doc] = (fp, chunk)
    want = []
    for qid, docs_d in by_q.items():
        ranked = sorted(docs_d.items(), key=lambda kv: (-kv[1][0], kv[0]))[:5]
        for rk, (doc, (fp, chunk)) in enumerate(ranked, 1):
            want.append((qid, doc, fp, chunk, rk))
    assert got == sorted(want) and len(got) > 0
    # the max-pool must have selected a non-zero chunk somewhere
    assert any(r[3] > 0 for r in got)

    # served form bit-equal
    ppath = str(tmp_path / "pidx")
    write_inverted_index(passages, ppath, id_col="passage_id", text_col="text")
    served = bm25_serve(spark, queries, ppath, k=50)
    assert sorted(map(tuple, pool(served).collect())) == got


def test_passage_serve_prunes_term_buckets(spark, tmp_path):
    """x181's probe carries the bucket IN-list as a PARTITION filter on
    the passage index — the passage collection inherits the doc-level
    index's pruning contract unchanged."""
    import contextlib
    import io

    from trimet_bytes__data_engineering_project_spark.operators.retrieval import (
        bm25_serve,
        write_inverted_index,
    )
    from trimet_bytes__data_engineering_project_spark.operators.textstats import (
        chunk_documents,
    )
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta " * 15) for i in range(6)],
        "doc_id long, text string",
    )
    passages = chunk_documents(docs, size=200, stride=150).select(
        (F.col("doc_id") * F.lit(1048576) + F.col("chunk_idx"))
        .cast("long")
        .alias("passage_id"),
        F.col("chunk_text").alias("text"),
    )
    path = str(tmp_path / "pidx")
    write_inverted_index(passages, path, id_col="passage_id", text_col="text")
    q = spark.createDataFrame([(0, "alpha"), (0, "gamma")], "query_id long, term string")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        bm25_serve(spark, q, path, k=5).explain("formatted")
    pf = next(
        ln for ln in buf.getvalue().splitlines() if "PartitionFilters" in ln
    )
    assert "term_bucket" in pf and ("IN" in pf or "in(" in pf.lower())
