"""Property-based tests (hypothesis) — operator invariants that hold
for ALL inputs, not just the fixtures: shingle cardinality bounds,
hash-family determinism, salted-agg equivalence, geodesic axioms,
clamp behavior.  One hypothesis example = one multi-row DataFrame, so
each property costs a handful of Spark jobs, not hundreds.
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from trimet_bytes__data_engineering_project_spark.functions.geo import haversine_m
from trimet_bytes__data_engineering_project_spark.operators.dedup import (
    MINHASH_K,
    minhash_estimate,
    minhash_signature,
    shingles,
    simhash,
)
from trimet_bytes__data_engineering_project_spark.operators.skew import salted_agg

SETTINGS = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

words = st.text(alphabet="abcdefg", min_size=1, max_size=6)
docs = st.lists(words, min_size=0, max_size=30).map(" ".join)


@given(st.lists(docs, min_size=1, max_size=20))
@SETTINGS
def test_shingle_count_bounded_by_token_count(spark, texts):
    """|distinct 3-gram shingles| ≤ max(0, n_tokens − 2), and short docs
    yield exactly the empty array (the sequence(1,0) guard)."""
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["doc_id", "text"])
    rows = df.select(
        F.size(F.split(F.lower(F.trim("text")), r"\s+")).alias("n_toks"),
        F.size(shingles(F.col("text"))).alias("n_sh"),
    ).collect()
    for r in rows:
        assert r["n_sh"] <= max(0, r["n_toks"] - 2)
        if r["n_toks"] < 3:
            assert r["n_sh"] == 0


@given(st.lists(docs.filter(lambda t: len(t.split()) >= 3), min_size=1, max_size=10))
@SETTINGS
def test_minhash_identical_docs_estimate_one(spark, texts):
    """sig length = k always; a doc against itself estimates Jaccard 1;
    estimates always land in [0, 1]."""
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["doc_id", "text"])
    sig = minhash_signature(shingles(F.col("text")))
    rows = df.select(
        F.size(sig).alias("klen"),
        minhash_estimate(sig, sig).alias("self_est"),
    ).collect()
    for r in rows:
        assert r["klen"] == MINHASH_K
        assert r["self_est"] == 1.0


@given(st.lists(docs, min_size=2, max_size=10))
@SETTINGS
def test_simhash_deterministic_and_16bit(spark, texts):
    """simhash is a pure function of the token set (same text twice →
    same fingerprint) and stays within its bit budget."""
    pairs = [(i, t) for i, t in enumerate(texts + texts)]
    df = spark.createDataFrame(pairs, ["row_id", "text"])
    rows = df.select("text", simhash(F.col("text")).alias("sh")).collect()
    by_text: dict[str, set[int]] = {}
    for r in rows:
        by_text.setdefault(r["text"], set()).add(r["sh"])
        assert 0 <= r["sh"] < (1 << 16)
    assert all(len(v) == 1 for v in by_text.values())


@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(-1000, 1000)), min_size=1, max_size=50
    )
)
@SETTINGS
def test_salted_agg_equals_plain_for_any_input(spark, rows):
    """salted_agg(count, sum, min, max) == plain groupBy for arbitrary
    (key, value) multisets — including hot keys and negatives."""
    df = spark.createDataFrame(
        [(k, v, i) for i, (k, v) in enumerate(rows)], ["k", "v", "rid"]
    )
    aggs = {
        "n": (F.count("*"), F.sum("n")),
        "s": (F.sum("v"), F.sum("s")),
        "mx": (F.max("v"), F.max("mx")),
        "mn": (F.min("v"), F.min("mn")),
    }
    salted = salted_agg(df, "k", aggs, fine_col="rid", n_salts=4)
    plain = df.groupBy("k").agg(
        F.count("*").alias("n"),
        F.sum("v").alias("s"),
        F.max("v").alias("mx"),
        F.min("v").alias("mn"),
    )
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


coord = st.tuples(
    st.floats(min_value=-85, max_value=85, allow_nan=False),
    st.floats(min_value=-179, max_value=179, allow_nan=False),
)


@given(st.lists(st.tuples(coord, coord), min_size=1, max_size=30))
@SETTINGS
def test_haversine_axioms(spark, point_pairs):
    """d(p,p)=0, d(a,b)=d(b,a) exactly (the formula is symmetric in its
    arguments), 0 ≤ d ≤ πR, and close to the driver-side reference."""
    rows = [
        (i, a[0], a[1], b[0], b[1]) for i, (a, b) in enumerate(point_pairs)
    ]
    df = spark.createDataFrame(rows, ["i", "lat1", "lon1", "lat2", "lon2"])
    got = df.select(
        haversine_m(F.col("lat1"), F.col("lon1"), F.col("lat2"), F.col("lon2")).alias("ab"),
        haversine_m(F.col("lat2"), F.col("lon2"), F.col("lat1"), F.col("lon1")).alias("ba"),
        haversine_m(F.col("lat1"), F.col("lon1"), F.col("lat1"), F.col("lon1")).alias("aa"),
        "lat1", "lon1", "lat2", "lon2",
    ).collect()
    half_circumference = math.pi * 6371000.0
    for r in got:
        assert r["aa"] == 0.0
        assert r["ab"] == r["ba"]
        assert 0.0 <= r["ab"] <= half_circumference * (1 + 1e-9)

        def ref(lat1, lon1, lat2, lon2):
            p1, p2 = math.radians(lat1), math.radians(lat2)
            dp = p2 - p1
            dl = math.radians(lon2) - math.radians(lon1)
            a = math.sin(dp / 2) ** 2 + math.cos(p1) * math.cos(p2) * math.sin(dl / 2) ** 2
            return 2 * 6371000.0 * math.asin(math.sqrt(a))

        assert math.isclose(
            r["ab"], ref(r["lat1"], r["lon1"], r["lat2"], r["lon2"]), rel_tol=1e-9, abs_tol=1e-6
        )


@given(
    st.lists(
        st.lists(st.sampled_from(["dup line", "x", "yy", "zzz", "unique %d"]), min_size=1, max_size=6),
        min_size=1,
        max_size=12,
    )
)
@SETTINGS
def test_dedup_lines_invariants(spark, doc_lines):
    """For ANY corpus: (1) no surviving line occurs >= min_dup times in
    the original corpus, (2) surviving lines keep their original order,
    (3) n_lines_kept counts the reassembled lines."""
    from collections import Counter

    from trimet_bytes__data_engineering_project_spark.operators.dedup import dedup_lines

    texts = [
        "\n".join(ln % i if "%d" in ln else ln for ln in lines)
        for i, lines in enumerate(doc_lines)
    ]
    corpus_counts = Counter(ln for t in texts for ln in t.split("\n"))
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    out = {r["doc_id"]: r for r in dedup_lines(df).collect()}
    for doc_id, r in out.items():
        kept = r["clean_text"].split("\n")
        assert r["n_lines_kept"] == len(kept)
        for ln in kept:
            assert corpus_counts[ln] < 2
        # order: kept must be a subsequence of the original lines
        orig = texts[doc_id].split("\n")
        it = iter(orig)
        assert all(ln in it for ln in kept)


@given(
    st.lists(st.tuples(st.integers(1, 9), st.integers(0, 3)), min_size=1, max_size=25),
    st.integers(1, 60),
)
@SETTINGS
def test_select_token_budget_matches_naive_for_any_input(spark, rows, budget):
    """Two-phase budget selection ≡ the naive global running-sum filter
    for ANY (tokens, score) multiset and ANY budget."""
    from pyspark.sql import Window

    from trimet_bytes__data_engineering_project_spark.operators.sampling import (
        select_token_budget,
    )

    df = spark.createDataFrame(
        [(i, t, s) for i, (t, s) in enumerate(rows)], ["doc_id", "n_tokens", "score"]
    )
    got = {
        (r["doc_id"], r["cum_tokens"])
        for r in select_token_budget(df, "score", "doc_id", "n_tokens", budget).collect()
    }
    w = (
        Window.orderBy(F.desc("score"), "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    naive = {
        (r["doc_id"], r["cum"])
        for r in df.withColumn("cum", F.sum("n_tokens").over(w))
        .filter(F.col("cum") <= budget)
        .collect()
    }
    assert got == naive


@given(
    st.lists(
        st.tuples(st.integers(0, 10**6), st.sampled_from("abcd")),
        min_size=1,
        max_size=30,
        unique_by=lambda t: t[0],
    ),
    st.lists(
        st.tuples(st.integers(0, 10**6), st.sampled_from("abde")),
        min_size=1,
        max_size=30,
        unique_by=lambda t: t[0],
    ),
)
@SETTINGS
def test_mixture_drift_invariants(spark, a_rows, b_rows):
    """For any two snapshots: shares each sum to exactly 1.0 per side
    (counts are exact integers over a common denominator), drift is
    |share_a - share_b| bit-exactly, groups missing from one side show
    count 0, and the group set is the union."""
    from trimet_bytes__data_engineering_project_spark.operators.sampling import (
        mixture_drift,
    )

    a = spark.createDataFrame(a_rows, ["doc_id", "grp"])
    b = spark.createDataFrame(b_rows, ["doc_id", "grp"])
    out = {r["grp"]: r for r in mixture_drift(a, b, "grp").collect()}
    assert set(out) == {g for _, g in a_rows} | {g for _, g in b_rows}
    n_a = sum(r["n_a"] for r in out.values())
    n_b = sum(r["n_b"] for r in out.values())
    assert n_a == len(a_rows) and n_b == len(b_rows)
    assert math.fsum(r["share_a"] for r in out.values()) == 1.0 or n_a == 0
    assert math.fsum(r["share_b"] for r in out.values()) == 1.0 or n_b == 0
    for r in out.values():
        assert r["drift"] == abs(r["share_a"] - r["share_b"])
        assert r["share_a"] == r["n_a"] / n_a
        assert r["share_b"] == r["n_b"] / n_b


@given(
    st.lists(
        st.tuples(st.integers(0, 10**6), st.sampled_from("xy"), st.integers(-1000, 1000)),
        min_size=4,
        max_size=40,
        unique_by=lambda t: t[0],
    )
)
@SETTINGS
def test_quality_distribution_partitions_corpus(spark, rows):
    """Quartile-cell counts always partition the corpus (sum = N, no
    cell negative, quartile ids within 0-3), for any value multiset
    including heavy ties."""
    from trimet_bytes__data_engineering_project_spark.operators.sampling import (
        quality_distribution,
    )

    df = spark.createDataFrame(rows, ["doc_id", "grp", "v"])
    out = quality_distribution(df, "grp", "v").collect()
    assert sum(r["n_docs"] for r in out) == len(rows)
    assert all(0 <= r["quartile"] <= 3 for r in out)
    assert all(r["n_docs"] > 0 for r in out)


@given(st.lists(docs, min_size=1, max_size=20))
@SETTINGS
def test_hashed_linear_score_bounded(spark, texts):
    """Scores are always in [-1, 1] (weights span [-2048, 2047], scale
    2048) and a letterless/empty doc scores exactly 0.0."""
    from trimet_bytes__data_engineering_project_spark.operators.textstats import (
        hashed_linear_score,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)] + [(10**6, ""), (10**6 + 1, "123 !!")],
        ["doc_id", "text"],
    )
    rows = df.select("text", hashed_linear_score(F.col("text")).alias("s")).collect()
    for r in rows:
        assert -1.0 <= r["s"] <= 1.0
        if not any(c.isalpha() for c in r["text"]):
            assert r["s"] == 0.0


@given(
    st.lists(st.text(alphabet="abcdef ", min_size=0, max_size=60), min_size=1, max_size=15),
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=0, max_value=8),
)
@SETTINGS
def test_chunk_documents_reconstructs_text(spark, texts, stride, extra):
    """For ANY text and any 0 < stride <= size: concatenating each
    chunk's first `stride` chars (whole last chunk) reconstructs the
    document exactly; chunk count = ceil(len/stride); empty docs emit
    nothing.  No character can be lost or duplicated between chunks."""
    from trimet_bytes__data_engineering_project_spark.operators.textstats import (
        chunk_documents,
    )

    size = stride + extra
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    out = chunk_documents(df, size=size, stride=stride).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i, t in enumerate(texts):
        chunks = sorted(by_doc.get(i, []), key=lambda r: r["chunk_idx"])
        if len(t) == 0:
            assert chunks == []
            continue
        assert len(chunks) == -(-len(t) // stride)  # ceil
        rebuilt = "".join(
            c["chunk_text"][:stride] for c in chunks[:-1]
        ) + chunks[-1]["chunk_text"]
        assert rebuilt == t
        for c in chunks:
            assert c["chunk_start"] == c["chunk_idx"] * stride
            assert c["chunk_len"] == len(c["chunk_text"]) <= size


@given(st.lists(docs, min_size=1, max_size=15))
@SETTINGS
def test_unigram_surprisal_bounds(spark, texts):
    """Surprisal invariants for any corpus: every per-doc mean lies in
    [1, n_total] (the most common term's ratio is >= 1, the rarest <=
    n_total); n_tokens sums to the corpus [a-z]+ token count; docs
    with no letter tokens are absent."""
    import re

    from trimet_bytes__data_engineering_project_spark.operators.textstats import (
        unigram_surprisal,
    )

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["doc_id", "text"])
    rows = unigram_surprisal(df).collect()
    toks = [re.findall("[a-z]+", t.lower()) for t in texts]
    n_total = sum(len(ts) for ts in toks)
    assert sum(r["n_tokens"] for r in rows) == n_total
    assert {r["doc_id"] for r in rows} == {i for i, ts in enumerate(toks) if ts}
    for r in rows:
        assert 1.0 <= r["avg_surprisal"] <= float(n_total)


@given(
    st.lists(docs.filter(lambda t: len(t.split()) >= 5), min_size=2, max_size=12),
    st.integers(min_value=1, max_value=4),
)
@SETTINGS
def test_bloom_decontaminate_never_misses(spark, texts, k):
    """The Bloom law: for ANY corpus/benchmark split and any k, the
    prefiltered decontamination equals the exact one — a Bloom filter
    has false positives (killed by the confirm join) but never false
    negatives, so no contaminated document can slip through."""
    from trimet_bytes__data_engineering_project_spark.operators.dedup import (
        bloom_decontaminate,
        decontaminate,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    bench = df.filter(F.col("doc_id") == 0)
    corpus = df.filter(F.col("doc_id") > 0)
    a = sorted(r["doc_id"] for r in
               bloom_decontaminate(corpus, bench, n=3, m_bits=256, k=k).collect())
    b = sorted(r["doc_id"] for r in decontaminate(corpus, bench, n=3).collect())
    assert a == b


@given(st.lists(docs, min_size=1, max_size=12), st.integers(1, 2), st.sampled_from([3, 5]))
@SETTINGS
def test_count_min_never_undercounts_any_corpus(spark, texts, hex_digits, depth):
    """CM structural guarantee on ARBITRARY corpora: for every term the
    sketch estimate (min over depth rows of bucket counts) is >= the
    exact count — at any width (16 or 256 buckets, heavy collisions)
    and any depth.  With every term a candidate, the approx result set
    covers exactly the terms the exact path counts."""
    from collections import Counter

    from trimet_bytes__data_engineering_project_spark.operators.textstats import top_terms

    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    big = 1 << 30
    est = {
        r.term: r.n
        for r in top_terms(
            df, k=big, approx=True, depth=depth, hex_digits=hex_digits, candidate_hex_lt=16
        ).collect()
    }
    true = Counter(w for t in texts for w in t.split() if w)
    assert set(est) == set(true)
    assert all(est[t] >= c for t, c in true.items())


@given(
    st.lists(st.integers(0, 50), min_size=5, max_size=40),
    st.integers(2, 8),
)
@SETTINGS
def test_systematic_pps_partitions_the_point_line(spark, weights, k):
    """Structural PPS invariants on arbitrary integer weights: the
    selected rows' point-intervals (sel(cum−w), sel(cum)] PARTITION the
    whole sampling-point line — every point is covered by exactly one
    selected row — and picks are strictly increasing in id order.
    Verified against an independent Python recomputation."""
    import hashlib

    from trimet_bytes__data_engineering_project_spark.operators.sampling import (
        systematic_pps_sample,
    )

    total = sum(w for w in weights if w > 0)
    if total < k:
        return  # guard path covered by its own test
    df = spark.createDataFrame(list(enumerate(weights)), ["doc_id", "w"])
    rows = sorted(systematic_pps_sample(df, "w", "doc_id", k).collect())

    stride = total // k
    offset = int(hashlib.md5(f"pps:{k}:{total}".encode()).hexdigest()[:8], 16) % stride
    sel = lambda c: (c + stride - 1 - offset) // stride  # noqa: E731
    n_points = sel(total)
    # python recomputation in id order
    cum, expect = 0, []
    for i, w in enumerate(weights):
        if w <= 0:
            continue
        lo, cum = sel(cum), cum + w
        if sel(cum) > lo:
            expect.append((i, w, sel(cum)))
    assert [(r.doc_id, r.w, r.pick) for r in rows] == expect
    # interval sizes over ALL rows sum to the point count
    cum2, total_cover = 0, 0
    for w in weights:
        if w <= 0:
            continue
        total_cover += sel(cum2 + w) - sel(cum2)
        cum2 += w
    assert total_cover == n_points
    picks = [p for _, _, p in expect]
    assert picks == sorted(picks) and len(picks) == len(set(picks))


@given(st.lists(docs, min_size=1, max_size=10))
@SETTINGS
def test_bigram_surprisal_matches_python_model(spark, texts):
    """x80's integer bigram surprisal recomputed independently in
    Python (Counter-based ML conditional, same integer div) must match
    exactly for arbitrary corpora; n_bigrams per doc = token count − 1."""
    from collections import Counter

    from trimet_bytes__data_engineering_project_spark.operators.textstats import (
        bigram_surprisal,
    )

    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    got = {r.doc_id: (r.n_bigrams, r.surprisal_sum) for r in bigram_surprisal(df).collect()}

    toks = {i: [w for w in t.split() if w] for i, t in enumerate(texts)}
    bgs = {i: [f"{a} {b}" for a, b in zip(ws, ws[1:])] for i, ws in toks.items()}
    cb = Counter(g for gs in bgs.values() for g in gs)
    cp = Counter(g.split(" ", 1)[0] for gs in bgs.values() for g in gs)
    expect = {
        i: (len(gs), sum(cp[g.split(" ", 1)[0]] // cb[g] for g in gs))
        for i, gs in bgs.items()
        if gs
    }
    assert got == expect
    for i, gs in bgs.items():
        if gs:
            assert got[i][0] == len(toks[i]) - 1


@given(st.lists(docs, min_size=1, max_size=15), st.integers(min_value=2, max_value=4))
@SETTINGS
def test_dedup_spans_matches_python_mask(spark, texts, n):
    """dedup_spans equals a direct Python recomputation of the
    ExactSubstr covering mask on ANY corpus: dup n-gram occurrences
    cover their n tokens, survivors reassemble in order, kept+removed
    = token count, and a doc's clean_text never contains a token the
    mask covered."""
    from collections import Counter

    from trimet_bytes__data_engineering_project_spark.operators.dedup import dedup_spans

    # Spark's split on "" yields [""]; mirror exactly
    toks = {i: (t.lower().strip().split() or [""]) for i, t in enumerate(texts)}
    counts = Counter()
    for tk in toks.values():
        for p in range(len(tk) - n + 1):
            counts[" ".join(tk[p : p + n])] += 1
    want = {}
    for i, tk in toks.items():
        covered = [False] * len(tk)
        for p in range(len(tk) - n + 1):
            if counts[" ".join(tk[p : p + n])] >= 2:
                for j in range(p, p + n):
                    covered[j] = True
        kept = [t for t, c in zip(tk, covered) if not c]
        want[i] = (" ".join(kept), len(kept), len(tk) - len(kept))

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["doc_id", "text"])
    got = {
        r.doc_id: (r.clean_text, r.n_tokens_kept, r.n_tokens_removed)
        for r in dedup_spans(df, n=n).collect()
    }
    assert got == want


@given(st.lists(docs.filter(lambda t: "a" in t), min_size=1, max_size=15),
       st.integers(min_value=1, max_value=100))
@SETTINGS
def test_vocab_coverage_minimality(spark, texts, pct):
    """For ANY corpus and threshold: the reported vocabulary reaches the
    threshold, one FEWER term would not (minimality), covered_tokens is
    exactly the mass of the vocab_size heaviest terms, and vocab_size
    never exceeds the distinct-term count."""
    from collections import Counter

    from trimet_bytes__data_engineering_project_spark.operators.textstats import (
        vocab_coverage,
    )
    import re

    all_counts = Counter()
    for t in texts:
        all_counts.update(re.findall("[a-z]+", t.lower()))
    n_total = sum(all_counts.values())
    r = vocab_coverage(
        spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]),
        coverage_pct=pct,
    ).collect()[0]
    thr = -(-pct * n_total // 100)  # ceil
    ordered = sorted(all_counts.values(), reverse=True)
    assert r.total_tokens == n_total
    assert 1 <= r.vocab_size <= len(ordered)
    assert r.covered_tokens == sum(ordered[: r.vocab_size])
    assert r.covered_tokens >= thr
    assert sum(ordered[: r.vocab_size - 1]) < thr  # minimal


@given(st.lists(docs, min_size=1, max_size=8), st.lists(docs, min_size=1, max_size=8))
@example(base_texts=[""], batch_texts=["a a a"])  # empty-base: N=0 must
# score the S = 8·(N+1) = 8 ceiling, not NULL (round-5 verdict defect)
@SETTINGS
def test_trigram_jm_matches_python_model(spark, base_texts, batch_texts):
    """x84's fixed-point Jelinek-Mercer surprisal recomputed
    independently in Python (Counter-based count tables, identical
    integer floor divisions, S = 8*(N+1)) must match exactly for
    arbitrary base/batch corpora — every interpolation branch included."""
    from collections import Counter

    from trimet_bytes__data_engineering_project_spark.operators.textstats import (
        trigram_jm_surprisal,
    )

    base = spark.createDataFrame(
        [(1000 + i, t) for i, t in enumerate(base_texts)], ["doc_id", "text"]
    )
    batch = spark.createDataFrame(list(enumerate(batch_texts)), ["doc_id", "text"])
    got = {
        r.doc_id: (r.n_trigrams, r.surprisal_sum)
        for r in trigram_jm_surprisal(batch, base).collect()
    }

    def grams(ws, n):
        return [" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)]

    btoks = [[w for w in t.split() if w] for t in base_texts]
    c3 = Counter(g for ws in btoks for g in grams(ws, 3))
    c3p = Counter(g.rsplit(" ", 1)[0] for ws in btoks for g in grams(ws, 3))
    c2 = Counter(g for ws in btoks for g in grams(ws, 2))
    c2p = Counter(g.split(" ", 1)[0] for ws in btoks for g in grams(ws, 2))
    c1 = Counter(w for ws in btoks for w in ws)
    n_total = sum(c1.values())
    s_scale = 8 * (n_total + 1)

    def inst(g):
        w1, w2, w3 = g.split(" ")
        p_fp = 1
        if g in c3:
            p_fp += (c3[g] * s_scale) // (2 * c3p[f"{w1} {w2}"])
        if f"{w2} {w3}" in c2:
            p_fp += (c2[f"{w2} {w3}"] * s_scale) // (4 * c2p[w2])
        if w3 in c1:
            p_fp += (c1[w3] * s_scale) // (8 * n_total)
        return s_scale // p_fp

    expect = {}
    for i, t in enumerate(batch_texts):
        gs = grams([w for w in t.split() if w], 3)
        if gs:
            expect[i] = (len(gs), sum(inst(g) for g in gs))
    assert got == expect


@given(st.lists(docs, min_size=1, max_size=8), st.lists(docs, min_size=1, max_size=8))
@example(base_texts=[""], batch_texts=["a a"])  # empty-base: nt=0 must
# score the S = 2·(nt+1) = 2 ceiling, not NULL (round-5 verdict defect
# class, pinned from day one on the KN rung)
@SETTINGS
def test_kneser_ney_matches_python_model(spark, base_texts, batch_texts):
    """x95's fixed-point interpolated Kneser-Ney surprisal recomputed
    independently in Python (Counter-based bigram/prefix/fan-out/
    continuation tables, identical integer floor divisions at
    S = 2·(nt+1)) must match exactly for arbitrary base/batch corpora —
    discounted-hit, λ·continuation, pure-continuation, and OOV-ceiling
    branches all included."""
    from collections import Counter

    from trimet_bytes__data_engineering_project_spark.operators.textstats import (
        kneser_ney_surprisal,
    )

    base = spark.createDataFrame(
        [(1000 + i, t) for i, t in enumerate(base_texts)], ["doc_id", "text"]
    )
    batch = spark.createDataFrame(list(enumerate(batch_texts)), ["doc_id", "text"])
    got = {
        r.doc_id: (r.n_bigrams, r.surprisal_sum)
        for r in kneser_ney_surprisal(batch, base).collect()
    }

    btoks = [[w for w in t.split() if w] for t in base_texts]
    c2 = Counter(f"{a} {b}" for ws in btoks for a, b in zip(ws, ws[1:]))
    c1p = Counter()
    n1p = Counter()
    ncont = Counter()
    for g, c in c2.items():
        w1, w2 = g.split(" ")
        c1p[w1] += c
        n1p[w1] += 1
        ncont[w2] += 1
    nt = len(c2)
    s_scale = 2 * (nt + 1)

    def inst(g):
        w1, w2 = g.split(" ")
        p_fp = 1
        if g in c2:
            p_fp += (s_scale * (2 * c2[g] - 1)) // (2 * c1p[w1])
        if w1 in c1p:
            p_fp += (s_scale * n1p[w1] * ncont.get(w2, 0)) // (2 * c1p[w1] * nt)
        elif w2 in ncont:
            p_fp += (s_scale * ncont[w2]) // nt
        return s_scale // p_fp

    expect = {}
    for i, t in enumerate(batch_texts):
        ws = [w for w in t.split() if w]
        gs = [f"{a} {b}" for a, b in zip(ws, ws[1:])]
        if gs:
            expect[i] = (len(gs), sum(inst(g) for g in gs))
    assert got == expect


@given(st.lists(docs, min_size=1, max_size=8), st.lists(docs, min_size=1, max_size=8))
@example(base_texts=[""], batch_texts=["a a a a"])  # empty-base: N=0 must
# score the S = 16·(N+1) = 16 ceiling, not NULL (round-5 verdict defect)
@SETTINGS
def test_fourgram_jm_matches_python_model(spark, base_texts, batch_texts):
    """x94's five-level fixed-point JM cascade recomputed independently
    in Python (S = 16*(N+1), identical integer floor divisions) for
    arbitrary base/batch corpora."""
    from collections import Counter

    from trimet_bytes__data_engineering_project_spark.operators.textstats import (
        fourgram_jm_surprisal,
    )

    base = spark.createDataFrame(
        [(1000 + i, t) for i, t in enumerate(base_texts)], ["doc_id", "text"]
    )
    batch = spark.createDataFrame(list(enumerate(batch_texts)), ["doc_id", "text"])
    got = {
        r.doc_id: (r.n_fourgrams, r.surprisal_sum)
        for r in fourgram_jm_surprisal(batch, base).collect()
    }

    def grams(ws, n):
        return [" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)]

    btoks = [[w for w in t.split() if w] for t in base_texts]
    c4 = Counter(g for ws in btoks for g in grams(ws, 4))
    c4p = Counter(g.rsplit(" ", 1)[0] for ws in btoks for g in grams(ws, 4))
    c3 = Counter(g for ws in btoks for g in grams(ws, 3))
    c3p = Counter(g.rsplit(" ", 1)[0] for ws in btoks for g in grams(ws, 3))
    c2 = Counter(g for ws in btoks for g in grams(ws, 2))
    c2p = Counter(g.split(" ", 1)[0] for ws in btoks for g in grams(ws, 2))
    c1 = Counter(w for ws in btoks for w in ws)
    n_total = sum(c1.values())
    s_scale = 16 * (n_total + 1)

    def inst(g):
        w1, w2, w3, w4 = g.split(" ")
        p_fp = 1
        if g in c4:
            p_fp += (c4[g] * s_scale) // (2 * c4p[f"{w1} {w2} {w3}"])
        if f"{w2} {w3} {w4}" in c3:
            p_fp += (c3[f"{w2} {w3} {w4}"] * s_scale) // (4 * c3p[f"{w2} {w3}"])
        if f"{w3} {w4}" in c2:
            p_fp += (c2[f"{w3} {w4}"] * s_scale) // (8 * c2p[w3])
        if w4 in c1:
            p_fp += (c1[w4] * s_scale) // (16 * n_total)
        return s_scale // p_fp

    expect = {}
    for i, t in enumerate(batch_texts):
        gs = grams([w for w in t.split() if w], 4)
        if gs:
            expect[i] = (len(gs), sum(inst(g) for g in gs))
    assert got == expect


@given(st.lists(docs, min_size=1, max_size=8), st.lists(docs, min_size=1, max_size=8))
@example(base_texts=[""], batch_texts=["a a"])  # empty-base: nt=0 must
# score the S = 2·(nt+1) = 2 ceiling, not NULL (pinned from day one)
@SETTINGS
def test_modified_kneser_ney_matches_python_model(spark, base_texts, batch_texts):
    """x98's modified-KN cascade recomputed independently in Python:
    count-of-counts n1..n4 → the three Chen-Goodman discounts as
    integer numerators over Q=64 (floor + per-class clamp + Q/2
    fallback on a zero denominator), class-weighted λ mass, identical
    floor divisions at S = 2·(nt+1) — exact match for arbitrary
    base/batch corpora."""
    from collections import Counter

    from trimet_bytes__data_engineering_project_spark.operators.textstats import (
        MKN_DENOM,
        modified_kneser_ney_surprisal,
    )

    q = MKN_DENOM
    base = spark.createDataFrame(
        [(1000 + i, t) for i, t in enumerate(base_texts)], ["doc_id", "text"]
    )
    batch = spark.createDataFrame(list(enumerate(batch_texts)), ["doc_id", "text"])
    got = {
        r.doc_id: (r.n_bigrams, r.surprisal_sum)
        for r in modified_kneser_ney_surprisal(batch, base).collect()
    }

    btoks = [[w for w in t.split() if w] for t in base_texts]
    c2 = Counter(f"{a} {b}" for ws in btoks for a, b in zip(ws, ws[1:]))
    c1p = Counter()
    ncls = {}  # w1 -> [n_class1, n_class2, n_class3plus]
    ncont = Counter()
    for g, c in c2.items():
        w1, w2 = g.split(" ")
        c1p[w1] += c
        cls = ncls.setdefault(w1, [0, 0, 0])
        cls[min(c, 3) - 1] += 1
        ncont[w2] += 1
    nt = len(c2)
    coc = Counter(c2.values())
    n1, n2, n3, n4 = coc[1], coc[2], coc[3], coc[4]
    yden = n1 + 2 * n2
    d1q = (q * n1) // yden if yden > 0 else q // 2
    d2q = (
        max(0, min(2 * q, 2 * q - (3 * q * n1 * n3) // (yden * n2)))
        if yden > 0 and n2 > 0
        else q // 2
    )
    d3q = (
        max(0, min(3 * q, 3 * q - (4 * q * n1 * n4) // (yden * n3)))
        if yden > 0 and n3 > 0
        else q // 2
    )
    s_scale = 2 * (nt + 1)

    def inst(g):
        w1, w2 = g.split(" ")
        p_fp = 1
        if g in c2:
            dq = d1q if c2[g] == 1 else d2q if c2[g] == 2 else d3q
            p_fp += (s_scale * (q * c2[g] - dq)) // (q * c1p[w1])
        if w1 in c1p:
            lam = d1q * ncls[w1][0] + d2q * ncls[w1][1] + d3q * ncls[w1][2]
            p_fp += (s_scale * lam * ncont.get(w2, 0)) // (q * c1p[w1] * nt)
        elif w2 in ncont:
            p_fp += (s_scale * ncont[w2]) // nt
        return s_scale // p_fp

    expect = {}
    for i, t in enumerate(batch_texts):
        ws = [w for w in t.split() if w]
        gs = [f"{a} {b}" for a, b in zip(ws, ws[1:])]
        if gs:
            expect[i] = (len(gs), sum(inst(g) for g in gs))
    assert got == expect


@given(st.lists(docs, min_size=1, max_size=8), st.lists(docs, min_size=1, max_size=8))
@example(base_texts=[""], batch_texts=["a a a"])  # empty-base: nt3=0 must
# score the S = 4·(nt3+1) = 4 ceiling, not NULL (pinned from day one)
@SETTINGS
def test_trigram_kneser_ney_matches_python_model(spark, base_texts, batch_texts):
    """x99's recursive trigram-KN cascade recomputed independently in
    Python (trigram prefix/suffix-continuation/middle-rollup tables +
    the bigram continuation pair, identical floor divisions at
    S = 4·(nt3+1)) — every backoff rung included, exact match for
    arbitrary base/batch corpora."""
    from collections import Counter

    from trimet_bytes__data_engineering_project_spark.operators.textstats import (
        trigram_kneser_ney_surprisal,
    )

    base = spark.createDataFrame(
        [(1000 + i, t) for i, t in enumerate(base_texts)], ["doc_id", "text"]
    )
    batch = spark.createDataFrame(list(enumerate(batch_texts)), ["doc_id", "text"])
    got = {
        r.doc_id: (r.n_trigrams, r.surprisal_sum)
        for r in trigram_kneser_ney_surprisal(batch, base).collect()
    }

    btoks = [[w for w in t.split() if w] for t in base_texts]
    t3 = Counter(" ".join(g) for ws in btoks for g in zip(ws, ws[1:], ws[2:]))
    t2 = Counter(f"{a} {b}" for ws in btoks for a, b in zip(ws, ws[1:]))
    c12, n12 = Counter(), Counter()
    m23 = Counter()
    for g, c in t3.items():
        w = g.split(" ")
        c12[f"{w[0]} {w[1]}"] += c
        n12[f"{w[0]} {w[1]}"] += 1
        m23[f"{w[1]} {w[2]}"] += 1
    nm2, nf2 = Counter(), Counter()
    for s, c in m23.items():
        w2 = s.split(" ")[0]
        nm2[w2] += c
        nf2[w2] += 1
    nc3 = Counter(g.split(" ")[1] for g in t2)
    nt3, ntb = len(t3), len(t2)
    s_scale = 4 * (nt3 + 1)

    def inst(g):
        w = g.split(" ")
        h, s23, w2, w3 = f"{w[0]} {w[1]}", f"{w[1]} {w[2]}", w[1], w[2]
        p_fp = 1
        if g in t3:
            p_fp += (s_scale * (2 * t3[g] - 1)) // (2 * c12[h])
        if h in c12:
            if s23 in m23:
                p_fp += (s_scale * n12[h] * (2 * m23[s23] - 1)) // (
                    4 * c12[h] * nm2[w2]
                )
            p_fp += (s_scale * n12[h] * nf2[w2] * nc3.get(w3, 0)) // (
                4 * c12[h] * nm2[w2] * ntb
            )
        elif s23 in m23:
            p_fp += (s_scale * (2 * m23[s23] - 1)) // (2 * nm2[w2])
            p_fp += (s_scale * nf2[w2] * nc3.get(w3, 0)) // (2 * nm2[w2] * ntb)
        elif w2 in nm2:
            p_fp += (s_scale * nf2[w2] * nc3.get(w3, 0)) // (2 * nm2[w2] * ntb)
        elif w3 in nc3:
            p_fp += (s_scale * nc3[w3]) // ntb
        return s_scale // p_fp

    expect = {}
    for i, t in enumerate(batch_texts):
        ws = [w for w in t.split() if w]
        gs = [" ".join(g) for g in zip(ws, ws[1:], ws[2:])]
        if gs:
            expect[i] = (len(gs), sum(inst(g) for g in gs))
    assert got == expect


def _winnow_model(text: str, k: int = 3, w: int = 4) -> set[tuple[int, int]]:
    """Direct Python winnowing (rightmost-min robust rule) — the
    independent model operators/dedup.py:winnow_fingerprints must
    match: md5 8-hex k-gram hashes over lowered whitespace tokens."""
    import hashlib
    import re

    toks = [t for t in re.split(r"\s+", text.lower().strip()) if t]
    grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    hs = [int(hashlib.md5(g.encode()).hexdigest()[:8], 16) for g in grams]
    m = len(hs)
    if m == 0:
        return set()
    windows = (
        [(j, j + w - 1) for j in range(1, m - w + 2)] if m >= w else [(1, m)]
    )
    out = set()
    for lo, hi in windows:
        bv, bp = hs[lo - 1], lo
        for q in range(lo + 1, hi + 1):
            if hs[q - 1] <= bv:
                bv, bp = hs[q - 1], q
        out.add((bp, bv))
    return out


@given(st.lists(docs, min_size=1, max_size=12))
@example(["a b c"])                      # exactly one k-gram
@example(["a b c d"])                    # 2 k-grams < window
@example(["a a a a a a a a a a"])        # all-equal hashes: rightmost ties
@example([""])                           # no tokens at all
@SETTINGS
def test_winnow_matches_python_model(spark, texts):
    """winnow_fingerprints == the direct Python winnowing model on
    arbitrary corpora — positions, hashes, dedup and the short-doc
    single-window rule all agree."""
    from trimet_bytes__data_engineering_project_spark.operators.dedup import (
        winnow_fingerprints,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    got: dict[int, set] = {}
    for r in winnow_fingerprints(df).collect():
        got.setdefault(r.doc_id, set()).add((r.pos, r.fp))
    for i, t in enumerate(texts):
        assert got.get(i, set()) == _winnow_model(t), (i, t)


@given(st.lists(docs.filter(lambda t: len(t.split()) >= 6), min_size=2, max_size=6))
@SETTINGS
def test_winnow_coverage_guarantee(spark, texts):
    """The SIGMOD'03 coverage theorem: a doc and itself-with-a-prefix
    share a run of the full doc length >= window+k-1 tokens, so the
    pair MUST share at least one fingerprint hash."""
    from trimet_bytes__data_engineering_project_spark.operators.dedup import (
        winnow_fingerprints,
    )

    rows = []
    for i, t in enumerate(texts):
        rows.append((2 * i, t))
        rows.append((2 * i + 1, "zzz qqq xxx " + t))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    fps: dict[int, set] = {}
    for r in winnow_fingerprints(df).collect():
        fps.setdefault(r.doc_id, set()).add(r.fp)
    for i, t in enumerate(texts):
        if len(t.split()) >= 6:  # run of >= window+k-1 = 6 tokens
            assert fps[2 * i] & fps[2 * i + 1], t


@given(
    st.lists(
        st.tuples(st.integers(0, 5000), st.integers(1, 40)),
        min_size=1,
        max_size=25,
        unique_by=lambda t: t[0],
    ),
    st.integers(2, 16),
    st.integers(1, 50),
)
@SETTINGS
@example([(0, 3), (99, 5), (100, 2), (101, 7)], 4, 100)  # ids straddling a bucket edge
def test_concat_chunk_spans_equals_naive_cumsum(spark, rows, context_len, bucket_size):
    """The two-level distributed prefix sum equals the naive sequential
    cumsum for ANY sparse id set, bucket size and context length —
    including ids that straddle bucket boundaries and single-doc
    buckets."""
    from trimet_bytes__data_engineering_project_spark.operators.sampling import (
        concat_chunk_spans,
    )

    rows = sorted(rows)
    df = spark.createDataFrame(rows, "doc_id long, n_tok long")
    got = {
        r.doc_id: (r.start_off, r.first_chunk, r.last_chunk, r.n_chunks, r.crosses)
        for r in concat_chunk_spans(
            df, "doc_id", "n_tok", context_len, bucket_size=bucket_size
        ).collect()
    }
    off = 0
    for did, n in rows:
        first, last = off // context_len, (off + n - 1) // context_len
        assert got[did] == (off, first, last, last - first + 1, int(last > first))
        off += n
    assert len(got) == len(rows)


lang_words = st.lists(
    st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff"]), min_size=1, max_size=12
).map(" ".join)
lang_doc = st.tuples(lang_words, st.sampled_from(["xx", "yy", "zz"]))


@given(
    st.lists(lang_doc, min_size=2, max_size=12),
    st.lists(lang_doc, min_size=1, max_size=8),
)
@SETTINGS
def test_lang_snapshot_matches_python_model(spark, base_rows, batch_rows):
    """lang_id_from_snapshot == a pure-Python reference implementing
    the SAME integer formulas (md5-slice buckets, add-one full-grid
    ratios, per-lang summed ratio scores, smallest-lang argmax) — the
    pivoted-column Spark plan is a pure re-expression, so every
    prediction matches for ANY corpus (single-script here: masks are
    uniform and the prefilter is vacuous by construction)."""
    import hashlib

    from trimet_bytes__data_engineering_project_spark.operators.textstats import (
        lang_id_from_snapshot,
        lang_ratio_profiles,
        lang_script_masks,
    )

    SCALE, B = 10**6, 256

    def bucket(tok: str) -> int:
        return int(hashlib.md5(tok.encode()).hexdigest()[:2], 16)

    # python reference: full-grid per-lang ratios from the base corpus
    lc: dict = {}
    rc: dict = {}
    for text, lang in base_rows:
        for t in text.split():
            b = bucket(t)
            lc[(lang, b)] = lc.get((lang, b), 0) + 1
            rc[b] = rc.get(b, 0) + 1
    langs = sorted({lang for _, lang in base_rows})
    n_t = {g: sum(v for (l, _), v in lc.items() if l == g) for g in langs}
    n_r = sum(rc.values())

    def ratio(g: str, b: int) -> int:
        pt = (lc.get((g, b), 0) + 1) * SCALE // (n_t[g] + B)
        pr = (rc.get(b, 0) + 1) * SCALE // (n_r + B)
        return pt * SCALE // max(1, pr)

    want = {}
    for i, (text, claimed) in enumerate(batch_rows):
        toks = text.split()
        if not toks:
            continue
        scores = {
            g: sum(ratio(g, bucket(t)) for t in toks) for g in langs
        }
        best = max(scores.values())
        pred = min(g for g in langs if scores[g] == best)
        want[1000 + i] = (claimed, pred, int(pred == claimed))

    base = spark.createDataFrame(
        [(i, t, g) for i, (t, g) in enumerate(base_rows)],
        "doc_id long, text string, lang string",
    )
    batch = spark.createDataFrame(
        [(1000 + i, t, g) for i, (t, g) in enumerate(batch_rows)],
        "doc_id long, text string, lang string",
    )
    got = {
        r.doc_id: (r.claimed, r.pred, r.agree)
        for r in lang_id_from_snapshot(
            batch, lang_ratio_profiles(base), lang_script_masks(base)
        ).collect()
    }
    assert got == want


def test_burst_flag_matches_pure_python_zscore(spark):
    """x191's integer cross-multiplied 2σ test against a pure-Python
    float z-score model on planted series: a flat series never bursts
    (variance 0 ⇒ dev 0), a single planted spike bursts, and for a
    mixed random-ish table every (peak, flag) agrees with the float
    model (the integer form is the SAME inequality scaled by n² —
    no epsilon, no sqrt)."""
    import datetime

    from pyspark.sql import functions as F

    from trimet_bytes__data_engineering_project_spark.plans.registry import QUERIES

    base = datetime.datetime(2024, 1, 1)
    rows = []
    # user 1: flat 5/day for 10 days; user 2: 5/day with one 50-spike;
    # user 3: deterministic pseudo-random 1..9
    for day in range(10):
        rows += [(1, base + datetime.timedelta(days=day, hours=h)) for h in range(5)]
        n2 = 50 if day == 7 else 5
        rows += [(2, base + datetime.timedelta(days=day, hours=h % 24, minutes=h // 24)) for h in range(n2)]
        n3 = (day * 7 + 3) % 9 + 1
        rows += [(3, base + datetime.timedelta(days=day, hours=h)) for h in range(n3)]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")

    import tempfile
    with tempfile.TemporaryDirectory() as td:
        # x191 loads {dir}/events.parquet via load_table; give it one
        df.withColumn("event_id", F.monotonically_increasing_id()) \
          .withColumn("event_type", F.lit("e")).withColumn("value", F.lit(1.0)) \
          .withColumn("props", F.lit("{}")) \
          .write.parquet(f"{td}/events.parquet")
        got = {r.user_id: r for r in QUERIES["x191_burst_detection"](spark, td).collect()}

    # pure-python model
    def model(counts):
        n = len(counts)
        mu = sum(counts) / n
        var = sum((c - mu) ** 2 for c in counts) / n
        peak = max(range(n), key=lambda i: (counts[i], -i))
        dev = counts[peak] - mu
        return peak, dev > 0 and dev * dev > 4 * var

    series = {
        1: [5] * 10,
        2: [50 if d == 7 else 5 for d in range(10)],
        3: [(d * 7 + 3) % 9 + 1 for d in range(10)],
    }
    for uid, counts in series.items():
        peak_day, burst = model(counts)
        assert got[uid].day == (base + datetime.timedelta(days=peak_day)).date()
        assert bool(got[uid].burst) == burst, uid
    assert not got[1].burst and got[2].burst


def test_trend_slope_matches_pure_python_least_squares(spark):
    """x196's integer OLS against Python float least squares on
    planted series: increasing → positive slope, flat → 0, decreasing
    → negative; the ppm read-off is floor(float_slope · 10⁶) within 1
    ulp of the integer division (same numerator/denominator)."""
    import datetime
    import tempfile

    from pyspark.sql import functions as F

    from trimet_bytes__data_engineering_project_spark.plans.registry import QUERIES

    base = datetime.datetime(2024, 1, 1)
    series = {
        1: [2 + d for d in range(10)],          # +1/day
        2: [5] * 10,                            # flat
        3: [20 - 2 * d for d in range(10)],     # -2/day
        4: [((d * 5 + 1) % 7) + 1 for d in range(10)],  # wobble
    }
    rows = []
    for uid, counts in series.items():
        for d, c in enumerate(counts):
            rows += [(uid, base + datetime.timedelta(days=d, hours=h % 24, minutes=h // 24)) for h in range(c)]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")

    with tempfile.TemporaryDirectory() as td:
        df.withColumn("event_id", F.monotonically_increasing_id()) \
          .withColumn("event_type", F.lit("e")).withColumn("value", F.lit(1.0)) \
          .withColumn("props", F.lit("{}")) \
          .write.parquet(f"{td}/events.parquet")
        got = {r.user_id: r for r in QUERIES["x196_trend_slope"](spark, td).collect()}

    import math
    for uid, counts in series.items():
        n = len(counts)
        xs = list(range(n))
        sx, sy = sum(xs), sum(counts)
        sxy = sum(x * y for x, y in zip(xs, counts))
        sxx = sum(x * x for x in xs)
        num, den = n * sxy - sx * sy, n * sxx - sx * sx
        r = got[uid]
        assert (r.slope_num, r.slope_den) == (num, den), uid
        assert r.slope_ppm == (num * 1000000) // den if den else r.slope_ppm == 0
        # float model sign agreement
        assert (r.slope_ppm > 0) == (num / den > 5e-7) or abs(num / den) < 1e-6
    assert got[1].slope_ppm == 1000000 and got[2].slope_ppm == 0
    assert got[3].slope_ppm == -2000000


@given(
    st.lists(st.integers(min_value=0, max_value=40), min_size=1, max_size=120),
    st.integers(min_value=1, max_value=3),
)
@SETTINGS
def test_cms_and_hll_merge_invariants_random_multisets(spark, keys, splits):
    """Sketch algebra on RANDOM key multisets: (a) CMS counters over
    any split sum cell-wise to the whole's counters and every estimate
    ≥ its exact count; (b) HLL registers over the same split max-fold
    to the whole's registers.  The streaming landings are exact iff
    exactly these identities hold."""
    from trimet_bytes__data_engineering_project_spark.operators.sketch import (
        cms_counters,
        cms_estimate,
        hll_registers,
    )

    df = spark.createDataFrame([(i, k) for i, k in enumerate(keys)], ["i", "k"])
    parts = [df.filter(F.col("i") % (splits + 1) == m) for m in range(splits + 1)]

    whole = {(r.row, r.bucket): r.cell for r in cms_counters(df, "k", 3, 8).collect()}
    summed: dict = {}
    for p in parts:
        for r in cms_counters(p, "k", 3, 8).collect():
            summed[(r.row, r.bucket)] = summed.get((r.row, r.bucket), 0) + r.cell
    assert summed == whole

    import collections
    exact = collections.Counter(keys)
    counts = df.groupBy("k").agg(F.count("*").cast("long").alias("c"))
    est = {
        r.k: r.est
        for r in cms_estimate(counts, cms_counters(df, "k", 3, 8), "k", 3, 8).collect()
    }
    assert all(est[k] >= exact[k] for k in exact)

    hwhole = {r.reg: r.rho_max for r in hll_registers(df, "k", p=4).collect()}
    hmax: dict = {}
    for p in parts:
        for r in hll_registers(p, "k", p=4).collect():
            hmax[r.reg] = max(hmax.get(r.reg, 0), r.rho_max)
    assert hmax == hwhole


@given(
    st.lists(
        st.tuples(st.integers(0, 60), st.integers(0, 1_200_000)),
        min_size=1, max_size=60,
    )
)
@SETTINGS
def test_ray_casting_matches_pure_python(spark, pts):
    """x199's generated integer ray-cast SQL against the classic
    float-free Python crossing-count on random points — same polygon,
    same strict comparisons, so the answers must be identical (points
    exactly on an edge included: both sides make the same strict-<
    decision)."""
    from trimet_bytes__data_engineering_project_spark.plans.extensions import (
        _SERVICE_POLY,
        _ray_cast_sql,
    )

    df = spark.createDataFrame(pts, ["x", "y"])
    expr = _ray_cast_sql("CAST(x AS BIGINT)", "CAST(y AS BIGINT)", _SERVICE_POLY)
    got = [bool(r.ins) for r in df.selectExpr(f"{expr} AS ins").collect()]

    def inside(x, y):
        c = 0
        n = len(_SERVICE_POLY)
        for i in range(n):
            xi, yi = _SERVICE_POLY[i]
            xj, yj = _SERVICE_POLY[(i + 1) % n]
            if (yi > y) != (yj > y):
                d = yj - yi
                lhs, rhs = (x - xi) * d, (xj - xi) * (y - yi)
                if (lhs < rhs) if d > 0 else (lhs > rhs):
                    c += 1
        return c % 2 == 1

    want = [inside(x, y) for x, y in pts]
    assert got == want


@given(
    st.lists(
        st.tuples(st.integers(0, 25), st.integers(0, 25)),
        min_size=0, max_size=60,
    ),
    st.integers(min_value=2, max_value=4),
)
@SETTINGS
def test_merge_components_random_graphs(spark, edges, mod):
    """merge_components == full connected_components for random edge
    sets under random splits — the star-compression exactness on
    arbitrary graph shapes, not just the fixture chains."""
    from trimet_bytes__data_engineering_project_spark.operators.graph import (
        connected_components,
        merge_components,
    )

    if not edges:
        return
    df = spark.createDataFrame(edges, "a_id long, b_id long")
    full = sorted(map(tuple, connected_components(df).collect()))
    old = df.filter((F.col("a_id") + F.col("b_id")) % mod == 0)
    new = df.filter((F.col("a_id") + F.col("b_id")) % mod != 0)
    if old.count() == 0:
        return  # nothing to seed the store with
    store = connected_components(old)
    got = sorted(map(tuple, merge_components(store, new).collect()))
    assert got == full


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3 * 86_400 * 1_000_000),  # µs over 3 days
            st.integers(min_value=0, max_value=5),  # event_id (collisions welcome)
        ),
        min_size=1,
        max_size=40,
    ),
    st.sampled_from([900_000_000, 3_600_000_000, 40_000_000_000]),
)
@SETTINGS
def test_two_level_lag_equals_naive_day_window(spark, rows, shard_us):
    """x202's two-level lag (interior (day, shard) window + the
    non-empty-shard boundary frame) is bit-equal to the naive
    one-window-per-day form for ARBITRARY event streams and shard
    widths — including duplicate timestamps, empty shards, shards wider
    than a day, and single-event days.

    event_id collisions (including exact duplicate (t, event_id) rows)
    ARE generated and kept: the tie order among equal sort keys is
    arbitrary on both sides, but the per-day aggregates are permutation-
    invariant over ties (equal rows contribute a 0 gap wherever they
    land, and the gaps to their neighbors are unchanged), so the
    comparison stays deterministic without deduplication."""
    # the queried function lives in plans.ext.audits since the round-14
    # split: monkeypatching load_table must hit the OWNING module
    import trimet_bytes__data_engineering_project_spark.plans.ext.audits as ext

    ev = spark.createDataFrame(
        rows, "tus long, event_id long"
    ).select("event_id", F.timestamp_micros(F.col("tus")).alias("ts"))

    orig = ext.load_table
    try:
        ext.load_table = lambda s, d, n: ev
        got = [
            tuple(r)
            for r in ext.x202_feed_outage_audit(
                spark, "ignored", shard_us=shard_us
            ).collect()
        ]
    finally:
        ext.load_table = orig

    from pyspark.sql import Window

    eus = F.unix_micros(F.col("ts").cast("timestamp"))
    w = Window.partitionBy(F.to_date("ts")).orderBy(eus, F.col("event_id"))
    naive = (
        ev.select(
            F.to_date("ts").alias("day"),
            eus.alias("t"),
            F.lag(eus).over(w).alias("prev"),
        )
        .filter(F.col("prev").isNotNull())
        .groupBy("day")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.max(F.col("t") - F.col("prev")).cast("long").alias("max_gap_us"),
            (F.max(F.col("t") - F.col("prev")) > 3600000000).alias("outage"),
        )
        .orderBy("day")
    )
    assert got == [tuple(r) for r in naive.collect()]


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-5, max_value=60),       # x: spans off-grid too
            st.integers(min_value=-10**6, max_value=12 * 10**6),  # y cents
        ),
        min_size=1,
        max_size=60,
    )
)
@example([(2, 500_000), (0, 500_000), (4, 500_000), (2, 900_000), (2, 100_000)])
@SETTINGS
def test_polygon_blocking_is_lossless(spark, pts):
    """x205's bbox-bucket blocking is LOSSLESS for arbitrary point
    coordinates (on vertices, on bbox corners, off-grid, negative):
    the blocked+exact pipeline equals a brute-force ray cast against
    all 100 polygons with no blocking at all.  A candidate the buckets
    drop is a correctness bug, not a perf one."""
    # the queried function lives in plans.ext.scale_probes since the round-14
    # split: monkeypatching load_table must hit the OWNING module
    import trimet_bytes__data_engineering_project_spark.plans.ext.scale_probes as ext
    from pyspark.sql import functions as F

    li = spark.createDataFrame(
        [(float(x), y / 100.0) for x, y in pts],
        "l_quantity double, l_extendedprice double",
    )
    orig = ext.load_table
    try:
        ext.load_table = lambda s, d, n: li
        got = [tuple(r) for r in ext.x205_point_in_any_polygon(spark, "ignored").collect()]
    finally:
        ext.load_table = orig

    # brute force: every point against every polygon's edge array
    edges = {}
    for k, xi, yi, xj, yj, d in ext._x205_edges():
        edges.setdefault(k, []).append((xi, yi, xj, yj, d))
    polys = spark.createDataFrame(
        [(k, edges[k]) for k, _, _ in ext._x205_polys()],
        "poly_id long, edges array<struct<xi:long,yi:long,xj:long,yj:long,d:long>>",
    )
    term = ext._X205_TERM.format(
        x="x", y="y", xi="e.xi", yi="e.yi", xj="e.xj", yj="e.yj", d="e.d"
    )
    pts_df = li.selectExpr(
        "CAST(l_quantity AS BIGINT) AS x",
        "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS y",
    )
    brute = (
        pts_df.crossJoin(F.broadcast(polys))
        .withColumn(
            "crossings",
            F.expr(f"aggregate(edges, CAST(0 AS BIGINT), (acc, e) -> acc + {term})"),
        )
        .filter(F.col("crossings") % 2 == 1)
        .groupBy("poly_id")
        .count()
    )
    want = {r["poly_id"]: r["count"] for r in brute.collect()}
    assert got == sorted((k, want.get(k, 0)) for k, _, _ in ext._x205_polys())


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3 * 86_400 * 1_000_000),  # µs over 3 days
            st.integers(min_value=0, max_value=5),  # event_id (collisions welcome)
        ),
        min_size=1,
        max_size=40,
    ),
    st.sampled_from([900_000_000, 3_600_000_000, 40_000_000_000]),
    st.lists(st.integers(min_value=1, max_value=39), min_size=0, max_size=3),
)
@SETTINGS
def test_outage_segment_store_equals_batch_x202(spark, rows, shard_us, cuts):
    """The streaming outage store's segment algebra (outage_segments per
    batch + outage_from_segments chain/fold at serve) is bit-equal to
    the batch x202 for ARBITRARY event multisets split into ARBITRARY
    time-ordered batches — including batch boundaries inside a shard,
    empty batches, duplicate timestamps, and shards wider than a day.
    Batches are cut at random positions of the time-sorted sequence
    (the feed's arrival-order contract); the INTERLEAVED case is pinned
    separately as a loud error in tests/test_sketch.py."""
    # the queried function lives in plans.ext.audits since the round-14
    # split: monkeypatching load_table must hit the OWNING module
    import trimet_bytes__data_engineering_project_spark.plans.ext.audits as ext
    from trimet_bytes__data_engineering_project_spark.streaming.stats import (
        outage_from_segments,
        outage_segments,
    )

    ordered = sorted(rows)  # time-ordered arrival; ties arrive together
    bounds = sorted({min(c, len(ordered)) for c in cuts} | {0, len(ordered)})
    batches = [
        ordered[a:b] for a, b in zip(bounds, bounds[1:]) if b > a
    ] or [ordered]

    def to_df(batch):
        return spark.createDataFrame(
            batch, "tus long, event_id long"
        ).select("event_id", F.timestamp_micros(F.col("tus")).alias("ts"))

    from functools import reduce

    segs = reduce(
        lambda a, b: a.unionByName(b),
        [outage_segments(to_df(b), shard_us) for b in batches],
    )
    got = [tuple(r) for r in outage_from_segments(segs).collect()]

    ev = to_df(ordered)
    orig = ext.load_table
    try:
        ext.load_table = lambda s, d, n: ev
        want = [
            tuple(r)
            for r in ext.x202_feed_outage_audit(
                spark, "ignored", shard_us=shard_us
            ).collect()
        ]
    finally:
        ext.load_table = orig
    assert got == want


@given(
    st.lists(
        st.integers(min_value=0, max_value=3 * 86_400 * 1_000_000),
        min_size=1,
        max_size=40,
    ),
    st.sampled_from([900_000_000, 3_600_000_000]),
    st.lists(st.integers(min_value=1, max_value=39), min_size=0, max_size=3),
)
@SETTINGS
def test_outage_store_with_ids_replay_invariance(spark, times, shard_us, cuts):
    """Property form of the id-bearing outage store (round-12): on a
    feed with UNIQUE event ids (the id-bearing-feed contract), (a) the
    with-ids fold equals the range-only fold for arbitrary time-ordered
    batch cuts — the id evidence never changes a clean serve — and
    (b) re-landing every ZERO-SPAN batch under a new batch_id (the one
    replay the range-only store documents as undetectable) leaves the
    with-ids fold bit-unchanged.  >0-span replays keep raising via the
    overlap check, pinned in tests/test_sketch.py."""
    from functools import reduce

    from trimet_bytes__data_engineering_project_spark.streaming.stats import (
        outage_from_segments,
        outage_from_segments_with_ids,
        outage_segments,
        outage_segments_with_ids,
    )

    ordered = sorted(times)
    rows = [(t, i) for i, t in enumerate(ordered)]  # unique ids over the feed
    bounds = sorted({min(c, len(rows)) for c in cuts} | {0, len(rows)})
    batches = [rows[a:b] for a, b in zip(bounds, bounds[1:]) if b > a] or [rows]

    def to_df(batch):
        return spark.createDataFrame(batch, "tus long, event_id long").select(
            "event_id", F.timestamp_micros(F.col("tus")).alias("ts")
        )

    union = lambda frames: reduce(lambda a, b: a.unionByName(b), frames)  # noqa: E731
    segs = union([outage_segments_with_ids(to_df(b), shard_us) for b in batches])
    got = [tuple(r) for r in outage_from_segments_with_ids(segs).collect()]

    plain = union([outage_segments(to_df(b), shard_us) for b in batches])
    assert got == [tuple(r) for r in outage_from_segments(plain).collect()]

    zero_span = [
        outage_segments_with_ids(to_df(b), shard_us)
        for b in batches
        if len({t for t, _ in b}) == 1
    ]
    if zero_span:
        replayed = union([segs] + zero_span)
        assert [
            tuple(r) for r in outage_from_segments_with_ids(replayed).collect()
        ] == got


@given(
    st.lists(
        st.lists(st.sampled_from("abcde"), min_size=0, max_size=3, unique=True),
        min_size=1,
        max_size=4,
    )
)
@SETTINGS
def test_landing_schema_registry_chain(spark, tmp_path_factory, added_cols):
    """Property form of the add-only registry (round-12): for ANY chain
    of registrations that each append a random set of nullable columns,
    (a) every registration succeeds and bumps the version, (b) landing
    one generation per version and serving via read_registered yields
    exactly the union with nulls backfilled for columns a generation
    predates, and (c) every historical version stays pinnable and is a
    prefix-compatible subset of the final schema."""
    from pyspark.sql.types import LongType, StructField, StructType

    from trimet_bytes__data_engineering_project_spark.sources.readers import (
        landing_schema,
        read_registered,
        register_landing_schema,
    )

    path = str(tmp_path_factory.mktemp("reg") / "landing")
    fields = [StructField("id", LongType())]
    seen = {"id"}
    versions: list[StructType] = []
    row_id = 0
    for gen, cols in enumerate(added_cols):
        for c in cols:
            if c not in seen:
                seen.add(c)
                fields.append(StructField(c, LongType()))
        schema = StructType(list(fields))
        assert register_landing_schema(spark, path, schema) == gen + 1
        versions.append(schema)
        spark.createDataFrame(
            [tuple(row_id * 100 + j for j in range(len(schema.fields)))], schema
        ).write.parquet(f"{path}/batch_id={gen}")
        row_id += 1

    served = read_registered(spark, path)
    final = versions[-1]
    assert [f.name for f in served.schema.fields][: len(final.fields)] == [
        f.name for f in final.fields
    ]
    rows = {r["id"]: r for r in served.collect()}
    assert len(rows) == len(versions)
    for gen, schema in enumerate(versions):
        r = rows[gen * 100]
        gen_cols = {f.name for f in schema.fields}
        for f in final.fields:
            if f.name in gen_cols:
                assert r[f.name] is not None
            else:  # the generation predates this column: null-filled
                assert r[f.name] is None
        # historical pin reproduces each registered version exactly
        assert landing_schema(spark, path, gen + 1) == schema


@given(
    st.lists(
        st.tuples(st.sampled_from(["land", "compact", "replay0"]),
                  st.integers(min_value=0, max_value=99)),
        min_size=1,
        max_size=6,
    )
)
@SETTINGS
def test_store_compaction_any_interleaving_serves_truth(
    spark, tmp_path_factory, ops
):
    """Property form of the round-12 store compaction: for ANY
    interleaving of landings, compactions, and a fresh-checkpoint-style
    replay of batch 0, the served sum-fold equals the truth fold over
    everything ever landed — compaction never loses rows, double-counts
    a replay, or misorders the consolidated/tail split.  (Batch dirs
    are written directly; the landing unit is just parquet under
    batch_id=N, the same artifact the streams produce.)"""
    from collections import Counter

    from trimet_bytes__data_engineering_project_spark.streaming.compaction import (
        compact_store,
        store_rows,
    )

    path = str(tmp_path_factory.mktemp("cstore"))
    truth: Counter = Counter()
    batches: list[list[tuple[int, int]]] = []

    def land(rows, bid):
        spark.createDataFrame(rows, "bin_idx int, cnt long").write.mode(
            "overwrite"
        ).parquet(f"{path}/hist/batch_id={bid}")

    for op, seed in [("land", 7)] + ops:  # force one initial landing
        if op == "land":
            rows = [(seed % 7, seed % 50 + 1), ((seed + 3) % 7, 3)]
            land(rows, len(batches))
            batches.append(rows)
            for b, c in rows:
                truth[b] += c
        elif op == "compact":
            compact_store(spark, path, "hist")
        else:  # replay0: batch 0 re-lands verbatim under its old batch_id
            land(batches[0], 0)

    rows, _ = store_rows(spark, path, "hist")
    got = {
        r["bin_idx"]: r["cnt"]
        for r in rows.groupBy("bin_idx").agg(F.sum("cnt").alias("cnt")).collect()
    }
    assert got == dict(truth)


@given(
    st.lists(
        st.integers(min_value=0, max_value=3 * 86_400 * 1_000_000),
        min_size=2,
        max_size=30,
    ),
    st.lists(st.integers(min_value=1, max_value=29), min_size=0, max_size=2),
    st.integers(min_value=0, max_value=2),  # compact after this many batches
    st.integers(min_value=0, max_value=2),  # through_day = epoch day N
    st.booleans(),
)
@SETTINGS
def test_outage_day_compaction_serves_truth(
    spark, tmp_path_factory, times, cuts, compact_after, through_epoch_day, with_ids
):
    """Property form of compact_outage_day (round 13): for ANY
    event-time feed split into time-ordered batches, ANY compaction
    point mid-stream, ANY day cutoff (including a day still receiving
    later segments — they chain against the consolidated row), both
    store variants, the serve after day-compaction plus a fresh-
    checkpoint replay of batch 0 is bit-equal to the fresh fold over
    every batch ever landed."""
    import datetime
    from functools import reduce

    from trimet_bytes__data_engineering_project_spark.streaming.compaction import (
        compact_outage_day,
    )
    from trimet_bytes__data_engineering_project_spark.streaming.stats import (
        outage_from_segments,
        outage_from_segments_with_ids,
        outage_from_store,
        outage_from_store_with_ids,
        outage_segments,
        outage_segments_with_ids,
    )

    ordered = sorted(times)
    rows = [(t, i) for i, t in enumerate(ordered)]  # unique ids
    bounds = sorted({min(c, len(rows)) for c in cuts} | {0, len(rows)})
    batches = [rows[a:b] for a, b in zip(bounds, bounds[1:]) if b > a] or [rows]
    shard_us = 3_600_000_000

    seg_fn = outage_segments_with_ids if with_ids else outage_segments
    serve_store = outage_from_store_with_ids if with_ids else outage_from_store
    serve_segs = outage_from_segments_with_ids if with_ids else outage_from_segments

    def to_df(batch):
        return spark.createDataFrame(batch, "tus long, event_id long").select(
            "event_id", F.timestamp_micros(F.col("tus")).alias("ts")
        )

    union = lambda fs: reduce(lambda a, b: a.unionByName(b), fs)  # noqa: E731
    want = [
        tuple(r)
        for r in serve_segs(union([seg_fn(to_df(b), shard_us) for b in batches])).collect()
    ]

    store = str(tmp_path_factory.mktemp("ostore"))
    through = str(datetime.date(1970, 1, 1) + datetime.timedelta(days=through_epoch_day))
    compact_at = min(compact_after, len(batches) - 1)
    for i, b in enumerate(batches):
        seg_fn(to_df(b), shard_us).write.mode("overwrite").parquet(
            f"{store}/outage/batch_id={i}"
        )
        if i == compact_at:
            compact_outage_day(spark, store, through, with_ids=with_ids)
    # fresh-checkpoint replay: batch 0 re-lands verbatim at batch_id 0
    # (<= hwm after the compaction above, so the serve ignores it)
    seg_fn(to_df(batches[0]), shard_us).write.mode("overwrite").parquet(
        f"{store}/outage/batch_id=0"
    )
    got = [tuple(r) for r in serve_store(spark, store).collect()]
    assert got == want
