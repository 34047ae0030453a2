"""BPE vocabulary-induction contracts: reference greedy semantics on
hand corpora (overlap runs, merge-then-recount dependence), the
Python-model property, and the empty/degenerate-document edge.  The
cross-engine x126 parity (windowed-run-parity SQL twin of the fold)
lives in test_oracle_parity.py."""

from __future__ import annotations

import pytest

from trimet_bytes__data_engineering_project_spark.operators.bpe import (
    apply_merge,
    bpe_learn,
    pair_counts,
    top_pair,
    word_symbol_arrays,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _py_apply(syms, a, b):
    out, i = [], 0
    while i < len(syms):
        if syms[i] == a and i + 1 < len(syms) and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def test_pair_counts_overlaps_and_ties(spark):
    # "aaa" contributes (a,a) twice (overlap counted, reference
    # semantics); "ab ab" contributes (a,b) twice across occurrences
    words = word_symbol_arrays(_docs(spark, ["aaa", "ab ab"]))
    got = {(r.a, r.b): r.cnt for r in pair_counts(words).collect()}
    assert got == {("a", "a"): 2, ("a", "b"): 2}
    # tie at cnt=2 broken by pair ascending: (a,a) < (a,b)
    assert top_pair(words) == ("a", "a", 2)


def test_apply_merge_overlap_run_greedy(spark):
    """Merging (a,a) into 'aaaa' gives [aa, aa]; into 'aaa' gives
    [aa, a]; into 'aaaaa' gives [aa, aa, a] — greedy left-to-right,
    never the overlapped [a, aa, a] family."""
    words = word_symbol_arrays(_docs(spark, ["aaaa aaa aaaaa"]))
    got = {r.wp: r.syms for r in apply_merge(words, "a", "a").collect()}
    assert got == {0: ["aa", "aa"], 1: ["aa", "a"], 2: ["aa", "aa", "a"]}


def test_apply_merge_flush_paths(spark):
    """pend-flush branches: an 'a' not followed by 'b' flushes; a run
    'aab' merges at the SECOND a (greedy takes (a,b)? no — greedy scans
    left: first a waits, sees a (not b) -> flush, second a waits, sees
    b -> merge)."""
    words = word_symbol_arrays(_docs(spark, ["aab axb ba a"]))
    got = {r.wp: r.syms for r in apply_merge(words, "a", "b").collect()}
    assert got == {
        0: ["a", "ab"],
        1: ["a", "x", "b"],
        2: ["b", "a"],
        3: ["a"],
    }


def test_bpe_learn_recount_dependence(spark):
    """Step 2's argmax is counted AFTER step 1's merge applies: corpus
    'abab abab' learns (a,b) first (cnt 4); the two-char symbol 'ab'
    then pairs with itself (cnt 2), which did not exist at step 1."""
    got = [
        (r.step, r.a, r.b, r.cnt)
        for r in bpe_learn(_docs(spark, ["abab abab"]), 2)
        .orderBy("step")
        .collect()
    ]
    assert got == [(1, "a", "b", 4), (2, "ab", "ab", 2)]


def test_bpe_learn_exhausted_corpus_stops_early(spark):
    # single-char words have no adjacent pairs after one merge
    got = [
        (r.step, r.a, r.b, r.cnt)
        for r in bpe_learn(_docs(spark, ["ab a b"]), 5).orderBy("step").collect()
    ]
    assert got == [(1, "a", "b", 1)]
    # and a corpus with no pairs at all yields an empty merge table
    assert bpe_learn(_docs(spark, ["a b c"]), 3).count() == 0


def test_empty_and_whitespace_docs(spark):
    words = word_symbol_arrays(_docs(spark, ["", "   ", "ok"]))
    rows = words.collect()
    # degenerate docs produce empty symbol arrays, never nulls
    assert all(r.syms is not None for r in rows)
    assert top_pair(words) == ("o", "k", 1)


@pytest.mark.parametrize(
    "corpus",
    [
        ["the cat sat on the mat", "the bat"],
        ["aa aab abab baba", "bbbb aaaa"],
        ["xyzzy plugh xyzzy", "plover plugh"],
    ],
)
def test_learn_matches_python_model(spark, corpus):
    """Full trainer vs a driver-side Python reference (same greedy
    apply, same tie order) for 3 merges."""
    words = {}
    for d, t in enumerate(corpus):
        for wp, w in enumerate(t.lower().split()):
            words[(d, wp)] = list(w)
    expect = []
    for step in range(1, 4):
        cnts: dict[tuple, int] = {}
        for syms in words.values():
            for i in range(len(syms) - 1):
                cnts[(syms[i], syms[i + 1])] = cnts.get((syms[i], syms[i + 1]), 0) + 1
        if not cnts:
            break
        (a, b), cnt = min(cnts.items(), key=lambda kv: (-kv[1], kv[0]))
        expect.append((step, a, b, cnt))
        words = {k: _py_apply(v, a, b) for k, v in words.items()}
    got = [
        (r.step, r.a, r.b, r.cnt)
        for r in bpe_learn(_docs(spark, corpus), 3).orderBy("step").collect()
    ]
    assert got == expect


def test_encode_priority_order(spark):
    """Rule order matters: on 'abc', table [(a,b), (ab,c)] yields
    ['abc']; table [(b,c), (a,b)] yields ['a','bc'] — rule 2 (a,b)
    never fires because rule 1 consumed the 'b'."""
    from trimet_bytes__data_engineering_project_spark.operators.bpe import bpe_encode

    words = word_symbol_arrays(_docs(spark, ["abc"]))
    got1 = bpe_encode(words, [("a", "b"), ("ab", "c")]).collect()[0].syms
    got2 = bpe_encode(words, [("b", "c"), ("a", "b")]).collect()[0].syms
    assert got1 == ["abc"] and got2 == ["a", "bc"]


def test_learn_then_encode_round_trip(spark):
    """Encoding with the learned table reproduces the trainer's final
    state: vocab histogram of encode(learn(corpus)) equals the
    histogram of the corpus the trainer left behind."""
    from trimet_bytes__data_engineering_project_spark.operators.bpe import (
        apply_merge as am,
        bpe_encode,
        vocab_histogram,
    )

    corpus = ["the cat sat on the mat", "that hat"]
    docs = _docs(spark, corpus)
    merges = [(r.a, r.b) for r in bpe_learn(docs, 3).orderBy("step").collect()]
    words = word_symbol_arrays(docs)
    via_encode = {
        (r.symbol, r.cnt)
        for r in vocab_histogram(bpe_encode(words, merges)).collect()
    }
    stepped = words
    for a, b in merges:
        stepped = am(stepped, a, b)
    via_train = {(r.symbol, r.cnt) for r in vocab_histogram(stepped).collect()}
    assert via_encode == via_train and len(via_encode) > 0


def test_apply_merge_pruned_identical(spark):
    """Pruned apply (affected-rows-only fold) is row-identical to the
    full fold, including the overlap-run and flush families."""
    from trimet_bytes__data_engineering_project_spark.operators.bpe import (
        apply_merge_pruned,
    )

    words = word_symbol_arrays(
        _docs(spark, ["aaaa aab axb ba a ok", "aaa abab"])
    )
    full = {(r.doc_id, r.wp): r.syms for r in apply_merge(words, "a", "a").collect()}
    pruned = {
        (r.doc_id, r.wp): r.syms
        for r in apply_merge_pruned(words, "a", "a").collect()
    }
    assert pruned == full


@pytest.mark.parametrize(
    "corpus",
    [
        ["the cat sat on the mat", "the bat"],
        ["aa aab abab baba", "bbbb aaaa"],
        ["abab abab", "ababab"],
    ],
)
def test_incremental_learn_bit_equal(spark, corpus):
    """Delta-maintained counts learn the IDENTICAL merge table (rules,
    order, counts) as the full-recount trainer, including overlap-run
    corpora where a merge changes its own pair's residual count."""
    from trimet_bytes__data_engineering_project_spark.operators.bpe import (
        bpe_learn_incremental,
    )

    docs = _docs(spark, corpus)
    full = [(r.step, r.a, r.b, r.cnt)
            for r in bpe_learn(docs, 4).orderBy("step").collect()]
    incr = [(r.step, r.a, r.b, r.cnt)
            for r in bpe_learn_incremental(docs, 4).orderBy("step").collect()]
    assert incr == full and len(full) > 0
