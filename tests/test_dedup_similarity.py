"""Semantic tests for the dedup + similarity operators: known duplicates
must be found, identical inputs must score 1.0, approximate indexes must
agree with the exact baseline on easy cases."""

from __future__ import annotations

from pyspark.sql import functions as F

from trimet_bytes__data_engineering_project_spark.operators.dedup import (
    exact_jaccard,
    minhash_candidates,
    minhash_estimate,
    shingles,
    simhash,
)
from trimet_bytes__data_engineering_project_spark.operators.multimodal import (
    extract_features,
    media_from_documents,
)
from trimet_bytes__data_engineering_project_spark.operators.similarity import (
    brute_force_topk,
    embedding_near_dup_pairs,
    ivf_topk,
    lsh_topk,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2, "the quick brown fox jumps over the lazy dog near the river bank"),  # exact dup
    (3, "the quick brown fox jumps over the lazy dog near the river delta"),  # near dup
    (4, "completely different words about spark sql engines and columnar storage"),
    (5, "ab"),  # shorter than one shingle
]


def _docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_minhash_finds_known_dups(spark):
    cands = minhash_candidates(_docs(spark)).withColumn(
        "est", minhash_estimate(F.col("a_sig"), F.col("b_sig"))
    )
    rows = {(r["a_id"], r["b_id"]): r["est"] for r in cands.collect()}
    assert rows[(1, 2)] == 1.0  # identical docs → identical signatures
    assert (1, 3) in rows and rows[(1, 3)] > 0.25  # near dup banded together
    assert (1, 4) not in rows  # unrelated doc shares no band


def test_exact_jaccard_values(spark):
    df = _docs(spark).select("doc_id", shingles(F.col("text")).alias("s"))
    a = df.filter("doc_id = 1").select(F.col("s").alias("sa"))
    for other, expected_full in ((2, True), (4, False)):
        b = df.filter(f"doc_id = {other}").select(F.col("s").alias("sb"))
        j = a.crossJoin(b).select(exact_jaccard(F.col("sa"), F.col("sb")).alias("j")).first()["j"]
        assert (j == 1.0) is expected_full


def test_short_doc_has_empty_shingles(spark):
    s = _docs(spark).filter("doc_id = 5").select(F.size(shingles(F.col("text"))).alias("n"))
    assert s.first()["n"] == 0  # no descending-sequence artifact


def test_column_and_dataframe_minhash_agree(spark):
    """The row-scoped fold and the explode+agg path must be the same hash
    scheme — byte-identical signatures."""
    from trimet_bytes__data_engineering_project_spark.operators.dedup import (
        minhash_signature,
        minhash_signatures,
        simhashes,
    )

    docs = _docs(spark)
    col_sigs = {
        r["doc_id"]: list(r["sig"]) if r["sig"] is not None else None
        for r in docs.select(
            "doc_id", minhash_signature(shingles(F.col("text"))).alias("sig")
        ).collect()
    }
    df_sigs = {r["doc_id"]: list(r["sig"]) for r in minhash_signatures(docs).collect()}
    for doc_id, sig in df_sigs.items():
        assert col_sigs[doc_id] == sig
    assert col_sigs[5] is None  # <1 shingle → NULL in column form, absent in DF form
    assert 5 not in df_sigs

    col_sh = {
        r["doc_id"]: r["sh"]
        for r in docs.select("doc_id", simhash(F.col("text")).alias("sh")).collect()
    }
    df_sh = {r["doc_id"]: r["simhash"] for r in simhashes(docs).collect()}
    assert col_sh == df_sh


def test_simhash_identical_and_different(spark):
    out = {r["doc_id"]: r["sh"] for r in _docs(spark).select("doc_id", simhash(F.col("text")).alias("sh")).collect()}
    assert out[1] == out[2]
    assert out[1] != out[4]
    assert 0 <= out[1] < (1 << 16)


def _emb(spark):
    import math

    def vec(seed):
        return [math.sin(seed * (j + 1)) for j in range(8)]

    rows = [(i, vec(i % 4 + 1), i % 2) for i in range(20)]
    return spark.createDataFrame(rows, ["vec_id", "embedding", "label"])


def test_brute_force_top1_is_self(spark):
    emb = _emb(spark)
    q = [float(v) for v in emb.filter("vec_id = 0").first()["embedding"]]
    top = brute_force_topk(emb, q, k=3).collect()
    assert top[0]["vec_id"] == 0 and abs(top[0]["cos_sim"] - 1.0) < 1e-12


def test_lsh_and_ivf_contain_query(spark):
    emb = _emb(spark)
    q = [float(v) for v in emb.filter("vec_id = 0").first()["embedding"]]
    lsh_ids = [r["vec_id"] for r in lsh_topk(emb, q, k=5).collect()]
    ivf_ids = [r["vec_id"] for r in ivf_topk(emb, q, k=5, n_centroids=4).collect()]
    assert 0 in lsh_ids  # query's own bucket contains it
    assert 0 in ivf_ids


def test_embedding_near_dup_blocked_by_label(spark):
    emb = _emb(spark)
    pairs = embedding_near_dup_pairs(emb, threshold=0.999999).collect()
    # vecs with equal seed (i%4) are identical → cos 1.0; only same-label pairs emitted
    assert pairs, "identical vectors must be found"
    labels = {r["a_id"] % 2 for r in pairs} | {r["b_id"] % 2 for r in pairs}
    for r in pairs:
        assert r["a_id"] % 2 == r["b_id"] % 2


def test_decontaminate_flags_ngram_overlap(spark):
    """A corpus doc sharing one 5-gram with the benchmark set is
    flagged; disjoint and too-short docs are not — and the plan is a
    broadcast left-semi join (no shuffle of corpus text)."""
    from trimet_bytes__data_engineering_project_spark.operators.dedup import decontaminate

    bench = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog")], ["doc_id", "text"]
    )
    corpus = spark.createDataFrame(
        [
            (10, "intro words then the quick brown fox jumps right out"),
            (11, "completely different tokens with no shared gram at all"),
            (12, "too short"),
        ],
        ["doc_id", "text"],
    )
    out = decontaminate(corpus, bench, n=5)
    assert {r["doc_id"] for r in out.collect()} == {10}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert "SortMergeJoin" not in plan


def test_repetition_ratio_exact_values(spark):
    from pyspark.sql import functions as F

    from trimet_bytes__data_engineering_project_spark.operators.textstats import (
        repetition_ratio_col,
    )

    df = spark.createDataFrame(
        [
            (1, "a b c a b c a b c"),  # 7 3-grams, 3 distinct → 4/7 repeated
            (2, "all five tokens are unique"),  # 3 distinct 3-grams → 0.0
            (3, "x y"),  # too short for a 3-gram → 0.0
        ],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: r["rr"]
        for r in df.select("doc_id", repetition_ratio_col(F.col("text")).alias("rr")).collect()
    }
    assert abs(got[1] - (1.0 - 3.0 / 7.0)) < 1e-15
    assert got[2] == 0.0 and got[3] == 0.0


def test_dedup_keep_representatives_policy(spark):
    """Pairwise removal: every pair drops its higher id; a chain a~b,
    b~c (a≁c) keeps only a — and the plan is a broadcast anti join
    (corpus never shuffled)."""
    from trimet_bytes__data_engineering_project_spark.operators.dedup import (
        dedup_keep_representatives,
    )

    docs = spark.createDataFrame([(i, f"d{i}") for i in range(5)], ["doc_id", "text"])
    pairs = spark.createDataFrame([(0, 1), (1, 2)], ["a_id", "b_id"])
    out = dedup_keep_representatives(docs, pairs)
    assert {r["doc_id"] for r in out.collect()} == {0, 3, 4}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_chunk_lines_fixed_stride(spark):
    from trimet_bytes__data_engineering_project_spark.operators.dedup import chunk_lines

    df = spark.createDataFrame(
        [(1, "a b c d e f g h i"), (2, "x y"), (3, "")], ["doc_id", "text"]
    )
    got = {
        r["doc_id"]: r["t"]
        for r in df.select("doc_id", chunk_lines(F.col("text"), 4).alias("t")).collect()
    }
    assert got[1] == "a b c d\ne f g h\ni"  # last chunk short
    assert got[2] == "x y"  # fewer tokens than one chunk
    assert got[3] == ""  # split("") → [""] → one empty chunk


def test_dedup_lines_removes_corpus_duplicates(spark):
    """Lines occurring >= min_dup times anywhere are removed from every
    doc; survivors keep original order; all-boilerplate docs vanish."""
    from trimet_bytes__data_engineering_project_spark.operators.dedup import dedup_lines

    df = spark.createDataFrame(
        [
            (1, "cookie banner\nunique alpha\ncookie banner\nunique beta"),
            (2, "cookie banner\nunique gamma"),
            (3, "cookie banner"),  # nothing survives → doc dropped
            (4, "solo line stays\nanother solo"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in dedup_lines(df).collect()}
    assert set(out) == {1, 2, 4}
    assert out[1]["clean_text"] == "unique alpha\nunique beta"  # order kept
    assert out[1]["n_lines_kept"] == 2
    assert out[2]["clean_text"] == "unique gamma"
    assert out[4]["clean_text"] == "solo line stays\nanother solo"


def test_tfidf_top_terms_exact_scores(spark):
    from trimet_bytes__data_engineering_project_spark.operators.textstats import (
        tfidf_top_terms,
    )

    df = spark.createDataFrame(
        [
            (1, "apple apple banana common"),
            (2, "banana cherry common"),
            (3, "common common cherry"),
        ],
        ["doc_id", "text"],
    )
    rows = tfidf_top_terms(df, k=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1: apple tf=2 df=1 → 2.0 beats banana (1/2) and common (1/3)
    top1 = by_doc[1][0]
    assert (top1["term"], top1["tf"], top1["df"], top1["score"]) == ("apple", 2, 1, 2.0)
    assert [r["term"] for r in by_doc[1]] == ["apple", "banana"]
    # doc 3: common tf=2 df=3 → 2/3 beats cherry 1/2
    assert [r["term"] for r in by_doc[3]] == ["common", "cherry"]
    assert all(len(v) == 2 for v in by_doc.values())


def test_redact_pii_and_counts(spark):
    from pyspark.sql import functions as F

    from trimet_bytes__data_engineering_project_spark.operators.textstats import (
        pii_counts,
        redact_pii,
    )

    df = spark.createDataFrame(
        [
            (1, "mail me at jo.doe+x@example.co.uk or call 503-555-1234"),
            (2, "see https://example.com/a?b=1 and http://x.io"),
            (3, "clean text with no identifiers"),
        ],
        ["doc_id", "text"],
    )
    rows = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id", redact_pii(F.col("text")).alias("red"), *pii_counts(F.col("text"))
        ).collect()
    }
    assert rows[1]["red"] == "mail me at <EMAIL> or call <PHONE>"
    assert rows[1]["n_email"] == 1 and rows[1]["n_phone"] == 1
    assert rows[2]["red"] == "see <URL> and <URL>" and rows[2]["n_url"] == 2
    assert rows[3]["red"] == "clean text with no identifiers"  # clean text untouched


def test_multimodal_feature_batch(spark):
    docs = spark.createDataFrame(
        [(1, "hello"), (2, ""), (3, "Ωmega")], ["doc_id", "text"]
    )
    feats = {r["media_id"]: r for r in extract_features(media_from_documents(docs)).collect()}
    assert feats[1]["byte_len"] == 5 and feats[1]["first_codepoint"] == ord("h")
    assert feats[2]["byte_len"] == 0 and feats[2]["first_codepoint"] == -1
    assert feats[3]["byte_len"] == 6  # Ω is 2 utf-8 bytes + 'mega'
    assert feats[3]["first_codepoint"] == ord("Ω")
    assert all(not r["decoded"] for r in feats.values())  # codec stubbed


def test_arrow_cosine_matches_fold_baseline(spark):
    """The Arrow/BLAS throughput variant ranks the same top-k set as the
    fold-exact baseline, with cosines equal to 1e-9 (summation-order
    difference only) — over the real embeddings table."""
    from trimet_bytes__data_engineering_project_spark.operators.similarity import (
        brute_force_topk_arrow,
    )
    from trimet_bytes__data_engineering_project_spark.plans.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    q = [float(v) for v in emb.filter("vec_id = 0").first()["embedding"]]
    fold = brute_force_topk(emb, q, k=10).collect()
    arrow = brute_force_topk_arrow(emb, q, k=10).collect()
    assert [r["vec_id"] for r in fold] == [r["vec_id"] for r in arrow]
    for f, a in zip(fold, arrow):
        assert abs(f["cos_sim"] - a["cos_sim"]) < 1e-9


def test_quantized_arrow_exactly_equals_fold(spark):
    """The int8 Arrow variant must be EXACTLY equal to the interpreted
    fold path — integer sums are order-independent, quantization is the
    same double expression, and the division is one IEEE op, so bitwise
    equality (not ≤ε) is the contract that keeps the driver oracle
    green on the fast path."""
    from trimet_bytes__data_engineering_project_spark.operators.similarity import (
        quantized_topk,
        quantized_topk_arrow,
    )
    from trimet_bytes__data_engineering_project_spark.plans.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    q = [float(v) for v in emb.filter("vec_id = 0").first()["embedding"]]
    fold = quantized_topk(emb, q, k=25).collect()
    arrow = quantized_topk_arrow(emb, q, k=25).collect()
    assert [(r["vec_id"], r["q_cos"]) for r in fold] == [
        (r["vec_id"], r["q_cos"]) for r in arrow
    ]


def test_multimodal_resize_and_frame_sample_plumbing(spark):
    """resize: 1:1 blob round-trip with the stub passthrough; frames:
    1→N executor-side fan-out, deterministic slice frames, ≤max_frames
    per blob, frame_idx dense from 0."""
    from trimet_bytes__data_engineering_project_spark.operators.multimodal import (
        media_from_documents,
        resize_images,
        sample_frames,
    )
    from trimet_bytes__data_engineering_project_spark.plans.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(50)
    media = media_from_documents(docs)
    n_media = media.count()

    resized = resize_images(media, 224, 224)
    rows = resized.collect()
    assert len(rows) == n_media
    assert all(r["target_w"] == 224 and not r["resized"] for r in rows)
    orig = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    assert all(bytes(r["payload"]) == orig[r["media_id"]] for r in rows)  # stub passthrough

    frames = sample_frames(media, max_frames=4).collect()
    per = {}
    for r in frames:
        per.setdefault(r["media_id"], []).append(r["frame_idx"])
    assert set(per) == set(orig)
    for mid, idxs in per.items():
        assert sorted(idxs) == list(range(len(idxs))) and len(idxs) <= 4
    # deterministic across runs
    again = sample_frames(media, max_frames=4).collect()
    assert sorted(map(tuple, frames)) == sorted(map(tuple, again))


def _tiny_png(w: int = 8, h: int = 6, rgb: tuple = (255, 0, 0)) -> bytes:
    """A valid solid-color PNG built with stdlib only (no PIL needed to
    GENERATE it, so this test runs in codec-less containers too)."""
    import struct
    import zlib

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit RGB
    raw = b"".join(b"\x00" + bytes(rgb) * w for _ in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_multimodal_real_codec_path_with_genuine_png(spark):
    """The codec gate on a REAL image payload: with PIL importable the
    decode flag flips true and resize produces an actually-resized PNG;
    without PIL the same genuine payload takes the documented stub path
    (decoded/resized False, payload passthrough).  Both branches of the
    degrade contract are asserted — whichever this container provides."""
    from trimet_bytes__data_engineering_project_spark.operators.multimodal import (
        extract_features,
        resize_images,
    )

    try:
        import PIL  # noqa: F401

        have_pil = True
    except ImportError:
        have_pil = False

    png = _tiny_png()
    media = spark.createDataFrame(
        [(1, "image", bytearray(png), (len(png), "image/png"))],
        "media_id long, media_type string, payload binary, "
        "meta struct<n_bytes: long, declared_format: string>",
    )

    feat = extract_features(media).collect()[0]
    assert feat["byte_len"] == len(png)
    assert feat["decoded"] is have_pil

    res = resize_images(media, 4, 3).collect()[0]
    assert res["resized"] is have_pil
    if have_pil:
        import io

        from PIL import Image

        img = Image.open(io.BytesIO(bytes(res["payload"])))
        assert img.size == (4, 3) and img.format == "PNG"
    else:
        assert bytes(res["payload"]) == png  # stub passthrough, bit-exact


def test_ivf_full_probe_equals_brute_force(spark):
    """nprobe = n_centroids probes every inverted list → identical
    result set to exact brute-force top-k (the recall dial's upper
    end); nprobe=1 returns a subset drawn from one list."""
    from trimet_bytes__data_engineering_project_spark.plans.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    q = [float(v) for v in emb.filter("vec_id = 0").first()["embedding"]]
    exact = [(r["vec_id"], r["cos_sim"]) for r in brute_force_topk(emb, q, k=5).collect()]
    full = [
        (r["vec_id"], r["cos_sim"])
        for r in ivf_topk(emb, q, k=5, n_centroids=8, nprobe=8).collect()
    ]
    assert full == exact


def test_contamination_fraction_values(spark):
    from trimet_bytes__data_engineering_project_spark.operators.dedup import (
        contamination_fraction,
    )

    bench = spark.createDataFrame([(100, "alpha beta gamma delta")], ["doc_id", "text"])
    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),  # both bench 3-grams present → 1.0
            (2, "alpha beta gamma nine ten"),  # grams: 3, matched: 1
            (3, "one two three four five"),  # no overlap → 0.0
            (4, "xy"),  # < n tokens → excluded
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in contamination_fraction(corpus, bench, n=3).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1]["contamination_frac"] == 1.0 and out[1]["n_matched"] == 2
    assert out[2]["n_grams"] == 3 and out[2]["n_matched"] == 1
    assert abs(out[2]["contamination_frac"] - 1 / 3) < 1e-15
    assert out[3]["contamination_frac"] == 0.0


def test_hashed_linear_score_formula_and_trained_weights(spark):
    """Score equals the hand-computed numpy reference; the explicit
    weights path (array-literal lookup — the trained-model form) with
    weights built from the same formula is bit-identical to the inline
    formula path; empty / letterless docs score exactly 0.0; and the
    plan is a pure projection (no shuffle, no join)."""
    import hashlib
    import re

    from pyspark.sql import functions as F

    from trimet_bytes__data_engineering_project_spark.operators.textstats import (
        HASH_DIM,
        hashed_linear_score,
        pseudo_weight,
    )

    rows = [
        (1, "The quick brown fox jumps over the lazy dog"),
        (2, "spark spark spark"),
        (3, ""),
        (4, "12345 !!! 678"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    def ref_score(text):
        toks = re.findall("[a-z]+", text.lower())
        if not toks:
            return 0.0
        s = sum(
            pseudo_weight(int(hashlib.md5(t.encode()).hexdigest()[:3], 16))
            for t in toks
        )
        return s / (len(toks) * 2048)

    out = df.select(
        "doc_id", hashed_linear_score(F.col("text")).alias("score")
    )
    got = {r["doc_id"]: r["score"] for r in out.collect()}
    for doc_id, text in rows:
        assert got[doc_id] == ref_score(text), (doc_id, got[doc_id], ref_score(text))

    weights = [pseudo_weight(i) for i in range(HASH_DIM)]
    got_w = {
        r["doc_id"]: r["score"]
        for r in df.select(
            "doc_id", hashed_linear_score(F.col("text"), weights).alias("score")
        ).collect()
    }
    assert got_w == got  # bit-identical, not approximately

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Join" not in plan


def test_incremental_dedup_probe_equals_full_rerun_restricted(spark, tmp_path):
    """Store docs 0-3, probe batch docs 4-7: the probe's pair set is
    exactly minhash_candidates over ALL docs restricted to pairs with
    a batch member — cross-batch near-dups caught, store-internal
    pairs excluded, store never re-signatured (probe reads parquet)."""
    from trimet_bytes__data_engineering_project_spark.operators.dedup import (
        incremental_dedup_probe,
        minhash_candidates,
        minhash_estimate,
        write_signature_store,
    )

    base = "the quick brown fox jumps over the lazy dog again and again "
    rows = [
        (0, base * 3),
        (1, base * 3 + "tail one"),          # near-dup of 0 (store-internal)
        (2, "completely different text about spark partitions and shuffles"),
        (3, "yet another unrelated document body entirely its own"),
        (4, base * 3 + "tail two"),          # near-dup of 0/1 (cross-batch)
        (5, "completely different text about spark partitions and shuffles!"),  # ~2
        (6, "a fresh new crawl document with novel content"),
        (7, "a fresh new crawl document with novel content plus more"),  # ~6 batch-internal
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    old, new = df.filter("doc_id < 4"), df.filter("doc_id >= 4")

    path = str(tmp_path / "store")
    write_signature_store(old, path)
    store = spark.read.parquet(path)
    got = {
        (r["a_id"], r["b_id"]): r["est_sim"]
        for r in incremental_dedup_probe(store, new, threshold=0.25).collect()
    }

    full = (
        minhash_candidates(df)
        .withColumn("est_sim", minhash_estimate(F.col("a_sig"), F.col("b_sig")))
        .filter(F.col("est_sim") >= 0.25)
    )
    want = {
        (r["a_id"], r["b_id"]): r["est_sim"]
        for r in full.collect()
        if r["a_id"] >= 4 or r["b_id"] >= 4
    }
    assert got == want
    assert any(a < 4 <= b for a, b in got)   # cross-batch pair exists
    assert any(a >= 4 and b >= 4 for a, b in got)  # batch-internal pair exists
    assert not any(a < 4 and b < 4 for a, b in got)  # no store-only pairs


def test_chunk_documents_exact_windows(spark):
    """Chunk boundaries, overlap, tail chunk, and empty-doc drop are
    exact; the plan is shuffle-free (generate inside the scan stage)."""
    from trimet_bytes__data_engineering_project_spark.operators.textstats import (
        chunk_documents,
    )

    docs = spark.createDataFrame(
        [(1, "abcdefgh"), (2, ""), (3, "xyz")], ["doc_id", "text"]
    )
    out = chunk_documents(docs, size=4, stride=3)
    rows = {(r["doc_id"], r["chunk_idx"]): r for r in out.collect()}
    # doc 1: offsets 0,3,6 → 'abcd','defg','gh'
    assert rows[(1, 0)]["chunk_text"] == "abcd" and rows[(1, 0)]["chunk_start"] == 0
    assert rows[(1, 1)]["chunk_text"] == "defg"
    assert rows[(1, 2)]["chunk_text"] == "gh" and rows[(1, 2)]["chunk_len"] == 2
    # overlap: last char of chunk k is first char of chunk k+1 (size-stride=1)
    assert rows[(1, 0)]["chunk_text"][-1] == rows[(1, 1)]["chunk_text"][0]
    # empty doc → no chunks; doc 3 shorter than size → single chunk
    assert {k[0] for k in rows} == {1, 3}
    assert rows[(3, 0)]["chunk_text"] == "xyz" and rows[(3, 0)]["chunk_len"] == 3
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure projection+generate, no shuffle


def test_chunk_documents_rejects_bad_stride(spark):
    import pytest as _pytest

    from trimet_bytes__data_engineering_project_spark.operators.textstats import (
        chunk_documents,
    )

    docs = spark.createDataFrame([(1, "abc")], ["doc_id", "text"])
    with _pytest.raises(ValueError):
        chunk_documents(docs, size=3, stride=4)
    with _pytest.raises(ValueError):
        chunk_documents(docs, size=3, stride=0)


def test_unigram_surprisal_exact(spark):
    """Hand-computed integer surprisal on a 3-doc corpus: common terms
    contribute small ratios, rare terms large ones; letterless docs
    drop out; repartitioning does not change a single value."""
    from trimet_bytes__data_engineering_project_spark.operators.textstats import (
        unigram_surprisal,
    )

    docs = spark.createDataFrame(
        [
            (1, "the the the rare"),  # the:3, rare:1
            (2, "the common common"),  # the:1, common:2
            (3, "123 456"),  # letterless → dropped
        ],
        ["doc_id", "text"],
    )
    # corpus: n_total=7; c(the)=4, c(rare)=1, c(common)=2
    # doc1: 3*(7 div 4) + 1*(7 div 1) = 3*1 + 7 = 10; n=4 → 2.5
    # doc2: 1*(7 div 4) + 2*(7 div 2) = 1 + 6 = 7; n=3 → 7/3
    out = unigram_surprisal(docs)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert set(rows) == {1, 2}
    assert rows[1]["surprisal_sum"] == 10 and rows[1]["n_tokens"] == 4
    assert rows[1]["avg_surprisal"] == 2.5
    assert rows[2]["surprisal_sum"] == 7 and rows[2]["n_tokens"] == 3
    assert rows[2]["avg_surprisal"] == 7.0 / 3.0
    re_out = unigram_surprisal(docs.repartition(7, "doc_id"))
    assert {tuple(r) for r in re_out.collect()} == {tuple(r) for r in out.collect()}


def test_bloom_decontaminate_equals_exact(spark):
    """Bloom prefilter + exact confirm ≡ plain decontaminate (no false
    negatives by construction); a disjoint corpus flags nothing; the
    bitmap words are valid signed int64s even with high bits set."""
    from pyspark.sql import functions as F

    from trimet_bytes__data_engineering_project_spark.operators.dedup import (
        bloom_bitmap,
        bloom_decontaminate,
        decontaminate,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    corpus = docs.filter(F.col("doc_id") >= 20)
    bench = docs.filter(F.col("doc_id") < 20)
    a = sorted(r["doc_id"] for r in bloom_decontaminate(corpus, bench, n=5).collect())
    b = sorted(r["doc_id"] for r in decontaminate(corpus, bench, n=5).collect())
    assert a == b and len(a) > 0
    clean = spark.createDataFrame(
        [(i, " ".join(f"tok{i}w{j}" for j in range(30))) for i in range(100, 130)],
        ["doc_id", "text"],
    )
    assert bloom_decontaminate(clean, bench, n=5).count() == 0
    # tiny bitmap: exactly k bits per distinct gram, all words in int64 range
    one = spark.createDataFrame([(1, "a b c d e")], ["doc_id", "text"])
    words = bloom_bitmap(one, n=5, m_bits=256, k=3)
    assert len(words) == 4
    assert all(-(1 << 63) <= w < (1 << 63) for w in words)
    assert sum(bin(w & ((1 << 64) - 1)).count("1") for w in words) <= 3


def test_bloom_bitmap_validation(spark):
    import pytest as _pytest

    from trimet_bytes__data_engineering_project_spark.operators.dedup import bloom_bitmap

    one = spark.createDataFrame([(1, "a b c d e")], ["doc_id", "text"])
    with _pytest.raises(ValueError):
        bloom_bitmap(one, m_bits=100)  # not a multiple of 64
    with _pytest.raises(ValueError):
        bloom_bitmap(one, k=5)


def test_random_projection_exact_and_partition_invariant(spark):
    """Each projected component equals a Python sequential-fold dot
    product bit-for-bit, and repartitioning changes nothing (pure
    per-row projection)."""
    from trimet_bytes__data_engineering_project_spark.operators.similarity import (
        hyperplanes,
        random_projection,
    )

    vecs = [(i, [float((i * 7 + j) % 5) - 2.0 for j in range(16)]) for i in range(10)]
    emb = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    out = random_projection(emb, dim=16, out_dim=4)
    got = {(r["vec_id"], r["dim_idx"]): r["value"] for r in out.collect()}
    assert len(got) == 40
    planes = hyperplanes(4, 16, seed="rp")
    for i, v in vecs:
        for j, p in enumerate(planes):
            acc = 0.0
            for x, y in zip(v, p):
                acc = acc + (x * y)
            assert got[(i, j)] == acc, (i, j)
    re_out = random_projection(emb.repartition(5, "vec_id"), dim=16, out_dim=4)
    assert {tuple(r) for r in re_out.collect()} == {tuple(r) for r in out.collect()}


def test_novelty_score_oov_ceiling(spark):
    """OOV terms score at the ceiling (n_total), seen terms at
    n_total div c; a doc of pure base boilerplate scores the minimum,
    a doc of unseen vocabulary the maximum."""
    from trimet_bytes__data_engineering_project_spark.operators.textstats import (
        novelty_score,
    )

    base = spark.createDataFrame(
        [(1, "the the the cat"), (2, "the dog")], ["doc_id", "text"]
    )
    # base: the:4, cat:1, dog:1 → n_total=6
    batch = spark.createDataFrame(
        [
            (10, "the the"),        # 2*(6 div 4)=2, n=2 → 1.0 (min possible)
            (11, "zebra quark"),    # 2*6=12, n=2 → 6.0 (OOV ceiling)
            (12, "cat zebra"),      # 6+6=12? cat: 6 div 1=6, zebra: 6 → 12, n=2 → 6.0
        ],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in novelty_score(batch, base).collect()}
    assert rows[10]["novelty_sum"] == 2 and rows[10]["avg_novelty"] == 1.0
    assert rows[11]["novelty_sum"] == 12 and rows[11]["avg_novelty"] == 6.0
    assert rows[12]["novelty_sum"] == 12


def test_kneser_ney_hand_computed(spark):
    """Every KN branch pinned on a hand-built corpus.  Base
    ['a b','a b','a c','d b'] → c2={ab:2, ac:1, db:1}, c1p={a:3, d:1},
    n1p={a:2, d:1}, ncont={b:2, c:1}, nt=3, S=2·(3+1)=8.  Hand values:

    - 'a b' (discounted hit + λ·cont): (8·(2·2−1))//(2·3)=4 plus
      (8·2·2)//(2·3·3)=1, +1 floor → p=6 → inst = 8//6 = 1
    - 'a c' (count-1 hit shows the discount: 2c−1 = 1):
      (8·1)//6=1, cont (8·2·1)//18=0 → p=2 → inst=4
    - 'd b' (rarer history, STRONGER continuation: ncont(b)=2):
      (8·1)//2=4, cont (8·1·2)//(2·1·3)=2 → p=7 → inst=1
    - 'a z' (seen history, unseen continuation): cont term 0 → p=1
      → inst=8 — the ceiling, where JM would also give w2 no credit
    - 'z b' (UNSEEN history, seen continuation — the KN signature):
      pure continuation (8·2)//3=5 → p=6 → inst=1: 'b' keeps its
      two-context continuation credit even after an unknown word
    - 'z z' (full OOV): p=1 → inst = S = 8"""
    from trimet_bytes__data_engineering_project_spark.operators.textstats import (
        kneser_ney_surprisal,
    )

    base = spark.createDataFrame(
        [(100, "a b"), (101, "a b"), (102, "a c"), (103, "d b")], ["doc_id", "text"]
    )
    batch = spark.createDataFrame(
        [
            (0, "a b"),    # inst 1
            (1, "a c"),    # inst 4
            (2, "d b"),    # inst 1
            (3, "a z"),    # inst 8
            (4, "z b"),    # inst 1
            (5, "z z z"),  # two 'z z' instances, inst 8 each
        ],
        ["doc_id", "text"],
    )
    got = {
        r.doc_id: (r.n_bigrams, r.surprisal_sum)
        for r in kneser_ney_surprisal(batch, base).collect()
    }
    assert got == {0: (1, 1), 1: (1, 4), 2: (1, 1), 3: (1, 8), 4: (1, 1), 5: (2, 16)}


def test_refresh_counts_bit_equal_to_rebuild(spark, tmp_path):
    """The incremental snapshot refresh is EXACT: merging a batch's
    count deltas into a persisted base snapshot equals recounting the
    full corpus bit-for-bit (counts are additive integers), through a
    real persisted lifecycle — write v0 from base, refresh with the
    batch delta into v1, read v1 back.  Covers all three row classes:
    base-only terms (untouched), overlapping terms (summed), and
    batch-only terms (inserted)."""
    from trimet_bytes__data_engineering_project_spark.operators.textstats import (
        refresh_counts,
        unigram_counts,
    )

    base = spark.createDataFrame(
        [(0, "the cat sat"), (1, "the dog the")], ["doc_id", "text"]
    )
    batch = spark.createDataFrame(
        [(2, "the zebra"), (3, "zebra quark zebra")], ["doc_id", "text"]
    )
    v0 = str(tmp_path / "counts_v0")
    v1 = str(tmp_path / "counts_v1")
    unigram_counts(base).write.parquet(v0)
    refresh_counts(
        spark.read.parquet(v0), unigram_counts(batch)
    ).write.parquet(v1)

    got = {r["term"]: r["c"] for r in spark.read.parquet(v1).collect()}
    want = {r["term"]: r["c"] for r in unigram_counts(base.union(batch)).collect()}
    assert got == want
    # all three row classes genuinely present
    assert "cat" in got and got["the"] == 4 and got["zebra"] == 3


def test_refreshed_snapshot_scores_like_rebuilt(spark):
    """Scoring against a refreshed snapshot equals scoring against a
    from-scratch rebuild — the x97 contract end-to-end: the snapshot a
    pipeline maintains incrementally is indistinguishable from the one
    it would recount."""
    from trimet_bytes__data_engineering_project_spark.operators.textstats import (
        refresh_counts,
        unigram_counts,
        unigram_surprisal,
    )

    day0 = spark.createDataFrame(
        [(i, f"alpha beta w{i} w{i}") for i in range(6)], ["doc_id", "text"]
    )
    day1 = spark.createDataFrame(
        [(10 + i, f"beta gamma w{i}") for i in range(4)], ["doc_id", "text"]
    )
    probe = spark.createDataFrame(
        [(100, "alpha gamma zebra w3")], ["doc_id", "text"]
    )
    refreshed = refresh_counts(unigram_counts(day0), unigram_counts(day1))
    rebuilt = unigram_counts(day0.union(day1))
    got = unigram_surprisal(probe, base_counts=refreshed).collect()
    want = unigram_surprisal(probe, base_counts=rebuilt).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want] and len(got) == 1


def test_cross_corpus_scorers_empty_base(spark):
    """Round-5 verdict defect, pinned deterministically: an EMPTY base
    corpus (first-day pipeline run, no snapshot yet) must score the
    documented OOV rule at N=0 — never NULL.  F.sum over an empty
    aggregate input is NULL and used to null-propagate through every
    cross-corpus integer expression; the coalesce-to-0 fix makes:
    novelty/unigram-snapshot score 0 (n_total div 1 with n_total=0),
    stupid backoff score PEN²·(N+1)=16, trigram JM the S=8·(N+1)=8
    ceiling, fourgram JM the S=16·(N+1)=16 ceiling."""
    from trimet_bytes__data_engineering_project_spark.operators.textstats import (
        fourgram_jm_surprisal,
        novelty_score,
        trigram_backoff_surprisal,
        trigram_jm_surprisal,
        unigram_counts,
        unigram_surprisal,
    )

    empty_base = spark.createDataFrame([(1, "")], ["doc_id", "text"])
    batch = spark.createDataFrame([(0, "a a a a")], ["doc_id", "text"])

    r = novelty_score(batch, empty_base).collect()[0]
    assert (r["n_tokens"], r["novelty_sum"]) == (4, 0)

    r = unigram_surprisal(batch, base_counts=unigram_counts(empty_base)).collect()[0]
    assert (r["n_tokens"], r["surprisal_sum"]) == (4, 0)

    r = trigram_backoff_surprisal(batch, empty_base).collect()[0]
    # 2 trigram instances, each PEN²·(N+1) = 16·1
    assert (r["n_trigrams"], r["surprisal_sum"]) == (2, 32)

    r = trigram_jm_surprisal(batch, empty_base).collect()[0]
    # 2 trigram instances, each the S = 8·(0+1) ceiling
    assert (r["n_trigrams"], r["surprisal_sum"]) == (2, 16)

    r = fourgram_jm_surprisal(batch, empty_base).collect()[0]
    # 1 fourgram instance at the S = 16·(0+1) ceiling
    assert (r["n_fourgrams"], r["surprisal_sum"]) == (1, 16)


def test_knn_join_bucket_blocked_topk(spark):
    """Each query gets <= k neighbors, all from its own sign bucket,
    ranked by exact cosine with c_id tiebreak; the plan is a bucket
    equi-join (no cartesian/nested-loop); repartitioning changes
    nothing."""
    from trimet_bytes__data_engineering_project_spark.operators.similarity import (
        hyperplanes,
        knn_join,
    )

    import random
    rng = random.Random(7)
    vecs = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(60)]
    emb = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    q = emb.filter("vec_id % 10 = 0")
    c = emb.filter("vec_id % 10 != 0")
    out = knn_join(q, c, dim=8, k=2, n_planes=3)
    rows = out.collect()
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r["q_id"], []).append(r)
    planes = hyperplanes(3, 8)
    def bucket(v):
        b = 0
        for p, pl in enumerate(planes):
            if sum(a * x for a, x in zip(v, pl)) > 0:
                b |= 1 << p
        return b
    vb = {i: bucket(v) for i, v in vecs}
    for q_id, nb in by_q.items():
        assert len(nb) <= 2
        ranks = sorted(r["rn"] for r in nb)
        assert ranks == list(range(1, len(nb) + 1))
        sims = [r["cos_sim"] for r in sorted(nb, key=lambda r: r["rn"])]
        assert sims == sorted(sims, reverse=True)
        for r in nb:
            assert vb[r["c_id"]] == vb[q_id]  # same-bucket only
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    re_out = knn_join(q.repartition(5), c.repartition(3), dim=8, k=2, n_planes=3)
    assert {tuple(r) for r in re_out.collect()} == {tuple(r) for r in rows}


def test_knn_join_multiprobe_recall_dial(spark):
    """radius=1 probes the bucket + every 1-bit flip: per-query best
    cosine is never worse than radius=0, pair set is a superset of the
    same-bucket pairs pre-top-k (checked via k large enough to keep
    all), and each (q, c) pair appears at most once."""
    import random

    from trimet_bytes__data_engineering_project_spark.operators.similarity import (
        knn_join,
    )

    rng = random.Random(11)
    vecs = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(80)]
    emb = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    q = emb.filter("vec_id % 10 = 0")
    c = emb.filter("vec_id % 10 != 0")
    r0 = knn_join(q, c, dim=8, k=1000, n_planes=3).collect()
    r1 = knn_join(q, c, dim=8, k=1000, n_planes=3, hamming_radius=1).collect()
    pairs0 = {(r["q_id"], r["c_id"]) for r in r0}
    pairs1 = {(r["q_id"], r["c_id"]) for r in r1}
    assert pairs0 <= pairs1 and len(pairs1) > len(pairs0)
    assert len(pairs1) == len(r1)  # no duplicate (q, c) pairs
    best0 = {}
    for r in r0:
        best0[r["q_id"]] = max(best0.get(r["q_id"], -2.0), r["cos_sim"])
    best1 = {}
    for r in r1:
        best1[r["q_id"]] = max(best1.get(r["q_id"], -2.0), r["cos_sim"])
    for qid, b in best0.items():
        assert best1[qid] >= b


def test_ann_recall_audit_full_probe_is_exact(spark):
    """Probing every bucket (radius = n_planes) makes approx == exact,
    so every sampled query must audit at recall 1.0; radius 1 is
    per-query >= radius 0 (the dial only adds candidates)."""
    import random

    from trimet_bytes__data_engineering_project_spark.operators.similarity import (
        ann_recall_audit,
    )

    rng = random.Random(3)
    vecs = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(60)]
    emb = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    q = emb.filter("vec_id % 10 = 0")
    c = emb.filter("vec_id % 10 != 0")
    full = ann_recall_audit(q, c, dim=8, k=2, n_planes=3, hamming_radius=3)
    assert all(r["recall"] == 1.0 for r in full.collect())
    r0 = {r["q_id"]: r["recall"] for r in
          ann_recall_audit(q, c, dim=8, k=2, n_planes=3).collect()}
    r1 = {r["q_id"]: r["recall"] for r in
          ann_recall_audit(q, c, dim=8, k=2, n_planes=3, hamming_radius=1).collect()}
    assert set(r0) == set(r1) and all(r1[k] >= r0[k] for k in r0)


def test_normalize_text_idempotent_and_exact(spark):
    """Hand-pinned normalization cases + idempotence (normalizing the
    normalized output changes nothing) for arbitrary messy input."""
    from pyspark.sql import functions as F

    from trimet_bytes__data_engineering_project_spark.operators.textstats import (
        normalize_text,
    )

    rows = [
        (1, "  Hello\t\tWORLD \n"),
        (2, "a\x00b\x1fc"),          # control chars stripped
        (3, "one  two\r\nthree"),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, ["id", "text"])
    out = {r["id"]: r["n"] for r in df.select("id", normalize_text(F.col("text")).alias("n")).collect()}
    assert out == {1: "hello world", 2: "abc", 3: "one two three", 4: ""}
    twice = {
        r["id"]: r["n2"]
        for r in df.select(
            "id", normalize_text(normalize_text(F.col("text"))).alias("n2")
        ).collect()
    }
    assert twice == out


def test_monitor_tier_semantics(spark):
    """x71/x74 on a crafted corpus: dup-rate counts exact text repeats
    per source; the cross-source profile counts how many sources carry
    each distinct text."""
    from pyspark.sql import functions as F

    from trimet_bytes__data_engineering_project_spark.plans.extensions import (
        x71_dedup_rate_by_source,
        x74_cross_source_dups,
    )
    from trimet_bytes__data_engineering_project_spark.plans.tables import _session_cache

    rows = [
        (1, "alpha", "en", "s1", 5),
        (2, "alpha", "en", "s1", 5),   # dup within s1
        (3, "beta", "en", "s1", 4),
        (4, "alpha", "en", "s2", 5),   # alpha syndicated to s2
        (5, "gamma", "en", "s2", 5),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source", "n_chars"])
    cache = _session_cache(spark)
    cache[("_monitor_fixture", "documents")] = docs
    try:
        dr = {r["source"]: r for r in x71_dedup_rate_by_source(spark, "_monitor_fixture").collect()}
        assert dr["s1"]["n_docs"] == 3 and dr["s1"]["n_exact_dups"] == 1
        assert dr["s1"]["dup_rate"] == 1.0 / 3.0
        assert dr["s2"]["n_exact_dups"] == 0
        prof = {r["n_sources"]: r["n_texts"] for r in
                x74_cross_source_dups(spark, "_monitor_fixture").collect()}
        # alpha spans 2 sources; beta and gamma 1 each
        assert prof == {2: 1, 1: 2}
    finally:
        del cache[("_monitor_fixture", "documents")]


def test_top_terms_count_min_pinned_to_exact(spark):
    """x72's documented sub-linear swap, now real: at width 16^4 the
    count-min sketch is collision-free over the fixture's top terms, so
    the approx path reproduces the exact top-20 BIT-FOR-BIT — both with
    every term as a candidate and with the 1/16 hash-threshold token
    sample (heavy terms survive any reasonable sample rate).  The
    candidate→sketch probe must be a broadcast join (the sketch is
    ≤ depth·width rows at any corpus scale)."""
    from trimet_bytes__data_engineering_project_spark.operators.textstats import top_terms
    from trimet_bytes__data_engineering_project_spark.plans.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    exact = [tuple(r) for r in top_terms(docs, approx=False, k=20).collect()]
    assert len(exact) == 20
    ap_full = top_terms(docs, approx=True, k=20, hex_digits=4, candidate_hex_lt=16)
    assert [tuple(r) for r in ap_full.collect()] == exact
    ap_sampled = top_terms(docs, approx=True, k=20, hex_digits=4, candidate_hex_lt=1)
    assert [tuple(r) for r in ap_sampled.collect()] == exact
    plan = ap_full._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_top_terms_count_min_one_sided_error(spark):
    """Structural CM guarantee under forced collisions: at width 16
    (far below the fixture vocabulary) every estimate is >= the true
    count — count-min NEVER undercounts.  (Ordering under such
    deliberate crowding is collision noise and carries no guarantee —
    only the one-sided bound does.)"""
    from trimet_bytes__data_engineering_project_spark.operators.textstats import top_terms
    from trimet_bytes__data_engineering_project_spark.plans.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    big = 1 << 30
    true_n = {r.term: r.n for r in top_terms(docs, approx=False, k=big).collect()}
    crowded = top_terms(docs, approx=True, k=big, hex_digits=1, candidate_hex_lt=16).collect()
    assert crowded, "sketch path returned nothing"
    assert all(r.n >= true_n[r.term] for r in crowded)


def test_bigram_surprisal_exact_values(spark):
    """Hand-computed corpus: docs0/1 are all common bigrams (every
    conditional is 1 → avg 1.0); doc2 introduces the rare 'a c' whose
    prefix 'a' is common (cp=3, cb=1 → surprisal 3).  Docs with < 2
    tokens drop."""
    from trimet_bytes__data_engineering_project_spark.operators.textstats import (
        bigram_surprisal,
    )

    df = spark.createDataFrame(
        [(0, "a b a b"), (1, "b a"), (2, "a c"), (3, "solo")],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r for r in bigram_surprisal(df).collect()}
    assert set(got) == {0, 1, 2}  # doc 3 has no bigram
    # corpus: cb('a b')=2, cb('b a')=2, cb('a c')=1; cp('a')=3, cp('b')=2
    assert (got[0].n_bigrams, got[0].surprisal_sum) == (3, 2 * (3 // 2) + 1 * (2 // 2))
    assert (got[1].n_bigrams, got[1].surprisal_sum) == (1, 1)
    assert (got[2].n_bigrams, got[2].surprisal_sum) == (1, 3)
    assert got[2].avg_surprisal == 3.0
    # word-order sensitivity: same unigrams, scrambled order -> the
    # scrambled doc's bigrams are corpus-rare and score strictly higher
    df2 = spark.createDataFrame(
        [(i, "the quick brown fox jumps") for i in range(5)] + [(9, "fox the jumps quick brown")],
        ["doc_id", "text"],
    )
    s = {r.doc_id: r.avg_surprisal for r in bigram_surprisal(df2).collect()}
    assert s[9] > s[0]


def test_trigram_backoff_hand_computed(spark):
    """Every backoff level on a hand-built corpus: seen trigram scores
    the prefix/exact ratio; unseen trigram with seen trailing bigram
    pays x4; bigram miss with seen last unigram pays x16; full OOV hits
    the x16*(N+1) ceiling.  Docs with <3 tokens drop."""
    from trimet_bytes__data_engineering_project_spark.operators.textstats import (
        trigram_backoff_surprisal,
    )

    base = spark.createDataFrame(
        [(100, "a b c a b d"), (101, "y z w")], ["doc_id", "text"]
    )
    # base: N=9 unigrams; trigrams {a b c, b c a, c a b, a b d, y z w}
    batch = spark.createDataFrame(
        [
            (0, "a b c"),    # seen trigram: c3p('a b')=2 div c3=1 -> 2
            (1, "x y z"),    # trigram unseen; trailing bigram 'y z' seen: 4*(c2p('y')=1 div c2=1) = 4
            (2, "q r w"),    # bigram 'r w' unseen; unigram 'w' seen: 16*(9 div 1) = 144
            (3, "q r s"),    # full OOV: 16*(9+1) = 160
            (4, "a b"),      # too short -> dropped
        ],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r.surprisal_sum for r in trigram_backoff_surprisal(batch, base).collect()}
    assert got == {0: 2, 1: 4, 2: 144, 3: 160}


def test_dedup_spans_hand_computed(spark):
    """ExactSubstr covering mask on a hand-built corpus (n=3): cross-
    document coverage, the n-1 window edge (a token exactly n-1 after a
    dup-gram start is covered; the next token is not), within-document
    repeats, fully-duplicated docs surviving with EMPTY text, and
    sub-n docs keeping repeated tokens (shorter-than-n repeats are
    deliberately out of policy)."""
    from trimet_bytes__data_engineering_project_spark.operators.dedup import dedup_spans

    docs = spark.createDataFrame(
        [
            (1, "a b c d e"),        # shares 'a b c' with doc 2
            (2, "x a b c y"),        # cross-doc dup gram at pos 1
            (3, "p q r s p q r t"),  # within-doc repeat of 'p q r'
            (4, "m n o"),            # exact dup of doc 5 -> empty survivor
            (5, "m n o"),
            (6, "z z"),              # < n tokens: no grams, repeats kept
        ],
        ["doc_id", "text"],
    )
    got = {
        r.doc_id: (r.clean_text, r.n_tokens_kept, r.n_tokens_removed)
        for r in dedup_spans(docs, n=3).collect()
    }
    assert got == {
        # start at pos 0 covers pos 0..2; pos 3 ('d') is the window edge -> kept
        1: ("d e", 2, 3),
        2: ("x y", 2, 3),
        3: ("s t", 2, 6),
        4: ("", 0, 3),
        5: ("", 0, 3),
        6: ("z z", 2, 0),
    }


def test_trigram_jm_hand_computed(spark):
    """Interpolation weights pinned exactly on a hand-built corpus
    (S = 8*(N+1) = 80 with N=9 base tokens): a fully-seen trigram sums
    all four fixed-point terms (20+10+1+1 -> inst 80 div 32 = 2); a
    bigram-level hit sums three (20+1+1 -> 3); a unigram-only hit two
    (1+1 -> 40); full OOV just the lambda0 floor (1 -> the S=80
    ceiling).  Docs with <3 tokens drop."""
    from trimet_bytes__data_engineering_project_spark.operators.textstats import (
        trigram_jm_surprisal,
    )

    base = spark.createDataFrame(
        [(100, "a b c a b d"), (101, "y z w")], ["doc_id", "text"]
    )
    batch = spark.createDataFrame(
        [(0, "a b c"), (1, "x y z"), (2, "q r w"), (3, "q r s"), (4, "a b")],
        ["doc_id", "text"],
    )
    got = {
        r.doc_id: r.surprisal_sum
        for r in trigram_jm_surprisal(batch, base).collect()
    }
    assert got == {0: 2, 1: 3, 2: 40, 3: 80}
    # interpolation, not backoff: the seen-trigram score benefits from the
    # lower orders (stupid backoff gives doc 0 exactly c3p div c3 = 2 as
    # well here, but doc 1's backoff score would be 4, not 3 — the lower
    # orders pulled it down)
    assert got[1] < 4


def test_snapshot_probes_pinned_to_self_scored(spark):
    """The persisted-snapshot probe paths equal the self-scored paths
    exactly when the snapshot is built from the scored corpus itself
    (no OOV terms exist), and the OOV rules fire for unseen terms:
    tf-idf scores them at df=1, surprisal at the add-one ceiling."""
    import pandas as pd

    from trimet_bytes__data_engineering_project_spark.operators.textstats import (
        doc_frequencies,
        tfidf_top_terms,
        unigram_counts,
        unigram_surprisal,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

    def cmp(a, b):
        key = sorted(a.columns)
        a = a.toPandas().sort_values(key).reset_index(drop=True)[key]
        b = b.toPandas().sort_values(key).reset_index(drop=True)[key]
        pd.testing.assert_frame_equal(a, b, check_dtype=False)

    cmp(tfidf_top_terms(docs, k=3),
        tfidf_top_terms(docs, k=3, df_counts=doc_frequencies(docs)))
    cmp(unigram_surprisal(docs),
        unigram_surprisal(docs, base_counts=unigram_counts(docs)))

    base = spark.createDataFrame([(0, "a a a b")], ["doc_id", "text"])
    batch = spark.createDataFrame([(1, "a q")], ["doc_id", "text"])
    t = {
        r.term: (r.df, r.score)
        for r in tfidf_top_terms(batch, k=3, df_counts=doc_frequencies(base)).collect()
    }
    assert t["q"] == (1, 1.0) and t["a"] == (1, 1.0)  # base has one doc
    u = unigram_surprisal(batch, base_counts=unigram_counts(base)).collect()[0]
    # N=4; 'a' seen c=3 -> 4 div 3 = 1; 'q' OOV -> 4 div 1 = 4
    assert (u.n_tokens, u.surprisal_sum) == (2, 5)


def test_exact_jaccard_requires_distinct_inputs(spark):
    """exact_jaccard's inclusion-exclusion identity holds only for
    duplicate-free arrays (the documented contract): with shingles()
    (distinct) it equals hand-computed set Jaccard; feeding
    all_shingles() (repeats kept) deflates the score — the pinned
    evidence that the repeats-kept form is UNSUPPORTED, not an
    alternative."""
    from trimet_bytes__data_engineering_project_spark.operators.dedup import (
        all_shingles,
        exact_jaccard,
        shingles,
    )

    # 'a b a b a' has 3-gram multiset [aba, bab, aba] -> set {aba, bab};
    # 'a b a c a' -> {aba, bac, aca}; intersection {aba}, union size 4
    df = spark.createDataFrame([("a b a b a", "a b a c a")], ["x", "y"])
    good = df.select(
        exact_jaccard(shingles(F.col("x")), shingles(F.col("y"))).alias("j")
    ).first()["j"]
    assert good == 0.25
    bad = df.select(
        exact_jaccard(all_shingles(F.col("x")), all_shingles(F.col("y"))).alias("j")
    ).first()["j"]
    assert bad < good  # deflated -> out of contract, documented unsupported


def test_vocab_coverage_hand_computed(spark):
    """The crossing arithmetic pinned on a corpus small enough to do by
    hand: counts a:5 b:3 c:3 d:1 (N=12, thr=ceil(0.95*12)=12) — the
    95% point needs the WHOLE vocabulary including the crossing group's
    partial take; at 50% (thr=6) 'a' alone under-covers and one term of
    the c=3 group completes it (vocab 2, covered 8)."""
    from trimet_bytes__data_engineering_project_spark.operators.textstats import (
        vocab_coverage,
    )

    docs = spark.createDataFrame(
        [(0, "a a a b b c"), (1, "a a b c c d")], ["doc_id", "text"]
    )
    r = vocab_coverage(docs).collect()[0]
    assert (r.vocab_size, r.covered_tokens, r.total_tokens) == (4, 12, 12)
    r50 = vocab_coverage(docs, coverage_pct=50).collect()[0]
    assert (r50.vocab_size, r50.covered_tokens, r50.coverage) == (2, 8, 8 / 12)


def test_containment_asymmetry(spark):
    """Containment catches the embedded-quote case Jaccard under-ranks:
    a 3-token doc fully inside a 12-token doc has containment 1.0 in
    the small->large direction while Jaccard stays low."""
    from trimet_bytes__data_engineering_project_spark.operators.dedup import (
        containment,
        exact_jaccard,
        shingles,
    )

    small = "p q r s t"  # 3 distinct 3-grams, all inside big
    big = "a b c p q r s t u v w x"
    df = spark.createDataFrame([(small, big)], ["x", "y"])
    r = df.select(
        containment(shingles(F.col("x")), shingles(F.col("y"))).alias("c_ab"),
        containment(shingles(F.col("y")), shingles(F.col("x"))).alias("c_ba"),
        exact_jaccard(shingles(F.col("x")), shingles(F.col("y"))).alias("j"),
    ).collect()[0]
    assert r.c_ab == 1.0 and r.c_ba == 0.3 and r.j == 0.3


def test_fourgram_jm_hand_computed(spark):
    """All five interpolation levels pinned exactly (S = 16*(N+1) = 208
    with N=12 base tokens): full 4-gram hit sums 52+26+13+1+1 -> inst
    2; trailing-trigram hit 52+26+2+1 -> 2; bigram-level 26+1+1 -> 7;
    unigram-only 1+1 -> 104; full OOV 1 -> the S=208 ceiling.  Docs
    with <4 tokens drop."""
    from trimet_bytes__data_engineering_project_spark.operators.textstats import (
        fourgram_jm_surprisal,
    )

    base = spark.createDataFrame(
        [(100, "a b c d a b c e"), (101, "x y z w")], ["doc_id", "text"]
    )
    batch = spark.createDataFrame(
        [
            (0, "a b c d"),  # direct 4-gram hit
            (1, "q a b c"),  # trailing trigram 'a b c' seen
            (2, "q r z w"),  # trailing bigram 'z w' seen
            (3, "q r s w"),  # last unigram 'w' seen
            (4, "q r s t"),  # full OOV
            (5, "a b c"),    # too short -> dropped
        ],
        ["doc_id", "text"],
    )
    got = {
        r.doc_id: r.surprisal_sum
        for r in fourgram_jm_surprisal(batch, base).collect()
    }
    assert got == {0: 2, 1: 2, 2: 7, 3: 104, 4: 208}


def test_refresh_counts_broadcast_guard(spark):
    """Round-6 verdict item 4: the refresh's broadcast plan is only
    safe while the batch vocabulary is broadcast-sized, and the
    max_batch_keys guard now ENFORCES it — an over-threshold batch
    falls back to the rebuild-class shuffle merge.  Pins (a) bit-equal
    results on BOTH sides of the threshold (counts are additive either
    way), (b) the under-threshold plan broadcasts while the fallback
    plan does not, (c) max_batch_keys=None skips the guard count."""
    from trimet_bytes__data_engineering_project_spark.operators.textstats import (
        refresh_counts,
        unigram_counts,
    )

    base = spark.createDataFrame(
        [(0, "the cat sat"), (1, "the dog the")], ["doc_id", "text"]
    )
    batch = spark.createDataFrame(
        [(2, "the zebra"), (3, "zebra quark zebra")], ["doc_id", "text"]
    )
    snap, delta = unigram_counts(base), unigram_counts(batch)
    want = {r["term"]: r["c"] for r in unigram_counts(base.union(batch)).collect()}

    bcast = refresh_counts(snap, delta, max_batch_keys=1000)
    shuffle = refresh_counts(snap, delta, max_batch_keys=1)  # guard trips
    unguarded = refresh_counts(snap, delta, max_batch_keys=None)
    for df in (bcast, shuffle, unguarded):
        assert {r["term"]: r["c"] for r in df.collect()} == want

    bcast_plan = bcast._jdf.queryExecution().executedPlan().toString()
    shuffle_plan = shuffle._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in bcast_plan or "BroadcastNestedLoop" in bcast_plan
    assert "Broadcast" not in shuffle_plan  # fallback never broadcasts


def test_modified_kneser_ney_hand_pins(spark):
    """Every modified-KN branch pinned on a hand-built corpus, discounts
    hand-derived first: base bigram counts {a b:3, b a:2, c d:1, e f:2,
    f e:1, g h:4, h g:3} give nt=7, count-of-counts n1..n4 = 2,2,2,1 →
    yden=6, d1q=(64·2)//6=21, d2q=128−(192·2·2)//12=64,
    d3q=192−(256·2·1)//12=150 — three DISTINCT count-class discounts.
    S = 2·(nt+1) = 16.  Pins per batch doc (hand floor-division chains
    in comments):

    - "c d"  c2=1 → (16·(64−21))//64=10, λ-term 0        → p=11, inst 1
    - "b a"  c2=2 → (16·64)//128=8,  λ (16·64)//896=1    → p=10, inst 1
    - "g h"  c2=4 → (16·106)//256=6, λ (16·150)//1792=1  → p=8,  inst 2
    - "a z"  seen history, ncont(z)=0 → p=1              → inst 16
    - "z b"  unseen history, ncont(b)=1 → (16·1)//7=2    → p=3,  inst 5
    - "z z"  full OOV                                    → ceiling 16
    - "a b"  c2=3 → (16·42)//192=3,  λ (16·150)//1344=1  → p=5,  inst 3
    - "c d c d" tf=2 on "c d" (2·1) + "d c" OOV (16)     → (3, 18)

    Second corpus pins the CLAMP boundary and the FALLBACK discount:
    base {p q:2, q p:1} → n3=0 so d2q clamps to 128 (full discount —
    the seen-bigram term vanishes exactly) and d3q falls back to Q/2."""
    from trimet_bytes__data_engineering_project_spark.operators.textstats import (
        modified_kneser_ney_surprisal,
    )

    base = spark.createDataFrame(
        [(0, "a b a b a b"), (1, "c d"), (2, "e f e f"), (3, "g h g h g h g h")],
        ["doc_id", "text"],
    )
    batch = spark.createDataFrame(
        [(0, "c d"), (1, "b a"), (2, "g h"), (3, "a z"), (4, "z b"),
         (5, "z z"), (6, "a b"), (7, "c d c d")],
        ["doc_id", "text"],
    )
    got = {
        r.doc_id: (r.n_bigrams, r.surprisal_sum)
        for r in modified_kneser_ney_surprisal(batch, base).collect()
    }
    assert got == {0: (1, 1), 1: (1, 1), 2: (1, 2), 3: (1, 16), 4: (1, 5),
                   5: (1, 16), 6: (1, 3), 7: (3, 18)}

    base2 = spark.createDataFrame([(0, "p q p q")], ["doc_id", "text"])
    batch2 = spark.createDataFrame([(0, "p q"), (1, "q p")], ["doc_id", "text"])
    got2 = {
        r.doc_id: (r.n_bigrams, r.surprisal_sum)
        for r in modified_kneser_ney_surprisal(batch2, base2).collect()
    }
    # "p q": term1 = (6·(128−128))//... = 0 (full-discount clamp),
    #        λ = (6·128·1)//256 = 3 → p=4, inst 6//4=1
    # "q p": term1 = (6·43)//64 = 4, λ = (6·21·1)//128 = 0 → p=5, inst 1
    assert got2 == {0: (1, 1), 1: (1, 1)}


def test_trigram_kneser_ney_hand_pins(spark):
    """Every recursive-continuation branch of trigram KN pinned on a
    hand-built corpus: base trigram types {a b c:2, b c a:1, c a b:1,
    x b c:1} (nt3=4, S=20), suffix-continuation counts nc23{b c:2,
    c a:1, a b:1}, middle rollups nm2{b:2, c:1, a:1}, bigram table
    {a b:2, b c:3, c a:1, x b:1, m n:1} (ntb=5), unigram continuation
    nc3{b:2, c:1, a:1, n:1}.  Pins (hand chains in comments):

    - "a b c" seen trigram: 60//4=15 + λ·cont (20·1·3)//16=3
              + λ·λ·Pc 20//80=0                     → p=19, inst 1
    - "z b c" unseen history, cont seen: (20·3)//4=15
              + λ₂·Pc (20·1·1)//20=1                → p=17, inst 1
    - "z z c" middle unseen, unigram cont: (20·1)//5=4 → p=5, inst 4
    - "z z z" full OOV                              → ceiling 20
    - "x b a" history SEEN but suffix-bigram continuation unseen and
              λ·λ·Pc floors to 0: 20//40=0          → ceiling 20
    - "b c a" seen: 20//2=10 + (20·1·1)//4=5 + 20//20=1 → p=17, inst 1
    """
    from trimet_bytes__data_engineering_project_spark.operators.textstats import (
        trigram_kneser_ney_surprisal,
    )

    base = spark.createDataFrame(
        [(0, "a b c a b c"), (1, "x b c"), (2, "m n")], ["doc_id", "text"]
    )
    batch = spark.createDataFrame(
        [(0, "a b c"), (1, "z b c"), (2, "z z c"), (3, "z z z"),
         (4, "x b a"), (5, "b c a")],
        ["doc_id", "text"],
    )
    got = {
        r.doc_id: (r.n_trigrams, r.surprisal_sum)
        for r in trigram_kneser_ney_surprisal(batch, base).collect()
    }
    assert got == {0: (1, 1), 1: (1, 1), 2: (1, 4), 3: (1, 20),
                   4: (1, 20), 5: (1, 1)}


def test_kn_snapshot_probe_equals_in_flight(spark, tmp_path):
    """The KN family's snapshot-probe mode (persisted ngram_counts
    tables in place of the base corpus — the x85/x86 nightly-artifact
    contract) is bit-equal to the in-flight form on the same base, for
    all three scorers, through a real persisted round-trip.  This is
    the scale fix for the re-derivation multiplier: the in-flight form
    re-executes the corpus explode once per derived-table consumer
    (Spark materializes no shared sub-plans), the snapshot form pays
    vocabulary-sized scans only."""
    from trimet_bytes__data_engineering_project_spark.operators.textstats import (
        fourgram_jm_surprisal,
        kneser_ney_surprisal,
        modified_kneser_ney_surprisal,
        ngram_counts,
        trigram_backoff_surprisal,
        trigram_jm_surprisal,
        trigram_kneser_ney_surprisal,
    )

    base = spark.createDataFrame(
        [(0, "a b c a b c d"), (1, "x b c d e"), (2, "a b x y"), (3, "m n")],
        ["doc_id", "text"],
    )
    batch = spark.createDataFrame(
        [(10, "a b c d"), (11, "z b c d"), (12, "q q q q"), (13, "a b")],
        ["doc_id", "text"],
    )
    paths = {n: str(tmp_path / f"t{n}") for n in (1, 2, 3, 4)}
    for n, p in paths.items():
        ngram_counts(base, n).write.parquet(p)
    t = {n: spark.read.parquet(p) for n, p in paths.items()}

    for in_flight, snap in [
        (kneser_ney_surprisal(batch, base),
         kneser_ney_surprisal(batch, t2_counts=t[2])),
        (modified_kneser_ney_surprisal(batch, base),
         modified_kneser_ney_surprisal(batch, t2_counts=t[2])),
        (trigram_kneser_ney_surprisal(batch, base),
         trigram_kneser_ney_surprisal(batch, t3_counts=t[3], t2_counts=t[2])),
        (trigram_backoff_surprisal(batch, base),
         trigram_backoff_surprisal(
             batch, t3_counts=t[3], t2_counts=t[2], t1_counts=t[1])),
        (trigram_jm_surprisal(batch, base),
         trigram_jm_surprisal(
             batch, t3_counts=t[3], t2_counts=t[2], t1_counts=t[1])),
        (fourgram_jm_surprisal(batch, base),
         fourgram_jm_surprisal(
             batch, t4_counts=t[4], t3_counts=t[3],
             t2_counts=t[2], t1_counts=t[1])),
    ]:
        a = sorted(tuple(r) for r in in_flight.collect())
        b = sorted(tuple(r) for r in snap.collect())
        assert a == b and len(a) > 0

    import pytest

    with pytest.raises(ValueError):
        kneser_ney_surprisal(batch)
    with pytest.raises(ValueError):
        trigram_kneser_ney_surprisal(batch, t3_counts=t[3])  # half a snapshot
    with pytest.raises(ValueError):
        trigram_jm_surprisal(batch, t3_counts=t[3], t2_counts=t[2])
    with pytest.raises(ValueError):
        fourgram_jm_surprisal(batch, t4_counts=t[4])


def test_hard_negative_mining_hand_pin(spark):
    """Same-label near-duplicate is EXCLUDED (it would top a plain
    kNN); the cross-label candidates rank by cosine with the hardest
    first; max_sim ceiling drops the too-similar cross-label one."""
    from trimet_bytes__data_engineering_project_spark.operators.similarity import (
        hard_negative_mining,
    )

    base = [1.0, 0.0, 0.0, 0.0]
    rows = [
        (0, "a", base),                    # anchor
        (1, "a", [0.99, 0.1, 0.0, 0.0]),   # same label: never a negative
        (2, "b", [0.9, 0.4, 0.0, 0.0]),    # hard cross-label
        (3, "b", [0.0, 1.0, 0.0, 0.0]),    # easy cross-label
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "label", "embedding"])
    q = emb.filter("vec_id = 0")
    got = [(r.c_id, r.rn) for r in hard_negative_mining(q, emb, k=2).collect()]
    assert got == [(2, 1), (3, 2)]
    capped = [(r.c_id, r.rn) for r in
              hard_negative_mining(q, emb, k=2, max_sim=0.9).collect()]
    assert capped == [(3, 1)]  # doc 2's cos ~0.914 exceeds the ceiling


def test_contrastive_triplets_hand_pin(spark):
    """The positive is the nearest same-label vector excluding self;
    an anchor whose label has no other member yields NO rows (three-
    legged contract); the positive repeats per negative row."""
    from trimet_bytes__data_engineering_project_spark.operators.similarity import (
        contrastive_triplets,
    )

    rows = [
        (0, "a", [1.0, 0.0, 0.0, 0.0]),
        (1, "a", [0.9, 0.1, 0.0, 0.0]),
        (2, "b", [0.5, 0.5, 0.0, 0.0]),
        (3, "b", [0.0, 1.0, 0.0, 0.0]),
        (4, "c", [0.0, 0.0, 1.0, 0.0]),    # singleton label: no triplet
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "label", "embedding"])
    q = emb.filter("vec_id IN (0, 4)")
    got = [(r.q_id, r.pos_id, r.neg_id, r.rn) for r in
           contrastive_triplets(q, emb, n_neg=2).collect()]
    assert sorted(got) == [(0, 1, 2, 1), (0, 1, 3, 2)]


def test_mmr_rerank_prefers_diversity(spark):
    """Plain top-2 would be the two near-duplicate candidates; MMR's
    second pick is the geometrically distant one (rel - max-sim
    argmax), hand-checked: c3's 0.6 - 0.517 beats c2's 0.993 - ~1.0."""
    from trimet_bytes__data_engineering_project_spark.operators.similarity import (
        mmr_rerank,
    )

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),      # query
        (1, [0.99, 0.1, 0.0, 0.0]),     # top relevance
        (2, [0.98, 0.12, 0.0, 0.0]),    # near-dup of 1
        (3, [0.6, -0.8, 0.0, 0.0]),     # distant but relevant
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    q = emb.filter("vec_id = 0")
    got = [(r.c_id, r.mmr_rn) for r in
           mmr_rerank(q, emb, k=2, k_shortlist=3).orderBy("mmr_rn").collect()]
    assert got == [(1, 1), (3, 2)]
    # k beyond the candidate pool returns every candidate, in MMR order
    all3 = [(r.c_id, r.mmr_rn) for r in
            mmr_rerank(q, emb, k=5, k_shortlist=3).orderBy("mmr_rn").collect()]
    assert all3 == [(1, 1), (3, 2), (2, 3)]


# ---------------------------------------------------------------------------
# hashed importance weights (DSIR-style target affinity, x143)
# ---------------------------------------------------------------------------


def test_importance_weights_self_target_is_flat(spark):
    """target == raw corpus: every bucket's ratio is pt*scale div pt =
    scale exactly, so every doc scores avg_affinity == scale — the
    identity contract that makes the score a RELATIVE affinity."""
    from trimet_bytes__data_engineering_project_spark.operators.textstats import (
        hashed_importance_weights,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "delta epsilon"), (3, "alpha alpha")],
        "doc_id long, text string",
    )
    rows = hashed_importance_weights(docs, docs, scale=10**6).collect()
    assert len(rows) == 3
    for r in rows:
        assert r.affinity_sum == r.n_tokens * 10**6
        assert r.avg_affinity == 10**6


def test_importance_weights_target_tokens_score_higher(spark):
    """Docs made of the target's tokens outrank docs of tokens the
    target never uses (md5 buckets of 'aaa' and 'bbb' differ)."""
    from trimet_bytes__data_engineering_project_spark.operators.textstats import (
        hashed_importance_weights,
    )

    docs = spark.createDataFrame(
        [(1, "aaa aaa aaa"), (2, "bbb bbb bbb"), (3, "aaa bbb")],
        "doc_id long, text string",
    )
    target = spark.createDataFrame([(9, "aaa aaa aaa aaa")], "doc_id long, text string")
    got = {
        r.doc_id: r.avg_affinity
        for r in hashed_importance_weights(docs, target).collect()
    }
    assert got[1] > got[3] > got[2]


def test_importance_weights_empty_target_no_nulls(spark):
    """EMPTY target corpus (the round-5 falsifying-corpus convention):
    every raw doc still scores — pt falls to the add-one floor
    scale div (0 + 256), no NULL propagation, no division by zero."""
    from trimet_bytes__data_engineering_project_spark.operators.textstats import (
        hashed_importance_weights,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma")], "doc_id long, text string"
    )
    empty = docs.filter(F.col("doc_id") < 0)
    rows = hashed_importance_weights(docs, empty).collect()
    assert len(rows) == 2
    for r in rows:
        assert r.affinity_sum is not None and r.affinity_sum > 0
        assert r.avg_affinity is not None


def test_importance_weights_letterless_doc_dropped(spark):
    """A doc with no [a-z]+ tokens has no profile to score — absent
    from the output (unigram_surprisal's inner-join contract)."""
    from trimet_bytes__data_engineering_project_spark.operators.textstats import (
        hashed_importance_weights,
    )

    docs = spark.createDataFrame(
        [(1, "alpha"), (2, "12345 !!!")], "doc_id long, text string"
    )
    rows = hashed_importance_weights(docs, docs).collect()
    assert {r.doc_id for r in rows} == {1}


# ---------------------------------------------------------------------------
# Gopher quality rules (x148)
# ---------------------------------------------------------------------------


def test_gopher_rules_each_rule_fails_independently(spark):
    """One crafted doc per rule, failing exactly that rule (plus any
    rule its construction necessarily breaks) — pins the integer
    cross-multiplication forms."""
    from trimet_bytes__data_engineering_project_spark.operators.textstats import (
        gopher_quality_flags,
    )

    good = " ".join(["the", "of", "and"] + ["word"] * 60)
    docs = spark.createDataFrame(
        [
            (0, good),
            (1, "the of " + " ".join(["word"] * 10)),       # too few words
            (2, "the of " + " ".join(["a"] * 60)),          # mean len < 3
            (3, "the of " + " ".join(["123"] * 58) + " w"), # alpha < 80%
            (4, " ".join(["word"] * 60)),                   # no stopwords
            (5, good + "\nfoo...\nbar..."),                 # 2/3 lines ellipsis
            (6, "- a\n- b\n- c\n- d\n- e\n- f\n- g\n- h\n- i\n- j\n"
                + good),                                    # 10/11 bullet lines
            (7, "the of " + " ".join(["word"] * 58) + " # # # # # # #"),  # symbols
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.asDict() for r in gopher_quality_flags(docs).collect()}
    assert got[0]["passes"] == 1
    assert got[1]["r_word_count"] == 0 and got[1]["passes"] == 0
    assert got[2]["r_mean_word_len"] == 0 and got[2]["r_word_count"] == 1
    assert got[3]["r_alpha_words"] == 0
    assert got[4]["r_stopwords"] == 0 and got[4]["r_word_count"] == 1
    assert got[5]["r_ellipsis_lines"] == 0
    assert got[6]["r_bullet_lines"] == 0
    assert got[7]["r_symbol_ratio"] == 0
    for i in (2, 3, 5, 6, 7):
        assert got[i]["passes"] == 0


def test_gopher_rules_empty_doc(spark):
    """Empty text: n_words 0 fails the count rule, every ratio rule
    holds vacuously (0 <= 0), passes = 0, no NULLs anywhere."""
    from trimet_bytes__data_engineering_project_spark.operators.textstats import (
        gopher_quality_flags,
    )

    docs = spark.createDataFrame([(1, "")], "doc_id long, text string")
    r = gopher_quality_flags(docs).collect()[0]
    assert r.n_words == 0 and r.r_word_count == 0 and r.passes == 0
    assert None not in r.asDict().values()


def test_hashed_lang_id_separable_vocab(spark):
    """Two languages with disjoint vocabularies re-identify perfectly;
    a doc labeled 'xx' but written in 'yy' vocabulary is flagged."""
    from trimet_bytes__data_engineering_project_spark.operators.textstats import (
        hashed_lang_id,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma alpha", "xx"),
            (2, "alpha gamma beta beta", "xx"),
            (3, "uno dos tres uno dos", "yy"),
            (4, "dos tres uno tres", "yy"),
            (5, "uno dos tres dos uno", "xx"),  # mislabeled
        ],
        "doc_id long, text string, lang string",
    )
    got = {r.doc_id: (r.pred, r.agree) for r in hashed_lang_id(docs).collect()}
    assert got[1] == ("xx", 1) and got[2] == ("xx", 1)
    assert got[3] == ("yy", 1) and got[4] == ("yy", 1)
    assert got[5] == ("yy", 0)  # the audit catches the mislabel


def test_hashed_lang_id_letterless_absent(spark):
    from trimet_bytes__data_engineering_project_spark.operators.textstats import (
        hashed_lang_id,
    )

    docs = spark.createDataFrame(
        [(1, "alpha", "xx"), (2, "123 !!!", "xx")], "doc_id long, text string, lang string"
    )
    assert {r.doc_id for r in hashed_lang_id(docs).collect()} == {1}


def test_dup_ngram_stats_detects_repetition(spark):
    """A doc dominated by one repeated 2-gram fails r_top; a doc whose
    5-grams repeat fails r_dup; varied text passes; short docs pass
    vacuously with 0.0 fractions."""
    from trimet_bytes__data_engineering_project_spark.operators.textstats import (
        dup_ngram_stats,
    )

    spam = " ".join(["buy now"] * 20)                  # one 2-gram everywhere
    template = " ".join(["a b c d e"] * 6)             # repeated 5-grams
    varied = " ".join(f"w{i}" for i in range(30))
    docs = spark.createDataFrame(
        [(1, spam), (2, template), (3, varied), (4, "too short"), (5, "one")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.asDict() for r in dup_ngram_stats(docs).collect()}
    assert got[1]["r_top"] == 0 and got[1]["top_frac"] > 0.2
    assert got[2]["r_dup"] == 0 and got[2]["dup_frac"] > 0.15
    assert got[3]["r_top"] == 1 and got[3]["r_dup"] == 1
    assert got[3]["top_frac"] < 0.2 and got[3]["dup_frac"] == 0.0
    # a 2-word doc's single 2-gram IS the most frequent one: frac 1.0,
    # rule fails — faithful to Gopher, where the word-count gate runs
    # first; the 5-gram side is vacuous (no grams)
    assert got[4]["top_frac"] == 1.0 and got[4]["r_top"] == 0
    assert got[4]["dup_frac"] == 0.0 and got[4]["r_dup"] == 1
    # a 1-word doc is vacuous on BOTH sides
    assert got[5]["top_frac"] == 0.0 and got[5]["r_top"] == 1 and got[5]["r_dup"] == 1


def test_importance_snapshot_equals_inline(spark):
    """Scoring against a persisted ratio table == the inline
    two-corpus path (the snapshot-probe equality contract)."""
    from trimet_bytes__data_engineering_project_spark.operators.textstats import (
        hashed_importance_weights,
        importance_ratio_table,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta beta"), (2, "gamma delta"), (3, "alpha alpha")],
        "doc_id long, text string",
    )
    target = docs.filter(F.col("doc_id") == 1)
    inline = {
        r.doc_id: (r.n_tokens, r.affinity_sum)
        for r in hashed_importance_weights(docs, target).collect()
    }
    ratios = importance_ratio_table(docs, target)
    snap = {
        r.doc_id: (r.n_tokens, r.affinity_sum)
        for r in hashed_importance_weights(docs, ratios=ratios).collect()
    }
    assert inline == snap and len(inline) == 3
    import pytest

    with pytest.raises(ValueError):
        hashed_importance_weights(docs)
    with pytest.raises(ValueError):
        hashed_importance_weights(docs, target, ratios=ratios)


def test_semantic_dedup_flag_rule(spark):
    """SemDeDup keep-lowest-id contract on a hand-built corpus: within
    a cluster, a vector is flagged iff some LOWER-id member reaches
    tau; the lowest id of a dup family always survives, and a flagged
    member does NOT immunize later vectors (the rule is pairwise to
    earlier members, not to survivors only)."""
    from trimet_bytes__data_engineering_project_spark.operators.similarity import (
        semantic_dedup,
    )

    # two fixed clusters: ids 1-3 near-parallel (all pairwise cos=1.0
    # on the first axis), id 4 alone on the second axis
    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [2.0, 0.0]),
            (3, [0.5, 0.0]),
            (4, [0.0, 1.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    cents = spark.createDataFrame(
        [(10, [1.0, 0.0]), (20, [0.0, 1.0])], "centroid_id long, cvec array<double>"
    )
    got = {r.vec_id: r.asDict() for r in semantic_dedup(emb, cents, tau=0.9).collect()}
    assert got[1]["is_dup"] == 0 and got[1]["max_prior_sim"] == 0.0
    assert got[2]["is_dup"] == 1 and got[2]["max_prior_sim"] == 1.0
    assert got[3]["is_dup"] == 1  # flagged even though 2 is itself a dup
    assert got[4]["is_dup"] == 0 and got[4]["centroid_id"] == 20
    assert {r["centroid_id"] for k, r in got.items() if k < 4} == {10}


def test_semantic_dedup_below_threshold(spark):
    """Orthogonal members of one cluster never flag each other."""
    from trimet_bytes__data_engineering_project_spark.operators.similarity import (
        semantic_dedup,
    )

    emb = spark.createDataFrame(
        [(1, [1.0, 0.1]), (2, [0.1, 1.0])], "vec_id long, embedding array<float>"
    )
    cents = spark.createDataFrame([(0, [1.0, 1.0])], "centroid_id long, cvec array<double>")
    rows = semantic_dedup(emb, cents, tau=0.9).collect()
    assert all(r.is_dup == 0 and r.max_prior_sim == 0.0 for r in rows)


def test_pii_scan_counts_and_cascade(spark):
    """Pattern semantics + cascade order: an email is consumed before
    its digits could register as a digit run; counts come from the raw
    text; redaction replaces ALL occurrences."""
    from trimet_bytes__data_engineering_project_spark.operators.textstats import (
        pii_scan,
    )

    docs = spark.createDataFrame(
        [
            (1, "mail a9@x.io and b@y.co.uk here"),
            (2, "host 192.168.0.1 and 10.0.0.255 up"),
            (3, "call 12345678 or 999 short"),
            (4, "user1234567@ex.com"),  # 7-digit run INSIDE an email
            (5, "clean text only"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.asDict() for r in pii_scan(docs).collect()}
    assert got[1]["n_email"] == 2 and got[1]["n_ipv4"] == 0
    assert got[2]["n_ipv4"] == 2 and got[2]["n_email"] == 0
    assert got[3]["n_digitrun"] == 1  # 999 is below the 7-digit floor
    # digits embedded in a word ('user1234567') have no \b boundary, so
    # the raw-side digit-run count is 0; the cascade still redacts the
    # whole address as <EMAIL>
    assert got[4]["n_email"] == 1 and got[4]["n_digitrun"] == 0
    import hashlib

    assert got[4]["redacted_md5"] == hashlib.md5(b"<EMAIL>").hexdigest()
    assert got[5]["chars_delta"] == 0
    assert got[2]["redacted_len"] == len("host <IPV4> and <IPV4> up")


def test_vocab_growth_buckets(spark):
    """Hand-built Heaps curve: doubling doc-id buckets, each type
    charged to its FIRST doc's bucket, cumulative counts exact."""
    from trimet_bytes__data_engineering_project_spark.operators.textstats import (
        vocab_growth_curve,
    )

    # bucket(id) = floor(log2(id+1)): 0->0, 1->1, 2->1, 3->2, 7->3
    docs = spark.createDataFrame(
        [
            (0, "a b"),          # bucket 0: types a,b
            (1, "a c"),          # bucket 1: new type c
            (2, "b c d"),        # bucket 1: new type d
            (3, "a a e"),        # bucket 2: new type e
            (7, "a b c d e"),    # bucket 3: nothing new
        ],
        "doc_id long, text string",
    )
    got = {r.bucket: r.asDict() for r in vocab_growth_curve(docs).collect()}
    assert got[0]["n_new_types"] == 2 and got[0]["n_tokens"] == 2
    assert got[1]["n_new_types"] == 2 and got[1]["n_tokens"] == 5
    assert got[2]["n_new_types"] == 1 and got[2]["n_tokens"] == 3
    assert got[3]["n_new_types"] == 0 and got[3]["n_tokens"] == 5
    assert got[3]["cum_types"] == 5 and got[3]["cum_tokens"] == 15
    assert [got[b]["cum_types"] for b in (0, 1, 2, 3)] == [2, 4, 5, 5]


def test_semantic_dedup_pairs_only_path(spark):
    """semantic_dedup(assigned=...) over a persisted-index-shaped
    assignment == the inline path; exactly-one-of contract enforced."""
    import pytest

    from trimet_bytes__data_engineering_project_spark.operators.ann_index import (
        assign_to_centroids,
    )
    from trimet_bytes__data_engineering_project_spark.operators.similarity import (
        semantic_dedup,
    )

    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [2.0, 0.1]), (3, [0.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    cents = spark.createDataFrame(
        [(10, [1.0, 0.0]), (20, [0.0, 1.0])], "centroid_id long, cvec array<double>"
    )
    inline = {tuple(r) for r in semantic_dedup(emb, cents, tau=0.9).collect()}
    pre = assign_to_centroids(emb, cents, "embedding")
    via = {tuple(r) for r in semantic_dedup(emb, None, tau=0.9, assigned=pre).collect()}
    assert inline == via and len(inline) == 3
    with pytest.raises(ValueError):
        semantic_dedup(emb, cents, tau=0.9, assigned=pre)
    with pytest.raises(ValueError):
        semantic_dedup(emb, None, tau=0.9)


def test_zipf_histogram_buckets_and_decay(spark):
    """Hand corpus with known frequency octaves: counts 1,1,2,3,4,8 ->
    buckets 0:{1,1}, 1:{2,3}, 2:{4}, 3:{8}; decay ratios follow."""
    from trimet_bytes__data_engineering_project_spark.operators.textstats import (
        zipf_bucket_histogram,
    )

    text = " ".join(["a"] * 1 + ["b"] * 1 + ["c"] * 2 + ["d"] * 3 + ["e"] * 4 + ["f"] * 8)
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = {r.bucket: r.asDict() for r in zipf_bucket_histogram(docs).collect()}
    assert got[0]["n_types"] == 2 and got[0]["n_tokens"] == 2
    assert got[1]["n_types"] == 2 and got[1]["n_tokens"] == 5
    assert got[2]["n_types"] == 1 and got[2]["n_tokens"] == 4
    assert got[3]["n_types"] == 1 and got[3]["n_tokens"] == 8
    assert got[0]["ratio_fp"] == 1000  # 2 types -> 2 types
    assert got[1]["ratio_fp"] == 2000  # 2 -> 1: the s=1 line
    assert got[3]["ratio_fp"] == 0  # last bucket: no successor


def test_x166_served_equals_inline_assignment(spark):
    """The registered x166 (leakage matrix over the PERSISTED x21/x168
    IVF assignment) is row-equal to the inline form that assigns
    against the same deterministic first-16-by-id centroids without an
    index — the persisted-assignment reuse changes where the coarse
    quantization is paid, never the pair set (the r7-verdict
    re-registration keeps the inline twin pinned here)."""
    from pyspark.sql import functions as F

    from trimet_bytes__data_engineering_project_spark.operators.sampling import (
        train_val_test_split,
    )
    from trimet_bytes__data_engineering_project_spark.operators.similarity import (
        as_double_vec,
        semantic_pairs,
    )
    from trimet_bytes__data_engineering_project_spark.plans import QUERIES

    sf = "/root/testdata/sf0.001"
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    cents = (
        emb.orderBy("vec_id")
        .limit(16)
        .select(
            F.col("vec_id").alias("centroid_id"),
            as_double_vec("embedding").alias("cvec"),
        )
    )
    pairs = semantic_pairs(emb, cents, tau=0.35)
    sp = train_val_test_split(emb.select("vec_id"), "vec_id").select(
        "vec_id", "split"
    )
    a = sp.select(F.col("vec_id").alias("a_id"), F.col("split").alias("split_a"))
    b = sp.select(F.col("vec_id").alias("b_id"), F.col("split").alias("split_b"))
    want = sorted(
        tuple(r)
        for r in pairs.join(a, "a_id")
        .join(b, "b_id")
        .groupBy("split_a", "split_b")
        .agg(F.count("*").cast("long").alias("n_pairs"))
        .collect()
    )
    got = sorted(
        tuple(r)
        for r in QUERIES["x166_semantic_split_leakage"](spark, sf).collect()
    )
    assert got == want and len(got) > 0


def test_lang_snapshot_reid_separable_and_script_gate(spark):
    """The snapshot form of language re-ID: (a) disjoint-vocabulary
    languages re-identify perfectly from a persisted base profile and
    a mislabeled batch doc is flagged; (b) the SCRIPT prefilter
    excludes a cross-script language from the candidate set — a
    Cyrillic batch doc never scores against the Latin profile even
    when the Latin score would win numerically; (c) a doc whose script
    no profile covers predicts 'und'."""
    from pyspark.sql import functions as F

    from trimet_bytes__data_engineering_project_spark.operators.textstats import (
        lang_id_from_snapshot,
        lang_ratio_profiles,
        lang_script_masks,
    )

    base = spark.createDataFrame(
        [
            (1, "alpha beta gamma alpha", "xx"),
            (2, "alpha gamma beta beta", "xx"),
            (3, "uno dos tres uno dos", "yy"),
            (4, "dos tres uno tres", "yy"),
            (5, "привет мир привет", "ru"),
        ],
        "doc_id long, text string, lang string",
    )
    ratios = lang_ratio_profiles(base)
    masks = lang_script_masks(base)
    m = {r.lang: r.mask for r in masks.collect()}
    assert m["xx"] == 1 and m["yy"] == 1 and m["ru"] == 2  # latin / cyrillic

    batch = spark.createDataFrame(
        [
            (11, "alpha beta alpha gamma", "xx"),
            (12, "uno dos uno tres", "xx"),       # mislabeled -> yy
            (13, "привет мир мир", "ru"),         # cyrillic: xx/yy not candidates
            (14, "ελλαδα ωρα", "el"),              # greek: no profile -> und
        ],
        "doc_id long, text string, lang string",
    )
    got = {
        r.doc_id: (r.pred, r.agree)
        for r in lang_id_from_snapshot(batch, ratios, masks).collect()
    }
    assert got[11] == ("xx", 1)
    assert got[12] == ("yy", 0)
    # doc 13 tokenizes via LANG_WORD_PATTERN (the lang-ID family's
    # script-aware tokenizer — repo-wide [a-z]+ would blind the
    # operator to every non-Latin doc) and the script gate excludes
    # the Latin profiles outright
    assert got[13] == ("ru", 1)
    assert got[14] == ("und", 0)


def test_vector_hygiene_classifies_planted_pathologies(spark, tmp_path):
    """x182 on a corpus with planted pathologies: a zero vector, a NaN
    element, a +Inf element, and healthy vectors across two norm
    octaves — each lands in exactly one class, and a NaN norm² never
    leaks into the octave histogram."""
    import math
    import os

    from trimet_bytes__data_engineering_project_spark.plans import QUERIES

    rows = [
        (0, [1.0, 0.0, 0.0]),            # n2 = 1 -> octave of 2^20
        (1, [2.0, 0.0, 0.0]),            # n2 = 4 -> two octaves up
        (2, [0.0, 0.0, 0.0]),            # zero norm
        (3, [float("nan"), 1.0, 0.0]),   # nonfinite
        (4, [float("inf"), 1.0, 0.0]),   # nonfinite
        (5, [1.0, 1.0, 1.0]),            # n2 = 3
    ]
    d = str(tmp_path)
    spark.createDataFrame(rows, "vec_id long, embedding array<double>").write.parquet(
        os.path.join(d, "embeddings.parquet")
    )
    got = {
        (r.stat, r.k): r.n
        for r in QUERIES["x182_vector_hygiene"](spark, d).collect()
    }
    assert got[("total", 0)] == 6
    assert got[("zero_norm", 0)] == 1
    assert got[("nonfinite", 0)] == 2
    oct_counts = {k: n for (s, k), n in got.items() if s == "octave"}
    def octave(n2):
        return len(bin(math.floor(n2 * 1048576) + 1)) - 2 - 1  # bin() adds '0b'
    # n2 = 1, 3, 4 land in octaves 20, 21, 22 respectively — distinct
    assert oct_counts == {octave(1.0): 1, octave(3.0): 1, octave(4.0): 1}


def test_blob_near_dup_finds_planted_byte_neardups(spark):
    """blob_simhash/blob_near_dup (x186): an exact byte copy pairs at
    Hamming 0; a copy with a short byte suffix appended (a re-saved
    blob with a metadata stamp) stays within the radius — existing
    shingles are untouched, only a few new ones appear; every returned
    pair respects a_id < b_id and the radius; max_bucket=0 empties the
    result (the degenerate-bucket cap is live)."""
    from pyspark.sql import functions as F

    from trimet_bytes__data_engineering_project_spark.operators.multimodal import (
        blob_near_dup,
        blob_simhash,
        media_from_documents,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(60)
    media = media_from_documents(docs)
    # plant on the LONGEST blob: the stamp perturbs a fixed number of
    # shingles, so relative signature drift shrinks with blob size (a
    # 128-byte blob drifts ~5 bits, a 540-byte one ~1 — measured)
    base = media.orderBy(F.octet_length("payload").desc(), "media_id").first()
    bid = base.media_id
    planted = spark.createDataFrame(
        [
            (100000, bytes(base.payload)),                # exact byte copy
            (100001, bytes(base.payload) + b" v2-stamp"), # suffix-stamped copy
        ],
        "media_id long, payload binary",
    ).select("media_id", "payload")
    corpus = media.select("media_id", "payload").unionByName(planted)

    pairs = {
        (r.a_id, r.b_id): r.hamming for r in blob_near_dup(corpus).collect()
    }
    assert pairs[(bid, 100000)] == 0
    assert (bid, 100001) in pairs and pairs[(bid, 100001)] <= 3
    assert all(a < b for a, b in pairs)
    assert all(h <= 3 for h in pairs.values())

    # exact copies have IDENTICAL signatures (determinism + byte purity)
    sigs = {
        r.media_id: r.blob_sig
        for r in blob_simhash(corpus.filter(F.col("media_id").isin(bid, 100000))).collect()
    }
    assert sigs[bid] == sigs[100000]

    assert blob_near_dup(corpus, max_bucket=0).count() == 0

    # wide signatures (the corpus-sized blocking-key form the scale
    # bench uses): the digest-chained digit stream is a strict
    # EXTENSION — the low 32 bits of a 56-bit signature equal the
    # 32-bit signature, and exact copies still collide exactly
    s32 = {r.media_id: r.blob_sig for r in blob_simhash(corpus, bits=32).collect()}
    s56 = {r.media_id: r.blob_sig for r in blob_simhash(corpus, bits=56).collect()}
    assert all(s32[k] == (s56[k] & 0xFFFFFFFF) for k in s32)
    assert s56[bid] == s56[100000]


def test_blob_near_dup_banding_is_lossless_within_radius(spark):
    """Pigeonhole completeness of x186's banding: with radius < n_bands
    a true pair (Hamming ≤ 3 over 32 bits in 4×8-bit bands) MUST agree
    on at least one band, so the banded join finds EVERY such pair —
    pinned against a brute-force all-pairs popcount over the signature
    table (cap disabled to isolate the banding property)."""
    from pyspark.sql import functions as F

    from trimet_bytes__data_engineering_project_spark.operators.multimodal import (
        blob_near_dup,
        blob_simhash,
        media_from_documents,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    media = media_from_documents(docs)
    got = sorted(
        (r.a_id, r.b_id, r.hamming)
        for r in blob_near_dup(media, max_bucket=1 << 30).collect()
    )

    sigs = [(r.media_id, r.blob_sig) for r in blob_simhash(media).collect()]
    want = sorted(
        (a, b, bin(sa ^ sb).count("1"))
        for i, (a, sa) in enumerate(sigs)
        for b, sb in sigs[i + 1:]
        if bin(sa ^ sb).count("1") <= 3 and a < b
    ) + sorted(
        (b, a, bin(sa ^ sb).count("1"))
        for i, (a, sa) in enumerate(sigs)
        for b, sb in sigs[i + 1:]
        if bin(sa ^ sb).count("1") <= 3 and a > b
    )
    assert got == sorted(want) and len(got) > 0


def test_streaming_blob_dedup_matches_batch_and_replays(spark, tmp_path):
    """x186's lifecycle pair: two blob landings (a byte copy of a
    batch-1 blob planted in batch 2 — the cross-batch catch) produce a
    dup log whose unordered pairs equal the BATCH blob_near_dup over
    the union; the store accumulates per-batch band partitions; replay
    rewrites identical partitions (idempotent)."""
    import glob
    import os
    import shutil

    from pyspark.sql import functions as F

    from trimet_bytes__data_engineering_project_spark.operators.multimodal import (
        blob_near_dup,
        media_from_documents,
    )
    from trimet_bytes__data_engineering_project_spark.streaming.multimodal import (
        run_streaming_blob_dedup,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(80)
    media = media_from_documents(docs).select("media_id", "payload")
    base = media.orderBy(F.octet_length("payload").desc(), "media_id").first()
    gen_a = media.filter(F.col("media_id") % 2 == 0)
    gen_b = media.filter(F.col("media_id") % 2 == 1).unionByName(
        spark.createDataFrame(
            [(100000, bytes(base.payload))], "media_id long, payload binary"
        )
    )

    landing = str(tmp_path / "landing")
    os.makedirs(landing)

    def land_file(df, name):
        t = str(tmp_path / f"w_{name}")
        df.coalesce(1).write.parquet(t)
        shutil.move(glob.glob(f"{t}/part-*.parquet")[0], f"{landing}/{name}.parquet")

    store, log, ck = (str(tmp_path / d) for d in ("store", "log", "ck"))
    land_file(gen_a, "a")
    run_streaming_blob_dedup(spark, landing, store, log, ck)
    land_file(gen_b, "b")
    run_streaming_blob_dedup(spark, landing, store, log, ck)

    got = {
        (min(r.new_id, r.dup_of), max(r.new_id, r.dup_of)): r.hamming
        for r in spark.read.parquet(log).collect()
    }
    want = {
        (r.a_id, r.b_id): r.hamming
        for r in blob_near_dup(gen_a.unionByName(gen_b)).collect()
    }
    assert got == want and (base.media_id, 100000) in got
    assert got[(base.media_id, 100000)] == 0  # the cross-batch byte copy

    run_streaming_blob_dedup(spark, landing, store, log, ck)  # replay
    got2 = {
        (min(r.new_id, r.dup_of), max(r.new_id, r.dup_of)): r.hamming
        for r in spark.read.parquet(log).collect()
    }
    assert got2 == got

    # at-least-once ACROSS batch boundaries: the same media_id arriving
    # again in a LATER batch_id band-matches its own stored signature —
    # the new_id != old_id guard must drop that self-pair, and the pair
    # set must stay exactly the batch answer (re-delivery adds no rows)
    land_file(gen_b.filter(F.col("media_id") == 100000), "c")
    run_streaming_blob_dedup(spark, landing, store, log, ck)
    rows3 = spark.read.parquet(log).collect()
    assert all(r.new_id != r.dup_of for r in rows3)
    got3 = {
        (min(r.new_id, r.dup_of), max(r.new_id, r.dup_of)): r.hamming
        for r in rows3
    }
    assert got3 == got


def test_vector_literal_bit_equal_to_elementwise_lit(spark):
    """r14 optimization pin: vector_literal renders the array as SQL
    text (one py4j call instead of one per element — measured 1.02 s →
    0.01 s for 32 planes); the parsed literal must be BIT-EQUAL to the
    per-element ``F.lit`` it replaced, including exponent-form reprs
    (1e-300), negative zero, and subnormal-ish magnitudes."""
    from trimet_bytes__data_engineering_project_spark.operators.similarity import (
        hyperplanes,
        vector_literal,
    )

    cases = hyperplanes(4, 64) + [
        [1e-300, -4.6e-10, 0.5, float(2**-40), -0.0, 123456789.123456789]
    ]
    for vec in cases:
        old = F.lit([float(v) for v in vec])
        row = (
            spark.range(1)
            .select(old.alias("o"), vector_literal(vec).alias("n"))
            .collect()[0]
        )
        import struct

        assert [struct.pack("d", x) for x in row["o"]] == [
            struct.pack("d", x) for x in row["n"]
        ]
