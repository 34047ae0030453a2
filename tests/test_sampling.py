"""Deterministic data-mixing operator contracts: split stability,
stratified rates, packing invariants, mixture shares.  (Cross-engine
value parity for x22-x25 is in test_oracle_parity.py.)
"""

from __future__ import annotations

from pyspark.sql import functions as F

from trimet_bytes__data_engineering_project_spark.operators.sampling import (
    domain_mixture,
    hex_threshold,
    pack_sequences,
    stratified_sample,
    train_val_test_split,
)


def test_hex_threshold_values():
    assert hex_threshold(0.8) == "cccc"
    assert hex_threshold(0.5) == "8000"
    # boundary clamps: 1.0 must keep ALL rows ('10000' would sort BELOW
    # prefixes starting '2'..'f' and silently keep ~1/16), 0.0 keeps none
    assert hex_threshold(1.0) == "g"
    assert "ffff" < hex_threshold(1.0)
    assert hex_threshold(0.0) == "0000"


def test_boundary_fractions_keep_all_rows(spark):
    df = spark.range(0, 1000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("fr").alias("lang"),
    )
    # stratified rate 1.0 == identity for that stratum
    assert stratified_sample(df, "doc_id", "lang", {"en": 1.0}).count() == 1000
    # train+val == 1.0: every row lands in train or val, none lost
    counts = {
        r["split"]: r["n"]
        for r in train_val_test_split(df, "doc_id", train=0.9, val=0.1)
        .groupBy("split")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert sum(counts.values()) == 1000
    assert counts.get("test", 0) == 0


def test_split_is_stable_and_exhaustive(spark):
    df = spark.range(0, 2000).select(F.col("id").alias("doc_id"))
    a = train_val_test_split(df, "doc_id")
    counts = {r["split"]: r["n"] for r in a.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    # ±5 pp of 80/10/10 on 2000 uniform hashes
    assert abs(counts["train"] / 2000 - 0.8) < 0.05
    assert abs(counts["val"] / 2000 - 0.1) < 0.05
    # determinism: same assignment on re-run
    b = train_val_test_split(df, "doc_id")
    assert a.collect() == b.collect()
    # growth stability: a doc's split never changes when the corpus grows
    grown = train_val_test_split(
        spark.range(0, 4000).select(F.col("id").alias("doc_id")), "doc_id"
    )
    old = {r["doc_id"]: r["split"] for r in a.collect()}
    new = {r["doc_id"]: r["split"] for r in grown.collect()}
    assert all(new[k] == v for k, v in old.items())


def test_stratified_sample_rates(spark):
    df = spark.range(0, 3000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "en").otherwise("fr").alias("lang"),
    )
    kept = stratified_sample(df, "doc_id", "lang", {"en": 0.25})
    counts = {r["lang"]: r["n"] for r in kept.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts["fr"] == 2000  # untouched stratum kept whole
    assert abs(counts["en"] / 1000 - 0.25) < 0.06
    # empty rates = identity
    assert stratified_sample(df, "doc_id", "lang", {}).count() == 3000


def test_pack_sequences_invariants(spark):
    df = spark.range(0, 500).select(
        F.col("id").alias("doc_id"), (F.col("id") % 97 + 1).alias("n_tokens")
    )
    packed = pack_sequences(df, "doc_id", "n_tokens", budget=100, n_shards=8)
    rows = packed.orderBy("shard", "doc_id").collect()
    for i in range(1, len(rows)):
        prev, cur = rows[i - 1], rows[i]
        if prev["shard"] == cur["shard"]:
            assert cur["pack_id"] >= prev["pack_id"]  # packs fill in doc order
            assert cur["running_tokens"] == prev["running_tokens"] + cur["n_tokens"]
    # every doc present exactly once, shard = id mod n
    assert len(rows) == 500
    assert all(r["shard"] == r["doc_id"] % 8 for r in rows)
    # a pack never spans more tokens than budget + one straddling doc
    agg = packed.groupBy("shard", "pack_id").agg(
        F.sum("n_tokens").alias("t"), F.max("n_tokens").alias("m")
    )
    assert all(r["t"] <= 100 + r["m"] for r in agg.collect())


def test_pack_sequences_floor_semantics_zero_token_doc(spark):
    """A zero-token document first in its shard has running_tokens-1 ==
    -1; floor division gives pack_id -1 (matching DuckDB `//`), where
    truncating `div` would give 0."""
    df = spark.createDataFrame([(0, 0), (8, 5)], "doc_id int, n_tokens int")
    packed = {r["doc_id"]: r["pack_id"] for r in pack_sequences(
        df, "doc_id", "n_tokens", budget=100, n_shards=8
    ).collect()}
    assert packed[0] == -1
    assert packed[8] == 0


def test_domain_mixture_shares_sum_to_one(spark):
    df = spark.createDataFrame(
        [("en", 10), ("en", 30), ("fr", 20), ("de", 40)], ["lang", "n_tokens"]
    )
    mix = {r["lang"]: r for r in domain_mixture(df, "lang", "n_tokens").collect()}
    assert mix["en"]["docs"] == 2 and mix["en"]["tokens"] == 40
    assert abs(sum(r["token_share"] for r in mix.values()) - 1.0) < 1e-12
    assert mix["de"]["token_share"] == 0.4


def test_cap_per_group_keeps_top_k_deterministically(spark):
    from trimet_bytes__data_engineering_project_spark.operators.sampling import cap_per_group

    df = spark.range(0, 300).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 3).cast("string").alias("host"),
        (F.col("id") % 7).alias("score"),
    )
    capped = cap_per_group(df, "host", [F.col("score").desc(), F.col("doc_id")], k=5)
    rows = capped.collect()
    assert len(rows) == 15
    per = {}
    for r in rows:
        per.setdefault(r["host"], []).append((r["score"], r["doc_id"]))
    for host, kept in per.items():
        assert len(kept) == 5
        # kept set = the first 5 under (score desc, id asc) computed naively
        naive = sorted(
            [(r["score"], r["doc_id"]) for r in df.filter(F.col("host") == host).collect()],
            key=lambda t: (-t[0], t[1]),
        )[:5]
        assert sorted(kept, key=lambda t: (-t[0], t[1])) == naive
    # determinism under re-run
    assert sorted(r["doc_id"] for r in capped.collect()) == sorted(r["doc_id"] for r in rows)


def test_rebalance_to_uniform_thins_to_min_group(spark):
    from trimet_bytes__data_engineering_project_spark.operators.sampling import (
        rebalance_to_uniform,
    )

    df = spark.range(0, 2200).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 2000, "en").when(F.col("id") < 2100, "fr").otherwise("de").alias("lang"),
    )
    kept = rebalance_to_uniform(df, "lang", "doc_id")
    counts = {r["lang"]: r["n"] for r in kept.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    # the smallest groups (fr=de=100) survive whole via the keep-all sentinel
    assert counts["fr"] == 100 and counts["de"] == 100
    # the dominant group is thinned to ~min_n (hash draw: ±40% tolerance on 100 expected)
    assert 60 <= counts["en"] <= 140
    # deterministic: identical kept set on re-run
    a = sorted(r["doc_id"] for r in kept.collect())
    b = sorted(r["doc_id"] for r in rebalance_to_uniform(df, "lang", "doc_id").collect())
    assert a == b


def test_percentile_filter_exact_and_approx(spark):
    import numpy as np

    from trimet_bytes__data_engineering_project_spark.operators.sampling import (
        percentile_filter,
    )

    vals = [(i, float((i * 37) % 1000)) for i in range(1000)]
    df = spark.createDataFrame(vals, "doc_id int, score double")
    exact = percentile_filter(df, "score", 0.25)
    thr = np.percentile(np.array([v for _, v in vals]), 25)  # same linear interpolation
    expected = {i for i, v in vals if v >= thr}
    assert {r["doc_id"] for r in exact.collect()} == expected
    # the scale path (mergeable sketch) agrees within sketch tolerance
    approx = percentile_filter(df, "score", 0.25, approx=True)
    n_exact, n_approx = exact.count(), approx.count()
    assert abs(n_approx - n_exact) <= 0.02 * len(vals)


def test_assign_shards_deterministic_and_stable(spark):
    """Shard = first md5 hex digit (0..15), a pure function of the id:
    identical across recomputation and unchanged when the corpus grows."""
    import hashlib

    from trimet_bytes__data_engineering_project_spark.operators.sampling import (
        assign_shards,
    )

    small = spark.range(0, 50).withColumnRenamed("id", "doc_id")
    big = spark.range(0, 200).withColumnRenamed("id", "doc_id")
    s_small = {r["doc_id"]: (r["shard"], r["sort_key"]) for r in assign_shards(small, "doc_id").collect()}
    s_big = {r["doc_id"]: (r["shard"], r["sort_key"]) for r in assign_shards(big, "doc_id").collect()}
    assert all(0 <= v[0] <= 15 for v in s_big.values())
    for k, v in s_small.items():  # growth never migrates a document
        assert s_big[k] == v
    for k, (shard, skey) in list(s_small.items())[:10]:  # matches stdlib md5
        expect = hashlib.md5(str(k).encode()).hexdigest()
        assert skey == expect and shard == int(expect[0], 16)


def test_select_token_budget_equals_naive_global_window(spark):
    """Two-phase (per-score prefix + per-score cumsum) ≡ the naive
    global running-sum filter, including a partially-taken score group
    and tie scores; cum_tokens is the global running total."""
    from pyspark.sql import Window

    from trimet_bytes__data_engineering_project_spark.operators.sampling import (
        select_token_budget,
    )

    rows = [(i, (i * 7) % 5 + 1, (i * 13) % 4) for i in range(40)]  # id, tokens, score
    df = spark.createDataFrame(rows, ["doc_id", "n_tokens", "score"])
    budget = 20  # top score group totals 30 tokens → cut mid-group
    got = {
        r["doc_id"]: r["cum_tokens"]
        for r in select_token_budget(df, "score", "doc_id", "n_tokens", budget).collect()
    }
    w = (
        Window.orderBy(F.desc("score"), "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    naive = {
        r["doc_id"]: r["cum"]
        for r in df.withColumn("cum", F.sum("n_tokens").over(w))
        .filter(F.col("cum") <= budget)
        .collect()
    }
    assert got == naive and len(got) > 0
    # the boundary score group must be partially taken for the test to bite
    taken_scores = {r[0] for r in df.filter(F.col("doc_id").isin(list(got))).select("score").collect()}
    boundary = min(taken_scores)
    n_at_boundary_total = df.filter(F.col("score") == boundary).count()
    n_at_boundary_taken = len(
        [i for i in got if dict((r["doc_id"], r["score"]) for r in df.collect())[i] == boundary]
    )
    assert 0 < n_at_boundary_taken < n_at_boundary_total


def test_mixture_drift_shares_and_missing_groups(spark):
    from trimet_bytes__data_engineering_project_spark.operators.sampling import (
        mixture_drift,
    )

    a = spark.createDataFrame(
        [(i, "en") for i in range(6)] + [(10, "fr"), (11, "fr")], ["doc_id", "lang"]
    )
    b = spark.createDataFrame(
        [(i, "en") for i in range(4)] + [(20, "de")] * 1, ["doc_id", "lang"]
    )
    out = {r["lang"]: r for r in mixture_drift(a, b, "lang").collect()}
    assert set(out) == {"en", "fr", "de"}
    assert out["fr"]["n_b"] == 0 and out["fr"]["share_b"] == 0.0
    assert out["de"]["n_a"] == 0 and out["de"]["share_a"] == 0.0
    assert out["en"]["share_a"] == 6 / 8 and out["en"]["share_b"] == 4 / 5
    assert abs(out["en"]["drift"] - abs(6 / 8 - 4 / 5)) < 1e-16
    # shares sum to 1 per side
    assert sum(r["share_a"] for r in out.values()) == 1.0
    assert sum(r["share_b"] for r in out.values()) == 1.0


def test_quality_distribution_thresholds_inclusive_below(spark):
    """Values exactly AT a quartile threshold land in the lower bucket;
    cell counts partition the corpus."""
    from trimet_bytes__data_engineering_project_spark.operators.sampling import (
        quality_distribution,
    )

    # values 1..8: p25=2.75, p50=4.5, p75=6.25 (interpolated)
    df = spark.createDataFrame(
        [(i, "g" if i <= 4 else "h", i) for i in range(1, 9)],
        ["doc_id", "grp", "score"],
    )
    out = {(r["grp"], r["quartile"]): r["n_docs"] for r in quality_distribution(df, "grp", "score").collect()}
    assert out == {("g", 0): 2, ("g", 1): 2, ("h", 2): 2, ("h", 3): 2}
    # threshold-inclusive: a value equal to p50 goes to bucket 1
    df2 = spark.createDataFrame(
        [(1, "x", 0), (2, "x", 2), (3, "x", 2), (4, "x", 4)], ["doc_id", "grp", "score"]
    )  # p25=1.5, p50=2.0, p75=2.5
    out2 = {(r["grp"], r["quartile"]): r["n_docs"] for r in quality_distribution(df2, "grp", "score").collect()}
    assert out2 == {("x", 0): 1, ("x", 1): 2, ("x", 3): 1}


def test_export_jsonl_shards_roundtrip_and_determinism(spark, tmp_path):
    """The export sink: one plain-JSONL file per shard dir, line order
    inside each file deterministic (sort_key ascending), manifest
    matches assign_shards-derived counts, a re-export is
    byte-identical, and the round-trip loses no rows."""
    import glob
    import json

    from trimet_bytes__data_engineering_project_spark.operators.sampling import (
        assign_shards,
        export_jsonl_shards,
    )

    df = spark.createDataFrame(
        [(i, f"doc {i}", 10 + i) for i in range(200)],
        ["doc_id", "text", "n_tokens"],
    )
    path = str(tmp_path / "export")
    manifest = {
        r["shard"]: r["n_docs"] for r in export_jsonl_shards(df, path, "doc_id").collect()
    }
    expect = {
        r["shard"]: r["n"]
        for r in assign_shards(df, "doc_id").groupBy("shard").count().withColumnRenamed("count", "n").collect()
    }
    assert manifest == expect and sum(manifest.values()) == 200

    def shard_files():
        out = {}
        for d in sorted(glob.glob(f"{path}/shard=*")):
            files = [f for f in sorted(glob.glob(f"{d}/part-*")) if not f.endswith(".crc")]
            assert len(files) == 1, (d, files)  # one task per shard
            out[d.rsplit("=", 1)[1]] = open(files[0]).read()
        return out

    first = shard_files()
    # plain JSONL: every line parses, order = sort_key ascending
    expected_order = {
        str(r["shard"]): [q["doc_id"] for q in sorted(
            (x.asDict() for x in assign_shards(df, "doc_id").collect() if x["shard"] == r["shard"]),
            key=lambda q: q["sort_key"],
        )]
        for r in assign_shards(df, "doc_id").select("shard").distinct().collect()
    }
    for shard, content in first.items():
        ids = [json.loads(line)["doc_id"] for line in content.splitlines()]
        assert ids == expected_order[shard]
    # byte-reproducible re-export
    export_jsonl_shards(df, path, "doc_id")
    assert shard_files() == first
    # round-trip loses nothing
    back = spark.read.json(path)
    assert back.count() == 200
    assert {r["doc_id"] for r in back.select("doc_id").collect()} == set(range(200))


def test_temperature_rebalance_isqrt_allocation(spark):
    """Hand-checkable α=1/2 allocation: groups of 100/25/4/1 docs have
    isqrt weights 10/5/2/1 (sum 18); a 36-doc budget allocates
    20/10/4/2 — the 4-doc group fills its exact allocation, the 1-doc
    group is capped by its size, and the head/tail ratio flattens from
    100:1 to 20:1.  Repartitioning changes nothing."""
    from trimet_bytes__data_engineering_project_spark.operators.sampling import (
        temperature_rebalance,
    )

    rows = (
        [(i, "a") for i in range(100)]
        + [(1000 + i, "b") for i in range(25)]
        + [(2000 + i, "c") for i in range(4)]
        + [(3000, "d")]
    )
    df = spark.createDataFrame(rows, ["doc_id", "lang"])
    kept = temperature_rebalance(df, "lang", "doc_id", 36)
    by = {r["lang"]: 0 for r in kept.collect()}
    for r in kept.collect():
        by[r["lang"]] += 1
    assert by == {"a": 20, "b": 10, "c": 4, "d": 1}
    re_kept = temperature_rebalance(df.repartition(7, "doc_id"), "lang", "doc_id", 36)
    assert {tuple(r) for r in re_kept.collect()} == {tuple(r) for r in kept.collect()}


def test_percentile_rank_matches_naive_window(spark):
    """Two-phase rank == rank() OVER (ORDER BY score DESC) for a
    multiset with heavy ties; pct bounds [0,1]; the corpus plan carries
    no global sort (no Exchange SinglePartition on the data path)."""
    from pyspark.sql import Window as W

    from trimet_bytes__data_engineering_project_spark.operators.sampling import (
        percentile_rank,
    )

    rows = [(i, [5, 5, 3, 9, 1, 5, 9][i % 7]) for i in range(40)]
    df = spark.createDataFrame(rows, ["doc_id", "score"])
    got = {r["doc_id"]: (r["rank"], r["pct"]) for r in
           percentile_rank(df, "score", "doc_id").collect()}
    naive = {
        r["doc_id"]: r["rank"]
        for r in df.withColumn(
            "rank", F.rank().over(W.orderBy(F.desc("score")))
        ).collect()
    }
    assert {k: v[0] for k, v in got.items()} == naive
    n = len(rows)
    for doc_id, (rank, pct) in got.items():
        assert pct == (rank - 1) / (n - 1)
        assert 0.0 <= pct <= 1.0
    plan = percentile_rank(df, "score", "doc_id")._jdf.queryExecution().executedPlan().toString()
    # the only SinglePartition exchange feeds the distinct-score prefix
    # window, never the corpus: corpus-side join stays broadcast
    assert "BroadcastHashJoin" in plan


def test_length_bucketed_batches_reduces_padding(spark):
    """Batch invariants: every doc lands in exactly one batch; batches
    never exceed batch_size; within-batch max length stays inside the
    bucket's bound; and total padding waste is strictly below the
    single-unbucketed-stream baseline on a bimodal corpus (the reason
    the op exists).  Repartitioning changes nothing."""
    from trimet_bytes__data_engineering_project_spark.operators.sampling import (
        length_bucketed_batches,
    )

    rows = [(i, 10 if i % 2 == 0 else 500) for i in range(64)]  # bimodal
    df = spark.createDataFrame(rows, ["doc_id", "n_tokens"])
    out = length_bucketed_batches(df, "n_tokens", "doc_id", batch_size=4).collect()
    assert sum(r["n_docs"] for r in out) == 64
    bounds = [16, 32, 64, 128, 256, 512]
    for r in out:
        assert r["n_docs"] <= 4
        assert r["padding_waste"] == r["n_docs"] * r["max_tokens"] - r["sum_tokens"]
        if r["bucket"] < len(bounds):
            assert r["max_tokens"] <= bounds[r["bucket"]]
    bucketed_waste = sum(r["padding_waste"] for r in out)
    # unbucketed baseline: same shards/batches but one bucket for all
    base = length_bucketed_batches(
        df, "n_tokens", "doc_id", batch_size=4, buckets=(1 << 40,)
    ).collect()
    assert bucketed_waste < sum(r["padding_waste"] for r in base)
    re_out = length_bucketed_batches(
        df.repartition(7, "doc_id"), "n_tokens", "doc_id", batch_size=4
    ).collect()
    assert {tuple(r) for r in re_out} == {tuple(r) for r in out}


def test_systematic_pps_equal_weights_is_every_nth(spark):
    """100 rows of weight 10, k=10: stride=100, so the draw takes one
    row per 10-row block — exactly k rows, picks 1..k, deterministic."""
    from trimet_bytes__data_engineering_project_spark.operators.sampling import (
        systematic_pps_sample,
    )

    df = spark.createDataFrame([(i, 10) for i in range(100)], ["doc_id", "w"])
    rows = sorted(systematic_pps_sample(df, "w", "doc_id", 10).collect())
    assert len(rows) == 10
    assert [r.pick for r in rows] == list(range(1, 11))
    ids = [r.doc_id for r in rows]
    assert all(b - a == 10 for a, b in zip(ids, ids[1:]))  # one per block


def test_systematic_pps_weight_properties(spark):
    """A row with weight >= stride is ALWAYS selected (its weight spans
    a full stride interval); zero-weight rows never are; the result is
    invariant to input partitioning."""
    from trimet_bytes__data_engineering_project_spark.operators.sampling import (
        systematic_pps_sample,
    )

    rows = [(i, 1) for i in range(200)] + [(500, 300), (501, 0)]
    df = spark.createDataFrame(rows, ["doc_id", "w"])
    # total=500, k=5 -> stride=100; doc 500 (w=300 >= stride) must be in
    out = systematic_pps_sample(df, "w", "doc_id", 5).collect()
    ids = {r.doc_id for r in out}
    assert 500 in ids and 501 not in ids
    out2 = systematic_pps_sample(df.repartition(13), "w", "doc_id", 5).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))


def test_systematic_pps_raises_below_k(spark):
    from trimet_bytes__data_engineering_project_spark.operators.sampling import (
        systematic_pps_sample,
    )

    df = spark.createDataFrame([(1, 1), (2, 1)], ["doc_id", "w"])
    try:
        systematic_pps_sample(df, "w", "doc_id", 99).collect()
        raise AssertionError("expected raise_error for total < k")
    except Exception as e:  # noqa: BLE001
        assert "no valid stride" in str(e)


def test_histogram_quantiles_hand_pin(spark):
    """Values 1..100 with width-1 bins make every quantity exact by
    hand: median target ceil(50)=50 -> bin 50, est = 51.0 (one unit of
    interpolation); p90 target 90 -> bin 90; clamping pins outliers to
    the edge bins."""
    from trimet_bytes__data_engineering_project_spark.operators.sampling import (
        histogram_quantiles,
    )

    df = spark.createDataFrame([(v,) for v in range(1, 101)], "v long")
    got = {
        (r.p_num, r.p_den): (r.target_rank, r.bin_idx, r.bin_lo, r.est)
        for r in histogram_quantiles(
            df, "v", [(1, 2), (9, 10)], lo=0, hi=128, n_bins=128
        ).collect()
    }
    assert got[(1, 2)] == (50, 50, 50, 51.0)
    assert got[(9, 10)] == (90, 90, 90, 91.0)
    # clamp: values far outside [lo, hi) land in the edge bins
    wild = spark.createDataFrame([(-50,), (10,), (10_000,)], "v long")
    got2 = {
        (r.p_num, r.p_den): (r.bin_idx, r.target_rank)
        for r in histogram_quantiles(
            wild, "v", [(1, 3), (3, 3)], lo=0, hi=128, n_bins=128
        ).collect()
    }
    assert got2[(1, 3)] == (0, 1)       # ceil(3*1/3)=1 -> the clamped -50
    assert got2[(3, 3)] == (127, 3)     # max -> the clamped 10000


def test_streaming_histogram_quantiles_equal_batch(spark, tmp_path):
    """Two streamed landings' histograms sum to the union's; quantiles
    served from the store are bit-equal to the in-flight form over the
    full corpus; a replay on the same checkpoint is a no-op."""
    import glob
    import os
    import shutil

    from trimet_bytes__data_engineering_project_spark.operators.sampling import (
        histogram_quantiles,
    )
    from trimet_bytes__data_engineering_project_spark.operators.textstats import (
        token_count_col,
    )
    from trimet_bytes__data_engineering_project_spark.streaming.stats import (
        quantiles_from_store,
        run_streaming_histogram,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    landing = str(tmp_path / "landing")
    os.makedirs(landing)

    def land_file(df, name):
        t = str(tmp_path / f"w_{name}")
        df.coalesce(1).write.parquet(t)
        shutil.move(glob.glob(f"{t}/part-*.parquet")[0], f"{landing}/{name}.parquet")

    land_file(docs.filter("doc_id % 2 = 0"), "a")
    land_file(docs.filter("doc_id % 2 = 1"), "b")
    store = str(tmp_path / "store")
    ck = str(tmp_path / "ck")
    expr = r"size(split(lower(trim(text)), '\\s+'))"
    run_streaming_histogram(spark, landing, store, ck, expr, 0, 128, 64)

    probs = [(1, 2), (9, 10)]
    got = sorted(
        map(tuple, quantiles_from_store(spark, store, probs, 0, 128, 64).collect())
    )
    with_v = docs.select(token_count_col(F.col("text")).alias("v"))
    want = sorted(
        map(tuple, histogram_quantiles(with_v, "v", probs, 0, 128, 64).collect())
    )
    assert got == want and len(got) == 2

    n_before = spark.read.parquet(f"{store}/hist").count()
    run_streaming_histogram(spark, landing, store, ck, expr, 0, 128, 64)
    assert spark.read.parquet(f"{store}/hist").count() == n_before


def test_streaming_quality_scores_equal_batch(spark, tmp_path):
    """Two streamed landings scored against a frozen DSIR profile are
    row-equal to one batch pass over the union (per-doc scorers +
    frozen snapshot = exact streaming); letterless docs land with
    NULL affinity but real gate flags; replay on the same checkpoint
    is a no-op."""
    import glob
    import os
    import shutil

    from trimet_bytes__data_engineering_project_spark.operators.textstats import (
        gopher_quality_flags,
        hashed_importance_weights,
        importance_ratio_table,
    )
    from trimet_bytes__data_engineering_project_spark.streaming.quality import (
        run_streaming_quality,
        scored_from_store,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(60)
    extra = spark.createDataFrame([(99991, "12345 !!!", "en", "s", 9)], docs.schema)
    docs = docs.unionByName(extra)
    profile = str(tmp_path / "profile")
    importance_ratio_table(
        docs, docs.filter(F.col("lang") == "en")
    ).write.parquet(profile)

    landing = str(tmp_path / "landing")
    os.makedirs(landing)

    def land_file(df, name):
        t = str(tmp_path / f"w_{name}")
        df.coalesce(1).write.parquet(t)
        shutil.move(glob.glob(f"{t}/part-*.parquet")[0], f"{landing}/{name}.parquet")

    land_file(docs.filter("doc_id % 2 = 0"), "a")
    land_file(docs.filter("doc_id % 2 = 1"), "b")
    store = str(tmp_path / "store")
    ck = str(tmp_path / "ck")
    run_streaming_quality(spark, landing, store, ck, profile)

    got = scored_from_store(spark, store)
    cols = sorted(c for c in got.columns if c != "batch_id")
    ratios = spark.read.parquet(profile)
    want = gopher_quality_flags(docs).join(
        hashed_importance_weights(docs, ratios=ratios).drop("n_tokens"),
        "doc_id",
        "left",
    )
    g = sorted(map(tuple, got.select(*cols).collect()), key=repr)
    w = sorted(map(tuple, want.select(*cols).collect()), key=repr)
    assert g == w and len(g) == 61
    # the letterless doc landed: flags present, affinity NULL
    r = got.filter("doc_id = 99991").collect()[0]
    assert r.passes == 0 and r.affinity_sum is None
    # replay idempotency
    n_before = got.count()
    run_streaming_quality(spark, landing, store, ck, profile)
    assert scored_from_store(spark, store).count() == n_before


def test_concat_chunk_spans_matches_naive_prefix_sum(spark):
    """Two-level distributed prefix sum == the naive global cumsum,
    including sparse non-contiguous ids straddling bucket boundaries,
    and chunk spans follow exactly."""
    from trimet_bytes__data_engineering_project_spark.operators.sampling import (
        concat_chunk_spans,
    )

    rows = [(1, 3), (2, 10), (7, 1), (9, 12), (104, 5), (300, 7), (301, 2)]
    df = spark.createDataFrame(rows, "doc_id long, n_tok long")
    got = {
        r.doc_id: r.asDict()
        for r in concat_chunk_spans(
            df, "doc_id", "n_tok", context_len=8, bucket_size=100
        ).collect()
    }
    off = 0
    for did, n in rows:  # rows already in doc_id order
        g = got[did]
        assert g["start_off"] == off, (did, g)
        assert g["first_chunk"] == off // 8
        assert g["last_chunk"] == (off + n - 1) // 8
        assert g["n_chunks"] == g["last_chunk"] - g["first_chunk"] + 1
        assert g["crosses"] == int(g["n_chunks"] > 1)
        off += n
    assert len(got) == len(rows)


def test_streaming_pii_scrub_equals_batch(spark, tmp_path):
    """Two streamed landings scrubbed per micro-batch are row-equal to
    one batch pii_scan + redaction over the union (pure per-doc
    projection = exact streaming); replay on the same checkpoint is a
    no-op; no raw match string survives into the store."""
    import glob
    import os
    import shutil

    from trimet_bytes__data_engineering_project_spark.operators.textstats import (
        pii_scan,
        redact_pii,
    )
    from trimet_bytes__data_engineering_project_spark.streaming.quality import (
        run_streaming_pii_scrub,
        scrubbed_from_store,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(40)
    extra = spark.createDataFrame(
        [(99991, "mail bob@evil.example and 192.168.7.9 now", "en", "s", 41)],
        docs.schema,
    )
    docs = docs.unionByName(extra)

    landing = str(tmp_path / "landing")
    os.makedirs(landing)

    def land_file(df, name):
        t = str(tmp_path / f"w_{name}")
        df.coalesce(1).write.parquet(t)
        shutil.move(glob.glob(f"{t}/part-*.parquet")[0], f"{landing}/{name}.parquet")

    land_file(docs.filter("doc_id % 2 = 0"), "a")
    land_file(docs.filter("doc_id % 2 = 1"), "b")
    store = str(tmp_path / "store")
    ck = str(tmp_path / "ck")
    run_streaming_pii_scrub(spark, landing, store, ck)

    got = scrubbed_from_store(spark, store)
    cols = sorted(c for c in got.columns if c != "batch_id")
    want = docs.select(
        "doc_id", redact_pii(F.col("text")).alias("clean_text")
    ).join(pii_scan(docs), "doc_id")
    g = sorted(map(tuple, got.select(*cols).collect()), key=repr)
    w = sorted(map(tuple, want.select(*cols).collect()), key=repr)
    assert g == w and len(g) == 41
    r = got.filter("doc_id = 99991").collect()[0]
    assert r.n_email == 1 and r.n_ipv4 == 1
    assert "bob@evil.example" not in r.clean_text and "192.168.7.9" not in r.clean_text
    assert "<EMAIL>" in r.clean_text and "<IPV4>" in r.clean_text
    n_before = got.count()
    run_streaming_pii_scrub(spark, landing, store, ck)
    assert scrubbed_from_store(spark, store).count() == n_before


def test_doremi_reweight_arithmetic(spark):
    """Hand-built two-domain corpus: the high-surprisal domain gains
    weight, the multiplier is the bounded integer surrogate, and the
    updated weights renormalize to ~scale."""
    from trimet_bytes__data_engineering_project_spark.operators.sampling import (
        doremi_reweight,
    )

    docs = spark.createDataFrame(
        [(1, "easy"), (2, "hard"), (3, "easy2")],
        "doc_id long, source string",
    ).withColumn(
        "source", F.when(F.col("doc_id") == 2, "rare").otherwise("common")
    )
    # synthetic per-doc scores: domain 'rare' has much higher surprisal
    scores = spark.createDataFrame(
        [(1, 10, 100), (2, 10, 900), (3, 10, 100)],
        "doc_id long, n_tokens long, surprisal_sum long",
    )
    got = {r.source: r.asDict() for r in doremi_reweight(docs, scores, scale=100).collect()}
    # common: avg=(200*100)//20=1000? scale=100: avg_fp = 200*100//20 = 1000
    assert got["common"]["avg_fp"] == 1000 and got["rare"]["avg_fp"] == 9000
    # baseline = 1100*100//30 = 3666
    assert got["common"]["excess_fp"] == 0
    assert got["rare"]["excess_fp"] == 9000 - (1100 * 100) // 30
    # w0: common 20/30 -> 66, rare 10/30 -> 33
    assert got["common"]["w0_fp"] == 66 and got["rare"]["w0_fp"] == 33
    # multiplier: common 1.0 (no excess) -> w1_raw 66;
    # rare: excess capped at scale=100 -> doubled -> 66
    # renormalized: 66*100//132 = 50 each
    assert got["common"]["w1_fp"] == 50 and got["rare"]["w1_fp"] == 50


def test_chunk_dedup_counts_window_repeats(spark):
    """Two docs with identical token streams whose global offsets align
    produce duplicate windows; shifting alignment by one token breaks
    the duplication (the offset-sensitivity the audit exists to show)."""
    from trimet_bytes__data_engineering_project_spark.operators.dedup import (
        chunk_dedup_stats,
    )

    # C=4: doc1 tokens [a b c d][e f g h], doc2 identical -> with doc1
    # length 8 (multiple of 4), doc2's windows align and duplicate
    aligned = spark.createDataFrame(
        [(1, "a b c d e f g h"), (2, "a b c d e f g h")],
        "doc_id long, text string",
    )
    got = {r.mult: r.asDict() for r in chunk_dedup_stats(aligned, context_len=4).collect()}
    assert got[2]["n_hashes"] == 2 and got[2]["n_chunks"] == 4
    # append one token to doc1: doc2's copy of the stream now starts
    # mid-window, so no window boundary lines up with doc1's
    shifted = spark.createDataFrame(
        [(1, "a b c d e f g h i"), (2, "a b c d e f g h")],
        "doc_id long, text string",
    )
    got2 = {r.mult: r.asDict() for r in chunk_dedup_stats(shifted, context_len=4).collect()}
    assert 2 not in got2  # no aligned repeats survive the shift
    assert sum(r["n_chunks"] for r in got2.values()) == (9 + 8 + 3) // 4  # ceil(17/4)


def test_streaming_packer_matches_batch_offsets(spark, tmp_path):
    """Sequential id-ordered landings packed per micro-batch equal one
    batch concat_chunk_spans pass over the union — the running offset
    is the only cross-batch state; replay is a no-op."""
    import glob
    import os
    import shutil

    from trimet_bytes__data_engineering_project_spark.operators.sampling import (
        concat_chunk_spans,
    )
    from trimet_bytes__data_engineering_project_spark.streaming.packing import (
        run_streaming_packer,
        spans_from_store,
    )

    rows = [(i, 3 + (i * 7) % 11) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, n_tok long")
    a = df.filter("doc_id < 20")
    b = df.filter("doc_id >= 20")

    landing = str(tmp_path / "landing")
    os.makedirs(landing)

    def land_file(d, name):
        t = str(tmp_path / f"w_{name}")
        d.coalesce(1).write.parquet(t)
        shutil.move(glob.glob(f"{t}/part-*.parquet")[0], f"{landing}/{name}.parquet")

    store = str(tmp_path / "store")
    ck = str(tmp_path / "ck")
    land_file(a, "a")
    run_streaming_packer(spark, landing, store, ck, context_len=8)
    land_file(b, "b")
    run_streaming_packer(spark, landing, store, ck, context_len=8)

    got = {
        r.doc_id: (r.start_off, r.first_chunk, r.last_chunk, r.n_chunks, r.crosses)
        for r in spans_from_store(spark, store).collect()
    }
    want = {
        r.doc_id: (r.start_off, r.first_chunk, r.last_chunk, r.n_chunks, r.crosses)
        for r in concat_chunk_spans(df, "doc_id", "n_tok", context_len=8).collect()
    }
    assert got == want and len(got) == 40
    # replay idempotency: same generations, same rows
    run_streaming_packer(spark, landing, store, ck, context_len=8)
    again = {
        r.doc_id: (r.start_off, r.first_chunk, r.last_chunk, r.n_chunks, r.crosses)
        for r in spans_from_store(spark, store).collect()
    }
    assert again == want


def test_streaming_window_digests_stitch_across_batches(spark, tmp_path):
    """Windows straddling a micro-batch boundary are digested exactly
    once, over the stitched token run: the store equals the
    Python-computed digest table of the concatenated corpus restricted
    to complete windows; replay is a no-op."""
    import glob
    import hashlib
    import os
    import shutil

    from trimet_bytes__data_engineering_project_spark.streaming.packing import (
        run_streaming_window_digests,
        window_digests_from_store,
    )

    rows = [(i, " ".join(f"w{i}t{j}" for j in range((i * 5) % 7 + 1))) for i in range(12)]
    a = [r for r in rows if r[0] < 6]
    b = [r for r in rows if r[0] >= 6]
    C = 4

    landing = str(tmp_path / "landing")
    os.makedirs(landing)

    def land_file(data, name):
        df = spark.createDataFrame(data, "doc_id long, text string")
        t = str(tmp_path / f"w_{name}")
        df.coalesce(1).write.parquet(t)
        shutil.move(glob.glob(f"{t}/part-*.parquet")[0], f"{landing}/{name}.parquet")

    store = str(tmp_path / "store")
    ck = str(tmp_path / "ck")
    land_file(a, "a")
    run_streaming_window_digests(spark, landing, store, ck, context_len=C)
    land_file(b, "b")
    run_streaming_window_digests(spark, landing, store, ck, context_len=C)

    stream = " ".join(t for _, t in rows).lower().split()
    want = {
        i: hashlib.md5(" ".join(stream[i * C : (i + 1) * C]).encode()).hexdigest()
        for i in range(len(stream) // C)
    }
    got = {
        int(r.chunk): r.h for r in window_digests_from_store(spark, store).collect()
    }
    assert got == want and len(want) > 2
    # at least one window straddles the a/b boundary and still matches
    boundary_tokens = sum(len(t.split()) for _, t in a)
    straddle = boundary_tokens // C
    if boundary_tokens % C:  # the straddling window exists
        assert got[straddle] == want[straddle]
    run_streaming_window_digests(spark, landing, store, ck, context_len=C)
    assert {int(r.chunk): r.h for r in window_digests_from_store(spark, store).collect()} == want


def test_streaming_lang_router_matches_batch(spark, tmp_path):
    """The streaming language router (frozen x170 snapshot) lands
    per-batch predictions row-equal to one batch
    lang_id_from_snapshot pass over the union; replay is idempotent."""
    import glob
    import os
    import shutil

    from trimet_bytes__data_engineering_project_spark.operators.textstats import (
        lang_id_from_snapshot,
        lang_ratio_profiles,
        lang_script_masks,
    )
    from trimet_bytes__data_engineering_project_spark.streaming.quality import (
        routed_from_store,
        run_streaming_lang_router,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(60)
    base = docs.filter("doc_id < 30")
    batch = docs.filter("doc_id >= 30")
    rpath, mpath = str(tmp_path / "ratios"), str(tmp_path / "masks")
    lang_ratio_profiles(base).write.parquet(rpath)
    lang_script_masks(base).write.parquet(mpath)

    landing = str(tmp_path / "landing")
    os.makedirs(landing)

    def land_file(df, name):
        t = str(tmp_path / f"w_{name}")
        df.coalesce(1).write.parquet(t)
        shutil.move(glob.glob(f"{t}/part-*.parquet")[0], f"{landing}/{name}.parquet")

    land_file(batch.filter("doc_id % 2 = 0"), "a")
    land_file(batch.filter("doc_id % 2 = 1"), "b")
    store = str(tmp_path / "store")
    ck = str(tmp_path / "ck")
    run_streaming_lang_router(spark, landing, store, ck, rpath, mpath)

    got = routed_from_store(spark, store)
    want = lang_id_from_snapshot(
        batch, spark.read.parquet(rpath), spark.read.parquet(mpath)
    )
    cols = ["doc_id", "claimed", "pred", "agree"]
    g = sorted(map(tuple, got.select(*cols).collect()))
    w = sorted(map(tuple, want.select(*cols).collect()))
    assert g == w and len(g) > 0
    # replay idempotency (per-batch_id overwrite)
    run_streaming_lang_router(spark, landing, store, ck, rpath, mpath)
    assert routed_from_store(spark, store).count() == len(g)


def test_padding_waste_matches_bruteforce(spark):
    """x179's per-bucket padding-tax arithmetic pinned against a pure-
    Python loader model: same bucketing (n_tok DIV 64), same in-bucket
    (n_tok, doc_id) order, batches of 32, pad-to-batch-max — waste and
    ppm must match exactly, including the short last batch of every
    bucket (where most of the tax hides)."""
    import random

    from trimet_bytes__data_engineering_project_spark.plans import QUERIES

    rng = random.Random(7)
    # uneven lengths across several buckets + a bucket with exactly one
    # doc + a bucket with a 33-doc spill into a second batch
    lens = (
        [rng.randrange(1, 250) for _ in range(90)]
        + [500]
        + [70 + (i % 5) for i in range(33)]
    )
    rows = [(i, " ".join(["w"] * n)) for i, n in enumerate(lens)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    import tempfile, os
    d = tempfile.mkdtemp()
    docs.write.parquet(os.path.join(d, "documents.parquet"))
    got = {
        r.bucket: (r.n_batches, r.n_docs, r.real_tokens, r.padded_tokens, r.waste_ppm)
        for r in QUERIES["x179_padding_waste_audit"](spark, d).collect()
    }

    buckets: dict[int, list[tuple[int, int]]] = {}
    for i, n in enumerate(lens):
        buckets.setdefault(n // 64, []).append((n, i))
    want = {}
    for b, members in buckets.items():
        members.sort()
        batches = [members[i : i + 32] for i in range(0, len(members), 32)]
        real = sum(n for n, _ in members)
        padded = sum(len(bt) * max(n for n, _ in bt) - sum(n for n, _ in bt) for bt in batches)
        ppm = padded * 1_000_000 // (padded + real)
        want[b] = (len(batches), len(members), real, padded, ppm)
    assert got == want
