"""Physical-plan regression tests — the 100 TB contract.

Correctness tests prove the queries compute the right rows at sf0.01;
these prove Catalyst compiles them to the plans that survive a 1000×
scale-up: filters reach the parquet scan, small dims broadcast, top-k
never global-sorts, aggregations stay hash-based with map-side
partials.  A refactor that silently loses one of these properties
still passes the oracle gate — this file is what catches it.
"""

from __future__ import annotations

import contextlib
import io

import pytest

from trimet_bytes__data_engineering_project_spark.plans import QUERIES

SF_DIR = "/root/testdata/sf0.01"


def plan_of(spark, name: str) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        QUERIES[name](spark, SF_DIR).explain("formatted")
    return buf.getvalue()


def test_pricing_summary_pushes_filter_and_prunes_columns(spark):
    """q27: the l_shipdate predicate must reach the parquet scan
    (row-group/page skipping at scale) and the scan must read only the
    7 referenced columns, not all 16."""
    plan = plan_of(spark, "q27_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    read_schema = next(ln for ln in plan.splitlines() if "ReadSchema" in ln)
    assert "l_comment" not in read_schema and "l_partkey" not in read_schema


def test_bbox_ranges_push_down(spark):
    """q22: both range predicates (the bounding-box pattern) push to the
    lineitem scan."""
    plan = plan_of(spark, "q22_bbox_distinct_trips")
    assert "GreaterThanOrEqual(l_quantity,10" in plan
    assert "LessThanOrEqual(l_extendedprice,3000" in plan


def test_dim_joins_broadcast(spark):
    """q20/q21: the dimension side is a broadcast hash join — no shuffle
    of the fact table for the join itself."""
    for name in ("q20_trip_full_view", "q21_join_using_segment"):
        plan = plan_of(spark, name)
        assert "BroadcastHashJoin" in plan, name
        assert "SortMergeJoin" not in plan, name


def test_topk_is_take_ordered_not_global_sort(spark):
    """q28: ORDER BY + LIMIT compiles to TakeOrderedAndProject (per-
    partition top-k + merge), never a full global Sort + Limit."""
    plan = plan_of(spark, "q28_top_value_events")
    assert "TakeOrderedAndProject" in plan


def test_distinct_agg_is_two_phase_hash(spark):
    """q11: COUNT(DISTINCT) plans as partial_count(distinct) hash
    aggregation — the map-side combine is what keeps the shuffle
    payload per (group, key) instead of per input row."""
    plan = plan_of(spark, "q11_trips_per_date_dayname")
    assert "partial_count(distinct" in plan
    assert "SortAggregate" not in plan


def test_minhash_agg_is_hash_not_sort(spark):
    """x06: the signature min-agg must stay a HashAggregate.  min over a
    *string* buffer silently falls back to SortAggregate (two extra
    sorts of the exploded shingle rows) — the numeric-slice formulation
    exists precisely to avoid that."""
    plan = plan_of(spark, "x06_minhash_signature")
    assert "SortAggregate" not in plan
    assert "HashAggregate" in plan
    assert "partial_min" in plan


def test_no_cartesian_products_anywhere(spark):
    """No query in the corpus may plan a CartesianProduct or
    BroadcastNestedLoopJoin on the *data* path — candidate generation is
    always a bucketed equi-join.  (Scalar-subquery reuse shows up as
    ReusedSubquery, not a nested loop.)"""
    for name in sorted(QUERIES):
        plan = plan_of(spark, name)
        assert "CartesianProduct" not in plan, name


def test_scalar_subquery_not_collected_on_driver(spark):
    """q13: the trip-picker is a Spark scalar subquery inside one plan,
    not a driver-side .first() round trip."""
    plan = plan_of(spark, "q13_scalar_subquery_points")
    assert "Subquery" in plan


def test_lsh_index_probe_prunes_partitions(spark):
    """x20: the probe of the WRITTEN LSH index must hit the bucket as a
    partition filter — reading 1 of 16 bucket directories — not as a
    post-scan predicate over recomputed signatures."""
    plan = plan_of(spark, "x20_ann_lsh_index_probe")
    pf = next(ln for ln in plan.splitlines() if "PartitionFilters" in ln)
    assert "bucket" in pf and "=" in pf
    # and the probe plan computes no signatures (no dot-product CASE chain)
    assert "Exchange" not in plan.split("TakeOrderedAndProject")[0]


def test_lsh_multiprobe_prunes_partitions(spark):
    """x29: the Hamming-radius-1 probe keeps the exact plan shape of
    x20 — a literal IN-list partition filter on bucket (5 of 16
    directories), no signature recompute, no shuffle before top-k."""
    plan = plan_of(spark, "x29_ann_lsh_multiprobe")
    pf = next(ln for ln in plan.splitlines() if "PartitionFilters" in ln)
    assert "bucket" in pf and ("IN" in pf or "in(" in pf.lower())
    assert "Exchange" not in plan.split("TakeOrderedAndProject")[0]


def test_ivf_index_probe_prunes_partitions(spark):
    """x21: the IVF probe scans only the probed inverted-list partition
    via an IN/equality partition filter on centroid_id — assignment is
    never recomputed at query time."""
    plan = plan_of(spark, "x21_ann_ivf_index_probe")
    pf = next(ln for ln in plan.splitlines() if "PartitionFilters" in ln)
    assert "centroid_id" in pf
    # no join in the probe plan at all (centroids were read driver-side)
    assert "Join" not in plan


def test_index_probes_match_query_time_operators(spark):
    """The persisted-index probes return exactly the query-time
    operators' results (x20 ≡ x11, x21 ≡ x12) — the layout changes the
    cost, never the answer."""
    for probe, base in (
        ("x20_ann_lsh_index_probe", "x11_ann_lsh"),
        ("x21_ann_ivf_index_probe", "x12_ann_ivf"),
    ):
        p = [tuple(r) for r in QUERIES[probe](spark, SF_DIR).collect()]
        b = [tuple(r) for r in QUERIES[base](spark, SF_DIR).collect()]
        assert p == b, probe


def test_warehouse_roundtrip_prunes_date_partition(spark):
    """q33: the date predicate over the engine's OWN written breadcrumb
    layout must resolve as a service_date partition filter — one
    directory read — proving the partitioned write path end-to-end."""
    plan = plan_of(spark, "q33_warehouse_roundtrip")
    pf = next(ln for ln in plan.splitlines() if "PartitionFilters" in ln)
    assert "service_date" in pf


def test_range_join_is_equi_not_nested_loop(spark):
    """x17: the binned range join must plan as a hash or sort-merge
    equi-join — the raw BETWEEN formulation degrades to
    BroadcastNestedLoopJoin, which is exactly what the operator
    exists to avoid."""
    for name in ("x17_range_join", "x19_range_join_long_intervals"):
        plan = plan_of(spark, name)
        assert "BroadcastNestedLoopJoin" not in plan, name
        assert "CartesianProduct" not in plan, name
        assert (
            ("SortMergeJoin" in plan)
            or ("BroadcastHashJoin" in plan)
            or ("ShuffledHashJoin" in plan)
        ), name


@pytest.mark.parametrize(
    "name", ["q01_count_on_date", "q23_tracking_daily", "q27_pricing_summary"]
)
def test_aggs_have_map_side_partials(spark, name):
    """A1/A3/flagship: every shuffle-bound aggregation carries a partial
    (map-side) phase so the exchange moves one row per group per task."""
    plan = plan_of(spark, name)
    assert "partial_" in plan


def test_shard_manifest_agg_is_hash_not_sort(spark):
    """x41's key-range min/max runs on the numeric 60-bit prefix, not
    the hex string — min(string) would force the SortAggregate fallback
    (an extra corpus sort on both sides of the shuffle); min(long)
    keeps the two-phase HashAggregate."""
    plan = plan_of(spark, "x41_shard_manifest")
    assert "HashAggregate" in plan and "partial_" in plan
    assert "SortAggregate" not in plan


@pytest.mark.parametrize("name", ["x50_doc_chunking", "x53_random_projection"])
def test_projection_ops_are_shuffle_free(spark, name):
    """x50/x53: chunking and random projection are pure per-row codegen
    projections — any Exchange in the plan means the op regressed into
    a shuffle it never needs."""
    plan = plan_of(spark, name)
    assert "Exchange" not in plan, name
    assert "Generate" in plan  # the posexplode


def test_bloom_decontamination_keeps_broadcast_shape(spark):
    """x52: the confirm join must stay broadcast-left-semi (corpus never
    shuffled); the bitmap prefilter compiles into the scan-side filter,
    so no exchange precedes the join on the corpus side."""
    plan = plan_of(spark, "x52_bloom_decontamination")
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert "SortMergeJoin" not in plan


def test_pretraining_pipeline_stays_broadcast_and_fused(spark):
    """x54: every join in the composite broadcasts (the decontamination
    anti-join, the confirm semi-join, the per-score prefix join) — a
    SortMergeJoin anywhere means a stage stopped fusing and the corpus
    is being shuffled for a join.  The corpus is scanned once per
    selection pass (the two-phase algorithm's agg pass + join-back
    pass, each fusing the scorer and the screen into the scan) — more
    documents scans than that means a stage fell out of the fused
    pipeline."""
    plan = plan_of(spark, "x54_pretraining_pipeline")
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan
    # 2 corpus passes + 2 instantiations of the 20-doc benchmark
    # subplan per pass = 6 documents scans (formatted explain prints
    # each node twice: once in the tree, once in the detail list);
    # a 7th scan means regression
    n_scans = plan.count("Scan parquet") // 2
    assert n_scans <= 6, n_scans


def test_count_min_sketch_stays_hash_agg_and_broadcast(spark):
    """x79: the sketch build must be a two-phase HASH agg over (row,
    bucket) — a SortAggregate fallback would re-sort the exploded token
    stream — and the candidate→sketch probe must broadcast the bounded
    sketch, never shuffle-join it."""
    p = plan_of(spark, "x79_top_terms_sketch")
    assert "SortAggregate" not in p
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_bigram_surprisal_builds_bigrams_array_side(spark):
    """x80: bigrams come from zip_with over the token array — NO
    lag/lead window may appear before the first aggregation (a
    window-based bigram build would add a full (doc, pos) sort
    shuffle); aggregation stays hash-based."""
    p = plan_of(spark, "x80_bigram_surprisal")
    assert "zip_with" in p and "slice" in p
    assert "SortAggregate" not in p
    # the only Window in the plan would be a lag window — there is none
    assert "Window" not in p


def test_pps_sample_windows_are_chunk_partitioned(spark):
    """x81: the corpus-sized running sum must be PARTITIONED by the
    chunk key — the only global-order (single-partition) window allowed
    is the prefix over the tiny chunk-totals table.  Count the window
    specs: exactly one 'partitionBy chunk' window touches corpus rows."""
    df = QUERIES["x81_weighted_sample"](spark, SF_DIR)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    # both windows exist; the corpus-side one carries the chunk key
    assert plan.count("Window") == 2
    assert "_chunk" in plan.split("Window", 2)[1] or "_chunk" in plan
    p = plan_of(spark, "x81_weighted_sample")
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p  # params broadcast
    assert "SortMergeJoin" not in p


def test_knn_index_join_prunes_partitions_and_reads_stored_norms(spark):
    """x89: the index side of the batch kNN join is a partition-pruned
    scan — the batch's bucket set arrives as an IN-list PartitionFilter
    — and the corpus norm comes FROM the index (the scan's ReadSchema
    carries the norm column; no l2 fold is recomputed corpus-side).
    The join itself stays a single equi-join on the bucket key."""
    plan = plan_of(spark, "x89_knn_index_join")
    pf = next(ln for ln in plan.splitlines() if "PartitionFilters" in ln)
    assert "bucket" in pf and ("IN" in pf or "in(" in pf.lower())
    scan = next(
        ln for ln in plan.splitlines() if "ReadSchema" in ln and "norm" in ln
    )
    assert "norm" in scan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_snapshot_probes_scan_persisted_counts(spark):
    """x85/x86: the snapshot side is a parquet SCAN of the persisted
    count table (term/df or term/c in ReadSchema), never a re-aggregation
    of the base corpus — the whole point of the snapshot contract."""
    for name, cols in (
        ("x85_tfidf_snapshot_probe", ("term", "df")),
        ("x86_surprisal_snapshot_probe", ("term", "c")),
    ):
        plan = plan_of(spark, name)
        snap_scans = [
            ln
            for ln in plan.splitlines()
            if "ReadSchema" in ln and all(c in ln for c in cols) and "text" not in ln
        ]
        assert snap_scans, f"{name}: no persisted-count scan in plan"
        # exactly one documents scan (the batch side) — the base corpus
        # text is never read
        doc_scans = [
            ln for ln in plan.splitlines() if "ReadSchema" in ln and "text" in ln
        ]
        assert len(doc_scans) == 1, f"{name}: base corpus re-read\n{plan}"


def test_ivf_knn_join_prunes_partitions_and_reads_stored_norms(spark):
    """x90: the inverted-list side of the batch IVF kNN join is a
    partition-pruned scan (probed centroid set as PartitionFilter) and
    corpus norms come from the index's stored column, not a re-fold."""
    plan = plan_of(spark, "x90_ivf_knn_join")
    pf = next(ln for ln in plan.splitlines() if "PartitionFilters" in ln)
    assert "centroid_id" in pf
    assert any("ReadSchema" in ln and "norm" in ln for ln in plan.splitlines())
    assert "CartesianProduct" not in plan


def test_span_dedup_single_digest_join(spark):
    """x83: the single-explode rewrite's structural properties — the
    plan's ONLY join is the digest equi-join (the two-explode
    formulation carried a second (id, pos) join reuniting tokens with
    gram starts), the dup-count branch's scan prunes to the text
    column alone, and nothing is cartesian."""
    plan = plan_of(spark, "x83_span_dedup")
    import re

    joins = [
        ln for ln in plan.splitlines()
        if re.match(r"^\(\d+\) \w*(Join|CartesianProduct)", ln.strip())
    ]
    assert len(joins) == 1, plan
    assert any(
        "ReadSchema" in ln and "text" in ln and "doc_id" not in ln
        for ln in plan.splitlines()
    ), plan  # the dup-count scan pruned to text only
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_kn_snapshot_probe_scans_persisted_type_tables(spark):
    """x100: the KN snapshot probe's base side is parquet SCANS of the
    persisted (g, c) type tables — the corpus text is read exactly
    once (the batch side), never re-exploded per derived-table
    consumer (the in-flight form's measured re-derivation multiplier,
    BENCH_NOTES round 7)."""
    plan = plan_of(spark, "x100_kn_snapshot_probe")
    snap_scans = [
        ln
        for ln in plan.splitlines()
        if "ReadSchema" in ln and "g:string" in ln and "text" not in ln
    ]
    assert snap_scans, f"no persisted type-table scan in plan\n{plan}"
    doc_scans = [
        ln for ln in plan.splitlines() if "ReadSchema" in ln and "text:string" in ln
    ]
    assert len(doc_scans) == 1, f"base corpus text re-read\n{plan}"


def test_forward_index_fetch_pushes_ids_and_prunes_buckets(spark, tmp_path):
    """fetch_doc_terms must push the id IN-list to the parquet scan
    (row-group skipping on the doc_id-sorted files) and carry the
    doc_bucket partition filter (directory pruning)."""
    import contextlib
    import io

    from trimet_bytes__data_engineering_project_spark.operators.retrieval import (
        fetch_doc_terms,
        write_forward_index,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").filter(
        "doc_id < 200"
    )
    path = str(tmp_path / "fwd")
    write_forward_index(docs, path)
    ids = spark.createDataFrame([(0,), (64,)], ["doc_id"])
    fetched = fetch_doc_terms(spark, path, ids)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        fetched.explain("formatted")
    plan = buf.getvalue()
    assert "PushedFilters: [In(doc_id" in plan
    assert "PartitionFilters" in plan and "doc_bucket" in plan
    got = {r.doc_id for r in fetched.select("doc_id").distinct().collect()}
    assert got == {0, 64}


def test_gopher_rules_single_pass_no_shuffle(spark):
    """x148: the whole seven-rule gate is ONE codegen projection over
    the scan — no Exchange, no aggregate, no join, no UDF may appear;
    the scan reads only (doc_id, text)."""
    p = plan_of(spark, "x148_gopher_rules")
    assert "Exchange" not in p
    assert "Join" not in p and "Aggregate" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in p


def test_importance_weights_profiles_broadcast(spark):
    """x143: the 256-row ratio table must BROADCAST into the token
    stream (a shuffle join there would shuffle the exploded corpus on
    the bucket key); aggregations stay hash-based."""
    p = plan_of(spark, "x143_importance_weights")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p
    assert "SortAggregate" not in p


def test_lang_reid_profiles_broadcast_and_two_corpus_shuffles(spark):
    """x149: the |langs|x256 ratio grid broadcasts into the per-doc
    bucket table; no sort-merge join of the corpus anywhere."""
    p = plan_of(spark, "x149_lang_reid_confusion")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_winnow_fold_is_array_local(spark):
    """x147: fingerprint selection must happen in the scan's project
    (aggregate/transform array exprs) with NO window and NO python
    eval; the pair join blocks on the int64 fp key."""
    p = plan_of(spark, "x147_winnow_candidates")
    assert "Window" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "CartesianProduct" not in p


def test_chunk_spans_prefix_sum_is_two_level(spark):
    """x159: the corpus-sized cumulative window must be PARTITIONED by
    the bucket key; the only unpartitioned window runs over the tiny
    bucket-totals table, and the offsets join back as a broadcast —
    never a sort-merge join of the corpus."""
    df = QUERIES["x159_concat_chunk_spans"](spark, SF_DIR)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Window") == 2
    assert "_bkt" in plan  # bucket-partitioned corpus window
    p = plan_of(spark, "x159_concat_chunk_spans")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_pii_scan_single_pass_no_shuffle(spark):
    """x160: counts + cascade + md5 are ONE codegen projection over the
    scan — no Exchange, join, aggregate or Python eval; the scan reads
    only (doc_id, text)."""
    p = plan_of(spark, "x160_pii_scan")
    assert "Exchange" not in p
    assert "Join" not in p and "Aggregate" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in p


def test_semdedup_pairs_stay_cluster_local(spark):
    """x157: the pair stage must be an equi-join on centroid_id (never
    a cartesian); the only nested-loop joins are broadcasts of the
    bounded centroid table; per-vector norms come from the assignment
    (no Window fallback — the max_by argmax is an aggregate)."""
    p = plan_of(spark, "x157_semdedup")
    assert "CartesianProduct" not in p
    assert "SortMergeJoin (" not in p or "centroid_id" in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_vocab_growth_windows_over_bucket_table_only(spark):
    """x161: the cumulative windows run AFTER the per-bucket aggregates
    (<=64 rows) — the corpus feeds only hash aggregates; no sort-merge
    join anywhere (the types<->tokens bucket join is tiny and
    broadcast)."""
    p = plan_of(spark, "x161_vocab_growth")
    assert "SortAggregate" not in p
    assert "CartesianProduct" not in p


def test_datasheet_is_two_scans(spark):
    """x165: all seven row-level metrics fold into ONE aggregate over
    one scan (a single Expand for the mixed distincts); the vocabulary
    explode is the second and last scan — exactly two parquet reads of
    documents, not one per metric."""
    p = plan_of(spark, "x165_corpus_datasheet")
    # count tree nodes ("+- Scan parquet"), not the detail section's
    # repeated listing of the same nodes
    assert p.count("- Scan parquet") == 2
    assert "Expand" in p  # the one-pass mixed-distinct aggregate


def test_rollup_datasheet_is_one_scan_one_exchange(spark):
    """x189: the four grouping sets come from ONE corpus scan through a
    map-side Expand and ONE exchange (the fan-out compresses in the
    partial agg) — not four scans or four shuffles."""
    p = plan_of(spark, "x189_rollup_datasheet")
    assert p.count("- Scan parquet") == 1
    assert "Expand" in p
    assert p.count("Exchange") <= 2  # one agg exchange (+AQE read)


def test_tpch_join_shapes(spark):
    """x193/x194: the date predicates reach the parquet scans
    (PushedFilters), the dim chain broadcasts (x193 ≥3 BHJs — at fleet
    scale AQE keeps dims broadcast and demotes only the fact side),
    and x194's top-10 is TakeOrderedAndProject, never a global sort."""
    p5 = plan_of(spark, "x193_local_supplier_volume")
    assert "GreaterThanOrEqual(o_orderdate" in p5 and "LessThan(o_orderdate" in p5
    assert p5.count("BroadcastHashJoin") >= 3
    p3 = plan_of(spark, "x194_shipping_priority")
    assert "GreaterThan(l_shipdate" in p3 and "LessThan(o_orderdate" in p3
    assert "TakeOrderedAndProject" in p3 and "Sort " not in p3.split("TakeOrderedAndProject")[0]


def test_round9_audit_plans_scan_once(spark):
    """x195/x196/x198: each audit reads the corpus exactly once (the
    shuffles are key-table-sized after the first map-side combine);
    x197 runs exactly one LEFT ANTI per relationship with the three
    dim-side checks broadcast."""
    for name, max_exch in (
        ("x195_event_transitions", 4),   # seq window + bigram agg + totals window + sort
        ("x196_trend_slope", 3),         # (key,day) agg + key agg + sort
        ("x198_k_anonymity", 2),         # class agg + 1-row fold
    ):
        p = plan_of(spark, name)
        tree = p.split("\n\n")[0]
        assert tree.count("- Scan parquet") == 1, name
        assert tree.count("Exchange") <= max_exch, name
    p = plan_of(spark, "x197_referential_audit")
    tree = p.split("\n\n")[0]
    assert tree.count("LeftAnti") == 4
    assert tree.count("BroadcastHashJoin") >= 3


def test_column_stats_is_one_scan(spark):
    """x190: four exact NDVs + per-column min/max/null stats from ONE
    events scan (multi-distinct Expand), unpivoted with stack — not a
    scan per column."""
    p = plan_of(spark, "x190_column_stats")
    assert p.count("- Scan parquet") == 1
    assert "Expand" in p


def test_lang_snapshot_scoring_shuffles_corpus_once(spark):
    """x170's structural claim, pinned: the batch side pays exactly ONE
    shuffle (the doc-keyed aggregation — its hashpartitioning keys on
    doc_id) independent of |langs|; the pivoted profile arrives by
    BroadcastHashJoin; no SortMergeJoin, no cartesian anywhere.  Any
    regression that reintroduces the per-language fanout (x149's
    docs×langs shuffle) changes these invariants."""
    import re

    plan = plan_of(spark, "x170_lang_snapshot_reid")
    assert "SortMergeJoin" not in plan and "Cartesian" not in plan
    assert "BroadcastHashJoin" in plan
    # numbered shuffle-Exchange nodes (BroadcastExchange excluded):
    nodes = re.findall(r"\(\d+\) Exchange", plan)
    parts = re.findall(r"Arguments: hashpartitioning\(([a-zA-Z_#0-9]+)", plan)
    doc_keyed = [p for p in parts if p.startswith("doc_id")]
    # one doc-keyed shuffle (the score agg) + the registered query's
    # (claimed, pred) confusion agg; everything else must be the tiny
    # snapshot-side pivot aggs (b / lang keyed)
    assert len(doc_keyed) == 1, (nodes, parts)
    assert all(
        p.startswith(("doc_id", "b#", "lang", "claimed")) for p in parts
    ), parts


def test_served_forms_never_scan_base_tables(spark):
    """The round-8 served re-registrations, plan-pinned: x137 (eval off
    the standing inverted index) compiles to a plan with ZERO documents
    scans and zero tokenization — workload mining, scoring, and metrics
    all read index files; x166 (leakage off the persisted IVF
    assignment) reads ONLY index files — no embeddings scan, no
    documents scan.  A regression that re-introduces an in-flight
    corpus pass changes these invariants."""
    p137 = plan_of(spark, "x137_retrieval_mrr")
    assert "documents.parquet" not in p137
    assert "regexp_extract_all" not in p137
    p166 = plan_of(spark, "x166_semantic_split_leakage")
    assert "documents.parquet" not in p166
    assert "embeddings.parquet" not in p166


def test_feed_outage_two_level_lag(spark):
    """x202's round-10 rewrite (the r9 verdict's weak mark): the big
    lag window partitions on (day, shard) — never day alone, whose
    partition grows linearly with per-day feed volume — and the result
    is pinned bit-equal to the naive one-window-per-day form on an
    adversarial frame: a tie ON a 15-min shard boundary, an event
    exactly AT a boundary, a multi-shard-spanning (empty-shard) gap,
    and a single-event day that must drop."""
    import datetime as dt

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    plan = plan_of(spark, "x202_feed_outage_audit")
    # the interior window's partition spec carries the range shard
    assert "shard" in plan
    windows = [ln for ln in plan.splitlines() if "Window" in ln]
    assert len(windows) >= 2, windows

    # adversarial fixture (epoch µs hand-picked around 900 s shards)
    day1 = dt.datetime(2023, 3, 6, tzinfo=dt.timezone.utc)
    base = int(day1.timestamp()) * 1_000_000
    shard = 900_000_000
    rows = [
        base + 10,            # shard 0
        base + shard - 1,     # end of shard 0
        base + shard,         # exactly AT the boundary -> shard 1
        base + shard,         # tie at the boundary (event_id breaks it)
        base + 5 * shard + 7, # 4 empty shards in between (straddling gap)
        base + 5 * shard + 7, # tie inside a shard
    ]
    day2 = base + 86_400 * 1_000_000 + 42  # single-event day: must drop
    data = [(i, t) for i, t in enumerate(rows + [day2])]
    ev = spark.createDataFrame(data, "event_id long, tus long").select(
        "event_id", F.timestamp_micros(F.col("tus")).alias("ts")
    )
    # the queried function lives in plans.ext.audits since the round-14
    # split: monkeypatching load_table must hit the OWNING module
    import trimet_bytes__data_engineering_project_spark.plans.ext.audits as ext

    orig = ext.load_table
    try:
        ext.load_table = lambda s, d, n: ev
        got = [tuple(r) for r in QUERIES["x202_feed_outage_audit"](spark, "ignored").collect()]
    finally:
        ext.load_table = orig

    # naive spec form: one window per day
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
    want = [tuple(r) for r in naive.collect()]
    assert got == want and len(got) == 1  # day2 dropped
    assert got[0][1] == 5  # 6 events -> 5 gaps
    # the straddling gap jumps 4 empty shards: 4*shard + 7 µs, just
    # over the 1 h threshold -> outage fires
    assert got[0][2] == 4 * shard + 7 and got[0][3] is True


def test_salted_join_plan_splits_hot_key(spark):
    """x203: with broadcast off, the join is a SortMergeJoin keyed on
    (k, _salt) — the hot key's rows spread over 16 reduce slots — and
    the result is bit-equal to the naive unsalted join (the oracle's
    form).  Under the default session the replicated dim broadcasts,
    which is equally skew-immune."""
    from pyspark.sql import functions as F

    from trimet_bytes__data_engineering_project_spark.plans.tables import load_table

    # default session: the x16-replicated dim broadcasts (equally
    # skew-immune — no reduce partitioning to overload)
    p_default = plan_of(spark, "x203_salted_hot_join")
    assert "BroadcastHashJoin" in p_default and "SortMergeJoin" not in p_default

    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        p = plan_of(spark, "x203_salted_hot_join")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
    assert "SortMergeJoin" in p
    import re

    smj_args = re.search(r"SortMergeJoin[^\n]*\n(?:.*\n)*?.*Left keys \[2\]: \[(k#\d+L?), (_salt#\d+)", p)
    assert smj_args, p[:2000]

    got = [tuple(r) for r in QUERIES["x203_salted_hot_join"](spark, SF_DIR).collect()]
    ev = load_table(spark, SF_DIR, "events").select(
        F.when(F.col("user_id") % 10 < 7, F.lit(0).cast("long"))
        .otherwise(F.col("user_id") % 50).alias("k"),
        "value",
    )
    dim = spark.range(50).select(
        F.col("id").alias("k"),
        F.concat(F.lit("grp-"), F.col("id").cast("string")).alias("label"),
        ((F.col("id") * F.col("id")) % 97).cast("long").alias("weight"),
    )
    naive = (
        ev.join(dim, "k")
        .groupBy("label")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
            F.max("weight").cast("long").alias("weight"),
        )
        .orderBy("label")
    )
    assert got == [tuple(r) for r in naive.collect()]


def test_q18_shape_one_fact_scan_tiny_build_side(spark):
    """x204: the aggregate-then-join-back reads lineitem EXACTLY once
    (the semi-join-back collapses into the two-phase agg), the HAVING
    survivors are the broadcast BUILD side both times (orders and
    customer stream un-shuffled — the 100 TB plan), and the top-100 is
    TakeOrderedAndProject, never a global sort."""
    p = plan_of(spark, "x204_large_customer_orders")
    assert p.count("lineitem.parquet") == 1
    tree = p.split("\n\n")[0]
    assert tree.count("BroadcastHashJoin") == 2
    assert "TakeOrderedAndProject" in tree and "SortMergeJoin" not in tree


def test_point_in_any_polygon_blocks_by_cell(spark):
    """x205: the candidate join is a BroadcastHashJoin against the
    ≤400-row polygon-cell table (points never shuffle), the ray cast is
    a row-local aggregate() fold (no per-(point, edge) Generate above
    the fact side), and the only fact-sized aggregation map-side-
    combines into a ≤100-key count."""
    p = plan_of(spark, "x205_point_in_any_polygon")
    tree = p.split("\n\n")[0]
    assert p.count("lineitem.parquet") == 1
    assert tree.count("BroadcastHashJoin") == 2  # cell join + final left join
    assert "SortMergeJoin" not in tree
    # the two Generates (cell fan-out) sit under the BroadcastExchange,
    # never above the lineitem scan
    import re

    fact_side = p.split("BroadcastExchange")[0]
    assert "Generate" not in fact_side


def test_column_stats_approx_is_expand_free_and_close(spark):
    """x190's built 100-TB form: approx_count_distinct drops the
    map-side Expand from the plan (the exact form multiplies every row
    ×5 and shuffles the full per-column distinct key space; the sketch
    shuffle is constant-size) while counts/nulls/min/max stay EXACT and
    every NDV estimate lands within 3×rsd of the exact form."""
    import contextlib
    import io

    from trimet_bytes__data_engineering_project_spark.plans.extensions import (
        column_stats_approx,
    )

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        column_stats_approx(spark, SF_DIR).explain("formatted")
    plan = buf.getvalue()
    assert "Expand" not in plan
    assert plan.count("- Scan parquet") == 1

    exact_plan = plan_of(spark, "x190_column_stats")
    assert "Expand" in exact_plan  # the shape the swap removes

    approx = {r["col_name"]: r for r in column_stats_approx(spark, SF_DIR).collect()}
    exact = {r["col_name"]: r for r in QUERIES["x190_column_stats"](spark, SF_DIR).collect()}
    assert set(approx) == set(exact)
    for c in exact:
        a, e = approx[c], exact[c]
        # non-NDV statistics are identical, not approximate
        for f in ("n", "n_nulls", "min_num", "max_num", "min_str", "max_str"):
            assert a[f] == e[f], (c, f)
        assert abs(a["ndv"] - e["ndv"]) <= max(1, 0.075 * e["ndv"]), (
            c, a["ndv"], e["ndv"],
        )


def test_exists_decorrelates_to_semi_anti_joins(spark):
    """x206: Catalyst's RewritePredicateSubquery must turn the
    correlated EXISTS into a LeftSemi and the NOT EXISTS into a
    LeftAnti join — never a per-row nested loop or cartesian — with the
    o_orderdate window pushed into the orders scan and the lineitem
    sides pruned to the join key (+ its filter column)."""
    p = plan_of(spark, "x206_returned_orders_exists")
    tree = p.split("\n\n")[0]
    assert "LeftSemi" in tree and "LeftAnti" in tree
    assert "BroadcastNestedLoopJoin" not in tree and "Cartesian" not in tree
    # the date range reaches the orders scan as a pushed filter
    assert "PushedFilters: [IsNotNull(o_orderdate), GreaterThanOrEqual(o_orderdate" in p
    # each correlated lineitem scan reads only what its predicate + key
    # need (column pruning through the rewritten subquery)
    import re

    read_schemas = re.findall(r"ReadSchema: struct<([^>]*)>", p)
    li_schemas = [s for s in read_schemas if "l_orderkey" in s]
    assert li_schemas and all(len(s.split(",")) <= 2 for s in li_schemas), li_schemas


def test_notin_plans_null_aware_anti_join(spark):
    """x208: NOT IN over a nullable key must plan Spark's null-aware
    anti join (BroadcastHashJoin LeftAnti with the isNullAwareAntiJoin
    flag), never a silent rewrite to a plain anti join — and the
    three-valued edge (one NULL in the subquery -> zero rows out) must
    hold in BOTH engines on an injected-NULL fixture."""
    import duckdb

    # explain("formatted") elides the isNullAwareAntiJoin argument;
    # the simple plan string carries it as the trailing flag
    df = QUERIES["x208_unmatched_customers_notin"](spark, SF_DIR)
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti, BuildRight, true" in p, p

    # three-valued edge: a real NULL in the subquery empties the result
    # the queried function lives in plans.ext.scale_probes since the round-14
    # split: monkeypatching load_table must hit the OWNING module
    import trimet_bytes__data_engineering_project_spark.plans.ext.scale_probes as ext
    from pyspark.sql import functions as F

    cust = spark.createDataFrame([(1, "A"), (2, "B")], "c_custkey long, c_mktsegment string")
    orders = spark.createDataFrame(
        [(1, "1995-03-01"), (None, "1995-04-01")],
        "o_custkey long, o_d string",
    ).select("o_custkey", F.col("o_d").cast("timestamp").alias("o_orderdate"))
    orig = ext.load_table
    try:
        ext.load_table = lambda s, d, n: {"customer": cust, "orders": orders}[n]
        got = QUERIES["x208_unmatched_customers_notin"](spark, "ignored").collect()
    finally:
        ext.load_table = orig
    assert got == [], got

    con = duckdb.connect()
    con.execute("CREATE VIEW customer AS SELECT 1 AS c_custkey, 'A' AS c_mktsegment UNION ALL SELECT 2, 'B'")
    con.execute(
        "CREATE VIEW orders AS SELECT 1 AS o_custkey, TIMESTAMP '1995-03-01' AS o_orderdate "
        "UNION ALL SELECT NULL, TIMESTAMP '1995-04-01'"
    )
    from trimet_bytes__data_engineering_project_spark.plans.extensions import _X208_SQL

    assert con.sql(_X208_SQL).fetchall() == []


def test_dynamic_partition_pruning_fires(spark):
    """x209: the fact scan's partition filter must be the RUNTIME
    dynamicpruningexpression injected from the dim's broadcast — the
    literal-free fact⋈calendar join that static pruning cannot help;
    without DPP every partition of the date-partitioned fact is read."""
    df = QUERIES["x209_dynamic_partition_pruning"](spark, SF_DIR)
    qe = df._jdf.queryExecution()
    # executedPlan().toString() TRUNCATES the PartitionFilters list
    # mid-expression ("dy..."), so pin the optimized logical plan's
    # dynamicpruning subquery filter instead
    p = qe.optimizedPlan().toString()
    assert "dynamicpruning" in p.lower(), p
    phys = qe.executedPlan().toString()
    assert "BroadcastHashJoin" in phys, phys
    # bonus constraint propagation: the dim's derived date predicate is
    # ALSO pushed through the join as a static partition filter
    assert "datediff(service_date" in phys


def test_compacted_cms_probe_broadcasts_counters(spark):
    """x212: the heavy-hitter probe over the COMPACTED store keeps
    x185's plan shape — the folded counters (≤ depth·width rows,
    regardless of how many generations fed them) broadcast into the
    probe join; the key side never shuffles for the join.  The store
    read must not change the plan class."""
    plan = plan_of(spark, "x212_compacted_cms_serve")
    assert "BroadcastHashJoin" in plan
    # the probe join itself is never a shuffle join (TakeOrdered's
    # exchange for the top-k is fine; the counters side must broadcast)
    assert "SortMergeJoin" not in plan
