"""Connected-components contracts: exact cluster labels on hand
fixtures, chain convergence via pointer jumping, determinism.
(Cross-engine parity for x34 — CC vs a recursive-CTE closure — is in
test_oracle_parity.py.)
"""

from __future__ import annotations

from pyspark.sql import functions as F

from trimet_bytes__data_engineering_project_spark.operators.graph import (
    connected_components,
)


def _labels(df):
    return {r["node"]: r["cluster_id"] for r in df.collect()}


def test_cc_chain_triangle_and_isolated_pair(spark):
    # chain 1-2-3 (no 1-3 edge), triangle 10-11-12, isolated pair 20-21
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (11, 12), (10, 12), (20, 21)],
        "a_id long, b_id long",
    )
    got = _labels(connected_components(pairs))
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_cc_long_chain_converges(spark):
    # a worst-case path graph: min label must travel the full diameter;
    # pointer jumping makes that O(log n) rounds, well inside max_iter
    n = 64
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "a_id long, b_id long"
    )
    got = _labels(connected_components(pairs))
    assert set(got.values()) == {0}
    assert len(got) == n + 1


def test_cc_deterministic_and_order_independent(spark):
    import random

    edges = [(1, 5), (5, 9), (2, 9), (30, 31), (31, 32), (40, 41)]
    rng = random.Random(7)
    shuffled = edges[:]
    rng.shuffle(shuffled)
    # reversed pair orientation must not change clusters either
    flipped = [(b, a) for a, b in shuffled]
    a = _labels(connected_components(spark.createDataFrame(edges, "a_id long, b_id long")))
    b = _labels(
        connected_components(spark.createDataFrame(flipped, "a_id long, b_id long"))
    )
    assert a == b
    assert a[1] == a[2] == a[5] == a[9] == 1


def test_vector_centroids_deterministic_fold(spark):
    """Centroid = sequential left-to-right fold over members sorted by
    id, then one division — replicated exactly in Python; also stable
    under input order and repartitioning (float addition is not
    associative, so this is a real guarantee, not a tautology)."""
    from trimet_bytes__data_engineering_project_spark.operators.similarity import (
        vector_centroids,
    )

    rows = [
        (1, 10, [0.1, 0.2, 0.30000000000000004]),
        (1, 3, [1.5, -2.25, 0.125]),
        (1, 7, [1e-9, 1e9, -1e-9]),
        (2, 5, [4.0, 5.0, 6.0]),
    ]
    df = spark.createDataFrame(rows, "g int, vec_id long, embedding array<double>")
    got = {
        r["g"]: (r["n_members"], r["centroid"])
        for r in vector_centroids(df, "g").collect()
    }
    for g in (1, 2):
        mem = sorted([(i, v) for gg, i, v in rows if gg == g])
        acc = [0.0] * 3
        for _, v in mem:
            acc = [a + b for a, b in zip(acc, v)]
        expected = [a / len(mem) for a in acc]
        assert got[g][0] == len(mem)
        assert got[g][1] == expected  # bit-exact, no tolerance
    # order/partitioning independence
    shuffled = spark.createDataFrame(
        list(reversed(rows)), "g int, vec_id long, embedding array<double>"
    ).repartition(7)
    got2 = {
        r["g"]: (r["n_members"], r["centroid"])
        for r in vector_centroids(shuffled, "g").collect()
    }
    assert got == got2


def test_cluster_dedup_keeps_one_representative_with_size(spark):
    """Chain 1~2, 2~3 plus isolated pair 7~9 plus untouched docs 4, 5:
    survivors are exactly {1 (n=3), 7 (n=2), 4 (n=1), 5 (n=1)} — the
    maximal-retention policy (pairwise would also keep only min ids
    here, but sizes prove the cluster view)."""
    from trimet_bytes__data_engineering_project_spark.operators.graph import (
        cluster_dedup,
        connected_components,
    )

    docs = spark.createDataFrame([(i,) for i in (1, 2, 3, 4, 5, 7, 9)], ["doc_id"])
    pairs = spark.createDataFrame([(1, 2), (2, 3), (7, 9)], ["a_id", "b_id"])
    comp = connected_components(pairs)
    got = {
        r["doc_id"]: r["n_members"]
        for r in cluster_dedup(docs, "doc_id", comp).collect()
    }
    assert got == {1: 3, 7: 2, 4: 1, 5: 1}


def test_small_graph_fast_path_equals_distributed(spark):
    """The driver-side union-find fast path returns exactly the
    distributed label-propagation result (same min-id labels) on a
    graph with chains, cliques, and singletons-in-pairs; threshold 0
    forces the distributed path."""
    from trimet_bytes__data_engineering_project_spark.operators.graph import (
        connected_components,
    )

    edges = [(1, 2), (2, 3), (3, 4), (10, 11), (11, 10), (20, 21), (21, 22), (20, 22), (30, 31)]
    pairs = spark.createDataFrame(edges, ["a_id", "b_id"])
    fast = {(r["node"], r["cluster_id"]) for r in connected_components(pairs).collect()}
    dist = {
        (r["node"], r["cluster_id"])
        for r in connected_components(pairs, small_graph_threshold=0).collect()
    }
    assert fast == dist
    assert ({(1, 1), (2, 1), (3, 1), (4, 1), (30, 30), (31, 30)} <= fast)

def test_cc_null_edges_dropped_and_schema_stable_both_paths(spark):
    """An edge with a NULL endpoint is no edge (it used to crash the
    fast path's driver union-find with a None comparison and silently
    half-join in the distributed path), and both paths return the same
    `node long, cluster_id long` schema regardless of input int width
    or which branch ran."""
    from trimet_bytes__data_engineering_project_spark.operators.graph import (
        connected_components,
    )

    edges = [(1, 2), (None, 3), (4, None), (2, 5)]
    pairs = spark.createDataFrame(edges, "a_id int, b_id int")  # int, not long
    for threshold in (50_000, 0):
        comp = connected_components(pairs, small_graph_threshold=threshold)
        assert [f.dataType.simpleString() for f in comp.schema.fields] == ["bigint", "bigint"]
        got = {(r["node"], r["cluster_id"]) for r in comp.collect()}
        # 3 and 4 only appeared on null edges -> not nodes at all
        assert got == {(1, 1), (2, 1), (5, 1)}


def test_cluster_dedup_quality_aware_keeps_best_member(spark):
    """score_col selects each cluster's highest-score member (ties by
    min id), unclustered docs always survive, and n_members still
    reports the represented cluster's size."""
    from pyspark.sql import functions as F

    from trimet_bytes__data_engineering_project_spark.operators.graph import (
        cluster_dedup,
        connected_components,
    )

    # cluster {1,2,3} (chain), cluster {10,11} (tie on score -> min id), 99 alone
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], ["a_id", "b_id"]
    )
    docs = spark.createDataFrame(
        [(1, 5), (2, 9), (3, 7), (10, 4), (11, 4), (99, 1)], ["doc_id", "score"]
    )
    comp = connected_components(pairs)
    got = {
        r.doc_id: r.n_members
        for r in cluster_dedup(docs, "doc_id", comp, score_col="score").collect()
    }
    assert got == {2: 3, 10: 2, 99: 1}  # 2 beats min-id 1; tie keeps 10
    # min-id policy on the same graph keeps 1, not 2
    baseline = {
        r.doc_id: r.n_members
        for r in cluster_dedup(docs, "doc_id", comp).collect()
    }
    assert baseline == {1: 3, 10: 2, 99: 1}


def test_pagerank_hand_pin(spark):
    """Path 1-2-3 (symmetrized) + isolated 4, scale=1000, 2 rounds —
    every value hand-derived with the integer div at each step: the
    center outranks the leaves, the isolated node holds the teleport
    floor (15000 div 100 = 150 at scale 1000)."""
    from trimet_bytes__data_engineering_project_spark.operators.graph import pagerank

    und = [(1, 2), (2, 3)]
    edges = spark.createDataFrame(
        und + [(b, a) for a, b in und], "src long, dst long"
    )
    nodes = spark.createDataFrame([(1,), (2,), (3,), (4,)], "node_id long")
    got = {
        r.node_id: r.rank_fp
        for r in pagerank(edges, nodes, iters=2, scale=1000).collect()
    }
    # iter1: r(1)=r(3)=(15000+85*500)div 100=575,
    #        r(2)=(15000+85*2000)div 100=1850, r(4)=150
    # iter2: r(1)=r(3)=(15000+85*(1850 div 2))div 100=936,
    #        r(2)=(15000+85*(575+575))div 100=1127, r(4)=150
    assert got == {1: 936, 2: 1127, 3: 936, 4: 150}


def test_pagerank_dangling_and_directed(spark):
    """Directed edge 1->2 only: node 1 has no in-links (pure teleport
    each round), node 2 accumulates 1's full rank (deg=1), and 2's
    rank never flows anywhere (dangling — mass leaves circulation by
    design, the non-redistributing variant)."""
    from trimet_bytes__data_engineering_project_spark.operators.graph import pagerank

    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    nodes = spark.createDataFrame([(1,), (2,)], "node_id long")
    got = {
        r.node_id: r.rank_fp
        for r in pagerank(edges, nodes, iters=2, scale=1000).collect()
    }
    # iter1: r(1)=(15000+0)div 100=150, r(2)=(15000+85*1000)div 100=1000
    # iter2: r(1)=150, r(2)=(15000+85*150)div 100=277 (1's rank is now 150)
    assert got == {1: 150, 2: 277}


def test_pagerank_null_edge_dropped_and_rank_sum_bounded(spark):
    """NULL endpoints are no edge; total fixed-point mass never
    exceeds n*scale (floors only ever leak mass out)."""
    from trimet_bytes__data_engineering_project_spark.operators.graph import pagerank

    und = [(1, 2), (2, 3), (1, 3)]
    edges = spark.createDataFrame(
        und + [(b, a) for a, b in und] + [(None, 1), (2, None)],
        "src long, dst long",
    )
    nodes = spark.createDataFrame([(i,) for i in range(1, 4)], "node_id long")
    rows = pagerank(edges, nodes, iters=3, scale=10**9).collect()
    got = {r.node_id: r.rank_fp for r in rows}
    # symmetric triangle: all equal, just under scale (floor leakage)
    assert len(set(got.values())) == 1
    assert 0 < got[1] <= 10**9
    assert sum(got.values()) <= 3 * 10**9


def test_personalized_pagerank_hand_pin(spark):
    """Seed {1} on path 1-2-3 + isolated 4: teleport lands only on the
    seed, start vector is the seed indicator, node 4 (unreachable)
    stays exactly 0.  Every value hand-derived."""
    from trimet_bytes__data_engineering_project_spark.operators.graph import pagerank

    und = [(1, 2), (2, 3)]
    edges = spark.createDataFrame(
        und + [(b, a) for a, b in und], "src long, dst long"
    )
    nodes = spark.createDataFrame([(1,), (2,), (3,), (4,)], "node_id long")
    seeds = spark.createDataFrame([(1,)], "node_id long")
    got = {
        r.node_id: r.rank_fp
        for r in pagerank(edges, nodes, iters=2, scale=1000, seeds=seeds).collect()
    }
    # iter1: r(1)=15000 div 100=150, r(2)=(85*1000) div 100=850, r(3)=r(4)=0
    # iter2: r(1)=(15000+85*425) div 100=511, r(2)=(85*150) div 100=127,
    #        r(3)=(85*425) div 100=361, r(4)=0
    assert got == {1: 511, 2: 127, 3: 361, 4: 0}


def test_weighted_pagerank_hand_pin(spark):
    """Edges 1->2 (w=3), 1->3 (w=1): node 1's rank splits 3:1 by
    weight; unit weights reproduce the unweighted operator exactly."""
    from trimet_bytes__data_engineering_project_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(1, 2, 3), (1, 3, 1)], "src long, dst long, w long"
    )
    nodes = spark.createDataFrame([(1,), (2,), (3,)], "node_id long")
    got = {
        r.node_id: r.rank_fp
        for r in pagerank(
            edges, nodes, iters=1, scale=1000, weight_col="w"
        ).collect()
    }
    # wsum(1)=4; c(2)=(1000*3) div 4=750, c(3)=250
    # r(2)=(15000+85*750) div 100=787, r(3)=(15000+85*250) div 100=362
    assert got == {1: 150, 2: 787, 3: 362}
    # unit weights == unweighted
    und = [(1, 2), (2, 3)]
    e2 = spark.createDataFrame(
        und + [(b, a) for a, b in und], "src long, dst long"
    )
    n2 = spark.createDataFrame([(1,), (2,), (3,), (4,)], "node_id long")
    plain = {r.node_id: r.rank_fp for r in pagerank(e2, n2, iters=2, scale=1000).collect()}
    w1 = {
        r.node_id: r.rank_fp
        for r in pagerank(
            e2.withColumn("w", F.lit(1)), n2, iters=2, scale=1000, weight_col="w"
        ).collect()
    }
    assert plain == w1 == {1: 936, 2: 1127, 3: 936, 4: 150}


def test_hits_hand_pin(spark):
    """Star 1->3, 2->3 plus 3->4, scale=1000, 1 round — every value
    hand-derived with the divide-by-quotient normalization.
    a-step raw: a(3)=h(1)+h(2)=2000, a(4)=h(3)=1000; S=3000,
    q=S div 1000=3 -> a(3)=666, a(4)=333, a(1)=a(2)=0.
    h-step raw: h(1)=h(2)=a(3)=666, h(3)=a(4)=333; S=1665,
    q=1 -> hubs unchanged by division."""
    from trimet_bytes__data_engineering_project_spark.operators.graph import hits

    edges = spark.createDataFrame(
        [(1, 3), (2, 3), (3, 4)], "src long, dst long"
    )
    nodes = spark.createDataFrame([(i,) for i in range(1, 5)], "node_id long")
    got = {
        r.node_id: (r.hub_fp, r.auth_fp)
        for r in hits(edges, nodes, iters=1, scale=1000).collect()
    }
    assert got == {1: (666, 0), 2: (666, 0), 3: (333, 666), 4: (0, 333)}


def test_hits_empty_graph_and_null_edges(spark):
    """No edges (or only NULL-endpoint edges): all scores collapse to
    exactly 0 after the first normalization — no NULLs, no crash."""
    from trimet_bytes__data_engineering_project_spark.operators.graph import hits

    edges = spark.createDataFrame([(None, 1)], "src long, dst long")
    nodes = spark.createDataFrame([(1,), (2,)], "node_id long")
    got = {
        r.node_id: (r.hub_fp, r.auth_fp)
        for r in hits(edges, nodes, iters=2, scale=1000).collect()
    }
    assert got == {1: (0, 0), 2: (0, 0)}


def test_hits_mass_bounded(spark):
    """On a symmetric triangle both score vectors stay bounded by
    ~n*scale after normalization (truncation only leaks mass)."""
    from trimet_bytes__data_engineering_project_spark.operators.graph import hits

    und = [(1, 2), (2, 3), (1, 3)]
    edges = spark.createDataFrame(
        und + [(b, a) for a, b in und], "src long, dst long"
    )
    nodes = spark.createDataFrame([(i,) for i in range(1, 4)], "node_id long")
    rows = hits(edges, nodes, iters=3, scale=10**6).collect()
    assert sum(r.hub_fp for r in rows) <= 3 * 10**6
    assert sum(r.auth_fp for r in rows) <= 3 * 10**6
    # symmetric graph: all nodes identical
    assert len({(r.hub_fp, r.auth_fp) for r in rows}) == 1


def test_propagate_labels_hand_pin(spark):
    """Path 1-2-3-4 (symmetrized), seed labels 1->10, 4->20.
    Round 1: node 2 sees {10}, node 3 sees {20}; seeds clamped.
    Round 2 recomputes every non-seed from the round-1 labeling:
    node 2 sees votes {10 from 1, 20 from 3} -> tie -> min label 10;
    node 3 sees {10 from 2, 20 from 4} -> ALSO a tie -> 10 (the
    synchronous-update + min-tie-break contract: round-1 winners are
    not sticky, only seeds are clamped)."""
    from trimet_bytes__data_engineering_project_spark.operators.graph import (
        propagate_labels,
    )

    und = [(1, 2), (2, 3), (3, 4)]
    edges = spark.createDataFrame(
        und + [(b, a) for a, b in und], "src long, dst long"
    )
    seeds = spark.createDataFrame([(1, 10), (4, 20)], "node_id long, label long")
    got = {
        r.node_id: (r.label, r.is_seed)
        for r in propagate_labels(edges, seeds, iters=2).collect()
    }
    assert got == {1: (10, 1), 2: (10, 0), 3: (10, 0), 4: (20, 1)}


def test_propagate_labels_majority_beats_tiebreak(spark):
    """Node 5 has two label-30 neighbors and one label-10 neighbor:
    majority (2 votes) wins over the smaller label."""
    from trimet_bytes__data_engineering_project_spark.operators.graph import (
        propagate_labels,
    )

    edges = spark.createDataFrame(
        [(1, 5), (2, 5), (3, 5)], "src long, dst long"
    )
    seeds = spark.createDataFrame(
        [(1, 30), (2, 30), (3, 10)], "node_id long, label long"
    )
    got = {
        r.node_id: (r.label, r.is_seed)
        for r in propagate_labels(edges, seeds, iters=1).collect()
    }
    assert got[5] == (30, 0)


def test_propagate_labels_unreached_absent_and_clamp(spark):
    """A node with no labeled neighbors within iters hops stays absent;
    a seed adjacent to a differently-labeled majority keeps its own
    label (clamping)."""
    from trimet_bytes__data_engineering_project_spark.operators.graph import (
        propagate_labels,
    )

    # 1(seed 10) - 2 - 3 - 4 : with iters=1 only node 2 is reached.
    # 5,6 (seeds 99) both point at 1: clamped 1 keeps label 10.
    und = [(1, 2), (2, 3), (3, 4)]
    edges = spark.createDataFrame(
        und + [(b, a) for a, b in und] + [(5, 1), (6, 1)],
        "src long, dst long",
    )
    seeds = spark.createDataFrame(
        [(1, 10), (5, 99), (6, 99)], "node_id long, label long"
    )
    got = {
        r.node_id: (r.label, r.is_seed)
        for r in propagate_labels(edges, seeds, iters=1).collect()
    }
    assert 3 not in got and 4 not in got
    assert got[1] == (10, 1)
    assert got[2] == (10, 0)


def test_triangle_stats_hand_pin(spark):
    """Triangle 1-2-3 + pendant 3-4 + isolated pair 5-6: per-node
    triangle counts and degrees exact; duplicate/reversed/self edges
    collapse."""
    from trimet_bytes__data_engineering_project_spark.operators.graph import (
        triangle_stats,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (5, 6), (2, 1), (1, 1), (None, 2)],
        "a_id long, b_id long",
    )
    got = {
        r.node: (r.degree, r.n_triangles)
        for r in triangle_stats(pairs).collect()
    }
    assert got == {
        1: (2, 1), 2: (2, 1), 3: (3, 1), 4: (1, 0), 5: (1, 0), 6: (1, 0),
    }


def test_triangle_stats_k4(spark):
    """K4: every node has degree 3 and sits in C(3,2)=3 triangles;
    4 triangles total counted once each."""
    from trimet_bytes__data_engineering_project_spark.operators.graph import (
        triangle_stats,
    )

    import itertools

    pairs = spark.createDataFrame(
        list(itertools.combinations(range(4), 2)), "a_id long, b_id long"
    )
    rows = triangle_stats(pairs).collect()
    assert {r.node: (r.degree, r.n_triangles) for r in rows} == {
        i: (3, 3) for i in range(4)
    }
    assert sum(r.n_triangles for r in rows) == 12  # 3 nodes x 4 triangles


def test_merge_components_bit_equal_to_full_recompute(spark):
    """Incremental CC (x188's operator): folding a new edge batch into
    a stored labeling via star compression gives EXACTLY the full
    recompute's min-id labels — for every split of the edge set, for
    chained increments, and for singleton components with no new
    edges.  Both the driver fast path and the distributed path."""
    from pyspark.sql import functions as F

    from trimet_bytes__data_engineering_project_spark.operators.graph import (
        connected_components,
        merge_components,
    )

    # deterministic mixed graph: chains of 5, one big hub, singletons
    edges = [(i, i + 1) for i in range(0, 50) if i % 5 != 4]
    edges += [(100, 100 + i) for i in range(1, 8)]
    edges += [(200, 200), (201, 201)]  # self-loop singletons
    df = spark.createDataFrame(edges, "a_id long, b_id long")
    full = sorted(map(tuple, connected_components(df).collect()))

    for mod in (2, 3):
        old = df.filter((F.col("a_id") + F.col("b_id")) % mod == 0)
        new = df.filter((F.col("a_id") + F.col("b_id")) % mod != 0)
        store = connected_components(old)
        got = sorted(map(tuple, merge_components(store, new).collect()))
        assert got == full

    # chained: fold three generations one at a time
    gens = [df.filter(F.col("a_id") % 3 == g) for g in range(3)]
    labels = connected_components(gens[0])
    for g in gens[1:]:
        labels = merge_components(labels, g)
    assert sorted(map(tuple, labels.collect())) == full

    # singletons survive a merge that doesn't touch them
    assert (200, 200) in full and (201, 201) in full

    # distributed path (fast path disabled) agrees
    store = connected_components(
        df.filter((F.col("a_id") + F.col("b_id")) % 2 == 0), small_graph_threshold=0
    )
    got = sorted(
        map(
            tuple,
            merge_components(
                store,
                df.filter((F.col("a_id") + F.col("b_id")) % 2 != 0),
                small_graph_threshold=0,
            ).collect(),
        )
    )
    assert got == full


def test_streaming_components_equals_batch_and_replays(spark, tmp_path):
    """Streamed label-store maintenance (streaming/graph.py): after two
    pair landings the served labeling equals connected_components over
    the UNION of all landed pairs (star-compression exactness carried
    into the lifecycle); replaying the stream rewrites identical
    generations (fold idempotence)."""
    import glob
    import os
    import shutil

    from trimet_bytes__data_engineering_project_spark.operators.graph import (
        connected_components,
    )
    from trimet_bytes__data_engineering_project_spark.streaming.graph import (
        components_from_store,
        latest_label_generation,
        run_streaming_components,
    )

    edges = [(i, i + 1) for i in range(0, 40) if i % 5 != 4] + [(300, 300)]
    df = spark.createDataFrame(edges, "a_id long, b_id long")
    gen_a = df.filter("(a_id + b_id) % 2 = 0")
    gen_b = df.filter("(a_id + b_id) % 2 <> 0")

    landing = str(tmp_path / "landing")
    os.makedirs(landing)

    def land_file(d, name):
        t = str(tmp_path / f"w_{name}")
        d.coalesce(1).write.parquet(t)
        shutil.move(glob.glob(f"{t}/part-*.parquet")[0], f"{landing}/{name}.parquet")

    store, ck = str(tmp_path / "store"), str(tmp_path / "ck")
    land_file(gen_a, "a")
    run_streaming_components(spark, landing, store, ck)
    land_file(gen_b, "b")
    run_streaming_components(spark, landing, store, ck)

    got = sorted(map(tuple, components_from_store(spark, store).collect()))
    want = sorted(map(tuple, connected_components(df).collect()))
    assert got == want and (300, 300) in got
    assert latest_label_generation(spark, store) == 1

    run_streaming_components(spark, landing, store, ck)  # replay: no-op
    assert sorted(map(tuple, components_from_store(spark, store).collect())) == got
