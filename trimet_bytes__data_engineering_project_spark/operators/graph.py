"""Iterative graph operators over candidate-pair lists.

Connected components turns a near-dup PAIR list (the output of
``operators/dedup.py:minhash_candidates`` / query x07) into transitive
duplicate CLUSTERS — the semantics ``dedup_keep_representatives``
documents as "the iterative alternative when maximal retention
matters": one representative per component instead of dropping every
pair-loser, so a chain a~b, b~c keeps exactly one of {a, b, c}.

Algorithm: **hash-min label propagation with pointer jumping** (the
DataFrame form of the classic Pregel/map-reduce CC — cf. Kiveris et
al., "Connected Components in MapReduce and Beyond", SoCC'14; this is
the simple hash-min variant with a label-shortcut step, not the full
large-star/small-star optimization, which only pays off when component
diameters are large).  Every node starts labeled with its own id; each
iteration takes the min label over its neighbors, then shortcuts
through its current label's label (pointer jump), halving the distance
a label still has to travel — O(log diameter) rounds instead of
O(diameter).

Scale shape per iteration: two equi-joins keyed on node id (neighbor
min + pointer jump), each a plain shuffle on the id — payload is two
longs per node, never document content.  The driver syncs once per
iteration on a convergence count (standard for iterative graph jobs;
rounds are O(log d), and near-dup components in practice have tiny
diameters — boilerplate clusters are near-cliques).  Lineage is cut
every iteration with an eager ``localCheckpoint`` so the plan does not
grow with the round count (on a cluster with a configured checkpoint
dir, ``checkpoint()`` is the fault-tolerant swap-in).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    nodes: DataFrame,
    iters: int = 3,
    damping_num: int = 85,
    damping_den: int = 100,
    scale: int = 10**9,
    src_col: str = "src",
    dst_col: str = "dst",
    node_col: str = "node_id",
    seeds: DataFrame | None = None,
    weight_col: str | None = None,
) -> DataFrame:
    """Fixed-iteration PageRank in INTEGER fixed point — link-analysis
    centrality over a derived graph (the quality-signal family:
    Common Crawl ranks hosts by centrality before content ever gets
    scored; over a near-dup or kNN graph the same iteration scores
    REPRESENTATIVENESS — well-connected documents rank above
    satellites).

    Arithmetic contract (the repo's no-libm convention): every rank is
    an int64 at ``scale`` (r=scale means rank 1.0).  One iteration is

        r'(v) = ((den-num)*scale + num * sum_{u->v} (r(u) div deg(u))) div den

    with ``div`` truncating non-negative integers — identical in Spark
    and any ANSI engine (DuckDB ``//``), so ``iters`` rounds are
    bit-reproducible with NO float in the loop.  The floor in
    ``r div deg`` leaks at most deg-1 units of 1e-9 mass per node per
    round (documented, deterministic); dangling nodes (no out-edges)
    keep their mass out of circulation, the plain non-redistributing
    variant of Page et al. 1999.  Int64 ceiling: a node's in-sum is
    bounded by total mass ~ n*scale, so ``num * n * scale < 2^63``
    needs n < 1.08e8 at the default scale — drop ``scale`` to 10**6
    for 1e11-node graphs (documented tradeoff: 6 fixed-point digits).

    Scale shape: ``edges`` (+out-degree) and ``nodes`` are
    localCheckpointed ONCE so the upstream graph derivation (LSH
    banding, kNN) does not re-execute per round — the x100
    multi-consumer rule; each round is then one equi-join of ranks
    into edges on ``src`` and one agg shuffle on ``dst`` (payload two
    longs — never content), the same two-shuffle round shape as
    :func:`connected_components`, with a fixed round count instead of
    a convergence probe (PageRank is an anytime algorithm; rank ORDER
    stabilizes in a handful of rounds on power-law graphs).

    ``weight_col``: optional INTEGER edge-weight column on ``edges`` —
    a node's rank splits proportionally to weight instead of evenly:
    ``contribution(u->v) = (r(u) * w_uv) div (sum_w out of u)``, still
    pure int64 (weighted near-dup graphs: a 120/128-band match should
    pull more rank than a 32/128 one).  Weights must be positive
    integers; the ceiling tightens to ``num * n * scale * max_w <
    2^63`` — at max_w=128 and scale 1e9, n < 8e5 per component, so
    drop ``scale`` to 1e6 for 1e9-node weighted graphs (same remedy
    as the unweighted bound, three fewer digits).

    ``seeds``: optional 1-column DataFrame of node ids — PERSONALIZED
    PageRank (Page et al.'s biased-restart form): the teleport term
    lands only on seed nodes (each seed gets the full per-node
    teleport; non-seeds get zero) and the start vector is
    seed-indicator * scale, so rank becomes graph PROXIMITY TO THE
    SEED SET — the propagate-trust-from-a-curated-set recipe
    (label propagation for quality: score every document by its
    near-dup-graph closeness to vetted seeds).  Nodes unreachable
    from any seed stay exactly 0 — integer arithmetic, no epsilon
    floor.  The seed set is broadcast (a curated set is small by
    contract).

    Edge-list contract (matching :func:`propagate_labels`): the input
    is read as a MULTIGRAPH — a duplicate (src, dst) row is a parallel
    edge and doubles that edge's degree share and contribution (it is
    NOT deduplicated here, because additive parallel edges are a
    legitimate weighting; pre-``.distinct()`` if your derivation can
    emit repeats).  Directed semantics: rank flows src→dst only — for
    the undirected near-dup graphs (x125/x135/x141) callers must emit
    BOTH directions of every pair, exactly as propagate_labels
    documents.

    Returns (``node_col``, rank_fp) — rank_fp int64 at ``scale``.
    Isolated nodes converge to (den-num)*scale div den (uniform
    mode) / exactly 0 (personalized mode, non-seed)."""
    wcol = (
        F.col(weight_col).cast("long") if weight_col is not None else F.lit(1)
    )
    e = (
        edges.select(
            F.col(src_col).cast("long").alias("src"),
            F.col(dst_col).cast("long").alias("dst"),
            wcol.cast("long").alias("w"),
        )
        .where(F.col("src").isNotNull() & F.col("dst").isNotNull())
    )
    deg = e.groupBy("src").agg(F.sum("w").cast("long").alias("deg"))
    ed = e.join(deg, "src").localCheckpoint(eager=False)
    base = (
        nodes.select(F.col(node_col).cast("long").alias("node_id"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    teleport = (damping_den - damping_num) * scale
    if seeds is not None:
        seed_ids = seeds.select(
            F.col(seeds.columns[0]).cast("long").alias("node_id")
        ).distinct()
        base = base.join(
            F.broadcast(seed_ids.withColumn("_seed", F.lit(1))), "node_id", "left"
        ).withColumn("_seed", F.coalesce(F.col("_seed"), F.lit(0))).localCheckpoint(
            eager=False
        )
        ranks = base.withColumn(
            "rank_fp", (F.col("_seed") * F.lit(scale)).cast("long")
        ).select("node_id", "rank_fp")
        tele_expr = f"_seed * {teleport}L"
    else:
        base = base.withColumn("_seed", F.lit(1))
        ranks = base.select("node_id").withColumn(
            "rank_fp", F.lit(scale).cast("long")
        )
        tele_expr = f"{teleport}L"
    for _ in range(iters):
        contrib = (
            ed.join(ranks.withColumnRenamed("node_id", "src"), "src")
            .groupBy(F.col("dst").alias("node_id"))
            .agg(
                F.sum(F.expr("(rank_fp * w) div deg")).cast("long").alias("csum")
            )
        )
        ranks = (
            base.join(contrib, "node_id", "left")
            .withColumn("csum", F.coalesce(F.col("csum"), F.lit(0).cast("long")))
            .selectExpr(
                "node_id",
                f"CAST(({tele_expr} + {damping_num}L * csum) div {damping_den}L"
                " AS LONG) AS rank_fp",
            )
        )
    return ranks.select(F.col("node_id").alias(node_col), "rank_fp")


def hits(
    edges: DataFrame,
    nodes: DataFrame,
    iters: int = 2,
    scale: int = 10**6,
    src_col: str = "src",
    dst_col: str = "dst",
    node_col: str = "node_id",
) -> DataFrame:
    """Fixed-iteration HITS (Kleinberg 1999) in INTEGER fixed point —
    the hubs-and-authorities complement of :func:`pagerank` for
    DIRECTED derived graphs.  Over a containment-oriented near-dup
    graph (fragment → container) authority scores surface the
    CANONICAL long documents many fragments point into, hub scores
    the aggregator/boilerplate pages stitched out of many sources —
    exactly the two roles a dedup policy treats differently (keep
    authorities, drop hubs).

    Arithmetic contract (the repo's no-libm convention): one round is

        a(v)  = sum over u->v of h(u);  then a /= max(1, sum(a) div scale)
        h(u)  = sum over u->v of a(v);  then h /= max(1, sum(h) div scale)

    — the classic normalize-each-half-step iteration with the L1
    normalizer rounded DOWN to an integer quotient (divide-by-quotient
    instead of multiply-then-divide so no intermediate exceeds the sum
    itself).  All int64, truncating ``div`` only: ``iters`` rounds are
    bit-reproducible in Spark and any ANSI engine (DuckDB ``//``).
    Each node's post-normalization score is ~``scale`` * its L1 share;
    truncation loses at most 1 unit per node per half-step
    (deterministic).  Int64 ceiling: the raw in-sum is bounded by
    E*scale (every normalized score ≤ ~scale after round 1), so
    ``E * scale < 2^63`` needs E < 9.2e12 edges at the default scale —
    effectively unbounded; drop ``scale`` for denser graphs.

    Scale shape: identical to :func:`pagerank` — edges and the node
    base are localCheckpointed ONCE; each half-step is one equi-join
    of scores into edges plus one agg shuffle keyed on the opposite
    endpoint (payload two longs), and the L1 normalizer is a 1-row
    broadcast (the same shape as unigram_surprisal's grand total).

    Returns (``node_col``, hub_fp, auth_fp).  Empty graph: every
    score 0 after the first normalization (sum 0 → divisor 1 → raw 0).
    Nodes with no in-edges hold auth_fp 0; no out-edges → hub_fp 0."""
    e = edges.select(
        F.col(src_col).cast("long").alias("src"),
        F.col(dst_col).cast("long").alias("dst"),
    ).where(F.col("src").isNotNull() & F.col("dst").isNotNull()).localCheckpoint(
        eager=False
    )
    base = (
        nodes.select(F.col(node_col).cast("long").alias("node_id"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    hubs = base.withColumn("hub_fp", F.lit(scale).cast("long"))
    auth = base.withColumn("auth_fp", F.lit(0).cast("long"))

    def _half_step(scores: DataFrame, score_col: str, join_on: str, out_col: str):
        # sum the joined endpoint's score grouped by the other endpoint,
        # then divide every raw sum by the integer L1 quotient
        other = "dst" if join_on == "src" else "src"
        raw = (
            e.join(scores.withColumnRenamed("node_id", join_on), join_on)
            .groupBy(F.col(other).alias("node_id"))
            .agg(F.sum(score_col).cast("long").alias("raw"))
        )
        filled = base.join(raw, "node_id", "left").withColumn(
            "raw", F.coalesce(F.col("raw"), F.lit(0).cast("long"))
        )
        s = filled.agg(F.sum("raw").cast("long").alias("s"))
        return filled.join(F.broadcast(s)).selectExpr(
            "node_id",
            f"CAST(raw div greatest(CAST(1 AS LONG), s div CAST({scale} AS LONG))"
            f" AS LONG) AS {out_col}",
        )

    for _ in range(iters):
        auth = _half_step(hubs, "hub_fp", "src", "auth_fp")
        hubs = _half_step(auth, "auth_fp", "dst", "hub_fp")
    return (
        hubs.join(auth, "node_id")
        .select(F.col("node_id").alias(node_col), "hub_fp", "auth_fp")
    )


def propagate_labels(
    edges: DataFrame,
    seeds: DataFrame,
    iters: int = 2,
    src_col: str = "src",
    dst_col: str = "dst",
    node_col: str = "node_id",
    label_col: str = "label",
) -> DataFrame:
    """Semi-supervised label propagation with CLAMPED seeds — majority
    vote over labeled neighbors, the cheap transductive classifier a
    pipeline runs when a small vetted set (human quality labels, a
    curated domain list) should spread across a similarity graph
    (near-dup, kNN): an unlabeled document inherits the label most of
    its labeled neighbors carry.  cf. Zhu & Ghahramani 2002's
    iterative form, discretized to hard votes so every step is exact
    integer arithmetic (no float diffusion to diverge across engines).

    Semantics per round: every currently-labeled node votes its label
    along each out-edge; a node's new label is the label with the
    most votes, ties broken by the SMALLEST label (deterministic,
    engine-portable).  Seed nodes are clamped — they never change.
    Unreached nodes stay unlabeled (absent from the output); ``iters``
    rounds spread labels ``iters`` hops.  Pass symmetrized edges for
    undirected graphs (the near-dup convention, x125/x135).

    Scale shape: per round, one equi-join of the label table into
    edges on the voter endpoint, one (node, label) count agg, one
    argmax window partitioned by node over the VOTE table (bounded by
    the label alphabet per node, never corpus-wide), and one
    anti-join to re-clamp seeds — every shuffle keys on node id with
    two-long payloads.  Label tables are localCheckpointed per round
    so the plan does not grow with ``iters``.

    Returns (``node_col``, ``label_col``, is_seed) — is_seed 1 for
    clamped seed rows, 0 for propagated ones."""
    from pyspark.sql import Window

    e = edges.select(
        F.col(src_col).cast("long").alias("src"),
        F.col(dst_col).cast("long").alias("dst"),
    ).where(F.col("src").isNotNull() & F.col("dst").isNotNull()).localCheckpoint(
        eager=False
    )
    seed = (
        seeds.select(
            F.col(node_col).cast("long").alias("node_id"),
            F.col(label_col).cast("long").alias("label"),
        )
        .where(F.col("node_id").isNotNull() & F.col("label").isNotNull())
        .groupBy("node_id")
        .agg(F.min("label").alias("label"))  # one label per seed node
        .localCheckpoint(eager=False)
    )
    labels = seed
    w = Window.partitionBy("node_id").orderBy(F.desc("votes"), F.asc("label"))
    for _ in range(iters):
        votes = (
            e.join(labels.withColumnRenamed("node_id", "src"), "src")
            .groupBy(F.col("dst").alias("node_id"), "label")
            .agg(F.count("*").cast("long").alias("votes"))
        )
        winners = (
            votes.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("node_id", "label")
        )
        labels = seed.unionByName(
            winners.join(seed.select("node_id"), "node_id", "left_anti")
        ).localCheckpoint(eager=False)
    return (
        labels.join(
            seed.select("node_id").withColumn("_s", F.lit(1)), "node_id", "left"
        )
        .select(
            F.col("node_id").alias(node_col),
            F.col("label").alias(label_col),
            F.coalesce(F.col("_s"), F.lit(0)).cast("int").alias("is_seed"),
        )
    )


def triangle_stats(
    pairs: DataFrame, a_col: str = "a_id", b_col: str = "b_id"
) -> DataFrame:
    """Per-node triangle counts + degree over an undirected pair list —
    the graph-density audit for a near-dup graph: boilerplate families
    are near-cliques (high triangle count relative to degree), while
    chains of marginal matches are triangle-free, so the local
    clustering coefficient separates "true duplicate cluster" from
    "LSH chaining artifact" before any dedup policy runs.

    Algorithm: DEGREE-ORDERED ORIENTATION (the standard distributed
    triangle count — cf. Suri & Vassilvitskii, WWW'11): orient every
    undirected edge from the lower-(degree, id) endpoint to the
    higher one; every triangle then has exactly ONE wedge u→v, u→w
    with v→w, so joining the oriented list with itself on the wedge
    apex and closing against the oriented list counts each triangle
    exactly once, and the join fan-out per node is bounded by its
    ORIENTED out-degree ≤ O(sqrt(E)) on any graph (the arboricity
    bound) — never the raw degree, which is what makes this survive
    power-law hubs at scale.

    Scale shape: dedup/symmetrize shuffles on the edge key; degrees
    are one count agg; the wedge join and the closing join key on
    node-id pairs carrying longs only.  All exact integer counts.

    Returns (node, degree, n_triangles) for every node in ``pairs`` —
    n_triangles is the number of triangles the node participates in;
    the local clustering coefficient is 2*n_triangles /
    (degree*(degree-1)), left to the caller as the one display
    division."""
    und = (
        pairs.select(
            F.least(F.col(a_col), F.col(b_col)).cast("long").alias("u"),
            F.greatest(F.col(a_col), F.col(b_col)).cast("long").alias("v"),
        )
        .where(F.col("u").isNotNull() & F.col("v").isNotNull() & (F.col("u") != F.col("v")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    sym = und.select(F.col("u").alias("node"), F.col("v").alias("nbr")).unionByName(
        und.select(F.col("v").alias("node"), F.col("u").alias("nbr"))
    )
    deg = sym.groupBy("node").agg(F.count("*").cast("long").alias("degree"))
    # orient: lower (degree, id) -> higher (degree, id)
    du = deg.select(F.col("node").alias("u"), F.col("degree").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("degree").alias("dv"))
    lower_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = (
        und.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(lower_first, F.col("u")).otherwise(F.col("v")).alias("s"),
            F.when(lower_first, F.col("v")).otherwise(F.col("u")).alias("d"),
        )
        .localCheckpoint(eager=False)
    )
    # wedge (s -> d1, s -> d2) with d1 before d2 in orientation order is
    # implied by closing edge existence (orientation is a total order);
    # join the two out-edges of s, close with the oriented edge d1 -> d2
    e1 = oriented.select(F.col("s"), F.col("d").alias("d1"))
    e2 = oriented.select(F.col("s"), F.col("d").alias("d2"))
    wedges = e1.join(e2, "s").where(F.col("d1") != F.col("d2"))
    closing = oriented.select(F.col("s").alias("d1"), F.col("d").alias("d2"))
    tri = wedges.join(closing, ["d1", "d2"]).select(
        F.col("s").alias("n1"), F.col("d1").alias("n2"), F.col("d2").alias("n3")
    )
    per_node = (
        tri.select(F.col("n1").alias("node"))
        .unionByName(tri.select(F.col("n2").alias("node")))
        .unionByName(tri.select(F.col("n3").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("n_triangles"))
    )
    return (
        deg.join(per_node, "node", "left")
        .select(
            "node",
            "degree",
            F.coalesce("n_triangles", F.lit(0)).cast("long").alias("n_triangles"),
        )
    )


def connected_components(
    pairs: DataFrame,
    a_col: str = "a_id",
    b_col: str = "b_id",
    max_iter: int = 25,
    small_graph_threshold: int = 50_000,
) -> DataFrame:
    """(node, cluster_id) for every node appearing in ``pairs``, where
    ``cluster_id`` is the minimum node id reachable through the pair
    graph — deterministic, engine-portable cluster labels.

    ``max_iter`` bounds the pointer-jumping rounds (2^25 ≫ any real
    component diameter); convergence normally exits far earlier.
    Raises if labels have not stabilized after ``max_iter`` rounds
    rather than returning a partially-propagated clustering.

    Adaptive small-graph fast path: candidate-pair graphs are post-
    blocking artifacts, usually ≪ the corpus, and each distributed
    round costs a fixed multiple of Spark's job latency regardless of
    size.  When the edge list is at most ``small_graph_threshold``
    rows it is collected (two longs per edge — 50 K edges ≈ 800 KB)
    and labeled with driver-side union-find; the result is IDENTICAL
    (min-id labels, pinned by test against the distributed path).
    This is the same adaptive size-based physical choice AQE makes for
    broadcast joins — the iterative path stays the default above the
    threshold and is what scale_bench exercises.  Pass ``0`` to force
    the distributed path.

    An edge with a NULL endpoint is no edge: both paths drop it up
    front (a null id would crash the driver union-find's comparisons
    and silently half-join in the distributed path), and both paths
    return the same ``node long, cluster_id long`` schema regardless
    of which one ran or what integer width the input ids had."""
    pairs = pairs.select(
        F.col(a_col).cast("long").alias(a_col), F.col(b_col).cast("long").alias(b_col)
    ).where(F.col(a_col).isNotNull() & F.col(b_col).isNotNull())
    if small_graph_threshold > 0:
        # ONE job decides the branch and feeds the fast path: collect at
        # most threshold+1 edges; the branch and the collected data can
        # never disagree (a limit().count() probe followed by a separate
        # full collect could, under a nondeterministic upstream)
        rows = pairs.limit(small_graph_threshold + 1).collect()
        if len(rows) <= small_graph_threshold:
            parent: dict[int, int] = {}

            def find(x: int) -> int:
                root = x
                while parent[root] != root:
                    root = parent[root]
                while parent[x] != root:
                    parent[x], x = root, parent[x]
                return root

            for a, b in rows:
                parent.setdefault(a, a)
                parent.setdefault(b, b)
                ra, rb = find(a), find(b)
                if ra != rb:
                    # union by MIN id so the final label is the
                    # component minimum without a second pass
                    lo, hi = (ra, rb) if ra < rb else (rb, ra)
                    parent[hi] = lo
            labeled = [(n, find(n)) for n in parent]
            return pairs.sparkSession.createDataFrame(
                labeled, "node long, cluster_id long"
            )
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .union(pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
        .distinct()
    ).localCheckpoint(eager=True)
    # labels is rebuilt from `jumped` after round 1, so its initial plan
    # (a distinct over the checkpointed edges) needs no materialization
    # of its own — one job saved.
    labels = edges.select(F.col("src").alias("node")).distinct().withColumn(
        "lbl", F.col("node")
    )

    for _ in range(max_iter):
        # min label over neighbors (invariant: lbl(x) <= x, so every
        # label value is itself a node id present in `labels`)
        nbr = (
            edges.join(labels.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("lbl").alias("nlbl"))
        )
        stepped = labels.join(nbr, "node", "left").select(
            "node",
            F.col("lbl").alias("old"),
            F.least("lbl", F.coalesce("nlbl", F.col("lbl"))).alias("lbl"),
        )
        # pointer jump: shortcut to the label of my label (inner join is
        # total — every label value is a node id present in `stepped`).
        # `old` (the label at the start of the round) rides along so the
        # convergence probe below is a filter over the materialized
        # result, not another join — the only job this round is the one
        # eager checkpoint; stepped's internal shuffles are shared
        # between the two self-join sides via exchange reuse.
        jumped = (
            stepped.alias("l")
            .join(stepped.alias("m"), F.col("l.lbl") == F.col("m.node"))
            .select(
                F.col("l.node").alias("node"),
                F.col("l.old").alias("old"),
                F.least("l.lbl", "m.lbl").alias("lbl"),
            )
            .localCheckpoint(eager=True)
        )
        changed = jumped.filter(F.col("lbl") < F.col("old")).count()
        labels = jumped.select("node", "lbl")
        if changed == 0:
            return labels.select("node", F.col("lbl").alias("cluster_id"))
    raise RuntimeError(f"connected_components did not converge in {max_iter} iterations")


def cluster_dedup(
    df: DataFrame, id_col: str, components: DataFrame, score_col: str | None = None
) -> DataFrame:
    """SemDeDup-style cluster retention (cf. Abbas et al., 2023): given
    the corpus and a (node, cluster_id) component labeling from
    :func:`connected_components`, keep exactly ONE representative per
    transitive duplicate cluster — the min-id member — and every
    unclustered document.  Output is (``id_col``, ``n_members``) where
    ``n_members`` is the size of the cluster the survivor represents
    (1 for unclustered docs) — the retention report a dedup pass logs.

    This is the maximal-retention policy ``dedup_keep_representatives``
    documents as its alternative: a chain a~b~c keeps one of three,
    where the pairwise policy keeps a only by accident of pair order.

    ``score_col``: QUALITY-AWARE representative selection — keep each
    cluster's highest-``score_col`` member (ties by min id) instead of
    the min-id member.  SemDeDup keeps an arbitrary representative;
    real pipelines keep the best one (longest, highest classifier
    score) so dedup never throws away the good copy of a near-dup
    family.  Selection is one window over the COMPONENT table joined
    to the scores — never a corpus-wide window.

    Scale shape: ``components`` holds only nodes that had a candidate
    pair — a small fraction of the corpus after LSH blocking — so both
    joins key on the id and AQE broadcasts the component side when it
    fits; the corpus is never shuffled on anything but its id, and the
    cluster-size agg runs over the component table, not the corpus."""
    comp = components.select(
        F.col("node").alias(id_col), F.col("cluster_id")
    )
    sizes = comp.groupBy("cluster_id").agg(F.count("*").alias("_n"))
    if score_col is None:
        j = df.select(id_col).join(comp, id_col, "left")
        kept = j.filter(
            F.col("cluster_id").isNull() | (F.col("cluster_id") == F.col(id_col))
        )
    else:
        from pyspark.sql import Window

        scored = comp.join(df.select(id_col, score_col), id_col)
        w = Window.partitionBy("cluster_id").orderBy(F.desc(score_col), id_col)
        reps = (
            scored.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select(id_col, "cluster_id")
        )
        in_comp = df.select(id_col).join(comp.select(id_col), id_col, "left_anti")
        kept = in_comp.withColumn("cluster_id", F.lit(None).cast("long")).unionByName(
            reps
        )
    return (
        kept.join(sizes, "cluster_id", "left")
        .select(id_col, F.coalesce("_n", F.lit(1)).cast("long").alias("n_members"))
    )


def merge_components(
    labels: DataFrame,
    new_pairs: DataFrame,
    node_col: str = "node",
    label_col: str = "cluster_id",
    a_col: str = "a_id",
    b_col: str = "b_id",
    **cc_kwargs,
) -> DataFrame:
    """Incremental connected components: fold a NEW edge batch into a
    stored ``(node, cluster_id)`` labeling WITHOUT re-reading the
    historical edge set.  Each stored component compresses to a star
    (every node keeps one edge to its label — singletons keep a
    self-loop, so isolated nodes survive the merge), and components of
    ``star ∪ new_pairs`` EQUAL components of ``old_edges ∪ new_pairs``
    exactly: two nodes were old-connected iff they share a label iff
    the star connects them, and min-id labels are preserved because the
    label itself is the component's min node id (pinned bit-equal to
    the full recompute by test, including across chained increments).

    This is the 100 TB maintenance shape: the label store is O(nodes)
    — typically orders smaller than the accumulated pair list a
    dedup pipeline has ever emitted — and the star side has diameter
    ≤ 2, so the pointer-jumping rounds converge in the new batch's
    diameter, not the historical graph's."""
    star = labels.select(
        F.col(node_col).cast("long").alias(a_col),
        F.col(label_col).cast("long").alias(b_col),
    )
    batch = new_pairs.select(
        F.col(a_col).cast("long").alias(a_col),
        F.col(b_col).cast("long").alias(b_col),
    )
    return connected_components(star.unionByName(batch), a_col, b_col, **cc_kwargs)
