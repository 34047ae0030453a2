"""Fleet-scale plan probes: point-in-any-polygon, EXISTS decorrelation,
stats gates, null-aware NOT IN, DPP, evolved landings.

Split from ``plans/extensions.py`` at the round-14 close (r13 verdict
item 8) — code moved VERBATIM; the aggregator re-exports every name, so
``plans.extensions.<name>`` remains the stable public path."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F
from ..registry import query
from ..tables import load_table
from .scratch import _SCRATCH, _fp_cached, _tagged_dir

# ---------------------------------------------------------------------------
# x205: the fleet-scale geo form — ~100 polygons, point-in-ANY via
# bbox-bucket blocking then the exact ray-cast (r9 verdict item 8).
# One Python generator emits the polygon fleet for BOTH engines.
# ---------------------------------------------------------------------------
_X205_HW, _X205_HH = 2, 400_000          # diamond half-width / half-height
_X205_XC, _X205_YC = 5, 1_000_000        # blocking cell size per axis


def _x205_polys() -> "list[tuple[int, int, int]]":
    """100 deterministic diamonds tiling the (quantity, price-cents)
    plane: centers on a 10×10 grid covering x∈[2,47], y∈[0.5M,9.5M]."""
    return [
        (k, 2 + (k % 10) * 5, 500_000 + (k // 10) * 1_000_000)
        for k in range(100)
    ]


def _x205_edges() -> "list[tuple[int, int, int, int, int, int]]":
    """(poly_id, xi, yi, xj, yj, d=yj-yi) rows — 4 diamond edges per
    polygon, consumed as DATA by both engines (the data-driven twin of
    x199's per-polygon literal expression)."""
    rows = []
    for k, cx, cy in _x205_polys():
        verts = [
            (cx - _X205_HW, cy), (cx, cy + _X205_HH),
            (cx + _X205_HW, cy), (cx, cy - _X205_HH),
        ]
        for i in range(4):
            xi, yi = verts[i]
            xj, yj = verts[(i + 1) % 4]
            rows.append((k, xi, yi, xj, yj, yj - yi))
    return rows


# the data-driven crossing term — identical string in both engines;
# d != 0 is implied by the straddle test, so the sign-aware flip
# ((lhs < rhs) = (d > 0)) replaces x199's per-edge compile-time branch
_X205_TERM = (
    "CASE WHEN (({yi} > {y}) <> ({yj} > {y}))"
    " AND ((({x} - {xi}) * {d} < ({xj} - {xi}) * ({y} - {yi})) = ({d} > 0))"
    " THEN 1 ELSE 0 END"
)


def _x205_oracle() -> str:
    vals = ",\n          ".join(
        f"({k}, {xi}, {yi}, {xj}, {yj}, {d})" for k, xi, yi, xj, yj, d in _x205_edges()
    )
    term = _X205_TERM.format(
        x="x", y="y", xi="xi", yi="yi", xj="xj", yj="yj", d="d"
    )
    return f"""
    WITH p AS (SELECT x, y, COUNT(*) AS w
               FROM (SELECT CAST(l_quantity AS BIGINT) AS x,
                            CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS y
                     FROM lineitem)
               GROUP BY 1, 2),
    e(poly_id, xi, yi, xj, yj, d) AS (VALUES {vals}),
    hits AS (SELECT e.poly_id, p.x, p.y, p.w,
                    SUM({term}) AS crossings
             FROM p CROSS JOIN e
             GROUP BY 1, 2, 3, 4)
    SELECT polys.poly_id,
           CAST(COALESCE(cnt, 0) AS BIGINT) AS n_points
    FROM (SELECT DISTINCT poly_id FROM e) polys
    LEFT JOIN (SELECT poly_id, SUM(w) AS cnt
               FROM hits WHERE crossings % 2 = 1
               GROUP BY poly_id) agg USING (poly_id)
    ORDER BY poly_id
    """


@query("x205_point_in_any_polygon", oracle=_x205_oracle())
def x205_point_in_any_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-ANY-of-100-polygons — x199 priced the single broadcast
    literal polygon; the fleet-scale form makes the polygons DATA and
    blocks candidates by bbox bucket before the exact test (the same
    bin-and-conquer shape as operators/rangejoin.py), so cost scales in
    POINTS, never points × polygons:

      1. each polygon's edge list is packed into ONE array column of a
         100-row table; its bbox fans out to every blocking cell it
         overlaps (≤4 rows per polygon) — broadcast;
      2. each point computes its (cell_x, cell_y) and BroadcastHashJoins
         the cell table — candidates are per-cell, points never shuffle;
      3. an exact bbox prefilter, then the full ray cast as ONE
         row-local ``aggregate()`` fold over the polygon's edge array —
         integer cross-multiplied, no division, no floats, no
         per-(point, edge) explosion on the wire;
      4. contained candidates map-side-combine into a ≤100-key count.

    The oracle brute-forces points × all 400 edge rows from the SAME
    generator — the blocking must be invisible in the result (a
    candidate the buckets drop is a correctness bug, not a perf one).
    Empty polygons survive via the final LEFT join from the polygon
    table."""
    li = load_table(spark, sf_dir, "lineitem")
    edges = {}
    for k, xi, yi, xj, yj, d in _x205_edges():
        edges.setdefault(k, []).append((xi, yi, xj, yj, d))
    polys = spark.createDataFrame(
        [(k, cx, cy, edges[k]) for k, cx, cy in _x205_polys()],
        "poly_id long, cx long, cy long, "
        "edges array<struct<xi:long,yi:long,xj:long,yj:long,d:long>>",
    )
    hw, hh = F.lit(_X205_HW), F.lit(_X205_HH)
    xc, yc = F.lit(_X205_XC), F.lit(_X205_YC)
    pc = (
        polys.withColumn(
            "cell_x",
            F.explode(
                F.sequence(
                    F.floor((F.col("cx") - hw) / xc), F.floor((F.col("cx") + hw) / xc)
                )
            ),
        )
        .withColumn(
            "cell_y",
            F.explode(
                F.sequence(
                    F.floor((F.col("cy") - hh) / yc), F.floor((F.col("cy") + hh) / yc)
                )
            ),
        )
    )
    pts = li.selectExpr(
        "CAST(l_quantity AS BIGINT) AS x",
        "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS y",
    ).withColumn("cell_x", F.floor(F.col("x") / xc)).withColumn(
        "cell_y", F.floor(F.col("y") / yc)
    )
    term = _X205_TERM.format(
        x="x", y="y", xi="e.xi", yi="e.yi", xj="e.xj", yj="e.yj", d="e.d"
    )
    cand = (
        pts.join(F.broadcast(pc), ["cell_x", "cell_y"])
        .filter(
            (F.col("x") >= F.col("cx") - hw) & (F.col("x") <= F.col("cx") + hw)
            & (F.col("y") >= F.col("cy") - hh) & (F.col("y") <= F.col("cy") + hh)
        )
        .withColumn(
            "crossings",
            F.expr(f"aggregate(edges, CAST(0 AS BIGINT), (acc, e) -> acc + {term})"),
        )
        .filter(F.col("crossings") % 2 == 1)
    )
    counts = cand.groupBy("poly_id").agg(F.count("*").alias("cnt"))
    return (
        polys.select("poly_id")
        .join(F.broadcast(counts), "poly_id", "left")
        .select(
            "poly_id", F.coalesce(F.col("cnt"), F.lit(0)).cast("long").alias("n_points")
        )
        .orderBy("poly_id")
    )


# ---------------------------------------------------------------------------
# x206: correlated EXISTS / NOT EXISTS — the decorrelation probe (r10
# verdict item 4).  The OLAP tier pins scan-agg (q27), star-chain
# (x193), top-k (x194), and agg-join-back (x204); the remaining
# canonical optimizer shape is the correlated predicate subquery
# (TPC-H Q4/Q21 class), which Catalyst's RewritePredicateSubquery must
# turn into semi/anti joins — never a per-row nested loop.
# ---------------------------------------------------------------------------
_X206_SQL = """
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders
    WHERE o_orderdate >= DATE '1995-01-01'
      AND o_orderdate <  DATE '1995-07-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
      AND NOT EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_discount > 0.08)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
"""


@query("x206_returned_orders_exists", oracle=_X206_SQL)
def x206_returned_orders_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4/Q21 shape — orders in a six-month window that have at
    least one returned line (correlated EXISTS) and no deep-discount
    line (correlated NOT EXISTS), counted per priority.

    Deliberately declared as the correlated SQL — the DataFrame API
    cannot express a correlated predicate subquery without hand-writing
    the join, and the POINT of this probe is that the OPTIMIZER does
    the rewrite: RewritePredicateSubquery turns EXISTS into a LeftSemi
    and NOT EXISTS into a LeftAnti join on l_orderkey, both fed by a
    filtered, column-pruned lineitem scan (only l_orderkey survives the
    project).  Plan-pinned in tests/test_plans.py: LeftSemi + LeftAnti
    present, no BroadcastNestedLoopJoin / CartesianProduct, and the
    o_orderdate range reaches the orders scan as a pushed filter.

    Scale shape: the date window prunes orders to ~8 % before either
    join; the two lineitem sides carry one bigint column each after
    pruning.  At 100 TB both sides hash-shuffle on orderkey — the
    honest fact-fact band (cf. x193/x204); on an orderkey-bucketed
    layout (write_bucketed) even that shuffle disappears.  The NOT
    EXISTS side uses a null-safe-free equality (l_orderkey is NOT NULL
    in the model), so the anti join needs no null-aware machinery."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_X206_SQL)


# ---------------------------------------------------------------------------
# x207: the approx column-stats gate (r10 verdict item 8) —
# column_stats_approx (x190's built 100-TB swap) under the driver's
# oracle protocol, the x15 convention: exact columns checked exactly,
# the HLL++ NDV pinned by a boolean bound computed Spark-side.
# ---------------------------------------------------------------------------
_X207_ARMS = """
    SELECT 'event_id' AS col_name, CAST(COUNT(event_id) AS BIGINT) AS n,
           CAST(COUNT(*) - COUNT(event_id) AS BIGINT) AS n_nulls,
           CAST(MIN(event_id) AS DOUBLE) AS min_num,
           CAST(MAX(event_id) AS DOUBLE) AS max_num,
           CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str,
           true AS ndv_within_3rsd
    FROM events
    UNION ALL
    SELECT 'event_type', CAST(COUNT(event_type) AS BIGINT),
           CAST(COUNT(*) - COUNT(event_type) AS BIGINT),
           CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
           MIN(event_type), MAX(event_type), true
    FROM events
    UNION ALL
    SELECT 'user_id', CAST(COUNT(user_id) AS BIGINT),
           CAST(COUNT(*) - COUNT(user_id) AS BIGINT),
           CAST(MIN(user_id) AS DOUBLE), CAST(MAX(user_id) AS DOUBLE),
           NULL, NULL, true
    FROM events
    UNION ALL
    SELECT 'value', CAST(COUNT(value) AS BIGINT),
           CAST(COUNT(*) - COUNT(value) AS BIGINT),
           CAST(MIN(value) AS DOUBLE), CAST(MAX(value) AS DOUBLE),
           NULL, NULL, true
    FROM events
"""


@query(
    "x207_column_stats_approx_gate",
    oracle=f"SELECT * FROM ({_X207_ARMS}) ORDER BY col_name",
)
def x207_column_stats_approx_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """column_stats_approx under the oracle gate.  The approx form
    itself (x190's documented-and-built 100-TB swap: HLL++ NDVs, no
    Expand, sketch-sized shuffle) was pytest-pinned within 3×rsd but
    had no driver row; this query puts its accuracy contract under the
    driver's rows+schema+value-hash protocol, the x15/x79 convention
    for estimate-valued operators:

    - n / n_nulls / min / max come from the SAME single-pass agg the
      approx form runs and are checked EXACTLY against DuckDB;
    - the HLL++ NDV (deterministic for a fixed dataset) is checked as
      a boolean: |approx − exact| ≤ 3·rsd·exact per column, which the
      oracle pins as literal ``true`` — a sketch regression past its
      advertised error flips the hash, failing the driver row.

    The exact-NDV comparison side necessarily pays x190's Expand once
    HERE (the gate needs the truth); column_stats_approx itself stays
    Expand-free — the gate prices accuracy, the swap prices scale.

    Plan note: the exact and approx aggregates run as two SEPARATE
    one-row aggregations cross-joined at the end — mixing
    approx_count_distinct into the multi-COUNT(DISTINCT) agg drags the
    HLL sketches through the Expand (every sketch update replays on
    every ×5-expanded row: measured 5.1 s vs x190's 1.0 s at sf0.1);
    split, each plans optimally and the join is 1 row × 1 row."""
    events = load_table(spark, sf_dir, "events")
    rsd = 0.025
    cols = ("event_id", "event_type", "user_id", "value")
    exact = events.agg(
        F.count("*").cast("long").alias("n_all"),
        *[F.count(c).cast("long").alias(f"n_{c}") for c in cols],
        *[F.countDistinct(c).cast("long").alias(f"ndv_{c}") for c in cols],
        *[
            F.min(c).cast("double").alias(f"min_{c}")
            for c in ("event_id", "user_id", "value")
        ],
        *[
            F.max(c).cast("double").alias(f"max_{c}")
            for c in ("event_id", "user_id", "value")
        ],
        F.min("event_type").alias("mins_event_type"),
        F.max("event_type").alias("maxs_event_type"),
    )
    approx = events.agg(
        *[
            F.approx_count_distinct(c, rsd=rsd).cast("long").alias(f"andv_{c}")
            for c in cols
        ]
    )
    wide = exact.crossJoin(F.broadcast(approx))
    arms = []
    for c in cols:
        bound = (
            f"abs(andv_{c} - ndv_{c}) <= CAST({3 * rsd} * ndv_{c} AS DOUBLE)"
        )
        if c == "event_type":
            arms.append(
                f"'{c}', n_{c}, n_all - n_{c}, CAST(NULL AS DOUBLE), "
                f"CAST(NULL AS DOUBLE), mins_{c}, maxs_{c}, {bound}"
            )
        else:
            arms.append(
                f"'{c}', n_{c}, n_all - n_{c}, min_{c}, max_{c}, "
                f"CAST(NULL AS STRING), CAST(NULL AS STRING), {bound}"
            )
    return wide.selectExpr(
        f"stack(4, {', '.join(arms)}) AS "
        "(col_name, n, n_nulls, min_num, max_num, min_str, max_str, ndv_within_3rsd)"
    ).orderBy("col_name")


# ---------------------------------------------------------------------------
# x208: NOT IN over a NULLABLE subquery key — the null-aware anti join,
# the last canonical join shape the optimizer tier did not pin (x206
# pinned EXISTS/NOT EXISTS -> semi/anti on non-null keys).  NOT IN is
# NOT an anti join under three-valued logic: one NULL in the subquery
# empties the whole result, and a NULL probe row never qualifies.
# ---------------------------------------------------------------------------
_X208_SQL = """
    SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM customer
    WHERE c_custkey NOT IN (
      SELECT NULLIF(o_custkey, -1) FROM orders
      WHERE o_orderdate >= DATE '1995-01-01' AND o_orderdate < DATE '1996-01-01')
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
"""


@query("x208_unmatched_customers_notin", oracle=_X208_SQL)
def x208_unmatched_customers_notin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no order in 1995, per market segment — declared
    as ``NOT IN`` over a NULLABLE key.  ``NULLIF(o_custkey, -1)`` never
    fires on real data (custkeys are positive) but makes the column
    nullable BY TYPE, which models the late-arriving-dimension shape
    (an unresolved foreign key lands as NULL) and forces the planner to
    honor three-valued logic: Spark cannot rewrite this to a plain anti
    join, so it plans the single-column NULL-AWARE anti join
    (``BroadcastHashJoin ... LeftAnti, BuildRight, true`` — the
    trailing flag is isNullAwareAntiJoin; plan-pinned in
    tests/test_plans.py).  DuckDB evaluates the same SQL under the
    same semantics — the oracle pins cross-engine agreement, and the
    three-valued edge (one actual NULL in the subquery → ZERO rows
    out) is pinned by a fixture pytest against both engines.

    Scale note — this shape is a deliberate anti-pattern cliff: the
    null-aware path REQUIRES broadcasting the subquery side (Spark
    falls back to BroadcastNestedLoopJoin past the broadcast threshold,
    quadratic at fleet scale).  The production rewrite when the key is
    provably non-null is NOT EXISTS (x206's LeftAnti, shuffle-able and
    bucketable); this query exists to pin that the engine gets the
    TRICKY semantics right, and its docstring is the routing advice."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_X208_SQL)


# ---------------------------------------------------------------------------
# x209: dynamic partition pruning — the remaining flagship Spark scale
# mechanism the plan tier did not pin.  Static pruning (q33/P12) needs
# the partition predicate as a literal; at 100 TB the date set usually
# comes from a DIMENSION filter ("peak days", "billing period", "days
# in this campaign"), and without DPP the fact scan reads every
# partition before the join drops 70% of them.
# ---------------------------------------------------------------------------
@query(
    "x209_dynamic_partition_pruning",
    oracle="""
    WITH ev AS (SELECT CAST(ts AS DATE) AS d, value FROM events),
         peak AS (SELECT DISTINCT d FROM ev
                  WHERE (((d - DATE '2024-01-01') % 7) + 7) % 7 IN (0, 3))
    SELECT d AS service_date, CAST(COUNT(*) AS BIGINT) AS cnt,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS speed_sum
    FROM ev JOIN peak USING (d)
    GROUP BY d
    ORDER BY d
    """,
)
def x209_dynamic_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact⋈dim where the partition predicate is only known at RUNTIME:
    the q33-written date-partitioned warehouse fact joins a derived
    calendar dim filtered to "peak" days (2 of every 7, keyed off an
    anchor date with the engine-neutral pmod form).  Catalyst's
    DynamicPartitionPruning injects the dim's date set into the fact
    scan as a ``dynamicpruningexpression`` partition filter REUSING the
    join's broadcast — the fact reads ~2/7 of its partitions and the
    filter costs nothing extra (plan-pinned in tests/test_plans.py:
    the fact scan carries the dynamic filter, the dim broadcasts, and
    the literal-free join would otherwise scan every partition).

    Scale shape: this is THE mechanism that makes date-partitioned
    100 TB facts queryable through dimension filters — static pruning
    (q33) covers literal predicates, DPP covers the join-derived ones;
    together with partitioned writes (S8) the fact never reads a
    partition the query provably does not need.  The oracle recomputes
    from raw events, so the answer also re-verifies the warehouse
    write path q33 exercises."""
    from ...operators.ann_index import ensure_index
    from ..warehouse import write_breadcrumb

    ev = load_table(spark, sf_dir, "events")
    bc = ev.select(
        F.col("ts").alias("tstamp"),
        F.lit(None).cast("double").alias("latitude"),
        F.lit(None).cast("double").alias("longitude"),
        F.col("value").alias("speed"),
        F.col("user_id").alias("trip_id"),
    )
    path = os.path.join(_tagged_dir(_SCRATCH, "warehouse", sf_dir=sf_dir), "breadcrumb")
    ensure_index(lambda: write_breadcrumb(bc, path, mode="overwrite"), path)
    wh = spark.read.parquet(path)
    anchor = F.lit("2024-01-01").cast("date")
    peak = (
        ev.select(F.to_date("ts").alias("d")).distinct()
        .filter((((F.datediff(F.col("d"), anchor) % 7) + 7) % 7).isin(0, 3))
    )
    return (
        wh.join(F.broadcast(peak), wh.service_date == peak.d)
        .groupBy("service_date")
        .agg(
            F.count("*").cast("long").alias("cnt"),
            F.sum(F.col("speed").cast("decimal(18,2)")).cast("double").alias("speed_sum"),
        )
        .orderBy("service_date")
    )


# ---------------------------------------------------------------------------
# x210: multi-generation landing served through the pinned-schema scale
# read — the r11 schema-evolution readers (sources/readers.py) under the
# driver's rows+schema+value-hash oracle protocol (round-11 verdict
# item 6).  Evolving landings are the standing shape of a training-data
# store: batches gain columns (new quality scores) over time, and the
# production read must serve every generation through ONE declared
# schema with zero footer sweep.
# ---------------------------------------------------------------------------
@query(
    "x210_evolved_landing_stats",
    oracle="""
    WITH landing AS (
        SELECT doc_id, n_chars,
               CASE WHEN doc_id % 2 = 1
                    THEN CAST(n_chars % 100 AS DOUBLE) / 4 END AS quality
        FROM documents
    )
    SELECT doc_id % 5 AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           CAST(COUNT(quality) AS BIGINT) AS n_quality,
           SUM(quality) / COUNT(quality) AS avg_quality
    FROM landing
    GROUP BY doc_id % 5
    ORDER BY bucket
    """,
)
def x210_evolved_landing_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate over a TWO-GENERATION landing read with the pinned
    declared schema (``sources.read_with_schema`` — zero footer sweep):
    generation 0 landed (doc_id, n_chars) for even doc_ids; the feed
    then gained a quality column and generation 1 landed
    (doc_id, n_chars, quality) for odd doc_ids.  The pinned read
    null-fills quality across generation 0 — visible in the result as
    ``n_quality < n_docs`` in every bucket — and the oracle recomputes
    the same rows from the raw documents table, so the driver's
    value-hash verifies the multi-generation landing contract
    end-to-end (write → schema evolution → pinned union read).

    quality is quarter-integer-valued (``(n_chars % 100) / 4``), so
    SUM(DOUBLE) is order-independent-exact in both engines and the avg
    is one IEEE division — the corpus float-parity convention.

    Scale shape: read_with_schema trusts the catalog schema and plans
    straight to a multi-path scan — no O(files) mergeSchema footer
    sweep (pinned by the job-count test in tests/test_sources.py), the
    per-file projection adapts each generation, and the agg is one
    map-side-combined shuffle of 5 groups.  This is the 100 TB evolving
    -landing read: list once, never touch 100k footers."""
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    from ...operators.ann_index import corpus_fingerprint, ensure_index
    from ...sources.readers import read_with_schema

    docs = load_table(spark, sf_dir, "documents")
    store = os.path.join(_tagged_dir(_SCRATCH, "evolved_landing", sf_dir=sf_dir), "gen")

    def build() -> None:
        base = docs.select("doc_id", "n_chars")
        base.filter(F.col("doc_id") % 2 == 0).write.mode("overwrite").parquet(
            f"{store}/batch_id=0"
        )
        base.filter(F.col("doc_id") % 2 == 1).withColumn(
            "quality", (F.col("n_chars") % 100).cast("double") / F.lit(4)
        ).write.mode("overwrite").parquet(f"{store}/batch_id=1")

    # batch_id=1 is written LAST, so its _SUCCESS is the whole-build marker
    ensure_index(
        build,
        f"{store}/batch_id=1",
        fingerprint=_fp_cached(
            spark, sf_dir, "docs",
            lambda: corpus_fingerprint(docs, id_col="doc_id"),
        ),
    )
    pinned = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("n_chars", LongType()),
            StructField("quality", DoubleType()),
        ]
    )
    landing = read_with_schema(spark, store, pinned)
    return (
        landing.groupBy((F.col("doc_id") % 5).alias("bucket"))
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
            F.count("quality").cast("long").alias("n_quality"),
            (F.sum("quality") / F.count("quality")).alias("avg_quality"),
        )
        .orderBy("bucket")
    )


