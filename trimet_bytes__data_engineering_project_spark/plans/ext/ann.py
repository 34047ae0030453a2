"""Similarity search (ANN): brute-force / LSH / IVF / quantized top-k and
the standing IVF index.

Split from ``plans/extensions.py`` at the round-14 close (r13 verdict
item 8) — code moved VERBATIM; the aggregator re-exports every name, so
``plans.extensions.<name>`` remains the stable public path."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F
from ..registry import query
from ..tables import _session_cache, load_table
from ...operators.similarity import (
    brute_force_topk,
    hyperplanes,
    ivf_topk,
    lsh_topk,
    quantized_topk_arrow,
)
from .fragments import _VEC, _cos_sql
from .scratch import _SCRATCH, _fp_cached, _index_dir, _tagged_dir

# ---------------------------------------------------------------------------
# Similarity search (ANN)
# ---------------------------------------------------------------------------


def _query_vec(spark: SparkSession, sf_dir: str) -> list[float]:
    """The corpus query vector (vec_id = 0) — one driver-side row fetch,
    memoized per (session, dir) via the session-attached cache in
    plans/tables.py (dies with the session, immune to id() reuse) so
    the six ANN queries don't re-run the lookup job each (inputs are
    immutable driver tables)."""
    cache = _session_cache(spark)
    key = ("_query_vec", sf_dir)
    if key not in cache:
        emb = load_table(spark, sf_dir, "embeddings")
        cache[key] = [
            float(v) for v in emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
        ]
    return cache[key]


_QV_SQL = f"(SELECT {_VEC} FROM embeddings WHERE vec_id = 0)"


@query(
    "x10_ann_bruteforce",
    oracle=f"""
    WITH e AS (SELECT vec_id, {_VEC} AS v FROM embeddings), q AS (SELECT {_QV_SQL} AS qv)
    SELECT vec_id, {_cos_sql('v', '(SELECT qv FROM q)')} AS cos_sim
    FROM e ORDER BY cos_sim DESC, vec_id LIMIT 10
    """,
)
def x10_ann_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k (the ANN correctness baseline): one scan,
    literal query vector in codegen, per-partition top-k merge — no
    shuffle of vectors."""
    emb = load_table(spark, sf_dir, "embeddings")
    return brute_force_topk(emb, _query_vec(spark, sf_dir), k=10)


def _dot_sql(a: str, b: str) -> str:
    return (
        f"list_reduce(list_prepend(0.0, list_transform(list_zip({a}, {b}), "
        "p -> p[1] * p[2])), (acc, x) -> acc + x)"
    )


def _build_lsh_oracle(hamming_radius: int = 0, n_planes: int = 4) -> str:
    planes = hyperplanes(n_planes, 64)
    lits = [f"[{', '.join(repr(x) for x in p)}]" for p in planes]
    bucket = " + ".join(
        f"CASE WHEN {_dot_sql('v', lits[p])} > 0 THEN {1 << p} ELSE 0 END"
        for p in range(n_planes)
    )
    qbucket = " + ".join(
        f"CASE WHEN {_dot_sql('qv', lits[p])} > 0 THEN {1 << p} ELSE 0 END"
        for p in range(n_planes)
    )
    if hamming_radius == 0:
        cond = "bucket = (SELECT bucket FROM qb)"
    else:
        # per-bit mismatch sum — portable Hamming distance, no engine
        # bit-op functions needed
        ham = " + ".join(
            f"CASE WHEN ((bucket // {1 << p}) % 2) <> "
            f"(((SELECT bucket FROM qb)) // {1 << p}) % 2 THEN 1 ELSE 0 END"
            for p in range(n_planes)
        )
        cond = f"({ham}) <= {hamming_radius}"
    return f"""
    WITH e AS (SELECT vec_id, {_VEC} AS v FROM embeddings),
         q AS (SELECT {_QV_SQL} AS qv),
         eb AS (SELECT vec_id, v, {bucket} AS bucket FROM e),
         qb AS (SELECT {qbucket} AS bucket FROM q)
    SELECT vec_id, {_cos_sql('v', '(SELECT qv FROM q)')} AS cos_sim
    FROM eb WHERE {cond}
    ORDER BY cos_sim DESC, vec_id LIMIT 5
    """


@query("x11_ann_lsh", oracle=_build_lsh_oracle())
def x11_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate top-k: 4 deterministic md5-derived
    hyperplanes → 16 sign buckets; the query probes only its own bucket
    (at scale: a storage partition)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return lsh_topk(emb, _query_vec(spark, sf_dir), k=5, n_planes=4)


@query(
    "x12_ann_ivf",
    oracle=f"""
    WITH e AS (SELECT vec_id, {_VEC} AS v FROM embeddings),
         cents AS (SELECT vec_id AS centroid_id, v AS cvec FROM e WHERE vec_id < 16),
         q AS (SELECT {_QV_SQL} AS qv),
         assigned AS (
           SELECT e.vec_id, e.v, c.centroid_id,
                  row_number() OVER (PARTITION BY e.vec_id
                                     ORDER BY {_cos_sql('e.v', 'c.cvec')} DESC, c.centroid_id) AS rn
           FROM e CROSS JOIN cents c
         ),
         best AS (SELECT vec_id, v, centroid_id FROM assigned WHERE rn = 1),
         qc AS (SELECT centroid_id FROM cents
                ORDER BY {_cos_sql('cvec', '(SELECT qv FROM q)')} DESC, centroid_id LIMIT 1)
    SELECT vec_id, {_cos_sql('v', '(SELECT qv FROM q)')} AS cos_sim
    FROM best JOIN qc USING (centroid_id)
    ORDER BY cos_sim DESC, vec_id LIMIT 5
    """,
)
def x12_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF probe-1 approximate top-k: 16 deterministic coarse centroids,
    argmax-cosine assignment, query probes its own inverted list only
    (at scale: a bucketed table keyed by centroid_id)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return ivf_topk(emb, _query_vec(spark, sf_dir), k=5, n_centroids=16)


def _ensure_ivf_index(spark: SparkSession, sf_dir: str) -> str:
    """The STANDING IVF index shared by x21 (ANN probe), x166 (leakage
    matrix) and x168 (SemDeDup) — one coarse quantization, three
    consumers.  Staleness-guarded by the CONTENT-SENSITIVE corpus
    fingerprint (count + max id + an order-independent crc32 sum over
    the embedding column — ``ann_index.corpus_fingerprint``'s opt-in
    tier, r7 verdict item 6): re-embedded vectors under UNCHANGED ids
    now trigger a rebuild, which the footer-only stamp missed.  The
    crc term is one column-pruned scan per ensure — the price of
    correctness for a re-land-able corpus; rebuild-trip pinned by
    tests/test_ann_index.py."""
    from ...operators.ann_index import (
        corpus_fingerprint,
        ensure_index,
        write_ivf_index,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    path = _index_dir(sf_dir, "ivf")
    ensure_index(
        lambda: write_ivf_index(emb, path, n_centroids=16),
        path,
        fingerprint=_fp_cached(spark, sf_dir, "emb_content",
                               lambda: corpus_fingerprint(emb, content_col="embedding")),
    )
    return path


@query(
    "q33_warehouse_roundtrip",
    oracle="""
    SELECT count(*) AS cnt,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS speed_sum
    FROM events WHERE CAST(ts AS DATE) = DATE '2024-01-15'
    """,
)
def q33_warehouse_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8 end-to-end through the engine's OWN warehouse layout: the
    events stream is shaped into the breadcrumb fact, written via
    ``write_breadcrumb`` (date-partitioned parquet, rows sorted by
    (trip_id, tstamp) within partitions), and the date-filtered
    aggregate is re-run THROUGH the written table — so the driver's
    hash check covers the partitioned write path itself, not just the
    plan tests.  The date predicate prunes to one service_date
    directory (pinned by plan test); the oracle computes the same
    answer straight from the source events."""
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
    return wh.filter(F.col("service_date") == F.lit("2024-01-15").cast("date")).agg(
        F.count("*").alias("cnt"),
        F.sum(F.col("speed").cast("decimal(18,2)")).cast("double").alias("speed_sum"),
    )


@query("x20_ann_lsh_index_probe", oracle=_build_lsh_oracle())
def x20_ann_lsh_index_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x11's scale path made real: the corpus is WRITTEN partitioned by
    LSH bucket (one build pass), and the probe filters on the partition
    column — the scan plans with ``PartitionFilters: [bucket = q]``
    (pinned by plan test) and reads ~1/16 of the files, recomputing no
    signatures.  Result ≡ x11 (identical oracle SQL)."""
    from ...operators.ann_index import ensure_index, lsh_index_probe, write_lsh_index

    qv = _query_vec(spark, sf_dir)
    path = _index_dir(sf_dir, "lsh")
    ensure_index(
        lambda: write_lsh_index(load_table(spark, sf_dir, "embeddings"), path, dim=len(qv)),
        path,
    )
    return lsh_index_probe(spark, path, qv, k=5)


@query(
    "x21_ann_ivf_index_probe",
    oracle=f"""
    WITH e AS (SELECT vec_id, {_VEC} AS v FROM embeddings),
         cents AS (SELECT vec_id AS centroid_id, v AS cvec FROM e WHERE vec_id < 16),
         q AS (SELECT {_QV_SQL} AS qv),
         assigned AS (
           SELECT e.vec_id, e.v, c.centroid_id,
                  row_number() OVER (PARTITION BY e.vec_id
                                     ORDER BY {_cos_sql('e.v', 'c.cvec')} DESC, c.centroid_id) AS rn
           FROM e CROSS JOIN cents c
         ),
         best AS (SELECT vec_id, v, centroid_id FROM assigned WHERE rn = 1),
         qc AS (SELECT centroid_id FROM cents
                ORDER BY {_cos_sql('cvec', '(SELECT qv FROM q)')} DESC, centroid_id LIMIT 1)
    SELECT vec_id, {_cos_sql('v', '(SELECT qv FROM q)')} AS cos_sim
    FROM best JOIN qc USING (centroid_id)
    ORDER BY cos_sim DESC, vec_id LIMIT 5
    """,
)
def x21_ann_ivf_index_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x12's scale path made real: vectors are WRITTEN into inverted
    lists (``partitionBy(centroid_id)``) with the centroid table
    persisted alongside; the probe picks its nprobe centroids from a
    driver-side read of that tiny table and scans only the matching
    list partitions (IN-list partition filter, pinned by plan test).
    No per-query assignment recompute.  Result ≡ x12 (same oracle).
    Index build content-fingerprinted via ``_ensure_ivf_index``."""
    from ...operators.ann_index import ivf_index_probe

    qv = _query_vec(spark, sf_dir)
    path = _ensure_ivf_index(spark, sf_dir)
    return ivf_index_probe(spark, path, qv, k=5, nprobe=1)


@query("x29_ann_lsh_multiprobe", oracle=_build_lsh_oracle(hamming_radius=1))
def x29_ann_lsh_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe LSH — the recall dial x20 lacks (the analogue of
    IVF's nprobe): probe every bucket within Hamming distance 1 of the
    query's signature (5 of 16 partitions at 4 planes), recovering true
    neighbors that differ by one sign bit and are invisible to a
    single-bucket probe.  The filter is still a literal IN-list
    partition prune over the SAME persisted index x20 reads — identical
    plan shape, no recompute (pinned by plan test)."""
    from ...operators.ann_index import ensure_index, lsh_index_probe, write_lsh_index

    qv = _query_vec(spark, sf_dir)
    path = _index_dir(sf_dir, "lsh")
    ensure_index(
        lambda: write_lsh_index(load_table(spark, sf_dir, "embeddings"), path, dim=len(qv)),
        path,
    )
    return lsh_index_probe(spark, path, qv, k=5, hamming_radius=1)


@query("x30_index_append_probe", oracle=_build_lsh_oracle())
def x30_index_append_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental index lifecycle: build the LSH index from the even
    vec_ids, APPEND the odd ones (same deterministic hyperplanes, so
    they land in the same bucket scheme), then probe — the result is
    identical to probing a one-shot index over the full corpus, which
    is exactly x11/x20's oracle.  The build gate is a post-append
    marker: ``_SUCCESS`` alone exists after phase one, so a crash
    between phases triggers a clean rebuild instead of serving half an
    index."""
    from ...operators.ann_index import ensure_index, lsh_index_probe, write_lsh_index

    qv = _query_vec(spark, sf_dir)
    path = _index_dir(sf_dir, "lsh_app")

    def _build() -> None:
        emb = load_table(spark, sf_dir, "embeddings")
        write_lsh_index(emb.filter(F.col("vec_id") % 2 == 0), path, dim=len(qv))
        write_lsh_index(
            emb.filter(F.col("vec_id") % 2 == 1), path, dim=len(qv), mode="append"
        )
        with open(os.path.join(path, "_APPEND_DONE"), "w"):
            pass

    ensure_index(_build, path, marker="_APPEND_DONE")
    return lsh_index_probe(spark, path, qv, k=5)


@query(
    "x15_approx_distinct",
    oracle="""
    SELECT count(DISTINCT o_custkey) AS exact_vehicles,
           true AS approx_within_5pct
    FROM orders
    """,
)
def x15_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 at scale — the ``approx_count_distinct`` (HyperLogLog++)
    variant SURVEY §2.4 calls for at 100 TB, where an exact per-key
    distinct shuffles every key.  The sketch is mergeable (one map-side
    partial per partition, constant-size state), so cardinality costs
    one scan with no distinct shuffle.  The oracle pins the exact count
    and the ≤5 % error contract (HLL++ rsd 0.02; measured ≤0.6 % on the
    driver tables at sf0.01/0.1 — deterministic, not statistical, for a
    fixed dataset)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.agg(
        F.countDistinct("o_custkey").alias("exact_vehicles"),
        (
            F.abs(
                F.approx_count_distinct("o_custkey", 0.02) - F.countDistinct("o_custkey")
            )
            <= F.lit(0.05) * F.countDistinct("o_custkey")
        ).alias("approx_within_5pct"),
    )


_QUANT = (
    "list_transform({v}, x -> CAST(round(x / "
    "nullif(list_max(list_transform({v}, y -> abs(y))), 0.0) * 127) AS INTEGER))"
)


def _int_fold_sql(products: str) -> str:
    return f"list_reduce(list_prepend(CAST(0 AS BIGINT), {products}), (acc, x) -> acc + x)"


def _qcos_sql(a: str, b: str) -> str:
    dot = _int_fold_sql(f"list_transform(list_zip({a}, {b}), p -> CAST(p[1] * p[2] AS BIGINT))")
    na = f"sqrt(CAST({_int_fold_sql(f'list_transform({a}, x -> CAST(x * x AS BIGINT))')} AS DOUBLE))"
    nb = f"sqrt(CAST({_int_fold_sql(f'list_transform({b}, x -> CAST(x * x AS BIGINT))')} AS DOUBLE))"
    return f"(CAST({dot} AS DOUBLE) / ({na} * {nb}))"


@query(
    "x18_quantized_topk",
    oracle=f"""
    WITH e AS (SELECT vec_id, {_VEC} AS v FROM embeddings),
         q AS (SELECT {_QV_SQL} AS qv),
         eq AS (SELECT vec_id, {_QUANT.format(v='v')} AS vq FROM e),
         qq AS (SELECT {_QUANT.format(v='qv')} AS vq FROM q)
    SELECT vec_id, {_qcos_sql('eq.vq', '(SELECT vq FROM qq)')} AS q_cos
    FROM eq WHERE {_qcos_sql('eq.vq', '(SELECT vq FROM qq)')} IS NOT NULL
    ORDER BY q_cos DESC, vec_id LIMIT 10
    """,
)
def x18_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """int8-quantized vector search: symmetric per-vector quantization
    (4× storage/scan reduction at 100 TB), integer-exact dot/norm sums
    (order-independent — no float summation nondeterminism at all),
    single IEEE division.  The compressed path of the ANN tier; the
    fold-exact float path (x10) is the accuracy baseline.

    Runs the Arrow/numpy int-matmul variant — pinned EXACTLY equal to
    the interpreted fold path by test (integer math is order-free), so
    the oracle stays green while the scan is one BLAS-shaped batch op
    instead of ~5 interpreted HOF folds per vector (~10× at sf0.1)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return quantized_topk_arrow(emb, _query_vec(spark, sf_dir), k=10)


@query(
    "x16_asof_join",
    oracle="""
    WITH clicks AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'),
         v1 AS (SELECT user_id, ts, max(event_id) AS view_id
                FROM events WHERE event_type = 'view' GROUP BY 1, 2)
    SELECT c.event_id, v.view_id
    FROM clicks c ASOF LEFT JOIN v1 v ON c.user_id = v.user_id AND v.ts <= c.ts
    """,
)
def x16_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join — each click attached to the user's latest view at or
    before it (the session-attribution primitive; transit form: each
    ping to the stop-event window it follows).  Spark lacks the
    operator; `operators/asof.py` composes it as union → one keyed
    window → last(ignorenulls) carry: one equi-shuffle, linear pass, no
    range explosion.  The oracle is DuckDB's NATIVE ``ASOF LEFT JOIN``
    — the composition is pinned bit-exact against a first-class
    implementation, inclusive-tie semantics and NULL no-prior rows
    included."""
    from ...operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts", "event_id")
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("view_id"))
    )
    return asof_join(clicks, views, key="user_id", ts="ts", payload_cols=["view_id"]).select(
        "event_id", "view_id"
    )


@query(
    "x17_range_join",
    oracle="""
    WITH purchases AS (
      SELECT user_id, event_id AS purchase_id,
             ts - INTERVAL 30 MINUTE AS win_start, ts AS win_end
      FROM events WHERE event_type = 'purchase'
    ),
    clicks AS (SELECT user_id, ts, event_id AS click_id FROM events
               WHERE event_type = 'click')
    SELECT c.click_id, p.purchase_id
    FROM clicks c JOIN purchases p
      ON c.user_id = p.user_id AND c.ts BETWEEN p.win_start AND p.win_end
    """,
)
def x17_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join — every click inside the 30-minute window before a
    same-user purchase (attribution primitive; transit form: each ping
    inside a stop-event [arrive, leave] dwell).  Spark plans the raw
    BETWEEN predicate as a nested loop; `operators/rangejoin.py` bins
    both sides (bin = interval length here → ≤ 2 bins per interval) and
    equi-joins on (key, bin) + exact re-check — one shuffle per side,
    no range explosion, multiplicity identical to the naive join (the
    oracle runs it without DISTINCT); the plan test pins the Spark side
    to a hash/merge join."""
    from ...operators.rangejoin import interval_range_join

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        (F.col("ts") - F.expr("INTERVAL 30 MINUTES")).alias("win_start"),
        F.col("ts").alias("win_end"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    return interval_range_join(
        clicks,
        purchases,
        key="user_id",
        point_ts="ts",
        start_ts="win_start",
        end_ts="win_end",
        bin_width_s=1800,
    ).select("click_id", "purchase_id")


@query(
    "x19_range_join_long_intervals",
    oracle="""
    WITH purchases AS (
      SELECT user_id, event_id AS purchase_id,
             ts - INTERVAL 2 HOUR AS win_start, ts AS win_end
      FROM events WHERE event_type = 'purchase'
    ),
    clicks AS (SELECT user_id, ts, event_id AS click_id FROM events
               WHERE event_type = 'click')
    SELECT c.click_id, p.purchase_id
    FROM clicks c JOIN purchases p
      ON c.user_id = p.user_id AND c.ts BETWEEN p.win_start AND p.win_end
    """,
)
def x19_range_join_long_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join with intervals LONGER than the bin width (2-hour
    windows over 10-minute bins → each interval explodes to 13 bins):
    proves the operator's correctness does not depend on the width
    bound — oversized intervals cost more bins, never lose matches.
    Same naive-BETWEEN oracle shape as x17."""
    from ...operators.rangejoin import interval_range_join

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        (F.col("ts") - F.expr("INTERVAL 2 HOURS")).alias("win_start"),
        F.col("ts").alias("win_end"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    return interval_range_join(
        clicks,
        purchases,
        key="user_id",
        point_ts="ts",
        start_ts="win_start",
        end_ts="win_end",
        bin_width_s=600,
    ).select("click_id", "purchase_id")


