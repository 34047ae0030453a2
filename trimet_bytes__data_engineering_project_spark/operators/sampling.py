"""Deterministic corpus sampling / splitting / packing — the
data-mixing tier of a training pipeline (north-star extension).

Everything here is **hash-deterministic, never rand()**: a row's fate
is a pure function of its id, so retries, re-runs, partial backfills
and cross-engine checks all agree (the same property
``operators/skew.py`` relies on for salting).  The hash is a hex
*string prefix* of md5 compared lexicographically — identical in any
engine that has md5, with no hex→int conversion portability trap:
``substr(md5(id), 1, 4)`` is uniform over 65,536 values, and a
threshold string like ``'cccc'`` keeps ≈ 0.8 of rows.

At 100 TB: all three operators are narrow (no shuffle at all for
split/sample — the hash is computed in the scan's project; packing
shuffles once on the shard key), and none of them ever sees the
document body — only ids and token counts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def hash_fraction_prefix(id_col: Column, width: int = 4) -> Column:
    """Uniform hex prefix of md5(id) — the deterministic 'random' draw.
    Lexicographic comparison against a hex threshold selects a stable
    pseudo-random fraction of rows."""
    return F.substring(F.md5(id_col.cast("string")), 1, width)


def hex_threshold(fraction: float, width: int = 4) -> str:
    """The hex string h such that P(prefix < h) = fraction (prefix
    uniform over 16^width values).

    fraction >= 1 returns ``'g'`` — lexicographically above every hex
    prefix, so the comparison keeps ALL rows.  (The naive
    ``format(16**width)`` would be ``'10000'``: width+1 chars whose
    string compare keeps only ~1/16 of rows — a silent near-empty
    split for rate 1.0 or train+val == 1.0.)"""
    if fraction >= 1.0:
        return "g"  # > 'f...f': keep-all sentinel
    if fraction <= 0.0:
        return "0" * width  # prefix < '0..0' is never true: keep-none
    return format(int(fraction * (16**width)), f"0{width}x")


def train_val_test_split(
    df: DataFrame,
    id_col: str,
    train: float = 0.8,
    val: float = 0.1,
) -> DataFrame:
    """Adds a ``split`` column ∈ {train, val, test} as a pure function
    of the id — stable under retries, appends and re-partitioning;
    documents never migrate between splits when the corpus grows."""
    h = hash_fraction_prefix(F.col(id_col))
    return df.withColumn(
        "split",
        F.when(h < hex_threshold(train), "train")
        .when(h < hex_threshold(train + val), "val")
        .otherwise("test"),
    )


def stratified_sample(
    df: DataFrame, id_col: str, stratum_col: str, rates: dict[str, float]
) -> DataFrame:
    """Deterministic per-stratum downsampling (e.g. rebalance languages
    or domains): keep a row iff its hash prefix clears the stratum's
    rate.  Strata absent from ``rates`` are kept whole.  The draw hashes
    (stratum, id) so per-stratum samples are independent."""
    h = hash_fraction_prefix(F.concat_ws("|", F.col(stratum_col), F.col(id_col).cast("string")))
    if not rates:
        return df
    keep = ~F.col(stratum_col).isin(list(rates))
    for stratum, rate in sorted(rates.items()):
        keep = keep | ((F.col(stratum_col) == stratum) & (h < hex_threshold(rate)))
    return df.filter(keep)


def pack_sequences(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    budget: int,
    n_shards: int = 32,
) -> DataFrame:
    """Greedy fixed-budget sequence packing: documents are sharded by
    hash(id), ordered by id within each shard, and assigned
    ``pack_id = (shard, floor(running_tokens / budget))`` — the
    first-fit-by-order packing every pretraining data loader performs.

    Scale shape: ONE shuffle on the shard key; the cumulative window
    runs per shard (never a global single-partition sort), so
    parallelism is ``n_shards`` regardless of corpus size and each
    shard's state is one running long.  The shard key is id-modulo
    (portable, oracle-trivial); swap a hash in if ids arrive clustered
    by size."""
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.select(id_col, tokens_col)
        .withColumn("shard", F.pmod(F.col(id_col), F.lit(n_shards)))
        .withColumn("running_tokens", F.sum(tokens_col).over(w))
        # floor, not `div`: `div` truncates toward zero, so a zero-token
        # document first in its shard (running_tokens-1 == -1) would get
        # pack_id 0 where floor semantics (and DuckDB's `//`) give -1.
        # Exact for running token counts < 2^53.
        .withColumn(
            "pack_id",
            F.floor((F.col("running_tokens") - F.lit(1)) / F.lit(budget)).cast("long"),
        )
    )


def cap_per_group(
    df: DataFrame, group_col: str, order_by: list[Column], k: int
) -> DataFrame:
    """Per-group document cap (C4-style "at most k pages per host"):
    keep the first ``k`` rows of each group under ``order_by``.

    ``order_by`` must be a total order within a group (include the id
    as a tiebreak) or the kept set is nondeterministic.

    Scale shape: ONE shuffle on ``group_col`` and a bounded per-group
    state (row counter) — the window never materializes a group, it
    streams it.  Skew note: a single pathological group serializes
    through one task; when a group can exceed ~10M rows, pre-filter
    with a cheap per-group threshold (approx quantile of the order key)
    so the windowed remainder is small, or salt a two-phase top-k.
    """
    w = Window.partitionBy(group_col).orderBy(*order_by)
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") <= k).drop("_rn")


def rebalance_to_uniform(
    df: DataFrame, group_col: str, id_col: str, width: int = 4
) -> DataFrame:
    """Deterministic downsample to a *uniform* group mixture: every
    group keeps a ``min_group_count / its_count`` fraction of rows via
    the same (group, id) hash draw as :func:`stratified_sample` — the
    smallest group survives whole, every other group is thinned to
    match it.  This is the apply-side of :func:`domain_mixture`: the
    weight table says how skewed the corpus is; this op removes the
    skew without ever calling rand().

    The per-group fraction is data-dependent, so the threshold is a
    *computed column*, not a Python constant: ``floor(fraction *
    16^width)`` rendered as a zero-padded hex string (engine-portable —
    same IEEE division and floor in any engine; a fraction of exactly
    1.0 maps to the ``'g'`` keep-all sentinel, see
    :func:`hex_threshold`).

    Scale shape: counts are a map-side-combined groupBy (the shuffle
    carries one long per group); the threshold table is group-sized and
    broadcast; the corpus itself is filter-only — never shuffled.
    """
    counts = df.groupBy(group_col).agg(F.count("*").alias("_n"))
    mn = counts.agg(F.min("_n").alias("_mn"))
    thr = counts.crossJoin(F.broadcast(mn)).select(
        group_col,
        F.when(F.col("_n") == F.col("_mn"), F.lit("g"))
        .otherwise(
            F.lpad(
                F.lower(
                    F.hex(
                        F.floor(
                            F.col("_mn").cast("double")
                            / F.col("_n").cast("double")
                            * (16 ** width)
                        )
                    )
                ),
                width,
                "0",
            )
        )
        .alias("_thr"),
    )
    h = hash_fraction_prefix(
        F.concat_ws("|", F.col(group_col), F.col(id_col).cast("string")), width
    )
    return df.join(F.broadcast(thr), group_col).filter(h < F.col("_thr")).drop("_thr")


def percentile_filter(
    df: DataFrame, value_col: str, p: float, approx: bool = False
) -> DataFrame:
    """Keep rows at or above the corpus-wide p-quantile of
    ``value_col`` — the quality-threshold gate ("drop the bottom
    quartile by quality score") of a filtering pipeline.

    ``approx=False`` (default) uses exact interpolated ``percentile``:
    a single-reducer aggregate holding all values in one buffer — the
    correctness/oracle form, fine up to ~10^8 rows.  **At 100 TB pass
    ``approx=True``**: ``approx_percentile`` is a mergeable sketch
    (map-side partials, constant memory) with the same plan shape; a
    test pins the two within tolerance on the corpus.

    The threshold is a 1-row aggregate broadcast into a filter — the
    corpus itself is never shuffled.
    """
    agg = (
        F.percentile_approx(F.col(value_col).cast("double"), F.lit(p))
        if approx
        else F.percentile(F.col(value_col).cast("double"), F.lit(p))
    )
    thr = df.agg(agg.alias("_thr"))
    return (
        df.crossJoin(F.broadcast(thr))
        .filter(F.col(value_col).cast("double") >= F.col("_thr"))
        .drop("_thr")
    )


def select_token_budget(
    df: DataFrame,
    score_col: str,
    id_col: str,
    tokens_col: str,
    budget: int,
) -> DataFrame:
    """Greedy data selection under a token budget: take documents in
    (score DESC, id ASC) order while the running token total stays ≤
    ``budget`` — the "best data that fits the training budget" step of
    a curriculum/selection pipeline.  Output ≡ the naive global
    ``SUM(tokens) OVER (ORDER BY score DESC, id) <= budget`` filter,
    with an added ``cum_tokens`` column.

    Scale shape — the naive form is a GLOBAL single-partition window
    over the corpus, which does not scale; this is the two-phase
    decomposition: (1) per-score token totals (map-side-combined
    groupBy; the only globally-ordered window runs over this
    score-cardinality table, which is bounded — quantize a continuous
    score to fixed precision first if necessary) giving each score its
    exclusive prefix sum; (2) the corpus joins its score's prefix
    (broadcast — the table is one row per distinct score) and runs a
    per-score streaming cumulative sum ordered by id.  prefix +
    within-score running sum ≡ the global running sum, because the
    global order (score DESC, id) visits whole score-groups
    consecutively.  The corpus is shuffled once, on the score key."""
    per_score = df.groupBy(score_col).agg(F.sum(tokens_col).alias("_gt"))
    w_pre = (
        Window.orderBy(F.desc(score_col)).rowsBetween(Window.unboundedPreceding, -1)
    )
    pre = per_score.withColumn(
        "_prefix", F.coalesce(F.sum("_gt").over(w_pre), F.lit(0).cast("long"))
    )
    w_in = (
        Window.partitionBy(score_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.join(F.broadcast(pre.select(score_col, "_prefix")), score_col)
        .withColumn("cum_tokens", F.col("_prefix") + F.sum(tokens_col).over(w_in))
        .filter(F.col("cum_tokens") <= budget)
        .drop("_prefix")
    )


def assign_shards(df: DataFrame, id_col: str) -> DataFrame:
    """Deterministic training-export sharding: adds ``sort_key`` (the
    full md5 hex of the id — the within-shard ordering key every
    dataloader shuffles by) and ``shard`` (the first hex digit → 16
    shards; two digits give 256 — shard count is a power of 16 by
    construction, which keeps the digit→shard map engine-portable with
    no hex→int conversion anywhere).

    The assignment is a pure function of the id: re-runs, appends and
    backfills land every document in the same shard at the same
    position, so shard files are reproducible and resumable — the same
    rand()-free property as :func:`train_val_test_split`, extended with
    an ORDER.  Narrow (computed in the scan's project, no shuffle);
    writing the export is ``partitionBy("shard")`` + a per-shard sort
    on ``sort_key``."""
    skey = F.md5(F.col(id_col).cast("string"))
    return df.withColumn("sort_key", skey).withColumn(
        "shard", F.conv(F.substring("sort_key", 1, 1), 16, 10).cast("long")
    )


def export_jsonl_shards(df: DataFrame, path: str, id_col: str) -> DataFrame:
    """The training-export sink: write the corpus as 16 sharded JSONL
    files under ``path/shard=N/`` using :func:`assign_shards`'s
    deterministic (shard, sort_key) layout, and return the manifest
    DataFrame (shard, n_docs) the dataloader verifies against.

    Layout guarantees (tested in ``tests/test_sampling.py``):
    - shard membership and within-file LINE ORDER are pure functions of
      the id (hash-repartition on the shard key so each shard is built
      by exactly one task → one file per shard dir, then a per-task
      sort on (shard, sort_key)) — re-exports are byte-reproducible
      and appends land at deterministic positions;
    - the files are plain ``.json`` lines readable by any JSONL
      consumer, not just Spark.

    Scale shape: one shuffle on the shard key + a per-task sort;
    nothing driver-side.  16 shards is the test-scale default — at
    100 TB you take two hex digits (256) or more in
    :func:`assign_shards` and the plan is unchanged.  The manifest
    recomputation reads only the written files' (shard, doc_id)
    columns — column-pruned at the JSON reader."""
    sharded = assign_shards(df, id_col)
    (
        sharded.repartition(16, "shard")
        .sortWithinPartitions("shard", "sort_key")
        .write.mode("overwrite")
        .partitionBy("shard")
        .json(path)
    )
    out = sharded.sparkSession.read.json(path)
    return out.groupBy("shard").agg(F.count("*").alias("n_docs"))


def mixture_drift(
    a: DataFrame, b: DataFrame, group_col: str
) -> DataFrame:
    """Mixture drift between two corpus snapshots: per group, the doc
    counts and shares on each side and |share_a − share_b| — the
    monitoring signal a pipeline alarms on when a crawl refresh or an
    upstream filter change silently shifts the language/domain mix.
    (Total-variation distance is ½·Σ of the drift column; the summation
    is left to the caller because a float Σ over an unordered shuffle
    is not bit-reproducible — the per-group rows are, each being
    integer counts and single IEEE divisions.)

    Groups absent from one side appear with count 0 (full outer join).

    Scale shape: each side is one map-side-combined count per group;
    totals come from an unpartitioned window over the GROUP table
    (bounded cardinality, same caveat as :func:`select_token_budget`);
    the corpus itself is never joined or shuffled beyond the counts."""
    ca = a.groupBy(group_col).agg(F.count("*").alias("n_a"))
    cb = b.groupBy(group_col).agg(F.count("*").alias("n_b"))
    j = (
        ca.join(cb, group_col, "full_outer")
        .withColumn("n_a", F.coalesce("n_a", F.lit(0)))
        .withColumn("n_b", F.coalesce("n_b", F.lit(0)))
    )
    w = Window.partitionBy()
    out = j.select(
        group_col,
        "n_a",
        "n_b",
        (F.col("n_a").cast("double") / F.sum("n_a").over(w).cast("double")).alias(
            "share_a"
        ),
        (F.col("n_b").cast("double") / F.sum("n_b").over(w).cast("double")).alias(
            "share_b"
        ),
    )
    return out.withColumn("drift", F.abs(F.col("share_a") - F.col("share_b")))


def quality_distribution(
    df: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """Per-group quality-quartile counts: bucket every row against the
    CORPUS-WIDE p25/p50/p75 of ``value_col`` and count each (group,
    quartile) cell — the "is domain X all low-quality?" report that
    decides per-domain filtering policy.

    Exact interpolated percentiles (the oracle form — see
    :func:`percentile_filter` for the ``approx_percentile`` swap at
    100 TB); the three thresholds are a 1-row aggregate broadcast into
    the bucketing projection, then one (group, quartile) count shuffle
    of integers.  Bucket b = #{thresholds < value} ∈ {0,1,2,3}, so
    values exactly AT a threshold land in the lower bucket in both
    engines."""
    v = F.col(value_col).cast("double")
    thr = df.agg(
        F.percentile(v, F.lit(0.25)).alias("_p25"),
        F.percentile(v, F.lit(0.5)).alias("_p50"),
        F.percentile(v, F.lit(0.75)).alias("_p75"),
    )
    bucket = (
        F.when(v <= F.col("_p25"), 0)
        .when(v <= F.col("_p50"), 1)
        .when(v <= F.col("_p75"), 2)
        .otherwise(3)
    )
    return (
        df.crossJoin(F.broadcast(thr))
        .withColumn("quartile", bucket.cast("long"))
        .groupBy(group_col, "quartile")
        .agg(F.count("*").alias("n_docs"))
    )


def domain_mixture(df: DataFrame, domain_col: str, tokens_col: str) -> DataFrame:
    """Per-domain corpus share — the mixing-weight table: docs, tokens,
    and token_share (exact integer sums, one IEEE division)."""
    per = df.groupBy(domain_col).agg(
        F.count("*").alias("docs"), F.sum(tokens_col).alias("tokens")
    )
    total = Window.partitionBy()
    return per.select(
        domain_col,
        "docs",
        "tokens",
        (
            F.col("tokens").cast("double") / F.sum("tokens").over(total).cast("double")
        ).alias("token_share"),
    )


def temperature_rebalance(
    df: DataFrame,
    group_col: str,
    id_col: str,
    n_target: int,
) -> DataFrame:
    """Temperature-flattened mixture sampling at α = 1/2 — the standard
    multilingual-pretraining compromise between proportional sampling
    (head languages drown the tail) and uniform sampling (tail
    languages over-repeat): group ``g`` receives a share of the
    ``n_target`` budget proportional to ``sqrt(n_g)``.

    Exactness contract: the weights are **integer** square roots
    (``floor(sqrt(n))`` is exact for counts < 2^52 — sqrt is IEEE
    correctly-rounded in every engine, and a correctly-rounded result
    cannot cross an integer boundary), the budget split is integer
    ``div``, and membership is "first ``target_g`` rows of the group
    in md5-of-id order" — a pure function of the data, reproducible
    anywhere, no rand().  General α would need ``pow`` (two libm
    implementations racing); α = 1/2 is the documented, portable
    point on the dial.

    Groups whose target exceeds their size keep everything (the
    row_number guard is naturally capped), so the output can be under
    ``n_target`` when small groups can't fill their allocation —
    matching the standard formulation, which re-normalizes in a second
    round if exact totals matter.

    Scale shape: one 1-row-per-group count agg, a broadcast target
    table, and ONE corpus shuffle on ``group_col`` for the streaming
    row_number — :func:`cap_per_group`'s shape with a data-dependent
    per-group k (its skew note applies)."""
    counts = df.groupBy(group_col).agg(F.count("*").alias("_n"))
    w = counts.withColumn("_w", F.floor(F.sqrt(F.col("_n"))).cast("long"))
    tot = w.agg(F.sum("_w").cast("long").alias("_tw"))
    targets = (
        w.join(F.broadcast(tot))
        .withColumn("_target", F.expr(f"({n_target} * _w) div _tw"))
        .select(group_col, "_target")
    )
    rank_w = Window.partitionBy(group_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        df.join(F.broadcast(targets), group_col)
        .withColumn("_rn", F.row_number().over(rank_w))
        .filter(F.col("_rn") <= F.col("_target"))
        .drop("_rn", "_target")
    )


def percentile_rank(
    df: DataFrame,
    score_col: str,
    id_col: str,
) -> DataFrame:
    """Exact corpus-wide percentile rank of every row's score — the
    calibration step that turns heterogeneous quality signals into a
    comparable [0, 1] scale before mixing them (a length score and a
    classifier score can't be averaged raw; their percentiles can).

    rank = 1 + count(strictly better scores), ties share the min rank
    (SQL ``rank()`` semantics); pct = (rank − 1) / (N − 1), one IEEE
    division of exact integers (0.0 when N = 1).

    Scale shape: the naive form is ``rank() OVER (ORDER BY score)`` — a
    GLOBAL single-partition sort of the corpus, which does not scale.
    This is the same two-phase decomposition as
    :func:`select_token_budget`: (1) per-score counts (map-side-combined
    agg), (2) an ordered prefix-sum window over the DISTINCT-SCORE
    table only (bounded — quantize a continuous score first if its
    cardinality approaches the corpus), (3) broadcast the (score,
    prefix) table back onto the corpus as an equi-join.  The corpus is
    never globally ordered; its only shuffle is the count agg."""
    counts = df.groupBy(score_col).agg(F.count("*").cast("long").alias("_c"))
    w_pre = Window.orderBy(F.desc(score_col)).rowsBetween(Window.unboundedPreceding, -1)
    pre = counts.withColumn("_better", F.coalesce(F.sum("_c").over(w_pre), F.lit(0)))
    total = counts.agg(F.sum("_c").cast("long").alias("_n"))
    ranked = (
        df.join(F.broadcast(pre.select(score_col, "_better")), score_col)
        .join(F.broadcast(total))
        .withColumn("rank", (F.col("_better") + 1).cast("long"))
        .withColumn(
            "pct",
            F.when(F.col("_n") > 1,
                   F.col("_better").cast("double") / (F.col("_n") - 1).cast("double"))
            .otherwise(F.lit(0.0)),
        )
    )
    return ranked.drop("_better", "_n")


LENGTH_BUCKETS = (16, 32, 64, 128, 256, 512)


def length_bucketed_batches(
    df: DataFrame,
    tokens_col: str,
    id_col: str,
    batch_size: int = 8,
    buckets: tuple[int, ...] = LENGTH_BUCKETS,
) -> DataFrame:
    """Length-bucketed batch assembly — the dynamic-batching step that
    keeps padding waste down when packing variable-length documents
    into fixed training batches: docs are grouped into length buckets
    (CASE ladder over ``buckets`` upper bounds — pure integer compares,
    engine-exact where ``floor(log2(n))`` could race a libm), sharded
    by md5 first hex digit, and numbered into batches of ``batch_size``
    within each (bucket, shard) in md5-of-id order.

    Returns one row per BATCH: (bucket, shard, batch_id, n_docs,
    max_tokens, sum_tokens, padding_waste) where padding_waste =
    n_docs·max_tokens − sum_tokens, the tokens a rectangular batch
    tensor wastes — the quantity this op exists to minimize (compare
    against a single unbucketed stream to see the win).

    Scale shape: ONE corpus shuffle on (bucket, shard) followed by a
    streaming row_number — the 16-way shard key bounds per-task skew
    that partitioning by bucket alone would concentrate (a corpus is
    mostly mid-length docs); the per-batch agg reuses the same
    partitioning, so no second corpus shuffle.  Batch membership is a
    pure function of the data — reruns and engines agree."""
    bucket = F.lit(len(buckets))  # overflow bucket
    for i in range(len(buckets) - 1, -1, -1):
        bucket = F.when(F.col(tokens_col) <= buckets[i], F.lit(i)).otherwise(bucket)
    shard = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 1), 16, 10
    ).cast("long")
    w = Window.partitionBy("bucket", "shard").orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    assigned = (
        df.withColumn("bucket", bucket)
        .withColumn("shard", shard)
        .withColumn("_rn", F.row_number().over(w))
        .withColumn("batch_id", F.floor((F.col("_rn") - 1) / batch_size).cast("long"))
    )
    return (
        assigned.groupBy("bucket", "shard", "batch_id")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.max(tokens_col).cast("long").alias("max_tokens"),
            F.sum(tokens_col).cast("long").alias("sum_tokens"),
        )
        .withColumn(
            "padding_waste",
            F.col("n_docs") * F.col("max_tokens") - F.col("sum_tokens"),
        )
    )


def systematic_pps_sample(
    df: DataFrame,
    weight_col: str,
    id_col: str,
    k: int,
    chunk: int = 1024,
    salt: str = "pps",
) -> DataFrame:
    """Deterministic weighted sampling ~without replacement: draw ~``k``
    rows with inclusion probability proportional to ``weight_col`` by
    SYSTEMATIC PPS — lay every row's weight end-to-end along an integer
    line in ``id_col`` order, then take one row at each of ``k`` evenly
    spaced points (stride = total div k) starting from a rand-free
    md5-derived offset.  The classic survey-statistics design: exact
    integer arithmetic throughout (no pow/ln — an Efraimidis–Spirakis
    exponential key would compare libm implementations across engines),
    fully deterministic under any partitioning, and the standard
    token-weighted document draw for assembling mixture subsets (big
    docs proportionally more likely; a row with weight ≥ stride is
    always taken — selected once, noted, never duplicated).

    Scale shape: the global cumulative sum is the usual scale trap (a
    global-order window runs in ONE task), so it is built as a
    TWO-LEVEL prefix — per-chunk totals (id div chunk) get a prefix
    window over the tiny chunk table, broadcast back, then a
    chunk-partitioned running sum adds the within-chunk part (the x27
    two-level fold, applied to prefix sums).  The only corpus-sized
    shuffles are the chunk groupBy and the chunk-keyed window sort.

    Returns (id, weight, pick) where ``pick`` is the 1-based index of
    the sampling point that selected the row.  Point count is
    ``(total + stride−1−offset) div stride`` = k plus up to
    ``(total mod k) div stride`` stride-truncation extras — exactly k
    when k | total, and k or k+1 whenever total ≫ k² (always true for
    token weights); rows spanning several points are selected once.

    Job-fails (raise_error) if total weight < k — no valid stride.  All
    parameters (total, stride, offset) stay column-side in a broadcast
    1-row frame: no driver collect, one job end-to-end.
    """
    d = df.select(
        F.col(id_col).alias("_id"), F.col(weight_col).cast("long").alias("_w")
    ).where(F.col("_w") > 0)
    d = d.withColumn("_chunk", F.expr(f"_id div {chunk}"))
    chunk_tot = d.groupBy("_chunk").agg(F.sum("_w").alias("_cw"))
    w_chunks = Window.orderBy("_chunk").rowsBetween(Window.unboundedPreceding, -1)
    chunk_prefix = chunk_tot.select(
        "_chunk", F.coalesce(F.sum("_cw").over(w_chunks), F.lit(0)).alias("_cprev")
    )
    w_in = Window.partitionBy("_chunk").orderBy("_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = d.join(F.broadcast(chunk_prefix), "_chunk").withColumn(
        "_cum", (F.col("_cprev") + F.sum("_w").over(w_in)).cast("long")
    )
    params = (
        d.agg(F.sum("_w").cast("long").alias("_total"))
        .select(
            "_total",
            # the guard lives INSIDE the kept _stride expression so
            # column pruning can never optimize it away
            F.expr(
                f"CASE WHEN _total >= {k} THEN _total div {k} "
                f"ELSE CAST(raise_error('total weight < k={k}: no valid stride') AS BIGINT) END"
            ).alias("_stride"),
        )
        .withColumn(
            "_offset",
            F.pmod(
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.lit(f"{salt}:{k}:"), F.col("_total").cast("string"))), 1, 8
                    ),
                    16,
                    10,
                ).cast("long"),
                F.col("_stride"),
            ),
        )
        .select("_stride", "_offset")
    )

    def sel(c):
        return F.expr(f"({c} + _stride - 1 - _offset) div _stride")

    return (
        cum.join(F.broadcast(params))
        .where(sel("_cum") > sel("_cum - _w"))
        .select(
            F.col("_id").alias(id_col),
            F.col("_w").alias(weight_col),
            sel("_cum").cast("long").alias("pick"),
        )
    )


def histogram_quantiles(
    df: DataFrame,
    value_col: str,
    probs: list[tuple[int, int]],
    lo: int,
    hi: int,
    n_bins: int,
) -> DataFrame:
    """Deterministic distributed quantile estimation by fixed-bin
    histogram — the engine-portable sibling of ``percentile_filter``'s
    two forms: exact ``percentile`` is a single-reducer buffer (dies
    at 100 TB), ``approx_percentile`` is a mergeable sketch but its
    estimates are implementation-defined (not reproducible across
    engines or versions).  A fixed integer binning is BOTH mergeable
    and bit-reproducible: bin assignment is pure integer arithmetic in
    the scan's project, the only shuffle aggregates ``n_bins`` groups
    (map-side combined), and the estimate is read off the cumulative
    histogram with one IEEE interpolation division per requested
    quantile.

    ``probs`` are RATIONALS (num, den) so the target rank
    ``ceil(p*n) = (n*num + den - 1) div den`` stays integer-exact.
    Values are clamped into [lo, hi): bin width must divide evenly
    ((hi-lo) % n_bins == 0, asserted) so edges are integers.

    Returns one row per prob: (p_num, p_den, target_rank, bin_idx,
    bin_lo, est) where bin_idx/bin_lo locate the quantile bin
    (integer-exact, the hashable contract) and ``est`` linearly
    interpolates within it (est = bin_lo + width*(target-cum_below)/
    bin_count).  Estimate error is bounded by one bin width — choose
    n_bins from the tolerance, not the data size."""
    hist = value_histogram(df, value_col, lo, hi, n_bins)
    return quantiles_from_histogram(hist, probs, lo, hi, n_bins)


def value_histogram(
    df: DataFrame, value_col: str, lo: int, hi: int, n_bins: int
) -> DataFrame:
    """(bin_idx, cnt): the fixed-bin count table feeding
    :func:`quantiles_from_histogram`.  MERGEABLE by construction —
    two histograms (two snapshots, two streamed generations) sum
    bin-wise to the histogram of the union, which is what makes the
    streamed form exact (streaming/stats.py)."""
    assert (hi - lo) % n_bins == 0, "bin width must be integral"
    width = (hi - lo) // n_bins
    v = F.col(value_col).cast("long")
    clamped = F.least(F.lit(hi - 1).cast("long"), F.greatest(F.lit(lo).cast("long"), v))
    return (
        df.select((clamped - F.lit(lo)).alias("_off"))
        .selectExpr(f"_off div {width} as bin_idx")
        .groupBy("bin_idx")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def quantiles_from_histogram(
    hist: DataFrame,
    probs: list[tuple[int, int]],
    lo: int,
    hi: int,
    n_bins: int,
) -> DataFrame:
    """The quantile read-off over a (bin_idx, cnt) table — shared by
    the in-flight form and any persisted/streamed histogram (sum the
    stored generations bin-wise first; additivity makes the result
    bit-equal to an in-flight pass over the union)."""
    assert (hi - lo) % n_bins == 0, "bin width must be integral"
    width = (hi - lo) // n_bins
    w = Window.orderBy("bin_idx").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.withColumn("cum", F.sum("cnt").over(w).cast("long")).withColumn(
        "n", F.sum("cnt").over(Window.partitionBy()).cast("long")
    )
    spark = hist.sparkSession
    pdf = F.broadcast(
        spark.createDataFrame(list(probs), "p_num long, p_den long")
    )
    hit = (
        cum.crossJoin(pdf)
        .withColumn(
            "target_rank",
            F.expr("(n * p_num + p_den - 1) div p_den").cast("long"),
        )
        .filter(F.col("cum") >= F.col("target_rank"))
    )
    wp = Window.partitionBy("p_num", "p_den").orderBy("bin_idx")
    first = hit.withColumn("rn", F.row_number().over(wp)).filter(F.col("rn") == 1)
    return first.select(
        "p_num",
        "p_den",
        "target_rank",
        "bin_idx",
        (F.lit(lo) + F.col("bin_idx") * F.lit(width)).cast("long").alias("bin_lo"),
        (
            (F.lit(lo) + F.col("bin_idx") * F.lit(width)).cast("double")
            + F.lit(float(width))
            * (F.col("target_rank") - (F.col("cum") - F.col("cnt"))).cast("double")
            / F.col("cnt").cast("double")
        ).alias("est"),
    )


def grouped_histogram_quantiles(
    df: DataFrame,
    value_col: str,
    group_col: str,
    probs: list[tuple[int, int]],
    lo: int,
    hi: int,
    n_bins: int,
) -> DataFrame:
    """:func:`histogram_quantiles` per group — the per-language /
    per-domain form (length and quality thresholds are set per
    stratum, not globally: a p90 length cut tuned on English truncates
    languages with longer words).  Same integer contracts; the
    histogram shuffle keys on (group, bin) and the windows run over
    the per-group n_bins-row tables, so adding groups never adds a
    corpus pass.  Returns one row per (group, prob)."""
    assert (hi - lo) % n_bins == 0, "bin width must be integral"
    width = (hi - lo) // n_bins
    v = F.col(value_col).cast("long")
    clamped = F.least(F.lit(hi - 1).cast("long"), F.greatest(F.lit(lo).cast("long"), v))
    hist = (
        df.select(F.col(group_col).alias("grp"), (clamped - F.lit(lo)).alias("_off"))
        .selectExpr("grp", f"_off div {width} as bin_idx")
        .groupBy("grp", "bin_idx")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    w = Window.partitionBy("grp").orderBy("bin_idx").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = hist.withColumn("cum", F.sum("cnt").over(w).cast("long")).withColumn(
        "n", F.sum("cnt").over(Window.partitionBy("grp")).cast("long")
    )
    pdf = F.broadcast(
        df.sparkSession.createDataFrame(list(probs), "p_num long, p_den long")
    )
    hit = (
        cum.crossJoin(pdf)
        .withColumn(
            "target_rank",
            F.expr("(n * p_num + p_den - 1) div p_den").cast("long"),
        )
        .filter(F.col("cum") >= F.col("target_rank"))
    )
    wp = Window.partitionBy("grp", "p_num", "p_den").orderBy("bin_idx")
    first = hit.withColumn("rn", F.row_number().over(wp)).filter(F.col("rn") == 1)
    return first.select(
        F.col("grp").alias(group_col),
        "p_num",
        "p_den",
        "target_rank",
        "bin_idx",
        (F.lit(lo) + F.col("bin_idx") * F.lit(width)).cast("long").alias("bin_lo"),
        (
            (F.lit(lo) + F.col("bin_idx") * F.lit(width)).cast("double")
            + F.lit(float(width))
            * (F.col("target_rank") - (F.col("cum") - F.col("cnt"))).cast("double")
            / F.col("cnt").cast("double")
        ).alias("est"),
    )


def concat_chunk_spans(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    context_len: int,
    bucket_size: int = 4096,
) -> DataFrame:
    """Concat-and-chunk fragmentation audit: GPT-style packing
    concatenates the corpus in a fixed document order and cuts every
    ``context_len`` tokens — unlike :func:`pack_sequences` (shard-local
    budgets) the offsets here are GLOBAL, so a document's chunk span
    is exact across the whole corpus: which training windows it lands
    in, and whether it is split across a window boundary (the
    fragmentation a context-window data loader actually inflicts).

    The global running offset is a two-level distributed prefix sum —
    the textbook scan algorithm as DataFrame ops, never a global
    single-partition window:

      1. within-bucket cumsum: window partitioned by
         ``bucket = id div bucket_size`` (parallel across buckets);
      2. bucket offsets: the per-bucket totals (corpus/bucket_size
         rows) get their own cumulative window — a table this small is
         one partition by construction; were the corpus so large that
         even IT overflows a partition, the same split applies again
         (the scan recursion) — then broadcast back.

    Returns one row per document: ``start_off`` (global token offset),
    ``first_chunk``/``last_chunk`` (= ``start div C`` / ``(start+n-1)
    div C``), ``n_chunks`` spanned and the ``crosses`` flag.  All
    integers; exact for corpus token totals < 2^63."""
    base = df.select(
        F.col(id_col).alias("_id"), F.col(tokens_col).cast("long").alias("_n")
    ).withColumn("_bkt", (F.col("_id") / F.lit(bucket_size)).cast("long"))
    win = (
        Window.partitionBy("_bkt")
        .orderBy("_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = base.withColumn("_cum", F.sum("_n").over(win))
    totals = base.groupBy("_bkt").agg(F.sum("_n").alias("_bt"))
    woff = Window.orderBy("_bkt").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    offsets = totals.withColumn(
        "_boff", (F.sum("_bt").over(woff) - F.col("_bt")).cast("long")
    ).select("_bkt", "_boff")
    c = F.lit(int(context_len))
    out = (
        local.join(F.broadcast(offsets), "_bkt")
        .withColumn("start_off", (F.col("_boff") + F.col("_cum") - F.col("_n")))
        .withColumn("first_chunk", F.floor(F.col("start_off") / c).cast("long"))
        .withColumn(
            "last_chunk",
            F.floor((F.col("start_off") + F.col("_n") - F.lit(1)) / c).cast("long"),
        )
    )
    return out.select(
        F.col("_id").alias(id_col),
        F.col("_n").alias("n_tok"),
        F.col("start_off").cast("long"),
        "first_chunk",
        "last_chunk",
        (F.col("last_chunk") - F.col("first_chunk") + F.lit(1)).cast("long").alias("n_chunks"),
        F.when(F.col("last_chunk") > F.col("first_chunk"), F.lit(1))
        .otherwise(F.lit(0))
        .cast("int")
        .alias("crosses"),
    )


def doremi_reweight(
    docs: DataFrame,
    scores: DataFrame,
    group_col: str = "source",
    scale: int = 10**4,
) -> DataFrame:
    """One DoReMi-style mixture-reweighting step (cf. Xie et al. 2023,
    "DoReMi: Optimizing Data Mixtures Speeds Up Language Model
    Pretraining"): domains whose excess loss (here: avg unigram
    surprisal above the corpus-wide average, the x51 proxy) is larger
    get their mixture weight multiplied UP, then weights renormalize.
    DoReMi's update is ``w·exp(η·excess)``; this operator applies the
    order-preserving bounded integer surrogate

        w1_raw = w0 · (scale + min(scale, excess_fp)) div scale

    (multiplier ∈ [1, 2] — the first-order exp surrogate, monotone in
    excess, libm-free so the update is bit-identical across engines).
    ``scores`` is the per-doc (doc_id, n_tokens, surprisal_sum) table
    — x51's scorer inline, or the x86 snapshot form at scale so this
    step never re-aggregates the corpus.

    Scale shape: one doc→domain join + a |domains|-row aggregate;
    everything after is arithmetic over the domain table with two
    1-row broadcast totals.  Int64 ceiling: surprisal_sum · scale <
    2^63 (at the default scale=10^4, corpus surprisal mass < 9·10^14 —
    shard by language past that).

    Returns per domain: token counts, fixed-point avg surprisal,
    excess over baseline, the old (token-share) and updated mixture
    weights, both normalized to ``scale``."""
    s = F.lit(int(scale)).cast("long")
    dom = (
        scores.join(docs.select("doc_id", group_col), "doc_id")
        .groupBy(group_col)
        .agg(
            F.sum("n_tokens").cast("long").alias("n_d"),
            F.sum("surprisal_sum").cast("long").alias("s_d"),
        )
    )
    tot = dom.agg(
        F.sum("n_d").cast("long").alias("n_all"),
        F.sum("s_d").cast("long").alias("s_all"),
    )
    sc = dom.crossJoin(F.broadcast(tot)).select(
        group_col,
        "n_d",
        F.expr("s_d * {0} DIV n_d".format(int(scale))).cast("long").alias("avg_fp"),
        F.expr("s_all * {0} DIV n_all".format(int(scale))).cast("long").alias("base_fp"),
        F.expr("n_d * {0} DIV n_all".format(int(scale))).cast("long").alias("w0_fp"),
    )
    up = sc.select(
        group_col,
        "n_d",
        "avg_fp",
        F.greatest(F.lit(0).cast("long"), F.col("avg_fp") - F.col("base_fp")).alias(
            "excess_fp"
        ),
        "w0_fp",
    ).withColumn(
        "w1_raw",
        F.expr(
            "(w0_fp * ({0} + least(CAST({0} AS BIGINT), excess_fp))) DIV {0}".format(
                int(scale)
            )
        ).cast("long"),
    )
    ut = up.agg(F.sum("w1_raw").cast("long").alias("w1_tot"))
    return up.crossJoin(F.broadcast(ut)).select(
        group_col,
        F.col("n_d").alias("n_tokens"),
        "avg_fp",
        "excess_fp",
        "w0_fp",
        F.expr("w1_raw * {0} DIV w1_tot".format(int(scale))).cast("long").alias("w1_fp"),
    )
