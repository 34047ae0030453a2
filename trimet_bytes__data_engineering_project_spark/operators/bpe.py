"""Distributed BPE vocabulary induction (byte-pair encoding, Sennrich
et al. 2016 — public): learn the first ``n_merges`` merge rules of a
subword tokenizer directly on the corpus, the vocabulary-construction
step every pretraining pipeline runs before token counting means
anything.

Word-internal BPE over the repo's shared whitespace tokenization
(``dedup.tokens``): each word occurrence becomes a character-symbol
array; one learning step = count all adjacent symbol pairs corpus-wide,
take the argmax (count desc, pair asc — deterministic ties), and apply
the merge GREEDILY LEFT-TO-RIGHT within every word (the reference
algorithm's semantics, including the overlapping-run case: merging
(a, a) into "aaaa" yields [aa, aa], never [a, aa, a]).

Spark-first shapes:

- **Counting** never uses per-word windows: adjacent pairs come from
  ``zip_with(slice(syms, 1, n-1), slice(syms, 2, n-1))`` in the scan's
  project — one explode, one map-side-combining count on (a, b).
- **Applying** a merge is a pure ARRAY-LOCAL fold (``F.aggregate`` with
  a (out, pend) accumulator — out is the rebuilt array, pend the
  candidate left symbol awaiting its right half).  Zero shuffles, whole
  rows never leave their partition, and the greedy/overlap semantics
  fall out of the fold order.  The merge pair is parameterized as
  ``F.lit`` columns, never spliced into an expr string (corpus symbols
  may contain quotes/backslashes).
- Each learning step localCheckpoints the rewritten symbol table: the
  step's output feeds BOTH the next count and the next apply (the x100
  multi-consumer rule), and the fold-in-fold plan would otherwise nest
  ``n_merges`` deep.

Scale shape: the trainer runs on the word-TYPE table (``word_types`` —
one corpus-sized, map-side-combining word count, the Zipf collapse of
the reference trainer's dict-of-words), so each learned merge costs one
explode + count shuffle over VOCABULARY characters with freq-weighted
sums — identical numbers to per-occurrence counting, at a fraction of
the rows; symbol totals only shrink as merges apply.  The reference's
in-memory pair-count heap with deltas is a driver-side structure that
cannot hold a 100 TB vocabulary; production pipelines additionally
learn the table on a deterministic SAMPLE (compose with
``sampling.train_val_test_split``'s hash-threshold filter) and apply it
corpus-wide, which this layout supports unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_ACC_ZERO = (
    "struct(cast(array() as array<string>) as out, cast(null as string) as pend)"
)


def word_symbol_arrays(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, wp, syms): one row per word OCCURRENCE, ``syms`` the
    word's character array, ``wp`` the 0-based word position (carried
    so any engine can name a word occurrence deterministically).
    Empty/degenerate words map to empty arrays."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    return (
        docs.select(F.col(id_col).alias("doc_id"), F.posexplode(toks).alias("wp", "w"))
        .select(
            "doc_id",
            "wp",
            F.filter(F.split(F.col("w"), ""), lambda x: x != F.lit("")).alias("syms"),
        )
    )


def word_types(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(w, freq, syms): one row per distinct word TYPE with its corpus
    occurrence count — the Zipf collapse every reference BPE trainer
    performs (Sennrich's dict-of-words).  All later learning work is
    linear in VOCABULARY characters, not corpus characters: the only
    corpus-sized job is this one map-side-combining word count, paid
    once, and the per-step pair counts carry ``freq`` as a weight so
    they sum to exactly the per-occurrence numbers."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    return (
        docs.select(F.explode(toks).alias("w"))
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("freq"))
        .withColumn(
            "syms", F.filter(F.split(F.col("w"), ""), lambda x: x != F.lit(""))
        )
    )


def _pair_structs(c):
    """array<struct<a,b>> of the ADJACENT symbol pairs of array column
    ``c`` (all occurrences, overlaps included), assembled array-locally
    via ``zip_with(slice, slice)`` — shared by :func:`pair_counts` and
    the fused delta step of :func:`bpe_learn_incremental`."""
    return F.when(
        F.size(c) >= 2,
        F.zip_with(
            F.slice(c, 1, F.size(c) - 1),
            F.slice(c, 2, F.size(c) - 1),
            lambda l, r: F.struct(l.alias("a"), r.alias("b")),
        ),
    ).otherwise(F.expr("cast(array() as array<struct<a:string,b:string>>)"))


def pair_counts(
    words: DataFrame, sym_col: str = "syms", weight_col: str | None = None
) -> DataFrame:
    """(a, b, cnt): corpus-wide adjacent-pair counts, ALL occurrences
    (overlaps included — "aaa" contributes (a,a) twice, the reference
    counting).  Pairs are assembled array-locally; the only shuffle is
    the (a, b) count with map-side combine.  With ``weight_col`` each
    row's pairs count that many occurrences (the word-TYPE form —
    sums are identical to the per-occurrence table by construction)."""
    pairs = _pair_structs(F.col(sym_col))
    w = (F.col(weight_col) if weight_col else F.lit(1)).cast("long").alias("wt")
    return (
        words.select(F.explode(pairs).alias("p"), w)
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("wt").cast("long").alias("cnt"))
    )


def top_pair(
    words: DataFrame, sym_col: str = "syms", weight_col: str | None = None
):
    """The argmax pair (count desc, a asc, b asc) as a Python tuple
    ``(a, b, cnt)`` — a bounded 1-row collect (the driver must know the
    rule to parameterize the next fold; this is the loop-control
    collect of every iterative operator here).  None if no pairs."""
    rows = (
        pair_counts(words, sym_col, weight_col)
        .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
        .limit(1)
        .collect()
    )
    return (rows[0].a, rows[0].b, rows[0].cnt) if rows else None


def _merge_fold_col(a: str, b: str, sym_col: str = "syms"):
    """The greedy left-to-right merge REWRITE as a bare Column: scan
    symbols with a (out, pend) fold — ``pend`` holds a just-seen ``a``
    awaiting its ``b``; on ``b`` they fuse, on another ``a`` the old
    pend flushes and the new one waits, else both flush.  The
    merge-wins branch order makes the a==b run case come out
    [aa, aa, ...] exactly like the reference implementation.  Pure
    array fold: no shuffle, no explode, stays in codegen.  Exposed so
    :func:`apply_merge` and the fused trainer step share one
    construction."""
    la, lb, lab = F.lit(a), F.lit(b), F.lit(a + b)
    nul = F.lit(None).cast("string")

    def step(acc, x):
        out, pend = acc["out"], acc["pend"]
        return F.when(
            pend.isNull(),
            F.when(x == la, F.struct(out.alias("out"), x.alias("pend"))).otherwise(
                F.struct(F.concat(out, F.array(x)).alias("out"), nul.alias("pend"))
            ),
        ).otherwise(
            F.when(
                x == lb,
                F.struct(
                    F.concat(out, F.array(lab)).alias("out"), nul.alias("pend")
                ),
            )
            .when(x == la, F.struct(F.concat(out, F.array(pend)).alias("out"), x.alias("pend")))
            .otherwise(
                F.struct(
                    F.concat(out, F.array(pend), F.array(x)).alias("out"),
                    nul.alias("pend"),
                )
            )
        )

    def finish(acc):
        return F.when(acc["pend"].isNull(), acc["out"]).otherwise(
            F.concat(acc["out"], F.array(acc["pend"]))
        )

    return F.aggregate(F.col(sym_col), F.expr(_ACC_ZERO), step, finish)


def apply_merge(
    words: DataFrame, a: str, b: str, sym_col: str = "syms"
) -> DataFrame:
    """Rewrite every symbol array with one merge rule
    (:func:`_merge_fold_col` — greedy left-to-right, the reference
    semantics).  UNCONDITIONAL on purpose: chained invocations
    (``bpe_encode``'s rule chain) nest each rule's expression inside
    the next, and a per-row CASE WHEN guard here would reference the
    previous rule's tree THREE times (guard + fold input + passthrough)
    — 3^rules expression growth, measured 2.4x SLOWER at 3 rules on
    x127/x134 (r15; the same grow-the-tree trap as the r14 unroll
    negative result).  The guarded form lives in
    :func:`apply_merge_pruned` for MATERIALIZED inputs."""
    return words.withColumn(sym_col, _merge_fold_col(a, b, sym_col))


def has_adjacent_pair(a: str, b: str, sym_col: str = "syms"):
    """Predicate column: the symbol array contains (a, b) adjacently.
    A light `exists` over zipped slices — no array accumulation, so it
    costs a narrow scan, not the fold — used to rewrite ONLY affected
    rows (on real vocabularies a merge touches a small fraction of
    word types; the fold's per-element array copy is the expensive
    part of a step, measured 24 s -> ~2 s at the x100 scale rig)."""
    c = F.col(sym_col)
    return (F.size(c) >= 2) & F.exists(
        F.zip_with(
            F.slice(c, 1, F.size(c) - 1),
            F.slice(c, 2, F.size(c) - 1),
            lambda l, r: (l == F.lit(a)) & (r == F.lit(b)),
        ),
        lambda hit: hit,
    )


def apply_merge_pruned(
    words: DataFrame, a: str, b: str, sym_col: str = "syms"
) -> DataFrame:
    """:func:`apply_merge` restricted to affected rows: unaffected
    word types pass through untouched (their arrays are provably
    fixed points of the fold — it only copies symbols through when no
    (a, b) adjacency fires), affected ones take the greedy fold.
    r15: row-local CASE WHEN instead of the old filter/union plan
    split — identical output, one scan, no union node.  Only for
    MATERIALIZED inputs (a checkpointed table, as in ``bpe_learn``'s
    per-step loop): applied to a DERIVED column the guard would
    reference the input expression three times and chained rules grow
    3^n — use plain :func:`apply_merge` there (see its docstring)."""
    merged = F.when(
        has_adjacent_pair(a, b, sym_col), _merge_fold_col(a, b, sym_col)
    ).otherwise(F.col(sym_col))
    return words.withColumn(sym_col, merged)


def bpe_learn(
    docs: DataFrame,
    n_merges: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Learn the first ``n_merges`` merge rules.  Returns the ordered
    merge table (step int, a, b, cnt) — step 1-based, ``cnt`` the
    pair's corpus count AT THE TIME it was learned (later steps see
    earlier merges applied, which is what makes this a trainer and not
    n independent argmaxes).  Stops early if the corpus runs out of
    adjacent pairs.

    Runs on the word-TYPE table (:func:`word_types`): the corpus pays
    one word-count aggregation, then every learning step is linear in
    vocabulary characters with ``freq``-weighted pair counts — sums
    identical to the per-occurrence form (measured on the scale rig:
    the occurrence form went 16x between x10 and x100 on its 3
    corpus-wide char explodes; the type form's growing term is the
    one word count)."""
    words = word_types(docs, id_col, text_col).localCheckpoint(eager=False)
    merges: list[tuple[int, str, str, int]] = []
    for k in range(1, n_merges + 1):
        best = top_pair(words, weight_col="freq")
        if best is None:
            break
        a, b, cnt = best
        merges.append((k, a, b, cnt))
        if k < n_merges:
            words = apply_merge_pruned(words, a, b).localCheckpoint(eager=False)
    return docs.sparkSession.createDataFrame(
        merges, "step int, a string, b string, cnt long"
    )


def bpe_encode(
    words: DataFrame, merges: list[tuple[str, str]], sym_col: str = "syms"
) -> DataFrame:
    """Tokenize with a LEARNED merge table: apply each rule in priority
    order (the reference encoder's semantics — rule k only ever sees
    the corpus as rules 1..k-1 left it).  Each rule is one array-local
    fold, so encoding with an n-rule table is n chained folds in ONE
    narrow stage — no shuffle at all; this is the form that applies a
    sample-learned vocabulary to the full 100 TB corpus.  For tables
    beyond a few hundred rules, checkpoint every ~32 folds to bound
    plan depth (the expression tree grows linearly with rules)."""
    out = words
    for a, b in merges:
        out = apply_merge(out, a, b, sym_col)
    return out


def vocab_histogram(words: DataFrame, sym_col: str = "syms") -> DataFrame:
    """(symbol, cnt) corpus symbol-occurrence counts — the vocabulary
    audit after encoding (coverage, top tokens, singleton tail).  One
    explode + map-side-combining count."""
    return (
        words.select(F.explode(F.col(sym_col)).alias("symbol"))
        .groupBy("symbol")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def _argmax_pair(counts: DataFrame):
    rows = (
        counts.orderBy(F.desc("cnt"), F.asc("a"), F.asc("b")).limit(1).collect()
    )
    return (rows[0].a, rows[0].b, rows[0].cnt) if rows else None


def bpe_learn_incremental(
    docs: DataFrame,
    n_merges: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """:func:`bpe_learn` with DELTA-maintained pair counts — the
    distributed analogue of the reference trainer's in-memory delta
    heap: the full pair count is paid ONCE; each subsequent step
    recounts only the AFFECTED word types (before and after the
    merge) and folds the signed difference into the standing counts
    table.  Per step: one narrow checkpointed pass over the word table
    (hit flag + conditional fold side by side), ONE tiny explode of
    signed pair deltas over the affected slice, and a counts-table
    merge keyed (a, b)
    — the distinct-pair table, bounded by (symbol alphabet)^2-ish,
    orders of magnitude under vocabulary chars.  Bit-identical merge
    tables to :func:`bpe_learn` (pinned by test); the form that makes
    thousand-rule vocabularies tractable, where per-step full
    recounts pay vocabulary chars x n_merges."""
    words = word_types(docs, id_col, text_col).localCheckpoint(eager=False)
    counts = pair_counts(words, weight_col="freq").localCheckpoint(eager=False)
    merges: list[tuple[int, str, str, int]] = []
    for k in range(1, n_merges + 1):
        best = _argmax_pair(counts)
        if best is None:
            break
        a, b, cnt = best
        merges.append((k, a, b, cnt))
        if k < n_merges:
            # r15 fused step: ONE checkpointed pass carries the hit
            # flag and the rewritten array side by side (CASE WHEN fold
            # on affected rows only — apply_merge's row-local pruning),
            # replacing the affected/rewritten/words-union checkpoint
            # trio: one words-table block store per step instead of
            # three, no filter/union plan split.  The count delta is a
            # SINGLE scan of the affected slice emitting signed
            # (pair, ±freq) entries — old pairs at -freq, new pairs at
            # +freq, exactly the neg/pos union it replaces (the summed
            # totals commute), folded into the standing counts table.
            step_df = (
                words.withColumn("_hit", has_adjacent_pair(a, b))
                .withColumn(
                    "_new",
                    F.when(F.col("_hit"), _merge_fold_col(a, b)).otherwise(
                        F.col("syms")
                    ),
                )
                .localCheckpoint(eager=False)
            )
            signed = F.concat(
                F.transform(
                    _pair_structs(F.col("syms")),
                    lambda p: F.struct(
                        p["a"].alias("a"),
                        p["b"].alias("b"),
                        (-F.col("freq")).cast("long").alias("wt"),
                    ),
                ),
                F.transform(
                    _pair_structs(F.col("_new")),
                    lambda p: F.struct(
                        p["a"].alias("a"),
                        p["b"].alias("b"),
                        F.col("freq").cast("long").alias("wt"),
                    ),
                ),
            )
            deltas = (
                step_df.filter(F.col("_hit"))
                .select(F.explode(signed).alias("e"))
                .groupBy(F.col("e.a").alias("a"), F.col("e.b").alias("b"))
                .agg(F.sum("e.wt").cast("long").alias("cnt"))
            )
            counts = (
                counts.unionByName(deltas)
                .groupBy("a", "b")
                .agg(F.sum("cnt").cast("long").alias("cnt"))
                .filter(F.col("cnt") > 0)
                .localCheckpoint(eager=False)
            )
            words = step_df.select("w", "freq", F.col("_new").alias("syms"))
    return docs.sparkSession.createDataFrame(
        merges, "step int, a string, b string, cnt long"
    )
