"""Skew mitigation — salting for hot keys (brief: "skewed keys hurt …
salting for skew").

The reference never shuffles (single process), but its data is
naturally skewed: one busy route/vehicle produces orders of magnitude
more breadcrumbs than a quiet one, and at 100 TB a groupBy/join on
trip_id or vehicle_id puts an entire hot key in one reduce task.

Two mitigations compose here:

1. **AQE skew-join splitting** (on in the session factory) — runtime
   splitting of oversized *join* partitions.  Free, but only covers
   sort-merge joins.
2. **Deterministic salting** (this module) — structural splitting for
   *aggregations* and for joins AQE can't fix.  The salt is
   ``pmod(hash(fine_grained_col), n)``, never ``rand()``: identical
   input → identical plan → identical output, so salted results are
   oracle-comparable and retry-safe (a re-executed task re-derives the
   same salt, where rand() would corrupt the aggregate).

Every helper is pure DataFrame composition — no custom partitioner,
no RDD drop-down.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, fine_col: str | Column, n_salts: int = 16) -> DataFrame:
    """Attach a deterministic ``_salt`` ∈ [0, n_salts) derived from a
    fine-grained column (event id, timestamp) that spreads a hot key's
    rows across ``n_salts`` reduce slots."""
    return df.withColumn("_salt", F.pmod(F.hash(fine_col), F.lit(n_salts)))


def salted_agg(
    df: DataFrame,
    key: str,
    aggs: dict[str, tuple[Column, Column]],
    fine_col: str | Column,
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage skew-proof aggregation: partial agg on (key, salt) —
    the hot key fans out over ``n_salts`` tasks — then final re-agg on
    key alone, over at most ``n_salts`` rows per key.

    ``aggs`` maps output name → (partial_expr, final_expr), where the
    final expr re-aggregates the partial column of the same name, e.g.::

        {"n": (F.count("*"), F.sum("n")),
         "max_v": (F.max("value"), F.max("max_v"))}

    Only algebraic aggregates (count/sum/min/max, decimal sums) can be
    split this way — exactly the ones the corpus uses (SURVEY §2.4)."""
    partial = (
        with_salt(df, fine_col, n_salts)
        .groupBy(key, "_salt")
        .agg(*[p.alias(name) for name, (p, _) in aggs.items()])
    )
    return partial.groupBy(key).agg(
        *[fin.alias(name) for name, (_, fin) in aggs.items()]
    )


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    key: str,
    fine_col: str | Column,
    n_salts: int = 16,
) -> DataFrame:
    """Skew-proof equi-join: salt the skewed side deterministically and
    replicate the small side once per salt value (explode over a
    ``sequence`` literal), then join on (key, salt).

    Each hot-key partition shrinks ×n_salts; the small side grows
    ×n_salts — the classic trade, worthwhile when the small side fits
    comfortably replicated (the trip dimension always does).  Prefer
    ``F.broadcast(small)`` outright when the whole table fits; salting
    is for the mid-size dim too big to broadcast but joined against a
    skewed fact."""
    salted_left = with_salt(skewed, fine_col, n_salts)
    replicated = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return salted_left.join(replicated, [key, "_salt"]).drop("_salt")
