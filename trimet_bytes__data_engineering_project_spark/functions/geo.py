"""Geodesic helpers (engine extension).

The reference *describes* speed as "distance/time between consecutive
GPS data" (Presentation §Subscriber) but *implements* it as the
odometer delta (Part1/subscriber_project.py:68, SURVEY §2.8 note).
This module supplies the described-but-unimplemented geodesic form as
a pure-expression haversine — no UDF, stays inside whole-stage
codegen, so at 100 TB it is just another projected column.

Cross-engine note: libm ``sin``/``cos``/``asin`` may differ from the
JVM's by 1 ulp, which after the haversine chain shows up as ≲2e-12 m
absolute drift versus DuckDB.  Callers that hash-compare across
engines must round the result (4 decimals = 0.1 mm is far coarser
than the drift and far finer than GPS noise); verified bit-equal at
sf0.001/0.01/0.1 with that rounding.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_M = 6371000.0


def haversine_m(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in meters between two (lat, lon) points,
    haversine formula: 2R·asin(√(sin²(Δφ/2) + cosφ₁·cosφ₂·sin²(Δλ/2))).

    NULL-propagating: any NULL coordinate yields NULL (first row of a
    lag chain)."""
    phi1, phi2 = F.radians(lat1), F.radians(lat2)
    dphi = phi2 - phi1
    dlmb = F.radians(lon2) - F.radians(lon1)
    a = (
        F.sin(dphi / 2) * F.sin(dphi / 2)
        + F.cos(phi1) * F.cos(phi2) * F.sin(dlmb / 2) * F.sin(dlmb / 2)
    )
    return F.lit(2.0) * F.lit(EARTH_RADIUS_M) * F.asin(F.sqrt(a))


def zorder_key(
    x: Column,
    y: Column,
    x_range: tuple[float, float],
    y_range: tuple[float, float],
    bits: int = 16,
) -> Column:
    """Morton (Z-order) key for two numeric columns — the multi-
    dimensional layout clustering the bounding-box workload (P8/q22
    shape) wants at 100 TB: a fact table *sorted by this key* places
    rows that are close in BOTH dimensions into the same parquet row
    groups, so each row group's (lat, lon) min/max stats span a small
    tile and a bbox predicate skips most of the file — which a sort by
    either single column cannot achieve (it leaves the other dimension
    unclustered).

    Pure bit-arithmetic expressions: each coordinate is clamped to its
    range, scaled to ``bits`` integer bits, and the two are bit-
    interleaved (x even positions, y odd).  Stays in whole-stage
    codegen; NULL coordinates yield NULL (sort last, harmless).
    """

    def scaled(c: Column, lo: float, hi: float) -> Column:
        frac = (c.cast("double") - F.lit(lo)) / F.lit(hi - lo)
        frac = F.least(F.greatest(frac, F.lit(0.0)), F.lit(1.0))
        return F.floor(frac * F.lit(float((1 << bits) - 1))).cast("long")

    xi = scaled(x, *x_range)
    yi = scaled(y, *y_range)
    key = F.lit(0).cast("long")
    for b in range(bits):
        key = key.bitwiseOR(
            F.shiftleft(F.shiftright(xi, b).bitwiseAND(F.lit(1)), 2 * b)
        ).bitwiseOR(F.shiftleft(F.shiftright(yi, b).bitwiseAND(F.lit(1)), 2 * b + 1))
    return key
