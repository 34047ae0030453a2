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
