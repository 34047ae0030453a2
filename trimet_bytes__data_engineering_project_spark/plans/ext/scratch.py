"""Build-once scratch-store infrastructure: content-fingerprinted
ensure_index caching under .scratch/.

Split from ``plans/extensions.py`` at the round-14 close (r13 verdict
item 8) — code moved VERBATIM; the aggregator re-exports every name, so
``plans.extensions.<name>`` remains the stable public path."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from ..tables import _session_cache

_SCRATCH = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.dirname(__file__)))), ".scratch")

# bump when index-building logic changes: the scratch dir outlives a code
# round (gitignored, build-once), and a stale layout must never serve a
# probe built by newer code
_INDEX_VERSION = "v5"  # v5: indexes store the build-time l2 norm column

_DATA_TAG_CACHE: dict[str, str] = {}


def _data_tag(sf_dir: str) -> str:
    """Short fingerprint of the source parquet files under ``sf_dir``
    ((name, size, mtime_ns) of every *.parquet, hashed).  Every
    scratch-store path embeds it, so a driver testdata refresh — same
    directory, new files — lands the build-once guard on a NEW path and
    forces a rebuild instead of silently probing an index of the old
    data.  Cached per-process: stores built mid-run stay addressable
    even though their own mtimes change."""
    tag = _DATA_TAG_CACHE.get(sf_dir)
    if tag is None:
        import hashlib

        parts = []
        for fn in sorted(os.listdir(sf_dir)):
            if fn.endswith(".parquet"):
                st = os.stat(os.path.join(sf_dir, fn))
                parts.append(f"{fn}:{st.st_size}:{st.st_mtime_ns}")
        tag = hashlib.md5("|".join(parts).encode()).hexdigest()[:10]
        _DATA_TAG_CACHE[sf_dir] = tag
    return tag


def _sf_tag(sf_dir: str) -> str:
    return os.path.basename(sf_dir.rstrip("/")) + "-" + _data_tag(sf_dir)


def _tagged_dir(*parts: str, sf_dir: str) -> str:
    """Scratch path ``<parts...>/<sf>-<data_tag>``, pruning sibling
    dirs for the SAME sf at a DIFFERENT data tag (stores of a previous
    testdata generation — unreachable now that paths embed the tag,
    so they'd only leak disk).  Best-effort: a concurrent process
    mid-build of the same stale dir loses nothing it can't rebuild."""
    import shutil

    parent = os.path.join(*parts)
    tag = _sf_tag(sf_dir)
    prefix = os.path.basename(sf_dir.rstrip("/")) + "-"
    if os.path.isdir(parent):
        for d in os.listdir(parent):
            if d.startswith(prefix) and d != tag:
                shutil.rmtree(os.path.join(parent, d), ignore_errors=True)
    return os.path.join(parent, tag)


def _index_dir(sf_dir: str, kind: str) -> str:
    return os.path.join(
        _tagged_dir(_SCRATCH, "ann_index", _INDEX_VERSION, sf_dir=sf_dir), kind
    )


def _fp_cached(spark: SparkSession, sf_dir: str, tag: str, make) -> str:
    """Session-memoized index fingerprint: the driver tables under an
    ``sf_dir`` are immutable inputs within a session (the ``load_table``
    memoization contract), so each stamp recipe is computed ONCE per
    (session, sf_dir) instead of once per query invocation — ~0.2-0.4 s
    of driver-job latency × 23 ensure_index callers per corpus run.
    ``tag`` names the RECIPE (which frame + which columns); two sites
    may share a tag only if their frame derivation is identical.  The
    staleness guard is unchanged across sessions: a fresh session (the
    nightly run) recomputes every stamp."""
    cache = _session_cache(spark)
    key = ("_fingerprint", sf_dir, tag)
    if key not in cache:
        cache[key] = make()
    return cache[key]


