"""Session-scoped cache hygiene for persisted intermediates.

Several registry queries persist() an intermediate relation that two
downstream branches share (LSH signature tables, per-vector norms,
curation signals, the quarantine reader's parsed relation). That is
correct for a one-query-per-process harness — the cache dies with the
session — but a long-lived session COMPOSING many registry calls
accumulates storage-memory it can never reclaim without the nuclear
``spark.catalog.clearCache()`` (round-4 VERDICT "what's wrong" #2/#3).

This module is the lease between the two usage patterns:

- producers mark caches with :func:`tracked_persist` instead of bare
  ``df.persist()`` — same laziness, same semantics, plus registration;
- a composing session calls :func:`release_tracked` between queries
  (or wraps work in :func:`tracked_caches`) to return storage memory
  to baseline without disturbing caches IT created by other means —
  unlike ``clearCache``, which drops every cache in the session
  including the caller's own.

Driver-side bookkeeping only: a list of (weakly-interesting) DataFrame
handles per SparkSession id. No executor traffic until release, and
``unpersist(blocking=False)`` makes release itself non-blocking.
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Iterator

from pyspark.sql import DataFrame

# session-keyed so two SparkSessions in one process don't cross-release
_TRACKED: dict[int, list[DataFrame]] = {}


def _session_key(df: DataFrame) -> int:
    return id(df.sparkSession)


def tracked_persist(df: DataFrame) -> DataFrame:
    """``df.persist()`` (lazy, unchanged semantics) + register the
    handle so :func:`release_tracked` can reclaim it later."""
    out = df.persist()
    _TRACKED.setdefault(_session_key(out), []).append(out)
    return out


def track(df: DataFrame) -> DataFrame:
    """Register an ALREADY-persisted frame (e.g. one the caller had to
    persist through a different code path) for release."""
    _TRACKED.setdefault(_session_key(df), []).append(df)
    return df


def release_tracked(spark=None, blocking: bool = False) -> int:
    """Unpersist every tracked cache (for ``spark`` only, or all
    sessions when None) and forget the handles. Returns how many were
    released. Safe to call at any time: unpersisting a frame a plan
    still references only costs recomputation, never correctness."""
    keys = [id(spark)] if spark is not None else list(_TRACKED)
    n = 0
    for k in keys:
        for df in _TRACKED.pop(k, []):
            try:
                df.unpersist(blocking=blocking)
            except Exception:
                pass  # session already stopped — nothing left to free
            n += 1
    return n


@contextmanager
def tracked_caches(spark=None, blocking: bool = False) -> Iterator[None]:
    """Scope guard for a composing session: caches tracked inside the
    block are released on exit (including the error path)."""
    try:
        yield
    finally:
        release_tracked(spark, blocking=blocking)


@contextmanager
def aqe_off(spark) -> Iterator[None]:
    """Disable adaptive query execution inside the block (restored on
    exit, error path included) — for MODEL-SIZED iterate loops (the LR
    trainer's gradient steps, PCA's power iteration): each step is a
    fixed small-state aggregate whose reduce side is bounded by the
    model, not the data, so AQE's runtime re-planning has nothing to
    improve at any scale while its per-stage materialization adds one
    extra job per step (r12; measured 7.8 s vs 12.0 s on the 20-step
    LR loop at sf0.1, identical results). Corpus-shaped plans should
    keep AQE on — it is what turns the tiny-iterate joins into
    broadcasts locally while falling back to shuffle joins at scale
    (graph_pagerank's rounds measured FASTER with AQE for exactly that
    reason; see OPTIMIZATION_r12.md)."""
    key = "spark.sql.adaptive.enabled"
    prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try:
        yield
    finally:
        spark.conf.set(key, prev)
