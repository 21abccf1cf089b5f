"""Prepared-statement memo for PURE-PLAN query functions.

A declared query's DataFrame is an immutable logical plan; building it
costs real driver time — py4j Column construction plus Spark's EAGER
Catalyst analysis at every ``select``/``withColumns`` (a 36-lag ACF
detector's tree analyzes in ~1.5 s — measured r07).  A production
engine parses and plans a query shape ONCE (prepared statements); this
memo gives the declared queries the same contract: per (py4j gateway,
sf_dir, function), the constructed DataFrame is reused.

STRICT eligibility — a function may be decorated ONLY if its body:
- runs NO driver-side actions (no collect/count/toPandas — iterative
  models, GP loops and k-means builds are ineligible: their call does
  real work whose repetition the bench must measure).  ONE carve-out
  (r14): a stored-index query whose only action is the idempotent
  once-per-session register-or-rebuild gate
  (pipeline_queries._ensure_stored_index) IS eligible — the gate fires
  on the first construction only, the catalog registration it creates
  survives ``clearCache()`` (tables are not cached plans), and every
  later construction is pure plan work; a memo hit therefore returns
  exactly what a fresh construction would build.  Per-request driver
  work (e.g. the probed-cell collect in bitext_mine_stored /
  ivf_stored_topk) remains INELIGIBLE: that collect is real serving
  cost paid per query batch, and the bench must keep measuring it;
- creates NO materialization boundary (localCheckpoint/checkpoint) —
  a lazily-checkpointed frame would silently carry MATERIALIZED data
  across an external ``clearCache()`` and turn a repeat measurement
  into a cache read.  Plain ``persist()`` boundaries ARE allowed when
  the operator registers them via ``kats_spark.boundary.register``:
  the memo re-registers them (``persist()`` — registration only, the
  dropped blocks recompute fresh) on every hit, so an external
  ``clearCache()`` neither silently removes the boundary nor leaks
  materialized data into the next measurement.  (Queries with their
  own cached stage sets use a re-registering memo instead — see
  pipeline_queries._corpus_stages.)
- is deterministic in (spark, sf_dir).

``recache`` lists shared cached-frame providers (hourly_series /
daily_series) the query's plan subtree references: calling the provider
re-registers its ``.cache()`` with the cache manager (keyed on the
analyzed plan, so the memoized plan's matching subtree hits it), which
keeps intra-plan and cross-query reuse identical to a fresh build after
an external ``clearCache()``.
"""

from __future__ import annotations

import functools

_MEMO: dict = {}


def _gateway_key(spark) -> tuple:
    """Stable context identity: (applicationId, startTime) is unique per
    live SparkContext, unlike ``id(gateway)`` which CPython can recycle
    after GC — a recycled address could replay DataFrames bound to a
    stopped context (same fix as operators/similarity._ctx_key)."""
    sc = spark.sparkContext
    return (sc.applicationId, sc.startTime)


def prepared(*, recache=()):
    """Decorator: memoize a pure-plan (spark, sf_dir) -> DataFrame query.

    ``recache``: callables (spark, sf_dir) -> DataFrame whose internal
    ``.cache()`` must be re-registered on every hit (see module doc).
    """

    def deco(fn):
        @functools.wraps(fn)
        def wrapper(spark, sf_dir):
            from kats_spark import boundary

            key = (_gateway_key(spark), sf_dir, fn.__module__, fn.__qualname__)
            hit = _MEMO.get(key)
            if hit is not None:
                out, bounds = hit
                for provider in recache:
                    provider(spark, sf_dir)
                for b in bounds:  # re-register dropped persist boundaries
                    b.persist()
                return out
            bounds: list = []
            with boundary.capture(bounds):
                out = fn(spark, sf_dir)
            if len(_MEMO) > 1024:  # dead-gateway hygiene; plans are tiny
                _MEMO.clear()
            _MEMO[key] = (out, bounds)
            return out

        wrapper.__wrapped_query__ = fn  # tests compare fresh vs memoized
        return wrapper

    return deco


def clear() -> None:
    _MEMO.clear()
