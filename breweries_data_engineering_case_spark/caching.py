"""Scoped DataFrame cache tracking (VERDICT r8 #3).

``persist()`` without a matching ``unpersist()`` leaks cache entries across
the 448-query gate: memory residue, and — worse for plan tests — Spark's
cache manager substitutes a previous query's ``InMemoryRelation`` into any
later plan with an identical subtree, so plan inspection stops measuring the
query's intrinsic shape. Previously every gate runner carried a
``spark.catalog.clearCache()`` workaround.

This module makes the lifecycle a library contract instead: every persist in
the query surface goes through :func:`cached` (chain-safe via
``df.transform(cached)``), and the registry's ``register`` wrapper calls
:func:`release_all` when the *next* query is constructed. At most one query's
caches are alive at a time; a released frame is still correct (Spark just
recomputes it), so late consumers of an earlier DataFrame only trade speed,
never results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_ACTIVE: list[DataFrame] = []


def cached(df: DataFrame) -> DataFrame:
    """``persist()`` + track for :func:`release_all`.

    Chain-safe: ``(...).transform(cached)`` is a drop-in for
    ``(...).persist()``.
    """
    df = df.persist()
    _ACTIVE.append(df)
    return df


def release_all() -> None:
    """Unpersist every frame registered since the last release.

    Non-blocking and exception-safe (a stopped session just drops the
    handles); used by the registry wrapper between query constructions and
    available to tests/gates directly.
    """
    while _ACTIVE:
        df = _ACTIVE.pop()
        try:
            df.unpersist(blocking=False)
        except Exception:
            pass
