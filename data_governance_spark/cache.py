"""Tracked persist: operators that cache an intermediate register it
here so long-lived drivers (bench sweeps, the correctness gate, a
notebook session) can release executor storage between queries instead
of leaking it for the session lifetime (VERDICT r2 hygiene item).

Operators return LAZY DataFrames, so they cannot unpersist before the
caller's terminal action — the caller contract is: run your action,
then call :func:`release_caches`. ``bench.py`` and the query registry
do this automatically (each query entry releases the previous query's
caches on entry), bounding peak storage to one query's working set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []

# --------------------------------------------------------------------------
# Per-SparkContext memo for STATIC Column trees — pure functions of
# column NAMES and literal parameters, no caller DataFrame state.
# Building such trees is driver-side py4j chatter (~0.5 ms per round
# trip x hundreds of calls for a 64-wide hash/fold projection — guide
# §5: driver work is serial wall-clock), paid on EVERY operator call
# without this. Unresolved Columns are immutable and plan-independent,
# so reuse across DataFrames is safe — the same pattern as
# standardize/joins.py's `_memo` and transform.py's wide-select cache
# (r5/r14), centralized here for the operator family. Scoped to the
# live SparkContext object so stale JVM references cannot outlive it.
# Thread note: gates build plans from small thread pools; a lost race
# builds the same immutable tree twice — last write wins, both valid.
# WeakKeyDictionary on the context object (citation.py's design, same
# rationale): entries die with their context, no stale-tree hazard.
import weakref

_COLUMN_MEMO: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def column_memo(key: tuple, build):
    """Return ``build()`` memoized per (SparkContext, key).

    ``build`` must construct the value from column NAMES / literals
    only — never close over a caller's DataFrame or Column arguments
    (those belong in ``key`` as their *names*)."""
    from pyspark import SparkContext

    sc = SparkContext._active_spark_context
    if sc is None:
        return build()
    cache = _COLUMN_MEMO.get(sc)
    if cache is None:
        cache = {}
        _COLUMN_MEMO[sc] = cache
    if key not in cache:
        cache[key] = build()
    return cache[key]


def tracked_persist(df: DataFrame) -> DataFrame:
    """persist() + register for later release_caches()."""
    df = df.persist()
    _TRACKED.append(df)
    return df


def release_caches() -> int:
    """Unpersist every tracked DataFrame; returns how many were released."""
    n = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass  # session may be stopped; nothing to release
    return n


def tracked_mark() -> int:
    """Position marker for ``tracked_since`` — call before an operator
    chain to scope its internal persists (single-threaded driver
    assumption, same as the rest of this module)."""
    return len(_TRACKED)


def tracked_since(mark: int) -> list[DataFrame]:
    """The DataFrames tracked_persist'ed since ``mark``."""
    return list(_TRACKED[mark:])


def release_tracked(dfs: list[DataFrame]) -> int:
    """Unpersist exactly ``dfs`` and drop them from the registry —
    the scoped alternative to the global ``release_caches`` when other
    tracked caches must stay live. Identity-based removal: DataFrame
    ``==`` builds a Column, so list.remove/`in` must not be used."""
    n = 0
    for df in dfs:
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass
    _TRACKED[:] = [t for t in _TRACKED if not any(t is d for d in dfs)]
    return n
