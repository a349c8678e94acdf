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
