"""Process-lifetime staged temp dirs for the fixture-staging gates.

One shared implementation instead of per-module hand-rolled caches:
``staged_tmpdir`` returns the IDENTICAL value on the hit and the miss
path, which structurally retires the cache-hit-returns-wrong-path bug
class (r5: the streaming staging cache returned the parent dir on hits
-> the file-stream source listed an empty directory -> zero rows and a
silent oracle mismatch).

Everything staged here is removed by one atexit hook; repeated
gate/bench/sweep invocations in one process reuse the same dirs
(ADVICE r4: unbounded /tmp growth)."""

from __future__ import annotations

import atexit
import shutil
import tempfile
import threading
from collections.abc import Callable, Hashable

_DIRS: dict[Hashable, str] = {}
# r14: gates overlap their independent sub-gate builds from a thread
# pool, so two threads may stage DIFFERENT keys concurrently (fine) or
# race the SAME key (must still build exactly once) — one lock per key,
# held across the build, keeps the exactly-once contract without
# serializing unrelated builds.
_LOCKS_GUARD = threading.Lock()
_LOCKS: dict[Hashable, threading.Lock] = {}


def _cleanup() -> None:
    for d in _DIRS.values():
        shutil.rmtree(d, ignore_errors=True)
    _DIRS.clear()


def staged_tmpdir(
    key: Hashable, build_fn: Callable[[str], None], prefix: str = "dg_stage_"
) -> str:
    """Return a temp dir for ``key``, creating it and running
    ``build_fn(dir)`` exactly once per process; the dir is removed
    atexit. A failed build removes the partial dir and does NOT cache,
    so the next call retries instead of serving broken staging."""
    if key in _DIRS:
        return _DIRS[key]
    with _LOCKS_GUARD:
        lock = _LOCKS.setdefault(key, threading.Lock())
    with lock:
        if key in _DIRS:  # built while we waited on the lock
            return _DIRS[key]
        d = tempfile.mkdtemp(prefix=prefix)
        try:
            build_fn(d)
        except BaseException:
            shutil.rmtree(d, ignore_errors=True)
            raise
        with _LOCKS_GUARD:
            if not _DIRS:
                atexit.register(_cleanup)
            _DIRS[key] = d
        return d
