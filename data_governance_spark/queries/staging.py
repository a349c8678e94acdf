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
from collections.abc import Callable, Hashable

_DIRS: dict[Hashable, str] = {}


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
    d = tempfile.mkdtemp(prefix=prefix)
    try:
        build_fn(d)
    except BaseException:
        shutil.rmtree(d, ignore_errors=True)
        raise
    if not _DIRS:
        atexit.register(_cleanup)
    _DIRS[key] = d
    return d
