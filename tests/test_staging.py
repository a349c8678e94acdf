"""Unit tests for queries/staging.staged_tmpdir (the shared
fixture-staging cache behind q36/q41/q47/q48)."""

from __future__ import annotations

import os

import pytest

from data_governance_spark.queries import staging


@pytest.fixture(autouse=True)
def fresh_cache():
    saved = dict(staging._DIRS)
    staging._DIRS.clear()
    yield
    staging._cleanup()
    staging._DIRS.update(saved)


def test_build_runs_once_and_hit_equals_miss():
    calls = []

    def build(d):
        calls.append(d)
        open(os.path.join(d, "x"), "w").write("1")

    first = staging.staged_tmpdir("k1", build)
    second = staging.staged_tmpdir("k1", build)
    # the bug class this utility retires: hit and miss MUST return the
    # identical path
    assert first == second
    assert calls == [first]
    assert os.path.exists(os.path.join(first, "x"))


def test_distinct_keys_get_distinct_dirs():
    a = staging.staged_tmpdir(("k", 1), lambda d: None)
    b = staging.staged_tmpdir(("k", 2), lambda d: None)
    assert a != b


def test_failed_build_not_cached_and_dir_removed():
    attempts = []

    def flaky(d):
        attempts.append(d)
        if len(attempts) == 1:
            raise RuntimeError("boom")

    with pytest.raises(RuntimeError):
        staging.staged_tmpdir("k2", flaky)
    assert not os.path.exists(attempts[0])  # partial dir removed
    ok = staging.staged_tmpdir("k2", flaky)  # retried, not served broken
    assert len(attempts) == 2
    assert os.path.isdir(ok)


def test_cleanup_removes_all():
    d = staging.staged_tmpdir("k3", lambda p: None)
    staging._cleanup()
    assert not os.path.exists(d)
    assert staging._DIRS == {}
