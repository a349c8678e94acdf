"""The session factory's process hygiene (r15): BLAS thread pinning.

Spark owns the host's parallelism (one worker process per core), so
per-process BLAS thread pools only oversubscribe — and OpenBLAS's
threaded path is catastrophically slow on the small per-batch matmuls
the ANN/PQ operators run (measured r15: 11.8 s vs 0.045 s for the
pq_knn LUT build across 32 concurrent single-threaded processes).
These tests pin the contract, not the timing: importing the session
module must leave the env so that every forked Python worker sees
single-threaded BLAS, and the worker-visible value must actually BE
single-threaded in a live session.
"""

from __future__ import annotations

import os

import data_governance_spark.session  # noqa: F401  (import applies the pin)


def test_blas_env_pinned_on_import():
    for var in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
        assert os.environ.get(var) == "1", var


def test_workers_inherit_single_threaded_blas(spark):
    import pandas as pd

    def probe(batches):
        import os as _os

        for _ in batches:
            yield pd.DataFrame(
                {"v": [_os.environ.get("OPENBLAS_NUM_THREADS", "UNSET")]}
            )

    vals = {
        r["v"]
        for r in spark.range(0, 4, 1, 4)
        .mapInPandas(probe, "v string")
        .collect()
    }
    assert vals == {"1"}
