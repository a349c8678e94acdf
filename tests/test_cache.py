"""Tracked-persist hygiene: a full query sweep must not accumulate
executor storage (VERDICT r2: un-unpersisted persists leak across a
long multi-query driver)."""

from __future__ import annotations

from data_governance_spark.cache import release_caches, tracked_persist
from data_governance_spark.queries.registry import QUERIES

SF = "/root/testdata/sf0.001"


def _cache_empty(spark) -> bool:
    return spark._jsparkSession.sharedState().cacheManager().isEmpty()


def test_release_caches_unpersists(spark):
    df = tracked_persist(spark.range(10))
    df.count()
    assert not _cache_empty(spark)
    assert release_caches() >= 1
    assert _cache_empty(spark)


def test_query_sweep_leaves_no_storage(spark):
    """Run the cache-heaviest queries back-to-back the way the driver
    does (build -> action -> next) and assert zero residual storage."""
    release_caches()
    spark.catalog.clearCache()
    for name in ("e03_sketch_dedup_recall", "e05_ann_recall", "d06_shingle_jaccard_pairs"):
        QUERIES[name].fn(spark, SF).write.format("noop").mode("overwrite").save()
    release_caches()
    assert _cache_empty(spark), "tracked persists survived the sweep"


def test_scoped_release_leaves_other_caches_alone(spark):
    """release_tracked (the CorpusResult.release path) must unpersist
    exactly its own slice of the registry — a concurrent result's
    caches stay live (r6 review finding)."""
    from data_governance_spark.cache import (
        release_tracked,
        tracked_mark,
        tracked_since,
    )

    release_caches()
    other = tracked_persist(spark.range(5))
    other.count()
    mark = tracked_mark()
    mine = tracked_persist(spark.range(7))
    mine.count()
    slice_ = tracked_since(mark)
    assert len(slice_) == 1 and slice_[0] is mine
    assert release_tracked(slice_) == 1
    # 'other' is still tracked AND still cached
    assert other.storageLevel.useMemory
    assert not mine.storageLevel.useMemory
    assert release_caches() == 1  # only 'other' remained
