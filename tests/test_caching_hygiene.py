"""Unpersist hygiene (VERDICT r3 ask #5): every graded query that pins
intermediates (persist or localCheckpoint) must leave the block manager
EMPTY after its action once the caller drains the caching ledger — the
long-session contract tools/check.py and bench.py rely on."""

from __future__ import annotations

import pytest

from etl_io_spark import caching, registry

from tests.conftest import SF_SMOKE

#: graded keys whose plans pin blocks: the iterative graph suite
#: (persist + localCheckpoint), the shingle-sharing dedup plans, the
#: LSH-bucketed ANN, and the funnel/bitmap rollups.
PINNING_KEYS = [
    "pagerank_trade_graph",
    "lpa_communities_trade",
    "bfs_trade_reach",
    "kcore_trade_graph",
    "assortativity_trade",
    "triangle_count_cosuppliers",
    "dedup_ngram_jaccard",
    "dedup_lsh_exact",
    "fuzzy_dedup_keep_best",
    "similarity_ann_lsh",
    "funnel_view_click_purchase",
    "pmi_collocations",
]


def _storage_entries(spark) -> list[str]:
    """Names of RDDs currently holding blocks in the block manager —
    covers DataFrame persist() AND localCheckpoint RDD storage (which
    spark.catalog.clearCache() does not see)."""
    infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
    return [
        f"id={i.id()} name={i.name()}" for i in infos if i.isCached()
    ]


@pytest.mark.parametrize("key", PINNING_KEYS)
def test_query_leaves_block_manager_empty(spark, key):
    qs = registry.queries()
    if key not in qs:
        pytest.skip(f"{key} not registered")
    caching.drain_persisted()  # isolate from earlier tests in the session
    spark.catalog.clearCache()
    qs[key](spark, SF_SMOKE).count()
    caching.drain_persisted()
    spark.catalog.clearCache()  # catalog/table caches the query may use
    leftovers = _storage_entries(spark)
    assert leftovers == [], f"{key} left pinned blocks: {leftovers}"


def test_drain_is_idempotent_and_counts(spark):
    from pyspark.sql import Row

    caching.drain_persisted()
    df = caching.persist_tracked(spark.createDataFrame([Row(x=1)]))
    df.count()
    assert caching.drain_persisted() >= 1
    assert caching.drain_persisted() == 0


def test_checkpoint_tracked_releases_rdd_storage(spark):
    from pyspark.sql import Row

    caching.drain_persisted()
    spark.catalog.clearCache()
    before = len(_storage_entries(spark))
    df = caching.checkpoint_tracked(
        spark.createDataFrame([Row(x=i) for i in range(10)]), eager=True
    )
    assert df.count() == 10
    assert len(_storage_entries(spark)) > before
    caching.drain_persisted()
    assert len(_storage_entries(spark)) == before
