"""Operator persist lifecycle: every operator that caches an internal
intermediate must release it through CacheScope — nothing may stay
pinned in the block manager after the caller is done.

Verification is via the JVM block manager itself
(``sc._jsc.getPersistentRDDs()``): counts return to the pre-call
baseline after release, so repeated operator calls in a long-lived
session cannot accumulate cached blocks.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dwh_with_dask_spark.operators.caching import CacheScope, release_caches
from dwh_with_dask_spark.operators.curation import contamination_pairs
from dwh_with_dask_spark.operators.dedup import minhash_lsh_pairs, ngram_jaccard_pairs
from dwh_with_dask_spark.operators.ids import sequential_id


def _n_persisted(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


@pytest.fixture
def docs(spark):
    rows = [(i, f"the quick brown fox jumps over lazy dog number {i} end") for i in range(40)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_ngram_jaccard_scope_releases(spark, docs):
    base = _n_persisted(spark)
    with CacheScope() as scope:
        pairs = ngram_jaccard_pairs(docs, threshold=0.0, scope=scope)
        pairs.count()
        assert _n_persisted(spark) > base  # the shingle index is pinned while in use
    assert _n_persisted(spark) == base


def test_minhash_lsh_scope_releases(spark, docs):
    base = _n_persisted(spark)
    with CacheScope() as scope:
        minhash_lsh_pairs(docs, threshold=0.1, scope=scope).count()
        assert _n_persisted(spark) > base
    assert _n_persisted(spark) == base


def test_contamination_scope_releases(spark, docs):
    base = _n_persisted(spark)
    with CacheScope() as scope:
        contamination_pairs(docs, scope=scope).count()
        assert _n_persisted(spark) > base
    assert _n_persisted(spark) == base


def test_sequential_id_scope_releases(spark, docs):
    base = _n_persisted(spark)
    with CacheScope() as scope:
        out = sequential_id(docs, order_by=["doc_id"], scope=scope)
        ids = [r["ID"] for r in out.orderBy("doc_id").collect()]
        assert ids == list(range(1, 41))  # contiguity unaffected by scoping
        assert _n_persisted(spark) > base
    assert _n_persisted(spark) == base


def test_private_scope_attached_and_releasable(spark, docs):
    # No caller scope: the operator attaches its private scope to the
    # result so release_caches() can free it after the final action.
    base = _n_persisted(spark)
    pairs = ngram_jaccard_pairs(docs, threshold=0.0)
    pairs.count()
    assert _n_persisted(spark) > base
    release_caches(pairs)
    assert _n_persisted(spark) == base


def test_released_result_still_correct(spark, docs):
    # Unpersist drops the cache, not the plan: a post-release action
    # recomputes and must return identical results.
    with CacheScope() as scope:
        pairs = ngram_jaccard_pairs(docs, threshold=0.0, scope=scope)
        before = pairs.count()
    assert pairs.count() == before
