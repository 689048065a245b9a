"""Cache-hygiene contract: operator-internal persists are registered and
released in one call — no unbounded cache growth across a many-query
session (the driver's 25-query harness shape)."""

import pyspark.sql.functions as F


def _persistent_ids(spark):
    return {
        int(k) for k in spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()
    }


def test_release_caches_bounds_growth(spark):
    from parconnect_spark.cache import release_caches
    from parconnect_spark.functions.dedup import (
        minhash_near_dup_pairs,
        ngram_jaccard_pairs,
        simhash_near_pairs,
    )

    release_caches(spark)  # start from a clean registry
    before = _persistent_ids(spark)

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta epsilon zeta eta theta doc {i % 7}")
         for i in range(40)],
        "doc_id long, text string",
    )
    ngram_jaccard_pairs(docs, threshold=0.5).count()
    minhash_near_dup_pairs(docs, threshold=0.5).count()
    simhash_near_pairs(docs, max_hamming=3).count()
    # delta-based assertions: Spark's ContextCleaner may drop OTHER tests'
    # GC'd caches concurrently, so only our own cache ids are compared.
    # 2 distinct entries, not 3: ngram's and minhash's shingle tables have
    # identical plans, so the CacheManager maps both persists to one cache.
    # (plans/triangles.py left the registry in round 5: its oriented table
    # is an eager localCheckpoint now — the analysis-cost fix — so the
    # dedup shingle tables are the registry's remaining clients.)
    ours = _persistent_ids(spark) - before
    assert len(ours) >= 2
    released = release_caches(spark)
    assert released >= 3  # ...but all three registrations are tracked
    assert not (_persistent_ids(spark) & ours)  # all of ours are gone


def test_release_caches_idempotent_and_session_scoped(spark):
    from parconnect_spark.cache import release_caches, scoped_persist

    df = scoped_persist(spark.range(10).select(F.col("id").alias("v")))
    df.count()
    assert release_caches(spark) == 1
    assert release_caches(spark) == 0  # registry drained
