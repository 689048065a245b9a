"""Session-scoped cache registry — bounded cache growth for lazy operators.

Several operators persist an intermediate that their (lazy) result plan
consumes more than once (shingle tables in functions/dedup.py, the oriented
edge table in plans/triangles.py). The persist is correct — without it the
shared subtree recomputes per consumer — but the consuming action happens at
the CALLER, after the operator returned, so the operator itself can never
unpersist. Left alone, a long-lived session running many queries (the
driver's 25-query harness, a notebook) accumulates cached blocks without
bound.

Contract:

* operators register such persists via ``scoped_persist`` instead of bare
  ``.persist()``;
* callers (bench harness, long-lived services, tests) call
  ``release_caches(spark)`` between queries — after the consuming action —
  to drop every operator-internal cache of that session in one call;
* not calling it is safe: blocks are LRU-evictable storage-memory, and the
  registry holds one small DataFrame handle per persist, keyed by
  application id.

Iterative plans (connectivity/pagerank/bfs) manage their own persist/
unpersist lifecycles inline and do not use this registry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_REGISTRY: dict[tuple[str, int], list[DataFrame]] = {}


def _key(spark: SparkSession) -> tuple[str, int]:
    # applicationId alone is NOT session-unique: sibling sessions from
    # spark.newSession() share one SparkContext, and a shared bucket would
    # let release_caches(sessionA) unpersist sessionB's still-needed caches
    # (silent recompute). The Python object id disambiguates siblings; the
    # applicationId component keeps keys valid across context restarts.
    return (spark.sparkContext.applicationId, id(spark))


def scoped_persist(df: DataFrame) -> DataFrame:
    """persist() + register for later ``release_caches`` cleanup."""
    out = df.persist()
    _REGISTRY.setdefault(_key(df.sparkSession), []).append(out)
    return out


def release_caches(spark: SparkSession) -> int:
    """Unpersist every registered operator-internal cache of this session
    (the exact SparkSession object — sibling sessions sharing the context
    keep their own caches). Returns the number of caches released.
    Blocking=False: eviction happens asynchronously, callers never wait on
    it."""
    dfs = _REGISTRY.pop(_key(spark), [])
    n = 0
    for df in dfs:
        try:
            df.unpersist(blocking=False)
            n += 1
        except Exception:
            pass  # session already stopped — nothing to release
    return n
