"""SparkSession factory with the engine's scale-oriented defaults.

Local mode is a single JVM; on a real cluster the same config applies per
executor. AQE is always on: it gives runtime join-strategy switches
(broadcast when the BFS frontier is small), skew-join splitting for hub
vertices, and empty-partition coalescing — the Spark-native equivalents of
the reference's load-balance machinery
(/root/reference/src/coloring/labelProp.hpp:337-343 block re-decomposition,
:127 empty-rank communicator subsetting).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "parconnect_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for iterative graph dataflow.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (fallback ``local[*]``)
    so the bench harness can pin parallelism levels for the N-vs-4N scaling
    measurement (BASELINE.md pass rule).
    """
    # Under spark-submit the gateway JVM already exists (PYSPARK_GATEWAY_PORT
    # is how pyspark finds it) and carries the submitted --master/--conf.
    # Builder settings OVERRIDE submitted conf, so everything below is
    # applied as a DEFAULT there: an explicit caller/env choice still wins,
    # but ``spark-submit --master yarn --conf k=v launch.py`` must not be
    # silently rewritten into a local[...] session by this factory.
    submitted: dict = {}
    if "PYSPARK_GATEWAY_PORT" in os.environ:
        try:
            from pyspark import SparkConf
            from pyspark.context import SparkContext

            # connect to the already-running submit JVM so SparkConf can
            # read the submitted system properties (a bare SparkConf()
            # before the gateway handshake reads nothing)
            SparkContext._ensure_initialized()
            submitted = dict(SparkConf().getAll())
        except Exception:
            submitted = {}

    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        if cpus:
            master = f"local[{cpus}]"
        elif "spark.master" not in submitted:
            master = "local[*]"
    explicit_shuffle = (
        shuffle_partitions is not None or "SPARK_GRAFT_SHUFFLE" in os.environ
    )
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get("SPARK_GRAFT_SHUFFLE", DEFAULT_SHUFFLE_PARTITIONS)
        )

    builder = SparkSession.builder.appName(app_name)
    if master is not None:
        builder = builder.master(master)

    def _default(b, key, value):
        """Apply ``value`` unless spark-submit already carries ``key``."""
        return b if key in submitted else b.config(key, value)

    if explicit_shuffle or "spark.sql.shuffle.partitions" not in submitted:
        builder = builder.config(
            "spark.sql.shuffle.partitions", str(shuffle_partitions)
        ).config("spark.default.parallelism", str(shuffle_partitions))
    builder = _default(builder, "spark.sql.adaptive.enabled", "true")
    builder = _default(
        builder, "spark.sql.adaptive.coalescePartitions.enabled", "true"
    )
    builder = _default(builder, "spark.sql.adaptive.skewJoin.enabled", "true")
    # Let AQE rewrite sort-merge joins to shuffled-hash when EVERY build
    # partition fits this threshold (default 0 = never). Motivating case:
    # the relabel id-map joins — SMJ sorts the |E|-row string edge table
    # twice; SHJ builds |V|/parts-row hash maps instead. AQE's size check
    # keeps the spill-safe SMJ whenever a build partition would be large,
    # which a blanket SHUFFLE_HASH hint would not.
    builder = _default(
        builder,
        "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
        "128m",
    )
    builder = _default(builder, "spark.sql.session.timeZone", "UTC")
    builder = _default(builder, "spark.sql.execution.arrow.pyspark.enabled", "true")
    builder = _default(
        builder, "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
    )
    # Iterative algorithms checkpoint every few supersteps to truncate
    # lineage; local dir keeps that off the driver heap.
    builder = _default(builder, "spark.ui.enabled", "false")
    builder = _default(
        builder,
        "spark.driver.memory",
        os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try:
        # Silence WindowExec's "No Partition Defined" warning: every
        # unpartitioned window in this package is provably bounded (the
        # per-partition-count offsets exscan in operators/relabel.py, the
        # <= #distinct-degrees suffix sums in operators/graph.py rich_club,
        # the <= #buckets merges in operators/events.py), so the warning is
        # pure noise that drowned real regressions in the bench tail. A
        # genuinely unbounded global window would still show up as a
        # single-task straggler stage in any plan/stage audit.
        jvm = spark.sparkContext._jvm
        jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
            "org.apache.spark.sql.execution.window.WindowExec",
            jvm.org.apache.logging.log4j.Level.ERROR,
        )
    except Exception:
        pass  # non-log4j2 deployments keep their logging untouched
    return spark
