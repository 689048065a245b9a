import pyspark.sql.functions as F

from parconnect_spark.streaming.metrics import SuperstepMetrics


def test_observe_metrics_piggyback(spark):
    m = SuperstepMetrics()
    df = spark.range(100).select((F.col("id") % 10).alias("k"))
    step1 = m.attach(df, superstep=1)
    agg = step1.groupBy("k").count()
    assert agg.count() == 10  # the caller's action — observe rides along
    rows = m.harvest()
    assert rows[-1]["superstep"] == 1
    assert rows[-1]["rows"] == 100
    # second superstep accumulates
    step2 = m.attach(df.where("k < 5"), superstep=2)
    step2.count()
    rows = m.harvest()
    assert [r["superstep"] for r in rows] == [1, 2]
    assert rows[-1]["rows"] == 50


def test_cc_superstep_shuffle_metrics(spark):
    """Every two_phase superstep records its shuffle read/write delta (the
    shuffle half of the per-superstep telemetry rule); a multi-superstep
    chain CC must move bytes through at least one shuffle."""
    from parconnect_spark.plans.connectivity import connected_components
    from parconnect_spark.sources.generators import chain_edges
    from parconnect_spark.streaming.metrics import shuffle_totals

    if shuffle_totals(spark) is None:
        import pytest

        pytest.skip("AppStatusStore accessor unavailable on this Spark")
    res = connected_components(chain_edges(spark, 200))
    assert res.metrics
    for m in res.metrics:
        assert m["shuffle_read_bytes"] >= 0 and m["shuffle_write_bytes"] >= 0
    assert sum(m["shuffle_write_bytes"] for m in res.metrics) > 0


def test_cc_superstep_spill_metrics(spark):
    """Every superstep also records its memory/disk spill delta — zero on a
    tiny graph, but present and non-negative (spill is how partition-sizing
    failures show up at scale; the telemetry must distinguish 'slower' from
    'started spilling')."""
    from parconnect_spark.plans.connectivity import connected_components
    from parconnect_spark.sources.generators import chain_edges
    from parconnect_spark.streaming.metrics import spill_totals

    if spill_totals(spark) is None:
        import pytest

        pytest.skip("AppStatusStore stage accessor unavailable on this Spark")
    res = connected_components(chain_edges(spark, 200))
    assert res.metrics
    for m in res.metrics:
        assert m["memory_spill_bytes"] >= 0 and m["disk_spill_bytes"] >= 0
