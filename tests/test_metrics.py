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
