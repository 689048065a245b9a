import tempfile

import pyspark.sql.functions as F

from parconnect_spark.sources.bucketed import (
    bucketed_join,
    is_shuffle_free,
    write_bucketed,
)


def _tables(spark, nb_left=8, nb_right=8, suffix=""):
    ev = spark.range(5000).select(
        (F.col("id") % 97).alias("user_id"), (F.col("id") % 5).alias("etype")
    )
    dim = ev.groupBy("user_id").agg(F.countDistinct("etype").alias("n_types"))
    write_bucketed(
        ev, f"tb_ev{suffix}", "user_id", nb_left, path=tempfile.mkdtemp()
    )
    write_bucketed(
        dim, f"tb_dim{suffix}", "user_id", nb_right, path=tempfile.mkdtemp()
    )
    return ev, dim


def test_bucketed_join_is_shuffle_free_and_exact(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        ev, dim = _tables(spark)
        j = bucketed_join(spark, "tb_ev", "tb_dim", "user_id")
        assert is_shuffle_free(j)
        # the same join on the unbucketed frames shuffles
        assert not is_shuffle_free(ev.join(dim, "user_id"))
        # layout changes the plan, never the answer
        assert sorted(map(tuple, j.collect())) == sorted(
            map(tuple, ev.join(dim, "user_id").collect())
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_mismatched_bucket_counts_still_exact(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        ev, dim = _tables(spark, nb_left=8, nb_right=4, suffix="_mm")
        j = bucketed_join(spark, "tb_ev_mm", "tb_dim_mm", "user_id")
        # co-location contract broken -> Spark falls back to a correct
        # (shuffling or one-side-repartitioned) plan; answer unchanged
        assert sorted(map(tuple, j.collect())) == sorted(
            map(tuple, ev.join(dim, "user_id").collect())
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
