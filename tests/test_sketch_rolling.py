"""Rolling HLL distinct (functions/sketch.hll_rolling_distinct): the
merge ≡ union-rebuild property per window, bucket bookkeeping with gaps,
and linear-counting accuracy on small cardinalities."""

from datetime import datetime, timedelta

import pytest

from parconnect_spark.functions.sketch import (
    hll_estimate,
    hll_registers,
    hll_rolling_distinct,
)

T0 = datetime(2024, 1, 1)
DAY_US = 86_400_000_000
#: absolute epoch-day index of T0 (buckets are epoch-based, not data-based)
BASE = 19723


def _ev(spark, rows):
    # rows: (user_id, day)
    data = [
        (i, T0 + timedelta(days=d), u, "view", 0.0, "")
        for i, (u, d) in enumerate(rows)
    ]
    return spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )


def test_rolling_merge_equals_union_rebuild(spark):
    # the mergeability contract: every window's register state equals the
    # sketch built from scratch over the union of its buckets' keys
    rows = [(u, d) for d in range(10) for u in range((d * 7) % 13, (d * 7) % 13 + 5)]
    ev = _ev(spark, rows)
    out = {
        r["asof_bucket_us"] // DAY_US: r["raw_sum"]
        for r in hll_rolling_distinct(ev, window_buckets=3, p=6).collect()
    }
    import pyspark.sql.functions as F

    for wd, raw in out.items():
        keys = (
            ev.select(
                F.expr(f"unix_micros(cast(ts as timestamp)) div {DAY_US}").alias("b"),
                F.col("user_id").cast("string").alias("k"),
            )
            .where((F.col("b") >= wd - 2) & (F.col("b") <= wd))
            .select("k")
        )
        if keys.count() == 0:
            continue
        rebuilt = hll_estimate(hll_registers(keys, "k", p=6), p=6).collect()[0]
        assert rebuilt["raw_sum"] == raw, f"window {wd}"


def test_bucket_bookkeeping_with_gap(spark):
    # activity on days 0 and 5 only, window 3: day-0 windows {0,1,2},
    # day-5 windows {5,6,7}; n_buckets 1 everywhere (no window spans both)
    ev = _ev(spark, [(1, 0), (2, 0), (3, 5)])
    got = {
        r["asof_bucket_us"] // DAY_US - BASE: r["n_buckets"]
        for r in hll_rolling_distinct(ev, window_buckets=3, p=6).collect()
    }
    assert got == {0: 1, 1: 1, 2: 1, 5: 1, 6: 1, 7: 1}


def test_window_accumulates_distinct_users(spark):
    # users {0..4} on day 0, {5..9} on day 1: the day-1 window of size 2
    # covers 10 distinct users; estimates sit in the linear-counting
    # regime and land within 5% at p=10
    ev = _ev(spark, [(u, 0) for u in range(5)] + [(u, 1) for u in range(5, 10)])
    got = {
        r["asof_bucket_us"] // DAY_US - BASE: r["estimate"]
        for r in hll_rolling_distinct(ev, window_buckets=2, p=10).collect()
    }
    assert abs(got[0] - 5) / 5 < 0.05
    assert abs(got[1] - 10) / 10 < 0.05
    assert abs(got[2] - 5) / 5 < 0.05  # trailing window of day-1 activity only


def test_single_bucket_window_matches_global_estimate(spark):
    ev = _ev(spark, [(u, 0) for u in range(20)])
    roll = hll_rolling_distinct(ev, window_buckets=1, p=8).collect()
    assert len(roll) == 1
    import pyspark.sql.functions as F

    keys = ev.select(F.col("user_id").cast("string").alias("k"))
    ref = hll_estimate(hll_registers(keys, "k", p=8), p=8).collect()[0]
    assert roll[0]["raw_sum"] == ref["raw_sum"]
    assert roll[0]["estimate"] == ref["estimate"]


def test_rejects_bad_params(spark):
    ev = _ev(spark, [(1, 0)])
    with pytest.raises(ValueError):
        hll_rolling_distinct(ev, window_buckets=0)
    with pytest.raises(ValueError):
        hll_rolling_distinct(ev, bucket_us=0)
