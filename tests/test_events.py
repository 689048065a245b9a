import datetime as dt

import pyspark.sql.functions as F

from parconnect_spark.operators.events import asof_join, session_rollup, sessionize

BASE = dt.datetime(2024, 1, 1)


def ev_df(spark):
    rows = [
        (0, BASE, 1, "a", 1.0),
        (1, BASE + dt.timedelta(seconds=100), 1, "a", 2.0),
        (2, BASE + dt.timedelta(seconds=2000), 1, "b", 3.0),  # gap 1900 >= 1800
        (3, BASE + dt.timedelta(seconds=3800), 1, "b", 4.0),  # gap exactly 1800
        (4, BASE, 2, "a", 5.0),
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )


def test_sessionize_gap_rule(spark):
    s = {r["event_id"]: r["session_idx"] for r in sessionize(ev_df(spark)).collect()}
    # 0,1 share session 0; 2 opens session 1 (1900s); 3 opens session 2
    # (exactly 1800s — the >= contract); user 2 starts at 0
    assert s == {0: 0, 1: 0, 2: 1, 3: 2, 4: 0}


def test_sessionize_order_invariance(spark):
    base = sessionize(ev_df(spark)).orderBy("event_id").collect()
    shuffled = (
        sessionize(ev_df(spark).orderBy(F.rand(7)).repartition(5))
        .orderBy("event_id")
        .collect()
    )
    assert [tuple(r) for r in base] == [tuple(r) for r in shuffled]


def test_session_rollup_values(spark):
    out = {
        (r["user_id"], r["session_idx"]): r
        for r in session_rollup(ev_df(spark)).collect()
    }
    r0 = out[(1, 0)]
    assert (r0["n_events"], r0["first_event"], r0["last_event"]) == (2, 0, 1)
    assert r0["duration_sec"] == 100
    assert r0["sum_value"] == 3.0
    assert out[(2, 0)]["n_events"] == 1 and out[(2, 0)]["duration_sec"] == 0


def test_asof_backward_inclusive_and_tolerance(spark):
    ev = ev_df(spark)
    left = ev.where(F.col("event_type") == "a")
    right = ev.where(F.col("event_type") == "b").select(
        "user_id", "ts", F.col("event_id").alias("rid")
    )
    extra = spark.createDataFrame(
        [(9, BASE + dt.timedelta(seconds=2500), 1, "a", 0.0)], ev.schema
    )
    j = asof_join(left.unionByName(extra), right, on="user_id", right_cols=["rid"])
    got = sorted((r["event_id"], r["rid_r"]) for r in j.collect())
    # earlier lefts have no prior right; event 9 (t=2500) matches rid 2 (t=2000)
    assert got == [(0, None), (1, None), (4, None), (9, 2)]
    # inclusive at ts equality
    at_eq = asof_join(
        extra.withColumn("ts", F.lit(BASE + dt.timedelta(seconds=2000))),
        right,
        on="user_id",
        right_cols=["rid"],
    ).collect()
    assert at_eq[0]["rid_r"] == 2
    # tolerance nulls out stale matches (lag 500s > 100s window)
    tol = asof_join(
        extra, right, on="user_id", right_cols=["rid"], tolerance_seconds=100
    ).collect()
    assert tol[0]["rid_r"] is None


def test_asof_empty_right_keeps_left(spark):
    ev = ev_df(spark)
    left = ev.where(F.col("event_type") == "a")
    right = ev.where(F.lit(False)).select(
        "user_id", "ts", F.col("event_id").alias("rid")
    )
    j = asof_join(left, right, on="user_id", right_cols=["rid"]).collect()
    assert len(j) == 3 and all(r["rid_r"] is None for r in j)


def test_asof_matches_pandas_merge_asof(spark):
    """Cross-check against pandas' reference implementation on a randomized
    (seeded) instance — an oracle independent of both DuckDB and Spark."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(42)
    n_l, n_r = 200, 80
    lpd = pd.DataFrame(
        {
            "k": rng.integers(0, 5, n_l),
            "t": rng.integers(0, 10_000, n_l),
            "lid": np.arange(n_l),
        }
    )
    rpd = pd.DataFrame(
        {
            "k": rng.integers(0, 5, n_r),
            "t": rng.integers(0, 10_000, n_r),
            "rid": np.arange(n_r),
        }
    ).drop_duplicates(["k", "t"])
    want = pd.merge_asof(
        lpd.sort_values("t", kind="stable"),
        rpd.sort_values("t", kind="stable"),
        on="t",
        by="k",
        direction="backward",
    ).sort_values("lid")
    l = spark.createDataFrame(lpd)
    r = spark.createDataFrame(rpd)
    got = (
        asof_join(l, r, on="k", left_ts="t", right_ts="t", right_cols=["rid"])
        .orderBy("lid")
        .toPandas()
    )
    want_rids = [None if pd.isna(x) else int(x) for x in want["rid"]]
    got_rids = [None if pd.isna(x) else int(x) for x in got["rid_r"]]
    assert got_rids == want_rids


def _brute_sessionize(rows, gap_s):
    """Reference gap rule in plain Python: rows = (event_id, us, user)."""
    out = {}
    by_user = {}
    for eid, us, user in sorted(rows, key=lambda r: (r[2], r[1], r[0])):
        by_user.setdefault(user, []).append((eid, us))
    for user, evs in by_user.items():
        idx, last = -1, None
        for eid, us in evs:
            if last is None or us - last >= gap_s * 1_000_000:
                idx += 1
            out[eid] = (user, idx)
            last = us
    return out


import pytest  # noqa: E402


@pytest.mark.slow
def test_sessionize_property_vs_brute(spark):
    import datetime as dt

    from hypothesis import given, settings, strategies as st

    base = dt.datetime(2024, 1, 1)
    rows_strategy = st.lists(
        st.tuples(
            st.integers(0, 3),             # user
            st.integers(0, 10_000),        # offset seconds
            st.sampled_from([0, 1]),       # sub-second micros knob
        ),
        min_size=1,
        max_size=30,
    )

    @settings(max_examples=8, derandomize=True, deadline=None)
    @given(rows_strategy, st.sampled_from([600, 1800]))
    def prop(raw, gap_s):
        rows = [
            (i, (off * 1_000_000 + micro), user)
            for i, (user, off, micro) in enumerate(raw)
        ]
        df = spark.createDataFrame(
            [
                (eid, base + dt.timedelta(microseconds=us), user, 0.0)
                for eid, us, user in rows
            ],
            "event_id long, ts timestamp, user_id long, value double",
        )
        got = {
            r["event_id"]: (r["user_id"], r["session_idx"])
            for r in sessionize(df, gap_seconds=gap_s).collect()
        }
        assert got == _brute_sessionize(rows, gap_s)

    prop()


@pytest.mark.slow
def test_asof_property_vs_pandas(spark):
    import numpy as np
    import pandas as pd
    from hypothesis import given, settings, strategies as st

    pairs = st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 1000)),
        min_size=1,
        max_size=25,
    )

    @settings(max_examples=8, derandomize=True, deadline=None)
    @given(pairs, pairs)
    def prop(lraw, rraw):
        lpd = pd.DataFrame(
            [(k, t, i) for i, (k, t) in enumerate(lraw)],
            columns=["k", "t", "lid"],
        )
        rpd = pd.DataFrame(
            [(k, t, i) for i, (k, t) in enumerate(rraw)],
            columns=["k", "t", "rid"],
        ).drop_duplicates(["k", "t"], keep="last")
        want = pd.merge_asof(
            lpd.sort_values("t", kind="stable"),
            rpd.sort_values("t", kind="stable"),
            on="t",
            by="k",
            direction="backward",
        ).sort_values("lid")
        got = (
            asof_join(
                spark.createDataFrame(lpd),
                spark.createDataFrame(rpd),
                on="k",
                left_ts="t",
                right_ts="t",
                right_cols=["rid"],
            )
            .orderBy("lid")
            .toPandas()
        )
        want_r = [None if pd.isna(x) else int(x) for x in want["rid"]]
        got_r = [None if pd.isna(x) else int(x) for x in got["rid_r"]]
        assert got_r == want_r

    prop()


def test_hopping_rollup_membership_and_counts(spark):
    from parconnect_spark.operators.events import hopping_rollup

    base = dt.datetime(2024, 1, 1)
    rows = [
        ("a", base + dt.timedelta(hours=h), 1.0)
        for h in (0, 6, 11, 12, 13, 23, 24, 25)
    ]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp, value double")
    out = hopping_rollup(
        df, size_us=86_400_000_000, slide_us=43_200_000_000
    ).collect()
    got = {(r["window_start_us"], r["event_type"]): r["n"] for r in out}
    # brute force: event at t belongs to windows [i*S, i*S + W) covering t
    S, W = 43_200_000_000, 86_400_000_000
    want = {}
    for _et, ts, _v in rows:
        t = int(ts.timestamp() * 1_000_000)
        i = t // S
        for j in range(W // S):
            want[((i - j) * S, "a")] = want.get(((i - j) * S, "a"), 0) + 1
    assert got == want
    # every event counted exactly W/S times across windows
    assert sum(got.values()) == len(rows) * (W // S)


def test_hopping_rollup_tumbling_degenerates(spark):
    from parconnect_spark.operators.events import hopping_rollup

    base = dt.datetime(2024, 3, 1)
    rows = [("x", base + dt.timedelta(hours=3 * i), float(i)) for i in range(10)]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp, value double")
    # size == slide: plain tumbling — totals match a direct GROUP BY
    out = hopping_rollup(df, size_us=21_600_000_000, slide_us=21_600_000_000)
    assert out.agg(F.sum("n")).first()[0] == len(rows)


def test_hopping_rollup_rejects_nonmultiple(spark):
    from parconnect_spark.operators.events import hopping_rollup

    df = spark.createDataFrame(
        [("x", dt.datetime(2024, 1, 1), 0.0)],
        "event_type string, ts timestamp, value double",
    )
    with pytest.raises(ValueError):
        hopping_rollup(df, size_us=100, slide_us=33)


def test_retention_cohorts_hand_case(spark):
    from parconnect_spark.operators.events import retention_cohorts

    B = 7 * 86_400_000_000
    base = dt.datetime(2024, 1, 4)  # mid-bucket somewhere
    rows = []
    # week w0: users 1,2,3 ; w1: users 2,3,4,5 ; w2: user 5 ; w4: user 5
    for u in (1, 2, 3):
        rows.append((u, base))
    for u in (2, 3, 4, 5):
        rows.append((u, base + dt.timedelta(days=7)))
    rows.append((5, base + dt.timedelta(days=14)))
    rows.append((5, base + dt.timedelta(days=28)))
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {
        r["bucket_start_us"]: (r["n_active"], r["n_retained"], r["retention_rate"])
        for r in retention_cohorts(df, bucket_us=B).collect()
    }
    b0 = (int(base.timestamp() * 1_000_000)) // B
    assert out[b0 * B] == (3, 0, None)  # no predecessor bucket in data
    assert out[(b0 + 1) * B] == (4, 2, round(2 / 3, 6))
    assert out[(b0 + 2) * B] == (1, 1, 0.25)
    # gap week: bucket b0+4 has no predecessor data -> rate NULL, retained 0
    assert out[(b0 + 4) * B] == (1, 0, None)


def test_retention_cohorts_dedupes_events(spark):
    from parconnect_spark.operators.events import retention_cohorts

    base = dt.datetime(2024, 1, 1)
    rows = [(1, base + dt.timedelta(hours=h)) for h in range(5)]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = retention_cohorts(df).collect()
    assert len(out) == 1 and out[0]["n_active"] == 1


def test_profile_numeric_vs_python(spark):
    from parconnect_spark.operators.events import profile_numeric

    vals = [((i * 37) % 100) / 4.0 for i in range(101)]
    rows = [(i, v if i % 10 else None) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "event_id long, value double")
    r = profile_numeric(df, "value", "event_id").collect()[0]

    present = sorted(v for i, v in rows if v is not None)
    n = len(present)
    assert r["n"] == 101 and r["n_null"] == 101 - n
    assert r["vmin"] == min(present) and r["vmax"] == max(present)
    assert abs(r["mean"] - round(sum(present) / n, 6)) < 1e-9
    mu = sum(present) / n
    var = sum((x - mu) ** 2 for x in present) / n
    assert abs(r["variance"] - var) < 1e-6
    assert r["median"] == present[(n - 1) // 2]


def test_profile_numeric_partition_invariance_and_degenerate(spark):
    from parconnect_spark.operators.events import profile_numeric

    rows = [(i, float(i % 7)) for i in range(500)]
    df = spark.createDataFrame(rows, "event_id long, value double")
    a = tuple(profile_numeric(df, "value", "event_id").collect()[0])
    b = tuple(
        profile_numeric(df.repartition(17), "value", "event_id").collect()[0]
    )
    assert a == b
    # all-null column still produces the single profile row
    nul = spark.createDataFrame([(1, None), (2, None)], "event_id long, value double")
    r = profile_numeric(nul, "value", "event_id").collect()
    assert len(r) == 1 and r[0]["n"] == 2 and r[0]["n_null"] == 2
    assert r[0]["median"] is None
    # empty frame: one row, zeros
    empty = spark.createDataFrame([], "event_id long, value double")
    r = profile_numeric(empty, "value", "event_id").collect()
    assert len(r) == 1 and r[0]["n"] == 0


def test_adoption_curve_first_seen_and_cumulative(spark):
    import datetime as dt

    import pyspark.sql.functions as F

    from parconnect_spark.operators.events import adoption_curve

    def t(day, h=0):
        return dt.datetime(2024, 1, day, h)

    rows = [
        (1, t(1)), (1, t(2)), (1, t(5)),   # user 1 first on day 1
        (2, t(1, 5)),                      # user 2 first on day 1
        (3, t(3)), (3, t(3, 9)),           # user 3 first on day 3
        (4, t(5)),                         # user 4 first on day 5
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = sorted(
        (r["day"], r["new_users"], r["cum_users"])
        for r in adoption_curve(ev).collect()
    )
    d0 = (dt.date(2024, 1, 1) - dt.date(1970, 1, 1)).days
    assert got == [(d0, 2, 2), (d0 + 2, 1, 3), (d0 + 4, 1, 4)]


def test_type_correlations_known_values(spark):
    import datetime as dt

    from parconnect_spark.operators.events import type_correlations

    ts = dt.datetime(2024, 1, 1)
    # a = perfectly correlated with b; c anti-correlated with a
    rows = []
    for u, (a, b, c) in enumerate([(1, 2, 9), (2, 4, 8), (3, 6, 7), (4, 8, 6)]):
        rows += [
            (u, ts, "a", float(a)),
            (u, ts, "b", float(b)),
            (u, ts, "c", float(c)),
        ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string, value double"
    )
    got = {
        (r["type_a"], r["type_b"]): r["corr"]
        for r in type_correlations(ev, ["a", "b", "c"]).collect()
    }
    assert got[("a", "b")] == 1.0
    assert got[("a", "c")] == -1.0
    assert got[("b", "c")] == -1.0


def test_type_correlations_missing_type_counts_as_zero(spark):
    import datetime as dt

    from parconnect_spark.operators.events import type_correlations

    ts = dt.datetime(2024, 1, 1)
    rows = [(0, ts, "a", 1.0), (1, ts, "a", 2.0), (1, ts, "b", 5.0)]
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string, value double"
    )
    got = type_correlations(ev, ["a", "b"]).collect()[0]
    # user 0 contributes (1.0, 0.0); user 1 (2.0, 5.0) -> corr = 1.0
    assert got["corr"] == 1.0


def test_cube_rollup_grouping_sets(spark):
    import datetime as dt

    from parconnect_spark.operators.events import cube_rollup

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (t0, "a", 1.0),
        (t0, "a", 2.0),
        (t0, "b", 4.0),
        (t0 + dt.timedelta(days=1), "a", 8.0),
    ]
    ev = spark.createDataFrame(rows, "ts timestamp, event_type string, value double")
    got = {
        (r["event_type"], r["day"]): (r["n"], r["value_sum"])
        for r in cube_rollup(ev).collect()
    }
    d0 = (dt.date(2024, 1, 1) - dt.date(1970, 1, 1)).days
    assert got[("a", d0)] == (2, 3.0)
    assert got[("a", None)] == (3, 11.0)        # type margin
    assert got[(None, d0)] == (3, 7.0)          # day margin
    assert got[(None, None)] == (4, 15.0)       # grand total
    assert len(got) == 3 + 2 + 2 + 1


def test_cusum_changepoint_finds_level_shift(spark):
    import datetime as dt

    from parconnect_spark.operators.events import cusum_changepoint

    rows = []
    # 5 days at ~2 events/day then 5 days at ~8/day -> change at day 5
    for d in range(10):
        n = 2 if d < 5 else 8
        for i in range(n):
            rows.append(("a", dt.datetime(2024, 1, 1 + d, i)))
    ev = spark.createDataFrame(rows, "event_type string, ts timestamp")
    r = cusum_changepoint(ev).collect()[0]
    d0 = (dt.date(2024, 1, 1) - dt.date(1970, 1, 1)).days
    # cumulative deviation from the mean (5) is most negative at the
    # last low day (day index 4)
    assert r["change_day"] == d0 + 4
    assert r["series_mean"] == 5.0
    assert r["cusum_peak"] == -15.0  # 5 days * (2-5)


def test_ewma_forecast_equals_recursive_definition(spark):
    import datetime as dt

    from parconnect_spark.operators.events import ewma_forecast

    counts = [4, 0, 6, 2, 10]  # day 2 missing -> zero-filled
    rows = []
    for d, n in enumerate(counts):
        for i in range(n):
            rows.append(("a", dt.datetime(2024, 1, 1 + d, i % 24)))
    ev = spark.createDataFrame(rows, "event_type string, ts timestamp")
    r = ewma_forecast(ev, alpha_num=1, alpha_den=4).collect()[0]
    a = 0.25
    e = counts[0]
    for x in counts[1:]:
        e = a * x + (1 - a) * e
    assert r["forecast"] == round(e, 6)
    d0 = (dt.date(2024, 1, 1) - dt.date(1970, 1, 1)).days
    assert r["last_day"] == d0 + 4


def test_markov_stationary_two_state_chain(spark):
    import datetime as dt

    from parconnect_spark.operators.events import markov_stationary

    t0 = dt.datetime(2024, 1, 1)
    # transitions: a->b x4 (P=1), b->a x3, b->b x2 (P(b->a)=3/5):
    # solve pi_a = pi_b*3/5 ; pi_a+pi_b=1 -> pi=(3/8, 5/8)
    seq = ["a", "b", "b", "a", "b", "b", "a", "b", "a", "b"]
    rows = [
        (1, i, t0 + dt.timedelta(minutes=i), s) for i, s in enumerate(seq)
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, event_type string"
    )
    got = {r["event_type"]: r["pi"] for r in markov_stationary(ev, iters=64).collect()}
    assert abs(got["a"] - 0.375) < 1e-4 and abs(got["b"] - 0.625) < 1e-4


def test_activity_gini_bounds_and_known_value(spark):
    import datetime as dt

    from parconnect_spark.operators.events import activity_gini

    ts = dt.datetime(2024, 1, 1)
    # equal activity -> gini 0
    eq = spark.createDataFrame(
        [(u, ts) for u in range(4) for _ in range(5)],
        "user_id long, ts timestamp",
    )
    r = activity_gini(eq).collect()[0]
    assert r["gini"] == 0.0 and r["n_users"] == 4 and r["total"] == 20
    # known skew: counts 1, 1, 8 -> sorted x=(1,1,8):
    # G = 2*(1*1+2*1+3*8)/(3*10) - 4/3 = 54/30 - 40/30 = 14/30
    sk = spark.createDataFrame(
        [(0, ts)] + [(1, ts)] + [(2, ts)] * 8, "user_id long, ts timestamp"
    )
    r2 = activity_gini(sk).collect()[0]
    assert r2["gini"] == round(14 / 30, 6)


def test_dow_seasonality_uniform_vs_spiked(spark):
    import datetime as dt

    from parconnect_spark.operators.events import dow_seasonality

    rows = []
    # type u: 1 event on each of 7 consecutive days -> chi2 = 0
    for d in range(7):
        rows.append(("u", dt.datetime(2024, 1, 1 + d)))
    # type s: 7 events all on one day -> chi2 = 6*(0-1)^2/1 + (7-1)^2/1 = 42
    for _ in range(7):
        rows.append(("s", dt.datetime(2024, 1, 1)))
    ev = spark.createDataFrame(rows, "event_type string, ts timestamp")
    got = {r["event_type"]: (r["n"], r["chi2"]) for r in dow_seasonality(ev).collect()}
    assert got["u"] == (7, 0.0)
    assert got["s"] == (7, 42.0)


def test_leave_last_out_split(spark):
    import datetime as dt

    from parconnect_spark.operators.events import leave_last_out_split

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, 0, t0), (1, 1, t0 + dt.timedelta(hours=1)),
        (1, 2, t0 + dt.timedelta(hours=1)),  # ts tie -> higher id wins test
        (2, 3, t0),
    ]
    ev = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp")
    got = {r["event_id"]: r["split"] for r in leave_last_out_split(ev).collect()}
    assert got == {0: "train", 1: "train", 2: "test", 3: "test"}


def test_survival_curve_known_lifetimes(spark):
    import datetime as dt

    from parconnect_spark.operators.events import survival_curve

    t0 = dt.datetime(2024, 1, 1)

    def span(u, days):
        return [(u, t0), (u, t0 + dt.timedelta(days=days))]

    rows = span(1, 0) + span(2, 2) + span(3, 2) + span(4, 5)
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        r["day"]: (r["n_surviving"], r["frac"])
        for r in survival_curve(ev).collect()
    }
    # lifetimes: 0, 2, 2, 5 -> S(0)=4, S(1)=3, S(2)=3, S(3)=1, S(5)=1
    assert got[0] == (4, 1.0)
    assert got[1] == (3, 0.75)
    assert got[2] == (3, 0.75)
    assert got[3] == (1, 0.25)
    assert got[5] == (1, 0.25)
    assert len(got) == 6
