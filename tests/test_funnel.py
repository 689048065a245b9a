"""First-touch funnel (operators/events.funnel): hand-built ordering and
window-boundary cases plus a brute-force per-user replay parity."""

from datetime import datetime, timedelta

import pytest

from parconnect_spark.operators.events import funnel

T0 = datetime(2024, 1, 1, 0, 0, 0)


def _ev(spark, rows):
    # rows: (event_id, user_id, seconds_offset, event_type)
    data = [
        (eid, T0 + timedelta(seconds=s), uid, ty, 0.0, "")
        for (eid, uid, s, ty) in rows
    ]
    return spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )


def _counts(df):
    return {r["step_idx"]: r["n_users"] for r in df.collect()}


def test_order_matters(spark):
    # user 1 completes A->B; user 2 has B BEFORE A (must not count at B)
    ev = _ev(
        spark,
        [
            (1, 1, 0, "a"), (2, 1, 10, "b"),
            (3, 2, 0, "b"), (4, 2, 10, "a"),
        ],
    )
    got = _counts(funnel(ev, steps=("a", "b"), within_seconds=None))
    assert got == {1: 2, 2: 1}


def test_strictly_after_and_first_touch(spark):
    # B at the exact same timestamp as A does NOT count (strictly after);
    # first-touch: the anchor is the EARLIEST A, not the one adjacent to B
    ev = _ev(
        spark,
        [
            (1, 1, 0, "a"), (2, 1, 0, "b"),          # same instant: no
            (3, 2, 0, "a"), (4, 2, 100, "a"), (5, 2, 50, "b"),  # yes
        ],
    )
    got = _counts(funnel(ev, steps=("a", "b"), within_seconds=None))
    assert got == {1: 2, 2: 1}


def test_window_anchored_at_first_step(spark):
    # B inside the window, C beyond it (window counts from A, not from B)
    ev = _ev(
        spark,
        [
            (1, 1, 0, "a"), (2, 1, 5, "b"), (3, 1, 20, "c"),
            (4, 2, 0, "a"), (5, 2, 5, "b"), (6, 2, 9, "c"),
        ],
    )
    got = _counts(funnel(ev, steps=("a", "b", "c"), within_seconds=10))
    assert got == {1: 2, 2: 2, 3: 1}


def test_window_boundary_inclusive(spark):
    # deadline is t1 + within inclusive (<=)
    ev = _ev(spark, [(1, 1, 0, "a"), (2, 1, 10, "b")])
    assert _counts(funnel(ev, steps=("a", "b"), within_seconds=10))[2] == 1
    assert _counts(funnel(ev, steps=("a", "b"), within_seconds=9))[2] == 0


def test_conversion_ratio(spark):
    ev = _ev(
        spark,
        [(1, 1, 0, "a"), (2, 2, 0, "a"), (3, 3, 0, "a"), (4, 1, 1, "b")],
    )
    rows = {
        r["step_idx"]: r
        for r in funnel(ev, steps=("a", "b"), within_seconds=None).collect()
    }
    assert rows[1]["conversion"] == 1.0
    assert rows[2]["n_users"] == 1
    assert abs(rows[2]["conversion"] - round(1 / 3, 6)) < 1e-12


def _brute(rows, steps, within_s):
    # per-user sequential replay of the declared semantics
    users = {u for (_, u, _, _) in rows}
    reach = [0] * len(steps)
    for u in users:
        evs = sorted((s, ty) for (_, uu, s, ty) in rows if uu == u)
        t = None
        dl = None
        for k, st in enumerate(steps):
            cand = [
                s
                for (s, ty) in evs
                if ty == st
                and (t is None or s > t)
                and (dl is None or s <= dl)
            ]
            if not cand:
                break
            t = min(cand)
            if k == 0 and within_s is not None:
                dl = t + within_s
            reach[k] += 1
    return {i + 1: n for i, n in enumerate(reach)}


@pytest.mark.parametrize("within", [None, 40])
def test_brute_force_parity(spark, within):
    import random

    rng = random.Random(11)
    rows = [
        (i, rng.randrange(8), rng.randrange(120), rng.choice("abcd"))
        for i in range(160)
    ]
    got = _counts(funnel(_ev(spark, rows), steps=("a", "b", "c"), within_seconds=within))
    assert got == _brute(rows, ("a", "b", "c"), within)


def test_rejects_single_step(spark):
    ev = _ev(spark, [(1, 1, 0, "a")])
    with pytest.raises(ValueError):
        funnel(ev, steps=("a",))
