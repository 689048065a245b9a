

def test_rolling_topk_terms_vs_brute_force(spark):
    import collections
    import datetime

    from parconnect_spark.functions.text import rolling_topk_terms

    day = 86_400_000_000
    base = datetime.datetime(2024, 1, 1)
    rows = []
    for d in range(10):
        for i in range(d + 1):
            rows.append((base + datetime.timedelta(days=d), f"w{d % 4} common x{i % 3}"))
    df = spark.createDataFrame(rows, "ts timestamp, text string")
    got = [
        (r["asof_bucket_us"], r["rank"], r["term"], r["cnt"])
        for r in rolling_topk_terms(df, window_buckets=3, k=2)
        .orderBy("asof_bucket_us", "rank")
        .collect()
    ]

    # brute force in python
    day0 = int(base.timestamp()) * 1_000_000 // day
    per_day = collections.defaultdict(collections.Counter)
    for ts, text in rows:
        b = (int(ts.timestamp()) * 1_000_000) // day
        per_day[b].update(text.split())
    want = []
    wds = sorted({wd for b in per_day for wd in range(b, b + 3)})
    for wd in wds:
        c = collections.Counter()
        for b in range(wd - 2, wd + 1):
            c.update(per_day.get(b, {}))
        top = sorted(c.items(), key=lambda t: (-t[1], t[0]))[:2]
        for i, (term, cnt) in enumerate(top, 1):
            want.append((wd * day, i, term, cnt))
    assert got == want


def test_rolling_topk_terms_guards(spark):
    import pytest

    from parconnect_spark.functions.text import rolling_topk_terms

    df = spark.createDataFrame([], "ts timestamp, text string")
    assert rolling_topk_terms(df).count() == 0
    with pytest.raises(ValueError):
        rolling_topk_terms(df, k=0)
    with pytest.raises(ValueError):
        rolling_topk_terms(df, bucket_us=0)
