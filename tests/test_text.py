

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


def test_term_bursts_vs_brute_force(spark):
    import collections
    import datetime

    from parconnect_spark.functions.text import term_bursts

    day = 86_400_000_000
    base = datetime.datetime(2024, 3, 1)
    rows = []
    # "bg" hums along at 3/day; "spike" bursts on day 6; "fresh" first
    # appears on day 8
    for d in range(10):
        rows.append((base + datetime.timedelta(days=d), "bg bg bg"))
        if d == 6:
            rows.append((base + datetime.timedelta(days=d), " ".join(["spike"] * 9)))
        elif d in (2, 3):
            rows.append((base + datetime.timedelta(days=d), "spike"))
        if d == 8:
            rows.append((base + datetime.timedelta(days=d), "fresh fresh fresh fresh fresh"))
    df = spark.createDataFrame(rows, "ts timestamp, text string")
    W, RN, RD, MC = 3, 2, 1, 4
    got = {
        (r["asof_bucket_us"], r["term"]): (r["cnt"], r["baseline"], r["ratio"])
        for r in term_bursts(
            df, window_buckets=W, ratio_num=RN, ratio_den=RD, min_count=MC
        ).collect()
    }

    per = collections.defaultdict(collections.Counter)
    for ts, text in rows:
        per[(int(ts.timestamp()) * 1_000_000) // day].update(text.split())
    want = {}
    for b, c in per.items():
        for term, cnt in c.items():
            bl = sum(per.get(pb, {}).get(term, 0) for pb in range(b - W, b))
            if cnt >= MC and cnt * W * RD >= bl * RN:
                ratio = round(cnt * float(W) / bl, 6) if bl > 0 else None
                want[(b * day, term)] = (cnt, bl, ratio)
    assert got == want
    # the spike and the new term are both caught; the background never is
    assert any(t == "spike" for _, t in got) and any(t == "fresh" for _, t in got)
    assert not any(t == "bg" for _, t in got)


def test_term_bursts_guards(spark):
    import pytest

    from parconnect_spark.functions.text import term_bursts

    df = spark.createDataFrame([], "ts timestamp, text string")
    assert term_bursts(df).count() == 0
    with pytest.raises(ValueError):
        term_bursts(df, min_count=0)
    with pytest.raises(ValueError):
        term_bursts(df, ratio_num=0)


def test_chunk_documents_windows_and_tail(spark):
    from parconnect_spark.functions.text import chunk_documents

    text = " ".join(f"t{i}" for i in range(10))
    d = spark.createDataFrame(
        [(0, text), (1, "a b"), (2, ""), (3, "   ")],
        "doc_id long, text string",
    )
    rows = sorted(
        (r["id"], r["chunk_idx"], r["n_tokens"], r["chunk"])
        for r in chunk_documents(d, window=4, stride=3).collect()
    )
    # doc 0: 10 tokens -> 1 + ceil(6/3) = 3 chunks at starts 0,3,6
    #   [t0..t3], [t3..t6], [t6..t9]; every token covered, overlap 1
    assert rows == [
        (0, 0, 4, "t0 t1 t2 t3"),
        (0, 1, 4, "t3 t4 t5 t6"),
        (0, 2, 4, "t6 t7 t8 t9"),
        (1, 0, 2, "a b"),
    ]


def test_chunk_documents_exact_multiple_no_empty_tail(spark):
    from parconnect_spark.functions.text import chunk_documents

    # n == window -> exactly one chunk; n == window + stride -> two
    d = spark.createDataFrame(
        [(0, "a b c d"), (1, "a b c d e f g")], "doc_id long, text string"
    )
    got = {
        (r["id"], r["chunk_idx"]): r["n_tokens"]
        for r in chunk_documents(d, window=4, stride=3).collect()
    }
    assert got == {(0, 0): 4, (1, 0): 4, (1, 1): 4}


def test_chunk_documents_covers_every_token(spark):
    import pyspark.sql.functions as F

    from parconnect_spark.functions.text import chunk_documents

    text = " ".join(f"w{i}" for i in range(97))
    d = spark.createDataFrame([(0, text)], "doc_id long, text string")
    ch = chunk_documents(d, window=16, stride=11)
    toks = {
        t
        for r in ch.select(F.explode(F.split("chunk", " ")).alias("t")).collect()
        for t in [r["t"]]
    }
    assert toks == {f"w{i}" for i in range(97)}


def test_inverted_index_matches_window_and_caps(spark):
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from parconnect_spark.functions.text import inverted_index, tokens_col

    rows = [
        (0, "the cat sat on the mat the end"),
        (1, "the dog the dog the dog"),
        (2, "cat dog bird"),
        (3, "the the the the"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    out = inverted_index(d, k_postings=2)
    got = sorted(
        (r["term"], r["df"], r["rank"], r["doc_id"], r["tf"])
        for r in out.collect()
    )
    # brute force
    toks = d.select(
        "doc_id", F.explode(tokens_col(F.col("text"))).alias("term")
    )
    p = toks.groupBy("term", "doc_id").agg(F.count(F.lit(1)).alias("tf"))
    dfc = p.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy("term").orderBy(F.desc("tf"), F.asc("doc_id"))
    exp = sorted(
        (r["term"], r["df"], r["rank"], r["doc_id"], r["tf"])
        for r in p.withColumn("rank", F.row_number().over(w))
        .where("rank <= 2")
        .join(dfc, "term")
        .select("term", "df", "rank", "doc_id", "tf")
        .collect()
    )
    assert got == exp
    # df exact even where postings were capped: 'the' appears in 3 docs
    the = [(r[1], r[2], r[3], r[4]) for r in got if r[0] == "the"]
    assert {t[0] for t in the} == {3} and len(the) == 2
    # top postings by tf: doc 3 (tf 4) then doc 0/1 (tf 3) -> tie to doc 1? no:
    # doc1 tf=3, doc0 tf=3 -> tie broken by doc_id -> doc 0
    assert the[0][1:] == (1, 3, 4) and the[1][1:] == (2, 0, 3)


def test_bm25_matches_pure_python(spark):
    import math

    from parconnect_spark.functions.text import bm25_scores

    rows = [
        (0, "data model data training loop"),
        (1, "model model model unrelated words here"),
        (2, "nothing relevant at all"),
        (3, "data"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    q = ["data", "model"]
    got = {r["id"]: r["score"] for r in bm25_scores(d, q).collect()}

    texts = {i: t.split() for i, t in rows}
    N = len(texts)
    avg = sum(len(t) for t in texts.values()) / N
    df = {t: sum(1 for toks in texts.values() if t in toks) for t in q}
    k1, b = 1.2, 0.75
    exp = {}
    for i, toks in texts.items():
        s = 0.0
        for t in q:
            tf = toks.count(t)
            if tf == 0:
                continue
            idf = math.log(1 + (N - df[t] + 0.5) / (df[t] + 0.5))
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(toks) / avg))
        if s > 0:
            exp[i] = round(s, 6)
    assert set(got) == set(exp)  # doc 2 absent
    for i in exp:
        assert abs(got[i] - exp[i]) < 2e-6
    # doc 0 hits both terms with tf 2 -> highest
    assert got[0] == max(got.values())


def test_bm25_guards_and_dedup_query(spark):
    import pytest

    from parconnect_spark.functions.text import bm25_scores

    d = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        bm25_scores(d, [])
    one = bm25_scores(d, ["a"]).collect()
    two = bm25_scores(d, ["a", "a"]).collect()
    assert [tuple(r) for r in one] == [tuple(r) for r in two]


def test_fuzzy_pairs_equals_brute_force(spark):
    from parconnect_spark.functions.text import fuzzy_pairs

    words = [
        "click", "clicks", "clack", "flick",       # long cluster, d=1 links
        "signup", "signups", "sign",               # mixed lengths
        "ab", "ac", "abc", "b",                    # short strings
        "purchase", "purchases", "unrelated",
        "ab",                                      # duplicate row
    ]
    d = spark.createDataFrame([(w,) for w in words], "s string")
    got = sorted(map(tuple, fuzzy_pairs(d, max_dist=1, q=3).collect()))

    import itertools

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[len(b)]

    uniq = sorted(set(words))
    exp = sorted(
        (a, b, lev(a, b))
        for a, b in itertools.combinations(uniq, 2)
        if lev(a, b) <= 1
    )
    assert got == exp and ("ab", "ac", 1) in got and ("click", "clicks", 1) in got


def test_fuzzy_pairs_cross_boundary_band(spark):
    from parconnect_spark.functions.text import fuzzy_pairs

    # len 5 (short, < q(d+1)=6) vs len 6 (long): no shared q-gram needed
    d = spark.createDataFrame([("abcde",), ("abcdef",)], "s string")
    got = [tuple(r) for r in fuzzy_pairs(d, max_dist=1, q=3).collect()]
    assert got == [("abcde", "abcdef", 1)]


def test_readability_features_known_text(spark):
    from parconnect_spark.functions.text import readability_features

    d = spark.createDataFrame(
        [(0, "the cat sat. the dog ran!"), (1, ""), (2, "one")],
        "doc_id long, text string",
    )
    got = {r["id"]: r.asDict() for r in readability_features(d).collect()}
    assert 1 not in got  # empty text dropped
    r0 = got[0]
    # words 6, sentences 2, vowel groups: e,a,a,e,o,a -> 6
    assert r0["n_words"] == 6 and r0["n_sentences"] == 2
    assert r0["n_syllables"] == 6
    assert r0["flesch"] == round(206.835 - 1.015 * 3 - 84.6 * 1.0, 6)
    r2 = got[2]
    assert r2["n_sentences"] == 1 and r2["n_words"] == 1
    assert r2["n_syllables"] == 2  # o, e


def test_rrf_fuse_known_scores_and_missing_items(spark):
    from parconnect_spark.functions.text import rrf_fuse

    a = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], "id long, rank int")
    b = spark.createDataFrame([(3, 1), (2, 2), (4, 3)], "id long, rank int")
    got = {
        r["id"]: (r["rrf_score"], r["fused_rank"])
        for r in rrf_fuse(a, b, k=60).collect()
    }
    s1 = round(1 / 61, 6)                       # only in a at rank 1
    s2 = round(1 / 62 + 1 / 62, 6)              # rank 2 in both
    s3 = round(1 / 63 + 1 / 61, 6)              # 3 in a, 1 in b
    s4 = round(1 / 63, 6)                       # only in b at rank 3
    assert got[1][0] == s1 and got[4][0] == s4
    assert got[2][0] == s2 and got[3][0] == s3
    # order: s2 > s3 > s1 > s4 -> check actual ordering numerically
    order = sorted(got, key=lambda i: got[i][1])
    exp = [i for i, _ in sorted(
        got.items(), key=lambda kv: (-kv[1][0], kv[0])
    )]
    assert order == exp


def test_ks_drift_identical_and_disjoint(spark):
    from parconnect_spark.functions.text import ks_drift

    rows = []
    # A and B identical length profiles; C disjoint (much longer)
    for i in range(10):
        rows.append((f"a{i}", "A", "w " * (i % 3 + 1)))
        rows.append((f"b{i}", "B", "w " * (i % 3 + 1)))
        rows.append((f"c{i}", "C", "w " * 50))
    d = spark.createDataFrame(rows, "doc_id string, source string, text string")
    got = {
        (r["source_a"], r["source_b"]): (r["ks"], r["n_a"], r["n_b"])
        for r in ks_drift(d).collect()
    }
    assert got[("A", "B")][0] == 0.0
    assert got[("A", "C")][0] == 1.0 and got[("B", "C")][0] == 1.0
    assert got[("A", "B")][1:] == (10, 10)


def test_ks_drift_known_half_shift(spark):
    from parconnect_spark.functions.text import ks_drift

    # A: lengths 1,1,2,2 ; B: lengths 2,2,3,3 -> max |F| gap at x=1: .5
    rows = [("a1", "A", "w"), ("a2", "A", "w"), ("a3", "A", "w w"),
            ("a4", "A", "w w"), ("b1", "B", "w w"), ("b2", "B", "w w"),
            ("b3", "B", "w w w"), ("b4", "B", "w w w")]
    d = spark.createDataFrame(rows, "doc_id string, source string, text string")
    r = ks_drift(d).collect()[0]
    assert r["ks"] == 0.5


def test_token_entropy_uniform_vs_degenerate(spark):
    import math

    from parconnect_spark.functions.text import token_entropy

    rows = [
        (0, "U", "a b c d"),        # uniform over 4 -> ln 4
        (1, "D", "x x x x"),        # degenerate -> 0
    ]
    d = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {r["group"]: r for r in token_entropy(d).collect()}
    assert got["U"]["entropy"] == round(math.log(4), 6)
    assert got["U"]["n_tokens"] == 4 and got["U"]["n_distinct"] == 4
    assert got["D"]["entropy"] == -0.0 or got["D"]["entropy"] == 0.0
