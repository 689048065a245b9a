import pyspark.sql.functions as F

from parconnect_spark.functions.text import (
    fingerprint,
    language_id,
    quality_features,
    quality_score,
    token_count,
)


def docs_df(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "el rapido zorro marron salta sobre el perro y la gata"),
        (2, "aaa aaa aaa aaa"),
        (3, "x!!! ??? ###"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_quality_features(spark):
    out = {r["doc_id"]: r for r in quality_features(docs_df(spark)).collect()}
    assert out[0]["n_tokens"] == 9
    assert out[2]["n_tokens"] == 4
    assert out[2]["distinct_ratio"] == 0.25
    assert out[0]["n_chars_nospace"] == len("thequickbrownfoxjumpsoverthelazydog")
    assert out[3]["punct_ratio"] > 0.5


def test_quality_score_ordering(spark):
    out = {r["doc_id"]: r["quality"] for r in quality_score(docs_df(spark)).collect()}
    assert out[0] > out[2] > out[3] or out[0] > out[3]
    assert all(0.0 <= v <= 1.0 for v in out.values())


def test_language_id(spark):
    out = {r["doc_id"]: r["lang_guess"] for r in language_id(docs_df(spark)).collect()}
    assert out[0] == "en"
    assert out[1] == "es"
    assert out[2] == "und"


def test_token_count_bpe(spark):
    df = spark.createDataFrame([(1, "hello, world42!")], "doc_id long, text string")
    got = df.select(
        token_count(F.col("text")).alias("ws"),
        token_count(F.col("text"), bpe_ish=True).alias("bpe"),
    ).collect()[0]
    assert got["ws"] == 2
    # hello , world 42 ! → 5 BPE-ish tokens
    assert got["bpe"] == 5


def test_fingerprint_normalizes_whitespace(spark):
    df = spark.createDataFrame(
        [(1, "A  b\tc"), (2, "a b c"), (3, "totally different")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["fp"] for r in fingerprint(df).collect()}
    assert out[1] == out[2] != out[3]


def test_repetition_features_hand_values(spark):
    from parconnect_spark.functions.text import repetition_features

    df = spark.createDataFrame(
        [
            (1, "a b a b a b"),  # "a b" x3 overlapping: 6/6; dup 4/6
            (2, "x y z"),        # no repeats; top bigram 2/3, trigram 3/3
            (3, "w"),            # too short for any gram
            (4, "p p p p"),      # "p p" x3 -> 6/4: overlap pushes past 1.0
            (5, ""),             # empty doc: all zeros, no division blowup
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in repetition_features(df).collect()}
    assert (out[1]["dup_word_frac"], out[1]["top_bigram_frac"]) == (0.666667, 1.0)
    assert out[1]["top_trigram_frac"] == 1.0  # "a b a" twice -> 2*3/6
    assert (out[2]["dup_word_frac"], out[2]["top_bigram_frac"]) == (0.0, 0.666667)
    assert (out[3]["top_bigram_frac"], out[3]["top_trigram_frac"]) == (0.0, 0.0)
    assert (out[4]["dup_word_frac"], out[4]["top_bigram_frac"]) == (0.75, 1.5)
    assert (out[5]["n_words"], out[5]["dup_word_frac"]) == (0, 0.0)


def test_tfidf_top_terms_hand_values(spark):
    import math

    from parconnect_spark.functions.text import tfidf_top_terms

    # 3 docs; "rare" appears only in doc 0, "the" in all 3. Smooth idf:
    # ln((1+N)/(1+df)) -> "the": ln(4/4)=0, "rare": ln(4/2)=ln 2.
    df = spark.createDataFrame(
        [
            (0, "the rare rare term"),
            (1, "the common words"),
            (2, "the common term"),
        ],
        "doc_id long, text string",
    )
    out = tfidf_top_terms(df, k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], {})[r["term"]] = r
    # doc 0: "rare" tf=2 df=1 -> 2*ln(2); "term" tf=1 df=2 -> ln(4/3);
    # "the" scores 0 so never outranks them.
    assert set(by_doc[0]) == {"rare", "term"}
    assert by_doc[0]["rare"]["tf"] == 2 and by_doc[0]["rare"]["df"] == 1
    expect = 2 * round(math.log(2.0) * 1e6) / 1e6
    assert abs(by_doc[0]["rare"]["tfidf"] - expect) < 1e-12
    # zero-idf terms rank below any positive score but still fill k
    # (doc 1: common/words positive, "the" zero -> excluded at k=2)
    assert set(by_doc[1]) == {"common", "words"}
    # every doc returns exactly k rows when it has >= k distinct terms
    assert all(len(v) == 2 for v in by_doc.values())


def test_tfidf_n_docs_hint_skips_count(spark):
    from parconnect_spark.functions.text import tfidf_top_terms

    df = spark.createDataFrame(
        [(0, "alpha beta"), (1, "alpha gamma")], "doc_id long, text string"
    )
    with_hint = tfidf_top_terms(df, k=1, n_docs=2).collect()
    without = tfidf_top_terms(df, k=1).collect()
    assert sorted(map(tuple, with_hint)) == sorted(map(tuple, without))


def test_redact_pii_categories_and_order(spark):
    from parconnect_spark.functions.text import redact_pii

    df = spark.createDataFrame(
        [
            (0, "mail a.b+c@ex.org see https://x.io/p?q=1 from 10.0.0.1 call +4915112345678"),
            (1, "no pii here"),
            # email-ish inside a URL is consumed by the URL pass first
            (2, "http://a.b/c@d.com and 999.1.2.3"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in redact_pii(df).collect()}
    assert out[0]["redacted"] == "mail <EMAIL> see <URL> from <IP> call <PHONE>"
    assert (out[0]["n_url"], out[0]["n_email"], out[0]["n_ipv4"], out[0]["n_phone"]) == (1, 1, 1, 1)
    assert out[1]["redacted"] == "no pii here"
    assert (out[2]["n_url"], out[2]["n_email"], out[2]["n_ipv4"]) == (1, 0, 1)


def test_redact_pii_drop_text(spark):
    from parconnect_spark.functions.text import redact_pii

    df = spark.createDataFrame([(0, "x@y.io")], "doc_id long, text string")
    cols = redact_pii(df, keep_text=False).columns
    assert "text" not in cols and "redacted" in cols


def test_bigram_lm_hand_values(spark):
    from parconnect_spark.functions.text import bigram_lm

    df = spark.createDataFrame(
        [(0, "the cat sat on the mat"), (1, "the cat ran")],
        "doc_id long, text string",
    )
    rows = {
        (r["w1"], r["w2"]): (r["c12"], r["c1"], r["p"])
        for r in bigram_lm(df, k=2, min_head_count=1).collect()
    }
    assert rows[("the", "cat")] == (2, 3, 0.666667)
    # bigrams never cross documents: "mat"->"the" would need doc0|doc1
    assert ("mat", "the") not in rows
    # k caps continuations per head (the: cat(2) then mat(1); ties by term)
    assert sum(1 for (w1, _) in rows if w1 == "the") == 2


def test_bigram_lm_partition_invariance(spark):
    import pyspark.sql.functions as F

    from parconnect_spark.functions.text import bigram_lm

    df = spark.createDataFrame(
        [(i, f"alpha beta gamma alpha beta delta x{i}") for i in range(20)],
        "doc_id long, text string",
    )
    a = sorted(map(tuple, bigram_lm(df, k=2).collect()))
    b = sorted(map(tuple, bigram_lm(df.repartition(7), k=2).collect()))
    assert a == b


def test_collocations_matches_pure_python(spark):
    from itertools import combinations

    from parconnect_spark.functions.text import collocations

    rows = [
        (0, "alpha beta gamma"),
        (1, "alpha beta delta"),
        (2, "alpha beta gamma delta"),
        (3, "alpha gamma"),
        (4, "beta delta epsilon"),
        (5, "zeta"),  # hapax — min_df drops it
        (6, "alpha beta"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = collocations(
        docs, min_count=2, top_k=5, min_df=2, max_df=None
    ).collect()

    # pure-python replay
    tok = {i: set(t.split()) for i, t in rows}
    df = {}
    for terms in tok.values():
        for t in terms:
            df[t] = df.get(t, 0) + 1
    kept = {t for t, n in df.items() if n >= 2}
    pair = {}
    for terms in tok.values():
        for a, b in combinations(sorted(terms & kept), 2):
            pair[(a, b)] = pair.get((a, b), 0) + 1
    n_docs = len(rows)
    want = []
    for (a, b), np_ in pair.items():
        if np_ < 2:
            continue
        import math

        score = math.floor(np_ * n_docs * 1_000_000 / (df[a] * df[b]))
        want.append((a, b, np_, df[a], df[b], score))
    want.sort(key=lambda r: (-r[5], r[0], r[1]))
    want = want[:5]
    assert [tuple(r) for r in got] == want


def test_collocations_max_df_drops_boilerplate(spark):
    from parconnect_spark.functions.text import collocations

    rows = [(i, f"stop word{i % 2} tail") for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = collocations(docs, min_count=2, top_k=10, min_df=2, max_df=9)
    terms = {r["term_a"] for r in out.collect()} | {
        r["term_b"] for r in out.collect()
    }
    # 'stop' and 'tail' appear in all 10 docs -> dropped by max_df=9
    assert "stop" not in terms and "tail" not in terms
    assert terms == {"word0", "word1"} or terms == set()
