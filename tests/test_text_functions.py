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
