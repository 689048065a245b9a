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
