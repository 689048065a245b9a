import pyspark.sql.functions as F

from parconnect_spark.functions.curation import curation_funnel

LONG_A = " ".join(f"tok{i}" for i in range(30))
# near-dup: one trailing token changed -> 23 shared of 31 distinct
# 4-gram shingles, jaccard ~0.74 >= 0.6
LONG_B = " ".join(f"tok{i}" for i in range(29)) + " other"
SHORT = "tiny doc"


def corpus(spark):
    rows = [
        (0, LONG_A),
        (1, LONG_A),          # exact dup of 0
        (2, LONG_B),          # near-dup of 0
        (3, SHORT),           # fails quality
        (4, "one two three four five six seven eight nine ten " * 2),
        (5, "completely different words " + "x y z w v u t s r q " * 2),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_funnel_stage_counts(spark):
    d = corpus(spark)
    norm = F.lower(F.regexp_replace(F.col("text"), r"\s+", " "))
    bl = d.where("doc_id = 4").select(F.md5(norm).alias("fp"))
    got = {
        r["stage"]: r["n_docs"]
        for r in curation_funnel(d, blocklist=bl, min_tokens=15).collect()
    }
    # input 6; quality drops SHORT -> 5; exact drops 1 -> 4;
    # near-dup folds 2 into 0 -> 3; blocklist drops 4 -> 2
    assert got == {
        "input": 6,
        "quality": 5,
        "exact_dedup": 4,
        "near_dedup": 3,
        "blocklist": 2,
    }


def test_funnel_monotone_and_no_blocklist(spark):
    rows = curation_funnel(corpus(spark), min_tokens=15).collect()
    ns = [r["n_docs"] for r in sorted(rows, key=lambda r: r["stage_idx"])]
    assert ns == sorted(ns, reverse=True)
    assert ns[3] == ns[4]  # blocklist stage is a no-op when None
