"""Corpus bigram-LM document scoring (functions/text.lm_score): hand case,
sequential replay parity, and shape/edge cases."""

import math

from parconnect_spark.functions.text import lm_score


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _replay(texts):
    """Plain-Python replay of the declared semantics (tokenize, corpus
    bigram conditionals, per-bigram int64 round(-ln(p)*1e6), exact sum)."""
    import re

    toks = [re.findall(r"[a-z0-9]+", t.lower()) for t in texts]
    bigs = [[(w[i], w[i + 1]) for i in range(len(w) - 1)] for w in toks]
    c12 = {}
    for bl in bigs:
        for b in bl:
            c12[b] = c12.get(b, 0) + 1
    c1 = {}
    for (w1, _), c in c12.items():
        c1[w1] = c1.get(w1, 0) + c
    out = {}
    for i, bl in enumerate(bigs):
        if not bl:
            continue
        nll6 = 0
        for b in bl:
            p = c12[b] / c1[b[0]]
            # round-half-away-from-zero on a non-negative value == Spark's
            # HALF_UP == DuckDB's ROUND
            nll6 += int(math.floor(-math.log(p) * 1e6 + 0.5))
        out[i] = (len(bl), nll6, round(math.exp(nll6 / len(bl) / 1e6), 6))
    return out


def test_hand_case_uniform_corpus(spark):
    # every bigram occurs once with a unique head -> p = 1, nll = 0, ppl = 1
    out = lm_score(_docs(spark, ["a b c", "d e"])).collect()
    got = {r["doc_id"]: (r["n_bigrams"], r["nll6"], r["ppl"]) for r in out}
    assert got == {0: (2, 0, 1.0), 1: (1, 0, 1.0)}


def test_hand_case_split_head(spark):
    # head 'a' continues to b twice and c once: p(b|a)=2/3, p(c|a)=1/3
    out = lm_score(_docs(spark, ["a b", "a b", "a c"])).collect()
    got = {r["doc_id"]: r["nll6"] for r in out}
    nb = int(math.floor(-math.log(2 / 3) * 1e6 + 0.5))
    nc = int(math.floor(-math.log(1 / 3) * 1e6 + 0.5))
    assert got == {0: nb, 1: nb, 2: nc}


def test_replay_parity(spark):
    texts = [
        "the cat sat on the mat",
        "the cat ran off the mat",
        "a dog sat on a log",
        "the dog and the cat",
        "one",
        "",
    ]
    out = lm_score(_docs(spark, texts)).collect()
    got = {r["doc_id"]: (r["n_bigrams"], r["nll6"], r["ppl"]) for r in out}
    assert got == _replay(texts)


def test_short_docs_excluded(spark):
    out = lm_score(_docs(spark, ["solo", "", "two words"]))
    assert {r["doc_id"] for r in out.collect()} == {2}


def test_partition_invariance(spark):
    texts = ["x y z x y", "y z y z", "z x y"] * 4
    df = _docs(spark, texts)
    a = sorted(map(tuple, lm_score(df.repartition(1)).collect()))
    b = sorted(map(tuple, lm_score(df.repartition(7, "doc_id")).collect()))
    assert a == b
