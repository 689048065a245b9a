"""Duplicated-span statistics (functions/dedup.duplicated_spans): hand
cases with planted shared spans, coverage union, edge guards, and a
brute-force replay."""

import pytest

from parconnect_spark.functions.dedup import duplicated_spans


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _rows(df):
    return {
        r["doc_id"]: (
            r["n_tokens"],
            r["n_grams"],
            r["n_dup_grams"],
            r["n_dup_tokens"],
        )
        for r in df.collect()
    }


def test_planted_shared_span(spark):
    # the 3-gram "x y z" appears in both docs; doc 0 has 3 grams, doc 1 has 2
    got = _rows(
        duplicated_spans(
            _docs(spark, ["a b x y z", "x y z w"]), n=3
        )
    )
    # doc 0: grams {a b x, b x y, x y z}, dup occurrence 1, covers tokens 3..5
    # doc 1: grams {x y z, y z w}, dup occurrence 1, covers tokens 1..3
    assert got == {0: (5, 3, 1, 3), 1: (4, 2, 1, 3)}


def test_coverage_union_overlapping_grams(spark):
    # "x y z w" shared whole: doc of exactly it has 2 dup 3-grams whose
    # position union covers all 4 tokens (not 6)
    got = _rows(duplicated_spans(_docs(spark, ["x y z w", "p x y z w q"]), n=3))
    assert got[0] == (4, 2, 2, 4)
    assert got[1] == (6, 4, 2, 4)


def test_within_doc_repeat_is_not_cross_doc_dup(spark):
    # "x y z x y z" repeats internally but no OTHER doc shares it
    got = _rows(duplicated_spans(_docs(spark, ["x y z x y z", "a b c"]), n=3))
    assert got[0][2] == 0 and got[1][2] == 0


def test_short_docs_excluded(spark):
    got = _rows(duplicated_spans(_docs(spark, ["a b", "a b c d"]), n=3))
    assert set(got) == {1}


def test_ratios(spark):
    out = duplicated_spans(_docs(spark, ["x y z", "x y z"]), n=3).collect()
    for r in out:
        assert r["dup_gram_ratio"] == 1.0
        assert r["dup_token_ratio"] == 1.0


def _brute(texts, n, min_docs=2):
    import re

    toks = [re.findall(r"[a-z0-9]+", t.lower()) for t in texts]
    grams = {
        i: [tuple(w[p : p + n]) for p in range(len(w) - n + 1)]
        for i, w in enumerate(toks)
        if len(w) >= n
    }
    docs_of = {}
    for i, gl in grams.items():
        for g in set(gl):
            docs_of.setdefault(g, set()).add(i)
    dup = {g for g, ds in docs_of.items() if len(ds) >= min_docs}
    out = {}
    for i, gl in grams.items():
        nd = sum(1 for g in gl if g in dup)
        cov = set()
        for p, g in enumerate(gl):
            if g in dup:
                cov.update(range(p, p + n))
        out[i] = (len(toks[i]), len(gl), nd, len(cov))
    return out


def test_brute_force_parity(spark):
    import random

    rng = random.Random(3)
    vocab = list("abcdefg")
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randrange(2, 25)))
        for _ in range(24)
    ]
    got = _rows(duplicated_spans(_docs(spark, texts), n=4))
    assert got == _brute(texts, 4)


def test_rejects_bad_params(spark):
    d = _docs(spark, ["a b"])
    with pytest.raises(ValueError):
        duplicated_spans(d, n=0)
    with pytest.raises(ValueError):
        duplicated_spans(d, min_docs=1)
