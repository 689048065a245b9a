import pyspark.sql.functions as F

from parconnect_spark.functions.dedup import (
    exact_dup_groups,
    lsh_candidate_pairs,
    minhash_near_dup_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    shingles,
    simhash,
    simhash_near_pairs,
)

BASE = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
NEAR = "alpha beta gamma delta epsilon zeta eta theta iota lambda"  # 1 token off
FAR = "one two three four five six seven eight nine ten"


def docs(spark):
    return spark.createDataFrame(
        [(0, BASE), (1, NEAR), (2, FAR), (3, BASE)], "doc_id long, text string"
    )


def brute_jaccard(a, b, n=4):
    sa = {" ".join(a.split()[i : i + n]) for i in range(len(a.split()) - n + 1)}
    sb = {" ".join(b.split()[i : i + n]) for i in range(len(b.split()) - n + 1)}
    return len(sa & sb) / len(sa | sb)


def test_shingles(spark):
    sh = shingles(docs(spark), n=4)
    got = {r["shingle"] for r in sh.where("id = 0").collect()}
    toks = BASE.split()
    exp = {" ".join(toks[i : i + 4]) for i in range(len(toks) - 3)}
    assert got == exp


def test_exact_dup_groups(spark):
    out = {r["id"]: r["group_size"] for r in exact_dup_groups(docs(spark)).collect()}
    # 0, 1, 3 share the 40-char prefix (1 differs only in its last token)
    assert out[0] == out[1] == out[3] == 3
    assert out[2] == 1
    full = {
        r["id"]: r["group_size"]
        for r in exact_dup_groups(docs(spark), prefix=200).collect()
    }
    assert full[0] == full[3] == 2 and full[1] == 1


def test_ngram_jaccard_exact_values(spark):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs(spark), threshold=0.3).collect()
    }
    assert pairs[(0, 3)] == 1.0
    assert abs(pairs[(0, 1)] - round(brute_jaccard(BASE, NEAR), 6)) < 1e-9
    assert (0, 2) not in pairs


def test_minhash_lsh_finds_near_dups(spark):
    out = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in minhash_near_dup_pairs(docs(spark), threshold=0.3).collect()
    }
    assert (0, 3) in out and out[(0, 3)] == 1.0
    # verified jaccard is exact on whatever candidates survive
    for (a, b), j in out.items():
        assert j >= 0.3


def test_minhash_signature_properties(spark):
    sigs = {r["id"]: r["sig"] for r in minhash_signatures(docs(spark), k=16).collect()}
    assert sigs[0] == sigs[3]  # identical docs → identical signatures
    same = sum(1 for x, y in zip(sigs[0], sigs[1]) if x == y)
    assert same >= 8  # near-dups agree on most components
    far_same = sum(1 for x, y in zip(sigs[0], sigs[2]) if x == y)
    assert far_same <= 4


def test_lsh_candidates_deterministic(spark):
    sigs = minhash_signatures(docs(spark), k=16)
    c1 = {(r["id_a"], r["id_b"]) for r in lsh_candidate_pairs(sigs, bands=8).collect()}
    c2 = {
        (r["id_a"], r["id_b"])
        for r in lsh_candidate_pairs(sigs.repartition(5), bands=8).collect()
    }
    assert c1 == c2
    assert (0, 3) in c1


def test_simhash(spark):
    out = {r["id"]: r["simhash"] for r in simhash(docs(spark)).collect()}
    assert out[0] == out[3]
    ham01 = bin((out[0] ^ out[1]) & (2**64 - 1)).count("1")
    ham02 = bin((out[0] ^ out[2]) & (2**64 - 1)).count("1")
    assert ham01 < ham02


def test_simhash_near_pairs(spark):
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_near_pairs(docs(spark), max_hamming=6).collect()
    }
    assert pairs.get((0, 3)) == 0
    assert (0, 2) not in pairs
