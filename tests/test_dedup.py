
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
    # default = FULL-text fingerprint: 0 and 1 share a 40-char prefix but
    # diverge in the last token → NOT grouped; only the true duplicates
    # 0 and 3 are.
    out = {r["id"]: r["group_size"] for r in exact_dup_groups(docs(spark)).collect()}
    assert out[0] == out[3] == 2
    assert out[1] == 1 and out[2] == 1
    # prefix= is an opt-in BLOCKING key: 0, 1, 3 share the 40-char prefix
    blocked = {
        r["id"]: r["group_size"]
        for r in exact_dup_groups(docs(spark), prefix=40).collect()
    }
    assert blocked[0] == blocked[1] == blocked[3] == 3
    assert blocked[2] == 1


def test_ngram_jaccard_exact_values(spark):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs(spark), threshold=0.3).collect()
    }
    assert pairs[(0, 3)] == 1.0
    assert abs(pairs[(0, 1)] - round(brute_jaccard(BASE, NEAR), 6)) < 1e-9
    assert (0, 2) not in pairs


def test_ngram_jaccard_hot_shingle_guard(spark):
    """One ubiquitous shingle must not explode the candidate join: with the
    stop-shingle cap, candidate pairs stay bounded and Jaccard is computed
    over the filtered universe in BOTH numerator and denominator."""
    boiler = "standard legal disclaimer footer text"
    rows = [(i, f"unique{i} tokens here now " + boiler) for i in range(20)]
    rows.append((100, "unique0 tokens here now something else entirely okay"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # every doc shares the boilerplate shingles; df cap of 5 drops them
    out = ngram_jaccard_pairs(df, threshold=0.9, n=4, max_shingle_df=5).collect()
    # post-filter, no two docs share any shingle → no pairs at all
    assert out == []
    # sanity: without the cap the boilerplate makes all 20 docs candidates
    nocap = ngram_jaccard_pairs(df, threshold=0.1, n=4, max_shingle_df=None)
    assert nocap.count() >= 190


def test_ngram_jaccard_filtered_universe_consistent(spark):
    """With a cap, the reported jaccard equals the exact Jaccard of the
    post-filter shingle sets (numerator and denominator same universe)."""
    boiler = "common boiler plate junk line"
    a = "alpha beta gamma delta " + boiler
    b = "alpha beta gamma delta epsilon " + boiler
    rows = [(0, a), (1, b)] + [(i, f"pad{i} word{i} thing{i} stuff{i} " + boiler) for i in range(2, 9)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(df, threshold=0.01, n=4, max_shingle_df=3).collect()
    }

    def shset(t, n=4):
        tk = t.split()
        return {" ".join(tk[i : i + n]) for i in range(len(tk) - n + 1)}

    all_sets = {i: shset(t) for i, t in rows}
    from collections import Counter

    dfc = Counter(s for ss in all_sets.values() for s in ss)
    fa = {s for s in all_sets[0] if dfc[s] <= 3}
    fb = {s for s in all_sets[1] if dfc[s] <= 3}
    exp = len(fa & fb) / len(fa | fb)
    assert abs(out[(0, 1)] - round(exp, 6)) < 1e-9


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


def test_near_dup_clusters_transitive_and_singletons(spark):
    """A~B and B~C (no direct A~C pair) must land in ONE cluster with the
    min id canonical; docs with no pairs map to themselves."""
    from parconnect_spark.functions.dedup import near_dup_clusters

    docs = spark.createDataFrame([(i,) for i in range(7)], "doc_id long")
    pairs = spark.createDataFrame(
        [(1, 4), (4, 6), (2, 3)], "id_a long, id_b long"
    )
    got = {
        r["doc_id"]: r["canonical_id"]
        for r in near_dup_clusters(docs, pairs).collect()
    }
    assert got == {0: 0, 1: 1, 2: 2, 3: 2, 4: 1, 5: 5, 6: 1}


def test_boilerplate_dedup_keeps_canonical_occurrence(spark):
    from parconnect_spark.functions.dedup import boilerplate_dedup

    rows = spark.createDataFrame(
        [
            # "hi" spans 3 distinct convs (> max_groups=2) -> boilerplate;
            # only the lexicographically smallest (conv, turn) survives
            ("c1", 2, "hi"),
            ("c2", 0, "hi"),
            ("c1", 5, "hi"),  # same conv twice — distinct count still 3
            ("c3", 1, "hi"),
            # "rare" spans 2 convs (== threshold) -> passes through whole
            ("c1", 0, "rare"),
            ("c2", 3, "rare"),
            # singleton
            ("c9", 7, "once"),
        ],
        "conv_id string, turn_idx int, text string",
    )
    got = {
        (r["conv_id"], r["turn_idx"]): (r["text"], r["n_groups"])
        for r in boilerplate_dedup(rows, max_groups=2).collect()
    }
    assert got == {
        ("c1", 2): ("hi", 3),  # min (conv, turn) among hi rows
        ("c1", 0): ("rare", 2),
        ("c2", 3): ("rare", 2),
        ("c9", 7): ("once", 1),
    }


def test_boilerplate_dedup_every_text_survives_at_least_once(spark):
    from parconnect_spark.functions.dedup import boilerplate_dedup

    rows = spark.createDataFrame(
        [(f"c{i}", j, f"t{j % 3}") for i in range(10) for j in range(6)],
        "conv_id string, turn_idx int, text string",
    )
    out = boilerplate_dedup(rows, max_groups=1)
    # every text is boilerplate (10 convs each) -> exactly one keeper per
    # distinct (text) value... but texts repeat per turn slot: t0 covers
    # turn 0 and 3, t1 turns 1/4, t2 turns 2/5 — keeper is (c0, min turn)
    got = sorted(
        (r["conv_id"], r["turn_idx"], r["text"]) for r in out.collect()
    )
    assert got == [("c0", 0, "t0"), ("c0", 1, "t1"), ("c0", 2, "t2")]


def test_boilerplate_dedup_partition_invariance(spark):
    from parconnect_spark.functions.dedup import boilerplate_dedup
    import pyspark.sql.functions as F

    rows = spark.createDataFrame(
        [
            (f"c{(i * 7) % 13}", i % 9, f"text_{i % 5}")
            for i in range(200)
        ],
        "conv_id string, turn_idx int, text string",
    ).dropDuplicates(["conv_id", "turn_idx"])
    a = boilerplate_dedup(rows, max_groups=6)
    b = boilerplate_dedup(rows.repartition(17, "turn_idx"), max_groups=6)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_source_overlap_matches_pure_python(spark):
    rows = [
        (0, "a1", "w x y z q"),        # shingles(4): "w x y z","x y z q"
        (1, "a1", "p q r s"),
        (2, "b2", "w x y z k"),        # shares "w x y z" with a1
        (3, "c3", "completely different text here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    from parconnect_spark.functions.dedup import source_overlap

    got = {
        (r["group_a"], r["group_b"]): r.asDict()
        for r in source_overlap(docs, n=4).collect()
    }

    def sh(text):
        t = text.split()
        return {" ".join(t[i : i + 4]) for i in range(len(t) - 3)}

    sets = {}
    for _, s, t in rows:
        sets.setdefault(s, set()).update(sh(t))
    import itertools

    want = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        c = len(sets[a] & sets[b])
        if c:
            want[(a, b)] = {
                "n_common": c,
                "n_a": len(sets[a]),
                "n_b": len(sets[b]),
                "jaccard_pm": c * 1000 // (len(sets[a]) + len(sets[b]) - c),
            }
    assert set(got) == set(want)
    for k, w in want.items():
        for f, v in w.items():
            assert got[k][f] == v, (k, f)


def test_source_overlap_hot_shingle_guard(spark):
    # a shingle in every source is dropped when the guard is tighter
    rows = [(i, f"s{i}", "common boiler plate text") for i in range(4)]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    from parconnect_spark.functions.dedup import source_overlap

    assert source_overlap(docs, n=4, max_groups_per_shingle=3).count() == 0
    full = source_overlap(docs, n=4, max_groups_per_shingle=None)
    assert full.count() == 6  # all pairs share the one shingle


def test_prefix_filter_equals_unfiltered_exact(spark):
    # the prefix filter is LOSSLESS: output == the unfiltered exact
    # shared-shingle Jaccard join on a corpus with near-dups, exact dups,
    # and disjoint docs
    from parconnect_spark.functions.dedup import prefix_filter_pairs

    rows = [(0, BASE), (1, NEAR), (2, FAR), (3, BASE)]
    # widen the corpus: token-rotated and suffix-mutated variants
    toks = BASE.split()
    for i in range(4, 20):
        rot = toks[i % len(toks) :] + toks[: i % len(toks)]
        if i % 3 == 0:
            rot = rot[:-1] + [f"mut{i}"]
        rows.append((i, " ".join(rot)))
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in prefix_filter_pairs(d, threshold=(3, 5)).collect()
    )
    exp = sorted(
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in ngram_jaccard_pairs(
            d, threshold=0.6, max_shingle_df=None
        ).collect()
    )
    assert got == exp and (0, 3, 1.0) in [
        (a, b, round(j, 1)) for a, b, j in got
    ]


def test_prefix_filter_integer_threshold_boundary(spark):
    # n=1 shingles = distinct tokens: craft Jaccard EXACTLY 3/5 (inter 6,
    # union 10) -> included; and a just-below pair -> excluded. Integer
    # den*inter >= num*union arithmetic means no float-boundary flake.
    from parconnect_spark.functions.dedup import prefix_filter_pairs

    shared = [f"s{i}" for i in range(6)]
    a = shared + ["a1", "a2"]
    b = shared + ["b1", "b2"]
    c = shared[:5] + ["c1", "c2", "c3"]  # vs a: inter 5, union 11 < 0.6
    d = spark.createDataFrame(
        [(0, " ".join(a)), (1, " ".join(b)), (2, " ".join(c))],
        "doc_id long, text string",
    )
    out = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in prefix_filter_pairs(d, threshold=(3, 5), n=1).collect()
    }
    assert out == {(0, 1): 0.6}


def test_prefix_filter_partition_invariance(spark):
    from parconnect_spark.functions.dedup import prefix_filter_pairs

    d = docs(spark)
    one = sorted(map(tuple, prefix_filter_pairs(d).collect()))
    many = sorted(map(tuple, prefix_filter_pairs(d.repartition(7)).collect()))
    assert one == many and one


def test_bloom_blocklist_filter_exact_under_forced_fps(spark):
    # 32-bit bitmap over a 30-doc corpus with a 10-fp blocklist forces
    # Bloom false positives (expected fill ~0.6, ~5 FPs among the 20 clean
    # docs); the rescue anti-join must kill every one — output == the
    # plain exact anti-join
    import pyspark.sql.functions as F

    from parconnect_spark.functions.dedup import (
        bloom_bitmap,
        bloom_blocklist_filter,
        bloom_might_contain,
    )

    rows = [(i, f"doc number {i} body " + "x " * (i % 5)) for i in range(30)]
    corpus = spark.createDataFrame(rows, "doc_id long, text string")
    norm = F.lower(F.regexp_replace(F.col("text"), r"\s+", " "))
    fps = corpus.select(F.col("doc_id").alias("id"), F.md5(norm).alias("fp"))
    bl = fps.where("id % 3 = 0").select("fp")

    got = sorted(
        (r["id"], r["fp"])
        for r in bloom_blocklist_filter(corpus, bl, n_bits=32).collect()
    )
    exp = sorted(
        (r["id"], r["fp"]) for r in fps.join(bl, "fp", "left_anti").collect()
    )
    assert got == exp and len(got) == 20

    # prove the rescue was actually exercised: at 32 bits / 10 keys / 3
    # hashes the bitmap saturates enough that bloom-positives strictly
    # exceed the 10 true hits...
    bm = bloom_bitmap(bl, n_bits=32)
    n_maybe = (
        bloom_might_contain(fps, bm).where("_might").count()
    )
    assert n_maybe > 10
    # ...and no false negatives: every true hit is bloom-positive
    hits = bloom_might_contain(
        fps.join(bl, "fp", "left_semi"), bm
    )
    assert hits.where("NOT _might").count() == 0


def test_bloom_blocklist_filter_empty_blocklist(spark):
    from parconnect_spark.functions.dedup import bloom_blocklist_filter

    corpus = spark.createDataFrame(
        [(0, "a b"), (1, "c d")], "doc_id long, text string"
    )
    bl = spark.createDataFrame([], "fp string")
    assert bloom_blocklist_filter(corpus, bl).count() == 2


def test_bloom_blocklist_filter_partition_invariance(spark):
    import pyspark.sql.functions as F

    from parconnect_spark.functions.dedup import bloom_blocklist_filter

    rows = [(i, f"text {i}") for i in range(40)]
    corpus = spark.createDataFrame(rows, "doc_id long, text string")
    norm = F.lower(F.regexp_replace(F.col("text"), r"\s+", " "))
    bl = corpus.where("doc_id % 7 = 0").select(F.md5(norm).alias("fp"))
    one = sorted(map(tuple, bloom_blocklist_filter(corpus, bl).collect()))
    many = sorted(
        map(
            tuple,
            bloom_blocklist_filter(corpus.repartition(11), bl).collect(),
        )
    )
    assert one == many and len(one) == 34


def test_incremental_dedup_flags(spark):
    from parconnect_spark.functions.dedup import incremental_dedup

    base = " ".join(f"tok{i}" for i in range(30))
    near = " ".join(f"tok{i}" for i in range(29)) + " other"
    corpus = spark.createDataFrame(
        [(100, base), (101, "one two three four five six seven eight")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (0, base),                      # exact dup of 100
            (1, near),                      # near dup of 100
            (2, "totally fresh words here never seen in corpus at all"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["id"]: (r["exact_dup"], r["near_dup"], r["match_id"], r["jaccard"])
        for r in incremental_dedup(new, corpus).collect()
    }
    assert set(got) == {0, 1, 2}
    assert got[0] == (True, True, 100, 1.0)
    assert got[1][0] is False and got[1][1] is True and got[1][2] == 100
    assert 0.6 <= got[1][3] < 1.0
    assert got[2] == (False, False, None, None)


def test_incremental_dedup_best_match_tiebreak(spark):
    from parconnect_spark.functions.dedup import incremental_dedup

    base = " ".join(f"w{i}" for i in range(20))
    corpus = spark.createDataFrame(
        [(7, base), (3, base)], "doc_id long, text string"
    )
    new = spark.createDataFrame([(0, base)], "doc_id long, text string")
    r = incremental_dedup(new, corpus).collect()[0]
    # two corpus docs at jaccard 1.0 -> smallest corpus id wins
    assert r["match_id"] == 3 and r["jaccard"] == 1.0
