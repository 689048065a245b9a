import itertools

from parconnect_spark.functions.itemsets import frequent_itemsets


def test_frequent_itemsets_matches_brute_force(spark):
    baskets = {
        0: {"a", "b", "c"},
        1: {"a", "b", "c", "d"},
        2: {"a", "b"},
        3: {"b", "c"},
        4: {"a", "c", "e"},
        5: {"a", "b", "c"},
    }
    rows = [(k, i) for k, s in baskets.items() for i in s]
    d = spark.createDataFrame(rows, "basket_id long, item string")
    got = sorted(map(tuple, frequent_itemsets(d, 3).collect()))

    exp = []
    items = sorted({i for s in baskets.values() for i in s})
    for size in (1, 2, 3):
        for combo in itertools.combinations(items, size):
            sup = sum(1 for s in baskets.values() if set(combo) <= s)
            if sup >= 3:
                padded = list(combo) + [None] * (3 - size)
                exp.append((size, *padded, sup))
    assert got == sorted(exp)
    assert (3, "a", "b", "c", 3) in got  # the frequent triple


def test_frequent_itemsets_dedups_within_basket(spark):
    rows = [(0, "x"), (0, "x"), (1, "x")]
    d = spark.createDataFrame(rows, "basket_id long, item string")
    got = [tuple(r) for r in frequent_itemsets(d, 2).collect()]
    assert got == [(1, "x", None, None, 2)]


def test_association_rules_confidence_and_lift(spark):
    baskets = {
        0: {"a", "b"}, 1: {"a", "b"}, 2: {"a", "b"},
        3: {"a"}, 4: {"b"}, 5: {"b"},
    }
    rows = [(kk, i) for kk, s in baskets.items() for i in s]
    d = spark.createDataFrame(rows, "basket_id long, item string")
    from parconnect_spark.functions.itemsets import association_rules

    got = {
        (r["antecedent"], r["consequent"]): (
            r["support"], r["confidence"], r["lift"],
        )
        for r in association_rules(d, 3, min_confidence=0.5).collect()
    }
    # sup(a)=4, sup(b)=5, sup(ab)=3, N=6
    assert got[("a", "b")] == (3, 0.75, round(0.75 / (5 / 6), 6))
    assert got[("b", "a")] == (3, 0.6, round(0.6 / (4 / 6), 6))
