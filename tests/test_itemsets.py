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
