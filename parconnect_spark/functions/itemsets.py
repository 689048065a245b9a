"""Frequent-itemset mining (Apriori to size 3) — market-basket analysis
over conversation/tool baskets (SURVEY.md scope extension; the classic
companion to the PMI collocations and the one-mode co-occurrence
projection, which stop at pairs).

The algorithm IS the scale argument: support counting is always a
join-then-aggregate, and the anti-monotone prune (every subset of a
frequent set is frequent) is what keeps candidate generation from going
combinatorial — L2 pairs only form between FREQUENT-1 items (baskets
are semi-join-pruned to frequent items first, the classic transaction
trim), and C3 triples must have all three of their member pairs in L2
before any support is counted. Per-basket fan-out is bounded by
(frequent items in that basket)², not basket size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from parconnect_spark.cache import scoped_persist


def frequent_itemsets(
    baskets: DataFrame,
    min_support: int,
    basket_col: str = "basket_id",
    item_col: str = "item",
) -> DataFrame:
    """Frequent itemsets of size 1–3 at absolute ``min_support``.
    ``baskets``: (basket_id, item) rows, duplicates tolerated (one
    distinct pass first). Returns (size, i1, i2, i3, support) with
    items sorted ascending inside a set and i2/i3 NULL below the size."""
    b = scoped_persist(
        baskets.select(
            F.col(basket_col).alias("bid"), F.col(item_col).alias("item")
        ).distinct()
    )
    l1 = (
        b.groupBy("item")
        .agg(F.count(F.lit(1)).alias("support"))
        .where(F.col("support") >= min_support)
    )
    l1 = scoped_persist(l1)
    # transaction trim: only frequent items can appear in larger sets
    bf = scoped_persist(b.join(l1.select("item"), "item", "left_semi"))
    pa = bf.select("bid", F.col("item").alias("i1"))
    pb = bf.select("bid", F.col("item").alias("i2"))
    l2 = (
        pa.join(pb, "bid")
        .where(F.col("i1") < F.col("i2"))
        .groupBy("i1", "i2")
        .agg(F.count(F.lit(1)).alias("support"))
        .where(F.col("support") >= min_support)
    )
    l2 = scoped_persist(l2)
    # C3 = join two L2 pairs sharing the first item, prune by the third
    # subset pair (full anti-monotone prune before any counting)
    c3 = (
        l2.select("i1", "i2")
        .join(
            l2.select(F.col("i1").alias("i1b"), F.col("i2").alias("i3")),
            F.col("i1") == F.col("i1b"),
        )
        .where(F.col("i2") < F.col("i3"))
        .select("i1", "i2", "i3")
        .join(
            l2.select(
                F.col("i1").alias("i2"), F.col("i2").alias("i3")
            ),
            ["i2", "i3"],
            "left_semi",
        )
    )
    t1 = bf.select("bid", F.col("item").alias("i1"))
    t2 = bf.select("bid", F.col("item").alias("i2"))
    t3 = bf.select("bid", F.col("item").alias("i3"))
    l3 = (
        c3.join(t1, "i1")
        .join(t2, ["bid", "i2"])
        .join(t3, ["bid", "i3"])
        .groupBy("i1", "i2", "i3")
        .agg(F.count(F.lit(1)).alias("support"))
        .where(F.col("support") >= min_support)
    )
    out1 = l1.select(
        F.lit(1).alias("size"),
        F.col("item").alias("i1"),
        F.lit(None).cast("string").alias("i2"),
        F.lit(None).cast("string").alias("i3"),
        "support",
    )
    out2 = l2.select(
        F.lit(2).alias("size"),
        "i1",
        "i2",
        F.lit(None).cast("string").alias("i3"),
        "support",
    )
    out3 = l3.select(F.lit(3).alias("size"), "i1", "i2", "i3", "support")
    return out1.unionByName(out2).unionByName(out3)


def association_rules(
    baskets: DataFrame,
    min_support: int,
    min_confidence: float = 0.5,
    basket_col: str = "basket_id",
    item_col: str = "item",
) -> DataFrame:
    """Pairwise association rules a → b from the frequent-2 itemsets:
    confidence = sup(a,b)/sup(a), lift = confidence / (sup(b)/N). Both
    directions of every frequent pair are scored (a→b and b→a have
    different confidences); rules below ``min_confidence`` drop. One
    frequent_itemsets pass plus two broadcast-size joins against the
    L1 support table — nothing new shuffles. Returns
    (antecedent, consequent, support, confidence, lift) at 6dp."""
    fi = frequent_itemsets(baskets, min_support, basket_col, item_col)
    fi = fi.persist()
    n = (
        baskets.select(F.col(basket_col).alias("bid"))
        .distinct()
        .count()
    )
    l1 = fi.where("size = 1").select(
        F.col("i1").alias("item"), F.col("support").alias("s1")
    )
    l2 = fi.where("size = 2").select("i1", "i2", "support")
    both = l2.unionByName(
        l2.select(
            F.col("i2").alias("i1"), F.col("i1").alias("i2"), "support"
        )
    )
    out = (
        both.join(
            F.broadcast(l1.withColumnRenamed("item", "i1")), "i1"
        )
        .join(
            F.broadcast(
                l1.select(
                    F.col("item").alias("i2"), F.col("s1").alias("s2")
                )
            ),
            "i2",
        )
        .select(
            F.col("i1").alias("antecedent"),
            F.col("i2").alias("consequent"),
            "support",
            F.round(F.col("support") / F.col("s1"), 6).alias("confidence"),
            F.round(
                (F.col("support") / F.col("s1")) / (F.col("s2") / F.lit(n)),
                6,
            ).alias("lift"),
        )
        .where(F.col("confidence") >= min_confidence)
    )
    res = out.localCheckpoint()
    fi.unpersist()
    return res
