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
