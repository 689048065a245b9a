"""Link prediction (plans/linkpred.py) vs a brute-force python oracle."""

import math

import pytest

from parconnect_spark.plans.linkpred import link_prediction


def linkpred_brute(und_pairs, cap=None):
    """und_pairs: undirected edge list (a, b). Returns {(u,v): (cn, aa)}."""
    adj = {}
    for a, b in und_pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    out = {}
    verts = sorted(adj)
    for i, u in enumerate(verts):
        for v in verts[i + 1 :]:
            if v in adj[u]:
                continue
            shared = [
                w
                for w in adj[u] & adj[v]
                if cap is None or len(adj[w]) <= cap
            ]
            if shared:
                out[(u, v)] = (
                    len(shared),
                    sum(1.0 / math.log(len(adj[w])) for w in shared),
                )
    return out


def _sym(pairs):
    return pairs + [(b, a) for a, b in pairs]


def _run(spark, und, cap):
    edges = spark.createDataFrame(_sym(und), "src long, dst long")
    got = {
        (r["u"], r["v"]): (r["cn"], r["aa"])
        for r in link_prediction(edges, max_wedge_degree=cap).collect()
    }
    exp = linkpred_brute(und, cap)
    assert set(got) == set(exp)
    for p in exp:
        assert got[p][0] == exp[p][0]
        assert abs(got[p][1] - exp[p][1]) < 1e-9
    return got


def test_linkpred_square_with_diagonal(spark):
    # 0-1-2-3-0 plus chord 0-2: candidate pair is (1, 3) via middles 0 and 2.
    und = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2)]
    got = _run(spark, und, cap=None)
    assert (1, 3) in got and got[(1, 3)][0] == 2


def test_linkpred_existing_edges_excluded(spark):
    # triangle: every pair adjacent -> no candidates at all.
    got = _run(spark, [(0, 1), (1, 2), (0, 2)], cap=None)
    assert got == {}


def test_linkpred_wedge_cap_excludes_hub_middles(spark):
    # star center 0 with 5 leaves: uncapped, all leaf pairs are candidates;
    # cap 4 silences the only middle (deg 5) entirely.
    star = [(0, i) for i in range(1, 6)]
    uncapped = _run(spark, star, cap=None)
    assert len(uncapped) == 10  # C(5,2) leaf pairs, cn=1 each
    capped = _run(spark, star, cap=4)
    assert capped == {}


def test_linkpred_mixed_cap(spark):
    # hub 0 (deg 4) capped out; low-degree middle 5 still scores (1, 2).
    und = [(0, 1), (0, 2), (0, 3), (0, 4), (5, 1), (5, 2)]
    got = _run(spark, und, cap=3)
    assert (1, 2) in got
    # hub-mediated pairs like (1, 3) must be absent under the cap
    assert (1, 3) not in got


@pytest.mark.slow
def test_linkpred_matches_brute_on_random_graphs(spark):
    from hypothesis import given, settings, strategies as st

    edge_lists = st.lists(
        st.tuples(st.integers(0, 11), st.integers(0, 11)),
        min_size=1,
        max_size=30,
    )

    @settings(max_examples=6, derandomize=True, deadline=None)
    @given(edge_lists, st.sampled_from([None, 3, 6]))
    def prop(pairs, cap):
        und = list({(min(a, b), max(a, b)) for a, b in pairs if a != b})
        if not und:
            return
        _run(spark, und, cap)

    prop()


def test_jaccard_and_pa_scores(spark):
    from parconnect_spark.operators.graph import symmetrize
    from parconnect_spark.plans.linkpred import link_prediction

    # square 0-1-2-3-0: each non-adjacent diagonal pair shares 2 neighbors
    und = [(0, 1), (1, 2), (2, 3), (3, 0)]
    e = symmetrize(spark.createDataFrame(und, "src long, dst long"))
    rows = {(r["u"], r["v"]): r for r in link_prediction(e, None).collect()}
    assert set(rows) == {(0, 2), (1, 3)}
    for r in rows.values():
        assert r["cn"] == 2
        # jaccard = 2 / (2 + 2 - 2) = 1.0; pa = 2*2
        assert abs(r["jaccard"] - 1.0) < 1e-12
        assert r["pa"] == 4


def test_jaccard_uses_true_degrees_under_cap(spark):
    from parconnect_spark.operators.graph import symmetrize
    from parconnect_spark.plans.linkpred import link_prediction

    # star hub 0 with leaves 1..5, plus a capped-out middle is impossible
    # here; instead verify pa/jaccard numbers on the star's leaf pairs.
    e = symmetrize(
        spark.createDataFrame([(0, i) for i in range(1, 6)], "src long, dst long")
    )
    rows = {(r["u"], r["v"]): r for r in link_prediction(e, None).collect()}
    for (u, v), r in rows.items():
        assert r["cn"] == 1 and r["pa"] == 1
        # deg(u)=deg(v)=1, union = 1+1-1
        assert abs(r["jaccard"] - 1.0) < 1e-12
