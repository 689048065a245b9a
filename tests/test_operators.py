import pyspark.sql.functions as F

from parconnect_spark.functions.hashing import (
    _wang_hash_np,
    _wang_unhash_np,
    permute_ids,
    wang_hash,
    wang_unhash,
)
from parconnect_spark.operators.graph import (
    canonicalize,
    check_bidirectional,
    degree_histogram,
    degrees,
    filter_visited_edges,
    symmetrize,
    vertices,
)
from parconnect_spark.operators.relabel import dense_rank_relabel, relabel_edges

import numpy as np


def test_symmetrize_and_bidirectional(spark):
    e = spark.createDataFrame([(1, 2), (2, 3), (3, 3)], "src long, dst long")
    sym = symmetrize(e)
    rows = {(r["src"], r["dst"]) for r in sym.collect()}
    assert rows == {(1, 2), (2, 1), (2, 3), (3, 2)}  # self-loop dropped
    assert check_bidirectional(sym)
    assert not check_bidirectional(e.where("src != dst"))


def test_canonicalize(spark):
    e = spark.createDataFrame([(2, 1), (1, 2), (5, 9)], "src long, dst long")
    rows = {(r["src"], r["dst"]) for r in canonicalize(e).collect()}
    assert rows == {(1, 2), (5, 9)}


def test_degrees_and_histogram(spark):
    e = symmetrize(
        spark.createDataFrame([(1, 2), (1, 3), (1, 4), (2, 3)], "src long, dst long")
    )
    d = {r["v"]: r["degree"] for r in degrees(e).collect()}
    assert d == {1: 3, 2: 2, 3: 2, 4: 1}
    h = {r["degree"]: r["frequency"] for r in degree_histogram(e).collect()}
    assert h == {3: 1, 2: 2, 1: 1}


def test_filter_visited_edges(spark):
    e = symmetrize(spark.createDataFrame([(1, 2), (3, 4)], "src long, dst long"))
    visited = spark.createDataFrame([(1,), (2,)], "v long")
    left = {(r["src"], r["dst"]) for r in filter_visited_edges(e, visited).collect()}
    assert left == {(3, 4), (4, 3)}


def test_dense_rank_relabel_contiguous(spark):
    keys = spark.createDataFrame(
        [("b",), ("z",), ("a",), ("z",), ("m",)], "name string"
    )
    m = {r["name"]: r["id"] for r in dense_rank_relabel(keys).collect()}
    assert m == {"a": 0, "b": 1, "m": 2, "z": 3}


def test_relabel_edges(spark):
    e = spark.createDataFrame(
        [("x", "y"), ("y", "zz"), ("x", "zz")], "a string, b string"
    )
    out, id_map = relabel_edges(e, "a", "b")
    ids = {r["name"]: r["id"] for r in id_map.collect()}
    assert sorted(ids.values()) == [0, 1, 2]
    got = {(r["src"], r["dst"]) for r in out.collect()}
    exp = {(ids["x"], ids["y"]), (ids["y"], ids["zz"]), (ids["x"], ids["zz"])}
    assert got == exp


def test_wang_hash_bijective_numpy():
    xs = np.array([0, 1, 2, 12345, 2**40, 2**63 - 1, -1, -2**63], dtype=np.int64)
    h = _wang_hash_np(xs.view(np.uint64))
    back = _wang_unhash_np(h).view(np.int64)
    assert np.array_equal(back, xs)
    assert len(set(h.tolist())) == len(xs)


def test_wang_hash_udf_roundtrip(spark):
    df = spark.range(1000).select(F.col("id").alias("v"))
    rt = df.select("v", wang_unhash(wang_hash(F.col("v"))).alias("back"))
    assert rt.where("v != back").count() == 0
    # permutation keeps edge structure reversible
    e = spark.createDataFrame([(1, 2), (3, 4)], "src long, dst long")
    p = permute_ids(e)
    back = p.select(
        wang_unhash(F.col("src")).alias("src"), wang_unhash(F.col("dst")).alias("dst")
    )
    assert {(r["src"], r["dst"]) for r in back.collect()} == {(1, 2), (3, 4)}


def test_vertices(spark):
    e = symmetrize(spark.createDataFrame([(10, 20), (20, 30)], "src long, dst long"))
    assert {r["v"] for r in vertices(e).collect()} == {10, 20, 30}


def test_avg_neighbor_degree_vs_networkx(spark):
    import networkx as nx

    from parconnect_spark.operators.graph import avg_neighbor_degree, symmetrize
    from parconnect_spark.sources.generators import kronecker_edges

    edges = symmetrize(kronecker_edges(spark, scale=6, edgefactor=4))
    pairs = [(r["src"], r["dst"]) for r in edges.collect()]
    g = nx.Graph(pairs)
    exp = nx.average_neighbor_degree(g)
    got = {r["v"]: r["avg_nbr_deg"] for r in avg_neighbor_degree(edges).collect()}
    assert set(got) == set(exp)
    for v in exp:
        assert abs(got[v] - exp[v]) < 1e-9


def test_degree_assortativity_vs_networkx(spark):
    import networkx as nx

    from parconnect_spark.operators.graph import degree_assortativity, symmetrize
    from parconnect_spark.sources.generators import kronecker_edges

    edges = symmetrize(kronecker_edges(spark, scale=6, edgefactor=4))
    pairs = [(r["src"], r["dst"]) for r in edges.collect()]
    g = nx.Graph(pairs)
    exp = nx.degree_assortativity_coefficient(g)
    row = degree_assortativity(edges).collect()[0]
    assert abs(row["assortativity"] - exp) < 1e-9
    assert row["n_edges"] == 2 * g.number_of_edges()


def test_degree_assortativity_star_is_negative_one(spark):
    from parconnect_spark.operators.graph import degree_assortativity, symmetrize

    # a star plus one pendant chain gives degree variance on both sides;
    # pure star corr is undefined (zero variance on one side) in the
    # per-edge Pearson formulation only when all leaf degrees are equal
    # AND the hub appears on exactly one side — the symmetric table uses
    # both orientations, so a star yields exactly -1.
    e = symmetrize(
        spark.createDataFrame([(0, i) for i in range(1, 6)], "src long, dst long")
    )
    row = degree_assortativity(e).collect()[0]
    assert abs(row["assortativity"] - (-1.0)) < 1e-12


def test_contract_graph_hand_example(spark):
    from parconnect_spark.operators.graph import contract_graph, symmetrize

    # two triangles {0,1,2} and {10,11,12} bridged by 0-10 and 1-11, plus a
    # parallel-collapsing pendant pair 2-13, 2-14 where 13,14 live in a
    # third group.
    und = [
        (0, 1), (1, 2), (0, 2),
        (10, 11), (11, 12), (10, 12),
        (0, 10), (1, 11),
        (2, 13), (2, 14), (13, 14),
    ]
    edges = symmetrize(spark.createDataFrame(und, "src long, dst long"))
    groups = {0: 0, 1: 0, 2: 0, 10: 10, 11: 10, 12: 10, 13: 13, 14: 13}
    labels = spark.createDataFrame(
        list(groups.items()), "v long, label long"
    )
    got = {
        (r["ca"], r["cb"]): r["weight"]
        for r in contract_graph(edges, labels).collect()
    }
    # 0-10 and 1-11 collapse onto (0,10) with weight 2; 2-13 and 2-14 onto
    # (0,13) with weight 2; intra-group edges vanish.
    assert got == {(0, 10): 2, (0, 13): 2}


def test_contract_graph_vs_networkx_quotient(spark):
    import networkx as nx

    from parconnect_spark.operators.graph import contract_graph, symmetrize
    from parconnect_spark.sources.generators import kronecker_edges

    edges = symmetrize(kronecker_edges(spark, scale=6, edgefactor=4))
    pairs = [(r["src"], r["dst"]) for r in edges.collect()]
    g = nx.Graph(pairs)
    # deterministic grouping: vertex id mod 7
    labels = spark.createDataFrame(
        [(int(v), int(v) % 7) for v in g.nodes], "v long, label long"
    )
    exp = {}
    for u, v in g.edges:
        a, b = u % 7, v % 7
        if a != b:
            k = (min(a, b), max(a, b))
            exp[k] = exp.get(k, 0) + 1
    got = {
        (r["ca"], r["cb"]): r["weight"]
        for r in contract_graph(edges, labels).collect()
    }
    assert got == exp


def test_project_bipartite_weights_and_cap(spark):
    import pyspark.sql.functions as F

    from parconnect_spark.operators.graph import project_bipartite

    mem = spark.createDataFrame(
        [("g1", "x"), ("g1", "y"), ("g1", "z"),
         ("g2", "x"), ("g2", "y"), ("g2", "x"),  # duplicate membership dedupes
         ("g3", "w")],
        "g string, v string",
    )
    got = {(r["a"], r["b"]): r["weight"]
           for r in project_bipartite(mem, "g", "v").collect()}
    assert got == {("x", "y"): 2, ("x", "z"): 1, ("y", "z"): 1}
    capped = {(r["a"], r["b"]): r["weight"]
              for r in project_bipartite(mem, "g", "v", max_group_size=2).collect()}
    assert capped == {("x", "y"): 1}  # the 3-member group is excluded
    # ordering invariant: a < b on every row
    rows = project_bipartite(mem.orderBy(F.rand(3)), "g", "v").collect()
    assert all(r["a"] < r["b"] for r in rows)


def test_count_butterflies_bicliques(spark):
    from parconnect_spark.operators.graph import count_butterflies

    # K_{2,2}: items x,y share groups g1,g2 -> w(x,y)=2 -> C(2,2)=1 butterfly
    k22 = spark.createDataFrame(
        [("g1", "x"), ("g1", "y"), ("g2", "x"), ("g2", "y")],
        "g string, v string",
    )
    row = count_butterflies(k22, "g", "v").collect()[0]
    assert (row["n_pairs"], row["n_butterflies"]) == (1, 1)

    # K_{3,2}: 3 groups x 2 items fully connected -> w=3 -> C(3,2)=3
    k32 = spark.createDataFrame(
        [(f"g{i}", v) for i in range(3) for v in ("x", "y")],
        "g string, v string",
    )
    row = count_butterflies(k32, "g", "v").collect()[0]
    assert (row["n_pairs"], row["n_butterflies"]) == (1, 3)


def test_count_butterflies_cap_and_empty(spark):
    from parconnect_spark.operators.graph import count_butterflies

    mem = spark.createDataFrame(
        [("g1", "x"), ("g1", "y"), ("g1", "z"),
         ("g2", "x"), ("g2", "y")],
        "g string, v string",
    )
    # uncapped: w(x,y)=2 -> 1 butterfly; capped at 2 members the 3-member
    # group drops -> w(x,y)=1 -> 0 butterflies (but the pair row remains)
    full = count_butterflies(mem, "g", "v").collect()[0]
    assert (full["n_pairs"], full["n_butterflies"]) == (3, 1)
    capped = count_butterflies(mem, "g", "v", max_group_size=2).collect()[0]
    assert (capped["n_pairs"], capped["n_butterflies"]) == (1, 0)
    # empty membership: the coalesce guard yields a (0, 0) row
    empty = count_butterflies(
        spark.createDataFrame([], "g string, v string"), "g", "v"
    ).collect()[0]
    assert (empty["n_pairs"], empty["n_butterflies"]) == (0, 0)


def test_count_butterflies_vs_bruteforce(spark):
    from itertools import combinations

    from parconnect_spark.operators.graph import count_butterflies

    # deterministic pseudo-random membership table, brute-force oracle
    mem = [
        (f"g{(h := (i * 2654435761) % (1 << 32)) % 7}", f"v{h % 11}")
        for i in range(60)
    ]
    df = spark.createDataFrame(mem, "g string, v string").dropDuplicates()
    groups = {}
    for g, v in set(mem):
        groups.setdefault(g, set()).add(v)
    count = 0
    pairs = set()
    items = sorted({v for _, v in mem})
    for a, b in combinations(items, 2):
        w = sum(1 for g in groups.values() if a in g and b in g)
        if w:
            pairs.add((a, b))
            count += w * (w - 1) // 2
    row = count_butterflies(df, "g", "v").collect()[0]
    assert (row["n_pairs"], row["n_butterflies"]) == (len(pairs), count)


def test_reciprocity_hand_graph(spark):
    from parconnect_spark.operators.graph import reciprocity

    # 2-cycle x<->y (2 reciprocal edges) + one-way y->z; self-loop ignored
    d = spark.createDataFrame(
        [("x", "y"), ("y", "x"), ("y", "z"), ("w", "w"), ("x", "y")],
        "a string, b string",
    )
    row = reciprocity(d).collect()[0]
    assert (row["n_edges"], row["n_reciprocal"]) == (3, 2)
    assert row["reciprocity"] == round(2.0 / 3.0, 6)


def test_reciprocity_extremes_and_empty(spark):
    from parconnect_spark.operators.graph import reciprocity

    sym = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("b", "c"), ("c", "b")], "a string, b string"
    )
    assert reciprocity(sym).collect()[0]["reciprocity"] == 1.0
    oneway = spark.createDataFrame(
        [("a", "b"), ("b", "c")], "a string, b string"
    )
    assert reciprocity(oneway).collect()[0]["reciprocity"] == 0.0
    empty = spark.createDataFrame([], "a string, b string")
    row = reciprocity(empty).collect()[0]
    assert (row["n_edges"], row["n_reciprocal"], row["reciprocity"]) == (
        0,
        0,
        0.0,
    )


def test_reciprocity_vs_networkx(spark):
    import networkx as nx

    from parconnect_spark.operators.graph import reciprocity

    pairs = [
        (f"v{(i * 37) % 23}", f"v{(i * 53 + 7) % 23}") for i in range(150)
    ]
    d = spark.createDataFrame(pairs, "a string, b string").where("a <> b")
    g = nx.DiGraph((a, b) for a, b in pairs if a != b)
    row = reciprocity(d).collect()[0]
    assert abs(row["reciprocity"] - round(nx.reciprocity(g), 6)) < 1e-9


def test_rich_club_vs_definition(spark):
    import networkx as nx

    from parconnect_spark.operators.graph import rich_club, symmetrize
    from parconnect_spark.sources.generators import kronecker_edges

    edges = symmetrize(
        kronecker_edges(spark, scale=6, edgefactor=4).where("src != dst")
    )
    pairs = [(r["src"], r["dst"]) for r in edges.collect()]
    g = nx.Graph(pairs)
    degs = dict(g.degree())

    got = {r["k"]: (r["n_k"], r["e_k"], r["phi"]) for r in rich_club(edges).collect()}
    assert got, "rich club table empty on a Kronecker graph"
    for k, (n_k, e_k, phi) in got.items():
        rich = [v for v, d in degs.items() if d > k]
        sub = g.subgraph(rich)
        assert n_k == len(rich)
        assert e_k == sub.number_of_edges()
        assert abs(phi - round(2 * e_k / (n_k * (n_k - 1)), 6)) < 1e-12
    # every observed degree value with >= 2 richer vertices is reported
    for d in set(degs.values()):
        n = sum(1 for x in degs.values() if x > d)
        assert (d in got) == (n >= 2)


def test_rich_club_small_graph_and_reuse(spark):
    from parconnect_spark.operators.graph import rich_club, symmetrize

    # 4-clique plus a pendant: at k=1 the rich set is the clique (+0 more),
    # phi(1) = density of K4 = 1.0
    base = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5)]
    edges = symmetrize(spark.createDataFrame(base, "src long, dst long"))
    got = {r["k"]: (r["n_k"], r["e_k"], r["phi"]) for r in rich_club(edges).collect()}
    assert got[1] == (4, 6, 1.0)
    # degree aggregate appears three times in the plan; the shuffle must be
    # reused, not recomputed (the documented no-persist justification).
    # AQE only materializes reuse in the FINAL plan, so run the query
    # first and inspect the same frame's executed plan.
    df = rich_club(edges)
    df.collect()
    assert "ReusedExchange" in df._jdf.queryExecution().executedPlan().toString()


def test_snapshot_diff_matches_set_algebra(spark):
    from parconnect_spark.operators.graph import snapshot_diff

    tagged = [
        # window 1: {xy, yz}; window 2: {xy, zq}; window 3: {zq}
        ("2024-01-01|x", "2024-01-01|y"),
        ("2024-01-01|y", "2024-01-01|z"),
        ("2024-01-08|x", "2024-01-08|y"),
        ("2024-01-08|z", "2024-01-08|q"),
        ("2024-01-08|z", "2024-01-08|q"),  # duplicate row — distinct'd
        ("2024-01-15|z", "2024-01-15|q"),
    ]
    df = spark.createDataFrame(tagged, "a string, b string")
    got = {
        (r["w_from"], r["w_to"]): (r["n_added"], r["n_removed"], r["n_kept"])
        for r in snapshot_diff(df).collect()
    }
    assert got == {
        ("2024-01-01", "2024-01-08"): (1, 1, 1),
        ("2024-01-08", "2024-01-15"): (0, 1, 1),
    }


def test_snapshot_diff_single_window_empty(spark):
    from parconnect_spark.operators.graph import snapshot_diff

    df = spark.createDataFrame([("w1|a", "w1|b")], "a string, b string")
    assert snapshot_diff(df).count() == 0


def test_conversation_features_hand_fixture(spark):
    import datetime as dt

    from parconnect_spark.operators.derive import conversation_features

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def ts(sec):
        return t0 + dt.timedelta(seconds=sec)

    rows = [
        # conv A: user(4ch) -> assistant(8ch) -> tool(2ch) -> assistant(6ch)
        ("A", 0, "user", "abcd", None, ts(0)),
        ("A", 1, "assistant", "abcdefgh", None, ts(10)),
        ("A", 2, "assistant", "xy", "search", ts(70)),  # tool turn
        ("A", 3, "assistant", "abcdef", None, ts(75)),
        # conv B: single user turn
        ("B", 0, "user", "hello", None, ts(0)),
    ]
    d = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    got = {r["conv_id"]: r.asDict() for r in conversation_features(d).collect()}
    a = got["A"]
    assert a["n_turns"] == 4 and a["n_user"] == 1
    assert a["n_assistant"] == 2 and a["n_tool"] == 1
    assert a["n_distinct_tools"] == 1
    assert a["total_chars"] == 4 + 8 + 2 + 6
    assert a["avg_turn_chars"] == 5.0
    assert a["assistant_user_char_ratio"] == round((8 + 6) / 4, 6)
    assert a["max_gap_seconds"] == 60
    b = got["B"]
    assert b["n_turns"] == 1 and b["n_tool"] == 0
    # assistant chars 0 over user chars 5 -> 0.0 (NULL only when the
    # DENOMINATOR — user chars — is zero)
    assert b["assistant_user_char_ratio"] == 0.0
    assert b["max_gap_seconds"] is None


def test_conversation_paths_order_and_counts(spark):
    import datetime as dt

    from parconnect_spark.operators.derive import conversation_paths

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    # two convs with the same shape, one different
    for cid in ("A", "B"):
        rows += [
            (cid, 0, "user", "hi", None, t0),
            (cid, 1, "assistant", "ok", None, t0),
            (cid, 2, "assistant", "x", "search", t0),
        ]
    rows += [("C", 0, "user", "hello", None, t0)]
    d = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    got = [tuple(r) for r in conversation_paths(d).collect()]
    assert got == [
        ("r:user>r:assistant>t:search", 2, 3),
        ("r:user", 1, 1),
    ]
    # partition invariance of the ordered path
    got2 = [tuple(r) for r in conversation_paths(d.repartition(7)).collect()]
    assert got2 == got


def test_transition_latency_exact_percentiles(spark):
    import datetime as dt

    from parconnect_spark.operators.derive import transition_latency

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    # 20 conversations user->assistant with gaps 1..20 seconds
    for c in range(20):
        rows.append((f"c{c}", 0, "user", "q", None, t0))
        rows.append(
            (f"c{c}", 1, "assistant", "a", None,
             t0 + dt.timedelta(seconds=c + 1))
        )
    d = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    r = transition_latency(d).collect()
    assert len(r) == 1
    row = r[0]
    # n=20; p50 = 10th smallest = 10; p95 = ceil(0.95*20)=19th = 19
    assert (row["a"], row["b"], row["n"]) == ("r:user", "r:assistant", 20)
    assert row["p50_s"] == 10 and row["p95_s"] == 19


def test_transition_entropy_known_chain(spark):
    import datetime as dt
    import math

    from parconnect_spark.operators.derive import transition_entropy

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    # user -> assistant always (H=0); assistant -> {user, tool} 50/50 (H=ln 2)
    for c in range(2):
        rows += [
            (f"c{c}", 0, "user", "q", None, t0),
            (f"c{c}", 1, "assistant", "a", None, t0),
        ]
    rows += [("c0", 2, "user", "q2", None, t0),
             ("c1", 2, "assistant", "x", "search", t0)]
    d = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    got = {r["entity"]: (r["n_out"], r["entropy"]) for r in transition_entropy(d).collect()}
    assert got["r:user"] == (2, 0.0) or got["r:user"] == (2, -0.0)
    assert got["r:assistant"][0] == 2
    assert got["r:assistant"][1] == round(math.log(2), 6)
