"""Property-based tests (hypothesis) — beyond the reference's fixture-only
strategy (SURVEY.md §5: the reference has no property testing).

Two tiers:

* pure-kernel properties (no Spark jobs per example, hundreds of examples):
  Wang-hash bijectivity, the numpy union-find kernel vs networkx, codec
  roundtrips;
* engine properties (Spark fixpoint per example, few examples): all CC
  algorithms agree with networkx's components — per-vertex min-id labels —
  on arbitrary small graphs, regardless of duplicate edges, self-loops,
  orientation, or input order.

All settings are derandomized: a CI failure is reproducible, never flaky.
"""

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st

from parconnect_spark.functions.hashing import _wang_hash_np, _wang_unhash_np
from parconnect_spark.functions.multimodal import (
    decode_image,
    decode_wav,
    encode_ppm,
    encode_wav,
)
from parconnect_spark.plans.csr import _np_union_find_kernel

# ---------------------------------------------------------------------------
# pure-kernel tier
# ---------------------------------------------------------------------------

i64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)


@settings(max_examples=200, derandomize=True, deadline=None)
@given(st.lists(i64, min_size=1, max_size=64))
def test_wang_hash_bijective(xs):
    """hash_64i(hash_64(x)) == x for arbitrary 64-bit values, and hash_64
    is injective on the sample (invertible_hash.hpp:19-66 semantics)."""
    a = np.array(xs, dtype=np.int64).view(np.uint64)
    h = _wang_hash_np(a)
    assert np.array_equal(_wang_unhash_np(h), a)
    assert len(np.unique(h)) == len(np.unique(a))


def _nx_min_labels(edges, vertices):
    import networkx as nx

    g = nx.Graph()
    g.add_nodes_from(vertices)
    g.add_edges_from((u, v) for u, v in edges if u != v)
    return {v: min(comp) for comp in nx.connected_components(g) for v in comp}


edge_lists = st.lists(
    st.tuples(st.integers(0, 24), st.integers(0, 24)), min_size=1, max_size=60
)


@settings(max_examples=150, derandomize=True, deadline=None)
@given(edge_lists)
def test_np_union_find_kernel_matches_networkx(edges):
    """The Arrow union-find kernel (fed the whole graph as one partition)
    computes exactly networkx's components, labeled by min vertex id."""
    pdf = pd.DataFrame(
        {
            "src": np.array([e[0] for e in edges], dtype=np.int64),
            "dst": np.array([e[1] for e in edges], dtype=np.int64),
        }
    )
    out = list(_np_union_find_kernel(iter([pdf])))
    got = {}
    verts = set(pdf["src"]) | set(pdf["dst"])
    for v in verts:
        got[v] = v  # roots (and untouched vertices) label themselves
    if out:
        for s, d in zip(out[0]["src"], out[0]["dst"]):
            got[int(s)] = int(d)
    assert got == _nx_min_labels(edges, verts)


@settings(max_examples=60, derandomize=True, deadline=None)
@given(
    st.integers(1, 8),
    st.integers(1, 8),
    st.integers(0, 2**32 - 1),
)
def test_ppm_roundtrip(w, h, seed):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert np.array_equal(decode_image(encode_ppm(img)), img)


@settings(max_examples=60, derandomize=True, deadline=None)
@given(st.integers(1, 512), st.integers(0, 2**32 - 1))
def test_wav_roundtrip(n, seed):
    rng = np.random.default_rng(seed)
    samples = rng.uniform(-1.0, 1.0, size=n).astype(np.float32)
    back, rate = decode_wav(encode_wav(samples, 16000))
    assert rate == 16000 and len(back) == n
    # PCM16 quantization bound: encode truncates (astype) at x32767 scale,
    # decode divides by 32768 — worst case |x|/32768 + 1/32767 < 2.01/32768
    assert np.max(np.abs(back - np.clip(samples, -1.0, 1.0))) <= 2.01 / 32768.0


# ---------------------------------------------------------------------------
# engine tier — Spark fixpoint per example, so few (derandomized) examples
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("algorithm", ["two_phase", "min_label", "local_contract"])
@pytest.mark.slow
def test_cc_matches_networkx_on_random_graphs(spark, algorithm):
    """Every CC algorithm reproduces networkx per-vertex min-id membership
    on arbitrary small graphs — duplicates, self-loops, any orientation,
    any row order. Examples drawn inside one test body (one derandomized
    hypothesis run per algorithm keeps Spark-session startup out of the
    per-example cost)."""
    from parconnect_spark.plans.connectivity import connected_components

    @settings(max_examples=6, derandomize=True, deadline=None)
    @given(edge_lists)
    def check(edges):
        df = spark.createDataFrame(
            [(int(a), int(b)) for a, b in edges], "src long, dst long"
        )
        labels = connected_components(df, algorithm=algorithm).labels
        got = {r["v"]: r["label"] for r in labels.collect()}
        verts = {v for e in edges for v in e}
        assert got == _nx_min_labels(edges, verts)

    check()


@pytest.mark.slow
def test_weighted_sample_matches_python_race_on_arbitrary_weights(spark):
    """weighted_sample_k's selection equals the documented pure-Python
    exponential race for ARBITRARY positive integer weights, ids, k and
    salt — the engine-independence claim as a property, not an example."""
    import hashlib
    import math

    from parconnect_spark.functions.sampling import weighted_sample_k

    @settings(max_examples=8, derandomize=True, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=10_000),
                st.integers(min_value=1, max_value=10**6),
            ),
            min_size=1,
            max_size=60,
            unique_by=lambda t: t[0],
        ),
        st.integers(min_value=1, max_value=10),
        st.text(alphabet="abc", max_size=3),
    )
    def check(rows, k, salt):
        df = spark.createDataFrame(rows, "doc_id long, w long")
        got = sorted(
            r["doc_id"]
            for r in weighted_sample_k(df, k, "w", salt=salt).collect()
        )

        def pri(i, w):
            h = int(hashlib.md5(f"{i}:{salt}".encode()).hexdigest()[:13], 16)
            u = (h + 0.5) / 2**52
            return (round(-math.log(u) / w * 1e6), i)

        want = sorted(
            i for i, w in sorted(rows, key=lambda t: pri(*t))[:k]
        )
        assert got == want

    check()


@pytest.mark.slow
def test_group_quantile_filter_property(spark):
    """group_quantile_filter keeps, per group, exactly the smallest
    score-closed top set with >= floor(n*q) rows — for arbitrary groups,
    scores, and rational q."""
    import collections

    from parconnect_spark.functions.sampling import group_quantile_filter

    @settings(max_examples=8, derandomize=True, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=3),
                st.integers(min_value=0, max_value=9),
            ),
            min_size=1,
            max_size=80,
        ),
        st.integers(min_value=0, max_value=4),
        st.integers(min_value=1, max_value=4),
    )
    def check(pairs, q_num, q_den):
        if q_num > q_den:
            q_num = q_den
        rows = [(f"g{g}", i, s) for i, (g, s) in enumerate(pairs)]
        df = spark.createDataFrame(rows, "grp string, rid long, score long")
        got = collections.defaultdict(set)
        for r in group_quantile_filter(df, "grp", "score", q_num, q_den).collect():
            got[r["grp"]].add(r["rid"])

        by_g = collections.defaultdict(list)
        for g, i, s in rows:
            by_g[g].append((s, i))
        for g, items in by_g.items():
            needed = len(items) * q_num // q_den
            if needed == 0:
                assert got.get(g, set()) == set()
                continue
            scores = sorted({s for s, _ in items}, reverse=True)
            cge, thr = 0, None
            for s in scores:
                cge += sum(1 for x, _ in items if x == s)
                if cge >= needed:
                    thr = s
                    break
            assert got[g] == {i for s, i in items if s >= thr}

    check()
