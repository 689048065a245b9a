"""Bit-parity port of the graph500 Kronecker generator the reference uses.

parconnect generates its test graphs through the vendored graph500 reference
generator with fixed seeds {1,2} and initiator (.57,.19,.19,.05)
(/root/reference/src/graphGen/graph500/graph500Gen.hpp:74-99 →
/root/reference/ext/graph500-gen/graph_generator.h). This module re-creates
that EDGE STREAM bit-for-bit (verified against the compiled reference
generator in tests/fixtures/g500_scale*_ef16.txt.gz), so component counts
and membership are comparable graph-for-graph, satisfying the north_star's
"match parconnect's outputs on its Kronecker test graphs".

Algorithm (public: graph500 reference code, Boost-licensed; Hoermann's BTRD
binomial, L'Ecuyer's MRG):

* RNG — a 5-term MRG over GF(2^31-1): z1' = 107374182·z1 + 104480·z5
  (splittable_mrg.h:6395-6402); random doubles combine two successive
  31-bit outputs with fixed IEEE constants. Skip-ahead = applying the
  companion matrix power A^e to the state (the reference's precomputed
  byte tables ARE A^(v·256^k); here the powers A^(2^k) are derived at
  import from the recurrence itself — same group element, exact
  arithmetic, no table to copy).
* Recursive block splitting — each adjacency sub-square derives its RNG
  state from its block coordinates alone (graph_generator.h:215-344:
  mrg_skip by (base_src+N)/nverts · 2^64 + (base_tgt+N)/nverts), splits
  its edge count into 4 quadrants by exact BTRD binomial draws, recursing;
  single edges walk the remaining levels drawing one double per level
  (make_one_edge), with clip-and-flip on diagonal blocks (UNDIRECTED).
* Windowing — the stream is identical for any rank decomposition (the
  reference windows by [my_first_edge, my_last_edge); verified: 1/3/5/7
  simulated ranks give byte-identical concatenated output). Spark tasks
  therefore each generate an edge-index window independently —
  embarrassingly parallel, deterministic at any parallelism.

Self-loops and duplicate edges are kept, as configured by the reference
build (GRAPHGEN_KEEP_SELF_LOOPS / KEEP_DUPLICATES, graph_generator.h:71-75).
The downstream CC plan ignores self-loops and dedups internally.

This is the parity/test-scale generator (per-edge Python in the window
kernel, Arrow-batched); the counter-based RMAT in sources/generators.py
remains the bulk-throughput path for synthetic load generation.
"""

from __future__ import annotations

import math
from functools import lru_cache

MOD = 2147483647  # 2^31 - 1
_A_COEF = 107374182
_Y_COEF = 104480

INITIATOR = (0.57, 0.19, 0.19, 0.05)  # graph500Gen.hpp:110

# exact IEEE constants from mrg_get_double_orig (splittable_mrg.h:6400-6403)
_D1 = float(".000000000465661287524579692")  # (2^31-1)^-1
_D2 = float(".0000000000000000002168404346990492787")  # (2^31-1)^-2

# companion matrix of z1' = a·z1 + y·z5 acting on (z1..z5)
_A = (
    (_A_COEF, 0, 0, 0, _Y_COEF),
    (1, 0, 0, 0, 0),
    (0, 1, 0, 0, 0),
    (0, 0, 1, 0, 0),
    (0, 0, 0, 1, 0),
)


def _mat_mul(m, n):
    return tuple(
        tuple(sum(m[i][k] * n[k][j] for k in range(5)) % MOD for j in range(5))
        for i in range(5)
    )


@lru_cache(maxsize=256)
def _a_pow2(k: int):
    """A^(2^k) mod (2^31-1), derived by repeated squaring."""
    if k == 0:
        return _A
    m = _a_pow2(k - 1)
    return _mat_mul(m, m)


def make_mrg_seed(userseed1: int = 1, userseed2: int = 2) -> tuple[int, ...]:
    """utils.h:84-90 — spread two 64-bit seeds into five MRG state words."""
    return (
        (userseed1 & 0x3FFFFFFF) + 1,
        ((userseed1 >> 30) & 0x3FFFFFFF) + 1,
        (userseed2 & 0x3FFFFFFF) + 1,
        ((userseed2 >> 30) & 0x3FFFFFFF) + 1,
        ((userseed2 >> 60) << 4) + (userseed1 >> 60) + 1,
    )


class MrgState:
    __slots__ = ("z",)

    def __init__(self, z):
        self.z = list(z)

    def copy(self) -> "MrgState":
        return MrgState(self.z)

    def skip(self, exponent: int) -> None:
        """state ← A^exponent · state (mrg_skip semantics; exponent =
        high·2^128 + middle·2^64 + low)."""
        z = self.z
        k = 0
        while exponent:
            if exponent & 1:
                m = _a_pow2(k)
                z = [
                    sum(m[i][j] * z[j] for j in range(5)) % MOD for i in range(5)
                ]
            exponent >>= 1
            k += 1
        self.z = z

    def get_uint(self) -> int:
        """mrg_get_uint_orig: step, then return z1."""
        z = self.z
        new = (_A_COEF * z[0] + _Y_COEF * z[4]) % MOD
        self.z = [new, z[0], z[1], z[2], z[3]]
        return new

    def get_double(self) -> float:
        """mrg_get_double_orig: two 31-bit outputs, fixed IEEE combine."""
        u1 = self.get_uint()
        u2 = self.get_uint()
        return u1 * _D1 + u2 * _D2


# --- BTRD binomial (btrd_binomial_distribution.h; Hoermann's algorithm,
# ported draw-for-draw so the RNG stream position matches exactly) ---------

_FC_VALUES = (
    0.08106146679532726, 0.04134069595540929, 0.02767792568499834,
    0.02079067210376509, 0.01664469118982119, 0.01387612882307075,
    0.01189670994589177, 0.01041126526197209, 0.009255462182712733,
    0.008330563433362871,
)


def _f_c(k: int) -> float:
    if k <= 9:
        return _FC_VALUES[k]
    r = 1.0 / (k + 1)
    return (1.0 / 12 - (1.0 / 360 - 1.0 / 1260 * r * r) * r * r) * r


def btrd_binomial(n_orig: int, p: float, state: MrgState) -> int:
    if p == 0.0:
        return 0
    if p > 0.5:
        return n_orig - btrd_binomial(n_orig, 1.0 - p, state)
    if n_orig * p < 10:
        # waiting-time (geometric) algorithm, with the reference's series
        # approximation of ln(1-p)
        r = 1.0 - 2.0 / p
        rr = 1.0 / r
        rr2 = rr * rr
        rr4 = rr2 * rr2
        rr6 = rr4 * rr2
        log_1mp = 2.0 * rr * (1 + rr2 / 3.0 + rr4 / 5.0 + rr6 / 7.0)
        recip = 1.0 / log_1mp
        x = 0
        total = 0
        while True:
            total += int(math.ceil(math.log(state.get_double()) * recip))
            x += 1
            if total > n_orig:
                break
        return x - 1
    if n_orig > 1000000000:
        return btrd_binomial(1000000000, p, state) + btrd_binomial(
            n_orig - 1000000000, p, state
        )
    n = n_orig
    m = int(math.floor((n + 1) * p))
    r = p / (1.0 - p)
    nr = (n + 1) * r
    npq = n * p * (1.0 - p)
    sqrt_npq = math.sqrt(npq)
    b = 1.15 + 2.53 * sqrt_npq
    a = -0.0873 + 0.0248 * b + 0.01 * p
    c = n * p + 0.5
    alpha = (2.83 + 5.1 / b) * sqrt_npq
    v_r = 0.92 - 4.2 / b
    u_rv_r = 0.86 * v_r
    while True:
        v = state.get_double()
        if v <= u_rv_r:
            u = v / v_r - 0.43
            return int(math.floor((2 * a / (0.5 + abs(u)) + b) * u + c))
        temp = state.get_double()
        if v >= v_r:
            u = temp - 0.5
        else:
            u = v / v_r - 0.93
            u = (0.5 if u > 0.0 else -0.5 if u < 0.0 else 0.0) - u
            v = v_r * temp
        us = 0.5 - abs(u)
        k = int(math.floor((2 * a / us + b) * u + c))
        if k < 0 or k > n:
            continue
        v *= alpha / (a / (us * us) + b)
        km = k - m if k >= m else m - k
        if km > 15:
            # km/3 is C int division — preserved
            rho = (km / npq) * (((km // 3 + 0.625) * km + 1.0 / 6) / npq + 0.5)
            t = -km * km / (2 * npq)
            v = math.log(v)
            if v < t - rho:
                return k
            if v > t + rho:
                continue
            nm = n - m + 1
            h = (m + 0.5) * math.log((m + 1) / (r * nm)) + _f_c(m) + _f_c(n - m)
            nk = n - k + 1
            threshold = (
                h
                + (n + 1) * math.log(nm / nk)
                + (k + 0.5) * math.log(nk * r / (k + 1))
                - _f_c(k)
                - _f_c(n - k)
            )
            if v <= threshold:
                return k
        else:
            f = 1.0
            if m < k:
                for i in range(m, k):
                    f *= nr / i - r
            elif m > k:
                for i in range(k, m):
                    v *= nr / i + r
            if v <= f:
                return k


# --- Kronecker recursion (graph_generator.h:100-344) ----------------------


def _nway_bernoulli(initiator, state: MrgState) -> int:
    rnd = state.get_double()
    for j in range(3):
        ini = initiator[j]
        if rnd < ini:
            return j
        rnd -= ini
    return 3


def _square_counts(num_edges: int, initiator, state: MrgState):
    counts = [0, 0, 0, 0]
    if num_edges <= 20:
        for _ in range(num_edges):
            rnd = state.get_double()
            for j in range(4):
                ini = initiator[j]
                if rnd < ini or j == 3:
                    counts[j] += 1
                    break
                rnd -= ini
    else:
        left = num_edges
        divisor = 1.0
        for i in range(3):
            counts[i] = btrd_binomial(left, initiator[i] / divisor, state)
            left -= counts[i]
            divisor -= initiator[i]
        counts[3] = left
    return counts


def _make_one_edge(base_src, base_tgt, nverts, state, initiator):
    while nverts > 1:
        square = _nway_bernoulli(initiator, state)
        so, to = square >> 1, square & 1
        if base_src == base_tgt and so > to:  # clip-and-flip on the diagonal
            so, to = to, so
        nverts >>= 1
        base_src += nverts * so
        base_tgt += nverts * to
    return base_src, base_tgt


def generate_window(
    scale: int,
    num_edges: int,
    first_edge: int,
    last_edge: int,
    seed1: int = 1,
    seed2: int = 2,
    initiator=INITIATOR,
) -> list[tuple[int, int]]:
    """Edges [first_edge, last_edge) of the deterministic graph500 stream
    for (scale, num_edges, seeds) — identical for any window decomposition."""
    nverts = 1 << scale
    seed = make_mrg_seed(seed1, seed2)
    out: list[tuple[int, int]] = [None] * (last_edge - first_edge)  # type: ignore

    def rec(fei, n_e, nv, base_src, base_tgt):
        state = MrgState(seed)
        state.skip(
            (((base_src + nverts) // nv) << 64) | ((base_tgt + nverts) // nv)
        )
        if nv == 1:
            for i in range(n_e):
                idx = fei + i
                if first_edge <= idx < last_edge:
                    out[idx - first_edge] = (base_src, base_tgt)
            return
        if n_e == 1:
            if first_edge <= fei < last_edge:
                out[fei - first_edge] = _make_one_edge(
                    base_src, base_tgt, nv, state, initiator
                )
            return
        counts = _square_counts(n_e, initiator, state)
        if base_src == base_tgt:  # clip-and-flip: fold lower triangle up
            counts[1] += counts[2]
            counts[2] = 0
        new_nv = nv >> 1
        fei_i = fei
        for i in range(4):
            if counts[i]:
                # recurse only into blocks overlapping the window
                if fei_i < last_edge and fei_i + counts[i] > first_edge:
                    rec(
                        fei_i,
                        counts[i],
                        new_nv,
                        base_src + new_nv * (i >> 1),
                        base_tgt + new_nv * (i & 1),
                    )
                fei_i += counts[i]

    rec(0, num_edges, nverts, 0, 0)
    # every window slot must have been filled by exactly one recursion leaf —
    # the window decomposition is a partition of [first_edge, last_edge).
    # Explicit raise (not assert): under `python -O` an assert is stripped
    # and an unfilled slot would emit null rows into the long edge columns.
    if any(e is None for e in out):
        raise RuntimeError("graph500 window left unfilled slots")
    return out


def kronecker_edges_graph500(
    spark,
    scale: int,
    edge_factor: int = 16,
    num_tasks: int | None = None,
    both_directions: bool = True,
):
    """DataFrame[src: long, dst: long] — the reference's Kronecker test
    graph (populateEdgeList parity: graph500Gen.hpp:68-106; each generated
    edge also emitted reversed when both_directions, like the reference).

    Distributed by edge-index windows (the reference's rank decomposition,
    graph_generator.h:347-355): each task generates its window from block
    coordinates alone — no cross-task communication, deterministic at any
    parallelism."""
    import pandas as pd

    M = edge_factor << scale
    if num_tasks is None:
        num_tasks = int(
            spark.conf.get("spark.sql.shuffle.partitions", "32")
        )
    num_tasks = max(1, min(num_tasks, M))
    bounds = [
        (
            r * (M // num_tasks) + min(r, M % num_tasks),
            (r + 1) * (M // num_tasks) + min(r + 1, M % num_tasks),
        )
        for r in range(num_tasks)
    ]
    bdf = spark.createDataFrame(bounds, "first_edge long, last_edge long").repartition(
        num_tasks, "first_edge"
    )

    def gen(batches):
        for pdf in batches:
            for fe, le in zip(pdf["first_edge"], pdf["last_edge"]):
                edges = generate_window(scale, M, int(fe), int(le))
                src = [e[0] for e in edges]
                dst = [e[1] for e in edges]
                if both_directions:
                    src, dst = src + dst, dst + src
                yield pd.DataFrame({"src": src, "dst": dst})

    return bdf.mapInPandas(gen, "src long, dst long")
