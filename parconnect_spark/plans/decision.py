"""Adaptive algorithm selection — "does this graph look scale-free with one
giant component?" (the reference's runBFSDecision).

parconnect fits a discrete power law to the degree histogram with plfit
(L-BFGS MLE) and runs the BFS peel first iff the Kolmogorov–Smirnov distance
D < 0.05 (/root/reference/src/dynamic/degreeDistInfo.hpp:167-194, fitCurve
:49-72, threshold wiring test/benchmark_parconnect_auto.cpp:194-210).

Here: the histogram is one Spark aggregation (tiny result — thousands of
distinct degrees at most, the same "gather to rank 0" the reference does,
degreeDistInfo.hpp:145-166), and the fit is the standard Clauset-Shalizi-
Newman MLE with xmin scan in numpy on the driver. Statistics-driven plan
selection, i.e. the reference's hand-rolled CBO (SURVEY.md §4).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame

from parconnect_spark.operators.graph import degree_histogram

KS_THRESHOLD = 0.05  # degreeDistInfo.hpp:176


def _hurwitz_zeta(alpha: float, x: np.ndarray, terms: int = 2000) -> np.ndarray:
    """ζ(α, x) = Σ_{k≥0} (x+k)^-α, numpy series + integral tail correction."""
    x = np.atleast_1d(x).astype(np.float64)
    k = np.arange(terms, dtype=np.float64)
    series = ((x[:, None] + k[None, :]) ** -alpha).sum(axis=1)
    tail = (x + terms) ** (1.0 - alpha) / (alpha - 1.0)
    return series + tail


def _discrete_mle_alpha(degs, freqs, xmin, lo=1.05, hi=6.0, iters=60) -> float:
    """Golden-section maximization of the discrete power-law log-likelihood
    logL(α) = -n·ln ζ(α, xmin) - α·Σ f·ln d  (Clauset et al. 2009)."""
    n = freqs.sum()
    slogd = float(np.sum(freqs * np.log(degs)))

    def nll(alpha):
        return n * np.log(_hurwitz_zeta(alpha, np.array([xmin]))[0]) + alpha * slogd

    gr = (np.sqrt(5.0) - 1.0) / 2.0
    a, b = lo, hi
    c, d = b - gr * (b - a), a + gr * (b - a)
    fc, fd = nll(c), nll(d)
    for _ in range(iters):
        if fc < fd:
            b, d, fd = d, c, fc
            c = b - gr * (b - a)
            fc = nll(c)
        else:
            a, c, fc = c, d, fd
            d = a + gr * (b - a)
            fd = nll(d)
    return (a + b) / 2.0


def powerlaw_ks_distance(degree_freq: list[tuple[int, int]]) -> float:
    """Min KS distance over xmin candidates for a *discrete* power-law MLE
    fit (Clauset-Shalizi-Newman 2009, the published method plfit implements —
    the reference's fitCurve, degreeDistInfo.hpp:49-72).

    degree_freq: [(degree, frequency), ...]. Only xmin candidates whose tail
    keeps ≥50% of the sample mass (and ≥10 samples) are considered, so a fit
    to a negligible tail cannot masquerade as "the graph is scale-free".
    """
    if not degree_freq:
        return 1.0
    arr = np.array(sorted(degree_freq), dtype=np.float64)
    degs, freqs = arr[:, 0], arr[:, 1]
    n_total = freqs.sum()
    if n_total < 10 or len(degs) < 3:
        return 1.0

    cum_from = np.cumsum(freqs[::-1])[::-1]  # #samples with degree >= degs[i]

    best = 1.0
    for i, xmin in enumerate(degs):
        if xmin < 1:
            continue
        tail_n = cum_from[i]
        if tail_n < max(10, 0.5 * n_total):
            break
        tail_degs = degs[i:]
        tail_freqs = freqs[i:]
        alpha = _discrete_mle_alpha(tail_degs, tail_freqs, xmin)
        # theoretical CCDF: ζ(α, x) / ζ(α, xmin)
        z = _hurwitz_zeta(alpha, np.concatenate(([xmin], tail_degs)))
        theo = z[1:] / z[0]
        emp = cum_from[i:] / tail_n
        ks = float(np.max(np.abs(emp - theo)))
        best = min(best, ks)
    return best


def should_run_bfs(edges: DataFrame, threshold: float = KS_THRESHOLD) -> bool:
    """True iff the degree distribution fits a power law well enough that a
    BFS giant-component peel is expected to pay off (reference decision,
    benchmark_parconnect_auto.cpp:194-210)."""
    hist = degree_histogram(edges).collect()
    pairs = [(int(r["degree"]), int(r["frequency"])) for r in hist]
    return powerlaw_ks_distance(pairs) < threshold
