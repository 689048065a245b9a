import numpy as np

from parconnect_spark.plans.decision import powerlaw_ks_distance, should_run_bfs
from parconnect_spark.sources.generators import chain_edges


def test_chain_is_not_powerlaw(spark):
    # every vertex has degree ≤ 2 → too few distinct degrees to fit
    assert should_run_bfs(chain_edges(spark, 500)) is False


def test_exact_powerlaw_histogram_accepted():
    # freq(d) ∝ d^-2.5 over d=1..1000 — a clean power law
    degs = np.arange(1, 1000)
    freqs = np.maximum((1e6 * degs ** -2.5).astype(int), 1)
    d = powerlaw_ks_distance(list(zip(degs.tolist(), freqs.tolist())))
    assert d < 0.05


def test_uniform_histogram_rejected():
    pairs = [(d, 100) for d in range(1, 200)]
    assert powerlaw_ks_distance(pairs) > 0.05


def test_empty_histogram():
    assert powerlaw_ks_distance([]) == 1.0
