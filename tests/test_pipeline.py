"""End-to-end hybrid pipeline parity with the reference driver
(/root/reference/test/benchmark_parconnect_auto.cpp)."""

import pytest
from parconnect_spark.pipeline import parconnect_pipeline
from parconnect_spark.sources.generators import chain_edges, kronecker_edges
from tests.conftest import expected_membership


def test_pipeline_chain_no_bfs(spark):
    res = parconnect_pipeline(chain_edges(spark, 300))
    assert res.component_count == 1
    assert res.ran_bfs is False  # chains are not power-law
    got = {r["v"]: r["label"] for r in res.labels.collect()}
    assert set(got.values()) == {0}


@pytest.mark.slow
def test_pipeline_forced_bfs_disjoint_chains(spark):
    und = []
    for k in range(3):
        und += [(k * 50 + i, k * 50 + i + 1) for i in range(49)]
    rows = und + [(b, a) for a, b in und]
    edges = spark.createDataFrame(rows, "src long, dst long")
    res = parconnect_pipeline(edges, force_bfs=True, bfs_runs=1)
    assert res.ran_bfs and res.bfs_components == 1
    assert res.component_count == 3
    got = {r["v"]: r["label"] for r in res.labels.collect()}
    assert got == expected_membership(und)


@pytest.mark.slow
def test_pipeline_kronecker_matches_oracle(spark):
    edges = kronecker_edges(spark, scale=8, edgefactor=8)
    pairs = [(r["src"], r["dst"]) for r in edges.collect()]
    exp = expected_membership(pairs)
    for force in (True, False):
        res = parconnect_pipeline(edges, force_bfs=force)
        got = {r["v"]: r["label"] for r in res.labels.collect()}
        assert got == exp, f"force_bfs={force}"
    assert res.seconds > 0


def test_cli_main(spark, tmp_path, capsys):
    import json

    from parconnect_spark.__main__ import main

    out = str(tmp_path / "labels")
    rc = main(
        [
            "--input", "chain", "--n", "200",
            "--cc-algorithm", "two_phase", "--output", out,
        ]
    )
    assert rc == 0
    payload = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert payload["components"] == 1
    back = spark.read.parquet(out)
    assert back.count() == 200


@pytest.mark.slow
def test_cli_resume_through_checkpoint(spark, tmp_path, capsys):
    """CLI path with --checkpoint-dir: a killed run's committed supersteps
    are resumed by a rerun with the same dir/job-id, converging to the same
    labels (durable-cadence default wired in __main__)."""
    import json

    from parconnect_spark.__main__ import main
    from parconnect_spark.pipeline import parconnect_pipeline
    from parconnect_spark.sources.generators import chain_edges
    from parconnect_spark.streaming.checkpoint import SuperstepCheckpoint

    edges = chain_edges(spark, 300)
    want = {
        r["v"]: r["label"]
        for r in parconnect_pipeline(edges, force_bfs=False).labels.collect()
    }

    # simulate a killed run: cap iterations, committing every superstep
    ck = SuperstepCheckpoint(spark, str(tmp_path), "cli")
    from parconnect_spark.plans.connectivity import connected_components

    connected_components(
        edges, algorithm="two_phase", max_iterations=2,
        checkpoint=ck, checkpoint_every=1,
    )
    assert ck.committed_steps()

    # rerun through the CLI with the same checkpoint dir — resumes, finishes
    out = str(tmp_path / "labels")
    rc = main(
        [
            "--input", "chain", "--n", "300", "--force-bfs", "n",
            "--checkpoint-dir", str(tmp_path), "--job-id", "cli",
            "--checkpoint-every", "1", "--output", out,
        ]
    )
    assert rc == 0
    payload = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    got = {r["v"]: r["label"] for r in spark.read.parquet(out).collect()}
    assert got == want
    assert payload["components"] == len(set(want.values()))


@pytest.mark.slow
def test_pipeline_hybrid_decision_fires_and_labels_exact(spark):
    """The driver-contract cc_hybrid graph (deterministic power-law star
    forest with a chained giant component at vertex 0) must actually take
    the hybrid path: the CSN-MLE KS fit fires (ran_bfs=True, VERDICT r3
    next-round #2), ONE BFS run peels vertex 0's component, coloring labels
    the rest, and the merged per-vertex labels equal union-find ground
    truth with components = bfs + coloring counts."""
    from parconnect_spark.sources.generators import (
        powerlaw_star_edge_list,
        powerlaw_star_edges,
    )

    und = powerlaw_star_edge_list()
    edges = powerlaw_star_edges(spark)
    res = parconnect_pipeline(edges)

    assert res.ran_bfs is True
    assert res.bfs_components == 1  # one sweep peels vertex 0's component
    exp = expected_membership(und)
    got = {r["v"]: r["label"] for r in res.labels.collect()}
    assert got == exp
    assert res.component_count == len(set(exp.values()))
    # the peel did real work: the residual coloring saw fewer components
    # than the whole graph has
    assert res.component_count > 1

def test_cli_census_every_flag(spark, capsys):
    """--census-every reaches the CC loop through the pipeline (exact
    labels regardless of cadence; smoke for the new CLI plumbing)."""
    import json

    from parconnect_spark.__main__ import main

    rc = main(
        [
            "--input", "chain", "--n", "120",
            "--cc-materialize", "window", "--census-every", "3",
        ]
    )
    assert rc == 0
    payload = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert payload["components"] == 1
