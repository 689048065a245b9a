"""Resume-from-checkpoint equivalence: kill after superstep k, resume, same
labels (FIXTURES.md §4 / BASELINE.json resumability rule)."""

import pytest

from parconnect_spark.plans.connectivity import connected_components
from parconnect_spark.sources.generators import chain_edges
from parconnect_spark.streaming.checkpoint import (
    CheckpointIdentityError,
    SuperstepCheckpoint,
)


def test_superstep_roundtrip(spark, tmp_path):
    ckpt = SuperstepCheckpoint(spark, str(tmp_path), "job1")
    df = spark.createDataFrame([(1, 2), (3, 4)], "src long, dst long")
    back = ckpt.save(1, df, {"edges": 2})
    assert {(r["src"], r["dst"]) for r in back.collect()} == {(1, 2), (3, 4)}
    step, latest = ckpt.latest()
    assert step == 1
    assert latest.count() == 2
    log = ckpt.metrics_log()
    assert log and log[-1]["step"] == 1 and log[-1]["metrics"]["edges"] == 2
    # per-partition lineage: one record per part-file; row counts sum to
    # the working set, byte sizes are real
    parts = log[-1]["partitions"]
    assert parts and sum(p["rows"] for p in parts) == 2
    assert all(p["bytes"] > 0 and p["file"].endswith(".parquet") for p in parts)
    assert ckpt.latest_meta()["partitions"] == parts


def test_torn_write_ignored(spark, tmp_path):
    import os

    ckpt = SuperstepCheckpoint(spark, str(tmp_path), "job2")
    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    ckpt.save(1, df, {})
    # simulate a torn step-2: data dir exists, meta.json missing
    df.write.parquet(os.path.join(ckpt._step_dir(2), "data"))
    step, _ = ckpt.latest()
    assert step == 1


@pytest.mark.slow
def test_cc_resume_equivalence(spark, tmp_path):
    edges = chain_edges(spark, 200)

    full = connected_components(edges, algorithm="two_phase")
    want = {r["v"]: r["label"] for r in full.labels.collect()}

    # run 1: stop after 2 supersteps by capping iterations, checkpointing each
    ck1 = SuperstepCheckpoint(spark, str(tmp_path), "cc")
    partial = connected_components(
        edges, algorithm="two_phase", max_iterations=2, checkpoint=ck1
    )
    assert partial.iterations == 2
    assert ck1.committed_steps() == [1, 2]

    # run 2 ("after restart"): same checkpoint dir resumes at step 2
    ck2 = SuperstepCheckpoint(spark, str(tmp_path), "cc")
    resumed = connected_components(edges, algorithm="two_phase", checkpoint=ck2)
    assert resumed.iterations > 2  # continued, not restarted
    got = {r["v"]: r["label"] for r in resumed.labels.collect()}
    assert got == want


def test_resume_rejects_foreign_algorithm(spark, tmp_path):
    """Same checkpoint dir, different algorithm → loud failure, not silent
    resume of a foreign working set (two_phase stores [src,dst], min_label
    stores [v,label])."""
    edges = chain_edges(spark, 120)
    ck1 = SuperstepCheckpoint(spark, str(tmp_path), "cc")
    connected_components(edges, algorithm="two_phase", max_iterations=2, checkpoint=ck1)
    ck2 = SuperstepCheckpoint(spark, str(tmp_path), "cc")
    with pytest.raises(CheckpointIdentityError):
        connected_components(edges, algorithm="min_label", checkpoint=ck2)


def test_resume_rejects_foreign_input(spark, tmp_path):
    """Same checkpoint dir + algorithm, different input graph → loud failure."""
    ck1 = SuperstepCheckpoint(spark, str(tmp_path), "cc")
    connected_components(
        chain_edges(spark, 120), algorithm="two_phase", max_iterations=2, checkpoint=ck1
    )
    ck2 = SuperstepCheckpoint(spark, str(tmp_path), "cc")
    with pytest.raises(CheckpointIdentityError):
        connected_components(chain_edges(spark, 60), algorithm="two_phase", checkpoint=ck2)


@pytest.mark.slow
def test_cc_min_label_resume(spark, tmp_path):
    edges = chain_edges(spark, 120)
    full = connected_components(edges, algorithm="min_label")
    want = {r["v"]: r["label"] for r in full.labels.collect()}

    ck1 = SuperstepCheckpoint(spark, str(tmp_path), "ml")
    connected_components(edges, algorithm="min_label", max_iterations=2, checkpoint=ck1)
    ck2 = SuperstepCheckpoint(spark, str(tmp_path), "ml")
    resumed = connected_components(edges, algorithm="min_label", checkpoint=ck2)
    got = {r["v"]: r["label"] for r in resumed.labels.collect()}
    assert got == want
