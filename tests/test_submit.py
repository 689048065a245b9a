"""End-to-end ``spark-submit --py-files`` launch (the north rule's cluster
launch shape). The test stages launch.py + the built zip in an empty tmpdir
and runs the REAL spark-submit from there with the repo stripped from
PYTHONPATH — the engine must reach driver and executors through the zip
alone, exactly as it would on a multi-executor cluster."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.slow


def _spark_submit() -> str | None:
    cand = shutil.which("spark-submit")
    if cand:
        return cand
    spark_home = os.environ.get("SPARK_HOME", "/opt/spark")
    cand = os.path.join(spark_home, "bin", "spark-submit")
    return cand if os.path.exists(cand) else None


def test_make_pyfiles_is_deterministic(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "tools"))
    try:
        from make_pyfiles import build
    finally:
        sys.path.pop(0)
    a = build(str(tmp_path / "a.zip"))
    b = build(str(tmp_path / "b.zip"))
    with open(a, "rb") as fa, open(b, "rb") as fb:
        assert fa.read() == fb.read()


def test_spark_submit_pyfiles_chain_cc(tmp_path):
    submit = _spark_submit()
    if submit is None:
        pytest.skip("spark-submit binary not on this image")
    sys.path.insert(0, os.path.join(REPO, "tools"))
    try:
        from make_pyfiles import build
    finally:
        sys.path.pop(0)
    zip_path = build(str(tmp_path / "parconnect_spark.zip"))
    shutil.copy(os.path.join(REPO, "launch.py"), tmp_path / "launch.py")

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the only package source
    out = subprocess.run(
        [
            submit,
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            str(tmp_path / "launch.py"),
            "--input", "chain", "--n", "500",
        ],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    payload = json.loads(out.stdout.strip().splitlines()[-1])
    # a 500-chain is one component; the hybrid auto path must agree
    assert payload["components"] == 1
    assert payload["coloring_iterations"] >= 1


def test_spark_submit_conf_is_not_overridden(tmp_path):
    """get_spark() must DEFER to the submitted --master/--conf: a builder
    .master(local[...]) would silently turn a cluster submission into a
    local driver-side run (the factory applies its settings as defaults
    only when spark-submit is detected)."""
    submit = _spark_submit()
    if submit is None:
        pytest.skip("spark-submit binary not on this image")
    sys.path.insert(0, os.path.join(REPO, "tools"))
    try:
        from make_pyfiles import build
    finally:
        sys.path.pop(0)
    zip_path = build(str(tmp_path / "parconnect_spark.zip"))
    probe = tmp_path / "probe.py"
    probe.write_text(
        "import json\n"
        "from parconnect_spark.session import get_spark\n"
        "spark = get_spark()\n"
        "print(json.dumps({\n"
        "    'master': spark.sparkContext.master,\n"
        "    'shuffle': spark.conf.get('spark.sql.shuffle.partitions'),\n"
        "    'aqe': spark.conf.get('spark.sql.adaptive.enabled'),\n"
        "}))\n"
    )
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    env.pop("SPARK_GRAFT_CPUS", None)
    env.pop("SPARK_GRAFT_SHUFFLE", None)
    out = subprocess.run(
        [
            submit,
            "--master", "local[3]",  # distinctive: no default produces 3
            "--conf", "spark.sql.shuffle.partitions=7",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            str(probe),
        ],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    got = json.loads(out.stdout.strip().splitlines()[-1])
    assert got["master"] == "local[3]"
    assert got["shuffle"] == "7"
    # defaults still land where the submission said nothing
    assert got["aqe"] == "true"
