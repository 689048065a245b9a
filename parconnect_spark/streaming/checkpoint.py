"""Per-superstep checkpoint/resume (BASELINE.json: "every superstep
checkpoints per-partition lineage and frontier/shuffle metrics ... so any
run is resumable mid-iteration").

Layout (Iceberg-snapshot-shaped; plain parquet when the Iceberg runtime is
absent — sources/tables.py):

    <base>/<job_id>/step=<k>/data/...parquet   working set at superstep k
    <base>/<job_id>/step=<k>/meta.json          metrics + lineage record
    <base>/<job_id>/metrics.jsonl               append-only superstep log

Commit protocol: data is written to ``_tmp`` then atomically renamed, and
``meta.json`` is written last — a step directory without meta.json is an
uncommitted torn write and is ignored on resume. That mirrors Iceberg's
snapshot-commit-last semantics with filesystem primitives.
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession


class CheckpointIdentityError(RuntimeError):
    """Raised when a checkpoint directory holds state from a different
    algorithm / working-set schema / input graph than the resuming run."""


class SuperstepCheckpoint:
    def __init__(self, spark: SparkSession, base_dir: str, job_id: str):
        self.spark = spark
        self.dir = os.path.join(base_dir, job_id)
        self.identity: dict | None = None
        os.makedirs(self.dir, exist_ok=True)

    def bind_identity(self, identity: dict) -> None:
        """Declare what this run computes: algorithm name, working-set
        schema, and an input fingerprint (e.g. edge count + checksum).
        ``save`` records it; ``latest`` refuses to resume foreign state —
        without this, rerunning with the same checkpoint dir but a different
        algorithm (two_phase stores [src,dst]; min_label stores [v,label])
        or a different input graph would silently resume wrong state."""
        self.identity = identity

    def _step_dir(self, step: int) -> str:
        return os.path.join(self.dir, f"step={step}")

    @staticmethod
    def _partition_lineage(data_dir: str) -> list[dict]:
        """Per-partition lineage of a committed working set: one record per
        parquet part-file (file name, row count, bytes). Row counts come
        from the parquet FOOTER — a few-KB metadata read per file, no data
        scan — so the lineage costs O(#partitions) tiny reads, not a job.
        This is the per-partition half of the rule "every superstep
        checkpoints per-partition lineage and frontier/shuffle metrics"
        (the per-superstep frontier/edge/strategy metrics ride in
        ``metrics``); it also gives a resume-time skew fingerprint: a
        straggler superstep shows up as one fat partition record."""
        import pyarrow.parquet as pq

        records = []
        for name in sorted(os.listdir(data_dir)):
            if not name.endswith(".parquet"):
                continue
            path = os.path.join(data_dir, name)
            records.append(
                {
                    "file": name,
                    "rows": pq.ParquetFile(path).metadata.num_rows,
                    "bytes": os.path.getsize(path),
                }
            )
        return records

    def save(self, step: int, df: DataFrame, metrics: dict | None = None) -> DataFrame:
        """Persist the superstep working set; returns a re-read DataFrame
        (lineage truncated to the checkpoint — cheaper than recomputing the
        whole iterative chain on any downstream action)."""
        step_dir = self._step_dir(step)
        tmp = step_dir + "_tmp"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        df.write.mode("overwrite").parquet(os.path.join(tmp, "data"))
        if os.path.exists(step_dir):
            shutil.rmtree(step_dir)
        os.rename(tmp, step_dir)
        meta = {
            "step": step,
            "committed_at": time.time(),
            "metrics": metrics or {},
            "partitions": self._partition_lineage(os.path.join(step_dir, "data")),
            "identity": self.identity,
        }
        with open(os.path.join(step_dir, "meta.json"), "w") as f:
            json.dump(meta, f)
        with open(os.path.join(self.dir, "metrics.jsonl"), "a") as f:
            f.write(json.dumps(meta) + "\n")
        return self.spark.read.parquet(os.path.join(step_dir, "data"))

    def committed_steps(self) -> list[int]:
        steps = []
        for name in os.listdir(self.dir):
            if name.startswith("step=") and not name.endswith("_tmp"):
                if os.path.exists(os.path.join(self.dir, name, "meta.json")):
                    steps.append(int(name.split("=", 1)[1]))
        return sorted(steps)

    def latest(self) -> tuple[int | None, DataFrame | None]:
        """Most recent committed superstep; (None, None) if fresh. Fails
        loudly (CheckpointIdentityError) if the stored state's identity does
        not match the one bound for this run."""
        steps = self.committed_steps()
        if not steps:
            return None, None
        step = steps[-1]
        if self.identity is not None:
            with open(os.path.join(self._step_dir(step), "meta.json")) as f:
                stored = json.load(f).get("identity")
            if stored is not None and stored != self.identity:
                raise CheckpointIdentityError(
                    f"checkpoint {self.dir} step={step} was written by a "
                    f"different run: stored identity {stored!r} != this "
                    f"run's {self.identity!r}; use a fresh job_id or delete "
                    "the stale checkpoint"
                )
        df = self.spark.read.parquet(os.path.join(self._step_dir(step), "data"))
        return step, df

    def latest_meta(self) -> dict | None:
        """meta.json of the most recent committed step (loop counters etc.),
        None if fresh."""
        steps = self.committed_steps()
        if not steps:
            return None
        with open(os.path.join(self._step_dir(steps[-1]), "meta.json")) as f:
            return json.load(f)

    def metrics_log(self) -> list[dict]:
        path = os.path.join(self.dir, "metrics.jsonl")
        if not os.path.exists(path):
            return []
        with open(path) as f:
            return [json.loads(line) for line in f if line.strip()]
