"""Deterministic random-walk sampling (node2vec/GraphSAGE-style
neighborhood sampling; absent from the reference — a training-data
pipeline op for graph-embedding corpora, built on the frontier-join
substrate of plans/bfs.py).

One walk starts at every seed vertex. At step i the walk at vertex v moves
to the neighbor n minimizing

    md5(walk_id ':' i ':' n ':' salt)

— a deterministic pseudo-random choice: uniform-ish over neighbors, stable
across engines/partitionings/retries (no RNG state to replicate), and
directly expressible in ANSI SQL, so the oracle replays the exact walk.
Walks stop early at a dead end (no out-neighbors; can't happen on a
symmetric graph unless the seed is isolated).

Physical plan per step (= one BFS frontier expansion):
* the frontier (≤ |seeds| rows, shrinks on dead ends) is BROADCAST into
  the edge join under ``broadcast_max_rows`` — the |E|-row table never
  moves; above the gate the frontier arrives shuffle-hash hinted against
  a once-pre-hashed edge cache, one small exchange per step.
* neighbor choice is ``min_by(dst, md5(...))`` inside the map-side-combined
  groupBy(walk_id) — no window, no sort of the candidate fan-out.
* md5 ties cannot break determinism: the hashed string embeds the
  candidate itself, so distinct candidates hash distinct.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

BROADCAST_MAX_ROWS = 8_000_000


def _choice_hash(step_col, salt: str):
    return F.md5(
        F.concat_ws(
            ":",
            F.col("walk_id").cast("string"),
            step_col.cast("string"),
            F.col("dst").cast("string"),
            F.lit(salt),
        )
    )


def random_walks(
    edges: DataFrame,
    seeds: DataFrame,
    length: int,
    salt: str = "w",
    broadcast_max_rows: int = BROADCAST_MAX_ROWS,
) -> DataFrame:
    """Walk traces DataFrame[walk_id: long, step: int, v: long].

    ``edges``: distinct (src, dst) long pairs (symmetric for undirected
    walks). ``seeds``: DataFrame with a single long column ``v``; one walk
    per distinct seed, walk_id = the seed id. Step 0 rows are the seeds
    themselves; each walk emits ≤ length+1 rows.
    """
    if length < 0:
        raise ValueError("length must be >= 0")
    spark = edges.sparkSession
    parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    frontier = (
        seeds.select(F.col("v").cast("long").alias("walk_id"))
        .distinct()
        .select("walk_id", F.col("walk_id").alias("v"))
        .localCheckpoint()
    )
    n_walks = frontier.count()
    bcast = n_walks <= broadcast_max_rows
    ed = edges.select("src", "dst")
    if not bcast:
        ed = ed.repartition(parts, "src").persist()

    trace = frontier.select("walk_id", F.lit(0).alias("step"), "v")
    out = [trace]
    for i in range(1, length + 1):
        side = F.broadcast(frontier) if bcast else frontier.hint("shuffle_hash")
        nxt = (
            ed.join(side, ed["src"] == side["v"])
            .groupBy("walk_id")
            .agg(F.min_by("dst", _choice_hash(F.lit(i), salt)).alias("v"))
            .localCheckpoint(eager=False)
        )
        n_alive = nxt.count()  # materializes the step; walks at dead ends drop out
        frontier = nxt
        out.append(frontier.select("walk_id", F.lit(i).alias("step"), "v"))
        if n_alive == 0:
            break
    result = out[0]
    for t in out[1:]:
        result = result.unionByName(t)
    if not bcast:
        ed.unpersist()
    return result


def walk_skipgram_pairs(walks: DataFrame, window: int = 2) -> DataFrame:
    """Skip-gram (center → forward-context) co-occurrence counts from
    walk rows — the POSITIVE training pairs of the node2vec/DeepWalk
    recipe (operators/graph.negative_samples supplies the negatives;
    together they are the embedding-training feed).

    Pairs are (v at step i, v at step j) for 0 < j−i ≤ ``window``
    within one walk, counted across all walks. The self-join keys on
    walk_id — each group is one walk of bounded length, so fan-out per
    key is ≤ length·window and there is no hub risk; the count is one
    map-side-combined aggregate. Returns (a, b, n)."""
    a = walks.select(
        "walk_id", F.col("step").alias("_sa"), F.col("v").alias("a")
    )
    b = walks.select(
        "walk_id", F.col("step").alias("_sb"), F.col("v").alias("b")
    )
    return (
        a.join(b, "walk_id")
        .where(
            (F.col("_sb") - F.col("_sa") >= 1)
            & (F.col("_sb") - F.col("_sa") <= window)
        )
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n"))
    )
