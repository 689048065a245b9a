"""spark-submit entry point: ``spark-submit --py-files parconnect_spark.zip
-m parconnect_spark`` or ``python -m parconnect_spark`` — the CLI of the
reference's shipped binary (/root/reference/test/benchmark_parconnect_auto.cpp:68-84)
re-expressed:

    python -m parconnect_spark --input kronecker --scale 12
    python -m parconnect_spark --input generic --file graph.txt
    python -m parconnect_spark --input chain --n 100000
    python -m parconnect_spark --input transcripts --path t.parquet \
        --checkpoint-dir /tmp/ck --job-id run1
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="parconnect_spark")
    p.add_argument("--input", choices=["kronecker", "generic", "chain", "transcripts"],
                   required=True)
    p.add_argument("--file", help="edge-list text file (generic)")
    p.add_argument("--path", help="transcripts parquet/Iceberg path")
    p.add_argument("--scale", type=int, default=12, help="kronecker scale")
    p.add_argument("--edgefactor", type=int, default=16)
    p.add_argument("--n", type=int, default=1000, help="chain length")
    p.add_argument("--bfs-runs", type=int, default=1)
    p.add_argument("--force-bfs", choices=["y", "n"], default=None,
                   help="override the power-law decision (benchmark_parconnect.cpp knob)")
    p.add_argument("--no-pointer-doubling", action="store_true")
    p.add_argument("--cc-algorithm",
                   choices=["two_phase", "min_label", "local_contract"],
                   default="two_phase")
    p.add_argument("--cc-materialize",
                   choices=["auto", "window", "salted", "salted_fused",
                            "persist", "local_checkpoint"],
                   default="auto",
                   help="two_phase superstep strategy: auto = pick "
                        "window-vs-salted from a degree census of the input "
                        "(default); window = single-job round; salted = "
                        "skew-proof two-phase minima + size-gated broadcast "
                        "join-back (hub-heavy graphs); salted_fused = both "
                        "noskew phases in one linear plan (broadcast gate "
                        "required, falls back to salted); "
                        "persist/local_checkpoint = fused/eager checkpoints")
    p.add_argument("--census-every", type=int, default=None,
                   help="window-strategy hub-census refresh cadence in "
                        "supersteps (default: connectivity.CENSUS_EVERY)")
    p.add_argument("--permute-ids", action="store_true",
                   help="apply the invertible-hash id permutation first")
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--checkpoint-every", type=int, default=5,
                   help="commit a durable superstep checkpoint every K "
                        "supersteps when --checkpoint-dir is set (default 5; "
                        "localCheckpoint alone is NOT fault-tolerant — "
                        "executor loss kills the lineage-truncated blocks, "
                        "so long runs on real clusters want this cadence)")
    p.add_argument("--job-id", default="parconnect")
    p.add_argument("--output", default=None, help="write labels parquet here")
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    from parconnect_spark.session import get_spark
    from parconnect_spark.pipeline import parconnect_pipeline

    preexisting = SparkSession.getActiveSession()
    spark = preexisting or get_spark(app_name="parconnect_pipeline")

    if args.input == "kronecker":
        from parconnect_spark.sources.generators import kronecker_edges

        edges = kronecker_edges(spark, scale=args.scale, edgefactor=args.edgefactor)
    elif args.input == "chain":
        from parconnect_spark.sources.generators import chain_edges

        edges = chain_edges(spark, args.n)
    elif args.input == "generic":
        from parconnect_spark.sources.edgelist import read_edgelist_text

        edges = read_edgelist_text(spark, args.file, add_reverse_edges=True)
    else:
        from parconnect_spark.sources.tables import read_table
        from parconnect_spark.operators.derive import derive_edges

        transcripts = read_table(spark, args.path)
        edges, _ = derive_edges(transcripts)

    if args.permute_ids:
        from parconnect_spark.functions.hashing import permute_ids

        edges = permute_ids(edges)

    checkpoint = None
    if args.checkpoint_dir:
        from parconnect_spark.streaming.checkpoint import SuperstepCheckpoint

        checkpoint = SuperstepCheckpoint(spark, args.checkpoint_dir, args.job_id)

    force = None if args.force_bfs is None else args.force_bfs == "y"
    res = parconnect_pipeline(
        edges,
        bfs_runs=args.bfs_runs,
        force_bfs=force,
        cc_algorithm=args.cc_algorithm,
        cc_materialize=args.cc_materialize,
        pointer_doubling=not args.no_pointer_doubling,
        checkpoint=checkpoint,
        checkpoint_every=args.checkpoint_every,
        census_every=args.census_every,
    )
    if args.output:
        res.labels.write.mode("overwrite").parquet(args.output)
    print(
        json.dumps(
            {
                "components": res.component_count,
                "ran_bfs": res.ran_bfs,
                "bfs_components": res.bfs_components,
                "coloring_iterations": res.coloring_iterations,
                "seconds_excl_construction": round(res.seconds, 3),
            }
        )
    )
    if preexisting is None:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
