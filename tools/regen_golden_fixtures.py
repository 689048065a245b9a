"""Regenerate the committed golden-fixture parquets that serve as DuckDB
oracles for the non-SQL-expressible driver queries (binary media decode).

Run after any INTENTIONAL change to synth_media or the decoders, and commit
the refreshed fixtures in the same change:

    python tools/regen_golden_fixtures.py

The fixtures are exact pins: tests/test_multimodal.py re-runs the driver
queries and asserts bit-for-bit equality, so an unintentional decoder drift
fails the suite instead of silently rewriting the oracle.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXTURES = {
    "media_features": "tests/fixtures/media_features_golden.parquet",
    "media_frames": "tests/fixtures/media_frames_golden.parquet",
}


def main() -> None:
    import __spark_entry__ as entry_mod
    from parconnect_spark.session import get_spark

    spark = get_spark(
        app_name="regen_golden_fixtures", master="local[8]", shuffle_partitions=8
    )
    qs = entry_mod.queries()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for name, rel in FIXTURES.items():
        # sf_dir is ignored by construction (synth_media is self-contained)
        pdf = qs[name](spark, "/root/testdata/sf0.01").toPandas()
        out = os.path.join(repo, rel)
        pdf.to_parquet(out, index=False)
        print(f"{name}: {len(pdf)} rows -> {out}")
    spark.stop()


if __name__ == "__main__":
    main()
