"""Local rehearsal of the driver's correctness gate: run every
__spark_entry__ query on Spark and its oracle on DuckDB at the given sf dir,
compare row counts, column names and (column-name-sorted, row-sorted) values.

Usage: python tools/compare_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, ".")

import duckdb

import __spark_entry__ as entry_mod
from parconnect_spark.session import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm_cell(x):
    if isinstance(x, float):
        if math.isnan(x):
            return "nan"
        return round(x, 9)
    return x


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out, key=repr)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="oracle_compare", master="local[8]", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            import time as _time

            _t0 = _time.monotonic()
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            _spark_s = round(_time.monotonic() - _t0, 2)
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"[FAIL-spark] {name}: {e}")
            continue
        if name not in oracles:
            print(f"[rows-only] {name}: {len(srows)} rows, cols={scols}")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            failures.append((name, f"ORACLE ERROR: {e}"))
            print(f"[FAIL-oracle] {name}: {e}")
            continue
        sc, sr = norm_rows(scols, srows)
        oc, orr = norm_rows(ocols, orows)
        if sc != oc:
            failures.append((name, f"cols {sc} vs {oc}"))
            print(f"[FAIL-cols] {name}: spark={sc} duckdb={oc}")
            continue
        if len(sr) != len(orr):
            failures.append((name, f"rowcount {len(sr)} vs {len(orr)}"))
            print(f"[FAIL-count] {name}: spark={len(sr)} duckdb={len(orr)}")
            continue
        bad = [(a, b) for a, b in zip(sr, orr) if a != b]
        if bad:
            failures.append((name, f"{len(bad)} value mismatches"))
            print(f"[FAIL-values] {name}: {len(bad)}/{len(sr)} rows differ; first: {bad[:3]}")
        else:
            print(f"[OK] {name}: {len(sr)} rows match exactly ({_spark_s}s)")
    print()
    if failures:
        print(f"{len(failures)} FAILURES: {[f[0] for f in failures]}")
        sys.exit(1)
    print("ALL MATCH")


if __name__ == "__main__":
    main()
