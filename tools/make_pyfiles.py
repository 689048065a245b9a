"""Build the ``--py-files`` artifact for cluster submission.

The north-rule launch shape (cf. the reference's single mpirun-able binary,
/root/reference/test/benchmark_parconnect_auto.cpp) is::

    python tools/make_pyfiles.py                       # -> dist/parconnect_spark.zip
    spark-submit --master <cluster> \
        --py-files dist/parconnect_spark.zip \
        launch.py --input transcripts --path s3://.../transcripts

The zip is deterministic (fixed timestamps, sorted entries, no bytecode) so
repeated builds are byte-identical and artifact hashes are comparable across
runs. tests/test_submit.py drives the real ``spark-submit`` against it from a
directory that does NOT contain the package, proving the zip alone supplies
the engine to driver and executors.
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_path: str | None = None) -> str:
    out_path = out_path or os.path.join(REPO, "dist", "parconnect_spark.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    pkg_root = os.path.join(REPO, "parconnect_spark")
    entries = []
    for dirpath, dirnames, filenames in os.walk(pkg_root):
        dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
        for fn in sorted(filenames):
            if not fn.endswith(".py"):
                continue
            full = os.path.join(dirpath, fn)
            entries.append((os.path.relpath(full, REPO), full))
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for arcname, full in entries:
            with open(full, "rb") as f:
                data = f.read()
            # fixed date_time => byte-identical rebuilds
            info = zipfile.ZipInfo(arcname, date_time=(1980, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            info.external_attr = 0o644 << 16
            zf.writestr(info, data)
    return out_path


if __name__ == "__main__":
    out = build(sys.argv[1] if len(sys.argv) > 1 else None)
    print(out)
