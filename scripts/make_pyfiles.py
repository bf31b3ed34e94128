"""Build the spark-submit --py-files artifact: dist/pegasus_spark.zip.

The reference distributes its engine by copying the master/worker binaries
to every node and launching them over HTTP RPC
(/root/reference/src/pegasus/worker/workermain.go:45-80,
 /root/reference/src/pegasus/cfgmgr/mgr.go:12). On Spark the whole fleet
story collapses into one reproducible zip shipped by the launcher:

    python scripts/make_pyfiles.py
    spark-submit --master <cluster> --py-files dist/pegasus_spark.zip \
        scripts/run_crawl.py --master inherit --store /path/to/store ...

The zip is REPRODUCIBLE (sorted entries, fixed timestamp, no .pyc) so the
artifact hash is a function of the source tree alone — two clusters running
the same commit provably run the same code, which is what makes the
cross-JVM determinism contract (BENCH/BASELINE.md) auditable in production.
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO, "pegasus_spark")
DIST = os.path.join(REPO, "dist")
# fixed DOS timestamp (2020-01-01) — zip stores no tz, value is arbitrary
STAMP = (2020, 1, 1, 0, 0, 0)


def build(out_path: str | None = None) -> str:
    out_path = out_path or os.path.join(DIST, "pegasus_spark.zip")
    out_dir = os.path.dirname(out_path)
    if out_dir:  # bare filename = cwd; makedirs('') would raise
        os.makedirs(out_dir, exist_ok=True)
    entries = []
    for root, dirs, files in os.walk(PKG):
        dirs[:] = sorted(d for d in dirs if d != "__pycache__")
        for f in sorted(files):
            if f.endswith(".py"):
                full = os.path.join(root, f)
                entries.append((os.path.relpath(full, REPO), full))
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for arcname, full in sorted(entries):
            with open(full, "rb") as fh:
                data = fh.read()
            info = zipfile.ZipInfo(arcname, date_time=STAMP)
            info.compress_type = zipfile.ZIP_DEFLATED
            info.external_attr = 0o644 << 16
            z.writestr(info, data)
    return out_path


if __name__ == "__main__":
    path = build(sys.argv[1] if len(sys.argv) > 1 else None)
    n = len(zipfile.ZipFile(path).namelist())
    print(f"{path} ({n} modules)")
