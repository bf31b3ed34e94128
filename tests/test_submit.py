"""Launch-path evidence (north rule): the engine ships as a reproducible
--py-files zip and runs end-to-end under ``spark-submit``, and rerunning
the same store resumes from the committed checkpoint.

The sandbox has no multi-node cluster, so ``--master local[4]`` stands in
for the cluster master URL; what this pins is the LAUNCH PATH — a fresh
spark-submit JVM, the zip on --py-files, the CLI driver script, checkpoint
resume across processes — not multi-node scheduling (which
tests/test_resume.py::test_partition_count_invariance shows is a pure
physical choice).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_pyfiles_zip_reproducible(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import make_pyfiles

    a = make_pyfiles.build(str(tmp_path / "a.zip"))
    b = make_pyfiles.build(str(tmp_path / "b.zip"))
    with open(a, "rb") as fa, open(b, "rb") as fb:
        assert fa.read() == fb.read(), "zip must be byte-reproducible"
    names = zipfile.ZipFile(a).namelist()
    assert "pegasus_spark/session.py" in names
    assert "pegasus_spark/crawler/scheduler.py" in names
    assert len(names) >= 20


def test_spark_submit_crawl_and_resume(tmp_path):
    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        pytest.skip("spark-submit not on PATH")
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import make_pyfiles

    zip_path = make_pyfiles.build(str(tmp_path / "pegasus_spark.zip"))
    store = str(tmp_path / "store")
    fx = str(tmp_path / "fx")

    def launch(max_rounds: int) -> dict:
        env = dict(os.environ)
        env["SPARK_GRAFT_CPUS"] = "4"
        out = subprocess.run(
            [
                spark_submit, "--master", "local[4]",
                "--py-files", zip_path,
                os.path.join(REPO, "scripts", "run_crawl.py"),
                "--master", "inherit",
                "--store", store, "--fixture", fx,
                "--max-rounds", str(max_rounds), "--n-partitions", "4",
            ],
            capture_output=True, text=True, timeout=600, env=env,
        )
        assert out.returncode == 0, out.stderr[-3000:]
        for line in reversed(out.stdout.strip().splitlines()):
            if line.startswith("{"):
                return json.loads(line)
        raise AssertionError(f"no JSON summary:\n{out.stdout[-2000:]}")

    first = launch(max_rounds=2)
    assert first["rounds_run"] == 2
    assert first["pages_fetched"] > 0

    second = launch(max_rounds=0)  # run to completion from the checkpoint
    assert second["resumed_from_round"] == first["final_round"]
    assert second["pages_fetched"] > first["pages_fetched"]
    assert second["rounds_run"] >= 1
