"""Curation CLI surface (scripts/run_curation.py): the dedup endgame runs
end-to-end from a plain `python` invocation, writes the source-partitioned
corpus + dropped audit beside it, and the printed summary reconciles with
the written artifact and the gated keeper decision."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = "/root/testdata/sf0.001"


def test_run_curation_cli(tmp_path, spark):
    out = str(tmp_path / "curated")
    env = dict(os.environ, SPARK_GRAFT_CPUS="8")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "run_curation.py"),
         "--sf-dir", SF, "--out", out],
        capture_output=True, text=True, timeout=600, env=env, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = [ln for ln in proc.stdout.strip().splitlines() if ln.startswith("{")][-1]
    summary = json.loads(line)
    assert summary["docs_in"] == summary["survivors"] + summary["dropped"]
    assert summary["survivors"] > 0 and summary["dropped"] >= 0
    assert sum(summary["survivors_by_source"].values()) == summary["survivors"]

    # written artifact reconciles with the summary AND the keeper decision
    surv = spark.read.parquet(f"{out}/curated")
    drop = spark.read.parquet(f"{out}/dropped")
    assert surv.count() == summary["survivors"]
    assert drop.count() == summary["dropped"]
    assert set(drop.columns) == {"doc_id", "cluster_id", "keeper_id", "reason"}
    # partition layout: one dir per source
    parts = {d.name for d in os.scandir(f"{out}/curated") if d.name.startswith("source=")}
    assert parts == {f"source={s}" for s in summary["survivors_by_source"]}

    from pegasus_spark.analytics.pipeline_queries import _docs, _keeper_df
    from pegasus_spark.textops.dedup import curate_corpus

    expect, _ = curate_corpus(_docs(spark, SF), _keeper_df(spark, SF))
    assert {r["doc_id"] for r in surv.select("doc_id").collect()} == {
        r["doc_id"] for r in expect.select("doc_id").collect()
    }
