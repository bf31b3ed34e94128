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


def test_run_curation_cli_scrub_spans(tmp_path, spark):
    """--scrub-spans N rewrites survivor text via span_scrub: scrubbed token
    totals reconcile, and no corpus-repeated N-span survives twice."""
    out = str(tmp_path / "curated_scrub")
    env = dict(os.environ, SPARK_GRAFT_CPUS="8")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "run_curation.py"),
         "--sf-dir", SF, "--out", out, "--scrub-spans", "8"],
        capture_output=True, text=True, timeout=600, env=env, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = [ln for ln in proc.stdout.strip().splitlines() if ln.startswith("{")][-1]
    summary = json.loads(line)
    surv = spark.read.parquet(f"{out}/curated")
    assert surv.count() == summary["survivors"]
    rows = surv.select("doc_id", "text", "n_removed").collect()
    assert summary["spans_scrubbed_tokens"] == sum(r["n_removed"] for r in rows)
    # the scrub invariant: across the written corpus every 8-token span is
    # unique except canonical occurrences — i.e. re-scrubbing is a no-op
    # for every doc that was already scrubbed (fixed point on repeats)
    spans: dict[tuple, int] = {}
    for r in rows:
        toks = r["text"].split()
        for i in range(len(toks) - 7):
            spans[tuple(toks[i:i + 8])] = spans.get(tuple(toks[i:i + 8]), 0) + 1
    repeated = {s: c for s, c in spans.items() if c > 1}
    # canonical occurrences may still collide if two docs' canonical spans
    # were created by the scrub itself (token concatenation across removed
    # gaps); the invariant we assert is the strong one the operator promises
    # on its INPUT spans: every span repeated in the input survives exactly
    # once unless it is gap-synthesized. On this fixture none are:
    assert not repeated, list(repeated)[:3]
