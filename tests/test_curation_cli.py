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


def test_cluster_store_serves_consumers_with_zero_cc_jobs(tmp_path, spark, monkeypatch):
    """The write-once clusters table: with a FrontierStore attached, the
    first cluster build COMMITS the assignment; after a memo reset (a new
    process, in effect) every consumer reads the committed table — the CC
    build and all three evidence builders must never run again — and the
    rows are identical."""
    import pegasus_spark.analytics.pipeline_queries as PQ
    from pegasus_spark.crawler.frontier import FrontierStore

    store = FrontierStore(spark, str(tmp_path / "store"))
    monkeypatch.setattr(PQ, "_CLUSTER_STORE", store)
    PQ.reset_cluster_memo()
    try:
        first = sorted(
            (r["doc_id"], r["cluster_id"])
            for r in PQ.q_cross_modal_clusters(spark, SF).collect()
        )
        meta = store.load_clusters_meta()
        assert meta is not None and meta["sf_dir"] == SF

        PQ.reset_cluster_memo()  # simulate a fresh process

        def boom(*a, **k):
            raise AssertionError("CC/evidence build ran despite committed clusters table")

        for fn in ("near_dup_clusters", "minhash_near_dups", "simhash_near_dups"):
            monkeypatch.setattr(PQ.D, fn, boom)
        monkeypatch.setattr(PQ.S, "embedding_near_dup_pairs", boom)

        second = sorted(
            (r["doc_id"], r["cluster_id"])
            for r in PQ.q_cross_modal_clusters(spark, SF).collect()
        )
        assert first == second
        # a downstream consumer (keeper selection) also rides the table
        keepers = PQ._keeper_df(spark, SF)
        assert keepers.filter("is_keeper").count() > 0
    finally:
        PQ.reset_cluster_memo()


def test_run_curation_cli_store_reuse(tmp_path, spark):
    """CLI twice against the same store: run 1 builds + commits the clusters
    table; run 2 reports zero cluster builds (no CC jobs) and writes an
    identical corpus."""
    store = str(tmp_path / "store")
    env = dict(os.environ, SPARK_GRAFT_CPUS="8")
    summaries = []
    for out in ("c1", "c2"):
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts", "run_curation.py"),
             "--sf-dir", SF, "--out", str(tmp_path / out), "--store", store],
            capture_output=True, text=True, timeout=600, env=env, cwd=REPO,
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        line = [ln for ln in proc.stdout.strip().splitlines() if ln.startswith("{")][-1]
        summaries.append(json.loads(line))
    s1, s2 = summaries
    assert s1["clusters_source"] == "built" and s1["cluster_builds"] == 1
    assert s2["clusters_source"] == "store" and s2["cluster_builds"] == 0
    assert s1["clusters_version"] == s2["clusters_version"] == 0

    def rows(out, table):
        return sorted(
            tuple(r) for r in
            spark.read.parquet(f"{tmp_path / out}/{table}")
            .select("doc_id").collect()
        )

    for table in ("curated", "dropped"):
        assert rows("c1", table) == rows("c2", table)


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
