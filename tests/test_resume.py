"""Resume + parallelism-invariance (SURVEY §5.2/§5.6, north_rule checkpoint
contract): an interrupted crawl resumed from the manifest produces byte-equal
outputs to an uninterrupted one, and the golden ordering / final tables are
independent of the partitioning level."""

from __future__ import annotations

import pandas as pd
import pytest

from pegasus_spark.crawler.fixtures import budget_df, make_site_spec, write_fixture
from pegasus_spark.crawler.scheduler import CrawlScheduler

TS = 1_700_000_000


@pytest.fixture(scope="module")
def fixture_dir(spark, tmp_path_factory):
    spec = make_site_spec(n_districts=4, regions_per_district=3, pages_per_region_max=5)
    fx = str(tmp_path_factory.mktemp("fx"))
    write_fixture(spark, spec, fx, round_no=1)
    return spec, fx


def _mk(spark, spec, fx, work, n_partitions=8, **kw):
    return CrawlScheduler(
        spark, work,
        page_store_path=f"{fx}/site_pages_r1.parquet",
        image_store_path=f"{fx}/items_r1.parquet",
        budget=budget_df(spark, spec),
        seed_urls=[spec.root_url],
        now_ts=TS,
        n_partitions=n_partitions,
        **kw,
    )


def _outputs(sched):
    ckpt = sched.store.load_checkpoint()
    apt = (
        sched.store.read_apartments(ckpt.apartments_version)
        .toPandas().sort_values(["region", "aid"]).reset_index(drop=True)
    )
    log = (
        sched.store.read_appended("fetch_log", ckpt.appended_rounds)
        .toPandas().sort_values(["round", "seq"]).reset_index(drop=True)
    )
    frontier = (
        sched.store.read_frontier(ckpt.frontier_version)
        .select("url", "state").toPandas().sort_values("url").reset_index(drop=True)
    )
    return apt, log, frontier


def test_resume_equals_uninterrupted(spark, fixture_dir, tmp_path_factory):
    spec, fx = fixture_dir
    # uninterrupted reference run
    w1 = str(tmp_path_factory.mktemp("w1"))
    full = _mk(spark, spec, fx, w1)
    full.run()
    # interrupted: stop after 2 rounds, then a FRESH scheduler resumes from
    # the manifest (simulating a driver crash + spark-submit restart)
    w2 = str(tmp_path_factory.mktemp("w2"))
    part = _mk(spark, spec, fx, w2)
    part.run(max_rounds=2)
    assert not part.store.load_checkpoint().finished
    resumed = _mk(spark, spec, fx, w2)
    resumed.run()
    a1, l1, f1 = _outputs(full)
    a2, l2, f2 = _outputs(resumed)
    pd.testing.assert_frame_equal(a1, a2)
    pd.testing.assert_frame_equal(l1, l2)
    pd.testing.assert_frame_equal(f1, f2)


def test_partition_count_invariance(spark, fixture_dir, tmp_path_factory):
    """The §4.3 determinism contract: physical parallelism (partition count)
    must not change the dequeue log, the URL-seen set, or the tables — the
    property the local[8]-vs-local[32] scaling evidence relies on."""
    spec, fx = fixture_dir
    outs = []
    for n in (2, 8):
        w = str(tmp_path_factory.mktemp(f"wp{n}"))
        s = _mk(spark, spec, fx, w, n_partitions=n)
        s.run()
        outs.append(_outputs(s))
    (a1, l1, f1), (a2, l2, f2) = outs
    pd.testing.assert_frame_equal(a1, a2)
    pd.testing.assert_frame_equal(l1, l2)
    pd.testing.assert_frame_equal(f1, f2)


def test_checkpoint_lineage_fields(spark, fixture_dir, tmp_path_factory):
    """Per-partition lineage (north_rule): per-BUCKET frontier-state counters
    in the manifest (O(buckets), host-cardinality-independent), the host
    breakdown in the store's lineage table, bloom shard versions and fetch
    counters in the manifest — and the two lineage levels reconcile with
    each other and the frontier itself."""
    from pegasus_spark.crawler.frontier import N_FRONTIER_BUCKETS, host_bucket_py

    spec, fx = fixture_dir
    w = str(tmp_path_factory.mktemp("wl"))
    s = _mk(spark, spec, fx, w)
    s.run()
    ckpt = s.store.load_checkpoint()
    assert ckpt.finished
    assert ckpt.bloom_versions, "bloom shard versions tracked"
    assert ckpt.counters["pages_fetched"] > 0
    assert ckpt.counters["urls_enqueued"] > 0
    # checkpoint holds bucket-level counters only
    assert ckpt.lineage_version == ckpt.round
    for bucket, states in ckpt.bucket_lineage.items():
        assert 0 <= int(bucket) < N_FRONTIER_BUCKETS
        assert sum(states.values()) > 0
    # host breakdown lives in the store table and reconciles exactly
    lin = s.store.read_lineage(ckpt.lineage_version).toPandas()
    assert lin["host"].str.endswith(".lianjia.test").all()
    got_buckets: dict[str, dict[str, int]] = {}
    for r in lin.itertuples():
        b = str(host_bucket_py(r.host))
        got_buckets.setdefault(b, {})
        got_buckets[b][r.state] = got_buckets[b].get(r.state, 0) + int(r.url_cnt)
    assert got_buckets == ckpt.bucket_lineage
    # and with the frontier's actual states
    frontier = s.store.read_frontier(ckpt.frontier_version)
    want = {r["state"]: r["count"] for r in frontier.groupBy("state").count().collect()}
    assert lin.groupby("state")["url_cnt"].sum().to_dict() == want


def test_legacy_checkpoint_upgrades_on_resume(spark, fixture_dir, tmp_path_factory):
    """A manifest written by the pre-lineage-table layout (host-level
    partition_lineage key, no bucket_lineage/lineage_version) must still
    load — unknown keys are dropped — and the next run() must rebuild the
    lineage table + bucket counters from the committed frontier, then resume
    to the same outputs as an uninterrupted crawl."""
    import json
    import os

    import pyspark.sql.functions as F

    spec, fx = fixture_dir
    w1 = str(tmp_path_factory.mktemp("wleg_full"))
    full = _mk(spark, spec, fx, w1)
    full.run()

    w2 = str(tmp_path_factory.mktemp("wleg"))
    part = _mk(spark, spec, fx, w2)
    part.run(max_rounds=2)
    # rewrite the manifest into the round-2 legacy shape
    mp = os.path.join(w2, "checkpoint.json")
    with open(mp) as f:
        raw = json.load(f)
    raw["partition_lineage"] = {"h.lianjia.test": {"pending": 1}}  # retired key
    raw.pop("bucket_lineage")
    raw.pop("lineage_version")
    with open(mp, "w") as f:
        json.dump(raw, f)

    resumed = _mk(spark, spec, fx, w2)
    loaded = resumed.store.load_checkpoint()
    assert loaded is not None and loaded.lineage_version == -1
    resumed.run()
    ckpt = resumed.store.load_checkpoint()
    assert ckpt.lineage_version == ckpt.round
    # the rebuilt lineage reconciles with the frontier
    lin = resumed.store.read_lineage(ckpt.lineage_version)
    got = {r["state"]: int(r["cnt"]) for r in
           lin.groupBy("state").agg(F.sum("url_cnt").alias("cnt")).collect()}
    frontier = resumed.store.read_frontier(ckpt.frontier_version)
    want = {r["state"]: r["count"] for r in frontier.groupBy("state").count().collect()}
    assert got == want
    a1, l1, f1 = _outputs(full)
    a2, l2, f2 = _outputs(resumed)
    pd.testing.assert_frame_equal(a1, a2)
    pd.testing.assert_frame_equal(l1, l2)
    pd.testing.assert_frame_equal(f1, f2)


def test_scalable_seq_matches_window_seq(spark):
    """The range-partitioned two-phase seq (large-batch path) must assign the
    EXACT same seq as the global-window path, and its plan must not contain a
    single-partition exchange (the scale bottleneck it exists to remove)."""
    import pyspark.sql.functions as F

    from pegasus_spark.crawler.frontier import with_dequeue_seq

    rows = [
        (f"http://h{i % 7}.lianjia.test/pg{i}/", f"h{i % 7}.lianjia.test",
         "listing_page", 1_000_000 + (i % 13), i % 40, 3, f"r{i % 5}",
         "pending", 1, 0)
        for i in range(5000)
    ]
    df = spark.createDataFrame(
        rows,
        "url string, host string, kind string, priority int, page int, "
        "depth int, region string, state string, discovered_round int, "
        "retry_cnt int",
    ).repartition(8)
    small = with_dequeue_seq(df, 3, n_rows=10).select("url", "seq")
    big = with_dequeue_seq(df, 3, n_rows=10_000_000, n_partitions=8)
    plan = big._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, "scalable seq path must not funnel"
    got = {r["url"]: r["seq"] for r in big.select("url", "seq").collect()}
    want = {r["url"]: r["seq"] for r in small.collect()}
    assert got == want


def test_microbatch_equals_per_round(spark, fixture_dir, tmp_path_factory):
    """Round-4 driver-floor amortization: fusing tiny discovery rounds into
    one commit (microbatch_threshold default) must be invisible in every
    LOGICAL output vs per-round commits (threshold=0) — apartments, golden
    fetch_log, URL-seen frontier, and the per-round rounds rows including
    their global state totals. Only the version lists may differ (the batch
    commits at its last round's version; intermediate versions are never
    created)."""
    spec, fx = fixture_dir
    outs, rounds_tables, ckpts = [], [], []
    for mb in (0, 64):
        w = str(tmp_path_factory.mktemp(f"wmb{mb}"))
        s = _mk(spark, spec, fx, w, microbatch_threshold=mb)
        s.run()
        ckpt = s.store.load_checkpoint()
        outs.append(_outputs(s))
        rounds_tables.append(
            s.store.read_appended("rounds", ckpt.appended_rounds)
            .toPandas().sort_values("round").reset_index(drop=True)
        )
        ckpts.append(ckpt)
    (a0, l0, f0), (a1, l1, f1) = outs
    pd.testing.assert_frame_equal(a0, a1)
    pd.testing.assert_frame_equal(l0, l1)
    pd.testing.assert_frame_equal(f0, f1)
    r0, r1 = rounds_tables
    cols = [c for c in r0.columns if c != "wall_s"]  # wall is physical
    pd.testing.assert_frame_equal(r0[cols], r1[cols])
    # same logical round count, counters, and drain flag in the manifest
    assert ckpts[0].round == ckpts[1].round
    assert ckpts[0].counters == ckpts[1].counters
    assert ckpts[0].finished and ckpts[1].finished
    # the micro-batched store actually fused: fewer committed versions
    assert len(ckpts[1].bloom_versions) < len(ckpts[0].bloom_versions)


def test_microbatch_resume_mid_batch_boundary(spark, fixture_dir, tmp_path_factory):
    """run(max_rounds=k) must stop at exactly k logical rounds even when a
    batch would span the boundary, and a fresh scheduler must resume from
    that commit to the identical final state."""
    spec, fx = fixture_dir
    w_ref = str(tmp_path_factory.mktemp("mbref"))
    ref = _mk(spark, spec, fx, w_ref)
    ref.run()

    w = str(tmp_path_factory.mktemp("mbpart"))
    part = _mk(spark, spec, fx, w)
    part.run(max_rounds=2)
    ckpt = part.store.load_checkpoint()
    assert ckpt.round == 2 and not ckpt.finished
    resumed = _mk(spark, spec, fx, w)
    resumed.run()
    a1, l1, f1 = _outputs(ref)
    a2, l2, f2 = _outputs(resumed)
    pd.testing.assert_frame_equal(a1, a2)
    pd.testing.assert_frame_equal(l1, l2)
    pd.testing.assert_frame_equal(f1, f2)


def test_microbatch_overflow_flush_equivalence(spark, fixture_dir, tmp_path_factory):
    """A discovery fan-out larger than the driver budget must overflow to
    the distributed flush (_microbatch_new_rows returns a DataFrame, the
    batch commits immediately) and still produce byte-identical outputs —
    the driver-residency guard is a physical choice, never a semantic one."""
    spec, fx = fixture_dir
    outs = []
    for cap in (100_000, 5):  # normal vs forced-overflow on the first rounds
        w = str(tmp_path_factory.mktemp(f"wcap{cap}"))
        s = _mk(spark, spec, fx, w, microbatch_touched_cap=cap)
        s.run()
        outs.append(_outputs(s))
    (a1, l1, f1), (a2, l2, f2) = outs
    pd.testing.assert_frame_equal(a1, a2)
    pd.testing.assert_frame_equal(l1, l2)
    pd.testing.assert_frame_equal(f1, f2)
