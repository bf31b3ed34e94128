"""Atomic-commit contract: the checkpoint manifest is the round's commit
point. Artifacts written by a round that CRASHED before its manifest update
(partial frontier snapshot, appends, bloom shards) must be invisible to
resume — the re-run round overwrites them and the final state equals an
uninterrupted run's."""

from __future__ import annotations

import json
import os

import pandas as pd
import pytest

from pegasus_spark.crawler.fixtures import budget_df, make_site_spec, write_fixture
from pegasus_spark.crawler.scheduler import CrawlScheduler

TS = 1_700_000_000


def _mk(spark, spec, fx, work):
    return CrawlScheduler(
        spark, work,
        page_store_path=f"{fx}/site_pages_r1.parquet",
        image_store_path=f"{fx}/items_r1.parquet",
        budget=budget_df(spark, spec),
        seed_urls=[spec.root_url],
        now_ts=TS,
    )


def _final_outputs(sched):
    ckpt = sched.store.load_checkpoint()
    apt = (
        sched.store.read_apartments(ckpt.apartments_version)
        .toPandas().sort_values(["region", "aid"]).reset_index(drop=True)
    )
    log = (
        sched.store.read_appended("fetch_log", ckpt.appended_rounds)
        .toPandas().sort_values(["round", "seq"]).reset_index(drop=True)
    )
    return ckpt, apt, log


@pytest.fixture(scope="module")
def fixture_dir(spark, tmp_path_factory):
    spec = make_site_spec(n_districts=3, regions_per_district=2, pages_per_region_max=3)
    fx = str(tmp_path_factory.mktemp("fx"))
    write_fixture(spark, spec, fx, round_no=1)
    return spec, fx


def test_crashed_round_artifacts_ignored_on_resume(spark, fixture_dir, tmp_path_factory):
    spec, fx = fixture_dir
    # clean reference run
    w_ref = str(tmp_path_factory.mktemp("ref"))
    ref = _mk(spark, spec, fx, w_ref)
    ref.run()
    _, apt_ref, log_ref = _final_outputs(ref)

    # crashed run: stop after round 2, then fake a round-3 crash — partial
    # artifacts on disk, manifest NOT updated
    w = str(tmp_path_factory.mktemp("crash"))
    part = _mk(spark, spec, fx, w)
    part.run(max_rounds=2)
    ckpt = part.store.load_checkpoint()
    assert ckpt.round == 2 and not ckpt.finished
    crash_round = ckpt.round + 1
    # garbage partial outputs a dying driver could leave behind
    os.makedirs(f"{w}/frontier/v{crash_round}", exist_ok=True)
    with open(f"{w}/frontier/v{crash_round}/part-00000.parquet", "w") as f:
        f.write("NOT A PARQUET FILE")
    os.makedirs(f"{w}/fetch_log/r{crash_round}", exist_ok=True)
    with open(f"{w}/fetch_log/r{crash_round}/junk", "w") as f:
        f.write("junk")
    os.makedirs(f"{w}/bloom/v{crash_round}", exist_ok=True)
    with open(f"{w}/bloom/v{crash_round}/junk", "w") as f:
        f.write("junk")

    # fresh scheduler resumes from the manifest; round 3 re-runs and
    # OVERWRITES the garbage
    resumed = _mk(spark, spec, fx, w)
    resumed.run()
    _, apt_res, log_res = _final_outputs(resumed)
    pd.testing.assert_frame_equal(apt_ref, apt_res)
    pd.testing.assert_frame_equal(log_ref, log_res)


def test_manifest_write_is_atomic(spark, fixture_dir, tmp_path_factory):
    """A torn manifest cannot exist: write goes to .tmp then os.replace.
    Simulate a leftover .tmp and confirm load ignores it."""
    spec, fx = fixture_dir
    w = str(tmp_path_factory.mktemp("atomic"))
    s = _mk(spark, spec, fx, w)
    s.run(max_rounds=1)
    good = s.store.load_checkpoint()
    with open(s.store.manifest_path + ".tmp", "w") as f:
        f.write('{"torn": ')
    again = _mk(spark, spec, fx, w)
    loaded = again.store.load_checkpoint()
    assert loaded is not None and loaded.round == good.round
    assert json.dumps(loaded.counters) == json.dumps(good.counters)
