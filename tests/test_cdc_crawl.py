"""CDC golden tests (SURVEY §5.4): two crawl runs over the mutated fixture —
change/meta-change rows, nts preservation, visitcnt blacklist — vs the
pure-pandas oracle."""

from __future__ import annotations

import pandas as pd
import pytest

from crawl_oracle import expected_after_run2
from pegasus_spark.crawler.fixtures import budget_df, make_site_spec, write_fixture
from pegasus_spark.crawler.scheduler import CrawlScheduler

TS1, TS2 = 1_700_000_000, 1_700_086_400


@pytest.fixture(scope="module")
def two_runs(spark, tmp_path_factory):
    spec = make_site_spec(n_districts=4, regions_per_district=3, pages_per_region_max=5)
    fx = str(tmp_path_factory.mktemp("fx"))
    write_fixture(spark, spec, fx, round_no=1)
    write_fixture(spark, spec, fx, round_no=2)
    work = str(tmp_path_factory.mktemp("work"))
    sched = CrawlScheduler(
        spark, work,
        page_store_path=f"{fx}/site_pages_r1.parquet",
        image_store_path=f"{fx}/items_r1.parquet",
        budget=budget_df(spark, spec),
        seed_urls=[spec.root_url],
        now_ts=TS1,
    )
    sched.run()
    run1_rounds = list(sched.store.load_checkpoint().appended_rounds)
    sched.new_run(f"{fx}/site_pages_r2.parquet", now_ts=TS2)
    sched.image_store_path = f"{fx}/items_r2.parquet"
    sched.run()
    ckpt = sched.store.load_checkpoint()
    run2_rounds = [r for r in ckpt.appended_rounds if r not in run1_rounds]
    return spec, sched, ckpt, run2_rounds


def _sorted(df: pd.DataFrame, keys: list[str]) -> pd.DataFrame:
    return df.sort_values(keys).reset_index(drop=True)


def test_final_apartments_match_oracle(two_runs):
    spec, sched, ckpt, _ = two_runs
    exp_final, _, _ = expected_after_run2(spec, TS1, TS2)
    exp = _sorted(pd.DataFrame(list(exp_final.values())), ["region", "aid"])
    got = _sorted(
        sched.store.read_apartments(ckpt.apartments_version).toPandas(), ["region", "aid"]
    )
    assert len(got) == len(exp)
    got = got[exp.columns]
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_nts_preserved_uts_bumped(two_runs):
    spec, sched, ckpt, _ = two_runs
    apt = sched.store.read_apartments(ckpt.apartments_version).toPandas()
    resurveyed = apt[apt["uts"] == TS2]
    assert len(resurveyed) > 0
    # every re-seen listing keeps its run-1 first-seen ts unless new in run 2
    exp_final, _, _ = expected_after_run2(spec, TS1, TS2)
    exp_nts = {(r["region"], r["aid"]): r["nts"] for r in exp_final.values()}
    for _, row in resurveyed.iterrows():
        assert row["nts"] == exp_nts[(row["region"], row["aid"])]


def test_changes_match_oracle(two_runs):
    spec, sched, ckpt, run2_rounds = two_runs
    exp_final, exp_changes, _ = expected_after_run2(spec, TS1, TS2)
    got = sched.store.read_appended("changes", run2_rounds)
    got = _sorted(got.toPandas(), ["region", "aid"])
    exp = _sorted(pd.DataFrame(exp_changes), ["region", "aid"]) if exp_changes else pd.DataFrame()
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(got[exp.columns], exp, check_dtype=False)


def test_meta_changes_match_oracle_and_blacklist(two_runs):
    spec, sched, ckpt, run2_rounds = two_runs
    _, _, exp_meta = expected_after_run2(spec, TS1, TS2)
    got = sched.store.read_appended("meta_changes", run2_rounds).toPandas()
    assert "visitcnt" not in set(got["item"])  # blacklist (updatedb.go:336-338)
    assert "nts" not in set(got["item"]) and "uts" not in set(got["item"])
    got = _sorted(got, ["region", "aid", "item"])
    exp = _sorted(pd.DataFrame(exp_meta), ["region", "aid", "item"])
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(got[exp.columns], exp, check_dtype=False)


def test_run1_changes_empty(two_runs):
    """First run inserts everything — no change rows may exist for run 1."""
    spec, sched, ckpt, run2_rounds = two_runs
    run1_rounds = [r for r in ckpt.appended_rounds if r not in run2_rounds]
    ch = sched.store.read_appended("changes", run1_rounds)
    assert ch is None or ch.count() == 0


def test_price_history_scd2(two_runs, capsys):
    """SCD2 price-validity intervals (reports.price_history + `status
    --history`): changed aids get (old_price @ nts=TS1 → new_price @ TS2,
    open), unchanged aids one open interval — checked against the pandas
    CDC oracle's change set."""
    import json

    from pegasus_spark.analytics.reports import price_history
    from pegasus_spark.crawler.status import crawl_price_history, main

    spec, sched, ckpt, run2_rounds = two_runs
    apartments = sched.store.read_apartments(ckpt.apartments_version)
    changes = sched.store.read_appended("changes", ckpt.appended_rounds)
    hist = {}
    for r in price_history(apartments, changes).collect():
        hist.setdefault(r["aid"], []).append(r)

    exp_changes = expected_after_run2(spec, TS1, TS2)[1]
    changed = {c["aid"]: c for c in exp_changes}
    apt = {r["aid"]: r for r in apartments.collect()}
    assert set(hist) == set(apt)
    for aid, rows in hist.items():
        assert [r["valid_from"] for r in rows] == sorted(r["valid_from"] for r in rows)
        assert rows[-1]["is_current"] and rows[-1]["valid_to"] is None
        assert rows[-1]["price"] == apt[aid]["price"]
        assert rows[0]["valid_from"] == apt[aid]["nts"]
        if aid in changed:
            assert len(rows) == 2, rows
            assert rows[0]["price"] == changed[aid]["old_price"]
            assert rows[0]["valid_to"] == TS2
            assert rows[1]["price"] == changed[aid]["new_price"]
            assert rows[1]["valid_from"] == TS2
        else:
            assert len(rows) == 1, rows

    rep = crawl_price_history(sched.spark, sched.store.workdir, sched.store)
    assert rep["n_tracked"] == len(apt)
    assert rep["n_changed"] == len(changed)
    assert {h["aid"] for h in rep["histories"]} == set(changed)

    rc = main(["--history", sched.store.workdir])
    assert rc == 0
    payload = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert payload["price_history"] == rep
