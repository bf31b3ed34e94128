"""Report-suite parity over crawled tables vs a pure-pandas oracle — the
rebuild of tools/report.py + tools/lianjia_avg.py (entry point C)."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest

from crawl_oracle import expected_after_run2, expected_apartments_run1
from pegasus_spark.analytics.reports import (
    daily_price_series,
    tfloor_histogram,
    top_by_price,
    top_by_size,
    top_by_total,
    top_by_total_with_tfloor,
    total_changes_report,
)
from pegasus_spark.crawler.fixtures import budget_df, make_site_spec, write_fixture
from pegasus_spark.crawler.scheduler import CrawlScheduler

TS1, TS2 = 1_700_000_000, 1_700_086_400  # consecutive days (UTC)


@pytest.fixture(scope="module")
def crawled(spark, tmp_path_factory):
    spec = make_site_spec(n_districts=3, regions_per_district=2, pages_per_region_max=4)
    fx = str(tmp_path_factory.mktemp("fx"))
    write_fixture(spark, spec, fx, round_no=1)
    write_fixture(spark, spec, fx, round_no=2)
    work = str(tmp_path_factory.mktemp("work"))
    sched = CrawlScheduler(
        spark, work, f"{fx}/site_pages_r1.parquet", f"{fx}/items_r1.parquet",
        budget_df(spark, spec), seed_urls=[spec.root_url], now_ts=TS1,
    )
    sched.run()
    run1_rounds = list(sched.store.load_checkpoint().appended_rounds)
    sched.new_run(f"{fx}/site_pages_r2.parquet", now_ts=TS2)
    sched.image_store_path = f"{fx}/items_r2.parquet"
    sched.run()
    ckpt = sched.store.load_checkpoint()
    run2_rounds = [r for r in ckpt.appended_rounds if r not in run1_rounds]
    apartments = sched.store.read_apartments(ckpt.apartments_version).cache()
    changes = sched.store.read_appended("changes", run2_rounds).cache()
    exp_final, exp_changes, _ = expected_after_run2(spec, TS1, TS2)
    return spec, apartments, changes, exp_final, exp_changes


def test_top_by_total(crawled):
    _, apartments, _, exp_final, _ = crawled
    got = [(r["aid"], r["total"]) for r in top_by_total(apartments, 10).collect()]
    exp = sorted(exp_final.values(), key=lambda r: (-r["total"], r["aid"]))[:10]
    assert got == [(r["aid"], r["total"]) for r in exp]


def _mysql_decimal(s: str) -> int:
    """MySQL CONVERT(x, DECIMAL) = DECIMAL(10,0): round-half-up to integer."""
    import decimal

    return int(decimal.Decimal(s).quantize(0, rounding=decimal.ROUND_HALF_UP))


def test_top_by_price_and_size(crawled):
    _, apartments, _, exp_final, _ = crawled
    got_p = [r["aid"] for r in top_by_price(apartments, 10).collect()]
    exp_p = [r["aid"] for r in
             sorted(exp_final.values(), key=lambda r: (-r["price"], r["aid"]))[:10]]
    assert got_p == exp_p
    got_s = [r["aid"] for r in top_by_size(apartments, 10).collect()]
    exp_s = [r["aid"] for r in
             sorted(exp_final.values(),
                    key=lambda r: (-_mysql_decimal(r["size"]), r["aid"]))[:10]]
    assert got_s == exp_s


def test_ascending_variants_and_freshness(crawled):
    """total2/price2/size2 (report.py:205-263) + the DAYOFMONTH freshness
    filter every reference top-K carries: with now_ts=TS2 only listings
    updated on day-of-month(TS2) qualify; price1's quirk selects
    day-of-month(NOW())-1 instead (report.py:228)."""
    _, apartments, _, exp_final, _ = crawled
    d2 = dt.datetime.fromtimestamp(TS2, dt.timezone.utc).day
    fresh2 = [r for r in exp_final.values()
              if dt.datetime.fromtimestamp(r["uts"], dt.timezone.utc).day == d2]
    fresh1 = [r for r in exp_final.values()
              if dt.datetime.fromtimestamp(r["uts"], dt.timezone.utc).day == d2 - 1]
    got_t2 = [r["aid"] for r in
              top_by_total(apartments, 10, ascending=True, now_ts=TS2).collect()]
    exp_t2 = [r["aid"] for r in sorted(fresh2, key=lambda r: (r["total"], r["aid"]))[:10]]
    assert got_t2 == exp_t2
    got_p1 = [r["aid"] for r in top_by_price(apartments, 10, now_ts=TS2).collect()]
    exp_p1 = [r["aid"] for r in sorted(fresh1, key=lambda r: (-r["price"], r["aid"]))[:10]]
    assert got_p1 == exp_p1
    got_s2 = [r["aid"] for r in
              top_by_size(apartments, 10, ascending=True, now_ts=TS2).collect()]
    exp_s2 = [r["aid"] for r in
              sorted(fresh2, key=lambda r: (_mysql_decimal(r["size"]), r["aid"]))[:10]]
    assert got_s2 == exp_s2
    got_tf = [(r["aid"], r["tfloor"]) for r in
              top_by_total_with_tfloor(apartments, 10, now_ts=TS2).collect()]
    exp_tf = [(r["aid"], r["tfloor"]) for r in
              sorted(fresh2, key=lambda r: (r["total"], r["aid"]))[:10]]
    assert got_tf == exp_tf


def test_tfloor_histogram(crawled):
    _, apartments, _, exp_final, _ = crawled
    got = {r["tfloor"]: r["count"] for r in tfloor_histogram(apartments).collect()}
    exp: dict[int, int] = {}
    for r in exp_final.values():
        exp[r["tfloor"]] = exp.get(r["tfloor"], 0) + 1
    assert got == exp


def test_total_changes_report_faithful(crawled):
    """priceInc faithfully diffs TOTAL (report.py:268-270), applies the
    DATEDIFF(NOW(), ts) <= 3 window (report.py:273) and emits the
    DATE_FORMAT date column (report.py:274)."""
    _, apartments, changes, exp_final, exp_changes = crawled
    got = total_changes_report(apartments, changes, "inc", 10, now_ts=TS2).collect()
    exp_inc = sorted(
        exp_changes, key=lambda c: (-(c["new_total"] - c["old_total"]), c["aid"])
    )
    assert [r["aid"] for r in got] == [c["aid"] for c in exp_inc[:10]]
    assert [r["change"] for r in got] == [
        c["new_total"] - c["old_total"] for c in exp_inc[:10]
    ]
    d2 = dt.datetime.fromtimestamp(TS2, dt.timezone.utc).date().isoformat()
    assert all(r["date"] == d2 for r in got)  # all changes happened at TS2
    # location joined back correctly (J5 decorrelated lookup)
    by_aid = {r["aid"]: r["location"] for r in got}
    locs = {r["aid"]: r["location"] for r in exp_final.values()}
    for aid, loc in by_aid.items():
        assert loc == locs[aid]
    # window excludes everything when NOW is far past the change stream
    later = TS2 + 10 * 86400
    assert total_changes_report(apartments, changes, "inc", 10, now_ts=later).count() == 0


def test_total_changes_ratio_order(crawled):
    """priceIncRatio/priceDecRatio (report.py:301-335): ordered by
    (new-old)/old, not the absolute diff; ratio displayed ×100."""
    _, apartments, changes, _, exp_changes = crawled
    got = total_changes_report(
        apartments, changes, "inc", 10, by_ratio=True, now_ts=TS2
    ).collect()
    exp = sorted(
        exp_changes,
        key=lambda c: (
            -round((c["new_total"] - c["old_total"]) / c["old_total"], 6),
            c["aid"],
        ),
    )[:10]
    assert [r["aid"] for r in got] == [c["aid"] for c in exp]
    for r, c in zip(got, exp):
        assert float(r["ratio_pct"]) == round(
            (c["new_total"] - c["old_total"]) / c["old_total"] * 100, 2
        )
    dec = total_changes_report(
        apartments, changes, "dec", 10, by_ratio=True, now_ts=TS2
    ).collect()
    exp_dec = sorted(
        exp_changes,
        key=lambda c: (
            round((c["new_total"] - c["old_total"]) / c["old_total"], 6),
            c["aid"],
        ),
    )[:10]
    assert [r["aid"] for r in dec] == [c["aid"] for c in exp_dec]


def test_daily_price_series(crawled):
    _, apartments, changes, exp_final, exp_changes = crawled
    got = {r["day"]: r for r in daily_price_series(apartments, changes).collect()}
    d1 = dt.datetime.fromtimestamp(TS1, dt.timezone.utc).date()
    d2 = dt.datetime.fromtimestamp(TS2, dt.timezone.utc).date()
    assert set(got) == {d1, d2}

    # pandas oracle: day1 = all run-1 listings at run-1 prices; day2 = all
    # run-2-active listings at their final prices
    run1 = expected_apartments_run1(
        # spec is first element of the fixture tuple
        crawled[0], TS1
    )
    day1_prices = [r["price"] for r in run1.values()]
    day2_prices = [r["price"] for r in exp_final.values() if r["uts"] == TS2]
    assert got[d1]["active_cnt"] == len(day1_prices)
    assert got[d2]["active_cnt"] == len(day2_prices)
    assert float(got[d1]["avg_price"]) == round(sum(day1_prices) / len(day1_prices), 2)
    assert float(got[d2]["avg_price"]) == round(sum(day2_prices) / len(day2_prices), 2)
    assert got[d1]["median_price"] == float(pd.Series(day1_prices).median())
    assert got[d2]["median_price"] == float(pd.Series(day2_prices).median())


def test_dup_rate_report_corpus_wide_group_sizes(spark):
    """The shared dup-rate core (reports.dup_rate_report): exact/fingerprint
    group sizes are CORPUS-wide (a fingerprint shared across two groups
    marks rows in both), per-group counts and rate follow."""
    from pegasus_spark.analytics.reports import dup_rate_report

    df = spark.createDataFrame(
        [
            ("a", "h1", "f1"),
            ("a", "h1", "f1"),   # exact + fp dup pair inside a
            ("a", "h2", "f2"),
            ("b", "h3", "f1"),   # fp ties to group a's f1, no exact dup
            ("b", "h4", "f4"),
        ],
        "src string, h string, fp string",
    )
    rows = {r["src"]: r for r in dup_rate_report(df, "src", "h", "fp").collect()}
    assert rows["a"]["n_docs"] == 3
    assert rows["a"]["n_exact_dups"] == 2 and rows["a"]["n_fp_dups"] == 2
    assert float(rows["a"]["fp_dup_rate"]) == round(2 / 3, 4)
    assert rows["b"]["n_docs"] == 2
    assert rows["b"]["n_exact_dups"] == 0 and rows["b"]["n_fp_dups"] == 1
    assert float(rows["b"]["fp_dup_rate"]) == 0.5


def test_caption_dup_report_regions_from_image_id(spark):
    """Crawl-side triage: regions parse out of the img-{abbr}-{page}-{pos}
    id scheme; exact = caption md5, fingerprint = phash."""
    from pegasus_spark.analytics.reports import caption_dup_report

    items = spark.createDataFrame(
        [
            ("img-ra-0001-01", "nice flat", 10),
            ("img-ra-0001-02", "nice flat", 10),  # exact + phash dup
            ("img-rb-0002-01", "other flat", 10),  # phash ties to ra rows
            ("img-rb-0002-02", "unique flat", 77),
        ],
        "image_id string, caption string, phash long",
    )
    rows = {r["region"]: r for r in caption_dup_report(items).collect()}
    assert set(rows) == {"ra", "rb"}
    assert rows["ra"]["n_docs"] == 2
    assert rows["ra"]["n_exact_dups"] == 2 and rows["ra"]["n_fp_dups"] == 2
    assert rows["rb"]["n_exact_dups"] == 0 and rows["rb"]["n_fp_dups"] == 1


def test_caption_span_report_and_boilerplate_spans(spark):
    """Boilerplate-span triage recomputed by hand: 4-token spans shared
    across captions flag both carriers; the per-region rollup and the
    top-span listing agree with the manual count."""
    from pegasus_spark.analytics.reports import boilerplate_spans, caption_span_report

    items = spark.createDataFrame(
        [
            ("img-ra-0001-01", "a b c d e"),   # spans: "a b c d", "b c d e"
            ("img-ra-0001-02", "x a b c d"),   # shares "a b c d" → both flagged
            ("img-rb-0002-01", "p q r s t"),   # spans: "p q r s", "q r s t"
            ("img-rb-0002-02", "p q r s u"),   # shares "p q r s" → both flagged
        ],
        "image_id string, caption string",
    )
    rows = {r["region"]: r for r in caption_span_report(items, n=4).collect()}
    assert set(rows) == {"ra", "rb"}
    assert rows["ra"]["n_captions"] == 2 and rows["ra"]["n_flagged"] == 2
    assert float(rows["ra"]["flagged_rate"]) == 1.0
    assert float(rows["ra"]["avg_dup_ratio"]) == 0.5  # 1 of 2 spans each
    assert rows["rb"]["n_captions"] == 2 and rows["rb"]["n_flagged"] == 2
    assert float(rows["rb"]["avg_dup_ratio"]) == 0.5

    spans = boilerplate_spans(items, n=4, top=10).collect()
    got = {r["span"]: (r["n_occurrences"], r["n_captions"]) for r in spans}
    assert got == {"a b c d": (2, 2), "p q r s": (2, 2)}
    # deterministic tie-break: counts equal → span ascending
    assert [r["span"] for r in spans] == ["a b c d", "p q r s"]


def test_caption_pii_report_counts_by_region(spark):
    """PII triage recomputed by hand: captions carrying an email / IPv4 /
    phone flag their region's rollup; clean captions don't."""
    from pegasus_spark.analytics.reports import caption_pii_report

    items = spark.createDataFrame(
        [
            ("img-ra-0001-01", "contact agent@homes.example.com today"),
            ("img-ra-0001-02", "lovely flat near the park"),
            ("img-rb-0002-01", "call 555-867-5309 or visit 10.1.2.3"),
            ("img-rb-0002-02", "mail a@b.io and c@d.org now"),
            ("img-rb-0003-01", "no pii in this caption"),
        ],
        "image_id string, caption string",
    )
    rows = {r["region"]: r for r in caption_pii_report(items).collect()}
    assert set(rows) == {"ra", "rb"}
    ra, rb = rows["ra"], rows["rb"]
    assert (ra["n_captions"], ra["n_with_pii"]) == (2, 1)
    assert (ra["n_email"], ra["n_ipv4"], ra["n_phone"]) == (1, 0, 0)
    assert float(ra["pii_rate"]) == 0.5
    assert (rb["n_captions"], rb["n_with_pii"]) == (3, 2)
    assert (rb["n_email"], rb["n_ipv4"], rb["n_phone"]) == (2, 1, 1)
    assert abs(float(rb["pii_rate"]) - 0.6667) < 1e-9


def test_caption_datacard_by_region(spark):
    """Per-region datasheet recomputed by hand: volume, token totals, dup
    rates, mean length/megapixels, and the dominant format (count desc,
    fmt asc tie-break)."""
    from pegasus_spark.analytics.reports import caption_datacard

    items = spark.createDataFrame(
        [
            ("img-ra-0001-01", "nice flat here", 10, 100, 200, "png"),
            ("img-ra-0001-02", "nice flat here", 10, 300, 100, "jpeg"),
            ("img-ra-0002-01", "other flat", 11, 200, 200, "jpeg"),
            ("img-rb-0002-02", "unique flat", 12, 400, 500, "png"),
            ("img-rb-0003-01", "lone flat", 13, 100, 100, "jpeg"),
        ],
        "image_id string, caption string, phash long, w int, h int, fmt string",
    )
    rows = {r["region"]: r for r in caption_datacard(items).collect()}
    assert set(rows) == {"ra", "rb"}
    ra, rb = rows["ra"], rows["rb"]
    assert ra["n_images"] == 3 and rb["n_images"] == 2
    assert ra["total_caption_tokens"] == 3 + 3 + 2
    assert rb["total_caption_tokens"] == 2 + 2
    assert float(ra["pct_corpus"]) == 0.6 and float(rb["pct_corpus"]) == 0.4
    assert float(ra["caption_dup_rate"]) == round(1 - 2 / 3, 4)
    assert float(ra["phash_dup_rate"]) == round(1 - 2 / 3, 4)
    assert float(rb["caption_dup_rate"]) == 0.0
    assert float(ra["mean_caption_chars"]) == round((14 + 14 + 10) / 3, 2)
    assert float(ra["mean_megapixels"]) == round(
        (100 * 200 + 300 * 100 + 200 * 200) / 3 / 1e6, 3
    )
    assert float(rb["mean_megapixels"]) == round(
        (400 * 500 + 100 * 100) / 2 / 1e6, 3
    )
    # ra: jpeg 2 vs png 1 → jpeg; rb: 1-1 tie → fmt ascending → jpeg
    assert ra["top_fmt"] == "jpeg" and rb["top_fmt"] == "jpeg"


def test_image_cluster_density_flags_chained_merges(spark):
    """A drift chain A~B~C (3 bits per hop, endpoints at 6 bits — outside
    the radius) must land in ONE cluster whose density shows it was merged
    by chaining (2 of 3 possible pairs direct → 666‰), next to an honest
    pair at 1000‰; singletons never report."""
    from pegasus_spark.analytics.reports import image_cluster_density

    items = spark.createDataFrame(
        [
            ("img-ra-0001-01", 0),            # A
            ("img-ra-0001-02", 0b111),        # B: 3 bits from A
            ("img-ra-0001-03", 0b111111),     # C: 3 bits from B, 6 from A
            ("img-rb-0002-01", 0xFF00000000),  # D: 8 bits from A/B/C region
            ("img-rb-0002-02", 0xFF00000001),  # E: 1 bit from D
            ("img-rb-0003-01", 0x5A5A5A5A5A5A5A5A),  # far singleton
        ],
        "image_id string, phash long",
    )
    rows = {r["cluster_size"]: r for r in image_cluster_density(items).collect()}
    assert set(rows) == {2, 3}
    assert rows[2]["n_clusters"] == 1
    assert rows[2]["n_direct_pairs"] == 1
    assert rows[2]["n_possible_pairs"] == 1
    assert rows[2]["density_milli"] == 1000
    assert rows[3]["n_clusters"] == 1
    assert rows[3]["n_direct_pairs"] == 2  # A-B and B-C; A-C exceeds radius
    assert rows[3]["n_possible_pairs"] == 3
    assert rows[3]["density_milli"] == 666


def test_caption_dup_histogram_yield_curve(spark):
    """Crawl-side dedup yield curve: 3 captions shared by 2/3/1 items →
    histogram rows (1,1), (2,1), (3,1) with cum_docs 1→3→6."""
    from pegasus_spark.analytics.reports import caption_dup_histogram

    items = spark.createDataFrame(
        [
            ("img-ra-0001-01", "nice flat", 10),
            ("img-ra-0001-02", "nice flat", 11),
            ("img-ra-0002-01", "big flat", 12),
            ("img-rb-0002-02", "big flat", 13),
            ("img-rb-0003-01", "big flat", 14),
            ("img-rb-0003-02", "unique flat", 15),
        ],
        "image_id string, caption string, phash long",
    )
    rows = {r["group_size"]: r for r in caption_dup_histogram(items).collect()}
    assert rows[1]["n_clusters"] == 1 and rows[1]["cum_docs"] == 1
    assert rows[2]["n_clusters"] == 1 and rows[2]["cum_docs"] == 3
    assert rows[3]["n_clusters"] == 1 and rows[3]["cum_docs"] == 6
    assert sum(r["n_dupes"] for r in rows.values()) == 6 - 3


def test_recrawl_schedule(crawled):
    """Change-frequency re-crawl scheduling over the two-run CDC store:
    interval/next-due/overdue recomputed in plain Python from the collected
    apartments + changes tables, horizon fallback for never-changed
    listings, and nothing freshly-changed is due at the change instant."""
    from pegasus_spark.analytics.reports import recrawl_schedule

    _, apartments, changes, _, _ = crawled
    now = TS2 + 8 * 86400
    got = {
        (r["aid"], r["region"]): r
        for r in recrawl_schedule(apartments, changes, now).collect()
    }
    ap = apartments.select("aid", "region", "nts").collect()
    by_key: dict[tuple, list[int]] = {}
    for r in changes.select("aid", "region", "ts").collect():
        by_key.setdefault((r["aid"], r["region"]), []).append(r["ts"])
    assert by_key, "fixture must produce run-2 changes"
    assert len(got) == len(ap)
    for r in ap:
        k = (r["aid"], r["region"])
        g = got[k]
        ts_list = by_key.get(k)
        if ts_list:
            last_obs = max(ts_list)
            interval = (last_obs - r["nts"]) // len(ts_list)
            assert g["n_changes"] == len(ts_list)
        else:
            last_obs, interval = r["nts"], 7 * 86400
            assert g["n_changes"] == 0
        assert g["interval_s"] == interval
        assert g["next_due_ts"] == last_obs + interval
        assert g["overdue_s"] == now - (last_obs + interval)
        assert g["due_now"] == (now >= last_obs + interval)

    # at the change instant itself, a just-changed listing is never due:
    # its interval is the full nts->change span
    got_now = {
        (r["aid"], r["region"]): r
        for r in recrawl_schedule(apartments, changes, TS2).collect()
    }
    for k in by_key:
        assert not got_now[k]["due_now"], k
