"""Fetch-level fault tolerance: failed URLs re-enqueue up to max_retries,
then rest at state='failed' without aborting the crawl — the rebuild of the
reference's tasklet retry loop (workertask.go:23,218-224)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from pegasus_spark.crawler.fixtures import budget_df, make_site_spec, write_fixture
from pegasus_spark.crawler.scheduler import CrawlScheduler


@pytest.fixture(scope="module")
def crawl_with_missing_pages(spark, tmp_path_factory):
    spec = make_site_spec(n_districts=4, regions_per_district=3, pages_per_region_max=4)
    fx = str(tmp_path_factory.mktemp("fx"))
    write_fixture(spark, spec, fx, round_no=1)
    # break the site: remove two listing pages from the store → 404s
    pages = spark.read.parquet(f"{fx}/site_pages_r1.parquet")
    victims = [
        r["url"]
        for r in pages.filter("kind = 'listing_page'").orderBy("url").limit(2).collect()
    ]
    broken = f"{fx}/site_pages_broken.parquet"
    pages.filter(~F.col("url").isin(victims)).write.parquet(broken)
    work = str(tmp_path_factory.mktemp("work"))
    sched = CrawlScheduler(
        spark, work,
        page_store_path=broken,
        image_store_path=f"{fx}/items_r1.parquet",
        budget=budget_df(spark, spec),
        seed_urls=[spec.root_url],
        now_ts=1_700_000_000,
        max_retries=2,
    )
    sched.run()
    return spec, sched, victims, sched.store.load_checkpoint()


def test_failed_after_retries_exhausted(crawl_with_missing_pages):
    _, sched, victims, ckpt = crawl_with_missing_pages
    frontier = sched.store.read_frontier(ckpt.frontier_version)
    failed = {r["url"]: r["retry_cnt"] for r in frontier.filter("state='failed'").collect()}
    assert set(failed) == set(victims)
    assert all(cnt == 3 for cnt in failed.values())  # initial + 2 retries


def test_each_victim_dequeued_retry_plus_one_times(crawl_with_missing_pages):
    _, sched, victims, ckpt = crawl_with_missing_pages
    log = sched.store.read_appended("fetch_log", ckpt.appended_rounds)
    counts = {
        r["url"]: r["count"]
        for r in log.filter(F.col("url").isin(victims)).groupBy("url").count().collect()
    }
    assert all(counts[u] == 3 for u in victims)


def test_crawl_completes_despite_failures(crawl_with_missing_pages):
    _, sched, victims, ckpt = crawl_with_missing_pages
    assert ckpt.finished
    frontier = sched.store.read_frontier(ckpt.frontier_version)
    assert frontier.filter("state='pending'").count() == 0
    # healthy pages all fetched; apartments exist for unaffected pages
    apt = sched.store.read_apartments(ckpt.apartments_version)
    assert apt.count() > 0
