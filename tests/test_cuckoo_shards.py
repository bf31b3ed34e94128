"""Distributed cuckoo shards: insert/check/delete over DataFrames — the
deletion-capable URL-seen fallback (e.g. purging a host after a robots
change) — plus frontier snapshot diff/compaction lifecycle."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from pegasus_spark.crawler.bloom import CuckooShards


def _keys(spark, n, offset=0):
    return spark.range(offset, offset + n).select(
        F.xxhash64(F.concat(F.lit("u-"), F.col("id"))).alias("url_hash64")
    )


@pytest.fixture(scope="module")
def shards(spark):
    cs = CuckooShards(n_shards=8, n_buckets=1 << 11)
    built = cs.build(_keys(spark, 3000), version=0)
    built.cache().count()
    return cs, built


def test_no_false_negatives(spark, shards):
    cs, built = shards
    res = cs.check_broadcast(spark, _keys(spark, 3000), built)
    assert res.filter(~F.col("maybe_seen")).count() == 0


def test_fpr_reasonable(spark, shards):
    cs, built = shards
    fresh = _keys(spark, 3000, offset=10_000_000)
    fp = cs.check_broadcast(spark, fresh, built).filter("maybe_seen").count()
    assert fp / 3000 < 0.05


def test_delete_restores_unseen(spark, shards):
    cs, built = shards
    victims = _keys(spark, 500)  # first 500 of the inserted set
    v1 = cs.delete(built, victims, version=1)
    v1.cache().count()
    # deleted keys mostly unseen again (fingerprint collisions allowed)
    still = cs.check_broadcast(spark, victims, v1).filter("maybe_seen").count()
    assert still < 50
    # survivors all still present
    survivors = _keys(spark, 2500, offset=500)
    missing = cs.check_broadcast(spark, survivors, v1).filter(~F.col("maybe_seen")).count()
    assert missing == 0


def test_insert_into_existing(spark, shards):
    cs, built = shards
    extra = _keys(spark, 1000, offset=20_000_000)
    v1 = cs.insert(built, extra, version=1)
    res = cs.check_broadcast(spark, extra, v1)
    assert res.filter(~F.col("maybe_seen")).count() == 0
    # originals retained
    res0 = cs.check_broadcast(spark, _keys(spark, 3000), v1)
    assert res0.filter(~F.col("maybe_seen")).count() == 0


class TestSnapshotLifecycle:
    @pytest.fixture(scope="class")
    def crawl(self, spark, tmp_path_factory):
        from pegasus_spark.crawler.fixtures import budget_df, make_site_spec, write_fixture
        from pegasus_spark.crawler.scheduler import CrawlScheduler

        spec = make_site_spec(n_districts=3, regions_per_district=2, pages_per_region_max=3)
        fx = str(tmp_path_factory.mktemp("fx"))
        write_fixture(spark, spec, fx, round_no=1)
        work = str(tmp_path_factory.mktemp("work"))
        sched = CrawlScheduler(
            spark, work, f"{fx}/site_pages_r1.parquet", f"{fx}/items_r1.parquet",
            budget_df(spark, spec), seed_urls=[spec.root_url], now_ts=1,
        )
        sched.run()
        return sched

    def test_snapshot_diff(self, crawl):
        ckpt = crawl.store.load_checkpoint()
        diff = crawl.store.snapshot_diff(0, ckpt.frontier_version)
        kinds = {r["change_type"] for r in diff.select("change_type").distinct().collect()}
        assert kinds == {"added", "state_changed"}
        # the seed url transitioned pending → fetched
        seed = diff.filter(F.col("kind") == "root").collect()[0]
        assert (seed["old_state"], seed["state"]) == ("pending", "fetched")

    def test_compact_keeps_current(self, crawl):
        ckpt = crawl.store.load_checkpoint()
        removed = crawl.store.compact(keep_last=1)
        assert removed, "old versions should be removed"
        # current snapshot still readable; resume state intact
        assert crawl.store.read_frontier(ckpt.frontier_version).count() > 0
        assert crawl.store.read_bloom(ckpt.bloom_versions) is not None

    def test_compact_keeps_in_flight_bloom_version(self, crawl):
        """The scheduler writes a round's bloom shards BEFORE the round's
        checkpoint commit; a concurrent compaction must treat versions above
        the committed round as live."""
        import os

        ckpt = crawl.store.load_checkpoint()
        inflight = os.path.join(crawl.store.workdir, "bloom", f"v{ckpt.round + 1}")
        os.makedirs(inflight, exist_ok=True)
        crawl.store.compact(keep_last=1)
        assert os.path.isdir(inflight), "in-flight bloom delta must survive compact"
        os.rmdir(inflight)


def test_cuckoo_shard_overflow_detected(spark):
    """A full cuckoo shard must fail the build loudly instead of silently
    dropping keys (silent drops = false negatives in the URL-seen filter)."""
    import pytest
    from py4j.protocol import Py4JJavaError

    from pegasus_spark.crawler.bloom import CuckooShards

    cs = CuckooShards(n_shards=1, n_buckets=4)  # capacity 16 slots
    keys = spark.range(0, 500).selectExpr("CAST(id * 2654435761 AS BIGINT) AS url_hash64")
    with pytest.raises((Py4JJavaError, Exception), match="overflow"):
        cs.build(keys).collect()
