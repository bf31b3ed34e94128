"""Bloom/cuckoo property tests (SURVEY.md §5.8): no false negatives, FPR
within bound, deletion restores membership behavior, both membership paths
(broadcast + shard-partitioned) agree."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
import pytest

from pegasus_spark.crawler.bloom import BloomShards, CuckooFilter, optimal_params


def _keys_df(spark, n, offset=0):
    return spark.range(offset, offset + n).select(
        F.xxhash64(F.concat(F.lit("url-"), F.col("id"))).alias("url_hash64")
    )


@pytest.fixture(scope="module")
def built(spark):
    bf = BloomShards.sized_for(expected_n=5000, n_shards=8, fpr=0.01)
    inserted = _keys_df(spark, 5000)
    shards = bf.build(inserted, version=1)
    shards.cache().count()
    return bf, inserted, shards


def test_no_false_negatives_broadcast(spark, built):
    bf, inserted, shards = built
    res = bf.check_broadcast(spark, inserted, shards)
    assert res.filter(~F.col("maybe_seen")).count() == 0


def test_no_false_negatives_partitioned(spark, built):
    bf, inserted, shards = built
    res = bf.check_partitioned(inserted, shards)
    assert res.filter(~F.col("maybe_seen")).count() == 0


def test_fpr_within_bound(spark, built):
    bf, _, shards = built
    fresh = _keys_df(spark, 5000, offset=1_000_000)
    hits = bf.check_broadcast(spark, fresh, shards).filter("maybe_seen").count()
    assert hits / 5000 < 0.03  # 3× slack over the 1% design point


def test_paths_agree(spark, built):
    bf, _, shards = built
    probe = _keys_df(spark, 2000, offset=500_000).union(_keys_df(spark, 2000))
    a = bf.check_broadcast(spark, probe, shards).groupBy("maybe_seen").count()
    b = bf.check_partitioned(probe, shards).groupBy("maybe_seen").count()
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_version_merge_is_union(spark, built):
    bf, _, shards_v1 = built
    extra = _keys_df(spark, 1000, offset=2_000_000)
    shards_v2 = bf.build(extra, version=2)
    both = shards_v1.unionByName(shards_v2)
    res = bf.check_broadcast(spark, extra, both)
    assert res.filter(~F.col("maybe_seen")).count() == 0
    merged = BloomShards.merge(both)
    assert merged.agg(F.max("version")).collect()[0][0] == 2
    assert merged.count() == merged.select("shard").distinct().count()


def test_optimal_params_monotone():
    m1, _ = optimal_params(1000, 0.01)
    m2, _ = optimal_params(1000, 0.001)
    assert m2 > m1


class TestCuckoo:
    def test_insert_contains_delete(self):
        cf = CuckooFilter(n_buckets=1 << 10)
        rng = np.random.default_rng(1)
        keys = rng.integers(1, 2**62, size=2000).tolist()
        for k in keys:
            assert cf.insert(k)
        assert all(cf.contains(k) for k in keys)
        for k in keys[:500]:
            assert cf.delete(k)
        # deleted keys mostly gone (fp collisions allowed), kept keys all present
        still = sum(cf.contains(k) for k in keys[:500])
        assert still < 50
        assert all(cf.contains(k) for k in keys[500:])

    def test_fpr(self):
        cf = CuckooFilter(n_buckets=1 << 10)
        rng = np.random.default_rng(2)
        for k in rng.integers(1, 2**62, size=2000).tolist():
            cf.insert(k)
        fresh = rng.integers(2**62, 2**63, size=4000).tolist()
        fp = sum(cf.contains(k) for k in fresh)
        assert fp / 4000 < 0.05
