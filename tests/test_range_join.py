"""range_join_binned: pair-exact vs the naive non-equi join, boundary
inclusivity, bin-size independence, and the no-nested-loop plan claim."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from pegasus_spark.operators import range_join_binned


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [(i, t) for i, t in enumerate([0, 100, 250, 999, 1000, 5000])],
        "lid long, lt long",
    )
    right = spark.createDataFrame(
        [(i, t) for i, t in enumerate([-50, 0, 99, 100, 101, 300, 950, 1050, 4999, 6000])],
        "rid long, rt long",
    )
    return left, right


def _pairs(df):
    return {(r["lid"], r["rid"]) for r in df.collect()}


def naive(left, right, lo, hi):
    return left.join(
        right, F.col("rt").between(F.col("lt") + lo, F.col("lt") + hi)
    )


def test_matches_naive_join(frames):
    left, right = frames
    for lo, hi in [(-100, 100), (0, 50), (-1000, 0), (-7, 13)]:
        got = _pairs(range_join_binned(left, right, "lt", "rt", lo, hi))
        exp = _pairs(naive(left, right, lo, hi))
        assert got == exp, (lo, hi)


def test_boundaries_inclusive(spark):
    left = spark.createDataFrame([(1, 100)], "lid long, lt long")
    right = spark.createDataFrame(
        [(1, 89), (2, 90), (3, 110), (4, 111)], "rid long, rt long"
    )
    got = _pairs(range_join_binned(left, right, "lt", "rt", -10, 10))
    assert got == {(1, 2), (1, 3)}


def test_bin_size_independent_and_no_duplicates(frames):
    left, right = frames
    exp = _pairs(naive(left, right, -100, 100))
    for bin_size in [1, 7, 100, 200, 10_000]:
        out = range_join_binned(left, right, "lt", "rt", -100, 100, bin_size)
        rows = out.collect()
        assert len(rows) == len({(r["lid"], r["rid"]) for r in rows})  # no dup pairs
        assert {(r["lid"], r["rid"]) for r in rows} == exp, bin_size


def test_negative_and_beyond_double_precision_times(spark):
    """Bins must be exact for negative epochs and values > 2^53 (nanosecond
    timestamps) — double-division binning would misplace boundary rows."""
    big = 2**60  # far beyond exact double integers
    left = spark.createDataFrame(
        [(1, -100), (2, big)], "lid long, lt long"
    )
    right = spark.createDataFrame(
        [(1, -110), (2, -89), (3, big + 10), (4, big - 11)], "rid long, rt long"
    )
    got = _pairs(range_join_binned(left, right, "lt", "rt", -10, 10))
    assert got == {(1, 1), (2, 3)}


def test_plan_is_equality_join_not_nested_loop(frames):
    left, right = frames
    plan = (
        range_join_binned(left, right, "lt", "rt", -100, 100)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoop" not in plan
    assert "CartesianProduct" not in plan
