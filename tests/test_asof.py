"""asof_join semantics: inclusive <=, per-key isolation, inner vs left."""

from __future__ import annotations

import pytest

from pegasus_spark.operators import asof_join


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [("l1", "u1", 10), ("l2", "u1", 20), ("l3", "u1", 5),
         ("l4", "u2", 15), ("l5", "u3", 100)],
        "id string, user_id string, ts long",
    )
    right = spark.createDataFrame(
        [("u1", 10, 1.0), ("u1", 15, 2.0), ("u2", 1, 3.0)],
        "user_id string, ts long, v double",
    )
    return left, right


def test_inclusive_and_latest(frames):
    left, right = frames
    out = {r["id"]: r["v"] for r in
           asof_join(left, right, keys=["user_id"]).collect()}
    assert out["l1"] == 1.0   # ts=10 matches right ts=10 (inclusive)
    assert out["l2"] == 2.0   # latest of {10, 15} ≤ 20
    assert "l3" not in out    # ts=5 has no prior right row (inner)
    assert out["l4"] == 3.0   # per-key isolation: u2 sees only u2


def test_left_keeps_unmatched(frames):
    left, right = frames
    out = {r["id"]: r["v"] for r in
           asof_join(left, right, keys=["user_id"], how="left").collect()}
    assert out["l3"] is None and out["l5"] is None
    assert len(out) == 5


def test_all_left_columns_preserved(frames):
    left, right = frames
    cols = asof_join(left, right, keys=["user_id"]).columns
    assert cols == ["id", "user_id", "ts", "v"]
