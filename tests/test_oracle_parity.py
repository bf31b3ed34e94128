"""Every queries() entry with an oracle must match it at sf0.01 — the same
gate the driver runs (CORRECTNESS_r{N}.json)."""

from __future__ import annotations

import pytest

from tests.oracle_compare import compare, duckdb_conn

import __spark_entry__ as entrymod


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_conn(sf_dir)
    yield c
    c.close()


def _query_names():
    return sorted(entrymod.queries().keys())


@pytest.mark.parametrize("name", _query_names())
def test_query_matches_oracle(name, spark, sf_dir, con):
    q = entrymod.queries()[name]
    oracles = entrymod.oracle_sql()
    df = q(spark, sf_dir)
    if name not in oracles:
        assert df.count() >= 0  # rows-only check, mirrors the driver
        return
    ok, msg = compare(df, con, oracles[name])
    assert ok, f"{name}: {msg}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
