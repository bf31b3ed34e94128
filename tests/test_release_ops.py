"""Exact Python replays for the round-5 release-engineering batch:
pagerank, length_percentiles, temperature_mix, train_test_split,
bpe_pair_stats. Each test recomputes the operator's algorithm in plain
Python/numpy over the same parquet input and asserts bit-exact equality
with the Spark result — the same discipline as the label_outliers /
sequence_pack replays in test_textops.py."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

import duckdb
import pytest

from pegasus_spark.analytics.pipeline_queries import (
    q_bpe_pair_stats,
    q_length_percentiles,
    q_pagerank,
    q_temperature_mix,
    q_train_test_split,
)
from tests.conftest import SF_TEST_DIR


def _md5_bucket(v, mod: int) -> int:
    return int(hashlib.md5(str(v).encode()).hexdigest()[:7], 16) % mod


@pytest.fixture(scope="module")
def docs_rows():
    con = duckdb.connect()
    rows = con.sql(
        f"SELECT doc_id, text, lang, source, n_chars "
        f"FROM '{SF_TEST_DIR}/documents.parquet'"
    ).fetchall()
    con.close()
    return rows


class TestPagerank:
    def test_matches_python_replay(self, spark, docs_rows):
        edges = set()
        for doc_id, *_ in docs_rows:
            src, dst = doc_id % 97, _md5_bucket(doc_id, 97)
            if src != dst:
                edges.add((src, dst))
        deg = Counter(s for s, _ in edges)
        nodes = {s for s, _ in edges} | {d for _, d in edges}
        rank = {h: 1_000_000 for h in nodes}
        for _ in range(3):
            contrib: dict[int, int] = defaultdict(int)
            for s, d in edges:
                contrib[d] += rank[s] // deg[s]
            rank = {h: 150_000 + (850 * contrib.get(h, 0)) // 1000 for h in nodes}
        got = q_pagerank(spark, SF_TEST_DIR).collect()
        assert len(got) == len(nodes)
        for r in got:
            assert r["rank_micro"] == rank[r["host"]]
            assert r["out_deg"] == deg.get(r["host"], 0)
        # ordering contract: rank desc, host asc
        keys = [(-r["rank_micro"], r["host"]) for r in got]
        assert keys == sorted(keys)


class TestLengthPercentiles:
    def test_matches_rank_math_replay(self, spark, docs_rows):
        by_src: dict[str, list[tuple[int, int]]] = defaultdict(list)
        for doc_id, _t, _l, source, n_chars in docs_rows:
            by_src[source].append((n_chars, doc_id))
        got = {r["source"]: r for r in q_length_percentiles(spark, SF_TEST_DIR).collect()}
        assert set(got) == set(by_src)
        for source, vals in by_src.items():
            vals.sort()
            n = len(vals)
            r = got[source]
            assert r["n_docs"] == n
            for p, col in ((25, "p25"), (50, "p50"), (75, "p75"), (95, "p95")):
                assert r[col] == vals[(p * n + 99) // 100 - 1][0]
        # monotone within each row
        for r in got.values():
            assert r["p25"] <= r["p50"] <= r["p75"] <= r["p95"]


class TestTemperatureMix:
    def test_matches_integer_grid_replay_and_boosts(self, spark, docs_rows):
        n_by_lang = Counter(lang for _i, _t, lang, *_ in docs_rows)
        nn = sum(n_by_lang.values())
        wq = {l: math.floor(math.sqrt(n / nn) * 1e9) for l, n in n_by_lang.items()}
        wsum = sum(wq.values())
        got = {r["lang"]: r for r in q_temperature_mix(spark, SF_TEST_DIR).collect()}
        assert set(got) == set(n_by_lang)
        for lang, n in n_by_lang.items():
            r = got[lang]
            assert r["n_docs"] == n
            assert r["p_natural"] == round(n / nn, 6)
            assert r["weight"] == round(wq[lang] / wsum, 6)
            assert r["boost"] == round(r["weight"] / r["p_natural"], 4)
        # alpha<1 flattens: the head language is downsampled, the tail boosted
        head = max(n_by_lang, key=n_by_lang.get)
        tail = min(n_by_lang, key=n_by_lang.get)
        assert got[head]["boost"] < 1.0 < got[tail]["boost"]
        assert abs(sum(r["weight"] for r in got.values()) - 1.0) < 1e-5


class TestTrainTestSplit:
    def test_matches_python_replay(self, spark, docs_rows):
        split_of = {}
        h_of = {}
        for doc_id, text, _l, source, n_chars in docs_rows:
            b = _md5_bucket(doc_id, 100)
            split_of[doc_id] = "test" if b < 10 else "valid" if b < 20 else "train"
            h_of[doc_id] = hashlib.md5(text[:40].encode()).hexdigest()
        splits_by_h: dict[str, set[str]] = defaultdict(set)
        for doc_id, h in h_of.items():
            splits_by_h[h].add(split_of[doc_id])
        want: dict[tuple[str, str], list[int]] = defaultdict(lambda: [0, 0, 0])
        for doc_id, text, _l, source, n_chars in docs_rows:
            cell = want[(source, split_of[doc_id])]
            cell[0] += 1
            cell[1] += n_chars
            cell[2] += 1 if len(splits_by_h[h_of[doc_id]]) > 1 else 0
        got = q_train_test_split(spark, SF_TEST_DIR).collect()
        assert len(got) == len(want)
        leaked_total = 0
        for r in got:
            nd, nc, nl = want[(r["source"], r["split"])]
            assert (r["n_docs"], r["n_chars_total"], r["n_leaked"]) == (nd, nc, nl)
            leaked_total += r["n_leaked"]
        # the prefix-fingerprint channel must actually fire at this SF —
        # an all-zero leak column would gate nothing
        assert leaked_total > 0
        assert sum(r["n_docs"] for r in got) == len(docs_rows)


class TestBpePairStats:
    def test_matches_counter_replay(self, spark, docs_rows):
        counts: dict[str, Counter] = defaultdict(Counter)
        for _i, text, lang, *_ in docs_rows:
            s = text.lower()
            for i in range(len(s) - 1):
                pair = s[i : i + 2]
                if len(pair) == 2 and pair.isascii() and pair.isalpha() and pair == pair.lower():
                    counts[lang][pair] += 1
        got = q_bpe_pair_stats(spark, SF_TEST_DIR).collect()
        by_lang: dict[str, list] = defaultdict(list)
        for r in got:
            by_lang[r["lang"]].append(r)
        assert set(by_lang) == set(counts)
        for lang, rows in by_lang.items():
            want = sorted(counts[lang].items(), key=lambda kv: (-kv[1], kv[0]))[:10]
            rows.sort(key=lambda r: r["rnk"])
            assert [(r["pair"], r["cnt"]) for r in rows] == want
            assert [r["rnk"] for r in rows] == list(range(1, len(want) + 1))
