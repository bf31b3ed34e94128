"""Property tests for the training-data pipeline operators: dedup semantics
on synthetic duplicates, minhash/jaccard behavior on near-identical texts,
ANN recall vs brute force."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from pegasus_spark.textops.dedup import (
    exact_dedupe,
    exact_dup_groups,
    minhash_near_dups,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_dups,
)
from pegasus_spark.textops.similarity import ann_topk, cosine_topk


@pytest.fixture(scope="module")
def doc_df(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [
        (1, base),
        (2, base),                                   # exact dup of 1
        (3, base.replace("dog", "cat")),             # near dup
        (4, "completely different words about spark shuffles and joins here"),
        (5, base),                                   # exact dup of 1
        (6, base + " extra tail tokens appended now"),  # near dup
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestExactDedup:
    def test_groups(self, doc_df):
        groups = {r["keeper_id"]: r["dup_cnt"] for r in exact_dup_groups(doc_df).collect()}
        assert groups[1] == 3  # docs 1,2,5
        assert groups[3] == 1 and groups[4] == 1 and groups[6] == 1

    def test_dedupe_keeps_min_id(self, doc_df):
        kept = {r["doc_id"] for r in exact_dedupe(doc_df).collect()}
        assert kept == {1, 3, 4, 6}


class TestMinHash:
    def test_exact_dups_full_signature_match(self, doc_df):
        pairs = {(r["id_a"], r["id_b"]): r["sig_matches"]
                 for r in minhash_near_dups(doc_df, min_sig_match=1).collect()}
        assert pairs[(1, 2)] == 8 and pairs[(1, 5)] == 8 and pairs[(2, 5)] == 8

    def test_near_dups_found_distant_not(self, doc_df):
        pairs = {(r["id_a"], r["id_b"]) for r in minhash_near_dups(doc_df, min_sig_match=4).collect()}
        assert (1, 2) in pairs
        assert (1, 6) in pairs  # appended-tail near dup shares most shingles
        assert not any(4 in p for p in pairs)  # unrelated doc never pairs


class TestSimHash:
    def test_deterministic(self, doc_df):
        a = {r["doc_id"]: r["simhash"] for r in simhash(doc_df).collect()}
        b = {r["doc_id"]: r["simhash"] for r in simhash(doc_df).collect()}
        assert a == b
        assert a[1] == a[2] == a[5]  # identical text → identical simhash
        assert 0 <= a[1] < (1 << 60)

    def test_near_dups(self, doc_df):
        pairs = {(r["id_a"], r["id_b"]): r["hamming"]
                 for r in simhash_near_dups(doc_df, max_hamming=20).collect()}
        assert pairs[(1, 2)] == 0
        assert pairs[(1, 3)] <= 20  # one-word change → small hamming
        assert (1, 4) not in pairs  # unrelated doc is far


class TestNgramJaccard:
    def test_pairs(self, doc_df):
        pairs = {(r["id_a"], r["id_b"]): r["jaccard"]
                 for r in ngram_jaccard_pairs(doc_df, n=3, tau=0.2).collect()}
        assert pairs[(1, 2)] == 1.0
        assert 0.2 <= pairs[(1, 3)] < 1.0
        assert not any(4 in p for p in pairs)


class TestANN:
    def test_recall_vs_brute_force(self, spark, sf_dir):
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        exact = [r["vec_id"] for r in cosine_topk(emb, 0, k=10).collect()]
        approx = [r["vec_id"] for r in ann_topk(emb, 0, k=10, dim=64).collect()]
        recall = len(set(exact) & set(approx)) / 10
        assert recall >= 0.6, f"ANN recall {recall} too low"
        # and the probed set is a real subset: ANN must not degenerate to
        # brute force over everything
        from pegasus_spark.textops.similarity import hyperplane_buckets
        bl = hyperplane_buckets(emb, dim=64, n_planes=8)
        qb = bl.filter("vec_id = 0").collect()[0]["bucket"]
        probed = (
            bl.withColumn("hd", F.bit_count(F.col("bucket").bitwiseXOR(F.lit(qb))))
            .filter("hd <= 4").count()
        )
        assert probed < emb.count()
