"""Deterministic sampling / splitting / packing tests."""

import pytest
from pyspark.sql import functions as F

from datafusion_monoid_spark.operators import sampling as sp

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_hash_sample_deterministic_and_sized(docs):
    s1 = sorted(r["doc_id"] for r in sp.hash_sample(docs, "doc_id", 0.2).collect())
    s2 = sorted(r["doc_id"] for r in
                sp.hash_sample(docs.repartition(13), "doc_id", 0.2).collect())
    assert s1 == s2                       # partitioning-invariant membership
    n = docs.count()
    assert 0.1 * n < len(s1) < 0.3 * n    # ~20% of 500


def test_split_is_partition_and_leakage_free(docs):
    train, test = sp.train_test_split(docs, "doc_id", 0.1)
    tr = {r["doc_id"] for r in train.collect()}
    te = {r["doc_id"] for r in test.collect()}
    assert tr.isdisjoint(te)
    assert len(tr) + len(te) == docs.count()
    # stability: rerun gives identical sides
    tr2 = {r["doc_id"] for r in sp.train_test_split(docs, "doc_id", 0.1)[0].collect()}
    assert tr2 == tr


def test_pack_sequences_fills_bins(docs):
    from datafusion_monoid_spark.operators.text import token_counts
    sized = docs.select("doc_id", token_counts("text")["ws_tokens"].alias("n_toks"))
    packed = sp.pack_sequences(sized, "doc_id", "n_toks", max_tokens=512, n_shards=8)
    bins = (packed.groupBy("shard", "bin_id")
            .agg(F.sum("n_toks").alias("tot"), F.count(F.lit(1)).alias("n"))
            .collect())
    assert all(r["tot"] > 0 for r in bins)
    # a bin overflows by at most one doc: tot < 512 + per-doc max
    max_doc = sized.agg(F.max("n_toks")).first()[0]
    assert all(r["tot"] < 512 + max_doc for r in bins)
    # all docs assigned exactly once
    assert packed.count() == sized.count()
    # non-final bins in a shard are at least half full on this data
    # (sanity that packing actually packs, not one-doc-per-bin)
    per_shard_max = {r["shard"]: r["m"] for r in
                     packed.groupBy("shard").agg(F.max("bin_id").alias("m")).collect()}
    nonfinal = [r for r in bins if r["bin_id"] < per_shard_max[r["shard"]]]
    assert nonfinal and all(r["tot"] >= 256 for r in nonfinal)
