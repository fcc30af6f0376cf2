"""Dedup operator tests: known-answer fixtures + LSH recall sanity."""

import pytest
from pyspark.sql import functions as F

from datafusion_monoid_spark.operators import dedup as dd


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),   # near-dup of 1
        (3, "THE  QUICK brown fox jumps over the lazy dog"),  # exact dup of 1 (normalized)
        (4, "completely different content about spark engines"),
        (5, ""),                                               # empty
    ]
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_exact_dedup_normalization(docs):
    d = dd.exact_dedup_keys(docs, "text")
    keys = {r["doc_id"]: r["dup_key"] for r in d.collect()}
    assert keys[1] == keys[3]          # case/whitespace-insensitive
    assert keys[1] != keys[2]
    assert keys[1] != keys[4]


def test_shingles_and_jaccard(spark, docs):
    d = docs.select("doc_id", dd.word_shingles("text").alias("sh"))
    a, b = d.alias("a"), d.alias("b")
    pairs = (a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
             .select("a.doc_id", "b.doc_id",
                     dd.jaccard(F.col("a.sh"), F.col("b.sh")).alias("j")))
    j = {(r[0], r[1]): r["j"] for r in pairs.collect()}
    assert j[(1, 3)] == 1.0            # identical after normalization
    assert 0.4 < j[(1, 2)] < 1.0       # near-dup
    assert j[(1, 4)] == 0.0


def test_minhash_lsh_finds_neardups(spark, docs):
    sigs = dd.minhash_signatures(docs.where(F.col("doc_id") <= 4), "doc_id", "text")
    assert sigs.count() == 4
    sig_len = sigs.select(F.size("sig").alias("n")).first()["n"]
    assert sig_len == dd.MINHASH_NUM
    cand = dd.lsh_candidate_pairs(sigs, "doc_id")
    pairs = {(r["id_a"], r["id_b"]) for r in cand.collect()}
    assert (1, 3) in pairs             # exact dups always collide
    assert (1, 2) in pairs             # high-jaccard near-dups collide
    est = {(r["id_a"], r["id_b"]): r["e"] for r in cand.select(
        "id_a", "id_b", dd.estimated_jaccard("sig_a", "sig_b").alias("e")).collect()}
    assert est[(1, 3)] == 1.0


def test_simhash_hamming(spark):
    # longer docs so a 1-token change stays within Hamming 7 of 64 bits
    base = ("spark engines process large columnar datasets with partial "
            "aggregation shuffles broadcast joins and adaptive execution "
            "for analytical workloads at petabyte scale today")
    docs = spark.createDataFrame([
        (1, base),
        (2, base.replace("today", "tomorrow")),   # near-dup
        (3, "  " + base.upper() + "  "),          # exact dup after normalize
        (4, "completely unrelated short text about cooking pasta recipes"),
    ], "doc_id int, text string")
    sh = dd.simhash(docs, "doc_id", "text")
    rows = {r["doc_id"]: (r["sim_hi"], r["sim_lo"]) for r in sh.collect()}
    assert rows[1] == rows[3]          # normalization-invariant
    ham12 = bin(rows[1][0] ^ rows[2][0]).count("1") + bin(rows[1][1] ^ rows[2][1]).count("1")
    assert ham12 <= 7                  # near-dup within pigeonhole guarantee
    pairs = dd.simhash_hamming_pairs(sh, "doc_id", max_hamming=7)
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs.collect()}
    assert got[(1, 3)] == 0
    assert got[(1, 2)] == ham12        # complete recall at <= 7
    assert (1, 4) not in got           # unrelated docs stay far apart
