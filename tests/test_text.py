"""Text-analysis operator tests with known-answer fixtures."""

import pytest
from pyspark.sql import functions as F

from datafusion_monoid_spark.operators import text as tx


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the cat and the dog sat of the mat in a house"),   # english-ish
        (2, "el perro y la casa de que en un es grande"),       # spanish-ish
        (3, "!!! ??? *** %%% $$$"),                             # punctuation soup
        (4, "word " * 100),                                     # repetitive long
        (5, ""),                                                # empty
    ]
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_lang_id_markers(docs):
    pred, score = tx.lang_id("text")
    out = {r["doc_id"]: (r["p"], r["s"]) for r in
           docs.select("doc_id", pred.alias("p"), score.alias("s")).collect()}
    assert out[1][0] == "en" and out[1][1] > 0.3
    assert out[2][0] == "es" and out[2][1] > 0.3
    assert out[5][1] == 0.0             # empty text: zero score, first lang wins
    assert out[5][0] == sorted(tx.LANG_MARKERS)[0]


def test_quality_orders_sensibly(docs):
    q = {r["doc_id"]: r["q"] for r in
         docs.select("doc_id", tx.quality_score("text").alias("q")).collect()}
    assert q[1] > q[3]                  # clean english beats punctuation soup
    assert q[1] > q[5]                  # and beats empty
    assert all(0.0 <= v <= 1.0 for v in q.values())


def test_token_counts(docs):
    c = tx.token_counts("text")
    out = {r["doc_id"]: (r["w"], r["b"]) for r in
           docs.select("doc_id", c["ws_tokens"].alias("w"),
                       c["bpe_tokens"].alias("b")).collect()}
    assert out[1] == (12, 12)           # pure words: ws == bpe
    assert out[5] == (0, 0)
    assert out[3][1] >= out[3][0]       # symbols split finer than whitespace
    assert out[4][0] == 100


def test_fingerprint_order_sensitive(spark):
    d = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "gamma beta alpha"), (3, "alpha beta gamma"),
         (4, "  ALPHA   beta GAMMA ")],
        "doc_id int, text string")
    fp = {r["doc_id"]: r["fp"] for r in
          d.select("doc_id", tx.fingerprint("text").alias("fp")).collect()}
    assert fp[1] == fp[3]               # deterministic
    assert fp[1] == fp[4]               # normalization-invariant
    assert fp[1] != fp[2]               # order-sensitive (unlike set dedup keys)
    assert all(0 <= v < tx.FINGERPRINT_P for v in fp.values())
