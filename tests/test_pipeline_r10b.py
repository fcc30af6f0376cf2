"""Round-10 tail entries (registered AFTER the frozen r10 driver
window): leakage_safe_split, ann_eval_recall_mrr, lm_perplexity_buckets.

Because the driver gate covers only the first 50 catalog entries and
the r10 window is frozen (sentinels + the full 38-entry r6-stale
backlog), these three are pinned IN-SUITE against DuckDB at sf0.01 with
the driver's exact protocol (row count + column names + sorted value
hash) — they enter the r11 window as sentinels for the driver check.
"""

import hashlib
from hashlib import md5

import duckdb
import pandas as pd
import pytest

from datafusion_monoid_spark import queries as qcat
from datafusion_monoid_spark.sources import TABLES

SF001 = "/root/testdata/sf0.001"
SF = "/root/testdata/sf0.01"

NEW_ENTRIES = ("leakage_safe_split", "ann_eval_recall_mrr",
               "lm_perplexity_buckets", "lm_bucket_thresholds",
               "lm_bucket_screen_newbatch", "bucket_temperature_mix",
               "streaming_bucket_route_serve", "ivf_postings_build",
               "ivf_postings_append")


def _run(spark, name, sf=SF):
    return qcat.catalog()[name][0](spark, sf)


def _canon(df: pd.DataFrame):
    """The driver's compare: sorted columns, rounded floats, sorted
    row-string hash (tools/check_oracles.py)."""
    cols = sorted(df.columns)
    df = df[cols].copy()
    for c in cols:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
        df[c] = df[c].map(lambda v: "NULL" if v is None or
                          (isinstance(v, float) and pd.isna(v)) else str(v))
    rows = sorted(",".join(r) for r in df.itertuples(index=False, name=None))
    return len(df), cols, hashlib.sha256("\n".join(rows).encode()).hexdigest()


@pytest.mark.parametrize("name", NEW_ENTRIES)
def test_tail_entry_hash_matches_duckdb(spark, name):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS FROM '{SF}/{t}.parquet'")
    fn, oracle = qcat.catalog()[name]
    got = _canon(fn(spark, SF).toPandas())
    want = _canon(con.sql(oracle).df())
    assert got == want and got[0] > 0


# ---------------------------------------------------------------------------
# leakage_safe_split semantics on a constructed corpus
# ---------------------------------------------------------------------------

def _bucket(key: int) -> int:
    """Python twin of dedup.md5_long % SPLIT_MOD (verified bit-identical
    to both engines by the catalog's split entries)."""
    return int(md5(str(key).encode()).hexdigest()[:15], 16) % 1000


def test_leakage_split_keeps_neardups_together(spark, tmp_path):
    # find a doc-id pair whose NAIVE sides differ (one <100 = test)
    a = next(i for i in range(1000) if _bucket(i) < 100)
    b = next(i for i in range(1000) if _bucket(i) >= 100)
    shared = " ".join(f"tok{j} word{j} item{j}" for j in range(40))
    rows = [(a, shared, "en", "srcA", len(shared)),
            (b, shared + " tail", "en", "srcA", len(shared) + 5)]
    # unrelated background docs, all on the naive-train side so the
    # only possible mover is the constructed pair
    bg = [i for i in range(1000, 3000) if _bucket(i) >= 100][:30]
    for i in bg:
        t = f"background {i} " + " ".join(f"u{i}x{j}" for j in range(25))
        rows.append((i, t, "en", "srcB", len(t)))
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, "
              "n_chars bigint")
    df.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    # fresh corpus -> bypass the session-shared minhash cache
    qcat._MINHASH_SHARED.pop((spark.sparkContext.applicationId,
                              str(tmp_path)), None)

    out = {r["side"]: r for r in _run(spark, "leakage_safe_split",
                                      str(tmp_path)).collect()}
    grp_side = "test" if _bucket(min(a, b)) < 100 else "train"
    moved_side = grp_side  # the doc whose naive side differed moved INTO grp
    assert out[moved_side]["n_moved"] == 1
    other = "train" if moved_side == "test" else "test"
    assert out.get(other) is None or out[other]["n_moved"] == 0
    # group counting: the pair is ONE group on its (shared) side
    n_docs_on_grp_side = out[grp_side]["n_docs"]
    n_groups_on_grp_side = out[grp_side]["n_groups"]
    assert n_docs_on_grp_side == n_groups_on_grp_side + 1  # pair shares one


# ---------------------------------------------------------------------------
# ann_eval_recall_mrr invariants
# ---------------------------------------------------------------------------

def test_ann_eval_invariants(spark):
    rows = _run(spark, "ann_eval_recall_mrr").collect()
    assert len(rows) == 20  # one row per query, zero-hit queries included
    valid_rr = {0} | {1_000_000 // r for r in range(1, 6)}
    for r in rows:
        assert 0 <= r["n_hits"] <= 5
        assert r["rr_micro"] in valid_rr
        assert (r["rr_micro"] == 0) == (r["n_hits"] == 0)
    # the pretrained IVF serve's pinned recall floor, restated over the
    # published per-query table
    recall_at5 = sum(r["n_hits"] for r in rows) / (5 * len(rows))
    assert recall_at5 >= 0.9


# ---------------------------------------------------------------------------
# lm_perplexity_buckets invariants
# ---------------------------------------------------------------------------

def test_lm_buckets_partition_and_order(spark):
    rows = sorted(_run(spark, "lm_perplexity_buckets").collect(),
                  key=lambda r: r["bucket"])
    assert [r["bucket"] for r in rows] == [1, 2, 3]
    for r in rows:
        assert r["n_docs"] > 0 and r["min_score_micro"] <= r["max_score_micro"]
    # buckets are score-disjoint and ordered (equal scores share a bucket)
    for lo, hi in zip(rows, rows[1:]):
        assert lo["max_score_micro"] < hi["min_score_micro"]
    # the cut is cum-count-BEFORE-score: every bucket's first score
    # starts at a cumulative position inside that tertile, so no bucket
    # can swallow a full later tertile — bucket 1 holds at most
    # ceil(W/3) + (its last tie-group - 1) docs; coarse version:
    # no single bucket holds the whole corpus
    total = sum(r["n_docs"] for r in rows)
    assert all(r["n_docs"] < total for r in rows)


# ---------------------------------------------------------------------------
# threshold-artifact serve tier: CASE-against-cuts must replay the
# batch cum-count-before bucketing exactly for seen scores
# ---------------------------------------------------------------------------

def test_serve_buckets_equal_batch_buckets(spark):
    batch = {r["bucket"]: r for r in
             _run(spark, "lm_perplexity_buckets", SF001).collect()}
    mix = {r["bucket"]: r for r in
           _run(spark, "bucket_temperature_mix", SF001).collect()}
    assert set(batch) == set(mix)
    for b in batch:
        assert mix[b]["n_total"] == batch[b]["n_docs"]
        assert mix[b]["tokens_total"] == batch[b]["n_bigrams"]
        # every kept count is a true subset of its bucket
        assert 0 <= mix[b]["n_kept"] <= mix[b]["n_total"]
        assert 0 <= mix[b]["tokens_kept"] <= mix[b]["tokens_total"]


# ---------------------------------------------------------------------------
# IVF postings maintenance: append never re-assigns, never duplicates
# ---------------------------------------------------------------------------

def test_ivf_append_idempotent_and_complete(spark):
    r1 = sorted(map(tuple, _run(spark, "ivf_postings_append").collect()))
    r2 = sorted(map(tuple, _run(spark, "ivf_postings_append").collect()))
    assert r1 == r2  # re-running an ingest replaces, never duplicates
    # the combined index covers the whole embeddings table exactly once
    n_vecs = spark.read.parquet(f"{SF}/embeddings.parquet").count()
    assert sum(r[3] for r in r1) == n_vecs  # n_total column
    for _, n_old, n_new, n_total in r1:
        assert n_old + n_new == n_total


def test_thresholds_sentinel_on_degenerate_corpus(spark, tmp_path):
    """ALL docs share one score -> one tie group swallows buckets 2/3:
    the artifact must persist the unreachable sentinel and the screen
    must route every arriving doc to bucket 1."""
    text = "alpha beta gamma delta epsilon"
    rows = [(i, text, "en", "srcA", len(text)) for i in range(12)]
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, "
              "n_chars bigint")
    df.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")

    cuts = _run(spark, "lm_bucket_thresholds", str(tmp_path)).collect()[0]
    assert cuts["cut2_micro"] == qcat._LM_CUT_SENTINEL
    assert cuts["cut3_micro"] == qcat._LM_CUT_SENTINEL
    assert cuts["n_docs"] == 12

    screened = _run(spark, "lm_bucket_screen_newbatch",
                    str(tmp_path)).collect()
    assert [r["bucket"] for r in screened] == [1]
    assert screened[0]["n_docs"] == 2  # doc_ids 0 and 11 arrive
