"""Count-Min Sketch: estimation guarantees + the monoid merge property."""

import pytest
from pyspark.sql import functions as F

from datafusion_monoid_spark.operators import sketch as sk

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def tokens_df(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    from datafusion_monoid_spark.operators.dedup import tokens
    return docs.select(F.explode(tokens("text")).alias("tok"))


def test_cms_overestimates_within_bound(spark, tokens_df):
    n = tokens_df.count()
    width, depth = 256, 4
    cms = sk.cms_build(tokens_df, "tok", depth, width)
    truth = {r["tok"]: r["c"] for r in
             tokens_df.groupBy("tok").agg(F.count(F.lit(1)).alias("c")).collect()}
    keys = tokens_df.distinct()
    est = {r["tok"]: r["estimate"] for r in
           sk.cms_estimate(cms, keys, "tok", depth, width).collect()}
    assert set(est) == set(truth)
    for k, t in truth.items():
        assert est[k] >= t                      # CMS never underestimates
        assert est[k] - t <= 2 * 2.71828 * n / width  # loose classic bound


def test_cms_merge_is_elementwise_sum(spark, tokens_df):
    """Sketch(all) == element-wise sum of per-half sketches — the monoid
    property that makes CMS partial-agg/streaming safe."""
    from datafusion_monoid_spark.operators.dedup import md5_long
    h1 = tokens_df.where(md5_long("tok") % 2 == 0)
    h2 = tokens_df.where(md5_long("tok") % 2 == 1)
    full = {(r["depth"], r["bucket"]): r["cnt"]
            for r in sk.cms_build(tokens_df, "tok").collect()}
    s1 = {(r["depth"], r["bucket"]): r["cnt"]
          for r in sk.cms_build(h1, "tok").collect()}
    s2 = {(r["depth"], r["bucket"]): r["cnt"]
          for r in sk.cms_build(h2, "tok").collect()}
    merged = {}
    for d in (s1, s2):
        for k, v in d.items():
            merged[k] = merged.get(k, 0) + v
    assert merged == full
