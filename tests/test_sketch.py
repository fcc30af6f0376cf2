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


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------


def test_hll_accuracy_at_scale(spark):
    """Relative error within ~3 standard errors (1.04/sqrt(256) = 6.5%)
    on a 10k-distinct synthetic set — the regime HLL is built for."""
    n = 10_000
    df = spark.range(n).select(F.concat(F.lit("key-"), F.col("id")).alias("k"))
    est = sk.hll_estimate(sk.hll_build(df, "k")).collect()[0]["hll_estimate"]
    assert abs(est - n) / n < 0.20


def test_hll_duplicates_do_not_move_registers(spark):
    """max absorbs duplicates: the multiset and its distinct projection
    build identical registers."""
    base = spark.range(500).select(
        F.concat(F.lit("t"), (F.col("id") % 97)).alias("k"))
    dup = {(r["idx"], r["rho"]) for r in sk.hll_build(base, "k").collect()}
    uni = {(r["idx"], r["rho"])
           for r in sk.hll_build(base.distinct(), "k").collect()}
    assert dup == uni


def test_hll_merge_is_elementwise_max(spark):
    """HLL(A union B) == element-wise max of HLL(A), HLL(B) — the MAX
    monoid that makes the sketch partial-agg/streaming safe."""
    from datafusion_monoid_spark.operators.dedup import md5_long
    df = spark.range(3_000).select(
        F.concat(F.lit("u"), F.col("id")).alias("k"))
    a = df.where(md5_long("k") % 2 == 0)
    b = df.where(md5_long("k") % 2 == 1)
    full = {r["idx"]: r["rho"] for r in sk.hll_build(df, "k").collect()}
    ra = {r["idx"]: r["rho"] for r in sk.hll_build(a, "k").collect()}
    rb = {r["idx"]: r["rho"] for r in sk.hll_build(b, "k").collect()}
    merged = {i: max(ra.get(i, 0), rb.get(i, 0)) for i in set(ra) | set(rb)}
    assert merged == full


def test_hll_matches_python_spec(spark):
    """Registers and estimate agree with a pure-Python fold of the same
    md5 rank function (cross-implementation pin, like the monoid core)."""
    import hashlib
    n = 800
    keys = [f"spec-{i}" for i in range(n)]
    regs: dict[int, int] = {}
    for k in keys:
        h = int(hashlib.md5(k.encode()).hexdigest()[:15], 16)
        idx = h & (sk.HLL_M - 1)
        w = h >> sk.HLL_IDX_BITS
        rho = sk.HLL_W_BITS + 1 if w == 0 else (w & -w).bit_length()
        regs[idx] = max(regs.get(idx, 0), rho)
    s_int = (sum(2 ** (sk.HLL_W_BITS + 1 - r) for r in regs.values())
             + (sk.HLL_M - len(regs)) * 2 ** (sk.HLL_W_BITS + 1))
    want_est = int(sk.HLL_NUMER / float(s_int))

    df = spark.createDataFrame([(k,) for k in keys], "k string")
    got_regs = {r["idx"]: r["rho"] for r in sk.hll_build(df, "k").collect()}
    assert got_regs == regs
    row = sk.hll_estimate(sk.hll_build(df, "k")).collect()[0]
    assert row["hll_estimate"] == want_est
    assert row["nonzero_regs"] == len(regs)


# ---------------------------------------------------------------------------
# Bloom filter
# ---------------------------------------------------------------------------


def test_bloom_no_false_negatives_and_bounded_fpr(spark):
    """Every inserted key probes true; absent keys false-positive at
    roughly (1 - e^{-kn/m})^k (n=200, k=4, m=1024 => ~8.6%; measured
    ~12% — the affine md5 family trades a little independence for
    cross-engine reproducibility), asserted with slack."""
    present = spark.range(200).select(
        F.concat(F.lit("in-"), F.col("id")).alias("k"))
    absent = spark.range(2_000).select(
        F.concat(F.lit("out-"), F.col("id")).alias("k"))
    bloom = sk.bloom_build(present, "k")
    got_in = sk.bloom_probe(bloom, present, "k").collect()
    assert all(r["maybe_present"] for r in got_in)
    fp = sum(r["maybe_present"]
             for r in sk.bloom_probe(bloom, absent, "k").collect())
    assert fp / 2_000 < 0.16


def test_bloom_merge_is_bit_union(spark):
    """bloom(A union B) == bits(A) | bits(B) — the set-union monoid."""
    a = spark.range(100).select(F.concat(F.lit("a"), F.col("id")).alias("k"))
    b = spark.range(100).select(F.concat(F.lit("b"), F.col("id")).alias("k"))
    both = a.unionByName(b)
    bits = lambda df: {r["bit"] for r in sk.bloom_build(df, "k").collect()}
    assert bits(both) == bits(a) | bits(b)


def test_hll_small_range_correction():
    """Linear counting replaces the raw estimator when most registers
    are empty; corrected value tracks true tiny cardinalities."""
    import math
    assert abs(sk.hll_corrected(31, 199) - 256 * math.log(256 / 225)) < 1e-9
    assert sk.hll_corrected(250, 900_000) == 900_000.0


def test_hist_build_is_count_monoid(spark):
    """hist(A union B) == hist(A) + hist(B) per bin — zeros + vector
    add, the same algebra as the reference's sum monoid."""
    a = spark.range(0, 500).select((F.col("id") * 1.0).alias("v"))
    b = spark.range(500, 1000).select((F.col("id") * 1.0).alias("v"))
    both = a.unionByName(b)
    h = lambda df: {r["bin"]: r["cnt"]
                    for r in sk.hist_build(df, "v", 0.0, 1000.0, 16).collect()}
    ha, hb, hu = h(a), h(b), h(both)
    keys = set(ha) | set(hb)
    assert hu == {k: ha.get(k, 0) + hb.get(k, 0) for k in keys}
    # out-of-range values clamp to the edge bins, never drop
    edge = spark.createDataFrame([(-5.0,), (2000.0,)], "v double")
    he = h(edge)
    assert he == {0: 1, 15: 1}


def test_hist_quantiles_track_exact_percentiles(spark):
    """With 1e4 uniform values and 1024 bins, every histogram quantile
    upper edge must sit within one bin width of the exact order
    statistic."""
    n, bins, hi = 10_000, 1024, 10_000.0
    df = spark.range(n).select((F.col("id") * 1.0).alias("v"))
    h = sk.hist_build(df, "v", 0.0, hi, bins)
    qs = [500000, 900000, 990000]
    got = {r["q_micro"]: r["upper_edge"]
           for r in sk.hist_quantiles(h, qs, 0.0, hi, bins).collect()}
    width = hi / bins
    for q in qs:
        exact = q / 1e6 * n
        assert abs(got[q] - exact) <= width + 1e-9, (q, got[q], exact)


def test_grouped_hist_quantiles_match_per_group_exact(spark):
    """Unit-width bins make the grouped sketch exact: each group's
    p50 bin equals the true median of that group's integer values."""
    import random
    rng = random.Random(3)
    rows = [(f"g{g}", float(rng.randint(0, 63)))
            for g in range(5) for _ in range(200)]
    df = spark.createDataFrame(rows, "grp0 string, v double")
    h = sk.hist_build_grouped(df, "grp0", "v", 0.0, 64.0, 64)
    got = {(r["grp"], r["q_micro"]): r["bin"]
           for r in sk.hist_quantiles_grouped(h, [500000], 0.0, 64.0, 64)
                      .collect()}
    import math
    by_g = {}
    for g, v in rows:
        by_g.setdefault(g, []).append(int(v))
    for g, vals in by_g.items():
        vals.sort()
        rank = max(len(vals) * 500000 // 1000000, 1)
        assert got[(g, 500000)] == vals[rank - 1], g


# ---------------------------------------------------------------------------
# KMV
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def shingles_df(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    from datafusion_monoid_spark.operators.dedup import word_shingles
    return docs.select("source",
                       F.explode(word_shingles("text")).alias("sh"))


def test_kmv_estimate_within_theoretical_error(spark, shingles_df):
    """Saturated sketches estimate within ~3/sqrt(k) of the exact
    distinct count (the KMV standard error is 1/sqrt(k-2); 3 sigma)."""
    k = 128
    skd = sk.kmv_sketch(shingles_df, "source", "sh", k=k).collect()
    exact = {r["source"]: r["n"] for r in
             shingles_df.groupBy("source")
             .agg(F.countDistinct("sh").alias("n")).collect()}
    assert len(skd) == len(exact)
    import math
    tol = 3.0 / math.sqrt(k - 2)
    saturated = 0
    for r in skd:
        n, est_row = exact[r["source"]], r["sketch"]
        if len(est_row) < k:
            assert len(est_row) == n  # unsaturated -> exact
        else:
            saturated += 1
            est = (k - 1) * sk.KMV_SPACE // est_row[-1]
            assert abs(est - n) <= tol * n, (r["source"], est, n)
    assert saturated > 0  # the fixture must actually exercise the estimator


def test_kmv_merge_is_the_sketch_of_the_union(spark, shingles_df):
    """Monoid law: merging per-source sketches == sketching the union
    (combine is associative/commutative/idempotent by construction)."""
    k = 64
    per = sk.kmv_sketch(shingles_df, "source", "sh", k=k)
    merged = per.agg(F.aggregate(
        F.collect_list("sketch"),
        F.array().cast("array<bigint>"),
        lambda acc, s: sk.kmv_merge(acc, s, k=k)).alias("m")).collect()[0]["m"]
    whole = (sk.kmv_sketch(shingles_df.withColumn("g", F.lit(1)), "g", "sh",
                           k=k).collect()[0]["sketch"])
    assert merged == whole


def test_kmv_duplicates_do_not_move_the_sketch(spark, shingles_df):
    k = 64
    once = sk.kmv_sketch(shingles_df, "source", "sh", k=k)
    twice = sk.kmv_sketch(shingles_df.union(shingles_df), "source", "sh", k=k)
    a = {r["source"]: r["sketch"] for r in once.collect()}
    b = {r["source"]: r["sketch"] for r in twice.collect()}
    assert a == b


def test_kmv_empty_input_yields_no_groups(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").where(F.lit(False))
    from datafusion_monoid_spark.operators.dedup import word_shingles
    el = docs.select("source", F.explode(word_shingles("text")).alias("sh"))
    assert sk.kmv_sketch(el, "source", "sh", k=16).count() == 0


def test_kmv_merge_with_identity_is_noop(spark):
    """Empty array is the monoid identity: merge(s, []) == s."""
    df = spark.createDataFrame(
        [([5, 9, 12],)], "sketch array<bigint>")
    out = df.select(sk.kmv_merge(
        F.col("sketch"), F.array().cast("array<bigint>"), k=8)
        .alias("m")).collect()[0]["m"]
    assert out == [5, 9, 12]


def test_kmv_estimate_unsaturated_is_exact_count(spark):
    df = spark.createDataFrame([([3, 7],)], "sketch array<bigint>")
    assert df.select(sk.kmv_estimate(F.col("sketch"), k=8)
                     .alias("e")).collect()[0]["e"] == 2
