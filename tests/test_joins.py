"""As-of and range join edge cases."""

import pytest
from pyspark.sql import functions as F

from datafusion_monoid_spark.operators import joins as jn


@pytest.fixture(scope="module")
def sides(spark):
    left = spark.createDataFrame(
        [(1, 100, 10), (2, 100, 25), (3, 100, 5), (4, 200, 50)],
        "event_id int, user_id int, ns long")
    right = spark.createDataFrame(
        [(100, 8, 1.0), (100, 25, 2.0), (100, 30, 3.0), (300, 1, 9.0)],
        "user_id int, ns long, value double")
    return left, right


def test_asof_backward_semantics(sides):
    left, right = sides
    out = {r["event_id"]: (r["matched_ns"], r["matched_value"]) for r in
           jn.asof_join(left, right, on="ns", by="user_id",
                        right_cols=["value"]).collect()}
    assert out[1] == (8, 1.0)        # 10 >= 8, not 25
    assert out[2] == (25, 2.0)       # equal timestamp matches (>=)
    assert out[3] == (None, None)    # nothing at-or-before 5
    assert out[4] == (None, None)    # user with no right rows at all


def test_asof_tolerance(sides):
    left, right = sides
    out = {r["event_id"]: r["matched_ns"] for r in
           jn.asof_join(left, right, on="ns", by="user_id",
                        right_cols=["value"], tolerance=1).collect()}
    assert out[1] is None            # 10 - 8 = 2 > 1
    assert out[2] == 25              # 25 - 25 = 0 <= 1


def test_range_join_boundaries(spark):
    fact = spark.createDataFrame(
        [(1, 0.0), (2, 49.99), (3, 50.0), (4, 99.9), (5, 100.0), (6, -1.0)],
        "id int, v double")
    dim = spark.createDataFrame(
        [("a", 0.0, 50.0), ("b", 50.0, 100.0)], "tier string, lo double, hi double")
    out = {r["id"]: r["tier"] for r in
           jn.range_join_bucketed(fact, dim, "v", "lo", "hi", granularity=10.0).collect()}
    # [lo, hi): lower bound inclusive, upper exclusive; out-of-range rows drop
    assert out == {1: "a", 2: "a", 3: "b", 4: "b"}


def test_asof_cogrouped_matches_window_form(sides):
    """The pandas-cogroup as-of must agree with the JVM window form on
    the hand-built edges (backward match, equal ts, no-match users)."""
    left, right = sides
    win = {r["event_id"]: (r["matched_ns"], r["matched_value"]) for r in
           jn.asof_join(left, right, on="ns", by="user_id",
                        right_cols=["value"]).collect()}
    cog = {r["event_id"]: (r["matched_ns"], r["matched_value"]) for r in
           jn.asof_join_cogrouped(left, right, on="ns", by="user_id",
                                  right_cols=["value"]).collect()}
    assert cog == win and len(cog) == 4


def test_asof_cogrouped_matches_window_form_randomized(spark):
    """500 random events across 20 keys: the two execution forms are
    row-for-row identical (the cross-form discipline of the monoid
    core, applied to joins)."""
    import random
    rng = random.Random(7)
    left = spark.createDataFrame(
        [(i, rng.randrange(20), rng.randrange(1000)) for i in range(500)],
        "event_id int, user_id int, ns long")
    right = spark.createDataFrame(
        [(k, ns, float(ns)) for k in range(15)
         for ns in rng.sample(range(1000), 30)],
        "user_id int, ns long, value double")
    # dedup right on (key, ns) for determinism, as asof_join requires
    right = right.dropDuplicates(["user_id", "ns"])
    win = {r["event_id"]: (r["matched_ns"], r["matched_value"]) for r in
           jn.asof_join(left, right, on="ns", by="user_id",
                        right_cols=["value"]).collect()}
    cog = {r["event_id"]: (r["matched_ns"], r["matched_value"]) for r in
           jn.asof_join_cogrouped(left, right, on="ns", by="user_id",
                                  right_cols=["value"]).collect()}
    assert cog == win and len(cog) == 500
