"""Z-order layout and deletion-neighborhood linkage semantics:
Morton codes against a pure-Python bit-interleave spec, zone-map
tightness vs a row-order layout, fuzzy-candidate completeness for
k=1, and the no-cartesian plan guarantee."""

import re

import pytest

from pyspark.sql import functions as F

from datafusion_monoid_spark.operators import layout as ly
from datafusion_monoid_spark.operators import linkage as lk


def _explain(df, mode="simple"):
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)


def _morton_spec(x: int, y: int) -> int:
    out = 0
    for bit in range(16):
        out |= ((x >> bit) & 1) << (2 * bit)
        out |= ((y >> bit) & 1) << (2 * bit + 1)
    return out


def test_morton_matches_bit_spec(spark):
    pts = [(i, (i * 37) % 1024, (i * 911) % 1024) for i in range(300)]
    df = spark.createDataFrame(pts, "i long, x long, y long")
    got = {r.i: r.m for r in
           df.select("i", ly.morton_code(F.col("x"), F.col("y")).alias("m"))
             .collect()}
    for i, x, y in pts:
        assert got[i] == _morton_spec(x, y)


def test_zorder_zone_maps_tighter_than_row_order(spark):
    # a 64x64 grid in row-major id order: row-order buckets span the
    # full x range; Morton buckets must confine both dims.
    pts = [(i, i % 64, i // 64) for i in range(64 * 64)]
    df = spark.createDataFrame(pts, "i long, x long, y long")
    z = df.select(ly.morton_code(F.col("x"), F.col("y")).alias("z"),
                  "x", "y")
    stats = ly.zone_map_stats(z, F.col("z"), F.col("x"), F.col("y"),
                              bucket_shift=8).collect()
    assert len(stats) == 16  # 4096 codes / 256 per bucket
    for r in stats:
        # each Morton bucket is a 16x16 tile: both dims span exactly 15
        assert r.x_max - r.x_min == 15
        assert r.y_max - r.y_min == 15
    # row-order baseline: each 256-row bucket spans the whole x axis
    row_stats = (df.select((F.col("i") / 256).cast("bigint").alias("bucket"),
                           "x", "y")
                 .groupBy("bucket")
                 .agg(F.min("x").alias("x_min"), F.max("x").alias("x_max"))
                 .collect())
    assert all(r.x_max - r.x_min == 63 for r in row_stats)


def test_zorder_repartition_sorts_within_files(spark):
    pts = [(i, i % 64, i // 64) for i in range(4096)]
    df = spark.createDataFrame(pts, "i long, x long, y long")
    out = ly.zorder_repartition(df, F.col("x"), F.col("y"), n_files=4)
    # collect() preserves within-partition row order; each output
    # partition must be internally sorted by morton code
    rows = (out.withColumn("pid", F.spark_partition_id())
            .withColumn("z", ly.morton_code(F.col("x"), F.col("y")))
            .collect())
    by_pid: dict[int, list[int]] = {}
    for r in rows:
        by_pid.setdefault(r.pid, []).append(r.z)
        assert r.z == _morton_spec(r.x, r.y)
    assert sum(len(v) for v in by_pid.values()) == 4096
    for codes in by_pid.values():
        assert codes == sorted(codes)
    # range partitioning balances the shards and separates code ranges
    assert len(by_pid) == 4 and all(len(v) > 0 for v in by_pid.values())


def test_deletion_variants_cover_k1(spark):
    # every same-length substitution, insertion, and deletion pair must
    # share a variant — pigeonhole completeness for k=1
    cases = [("abcd", "abed"), ("abcd", "abc"), ("abc", "xabc"),
             ("abcd", "abcde"), ("a", "")]
    rows = [(2 * i, a, 2 * i + 1, b) for i, (a, b) in enumerate(cases)]
    df = spark.createDataFrame(
        [(r[0], r[1]) for r in rows] + [(r[2], r[3]) for r in rows],
        "id long, name string")
    pairs = {(r.id_a, r.id_b) for r in
             lk.fuzzy_pairs(df, "id", "name", 1).collect()}
    for i, _ in enumerate(cases):
        assert (2 * i, 2 * i + 1) in pairs


def test_fuzzy_pairs_exclude_far_and_identical(spark):
    df = spark.createDataFrame(
        [(1, "kitten"), (2, "kitten"), (3, "sitting"), (4, "zebra")],
        "id long, name string")
    got = lk.fuzzy_pairs(df, "id", "name", 1).collect()
    # identical (dist 0) and far (dist>1) pairs are both excluded
    assert got == []


def test_fuzzy_join_is_bucketed_not_cartesian(spark):
    df = spark.createDataFrame([(i, f"name{i:04d}") for i in range(50)],
                               "id long, name string")
    p = _explain(lk.fuzzy_pairs(df, "id", "name", 1))
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p
    # the candidate join is an equi-join on the variant hash
    assert re.search(r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)", p)
