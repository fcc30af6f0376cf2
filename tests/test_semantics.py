"""Edge-semantics tests (FIXTURES.md F5-F10) — pin the behaviors the
reference implements but never tests (``src/monoid.rs:360-378, 387-393,
431-434``)."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datafusion_monoid_spark.operators.array_reduce import (
    array_reduce,
    array_reduce_exploded,
    array_reduce_pandas,
)

SCHEMA = T.StructType([T.StructField("arrays", T.ArrayType(T.IntegerType(), True), True)])


def _agg(spark, rows, op="sum"):
    df = spark.createDataFrame([(r,) for r in rows], SCHEMA)
    return df.agg(array_reduce("arrays", op).alias("result")).collect()[0]["result"]


# F5 — NULL row skipped; NULL element contributes identity
def test_null_handling(spark):
    assert _agg(spark, [None, [1, None, 3], [4, 5, 6]]) == [5, 5, 9]


# F6 — empty table and all-NULL column give NULL (not [])
def test_empty_table_gives_null(spark):
    df = spark.createDataFrame([], SCHEMA)
    assert df.agg(array_reduce("arrays", "sum").alias("r")).collect()[0]["r"] is None


def test_all_null_gives_null(spark):
    assert _agg(spark, [None, None]) is None


# F7 — empty arrays are skipped
def test_empty_arrays_skipped(spark):
    assert _agg(spark, [[], [1, 2], [3, 4]]) == [4, 6]


# F9 — integer saturation (reference src/monoid.rs:85-100, 105-138)
def test_tinyint_sum_saturates(spark):
    df = spark.createDataFrame(
        [([120, -120],), ([10, -10],)],
        T.StructType([T.StructField("arrays", T.ArrayType(T.ByteType(), True), True)]))
    r = df.agg(array_reduce("arrays", "sum", "tinyint").alias("r")).collect()[0]["r"]
    assert r == [127, -128]
    # posexplode + pandas forms agree
    assert array_reduce_exploded(df, [], "arrays", "sum", "tinyint").collect()[0]["result"] == [127, -128]
    assert array_reduce_pandas(df, [], "arrays", "sum", "tinyint").collect()[0]["result"] == [127, -128]


def test_tinyint_product_saturates(spark):
    df = spark.createDataFrame(
        [([100],), ([2],)],
        T.StructType([T.StructField("arrays", T.ArrayType(T.ByteType(), True), True)]))
    r = df.agg(array_reduce("arrays", "product", "tinyint").alias("r")).collect()[0]["r"]
    assert r == [127]
    assert array_reduce_exploded(df, [], "arrays", "product", "tinyint").collect()[0]["result"] == [127]
    assert array_reduce_pandas(df, [], "arrays", "product", "tinyint").collect()[0]["result"] == [127]


def test_bigint_sum_saturates(spark):
    big = 2**63 - 10
    df = spark.createDataFrame(
        [([big, -big],), ([100, -100],)],
        T.StructType([T.StructField("arrays", T.ArrayType(T.LongType(), True), True)]))
    r = df.agg(array_reduce("arrays", "sum", "bigint").alias("r")).collect()[0]["r"]
    assert r == [2**63 - 1, -(2**63)]
    assert array_reduce_exploded(df, [], "arrays", "sum", "bigint").collect()[0]["result"] == [2**63 - 1, -(2**63)]


def test_bigint_product_saturates(spark):
    df = spark.createDataFrame(
        [([2**40, -(2**40), 3],), ([2**40, 2**40, 0],)],
        T.StructType([T.StructField("arrays", T.ArrayType(T.LongType(), True), True)]))
    r = df.agg(array_reduce("arrays", "product", "bigint").alias("r")).collect()[0]["r"]
    assert r == [2**63 - 1, -(2**63), 0]
    assert array_reduce_exploded(df, [], "arrays", "product", "bigint").collect()[0]["result"] == [2**63 - 1, -(2**63), 0]


# F10 — grouped aggregation (implied by the accumulator-per-group
# contract, never tested in the reference)
def test_grouped(spark):
    df = spark.createDataFrame(
        [(1, [1, 2]), (1, [3, 4]), (2, [10, 20])], "grp int, arrays array<int>")
    expr = {r["grp"]: r["r"] for r in
            df.groupBy("grp").agg(array_reduce("arrays", "sum").alias("r")).collect()}
    assert expr == {1: [4, 6], 2: [10, 20]}
    expl = {r["grp"]: r["result"] for r in
            array_reduce_exploded(df, ["grp"], "arrays", "sum").collect()}
    assert expl == expr
    pand = {r["grp"]: r["result"] for r in
            array_reduce_pandas(df, ["grp"], "arrays", "sum").collect()}
    assert pand == expr
    # SQL entry point with GROUP BY
    df.createOrReplaceTempView("grouped_t")
    sql = {r["grp"]: r["r"] for r in spark.sql(
        "SELECT grp, array_reduce_sum(arrays) AS r FROM grouped_t GROUP BY grp").collect()}
    assert sql == expr


# float identities: max -> -inf, min -> +inf (src/monoid.rs:173-180, 205-212)
def test_float_identities(spark):
    df = spark.createDataFrame(
        [([1.0, None],), ([None, None],)],
        T.StructType([T.StructField("arrays", T.ArrayType(T.DoubleType(), True), True)]))
    mx = df.agg(array_reduce("arrays", "max", "double").alias("r")).collect()[0]["r"]
    assert mx[0] == 1.0 and mx[1] == float("-inf")
    mn = df.agg(array_reduce("arrays", "min", "double").alias("r")).collect()[0]["r"]
    assert mn[0] == 1.0 and mn[1] == float("inf")
