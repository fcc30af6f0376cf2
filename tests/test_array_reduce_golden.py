"""Golden parity tests — verbatim ports of the reference's four
integration tests (``/root/reference/src/monoid.rs:528-754``), same
inputs, same expected outputs, run through all three execution forms
and the SQL entry point.
"""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datafusion_monoid_spark.operators.array_reduce import (
    array_reduce,
    array_reduce_exploded,
    array_reduce_pandas,
)

SCHEMA = T.StructType([T.StructField("arrays", T.ArrayType(T.IntegerType(), True), True)])


def _mk(spark, rows, partitions=1):
    df = spark.createDataFrame([(r,) for r in rows], SCHEMA)
    return df.repartition(partitions) if partitions > 1 else df


def _run_all_forms(spark, df, op="sum"):
    """Run expression, posexplode, and pandas forms; assert they agree."""
    expr = df.agg(array_reduce("arrays", op).alias("result")).collect()[0]["result"]
    expl = array_reduce_exploded(df, [], "arrays", op).collect()[0]["result"]
    pand = array_reduce_pandas(df, [], "arrays", op).collect()[0]["result"]
    assert expr == expl == pand, (expr, expl, pand)
    return expr


# reference test 1: src/monoid.rs:538-587
def test_sum_simple(spark):
    df = _mk(spark, [[1, 2, 3], [4, 5, 6]])
    assert _run_all_forms(spark, df) == [5, 7, 9]


# reference test 2: src/monoid.rs:589-639 — ragged, longer tail dropped
def test_sum_varying_lengths(spark):
    df = _mk(spark, [[1, 2, 3], [4, 5, 6, 7]])
    assert _run_all_forms(spark, df) == [5, 7, 9]


# reference test 3: src/monoid.rs:641-696
def test_sum_multiple_arrays(spark):
    df = _mk(spark, [[1, 2, 3], [4, 5, 6, 7], [100, 100, 100]])
    assert _run_all_forms(spark, df) == [105, 107, 109]


# reference test 4: src/monoid.rs:698-753 — 3 record batches => here,
# 3 shuffle partitions: accumulation must merge across partitions.
def test_sum_multiple_partitions(spark):
    rows = [[1, 2, 3], [4, 5, 6, 7], [100, 100, 100]] * 3
    df = _mk(spark, rows, partitions=3)
    assert df.rdd.getNumPartitions() == 3
    assert _run_all_forms(spark, df) == [315, 321, 327]


# SQL entry point parity: SELECT array_reduce_sum(arrays) AS result FROM test
# (reference src/monoid.rs:568-571)
def test_sql_entry_point(spark):
    df = _mk(spark, [[1, 2, 3], [4, 5, 6]])
    df.createOrReplaceTempView("test")
    out = spark.sql("SELECT array_reduce_sum(arrays) AS result FROM test").collect()
    assert len(out) == 1
    assert out[0]["result"] == [5, 7, 9]
