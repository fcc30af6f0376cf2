"""F8 — op x element-type matrix over all three execution forms
(reference macro block ``src/monoid.rs:52-221``)."""

import pytest
from pyspark.sql import types as T

from datafusion_monoid_spark.monoid import ELEMENT_TYPES, get_monoid
from datafusion_monoid_spark.operators.array_reduce import (
    array_reduce,
    array_reduce_exploded,
    array_reduce_pandas,
)

EXPECTED = {
    "sum": [7, 9, 11],
    "product": [10, 18, 28],
    "max": [5, 6, 7],
    "min": [2, 3, 4],
}

ELEMS = ["tinyint", "smallint", "int", "bigint", "float", "double"]


@pytest.mark.parametrize("op", ["sum", "product", "max", "min"])
@pytest.mark.parametrize("elem", ELEMS)
def test_matrix(spark, op, elem):
    t = ELEMENT_TYPES[elem]
    schema = T.StructType([T.StructField("arrays", T.ArrayType(t, True), True)])
    rows = [([2, 3, 4],), ([5, 6, 7],)]
    if elem in ("float", "double"):
        rows = [([float(x) for x in r[0]],) for r in rows]
    df = spark.createDataFrame(rows, schema)

    want = EXPECTED[op]
    expr = df.agg(array_reduce("arrays", op, elem).alias("r")).collect()[0]["r"]
    expl = array_reduce_exploded(df, [], "arrays", op, elem).collect()[0]["result"]
    pand = array_reduce_pandas(df, [], "arrays", op, elem).collect()[0]["result"]
    assert [float(x) for x in expr] == pytest.approx(want)
    assert [float(x) for x in expl] == pytest.approx(want)
    assert [float(x) for x in pand] == pytest.approx(want)


@pytest.mark.parametrize("op", ["sum", "product", "max", "min"])
@pytest.mark.parametrize("elem", ELEMS)
def test_identity_single_row(spark, op, elem):
    """Single-row table: result == the row, for every op (identity check)."""
    t = ELEMENT_TYPES[elem]
    schema = T.StructType([T.StructField("arrays", T.ArrayType(t, True), True)])
    row = [1.0, 2.0] if elem in ("float", "double") else [1, 2]
    df = spark.createDataFrame([(row,)], schema)
    r = df.agg(array_reduce("arrays", op, elem).alias("r")).collect()[0]["r"]
    assert [float(x) for x in r] == pytest.approx([1.0, 2.0])
