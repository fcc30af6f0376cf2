"""Unsigned-type emulation (SURVEY.md §7): Spark has no unsigned ints;
uint8/16/32 ride wider signed carriers, uint64 rides DECIMAL(20,0) —
each clamped to the unsigned range (documented deviation from the
reference's native u8..u64, src/monoid.rs:34-37, 93-100)."""

import pytest
from pyspark.sql import types as T

from datafusion_monoid_spark.monoid import ELEMENT_TYPES, INT_BOUNDS, get_monoid
from datafusion_monoid_spark.operators.array_reduce import array_reduce


def _run(spark, rows, op, elem):
    schema = T.StructType([T.StructField(
        "arrays", T.ArrayType(ELEMENT_TYPES[elem], True), True)])
    df = spark.createDataFrame([(r,) for r in rows], schema)
    return df.agg(array_reduce("arrays", op, elem).alias("r")).collect()[0]["r"]


@pytest.mark.parametrize("elem", ["uint8", "uint16", "uint32"])
def test_unsigned_sum_saturates_at_unsigned_max(spark, elem):
    hi = INT_BOUNDS[elem][1]
    assert _run(spark, [[hi - 1, 1], [5, 0]], "sum", elem) == [hi, 1]


@pytest.mark.parametrize("elem", ["uint8", "uint16", "uint32"])
def test_unsigned_never_negative(spark, elem):
    # identity/clamp floor is 0, not the signed carrier's minimum
    m = get_monoid("max", elem)
    assert m.identity == 0
    assert _run(spark, [[3, 7]], "max", elem) == [3, 7]


def test_uint64_sum_on_decimal_carrier(spark):
    from decimal import Decimal
    hi = INT_BOUNDS["uint64"][1]          # 2^64 - 1: beyond bigint
    out = _run(spark, [[Decimal(hi - 10)], [Decimal(20)]], "sum", "uint64")
    assert int(out[0]) == hi              # clamped at 2^64-1


def test_uint64_product_saturates(spark):
    from decimal import Decimal
    # 2^40 * 2^40 = 2^80 > 2^64-1 -> clamps to the unsigned max
    out = _run(spark, [[Decimal(2**40)], [Decimal(2**40)]], "product", "uint64")
    assert int(out[0]) == INT_BOUNDS["uint64"][1]
