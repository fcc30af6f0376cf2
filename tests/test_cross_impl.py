"""Randomized cross-implementation property test.

Generates many random groups (seeded) of ragged, null-sprinkled integer
arrays as ONE DataFrame, runs the grouped reduce through all three
execution forms in three Spark jobs, and compares every group against a
pure-Python reference fold of the pinned semantics.  This buys
property-test coverage without a Spark job per example.
"""

import random

import pytest
from pyspark.sql import types as T

from datafusion_monoid_spark.monoid import INT_BOUNDS, get_monoid
from datafusion_monoid_spark.operators.array_reduce import (
    array_reduce,
    array_reduce_exploded,
    array_reduce_pandas,
)


def _py_reference(arrays, op, elem="int"):
    """Pure-Python fold of the pinned semantics (the spec)."""
    m = get_monoid(op, elem)
    vals = [a for a in arrays if a is not None and len(a) > 0]
    if not vals:
        return None
    n = min(len(a) for a in vals)
    lo, hi = INT_BOUNDS.get(elem, (None, None))

    def comb(a, b):
        if op == "sum":
            r = a + b
        elif op == "product":
            r = a * b
        elif op == "max":
            return max(a, b)
        else:
            return min(a, b)
        return max(lo, min(hi, r)) if lo is not None else r

    acc = None
    for a in vals:
        row = [m.identity if x is None else x for x in a[:n]]
        acc = row if acc is None else [comb(x, y) for x, y in zip(acc, row)]
    return acc


def _gen_groups(rng, n_groups):
    groups = {}
    for g in range(n_groups):
        n_rows = rng.randint(0, 6)
        rows = []
        for _ in range(n_rows):
            kind = rng.random()
            if kind < 0.12:
                rows.append(None)
            elif kind < 0.22:
                rows.append([])
            else:
                length = rng.randint(1, 6)
                rows.append([
                    None if rng.random() < 0.15 else rng.randint(-100, 100)
                    for _ in range(length)
                ])
        groups[g] = rows
    return groups


@pytest.mark.parametrize("op", ["sum", "product", "max", "min"])
def test_randomized_groups_all_forms_agree(spark, op):
    rng = random.Random(42)
    groups = _gen_groups(rng, 120)
    data = [(g, arr) for g, rows in groups.items() for arr in rows]
    if not data:
        return
    schema = T.StructType([
        T.StructField("grp", T.IntegerType(), False),
        T.StructField("arrays", T.ArrayType(T.IntegerType(), True), True),
    ])
    df = spark.createDataFrame(data, schema).repartition(8)

    want = {g: _py_reference(rows, op) for g, rows in groups.items()}
    # groups whose rows are all skipped fold to NULL; grouped Spark output
    # simply omits groups with zero input rows
    expect_present = {g: v for g, v in want.items() if groups[g]}

    expr = {r["grp"]: r["r"] for r in
            df.groupBy("grp").agg(array_reduce("arrays", op).alias("r")).collect()}
    assert expr == expect_present

    pand = {r["grp"]: r["result"] for r in
            array_reduce_pandas(df, ["grp"], "arrays", op).collect()}
    assert pand == expect_present

    # the exploded form cannot represent NULL-result groups (they vanish
    # with the filter); compare on non-null groups only
    expl = {r["grp"]: r["result"] for r in
            array_reduce_exploded(df, ["grp"], "arrays", op).collect()}
    assert expl == {g: v for g, v in expect_present.items() if v is not None}
