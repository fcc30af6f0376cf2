"""array_reduce — element-wise monoid reduction of an array column.

The reference's centerpiece UDAF ``ArrayMonoidReduce`` (``src/monoid.rs:
226-332``): aggregate a column of ``ARRAY<T>`` rows into one ``ARRAY<T>``
by position-wise monoid combine, e.g. ``[1,2,3] (+) [4,5,6] = [5,7,9]``
(doc comment ``src/monoid.rs:223-225``).

Pinned semantics (SURVEY.md §2.1 decision — deterministic superset of the
reference's asserted behavior):

* rows whose array is NULL are skipped        (``src/monoid.rs:431-434``)
* rows whose array is empty ``[]`` are skipped (``src/monoid.rs:361-363``)
* result length = **min** length over remaining arrays — the reference
  truncates to the *first* array's length, which is partition-order-
  dependent for ragged input (``src/monoid.rs:361-369``); min-length is
  deterministic and matches every asserted reference output
  (``src/monoid.rs:589-639``: ``[1,2,3] (+) [4,5,6,7] = [5,7,9]``)
* NULL elements contribute the identity       (``src/monoid.rs:371-373``)
* zero qualifying rows => result is NULL, not ``[]`` (``src/monoid.rs:387-393``)

Three execution forms (all must agree; cross-checked in tests):

1. :func:`array_reduce` — **pure Catalyst expression**:
   ``aggregate(collect_list(col), NULL, fold)``.  No Python workers, fully
   whole-stage-codegen'd.  ``collect_list`` materializes each group's
   arrays on one executor, so use for moderate group cardinality.
2. :func:`array_reduce_exploded` — **the scale form** (SURVEY.md §2.1a):
   posexplode -> per-(group, pos) built-in aggregate (Catalyst does
   partial+final map-side combine, the Spark analogue of the reference's
   ``state``/``merge_batch`` split, ``src/monoid.rs:387-403, 445-465``) ->
   rebuild array.  Handles unbounded group sizes; this is what you run on
   100 TB.
3. :func:`array_reduce_pandas` — **oracle form**: per-group NumPy fold via
   ``applyInPandas``.  Complete-mode only (no partial agg); used to
   cross-validate the other two.

Partial-aggregation safety is exactly the monoid argument the reference is
named for (``src/monoid.rs:13-21``): identity + associativity (+ here
commutativity, since shuffles reorder rows) make any partitioning of the
fold produce the same result.
"""

from __future__ import annotations

import math
import os
from decimal import Decimal
from typing import Iterable, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datafusion_monoid_spark.monoid import (
    ELEMENT_TYPES,
    INT_BOUNDS,
    MONOIDS,
    Monoid,
    get_monoid,
)

__all__ = [
    "array_reduce",
    "array_reduce_exploded",
    "array_reduce_pandas",
    "make_pandas_udaf",
    "register_all",
]


# ---------------------------------------------------------------------------
# Form 1: pure Catalyst expression
# ---------------------------------------------------------------------------

def array_reduce(col: Column | str, monoid: Monoid | str,
                 elem: str = "int") -> Column:
    """Aggregate ``Column`` expression: monoid-reduce an array column.

    Usage::

        df.groupBy("g").agg(array_reduce("arrays", "sum").alias("result"))

    Entirely built-in higher-order functions — Catalyst optimizes and
    codegens the whole fold; no Python worker involved.
    """
    m = monoid if isinstance(monoid, Monoid) else get_monoid(monoid, elem)
    c = F.col(col) if isinstance(col, str) else col
    arr_t = T.ArrayType(m.spark_type, True)

    # exact-then-clamp monoids (integer sum) fold in a wide accumulator
    # type and clamp ONCE at the end — deterministic under any fold order
    wide = m.acc_cast is not None
    fold_t = f"array<{m.acc_cast}>" if wide else arr_t
    comb = m.wide_combine if wide else m.combine

    # collect only non-null, non-empty arrays (collect_list drops nulls)
    valid = F.when(F.size(c) > 0,
                   c.cast(arr_t).cast(fold_t) if wide else c.cast(arr_t))
    collected = F.collect_list(valid)

    ident = m.identity_lit().cast(m.acc_cast) if wide else m.identity_lit()

    def merge(acc: Column, x: Column) -> Column:
        # min-length truncation: slice both sides to the shorter length
        n = F.least(F.size(acc), F.size(x))
        return (
            F.when(acc.isNull(), F.transform(x, lambda e: F.coalesce(e, ident)))
            .otherwise(
                F.zip_with(
                    F.slice(acc, 1, n),
                    F.slice(x, 1, n),
                    lambda a, b: comb(a, F.coalesce(b, ident)),
                )
            )
        )

    # seed NULL => empty input folds to NULL (src/monoid.rs:387-393)
    folded = F.aggregate(collected, F.lit(None).cast(fold_t), merge)
    # transform(NULL) is NULL, so the empty-input contract survives finish
    return F.transform(folded, m.finish) if wide else folded


# ---------------------------------------------------------------------------
# Form 2: posexplode two-phase (the 100 TB form)
# ---------------------------------------------------------------------------

def _int_product_agg(m: Monoid, e: Column) -> Column:
    """Distributed saturating integer product per (group, pos) — the
    single-aggregation form for element types whose full range fits the
    double mantissa (``hi + 1 <= 2^53``: every int8..int32/uint8..uint32
    in-range product is exact in ``F.product``).

    No exact built-in integer product aggregate exists in Spark, so:
    sign from the parity of negative factors, zero short-circuit, overflow
    detection from sum(log2|x|), magnitude from the double-typed
    ``F.product``.  All components are partial-aggregation-capable
    built-ins.  64-bit carriers (where in-range magnitudes above 2^53
    exist) go through :func:`_exact_product_per_pos` instead.
    """
    lo, hi = INT_BOUNDS[m.elem]
    carrier = m.spark_type.simpleString()
    # bounds as STRING literals cast to decimal: F.lit() on a python int
    # beyond int64 (uint64's 2^64-1) raises NumberFormatException JVM-side
    lo_d = F.lit(str(lo)).cast("decimal(38,0)")
    hi_d = F.lit(str(hi)).cast("decimal(38,0)")
    # overflow threshold is the carrier's magnitude: log2(hi+1) (63 for
    # int64, 64 for uint64, 7 for int8) minus a guard band
    overflow_bits = math.log2(hi + 1) - 0.001
    d = e.cast("double")
    any_zero = F.max((e == 0).cast("int"))
    neg_parity = F.sum(F.when(e < 0, 1).otherwise(0)) % 2
    log_mag = F.sum(F.when(e != 0, F.log2(F.abs(d))).otherwise(F.lit(0.0)))
    prod_d = F.product(d)
    saturated = F.when(neg_parity == 1, lo_d).otherwise(hi_d)
    in_range = F.least(
        F.greatest(F.round(prod_d).cast("decimal(38,0)"), lo_d), hi_d
    ).cast(carrier)
    return (
        F.when(any_zero == 1, F.lit(0).cast(carrier))
        .when(log_mag > F.lit(overflow_bits), saturated.cast(carrier))
        .otherwise(in_range)
    )


def _exact_product_per_pos(base: DataFrame, groups: list[str],
                           m: Monoid, e: Column) -> DataFrame:
    """Exact distributed saturating product for 64-bit carriers
    (``bigint``/``uint64``), matching the reference's exact saturating
    mul at ALL magnitudes (``src/monoid.rs:105-138``) — including the
    (2^53, 2^63] band the double mantissa cannot carry.

    Three magnitude zones per (group, pos) cell, decided by the
    partial-agg-safe ``sum(log2|x|)`` detector (all terms >= 0, so the
    float error stays ~1e-5 even at 10^9 rows — far inside the 0.5-bit
    guard bands):

    * **low** (< 2^52.5): ``F.product`` over doubles is exact — with the
      zero short-circuit taken, every factor and every subset product has
      magnitude <= the total < 2^53.
    * **gray** ([2^52.5, 2^(bits+0.5)]): the cell has at most ~bits+1
      factors of magnitude >= 2, so a second bounded pass collects JUST
      those factors for the cell and folds them exactly in DECIMAL(38,0)
      (max ~2^65 << 10^38), then clamps once — exact in-range values AND
      the exact saturation boundary (e.g. -2^63 stays -2^63).
    * **high** (> 2^(bits+0.5)): saturated; sign from negative-count
      parity.

    The gray pass is a left-semi join of the exploded rows against the
    gray CELLS (vanishingly few in real data) followed by a bounded
    ``collect_list`` (<= ~65 elements by construction) — scale-safe.

    Scan accounting (ADVICE r3 — the old docstring claimed "zero extra
    scans" while the uncached ``stats``/``base`` lineage re-scanned the
    source up to 4x): ``stats`` (one row per (group, pos) cell — tiny)
    is **persisted**, and a driver-side probe of the persisted ``stats``
    decides whether any gray cell exists.  In the common all-low/high
    case the gray pass is skipped entirely and the source is scanned
    EXACTLY ONCE; when gray cells exist the semi-join probe pays one
    additional scan of ``base`` — bounded, and only for corpora that
    actually contain (2^52.5, 2^(bits+0.5)] products.
    """
    lo, hi = INT_BOUNDS[m.elem]
    carrier = m.spark_type.simpleString()
    lo_d = F.lit(str(lo)).cast("decimal(38,0)")
    hi_d = F.lit(str(hi)).cast("decimal(38,0)")
    bits = math.log2(hi + 1)
    d = e.cast("double")
    dec_abs = F.abs(e.cast("decimal(38,0)"))

    keys = [*groups, "__pos"]
    stats = base.groupBy(*keys).agg(
        F.max((e == 0).cast("int")).alias("__zero"),
        (F.sum(F.when(e < 0, 1).otherwise(0)) % 2).alias("__negpar"),
        F.sum(F.when(e != 0, F.log2(F.abs(d))).otherwise(F.lit(0.0)))
        .alias("__logmag"),
        F.product(d).alias("__prodd"),
        F.count(F.lit(1)).alias("__cnt"),
    )
    stats = stats.persist()
    gray_cells = stats.where(
        (F.col("__zero") == 0)
        & (F.col("__logmag") >= 52.5)
        & (F.col("__logmag") <= bits + 0.5)
    ).select(*keys)
    # driver-side probe over the PERSISTED per-cell stats: no gray cell
    # -> skip the second scan of base entirely (the common case)
    if gray_cells.limit(1).count() == 0:
        joined = stats.withColumn("__mag",
                                  F.lit(None).cast("decimal(38,0)"))
    else:
        exact = (
            base.join(gray_cells, keys, "left_semi")
            .where(dec_abs >= 2)
            .groupBy(*keys)
            .agg(F.collect_list(dec_abs).alias("__fs"))
            .select(*keys,
                    F.aggregate("__fs", F.lit(1).cast("decimal(38,0)"),
                                lambda a, b: a * b).alias("__mag"))
        )
        joined = stats.join(exact, keys, "left")

    signed_mag = F.when(F.col("__negpar") == 1, -F.col("__mag")) \
        .otherwise(F.col("__mag"))
    saturated = F.when(F.col("__negpar") == 1, lo_d).otherwise(hi_d)
    val = (
        F.when(F.col("__zero") == 1, F.lit(0).cast(carrier))
        .when(F.col("__mag").isNotNull(),
              F.least(F.greatest(signed_mag, lo_d), hi_d).cast(carrier))
        .when(F.col("__logmag") > bits + 0.5, saturated.cast(carrier))
        .otherwise(
            F.least(F.greatest(F.round(F.col("__prodd")).cast("decimal(38,0)"),
                               lo_d), hi_d).cast(carrier))
    )
    return joined.select(*keys, val.alias("__v"), "__cnt")


def array_reduce_exploded(df: DataFrame, group_cols: Sequence[str],
                          array_col: str, monoid: Monoid | str,
                          elem: str = "int",
                          result_col: str = "result") -> DataFrame:
    """Scalable two-phase monoid reduce (SURVEY.md §2.1a).

    Plan shape::

        scan -> filter(valid) -> posexplode
             -> HashAggregate(group, pos)      # partial+final, map-side combine
             -> window max(cnt) over group     # min-length truncation w/o a join
             -> HashAggregate(group)           # rebuild array, sorted by pos

    The (group, pos) aggregation carries the monoid across partitions the
    same way the reference's ``merge_batch`` does (``src/monoid.rs:445-465``)
    — associativity makes the shuffle-split safe.  Min-length truncation
    exploits that every valid array covers position 0, so the number of
    arrays in a group equals ``max(cnt)``; a position belongs to the
    result iff **all** arrays cover it (``cnt == max(cnt)``).  The window
    and the rebuild aggregate share the group hash-partitioning, so AQE
    reuses the exchange instead of shuffling twice.
    """
    m = monoid if isinstance(monoid, Monoid) else get_monoid(monoid, elem)
    ident = m.identity_lit()

    groups = list(group_cols)
    dummy = not groups
    if dummy:
        df = df.withColumn("__g", F.lit(1))
        groups = ["__g"]

    arr = F.col(array_col).cast(T.ArrayType(m.spark_type, True))
    base = (
        df.where(F.col(array_col).isNotNull() & (F.size(array_col) > 0))
        .select(*groups, F.posexplode(arr).alias("__pos", "__elem"))
    )
    e = F.coalesce(F.col("__elem"), ident)

    if m.op == "product" and m.agg is None:
        if math.log2(INT_BOUNDS[m.elem][1] + 1) > 53:
            # 64-bit carrier: in-range magnitudes above 2^53 exist, so
            # the double-product form is lossy there — take the exact
            # gray-zone two-pass instead
            per_pos = _exact_product_per_pos(base, groups, m, e)
        else:
            per_pos = base.groupBy(*groups, "__pos").agg(
                _int_product_agg(m, e).alias("__v"),
                F.count(F.lit(1)).alias("__cnt"))
    else:
        per_pos = base.groupBy(*groups, "__pos").agg(
            m.agg(e).alias("__v"), F.count(F.lit(1)).alias("__cnt"))

    w = Window.partitionBy(*groups)
    kept = (
        per_pos.withColumn("__n", F.max("__cnt").over(w))
        .where(F.col("__cnt") == F.col("__n"))
    )
    out = kept.groupBy(*groups).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("__pos", "__v"))),
            lambda s: s["__v"],
        ).alias(result_col)
    )
    return out.drop("__g") if dummy else out


# ---------------------------------------------------------------------------
# Form 3: pandas / NumPy oracle
# ---------------------------------------------------------------------------

def _np_fold(arrays: Iterable, m: Monoid):
    """NumPy mirror of the accumulator fold (``src/monoid.rs:360-378``).

    Vectorized over the group (optimization round r14, guide §4.2):
    the per-row ``isna``/``where`` masking is hoisted into ONE pass
    over a (rows, n) matrix, and ops whose combine is exact and
    associative (integer sum — exact object ints; min/max — exact in
    every dtype) fold via a C-level ``ufunc.reduce`` instead of a
    Python row loop.  Order-SENSITIVE combines keep the left fold with
    ``np_combine`` unchanged: float sum/product round per step, and
    the integer product saturates per pair — for those only the
    masking moved, so every op stays bit-identical to the r13 form
    (pinned by the 4-op x 10-type golden matrix)."""
    vals = [a for a in arrays if a is not None and len(a) > 0]
    if not vals:
        return None
    n = min(len(a) for a in vals)
    mat = np.empty((len(vals), n), dtype=object)
    for i, a in enumerate(vals):
        mat[i, :] = np.asarray(a[:n], dtype=object)
    mask = pd.isna(mat)
    if mask.any():
        mat = np.where(mask, m.identity, mat)
    if m.elem in ("float", "double"):
        mat = mat.astype(np.float64)
        if m.op in ("max", "min"):
            # exact in floats too (no rounding), NaNs already masked
            acc = (np.maximum if m.op == "max"
                   else np.minimum).reduce(mat, axis=0)
        else:
            # per-step f64 rounding: keep the sequential left fold
            acc = mat[0]
            for i in range(1, mat.shape[0]):
                acc = m.np_combine(acc, mat[i])
    elif m.op in ("max", "min"):
        acc = (np.maximum if m.op == "max"
               else np.minimum).reduce(mat, axis=0)
    elif m.op == "sum":
        # exact object ints: associative, clamped once in np_finish
        acc = np.add.reduce(mat, axis=0)
    else:
        # integer product saturates PER PAIR (np_combine clamps):
        # order-sensitive, keep the left fold
        acc = mat[0]
        for i in range(1, mat.shape[0]):
            acc = m.np_combine(acc, mat[i])
    if m.np_finish is not None:
        acc = m.np_finish(np.asarray(acc, dtype=object))
    if isinstance(m.spark_type, T.DecimalType):
        # Arrow needs decimal.Decimal objects for a DecimalType column
        return [None if x is None else Decimal(int(x)) for x in acc]
    return [x for x in acc]


def array_reduce_pandas(df: DataFrame, group_cols: Sequence[str],
                        array_col: str, monoid: Monoid | str,
                        elem: str = "int",
                        result_col: str = "result") -> DataFrame:
    """Per-group NumPy fold via ``applyInPandas`` — the oracle form.

    Complete-mode (whole group on one executor through Arrow); the
    reference's semantics in ~15 lines of NumPy.  Not for unbounded
    groups — that's :func:`array_reduce_exploded`.
    """
    m = monoid if isinstance(monoid, Monoid) else get_monoid(monoid, elem)
    groups = list(group_cols)
    dummy = not groups
    if dummy:
        df = df.withColumn("__g", F.lit(1))
        groups = ["__g"]

    gfields = [df.schema[g] for g in groups]
    schema = T.StructType(
        [T.StructField(f.name, f.dataType, f.nullable) for f in gfields]
        + [T.StructField(result_col, T.ArrayType(m.spark_type, True), True)]
    )

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        row = {g: [pdf[g].iloc[0]] for g in groups}
        row[result_col] = [_np_fold(pdf[array_col], m)]
        return pd.DataFrame(row)

    out = df.select(*groups, array_col).groupBy(*groups).applyInPandas(fold, schema)
    return out.drop("__g") if dummy else out


# ---------------------------------------------------------------------------
# SQL registration (reference entry point: ctx.register_udaf,
# src/monoid.rs:542 + factories src/monoid.rs:472-526)
# ---------------------------------------------------------------------------

#: default per-group row cap for the Complete-mode SQL UDAF — past this
#: the group's arrays no longer plausibly fit one executor's Arrow batch
#: budget, and the registered name raises instead of OOMing mid-job.
#: Override per-registration (``register_all(max_group_rows=...)``) or
#: globally via ``SPARK_GRAFT_UDAF_MAX_GROUP_ROWS``.
DEFAULT_MAX_GROUP_ROWS = int(
    os.environ.get("SPARK_GRAFT_UDAF_MAX_GROUP_ROWS", "1000000"))


def make_pandas_udaf(monoid: Monoid,
                     max_group_rows: int | None = None):
    """GROUPED_AGG pandas UDAF for ``SELECT array_reduce_sum(arrays)``.

    GROUPED_AGG is Complete-mode: Spark hands the WHOLE group to this
    function (no partial/final split), so memory is O(group size).  The
    ``max_group_rows`` guard (default :data:`DEFAULT_MAX_GROUP_ROWS`)
    turns the silent scale cliff into a loud, actionable error naming
    the partial-agg routes — ``route_monoid_sql`` for SQL text,
    ``array_reduce_exploded`` for DataFrames (VERDICT r4 item 1)."""
    m = monoid
    cap = DEFAULT_MAX_GROUP_ROWS if max_group_rows is None else max_group_rows

    @F.pandas_udf(T.ArrayType(m.spark_type, True))
    def udaf(s: pd.Series) -> list:
        if cap is not None and len(s) > cap:
            raise ValueError(
                f"array_reduce_{m.op}: group of {len(s)} arrays exceeds the "
                f"Complete-mode cap of {cap} rows.  This registered SQL UDAF "
                f"materializes each group on one executor; for unbounded "
                f"groups use datafusion_monoid_spark.sql_route."
                f"route_monoid_sql(spark, <same SQL>) or the DataFrame API "
                f"array_reduce_exploded — identical semantics, "
                f"partial-aggregation plan.")
        return _np_fold(s, m)

    return udaf


def register_all(spark: SparkSession, default_elem: str = "int",
                 suffix_types: Sequence[str] = (),
                 max_group_rows: int | None = None) -> None:
    """Register the UDAF family into the session SQL registry.

    ``array_reduce_{sum,product,max,min}`` bind to ONE element type
    (Int32 by default) like the reference's backward-compat factories
    (``src/monoid.rs:472-489``); type-suffixed names
    (``array_reduce_sum_double``) mirror the generic factories
    (``src/monoid.rs:491-526``).  A single ``default_elem`` (rather than a
    list) keeps the unsuffixed registration unambiguous.

    Every registered name carries the Complete-mode group-size guard
    (see :func:`make_pandas_udaf`); the scale path for the same SQL text
    is :func:`datafusion_monoid_spark.sql_route.route_monoid_sql`.
    """
    for op in ("sum", "product", "max", "min"):
        spark.udf.register(
            f"array_reduce_{op}",
            make_pandas_udaf(get_monoid(op, default_elem), max_group_rows))
        for elem in suffix_types:
            spark.udf.register(
                f"array_reduce_{op}_{elem}",
                make_pandas_udaf(get_monoid(op, elem), max_group_rows))
