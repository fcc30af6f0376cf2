"""Join operators Spark lacks natively: as-of join and range join.

Both avoid the naive O(n*m) theta-join:

* :func:`asof_join` — union both sides, one hash-partition shuffle on the
  key, and a sorted window with ``last(..., ignorenulls)`` carries the
  most recent right row forward onto each left row.  One shuffle, no
  cross product, no per-group Python — the classic distributed as-of.
  (A ``pd.merge_asof``-per-group ``applyInPandas`` variant would work
  too, but the window form stays JVM-side.)
* :func:`range_join_bucketed` — explode each dimension range into the
  fixed-granularity buckets it covers, equi-join fact rows on their
  bucket, then apply the exact range predicate.  Turns a nested-loop
  range join into a hash join; granularity trades bucket fan-out against
  candidate precision.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str, by: str,
              right_cols: list[str], tolerance: int | None = None) -> DataFrame:
    """For each left row: the right row with the greatest ``on`` value
    <= the left's, within the same ``by`` key (pandas ``merge_asof``
    "backward" semantics).

    ``on`` must be a numeric/orderable column present on both sides.
    Right-side duplicates on (by, on) must be pre-deduplicated by the
    caller for deterministic output.  ``tolerance``: optional maximum
    allowed (left.on - right.on).
    """
    l = left.withColumn("__side", F.lit(1))
    r = right.withColumn("__side", F.lit(0))
    lcols = left.columns
    payload = F.when(
        F.col("__side") == 0,
        F.struct(F.col(on).alias("__r_on"),
                 *[F.col(c).alias(c) for c in right_cols]),
    )
    # right rows sort before left rows at equal `on`, so an equal
    # timestamp matches (>= semantics)
    unioned = (
        l.unionByName(r, allowMissingColumns=True)
        .withColumn("__payload", payload)
    )
    w = (Window.partitionBy(by)
         .orderBy(F.col(on), F.col("__side"))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = unioned.withColumn(
        "__match", F.last("__payload", ignorenulls=True).over(w))
    out = carried.where(F.col("__side") == 1)
    if tolerance is not None:
        out = out.withColumn(
            "__match",
            F.when(F.col(on) - F.col("__match.__r_on") <= tolerance,
                   F.col("__match")))
    proj = [F.col(c) for c in lcols]
    proj.append(F.col("__match.__r_on").alias(f"matched_{on}"))
    proj += [F.col(f"__match.{c}").alias(f"matched_{c}") for c in right_cols]
    return out.select(*proj)


def range_join_bucketed(fact: DataFrame, dim: DataFrame, value_col: str,
                        lo_col: str, hi_col: str, granularity: float) -> DataFrame:
    """Equi-join ``fact.value_col`` into ``dim`` ranges ``[lo, hi)``.

    Each dim range explodes into ceil(width/granularity) bucket keys; the
    fact row hashes to exactly one bucket.  The exact BETWEEN predicate
    filters the bucket-collision false positives."""
    g = float(granularity)
    dimb = dim.withColumn(
        "__bucket",
        F.explode(F.sequence(
            F.floor(F.col(lo_col) / g).cast("bigint"),
            F.ceil(F.col(hi_col) / g).cast("bigint"),
        )),
    )
    factb = fact.withColumn("__bucket", F.floor(F.col(value_col) / g).cast("bigint"))
    return (
        factb.join(F.broadcast(dimb), "__bucket")
        .where((F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col)))
        .drop("__bucket")
    )
