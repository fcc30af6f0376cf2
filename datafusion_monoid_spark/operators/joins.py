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


def asof_join_cogrouped(left: DataFrame, right: DataFrame, on: str, by: str,
                        right_cols: list[str],
                        tolerance: int | None = None) -> DataFrame:
    """``pd.merge_asof``-per-key twin of :func:`asof_join`, via the
    cogrouped ``applyInPandas`` API: both sides hash-partition on the
    key, each key's two Arrow batches meet in one Python worker.

    Same output as the window form (cross-checked in tests) — the
    window form is the production path (stays JVM-side); this form is
    the escape hatch for per-key logic a window cannot express
    (interpolation, state machines) and pins the cogroup plumbing.
    Scale shape: one co-partitioned shuffle per side, per-key memory
    bounded by the key's rows — same contract as any groupBy.
    """
    import pandas as pd

    lcols = list(left.columns)
    out_fields = [f"{c} {left.schema[c].dataType.simpleString()}"
                  for c in lcols]
    out_fields.append(f"matched_{on} {right.schema[on].dataType.simpleString()}")
    out_fields += [f"matched_{c} {right.schema[c].dataType.simpleString()}"
                   for c in right_cols]
    schema = ", ".join(out_fields)

    def merge(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        lpdf = lpdf.sort_values(on, kind="mergesort")
        rslim = (rpdf[[on] + right_cols].sort_values(on, kind="mergesort")
                 .rename(columns={c: f"matched_{c}" for c in right_cols})
                 .rename(columns={on: f"matched_{on}"}))
        kw = {}
        if tolerance is not None:
            kw["tolerance"] = tolerance
        m = pd.merge_asof(lpdf, rslim, left_on=on,
                          right_on=f"matched_{on}",
                          direction="backward", **kw)
        return m[[c for c in m.columns
                  if c in lcols or c.startswith("matched_")]]

    return (left.groupBy(by).cogroup(right.groupBy(by))
            .applyInPandas(merge, schema))


def interval_overlap_join(left: DataFrame, right: DataFrame,
                          start_col: str, end_col: str, width: int,
                          r_prefix: str = "r_") -> DataFrame:
    """Interval x interval OVERLAP join (closed intervals): every
    (left, right) pair with ``l.start <= r.end AND r.start <= l.end``,
    each pair emitted exactly ONCE — without a distinct.

    The third member of the join family (as-of = most-recent-point,
    range = point-in-interval, this = interval-intersects-interval —
    the relation neither an equi- nor a band-join expresses).  Naive
    Spark gives a broadcast nested loop; the classic distributed
    answer is temporal bucketing:

    * each side explodes its interval into the fixed-width buckets it
      covers (fan-out = interval length / width, ~1 when ``width`` is
      chosen near the typical interval length);
    * candidates equi-join on the bucket key — ONE hash shuffle per
      side, co-temporal rows only;
    * the exact overlap predicate drops bucket-collision false
      positives, and the **first-shared-bucket rule** — keep a pair
      only where ``bucket == max(floor(l.start/w), floor(r.start/w))``
      — makes every surviving pair unique by construction, so no
      post-join distinct (which would re-shuffle the pair relation)
      is needed.  For overlapping pairs that bucket is shared: both
      floors are <= floor(min(l.end, r.end)/w) exactly when the
      intervals intersect.

    Right columns come back ``r_``-prefixed; both sides may share a
    lineage (self-join safe).  ``width`` must match the units of the
    interval columns (integer seconds here).
    """
    w = int(width)

    def buckets(s: str, e: str) -> Column:
        return F.sequence(F.floor(F.col(s) / w).cast("bigint"),
                          F.floor(F.col(e) / w).cast("bigint"))

    lb = left.withColumn("__lbkt", F.explode(buckets(start_col, end_col)))
    rs, re_ = r_prefix + start_col, r_prefix + end_col
    rb = right.select([F.col(c).alias(r_prefix + c) for c in right.columns])
    rb = rb.withColumn("__rbkt", F.explode(buckets(rs, re_)))
    first_shared = F.greatest(
        F.floor(F.col(start_col) / w), F.floor(F.col(rs) / w)).cast("bigint")
    return (lb.join(rb, F.col("__lbkt") == F.col("__rbkt"))
            .where((F.col(start_col) <= F.col(re_))
                   & (F.col(rs) <= F.col(end_col))
                   & (F.col("__lbkt") == first_shared))
            .drop("__lbkt", "__rbkt"))
