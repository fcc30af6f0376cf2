"""Skew- and layout-aware helpers: salting and bucketed co-location.

At 100 TB the two classic killers are (a) one hot key owning a shuffle
partition and (b) re-shuffling the same fact table for every join.
These helpers encode the standard cures:

* :func:`salted_aggregate` — two-phase aggregation with an explicit salt
  for EXTREME key skew.  NOTE: for algebraic aggregates Spark's map-side
  partial aggregation already absorbs most skew; salting matters when
  the per-key state is large (collect_list/distinct-style) or the
  downstream is a join.  The monoid discipline is what makes the
  two-phase split legal (same argument as src/monoid.rs:13-21).
* :func:`write_bucketed` / co-located joins — persist both sides
  bucketed by the join key so subsequent joins are exchange-free
  (verified by plan assertion in tests).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_aggregate(df: DataFrame, key_cols: list[str],
                     agg_exprs: dict[str, str | tuple[str, str]],
                     n_salts: int = 16) -> DataFrame:
    """Two-phase skew-safe aggregation.

    Phase 1 groups on (key, salt) — the hot key's rows spread over
    ``n_salts`` reducers; phase 2 merges the partials on key alone.
    ``agg_exprs``: either ``{column: op}`` (output ``column_op``) or
    ``{alias: (column, op)}`` for several ops over one column in a
    single pass, with op in {sum, count, min, max} — ops whose
    partials merge losslessly (count merges by sum).

    The salt is DETERMINISTIC — ``pmod(hash(all non-key cols), n)`` —
    not ``rand()``: a random salt is re-drawn per task attempt, so a
    retried task can route the same row to a different phase-1 partial.
    The monoid merge makes any assignment CORRECT, but deterministic
    salting makes the phase-1 partials themselves reproducible (stable
    shuffle statistics, debuggable spills) at zero cost."""
    merge_op = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}
    specs = [(f"{c}_{v}", c, v) if isinstance(v, str) else (c, v[0], v[1])
             for c, v in agg_exprs.items()]
    non_key = [c for c in df.columns if c not in key_cols] or list(df.columns)
    salted = df.withColumn(
        "__salt", F.pmod(F.hash(*non_key), F.lit(n_salts)))
    phase1 = salted.groupBy(*key_cols, "__salt").agg(*[
        getattr(F, op)(col).alias(f"__p_{alias}") for alias, col, op in specs
    ])
    return phase1.groupBy(*key_cols).agg(*[
        getattr(F, merge_op[op])(f"__p_{alias}").alias(alias)
        for alias, _, op in specs
    ])


def salted_join(fact: DataFrame, dim: DataFrame, key: str,
                n_salts: int = 16,
                salt_src: Column | None = None) -> DataFrame:
    """Skew-safe equi-join for a HOT join key that cannot broadcast.

    The fact side gets a deterministic salt (hash of ``salt_src``, a
    high-cardinality column, mod ``n_salts``); the dim side replicates
    each row ``n_salts`` times with every salt value; the join runs on
    ``(key, __salt)`` — the hot key's rows spread over ``n_salts``
    reducers instead of one.  Result set == the plain join (each fact
    row meets exactly one replica), which is why a plain SQL join is a
    valid oracle even though salting is an execution detail.

    Use when BOTH sides are too big to broadcast and AQE's skew split
    (which only splits the PROBE side of a sort-merge join) is not
    enough — e.g. the dim side is modest-but-over-broadcast-threshold
    and one fact key owns >> 1/parallelism of the rows.  The explicit
    ``shuffle_hash`` hint keeps Spark from choosing broadcast (which
    would make the demo moot) or sort-merge."""
    salt = F.pmod(F.hash(salt_src if salt_src is not None else F.col(key)),
                  F.lit(n_salts))
    f = fact.withColumn("__salt", salt)
    d = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))))
    return f.join(d.hint("shuffle_hash"), [key, "__salt"]).drop("__salt")


def write_bucketed(df: DataFrame, table_name: str, key: str,
                   n_buckets: int = 8) -> None:
    """Persist as a bucketed managed table: later equi-joins/aggs on
    ``key`` between tables bucketed the same way need no exchange."""
    (df.write.mode("overwrite")
     .bucketBy(n_buckets, key).sortBy(key)
     .format("parquet").saveAsTable(table_name))


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  key: str) -> DataFrame:
    """Join two same-bucketed tables — plan shows zero Exchange on the
    join path (see tests/test_skew.py)."""
    return spark.table(left_table).join(spark.table(right_table), key)
