"""Query catalog — every implemented operator from SURVEY.md §2, as
(Spark callable, DuckDB oracle SQL) pairs consumed by ``__spark_entry__``.

Conventions for oracle stability (the driver hash-compares after sorting
columns by name):

* outputs are **scalar columns** — array results are posexploded to
  ``(group, pos, val)`` rows, because list-value serialization differs
  between engines;
* every computed column is aliased identically in Spark and SQL;
* aggregated doubles are ``round(x, 2)`` on both sides (different
  summation orders perturb the last float bits);
* positions are 0-based ints on both sides; counts are bigint on both.

Scale notes are in each query's docstring: the shapes here are the ones
that survive 100 TB — posexplode two-phase monoid reduce, broadcast of
dimension tables, partial aggregation, pushdown-friendly filters.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType as T_LongType

from datafusion_monoid_spark.operators.array_reduce import array_reduce_exploded

QueryFn = Callable[[SparkSession, str], DataFrame]

#: name -> (spark_fn, oracle_sql | None)
_CATALOG: dict[str, tuple[QueryFn, str | None]] = {}


def register(name: str, oracle: str | None):
    def deco(fn: QueryFn) -> QueryFn:
        _CATALOG[name] = (fn, oracle)
        return fn
    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _explode_result(df: DataFrame, groups: list[str], round_to: int | None = 2,
                    cast: str | None = None) -> DataFrame:
    """(groups, result array) -> (groups, pos, val) scalar rows."""
    out = df.select(*groups, F.posexplode("result").alias("pos", "val"))
    v = F.col("val")
    if round_to is not None:
        v = F.round(v, round_to)
    if cast:
        v = v.cast(cast)
    return out.withColumn("val", v)


# ---------------------------------------------------------------------------
# Core: the array_reduce monoid family (reference src/monoid.rs:226-332),
# exercised through the scalable posexplode form on real tables.
# ---------------------------------------------------------------------------

_MONOID_FIXED_ORACLE = """
SELECT l_returnflag, pos, round({agg}(elem), 2) AS val FROM (
  SELECT l_returnflag,
         unnest([l_quantity, l_extendedprice, l_discount]) AS elem,
         unnest([0, 1, 2]) AS pos
  FROM lineitem
) GROUP BY l_returnflag, pos
"""


def _monoid_fixed(op: str) -> QueryFn:
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        # length-3 double vector per lineitem row, reduced per returnflag.
        # posexplode form: partial+final agg, no per-group materialization —
        # the 100 TB-safe plan.
        li = _t(spark, sf_dir, "lineitem").select(
            "l_returnflag",
            F.array("l_quantity", "l_extendedprice", "l_discount").alias("arr"),
        )
        red = array_reduce_exploded(li, ["l_returnflag"], "arr", op, "double")
        return _explode_result(red, ["l_returnflag"])
    return fn


for _op in ("sum", "min", "max"):
    register(f"monoid_{_op}_double", _MONOID_FIXED_ORACLE.format(agg=_op))(_monoid_fixed(_op))


@register("monoid_product_double", """
SELECT l_orderkey, pos, round(product(elem), 2) AS val FROM (
  SELECT l_orderkey,
         unnest([1.0 + l_discount, 1.0 + l_tax]) AS elem,
         unnest([0, 1]) AS pos
  FROM lineitem
) GROUP BY l_orderkey, pos
""")
def monoid_product_double(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Element-wise product per order over [1+discount, 1+tax] factors —
    bounded group size keeps the product in range."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.array(F.lit(1.0) + F.col("l_discount"), F.lit(1.0) + F.col("l_tax")).alias("arr"),
    )
    red = array_reduce_exploded(li, ["l_orderkey"], "arr", "product", "double")
    return _explode_result(red, ["l_orderkey"])


@register("monoid_sum_ragged_int", """
WITH arrs AS (
  SELECT l_orderkey,
         list(CAST(l_quantity AS INTEGER) ORDER BY l_linenumber, l_quantity) AS arr
  FROM lineitem GROUP BY l_orderkey
),
g AS (SELECT CAST(least(len(arr), 3) AS INTEGER) AS grp, arr FROM arrs),
ml AS (SELECT grp, min(len(arr)) AS n FROM g GROUP BY grp),
ex AS (SELECT grp, unnest(arr) AS elem, unnest(range(0, len(arr))) AS pos FROM g)
SELECT ex.grp, CAST(ex.pos AS INTEGER) AS pos, CAST(sum(ex.elem) AS INTEGER) AS val
FROM ex JOIN ml USING (grp) WHERE ex.pos < ml.n
GROUP BY ex.grp, ex.pos
""")
def monoid_sum_ragged_int(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ragged arrays (1-13 items per order) bucketed by capped length —
    exercises the min-length truncation semantics under GROUP BY.
    Array order is pinned by (l_linenumber, l_quantity) because
    l_linenumber alone is not unique in the synthetic data."""
    li = _t(spark, sf_dir, "lineitem")
    arrs = li.groupBy("l_orderkey").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("l_linenumber", "l_quantity"))),
            lambda s: s["l_quantity"].cast("int"),
        ).alias("arr")
    ).select(F.least(F.size("arr"), F.lit(3)).cast("int").alias("grp"), "arr")
    red = array_reduce_exploded(arrs, ["grp"], "arr", "sum", "int")
    return _explode_result(red, ["grp"], round_to=None)


@register("monoid_sum_nullelems_double", """
SELECT l_returnflag, pos, round(sum(coalesce(elem, 0.0)), 2) AS val FROM (
  SELECT l_returnflag,
         unnest([CASE WHEN l_linenumber % 3 = 0 THEN NULL ELSE l_quantity END,
                 l_extendedprice]) AS elem,
         unnest([0, 1]) AS pos
  FROM lineitem
) GROUP BY l_returnflag, pos
""")
def monoid_sum_nullelems_double(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL elements contribute the identity (src/monoid.rs:371-373)."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.array(
            F.when(F.col("l_linenumber") % 3 != 0, F.col("l_quantity")),
            F.col("l_extendedprice"),
        ).alias("arr"),
    )
    red = array_reduce_exploded(li, ["l_returnflag"], "arr", "sum", "double")
    return _explode_result(red, ["l_returnflag"])


# ---------------------------------------------------------------------------
# Host-engine surface (SURVEY.md §2.2-2.3): scans, filters, joins, aggs,
# windows, rollup, set ops, sort/limit — all Catalyst built-ins; these
# queries pin that the surface works and stays optimized (pushdown,
# broadcast, partial agg).
# ---------------------------------------------------------------------------

@register("tpch_q1", """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)                                    AS sum_qty,
       round(sum(l_extendedprice), 2)                               AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2)            AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       round(avg(l_quantity), 2)                                    AS avg_qty,
       round(avg(l_extendedprice), 2)                               AS avg_price,
       round(avg(l_discount), 4)                                    AS avg_disc,
       count(*)                                                     AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""")
def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: the filter reaches the parquet scan (PushedFilters) and
    the 8 aggregates partial-aggregate map-side."""
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register("join_revenue_by_nation", """
SELECT r_name, n_name, round(sum(o_totalprice), 2) AS revenue, count(*) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
""")
def join_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way dimension join: customer/nation/region are broadcast so the
    fact table never shuffles for the join (only for the final agg)."""
    o = _t(spark, sf_dir, "orders")
    c = F.broadcast(_t(spark, sf_dir, "customer"))
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    r = F.broadcast(_t(spark, sf_dir, "region"))
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"),
             F.count(F.lit(1)).alias("n_orders"))
    )


@register("window_topk_orders", """
SELECT o_custkey, o_orderkey, rk FROM (
  SELECT o_custkey, o_orderkey,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rk
  FROM orders
) WHERE rk <= 3
""")
def window_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer — deterministic tie-break on orderkey."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.select("o_custkey", "o_orderkey", F.row_number().over(w).alias("rk"))
        .where(F.col("rk") <= 3)
    )


@register("rollup_revenue", """
SELECT r_name, n_name, round(sum(o_totalprice), 2) AS revenue
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
""")
def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = F.broadcast(_t(spark, sf_dir, "customer"))
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    r = F.broadcast(_t(spark, sf_dir, "region"))
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    )


@register("distinct_types_per_brand", """
SELECT p_brand, count(DISTINCT p_type) AS n_types, count(*) AS n_parts
FROM part GROUP BY p_brand
""")
def distinct_types_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    return p.groupBy("p_brand").agg(
        F.countDistinct("p_type").alias("n_types"),
        F.count(F.lit(1)).alias("n_parts"),
    )


@register("sort_limit_top_orders", """
SELECT o_orderkey, round(o_totalprice, 2) AS price
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
""")
def sort_limit_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-K: Spark plans TakeOrderedAndProject (per-partition
    top-K + merge), never a full sort."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
        .select("o_orderkey", F.round("o_totalprice", 2).alias("price"))
    )


@register("setop_fulfilled_customers", """
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
EXCEPT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
""")
def setop_fulfilled_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    open_c = o.where(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("custkey"))
    done_c = o.where(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    return open_c.subtract(done_c)  # distinct set-difference, SQL EXCEPT


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events table with a ``sec`` epoch-seconds column.

    The driver's parquet stores ``ts`` as TIMESTAMP(NANOS), which Spark's
    vectorized reader rejects; ``nanosAsLong`` (runtime-settable) reads it
    as raw int64 nanoseconds, normalized here to whole seconds — matching
    DuckDB's ``floor(epoch(ts))``.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    e = _t(spark, sf_dir, "events")
    if isinstance(e.schema["ts"].dataType, T_LongType):
        sec = F.floor(F.col("ts") / F.lit(1_000_000_000)).cast("bigint")
    else:
        sec = F.unix_timestamp("ts").cast("bigint")
    return e.withColumn("sec", sec)


@register("events_hourly", """
SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hour_bucket, event_type,
       count(*) AS n, round(sum(value), 2) AS total
FROM events GROUP BY hour_bucket, event_type
""")
def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-hour aggregation, batch twin of the streaming pipeline."""
    e = _events(spark, sf_dir)
    return (
        e.groupBy(
            F.floor(F.col("sec") / 3600).cast("bigint").alias("hour_bucket"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total"))
    )


@register("events_sessionize", """
WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN CAST(floor(epoch(ts)) AS BIGINT)
                   - CAST(floor(epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))) AS BIGINT)
                   > 1800 OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_s
  FROM events
),
sess AS (
  SELECT user_id,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id, count(*) AS n_events
FROM sess GROUP BY user_id, session_id
""")
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30 min): lag + running sum windows."""
    e = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_sec = F.lag("sec").over(w)
    new_s = F.when(prev_sec.isNull() | ((F.col("sec") - prev_sec) > 1800), 1).otherwise(0)
    wsum = Window.partitionBy("user_id").orderBy("ts", "event_id") \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        e.select("user_id", "ts", "event_id", "sec", new_s.alias("new_s"))
        .select("user_id", F.sum("new_s").over(wsum).cast("bigint").alias("session_id"))
        .groupBy("user_id", "session_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


def catalog() -> dict[str, tuple[QueryFn, str | None]]:
    return dict(_CATALOG)
