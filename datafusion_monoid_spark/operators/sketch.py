"""Count-Min Sketch — a sketch that IS a monoid.

The CMS of a multiset is a depth x width count matrix; the CMS of a
union of multisets is the ELEMENT-WISE SUM of their matrices — identity
(zero matrix) + associative/commutative combine, i.e. exactly the
algebra of this engine's array monoid-reduce core
(reference src/monoid.rs:13-21).  That makes it partial-aggregation and
streaming safe by construction: per-partition sketches merge with the
same operation as per-row updates.

Construction is pure Catalyst: explode keys -> (depth, bucket) via the
deterministic cross-engine md5 hash family -> count.  The sketch table
(depth, bucket, cnt) is exactly reproducible in any engine, so the
DuckDB oracle verifies the sketch itself, and tests verify the
estimation guarantees (over-estimate only; error <= n/width w.h.p.).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from datafusion_monoid_spark.operators.dedup import md5_long, md5_long_sql

CMS_P = 4294967311  # same prime family as MinHash


def _cms_hash(key: Column, depth_i: int, width: int) -> Column:
    """h_i(key) = ((a_i * md5_64(key) + b_i) mod p) mod width."""
    a, b = 2 * depth_i + 1, (depth_i * 0x9E3779B9) % CMS_P
    h = md5_long(key) % F.lit(2**32)
    return ((F.lit(a) * h + F.lit(b)) % F.lit(CMS_P)) % F.lit(width)


def cms_hash_sql(expr: str, depth_i: int, width: int) -> str:
    """DuckDB twin of :func:`_cms_hash`."""
    a, b = 2 * depth_i + 1, (depth_i * 0x9E3779B9) % CMS_P
    return (f"((({md5_long_sql(expr)} % 4294967296) * {a} + {b}) "
            f"% {CMS_P}) % {width}")


def cms_build(df: DataFrame, key_col: str, depth: int = 4,
              width: int = 256) -> DataFrame:
    """(depth, bucket, cnt): the sketch matrix in long form.

    One explode (x depth) + one hash-partitioned count — linear, one
    shuffle, map-side combine.  Sketches built on any partitioning of
    the data merge by summing cnt per (depth, bucket)."""
    rows = df.select(F.col(key_col).alias("__k"))
    per_depth = rows.select(
        F.posexplode(F.array(*[
            _cms_hash(F.col("__k"), i, width) for i in range(depth)
        ])).alias("depth", "bucket"))
    return (per_depth.groupBy("depth", "bucket")
            .agg(F.count(F.lit(1)).alias("cnt")))


def cms_estimate(sketch: DataFrame, keys: DataFrame, key_col: str,
                 depth: int = 4, width: int = 256) -> DataFrame:
    """Point estimate per key: min over depths of the key's bucket count
    (classic CMS query — always >= the true count)."""
    probes = keys.select(
        F.col(key_col),
        F.posexplode(F.array(*[
            _cms_hash(F.col(key_col), i, width) for i in range(depth)
        ])).alias("depth", "bucket"))
    return (
        probes.join(sketch, ["depth", "bucket"], "left")
        .fillna(0, subset=["cnt"])
        .groupBy(key_col)
        .agg(F.min("cnt").alias("estimate"))
    )
