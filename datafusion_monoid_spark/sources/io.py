"""Format-agnostic read/write helpers — the engine's source/sink surface.

Parquet is the primary format (columnar, pushdown, pruning).  CSV/JSON
exist for interchange: both lose type information, so reads take an
explicit schema (never ``inferSchema`` in production paths).  ORC ships
with Spark and behaves like parquet.  Lake formats (Delta/Iceberg/Hudi)
need jars not present in this environment — gated with a clear error.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

FORMATS = ("parquet", "orc", "csv", "json")
LAKE_FORMATS = ("delta", "iceberg", "hudi")


def write_table(df: DataFrame, path: str, fmt: str = "parquet",
                mode: str = "overwrite", partition_by: list[str] | None = None) -> None:
    if fmt in LAKE_FORMATS:
        raise NotImplementedError(
            f"{fmt}: lake-format jars are not on the classpath in this "
            f"environment (verified: DATA_SOURCE_NOT_FOUND without this "
            f"gate — tests/test_sources.py).  To enable: start the "
            f"session with the connector on the classpath, e.g. "
            f"spark.jars.packages=io.delta:delta-spark_2.13:<ver> plus "
            f"its catalog/extension confs, then remove this gate.")
    if fmt not in FORMATS:
        raise ValueError(f"unknown format {fmt!r}; supported: {FORMATS}")
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if fmt == "csv":
        w = w.option("header", "true")
    w.format(fmt).save(path)


def read_table(spark: SparkSession, path: str, fmt: str = "parquet",
               schema: StructType | str | None = None) -> DataFrame:
    if fmt in LAKE_FORMATS:
        raise NotImplementedError(f"{fmt}: see write_table gate.")
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    if fmt == "csv":
        r = r.option("header", "true")
    return r.format(fmt).load(path)


def compact_parquet(spark: SparkSession, src_dir: str, dst_dir: str,
                    target_file_mb: int = 128) -> int:
    """Small-file compaction: rewrite ``src_dir`` into files of roughly
    ``target_file_mb``.  Returns the output file count.

    The small-files problem is a 100 TB killer in slow motion: a
    streaming sink or over-parallel writer leaves thousands of KB-scale
    files, and every later scan pays per-file open/footer/scheduling
    costs that dwarf the data read.  Sizing from the actual on-disk
    bytes (not row counts) keeps output files near the row-group sweet
    spot.  Uses coalesce (no shuffle) — compaction must not pay a full
    re-partition; use layout.zorder_repartition instead when you want
    clustering WITH compaction."""
    import math
    import os

    total = sum(os.path.getsize(os.path.join(r, f))
                for r, _, fs in os.walk(src_dir)
                for f in fs if f.endswith(".parquet"))
    n = max(1, math.ceil(total / (target_file_mb * 1024 * 1024)))
    spark.read.parquet(src_dir).coalesce(n).write.mode("overwrite") \
        .parquet(dst_dir)
    return n
