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
            "environment; add the connector jar and remove this gate.")
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
