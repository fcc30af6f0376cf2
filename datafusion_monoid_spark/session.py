"""SparkSession factory tuned for this engine.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]`` (default 32 threads);
the same configs are what we would set on a real cluster:

* AQE on (runtime re-planning, skew-join handling, partition coalescing)
* Arrow on (vectorized pandas-UDF exchange)
* shuffle partitions sized to the parallelism (local) — on a 1000-executor
  cluster this would instead be ~2-3x total cores or left to AQE's
  coalescing with a high initial value.
* UTC session timezone so timestamps compare exactly against the DuckDB
  oracle (duckdb timestamps are UTC-naive).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(app_name: str = "datafusion-monoid-spark",
              cpus: int | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    cpus = cpus or DEFAULT_CPUS
    shuffle_partitions = shuffle_partitions or cpus
    return (
        SparkSession.builder
        .master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # local mode = one JVM doing driver AND executor work: size the
        # heap to the box (this container: 128 GiB).  8g survived sf1 but
        # OOMed the sf10 dedup tier (25M candidate pairs carrying 64-long
        # signatures); on a real cluster this is spark.executor.memory.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.ansi.enabled", "false")
        .getOrCreate()
    )
