"""Benchmark harness — runs the headline query catalog at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"tpch_q1": sec, ...}, "sf": 0.1}

Each query is forced end-to-end with the noop writer (full materialization,
no driver collect).  First run of the session is warm-up (JVM/codegen);
timed runs follow.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from datafusion_monoid_spark.session import get_spark
from datafusion_monoid_spark import queries as qcat

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPEATS = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "2"))


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    m = re.search(r"sf([\d.]+)", SF_DIR)
    sf = float(m.group(1)) if m else None

    spark = get_spark("bench")
    catalog = qcat.catalog()

    times: dict[str, float] = {}
    # warm-up: JVM + codegen + parquet footer caches
    _force(catalog["tpch_q1"][0](spark, SF_DIR))

    for name, (fn, _) in catalog.items():
        best = float("inf")
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            _force(fn(spark, SF_DIR))
            best = min(best, time.perf_counter() - t0)
        times[name] = round(best, 3)

    spark.stop()
    print(json.dumps({
        "metric": "catalog wall-clock (best of %d, noop sink)" % REPEATS,
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "sf": sf,
    }))


if __name__ == "__main__":
    main()
