"""Isolated best-of-N measurement for catalog entries (optimization rounds).

Usage: python tools/measure_entries.py <out_json> <name> [name ...]

Protocol (guide §1.4): one session at $SPARK_GRAFT_CPUS, warm with
tpch_q1, then per entry N=3 noop-sink materializations with pending
checkpoints released between runs; records per-run seconds plus the
best and median.  Quiet-host numbers — run nothing else concurrently.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datafusion_monoid_spark.session import get_spark
from datafusion_monoid_spark import queries as qcat

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPEATS = int(os.environ.get("SPARK_GRAFT_MEASURE_REPEATS", "3"))


def main() -> int:
    out_path, names = sys.argv[1], sys.argv[2:]
    cat = qcat.catalog()
    # validate up front: a typo on entry 12 of a long quiet-host run
    # must not cost the 11 measurements already taken
    unknown = [n for n in names if n not in cat]
    if unknown:
        print(f"unknown entries: {unknown}", file=sys.stderr)
        return 2
    spark = get_spark("measure-entries")
    spark.sparkContext.setJobDescription("warm-up")
    cat["tpch_q1"][0](spark, SF_DIR).write.format("noop") \
        .mode("overwrite").save()
    out: dict[str, dict] = {}
    for name in names:
        runs = []
        for i in range(REPEATS):
            spark.sparkContext.setJobDescription(f"{name} run {i}")
            t0 = time.perf_counter()
            cat[name][0](spark, SF_DIR).write.format("noop") \
                .mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
            qcat.release_pending_checkpoints()
        out[name] = {"runs": runs, "best": min(runs),
                     "median": statistics.median(runs)}
        print(name, out[name], flush=True)
        # dump after every entry: a crash mid-run keeps what's done
        with open(out_path, "w") as f:
            json.dump({"sf_dir": SF_DIR, "entries": out}, f, indent=1)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
