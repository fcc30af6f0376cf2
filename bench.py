"""Benchmark harness — runs the query catalog at ``$SPARK_GRAFT_SF_DIR``
(default /root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and emits
ONE compact JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"tpch_q1": sec, ...}, "recall": {"sim_topk_lsh": r, ...},
     "sf": 0.1}

The line is BOTH printed to stdout (the only stdout line this script
produces — Spark logs go to stderr) AND written to ``bench_result.json``
next to this file, so a pipeline that truncates captured stdout can
still read the full artifact (round-2's BENCH record lost 24 of 90
per-query timings to head-truncation).

Timing protocol: each query is forced end-to-end with the noop writer
(full materialization, no driver collect); the reported number is the
MEDIAN of ``$SPARK_GRAFT_BENCH_REPEATS`` (default 3) runs — medians are
robust to the ambient-load outliers that made two round-2 queries look
3x slower than they are.

ANN quality: recall@5 of each approximate top-k query against the exact
brute-force result is measured on the same session and reported under
``recall`` — parameter drift in the LSH/IVF tiers shows up here before
it shows up as a silent quality regression.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from datafusion_monoid_spark.session import get_spark
from datafusion_monoid_spark import queries as qcat

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPEATS = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))
OUT_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "bench_result.json")

#: approximate top-k queries measured against this exact baseline
_ANN_BASELINE = "sim_topk_bruteforce"
_ANN_QUERIES = ("sim_topk_lsh", "sim_topk_ivf", "sim_topk_ivf_kmeans")


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _topk_sets(df) -> dict:
    """query_id -> set of returned cand_ids."""
    out: dict = {}
    for row in df.select("query_id", "cand_id").collect():
        out.setdefault(row["query_id"], set()).add(row["cand_id"])
    return out


def _recall(spark, catalog) -> dict[str, float]:
    """Mean recall@k of each ANN tier vs the exact brute-force top-k."""
    try:
        truth = _topk_sets(catalog[_ANN_BASELINE][0](spark, SF_DIR))
    except Exception:
        return {}
    recalls: dict[str, float] = {}
    for name in _ANN_QUERIES:
        if name not in catalog:
            continue
        try:
            approx = _topk_sets(catalog[name][0](spark, SF_DIR))
        except Exception:
            continue
        per_q = [len(approx.get(q, set()) & hits) / len(hits)
                 for q, hits in truth.items() if hits]
        if per_q:
            recalls[name] = round(sum(per_q) / len(per_q), 3)
    return recalls


def main() -> None:
    m = re.search(r"sf([\d.]+)", SF_DIR)
    sf = float(m.group(1)) if m else None

    spark = get_spark("bench")
    catalog = qcat.catalog()

    times: dict[str, float] = {}
    # warm-up: JVM + codegen + parquet footer caches
    _force(catalog["tpch_q1"][0](spark, SF_DIR))

    for name, (fn, _) in catalog.items():
        runs = []
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            _force(fn(spark, SF_DIR))
            runs.append(time.perf_counter() - t0)
        times[name] = round(statistics.median(runs), 3)

    recall = _recall(spark, catalog)
    spark.stop()

    line = json.dumps({
        "metric": "catalog wall-clock (median of %d, noop sink)" % REPEATS,
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "recall": recall,
        "sf": sf,
    }, separators=(",", ":"))
    with open(OUT_PATH, "w") as f:
        f.write(line + "\n")
    print(line)


if __name__ == "__main__":
    main()
