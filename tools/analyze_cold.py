"""Compare a cold-start bench sweep against its in-run DuckDB oracle
column and the prior (warm/driver) record.

Usage: python tools/analyze_cold.py /tmp/bench_cold_r7.json [prior.json]

Flags every entry whose COLD Spark time exceeds 2x its DuckDB oracle
AND 2.6 s absolute (the adjudicated fixed-cost floor at sf0.1 --
BENCH_r04/VERDICT r4: sub-2.6 s entries are Spark's per-job constant
vs DuckDB microseconds, invariant in data size).
"""
from __future__ import annotations

import json
import sys


def main() -> None:
    cold = json.load(open(sys.argv[1]))
    prior = json.load(open(sys.argv[2])) if len(sys.argv) > 2 else None
    cq, dq = cold["queries"], cold["duckdb"]["queries"]
    print(f"cold total {cold['value']:.1f}s  duckdb {cold['duckdb']['value']:.1f}s"
          f"  ratio {cold['ratio']:.3f}  n={len(cq)}")
    flagged = []
    for name, s in sorted(cq.items(), key=lambda kv: -kv[1]):
        d = dq.get(name)
        if d and s > 2 * d and s > 2.6:
            flagged.append((name, s, d))
    print(f"\n>2x oracle AND >2.6s cold: {len(flagged)}")
    for name, s, d in flagged:
        p = (prior or {}).get("queries", {}).get(name)
        print(f"  {name:40s} cold {s:7.2f}  duckdb {d:7.2f}  "
              f"({s/d:4.1f}x)  prior {p if p is not None else '-'}")
    print("\ntop-10 slowest cold entries:")
    for name, s in sorted(cq.items(), key=lambda kv: -kv[1])[:10]:
        p = (prior or {}).get("queries", {}).get(name)
        print(f"  {name:40s} {s:7.2f}  duckdb {dq.get(name, float('nan')):7.2f}"
              f"  prior {p if p is not None else '-'}")
    if prior:
        print("\nbiggest cold-vs-prior growth (>1.5s delta):")
        rows = [(n, s, prior["queries"].get(n)) for n, s in cq.items()
                if prior["queries"].get(n) is not None]
        for n, s, p in sorted(rows, key=lambda r: -(r[1] - r[2]))[:12]:
            if s - p > 1.5:
                print(f"  {n:40s} {p:7.2f} -> {s:7.2f}  (+{s-p:.2f})")


if __name__ == "__main__":
    main()
