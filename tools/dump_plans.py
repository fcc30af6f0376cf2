"""Dump ``explain("formatted")`` for catalog entries to files.

Usage: python tools/dump_plans.py <out_dir> <suffix> <name> [name ...]

Writes ``<out_dir>/<name>_<suffix>.txt`` for each entry — the plan
artifact the optimization rounds commit under ``plans/rNN/`` so the
judge can check plan claims without running Spark.  Entries whose
builders run eager driver-side fits execute those fits while the plan
is constructed; the dumped plan is the final returned relation's.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datafusion_monoid_spark.session import get_spark
from datafusion_monoid_spark import queries as qcat

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    out_dir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump-plans")
    cat = qcat.catalog()
    for name in names:
        try:
            df = cat[name][0](spark, SF_DIR)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
        except Exception as e:  # noqa: BLE001 — record, keep dumping
            txt = f"ERROR building {name}: {e}\n"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(txt)
        print("wrote", name, flush=True)
        qcat.release_pending_checkpoints()
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
