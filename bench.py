"""Driver-contract benchmark entry point.

Thin wrapper over :mod:`datafusion_monoid_spark.bench` (also runnable
as ``python -m datafusion_monoid_spark.bench`` or the ``dms-bench``
console script once installed).  Kept at the repo root because the
round driver invokes ``python bench.py`` here and reads
``bench_result.json`` next to it; see the module docstring of
``datafusion_monoid_spark/bench.py`` for the output format and the
timing protocol.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from datafusion_monoid_spark.bench import main

if __name__ == "__main__":
    # $SPARK_GRAFT_BENCH_OUT wins when set (scale-tier runs redirect the
    # artifact); the driver default stays bench_result.json next to this
    # script
    main(out_path=os.environ.get("SPARK_GRAFT_BENCH_OUT")
         or os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "bench_result.json"))
