import os

import pytest

from datafusion_monoid_spark.session import get_spark
from datafusion_monoid_spark.operators.array_reduce import register_all


@pytest.fixture(scope="session")
def spark():
    # cores for the test session: the suite must finish inside the
    # round driver's pytest budget (VERIFY_r13 truncated at ~60%);
    # the sandbox has 32 cores and the compute-heavy pipeline twins
    # dominate wall time, so default to 16 (override via
    # SPARK_GRAFT_TEST_CPUS for smaller CI boxes).  Shuffle
    # partitions stay 8: every pinned result is partitioning-
    # invariant by design, but the tiny-relation tests get no
    # benefit from more reducers, only scheduling overhead.
    cpus = int(os.environ.get("SPARK_GRAFT_TEST_CPUS", "16"))
    s = get_spark("tests", cpus=cpus, shuffle_partitions=8)
    register_all(s, default_elem="int",
                 suffix_types=("bigint", "double", "float", "smallint", "tinyint",
                               "uint8", "uint16", "uint32", "uint64"))
    yield s
    s.stop()
