import pytest

from datafusion_monoid_spark.session import get_spark
from datafusion_monoid_spark.operators.array_reduce import register_all


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", cpus=8, shuffle_partitions=8)
    register_all(s, default_elem="int",
                 suffix_types=("bigint", "double", "float", "smallint", "tinyint",
                               "uint8", "uint16", "uint32", "uint64"))
    yield s
    s.stop()
