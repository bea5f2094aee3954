import pytest

from pyelt_spark.session import get_session


@pytest.fixture(scope="session")
def spark():
    s = get_session(
        "pyelt_spark_tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.sql.files.maxPartitionBytes": "32m"},
    )
    yield s
    s.stop()
