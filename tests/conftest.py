import pytest

from osprey_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(cores=4, app_name="osprey_spark_tests", shuffle_partitions=4)
    yield s
