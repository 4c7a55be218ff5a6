import pytest

from sensordatapipelines_spark import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="sensordatapipelines-tests", master="local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s
