import pytest

from graphanalytics_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="ga-tests", cpus=8, shuffle_partitions=8)
    yield s
    s.stop()
