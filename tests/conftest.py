import pytest

from kapra_timeseries_anonymization_spark.session import build_session


@pytest.fixture(scope="session")
def spark():
    s = build_session("kapra-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()
