import pytest

from levenshtein_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="levenshtein_spark-tests", master="local[8]", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
