import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ingest_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        master=os.environ.get("SPARK_GRAFT_TEST_MASTER", "local[4]"),
        app_name="ingest_spark_tests",
        shuffle_partitions=4,
    )
    yield s
    s.stop()
