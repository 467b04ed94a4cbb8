import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from finance_data_ingestion_pipeline_with_kafka_spark.session import get_spark

SF_DIR = os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.001")


def get_test_spark():
    """The shared test session (getOrCreate — same JVM as the fixture).
    For hypothesis @given tests, which cannot take pytest fixtures."""
    return get_spark(
        app_name="engine-tests",
        master=os.environ.get("TEST_SPARK_MASTER", "local[8]"),
        shuffle_partitions=8,
    )


@pytest.fixture(scope="session")
def spark():
    yield get_test_spark()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
