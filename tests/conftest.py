import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")  # plenty for sf0.001 tests


@pytest.fixture(scope="session")
def spark():
    from twilio_event_streams_reporting_example_spark.session import get_spark

    spark = get_spark("tests")
    yield spark
    spark.stop()


SF_TEST_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_TEST_DIR
