import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fluss_datafusion_spark import EngineSession, build_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_DIR_CORRECTNESS = os.environ.get("SPARK_GRAFT_TEST_SF01_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    spark = build_spark(
        app_name="fluss-datafusion-spark-tests",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]",
        shuffle_partitions=8,
    )
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def engine(spark):
    return EngineSession(spark=spark)


@pytest.fixture(scope="session")
def testdata(spark):
    """sf0.001 tables registered as temp views."""
    from fluss_datafusion_spark.session import register_testdata

    register_testdata(spark, SF_DIR)
    return SF_DIR
