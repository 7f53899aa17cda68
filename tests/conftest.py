import os

import pytest

from feast_hive_spark.session import get_spark
from feast_hive_spark.sources.tables import register_views

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="feast_hive_spark_tests")
    register_views(spark, SF_DIR)
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
