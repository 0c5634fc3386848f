from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from severless_data_pipeline_aws_spark.session import get_spark

TEST_SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    sp = get_spark(
        app_name="engine-tests",
        cpus=int(os.environ.get("SPARK_GRAFT_TEST_CPUS", "8")),
        extra_conf={"spark.driver.memory": "8g"},
    )
    yield sp


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return TEST_SF_DIR
