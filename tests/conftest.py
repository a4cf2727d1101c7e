from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(__file__))          # oracle_utils
sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))  # repo root

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from snowflake_data_pipeline_demo_spark.session import get_spark

    s = get_spark("tests")
    yield s


@pytest.fixture(scope="session")
def tables(spark):
    from snowflake_data_pipeline_demo_spark.sources.testdata import load_tables

    return load_tables(spark, SF_SMOKE)
