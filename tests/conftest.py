"""Shared test fixtures: one SparkSession per test run, sf0.001 data."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from warehouse_pg_spark.session import SessionConfig, get_spark

    spark = get_spark(
        SessionConfig(
            app_name="warehouse_pg_spark-tests",
            shuffle_partitions=8,
            extra={"spark.sql.shuffle.partitions": "8"},
        )
    )
    # dialect rewrite output may reference the pg_* shim UDFs (engine.sql
    # registers them on every call; mirror that for bare-session tests)
    from warehouse_pg_spark.functions.pg import register_pg_functions

    register_pg_functions(spark)
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
