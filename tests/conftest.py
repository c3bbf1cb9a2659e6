"""Shared fixtures: one SparkSession per test run + a DuckDB oracle con."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datastream_processing_demo_spark.catalog import TABLE_NAMES, table_path
from datastream_processing_demo_spark.session import EngineConfig, get_session

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    # session.py pins RocksDB as the state-store provider (the at-scale
    # store, SURVEY §2.1 ST2); set SPARK_GRAFT_STATESTORE to sweep the
    # streaming suites under another provider (e.g. the default
    # HDFSBackedStateStoreProvider) and pin provider-parity of results
    extra = {}
    provider = os.environ.get("SPARK_GRAFT_STATESTORE")
    if provider:
        extra["spark.sql.streaming.stateStore.providerClass"] = provider
    s = get_session(EngineConfig(app_name="tests", extra_conf=extra))
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def oracle_con(sf_dir):
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{table_path(sf_dir, t)}')")
    yield con
    con.close()
