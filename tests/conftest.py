"""Shared fixtures: one local SparkSession per test run, DuckDB oracle
connections, and the parity harness mimicking the driver's correctness gate."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from s3_glue_redshift_guide_spark.catalog import TABLES, table_path  # noqa: E402
from s3_glue_redshift_guide_spark.session import get_spark  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


def pytest_collection_modifyitems(config, items):
    """Tag the workflow-scale tests ``slow`` (VERDICT-r11 directive #1):
    the default run deselects them (pytest.ini ``-m "not slow"``) so it
    finishes inside the driver's verify budget; ``pytest tests/ -m ""``
    runs everything, ``-m slow`` runs only the tagged set. The list
    lives in tests/_slow_list.py (measured, regenerable)."""
    from ._slow_list import SLOW_TESTS

    for item in items:
        if item.nodeid in SLOW_TESTS:
            item.add_marker(pytest.mark.slow)


@pytest.fixture(scope="session")
def spark():
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    s = get_spark("tests", cpus=cpus)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def duck():
    """DuckDB connection with the test tables registered as views, mirroring
    the driver's oracle setup."""

    def connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
        con = duckdb.connect()
        for t in TABLES:
            con.sql(
                f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{table_path(sf_dir, t)}'"
            )
        return con

    cache: dict[str, duckdb.DuckDBPyConnection] = {}

    def get(sf_dir: str = SF_CORRECT) -> duckdb.DuckDBPyConnection:
        if sf_dir not in cache:
            cache[sf_dir] = connect(sf_dir)
        return cache[sf_dir]

    yield get
    for con in cache.values():
        con.close()
