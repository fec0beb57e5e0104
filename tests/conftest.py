"""Shared pytest fixtures: one SparkSession for the whole run.

local[4] with 4 shuffle partitions keeps unit tests fast; the bench
harness (bench.py) is where local[32]/sf0.1 scale settings live.
"""

from __future__ import annotations

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyp_etl_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("pytest", cpus=4, shuffle_partitions=4, driver_memory="4g")
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


def rows(df, *cols):
    """Collect as sorted list of tuples for order-insensitive compares."""
    if cols:
        df = df.select(*cols)
    return sorted(tuple(r) for r in df.collect())
