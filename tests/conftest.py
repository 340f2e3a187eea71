import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def pytest_collection_modifyitems(session, config, items):
    """Run test_submit.py FIRST: it spawns spark-submit subprocess JVMs and
    must not overlap the in-process session (CLAUDE.md: one Spark session at
    a time on this shared host). Alphabetical order would start the fixture
    session long before test_submit; fronting it means the subprocesses run
    while no in-process JVM exists, with zero coverage loss."""
    front = [it for it in items if "test_submit" in it.nodeid]
    rest = [it for it in items if "test_submit" not in it.nodeid]
    items[:] = front + rest


@pytest.fixture(scope="session")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("spatial-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.constraintPropagation.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "4g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s
    s.stop()
