"""Shared pytest fixtures: one SparkSession per test run, testdata dirs."""

from __future__ import annotations

import os
import tempfile

import pytest

from full_docker_etl_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")
    # keep metastore artifacts (warehouse, derby) out of the repo —
    # both are static configs, so they must be set at session build
    scratch = tempfile.mkdtemp(prefix="fde_spark_")
    s = get_spark(
        app_name="tests",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={
            "spark.sql.warehouse.dir": f"{scratch}/warehouse",
            "spark.driver.extraJavaOptions": f"-Dderby.system.home={scratch}",
        },
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE
