from __future__ import annotations

import os

import pytest

SF_DIR = os.environ.get("BARCO_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from barco_spark.session import get_spark

    cpus = os.environ.get("BARCO_TEST_CPUS", "4")
    s = get_spark(
        app_name="barco-spark-tests",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
