from __future__ import annotations

import pytest

from aws_glue_etl_sample_hist_spark.session import get_spark


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "sf01: heavy sf0.1 spot-oracle tier (deselect with -m 'not sf01')",
    )


@pytest.fixture(scope="session")
def spark():
    s = get_spark("engine-tests", cpus=8, shuffle_partitions=8)
    yield s


SF_SMALL = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def sf_small():
    return SF_SMALL


@pytest.fixture(scope="session")
def sf_oracle():
    return SF_ORACLE
