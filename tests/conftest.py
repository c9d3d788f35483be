from __future__ import annotations

import pytest

from parallelutilities_jl_spark.session import get_spark


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: scale-guard tests that read the sf0.1 fixtures"
    )


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="pu_tests", cpus=8)
    yield s


SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
