from __future__ import annotations

import pytest

from parallelutilities_jl_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="pu_tests", cpus=8)
    yield s


SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
