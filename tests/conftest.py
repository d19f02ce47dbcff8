from __future__ import annotations

import os

import pytest

from ubparquet_spark.session import get_session

SF_SMOKE = os.environ.get("UBSPARK_TEST_SF", "/root/testdata/sf0.001")
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_session("ubparquet_spark-tests")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE
