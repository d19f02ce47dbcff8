from __future__ import annotations

import os

import pytest

from ubparquet_spark.session import get_session

# The oracle-parametrized tests default to sf0.01 — the SAME scale the
# driver's CORRECTNESS gate runs at (VERDICT r03 defect #1: the in-repo
# gate previously defaulted to the 10×-smaller smoke dir). Override with
# UBSPARK_TEST_SF=/root/testdata/sf0.001 for faster local iteration.
SF_CORRECT = os.environ.get("UBSPARK_TEST_SF", "/root/testdata/sf0.01")
SF_SMOKE = SF_CORRECT  # back-compat alias; tests all key off sf_dir


@pytest.fixture(scope="session")
def spark():
    s = get_session("ubparquet_spark-tests")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_CORRECT
