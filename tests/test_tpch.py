"""Every relational plan hash-matches the DuckDB oracle (exact, rtol=0)."""

from __future__ import annotations

import pytest

from ubparquet_spark.plans import tpch

from .oracle import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(tpch.QUERIES))
def test_tpch_query_matches_oracle(spark, sf_dir, name):
    fn, sql = tpch.QUERIES[name]
    if sql is None:
        # sketch/approximate queries have no cross-engine oracle:
        # rows-only check (mirrors the driver's weaker gate)
        rows = fn(spark, sf_dir).collect()
        assert len(rows) >= 0
        return
    assert_matches_oracle(fn(spark, sf_dir), sql, sf_dir)
