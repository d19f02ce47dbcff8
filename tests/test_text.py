"""Text-analysis/dedup plans hash-match the DuckDB oracle."""

from __future__ import annotations

import pytest

from ubparquet_spark.plans import text

from .oracle import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(text.QUERIES))
def test_text_query_matches_oracle(spark, sf_dir, name):
    fn, sql = text.QUERIES[name]
    assert_matches_oracle(fn(spark, sf_dir), sql, sf_dir)
