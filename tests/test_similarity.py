"""Similarity-search plans hash-match the DuckDB oracle."""

from __future__ import annotations

import pytest

from ubparquet_spark.plans import similarity

from .oracle import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(similarity.QUERIES))
def test_similarity_query_matches_oracle(spark, sf_dir, name):
    fn, sql = similarity.QUERIES[name]
    assert_matches_oracle(fn(spark, sf_dir), sql, sf_dir)
