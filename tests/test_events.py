"""Event-time plans hash-match the DuckDB oracle."""

from __future__ import annotations

import pytest

from ubparquet_spark.plans import events

from .oracle import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(events.QUERIES))
def test_events_query_matches_oracle(spark, sf_dir, name):
    fn, sql = events.QUERIES[name]
    assert_matches_oracle(fn(spark, sf_dir), sql, sf_dir)
