"""Event-time plans hash-match the DuckDB oracle."""

from __future__ import annotations

import pytest

from ubparquet_spark.plans import events

from .oracle import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(events.QUERIES))
def test_events_query_matches_oracle(spark, sf_dir, name):
    fn, sql = events.QUERIES[name]
    assert_matches_oracle(fn(spark, sf_dir), sql, sf_dir)


def test_outliers_degenerate_groups_yield_null_not_crash(spark, tmp_path):
    """A single-event type (n=1) and a zero-variance type must produce
    NULL z / NULL flag — not an ANSI DIVIDE_BY_ZERO job failure (DuckDB
    yields NULL for the same rows, so NULL is also the parity answer)."""
    import datetime

    from ubparquet_spark.plans.events import q_events_outliers

    ts = datetime.datetime(2024, 1, 1)
    rows = [
        (1, ts, 1, "solo", 5.0, "{}"),          # n=1
        (2, ts, 1, "flat", 7.0, "{}"),          # zero variance
        (3, ts, 2, "flat", 7.0, "{}"),
        (4, ts, 1, "ok", 1.0, "{}"),            # healthy group
        (5, ts, 2, "ok", 2.0, "{}"),
        (6, ts, 3, "ok", 9.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string"
    )
    d = str(tmp_path / "sf_degenerate")
    df.write.parquet(f"{d}/events.parquet")
    out = {r.event_id: r for r in q_events_outliers(spark, d).collect()}
    assert out[1].z is None and out[1].is_outlier is None
    assert out[2].z is None and out[3].z is None
    assert out[4].z is not None and out[6].is_outlier is not None
