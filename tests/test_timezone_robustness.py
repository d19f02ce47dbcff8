"""Results must not depend on the caller's session timezone — the driver
runs queries with its own SparkSession, whose timezone we don't control."""

from __future__ import annotations

import pytest

from ubparquet_spark.plans import events, tpch

from .oracle import assert_matches_oracle


@pytest.fixture
def foreign_tz(spark):
    original = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    yield spark
    spark.conf.set("spark.sql.session.timeZone", original)


def test_events_hourly_invariant_to_session_tz(foreign_tz, sf_dir):
    fn, sql = events.QUERIES["q_events_hourly"]
    assert_matches_oracle(fn(foreign_tz, sf_dir), sql, sf_dir)


def test_sessionize_invariant_to_session_tz(foreign_tz, sf_dir):
    fn, sql = events.QUERIES["q_events_sessionize"]
    assert_matches_oracle(fn(foreign_tz, sf_dir), sql, sf_dir)


def test_q1_invariant_to_session_tz(foreign_tz, sf_dir):
    fn, sql = tpch.QUERIES["q1_pricing_summary"]
    assert_matches_oracle(fn(foreign_tz, sf_dir), sql, sf_dir)


def test_concurrent_sessions_invariant_to_session_tz(foreign_tz, sf_dir):
    """The interval-overlap query's NTZ epoch micros come from
    timestampdiff against the NTZ epoch, never an NTZ→LTZ cast — so a
    foreign session TZ (incl. DST) cannot shift session bounds."""
    fn, sql = events.QUERIES["q_concurrent_sessions"]
    assert_matches_oracle(fn(foreign_tz, sf_dir), sql, sf_dir)


def test_twap_and_interarrival_invariant_to_session_tz(foreign_tz, sf_dir):
    for name in ("q_twap", "q_interarrival_stats", "q_time_to_convert"):
        fn, sql = events.QUERIES[name]
        assert_matches_oracle(fn(foreign_tz, sf_dir), sql, sf_dir)
