"""As-of join operator semantics: inclusivity, ties, missing priors."""

from __future__ import annotations

import datetime as dt

from ubparquet_spark.operators.asof import as_of_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-01 10:00:00")),  # prior right at 09:00
            (2, 10, _ts("2024-01-01 09:00:00")),  # exactly equal ts -> inclusive
            (3, 10, _ts("2024-01-01 08:00:00")),  # no prior right -> null
            (4, 20, _ts("2024-01-01 12:00:00")),  # other key
        ],
        "id long, k long, ts timestamp_ntz",
    )
    right = spark.createDataFrame(
        [
            (10, _ts("2024-01-01 09:00:00"), 100.0),
            (10, _ts("2024-01-01 09:30:00"), 200.0),
            (20, _ts("2024-01-01 11:00:00"), 300.0),
        ],
        "k long, rts timestamp_ntz, v double",
    )
    out = {
        r.id: (r.asof_rts, r.asof_v)
        for r in as_of_join(
            left, right, ["k"], left_ts="ts", right_ts="rts", right_payload=["rts", "v"]
        ).collect()
    }
    assert out[1] == (_ts("2024-01-01 09:30:00"), 200.0)  # latest prior
    assert out[2] == (_ts("2024-01-01 09:00:00"), 100.0)  # equal ts inclusive
    assert out[3] == (None, None)                          # nothing prior
    assert out[4] == (_ts("2024-01-01 11:00:00"), 300.0)  # keys isolated


def test_asof_null_payload_in_latest_right_row(spark):
    """A NULL payload value in the most recent right row must be carried
    as-is (match the latest ROW), not skipped in favor of an older non-null
    value — DuckDB/kdb ASOF semantics."""
    left = spark.createDataFrame(
        [(1, 10, _ts("2024-01-01 10:00:00"))], "id long, k long, ts timestamp_ntz"
    )
    right = spark.createDataFrame(
        [
            (10, _ts("2024-01-01 09:00:00"), 100.0, "old"),
            (10, _ts("2024-01-01 09:30:00"), None, "new"),  # latest: v is NULL
        ],
        "k long, rts timestamp_ntz, v double, tag string",
    )
    row = as_of_join(
        left, right, ["k"], left_ts="ts", right_ts="rts",
        right_payload=["rts", "v", "tag"],
    ).collect()[0]
    # latest row matched wholesale: NULL v carried, no column stitching
    assert row.asof_rts == _ts("2024-01-01 09:30:00")
    assert row.asof_v is None
    assert row.asof_tag == "new"


def test_asof_preserves_left_rowcount(spark, sf_dir):
    from pyspark.sql import functions as F
    from ubparquet_spark.io import load_table

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", F.col("ts").alias("cts"))
    out = as_of_join(purchases, clicks, ["user_id"], left_ts="ts", right_ts="cts", right_payload=["cts"])
    assert out.count() == purchases.count()


def test_asof_null_key_and_null_ts_never_match(spark):
    """Equi-join NULL-key semantics (round-7 null-key sweep): NULL-key
    or NULL-ts right rows match nothing; NULL-key / NULL-ts left rows
    are kept with a null payload — exactly DuckDB/kdb ASOF."""
    from pyspark.sql import functions as F

    from ubparquet_spark.operators.asof import as_of_join

    left = spark.createDataFrame(
        [
            (1, 10, 100),     # normal: matches right at ts 90
            (2, None, 100),   # NULL key: kept, null payload
            (3, 30, None),    # NULL ts: kept, null payload
        ],
        "id long, k long, ts long",
    )
    right = spark.createDataFrame(
        [
            (10, 90, 7.0),     # the legitimate match
            (None, 80, 8.0),   # NULL key: must never match anything
            (10, None, 9.0),   # NULL ts: must never match anything
            (30, 95, 6.0),
        ],
        "k long, rts long, payload double",
    )
    got = {
        r.id: r.asof_payload
        for r in as_of_join(
            left, right, ["k"],
            left_ts="ts", right_ts="rts", right_payload=["payload"],
        ).collect()
    }
    assert got == {1: 7.0, 2: None, 3: None}
