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


def test_event_transitions_golden(spark, tmp_path):
    """Hand-computed transition matrix on a 2-user sequence."""
    import datetime

    from ubparquet_spark.plans.events import q_event_transitions

    t0 = datetime.datetime(2024, 1, 1)
    rows = [  # user 1: A,B,A   user 2: B,B
        (1, t0, 1, "A", 0.0, "{}"),
        (2, t0 + datetime.timedelta(minutes=1), 1, "B", 0.0, "{}"),
        (3, t0 + datetime.timedelta(minutes=2), 1, "A", 0.0, "{}"),
        (4, t0, 2, "B", 0.0, "{}"),
        (5, t0 + datetime.timedelta(minutes=1), 2, "B", 0.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string"
    )
    d = str(tmp_path / "sf_trans")
    df.write.parquet(f"{d}/events.parquet")
    out = {
        (r.prev_type, r.next_type): (r.n, r.p)
        for r in q_event_transitions(spark, d).collect()
    }
    assert out == {
        ("A", "B"): (1, 1.0),
        ("B", "A"): (1, 0.5),
        ("B", "B"): (1, 0.5),
    }


def test_survival_km_golden(spark, tmp_path):
    """Hand-computed Kaplan-Meier curve with censoring.

    5 users, horizon day 30, CENSOR_DAYS=7:
      u1 days 0..10  -> t=10 death; u2 day 5 only -> t=0 death;
      u3 days 0..28  -> censored;   u4 days 2..30 -> censored;
      u5 day 30 only -> t=0 censored.
    S(0)=4/5, S(10)=4/5 * 2/3, S(28) unchanged (no deaths).
    """
    import datetime

    from ubparquet_spark.plans.events import q_survival_km

    def ts(day):
        return datetime.datetime(2024, 1, 1) + datetime.timedelta(days=day)

    rows = [
        (1, ts(0), 1, "x", 0.0, "{}"), (2, ts(10), 1, "x", 0.0, "{}"),
        (3, ts(5), 2, "x", 0.0, "{}"),
        (4, ts(0), 3, "x", 0.0, "{}"), (5, ts(28), 3, "x", 0.0, "{}"),
        (6, ts(2), 4, "x", 0.0, "{}"), (7, ts(30), 4, "x", 0.0, "{}"),
        (8, ts(30), 5, "x", 0.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string"
    )
    d = str(tmp_path / "sf_km")
    df.write.parquet(f"{d}/events.parquet")
    out = {r.t_days: r for r in q_survival_km(spark, d).collect()}
    assert set(out) == {0, 10, 28}
    assert (out[0].n_deaths, out[0].n_censored, out[0].n_at_risk) == (1, 1, 5)
    assert out[0].survival == 0.8
    assert (out[10].n_deaths, out[10].n_at_risk) == (1, 3)
    assert out[10].survival == round(0.8 * 2 / 3, 6) == 0.533333
    assert (out[28].n_deaths, out[28].n_censored, out[28].n_at_risk) == (0, 2, 2)
    assert out[28].survival == 0.533333  # no deaths -> curve flat


def test_mannwhitney_matches_numpy_midranks(spark, sf_dir):
    """q_mannwhitney_u equals an independent numpy midrank computation —
    guards the shared Spark/SQL formula itself, not just engine parity."""
    import numpy as np
    import pandas as pd

    from ubparquet_spark.plans.events import q_mannwhitney_u

    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev = ev[ev.event_type.isin(["click", "purchase"]) & ev.value.notna()]
    v = np.floor(ev.value.to_numpy() * 100 + 0.5).astype("int64")
    is_a = (ev.event_type == "click").to_numpy()
    order = np.argsort(v, kind="stable")
    sv = v[order]
    ranks = np.empty(len(sv), float)
    i = 0
    while i < len(sv):
        j = i
        while j < len(sv) and sv[j] == sv[i]:
            j += 1
        ranks[i:j] = (i + j + 1) / 2.0
        i = j
    r = np.empty(len(v), float)
    r[order] = ranks
    n1 = int(is_a.sum())
    u = float(r[is_a].sum() - n1 * (n1 + 1) / 2)

    row = q_mannwhitney_u(spark, sf_dir).collect()[0]
    assert row.n_click == n1
    assert row.u_stat == u


def test_rfm_quartiles_null_monetary_parity(spark, tmp_path):
    """The ranked()/ntile_col quartiles must place NULL monetary users
    exactly where the NTILE(4) DESC window would (NULLS LAST in both
    Spark and DuckDB) — the sf0.01 corpus has no all-null-value user, so
    this path needs synthetic coverage. Engine-internal comparison: the
    rewired plan vs Spark's own window on a null-bearing events table."""
    import datetime

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ubparquet_spark.plans.events import q_rfm_segments

    rows = []
    base = datetime.datetime(2024, 1, 1)
    for u in range(1, 13):
        # users 4, 8, 12 emit ONLY null-value events -> null monetary
        v = None if u % 4 == 0 else float(u)
        rows.append(
            (u * 10, base + datetime.timedelta(hours=u), u, "click", v, "{}")
        )
    ddl = (
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string"
    )
    d = str(tmp_path / "rfm_nulls")
    spark.createDataFrame(rows, ddl).write.parquet(d + "/events.parquet")

    got = {
        r.user_id: (r.r_quartile, r.f_quartile, r.m_quartile)
        for r in q_rfm_segments(spark, d).collect()
    }
    ev = spark.read.parquet(d + "/events.parquet")
    asof = ev.agg(F.max("ts").alias("asof"))
    per_user = (
        ev.groupBy("user_id")
        .agg(
            F.max("ts").alias("last_ts"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)")).alias(
                "monetary_cents"
            ),
        )
        .crossJoin(F.broadcast(asof))
        .select(
            "user_id",
            F.datediff(F.to_date("asof"), F.to_date("last_ts")).alias(
                "recency_days"
            ),
            "frequency",
            "monetary_cents",
        )
    )
    want = {
        r.user_id: (r.rq, r.fq, r.mq)
        for r in per_user.select(
            "user_id",
            F.ntile(4)
            .over(Window.orderBy(F.asc("recency_days"), F.asc("user_id")))
            .alias("rq"),
            F.ntile(4)
            .over(Window.orderBy(F.desc("frequency"), F.asc("user_id")))
            .alias("fq"),
            F.ntile(4)
            .over(Window.orderBy(F.desc("monetary_cents"), F.asc("user_id")))
            .alias("mq"),
        ).collect()
    }
    assert got == want and len(want) == 12
