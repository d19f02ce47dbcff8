"""applyInPandasWithState operator: running totals equal batch ground truth."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from ubparquet_spark.io import load_table
from ubparquet_spark.streaming import windows as sw
from ubparquet_spark.streaming.stateful import running_user_stats


def test_running_user_stats_matches_batch(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 30)
    src = str(tmp_path / "stateful_src")
    ev.write.mode("overwrite").parquet(src)

    stream = sw.read_event_stream(spark, src).filter(F.col("user_id") < 30)
    out = running_user_stats(stream)
    (
        out.writeStream.format("memory")
        .queryName("stateful_test")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    # last update per user = final running totals
    got_df = spark.table("stateful_test")
    got = {
        r.user_id: (r.n_events, round(r.sum_value, 2), r.max_value)
        for r in got_df.collect()
    }
    batch = {
        r.user_id: (r.n, round(r.s, 2), r.m)
        for r in ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(F.expr("CAST(floor(value*100+0.5) AS BIGINT)")) / 100.0).alias("s"),
            F.max("value").alias("m"),
        )
        .collect()
    }
    assert got == batch
    assert len(got) > 0


def test_running_twap_matches_batch(spark, sf_dir, tmp_path):
    """Streaming TWAP (applyInPandasWithState, exact-integer LOCF
    integral) converges to the batch q_twap values once the stream
    drains — including across multiple time-ordered micro-batch files."""
    from ubparquet_spark.plans.events import q_twap
    from ubparquet_spark.streaming.stateful import running_twap

    ev = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "twap_src")
    # two time-ordered files -> at least two micro-batch candidates under
    # maxFilesPerTrigger, exercising cross-batch LOCF state
    cut = "2024-01-15"
    ev.filter(F.col("ts") < cut).coalesce(1).write.parquet(src)
    ev.filter(F.col("ts") >= cut).coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(ev.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    out = running_twap(stream)
    (
        out.writeStream.format("memory")
        .queryName("twap_test")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "twap_ckpt"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    # memory sink in update mode appends one row per (batch, key): the
    # final row per key is the drained running value
    hist = spark.table("twap_test").toPandas()
    finals = hist.groupby("event_type").tail(1).set_index("event_type")
    batch = {
        r["event_type"]: r for r in q_twap(spark, sf_dir).collect()
    }
    assert set(finals.index) == set(batch)
    for et, row in finals.iterrows():
        b = batch[et]
        assert row["n_segments"] == b["n_segments"], et
        assert abs(row["span_s"] - b["span_s"]) < 1e-9, et
        # batch twap is roundn(…, 6) of the same exact rational; streaming
        # emits it unrounded, so they agree within the rounding grain
        assert abs(row["twap"] - b["twap"]) < 1e-6, et


def test_running_twap_edge_semantics(spark, tmp_path):
    """Review-hardened semantics: a single-event key emits nothing (no
    fabricated 0.0); an equal-timestamp row in a LATER batch only replaces
    the carry when its event_id is higher; a late row is skipped, not
    integrated negatively."""
    from ubparquet_spark.streaming.stateful import running_twap

    ddl = "event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string"
    base = "2024-01-01 00:00:"
    batch1 = [
        # 'solo': single event -> must never emit
        (1, f"{base}00", 1, "solo", 10.0, "{}"),
        # 'tie': two rows; batch 2 adds an equal-ts row with LOWER event_id
        (9, f"{base}10", 1, "tie", 2.0, "{}"),
        (10, f"{base}20", 1, "tie", 4.0, "{}"),  # carry = (t20, id10, 4.0)
    ]
    batch2 = [
        # equal ts, lower id: must NOT replace the carried 4.0
        (5, f"{base}20", 1, "tie", 100.0, "{}"),
        # late row (before the carry): must be skipped entirely
        (11, f"{base}15", 1, "tie", 500.0, "{}"),
        # advances time by 10s: integral += 4.0 * 10s
        (12, f"{base}30", 1, "tie", 7.0, "{}"),
    ]
    src = str(tmp_path / "twap_edge_src")
    for i, rows in enumerate((batch1, batch2)):
        spark.createDataFrame(
            [(e, __import__("datetime").datetime.fromisoformat(t), u, k, v, p)
             for e, t, u, k, v, p in rows],
            ddl,
        ).coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(ddl).option("maxFilesPerTrigger", 1).parquet(src)
    (
        running_twap(stream)
        .writeStream.format("memory")
        .queryName("twap_edge")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "twap_edge_ckpt"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    hist = spark.table("twap_edge").toPandas()
    assert "solo" not in set(hist["event_type"])
    final = hist[hist["event_type"] == "tie"].iloc[-1]
    # segments: t10->t20 (2.0 for 10s) and t20->t30 (4.0 for 10s, NOT
    # 100.0 — the tie keeps the higher event_id's value; NOT 500.0 — the
    # late row is skipped)
    assert final["n_segments"] == 2
    assert abs(final["span_s"] - 20.0) < 1e-9
    assert abs(final["twap"] - (2.0 * 10 + 4.0 * 10) / 20) < 1e-9


def test_twap_mass_ties_batch_stream_oracle_agree(spark, tmp_path):
    """Round-8 alignment pinned: a SEGMENT is a positive-duration LOCF
    interval, in all three engines. An event type whose every
    observation shares one timestamp (the ninth sweep's skew corpus
    does this to whole types) emits NOTHING — not a zero-span row, not
    an ANSI divide-by-zero; interleaved ties carry the highest
    event_id's value forward without counting a segment. Batch q_twap,
    streaming running_twap, and the DuckDB oracle must agree exactly on
    such data."""
    import datetime

    import duckdb

    from ubparquet_spark.plans.events import Q_TWAP_SQL, q_twap
    from ubparquet_spark.streaming.stateful import running_twap

    ddl = (
        "event_id long, ts timestamp_ntz, user_id long,"
        " event_type string, value double, props string"
    )
    t0 = datetime.datetime(2024, 1, 1)
    s = lambda sec: t0 + datetime.timedelta(seconds=sec)
    rows = [
        # 'alltied': three values, one instant -> zero observable span
        (1, s(0), 1, "alltied", 1.0, "{}"),
        (2, s(0), 1, "alltied", 2.0, "{}"),
        (3, s(0), 1, "alltied", 3.0, "{}"),
        # 'mix': ties at t0 and t10; the tie carries the HIGHEST
        # event_id's value (3.00 then 7.00) into each real segment
        (11, s(0), 1, "mix", 1.0, "{}"),
        (12, s(0), 1, "mix", 3.0, "{}"),
        (13, s(10), 1, "mix", 5.0, "{}"),
        (14, s(10), 1, "mix", 7.0, "{}"),
        (15, s(30), 1, "mix", 9.0, "{}"),
    ]
    src = str(tmp_path / "twap_ties")
    spark.createDataFrame(rows, ddl).coalesce(1).write.parquet(
        f"{src}/events.parquet"
    )

    expect = {"mix": (2, 30.0, round((300 * 10 + 700 * 20) / 30 / 100, 6))}

    batch = {
        r["event_type"]: (
            r["n_segments"], r["span_s"], round(r["twap"], 6)
        )
        for r in q_twap(spark, src).collect()
    }
    assert batch == expect

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW events AS"
        f" SELECT * FROM '{src}/events.parquet/*.parquet'"
    )
    oracle = {
        et: (n, sp, round(tw, 6))
        for et, n, sp, tw in con.sql(Q_TWAP_SQL).fetchall()
    }
    assert oracle == expect

    stream = spark.readStream.schema(ddl).parquet(f"{src}/events.parquet")
    (
        running_twap(stream)
        .writeStream.format("memory")
        .queryName("twap_ties")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "twap_ties_ckpt"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    hist = spark.table("twap_ties").toPandas()
    assert "alltied" not in set(hist["event_type"])
    finals = hist.groupby("event_type").tail(1)
    stream_got = {
        r["event_type"]: (
            int(r["n_segments"]), r["span_s"], round(r["twap"], 6)
        )
        for _, r in finals.iterrows()
    }
    assert stream_got == expect


def test_running_transitions_matches_batch(spark, sf_dir, tmp_path):
    """Summing the per-batch transition increments over the drained
    stream reproduces the batch q_event_transitions counts exactly,
    including transitions that bridge a micro-batch boundary through
    per-user state."""
    from ubparquet_spark.plans.events import q_event_transitions
    from ubparquet_spark.streaming.stateful import running_transitions

    ev = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "trans_src")
    cut = "2024-01-15"
    ev.filter(F.col("ts") < cut).coalesce(1).write.parquet(src)
    ev.filter(F.col("ts") >= cut).coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(ev.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    (
        running_transitions(stream)
        .writeStream.format("memory")
        .queryName("trans_test")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "trans_ckpt"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    hist = spark.table("trans_test").toPandas()
    got = (
        hist.groupby(["prev_type", "next_type"])["n"].sum().to_dict()
    )
    batch = {
        (r.prev_type, r.next_type): r.n
        for r in q_event_transitions(spark, sf_dir).collect()
    }
    assert got == batch and len(batch) > 0


def test_running_source_mix_matches_batch(spark, sf_dir, tmp_path):
    """The last emission per source over the drained stream equals the
    batch q_mixture_weights per-source counters exactly, including
    counters accumulated across micro-batch boundaries through state."""
    from ubparquet_spark.plans.text import q_mixture_weights
    from ubparquet_spark.streaming.stateful import running_source_mix

    docs = load_table(spark, sf_dir, "documents")
    src = str(tmp_path / "mix_src")
    half = docs.agg(F.expr("percentile(doc_id, 0.5)")).collect()[0][0]
    docs.filter(F.col("doc_id") <= half).coalesce(1).write.parquet(src)
    docs.filter(F.col("doc_id") > half).coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(docs.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    (
        running_source_mix(stream)
        .writeStream.format("memory")
        .queryName("mix_test")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "mix_ckpt"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    hist = spark.table("mix_test").toPandas()
    # counters are monotone: the final state per source is the max
    got = {
        s: (int(g["n_docs"].max()), int(g["n_tokens"].max()))
        for s, g in hist.groupby("source")
    }
    batch = {
        r.source: (r.n_docs, r.n_tokens)
        for r in q_mixture_weights(spark, sf_dir).collect()
    }
    assert got == batch and len(batch) > 1


def test_running_state_history_matches_batch(spark, sf_dir, tmp_path):
    """The last emission per (user, run_id) over a drained, time-ordered
    stream equals the batch q_user_state_history run table exactly —
    including runs that span a micro-batch boundary through per-user
    state (longer run_len, deferred close)."""
    from ubparquet_spark.plans.events import q_user_state_history
    from ubparquet_spark.streaming.stateful import running_state_history

    ev = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "scd_src")
    cut = "2024-01-15"
    ev.filter(F.col("ts") < cut).coalesce(1).write.parquet(src)
    ev.filter(F.col("ts") >= cut).coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(ev.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    (
        running_state_history(stream)
        .writeStream.format("memory")
        .queryName("scd_test")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "scd_ckpt"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    hist = spark.table("scd_test").toPandas()
    # update mode: keep the LAST emission per (user, run_id)
    final = hist.groupby(["user_id", "run_id"], as_index=False).last()
    got = {
        (
            int(r.user_id),
            r.state,
            int(r.from_us),
            None if pd.isna(r.to_us) else int(r.to_us),
            int(r.run_len),
            bool(r.is_current),
        )
        for r in final.itertuples()
    }
    epoch = pd.Timestamp("1970-01-01")
    batch = {
        (
            r.user_id,
            r.event_type,
            int((pd.Timestamp(r.valid_from) - epoch).value // 1000),
            None
            if r.valid_to is None
            else int((pd.Timestamp(r.valid_to) - epoch).value // 1000),
            r.run_len,
            bool(r.is_current),
        )
        for r in q_user_state_history(spark, sf_dir).collect()
    }
    assert got == batch and len(batch) > 0


# ---------------------------------------------------------------------------
# Adversarial micro-batch ORDER stress (VERDICT r05 #4): the stateful
# twins document an in-order-files contract — a row at or before the
# state's cursor is counted late and SKIPPED, never reordered. The tests
# above feed time-ordered files; these feed files out of order
# (latest-first, then earliest, then interleaved) and assert (a) the
# documented greedy skip semantics hold exactly (independent Python
# replay of the contract), and (b) the emitted counters still reconcile
# with a BATCH run over the accepted in-order subset.
# ---------------------------------------------------------------------------

_ADV_DDL = (
    "event_id long, ts timestamp_ntz, user_id long, event_type string,"
    " value double, props string"
)


def _adv_files():
    """Three micro-batch files in adversarial time order.

    Single user, single event_type; (event_id, second, value) triples.
    File 1 holds the LATEST window, file 2 the EARLIEST (entirely late
    once file 1 is in state), file 3 interleaves stale and fresh rows."""
    f1 = [(20, 60, 4.0), (21, 70, 6.0), (22, 80, 2.0)]
    f2 = [(10, 10, 9.0), (11, 20, 9.5), (12, 30, 9.9)]  # all late
    f3 = [(30, 75, 7.7), (31, 90, 8.0), (32, 85, 1.0), (33, 100, 3.0)]
    return [f1, f2, f3]


def _adv_accepted():
    """Greedy in-order subset under the documented contract: within a
    batch rows sort by (us, event_id); a row with (us, eid) <= cursor is
    skipped. Computed by hand here, independent of the implementation."""
    cursor, accepted = None, []
    for rows in _adv_files():
        for e, s, v in sorted(rows, key=lambda r: (r[1], r[0])):
            if cursor is not None and (s, e) < cursor:
                continue
            accepted.append((e, s, v))
            cursor = (s, e)
    return accepted


def _write_adv_src(spark, tmp_path, name):
    import datetime
    import time

    src = str(tmp_path / name)
    for rows in _adv_files():
        spark.createDataFrame(
            [
                (
                    e,
                    datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=s),
                    1,
                    "adv",
                    v,
                    "{}",
                )
                for e, s, v in rows
            ],
            _ADV_DDL,
        ).coalesce(1).write.mode("append").parquet(src)
        time.sleep(1.05)  # distinct mtimes pin FileStreamSource batch order
    return src


def _drain(spark, df, tmp_path, qname):
    (
        df.writeStream.format("memory")
        .queryName(qname)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / f"{qname}_ckpt"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    return spark.table(qname).toPandas()


def test_adversarial_order_twap(spark, tmp_path):
    from ubparquet_spark.streaming.stateful import running_twap

    src = _write_adv_src(spark, tmp_path, "adv_twap_src")
    stream = spark.readStream.schema(_ADV_DDL).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    hist = _drain(spark, running_twap(stream), tmp_path, "adv_twap")
    final = hist[hist["event_type"] == "adv"].iloc[-1]

    # independent replay of the LOCF integral over the accepted subset
    acc = _adv_accepted()
    ws = dur = nseg = 0
    for (pe, ps, pv), (e, s, v) in zip(acc, acc[1:]):
        if s == ps:
            continue  # zero-duration tie collapses (none in this data)
        ws += int(pv * 100 + 0.5) * (s - ps) * 1_000_000
        dur += (s - ps) * 1_000_000
        nseg += 1
    assert final["n_segments"] == nseg
    assert abs(final["span_s"] - dur / 1e6) < 1e-9
    assert abs(final["twap"] - ws / dur / 100.0) < 1e-9
    # reconciliation: the accepted subset is exactly what a batch TWAP
    # over in-order data would integrate — late rows contributed nothing.
    # Note eid 30 (t=75): late WITHIN file 3 once the cursor sits at t=80
    assert [e for e, _, _ in acc] == [20, 21, 22, 32, 31, 33]


def test_adversarial_order_transitions_and_history(spark, tmp_path):
    """Transitions + SCD2 twins under shuffled files: stream emissions
    equal the batch twins run over the accepted in-order subset."""
    import datetime

    from ubparquet_spark.operators.scd import collapse_runs
    from ubparquet_spark.streaming.stateful import (
        running_state_history,
        running_transitions,
    )

    # reuse the adversarial (us, eid) skeleton but alternate event types
    # so runs/transitions are non-trivial
    types = {20: "a", 21: "a", 22: "b", 10: "a", 11: "b", 12: "a",
             30: "b", 31: "c", 32: "a", 33: "c"}
    import time

    src = str(tmp_path / "adv_th_src")
    for rows in _adv_files():
        spark.createDataFrame(
            [
                (
                    e,
                    datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=s),
                    1,
                    types[e],
                    v,
                    "{}",
                )
                for e, s, v in rows
            ],
            _ADV_DDL,
        ).coalesce(1).write.mode("append").parquet(src)
        time.sleep(1.05)

    stream1 = spark.readStream.schema(_ADV_DDL).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    trans = _drain(spark, running_transitions(stream1), tmp_path, "adv_trans")
    stream2 = spark.readStream.schema(_ADV_DDL).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    scd = _drain(
        spark, running_state_history(stream2), tmp_path, "adv_scd"
    )

    acc = _adv_accepted()  # [20, 21, 22, 32, 31, 33]
    seq = [types[e] for e, _, _ in acc]  # a a b a c c

    # transitions: sum of increments == pair counts over the accepted seq
    want_pairs: dict[tuple, int] = {}
    for p, n in zip(seq, seq[1:]):
        want_pairs[(p, n)] = want_pairs.get((p, n), 0) + 1
    got_pairs = (
        trans.groupby(["prev_type", "next_type"])["n"].sum().to_dict()
    )
    assert got_pairs == want_pairs

    # SCD2: last emission per run_id == batch collapse_runs over the
    # accepted subset (the documented reconciliation)
    acc_df = spark.createDataFrame(
        [
            (
                e,
                datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=s),
                1,
                types[e],
            )
            for e, s, v in acc
        ],
        "event_id long, ts timestamp_ntz, user_id long, event_type string",
    ).withColumn(
        "us",
        F.expr(
            "timestampdiff(MICROSECOND,"
            " to_timestamp_ntz('1970-01-01 00:00:00'), ts)"
        ),
    )
    batch = {
        (r.event_type, r.valid_from, r.valid_to, r.run_len, r.is_current)
        for r in collapse_runs(
            acc_df, ["user_id"], ["us", "event_id"], "event_type",
        )
        .select("event_type", "valid_from", "valid_to", "run_len", "is_current")
        .collect()
    }
    final = scd.groupby(["user_id", "run_id"], as_index=False).last()
    got = {
        (
            r.state,
            int(r.from_us),
            None if pd.isna(r.to_us) else int(r.to_us),
            int(r.run_len),
            bool(r.is_current),
        )
        for r in final.itertuples()
    }
    assert got == batch and len(batch) == 4


def test_running_ewma_daily_matches_batch(spark, sf_dir, tmp_path):
    """Streaming daily EWMA (round 9): the closed-day rows emitted by the
    drained stream must be BIT-equal to the batch q_ewma_daily rows for
    every day except each type's still-open final day — both sides round
    the recursion to 6 decimals at every step, so the sequential double
    chain is identical across the batch fold, the recursive-CTE oracle,
    and the per-batch stateful scan (including across the micro-batch
    boundary, where the EWMA carry lives in state)."""
    from ubparquet_spark.plans.events import q_ewma_daily
    from ubparquet_spark.streaming.stateful import running_ewma_daily

    ev = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "ewma_src")
    cut = "2024-01-15"
    ev.filter(F.col("ts") < cut).coalesce(1).write.parquet(src)
    ev.filter(F.col("ts") >= cut).coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(ev.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    (
        running_ewma_daily(stream)
        .writeStream.format("memory")
        .queryName("ewma_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ewma_ckpt"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    got = {
        (r["event_type"], r["day"]): (r["rev"], r["ewma"])
        for r in spark.table("ewma_test").collect()
    }
    batch = q_ewma_daily(spark, sf_dir).collect()
    # drop each type's final (still-open) day from the batch expectation
    last_day = {}
    for r in batch:
        if r["event_type"] not in last_day or r["day"] > last_day[r["event_type"]]:
            last_day[r["event_type"]] = r["day"]
    expected = {
        (r["event_type"], r["day"]): (r["rev"], r["ewma"])
        for r in batch
        if r["day"] != last_day[r["event_type"]]
    }
    assert got == expected  # bit-equal, including the EWMA doubles


def test_running_ewma_edge_semantics(spark, tmp_path):
    """A single-day key emits nothing (the day never closes); a row from
    an already-closed day is counted late and skipped (no retro-edit of
    an emitted EWMA); an all-NULL-value day still exists with rev 0."""
    from ubparquet_spark.streaming.stateful import running_ewma_daily

    ddl = (
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string"
    )
    from datetime import datetime

    t = datetime.fromisoformat
    batch1 = [
        (1, t("2024-01-01 10:00:00"), 1, "solo", 10.0, "{}"),
        (2, t("2024-01-01 10:00:00"), 1, "multi", 4.0, "{}"),
        (3, t("2024-01-02 10:00:00"), 1, "multi", None, "{}"),  # null-value day
    ]
    batch2 = [
        (4, t("2024-01-03 10:00:00"), 1, "multi", 8.0, "{}"),
        (5, t("2024-01-01 23:00:00"), 1, "multi", 100.0, "{}"),  # late: closed
    ]
    src = str(tmp_path / "src")
    spark.createDataFrame(batch1, ddl).coalesce(1).write.parquet(src)
    spark.createDataFrame(batch2, ddl).coalesce(1).write.mode("append").parquet(
        src
    )
    stream = spark.readStream.schema(ddl).option("maxFilesPerTrigger", 1).parquet(
        src
    )
    (
        running_ewma_daily(stream)
        .writeStream.format("memory")
        .queryName("ewma_edge")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    rows = {
        (r["event_type"], str(r["day"])): (r["rev"], r["ewma"])
        for r in spark.table("ewma_edge").collect()
    }
    # solo never closes a day -> no output; multi closes Jan 1 (rev 4.0,
    # seed ewma 4.0) and Jan 2 (all-NULL day -> rev 0.0,
    # ewma = 0.25*0 + 0.75*4 = 3.0); Jan 3 stays open; the late Jan 1 row
    # is skipped, NOT added to any day
    assert rows == {
        ("multi", "2024-01-01 00:00:00"): (4.0, 4.0),
        ("multi", "2024-01-02 00:00:00"): (0.0, 3.0),
    }

def test_ewma_drain_flush_completes_batch_parity(spark, sf_dir, tmp_path):
    """Round-10 (VERDICT r09 #5): a drained AvailableNow run + the
    ewma_drain_flush composition must equal batch q_ewma_daily on the
    COMPLETE day set — including each type's final (open) day — while
    the stateful operator's emit-on-close default stays unchanged."""
    from ubparquet_spark.plans.events import q_ewma_daily
    from ubparquet_spark.streaming.stateful import (
        ewma_drain_flush,
        running_ewma_daily,
    )

    ev = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "ewmaf_src")
    cut = "2024-01-15"
    ev.filter(F.col("ts") < cut).coalesce(1).write.parquet(src)
    ev.filter(F.col("ts") >= cut).coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(ev.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    (
        running_ewma_daily(stream)
        .writeStream.format("memory")
        .queryName("ewmaf_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ewmaf_ckpt"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    closed = spark.table("ewmaf_test")
    full = ewma_drain_flush(closed, spark.read.parquet(src))
    got = {
        (r["event_type"], r["day"]): (r["rev"], r["ewma"])
        for r in full.collect()
    }
    expected = {
        (r["event_type"], r["day"]): (r["rev"], r["ewma"])
        for r in q_ewma_daily(spark, sf_dir).collect()
    }
    assert got == expected  # bit-equal on the FULL day set


def test_ewma_drain_flush_single_day_type(spark, tmp_path):
    """A type whose whole history is one (never-closed) day flushes with
    ewma = rev — the batch first-day rule — even though the drained
    stream emitted nothing for it."""
    from datetime import datetime

    from ubparquet_spark.streaming.stateful import (
        EWMA_OUTPUT_SCHEMA,
        ewma_drain_flush,
    )

    t = datetime.fromisoformat
    ddl = (
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string"
    )
    source = spark.createDataFrame(
        [
            (1, t("2024-01-01 10:00:00"), 1, "solo", 10.0, "{}"),
            (2, t("2024-01-01 11:00:00"), 1, "solo", 2.5, "{}"),
        ],
        ddl,
    )
    closed = spark.createDataFrame([], EWMA_OUTPUT_SCHEMA)
    rows = ewma_drain_flush(closed, source).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["event_type"] == "solo" and r["rev"] == 12.5 and r["ewma"] == 12.5
