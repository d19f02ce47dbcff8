"""Streaming windows produce the same results as the batch plans
(Trigger.AvailableNow batch-equivalence)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from ubparquet_spark.io import load_table
from ubparquet_spark.streaming import windows as sw


def _stage_events(spark, sf_dir, tmp_path):
    """Copy events (ts normalized to timestamp) into a stream source dir."""
    src = str(tmp_path / "events_stream")
    load_table(spark, sf_dir, "events").write.mode("overwrite").parquet(src)
    return src


def test_tumbling_stream_matches_batch(spark, sf_dir, tmp_path):
    src = _stage_events(spark, sf_dir, tmp_path)
    stream = sw.read_event_stream(spark, src)
    assert stream.isStreaming
    result = sw.tumbling_counts(stream)
    sw.run_available_now(result, str(tmp_path / "ckpt1"), "tumbling_test")
    got = {
        (r.window_start, r.event_type): (r.n_events, round(r.sum_value, 6))
        for r in spark.table("tumbling_test").collect()
    }
    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    )
    expected = {(r.w.start, r.event_type): (r.n, round(r.s, 6)) for r in batch}
    assert got == expected


def test_watermark_drops_late_rows(spark, tmp_path):
    """Rows arriving behind the watermark are discarded from the aggregate:
    batch 1 advances the watermark far ahead; batch 2 delivers a stale row;
    the stale row's window never appears in the append-mode output."""
    import datetime as dt

    src = str(tmp_path / "late_src")
    ddl = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    t0 = dt.datetime(2024, 6, 1, 0, 0, 0)
    fresh = [
        (1, t0, 1, "click", 1.0, "{}"),
        (2, t0 + dt.timedelta(hours=10), 1, "click", 1.0, "{}"),  # watermark -> ~08:00
    ]
    spark.createDataFrame(fresh, ddl).write.mode("overwrite").parquet(src)

    out_dir = str(tmp_path / "late_out")
    ck = str(tmp_path / "ckpt_late")

    def run_once():
        (
            sw.tumbling_counts(
                sw.read_event_stream(spark, src), window="1 hour", watermark="2 hours"
            )
            .writeStream.format("parquet")
            .option("path", out_dir)
            .outputMode("append")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )

    run_once()
    # batch 2: one stale row at t0+1h — far behind the 08:00 watermark
    late = [(3, t0 + dt.timedelta(hours=1), 1, "click", 99.0, "{}")]
    spark.createDataFrame(late, ddl).write.mode("append").parquet(src)
    run_once()

    out = spark.read.parquet(out_dir).collect()
    windows = {r.window_start.hour for r in out}
    # the 01:00 window of the stale row must NOT have been emitted
    assert 1 not in windows
    # the watermark-closed 00:00 window WAS emitted, unpolluted
    w0 = [r for r in out if r.window_start.hour == 0]
    assert len(w0) == 1 and w0[0].n_events == 1


def test_foreach_batch_parquet_sink(spark, sf_dir, tmp_path):
    src = _stage_events(spark, sf_dir, tmp_path)
    stream = sw.read_event_stream(spark, src).select("event_id", "event_type")
    out_dir = str(tmp_path / "sink_out")
    sw.run_foreach_batch_parquet(stream, out_dir, str(tmp_path / "ckpt_fb"))
    written = spark.read.parquet(out_dir)
    n_src = spark.read.parquet(src).count()
    assert written.count() == n_src
    assert "_batch_id" in written.columns


def test_session_stream_matches_batch(spark, sf_dir, tmp_path):
    src = _stage_events(spark, sf_dir, tmp_path)
    stream = sw.read_event_stream(spark, src).filter(F.col("user_id") < 20)
    result = sw.session_aggregate(stream)
    sw.run_available_now(result, str(tmp_path / "ckpt2"), "session_test")
    got = {
        (r.user_id, r.session_start, r.session_end): r.n_events
        for r in spark.table("session_test").collect()
    }
    batch = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") < 20)
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    expected = {(r.user_id, r.w.start, r.w.end): r.n for r in batch}
    assert got == expected
    assert len(got) > 0


def test_stream_stream_join_matches_batch(spark, sf_dir, tmp_path):
    """Inner stream-stream join (watermarked, time-bounded) emits exactly the
    pairs the equivalent batch join produces."""
    src = _stage_events(spark, sf_dir, tmp_path)
    stream = sw.read_event_stream(spark, src)
    joined = sw.click_purchase_stream_join(
        stream.filter(F.col("event_type") == "click"),
        stream.filter(F.col("event_type") == "purchase"),
    )
    # inner stream-stream joins emit in append mode (complete unsupported)
    (
        joined.writeStream.format("memory")
        .queryName("ss_join_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_ss"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    got = {
        (r.user_id, r.click_id, r.purchase_id)
        for r in spark.table("ss_join_test").collect()
    }

    ev = load_table(spark, sf_dir, "events")
    c = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    expected = {
        (r.user_id, r.click_id, r.purchase_id)
        for r in c.join(
            p,
            F.expr(
                "user_id = p_user_id AND purchase_ts > click_ts"
                " AND purchase_ts <= click_ts + INTERVAL 1 hour"
            ),
        ).collect()
    }
    assert len(expected) > 0
    assert got == expected


def test_stream_static_enrichment(spark, sf_dir, tmp_path):
    """Stream-static broadcast join enriches every row; result equals the
    batch join (stateless, so append mode needs no watermark)."""
    src = _stage_events(spark, sf_dir, tmp_path)
    dim = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    enriched = sw.enrich_stream_with_dim(
        sw.read_event_stream(spark, src).select("event_id", "user_id"),
        dim, stream_key="user_id", dim_key="c_custkey",
    ).select("event_id", "user_id", "c_mktsegment")
    (
        enriched.writeStream.format("memory")
        .queryName("enrich_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_enrich"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    got = {
        (r.event_id, r.user_id, r.c_mktsegment)
        for r in spark.table("enrich_test").collect()
    }
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    expected = {
        (r.event_id, r.user_id, r.c_mktsegment)
        for r in ev.join(
            dim, ev.user_id == dim.c_custkey, "left"
        ).collect()
    }
    assert len(got) == ev.count()
    assert got == expected


def test_stream_stream_left_outer_emits_unmatched(spark, tmp_path):
    """Left-outer stream-stream join: a click with no purchase in its match
    horizon is emitted with null purchase columns — but only after the
    watermark passes the horizon (forced here by a second batch far ahead)."""
    import datetime as dt

    src = str(tmp_path / "so_src")
    ddl = (
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string"
    )
    t0 = dt.datetime(2024, 6, 1, 0, 0, 0)
    first = [
        (1, t0, 1, "click", 1.0, "{}"),  # converts 30 min later
        (2, t0 + dt.timedelta(minutes=30), 1, "purchase", 5.0, "{}"),
        (3, t0, 2, "click", 1.0, "{}"),  # never converts
    ]
    spark.createDataFrame(first, ddl).write.mode("overwrite").parquet(src)

    out = str(tmp_path / "so_out")
    ck = str(tmp_path / "so_ckpt")

    def run_once():
        joined = sw.click_purchase_stream_join(
            sw.read_event_stream(spark, src).filter(F.col("event_type") == "click"),
            sw.read_event_stream(spark, src).filter(F.col("event_type") == "purchase"),
            how="left_outer",
        )
        (
            joined.writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )

    run_once()
    # push the watermark far past click 3's match horizon (1h gap + 2h
    # delay). The join watermark is the MIN across both inputs, so the
    # future batch must advance clicks AND purchases.
    future = [
        (9, t0 + dt.timedelta(hours=100), 3, "click", 1.0, "{}"),
        (10, t0 + dt.timedelta(hours=100), 99, "purchase", 1.0, "{}"),
    ]
    spark.createDataFrame(future, ddl).write.mode("append").parquet(src)
    run_once()
    run_once()  # one more cycle so the post-watermark eviction batch runs

    rows = {(r.click_id, r.purchase_id) for r in spark.read.parquet(out).collect()}
    assert (1, 2) in rows        # matched pair emitted
    assert (3, None) in rows     # expired unmatched click emitted with nulls
    assert (9, None) not in rows  # horizon not yet passed for the new click


def test_available_now_resume_is_exactly_once(spark, sf_dir, tmp_path):
    """Stop -> new files arrive -> restart from the SAME checkpoint: the
    second run must process only the new files, and every event lands in
    the sink exactly once. This is the incremental-ingestion contract a
    100 TB lake job leans on: re-running the query is safe, re-delivery
    is impossible, and progress survives restarts."""
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    src = str(tmp_path / "resume_src")
    sink = str(tmp_path / "resume_sink")
    ck = str(tmp_path / "resume_ck")
    first = events.filter(F.col("event_id") % 2 == 0)
    second = events.filter(F.col("event_id") % 2 == 1)
    first.write.mode("append").parquet(src)

    def run_once():
        (
            spark.readStream.schema(events.schema)
            .parquet(src)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )

    run_once()
    assert spark.read.parquet(sink).count() == first.count()

    second.write.mode("append").parquet(src)
    run_once()
    out = spark.read.parquet(sink)
    assert out.count() == events.count()
    # exactly once: no event_id delivered twice across the two runs
    assert out.groupBy("event_id").count().filter(F.col("count") > 1).count() == 0
