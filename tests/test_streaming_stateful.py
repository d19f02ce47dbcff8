"""applyInPandasWithState operator: running totals equal batch ground truth."""

from __future__ import annotations

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
