"""Streaming dedup with watermark-bounded state."""

from __future__ import annotations

from pyspark.sql import functions as F

from ubparquet_spark.io import load_table
from ubparquet_spark.streaming import windows as sw


def test_dedup_stream_drops_duplicates(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").limit(200)
    src = str(tmp_path / "dup_stream")
    # stage each event twice -> stream must emit each key once
    ev.unionByName(ev).write.mode("overwrite").parquet(src)
    stream = sw.read_event_stream(spark, src)
    deduped = sw.dedup_stream(stream, ["event_id"])
    (
        deduped.writeStream.format("memory")
        .queryName("dedup_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    out = spark.table("dedup_test")
    assert out.count() == 200
    assert out.select("event_id").distinct().count() == 200
