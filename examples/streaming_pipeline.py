"""End-to-end Structured Streaming pipeline demo on this engine.

The streaming extension surface (SURVEY.md §2.8 — the reference is
batch-only, so these semantics are defined from Spark's own model), one
script:
  1. file-source stream over a staged events directory (the multi-file
     arrival upgrade of the reference's re-glob pattern,
     ``/root/reference/larmatch2d/larmatch_dataset.py:246``),
  2. stateless stream-static enrichment with the customer dimension
     (broadcast, no streaming state),
  3. enriched rows -> foreachBatch idempotent Parquet sink (batch-id
     provenance column),
  4. watermarked tumbling window counts per market segment (AvailableNow),
  5. stream-stream click->purchase attribution within 1 hour (watermarked,
     time-bounded join state).

Run: python examples/streaming_pipeline.py [sf_dir] [workdir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F

from ubparquet_spark.io import load_table
from ubparquet_spark.session import get_session
from ubparquet_spark.streaming.windows import (
    click_purchase_stream_join,
    enrich_stream_with_dim,
    read_event_stream,
    run_available_now,
    run_foreach_batch_parquet,
)


def main(sf_dir: str, workdir: str) -> None:
    spark = get_session("streaming-pipeline")

    # 1. stage the events table as a stream source directory
    src = os.path.join(workdir, "events_stream")
    events = load_table(spark, sf_dir, "events")
    events.write.mode("overwrite").parquet(src)
    n_events = events.count()

    # 2. stateless enrichment with a broadcast static dimension
    dim = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    stream = read_event_stream(spark, src)
    enriched = enrich_stream_with_dim(
        stream, dim, stream_key="user_id", dim_key="c_custkey"
    ).select("event_id", "user_id", "event_type", "ts", "value", "c_mktsegment")

    # 3. land enriched rows via the idempotent foreachBatch Parquet sink
    out = os.path.join(workdir, "enriched_out")
    run_foreach_batch_parquet(
        enriched, out, os.path.join(workdir, "ckpt_enrich")
    )
    landed = spark.read.parquet(out)
    assert landed.count() == n_events, "enrichment must preserve every row"
    print(f"enriched sink: {landed.count()} rows, batches="
          f"{landed.select('_batch_id').distinct().count()}")

    # 4. watermarked tumbling counts per market segment
    seg_counts = (
        read_event_stream(spark, src)
        .join(F.broadcast(dim), F.col("user_id") == F.col("c_custkey"), "left")
        .withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"), "c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    run_available_now(
        seg_counts, os.path.join(workdir, "ckpt_win"), "seg_counts"
    )
    n_windows = spark.table("seg_counts").count()
    print(f"windowed agg: {n_windows} (window, segment) groups")

    # 5. stream-stream attribution: purchases matched to prior clicks
    attributed = click_purchase_stream_join(
        read_event_stream(spark, src).filter(F.col("event_type") == "click"),
        read_event_stream(spark, src).filter(F.col("event_type") == "purchase"),
    )
    (
        attributed.writeStream.format("memory")
        .queryName("attribution")
        .outputMode("append")
        .option("checkpointLocation", os.path.join(workdir, "ckpt_join"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    n_pairs = spark.table("attribution").count()
    print(f"attribution: {n_pairs} click->purchase pairs within 1 hour")

    assert n_windows > 0 and n_pairs > 0
    print("pipeline OK")


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    wd = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.getcwd(), "spark-warehouse", "streaming_demo"
    )
    os.makedirs(wd, exist_ok=True)
    main(sf, wd)
