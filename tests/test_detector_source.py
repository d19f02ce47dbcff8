"""Custom Python Data Source: per-file partitions, ragged-tensor rows."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from ubparquet_spark.codec import decode_ndarray
from ubparquet_spark.sources.detector_source import DetectorEventDataSource


def _load(spark, files="fileA,fileB,fileC", epf=3):
    spark.dataSource.register(DetectorEventDataSource)
    return (
        spark.read.format("detector_events")
        .option("files", files)
        .option("events_per_file", str(epf))
        .load()
    )


def test_source_row_count_and_schema(spark):
    df = _load(spark)
    assert df.count() == 9
    assert set(df.columns) == {
        "run", "subrun", "event",
        "spacepoint_t", "spacepoint_t_shape",
        "ssnet_label", "ssnet_label_shape",
    }


def test_source_partitions_by_file(spark):
    df = _load(spark)
    # one subrun per file partition, 3 events each
    per_file = {r.subrun: r.n for r in df.groupBy("subrun").agg(F.count("*").alias("n")).collect()}
    assert per_file == {0: 3, 1: 3, 2: 3}


def test_source_tensors_decode(spark):
    df = _load(spark, files="x", epf=2)
    rows = df.collect()
    for r in rows:
        arr = decode_ndarray(r.spacepoint_t, r.spacepoint_t_shape)
        assert arr.shape[1] == 4
        assert arr.shape[0] == len(r.ssnet_label)
        assert (arr[:, 0] >= 0).all() and (arr[:, 0] < 256.4).all()


def test_streaming_source_delivers_all_files(spark, tmp_path):
    """readStream over the custom source: offsets advance per micro-batch
    until all 'files' are consumed; AvailableNow drains everything."""
    spark.dataSource.register(DetectorEventDataSource)
    stream = (
        spark.readStream.format("detector_events")
        .option("events_per_file", "3")
        .option("files_per_batch", "2")
        .option("max_files", "4")
        .load()
    )
    assert stream.isStreaming
    # Python streaming sources don't support AvailableNow: run micro-batches
    # on a short interval and poll until the source is drained
    import time

    q = (
        stream.writeStream.format("memory")
        .queryName("detector_stream_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            if spark.table("detector_stream_test").count() >= 12:
                break
            time.sleep(1)
    finally:
        q.stop()
    out = spark.table("detector_stream_test")
    assert out.count() == 12  # 4 files x 3 events
    assert out.select("subrun").distinct().count() == 4


def test_source_composes_with_engine_ops(spark):
    """The source feeds the normal operator pipeline (filter + explode)."""
    from ubparquet_spark.operators import voxel

    df = _load(spark)
    pts = voxel.points_view(df, "spacepoint_t", ["run", "subrun", "event"])
    cells = voxel.voxelize(pts, voxel_size=50.0)
    assert cells.count() > 0
    total = cells.agg(F.sum("n_points").alias("s")).collect()[0].s
    assert total == df.select(F.sum(F.element_at("spacepoint_t_shape", 1))).collect()[0][0]
