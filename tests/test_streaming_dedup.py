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


def test_streaming_ingest_dedup_matches_batch(spark, tmp_path):
    """The foreachBatch ingest-dedup verdicts over a streamed batch equal
    the batch incremental_dedup on the same data (AvailableNow drain)."""
    from pyspark.sql import functions as F

    from ubparquet_spark.functions.incremental import incremental_dedup
    from ubparquet_spark.io import load_table
    from ubparquet_spark.streaming.windows import streaming_ingest_dedup

    from .conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents")
    corpus = docs.filter(F.col("doc_id") % 10 != 7).select("doc_id", "text")
    batch = (
        docs.filter(F.col("doc_id") % 10 == 7)
        .select((F.col("doc_id") + 10_000_000).alias("doc_id"), "text")
    )
    src = str(tmp_path / "arrivals")
    batch.write.parquet(src)

    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    transform = streaming_ingest_dedup(corpus)
    collected = []

    def sink(bdf, bid):
        collected.extend(transform(bdf, bid).collect())

    q = (
        stream.writeStream.foreachBatch(sink)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)

    got = {r["doc_id"]: (r["verdict"], r["n_matches"]) for r in collected}
    want = {
        r["doc_id"]: (r["verdict"], r["n_matches"])
        for r in incremental_dedup(batch, corpus).collect()
    }
    assert got == want and len(got) > 0
