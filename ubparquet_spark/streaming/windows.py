"""Event-time streaming windows with watermarks.

The reference is batch-only (SURVEY.md §2.8); this module defines the
engine's streaming semantics on the driver's ``events`` surface so that the
same window specs produce identical results in batch
(``ubparquet_spark.plans.events``) and streaming (``Trigger.AvailableNow``)
— the batch result is the ground truth the streaming test asserts against.

Scale notes: watermarks bound state (late rows beyond the horizon are
dropped); windowed aggregations are partial-aggregatable; session windows
keep per-key state in the state store and merge on gap overlap. For
continuous ingestion, ``readStream`` over a directory of Parquet files is
the multi-file-arrival upgrade of the reference's re-glob pattern
(``larmatch2d/larmatch_dataset.py:246``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import DataStreamWriter


def read_event_stream(
    spark: SparkSession,
    path: str,
    schema_ddl: str = (
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string"
    ),
) -> DataFrame:
    """File-source stream: picks up new Parquet files as they land."""
    return spark.readStream.schema(schema_ddl).parquet(path)


def tumbling_counts(
    stream: DataFrame,
    *,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Tumbling window count+sum with a late-data watermark."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def session_aggregate(
    stream: DataFrame,
    *,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Session windows per key with gap semantics (state-store merged)."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("w"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            key_col,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def dedup_stream(
    stream: DataFrame,
    keys: list[str],
    *,
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming exact-dedup: drop duplicate ``keys`` tuples, keeping state
    only within the watermark horizon — the unbounded-state-safe streaming
    version of the batch dedup audit (A1). Uses Spark's
    ``dropDuplicatesWithinWatermark`` so old keys age out of the state
    store instead of accumulating forever (the 100 TB requirement for any
    continuous dedup)."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


def run_foreach_batch_parquet(
    result: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
) -> None:
    """foreachBatch sink pattern: each micro-batch lands as Parquet with the
    batch id as a provenance column — the idempotent-append production sink
    (exactly-once per batch id under checkpointing)."""
    from pyspark.sql import functions as F

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("_batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(out_dir)
        )

    (
        result.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def run_available_now(
    result: DataFrame, checkpoint_dir: str, query_name: str
) -> None:
    """Run a streaming query to completion over all currently-available
    input (batch-equivalent execution) into an in-memory sink table named
    ``query_name``."""
    q: DataStreamWriter = (
        result.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )
    sq = q.start()
    sq.awaitTermination()


def click_purchase_stream_join(
    clicks: DataFrame,
    purchases: DataFrame,
    *,
    max_gap: str = "1 hour",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream join: each purchase paired with every click by the
    same user in the preceding ``max_gap``.

    ``how="left_outer"`` additionally emits unconverted clicks (null
    purchase columns) — but only once the watermark passes the click's match
    horizon, since until then a matching purchase could still arrive. Outer
    results therefore trail the inner ones by the watermark delay.

    Both inputs carry watermarks and the join condition bounds event time on
    BOTH sides, so Spark can evict join state: a buffered click is dropped
    once the purchase-side watermark passes ``click_ts + max_gap``. Without
    the time bound the state store would grow forever — the condition is
    load-bearing at scale, not an optimization. State is partitioned by the
    equi-key (``user_id``), so throughput scales with executors."""
    c = clicks.withWatermark("ts", watermark).select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    p = purchases.withWatermark("ts", watermark).select(
        F.col("user_id").alias("p_user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    cond = F.expr(
        "user_id = p_user_id AND purchase_ts > click_ts"
        f" AND purchase_ts <= click_ts + INTERVAL {max_gap}"
    )
    return c.join(p, cond, how).select(
        "user_id", "click_id", "purchase_id", "click_ts", "purchase_ts",
        "purchase_value",
    )


def enrich_stream_with_dim(
    stream: DataFrame,
    dim: DataFrame,
    *,
    stream_key: str,
    dim_key: str,
    how: str = "left",
) -> DataFrame:
    """Stream-static join: enrich a stream with a (small) static dimension.

    The static side is broadcast, so enrichment is stateless map-side work —
    no streaming state at all, unlike a stream-stream join. The static
    DataFrame is re-evaluated per micro-batch, so a dimension backed by a
    table picks up slowly-changing updates between batches."""
    return stream.join(
        F.broadcast(dim), stream[stream_key] == dim[dim_key], how
    )


def streaming_ingest_dedup(
    corpus,
    *,
    jaccard_threshold: float = 0.5,
    bucket_cap: int = 10_000,
):
    """Continuous-ingest dedup: every arriving micro-batch of documents is
    deduplicated against the corpus via
    ``functions.incremental.incremental_dedup`` (exact_dup / near_dup /
    new verdicts), as a ``foreachBatch`` transform factory.

    Returns a ``(batch_df, batch_id) -> DataFrame`` callable for
    ``foreachBatch`` — the incremental pipeline needs a bounded candidate
    checkpoint and multi-stage joins per batch, which is exactly the
    foreachBatch contract (full batch-API plan per micro-batch) rather
    than a continuous stateful operator. Batch ids MUST be disjoint from
    corpus ids (the underlying contract — overlapping ids pair a doc with
    itself through the band join).

    ``corpus`` is either a DataFrame (a FIXED snapshot: for path-based
    parquet sources the file listing is captured when the DataFrame is
    created, so files appended later are NOT seen) or a zero-argument
    callable returning a DataFrame, re-invoked every micro-batch — pass a
    callable when the corpus grows between batches (yesterday's accepted
    docs landing as new files).

    Corpus-side indexes: for a fixed snapshot, the band-key and text-hash
    tables are computed ONCE here and localCheckpoint-ed, so per-batch
    corpus cost is the join probe plus candidate-only tokenization — not a
    corpus scan per trigger. With a callable corpus the indexes must be
    rebuilt per batch (documented cost of freshness; at scale, maintain
    them as bucketed tables instead and pass a snapshot per day).

    Streaming state: none (the per-batch work is stateless given the
    corpus), so there is no watermark to configure and no state store
    growth."""
    from ubparquet_spark.functions.incremental import (
        corpus_band_keys,
        corpus_text_hashes,
        incremental_dedup,
    )

    fixed = not callable(corpus)
    if fixed:
        corpus_df = corpus
        bands = corpus_band_keys(
            corpus_df, bucket_cap=bucket_cap
        ).localCheckpoint(eager=True)
        hashes = corpus_text_hashes(corpus_df).localCheckpoint(eager=True)

    def verdicts_for_batch(batch_df: DataFrame, _batch_id: int) -> DataFrame:
        if fixed:
            return incremental_dedup(
                batch_df,
                corpus_df,
                jaccard_threshold=jaccard_threshold,
                bucket_cap=bucket_cap,
                corpus_bands=bands,
                corpus_hashes=hashes,
            )
        return incremental_dedup(
            batch_df,
            corpus(),
            jaccard_threshold=jaccard_threshold,
            bucket_cap=bucket_cap,
        )

    return verdicts_for_batch
