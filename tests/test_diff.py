"""operators.diff: CDC snapshot diff contract tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from ubparquet_spark.io import load_table
from ubparquet_spark.operators.diff import row_fingerprint, snapshot_diff

COLS = ["k", "a", "b"]


def _df(spark, rows):
    return spark.createDataFrame(rows, "k bigint, a string, b bigint")


def test_identical_snapshots_diff_empty(spark):
    df = _df(spark, [(1, "x", 10), (2, "y", 20), (3, None, 30)])
    assert snapshot_diff(df, df, ["k"], ["a", "b"]).count() == 0


def test_change_classes_golden(spark):
    old = _df(spark, [(1, "x", 10), (2, "y", 20), (3, "z", 30)])
    new = _df(spark, [(2, "y", 20), (3, "z", 31), (4, "w", 40)])
    got = {
        r.k: r.change
        for r in snapshot_diff(old, new, ["k"], ["a", "b"]).collect()
    }
    assert got == {1: "removed", 3: "changed", 4: "added"}


def test_null_vs_empty_string_are_different(spark):
    old = _df(spark, [(1, None, 10)])
    new = _df(spark, [(1, "", 10)])
    diff = snapshot_diff(old, new, ["k"], ["a", "b"]).collect()
    assert [r.change for r in diff] == ["changed"]


def test_column_boundary_cannot_collide(spark):
    # ("ab", "c") vs ("a", "bc") concatenate identically without a
    # separator — the unit-separator fingerprint must tell them apart
    df1 = spark.createDataFrame([("ab", "c")], "x string, y string")
    df2 = spark.createDataFrame([("a", "bc")], "x string, y string")
    fp1 = df1.select(row_fingerprint(["x", "y"]).alias("fp")).first().fp
    fp2 = df2.select(row_fingerprint(["x", "y"]).alias("fp")).first().fp
    assert fp1 != fp2


def test_unchanged_rows_filtered_proportional_to_churn(spark):
    old = spark.range(1000).select(
        F.col("id").alias("k"),
        F.lit("same").alias("a"),
        (F.col("id") * 2).alias("b"),
    )
    new = old.withColumn(
        "b", F.when(F.col("k") % 100 == 0, F.col("b") + 1).otherwise(F.col("b"))
    )
    diff = snapshot_diff(old, new, ["k"], ["a", "b"])
    rows = diff.collect()
    assert len(rows) == 10 and all(r.change == "changed" for r in rows)


def test_change_feed_apply_roundtrip(spark, sf_dir):
    """apply_changes(old, change_feed(old, new)) == new, exactly — the
    MERGE invariant, across all three change classes."""
    from ubparquet_spark.operators.diff import apply_changes, change_feed

    base = (
        load_table(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            F.floor(F.col("o_totalprice") * 100 + 0.5)
            .cast("long")
            .alias("cents"),
        )
    )
    key = F.col("o_orderkey")
    survivors = base.filter(key % 97 != 0).withColumn(
        "o_orderstatus",
        F.when(key % 13 == 0, F.lit("X")).otherwise(F.col("o_orderstatus")),
    )
    added = base.filter(key % 101 == 0).withColumn("o_orderkey", -key)
    new = survivors.unionByName(added)

    cmp_cols = ["o_custkey", "o_orderstatus", "cents"]
    feed = change_feed(base, new, ["o_orderkey"], cmp_cols)
    classes = {r.change for r in feed.select("change").distinct().collect()}
    assert classes == {"added", "removed", "changed"}
    merged = apply_changes(base, feed, ["o_orderkey"])
    assert merged.count() == new.count()
    assert merged.exceptAll(new).count() == 0
    assert new.exceptAll(merged).count() == 0


def test_apply_changes_passthrough_when_feed_empty(spark, sf_dir):
    from ubparquet_spark.operators.diff import apply_changes

    base = load_table(spark, sf_dir, "region")
    feed = base.withColumn("change", F.lit("added")).limit(0)
    merged = apply_changes(base, feed, ["r_regionkey"])
    assert merged.exceptAll(base).count() == 0
    assert base.exceptAll(merged).count() == 0


def test_apply_changes_as_streaming_upsert_sink(spark, sf_dir, tmp_path):
    """foreachBatch CDC upsert: a change feed streamed in micro-batches,
    MERGEd into a parquet dimension with apply_changes per batch —
    the streaming dimension-maintenance pattern. The drained dimension
    equals the target snapshot exactly."""
    from ubparquet_spark.operators.diff import apply_changes, change_feed

    base = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long").alias("cents"),
    )
    key = F.col("o_orderkey")
    new = (
        base.filter(key % 97 != 0)
        .withColumn(
            "o_orderstatus",
            F.when(key % 13 == 0, F.lit("X")).otherwise(
                F.col("o_orderstatus")
            ),
        )
        .unionByName(
            base.filter(key % 101 == 0).withColumn("o_orderkey", -key)
        )
    )
    feed = change_feed(base, new, ["o_orderkey"], 
                       ["o_custkey", "o_orderstatus", "cents"])
    # two micro-batch files; each key appears once in the whole feed, so
    # batch order is immaterial
    src = str(tmp_path / "feed_src")
    feed.filter(key % 2 == 0).coalesce(1).write.parquet(src)
    feed.filter(key % 2 != 0).coalesce(1).write.mode("append").parquet(src)
    dim = str(tmp_path / "dim")
    base.write.parquet(dim)

    def upsert(batch_df, batch_id):
        current = batch_df.sparkSession.read.parquet(dim)
        merged = apply_changes(current, batch_df, ["o_orderkey"])
        # materialize BEFORE overwriting the path being read
        merged.localCheckpoint().write.mode("overwrite").parquet(dim)

    stream = spark.readStream.schema(feed.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    (
        stream.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", str(tmp_path / "upsert_ckpt"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    final = spark.read.parquet(dim)
    assert final.count() == new.count()
    assert final.exceptAll(new).count() == 0
    assert new.exceptAll(final).count() == 0
