"""operators.diff: CDC snapshot diff contract tests."""

from __future__ import annotations

from pyspark.sql import functions as F

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
