"""IO sources/sinks: multi-file scan, mergeSchema, manifest, compression."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from ubparquet_spark import io as uio


def test_multifile_scan_unions_rows(spark, sf_dir, tmp_path):
    nation = uio.load_table(spark, sf_dir, "nation")
    p1, p2 = str(tmp_path / "a.parquet"), str(tmp_path / "b.parquet")
    nation.filter(F.col("n_nationkey") < 10).write.parquet(p1)
    nation.filter(F.col("n_nationkey") >= 10).write.parquet(p2)
    df = uio.read_parquet(spark, p1, p2)
    assert df.count() == nation.count()


def test_merge_schema_reconciles_heterogeneous_files(spark, tmp_path):
    p1, p2 = str(tmp_path / "m1.parquet"), str(tmp_path / "m2.parquet")
    spark.createDataFrame([(1, "a")], "id long, x string").write.parquet(p1)
    spark.createDataFrame([(2, 3.5)], "id long, y double").write.parquet(p2)
    df = uio.read_parquet(spark, p1, p2, merge_schema=True)
    assert set(df.columns) == {"id", "x", "y"}
    rows = {r.id: (r.x, r.y) for r in df.collect()}
    assert rows[1] == ("a", None) and rows[2] == (None, 3.5)


def test_manifest_source(spark, sf_dir, tmp_path):
    p1 = str(tmp_path / "part1.parquet")
    p2 = str(tmp_path / "part2.parquet")
    nation = uio.load_table(spark, sf_dir, "nation")
    nation.limit(5).write.parquet(p1)
    nation.limit(5).write.parquet(p2)
    manifest = tmp_path / "files.txt"
    manifest.write_text(f"# event files\n{p1}\n{p2}\n")
    df = uio.read_manifest(spark, str(manifest))
    assert df.count() == 10


def test_write_compression_codecs(spark, sf_dir, tmp_path):
    nation = uio.load_table(spark, sf_dir, "nation")
    for codec in ["gzip", "zstd", "none"]:
        path = str(tmp_path / f"out_{codec}")
        uio.write_parquet(nation, path, compression=codec)
        back = spark.read.parquet(path)
        assert back.count() == nation.count()
        files = [f for f in os.listdir(path) if f.endswith(".parquet")]
        assert files
        ext = {"gzip": ".gz.", "zstd": ".zstd."}.get(codec)
        if ext:
            assert any(ext in f for f in files)


def test_save_npz_roundtrip(spark, sf_dir, tmp_path):
    import numpy as np

    nation = uio.load_table(spark, sf_dir, "nation")
    path = str(tmp_path / "nation.npz")
    uio.save_npz(nation, path)
    back = np.load(path, allow_pickle=True)
    assert set(back.files) == {"n_nationkey", "n_name", "n_regionkey"}
    assert len(back["n_nationkey"]) == nation.count()


def test_register_views_sql_surface(spark, sf_dir):
    uio.register_views(spark, sf_dir)
    n = spark.sql(
        "SELECT COUNT(*) AS n FROM lineitem JOIN orders ON l_orderkey = o_orderkey"
    ).collect()[0].n
    assert n == uio.load_table(spark, sf_dir, "lineitem").count()


def test_sorted_partitioned_write(spark, sf_dir, tmp_path):
    orders = uio.load_table(spark, sf_dir, "orders")
    path = str(tmp_path / "orders_sorted")
    uio.write_parquet(
        orders,
        path,
        partition_by=["o_orderstatus"],
        sort_within_partitions_by=["o_orderkey"],
    )
    back = spark.read.parquet(path)
    assert back.count() == orders.count()
    assert set(r.o_orderstatus for r in back.select("o_orderstatus").distinct().collect()) == {
        "P", "O", "F"
    }


def test_save_npz_size_guard(spark, tmp_path):
    """save_npz must refuse an over-limit frame BEFORE materializing it."""
    import numpy as np
    import pytest

    from ubparquet_spark.io import save_npz

    df = spark.range(100)
    with pytest.raises(ValueError, match="max_rows"):
        save_npz(df, str(tmp_path / "x.npz"), max_rows=10)
    # under the limit (and with the guard disabled) it writes fine
    save_npz(df, str(tmp_path / "ok.npz"), max_rows=1000)
    assert np.load(str(tmp_path / "ok.npz"))["id"].shape == (100,)


def test_compact_parquet_shrinks_file_count(spark, sf_dir, tmp_path):
    """A 64-small-file dataset compacts to the byte-sized target count with
    identical rows; partitioned compaction yields few files per dir."""
    import glob

    from pyspark.sql import functions as F

    from ubparquet_spark.io import compact_parquet, dir_bytes, load_table

    li = load_table(spark, sf_dir, "lineitem")
    shattered = str(tmp_path / "shattered")
    li.repartition(64).write.parquet(shattered)
    assert len(glob.glob(f"{shattered}/*.parquet")) == 64

    total = dir_bytes(spark, shattered)
    assert total > 0
    compacted = str(tmp_path / "compacted")
    # target half the total: 2 tasks requested; the per-file record cap
    # may split a task once more, but the 64-file mess must collapse to a
    # handful — and the return value must be the ACTUAL file count
    n = compact_parquet(spark, shattered, compacted,
                        target_file_bytes=(total + 1) // 2)
    got = len(glob.glob(f"{compacted}/*.parquet"))
    assert got == n
    assert 2 <= n <= 6
    a = spark.read.parquet(shattered)
    b = spark.read.parquet(compacted)
    assert a.count() == b.count()
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0

    # partitioned: one directory per l_returnflag, few files within each
    part_out = str(tmp_path / "by_flag")
    compact_parquet(spark, shattered, part_out,
                    target_file_bytes=total, partition_by=["l_returnflag"])
    flags = [r["l_returnflag"] for r in li.select("l_returnflag").distinct().collect()]
    for f in flags:
        files = glob.glob(f"{part_out}/l_returnflag={f}/*.parquet")
        assert 1 <= len(files) <= 4, files
    c = spark.read.parquet(part_out).drop("l_returnflag")
    assert c.count() == a.count()


def test_compact_parquet_record_cap_splits_hot_partition(spark, sf_dir, tmp_path):
    """A skewed partition value must NOT become one giant file: the
    record-per-file cap derived from target_file_bytes splits it."""
    import glob

    from pyspark.sql import functions as F

    from ubparquet_spark.io import compact_parquet, dir_bytes, load_table

    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "hot", F.lit("all-one-value")
    )
    src = str(tmp_path / "skew_src")
    li.repartition(16).write.parquet(src)
    total = dir_bytes(spark, src)
    out = str(tmp_path / "skew_out")
    # target 1/4 of the bytes -> the single hot partition dir must hold
    # multiple ~quarter-sized files, not one everything-file
    compact_parquet(spark, src, out, target_file_bytes=(total + 3) // 4,
                    partition_by=["hot"])
    files = glob.glob(f"{out}/hot=all-one-value/*.parquet")
    assert len(files) >= 2, files
    assert spark.read.parquet(out).count() == li.count()
