"""Skew-salting correctness + bucketed join shuffle elimination."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ubparquet_spark.io import load_table, write_bucketed_table
from ubparquet_spark.operators import skew

from .test_plans_physical import plan_text


def test_salted_aggregate_equals_direct(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    direct = {
        r.l_returnflag: (r.n, round(r.s, 2))
        for r in li.groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("s"))
        .collect()
    }
    salted = {
        r.l_returnflag: (r.n, round(r.s, 2))
        for r in skew.salted_aggregate(
            li,
            ["l_returnflag"],
            {"n": ("count", F.lit(1)), "s": ("sum", "l_quantity")},
            n_salts=8,
        ).collect()
    }
    assert salted == direct


def test_salted_aggregate_minmax(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    out = skew.salted_aggregate(
        li,
        ["l_linestatus"],
        {"lo": ("min", "l_quantity"), "hi": ("max", "l_quantity")},
        n_salts=4,
    ).collect()
    direct = {
        r.l_linestatus: (r.lo, r.hi)
        for r in li.groupBy("l_linestatus")
        .agg(F.min("l_quantity").alias("lo"), F.max("l_quantity").alias("hi"))
        .collect()
    }
    assert {r.l_linestatus: (r.lo, r.hi) for r in out} == direct


def test_salted_join_equals_direct(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    direct = li.join(orders, "o_orderkey").count()
    salted = skew.salted_join(li, orders, "o_orderkey", n_salts=4).count()
    assert salted == direct


@pytest.mark.usefixtures("spark")
def test_bucketed_join_has_no_shuffle(spark, sf_dir, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders = load_table(spark, sf_dir, "orders")
        li = load_table(spark, sf_dir, "lineitem")
        write_bucketed_table(orders, "orders_b", ["o_orderkey"], 8, sort_cols=["o_orderkey"])
        write_bucketed_table(
            li.withColumnRenamed("l_orderkey", "o_orderkey"),
            "lineitem_b",
            ["o_orderkey"],
            8,
            sort_cols=["o_orderkey"],
        )
        joined = spark.table("lineitem_b").join(spark.table("orders_b"), "o_orderkey")
        plan = plan_text(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located: bucketing removed the shuffle
        # and the result is right
        assert joined.count() == li.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")
