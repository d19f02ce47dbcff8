"""Raw-SQL surface: registered views run ANSI SQL with the same plans."""

from __future__ import annotations

from pyspark.sql import functions as F

from ubparquet_spark.io import load_table, register_views

from .test_plans_physical import plan_text


def test_views_register_and_query(spark, sf_dir):
    names = register_views(spark, sf_dir)
    assert "lineitem" in names and "documents" in names
    got = {
        r.l_returnflag: r.n
        for r in spark.sql(
            "SELECT l_returnflag, count(*) AS n FROM lineitem GROUP BY 1"
        ).collect()
    }
    expect = {
        r.l_returnflag: r.n
        for r in load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == expect


def test_views_empty_iterable_registers_nothing(spark, sf_dir):
    assert register_views(spark, sf_dir, ()) == []


def test_views_normalize_event_timestamps(spark, sf_dir):
    register_views(spark, sf_dir, prefix="v_")
    # same nanos->timestamp normalization as load_table: types must agree
    sql_t = dict(spark.sql("SELECT ts FROM v_events").dtypes)["ts"]
    df_t = dict(load_table(spark, sf_dir, "events").dtypes)["ts"]
    assert sql_t == df_t == "timestamp_ntz"


def test_views_keep_pushdown(spark, sf_dir):
    register_views(spark, sf_dir)
    plan = plan_text(
        spark.sql("SELECT l_orderkey FROM lineitem WHERE l_quantity < 2")
    )
    # the predicate itself must reach the scan — the bare 'PushedFilters'
    # header prints even when the list is empty
    assert "LessThan(l_quantity" in plan
