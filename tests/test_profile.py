"""operators/profile.profile_table — per-column stats, one row each."""

from __future__ import annotations

from ubparquet_spark.operators.profile import profile_table


def test_profile_table_golden(spark):
    df = spark.createDataFrame(
        [
            (1, "a", 2.5),
            (2, None, 2.5),
            (3, "b", None),
            (4, "a", 1.0),
        ],
        "k bigint, s string, v double",
    )
    out = {r.column: r for r in profile_table(df).collect()}
    assert set(out) == {"k", "s", "v"}
    assert all(r.n_rows == 4 for r in out.values())
    assert (out["k"].n_null, out["k"].n_distinct) == (0, 4)
    assert (out["s"].n_null, out["s"].n_distinct) == (1, 2)
    assert (out["v"].n_null, out["v"].n_distinct) == (1, 2)
    # typed min/max, stringified AFTER the typed aggregate
    assert (out["k"].min_value, out["k"].max_value) == ("1", "4")
    assert (out["s"].min_value, out["s"].max_value) == ("a", "b")
    assert (out["v"].min_value, out["v"].max_value) == ("1.0", "2.5")


def test_profile_table_all_null_column(spark):
    df = spark.createDataFrame([(1, None), (2, None)], "k bigint, s string")
    out = {r.column: r for r in profile_table(df, ["s"]).collect()}
    r = out["s"]
    assert (r.n_null, r.n_distinct, r.min_value, r.max_value) == (
        2,
        0,
        None,
        None,
    )


def test_profile_table_no_expand_in_plan(spark):
    """Stacked countDistinct would trigger the distinct-rewrite Expand;
    the long-format pass must keep the plan Expand-free."""
    df = spark.createDataFrame([(1, "a", 2.5)], "k bigint, s string, v double")
    plan = (
        profile_table(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Expand" not in plan
