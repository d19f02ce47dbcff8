"""Every relational plan hash-matches the DuckDB oracle (exact, rtol=0)."""

from __future__ import annotations

import pytest

from ubparquet_spark.plans import tpch

from .oracle import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(tpch.QUERIES))
def test_tpch_query_matches_oracle(spark, sf_dir, name):
    fn, sql = tpch.QUERIES[name]
    if sql is None:
        # sketch/approximate queries have no cross-engine oracle:
        # rows-only check (mirrors the driver's weaker gate)
        rows = fn(spark, sf_dir).collect()
        assert len(rows) >= 0
        return
    assert_matches_oracle(fn(spark, sf_dir), sql, sf_dir)


def test_sketch_stats_within_documented_error(spark, sf_dir):
    """q_sketch_stats has no cross-engine oracle (approximate by design) —
    but its error IS bounded by contract: approx_count_distinct at
    rsd=0.01 should sit within a few σ of the exact distinct count, and
    percentile_approx at accuracy=10000 within 1/10000 of the rank range.
    Assert those bounds against exactly-computed references so 'no oracle'
    never degrades into 'no check'."""
    from pyspark.sql import functions as F

    from ubparquet_spark.io import load_table
    from ubparquet_spark.plans.tpch import q_sketch_stats

    got = {r["l_returnflag"]: r for r in q_sketch_stats(spark, sf_dir).collect()}
    li = load_table(spark, sf_dir, "lineitem")
    exact = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_orderkey").alias("orders"),
            F.expr("percentile(l_extendedprice, 0.5)").alias("median"),
            F.expr("percentile(l_extendedprice, 0.99)").alias("p99"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    assert set(got) == set(exact)
    for flag, g in got.items():
        e = exact[flag]
        assert g["n_rows"] == e["n"]
        # rsd=0.01 → allow 5σ
        assert abs(g["approx_orders"] - e["orders"]) <= max(5, 0.05 * e["orders"])
        # rank-based bound: the approx quantile must be between the exact
        # quantiles at p ± 2/accuracy (loose, but a real bound)
        for col, p in (("median_price_approx", 0.5), ("p99_price_approx", 0.99)):
            lo, hi = (
                li.filter(F.col("l_returnflag") == flag)
                .agg(
                    F.expr(f"percentile(l_extendedprice, {max(p - 0.01, 0)})"),
                    F.expr(f"percentile(l_extendedprice, {min(p + 0.01, 1)})"),
                )
                .first()
            )
            assert lo - 1e-9 <= g[col] <= hi + 1e-9, (flag, col, g[col], lo, hi)
