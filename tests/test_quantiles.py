"""operators.quantiles matches Spark's exact `percentile` aggregate
(quantile_cont interpolation), including on tied values and tiny groups."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from ubparquet_spark.operators.quantiles import exact_quantiles

PROBS = {"p25": 0.25, "p50": 0.5, "p90": 0.9, "p99": 0.99}


def _reference(spark, df):
    return df.groupBy("k").agg(
        *[F.expr(f"percentile(v, {p})").alias(name) for name, p in PROBS.items()],
        F.count(F.lit(1)).alias("n_rows"),
    )


def _assert_equal(spark, df):
    got = {r.k: r.asDict() for r in exact_quantiles(df, ["k"], "v", PROBS).collect()}
    exp = {r.k: r.asDict() for r in _reference(spark, df).collect()}
    assert got.keys() == exp.keys()
    for k in exp:
        assert got[k]["n_rows"] == exp[k]["n_rows"]
        for name in PROBS:
            assert abs(got[k][name] - exp[k][name]) < 1e-9, (k, name, got[k], exp[k])


def test_matches_percentile_random(spark):
    rng = random.Random(7)
    rows = [
        (f"g{rng.randint(0, 3)}", round(rng.uniform(0, 1000), 2))
        for _ in range(5000)
    ]
    _assert_equal(spark, spark.createDataFrame(rows, "k string, v double"))


def test_matches_percentile_heavy_ties(spark):
    rng = random.Random(11)
    # only 7 distinct values -> every quantile lands on or between ties
    rows = [(f"g{rng.randint(0, 2)}", float(rng.randint(0, 6))) for _ in range(3000)]
    _assert_equal(spark, spark.createDataFrame(rows, "k string, v double"))


def test_tiny_groups(spark):
    rows = [("a", 1.0), ("b", 1.0), ("b", 2.0), ("c", 5.0), ("c", 1.0), ("c", 3.0)]
    _assert_equal(spark, spark.createDataFrame(rows, "k string, v double"))


def test_distributed_rank_matches_window_functions(spark):
    """ranked()/percent_rank_col()/ntile_col() are bit-identical to the
    single-window builtins across group sizes, including n < k ntiles."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ubparquet_spark.operators.ranks import ntile_col, percent_rank_col, ranked

    rows = [(g, i * 7 % 23, i) for g in ("a", "b", "c") for i in range(g != "c" and 17 or 2)]
    df = spark.createDataFrame(rows, "g string, v long, id long")
    w = Window.partitionBy("g").orderBy("v", "id")
    expected = {
        (r.g, r.id): (r.pr, r.nt)
        for r in df.select(
            "g", "id",
            F.percent_rank().over(w).alias("pr"),
            F.ntile(4).over(w).alias("nt"),
        ).collect()
    }
    got = {
        (r.g, r.id): (r.pr, r.nt)
        for r in ranked(df, ["g"], ["v", "id"], rank_col="_r", n_col="_n")
        .select(
            "g", "id",
            percent_rank_col("_r", "_n").alias("pr"),
            ntile_col("_r", "_n", 4).cast("int").alias("nt"),
        )
        .collect()
    }
    assert got == expected


def test_ranked_nullable_group_key(spark):
    """ranked() keeps NULL-key groups: Window.partitionBy treats NULL as
    an ordinary partition value, so the blocked offset join must be
    null-safe (round-6 ADVICE — a name-list join dropped these rows)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ubparquet_spark.operators.ranks import ranked

    rows = [(g, i * 13 % 29, i) for g in ("a", None, "b") for i in range(11)]
    df = spark.createDataFrame(rows, "g string, v long, id long")
    w = Window.partitionBy("g").orderBy("v", "id")
    expected = {
        (r.g, r.id): (r.rk, r.n)
        for r in df.select(
            "g", "id",
            F.row_number().over(w).alias("rk"),
            F.count(F.lit(1)).over(Window.partitionBy("g")).alias("n"),
        ).collect()
    }
    got = {
        (r.g, r.id): (r.rank, r.n_rows)
        for r in ranked(df, ["g"], ["v", "id"], num_partitions=5).select(
            "g", "id", "rank", "n_rows"
        ).collect()
    }
    assert got == expected


def test_rank_canary_real_table_multi_partition(spark, sf_dir):
    """Round-2 carry-over canary: at real multi-task scale (sf0.01 orders,
    32 range partitions) recompute one group's ranks via a plain window
    and compare against ranked()'s monotonically_increasing_id arithmetic.
    A Spark upgrade that breaks id-consecutiveness within a partition
    either trips the in-plan raise_error canary or fails this equality."""
    from pyspark.sql import Window

    from ubparquet_spark.io import load_table
    from ubparquet_spark.operators.ranks import ranked

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_totalprice", "o_orderkey"
    )
    got = (
        ranked(
            orders,
            ["o_orderpriority"],
            ["o_totalprice", "o_orderkey"],
            num_partitions=32,
        )
        .filter(F.col("o_orderpriority") == "3-MEDIUM")
        .select("o_orderkey", "rank")
    )
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    expected = (
        orders.withColumn("rank_w", F.row_number().over(w))
        .filter(F.col("o_orderpriority") == "3-MEDIUM")
        .select("o_orderkey", "rank_w")
    )
    diff = (
        got.join(expected, "o_orderkey", "full")
        .filter(
            F.col("rank").isNull()
            | F.col("rank_w").isNull()
            | (F.col("rank") != F.col("rank_w"))
        )
        .count()
    )
    assert diff == 0


def test_blocked_cumsum_matches_global_window(spark):
    """blocked_cumsum == the naive SUM() OVER (ORDER BY v) global window
    (inclusive AND exclusive, long + decimal inputs, grand totals) on a
    multi-partition distribution with a sparse, negative-spanning domain."""
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ubparquet_spark.operators.ranks import blocked_cumsum

    rng = random.Random(1234)
    # sparse domain spanning negatives: value-based blocking would
    # degenerate here; rank/task-based blocking must not
    vals = rng.sample(range(-10_000_000, 10_000_000), 500)
    rows = [(v, rng.randint(1, 9), rng.randint(0, 5)) for v in vals]
    df = spark.createDataFrame(rows, "v long, c1 long, c2 long")
    w_inc = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    w_exc = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    dec = F.col("c2").cast("decimal(38,0)")
    expected = {
        r.v: (r.ci, r.ce, r.n1, r.n2)
        for r in df.select(
            "v",
            F.sum("c1").over(w_inc).alias("ci"),
            F.coalesce(F.sum(dec).over(w_exc), F.lit(0)).alias("ce"),
            F.sum("c1").over(Window.partitionBy()).alias("n1"),
            F.sum(dec).over(Window.partitionBy()).alias("n2"),
        ).collect()
    }
    got = {
        r.v: (r.ci, r.ce, r.n1, r.n2)
        for r in blocked_cumsum(
            df,
            ["v"],
            {"ci": ("c1", "inclusive"), "ce": (dec, "exclusive")},
            totals={"n1": "c1", "n2": dec},
            num_partitions=7,
        ).collect()
    }
    assert got == expected


def test_blocked_cumsum_no_unpartitioned_fact_window(spark):
    """The only unpartitioned ordered window in the blocked plan is the
    n_tasks-row offset table — the data-bearing windows partition on the
    task id."""
    from pyspark.sql import functions as F

    from ubparquet_spark.operators.ranks import blocked_cumsum

    df = spark.range(100).select(F.col("id").alias("v"), F.lit(1).alias("c"))
    out = blocked_cumsum(df, ["v"], {"cum": ("c", "inclusive")}, num_partitions=4)
    jplan = out._jdf.queryExecution().optimizedPlan()
    stack, bad = [jplan], []
    while stack:
        node = stack.pop()
        if node.getClass().getSimpleName() == "Window":
            if node.partitionSpec().isEmpty():
                # must be the offset branch: its child grain is the
                # per-task aggregate, i.e. an Aggregate on _pid
                child = node.children().head()
                names = [str(a.name()) for a in _jseq(child.output())]
                assert "_pid" in names and any(
                    n.startswith("_t_") for n in names
                ), f"unpartitioned window over non-offset input: {names}"
        for i in range(node.children().size()):
            stack.append(node.children().apply(i))
    assert not bad


def _jseq(scala_seq):
    return [scala_seq.apply(i) for i in range(scala_seq.size())]


def test_blocked_cumsum_edge_cases(spark):
    """Empty input and single-row input survive the blocked plan."""
    from pyspark.sql import functions as F

    from ubparquet_spark.operators.ranks import blocked_cumsum

    empty = spark.createDataFrame([], "v long, c long")
    out = blocked_cumsum(
        empty, ["v"], {"cum": ("c", "inclusive")}, totals={"n": "c"}
    )
    assert out.count() == 0

    one = spark.createDataFrame([(5, 3)], "v long, c long")
    rows = blocked_cumsum(
        one,
        ["v"],
        {"ci": ("c", "inclusive"), "ce": ("c", "exclusive")},
        totals={"n": "c"},
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.ci, r.ce, r.n) == (3, 0, 3)


def test_blocked_cumsum_keyed_matches_keyed_window(spark):
    """part_cols: per-group running sums == Window.partitionBy(key) on a
    low-cardinality key over a near-unique domain (the exact_quantiles
    shape), including per-group totals and exclusive sums. A NULL group
    key is included: Window.partitionBy treats NULL as an ordinary
    partition value, so the blocked offset join must be null-safe or the
    whole NULL-key group silently vanishes (round-6 ADVICE)."""
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ubparquet_spark.operators.ranks import blocked_cumsum

    rng = random.Random(77)
    rows = [
        (g, v, rng.randint(1, 5))
        for g in ("a", "b", "c", None)
        for v in rng.sample(range(-1_000_000, 1_000_000), 200)
    ]
    df = spark.createDataFrame(rows, "g string, v long, c long")
    w_inc = (
        Window.partitionBy("g").orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_exc = (
        Window.partitionBy("g").orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    expected = {
        (r.g, r.v): (r.ci, r.ce, r.n)
        for r in df.select(
            "g", "v",
            F.sum("c").over(w_inc).alias("ci"),
            F.coalesce(F.sum("c").over(w_exc), F.lit(0)).alias("ce"),
            F.sum("c").over(Window.partitionBy("g")).alias("n"),
        ).collect()
    }
    got = {
        (r.g, r.v): (r.ci, r.ce, r.n)
        for r in blocked_cumsum(
            df,
            ["v"],
            {"ci": ("c", "inclusive"), "ce": ("c", "exclusive")},
            part_cols=["g"],
            totals={"n": "c"},
            num_partitions=7,
        ).collect()
    }
    assert got == expected


def test_exact_quantiles_multi_matches_percentile(spark):
    """The one-scan multi-column form equals Spark's exact percentile on
    both columns, including ties and the n_rows contract (first column's
    non-null count)."""
    import random

    from pyspark.sql import functions as F

    from ubparquet_spark.operators.quantiles import exact_quantiles_multi

    rng = random.Random(9)
    rows = [
        (g, float(rng.randint(0, 40)), float(rng.randint(-5, 5)))
        for g in ("a", "b")
        for _ in range(137)
    ]
    df = spark.createDataFrame(rows, "k string, x double, y double")
    got = {
        r.k: r.asDict()
        for r in exact_quantiles_multi(
            df, ["k"], {"x": {"x_med": 0.5, "x_p90": 0.9}, "y": {"y_q1": 0.25}}
        ).collect()
    }
    want = {
        r.k: r.asDict()
        for r in df.groupBy("k")
        .agg(
            F.expr("percentile(x, 0.5)").alias("x_med"),
            F.expr("percentile(x, 0.9)").alias("x_p90"),
            F.expr("percentile(y, 0.25)").alias("y_q1"),
            F.count("x").alias("n_rows"),
        )
        .collect()
    }
    for k in want:
        for c in ("x_med", "x_p90", "y_q1"):
            assert abs(got[k][c] - want[k][c]) < 1e-9, (k, c)
        assert got[k]["n_rows"] == want[k]["n_rows"]


def test_high_cardinality_strategy_matches_blocked(spark):
    """Both running-total strategies produce identical quantiles —
    the choice is a physical-plan decision, never a semantic one."""
    import random

    from ubparquet_spark.operators.quantiles import exact_quantiles

    rng = random.Random(23)
    rows = [
        (f"g{rng.randint(0, 40)}", round(rng.uniform(0, 100), 2))
        for _ in range(4000)
    ]
    df = spark.createDataFrame(rows, "k string, v double")
    a = {
        r.k: (r.p50, r.n_rows)
        for r in exact_quantiles(df, ["k"], "v", {"p50": 0.5}).collect()
    }
    b = {
        r.k: (r.p50, r.n_rows)
        for r in exact_quantiles(
            df, ["k"], "v", {"p50": 0.5}, high_cardinality_keys=True
        ).collect()
    }
    assert a == b


def test_auto_dispatch_rule_and_probe(spark):
    """Round-8 auto-dispatch: the strategy choice follows the measured
    BENCHNOTES crossover (plain keyed window iff n_keys >= n_tasks),
    from a caller hint or the approx_count_distinct probe."""
    from ubparquet_spark.operators.ranks import (
        _shuffle_partitions,
        use_plain_keyed_window,
    )

    df = spark.createDataFrame([("a", 1.0)], "k string, v double")
    n_tasks = _shuffle_partitions(df)
    assert use_plain_keyed_window(df, [], n_keys=10**9) is False
    assert use_plain_keyed_window(df, ["k"], n_keys=n_tasks - 1) is False
    assert bool(use_plain_keyed_window(df, ["k"], n_keys=n_tasks)) is True
    # probe path: 3 distinct keys -> blocked; ~20x n_tasks keys -> window
    few = spark.range(300).select(
        (F.col("id") % 3).alias("k"), F.col("id").cast("double").alias("v")
    )
    assert bool(use_plain_keyed_window(few, ["k"])) is False
    many = spark.range(n_tasks * 20).select(
        F.col("id").alias("k"), F.col("id").cast("double").alias("v")
    )
    assert bool(use_plain_keyed_window(many, ["k"])) is True
    # composite keys probe through a struct
    comp = many.withColumn("k2", F.col("k") % 2)
    assert bool(use_plain_keyed_window(comp, ["k", "k2"])) is True


def test_auto_dispatch_picks_each_physical_plan(spark):
    """AUTO must actually switch the physical plan: the blocked strategy
    broadcast-joins its offset table; the plain keyed window has no join
    at all. Results are identical either way (strategy-equality test
    above); this pins the dispatch itself."""
    from ubparquet_spark.operators.quantiles import exact_quantiles

    df = spark.createDataFrame(
        [(f"g{i % 4}", float(i)) for i in range(100)], "k string, v double"
    )

    def plan(q):
        return q._jdf.queryExecution().executedPlan().toString()

    low = exact_quantiles(df, ["k"], "v", {"p50": 0.5}, n_keys=2)
    assert "BroadcastHashJoin" in plan(low)
    high = exact_quantiles(df, ["k"], "v", {"p50": 0.5}, n_keys=10**6)
    assert "BroadcastHashJoin" not in plan(high)
    # results agree regardless of the dispatch decision
    a = {(r.k, r.p50, r.n_rows) for r in low.collect()}
    b = {(r.k, r.p50, r.n_rows) for r in high.collect()}
    assert a == b


def test_high_cardinality_rejected_for_global_quantile(spark):
    """keys=[] with the window strategy would be an unpartitioned global
    window (round-8 ADVICE): refuse loudly, the blocked default is the
    bounded plan for a global quantile."""
    import pytest

    from ubparquet_spark.operators.quantiles import exact_quantiles

    df = spark.createDataFrame([(1.0,), (2.0,)], "v double")
    with pytest.raises(ValueError, match="global window"):
        exact_quantiles(df, [], "v", {"p50": 0.5}, high_cardinality_keys=True)


def test_fuse_distribution_matches_default(spark):
    """fuse_distribution=True (round 12) must be result-identical to the
    default two-exchange plan — keyed, global, and multi-column forms —
    including heavy ties (where the fused groupBy must still produce
    complete per-value counts: RangePartitioner sends equal keys to one
    partition)."""
    import random

    from ubparquet_spark.operators.quantiles import (
        exact_quantiles,
        exact_quantiles_multi,
    )

    rng = random.Random(23)
    rows = [
        (f"g{rng.randint(0, 3)}", round(rng.uniform(0, 100), 1), float(rng.randint(0, 5)))
        for _ in range(4000)
    ]
    df = spark.createDataFrame(rows, "k string, v double, w double")
    probs = {"p25": 0.25, "p50": 0.5, "p99": 0.99}
    for keys in (["k"], []):
        a = exact_quantiles(df, keys, "v", probs, high_cardinality_keys=False)
        b = exact_quantiles(
            df, keys, "v", probs, high_cardinality_keys=False,
            fuse_distribution=True,
        )
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    specs = {"v": {"mv": 0.5}, "w": {"mw": 0.5, "qw": 0.25}}
    a = exact_quantiles_multi(df, ["k"], specs)
    b = exact_quantiles_multi(df, ["k"], specs, fuse_distribution=True)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_fuse_distribution_rejects_window_strategy(spark):
    import pytest

    from ubparquet_spark.operators.quantiles import exact_quantiles

    df = spark.createDataFrame([("a", 1.0), ("a", 2.0)], "k string, v double")
    with pytest.raises(ValueError, match="blocked strategy"):
        exact_quantiles(
            df, ["k"], "v", {"p50": 0.5},
            high_cardinality_keys=True, fuse_distribution=True,
        )


def test_blocked_cumsum_pre_partitioned_matches_default(spark):
    """blocked_cumsum(pre_partitioned=True) over an upstream
    repartitionByRange + riding groupBy equals the self-shuffling default
    — the fuse_distribution contract at the operator level."""
    import random

    from pyspark.sql import functions as F

    from ubparquet_spark.operators.ranks import (
        _shuffle_partitions,
        blocked_cumsum,
    )

    rng = random.Random(31)
    rows = [
        (f"g{rng.randint(0, 2)}", float(rng.randint(0, 50)))
        for _ in range(3000)
    ]
    raw = spark.createDataFrame(rows, "k string, v double")
    dist_default = raw.groupBy("k", "v").agg(F.count(F.lit(1)).alias("c"))
    a = blocked_cumsum(
        dist_default, ["v"], {"cum": ("c", "inclusive")},
        part_cols=["k"], totals={"n": "c"},
    )
    pre = raw.repartitionByRange(_shuffle_partitions(raw), "k", "v")
    dist_fused = pre.groupBy("k", "v").agg(F.count(F.lit(1)).alias("c"))
    b = blocked_cumsum(
        dist_fused, ["v"], {"cum": ("c", "inclusive")},
        part_cols=["k"], totals={"n": "c"}, pre_partitioned=True,
    )
    key = lambda r: (r.k, r.v)  # noqa: E731
    assert sorted(map(tuple, a.collect()), key=lambda t: (t[0], t[1])) == sorted(
        map(tuple, b.collect()), key=lambda t: (t[0], t[1])
    )


def test_ranked_checkpoint_skip_rule(spark):
    """ranked() skips its materialize-once checkpoint exactly when every
    input column is a sort key (round 12): the plan then keeps the range
    exchange visible in both consumer subtrees (AQE reuses the shuffle at
    runtime), while a payload column brings the checkpoint back. Results
    are identical either way."""
    from pyspark.sql import functions as F

    from ubparquet_spark.operators.ranks import ranked

    def plan(df):
        sc = df.sparkSession.sparkContext
        return sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )

    # spark.range base: a local createDataFrame would itself scan an
    # ExistingRDD and defeat the no-checkpoint plan assertion
    df = spark.range(2000).select(
        F.concat(F.lit("g"), (F.col("id") % 3).cast("string")).alias("k"),
        ((F.col("id") * 2654435761) % 1000003).alias("o"),
        F.col("id").cast("double").alias("payload"),
    )
    slim = ranked(df.select("k", "o"), ["k"], ["o"], rank_col="r", n_col="n")
    # no checkpoint: the sorted slice is NOT truncated to a LogicalRDD
    assert "ExistingRDD" not in plan(slim)
    assert plan(slim).count("rangepartitioning") >= 2  # visible in both subtrees
    fat = ranked(df, ["k"], ["o"], rank_col="r", n_col="n")
    assert "ExistingRDD" in plan(fat)
    a = sorted((r.k, r.o, r.r, r.n) for r in slim.collect())
    b = sorted((r.k, r.o, r.r, r.n) for r in fat.select("k", "o", "r", "n").collect())
    assert a == b
