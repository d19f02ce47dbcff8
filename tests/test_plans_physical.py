"""Physical-plan checks: the scale properties we claim actually hold.

- filters reach the Parquet scan (PushedFilters),
- column pruning reaches the read schema (ReadSchema),
- small dimensions broadcast (BroadcastHashJoin),
- whole-stage codegen covers the aggregation pipeline.
"""

from __future__ import annotations

from ubparquet_spark.plans import tpch


def plan_text(df) -> str:
    sc = df.sparkSession.sparkContext
    return sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def test_q1_pushdown_and_pruning(spark, sf_dir):
    plan = plan_text(tpch.q1_pricing_summary(spark, sf_dir))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    read = plan[plan.index("ReadSchema"):].splitlines()[0]
    # only the 7 needed columns, not all 11
    assert "l_orderkey" not in read and "l_partkey" not in read
    assert "l_quantity" in read and "l_returnflag" in read
    # map-side combine: partial aggregation happens before the single exchange
    assert "partial_sum" in plan
    assert plan.count("Exchange") - plan.count("Exchange (") <= 2


def test_q3_broadcasts_customer(spark, sf_dir):
    plan = plan_text(tpch.q3_shipping_priority(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "PushedFilters: [IsNotNull(c_mktsegment), EqualTo(c_mktsegment,BUILDING)" in plan


def test_q5_broadcasts_dims(spark, sf_dir):
    plan = plan_text(tpch.q5_local_supplier(spark, sf_dir))
    # supplier, nation, region all broadcast; only the fact-fact join shuffles
    assert plan.count("BroadcastHashJoin") >= 3
    assert "EqualTo(r_name,ASIA)" in plan


def test_point_lookup_pushdown(spark, sf_dir):
    plan = plan_text(tpch.q_point_lookup(spark, sf_dir))
    assert "GreaterThanOrEqual(o_orderkey,100)" in plan
    assert "LessThan(o_orderkey,105)" in plan
    # the filter also propagates to the fact side via the join
    assert "BroadcastHashJoin" in plan


def test_distinct_prunes_to_single_column(spark, sf_dir):
    plan = plan_text(tpch.q_distinct_segments(spark, sf_dir))
    read = plan[plan.index("ReadSchema"):].splitlines()[0]
    assert "c_mktsegment" in read
    assert "c_acctbal" not in read and "c_name" not in read


def test_partition_pruning_on_partitioned_write(spark, sf_dir, tmp_path):
    """Writes partitioned by a column are pruned at the directory level."""
    from ubparquet_spark.io import load_table, write_parquet
    from pyspark.sql import functions as F

    path = str(tmp_path / "orders_part")
    write_parquet(load_table(spark, sf_dir, "orders"), path, partition_by=["o_orderstatus"])
    df = spark.read.parquet(path).filter(F.col("o_orderstatus") == "F")
    plan = plan_text(df)
    assert "PartitionFilters" in plan
    assert "o_orderstatus" in plan[plan.index("PartitionFilters"):].splitlines()[0]


def test_semi_and_anti_join_shapes(spark, sf_dir):
    semi = plan_text(tpch.q_late_orders_semi(spark, sf_dir))
    anti = plan_text(tpch.q_customers_without_orders(spark, sf_dir))
    assert "LeftSemi" in semi
    assert "LeftAnti" in anti


def test_time_range_join_is_equi_join(spark, sf_dir):
    """The bucketed temporal join must plan as a hash/sort-merge equi-join on
    (keys, cell) — never the nested-loop join a raw range predicate yields."""
    from ubparquet_spark.plans.events import q_event_pairs_10min

    plan = plan_text(q_event_pairs_10min(spark, sf_dir))
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan


def test_rank_windows_have_no_whole_group_partition(spark, sf_dir, monkeypatch):
    """q_order_price_ranks must never sort a whole priority group in one
    window task, and must shuffle the orders table exactly once (the range
    partition): no rank/row_number window over the full table, and no
    second exchange keyed on the slice id. (The offsets windows partition
    by priority alone, but run over n_tasks rows, not n_rows.) The round-11
    materialize-once checkpoint truncates the visible plan at the range
    partition, so flip it off here to assert the full underlying shape."""
    from ubparquet_spark.operators import ranks

    monkeypatch.setattr(ranks, "_CHECKPOINT", False)
    plan = plan_text(tpch.q_order_price_ranks(spark, sf_dir))
    assert "rangepartitioning" in plan
    # no per-row ranking window exists anywhere in the plan
    assert "row_number()" not in plan and "percent_rank()" not in plan
    # no Window sorts rows by the value column (windows exist only on the
    # tiny per-(task, group) counts frame, ordered by task id)
    for line in plan.splitlines():
        if "windowspecdefinition" in line:
            assert "o_totalprice" not in line, f"per-row window: {line}"


def test_contamination_broadcasts_benchmark_side(spark, sf_dir):
    """The benchmark shingle set must broadcast: shuffling the exploded
    corpus shingles to co-locate with a tiny eval set would be the
    100 TB-scale mistake this plan exists to avoid."""
    from ubparquet_spark.plans import text

    plan = plan_text(text.q_contamination(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    # the doc_id % 97 slice predicates reach both parquet scans
    assert "PushedFilters" in plan


def test_domain_cap_uses_window_group_limit(spark, sf_dir):
    """row_number() <= cap must trigger Spark's WindowGroupLimit rewrite:
    each map task keeps only its local top-cap rows per source BEFORE the
    shuffle, so the exchange carries O(cap x partitions) per group, not the
    whole corpus."""
    from ubparquet_spark.plans import text

    plan = plan_text(text.q_domain_cap(spark, sf_dir))
    assert "WindowGroupLimit" in plan


def test_corr_partial_aggregates_integer_sums(spark, sf_dir):
    """q_price_qty_corr must partial-aggregate (map-side combine) its six
    integer sums before the one exchange — the shuffle then carries 6 longs
    per (task, group), not rows — and read only the three columns it uses."""
    plan = plan_text(tpch.q_price_qty_corr(spark, sf_dir))
    assert plan.count("HashAggregate") >= 2  # partial + final
    assert "ReadSchema" in plan
    import re

    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    # field names only: a bare comma split would break on parameterized
    # types like decimal(12,2)
    cols = set(re.findall(r"(\w+):", m.group(1)))
    assert cols == {"l_quantity", "l_extendedprice", "l_returnflag"}


def test_ann_recall_broadcasts_query_sample(spark, sf_dir):
    """Both joins in the recall harness (ground-truth scoring and candidate
    counting) must broadcast the tiny query sample — the corpus side never
    shuffles for either, which is what makes recall evaluation runnable on
    the full table. The top-k rank filter must also push map-side."""
    from ubparquet_spark.plans import similarity

    plan = plan_text(similarity.q_ann_recall(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "WindowGroupLimit" in plan


def test_gopher_rules_single_scan_no_shuffle(spark, sf_dir):
    """The rule table is a pure per-row map: no Exchange may appear."""
    from ubparquet_spark.plans import text

    plan = plan_text(text.q_gopher_rules(spark, sf_dir))
    assert "Exchange" not in plan


def test_twap_has_no_whole_type_fact_window(spark, sf_dir):
    """VERDICT r04 defect #1: q_twap's lead must NOT run in a window
    partitioned by event_type alone — with a handful of event types that
    sorts each type's entire 100 TB history in one task.  After the
    segmented_lead rewire, the fact-side window spec must include the
    day-bucket column; the only type-alone spec allowed is the boundary
    handoff, which runs over the per-bucket FIRSTS aggregate (one row per
    non-empty (type, day)), never over fact rows."""
    from ubparquet_spark.plans import events

    plan = plan_text(events.q_twap(spark, sf_dir))
    specs = [seg.split(")")[0] for seg in plan.split("windowspecdefinition(")[1:]]
    assert specs, "expected Window operators in the q_twap plan"
    bucketed = [s for s in specs if "__seg" in s]
    plain = [s for s in specs if "__seg" not in s]
    assert bucketed, f"fact-side lead lost its bucket column: {specs}"
    # the non-bucketed spec is the handoff lead over the aggregated firsts
    # artifact — it reads the struct-min output, never a fact column
    assert all("_first_t" in s for s in plain), plain


def test_q2_group_min_broadcasts_not_windows(spark, sf_dir):
    """The correlated per-type minimum must be a groupBy artifact
    broadcast back, never min().over(partitionBy(p_type)) — a
    low-cardinality unordered window puts each type's whole table slice
    in one task."""
    plan = plan_text(tpch.q2_min_cost_parts(spark, sf_dir))
    assert "windowspecdefinition" not in plan
    assert "BroadcastHashJoin" in plan
