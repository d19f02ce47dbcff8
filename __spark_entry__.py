"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: TPC-H Q1 pricing summary on sf0.001."""
    from ubparquet_spark.plans import tpch

    return tpch.q1_pricing_summary(spark, "/root/testdata/sf0.001")


# The driver's correctness check records only the FIRST ~50 registry
# entries (CORRECTNESS_r01..r06.json each stopped at exactly 50).  Order
# the registry so the queries that most need a fresh green row come first.
#
# ROUND-7 ROTATION (executes VERDICT r06 "Next round" #1):
#   1. all 33 queries whose newest driver row is CORRECTNESS_r03, the
#      round-6 structurally-rewired plans leading (q_exact_quantiles,
#      q_rfm_segments, q_order_price_ranks, q_price_qty_corr,
#      q_semantic_dedup_2level — they changed shape since their last
#      hard row);
#   2. round-7 registrations (never driver-checked) — inserted as they
#      land this round;
#   3. oldest-r04 fills — leading with the three rollup/cube queries
#      whose ORACLES changed this round (empty-input HAVING guard).
# After this round no registry query's newest driver row predates
# round 4; the r04 remainder rotates in round 8.  All stay covered
# every session by the sf0.01 DuckDB-oracle pytest gate.
_CHECK_FIRST = [
    # -- stalest driver rows (newest row is CORRECTNESS_r03)
    "q_exact_quantiles",
    "q_rfm_segments",
    "q_order_price_ranks",
    "q_price_qty_corr",
    "q_semantic_dedup_2level",
    "q11_important_parts",
    "q13_order_count_histogram",
    "q18_large_volume_orders",
    "q2_min_cost_parts",
    "q_bigram_pmi",
    "q_boilerplate_shingles",
    "q_dau_mau",
    "q_dedup_cluster_sizes",
    "q_doc_dedup_decisions",
    "q_doc_embedding",
    "q_events_user_mode",
    "q_events_voxelize",
    "q_fiducial_cut",
    "q_first_touch",
    "q_grouping_sets",
    "q_incremental_dedup",
    "q_jl_projection",
    "q_lang_mismatch",
    "q_linear_quality",
    "q_ngram_jaccard_pairs",
    "q_paragraph_dedup",
    "q_paragraph_dedup_text",
    "q_reservoir_per_group",
    "q_source_concentration",
    "q_token_drift",
    "q_volume_anomaly",
    "q_weighted_sample",
    "q_zorder_cells",
    # -- round-7 registrations (never driver-checked) land here
    "q_value_sanity",
    "q_key_integrity",
    # -- oldest r04 cohort fills the window
    "q_cube_orders",
    "q_rollup_revenue",
    "q_events_time_rollup",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "q6_forecast_revenue",
    "q7_nation_volume",
    "q10_returned_items",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_part_supplier_variety",
    "q19_disjunctive",
    "q_above_avg_balance",
    "q_asof_prev_click",
]


def _registry() -> dict[str, tuple]:
    """name -> (fn, oracle_sql | None), collected from plan modules.

    Imports are deliberately NOT wrapped in try/except: a broken plan module
    must fail loudly here rather than silently shrinking the registry."""
    from ubparquet_spark.plans import events, packing, similarity, text, tpch

    reg: dict[str, tuple] = {}
    for mod in (tpch, events, text, similarity, packing):
        overlap = reg.keys() & mod.QUERIES.keys()
        assert not overlap, f"duplicate query names: {overlap}"
        reg.update(mod.QUERIES)
    missing = [name for name in _CHECK_FIRST if name not in reg]
    assert not missing, f"_CHECK_FIRST names not in registry: {missing}"
    head = {name: reg[name] for name in _CHECK_FIRST}
    tail = {name: v for name, v in reg.items() if name not in head}
    return {**head, **tail}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in _registry().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: sql for name, (_fn, sql) in _registry().items() if sql is not None
    }
