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


# The driver's correctness check records only the FIRST 50 registry
# entries (CORRECTNESS_r01..r09.json each stopped at exactly 50).  Order
# the registry so the queries that most need a fresh green row come first.
#
# TIERING POLICY (round-10 decision, VERDICT r09 "Next round" #8): the
# 50-row window is a DRIVER cap, not a repo choice, so it cannot be
# raised.  Two tiers instead:
#   - driver-rotated tier: every registry query participates in the
#     50-slot rotation; priority = never-driver-checked registrations
#     first, then the stalest cohort (oldest round first, alphabetical
#     within a round; a partially-rotated cohort's remainder leads the
#     next window).  Net-new registrations are capped at 6/round, which
#     bounds the steady-state worst-case driver-row age at
#     ceil(N / 44) rounds (≈6 at 250 queries, ≈5 at 200) — see
#     COVERAGE.md.
#   - pytest backstop tier: ALL registry queries hash-compare against
#     their DuckDB oracles at sf0.01 every session (tests/test_*.py
#     oracle gates) and at sf0.1 at each round close — out-of-window
#     queries are never unverified, only un-refreshed in the driver
#     artifact.
#
# ROUND-11 ROTATION (executes VERDICT r10 "Next round" #1):
#   1. round-11 registrations (never driver-checked) — exactly 4, inside
#      the 6/round cap: the incremental SemDeDup decision plus the three
#      statistics candidates staged in round 10;
#   2. the first 46 (alphabetical) of the 50-query r07-stale cohort —
#      the remainder (q_value_sanity, q_volume_anomaly, q_weighted_sample,
#      q_zorder_cells) leads the round-12 window per the partial-cohort
#      rule above.
# After this round no registry query's newest driver row predates r08
# except that 4-query remainder.
_CHECK_FIRST = [
    # -- round-11 registrations (never driver-checked)
    "q_incremental_semdedup",
    "q_theilsen_trend",
    "q_kendall_qty_disc",
    "q_theil_index",
    # -- the first 46 of the 50 queries whose newest driver row is r07
    "q10_returned_items",
    "q11_important_parts",
    "q13_order_count_histogram",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_part_supplier_variety",
    "q18_large_volume_orders",
    "q19_disjunctive",
    "q1_pricing_summary",
    "q2_min_cost_parts",
    "q3_shipping_priority",
    "q5_local_supplier",
    "q6_forecast_revenue",
    "q7_nation_volume",
    "q_above_avg_balance",
    "q_asof_prev_click",
    "q_bigram_pmi",
    "q_boilerplate_shingles",
    "q_cube_orders",
    "q_dau_mau",
    "q_dedup_cluster_sizes",
    "q_doc_dedup_decisions",
    "q_doc_embedding",
    "q_events_time_rollup",
    "q_events_user_mode",
    "q_events_voxelize",
    "q_exact_quantiles",
    "q_fiducial_cut",
    "q_first_touch",
    "q_grouping_sets",
    "q_incremental_dedup",
    "q_jl_projection",
    "q_key_integrity",
    "q_lang_mismatch",
    "q_linear_quality",
    "q_ngram_jaccard_pairs",
    "q_order_price_ranks",
    "q_paragraph_dedup",
    "q_paragraph_dedup_text",
    "q_price_qty_corr",
    "q_reservoir_per_group",
    "q_rfm_segments",
    "q_rollup_revenue",
    "q_semantic_dedup_2level",
    "q_source_concentration",
    "q_token_drift",
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
