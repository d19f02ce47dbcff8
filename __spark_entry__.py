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
# ROUND-8 ROTATION (executes VERDICT r07 "Next round" #1):
#   1. the full r04-stale cohort — all 34 registry queries whose newest
#      driver row is CORRECTNESS_r04 (recomputed from the r01–r07
#      artifacts at the start of this round);
#   2. round-8 registrations (never driver-checked) — inserted as they
#      land this round;
#   3. oldest-r05 fills (alphabetical head of the r05 cohort) to bring
#      the window to exactly 50.
# After this round no registry query's newest driver row predates
# round 5; the r05 remainder rotates in round 9.  All stay covered
# every session by the sf0.01 DuckDB-oracle pytest gate.
_CHECK_FIRST = [
    # -- stalest driver rows (newest row is CORRECTNESS_r04)
    "q_bm25_topk",
    "q_bpe_merges",
    "q_bpe_vocab",
    "q_contamination_bloom",
    "q_cumulative_revenue",
    "q_customers_without_orders",
    "q_dedup_audit",
    "q_distinct_segments",
    "q_event_pairs_10min",
    "q_events_dow",
    "q_events_funnel",
    "q_events_gap_fill",
    "q_late_orders_semi",
    "q_latest_event_per_user",
    "q_mod_sample",
    "q_neighbor_degree",
    "q_order_gaps",
    "q_order_qty_profile",
    "q_pivot_user_events",
    "q_point_lookup",
    "q_price_stats",
    "q_priority_remap",
    "q_regex_source_buckets",
    "q_rolling_7day_revenue",
    "q_sanity_bounds",
    "q_semantic_dedup",
    "q_semantic_dedup_smallk",
    "q_set_ops_customers",
    "q_small_quantity_revenue",
    "q_spatial_pairs",
    "q_stratified_sample",
    "q_string_funcs",
    "q_top_orders_per_customer",
    "q_unpivot_metrics",
    # -- round-8 registrations (never driver-checked) land here
    "q_canonicalize_keys",
    "q_ref_integrity",
    "q_pii_redaction",
    "q_incremental_stats",
    "q_bpe_encode",
    "q_bootstrap_ci",
    # -- oldest r05 cohort fills the window to exactly 50
    "q_ann_ivf",
    "q_ann_lsh",
    "q_assoc_rules",
    "q_attribution_window",
    "q_autocorr_daily",
    "q_benford_prices",
    "q_bigram_logprob",
    "q_brand_pagerank",
    "q_centroid_drift",
    "q_char_entropy",
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
