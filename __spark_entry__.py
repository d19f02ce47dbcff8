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
# ROUND-12 ROTATION (executes VERDICT r11 "Next round" #8; no new
# registrations this optimization round, so the never-checked tier is
# empty):
#   1. the 4-query remainder of the r07-stale cohort (the partial-cohort
#      rule: q_value_sanity, q_volume_anomaly, q_weighted_sample,
#      q_zorder_cells — their newest driver row is still r07);
#   2. the first 46 (alphabetical) of the 50-query cohort whose newest
#      driver row is r08 — the remainder (q_stratified_sample,
#      q_string_funcs, q_top_orders_per_customer, q_unpivot_metrics)
#      leads the round-13 window.
# After this round no registry query's newest driver row predates r08
# except that 4-query remainder.
_CHECK_FIRST = [
    # -- r07-stale remainder (partial-cohort rule)
    "q_value_sanity",
    "q_volume_anomaly",
    "q_weighted_sample",
    "q_zorder_cells",
    # -- the first 46 of the 50 queries whose newest driver row is r08
    "q_ann_ivf",
    "q_ann_lsh",
    "q_assoc_rules",
    "q_attribution_window",
    "q_autocorr_daily",
    "q_benford_prices",
    "q_bigram_logprob",
    "q_bm25_topk",
    "q_bootstrap_ci",
    "q_bpe_encode",
    "q_bpe_merges",
    "q_bpe_vocab",
    "q_brand_pagerank",
    "q_canonicalize_keys",
    "q_centroid_drift",
    "q_char_entropy",
    "q_contamination_bloom",
    "q_cumulative_revenue",
    "q_customers_without_orders",
    "q_dedup_audit",
    "q_distinct_segments",
    "q_event_pairs_10min",
    "q_events_dow",
    "q_events_funnel",
    "q_events_gap_fill",
    "q_incremental_stats",
    "q_late_orders_semi",
    "q_latest_event_per_user",
    "q_mod_sample",
    "q_neighbor_degree",
    "q_order_gaps",
    "q_order_qty_profile",
    "q_pii_redaction",
    "q_pivot_user_events",
    "q_point_lookup",
    "q_price_stats",
    "q_priority_remap",
    "q_ref_integrity",
    "q_regex_source_buckets",
    "q_rolling_7day_revenue",
    "q_sanity_bounds",
    "q_semantic_dedup",
    "q_semantic_dedup_smallk",
    "q_set_ops_customers",
    "q_small_quantity_revenue",
    "q_spatial_pairs",
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
