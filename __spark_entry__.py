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
    # -- round-9 window: the 40 queries whose newest driver row is
    #    CORRECTNESS_r05 (the stalest cohort after the r08 rotation)
    "q_chi2_lang_source",
    "q_cohort_ltv",
    "q_concurrent_sessions",
    "q_consistent_sample",
    "q_copurchase_pairs",
    "q_cusum_changepoint",
    "q_dsir_weights",
    "q_editdist_pairs",
    "q_embedding_dim_audit",
    "q_embedding_outliers",
    "q_event_transitions",
    "q_gini_revenue",
    "q_hard_negatives",
    "q_heaps_fit",
    "q_hybrid_rrf",
    "q_interarrival_stats",
    "q_ks_test",
    "q_leakage_safe_split",
    "q_mannwhitney_u",
    "q_matryoshka_recall",
    "q_minhash_jaccard_est",
    "q_mixture_weights",
    "q_normalized_dedup",
    "q_price_deciles",
    "q_profile_lineitem",
    "q_quality_calibration",
    "q_robust_outliers_mad",
    "q_setsim_prefix_join",
    "q_sketch_stats",
    "q_snapshot_diff",
    "q_source_kl_divergence",
    "q_source_overlap",
    "q_spearman_qty_price",
    "q_survival_km",
    "q_time_to_convert",
    "q_twap",
    "q_user_state_history",
    "q_winsorized_prices",
    "q_yoy_growth",
    "q_zipf_fit",
    # -- round-9 registrations (never driver-checked)
    "q_ewma_daily",
    "q_psi_drift",
    "q_partition_completeness",
    "q_triangle_count",
    "q_price_elasticity",
    "q_simhash_neardup",
    # -- oldest r06 cohort (alphabetical) fills the window to exactly 50
    "q12_service_levels",
    "q17_small_qty_revenue",
    "q20_excess_suppliers",
    "q21_waiting_suppliers",
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
