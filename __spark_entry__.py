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
# entries (CORRECTNESS_r01..r04.json each stopped at exactly 50).  Order
# the registry so the queries that most need a fresh green row come first.
#
# ROUND-5 ROTATION (executes VERDICT r04 "Next round" #1, extended to the
# round-5 registrations so every never-driver-checked query gets its
# first row this round):
#   1. the 13 round-4 registrations that have NEVER held a driver row
#      (q_twap leads — its plan was rebuilt this round onto the
#      segmented-lead operator, so it needs the freshest signal);
#   2. q_sketch_stats, promoted this round from rows-only to a full
#      bounded-error hash oracle (exact aggregates + within-bounds
#      booleans vs literal TRUE) — its first hash row;
#   3. the 34 round-5 registrations (never driver-checked);
#   4. the 2 stalest CORRECTNESS_r02 queries that fit the window.
# The remaining 39 r02-stale entries rotate to round 6 (lead with the
# deferred variants q_ann_ivf_multiprobe, q_ann_recall,
# q_doc_prefix_dedup, q_knn_batch, q_doc_fingerprint, then
# q_bpe_token_stats .. q_vocab_coverage); all stay covered every
# session by the sf0.01 DuckDB-oracle pytest gate.
_CHECK_FIRST = [
    # -- never driver-checked (registered round 4)
    "q_twap",
    "q_brand_pagerank",
    "q_minhash_jaccard_est",
    "q_concurrent_sessions",
    "q_yoy_growth",
    "q_copurchase_pairs",
    "q_winsorized_prices",
    "q_cohort_ltv",
    "q_interarrival_stats",
    "q_zipf_fit",
    "q_centroid_drift",
    "q_embedding_outliers",
    "q_time_to_convert",
    # -- first hash row after the bounded-error-oracle promotion
    "q_sketch_stats",
    # -- never driver-checked (registered round 5)
    "q_event_transitions",
    "q_survival_km",
    "q_dsir_weights",
    "q_setsim_prefix_join",
    "q_bigram_logprob",
    "q_leakage_safe_split",
    "q_embedding_dim_audit",
    "q_hard_negatives",
    "q_mixture_weights",
    "q_robust_outliers_mad",
    "q_normalized_dedup",
    "q_quality_calibration",
    "q_hybrid_rrf",
    "q_snapshot_diff",
    "q_user_state_history",
    "q_attribution_window",
    "q_char_entropy",
    "q_price_deciles",
    "q_editdist_pairs",
    "q_assoc_rules",
    "q_cusum_changepoint",
    "q_matryoshka_recall",
    "q_consistent_sample",
    "q_source_kl_divergence",
    "q_heaps_fit",
    "q_profile_lineitem",
    "q_chi2_lang_source",
    "q_ks_test",
    "q_benford_prices",
    "q_gini_revenue",
    "q_source_overlap",
    "q_autocorr_daily",
    "q_mannwhitney_u",
    "q_spearman_qty_price",
    # -- stalest driver rows (newest row is CORRECTNESS_r02)
    "q_ann_ivf",
    "q_ann_lsh",
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
