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
# ROUND-6 ROTATION (executes VERDICT r05 "Next round" #1):
#   1. all 39 queries whose newest driver row is CORRECTNESS_r02 —
#      the deferred variants lead (q_ann_ivf_multiprobe, q_ann_recall,
#      q_doc_prefix_dedup, q_knn_batch, q_doc_fingerprint,
#      q_bpe_token_stats), then the rest of the r02 cohort;
#   2. round-6 registrations (never driver-checked) — inserted as
#      they land this round;
#   3. the stalest CORRECTNESS_r03 queries filling the ~50 window.
# After this round no registry query's newest driver row predates
# round 3; the r03/r04 cohorts rotate in rounds 7-8.  All 181 stay
# covered every session by the sf0.01 DuckDB-oracle pytest gate.
_CHECK_FIRST = [
    # -- stalest driver rows (newest row is CORRECTNESS_r02)
    "q_ann_ivf_multiprobe",
    "q_ann_recall",
    "q_doc_prefix_dedup",
    "q_knn_batch",
    "q_doc_fingerprint",
    "q_bpe_token_stats",
    "q_events_outliers",
    "q_events_hourly",
    "q_events_sliding",
    "q_events_sessionize",
    "q_events_json",
    "q_events_retention",
    "q_gopher_rules",
    "q_vocab_coverage",
    "q_crossdoc_spans",
    "q_unigram_logprob",
    "q_lexical_diversity",
    "q_tfidf_top_term",
    "q_doc_stats",
    "q_doc_quality",
    "q_lang_id",
    "q_doc_exact_dedup",
    "q_minhash_lsh_buckets",
    "q_simhash",
    "q_token_histogram",
    "q_doc_rolling_hash",
    "q_doc_repetition",
    "q_contamination",
    "q_domain_cap",
    "q_ivf_recall",
    "q_knn_bruteforce",
    "q_label_centroids",
    "q_embedding_neardup",
    "q_embedding_norms",
    "q_kmeans_clusters",
    "q_pq_topk",
    "q_pack_sequences",
    "q_chunk_overlap",
    "q_mixture_sample",
    # -- round-6 registration (never driver-checked)
    "q_key_skew_profile",
    # -- next-stalest (newest row is CORRECTNESS_r03)
    "q_customer_pareto",
    "q17_small_qty_revenue",
    "q20_excess_suppliers",
    "q4_order_priority",
    "q21_waiting_suppliers",
    "q8_market_share",
    "q9_product_profit",
    "q12_service_levels",
    "q22_dormant_customers",
    "q_price_histogram",
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
