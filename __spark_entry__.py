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
# ROUND-10 ROTATION (executes VERDICT r09 "Next round" #1):
#   1. the full r06-stale cohort — all 46 registry queries whose newest
#      driver row is CORRECTNESS_r06;
#   2. round-10 registrations (never driver-checked) — exactly 4, the
#      per-round cap above.
# After this round no registry query's newest driver row predates r07.
_CHECK_FIRST = [
    # -- the 46 queries whose newest driver row is CORRECTNESS_r06
    "q22_dormant_customers",
    "q4_order_priority",
    "q8_market_share",
    "q9_product_profit",
    "q_ann_ivf_multiprobe",
    "q_ann_recall",
    "q_bpe_token_stats",
    "q_chunk_overlap",
    "q_contamination",
    "q_crossdoc_spans",
    "q_customer_pareto",
    "q_doc_exact_dedup",
    "q_doc_fingerprint",
    "q_doc_prefix_dedup",
    "q_doc_quality",
    "q_doc_repetition",
    "q_doc_rolling_hash",
    "q_doc_stats",
    "q_domain_cap",
    "q_embedding_neardup",
    "q_embedding_norms",
    "q_events_hourly",
    "q_events_json",
    "q_events_outliers",
    "q_events_retention",
    "q_events_sessionize",
    "q_events_sliding",
    "q_gopher_rules",
    "q_ivf_recall",
    "q_key_skew_profile",
    "q_kmeans_clusters",
    "q_knn_batch",
    "q_knn_bruteforce",
    "q_label_centroids",
    "q_lang_id",
    "q_lexical_diversity",
    "q_minhash_lsh_buckets",
    "q_mixture_sample",
    "q_pack_sequences",
    "q_pq_topk",
    "q_price_histogram",
    "q_simhash",
    "q_tfidf_top_term",
    "q_token_histogram",
    "q_unigram_logprob",
    "q_vocab_coverage",
    # -- round-10 registrations (never driver-checked)
    "q_semantic_dedup_quality",
    "q_doc_perplexity",
    "q_ngram_novelty",
    "q_lang_kappa",
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
