"""Shuffle-budget regression guard.

Every query below has a recorded maximum number of shuffle Exchanges —
the plan property that actually matters at 100 TB (each Exchange is a
full re-materialization of the stream through the shuffle service). A
refactor that silently adds an Exchange (lost exchange reuse, a
broadcast that fell back to shuffle, an accidental repartition) fails
here before it ships, the same way the oracle suite catches value
regressions.

Budgets are the CURRENT plan's count — they may be lowered, never raised
without a written justification in the diff.
"""

from __future__ import annotations

import re

import pytest

SHUFFLE_BUDGETS = {
    # scan -> partial agg -> final agg: the canonical single-shuffle query
    "q1_pricing_summary": 1,
    "q_events_hourly": 1,
    "q_events_sessionize": 1,
    "q_cumulative_revenue": 1,
    "q_price_qty_corr": 1,
    "q_token_histogram": 1,
    "q_doc_exact_dedup": 1,
    "q_minhash_lsh_buckets": 1,
    "q_domain_cap": 1,
    # pure per-row maps: zero shuffles, the whole point of the shape
    "q_gopher_rules": 0,
    "q_simhash": 0,
    "q_jl_projection": 0,
    "q_linear_quality": 0,
    # scan-side hash gate, one audit aggregation
    "q_weighted_sample": 1,
    # zero-shuffle codegen vectorizer
    "q_doc_embedding": 0,
    # grid-bucket 27-cell equi-join: ONE shuffle on the cell key
    "q_spatial_pairs": 1,
    # Morton key is a narrow map; one rollup shuffle
    "q_zorder_cells": 1,
    # token counts + totals-agg branch + TakeOrdered (not an Exchange)
    "q_token_drift": 3,
    # RAISED 3 -> 12 (round-6): the three NTILE(4)s over the fact-grain
    # USER table were unpartitioned single-task window sorts — each
    # quartile now rides operators/ranks.ranked (range exchange +
    # n_tasks-row offsets) off ONE checkpointed per-user artifact, plus
    # the three user-keyed joins back. More exchanges, every one bounded
    "q_rfm_segments": 12,
    # rank-over-group plans: WindowGroupLimit pushes the top-k map-side
    # (asserted in test_plans_physical), so the single exchange carries at
    # most k rows per (group, mapper)
    "q_reservoir_per_group": 1,
    "q_boilerplate_shingles": 2,
    # segment shuffle (keep decision rides the same exchange) + doc rollup
    "q_paragraph_dedup": 2,
    "q_paragraph_dedup_text": 2,
    # round-8 additions. PII: one scan + one source rollup
    "q_pii_redaction": 1,
    # two deltas each partial-agg to state rows + the merge agg reuse
    "q_incremental_stats": 2,
    # word-table groupBy + per-doc rollup (the vocab join is broadcast)
    "q_bpe_encode": 2,
    # parallelizing repartition + replica groupBy(b) + the B-row final agg
    "q_bootstrap_ci": 3,
    # five FK edges × (child key groupBy + parent distinct + the 1-row
    # final collapse) — every exchange carries distinct keys or one row,
    # never child fact rows twice
    "q_ref_integrity": 15,
    # ONE keyed exchange: the canonical-row window rides it
    "q_canonicalize_keys": 1,
    # bloom survivors join bench + doc rollup (the filter itself is literal)
    "q_contamination_bloom": 2,
    # bigram counts + unigram/total agg branches feeding broadcasts +
    # TakeOrdered top-k (which is not an Exchange)
    "q_bigram_pmi": 5,
    # band join + jaccard-verify melt/regroup + exact-hash join + verdicts
    "q_incremental_dedup": 8,
    # broadcast-join plans: dims broadcast, ONE fact shuffle at most
    "q_point_lookup": 1,
    "q_knn_bruteforce": 1,
    "q_ann_lsh": 1,
    "q3_shipping_priority": 3,
    "q_contamination": 3,
    # distribution-based exact quantiles: ONE fused explode pass on the
    # KEYED blocked_cumsum (round-6: a per-key ordered window put a
    # low-cardinality key's whole near-unique distribution in ONE task;
    # the blocked form range-partitions (key, value) so every sort is
    # task-bounded — and with a checkpoint per pass, fusing the two
    # columns halved the passes, re-flipping the round-3 A/B). The
    # exchanges are the artifact-scan window branch + offset branch +
    # the _pid-keyed window, each tiny or task-bounded.
    # RAISED 5 → 7 (round 12, justified): fuse_distribution — the
    # distribution groupBy rides the blocked range exchange (its hash
    # exchange is gone) and the checkpoint that hid the slice behind a
    # LogicalRDD is removed, so the static plan counts the one range
    # exchange once per consumer subtree. Executed adaptive plan shows
    # ONE ReusedExchange (sf0.1): physical shuffles went DOWN by one.
    "q_exact_quantiles": 7,
    # round-4 additions: recorded at registration
    "q_yoy_growth": 2,            # year rollup + 7-row lag window
    "q_interarrival_stats": 2,    # (user,type) lag window + type rollup
    # RAISED 2 -> 7 (round-6): vocabulary ranks ride operators/ranks
    # (range exchange + offset branch) instead of a single-task global
    # ROW_NUMBER window over the type inventory
    "q_zipf_fit": 7,
    "q_copurchase_pairs": 2,      # distinct (order,brand) + pair counts
    # RAISED 3 -> 6 (round-6 blocked_cumsum rewire): the near-unique
    # cents distribution no longer rides a single-task global window —
    # the lazy plan holds the checkpointed-artifact scan branches (task
    # offsets + _pid windows) and the clip agg; the distribution groupBy
    # + range exchange are paid ONCE at build (localCheckpoint);
    # LOWERED again when blocked_cumsum totals moved onto the offset
    # window (one per-task consumer, crossJoin dropped)
    "q_winsorized_prices": 5,
    "q_cohort_ltv": 3,            # cohort min + purchase join + rollup
    # q_twap rewired onto operators/segmented.segmented_lead (round 5):
    # [fact (type,bucket) window] + [firsts groupBy — map-side combined to
    # one row per (type,bucket,task)] + [tiny bucket-handoff window] +
    # [final rollup].  Only the first Exchange carries fact rows, and its
    # window tasks are day-bounded — the old budget-1 plan was cheaper on
    # paper but sorted each type's whole history in ONE task.
    "q_twap": 4,
    # round-9 window rotation: budgets recorded mechanically (current
    # plan's count at sf0.01) for every _CHECK_FIRST member that lacked
    # one — the registration invariant below keeps this closed. May be
    # lowered, never raised without written justification.
    "q_leakage_safe_split": 2,
    "q_minhash_jaccard_est": 3,
    # RAISED 3 → 7 (round 11, justified): the exact bracket percentiles
    # moved off Spark's single-task-buffering `percentile` aggregate onto
    # the operators/quantiles value-distribution path — the added
    # exchanges are the distribution groupBy + blocked_cumsum's bounded
    # range/offset exchanges (distinct-value grain), replacing an O(group
    # rows)-in-one-task buffer that was the suite's last fact-grain
    # single-task percentile. Results identical; wall a wash at sf0.1.
    # RAISED 7 → 9 (round 12, justified): fuse_distribution removed the
    # checkpoint that hid the blocked slice behind a LogicalRDD, so the
    # STATIC plan now shows the one range exchange in both consumer
    # subtrees (offset branch + final join). Physically it is ONE
    # shuffle: the executed adaptive plan carries exactly one
    # ReusedExchange (verified at sf0.1), and the hash(distribution)
    # exchange is GONE — strictly fewer physical shuffles than round 11.
    "q_sketch_stats": 9,
    "q_snapshot_diff": 2,
    "q12_service_levels": 1,
    "q17_small_qty_revenue": 2,
    "q20_excess_suppliers": 7,
    "q21_waiting_suppliers": 3,
    "q22_dormant_customers": 2,
    "q4_order_priority": 1,
    "q8_market_share": 3,
    "q9_product_profit": 1,
    "q_ann_ivf_multiprobe": 2,
    "q_ann_recall": 2,
    # round-9 registrations: recorded at registration
    # daily (type, day) cents rollup + the per-type collect for the
    # bounded-artifact EWMA fold
    "q_ewma_daily": 2,
    # 1-row split point + early bounds + (type, bin) counts + the
    # 10-bin-artifact type collapse (+ AQE reuse slack)
    "q_psi_drift": 5,
    # ONE (type, day) rollup; the trailing window rides a second keyed
    # exchange over the day-grain artifact
    "q_partition_completeness": 2,
    # distinct (order, brand) + pair counts; the triangle joins run over
    # the checkpointed ≤C(|brands|,2)-row edge artifact (its own scan
    # branches + three 1-row collapses)
    "q_triangle_count": 8,
    # single brand-keyed partial-aggregatable shuffle (part broadcast)
    "q_price_elasticity": 1,
    # (band, key) exchange shared by the cap window and the self-join
    # (identical subtrees) + the pair distinct
    "q_simhash_neardup": 3,
    # round-6: gap distribution cumsum rewired onto blocked_cumsum —
    # no single-task window over the unbounded gap_s domain (settled at
    # 4 once totals moved onto the offset window)
    "q_time_to_convert": 4,
    "q_concurrent_sessions": 2,   # session window + cell-join pair rollup
    "q_bm25_topk": 5,             # postings + df/stats broadcast branches
    "q_centroid_drift": 5,        # (label,par,dim) + collect + counts
    "q_embedding_outliers": 6,    # centroid + dists + stats + final rollup
    # iterative showcase: ONE corpus aggregation (checkpointed), then each
    # of the 3 unrolled power iterations shuffles only the ≤C(brands,2)-row
    # edge/rank artifacts — per-iteration exchanges are the honest cost
    # model of distributed PageRank (Pregel shape), tiny here by design
    "q_brand_pagerank": 19,
    # multi-stage pipelines (documented in BENCHNOTES): still bounded.
    # q_semantic_dedup is the scale-true k ∝ n plan since round 4 (train
    # rounds + sized/capped cell self-join); the fixed-k bit-parity form
    # keeps its old budget under the _smallk name.
    # RAISED 10 -> 21 / 12 -> 22 (round-11, justification): the k <= 128
    # Lloyd training now runs LAZILY inside the query's single action
    # (plans/similarity.lazy_lloyd_cents) instead of as per-round driver
    # collect jobs, so the training exchanges that previously executed in
    # SEPARATE, budget-invisible jobs are now counted in the one returned
    # plan. End-to-end exchanges are unchanged (moved, not added); every
    # new counted exchange carries a k-row/1-row centroid artifact, never
    # corpus rows. Measured best-of-3 at sf0.1: 5.5 s -> 4.2 s
    # (q_semantic_dedup), 5.3 s -> 4.3 s (quality).
    "q_semantic_dedup": 21,
    "q_semantic_dedup_smallk": 10,
    "q_semantic_dedup_quality": 22,
    # LOWERED 6 -> 4 (round-6): rank + running total fused into ONE
    # blocked_cumsum pass whose checkpoint truncates the lazy plan
    "q_vocab_coverage": 4,
    "q5_local_supplier": 6,
    # round-5 additions: recorded at registration
    # fact (user) lag window + matrix groupBy + tiny artifact window
    "q_event_transitions": 3,
    # bigram-bucket counts + 1-row model collapse; scoring is map-side
    "q_dsir_weights": 2,
    # post-checkpoint plan: horizon agg + censor histogram + KM window
    # (the checkpointed (t,d1) artifact itself costs the user groupBy +
    # histogram exchanges exactly once, at build)
    "q_survival_km": 3,
    # df window + per-doc rank window + prefix self-join + pair distinct
    # + two candidate-side set joins. RAISED 6 → 11 (round-5 100× stress):
    # the old plan let Spark broadcast the corpus-proportional prefix
    # index and the shingle-set sides — the driver OOM'd building the
    # broadcast at 100×. All three joins are now pinned shuffle_hash, so
    # the broadcasts became key-partitioned Exchanges: more exchanges on
    # paper, but every one is bounded (prefix index rides the token key,
    # verify joins ride doc keys) and none materializes on the driver.
    "q_setsim_prefix_join": 11,
    # 1-row total collapse + per-doc score rollup; the two ≤K-row model
    # tables are built by one tokenize shuffle each, materialized once
    # (localCheckpoint), and enter the plan as broadcasts
    "q_bigram_logprob": 2,
    # posexplode -> ONE dim-keyed rollup (map-side partials collapse
    # n*d rows to d per mapper); zero joins
    "q_embedding_dim_audit": 1,
    # (band,bucket) cap window on each join side (identical subtrees —
    # AQE's stage cache runs the banding shuffle once at runtime) +
    # cross-band pair distinct + the per-anchor rank window
    "q_hard_negatives": 4,
    # the |sources|-row per-source aggregate is built by one corpus
    # shuffle, materialized once (localCheckpoint), and consumed by both
    # branches; the lazy plan holds only the 1-row total collapse
    "q_mixture_weights": 1,
    # token-set fingerprint groupBy: one shuffle + the single-distinct
    # rewrite's second aggregate level
    "q_normalized_dedup": 2,
    # one bin groupBy over a zero-shuffle scoring map
    "q_quality_calibration": 1,
    # two exact_quantiles passes (each on the keyed blocked_cumsum —
    # RAISED 7 -> 9 with the round-6 rewire, same justification as
    # q_exact_quantiles) + the final outlier-count groupBy; quantile
    # artifacts come back as BroadcastExchanges, not shuffles
    "q_robust_outliers_mad": 9,
    # lexical branch: posting groupBy + df/stats broadcast branches + doc
    # rollup; dense branch is a zero-shuffle map; both pools TakeOrdered
    # and fused by a <=2*RRF_POOL-row join
    "q_hybrid_rrf": 5,
    # round-5 fourth batch: recorded at registration
    # ONE user-keyed exchange: the flip/lag windows, the run groupBy
    # (subset rule) and the closing lead window all ride it
    "q_user_state_history": 1,
    # user range window + the 2-row touch-type rollup
    "q_attribution_window": 2,
    # zero shuffles until the per-source rollup (the 26-letter histogram
    # and the entropy fold are per-row codegen)
    "q_char_entropy": 1,
    # ranked([]) range repartition (the only fact-row exchange) + the
    # n_tasks-row offset-table windows + the 10-row decile rollup
    "q_price_deciles": 5,
    # distinct names + shuffle_hash block join (both sides exchange on
    # the block key) + pair rollup + block-count branch + left join
    "q_editdist_pairs": 6,
    # round-5 fifth batch: recorded at registration
    # checkpointed order-grain basket sets feed singles + pairs; metric
    # joins touch the TakeOrdered top-N + broadcast brand counts only
    "q_assoc_rules": 4,
    # one (type, day) corpus groupBy; every window runs over the
    # bounded daily artifact
    "q_cusum_changepoint": 2,
    # broadcast-scored brute pass; both rank windows share the ONE qid
    # exchange; the per-qid rollup rides it too
    "q_matryoshka_recall": 1,
    # round-5 sixth batch: recorded at registration
    # hash gates are scan-side maps — only ~f of each table reaches the
    # join exchange; distinct-agg second level is the other Exchange
    "q_consistent_sample": 2,
    # RAISED 3 → 6 at registration polish: the (source, token) counts now
    # pass a broadcast-leftsemi top-K gate BEFORE their groupBy, so that
    # exchange carries O(top-K occurrences) instead of the full
    # source×vocabulary product — the extra exchanges are the ≤K-row
    # artifact collapses, each tiny; the corpus-grain exchanges are the
    # source totals and the (unavoidable) vocabulary count
    "q_source_kl_divergence": 6,
    # (source, token) distinct pass + source rollup + the 1-row
    # regression collapse over the ≤|sources|-row point set
    "q_heaps_fit": 3,
    # RAISED 6 → 22 (round 11, justified): one aggregation branch per
    # profiled column (11 columns × [value-grain partial-distinct
    # exchange + 1-row final collapse]) replacing the fused typed
    # aggregate + ONE long-format (column, value-string) shuffle. The
    # exchange COUNT went up but the bytes went DOWN: each branch
    # shuffles only its own column's distinct NATIVE values (no string
    # cast, no column tag, no 11-way explode), and the per-branch final
    # exchanges are 1-row. Measured 4.61 s → 2.14 s best-of-3 at sf0.1;
    # still NO Expand (pinned in test_profile.py).
    "q_profile_lineitem": 22,
    # ONE corpus (lang, source) groupBy (checkpointed ≤100-row table);
    # margins/grid/fold all run over bounded artifacts
    "q_chi2_lang_source": 5,
    # round-6 registration: fact groupBy to key counts + the frequency
    # histogram's blocked_cumsum branches (artifact scans, _pid window,
    # tiny offsets) + the 1-row final collapse
    "q_key_skew_profile": 4,
    # round-6 (2 -> 4): both samples' CDFs now ride
    # blocked_cumsum over the near-unique cents domain (bounded _pid
    # windows + offset branch) and the argmax is a struct-max aggregate
    # instead of a second global-sort row_number window
    "q_ks_test": 4,
    # digit groupBy + 1-row total broadcast
    "q_benford_prices": 2,
    # per-customer rollup + ranked([]) range repartition (the only
    # fact-grain exchanges) + the n_tasks-row offset windows + 1-row sums
    "q_gini_revenue": 7,
    # checkpointed (source, token) distinct feeds sizes + both join
    # sides; the token self-join fans out ≤C(|sources|,2) per token
    "q_source_overlap": 5,
    # one (type, day) corpus groupBy; lag + Pearson sums over the
    # bounded daily artifact
    "q_autocorr_daily": 4,
    # vocab token groupBy + 1-row map agg + ranked() (range exchange +
    # offset windows) + final (lang, bucket) rollup
    "q_doc_perplexity": 9,
    # train-set distinct + doc rollup measure 2 (AQE broadcasts the
    # gkey join at test sf); 4 leaves room for the co-partitioned
    # shuffle-join both-sides exchanges once the train set outgrows a
    # broadcast at real scale
    "q_ngram_novelty": 4,
    # one (lang, pred) confusion shuffle (checkpointed), then marginal
    # rollups + 1-row reductions over the tiny artifact
    "q_lang_kappa": 5,
    # round-10 rotation fills: measured current counts for the r06-stale
    # cohort entering the driver window (the _CHECK_FIRST invariant).
    # Zero-shuffle rows are pure per-row map plans; 1 is the canonical
    # scan -> partial -> final agg shape.
    "q_bpe_token_stats": 0,
    "q_chunk_overlap": 0,
    "q_crossdoc_spans": 3,
    "q_customer_pareto": 3,
    "q_doc_fingerprint": 0,
    "q_doc_prefix_dedup": 1,
    "q_doc_quality": 0,
    "q_doc_repetition": 0,
    "q_doc_rolling_hash": 0,
    "q_doc_stats": 1,
    "q_embedding_neardup": 3,
    "q_embedding_norms": 1,
    "q_events_json": 1,
    "q_events_outliers": 1,
    "q_events_retention": 4,
    "q_events_sliding": 1,
    # coarse+fine quantizer training, probe ranking, brute-force twin,
    # and the recall join — the harness measures the INDEX, so it pays
    # both pipelines' exchanges
    "q_ivf_recall": 9,
    "q_kmeans_clusters": 1,
    "q_knn_batch": 1,
    "q_label_centroids": 1,
    "q_lang_id": 1,
    "q_lexical_diversity": 0,
    "q_mixture_sample": 1,
    "q_pack_sequences": 4,
    "q_pq_topk": 0,
    "q_price_histogram": 1,
    # tf (doc,token) rollup + df branch + totals + argmax join
    "q_tfidf_top_term": 5,
    "q_unigram_logprob": 2,
    # round-11 registrations. incremental semdedup: corpus cell-size
    # window + cell-keyed pair join + vec_id rollup + exact-index distinct.
    # RAISED 4 -> 34 (round-11, same justification as q_semantic_dedup):
    # the frozen-quantizer Lloyd training moved INTO the plan
    # (lazy_lloyd_cents), and the trained 1-row centroid artifact feeds
    # BOTH frozen assignments (batch + corpus index), so the bounded
    # training exchanges are counted twice in plan text while executing
    # once at runtime (reused broadcast). Every added exchange is k-row/
    # 1-row centroid-grain. Measured best-of-3 at sf0.1: 6.1 s -> 3.8 s.
    "q_incremental_semdedup": 34,
    # daily artifact shuffle + bounded self-join + rank branches
    "q_theilsen_trend": 4,
    # one (x, y) cell shuffle + bounded-grid self-join + marginal branches
    "q_kendall_qty_disc": 6,
    # ONE customer-grain shuffle + the 1-row reduce
    "q_theil_index": 2,
    # round-11 rotation fills (current plan counts, recorded as the
    # window rotated per the tiering policy — each may be lowered,
    # never raised without written justification)
    "q10_returned_items": 2,
    "q11_important_parts": 3,
    "q13_order_count_histogram": 2,
    "q14_promo_revenue": 1,
    "q15_top_supplier": 3,
    "q16_part_supplier_variety": 2,
    "q18_large_volume_orders": 1,
    "q19_disjunctive": 1,
    "q2_min_cost_parts": 1,
    "q6_forecast_revenue": 1,
    "q7_nation_volume": 1,
    "q_above_avg_balance": 2,
    "q_asof_prev_click": 1,
    "q_cube_orders": 1,
    "q_dau_mau": 4,
    "q_dedup_cluster_sizes": 4,
    "q_doc_dedup_decisions": 2,
    "q_events_time_rollup": 1,
    "q_events_user_mode": 3,
    "q_events_voxelize": 3,
    "q_fiducial_cut": 1,
    "q_first_touch": 2,
    "q_grouping_sets": 1,
    # five FK edges through the shared ref-integrity machinery — the
    # q_ref_integrity budget class (distinct keys / 1-row collapses only)
    "q_key_integrity": 12,
    "q_lang_mismatch": 0,
    # shingle-pair pipeline: band shuffle + per-pair melt/regroup chain,
    # every stage keyed and bounded by the band-bucket cap
    "q_ngram_jaccard_pairs": 7,
    "q_order_price_ranks": 4,
    "q_rollup_revenue": 1,
    "q_semantic_dedup_2level": 1,
    "q_source_concentration": 2,
    # round-12 window rotation: budgets recorded mechanically (current
    # plan's count at sf0.01) for every newly-windowed _CHECK_FIRST
    # member that lacked one — same policy as the round-9 block above.
    "q_ann_ivf": 2,
    "q_bpe_merges": 0,  # driver merge loop; the plan is the final map
    "q_bpe_vocab": 1,
    "q_customers_without_orders": 1,
    "q_dedup_audit": 1,
    "q_distinct_segments": 1,
    "q_event_pairs_10min": 0,  # bucket self-join broadcasts at sf0.01
    "q_events_dow": 1,
    "q_events_funnel": 8,
    "q_events_gap_fill": 2,
    "q_late_orders_semi": 1,
    "q_latest_event_per_user": 1,
    "q_mod_sample": 1,
    "q_neighbor_degree": 4,
    "q_order_gaps": 2,
    "q_order_qty_profile": 1,
    "q_pivot_user_events": 2,
    "q_price_stats": 1,
    "q_priority_remap": 1,
    "q_regex_source_buckets": 1,
    "q_rolling_7day_revenue": 1,
    "q_sanity_bounds": 2,
    "q_set_ops_customers": 5,
    "q_small_quantity_revenue": 2,
    "q_value_sanity": 4,
    "q_volume_anomaly": 3,
    # round-6 (settled at 4): the "before" counts ride blocked_cumsum
    # (bounded _pid window + offset branch) — the q_ks_test shape
    "q_mannwhitney_u": 4,
    # LOWERED 14 -> 9 (round-6): each variable's midranks ride
    # blocked_cumsum, whose checkpointed artifact truncates the lazy
    # plan at the materialized distribution — the rank-join exchanges
    # and the 1-row Pearson collapse remain
    # RAISED 9 → 11 (round 12, justified): the near-unique price side's
    # midranks use fuse_distribution (hash(distribution) exchange gone,
    # checkpoint removed) — the static plan double-counts the one range
    # exchange across the two consumer subtrees; executed adaptive plan
    # has ONE ReusedExchange (sf0.1). Physical shuffles net −1.
    "q_spearman_qty_price": 11,
}


def test_check_first_members_have_budgets():
    """Registration invariant (VERDICT r8 #3): every query in the
    driver's correctness window carries a shuffle budget, so a new
    registration (which always enters the window) can't ship without
    its plan pinned against silent Exchange regressions."""
    import __spark_entry__ as entry

    missing = sorted(set(entry._CHECK_FIRST) - set(SHUFFLE_BUDGETS))
    assert not missing, (
        f"_CHECK_FIRST members without a SHUFFLE_BUDGETS entry: {missing}"
    )


def _shuffle_count(df) -> int:
    from .test_plans_physical import plan_text

    # the formatted operator list numbers each node: "(4) Exchange" is a
    # shuffle; "(5) BroadcastExchange" must not match
    return len(re.findall(r"\(\d+\) Exchange\b", plan_text(df)))


@pytest.mark.parametrize("name", sorted(SHUFFLE_BUDGETS))
def test_shuffle_budget(spark, sf_dir, name):
    import __spark_entry__ as entry

    df = entry.queries()[name](spark, sf_dir)
    n = _shuffle_count(df)
    budget = SHUFFLE_BUDGETS[name]
    assert n <= budget, (
        f"{name}: {n} shuffle Exchanges exceeds its recorded budget "
        f"{budget} — a plan regression (or raise the budget with a "
        f"written justification)"
    )


# ---------------------------------------------------------------------------
# Global-window allowlist: unpartitioned ordered windows move the entire
# input to ONE task's sort (WindowExec "No Partition Defined" path) — the
# recurring 100 TB scale defect. After the round-6 blocked_cumsum/ranked
# rewires, the only sanctioned appearances are:
#
#   a. the n_tasks-row offset/total branches inside operators/ranks
#      (order key `_pid`, or orderless totals over the per-task aggregate)
#      and the block-prefix window in plans/packing (order key `block`,
#      input is the corpus/DOC_BLOCK-row block aggregate);
#   b. the explicitly allowlisted queries below, each with a PROVABLY
#      bounded window input (TakeOrdered top-k artifact or a
#      quantization-bounded domain), documented per entry.
#
# Any other unpartitioned window in a registered plan fails this test —
# including a future edit that re-points an allowlisted query's window at
# a non-quantized column without re-justifying it here.
# ---------------------------------------------------------------------------

GLOBAL_WINDOW_ALLOWLIST = {
    # cumulative-share window over the 100-row TakeOrdered Pareto head
    "q_customer_pareto",
    # KM chain windows over the DAY-grain lifetime histogram (~36.5k rows
    # for a century-long corpus at any row count); running-MAX + double
    # ln-fold shapes keep it pinned instead of rewired (plan comment)
    "q_survival_km",
    # rank windows over the two <=RRF_POOL-row retrieval pools
    "q_hybrid_rrf",
    # rank window over the <=BPE_VOCAB_TOP TakeOrdered symbol artifact
    "q_bpe_vocab",
    # probe_rank over the <=IVF_PROBES-row probe set
    "q_ann_ivf_multiprobe",
    # lag window over the YEAR-grain rollup (~7 rows)
    "q_yoy_growth",
    # exact-median rank windows over DAY-domain-bounded artifacts: the
    # daily series (≤366·years rows at ANY event count) and its pairwise
    # slope set (≤D²/2 ≈ 67k at a year) — quantization-bounded inputs,
    # same class as q_survival_km's day-grain histogram
    "q_theilsen_trend",
}

_SANCTIONED_ORDER_KEYS = ("_pid", "block")


def _unpartitioned_windows(df):
    """[(order-col-names, child-output-names)] for every Window node with
    an empty partitionSpec in the optimized logical plan."""
    out = []
    stack = [df._jdf.queryExecution().optimizedPlan()]
    while stack:
        node = stack.pop()
        if node.getClass().getSimpleName() == "Window":
            if node.partitionSpec().isEmpty():
                so = node.orderSpec()
                order = [
                    str(so.apply(i).child().toString()) for i in range(so.size())
                ]
                ch = node.children().head().output()
                child_out = [str(ch.apply(i).name()) for i in range(ch.size())]
                out.append((order, child_out))
        ch = node.children()
        for i in range(ch.size()):
            stack.append(ch.apply(i))
    return out


def _is_sanctioned(order, child_out):
    if order:
        head = order[0].split("#")[0]
        return head in _SANCTIONED_ORDER_KEYS
    # orderless grand total: sanctioned only over the per-task offset
    # aggregate inside operators/ranks (n_tasks rows)
    names = {c.split("#")[0] for c in child_out}
    return bool(names & {"_cnt", "_min_g", "_t", "_pid"} or
                any(n.startswith("_t_") for n in names))


def test_global_window_allowlist(spark, sf_dir):
    import __spark_entry__ as entry

    offenders, stale_allow = {}, set(GLOBAL_WINDOW_ALLOWLIST)
    for name, fn in entry.queries().items():
        wins = [
            (o, c)
            for o, c in _unpartitioned_windows(fn(spark, sf_dir))
            if not _is_sanctioned(o, c)
        ]
        if wins:
            if name in GLOBAL_WINDOW_ALLOWLIST:
                stale_allow.discard(name)
            else:
                offenders[name] = [o for o, _ in wins]
    assert not offenders, (
        "unpartitioned ordered window(s) outside the allowlist — a "
        f"single-task sort at scale: {offenders}"
    )
    assert not stale_allow, (
        "allowlist entries whose plans no longer hold an unpartitioned "
        f"window — remove them to keep the list honest: {stale_allow}"
    )


# ---------------------------------------------------------------------------
# Boundedness canaries for the allowlist (round 7, VERDICT r06 #3): the
# allowlist sanctions each query's unpartitioned window because its
# INPUT is bounded — previously a prose claim. Here each sanctioned
# window's child subtree is materialized at sf0.1 and its row count
# asserted against the documented bound, so an edit that un-bounds an
# allowlisted window (e.g. second-grain instead of day-grain KM) fails
# this test instead of the cluster. Bounds import the plan constants
# where one exists; structural bounds (KM day domain, yoy year rollup)
# are stated literally.
# ---------------------------------------------------------------------------

def _unsanctioned_window_input_counts(spark, df):
    counts = []
    stack = [df._jdf.queryExecution().optimizedPlan()]
    while stack:
        node = stack.pop()
        if (
            node.getClass().getSimpleName() == "Window"
            and node.partitionSpec().isEmpty()
        ):
            so = node.orderSpec()
            order = [
                str(so.apply(i).child().toString()) for i in range(so.size())
            ]
            ch0 = node.children().head().output()
            child_out = [str(ch0.apply(i).name()) for i in range(ch0.size())]
            if not _is_sanctioned(order, child_out):
                ds = spark._jvm.org.apache.spark.sql.classic.Dataset.ofRows(
                    spark._jsparkSession, node.children().head()
                )
                counts.append(ds.count())
        ch = node.children()
        for i in range(ch.size()):
            stack.append(ch.apply(i))
    return counts


def _allowlist_bounds():
    from ubparquet_spark.plans.similarity import IVF_PROBES
    from ubparquet_spark.plans.text import BPE_VOCAB_TOP, RRF_POOL
    from ubparquet_spark.plans.tpch import PARETO_TOP

    return {
        "q_customer_pareto": PARETO_TOP,          # TakeOrdered head
        "q_survival_km": 36_500,                  # day-grain lifetimes, a century
        "q_hybrid_rrf": RRF_POOL,                 # per retrieval pool
        "q_bpe_vocab": BPE_VOCAB_TOP,             # TakeOrdered symbol artifact
        "q_ann_ivf_multiprobe": IVF_PROBES,       # probe set
        "q_yoy_growth": 50,                       # year-grain rollup
        # day-grain daily series (≤366·years) and its pairwise slope set
        # (≤D²/2 ≈ 67k for a year-long corpus) — the allowlist entry's
        # documented quantization bound (the mid-build round-11 commit
        # added the allowlist row but missed this table; repaired here)
        "q_theilsen_trend": 67_000,
    }


@pytest.mark.parametrize("name", sorted(GLOBAL_WINDOW_ALLOWLIST))
def test_allowlisted_window_inputs_are_bounded(spark, name):
    import __spark_entry__ as entry

    bounds = _allowlist_bounds()
    assert set(bounds) == GLOBAL_WINDOW_ALLOWLIST, (
        "allowlist and bounds table diverged — every sanctioned query "
        "needs a numeric window-input bound"
    )
    # deliberately the LARGEST local corpus, not the sf0.01 test default:
    # the bound is a scale claim
    df = entry.queries()[name](spark, "/root/testdata/sf0.1")
    counts = _unsanctioned_window_input_counts(spark, df)
    assert counts, f"{name}: no unsanctioned window found (stale allowlist?)"
    assert max(counts) <= bounds[name], (
        f"{name}: window input has {max(counts)} rows, documented bound "
        f"{bounds[name]} — the boundedness justification no longer holds"
    )
