"""Scale-stress harness: do the heavy text/embedding paths scale linearly?

Builds N× `documents` and `embeddings` sets from sf0.1 by structure-
preserving replication: docs get a replica-salted token stream (tokens
prefixed `r<k>`, doc_ids offset) so cross-replica shingle overlap is ~zero;
embeddings get dimension-rotated vectors with offset labels so
cross-replica cosines are ~random and cell count grows N× at constant
per-cell population. Either way the near-duplicate CLUSTER STRUCTURE of
the original corpus is reproduced exactly once per replica — N× data
should therefore cost ~N× work, not N²×. Both sides (1× and N×) are
written as 32 parquet files so the scan parallelizes by file count like a
real lake (sf0.1's single-file layout serializes all map work onto one
task — see BENCHNOTES.md).

Run: python examples/scale_stress.py [factor] [workdir]
Prints per-query seconds at 1× vs N× and the observed ratio.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F

from ubparquet_spark.io import load_table
from ubparquet_spark.session import get_session

STRESS_QUERIES = (
    "q_gopher_rules",
    "q_doc_exact_dedup",
    "q_minhash_lsh_buckets",
    "q_contamination",
    "q_doc_dedup_decisions",
    # round-3 additions: segment-granularity dedup, batch-vs-corpus dedup,
    # and the BPE distributed fold+inventory (its wordcount is the corpus-
    # scaling part; the merge rounds are vocab-bounded)
    "q_paragraph_dedup",
    "q_incremental_dedup",
    "q_bpe_vocab",
    "q_paragraph_dedup_text",
    "q_contamination_bloom",
    "q_token_drift",
    # round-4 additions over documents. q_bm25_topk deliberately NOT
    # stressed: the replica token salting renames every token, so its
    # literal query-term filter matches nothing and the ratio would
    # measure an empty-postings plan, not BM25 work.
    "q_zipf_fit",
    "q_minhash_jaccard_est",
    # round-5 additions: the provably-complete similarity join (replica
    # salting keeps cross-replica shingle overlap ~zero, so candidate
    # structure replicates once per replica — the linear expectation) and
    # the DSIR scorer (model stays 2×256 buckets at any corpus size;
    # the corpus pass is the scaling part)
    "q_setsim_prefix_join",
    "q_dsir_weights",
    # bigram LM: both model tables cap at top-K so the model build and
    # the broadcast stay constant-size; the transition-grain scoring
    # pass is the scaling part (token salting changes WHICH bigrams are
    # heavy hitters per replica but not the count distribution shape)
    "q_bigram_logprob",
    # q_doc_embedding deliberately NOT stressed: its registered form is
    # bounded by a doc_id filter, so a replicated corpus is pruned at the
    # scan and the ratio would measure filter pushdown, not scaling
    #
    # round-5 third batch: token-set fingerprint dedup (salting renames
    # tokens per replica, so set-fingerprint dup structure replicates once
    # per replica — linear like exact dedup) and the calibration binning
    # (pure map + one bounded-bin groupBy). q_hybrid_rrf deliberately NOT
    # stressed: its lexical branch filters on literal BM25 query terms,
    # which the replica salting renames (same reason as q_bm25_topk).
    "q_normalized_dedup",
    "q_quality_calibration",
    # round-5 fourth batch: one corpus scan (zero-shuffle histogram +
    # per-source rollup) — a linear control for the text side
    "q_char_entropy",
    # round-5 sixth batch: one tokenize shuffle + constant-size top-K
    # model + the sources×K grid fold (salting changes WHICH tokens are
    # top-K per replica, not the count distribution shape)
    "q_source_kl_divergence",
    # round-5 seventh batch: one (lang, source) groupBy; everything else
    # runs over the bounded contingency grid
    "q_chi2_lang_source",
    # round-5 eighth batch: vocabulary-grain checkpoint + ≤C(sources,2)
    # per-token fan-out (source count is constant under replication)
    "q_source_overlap",
    # round-6: rank + coverage cumsum fused into one blocked_cumsum pass;
    # replica token salting grows the vocabulary ~N× — exactly the
    # row-scale type-inventory axis the rewire exists for
    "q_vocab_coverage",
)

# embedding paths: replicas are dimension-ROTATED (cyclic shift by k), so
# norms and within-replica geometry are exact copies while cross-replica
# cosines are ~random — near-dup/SemDeDup cluster structure replicates
# once per replica instead of exploding quadratically across replicas.
# Labels offset per replica: cell count grows N×, per-cell population is
# constant, so the O(n²/cell) stages should scale ~linearly.
EMB_STRESS_QUERIES = (
    "q_centroid_drift",
    "q_embedding_outliers",
    "q_label_centroids",
    "q_kmeans_clusters",
    "q_embedding_neardup",
    "q_semantic_dedup",          # canonical = scale-true k ∝ n (round 4)
    "q_semantic_dedup_smallk",   # fixed-k bit-parity form (quadratic)
    "q_semantic_dedup_2level",
    # round-5: single dim-keyed rollup — the linear control for the
    # embedding side (dim rotation preserves per-dim value multisets
    # only globally, but the n·d explode volume is the scaling part)
    "q_embedding_dim_audit",
    # round-5: bucketed different-label top-k — rotation keeps buckets'
    # per-replica population constant while bucket count grows N×, so
    # the pair stage should scale ~linearly like q_embedding_neardup
    "q_hard_negatives",
    # round-5 fifth batch: fixed 20-query broadcast-scored brute pass —
    # corpus side grows N×, query side constant
    "q_matryoshka_recall",
)


def build_replicated(spark, src_dir: str, dst_dir: str, factor: int) -> None:
    # reuse a complete previous build (replication is deterministic in
    # (src, factor)): all three replicated tables committed (_SUCCESS)
    if all(
        os.path.exists(os.path.join(dst_dir, f"{t}.parquet", "_SUCCESS"))
        for t in ("documents", "embeddings", "events")
    ):
        return
    docs = load_table(spark, src_dir, "documents")
    n = docs.count()
    replicas = [
        docs.select(
            (F.col("doc_id") + k * n).alias("doc_id"),
            # salt every token with the replica id: per-doc shingle
            # structure is preserved, cross-replica overlap is ~zero
            F.regexp_replace(F.concat(F.lit(f"r{k}"), F.col("text")), " ", f" r{k}")
            .alias("text"),
            "lang",
            "source",
            "n_chars",
        )
        for k in range(factor)
    ]
    out = replicas[0]
    for r in replicas[1:]:
        out = out.unionByName(r)
    doc_out = os.path.join(dst_dir, "documents.parquet")
    if os.path.islink(doc_out):  # same stale-symlink guard as embeddings
        os.remove(doc_out)
    out.repartition(32).write.mode("overwrite").parquet(doc_out)
    emb = load_table(spark, src_dir, "embeddings")
    # one scan for all three replication parameters
    n_vec, max_label, dim = emb.agg(
        F.count(F.lit(1)), F.max("label"), F.max(F.size("embedding"))
    ).collect()[0]
    label_stride = max_label + 1  # max+1, not countDistinct: sparse labels
    # rotations repeat past the vector width — past factor=dim each replica
    # ALSO gets a per-block deterministic ±1 sign pattern (splitmix-style
    # bits of the block index): sign flips preserve norms and all
    # within-replica pairwise dot products exactly (s_d² = 1), while
    # cross-block cosines stay ~random — so the 100× corpus keeps constant
    # per-cell population and the linear-work expectation holds
    emb_reps = []
    for k in range(factor):
        r = k % dim
        rot = (
            F.col("embedding")
            if r == 0
            else F.expr(
                f"concat(slice(embedding, {r + 1}, {dim - r}),"
                f" slice(embedding, 1, {r}))"
            )
        )
        block = k // dim
        if block > 0:
            h = (block * 0x9E3779B97F4A7C15) & ((1 << 64) - 1)
            signs = [1 if (h >> (d % 64)) & 1 == 0 else -1 for d in range(dim)]
            rot = F.zip_with(
                rot,
                F.array(*[F.lit(s) for s in signs]),
                lambda x, s: (x * s).cast("float"),
            )
        emb_reps.append(
            emb.select(
                (F.col("vec_id") + k * n_vec).alias("vec_id"),
                rot.alias("embedding"),
                (F.col("label") + k * label_stride).alias("label"),
            )
        )
    out_e = emb_reps[0]
    for r in emb_reps[1:]:
        out_e = out_e.unionByName(r)
    emb_out = os.path.join(dst_dir, "embeddings.parquet")
    # never write through a stale symlink (an earlier layout linked this
    # name to the READ-ONLY source dataset; overwrite would delete through)
    if os.path.islink(emb_out):
        os.remove(emb_out)
    out_e.repartition(32).write.mode("overwrite").parquet(emb_out)
    # events replicate by (event_id, user_id) offset with ts/type/value
    # UNCHANGED: same time range and type cardinality, N× density per
    # (type, day) bucket — exactly the axis that grows at 100 TB and the
    # one segmented_lead's per-bucket windows must absorb linearly
    ev = load_table(spark, src_dir, "events")
    n_ev, max_uid = ev.agg(F.count(F.lit(1)), F.max("user_id")).collect()[0]
    ev_reps = [
        ev.select(
            (F.col("event_id") + k * n_ev).alias("event_id"),
            "ts",
            (F.col("user_id") + k * (max_uid + 1)).alias("user_id"),
            "event_type",
            "value",
            "props",
        )
        for k in range(factor)
    ]
    out_ev = ev_reps[0]
    for r in ev_reps[1:]:
        out_ev = out_ev.unionByName(r)
    ev_out = os.path.join(dst_dir, "events.parquet")
    if os.path.islink(ev_out):  # same stale-symlink guard as above
        os.remove(ev_out)
    out_ev.repartition(32).write.mode("overwrite").parquet(ev_out)
    # the remaining stress queries only touch documents/embeddings/events;
    # link the rest
    for t in (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem",
    ):
        src = os.path.join(src_dir, f"{t}.parquet")
        dst = os.path.join(dst_dir, f"{t}.parquet")
        # lexists, not exists: a dangling symlink from a previous run (the
        # source moved/deleted) returns False from exists() but still blocks
        # os.symlink with FileExistsError — same stale-link hazard the
        # parquet outputs above guard against.
        if os.path.islink(dst) and not os.path.exists(dst):
            os.remove(dst)
        if not os.path.lexists(dst):
            os.symlink(src, dst)


def build_replicated_orders(spark, src_dir: str, dst_dir: str, factor: int) -> None:
    """Replicate orders+lineitem (replacing their symlinks) so the
    rank/percentile/basket queries get a real scaling axis: order and
    customer keys offset per replica (per-customer revenue constant,
    customer count grows N×), line items follow their orders; part and
    supplier stay shared dimensions, so FK joins keep working."""
    if all(
        os.path.exists(os.path.join(dst_dir, f"{t}.parquet", "_SUCCESS"))
        for t in ("orders", "lineitem")
    ):
        return
    orders = load_table(spark, src_dir, "orders")
    max_ok, max_ck = orders.agg(
        F.max("o_orderkey"), F.max("o_custkey")
    ).collect()[0]
    ord_reps = [
        orders.select(
            (F.col("o_orderkey") + k * (max_ok + 1)).alias("o_orderkey"),
            (F.col("o_custkey") + k * (max_ck + 1)).alias("o_custkey"),
            "o_orderstatus",
            "o_totalprice",
            "o_orderdate",
            "o_orderpriority",
        )
        for k in range(factor)
    ]
    out_o = ord_reps[0]
    for r in ord_reps[1:]:
        out_o = out_o.unionByName(r)
    li = load_table(spark, src_dir, "lineitem")
    li_reps = [
        li.select(
            (F.col("l_orderkey") + k * (max_ok + 1)).alias("l_orderkey"),
            "l_partkey",
            "l_suppkey",
            "l_linenumber",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_tax",
            "l_returnflag",
            "l_linestatus",
            "l_shipdate",
        )
        for k in range(factor)
    ]
    out_l = li_reps[0]
    for r in li_reps[1:]:
        out_l = out_l.unionByName(r)
    for name, out in (("orders", out_o), ("lineitem", out_l)):
        dst = os.path.join(dst_dir, f"{name}.parquet")
        if os.path.islink(dst):  # replace the dimension symlink
            os.remove(dst)
        out.repartition(32).write.mode("overwrite").parquet(dst)


# orders/lineitem-side stress (round-5 eighth batch): the two-pass ranked()
# queries (gini / deciles / price ranks) get their distributed-ranking
# scaling evidence; baskets, winsorization, hash-gate sampling and the
# full-table profiler ride the same axis. q_editdist_pairs stays
# unstressed (part is a shared dimension — its name domain is constant).
ORDERS_STRESS_QUERIES = (
    "q_gini_revenue",
    "q_price_deciles",
    "q_order_price_ranks",
    "q_benford_prices",
    "q_consistent_sample",
    "q_winsorized_prices",
    "q_assoc_rules",
    "q_copurchase_pairs",
    "q_profile_lineitem",
    # round-6: Spearman midranks now ride blocked_cumsum over BOTH value
    # distributions (qty bounded, price near-unique = the row-scale rank
    # table axis) + the two rank joins back to line grain
    "q_spearman_qty_price",
)


def time_query(fn, spark, sf_dir: str) -> float:
    best = float("inf")
    for _ in range(2):
        t = time.time()
        fn(spark, sf_dir).collect()
        best = min(best, time.time() - t)
        # shuffle files of a finished run are only dropped after a DRIVER
        # GC lets ContextCleaner collect the dead ShuffleDependencies — a
        # 128 GiB heap may not GC for the whole session, so back-to-back
        # 100× runs piled ~75 GB of dead spill and filled the disk.
        # Outside the timed region.
        spark.sparkContext._jvm.System.gc()
        time.sleep(1)
    return best


# the second-decade run (100×, ~500k docs / ~500k vectors): restricted to
# the dedup PIPELINE queries — the paths a production corpus actually
# funnels through — so the run stays tractable while validating that the
# per-decade ratio trend (1.4-1.6× at 10×) holds a second decade
DEEP_STRESS_QUERIES = {
    "q_doc_dedup_decisions",
    "q_incremental_dedup",
    "q_paragraph_dedup",
    "q_semantic_dedup",
    # round-5 additions (VERDICT r04 #4): the text side's newest pipeline
    # entries get their second decade
    "q_paragraph_dedup_text",
    "q_minhash_jaccard_est",
    # round-5 second batch: the capped-model LM — 100× salted replication
    # grows the vocabulary 100× while BOTH model tables stay top-4096,
    # the design claim the second decade should confirm
    "q_bigram_logprob",
    # round-5 events entries: user-offset replication at 100× = 10M
    # events across 100× more users at constant per-user work — the
    # partition-count axis both lag-window plans must absorb
    "q_event_transitions",
    "q_survival_km",
    # round-5 third batch: second decade for the remaining round-5
    # registrations — the provably-complete similarity join (its prefix
    # index is the candidate-growth axis), the DSIR scorer (model stays
    # 2×256 buckets; corpus pass scales), and the LSH-bucketed negative
    # miner (bucket count grows, per-bucket population constant)
    "q_setsim_prefix_join",
    "q_dsir_weights",
    "q_hard_negatives",
    # round-5 eighth batch: second decade for the two-pass global ranking
    # (15M ranked customers at 100×) — the operators/ranks design claim
    "q_gini_revenue",
    "q_price_deciles",
    # round-6 (VERDICT r05 #5): second decade for the statistics batch +
    # every blocked_cumsum/ranked rewire — the explicit proof that the
    # extra local constant buys sub-linear second-decade ratios
    "q_spearman_qty_price",
    "q_mannwhitney_u",
    "q_autocorr_daily",
    "q_ks_test",
    "q_chi2_lang_source",
    "q_winsorized_prices",
    "q_time_to_convert",
    "q_rfm_segments",
    "q_zipf_fit",
    "q_vocab_coverage",
}

# events-table stress (round 5): q_twap after the segmented_lead rewire —
# type cardinality stays constant while per-(type, day) density grows N×,
# the axis the old whole-type window could not absorb
EVENTS_STRESS_QUERIES = (
    "q_twap",
    "q_interarrival_stats",
    # round-5 additions: user-offset replication grows the number of
    # per-user window partitions N× at constant per-user length
    # (transitions), and the lifetime histogram stays day-domain-bounded
    # while the per-user rollup grows N× (survival)
    "q_event_transitions",
    "q_survival_km",
    # round-5 third batch: replication preserves the value distribution,
    # so the distinct-value distribution (the quantile windows' input)
    # stays ~constant while the scans grow N× — the design claim of the
    # operators.quantiles technique
    "q_robust_outliers_mad",
    # round-5 fourth batch: user-offset replication grows the number of
    # per-user partitions N× at constant per-user history (SCD compaction
    # rides ONE user exchange; attribution rides one user range window).
    # q_price_deciles / q_editdist_pairs are NOT stressed here: orders and
    # part are symlinked, not replicated, so the ratio would measure
    # nothing.
    "q_user_state_history",
    "q_attribution_window",
    # round-5 fifth batch: ts range is constant under replication, so the
    # (type, day) artifact the windows run over stays fixed-size while
    # the corpus groupBy absorbs N× rows
    "q_cusum_changepoint",
    # round-5 seventh batch: replication preserves the value distribution,
    # so the pooled distinct-value domain (the KS window's input) stays
    # ~constant while the distribution groupBy absorbs N× rows
    "q_ks_test",
    # round-5 eighth batch: fixed day×type artifact, one growing groupBy
    "q_autocorr_daily",
    # round-6: the blocked_cumsum rewires' scale proof — the rank-sum
    # test rides the pooled cents distribution (domain ~constant under
    # replication, corpus groupBy grows N×) and the funnel median rides
    # the gap_s distribution (per-user gap structure replicates, so the
    # distinct-gap domain stays ~constant while the user join grows N×)
    "q_mannwhitney_u",
    "q_time_to_convert",
    # round-6: three ranked() quartiles over the user-grain table — user
    # count grows N×, the axis the old unpartitioned NTILE could not absorb
    "q_rfm_segments",
)


def main(factors: list[int], workdir: str, only: set[str] | None = None) -> None:
    from ubparquet_spark.plans import events, packing, similarity, text, tpch

    # one merged registry: stress lists may name queries from ANY plan
    # module (q_robust_outliers_mad lives in tpch, not events)
    registry: dict[str, tuple] = {}
    for mod in (text, similarity, events, tpch, packing):
        registry.update(mod.QUERIES)

    spark = get_session("scale-stress")
    src = "/root/testdata/sf0.1"
    # the 1x baseline is ALSO built via build_replicated (factor=1): both
    # sides then share the 32-file layout and the salted token stream, so
    # the ratio measures pure data scaling — timing 1x on the original
    # single-file corpus would conflate scan parallelism (1 task vs 32)
    # and token-length differences into the headline number
    factors = sorted(set(factors) | {1})
    dirs = {}
    for f in factors:
        d = os.path.join(workdir, f"sf0.1x{f}")
        os.makedirs(d, exist_ok=True)
        build_replicated(spark, src, d, f)
        build_replicated_orders(spark, src, d, f)
        dirs[f] = d

    hdr = " ".join(f"{f'{f}x':>8s}" for f in factors)
    ratio_hdr = " ".join(
        f"{f'{b}/{a}':>8s}" for a, b in zip(factors[:-1], factors[1:])
    )
    print(f"{'query':28s} {hdr}  {ratio_hdr}")
    for names in (STRESS_QUERIES, EMB_STRESS_QUERIES,
                  EVENTS_STRESS_QUERIES, ORDERS_STRESS_QUERIES):
        for name in names:
            if only and name not in only:
                continue
            # past 10×, only the dedup-pipeline queries run (tractability)
            run_factors = [
                f for f in factors if f <= 10 or name in DEEP_STRESS_QUERIES
            ]
            fn, _sql = registry[name]
            fn(spark, "/root/testdata/sf0.001").collect()  # warm codegen
            ts = {f: time_query(fn, spark, dirs[f]) for f in run_factors}
            cells = " ".join(
                f"{ts[f]:8.2f}" if f in ts else f"{'—':>8s}" for f in factors
            )
            ratios = " ".join(
                f"{ts[b] / ts[a]:8.2f}" if a in ts and b in ts else f"{'—':>8s}"
                for a, b in zip(factors[:-1], factors[1:])
            )
            print(f"{name:28s} {cells}  {ratios}")


if __name__ == "__main__":
    arg = sys.argv[1] if len(sys.argv) > 1 else "10"
    wd = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp()
    names = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    main([int(x) for x in arg.split(",")], wd, names)
