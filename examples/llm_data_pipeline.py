"""End-to-end LLM training-data pipeline demo on this engine.

The extension-surface workflow (BASELINE.json north star), one script:
  1. quality-gate documents: Gopher rule table (token/word-length/stopword/
     repetition rules) plus the scored heuristic filter,
  2. MinHash near-dup candidates -> connected components -> canonical
     keep/drop dedup decision, then leakage-safe train/val/test splits
     from the same decision table and temperature-scaled source mixture
     weights for the training run,
  3. language-ID the survivors,
  4. embedding side: LSH-bucketed near-dup pairs + batched top-k ANN +
     hard-negative mining for contrastive training,
  5. PII-scrub the curated text and emit it as sorted Parquet,
  6. simulate the NEXT ingest: incremental batch-vs-corpus dedup verdicts,
  7. train tokenizer merges (BPE) on the curated corpus.

Run: python examples/llm_data_pipeline.py [sf_dir] [workdir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F

from ubparquet_spark.functions.minhash_dedup import minhash_dedup
from ubparquet_spark.functions.pii import scrub_text
from ubparquet_spark.io import load_table, write_parquet
from ubparquet_spark.operators.pq import ivf_pq_topk
from ubparquet_spark.plans.similarity import q_embedding_neardup, q_knn_batch
from ubparquet_spark.plans.text import q_doc_quality, q_gopher_rules, q_lang_id
from ubparquet_spark.session import get_session


def main(sf_dir: str, workdir: str) -> None:
    spark = get_session("llm-data-pipeline")

    # 1. quality gate: Gopher rule table (hard hygiene rules) AND the
    #    scored heuristic filter — both zero-shuffle per-row scans
    rules = q_gopher_rules(spark, sf_dir)
    keep_rules = rules.filter(F.col("keep") == 1).select("doc_id")
    quality = q_doc_quality(spark, sf_dir)
    keep_quality = quality.filter(F.col("quality_score") > 0.15).select("doc_id")
    # one scan for both numbers — separate .count() calls would recompute
    # the full rule table per action
    n_total, n_rules = rules.agg(
        F.count(F.lit(1)), F.sum("keep")
    ).collect()[0]
    print(
        f"quality gate: {n_rules} / {n_total} pass Gopher rules,"
        f" {keep_quality.count()} pass the scored filter"
    )

    # 2. near-dup dedup, the 100 TB-shaped route: MinHash band keys ->
    #    within-bucket candidate pairs (capped) -> exact-Jaccard verify of
    #    candidates only -> connected components -> canonical keep/drop
    docs = load_table(spark, sf_dir, "documents")
    decisions = minhash_dedup(docs, jaccard_threshold=0.5)
    n_drop = decisions.filter(~F.col("is_canonical")).count()
    print(f"dedup: dropping {n_drop} near-duplicate docs")

    # 2b. leakage-safe splits from the SAME decision table: every doc
    #     takes its cluster representative's split, so a near-dup pair
    #     can never straddle train/test
    from ubparquet_spark.plans.text import leakage_safe_split, mixture_weights

    splits = leakage_safe_split(decisions)
    split_dist = {r["split"]: r["n"] for r in
                  splits.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    print(f"leakage-safe splits: {split_dist}")

    # 2c. temperature-scaled source mixture for the training run
    mix = mixture_weights(docs).orderBy(F.desc("weight")).limit(3).collect()
    print("mixture weights (top-3 sources):",
          [(r.source, r.weight, r.epochs) for r in mix])

    # 3. language distribution of the curated set
    langs = q_lang_id(spark, sf_dir)
    print("lang-ID confusion rows:", langs.count())

    # 4. embeddings: near-dup audit + batched ANN + the composed
    #    compressed-index search (IVF cells prune rows, PQ codes shrink
    #    bytes — the 100 TB retrieval path)
    from ubparquet_spark.plans.similarity import q_hard_negatives

    emb_dups = q_embedding_neardup(spark, sf_dir)
    knn = q_knn_batch(spark, sf_dir)
    hard_neg = q_hard_negatives(spark, sf_dir)
    print(f"hard negatives mined (contrastive prep): {hard_neg.count()}")
    emb = load_table(spark, sf_dir, "embeddings")
    query_vec = [float(v) for v in emb.orderBy("vec_id").first()["embedding"]]
    ivfpq = ivf_pq_topk(emb, query_vec, n_cells=8, probes=2, topk=5)
    print(
        f"embedding near-dup pairs: {emb_dups.count()}; ANN rows: {knn.count()};"
        f" IVF-PQ top-5: {[r.vec_id for r in ivfpq.collect()]}"
    )

    # 5. final curated output: rule-passing, quality-passing, canonical
    #    docs, with PII scrubbed from the text that ships
    curated = scrub_text(
        docs.join(keep_rules, "doc_id")
        .join(keep_quality, "doc_id")
        .join(decisions.filter(F.col("is_canonical")).select("doc_id"), "doc_id"),
        with_counts=False,
    )
    out = f"{workdir}/curated_documents"
    write_parquet(curated, out, sort_within_partitions_by=["doc_id"])
    n = spark.read.parquet(out).count()
    print(f"curated set written: {n} docs -> {out}")

    # 6. the NEXT nightly ingest: dedup an incoming batch against the
    #    curated corpus without re-deduplicating the corpus (mod split
    #    stands in for the new crawl)
    from ubparquet_spark.functions.incremental import incremental_dedup

    corpus = spark.read.parquet(out)
    # the next crawl arrives with ITS OWN id space — offset the simulated
    # batch ids so they are disjoint from the corpus ids, as
    # incremental_dedup's contract requires (overlapping ids would pair a
    # doc with itself through the band join)
    batch = docs.filter(F.col("doc_id") % 10 == 7).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"), "text"
    )
    verdicts = incremental_dedup(batch, corpus.select("doc_id", "text"))
    dist = {r["verdict"]: r["n"] for r in
            verdicts.groupBy("verdict").agg(F.count(F.lit(1)).alias("n")).collect()}
    print(f"incremental ingest verdicts: {dist}")

    # 6b. the same arrival, SEMANTICALLY: assign the batch's embeddings to
    #     the corpus's FROZEN centroids and ε-ball only against existing
    #     cell members (round 11 — the incremental SemDeDup decision; in
    #     production the centroids + corpus cell index are trained/built
    #     once per corpus snapshot and cached)
    from ubparquet_spark.functions.incremental import (
        corpus_cell_index,
        incremental_semdedup,
    )
    from ubparquet_spark.operators.kmeans import kmeans_fit

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(
        F.col("embedding").isNotNull()
    )
    vec_batch = emb.filter(F.col("vec_id") % 10 == 7).select(
        (F.col("vec_id") + 10_000_000).alias("vec_id"), "embedding"
    )
    vec_corpus = emb.filter(F.col("vec_id") % 10 != 7).select(
        "vec_id", "embedding"
    )
    cents = kmeans_fit(vec_corpus, k=8, rounds=2)
    cell_idx = corpus_cell_index(vec_corpus, cents).localCheckpoint()
    sem = incremental_semdedup(
        vec_batch, vec_corpus, cents, corpus_cells=cell_idx
    )
    sem_dist = {r["verdict"]: r["n"] for r in
                sem.groupBy("verdict").agg(F.count(F.lit(1)).alias("n")).collect()}
    print(f"incremental SEMANTIC verdicts: {sem_dist}")

    # 7. tokenizer induction on the curated text: 3 BPE merge rounds from
    #    the word-frequency table (one corpus shuffle, vocab-bounded rounds)
    from ubparquet_spark.plans.text import _bpe_train

    with tempfile.TemporaryDirectory() as bpe_dir:
        write_parquet(curated, f"{bpe_dir}/documents.parquet")
        merges, _words = _bpe_train(spark, bpe_dir)
    print("BPE merges:", [(m[1], m[2]) for m in merges])
    print("pipeline OK")


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    wd = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp()
    main(sf, wd)
