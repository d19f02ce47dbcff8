"""Incremental (batch-vs-corpus) deduplication — the production crawl-ingest
flow: a NEW batch of documents is deduplicated against an EXISTING corpus
without re-deduplicating the corpus itself.

Decision semantics per incoming document:

  exact_dup  — its full text hash already exists in the corpus;
  near_dup   — some corpus document shares an LSH band bucket AND the
               exact 3-shingle Jaccard clears the threshold;
  new        — neither.

This composes the same pieces as the full-corpus pipeline
(``functions.minhash_dedup``): band keys from ``plans.text.
minhash_band_keys``, candidate generation as a band-bucket equi-join, and
``verify_pairs_jaccard`` for the exact check — but the join is incoming ×
corpus rather than a self-join, so the work per ingest is

  O(batch tokens) + O(band-bucket matches) + O(verified candidates)

— independent of corpus size except through the (pre-computable, cacheable)
corpus band-key table. At 100 TB the corpus band keys live as a bucketed
table keyed on (band_id, band_key); each nightly batch shuffles only its
own keys to join it.

The bucket cap applies to CORPUS-side buckets: a band bucket shared by more
than ``bucket_cap`` corpus documents is boilerplate, carries no dedup
signal, and would multiply every matching incoming doc by the bucket size —
capped buckets are skipped, erring toward keeping the incoming doc (same
policy as ``lsh_candidate_pairs``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ubparquet_spark.functions.minhash_dedup import verify_pairs_jaccard
from ubparquet_spark.plans.text import minhash_band_keys


def corpus_band_keys(corpus: DataFrame, *, bucket_cap: int = 10_000) -> DataFrame:
    """The corpus's (doc_id, band_id, band_key) table with over-full
    (boilerplate) buckets already dropped — the corpus-side index of
    :func:`incremental_dedup`. Compute it ONCE per corpus snapshot (persist
    or localCheckpoint; at 100 TB store it as a table bucketed on
    (band_id, band_key)) and pass it to every batch via ``corpus_bands`` —
    otherwise each ingest pays a full corpus tokenization pass."""
    w = Window.partitionBy("band_id", "band_key")
    return (
        minhash_band_keys(corpus)
        .withColumn("_n", F.count(F.lit(1)).over(w))
        .filter(F.col("_n") <= bucket_cap)
        .drop("_n")
    )


def corpus_text_hashes(corpus: DataFrame) -> DataFrame:
    """Distinct md5(text) of the corpus — the exact-dup index; same
    precompute-once guidance as :func:`corpus_band_keys`."""
    return corpus.select(F.md5("text").alias("_h")).distinct()


def incremental_dedup(
    incoming: DataFrame,
    corpus: DataFrame,
    *,
    jaccard_threshold: float = 0.5,
    bucket_cap: int = 10_000,
    corpus_bands: DataFrame | None = None,
    corpus_hashes: DataFrame | None = None,
) -> DataFrame:
    """Decision table for ``incoming`` (needs ``doc_id``, ``text``; ids
    MUST be disjoint from ``corpus`` ids — overlapping ids would pair a
    document with itself through the band join): (doc_id, verdict,
    n_matches, best_match) where ``n_matches`` counts Jaccard-verified
    corpus near-matches and ``best_match`` is the lowest matching corpus
    doc id (NULL for new).

    ``corpus_bands`` / ``corpus_hashes`` accept the precomputed outputs of
    :func:`corpus_band_keys` / :func:`corpus_text_hashes`; when omitted
    they are derived from ``corpus`` inline (fine for one-shot use; a
    repeated-ingest loop should precompute so per-batch corpus cost is
    the join probe, not a corpus scan). ``corpus`` itself is still needed
    for Jaccard verification text, but only candidate documents are
    tokenized (semi-join pre-filter in ``verify_pairs_jaccard``)."""
    in_bands = minhash_band_keys(incoming)
    corp_bands = (
        corpus_band_keys(corpus, bucket_cap=bucket_cap)
        if corpus_bands is None
        else corpus_bands
    )
    # shuffle_hash on the BATCH side: the hinted side becomes the hash-map
    # build side, and per-ingest the batch is the bounded table — building
    # over the corpus band keys (which grow with the corpus) would be the
    # OOM-prone shape. Neither side is broadcastable at 100 TB.
    a, b = in_bands.hint("shuffle_hash").alias("a"), corp_bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key")),
        )
        .select(F.col("a.doc_id").alias("src"), F.col("b.doc_id").alias("dst"))
        .distinct()
    )
    both = incoming.unionByName(corpus)
    ver = verify_pairs_jaccard(cand, both, threshold=jaccard_threshold)
    near = ver.groupBy(F.col("src").alias("doc_id")).agg(
        F.count(F.lit(1)).alias("n_matches"),
        F.min("dst").alias("best_match"),
    )
    hashes = corpus_text_hashes(corpus) if corpus_hashes is None else corpus_hashes
    exact = (
        incoming.select("doc_id", F.md5("text").alias("_h"))
        .join(hashes, "_h", "leftsemi")
        .select("doc_id", F.lit(True).alias("_exact"))
    )
    return (
        incoming.select("doc_id")
        .join(near, "doc_id", "left")
        .join(exact, "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("_exact"), F.lit("exact_dup"))
            .when(F.col("n_matches") > 0, F.lit("near_dup"))
            .otherwise(F.lit("new"))
            .alias("verdict"),
            F.coalesce("n_matches", F.lit(0).cast("bigint")).alias("n_matches"),
            F.col("best_match"),
        )
    )


# ---------------------------------------------------------------------------
# Incremental SEMANTIC dedup (round 11, VERDICT r10 "What's missing" #2):
# a new batch of embeddings arrives against an already-SemDeDup'd corpus.
# Re-running the full k ∝ n pipeline (plans/similarity.q_semantic_dedup)
# per ingest would re-train and re-pair the ENTIRE corpus; the incremental
# form mirrors incremental_dedup's batch-vs-corpus contract:
#
#   assign the batch to the FROZEN trained centroids (the corpus's
#   quantizer — operators/kmeans assign path), then ε-ball each incoming
#   vector ONLY against existing corpus members of its cell.
#
# Per ingest the work is O(batch · cell_cap) pair comparisons +
# O(batch · k · d) assignment — independent of corpus size except through
# the (pre-computable, cacheable) corpus cell index, exactly like the
# MinHash flow's corpus band-key table. At 100 TB the corpus cell index
# lives as a table bucketed on cell; each batch shuffles only itself.
#
# The cap applies to CORPUS-side cells (the incremental analogue of the
# band bucket_cap): a cell holding more than ``cell_cap`` corpus vectors
# is quantizer degeneracy, would multiply every incoming vector landing
# in it by the cell size, and is skipped — erring toward keeping the
# incoming vector, the established policy.
# ---------------------------------------------------------------------------


def _with_dvec_norm(assigned: DataFrame) -> DataFrame:
    """Precompute double vector + norm once (the semdedup_keep trick) so
    each pair comparison is pure codegen arithmetic."""
    return assigned.select(
        "vec_id",
        "cell",
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("dvec"),
    ).withColumn(
        "norm",
        F.expr(
            "sqrt(aggregate(zip_with(dvec, dvec, (x, y) -> x * y),"
            " CAST(0 AS DOUBLE), (acc, v) -> acc + v))"
        ),
    )


def _assign_frozen(
    df: DataFrame,
    centroids: list[list[float]] | None,
    centroids_row: DataFrame | None,
) -> DataFrame:
    """``df`` + ``cluster`` under the frozen quantizer: either the Python
    centroid list (literal/BLAS dispatch, the original path) or a lazy
    1-row centroid artifact (``plans.similarity._cents_row`` output) —
    the latter keeps a just-trained quantizer's Lloyd chain and the
    assignment inside ONE Spark action (round 11; bit-identical fold
    arithmetic either way)."""
    if centroids_row is not None:
        from ubparquet_spark.plans.similarity import lazy_assign

        return lazy_assign(df, centroids_row)
    from ubparquet_spark.operators.kmeans import (
        assign_clusters,
        assign_clusters_blas,
    )

    assign = assign_clusters if len(centroids) <= 128 else assign_clusters_blas
    return assign(df, centroids)


def corpus_cell_index(
    corpus: DataFrame,
    centroids: list[list[float]] | None,
    *,
    cell_cap: int | None = None,
    centroids_row: DataFrame | None = None,
) -> DataFrame:
    """The corpus's (vec_id, cell, dvec, norm) index under the FROZEN
    ``centroids``, with over-full cells (> ``cell_cap`` members) already
    dropped. Compute ONCE per corpus snapshot and pass to every batch via
    ``corpus_cells`` — otherwise each ingest pays a corpus assignment
    pass. ``cell_cap=None`` keeps every cell (used by the equivalence
    test; production should cap)."""
    idx = _with_dvec_norm(
        _assign_frozen(
            corpus.select("vec_id", "embedding").filter(
                F.col("embedding").isNotNull()
            ),
            centroids,
            centroids_row,
        ).select("vec_id", F.col("cluster").alias("cell"), "embedding")
    )
    if cell_cap is None:
        return idx
    w = Window.partitionBy("cell")
    return (
        idx.withColumn("_n", F.count(F.lit(1)).over(w))
        .filter(F.col("_n") <= int(cell_cap))
        .drop("_n")
    )


def incremental_semdedup(
    incoming: DataFrame,
    corpus: DataFrame,
    centroids: list[list[float]] | None,
    *,
    threshold: float | None = None,
    cell_cap: int | None = None,
    corpus_cells: DataFrame | None = None,
    centroids_row: DataFrame | None = None,
) -> DataFrame:
    """Decision table for ``incoming`` embeddings (needs ``vec_id``,
    ``embedding``; ids MUST be disjoint from ``corpus`` ids): one row per
    non-NULL incoming vector —

      (vec_id, cell, verdict, n_matches, best_match)

    where verdict is ``exact_dup`` (an identical corpus embedding
    exists — array equality, cell-independent), ``near_dup`` (some
    same-cell corpus vector has rounded cosine >= ``threshold``), else
    ``new``; ``n_matches`` counts ε-ball corpus matches and
    ``best_match`` is the lowest matching corpus vec_id (NULL for new).

    ``centroids`` are the corpus's FROZEN trained centroids — train once
    per corpus snapshot (operators/kmeans.kmeans_fit or the
    q_semantic_dedup Lloyd loop), never per batch. ``corpus_cells``
    accepts the precomputed :func:`corpus_cell_index` output.

    Defaults for ``threshold`` / ``cell_cap`` are the q_semantic_dedup
    constants (SEMDEDUP_THRESHOLD / SEMDEDUP_CELL_CAP)."""
    from ubparquet_spark.plans.similarity import (
        _SEMDEDUP_DIMS,
        SEMDEDUP_CELL_CAP,
        SEMDEDUP_THRESHOLD,
    )
    from ubparquet_spark.plans.tpch import roundn

    if threshold is None:
        threshold = SEMDEDUP_THRESHOLD
    if cell_cap is None:
        cell_cap = SEMDEDUP_CELL_CAP
    inc_nn = incoming.select("vec_id", "embedding").filter(
        F.col("embedding").isNotNull()
    )
    inc = _with_dvec_norm(
        _assign_frozen(inc_nn, centroids, centroids_row).select(
            "vec_id", F.col("cluster").alias("cell"), "embedding"
        )
    )
    corp = (
        corpus_cell_index(
            corpus, centroids, cell_cap=cell_cap, centroids_row=centroids_row
        )
        if corpus_cells is None
        else corpus_cells
    )
    a, b = inc.alias("a"), corp.alias("b")
    pair_dot = F.expr(
        " + ".join(f"(a.dvec[{i}] * b.dvec[{i}])" for i in range(_SEMDEDUP_DIMS))
    )
    cos = roundn(pair_dot / (F.col("a.norm") * F.col("b.norm")), 6)
    near = (
        a.join(
            b,
            (F.col("a.cell") == F.col("b.cell")) & (cos >= F.lit(threshold)),
        )
        .groupBy(F.col("a.vec_id").alias("vec_id"))
        .agg(
            F.count(F.lit(1)).alias("n_matches"),
            F.min(F.col("b.vec_id")).alias("best_match"),
        )
    )
    # exact index: array-equality equi-join (hash of the float array is a
    # fine shuffle key; distinct bounds the corpus side per value)
    exact = (
        inc_nn.join(
            corpus.select("embedding")
            .filter(F.col("embedding").isNotNull())
            .distinct(),
            "embedding",
            "leftsemi",
        )
        .select("vec_id", F.lit(True).alias("_exact"))
    )
    return (
        inc.select("vec_id", "cell")
        .join(near, "vec_id", "left")
        .join(exact, "vec_id", "left")
        .select(
            "vec_id",
            "cell",
            F.when(F.col("_exact"), F.lit("exact_dup"))
            .when(F.col("n_matches") > 0, F.lit("near_dup"))
            .otherwise(F.lit("new"))
            .alias("verdict"),
            F.coalesce("n_matches", F.lit(0).cast("bigint")).alias("n_matches"),
            F.col("best_match"),
        )
    )
