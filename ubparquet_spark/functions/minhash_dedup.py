"""End-to-end MinHash-LSH dedup: documents → keep/drop decision table.

Glues the pieces that already exist into the canonical large-scale text
dedup flow (the MinHash-LSH pipeline of Broder '97 / Leskovec-Rajaraman-
Ullman ch. 3, as run over web-scale training corpora):

  1. per-doc LSH band keys        (``plans.text.minhash_band_keys``)
  2. within-bucket candidate pairs (equi-join on (band_id, band_key) —
     never all-pairs; bucket cap drops degenerate buckets)
  3. optional exact-Jaccard verification of candidates only (3-token
     shingle sets, ``array_intersect``/``array_union`` — JVM-side)
  4. transitive grouping + canonical pick
     (``functions.dedup_clusters.dedup_groups``)

Scale shape: step 2's shuffle carries (doc_id, 16-byte band key); the
quadratic work is per-bucket and capped. Step 3 re-joins only candidate
doc ids back to text — at real dedup rates (<10 % dups) that's a small
fraction of the corpus. Step 4 is hash-to-min connected components:
rounds = cluster diameter, which for near-dup clusters is tiny.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ubparquet_spark.functions.dedup_clusters import dedup_groups
from ubparquet_spark.plans.text import minhash_band_keys


def lsh_candidate_pairs(
    band_keys: DataFrame, *, bucket_cap: int = 10_000
) -> DataFrame:
    """Distinct (src, dst) doc-id pairs sharing ≥1 LSH band bucket.

    ``bucket_cap`` drops over-full buckets (an all-identical-boilerplate
    bucket at 100 TB would otherwise go quadratic); dropped buckets are
    the uninformative ones, and true near-dup pairs typically co-occur in
    several buckets."""
    # bucket sizes via a window count over the SAME (band_id, band_key)
    # shuffle the join needs — not a separate groupBy branch, which would
    # re-execute the expensive signature subplan a third time; with the
    # window, the a/b join sides are identical subplans and Spark reuses
    # one exchange (signatures computed once). Window partitions are
    # single buckets — bounded by construction.
    w = Window.partitionBy("band_id", "band_key")
    ok = (
        band_keys.withColumn("_n", F.count(F.lit(1)).over(w))
        .filter(F.col("_n") <= bucket_cap)
        .drop("_n")
    )
    a, b = ok.alias("a"), ok.alias("b")
    return (
        # shuffle_hash hint: without it AQE broadcasts one side (legal at
        # test scale, wrong at 100 TB — the band-key table grows with the
        # corpus), and the BroadcastExchange wrapper defeats ReusedExchange,
        # so the expensive signature subplan executes TWICE. With both
        # sides shuffling on (band_id, band_key) the canonical subplans are
        # identical and AQE's exchange reuse computes signatures once
        # (visible in the post-execution adaptive plan; measured 4.0 s →
        # 1.4 s at sf0.1, BENCHNOTES round 3).
        a.join(
            b.hint("shuffle_hash"),
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("src"), F.col("b.doc_id").alias("dst"))
        .distinct()
    )


def _shingle_sets(docs: DataFrame) -> DataFrame:
    """(doc_id, shingles): the distinct 3-token shingle set per doc."""
    return docs.withColumn("toks", F.split("text", " ")).select(
        "doc_id",
        F.array_distinct(
            # toks materialized once (lambda-CSE caveat)
            F.expr(
                "if(size(toks) >= 3,"
                " transform(sequence(1, size(toks) - 2),"
                " i -> array_join(slice(toks, i, 3), ' ')),"
                " array())"
            )
        ).alias("shingles"),
    )


def verify_pairs_jaccard(
    pairs: DataFrame, docs: DataFrame, *, threshold: float
) -> DataFrame:
    """Keep only candidate pairs whose EXACT 3-shingle Jaccard ≥ threshold
    — removes LSH false positives.

    The pair list is melted to (doc_id, pair) rows and joined against the
    tokenized shingle-set table ONCE — a naive per-side join would run the
    tokenization subplan twice and, at scale, shuffle the (huge) shingle
    corpus twice. Tokenization itself runs only for documents that appear
    in some candidate pair (semi-join pre-filter): at real dedup rates
    that is a small fraction of the corpus, so the expensive shingle-set
    construction is proportional to candidates, not corpus size.

    ``pairs`` is referenced three times here (two melt branches + the
    semi-join filter) — it is materialized once via ``localCheckpoint``
    so the candidate-generation subplan (LSH banding) does not re-execute
    per reference. The candidate table is O(duplicate pairs): the same
    magnitude the connected-components step already checkpoints."""
    pairs = pairs.select("src", "dst").localCheckpoint(eager=False)
    ids = pairs.select(F.col("src").alias("doc_id")).unionByName(
        pairs.select(F.col("dst").alias("doc_id"))
    )
    sh = _shingle_sets(docs.join(ids, docs.doc_id == ids.doc_id, "leftsemi"))
    pair = F.struct(F.col("src"), F.col("dst")).alias("pair")
    melted = pairs.select(F.col("src").alias("doc_id"), pair).unionByName(
        pairs.select(F.col("dst").alias("doc_id"), pair)
    )
    joined = melted.join(sh, "doc_id").select(
        "pair",
        F.when(F.col("doc_id") == F.col("pair.src"), F.col("shingles")).alias("_sa"),
        F.when(F.col("doc_id") == F.col("pair.dst"), F.col("shingles")).alias("_sb"),
    )
    # exactly one non-null per (pair, side): any_value(ignoreNulls) gathers
    # the two arrays deterministically
    per_pair = joined.groupBy("pair").agg(
        F.any_value("_sa", True).alias("_sa"),
        F.any_value("_sb", True).alias("_sb"),
    )
    inter = F.size(F.array_intersect("_sa", "_sb")).cast("double")
    union = F.size(F.array_union("_sa", "_sb")).cast("double")
    return (
        per_pair.withColumn(
            "jaccard", F.when(union > 0, inter / union).otherwise(F.lit(0.0))
        )
        .filter(F.col("jaccard") >= threshold)
        .select(
            F.col("pair.src").alias("src"),
            F.col("pair.dst").alias("dst"),
            "jaccard",
        )
    )


def minhash_dedup(
    docs: DataFrame,
    *,
    jaccard_threshold: float | None = 0.5,
    bucket_cap: int = 10_000,
) -> DataFrame:
    """Full decision table for ``docs`` (needs ``doc_id``, ``text``):
    (doc_id, canonical_id, is_canonical). Drop rows where
    ``is_canonical`` is false to dedup the corpus.

    ``jaccard_threshold=None`` skips verification (pure-LSH dedup:
    cheaper, admits LSH false positives into groups)."""
    cands = lsh_candidate_pairs(minhash_band_keys(docs), bucket_cap=bucket_cap)
    if jaccard_threshold is not None:
        cands = verify_pairs_jaccard(cands, docs, threshold=jaccard_threshold)
    # candidate pairs are distinct with src < dst by construction, so the
    # CC symmetrization needs no dedup shuffle
    return dedup_groups(
        cands.select("src", "dst"), docs, "doc_id", assume_distinct=True
    )
