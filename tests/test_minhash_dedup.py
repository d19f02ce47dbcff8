"""End-to-end MinHash-LSH dedup vs a brute-force transitive golden."""

from __future__ import annotations

import itertools

from ubparquet_spark.functions.minhash_dedup import (
    lsh_candidate_pairs,
    minhash_dedup,
    verify_pairs_jaccard,
)
from ubparquet_spark.plans.text import minhash_band_keys

BASE = "the quick brown fox jumps over the lazy dog near the river bank today"
DOCS = [
    (0, BASE),
    (1, BASE),                                      # exact dup of 0
    (2, BASE + " again"),                           # near dup of 0/1
    (3, "completely different words about spark query engines and parquet"),
    (4, "completely different words about spark query engines and parquet"),  # exact dup of 3
    (5, "a lonely singleton document with its own unrelated vocabulary set"),
]
THRESHOLD = 0.5


def _shingles(text: str) -> set[str]:
    toks = text.split(" ")
    return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}


def _golden_groups() -> dict[int, int]:
    """Union-find over brute-force all-pairs exact Jaccard >= THRESHOLD."""
    parent = {d: d for d, _ in DOCS}

    def find(x):
        while parent[x] != x:
            x = parent[x]
        return x

    for (da, ta), (db, tb) in itertools.combinations(DOCS, 2):
        sa, sb = _shingles(ta), _shingles(tb)
        j = len(sa & sb) / len(sa | sb) if sa | sb else 0.0
        if j >= THRESHOLD:
            ra, rb = find(da), find(db)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    return {d: find(d) for d, _ in DOCS}


def test_minhash_dedup_matches_bruteforce_golden(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")

    # LSH must surface every golden pair as a candidate on this corpus
    # (exact dups always collide; the near-dup shares >= 1 of 3 bands here)
    cands = {(r.src, r.dst) for r in
             lsh_candidate_pairs(minhash_band_keys(docs)).collect()}
    golden = _golden_groups()
    golden_pairs = {
        (min(a, b), max(a, b))
        for a in golden for b in golden
        if a < b and golden[a] == golden[b]
    }
    assert golden_pairs <= cands

    decisions = {r.doc_id: (r.canonical_id, r.is_canonical)
                 for r in minhash_dedup(docs, jaccard_threshold=THRESHOLD).collect()}
    assert {d: c for d, (c, _) in decisions.items()} == golden
    # canonical flag: true exactly for group minima
    for d, (c, is_canon) in decisions.items():
        assert is_canon == (d == c)


def test_verification_kills_lsh_false_positives(spark):
    """A pair sharing a band but with low exact Jaccard must not merge:
    force a false positive through with threshold filtering."""
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    pairs = spark.createDataFrame([(0, 3)], "src long, dst long")  # unrelated
    assert verify_pairs_jaccard(pairs, docs, threshold=0.5).count() == 0
    near = spark.createDataFrame([(0, 2)], "src long, dst long")
    v = verify_pairs_jaccard(near, docs, threshold=0.5).collect()
    assert len(v) == 1 and v[0].jaccard > 0.8


def test_candidate_join_reuses_signature_exchange(spark, sf_dir):
    """The LSH self-join must compute the signature subplan ONCE: the
    shuffle_hash hint keeps both sides as identical shuffle exchanges so
    AQE substitutes a reuse for the second — without it, AQE broadcasts
    one side and the MinHash pipeline executes twice (round-3 fix)."""
    from ubparquet_spark.io import load_table
    from ubparquet_spark.plans.text import minhash_band_keys
    from ubparquet_spark.functions.minhash_dedup import lsh_candidate_pairs

    docs = load_table(spark, sf_dir, "documents")
    df = lsh_candidate_pairs(minhash_band_keys(docs))
    df.collect()  # AQE finalizes the plan only on execution
    final = df._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in final or "ReusedQueryStage" in final, (
        "signature exchange not reused — the candidate self-join is "
        "recomputing the MinHash subplan per side"
    )
