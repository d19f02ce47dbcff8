"""Incremental batch-vs-corpus dedup: verdict semantics on crafted docs."""

from __future__ import annotations

from ubparquet_spark.functions.incremental import incremental_dedup


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", "web", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def test_verdicts(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    corpus = _docs(
        spark,
        [
            (1, base),
            (2, "completely different words about spark shuffles and joins here"),
        ],
    )
    incoming = _docs(
        spark,
        [
            (10, base),                                   # exact corpus dup
            (11, base.replace("today", "tomorrow")),      # near dup of 1
            (12, "nothing like anything in the corpus at all zebra quantum"),
        ],
    )
    got = {
        r["doc_id"]: r
        for r in incremental_dedup(
            incoming, corpus, jaccard_threshold=0.5
        ).collect()
    }
    assert got[10]["verdict"] == "exact_dup"
    # the exact dup is also a near-dup: the match count reflects it
    assert got[10]["n_matches"] >= 1 and got[10]["best_match"] == 1
    assert got[11]["verdict"] == "near_dup" and got[11]["best_match"] == 1
    assert got[12]["verdict"] == "new"
    assert got[12]["n_matches"] == 0 and got[12]["best_match"] is None


def test_corpus_bucket_cap_keeps_incoming(spark):
    """A boilerplate band bucket larger than the cap must NOT produce
    near-dup verdicts — capped buckets err toward keeping the batch."""
    boiler = "spark table query join filter scan agg sort window batch merge"
    corpus = _docs(spark, [(i, boiler) for i in range(1, 6)])
    incoming = _docs(spark, [(100, boiler)])
    got = incremental_dedup(
        incoming, corpus, jaccard_threshold=0.5, bucket_cap=3
    ).collect()
    assert len(got) == 1
    # every corpus bucket holds 5 identical docs > cap=3 → no candidates;
    # but the exact-hash check still fires (it is not band-based)
    assert got[0]["verdict"] == "exact_dup"
    assert got[0]["n_matches"] == 0
