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


# ---------------------------------------------------------------------------
# Incremental SEMANTIC dedup (round 11)
# ---------------------------------------------------------------------------


def _vecs(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )


def test_semdedup_verdicts(spark):
    from ubparquet_spark.functions.incremental import incremental_semdedup

    d = 64
    base = [1.0] + [0.0] * (d - 1)
    ortho = [0.0, 1.0] + [0.0] * (d - 2)
    nearly = [1.0, 0.05] + [0.0] * (d - 2)  # cos ~0.9988 vs base
    corpus = _vecs(spark, [(1, base), (2, ortho)])
    incoming = _vecs(
        spark,
        [
            (10, base),    # exact corpus dup (identical floats)
            (11, nearly),  # near dup of 1 (same cell, cos >= threshold)
            (12, [0.0] * (d - 1) + [1.0]),  # orthogonal to both
        ],
    )
    cents = [base, ortho]  # frozen quantizer
    got = {
        r["vec_id"]: r
        for r in incremental_semdedup(
            incoming, corpus, cents, threshold=0.9
        ).collect()
    }
    assert got[10]["verdict"] == "exact_dup"
    assert got[10]["n_matches"] >= 1 and got[10]["best_match"] == 1
    assert got[11]["verdict"] == "near_dup" and got[11]["best_match"] == 1
    assert got[12]["verdict"] == "new"
    assert got[12]["n_matches"] == 0 and got[12]["best_match"] is None


def test_semdedup_cell_cap_keeps_incoming(spark):
    """A corpus cell larger than the cap takes no part in pair generation
    — capped cells err toward keeping the batch (same policy as the
    MinHash corpus bucket cap), but the exact check still fires."""
    from ubparquet_spark.functions.incremental import incremental_semdedup

    d = 64
    base = [1.0] + [0.0] * (d - 1)
    corpus = _vecs(spark, [(i, base) for i in range(1, 6)])
    incoming = _vecs(spark, [(100, base), (101, [1.0, 0.05] + [0.0] * (d - 2))])
    got = {
        r["vec_id"]: r
        for r in incremental_semdedup(
            incoming, corpus, [base], threshold=0.9, cell_cap=3
        ).collect()
    }
    assert got[100]["verdict"] == "exact_dup" and got[100]["n_matches"] == 0
    assert got[101]["verdict"] == "new"


def test_incremental_semdedup_equals_bruteforce_reference(spark):
    """Against an INDEPENDENT numpy brute-force of the same contract
    (frozen-centroid assignment, within-cell rounded cosine, array-equal
    exact check), the distributed decision table must agree row-for-row
    on real sf0.001 embeddings when caps don't bind."""
    import numpy as np

    from ubparquet_spark.functions.incremental import incremental_semdedup
    from ubparquet_spark.plans.similarity import (
        INCR_SEM_MOD,
        INCR_SEM_REM,
        SEMDEDUP_TRAIN_MOD,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    emb = emb.filter("embedding IS NOT NULL").select("vec_id", "embedding")
    rows = sorted(
        ((r.vec_id, np.array(r.embedding, dtype=np.float64)) for r in emb.collect()),
        key=lambda t: t[0],
    )
    inc = [(i, v) for i, v in rows if i % INCR_SEM_MOD == INCR_SEM_REM]
    corp = [(i, v) for i, v in rows if i % INCR_SEM_MOD != INCR_SEM_REM]
    # frozen centroids: first 8 train-sample corpus vectors by id (k tiny
    # and rounds skipped — centroid TRAINING is covered by the kmeans
    # tests; this test isolates the incremental decision)
    cents = [v.tolist() for i, v in corp if i % SEMDEDUP_TRAIN_MOD == 0][:8]
    threshold = 0.35

    def assign(v):
        d = [float(((v - np.array(c)) ** 2).sum()) for c in cents]
        return int(np.argmin(d))  # first minimum = lowest cell, the fold rule

    def r6(x):
        return np.floor(x * 1e6 + 0.5) / 1e6

    corp_cells = {}
    for i, v in corp:
        corp_cells.setdefault(assign(v), []).append((i, v))
    expected = {}
    for i, v in inc:
        cell = assign(v)
        matches = [
            j
            for j, w in corp_cells.get(cell, [])
            if r6(float(v @ w) / (np.linalg.norm(v) * np.linalg.norm(w)))
            >= threshold
        ]
        exact = any(np.array_equal(v, w) for _, w in corp)
        verdict = (
            "exact_dup" if exact else ("near_dup" if matches else "new")
        )
        expected[i] = (
            cell,
            verdict,
            len(matches),
            min(matches) if matches else None,
        )

    incoming_df = emb.filter(f"vec_id % {INCR_SEM_MOD} = {INCR_SEM_REM}")
    corpus_df = emb.filter(f"vec_id % {INCR_SEM_MOD} != {INCR_SEM_REM}")
    got = {
        r["vec_id"]: (r["cell"], r["verdict"], r["n_matches"], r["best_match"])
        for r in incremental_semdedup(
            incoming_df, corpus_df, cents, threshold=threshold, cell_cap=10**9
        ).collect()
    }
    assert set(got) == set(expected)
    bad = {i: (got[i], expected[i]) for i in got if got[i] != expected[i]}
    assert not bad, dict(list(bad.items())[:5])
