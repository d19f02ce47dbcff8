"""Randomized-batch property tests (single Spark job per property, seeded
rng — the hypothesis-per-example pattern would pay a Spark job per case):
the BPE merge fold matches a direct python implementation of left-to-right
non-overlapping merging, and the Bloom member expression never rejects an
inserted element."""

from __future__ import annotations

import random

from pyspark.sql import functions as F


def _py_merge(symbols: list[str], a: str, b: str) -> list[str]:
    out: list[str] = []
    i = 0
    while i < len(symbols):
        if i + 1 < len(symbols) and symbols[i] == a and symbols[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return out


def test_bpe_fold_matches_python_on_random_sequences(spark):
    from ubparquet_spark.plans.text import _BPE_SEP, _bpe_fold_expr

    rng = random.Random(77)
    alphabet = ["a", "b", "ab", "ba", "c"]
    cases = [
        [rng.choice(alphabet) for _ in range(rng.randint(1, 12))]
        for _ in range(200)
    ]
    merges = [("a", "b"), ("a", "a"), ("ab", "c"), ("b", "ba")]
    df = spark.createDataFrame(
        [(i, _BPE_SEP.join(c)) for i, c in enumerate(cases)], "i long, syms string"
    )
    for a, b in merges:
        got = {
            r["i"]: r["m"]
            for r in df.select(
                "i", F.expr(_bpe_fold_expr("syms", a, b)).alias("m")
            ).collect()
        }
        for i, case in enumerate(cases):
            expect = _BPE_SEP.join(_py_merge(case, a, b))
            assert got[i] == expect, (case, a, b, got[i], expect)


def test_bloom_never_rejects_inserted_elements(spark):
    from ubparquet_spark.plans.text import (
        _BLOOM_WORD,
        _bloom_hashes_py,
        _bloom_member_expr,
        bloom_m_for,
    )

    rng = random.Random(5)
    inserted = [
        " ".join(
            rng.choice(["spark", "table", "query", "join", "scan", "agg"])
            for _ in range(3)
        )
        + f" {i}"
        for i in range(300)
    ]
    m = bloom_m_for(len(inserted))
    bits = [0] * (m // _BLOOM_WORD)
    for g in inserted:
        for h in _bloom_hashes_py(g, m):
            bits[h // _BLOOM_WORD] |= 1 << (h % _BLOOM_WORD)
    df = spark.createDataFrame([(g,) for g in inserted], "g string")
    n_pass = df.filter(F.expr(_bloom_member_expr(bits, "g", m))).count()
    assert n_pass == len(inserted), "bloom produced a false negative"
