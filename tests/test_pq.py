"""Product quantization operator vs a numpy reference implementation."""

from __future__ import annotations

import math

import numpy as np
import pytest

from ubparquet_spark.operators import pq

M, K, DIM, N = 2, 4, 8, 40


@pytest.fixture(scope="module")
def vecs():
    rng = np.random.default_rng(7)
    return rng.normal(size=(N, DIM)).astype(np.float64)


@pytest.fixture(scope="module")
def vec_df(spark, vecs):
    rows = [(int(i), [float(v) for v in vecs[i]]) for i in range(N)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def numpy_pq_fit(vecs: np.ndarray, m: int, k: int, rounds: int):
    w = vecs.shape[1] // m
    books = [
        [list(vecs[i, j * w : (j + 1) * w]) for i in range(k)] for j in range(m)
    ]
    for _ in range(rounds):
        new_books = []
        for j in range(m):
            sub = vecs[:, j * w : (j + 1) * w]
            d = ((sub[:, None, :] - np.array(books[j])[None, :, :]) ** 2).sum(-1)
            codes = d.argmin(1)  # first minimum = lowest code, same tiebreak
            book = []
            for c in range(k):
                mask = codes == c
                if mask.any():
                    mean = sub[mask].mean(0)
                    book.append(
                        [math.floor(v * 1e6 + 0.5) / 1e6 for v in mean]
                    )
                else:
                    book.append(books[j][c])
            new_books.append(book)
        books = new_books
    return books


def test_pq_fit_matches_numpy(vec_df, vecs):
    got = pq.pq_fit(vec_df, M, K, rounds=2)
    want = numpy_pq_fit(vecs, M, K, rounds=2)
    np.testing.assert_allclose(np.array(got), np.array(want), atol=1e-9)


def test_pq_encode_matches_numpy(vec_df, vecs):
    books = pq.pq_fit(vec_df, M, K, rounds=2)
    got = {
        r.vec_id: list(r.codes) for r in pq.pq_encode(vec_df, books).collect()
    }
    w = DIM // M
    for i in range(N):
        for j in range(M):
            sub = vecs[i, j * w : (j + 1) * w]
            d = ((np.array(books[j]) - sub[None, :]) ** 2).sum(1)
            assert got[i][j] == int(d.argmin()), (i, j)


def test_adc_scores_match_numpy(vec_df, vecs):
    books = pq.pq_fit(vec_df, M, K, rounds=1)
    query = list(vecs[0])
    table = pq.adc_table(books, query)
    enc = pq.pq_encode(vec_df, books)
    got = {r.vec_id: r.adc_dist for r in pq.pq_adc_scores(enc, table).collect()}
    w = DIM // M
    for i in range(N):
        acc = 0.0
        for j in range(M):
            sub = vecs[i, j * w : (j + 1) * w]
            d = ((np.array(books[j]) - sub[None, :]) ** 2).sum(1)
            acc += table[j][int(d.argmin())]
        assert got[i] == pytest.approx(math.floor(acc * 1e4 + 0.5) / 1e4, abs=1e-9)


def test_pq_fit_rejects_indivisible_dim(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 2.0, 3.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="not divisible"):
        pq.pq_fit(df, 2, 1, rounds=1)


def test_pq_fit_rejects_empty(spark):
    df = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="non-empty"):
        pq.pq_fit(df, 2, 1, rounds=1)


def test_ivf_pq_topk_composition(spark, vec_df, vecs):
    """The composed index search must (a) only surface rows from the
    probed cells, (b) score them identically to a full-table ADC pass
    restricted to those cells, and (c) be deterministic across runs."""
    from ubparquet_spark.operators.kmeans import assign_clusters, kmeans_fit
    from ubparquet_spark.operators.pq import (
        ivf_pq_topk,
        pq_adc_scores,
        pq_encode,
        pq_fit,
    )

    query = [float(v) for v in vecs[0]]
    kwargs = dict(n_cells=4, probes=2, m=M, k_codes=K, rounds=1, topk=8)
    got = ivf_pq_topk(vec_df, query, **kwargs).collect()
    assert len(got) == 8

    # independent recomposition: full-table encode + ADC, then restrict
    cents = kmeans_fit(vec_df, 4, rounds=1)
    probed = sorted(
        range(4),
        key=lambda c: (
            sum((x - y) ** 2 for x, y in zip(query, cents[c])),
            c,
        ),
    )[:2]
    assert {r.cluster for r in got} <= set(probed)
    from ubparquet_spark.operators.pq import adc_table

    full = pq_adc_scores(
        pq_encode(assign_clusters(vec_df, cents), pq_fit(vec_df, M, K, rounds=1)),
        adc_table(pq_fit(vec_df, M, K, rounds=1), query),
    )
    expect = (
        full.filter(full.cluster.isin(probed))
        .orderBy("adc_dist", "vec_id")
        .limit(8)
        .collect()
    )
    assert [(r.vec_id, r.adc_dist) for r in got] == [
        (r.vec_id, r.adc_dist) for r in expect
    ]

    again = ivf_pq_topk(vec_df, query, **kwargs).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in again]


def test_ivf_pq_topk_accepts_pretrained_artifacts(spark, vec_df, vecs):
    from ubparquet_spark.operators.kmeans import kmeans_fit
    from ubparquet_spark.operators.pq import ivf_pq_topk, pq_fit

    query = [float(v) for v in vecs[0]]
    kwargs = dict(n_cells=4, probes=2, m=M, k_codes=K, rounds=1, topk=8)
    trained = ivf_pq_topk(
        vec_df,
        query,
        cents=kmeans_fit(vec_df, 4, rounds=1),
        books=pq_fit(vec_df, M, K, rounds=1),
        **kwargs,
    ).collect()
    scratch = ivf_pq_topk(vec_df, query, **kwargs).collect()
    assert [tuple(r) for r in trained] == [tuple(r) for r in scratch]


def test_zero_and_null_vector_pq_contract(spark):
    """Padding-row contract at the PQ API layer (round 7): an all-zero
    vector is an ordinary point — each subspace encodes to the
    smallest-norm code (lowest code id on ties) and ADC scores stay
    finite; a NULL vector encodes NULL codes and a NULL adc_dist, never
    a silent code 0."""
    from pyspark.sql import functions as F

    from ubparquet_spark.operators.pq import (
        adc_table,
        pq_adc_scores,
        pq_encode,
    )

    # m=2 subspaces of width 2; in each, code 1 is the zero centroid
    books = [
        [[2.0, 0.0], [0.0, 0.0], [5.0, 5.0]],
        [[1.0, 1.0], [0.0, 0.0], [3.0, 0.0]],
    ]
    rows = [
        (0, [0.0, 0.0, 0.0, 0.0]),
        (1, None),
        (2, [2.0, 0.0, 3.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    enc = pq_encode(df, books)
    got = {r.vec_id: r.codes for r in enc.collect()}
    assert got == {0: [1, 1], 1: None, 2: [0, 2]}, got

    table = adc_table(books, [0.0, 0.0, 0.0, 0.0])
    # zero query: each table row is the per-code squared norm
    assert table == [[4.0, 0.0, 50.0], [2.0, 0.0, 9.0]]
    scored = {
        r.vec_id: r.adc_dist
        for r in pq_adc_scores(enc, table).collect()
    }
    assert scored[0] == 0.0 and scored[2] == 13.0
    assert scored[1] is None
