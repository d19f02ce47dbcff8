"""Similarity-search plans hash-match the DuckDB oracle."""

from __future__ import annotations

import pytest

from ubparquet_spark.plans import similarity

from .oracle import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(similarity.QUERIES))
def test_similarity_query_matches_oracle(spark, sf_dir, name):
    fn, sql = similarity.QUERIES[name]
    assert_matches_oracle(fn(spark, sf_dir), sql, sf_dir)


def test_neardup_bucket_cap_drops_degenerate_buckets(spark):
    """An over-full LSH bucket (here: identical all-positive embeddings,
    which agree in every band) must be dropped by the cap, not allowed to
    go quadratic — and capping must not disturb small buckets."""
    from ubparquet_spark.plans.similarity import embedding_neardup_pairs

    dim = 64
    hot = [(i, [1.0] * dim) for i in range(10)]          # one bucket, 10 rows
    cold = [(100, [1.0] * 32 + [-1.0] * 32), (101, [1.0] * 32 + [-1.0] * 32)]
    emb = spark.createDataFrame(hot + cold, "vec_id long, embedding array<float>")

    # cap below the hot-bucket size: only the cold pair may survive
    pairs = embedding_neardup_pairs(
        emb, bucket_cap=5, threshold=0.5
    ).collect()
    assert {(r.vec_a, r.vec_b) for r in pairs} == {(100, 101)}

    # with a generous cap the hot bucket's pairs come back (and are
    # deduped across bands: 45 unique pairs, not 45 * n_bands)
    pairs2 = embedding_neardup_pairs(
        emb, bucket_cap=1000, threshold=0.5
    ).collect()
    assert len([p for p in pairs2 if p.vec_a < 100]) == 45
