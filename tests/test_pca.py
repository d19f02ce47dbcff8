"""Distributed PCA matches numpy's reference decomposition exactly
(same covariance, same eigensolver, canonicalized signs)."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest

from ubparquet_spark.io import load_table
from ubparquet_spark.operators import pca


def _numpy_embeddings(sf_dir: str) -> np.ndarray:
    con = duckdb.connect()
    rows = con.sql(
        f"SELECT embedding FROM '{sf_dir}/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()
    con.close()
    return np.asarray([r[0] for r in rows], dtype=np.float64)


def _numpy_pca(x: np.ndarray, k: int):
    mean = x.mean(axis=0)
    cov = np.cov(x, rowvar=False, ddof=1)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T
    for row in comps:
        if row[np.argmax(np.abs(row))] < 0:
            row *= -1.0
    return mean, comps, evals[order]


@pytest.fixture(scope="module")
def model(spark, sf_dir):
    return pca.fit_pca(load_table(spark, sf_dir, "embeddings"), k=4)


def test_fit_matches_numpy(model, sf_dir):
    x = _numpy_embeddings(sf_dir)
    mean, comps, evals = _numpy_pca(x, 4)
    assert model.n_rows == x.shape[0]
    np.testing.assert_allclose(model.mean, mean, rtol=0, atol=1e-9)
    np.testing.assert_allclose(model.explained_variance, evals, rtol=1e-9)
    # eigh on a bit-identical covariance can still differ across LAPACK
    # builds for near-degenerate eigenvalues; compare axes up to that
    np.testing.assert_allclose(model.components, comps, rtol=0, atol=1e-6)
    assert (np.diff(model.explained_variance) <= 1e-12).all()
    assert 0 < model.explained_variance_ratio.sum() <= 1 + 1e-12


def test_project_matches_numpy(spark, sf_dir, model):
    x = _numpy_embeddings(sf_dir)
    expect = (x - model.mean) @ model.components.T
    got = (
        pca.project(load_table(spark, sf_dir, "embeddings"), model)
        .select("vec_id", *[f"pc{j}" for j in range(4)])
        .orderBy("vec_id")
        .toPandas()
    )
    np.testing.assert_allclose(
        got[[f"pc{j}" for j in range(4)]].to_numpy(), expect, rtol=0, atol=1e-9
    )


def test_project_plan_is_narrow(spark, sf_dir, model):
    from .test_plans_physical import plan_text
    import re

    df = pca.project(load_table(spark, sf_dir, "embeddings"), model)
    t = plan_text(df)
    assert not re.search(r"\(\d+\) Exchange\b", t), "projection must not shuffle"
    assert "pythonUDF" not in t and "ArrowEvalPython" not in t, (
        "projection must stay JVM-side"
    )


def test_fit_validates_inputs(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    with pytest.raises(ValueError, match=r"k must be"):
        pca.fit_pca(emb, k=0)
    with pytest.raises(ValueError, match=r"k must be"):
        pca.fit_pca(emb, k=65)
    with pytest.raises(ValueError, match="non-empty"):
        pca.fit_pca(emb.filter("vec_id < 0"), k=2)
