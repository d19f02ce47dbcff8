"""Distributed PCA over an embedding column — the whitening / decorrelation
preprocessing SemDeDup-style pipelines apply before cosine comparisons, and
the classical alternative to the JL projection (``plans.similarity.
q_jl_projection``) when the projection should adapt to the data.

Fit strategy (the only scalable one for tall-skinny X, n rows × d dims with
d small): accumulate per-partition Gram partials

  (n, Σx, XᵀX)   — d + d² doubles per partition, d=64 → 33 KB

with a single ``mapInArrow`` pass (vectorized numpy per Arrow batch, no
per-row Python), reduce the partials on the driver (p partitions × 33 KB —
driver-size by construction), then eigendecompose the d×d covariance with
LAPACK. The expensive part — the data pass — is one narrow map over the
scan; nothing shuffles, and a 1000-executor cluster sends back kilobytes.

Projection is JVM-side: the (mean, component) pairs are baked into the plan
as literal struct arrays and applied with ``zip_with``/``aggregate`` higher-
order functions — whole-stage codegen, no Python on the hot path, same
pattern as ``operators.kmeans.assign_clusters``.

Determinism: partials are float64; cross-partition reduction order follows
partition index (sorted on the driver), so a given partitioning reproduces
bitwise. Component signs are canonicalized (largest-|loading| coordinate
made positive) so results are comparable across runs and to numpy.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class PCAModel:
    mean: np.ndarray                       # (d,)
    components: np.ndarray                 # (k, d) rows = principal axes
    explained_variance: np.ndarray         # (k,) eigenvalues, descending
    explained_variance_ratio: np.ndarray   # (k,)
    n_rows: int


def _gram_partials(vec_col: str, dim: int):
    """mapInArrow function: one partial-moments row per Arrow batch."""
    import pyarrow as pa

    def gen(batches):
        for batch in batches:
            col = batch.column(vec_col)
            # flatten() hands back the underlying values buffer — no
            # per-row Python list round-trip. flatten() silently DROPS
            # null rows, which would misalign the reshape(-1, dim) and
            # corrupt the Gram partials; fail loudly instead.
            if col.null_count:
                raise ValueError(
                    f"fit_pca: column {vec_col!r} contains "
                    f"{col.null_count} NULL vector(s); filter them out "
                    "(e.g. .filter(col.isNotNull())) before fitting"
                )
            x = (
                col.flatten()
                .to_numpy(zero_copy_only=False)
                .astype(np.float64)
                .reshape(-1, dim)
            )
            yield pa.RecordBatch.from_pylist(
                [
                    {
                        "n": x.shape[0],
                        "s": x.sum(axis=0).tolist(),
                        "g": (x.T @ x).ravel().tolist(),
                    }
                ]
            )

    return gen


def fit_pca(vectors: DataFrame, k: int, vec_col: str = "embedding") -> PCAModel:
    """Fit a ``k``-component PCA on ``vectors[vec_col]`` (array<float|double>,
    fixed dimension). One vectorized pass over the data; driver work is
    O(partitions · d²) reduction + one d×d eigendecomposition."""
    first = vectors.select(F.size(vec_col).alias("d")).first()
    if first is None:
        raise ValueError("fit_pca requires a non-empty DataFrame")
    dim = first["d"]
    if not 1 <= k <= dim:
        raise ValueError(f"k must be in [1, {dim}], got {k}")

    schema = "n long, s array<double>, g array<double>"
    partials = (
        vectors.select(vec_col)
        .mapInArrow(_gram_partials(vec_col, dim), schema)
        .collect()
    )
    n = sum(p["n"] for p in partials)
    if n < 2:
        raise ValueError("fit_pca requires at least 2 rows")
    s = np.zeros(dim)
    g = np.zeros((dim, dim))
    for p in partials:
        s += np.asarray(p["s"])
        g += np.asarray(p["g"]).reshape(dim, dim)
    mean = s / n
    cov = (g - n * np.outer(mean, mean)) / (n - 1)
    evals, evecs = np.linalg.eigh(cov)          # ascending
    order = np.argsort(evals)[::-1][:k]
    evals = np.maximum(evals[order], 0.0)
    comps = evecs[:, order].T                   # (k, d)
    # canonical sign: the largest-|loading| coordinate of each axis is
    # positive (eigenvectors are sign-ambiguous; numpy's choice is
    # LAPACK-version-dependent)
    for row in comps:
        if row[np.argmax(np.abs(row))] < 0:
            row *= -1.0
    total_var = float(np.trace(cov))
    ratio = evals / total_var if total_var > 0 else np.zeros_like(evals)
    return PCAModel(
        mean=mean,
        components=comps,
        explained_variance=evals,
        explained_variance_ratio=ratio,
        n_rows=n,
    )


def _proj_expr(vec_col: str, mean: np.ndarray, comp: np.ndarray) -> Column:
    """JVM-side Σ_i (x_i - mean_i) * comp_i via a literal struct array."""
    pairs = ", ".join(
        f"struct(CAST({m!r} AS DOUBLE) AS m, CAST({c!r} AS DOUBLE) AS c)"
        for m, c in zip(mean.tolist(), comp.tolist())
    )
    return F.expr(
        f"aggregate(zip_with({vec_col}, array({pairs}),"
        " (x, p) -> (CAST(x AS DOUBLE) - p.m) * p.c),"
        " CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def project(
    df: DataFrame,
    model: PCAModel,
    vec_col: str = "embedding",
    out_prefix: str = "pc",
) -> DataFrame:
    """Append ``pc0..pc{k-1}`` projection columns. Narrow map, zero
    shuffles: the k·d model literals ride inside the plan (d=64, k=8 →
    ~4 KB of constants), so no broadcast variable and no Python UDF."""
    out = df
    for j, comp in enumerate(model.components):
        out = out.withColumn(
            f"{out_prefix}{j}", _proj_expr(vec_col, model.mean, comp)
        )
    return out
