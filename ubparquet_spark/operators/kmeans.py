"""Distributed k-means (Lloyd's algorithm) — the IVF coarse-quantizer
trainer.

The IVF-probe ANN path (``plans.similarity.q_ann_ivf``) needs centroids;
there the ``label`` column stands in as a pre-trained quantizer. This
operator trains the real thing: seeded deterministic init, then Lloyd
rounds, each round being

  assign:  broadcast the k centroids (k·dim doubles — driver-size by
           definition) against the vector table, argmin squared distance
           via JVM higher-order functions — a narrow map, no shuffle;
  update:  posexplode to (cluster, dim, value) → groupBy mean → rebuild
           arrays — ONE shuffle keyed on (cluster, dim), k·dim groups.

Per round: one shuffle over the data + one k·dim-row collect. Rounds are
fixed (IVF quantizers train for a handful of rounds on a sample); at
100 TB you train on a Bernoulli sample (``operators.sampling``) and assign
the full table once at the end — the same shapes, composable here.

All numerics are double with a deterministic tie-break (lowest cluster id
wins ties), so results are reproducible across partitionings: sums use
Spark's partial aggregation but the test tolerance is exact-on-fixture.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sq_dist(a: str, b: str):
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) ->"
        " (CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))),"
        " CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def assign_clusters(
    vectors: DataFrame, centroids: list[list[float]], vec_col: str = "embedding"
) -> DataFrame:
    """``vectors`` + ``cluster`` (int): index of the nearest centroid,
    lowest index on ties. Centroids ride along as a broadcast-size literal
    array — the assign step is a narrow map over the table."""
    if not centroids:
        raise ValueError("assign_clusters requires at least one centroid")
    cent_lit = F.array(
        *[
            F.struct(
                F.lit(i).alias("c"),
                F.array(*[F.lit(float(v)) for v in c]).alias("vec"),
            )
            for i, c in enumerate(centroids)
        ]
    )
    # argmin via array_min over (distance, cluster) structs — struct
    # comparison is lexicographic, so ties break to the lowest cluster id
    # deterministically
    best = F.expr(
        "array_min(transform(_cents, s -> struct("
        " aggregate(zip_with(_v, s.vec, (x, y) ->"
        "  (CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))),"
        "  CAST(0 AS DOUBLE), (acc, v) -> acc + v) AS d,"
        " s.c AS c)))"
    )
    return (
        vectors.withColumn("_cents", cent_lit)
        .withColumn("_v", F.col(vec_col))
        .withColumn("cluster", best["c"])
        .drop("_cents", "_v")
    )


def assign_clusters_blas(
    vectors: DataFrame, centroids: list[list[float]], vec_col: str = "embedding"
) -> DataFrame:
    """Large-k assignment: Arrow-batched numpy matrix product instead of the
    interpreted higher-order argmin.

    ``assign_clusters``'s in-plan fold costs O(n·k·d) INTERPRETED element
    ops — fine for a coarse quantizer (k ≤ ~100; and it keeps distance
    arithmetic bit-identical to the SQL oracle), but at IVF scale
    (k ≈ n/10k, thousands of cells) the assignment stage dominates the job
    (measured: SemDeDup 10× stress went super-linear purely on n·k growth,
    BENCHNOTES.md). Here the whole batch assigns via one BLAS GEMM
    (``X @ C.T``) using the ``||x−c||² = ||x||² − 2x·c + ||c||²`` expansion
    (the ``||x||²`` term is row-constant and dropped from the argmin).
    Measured at 20k rows × 64 dims, local[32]: 2.1× faster at k=100,
    13× at k=1000 (fold time is linear in k; the GEMM is cheap relative to
    Arrow transfer, so BLAS time stays flat) — identical assignments.

    Same tie rule (lowest cluster id — ``np.argmin`` returns the first
    minimum), but BLAS summation order differs from the fold, so distances
    can differ in the last ulp: on a near-exact distance tie the chosen
    cluster may differ from ``assign_clusters``. Use the fold variant when
    cross-engine bit-parity matters, this one when k is large. NULL vectors
    assign NULL (matching the fold); vectors must share the centroid
    width."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    if not centroids:
        raise ValueError("assign_clusters_blas requires at least one centroid")
    cmat = np.asarray(centroids, dtype=np.float64)
    cnorm = (cmat * cmat).sum(axis=1)

    # no type hints: module-level `from __future__ import annotations`
    # stringifies them, and pandas_udf cannot resolve function-local names
    def _assign(batch):
        mask = batch.notna().to_numpy()
        out = pd.array([None] * len(batch), dtype="Int32")
        if mask.any():
            # stack the Arrow-delivered numpy buffers directly — a
            # .tolist() round-trip through Python floats would cost a big
            # share of the transfer-bound total
            x = np.stack(batch[mask].to_numpy()).astype(np.float64)
            scores = cnorm[None, :] - 2.0 * (x @ cmat.T)
            out[mask] = np.argmin(scores, axis=1).astype(np.int32)
        return pd.Series(out)

    return vectors.withColumn(
        "cluster", pandas_udf(_assign, "int")(F.col(vec_col))
    )


def update_centroids(
    assigned: DataFrame, vec_col: str = "embedding"
) -> list[tuple[int, list[float]]]:
    """Mean vector per cluster from an assigned frame — one shuffle on
    (cluster, dim); returns [(cluster, centroid)] sorted by cluster.
    Empty clusters simply vanish (caller keeps the old centroid)."""
    rows = (
        assigned.select("cluster", F.posexplode(vec_col).alias("dim", "v"))
        .groupBy("cluster", "dim")
        .agg(F.avg(F.col("v").cast("double")).alias("m"))
        .groupBy("cluster")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(dim, m))), s -> s.m)"
            ).alias("centroid")
        )
        .collect()
    )
    return sorted((r.cluster, list(r.centroid)) for r in rows)


def kmeans_fit(
    vectors: DataFrame,
    k: int,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    rounds: int = 5,
) -> list[list[float]]:
    """Train k centroids with ``rounds`` Lloyd iterations.

    Init is deterministic: the k vectors with the lowest ids (seeded
    samplers from ``operators.sampling`` compose upstream for a random
    init). Returns plain Python centroids — k·dim doubles, the
    quantizer artifact you broadcast into ``assign_clusters`` /
    ``plans.similarity.q_ann_ivf``-style probes."""
    init_rows = (
        vectors.select(id_col, vec_col).orderBy(id_col).limit(k).collect()
    )
    centroids = [list(r[vec_col]) for r in init_rows]
    # dispatch on k: the interpreted fold keeps distance arithmetic
    # bit-identical to the SQL oracles (and is fine for coarse quantizers);
    # past ~128 cells the O(n·k·d) interpreted argmin dominates each round
    # and the Arrow/BLAS path is strictly faster (13× at k=1000, measured)
    assign = assign_clusters if k <= 128 else assign_clusters_blas
    for _ in range(rounds):
        assigned = assign(vectors, centroids, vec_col)
        updated = dict(update_centroids(assigned, vec_col))
        centroids = [
            updated.get(i, centroids[i]) for i in range(k)  # keep empties
        ]
    return centroids
