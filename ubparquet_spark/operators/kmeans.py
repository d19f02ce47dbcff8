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
    lowest index on ties; NULL vectors assign NULL (the padding-row
    contract shared with ``assign_clusters_blas`` — without the explicit
    guard a NULL distance sorts SMALLEST in the struct argmin and every
    NULL vector silently lands on cluster 0). An all-zero vector is an
    ordinary euclidean point: it assigns to the smallest-norm centroid.
    Centroids ride along as a broadcast-size literal array — the assign
    step is a narrow map over the table."""
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
        .withColumn(
            "cluster", F.when(F.col(vec_col).isNotNull(), best["c"])
        )
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
    ``plans.similarity.q_ann_ivf``-style probes.

    NULL vectors are dropped from training here (round-8 NULL-payload
    contract: a NULL row can neither seed a centroid nor contribute to a
    mean); downstream assignment still maps them to a NULL cluster."""
    vectors = vectors.filter(F.col(vec_col).isNotNull())
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


# ---------------------------------------------------------------------------
# Two-level (hierarchical) quantizer — the documented path past the
# one-level clamp. With k ∝ corpus size, one-level assignment is O(n·k·d)
# and goes super-linear (measured: SemDeDup-scaled 10× stress 3.39×,
# BENCHNOTES round 3). Splitting k = k1·k2 into a coarse level and a
# per-cell refinement makes assignment O((k1 + k2)·d) per row — for
# k = 4096 via 64×64, a 32× cut in assign work — which is how FAISS-style
# IVF indexes scale their cell count with the corpus (IMI / two-level
# coarse quantizers).
#
# Training: level 1 is plain kmeans_fit; level 2 trains ALL cells'
# sub-centroids simultaneously — init is the k2 lowest-id vectors per cell
# (one WindowGroupLimit rank), each Lloyd round is a narrow per-row argmin
# against the OWN cell's candidates (element_at into a per-cell literal
# array — no join) plus ONE (cell, sub, dim)-keyed update shuffle. The
# collected artifact is k1·k2·d doubles.
# ---------------------------------------------------------------------------


def assign_subclusters(
    assigned: DataFrame,
    sub_centroids: list[list[list[float]]],
    vec_col: str = "embedding",
    cell_col: str = "cluster",
) -> DataFrame:
    """``assigned`` (carrying ``cell_col``) + ``sub`` (int): index of the
    nearest level-2 centroid WITHIN the row's cell; lowest index on ties.
    ``sub_centroids[cell]`` lists that cell's candidate centroids. Narrow
    map: the per-cell candidate table rides the plan as one nested literal
    and is indexed by the row's cell id — no join, no shuffle."""
    if not sub_centroids:
        raise ValueError("assign_subclusters requires at least one cell")
    cell_lit = F.array(
        *[
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("c"),
                        F.array(*[F.lit(float(v)) for v in cvec]).alias("vec"),
                    )
                    for i, cvec in enumerate(cell)
                ]
            )
            for cell in sub_centroids
        ]
    )
    # reference cell_col directly in the lookup — synthesizing a "cluster"
    # column would silently clobber an unrelated one on the input frame
    best = F.expr(
        f"array_min(transform(element_at(_cells, {cell_col} + 1), s -> struct("
        " aggregate(zip_with(_v, s.vec, (x, y) ->"
        "  (CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))),"
        "  CAST(0 AS DOUBLE), (acc, v) -> acc + v) AS d,"
        " s.c AS c)))"
    )
    return (
        assigned.withColumn("_cells", cell_lit)
        .withColumn("_v", F.col(vec_col))
        # same padding-row contract as assign_clusters: a NULL vector
        # (or NULL cell) yields a NULL sub, never a silent 0
        .withColumn(
            "sub", F.when(F.col(vec_col).isNotNull(), best["c"])
        )
        .drop("_cells", "_v")
    )


def update_subcentroids(
    assigned: DataFrame, vec_col: str = "embedding"
) -> list[tuple[int, int, list[float]]]:
    """Mean vector per (cluster, sub) — one shuffle keyed on
    (cluster, sub, dim); returns [(cluster, sub, centroid)] sorted."""
    rows = (
        assigned.select("cluster", "sub", F.posexplode(vec_col).alias("dim", "v"))
        .groupBy("cluster", "sub", "dim")
        .agg(F.avg(F.col("v").cast("double")).alias("m"))
        .groupBy("cluster", "sub")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(dim, m))), s -> s.m)"
            ).alias("centroid")
        )
        .collect()
    )
    return sorted((r.cluster, r.sub, list(r.centroid)) for r in rows)


def kmeans_fit_two_level(
    vectors: DataFrame,
    k1: int,
    k2: int,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    rounds1: int = 2,
    rounds2: int = 1,
) -> tuple[list[list[float]], list[list[list[float]]]]:
    """Train the hierarchical quantizer; returns (level-1 centroids,
    per-cell level-2 centroids). Cells with fewer than k2 members keep
    fewer sub-centroids (their own members seed them); empty sub-cells
    keep their previous centroid, matching ``kmeans_fit``."""
    from pyspark.sql import Window

    c1 = kmeans_fit(
        vectors, k1, vec_col=vec_col, id_col=id_col, rounds=rounds1
    )
    assign1 = assign_clusters if k1 <= 128 else assign_clusters_blas
    a1 = assign1(vectors, c1, vec_col)
    # init: the k2 lowest-id vectors of each cell (WindowGroupLimit keeps
    # the rank filter map-side)
    w = Window.partitionBy("cluster").orderBy(F.col(id_col).asc())
    seed_rows = (
        a1.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k2)
        .select("cluster", "_rn", vec_col)
        .collect()
    )
    c2: list[list[list[float]]] = [[] for _ in range(len(c1))]
    for r in sorted(seed_rows, key=lambda r: (r["cluster"], r["_rn"])):
        c2[r["cluster"]].append([float(v) for v in r[vec_col]])
    for cell, cents in enumerate(c2):
        if not cents:  # empty level-1 cell: carry its own centroid
            c2[cell] = [list(c1[cell])]
    for _ in range(rounds2):
        a2 = assign_subclusters(a1, c2, vec_col)
        updated = {
            (cell, sub): cent
            for cell, sub, cent in update_subcentroids(a2, vec_col)
        }
        c2 = [
            [updated.get((cell, s), c2[cell][s]) for s in range(len(c2[cell]))]
            for cell in range(len(c2))
        ]
    return c1, c2


def assign_two_level(
    vectors: DataFrame,
    c1: list[list[float]],
    c2: list[list[list[float]]],
    vec_col: str = "embedding",
) -> DataFrame:
    """``vectors`` + (``cluster``, ``sub``, ``cell``): coarse cell, sub-cell,
    and the flattened ``cell = cluster * max_k2 + sub`` id. Two narrow maps
    — O((k1 + k2)·d) per row, never O(k1·k2·d)."""
    assign1 = assign_clusters if len(c1) <= 128 else assign_clusters_blas
    a1 = assign1(vectors, c1, vec_col)
    a2 = assign_subclusters(a1, c2, vec_col)
    width = max(len(cell) for cell in c2)
    return a2.withColumn(
        "cell", F.col("cluster") * F.lit(width) + F.col("sub")
    )


def assign_subclusters_blas(
    assigned: DataFrame,
    sub_centroids: list[list[list[float]]],
    vec_col: str = "embedding",
    cell_col: str = "cluster",
) -> DataFrame:
    """Large-k₂ level-2 assignment: per-cell BLAS GEMM instead of the
    interpreted per-row fold — same dispatch rationale as
    ``assign_clusters_blas`` (the fold is O(k₂·d) interpreted element ops
    per row). Rows are grouped by cell inside each Arrow batch and each
    cell's members assign via one ``X @ C.T``. Same tie rule (lowest sub
    id); BLAS summation differs from the fold in the last ulp, so use the
    fold variant when cross-engine bit-parity matters. NULL vectors and
    out-of-range cells assign NULL."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    if not sub_centroids:
        raise ValueError("assign_subclusters_blas requires at least one cell")
    mats = [np.asarray(c, dtype=np.float64) for c in sub_centroids]
    norms = [(m * m).sum(axis=1) for m in mats]
    n_cells = len(mats)

    def _assign(cell_s, vec_s):
        out = pd.array([None] * len(vec_s), dtype="Int32")
        cells = cell_s.to_numpy()
        mask = vec_s.notna().to_numpy() & pd.notna(cells)
        if mask.any():
            x = np.stack(vec_s[mask].to_numpy()).astype(np.float64)
            cm = cells[mask].astype(np.int64)
            sub = pd.array([None] * len(cm), dtype="Int32")
            for cell in np.unique(cm):
                if not 0 <= cell < n_cells:
                    continue  # out-of-range cell -> NULL, like the fold path
                idx = np.where(cm == cell)[0]
                scores = norms[cell][None, :] - 2.0 * (x[idx] @ mats[cell].T)
                sub[idx] = np.argmin(scores, axis=1).astype(np.int32)
            out[mask] = sub
        return pd.Series(out)

    return assigned.withColumn(
        "sub", pandas_udf(_assign, "int")(F.col(cell_col), F.col(vec_col))
    )
