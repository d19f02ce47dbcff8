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


def test_semdedup_cell_cap_guards_degenerate_cells(spark):
    """semdedup_keep: members of a cell larger than the cap take no part in
    pair generation and keep = 1; small cells dedup to keep-lowest-id."""
    import math

    from pyspark.sql import functions as F

    from ubparquet_spark.plans.similarity import semdedup_keep

    dim = 64
    norm = math.sqrt(dim)  # all-ones vectors
    rows = (
        # cell 0: 3 identical members, under cap -> lowest id kept
        [(i, 0, [1.0] * dim, norm) for i in range(3)]
        # cell 1: 6 identical members, OVER cap=4 -> all keep=1
        + [(10 + i, 1, [1.0] * dim, norm) for i in range(6)]
    )
    assigned = spark.createDataFrame(
        rows, "vec_id long, cell int, dvec array<double>, norm double"
    )
    out = {
        r.vec_id: r.keep
        for r in semdedup_keep(assigned, cap=4, threshold=0.35).collect()
    }
    assert len(out) == 9  # every member appears exactly once
    assert out[0] == 1 and out[1] == 0 and out[2] == 0
    assert all(out[10 + i] == 1 for i in range(6))


def test_semdedup_scaled_k_tracks_corpus(spark, sf_dir):
    """The scaled variant's quantizer grain follows corpus size (clamped),
    and every vector lands in the output exactly once."""
    from ubparquet_spark.io import load_table
    from ubparquet_spark.plans.similarity import (
        SEMDEDUP_CELL_TARGET,
        SEMDEDUP_K_MIN,
        q_semantic_dedup_scaled,
    )

    n = load_table(spark, sf_dir, "embeddings").count()
    k_expect = max(SEMDEDUP_K_MIN, n // SEMDEDUP_CELL_TARGET)
    pdf = q_semantic_dedup_scaled(spark, sf_dir).toPandas()
    assert len(pdf) == n and pdf["vec_id"].is_unique
    # every realized cell id lies inside the quantizer's k range; on this
    # corpus the trained cells are all populated
    assert pdf["cell"].nunique() <= k_expect
    assert pdf["cell"].between(0, k_expect - 1).all()


def test_ivf_cell_partitioned_layout_prunes_files(spark, sf_dir, tmp_path):
    """The SCALING.md claim 'with vectors written partitioned by cell id,
    the probe prunes whole files at the source': write the corpus
    partitioned by assigned cell, probe one cell, and assert the scan
    carries a PartitionFilters entry on the cell column (source-level
    pruning, not a post-scan filter) and returns exactly the cell's
    members."""
    from pyspark.sql import functions as F

    from ubparquet_spark.io import load_table, write_parquet
    from ubparquet_spark.operators.kmeans import assign_clusters, kmeans_fit

    from .test_plans_physical import plan_text

    emb = load_table(spark, sf_dir, "embeddings")
    cents = kmeans_fit(emb, 4, rounds=2)
    assigned = assign_clusters(emb, cents).select(
        "vec_id", "embedding", F.col("cluster").alias("cell")
    )
    path = str(tmp_path / "ivf_cells")
    write_parquet(assigned, path, partition_by=["cell"])

    probe = spark.read.parquet(path).filter(F.col("cell") == 1)
    plan = plan_text(probe)
    idx = plan.index("PartitionFilters")
    assert "cell" in plan[idx:].splitlines()[0], (
        "cell predicate did not reach the source as a partition filter"
    )
    got = sorted(r["vec_id"] for r in probe.collect())
    want = sorted(
        r["vec_id"] for r in assigned.filter(F.col("cell") == 1).collect()
    )
    assert got == want and got


def test_embedding_dim_audit_golden(spark, tmp_path):
    """Hand-computed per-dimension stats: a dead dim (all zeros), a
    constant non-zero dim, and a varying dim."""
    import pyspark.sql.functions as F

    from ubparquet_spark.plans.similarity import q_embedding_dim_audit

    rows = [
        (1, [0.0, 2.5, 1.0], 7),
        (2, [0.0, 2.5, 3.0], 7),
        (3, [0.0, 2.5, 2.0], 8),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    d = str(tmp_path / "sf_dim")
    df.write.parquet(f"{d}/embeddings.parquet")
    out = {r.dim: r for r in q_embedding_dim_audit(spark, d).collect()}

    assert out[0].n_zero == 3 and out[0].is_constant and out[0].std_v == 0.0
    assert out[1].mean_v == 2.5 and out[1].is_constant and out[1].n_zero == 0
    d2 = out[2]
    assert (d2.min_v, d2.max_v, d2.mean_v) == (1.0, 3.0, 2.0)
    # std = sqrt(((1-2)^2 + (3-2)^2 + (2-2)^2)/3) = sqrt(2/3)
    assert abs(d2.std_v - (2.0 / 3.0) ** 0.5) < 1e-5 and not d2.is_constant
    assert all(r.n_vecs == 3 for r in out.values())


def test_hard_negatives_semantics(spark, sf_dir):
    """Every mined negative carries a different label than its anchor,
    anchors respect the mod gate, and ranks are dense from 1."""
    import pyspark.sql.functions as F

    from ubparquet_spark.plans.similarity import (
        HN_ANCHOR_MOD,
        HN_K,
        q_hard_negatives,
    )
    from ubparquet_spark.io import load_table

    out = q_hard_negatives(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "label")
    j = (
        out.join(emb.withColumnRenamed("vec_id", "anchor_id")
                    .withColumnRenamed("label", "a_label"), "anchor_id")
        .join(emb.withColumnRenamed("vec_id", "negative_id")
                 .withColumnRenamed("label", "n_label"), "negative_id")
    )
    rows = j.collect()
    assert len(rows) > 0
    assert all(r.a_label != r.n_label for r in rows)
    assert all(r.anchor_id % HN_ANCHOR_MOD == 0 for r in rows)
    per = {}
    for r in rows:
        per.setdefault(r.anchor_id, []).append(r.rank)
    assert all(sorted(v) == list(range(1, len(v) + 1)) and len(v) <= HN_K
               for v in per.values())

def test_semdedup_quality_keep_policy(spark):
    """Quality-aware keep (round 10): within every connected ε-component
    the max-quality member is kept; ties break to lowest vec_id; NULL
    quality sorts lowest; the cell cap still guards degenerate cells."""
    import math

    from ubparquet_spark.plans.similarity import semdedup_keep

    dim = 64
    norm = math.sqrt(dim)
    ones = [1.0] * dim
    rows = [
        # cell 0: 3 identical members — HIGHEST quality (id 2) wins,
        # not the lowest id
        (0, 0, ones, norm, 0.10),
        (1, 0, ones, norm, 0.50),
        (2, 0, ones, norm, 0.90),
        # cell 1: quality tie — lowest id (10) wins
        (10, 1, ones, norm, 0.40),
        (11, 1, ones, norm, 0.40),
        # cell 2: NULL quality loses to any scored member
        (20, 2, ones, norm, None),
        (21, 2, ones, norm, 0.05),
        # cell 3: all-NULL quality — lowest id wins
        (30, 3, ones, norm, None),
        (31, 3, ones, norm, None),
    ]
    assigned = spark.createDataFrame(
        rows,
        "vec_id long, cell int, dvec array<double>, norm double,"
        " quality double",
    )
    out = {
        r.vec_id: r.keep
        for r in semdedup_keep(
            assigned, cap=4, threshold=0.35, quality_col="quality"
        ).collect()
    }
    assert len(out) == 9
    assert (out[0], out[1], out[2]) == (0, 0, 1)
    assert (out[10], out[11]) == (1, 0)
    assert (out[20], out[21]) == (0, 1)
    assert (out[30], out[31]) == (1, 0)
    # over-cap cell: everyone keeps
    big = spark.createDataFrame(
        [(40 + i, 9, ones, norm, float(i)) for i in range(6)],
        "vec_id long, cell int, dvec array<double>, norm double,"
        " quality double",
    )
    out2 = {
        r.vec_id: r.keep
        for r in semdedup_keep(
            big, cap=4, threshold=0.35, quality_col="quality"
        ).collect()
    }
    assert all(out2[40 + i] == 1 for i in range(6))


def test_semdedup_quality_component_max_is_kept(spark, sf_dir):
    """Property (VERDICT r09 #6 done-criterion): on the real corpus, for
    every connected component of the within-cell ε-graph, the member with
    the maximum quality (tie-break lowest vec_id) has keep = 1."""
    import numpy as np

    from ubparquet_spark.plans.similarity import (
        SEMDEDUP_CELL_CAP,
        SEMDEDUP_THRESHOLD,
        q_semantic_dedup_quality,
    )

    pdf = q_semantic_dedup_quality(spark, sf_dir).toPandas()
    emb = {
        r.vec_id: np.asarray(r.embedding, dtype="float64")
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", "embedding")
        .collect()
    }
    qual = dict(zip(pdf.vec_id, pdf.quality))
    kept = dict(zip(pdf.vec_id, pdf.keep))

    def cos(a, b):
        d = float(a @ b) / (np.sqrt(a @ a) * np.sqrt(b @ b))
        return np.floor(d * 1e6 + 0.5) / 1e6

    checked_components = 0
    for cell, grp in pdf.groupby("cell"):
        ids = sorted(grp.vec_id)
        if len(ids) > SEMDEDUP_CELL_CAP:
            continue  # capped cell: keep=1 for all, policy not in play
        # union-find over the ε-graph
        parent = {i: i for i in ids}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a, b = ids[i], ids[j]
                if cos(emb[a], emb[b]) >= SEMDEDUP_THRESHOLD:
                    parent[find(a)] = find(b)
        comps = {}
        for i in ids:
            comps.setdefault(find(i), []).append(i)
        for members in comps.values():
            best = min(
                members,
                key=lambda i: (-(qual[i] if qual[i] == qual[i] else -1.0), i),
            )
            assert kept[best] == 1, (cell, members, best)
            checked_components += 1
    assert checked_components > 0
