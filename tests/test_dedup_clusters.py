"""Connected components vs a pure-Python union-find ground truth."""

from __future__ import annotations

import random

from ubparquet_spark.functions.dedup_clusters import connected_components, dedup_groups


def _union_find(n, edges):
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical = min element of each set
    comp_min = {}
    for x in range(n):
        r = find(x)
        comp_min.setdefault(r, min(i for i in range(n) if find(i) == r))
    return {x: comp_min[find(x)] for x in range(n)}


def test_components_match_union_find(spark):
    random.seed(13)
    n = 60
    edges = [(random.randrange(n), random.randrange(n)) for _ in range(45)]
    edges = [(a, b) for a, b in edges if a != b]
    expected = _union_find(n, edges)
    edf = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.component for r in connected_components(edf).collect()}
    for node, comp in got.items():
        assert comp == expected[node]


def test_chain_requires_iterations(spark):
    # a path 0-1-2-...-9 has diameter 9: exercises multi-round convergence
    edges = [(i, i + 1) for i in range(9)]
    edf = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.component for r in connected_components(edf).collect()}
    assert got == {i: 0 for i in range(10)}


def test_distributed_path_matches_local(spark, monkeypatch):
    """Round-11 size dispatch: below CC_LOCAL_EDGE_CAP a driver union-find
    replaces the per-round job loop. Force the distributed loop (cap -1)
    and assert both strategies produce identical labels on a graph with a
    long chain (multi-round convergence) plus random clutter."""
    import ubparquet_spark.functions.dedup_clusters as dc

    random.seed(29)
    n = 40
    edges = [(i, i + 1) for i in range(9)] + [
        (random.randrange(10, n), random.randrange(10, n)) for _ in range(25)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    edf = spark.createDataFrame(edges, "src long, dst long")
    local = {r.node: r.component for r in connected_components(edf).collect()}
    monkeypatch.setattr(dc, "CC_LOCAL_EDGE_CAP", -1)
    dist = {r.node: r.component for r in connected_components(edf).collect()}
    assert dist == local


def test_dedup_groups_canonical_flags(spark):
    ids = spark.createDataFrame([(i,) for i in range(8)], "doc_id long")
    edges = spark.createDataFrame([(1, 2), (2, 3), (5, 6)], "src long, dst long")
    out = {r.doc_id: (r.canonical_id, r.is_canonical) for r in dedup_groups(edges, ids, "doc_id").collect()}
    assert out[1] == (1, True) and out[2] == (1, False) and out[3] == (1, False)
    assert out[5] == (5, True) and out[6] == (5, False)
    # singletons are their own canonical
    assert out[0] == (0, True) and out[4] == (4, True) and out[7] == (7, True)


def test_padding_rows_never_cluster(spark):
    """Padding-row contract at the dedup API layer (round 7): zero-norm
    embeddings produce NULL cosine upstream, so they contribute NO edges
    — dedup_groups over an empty edge set must mark every id (including
    the padding rows) its own canonical representative, and
    connected_components over no edges returns no labels at all."""
    from pyspark.sql import functions as F

    from ubparquet_spark.functions.dedup_clusters import (
        connected_components,
        dedup_groups,
    )

    edges = spark.createDataFrame([], "src long, dst long")
    assert connected_components(edges).count() == 0

    ids = spark.createDataFrame([(i,) for i in range(5)], "vec_id long")
    out = dedup_groups(edges, ids, "vec_id").collect()
    assert len(out) == 5
    assert all(r.is_canonical and r.canonical_id == r.vec_id for r in out)
