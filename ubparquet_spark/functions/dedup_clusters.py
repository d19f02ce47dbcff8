"""Near-duplicate clustering: connected components over candidate pairs.

After MinHash-LSH banding (``plans.text.q_minhash_lsh_buckets``) or
embedding near-dup pairing (``plans.similarity.q_embedding_neardup``), a
dedup pipeline must group transitively-connected documents and pick one
canonical representative per group. This is connected components on the
candidate-pair graph — an iterative algorithm (no single SQL expression),
implemented as label propagation:

  every node starts labeled with its own id; each round, every node adopts
  the minimum label in its neighborhood; stop when no label changes.

Rounds needed = graph diameter (small for near-dup clusters); each round is
two shuffles (join + groupBy-min). At 100 TB scale this is the standard
map-reduce CC ("hash-to-min"): state is one (node, label) pair per node,
convergence is detected with a cheap count of changed labels.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Below this many (directed) edge rows the component computation runs as a
# driver-side union-find over the collected edge list instead of the
# iterative label-propagation loop. Rationale (round 11, guide §1.2/§5):
# the distributed loop costs 2 driver-synchronized jobs PER ROUND
# (checkpoint + convergence count) — pure fixed overhead when the edge
# list is small — while near-dup edge sets are candidate-pair-scale, i.e.
# O(duplicate pairs), exactly the magnitude the loop already collects
# per-round convergence counts over and localCheckpoints. 2M edges ≈ 32 MB
# of longs on the driver: a bounded model-artifact-sized collect, NOT a
# corpus-sized one; above the cap the loop runs unchanged, so the 100 TB
# path is identical. Deterministic either way (component = min reachable
# id). Env-tunable for clusters with bigger/smaller driver heads.
CC_LOCAL_EDGE_CAP = int(os.environ.get("UBSPARK_CC_LOCAL_EDGE_CAP", 2_000_000))


def _local_components(sym: DataFrame, edge_rows: list) -> DataFrame:
    """Driver union-find over a bounded, already-collected edge list:
    (node, component = min reachable id) — value-identical to the
    distributed loop's fixpoint."""
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for a, b in edge_rows:
        if a not in parent:
            parent[a] = a
        if b not in parent:
            parent[b] = b
        ra, rb = find(a), find(b)
        if ra == rb:
            continue
        if rb < ra:
            ra, rb = rb, ra
        parent[rb] = ra  # lower-id root wins -> root IS the min id
    rows = [(n, find(n)) for n in parent]
    schema = sym.select(
        F.col("a").alias("node"), F.col("a").alias("component")
    ).schema
    return sym.sparkSession.createDataFrame(rows, schema)


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    max_iterations: int = 20,
    assume_distinct: bool = False,
) -> DataFrame:
    """Return (node, component) where component = min node id reachable.

    ``edges`` is an undirected pair list; isolated nodes absent from it are
    their own components by definition (callers union them in).
    ``assume_distinct=True`` skips the symmetrization dedup shuffle — safe
    whenever the caller guarantees distinct pairs with ``src < dst`` (the
    LSH candidate pipeline does), since then the two union branches cannot
    collide."""
    sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).unionByName(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    )
    if not assume_distinct:
        sym = sym.distinct()
    # materialize ONCE: sym is joined every round — without this, the
    # whole upstream candidate-pair pipeline (e.g. MinHash banding +
    # Jaccard verification) re-executes per iteration
    sym = sym.localCheckpoint(eager=False)
    # size dispatch in ONE bounded job: limit(cap + 1) can never pull more
    # than cap + 1 rows to the driver, and when it returns <= cap rows
    # that IS the full edge list — no separate count pass
    if CC_LOCAL_EDGE_CAP >= 0:
        head = sym.limit(CC_LOCAL_EDGE_CAP + 1).collect()
        if len(head) <= CC_LOCAL_EDGE_CAP:
            return _local_components(sym, head)
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )
    for _ in range(max_iterations):
        neighbor_min = (
            sym.join(labels, sym.b == labels.node)
            .groupBy("a")
            .agg(F.min("component").alias("nbr_min"))
        )
        # the convergence signal rides the SAME frame as the new labels
        # (a `_changed` flag computed in the join projection), so each
        # round is exactly two jobs: the checkpoint materialization and a
        # scan-only count over the materialized result — not a third
        # labels-vs-labels join per round
        updated = (
            labels.join(neighbor_min, labels.node == neighbor_min.a, "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce(F.col("nbr_min"), F.col("component"))
                ).alias("component"),
                (F.coalesce(F.col("nbr_min"), F.col("component")) < F.col("component")
                 ).alias("_changed"),
            )
        )
        # checkpoint FIRST, then count changes from the materialized frame
        # — counting from `updated` directly would execute its join+agg
        # lineage once for the count and again for the checkpoint
        new_labels = updated.localCheckpoint(eager=False)
        changed = new_labels.filter(F.col("_changed")).count()
        labels = new_labels.drop("_changed")
        if changed == 0:
            break
    return labels


def dedup_groups(
    edges: DataFrame,
    all_ids: DataFrame,
    id_col: str,
    src: str = "src",
    dst: str = "dst",
    *,
    assume_distinct: bool = False,
) -> DataFrame:
    """Full dedup decision table: every id mapped to its canonical
    representative (min id of its component; singletons map to themselves)
    plus an ``is_canonical`` flag — the keep/drop list of a dedup job."""
    comps = connected_components(edges, src, dst, assume_distinct=assume_distinct)
    out = (
        all_ids.select(F.col(id_col).alias("node"))
        .join(comps, "node", "left")
        .select(
            F.col("node").alias(id_col),
            F.coalesce("component", F.col("node")).alias("canonical_id"),
        )
        .withColumn("is_canonical", F.col(id_col) == F.col("canonical_id"))
    )
    return out
