"""Spatial range self-join (J3): all point pairs within radius r.

The reference builds graph edges with torch-cluster's ``radius_graph``
(``/root/reference/larennet/larennet.py:55-57``). Spark has no native
r-tree, so we use the standard grid-bucket strategy (SURVEY.md §4.2):

1. bucketize each point to a cell of side ``r`` (floor-div),
2. replicate each point into its 27 neighboring cells (explode of offsets),
3. equi-join points-to-cell replicas on the cell key (one shuffle),
4. exact distance filter.

Any pair within ``r`` is guaranteed to share at least the neighbor-cell of
one endpoint, so the candidate set is complete; the equi-join keeps the
plan shuffle-based (scales linearly with points × 27 instead of N²).

Scale notes: cell population bounds candidate blow-up; for skewed point
clouds AQE skew-join splits hot cells. The 27× replication is applied to
the build side only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ubparquet_spark.operators.voxel import EVENT_KEY


def radius_self_join(
    points: DataFrame,
    radius: float,
    keys: list[str] = EVENT_KEY,
    *,
    coord_cols: tuple[str, str, str] = ("x", "y", "z"),
    id_col: str = "idx",
    include_self: bool = False,
) -> DataFrame:
    """Return pairs ``(a_id, b_id, dist)`` with ``dist <= radius`` within
    each event. Pairs are emitted once per direction (a->b and b->a), like
    ``radius_graph``'s directed edge list; pass ``include_self=False`` to
    drop zero-length self-edges."""
    x, y, z = coord_cols
    cells = [F.floor(F.col(c) / F.lit(radius)).alias(f"_c{c}") for c in coord_cols]
    pts = points.select(
        *keys, F.col(id_col).alias("_id"), x, y, z, *cells
    )

    offsets = F.expr(
        "flatten(transform(sequence(-1,1), dx ->"
        " flatten(transform(sequence(-1,1), dy ->"
        "  transform(sequence(-1,1), dz -> struct(dx, dy, dz))))))"
    )
    # build side: each point replicated into its 27 neighbor cells
    build = (
        pts.select(*keys, "_id", x, y, z, f"_c{x}", f"_c{y}", f"_c{z}",
                   F.explode(offsets).alias("_o"))
        .select(
            *keys,
            F.col("_id").alias("_bid"),
            F.col(x).alias("_bx"),
            F.col(y).alias("_by"),
            F.col(z).alias("_bz"),
            (F.col(f"_c{x}") + F.col("_o.dx")).alias("_kx"),
            (F.col(f"_c{y}") + F.col("_o.dy")).alias("_ky"),
            (F.col(f"_c{z}") + F.col("_o.dz")).alias("_kz"),
        )
    )
    probe = pts.select(
        *keys,
        F.col("_id").alias("_aid"),
        F.col(x).alias("_ax"),
        F.col(y).alias("_ay"),
        F.col(z).alias("_az"),
        F.col(f"_c{x}").alias("_kx"),
        F.col(f"_c{y}").alias("_ky"),
        F.col(f"_c{z}").alias("_kz"),
    )
    joined = probe.join(build, [*keys, "_kx", "_ky", "_kz"])
    # (a-b)*(a-b), never ** 2: Math.pow is only 1-ulp accurate, and pair
    # membership at dist == radius exactly must match an oracle that squares
    # with integer-exact multiplication.
    dx = F.col("_ax") - F.col("_bx")
    dy = F.col("_ay") - F.col("_by")
    dz = F.col("_az") - F.col("_bz")
    dist = F.sqrt(dx * dx + dy * dy + dz * dz)
    out = (
        joined.withColumn("dist", dist)
        .filter(F.col("dist") <= radius)
        .select(*keys, F.col("_aid").alias("a_id"), F.col("_bid").alias("b_id"), "dist")
        .dropDuplicates([*keys, "a_id", "b_id"])
    )
    if not include_self:
        out = out.filter(F.col("a_id") != F.col("b_id"))
    return out


def neighbor_degree_stats(
    edges: DataFrame,
    keys: list[str] = EVENT_KEY,
    *,
    points: DataFrame | None = None,
    id_col: str = "idx",
) -> DataFrame:
    """A11: average neighbor degree per event
    (``larennet/larennet.py:61-62``: ``len(edge_src)/num_nodes``).

    The reference's ``num_nodes`` is the TOTAL point count — isolated
    points (no neighbor within r) are in the denominator. Pass ``points``
    (the radius join's input) to reproduce that exactly; without it the
    denominator falls back to the count of CONNECTED nodes (the only
    number recoverable from the edge list alone), which overstates density
    whenever isolated points exist.

    Nodes LEFT JOIN edge stats: a key group whose points produce no edges
    at all still appears, with n_edges=0 and avg_degree=0.0 (the reference
    computes z = edges/num_nodes = 0 for such a graph)."""
    stats = edges.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_edges"))
    if points is None:
        nodes = edges.groupBy(*keys).agg(
            F.countDistinct("a_id").alias("n_nodes")
        )
    else:
        nodes = points.groupBy(*keys).agg(
            F.countDistinct(id_col).alias("n_nodes")
        )
    return nodes.join(stats, list(keys), "left").select(
        *keys,
        F.coalesce(F.col("n_edges"), F.lit(0).cast("long")).alias("n_edges"),
        "n_nodes",
        F.coalesce(
            F.col("n_edges") / F.col("n_nodes"), F.lit(0.0)
        ).alias("avg_degree"),
    )


def scatter_add(
    edges: DataFrame,
    value_col: str,
    dst_col: str = "b_id",
    keys: list[str] = EVENT_KEY,
) -> DataFrame:
    """A9: group-sum by destination node
    (``larennet/larennet.py:91,99,106``: ``scatter(edge_features, edge_dst)``)."""
    return edges.groupBy(*keys, dst_col).agg(F.sum(value_col).alias(f"sum_{value_col}"))


def scatter_add_vector(
    edges: DataFrame,
    vec_col: str,
    dst_col: str = "b_id",
    keys: list[str] = EVENT_KEY,
) -> DataFrame:
    """A9 for VECTOR features: element-wise sum of array columns per
    destination (the reference scatters k-dim edge features, not scalars).

    Positional explode → scalar partial-aggregatable sum per (dst, dim) →
    re-collect ordered by dim. Scales as a single shuffle keyed by
    (dst, dim); no Python, no per-group quadratic work."""
    dims = (
        edges.select(*keys, dst_col, F.posexplode(vec_col).alias("_dim", "_v"))
        .groupBy(*keys, dst_col, "_dim")
        .agg(F.sum("_v").alias("_s"))
    )
    ordered = F.sort_array(
        F.collect_list(F.struct(F.col("_dim").alias("d"), F.col("_s").alias("s")))
    )
    return (
        dims.groupBy(*keys, dst_col)
        .agg(F.transform(ordered, lambda x: x["s"]).alias(f"sum_{vec_col}"))
    )
