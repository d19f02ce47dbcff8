"""Skew-mitigation operators: salting for hot keys.

At 100 TB, a handful of hot keys (a viral user_id, the background-instance
label 0, an empty-string token) can pin one reducer while the rest idle. AQE
(`spark.sql.adaptive.skewJoin`, on in `session.py`) splits skewed *join*
partitions at runtime; these helpers cover the cases AQE doesn't:
skewed **aggregations** whose partials don't combine and
**broadcast-infeasible skewed joins** AQE can't split.

- :func:`salted_aggregate` — two-stage agg: group on (key, salt) first so the
  hot key's rows spread over ``n_salts`` reducers, then combine partials.
- :func:`salted_join` — replicate the small-but-not-broadcastable side
  ``n_salts`` times; big side picks a random salt. Every hot-key partition
  shrinks by ``n_salts``.

Measured guidance (``examples/skew_stress.py``, 10M rows with ONE key
holding 30 % — BENCHNOTES "Round-6: skew helpers"): for the ALGEBRAIC
aggregates this helper supports, plain ``groupBy`` already wins — Spark's
partial aggregation spreads the hot key across every mapper, so salting
just adds a shuffle level (0.99s vs 1.55s). Reach for
:func:`salted_aggregate` only when the partial state itself is
key-concentrated (collect/distinct-style paths, or engines without
map-side combine). :func:`salted_join` wins where the hot partition pays
a SORT — sort-merge joins (2.01s → 1.45s measured; AQE's skew split
recovers most of that automatically) — and LOSES on hash-shaped joins
(the ``n_salts``× small-side replication buys nothing a linear probe
didn't already absorb). Default playbook: AQE on, joins hash-shaped,
salting as the manual fallback for sort-shaped skew AQE cannot see
(streaming joins, AQE-off clusters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple],
    *,
    n_salts: int = 16,
    seed: int = 0,
) -> DataFrame:
    """Two-stage skew-safe aggregation.

    ``aggs`` maps output name -> (kind, column) with kind in
    {'sum', 'count', 'min', 'max'}. Stage 1 groups by (keys + salt) — the
    map-side/partial stage with bounded per-reducer fan-in; stage 2 combines
    partials per key. Result equals a direct groupBy (tested)."""
    stage1 = []
    stage2 = []
    for name, (kind, col) in aggs.items():
        c = F.col(col) if isinstance(col, str) else col
        if kind == "sum":
            stage1.append(F.sum(c).alias(f"_p_{name}"))
            stage2.append(F.sum(f"_p_{name}").alias(name))
        elif kind == "count":
            stage1.append(F.count(c).alias(f"_p_{name}"))
            stage2.append(F.sum(f"_p_{name}").alias(name))
        elif kind == "min":
            stage1.append(F.min(c).alias(f"_p_{name}"))
            stage2.append(F.min(f"_p_{name}").alias(name))
        elif kind == "max":
            stage1.append(F.max(c).alias(f"_p_{name}"))
            stage2.append(F.max(f"_p_{name}").alias(name))
        else:
            raise ValueError(f"unsupported aggregate kind: {kind}")
    partial = df.withColumn("_salt", F.floor(F.rand(seed) * n_salts)) \
        .groupBy(*keys, "_salt").agg(*stage1)
    return partial.groupBy(*keys).agg(*stage2)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    *,
    n_salts: int = 8,
    seed: int = 0,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: big side draws a random salt in [0, n_salts),
    small side is replicated across all salts, join key becomes
    (key, salt). Semantically identical to ``big.join(small, on)`` for
    inner/left joins on unique small-side keys (tested)."""
    big_s = big.withColumn("_salt", F.pmod(F.xxhash64(F.rand(seed)), F.lit(n_salts)))
    small_s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<long>"))
    )
    out = big_s.join(small_s, [on, "_salt"], how)
    return out.drop("_salt")
