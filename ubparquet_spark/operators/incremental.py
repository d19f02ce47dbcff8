"""Incremental aggregate maintenance via mergeable partial states.

The 100 TB pattern this enables: a lake appends a partition per
day/hour/file-batch, and the pipeline wants corpus-level statistics
(row counts, exact sums, min/max bounds, approximate distincts) kept
current WITHOUT rescanning history. The classic solution — summary
tables maintained from deltas (Gray et al., "Data Cube", and every
warehouse's incremental materialized view) — needs every statistic to
be carried as a MERGEABLE STATE, not a finalized value:

========== =========================== ===========================
statistic  state                       merge
========== =========================== ===========================
count      n (long)                    sum
sum        exact decimal(38,6)         sum (order-independent)
min / max  typed value                 min / max
distinct   HLL sketch (binary)         register-wise union
========== =========================== ===========================

``agg_state`` produces one state row per key from a delta (ONE
partial-aggregatable shuffle over just that delta), ``merge_states``
folds any number of state tables (work is O(total state rows) — at a
day per state that is ~365 tiny rows/key/year, never the fact table),
and ``finalize_state`` projects the human-readable metrics. The
algebra is associative and commutative, so daily fold-left, monthly
tree-merge, and one-shot full recompute all agree — pinned by tests.

Exactness policy: counts/mins/maxs are exact by construction; sums are
exact because they accumulate in ``decimal(38,6)`` (order-independent
decimal addition — the repo-wide convention that keeps Spark and
DuckDB hash-identical; a double fold would drift by addition order,
which is fatal for a state that must equal the full recompute
bit-for-bit). Distincts are Apache DataSketches HLL sketches, and their
guarantee is the sketch's, not bit-equality: at LOW cardinality the
sketch is in exact coupon mode, so the merged estimate equals the
single-shot estimate exactly; past the coupon→HLL transition the union
(register-wise max) can land in a slightly different register state
than the single-shot sketch, and merged vs single-shot estimates differ
within the configured error (measured at sf0.1: 1488 vs 1480–1499
against an exact 1500, lgK=12 ≈ 1.6% rsd). Both regimes are pinned by
tests; the DRIVER-checked q_incremental_stats carries only the exact
fields.

NULL policy: ``n_rows`` counts all delta rows; sums/mins/maxs/sketches
skip NULLs (aggregate semantics, identical in DuckDB) — so a merged
state over parts equals the recompute even when NULLs concentrate in
one delta.

Reference parity: the reference's only corpus statistics are one-shot
whole-file scans (``/root/reference/readparquet.py:8`` materializes the
full table per query); this operator is the Spark-first replacement
that keeps those statistics maintainable at lake scale.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: DataSketches HLL lgConfigK: 2^12 registers, ~1.6% relative error —
#: the same accuracy class as q_sketch_stats' approx_count_distinct.
HLL_LGK = 12

_META = "_incr_meta"


def _spec_cols(
    sums: Sequence[str],
    mins: Sequence[str],
    maxs: Sequence[str],
    distincts: Sequence[str],
) -> list[str]:
    out = [f"sum_{c}" for c in sums]
    out += [f"min_{c}" for c in mins]
    out += [f"max_{c}" for c in maxs]
    out += [f"hll_{c}" for c in distincts]
    return out


def agg_state(
    delta: DataFrame,
    keys: Sequence[str],
    *,
    sums: Sequence[str] = (),
    mins: Sequence[str] = (),
    maxs: Sequence[str] = (),
    distincts: Sequence[str] = (),
    lgk: int = HLL_LGK,
) -> DataFrame:
    """One mergeable state row per ``keys`` group of ``delta``.

    Columns: ``n_rows`` plus ``sum_<c>`` (decimal(38,6)), ``min_<c>`` /
    ``max_<c>`` (input type), ``hll_<c>`` (binary DataSketches HLL).
    One partial-aggregatable shuffle over the delta only.
    """
    keys = list(keys)
    aggs: list[Column] = [F.count(F.lit(1)).alias("n_rows")]
    for c in sums:
        aggs.append(F.sum(F.col(c).cast("decimal(38,6)")).alias(f"sum_{c}"))
    for c in mins:
        aggs.append(F.min(c).alias(f"min_{c}"))
    for c in maxs:
        aggs.append(F.max(c).alias(f"max_{c}"))
    for c in distincts:
        aggs.append(F.hll_sketch_agg(c, F.lit(lgk)).alias(f"hll_{c}"))
    return delta.groupBy(*keys).agg(*aggs)


def merge_states(states: Sequence[DataFrame], keys: Sequence[str]) -> DataFrame:
    """Fold any number of ``agg_state`` tables into one.

    Union + one groupBy over STATE rows (days, not facts): counts and
    decimal sums re-sum, min/min and max/max compose, HLL sketches
    union register-wise. A key present in only some states merges
    correctly because the group simply has fewer input rows — no outer
    join, no NULL-fill step.
    """
    keys = list(keys)
    if not states:
        raise ValueError("merge_states needs at least one state table")
    unioned = reduce(lambda a, b: a.unionByName(b), states)
    aggs: list[Column] = []
    for name in unioned.columns:
        if name in keys:
            continue
        if name == "n_rows":
            aggs.append(F.sum("n_rows").alias("n_rows"))
        elif name.startswith("sum_"):
            # decimal re-sum widens to (38,6) max precision: cast back so
            # repeated merges keep a stable schema
            aggs.append(
                F.sum(name).cast("decimal(38,6)").alias(name)
            )
        elif name.startswith("min_"):
            aggs.append(F.min(name).alias(name))
        elif name.startswith("max_"):
            aggs.append(F.max(name).alias(name))
        elif name.startswith("hll_"):
            aggs.append(F.hll_union_agg(name).alias(name))
        else:
            raise ValueError(f"unrecognized state column {name!r}")
    return unioned.groupBy(*keys).agg(*aggs)


def finalize_state(state: DataFrame) -> DataFrame:
    """Project the human-readable metrics from a state table: every
    ``hll_<c>`` sketch becomes ``distinct_<c>`` (long), everything else
    passes through."""
    cols: list[Column] = []
    for name in state.columns:
        if name.startswith("hll_"):
            cols.append(
                F.hll_sketch_estimate(name).alias("distinct_" + name[4:])
            )
        else:
            cols.append(F.col(name))
    return state.select(*cols)


def maintain_state(
    existing: DataFrame | None,
    delta: DataFrame,
    keys: Sequence[str],
    **spec,
) -> DataFrame:
    """One maintenance step: fold a new delta into the running state
    (``existing`` None = bootstrap). This is the loop body for a daily
    batch job or a ``foreachBatch`` streaming sink — each call costs one
    scan of the DELTA plus a state-sized merge."""
    new = agg_state(delta, keys, **spec)
    if existing is None:
        return new
    return merge_states([existing, new], keys)
