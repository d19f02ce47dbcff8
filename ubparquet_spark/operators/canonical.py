"""Key canonicalization: the remediation step behind the key-integrity gate.

``q_key_integrity`` (plans/tpch.py) *detects* primary-key contract
violations — re-delivered rows, at-least-once ingestion, upstream bugs —
but until round 8 there was no documented *remediation* operator to run
when the gate flags a table.  ``canonicalize_keys`` is that step: a
deterministic latest/first-row-per-key compaction (the
``q_latest_event_per_user`` shape from plans/events.py) that restores the
uniqueness contract so the pair generators and ranked machinery downstream
(operators/spatial.py, functions/minhash_dedup.py, operators/ranks.py)
see the key semantics they assume.

Reference parity: the reference engine assumes unique (run, subrun,
event) keys at ingest (root2parquet.py builds one output row per TTree
entry); re-delivered files simply produce duplicate rows there with no
remediation path at all — this operator is the Spark-first upgrade.

Scale: ONE shuffle on the key columns, then a per-group row_number —
the standard CDC-compaction plan at 100 TB.  AQE skew-join splitting
applies to the exchange; no global window, no driver materialization.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["canonicalize_keys"]


def canonicalize_keys(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column | str],
    *,
    keep: str = "first",
) -> DataFrame:
    """Compact ``df`` to exactly one row per ``keys`` group.

    ``order_by`` ranks the candidate rows inside each key group;
    ``keep="first"`` keeps the lowest-ranked row, ``keep="last"`` the
    highest.  For a deterministic winner the ordering must be a TOTAL
    order within every group — pass a final unique tiebreak column
    (ingest offset, file+row position, a content hash) the way
    ``q_latest_event_per_user`` tiebreaks on ``event_id``.  The operator
    cannot verify totality (that would cost a second shuffle), so it is
    a documented contract, same as key uniqueness itself.

    NULL key values are grouped together (Spark ``groupBy``/``Window``
    null-equality semantics) and compacted like any other group — the
    gate counts them as keys, so remediation must not silently drop
    them; filter NULL keys explicitly first if the table's contract
    forbids them.

    Returns ``df`` with its original columns and order, one row per key.
    Typical flow::

        audit = q_key_integrity(spark, sf_dir)          # gate
        clean = canonicalize_keys(df, ["l_orderkey", "l_linenumber"],
                                  [F.col("ingest_ts").desc(), "row_hash"])
        # contract-bound plans now agree with the oracle on `clean`
    """
    if keep not in ("first", "last"):
        raise ValueError(f"keep must be 'first' or 'last', got {keep!r}")
    keys = list(keys)
    if not keys:
        raise ValueError("canonicalize_keys needs at least one key column")
    ordering = [F.col(c) if isinstance(c, str) else c for c in order_by]
    if not ordering:
        raise ValueError(
            "canonicalize_keys needs an order_by (a total order per group) "
            "to pick a deterministic winner"
        )
    if keep == "last":
        # Flip via descending row_number rather than reversing each
        # Column (a Column's sort direction isn't introspectable).
        w = Window.partitionBy(*keys).orderBy(*ordering)
        rn = F.count(F.lit(1)).over(
            Window.partitionBy(*keys).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ) - F.row_number().over(w) + F.lit(1)
    else:
        w = Window.partitionBy(*keys).orderBy(*ordering)
        rn = F.row_number().over(w)
    out_cols = df.columns
    return (
        df.withColumn("_ub_rn", rn)
        .filter(F.col("_ub_rn") == 1)
        .select(*out_cols)
    )
