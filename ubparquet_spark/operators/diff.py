"""Snapshot diff: CDC-style row-level change detection between two
snapshots of the same keyed table.

The lakehouse maintenance primitive behind incremental syncs, audit
trails, and "what changed since yesterday" debugging: given OLD and NEW
snapshots sharing a key, emit one row per added / removed / changed key
and drop the (normally overwhelming) unchanged majority.

Shape at 100 TB: each snapshot gets a narrow scan-side row fingerprint
(md5 over the compared columns — no data widening), then ONE full-outer
shuffle join on the key decides the change class per key. Cost is the
two scans plus a single key-partitioned exchange of (key, hash) pairs —
never a column-by-column comparison matrix, and nothing is collected to
the driver. Works unchanged as a ``foreachBatch`` monitor body (diff the
incoming micro-batch against a dimension snapshot).

Fingerprint contract: compared columns are stringified with an explicit
NULL sentinel and a non-printing separator, so ``NULL`` vs ``''`` and
column-boundary ambiguities cannot collide. Callers should pre-quantize
floating-point columns (e.g. cents as BIGINT) — raw doubles stringify
differently across engines and make fingerprints non-portable.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: unit-separator / NULL sentinel pair — outside any normal value alphabet
_SEP = "\x1f"
_NULL = "\x00"


def row_fingerprint(cols: Sequence[str]):
    """md5 fingerprint column over ``cols`` (order-sensitive, null-safe)."""
    parts = [
        F.coalesce(F.col(c).cast("string"), F.lit(_NULL)) for c in cols
    ]
    return F.md5(F.concat_ws(_SEP, *parts))


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str],
) -> DataFrame:
    """Added / removed / changed keys between ``old`` and ``new``.

    Returns ``keys + change + old_fp + new_fp`` where ``change`` is one of
    ``'added'`` (key only in new), ``'removed'`` (key only in old),
    ``'changed'`` (key in both, fingerprints differ). Unchanged keys are
    filtered out inside the join, so the output is proportional to the
    churn, not the table. Keys must be unique per snapshot (enforce
    upstream; duplicate keys make 'changed' ill-defined)."""
    keys = list(keys)
    fp = row_fingerprint(compare_cols)
    o = old.select(*keys, fp.alias("old_fp"))
    n = new.select(*keys, fp.alias("new_fp"))
    joined = o.join(n, keys, "full_outer")
    change = (
        F.when(F.col("old_fp").isNull(), F.lit("added"))
        .when(F.col("new_fp").isNull(), F.lit("removed"))
        .otherwise(F.lit("changed"))
    )
    return (
        joined.filter(
            F.col("old_fp").isNull()
            | F.col("new_fp").isNull()
            | (F.col("old_fp") != F.col("new_fp"))
        )
        .select(*keys, change.alias("change"), "old_fp", "new_fp")
    )


def change_feed(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str],
) -> DataFrame:
    """Full-row CDC feed: :func:`snapshot_diff` plus the NEW row payload.

    Added/changed rows carry the new snapshot's values; removed rows carry
    the key with null payload. Columns: ``new.columns + change``. The diff
    is key-skinny until the single payload join, which touches only
    churned keys — feed cost stays proportional to churn."""
    keys = list(keys)
    d = snapshot_diff(old, new, keys, compare_cols).select(*keys, "change")
    payload = d.filter(F.col("change") != "removed").join(new, keys, "left")
    # single select (not a withColumn-per-column loop): the loop form
    # grows the analyzed plan linearly in column count on wide tables
    types = dict(new.dtypes)
    removed = d.filter(F.col("change") == "removed").select(
        *keys,
        *[
            F.lit(None).cast(types[c]).alias(c)
            for c in new.columns
            if c not in keys
        ],
        "change",
    )
    return payload.select(*new.columns, "change").unionByName(
        removed.select(*new.columns, "change")
    )


def apply_changes(
    base: DataFrame,
    feed: DataFrame,
    keys: Sequence[str],
    *,
    change_col: str = "change",
) -> DataFrame:
    """MERGE a CDC feed into ``base``: upsert added/changed, drop removed.

    ``feed`` holds full rows (base schema + ``change_col``). Semantics:
    base keys absent from the feed pass through; feed rows with
    ``change != 'removed'`` replace/insert; ``'removed'`` keys disappear.
    Plan shape: ONE left-anti key join (base exchanges once on the key;
    the feed side is churn-proportional) + a union — the distributed
    MERGE INTO. Invariant (tested): applying
    :func:`change_feed`(old, new) onto ``old`` reproduces ``new``
    exactly. Keys must be unique in both inputs."""
    keys = list(keys)
    survivors = base.join(feed.select(*keys), keys, "left_anti")
    upserts = feed.filter(F.col(change_col) != "removed").select(
        *base.columns
    )
    return survivors.unionByName(upserts)
