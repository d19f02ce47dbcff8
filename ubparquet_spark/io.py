"""Parquet sources and sinks.

Covers SURVEY.md §2.1: lazy multi-file scan with schema merge (S7, reference
``larmatch2d/larmatch_dataset.py:93,246``), eager-reader replacement (S6,
``readparquet.py:8-11``), file-list/manifest sources (S10,
``larvoxel_dataset.py:19-43``), compressed sinks (S4/S5,
``root2parquet.py:84-85``, ``make_larmatch_parquet_data.py:103-105``).

All reads are lazy DataFrames — Catalyst handles column pruning (the
reference's declared read-set, ``dlmerged2parquet.py:32-50``) and predicate
pushdown to Parquet row groups automatically.
"""

from __future__ import annotations

import os
import re
from collections.abc import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: the driver's synthetic tables (TESTDATA.md)
DRIVER_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


#: (session id, sf_dir, table) -> DataFrame; avoids re-listing files and
#: re-reading Parquet footers on every call (a multi-join query loads the
#: same tables repeatedly — the logical plan is immutable, so sharing is safe)
_table_cache: dict[tuple, DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver table from a scale-factor directory.

    ``events.ts`` is TIMESTAMP(NANOS) parquet, which Spark 4 rejects by
    default; we read it as long (``nanosAsLong``) and truncate to
    microseconds — the same conversion DuckDB applies, so oracle
    comparisons agree."""
    # applicationId is unique per SparkContext (embeds start time) —
    # id(spark) could be reused by CPython after a stopped session is GC'd,
    # handing out cached DataFrames bound to a dead session
    key = (spark.sparkContext.applicationId, sf_dir, name)
    cached = _table_cache.get(key)
    if cached is not None:
        return cached
    df = _load_table_uncached(spark, sf_dir, name)
    _table_cache[key] = df
    return df


def _load_table_uncached(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # epoch-nanos -> naive-UTC wall time. timestamp_micros yields a
        # session-tz-dependent LTZ value, so pin the session to UTC and cast
        # to TIMESTAMP_NTZ: results are then independent of whatever timezone
        # the caller's session was created with (the other tables read as NTZ
        # directly from Parquet).
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        from pyspark.sql import functions as F

        df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn(
                "ts",
                F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz"),
            )
        return df
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(
    spark: SparkSession, sf_dir: str, names: Iterable[str] = DRIVER_TABLES
) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(
    spark: SparkSession,
    sf_dir: str,
    names: Iterable[str] | None = None,
    *,
    prefix: str = "",
) -> list[str]:
    """Expose the tables as SQL temp views (named ``<prefix><table>``) so
    the whole engine surface is reachable through ``spark.sql(...)`` —
    schema-on-read, no catalog service (the reference's dynamic-schema
    position, SURVEY.md §1.3). ``events.ts`` gets the same
    nanos→timestamp_ntz normalization as ``load_table``, so SQL over the
    views builds identical Catalyst plans to the DataFrame API. Lazy: one
    schema read per table, no scan. Returns the view names.

    ``names=None`` means all driver tables; an explicit empty iterable
    registers nothing (no truthiness fallback)."""
    out = []
    for n in DRIVER_TABLES if names is None else names:
        view = f"{prefix}{n}"
        load_table(spark, sf_dir, n).createOrReplaceTempView(view)
        out.append(view)
    return out


def read_parquet(
    spark: SparkSession,
    *paths: str,
    merge_schema: bool = False,
    columns: list[str] | None = None,
) -> DataFrame:
    """Multi-file Parquet scan (S2/S6/S7).

    ``merge_schema=True`` reconciles heterogeneous footers across files, the
    reference's ``option("mergeSchema","true")`` at
    ``larmatch2d/larmatch_dataset.py:93``. ``columns`` projects early so
    Catalyst prunes the Parquet read schema.
    """
    reader = spark.read
    if merge_schema:
        reader = reader.option("mergeSchema", "true")
    df = reader.parquet(*paths)
    if columns:
        df = df.select(*columns)
    return df


def read_manifest(
    spark: SparkSession, manifest_path: str, merge_schema: bool = False
) -> DataFrame:
    """File-list source from a text manifest, one path per line (S10,
    reference ``larvoxel_dataset.py:30-43``)."""
    with open(manifest_path) as f:
        paths = [line.strip() for line in f if line.strip() and not line.startswith("#")]
    return read_parquet(spark, *paths, merge_schema=merge_schema)


#: numeric width lattice for read_parquet_widened — wider index wins;
#: int↔float conflicts promote to double (what DuckDB union_by_name does)
_INT_ORDER = ("tinyint", "smallint", "int", "bigint")
_FLOAT_ORDER = ("float", "double")


def _widen(a: str, b: str) -> str:
    """Widest common Spark SQL type of two simple types — or of two
    ``array<primitive>`` types, widened element-wise (the reference's own
    data model is array<primitive> + ``_shape`` columns,
    ``root2parquet.py:72-85``, read under ``mergeSchema``, so element-width
    drift is the MOST likely drift for its native tables) — or raise."""
    if a == b:
        return a
    if a.startswith("array<") and b.startswith("array<"):
        return f"array<{_widen(a[6:-1], b[6:-1])}>"
    if a.startswith("decimal(") and b.startswith("decimal("):
        # precision drift at the SAME scale widens to the larger
        # precision (values are embeddable exactly); scale drift would
        # change the value grid — unrepairable, falls through to raise
        (pa, sa), (pb, sb) = (
            tuple(int(x) for x in t[8:-1].split(",")) for t in (a, b)
        )
        if sa == sb and max(pa, pb) <= 38:
            return f"decimal({max(pa, pb)},{sa})"
    if a in _INT_ORDER and b in _INT_ORDER:
        return _INT_ORDER[max(_INT_ORDER.index(a), _INT_ORDER.index(b))]
    if a in _FLOAT_ORDER and b in _FLOAT_ORDER:
        return _FLOAT_ORDER[max(_FLOAT_ORDER.index(a), _FLOAT_ORDER.index(b))]
    numeric = set(_INT_ORDER) | set(_FLOAT_ORDER)
    if a in numeric and b in numeric:
        return "double"
    raise ValueError(
        f"cannot widen parquet schema drift between {a!r} and {b!r} — "
        "only numeric width drift is repairable; rewrite the offending "
        "files explicitly"
    )


def read_parquet_widened(spark: SparkSession, path: str) -> DataFrame:
    """Schema-drift repair scan: read a directory whose part files
    disagree on numeric COLUMN WIDTHS (int32 vs int64, float vs double —
    the classic writer-upgrade drift), which Spark's own ``mergeSchema``
    rejects loudly (``Failed to merge incompatible data types``,
    StructType.merge has no numeric promotion).

    Groups part files by their parquet footer schema (a driver-side
    metadata pass — one ~KB footer read per file, the same information
    ``mergeSchema`` reads; shard the listing if a table has millions of
    files), computes the widest common type per column name via the same
    promotion lattice DuckDB's ``union_by_name`` applies, then scans each
    homogeneous file group ONCE and unions by name with explicit casts —
    missing columns come back as typed NULLs. Each group scan is an
    ordinary distributed parquet read with pushdown/pruning intact; the
    union is plan-level (no shuffle).
    """
    import pyarrow.parquet as pq

    files = sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".parquet")
    )
    if not files:
        raise ValueError(f"no parquet part files under {path!r}")
    groups: dict[tuple, list[str]] = {}
    for f in files:
        s = pq.ParquetFile(f).schema_arrow
        # spark-side type names via a zero-row arrow->spark conversion
        # would cost a JVM roundtrip per file; map the arrow types here
        sig = tuple((name, str(s.field(name).type)) for name in s.names)
        groups.setdefault(sig, []).append(f)

    _ARROW_TO_SQL = {
        "int8": "tinyint", "int16": "smallint", "int32": "int",
        "int64": "bigint", "float": "float", "double": "double",
        "string": "string", "large_string": "string", "bool": "boolean",
        "date32[day]": "date",
    }

    def sql_type(arrow: str) -> str:
        if arrow in _ARROW_TO_SQL:
            return _ARROW_TO_SQL[arrow]
        if arrow.startswith("timestamp"):
            # tz-aware shards must NOT silently merge as timestamp_ntz:
            # the cast shifts values by the session timezone, which is
            # corruption, not repair — keep the loud-failure contract.
            if "tz=" in arrow:
                raise ValueError(
                    f"unmapped arrow type in drift repair: {arrow} "
                    "(tz-aware timestamps are not repairable as "
                    "timestamp_ntz; align shard timezones explicitly)"
                )
            return "timestamp_ntz"
        # list field name varies by writer (pyarrow "item", parquet-spec
        # writers like DuckDB "element") — match either
        m = re.fullmatch(r"(?:large_)?list<\w+: (.+)>", arrow)
        if m:
            return f"array<{sql_type(m.group(1))}>"
        m = re.fullmatch(r"decimal(?:128|256)\((\d+), ?(\d+)\)", arrow)
        if m:
            return f"decimal({m.group(1)},{m.group(2)})"
        raise ValueError(f"unmapped arrow type in drift repair: {arrow}")

    # canonical column order = first appearance across sorted files
    order: list[str] = []
    target: dict[str, str] = {}
    for sig in groups:
        for name, arrow in sig:
            t = sql_type(arrow)
            if name not in target:
                order.append(name)
                target[name] = t
            else:
                target[name] = _widen(target[name], t)

    parts = []
    for sig, fs in groups.items():
        have = {name for name, _ in sig}
        df = spark.read.parquet(*fs)
        parts.append(
            df.select(
                *[
                    (
                        F.col(c).cast(target[c])
                        if c in have
                        else F.lit(None).cast(target[c])
                    ).alias(c)
                    for c in order
                ]
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def write_parquet(
    df: DataFrame,
    path: str,
    *,
    compression: str = "zstd",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    sort_within_partitions_by: list[str] | None = None,
    max_records_per_file: int | None = None,
) -> None:
    """Parquet sink (S4/S5). Reference wrote GZIP single files
    (``root2parquet.py:85``); distributed writes partition the output, and
    sorting within partitions on the event key keeps Parquet row-group stats
    tight so later point lookups prune (SURVEY.md §4 pain point).
    ``max_records_per_file`` caps file size independently of task layout —
    the guard against one hot partition value landing as a single giant
    file."""
    if sort_within_partitions_by:
        df = df.sortWithinPartitions(*sort_within_partitions_by)
    writer = df.write.mode(mode).option("compression", compression)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", int(max_records_per_file))
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def save_npz(
    df: DataFrame, path: str, *, compressed: bool = True, max_rows: int = 10_000_000
) -> None:
    """NPZ edge sink (S8, reference ``root2npyz.py:49``): materialize a
    (small, already-reduced) DataFrame as a dict-of-arrays ``.npz``. This is
    a driver-edge utility for handing results to numpy consumers — NOT a
    distributed sink; use Parquet for anything large.

    ``max_rows`` guards the full driver materialization an NPZ implies: a
    cheap ``limit(max_rows + 1)`` probe raises BEFORE ``toArrow`` pulls an
    unbounded table into driver memory (set ``max_rows=0`` to disable when
    you know the size)."""
    import numpy as np

    if max_rows:
        probe = df.limit(max_rows + 1).count()
        if probe > max_rows:
            raise ValueError(
                f"save_npz: result exceeds max_rows={max_rows} — an .npz is "
                "a driver-memory artifact; write Parquet instead or raise "
                "max_rows explicitly"
            )
    table = df.toArrow()
    arrays = {name: table.column(name).to_numpy(zero_copy_only=False) for name in table.column_names}
    (np.savez_compressed if compressed else np.savez)(path, **arrays)


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int,
    *,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed-table sink: co-locates rows by hash(bucket_cols) at
    write time so later equi-joins/aggregations on those columns need NO
    shuffle — the 100 TB answer to repeated fact-fact joins (e.g. bucket both
    ``orders`` and ``lineitem`` on the orderkey). Verified shuffle-free in
    tests/test_plans_physical.py."""
    writer = (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def dir_bytes(spark: SparkSession, path: str) -> int:
    """Total bytes under ``path`` via the Hadoop FileSystem API — works on
    any Spark-supported filesystem (local, HDFS, object stores), not just
    the driver's local disk."""
    jvm = spark.sparkContext._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    it = fs.listFiles(hpath, True)
    total = 0
    while it.hasNext():
        total += it.next().getLen()
    return total


def compact_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    *,
    target_file_bytes: int = 128 * 1024 * 1024,
    compression: str = "zstd",
    partition_by: list[str] | None = None,
    sort_within_partitions_by: list[str] | None = None,
) -> int:
    """Compact a parquet dataset's small files into ~``target_file_bytes``
    outputs — the lake-maintenance pass every streaming/incremental sink
    needs (thousands of per-microbatch files otherwise dominate scan
    planning and NameNode/liststore costs at 100 TB).

    Sizing comes from SOURCE metadata only (Hadoop FS byte totals + the
    parquet-footer row count), so the rewrite is one job: read ->
    repartition to ceil(bytes/target) -> write with ``maxRecordsPerFile``
    ≈ target_file_bytes / bytes-per-row. The record cap is what makes the
    size promise hold under ``partition_by`` skew: a hot partition value
    concentrates in one task but still splits into ~target-sized files
    instead of one giant one. Returns the ACTUAL parquet file count
    written to ``dst`` (listed back from the filesystem — the repartition
    request is not what a partitioned or empty-task write produces)."""
    import math

    df = read_parquet(spark, src)
    total = dir_bytes(spark, src)
    n_rows = df.count()  # parquet footer metadata, no data scan
    n_files = max(1, math.ceil(total / target_file_bytes))
    max_records = (
        max(1, int(target_file_bytes / max(total / n_rows, 1e-9)))
        if n_rows
        else None
    )
    if partition_by:
        parts = [F.col(c) for c in partition_by]
        df = df.repartition(n_files, *parts)
    else:
        df = df.repartition(n_files)
    write_parquet(
        df,
        dst,
        compression=compression,
        partition_by=partition_by,
        sort_within_partitions_by=sort_within_partitions_by,
        max_records_per_file=max_records,
    )
    jvm = spark.sparkContext._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(dst)
    fs = hpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    it = fs.listFiles(hpath, True)
    written = 0
    while it.hasNext():
        if it.next().getPath().getName().endswith(".parquet"):
            written += 1
    return written
