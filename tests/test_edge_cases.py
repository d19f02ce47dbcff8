"""Edge cases: empty events, empty tables, degenerate groups through the
operator stack — the paths a 100 TB lake will hit somewhere every day."""

from __future__ import annotations

from pyspark.sql import functions as F

from ubparquet_spark import codec
from ubparquet_spark.operators import voxel

KEYS = ["run", "subrun", "event"]

EMPTY_EVENT_DDL = (
    "run long, subrun long, event long, "
    "spacepoint_t array<double>, spacepoint_t_shape array<long>, "
    "truetriplet_t array<long>, truetriplet_t_shape array<long>"
)


def _df_with_empty_event(spark):
    rows = [
        # normal event
        {
            "run": 1, "subrun": 0, "event": 0,
            "spacepoint_t": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0],
            "spacepoint_t_shape": [2, 4],
            "truetriplet_t": [1, 0],
            "truetriplet_t_shape": [2],
        },
        # empty event: zero points (shape [0, 4])
        {
            "run": 1, "subrun": 0, "event": 1,
            "spacepoint_t": [],
            "spacepoint_t_shape": [0, 4],
            "truetriplet_t": [],
            "truetriplet_t_shape": [0],
        },
    ]
    return spark.createDataFrame(rows, EMPTY_EVENT_DDL)


def test_explode_skips_empty_events(spark):
    df = _df_with_empty_event(spark)
    pts = codec.explode_tensor(df, "spacepoint_t", KEYS)
    assert pts.count() == 2  # only the two real points
    assert codec.validate_tensors(df).count() == 0  # [0,4] is valid


def test_mask_filter_empty_and_all_masked(spark):
    df = _df_with_empty_event(spark)
    out = voxel.mask_filter(df, ["spacepoint_t"], "truetriplet_t", KEYS)
    rows = {r.event: r for r in out.collect()}
    # event 0 keeps exactly the masked-in point
    assert rows[0].spacepoint_t == [1.0, 2.0, 3.0, 4.0]
    assert rows[0].spacepoint_t_shape == [1, 4]
    # event 1 had no points at all -> no group emitted (reference drops
    # empty instance groups too, voxel_to_instance_data.py:61)
    assert 1 not in rows


def test_voxelize_empty_input(spark):
    empty = spark.createDataFrame(
        [], "run long, subrun long, event long, idx long, "
            "x double, y double, z double, q double"
    )
    assert voxel.voxelize(empty).count() == 0
    assert voxel.voxelize(empty, label_col=None).count() == 0


def test_quality_audit_empty_table(spark):
    from ubparquet_spark import quality

    empty = spark.createDataFrame([], EMPTY_EVENT_DDL)
    report = quality.audit(empty, KEYS)
    assert all(v == 0 for v in report.values())


def test_dedup_groups_no_edges(spark):
    from ubparquet_spark.functions.dedup_clusters import dedup_groups

    ids = spark.createDataFrame([(i,) for i in range(5)], "doc_id long")
    no_edges = spark.createDataFrame([], "src long, dst long")
    out = dedup_groups(no_edges, ids, "doc_id")
    assert out.filter("is_canonical").count() == 5


def test_every_registered_query_survives_empty_tables(spark, tmp_path_factory):
    """A 100 TB lake has empty partitions somewhere every day: every
    registered query must plan and execute (0 rows is fine, throwing is
    not) against a fully empty, schema-identical dataset. Guards the
    sequence(1, n<=0) class of hazards for good."""
    import duckdb

    import __spark_entry__ as entry

    src = "/root/testdata/sf0.001"
    dst = str(tmp_path_factory.mktemp("sf_empty"))
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.sql(
            f"COPY (SELECT * FROM '{src}/{t}.parquet' LIMIT 0)"
            f" TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )
    failures = []
    for name, fn in entry.queries().items():
        try:
            assert fn(spark, dst).count() >= 0
        except Exception as e:  # collect all, report once
            failures.append(f"{name}: {str(e).splitlines()[0][:100]}")
    assert not failures, failures

