"""Seeded sampling determinism + partition-slice cover properties."""

from __future__ import annotations

from ubparquet_spark.io import load_table
from ubparquet_spark.operators import sampling


def test_bernoulli_sample_deterministic(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    a = sampling.bernoulli_sample(orders, 0.1, seed=7).count()
    b = sampling.bernoulli_sample(orders, 0.1, seed=7).count()
    assert a == b
    total = orders.count()
    assert 0 < a < total


def test_sample_n_exact_count(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    got = sampling.sample_n(orders, 10, seed=3).collect()
    assert len(got) == 10
    again = sampling.sample_n(orders, 10, seed=3).collect()
    assert {r.o_orderkey for r in got} == {r.o_orderkey for r in again}


def test_epoch_order_deterministic_and_epoch_dependent(spark, sf_dir):
    nation = load_table(spark, sf_dir, "nation")
    e0 = [r.n_nationkey for r in sampling.epoch_order(nation, 0, seed=1).collect()]
    e0b = [r.n_nationkey for r in sampling.epoch_order(nation, 0, seed=1).collect()]
    e1 = [r.n_nationkey for r in sampling.epoch_order(nation, 1, seed=1).collect()]
    assert e0 == e0b
    assert sorted(e0) == sorted(e1)
    assert e0 != e1  # different epoch -> different permutation


def test_partition_slice_disjoint_cover(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    n = 4
    slices = [
        {r.o_orderkey for r in sampling.partition_slice(orders, i, n, ["o_orderkey"]).collect()}
        for i in range(n)
    ]
    all_keys = {r.o_orderkey for r in orders.collect()}
    union = set().union(*slices)
    assert union == all_keys
    for i in range(n):
        for j in range(i + 1, n):
            assert not (slices[i] & slices[j])


def test_array_subsample_deterministic(spark):
    df = spark.createDataFrame([(list(range(100)),)], "arr array<int>")
    a = sampling.array_subsample(df, "arr", 10, seed=5).collect()[0].arr
    b = sampling.array_subsample(df, "arr", 10, seed=5).collect()[0].arr
    c = sampling.array_subsample(df, "arr", 10, seed=6).collect()[0].arr
    assert a == b
    assert len(a) == 10
    assert len(set(a)) == 10  # without replacement
    assert a != c


def test_iter_arrow_batches(spark, sf_dir):
    nation = load_table(spark, sf_dir, "nation")
    total = sum(b.num_rows for b in sampling.iter_arrow_batches(nation))
    assert total == nation.count()


def test_iter_arrow_batches_streams_without_full_materialize(spark):
    """Consuming the FIRST batch must not compute the whole table: a poison
    pass-through that throws on the last partitions proves the driver pulls
    partitions lazily (toLocalIterator), not via a full-table toArrow()."""
    import pyarrow.compute as pc

    df = spark.range(0, 50_000, 1, 50)  # 50 partitions of 1000 rows

    def poison(batches):
        for b in batches:
            if pc.max(b.column("id")).as_py() >= 40_000:
                raise RuntimeError("late partition was computed")
            yield b

    poisoned = df.mapInArrow(poison, df.schema)
    it = sampling.iter_arrow_batches(poisoned)
    first = next(it)
    assert first.num_rows > 0
    # sanity: draining the iterator DOES reach the poison partitions
    import pytest

    with pytest.raises(Exception):
        for _ in it:
            pass

def test_iter_arrow_batches_rejects_invalid_ramp(spark):
    """Explicit first_rows=0 (or any <1 value, or batch_rows<1) must fail
    loudly, not silently coerce to batch_rows — an invalid ramp size is a
    caller bug, and the old truthiness check masked it."""
    import pytest

    df = spark.range(10)
    with pytest.raises(ValueError, match="first_rows"):
        next(sampling.iter_arrow_batches(df, batch_rows=4, first_rows=0))
    with pytest.raises(ValueError, match="first_rows"):
        next(sampling.iter_arrow_batches(df, batch_rows=4, first_rows=-3))
    with pytest.raises(ValueError, match="batch_rows"):
        next(sampling.iter_arrow_batches(df, batch_rows=0))
    # first_rows=None keeps the no-ramp default
    total = sum(
        b.num_rows
        for b in sampling.iter_arrow_batches(df, batch_rows=4, first_rows=None)
    )
    assert total == 10
