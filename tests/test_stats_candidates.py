"""Round-11 registration candidates, verified in round 10: Theil–Sen
robust trend and grid-based Kendall tau-b. Each is hash-checked against
its DuckDB twin (the same gate registered queries get) AND against an
independent brute-force numpy computation, so registration next round is
a three-line change (QUERIES entry + window slot + shuffle budget)."""

from __future__ import annotations

import hashlib

import duckdb
import numpy as np
import pytest

from ubparquet_spark.plans.events import Q_THEILSEN_SQL, q_theilsen_trend
from ubparquet_spark.plans.tpch import Q_KENDALL_SQL, q_kendall_qty_disc


def _vhash(p):
    p = p[sorted(p.columns)].sort_values(by=sorted(p.columns), ignore_index=True)
    return hashlib.sha256(p.to_csv(index=False).encode()).hexdigest()[:12]


@pytest.mark.parametrize(
    "fn,sql,table",
    [
        (q_theilsen_trend, Q_THEILSEN_SQL, "events"),
        (q_kendall_qty_disc, Q_KENDALL_SQL, "lineitem"),
    ],
)
def test_candidate_matches_oracle(spark, sf_dir, fn, sql, table):
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW {table} AS SELECT * FROM '{sf_dir}/{table}.parquet'"
    )
    got = fn(spark, sf_dir).toPandas()
    want = con.sql(sql).df()
    assert _vhash(got) == _vhash(want), (got, want)


def test_theilsen_matches_numpy_bruteforce(spark, sf_dir):
    import pandas as pd

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").toPandas()
    ev = ev[ev.ts.notna()]
    days = (
        pd.DataFrame(
            {
                "d": ev.ts.dt.floor("D").astype("int64") // 86_400_000_000_000,
                "vc": np.floor(ev.value * 100 + 0.5).fillna(0).astype("int64"),
            }
        )
        .groupby("d", as_index=False)
        .vc.sum()
    )
    d = days.d.to_numpy(dtype="float64")
    y = days.vc.to_numpy(dtype="float64")
    slopes = []
    for i in range(len(d)):
        for j in range(i + 1, len(d)):
            slopes.append((y[j] - y[i]) / (d[j] - d[i]))
    slope = float(np.median(slopes))
    intercept = float(np.median(y / 100.0 - slope * d / 100.0))
    row = q_theilsen_trend(spark, sf_dir).collect()[0]
    assert row["n_days"] == len(d)
    assert row["n_pairs"] == len(slopes)
    assert abs(row["slope_rev_per_day"] - slope / 100.0) < 1e-6
    assert abs(row["intercept_rev"] - intercept) < 1e-6


def test_kendall_matches_numpy_bruteforce(spark):
    """Exact O(n²) concordance count on a small frame vs the grid plan."""
    rng = np.random.default_rng(11)
    n = 400
    qty = rng.integers(1, 20, n).astype("float64")
    disc = np.round(rng.integers(0, 6, n) * 0.01 + (qty > 10) * 0.02, 2)
    rows = [(float(q), float(dd)) for q, dd in zip(qty, disc)]
    df = spark.createDataFrame(rows, "l_quantity double, l_discount double")
    import os
    import tempfile

    d = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(os.path.join(d, "lineitem.parquet"))
    got = q_kendall_qty_disc(spark, d).collect()[0]

    x = np.floor(qty * 100 + 0.5)
    y = np.floor(disc * 100 + 0.5)
    P = Q = 0
    for i in range(n):
        dx = x[i + 1 :] - x[i]
        dy = y[i + 1 :] - y[i]
        P += int(np.sum((dx * dy) > 0))
        Q += int(np.sum((dx * dy) < 0))
    n0x2 = n * (n - 1)
    t1x2 = sum(c * (c - 1) for c in np.unique(x, return_counts=True)[1])
    t2x2 = sum(c * (c - 1) for c in np.unique(y, return_counts=True)[1])
    tau = 2 * (P - Q) / (np.sqrt(n0x2 - t1x2) * np.sqrt(n0x2 - t2x2))
    assert got["n_rows"] == n
    assert got["concordant"] == P and got["discordant"] == Q
    assert abs(got["tau_b"] - tau) < 1e-6


def test_kendall_degenerate_all_tied(spark, tmp_path):
    """All-tied x (or y) makes the denominator 0: tau_b must be NULL in
    the Spark plan (try_divide), matching DuckDB's x/0 -> NULL."""
    rows = [(5.0, 0.01 * i) for i in range(10)]
    df = spark.createDataFrame(rows, "l_quantity double, l_discount double")
    d = str(tmp_path)
    df.write.mode("overwrite").parquet(f"{d}/lineitem.parquet")
    got = q_kendall_qty_disc(spark, d).collect()[0]
    assert got["tau_b"] is None


def test_theil_index_matches_oracle_and_numpy(spark, sf_dir):
    from ubparquet_spark.plans.tpch import Q_THEIL_INDEX_SQL, q_theil_index

    con = duckdb.connect()
    con.sql(f"CREATE VIEW orders AS SELECT * FROM '{sf_dir}/orders.parquet'")
    got = q_theil_index(spark, sf_dir).toPandas()
    want = con.sql(Q_THEIL_INDEX_SQL).df()
    assert _vhash(got) == _vhash(want)
    # independent numpy check (unquantized ln; 1e-12 grain is far below
    # the 1e-6 assertion tolerance)
    import pandas as pd

    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    xc = (
        np.floor(orders.o_totalprice * 100 + 0.5)
        .groupby(orders.o_custkey)
        .sum()
        .to_numpy()
    )
    xc = xc[xc > 0].astype("float64")
    mu = xc.mean()
    t = float(np.mean((xc / mu) * np.log(xc / mu)))
    row = got.iloc[0]
    assert row["n_customers"] == len(xc)
    assert abs(row["theil_t"] - t) < 1e-6
    assert 0.0 <= row["theil_t"] <= np.log(len(xc))


def test_theil_index_equality_is_zero(spark, tmp_path):
    """All-equal revenues -> T = 0 exactly after rounding."""
    df = spark.createDataFrame(
        [(i, 100.0) for i in range(20)], "o_custkey long, o_totalprice double"
    )
    d = str(tmp_path)
    df.write.mode("overwrite").parquet(f"{d}/orders.parquet")
    from ubparquet_spark.plans.tpch import q_theil_index

    row = q_theil_index(spark, d).collect()[0]
    assert row["n_customers"] == 20 and row["theil_t"] == 0.0
