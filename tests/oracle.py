"""DuckDB oracle harness mirroring the driver's correctness gate:
row-count + schema + order-insensitive value comparison (TESTDATA.md)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

from ubparquet_spark.io import DRIVER_TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in DRIVER_TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            # normalize tz and unit: Spark yields ns, DuckDB us — same values
            df[c] = df[c].dt.tz_localize(None).astype("datetime64[ns]")
        elif df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v
            )
    return df.sort_values(by=list(df.columns), ignore_index=True)


def assert_matches_oracle(spark_df, sql: str, sf_dir: str, *, rtol: float = 0.0):
    got = _canon(spark_df.toPandas())
    con = duck_connection(sf_dir)
    exp = _canon(con.sql(sql).df())
    con.close()
    assert list(got.columns) == list(exp.columns), (
        f"column mismatch: {list(got.columns)} vs {list(exp.columns)}"
    )
    assert len(got) == len(exp), f"row count {len(got)} vs {len(exp)}"
    for c in got.columns:
        gi = pd.api.types.is_integer_dtype(got[c])
        ei = pd.api.types.is_integer_dtype(exp[c])
        gf = pd.api.types.is_float_dtype(got[c])
        ef = pd.api.types.is_float_dtype(exp[c])
        assert (gi, gf) == (ei, ef), (
            f"dtype kind mismatch in {c}: {got[c].dtype} vs {exp[c].dtype} "
            "(int-vs-float differences change the driver's value hash)"
        )
    for c in got.columns:
        g, e = got[c], exp[c]
        if pd.api.types.is_float_dtype(g) or pd.api.types.is_float_dtype(e):
            ok = np.isclose(
                g.astype(float), e.astype(float), rtol=rtol, atol=0.0, equal_nan=True
            )
            if not ok.all():
                bad = np.where(~ok)[0][:5]
                raise AssertionError(
                    f"value mismatch in {c} rows {bad}: "
                    f"{g.iloc[bad].tolist()} vs {e.iloc[bad].tolist()}"
                )
        else:
            pd.testing.assert_series_equal(g, e, check_dtype=False, check_names=False)
