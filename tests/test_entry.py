"""Local replica of the driver's correctness gate: run every
queries() entry on Spark and its oracle_sql() twin on DuckDB at
sf0.01, compare row counts + exact values (order-insensitive).

Any mismatch here means CORRECTNESS_r{N}.json would flag the query —
this test keeps the contract honest before the driver ever runs.
"""

import math

import duckdb
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con.sql(sql).df()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif df[c].dtype == object:
            # duckdb HUGEINT / Decimal → float-safe int64 when integral
            try:
                df[c] = df[c].astype("int64")
            except (TypeError, ValueError):
                pass
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def _dtype_kind(s: pd.Series) -> str:
    """Coarse dtype class used to predict the driver's value-hash.

    The driver hashes raw values, so a DuckDB HUGEINT/Decimal (object
    dtype) vs a Spark BIGINT (int64) mismatches even when the integers
    are equal. Flag any kind drift here before the driver does.
    """
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_float_dtype(s):
        return "float"
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_datetime64_any_dtype(s):
        return "datetime"
    if s.dtype == object:
        sample = s.dropna()
        if len(sample) and all(isinstance(v, str) for v in sample.head(50)):
            return "str"
        if len(sample) and all(
            isinstance(v, (list, np.ndarray, bytes)) for v in sample.head(50)
        ):
            return "nested"
        return "object"
    return str(s.dtype)


def _assert_frames_equal(name: str, got: pd.DataFrame, want: pd.DataFrame):
    assert sorted(got.columns) == sorted(want.columns), (
        f"{name}: column mismatch {sorted(got.columns)} vs {sorted(want.columns)}"
    )
    for c in got.columns:
        gk, wk = _dtype_kind(got[c]), _dtype_kind(want[c])
        assert gk == wk, (
            f"{name}: column {c} dtype-kind drift: spark={gk} ({got[c].dtype}) "
            f"vs oracle={wk} ({want[c].dtype}) — the driver's value-hash "
            f"will mismatch; cast both engines to the same type"
        )
    g = _normalize(got)
    w = _normalize(want)
    assert len(g) == len(w), f"{name}: row count {len(g)} vs {len(w)}"
    for c in g.columns:
        gv = g[c].to_numpy()
        wv = w[c].to_numpy()
        if gv.dtype.kind == "f" or wv.dtype.kind == "f":
            gq = gv.astype("float64")
            wq = wv.astype("float64")
            both_nan = np.isnan(gq) & np.isnan(wq)
            eq = (gq == wq) | both_nan
        else:
            eq = gv == wv
        bad = np.nonzero(~np.asarray(eq))[0]
        assert len(bad) == 0, (
            f"{name}: column {c} differs at {len(bad)} rows; "
            f"first: got={gv[bad[0]]!r} want={wv[bad[0]]!r} (row {bad[0]})"
        )


ALL_QUERIES = sorted(entry_mod.queries().keys())
ORACLES = entry_mod.oracle_sql()


class TestEntryContract:
    def test_every_oracle_key_has_a_query(self):
        assert set(ORACLES) <= set(ALL_QUERIES)

    def test_entry_smoke(self, spark):
        df = entry_mod.entry(spark)
        rows = df.collect()
        assert len(rows) >= 1
        assert {"polygon_id", "n_points", "n_hex_cells"} <= set(df.columns)

    @pytest.mark.parametrize("name", ALL_QUERIES)
    def test_query_vs_oracle(self, spark, name):
        fn = entry_mod.queries()[name]
        got = fn(spark, SF_DIR).toPandas()
        if name not in ORACLES:
            # rows-only contract: must produce a stable non-empty frame
            assert len(got) >= 0
            again = fn(spark, SF_DIR).toPandas()
            _assert_frames_equal(name, got, again)  # determinism
            return
        want = _duck(ORACLES[name])
        _assert_frames_equal(name, got, want)
