"""Driver-style correctness gate: every queries() entry vs its oracle_sql()
twin on sf0.01, order-insensitive, column names must match exactly."""

import os

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _to_pandas(result) -> pd.DataFrame:
    if isinstance(result, pd.DataFrame):
        return result
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result.to_pandas()  # ray Dataset


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)
    return df


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return c


def _registry():
    from cdm_data_loader_utils_ray.queries import registry

    return registry()


@pytest.mark.parametrize("name", list(_registry().keys()))
def test_query_matches_oracle(name, con):
    fn, sql = _registry()[name]
    got = _canon(_to_pandas(fn(SF_DIR)))
    if sql is None:
        assert len(got) >= 0
        return
    exp = _canon(con.sql(sql).df())
    assert list(got.columns) == list(exp.columns), f"{name}: column mismatch"
    assert len(got) == len(exp), f"{name}: row count {len(got)} != {len(exp)}"
    got = got.reset_index(drop=True)
    exp = exp.reset_index(drop=True)
    for c in got.columns:
        g, e = got[c], exp[c]
        if g.dtype != e.dtype:
            g, e = g.astype(str), e.astype(str)
        pd.testing.assert_series_equal(g, e, check_names=False, check_dtype=False, obj=f"{name}.{c}")


def test_entry_smoke():
    import __ray_entry__ as m

    out = m.entry()
    assert len(out) >= 0
    assert {"repo", "path", "content_sha256"} <= set(out.columns)
