"""Validate __ray_entry__.queries() against oracle_sql() via DuckDB — a local
replica of the driver's correctness gate (row count + schema + sorted-value
equality) at sf0.001."""

import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")
import __ray_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def to_pandas(result) -> pd.DataFrame:
    if isinstance(result, pd.DataFrame):
        return result
    if hasattr(result, "to_pandas"):
        return result.to_pandas()
    raise TypeError(type(result))


SQL_CASES = sorted(entrymod.oracle_sql().keys())


@pytest.mark.parametrize("name", SQL_CASES)
def test_query_matches_oracle(ray_session, con, name):
    ray_df = normalize(to_pandas(entrymod.queries()[name](SF_DIR)))
    sql_df = normalize(con.execute(entrymod.oracle_sql()[name]).df())
    assert list(ray_df.columns) == list(sql_df.columns), (ray_df.columns, sql_df.columns)
    assert len(ray_df) == len(sql_df), (name, len(ray_df), len(sql_df))
    for col in ray_df.columns:
        a, b = ray_df[col], sql_df[col]
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            assert (a - b).abs().max() < 1e-6, (name, col)
        else:
            assert a.astype(str).tolist() == b.astype(str).tolist(), (name, col)


NOSQL_CASES = sorted(set(entrymod.queries()) - set(entrymod.oracle_sql()))


@pytest.mark.parametrize("name", NOSQL_CASES)
def test_nosql_queries_run(ray_session, name):
    df = to_pandas(entrymod.queries()[name](SF_DIR))
    assert len(df) >= 0
    assert len(df.columns) > 0


def test_entry_runs(ray_session):
    df = to_pandas(entrymod.entry())
    assert len(df) > 0
    assert set(df.columns) == {"kind", "key", "n"}
