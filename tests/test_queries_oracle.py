"""Driver-contract conformance (SURVEY.md §5.3): every SQL-checked
queries() entry must match its oracle_sql() on the same parquet tables
— row count, column names, and exact values after per-column sort
(mirrors the driver's order-insensitive value hash)."""

import math

import duckdb
import pandas as pd
import pytest

import __ray_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _to_pandas(result) -> pd.DataFrame:
    if isinstance(result, pd.DataFrame):
        return result
    if hasattr(result, "to_pandas"):
        return result.to_pandas()
    raise TypeError(type(result))


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


ORACLES = sorted(entry_mod.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLES)
def test_query_matches_oracle(name, duck):
    qs = entry_mod.queries()
    ray_df = _normalize(_to_pandas(qs[name](SF_DIR)))
    sql_df = _normalize(duck.sql(entry_mod.oracle_sql()[name]).df())
    assert list(ray_df.columns) == list(sql_df.columns), (
        f"{name}: columns {list(ray_df.columns)} vs {list(sql_df.columns)}"
    )
    assert len(ray_df) == len(sql_df), f"{name}: {len(ray_df)} vs {len(sql_df)} rows"
    # the driver's value hash is dtype-sensitive (round-1 lesson: 3549
    # vs 3549.0 hash-mismatch) — pin dtype equality, not just values
    for col in ray_df.columns:
        assert str(ray_df[col].dtype) == str(sql_df[col].dtype), (
            f"{name}.{col}: dtype ray={ray_df[col].dtype} vs sql={sql_df[col].dtype}"
        )
    for col in ray_df.columns:
        a, b = ray_df[col], sql_df[col]
        for i, (x, y) in enumerate(zip(a, b)):
            if isinstance(x, float) or isinstance(y, float):
                ok = (pd.isna(x) and pd.isna(y)) or (
                    not pd.isna(x) and not pd.isna(y) and math.isclose(x, y, rel_tol=0, abs_tol=0)
                )
            else:
                ok = x == y
            assert ok, f"{name}.{col}[{i}]: ray={x!r} sql={y!r}"


def test_rows_only_queries_run():
    qs = entry_mod.queries()
    sql_names = set(entry_mod.oracle_sql())
    for name, fn in qs.items():
        if name in sql_names:
            continue
        df = _to_pandas(fn(SF_DIR))
        assert df is not None and len(df.columns) > 0, name


def test_entry_smoke():
    result = entry_mod.entry()
    df = _to_pandas(result)
    assert len(df) > 0
    assert list(df.columns) == ["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]


def test_first_50_registry_entries_are_oracle_backed():
    """The driver's correctness harness samples only the FIRST 50
    queries() entries — keep that window oracle-dense (new queries
    belong AFTER slot 50 unless swapping deliberately)."""
    qs = list(entry_mod.queries().keys())
    oracles = set(entry_mod.oracle_sql().keys())
    missing = [q for q in qs[:50] if q not in oracles]
    assert missing == [], f"rows-only queries inside the first-50 window: {missing}"


def test_every_oracle_has_a_query():
    qs = set(entry_mod.queries().keys())
    dangling = sorted(set(entry_mod.oracle_sql().keys()) - qs)
    assert dangling == []
