"""Local rehearsal of the driver's correctness gate: every queries()
entry with an oracle_sql() must match DuckDB on the same tables
(row count + sorted-values equality)."""

import duckdb
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.01"

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _to_pandas(obj):
    import pyarrow as pa
    import ray.data

    if isinstance(obj, ray.data.Dataset):
        return obj.to_pandas()
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _oracle_names():
    import __ray_entry__ as e

    return sorted(e.oracle_sql().keys())


@pytest.mark.parametrize("name", _oracle_names())
def test_query_matches_oracle(name, ray_session):
    import __ray_entry__ as e

    # alphabetical param order runs some consumers before their
    # cross-query oracle artifact producer on a clean /tmp
    e.ensure_oracle_artifacts(name, SF_DIR)
    ray_df = _canon(_to_pandas(e.queries()[name](SF_DIR)))
    con = _duck(SF_DIR)
    sql_df = _canon(con.execute(e.oracle_sql()[name]).df())
    assert len(ray_df) == len(sql_df), f"{name}: rows {len(ray_df)} vs {len(sql_df)}"
    pd.testing.assert_frame_equal(ray_df, sql_df, check_dtype=False, atol=1e-6)
