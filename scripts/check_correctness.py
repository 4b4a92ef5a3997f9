"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry and its ``oracle_sql()`` DuckDB
equivalent side-by-side at the given sf, compares row counts, sorted
column names, and exact values after sorting columns by name and rows
by all columns (the driver's documented compare). Flags dtype drift
explicitly since int64-vs-float64 is the classic silent hash-killer.

Usage: python scripts/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object and len(df) and isinstance(df[c].iloc[0], bytes):
            df[c] = df[c].map(lambda b: b.hex())
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df


def values_equal(a: pd.DataFrame, b: pd.DataFrame) -> bool:
    if list(a.columns) != list(b.columns) or len(a) != len(b):
        return False
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if av.dtype.kind in "fc" or bv.dtype.kind in "fc":
            # driver hashes exact values: require bit-identical floats
            if not np.array_equal(
                av.astype(np.float64), bv.astype(np.float64), equal_nan=True
            ):
                return False
        else:
            if not (pd.Series(av).astype(str) == pd.Series(bv).astype(str)).all():
                return False
    return True


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False)

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entry

    qs = entry.queries()
    oracles = entry.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    n_green = n_total = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            entry.ensure_oracle_artifacts(name, sf_dir)
            res = to_pandas(fn(sf_dir))
        except Exception as e:
            print(f"{name:28s} ENGINE-ERR {type(e).__name__}: {e}")
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"{name:28s} rows-only  engine_rows={len(res)}")
            continue
        n_total += 1
        try:
            ora = con.sql(sql).df()
        except Exception as e:
            print(f"{name:28s} ORACLE-ERR {type(e).__name__}: {e}")
            continue
        a, b = norm(res), norm(ora)
        rows = len(a) == len(b)
        schema = list(a.columns) == list(b.columns)
        dtypes_match = schema and all(a[c].dtype == b[c].dtype for c in a.columns)
        vals = rows and schema and values_equal(a, b)
        ok = rows and schema and vals
        n_green += ok
        msg = "GREEN" if ok else "FAIL "
        detail = ""
        if not ok:
            detail = f" rows {len(a)}/{len(b)} schema={schema}"
            if rows and schema and not vals:
                for c in a.columns:
                    try:
                        col_eq = values_equal(a[[c]], b[[c]])
                    except Exception:
                        col_eq = False
                    if not col_eq:
                        detail += f" col!={c}({a[c].dtype}/{b[c].dtype})"
        elif not dtypes_match:
            dts = [f"{c}:{a[c].dtype}/{b[c].dtype}" for c in a.columns if a[c].dtype != b[c].dtype]
            detail = f" [dtype-drift {' '.join(dts)}]"
        print(f"{name:28s} {msg} rows={len(a)}{detail}")
    print(f"\n{n_green}/{n_total} oracled queries green")
    ray.shutdown()


if __name__ == "__main__":
    main()
