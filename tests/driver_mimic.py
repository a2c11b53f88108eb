"""Driver-mimic: run each queries()[name](sf_dir) and its oracle_sql()[name]
via DuckDB, compare row-count / schema / order-insensitive values — a local
stand-in for the graft driver's CORRECTNESS check.

Usage: PYTHONPATH=/root/repo python tests/driver_mimic.py [sf_dir] [name ...]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa

    try:
        import ray.data as rd

        if isinstance(result, rd.Dataset):
            return result.to_pandas()
    except ImportError:
        pass
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def canonical(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        if str(df[c].dtype).startswith("uint"):
            df[c] = df[c].astype("float64")
        if str(df[c].dtype).startswith(("int", "Int")):
            df[c] = df[c].astype("int64")
        if str(df[c].dtype).startswith("float"):
            df[c] = df[c].astype("float64").round(6)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def compare(name: str, ray_df: pd.DataFrame, sql_df: pd.DataFrame) -> str:
    a, b = canonical(ray_df), canonical(sql_df)
    if list(a.columns) != list(b.columns):
        return f"SCHEMA MISMATCH ray={list(a.columns)} sql={list(b.columns)}"
    if len(a) != len(b):
        return f"ROWCOUNT MISMATCH ray={len(a)} sql={len(b)}"
    if not a.equals(b):
        diff = (a != b) & ~(a.isna() & b.isna())
        bad = diff.any(axis=1)
        return (
            f"VALUE MISMATCH ({int(bad.sum())} rows)\n"
            f"ray:\n{a[bad].head(3)}\nsql:\n{b[bad].head(3)}"
        )
    return "OK"


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs, oracles = e.queries(), e.oracle_sql()
    n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            ray_df = to_pandas(fn(sf_dir))
        except Exception as ex:
            print(f"[FAIL-RAY ] {name}: {type(ex).__name__}: {ex}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"[ROWS-ONLY] {name}: {len(ray_df)} rows, cols={list(ray_df.columns)}")
            continue
        try:
            sql_df = con.execute(oracles[name]).fetchdf()
        except Exception as ex:
            print(f"[FAIL-SQL ] {name}: {type(ex).__name__}: {ex}")
            n_fail += 1
            continue
        verdict = compare(name, ray_df, sql_df)
        status = "OK        " if verdict == "OK" else "MISMATCH  "
        if verdict != "OK":
            n_fail += 1
        print(f"[{status}] {name}: {verdict if verdict != 'OK' else f'{len(ray_df)} rows'}")
    ray.shutdown()
    return n_fail


if __name__ == "__main__":
    raise SystemExit(main())
