"""Local replica of the driver's correctness gate: run each queries() entry
via Ray and its oracle_sql() via DuckDB on the same sf dir; compare row
count, schema (column names), and order-insensitive values.

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


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


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith(("uint", "int", "Int")):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> int:
    import ray

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    ray.init(address="local", num_cpus=8, include_dashboard=False, ignore_reinit_error=True, logging_level="ERROR")
    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            got = canon(to_pandas(fn(sf_dir)))
        except Exception as e:
            print(f"[FAIL] {name}: ray query raised {type(e).__name__}: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"[rows-only] {name}: {len(got)} rows, cols={list(got.columns)}")
            continue
        exp = canon(con.execute(oracles[name]).df())
        status = "OK"
        if list(got.columns) != list(exp.columns):
            status = f"SCHEMA MISMATCH ray={list(got.columns)} sql={list(exp.columns)}"
        elif len(got) != len(exp):
            status = f"ROWCOUNT MISMATCH ray={len(got)} sql={len(exp)}"
        else:
            try:
                pd.testing.assert_frame_equal(got, exp, check_dtype=False, check_exact=True)
            except AssertionError as e:
                status = f"VALUE MISMATCH: {str(e)[:300]}"
        if status != "OK":
            failures += 1
            print(f"[FAIL] {name}: {status}")
        else:
            print(f"[OK]   {name}: {len(got)} rows")
    ray.shutdown()
    return failures


if __name__ == "__main__":
    sys.exit(1 if main() else 0)
