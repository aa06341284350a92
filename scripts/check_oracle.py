"""Local conformance harness: run every registered query against its DuckDB
oracle and compare exactly the way the driver does (row count, schema-ish,
order-insensitive values with columns sorted by name).

Usage: python scripts/check_oracle.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype(np.float64)
        elif pd.api.types.is_integer_dtype(df[c]):
            # nullable Int64 with NA cannot cast to int64; go float64 the
            # way DuckDB's .df() does for NULL-able BIGINT
            if df[c].isna().any():
                df[c] = df[c].astype(np.float64)
            else:
                df[c] = df[c].astype(np.int64)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(name: str, mine: pd.DataFrame, theirs: pd.DataFrame) -> list[str]:
    problems = []
    if len(mine) != len(theirs):
        problems.append(f"rowcount {len(mine)} vs {len(theirs)}")
    if sorted(mine.columns) != sorted(theirs.columns):
        problems.append(f"columns {sorted(mine.columns)} vs {sorted(theirs.columns)}")
        return problems
    a, b = normalize(mine), normalize(theirs)
    if len(a) == len(b):
        for c in a.columns:
            av, bv = a[c].to_numpy(), b[c].to_numpy()
            if av.dtype.kind == "f" or bv.dtype.kind == "f":
                both_nan = pd.isna(av) & pd.isna(bv)
                eq = (av == bv) | both_nan
            else:
                eq = (pd.isna(av) & pd.isna(bv)) | (
                    pd.Series(av).fillna("__N").to_numpy() == pd.Series(bv).fillna("__N").to_numpy()
                )
            if not eq.all():
                i = int(np.flatnonzero(~eq)[0])
                problems.append(f"col {c}: first diff row {i}: {av[i]!r} vs {bv[i]!r} ({int((~eq).sum())} rows)")
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import demeter_ray

    # location-independent: workers must not need the repo on sys.path/cwd
    demeter_ray.ship_code_to_workers()

    import demeter_ray.pipelines.oracle_extra  # noqa: F401  (registers)
    import demeter_ray.pipelines.oracle_spatial  # noqa: F401  (registers)
    import demeter_ray.pipelines.oracle_text  # noqa: F401  (registers)
    import demeter_ray.pipelines.oracle_tpch  # noqa: F401  (registers)
    import demeter_ray.pipelines.oracle_window  # noqa: F401  (registers)
    from demeter_ray.pipelines.relational import QUERIES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    n_pass = n_fail = n_nosql = 0
    for name, (fn, sql) in QUERIES.items():
        if only and name not in only:
            continue
        try:
            mine = fn(sf_dir)
            if hasattr(mine, "to_pandas"):
                mine = mine.to_pandas()
            elif not isinstance(mine, pd.DataFrame):
                mine = mine.to_pandas() if hasattr(mine, "to_pandas") else pd.DataFrame(mine)
        except Exception as e:
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if sql is None:
            print(f"SKIP {name}: rows-only ({len(mine)} rows)")
            n_nosql += 1
            continue
        try:
            theirs = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL raised: {e}")
            n_fail += 1
            continue
        problems = compare(name, mine, theirs)
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(mine)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_nosql} rows-only")
    ray.shutdown()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
