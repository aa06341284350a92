"""Regression net: every oracle-checked query must match DuckDB exactly at
sf0.001 (the driver runs the same comparison at sf0.01)."""

import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.001"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


@pytest.fixture(scope="module")
def registry(ray_session):
    import demeter_ray.pipelines.oracle_extra  # noqa: F401
    import demeter_ray.pipelines.oracle_spatial  # noqa: F401
    import demeter_ray.pipelines.oracle_text  # noqa: F401
    import demeter_ray.pipelines.oracle_tpch  # noqa: F401
    import demeter_ray.pipelines.oracle_window  # noqa: F401
    from demeter_ray.pipelines.relational import QUERIES

    return QUERIES


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return c


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def _names(registry=None):
    import demeter_ray.pipelines.oracle_extra  # noqa: F401
    import demeter_ray.pipelines.oracle_spatial  # noqa: F401
    import demeter_ray.pipelines.oracle_text  # noqa: F401
    import demeter_ray.pipelines.oracle_tpch  # noqa: F401
    import demeter_ray.pipelines.oracle_window  # noqa: F401
    from demeter_ray.pipelines.relational import QUERIES

    return sorted(QUERIES)


@pytest.mark.parametrize("name", _names())
def test_query_matches_oracle(name, registry, con):
    fn, sql = registry[name]
    mine = fn(SF_DIR)
    if hasattr(mine, "to_pandas"):
        mine = mine.to_pandas()
    assert len(mine) >= 0
    if sql is None:
        return  # rows-only operator: executed without error is the check here
    theirs = con.execute(sql).df()
    assert sorted(mine.columns) == sorted(theirs.columns), name
    assert len(mine) == len(theirs), name
    a, b = _norm(mine), _norm(theirs)
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            ok = (av.astype(float).fillna(-1e308) == bv.astype(float).fillna(-1e308)).all()
        else:
            ok = (av.fillna("__N").to_numpy() == bv.fillna("__N").to_numpy()).all()
        assert ok, f"{name}: column {c} differs"
