"""Cell assignment, prefix histogram and skew salting."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from demeter_ray.functions import geo
from demeter_ray.sources.tables import read_images
from demeter_ray.stages import cells


@pytest.fixture(scope="module")
def assigned(ray_session, tiny_fixtures):
    ds = read_images(f"{tiny_fixtures}/images.parquet").drop_columns(["bytes"])
    return cells.assign_cells(ds, fine_res=12, prefix_res=8, salt=4)


def test_cell_columns_match_direct_math(assigned, tiny_fixtures):
    df = assigned.to_pandas()
    cid = geo.cell_id(df["lon"].to_numpy(), df["lat"].to_numpy(), 12)
    assert (df["cell"].to_numpy() == cid).all()
    assert (df["cell_prefix"].to_numpy() == geo.cell_parent_id(cid, 4)).all()
    assert df["salt"].between(0, 3).all()


def test_salting_splits_hot_prefix(assigned):
    """Fixture plants 50% of images in one hot strip; salting must spread
    the hot prefix across multiple (prefix, salt) reducers."""
    df = assigned.to_pandas()
    by_prefix = df.groupby("cell_prefix").size().sort_values(ascending=False)
    hot = by_prefix.index[0]
    assert by_prefix.iloc[0] >= 0.3 * len(df)  # skew is real
    hot_salts = df[df["cell_prefix"] == hot]["salt"].nunique()
    assert hot_salts >= 2  # the hot key fans out
    groups = df.groupby(["cell_prefix", "salt"]).size()
    assert groups.max() < by_prefix.iloc[0]  # no single reducer holds the hot key


def test_prefix_histogram(ray_session, tiny_fixtures):
    ds = read_images(f"{tiny_fixtures}/images.parquet").drop_columns(["bytes"])
    ds = cells.assign_cells(ds, fine_res=12, prefix_res=8)
    hist = cells.prefix_histogram(ds)
    df = hist.to_pandas()
    assert df["n"].sum() == 60
    assert (df["n"] > 0).all()