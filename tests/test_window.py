"""Window operators (oracle_window): cross-block carry correctness.

The rank/lag operators stitch per-block partials across block boundaries;
these tests force MANY tiny blocks with duplicate order-values spanning
boundaries — the case the sf-table oracle check may never exercise — and
compare against a pandas groundtruth.
"""

import numpy as np
import pandas as pd
import pytest
import ray.data

from demeter_ray.pipelines.oracle_window import lag_delta_window, ranked_window


def _rank_truth(df: pd.DataFrame) -> pd.DataFrame:
    out = df.copy()
    out["rn"] = (
        out.sort_values(["val", "key"], ascending=[False, True])
        .groupby("part")
        .cumcount()
        + 1
    )
    out["rnk"] = (
        out.groupby("part")["val"].rank(method="min", ascending=False).astype(np.int64)
    )
    out["drnk"] = (
        out.groupby("part")["val"].rank(method="dense", ascending=False).astype(np.int64)
    )
    return out.sort_values(["part", "rn"]).reset_index(drop=True)[
        ["part", "key", "rn", "rnk", "drnk"]
    ]


@pytest.mark.parametrize("n_blocks", [1, 7])
def test_ranked_window_duplicate_runs_across_blocks(ray_session, n_blocks):
    # heavy duplication: 3 partitions x 40 rows drawn from only 5 distinct
    # values — every block boundary lands inside some equal-value run
    rng = np.random.RandomState(11)
    df = pd.DataFrame(
        {
            "part": np.repeat([1, 2, 3], 40),
            "val": rng.choice([10.0, 20.0, 30.0, 40.0, 50.0], size=120),
            "key": np.arange(120),
        }
    )
    ds = ray.data.from_pandas(df).repartition(n_blocks)
    got = ranked_window(ds, "part", "val", "key")
    got.columns = ["part", "key", "rn", "rnk", "drnk"]
    pd.testing.assert_frame_equal(got, _rank_truth(df))


def test_ranked_window_single_value_partition(ray_session):
    # one partition, ONE distinct value, many blocks: the whole partition is
    # one run crossing every boundary (the n_distinct==1 carry branch)
    df = pd.DataFrame({"part": 1, "val": 7.0, "key": np.arange(30)})
    ds = ray.data.from_pandas(df).repartition(6)
    got = ranked_window(ds, "part", "val", "key")
    got.columns = ["part", "key", "rn", "rnk", "drnk"]
    assert (got["rnk"] == 1).all()
    assert (got["drnk"] == 1).all()
    assert list(got["rn"]) == list(range(1, 31))


def test_lag_delta_window_across_blocks(ray_session):
    rng = np.random.RandomState(5)
    df = pd.DataFrame(
        {
            "part": np.repeat([1, 2], 50),
            "ts": np.concatenate(
                [np.cumsum(rng.randint(1, 100, 50)) for _ in range(2)]
            ).astype(np.int64),
            "id": np.arange(100),
        }
    )
    ds = ray.data.from_pandas(df).repartition(9)
    got = lag_delta_window(ds, "part", "ts", "id")
    truth = df.sort_values(["part", "ts", "id"]).reset_index(drop=True)
    expect = truth.groupby("part")["ts"].diff().to_numpy()
    got = got.set_index("id").loc[truth["id"]]
    a, b = got["delta_us"].to_numpy(), expect
    assert ((a == b) | (np.isnan(a) & np.isnan(b))).all()


@pytest.mark.parametrize("n_blocks", [1, 5, 17])
def test_interval_count_window_across_blocks(ray_session, n_blocks):
    """Trailing RANGE-frame count vs a brute-force groundtruth, with tiny
    blocks so user runs, equal-ts peer runs and sub-window block spans all
    cross boundaries."""
    from demeter_ray.pipelines.oracle_window import interval_count_window

    rng = np.random.default_rng(7)
    n = 240
    W = 100
    df = pd.DataFrame({
        "part": rng.integers(0, 4, n),
        # coarse grid => many exact ties, many rows inside one window
        "ts": rng.integers(0, 30, n) * 20,
        "key": np.arange(n, dtype=np.int64),
    })
    truth = []
    for i in range(n):
        u, t = df["part"][i], df["ts"][i]
        truth.append(int(((df["part"] == u)
                          & (df["ts"] >= t - W)
                          & (df["ts"] <= t)).sum()))
    df["want"] = truth

    ds = ray.data.from_pandas(df[["part", "ts", "key"]]).repartition(n_blocks)
    got = interval_count_window(ds, "part", "ts", "key", W)
    merged = df.merge(got, on="key", suffixes=("", "_got"))
    assert (merged["cnt_1h"] == merged["want"]).all(), merged[
        merged["cnt_1h"] != merged["want"]].head()


@pytest.mark.parametrize("n_blocks", [1, 9])
def test_interval_sum_window_across_blocks(ray_session, n_blocks):
    from demeter_ray.pipelines.oracle_window import interval_agg_window

    rng = np.random.default_rng(11)
    n = 200
    W = 100
    df = pd.DataFrame({
        "part": rng.integers(0, 3, n),
        "ts": rng.integers(0, 25, n) * 20,
        "key": np.arange(n, dtype=np.int64),
        "val": rng.normal(10.0, 3.0, n),
    })
    truth = []
    for i in range(n):
        u, t = df["part"][i], df["ts"][i]
        m = (df["part"] == u) & (df["ts"] >= t - W) & (df["ts"] <= t)
        truth.append(float(df.loc[m, "val"].sum()))
    df["want"] = truth

    ds = ray.data.from_pandas(df[["part", "ts", "key", "val"]]).repartition(n_blocks)
    got = interval_agg_window(ds, "part", "ts", "key", W, val_col="val")
    merged = df.merge(got, on="key")
    assert np.allclose(merged["sum_1h"], merged["want"], atol=1e-9), merged[
        ~np.isclose(merged["sum_1h"], merged["want"])].head()
