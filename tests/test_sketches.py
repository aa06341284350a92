"""HLL sketch: estimates within the theoretical error bound vs exact."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from demeter_ray.functions.hashing import TokenHasher
from demeter_ray.stages.sketches import approx_distinct, hll_add, hll_estimate


def test_hll_kernel_accuracy():
    p = 12
    m = 1 << p
    th = TokenHasher()
    for true_n in (100, 5_000, 50_000):
        regs = np.zeros(m, dtype=np.int64)
        hashes = th.hash_tokens([f"v{i}" for i in range(true_n)]).astype(np.uint64) << np.uint64(1)
        hll_add(regs, hashes, p)
        est = hll_estimate(regs)
        rel_err = abs(est - true_n) / true_n
        assert rel_err < 3 * 1.04 / np.sqrt(m), (true_n, est)


def test_hll_merge_equals_single_pass():
    p = 10
    th = TokenHasher()
    all_vals = [f"x{i}" for i in range(10_000)]
    single = np.zeros(1 << p, dtype=np.int64)
    hll_add(single, th.hash_tokens(all_vals).astype(np.uint64) << np.uint64(1), p)
    # two halves with overlap, merged by max
    a = np.zeros(1 << p, dtype=np.int64)
    b = np.zeros(1 << p, dtype=np.int64)
    hll_add(a, th.hash_tokens(all_vals[:6000]).astype(np.uint64) << np.uint64(1), p)
    hll_add(b, th.hash_tokens(all_vals[4000:]).astype(np.uint64) << np.uint64(1), p)
    merged = np.maximum(a, b)
    np.testing.assert_array_equal(merged, single)  # mergeability is exact


def test_approx_distinct_ray(ray_session):
    ds = ray.data.read_parquet("/root/testdata/sf0.01/events.parquet",
                               columns=["user_id"])
    exact = ds.to_pandas()["user_id"].nunique()
    est = approx_distinct(ds, "user_id", p=12)
    assert abs(est - exact) / exact < 0.05, (est, exact)

def test_grouped_exact_quantiles_matches_numpy(ray_session):
    """Count-histogram quantiles == numpy linear-interpolation percentiles
    (the QUANTILE_CONT convention) on every group, odd and even counts."""
    import pandas as pd
    import ray.data

    from demeter_ray.stages.sketches import grouped_exact_quantiles

    rng = np.random.RandomState(23)
    df = pd.DataFrame(
        {
            "k": rng.choice(["a", "b", "c"], 5000),
            "v": rng.randint(0, 40, 5000).astype(np.float64),
        }
    )
    # odd-count group for the integer-h path
    df = pd.concat([df, pd.DataFrame({"k": ["d"] * 7, "v": [1.0, 2, 3, 4, 5, 6, 7]})])
    ds = ray.data.from_pandas(df.reset_index(drop=True)).repartition(6)
    out = grouped_exact_quantiles(ds, "k", "v", [0.5, 0.9])
    for _, r in out.iterrows():
        vals = df[df["k"] == r["k"]]["v"].to_numpy()
        assert r["q50"] == pytest.approx(np.percentile(vals, 50), abs=1e-4)
        assert r["q90"] == pytest.approx(np.percentile(vals, 90), abs=1e-4)
    assert out[out["k"] == "d"]["q50"].iloc[0] == 4.0


def test_sorted_quantiles_matches_numpy(ray_session):
    import ray.data
    from demeter_ray.stages.sketches import sorted_quantiles

    rng = np.random.RandomState(3)
    vals = rng.lognormal(4.0, 1.0, size=5000)
    ds = ray.data.from_pandas(pd.DataFrame({"v": vals})).repartition(11)
    out = sorted_quantiles(ds, "v", [0.5, 0.9, 0.99])
    for q, col in [(50, "q50"), (90, "q90"), (99, "q99")]:
        expect = round(float(np.percentile(vals, q)), 4)
        assert abs(out[col].iloc[0] - expect) < 1e-9, (col, out[col].iloc[0], expect)


def test_sorted_quantiles_degenerate_correct_or_loud(ray_session):
    """All-equal values: either the range sort collapses the run into one
    block (answer exact) or block identities collide (loud ValueError) —
    never a silent wrong answer."""
    import pytest as _pytest
    import ray.data
    from demeter_ray.stages.sketches import sorted_quantiles

    df = pd.DataFrame({"v": np.full(4000, 7.0)})
    ds = ray.data.from_pandas(df).repartition(8)
    try:
        out = sorted_quantiles(ds, "v", [0.5])
    except ValueError as e:
        assert "degenerate" in str(e)
    else:
        assert out["q50"].iloc[0] == 7.0


def test_grouped_sorted_quantiles_matches_numpy(ray_session):
    import ray.data
    from demeter_ray.stages.sketches import grouped_sorted_quantiles

    rng = np.random.RandomState(7)
    df = pd.DataFrame(
        {"k": rng.randint(0, 5, size=4000), "v": rng.lognormal(3, 1, size=4000)}
    )
    ds = ray.data.from_pandas(df).repartition(9)
    out = grouped_sorted_quantiles(ds, "k", "v", [0.5, 0.9])
    for kk, g in df.groupby("k"):
        row = out[out["k"] == kk].iloc[0]
        assert abs(row["q50"] - round(float(np.percentile(g["v"], 50)), 4)) < 1e-9
        assert abs(row["q90"] - round(float(np.percentile(g["v"], 90)), 4)) < 1e-9


def test_profile_columns_gate_parity(ray_session):
    """Both NDV branches (driver union vs groupby-count shuffle) agree."""
    import numpy as np
    import pandas as pd
    import ray.data

    from demeter_ray.stages.sketches import profile_numeric_columns

    rng = np.random.RandomState(3)
    df = pd.DataFrame({
        "a": rng.randint(0, 37, 5000).astype(np.int64),
        "b": rng.uniform(0, 1, 5000).round(6),
    })
    df.loc[df.index[:100], "b"] = np.nan
    ds = ray.data.from_pandas([c for c in np.array_split(df, 6)])
    big = profile_numeric_columns(ds, ["a", "b"], ndv_cap=10**6)
    small = profile_numeric_columns(ds, ["a", "b"], ndv_cap=10)  # force shuffle
    pd.testing.assert_frame_equal(big, small)
    row_a = big[big["col"] == "a"].iloc[0]
    assert row_a["ndv"] == df["a"].nunique() and row_a["n_null"] == 0
    row_b = big[big["col"] == "b"].iloc[0]
    assert row_b["n_null"] == 100 and row_b["ndv"] == df["b"].nunique()
