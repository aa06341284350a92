"""Size-gated plan fallbacks: the broadcast semi/anti join and the driver
combine must produce identical results when forced onto their shuffle paths
(cap=0), so the gate is purely a performance decision."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from demeter_ray.pipelines import relational


def _norm(df, cols):
    df = df.to_pandas() if hasattr(df, "to_pandas") else df
    return df[cols].sort_values(cols).reset_index(drop=True)


@pytest.fixture(scope="module")
def sides(ray_session):
    rng = np.random.RandomState(7)
    left = pd.DataFrame(
        {"k": np.arange(1000, dtype=np.int64), "payload": rng.randint(0, 100, 1000)}
    )
    # key side with duplicates and a disjoint tail
    keys = pd.DataFrame({"fk": np.repeat(np.arange(300, 1300, dtype=np.int64), 2)})
    return ray.data.from_pandas(left), ray.data.from_pandas(keys)


def test_semi_join_gate_parity(sides):
    left, keys = sides
    bcast = relational.gated_semi_join(left, "k", keys, "fk", cap=10**9)
    shuffled = relational.gated_semi_join(left, "k", keys, "fk", cap=0)
    a = _norm(bcast, ["k", "payload"])
    b = _norm(shuffled, ["k", "payload"])
    pd.testing.assert_frame_equal(a, b)
    assert len(a) == 700  # keys 300..999 present


def test_anti_join_gate_parity(sides):
    left, keys = sides
    bcast = relational.gated_semi_join(left, "k", keys, "fk", anti=True, cap=10**9)
    shuffled = relational.gated_semi_join(left, "k", keys, "fk", anti=True, cap=0)
    a = _norm(bcast, ["k", "payload"])
    b = _norm(shuffled, ["k", "payload"])
    pd.testing.assert_frame_equal(a, b)
    assert len(a) == 300  # keys 0..299 unmatched


def test_partial_shuffle_combine_gate_parity(ray_session):
    rng = np.random.RandomState(11)
    df = pd.DataFrame(
        {
            "g": rng.randint(0, 50, 5000).astype(np.int64),
            "h": rng.randint(0, 7, 5000).astype(np.int64),
            "v": rng.uniform(0, 10, 5000),
        }
    )
    ds = ray.data.from_pandas(df).repartition(8)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby(["g", "h"], as_index=False).agg(
            n=("v", "size"), s=("v", "sum")
        )

    drv = relational.partial_shuffle_combine(
        ds, partial, ["g", "h"], ["n", "s"], batch_format="pandas", driver_cap=10**9
    )
    shf = relational.partial_shuffle_combine(
        ds, partial, ["g", "h"], ["n", "s"], batch_format="pandas", driver_cap=0
    )
    a = drv.sort_values(["g", "h"]).reset_index(drop=True)
    b = shf[["g", "h", "n", "s"]].sort_values(["g", "h"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b.astype(a.dtypes.to_dict()), check_exact=False, rtol=1e-12)


def test_asof_join_grouped_semantics(ray_session):
    """As-of join: latest right row at-or-before each left row, per key —
    exact-timestamp inclusivity, cross-key isolation, empty right side."""
    a = pd.DataFrame({"k": [1, 1, 1, 2, 3], "t": [10, 20, 30, 15, 5],
                      "aid": [100, 101, 102, 103, 104]})
    b = pd.DataFrame({"k": [1, 1, 2], "t": [10, 25, 50], "bval": [7, 9, 11]})
    out = relational.asof_join_grouped(
        ray.data.from_pandas(a), ray.data.from_pandas(b), "k", "t", ["bval"]
    ).to_pandas().sort_values("aid").reset_index(drop=True)
    got = dict(zip(out["aid"], out["asof_bval"]))
    assert got[100] == 7.0        # exact-ts match is inclusive (t >= b.t)
    assert got[101] == 7.0        # before the 25 row
    assert got[102] == 9.0        # latest of the two
    assert np.isnan(got[103])     # b row at t=50 is in the future
    assert np.isnan(got[104])     # key 3 has no right rows at all


def test_asof_join_grouped_int64_precision(ray_session):
    """Right-side int64 values above 2^53 survive the join exactly (the
    pure-Arrow merge carries them as int64-with-nulls, never float64)."""
    import pyarrow as pa

    big = 2**60 + 12345
    a = pd.DataFrame({"k": [1, 1, 2], "t": [10, 20, 5], "aid": [1, 2, 3]})
    b = pd.DataFrame({"k": [1, 2], "t": [9, 50], "bid": [big, big + 7]})
    out = relational.asof_join_grouped(
        ray.data.from_pandas(a), ray.data.from_pandas(b), "k", "t", ["bid"]
    )
    tbl = pa.concat_tables(
        [t for t in ray.get(out.to_arrow_refs()) if t.num_columns]
    )
    assert tbl.schema.field("asof_bid").type == pa.int64()
    df = tbl.to_pandas(
        types_mapper={pa.int64(): pd.Int64Dtype()}.get
    ).sort_values("aid")
    assert df["asof_bid"].tolist()[:2] == [big, big]
    assert pd.isna(df["asof_bid"].tolist()[2])


def test_lookup_join_gate_parity_inner(sides):
    left, _ = sides
    dim = ray.data.from_pandas(pd.DataFrame({
        "dk": np.arange(500, 1500, dtype=np.int64),
        "attr": np.arange(500, 1500, dtype=np.int64) * 10,
    }))
    bcast = relational.gated_lookup_join(left, "k", dim, "dk", ["attr"], cap=10**9)
    shuffled = relational.gated_lookup_join(left, "k", dim, "dk", ["attr"], cap=0)
    a = _norm(bcast, ["k", "payload", "attr"])
    b = _norm(shuffled, ["k", "payload", "attr"])
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    assert len(a) == 500 and (a["attr"] == a["k"] * 10).all()


def test_lookup_join_gate_parity_left(sides):
    left, _ = sides
    dim = ray.data.from_pandas(pd.DataFrame({
        "dk": np.arange(500, 1500, dtype=np.int64),
        "attr": np.arange(500, 1500, dtype=np.int64) * 10,
    }))
    bcast = relational.gated_lookup_join(left, "k", dim, "dk", ["attr"],
                                         how="left", cap=10**9)
    shuffled = relational.gated_lookup_join(left, "k", dim, "dk", ["attr"],
                                            how="left", cap=0)
    a = _norm(bcast, ["k", "payload", "attr"])
    b = _norm(shuffled, ["k", "payload", "attr"])
    # unmatched rows keep nulls on both paths
    assert a["attr"].isna().sum() == 500 == b["attr"].isna().sum()
    matched_a = a.dropna(subset=["attr"]).reset_index(drop=True)
    matched_b = b.dropna(subset=["attr"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(matched_a, matched_b, check_dtype=False)
    assert len(a) == 1000 == len(b)


def test_bloom_semi_join_parity(sides):
    """Bloom-prefiltered semi-join is exactly the plain semi-join, even with
    a tiny bitmap forcing a high false-positive rate (exact verify removes
    them); the prefilter alone never drops a true member."""
    left, keys = sides
    plain = _norm(relational.gated_semi_join(left, "k", keys, "fk"),
                  ["k", "payload"])
    bloom = _norm(relational.bloom_semi_join(left, "k", keys, "fk",
                                             n_bits_log2=16), ["k", "payload"])
    pd.testing.assert_frame_equal(plain, bloom)
    # 256-bit bitmap: huge fpr, but the prefilter must keep all true members
    pre = relational.bloom_semi_join(left, "k", keys, "fk", n_bits_log2=8,
                                     exact=False).to_pandas()
    assert set(plain["k"]).issubset(set(pre["k"]))


def test_gated_group_sum_ds_parity(ray_session):
    """Both branches of gated_group_sum_ds (driver combine vs native
    groupby.aggregate) agree for sum and for mixed min/max reductions."""
    rng = np.random.RandomState(11)
    df = pd.DataFrame({
        "k": rng.randint(0, 50, 2000).astype(np.int64),
        "a": rng.randint(-1000, 1000, 2000).astype(np.int64),
        "b": rng.randint(0, 10**6, 2000).astype(np.int64),
    })
    ds = ray.data.from_pandas(df).repartition(7)

    def partial(b):
        return b.groupby("k", as_index=False).agg(a=("a", "sum"), b=("b", "sum"))

    lo = _norm(relational.gated_group_sum_ds(ds, partial, ["k"], ["a", "b"],
                                             driver_cap=10**9), ["k", "a", "b"])
    hi = _norm(relational.gated_group_sum_ds(ds, partial, ["k"], ["a", "b"],
                                             driver_cap=0), ["k", "a", "b"])
    pd.testing.assert_frame_equal(lo, hi, check_dtype=False)
    ref = df.groupby("k", as_index=False).agg(a=("a", "sum"), b=("b", "sum"))
    pd.testing.assert_frame_equal(lo, _norm(ref, ["k", "a", "b"]),
                                  check_dtype=False)

    def mm_partial(b):
        return b.groupby("k", as_index=False).agg(a=("a", "min"), b=("b", "max"))

    agg = {"a": "min", "b": "max"}
    lo = _norm(relational.gated_group_sum_ds(ds, mm_partial, ["k"], ["a", "b"],
                                             driver_cap=10**9, agg=agg),
               ["k", "a", "b"])
    hi = _norm(relational.gated_group_sum_ds(ds, mm_partial, ["k"], ["a", "b"],
                                             driver_cap=0, agg=agg),
               ["k", "a", "b"])
    pd.testing.assert_frame_equal(lo, hi, check_dtype=False)
    ref = df.groupby("k", as_index=False).agg(a=("a", "min"), b=("b", "max"))
    pd.testing.assert_frame_equal(lo, _norm(ref, ["k", "a", "b"]),
                                  check_dtype=False)
