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