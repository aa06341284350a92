"""Distributed exact-Jaccard verify parity: with the driver cap forced to 0
the verify runs inside pair-partition tasks (pairs shuffled on vkey, token
sets joined in per partition) — output must be IDENTICAL to the driver-side
verify path on the same corpus."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from demeter_ray.stages import dedup


def _docs(texts):
    return ray.data.from_pandas(
        pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts})
    )


@pytest.fixture(scope="module")
def mixed_corpus(ray_session):
    rng = np.random.default_rng(5)
    texts = []
    # near-dup pairs at varying overlap (some above, some below threshold)
    for g in range(30):
        base = [f"w{g}_{i}" for i in range(20)]
        texts.append(" ".join(base))
        mut = list(base)
        for k in range(int(rng.integers(0, 8))):
            mut[int(rng.integers(0, 20))] = f"mut{g}_{k}"
        texts.append(" ".join(mut))
    # identical triples
    for g in range(10):
        texts += [" ".join(f"t{g}_{i}" for i in range(15))] * 3
    # unique singletons
    for u in range(50):
        texts.append(" ".join(f"s{u}_{i}" for i in range(15)))
    return texts


def test_distributed_verify_parity(ray_session, mixed_corpus):
    driver = dedup.minhash_neardup(_docs(mixed_corpus), jaccard_threshold=0.5)
    dist = dedup.minhash_neardup(
        _docs(mixed_corpus), jaccard_threshold=0.5, verify_driver_cap=0
    )
    assert len(driver) > 0  # the corpus genuinely exercises the funnel
    pd.testing.assert_frame_equal(driver, dist)


def test_distributed_verify_parity_ngram_mode(ray_session, mixed_corpus):
    driver = dedup.ngram_jaccard_neardup(_docs(mixed_corpus[:60]), threshold=0.6)
    dist = dedup.minhash_neardup(
        _docs(mixed_corpus[:60]), num_perm=128, bands=32, jaccard_threshold=0.6,
        mode="ngram", n=3, verify_driver_cap=0,
    )
    pd.testing.assert_frame_equal(driver, dist)


def test_distributed_verify_empty_result(ray_session):
    # all-unique corpus: candidates may exist transiently but no pair
    # survives; the distributed path must return the same empty frame
    texts = [" ".join(f"u{d}_{i}" for i in range(12)) for d in range(40)]
    dist = dedup.minhash_neardup(
        _docs(texts), jaccard_threshold=0.9, verify_driver_cap=0
    )
    assert list(dist.columns) == ["a_id", "b_id", "jaccard"]
    assert dist.empty
