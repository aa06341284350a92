"""Distributed near-dup funnel: the shuffle-partitioned MinHash-LSH and
SimHash paths must find known duplicate groups, survive degenerate
(all-similar) corpora via the bucket cap, and agree with a brute-force
exact-Jaccard reference on the pairs they emit."""

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
def dup_corpus(ray_session):
    # 40 groups of 3 identical docs + 80 unique-vocabulary singletons
    texts = []
    for g in range(40):
        body = " ".join(f"tok{g}_{i}" for i in range(12))
        texts += [body] * 3
    for u in range(80):
        texts.append(" ".join(f"solo{u}_{i}" for i in range(12)))
    return texts


def test_minhash_finds_identical_groups(ray_session, dup_corpus):
    out = dedup.minhash_neardup(_docs(dup_corpus), jaccard_threshold=0.9)
    # each triple {3g, 3g+1, 3g+2} contributes exactly its 3 pairs at jac 1.0
    expect = set()
    for g in range(40):
        base = 3 * g
        expect |= {(base, base + 1), (base, base + 2), (base + 1, base + 2)}
    got = set(zip(out["a_id"], out["b_id"]))
    assert got == expect
    assert (out["jaccard"] == 1.0).all()


def test_minhash_matches_bruteforce_jaccard(ray_session, dup_corpus):
    """Every emitted pair's jaccard equals the independent set-Jaccard."""
    out = dedup.minhash_neardup(_docs(dup_corpus), jaccard_threshold=0.9)
    sets = [set(t.split()) for t in dup_corpus]
    for a, b, j in zip(out["a_id"], out["b_id"], out["jaccard"]):
        sa, sb = sets[int(a)], sets[int(b)]
        assert j == pytest.approx(len(sa & sb) / len(sa | sb), abs=1e-4)


def test_minhash_dense_cluster_full_pairs(ray_session):
    """A dup cluster whose pair count fits the MAX_BUCKET_PAIRS output
    budget emits ALL its pairs — the pair list is oracle-complete up to
    the budget (sf0.1's ~1M-pair corpus relies on this)."""
    texts = ["alpha beta gamma delta epsilon"] * 250  # 31,125 pairs < budget
    out = dedup.minhash_neardup(_docs(texts), jaccard_threshold=0.9)
    assert (out["jaccard"] == 1.0).all()
    assert len(out) == 250 * 249 // 2  # every pair, exactly once


def test_minhash_degenerate_corpus_capped_chain(ray_session):
    """A cluster whose pair count exceeds the emission budget degrades to
    a connectivity-preserving chain instead of an O(n^2) blowup."""
    texts = ["alpha beta gamma delta epsilon"] * 300  # 44850 pairs > 1000
    out = dedup.minhash_neardup(_docs(texts), jaccard_threshold=0.9,
                                max_bucket_pairs=1000)
    assert (out["jaccard"] == 1.0).all()
    # chain keeps every doc attached to the component
    seen = set(out["a_id"]) | set(out["b_id"])
    assert seen == set(range(300))
    assert len(out) < 2000


def test_minhash_budget_flag_in_band(ray_session):
    """The output is self-describing about pair-list truncation: attrs
    flip exactly when the emission budget binds (VERDICT r4 item 3)."""
    texts = ["alpha beta gamma delta epsilon"] * 60  # 1770 pairs/bucket
    # cap does NOT bind: complete pair list, flag says so
    full = dedup.minhash_neardup(_docs(texts), jaccard_threshold=0.9)
    assert full.attrs["pairs_complete"] is True
    assert full.attrs["truncated_buckets"] == 0
    assert len(full) == 60 * 59 // 2
    # cap binds: truncated list, flag + count say so
    capped = dedup.minhash_neardup(_docs(texts), jaccard_threshold=0.9,
                                   max_bucket_pairs=100)
    assert capped.attrs["pairs_complete"] is False
    assert capped.attrs["truncated_buckets"] > 0
    assert len(capped) < len(full)
    # sentinel rows never leak into the pair list
    assert (capped["a_id"] >= 0).all() and (full["a_id"] >= 0).all()


def test_simhash_pairs_and_hamming(ray_session):
    texts = (
        ["red green blue yellow purple orange"] * 3
        + [" ".join(f"w{u}_{i}" for i in range(10)) for u in range(50)]
    )
    out = dedup.simhash_neardup(_docs(texts), max_hamming=3)
    got = set(zip(out["a_id"], out["b_id"]))
    assert {(0, 1), (0, 2), (1, 2)} <= got
    ident = out[(out["a_id"] < 3) & (out["b_id"] < 3)]
    assert (ident["hamming"] == 0).all()


def test_minhash_empty_and_single(ray_session):
    assert dedup.minhash_neardup(_docs([])).empty
    assert dedup.minhash_neardup(_docs(["just one doc"])).empty
    assert dedup.simhash_neardup(_docs(["just one doc"])).empty


def test_exact_dedup_generic_min_id_per_key(ray_session):
    """Generic exact_dedup keeps exactly the min-id row per key and carries
    the full row through — parity vs an independent pandas reference (the
    semantics the old map_groups path implemented)."""
    rng = np.random.RandomState(3)
    n = 5000
    df = pd.DataFrame(
        {
            "doc_id": rng.permutation(n).astype(np.int64),
            "content_key": rng.randint(0, 700, n).astype(np.int64),
            "payload": [f"row{i}" for i in range(n)],
        }
    )
    ds = ray.data.from_pandas(df)
    got = (
        dedup.exact_dedup(ds, "content_key", "doc_id")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    ref = (
        df.sort_values("doc_id")
        .groupby("content_key", as_index=False)
        .head(1)
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["doc_id", "content_key", "payload"]],
        ref[["doc_id", "content_key", "payload"]],
    )


def test_exact_dedup_generic_shuffle_branch(ray_session):
    """Same parity through the partitioned-join branch of gated_semi_join
    (cap forced to 0 keys)."""
    df = pd.DataFrame(
        {
            "doc_id": np.arange(200, dtype=np.int64),
            "content_key": (np.arange(200) % 37).astype(np.int64),
        }
    )
    ds = ray.data.from_pandas(df)
    got = (
        dedup.exact_dedup(ds, "content_key", "doc_id", cap=0)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    ref = (
        df.groupby("content_key", as_index=False)
        .min()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got["doc_id"].tolist() == ref["doc_id"].tolist()
    assert got["content_key"].tolist() == ref["content_key"].tolist()
