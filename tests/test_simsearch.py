"""Similarity search: brute-force exactness + IVF recall vs brute force."""

import numpy as np
import pytest
import ray.data

from demeter_ray.stages.simsearch import (
    brute_force_topk,
    build_ivf_index,
    ivf_topk,
    train_ivf_centroids,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb_ds(ray_session):
    return ray.data.read_parquet(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])


@pytest.fixture(scope="module")
def emb_np(emb_ds):
    df = emb_ds.to_pandas()
    return df["vec_id"].to_numpy(), np.array(df["embedding"].tolist(), dtype=np.float64)


def test_brute_force_matches_numpy(emb_ds, emb_np):
    ids, E = emb_np
    q = E[0]
    got = brute_force_topk(emb_ds, q, k=5, exclude_ids=frozenset({int(ids[0])}))
    En = E / np.linalg.norm(E, axis=1, keepdims=True)
    sims = En @ (q / np.linalg.norm(q))
    order = [ids[i] for i in np.argsort(-sims, kind="stable") if ids[i] != ids[0]][:5]
    assert got["vec_id"].tolist() == order
    assert got["rank"].tolist() == [1, 2, 3, 4, 5]


def test_ivf_recall_vs_brute_force(emb_ds, emb_np):
    ids, E = emb_np
    queries = E[:8]
    indexed = build_ivf_index(emb_ds, n_lists=8)
    C = indexed.ivf_centroids
    exact = brute_force_topk(emb_ds, queries, k=5)
    approx = ivf_topk(indexed, C, queries, k=5, nprobe=4)
    # recall@5 over the 8 queries
    hits = total = 0
    for qi in range(8):
        e = set(exact[exact["query_idx"] == qi]["vec_id"])
        a = set(approx[approx["query_idx"] == qi]["vec_id"])
        hits += len(e & a)
        total += len(e)
    recall = hits / total
    assert recall >= 0.6, recall
    # full probe == exact
    full = ivf_topk(indexed, C, queries, k=5, nprobe=8)
    for qi in range(8):
        e = exact[exact["query_idx"] == qi]["vec_id"].tolist()
        f = full[full["query_idx"] == qi]["vec_id"].tolist()
        assert e == f, qi


def test_centroids_deterministic():
    rng = np.random.RandomState(0)
    X = rng.randn(500, 16)
    c1 = train_ivf_centroids(X, 8)
    c2 = train_ivf_centroids(X, 8)
    np.testing.assert_array_equal(c1, c2)