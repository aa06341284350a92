"""Similarity search: brute-force exactness + IVF recall vs brute force."""

import numpy as np
import pandas as pd
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

def test_lsh_cosine_neardup_precision_and_recall(ray_session):
    """Distributed LSH near-dup: every emitted pair is exact-verified
    (precision 1.0); banding recall >= 0.9 vs brute force at the threshold."""
    import ray.data

    from demeter_ray.stages.simsearch import _normalize, lsh_cosine_neardup

    rng = np.random.RandomState(17)
    base = rng.standard_normal((120, 32))
    # plant 40 near-dup partners: small perturbations of the first 40
    partners = base[:40] + rng.standard_normal((40, 32)) * 0.35
    E = np.concatenate([base, partners])
    ids = np.arange(len(E), dtype=np.int64)
    import pandas as pd

    df = pd.DataFrame({"vec_id": ids, "embedding": [list(v) for v in E.astype(np.float64)]})
    ds = ray.data.from_pandas(df)
    got = lsh_cosine_neardup(ds, threshold=0.8)
    En = _normalize(E)
    S = En @ En.T
    iu = np.triu_indices(len(ids), 1)
    hit = S[iu] >= 0.8
    exact = set(zip(iu[0][hit], iu[1][hit]))
    gp = set(zip(got["a_id"], got["b_id"]))
    assert gp <= exact  # precision 1.0 (exact verify)
    assert len(gp & exact) / max(1, len(exact)) >= 0.9
    assert len(exact) >= 30  # the planted partners are present


def test_distributed_kmeans_recovers_separated_blobs(ray_session):
    """Three well-separated directional blobs: distributed Lloyd must give
    each blob one pure cluster, deterministically across runs and block
    layouts."""
    import ray.data

    from demeter_ray.stages.simsearch import distributed_kmeans

    rng = np.random.default_rng(3)
    centers = np.eye(3)
    vecs, truth = [], []
    for ci in range(3):
        base = np.zeros(8); base[ci] = 1.0
        for _ in range(40):
            v = base + rng.normal(0, 0.05, 8)
            vecs.append(v / np.linalg.norm(v)); truth.append(ci)
    df = pd.DataFrame({"vec_id": np.arange(120, dtype=np.int64),
                       "embedding": [v.tolist() for v in vecs]})

    outs = []
    for nblocks in (1, 7):
        ds = ray.data.from_pandas(df).repartition(nblocks)
        C, assigned = distributed_kmeans(ds, k=3, iters=8)
        a = assigned.to_pandas().sort_values("vec_id")["cluster"].to_numpy()
        # purity: every truth-blob maps to exactly one cluster label
        for ci in range(3):
            labels = set(a[np.array(truth) == ci])
            assert len(labels) == 1, (ci, labels)
        outs.append((np.asarray(C), a))
    # block layout must not change the result (order-independent reduction)
    assert np.array_equal(outs[0][1], outs[1][1])
    assert np.allclose(outs[0][0], outs[1][0])


def test_ivf_training_sample_block_order_invariant(ray_session):
    """The coarse quantizer must train on the same matrix however the
    corpus is partitioned/ordered (limit(n) would take the first blocks)."""
    from demeter_ray.stages.simsearch import ivf_training_sample, train_ivf_centroids

    rng = np.random.default_rng(9)
    n, d = 6000, 16
    df = pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": list(rng.normal(size=(n, d)).astype(np.float64)),
        }
    )
    fwd = ray.data.from_pandas(df)
    rev = ray.data.from_pandas(df.iloc[::-1].reset_index(drop=True)).repartition(13)
    s1 = ivf_training_sample(fwd, target=512)
    s2 = ivf_training_sample(rev, target=512)
    np.testing.assert_array_equal(s1, s2)
    assert 512 * 0.7 <= len(s1) <= 512 * 1.9  # hash sample lands near target
    c1 = train_ivf_centroids(s1, 8)
    c2 = train_ivf_centroids(s2, 8)
    np.testing.assert_array_equal(c1, c2)
    # small corpora train on every row, sorted
    small = ivf_training_sample(fwd.limit(100), target=512)
    assert len(small) == 100


def test_ivf_kmeans_trained_recall(emb_ds, emb_np):
    """The distributed-Lloyd-trained IVF must reach the same recall bar as
    the sample-trained one (scale path for 100-TB embedding counts)."""
    ids, E = emb_np
    queries = E[:8]
    indexed = build_ivf_index(emb_ds, n_lists=8, train="kmeans")
    C = indexed.ivf_centroids
    approx = ivf_topk(indexed, C, queries, k=5, nprobe=4)
    exact = brute_force_topk(emb_ds, queries, k=5)
    hits = 0
    for qi in range(len(queries)):
        a = set(approx[approx["query_idx"] == qi]["vec_id"])
        b = set(exact[exact["query_idx"] == qi]["vec_id"])
        hits += len(a & b)
    assert hits / (5 * len(queries)) >= 0.6


def test_distributed_kmeans_block_order_invariant(ray_session):
    from demeter_ray.stages.simsearch import distributed_kmeans

    rng = np.random.default_rng(17)
    n, d = 3000, 8
    df = pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": list(rng.normal(size=(n, d)).astype(np.float64)),
        }
    )
    fwd = ray.data.from_pandas(df)
    rev = ray.data.from_pandas(df.iloc[::-1].reset_index(drop=True)).repartition(7)
    c1, _ = distributed_kmeans(fwd, k=6, iters=3)
    c2, _ = distributed_kmeans(rev, k=6, iters=3)
    # the INIT sample is bit-invariant (hash sample, sorted); iteration
    # partials regroup float additions under a different block layout, so
    # centroids agree to float-summation jitter, not bit-exactly — the
    # limit(2048) prefix bug this guards against produced entirely
    # different init samples, far outside this tolerance
    np.testing.assert_allclose(c1, c2, rtol=1e-9, atol=1e-12)
