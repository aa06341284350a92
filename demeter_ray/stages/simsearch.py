"""Similarity search over an embedding column (SURVEY.md 'Similarity
search' requirement).

- ``brute_force_topk``: exact cosine top-k — per-batch float64 matmul
  against a broadcast normalized query matrix, local top-k per batch, tiny
  global resolve.  The baseline and the verifier for the ANN path.
- ``ivf_topk``: the scale path — k-means-lite (deterministic seeded
  iterations) coarse quantizer built on a sample; vectors assign to their
  nearest centroid list ONCE (the IVF index build = one pass, stored as a
  bucket column); queries probe only the ``nprobe`` nearest lists.  Recall
  is tunable by nprobe; exactness is verified against brute force in tests.

Both run as ``map_batches`` over ``batch_format="pyarrow"`` with the
embedding column converted zero-copy-ish to a float64 matrix per batch.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data


def _emb_matrix(batch: pa.Table) -> np.ndarray:
    """FixedSizeList/List of float -> (N, D) float64 via Arrow buffer
    flatten — no per-row Python objects (the hot path of every embedding
    stage)."""
    col = batch["embedding"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    return flat.reshape(len(col), -1)


def _normalize(E: np.ndarray) -> np.ndarray:
    return E / np.linalg.norm(E, axis=1, keepdims=True)


def brute_force_topk(
    ds: ray.data.Dataset, query_vecs: np.ndarray, k: int = 5,
    exclude_ids: frozenset = frozenset(),
) -> pd.DataFrame:
    """Exact top-k per query: (query_idx, rank, vec_id, sim)."""
    Q = _normalize(np.atleast_2d(np.asarray(query_vecs, dtype=np.float64)))
    ref = ray.put(Q)

    def local_topk(batch: pa.Table) -> pa.Table:
        q = ray.get(ref)
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        keep = ~np.isin(ids, list(exclude_ids)) if exclude_ids else slice(None)
        ids = ids[keep]
        if len(ids) == 0:
            return pa.table({"query_idx": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
        E = _normalize(_emb_matrix(batch)[keep] if exclude_ids else _emb_matrix(batch))
        S = E @ q.T  # (N, Q)
        out_q, out_id, out_s = [], [], []
        for qi in range(S.shape[1]):
            top = np.argsort(-S[:, qi], kind="stable")[:k]
            out_q.extend([qi] * len(top))
            out_id.extend(ids[top].tolist())
            out_s.extend(S[top, qi].tolist())
        return pa.table({"query_idx": pa.array(out_q, pa.int64()),
                         "vec_id": pa.array(out_id, pa.int64()),
                         "sim": pa.array(out_s, pa.float64())})

    cand = ds.map_batches(local_topk, batch_format="pyarrow").to_pandas()
    out = []
    for qi, g in cand.groupby("query_idx"):
        g = g.sort_values(["sim", "vec_id"], ascending=[False, True]).head(k)
        g = g.assign(rank=np.arange(1, len(g) + 1, dtype=np.int64))
        out.append(g)
    return (
        pd.concat(out, ignore_index=True)[["query_idx", "rank", "vec_id", "sim"]]
        if out else pd.DataFrame(columns=["query_idx", "rank", "vec_id", "sim"])
    )


def train_ivf_centroids(sample: np.ndarray, n_lists: int, iters: int = 5,
                        seed: int = 42) -> np.ndarray:
    """Deterministic k-means on normalized vectors (cosine ~ dot on unit
    sphere)."""
    rng = np.random.RandomState(seed)
    X = _normalize(np.asarray(sample, dtype=np.float64))
    C = X[rng.choice(len(X), size=min(n_lists, len(X)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(X @ C.T, axis=1)
        for j in range(len(C)):
            members = X[assign == j]
            if len(members):
                C[j] = members.mean(axis=0)
        C = _normalize(C)
    return C


def build_ivf_index(ds: ray.data.Dataset, n_lists: int = 16) -> ray.data.Dataset:
    """One pass: append a ``bucket`` column = nearest centroid id.  The
    bucket column is the shuffle/prune key; at scale, write the dataset
    partitioned by bucket so queries read only probed lists."""
    sample = _emb_matrix(
        pa.Table.from_pandas(ds.limit(2048).to_pandas(), preserve_index=False)
    )
    C = train_ivf_centroids(sample, n_lists)
    ref = ray.put(C)

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(ref)
        E = _normalize(_emb_matrix(batch))
        bucket = np.argmax(E @ c.T, axis=1).astype(np.int64)
        return batch.append_column("bucket", pa.array(bucket, pa.int64()))

    out = ds.map_batches(assign, batch_format="pyarrow")
    out.ivf_centroids = C  # type: ignore[attr-defined]
    return out


def ivf_topk(
    indexed_ds: ray.data.Dataset, centroids: np.ndarray, query_vecs: np.ndarray,
    k: int = 5, nprobe: int = 4, exclude_ids: frozenset = frozenset(),
) -> pd.DataFrame:
    """ANN top-k probing only the nprobe nearest lists per query."""
    Q = _normalize(np.atleast_2d(np.asarray(query_vecs, dtype=np.float64)))
    probe = np.argsort(-(Q @ centroids.T), axis=1)[:, :nprobe]  # (Qn, nprobe)
    wanted = sorted(set(probe.ravel().tolist()))
    pruned = indexed_ds.filter(expr=f"bucket in {wanted}")
    ref = ray.put((Q, probe))

    def local_topk(batch: pa.Table) -> pa.Table:
        q, pr = ray.get(ref)
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        buckets = batch["bucket"].to_numpy(zero_copy_only=False)
        keep = ~np.isin(ids, list(exclude_ids)) if exclude_ids else np.ones(len(ids), bool)
        out_q, out_id, out_s = [], [], []
        E = _normalize(_emb_matrix(batch))
        for qi in range(len(q)):
            m = keep & np.isin(buckets, pr[qi])
            if not m.any():
                continue
            sims = E[m] @ q[qi]
            sel = np.argsort(-sims, kind="stable")[:k]
            out_q.extend([qi] * len(sel))
            out_id.extend(ids[m][sel].tolist())
            out_s.extend(sims[sel].tolist())
        return pa.table({"query_idx": pa.array(out_q, pa.int64()),
                         "vec_id": pa.array(out_id, pa.int64()),
                         "sim": pa.array(out_s, pa.float64())})

    cand = pruned.map_batches(local_topk, batch_format="pyarrow").to_pandas()
    out = []
    for qi, g in cand.groupby("query_idx"):
        g = g.sort_values(["sim", "vec_id"], ascending=[False, True]).head(k)
        g = g.assign(rank=np.arange(1, len(g) + 1, dtype=np.int64))
        out.append(g)
    return (
        pd.concat(out, ignore_index=True)[["query_idx", "rank", "vec_id", "sim"]]
        if out else pd.DataFrame(columns=["query_idx", "rank", "vec_id", "sim"])
    )
