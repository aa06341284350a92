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


def lsh_cosine_neardup(
    ds: ray.data.Dataset,
    threshold: float = 0.4,
    n_bits: int = 64,
    seed: int = 9,
    max_hamming: int | None = None,
) -> pd.DataFrame:
    """Embedding-cosine near-dup, DISTRIBUTED (the scale path of the exact
    O(N^2) oracle query): random-hyperplane signatures (sign of E @ R, a
    64-bit code whose Hamming distance estimates the angle), Charikar
    16-bit chunk bucketing, ``groupby(pkey)`` shuffle, and in-bucket EXACT
    cosine verification over the bucket's own embeddings — so precision is
    exact and only recall depends on the LSH (pairs within ``max_hamming``
    of a shared chunk).  Driver only materializes verified pairs."""
    from demeter_ray.stages.dedup import _bucket_pair_indices, _n_partitions
    import math

    if max_hamming is None:
        # expected Hamming at the threshold angle + slack (prefilter only —
        # the exact cosine verify below decides membership)
        max_hamming = int(n_bits * math.acos(threshold) / math.pi + 0.5) + 8

    def signature(batch: pa.Table) -> pa.Table:
        E = _normalize(_emb_matrix(batch))
        rng = np.random.RandomState(seed)
        Rm = rng.standard_normal((E.shape[1], n_bits))
        bits = (E @ Rm) > 0
        code = np.zeros(len(E), dtype=np.uint64)
        for b in range(n_bits):
            code |= bits[:, b].astype(np.uint64) << np.uint64(b)
        return pa.table(
            {
                "vec_id": batch["vec_id"],
                "code": pa.array(code.view(np.int64), pa.int64()),
                "embedding": batch["embedding"],
            }
        )

    sigs = ds.map_batches(signature, batch_format="pyarrow").materialize()
    n = sigs.count()
    empty = pd.DataFrame(
        {"a_id": pd.Series(dtype="int64"), "b_id": pd.Series(dtype="int64"),
         "sim": pd.Series(dtype="float64")}
    )
    if n < 2:
        return empty
    npart = _n_partitions(n * 16)

    # 16 bands of 4 bits: a pair sharing ANY band becomes a candidate —
    # pigeonhole guarantees candidacy up to Hamming 15/64, and at the
    # cosine-0.4 angle (p_bit ≈ 0.63) P(any band matches) ≈ 0.94.  Wider
    # corpora should raise bits-per-band (selectivity ~ 2^bits) — the
    # classic banding tradeoff, same as the MinHash path.
    n_bands, band_bits = 16, 4

    def emit(batch: pa.Table) -> pa.Table:
        code = batch["code"].to_numpy(zero_copy_only=False).view(np.uint64)
        mask = np.uint64((1 << band_bits) - 1)
        keys = np.empty((n_bands, len(code)), dtype=np.int64)
        for chunk in range(n_bands):
            val = (code >> np.uint64(band_bits * chunk)) & mask
            keys[chunk] = (val | np.uint64(chunk << 16)).astype(np.int64)
        bkey = keys.ravel()
        emb = batch["embedding"]
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        rep = pa.chunked_array([emb] * n_bands).combine_chunks()
        return pa.table(
            {
                "pkey": pa.array(bkey % npart, pa.int64()),
                "bkey": pa.array(bkey, pa.int64()),
                "vec_id": pa.array(
                    np.tile(batch["vec_id"].to_numpy(zero_copy_only=False), n_bands),
                    pa.int64(),
                ),
                "code": pa.array(np.tile(code.view(np.int64), n_bands), pa.int64()),
                "embedding": rep,
            }
        )

    rows = sigs.map_batches(emit, batch_format="pyarrow")

    def bucket_verify(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return empty
        bkey = g["bkey"].to_numpy()
        ids = g["vec_id"].to_numpy()
        code = g["code"].to_numpy()
        E = _normalize(np.stack(g["embedding"].to_numpy()).astype(np.float64))
        order = np.lexsort((ids, bkey))
        bkey, ids, code, E = bkey[order], ids[order], code[order], E[order]
        ai, bi, _capped = _bucket_pair_indices(bkey)
        if len(ai) == 0:
            return empty
        # hamming prefilter on the full 64-bit code, then exact cosine
        x = (code[ai].view(np.uint64)) ^ (code[bi].view(np.uint64))
        x = x - ((x >> np.uint64(1)) & np.uint64(0x5555555555555555))
        x = (x & np.uint64(0x3333333333333333)) + ((x >> np.uint64(2)) & np.uint64(0x3333333333333333))
        x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
        ham = ((x * np.uint64(0x0101010101010101)) >> np.uint64(56)).astype(np.int64)
        keep = ham <= max_hamming
        ai, bi = ai[keep], bi[keep]
        if len(ai) == 0:
            return empty
        sim = np.einsum("ij,ij->i", E[ai], E[bi])
        good = sim >= threshold
        if not good.any():
            return empty
        out = pd.DataFrame(
            {
                "a_id": np.minimum(ids[ai[good]], ids[bi[good]]),
                "b_id": np.maximum(ids[ai[good]], ids[bi[good]]),
                "sim": sim[good],
            }
        )
        return out.drop_duplicates(["a_id", "b_id"])

    out = rows.groupby("pkey").map_groups(bucket_verify, batch_format="pandas").to_pandas()
    if out.empty:
        return empty
    out = out.drop_duplicates(["a_id", "b_id"])
    out["sim"] = np.round(out["sim"], 6)
    return out.sort_values(["a_id", "b_id"]).reset_index(drop=True)
