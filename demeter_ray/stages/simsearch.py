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

import sys

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
    if len(col) == 0:
        # empty (or type-erased null) column: no rows -> (0, 0); callers
        # branch on N before touching D
        return np.empty((0, 0), dtype=np.float64)
    if not hasattr(col, "flatten"):
        # Ray's ArrowTensorArray extension (numpy-columned inputs arrive as
        # tensors, not list<float>): to_numpy gives (n, d) or object-of-rows
        arr = col.to_numpy(zero_copy_only=False)
        if arr.dtype == object:
            arr = np.stack(arr)
        return np.asarray(arr, dtype=np.float64).reshape(len(col), -1)
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    return flat.reshape(len(col), -1)


def _normalize(E: np.ndarray) -> np.ndarray:
    return E / np.linalg.norm(E, axis=1, keepdims=True)


def _assign_nearest(E: np.ndarray, C: np.ndarray) -> np.ndarray:
    """Row-wise nearest-centroid ids; total on zero rows / zero centroids
    (np.argmax on an empty axis raises)."""
    if E.shape[0] == 0 or C.shape[0] == 0:
        return np.zeros(E.shape[0], dtype=np.int64)
    return np.argmax(E @ C.T, axis=1).astype(np.int64)


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
    if len(X) == 0:
        return C
    for _ in range(iters):
        assign = _assign_nearest(X, C)
        for j in range(len(C)):
            members = X[assign == j]
            if len(members):
                C[j] = members.mean(axis=0)
        C = _normalize(C)
    return C


_IVF_SAMPLE_TARGET = 4096
_SAMPLE_MIX = np.uint64(0x9E3779B97F4A7C15)


def ivf_training_sample(
    ds: ray.data.Dataset, target: int = _IVF_SAMPLE_TARGET
) -> np.ndarray:
    """Deterministic block-order-INVARIANT training sample: keep rows whose
    mixed vec_id hash falls under ``target/n`` of the hash space (a property
    of the row, not of block layout — ``limit(n)`` takes the first blocks,
    which at 100 TB is a vanishing non-random prefix).  The surviving rows
    (~1.25x target for slack) sort by vec_id on the driver, so the k-means
    init sees an identical matrix however the corpus was partitioned."""
    n = ds.count()
    cols = ds.select_columns(["vec_id", "embedding"])
    if n > target:
        frac = min(1.0, (target * 1.25) / n)
        thresh = np.uint64(int(frac * float(2**64 - 1)))

        def filt(t: pa.Table) -> pa.Table:
            ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
            h = ids * _SAMPLE_MIX
            h ^= h >> np.uint64(29)
            h *= np.uint64(0xBF58476D1CE4E5B9)
            h ^= h >> np.uint64(32)
            return t.filter(pa.array(h <= thresh))

        cols = cols.map_batches(filt, batch_format="pyarrow")
    df = cols.to_pandas().sort_values("vec_id").reset_index(drop=True)
    tbl = pa.Table.from_pandas(df, preserve_index=False)
    return _emb_matrix(tbl)


def build_ivf_index(
    ds: ray.data.Dataset, n_lists: int = 16, train: str = "sample",
    kmeans_iters: int = 5,
) -> ray.data.Dataset:
    """One pass: append a ``bucket`` column = nearest centroid id.  The
    bucket column is the shuffle/prune key; at scale, write the dataset
    partitioned by bucket so queries read only probed lists.

    ``train="sample"`` fits the coarse quantizer on the deterministic hash
    sample (driver-side Lloyd — right up to ~millions of rows);
    ``train="kmeans"`` runs the distributed whole-corpus Lloyd
    (``distributed_kmeans`` — streaming partials, only k x dim floats per
    batch reach the driver), the 100-TB regime where any driver-side sample
    under-covers the density."""
    if train == "kmeans":
        C, _ = distributed_kmeans(ds, k=n_lists, iters=kmeans_iters)
    else:
        C = train_ivf_centroids(ivf_training_sample(ds), n_lists)
    ref = ray.put(C)

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(ref)
        E = _normalize(_emb_matrix(batch))
        bucket = _assign_nearest(E, c)
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


def _lsh_banding_params(n: int, threshold: float, target_recall: float = 0.98,
                        target_bucket: int = 64, max_bands: int = 96):
    """Size (band_bits r, n_bands b) from the corpus and the cosine
    threshold (the classic banding tradeoff — selectivity ~ 2^r per band,
    recall = 1-(1-p^r)^b with p = 1 - acos(t)/pi the per-bit agreement
    probability at the threshold angle).

    - r keeps the EXPECTED bucket size (~n/2^r for random vectors) at or
      under ``target_bucket`` so buckets stay below BUCKET_CAP at any
      corpus size instead of silently degrading to chains;
    - b is then solved for ``target_recall`` at the threshold and capped.
    Hyperplane count = r*b (the signature widens with the corpus — a
    64-bit code can't hold selective bands AND enough bands for recall)."""
    import math

    r = max(4, min(16, math.ceil(math.log2(max(2.0, n / target_bucket)))))
    p = 1.0 - math.acos(min(1.0, max(-1.0, threshold))) / math.pi
    p_band = max(1e-9, p ** r)
    if p_band >= 1.0 - 1e-12:
        b = 1
    else:
        b = math.ceil(math.log(1.0 - target_recall) / math.log(1.0 - p_band))
    return r, int(min(max_bands, max(4, b)))


def lsh_cosine_neardup(
    ds: ray.data.Dataset,
    threshold: float = 0.4,
    seed: int = 9,
    max_hamming: int | None = None,
    band_bits: int | None = None,
    n_bands: int | None = None,
) -> pd.DataFrame:
    """Embedding-cosine near-dup, DISTRIBUTED (the scale path of the exact
    O(N^2) oracle query): random-hyperplane band signatures (sign of E @ R),
    banding sized from the corpus (``_lsh_banding_params``), ``groupby(pkey)``
    shuffle of SLIM band rows, and in-bucket EXACT cosine verification — so
    precision is exact and only recall depends on the LSH banding.

    Shuffle layout mirrors the MinHash funnel (dedup._make_band_emitter):
    band rows ship slim (pkey, bkey, vec_id, code64) and each vector's
    embedding ships ONCE per DISTINCT partition it touches (<= min(b, npart)
    copies instead of b copies) — the payload bytes through the shuffle are
    bounded by npart x corpus, not bands x corpus.  A 64-bit prefilter code
    (first 64 hyperplanes) rides the slim rows for a cheap Hamming gate
    before the exact cosine.  Capped buckets are logged, never silent.
    Driver only materializes verified pairs."""
    from demeter_ray.stages.dedup import _bucket_pair_indices, _n_partitions
    import math

    if max_hamming is None:
        # expected Hamming at the threshold angle + slack (prefilter only —
        # the exact cosine verify below decides membership)
        max_hamming = int(64 * math.acos(threshold) / math.pi + 0.5) + 8

    empty = pd.DataFrame(
        {"a_id": pd.Series(dtype="int64"), "b_id": pd.Series(dtype="int64"),
         "sim": pd.Series(dtype="float64")}
    )
    n = ds.count()  # metadata read on parquet inputs
    if n < 2:
        return empty
    auto_r, auto_b = _lsh_banding_params(n, threshold)
    r = band_bits if band_bits is not None else auto_r
    b = n_bands if n_bands is not None else auto_b
    total_bits = r * b
    npart = _n_partitions(n * b)

    def emit(batch: pa.Table) -> pa.Table:
        E = _normalize(_emb_matrix(batch))
        nd = len(E)
        rng = np.random.RandomState(seed)
        Rm = rng.standard_normal((E.shape[1], max(total_bits, 64)))
        bits = (E @ Rm) > 0
        # 64-bit prefilter code from the first 64 hyperplanes
        code = np.zeros(nd, dtype=np.uint64)
        for k in range(64):
            code |= bits[:, k].astype(np.uint64) << np.uint64(k)
        # band keys: pack each band's r bits, salt with the band index
        weights = (np.uint64(1) << np.arange(r, dtype=np.uint64)).astype(np.uint64)
        vals = bits[:, :total_bits].reshape(nd, b, r).astype(np.uint64) @ weights
        bkey = (vals.T | (np.arange(b, dtype=np.uint64)[:, None] << np.uint64(32))
                ).astype(np.int64).ravel()  # (b, nd) row-major
        pkey = (bkey.view(np.uint64) % np.uint64(npart)).astype(np.int64)
        ids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        code_i64 = code.view(np.int64)
        # distinct (vec, pkey) pairs -> payload rows carrying the embedding
        doc_rep = np.tile(np.arange(nd, dtype=np.int64), b)
        packed = doc_rep * np.int64(npart) + pkey
        uniq = np.unique(packed)
        sdoc = (uniq // npart).astype(np.int64)
        spkey = (uniq % npart).astype(np.int64)
        emb = batch["embedding"]
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        n_band = b * nd
        band_tbl = pa.table(
            {
                "pkey": pa.array(pkey, pa.int64()),
                "bkey": pa.array(bkey, pa.int64()),
                "vec_id": pa.array(ids[doc_rep], pa.int64()),
                "code": pa.array(code_i64[doc_rep], pa.int64()),
                "embedding": pa.nulls(n_band, type=emb.type),
            }
        )
        sig_tbl = pa.table(
            {
                "pkey": pa.array(spkey, pa.int64()),
                "bkey": pa.array(np.full(len(uniq), -1, dtype=np.int64), pa.int64()),
                "vec_id": pa.array(ids[sdoc], pa.int64()),
                "code": pa.array(code_i64[sdoc], pa.int64()),
                "embedding": emb.take(pa.array(sdoc)),
            }
        )
        return pa.concat_tables([band_tbl, sig_tbl]).combine_chunks()

    rows = ds.map_batches(emit, batch_format="pyarrow", batch_size=2048)

    def bucket_verify(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return empty
        # split the stream: bkey == -1 rows carry this partition's
        # embeddings (one per vec), the rest are slim bucket memberships
        is_sig = g["bkey"].to_numpy() == -1
        sig_rows = g[is_sig]
        sig_ids = sig_rows["vec_id"].to_numpy()
        sig_order = np.argsort(sig_ids, kind="mergesort")
        sig_ids = sig_ids[sig_order]
        E_all = _normalize(
            np.stack(sig_rows["embedding"].to_numpy()[sig_order]).astype(np.float64)
        )
        band = g[~is_sig]
        if len(band) < 2:
            return empty
        bkey = band["bkey"].to_numpy()
        ids = band["vec_id"].to_numpy()
        code = band["code"].to_numpy()
        order = np.lexsort((ids, bkey))
        bkey, ids, code = bkey[order], ids[order], code[order]
        emb_idx = np.searchsorted(sig_ids, ids)
        if len(sig_ids) == 0 or emb_idx.max(initial=-1) >= len(sig_ids) or not np.array_equal(
            sig_ids[np.minimum(emb_idx, len(sig_ids) - 1)], ids
        ):
            raise ValueError(
                "lsh_cosine_neardup: band row vec_id missing its embedding "
                "payload row in this partition (emitter invariant violated)"
            )
        ai, bi, capped = _bucket_pair_indices(bkey)
        if capped:
            print(
                f"[lsh_cosine_neardup] {capped} LSH buckets exceeded cap; "
                f"pair emission degraded to chains there",
                file=sys.stderr,
            )
        if len(ai) == 0:
            return empty
        # near-dup pairs share many bands: dedupe (a, b) at the id level
        # BEFORE the hamming/cosine work (same move as the MinHash funnel)
        pair_a = np.minimum(ids[ai], ids[bi])
        pair_b = np.maximum(ids[ai], ids[bi])
        uniq = np.unique(np.stack([pair_a, pair_b], axis=1), axis=0)
        ca = np.searchsorted(sig_ids, uniq[:, 0])
        cb = np.searchsorted(sig_ids, uniq[:, 1])
        code_sig = sig_rows["code"].to_numpy()[sig_order]
        # hamming prefilter on the 64-bit code, then exact cosine
        x = (code_sig[ca].view(np.uint64)) ^ (code_sig[cb].view(np.uint64))
        x = x - ((x >> np.uint64(1)) & np.uint64(0x5555555555555555))
        x = (x & np.uint64(0x3333333333333333)) + ((x >> np.uint64(2)) & np.uint64(0x3333333333333333))
        x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
        ham = ((x * np.uint64(0x0101010101010101)) >> np.uint64(56)).astype(np.int64)
        keep = ham <= max_hamming
        uniq, ca, cb = uniq[keep], ca[keep], cb[keep]
        if len(uniq) == 0:
            return empty
        sim = np.einsum("ij,ij->i", E_all[ca], E_all[cb])
        good = sim >= threshold
        if not good.any():
            return empty
        return pd.DataFrame(
            {
                "a_id": uniq[good, 0],
                "b_id": uniq[good, 1],
                "sim": sim[good],
            }
        )

    out = rows.groupby("pkey").map_groups(bucket_verify, batch_format="pandas").to_pandas()
    if out.empty:
        return empty
    out = out.drop_duplicates(["a_id", "b_id"])
    out["sim"] = np.round(out["sim"], 6)
    return out.sort_values(["a_id", "b_id"]).reset_index(drop=True)


def distributed_kmeans(ds: ray.data.Dataset, k: int = 8, iters: int = 10,
                       seed: int = 42):
    """Lloyd k-means over the WHOLE dataset (cosine geometry: unit-sphere
    vectors, dot-product assignment — consistent with train_ivf_centroids,
    which fits on a driver-side sample only).

    Each iteration is one streaming pass: per-batch partials of
    (cluster, count, vector-sum); the driver reduction sorts partials by
    (cluster, min vec_id in batch) before summing, so centroids are
    bit-identical regardless of block arrival order.  Only k x dim floats
    per batch cross to the driver — corpus rows never do.

    Returns (centroids (k, dim), assignments Dataset of (vec_id, cluster)).
    """
    # init from the block-order-invariant hash sample (limit() would seed
    # from the first blocks — a non-random prefix at scale)
    sample = ivf_training_sample(ds, target=2048)
    rng = np.random.RandomState(seed)
    X0 = _normalize(np.asarray(sample, dtype=np.float64))
    C = X0[rng.choice(len(X0), size=min(k, len(X0)), replace=False)]

    for _ in range(iters):
        ref = ray.put(C)

        def partial(batch: pa.Table) -> pa.Table:
            c = ray.get(ref)
            E = _normalize(_emb_matrix(batch))
            ids = batch["vec_id"].to_numpy(zero_copy_only=False)
            assign = _assign_nearest(E, c)
            rows = []
            for j in np.unique(assign):
                m = assign == j
                rows.append((int(j), int(m.sum()), int(ids[m].min()),
                             E[m].sum(axis=0).tolist()))
            return pa.table({
                "cluster": pa.array([r[0] for r in rows], pa.int64()),
                "n": pa.array([r[1] for r in rows], pa.int64()),
                "tie": pa.array([r[2] for r in rows], pa.int64()),
                "vsum": pa.array([r[3] for r in rows],
                                 pa.list_(pa.float64())),
            })

        parts = (ds.map_batches(partial, batch_format="pyarrow")
                 .to_pandas().sort_values(["cluster", "tie"]))
        newC = C.copy()
        for j, g in parts.groupby("cluster"):
            vec = np.zeros(C.shape[1])
            for v in g["vsum"]:          # fixed (cluster, tie) order
                vec += np.asarray(v)
            if g["n"].sum():
                newC[int(j)] = vec / g["n"].sum()
        C = _normalize(newC)

    ref = ray.put(C)

    def assign_final(batch: pa.Table) -> pa.Table:
        c = ray.get(ref)
        E = _normalize(_emb_matrix(batch))
        return pa.table({
            "vec_id": batch["vec_id"],
            "cluster": pa.array(_assign_nearest(E, c), pa.int64()),
        })

    return C, ds.map_batches(assign_final, batch_format="pyarrow")
