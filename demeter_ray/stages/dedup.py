"""Deduplication stages: exact, MinHash+LSH, SimHash, n-gram Jaccard.

The large-scale shapes (ray_guide 'Aggregation at scale' / 'Near-dup'):

- exact dedup: content key -> ``groupby(key).map_groups(first)`` —
  hash-partition + per-group first (used by exact_dedup_docs).
- near-dup: per-batch vectorized MinHash signatures in an ACTOR POOL
  (token-hash cache built once per actor) -> LSH band buckets -> candidate
  pairs (bucket size CAPPED — a degenerate all-similar corpus otherwise
  yields O(n^2) candidates) -> vectorized signature-estimate prefilter ->
  exact-Jaccard verify on the survivors only.  Only signatures and candidate
  pairs ever move; documents don't.

Scale note: signatures are the distributed stage; the candidate funnel here
runs driver-side because the post-cap candidate set is small.  At 100 TB the
band rows go through ``groupby(band_key)`` (shuffle on the bucket key), the
estimate prefilter runs inside the bucket task with the bucket's own
signatures, and verification joins pairs back to hash-partitioned documents;
connected components = a few rounds of min-label propagation via groupby.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from demeter_ray.functions import hashing
from demeter_ray.functions.text import char_ngrams

BUCKET_CAP = 256  # max docs per LSH bucket before pair emission degrades to a chain


def _popcount(x: np.ndarray) -> np.ndarray:
    x = x - ((x >> np.uint64(1)) & np.uint64(0x5555555555555555))
    x = (x & np.uint64(0x3333333333333333)) + ((x >> np.uint64(2)) & np.uint64(0x3333333333333333))
    x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    return ((x * np.uint64(0x0101010101010101)) >> np.uint64(56)).astype(np.int64)


def _token_sets(texts, mode: str, n: int):
    if mode == "word":
        return [set(t.split()) for t in texts]
    return [char_ngrams(t, n) for t in texts]


class SignatureActor:
    """doc -> (doc_id, minhash signature, sorted token hashes).  The
    TokenHasher cache lives per actor; output is one row per doc with
    fixed-width signature + variable token-hash list."""

    def __init__(self, num_perm: int, mode: str = "word", n: int = 3):
        self.hasher = hashing.TokenHasher()
        self.num_perm = num_perm
        self.mode = mode
        self.n = n

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        texts = batch["text"].to_pylist()
        sets = _token_sets(texts, self.mode, self.n)
        sigs = np.empty((len(ids), self.num_perm), dtype=np.int64)
        tokens = []
        for i, tokset in enumerate(sets):
            th = np.sort(self.hasher.hash_tokens(sorted(tokset)))
            tokens.append(th.astype(np.int64))
            sigs[i] = hashing.minhash_signature(th.astype(np.uint64), self.num_perm).astype(
                np.int64
            )
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "sig": pa.array(list(sigs), pa.list_(pa.int64(), self.num_perm)),
                "tokens": pa.array([t.tolist() for t in tokens], pa.list_(pa.int64())),
            }
        )


def compute_signatures(
    ds_docs: ray.data.Dataset, num_perm: int, mode: str, n: int
):
    """Distributed signature stage -> (ids, sig matrix, token arrays)."""
    out = ds_docs.map_batches(
        SignatureActor,
        fn_constructor_args=(num_perm, mode, n),
        batch_format="pyarrow",
        batch_size=1024,
        concurrency=(1, 8),
    ).to_pandas()
    ids = out["doc_id"].to_numpy(dtype=np.int64)
    sigs = np.stack(out["sig"].to_numpy())
    tokens = [np.asarray(t, dtype=np.int64) for t in out["tokens"]]
    return ids, sigs, tokens


def _band_buckets(ids: np.ndarray, sigs: np.ndarray, bands: int):
    """LSH banding over the signature matrix -> {(band, key): doc indices}."""
    n, num_perm = sigs.shape
    rows = num_perm // bands
    buckets: dict[tuple[int, int], list[int]] = {}
    for b in range(bands):
        chunk = np.ascontiguousarray(sigs[:, b * rows : (b + 1) * rows])
        view = chunk.view([("", chunk.dtype)] * rows).ravel()
        _, inverse = np.unique(view, return_inverse=True)
        order = np.argsort(inverse, kind="stable")
        sorted_inv = inverse[order]
        starts = np.flatnonzero(np.r_[True, sorted_inv[1:] != sorted_inv[:-1]])
        ends = np.r_[starts[1:], n]
        for s, e in zip(starts, ends):
            if e - s > 1:
                buckets[(b, int(sorted_inv[s]))] = order[s:e]
    return buckets


def _candidate_pairs_capped(buckets, n_docs: int):
    """All pairs per bucket up to BUCKET_CAP; oversized buckets emit a
    sorted chain (keeps transitive connectivity) and are counted so the
    truncation is visible, never silent.  Pairs dedup via packed int64 keys
    + np.unique (python tuple sets measured ~10x slower at 1M pairs)."""
    chunks = []
    capped = 0
    for (_b, _k), idx in buckets.items():
        idx = np.sort(idx)
        if len(idx) > BUCKET_CAP:
            capped += 1
            chunks.append(idx[:-1].astype(np.int64) * n_docs + idx[1:])
            continue
        a, b = np.triu_indices(len(idx), 1)
        chunks.append(idx[a].astype(np.int64) * n_docs + idx[b])
    if not chunks:
        return np.empty((0, 2), dtype=np.int64), capped
    packed = np.unique(np.concatenate(chunks))
    return np.stack([packed // n_docs, packed % n_docs], axis=1), capped


def minhash_neardup(
    ds_docs: ray.data.Dataset,
    num_perm: int = 128,
    bands: int = 32,
    jaccard_threshold: float = 0.5,
    mode: str = "word",
    n: int = 3,
) -> pd.DataFrame:
    """MinHash-LSH candidates -> signature-estimate prefilter -> exact
    Jaccard verify.  Returns (a_id, b_id, jaccard rounded to 4) sorted."""
    ids, sigs, tokens = compute_signatures(ds_docs, num_perm, mode, n)
    buckets = _band_buckets(ids, sigs, bands)
    pair_arr, capped = _candidate_pairs_capped(buckets, len(ids))
    if capped:
        print(
            f"[minhash_neardup] {capped} LSH buckets exceeded cap {BUCKET_CAP}; "
            "pair emission degraded to chains there (degenerate-similarity corpus)"
        )
    empty = pd.DataFrame(
        {"a_id": pd.Series(dtype="int64"), "b_id": pd.Series(dtype="int64"),
         "jaccard": pd.Series(dtype="float64")}
    )
    if len(pair_arr) == 0:
        return empty
    # vectorized estimate, chunked to bound the (chunk, num_perm) gather
    thr = max(0.0, jaccard_threshold - 0.15)
    kept = []
    for s0 in range(0, len(pair_arr), 200_000):
        chunk = pair_arr[s0 : s0 + 200_000]
        est = (sigs[chunk[:, 0]] == sigs[chunk[:, 1]]).mean(axis=1)
        kept.append(chunk[est >= thr])
    pair_arr = np.concatenate(kept)
    if len(pair_arr) == 0:
        return empty
    # exact verify, fully vectorized when the corpus vocabulary is small:
    # docs become fixed-width bitsets over the global token vocabulary and
    # Jaccard = popcount(AND)/popcount(OR) in one array op per word
    vocab = np.unique(np.concatenate(tokens)) if tokens else np.array([], np.int64)
    if 0 < len(vocab) <= 4096:
        nwords = (len(vocab) + 63) // 64
        bits = np.zeros((len(tokens), nwords), dtype=np.uint64)
        for i, t in enumerate(tokens):
            pos = np.searchsorted(vocab, t)
            # duplicate word indices need ufunc.at — fancy-index |= applies
            # only one bit per repeated index
            np.bitwise_or.at(
                bits[i], pos // 64, np.uint64(1) << (pos % 64).astype(np.uint64)
            )
        A, B = bits[pair_arr[:, 0]], bits[pair_arr[:, 1]]
        inter = _popcount(A & B).sum(axis=1)
        union = _popcount(A | B).sum(axis=1)
        jac = np.round(np.where(union > 0, inter / np.maximum(union, 1), 1.0), 4)
    else:  # open vocabulary: per-pair sorted intersection on the survivors
        jac = np.empty(len(pair_arr), dtype=np.float64)
        for k, (x, y) in enumerate(pair_arr):
            ta, tb = tokens[x], tokens[y]
            inter = len(np.intersect1d(ta, tb, assume_unique=True))
            union = len(ta) + len(tb) - inter
            jac[k] = round(inter / union if union else 1.0, 4)
    good = jac >= jaccard_threshold
    if not good.any():
        return empty
    a = np.minimum(ids[pair_arr[good, 0]], ids[pair_arr[good, 1]])
    b = np.maximum(ids[pair_arr[good, 0]], ids[pair_arr[good, 1]])
    out = pd.DataFrame({"a_id": a, "b_id": b, "jaccard": jac[good]})
    return out.sort_values(["a_id", "b_id"]).reset_index(drop=True)


def ngram_jaccard_neardup(ds_docs: ray.data.Dataset, n: int = 3,
                          threshold: float = 0.6) -> pd.DataFrame:
    return minhash_neardup(
        ds_docs, num_perm=128, bands=32, jaccard_threshold=threshold,
        mode="ngram", n=n,
    )


class SimhashActor:
    def __init__(self):
        self.hasher = hashing.TokenHasher()

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        out = np.empty(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            th = self.hasher.hash_tokens(t.split())
            out[i] = hashing.simhash64(th)
        return pa.table(
            {"doc_id": batch["doc_id"], "simhash": pa.array(out, pa.int64())}
        )


def simhash_column(ds_docs: ray.data.Dataset) -> ray.data.Dataset:
    return ds_docs.map_batches(
        SimhashActor, batch_format="pyarrow", batch_size=1024, concurrency=(1, 4)
    )


def simhash_neardup(ds_docs: ray.data.Dataset, max_hamming: int = 6) -> pd.DataFrame:
    """SimHash near-dup: bucket by the 4 16-bit chunks (Charikar chunking —
    any pair within Hamming<=3 shares an exact chunk; wider radii get best-
    effort recall), exact Hamming verify, capped buckets."""
    hashed = simhash_column(ds_docs).to_pandas()
    ids = hashed["doc_id"].to_numpy(dtype=np.int64)
    sh = hashed["simhash"].to_numpy(dtype=np.int64)
    cand = set()
    capped = 0
    for chunk in range(4):
        keys = (sh.astype(np.uint64) >> np.uint64(16 * chunk)) & np.uint64(0xFFFF)
        df = pd.DataFrame({"k": keys, "i": np.arange(len(ids))})
        for _, g in df.groupby("k"):
            idx = np.sort(g["i"].to_numpy())
            if len(idx) < 2:
                continue
            if len(idx) > BUCKET_CAP:
                capped += 1
                for x, y in zip(idx[:-1], idx[1:]):
                    cand.add((int(x), int(y)))
                continue
            a, b = np.triu_indices(len(idx), 1)
            for x, y in zip(idx[a], idx[b]):
                cand.add((int(x), int(y)))
    if capped:
        print(f"[simhash_neardup] {capped} buckets exceeded cap {BUCKET_CAP}")
    rows = []
    for x, y in sorted(cand):
        d = int(hashing.hamming64(np.array([sh[x]]), int(sh[y]))[0])
        if d <= max_hamming:
            a, b = ids[x], ids[y]
            rows.append((min(a, b), max(a, b), d))
    if not rows:
        return pd.DataFrame({"a_id": pd.Series(dtype="int64"),
                             "b_id": pd.Series(dtype="int64"),
                             "hamming": pd.Series(dtype="int64")})
    out = pd.DataFrame(rows, columns=["a_id", "b_id", "hamming"])
    return out.sort_values(["a_id", "b_id"]).reset_index(drop=True)


def exact_dedup(ds: ray.data.Dataset, key_col: str, id_col: str) -> ray.data.Dataset:
    """Generic exact dedup: keep the min-id row per key (deterministic
    'first')."""

    def first(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(id_col).head(1)

    return ds.groupby(key_col).map_groups(first, batch_format="pandas")
