"""Deduplication stages: exact, MinHash+LSH, SimHash, n-gram Jaccard.

The large-scale shapes (ray_guide 'Aggregation at scale' / 'Near-dup'):

- exact dedup: content key -> ``groupby(key).map_groups(first)`` —
  hash-partition + per-group first (used by exact_dedup_docs).
- near-dup: per-batch vectorized signatures in an ACTOR POOL (token-hash
  cache built once per actor) -> explode to (band_id, band_key, doc_id) rows
  -> ``groupby`` on the band bucket -> candidate pairs -> exact-Jaccard
  verify.  Only signatures and candidate pairs ever shuffle; documents don't.

Scale note: the verify step here broadcasts the doc->token-set map because
the driver tables are small; at 100 TB the verify joins candidate pairs back
to the documents by hash-partitioned doc_id (two-sided shuffle join on a key
that is already the partition key), and connected components run as a few
rounds of min-label propagation (groupby) instead of driver-side union-find.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from demeter_ray.functions import hashing
from demeter_ray.functions.text import char_ngrams


def _token_sets_wordlevel(texts):
    return [set(t.split()) for t in texts]


def _token_sets_ngram(texts, n: int):
    return [char_ngrams(t, n) for t in texts]


class SignatureActor:
    """doc -> LSH band rows.  TokenHasher cache lives per actor."""

    def __init__(self, num_perm: int, bands: int, mode: str = "word", n: int = 3):
        self.hasher = hashing.TokenHasher()
        self.num_perm = num_perm
        self.bands = bands
        self.mode = mode
        self.n = n

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        texts = batch["text"].to_pylist()
        sets = (
            _token_sets_wordlevel(texts)
            if self.mode == "word"
            else _token_sets_ngram(texts, self.n)
        )
        out_doc, out_band, out_key = [], [], []
        for did, tokset in zip(ids, sets):
            th = self.hasher.hash_tokens(sorted(tokset))
            sig = hashing.minhash_signature(th, self.num_perm)
            for band_id, key in enumerate(hashing.minhash_bands(sig, self.bands)):
                out_doc.append(int(did))
                out_band.append(band_id)
                out_key.append(key)
        return pa.table(
            {
                "doc_id": pa.array(out_doc, pa.int64()),
                "band_id": pa.array(out_band, pa.int64()),
                "band_key": pa.array(out_key, pa.int64()),
            }
        )


def _candidate_pairs(ds_docs: ray.data.Dataset, num_perm: int, bands: int,
                     mode: str, n: int) -> pd.DataFrame:
    band_rows = ds_docs.map_batches(
        SignatureActor,
        fn_constructor_args=(num_perm, bands, mode, n),
        batch_format="pyarrow",
        batch_size=1024,
        concurrency=(1, 4),
    )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g["doc_id"].unique())
        if len(ids) < 2:
            return pd.DataFrame({"a_id": pd.Series(dtype="int64"),
                                 "b_id": pd.Series(dtype="int64")})
        a, b = np.triu_indices(len(ids), 1)
        return pd.DataFrame({"a_id": ids[a], "b_id": ids[b]})

    pairs = (
        band_rows.groupby(["band_id", "band_key"])
        .map_groups(bucket_pairs, batch_format="pandas")
        .to_pandas()
    )
    return pairs.drop_duplicates(ignore_index=True)


def minhash_neardup(
    ds_docs: ray.data.Dataset,
    num_perm: int = 128,
    bands: int = 32,
    jaccard_threshold: float = 0.5,
    mode: str = "word",
    n: int = 3,
) -> pd.DataFrame:
    """MinHash-LSH candidates verified by exact Jaccard.
    Returns (a_id, b_id, jaccard rounded to 4) sorted."""
    docs = ds_docs.to_pandas()
    pairs = _candidate_pairs(ds_docs, num_perm, bands, mode, n)
    if pairs.empty:
        return pd.DataFrame(
            {"a_id": pd.Series(dtype="int64"), "b_id": pd.Series(dtype="int64"),
             "jaccard": pd.Series(dtype="float64")}
        )
    texts = dict(zip(docs["doc_id"].tolist(), docs["text"].tolist()))
    sets = {
        did: (set(t.split()) if mode == "word" else char_ngrams(t, n))
        for did, t in texts.items()
    }
    jac = np.empty(len(pairs), dtype=np.float64)
    for i, (a, b) in enumerate(zip(pairs["a_id"], pairs["b_id"])):
        sa, sb = sets[int(a)], sets[int(b)]
        inter = len(sa & sb)
        jac[i] = inter / (len(sa) + len(sb) - inter) if (sa or sb) else 1.0
    pairs = pairs.assign(jaccard=np.round(jac, 4))
    out = pairs[pairs["jaccard"] >= jaccard_threshold]
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
    """SimHash near-dup: bucket by the 4 16-bit chunks (a pair within
    Hamming<=6 shares at least one exact chunk when distance <= 3*chunks-?);
    classic Charikar chunking prefilter, exact Hamming verify."""
    hashed = simhash_column(ds_docs).to_pandas()
    ids = hashed["doc_id"].to_numpy(dtype=np.int64)
    sh = hashed["simhash"].to_numpy(dtype=np.int64)
    # bucket on each of 4 16-bit chunks
    cand = set()
    for chunk in range(4):
        keys = (sh.astype(np.uint64) >> np.uint64(16 * chunk)) & np.uint64(0xFFFF)
        df = pd.DataFrame({"k": keys, "i": np.arange(len(ids))})
        for _, g in df.groupby("k"):
            idx = g["i"].to_numpy()
            if len(idx) < 2:
                continue
            a, b = np.triu_indices(len(idx), 1)
            for x, y in zip(idx[a], idx[b]):
                cand.add((int(min(ids[x], ids[y])), int(max(ids[x], ids[y])),
                          int(x), int(y)))
    rows = []
    for a_id, b_id, x, y in sorted(cand):
        d = int(hashing.hamming64(np.array([sh[x]]), int(sh[y]))[0])
        if d <= max_hamming:
            rows.append((a_id, b_id, d))
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
