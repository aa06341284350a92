"""Deduplication stages: exact, MinHash+LSH, SimHash, n-gram Jaccard.

The large-scale shapes (ray_guide 'Aggregation at scale' / 'Near-dup'):

- exact dedup: content key -> ``groupby(key).map_groups(first)`` —
  hash-partition + per-group first (used by exact_dedup_docs).
- near-dup: per-batch vectorized MinHash signatures in a fixed-size ACTOR
  POOL (token-hash cache built once per actor) -> band rows (partition key,
  bucket key, doc_id, signature) -> ``groupby(partition_key)`` SHUFFLE ->
  partition-local vectorized bucketing + capped pair emission (a degenerate
  all-similar corpus otherwise yields O(n^2) candidates) + signature-estimate
  prefilter INSIDE the partition task -> exact-Jaccard verify on the
  candidate docs only.  Only signatures and candidate pairs ever move;
  documents don't, and the driver never materializes the corpus.

Partitioning: the shuffle key is ``bucket_key % n_partitions`` rather than
the raw bucket key — one Ray group per hash partition (each holding many LSH
buckets, resolved vectorized inside the task) instead of one Python callable
per bucket.  ``n_partitions`` is sized from the corpus row count
(~``_ROWS_PER_PARTITION`` band rows each), so partitions stay worker-heap
sized at any corpus scale; the driver only ever holds candidate pairs and
the candidate docs' token sets, both bounded by the capped candidate funnel
(output-sized, not corpus-sized).
"""

from __future__ import annotations

import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from demeter_ray.functions import hashing
from demeter_ray.functions.text import char_ngrams

BUCKET_CAP = 256  # legacy membership cap (still the SimHash chunk-bucket bound)
# Pair-emission budget per LSH bucket: the principled bound is OUTPUT
# VOLUME, not membership.  Buckets under the budget emit every pair (the
# pair list is oracle-complete up to this knob); beyond it they degrade to
# a connectivity-preserving chain — the semantics dedup CLUSTERING needs
# (components stay exact) without the bands-fold candidate amplification a
# dup-dense corpus otherwise pays (sf0.1: a ~0.9-similarity blob owns ~1M
# pairs that collide in ~21 of 32 bands -> ~49M candidate rows, measured
# 650 s; with max_bucket_pairs=4M the run reproduced the oracle's 964,854
# pairs exactly — pass a larger budget when the full pair list is the
# deliverable and the corpus density warrants the cost).  The default
# keeps buckets to ~280 members full-emitting (the sf0.01 driver gate's
# densest bucket fits) and chains anything larger.
MAX_BUCKET_PAIRS = 40_000
_ROWS_PER_PARTITION = 65536  # target band rows per shuffle partition (heap-sized)
_FNV_PRIME = np.uint64(0x100000001B3)
_FNV_BASIS = np.uint64(0xCBF29CE484222325)
_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def _popcount(x: np.ndarray) -> np.ndarray:
    x = x - ((x >> np.uint64(1)) & np.uint64(0x5555555555555555))
    x = (x & np.uint64(0x3333333333333333)) + ((x >> np.uint64(2)) & np.uint64(0x3333333333333333))
    x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    return ((x * np.uint64(0x0101010101010101)) >> np.uint64(56)).astype(np.int64)


def _dedup_rows_ds(
    ds: ray.data.Dataset, cols: list[str], n_parts: int
) -> ray.data.Dataset:
    """Distributed exact row-dedup over int64 ``cols``.

    Single-key hash partition + vectorized in-partition lexsort dedup —
    NOT ``groupby(cols).count()``: Ray's sort-based aggregate on a
    multi-column key compares Python tuples in the reduce tasks, which
    pinned single cores for >10 min on sf0.1's ~10M-row candidate stream
    (round-4 bench hang); the single-int64-key sort is the engine's
    well-trodden path.  Equal rows share a hash, so per-partition dedup is
    globally exact.  Output carries exactly ``cols``."""

    def add_key(t: pa.Table) -> pa.Table:
        acc = np.full(len(t), _FNV_BASIS, dtype=np.uint64)
        for c in cols:
            v = t[c].to_numpy(zero_copy_only=False).astype(np.uint64)
            acc = (acc ^ v) * _FNV_PRIME
        key = ((acc ^ _GOLDEN) % np.uint64(n_parts)).astype(np.int64)
        return t.select(cols).append_column("__dkey", pa.array(key, pa.int64()))

    def uniq(t: pa.Table) -> pa.Table:
        arrs = [t[c].to_numpy(zero_copy_only=False) for c in cols]
        order = np.lexsort(arrs[::-1])
        arrs = [a[order] for a in arrs]
        keep = np.ones(len(order), dtype=bool)
        if len(order) > 1:
            neq = np.zeros(len(order) - 1, dtype=bool)
            for a in arrs:
                neq |= a[1:] != a[:-1]
            keep[1:] = neq
        return pa.table(
            {c: pa.array(a[keep], pa.int64()) for c, a in zip(cols, arrs)}
        )

    return (
        ds.map_batches(add_key, batch_format="pyarrow")
        .groupby("__dkey")
        .map_groups(uniq, batch_format="pyarrow")
    )


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


def signatures_dataset(
    ds_docs: ray.data.Dataset, num_perm: int, mode: str, n: int
) -> ray.data.Dataset:
    """Distributed signature stage -> Dataset of (doc_id, sig, tokens).

    Plain task pool, not an actor pool: the per-batch token-hash cache is
    cheap to rebuild, and stateless tasks can't deadlock against the other
    pools a near-dup pipeline runs back-to-back (BASELINE.md ledger: actor
    pools add ramp-up seconds and fixed pools starve each other on small
    CPU budgets)."""
    worker = SignatureActor(num_perm, mode, n)
    return ds_docs.map_batches(worker, batch_format="pyarrow", batch_size=1024)


def _fixed_list_matrix(col, width: int) -> np.ndarray:
    """Arrow FixedSizeList column -> (n, width) numpy matrix, no per-row
    Python objects."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col.flatten().to_numpy(zero_copy_only=False).reshape(-1, width)


def _n_partitions(n_rows: int) -> int:
    """Shuffle partition count sized so each partition stays heap-sized.
    Floor 32: the in-partition bucket/verify work is the near-dup funnel's
    hot loop, and fewer groups than cores leaves CPUs idle (measured 11.7s
    -> ~4s at sf0.1 raising 8 -> 32; partitions stay cheap far below the
    65k-row heap target)."""
    return int(max(32, min(512, n_rows // _ROWS_PER_PARTITION + 1)))


def _mix_columns(cols: np.ndarray, salt: int) -> np.ndarray:
    """Deterministic vectorized 64-bit hash of each row of ``cols`` (FNV-1a
    over the row's uint64 values, salted).  Wrapping uint64 arithmetic —
    collisions only merge LSH buckets, which the exact verify absorbs."""
    salted = (salt * int(_GOLDEN)) & 0xFFFFFFFFFFFFFFFF
    acc = np.full(len(cols), _FNV_BASIS ^ np.uint64(salted), dtype=np.uint64)
    for j in range(cols.shape[1]):
        acc = (acc ^ cols[:, j].astype(np.uint64)) * _FNV_PRIME
    return acc


def _make_band_emitter(num_perm: int, bands: int, n_partitions: int):
    """map_batches fn emitting two row kinds into the shuffle stream:

    - one slim (pkey, bkey, doc_id, sig=null) row per doc per band — the
      bucket membership;
    - one (pkey, bkey=-1, doc_id, sig) row per DISTINCT (doc, partition)
      pair — the signature payload the partition task needs for the
      estimate prefilter.

    A doc hits at most min(bands, n_partitions) distinct partitions, so the
    signature ships ~bands/n_partitions-fold less than attaching it to every
    band row (4x at 32 bands / 8 partitions) — the shuffle volume is the
    dominant cost of this operator at scale."""
    rows = num_perm // bands

    def emit(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        sig = _fixed_list_matrix(batch["sig"], num_perm)
        nd = len(ids)
        bkeys = np.empty((bands, nd), dtype=np.uint64)
        for b in range(bands):
            bkeys[b] = _mix_columns(sig[:, b * rows : (b + 1) * rows], b)
        bkey = bkeys.ravel()
        pkey = (bkey % np.uint64(n_partitions)).astype(np.int64)
        # distinct (doc, pkey) pairs -> signature rows
        doc_rep = np.tile(np.arange(nd, dtype=np.int64), bands)
        packed = doc_rep * np.int64(n_partitions) + pkey
        uniq = np.unique(packed)
        sdoc = uniq // n_partitions
        spkey = uniq % n_partitions
        n_band = bands * nd
        n_sig = len(uniq)
        sig_col = np.zeros((n_band + n_sig, num_perm), dtype=np.int64)
        sig_col[n_band:] = sig[sdoc]
        validity = np.r_[np.zeros(n_band, dtype=bool), np.ones(n_sig, dtype=bool)]
        sig_arr = pa.FixedSizeListArray.from_arrays(
            pa.array(sig_col.ravel(), pa.int64()), num_perm
        )
        # null out the band rows' sig entries (mask = True where NULL)
        sig_arr = pa.Array.from_buffers(
            sig_arr.type, len(sig_arr),
            [pa.array(validity).buffers()[1], ],
            children=[sig_arr.values],
        )
        return pa.table(
            {
                "pkey": pa.array(np.r_[pkey.astype(np.int64), spkey], pa.int64()),
                "bkey": pa.array(
                    np.r_[bkey.view(np.int64), np.full(n_sig, -1, dtype=np.int64)],
                    pa.int64(),
                ),
                "doc_id": pa.array(np.r_[ids[doc_rep], ids[sdoc]], pa.int64()),
                "sig": sig_arr,
            }
        )

    return emit


def _bucket_pair_indices(bkey: np.ndarray, max_pairs: int = MAX_BUCKET_PAIRS):
    """Capped pair emission over (bkey-sorted) rows: all pairs per bucket
    while the bucket's pair count fits the ``max_pairs`` OUTPUT budget;
    beyond that, a sorted chain (keeps transitive connectivity).  Returns
    (a_idx, b_idx, n_capped)."""
    starts = np.flatnonzero(np.r_[True, bkey[1:] != bkey[:-1]])
    ends = np.r_[starts[1:], len(bkey)]
    a_chunks, b_chunks = [], []
    capped = 0
    for s, e in zip(starts, ends):
        m = e - s
        if m < 2:
            continue
        if m * (m - 1) // 2 > max_pairs:
            capped += 1
            a_chunks.append(np.arange(s, e - 1))
            b_chunks.append(np.arange(s + 1, e))
        else:
            ia, ib = np.triu_indices(m, 1)
            a_chunks.append(ia + s)
            b_chunks.append(ib + s)
    if not a_chunks:
        return np.empty(0, np.int64), np.empty(0, np.int64), capped
    return np.concatenate(a_chunks), np.concatenate(b_chunks), capped


_PAIR_SCHEMA = {"a_id": "int64", "b_id": "int64"}


def _make_partition_pairs(num_perm: int, jaccard_threshold: float,
                          max_bucket_pairs: int = MAX_BUCKET_PAIRS):
    """Per-shuffle-partition candidate emission (runs inside the groupby
    task, vectorized over all buckets in the partition): sort on bucket key,
    capped pair emission, signature-estimate prefilter, emit (a_id, b_id)."""
    thr = max(0.0, jaccard_threshold - 0.15)
    empty = pd.DataFrame({c: pd.Series(dtype=t) for c, t in _PAIR_SCHEMA.items()})

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return empty
        # split the stream: bkey == -1 rows carry this partition's
        # signatures (one per doc), the rest are bucket memberships
        is_sig = g["bkey"].to_numpy() == -1
        sig_rows = g[is_sig]
        sig_ids = sig_rows["doc_id"].to_numpy()
        sig_order = np.argsort(sig_ids, kind="mergesort")
        sig_ids = sig_ids[sig_order]
        sig_mat = np.stack(sig_rows["sig"].to_numpy()[sig_order])
        # uint8 XOR-fold for the estimate compare: the estimator only needs
        # EQUALITY of the 64-bit minhash values, and a uint8 false-match
        # (different values, equal fold, p~1/256) only shifts estimates UP —
        # no true pair is ever rejected that the full-width compare would
        # keep, at 1/8 the gather traffic (this compare is the funnel's
        # hottest loop at corpus scale).  Fold the raw bytes rather than
        # masking: the pandas group path may deliver sig as float64, where
        # a low-byte mask would be degenerate.
        raw = np.ascontiguousarray(sig_mat).view(np.uint8)
        raw = raw.reshape(sig_mat.shape[0], sig_mat.shape[1], sig_mat.dtype.itemsize)
        sig_lo = raw[..., 0]
        for k in range(1, raw.shape[2]):
            sig_lo = sig_lo ^ raw[..., k]
        band = g[~is_sig]
        if len(band) < 2:
            return empty
        bkey = band["bkey"].to_numpy()
        ids = band["doc_id"].to_numpy()
        order = np.lexsort((ids, bkey))
        bkey, ids = bkey[order], ids[order]
        ai, bi, capped = _bucket_pair_indices(bkey, max_bucket_pairs)
        sentinel = empty
        if capped:
            print(
                f"[minhash_neardup] {capped} LSH buckets exceeded the "
                f"{max_bucket_pairs}-pair emission budget; degraded to "
                f"connectivity chains there",
                file=sys.stderr,
            )
            # in-band budget report: one sentinel row per partition
            # (a_id = -(pkey+1) keeps it unique through the distributed
            # pair dedup; b_id carries this partition's capped-bucket
            # count).  The driver strips these and exposes the sum as
            # output metadata (truncated_buckets / pairs_complete).
            pk = int(g["pkey"].iloc[0])
            sentinel = pd.DataFrame({"a_id": [-(pk + 1)], "b_id": [capped]})
        if len(ai) == 0:
            return sentinel
        # near-dup pairs share MANY bands, so the same (a, b) surfaces from
        # several buckets of this partition — dedupe at the id level BEFORE
        # the signature-estimate prefilter (the funnel's hottest compare)
        pair_a = np.minimum(ids[ai], ids[bi])
        pair_b = np.maximum(ids[ai], ids[bi])
        uniq = np.unique(np.stack([pair_a, pair_b], axis=1), axis=0)
        sa = np.searchsorted(sig_ids, uniq[:, 0])
        sb = np.searchsorted(sig_ids, uniq[:, 1])
        keep_chunks = []
        for s0 in range(0, len(uniq), 200_000):
            ca, cb = sa[s0 : s0 + 200_000], sb[s0 : s0 + 200_000]
            est = (sig_lo[ca] == sig_lo[cb]).mean(axis=1)
            good = est >= thr
            keep_chunks.append(uniq[s0 : s0 + 200_000][good])
        kept = np.concatenate(keep_chunks)
        if len(kept) == 0:
            return sentinel
        out = pd.DataFrame({"a_id": kept[:, 0], "b_id": kept[:, 1]})
        return pd.concat([out, sentinel], ignore_index=True) if len(sentinel) else out

    return fn


def _exact_jaccard_pairs(
    tok_ids: np.ndarray, tokens: list, a_ids: np.ndarray, b_ids: np.ndarray
) -> np.ndarray:
    """Exact Jaccard (rounded 4) per (a, b) pair given the docs' sorted
    token-hash sets.  ``tok_ids`` sorted ascending; ``tokens[i]`` is doc
    ``tok_ids[i]``'s sorted-unique token hashes.  Vectorizes via vocabulary
    bitsets when the vocabulary is small (popcount(AND)/popcount(OR)), else
    per-pair sorted intersection."""
    pa_idx = np.searchsorted(tok_ids, a_ids)
    pb_idx = np.searchsorted(tok_ids, b_ids)
    vocab = np.unique(np.concatenate(tokens)) if len(tokens) else np.array([], np.int64)
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
        A, B = bits[pa_idx], bits[pb_idx]
        inter = _popcount(A & B).sum(axis=1)
        union = _popcount(A | B).sum(axis=1)
        return np.round(np.where(union > 0, inter / np.maximum(union, 1), 1.0), 4)
    jac = np.empty(len(a_ids), dtype=np.float64)
    for k, (x, y) in enumerate(zip(pa_idx, pb_idx)):
        ta, tb = tokens[x], tokens[y]
        inter = len(np.intersect1d(ta, tb, assume_unique=True))
        union = len(ta) + len(tb) - inter
        jac[k] = round(inter / union if union else 1.0, 4)
    return jac


def _fetch_for_ids(sigs: ray.data.Dataset, uids: np.ndarray, columns: list[str]) -> pd.DataFrame:
    """Pull ``columns`` for the candidate doc ids only (broadcast id array,
    vectorized membership filter in workers; result is candidate-bounded)."""
    ref = ray.put(np.asarray(uids, dtype=np.int64))

    def filt(batch: pa.Table) -> pa.Table:
        want = ray.get(ref)
        mask = np.isin(batch["doc_id"].to_numpy(zero_copy_only=False), want)
        return batch.select(columns).filter(pa.array(mask))

    return sigs.map_batches(filt, batch_format="pyarrow", batch_size=1024).to_pandas()


# Above this many candidate pairs the exact verify moves off the driver:
# pairs shuffle on a pair-partition key, each partition fetches only ITS
# docs' token sets (Dataset.join), and the Jaccard computes inside tasks —
# driver memory is then bounded by the VERIFIED output, not the candidate
# count (a dup-dense corpus's candidates are the big thing).
VERIFY_DRIVER_CAP = 200_000


def _distributed_verify(
    sigs: ray.data.Dataset,
    cand_ds: ray.data.Dataset,
    thr: float,
    n_vparts: int,
) -> pd.DataFrame:
    """Exact-Jaccard verify inside tasks.  Shape:

    pairs -(vkey)-> shuffle    \\
                                 groupby(vkey).map_groups(verify)
    (doc_id, vkey) needs ⋈ sigs /

    Each pair partition holds its pairs plus the token sets of exactly the
    docs those pairs touch (replicated per vkey via an inner Dataset.join —
    no broadcast, no driver hop).  Output rows are the verified pairs only.

    Token sets ride as BINARY (raw little-endian int64 bytes): Acero's hash
    join rejects list<> payload columns, and the encode is a zero-copy
    buffer reshuffle (list_flatten + cumsum offsets), not a per-row loop.
    """

    def add_vkey(t: pa.Table) -> pa.Table:
        a = t["a_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = t["b_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        v = ((a * _GOLDEN + b) * _FNV_PRIME % np.uint64(n_vparts)).astype(np.int64)
        return t.append_column("vkey", pa.array(v, pa.int64()))

    pairs_v = cand_ds.map_batches(add_vkey, batch_format="pyarrow")

    def emit_needs(t: pa.Table) -> pa.Table:
        a = t["a_id"].to_numpy(zero_copy_only=False)
        b = t["b_id"].to_numpy(zero_copy_only=False)
        v = t["vkey"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate([a, b]), pa.int64()),
                "vkey": pa.array(np.concatenate([v, v]), pa.int64()),
            }
        )

    needs = _dedup_rows_ds(
        pairs_v.map_batches(emit_needs, batch_format="pyarrow"),
        ["doc_id", "vkey"],
        n_vparts,
    )
    import pyarrow.compute as pc

    def encode_tokens(t: pa.Table) -> pa.Table:
        col = t["tokens"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        lens = pc.list_value_length(col).to_numpy(zero_copy_only=False)
        lens = np.nan_to_num(lens.astype(np.float64)).astype(np.int64)
        offs = (np.concatenate([[0], np.cumsum(lens)]) * 8).astype(np.int32)
        flat = pc.list_flatten(col).to_numpy(zero_copy_only=False).astype("<i8")
        bin_arr = pa.Array.from_buffers(
            pa.binary(), len(col),
            [None, pa.py_buffer(offs.tobytes()), pa.py_buffer(flat.tobytes())],
        )
        return pa.table(
            {"doc_id": t["doc_id"].cast(pa.int64()), "tok_bin": bin_arr}
        )

    tokd = needs.join(
        sigs.select_columns(["doc_id", "tokens"]).map_batches(
            encode_tokens, batch_format="pyarrow"
        ),
        join_type="inner",
        num_partitions=max(8, n_vparts // 4),
        on=("doc_id",),
    )

    def tag_pairs(t: pa.Table) -> pa.Table:
        n_r = len(t)
        return pa.table(
            {
                "vkey": t["vkey"].cast(pa.int64()),
                "a_id": t["a_id"].cast(pa.int64()),
                "b_id": t["b_id"].cast(pa.int64()),
                "doc_id": pa.array(np.full(n_r, -1, np.int64), pa.int64()),
                "tok_bin": pa.nulls(n_r, pa.binary()),
            }
        )

    def tag_toks(t: pa.Table) -> pa.Table:
        n_r = len(t)
        return pa.table(
            {
                "vkey": t["vkey"].cast(pa.int64()),
                "a_id": pa.array(np.full(n_r, -1, np.int64), pa.int64()),
                "b_id": pa.array(np.full(n_r, -1, np.int64), pa.int64()),
                "doc_id": t["doc_id"].cast(pa.int64()),
                "tok_bin": t["tok_bin"].cast(pa.binary()),
            }
        )

    both = pairs_v.map_batches(tag_pairs, batch_format="pyarrow").union(
        tokd.map_batches(tag_toks, batch_format="pyarrow")
    )
    out_empty = pd.DataFrame(
        {"a_id": pd.Series(dtype="int64"), "b_id": pd.Series(dtype="int64"),
         "jaccard": pd.Series(dtype="float64")}
    )

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        is_tok = g["doc_id"].to_numpy() != -1
        toks = g[is_tok]
        prs = g[~is_tok]
        if len(prs) == 0 or len(toks) == 0:
            return out_empty
        t_ids = toks["doc_id"].to_numpy()
        t_order = np.argsort(t_ids, kind="mergesort")
        t_ids = t_ids[t_order]
        tokens = [
            np.frombuffer(toks["tok_bin"].iloc[i], dtype="<i8").astype(np.int64)
            for i in t_order
        ]
        a = prs["a_id"].to_numpy()
        b = prs["b_id"].to_numpy()
        jac = _exact_jaccard_pairs(t_ids, tokens, a, b)
        good = jac >= thr
        if not good.any():
            return out_empty
        return pd.DataFrame(
            {"a_id": a[good], "b_id": b[good], "jaccard": jac[good]}
        )

    verified = both.groupby("vkey").map_groups(verify, batch_format="pandas")
    out = verified.to_pandas()
    if out.empty:
        return out_empty
    return out.sort_values(["a_id", "b_id"]).reset_index(drop=True)


def minhash_neardup(
    ds_docs: ray.data.Dataset,
    num_perm: int = 128,
    bands: int = 32,
    jaccard_threshold: float = 0.5,
    mode: str = "word",
    n: int = 3,
    max_bucket_pairs: int = MAX_BUCKET_PAIRS,
    verify_driver_cap: int = VERIFY_DRIVER_CAP,
) -> pd.DataFrame:
    """MinHash-LSH near-dup, distributed end-to-end: signatures (actor pool)
    -> band rows -> ``groupby(pkey)`` shuffle -> partition-local capped pair
    emission + signature-estimate prefilter -> exact-Jaccard verify over the
    candidate docs' token sets.  The driver only ever materializes candidate
    pairs and candidate-doc tokens (output-bounded), never the corpus.
    Returns (a_id, b_id, jaccard rounded to 4) sorted."""
    empty = pd.DataFrame(
        {"a_id": pd.Series(dtype="int64"), "b_id": pd.Series(dtype="int64"),
         "jaccard": pd.Series(dtype="float64")}
    )
    sigs = signatures_dataset(ds_docs, num_perm, mode, n).materialize()
    n_docs = sigs.count()
    if n_docs < 2:
        return empty
    nparts = _n_partitions(n_docs * bands)
    band_rows = sigs.select_columns(["doc_id", "sig"]).map_batches(
        _make_band_emitter(num_perm, bands, nparts),
        batch_format="pyarrow",
        batch_size=1024,
    )
    cand_rows = band_rows.groupby("pkey").map_groups(
        _make_partition_pairs(num_perm, jaccard_threshold, max_bucket_pairs),
        batch_format="pandas",
    )
    # cross-partition pair dedup DISTRIBUTED, not on the driver: a dense
    # dup cluster surfaces the same pair from up to min(bands, partitions)
    # partitions (a k-doc cluster would otherwise ship ~bands * k^2/2 rows
    # to the driver — 30M at sf0.1); after the groupby the driver holds
    # exactly the distinct candidate set (output-bounded)
    cand_ds = _dedup_rows_ds(cand_rows, ["a_id", "b_id"], nparts).materialize()
    # strip the in-band budget sentinels (a_id < 0) and expose their sum as
    # output metadata: consumers detect pair-list truncation from the frame
    # itself (attrs) instead of stderr/BASELINE.md
    import pyarrow.compute as pc

    sent = cand_ds.map_batches(
        lambda t: t.filter(pc.less(t["a_id"], 0)), batch_format="pyarrow"
    ).to_pandas()
    truncated_buckets = int(sent["b_id"].sum()) if len(sent) else 0
    if truncated_buckets:
        cand_ds = cand_ds.map_batches(
            lambda t: t.filter(pc.greater_equal(t["a_id"], 0)),
            batch_format="pyarrow",
        )

    def _meta(df: pd.DataFrame) -> pd.DataFrame:
        df.attrs["truncated_buckets"] = truncated_buckets
        df.attrs["pairs_complete"] = truncated_buckets == 0
        return df

    n_cand = cand_ds.count()
    if n_cand == 0:
        return _meta(empty)
    if n_cand > verify_driver_cap:
        # dup-dense regime: verify inside tasks, driver holds only the
        # verified output (parity with the driver path pinned in
        # tests/test_dedup_distributed_verify.py)
        return _meta(_distributed_verify(sigs, cand_ds, jaccard_threshold, nparts))
    cand = cand_ds.to_pandas().reset_index(drop=True)
    # exact verify on the candidate docs only: fetch their token sets and
    # compute on the driver (candidate-bounded below the cap)
    uids = np.unique(np.concatenate([cand["a_id"].to_numpy(), cand["b_id"].to_numpy()]))
    tok = _fetch_for_ids(sigs, uids, ["doc_id", "tokens"])
    tok_order = np.argsort(tok["doc_id"].to_numpy())
    tok_ids = tok["doc_id"].to_numpy()[tok_order]
    tokens = [np.asarray(tok["tokens"].iloc[i], dtype=np.int64) for i in tok_order]
    jac = _exact_jaccard_pairs(
        tok_ids, tokens, cand["a_id"].to_numpy(), cand["b_id"].to_numpy()
    )
    good = jac >= jaccard_threshold
    if not good.any():
        return _meta(empty)
    out = pd.DataFrame(
        {"a_id": cand["a_id"].to_numpy()[good], "b_id": cand["b_id"].to_numpy()[good],
         "jaccard": jac[good]}
    )
    return _meta(out.sort_values(["a_id", "b_id"]).reset_index(drop=True))


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
    # plain task pool (see signatures_dataset note)
    return ds_docs.map_batches(SimhashActor(), batch_format="pyarrow", batch_size=1024)


_HAM_SCHEMA = {"a_id": "int64", "b_id": "int64", "hamming": "int64"}


def _make_simhash_partition(max_hamming: int):
    """Per-shuffle-partition bucketing + in-bucket exact Hamming verify
    (both docs' simhashes are present in the bucket, so verification never
    leaves the partition task)."""
    empty = pd.DataFrame({c: pd.Series(dtype=t) for c, t in _HAM_SCHEMA.items()})

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return empty
        bkey = g["bkey"].to_numpy()
        ids = g["doc_id"].to_numpy()
        sh = g["simhash"].to_numpy()
        order = np.lexsort((ids, bkey))
        bkey, ids, sh = bkey[order], ids[order], sh[order]
        ai, bi, capped = _bucket_pair_indices(bkey)
        if capped:
            print(f"[simhash_neardup] {capped} buckets exceeded the "
                  f"{MAX_BUCKET_PAIRS}-pair emission budget",
                  file=sys.stderr)
        if len(ai) == 0:
            return empty
        ham = _popcount((sh[ai].view(np.uint64)) ^ (sh[bi].view(np.uint64)))
        good = ham <= max_hamming
        if not good.any():
            return empty
        out = pd.DataFrame(
            {
                "a_id": np.minimum(ids[ai[good]], ids[bi[good]]),
                "b_id": np.maximum(ids[ai[good]], ids[bi[good]]),
                "hamming": ham[good],
            }
        )
        return out.drop_duplicates(["a_id", "b_id"])

    return fn


def _hamming_chunk_neardup(
    hashed: ray.data.Dataset,
    id_col: str,
    code_col: str,
    n_chunks: int,
    chunk_bits: int,
    max_hamming: int,
) -> pd.DataFrame:
    """Generic distributed Hamming near-dup over an integer code column:
    per-row (pkey, bkey=chunk value | chunk index, id, code) emission ->
    ``groupby(pkey)`` shuffle -> partition-local capped bucketing + exact
    Hamming verify.  Any pair within Hamming <= n_chunks-1 shares an exact
    chunk (Charikar); wider radii get best-effort recall.  Driver only
    materializes verified pairs.  Backs both SimHash text near-dup (4x16-bit
    chunks of a 64-bit code) and image dHash near-dup (4x14-bit chunks of a
    56-bit code)."""
    empty = pd.DataFrame({c: pd.Series(dtype=t) for c, t in _HAM_SCHEMA.items()})
    hashed = hashed.materialize()
    n_rows = hashed.count()
    if n_rows < 2:
        return empty
    npart = _n_partitions(n_rows * n_chunks)
    mask = np.uint64((1 << chunk_bits) - 1)

    def emit(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        sh = batch[code_col].to_numpy(zero_copy_only=False).astype(np.int64)
        u = sh.view(np.uint64)
        keys = np.empty((n_chunks, len(ids)), dtype=np.int64)
        for chunk in range(n_chunks):
            val = (u >> np.uint64(chunk_bits * chunk)) & mask
            keys[chunk] = (val | np.uint64(chunk << chunk_bits)).astype(np.int64)
        bkey = keys.ravel()
        return pa.table(
            {
                "pkey": pa.array(bkey % npart, pa.int64()),
                "bkey": pa.array(bkey, pa.int64()),
                "doc_id": pa.array(np.tile(ids, n_chunks), pa.int64()),
                "simhash": pa.array(np.tile(sh, n_chunks), pa.int64()),
            }
        )

    rows = hashed.map_batches(emit, batch_format="pyarrow", batch_size=1024)
    out = (
        rows.groupby("pkey")
        .map_groups(_make_simhash_partition(max_hamming), batch_format="pandas")
        .to_pandas()
    )
    if out.empty:
        return empty
    out = out.drop_duplicates(["a_id", "b_id"])
    return out.sort_values(["a_id", "b_id"]).reset_index(drop=True)


def simhash_neardup(ds_docs: ray.data.Dataset, max_hamming: int = 6) -> pd.DataFrame:
    """SimHash near-dup, distributed: simhash (actor pool) -> chunk-key rows
    -> ``groupby(pkey)`` shuffle -> partition-local capped bucketing + exact
    Hamming verify inside the partition task.  The driver only materializes
    verified pairs (output-bounded), never the corpus."""
    hashed = simhash_column(ds_docs)
    return _hamming_chunk_neardup(
        hashed, id_col="doc_id", code_col="simhash", n_chunks=4, chunk_bits=16,
        max_hamming=max_hamming,
    )


def exact_dedup(ds: ray.data.Dataset, key_col: str, id_col: str,
                cap: int | None = None) -> ray.data.Dataset:
    """Generic exact dedup: keep the min-id row per key (deterministic
    'first').

    Fully vectorized — no per-group Python at any key cardinality (the
    content-key cardinality at corpus scale is ~one group per document):
    per-batch min-id partials (slim (key, id) rows) reduce through the
    native ``groupby(key).min(id)`` shuffle, then the winning ids (unique
    row identifiers) semi-join the original rows back, size-gated between
    a broadcast id set and a partitioned hash join (gated_semi_join)."""
    from demeter_ray.pipelines.relational import gated_semi_join

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby(key_col, as_index=False)[[id_col]].min()

    winners = (
        ds.select_columns([key_col, id_col])
        .map_batches(partial, batch_format="pandas")
        .groupby(key_col)
        .min(id_col)
    )
    minc = f"min({id_col})"
    winner_ids = winners.map_batches(
        lambda t, c=minc: pa.table({id_col: t[c]}), batch_format="pyarrow"
    )
    kw = {} if cap is None else {"cap": cap}
    return gated_semi_join(ds, id_col, winner_ids, id_col, **kw)
