"""Stable hashing primitives: 64-bit content hashes, MinHash, SimHash,
rolling-hash fingerprints.

Everything is deterministic across processes and Ray workers (no reliance on
PYTHONHASHSEED).  Token->int64 hashing goes through sha256 with a per-actor
cache — fixture/document vocabularies are small, so the cache turns per-token
hashing into dict lookups; the scale note for open vocabularies is in
stages/dedup.py.
"""

from __future__ import annotations

from hashlib import sha256

import numpy as np

MERSENNE61 = (1 << 61) - 1


def stable_hash64(data) -> int:
    """Stable unsigned 63-bit hash of bytes/str: little-endian first 8 bytes
    of sha256, top bit dropped.  sha256 (not blake2b) so DuckDB oracles can
    recompute token hashes in SQL (`sha256(t)` + hex arithmetic) — see
    pipelines/oracle_text.py simhash / approx-distinct oracles."""
    if isinstance(data, str):
        data = data.encode("utf-8")
    return int.from_bytes(sha256(data).digest()[:8], "little") >> 1


class TokenHasher:
    """Cached token -> uint64 hasher (build once per actor)."""

    def __init__(self):
        self._cache: dict[str, int] = {}

    def hash_tokens(self, tokens) -> np.ndarray:
        cache = self._cache
        out = np.empty(len(tokens), dtype=np.uint64)
        for i, t in enumerate(tokens):
            v = cache.get(t)
            if v is None:
                v = stable_hash64(t)
                cache[t] = v
            out[i] = v
        return out


_PERM_CACHE: dict = {}


def _perm_coeffs(num_perm: int, seed: int):
    """Deterministic universal-hash coefficients (a split hi/lo for the
    61-bit modular multiply, b), cached — they are per-(num_perm, seed)
    constants, not per-document state."""
    key = (num_perm, seed)
    got = _PERM_CACHE.get(key)
    if got is None:
        rng = np.random.RandomState(seed)
        a = rng.randint(1, MERSENNE61, size=num_perm, dtype=np.int64).astype(np.uint64)
        b = rng.randint(0, MERSENNE61, size=num_perm, dtype=np.int64).astype(np.uint64)
        got = _PERM_CACHE[key] = (a >> 31, a & np.uint64((1 << 31) - 1), b)
    return got


def minhash_signature(token_hashes: np.ndarray, num_perm: int, seed: int = 7) -> np.ndarray:
    """MinHash signature via universal hashing h_i(x) = (a_i*x + b_i) mod p.
    a_i/b_i derive deterministically from ``seed``.  Vectorized: one
    (num_perm x n_tokens) broadcast per document set."""
    if len(token_hashes) == 0:
        return np.full(num_perm, MERSENNE61, dtype=np.uint64)
    a_hi, a_lo, b = _perm_coeffs(num_perm, seed)
    x = token_hashes.astype(np.uint64)[None, :] % MERSENNE61
    # a*x overflows uint64: modular mul via hi/lo 31-bit split of a
    prod = (((a_hi[:, None] * x) % MERSENNE61) << np.uint64(31)) % MERSENNE61
    prod = (prod + a_lo[:, None] * x) % MERSENNE61
    hashed = (prod + b[:, None]) % MERSENNE61
    return hashed.min(axis=1)


def minhash_bands(signature: np.ndarray, bands: int) -> list[int]:
    """Split a signature into ``bands`` equal rows-per-band chunks and hash
    each chunk to a bucket key (LSH banding)."""
    rows = len(signature) // bands
    keys = []
    for bidx in range(bands):
        chunk = signature[bidx * rows : (bidx + 1) * rows]
        keys.append(stable_hash64(chunk.tobytes()) ^ bidx)
    return keys


def simhash64(token_hashes: np.ndarray, weights=None) -> int:
    """64-bit SimHash: weighted bit-vote over token hashes."""
    if len(token_hashes) == 0:
        return 0
    bits = ((token_hashes[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(
        np.int64
    )
    votes = bits * 2 - 1
    if weights is not None:
        votes = votes * np.asarray(weights, dtype=np.int64)[:, None]
    val = 0
    for bit in (votes.sum(axis=0) > 0)[::-1]:
        val = (val << 1) | int(bit)
    if val >= 1 << 63:
        val -= 1 << 64
    return val


def hamming64(a: np.ndarray, b: int) -> np.ndarray:
    """Vectorized Hamming distance of an int64 array against one value."""
    x = (a.astype(np.int64) ^ np.int64(b)).astype(np.uint64)
    # popcount via bit tricks (no np.popcount in numpy 1.x)
    x = x - ((x >> np.uint64(1)) & np.uint64(0x5555555555555555))
    x = (x & np.uint64(0x3333333333333333)) + ((x >> np.uint64(2)) & np.uint64(0x3333333333333333))
    x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    return ((x * np.uint64(0x0101010101010101)) >> np.uint64(56)).astype(np.int64)


def hamming64_pairwise(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Elementwise Hamming distance between two int64 arrays."""
    x = (np.asarray(a, np.int64) ^ np.asarray(b, np.int64)).astype(np.uint64)
    x = x - ((x >> np.uint64(1)) & np.uint64(0x5555555555555555))
    x = (x & np.uint64(0x3333333333333333)) + ((x >> np.uint64(2)) & np.uint64(0x3333333333333333))
    x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    return ((x * np.uint64(0x0101010101010101)) >> np.uint64(56)).astype(np.int64)


def rolling_fingerprints(text: str, k: int = 8, window: int = 4) -> list[int]:
    """Winnowing document fingerprints: Karp-Rabin rolling hash over k-grams,
    minimum per sliding window (Schleimer et al., SIGMOD'03).  Deterministic;
    returns the selected fingerprint values."""
    data = text.encode("utf-8")
    n = len(data)
    if n < k:
        return [stable_hash64(data)] if n else []
    # Mersenne-31 modulus keeps every intermediate product within int64
    base = 257
    mod = (1 << 31) - 1
    vals = np.frombuffer(data, dtype=np.uint8).astype(np.int64)
    hashes = np.zeros(n - k + 1, dtype=np.int64)
    h = 0
    for i in range(k):
        h = (h * base + int(vals[i])) % mod
    hashes[0] = h
    power = pow(base, k - 1, mod)
    for i in range(1, n - k + 1):
        h = ((h - int(vals[i - 1]) * power) * base + int(vals[i + k - 1])) % mod
        hashes[i] = h
    if len(hashes) <= window:
        return [int(hashes.min())]
    # winnow: min of each window, dedup consecutive picks
    from numpy.lib.stride_tricks import sliding_window_view

    wins = sliding_window_view(hashes, window)
    mins = wins.min(axis=1)
    picks = np.unique(mins)
    return [int(v) for v in picks]


def mix64_batch(x: np.ndarray, seed: int = 0) -> np.ndarray:
    """Vectorized splitmix64 finalizer over an int64/uint64 array — the
    cheap avalanche hash for bloom-filter probes and salting.  Pure uint64
    wraparound arithmetic (numpy wraps silently, no Python bigints)."""
    v = x.astype(np.uint64, copy=True)
    v += np.uint64(seed * 0x9E3779B97F4A7C15 & 0xFFFFFFFFFFFFFFFF)
    v ^= v >> np.uint64(30)
    v *= np.uint64(0xBF58476D1CE4E5B9)
    v ^= v >> np.uint64(27)
    v *= np.uint64(0x94D049BB133111EB)
    v ^= v >> np.uint64(31)
    return v
