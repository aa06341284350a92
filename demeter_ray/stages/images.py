"""Image decode / verify / feature stages (payload axis of the graft).

The multimodal pattern (SURVEY.md §2.2 NEW): images are opaque binary columns
with typed metadata; decode and feature-extraction run as actor-pool
``map_batches`` stages over ``batch_format="pyarrow"`` with SMALL batch sizes
(binary payloads are wide — SURVEY.md §7.5).  The codec itself is the
deterministic stand-in from functions/codec.py (no PIL in this sandbox); the
Ray-side plumbing — schema, actor signature, batch sizing, output layout —
is real and tested.

Per-row invariant vs the reference decode (BASELINE.json input_hint):
lossless rows decode allclose (exact); lossy rows reach PSNR >= 40 dB;
captions pass through unchanged.  ``DecodeVerifyActor`` enforces it inline
and emits per-row psnr evidence.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from demeter_ray.functions import codec
from demeter_ray.functions.hashing import hamming64


class DecodeStatsActor:
    """bytes -> decoded pixel statistics (mean/std), phash recomputed from
    decoded pixels, phash drift vs the stored column."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch["bytes"].to_pylist()
        stored = batch["phash"].to_numpy(zero_copy_only=False)
        means = np.empty(len(blobs), dtype=np.float64)
        stds = np.empty(len(blobs), dtype=np.float64)
        rehash = np.empty(len(blobs), dtype=np.int64)
        for i, buf in enumerate(blobs):
            px = codec.decode(buf)
            means[i] = px.mean()
            stds[i] = px.std()
            rehash[i] = codec.phash64(px)
        drift = np.array(
            [hamming64(np.array([r]), int(s))[0] for r, s in zip(rehash, stored)],
            dtype=np.int64,
        )
        batch = batch.drop_columns(["bytes"])
        batch = batch.append_column("mean_pixel", pa.array(means, pa.float64()))
        batch = batch.append_column("std_pixel", pa.array(stds, pa.float64()))
        batch = batch.append_column("phash_decoded", pa.array(rehash, pa.int64()))
        return batch.append_column("phash_drift", pa.array(drift, pa.int64()))


class DecodeVerifyActor:
    """Enforce the per-row invariant vs the reference decode: allclose for
    lossless, PSNR >= min_psnr for lossy, caption equality.  Emits psnr and
    verified columns; raises on violation when strict."""

    def __init__(self, min_psnr: float = 40.0, strict: bool = True,
                 dup_rule: bool = False):
        self.min_psnr = min_psnr
        self.strict = strict
        # fixture tables plant exact duplicates at i%100==99 (pixels of i-1);
        # only the fixture pipeline opts into that decode-reference rule
        self.dup_rule = dup_rule

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch["bytes"].to_pylist()
        fmts = np.asarray(batch["fmt"].to_pylist())
        ids = batch["image_id"].to_pylist()
        captions = batch["caption"].to_pylist()
        ws = batch["w"].to_numpy(zero_copy_only=False)
        hs = batch["h"].to_numpy(zero_copy_only=False)
        n = len(blobs)
        src_index = np.array([int(i[3:].lstrip("0") or 0) for i in ids], dtype=np.int64)
        ref_index = src_index.copy()
        if self.dup_rule:
            dup = src_index % 100 == 99
            ref_index[dup] -= 1
        psnrs = np.empty(n, dtype=np.float64)
        ok = np.zeros(n, dtype=bool)
        # vectorize within (w, h, fmt) groups — fixture sizes cycle through a
        # handful of values, so each batch splits into a few big groups
        key = ws.astype(np.int64) * 100000 + hs.astype(np.int64) * 10 + (fmts == "png")
        for k in np.unique(key):
            sel = np.flatnonzero(key == k)
            w, h = int(ws[sel[0]]), int(hs[sel[0]])
            is_png = fmts[sel[0]] == "png"
            ref_px = codec.generate_pixels_batch(ref_index[sel], w, h)
            px = codec.decode_batch([blobs[i] for i in sel], w, h)
            p = codec.psnr_batch(px, ref_px)
            psnrs[sel] = p
            ok[sel] = np.isinf(p) if is_png else p >= self.min_psnr
        for i in range(n):
            if ok[i] and not captions[i].startswith(f"field scene {src_index[i]} "):
                ok[i] = False
            if self.strict and not ok[i]:
                raise ValueError(
                    f"decode invariant violated for {ids[i]}: psnr={psnrs[i]:.2f}"
                )
        batch = batch.append_column("psnr", pa.array(psnrs, pa.float64()))
        return batch.append_column("decode_verified", pa.array(ok, pa.bool_()))


def decode_stats(ds: ray.data.Dataset, concurrency=4, batch_size: int = 256):
    return ds.map_batches(
        DecodeStatsActor,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def decode_verify(
    ds: ray.data.Dataset, min_psnr: float = 40.0, strict: bool = True,
    dup_rule: bool = False, concurrency=None, batch_size: int = 512,
):
    """Decode+verify as STATELESS tasks: the stage holds no model/index (the
    codec is pure functions), so plain tasks beat an actor pool — no pool
    ramp-up, no per-actor thread wrapper, fully elastic parallelism.  Actor
    pools stay for genuinely stateful stages (spatial index, token caches)."""
    verifier = DecodeVerifyActor(min_psnr, strict, dup_rule)

    def fn(batch: pa.Table) -> pa.Table:
        return verifier(batch)

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)
