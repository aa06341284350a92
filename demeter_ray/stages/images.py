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

from demeter_ray.functions import avi as _avi
from demeter_ray.functions import codec
from demeter_ray.functions import jpeg as _jpeg
from demeter_ray.functions import png as _png
from demeter_ray.functions.hashing import hamming64, hamming64_pairwise


def _wh_groups(batch: pa.Table, blobs=None):
    """Split a batch's row indices into (w, h) groups so decode / resize /
    feature kernels run batched per group (fixture sizes cycle through a
    handful of values, so each batch splits into a few big groups).  Uses
    the w/h metadata columns when present, else the blob headers."""
    if "w" in batch.column_names and "h" in batch.column_names:
        ws = batch["w"].to_numpy(zero_copy_only=False).astype(np.int64)
        hs = batch["h"].to_numpy(zero_copy_only=False).astype(np.int64)
    else:
        dims = [codec.header_dims(b) for b in (blobs or batch["bytes"].to_pylist())]
        ws = np.array([d[0] for d in dims], dtype=np.int64)
        hs = np.array([d[1] for d in dims], dtype=np.int64)
    key = ws * 100000 + hs
    for k in np.unique(key):
        sel = np.flatnonzero(key == k)
        yield sel, int(ws[sel[0]]), int(hs[sel[0]])


class DecodeStatsActor:
    """bytes -> decoded pixel statistics (mean/std), phash recomputed from
    decoded pixels, phash drift vs the stored column.  Decode and stats run
    batched per (w, h) group — no per-image Python loop."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch["bytes"].to_pylist()
        stored = batch["phash"].to_numpy(zero_copy_only=False)
        n = len(blobs)
        means = np.empty(n, dtype=np.float64)
        stds = np.empty(n, dtype=np.float64)
        rehash = np.empty(n, dtype=np.int64)
        for sel, w, h in _wh_groups(batch):
            px = codec.decode_batch([blobs[i] for i in sel], w, h)
            means[sel] = px.mean(axis=(1, 2, 3))
            stds[sel] = px.std(axis=(1, 2, 3))
            rehash[sel] = codec.phash64_batch(px)
        drift = hamming64_pairwise(rehash, stored)
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


def decode_stats(ds: ray.data.Dataset, concurrency=None, batch_size: int = 256):
    """Stateless task pool (the codec holds no state — see decode_verify)."""
    return ds.map_batches(
        DecodeStatsActor(), batch_format="pyarrow", batch_size=batch_size
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


# ---------------------------------------------------------------------------
# Image transform / feature stages (payload axis: decode -> resize/crop ->
# features / frame sampling).  The resize/crop/feature math is real numpy;
# only the codec is the deterministic stand-in (no PIL/libjpeg in the
# sandbox — driver contract).  All stages: binary column in, Arrow out,
# small batches for wide rows.
# ---------------------------------------------------------------------------


def resize_bilinear(px: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Vectorized bilinear resize of HxWxC uint8 (align_corners=False
    convention, the common ML default)."""
    h, w, c = px.shape
    ys = (np.arange(out_h) + 0.5) * h / out_h - 0.5
    xs = (np.arange(out_w) + 0.5) * w / out_w - 0.5
    y0 = np.clip(np.floor(ys).astype(np.int64), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(np.int64), 0, w - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    wy = np.clip(ys - y0, 0, 1)[:, None, None]
    wx = np.clip(xs - x0, 0, 1)[None, :, None]
    p = px.astype(np.float64)
    top = p[y0][:, x0] * (1 - wx) + p[y0][:, x1] * wx
    bot = p[y1][:, x0] * (1 - wx) + p[y1][:, x1] * wx
    out = top * (1 - wy) + bot * wy
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


def center_crop(px: np.ndarray, ch: int, cw: int) -> np.ndarray:
    h, w, _ = px.shape
    r0 = max(0, (h - ch) // 2)
    c0 = max(0, (w - cw) // 2)
    return px[r0 : r0 + ch, c0 : c0 + cw]


def image_features(px: np.ndarray, bins: int = 8) -> np.ndarray:
    """Compact deterministic feature vector: per-channel histograms +
    mean/std (the embedding stand-in for image-similarity pipelines)."""
    feats = []
    for ch in range(px.shape[2]):
        hist, _ = np.histogram(px[:, :, ch], bins=bins, range=(0, 256))
        feats.append(hist / hist.sum())
    feats.append([px.mean() / 255.0, px.std() / 255.0])
    return np.concatenate([np.asarray(f, dtype=np.float64) for f in feats])


def resize_bilinear_batch(px: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Batched bilinear resize of (N, H, W, C) uint8 — identical math to
    ``resize_bilinear`` applied per image, one vectorized pass."""
    n, h, w, c = px.shape
    ys = (np.arange(out_h) + 0.5) * h / out_h - 0.5
    xs = (np.arange(out_w) + 0.5) * w / out_w - 0.5
    y0 = np.clip(np.floor(ys).astype(np.int64), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(np.int64), 0, w - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    wy = np.clip(ys - y0, 0, 1)[None, :, None, None]
    wx = np.clip(xs - x0, 0, 1)[None, None, :, None]
    p = px.astype(np.float64)
    p00 = p[:, y0[:, None], x0[None, :], :]
    p01 = p[:, y0[:, None], x1[None, :], :]
    p10 = p[:, y1[:, None], x0[None, :], :]
    p11 = p[:, y1[:, None], x1[None, :], :]
    top = p00 * (1 - wx) + p01 * wx
    bot = p10 * (1 - wx) + p11 * wx
    out = top * (1 - wy) + bot * wy
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


def image_features_batch(px: np.ndarray, bins: int = 8) -> np.ndarray:
    """Batched ``image_features``: per-channel histograms via one bincount
    over (image, channel, bin) indices + vectorized mean/std."""
    n, h, w, c = px.shape
    bin_idx = (px.astype(np.int64) * bins) // 256
    flat = (
        np.arange(n, dtype=np.int64)[:, None, None, None] * (c * bins)
        + np.arange(c, dtype=np.int64)[None, None, None, :] * bins
        + bin_idx
    )
    counts = np.bincount(flat.ravel(), minlength=n * c * bins).reshape(n, c, bins)
    hists = counts / (h * w)
    p = px.reshape(n, h * w * c).astype(np.float64)  # reshape(0, -1) raises
    extra = np.stack([p.mean(axis=1) / 255.0, p.std(axis=1) / 255.0], axis=1)
    return np.concatenate([hists.reshape(n, c * bins), extra], axis=1)


class TransformActor:
    """Decode -> resize -> center-crop -> feature-extract, batched per
    (w, h) group (the DecodeVerifyActor pattern) — no per-image Python loop.
    Emits a fixed-size feature vector column + the re-encoded thumbnail
    (binary) — the shape of a preprocessing stage feeding embedding/ANN
    pipelines."""

    def __init__(self, out_size: int = 16, crop: int = 12, bins: int = 8):
        self.out_size = out_size
        self.crop = crop
        self.bins = bins

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch["bytes"].to_pylist()
        n = len(blobs)
        dim = 3 * self.bins + 2
        feats = np.empty((n, dim), dtype=np.float64)
        thumbs: list = [None] * n
        for sel, w, h in _wh_groups(batch):
            px = codec.decode_batch([blobs[i] for i in sel], w, h)
            small = resize_bilinear_batch(px, self.out_size, self.out_size)
            r0 = max(0, (self.out_size - self.crop) // 2)
            cropped = small[:, r0 : r0 + self.crop, r0 : r0 + self.crop, :]
            feats[sel] = image_features_batch(cropped, self.bins)
            encoded = codec.encode_batch(np.ascontiguousarray(cropped), "png")
            for j, i in enumerate(sel):
                thumbs[i] = encoded[j]
        batch = batch.drop_columns(["bytes"])
        batch = batch.append_column("thumb", pa.array(thumbs, pa.binary()))
        return batch.append_column(
            "features", pa.array(list(feats), pa.list_(pa.float64(), dim))
        )


def sample_frames(video_bytes: bytes, every: int = 2) -> list[np.ndarray]:
    """Frame sampling over a multi-frame container.  A RIFF/AVI blob
    (functions/avi.py — MJPG or uncompressed DIB streams) is sampled
    through its idx1 index, touching only the sampled chunks' bytes; a
    bare concatenation of encoded frames — real PNGs/JPEGs
    (self-delimiting) or fixed-stride DRAW/DJPG — is walked by frame
    size.  Take every ``every``-th frame either way."""
    if bytes(video_bytes[:4]) == _avi.AVI_MAGIC and bytes(video_bytes[8:12]) == b"AVI ":
        return list(_avi.sample_avi_frames(video_bytes, every=every))
    frames = []
    off = 0
    idx = 0
    n = len(video_bytes)
    while off < n:
        if video_bytes[off : off + 8] == _png.PNG_SIG:
            size = _png.png_frame_size(video_bytes, off)
        elif video_bytes[off : off + 2] == _jpeg.SOI:
            size = _jpeg.jpeg_frame_size(video_bytes, off)
        else:
            import struct as _struct

            magic, w, h, c, q = _struct.unpack_from(codec._HDR_FMT, video_bytes, off)
            size = codec._HDR_SIZE + w * h * c
        if idx % every == 0:
            frames.append(codec.decode(video_bytes[off : off + size]))
        off += size
        idx += 1
    return frames


def transform_images(ds: ray.data.Dataset, out_size: int = 16, crop: int = 12,
                     concurrency=None, batch_size: int = 256) -> ray.data.Dataset:
    """Stateless task pool: the transform holds only 3 ints of state, so
    plain tasks beat an actor pool (no ramp-up, no pool starvation)."""
    return ds.map_batches(
        TransformActor(out_size, crop),
        batch_format="pyarrow",
        batch_size=batch_size,
    )
