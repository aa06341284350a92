"""Image codec front-end + perceptual hash.

Formats (dispatch on leading magic bytes at decode time):

- ``png`` — REAL PNG bitstreams (functions/png.py: pure numpy + stdlib zlib,
  CRC-validated chunks, all five filter types on decode).  Lossless, so the
  north rule's allclose invariant is exact equality.
- ``jpeg`` — REAL baseline JFIF bitstreams (functions/jpeg.py: pure
  numpy/stdlib T.81 — FDCT, zigzag, Huffman entropy coding, in-file
  DQT/DHT).  Roundtrip PSNR ~45 dB at the default table, above the north
  rule's 40 dB bar.
- ``djpg`` — lossy stand-in: uniform quantization with step ``q``.  Kept
  for (a) SQL oracles that recompute the reconstruction (``v//q*q + q//2``
  is expressible in SQL; a DCT is not) and (b) high-throughput bulk rows
  where the real entropy decode would dominate a benchmark stage — the
  documented split lives in SURVEY.md and the images fixture.
- ``draw`` — ``DRAW`` raw frames: header + C-order uint8 HxWxC pixels.
  Fixed-size and zero-copy decodable; used where a stream needs
  constant-stride frames (video containers) or zero-copy decode.
- BMP (functions/bmp.py) — real Windows DIB ingest/emit: 1/4/8-bit
  paletted, 16/24/32-bit, BI_BITFIELDS masks, RLE8/RLE4, top-down and
  bottom-up; encode is 24-bit or 8-bit paletted (optional RLE8).
- GIF (decode-only, functions/gif.py) — real GIF87a/89a ingest: LZW,
  global/local palettes, interlace, GCE transparency.  No ``fmt="gif"``
  encode: emitting GIF requires palette quantization of RGB input, a lossy
  decision the engine leaves to the user.

``generate_pixels`` is the shared deterministic pseudo-photo generator
(pure integer function of the image index — FIXTURES.md §1), used both when
building fixture tables and as the *reference decode* that tests compare
against (the allclose/PSNR invariant).
"""

from __future__ import annotations

import struct

import numpy as np

from demeter_ray.functions import bmp as _bmp
from demeter_ray.functions import gif as _gif
from demeter_ray.functions import jpeg as _jpeg
from demeter_ray.functions import png as _png

MAGIC_RAW = b"DRAW"
MAGIC_LOSSY = b"DJPG"
_HDR_FMT = "<4sIIIB"  # magic, w, h, channels, q
_HDR_SIZE = struct.calcsize(_HDR_FMT)


def generate_pixels(index: int, w: int, h: int, channels: int = 3) -> np.ndarray:
    """Deterministic pseudo-photo for image ``index``: gradient + hash noise.
    Pure integer arithmetic (reproducible in SQL for the oracle check)."""
    x = np.arange(w, dtype=np.int64)[None, :, None]
    y = np.arange(h, dtype=np.int64)[:, None, None]
    c = np.arange(channels, dtype=np.int64)[None, None, :]
    v = (index * 97 + x * 31 + y * 17 + c * 11) % 256
    return v.astype(np.uint8)


def encode(pixels: np.ndarray, fmt: str, q: int = 4) -> bytes:
    """Encode HxWxC uint8 pixels.  fmt 'png' -> real PNG (lossless), 'jpeg'
    -> DJPG quantized with step q, 'draw' -> raw fixed-stride frame."""
    assert pixels.dtype == np.uint8 and pixels.ndim == 3
    h, w, channels = pixels.shape
    if fmt == "png":
        return _png.encode_png(pixels)
    if fmt == "jpeg":
        return _jpeg.encode_jpeg(pixels)
    if fmt == "draw":
        return struct.pack(_HDR_FMT, MAGIC_RAW, w, h, channels, 0) + pixels.tobytes()
    if fmt == "djpg":
        quant = (pixels.astype(np.int64) // q).astype(np.uint8)
        return struct.pack(_HDR_FMT, MAGIC_LOSSY, w, h, channels, q) + quant.tobytes()
    raise ValueError(f"unknown fmt {fmt!r}")


def decode(buf: bytes) -> np.ndarray:
    """Decode PNG/DRAW/DJPG bytes -> HxWxC uint8 array (magic dispatch;
    zero-copy frombuffer for DRAW)."""
    if bytes(buf[:8]) == _png.PNG_SIG:
        return _png.decode_png(buf)
    if bytes(buf[:2]) == _jpeg.SOI:
        return _jpeg.decode_jpeg(buf)
    if bytes(buf[:6]) in _gif.GIF_MAGICS:
        return _gif.decode_gif(buf)
    if bytes(buf[:2]) == _bmp.BMP_MAGIC:
        return _bmp.decode_bmp(buf)
    magic, w, h, channels, q = struct.unpack_from(_HDR_FMT, buf, 0)
    body = np.frombuffer(buf, dtype=np.uint8, offset=_HDR_SIZE)
    body = body.reshape(h, w, channels)
    if magic == MAGIC_RAW:
        return body
    if magic == MAGIC_LOSSY:
        # midpoint reconstruction: error <= q/2 -> PSNR >= 20*log10(255/(q/2))
        recon = body.astype(np.int64) * q + q // 2
        return np.clip(recon, 0, 255).astype(np.uint8)
    raise ValueError("bad magic")


def header_dims(buf: bytes) -> tuple[int, int]:
    """(w, h) from a PNG/DRAW/DJPG header without decoding the body."""
    if bytes(buf[:8]) == _png.PNG_SIG:
        return _png.png_dims(buf)
    if bytes(buf[:2]) == _jpeg.SOI:
        return _jpeg.jpeg_dims(buf)
    if bytes(buf[:6]) in _gif.GIF_MAGICS:
        return _gif.gif_dims(buf)
    if bytes(buf[:2]) == _bmp.BMP_MAGIC:
        return _bmp.bmp_dims(buf)
    _magic, w, h, _channels, _q = struct.unpack_from(_HDR_FMT, buf, 0)
    return w, h


def generate_pixels_batch(indices: np.ndarray, w: int, h: int, channels: int = 3) -> np.ndarray:
    """Vectorized ``generate_pixels`` for N same-sized images -> (N,h,w,C).

    uint8 addition wraps mod 256, so summing the per-term residues in uint8
    equals the int64 ``(i*97 + x*31 + y*17 + c*11) % 256`` — no 8-byte
    temporaries, ~100x faster on big batches."""
    i = ((np.asarray(indices, dtype=np.int64) * 97) % 256).astype(np.uint8)
    x = ((np.arange(w, dtype=np.int64) * 31) % 256).astype(np.uint8)
    y = ((np.arange(h, dtype=np.int64) * 17) % 256).astype(np.uint8)
    c = ((np.arange(channels, dtype=np.int64) * 11) % 256).astype(np.uint8)
    out = i[:, None, None, None] + y[None, :, None, None]
    out = out + x[None, None, :, None]
    return out + c[None, None, None, :]


def encode_batch(pixels4d: np.ndarray, fmt: str, q: int = 4) -> list[bytes]:
    """Vectorized encode of (N,h,w,C) uint8 -> list of blobs (filtering /
    quantization run as whole-stack array ops)."""
    n, h, w, channels = pixels4d.shape
    if fmt == "png":
        return _png.encode_png_batch(pixels4d)
    if fmt == "jpeg":
        return _jpeg.encode_jpeg_batch(pixels4d)
    if fmt == "draw":
        hdr = struct.pack(_HDR_FMT, MAGIC_RAW, w, h, channels, 0)
        body = pixels4d
    elif fmt == "djpg":
        hdr = struct.pack(_HDR_FMT, MAGIC_LOSSY, w, h, channels, q)
        body = (pixels4d.astype(np.int64) // q).astype(np.uint8)
    else:
        raise ValueError(f"unknown fmt {fmt!r}")
    if n == 0:
        return []
    flat = body.reshape(n, -1)
    return [hdr + flat[k].tobytes() for k in range(n)]


def decode_batch(blobs, w: int, h: int, channels: int = 3) -> np.ndarray:
    """Vectorized decode of N same-shaped blobs -> (N,h,w,C) uint8.
    All blobs must share (w,h,channels) and codec; q may vary per row."""
    n = len(blobs)
    out = np.empty((n, h, w, channels), dtype=np.uint8)
    for k, buf in enumerate(blobs):
        if bytes(buf[:8]) == _png.PNG_SIG:
            out[k] = _png.decode_png(buf)
            continue
        if bytes(buf[:2]) == _jpeg.SOI:
            out[k] = _jpeg.decode_jpeg(buf)
            continue
        magic, bw, bh, bc, q = struct.unpack_from(_HDR_FMT, buf, 0)
        body = np.frombuffer(buf, dtype=np.uint8, offset=_HDR_SIZE).reshape(bh, bw, bc)
        if magic == MAGIC_LOSSY:
            out[k] = np.clip(body.astype(np.int64) * q + q // 2, 0, 255).astype(np.uint8)
        else:
            out[k] = body
    return out


def phash64_batch(pixels4d: np.ndarray) -> np.ndarray:
    """Vectorized perceptual hash over (N,h,w,C) -> int64 array.  Identical
    bit layout to ``phash64``."""
    gray = pixels4d.astype(np.float64).mean(axis=3)
    n, h, w = gray.shape
    bh, bw = h // 8, w // 8
    blocks = gray[:, : bh * 8, : bw * 8].reshape(n, 8, bh, 8, bw).mean(axis=(2, 4))
    bits = blocks > blocks.mean(axis=(1, 2))[:, None, None]
    packed = np.packbits(bits.reshape(n, 64), axis=1)
    return np.frombuffer(packed.tobytes(), dtype=">i8").astype(np.int64)


def dhash56_batch(pixels4d: np.ndarray) -> np.ndarray:
    """Integer-exact difference hash over (N,16,16,3) -> int64 (56 bits).

    Luma = 299R + 587G + 114B (integer, no division), 2x2 block SUMS
    (8x8 grid), bit(by,bx) = block(bx+1,by) > block(bx,by) packed at
    position by*7+bx.  Every step is integer arithmetic so a DuckDB oracle
    can recompute the hash bit-for-bit (pipelines/oracle_window.py)."""
    assert pixels4d.shape[1:] == (16, 16, 3), pixels4d.shape
    w = np.array([299, 587, 114], dtype=np.int64)
    lum = (pixels4d.astype(np.int64) * w).sum(axis=3)  # (N,16,16) y,x
    blocks = lum.reshape(-1, 8, 2, 8, 2).sum(axis=(2, 4))  # (N,by,bx)
    bits = blocks[:, :, 1:] > blocks[:, :, :-1]  # (N,8,7)
    pos = (np.arange(8)[:, None] * 7 + np.arange(7)[None, :]).astype(np.uint64)
    vals = (bits.astype(np.uint64) << pos[None]).sum(axis=(1, 2))
    return vals.astype(np.int64)


def psnr_batch(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Per-row PSNR over (N,h,w,C) pairs; inf where identical."""
    diff = a.astype(np.float64) - b.astype(np.float64)
    mse = (diff * diff).mean(axis=(1, 2, 3))
    with np.errstate(divide="ignore"):
        return 10.0 * np.log10(255.0 * 255.0 / mse)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 arrays."""
    diff = a.astype(np.float64) - b.astype(np.float64)
    mse = float(np.mean(diff * diff))
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)


def phash64(pixels: np.ndarray) -> int:
    """64-bit mean-threshold perceptual hash: grayscale -> 8x8 block means ->
    bit per block (above/below global mean).  Deterministic, pure numpy."""
    gray = pixels.astype(np.float64).mean(axis=2)
    h, w = gray.shape
    bh, bw = h // 8, w // 8
    blocks = gray[: bh * 8, : bw * 8].reshape(8, bh, 8, bw).mean(axis=(1, 3))
    bits = (blocks > blocks.mean()).ravel()
    packed = np.packbits(bits)  # big-endian bit order == the former shift loop
    return int(np.frombuffer(packed.tobytes(), dtype=">i8")[0])


def phash64_int_batch(pixels4d: np.ndarray) -> np.ndarray:
    """Integer-exact perceptual hash over (N,h,w,C) -> int64.

    Same bit layout as ``phash64_batch`` but the block-vs-grand-mean compare
    runs in exact rational form (block_channel_sum * 64 > total_channel_sum),
    so ties resolve deterministically to 0 instead of depending on float
    division rounding — the bit-stable variant for cross-engine parity
    (the SQL oracles use exactly this form)."""
    n, h, w, c = pixels4d.shape
    bh, bw = h // 8, w // 8
    s = (
        pixels4d[:, : bh * 8, : bw * 8, :]
        .astype(np.int64)
        .reshape(n, 8, bh, 8, bw, c)
        .sum(axis=(2, 4, 5))
    )  # (N, 8, 8) integer block channel-sums
    t = s.sum(axis=(1, 2))  # (N,) grand sums
    bits = s * 64 > t[:, None, None]
    packed = np.packbits(bits.reshape(n, 64), axis=1)
    return np.frombuffer(packed.tobytes(), dtype=">i8").astype(np.int64)
