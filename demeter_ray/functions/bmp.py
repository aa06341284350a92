"""BMP (Windows DIB) codec in pure numpy + stdlib.

Rounds out the crawled-corpus image ingest matrix (PNG + JPEG + GIF +
BMP): uncompressed BMP is still common in scraped datasets and scientific
dumps, and the reference delegates it to PIL/rasterio
(/root/reference/demeter/raster/__init__.py:36-47).  This is the
from-scratch equivalent, covering the layouts real encoders emit:

decode (``decode_bmp``):
- BITMAPINFOHEADER (40) and the V2/V3/V4/V5 extensions (52/56/108/124);
- 1/4/8-bit paletted (BGRX palette quads), 16-bit (X555 default or
  BI_BITFIELDS masks, e.g. 565), 24-bit BGR, 32-bit BGRX / BGRA via
  BI_BITFIELDS with a non-zero alpha mask;
- BI_RLE8 / BI_RLE4 compression: encoded runs, absolute blocks (word
  aligned), end-of-line, end-of-bitmap, and delta escapes (skipped pixels
  render as palette index 0, the common GDI surface-clear convention);
- bottom-up (positive height) and top-down (negative height) row order;
  4-byte row stride padding.

encode (``encode_bmp``): 24-bit BI_RGB, or 8-bit paletted with optional
RLE8 compression, bottom-up — the interchange layouts.

Fail-loud outside this scope (BI_JPEG/BI_PNG embeddings, huffman 1-D).
Returns (h, w, 3) uint8 RGB, or (h, w, 4) RGBA when an alpha channel is
actually present (32-bit bitfields with a non-zero alpha mask).
"""

from __future__ import annotations

import struct

import numpy as np

BMP_MAGIC = b"BM"

_BI_RGB, _BI_RLE8, _BI_RLE4, _BI_BITFIELDS = 0, 1, 2, 3
_INFO_SIZES = (40, 52, 56, 64, 108, 124)


def _mask_shift(mask: int) -> tuple[int, int]:
    """(right shift, max value) for a contiguous channel bit mask."""
    if mask == 0:
        return 0, 0
    shift = (mask & -mask).bit_length() - 1
    return shift, mask >> shift


def _parse_header(buf: bytes):
    if len(buf) < 54 or buf[:2] != BMP_MAGIC:
        raise ValueError("not a BMP: missing BM magic / truncated header")
    data_off, = struct.unpack_from("<I", buf, 10)
    hdr_size, = struct.unpack_from("<I", buf, 14)
    if hdr_size not in _INFO_SIZES:
        raise ValueError(f"unsupported BMP header size {hdr_size} "
                         "(BITMAPCOREHEADER / OS2 variants out of scope)")
    w, h_raw = struct.unpack_from("<ii", buf, 18)
    planes, bpp = struct.unpack_from("<HH", buf, 26)
    comp, = struct.unpack_from("<I", buf, 30)
    n_colors, = struct.unpack_from("<I", buf, 46)
    if planes != 1:
        raise ValueError(f"bad BMP planes {planes}")
    if w <= 0 or h_raw == 0:
        raise ValueError(f"bad BMP dimensions {w}x{h_raw}")
    top_down = h_raw < 0
    h = -h_raw if top_down else h_raw
    if bpp not in (1, 4, 8, 16, 24, 32):
        raise ValueError(f"unsupported BMP bit depth {bpp}")
    if comp not in (_BI_RGB, _BI_RLE8, _BI_RLE4, _BI_BITFIELDS):
        raise ValueError(f"unsupported BMP compression {comp} "
                         "(BI_JPEG/BI_PNG embeddings out of scope)")
    # channel masks: in-header for V4+/BITFIELDS, else appended after a
    # 40-byte header when comp == BI_BITFIELDS
    masks = (0, 0, 0, 0)
    pal_off = 14 + hdr_size
    if comp == _BI_BITFIELDS:
        if hdr_size >= 52:
            masks = struct.unpack_from("<III", buf, 54) + ((
                struct.unpack_from("<I", buf, 66)[0],) if hdr_size >= 56 else (0,))
        else:
            masks = struct.unpack_from("<III", buf, 54) + (0,)
            pal_off += 12
    elif hdr_size >= 56:
        masks = struct.unpack_from("<IIII", buf, 54)
    return data_off, w, h, top_down, bpp, comp, n_colors, masks, pal_off


def bmp_dims(buf: bytes) -> tuple[int, int]:
    """(w, h) from the header without decoding pixel data."""
    _off, w, h, _td, _bpp, _c, _n, _m, _p = _parse_header(buf)
    return w, h


def _palette(buf: bytes, pal_off: int, bpp: int, n_colors: int) -> np.ndarray:
    n = n_colors if n_colors else (1 << bpp)
    if n > (1 << bpp):
        raise ValueError(f"palette count {n} exceeds 2^{bpp}")
    quads = np.frombuffer(buf, np.uint8, count=4 * n, offset=pal_off)
    return quads.reshape(n, 4)[:, [2, 1, 0]].copy()  # BGRX -> RGB


def _unpack_indexed(rows: np.ndarray, w: int, bpp: int) -> np.ndarray:
    """(h, stride_bytes) row bytes -> (h, w) palette indices (MSB first)."""
    if bpp == 8:
        return rows[:, :w]
    bits = np.unpackbits(rows, axis=1)
    if bpp == 1:
        return bits[:, :w]
    # bpp == 4: regroup each nibble
    h = rows.shape[0]
    nib = bits.reshape(h, -1, 4)
    vals = (nib << np.array([3, 2, 1, 0], np.uint8)).sum(axis=2, dtype=np.uint8)
    return vals[:, :w]


def _decode_rle(body: bytes, w: int, h: int, four_bit: bool) -> np.ndarray:
    """BI_RLE8 / BI_RLE4 -> (h, w) palette indices in STORAGE row order
    (row 0 = bottom row of the image; RLE bitmaps are always bottom-up)."""
    out = np.zeros((h, w), np.uint8)
    x = y = pos = 0
    n = len(body)
    while pos + 1 < n:
        cnt, val = body[pos], body[pos + 1]
        pos += 2
        if cnt > 0:  # encoded run
            if y >= h:
                raise ValueError("RLE run past bitmap end")
            m = min(cnt, w - x)
            if four_bit:
                pair = np.array([val >> 4, val & 0x0F], np.uint8)
                out[y, x : x + m] = np.resize(pair, m)
            else:
                out[y, x : x + m] = val
            x += cnt
        elif val == 0:  # end of line
            x, y = 0, y + 1
        elif val == 1:  # end of bitmap
            return out
        elif val == 2:  # delta: skip (dx, dy); skipped cells stay index 0
            if pos + 2 > n:
                raise ValueError("truncated RLE delta")
            x += body[pos]
            y += body[pos + 1]
            pos += 2
        else:  # absolute block of `val` pixels, word-aligned
            if y >= h:
                raise ValueError("RLE absolute block past bitmap end")
            nbytes = (val + 1) // 2 if four_bit else val
            nbytes += nbytes % 2  # pad to word boundary
            chunk = body[pos : pos + nbytes]
            if len(chunk) < nbytes:
                raise ValueError("truncated RLE absolute block")
            pos += nbytes
            raw = np.frombuffer(chunk, np.uint8)
            if four_bit:
                pix = np.empty(2 * len(raw), np.uint8)
                pix[0::2] = raw >> 4
                pix[1::2] = raw & 0x0F
                pix = pix[:val]
            else:
                pix = raw[:val]
            m = min(val, w - x)
            out[y, x : x + m] = pix[:m]
            x += val
    raise ValueError("RLE stream missing end-of-bitmap escape")


def decode_bmp(buf: bytes) -> np.ndarray:
    """BMP bytes -> (h, w, 3) uint8 RGB, or (h, w, 4) RGBA when a 32-bit
    bitfields alpha mask is present."""
    (data_off, w, h, top_down, bpp, comp,
     n_colors, masks, pal_off) = _parse_header(buf)

    if comp in (_BI_RLE8, _BI_RLE4):
        if (comp == _BI_RLE8) != (bpp == 8) and (comp == _BI_RLE4) != (bpp == 4):
            raise ValueError(f"RLE compression {comp} with bpp {bpp}")
        if top_down:
            raise ValueError("RLE BMPs are bottom-up by spec")
        pal = _palette(buf, pal_off, bpp, n_colors)
        idx = _decode_rle(buf[data_off:], w, h, four_bit=(comp == _BI_RLE4))
        idx = idx[::-1]  # storage bottom-up -> image top-down
        if idx.max(initial=0) >= len(pal):
            raise ValueError("RLE palette index out of range")
        return pal[idx]

    stride = ((w * bpp + 31) // 32) * 4
    need = stride * h
    raw = np.frombuffer(buf, np.uint8, count=need, offset=data_off)
    rows = raw.reshape(h, stride)
    if not top_down:
        rows = rows[::-1]

    if bpp in (1, 4, 8):
        pal = _palette(buf, pal_off, bpp, n_colors)
        idx = _unpack_indexed(rows, w, bpp)
        if idx.max(initial=0) >= len(pal):
            raise ValueError("palette index out of range")
        return pal[idx]

    if bpp == 24:
        px = rows[:, : 3 * w].reshape(h, w, 3)
        return px[:, :, ::-1].copy()  # BGR -> RGB

    # 16 / 32 bit: packed little-endian words + channel masks
    if bpp == 16:
        words = rows[:, : 2 * w].copy().view("<u2").reshape(h, w).astype(np.uint32)
        r_m, g_m, b_m, a_m = masks if comp == _BI_BITFIELDS else (
            0x7C00, 0x03E0, 0x001F, 0)
    else:
        words = rows[:, : 4 * w].copy().view("<u4").reshape(h, w)
        r_m, g_m, b_m, a_m = masks if comp == _BI_BITFIELDS else (
            0x00FF0000, 0x0000FF00, 0x000000FF, 0)
    chans = []
    for m in ((r_m, g_m, b_m, a_m) if a_m else (r_m, g_m, b_m)):
        shift, top = _mask_shift(m)
        if top == 0:
            raise ValueError(f"zero channel mask in {masks}")
        v = (words >> shift) & top
        chans.append(v if top == 255 else (v * 255) // top)
    return np.stack(chans, axis=2).astype(np.uint8)


def _rle8_encode_rows(idx: np.ndarray) -> bytes:
    """(h, w) indices in IMAGE order -> RLE8 stream (bottom-up storage)."""
    parts = bytearray()
    for row in idx[::-1]:
        j, w = 0, len(row)
        while j < w:
            run = 1
            while j + run < w and row[j + run] == row[j] and run < 255:
                run += 1
            if run >= 2:
                parts += bytes((run, int(row[j])))
                j += run
            else:
                # literal stretch: extend until a run of >= 3 starts
                k = j + 1
                while k < w and k - j < 255:
                    if k + 2 < w and row[k] == row[k + 1] == row[k + 2]:
                        break
                    k += 1
                lit = row[j:k]
                if len(lit) < 3:  # absolute mode needs >= 3; emit singles
                    for v in lit:
                        parts += bytes((1, int(v)))
                else:
                    parts += bytes((0, len(lit))) + lit.tobytes()
                    if len(lit) % 2:
                        parts += b"\x00"
                j = k
        parts += b"\x00\x00"  # end of line
    parts += b"\x00\x01"  # end of bitmap
    return bytes(parts)


def encode_bmp(img: np.ndarray, palette: np.ndarray | None = None,
               rle: bool = False) -> bytes:
    """Encode to BMP bytes.

    - (h, w, 3) uint8 RGB -> 24-bit BI_RGB bottom-up;
    - (h, w) uint8 indices + (n, 3) ``palette`` -> 8-bit paletted,
      optionally BI_RLE8-compressed (``rle=True``).
    """
    img = np.ascontiguousarray(img)
    if img.dtype != np.uint8:
        raise ValueError(f"BMP encode expects uint8, got {img.dtype}")
    if img.ndim == 2:
        if palette is None:
            raise ValueError("indexed encode requires a palette")
        pal = np.ascontiguousarray(palette, np.uint8)
        if pal.ndim != 2 or pal.shape[1] != 3 or not 1 <= len(pal) <= 256:
            raise ValueError(f"palette must be (n<=256, 3), got {pal.shape}")
        if img.max(initial=0) >= len(pal):
            raise ValueError("index exceeds palette")
        h, w = img.shape
        quads = np.zeros((len(pal), 4), np.uint8)
        quads[:, :3] = pal[:, ::-1]  # RGB -> BGRX
        if rle:
            body = _rle8_encode_rows(img)
            comp, img_size = _BI_RLE8, len(body)
        else:
            stride = (w + 3) & ~3
            rows = np.zeros((h, stride), np.uint8)
            rows[:, :w] = img[::-1]
            body = rows.tobytes()
            comp, img_size = _BI_RGB, len(body)
        bpp, pal_bytes, n_colors = 8, quads.tobytes(), len(pal)
    elif img.ndim == 3 and img.shape[2] == 3:
        h, w = img.shape[:2]
        stride = ((3 * w + 3) & ~3)
        rows = np.zeros((h, stride), np.uint8)
        rows[:, : 3 * w] = img[::-1, :, ::-1].reshape(h, 3 * w)
        body = rows.tobytes()
        comp, img_size, bpp, pal_bytes, n_colors = _BI_RGB, len(body), 24, b"", 0
    else:
        raise ValueError(f"BMP encode expects (h,w,3) or indexed (h,w), "
                         f"got {img.shape}")

    data_off = 14 + 40 + len(pal_bytes)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, bpp, comp, img_size,
                       2835, 2835, n_colors, 0)
    head = struct.pack("<2sIHHI", BMP_MAGIC, data_off + len(body), 0, 0, data_off)
    return head + info + pal_bytes + body
