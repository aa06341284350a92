"""GIF decoder (GIF87a/GIF89a) in pure numpy + stdlib.

Completes the crawled-corpus codec trio (PNG + JPEG + GIF): a training-data
ingest over web images hits GIF constantly, and the reference delegates it
to PIL (/root/reference/demeter/raster/__init__.py:36-47 reads imagery via
rasterio/PIL).  This is the from-scratch equivalent: LZW with variable code
width (LSB-first packing, dictionary reset on CLEAR, 12-bit cap), global and
local color tables, the 4-pass row interlace, and GIF89a graphic-control
transparency (transparent index -> RGBA).

Scope (fail-loud outside it): decode only — GIF ENCODING needs palette
quantization of RGB input, which is a lossy design decision the engine
doesn't make for users; `decode_gif` renders the FIRST frame onto the
logical screen (later frames need disposal-method compositing; frame counts
are still surfaced via `gif_frame_count` so callers can route animated
inputs explicitly).
"""

from __future__ import annotations

import struct

import numpy as np

GIF_MAGICS = (b"GIF87a", b"GIF89a")


def _skip_sub_blocks(buf: bytes, pos: int) -> int:
    """Advance past a sub-block chain (returns offset after the 0 terminator)."""
    n = len(buf)
    while pos < n:
        ln = buf[pos]
        pos += 1 + ln
        if ln == 0:
            return pos
    raise ValueError("truncated GIF sub-block chain")


def _collect_sub_blocks(buf: bytes, pos: int) -> tuple[bytes, int]:
    parts = []
    n = len(buf)
    while pos < n:
        ln = buf[pos]
        pos += 1
        if ln == 0:
            return b"".join(parts), pos
        parts.append(buf[pos : pos + ln])
        pos += ln
    raise ValueError("truncated GIF sub-block chain")


def _lzw_decode(data: bytes, min_code_size: int, expected: int) -> np.ndarray:
    """GIF-flavor LZW: LSB-first variable-width codes, CLEAR resets the
    dictionary, width grows at 2^width entries up to 12 bits."""
    if not 2 <= min_code_size <= 11:
        raise ValueError(f"bad GIF LZW minimum code size {min_code_size}")
    clear = 1 << min_code_size
    end = clear + 1
    # dictionary as prefix links: entry -> (prefix entry, final byte)
    prefix = np.full(4096, -1, dtype=np.int32)
    suffix = np.zeros(4096, dtype=np.uint8)
    suffix[:clear] = np.arange(clear, dtype=np.uint8)

    out = np.empty(expected, dtype=np.uint8)
    n_out = 0
    width = min_code_size + 1
    next_code = end + 1
    prev = -1
    acc = 0
    nbits = 0
    stack = bytearray()
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                width = min_code_size + 1
                next_code = end + 1
                prev = -1
                continue
            if code == end:
                if n_out != expected:
                    raise ValueError("GIF LZW ended before raster complete")
                return out
            if prev < 0:
                if code >= clear:
                    raise ValueError("bad GIF LZW start code")
                out[n_out] = code
                n_out += 1
                prev = code
                continue
            if code < next_code:
                cur = code
            elif code == next_code:
                cur = prev  # KwKwK case: emit prev + first(prev)
            else:
                raise ValueError("GIF LZW code out of range")
            # expand cur via prefix links (reverse order)
            stack.clear()
            c = cur
            while c >= 0:
                stack.append(suffix[c])
                c = prefix[c]
            first = stack[-1]
            if code == next_code:
                stack.insert(0, first)
            ln = len(stack)
            if n_out + ln > expected:
                raise ValueError("GIF LZW produced too many pixels")
            out[n_out : n_out + ln] = np.frombuffer(bytes(stack[::-1]), np.uint8)
            n_out += ln
            if next_code < 4096:
                prefix[next_code] = prev
                suffix[next_code] = first
                next_code += 1
                if next_code == (1 << width) and width < 12:
                    width += 1
            prev = code
    if n_out != expected:
        raise ValueError("truncated GIF LZW stream")
    return out


def gif_dims(buf: bytes) -> tuple[int, int]:
    """(w, h) of the logical screen from the header."""
    if bytes(buf[:6]) not in GIF_MAGICS:
        raise ValueError("not a GIF")
    w, h = struct.unpack_from("<HH", buf, 6)
    return w, h


def _walk(buf: bytes):
    """Yield (kind, payload) for each block: ('gce', transparent_index|None)
    and ('image', (left, top, w, h, interlaced, palette, lzw_min, data))."""
    if bytes(buf[:6]) not in GIF_MAGICS:
        raise ValueError("not a GIF")
    sw, sh, packed, _bg, _aspect = struct.unpack_from("<HHBBB", buf, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        ngct = 2 << (packed & 0x07)
        gct = np.frombuffer(buf[pos : pos + 3 * ngct], np.uint8).reshape(-1, 3)
        pos += 3 * ngct
    yield ("screen", (sw, sh, gct))
    n = len(buf)
    while pos < n:
        b = buf[pos]
        pos += 1
        if b == 0x3B:  # trailer
            return
        if b == 0x21:  # extension
            label = buf[pos]
            pos += 1
            if label == 0xF9:  # graphic control
                data, pos = _collect_sub_blocks(buf, pos)
                if len(data) < 4:
                    raise ValueError("bad GIF graphic control extension")
                has_t = data[0] & 0x01
                yield ("gce", data[3] if has_t else None)
            else:  # comment / plain text / application: skip
                pos = _skip_sub_blocks(buf, pos)
        elif b == 0x2C:  # image descriptor
            left, top, w, h, ipacked = struct.unpack_from("<HHHHB", buf, pos)
            pos += 9
            lct = None
            if ipacked & 0x80:
                nlct = 2 << (ipacked & 0x07)
                lct = np.frombuffer(buf[pos : pos + 3 * nlct], np.uint8).reshape(-1, 3)
                pos += 3 * nlct
            lzw_min = buf[pos]
            pos += 1
            data, pos = _collect_sub_blocks(buf, pos)
            yield ("image", (left, top, w, h, bool(ipacked & 0x40), lct, lzw_min, data))
        else:
            raise ValueError(f"unknown GIF block 0x{b:02x}")
    raise ValueError("GIF missing trailer")


def gif_frame_count(buf: bytes) -> int:
    """Number of image frames (lets callers route animated GIFs explicitly)."""
    return sum(1 for kind, _ in _walk(buf) if kind == "image")


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(buf: bytes) -> np.ndarray:
    """GIF bytes -> HxWx3 uint8 (HxWx4 when the first frame declares a
    transparent index).  Renders the FIRST frame at its offset on the
    logical screen; uncovered screen area is transparent (alpha 0, forcing
    the RGBA shape) so no background-color guess is baked into pixels."""
    screen = None
    transparent = None
    for kind, payload in _walk(buf):
        if kind == "screen":
            screen = payload
        elif kind == "gce":
            transparent = payload
        elif kind == "image":
            left, top, w, h, interlaced, lct, lzw_min, data = payload
            sw, sh, gct = screen
            pal = lct if lct is not None else gct
            if pal is None:
                raise ValueError("GIF image has no color table")
            idx = _lzw_decode(data, lzw_min, w * h).reshape(h, w)
            if int(idx.max(initial=0)) >= len(pal):
                raise ValueError("GIF color index out of range")
            if interlaced:
                rows = np.concatenate(
                    [np.arange(start, h, step) for start, step in _INTERLACE_PASSES]
                )
                deinter = np.empty_like(idx)
                deinter[rows] = idx
                idx = deinter
            rgb = pal[idx]
            alpha = np.full((h, w), 255, np.uint8)
            if transparent is not None:
                alpha[idx == transparent] = 0
            full_cover = left == 0 and top == 0 and w == sw and h == sh
            if transparent is None and full_cover:
                return rgb
            canvas = np.zeros((sh, sw, 4), np.uint8)
            canvas[top : top + h, left : left + w, :3] = rgb
            canvas[top : top + h, left : left + w, 3] = alpha
            return canvas
    raise ValueError("GIF contains no image frame")
