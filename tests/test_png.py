"""Real PNG codec (functions/png.py): spec-structure, filters, dispatch.

The decoder is validated against *independently constructed* bitstreams —
a hand-filtered mixed-filter scanline stream (including Average and Paeth,
which our encoder never emits) and a hand-built stored-deflate IDAT that
bypasses zlib.compress entirely — not just against our own encoder.
"""

import struct
import zlib

import numpy as np
import pytest

from demeter_ray.functions import codec, png


def _chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def test_roundtrip_all_shapes_and_filters():
    rng = np.random.default_rng(7)
    for shape in [(1, 1, 1), (5, 3, 3), (48, 32, 3), (17, 29, 4), (64, 64, 1), (2, 2, 2)]:
        px = rng.integers(0, 256, size=shape, dtype=np.uint8)
        for ft in (0, 1, 2):
            buf = png.encode_png(px, filter_type=ft)
            assert buf[:8] == png.PNG_SIG
            out = png.decode_png(buf)
            assert out.shape == px.shape and np.array_equal(out, px)
            assert png.png_dims(buf) == (shape[1], shape[0])
            assert png.png_frame_size(buf) == len(buf)


def test_decode_mixed_filters_including_average_and_paeth():
    # Hand-filter a 6x5 RGB image with filter types [0,1,2,3,4,3] using an
    # independent scalar reference implementation of the PNG filter spec.
    rng = np.random.default_rng(11)
    h, w, c = 6, 5, 3
    raw = rng.integers(0, 256, size=(h, w * c), dtype=np.uint8)

    def paeth(a, b, cc):
        p = a + b - cc
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
        return a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)

    scan = []
    prev = np.zeros(w * c, np.int64)
    for y, f in enumerate([0, 1, 2, 3, 4, 3]):
        r = raw[y].astype(np.int64)
        row = np.zeros(w * c, np.int64)
        for x in range(w * c):
            a = r[x - c] if x >= c else 0
            b = prev[x]
            cc = prev[x - c] if x >= c else 0
            pred = [0, a, b, (a + b) // 2, paeth(a, b, cc)][f]
            row[x] = (r[x] - pred) % 256
        scan.append(bytes([f]) + bytes(row.astype(np.uint8)))
        prev = r
    buf = (
        png.PNG_SIG
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + _chunk(b"IDAT", zlib.compress(b"".join(scan)))
        + _chunk(b"IEND", b"")
    )
    assert np.array_equal(png.decode_png(buf).reshape(h, w * c), raw)


def test_decode_hand_built_stored_deflate():
    # IDAT built by hand as a stored (uncompressed) deflate block — the
    # decoder must read a bitstream our encoder could never have produced.
    data = b"\x00" + bytes(range(15))  # filter 0 + one 5px RGB row
    stored = (
        b"\x78\x01\x01"
        + struct.pack("<HH", len(data), 0xFFFF ^ len(data))
        + data
        + struct.pack(">I", zlib.adler32(data))
    )
    buf = (
        png.PNG_SIG
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 5, 1, 8, 2, 0, 0, 0))
        + _chunk(b"IDAT", stored)
        + _chunk(b"IEND", b"")
    )
    assert np.array_equal(png.decode_png(buf).ravel(), np.arange(15, dtype=np.uint8))


def test_crc_and_structure_errors():
    px = codec.generate_pixels(3, 16, 16)
    buf = bytearray(png.encode_png(px))
    buf[30] ^= 0xFF  # corrupt inside IDAT
    with pytest.raises(ValueError, match="CRC"):
        png.decode_png(bytes(buf))
    with pytest.raises(ValueError, match="signature"):
        png.decode_png(b"nope" + bytes(buf))
    # invalid interlace method, paletted-without-PLTE + 16-bit fail loudly
    for ihdr, msg in [
        (struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 2), "interlace"),
        (struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0), "PLTE"),
        (struct.pack(">IIBBBBB", 2, 2, 4, 2, 0, 0, 0), "bit depth"),
    ]:
        bad = (
            png.PNG_SIG
            + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(b"\x00" * 13))
            + _chunk(b"IEND", b"")
        )
        with pytest.raises(ValueError, match=msg):
            png.decode_png(bad)


def test_ancillary_chunks_skipped():
    px = codec.generate_pixels(5, 8, 8)
    buf = png.encode_png(px)
    # splice a tEXt chunk between IHDR and IDAT
    ihdr_end = 8 + 12 + 13
    spliced = buf[:ihdr_end] + _chunk(b"tEXt", b"Comment\x00hi") + buf[ihdr_end:]
    assert np.array_equal(png.decode_png(spliced), px)


def test_codec_dispatch_and_batches():
    px4 = codec.generate_pixels_batch(np.arange(4), 16, 16)
    blobs = codec.encode_batch(px4, "png")
    assert all(b[:8] == png.PNG_SIG for b in blobs)
    assert np.array_equal(codec.decode_batch(blobs, 16, 16), px4)
    assert codec.header_dims(blobs[0]) == (16, 16)
    assert codec.encode_batch(np.zeros((0, 16, 16, 3), np.uint8), "png") == []
    # draw stays the fixed-stride raw format
    d = codec.encode(px4[0], "draw")
    assert d[:4] == codec.MAGIC_RAW
    assert np.array_equal(codec.decode(d), px4[0])
    # mixed-format batch decodes per-blob
    mixed = [blobs[0], codec.encode(px4[1], "draw"), blobs[2], codec.encode(px4[3], "jpeg")]
    out = codec.decode_batch(mixed, 16, 16)
    assert np.array_equal(out[0], px4[0]) and np.array_equal(out[1], px4[1])
    assert codec.psnr(out[3], px4[3]) >= 40.0


def test_video_container_with_real_png_frames():
    from demeter_ray.stages.images import sample_frames

    frames_in = [codec.generate_pixels(i, 8, 8) for i in range(6)]
    blob = b"".join(codec.encode(f, "png") for f in frames_in)
    sampled = sample_frames(blob, every=2)
    assert len(sampled) == 3
    for j, f in enumerate(sampled):
        assert np.array_equal(f, frames_in[2 * j])


def _png(ihdr_fields, chunks):
    buf = png.PNG_SIG + _chunk(b"IHDR", struct.pack(">IIBBBBB", *ihdr_fields))
    for typ, data in chunks:
        buf += _chunk(typ, data)
    return buf + _chunk(b"IEND", b"")


def test_decode_paletted_8bit():
    rng = np.random.default_rng(21)
    w, h = 5, 4
    pal = rng.integers(0, 256, (7, 3), dtype=np.uint8)
    idx = rng.integers(0, 7, (h, w), dtype=np.uint8)
    scan = b"".join(b"\x00" + idx[y].tobytes() for y in range(h))
    buf = _png((w, h, 8, 3, 0, 0, 0),
               [(b"PLTE", pal.tobytes()), (b"IDAT", zlib.compress(scan))])
    out = png.decode_png(buf)
    assert out.shape == (h, w, 3)
    assert np.array_equal(out, pal[idx])
    # index beyond the palette fails loud
    short = _png((w, h, 8, 3, 0, 0, 0),
                 [(b"PLTE", pal[:3].tobytes()), (b"IDAT", zlib.compress(scan))])
    with pytest.raises(ValueError, match="palette index"):
        png.decode_png(short)


def _pack_subbyte_rows(idx: np.ndarray, depth: int) -> bytes:
    """Pack (h, w) sample values into MSB-first depth-bit scanlines, each
    row zero-padded to a byte boundary and prefixed with filter 0."""
    h, w = idx.shape
    rows = []
    for y in range(h):
        bits = np.zeros(((w * depth + 7) // 8) * 8, dtype=np.uint8)
        for x in range(w):
            for b in range(depth):
                bits[x * depth + b] = (idx[y, x] >> (depth - 1 - b)) & 1
        rows.append(b"\x00" + np.packbits(bits).tobytes())
    return b"".join(rows)


def test_decode_paletted_4bit_with_trns():
    rng = np.random.default_rng(22)
    w, h = 5, 3
    pal = rng.integers(0, 256, (7, 3), dtype=np.uint8)
    idx = rng.integers(0, 7, (h, w), dtype=np.uint8)
    trns = np.array([10, 20, 30], dtype=np.uint8)  # shorter than PLTE: rest opaque
    buf = _png((w, h, 4, 3, 0, 0, 0),
               [(b"PLTE", pal.tobytes()), (b"tRNS", trns.tobytes()),
                (b"IDAT", zlib.compress(_pack_subbyte_rows(idx, 4)))])
    out = png.decode_png(buf)
    assert out.shape == (h, w, 4)
    exp_a = np.full(7, 255, np.uint8)
    exp_a[:3] = trns
    assert np.array_equal(out[:, :, :3], pal[idx])
    assert np.array_equal(out[:, :, 3], exp_a[idx])


def test_decode_subbyte_gray_scales_to_full_range():
    rng = np.random.default_rng(23)
    for depth in (1, 2, 4):
        w, h = 11, 3  # odd width: scanline tail padding in play
        g = rng.integers(0, 1 << depth, (h, w), dtype=np.uint8)
        buf = _png((w, h, depth, 0, 0, 0, 0),
                   [(b"IDAT", zlib.compress(_pack_subbyte_rows(g, depth)))])
        out = png.decode_png(buf)
        assert out.shape == (h, w, 1)
        assert np.array_equal(out[:, :, 0], g * (255 // ((1 << depth) - 1)))


def _adam7_scanlines(px: np.ndarray) -> bytes:
    """Reference Adam7 splitter: emit each pass's scanlines (filter 0),
    skipping empty passes entirely, straight from the spec's pass grid."""
    passes = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
              (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]
    out = b""
    for x0, y0, dx, dy in passes:
        sub = px[y0::dy, x0::dx]
        ph, pw = sub.shape[:2]
        if ph == 0 or pw == 0:
            continue
        out += b"".join(b"\x00" + sub[y].tobytes() for y in range(ph))
    return out


def test_decode_adam7_interlaced():
    rng = np.random.default_rng(24)
    for (h, w) in [(9, 13), (8, 8), (1, 1), (3, 2), (16, 5), (7, 1)]:
        px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        buf = _png((w, h, 8, 2, 0, 0, 1),
                   [(b"IDAT", zlib.compress(_adam7_scanlines(px)))])
        assert np.array_equal(png.decode_png(buf), px), (h, w)


def test_decode_16bit_gray_now_supported():
    scan = b"\x00" * (4 * (4 * 2 + 1))
    buf = _png((4, 4, 16, 0, 0, 0, 0), [(b"IDAT", zlib.compress(scan))])
    out = png.decode_png(buf)
    assert out.dtype == np.uint16 and out.shape == (4, 4, 1)
    assert (out == 0).all()


def test_decode_paletted_paeth_filtered():
    """Sub-byte-era byte-lane filters (bpp=1) through the general unfilter:
    a palette image whose index bytes are Paeth- and Average-filtered."""
    rng = np.random.default_rng(25)
    w, h = 9, 5
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, (h, w), dtype=np.uint8)
    # hand-filter: row 0 Sub, rows alternate Average/Paeth on raw index bytes
    rows = []
    prev = np.zeros(w, dtype=np.int64)
    for y in range(h):
        cur = idx[y].astype(np.int64)
        if y == 0:
            f, enc = 1, np.diff(np.concatenate([[0], cur])) % 256
        elif y % 2:
            f = 3
            enc = np.empty(w, dtype=np.int64)
            left = 0
            for x in range(w):
                enc[x] = (cur[x] - ((left + prev[x]) >> 1)) % 256
                left = cur[x]
        else:
            f = 4
            enc = np.empty(w, dtype=np.int64)
            left = upleft = 0
            for x in range(w):
                b = prev[x]
                p = left + b - upleft
                pa, pb, pc = abs(p - left), abs(p - b), abs(p - upleft)
                pred = left if (pa <= pb and pa <= pc) else (b if pb <= pc else upleft)
                enc[x] = (cur[x] - pred) % 256
                left, upleft = cur[x], b
        rows.append(bytes([f]) + enc.astype(np.uint8).tobytes())
        prev = cur
    buf = _png((w, h, 8, 3, 0, 0, 0),
               [(b"PLTE", pal.tobytes()), (b"IDAT", zlib.compress(b"".join(rows)))])
    assert np.array_equal(png.decode_png(buf), pal[idx])


@pytest.mark.parametrize("c", [1, 2, 3, 4])
@pytest.mark.parametrize("ft", [0, 1, 2])
def test_16bit_roundtrip(c, ft):
    rs = np.random.RandomState(17 * c + ft)
    px = rs.randint(0, 65536, (9, 13, c)).astype(np.uint16)
    out = png.decode_png(png.encode_png(px, filter_type=ft))
    assert out.dtype == np.uint16
    np.testing.assert_array_equal(out, px)


def test_16bit_foreign_paeth_average():
    """Hand-filtered 16-bit gray file using Average (3) and Paeth (4) rows
    — the per-row byte-lane unfilter must reconstruct exactly."""
    rs = np.random.RandomState(5)
    px = rs.randint(0, 65536, (4, 6, 1)).astype(np.uint16)
    raw = px.astype(">u2").view(np.uint8).reshape(4, 12)
    scan = bytearray()
    prev = np.zeros(12, np.int64)
    for y, ft in enumerate([0, 3, 4, 2]):
        row = raw[y].astype(np.int64)
        if ft == 0:
            filt = row
        elif ft == 2:
            filt = (row - prev) & 0xFF
        elif ft == 3:
            filt = np.empty(12, np.int64)
            for x in range(12):
                left = row[x - 2] if x >= 2 else 0
                filt[x] = (row[x] - ((left + prev[x]) >> 1)) & 0xFF
        else:  # Paeth
            filt = np.empty(12, np.int64)
            for x in range(12):
                a = row[x - 2] if x >= 2 else 0
                b = prev[x]
                cc = prev[x - 2] if x >= 2 else 0
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                filt[x] = (row[x] - pred) & 0xFF
        scan += bytes([ft]) + filt.astype(np.uint8).tobytes()
        prev = row
    ihdr = struct.pack(">IIBBBBB", 6, 4, 16, 0, 0, 0, 0)
    buf = (png.PNG_SIG + png._chunk(b"IHDR", ihdr)
           + png._chunk(b"IDAT", zlib.compress(bytes(scan)))
           + png._chunk(b"IEND", b""))
    out = png.decode_png(buf)
    np.testing.assert_array_equal(out, px)


def test_16bit_adam7_foreign():
    rs = np.random.RandomState(9)
    px = rs.randint(0, 65536, (5, 7, 1)).astype(np.uint16)
    passes = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
              (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]
    scan = bytearray()
    for x0, y0, dx, dy in passes:
        sub = px[y0::dy, x0::dx, 0]
        if sub.size == 0:
            continue
        for row in sub:
            scan += b"\x00" + row.astype(">u2").tobytes()
    ihdr = struct.pack(">IIBBBBB", 7, 5, 16, 0, 0, 0, 1)
    buf = (png.PNG_SIG + png._chunk(b"IHDR", ihdr)
           + png._chunk(b"IDAT", zlib.compress(bytes(scan)))
           + png._chunk(b"IEND", b""))
    out = png.decode_png(buf)
    assert out.dtype == np.uint16
    np.testing.assert_array_equal(out, px)
