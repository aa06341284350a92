"""BMP codec: roundtrips, foreign layouts, RLE escapes, malformed input."""

import numpy as np
import pytest
import struct

from demeter_ray.functions import bmp
from demeter_ray.functions import codec


def _rand_rgb(h, w, seed):
    return np.random.RandomState(seed).randint(0, 256, (h, w, 3), np.uint8)


def test_rgb24_roundtrip():
    for h, w in [(1, 1), (5, 7), (16, 16), (9, 13)]:
        px = _rand_rgb(h, w, h * 100 + w)
        out = bmp.decode_bmp(bmp.encode_bmp(px))
        np.testing.assert_array_equal(out, px)
        assert bmp.bmp_dims(bmp.encode_bmp(px)) == (w, h)


def test_indexed8_roundtrip_and_rle8():
    rs = np.random.RandomState(7)
    pal = rs.randint(0, 256, (256, 3), np.uint8)
    # runs + literals mixed: block pattern makes real RLE runs
    idx = (np.add.outer(np.arange(11) * 3, np.arange(17) // 4) % 256).astype(np.uint8)
    flat = bmp.decode_bmp(bmp.encode_bmp(idx, palette=pal))
    rle = bmp.decode_bmp(bmp.encode_bmp(idx, palette=pal, rle=True))
    np.testing.assert_array_equal(flat, pal[idx])
    np.testing.assert_array_equal(rle, pal[idx])
    # RLE must actually compress the runs
    assert len(bmp.encode_bmp(idx, palette=pal, rle=True)) < len(
        bmp.encode_bmp(idx, palette=pal))


def test_rle8_noisy_literals():
    rs = np.random.RandomState(21)
    pal = rs.randint(0, 256, (256, 3), np.uint8)
    idx = rs.randint(0, 256, (6, 300), np.uint8)  # literal-heavy, >255 wide
    out = bmp.decode_bmp(bmp.encode_bmp(idx, palette=pal, rle=True))
    np.testing.assert_array_equal(out, pal[idx])


def _file(hdr_size, w, h, bpp, comp, payload, palette=b"", masks=b"",
          n_colors=0):
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, bpp, comp, len(payload),
                       0, 0, n_colors, 0)
    info = info + b"\x00" * (hdr_size - 40)
    off = 14 + hdr_size + len(masks) + len(palette)
    head = struct.pack("<2sIHHI", b"BM", off + len(payload), 0, 0, off)
    return head + info + masks + palette + payload


def test_foreign_topdown_24bit():
    px = _rand_rgb(3, 2, 5)
    rows = np.zeros((3, 8), np.uint8)  # stride = 8 for w=2
    rows[:, :6] = px[:, :, ::-1].reshape(3, 6)  # top-down: no flip
    buf = _file(40, 2, -3, 24, 0, rows.tobytes())
    np.testing.assert_array_equal(bmp.decode_bmp(buf), px)


def test_foreign_16bit_565_bitfields():
    # one pixel, R=31 G=0 B=0 in 565 -> pure red 255
    word = struct.pack("<H", 31 << 11) + b"\x00\x00"  # padded to 4
    masks = struct.pack("<III", 0xF800, 0x07E0, 0x001F)
    buf = _file(40, 1, 1, 16, 3, word, masks=masks)
    np.testing.assert_array_equal(bmp.decode_bmp(buf), [[[255, 0, 0]]])


def test_foreign_16bit_default_555():
    word = struct.pack("<H", (10 << 10) | (21 << 5) | 31) + b"\x00\x00"
    buf = _file(40, 1, 1, 16, 0, word)
    exp = [[[10 * 255 // 31, 21 * 255 // 31, 255]]]
    np.testing.assert_array_equal(bmp.decode_bmp(buf), exp)


def test_foreign_32bit_bgra_alpha_mask():
    pix = struct.pack("<I", 0x80FF4020)  # A=0x80 R=0xFF G=0x40 B=0x20
    masks = struct.pack("<IIII", 0x00FF0000, 0x0000FF00, 0x000000FF,
                        0xFF000000)
    info = struct.pack("<IiiHHIIiiII", 108, 1, 1, 1, 32, 3, 4, 0, 0, 0, 0)
    info += masks + b"\x00" * (108 - 40 - 16)
    off = 14 + 108
    buf = struct.pack("<2sIHHI", b"BM", off + 4, 0, 0, off) + info + pix
    out = bmp.decode_bmp(buf)
    assert out.shape == (1, 1, 4)
    np.testing.assert_array_equal(out, [[[0xFF, 0x40, 0x20, 0x80]]])


def test_foreign_1bit_and_4bit_paletted():
    pal = struct.pack("<BBBB", 10, 20, 30, 0) + struct.pack("<BBBB", 40, 50, 60, 0)
    # 1-bit, w=3: bits 101 -> MSB first byte 0b1010_0000, stride 4
    buf = _file(40, 3, 1, 1, 0, b"\xa0\x00\x00\x00", palette=pal, n_colors=2)
    np.testing.assert_array_equal(
        bmp.decode_bmp(buf), [[[60, 50, 40], [30, 20, 10], [60, 50, 40]]])
    # 4-bit, w=3: nibbles 1,0,1 -> bytes 0x10 0x10, stride 4
    buf = _file(40, 3, 1, 4, 0, b"\x10\x10\x00\x00", palette=pal, n_colors=2)
    np.testing.assert_array_equal(
        bmp.decode_bmp(buf), [[[60, 50, 40], [30, 20, 10], [60, 50, 40]]])


def test_foreign_rle4_with_escapes():
    # 4x2 image: row1 run of 4 nibble-pair (1,2); row0 absolute 3 + 1 skip (delta)
    pal = b"".join(struct.pack("<BBBB", 10 * i, 20 * i, 30 * i, 0) for i in range(4))
    rle = bytes([4, 0x12, 0, 0,              # bottom row: 1,2,1,2 then EOL
                 0, 3, 0x31, 0x20,           # abs 3 px: 3,1,2 (even, no pad)
                 0, 2, 1, 0,                 # delta skip 1 right (fills as 0)
                 0, 1])                      # end of bitmap
    buf = _file(40, 4, 2, 4, 2, rle, palette=pal, n_colors=4)
    out = bmp.decode_bmp(buf)
    pal_rgb = np.frombuffer(pal, np.uint8).reshape(4, 4)[:, [2, 1, 0]]
    exp_idx = np.array([[3, 1, 2, 0],     # top row (storage row 1); delta fill 0
                        [1, 2, 1, 2]])    # bottom row (storage row 0)
    np.testing.assert_array_equal(out, pal_rgb[exp_idx])


def test_codec_dispatch():
    px = _rand_rgb(4, 6, 9)
    buf = bmp.encode_bmp(px)
    np.testing.assert_array_equal(codec.decode(buf), px)
    assert codec.header_dims(buf) == (6, 4)


def test_malformed_fail_loud():
    px = _rand_rgb(2, 2, 1)
    good = bmp.encode_bmp(px)
    with pytest.raises(ValueError):
        bmp.decode_bmp(b"XX" + good[2:])
    with pytest.raises(ValueError):
        bmp.decode_bmp(good[:30])
    with pytest.raises(ValueError):
        bmp.decode_bmp(good[:-3])  # truncated pixel rows
    bad_bpp = bytearray(good)
    bad_bpp[28] = 13
    with pytest.raises(ValueError):
        bmp.decode_bmp(bytes(bad_bpp))
    bad_comp = bytearray(good)
    bad_comp[30] = 4  # BI_JPEG
    with pytest.raises(ValueError):
        bmp.decode_bmp(bytes(bad_comp))
    with pytest.raises(ValueError):
        bmp.encode_bmp(px.astype(np.int32))
    with pytest.raises(ValueError):
        bmp.encode_bmp(np.zeros((2, 2), np.uint8))  # indexed w/o palette
