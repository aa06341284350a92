"""GIF decoder (functions/gif.py): LZW, palettes, interlace, transparency.

The decoder is validated against *independently hand-assembled* bitstreams:
the reference LZW encoder below is written straight from the GIF89a spec
(appendix F) in this test file, sharing no code with the decoder — plus an
explicit no-compression stream built code-by-code without any encoder.
"""

import struct

import numpy as np
import pytest

from demeter_ray.functions import codec, gif


# --------------------------------------------------------- reference encoder


def _ref_lzw_encode(indices, min_code_size):
    """Spec LZW (GIF89a app. F): string table keyed by (prefix, byte),
    CLEAR emitted up front and on table overflow, LSB-first packing."""
    clear = 1 << min_code_size
    end = clear + 1
    table = {}
    next_code = end + 1
    width = min_code_size + 1
    out_bits = []

    def emit(code):
        for b in range(width):
            out_bits.append((code >> b) & 1)

    emit(clear)
    prev = None
    for sym in indices:
        sym = int(sym)
        if prev is None:
            prev = (sym,)
            continue
        cand = prev + (sym,)
        if cand in table:
            prev = cand
            continue
        code = table[prev] if len(prev) > 1 else prev[0]
        emit(code)
        table[cand] = next_code
        next_code += 1
        # spec app. F: width grows once a code with value 2^width exists
        # (the decoder mirrors this one insert later)
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        elif next_code == 4097:
            emit(clear)
            table.clear()
            next_code = end + 1
            width = min_code_size + 1
        prev = (sym,)
    if prev is not None:
        emit(table[prev] if len(prev) > 1 else prev[0])
    emit(end)
    bits = np.array(out_bits, dtype=np.uint8)
    pad = (-len(bits)) % 8
    if pad:
        bits = np.concatenate([bits, np.zeros(pad, np.uint8)])
    return np.packbits(bits.reshape(-1, 8)[:, ::-1], axis=1).tobytes()


def _sub_blocks(data, block=255):
    out = b""
    for i in range(0, len(data), block):
        chunk = data[i : i + block]
        out += bytes([len(chunk)]) + chunk
    return out + b"\x00"


def _build_gif(idx, pal, *, magic=b"GIF89a", interlaced=False, transparent=None,
               local_palette=False, offset=(0, 0), screen=None, block=255):
    h, w = idx.shape
    left, top = offset
    sw, sh = screen if screen else (w + left, h + top)
    ngct = max(2, len(pal))
    size_field = max(0, int(np.ceil(np.log2(ngct))) - 1)
    ptab = np.zeros((2 << size_field, 3), np.uint8)
    ptab[: len(pal)] = pal
    buf = magic + struct.pack("<HHBBB", sw, sh,
                              (0x80 | size_field) if not local_palette else 0, 0, 0)
    if not local_palette:
        buf += ptab.tobytes()
    if transparent is not None:
        buf += b"\x21\xf9" + _sub_blocks(bytes([0x01, 0, 0, transparent]))
    ipacked = (0x40 if interlaced else 0) | ((0x80 | size_field) if local_palette else 0)
    buf += b"\x2c" + struct.pack("<HHHHB", left, top, w, h, ipacked)
    if local_palette:
        buf += ptab.tobytes()
    mcs = max(2, size_field + 1)
    if interlaced:
        rows = np.concatenate([np.arange(s, h, st) for s, st in
                               ((0, 8), (4, 8), (2, 4), (1, 2))])
        stream = idx[rows].reshape(-1)
    else:
        stream = idx.reshape(-1)
    buf += bytes([mcs]) + _sub_blocks(_ref_lzw_encode(stream, mcs), block) + b"\x3b"
    return buf


# ------------------------------------------------------------------- tests


def test_basic_roundtrip_and_dims():
    rng = np.random.default_rng(31)
    for (h, w, ncol) in [(1, 1, 2), (7, 11, 4), (16, 16, 16), (23, 9, 256)]:
        pal = rng.integers(0, 256, (ncol, 3), np.uint8)
        idx = rng.integers(0, ncol, (h, w), np.uint8)
        buf = _build_gif(idx, pal)
        out = gif.decode_gif(buf)
        assert out.shape == (h, w, 3)
        assert np.array_equal(out, pal[idx])
        assert gif.gif_dims(buf) == (w, h)
        assert gif.gif_frame_count(buf) == 1


def test_dictionary_growth_and_repetitive_content():
    """Long runs force code-width growth and (at 4096) a dictionary reset."""
    pal = np.arange(12, dtype=np.uint8).repeat(3).reshape(4, 9)[:, :3].copy()
    pal = np.array([[0, 0, 0], [85, 85, 85], [170, 170, 170], [255, 255, 255]], np.uint8)
    idx = np.tile(np.array([0, 1, 2, 3, 2, 1], np.uint8), 4096)[: 128 * 128]
    idx = idx.reshape(128, 128)
    out = gif.decode_gif(_build_gif(idx, pal))
    assert np.array_equal(out, pal[idx])


def test_interlaced():
    rng = np.random.default_rng(32)
    for h in (1, 2, 5, 8, 9, 17):
        pal = rng.integers(0, 256, (8, 3), np.uint8)
        idx = rng.integers(0, 8, (h, 6), np.uint8)
        out = gif.decode_gif(_build_gif(idx, pal, interlaced=True))
        assert np.array_equal(out, pal[idx]), h


def test_transparency_and_offset_canvas():
    rng = np.random.default_rng(33)
    pal = rng.integers(0, 256, (4, 3), np.uint8)
    idx = rng.integers(0, 4, (3, 4), np.uint8)
    idx[1, 2] = 3
    out = gif.decode_gif(_build_gif(idx, pal, transparent=3))
    assert out.shape == (3, 4, 4)
    assert np.array_equal(out[:, :, :3], pal[idx])
    assert np.array_equal(out[:, :, 3], np.where(idx == 3, 0, 255).astype(np.uint8))
    # frame at an offset inside a larger logical screen: uncovered = alpha 0
    out = gif.decode_gif(_build_gif(idx, pal, offset=(2, 1), screen=(8, 6)))
    assert out.shape == (6, 8, 4)
    assert np.array_equal(out[1:4, 2:6, :3], pal[idx])
    assert (out[1:4, 2:6, 3] == 255).all()
    assert (out[:1, :, 3] == 0).all() and (out[:, :2, 3] == 0).all()


def test_local_palette_and_87a_and_small_subblocks():
    rng = np.random.default_rng(34)
    pal = rng.integers(0, 256, (16, 3), np.uint8)
    idx = rng.integers(0, 16, (10, 13), np.uint8)
    for kwargs in ({"local_palette": True}, {"magic": b"GIF87a"}, {"block": 3}):
        out = gif.decode_gif(_build_gif(idx, pal, **kwargs))
        assert np.array_equal(out, pal[idx]), kwargs


def test_hand_built_no_compression_stream():
    """A stream assembled code-by-code with no encoder at all: CLEAR before
    every literal keeps the dictionary empty, so codes ARE the pixels."""
    pal = np.array([[10, 20, 30], [200, 100, 50]], np.uint8)
    pixels = [1, 0, 0, 1]
    mcs = 2  # clear=4 end=5, width 3
    bits = []
    for sym in [4] + [v for p in pixels for v in (p, 4)][:-1] + [5]:
        for b in range(3):
            bits.append((sym >> b) & 1)
    arr = np.array(bits + [0] * ((-len(bits)) % 8), np.uint8)
    data = np.packbits(arr.reshape(-1, 8)[:, ::-1], axis=1).tobytes()
    buf = (b"GIF89a" + struct.pack("<HHBBB", 2, 2, 0x80, 0, 0) + pal.tobytes()
           + b"\x00" * 0 + b"\x2c" + struct.pack("<HHHHB", 0, 0, 2, 2, 0)
           + bytes([mcs]) + _sub_blocks(data) + b"\x3b")
    out = gif.decode_gif(buf)
    assert np.array_equal(out, pal[np.array(pixels).reshape(2, 2)])


def test_codec_dispatch_and_errors():
    rng = np.random.default_rng(35)
    pal = rng.integers(0, 256, (4, 3), np.uint8)
    idx = rng.integers(0, 4, (5, 7), np.uint8)
    buf = _build_gif(idx, pal)
    assert np.array_equal(codec.decode(buf), pal[idx])
    assert codec.header_dims(buf) == (7, 5)
    with pytest.raises(ValueError, match="not a GIF"):
        gif.decode_gif(b"JIF89a" + buf[6:])
    # truncated LZW fails loud
    bad = bytearray(_build_gif(idx, pal))
    k = bytes(bad).rfind(b"\x3b")
    with pytest.raises(ValueError):
        gif.decode_gif(bytes(bad[: k - 8]) + b"\x00\x3b")
    # animated GIFs surface their frame count
    two = _build_gif(idx, pal)[:-1] + _build_gif(idx, pal)[13 + 3 * 4 :]
    assert gif.gif_frame_count(two) == 2


def test_lzw_full_table_reset_and_deferred_clear():
    """Streams that fill the 4096-entry dictionary: one where the encoder
    emits CLEAR and resets, and a 'deferred clear' stream whose encoder
    just stops adding entries (both occur in the wild)."""
    rng = np.random.default_rng(36)
    seq = rng.integers(0, 4, 30000, np.uint8)
    assert np.array_equal(gif._lzw_decode(_ref_lzw_encode(seq, 2), 2, len(seq)), seq)

    def enc_deferred(indices, mcs):
        clear = 1 << mcs
        end = clear + 1
        table = {}
        next_code = end + 1
        width = mcs + 1
        bits = []

        def emit(c):
            for b in range(width):
                bits.append((c >> b) & 1)

        emit(clear)
        prev = None
        for sym in map(int, indices):
            if prev is None:
                prev = (sym,)
                continue
            cand = prev + (sym,)
            if cand in table:
                prev = cand
                continue
            emit(table[prev] if len(prev) > 1 else prev[0])
            if next_code < 4096:  # table full: keep coding, never clear
                table[cand] = next_code
                next_code += 1
                if next_code == (1 << width) + 1 and width < 12:
                    width += 1
            prev = (sym,)
        if prev is not None:
            emit(table[prev] if len(prev) > 1 else prev[0])
        emit(end)
        a = np.array(bits + [0] * ((-len(bits)) % 8), np.uint8)
        return np.packbits(a.reshape(-1, 8)[:, ::-1], axis=1).tobytes()

    assert np.array_equal(gif._lzw_decode(enc_deferred(seq, 2), 2, len(seq)), seq)


def test_real_world_files_if_present():
    """Real encoders' files (idlelib ships GIF icons in some sandboxes) —
    skipped when absent so the suite stays hermetic."""
    import glob

    files = glob.glob(
        "/mnt/sandboxing/model_tools_env/v1/python/install/lib/python3.11/idlelib/Icons/*.gif"
    )
    if not files:
        pytest.skip("no real-world GIFs on this host")
    for f in sorted(files):
        buf = open(f, "rb").read()
        out = gif.decode_gif(buf)
        w, h = gif.gif_dims(buf)
        assert out.shape[1] == w or out.shape[0] <= h  # frame within screen
