"""Real baseline JPEG codec (functions/jpeg.py).

The decoder is validated against an *independently hand-assembled* bitstream
— custom variable-length Huffman tables and a 16-bit-precision DQT that our
encoder never produces, with expected pixels computed by an explicit
double-loop IDCT straight from the T.81 definition — not just against our
own encoder's roundtrip.
"""

import struct

import numpy as np
import pytest

from demeter_ray.functions import codec, jpeg


def test_roundtrip_shapes_and_psnr():
    rng = np.random.default_rng(3)
    for shape in [(16, 16, 3), (48, 32, 3), (33, 41, 3), (64, 64, 1), (8, 8, 3), (1, 1, 3)]:
        px = rng.integers(0, 256, size=shape, dtype=np.uint8)
        buf = jpeg.encode_jpeg(px)
        assert buf[:2] == jpeg.SOI and buf[-2:] == jpeg.EOI
        out = jpeg.decode_jpeg(buf)
        assert out.shape == shape
        assert codec.psnr(out, px) >= 40.0  # noise is the worst case
        assert jpeg.jpeg_dims(buf) == (shape[1], shape[0])


def test_roundtrip_gradient_fixture_content():
    px = codec.generate_pixels(7, 48, 32)
    out = jpeg.decode_jpeg(jpeg.encode_jpeg(px))
    assert codec.psnr(out, px) >= 44.0


def test_decode_hand_assembled_foreign_bitstream():
    # One 8x8 grayscale block; quantized coefficients (zigzag order):
    #   DC=3, zz1 (nat 0,1) = -2, zz5 (nat 0,2) = 1, rest 0.
    # Quant table: flat 16, declared with 16-bit precision (Pq=1).
    # Huffman: custom tables with code lengths 1/2/3 — shapes our encoder
    # (fixed 4/8-bit codes) can never emit.
    qval = 16
    # DC table: single symbol (category 2) with a 1-bit code "0"
    dc_bits = [0] * 16
    dc_bits[0] = 1
    dc_vals = bytes([2])
    # AC table: 0x00(EOB)="00", 0x02="01" (2 bits), 0x31="100" (3 bits)
    ac_bits = [0] * 16
    ac_bits[1] = 2
    ac_bits[2] = 1
    ac_vals = bytes([0x00, 0x02, 0x31])
    # scan bits: DC "0"+"11"(diff 3) | AC 0x02 "01"+mag(-2)="01"
    #            | 0x31 "100"+mag(1)="1" | EOB "00" | pad 1s
    bitstr = "0" + "11" + "01" + "01" + "100" + "1" + "00"
    bitstr += "1" * ((-len(bitstr)) % 8)
    scan = bytes(int(bitstr[i : i + 8], 2) for i in range(0, len(bitstr), 8))

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    dqt = bytes([0x10]) + b"".join(struct.pack(">H", qval) for _ in range(64))
    sof = struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
    dht = bytes([0x00]) + bytes(dc_bits) + dc_vals + bytes([0x10]) + bytes(ac_bits) + ac_vals
    sos = bytes([1, 1, 0x00, 0, 63, 0])
    buf = jpeg.SOI + seg(0xDB, dqt) + seg(0xC0, sof) + seg(0xC4, dht) + seg(0xDA, sos) + scan + jpeg.EOI

    out = jpeg.decode_jpeg(buf)
    assert out.shape == (8, 8, 1)

    # reference: explicit T.81 IDCT double loop over the dequantized coefs
    S = np.zeros((8, 8))
    S[0, 0], S[0, 1], S[0, 2] = 3 * qval, -2 * qval, 1 * qval
    ref = np.zeros((8, 8))
    for y in range(8):
        for x in range(8):
            acc = 0.0
            for u in range(8):
                for v in range(8):
                    cu = 1 / np.sqrt(2) if u == 0 else 1.0
                    cv = 1 / np.sqrt(2) if v == 0 else 1.0
                    acc += (
                        cu * cv * S[u, v]
                        * np.cos((2 * x + 1) * v * np.pi / 16)
                        * np.cos((2 * y + 1) * u * np.pi / 16)
                    )
            ref[y, x] = acc / 4 + 128
    ref = np.clip(np.round(ref), 0, 255).astype(np.uint8)
    assert np.array_equal(out[:, :, 0], ref)


def test_unsupported_features_fail_loud():
    px = codec.generate_pixels(1, 16, 16)
    buf = bytearray(jpeg.encode_jpeg(px))
    # flip SOF0 -> SOF2 (progressive)
    idx = bytes(buf).find(b"\xff\xc0")
    buf[idx + 1] = 0xC2
    with pytest.raises(ValueError, match="SOF"):
        jpeg.decode_jpeg(bytes(buf))
    with pytest.raises(ValueError, match="SOI"):
        jpeg.decode_jpeg(b"\x00\x01" + bytes(buf))
    # sampling factor 3 rejected (1 and 2 are supported: 4:4:4/4:2:2/4:2:0)
    buf = bytearray(jpeg.encode_jpeg(px))
    idx = bytes(buf).find(b"\xff\xc0")
    buf[idx + 11] = 0x33  # first component's sampling byte (FF C0 len2 prec h2 w2 nc cid samp)
    with pytest.raises(ValueError, match="sampling"):
        jpeg.decode_jpeg(bytes(buf))


def test_codec_dispatch_fmt_jpeg_is_real():
    px4 = codec.generate_pixels_batch(np.arange(3), 16, 16)
    blobs = codec.encode_batch(px4, "jpeg")
    assert all(b[:2] == jpeg.SOI for b in blobs)
    out = codec.decode_batch(blobs, 16, 16)
    for k in range(3):
        assert codec.psnr(out[k], px4[k]) >= 40.0
    assert codec.header_dims(blobs[0]) == (16, 16)
    # djpg keeps the SQL-recomputable quantization semantics
    d = codec.encode(px4[0], "djpg", q=4)
    assert d[:4] == codec.MAGIC_LOSSY
    rec = codec.decode(d)
    assert np.array_equal(rec, (px4[0].astype(np.int64) // 4 * 4 + 2).astype(np.uint8))
    assert codec.encode_batch(np.zeros((0, 8, 8, 3), np.uint8), "jpeg") == []


def test_quality_knob_monotone():
    px = codec.generate_pixels(9, 32, 32)
    fine = jpeg.encode_jpeg(px, quality=1.0)
    coarse = jpeg.encode_jpeg(px, quality=6.0)
    p_fine = codec.psnr(jpeg.decode_jpeg(fine), px)
    p_coarse = codec.psnr(jpeg.decode_jpeg(coarse), px)
    assert p_fine > p_coarse
    assert len(coarse) < len(fine)


def test_vectorized_entropy_coder_equals_scalar_reference():
    """The vectorized entropy-unit builder must be ELEMENT-IDENTICAL to the
    scalar T.81 F.1.2 reference coder on adversarial coefficient patterns
    (long zero runs, ZRL chains, coefficient-63 endings, zero DC diffs)."""
    rng = np.random.default_rng(17)
    cases = [rng.integers(0, 256, size=s, dtype=np.uint8)
             for s in [(8, 8, 1), (16, 16, 3), (48, 32, 3), (64, 64, 1)]]
    cases.append(np.full((16, 16, 3), 255, np.uint8))  # saturated: long runs
    cases.append(np.zeros((16, 16, 1), np.uint8))      # all-zero: EOB-only
    cases.append(codec.generate_pixels(5, 48, 32))
    cb = (np.indices((16, 16)).sum(0) % 2 * 255).astype(np.uint8)[:, :, None]
    cases.append(np.repeat(cb, 3, axis=2))             # checkerboard: coef 63
    q = jpeg.quant_table(1.0)
    for px in cases:
        fpx = px.astype(np.float64)
        planes = ([fpx[:, :, 0]] if px.shape[2] == 1
                  else list(np.moveaxis(jpeg._rgb_to_ycbcr(fpx), -1, 0)))
        zz = [jpeg._fdct_quant(p, q) for p in planes]
        v1, b1 = jpeg._entropy_units_loop(zz)
        v2, b2 = jpeg._entropy_units(zz)
        assert np.array_equal(v1, v2) and np.array_equal(b1, b2)


def test_decode_hand_built_420_subsampled():
    """A hand-assembled 4:2:0 file (one MCU: four Y blocks + Cb + Cr,
    DC-only constant blocks) decodes to the analytically expected RGB —
    the ubiquitous chroma-subsampled layout of real-world JPEGs."""
    import zlib  # noqa: F401  (parity with other hand-built tests' imports)

    dc_bits = [0] * 16
    dc_bits[3] = 12
    dc_vals = bytes(range(12))
    ac_bits = [0] * 16
    ac_bits[1] = 1
    ac_vals = bytes([0x00])  # AC table: EOB only, code "00"

    def enc_dc(diff):
        s = int(abs(diff)).bit_length()
        bits = format(s, "04b")
        if s:
            mag = diff if diff >= 0 else diff + (1 << s) - 1
            bits += format(mag, f"0{s}b")
        return bits

    ydc = [160, 80, -40, 24]  # quantized DCs of the four Y quadrants
    stream = ""
    prev = 0
    for d in ydc:
        stream += enc_dc(d - prev) + "00"
        prev = d
    stream += enc_dc(16) + "00" + enc_dc(-16) + "00"  # Cb, Cr
    stream += "1" * ((-len(stream)) % 8)
    scan = bytes(int(stream[i : i + 8], 2) for i in range(0, len(stream), 8))
    stuffed = bytearray()
    for b in scan:
        stuffed.append(b)
        if b == 0xFF:
            stuffed.append(0)

    def seg(m, p):
        return bytes([0xFF, m]) + struct.pack(">H", len(p) + 2) + p

    dqt = bytes([0x00]) + bytes([1] * 64)
    sof = (struct.pack(">BHHB", 8, 16, 16, 3)
           + bytes([1, 0x22, 0]) + bytes([2, 0x11, 0]) + bytes([3, 0x11, 0]))
    dht = (bytes([0x00]) + bytes(dc_bits) + dc_vals
           + bytes([0x10]) + bytes(ac_bits) + ac_vals)
    sos = bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0])
    buf = (jpeg.SOI + seg(0xDB, dqt) + seg(0xC0, sof) + seg(0xC4, dht)
           + seg(0xDA, sos) + bytes(stuffed) + jpeg.EOI)

    px = jpeg.decode_jpeg(buf)
    assert px.shape == (16, 16, 3)
    cb, cr = 16 / 8 + 128, -16 / 8 + 128
    for qi, (qy, qx) in enumerate([(0, 0), (0, 1), (1, 0), (1, 1)]):
        y = ydc[qi] / 8 + 128  # DC-only block: constant spatial value DC/8
        exp = jpeg._ycbcr_to_rgb(np.array([[[y, cb, cr]]]))
        exp = np.clip(np.round(exp), 0, 255).astype(np.uint8)[0, 0]
        got = px[qy * 8 : (qy + 1) * 8, qx * 8 : (qx + 1) * 8]
        assert (got == exp).all(), (qi, exp, got[0, 0])


def test_video_container_with_mixed_real_frames():
    """Frame sampling over a container that concatenates real PNG, real
    JPEG and raw DRAW frames — each self-delimiting via its own format."""
    from demeter_ray.stages.images import sample_frames

    frames_in = [codec.generate_pixels(i, 8, 8) for i in range(6)]
    fmts = ["png", "jpeg", "draw", "png", "jpeg", "draw"]
    blob = b"".join(codec.encode(f, m) for f, m in zip(frames_in, fmts))
    sampled = sample_frames(blob, every=2)
    assert len(sampled) == 3
    for j, f in enumerate(sampled):
        src = frames_in[2 * j]
        if fmts[2 * j] == "jpeg":
            assert codec.psnr(f, src) >= 40.0
        else:
            assert np.array_equal(f, src)


def test_restart_interval_roundtrip_identical_pixels():
    """DRI/RSTn streams decode to the SAME pixels as the unrestarted scan
    (identical quantized coefficients, only the entropy layer changes)."""
    rng = np.random.default_rng(11)
    for shape in [(16, 16, 3), (24, 40, 3), (8, 8, 1), (33, 17, 3), (64, 48, 1)]:
        px = rng.integers(0, 256, size=shape, dtype=np.uint8)
        base = jpeg.encode_jpeg(px)
        d0 = jpeg.decode_jpeg(base)
        n_mcus = ((shape[0] + 7) // 8) * ((shape[1] + 7) // 8)
        for ri in (1, 3, 8, 17, 1000):
            buf = jpeg.encode_jpeg(px, restart_interval=ri)
            assert np.array_equal(jpeg.decode_jpeg(buf), d0), (shape, ri)
            assert b"\xff\xdd" in buf  # DRI present
            has_rst = any(bytes([0xFF, 0xD0 + k]) in buf for k in range(8))
            assert has_rst == (n_mcus > ri)
        assert b"\xff\xdd" not in base  # default stream unchanged


def test_restart_marker_cycle_and_count():
    """RSTn markers cycle 0..7 in order and count ceil(mcus/ri) - 1."""
    px = codec.generate_pixels(3, 80, 80)  # 100 MCUs
    buf = jpeg.encode_jpeg(px, restart_interval=7)
    scan = buf[buf.find(b"\xff\xda") :]
    seen = []
    i = 0
    while i < len(scan) - 1:
        if scan[i] == 0xFF and 0xD0 <= scan[i + 1] <= 0xD7:
            seen.append(scan[i + 1] - 0xD0)
            i += 2
        else:
            i += 1
    assert len(seen) == (100 + 6) // 7 - 1
    assert seen == [k % 8 for k in range(len(seen))]


def test_restart_stream_corruption_fails_loud():
    rng = np.random.default_rng(13)
    px = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    # out-of-sequence RST (simulated lost restart segment)
    buf = bytearray(jpeg.encode_jpeg(px, restart_interval=2))
    i = bytes(buf).find(b"\xff\xd0")
    buf[i + 1] = 0xD5
    with pytest.raises(ValueError, match="sequence"):
        jpeg.decode_jpeg(bytes(buf))
    # RST markers without a DRI segment
    buf = bytearray(jpeg.encode_jpeg(px, restart_interval=4))
    j = bytes(buf).find(b"\xff\xdd")
    del buf[j : j + 6]
    with pytest.raises(ValueError, match="DRI"):
        jpeg.decode_jpeg(bytes(buf))


def test_restart_dri_zero_segment_is_inert():
    """Foreign encoders may emit an explicit DRI with interval 0 — decode
    must treat it exactly like no DRI at all."""
    px = codec.generate_pixels(5, 16, 24)
    buf = jpeg.encode_jpeg(px)
    k = buf.find(b"\xff\xda")
    patched = buf[:k] + b"\xff\xdd\x00\x04\x00\x00" + buf[k:]
    assert np.array_equal(jpeg.decode_jpeg(patched), jpeg.decode_jpeg(buf))


def test_restart_frame_size_in_concatenated_container():
    """RST bytes inside the scan must not confuse the frame delimiter."""
    px = codec.generate_pixels(9, 24, 24)
    one = jpeg.encode_jpeg(px, restart_interval=2)
    assert jpeg.jpeg_frame_size(one + one) == len(one)
    assert jpeg.jpeg_frame_size(one + one, offset=len(one)) == len(one)


def _box_mean_chroma_expected(px: np.ndarray) -> np.ndarray:
    """Independent reference for 4:2:0: YCbCr -> 2x2 box-mean chroma ->
    nearest replicate -> RGB, with no DCT in the loop."""
    h, w = px.shape[:2]
    ph, pw = (-h) % 16, (-w) % 16
    f = np.pad(px.astype(np.float64), ((0, ph), (0, pw), (0, 0)), mode="edge")
    ycc = jpeg._rgb_to_ycbcr(f)
    fh, fw = f.shape[:2]
    half = ycc[:, :, 1:].reshape(fh // 2, 2, fw // 2, 2, 2).mean(axis=(1, 3))
    rep = np.repeat(np.repeat(half, 2, axis=0), 2, axis=1)
    exp = jpeg._ycbcr_to_rgb(np.concatenate([ycc[:, :, :1], rep], axis=2))
    return np.clip(np.round(exp), 0, 255).astype(np.uint8)[:h, :w]


def test_420_decode_matches_subsampling_reference():
    """The only loss beyond the declared 2x2 chroma box-mean is DCT
    quantization: decode stays >= 44 dB against the no-DCT reference."""
    for i, (h, w) in [(1, (32, 32)), (5, (33, 17)), (9, (48, 64)), (2, (16, 16))]:
        px = codec.generate_pixels(i, h, w)
        out = jpeg.decode_jpeg(jpeg.encode_jpeg(px, subsampling="420"))
        assert out.shape == px.shape
        assert codec.psnr(out, _box_mean_chroma_expected(px)) >= 44.0


def test_420_smooth_chroma_imagery_holds_40db():
    """On natural-like content (smooth chroma), 4:2:0 holds the north
    rule's 40 dB bar against the ORIGINAL pixels."""
    y, x = np.mgrid[0:48, 0:64].astype(np.float64)
    lum = 96 + 64 * np.sin(x / 5.0) * np.cos(y / 7.0)  # luma detail is free
    r = np.clip(lum + 18 * (x / 64.0), 0, 255)         # chroma drifts slowly
    g = np.clip(lum, 0, 255)
    b = np.clip(lum + 12 * (y / 48.0), 0, 255)
    px = np.stack([r, g, b], axis=-1).round().astype(np.uint8)
    out = jpeg.decode_jpeg(jpeg.encode_jpeg(px, subsampling="420"))
    assert codec.psnr(out, px) >= 40.0


def test_420_bitstream_shape_and_size():
    px = codec.generate_pixels(3, 32, 48)
    buf = jpeg.encode_jpeg(px, subsampling="420")
    # SOF declares 2x2 luma sampling, 1x1 chroma
    i = buf.find(b"\xff\xc0")
    assert buf[i + 11] == 0x22 and buf[i + 14] == 0x11 and buf[i + 17] == 0x11
    # chroma halving shows up as a materially smaller blob
    assert len(buf) < 0.7 * len(jpeg.encode_jpeg(px))
    # constant color is DC-only: bit-exact through 4:2:0 too
    const = np.full((32, 32, 3), 137, np.uint8)
    out = jpeg.decode_jpeg(jpeg.encode_jpeg(const, subsampling="420"))
    assert int(np.abs(out.astype(np.int64) - 137).max()) == 0


def test_420_with_restart_interval():
    px = codec.generate_pixels(4, 48, 64)
    d0 = jpeg.decode_jpeg(jpeg.encode_jpeg(px, subsampling="420"))
    for ri in (1, 2, 5):
        buf = jpeg.encode_jpeg(px, subsampling="420", restart_interval=ri)
        assert np.array_equal(jpeg.decode_jpeg(buf), d0)


def test_420_gray_is_noop_and_bad_mode_rejected():
    gr = codec.generate_pixels(6, 16, 16)[:, :, :1].copy()
    assert jpeg.encode_jpeg(gr, subsampling="420") == jpeg.encode_jpeg(gr)
    with pytest.raises(ValueError, match="subsampling"):
        jpeg.encode_jpeg(gr, subsampling="422")


class TestSplitTables:
    def test_split_merge_identity(self):
        px = codec.generate_pixels(7, 33, 21)
        full = jpeg.encode_jpeg(px)
        tables, abbrev = jpeg.split_tables(full)
        assert tables.startswith(jpeg.SOI) and tables.endswith(jpeg.EOI)
        assert b"\xff\xdb" in tables and b"\xff\xc4" in tables
        assert b"\xff\xdb" not in abbrev.rsplit(b"\xff\xda", 1)[0]
        merged = jpeg.merge_abbreviated(tables, abbrev)
        np.testing.assert_array_equal(jpeg.decode_jpeg(merged),
                                      jpeg.decode_jpeg(full))

    def test_merge_validation(self):
        px = codec.generate_pixels(1, 16, 16)
        full = jpeg.encode_jpeg(px)
        tables, abbrev = jpeg.split_tables(full)
        with pytest.raises(ValueError):
            jpeg.merge_abbreviated(tables[:-2], abbrev)  # no EOI
        with pytest.raises(ValueError):
            jpeg.merge_abbreviated(tables, abbrev[2:])  # no SOI
        with pytest.raises(ValueError):
            jpeg.split_tables(b"\x00\x01not a jpeg")
