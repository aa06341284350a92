"""AVI container codec (functions/avi.py): MJPG/DIB roundtrips, idx1
index-seek sampling (only sampled bytes touched), header metadata,
sample_frames dispatch, fail-loud container validation."""

import struct

import numpy as np
import pytest

from demeter_ray.functions import avi, codec
from demeter_ray.stages.images import sample_frames


def _frames(n=6, w=16, h=12, seed=0):
    return codec.generate_pixels_batch(seed + np.arange(n, dtype=np.int64), w, h)


def test_dib_roundtrip_exact():
    f = _frames()
    buf = avi.encode_avi(f, fps=10, codec="dib")
    np.testing.assert_array_equal(avi.decode_avi(buf), f)


def test_dib_row_padding():
    # width 5 -> 15-byte rows padded to 16: the 4-byte DIB stride rule.
    f = _frames(n=3, w=5, h=4)
    buf = avi.encode_avi(f, codec="dib")
    np.testing.assert_array_equal(avi.decode_avi(buf), f)


def test_mjpg_roundtrip_psnr():
    f = _frames()
    buf = avi.encode_avi(f, fps=10, codec="mjpg")
    out = avi.decode_avi(buf)
    err = out.astype(np.int64) - f.astype(np.int64)
    psnr = 10 * np.log10(255.0**2 / np.mean(np.square(err)))
    assert psnr >= 40.0


def test_meta_without_decode():
    f = _frames(n=7, w=20, h=8)
    buf = avi.encode_avi(f, fps=30, codec="mjpg")
    m = avi.avi_meta(buf)
    assert (m["n_frames"], m["width"], m["height"], m["fps"]) == (7, 20, 8, 30)
    assert m["codec"] == b"MJPG" and m["compression"] == b"MJPG"
    assert avi.avi_dims(buf) == (20, 8)
    assert avi.avi_frame_count(buf) == 7
    d = avi.avi_meta(avi.encode_avi(f, codec="dib"))
    assert d["codec"] == b"DIB" and d["compression"] == b"\x00\x00\x00\x00"


@pytest.mark.parametrize("every,offset", [(1, 0), (2, 0), (3, 0), (2, 1)])
def test_index_sampling_strides(every, offset):
    f = _frames(n=9)
    buf = avi.encode_avi(f, codec="dib")
    np.testing.assert_array_equal(
        avi.sample_avi_frames(buf, every=every, offset=offset), f[offset::every]
    )


def test_sampling_touches_only_indexed_chunks():
    # Corrupt every NON-sampled frame's payload; idx1-driven sampling must
    # still decode the sampled frames exactly — i.e. it seeks, not scans.
    f = _frames(n=8)
    buf = bytearray(avi.encode_avi(f, codec="dib"))
    meta = avi.avi_meta(bytes(buf))
    movi0 = meta["movi"][0]
    for k, (_ck, coff, clen) in enumerate(meta["idx1"]):
        if k % 3:
            at = movi0 + coff + 8
            buf[at : at + clen] = bytes(clen)
    np.testing.assert_array_equal(
        avi.sample_avi_frames(bytes(buf), every=3), f[::3]
    )


def test_sample_frames_dispatches_on_riff_magic():
    f = _frames(n=6, w=8, h=8)
    buf = avi.encode_avi(f, codec="dib")
    out = sample_frames(buf, every=2)
    assert len(out) == 3
    np.testing.assert_array_equal(np.stack(out), f[::2])


def test_odd_sized_mjpg_chunks_word_aligned():
    # JPEG payload lengths are arbitrary; chunk walker must honor the RIFF
    # odd-size pad byte or every later offset shears.
    f = _frames(n=5, w=11, h=9, seed=0)
    buf = avi.encode_avi(f, codec="mjpg")
    meta = avi.avi_meta(buf)
    assert any(clen & 1 for _ck, _off, clen in meta["idx1"]), (
        "fixture did not produce an odd-sized frame; change seed"
    )
    out = avi.decode_avi(buf)
    assert out.shape == f.shape


def test_fail_loud_bad_inputs():
    f = _frames(n=2)
    buf = avi.encode_avi(f, codec="dib")
    with pytest.raises(ValueError):
        avi.encode_avi(f, codec="h264")
    with pytest.raises(ValueError):
        avi.encode_avi(f.astype(np.int16), codec="dib")
    with pytest.raises(ValueError):
        avi.avi_meta(b"RIFX" + bytes(buf[4:]))
    with pytest.raises(ValueError):
        avi.avi_meta(b"RIFF" + struct.pack("<I", 4) + b"WAVE")
    # truncated movi: chunk overruns its container
    with pytest.raises(ValueError):
        avi.decode_avi(bytes(buf[:-10]) )
    # idx1 offset not landing on its chunk fourcc
    bad = bytearray(buf)
    meta = avi.avi_meta(buf)
    movi0 = meta["movi"][0]
    _ck, coff, _cl = meta["idx1"][0]
    bad[movi0 + coff : movi0 + coff + 4] = b"00xx"
    with pytest.raises(ValueError):
        avi.decode_avi(bytes(bad))


def test_foreign_layout_junk_and_extra_chunks():
    # A foreign muxer interleaves JUNK padding and vendor chunks around the
    # header tree; the walker must skip them structurally.
    f = _frames(n=3, w=8, h=8)
    buf = avi.encode_avi(f, codec="dib")
    # splice a JUNK chunk between hdrl and movi
    meta = avi.avi_meta(buf)
    movi_fourcc_at = meta["movi"][0] - 8  # LIST header start
    junk = b"JUNK" + struct.pack("<I", 7) + b"abcdefg" + b"\x00"
    spliced = buf[:movi_fourcc_at] + junk + buf[movi_fourcc_at:]
    spliced = (
        spliced[:4]
        + struct.pack("<I", struct.unpack_from("<I", spliced, 4)[0] + len(junk))
        + spliced[8:]
    )
    np.testing.assert_array_equal(avi.decode_avi(spliced), f)


@pytest.mark.parametrize("shape", [(1000,), (997, 2)])
def test_audio_interleave_roundtrip(shape):
    rng = np.random.default_rng(3)
    aud = rng.integers(-30000, 30000, shape).astype(np.int16)
    f = _frames(n=6, w=8, h=8)
    buf = avi.encode_avi(f, fps=10, codec="dib", audio=(aud, 16000))
    m = avi.avi_meta(buf)
    assert m["audio"] == {"channels": 1 if aud.ndim == 1 else 2, "rate": 16000}
    s, rate = avi.avi_audio(buf)
    ref = aud[:, None] if aud.ndim == 1 else aud
    assert rate == 16000
    np.testing.assert_array_equal(s, ref)
    # interleaved 01wb chunks must not shift video decode or sampling
    np.testing.assert_array_equal(avi.decode_avi(buf), f)
    np.testing.assert_array_equal(avi.sample_avi_frames(buf, every=2), f[::2])


def test_audio_fail_louds():
    f = _frames(n=2, w=8, h=8)
    with pytest.raises(ValueError):
        avi.encode_avi(f, codec="dib",
                       audio=(np.zeros(10, np.float32), 8000))
    video_only = avi.encode_avi(f, codec="dib")
    with pytest.raises(ValueError):
        avi.avi_audio(video_only)
    # non-PCM audio strf (format tag 2) must fail loud at parse time
    buf = bytearray(avi.encode_avi(f, codec="dib",
                                   audio=(np.zeros(10, np.int16), 8000)))
    at = bytes(buf).find(struct.pack("<HHII", 1, 1, 8000, 16000))
    assert at > 0
    buf[at:at + 2] = struct.pack("<H", 2)
    with pytest.raises(ValueError):
        avi.avi_meta(bytes(buf))
