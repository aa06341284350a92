"""WAV codec (functions/wav.py) + audio feature stage (stages/audio.py):
roundtrips across formats, foreign chunk layouts, fail-loud on compressed
tags, feature correctness, decimation."""

import struct

import numpy as np
import pyarrow as pa
import pytest

from demeter_ray.functions import wav
from demeter_ray.stages import audio


@pytest.mark.parametrize("dtype", ["uint8", "int16", "int32",
                                   "float32", "float64"])
@pytest.mark.parametrize("channels", [1, 2, 3])
def test_roundtrip_formats(dtype, channels):
    rng = np.random.default_rng(5)
    n = 333
    if dtype.startswith("float"):
        s = rng.normal(size=(n, channels)).astype(dtype)
    else:
        info = np.iinfo(dtype)
        s = rng.integers(info.min, info.max, size=(n, channels),
                         endpoint=True).astype(dtype)
    buf = wav.encode_wav(s, 16000)
    out, rate = wav.decode_wav(buf)
    assert rate == 16000 and out.dtype == np.dtype(dtype)
    np.testing.assert_array_equal(out, s)


def test_mono_1d_input_and_odd_byte_count():
    s = np.arange(-5, 6, dtype=np.int16)  # 11 samples -> 22 bytes (even)
    out, rate = wav.decode_wav(wav.encode_wav(s, 8000))
    assert out.shape == (11, 1)
    u = np.arange(7, dtype=np.uint8)  # 7 bytes -> odd data chunk, padded
    out2, _ = wav.decode_wav(wav.encode_wav(u, 8000))
    np.testing.assert_array_equal(out2[:, 0], u)


def test_foreign_chunk_layout_and_extensible():
    """LIST chunk before fmt, odd-sized skipped chunk, EXTENSIBLE fmt tag —
    the layouts real encoders emit — all decode."""
    s = np.array([[100, -100], [2000, -2000], [32767, -32768]], np.int16)
    data = s.tobytes()
    ext = struct.pack("<HHIIHH", 0xFFFE, 2, 44100, 44100 * 4, 4, 16)
    ext += struct.pack("<HHI", 22, 16, 0b11)
    ext += struct.pack("<H", 1) + b"\x00\x00" + wav._GUID_TAIL
    chunks = struct.pack("<4sI", b"LIST", 5) + b"INFOx" + b"\x00"  # odd+pad
    chunks += struct.pack("<4sI", b"fmt ", len(ext)) + ext
    chunks += struct.pack("<4sI", b"fact", 4) + struct.pack("<I", 3)
    chunks += struct.pack("<4sI", b"data", len(data)) + data
    riff = b"WAVE" + chunks
    buf = struct.pack("<4sI", b"RIFF", len(riff)) + riff
    out, rate = wav.decode_wav(buf)
    assert rate == 44100
    np.testing.assert_array_equal(out, s)


def test_fail_loud():
    with pytest.raises(ValueError, match="RIFF"):
        wav.decode_wav(b"OggS not a wav")
    with pytest.raises(ValueError, match="fmt/data"):
        wav.decode_wav(struct.pack("<4sI", b"RIFF", 4) + b"WAVE")
    good = bytearray(wav.encode_wav(np.zeros(4, np.int16), 8000))
    i = bytes(good).find(b"fmt ")
    good[i + 8:i + 10] = struct.pack("<H", 2)  # MS ADPCM: entropy-coded
    with pytest.raises(ValueError, match="format tag 2"):
        wav.decode_wav(bytes(good))
    with pytest.raises(ValueError, match="dtype"):
        wav.encode_wav(np.zeros(4, np.int8), 8000)
    with pytest.raises(ValueError, match="sample_rate"):
        wav.encode_wav(np.zeros(4, np.int16), 0)
    # truncated data chunk
    full = wav.encode_wav(np.arange(100, dtype=np.int16), 8000)
    with pytest.raises(ValueError, match="truncated"):
        wav.decode_wav(full[:-10])


def test_feature_batch_values():
    v = np.array([3, -4, 0, 5, -5], np.int16)
    blob = wav.encode_wav(v, 1000)
    t = pa.table({"doc_id": pa.array([7], pa.int64()),
                  "audio": pa.array([blob], pa.binary())})
    out = audio.wav_features_batch(t, keep=("doc_id",)).to_pylist()[0]
    assert out["n_samples"] == 5 and out["sample_rate"] == 1000
    assert out["sum_sq"] == 9 + 16 + 0 + 25 + 25
    assert out["peak_abs"] == 5
    assert out["zero_crossings"] == 2  # 3->-4 and 5->-5 (zeros break runs)
    assert out["mean_val"] == pytest.approx(-1 / 5)
    assert out["duration_s"] == pytest.approx(0.005)


def test_feature_batch_uint8_centering_and_empty():
    u = np.array([128, 130, 126, 128], np.uint8)  # centered: 0, 2, -2, 0
    t = pa.table({"audio": pa.array([wav.encode_wav(u, 8000)], pa.binary())})
    row = audio.wav_features_batch(t).to_pylist()[0]
    assert row["sum_sq"] == 8 and row["peak_abs"] == 2
    assert row["zero_crossings"] == 1  # only the 2 -> -2 strict flip
    # zero-row typed batch stays total (the edge-sweep rule)
    empty = pa.table({"audio": pa.array([], pa.binary())})
    out = audio.wav_features_batch(empty)
    assert out.num_rows == 0 and "sum_sq" in out.column_names


def test_decimate():
    v = np.arange(100, dtype=np.int16)
    blob = wav.encode_wav(v, 9000)
    out, rate = wav.decode_wav(audio.decimate_wav(blob, 3))
    np.testing.assert_array_equal(out[:, 0], v[::3])
    assert rate == 3000
    with pytest.raises(ValueError, match="factor"):
        audio.decimate_wav(blob, 0)


def test_g711_code_identity():
    """encode(decode(byte)) == byte for every code point, except the
    canonical mu-law +/-0 fold (0x7F re-encodes as 0xFF; g711.c agrees)."""
    b = np.arange(256, dtype=np.uint8)
    rt = wav.alaw_encode(wav._ALAW_DEC[b].astype(np.int16))
    np.testing.assert_array_equal(rt, b)
    rt = wav.mulaw_encode(wav._MULAW_DEC[b].astype(np.int16))
    np.testing.assert_array_equal(rt[b != 0x7F], b[b != 0x7F])
    assert rt[0x7F] == 0xFF and wav._MULAW_DEC[0x7F] == 0


def test_g711_known_values():
    # full-scale and zero behave per G.711
    assert wav.mulaw_encode(np.array([0], np.int16))[0] == 0xFF
    assert wav.mulaw_encode(np.array([32767], np.int16))[0] == 0x80
    assert wav.mulaw_encode(np.array([-32768], np.int16))[0] == 0x00
    assert wav.alaw_encode(np.array([0], np.int16))[0] == 0xD5
    assert wav._ALAW_DEC[0xD5] == 8  # A-law "+0" decodes to +8
    # quantization error bounded by the top-segment step
    rs = np.random.RandomState(1)
    x = rs.randint(-32768, 32768, 50000).astype(np.int16)
    assert np.abs(wav._MULAW_DEC[wav.mulaw_encode(x)].astype(np.int32)
                  - x).max() <= 1024
    assert np.abs(wav._ALAW_DEC[wav.alaw_encode(x)].astype(np.int32)
                  - x).max() <= 512


@pytest.mark.parametrize("codec,tag", [("mulaw", 7), ("alaw", 6)])
def test_g711_wav_container(codec, tag):
    rs = np.random.RandomState(3)
    s = rs.randint(-32768, 32768, (300, 2)).astype(np.int16)
    buf = wav.encode_wav(s, 8000, codec=codec)
    # container says 8-bit + the right tag + a fact chunk
    fmt_tag, ch, rate, _, ba, bits = struct.unpack("<HHIIHH", buf[20:36])
    assert (fmt_tag, ch, rate, ba, bits) == (tag, 2, 8000, 2, 8)
    assert b"fact" in buf[:64]
    out, r2 = wav.decode_wav(buf)
    assert r2 == 8000 and out.dtype == np.int16 and out.shape == (300, 2)
    tab = wav._MULAW_DEC if codec == "mulaw" else wav._ALAW_DEC
    enc = wav.mulaw_encode if codec == "mulaw" else wav.alaw_encode
    np.testing.assert_array_equal(out, tab[enc(s)])
    # features flow through the stage on companded audio
    t = pa.table({"audio": pa.array([buf], pa.binary())})
    f = audio.wav_features_batch(t)
    assert f["n_samples"][0].as_py() == 300


def test_g711_validation():
    with pytest.raises(ValueError):
        wav.encode_wav(np.zeros(4, np.int32), 8000, codec="mulaw")
    with pytest.raises(ValueError):
        wav.encode_wav(np.zeros(4, np.int16), 8000, codec="gsm")
    # 16-bit mulaw container is malformed
    buf = bytearray(wav.encode_wav(np.zeros(4, np.int16), 8000, codec="mulaw"))
    buf[34] = 16
    with pytest.raises(ValueError):
        wav.decode_wav(bytes(buf))


def test_adpcm_vectorized_matches_scalar_reference():
    """The block-vectorized decoder against a from-the-spec scalar walk."""
    def ref(data, ba):
        out = []
        for b0 in range(0, len(data) - ba + 1, ba):
            blk = data[b0:b0 + ba]
            pred = int.from_bytes(blk[:2], "little", signed=True)
            index = min(max(blk[2], 0), 88)
            out.append(pred)
            for j in range(4, ba):
                for nib in (blk[j] & 0xF, blk[j] >> 4):
                    step = int(wav._IMA_STEPS[index])
                    diff = step >> 3
                    if nib & 1:
                        diff += step >> 2
                    if nib & 2:
                        diff += step >> 1
                    if nib & 4:
                        diff += step
                    pred = pred - diff if nib & 8 else pred + diff
                    pred = max(-32768, min(32767, pred))
                    index = max(0, min(88, index + int(wav._IMA_INDEX[nib & 7])))
                    out.append(pred)
        return np.array(out, np.int16)

    rs = np.random.RandomState(7)
    for ba in (8, 64, 124):
        data = rs.randint(0, 256, 3 * ba, dtype=np.uint8).tobytes()
        np.testing.assert_array_equal(
            wav.adpcm_decode_blocks(data, ba), ref(data, ba))


def test_adpcm_container_roundtrip_and_stability():
    t = np.arange(3000)
    x = (11000 * np.sin(t / 25.0) + 2500 * np.sin(t / 6.0)).astype(np.int16)
    buf = wav.encode_wav(x, 16000, codec="adpcm")
    y, rate = wav.decode_wav(buf)
    assert rate == 16000 and y.shape == (3000, 1) and y.dtype == np.int16
    # lossy but close on a smooth signal: SNR >= 25 dB
    num = (x.astype(np.float64) ** 2).mean()
    den = ((y[:, 0].astype(np.float64) - x) ** 2).mean()
    assert 10 * np.log10(num / den) > 25
    # decode -> encode -> decode is a fixed point (states stay locked)
    y2, _ = wav.decode_wav(wav.encode_wav(y[:, 0], 16000, codec="adpcm"))
    np.testing.assert_array_equal(y2, y)
    # ~4.2x compression vs int16 PCM
    assert len(buf) < len(x) * 2 / 3.5


def test_adpcm_block_independence_and_validation():
    rs = np.random.RandomState(9)
    a = rs.randint(0, 256, 64, dtype=np.uint8).tobytes()
    b = rs.randint(0, 256, 64, dtype=np.uint8).tobytes()
    cat = wav.adpcm_decode_blocks(a + b, 64)
    np.testing.assert_array_equal(
        cat, np.concatenate([wav.adpcm_decode_blocks(a, 64),
                             wav.adpcm_decode_blocks(b, 64)]))
    with pytest.raises(ValueError):
        wav.adpcm_decode_blocks(a, 63)  # not a multiple of 4
    with pytest.raises(ValueError):
        wav.encode_wav(np.zeros((4, 2), np.int16), 8000, codec="adpcm")  # stereo
    with pytest.raises(ValueError):
        wav.encode_wav(np.zeros(4, np.int32), 8000, codec="adpcm")
    # 8-bit tag-17 container is malformed
    buf = bytearray(wav.encode_wav(np.zeros(600, np.int16), 8000, codec="adpcm"))
    buf[34] = 8
    with pytest.raises(ValueError):
        wav.decode_wav(bytes(buf))
