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
    good[i + 8:i + 10] = struct.pack("<H", 7)  # mu-law
    with pytest.raises(ValueError, match="format tag 7"):
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
