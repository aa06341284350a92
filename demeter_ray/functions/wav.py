"""Pure-stdlib RIFF/WAVE PCM codec for the multimodal audio column.

The reference's multimodal posture treats media as opaque binary columns
with typed metadata; this engine makes the audio leg REAL the same way the
image leg is (functions/png.py, functions/jpeg.py): actual WAV bitstreams
assembled and parsed with struct + numpy, no third-party audio library
(none exists in this environment).

Scope — the uncompressed formats that cover interchange WAV files:
- WAVE_FORMAT_PCM (1): uint8, int16, int32 samples;
- WAVE_FORMAT_IEEE_FLOAT (3): float32, float64 (fact chunk emitted per
  spec);
- WAVE_FORMAT_EXTENSIBLE (0xFFFE) on decode, mapped through the SubFormat
  GUID to PCM / float;
- any channel count, interleaved frames; chunk walker skips LIST/fact/cue
  and honors odd-size chunk padding.

Compressed format tags (a-law, mu-law, MP3, ADPCM, ...) fail loud: this is
a data-plane codec, not a media framework.
"""

from __future__ import annotations

import struct

import numpy as np

_PCM, _FLOAT, _EXTENSIBLE = 1, 3, 0xFFFE

# dtype -> (format tag, bits per sample)
_FMT_BY_DTYPE = {
    "uint8": (_PCM, 8), "int16": (_PCM, 16), "int32": (_PCM, 32),
    "float32": (_FLOAT, 32), "float64": (_FLOAT, 64),
}
_DTYPE_BY_FMT = {v: k for k, v in _FMT_BY_DTYPE.items()}

# WAVE_FORMAT_EXTENSIBLE SubFormat GUID suffix (KSDATAFORMAT_SUBTYPE_*)
_GUID_TAIL = b"\x00\x00\x10\x00\x80\x00\x00\xaa\x00\x38\x9b\x71"


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """(n,) or (n, channels) numpy samples + rate -> WAV bytes.  The dtype
    picks the on-disk format (uint8/int16/int32 PCM, float32/float64
    IEEE-float); frames are interleaved channel-major per spec."""
    s = np.ascontiguousarray(samples)
    if s.ndim == 1:
        s = s[:, None]
    if s.ndim != 2:
        raise ValueError(f"samples must be (n,) or (n, channels), got {s.shape}")
    dtype = str(s.dtype)
    if dtype not in _FMT_BY_DTYPE:
        raise ValueError(
            f"unsupported sample dtype {dtype}; one of {sorted(_FMT_BY_DTYPE)}"
        )
    if sample_rate <= 0:
        raise ValueError(f"sample_rate must be positive, got {sample_rate}")
    fmt_tag, bits = _FMT_BY_DTYPE[dtype]
    n, ch = s.shape
    if s.dtype.byteorder == ">":
        s = s.astype(s.dtype.newbyteorder("<"))
    data = s.tobytes()  # row-major == interleaved frames
    block_align = ch * (bits // 8)
    byte_rate = sample_rate * block_align

    chunks = bytearray()
    chunks += struct.pack("<4sIHHIIHH", b"fmt ", 16, fmt_tag, ch,
                          sample_rate, byte_rate, block_align, bits)
    if fmt_tag == _FLOAT:  # fact chunk is required for non-PCM formats
        chunks += struct.pack("<4sII", b"fact", 4, n)
    chunks += struct.pack("<4sI", b"data", len(data)) + data
    if len(data) % 2:
        chunks += b"\x00"  # chunk payloads are word-aligned
    riff = b"WAVE" + bytes(chunks)
    return struct.pack("<4sI", b"RIFF", len(riff)) + riff


def decode_wav(buf: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> ((n, channels) numpy samples, sample_rate).  Walks the
    chunk list (skipping LIST/fact/cue/...), accepts PCM / IEEE-float /
    EXTENSIBLE-wrapped formats, fails loud on compressed tags."""
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a WAV: missing RIFF/WAVE header")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(buf):
        cid, size = struct.unpack("<4sI", buf[pos : pos + 8])
        body = buf[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise ValueError(f"truncated {cid!r} chunk: {len(body)} < {size}")
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size % 2)  # odd chunks are padded
    if fmt is None or data is None:
        raise ValueError("WAV lacks fmt/data chunks")
    if len(fmt) < 16:
        raise ValueError(f"fmt chunk too short ({len(fmt)} bytes)")
    fmt_tag, ch, rate, _brate, _balign, bits = struct.unpack("<HHIIHH", fmt[:16])
    if fmt_tag == _EXTENSIBLE:
        if len(fmt) < 40:
            raise ValueError("EXTENSIBLE fmt chunk lacks the SubFormat GUID")
        sub_tag, = struct.unpack("<H", fmt[24:26])
        if fmt[28:40] != _GUID_TAIL:
            raise ValueError("EXTENSIBLE SubFormat GUID is not PCM/float")
        fmt_tag = sub_tag
        vbits, = struct.unpack("<H", fmt[18:20])
        if vbits:
            bits = vbits
    if fmt_tag not in (_PCM, _FLOAT):
        raise ValueError(
            f"unsupported WAV format tag {fmt_tag} (PCM and IEEE-float only; "
            "compressed audio is out of scope)"
        )
    key = (fmt_tag, bits)
    if key not in _DTYPE_BY_FMT:
        raise ValueError(f"unsupported (format, bits) {key}")
    if ch < 1:
        raise ValueError(f"bad channel count {ch}")
    dtype = np.dtype(_DTYPE_BY_FMT[key])
    frame = ch * dtype.itemsize
    usable = len(data) - (len(data) % frame)
    s = np.frombuffer(data[:usable], dtype=dtype).reshape(-1, ch)
    return s, rate
