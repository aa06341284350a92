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

G.711 companded telephony formats are supported as first-class codecs
(they are fixed integer bit-manipulation, not entropy coding):
- WAVE_FORMAT_ALAW (6) and WAVE_FORMAT_MULAW (7), 8 bits per sample —
  decode expands to int16 through the ITU G.711 formulas (the public
  Sun g711.c semantics every toolchain ships); encode compands int16
  input via ``encode_wav(samples, rate, codec="mulaw"/"alaw")``.

Other compressed format tags (MP3, ADPCM, ...) fail loud: this is a
data-plane codec, not a media framework.
"""

from __future__ import annotations

import struct

import numpy as np

_PCM, _ALAW, _MULAW, _FLOAT, _EXTENSIBLE = 1, 6, 7, 3, 0xFFFE

# dtype -> (format tag, bits per sample)
_FMT_BY_DTYPE = {
    "uint8": (_PCM, 8), "int16": (_PCM, 16), "int32": (_PCM, 32),
    "float32": (_FLOAT, 32), "float64": (_FLOAT, 64),
}
_DTYPE_BY_FMT = {v: k for k, v in _FMT_BY_DTYPE.items()}

# WAVE_FORMAT_EXTENSIBLE SubFormat GUID suffix (KSDATAFORMAT_SUBTYPE_*)
_GUID_TAIL = b"\x00\x00\x10\x00\x80\x00\x00\xaa\x00\x38\x9b\x71"


def _mulaw_decode_table() -> np.ndarray:
    """256-entry µ-law byte -> int16 table (G.711 / g711.c ulaw2linear:
    u = ~b; t = (((u & 0xF) << 3) + 0x84) << ((u >> 4) & 7); ±(t - 0x84))."""
    b = np.arange(256, dtype=np.int32)
    u = ~b & 0xFF
    t = (((u & 0x0F) << 3) + 0x84) << ((u >> 4) & 7)
    return np.where(u & 0x80, 0x84 - t, t - 0x84).astype(np.int16)


def _alaw_decode_table() -> np.ndarray:
    """256-entry A-law byte -> int16 table (g711.c alaw2linear:
    a = b ^ 0x55; seg scaling of the mantissa; sign = a & 0x80 positive)."""
    b = np.arange(256, dtype=np.int32)
    a = b ^ 0x55
    seg = (a & 0x70) >> 4
    t = (a & 0x0F) << 4
    t = np.where(seg == 0, t + 8,
                 np.where(seg == 1, t + 0x108, (t + 0x108) << np.maximum(seg - 1, 0)))
    return np.where(a & 0x80, t, -t).astype(np.int16)


_MULAW_DEC = _mulaw_decode_table()
_ALAW_DEC = _alaw_decode_table()


def mulaw_encode(x: np.ndarray) -> np.ndarray:
    """int16 -> µ-law bytes (g711.c linear2ulaw: 14-bit clip at 8159,
    bias 33, segment by leading bit, mantissa 4 bits, ones-complement)."""
    v = np.asarray(x, np.int32) >> 2  # 16 -> 14 bit
    mask = np.where(v < 0, 0x7F, 0xFF)
    v = np.minimum(np.abs(np.where(v < 0, -v, v)), 8159) + 33
    # segment = position of the leading bit above bit 5 (thresholds
    # 0x3F..0x1FFF) — vectorized via digitize
    seg = np.digitize(v, [0x40, 0x80, 0x100, 0x200, 0x400, 0x800, 0x1000])
    uval = (seg << 4) | ((v >> (seg + 1)) & 0x0F)
    uval = np.where(v > 0x1FFF, 0x7F, uval)  # clipped full scale -> seg 8
    return (uval ^ mask).astype(np.uint8)


def alaw_encode(x: np.ndarray) -> np.ndarray:
    """int16 -> A-law bytes (g711.c linear2alaw: 13-bit domain, segment
    search, even-bit inversion with 0xD5/0x55 masks)."""
    v = np.asarray(x, np.int32) >> 3  # 16 -> 13 bit
    mask = np.where(v >= 0, 0xD5, 0x55)
    v = np.where(v >= 0, v, -v - 1)
    seg = np.digitize(v, [0x20, 0x40, 0x80, 0x100, 0x200, 0x400, 0x800])
    shift = np.maximum(seg, 1)  # segs 0 and 1 both shift by 1
    aval = (seg << 4) | ((v >> shift) & 0x0F)
    return (aval ^ mask).astype(np.uint8)


def encode_wav(samples: np.ndarray, sample_rate: int,
               codec: str | None = None) -> bytes:
    """(n,) or (n, channels) numpy samples + rate -> WAV bytes.  The dtype
    picks the on-disk format (uint8/int16/int32 PCM, float32/float64
    IEEE-float); frames are interleaved channel-major per spec.
    ``codec="mulaw"`` / ``"alaw"`` compands int16 input to 8-bit G.711."""
    s = np.ascontiguousarray(samples)
    if s.ndim == 1:
        s = s[:, None]
    if s.ndim != 2:
        raise ValueError(f"samples must be (n,) or (n, channels), got {s.shape}")
    if sample_rate <= 0:
        raise ValueError(f"sample_rate must be positive, got {sample_rate}")
    n, ch = s.shape
    if codec is not None:
        if codec not in ("mulaw", "alaw"):
            raise ValueError(f"unknown codec {codec!r} (mulaw or alaw)")
        if s.dtype != np.int16:
            raise ValueError(f"G.711 companding expects int16 input, got {s.dtype}")
        fmt_tag = _MULAW if codec == "mulaw" else _ALAW
        bits = 8
        data = (mulaw_encode(s) if codec == "mulaw" else alaw_encode(s)).tobytes()
    else:
        dtype = str(s.dtype)
        if dtype not in _FMT_BY_DTYPE:
            raise ValueError(
                f"unsupported sample dtype {dtype}; one of {sorted(_FMT_BY_DTYPE)}"
            )
        fmt_tag, bits = _FMT_BY_DTYPE[dtype]
        if s.dtype.byteorder == ">":
            s = s.astype(s.dtype.newbyteorder("<"))
        data = s.tobytes()  # row-major == interleaved frames
    block_align = ch * (bits // 8)
    byte_rate = sample_rate * block_align

    chunks = bytearray()
    chunks += struct.pack("<4sIHHIIHH", b"fmt ", 16, fmt_tag, ch,
                          sample_rate, byte_rate, block_align, bits)
    if fmt_tag != _PCM:  # fact chunk is required for non-PCM formats
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
    if fmt_tag in (_MULAW, _ALAW):
        if bits != 8:
            raise ValueError(f"G.711 WAV must be 8-bit, got {bits}")
        if ch < 1:
            raise ValueError(f"bad channel count {ch}")
        usable = len(data) - (len(data) % ch)
        b = np.frombuffer(data[:usable], dtype=np.uint8).reshape(-1, ch)
        table = _MULAW_DEC if fmt_tag == _MULAW else _ALAW_DEC
        return table[b], rate
    if fmt_tag not in (_PCM, _FLOAT):
        raise ValueError(
            f"unsupported WAV format tag {fmt_tag} (PCM, IEEE-float and "
            "G.711 mulaw/alaw only; entropy-coded audio is out of scope)"
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
