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

IMA/DVI ADPCM (format tag 17) is supported mono: 4-bit differential
coding in independent block_align-sized blocks (4-byte header carrying
the block's seed predictor + step index, then low-nibble-first 4-bit
codes).  Decode runs the standard step-table recurrence VECTORIZED
ACROSS BLOCKS (one short numpy loop over nibble positions, all blocks in
parallel — the block independence that makes the format seekable is what
makes it data-parallel here).  Encode via ``encode_wav(samples, rate,
codec="adpcm")``.

Entropy-coded format tags (MP3, GSM, ...) fail loud: this is a
data-plane codec, not a media framework.
"""

from __future__ import annotations

import struct

import numpy as np

_PCM, _ALAW, _MULAW, _FLOAT, _ADPCM, _EXTENSIBLE = 1, 6, 7, 3, 17, 0xFFFE

# IMA ADPCM tables (IMA Recommended Practices / Microsoft WAV tag 17)
_IMA_STEPS = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767], dtype=np.int64)
_IMA_INDEX = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int64)


def _ima_step(pred: np.ndarray, index: np.ndarray, nib: np.ndarray):
    """One IMA recurrence step, vectorized over blocks: (pred, index) +
    nibble -> updated (pred, index).  All int64."""
    step = _IMA_STEPS[index]
    diff = step >> 3
    diff += np.where(nib & 1, step >> 2, 0)
    diff += np.where(nib & 2, step >> 1, 0)
    diff += np.where(nib & 4, step, 0)
    pred = np.clip(np.where(nib & 8, pred - diff, pred + diff), -32768, 32767)
    index = np.clip(index + _IMA_INDEX[nib & 7], 0, 88)
    return pred, index


def adpcm_decode_blocks(data: bytes, block_align: int) -> np.ndarray:
    """Mono IMA ADPCM block stream -> int16 samples.  Trailing partial
    block bytes are ignored (the spec pads to whole blocks)."""
    if block_align < 5 or block_align % 4:
        raise ValueError(f"bad IMA ADPCM block align {block_align}")
    n_blocks = len(data) // block_align
    if n_blocks == 0:
        return np.zeros(0, np.int16)
    raw = np.frombuffer(data[: n_blocks * block_align], np.uint8)
    raw = raw.reshape(n_blocks, block_align)
    pred = raw[:, :2].copy().view("<i2")[:, 0].astype(np.int64)
    index = np.clip(raw[:, 2].astype(np.int64), 0, 88)
    nib_bytes = raw[:, 4:]
    spb = 1 + (block_align - 4) * 2  # samples per block incl. the seed
    out = np.empty((n_blocks, spb), np.int64)
    out[:, 0] = pred
    # low nibble first, then high — one vectorized step per nibble position
    for j in range(block_align - 4):
        b = nib_bytes[:, j].astype(np.int64)
        pred, index = _ima_step(pred, index, b & 0x0F)
        out[:, 1 + 2 * j] = pred
        pred, index = _ima_step(pred, index, b >> 4)
        out[:, 2 + 2 * j] = pred
    return out.reshape(-1).astype(np.int16)


def adpcm_encode_blocks(samples: np.ndarray, block_align: int = 256) -> bytes:
    """int16 mono -> IMA ADPCM block stream (the standard greedy coder:
    quantize diff against the current step, then run the decoder update so
    encoder and decoder states stay locked).  The tail is zero-padded to a
    whole block; samples-per-block = 1 + (block_align - 4) * 2."""
    if block_align < 5 or block_align % 4:
        raise ValueError(f"bad IMA ADPCM block align {block_align}")
    x = np.asarray(samples)
    if x.dtype != np.int16 or x.ndim != 1:
        raise ValueError(f"ADPCM encode wants 1-D int16, got {x.dtype}/{x.ndim}D")
    if len(x) == 0:
        return b""
    spb = 1 + (block_align - 4) * 2
    n_blocks = -(-len(x) // spb)
    padded = np.zeros(n_blocks * spb, np.int64)
    padded[: len(x)] = x
    blocks = padded.reshape(n_blocks, spb)
    pred = blocks[:, 0].copy()
    index = np.zeros(n_blocks, np.int64)
    out = np.zeros((n_blocks, block_align), np.uint8)
    out[:, :2] = pred.astype("<i2").view(np.uint8).reshape(n_blocks, 2)
    # header index seeds 0 (encoder restarts each block — spec-legal and
    # what keeps blocks independently decodable)
    nibs = np.empty((n_blocks, (block_align - 4) * 2), np.int64)
    for t in range(spb - 1):
        step = _IMA_STEPS[index]
        diff = blocks[:, t + 1] - pred
        nib = np.where(diff < 0, 8, 0)
        ad = np.abs(diff)
        take = ad >= step
        nib = nib | np.where(take, 4, 0)
        ad = ad - np.where(take, step, 0)
        take = ad >= step >> 1
        nib = nib | np.where(take, 2, 0)
        ad = ad - np.where(take, step >> 1, 0)
        nib = nib | np.where(ad >= step >> 2, 1, 0)
        pred, index = _ima_step(pred, index, nib)
        nibs[:, t] = nib
    out[:, 4:] = (nibs[:, 0::2] | (nibs[:, 1::2] << 4)).astype(np.uint8)
    return out.tobytes()

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
    if codec == "adpcm":
        if s.dtype != np.int16:
            raise ValueError(f"IMA ADPCM expects int16 input, got {s.dtype}")
        if ch != 1:
            raise ValueError("IMA ADPCM encode is mono-only")
        block_align = 256
        spb = 1 + (block_align - 4) * 2
        data = adpcm_encode_blocks(s[:, 0], block_align)
        byte_rate = max(1, (sample_rate * block_align) // spb)
        chunks = bytearray()
        chunks += struct.pack("<4sIHHIIHHHH", b"fmt ", 20, _ADPCM, 1,
                              sample_rate, byte_rate, block_align, 4, 2, spb)
        chunks += struct.pack("<4sII", b"fact", 4, n)
        chunks += struct.pack("<4sI", b"data", len(data)) + data
        if len(data) % 2:
            chunks += b"\x00"
        riff = b"WAVE" + bytes(chunks)
        return struct.pack("<4sI", b"RIFF", len(riff)) + riff
    if codec is not None:
        if codec not in ("mulaw", "alaw"):
            raise ValueError(f"unknown codec {codec!r} (mulaw, alaw or adpcm)")
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
    fact_n = None
    while pos + 8 <= len(buf):
        cid, size = struct.unpack("<4sI", buf[pos : pos + 8])
        body = buf[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise ValueError(f"truncated {cid!r} chunk: {len(body)} < {size}")
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        elif cid == b"fact" and size >= 4:
            (fact_n,) = struct.unpack("<I", body[:4])
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
    if fmt_tag == _ADPCM:
        if bits != 4:
            raise ValueError(f"IMA ADPCM WAV must be 4-bit, got {bits}")
        if ch != 1:
            raise ValueError("IMA ADPCM decode is mono-only")
        s = adpcm_decode_blocks(data, _balign)
        if fact_n is not None:  # fact carries the true frame count (the
            s = s[:fact_n]      # final block is zero-padded on encode)
        return s[:, None], rate
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
