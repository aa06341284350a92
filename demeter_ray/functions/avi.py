"""Pure-stdlib RIFF/AVI video container for the multimodal video column.

Makes the video leg REAL the way image (functions/png.py, functions/
jpeg.py) and audio (functions/wav.py) already are: actual AVI bitstreams
assembled and parsed with struct + numpy, no media framework (none exists
in this environment).  Reference analog: demeter treats media as opaque
binary columns with typed metadata; frame extraction is an actor-pool
map_batches stage (stages/images.py).

Scope — the two frame codings that need no licensing-era entropy formats:

- ``MJPG`` (Motion JPEG): each ``00dc`` chunk is a self-contained baseline
  JFIF frame, encoded/decoded by functions/jpeg.py.  Lossy; roundtrip is
  held to the north rule's PSNR >= 40 dB bar by the same tables the image
  leg uses.
- ``DIB `` / BI_RGB (uncompressed device-independent bitmaps): each
  ``00db`` chunk is bottom-up BGR rows padded to 4 bytes — the classic
  uncompressed-AVI layout (shared with functions/bmp.py's 24-bit path).
  Lossless, so oracle checks can be exact.

The container carries the standard header tree (``hdrl`` LIST with
``avih`` + one ``strl`` holding ``strh``/``strf``-BITMAPINFOHEADER), the
``movi`` LIST of word-aligned frame chunks, and an ``idx1`` index.  The
index is the SCALE feature: ``sample_avi_frames(buf, every=k)`` walks
``idx1`` and decodes ONLY the sampled chunks — on a real store that is a
ranged read per sampled frame, not a scan of the stream (pinned in tests
by corrupting non-sampled frame bytes).  Entropy-coded strm handlers
other than MJPG/DIB fail loud; audio streams inside the AVI are skipped
structurally (``wb`` chunks are indexed but not decoded here — the WAV
codec owns audio semantics).
"""

from __future__ import annotations

import struct

import numpy as np

from demeter_ray.functions import jpeg as _jpeg

AVI_MAGIC = b"RIFF"
_AVIF_HASINDEX = 0x00000010
_AVIIF_KEYFRAME = 0x00000010

_AVIH_FMT = "<IIIIIIIIII4I"  # 56 bytes
_STRH_FMT = "<4s4sIHHIIIIIIII4h"  # 56 bytes
_BIH_FMT = "<IiiHH4sIiiII"  # 40-byte BITMAPINFOHEADER


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) & 1 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(fourcc: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", fourcc + payload)


def _dib_rows(frame: np.ndarray) -> bytes:
    """HxWx3 RGB uint8 -> bottom-up BGR rows padded to 4 bytes."""
    h, w, _ = frame.shape
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), np.uint8)
    rows[:, : w * 3] = frame[::-1, :, ::-1].reshape(h, w * 3)
    return rows.tobytes()


def _dib_undo(payload: bytes, w: int, h: int) -> np.ndarray:
    stride = (w * 3 + 3) & ~3
    if len(payload) < stride * h:
        raise ValueError("DIB frame chunk shorter than its geometry")
    rows = np.frombuffer(payload, np.uint8, count=stride * h).reshape(h, stride)
    return rows[::-1, : w * 3].reshape(h, w, 3)[:, :, ::-1]


def encode_avi(frames: np.ndarray, fps: int = 25, codec: str = "mjpg",
               quality: float = 1.0,
               audio: tuple[np.ndarray, int] | None = None) -> bytes:
    """(N,H,W,3) uint8 RGB frames -> AVI bytes.  codec 'mjpg' (JPEG
    chunks, lossy ~45 dB) or 'dib' (uncompressed BI_RGB, lossless).

    ``audio=(samples, rate)`` adds a second stream (``auds``, PCM int16,
    mono 1-D or (n, channels)) interleaved per video frame as ``01wb``
    chunks — the standard A/V interleave every muxer emits.  Demux with
    ``avi_audio``."""
    frames = np.asarray(frames)
    if frames.dtype != np.uint8 or frames.ndim != 4 or frames.shape[3] != 3:
        raise ValueError("encode_avi wants (N,H,W,3) uint8 RGB")
    n, h, w, _ = frames.shape
    if codec == "mjpg":
        handler, ckid, compression = b"MJPG", b"00dc", b"MJPG"
        payloads = _jpeg.encode_jpeg_batch(frames, quality)
        bitcount = 24
    elif codec == "dib":
        handler, ckid, compression = b"DIB ", b"00db", b"\x00\x00\x00\x00"
        payloads = [_dib_rows(f) for f in frames]
        bitcount = 24
    else:
        raise ValueError(f"unknown AVI codec {codec!r} (mjpg|dib)")

    audio_slices: list[bytes] = []
    audio_strl = b""
    n_streams = 1
    if audio is not None:
        samples, rate = audio
        samples = np.asarray(samples)
        if samples.dtype != np.int16:
            raise ValueError("AVI audio stream must be int16 PCM")
        if samples.ndim == 1:
            samples = samples[:, None]
        n_ch = samples.shape[1]
        block = 2 * n_ch
        # split samples across frames: samples i*S//n .. (i+1)*S//n, so the
        # interleave is even and the concatenation is the exact original.
        total = samples.shape[0]
        cuts = [(i * total) // max(n, 1) for i in range(n + 1)]
        audio_slices = [samples[cuts[i]:cuts[i + 1]].tobytes() for i in range(n)]
        strh_a = _chunk(b"strh", struct.pack(
            _STRH_FMT, b"auds", b"\x00\x00\x00\x00", 0, 0, 0, 0, 1, rate, 0,
            total, max((len(s) for s in audio_slices), default=0), 0xFFFFFFFF,
            block, 0, 0, 0, 0))
        strf_a = _chunk(b"strf", struct.pack(
            "<HHIIHH", 1, n_ch, rate, rate * block, block, 16))  # WAVEFORMATEX/PCM
        audio_strl = _list(b"strl", strh_a + strf_a)
        n_streams = 2

    max_bytes = max(len(p) for p in payloads) if payloads else 0
    avih = _chunk(b"avih", struct.pack(
        _AVIH_FMT, 1_000_000 // fps, max_bytes * fps, 0, _AVIF_HASINDEX,
        n, 0, n_streams, max_bytes, w, h, 0, 0, 0, 0))
    strh = _chunk(b"strh", struct.pack(
        _STRH_FMT, b"vids", handler, 0, 0, 0, 0, 1, fps, 0, n,
        max_bytes, 0xFFFFFFFF, 0, 0, 0, w, h))
    strf = _chunk(b"strf", struct.pack(
        _BIH_FMT, 40, w, h, 1, bitcount, compression, (w * 3 + 3 & ~3) * h,
        0, 0, 0, 0))
    hdrl = _list(b"hdrl", avih + _list(b"strl", strh + strf) + audio_strl)

    movi_body = bytearray()
    index = bytearray()
    for i, p in enumerate(payloads):
        # idx1 offsets point at the chunk fourcc, relative to the 'movi'
        # fourcc position — the convention every reader accepts.
        off = 4 + len(movi_body)
        index += struct.pack("<4sIII", ckid, _AVIIF_KEYFRAME, off, len(p))
        movi_body += _chunk(ckid, p)
        if audio_slices and audio_slices[i]:
            a = audio_slices[i]
            off = 4 + len(movi_body)
            index += struct.pack("<4sIII", b"01wb", 0, off, len(a))
            movi_body += _chunk(b"01wb", a)
    movi = _list(b"movi", bytes(movi_body))
    body = b"AVI " + hdrl + movi + _chunk(b"idx1", bytes(index))
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _walk(buf: bytes, start: int, end: int):
    """Yield (fourcc, payload_off, size) for chunks in buf[start:end]."""
    off = start
    while off + 8 <= end:
        fourcc, size = buf[off:off + 4], struct.unpack_from("<I", buf, off + 4)[0]
        if off + 8 + size > end:
            raise ValueError(f"chunk {fourcc!r} overruns its container")
        yield fourcc, off + 8, size
        off += 8 + size + (size & 1)


def avi_meta(buf: bytes) -> dict:
    """Parse headers only: dict with n_frames, width, height, fps, codec,
    movi byte span and idx1 entries — no frame decode."""
    if bytes(buf[:4]) != AVI_MAGIC or bytes(buf[8:12]) != b"AVI ":
        raise ValueError("not a RIFF/AVI stream")
    riff_size = struct.unpack_from("<I", buf, 4)[0]
    end = min(8 + riff_size, len(buf))
    meta: dict = {"movi": None, "idx1": [], "codec": None}
    for fourcc, poff, size in _walk(buf, 12, end):
        if fourcc == b"LIST":
            kind = bytes(buf[poff:poff + 4])
            if kind == b"hdrl":
                _parse_hdrl(buf, poff + 4, poff + size, meta)
            elif kind == b"movi":
                meta["movi"] = (poff, poff + size)
        elif fourcc == b"idx1":
            for i in range(poff, poff + size - 15, 16):
                ckid, flags, coff, clen = struct.unpack_from("<4sIII", buf, i)
                meta["idx1"].append((bytes(ckid), coff, clen))
    for key in ("n_frames", "width", "height"):
        if key not in meta:
            raise ValueError("AVI missing hdrl headers")
    if meta["movi"] is None:
        raise ValueError("AVI missing movi LIST")
    return meta


def _parse_hdrl(buf: bytes, start: int, end: int, meta: dict) -> None:
    for fourcc, poff, size in _walk(buf, start, end):
        if fourcc == b"avih":
            vals = struct.unpack_from(_AVIH_FMT, buf, poff)
            meta["n_frames"], meta["width"], meta["height"] = vals[4], vals[8], vals[9]
            meta["fps"] = round(1_000_000 / vals[0]) if vals[0] else 0
        elif fourcc == b"LIST" and bytes(buf[poff:poff + 4]) == b"strl":
            fcc_type = None
            for f2, p2, s2 in _walk(buf, poff + 4, poff + size):
                if f2 == b"strh":
                    fcc_type, handler = struct.unpack_from("<4s4s", buf, p2)
                    if fcc_type == b"vids":
                        meta["codec"] = bytes(handler).strip(b"\x00 ").upper() or b"DIB"
                elif f2 == b"strf" and fcc_type == b"vids":
                    bih = struct.unpack_from(_BIH_FMT, buf, p2)
                    meta["strf_w"], meta["strf_h"] = bih[1], abs(bih[2])
                    meta["bitcount"], meta["compression"] = bih[4], bytes(bih[5])
                elif f2 == b"strf" and fcc_type == b"auds":
                    tag, n_ch, rate, _bps, _ba, bits = struct.unpack_from(
                        "<HHIIHH", buf, p2)
                    if tag != 1 or bits != 16:
                        raise ValueError(
                            f"AVI audio stream is format tag {tag}/{bits}-bit; "
                            "only PCM int16 is supported here")
                    meta["audio"] = {"channels": n_ch, "rate": rate}


def _decode_frame(buf: bytes, ckid: bytes, poff: int, size: int,
                  w: int, h: int) -> np.ndarray:
    payload = buf[poff:poff + size]
    if ckid.endswith(b"dc"):
        if bytes(payload[:2]) != _jpeg.SOI:
            raise ValueError("MJPG chunk without JPEG SOI")
        return _jpeg.decode_jpeg(payload)
    if ckid.endswith(b"db"):
        return _dib_undo(payload, w, h)
    raise ValueError(f"unsupported AVI frame chunk {ckid!r}")


def _video_entries(meta: dict) -> list:
    ents = [e for e in meta["idx1"] if e[0][2:] in (b"dc", b"db")]
    if not ents:
        raise ValueError("AVI idx1 carries no video frames")
    return ents


def sample_avi_frames(buf: bytes, every: int = 1, offset: int = 0) -> np.ndarray:
    """Decode every ``every``-th video frame (starting at ``offset``) by
    seeking through idx1 — only the sampled chunks' bytes are touched.
    Returns (K,H,W,3) uint8."""
    meta = avi_meta(buf)
    movi0 = meta["movi"][0]
    w, h = meta["width"], meta["height"]
    ents = _video_entries(meta)[offset::every]
    out = np.empty((len(ents), h, w, 3), np.uint8)
    for i, (ckid, coff, clen) in enumerate(ents):
        # idx1 offset points at the chunk fourcc relative to the 'movi'
        # fourcc; verify the header there instead of trusting it blindly.
        at = movi0 + coff
        if bytes(buf[at:at + 4]) != ckid:
            raise ValueError("idx1 offset does not land on its chunk")
        out[i] = _decode_frame(buf, ckid, at + 8, clen, w, h)
    return out


def decode_avi(buf: bytes) -> np.ndarray:
    """All video frames, in stream order, via the index."""
    return sample_avi_frames(buf, every=1)


def avi_audio(buf: bytes) -> tuple[np.ndarray, int]:
    """Demux the PCM audio stream: concatenate the ``..wb`` chunks through
    the index -> ((n, channels) int16, rate).  Feeds the same feature
    stages the WAV codec does (stages/audio.py)."""
    meta = avi_meta(buf)
    if "audio" not in meta:
        raise ValueError("AVI has no audio stream")
    movi0 = meta["movi"][0]
    n_ch, rate = meta["audio"]["channels"], meta["audio"]["rate"]
    parts = []
    for ckid, coff, clen in meta["idx1"]:
        if ckid.endswith(b"wb"):
            at = movi0 + coff
            if bytes(buf[at:at + 4]) != ckid:
                raise ValueError("idx1 offset does not land on its chunk")
            parts.append(np.frombuffer(buf, np.int16, count=clen // 2,
                                       offset=at + 8))
    samples = (np.concatenate(parts) if parts
               else np.zeros(0, np.int16)).reshape(-1, n_ch)
    return samples, rate


def avi_dims(buf: bytes) -> tuple[int, int]:
    meta = avi_meta(buf)
    return meta["width"], meta["height"]


def avi_frame_count(buf: bytes) -> int:
    return len(_video_entries(avi_meta(buf)))
