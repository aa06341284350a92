"""Audio-modality oracle queries: real WAV bitstreams in the loop.

The multimodal-audio counterpart of the image codec queries
(oracle_spatial.geotiff_roundtrip_stats, oracle_window image queries):
each document synthesizes a deterministic integer PCM waveform from pure
doc_id/sample-index arithmetic, round-trips it through ACTUAL RIFF/WAVE
bytes (functions/wav.py), and every emitted feature is computed from the
DECODED samples only — so DuckDB can recompute the features from the same
integer formulas and the comparison is exact.

Waveform (mono int16): for doc d with N(d) = 800 + (d % 5) * 160 samples
at rate sr(d) = 8000 + (d % 3) * 4000,

    v(d, i) = ((d + 1) * 104729 + i * 7919) % 65536 - 32768

— an LCG-ish full-range signal (104729 and 7919 are primes), integer-exact
on both sides.  SQL expands sample indices with a range() cross join
bounded by max N = 1440, no recursion.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from demeter_ray.functions import wav
from demeter_ray.sources.tables import read_table
from demeter_ray.pipelines.relational import register
from demeter_ray.stages import audio as audio_stage

_N_MAX = 1440  # 800 + 4*160

_V = "(((d.doc_id + 1) * 104729 + {i} * 7919) % 65536 - 32768)"

_WAV_FEATURES_SQL = f"""
WITH d AS (
  SELECT doc_id, 800 + (doc_id % 5) * 160 AS n,
         8000 + (doc_id % 3) * 4000 AS sr
  FROM documents
),
s AS (
  SELECT d.doc_id, d.n, d.sr, r.range AS i,
         {_V.format(i='r.range')} AS v,
         CASE WHEN r.range > 0 THEN {_V.format(i='(r.range - 1)')} END AS pv
  FROM d JOIN range({_N_MAX}) r ON r.range < d.n
)
SELECT doc_id,
       CAST(MIN(n) AS BIGINT) AS n_samples,
       CAST(MIN(sr) AS BIGINT) AS sample_rate,
       CAST(MIN(n) AS DOUBLE) / MIN(sr) AS duration_s,
       CAST(SUM(v * v) AS BIGINT) AS sum_sq,
       CAST(MAX(ABS(v)) AS BIGINT) AS peak_abs,
       CAST(SUM(CASE WHEN pv * v < 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS zero_crossings,
       CAST(SUM(v) AS DOUBLE) / MIN(n) AS mean_val
FROM s GROUP BY doc_id ORDER BY doc_id
"""


def _synth(doc_id: int) -> tuple[np.ndarray, int]:
    n = 800 + (doc_id % 5) * 160
    sr = 8000 + (doc_id % 3) * 4000
    i = np.arange(n, dtype=np.int64)
    v = ((doc_id + 1) * 104729 + i * 7919) % 65536 - 32768
    return v, sr


_FEAT_COLS = {"doc_id": np.int64, "n_samples": np.int64,
              "sample_rate": np.int64, "duration_s": np.float64,
              "sum_sq": np.int64, "peak_abs": np.int64,
              "zero_crossings": np.int64, "mean_val": np.float64}


@register("wav_audio_features", _WAV_FEATURES_SQL)
def wav_audio_features(sf_dir: str):
    """Per-document audio features THROUGH the WAV codec: synthesize the
    integer waveform, encode to real RIFF/WAVE bytes, decode back
    (asserting sample-exact roundtrip and rate/shape), and extract the
    feature row from the decoded stream via stages/audio.py.  SQL
    recomputes every feature from the waveform formula."""
    ds = read_table(sf_dir, "documents", columns=["doc_id"])

    def features(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        blobs = []
        for d in ids:
            v, sr = _synth(int(d))
            blob = wav.encode_wav(v.astype(np.int16), sr)
            s2, sr2 = wav.decode_wav(blob)
            # the roundtrip invariants ARE the operator: fail loud on drift
            assert sr2 == sr and s2.shape == (len(v), 1)
            assert np.array_equal(s2[:, 0].astype(np.int64), v)
            blobs.append(blob)
        t = pa.table({"doc_id": pa.array(ids, pa.int64()),
                      "audio": pa.array(blobs, pa.binary())})
        out = audio_stage.wav_features_batch(t, keep=("doc_id",))
        return out.drop_columns(["n_channels"])

    parts = (ds.map_batches(features, batch_format="pyarrow")
             .to_pandas())
    if parts.shape[1] == 0:
        return pd.DataFrame({c: pd.Series(dtype=t)
                             for c, t in _FEAT_COLS.items()})
    parts = parts[list(_FEAT_COLS)]
    for c, t in _FEAT_COLS.items():
        parts[c] = parts[c].astype(t)
    return parts.sort_values("doc_id").reset_index(drop=True)


_WAV_DECIMATE_SQL = f"""
WITH d AS (
  SELECT doc_id, 800 + (doc_id % 5) * 160 AS n,
         8000 + (doc_id % 3) * 4000 AS sr,
         2 + (doc_id % 3) AS k
  FROM documents
),
s AS (
  SELECT d.doc_id, d.n, d.sr, d.k,
         {_V.format(i='r.range')} AS v
  FROM d JOIN range({_N_MAX}) r
    ON r.range < d.n AND r.range % d.k = 0
)
SELECT doc_id,
       CAST(MIN(k) AS BIGINT) AS k,
       CAST(COUNT(*) AS BIGINT) AS n_out,
       CAST(MIN(sr) // MIN(k) AS BIGINT) AS rate_out,
       CAST(SUM(v * v) AS BIGINT) AS sum_sq,
       CAST(SUM(v) AS BIGINT) AS sum_val
FROM s GROUP BY doc_id ORDER BY doc_id
"""


@register("wav_decimate_stats", _WAV_DECIMATE_SQL)
def wav_decimate_stats(sf_dir: str):
    """Sample-rate normalization through the codec: decode the document's
    WAV, keep every k-th frame (k = 2 + doc_id % 3), re-encode at the
    reduced rate (stages/audio.decimate_wav), decode the RESULT, and emit
    stats from that second decode — two full WAV roundtrips per blob.  SQL
    recomputes from the formula filtered to i % k == 0."""
    ds = read_table(sf_dir, "documents", columns=["doc_id"])
    cols = {"doc_id": np.int64, "k": np.int64, "n_out": np.int64,
            "rate_out": np.int64, "sum_sq": np.int64, "sum_val": np.int64}

    def stats(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        rows: dict[str, list] = {c: [] for c in cols}
        for d in ids:
            v, sr = _synth(int(d))
            k = 2 + int(d) % 3
            blob = wav.encode_wav(v.astype(np.int16), sr)
            dec = audio_stage.decimate_wav(blob, k)
            s2, rate2 = wav.decode_wav(dec)
            assert rate2 == sr // k
            w = s2[:, 0].astype(np.int64)
            rows["doc_id"].append(int(d))
            rows["k"].append(k)
            rows["n_out"].append(len(w))
            rows["rate_out"].append(rate2)
            rows["sum_sq"].append(int((w * w).sum()))
            rows["sum_val"].append(int(w.sum()))
        return pa.table({c: pa.array(rows[c], pa.int64()) for c in cols})

    parts = ds.map_batches(stats, batch_format="pyarrow").to_pandas()
    if parts.shape[1] == 0:
        return pd.DataFrame({c: pd.Series(dtype=t) for c, t in cols.items()})
    for c, t in cols.items():
        parts[c] = parts[c].astype(t)
    return parts.sort_values("doc_id").reset_index(drop=True)


_G711_SQL = """
WITH s AS (
  SELECT d.doc_id, (d.doc_id * 7 + r.range * 13) % 256 AS b
  FROM documents d, range(240) r
  WHERE d.doc_id % 10 = 5
),
m AS (SELECT doc_id, b, 255 - b AS u, xor(b, 85) AS a FROM s),
dec AS (
  SELECT doc_id,
    CASE WHEN u >= 128 THEN 132 - (((u % 16) * 8 + 132) * (1 << ((u // 16) % 8)))
         ELSE (((u % 16) * 8 + 132) * (1 << ((u // 16) % 8))) - 132 END AS mu,
    (CASE WHEN (a // 16) % 8 = 0 THEN (a % 16) * 16 + 8
          WHEN (a // 16) % 8 = 1 THEN (a % 16) * 16 + 264
          ELSE ((a % 16) * 16 + 264) * (1 << (((a // 16) % 8) - 1)) END)
    * (CASE WHEN a >= 128 THEN 1 ELSE -1 END) AS al
  FROM m)
SELECT doc_id,
  CAST(SUM(mu) AS BIGINT) AS mu_sum,
  CAST(SUM(ABS(mu)) AS BIGINT) AS mu_abs,
  CAST(SUM(al) AS BIGINT) AS al_sum,
  CAST(SUM(ABS(al)) AS BIGINT) AS al_abs
FROM dec GROUP BY doc_id ORDER BY doc_id
"""


@register("g711_companded_audio", _G711_SQL)
def g711_companded_audio(sf_dir: str):
    """G.711 companded telephony audio in the driver loop: per doc
    (1-in-10 slice) a 240-byte companded stream b(i) = (7d + 13i) % 256 is
    wrapped as BOTH a mu-law (tag 7) and an A-law (tag 6) WAV container,
    expanded to int16 through functions/wav.py, and summed; SQL recomputes
    the ITU expansion formulas (bias-132 segment shift for mu-law,
    xor-0x55 segment scaling for A-law) byte-for-byte.  The stage also
    asserts the companding identity: re-encoding the decoded samples
    reproduces the byte stream (modulo the canonical mu-law 0x7F -> 0xFF
    negative-zero fold).  Integer-exact end-to-end."""
    import struct as _struct

    ds = read_table(sf_dir, "documents", columns=["doc_id"])
    cols = {"doc_id": np.int64, "mu_sum": np.int64, "mu_abs": np.int64,
            "al_sum": np.int64, "al_abs": np.int64}

    def _container(payload: bytes, tag: int) -> bytes:
        chunks = _struct.pack("<4sIHHIIHH", b"fmt ", 16, tag, 1, 8000,
                              8000, 1, 8)
        chunks += _struct.pack("<4sII", b"fact", 4, len(payload))
        chunks += _struct.pack("<4sI", b"data", len(payload)) + payload
        riff = b"WAVE" + chunks
        return _struct.pack("<4sI", b"RIFF", len(riff)) + riff

    def stats(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ids = ids[ids % 10 == 5]
        rows: dict[str, list] = {c: [] for c in cols}
        for d in ids:
            b = ((int(d) * 7 + np.arange(240, dtype=np.int64) * 13) % 256
                 ).astype(np.uint8)
            mu, r1 = wav.decode_wav(_container(b.tobytes(), 7))
            al, r2 = wav.decode_wav(_container(b.tobytes(), 6))
            assert r1 == r2 == 8000 and mu.shape == al.shape == (240, 1)
            mu = mu[:, 0].astype(np.int64)
            al = al[:, 0].astype(np.int64)
            # companding identity (the invariant that pins both coders)
            remu = wav.mulaw_encode(mu.astype(np.int16))
            fold = b == 0x7F
            assert np.array_equal(remu[~fold], b[~fold])
            assert (remu[fold] == 0xFF).all()
            assert np.array_equal(wav.alaw_encode(al.astype(np.int16)), b)
            rows["doc_id"].append(int(d))
            rows["mu_sum"].append(int(mu.sum()))
            rows["mu_abs"].append(int(np.abs(mu).sum()))
            rows["al_sum"].append(int(al.sum()))
            rows["al_abs"].append(int(np.abs(al).sum()))
        return pa.table({c: pa.array(rows[c], pa.int64()) for c in cols})

    parts = ds.map_batches(stats, batch_format="pyarrow").to_pandas()
    if parts.shape[1] == 0:
        return pd.DataFrame({c: pd.Series(dtype=t) for c, t in cols.items()})
    for c, t in cols.items():
        parts[c] = parts[c].astype(t)
    return parts.sort_values("doc_id").reset_index(drop=True)


# The IMA step recurrence, expressed in SQL: a recursive CTE carries
# (pred, index) per doc through all 240 nibbles, joining the 89-entry step
# table by index each iteration (built inline from functions/wav._IMA_STEPS).
_ADPCM_SQL = """
WITH RECURSIVE
docs AS (SELECT doc_id, ((doc_id * 257) % 4096) - 2048 AS p0, doc_id % 89 AS i0
         FROM documents WHERE doc_id % 10 = 4),
steps(si, sv) AS (VALUES (0,7),(1,8),(2,9),(3,10),(4,11),(5,12),(6,13),(7,14),(8,16),(9,17),(10,19),(11,21),(12,23),(13,25),(14,28),(15,31),(16,34),(17,37),(18,41),(19,45),(20,50),(21,55),(22,60),(23,66),(24,73),(25,80),(26,88),(27,97),(28,107),(29,118),(30,130),(31,143),(32,157),(33,173),(34,190),(35,209),(36,230),(37,253),(38,279),(39,307),(40,337),(41,371),(42,408),(43,449),(44,494),(45,544),(46,598),(47,658),(48,724),(49,796),(50,876),(51,963),(52,1060),(53,1166),(54,1282),(55,1411),(56,1552),(57,1707),(58,1878),(59,2066),(60,2272),(61,2499),(62,2749),(63,3024),(64,3327),(65,3660),(66,4026),(67,4428),(68,4871),(69,5358),(70,5894),(71,6484),(72,7132),(73,7845),(74,8630),(75,9493),(76,10442),(77,11487),(78,12635),(79,13899),(80,15289),(81,16818),(82,18500),(83,20350),(84,22385),(85,24623),(86,27086),(87,29794),(88,32767)),
dec(doc_id, t, pred, idx, acc_sum, acc_abs) AS (
  SELECT doc_id, 0, p0, i0, CAST(p0 AS BIGINT), CAST(ABS(p0) AS BIGINT)
  FROM docs
  UNION ALL
  SELECT d.doc_id, d.t + 1, u.pred2, u.idx2,
         d.acc_sum + u.pred2, d.acc_abs + ABS(u.pred2)
  FROM dec d
  JOIN steps s ON s.si = d.idx,
  LATERAL (
    SELECT GREATEST(-32768, LEAST(32767,
             CASE WHEN ((d.doc_id*3 + d.t*5) % 16) >= 8 THEN d.pred - (s.sv // 8 + CASE WHEN ((d.doc_id*3 + d.t*5) % 2) = 1 THEN s.sv // 4 ELSE 0 END + CASE WHEN (((d.doc_id*3 + d.t*5) // 2) % 2) = 1 THEN s.sv // 2 ELSE 0 END + CASE WHEN (((d.doc_id*3 + d.t*5) // 4) % 2) = 1 THEN s.sv ELSE 0 END)
                  ELSE d.pred + (s.sv // 8 + CASE WHEN ((d.doc_id*3 + d.t*5) % 2) = 1 THEN s.sv // 4 ELSE 0 END + CASE WHEN (((d.doc_id*3 + d.t*5) // 2) % 2) = 1 THEN s.sv // 2 ELSE 0 END + CASE WHEN (((d.doc_id*3 + d.t*5) // 4) % 2) = 1 THEN s.sv ELSE 0 END) END)) AS pred2,
           GREATEST(0, LEAST(88, d.idx +
             CASE ((d.doc_id*3 + d.t*5) % 8) WHEN 4 THEN 2 WHEN 5 THEN 4
                  WHEN 6 THEN 6 WHEN 7 THEN 8 ELSE -1 END)) AS idx2
  ) u
  WHERE d.t < 240
)
SELECT doc_id, acc_sum, acc_abs, CAST(pred AS BIGINT) AS final_pred
FROM dec WHERE t = 240 ORDER BY doc_id
"""


@register("ima_adpcm_decode", _ADPCM_SQL)
def ima_adpcm_decode(sf_dir: str):
    """IMA/DVI ADPCM (WAV format tag 17) in the driver loop: per doc
    (1-in-10 slice) a single 124-byte ADPCM block is hand-assembled with a
    formula seed predictor/step-index and formula nibbles, wrapped in a
    real tag-17 WAV container (fmt cbSize=2 + wSamplesPerBlock, fact
    chunk), and decoded through the block-vectorized recurrence in
    functions/wav.py.  SQL re-runs the SAME recurrence via a recursive CTE
    over the step table — 241 exact int16 states per doc — so any drift in
    the step/index/clamp logic fails the value hash.  Container metadata
    (rate, fact-trimmed frame count, dtype) is asserted in-stage; the
    coder's decode->encode->decode stability is pinned in unit tests.
    Integer-exact."""
    import struct as _struct

    ds = read_table(sf_dir, "documents", columns=["doc_id"])
    cols = {"doc_id": np.int64, "acc_sum": np.int64, "acc_abs": np.int64,
            "final_pred": np.int64}

    def _container(block: bytes) -> bytes:
        chunks = _struct.pack("<4sIHHIIHHHH", b"fmt ", 20, 17, 1, 8000,
                              (8000 * 124) // 241, 124, 4, 2, 241)
        chunks += _struct.pack("<4sII", b"fact", 4, 241)
        chunks += _struct.pack("<4sI", b"data", len(block)) + block
        riff = b"WAVE" + bytes(chunks)
        return _struct.pack("<4sI", b"RIFF", len(riff)) + riff

    def stats(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ids = ids[ids % 10 == 4]
        rows: dict[str, list] = {c: [] for c in cols}
        for d in ids:
            d = int(d)
            p0 = ((d * 257) % 4096) - 2048
            i0 = d % 89
            nib = (d * 3 + np.arange(240, dtype=np.int64) * 5) % 16
            by = (nib[0::2] | (nib[1::2] << 4)).astype(np.uint8)
            blk = (p0.to_bytes(2, "little", signed=True) + bytes([i0, 0])
                   + by.tobytes())
            s, rate = wav.decode_wav(_container(blk))
            assert rate == 8000 and s.shape == (241, 1) and s.dtype == np.int16
            v = s[:, 0].astype(np.int64)
            rows["doc_id"].append(d)
            rows["acc_sum"].append(int(v.sum()))
            rows["acc_abs"].append(int(np.abs(v).sum()))
            rows["final_pred"].append(int(v[-1]))
        return pa.table({c: pa.array(rows[c], pa.int64()) for c in cols})

    parts = ds.map_batches(stats, batch_format="pyarrow").to_pandas()
    if parts.shape[1] == 0:
        return pd.DataFrame({c: pd.Series(dtype=t) for c, t in cols.items()})
    for c, t in cols.items():
        parts[c] = parts[c].astype(t)
    return parts.sort_values("doc_id").reset_index(drop=True)


# Interleaved A/V demux: the audio samples are pure doc_id/index integer
# arithmetic, so the demuxed stream's stats are SQL-exact.
_AVI_AUDIO_SQL = """
WITH d AS (
  SELECT doc_id, 40 + (doc_id % 4) * 10 AS n,
         8000 + (doc_id % 2) * 4000 AS sr
  FROM documents WHERE doc_id % 7 = 2
), s AS (
  SELECT d.doc_id, d.n, d.sr,
         ((d.doc_id * 31 + i.i * 17) % 65536 - 32768) AS v
  FROM d JOIN generate_series(0, 69) AS i(i) ON i.i < d.n
)
SELECT doc_id, CAST(n AS BIGINT) AS n_samples, CAST(sr AS BIGINT) AS rate,
       CAST(SUM(v) AS BIGINT) AS s_sum, CAST(SUM(ABS(v)) AS BIGINT) AS s_abs
FROM s GROUP BY doc_id, n, sr ORDER BY doc_id
"""


@register("avi_audio_demux", _AVI_AUDIO_SQL)
def avi_audio_demux(sf_dir: str):
    """Interleaved A/V container demux (functions/avi.py): per doc (1-in-7
    slice) a formula-seeded mono int16 waveform is muxed into a real
    RIFF/AVI alongside 4 DIB video frames (per-frame ``01wb`` interleave +
    idx1), then demuxed back through the index.  The demuxed stream is
    asserted sample-exact against the source and the video frames are
    asserted unperturbed by the interleave; the emitted per-doc stats
    (count, rate, sum, abs-sum) are recomputed by SQL from the same
    integer formula.  Integer-exact."""
    from demeter_ray.functions import avi as avifns
    from demeter_ray.functions import codec as codecfns

    ds = read_table(sf_dir, "documents", columns=["doc_id"])
    cols = {"doc_id": "int64", "n_samples": "int64", "rate": "int64",
            "s_sum": "int64", "s_abs": "int64"}

    def stats(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ids = ids[ids % 7 == 2]
        rows: dict[str, list] = {c: [] for c in cols}
        for d in ids:
            d = int(d)
            n = 40 + (d % 4) * 10
            sr = 8000 + (d % 2) * 4000
            v = (d * 31 + np.arange(n, dtype=np.int64) * 17) % 65536 - 32768
            samples = v.astype(np.int16)
            frames = codecfns.generate_pixels_batch(
                d * 11 + np.arange(4, dtype=np.int64), 8, 8)
            blob = avifns.encode_avi(frames, fps=4, codec="dib",
                                     audio=(samples, sr))
            out, rate = avifns.avi_audio(blob)
            assert rate == sr and out.shape == (n, 1)
            assert (out[:, 0] == samples).all(), "A/V demux lost samples"
            assert (avifns.decode_avi(blob) == frames).all(), \
                "audio interleave perturbed video chunks"
            rows["doc_id"].append(d)
            rows["n_samples"].append(n)
            rows["rate"].append(sr)
            rows["s_sum"].append(int(v.sum()))
            rows["s_abs"].append(int(np.abs(v).sum()))
        return pa.table({c: pa.array(rows[c], pa.int64()) for c in cols})

    parts = ds.map_batches(stats, batch_format="pyarrow").to_pandas()
    if parts.shape[1] == 0:
        return pd.DataFrame({c: pd.Series(dtype=t) for c, t in cols.items()})
    for c, t in cols.items():
        parts[c] = parts[c].astype(t)
    return parts.sort_values("doc_id").reset_index(drop=True)
