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
