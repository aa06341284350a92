"""Audio feature extraction over a binary WAV column.

The multimodal-audio analog of stages/images.py: a Dataset with an opaque
``binary`` audio column flows through a vectorized-per-blob map_batches
stage that decodes real WAV bitstreams (functions/wav.py) and emits typed
scalar features.  Decode is stateless, so the stage runs as plain tasks
(the perf ledger's rule: actor pools are for per-worker state, and a
needless pool starves upstream tasks on small CPU budgets).

Feature set (first channel, integer-exact on PCM input so the SQL oracle
can recompute them):
- n_samples, n_channels, sample_rate, duration_s;
- sum_sq   — sum of squared samples (int64 on integer PCM);
- peak_abs — max |sample|;
- zero_crossings — count of consecutive-sample strict sign flips;
- mean_val — sum / n as float64.

At 100 TB scale the column holds blob-store bytes; batches stay small
(audio payloads are KB-MB each) and the stage is embarrassingly parallel —
no shuffle, no state, no driver materialization.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from demeter_ray.functions import wav


FEATURE_SCHEMA = {
    "n_samples": pa.int64(), "n_channels": pa.int64(),
    "sample_rate": pa.int64(), "duration_s": pa.float64(),
    "sum_sq": pa.int64(), "peak_abs": pa.int64(),
    "zero_crossings": pa.int64(), "mean_val": pa.float64(),
}


def wav_features_batch(batch: pa.Table, col: str = "audio",
                       keep: tuple[str, ...] = ()) -> pa.Table:
    """Arrow batch with a binary WAV column -> per-blob feature columns.
    Total on zero-row batches (typed empties, the edge-sweep rule)."""
    blobs = batch[col].to_pylist() if batch.num_rows else []
    out: dict[str, list] = {k: [] for k in FEATURE_SCHEMA}
    for blob in blobs:
        s, rate = wav.decode_wav(blob)
        n, ch = s.shape
        v = s[:, 0].astype(np.int64) if s.dtype.kind in "iu" \
            else s[:, 0].astype(np.float64)
        if s.dtype == np.uint8:
            v = v - 128  # 8-bit WAV is unsigned, centered at 128
        out["n_samples"].append(n)
        out["n_channels"].append(ch)
        out["sample_rate"].append(rate)
        out["duration_s"].append(n / rate)
        out["sum_sq"].append(int((v * v).sum()) if n else 0)
        out["peak_abs"].append(int(np.abs(v).max()) if n else 0)
        out["zero_crossings"].append(
            int(((v[:-1] * v[1:]) < 0).sum()) if n > 1 else 0)
        out["mean_val"].append(float(v.sum() / n) if n else 0.0)
    cols = {k: batch[k] for k in keep}
    cols.update({k: pa.array(out[k], t) for k, t in FEATURE_SCHEMA.items()})
    return pa.table(cols)


def decimate_wav(blob: bytes, factor: int) -> bytes:
    """Naive integer-factor decimation (every factor-th frame), re-encoded
    at the reduced rate — the resample primitive a training pipeline uses
    to normalize sample rates before feature extraction."""
    if factor < 1:
        raise ValueError(f"decimation factor must be >= 1, got {factor}")
    s, rate = wav.decode_wav(blob)
    return wav.encode_wav(s[::factor], max(1, rate // factor))
