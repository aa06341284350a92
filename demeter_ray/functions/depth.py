"""Depth-layer dimension + depth-weighted aggregation math.

Semantics mirror the reference exactly:

- layer selection: /root/reference/demeter/raster/depth_enum.py:15-62
  (``select_between`` validates endpoints, ``select_including`` takes every
  layer overlapping the open interval, sorted by start depth);
- the six POLARIS/SLGA layers: /root/reference/demeter/raster/polaris.py:100-106;
- end-clipped weights: /root/reference/demeter/raster/polaris.py:258-265
  (a layer's weight is its thickness clipped to the requested range);
- weighted mean / stddev-from-p5-p95 combination:
  /root/reference/demeter/utils.py:84-103 (weights for variance are squared;
  sigma = (p5 - p95) / (2 * 1.645));
- missing-ignoring weighted average with all-missing -> None:
  /root/reference/demeter/vector/usda/ssurgo.py:270-301.
"""

from __future__ import annotations

import numpy as np

# (start_cm, end_cm) — polaris.py:100-106 / slga.py:73-80
STANDARD_DEPTHS: list[tuple[int, int]] = [
    (0, 5),
    (5, 15),
    (15, 30),
    (30, 60),
    (60, 100),
    (100, 200),
]


def select_including(depths, start: int, end: int):
    """Layers overlapping (start, end), sorted by start depth
    (depth_enum.py:29-47)."""
    max_depth = max(e for _, e in depths)
    if start < 0 or end > max_depth:
        raise ValueError(f"Maximum depth range: 0 - {max_depth}")
    if end <= start:
        raise ValueError(f"end {end} must be greater than start {start}")
    selected = [d for d in depths if start < d[1] and end > d[0]]
    return sorted(selected, key=lambda d: d[0])


def select_between(depths, start: int, end: int):
    """Like select_including but endpoints must be layer boundaries
    (depth_enum.py:15-27)."""
    starts = {s for s, _ in depths}
    if start not in starts:
        raise ValueError(f"start_depth {start} must be one of {sorted(starts)}")
    ends = {e for _, e in depths}
    if end not in ends:
        raise ValueError(f"end_depth {end} must be one of {sorted(ends)}")
    return select_including(depths, start, end)


def clipped_weights(depths, start: int, end: int) -> np.ndarray:
    """Thickness of each layer clipped to [start, end] — polaris.py:258-265."""
    w = []
    for s, e in depths:
        w.append(min(e, end) - max(s, start))
    return np.asarray(w, dtype=np.float64)


def weighted_mean_stack(stack: np.ndarray, weights: np.ndarray, mask=None) -> np.ndarray:
    """Pixelwise depth-weighted mean over axis 0 with missing values ignored
    per pixel (numpy.ma.average semantics, demeter/utils.py:84-86)."""
    stack = np.asarray(stack, dtype=np.float64)
    if mask is None:
        mask = np.isnan(stack)
    m = np.ma.masked_array(stack, mask=mask)
    return np.ma.average(m, axis=0, weights=weights)


def weighted_stddev_from_percentiles(
    p5_stack: np.ndarray, p95_stack: np.ndarray, weights: np.ndarray, mask5=None, mask95=None
) -> np.ndarray:
    """sigma_layer = (p5 - p95)/(2*1.645); variance averaged with weights^2
    then sqrt — demeter/utils.py:89-103."""
    quantile = 1.645
    p5 = np.ma.masked_array(p5_stack, mask=np.isnan(p5_stack) if mask5 is None else mask5)
    p95 = np.ma.masked_array(
        p95_stack, mask=np.isnan(p95_stack) if mask95 is None else mask95
    )
    stddev = (p5 - p95) / (quantile * 2)
    variance = stddev**2
    weighted = np.ma.average(variance, axis=0, weights=np.asarray(weights) ** 2)
    return np.ma.sqrt(weighted)


def weighted_average_ignore_missing(values, weights):
    """Scalar weighted average ignoring NaN; all-missing -> None
    (ssurgo.py:289-297)."""
    values = np.asarray(values, dtype=np.float64)
    weights = np.asarray(weights, dtype=np.float64)
    m = np.ma.masked_array(values, mask=np.isnan(values))
    avg = np.ma.average(m, weights=weights)
    if avg is np.ma.masked:
        return None
    return float(avg)


def carbon_stock_mean(soc_mean: np.ndarray, bd_mean: np.ndarray) -> np.ndarray:
    """Carbon stock = SOC * bulk density — polaris.py:135-152."""
    return soc_mean * bd_mean


def carbon_stock_stddev(soc_mean, soc_std, bd_mean, bd_std):
    """Var(XY) = VarX*VarY + VarX*EY^2 + VarY*EX^2 — demeter/utils.py:60-81."""
    soc_var = soc_std**2
    bd_var = bd_std**2
    var = soc_var * bd_var + soc_var * bd_mean**2 + bd_var * soc_mean**2
    return np.sqrt(var)


OM_TO_SOC = 0.58  # demeter/constants.py:1
