"""Tile-pyramid / overview builder (COG-overview semantics).

``build_overviews`` turns a Dataset of tile rows (the engine's standard
raster schema — see stages/sample.load_tiles) into overview rows: one output
row per (input tile, level 1..levels), where level k is level k-1 reduced
2x2 -> 1 px.  This is the tile-aligned overview model GDAL/COG uses — each
source tile downsamples INDEPENDENTLY, so the build is embarrassingly
parallel ``map_batches`` work: a task holds one batch of tile rows, never a
mosaic, and a 100-TB tile table fans out level-building across the cluster
with no shuffle at all.  Transforms scale by 2^k per level so every overview
stays georeferenced (pixel size doubles; origin fixed).

Reduction methods (matching functions/warp.py's resampler set):

- ``average`` — nodata-ignoring mean of the up-to-4 valid children
  (continuous rasters; output dtype float64);
- ``mode``    — majority vote, ties to the smallest value (categorical
  rasters; dtype preserved);
- ``nearest`` — top-left child (dtype preserved, cheapest).

Odd dimensions pad with nodata to the next even size before reducing (the
partial edge cells aggregate only their valid children).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from demeter_ray.functions.warp import _nodata_mask

_LEVEL_COLS = ("level", "h", "w", "dtype", "transform", "pixels")


def _reduce2(px: np.ndarray, mask: np.ndarray, method: str):
    """One 2x2 -> 1 reduction step on a masked 2-D array; returns
    (values, out_mask)."""
    h, w = px.shape
    H, W = (h + 1) // 2 * 2, (w + 1) // 2 * 2
    if (H, W) != (h, w):
        p2 = np.zeros((H, W), dtype=np.float64)
        m2 = np.ones((H, W), dtype=bool)
        p2[:h, :w] = px
        m2[:h, :w] = mask
        px, mask = p2, m2
    v4 = px.reshape(H // 2, 2, W // 2, 2).transpose(0, 2, 1, 3).reshape(H // 2, W // 2, 4)
    m4 = mask.reshape(H // 2, 2, W // 2, 2).transpose(0, 2, 1, 3).reshape(H // 2, W // 2, 4)
    if method == "average":
        cnt = (~m4).sum(axis=2)
        tot = np.where(m4, 0.0, v4).sum(axis=2)
        out = np.where(cnt > 0, tot / np.maximum(cnt, 1), 0.0)
        return out, cnt == 0
    if method == "mode":
        sv = np.sort(np.where(m4, np.inf, v4), axis=2)
        best_val = np.zeros(sv.shape[:2])
        best_cnt = np.zeros(sv.shape[:2], dtype=np.int64)
        for k in range(4):
            v = sv[..., k]
            cnt = (sv == v[..., None]).sum(axis=2)
            better = (cnt > best_cnt) & np.isfinite(v)
            best_val = np.where(better, v, best_val)
            best_cnt = np.where(better, cnt, best_cnt)
        return best_val, best_cnt == 0
    if method == "nearest":
        return v4[..., 0], m4[..., 0]
    raise ValueError(f"unsupported overview method {method!r}")


def tile_overviews(px: np.ndarray, transform, nodata, levels: int, method: str):
    """All overview levels for one tile: [(level, pixels, transform), ...].
    ``pixels`` is float64 with masked cells already filled with ``nodata``."""
    cur = px.astype(np.float64, copy=False)
    mask = _nodata_mask(cur, nodata)
    a, b, c, d, e, f = transform
    out = []
    for lvl in range(1, levels + 1):
        cur, mask = _reduce2(cur, mask, method)
        a, b, d, e = 2 * a, 2 * b, 2 * d, 2 * e
        fill = np.nan if nodata is None or (isinstance(nodata, float) and np.isnan(nodata)) else nodata
        out.append((lvl, np.where(mask, fill, cur), (a, b, c, d, e, f)))
        if cur.shape[0] <= 1 and cur.shape[1] <= 1:
            break
    return out


def build_overviews(
    tiles_ds: ray.data.Dataset, levels: int = 3, method: str = "average"
) -> ray.data.Dataset:
    """Dataset of tile rows -> Dataset of overview rows (all non-payload
    metadata columns carried through; ``level``/``h``/``w``/``dtype``/
    ``transform``/``pixels`` replaced per level)."""
    out_float = method == "average"

    def fn(batch: pa.Table) -> pa.Table:
        carry_names = [n for n in batch.schema.names if n not in _LEVEL_COLS]
        rows = {n: [] for n in carry_names}
        lvls, hs, ws, dts, tfs, pxs = [], [], [], [], [], []
        for i in range(batch.num_rows):
            h = batch["h"][i].as_py()
            w = batch["w"][i].as_py()
            dtype = batch["dtype"][i].as_py()
            px = np.frombuffer(batch["pixels"][i].as_py(), dtype=dtype).reshape(h, w)
            transform = tuple(batch["transform"][i].as_py())
            nodata = batch["nodata"][i].as_py() if "nodata" in batch.schema.names else None
            out_dtype = "float64" if out_float else dtype
            for lvl, opx, otf in tile_overviews(px, transform, nodata, levels, method):
                lvls.append(lvl)
                hs.append(opx.shape[0])
                ws.append(opx.shape[1])
                dts.append(out_dtype)
                tfs.append(list(otf))
                pxs.append(opx.astype(out_dtype).tobytes())
                for n in carry_names:
                    rows[n].append(batch[n][i].as_py())
        cols = {n: pa.array(rows[n], batch.schema.field(n).type) for n in carry_names}
        cols["level"] = pa.array(lvls, pa.int32())
        cols["h"] = pa.array(hs, pa.int32())
        cols["w"] = pa.array(ws, pa.int32())
        cols["dtype"] = pa.array(dts, pa.string())
        cols["transform"] = pa.array(tfs, pa.list_(pa.float64(), 6))
        cols["pixels"] = pa.array(pxs, pa.binary())
        return pa.table(cols)

    # payload-heavy rows: small batches bound task memory (a batch holds
    # at most batch_size full tiles plus their pyramids)
    return tiles_ds.map_batches(fn, batch_format="pyarrow", batch_size=16)
