"""Hydrography-style catchment operations (SURVEY.md M12, A6).

Reference: /root/reference/demeter/raster/usgs/hydrography.py
- per-tile VAT sidecar maps raw int codes -> global 14-digit catchment ids;
  unknown codes -> nodata + warning (:229-308); ids stored as float64 on
  write for GIS compat (:289-313);
- pixel-count histogram per catchment summed across tiles (:211-259,
  :318-323).

Ray mapping: the VAT is a broadcast dict-per-tile; remap is a vectorized
np.take per batch of tiles; the histogram is a per-tile partial count + a
small combine (the A6 groupby-sum)."""

from __future__ import annotations

import warnings

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data


class UnknownCatchmentCodeWarning(Warning):
    pass


def build_vat_lookup(vat_table: pa.Table) -> dict:
    """tile_id -> (codes array, catchment ids array) sorted by code."""
    df = vat_table.to_pandas()
    out = {}
    for tid, g in df.groupby("tile_id"):
        g = g.sort_values("value")
        out[tid] = (
            g["value"].to_numpy(dtype=np.int64),
            g["catchment_id"].to_numpy(dtype=np.int64),
        )
    return out


def remap_tile(pixels: np.ndarray, codes: np.ndarray, ids: np.ndarray,
               nodata: float) -> np.ndarray:
    """Vectorized code -> global id remap; unknown codes -> nodata + warning
    (hydrography.py:229-308).  Output float64 (14-digit ids don't fit the
    int32 raster dtype — the reference's float64-on-write rule)."""
    px = pixels.astype(np.int64)
    pos = np.searchsorted(codes, px.ravel())
    pos_clipped = np.clip(pos, 0, len(codes) - 1)
    matched = codes[pos_clipped] == px.ravel()
    valid_in = px.ravel() != np.int64(nodata)
    unknown = valid_in & ~matched
    if unknown.any():
        warnings.warn(
            f"{int(unknown.sum())} pixels with unmappable catchment codes -> nodata",
            category=UnknownCatchmentCodeWarning,
        )
    out = np.where(matched & valid_in, ids[pos_clipped].astype(np.float64), np.nan)
    return out.reshape(pixels.shape)


def remap_catchments(tiles_ds: ray.data.Dataset, vat_table: pa.Table,
                     nodata: float = -9999.0) -> ray.data.Dataset:
    """Remap every 'cat' tile's codes to global catchment ids (one task per
    batch of tiles; VAT broadcast once)."""
    ref = ray.put(build_vat_lookup(vat_table))

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        lookup = ray.get(ref)
        out_px = []
        for _, r in batch.iterrows():
            px = np.frombuffer(r["pixels"], dtype=r["dtype"]).reshape(r["h"], r["w"])
            codes, ids = lookup[r["tile_id"]]
            out_px.append(remap_tile(px, codes, ids, nodata).tobytes())
        batch = batch.copy()
        batch["pixels"] = out_px
        batch["dtype"] = "float64"
        return batch

    return tiles_ds.filter(expr="dataset == 'cat'").map_batches(
        fn, batch_format="pandas"
    )


def catchment_histogram(vat_table: pa.Table) -> pd.DataFrame:
    """Pixel counts per global catchment id summed across tiles
    (hydrography.py:211-259 uses the DBF counts directly — same here)."""
    df = vat_table.to_pandas()
    out = (
        df.groupby("catchment_id", as_index=False)["count"]
        .sum()
        .rename(columns={"count": "n_pixels"})
    )
    return out.sort_values("catchment_id").reset_index(drop=True)


def catchment_histogram_from_pixels(tiles_ds: ray.data.Dataset, vat_table: pa.Table,
                                    nodata: float = -9999.0,
                                    driver_cap: int | None = None) -> pd.DataFrame:
    """The distributed variant: remap tiles, then per-batch partial counts
    of each id combined through the size-gated group-sum (A6): under the
    cap the partials reduce on the driver; above it they shuffle through
    the bucketed distributed combine (catchment cardinality scales with
    the continent, not with this fixture)."""
    # driver-side import: the gated-combine machinery lives with the
    # relational plans; never imported inside a worker-side fn
    from demeter_ray.pipelines.relational import gated_group_sum_ds

    remapped = remap_catchments(tiles_ds, vat_table, nodata)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for _, r in batch.iterrows():
            px = np.frombuffer(r["pixels"], dtype=r["dtype"])
            px = px[~np.isnan(px)]
            ids, counts = np.unique(px.astype(np.int64), return_counts=True)
            rows.append(pd.DataFrame({"catchment_id": ids, "n_pixels": counts}))
        if not rows:
            return pd.DataFrame({"catchment_id": pd.Series(dtype="int64"),
                                 "n_pixels": pd.Series(dtype="int64")})
        return pd.concat(rows, ignore_index=True)

    out = gated_group_sum_ds(
        remapped, partial, keys=["catchment_id"], sums=["n_pixels"],
        driver_cap=driver_cap,
    ).to_pandas()
    return out.sort_values("catchment_id").reset_index(drop=True)
