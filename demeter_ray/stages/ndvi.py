"""NDVI statistics pipeline — the reference's wide Sentinel-2 flow
(/root/reference/demeter/raster/sentinel2/ndvi.py:126-171, 262-313, 318-415)
re-expressed as groupby/map_groups over a scene-tile table:

scene_tiles (one row per scene x band, Arrow binary pixels)
  -> groupby (utm_zone, datatake): merge per band (overlap-checked),
     detector-footprint mask, SCL 20m->10m alignment, cloud mask
     (values 3/8/9/10 — sentinel2/constants.py:42-58), reflectance /10000
     with 0=nodata, NDVI = (nir-red)/(nir+red)            [ndvi.py:360-457]
  -> groupby (utm_zone): merge across datatakes per statistic
     mean/min/max + stddev vs the mean                    [ndvi.py:289-313]

The reference's ordering requirement (sorted-by-datatake stream,
ndvi.py:188-198) disappears: grouping is structural.  Each group is one
independent task; the per-zone reduce sees only that zone's NDVI tiles.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from demeter_ray.functions import geo
from demeter_ray.stages.merge import merge_tiles

CLOUD_VALUES = (3, 8, 9, 10)


def _decode(row) -> np.ndarray:
    return np.frombuffer(row["pixels"], dtype=row["dtype"]).reshape(row["h"], row["w"])


def build_ndvi_for_datatake(group: pd.DataFrame) -> tuple[str, str, np.ma.MaskedArray]:
    """One (zone, datatake) group -> NDVI masked array.
    Group rows: red/nir/scl/detfoo bands for every tile of the datatake.
    Tiles within a band share a grid; this toy fixture has one tile per
    (zone, tile_id) so band merge = mosaic along x (handled by merge_tiles
    against each band's transforms)."""

    def band_tiles(band):
        rows = group[group["band"] == band]
        out = []
        for _, r in rows.iterrows():
            px = _decode(r)
            transform = tuple(r["transform"])
            out.append(
                (r["tile_id"], px, transform, r["nodata"],
                 geo.raster_bounds(transform, r["h"], r["w"]))
            )
        return out

    red, red_t, _ = merge_tiles(band_tiles("red"), method="first",
                                allow_resampling=False, check_overlap=True)
    crs = group["crs"].iloc[0] if "crs" in group.columns else "EPSG:32613"
    nir, _, _ = merge_tiles(band_tiles("nir"), method="first",
                            allow_resampling=False, check_overlap=True)
    foot, _, _ = merge_tiles(band_tiles("detfoo"), method="first",
                             allow_resampling=False)
    scl, _, _ = merge_tiles(band_tiles("scl"), method="first",
                            allow_resampling=False)

    # detector footprint: masked (0) footprint pixels mask the bands
    # (ndvi.py:367-374)
    foot_masked = foot.filled(0) == 0
    red = np.ma.masked_array(red, mask=red.mask | foot_masked)
    nir = np.ma.masked_array(nir, mask=nir.mask | foot_masked)

    # SCL 20m -> 10m upscale to align grids (ndvi.py:383-391)
    if scl.shape != red.shape:
        scl = np.ma.masked_array(
            np.repeat(np.repeat(scl.data, 2, axis=0), 2, axis=1),
            mask=np.repeat(np.repeat(np.ma.getmaskarray(scl), 2, axis=0), 2, axis=1),
        )
        scl = scl[: red.shape[0], : red.shape[1]]

    # cloud mask (ndvi.py:393-396)
    cloud = np.isin(scl.filled(0), CLOUD_VALUES)
    red = np.ma.masked_array(red, mask=red.mask | cloud)
    nir = np.ma.masked_array(nir, mask=nir.mask | cloud)

    # reflectance: 0 = nodata, /10000 (ndvi.py:447-453)
    red_r = np.ma.masked_equal(red.filled(0), 0) / 10000
    nir_r = np.ma.masked_equal(nir.filled(0), 0) / 10000

    ndvi = (nir_r - red_r) / (nir_r + red_r)
    zone = group["utm_zone"].iloc[0]
    dt = group["datatake_ts"].iloc[0]
    return zone, dt, ndvi, red_t, crs


def ndvi_statistics(scene_tiles: ray.data.Dataset) -> pd.DataFrame:
    """Per-zone NDVI statistics: one row per (utm_zone, statistic) with the
    raster summarized (shape, valid count, mean value) plus the raw stat
    raster bytes for downstream sinks."""

    def per_datatake(g: pd.DataFrame) -> pd.DataFrame:
        zone, dt, ndvi, transform, crs = build_ndvi_for_datatake(g)
        return pd.DataFrame(
            {
                "utm_zone": [zone],
                "datatake_ts": [dt],
                "h": [ndvi.shape[0]],
                "w": [ndvi.shape[1]],
                # transform as a csv string: ragged/object arrays in pandas
                # blocks break Ray block serialization
                "transform": [",".join(repr(float(v)) for v in transform)],
                "crs": [crs],
                "ndvi": [ndvi.filled(np.nan).astype(np.float32).tobytes()],
            }
        )

    per_dt = scene_tiles.groupby(["utm_zone", "datatake_ts"]).map_groups(
        per_datatake, batch_format="pandas"
    )

    def per_zone(g: pd.DataFrame) -> pd.DataFrame:
        stack = np.stack(
            [
                np.frombuffer(r["ndvi"], dtype=np.float32).reshape(r["h"], r["w"])
                for _, r in g.sort_values("datatake_ts").iterrows()
            ]
        ).astype(np.float64)
        m = np.ma.masked_array(stack, mask=np.isnan(stack))
        stats = {
            "mean": np.ma.mean(m, axis=0),
            "min": np.ma.min(m, axis=0),
            "max": np.ma.max(m, axis=0),
        }
        # stddev vs the mean (merge_stddev semantics, merge.py:131-146)
        var = np.ma.mean((m - stats["mean"][None, :, :]) ** 2, axis=0)
        stats["stddev"] = np.ma.sqrt(var)
        rows = []
        for name, raster in stats.items():
            rows.append(
                {
                    "utm_zone": g["utm_zone"].iloc[0],
                    "statistic": name,
                    "h": raster.shape[0],
                    "w": raster.shape[1],
                    "transform": g["transform"].iloc[0],
                    "crs": g["crs"].iloc[0],
                    "valid_px": int((~np.ma.getmaskarray(raster)).sum()),
                    "mean_value": float(np.ma.mean(raster)),
                    "pixels": raster.filled(np.nan).astype(np.float32).tobytes(),
                }
            )
        return pd.DataFrame(rows)

    out = per_dt.groupby("utm_zone").map_groups(per_zone, batch_format="pandas")
    return (
        out.to_pandas()
        .sort_values(["utm_zone", "statistic"])
        .reset_index(drop=True)
    )
