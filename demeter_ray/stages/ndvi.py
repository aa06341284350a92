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
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from demeter_ray.functions import geo
from demeter_ray.stages.merge import merge_tiles
from demeter_ray.state import lineage

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


def ndvi_statistics(
    scene_tiles: ray.data.Dataset, sink_dir: str | None = None
) -> pd.DataFrame:
    """Per-zone NDVI statistics: one row per (utm_zone, statistic) with the
    raster summarized (shape, valid count, mean value).

    With ``sink_dir=None`` (small-fixture mode) the stat raster bytes ride
    along in a ``pixels`` column.  With a ``sink_dir`` (the scale path) each
    statistic raster is written INSIDE the per-zone task through
    ``state.lineage.write_partition`` (atomic + per-partition lineage) and
    only the summary rows reach the driver — pixels never do; zones whose
    four stat partitions already have valid lineage are skipped before the
    shuffle (resume-from-checkpoint)."""
    emit_pixels = sink_dir is None
    skipped_rows: list[dict] = []
    if sink_dir is not None:
        done = lineage.completed_keys(sink_dir)
        done_zones = set()
        for rec_zone in {str(k).rsplit("-", 1)[0] for k in done}:
            keys = [f"{rec_zone}-{s}" for s in ("mean", "min", "max", "stddev")]
            if all(k in done for k in keys):
                done_zones.add(rec_zone)
                for k in keys:
                    prof = lineage.read_partition_profile(sink_dir, k) or {}
                    skipped_rows.append(
                        {
                            "utm_zone": rec_zone,
                            "statistic": k.rsplit("-", 1)[1],
                            "h": prof.get("h", -1),
                            "w": prof.get("w", -1),
                            "transform": prof.get("transform", ""),
                            "crs": prof.get("crs", ""),
                            "valid_px": prof.get("valid_px", -1),
                            "mean_value": prof.get("mean_value", float("nan")),
                        }
                    )
        if done_zones:
            done_list = sorted(done_zones)
            scene_tiles = scene_tiles.map_batches(
                lambda t, dz=done_list: t.filter(
                    pc.invert(pc.is_in(t["utm_zone"], value_set=pa.array(dz)))
                ),
                batch_format="pyarrow",
            )

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
        # Incremental two-pass reduce: task memory is O(H*W) accumulators,
        # NOT O(n_datatakes * H * W) — one datatake raster decoded at a
        # time.  Pass 1 count/sum/min/max; pass 2 squared deviations vs the
        # across-datatake mean (the reference's merge-then-stddev two-pass,
        # sentinel2/ndvi.py:289-313; merge_stddev semantics merge.py:227-258).
        g = g.sort_values("datatake_ts")
        h, w = int(g["h"].iloc[0]), int(g["w"].iloc[0])

        def decoded():
            for buf in g["ndvi"]:
                yield np.frombuffer(buf, dtype=np.float32).reshape(h, w).astype(
                    np.float64
                )

        cnt = np.zeros((h, w), dtype=np.int64)
        ssum = np.zeros((h, w), dtype=np.float64)
        mn = np.full((h, w), np.nan)
        mx = np.full((h, w), np.nan)
        for x in decoded():
            valid = ~np.isnan(x)
            cnt += valid
            ssum += np.where(valid, x, 0.0)
            mn = np.fmin(mn, x)  # fmin/fmax: NaN loses -> masked min/max
            mx = np.fmax(mx, x)
        with np.errstate(invalid="ignore", divide="ignore"):
            mean = np.where(cnt > 0, ssum / cnt, np.nan)
        sq = np.zeros((h, w), dtype=np.float64)
        for x in decoded():
            valid = ~np.isnan(x)
            d = np.where(valid, x - np.where(valid, mean, 0.0), 0.0)
            sq += d * d
        with np.errstate(invalid="ignore", divide="ignore"):
            stddev = np.where(cnt > 0, np.sqrt(sq / cnt), np.nan)
        stats = {"mean": mean, "min": mn, "max": mx, "stddev": stddev}

        zone = g["utm_zone"].iloc[0]
        transform = g["transform"].iloc[0]
        crs = g["crs"].iloc[0]
        rows = []
        for name, raster in stats.items():
            valid = ~np.isnan(raster)
            ma = np.ma.masked_array(raster, mask=~valid)
            row = {
                "utm_zone": zone,
                "statistic": name,
                "h": h,
                "w": w,
                "transform": transform,
                "crs": crs,
                "valid_px": int(valid.sum()),
                "mean_value": float(np.ma.mean(ma)),
            }
            if emit_pixels:
                row["pixels"] = raster.astype(np.float32).tobytes()
            else:
                lineage.write_partition(
                    sink_dir,
                    f"{zone}-{name}",
                    pd.DataFrame(
                        {
                            "utm_zone": [zone],
                            "statistic": [name],
                            "pixels": [raster.astype(np.float32).tobytes()],
                        }
                    ),
                    sort_cols=["utm_zone", "statistic"],
                    profile={
                        "h": h,
                        "w": w,
                        "transform": transform,
                        "crs": crs,
                        "valid_px": int(valid.sum()),
                        "mean_value": float(np.ma.mean(ma)),
                        "dtype": "float32",
                        "nodata": "nan",
                    },
                )
            rows.append(row)
        return pd.DataFrame(rows)

    out = per_dt.groupby("utm_zone").map_groups(per_zone, batch_format="pandas")
    frame = out.to_pandas()
    if skipped_rows:
        frame = pd.concat([frame, pd.DataFrame(skipped_rows)], ignore_index=True)
    return (
        frame.sort_values(["utm_zone", "statistic"]).reset_index(drop=True)
    )
