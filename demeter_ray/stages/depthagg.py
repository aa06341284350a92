"""Depth-weighted raster aggregation — the POLARIS/SLGA pipeline shape.

Reference flow (polaris.py:160-324 / slga.py): tiles x depths x statistics
-> per-(stat, depth) mosaic merge with overlap check -> grid consistency
asserts -> unit conversions (log10 om -> percent, negative-bd scrub, om ->
SOC) -> depth-weighted mean + stddev-from-percentiles with END-CLIPPED
weights -> carbon stock mean/stddev.

Ray mapping (SURVEY.md A1-A2, §7.4): the merge of each (dataset, statistic,
depth) group runs as an independent ``map_groups`` task over the tile table
(the depth-stack is 6 small rasters per group and combines on the driver);
at scale the groupby key gains a region/tile-block component so no group
ever materializes more than one region.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from demeter_ray.functions import depth as depthfns
from demeter_ray.functions import geo
from demeter_ray.stages.merge import merge_tiles
from demeter_ray.stages.sample import load_tiles


def merged_depth_stack(
    raster_tiles, dataset: str, statistic: str, depths, check_overlap: bool = False
):
    """Merge each depth layer's tiles -> list of masked 2-D rasters (one per
    depth), asserting one shared grid (polaris.py:235-243)."""
    rasters = []
    transform = None
    for dtop, _dbot in depths:
        tiles = load_tiles(raster_tiles, dataset, statistic, dtop)
        merged, t, _ = merge_tiles(
            tiles, method="first", allow_resampling=False, check_overlap=check_overlap
        )
        if transform is None:
            transform = t
        elif t != transform:
            raise ValueError("depth layers disagree on pixel grid")
        rasters.append(merged)
    return rasters, transform


def depth_weighted_mean(raster_tiles, dataset: str, start: int, end: int):
    """Depth-weighted mean raster over [start, end] with end-clipped weights
    (polaris.py:258-268)."""
    depths = depthfns.select_including(depthfns.STANDARD_DEPTHS, start, end)
    weights = depthfns.clipped_weights(depths, start, end)
    stack, transform = merged_depth_stack(raster_tiles, dataset, "mean", depths)
    arr = np.ma.stack(stack)
    return np.ma.average(arr, axis=0, weights=weights), transform


def depth_weighted_stddev(raster_tiles, dataset: str, start: int, end: int):
    """Stddev from p5/p95 layers, variance averaged with squared weights
    (demeter/utils.py:89-103)."""
    depths = depthfns.select_including(depthfns.STANDARD_DEPTHS, start, end)
    weights = depthfns.clipped_weights(depths, start, end)
    p5, transform = merged_depth_stack(raster_tiles, dataset, "p5", depths)
    p95, _ = merged_depth_stack(raster_tiles, dataset, "p95", depths)
    quantile = 1.645
    variance = [((a - b) / (quantile * 2)) ** 2 for a, b in zip(p5, p95)]
    weighted = np.ma.average(np.ma.stack(variance), axis=0, weights=np.asarray(weights) ** 2)
    return np.ma.sqrt(weighted), transform


STATISTICS = ("mean", "p5", "p95", "p50", "mode")


def combined_statistic_rasters(raster_tiles, dataset: str, depth_top: int,
                               statistics=STATISTICS):
    """The CombinedRasters carry (polaris.py:63-70, 290-321): one merged
    mosaic per available statistic — mean / p5 / p95 / median ("p50") /
    mode — for a (dataset, depth) pair.  Statistics with no tiles are
    omitted, mirroring the reference's Optional fields.  Returns
    ({statistic: masked_raster}, transform)."""
    out = {}
    transform = None
    for stat in statistics:
        tiles = load_tiles(raster_tiles, dataset, stat, depth_top)
        if not tiles:
            continue
        merged, t, _ = merge_tiles(tiles, method="first", allow_resampling=False)
        if transform is None:
            transform = t
        elif t != transform:
            raise ValueError("statistic layers disagree on pixel grid")
        out[stat] = merged
    return out, transform


def estimate_carbon_stock(raster_tiles, start: int, end: int,
                          om_is_log10: bool = False):
    """Carbon stock mean + stddev from om and bd rasters
    (polaris.py:110-157): optional log10 om -> percent conversion
    (10**pixels, polaris.py:245-249 / M8), om -> SOC (x0.58),
    stock = soc*bd, Var(XY) combination for stddev."""
    om_mean, transform = depth_weighted_mean(raster_tiles, "om", start, end)
    om_std, _ = depth_weighted_stddev(raster_tiles, "om", start, end)
    if om_is_log10:
        # POLARIS distributes om as log10 percent (M8); convert the mean
        # raster; the stddev converts through the same exponent scale
        om_mean = 10 ** om_mean
        om_std = 10 ** om_std
    bd_mean, _ = depth_weighted_mean(raster_tiles, "bd", start, end)
    bd_std, _ = depth_weighted_stddev(raster_tiles, "bd", start, end)
    # negative bulk density scrub (polaris.py:251-255)
    bd_mean = np.ma.masked_less(bd_mean, 0)
    soc_mean = om_mean * depthfns.OM_TO_SOC
    soc_std = om_std * depthfns.OM_TO_SOC
    stock_mean = soc_mean * bd_mean
    stock_std = depthfns.carbon_stock_stddev(soc_mean, soc_std, bd_mean, bd_std)
    return stock_mean, stock_std, transform


def depth_group_merge_pipeline(
    tiles_ds: ray.data.Dataset, dataset: str, check_overlap: bool = False
) -> pd.DataFrame:
    """Ray pipeline: groupby (statistic, depth) -> merge each group's tiles
    in parallel map_groups tasks -> per-group summary row.  The distributed
    form of merged_depth_stack for wide tile tables."""
    ds = tiles_ds.filter(expr=f"dataset == '{dataset}'")

    def merge_group(g: pd.DataFrame) -> pd.DataFrame:
        payload = []
        for _, r in g.iterrows():
            px = np.frombuffer(r["pixels"], dtype=r["dtype"]).reshape(r["h"], r["w"])
            transform = tuple(r["transform"])
            payload.append(
                (r["tile_id"], px, transform, r["nodata"],
                 geo.raster_bounds(transform, r["h"], r["w"]))
            )
        merged, transform, _ = merge_tiles(
            payload, method="first", allow_resampling=False, check_overlap=check_overlap
        )
        return pd.DataFrame(
            {
                "statistic": [g["statistic"].iloc[0]],
                "depth_top_cm": [g["depth_top_cm"].iloc[0]],
                "valid_px": [int((~merged.mask).sum())],
                "mean_value": [float(merged.mean())],
                "h": [merged.shape[0]],
                "w": [merged.shape[1]],
            }
        )

    out = (
        ds.groupby(["statistic", "depth_top_cm"])
        .map_groups(merge_group, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values(["statistic", "depth_top_cm"]).reset_index(drop=True)
