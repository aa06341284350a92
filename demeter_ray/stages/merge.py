"""Mosaic merge: combine overlapping raster tiles onto one pixel grid.

Reproduces the reference's merge semantics (rasterio.merge wrapper at
/root/reference/demeter/raster/utils/merge.py) as a pure-numpy reduce over
tile rows — no global mosaic is ever materialized across groups; at scale
each (dataset, region) group merges independently inside
``groupby(...).map_groups`` (SURVEY.md A7-A9):

- methods: first / last / min / max / sum / count / mean (sum+count trick,
  merge.py:200-232) and a user-callable hook (merge.py:255-263 — the UDF
  extension surface);
- "first" is order-dependent in the reference (input order); here the
  canonical order is sorted tile_id so parallel merges are deterministic
  (SURVEY.md §7.5);
- overlap-consistency check: warn when overlapping pixels differ, keep
  first (check_for_overlapping_pixels, merge.py:353-378);
- merge_variance / merge_stddev vs a broadcast mean (merge.py:100-146);
- no-resample rule: all inputs must sit on one pixel grid within float
  tolerance or ValueError (merge.py:189-195, transform.py:43-66);
- bounds: optional target bounds snapped to the first tile's grid
  (merge.py:197-199).

Nodata handling matches the masked-array semantics: every method ignores
invalid pixels; output fill is the first tile's nodata (or the override).
"""

from __future__ import annotations

import warnings

import numpy as np

from demeter_ray.functions import geo, warp


class OverlappingPixelsWarning(Warning):
    pass


def _tile_mask(px: np.ndarray, nodata) -> np.ndarray:
    if nodata is None:
        return np.zeros(px.shape, dtype=bool)
    if isinstance(nodata, float) and np.isnan(nodata):
        return np.isnan(px)
    return px == nodata


def merge_tiles(
    tiles,
    method="first",
    bounds=None,
    allow_resampling: bool = True,
    nodata=None,
    check_overlap: bool = False,
):
    """Merge tile payloads [(tile_id, pixels2d, transform, nodata, bounds)]
    (the stages/sample.py layout) into one (pixels_masked, transform, nodata).

    method: str builtin or callable(merged, new, merged_mask, new_mask) that
    mutates merged/merged_mask in place (the reference's rasterio merge-method
    signature, adapted to 2-D).
    """
    if not tiles:
        raise ValueError("no tiles to merge")
    tiles = sorted(tiles, key=lambda t: t[0])  # canonical deterministic order
    first_transform = tiles[0][2]
    out_nodata = nodata if nodata is not None else tiles[0][3]
    a, b, c, d, e, f = first_transform
    if b or d:
        raise ValueError("only axis-aligned transforms supported")

    if not allow_resampling:
        all_bounds = [t[4] for t in tiles]
        extent = (
            min(bb[0] for bb in all_bounds),
            min(bb[1] for bb in all_bounds),
            max(bb[2] for bb in all_bounds),
            max(bb[3] for bb in all_bounds),
        )
        if not geo.aligned_pixel_grids(extent, [t[2] for t in tiles]):
            raise ValueError(
                "Rasters must be on the same pixel grid to merge without resampling"
            )

    if bounds is not None:
        left, bottom, right, top = geo.align_bounds_to_transform(bounds, first_transform)
    else:
        left = min(t[4][0] for t in tiles)
        bottom = min(t[4][1] for t in tiles)
        right = max(t[4][2] for t in tiles)
        top = max(t[4][3] for t in tiles)
    width = int(round((right - left) / a))
    height = int(round((top - bottom) / -e))
    out_transform = (a, 0.0, left, 0.0, e, top)

    sum_mode = method == "mean"
    acc = np.zeros((height, width), dtype=np.float64)
    cnt = np.zeros((height, width), dtype=np.int64)
    merged = np.zeros((height, width), dtype=np.float64)
    merged_mask = np.ones((height, width), dtype=bool)

    builtin = {
        "first": _copy_first,
        "last": _copy_last,
        "min": _copy_min,
        "max": _copy_max,
        "sum": _copy_sum,
        "count": _copy_count,
    }
    fn = builtin.get(method) if isinstance(method, str) else method
    if method == "count":
        merged[:] = 0

    for tile_id, px, transform, t_nodata, t_bounds in tiles:
        # place tile into output grid (integer offset — same pixel grid)
        col0 = int(round((transform[2] - left) / a))
        row0 = int(round((transform[5] - top) / e))
        h, w = px.shape
        r0, r1 = max(0, row0), min(height, row0 + h)
        c0, c1 = max(0, col0), min(width, col0 + w)
        if r1 <= r0 or c1 <= c0:
            continue
        sub = px[r0 - row0 : r1 - row0, c0 - col0 : c1 - col0].astype(np.float64)
        sub_mask = _tile_mask(sub, t_nodata)
        win_m = merged[r0:r1, c0:c1]
        win_mm = merged_mask[r0:r1, c0:c1]
        if check_overlap:
            overlap = ~(win_mm | sub_mask)
            if overlap.any() and (win_m[overlap] != sub[overlap]).any():
                warnings.warn(
                    "Input rasters have overlapping pixels with different values!",
                    category=OverlappingPixelsWarning,
                )
        if sum_mode:
            valid = ~sub_mask
            acc[r0:r1, c0:c1][valid] += sub[valid]
            cnt[r0:r1, c0:c1][valid] += 1
        else:
            fn(win_m, sub, win_mm, sub_mask)

    if sum_mode:
        with np.errstate(invalid="ignore", divide="ignore"):
            merged = acc / cnt
        merged_mask = cnt == 0
    out = np.ma.masked_array(merged, mask=merged_mask)
    out.fill_value = out_nodata if out_nodata is not None else 1e20
    return out, out_transform, out_nodata


def _copy_first(merged, new, merged_mask, new_mask):
    take = merged_mask & ~new_mask
    merged[take] = new[take]
    merged_mask[take] = False


def _copy_last(merged, new, merged_mask, new_mask):
    take = ~new_mask
    merged[take] = new[take]
    merged_mask[take] = False


def _copy_min(merged, new, merged_mask, new_mask):
    both = ~merged_mask & ~new_mask
    merged[both] = np.minimum(merged[both], new[both])
    only_new = merged_mask & ~new_mask
    merged[only_new] = new[only_new]
    merged_mask[only_new] = False


def _copy_max(merged, new, merged_mask, new_mask):
    both = ~merged_mask & ~new_mask
    merged[both] = np.maximum(merged[both], new[both])
    only_new = merged_mask & ~new_mask
    merged[only_new] = new[only_new]
    merged_mask[only_new] = False


def _copy_sum(merged, new, merged_mask, new_mask):
    both = ~merged_mask & ~new_mask
    merged[both] += new[both]
    only_new = merged_mask & ~new_mask
    merged[only_new] = new[only_new]
    merged_mask[only_new] = False


def _copy_count(merged, new, merged_mask, new_mask):
    valid = ~new_mask
    merged[valid] += 1
    merged_mask[valid] = False


def reproject_and_merge_tiles(
    tiles,
    crs: str,
    resampling_method: str = "nearest",
    merge_method="first",
    align_to=None,
    **kw,
):
    """Reproject tiles [(tile_id, pixels2d, transform, nodata, bounds,
    src_crs)] to one CRS, then merge — reprojection.py:143-202 semantics.
    With ``align_to=None`` the first tile's destination grid is the common
    grid (the rasterio-merge rule), so the merge itself never resamples.
    Returns (pixels_masked, transform, nodata, crs)."""
    warped = warp.reproject_tiles(tiles, crs, resampling_method, align_to)
    merged, out_t, out_nodata = merge_tiles(
        warped, method=merge_method, allow_resampling=False, **kw
    )
    return merged, out_t, out_nodata, crs


def align_and_merge_tiles(
    tiles,
    to_transform,
    to_crs: str,
    resampling_method: str = "nearest",
    merge_method="first",
    **kw,
):
    """Align tiles to an existing raster's grid, then merge
    (reprojection.py:205-238)."""
    return reproject_and_merge_tiles(
        tiles, to_crs, resampling_method, merge_method, align_to=to_transform, **kw
    )


def merge_variance(tiles, mean, **kw):
    """Pixelwise mean variance of the tiles from the given (already merged)
    mean raster — merge.py:100-128."""
    mean_px, mean_transform, _ = mean if isinstance(mean, tuple) else (mean, None, None)
    var_tiles = []
    for tile_id, px, transform, nodata, tb in sorted(tiles, key=lambda t: t[0]):
        var_tiles.append((tile_id, px, transform, nodata, tb))
    # stack: all tiles must share the mean's grid; compute (x-mean)^2 mean
    acc = None
    cnt = None
    for tile_id, px, transform, nodata, tb in var_tiles:
        merged, out_t, _ = merge_tiles([(tile_id, px, transform, nodata, tb)], method="first", bounds=None)
        if acc is None:
            acc = np.zeros(mean_px.shape, dtype=np.float64)
            cnt = np.zeros(mean_px.shape, dtype=np.int64)
        # align into mean grid
        a, b, c, d, e, f = mean_transform if mean_transform else out_t
        col0 = int(round((out_t[2] - c) / a))
        row0 = int(round((out_t[5] - f) / e))
        h, w = merged.shape
        sl = (slice(row0, row0 + h), slice(col0, col0 + w))
        valid = ~merged.mask & ~np.ma.getmaskarray(mean_px[sl])
        diff = np.zeros_like(merged.data)
        diff[valid] = (merged.data[valid] - np.ma.getdata(mean_px[sl])[valid]) ** 2
        acc[sl][valid] += diff[valid]
        cnt[sl][valid] += 1
    with np.errstate(invalid="ignore", divide="ignore"):
        var = acc / cnt
    return np.ma.masked_array(var, mask=cnt == 0)


def merge_stddev(tiles, mean, **kw):
    """sqrt of merge_variance — merge.py:131-146."""
    return np.ma.sqrt(merge_variance(tiles, mean, **kw))
