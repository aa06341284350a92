"""Pure-numpy raster reprojection / grid alignment.

Mirrors the reference's rasterio.warp wrapper semantics
(/root/reference/demeter/raster/utils/reprojection.py:15-238): reproject a
masked tile onto a destination CRS grid, optionally snapping to an existing
transform's pixel grid by a minimal sub-pixel offset
(reprojection.py:251-272), and reproject-then-merge collections onto one
common grid.  No rasterio in this environment, so the warp is an inverse
pixel mapping through the CRS math in functions/geo.py:

    dst pixel center -> crs_inverse(dst) -> lon/lat -> crs_forward(src)
                     -> fractional src row/col -> gather

Resampling methods: ``nearest`` (categorical), ``bilinear`` (continuous),
``cubic`` (Keys cubic convolution, a=-0.5 — the GDAL default kernel; 4x4
taps, valid-weight renormalization under nodata), ``lanczos`` (Lanczos-3
windowed sinc, 6x6 taps, same renormalization), ``average`` (area-ish:
supersampled nearest gather averaged per dst cell — the public
approximation of GDAL's average kernel), ``mode`` (majority vote over the
same supersampled window, ties to the smallest value — the categorical
downsampler, GDAL Resampling.mode).  All methods are vectorized over
the full destination grid; masked (nodata) source pixels never contribute.

Everything operates on single tiles and runs inside ``map_batches`` tasks at
scale — memory is bounded by one tile's destination grid, never a global
mosaic.

CRS support is the geo.py dispatch table (EPSG:4326/4269 identity,
EPSG:5070 Albers, EPSG:3857 Web Mercator, EPSG:326xx/327xx UTM, the
registered Lambert Conformal Conics EPSG:2154/EPSG:3347/ESRI:102004) plus
the ``geo.register_crs(code, forward, inverse)`` extension registry —
``geo.make_lcc`` builds the closures for any further LCC parameter set
(state plane, met grids).  Unknown EPSG codes raise a ValueError naming the
hook rather than silently passing coordinates through; the reference's
arbitrary-pyproj-CRS surface (reprojection.py:15-112) reduces to this
registry in a pyproj-less sandbox.
"""

from __future__ import annotations

import math

import numpy as np

from demeter_ray.functions import geo


def _densified_bounds(transform, h: int, w: int, src_crs: str, dst_crs: str, edge: int = 21):
    """Destination-CRS bounds of a source grid: map a densified boundary
    (edge x edge corner lattice) through the CRS pair and take the envelope
    (the public calculate_default_transform approach)."""
    rows = np.linspace(0, h, edge)
    cols = np.linspace(0, w, edge)
    rr, cc = np.meshgrid(rows, cols, indexing="ij")
    a, b, c, d, e, f = transform
    xs = a * cc.ravel() + b * rr.ravel() + c
    ys = d * cc.ravel() + e * rr.ravel() + f
    lon, lat = geo.crs_inverse(src_crs, xs, ys)
    dx, dy = geo.crs_forward(dst_crs, lon, lat)
    return float(dx.min()), float(dy.min()), float(dx.max()), float(dy.max())


def _center_scale(transform, h: int, w: int, src_crs: str, dst_crs: str):
    """Destination units per source pixel at the raster center (local
    Jacobian magnitude), used for the default output resolution."""
    a, b, c, d, e, f = transform
    rc, cc = h / 2.0, w / 2.0
    pts_c = np.array([cc, cc + 1, cc])
    pts_r = np.array([rc, rc, rc + 1])
    xs = a * pts_c + b * pts_r + c
    ys = d * pts_c + e * pts_r + f
    lon, lat = geo.crs_inverse(src_crs, xs, ys)
    dx, dy = geo.crs_forward(dst_crs, lon, lat)
    xres = math.hypot(dx[1] - dx[0], dy[1] - dy[0])
    yres = math.hypot(dx[2] - dx[0], dy[2] - dy[0])
    return xres, yres


def _min_offset(distance: float, res: float) -> float:
    """Minimal shift that aligns two same-resolution grids
    (reprojection.py:251-272 semantics)."""
    if distance == 0:
        return 0.0
    offset = distance % math.copysign(res, distance)
    if abs(offset) > res / 2:
        offset -= math.copysign(res, offset)
    assert abs(offset) <= res / 2
    return offset


def default_transform(
    transform, h: int, w: int, src_crs: str, dst_crs: str, align_to=None
):
    """Output (transform, height, width) for a reprojection.  With
    ``align_to``, the output uses that transform's resolution and snaps the
    origin onto its pixel grid by the minimal offset."""
    minx, miny, maxx, maxy = _densified_bounds(transform, h, w, src_crs, dst_crs)
    if align_to is not None:
        ta, tb, tc, td, te, tf = align_to
        xres, yres = abs(ta), abs(te)
    else:
        xres, yres = _center_scale(transform, h, w, src_crs, dst_crs)
    dw = max(1, int(math.ceil((maxx - minx) / xres - 1e-9)))
    dh = max(1, int(math.ceil((maxy - miny) / yres - 1e-9)))
    left, top = minx, maxy
    if align_to is not None:
        left += _min_offset(align_to[2] - left, xres)
        top += _min_offset(align_to[5] - top, yres)
    return (xres, 0.0, left, 0.0, -yres, top), dh, dw


def _src_fractional_rowcol(dst_transform, dh, dw, src_transform, src_crs, dst_crs,
                           sub: int = 1):
    """Fractional source (row, col) for every destination sample point.
    ``sub`` > 1 samples a sub x sub lattice inside each destination pixel
    (for the average kernel).  Returns (rows, cols) of shape (dh*sub, dw*sub)."""
    a, b, c, d, e, f = dst_transform
    off = (np.arange(sub) + 0.5) / sub
    col_f = (np.repeat(np.arange(dw), sub) + np.tile(off, dw))
    row_f = (np.repeat(np.arange(dh), sub) + np.tile(off, dh))
    cc, rr = np.meshgrid(col_f, row_f)
    xs = a * cc + b * rr + c
    ys = d * cc + e * rr + f
    lon, lat = geo.crs_inverse(dst_crs, xs.ravel(), ys.ravel())
    sx, sy = geo.crs_forward(src_crs, lon, lat)
    sa, sb, sc, sd, se, sf = src_transform
    det = sa * se - sb * sd
    scol = (se * (sx - sc) - sb * (sy - sf)) / det
    srow = (-sd * (sx - sc) + sa * (sy - sf)) / det
    return srow.reshape(rr.shape), scol.reshape(cc.shape)


def _gather_nearest(px: np.ndarray, mask: np.ndarray, srow, scol):
    h, w = px.shape
    ri = np.floor(srow).astype(np.int64)
    ci = np.floor(scol).astype(np.int64)
    inside = (ri >= 0) & (ri < h) & (ci >= 0) & (ci < w)
    ris, cis = np.clip(ri, 0, h - 1), np.clip(ci, 0, w - 1)
    vals = px[ris, cis]
    out_mask = ~inside | mask[ris, cis]
    return vals, out_mask


def reproject_raster(
    pixels,
    transform,
    src_crs: str,
    dst_crs: str,
    resampling: str = "nearest",
    align_to=None,
    supersample: int = 3,
):
    """Reproject one masked 2-D tile.  Returns (masked_pixels, transform).

    Mirrors reprojection.py:15-119: no-op when CRS and grid already match;
    with ``align_to``, output resolution comes from the target transform and
    the origin snaps onto its grid.
    """
    px = np.ma.asarray(pixels, dtype=np.float64)
    mask = np.ma.getmaskarray(px)
    data = np.ma.getdata(px)
    h, w = data.shape
    if src_crs == dst_crs and (align_to is None or tuple(align_to) == tuple(transform)):
        return px, tuple(transform)
    dst_transform, dh, dw, = default_transform(transform, h, w, src_crs, dst_crs, align_to)
    if resampling == "nearest":
        srow, scol = _src_fractional_rowcol(dst_transform, dh, dw, transform, src_crs, dst_crs)
        vals, vmask = _gather_nearest(data, mask, srow, scol)
        out = np.ma.masked_array(vals, mask=vmask)
    elif resampling == "bilinear":
        srow, scol = _src_fractional_rowcol(dst_transform, dh, dw, transform, src_crs, dst_crs)
        r0 = np.floor(srow - 0.5)
        c0 = np.floor(scol - 0.5)
        fr = (srow - 0.5) - r0
        fc = (scol - 0.5) - c0
        acc = np.zeros(srow.shape)
        wacc = np.zeros(srow.shape)
        for dr, dc, wgt in (
            (0, 0, (1 - fr) * (1 - fc)),
            (0, 1, (1 - fr) * fc),
            (1, 0, fr * (1 - fc)),
            (1, 1, fr * fc),
        ):
            ri = (r0 + dr).astype(np.int64)
            ci = (c0 + dc).astype(np.int64)
            ok = (ri >= 0) & (ri < h) & (ci >= 0) & (ci < w)
            ris, cis = np.clip(ri, 0, h - 1), np.clip(ci, 0, w - 1)
            ok &= ~mask[ris, cis]
            acc += np.where(ok, data[ris, cis] * wgt, 0.0)
            wacc += np.where(ok, wgt, 0.0)
        with np.errstate(invalid="ignore", divide="ignore"):
            vals = acc / wacc
        out = np.ma.masked_array(np.nan_to_num(vals), mask=wacc <= 0)
    elif resampling == "cubic":
        # Keys cubic convolution, a = -0.5 (GDAL Resampling.cubic parity,
        # reprojection.py:15-112): weights reproduce polynomials exactly up
        # to degree 3; under nodata the valid taps renormalize like the
        # bilinear kernel (output masked where no usable weight remains)
        srow, scol = _src_fractional_rowcol(dst_transform, dh, dw, transform, src_crs, dst_crs)
        rpos, cpos = srow - 0.5, scol - 0.5
        r0, c0 = np.floor(rpos), np.floor(cpos)
        fr, fc = rpos - r0, cpos - c0

        def _keys(t):
            at = np.abs(t)
            return np.where(
                at <= 1.0,
                1.5 * at**3 - 2.5 * at**2 + 1.0,
                np.where(at < 2.0, -0.5 * at**3 + 2.5 * at**2 - 4.0 * at + 2.0, 0.0),
            )

        acc = np.zeros(srow.shape)
        wacc = np.zeros(srow.shape)
        for dr in (-1, 0, 1, 2):
            wr = _keys(dr - fr)
            ri = (r0 + dr).astype(np.int64)
            rin = (ri >= 0) & (ri < h)
            ris = np.clip(ri, 0, h - 1)
            for dc in (-1, 0, 1, 2):
                wc = _keys(dc - fc)
                ci = (c0 + dc).astype(np.int64)
                ok = rin & (ci >= 0) & (ci < w)
                cis = np.clip(ci, 0, w - 1)
                ok &= ~mask[ris, cis]
                wgt = wr * wc
                acc += np.where(ok, data[ris, cis] * wgt, 0.0)
                wacc += np.where(ok, wgt, 0.0)
        with np.errstate(invalid="ignore", divide="ignore"):
            vals = acc / wacc
        out = np.ma.masked_array(
            np.nan_to_num(vals), mask=np.abs(wacc) <= 1e-9
        )
    elif resampling == "lanczos":
        # Lanczos-3 windowed sinc (GDAL Resampling.lanczos parity,
        # reprojection.py:15-112): 6x6 taps, sinc(t)*sinc(t/3) window;
        # wacc renormalization makes constants exact and handles nodata
        # exactly like the cubic kernel
        srow, scol = _src_fractional_rowcol(dst_transform, dh, dw, transform, src_crs, dst_crs)
        rpos, cpos = srow - 0.5, scol - 0.5
        r0, c0 = np.floor(rpos), np.floor(cpos)
        fr, fc = rpos - r0, cpos - c0

        def _lcz(t):
            return np.where(np.abs(t) < 3.0, np.sinc(t) * np.sinc(t / 3.0), 0.0)

        acc = np.zeros(srow.shape)
        wacc = np.zeros(srow.shape)
        for dr in range(-2, 4):
            wr = _lcz(dr - fr)
            ri = (r0 + dr).astype(np.int64)
            rin = (ri >= 0) & (ri < h)
            ris = np.clip(ri, 0, h - 1)
            for dc in range(-2, 4):
                wc = _lcz(dc - fc)
                ci = (c0 + dc).astype(np.int64)
                ok = rin & (ci >= 0) & (ci < w)
                cis = np.clip(ci, 0, w - 1)
                ok &= ~mask[ris, cis]
                wgt = wr * wc
                acc += np.where(ok, data[ris, cis] * wgt, 0.0)
                wacc += np.where(ok, wgt, 0.0)
        with np.errstate(invalid="ignore", divide="ignore"):
            vals = acc / wacc
        out = np.ma.masked_array(np.nan_to_num(vals), mask=np.abs(wacc) <= 1e-9)
    elif resampling == "average":
        srow, scol = _src_fractional_rowcol(
            dst_transform, dh, dw, transform, src_crs, dst_crs, sub=supersample
        )
        vals, vmask = _gather_nearest(data, mask, srow, scol)
        s = supersample
        v4 = vals.reshape(dh, s, dw, s)
        m4 = vmask.reshape(dh, s, dw, s)
        cnt = (~m4).sum(axis=(1, 3))
        total = np.where(m4, 0.0, v4).sum(axis=(1, 3))
        with np.errstate(invalid="ignore", divide="ignore"):
            mean = total / cnt
        out = np.ma.masked_array(np.nan_to_num(mean), mask=cnt == 0)
    elif resampling == "mode":
        # majority vote over the supersampled window — the categorical
        # counterpart of "average" (GDAL Resampling.mode); ties break to the
        # smallest value for determinism
        srow, scol = _src_fractional_rowcol(
            dst_transform, dh, dw, transform, src_crs, dst_crs, sub=supersample
        )
        vals, vmask = _gather_nearest(data, mask, srow, scol)
        s = supersample
        v4 = vals.reshape(dh, s, dw, s).transpose(0, 2, 1, 3).reshape(dh, dw, s * s)
        m4 = vmask.reshape(dh, s, dw, s).transpose(0, 2, 1, 3).reshape(dh, dw, s * s)
        sv = np.sort(np.where(m4, np.inf, v4), axis=2)
        best_val = np.zeros((dh, dw))
        best_cnt = np.zeros((dh, dw), dtype=np.int64)
        for k in range(s * s):
            v = sv[..., k]
            cnt = (sv == v[..., None]).sum(axis=2)
            better = (cnt > best_cnt) & np.isfinite(v)
            best_val = np.where(better, v, best_val)
            best_cnt = np.where(better, cnt, best_cnt)
        out = np.ma.masked_array(best_val, mask=best_cnt == 0)
    else:
        raise ValueError(f"unsupported resampling {resampling!r}")
    return out, dst_transform


def reproject_tiles(tiles, dst_crs: str, resampling: str, align_to=None):
    """Reproject tile payloads [(tile_id, pixels, transform, nodata, bounds,
    crs)] onto ``dst_crs``.  When ``align_to`` is None the FIRST tile's
    destination grid becomes the alignment target for the rest (the
    rasterio-merge 'first raster defines the grid' rule), so the outputs
    always share one pixel grid and merge exactly."""
    out = []
    target = align_to
    for tile in sorted(tiles, key=lambda t: t[0]):
        tile_id, px, transform, nodata, _bounds, crs = tile
        masked = np.ma.masked_array(
            np.asarray(px, dtype=np.float64),
            mask=_nodata_mask(np.asarray(px, dtype=np.float64), nodata),
        )
        warped, wtransform = reproject_raster(
            masked, transform, crs, dst_crs, resampling, align_to=target
        )
        if target is None:
            target = wtransform
        h, w = warped.shape
        out.append(
            (
                tile_id,
                warped.filled(np.nan),
                wtransform,
                float("nan"),
                geo.raster_bounds(wtransform, h, w),
            )
        )
    return out


def _nodata_mask(px: np.ndarray, nodata) -> np.ndarray:
    if nodata is None:
        return np.isnan(px)
    if isinstance(nodata, float) and math.isnan(nodata):
        return np.isnan(px)
    return (px == nodata) | np.isnan(px)
