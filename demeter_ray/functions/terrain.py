"""Terrain analysis kernels: Horn slope / aspect + analytic hillshade.

Pure-numpy focal (3x3) kernels over a 2D elevation array — the gdaldem
slope/aspect/hillshade analog (reference keeps rasters as plain arrays, e.g.
/root/reference/demeter/raster/__init__.py; the sandbox has no
rasterio/gdal, so the kernels are reimplemented from Horn 1981's published
finite-difference stencil).  All functions take the array WITH any halo rows
already attached and return values for the interior only — the distributed
caller (pipelines/oracle_spatial.dem_slope_hillshade) evaluates each row
stripe plus a one-row halo and never moves pixel data between stripes.

Conventions (match gdaldem):
- slope_deg   = degrees(atan(sqrt(dzdx^2 + dzdy^2)))
- aspect_deg  = degrees(atan2(dzdy, -dzdx)) mapped to compass [0, 360)
  (0 = north, 90 = east); flat cells (both gradients 0) -> -1.0
- hillshade   = 255 * (cos(zen)*cos(slope)
                       + sin(zen)*sin(slope)*cos(az - aspect_rad)),
  clamped at 0, with sun azimuth/altitude in degrees.
"""

from __future__ import annotations

import numpy as np


def horn_gradients_rows(
    zm1: np.ndarray, z0: np.ndarray, zp1: np.ndarray, xres: float, yres: float
):
    """Horn gradients for a BATCH of raster rows given explicit halo rows.

    ``zm1``/``z0``/``zp1`` are (n, W) float64: the row above, the row itself,
    and the row below, for n (not necessarily contiguous) target rows — the
    shape a distributed row-stripe stage hands in after evaluating its one-row
    halos.  For the window  a b c / d e f / g h i:
      dzdx = ((c + 2f + i) - (a + 2d + g)) / (8 * xres)
      dzdy = ((g + 2h + i) - (a + 2b + c)) / (8 * yres)
    Returns (dzdx, dzdy) of shape (n, W-2) — interior columns only.
    """
    a, b, c = zm1[:, :-2], zm1[:, 1:-1], zm1[:, 2:]
    d, f = z0[:, :-2], z0[:, 2:]
    g, h, i = zp1[:, :-2], zp1[:, 1:-1], zp1[:, 2:]
    dzdx = ((c + 2.0 * f + i) - (a + 2.0 * d + g)) / (8.0 * xres)
    dzdy = ((g + 2.0 * h + i) - (a + 2.0 * b + c)) / (8.0 * yres)
    return dzdx, dzdy


def horn_gradients(z: np.ndarray, xres: float, yres: float):
    """Horn's 3x3 finite differences for the interior of a full 2D ``z``;
    thin wrapper over :func:`horn_gradients_rows`.  Returns (H-2, W-2)."""
    z = np.asarray(z, dtype=np.float64)
    return horn_gradients_rows(z[:-2], z[1:-1], z[2:], xres, yres)


def slope_deg(dzdx: np.ndarray, dzdy: np.ndarray) -> np.ndarray:
    """Slope in degrees from Horn gradients."""
    return np.degrees(np.arctan(np.sqrt(dzdx * dzdx + dzdy * dzdy)))


def aspect_deg(dzdx: np.ndarray, dzdy: np.ndarray) -> np.ndarray:
    """Compass aspect in degrees (0 = north, clockwise); flat cells -> -1."""
    asp = np.degrees(np.arctan2(dzdy, -dzdx))
    # math convention -> compass: 90 - asp in [-90, 270); a single
    # conditional +360 (NOT fmod) keeps the op sequence identical to the
    # SQL oracle's CASE expression for bit-level parity before rounding
    comp = 90.0 - asp
    comp = np.where(comp < 0.0, comp + 360.0, comp)
    flat = (dzdx == 0.0) & (dzdy == 0.0)
    return np.where(flat, -1.0, comp)


def hillshade(
    dzdx: np.ndarray,
    dzdy: np.ndarray,
    azimuth_deg: float = 315.0,
    altitude_deg: float = 45.0,
) -> np.ndarray:
    """Analytic hillshade 0..255 (float64, unclamped above, clamped at 0).

    Uses the direct gradient form (equivalent to the slope/aspect form but
    free of the flat-cell aspect special case):
      hs = 255 * (cos(zen) + sin(zen)*(sin(az)*(-dzdx') + cos(az)*(-dzdy')))
           / sqrt(1 + dzdx^2 + dzdy^2)
    with dzdy' negated because +row is south while +y is north.
    """
    zen = np.radians(90.0 - altitude_deg)
    az = np.radians(azimuth_deg)
    denom = np.sqrt(1.0 + dzdx * dzdx + dzdy * dzdy)
    num = np.cos(zen) + np.sin(zen) * (np.sin(az) * (-dzdx) + np.cos(az) * dzdy)
    hs = 255.0 * num / denom
    return np.maximum(hs, 0.0)
