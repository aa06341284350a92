"""Raster-sampling join: points x tiled raster -> pixel values.

Reproduces ``Raster.value_at`` semantics (inverse-affine floor rowcol, nodata
-> null; /root/reference/demeter/raster/__init__.py:92-108) as a vectorized
``map_batches`` stage over a *broadcast* tile set: the raster side of this
join is a per-dataset tile table (small per region), shipped once with
``ray.put``; each actor decodes tiles to numpy ONCE in ``__init__`` and
samples whole point batches with numpy gathers — the reference's per-point
``value_at`` python loop (/root/reference/demeter/api.py:115-126) becomes one
vectorized gather per (batch, tile).

Overlapping tiles resolve in sorted-tile_id order ("first" merge semantics
made deterministic — SURVEY.md §7.5).  Points outside every tile yield null.

Scale note: per-dataset tile payloads beyond a broadcast's budget should be
hash-partitioned by tile_id and the points repartitioned by the same key
(cell_prefix ~ tile grid); the per-batch math is unchanged.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from demeter_ray.functions import geo
from demeter_ray.stages.pools import fitted_pool


def load_tiles(raster_tiles: pa.Table, dataset: str, statistic=None, depth_top=None,
               with_crs: bool = False):
    """Decode the tile rows for one (dataset[, statistic, depth]) into plain
    numpy payloads: [(tile_id, pixels2d, transform, nodata, bounds), ...]
    sorted by tile_id (canonical overlap order).  ``with_crs`` appends the
    crs string per tile for reprojecting samplers.  The row selection is one
    vectorized Arrow filter (this runs in every sampler actor ``__init__``)."""
    import pyarrow.compute as pc

    mask = pc.equal(raster_tiles["dataset"], dataset)
    if statistic is not None:
        mask = pc.and_(mask, pc.equal(raster_tiles["statistic"], statistic))
    if depth_top is not None:
        mask = pc.and_(mask, pc.equal(raster_tiles["depth_top_cm"], depth_top))
    tbl = raster_tiles.filter(mask)
    tiles = []
    for i in range(tbl.num_rows):
        h = tbl["h"][i].as_py()
        w = tbl["w"][i].as_py()
        dtype = tbl["dtype"][i].as_py()
        px = np.frombuffer(tbl["pixels"][i].as_py(), dtype=dtype).reshape(h, w)
        transform = tuple(tbl["transform"][i].as_py())
        nodata = tbl["nodata"][i].as_py()
        bounds = geo.raster_bounds(transform, h, w)
        row = (tbl["tile_id"][i].as_py(), px, transform, nodata, bounds)
        if with_crs:
            row = row + (tbl["crs"][i].as_py(),)
        tiles.append(row)
    tiles.sort(key=lambda t: t[0])
    return tiles


def sample_tiles_at(tiles, lons, lats) -> np.ndarray:
    """Vectorized value_at over a tile list: float64 output, NaN = no data
    (outside coverage or nodata pixel)."""
    lons = np.asarray(lons, dtype=np.float64)
    lats = np.asarray(lats, dtype=np.float64)
    out = np.full(len(lons), np.nan, dtype=np.float64)
    unassigned = np.ones(len(lons), dtype=bool)
    for tile_id, px, transform, nodata, (left, bottom, right, top) in tiles:
        # half-open membership [left, right) x (bottom, top] matches floor
        # rowcol: the top/left edges belong to the tile
        m = unassigned & (lons >= left) & (lons < right) & (lats > bottom) & (lats <= top)
        if not m.any():
            continue
        rows, cols = geo.affine_rowcol(transform, lons[m], lats[m])
        h, w = px.shape
        ok = (rows >= 0) & (rows < h) & (cols >= 0) & (cols < w)
        vals = np.full(int(m.sum()), np.nan)
        v = px[rows[ok], cols[ok]].astype(np.float64)
        if nodata is not None and not (isinstance(nodata, float) and np.isnan(nodata)):
            v = np.where(v == nodata, np.nan, v)
        vals[ok] = v
        out_idx = np.flatnonzero(m)
        out[out_idx] = vals
        # only NON-NODATA hits consume a point: a later overlapping tile may
        # fill a nodata hole, matching the reference's "first" merge
        # (merge.py _copy_first fills masked pixels from later rasters) and
        # the reprojecting sampler below
        unassigned[out_idx[~np.isnan(vals)]] = False
    return out


class SampleActor:
    """Actor-pool stage: decode tiles once, sample per batch."""

    def __init__(self, tiles_ref, out_col: str):
        self.tiles = ray.get(tiles_ref) if not isinstance(tiles_ref, list) else tiles_ref
        self.out_col = out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        vals = sample_tiles_at(
            self.tiles,
            batch["lon"].to_numpy(zero_copy_only=False),
            batch["lat"].to_numpy(zero_copy_only=False),
        )
        col = pa.array(vals, pa.float64(), from_pandas=True)  # NaN -> null
        return batch.append_column(self.out_col, col)


def sample_join(
    ds: ray.data.Dataset,
    raster_tiles: pa.Table,
    dataset: str,
    statistic=None,
    depth_top=None,
    out_col=None,
    concurrency=4,
    batch_size: int = 8192,
) -> ray.data.Dataset:
    out_col = out_col or dataset
    tiles = load_tiles(raster_tiles, dataset, statistic, depth_top)
    ref = ray.put(tiles)
    return ds.map_batches(
        SampleActor,
        fn_constructor_args=(ref, out_col),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=fitted_pool(concurrency) if isinstance(concurrency, int) else concurrency,
    )


def sample_tiles_at_crs(tiles_with_crs, lons, lats) -> np.ndarray:
    """Reprojecting sampler: points arrive as WGS84 lon/lat; each tile's crs
    decides the coordinate space for the inverse-affine lookup — the
    reference's ``points.to_crs(raster_crs)`` before value_at
    (api.py:108,132,184,210 / SURVEY.md M2).  EPSG:4326/4269 sample
    directly; EPSG:326xx transforms points to that UTM zone; EPSG:5070 to
    CONUS Albers (the reference's hydrography/topo CRSs, api.py:184,210)."""
    lons = np.asarray(lons, dtype=np.float64)
    lats = np.asarray(lats, dtype=np.float64)
    out = np.full(len(lons), np.nan, dtype=np.float64)
    unassigned = np.ones(len(lons), dtype=bool)
    by_crs: dict[str, list] = {}
    for row in tiles_with_crs:
        by_crs.setdefault(row[5], []).append(row[:5])
    for crs, tiles in sorted(by_crs.items()):
        xs, ys = geo.crs_forward(crs, lons, lats)
        vals = sample_tiles_at(tiles, xs, ys)
        hit = unassigned & ~np.isnan(vals)
        out[hit] = vals[hit]
        unassigned &= ~hit
    return out


def shard_tiles(raster_tiles: pa.Table, dataset: str, prefix_res: int,
                statistic=None, depth_top=None) -> dict:
    """Shard a dataset's tiles by coarse cell: each tile is replicated into
    every prefix cell its lon/lat envelope touches (projected tiles map
    their corner envelope through crs_inverse first), so any point's
    covering tiles are all present in the point's own shard and the
    sorted-tile_id overlap order is preserved.  One ``ray.put`` object per
    shard — the whole tile table never broadcasts as one payload."""
    tiles = load_tiles(raster_tiles, dataset, statistic, depth_top, with_crs=True)
    shards: dict[int, list] = {}
    edge = np.linspace(0.0, 1.0, 9)
    zeros, ones = np.zeros_like(edge), np.ones_like(edge)
    for row in tiles:
        left, bottom, right, top = row[4]
        crs = row[5]
        # densified boundary lattice (warp._densified_bounds approach): a
        # projected tile's edges bow outward in lon/lat under conic/TM CRSs,
        # so a 4-corner envelope can miss boundary prefix cells the tile
        # actually covers (returning nulls the broadcast sampler fills)
        xs = left + (right - left) * np.concatenate([edge, edge, zeros, ones])
        ys = bottom + (top - bottom) * np.concatenate([zeros, ones, edge, edge])
        lon, lat = geo.crs_inverse(crs, xs, ys)
        cxs, cys = geo.cover_bbox(lon.min(), lat.min(), lon.max(), lat.max(), prefix_res)
        for cell in geo.cell_id_from_xy(cxs, cys):
            shards.setdefault(int(cell), []).append(row)
    return {
        cell: ray.put(sorted(rows, key=lambda t: t[0]))
        for cell, rows in shards.items()
    }


class ShardedSampleActor:
    """Per-prefix tile sets with an actor-local LRU (the sharded_pip_join
    pattern): worker memory is bounded by ``cache_size`` shards, not the
    tile table."""

    def __init__(self, shard_refs: dict, prefix_res: int, out_col: str,
                 cache_size: int = 8):
        from collections import OrderedDict

        self.shard_refs = shard_refs
        self.prefix_res = prefix_res
        self.out_col = out_col
        self.cache_size = cache_size
        self._cache: "OrderedDict[int, list]" = OrderedDict()

    def _tiles(self, prefix: int) -> list:
        tiles = self._cache.get(prefix)
        if tiles is not None:
            self._cache.move_to_end(prefix)
            return tiles
        tiles = ray.get(self.shard_refs[prefix])
        self._cache[prefix] = tiles
        while len(self._cache) > self.cache_size:
            self._cache.popitem(last=False)
        return tiles

    def __call__(self, batch: pa.Table) -> pa.Table:
        lons = batch["lon"].to_numpy(zero_copy_only=False)
        lats = batch["lat"].to_numpy(zero_copy_only=False)
        prefixes = geo.cell_id(lons, lats, self.prefix_res)
        vals = np.full(len(lons), np.nan, dtype=np.float64)
        for p in np.unique(prefixes):
            if int(p) not in self.shard_refs:
                continue
            sel = np.flatnonzero(prefixes == p)
            vals[sel] = sample_tiles_at_crs(self._tiles(int(p)), lons[sel], lats[sel])
        col = pa.array(vals, pa.float64(), from_pandas=True)  # NaN -> null
        return batch.append_column(self.out_col, col)


def sharded_sample_join(
    ds: ray.data.Dataset,
    raster_tiles: pa.Table,
    dataset: str,
    prefix_res: int = 11,
    statistic=None,
    depth_top=None,
    out_col=None,
    concurrency=4,
    batch_size: int = 8192,
) -> ray.data.Dataset:
    """The multi-region scale path of ``sample_join``: tiles shard by
    coarse cell, points route per batch through an actor-local LRU.
    Identical output to the broadcast path (parity-tested)."""
    out_col = out_col or dataset
    shard_refs = shard_tiles(raster_tiles, dataset, prefix_res, statistic, depth_top)
    return ds.map_batches(
        ShardedSampleActor,
        fn_constructor_args=(shard_refs, prefix_res, out_col),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=fitted_pool(concurrency) if isinstance(concurrency, int) else concurrency,
    )


def sample_tiles_at_bilinear(tiles, lons, lats) -> np.ndarray:
    """Bilinear-interpolated value_at over a tile list (float64, NaN = no
    coverage / no usable corner).  Same pixel-center convention and corner
    weight order as the reprojection kernel (functions/warp.py bilinear:
    rpos = frac_row - 0.5, corners (0,0),(0,1),(1,0),(1,1), nodata corners
    drop out and the remaining weights renormalize).  Axis-aligned
    transforms only (b = d = 0), like every fixture raster."""
    lons = np.asarray(lons, dtype=np.float64)
    lats = np.asarray(lats, dtype=np.float64)
    out = np.full(len(lons), np.nan, dtype=np.float64)
    unassigned = np.ones(len(lons), dtype=bool)
    for _tile_id, px, transform, nodata, (left, bottom, right, top) in tiles:
        a, b, c, d, e, f = transform
        assert b == 0.0 and d == 0.0, "bilinear sampling needs axis-aligned tiles"
        m = unassigned & (lons >= left) & (lons < right) & (lats > bottom) & (lats <= top)
        if not m.any():
            continue
        h, w = px.shape
        cpos = (lons[m] - c) / a - 0.5
        rpos = (lats[m] - f) / e - 0.5
        r0, c0 = np.floor(rpos), np.floor(cpos)
        fr, fc = rpos - r0, cpos - c0
        data = px.astype(np.float64)
        ndmask = np.zeros_like(data, dtype=bool)
        if nodata is not None and not (isinstance(nodata, float) and np.isnan(nodata)):
            ndmask = data == nodata
        acc = np.zeros(int(m.sum()))
        wacc = np.zeros(int(m.sum()))
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
            ok &= ~ndmask[ris, cis]
            acc += np.where(ok, data[ris, cis] * wgt, 0.0)
            wacc += np.where(ok, wgt, 0.0)
        with np.errstate(invalid="ignore", divide="ignore"):
            vals = np.where(wacc > 0, acc / wacc, np.nan)
        out_idx = np.flatnonzero(m)
        out[out_idx] = vals
        unassigned[out_idx[~np.isnan(vals)]] = False
    return out
