"""Pure-numpy geometry kernels: affine transforms, a hierarchical cell index
(H3/S2 stand-in), WKB codec, point-in-polygon, and bounds snapping.

This environment has no shapely/pyproj/rasterio, so everything here is
implemented from first principles on numpy float64 arrays. Semantics mirror the
reference:

- affine pixel<->geo math and floor-based rowcol:
  /root/reference/demeter/raster/__init__.py:92-108 (value_at/values_at),
  /root/reference/demeter/raster/utils/transform.py:10-78
- bounds snapped to a degree grid:
  /root/reference/demeter/utils.py:33-57 (bounds_snapped_to_grid)
- tile keys as the partitioning scheme:
  /root/reference/demeter/raster/polaris.py:358-370

All functions are vectorized over point arrays; none loop over rows.
"""

from __future__ import annotations

import math
import struct

import numpy as np

# --------------------------------------------------------------------------
# Affine transforms.  Layout follows rasterio's Affine: (a, b, c, d, e, f)
#   x = a*col + b*row + c
#   y = d*col + e*row + f
# i.e. c,f are the coordinates of the top-left corner of pixel (0,0).
# --------------------------------------------------------------------------


def affine_xy(transform, rows, cols, offset: str = "center"):
    """Pixel (row, col) -> geo (x, y). offset in {'center','ul','lr'}.

    Mirrors rasterio.transform.xy as used by align_bounds_to_transform
    (reference transform.py:19-40).
    """
    a, b, c, d, e, f = transform
    rows = np.asarray(rows, dtype=np.float64)
    cols = np.asarray(cols, dtype=np.float64)
    if offset == "center":
        rows, cols = rows + 0.5, cols + 0.5
    elif offset == "lr":
        rows, cols = rows + 1.0, cols + 1.0
    elif offset != "ul":
        raise ValueError(f"bad offset {offset}")
    x = a * cols + b * rows + c
    y = d * cols + e * rows + f
    return x, y


def affine_rowcol(transform, xs, ys, op=np.floor):
    """Geo (x, y) -> integer pixel (row, col), floor rule like
    rasterio.transform.rowcol (reference raster/__init__.py:105-108).

    Works for general invertible affines; for the common axis-aligned
    north-up case (b == d == 0) this reduces to
    col = floor((x - c) / a), row = floor((y - f) / e).
    """
    a, b, c, d, e, f = transform
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    det = a * e - b * d
    if det == 0:
        raise ValueError("non-invertible transform")
    # inverse affine applied to (x - c, y - f)
    col_f = (e * (xs - c) - b * (ys - f)) / det
    row_f = (-d * (xs - c) + a * (ys - f)) / det
    return op(row_f).astype(np.int64), op(col_f).astype(np.int64)


def resolution(transform):
    """(x_res, y_res) — reference transform.py:10-16."""
    a, _, _, _, e, _ = transform
    return a, -e


def raster_bounds(transform, h: int, w: int):
    """(left, bottom, right, top) of an axis-aligned raster."""
    a, b, c, d, e, f = transform
    xs = [c, c + a * w + b * h]
    ys = [f, f + d * w + e * h]
    return min(xs), min(ys), max(xs), max(ys)


def floor_unless_close(number: float) -> int:
    """Reference transform.py:69-78: snap up when within float tolerance of
    the ceiling, else floor.  Needed for exact tile-assignment parity."""
    ceil = math.ceil(number)
    if math.isclose(number, ceil):
        return ceil
    return math.floor(number)


def _floor_unless_close_arr(arr):
    arr = np.asarray(arr, dtype=np.float64)
    ceil = np.ceil(arr)
    close = np.isclose(arr, ceil, rtol=1e-09, atol=0.0)
    return np.where(close, ceil, np.floor(arr)).astype(np.int64)


def align_bounds_to_transform(bounds, transform):
    """Expand bounds to the transform's pixel grid (reference
    transform.py:19-40): snap up/left with float tolerance, down/right plain
    floor."""
    left, bottom, right, top = bounds
    top_row, left_col = affine_rowcol(
        transform, np.array([left]), np.array([top]), op=_floor_unless_close_arr
    )
    bottom_row, right_col = affine_rowcol(
        transform, np.array([right]), np.array([bottom])
    )
    new_left, new_top = affine_xy(transform, top_row, left_col, offset="ul")
    new_right, new_bottom = affine_xy(transform, bottom_row, right_col, offset="lr")
    return float(new_left[0]), float(new_bottom[0]), float(new_right[0]), float(new_top[0])


def aligned_pixel_grids(bounds, transforms, tol: float = 0.01) -> bool:
    """True when all transforms put the given bounds on one shared pixel grid
    (same fractional pixel offset, same pixel counts) — reference
    transform.py:43-66.  Tolerance is in fractional pixels (rounded to 2dp
    there)."""
    offsets = []
    shapes = []
    for t in transforms:
        a, b, c, d, e, f = t
        if b or d:
            return False
        left, bottom, right, top = bounds
        col_off = (left - c) / a
        row_off = (top - f) / e
        width = round((right - left) / a)
        height = round((bottom - top) / e)
        offsets.append((round(row_off, 2) % 1, round(col_off, 2) % 1))
        shapes.append((height, width))
    return len(set(offsets)) <= 1 and len(set(shapes)) <= 1


def bounds_snapped_to_grid(bounds_df, base: float = 1.0):
    """Snap (minx, miny, maxx, maxy) arrays outward to multiples of ``base``
    — reference demeter/utils.py:33-57.  Input: dict/struct of arrays; output
    deduplicated int arrays."""
    minx = np.floor(np.asarray(bounds_df["minx"], dtype=np.float64) / base)
    miny = np.floor(np.asarray(bounds_df["miny"], dtype=np.float64) / base)
    maxx = np.ceil(np.asarray(bounds_df["maxx"], dtype=np.float64) / base)
    maxy = np.ceil(np.asarray(bounds_df["maxy"], dtype=np.float64) / base)
    stacked = np.stack([minx, miny, maxx, maxy], axis=1).astype(np.int64)
    uniq = np.unique(stacked, axis=0)
    return uniq * int(base) if float(base).is_integer() else uniq * base


# --------------------------------------------------------------------------
# Hierarchical cell index (H3/S2 stand-in).
#
# Equirectangular quadtree over the lon/lat plane: at resolution r the world
# splits into 2^r x 2^r cells;  cx = floor((lon+180)/360 * 2^r),
# cy = floor((lat+90)/180 * 2^r).  A cell's parent at r-1 is (cx>>1, cy>>1).
# cell_id packs (cx, cy) as cx * 2^29 + cy  (r <= 28), which is deliberately
# plain integer arithmetic so a DuckDB oracle can reproduce it exactly.
# This replaces the reference's 1-degree/MGRS/HU4 tile keys
# (polaris.py:358-370, sentinel2/utils/tiles.py:19-99) with one uniform
# hierarchical scheme usable as the shuffle key.
# --------------------------------------------------------------------------

CELL_Y_BITS = 29
CELL_PACK = 1 << CELL_Y_BITS  # 536870912


def cell_xy(lons, lats, res: int):
    """(cx, cy) int64 arrays at resolution ``res`` (0..28)."""
    n = float(1 << res)
    lons = np.asarray(lons, dtype=np.float64)
    lats = np.asarray(lats, dtype=np.float64)
    cx = np.floor((lons + 180.0) / 360.0 * n).astype(np.int64)
    cy = np.floor((lats + 90.0) / 180.0 * n).astype(np.int64)
    np.clip(cx, 0, (1 << res) - 1, out=cx)
    np.clip(cy, 0, (1 << res) - 1, out=cy)
    return cx, cy


def cell_id_from_xy(cx, cy):
    return np.asarray(cx, dtype=np.int64) * CELL_PACK + np.asarray(cy, dtype=np.int64)


def cell_id(lons, lats, res: int):
    cx, cy = cell_xy(lons, lats, res)
    return cell_id_from_xy(cx, cy)


def cell_parent_id(cell_ids, levels: int):
    """Parent cell id ``levels`` resolutions up."""
    cell_ids = np.asarray(cell_ids, dtype=np.int64)
    cx = cell_ids // CELL_PACK
    cy = cell_ids % CELL_PACK
    return cell_id_from_xy(cx >> levels, cy >> levels)


def cell_bounds(cx: int, cy: int, res: int):
    n = float(1 << res)
    w = 360.0 / n
    h = 180.0 / n
    left = -180.0 + cx * w
    bottom = -90.0 + cy * h
    return left, bottom, left + w, bottom + h


def cover_bbox(minx, miny, maxx, maxy, res: int):
    """All (cx, cy) cells at ``res`` whose bounds intersect the bbox.
    Used to cover polygons for the cell-equi-join prefilter (the coarse
    analog of the reference's tile selection, polaris.py:358-370)."""
    cx0, cy0 = cell_xy([minx], [miny], res)
    cx1, cy1 = cell_xy([maxx], [maxy], res)
    xs = np.arange(cx0[0], cx1[0] + 1, dtype=np.int64)
    ys = np.arange(cy0[0], cy1[0] + 1, dtype=np.int64)
    gx, gy = np.meshgrid(xs, ys, indexing="ij")
    return gx.ravel(), gy.ravel()


# --------------------------------------------------------------------------
# WKB codec (pure python/numpy; little-endian; Polygon=3, MultiPolygon=6).
# The fields table stores geometry as a WKB binary column (SURVEY.md §1.4).
# --------------------------------------------------------------------------


def wkb_from_rings(rings) -> bytes:
    """Encode one Polygon from a list of (N,2) float arrays (first=outer)."""
    out = [struct.pack("<BI", 1, 3), struct.pack("<I", len(rings))]
    for ring in rings:
        ring = np.asarray(ring, dtype=np.float64)
        if not np.array_equal(ring[0], ring[-1]):
            ring = np.vstack([ring, ring[:1]])
        out.append(struct.pack("<I", len(ring)))
        out.append(ring.astype("<f8").tobytes())
    return b"".join(out)


def wkb_quad_polygons(x0, y0, x1, y1) -> "pa.BinaryArray":
    """Vectorized WKB for N axis-aligned quad polygons (CCW from the SW
    corner, explicitly closed — byte-identical to
    ``wkb_from_rings([[(x0,y0),(x1,y0),(x1,y1),(x0,y1)]])`` per row):
    ONE buffer assembly + a zero-copy Arrow binary column, no per-row
    Python in the hot path.  Used by the vector ingest/sink stages where
    every row grows a footprint polygon."""
    import pyarrow as pa

    x0 = np.asarray(x0, np.float64)
    y0 = np.asarray(y0, np.float64)
    x1 = np.asarray(x1, np.float64)
    y1 = np.asarray(y1, np.float64)
    n = len(x0)
    rec = np.zeros((n, 93), np.uint8)  # 1+4+4+4 header + 5 pts * 16 B
    rec[:, 0] = 1   # little-endian
    rec[:, 1] = 3   # geometry type Polygon
    rec[:, 5] = 1   # one ring
    rec[:, 9] = 5   # five points (closed)
    coords = np.empty((n, 5, 2), "<f8")
    coords[:, 0, 0] = x0
    coords[:, 0, 1] = y0
    coords[:, 1, 0] = x1
    coords[:, 1, 1] = y0
    coords[:, 2, 0] = x1
    coords[:, 2, 1] = y1
    coords[:, 3, 0] = x0
    coords[:, 3, 1] = y1
    coords[:, 4] = coords[:, 0]
    rec[:, 13:] = coords.view(np.uint8).reshape(n, 80)
    offsets = pa.array(np.arange(n + 1, dtype=np.int32) * 93)
    return pa.BinaryArray.from_buffers(
        pa.binary(), n, [None, offsets.buffers()[1],
                         pa.py_buffer(rec.tobytes())])


_QUAD_HEADER = np.array([1, 3, 0, 0, 0, 1, 0, 0, 0, 5, 0, 0, 0], np.uint8)


def quad_wkb_bounds(arr):
    """(n, 4) [minx, miny, maxx, maxy] for an Arrow binary column of
    93-byte single-ring 5-point polygon WKBs (the wkb_quad_polygons
    layout; bounds = min/max over the ring, so ANY closed quadrilateral is
    exact), computed from the column's raw buffers — zero per-row Python.
    Returns ``None`` when the column isn't uniformly such records (nulls,
    other vertex counts, multi-ring); callers fall back to parse_wkb +
    polygon_bounds per row."""
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = (arr.chunk(0) if arr.num_chunks == 1
               else pa.concat_arrays(arr.chunks))
    n = len(arr)
    if n == 0:
        return np.empty((0, 4), np.float64)
    if arr.null_count:
        return None
    offs = np.frombuffer(arr.buffers()[1], "<i4", count=n + 1,
                         offset=arr.offset * 4)
    if not np.all(np.diff(offs) == 93):
        return None
    vals = np.frombuffer(arr.buffers()[2], np.uint8,
                         count=int(offs[-1] - offs[0]), offset=int(offs[0]))
    rec = vals.reshape(n, 93)
    if not np.all(rec[:, :13] == _QUAD_HEADER):
        return None
    pts = np.ascontiguousarray(rec[:, 13:]).view("<f8").reshape(n, 5, 2)
    return np.concatenate([pts.min(axis=1), pts.max(axis=1)], axis=1)


def wkb_from_polygons(polygons) -> bytes:
    """Encode a MultiPolygon from a list of ring-lists."""
    out = [struct.pack("<BI", 1, 6), struct.pack("<I", len(polygons))]
    for rings in polygons:
        out.append(wkb_from_rings(rings))
    return b"".join(out)


def parse_wkb(buf: bytes):
    """Decode WKB Polygon/MultiPolygon -> list of polygons, each a list of
    (N,2) float64 ring arrays (outer first)."""
    pos = 0

    def read_polygon(pos):
        byte_order, gtype = struct.unpack_from("<BI", buf, pos)
        assert byte_order == 1 and gtype == 3, f"unsupported wkb type {gtype}"
        pos += 5
        (n_rings,) = struct.unpack_from("<I", buf, pos)
        pos += 4
        rings = []
        for _ in range(n_rings):
            (n_pts,) = struct.unpack_from("<I", buf, pos)
            pos += 4
            ring = np.frombuffer(buf, dtype="<f8", count=n_pts * 2, offset=pos)
            rings.append(ring.reshape(n_pts, 2).astype(np.float64))
            pos += n_pts * 16
        return rings, pos

    byte_order, gtype = struct.unpack_from("<BI", buf, pos)
    assert byte_order == 1
    if gtype == 3:
        rings, _ = read_polygon(0)
        return [rings]
    if gtype == 6:
        pos = 5
        (n_polys,) = struct.unpack_from("<I", buf, pos)
        pos += 4
        polys = []
        for _ in range(n_polys):
            rings, pos = read_polygon(pos)
            polys.append(rings)
        return polys
    raise ValueError(f"unsupported wkb geometry type {gtype}")


def polygon_bounds(polys):
    allpts = np.vstack([ring for rings in polys for ring in rings])
    return (
        float(allpts[:, 0].min()),
        float(allpts[:, 1].min()),
        float(allpts[:, 0].max()),
        float(allpts[:, 1].max()),
    )


# --------------------------------------------------------------------------
# Point-in-polygon kernels (vectorized over points).
# --------------------------------------------------------------------------


def points_in_ring(xs, ys, ring) -> np.ndarray:
    """Even-odd (ray-crossing) test of N points against one closed ring.
    Broadcasts points x edges: O(N*E) float ops, no python loop over points."""
    xs = np.asarray(xs, dtype=np.float64)[:, None]
    ys = np.asarray(ys, dtype=np.float64)[:, None]
    ring = np.asarray(ring, dtype=np.float64)
    x1, y1 = ring[:-1, 0][None, :], ring[:-1, 1][None, :]
    x2, y2 = ring[1:, 0][None, :], ring[1:, 1][None, :]
    # edge straddles the horizontal line through y
    straddle = (y1 > ys) != (y2 > ys)
    with np.errstate(divide="ignore", invalid="ignore"):
        x_int = x1 + (ys - y1) * (x2 - x1) / (y2 - y1)
    crossing = straddle & (xs < x_int)
    return (crossing.sum(axis=1) % 2).astype(bool)


def points_in_polygon(xs, ys, polys) -> np.ndarray:
    """Even-odd over all rings of all parts: XOR handles holes."""
    result = np.zeros(len(np.asarray(xs)), dtype=bool)
    for rings in polys:
        for ring in rings:
            result ^= points_in_ring(xs, ys, ring)
    return result


def points_in_convex_polygon(xs, ys, vertices, closed: bool = True) -> np.ndarray:
    """Half-plane test for a convex CCW polygon: inside iff every edge cross
    product >= 0.  This exact arithmetic form is reproducible in ANSI SQL,
    so oracle-checked pipelines use this kernel for convex fences."""
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    verts = np.asarray(vertices, dtype=np.float64)
    if np.array_equal(verts[0], verts[-1]):
        verts = verts[:-1]
    inside = np.ones(len(xs), dtype=bool)
    n = len(verts)
    for i in range(n):
        x1, y1 = verts[i]
        x2, y2 = verts[(i + 1) % n]
        cross = (x2 - x1) * (ys - y1) - (y2 - y1) * (xs - x1)
        inside &= cross >= 0.0 if closed else cross > 0.0
    return inside


class PolygonIndex:
    """Prepared-geometry polygon index: cell prefilter + exact PIP refine.

    The Ray-native replacement for the reference's server-side
    ``STIntersects`` spatial join (ssurgo.py:20-32): polygons are covered
    into cells at ``res``; a point only tests the polygons whose cover
    includes its cell.  Build once per actor (stages/pip.py), query per
    batch.
    """

    def __init__(self, ids, wkbs, res: int = 12):
        self.res = res
        self.ids = np.asarray(ids, dtype=np.int64)
        self.polys = [parse_wkb(w) for w in wkbs]
        self.bounds = [polygon_bounds(p) for p in self.polys]
        buckets: dict[int, list[int]] = {}
        for i, b in enumerate(self.bounds):
            gx, gy = cover_bbox(*b, res)
            for cid in cell_id_from_xy(gx, gy):
                buckets.setdefault(int(cid), []).append(i)
        self._buckets = {k: np.array(v, dtype=np.int64) for k, v in buckets.items()}

    def query_min_id(self, lons, lats):
        """For each point: the smallest polygon id containing it, or -1.
        Deterministic under overlap (min id), matching the oracle's
        ``min(map_unit_key)`` tie rule."""
        lons = np.asarray(lons, dtype=np.float64)
        lats = np.asarray(lats, dtype=np.float64)
        out = np.full(len(lons), -1, dtype=np.int64)
        if len(lons) == 0:
            return out
        cells = cell_id(lons, lats, self.res)
        order = np.argsort(cells, kind="stable")
        sorted_cells = cells[order]
        starts = np.flatnonzero(
            np.r_[True, sorted_cells[1:] != sorted_cells[:-1]]
        )
        ends = np.r_[starts[1:], len(sorted_cells)]
        for s, e in zip(starts, ends):
            cand = self._buckets.get(int(sorted_cells[s]))
            if cand is None:
                continue
            idx = order[s:e]
            px, py = lons[idx], lats[idx]
            best = np.full(len(idx), -1, dtype=np.int64)
            for ci in cand:
                pid = self.ids[ci]
                minx, miny, maxx, maxy = self.bounds[ci]
                bb = (px >= minx) & (px <= maxx) & (py >= miny) & (py <= maxy)
                if not bb.any():
                    continue
                hit = np.zeros(len(idx), dtype=bool)
                hit[bb] = points_in_polygon(px[bb], py[bb], self.polys[ci])
                better = hit & ((best == -1) | (pid < best))
                best[better] = pid
            out[idx] = best
        return out

    def query_all(self, lons, lats):
        """All (point_index, polygon_id) containment pairs — the one-to-many
        spatial join (reference clip semantics, ssurgo.py:176-177)."""
        lons = np.asarray(lons, dtype=np.float64)
        lats = np.asarray(lats, dtype=np.float64)
        if len(lons) == 0:
            return np.array([], dtype=np.int64), np.array([], dtype=np.int64)
        cells = cell_id(lons, lats, self.res)
        pt_idx: list[np.ndarray] = []
        poly_ids: list[np.ndarray] = []
        order = np.argsort(cells, kind="stable")
        sorted_cells = cells[order]
        starts = np.flatnonzero(np.r_[True, sorted_cells[1:] != sorted_cells[:-1]])
        ends = np.r_[starts[1:], len(sorted_cells)]
        for s, e in zip(starts, ends):
            cand = self._buckets.get(int(sorted_cells[s]))
            if cand is None:
                continue
            idx = order[s:e]
            px, py = lons[idx], lats[idx]
            for ci in cand:
                hit = points_in_polygon(px, py, self.polys[ci])
                if hit.any():
                    pt_idx.append(idx[hit])
                    poly_ids.append(
                        np.full(int(hit.sum()), self.ids[ci], dtype=np.int64)
                    )
        if not pt_idx:
            return np.array([], dtype=np.int64), np.array([], dtype=np.int64)
        return np.concatenate(pt_idx), np.concatenate(poly_ids)


# --------------------------------------------------------------------------
# kNN over 2-D centroids (nearest-field lookup, north rule).
# --------------------------------------------------------------------------


class CentroidKNN:
    """Brute-force vectorized nearest-centroid with deterministic min-id
    tiebreak.  For the centroid counts the engine deals with (fields per
    region, thousands), a float64 matmul per batch beats any tree; the
    scale path is bucketing centroids by cell and searching expanding rings
    (documented in stages/knn.py)."""

    def __init__(self, ids, xs, ys):
        self.ids = np.asarray(ids, dtype=np.int64)
        order = np.argsort(self.ids, kind="stable")  # min-id tiebreak via order
        self.ids = self.ids[order]
        self.xs = np.asarray(xs, dtype=np.float64)[order]
        self.ys = np.asarray(ys, dtype=np.float64)[order]

    def query(self, pxs, pys, chunk: int = 4096):
        pxs = np.asarray(pxs, dtype=np.float64)
        pys = np.asarray(pys, dtype=np.float64)
        out_id = np.empty(len(pxs), dtype=np.int64)
        out_d2 = np.empty(len(pxs), dtype=np.float64)
        for s in range(0, len(pxs), chunk):
            e = min(s + chunk, len(pxs))
            dx = pxs[s:e, None] - self.xs[None, :]
            dy = pys[s:e, None] - self.ys[None, :]
            d2 = dx * dx + dy * dy
            amin = np.argmin(d2, axis=1)  # first (=min id) wins ties
            out_id[s:e] = self.ids[amin]
            out_d2[s:e] = d2[np.arange(e - s), amin]
        return out_id, out_d2


class CellKNN:
    """Cell-bucketed nearest-centroid with expanding k-ring search — the
    scale path for continental centroid tables (10^6-10^7 fields) where
    brute force goes O(points x fields).

    Centroids are bucketed by grid cell at ``res``; a query group (all
    points sharing a cell) scans the square of cells within Chebyshev
    radius R, growing R until every point's current best distance is
    strictly inside the guaranteed-covered radius (its distance to the
    nearest unclipped side of the searched square).  Brute force stays
    vectorized within the candidate set.  Tiebreak is min-id among exact
    distance ties — identical to :class:`CentroidKNN`, so the two are
    interchangeable behind the size gate in stages/knn.py.
    """

    def __init__(self, ids, xs, ys, res: int | None = None):
        ids = np.asarray(ids, dtype=np.int64)
        xs = np.asarray(xs, dtype=np.float64)
        ys = np.asarray(ys, dtype=np.float64)
        if res is None:
            # aim for O(1) occupancy per cell on a regionally-clustered
            # table: 4^res cells ~ n centroids over the bbox spread
            res = int(np.clip(np.ceil(np.log2(max(len(ids), 2)) / 2) + 2, 3, 16))
        self.res = res
        self.n_side = 1 << res
        self.w = 360.0 / self.n_side
        self.h = 180.0 / self.n_side
        cells = cell_id(xs, ys, res)
        order = np.lexsort((ids, cells))
        self.cells_sorted = cells[order]
        self.ids_s = ids[order]
        self.xs_s = xs[order]
        self.ys_s = ys[order]
        # work counter: candidate distances evaluated (sub-linearity evidence)
        self.candidates_examined = 0

    def _candidates(self, cx: int, cy: int, R: int) -> np.ndarray:
        lo_x = max(cx - R, 0)
        hi_x = min(cx + R, self.n_side - 1)
        lo_y = max(cy - R, 0)
        hi_y = min(cy + R, self.n_side - 1)
        parts = []
        for x in range(lo_x, hi_x + 1):
            lo = x * CELL_PACK + lo_y
            hi = x * CELL_PACK + hi_y
            s = int(np.searchsorted(self.cells_sorted, lo, side="left"))
            e = int(np.searchsorted(self.cells_sorted, hi, side="right"))
            if e > s:
                parts.append(np.arange(s, e, dtype=np.int64))
        if not parts:
            return np.empty(0, dtype=np.int64)
        return np.concatenate(parts)

    def _boundary_dist(self, px, py, cx: int, cy: int, R: int) -> np.ndarray:
        """Per-point distance to the nearest UNCLIPPED side of the searched
        square [cx-R, cx+R] x [cy-R, cy+R].  A side clipped at the world
        edge is fully covered (nothing exists beyond), so it contributes
        +inf."""
        d = np.full(len(px), np.inf)
        if cx - R > 0:
            d = np.minimum(d, px - (-180.0 + (cx - R) * self.w))
        if cx + R < self.n_side - 1:
            d = np.minimum(d, (-180.0 + (cx + R + 1) * self.w) - px)
        if cy - R > 0:
            d = np.minimum(d, py - (-90.0 + (cy - R) * self.h))
        if cy + R < self.n_side - 1:
            d = np.minimum(d, (-90.0 + (cy + R + 1) * self.h) - py)
        return d

    def _query_group(self, px, py, cx: int, cy: int):
        R = 0
        max_R = self.n_side  # covering the whole grid terminates the loop
        while True:
            cand = self._candidates(cx, cy, R)
            if len(cand) == 0:
                if R >= max_R:
                    raise ValueError("CellKNN.query on an empty centroid set")
                R = max(R * 2, R + 1)
                continue
            dx = px[:, None] - self.xs_s[cand][None, :]
            dy = py[:, None] - self.ys_s[cand][None, :]
            d2 = dx * dx + dy * dy
            self.candidates_examined += d2.size
            best_d2 = d2.min(axis=1)
            bound = self._boundary_dist(px, py, cx, cy, R)
            need = np.sqrt(best_d2)
            if R >= max_R or np.all(need < bound):
                # min-id among exact-distance ties (CentroidKNN parity)
                ids_c = self.ids_s[cand]
                tied = d2 <= best_d2[:, None]
                big = np.iinfo(np.int64).max
                best_id = np.where(tied, ids_c[None, :], big).min(axis=1)
                return best_id, best_d2
            deficit = float(np.max(need - bound))
            R += max(1, int(np.ceil(deficit / min(self.w, self.h))) + 1)
            R = min(R, max_R)

    def query(self, pxs, pys):
        pxs = np.asarray(pxs, dtype=np.float64)
        pys = np.asarray(pys, dtype=np.float64)
        out_id = np.empty(len(pxs), dtype=np.int64)
        out_d2 = np.empty(len(pxs), dtype=np.float64)
        if len(pxs) == 0:
            return out_id, out_d2
        cells = cell_id(pxs, pys, self.res)
        order = np.argsort(cells, kind="stable")
        sc = cells[order]
        starts = np.flatnonzero(np.r_[True, sc[1:] != sc[:-1]])
        ends = np.r_[starts[1:], len(sc)]
        for s, e in zip(starts, ends):
            idx = order[s:e]
            c = int(sc[s])
            cx, cy = c // CELL_PACK, c % CELL_PACK
            gid, gd2 = self._query_group(pxs[idx], pys[idx], cx, cy)
            out_id[idx] = gid
            out_d2[idx] = gd2
        return out_id, out_d2


# Above this many centroids the O(points x fields) brute force loses to the
# bucketed k-ring search; below it, one matmul per batch wins.
KNN_CELL_CAP = 4096


def make_knn(ids, xs, ys, cap: int = KNN_CELL_CAP):
    """Size-gated kNN index: brute force under ``cap`` centroids, cell-
    bucketed k-ring search above (both share the min-id tie rule, parity
    tested in tests/test_knn_cell.py)."""
    if len(np.asarray(ids)) > cap:
        return CellKNN(ids, xs, ys)
    return CentroidKNN(ids, xs, ys)


# --------------------------------------------------------------------------
# CRS reprojection: WGS84 lon/lat <-> UTM (transverse Mercator, Krüger
# series, order-4 — standard public formulas).  Replaces the reference's
# pyproj `to_crs` calls (SURVEY.md M2; api.py:108,132,184,210) for the
# vector side; vectorized over coordinate arrays.
# --------------------------------------------------------------------------

_WGS84_A = 6378137.0
_WGS84_F = 1 / 298.257223563
_UTM_K0 = 0.9996
_UTM_FE = 500000.0


def _tm_constants():
    n = _WGS84_F / (2 - _WGS84_F)
    A = _WGS84_A / (1 + n) * (1 + n**2 / 4 + n**4 / 64)
    alpha = (
        n / 2 - 2 * n**2 / 3 + 5 * n**3 / 16,
        13 * n**2 / 48 - 3 * n**3 / 5,
        61 * n**3 / 240,
    )
    beta = (
        n / 2 - 2 * n**2 / 3 + 37 * n**3 / 96,
        n**2 / 48 + n**3 / 15,
        17 * n**3 / 480,
    )
    return n, A, alpha, beta


def utm_zone_for(lons) -> np.ndarray:
    """UTM zone number per longitude (J9: floor(lon/6) rule)."""
    lons = np.asarray(lons, dtype=np.float64)
    return (np.floor((lons + 180.0) / 6.0).astype(np.int64) % 60) + 1


_UTM_FN_SOUTH = 10_000_000.0  # false northing, southern-hemisphere zones


def utm_forward(lons, lats, zone: int, south: bool = False):
    """lon/lat degrees -> UTM (easting, northing) meters.  ``south=True``
    applies the 10,000,000 m false northing (EPSG:327xx) — same Krüger
    series, shifted origin."""
    lons = np.radians(np.asarray(lons, dtype=np.float64))
    lats = np.radians(np.asarray(lats, dtype=np.float64))
    lon0 = np.radians(zone * 6.0 - 183.0)
    n, A, alpha, _ = _tm_constants()
    t = np.sinh(
        np.arctanh(np.sin(lats))
        - (2 * np.sqrt(n) / (1 + n)) * np.arctanh((2 * np.sqrt(n) / (1 + n)) * np.sin(lats))
    )
    xi = np.arctan2(t, np.cos(lons - lon0))
    eta = np.arctanh(np.sin(lons - lon0) / np.sqrt(1 + t * t))
    e_ = eta.copy()
    x_ = xi.copy()
    for j, a in enumerate(alpha, start=1):
        x_ = x_ + a * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
        e_ = e_ + a * np.cos(2 * j * xi) * np.sinh(2 * j * eta)
    easting = _UTM_FE + _UTM_K0 * A * e_
    northing = _UTM_K0 * A * x_
    if south:
        northing = northing + _UTM_FN_SOUTH
    return easting, northing


def utm_inverse(eastings, northings, zone: int, south: bool = False):
    """UTM meters -> lon/lat degrees (``south=True`` for EPSG:327xx)."""
    eastings = np.asarray(eastings, dtype=np.float64)
    northings = np.asarray(northings, dtype=np.float64)
    if south:
        northings = northings - _UTM_FN_SOUTH
    n, A, _, beta = _tm_constants()
    xi = northings / (_UTM_K0 * A)
    eta = (eastings - _UTM_FE) / (_UTM_K0 * A)
    x_ = xi.copy()
    e_ = eta.copy()
    for j, b in enumerate(beta, start=1):
        x_ = x_ - b * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
        e_ = e_ - b * np.cos(2 * j * xi) * np.sinh(2 * j * eta)
    chi = np.arcsin(np.sin(x_) / np.cosh(e_))  # conformal latitude
    # geodetic latitude: Newton-solve artanh(sin lat) - e*artanh(e sin lat)
    # = artanh(sin chi)
    e = np.sqrt(_WGS84_F * (2 - _WGS84_F))
    clip = lambda v: np.clip(v, -0.999999999, 0.999999999)
    target = np.arctanh(clip(np.sin(chi)))
    lat = chi.copy()
    for _ in range(8):
        g = np.arctanh(clip(np.sin(lat))) - e * np.arctanh(clip(e * np.sin(lat))) - target
        dg = 1 / np.cos(lat) - e * e * np.cos(lat) / (1 - (e * np.sin(lat)) ** 2)
        lat = lat - g / dg
    lon0 = np.radians(zone * 6.0 - 183.0)
    lon = lon0 + np.arctan2(np.sinh(e_), np.cos(x_))
    return np.degrees(lon), np.degrees(lat)


# --------------------------------------------------------------------------
# Albers equal-area conic (EPSG:5070, NAD83 / CONUS) — Snyder, "Map
# Projections: A Working Manual" (USGS PP 1395), eqs. 14-1..14-21.  The
# reference reprojects hydrography points to EPSG:5070 (api.py:184) and topo
# to EPSG:4269 (api.py:210); NAD83 vs WGS84 datum shift (<~1 m) is ignored,
# matching the engine's meter-scale sampling tolerance.
# --------------------------------------------------------------------------

_GRS80_A = 6378137.0
_GRS80_F = 1 / 298.257222101
_ALBERS_LAT0, _ALBERS_LON0 = 23.0, -96.0
_ALBERS_LAT1, _ALBERS_LAT2 = 29.5, 45.5


def _albers_constants():
    e2 = _GRS80_F * (2 - _GRS80_F)
    e = math.sqrt(e2)

    def q(lat):
        s = math.sin(lat)
        return (1 - e2) * (
            s / (1 - e2 * s * s) - (1 / (2 * e)) * math.log((1 - e * s) / (1 + e * s))
        )

    def m(lat):
        return math.cos(lat) / math.sqrt(1 - e2 * math.sin(lat) ** 2)

    lat0, lat1, lat2 = map(math.radians, (_ALBERS_LAT0, _ALBERS_LAT1, _ALBERS_LAT2))
    m1, m2 = m(lat1), m(lat2)
    q0, q1, q2 = q(lat0), q(lat1), q(lat2)
    n = (m1 * m1 - m2 * m2) / (q2 - q1)
    C = m1 * m1 + n * q1
    rho0 = _GRS80_A * math.sqrt(C - n * q0) / n
    return e, e2, n, C, rho0


def _q_arr(lats_rad: np.ndarray, e: float, e2: float) -> np.ndarray:
    s = np.sin(lats_rad)
    return (1 - e2) * (
        s / (1 - e2 * s * s) - (1 / (2 * e)) * np.log((1 - e * s) / (1 + e * s))
    )


def albers_forward(lons, lats):
    """lon/lat degrees -> EPSG:5070 (x, y) meters."""
    lons = np.radians(np.asarray(lons, dtype=np.float64))
    lats = np.radians(np.asarray(lats, dtype=np.float64))
    e, e2, n, C, rho0 = _albers_constants()
    qv = _q_arr(lats, e, e2)
    rho = _GRS80_A * np.sqrt(C - n * qv) / n
    theta = n * (lons - math.radians(_ALBERS_LON0))
    return rho * np.sin(theta), rho0 - rho * np.cos(theta)


def albers_inverse(xs, ys):
    """EPSG:5070 (x, y) meters -> lon/lat degrees (Snyder iteration 3-16)."""
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    e, e2, n, C, rho0 = _albers_constants()
    rho = np.sqrt(xs * xs + (rho0 - ys) ** 2)
    theta = np.arctan2(xs, rho0 - ys)
    qv = (C - (rho * n / _GRS80_A) ** 2) / n
    lat = np.arcsin(np.clip(qv / 2, -1, 1))  # spherical first guess
    for _ in range(8):
        s = np.sin(lat)
        lat = lat + (1 - e2 * s * s) ** 2 / (2 * np.cos(lat)) * (
            qv / (1 - e2)
            - s / (1 - e2 * s * s)
            + (1 / (2 * e)) * np.log((1 - e * s) / (1 + e * s))
        )
    lon = math.radians(_ALBERS_LON0) + theta / n
    return np.degrees(lon), np.degrees(lat)


# --------------------------------------------------------------------------
# Web Mercator (EPSG:3857) — spherical Mercator on the WGS84 semi-major
# axis; the universal web-tile CRS.  Exact closed forms, no iteration.
# --------------------------------------------------------------------------

_WEBMERC_R = 6378137.0
_WEBMERC_MAX_LAT = 85.051128779806592  # atan(sinh(pi)) — square world edge


def webmercator_forward(lons, lats):
    """lon/lat degrees -> EPSG:3857 (x, y) meters (lat clamped to the
    projection's +/-85.0511 valid band, as web tiling does)."""
    lons = np.asarray(lons, dtype=np.float64)
    lats = np.clip(np.asarray(lats, dtype=np.float64), -_WEBMERC_MAX_LAT, _WEBMERC_MAX_LAT)
    x = _WEBMERC_R * np.radians(lons)
    y = _WEBMERC_R * np.log(np.tan(np.pi / 4 + np.radians(lats) / 2))
    return x, y


def webmercator_inverse(xs, ys):
    """EPSG:3857 (x, y) meters -> lon/lat degrees."""
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    lon = np.degrees(xs / _WEBMERC_R)
    lat = np.degrees(2 * np.arctan(np.exp(ys / _WEBMERC_R)) - np.pi / 2)
    return lon, lat


# --------------------------------------------------------------------------
# Lambert Conformal Conic, 2 standard parallels (Snyder PP 1395 eqs.
# 15-1..15-11, ellipsoidal) — the conic family behind most state-plane zones,
# Lambert-93 (EPSG:2154), Statistics Canada Lambert (EPSG:3347) and the
# CONUS met grids.  ``make_lcc`` builds a (forward, inverse) pair for any
# parameter set; the named systems below pre-register through the public
# ``register_crs`` hook, which is also how a user adds any further CRS
# without patching this module (the reference's arbitrary-pyproj surface,
# reprojection.py:15-112, reduced to a registry).
# --------------------------------------------------------------------------


def make_lcc(lat1: float, lat2: float, lat0: float, lon0: float,
             fe: float = 0.0, fn: float = 0.0,
             a: float = _GRS80_A, flat: float = _GRS80_F):
    """(forward, inverse) closures for a Lambert Conformal Conic 2SP."""
    e2 = flat * (2 - flat)
    e = math.sqrt(e2)

    def _t(lat):
        s = np.sin(lat)
        return np.tan(np.pi / 4 - lat / 2) / ((1 - e * s) / (1 + e * s)) ** (e / 2)

    def _m(lat):
        return math.cos(lat) / math.sqrt(1 - e2 * math.sin(lat) ** 2)

    p0, p1, p2 = map(math.radians, (lat0, lat1, lat2))
    m1, m2 = _m(p1), _m(p2)
    t0, t1, t2 = (float(_t(np.float64(p))) for p in (p0, p1, p2))
    if abs(p1 - p2) < 1e-12:
        n = math.sin(p1)
    else:
        n = (math.log(m1) - math.log(m2)) / (math.log(t1) - math.log(t2))
    F = m1 / (n * t1**n)
    rho0 = a * F * t0**n
    lam0 = math.radians(lon0)

    def forward(lons, lats):
        lam = np.radians(np.asarray(lons, dtype=np.float64))
        phi = np.radians(np.asarray(lats, dtype=np.float64))
        rho = a * F * _t(phi) ** n
        theta = n * (lam - lam0)
        return fe + rho * np.sin(theta), fn + rho0 - rho * np.cos(theta)

    def inverse(xs, ys):
        x = np.asarray(xs, dtype=np.float64) - fe
        y = rho0 - (np.asarray(ys, dtype=np.float64) - fn)
        rho = np.sign(n) * np.sqrt(x * x + y * y)
        theta = np.arctan2(np.sign(n) * x, np.sign(n) * y)
        tp = (rho / (a * F)) ** (1.0 / n)
        phi = np.pi / 2 - 2 * np.arctan(tp)  # spherical first guess
        for _ in range(8):
            s = e * np.sin(phi)
            phi = np.pi / 2 - 2 * np.arctan(tp * ((1 - s) / (1 + s)) ** (e / 2))
        return np.degrees(lam0 + theta / n), np.degrees(phi)

    return forward, inverse


# --------------------------------------------------------------------------
# CRS dispatch: the engine's supported projected systems.  "EPSG:4326" and
# "EPSG:4269" are geographic (identity to lon/lat); "EPSG:326xx"/"EPSG:327xx"
# are UTM north/south (Krüger series above); "EPSG:5070" is CONUS Albers;
# "EPSG:3857" is Web Mercator; LCC systems and anything else arrive through
# the ``register_crs`` extension registry (checked first).
# --------------------------------------------------------------------------

_CRS_REGISTRY: dict = {}


def _norm_code(crs: str) -> str:
    return str(crs).upper().replace("EPSG:", "").replace("ESRI:", "").strip()


def register_crs(code, forward, inverse) -> None:
    """Register a custom CRS: ``forward(lons, lats) -> (xs, ys)`` and
    ``inverse(xs, ys) -> (lons, lats)``, vectorized over numpy float64
    arrays.  ``code`` is an EPSG/ESRI number or string ('EPSG:2154',
    2154, ...).  Registered codes take precedence over the built-in
    dispatch, so a user can extend or override without patching geo.py —
    the engine's answer to the reference's arbitrary-pyproj CRS surface."""
    _CRS_REGISTRY[_norm_code(code)] = (forward, inverse)


def make_laea(lat0: float, lon0: float, fe: float = 0.0, fn: float = 0.0,
              a: float = _GRS80_A, flat: float = _GRS80_F):
    """(forward, inverse) closures for an ellipsoidal Lambert Azimuthal
    Equal-Area (Snyder PP 1395 eqs. 3-11/3-12, 24-2..24-16 oblique aspect) —
    the family behind EPSG:3035 (Europe), ESRI:102008 (North America) and
    most continental statistics grids.  Verified by the equal-area Jacobian
    property test (tests/test_crs_families.py), not just roundtrips."""
    e2 = flat * (2 - flat)
    e = math.sqrt(e2)

    def _q(sphi):
        return (1 - e2) * (
            sphi / (1 - e2 * sphi * sphi)
            - (1 / (2 * e)) * np.log((1 - e * sphi) / (1 + e * sphi))
        )

    qp = float(_q(np.float64(1.0)))
    rq = a * math.sqrt(qp / 2)
    p0 = math.radians(lat0)
    lam0 = math.radians(lon0)
    q0 = float(_q(np.float64(math.sin(p0))))
    beta0 = math.asin(q0 / qp)
    m0 = math.cos(p0) / math.sqrt(1 - e2 * math.sin(p0) ** 2)
    d = (a * m0) / (rq * math.cos(beta0))

    def forward(lons, lats):
        lam = np.radians(np.asarray(lons, dtype=np.float64))
        phi = np.radians(np.asarray(lats, dtype=np.float64))
        beta = np.arcsin(np.clip(_q(np.sin(phi)) / qp, -1.0, 1.0))
        dlam = lam - lam0
        b = rq * np.sqrt(
            2.0 / (1 + math.sin(beta0) * np.sin(beta)
                   + math.cos(beta0) * np.cos(beta) * np.cos(dlam))
        )
        x = b * d * np.cos(beta) * np.sin(dlam)
        y = (b / d) * (math.cos(beta0) * np.sin(beta)
                       - math.sin(beta0) * np.cos(beta) * np.cos(dlam))
        return fe + x, fn + y

    def inverse(xs, ys):
        x = (np.asarray(xs, dtype=np.float64) - fe) / d
        y = (np.asarray(ys, dtype=np.float64) - fn) * d
        rho = np.sqrt(x * x + y * y)
        ce = 2 * np.arcsin(np.clip(rho / (2 * rq), -1.0, 1.0))
        with np.errstate(invalid="ignore"):
            q = qp * (np.cos(ce) * math.sin(beta0)
                      + np.where(rho > 0, y * np.sin(ce) * math.cos(beta0) / rho, 0.0))
            lam = lam0 + np.arctan2(
                x * np.sin(ce),
                rho * math.cos(beta0) * np.cos(ce) - y * math.sin(beta0) * np.sin(ce),
            )
        phi = np.arcsin(np.clip(q / 2, -1.0, 1.0))  # first guess
        for _ in range(8):
            s = np.sin(phi)
            phi = phi + ((1 - e2 * s * s) ** 2 / (2 * np.cos(phi))) * (
                q / (1 - e2) - s / (1 - e2 * s * s)
                + (1 / (2 * e)) * np.log((1 - e * s) / (1 + e * s))
            )
        return np.degrees(lam), np.degrees(phi)

    return forward, inverse


def make_polar_stereo(lat_ts: float, lon0: float, fe: float = 0.0,
                      fn: float = 0.0, a: float = _GRS80_A,
                      flat: float = _GRS80_F):
    """(forward, inverse) closures for Polar Stereographic variant B
    (Snyder eqs. 21-33..21-41 / 3-1, standard parallel ``lat_ts``; the
    hemisphere follows its sign) — EPSG:3413 (NSIDC north), EPSG:3976
    (NSIDC south) and the polar met/sea-ice grids.  Conformality is
    property-tested (isotropic local scale), not assumed."""
    e2 = flat * (2 - flat)
    e = math.sqrt(e2)
    south = lat_ts < 0

    def _t(phi):  # north-aspect isometric colatitude function
        s = np.sin(phi)
        return np.tan(np.pi / 4 - phi / 2) / ((1 - e * s) / (1 + e * s)) ** (e / 2)

    pc = math.radians(abs(lat_ts))
    mc = math.cos(pc) / math.sqrt(1 - e2 * math.sin(pc) ** 2)
    tc = float(_t(np.float64(pc)))
    lam0 = math.radians(lon0)

    def forward(lons, lats):
        lam = np.radians(np.asarray(lons, dtype=np.float64))
        phi = np.radians(np.asarray(lats, dtype=np.float64))
        if south:
            phi = -phi
            dlam = -(lam - lam0)
        else:
            dlam = lam - lam0
        rho = a * mc * _t(phi) / tc
        x = rho * np.sin(dlam)
        y = -rho * np.cos(dlam)
        if south:
            x, y = -x, -y
        return fe + x, fn + y

    def inverse(xs, ys):
        x = np.asarray(xs, dtype=np.float64) - fe
        y = np.asarray(ys, dtype=np.float64) - fn
        if south:
            x, y = -x, -y
        rho = np.sqrt(x * x + y * y)
        t = rho * tc / (a * mc)
        phi = np.pi / 2 - 2 * np.arctan(t)  # spherical first guess
        for _ in range(8):
            s = e * np.sin(phi)
            phi = np.pi / 2 - 2 * np.arctan(t * ((1 - s) / (1 + s)) ** (e / 2))
        dlam = np.arctan2(x, -y)
        if south:
            return np.degrees(lam0 - dlam), np.degrees(-phi)
        return np.degrees(lam0 + dlam), np.degrees(phi)

    return forward, inverse


def make_tm(lat0: float, lon0: float, k0: float = 0.9996,
            fe: float = 500_000.0, fn: float = 0.0,
            a: float = _WGS84_A, flat: float = _WGS84_F):
    """(forward, inverse) closures for a GENERAL Transverse Mercator —
    arbitrary latitude/longitude of origin, scale factor, false
    easting/northing and ellipsoid (UTM is the k0=0.9996 / zone-meridian
    special case already in the dispatch table).  Covers the state-plane
    TM zones and national grids (EPSG:27700 registered below).  Same
    Krüger series as utm_forward/utm_inverse, generalized: the series
    constants come from the given ellipsoid and the northing subtracts
    the series' meridian value at ``lat0`` so the origin maps to
    (fe, fn).  Reference parity target: the arbitrary-pyproj-CRS surface
    (/root/reference/demeter/raster/utils/reprojection.py:15-112)."""
    n = flat / (2 - flat)
    A = a / (1 + n) * (1 + n**2 / 4 + n**4 / 64)
    alpha = (
        n / 2 - 2 * n**2 / 3 + 5 * n**3 / 16,
        13 * n**2 / 48 - 3 * n**3 / 5,
        61 * n**3 / 240,
    )
    beta = (
        n / 2 - 2 * n**2 / 3 + 37 * n**3 / 96,
        n**2 / 48 + n**3 / 15,
        17 * n**3 / 480,
    )
    e = math.sqrt(flat * (2 - flat))
    lam0 = math.radians(lon0)
    s2n = 2 * math.sqrt(n) / (1 + n)

    def _merid(phi0: float) -> float:
        # series northing at the central meridian (eta = 0, cosh = 1)
        t = math.sinh(math.atanh(math.sin(phi0))
                      - s2n * math.atanh(s2n * math.sin(phi0)))
        xi = math.atan2(t, 1.0)
        return xi + sum(aj * math.sin(2 * j * xi)
                        for j, aj in enumerate(alpha, start=1))

    x0 = _merid(math.radians(lat0)) if lat0 != 0.0 else 0.0

    def forward(lons, lats):
        lam = np.radians(np.asarray(lons, dtype=np.float64))
        phi = np.radians(np.asarray(lats, dtype=np.float64))
        t = np.sinh(np.arctanh(np.sin(phi))
                    - s2n * np.arctanh(s2n * np.sin(phi)))
        xi = np.arctan2(t, np.cos(lam - lam0))
        eta = np.arctanh(np.sin(lam - lam0) / np.sqrt(1 + t * t))
        x_, e_ = xi.copy(), eta.copy()
        for j, aj in enumerate(alpha, start=1):
            x_ = x_ + aj * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
            e_ = e_ + aj * np.cos(2 * j * xi) * np.sinh(2 * j * eta)
        return fe + k0 * A * e_, fn + k0 * A * (x_ - x0)

    def inverse(xs, ys):
        xi = (np.asarray(ys, dtype=np.float64) - fn) / (k0 * A) + x0
        eta = (np.asarray(xs, dtype=np.float64) - fe) / (k0 * A)
        x_, e_ = xi.copy(), eta.copy()
        for j, bj in enumerate(beta, start=1):
            x_ = x_ - bj * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
            e_ = e_ - bj * np.cos(2 * j * xi) * np.sinh(2 * j * eta)
        chi = np.arcsin(np.sin(x_) / np.cosh(e_))
        clip = lambda v: np.clip(v, -0.999999999, 0.999999999)
        target = np.arctanh(clip(np.sin(chi)))
        lat = chi.copy()
        for _ in range(8):
            g = (np.arctanh(clip(np.sin(lat)))
                 - e * np.arctanh(clip(e * np.sin(lat))) - target)
            dg = 1 / np.cos(lat) - e * e * np.cos(lat) / (
                1 - (e * np.sin(lat)) ** 2)
            lat = lat - g / dg
        lon = lam0 + np.arctan2(np.sinh(e_), np.cos(x_))
        return np.degrees(lon), np.degrees(lat)

    return forward, inverse


# named LCC systems, registered through the public hook itself
register_crs("EPSG:2154", *make_lcc(44.0, 49.0, 46.5, 3.0,       # Lambert-93
                                    700_000.0, 6_600_000.0))
register_crs("EPSG:3347", *make_lcc(49.0, 77.0, 63.390675,       # StatCan
                                    -91.8666666666666667,
                                    6_200_000.0, 3_000_000.0))
register_crs("ESRI:102004", *make_lcc(33.0, 45.0, 39.0, -96.0))  # CONUS LCC
# equal-area + polar families, same hook
register_crs("EPSG:3035", *make_laea(52.0, 10.0,                 # ETRS89 LAEA
                                     4_321_000.0, 3_210_000.0))
register_crs("ESRI:102008", *make_laea(45.0, -100.0))            # NA LAEA
register_crs("EPSG:3413", *make_polar_stereo(70.0, -45.0))       # NSIDC north
# general Transverse Mercator on a non-WGS84 ellipsoid, same hook
register_crs("EPSG:27700", *make_tm(49.0, -2.0,                  # OSGB36 /
                                    0.9996012717,                # British
                                    400_000.0, -100_000.0,       # Nat. Grid
                                    a=6_377_563.396,             # Airy 1830
                                    flat=1 / 299.3249646))
register_crs("EPSG:3976", *make_polar_stereo(-71.0, 0.0))        # NSIDC south


def crs_forward(crs: str, lons, lats):
    """lon/lat degrees -> projected (x, y) in ``crs`` units."""
    code = _norm_code(crs)
    reg = _CRS_REGISTRY.get(code)
    if reg is not None:
        return reg[0](lons, lats)
    if code in ("4326", "4269"):
        return np.asarray(lons, np.float64), np.asarray(lats, np.float64)
    if code == "5070":
        return albers_forward(lons, lats)
    if code == "3857":
        return webmercator_forward(lons, lats)
    if code.startswith("326") and len(code) == 5:
        return utm_forward(lons, lats, int(code[3:]))
    if code.startswith("327") and len(code) == 5:
        return utm_forward(lons, lats, int(code[3:]), south=True)
    raise ValueError(
        f"unsupported CRS {crs!r}: built-in dispatch covers EPSG:4326/EPSG:4269 "
        "(geographic identity), EPSG:5070 (CONUS Albers), EPSG:3857 (Web "
        "Mercator), EPSG:326xx/EPSG:327xx (UTM north/south), and the "
        "registered systems EPSG:2154 / EPSG:3347 / ESRI:102004 (Lambert "
        "Conformal Conic via make_lcc), EPSG:3035 / ESRI:102008 (Lambert "
        "Azimuthal Equal-Area via make_laea), EPSG:3413 / EPSG:3976 (Polar "
        "Stereographic via make_polar_stereo), EPSG:27700 (general "
        "Transverse Mercator via make_tm, any ellipsoid) — add any other "
        "system with geo.register_crs(code, forward, inverse) (make_lcc/"
        "make_laea/make_polar_stereo/make_tm build the closures); the "
        "reference accepts any pyproj CRS (reprojection.py:15-112), but "
        "this sandbox has no pyproj"
    )


def crs_inverse(crs: str, xs, ys):
    """projected (x, y) in ``crs`` units -> lon/lat degrees."""
    code = _norm_code(crs)
    reg = _CRS_REGISTRY.get(code)
    if reg is not None:
        return reg[1](xs, ys)
    if code in ("4326", "4269"):
        return np.asarray(xs, np.float64), np.asarray(ys, np.float64)
    if code == "5070":
        return albers_inverse(xs, ys)
    if code == "3857":
        return webmercator_inverse(xs, ys)
    if code.startswith("326") and len(code) == 5:
        return utm_inverse(xs, ys, int(code[3:]))
    if code.startswith("327") and len(code) == 5:
        return utm_inverse(xs, ys, int(code[3:]), south=True)
    raise ValueError(
        f"unsupported CRS {crs!r}: supported codes are EPSG:4326, EPSG:4269, "
        "EPSG:5070, EPSG:3857, EPSG:326xx/EPSG:327xx, the registered systems "
        "(EPSG:2154, EPSG:3347, ESRI:102004 LCC; EPSG:3035, ESRI:102008 LAEA; "
        "EPSG:3413, EPSG:3976 polar stereographic), and anything added via "
        "geo.register_crs (see crs_forward)"
    )
