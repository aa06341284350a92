"""Point-in-polygon actor-pool stage.

The Ray-native spatial join (SURVEY.md §2.4 J1/J8): the polygon side (small —
field boundaries) is broadcast once via ``ray.put``; each actor builds a
prepared ``PolygonIndex`` (cell-bucketed rings) ONCE in ``__init__`` and then
refines candidate cells with the vectorized even-odd kernel per batch.  This
replaces the reference's server-side ``STIntersects`` semi-join
(/root/reference/demeter/vector/usda/ssurgo.py:20-32) and its clip refine
(ssurgo.py:176-177).

Scale notes: the polygon table for one region is MBs, so broadcast beats a
shuffle join; at continental scale, partition BOTH sides by cell_prefix first
and run one PIPJoin per prefix with only that prefix's polygons (the
partitioning assumption is documented on ``pip_join``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from demeter_ray.functions import geo
from demeter_ray.stages.pools import fitted_pool


def pack_binary_column(col) -> tuple[np.ndarray, np.ndarray]:
    """Arrow (large_)binary column -> (offsets int64, data uint8) numpy
    views over the Arrow buffers: the broadcast payload is two flat arrays
    (zero-copy through ray.put), never a per-element Python list."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if isinstance(arr, pa.ChunkedArray):  # older pyarrow returns ChunkedArray
        arr = arr.chunk(0) if arr.num_chunks else pa.array([], arr.type)
    if len(arr) == 0:
        return np.zeros(1, np.int64), np.empty(0, np.uint8)
    bufs = arr.buffers()
    odt = np.int64 if pa.types.is_large_binary(arr.type) else np.int32
    offs = np.frombuffer(bufs[1], dtype=odt)[
        arr.offset : arr.offset + len(arr) + 1
    ].astype(np.int64)
    data = (np.frombuffer(bufs[2], dtype=np.uint8)
            if bufs[2] is not None else np.empty(0, np.uint8))
    return offs, data


def unpack_binary(offs: np.ndarray, data: np.ndarray) -> list:
    """(offsets, data) -> per-element memoryview slices (no byte copies;
    struct.unpack_from in the WKB parser reads them directly)."""
    mv = memoryview(data)
    return [mv[offs[i] : offs[i + 1]] for i in range(len(offs) - 1)]


class PIPActor:
    """map_batches callable class: polygons parsed + indexed once per actor."""

    def __init__(self, polys_ref, res: int = 12, mode: str = "min"):
        payload = ray.get(polys_ref) if not isinstance(polys_ref, tuple) else polys_ref
        if len(payload) == 3:  # packed zero-copy form (ids, offsets, data)
            ids, offs, data = payload
            wkbs = unpack_binary(offs, data)
        else:
            ids, wkbs = payload
        self.index = geo.PolygonIndex(ids, wkbs, res=res)
        self.mode = mode

    def __call__(self, batch: pa.Table) -> pa.Table:
        lons = batch["lon"].to_numpy(zero_copy_only=False)
        lats = batch["lat"].to_numpy(zero_copy_only=False)
        if self.mode == "min":
            assigned = self.index.query_min_id(lons, lats)
            col = pa.array(
                np.where(assigned >= 0, assigned, None), pa.int64(), from_pandas=True
            )
            return batch.append_column("map_unit_key", col)
        # mode == "all": one output row per (point, polygon) containment pair
        pt_idx, poly_ids = self.index.query_all(lons, lats)
        out = batch.take(pa.array(pt_idx, pa.int64()))
        return out.append_column("map_unit_key", pa.array(poly_ids, pa.int64()))


def broadcast_fields(fields_table: pa.Table):
    """ray.put the polygon payload once; actors read it in __init__ — never
    re-shipped per batch.  Payload is (ids int64, wkb offsets int64, wkb
    data uint8): three flat numpy arrays straight off the Arrow buffers, so
    the object-store hop is zero-copy with no per-element Python objects."""
    ids = fields_table["map_unit_key"].to_numpy(zero_copy_only=False).astype(np.int64)
    offs, data = pack_binary_column(fields_table["geom_wkb"])
    return ray.put((ids, offs, data))


def pip_join(
    ds: ray.data.Dataset,
    fields_table: pa.Table,
    mode: str = "min",
    res: int = 12,
    concurrency=4,
    batch_size: int = 8192,
) -> ray.data.Dataset:
    """Left spatial join: points keep flowing with a null map_unit_key when
    no polygon contains them (mode='min' assigns min key under overlap,
    matching the oracle tie rule; mode='all' emits every containment pair).

    Partitioning assumption: all polygons fit in one broadcast object (one
    region).  For multi-region scale use ``sharded_pip_join``, which shards
    fields by coarse cell and bounds worker memory to a shard cache.
    """
    ref = broadcast_fields(fields_table)
    return ds.map_batches(
        PIPActor,
        fn_constructor_args=(ref, res, mode),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=fitted_pool(concurrency) if isinstance(concurrency, int) else concurrency,
    )


def shard_fields(fields_table: pa.Table, prefix_res: int) -> dict:
    """Shard the polygon table by coarse cell: each polygon is REPLICATED
    into every prefix cell its bbox touches (standard spatial partitioning),
    so any point's containing polygons are all present in the point's own
    shard and the min-key tie rule is preserved.  Each shard is its own
    ``ray.put`` object — the whole fields table never exists as one
    broadcast payload."""
    ids = fields_table["map_unit_key"].to_pylist()
    wkbs = fields_table["geom_wkb"].to_pylist()
    shards: dict[int, tuple[list, list]] = {}
    for pid, wkb in zip(ids, wkbs):
        polys = geo.parse_wkb(wkb)
        minx, miny, maxx, maxy = geo.polygon_bounds(polys)
        cxs, cys = geo.cover_bbox(minx, miny, maxx, maxy, prefix_res)
        for cell in geo.cell_id_from_xy(cxs, cys):
            bucket = shards.setdefault(int(cell), ([], []))
            bucket[0].append(pid)
            bucket[1].append(wkb)
    return {cell: ray.put(payload) for cell, payload in shards.items()}


class ShardedPIPActor:
    """Per-prefix polygon indexes with an actor-local LRU: each batch routes
    its points to their prefix shard, fetching+building at most
    ``cache_size`` indexes per actor (worker memory is bounded by the cache,
    not the fields table).  Spatially-ordered input keeps the hit rate high."""

    def __init__(self, shard_refs: dict, prefix_res: int, res: int = 12,
                 mode: str = "min", cache_size: int = 8):
        from collections import OrderedDict

        self.shard_refs = shard_refs
        self.prefix_res = prefix_res
        self.res = res
        self.mode = mode
        self.cache_size = cache_size
        self._cache: "OrderedDict[int, geo.PolygonIndex]" = OrderedDict()

    def _index(self, prefix: int) -> geo.PolygonIndex:
        idx = self._cache.get(prefix)
        if idx is not None:
            self._cache.move_to_end(prefix)
            return idx
        ids, wkbs = ray.get(self.shard_refs[prefix])
        idx = geo.PolygonIndex(ids, wkbs, res=self.res)
        self._cache[prefix] = idx
        while len(self._cache) > self.cache_size:
            self._cache.popitem(last=False)
        return idx

    def __call__(self, batch: pa.Table) -> pa.Table:
        lons = batch["lon"].to_numpy(zero_copy_only=False)
        lats = batch["lat"].to_numpy(zero_copy_only=False)
        prefixes = geo.cell_id(lons, lats, self.prefix_res)
        if self.mode == "min":
            assigned = np.full(len(lons), -1, dtype=np.int64)
            for p in np.unique(prefixes):
                if int(p) not in self.shard_refs:
                    continue
                sel = np.flatnonzero(prefixes == p)
                assigned[sel] = self._index(int(p)).query_min_id(lons[sel], lats[sel])
            col = pa.array(
                np.where(assigned >= 0, assigned, None), pa.int64(), from_pandas=True
            )
            return batch.append_column("map_unit_key", col)
        # mode == "all": containment pairs, concatenated across shards in
        # point order for determinism
        take_idx: list[np.ndarray] = []
        poly_out: list[np.ndarray] = []
        for p in np.unique(prefixes):
            if int(p) not in self.shard_refs:
                continue
            sel = np.flatnonzero(prefixes == p)
            pt_idx, poly_ids = self._index(int(p)).query_all(lons[sel], lats[sel])
            take_idx.append(sel[np.asarray(pt_idx, dtype=np.int64)])
            poly_out.append(np.asarray(poly_ids, dtype=np.int64))
        if not take_idx:
            empty = batch.slice(0, 0)
            return empty.append_column("map_unit_key", pa.array([], pa.int64()))
        ti = np.concatenate(take_idx)
        po = np.concatenate(poly_out)
        order = np.lexsort((po, ti))
        out = batch.take(pa.array(ti[order], pa.int64()))
        return out.append_column("map_unit_key", pa.array(po[order], pa.int64()))


def sharded_pip_join(
    ds: ray.data.Dataset,
    fields_table: pa.Table,
    prefix_res: int = 11,
    mode: str = "min",
    res: int = 12,
    concurrency=4,
    batch_size: int = 8192,
) -> ray.data.Dataset:
    """The multi-region scale path of ``pip_join``: fields shard by coarse
    cell (one object-store entry per shard), points route per batch to their
    shard's index through an actor-local LRU.  Identical output to the
    broadcast path (parity-tested), with worker memory bounded by
    ``cache_size`` shards instead of the whole polygon table."""
    shard_refs = shard_fields(fields_table, prefix_res)
    return ds.map_batches(
        ShardedPIPActor,
        fn_constructor_args=(shard_refs, prefix_res, res, mode),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=fitted_pool(concurrency) if isinstance(concurrency, int) else concurrency,
    )
