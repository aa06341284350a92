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


class PIPActor:
    """map_batches callable class: polygons parsed + indexed once per actor."""

    def __init__(self, polys_ref, res: int = 12, mode: str = "min"):
        ids, wkbs = ray.get(polys_ref) if not isinstance(polys_ref, tuple) else polys_ref
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
    """ray.put the (ids, wkbs) polygon payload once; actors read it in
    __init__ — never re-shipped per batch."""
    ids = fields_table["map_unit_key"].to_pylist()
    wkbs = fields_table["geom_wkb"].to_pylist()
    return ray.put((ids, wkbs))


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
    region).  For multi-region scale, shard fields by cell_prefix and apply
    this stage per shard.
    """
    ref = broadcast_fields(fields_table)
    return ds.map_batches(
        PIPActor,
        fn_constructor_args=(ref, res, mode),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
