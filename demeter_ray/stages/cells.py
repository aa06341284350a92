"""Cell-index assignment + salted spatial shuffle keys.

The explicit spatial shuffle of the engine (north rule): every geo-row gets
``cell`` (fine resolution) and ``cell_prefix`` (coarse shuffle key) columns in
one zero-copy Arrow ``map_batches`` pass; skewed prefixes are salted into
sub-keys so a hot agricultural region doesn't pin one reducer
(SURVEY.md §7.4).  Replaces the reference's static 1-degree tile sharding
(/root/reference/demeter/raster/polaris.py:358-370) with a hierarchical key.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from demeter_ray.functions import geo

FINE_RES = 12
PREFIX_RES = 5


def assign_cells(
    ds: ray.data.Dataset,
    lon_col: str = "lon",
    lat_col: str = "lat",
    fine_res: int = FINE_RES,
    prefix_res: int = PREFIX_RES,
    salt: int = 0,
) -> ray.data.Dataset:
    """Append ``cell`` and ``cell_prefix`` (and optionally ``salt``) columns.

    ``salt > 0`` adds a deterministic per-row sub-key in [0, salt) derived
    from the fine cell id, splitting hot prefixes for the shuffle
    (``groupby(["cell_prefix", "salt"])``) without breaking reproducibility.
    """
    levels = fine_res - prefix_res

    def fn(batch: pa.Table) -> pa.Table:
        lons = batch[lon_col].to_numpy(zero_copy_only=False)
        lats = batch[lat_col].to_numpy(zero_copy_only=False)
        cells = geo.cell_id(lons, lats, fine_res)
        prefix = geo.cell_parent_id(cells, levels)
        batch = batch.append_column("cell", pa.array(cells, pa.int64()))
        batch = batch.append_column("cell_prefix", pa.array(prefix, pa.int64()))
        if salt > 0:
            s = (cells * 2654435761) % salt
            batch = batch.append_column("salt", pa.array(s, pa.int64()))
        return batch

    return ds.map_batches(fn, batch_format="pyarrow")


def prefix_histogram(ds: ray.data.Dataset) -> pa.Table:
    """Row counts per cell_prefix via partial per-batch counts + a small
    groupby — the pre-aggregated shuffle pattern (never ships full rows)."""

    def partial(batch: pa.Table) -> pa.Table:
        vals, counts = np.unique(
            batch["cell_prefix"].to_numpy(zero_copy_only=False), return_counts=True
        )
        return pa.table(
            {"cell_prefix": pa.array(vals, pa.int64()), "n": pa.array(counts, pa.int64())}
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    from ray.data.aggregate import Sum

    return pa.Table.from_pandas(
        partials.groupby("cell_prefix").aggregate(Sum("n", alias_name="n")).to_pandas(),
        preserve_index=False,
    )
