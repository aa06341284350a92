"""kNN nearest-field actor-pool stage (north rule NEW operator).

Each actor builds a ``CentroidKNN`` (sorted centroid arrays) once in
``__init__``; per batch it runs a vectorized chunked distance argmin with a
deterministic min-id tiebreak.  Centroids are the field-polygon outer-ring
vertex means (a deterministic, shapely-free centroid proxy).

Scale path: above ``geo.KNN_CELL_CAP`` centroids, ``geo.make_knn`` swaps the
brute-force index for ``geo.CellKNN`` — centroids bucketed by grid cell,
queries search expanding k-rings, brute force stays vectorized within the
candidate set (same cell prefilter idea as stages/pip.py).  Both paths share
the min-id tie rule; parity is pinned in tests/test_knn_cell.py.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from demeter_ray.functions import geo
from demeter_ray.stages.pools import fitted_pool


def field_centroids(fields_table: pa.Table) -> tuple[list, list, list]:
    ids, xs, ys = [], [], []
    for mid, wkb in zip(
        fields_table["map_unit_key"].to_pylist(), fields_table["geom_wkb"].to_pylist()
    ):
        polys = geo.parse_wkb(wkb)
        pts = np.vstack([rings[0][:-1] for rings in polys])
        ids.append(mid)
        xs.append(float(pts[:, 0].mean()))
        ys.append(float(pts[:, 1].mean()))
    return ids, xs, ys


def _centroid_batch(batch: pa.Table) -> pa.Table:
    ids, xs, ys = field_centroids(batch)
    return pa.table(
        {
            "map_unit_key": pa.array(ids, pa.int64()),
            "cx": pa.array(xs, pa.float64()),
            "cy": pa.array(ys, pa.float64()),
        }
    )


def field_centroids_ds(fields_ds: ray.data.Dataset):
    """Distributed centroid extraction: WKB parsing fans out as map_batches
    over the fields Dataset (a continental 10^7-polygon table parses in
    parallel workers, not one driver loop); only the slim (id, x, y)
    triples come back to build the broadcast kNN state."""
    df = (
        fields_ds.select_columns(["map_unit_key", "geom_wkb"])
        .map_batches(_centroid_batch, batch_format="pyarrow", batch_size=2048)
        .to_pandas()
    )
    return (
        df["map_unit_key"].to_numpy(dtype=np.int64),
        df["cx"].to_numpy(dtype=np.float64),
        df["cy"].to_numpy(dtype=np.float64),
    )


class KNNActor:
    def __init__(self, centroids_ref, out_col: str = "nearest_field"):
        ids, xs, ys = (
            ray.get(centroids_ref) if not isinstance(centroids_ref, tuple) else centroids_ref
        )
        self.knn = geo.make_knn(ids, xs, ys)
        self.out_col = out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        lons = batch["lon"].to_numpy(zero_copy_only=False)
        lats = batch["lat"].to_numpy(zero_copy_only=False)
        ids, d2 = self.knn.query(lons, lats)
        batch = batch.append_column(self.out_col, pa.array(ids, pa.int64()))
        return batch.append_column(self.out_col + "_dist2", pa.array(d2, pa.float64()))


def knn_join(
    ds: ray.data.Dataset,
    fields_table,
    out_col: str = "nearest_field",
    concurrency=4,
    batch_size: int = 8192,
) -> ray.data.Dataset:
    """kNN enrichment stage.  ``fields_table`` is an Arrow table (broadcast
    state built driver-side) or a ray.data.Dataset (centroids extracted
    distributed via ``field_centroids_ds`` — the path for continental field
    tables)."""
    if isinstance(fields_table, ray.data.Dataset):
        cents = field_centroids_ds(fields_table)
    else:
        cents = field_centroids(fields_table)
    ref = ray.put(cents)
    return ds.map_batches(
        KNNActor,
        fn_constructor_args=(ref, out_col),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=fitted_pool(concurrency) if isinstance(concurrency, int) else concurrency,
    )
