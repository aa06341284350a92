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
    fields_table: pa.Table,
    out_col: str = "nearest_field",
    concurrency=4,
    batch_size: int = 8192,
) -> ray.data.Dataset:
    ref = ray.put(field_centroids(fields_table))
    return ds.map_batches(
        KNNActor,
        fn_constructor_args=(ref, out_col),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=fitted_pool(concurrency) if isinstance(concurrency, int) else concurrency,
    )
