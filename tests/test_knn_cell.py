"""CellKNN (cell-bucketed k-ring nearest-centroid) parity vs brute force.

The scale path must be *exactly* interchangeable with CentroidKNN — same
nearest ids (min-id tie rule) and same squared distances — across ring edge
cases: empty rings around the query, ties at ring boundaries, world-edge
clipping, and degenerate single-centroid tables.  No Ray needed; pure numpy.
"""

import numpy as np
import pytest

from demeter_ray.functions import geo


def _parity(ids, xs, ys, pxs, pys, res=None):
    brute = geo.CentroidKNN(ids, xs, ys)
    cell = geo.CellKNN(ids, xs, ys, res=res)
    bid, bd2 = brute.query(pxs, pys)
    cid, cd2 = cell.query(pxs, pys)
    np.testing.assert_array_equal(bid, cid)
    np.testing.assert_array_equal(bd2, cd2)
    return cell


def test_random_clustered_parity():
    rng = np.random.default_rng(7)
    # two dense clusters + a uniform sprinkle (regional skew)
    c1 = rng.normal([-93.5, 41.8], 0.4, size=(1500, 2))
    c2 = rng.normal([151.0, -33.8], 0.2, size=(1200, 2))
    uni = np.column_stack(
        [rng.uniform(-179, 179, 300), rng.uniform(-89, 89, 300)]
    )
    cents = np.vstack([c1, c2, uni])
    ids = rng.permutation(len(cents)).astype(np.int64)
    pts = np.vstack(
        [
            rng.normal([-93.5, 41.8], 0.8, size=(800, 2)),
            rng.normal([151.0, -33.8], 0.5, size=(600, 2)),
            np.column_stack([rng.uniform(-179, 179, 200), rng.uniform(-89, 89, 200)]),
        ]
    )
    for res in (None, 5, 9, 13):
        _parity(ids, cents[:, 0], cents[:, 1], pts[:, 0], pts[:, 1], res=res)


def test_empty_rings_sparse_centroids():
    # one centroid per continent-ish; queries far from any centroid force
    # many empty rings before the first candidate appears
    ids = np.array([10, 3, 99], dtype=np.int64)
    xs = np.array([-100.0, 20.0, 140.0])
    ys = np.array([45.0, 5.0, -30.0])
    pxs = np.array([-179.9, 0.0, 179.9, 60.0, -60.0])
    pys = np.array([89.9, -89.9, 0.0, 30.0, -45.0])
    _parity(ids, xs, ys, pxs, pys, res=12)


def test_single_centroid_world_away():
    _parity(
        np.array([5], dtype=np.int64),
        np.array([179.0]),
        np.array([89.0]),
        np.array([-179.0, 0.0]),
        np.array([-89.0, 0.0]),
        res=10,
    )


def test_tie_at_ring_boundary_min_id_wins():
    # Two centroids exactly equidistant from the query, placed so one sits
    # in the query's own cell and the other across a cell boundary — the
    # guarantee-radius logic must expand far enough to see both, and the
    # min id must win.  Grid-aligned coordinates keep distances bit-equal.
    res = 6  # cell width 5.625 deg
    w = 360.0 / (1 << res)
    q = np.array([0.0]), np.array([0.0])
    xs = np.array([0.0 - 0.25 * w, 0.0 + 0.25 * w])  # symmetric offsets
    ys = np.array([0.0, 0.0])
    for ids in ([7, 3], [3, 7]):
        cell = geo.CellKNN(np.array(ids, dtype=np.int64), xs, ys, res=res)
        cid, cd2 = cell.query(*q)
        assert cid[0] == 3
    # cross-boundary tie: centroids in adjacent cells, equidistant
    xs2 = np.array([w * 2 - 0.5 * w, w * 2 + 0.5 * w])  # straddle boundary at 2w
    pq = np.array([w * 2]), np.array([0.0])
    for ids in ([11, 2], [2, 11]):
        _parity(np.array(ids, dtype=np.int64), xs2, ys, *pq, res=res)
        cell = geo.CellKNN(np.array(ids, dtype=np.int64), xs2, ys, res=res)
        cid, _ = cell.query(*pq)
        assert cid[0] == 2


def test_points_outside_world_bounds_clip_safely():
    rng = np.random.default_rng(11)
    cents = np.column_stack([rng.uniform(-179, 179, 500), rng.uniform(-89, 89, 500)])
    ids = np.arange(500, dtype=np.int64)
    pxs = np.array([-185.0, 185.0, 0.0, -180.0, 180.0])
    pys = np.array([0.0, 0.0, 95.0, -90.0, 90.0])
    _parity(ids, cents[:, 0], cents[:, 1], pxs, pys, res=8)


def test_empty_query_and_empty_index():
    cell = geo.CellKNN(np.array([1], dtype=np.int64), [0.0], [0.0])
    ids, d2 = cell.query([], [])
    assert len(ids) == 0 and len(d2) == 0
    empty = geo.CellKNN(np.array([], dtype=np.int64), [], [])
    with pytest.raises(ValueError):
        empty.query([0.0], [0.0])


def test_make_knn_size_gate():
    rng = np.random.default_rng(3)
    small = rng.uniform(-10, 10, size=(100, 2))
    big = rng.uniform(-10, 10, size=(geo.KNN_CELL_CAP + 1, 2))
    assert isinstance(
        geo.make_knn(np.arange(100), small[:, 0], small[:, 1]), geo.CentroidKNN
    )
    assert isinstance(
        geo.make_knn(np.arange(len(big)), big[:, 0], big[:, 1]), geo.CellKNN
    )


def test_sublinear_candidate_work_at_100x():
    """Structural sub-linearity: growing the centroid table 100x must NOT
    grow the per-query candidate work 100x (brute force examines exactly
    n_centroids per point; the k-ring search must examine far fewer)."""
    rng = np.random.default_rng(42)
    n_small, factor = 2_000, 100
    pts = np.column_stack(
        [rng.uniform(-100, -90, 3000), rng.uniform(40, 46, 3000)]
    )

    def work_per_point(n):
        cents = np.column_stack(
            [rng.uniform(-100, -90, n), rng.uniform(40, 46, n)]
        )
        idx = geo.CellKNN(np.arange(n, dtype=np.int64), cents[:, 0], cents[:, 1])
        idx.query(pts[:, 0], pts[:, 1])
        return idx.candidates_examined / len(pts)

    w_small = work_per_point(n_small)
    w_big = work_per_point(n_small * factor)
    # brute force would scale the work by `factor`; the bucketed search
    # keeps per-point candidates near-constant
    assert w_big < w_small * factor * 0.15
    assert w_big < n_small * factor * 0.1  # and far below "examine them all"


def test_field_centroids_ds_matches_driver(ray_session, tiny_fixtures):
    """Distributed centroid extraction must match the driver-side loop."""
    import pyarrow.parquet as pq
    import ray.data

    from demeter_ray.stages.knn import field_centroids, field_centroids_ds

    tbl = pq.read_table(f"{tiny_fixtures}/fields.parquet")
    ids, xs, ys = field_centroids(tbl)
    dids, dxs, dys = field_centroids_ds(
        ray.data.read_parquet(f"{tiny_fixtures}/fields.parquet")
    )
    order = np.argsort(dids)
    np.testing.assert_array_equal(np.asarray(ids), dids[order])
    np.testing.assert_array_equal(np.asarray(xs), dxs[order])
    np.testing.assert_array_equal(np.asarray(ys), dys[order])
