"""Brute-force parity for the round-4 spatial join/measure operators:
rect-intersection grid join (PBSM reference-point dedup), cell k-ring
neighbor counts, polygon geometry measures, per-user path length."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from demeter_ray.functions import geo
from demeter_ray.pipelines.oracle_spatial import (
    _NEIGH_RES,
    _rects_from_keys,
    cell_neighbor_event_counts,
    derive_lat,
    derive_lon,
    field_geometry_stats,
    rect_intersection_join,
    user_path_length,
)

SF = "/root/testdata/sf0.001"


def _pd(res):
    return res.to_pandas() if hasattr(res, "to_pandas") else res


def test_rect_intersection_matches_bruteforce():
    out = _pd(rect_intersection_join(SF))
    a_keys = pq.read_table(f"{SF}/supplier.parquet")["s_suppkey"].to_numpy()
    b_keys = pq.read_table(f"{SF}/customer.parquet")["c_custkey"].to_numpy()
    ax1, ax2, ay1, ay2 = _rects_from_keys(a_keys)
    bx1, bx2, by1, by2 = _rects_from_keys(b_keys)
    hit = (
        (ax1[:, None] <= bx2[None, :]) & (bx1[None, :] <= ax2[:, None])
        & (ay1[:, None] <= by2[None, :]) & (by1[None, :] <= ay2[:, None])
    )
    ia, ib = np.nonzero(hit)
    area = (
        np.minimum(ax2[ia], bx2[ib]) - np.maximum(ax1[ia], bx1[ib])
    ) * (np.minimum(ay2[ia], by2[ib]) - np.maximum(ay1[ia], by1[ib]))
    want = pd.DataFrame(
        {"a_key": a_keys[ia], "b_key": b_keys[ib], "inter_area": area}
    ).sort_values(["a_key", "b_key"]).reset_index(drop=True)
    got = out.sort_values(["a_key", "b_key"]).reset_index(drop=True)
    # reference-point dedup must produce each overlapping pair EXACTLY once
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(got[want.columns], want)


def test_cell_neighbor_counts_match_bruteforce():
    out = _pd(cell_neighbor_event_counts(SF)).sort_values("c_custkey")
    ev = pq.read_table(f"{SF}/events.parquet")["event_id"].to_numpy()
    cu = pq.read_table(f"{SF}/customer.parquet")["c_custkey"].to_numpy()
    ecx, ecy = geo.cell_xy(derive_lon(ev), derive_lat(ev), _NEIGH_RES)
    ccx, ccy = geo.cell_xy(derive_lon(cu), derive_lat(cu), _NEIGH_RES)
    want = (
        (np.abs(ecx[None, :] - ccx[:, None]) <= 1)
        & (np.abs(ecy[None, :] - ccy[:, None]) <= 1)
    ).sum(axis=1)
    assert np.array_equal(out["n_events_9"].to_numpy(), want[np.argsort(cu)])
    assert (out["n_events_9"] > 0).any()


def test_field_geometry_stats_bruteforce():
    out = _pd(field_geometry_stats(SF)).sort_values("map_unit_key")
    from demeter_ray.sources import fixtures as fx

    fields = fx.make_fields(fx.SCALES["tiny"]["grid"])
    for mid, wkb in zip(
        fields["map_unit_key"].to_pylist(), fields["geom_wkb"].to_pylist()
    ):
        row = out[out["map_unit_key"] == mid].iloc[0]
        area = per = nv = 0.0
        xs, ys = [], []
        for rings in geo.parse_wkb(wkb):
            for r in rings:
                r = np.asarray(r, dtype=np.float64)
                # per-ring |shoelace| summed — must equal |signed total|
                # (consistent orientation assumption of the operator)
                area += abs(
                    np.sum(r[:-1, 0] * r[1:, 1] - r[1:, 0] * r[:-1, 1])
                ) / 2
                seg = np.sqrt(np.sum(np.diff(r, axis=0) ** 2, axis=1))
                per += seg.sum()
                nv += len(r) - 1
                xs.append(r[:-1, 0]); ys.append(r[:-1, 1])
        assert row["n_vertices"] == nv
        assert abs(row["area"] - area) < 1e-9
        assert abs(row["perimeter"] - per) < 1e-9
        assert abs(row["centroid_x"] - np.concatenate(xs).mean()) < 1e-9
        assert abs(row["centroid_y"] - np.concatenate(ys).mean()) < 1e-9
    assert (out["area"] > 0).all()


def test_user_path_length_bruteforce():
    out = _pd(user_path_length(SF))
    t = pq.read_table(f"{SF}/events.parquet").to_pandas()
    t["lon"], t["lat"] = derive_lon(t["event_id"].to_numpy()), derive_lat(
        t["event_id"].to_numpy()
    )
    t = t.sort_values(["user_id", "ts", "event_id"])
    g = t.groupby("user_id")
    want_len = g.apply(
        lambda d: float(
            np.sum(np.sqrt(np.diff(d["lon"]) ** 2 + np.diff(d["lat"]) ** 2))
        ),
        include_groups=False,
    )
    for _, row in out.iterrows():
        assert row["n_points"] == g.size()[row["user_id"]]
        assert abs(row["path_len"] - want_len[row["user_id"]]) < 1e-8
    assert set(out["user_id"]) == set(t["user_id"])


def test_raster_polygonize_matches_bfs_both_paths():
    """Region extraction parity vs a brute-force BFS labeling, on BOTH
    connected_components paths (streamed union-find and the distributed
    min-label propagation forced via cap=0)."""
    from collections import deque

    import ray.data as rd

    from demeter_ray.pipelines.oracle_spatial import (
        _POLY_THR, _POLY_W, raster_polygonize_regions, _poly_mask_rows,
    )
    from demeter_ray.stages.components import connected_components

    W = _POLY_W
    r, c = np.mgrid[0:W, 0:W]
    m = (c * c * 13 + r * r * 7 + c * r * 3) % 100 < _POLY_THR
    lab = -np.ones((W, W), dtype=np.int64)
    for i in range(W):
        for j in range(W):
            if m[i, j] and lab[i, j] < 0:
                q = deque([(i, j)])
                members = []
                lab[i, j] = 0
                while q:
                    a, b = q.popleft()
                    members.append((a, b))
                    for da, db in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                        x, y = a + da, b + db
                        if 0 <= x < W and 0 <= y < W and m[x, y] and lab[x, y] < 0:
                            lab[x, y] = 0
                            q.append((x, y))
                rid = min(a * W + b for a, b in members)
                for a, b in members:
                    lab[a, b] = rid
    want = {}
    for i in range(W):
        for j in range(W):
            if m[i, j]:
                want.setdefault(lab[i, j], []).append((i, j))

    out = raster_polygonize_regions(SF)
    assert len(out) == len(want)
    for _, row in out.iterrows():
        mem = want[row["region_id"]]
        assert row["n_pixels"] == len(mem)
        assert row["min_row"] == min(a for a, _ in mem)
        assert row["max_col"] == max(b for _, b in mem)

    # distributed path (cap=0) must agree with the gated default
    rows = np.arange(W)
    rr, cc, node = _poly_mask_rows(rows)
    nodes_ds = rd.from_arrow(
        __import__("pyarrow").table({"node": node})
    )
    # reuse the operator's edge builder through its registered pipeline:
    # rebuild edges directly for the distributed call
    e_u, e_v = [], []
    for i in range(W):
        for j in range(W):
            if m[i, j]:
                if j + 1 < W and m[i, j + 1]:
                    e_u.append(i * W + j); e_v.append(i * W + j + 1)
                if i + 1 < W and m[i + 1, j]:
                    e_u.append(i * W + j); e_v.append((i + 1) * W + j)
    edges_ds = rd.from_arrow(
        __import__("pyarrow").table({"u": np.array(e_u, dtype=np.int64),
                                     "v": np.array(e_v, dtype=np.int64)})
    )
    dist = connected_components(edges_ds, nodes_ds, cap=0)
    got = dict(zip(dist["node"], dist["cluster_id"]))
    for i in range(W):
        for j in range(W):
            if m[i, j]:
                assert got[i * W + j] == lab[i, j]


def test_flow_path_length_matches_sequential_walk():
    """Pointer-jumping flow trace parity vs a sequential per-cell walk."""
    from demeter_ray.pipelines.oracle_spatial import _FLOW_W, flow_path_length

    W = _FLOW_W
    out = flow_path_length(SF)
    assert len(out) == W * W
    got = out.set_index("node")["path_steps"]
    rng = np.random.default_rng(5)
    for node in rng.choice(W * W, 200, replace=False):
        r, c = int(node) // W, int(node) % W
        steps = 0
        while 0 <= r < W and 0 <= c < W:
            d = (c * 13 + r * 7) % 3
            r += 0 if d == 0 else 1
            c += 0 if d == 2 else 1
            steps += 1
        assert got[node] == steps
    # corner sanity: the SE corner exits in one step
    assert got[(W - 1) * W + (W - 1)] == 1


def test_pack_binary_column_zero_copy_roundtrip():
    """(offsets, data) packing reproduces every WKB blob exactly, including
    through a sliced/offset Arrow array and the empty column."""
    import numpy as np
    import pyarrow as pa

    from demeter_ray.stages.pip import pack_binary_column, unpack_binary

    blobs = [b"alpha", b"", b"\x01\x02\x03\x04", b"tail"]
    col = pa.chunked_array([pa.array(blobs[:2], pa.binary()),
                            pa.array(blobs[2:], pa.binary())])
    offs, data = pack_binary_column(col)
    assert [bytes(b) for b in unpack_binary(offs, data)] == blobs
    # sliced array (non-zero Arrow offset)
    sliced = pa.array(blobs, pa.binary()).slice(1, 2)
    offs, data = pack_binary_column(sliced)
    assert [bytes(b) for b in unpack_binary(offs, data)] == blobs[1:3]
    # empty
    offs, data = pack_binary_column(pa.array([], pa.binary()))
    assert unpack_binary(offs, data) == []
    assert offs.dtype == np.int64
