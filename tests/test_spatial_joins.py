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
