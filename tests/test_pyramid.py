"""Tile-pyramid / overview builder: factor-2 reductions, georeferencing,
nodata propagation, and the distributed map_batches surface."""

import numpy as np
import pyarrow as pa
import pytest

from demeter_ray.functions import geo
from demeter_ray.stages import pyramid


def _tile_row(px: np.ndarray, transform, nodata=float("nan"), tile_id="t0"):
    return pa.table(
        {
            "tile_id": pa.array([tile_id]),
            "h": pa.array([px.shape[0]], pa.int32()),
            "w": pa.array([px.shape[1]], pa.int32()),
            "dtype": pa.array([str(px.dtype)]),
            "nodata": pa.array([nodata], pa.float64()),
            "transform": pa.array([list(transform)], pa.list_(pa.float64(), 6)),
            "crs": pa.array(["EPSG:4326"]),
            "pixels": pa.array([px.tobytes()], pa.binary()),
        }
    )


TRANSFORM = (0.001, 0.0, -93.6, 0.0, -0.001, 42.05)


def test_average_overviews_halve_dims_and_preserve_mean():
    px = np.arange(64 * 64, dtype=np.float64).reshape(64, 64)
    levels = pyramid.tile_overviews(px, TRANSFORM, float("nan"), 3, "average")
    assert [(lv, o.shape) for lv, o, _ in levels] == [
        (1, (32, 32)), (2, (16, 16)), (3, (8, 8))
    ]
    for _, opx, _ in levels:
        np.testing.assert_allclose(opx.mean(), px.mean())
    # georeferencing: bounds identical at every level, pixel size 2^k
    b0 = geo.raster_bounds(TRANSFORM, 64, 64)
    for lv, opx, otf in levels:
        assert otf[0] == TRANSFORM[0] * 2 ** lv and otf[4] == TRANSFORM[4] * 2 ** lv
        assert geo.raster_bounds(otf, *opx.shape) == b0


def test_mode_overviews_preserve_categorical_codes():
    px = np.full((32, 32), 7.0)
    px[::2, ::2] = 3.0  # 1/4 minority
    levels = pyramid.tile_overviews(px, TRANSFORM, float("nan"), 2, "mode")
    for _, opx, _ in levels:
        assert set(np.unique(opx)) == {7.0}  # majority wins everywhere


def test_odd_dims_pad_with_nodata_and_edge_cells_average_valid_children():
    px = np.full((5, 5), 10.0)
    levels = pyramid.tile_overviews(px, TRANSFORM, float("nan"), 1, "average")
    _, opx, _ = levels[0]
    assert opx.shape == (3, 3)
    # padded edge cells still average only the valid children -> exactly 10
    np.testing.assert_allclose(opx[~np.isnan(opx)], 10.0)
    assert not np.isnan(opx).any()


def test_nodata_propagates_and_fills():
    px = np.full((8, 8), 5.0)
    px[:4, :4] = -9999.0  # nodata quadrant
    levels = pyramid.tile_overviews(px, TRANSFORM, -9999.0, 2, "average")
    l1 = levels[0][1]
    assert (l1[:2, :2] == -9999.0).all()      # fully-nodata children stay nodata
    assert (l1[2:, 2:] == 5.0).all()
    l2 = levels[1][1]
    assert l2[0, 0] == -9999.0 and l2[1, 1] == 5.0


def test_stops_at_one_pixel():
    px = np.full((4, 4), 2.0)
    levels = pyramid.tile_overviews(px, TRANSFORM, float("nan"), 10, "average")
    assert levels[-1][1].shape == (1, 1)
    assert len(levels) == 2


def test_build_overviews_dataset_surface(ray_session):
    import ray

    px_a = np.arange(16 * 16, dtype=np.float64).reshape(16, 16)
    px_b = np.full((16, 16), 3.0)
    tbl = pa.concat_tables([_tile_row(px_a, TRANSFORM, tile_id="a"),
                            _tile_row(px_b, TRANSFORM, tile_id="b")])
    ds = ray.data.from_arrow(tbl)
    out = pyramid.build_overviews(ds, levels=2, method="average").to_pandas()
    assert len(out) == 4  # 2 tiles x 2 levels
    assert sorted(out["level"].unique()) == [1, 2]
    got = out[(out["tile_id"] == "a") & (out["level"] == 2)].iloc[0]
    opx = np.frombuffer(got["pixels"], dtype=got["dtype"]).reshape(got["h"], got["w"])
    assert opx.shape == (4, 4)
    np.testing.assert_allclose(opx.mean(), px_a.mean())
    # metadata columns carried through per level
    assert set(out["crs"]) == {"EPSG:4326"}
