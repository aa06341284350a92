"""Merge truth tables mirroring the reference's
tests/raster/utils/test_merge.py semantics (same inputs, same expected
outputs), plus the Ray map_groups integration."""

import warnings

import numpy as np
import pytest

from demeter_ray.functions import geo
from demeter_ray.stages.merge import (
    OverlappingPixelsWarning,
    merge_stddev,
    merge_tiles,
    merge_variance,
)

T = (1.0, 0.0, 0.0, 0.0, -1.0, 0.0)  # 1px unit grid, origin top-left


def tile(tid, arr, nodata, transform=T):
    arr = np.asarray(arr, dtype=np.float64)
    h, w = arr.shape
    return (tid, arr, transform, nodata, geo.raster_bounds(transform, h, w))


@pytest.fixture
def int_rasters_nonzero_nodata():
    return [
        tile("a", [[6, -9999], [9, 4]], -9999.0),
        tile("b", [[4, 3], [5, 5]], -9999.0),
    ]


@pytest.fixture
def float_rasters():
    # reference order: [[4,3],[5,5]] first, [[6,nan],[9,4]] second
    return [
        tile("a", [[4.0, 3.0], [5.0, 5.0]], float("nan")),
        tile("b", [[6.0, np.nan], [9.0, 4.0]], float("nan")),
    ]


def test_merge_first_int_nonzero_nodata(int_rasters_nonzero_nodata):
    # sorted tile order puts "a" first -> first semantics give a's values
    px, transform, nodata = merge_tiles(int_rasters_nonzero_nodata, method="first")
    np.testing.assert_array_equal(px.filled(-9999), [[6, 3], [9, 4]])
    assert nodata == -9999.0


def test_merge_zero_nodata():
    tiles = [
        tile("a", [[6, 0], [9, 4]], 0.0),
        tile("b", [[4, 3], [5, 5]], 0.0),
    ]
    px, _, _ = merge_tiles(tiles, method="first")
    np.testing.assert_array_equal(px.filled(0), [[6, 3], [9, 4]])


def test_merge_min(float_rasters):
    px, _, _ = merge_tiles(float_rasters, method="min")
    np.testing.assert_array_equal(px.filled(np.nan), [[4.0, 3.0], [5.0, 4.0]])


def test_merge_max(float_rasters):
    px, _, _ = merge_tiles(float_rasters, method="max")
    np.testing.assert_array_equal(px.filled(np.nan), [[6.0, 3.0], [9.0, 5.0]])


def test_merge_mean(float_rasters):
    px, _, _ = merge_tiles(float_rasters, method="mean")
    np.testing.assert_array_equal(px.filled(np.nan), [[5.0, 3.0], [7.0, 4.5]])


def test_merge_sum_and_count(float_rasters):
    px, _, _ = merge_tiles(float_rasters, method="sum")
    np.testing.assert_array_equal(px.filled(np.nan), [[10.0, 3.0], [14.0, 9.0]])
    px, _, _ = merge_tiles(float_rasters, method="count")
    np.testing.assert_array_equal(px.filled(np.nan), [[2.0, 1.0], [2.0, 2.0]])


def test_merge_last(float_rasters):
    px, _, _ = merge_tiles(float_rasters, method="last")
    # "b" merges last -> wins where valid; nan pixel falls back to "a"
    np.testing.assert_array_equal(px.filled(np.nan), [[6.0, 3.0], [9.0, 4.0]])


def test_merge_variance_and_stddev(float_rasters):
    mean = merge_tiles(float_rasters, method="mean")
    var = merge_variance(float_rasters, mean)
    np.testing.assert_array_equal(var.filled(np.nan), [[1.0, 0.0], [4.0, 0.25]])
    std = merge_stddev(float_rasters, mean)
    np.testing.assert_array_equal(std.filled(np.nan), [[1.0, 0.0], [2.0, 0.5]])


# ------------------------- aligned offset tiles (reference :92-116, :278-299)

TL = (10.0, 0.0, -176010.0, 0.0, -10.0, 2390250.0)
BR = (10.0, 0.0, -176000.0, 0.0, -10.0, 2390240.0)


@pytest.fixture
def offset_tiles():
    tl = np.arange(12).reshape(3, 4)[:, :3] * 0 + np.array(
        [[0, 1, 2], [4, 5, 6], [8, 9, 10]], dtype=float
    )
    br = np.array([[5, 6, 7], [9, 10, 11], [13, 14, 15]], dtype=float)
    return [tile("tl", tl, -9999.0, TL), tile("br", br, -9999.0, BR)]


def test_merge_aligned_offset_tiles(offset_tiles):
    px, transform, _ = merge_tiles(offset_tiles, allow_resampling=False)
    assert transform == (10.0, 0.0, -176010.0, 0.0, -10.0, 2390250.0)
    expected = np.ma.masked_equal(
        [[0, 1, 2, -9999], [4, 5, 6, 7], [8, 9, 10, 11], [-9999, 13, 14, 15]], -9999
    )
    np.testing.assert_array_equal(px.filled(-9999), expected.filled(-9999))


def test_merge_no_resample_error(offset_tiles):
    tid, arr, t, nd, _ = offset_tiles[0]
    shifted = (10.0, 0.0, t[2] + 1, 0.0, -10.0, t[5] + 1)
    bad = tile("tl", arr, nd, shifted)
    with pytest.raises(ValueError):
        merge_tiles([bad, offset_tiles[1]], allow_resampling=False)


def test_merge_bounds_snap(offset_tiles):
    px, transform, _ = merge_tiles(
        offset_tiles,
        bounds=(-175995, 2390215, -175975, 2390235),
        allow_resampling=False,
    )
    # snapped outward to the first tile's grid -> covers the BR raster region
    br = offset_tiles[1]
    assert px.shape[0] >= 3 and px.shape[1] >= 2
    # the BR tile's values appear at the right offset
    a, b, c, d, e, f = transform
    col0 = int(round((BR[2] - c) / a))
    row0 = int(round((BR[5] - f) / e))
    got = px[row0 : row0 + 3, col0 : col0 + 3]
    np.testing.assert_array_equal(got.filled(-9999)[:3, :3][got[:3, :3].mask == False],  # noqa: E712
                                  br[1][got[:3, :3].mask == False])


def test_overlap_warning(offset_tiles):
    # equal overlap values -> no warning
    with warnings.catch_warnings():
        warnings.simplefilter("error", category=OverlappingPixelsWarning)
        px, _, _ = merge_tiles(offset_tiles, method="first", check_overlap=True)
    # change one overlapping pixel -> warning, first value kept
    tid, arr, t, nd, bb = offset_tiles[1]
    arr2 = arr.copy()
    arr2[0, 0] = 42
    with pytest.warns(OverlappingPixelsWarning):
        px2, _, _ = merge_tiles(
            [offset_tiles[0], tile("br", arr2, nd, BR)], method="first", check_overlap=True
        )
    # canonical sorted-tile order makes "br" the first raster, so ITS value
    # is the one kept at the conflicting pixel (deterministic-first rule,
    # SURVEY.md §7.5 — unlike the reference, which keeps input order)
    assert px2[1, 1] == 42.0
    diff = px.filled(-9999) != px2.filled(-9999)
    assert diff.sum() == 1 and diff[1, 1]


# -------------------------------------- Ray integration: map_groups merging


def test_merge_in_map_groups(ray_session, tiny_fixtures):
    """Per-(dataset) tile merge inside groupby().map_groups — the mosaic
    shuffle (SURVEY.md §7.4); conflicting planted overlap warns."""
    import pandas as pd
    import pyarrow.parquet as pq
    import ray.data

    from demeter_ray.stages.sample import load_tiles

    tbl = pq.read_table(f"{tiny_fixtures}/raster_tiles.parquet")
    tiles = load_tiles(tbl, "elevation")
    merged, transform, _ = merge_tiles(tiles, method="first", allow_resampling=False)
    assert merged.shape == (320, 320)  # overlaps extend INTO neighbors, union = window
    # conflicting overlap pair (om mean depth 0 tiles (0,0)/(1,0)) warns
    om_tiles = load_tiles(tbl, "om", "mean", 0)
    with pytest.warns(OverlappingPixelsWarning):
        merge_tiles(om_tiles, method="first", check_overlap=True)


def test_read_tiles_window_prunes_at_the_read(ray_session, tiny_fixtures):
    """S5 windowed read: only envelope-intersecting tile rows leave the
    scan, and the windowed merge equals the full merge cropped to the same
    bounds."""
    from demeter_ray.sources.fixtures import LAT0, LON0, TILE_DEG
    from demeter_ray.sources.tables import read_tiles_window

    path = f"{tiny_fixtures}/raster_tiles.parquet"
    # a window covering (only) the 2x2 southwest tiles
    win = (LON0 + 0.01, LAT0 + 0.01, LON0 + 2 * TILE_DEG - 0.01, LAT0 + 2 * TILE_DEG - 0.01)
    ds = read_tiles_window(path, win, dataset="elevation")
    got = ds.to_pandas()
    assert set(got["tile_id"]) == {"0_0", "0_1", "1_0", "1_1"}
    # a window outside the fixture geography reads nothing
    assert read_tiles_window(path, (0, 0, 1, 1), dataset="elevation").count() == 0
    # windowed merge == full merge cropped to the window
    import pyarrow.parquet as pq

    from demeter_ray.stages.merge import merge_tiles
    from demeter_ray.stages.sample import load_tiles

    windowed_tiles = []
    for _, r in got.iterrows():
        px = np.frombuffer(r["pixels"], dtype=r["dtype"]).reshape(r["h"], r["w"])
        t = tuple(r["transform"])
        windowed_tiles.append((r["tile_id"], px, t, r["nodata"],
                               (r["minx"], r["miny"], r["maxx"], r["maxy"])))
    m_win, t_win, _ = merge_tiles(windowed_tiles, method="first", bounds=win)
    all_tiles = load_tiles(pq.read_table(path), "elevation")
    m_all, t_all, _ = merge_tiles(all_tiles, method="first", bounds=win)
    assert t_win == t_all
    np.testing.assert_array_equal(m_win.filled(np.nan), m_all.filled(np.nan))
