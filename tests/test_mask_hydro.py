"""Mask rasterization truth table (reference tests/raster/utils/test_mask.py)
and hydrography catchment remap/histogram semantics."""

import warnings

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from demeter_ray.functions import geo
from demeter_ray.stages.hydro import (
    UnknownCatchmentCodeWarning,
    build_vat_lookup,
    catchment_histogram,
    catchment_histogram_from_pixels,
    remap_catchments,
    remap_tile,
)
from demeter_ray.stages.mask import mask_tile, rasterize_mask

IDENTITY = (1.0, 0.0, 0.0, 0.0, 1.0, 0.0)  # reference uses Affine.identity()


def _squares():
    s1 = np.array([[1.0, 1.0], [3.0, 1.0], [3.0, 3.0], [1.0, 3.0], [1.0, 1.0]])
    s2 = np.array([[2.0, 2.0], [4.0, 2.0], [4.0, 4.0], [2.0, 4.0], [2.0, 2.0]])
    return [[s1], [s2]]


def test_mask_truth_table():
    """Exact reproduction of the reference's 4x4 two-square case
    (test_mask.py:10-68)."""
    pixels = np.ones((4, 4))
    out, transform = mask_tile(pixels, IDENTITY, _squares())
    expected_keep = np.array(
        [[0, 0, 0, 0],
         [0, 1, 1, 0],
         [0, 1, 1, 1],
         [0, 0, 1, 1]], dtype=bool)
    np.testing.assert_array_equal(~out.mask, expected_keep)
    assert transform == IDENTITY


def test_mask_all_touched_keeps_more():
    # polygon edges cut through pixel interiors: centers outside but corners
    # inside -> all_touched adds those pixels
    sq = [[np.array([[0.6, 0.6], [3.4, 0.6], [3.4, 3.4], [0.6, 3.4], [0.6, 0.6]])]]
    center = rasterize_mask(sq, IDENTITY, 4, 4, all_touched=False)
    touched = rasterize_mask(sq, IDENTITY, 4, 4, all_touched=True)
    assert center.sum() == 4  # centers 1.5/2.5 in both axes
    assert touched.sum() == 16  # every pixel touched
    assert (touched | ~center).all()  # superset


def test_mask_crop_window():
    pixels = np.arange(64, dtype=float).reshape(8, 8)
    square = [[np.array([[2.0, 2.0], [5.0, 2.0], [5.0, 5.0], [2.0, 5.0], [2.0, 2.0]])]]
    out, t = mask_tile(pixels, IDENTITY, square, crop=True)
    assert out.shape[0] <= 4 and out.shape[1] <= 4
    assert (~out.mask).sum() == 9  # 3x3 centers inside


# ------------------------------------------------------------- hydrography


def test_remap_known_and_unknown_codes():
    codes = np.array([1, 2, 3], dtype=np.int64)
    ids = np.array([10_000_000_000_001, 10_000_000_000_002, 10_000_000_000_003])
    px = np.array([[1, 2], [3, 7]], dtype=np.int32)  # 7 unmapped
    with pytest.warns(UnknownCatchmentCodeWarning):
        out = remap_tile(px, codes, ids, nodata=-9999.0)
    assert out.dtype == np.float64  # 14-digit ids forced to float64
    assert out[0, 0] == 10_000_000_000_001
    assert np.isnan(out[1, 1])
    # nodata input stays nodata without warning
    px2 = np.array([[-9999, 2]], dtype=np.int32)
    with warnings.catch_warnings():
        warnings.simplefilter("error", category=UnknownCatchmentCodeWarning)
        out2 = remap_tile(px2, codes, ids, nodata=-9999.0)
    assert np.isnan(out2[0, 0]) and out2[0, 1] == 10_000_000_000_002


def test_catchment_histogram_vat_and_pixel_paths(ray_session, tiny_fixtures):
    import ray.data

    vat = pq.read_table(f"{tiny_fixtures}/catchment_vat.parquet")
    hist = catchment_histogram(vat)
    assert (hist["n_pixels"] > 0).all()
    assert hist["catchment_id"].is_monotonic_increasing

    tiles = ray.data.read_parquet(f"{tiny_fixtures}/raster_tiles.parquet")
    # fixture cat tiles contain code 11 which the VAT deliberately omits;
    # the unknown-code warning fires inside Ray workers (visible in worker
    # logs, not catchable on the driver — covered by the in-process test)
    pixel_hist = catchment_histogram_from_pixels(tiles, vat)
    assert len(pixel_hist) > 0
    # every remapped id exists in the VAT id space
    vat_ids = set(vat.to_pandas()["catchment_id"])
    assert set(pixel_hist["catchment_id"]).issubset(vat_ids)


def test_remap_catchments_dataset(ray_session, tiny_fixtures):
    import ray.data

    vat = pq.read_table(f"{tiny_fixtures}/catchment_vat.parquet")
    tiles = ray.data.read_parquet(f"{tiny_fixtures}/raster_tiles.parquet")
    out = remap_catchments(tiles, vat).to_pandas()
    assert (out["dtype"] == "float64").all()
    px = np.frombuffer(out.iloc[0]["pixels"], dtype="float64")
    valid = px[~np.isnan(px)]
    assert (valid > 10_000_000_000_000).all()

def test_zip_tiles_roundtrip_and_histogram(ray_session, tiny_fixtures):
    """S12: the zip container (catchment tiles + VAT sidecar) parses into
    the standard tile schema and yields the same catchment histogram as the
    parquet-sourced path."""
    import ray.data

    from demeter_ray.sources.ziptiles import read_zip_tiles
    from demeter_ray.stages.hydro import catchment_histogram_from_pixels

    tiles_tbl, vat_tbl = read_zip_tiles(f"{tiny_fixtures}/catchment.zip")
    assert tiles_tbl.num_rows == 25  # 5x5 cat tiles
    ref_tiles = pq.read_table(f"{tiny_fixtures}/raster_tiles.parquet")
    ref_cat = ref_tiles.filter(pa.compute.equal(ref_tiles["dataset"], "cat"))
    # byte-identical payloads + identical headers per tile
    z = {t: (h, w, px) for t, h, w, px in zip(
        tiles_tbl["tile_id"].to_pylist(), tiles_tbl["h"].to_pylist(),
        tiles_tbl["w"].to_pylist(), tiles_tbl["pixels"].to_pylist())}
    for t, h, w, px in zip(ref_cat["tile_id"].to_pylist(), ref_cat["h"].to_pylist(),
                           ref_cat["w"].to_pylist(), ref_cat["pixels"].to_pylist()):
        assert z[t] == (h, w, px)
    ref_vat = pq.read_table(f"{tiny_fixtures}/catchment_vat.parquet")
    assert vat_tbl.to_pydict() == ref_vat.to_pydict()
    # same histogram through the Ray pipeline from the zip-sourced tiles
    zip_hist = catchment_histogram_from_pixels(
        ray.data.from_arrow(tiles_tbl), vat_tbl
    )
    parq_hist = catchment_histogram_from_pixels(
        ray.data.read_parquet(f"{tiny_fixtures}/raster_tiles.parquet"), ref_vat
    )
    pd.testing.assert_frame_equal(zip_hist, parq_hist)


def test_catchment_pixel_hist_gated_branch_parity(ray_session, tiny_fixtures):
    """Both branches of the gated combine (driver under the cap, bucketed
    distributed shuffle above it) produce the identical histogram."""
    import ray.data

    vat = pq.read_table(f"{tiny_fixtures}/catchment_vat.parquet")
    tiles = ray.data.read_parquet(f"{tiny_fixtures}/raster_tiles.parquet")
    driver = catchment_histogram_from_pixels(tiles, vat)
    dist = catchment_histogram_from_pixels(tiles, vat, driver_cap=0)
    pd.testing.assert_frame_equal(
        driver.reset_index(drop=True),
        dist.sort_values("catchment_id").reset_index(drop=True),
        check_dtype=False,
    )
