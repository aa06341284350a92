"""Depth-weighted aggregation (POLARIS-shape) conformance on fixture tiles:
expected values recomputed independently from the deterministic generator
formulas."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from demeter_ray.functions import depth as depthfns
from demeter_ray.sources import fixtures as fx
from demeter_ray.stages.depthagg import (
    depth_group_merge_pipeline,
    depth_weighted_mean,
    depth_weighted_stddev,
    estimate_carbon_stock,
)


@pytest.fixture(scope="module")
def tiles(tiny_fixtures):
    return pq.read_table(f"{tiny_fixtures}/raster_tiles.parquet")


def _expected_layer(dataset, stat, dtop, gcol, grow):
    v = fx.soil_value(gcol, grow, dataset, stat, dtop)
    hole = (gcol + grow + dtop) % 89 == 0
    return np.where(hole, np.nan, v)


def test_depth_weighted_mean_matches_formula(tiles):
    got, transform = depth_weighted_mean(tiles, "bd", 0, 100)
    depths = depthfns.select_including(depthfns.STANDARD_DEPTHS, 0, 100)
    weights = depthfns.clipped_weights(depths, 0, 100)
    h, w = got.shape
    gcol, grow = np.meshgrid(np.arange(w), np.arange(h), indexing="xy")
    stack = np.array(
        [_expected_layer("bd", "mean", d[0], gcol, grow) for d in depths]
    ).astype(np.float32).astype(np.float64)
    expected = np.ma.average(
        np.ma.masked_array(stack, mask=np.isnan(stack)), axis=0, weights=weights
    )
    assert got.shape == expected.shape
    np.testing.assert_allclose(got.filled(np.nan), expected.filled(np.nan), rtol=1e-6)


def test_partial_range_uses_clipped_weights(tiles):
    # range (10, 40) hits layers (5,15),(15,30),(30,60) with weights 5,15,10
    got, _ = depth_weighted_mean(tiles, "bd", 10, 40)
    depths = depthfns.select_including(depthfns.STANDARD_DEPTHS, 10, 40)
    assert depths == [(5, 15), (15, 30), (30, 60)]
    weights = depthfns.clipped_weights(depths, 10, 40)
    assert weights.tolist() == [5.0, 15.0, 10.0]
    h, w = got.shape
    gcol, grow = np.meshgrid(np.arange(w), np.arange(h), indexing="xy")
    stack = np.array(
        [_expected_layer("bd", "mean", d[0], gcol, grow) for d in depths]
    ).astype(np.float32).astype(np.float64)
    expected = np.ma.average(
        np.ma.masked_array(stack, mask=np.isnan(stack)), axis=0, weights=weights
    )
    np.testing.assert_allclose(got.filled(np.nan), expected.filled(np.nan), rtol=1e-6)


def test_stddev_from_percentiles(tiles):
    got, _ = depth_weighted_stddev(tiles, "om", 0, 30)
    # p5 - p95 = +0.5 - (-0.5) = 1.0 everywhere (soil_value construction)
    # -> sigma = 1/3.29 per layer -> weighted avg of sigma^2 = (1/3.29)^2
    inner = got[~got.mask]
    expected_sigma = 1.0 / 3.29
    np.testing.assert_allclose(inner, expected_sigma, rtol=1e-5)


def test_carbon_stock_combines_om_and_bd(tiles):
    mean, std, transform = estimate_carbon_stock(tiles, 0, 100)
    assert mean.shape == std.shape
    assert (~mean.mask).sum() > 0
    # spot formula check at a valid pixel
    om, _ = depth_weighted_mean(tiles, "om", 0, 100)
    bd, _ = depth_weighted_mean(tiles, "bd", 0, 100)
    i, j = np.argwhere(~mean.mask)[0]
    assert mean[i, j] == pytest.approx(om[i, j] * 0.58 * bd[i, j])
    assert (std.filled(0) >= 0).all()


def test_depth_group_merge_pipeline_ray(ray_session, tiny_fixtures):
    import ray.data

    ds = ray.data.read_parquet(f"{tiny_fixtures}/raster_tiles.parquet")
    out = depth_group_merge_pipeline(ds, "bd")
    # 5 statistics x 6 depths
    assert len(out) == 30
    assert set(out["statistic"]) == {"mean", "p5", "p95", "p50", "mode"}
    assert (out["h"] == 320).all() and (out["w"] == 320).all()
    assert (out["valid_px"] > 0.98 * 320 * 320).all()  # planted holes only


def test_combined_statistic_rasters(ray_session, tiny_fixtures):
    """Median/mode layers merge alongside mean/p5/p95 (CombinedRasters,
    polaris.py:63-70) and reproduce the planted statistic formulas."""
    import pyarrow.parquet as pq

    from demeter_ray.sources.fixtures import soil_value
    from demeter_ray.stages.depthagg import combined_statistic_rasters

    tiles = pq.read_table(f"{tiny_fixtures}/raster_tiles.parquet")
    combined, transform = combined_statistic_rasters(tiles, "om", 0)
    assert set(combined) == {"mean", "p5", "p95", "p50", "mode"}
    shapes = {s: r.shape for s, r in combined.items()}
    assert len(set(shapes.values())) == 1  # one shared grid
    # probe an interior pixel against the generator formulas
    gc, gr = np.int64(40), np.int64(40)
    for stat, raster in combined.items():
        want = float(np.float32(soil_value(gc, gr, "om", stat, 0)))
        got = float(raster[int(gr), int(gc)])
        if not np.isnan(want):
            assert got == pytest.approx(want, abs=1e-6), stat
    # median offset and mode quantization semantics
    m = combined["mean"].compressed()
    assert np.allclose(combined["p50"].compressed()[:100] - combined["mean"].compressed()[:100], 0.05, atol=1e-6)
    mode_vals = combined["mode"].compressed()
    assert np.allclose(mode_vals * 4, np.round(mode_vals * 4), atol=1e-5)
    # absent statistic -> omitted (Optional semantics)
    some, _ = combined_statistic_rasters(tiles, "om", 0, statistics=("mean", "nope"))
    assert set(some) == {"mean"}
