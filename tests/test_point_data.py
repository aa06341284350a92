"""fetch_point_data composite: golden layout + per-point recomputation
(the style of the reference's tests/test_api.py:37-178 golden frame)."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from demeter_ray.functions import geo
from demeter_ray.pipelines.point_data import fetch_point_data
from demeter_ray.sources import fixtures as fx


@pytest.fixture(scope="module")
def result(ray_session, tiny_fixtures):
    return fetch_point_data(tiny_fixtures)


def test_one_row_per_point_and_columns(result, tiny_fixtures):
    points = pq.read_table(f"{tiny_fixtures}/points.parquet").to_pandas()
    assert len(result) == len(points)
    for col in ("carbon_stock_mean", "carbon_stock_stddev", "elevation",
                "catchment_id", "map_unit_key",
                "ssurgo_component_key", "ssurgo_fragment_kind"):
        assert col in result.columns, col


def test_outside_point_gets_nulls(result):
    row = result[result["point_id"] == "p_outside"].iloc[0]
    assert np.isnan(row["elevation"])
    assert np.isnan(row["carbon_stock_mean"])
    assert pd.isna(row["catchment_id"])
    assert pd.isna(row["map_unit_key"])
    assert pd.isna(row["ssurgo_component_key"])


def test_elevation_matches_formula(result):
    # p_tile_edge sits exactly on a pixel boundary where the global-formula
    # floor differs by 1ulp from the per-tile affine floor; the engine's
    # per-tile answer is consistent across both overlapping tiles (its own
    # test below) — check the formula on interior points only
    inside = result[~result["point_id"].isin(["p_outside", "p_tile_edge"])]
    gcol = np.floor((inside["lon"].to_numpy() - fx.LON0) / fx.RES_DEG).astype(np.int64)
    grow = np.floor((fx.LAT1 - inside["lat"].to_numpy()) / fx.RES_DEG).astype(np.int64)
    expected = fx.elevation_value(gcol, grow).astype(np.float32)
    np.testing.assert_allclose(inside["elevation"].to_numpy(), expected, rtol=1e-6)


def test_catchment_ids_are_global(result):
    vals = result["catchment_id"].dropna()
    assert (vals > 10_000_000_000_000).all()


def test_ssurgo_attrs_match_assigned_field(result, tiny_fixtures):
    fields = pq.read_table(f"{tiny_fixtures}/fields.parquet")
    index = geo.PolygonIndex(
        fields["map_unit_key"].to_pylist(), fields["geom_wkb"].to_pylist()
    )
    for _, row in result.iterrows():
        expect = index.query_min_id([row["lon"]], [row["lat"]])[0]
        if expect < 0:
            assert pd.isna(row["map_unit_key"])
        else:
            assert row["map_unit_key"] == expect


def test_tile_edge_point_has_value(result):
    # exactly on an interior tile boundary: floor rule assigns the east tile
    row = result[result["point_id"] == "p_tile_edge"].iloc[0]
    assert np.isfinite(row["elevation"])

def test_reprojecting_sampler_utm(ray_session, tiny_fixtures):
    """M2: points in WGS84 sampled from an EPSG:32613 raster — the sampler
    transforms coordinates per tile CRS; expected value recomputed through
    an independent forward transform + floor."""
    import pyarrow.parquet as pq

    from demeter_ray.functions import geo
    from demeter_ray.stages.sample import load_tiles, sample_tiles_at_crs

    tbl = pq.read_table(f"{tiny_fixtures}/raster_tiles.parquet")
    tiles = load_tiles(tbl, "elevation_utm", with_crs=True)
    assert tiles and tiles[0][5] == "EPSG:32613"
    pts = pq.read_table(f"{tiny_fixtures}/points.parquet").to_pandas()
    inside = pts[pts["point_id"] != "p_outside"]
    got = sample_tiles_at_crs(tiles, inside["lon"].to_numpy(), inside["lat"].to_numpy())
    assert np.isfinite(got).all()
    # independent recompute: utm transform -> pixel indices -> value formula
    tid, px, transform, nodata, bounds, crs = tiles[0]
    xs, ys = geo.utm_forward(inside["lon"].to_numpy(), inside["lat"].to_numpy(), 13)
    col = np.floor((xs - transform[2]) / transform[0]).astype(np.int64)
    row = np.floor((ys - transform[5]) / transform[4]).astype(np.int64)
    expected = (((col * 31 + row * 17) % 1000) / 10.0).astype(np.float32)
    np.testing.assert_allclose(got, expected, rtol=1e-6)
    # point outside raster coverage -> NaN
    far = sample_tiles_at_crs(tiles, np.array([0.0]), np.array([0.0]))
    assert np.isnan(far[0])


def test_catchment_through_epsg5070_matches_default(ray_session, tiny_fixtures):
    """The EPSG:5070 catchment mosaic (reference hydrography CRS,
    api.py:184) yields the same catchment ids as the per-tile EPSG:4326
    path — same global field, different projection route."""
    base = fetch_point_data(tiny_fixtures, sources=("catchment",))
    albers = fetch_point_data(
        tiny_fixtures, sources=("catchment",), catchment_dataset="cat_albers"
    )
    # p_tile_edge sits exactly on a 4326 tile boundary: the ~100 m Albers
    # pixel center legitimately lands on the neighboring tile there, so the
    # exact-id comparison applies to the off-boundary probes
    interior = base["point_id"] != "p_tile_edge"
    pd.testing.assert_series_equal(
        base.loc[interior, "catchment_id"], albers.loc[interior, "catchment_id"]
    )
    edge = albers.loc[~interior, "catchment_id"]
    assert edge.notna().all()


def test_elevation_through_epsg4269(ray_session, tiny_fixtures):
    """Topo through EPSG:4269 (api.py:210): NAD83 geographic is identity to
    the 4326 grid, so values match the default elevation tile exactly where
    the 4269 tile has coverage (it spans tile (0,0) only)."""
    base = fetch_point_data(tiny_fixtures, sources=("elevation",))
    nad = fetch_point_data(
        tiny_fixtures, sources=("elevation",), elevation_dataset="elevation_nad83"
    )
    m = ~nad["elevation"].isna()
    assert m.any()
    np.testing.assert_allclose(nad.loc[m, "elevation"], base.loc[m, "elevation"])


def test_sample_through_epsg5070_direct(ray_session, tiny_fixtures):
    """sample_tiles_at_crs through EPSG:5070 reproduces the catchment-code
    field at block-interior probe lattice points."""
    from demeter_ray.stages.sample import load_tiles, sample_tiles_at_crs
    from demeter_ray.sources.fixtures import (
        LAT1, LON0, N_TILES, RES_DEG, TILE_PX, catchment_value,
    )

    tbl = pq.read_table(f"{tiny_fixtures}/raster_tiles.parquet")
    tiles = load_tiles(tbl, "cat_albers", with_crs=True)
    assert tiles and tiles[0][5] == "EPSG:5070"
    # probes at the centers of 32-px blocks (far from any block boundary)
    g = np.arange(16, N_TILES * TILE_PX, 32, dtype=np.float64)
    gc, gr = np.meshgrid(g, g)
    lons = LON0 + (gc.ravel() + 0.5) * RES_DEG
    lats = LAT1 - (gr.ravel() + 0.5) * RES_DEG
    got = sample_tiles_at_crs(tiles, lons, lats)
    want = catchment_value(gc.ravel().astype(np.int64), gr.ravel().astype(np.int64))
    tidx = (gc.ravel().astype(np.int64) // TILE_PX) * N_TILES + (
        N_TILES - 1 - gr.ravel().astype(np.int64) // TILE_PX
    )
    np.testing.assert_array_equal(got, (want + 16 * tidx).astype(np.float64))
