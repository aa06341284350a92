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


def test_hydro_fac_fdr_columns(result):
    """fac/fdr point columns (api.py:183-206): flow accumulation matches
    the deterministic field formula; fdr decodes to the FlowDirection
    categorical; outside-coverage points get nulls."""
    from demeter_ray.functions.scenes import FLOW_DIRECTIONS

    inside = result[~result["point_id"].isin(["p_outside", "p_tile_edge"])]
    gcol = np.floor((inside["lon"].to_numpy() - fx.LON0) / fx.RES_DEG).astype(np.int64)
    grow = np.floor((fx.LAT1 - inside["lat"].to_numpy()) / fx.RES_DEG).astype(np.int64)
    np.testing.assert_allclose(
        inside["flow_accumulation"].to_numpy(),
        fx.fac_value(gcol, grow).astype(np.float32),
        rtol=1e-6,
    )
    expect = [FLOW_DIRECTIONS[int(v)] for v in fx.fdr_value(gcol, grow)]
    assert list(inside["flow_direction"]) == expect
    assert str(result["flow_direction"].dtype) == "category"
    out_row = result[result["point_id"] == "p_outside"].iloc[0]
    assert pd.isna(out_row["flow_accumulation"])
    assert pd.isna(out_row["flow_direction"])


def test_ndvi_point_columns(result):
    """NDVI statistic columns (api.py:128-178): per-point values recomputed
    independently from the scene formulas through the zone-13N UTM
    transform (mirrors tests/test_api.py:14-178 semantics)."""
    inside = result[result["point_id"] != "p_outside"]
    # the fixture window straddles the 13/14 zone boundary at -102 deg, so
    # each point recomputes through ITS zone's raster (api.py:134-151)
    zone_nums = geo.utm_zone_for(inside["lon"].to_numpy())
    assert set(zone_nums) == {13, 14}  # both zones exercised
    exp_mean, exp_min, exp_max, exp_std = [], [], [], []
    for lon, lat, zn in zip(
        inside["lon"].to_numpy(), inside["lat"].to_numpy(), zone_nums
    ):
        zone_i = int(zn) - 13
        e, n = geo.utm_forward(np.array([lon]), np.array([lat]), int(zn))
        t = fx._scene_transform(zone_i, 0, 10.0)
        ci = int(np.floor((e[0] - t[2]) / t[0]))
        ri = int(np.floor((n[0] - t[5]) / t[4]))
        tile_i, c_local = divmod(ci, fx.SCENE_PX)
        per_dt = []
        for dt in range(3):
            cc = np.array([[c_local]])
            rr = np.array([[ri]])
            red = int(fx.scene_band_value(zone_i, tile_i, dt, "red", cc, rr)[0, 0])
            nir = int(fx.scene_band_value(zone_i, tile_i, dt, "nir", cc, rr)[0, 0])
            scl = int(
                fx.scene_band_value(zone_i, tile_i, dt, "scl", cc // 2, rr // 2)[0, 0]
            )
            if c_local < 2 or red == 0 or nir == 0 or scl in fx.CLOUD_VALUES:
                continue
            r_r, n_r = red / 10000, nir / 10000
            per_dt.append(float(np.float32((n_r - r_r) / (n_r + r_r))))
        assert per_dt, "probe points should have at least one valid datatake"
        a = np.asarray(per_dt)
        exp_mean.append(a.mean())
        exp_min.append(a.min())
        exp_max.append(a.max())
        exp_std.append(np.sqrt(((a - a.mean()) ** 2).mean()))
    np.testing.assert_allclose(inside["ndvi_mean"].to_numpy(), exp_mean, rtol=1e-5)
    np.testing.assert_allclose(inside["ndvi_min"].to_numpy(), exp_min, rtol=1e-5)
    np.testing.assert_allclose(inside["ndvi_max"].to_numpy(), exp_max, rtol=1e-5)
    np.testing.assert_allclose(
        inside["ndvi_stddev"].to_numpy(), exp_std, rtol=1e-4, atol=1e-7
    )
    out_row = result[result["point_id"] == "p_outside"].iloc[0]
    assert np.isnan(out_row["ndvi_mean"])
