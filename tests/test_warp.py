"""Raster reprojection / alignment, mirroring the reference's
tests/raster/utils/test_reprojection.py:19-101 (shape change, mean
preservation, grid alignment) on synthetic tiles — no rasterio in this
environment, so the goldens are analytic invariants."""

import numpy as np
import pytest

from demeter_ray.functions import geo, warp
from demeter_ray.stages import merge


def _smooth_tile(h, w, transform, f):
    """Smooth field sampled at pixel centers of the given grid."""
    rows, cols = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    a, b, c, d, e, ff = transform
    xs = a * (cols + 0.5) + b * (rows + 0.5) + c
    ys = d * (cols + 0.5) + e * (rows + 0.5) + ff
    return f(xs, ys)


@pytest.fixture
def elevation_4326():
    # ~60x80 px tile over Iowa at 0.001 deg (~100 m), smooth "elevation"
    transform = (0.001, 0.0, -93.60, 0.0, -0.001, 42.05)
    px = _smooth_tile(60, 80, transform, lambda x, y: 300 + 40 * np.sin(8 * x) + 25 * np.cos(11 * y))
    return np.ma.masked_array(px), transform


def test_reproject_changes_shape_preserves_mean(elevation_4326):
    px, transform = elevation_4326
    out, out_t = warp.reproject_raster(px, transform, "EPSG:4326", "EPSG:5070", "average")
    assert out.shape != px.shape
    assert round(float(out.mean())) == round(float(px.mean()))
    # resolution now in meters (~100 m/px, not degrees)
    assert 50 < out_t[0] < 200 and -200 < out_t[4] < -50


def test_reproject_noop_same_crs(elevation_4326):
    px, transform = elevation_4326
    out, out_t = warp.reproject_raster(px, transform, "EPSG:4326", "EPSG:4326")
    assert out_t == transform and np.array_equal(out, px)


def test_reproject_masked_pixels_stay_masked(elevation_4326):
    px, transform = elevation_4326
    px = px.copy()
    px[10:20, 10:30] = np.ma.masked
    out, _ = warp.reproject_raster(px, transform, "EPSG:4326", "EPSG:5070", "nearest")
    assert out.mask.any()
    frac_in = px.mask.mean()
    assert abs(out.mask.mean() - frac_in) < 0.15  # hole survives, roughly same area


def test_align_puts_rasters_on_same_grid(elevation_4326):
    px, transform = elevation_4326
    # target grid in 5070: 75 m pixels at an arbitrary offset
    target_t = (75.0, 0.0, 180_037.0, 0.0, -75.0, 2_240_011.0)
    out, out_t = warp.reproject_raster(
        px, transform, "EPSG:4326", "EPSG:5070", "average", align_to=target_t
    )
    assert out_t[0] == 75.0 and out_t[4] == -75.0
    bounds = geo.raster_bounds(out_t, *out.shape)
    assert geo.aligned_pixel_grids(bounds, [target_t, out_t])
    assert round(float(out.mean())) == round(float(px.mean()))


def test_bilinear_matches_smooth_field(elevation_4326):
    px, transform = elevation_4326
    out, out_t = warp.reproject_raster(px, transform, "EPSG:4326", "EPSG:5070", "bilinear")
    # interior of a smooth field: bilinear stays within the field's range
    inner = out[2:-2, 2:-2].compressed()
    assert inner.min() >= px.min() - 1 and inner.max() <= px.max() + 1


def test_reproject_and_merge_two_utm_zones():
    """Two tiles in adjacent UTM zones -> EPSG:4326 mosaic, mean method —
    mirrors test_reprojection.py:62-79 (mean of merged ~= mean of inputs)."""
    # zone 13 covers lon [-105,-99); zone 14 [-99,-93): tiles near the seam
    t13_lon, t14_lon, lat = -99.4, -98.9, 41.0
    e13, n13 = geo.utm_forward(np.array([t13_lon]), np.array([lat]), 13)
    e14, n14 = geo.utm_forward(np.array([t14_lon]), np.array([lat]), 14)
    tr13 = (60.0, 0.0, float(e13[0]), 0.0, -60.0, float(n13[0]))
    tr14 = (60.0, 0.0, float(e14[0]), 0.0, -60.0, float(n14[0]))
    px13 = _smooth_tile(50, 50, tr13, lambda x, y: np.full_like(x, 0.55))
    px14 = _smooth_tile(50, 50, tr14, lambda x, y: np.full_like(x, 0.35))
    tiles = [
        (0, px13, tr13, None, geo.raster_bounds(tr13, 50, 50), "EPSG:32613"),
        (1, px14, tr14, None, geo.raster_bounds(tr14, 50, 50), "EPSG:32614"),
    ]
    merged, out_t, _, crs = merge.reproject_and_merge_tiles(
        tiles, "EPSG:4326", "average", merge_method="mean"
    )
    assert crs == "EPSG:4326"
    vals = merged.compressed()
    original_mean = (0.55 + 0.35) / 2
    # the two constant patches don't overlap: mosaic mean = area-weighted mean
    assert 0.35 - 1e-9 <= vals.min() and vals.max() <= 0.55 + 1e-9
    assert abs(vals.mean() - original_mean) < 0.02


def test_align_and_merge_onto_target_grid():
    """align_and_merge: output grid == target grid (test_reprojection:82-101)."""
    lon, lat = -98.9, 41.0
    e, n = geo.utm_forward(np.array([lon]), np.array([lat]), 14)
    tr = (60.0, 0.0, float(e[0]), 0.0, -60.0, float(n[0]))
    px = _smooth_tile(40, 40, tr, lambda x, y: np.full_like(x, 7.0))
    # target: EPSG:5070 at 90 m
    x5070, y5070 = geo.crs_forward("EPSG:5070", np.array([lon]), np.array([lat]))
    target_t = (90.0, 0.0, float(x5070[0]) - 500, 0.0, -90.0, float(y5070[0]) + 500)
    tiles = [(0, px, tr, None, geo.raster_bounds(tr, 40, 40), "EPSG:32614")]
    merged, out_t, _, crs = merge.align_and_merge_tiles(
        tiles, target_t, "EPSG:5070", "average", merge_method="mean"
    )
    assert crs == "EPSG:5070"
    assert out_t[0] == 90.0 and out_t[4] == -90.0
    bounds = geo.raster_bounds(out_t, *merged.shape)
    assert geo.aligned_pixel_grids(bounds, [target_t, out_t])
    assert round(float(merged.mean())) == 7


def test_roundtrip_mean_preservation_5070():
    """4326 -> 5070 -> 4326 with average keeps the mean (lossy but unbiased)."""
    transform = (0.001, 0.0, -93.60, 0.0, -0.001, 42.05)
    px = _smooth_tile(60, 80, transform, lambda x, y: 100 + 10 * np.sin(30 * x) * np.cos(17 * y))
    m = np.ma.masked_array(px)
    once, t1 = warp.reproject_raster(m, transform, "EPSG:4326", "EPSG:5070", "average")
    back, t2 = warp.reproject_raster(once, t1, "EPSG:5070", "EPSG:4326", "average")
    assert round(float(back.mean())) == round(float(m.mean()))


def test_utm_south_roundtrip_and_mirror():
    """EPSG:327xx: same Krüger series with the 10,000,000 m false northing.
    Forward->inverse is identity; by TM symmetry the southern northing of
    -lat equals 1e7 minus the northern northing of +lat."""
    lon = np.array([151.2, 150.8, 148.9])  # zone 56 (Sydney-ish)
    lat = np.array([-33.9, -34.5, -20.0])
    e, n = geo.utm_forward(lon, lat, 56, south=True)
    assert (0 < n).all() and (n < 1e7).all()  # below the false-northing origin
    lon2, lat2 = geo.utm_inverse(e, n, 56, south=True)
    np.testing.assert_allclose(lon2, lon, atol=1e-9)
    np.testing.assert_allclose(lat2, lat, atol=1e-8)
    e_n, n_n = geo.utm_forward(lon, -lat, 56)
    np.testing.assert_allclose(e, e_n, atol=1e-6)
    np.testing.assert_allclose(n, 1e7 - n_n, atol=1e-6)
    # dispatch table accepts 327xx both ways
    x, y = geo.crs_forward("EPSG:32756", lon, lat)
    np.testing.assert_allclose(x, e)
    lon3, lat3 = geo.crs_inverse("EPSG:32756", x, y)
    np.testing.assert_allclose(lon3, lon, atol=1e-9)


def test_reproject_4326_to_utm_south_roundtrip_mean():
    transform = (0.001, 0.0, 150.90, 0.0, -0.001, -33.80)  # NSW tile
    px = _smooth_tile(60, 80, transform,
                      lambda x, y: 120 + 15 * np.sin(6 * x) + 10 * np.cos(9 * y))
    out, out_t = warp.reproject_raster(
        np.ma.masked_array(px), transform, "EPSG:4326", "EPSG:32756", "bilinear"
    )
    assert round(float(out.mean())) == round(float(px.mean()))
    assert 50 < out_t[0] < 200  # meters per pixel


def test_cubic_reproduces_linear_ramp_exactly():
    """Keys cubic convolution reproduces polynomials up to degree 3: a
    linear ramp resampled onto a sub-pixel-shifted grid must come back
    bit-tight in the interior."""
    transform = (0.001, 0.0, -93.60, 0.0, -0.001, 42.05)
    ramp = lambda x, y: 7.0 + 1000.0 * x + 500.0 * y
    px = _smooth_tile(60, 80, transform, ramp)
    shifted = (0.001, 0.0, -93.60 + 0.00037, 0.0, -0.001, 42.05 - 0.00021)
    out, out_t = warp.reproject_raster(
        np.ma.masked_array(px), transform, "EPSG:4326", "EPSG:4326",
        "cubic", align_to=shifted,
    )
    h, w = out.shape
    exp = _smooth_tile(h, w, out_t, ramp)
    interior = ~np.ma.getmaskarray(out)
    interior[:3, :] = interior[-3:, :] = interior[:, :3] = interior[:, -3:] = False
    np.testing.assert_allclose(out.data[interior], exp[interior], rtol=1e-9)


def test_cubic_preserves_mean_smooth_field(elevation_4326):
    px, transform = elevation_4326
    out, _ = warp.reproject_raster(px, transform, "EPSG:4326", "EPSG:5070", "cubic")
    assert round(float(out.mean())) == round(float(px.mean()))


def test_cubic_nodata_renormalizes_and_masks():
    transform = (0.001, 0.0, -93.60, 0.0, -0.001, 42.05)
    px = _smooth_tile(40, 40, transform, lambda x, y: 10 + 100 * x)
    m = np.zeros_like(px, dtype=bool)
    m[15:25, 15:25] = True
    out, _ = warp.reproject_raster(
        np.ma.masked_array(px, mask=m), transform, "EPSG:4326", "EPSG:4326",
        "cubic",
        align_to=(0.001, 0.0, -93.60 + 0.0004, 0.0, -0.001, 42.05 - 0.0004),
    )
    assert np.ma.getmaskarray(out).any()           # hole survives
    assert np.isfinite(out.filled(0)).all()        # no NaN leakage


def test_mode_preserves_categorical_values():
    """mode resampling on a categorical (code) raster emits only source
    codes (no blended values) and picks the majority code per cell when
    downsampling 2x."""
    transform = (0.001, 0.0, -93.60, 0.0, -0.001, 42.05)
    # 3/4 of each 2x2 block is code 7, 1/4 is code 3
    px = np.full((40, 40), 7.0)
    px[::2, ::2] = 3.0
    out, _ = warp.reproject_raster(
        np.ma.masked_array(px), transform, "EPSG:4326", "EPSG:4326",
        "mode",
        align_to=(0.002, 0.0, -93.60, 0.0, -0.002, 42.05),  # 2x coarser
    )
    vals = np.unique(out.compressed())
    assert set(vals).issubset({3.0, 7.0})
    # majority everywhere is 7
    assert (out.compressed() == 7.0).mean() > 0.9


def test_mode_ties_break_to_smallest_and_nodata_masks():
    transform = (0.001, 0.0, -93.60, 0.0, -0.001, 42.05)
    px = np.full((20, 20), 5.0)
    m = np.zeros_like(px, dtype=bool)
    m[0:10, :] = True  # top half nodata
    out, _ = warp.reproject_raster(
        np.ma.masked_array(px, mask=m), transform, "EPSG:4326", "EPSG:4326",
        "mode",
        align_to=(0.001, 0.0, -93.60 + 0.0003, 0.0, -0.001, 42.05 - 0.0003),
    )
    assert np.ma.getmaskarray(out).any()           # hole survives
    assert set(np.unique(out.compressed())).issubset({5.0})


def test_lanczos_reproduces_constant_exactly_and_smooth_mean():
    """Lanczos-3 with wacc renormalization reproduces constants exactly
    (weights normalize out) and preserves the mean of a smooth field."""
    transform = (0.001, 0.0, -93.60, 0.0, -0.001, 42.05)
    const = _smooth_tile(50, 60, transform, lambda x, y: np.full_like(x, 42.5))
    out, _ = warp.reproject_raster(
        np.ma.masked_array(const), transform, "EPSG:4326", "EPSG:4326",
        "lanczos",
        align_to=(0.001, 0.0, -93.60 + 0.00041, 0.0, -0.001, 42.05 - 0.00017),
    )
    interior = ~np.ma.getmaskarray(out)
    np.testing.assert_allclose(out.data[interior], 42.5, rtol=1e-12)

    smooth = _smooth_tile(60, 80, transform,
                          lambda x, y: 120 + 15 * np.sin(40 * x) + 10 * np.cos(55 * y))
    out2, _ = warp.reproject_raster(
        np.ma.masked_array(smooth), transform, "EPSG:4326", "EPSG:5070", "lanczos"
    )
    assert round(float(out2.mean())) == round(float(smooth.mean()))


def test_lanczos_nodata_renormalizes_and_masks():
    transform = (0.001, 0.0, -93.60, 0.0, -0.001, 42.05)
    px = _smooth_tile(40, 40, transform, lambda x, y: 10 + 100 * x)
    m = np.zeros_like(px, dtype=bool)
    m[15:25, 15:25] = True
    out, _ = warp.reproject_raster(
        np.ma.masked_array(px, mask=m), transform, "EPSG:4326", "EPSG:4326",
        "lanczos",
        align_to=(0.001, 0.0, -93.60 + 0.0004, 0.0, -0.001, 42.05 - 0.0004),
    )
    assert np.ma.getmaskarray(out).any()
    assert np.isfinite(out.filled(0)).all()


# ------------------------- Lambert Conformal Conic + register_crs (round 5)


def test_lcc_roundtrip_and_standard_parallel_scale():
    """EPSG:2154 / EPSG:3347 / ESRI:102004: forward∘inverse is identity and
    the conformal scale factor is exactly 1 on both standard parallels
    (Snyder 15-1..15-11 invariants — a wrong n/F/rho0 breaks either)."""
    grids = {
        "EPSG:2154": ((-4.5, 8.0), (41.5, 51.0), 3.0, (44.0, 49.0)),
        "EPSG:3347": ((-120.0, -60.0), (45.0, 75.0), -91.8666666666666667, (49.0, 77.0)),
        "ESRI:102004": ((-120.0, -75.0), (25.0, 49.0), -96.0, (33.0, 45.0)),
    }
    e2 = geo._GRS80_F * (2 - geo._GRS80_F)
    for code, (lo_r, la_r, lon0, parallels) in grids.items():
        LO, LA = np.meshgrid(np.linspace(*lo_r, 25), np.linspace(*la_r, 25))
        x, y = geo.crs_forward(code, LO.ravel(), LA.ravel())
        lo2, la2 = geo.crs_inverse(code, x, y)
        np.testing.assert_allclose(lo2, LO.ravel(), atol=1e-9)
        np.testing.assert_allclose(la2, LA.ravel(), atol=1e-9)
        for latp in parallels:
            p = np.radians(latp)
            m = np.cos(p) / np.sqrt(1 - e2 * np.sin(p) ** 2)
            dlon = 1e-5
            x1, y1 = geo.crs_forward(code, np.array([lon0]), np.array([latp]))
            x2, y2 = geo.crs_forward(code, np.array([lon0 + dlon]), np.array([latp]))
            k = float(np.hypot(x2 - x1, y2 - y1)[0] / (geo._GRS80_A * m * np.radians(dlon)))
            assert abs(k - 1.0) < 1e-8, (code, latp, k)


def test_lcc_natural_origin_is_false_origin():
    """(lon0, lat0) maps exactly to (FE, FN) by construction."""
    x, y = geo.crs_forward("EPSG:2154", np.array([3.0]), np.array([46.5]))
    assert abs(x[0] - 700_000.0) < 1e-6 and abs(y[0] - 6_600_000.0) < 1e-6


def test_reproject_through_lcc_preserves_mean():
    """4326 -> Lambert-93 -> 4326 with average keeps the mean, i.e. the
    registered conic drives the full warp path like any built-in CRS."""
    transform = (0.001, 0.0, 2.2, 0.0, -0.001, 48.9)  # Paris-ish tile
    px = _smooth_tile(60, 80, transform,
                      lambda x, y: 100 + 10 * np.sin(9 * x) * np.cos(11 * y))
    m = np.ma.masked_array(px)
    once, t1 = warp.reproject_raster(m, transform, "EPSG:4326", "EPSG:2154", "average")
    back, _ = warp.reproject_raster(once, t1, "EPSG:2154", "EPSG:4326", "average")
    assert round(float(back.mean())) == round(float(m.mean()))


def test_register_crs_extension_point():
    """A user-registered CRS dispatches like a built-in; unknown codes tell
    the user about the hook."""
    import pytest

    geo.register_crs("EPSG:900914", lambda lo, la: (np.asarray(lo) * 2.0, np.asarray(la) * 3.0),
                     lambda x, y: (np.asarray(x) / 2.0, np.asarray(y) / 3.0))
    try:
        x, y = geo.crs_forward("epsg:900914", np.array([1.0]), np.array([2.0]))
        assert x[0] == 2.0 and y[0] == 6.0
        lo, la = geo.crs_inverse("EPSG:900914", x, y)
        assert lo[0] == 1.0 and la[0] == 2.0
    finally:
        geo._CRS_REGISTRY.pop("900914", None)
    with pytest.raises(ValueError, match="register_crs"):
        geo.crs_forward("EPSG:27572", np.array([0.0]), np.array([0.0]))
    with pytest.raises(ValueError, match="register_crs"):
        geo.crs_inverse("EPSG:27572", np.array([0.0]), np.array([0.0]))


# ---------------- LAEA + Polar Stereographic families (round 5, session 2)


def test_laea_roundtrip_and_equal_area_property():
    """EPSG:3035 / ESRI:102008: forward∘inverse is identity, the projection
    center maps exactly to the false origin, and the Jacobian determinant
    equals the ellipsoidal area element a²(1-e²)cosφ/(1-e²sin²φ)² — the
    defining EQUAL-AREA property (independent of the forward formulas)."""
    grids = {
        "EPSG:3035": ((-10.0, 30.0), (35.0, 70.0)),
        "ESRI:102008": ((-130.0, -70.0), (20.0, 60.0)),
    }
    for code, (lo_r, la_r) in grids.items():
        LO, LA = np.meshgrid(np.linspace(*lo_r, 20), np.linspace(*la_r, 20))
        x, y = geo.crs_forward(code, LO.ravel(), LA.ravel())
        lo2, la2 = geo.crs_inverse(code, x, y)
        np.testing.assert_allclose(lo2, LO.ravel(), atol=1e-9)
        np.testing.assert_allclose(la2, LA.ravel(), atol=1e-9)
    x, y = geo.crs_forward("EPSG:3035", np.array([10.0]), np.array([52.0]))
    assert abs(x[0] - 4_321_000.0) < 1e-6 and abs(y[0] - 3_210_000.0) < 1e-6
    a, f = geo._GRS80_A, geo._GRS80_F
    e2 = f * (2 - f)
    fwd, _ = geo.make_laea(52.0, 10.0)
    h = 1e-6
    for lon, lat in [(5.0, 45.0), (25.0, 60.0), (-3.0, 38.0)]:
        xs, ys = fwd([lon, lon + h, lon], [lat, lat, lat + h])
        det = abs(
            (xs[1] - xs[0]) * (ys[2] - ys[0]) - (ys[1] - ys[0]) * (xs[2] - xs[0])
        ) / np.radians(h) ** 2
        s = np.sin(np.radians(lat))
        expect = a * a * (1 - e2) * np.cos(np.radians(lat)) / (1 - e2 * s * s) ** 2
        assert abs(det / expect - 1) < 1e-5, (lon, lat)


def test_polar_stereo_roundtrip_and_conformality():
    """EPSG:3413 (north) / EPSG:3976 (south): identity roundtrips over each
    polar cap, the pole maps to the origin, the local scale is isotropic
    (h == k — the defining CONFORMAL property) and equals 1 on the standard
    parallel."""
    for code, la_r, pole in [("EPSG:3413", (60.0, 89.5), 90.0),
                             ("EPSG:3976", (-89.5, -55.0), -90.0)]:
        LO, LA = np.meshgrid(np.linspace(-180, 180, 25), np.linspace(*la_r, 15))
        x, y = geo.crs_forward(code, LO.ravel(), LA.ravel())
        lo2, la2 = geo.crs_inverse(code, x, y)
        dlon = np.abs((lo2 - LO.ravel() + 180) % 360 - 180)
        assert dlon.max() < 1e-9 and np.abs(la2 - LA.ravel()).max() < 1e-9
        x, y = geo.crs_forward(code, np.array([0.0]), np.array([pole]))
        assert abs(x[0]) < 1e-6 and abs(y[0]) < 1e-6
    a, f = geo._GRS80_A, geo._GRS80_F
    e2 = f * (2 - f)
    fwd, _ = geo.make_polar_stereo(70.0, -45.0)
    h = 1e-6
    for lon, lat in [(30.0, 75.0), (-120.0, 65.0), (0.0, 70.0)]:
        xs, ys = fwd([lon, lon + h, lon], [lat, lat, lat + h])
        s = np.sin(np.radians(lat))
        nu = a / np.sqrt(1 - e2 * s * s)
        rho_m = a * (1 - e2) / (1 - e2 * s * s) ** 1.5
        k = np.hypot(xs[1] - xs[0], ys[1] - ys[0]) / np.radians(h) / (
            nu * np.cos(np.radians(lat)))
        hh = np.hypot(xs[2] - xs[0], ys[2] - ys[0]) / np.radians(h) / rho_m
        assert abs(hh / k - 1) < 1e-5, (lon, lat)
        if lat == 70.0:
            assert abs(k - 1.0) < 1e-6  # scale 1 on the standard parallel


def test_reproject_through_laea_preserves_mean():
    """4326 -> ETRS89-LAEA -> 4326 with average keeps the mean — the
    registered equal-area system drives the full warp path."""
    transform = (0.001, 0.0, 9.8, 0.0, -0.001, 52.2)  # central-Europe tile
    px = _smooth_tile(60, 80, transform,
                      lambda x, y: 100 + 10 * np.sin(9 * x) * np.cos(11 * y))
    m = np.ma.masked_array(px)
    once, t1 = warp.reproject_raster(m, transform, "EPSG:4326", "EPSG:3035", "average")
    back, _ = warp.reproject_raster(once, t1, "EPSG:3035", "EPSG:4326", "average")
    assert round(float(back.mean())) == round(float(m.mean()))


def test_tm_osgb_worked_example_and_roundtrip():
    """make_tm on the Airy 1830 ellipsoid (EPSG:27700, British National
    Grid): the Ordnance Survey worked example (OSGB36 52°39'27.2531"N,
    1°43'4.5177"E -> E 651409.903, N 313177.270, "A guide to coordinate
    systems in Great Britain" annex C) reproduces to < 2 mm, the true
    origin (49N, 2W) maps exactly to (FE 400000, FN -100000), and
    forward∘inverse is identity over the GB grid."""
    lat = 52 + 39 / 60 + 27.2531 / 3600
    lon = 1 + 43 / 60 + 4.5177 / 3600
    E, N = geo.crs_forward("EPSG:27700", np.array([lon]), np.array([lat]))
    assert abs(E[0] - 651409.903) < 2e-3
    assert abs(N[0] - 313177.270) < 2e-3
    E0, N0 = geo.crs_forward("EPSG:27700", np.array([-2.0]), np.array([49.0]))
    assert abs(E0[0] - 400_000.0) < 1e-6 and abs(N0[0] + 100_000.0) < 1e-6
    LO, LA = np.meshgrid(np.linspace(-7.0, 1.9, 25),
                         np.linspace(50.0, 60.5, 25))
    x, y = geo.crs_forward("EPSG:27700", LO.ravel(), LA.ravel())
    lo2, la2 = geo.crs_inverse("EPSG:27700", x, y)
    np.testing.assert_allclose(lo2, LO.ravel(), atol=1e-9)
    np.testing.assert_allclose(la2, LA.ravel(), atol=1e-9)


def test_tm_matches_utm_special_case():
    """make_tm with UTM's parameters (k0=0.9996, FE=500km, zone meridian,
    WGS84, lat0=0) must agree with the dispatch-table utm_forward to
    sub-micrometer — the general TM is a strict superset."""
    fwd, inv = geo.make_tm(0.0, -105.0)  # zone 13N central meridian
    LO, LA = np.meshgrid(np.linspace(-107.9, -102.1, 15),
                         np.linspace(25.0, 49.0, 15))
    e1, n1 = fwd(LO.ravel(), LA.ravel())
    e2, n2 = geo.utm_forward(LO.ravel(), LA.ravel(), zone=13)
    np.testing.assert_allclose(e1, e2, atol=1e-6)
    np.testing.assert_allclose(n1, n2, atol=1e-6)


def test_tm_conformality_scale_on_central_meridian():
    """On the central meridian the TM scale factor equals k0 exactly
    (definitional for the projection — a wrong meridian-offset or series
    breaks it)."""
    fwd, _ = geo.make_tm(49.0, -2.0, 0.9996012717, 400_000.0, -100_000.0,
                         a=6_377_563.396, flat=1 / 299.3249646)
    flat = 1 / 299.3249646
    e2 = flat * (2 - flat)
    for latp in (50.0, 54.0, 58.0):
        dlon = 1e-6
        x1, y1 = fwd(np.array([-2.0]), np.array([latp]))
        x2, y2 = fwd(np.array([-2.0 + dlon]), np.array([latp]))
        p = np.radians(latp)
        m = np.cos(p) / np.sqrt(1 - e2 * np.sin(p) ** 2)
        k = float(np.hypot(x2 - x1, y2 - y1)[0]
                  / (6_377_563.396 * m * np.radians(dlon)))
        assert abs(k - 0.9996012717) < 1e-7, (latp, k)


def test_reproject_through_tm_preserves_mean():
    """4326 -> British National Grid -> 4326 with average keeps the mean:
    the registered TM drives the full warp path like any built-in CRS."""
    transform = (0.001, 0.0, -1.5, 0.0, -0.001, 53.4)  # Midlands tile
    px = _smooth_tile(60, 80, transform,
                      lambda x, y: 100 + 10 * np.sin(9 * x) * np.cos(11 * y))
    m = np.ma.masked_array(px)
    once, t1 = warp.reproject_raster(m, transform, "EPSG:4326",
                                     "EPSG:27700", "average")
    back, _ = warp.reproject_raster(once, t1, "EPSG:27700",
                                    "EPSG:4326", "average")
    assert round(float(back.mean())) == round(float(m.mean()))
