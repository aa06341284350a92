"""Unit tests for the pure numpy kernels (no Ray needed)."""

import numpy as np
import pandas as pd
import pytest

from demeter_ray.functions import codec, depth, geo, hashing, text


# ---------------------------------------------------------------- geo: affine
def test_affine_rowcol_floor():
    # 10m north-up grid like the reference merge fixtures
    # (/root/reference/tests/raster/utils/test_merge.py:92-116)
    t = (10.0, 0.0, -176010.0, 0.0, -10.0, 2390250.0)
    rows, cols = geo.affine_rowcol(t, [-176005.0, -176001.0], [2390245.0, 2390241.0])
    assert rows.tolist() == [0, 0] and cols.tolist() == [0, 0]
    rows, cols = geo.affine_rowcol(t, [-176000.0], [2390240.0])
    assert rows.tolist() == [1] and cols.tolist() == [1]


def test_align_bounds_to_transform_snaps_outward_with_tolerance():
    t = (10.0, 0.0, -176010.0, 0.0, -10.0, 2390250.0)
    # bounds mid-pixel expand outward (reference test_merge.py:319-330 style)
    b = geo.align_bounds_to_transform((-176005.0, 2390215.0, -175975.0, 2390235.0), t)
    assert b == (-176010.0, 2390210.0, -175970.0, 2390240.0)
    # exactly-on-grid: top-left (tolerant floor) stays; bottom-right (plain
    # floor) expands one pixel — matches rasterio rowcol + offset="lr" as the
    # reference composes them (transform.py:19-40)
    b = geo.align_bounds_to_transform((-176000.0, 2390220.0, -175980.0, 2390240.0), t)
    assert b == (-176000.0, 2390210.0, -175970.0, 2390240.0)
    # *just* above/left of a pixel boundary snaps down/right (float tolerance)
    eps = 1e-9
    b = geo.align_bounds_to_transform(
        (-176000.0 - eps, 2390225.0, -175985.0, 2390240.0 + eps), t
    )
    assert b[0] == -176000.0 and b[3] == 2390240.0


def test_aligned_pixel_grids():
    bounds = (-176010.0, 2390220.0, -175980.0, 2390250.0)
    t1 = (10.0, 0.0, -176010.0, 0.0, -10.0, 2390250.0)
    t2 = (10.0, 0.0, -176000.0, 0.0, -10.0, 2390240.0)  # same grid, offset tiles
    t3 = (10.0, 0.0, -176009.0, 0.0, -10.0, 2390249.0)  # fractional offset
    assert geo.aligned_pixel_grids(bounds, [t1, t2])
    assert not geo.aligned_pixel_grids(bounds, [t1, t3])


def test_bounds_snapped_to_grid():
    out = geo.bounds_snapped_to_grid(
        {"minx": [-102.3, -102.3], "miny": [36.1, 36.1], "maxx": [-101.2, -101.2], "maxy": [36.9, 36.9]}
    )
    assert out.tolist() == [[-103, 36, -101, 37]]


# ---------------------------------------------------------------- geo: cells
def test_cell_ids_and_parents():
    lons = np.array([-102.0, 0.0, 179.9])
    lats = np.array([36.0, 0.0, 89.9])
    cx, cy = geo.cell_xy(lons, lats, 10)
    assert (cx >= 0).all() and (cx < 1024).all()
    cid = geo.cell_id(lons, lats, 10)
    parent = geo.cell_parent_id(cid, 5)
    cx5, cy5 = geo.cell_xy(lons, lats, 5)
    assert (parent == geo.cell_id_from_xy(cx5, cy5)).all()
    # bounds round-trip: a cell's center maps back into the same cell
    left, bottom, right, top = geo.cell_bounds(int(cx[0]), int(cy[0]), 10)
    mid = geo.cell_id([(left + right) / 2], [(bottom + top) / 2], 10)
    assert mid[0] == cid[0]


def test_cover_bbox():
    gx, gy = geo.cover_bbox(-102.2, 36.0, -101.9, 36.2, 10)
    assert len(gx) >= 1
    # every cell of the cover intersects the bbox
    for x, y in zip(gx, gy):
        l, b, r, t = geo.cell_bounds(int(x), int(y), 10)
        assert r >= -102.2 and l <= -101.9 and t >= 36.0 and b <= 36.2


# ------------------------------------------------------------------ geo: wkb
def test_wkb_roundtrip_polygon_and_multipolygon():
    square = np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0]])
    hole = np.array([[1.0, 1.0], [1.0, 2.0], [2.0, 2.0], [2.0, 1.0]])
    buf = geo.wkb_from_rings([square, hole])
    polys = geo.parse_wkb(buf)
    assert len(polys) == 1 and len(polys[0]) == 2
    np.testing.assert_array_equal(polys[0][0][:-1], square)

    multi = geo.wkb_from_polygons([[square], [square + 10.0]])
    polys = geo.parse_wkb(multi)
    assert len(polys) == 2
    assert geo.polygon_bounds(polys) == (0.0, 0.0, 14.0, 14.0)


# ------------------------------------------------------------------ geo: PIP
def test_points_in_polygon_with_hole():
    square = np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0], [0.0, 0.0]])
    hole = np.array([[1.0, 1.0], [1.0, 2.0], [2.0, 2.0], [2.0, 1.0], [1.0, 1.0]])
    xs = np.array([2.0, 1.5, 3.5, -1.0, 5.0])
    ys = np.array([3.0, 1.5, 0.5, 2.0, 2.0])
    got = geo.points_in_polygon(xs, ys, [[square, hole]])
    assert got.tolist() == [True, False, True, False, False]


def test_points_in_convex_matches_even_odd():
    rng = np.random.RandomState(3)
    quad = np.array([[0.0, 0.0], [5.0, 1.0], [6.0, 5.0], [1.0, 4.0]])  # CCW convex
    xs = rng.uniform(-1, 7, 500)
    ys = rng.uniform(-1, 6, 500)
    a = geo.points_in_convex_polygon(xs, ys, quad)
    b = geo.points_in_polygon(xs, ys, [[np.vstack([quad, quad[:1]])]])
    assert (a == b).all()


def test_polygon_index_min_id_and_all_pairs():
    sq = lambda x0, y0, s: np.array(
        [[x0, y0], [x0 + s, y0], [x0 + s, y0 + s], [x0, y0 + s], [x0, y0]]
    )
    ids = [10, 3, 7]
    wkbs = [
        geo.wkb_from_rings([sq(0.0, 0.0, 2.0)]),
        geo.wkb_from_rings([sq(1.0, 1.0, 2.0)]),  # overlaps first
        geo.wkb_from_rings([sq(10.0, 10.0, 1.0)]),
    ]
    index = geo.PolygonIndex(ids, wkbs, res=16)
    lons = np.array([1.5, 0.5, 10.5, 50.0])
    lats = np.array([1.5, 0.5, 10.5, 50.0])
    got = index.query_min_id(lons, lats)
    assert got.tolist() == [3, 10, 7, -1]  # overlap -> min id; outside -> -1
    pt_idx, poly_ids = index.query_all(lons, lats)
    pairs = sorted(zip(pt_idx.tolist(), poly_ids.tolist()))
    assert pairs == [(0, 3), (0, 10), (1, 10), (2, 7)]


def test_centroid_knn():
    knn = geo.CentroidKNN([5, 1, 9], [0.0, 10.0, 20.0], [0.0, 0.0, 0.0])
    ids, d2 = knn.query([1.0, 11.0, 100.0], [0.0, 0.0, 0.0])
    assert ids.tolist() == [5, 1, 9]
    assert d2.tolist() == [1.0, 1.0, 6400.0]


# --------------------------------------------------------------------- codec
def test_codec_lossless_roundtrip_and_lossy_psnr():
    px = codec.generate_pixels(42, 64, 48)
    assert px.shape == (48, 64, 3)
    raw = codec.encode(px, "png")
    np.testing.assert_array_equal(codec.decode(raw), px)
    lossy = codec.encode(px, "djpg", q=4)
    rec = codec.decode(lossy)
    assert codec.psnr(px, rec) >= 40.0  # north-rule invariant
    assert codec.psnr(px, px) == float("inf")


def test_phash_stable_and_discriminative():
    a = codec.phash64(codec.generate_pixels(1, 64, 64))
    a2 = codec.phash64(codec.generate_pixels(1, 64, 64))
    b = codec.phash64(codec.generate_pixels(999, 64, 64))
    assert a == a2
    assert isinstance(a, int)
    # lossy-decoded image stays phash-close to the original
    px = codec.generate_pixels(7, 64, 64)
    rec = codec.decode(codec.encode(px, "djpg", q=4))
    d = hashing.hamming64(np.array([codec.phash64(rec)]), codec.phash64(px))
    assert d[0] <= 4


# ------------------------------------------------------------------- hashing
def test_minhash_estimates_jaccard():
    th = hashing.TokenHasher()
    a = th.hash_tokens([f"tok{i}" for i in range(100)])
    b = th.hash_tokens([f"tok{i}" for i in range(50, 150)])
    sa = hashing.minhash_signature(a, 128)
    sb = hashing.minhash_signature(b, 128)
    est = float((sa == sb).mean())
    true_j = 50 / 150
    assert abs(est - true_j) < 0.12
    # identical sets -> identical signatures -> identical band keys
    assert hashing.minhash_bands(sa, 16) == hashing.minhash_bands(
        hashing.minhash_signature(a, 128), 16
    )


def test_simhash_similar_texts_close():
    th = hashing.TokenHasher()
    t1 = th.hash_tokens("the quick brown fox jumps over the lazy dog".split())
    t2 = th.hash_tokens("the quick brown fox jumps over a lazy dog".split())
    t3 = th.hash_tokens("completely different words entirely here now".split())
    h1, h2, h3 = hashing.simhash64(t1), hashing.simhash64(t2), hashing.simhash64(t3)
    d12 = hashing.hamming64(np.array([h1]), h2)[0]
    d13 = hashing.hamming64(np.array([h1]), h3)[0]
    assert d12 < d13


def test_rolling_fingerprints_deterministic_and_shared():
    f1 = set(hashing.rolling_fingerprints("abcdefghijklmnop" * 4))
    f2 = set(hashing.rolling_fingerprints("abcdefghijklmnop" * 4))
    f3 = set(hashing.rolling_fingerprints("XXXX" + "abcdefghijklmnop" * 4))
    assert f1 == f2
    assert len(f1 & f3) > 0  # shared substrings -> shared fingerprints


# --------------------------------------------------------------------- depth
def test_depth_selection_semantics():
    d = depth.STANDARD_DEPTHS
    assert depth.select_including(d, 0, 100) == [(0, 5), (5, 15), (15, 30), (30, 60), (60, 100)]
    # mid-layer start includes the containing layer (depth_enum.py:41-47)
    assert depth.select_including(d, 10, 40) == [(5, 15), (15, 30), (30, 60)]
    with pytest.raises(ValueError):
        depth.select_between(d, 10, 100)  # 10 is not a layer start
    with pytest.raises(ValueError):
        depth.select_including(d, 0, 300)
    with pytest.raises(ValueError):
        depth.select_including(d, 50, 50)


def test_clipped_weights_and_weighted_mean():
    layers = [(5, 15), (15, 30), (30, 60)]
    w = depth.clipped_weights(layers, 10, 40)
    assert w.tolist() == [5.0, 15.0, 10.0]  # end layers clipped (polaris.py:258-265)
    stack = np.array([[[1.0]], [[2.0]], [[4.0]]])
    got = depth.weighted_mean_stack(stack, w)
    assert got[0][0] == pytest.approx((5 * 1 + 15 * 2 + 10 * 4) / 30)


def test_weighted_average_ignore_missing():
    assert depth.weighted_average_ignore_missing([1.0, np.nan, 3.0], [1, 1, 1]) == 2.0
    assert depth.weighted_average_ignore_missing([np.nan, np.nan], [1, 1]) is None


def test_stddev_from_percentiles():
    p5 = np.array([[[10.0]]])
    p95 = np.array([[[0.0]]])
    got = depth.weighted_stddev_from_percentiles(p5, p95, np.array([1.0]))
    assert float(got[0][0]) == pytest.approx(10.0 / 3.29)


def test_carbon_math():
    assert depth.carbon_stock_mean(np.array([2.0]), np.array([3.0]))[0] == 6.0
    got = depth.carbon_stock_stddev(2.0, 0.5, 3.0, 0.1)
    expected = np.sqrt(0.25 * 0.01 + 0.25 * 9.0 + 0.01 * 4.0)
    assert got == pytest.approx(expected)


# ---------------------------------------------------------------------- text
def test_text_kernels():
    q = text.quality_features("The quick brown fox, it jumps!")
    assert q["n_words"] == 6
    assert q["punct_ratio"] > 0
    assert 0 < q["stopword_ratio"] < 1
    assert text.token_counts(["a b c", "x"]).tolist() == [3, 1]
    assert text.detect_language("the thing and the other thing") == "en"
    assert text.jaccard(set("abc"), set("abd")) == pytest.approx(2 / 4)
    assert text.jaccard(set(), set()) == 1.0


# ---------------------------------------------------- scenes / crs / cover
def test_scene_filename_parsers():
    from demeter_ray.functions import scenes

    m = scenes.SafeMetadata.from_filename(
        "S2B_MSIL2A_20240901T172859_N0511_R055_T14TMM_20240901T215725.SAFE"
    )
    assert m.tile_id == "14TMM" and m.datatake_timestamp == "20240901T172859"
    assert m.utm_zone == "14" and m.crs == "EPSG:32614"
    r = scenes.RasterMetadata.from_filename("T14TMM_20240901T172859_B02_10m.jp2")
    assert r.band == "B02" and r.resolution == "10m"
    with pytest.raises(ValueError):
        scenes.SafeMetadata.from_filename("garbage.txt")


def test_min_tile_cover_exact():
    from demeter_ray.functions.scenes import min_tile_cover

    tiles = {
        "a": (0.0, 0.0, 2.0, 2.0),
        "b": (1.0, 0.0, 3.0, 2.0),  # redundant with a+c
        "c": (2.0, 0.0, 4.0, 2.0),
        "d": (0.0, 0.0, 4.0, 1.0),
    }
    # target covered by a+c (2 tiles); b alone insufficient; d too short
    assert min_tile_cover(tiles, (0.2, 0.2, 3.8, 1.8)) == ["a", "c"]
    # single-tile cover wins over pairs
    assert min_tile_cover(tiles, (1.2, 0.2, 2.8, 1.8)) == ["b"]
    with pytest.raises(ValueError):
        min_tile_cover(tiles, (0.0, 0.0, 10.0, 10.0))


def test_flow_direction_decode():
    from demeter_ray.functions.scenes import decode_flow_direction

    cat = decode_flow_direction([0, 1, 64, 128, 7])
    assert list(cat[:4]) == ["SINK", "E", "N", "NE"]
    assert pd.isna(cat[4])  # unknown code
    assert list(cat.categories) == ["SINK", "E", "SE", "S", "SW", "W", "NW", "N", "NE"]


def test_utm_roundtrip_and_zone():
    lon = np.array([-102.1, -101.8, -97.3])
    lat = np.array([36.1, 36.4, 40.0])
    e, n = geo.utm_forward(lon, lat, 14)
    # zone-14 central meridian at -99: west points have easting < 500km
    assert (e[:2] < 500000).all() and e[2] > 500000
    lon2, lat2 = geo.utm_inverse(e, n, 14)
    np.testing.assert_allclose(lon2, lon, atol=1e-9)
    np.testing.assert_allclose(lat2, lat, atol=1e-8)
    assert geo.utm_zone_for([-102.0, 0.5]).tolist() == [14, 31]


def test_om_log10_conversion(tiny_fixtures):
    import pyarrow.parquet as pq

    from demeter_ray.stages.depthagg import estimate_carbon_stock

    tiles = pq.read_table(f"{tiny_fixtures}/raster_tiles.parquet")
    lin, _, _ = estimate_carbon_stock(tiles, 0, 30, om_is_log10=False)
    log, _, _ = estimate_carbon_stock(tiles, 0, 30, om_is_log10=True)
    # conversion is 10**om applied before the SOC scale -> strictly different
    i, j = np.argwhere(~np.ma.getmaskarray(lin))[0]
    assert log[i, j] != lin[i, j]


def test_crs_dispatch_unknown_epsg_raises():
    """Unknown EPSG codes fail loudly with the supported set listed — never
    a silent passthrough (VERDICT r2 #8)."""
    import numpy as np
    import pytest

    from demeter_ray.functions import geo

    for fn in (geo.crs_forward, geo.crs_inverse):
        # EPSG:27572 (Lambert zone II, legacy NTF datum) is NOT registered
        with pytest.raises(ValueError, match="EPSG:5070"):
            fn("EPSG:27572", np.array([0.0]), np.array([0.0]))
    # supported codes still dispatch
    x, y = geo.crs_forward("EPSG:4269", np.array([1.0]), np.array([2.0]))
    assert x[0] == 1.0 and y[0] == 2.0


def test_webmercator_known_values_and_roundtrip():
    """EPSG:3857: the world edge maps to +/-20037508.342789244 m (the web
    tiling constant) and forward/inverse roundtrips to float precision."""
    edge = 20037508.342789244
    x, y = geo.crs_forward("EPSG:3857", np.array([180.0, 0.0]), np.array([0.0, 85.051128779806592]))
    np.testing.assert_allclose(x[0], edge, rtol=1e-12)
    np.testing.assert_allclose(y[1], edge, rtol=1e-9)
    assert y[0] == 0.0 and x[1] == 0.0
    lon = np.array([-122.42, 2.35, 151.21])
    lat = np.array([37.77, 48.86, -33.87])
    lon2, lat2 = geo.crs_inverse("EPSG:3857", *geo.crs_forward("EPSG:3857", lon, lat))
    np.testing.assert_allclose(lon2, lon, atol=1e-9)
    np.testing.assert_allclose(lat2, lat, atol=1e-9)
    # out-of-band latitude clamps to the square-world edge, as web tiling does
    _, yc = geo.crs_forward("EPSG:3857", np.array([0.0]), np.array([89.9]))
    np.testing.assert_allclose(yc[0], edge, rtol=1e-9)
