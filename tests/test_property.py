"""Property-based tests (hypothesis) for the pure-function cores.

These cover the invariants unit truth-tables can't sweep: random shapes,
random payloads, random grids.  All targets are pure numpy functions — no
Ray session needed — so examples stay millisecond-fast.
"""

import duckdb
import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from demeter_ray.functions import codec, geo
from demeter_ray.pipelines.relational import duck_round
from demeter_ray.stages.merge import merge_tiles

SET = dict(max_examples=40, deadline=None)


# ------------------------------------------------------------------ codec

@given(idx=st.integers(0, 2**31), w=st.integers(1, 24), h=st.integers(1, 24),
       q=st.integers(1, 16))
@settings(**SET)
def test_codec_roundtrip(idx, w, h, q):
    px = codec.generate_pixels(idx, w, h)
    # lossless: exact
    assert np.array_equal(codec.decode(codec.encode(px, "png")), px)
    # lossy: midpoint reconstruction error bounded by the quant step
    rec = codec.decode(codec.encode(px, "djpg", q=q))
    err = np.abs(rec.astype(np.int64) - px.astype(np.int64))
    assert err.max() <= (q + 1) // 2 + q // 2  # floor(v/q)*q + q//2 bound
    assert codec.header_dims(codec.encode(px, "djpg", q=q)) == (w, h)


@given(idx=st.integers(0, 2**31), w=st.integers(8, 16), h=st.integers(8, 16))
@settings(**SET)
def test_codec_batch_matches_scalar(idx, w, h):
    batch = codec.generate_pixels_batch(np.array([idx, idx + 1]), w, h)
    assert np.array_equal(batch[0], codec.generate_pixels(idx, w, h))
    blobs = codec.encode_batch(batch, "png")
    dec = codec.decode_batch(blobs, w, h)
    assert np.array_equal(dec, batch)


# ------------------------------------------------------------------ geo

@given(
    lon=st.floats(12.0, 18.0), lat=st.floats(-70.0, 75.0),
)
@settings(**SET)
def test_utm_roundtrip(lon, lat):
    x, y = geo.crs_forward("EPSG:32633", np.array([lon]), np.array([lat]))
    lon2, lat2 = geo.crs_inverse("EPSG:32633", x, y)
    assert abs(lon2[0] - lon) < 1e-6 and abs(lat2[0] - lat) < 1e-6


@given(lon=st.floats(-120.0, -75.0), lat=st.floats(25.0, 49.0))
@settings(**SET)
def test_albers_roundtrip(lon, lat):
    x, y = geo.crs_forward("EPSG:5070", np.array([lon]), np.array([lat]))
    lon2, lat2 = geo.crs_inverse("EPSG:5070", x, y)
    assert abs(lon2[0] - lon) < 1e-6 and abs(lat2[0] - lat) < 1e-6


@given(
    minx=st.floats(-179.0, 178.0), miny=st.floats(-89.0, 88.0),
    dx=st.floats(0.01, 5.0), dy=st.floats(0.01, 5.0),
    fx=st.floats(0.0, 1.0), fy=st.floats(0.0, 1.0),
    res=st.integers(2, 8),
)
@settings(**SET)
def test_cover_bbox_contains_interior_points(minx, miny, dx, dy, fx, fy, res):
    """Any point inside a bbox maps to a cell present in the bbox's cover."""
    maxx, maxy = min(minx + dx, 179.9), min(miny + dy, 89.9)
    px = minx + (maxx - minx) * fx
    py = miny + (maxy - miny) * fy
    cxs, cys = geo.cover_bbox(minx, miny, maxx, maxy, res)
    cover = set(geo.cell_id_from_xy(cxs, cys).tolist())
    cid = int(geo.cell_id(np.array([px]), np.array([py]), res)[0])
    assert cid in cover


@given(
    n=st.integers(3, 10), seed=st.integers(0, 10**6),
)
@settings(**SET)
def test_pip_convex_agreement(n, seed):
    """Ray-crossing PIP agrees with the independent convex half-plane test
    on random convex polygons (two implementations cross-validate)."""
    rng = np.random.RandomState(seed)
    ang = np.sort(rng.uniform(0, 2 * np.pi, n))
    if len(np.unique(ang)) < 3:
        return
    r = rng.uniform(0.5, 2.0)
    vx, vy = r * np.cos(ang), r * np.sin(ang)
    ring = np.c_[np.r_[vx, vx[:1]], np.r_[vy, vy[:1]]]
    xs = rng.uniform(-2.5, 2.5, 200)
    ys = rng.uniform(-2.5, 2.5, 200)
    # stay clear of edges: boundary pixels may legitimately differ
    d = np.min(np.hypot(xs[:, None] - ring[None, :-1, 0],
                        ys[:, None] - ring[None, :-1, 1]), axis=1)
    keep = d > 0.05
    a = geo.points_in_ring(xs[keep], ys[keep], ring)
    b = geo.points_in_convex_polygon(xs[keep], ys[keep], ring)
    disagree = a != b
    if disagree.any():
        # tolerate only near-edge numerical disagreement
        from demeter_ray.functions.geo import points_in_ring as pir
        bad_x, bad_y = xs[keep][disagree], ys[keep][disagree]
        for bx, by in zip(bad_x, bad_y):
            eps = 1e-9
            votes = [pir(np.array([bx + ex]), np.array([by + ey]), ring)[0]
                     for ex in (-eps, eps) for ey in (-eps, eps)]
            assert len(set(votes)) > 1, (bx, by)


@given(seed=st.integers(0, 10**6), n=st.integers(1, 4))
@settings(**SET)
def test_wkb_roundtrip(seed, n):
    rng = np.random.RandomState(seed)
    polys = []
    for _ in range(n):
        k = rng.randint(3, 8)
        ang = np.sort(rng.uniform(0, 2 * np.pi, k))
        ring = np.c_[np.cos(ang), np.sin(ang)] * rng.uniform(0.5, 3.0)
        ring = np.r_[ring, ring[:1]]
        polys.append([ring])
    buf = geo.wkb_from_polygons(polys)
    parsed = geo.parse_wkb(buf)
    assert len(parsed) == n
    for orig, got in zip(polys, parsed):
        assert np.allclose(orig[0], got[0])


# ------------------------------------------------------------------ merge

@given(seed=st.integers(0, 10**6),
       method=st.sampled_from(["min", "max", "sum", "count", "mean"]))
@settings(**SET)
def test_merge_reduction_matches_numpy(seed, method):
    """Stacked same-grid tiles reduce exactly like numpy masked reductions."""
    rng = np.random.RandomState(seed)
    h, w, k = rng.randint(2, 6), rng.randint(2, 6), rng.randint(2, 5)
    nodata = -9999.0
    stack = rng.uniform(0, 10, (k, h, w)).round(3)
    mask = rng.rand(k, h, w) < 0.3
    stack[mask] = nodata
    transform = (1.0, 0.0, 0.0, 0.0, -1.0, float(h))
    tiles = [(f"t{i}", stack[i], transform, nodata, (0.0, 0.0, float(w), float(h)))
             for i in range(k)]
    out, _, _ = merge_tiles(tiles, method=method)
    ma = np.ma.masked_equal(stack, nodata)
    want = {
        "min": ma.min(axis=0), "max": ma.max(axis=0), "sum": ma.sum(axis=0),
        "mean": ma.mean(axis=0),
        "count": (~ma.mask).sum(axis=0),
    }[method]
    if method == "count":
        assert np.array_equal(np.asarray(out.filled(0), dtype=np.int64),
                              np.asarray(want, dtype=np.int64))
    else:
        want_f = np.ma.filled(want.astype(np.float64), np.nan)
        got_f = np.where(out.mask, np.nan, np.asarray(out))
        assert np.allclose(got_f, want_f, equal_nan=True, atol=1e-9)


# ------------------------------------------------------------------ round

@given(vals=st.lists(st.floats(-1e6, 1e6, allow_nan=False), min_size=1,
                     max_size=50),
       k=st.integers(0, 4))
@settings(max_examples=25, deadline=None)
def test_duck_round_matches_duckdb(vals, k):
    con = duckdb.connect()
    got = duck_round(np.array(vals), k)
    import pandas as pd
    want = con.execute(
        "SELECT ROUND(v, ?) AS r FROM (SELECT UNNEST(?) AS v)", [k, vals]
    ).df()["r"].to_numpy()
    assert np.allclose(got, want, rtol=0, atol=0, equal_nan=True)


@given(seed=st.integers(0, 2**31), w=st.integers(1, 20), h=st.integers(1, 20),
       c=st.sampled_from([1, 3, 4]), ft=st.sampled_from([0, 1, 2]))
@settings(**SET)
def test_real_png_roundtrip_property(seed, w, h, c, ft):
    """Arbitrary uint8 payloads survive the REAL PNG bitstream exactly, for
    every encoder filter type and channel count."""
    from demeter_ray.functions import png

    px = np.random.default_rng(seed).integers(0, 256, (h, w, c), np.uint8)
    buf = png.encode_png(px, filter_type=ft)
    assert np.array_equal(png.decode_png(buf), px)
    assert png.png_dims(buf) == (w, h)
    assert png.png_frame_size(buf) == len(buf)


@given(seed=st.integers(0, 2**31), w=st.integers(1, 20), h=st.integers(1, 20),
       c=st.sampled_from([1, 3]))
@settings(max_examples=25, deadline=None)
def test_real_jpeg_roundtrip_property(seed, w, h, c):
    """Arbitrary uint8 payloads (noise — the worst case) survive the REAL
    baseline JPEG bitstream at PSNR >= 40 dB; header dims and frame
    delimiting stay exact."""
    from demeter_ray.functions import jpeg

    px = np.random.default_rng(seed).integers(0, 256, (h, w, c), np.uint8)
    buf = jpeg.encode_jpeg(px)
    out = jpeg.decode_jpeg(buf)
    assert out.shape == (h, w, c)
    assert codec.psnr(out, px) >= 40.0
    assert jpeg.jpeg_dims(buf) == (w, h)
    assert jpeg.jpeg_frame_size(buf) == len(buf)


@given(seed=st.integers(0, 2**31), w=st.integers(1, 40), h=st.integers(1, 40),
       c=st.sampled_from([1, 3]), ri=st.integers(0, 9),
       sub=st.sampled_from(["444", "420"]))
@settings(max_examples=30, deadline=None)
def test_jpeg_restart_and_subsampling_property(seed, w, h, c, ri, sub):
    """Restart segmentation NEVER changes decoded pixels (any interval, any
    sampling mode, any shape), and every stream self-delimits exactly."""
    from demeter_ray.functions import jpeg

    px = np.random.default_rng(seed).integers(0, 256, (h, w, c), np.uint8)
    base = jpeg.decode_jpeg(jpeg.encode_jpeg(px, subsampling=sub))
    buf = jpeg.encode_jpeg(px, restart_interval=ri, subsampling=sub)
    assert np.array_equal(jpeg.decode_jpeg(buf), base)
    assert jpeg.jpeg_dims(buf) == (w, h)
    assert jpeg.jpeg_frame_size(buf) == len(buf)


@given(seed=st.integers(0, 2**31), w=st.integers(1, 24), h=st.integers(1, 24),
       depth=st.sampled_from([1, 2, 4, 8]), interlaced=st.booleans(),
       trns_len=st.integers(0, 4))
@settings(max_examples=30, deadline=None)
def test_png_paletted_foreign_decode_property(seed, w, h, depth, interlaced, trns_len):
    """Hand-assembled paletted PNGs (any bit depth, Adam7 or not, with or
    without tRNS) decode to exactly the palette lookup."""
    import struct
    import zlib

    from demeter_ray.functions import png

    rng = np.random.default_rng(seed)
    ncol = 1 << depth
    pal = rng.integers(0, 256, (ncol, 3), np.uint8)
    idx = rng.integers(0, ncol, (h, w), np.uint8)
    trns = rng.integers(0, 256, trns_len, np.uint8)

    def pack_rows(sub):
        ph, pw = sub.shape
        if depth == 8:
            return b"".join(b"\x00" + sub[y].tobytes() for y in range(ph))
        shifts = np.arange(depth - 1, -1, -1)[None, :]
        rows = []
        for y in range(ph):
            bits = ((sub[y][:, None] >> shifts) & 1).astype(np.uint8).reshape(-1)
            pad = (-len(bits)) % 8
            rows.append(b"\x00" + np.packbits(
                np.concatenate([bits, np.zeros(pad, np.uint8)])).tobytes())
        return b"".join(rows)

    if interlaced:
        passes = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
                  (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]
        scan = b"".join(
            pack_rows(idx[y0::dy, x0::dx]) for x0, y0, dx, dy in passes
            if idx[y0::dy, x0::dx].size
        )
    else:
        scan = pack_rows(idx)
    ihdr = struct.pack(">IIBBBBB", w, h, depth, 3, 0, 0, int(interlaced))
    chunks = [(b"PLTE", pal.tobytes())]
    if trns_len:
        chunks.append((b"tRNS", trns.tobytes()))
    chunks.append((b"IDAT", zlib.compress(scan)))
    buf = png.PNG_SIG + png._chunk(b"IHDR", ihdr)
    for t, d in chunks:
        buf += png._chunk(t, d)
    buf += png._chunk(b"IEND", b"")

    out = png.decode_png(buf)
    if trns_len:
        assert out.shape == (h, w, 4)
        alpha = np.full(ncol, 255, np.uint8)
        alpha[:min(trns_len, ncol)] = trns[:ncol]
        assert np.array_equal(out[:, :, 3], alpha[idx])
    else:
        assert out.shape == (h, w, 3)
    assert np.array_equal(out[:, :, :3], pal[idx])
