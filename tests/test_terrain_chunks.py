"""Unit tests for the round-4 continuation operators: Horn terrain kernels,
sliding-window chunk math, patch-grid pooling tie-breaks, proximity argmin."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from demeter_ray.functions import terrain


def test_horn_gradients_known_window():
    # plane z = 2x + 3y (x = col * xres, y = row * yres, +row = south):
    # dzdx = 2 exactly; dzdy (south-positive) = 3 exactly
    xres = yres = 5.0
    r = np.arange(5, dtype=np.float64)[:, None]
    c = np.arange(5, dtype=np.float64)[None, :]
    z = 2.0 * c * xres + 3.0 * r * yres
    dzdx, dzdy = terrain.horn_gradients(z, xres, yres)
    assert dzdx.shape == (3, 3)
    assert np.allclose(dzdx, 2.0) and np.allclose(dzdy, 3.0)


def test_horn_rows_matches_2d():
    rng = np.random.default_rng(7)
    z = rng.uniform(0, 100, size=(8, 12))
    full = terrain.horn_gradients(z, 30.0, 30.0)
    rows = terrain.horn_gradients_rows(z[:-2], z[1:-1], z[2:], 30.0, 30.0)
    assert np.array_equal(full[0], rows[0]) and np.array_equal(full[1], rows[1])


def test_aspect_conventions():
    # slope rising to the east (dzdx > 0) faces WEST (270 deg)
    assert terrain.aspect_deg(np.array([1.0]), np.array([0.0]))[0] == 270.0
    # rising to the south (dzdy > 0, south-positive) faces NORTH (0 deg)
    assert terrain.aspect_deg(np.array([0.0]), np.array([1.0]))[0] == 0.0
    # flat cell -> -1 sentinel
    assert terrain.aspect_deg(np.array([0.0]), np.array([0.0]))[0] == -1.0


def test_hillshade_flat_and_clamp():
    # flat terrain: hs = 255 * cos(zen) regardless of azimuth
    hs = terrain.hillshade(np.array([0.0]), np.array([0.0]), 315.0, 45.0)
    assert np.isclose(hs[0], 255.0 * np.cos(np.radians(45.0)))
    # a steep slope facing away from the sun clamps at 0, never negative
    hs2 = terrain.hillshade(np.array([-50.0]), np.array([-50.0]), 315.0, 45.0)
    assert hs2[0] == 0.0


def test_slope_degrees_bounds():
    dzdx = np.array([0.0, 1e9])
    s = terrain.slope_deg(dzdx, np.zeros(2))
    assert s[0] == 0.0 and 89.9 < s[1] < 90.0


def test_chunk_counts_and_offsets():
    # mirror the chunk_documents_overlap math at C=64, S=48
    C, S = 64, 48
    for ntok, expect in [(1, 1), (48, 1), (49, 2), (64, 2), (96, 2), (97, 3)]:
        nchunks = (ntok - 1) // S + 1
        assert nchunks == expect, (ntok, nchunks, expect)
        starts = np.arange(nchunks) * S
        lens = np.minimum(starts + C, ntok) - starts
        assert lens[0] == min(C, ntok)
        assert (lens >= 1).all() and starts[-1] < ntok


def test_chunk_expand_first_tokens():
    # the pyarrow list-offset gather picks the right first token per chunk
    from demeter_ray.pipelines.oracle_text import chunk_documents_overlap  # noqa: F401

    text = " ".join(f"w{i}" for i in range(100))  # 100 tokens -> 3 chunks
    toks = pc.split_pattern(pa.array([text]), pattern=" ")
    offs = toks.offsets.to_numpy(zero_copy_only=False)
    firsts = [toks.values[offs[0] + s].as_py() for s in (0, 48, 96)]
    assert firsts == ["w0", "w48", "w96"]


def test_patch_argmax_tie_prefers_lowest_index():
    # np.argmax returns the FIRST max -> lowest (py,px), matching the SQL
    # ROW_NUMBER ORDER BY pmean DESC, py, px tie-break
    flat = np.zeros((1, 16))
    flat[0, 5] = flat[0, 9] = 7.0
    assert np.argmax(flat, axis=1)[0] == 5


def test_proximity_argmin_tie_prefers_lowest_target():
    # equidistant targets: first min in tnode-sorted order wins
    tr = np.array([0, 4], dtype=np.int64)
    tc = np.array([2, 2], dtype=np.int64)
    d2 = (2 - tr) ** 2 + (2 - tc) ** 2  # both 4
    assert d2[0] == d2[1] and np.argmin(d2) == 0


def test_phash_int_matches_float_off_ties():
    # the integer-exact phash agrees with the float variant except at exact
    # block==grand-mean ties (where only the integer form is deterministic)
    from demeter_ray.functions import codec

    ids = np.arange(0, 2000, dtype=np.int64)
    px4 = codec.generate_pixels_batch(ids, 16, 16)
    a = codec.phash64_batch(px4)
    b = codec.phash64_int_batch(px4)
    s = (
        px4.astype(np.int64).reshape(len(ids), 8, 2, 8, 2, 3).sum(axis=(2, 4, 5))
    )
    ties = (s * 64 == s.sum(axis=(1, 2))[:, None, None]).any(axis=(1, 2))
    assert np.array_equal(a[~ties], b[~ties])
    assert ties.any()  # the fixture genuinely exercises the tie path


def test_flip_phash_hamming_symmetry():
    from demeter_ray.functions import codec

    ids = np.arange(10, dtype=np.int64)
    px4 = codec.generate_pixels_batch(ids, 16, 16)
    ph = codec.phash64_int_batch(px4)
    phf = codec.phash64_int_batch(px4[:, :, ::-1, :])
    # flipping twice is the identity
    ph2 = codec.phash64_int_batch(px4[:, :, ::-1, :][:, :, ::-1, :])
    assert np.array_equal(ph, ph2)
    x = np.bitwise_xor(ph.view(np.uint64), phf.view(np.uint64))
    ham = np.unpackbits(x.view(np.uint8).reshape(len(ids), 8), axis=1).sum(axis=1)
    assert ((0 <= ham) & (ham <= 64)).all()


def test_haversine_zero_and_known_distance():
    # 1 degree of longitude at the equator ~ 111.19 km on the 6371 km sphere
    lat = np.array([0.0])
    dlmb = np.radians(np.array([1.0])) / 2.0
    a = np.cos(np.radians(lat)) * np.cos(np.radians(lat)) * np.sin(dlmb) * np.sin(dlmb)
    d = 2.0 * 6371000.0 * np.arcsin(np.sqrt(a))
    assert abs(d[0] - 111194.9) < 1.0


def test_str_packing_math():
    # STR constants: n=10k, L=64 -> P=157 leaves, S=13 slices of 770,
    # 13 leaves per slice; every point lands in exactly one leaf
    n, L = 10_000, 64
    P = (n + L - 1) // L
    S = int(np.ceil(np.sqrt(float(P))))
    ssz = (n + S - 1) // S
    lps = (ssz + L - 1) // L
    assert (P, S, ssz, lps) == (157, 13, 770, 13)
    xrank = np.arange(n)
    sl = xrank // ssz
    assert sl.max() == S - 1
    # within a full slice, yrank 0..769 packs into 13 leaves of <=64
    yr = np.arange(ssz)
    leaves, counts = np.unique(yr // L, return_counts=True)
    assert len(leaves) == lps and counts.max() <= L


def test_density_kernel_exact():
    # one point at bin (5,5): 9 output bins with the binomial weights /16
    KW = np.array([[1, 2, 1], [2, 4, 2], [1, 2, 1]])
    assert KW.sum() == 16
    dens = KW / 16.0
    assert dens[1, 1] == 0.25 and dens[0, 0] == 0.0625  # dyadic-exact


def test_point_segment_distance_clamps():
    # interior projection, clamped-to-endpoint, and on-segment cases
    x1, y1, x2, y2 = 0.0, 0.0, 10.0, 0.0
    for px, py, want in [(5.0, 3.0, 9.0), (-4.0, 3.0, 25.0), (7.0, 0.0, 0.0)]:
        t = min(max(((px - x1) * (x2 - x1) + (py - y1) * (y2 - y1))
                    / ((x2 - x1) ** 2 + (y2 - y1) ** 2), 0.0), 1.0)
        dx, dy = px - (x1 + t * (x2 - x1)), py - (y1 + t * (y2 - y1))
        assert dx * dx + dy * dy == want


def test_rle_vectorized_runs():
    # one row with runs [1,1,0,1,0,0,1,1,1]: runs of 2, 1, 3 -> 6 masked
    mask = np.array([[1, 1, 0, 1, 0, 0, 1, 1, 1]], dtype=bool)
    m = np.concatenate([mask, np.zeros((1, 1), bool)], axis=1).ravel()
    starts = np.flatnonzero(m & ~np.r_[False, m[:-1]])
    ends = np.flatnonzero(~m & np.r_[False, m[:-1]])
    lens = ends - starts
    assert list(lens) == [2, 1, 3] and lens.sum() == 6


def test_hist_equalize_uniform_identity():
    # a perfectly uniform histogram equalizes to (cdf*255)//n with cdf
    # steps of n/256 -> ev spans 0..255 monotonically
    v = np.tile(np.arange(256, dtype=np.int64), 3)[None, :]  # 768 px uniform
    codes = (np.arange(1)[:, None] * 256 + v).ravel()
    hist = np.bincount(codes, minlength=256).reshape(1, 256)
    cdf = np.cumsum(hist, axis=1)
    ev = (np.take_along_axis(cdf, v, axis=1) * 255) // 768
    assert ev.min() == 0 and ev.max() == 255
    assert (np.diff(ev[0, :256]) >= 0).all()


def test_bilinear_sampling_known_values():
    from demeter_ray.stages.sample import sample_tiles_at_bilinear
    from demeter_ray.functions import geo

    # 2x2 tile [[0,10],[20,30]], 1-deg pixels anchored at (0, 2): value at
    # the exact center of the four pixels = mean 15; at a pixel center = the
    # pixel value; outside coverage = NaN
    px = np.array([[0.0, 10.0], [20.0, 30.0]])
    tf = (1.0, 0.0, 0.0, 0.0, -1.0, 2.0)
    tiles = [("t", px, tf, float("nan"), geo.raster_bounds(tf, 2, 2))]
    v = sample_tiles_at_bilinear(tiles, np.array([1.0, 0.5, 5.0]),
                                 np.array([1.0, 1.5, 1.0]))
    assert v[0] == 15.0 and v[1] == 0.0 and np.isnan(v[2])


def test_bilinear_nodata_renormalizes():
    from demeter_ray.stages.sample import sample_tiles_at_bilinear
    from demeter_ray.functions import geo

    # nodata corner drops out; remaining three weights renormalize
    px = np.array([[0.0, 10.0], [20.0, -9.0]])
    tf = (1.0, 0.0, 0.0, 0.0, -1.0, 2.0)
    tiles = [("t", px, tf, -9.0, geo.raster_bounds(tf, 2, 2))]
    v = sample_tiles_at_bilinear(tiles, np.array([1.0]), np.array([1.0]))
    assert np.isclose(v[0], (0.0 + 10.0 + 20.0) * 0.25 / 0.75)


def test_morphology_erosion_subset_of_mask():
    # erosion <= mask <= dilation per row on the polygonize fixture formula
    W, THR = 64, 35
    cc = np.arange(W)[None, :]
    rr = np.arange(W)[:, None]
    mask = (cc * cc * 13 + rr * rr * 7 + cc * rr * 3) % 100 < THR
    padded = np.zeros((W + 2, W + 2), bool)
    padded[1:-1, 1:-1] = mask
    stacks = [padded[1 + dr:W + 1 + dr, 1 + dc:W + 1 + dc]
              for dr in (-1, 0, 1) for dc in (-1, 0, 1)]
    ero = np.logical_and.reduce(stacks)
    dil = np.logical_or.reduce(stacks)
    assert (ero <= mask).all() and (mask <= dil).all()


def test_sat_carry_decomposition():
    # SAT = cumsum_c(column sums above the stripe) + stripe-local 2D cumsum
    rng = np.random.default_rng(3)
    v = rng.integers(0, 1000, size=(12, 9)).astype(np.int64)
    full = np.cumsum(np.cumsum(v, axis=1), axis=0)
    for r0 in (0, 4, 8):
        stripe = v[r0:r0 + 4]
        carry = np.cumsum(v[:r0].sum(axis=0)) if r0 else np.zeros(9, np.int64)
        local = np.cumsum(np.cumsum(stripe, axis=1), axis=0)
        assert np.array_equal(full[r0:r0 + 4], local + carry[None, :])


def test_tile_cover_separating_axis():
    # unit right triangle vs two boxes: one overlapping, one fully outside
    # every edge half-plane must contain >= 1 box corner for an overlap
    verts = np.array([[0.0, 0.0], [2.0, 0.0], [0.0, 2.0]])
    def overlaps(bx0, by0, bx1, by1):
        corners = [(bx0, by0), (bx1, by0), (bx0, by1), (bx1, by1)]
        n = len(verts)
        for i in range(n):
            x1, y1 = verts[i]
            x2, y2 = verts[(i + 1) % n]
            if not any((x2 - x1) * (cy - y1) - (y2 - y1) * (cx - x1) >= 0.0
                       for cx, cy in corners):
                return False
        return True
    assert overlaps(0.5, 0.5, 1.5, 1.5)          # crosses the hypotenuse
    assert not overlaps(1.6, 1.6, 2.5, 2.5)      # beyond the hypotenuse
    assert overlaps(-0.5, -0.5, 0.1, 0.1)        # corner touch
