"""Deterministic synthetic fixture tables (FIXTURES.md).

Everything is a pure function of ids (seed 42 via modular integer arithmetic
or ``RandomState`` seeded by id) — no wall clock, no RNG state shared across
tables — so any worker, any process, any scale regenerates byte-identical
tables.  Mirrors the reference's fixture shapes:

- images: BASELINE.json input_hint schema + derived lon/lat (geo-points)
- fields: SSURGO mupolygon/mapunit stand-in (ssurgo.py:20-41)
- components/horizons/fragments: the SSURGO dim tables (ssurgo.py:42-108),
  with planted tie / null / interval-edge cases
- raster_tiles: tiled raster table (Raster + 1-degree tiling,
  raster/__init__.py:11-34, polaris.py:57-58) with 2-px identical overlap
  strips and one planted conflicting-overlap pair
- points/depths: sampling probes + static depth dim

Tables cache to /tmp/demeter_ray_fixtures/<scale>/ as parquet; generation is
idempotent (skips existing files).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from demeter_ray.functions import codec, geo
from demeter_ray.functions.depth import STANDARD_DEPTHS

# the fixture geography: a 0.5 x 0.5 degree agricultural window
LON0, LON1 = -102.2, -101.7
LAT0, LAT1 = 36.0, 36.5

SCALES = {
    # n_images, fields_grid (g x g), image sizes
    "tiny": dict(n_images=60, grid=3, sizes=(32, 48, 64)),
    "small": dict(n_images=20_000, grid=6, sizes=(32, 48, 64)),
    "bench": dict(n_images=60_000, grid=6, sizes=(32, 48, 64)),
}

FIXTURE_ROOT = "/tmp/demeter_ray_fixtures"
FIXTURE_VERSION = "16"


def fixture_dir(scale: str) -> str:
    return os.path.join(FIXTURE_ROOT, scale)


# ----------------------------------------------------------------- images


def _mix(i: np.ndarray, mult: int, mod: int) -> np.ndarray:
    return (i.astype(np.int64) * mult) % mod


def image_lonlat(i: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic geo-point per image index.  Even indices pile into the
    westernmost strip (one hot cell prefix — the skew/salting case,
    FIXTURES.md §1); odd indices spread over the full window, which leaves
    ~20%% outside the field polygons (anti-join rows)."""
    i = np.asarray(i, dtype=np.int64)
    u = _mix(i, 2654435761, 1_000_003) / 1_000_003.0
    v = _mix(i, 40503, 999_983) / 999_983.0
    hot = i % 2 == 0
    lon = np.where(hot, LON0 + u * 0.05, LON0 + u * (LON1 - LON0))
    lat = np.where(hot, LAT0 + v * 0.05, LAT0 + v * (LAT1 - LAT0))
    return lon, lat


def make_images(n: int, sizes=(32, 48, 64)) -> pa.Table:
    idx = np.arange(n, dtype=np.int64)
    # ~1% planted exact duplicates: i % 100 == 99 re-uses the pixels (and
    # dimensions) of i-1, so the pair shares a phash
    src = np.where(idx % 100 == 99, idx - 1, idx)
    w = np.array([sizes[int(s) % len(sizes)] for s in src], dtype=np.int32)
    h = np.array([sizes[(int(s) + 1) % len(sizes)] for s in src], dtype=np.int32)
    # even -> real PNG (lossless path at full scale); odd -> lossy: a
    # deterministic 1-in-20 slice carries REAL baseline JPEG bitstreams
    # (functions/jpeg.py), the rest the SQL-recomputable DJPG stand-in —
    # the documented real-codec/throughput split (SURVEY.md codec note)
    fmt = np.where(idx % 2 == 0, "png", np.where(idx % 20 == 1, "jpeg", "djpg"))
    blobs = []
    phashes = np.empty(n, dtype=np.int64)
    for k in range(n):
        px = codec.generate_pixels(int(src[k]), int(w[k]), int(h[k]))
        blobs.append(codec.encode(px, str(fmt[k])))
        phashes[k] = codec.phash64(px)
    lon, lat = image_lonlat(idx)
    cell = geo.cell_id(lon, lat, 12)
    captions = [f"field scene {int(i)} tile {int(c)}" for i, c in zip(idx, cell)]
    return pa.table(
        {
            "image_id": pa.array([f"img{int(i):012d}" for i in idx], pa.string()),
            "bytes": pa.array(blobs, pa.binary()),
            "w": pa.array(w, pa.int32()),
            "h": pa.array(h, pa.int32()),
            "fmt": pa.array(fmt, pa.string()),
            "caption": pa.array(captions, pa.string()),
            "phash": pa.array(phashes, pa.int64()),
            "lon": pa.array(lon, pa.float64()),
            "lat": pa.array(lat, pa.float64()),
        }
    )


# ----------------------------------------------------------------- fields


def field_quad(gx: int, gy: int, grid: int) -> np.ndarray:
    """Convex quad filling ~80% of grid cell (gx, gy), corners jittered
    deterministically."""
    cw = (LON1 - LON0) / grid
    ch = (LAT1 - LAT0) / grid
    x0 = LON0 + gx * cw
    y0 = LAT0 + gy * ch
    rng = np.random.RandomState(42 + gx * 97 + gy * 131)
    jit = rng.uniform(0.0, 0.08, size=8)
    mx, my = cw * 0.05, ch * 0.05
    return np.array(
        [
            [x0 + mx + jit[0] * cw, y0 + my + jit[1] * ch],
            [x0 + cw - mx - jit[2] * cw, y0 + my + jit[3] * ch],
            [x0 + cw - mx - jit[4] * cw, y0 + ch - my - jit[5] * ch],
            [x0 + mx + jit[6] * cw, y0 + ch - my - jit[7] * ch],
        ]
    )


def make_fields(grid: int) -> pa.Table:
    """grid x grid field polygons: mostly convex quads, every 7th an L-shaped
    concave polygon, every 11th a two-part MultiPolygon, every 13th pair
    overlapping (tie cases for min-key assignment)."""
    keys, syms, names, wkbs = [], [], [], []
    k = 0
    for gy in range(grid):
        for gx in range(grid):
            mukey = 100001 + k
            quad = field_quad(gx, gy, grid)
            if k % 11 == 5:
                # multipart: two half-size quads, NW + SE
                c = quad.mean(axis=0)
                q1 = (quad - c) * 0.45 + c + np.array([-0.02, 0.02]) * (LON1 - LON0) / grid
                q2 = (quad - c) * 0.45 + c + np.array([0.02, -0.02]) * (LON1 - LON0) / grid
                wkb = geo.wkb_from_polygons([[q1], [q2]])
            elif k % 7 == 3:
                # concave L-shape: quad minus its NE quarter
                x0, y0 = quad[0]
                x1 = quad[1][0]
                y2 = quad[2][1]
                xm = (x0 + x1) / 2
                ym = (y0 + y2) / 2
                ring = np.array(
                    [[x0, y0], [x1, y0], [x1, ym], [xm, ym], [xm, y2], [x0, y2], [x0, y0]]
                )
                wkb = geo.wkb_from_rings([ring])
            elif k % 13 == 0 and gx + 1 < grid:
                # overlap case: stretch east into the neighbor cell
                quad = quad.copy()
                quad[1][0] += 0.15 * (LON1 - LON0) / grid
                quad[2][0] += 0.15 * (LON1 - LON0) / grid
                wkb = geo.wkb_from_rings([quad])
            else:
                wkb = geo.wkb_from_rings([quad])
            keys.append(mukey)
            syms.append(f"Mu{chr(65 + k % 26)}{k % 10}")
            names.append(f"Map unit {mukey} silty clay loam")
            wkbs.append(wkb)
            k += 1
    return pa.table(
        {
            "map_unit_key": pa.array(keys, pa.int64()),
            "map_unit_symbol": pa.array(syms, pa.string()),
            "map_unit_name": pa.array(names, pa.string()),
            "geom_wkb": pa.array(wkbs, pa.binary()),
            "crs": pa.array(["EPSG:4326"] * len(keys), pa.string()),
        }
    )


# ------------------------------------------------- soil dimension tables


def make_components(mukeys) -> pa.Table:
    """Per map unit 1-3 components.  Planted cases (FIXTURES.md §3):
    mukey%5==0 -> two majcompflag='Yes' components tying on max comppct_r;
    mukey%7==3 -> only majcompflag='No' rows (left-join null case);
    else one clear major + minor rows."""
    rows = []
    kinds = ["Series", "Taxadjunct", None]
    drains = ["Well drained", "Poorly drained", None]
    for mk in mukeys:
        mk = int(mk)
        base = mk * 10
        if mk % 5 == 0:
            rows.append((base + 1, mk, 45, "Yes", f"Comp{base+1}", kinds[mk % 3], drains[mk % 3]))
            rows.append((base + 2, mk, 45, "Yes", f"Comp{base+2}", kinds[(mk + 1) % 3], drains[(mk + 1) % 3]))
            rows.append((base + 3, mk, 10, "No", f"Comp{base+3}", None, None))
        elif mk % 7 == 3 or mk % 10 == 3:  # %10 guarantees a case at tiny scale
            rows.append((base + 1, mk, 60, "No", f"Comp{base+1}", kinds[mk % 3], None))
            rows.append((base + 2, mk, 40, "No", f"Comp{base+2}", None, drains[mk % 3]))
        else:
            rows.append((base + 1, mk, 50 + mk % 30, "Yes", f"Comp{base+1}", kinds[mk % 3], drains[mk % 3]))
            rows.append((base + 2, mk, 30, "Yes", f"Comp{base+2}", kinds[(mk + 2) % 3], drains[(mk + 2) % 3]))
            rows.append((base + 3, mk, 20 - mk % 15, "No", f"Comp{base+3}", None, None))
    cols = list(zip(*rows))
    return pa.table(
        {
            "component_key": pa.array(cols[0], pa.int64()),
            "map_unit_key": pa.array(cols[1], pa.int64()),
            "comppct_r": pa.array(cols[2], pa.int32()),
            "majcompflag": pa.array(cols[3], pa.string()),
            "compname": pa.array(cols[4], pa.string()),
            "compkind": pa.array(cols[5], pa.string()),
            "drainagecl": pa.array(cols[6], pa.string()),
        }
    )


_BOUNDARIES = [0, 5, 15, 30, 60, 100, 150, 200]


def make_horizons(cokeys) -> pa.Table:
    """Contiguous depth layers 0-200 per component with deterministic
    properties.  Planted: om_r null when chkey%4==1; claytotal_r all-null for
    cokey%9==0 (all-masked -> None case, ssurgo.py:289-297)."""
    rows = []
    for ck in cokeys:
        ck = int(ck)
        n_layers = 3 + ck % 4  # 3..6 layers
        bounds = _BOUNDARIES[: n_layers + 1]
        for li in range(n_layers):
            chkey = ck * 100 + li
            top, bot = bounds[li], bounds[li + 1]
            om = None if chkey % 4 == 1 else round(0.5 + (chkey % 37) * 0.1, 2)
            clay = None if ck % 9 == 0 else round(10.0 + (chkey % 23), 2)
            sand = round(20.0 + (chkey % 41), 2)
            silt = None if chkey % 11 == 2 else round(15.0 + (chkey % 31), 2)
            bd = round(1.1 + (chkey % 7) * 0.08, 3)
            fraggt10 = float(chkey % 5)
            frag3to10 = float(chkey % 7)
            sieveno10 = round(80.0 + (chkey % 20), 1)
            rows.append((chkey, ck, top, bot, fraggt10, frag3to10, sieveno10, sand, silt, clay, om, bd))
    cols = list(zip(*rows))
    return pa.table(
        {
            "horizon_key": pa.array(cols[0], pa.int64()),
            "component_key": pa.array(cols[1], pa.int64()),
            "hzdept_r": pa.array(cols[2], pa.int32()),
            "hzdepb_r": pa.array(cols[3], pa.int32()),
            "fraggt10_r": pa.array(cols[4], pa.float64()),
            "frag3to10_r": pa.array(cols[5], pa.float64()),
            "sieveno10_r": pa.array(cols[6], pa.float64()),
            "sandtotal_r": pa.array(cols[7], pa.float64()),
            "silttotal_r": pa.array(cols[8], pa.float64()),
            "claytotal_r": pa.array(cols[9], pa.float64()),
            "om_r": pa.array(cols[10], pa.float64()),
            "dbovendry_r": pa.array(cols[11], pa.float64()),
        }
    )


def make_fragments(chkeys) -> pa.Table:
    """0-3 fragment rows per horizon; null fragkind rows are summed in volume
    but excluded from the kind aggregation (ssurgo.py:231-240)."""
    kinds = ["Gravel", "Cobbles", "Stones", None]
    rows = []
    for ch in chkeys:
        ch = int(ch)
        for j in range(ch % 3):
            rows.append((ch, round(2.0 + (ch + j) % 9, 1), float(5 + j), kinds[(ch + j) % 4]))
    if not rows:
        rows.append((int(chkeys[0]), 1.0, 5.0, "Gravel"))
    cols = list(zip(*rows))
    return pa.table(
        {
            "horizon_key": pa.array(cols[0], pa.int64()),
            "fragvol_r": pa.array(cols[1], pa.float64()),
            "fragsize_r": pa.array(cols[2], pa.float64()),
            "fragkind": pa.array(cols[3], pa.string()),
        }
    )


# ------------------------------------------------------------ raster tiles

TILE_PX = 64  # interior pixels per tile side
TILE_DEG = 0.1
RES_DEG = TILE_DEG / TILE_PX
OVERLAP_PX = 2  # identical shared strip (usgs/utils.py:59-62 note)
N_TILES = 5  # 5x5 tiles cover the window


def elevation_value(gcol: np.ndarray, grow: np.ndarray) -> np.ndarray:
    """Deterministic global elevation field, reproducible in SQL:
    ((gcol*31 + grow*17) % 1000) / 10.0"""
    return (((gcol * 31 + grow * 17) % 1000) / 10.0).astype(np.float64)


def catchment_value(gcol: np.ndarray, grow: np.ndarray) -> np.ndarray:
    """Deterministic global catchment-code field (blocky, 32-px cells keyed
    by tile id) — the same function the per-tile 'cat' rasters evaluate."""
    tx = gcol // TILE_PX
    ty = N_TILES - 1 - grow // TILE_PX
    lcol = gcol % TILE_PX
    lrow = grow % TILE_PX
    return ((tx * N_TILES + ty) * 7 + (lrow + lcol) // 32) % 11 + 1


def fac_value(gcol: np.ndarray, grow: np.ndarray) -> np.ndarray:
    """Deterministic flow-accumulation field (SQL-recomputable):
    ((gcol*11 + grow*23) % 5000) / 4.0"""
    return (((gcol * 11 + grow * 23) % 5000) / 4.0).astype(np.float64)


def fdr_value(gcol: np.ndarray, grow: np.ndarray) -> np.ndarray:
    """Deterministic D8 flow-direction codes 2^k (k from 8-px blocks) —
    the decode_flow_direction categorical domain (usgs/constants.py:14-24)."""
    return (2 ** ((gcol // 8 + grow // 8) % 8)).astype(np.int64)


def soil_value(gcol, grow, dataset: str, stat: str, depth_top: int) -> np.ndarray:
    """Smooth deterministic soil property per (dataset, statistic, depth).
    p5/p95 are the mean +/- 0.5 (consistent percentile semantics; their
    spread drives the stddev-from-percentiles path)."""
    dshift = {"om": 0, "bd": 1000}[dataset]
    base = ((gcol * 13 + grow * 7 + dshift + depth_top * 29) % 500) / 100.0
    if stat == "p50":  # median sits just off the mean (skewed distribution)
        return base + 0.05
    if stat == "mode":  # quantized to 0.25 steps (discrete-peak semantics)
        return np.floor(base * 4.0) / 4.0
    return base + (0.5 if stat == "p5" else 0.0) - (0.5 if stat == "p95" else 0.0)


def _tile_transform(tx: int, ty: int) -> list[float]:
    # north-up; top of tile ty is LAT0 + (ty+1)*TILE_DEG
    return [RES_DEG, 0.0, LON0 + tx * TILE_DEG, 0.0, -RES_DEG, LAT0 + (ty + 1) * TILE_DEG]


def _tile_pixels(tx: int, ty: int, fn) -> np.ndarray:
    """Tile raster with OVERLAP_PX extra columns/rows shared with the east /
    south neighbors, values from the shared global function (identical in the
    overlap)."""
    w = TILE_PX + (OVERLAP_PX if tx + 1 < N_TILES else 0)
    h = TILE_PX + (OVERLAP_PX if ty > 0 else 0)
    gcol = tx * TILE_PX + np.arange(w, dtype=np.int64)[None, :]
    # global row 0 = top of window (ty = N_TILES-1)
    grow = (N_TILES - 1 - ty) * TILE_PX + np.arange(h, dtype=np.int64)[:, None]
    return fn(gcol + 0 * grow, grow + 0 * gcol)


def make_raster_tiles() -> pa.Table:
    """One row per (dataset, statistic, depth, tile).  Datasets:
    - elevation: float32, hole-free (oracle-checked sampling path)
    - om/bd x mean/p5/p95 x 6 depths: float32 with planted nodata holes;
      the (om, mean, depth 0) pair of tiles (0,0)/(1,0) gets a conflicting
      overlap value (+1) to exercise the overlap warning (merge.py:353-378)
    - cat: int32 catchment codes with NaN-free but sentinel nodata -9999
    - misaligned: deliberately offset grid (no-resample error case)
    """
    rows = []

    def add(dataset, stat, dtop, dbot, tx, ty, px, nodata, dtype, transform=None):
        t = transform or _tile_transform(tx, ty)
        h, w = px.shape
        bounds = geo.raster_bounds(t, h, w)
        rows.append(
            dict(
                dataset=dataset,
                statistic=stat,
                depth_top_cm=dtop,
                depth_bottom_cm=dbot,
                tile_id=f"{tx}_{ty}",
                band=1,
                h=h,
                w=w,
                dtype=dtype,
                nodata=nodata,
                transform=t,
                crs="EPSG:4326",
                # tile envelope as flat columns so windowed reads can push
                # the bbox predicate into the parquet scan (S5 / "prune at
                # the read")
                minx=bounds[0], miny=bounds[1], maxx=bounds[2], maxy=bounds[3],
                pixels=px.astype(dtype).tobytes(),
            )
        )

    for tx in range(N_TILES):
        for ty in range(N_TILES):
            add("elevation", None, None, None, tx, ty,
                _tile_pixels(tx, ty, elevation_value), float("nan"), "float32")
            for ds in ("om", "bd"):
                for stat in ("mean", "p5", "p95", "p50", "mode"):
                    for dtop, dbot in STANDARD_DEPTHS:
                        # nodata holes planted in GLOBAL pixel coordinates so
                        # overlap strips stay value-identical across tiles
                        def gen(c, r, ds=ds, stat=stat, dt=dtop):
                            v = soil_value(c, r, ds, stat, dt)
                            return np.where((c + r + dt) % 89 == 0, np.nan, v)

                        px = _tile_pixels(tx, ty, gen).astype(np.float64)
                        if ds == "om" and stat == "mean" and dtop == 0 and (tx, ty) == (1, 0):
                            px[:, :OVERLAP_PX] += 1.0  # conflicting overlap
                        add(ds, stat, dtop, dbot, tx, ty, px, float("nan"), "float32")
            lr, lc = np.indices((TILE_PX, TILE_PX))
            cat = catchment_value(tx * TILE_PX + lc, (N_TILES - 1 - ty) * TILE_PX + lr)
            add("cat", None, None, None, tx, ty, cat, -9999.0, "int32")
            # fac/fdr hydrography companions (api.py:183-206 samples all
            # three of cat/fac/fdr per point)
            gc = tx * TILE_PX + lc
            gr = (N_TILES - 1 - ty) * TILE_PX + lr
            add("fac", None, None, None, tx, ty, fac_value(gc, gr),
                float("nan"), "float32")
            add("fdr", None, None, None, tx, ty, fdr_value(gc, gr),
                -9999.0, "int32")
    # misaligned dataset: one tile on a grid shifted by 0.3 px
    t = _tile_transform(0, 0)
    t[2] += RES_DEG * 0.3
    add("misaligned", None, None, None, 0, 0,
        _tile_pixels(0, 0, elevation_value), float("nan"), "float32", transform=t)
    # UTM-projected elevation (EPSG:32613): one tile covering the window in
    # meters — the reprojection test target (FIXTURES.md §6 note).  value =
    # ((col*31 + row*17) % 1000) / 10 on the UTM pixel grid.
    from demeter_ray.functions import geo as _geo

    # project ALL four window corners: meridian convergence bends the
    # window in UTM, so min/max over corners (+ margin) defines the tile
    ce, cn = _geo.utm_forward(
        np.array([LON0, LON1, LON0, LON1]), np.array([LAT0, LAT0, LAT1, LAT1]), 13
    )
    res_m = 100.0
    e0 = np.array([ce.min() - 2 * res_m])
    n1 = np.array([cn.max() + 2 * res_m])
    uw = int(np.ceil((ce.max() + 2 * res_m - e0[0]) / res_m)) + 1
    uh = int(np.ceil((n1[0] - (cn.min() - 2 * res_m)) / res_m)) + 1
    ucol = np.arange(uw, dtype=np.int64)[None, :]
    urow = np.arange(uh, dtype=np.int64)[:, None]
    upx = (((ucol * 31 + urow * 17) % 1000) / 10.0) + 0 * urow
    utm_t = [res_m, 0.0, float(e0[0]), 0.0, -res_m, float(n1[0])]
    rows.append(
        dict(dataset="elevation_utm", statistic=None, depth_top_cm=None,
             depth_bottom_cm=None, tile_id="u0_0", band=1, h=uh, w=uw,
             dtype="float32", nodata=float("nan"), transform=utm_t,
             crs="EPSG:32613",
             pixels=np.broadcast_to(upx, (uh, uw)).astype("float32").tobytes())
    )

    # EPSG:5070 (CONUS Albers) catchment tile + EPSG:4269 elevation tile:
    # the reference samples hydrography through 5070 (api.py:184) and topo
    # through 4269 (api.py:210); these carry the SAME deterministic global
    # fields evaluated through the projection, so CRS-routed sampling is
    # value-comparable with the EPSG:4326 tiles
    ax, ay = _geo.crs_forward(
        "EPSG:5070", np.array([LON0, LON1, LON0, LON1]), np.array([LAT0, LAT0, LAT1, LAT1])
    )
    ares = 100.0
    ax0, ay1 = float(ax.min() - 2 * ares), float(ay.max() + 2 * ares)
    aw = int(np.ceil((ax.max() + 2 * ares - ax0) / ares)) + 1
    ah = int(np.ceil((ay1 - (ay.min() - 2 * ares)) / ares)) + 1
    albers_t = [ares, 0.0, ax0, 0.0, -ares, ay1]
    pcx = ax0 + (np.arange(aw) + 0.5) * ares
    pcy = ay1 - (np.arange(ah) + 0.5) * ares
    gx, gy = np.meshgrid(pcx, pcy)
    plon, plat = _geo.crs_inverse("EPSG:5070", gx.ravel(), gy.ravel())
    gcol = np.floor((plon - LON0) / RES_DEG).astype(np.int64)
    grow = np.floor((LAT1 - plat) / RES_DEG).astype(np.int64)
    inside = (gcol >= 0) & (gcol < N_TILES * TILE_PX) & (grow >= 0) & (grow < N_TILES * TILE_PX)
    acat = np.full(gcol.shape, -9999, dtype=np.int64)
    # mosaic codes must be globally unique (the per-tile VAT id depends on
    # the tile): code = catchment_value + 16*tile_index, with its own VAT
    # rows under tile_id "a0_0" (make_catchment_vat)
    gi, gr = gcol[inside], grow[inside]
    tidx = (gi // TILE_PX) * N_TILES + (N_TILES - 1 - gr // TILE_PX)
    acat[inside] = catchment_value(gi, gr) + 16 * tidx
    rows.append(
        dict(dataset="cat_albers", statistic=None, depth_top_cm=None,
             depth_bottom_cm=None, tile_id="a0_0", band=1, h=ah, w=aw,
             dtype="int32", nodata=-9999.0, transform=albers_t,
             crs="EPSG:5070", pixels=acat.reshape(ah, aw).astype("int32").tobytes())
    )
    npx = N_TILES * TILE_PX
    ngc, ngr = np.meshgrid(np.arange(npx, dtype=np.int64), np.arange(npx, dtype=np.int64))
    rows.append(
        dict(dataset="elevation_nad83", statistic=None, depth_top_cm=None,
             depth_bottom_cm=None, tile_id="n0_0", band=1,
             h=npx, w=npx, dtype="float32", nodata=float("nan"),
             transform=[RES_DEG, 0.0, LON0, 0.0, -RES_DEG, LAT1],
             crs="EPSG:4269",
             pixels=elevation_value(ngc, ngr).astype("float32").tobytes())
    )

    # every row carries its envelope as flat columns (windowed reads push
    # the bbox predicate into the parquet scan — S5 "prune at the read")
    for r in rows:
        if "minx" not in r:
            b = geo.raster_bounds(tuple(r["transform"]), r["h"], r["w"])
            r["minx"], r["miny"], r["maxx"], r["maxy"] = b
    tbl = {k: [r[k] for r in rows] for k in rows[0]}
    return pa.table(
        {
            "dataset": pa.array(tbl["dataset"], pa.string()),
            "statistic": pa.array(tbl["statistic"], pa.string()),
            "depth_top_cm": pa.array(tbl["depth_top_cm"], pa.int32()),
            "depth_bottom_cm": pa.array(tbl["depth_bottom_cm"], pa.int32()),
            "tile_id": pa.array(tbl["tile_id"], pa.string()),
            "band": pa.array(tbl["band"], pa.int8()),
            "h": pa.array(tbl["h"], pa.int32()),
            "w": pa.array(tbl["w"], pa.int32()),
            "dtype": pa.array(tbl["dtype"], pa.string()),
            "nodata": pa.array(tbl["nodata"], pa.float64()),
            "transform": pa.array(tbl["transform"], pa.list_(pa.float64(), 6)),
            "crs": pa.array(tbl["crs"], pa.string()),
            "minx": pa.array(tbl["minx"], pa.float64()),
            "miny": pa.array(tbl["miny"], pa.float64()),
            "maxx": pa.array(tbl["maxx"], pa.float64()),
            "maxy": pa.array(tbl["maxy"], pa.float64()),
            "pixels": pa.array(tbl["pixels"], pa.binary()),
        }
    )


def make_catchment_vat() -> pa.Table:
    """Sidecar VAT mapping per-tile int codes -> global 14-digit catchment
    ids + pixel counts; includes one unmappable code (usgs/hydrography.py:229-308)."""
    rows = []
    for tx in range(N_TILES):
        for ty in range(N_TILES):
            for code in range(1, 11):  # code 11 deliberately unmapped
                rows.append(
                    (f"{tx}_{ty}", code, 10_000_000_000_000 + code * 17 + (tx * N_TILES + ty),
                     int(100 + code * 3 + tx + ty))
                )
                # the EPSG:5070 catchment mosaic's globally-unique codes map
                # to the SAME catchment ids as the per-tile path (code 11
                # stays unmapped there too)
                rows.append(
                    (
                        "a0_0",
                        code + 16 * (tx * N_TILES + ty),
                        10_000_000_000_000 + code * 17 + (tx * N_TILES + ty),
                        int(100 + code * 3 + tx + ty),
                    )
                )
    cols = list(zip(*rows))
    return pa.table(
        {
            "tile_id": pa.array(cols[0], pa.string()),
            "value": pa.array(cols[1], pa.int32()),
            "catchment_id": pa.array(cols[2], pa.int64()),
            "count": pa.array(cols[3], pa.int32()),
        }
    )


def make_points() -> pa.Table:
    """Sampling probes: inside fields, on a tile boundary, outside coverage."""
    pts = [
        ("p_inside_a", LON0 + 0.13, LAT0 + 0.11),
        ("p_inside_b", LON0 + 0.31, LAT0 + 0.27),
        ("p_tile_edge", LON0 + 2 * TILE_DEG, LAT0 + 0.25),  # exactly on tile boundary
        ("p_far_east", LON1 - 0.01, LAT1 - 0.01),
        ("p_outside", LON1 + 1.0, LAT1 + 1.0),  # outside raster coverage
    ]
    return pa.table(
        {
            "point_id": pa.array([p[0] for p in pts], pa.string()),
            "lon": pa.array([p[1] for p in pts], pa.float64()),
            "lat": pa.array([p[2] for p in pts], pa.float64()),
        }
    )


SCENE_PX = 64  # 10m-band tile size; SCL is 20m -> 32x32
CLOUD_VALUES = (3, 8, 9, 10)  # sentinel2/constants.py:42-58


def make_scenes() -> pa.Table:
    """Sentinel-2-style catalog (FIXTURES.md §8): 2 utm zones x 2 tiles x 3
    datatakes."""
    rows = []
    for zi, zone in enumerate(("13N", "14N")):
        for ti in range(2):
            for di in range(3):
                rows.append(
                    (
                        f"S2A_MSIL2A_2024050{di+1}T17{zi}{ti}_T{zone}{ti}",
                        f"T{zone}{ti}",
                        zone,
                        f"EPSG:326{13+zi}",
                        f"2024050{di+1}T170000",
                        100 + zi * 10 + ti,
                    )
                )
    cols = list(zip(*rows))
    return pa.table(
        {
            "scene_id": pa.array(cols[0], pa.string()),
            "tile_id": pa.array(cols[1], pa.string()),
            "utm_zone": pa.array(cols[2], pa.string()),
            "crs": pa.array(cols[3], pa.string()),
            "datatake_ts": pa.array(cols[4], pa.string()),
            "relative_orbit": pa.array(cols[5], pa.int32()),
        }
    )


def scene_band_value(zone_i: int, tile_i: int, datatake_i: int, band: str,
                     col: np.ndarray, row: np.ndarray) -> np.ndarray:
    """Deterministic reflectance DN per band: 1..10000 range, 0 = nodata.
    SCL carries class codes with a planted cloud block per datatake."""
    if band == "scl":
        v = np.full(np.broadcast(col, row).shape, 4, dtype=np.int64)  # vegetation
        v = np.asarray(v)
        # planted cloud block moves with the datatake index
        r0 = 4 + datatake_i * 6
        block = (row >= r0) & (row < r0 + 4) & (col >= 8) & (col < 16)
        v[np.broadcast_to(block, v.shape)] = CLOUD_VALUES[datatake_i % 4]
        return v
    shift = {"red": 0, "nir": 4000}[band]
    base = 1000 + shift + ((col * 17 + row * 29 + datatake_i * 97 + tile_i * 13 + zone_i * 7) % 3000)
    # planted nodata dropout stripe
    v = np.asarray(base, dtype=np.int64).copy()
    drop = (col + row * 3 + datatake_i) % 151 == 0
    v[np.broadcast_to(drop, v.shape)] = 0
    return v


def _scene_transform(zone_i: int, tile_i: int, res_m: float) -> list[float]:
    """Scene tiles positioned over the fixture window in the zone's own UTM
    coordinates (toy 100x scale: the '10 m' band is 1 km/px so one 64-px
    tile spans 64 km and covers the 0.5-degree window) — the point-sampling
    path (fetch_point_data NDVI columns, api.py:128-178) needs real
    coverage.  Both resolutions share the 1 km-grid origin so the SCL
    20 m->10 m alignment crop stays a pure upscale."""
    zone = 13 + zone_i
    e, n = geo.utm_forward(
        np.array([LON0, LON1, LON0, LON1]), np.array([LAT0, LAT0, LAT1, LAT1]), zone
    )
    base = 1000.0
    x0 = float(np.floor(e.min() / base) * base) + tile_i * (SCENE_PX * base)
    y1 = float(np.ceil(n.max() / base) * base)
    return [res_m * 100.0, 0.0, x0, 0.0, -res_m * 100.0, y1]


def make_scene_tiles() -> pa.Table:
    """Raster payload per scene: red/nir at 10m (64x64), scl at 20m (32x32),
    detfoo footprint mask at 10m (uint8 1=valid, 0=masked edge)."""
    scenes = make_scenes().to_pylist()
    rows = []
    for s in scenes:
        zone_i = 0 if s["utm_zone"] == "13N" else 1
        tile_i = int(s["tile_id"][-1])
        datatake_i = int(s["datatake_ts"][7]) - 1
        for band, px_size, res_m in (
            ("red", SCENE_PX, 10.0), ("nir", SCENE_PX, 10.0), ("scl", SCENE_PX // 2, 20.0)
        ):
            col = np.arange(px_size, dtype=np.int64)[None, :]
            row = np.arange(px_size, dtype=np.int64)[:, None]
            v = scene_band_value(zone_i, tile_i, datatake_i, band,
                                 np.broadcast_to(col, (px_size, px_size)),
                                 np.broadcast_to(row, (px_size, px_size)))
            rows.append(
                dict(scene_id=s["scene_id"], band=band,
                     utm_zone=s["utm_zone"], tile_id=s["tile_id"],
                     datatake_ts=s["datatake_ts"], crs=s["crs"],
                     h=px_size, w=px_size, dtype="int32",
                     nodata=0.0, transform=_scene_transform(zone_i, tile_i, res_m),
                     pixels=v.astype("int32").tobytes())
            )
        # detector footprint: mask the left 2 columns
        foot = np.ones((SCENE_PX, SCENE_PX), dtype=np.int32)
        foot[:, :2] = 0
        rows.append(
            dict(scene_id=s["scene_id"], band="detfoo",
                 utm_zone=s["utm_zone"], tile_id=s["tile_id"],
                 datatake_ts=s["datatake_ts"], crs=s["crs"],
                 h=SCENE_PX, w=SCENE_PX, dtype="int32",
                 nodata=0.0, transform=_scene_transform(zone_i, tile_i, 10.0),
                 pixels=foot.tobytes())
        )
    tbl = {k: [r[k] for r in rows] for k in rows[0]}
    return pa.table(
        {
            "scene_id": pa.array(tbl["scene_id"], pa.string()),
            "band": pa.array(tbl["band"], pa.string()),
            "utm_zone": pa.array(tbl["utm_zone"], pa.string()),
            "tile_id": pa.array(tbl["tile_id"], pa.string()),
            "datatake_ts": pa.array(tbl["datatake_ts"], pa.string()),
            "crs": pa.array(tbl["crs"], pa.string()),
            "h": pa.array(tbl["h"], pa.int32()),
            "w": pa.array(tbl["w"], pa.int32()),
            "dtype": pa.array(tbl["dtype"], pa.string()),
            "nodata": pa.array(tbl["nodata"], pa.float64()),
            "transform": pa.array(tbl["transform"], pa.list_(pa.float64(), 6)),
            "pixels": pa.array(tbl["pixels"], pa.binary()),
        }
    )


def make_depths() -> pa.Table:
    return pa.table(
        {
            "start_cm": pa.array([d[0] for d in STANDARD_DEPTHS], pa.int32()),
            "end_cm": pa.array([d[1] for d in STANDARD_DEPTHS], pa.int32()),
        }
    )


# --------------------------------------------------------------- generate


def generate(scale: str = "tiny", force: bool = False) -> str:
    """Write all fixture tables for ``scale`` to the cache dir; idempotent."""
    params = SCALES[scale]
    out = fixture_dir(scale)
    os.makedirs(out, exist_ok=True)
    done = os.path.join(out, "_DONE")
    if os.path.exists(done) and not force:
        with open(done) as f:
            if f.read().strip() == FIXTURE_VERSION:
                return out

    fields = make_fields(params["grid"])
    pq.write_table(fields, os.path.join(out, "fields.parquet"))
    comps = make_components(fields["map_unit_key"].to_pylist())
    pq.write_table(comps, os.path.join(out, "components.parquet"))
    horizons = make_horizons(comps["component_key"].to_pylist())
    pq.write_table(horizons, os.path.join(out, "horizons.parquet"))
    pq.write_table(
        make_fragments(horizons["horizon_key"].to_pylist()),
        os.path.join(out, "fragments.parquet"),
    )
    raster_tiles = make_raster_tiles()
    pq.write_table(raster_tiles, os.path.join(out, "raster_tiles.parquet"))
    catchment_vat = make_catchment_vat()
    pq.write_table(catchment_vat, os.path.join(out, "catchment_vat.parquet"))
    # the S12 zip container: catchment tiles + VAT sidecar in one archive
    from demeter_ray.sources import ziptiles

    cat = raster_tiles.filter(
        pa.compute.equal(raster_tiles["dataset"], "cat")
    ).to_pylist()
    ziptiles.write_zip_tiles(
        os.path.join(out, "catchment.zip"),
        cat,
        catchment_vat.to_pylist(),
    )
    pq.write_table(make_points(), os.path.join(out, "points.parquet"))
    pq.write_table(make_depths(), os.path.join(out, "depths.parquet"))
    pq.write_table(make_scenes(), os.path.join(out, "scenes.parquet"))
    pq.write_table(make_scene_tiles(), os.path.join(out, "scene_tiles.parquet"))
    pq.write_table(
        make_images(params["n_images"], params["sizes"]),
        os.path.join(out, "images.parquet"),
        row_group_size=4096,
    )
    with open(done, "w") as f:
        f.write(FIXTURE_VERSION)
    return out
