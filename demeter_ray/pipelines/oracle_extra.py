"""Additional driver-visible queries: the fixture-based geospatial pipelines
(rows-only — their inputs are the deterministic fixture tables, not the
driver's SQL views; their correctness gates live in the pytest goldens) plus
an IVF-ANN query verified against the brute-force oracle shape.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from demeter_ray.pipelines.relational import duck_round, register
from demeter_ray.sources.tables import read_table

# fixture tables live at a deterministic path, so the DuckDB oracles can
# re-run the same relational plans directly over the parquet files (the
# catchment_histogram SQL-recompute pattern, extended to whole plans)
_FX = "/tmp/demeter_ray_fixtures/tiny"


_PROPERTY_AVGS = ",\n         ".join(
    "CASE WHEN SUM(cbot - ctop) FILTER (WHERE {c} IS NOT NULL) > 0 THEN "
    "ROUND(SUM((cbot - ctop) * {c}) FILTER (WHERE {c} IS NOT NULL) * 1.0 / "
    "SUM(cbot - ctop) FILTER (WHERE {c} IS NOT NULL), 4) END AS {c}".format(c=c)
    for c in (
        "fine_fraction_percent_by_weight",
        "gravel_percent_by_weight",
        "sand_percent_of_fine_fraction_by_weight",
        "silt_percent_of_fine_fraction_by_weight",
        "clay_percent_of_fine_fraction_by_weight",
        "organic_matter_percent_of_fine_fraction_by_weight",
        "oven_dry_bulk_density_g_per_cm3",
        "fragment_percent_by_volume",
    )
)

_SOIL_CTES = f"""fields AS (
  SELECT map_unit_key, map_unit_symbol, map_unit_name
  FROM read_parquet('{_FX}/fields.parquet')
),
prim AS (
  SELECT component_key, map_unit_key, comppct_r AS component_percent,
         compname AS component_name, compkind AS component_kind,
         drainagecl AS drainage_class
  FROM (SELECT c.*, RANK() OVER (PARTITION BY map_unit_key
                                 ORDER BY comppct_r DESC) AS rk
        FROM read_parquet('{_FX}/components.parquet') c
        WHERE majcompflag = 'Yes')
  WHERE rk = 1
),
frag AS (
  SELECT horizon_key, SUM(fragvol_r) AS frag_vol,
         STRING_AGG(DISTINCT fragkind, '|' ORDER BY fragkind) AS kinds
  FROM read_parquet('{_FX}/fragments.parquet')
  GROUP BY horizon_key
),
hz AS (
  SELECT h.component_key, h.horizon_key,
         GREATEST(h.hzdept_r, 0) AS ctop, LEAST(h.hzdepb_r, 100) AS cbot,
         (100 - h.fraggt10_r - h.frag3to10_r) * (h.sieveno10_r / 100)
           AS fine_fraction_percent_by_weight,
         100 - (100 - h.fraggt10_r - h.frag3to10_r) * (h.sieveno10_r / 100)
           AS gravel_percent_by_weight,
         h.sandtotal_r AS sand_percent_of_fine_fraction_by_weight,
         h.silttotal_r AS silt_percent_of_fine_fraction_by_weight,
         h.claytotal_r AS clay_percent_of_fine_fraction_by_weight,
         h.om_r AS organic_matter_percent_of_fine_fraction_by_weight,
         h.dbovendry_r AS oven_dry_bulk_density_g_per_cm3,
         frag.frag_vol AS fragment_percent_by_volume,
         frag.kinds
  FROM read_parquet('{_FX}/horizons.parquet') h
  LEFT JOIN frag USING (horizon_key)
  WHERE h.hzdepb_r > 0 AND h.hzdept_r < 100
    AND h.component_key IN (SELECT component_key FROM prim)
),
agg AS (
  SELECT component_key,
         {_PROPERTY_AVGS}
  FROM hz GROUP BY component_key
),
kinds AS (
  SELECT component_key, STRING_AGG(DISTINCT k, ', ' ORDER BY k) AS fragment_kind
  FROM (SELECT component_key, UNNEST(string_split(kinds, '|')) AS k
        FROM hz WHERE kinds IS NOT NULL)
  GROUP BY component_key
)"""

_SOIL_ATTR_COLS = (
    "component_percent", "component_name", "component_kind", "drainage_class",
    "fine_fraction_percent_by_weight", "gravel_percent_by_weight",
    "sand_percent_of_fine_fraction_by_weight",
    "silt_percent_of_fine_fraction_by_weight",
    "clay_percent_of_fine_fraction_by_weight",
    "organic_matter_percent_of_fine_fraction_by_weight",
    "oven_dry_bulk_density_g_per_cm3", "fragment_percent_by_volume",
    "fragment_kind",
)

_PRIMARY_SOIL_SQL = f"""
WITH {_SOIL_CTES}
SELECT f.map_unit_key, f.map_unit_symbol, f.map_unit_name,
       p.component_key, p.component_percent, p.component_name,
       p.component_kind, p.drainage_class,
       a.fine_fraction_percent_by_weight, a.gravel_percent_by_weight,
       a.sand_percent_of_fine_fraction_by_weight,
       a.silt_percent_of_fine_fraction_by_weight,
       a.clay_percent_of_fine_fraction_by_weight,
       a.organic_matter_percent_of_fine_fraction_by_weight,
       a.oven_dry_bulk_density_g_per_cm3,
       a.fragment_percent_by_volume,
       k.fragment_kind
FROM fields f
LEFT JOIN prim p USING (map_unit_key)
LEFT JOIN agg a USING (component_key)
LEFT JOIN kinds k USING (component_key)
ORDER BY f.map_unit_key, p.component_key
"""


def tile_hit_cell_ctes(pts: str = "pts", pid: str = "point_id") -> str:
    """tiles/hit/cell CTE bodies: point -> global elevation-grid pixel via
    the SAME per-tile inverse-affine floor the sampler uses (tiny fixture
    5x5 tile grid, stages/sample.py).  Shared by the fetch_point_data
    oracles and the flagship tile-assignment oracle; ``pts`` must expose
    ``{pid}``, ``lon``, ``lat`` columns."""
    return f"""tiles AS (
  -- all literals CAST to DOUBLE: DuckDB's bare decimal literals use exact
  -- DECIMAL arithmetic, which diverges from the sampler's IEEE doubles at
  -- floor boundaries (p_tile_edge sits exactly on one)
  SELECT tx.a AS tx, ty.b AS ty,
         CAST(-102.2 AS DOUBLE) + tx.a * CAST(0.1 AS DOUBLE) AS x0,
         CAST(36.0 AS DOUBLE) + (ty.b + 1) * CAST(0.1 AS DOUBLE) AS y1,
         CAST(0.1 AS DOUBLE) / 64 AS res,
         CASE WHEN tx.a < 4 THEN 66 ELSE 64 END AS w,
         CASE WHEN ty.b > 0 THEN 66 ELSE 64 END AS h
  FROM generate_series(0, 4) tx(a), generate_series(0, 4) ty(b)
),
hit AS (
  SELECT p.{pid}, t.tx, t.ty,
         CAST(FLOOR((-t.res * (CAST(p.lon AS DOUBLE) - t.x0)) / (t.res * -t.res)) AS BIGINT) AS lcol,
         CAST(FLOOR((t.res * (CAST(p.lat AS DOUBLE) - t.y1)) / (t.res * -t.res)) AS BIGINT) AS lrow,
         ROW_NUMBER() OVER (PARTITION BY p.{pid} ORDER BY t.tx, t.ty) AS rn
  FROM {pts} p JOIN tiles t
    ON CAST(p.lon AS DOUBLE) >= t.x0 AND CAST(p.lon AS DOUBLE) < t.x0 + t.w * t.res
   AND CAST(p.lat AS DOUBLE) > t.y1 - t.h * t.res AND CAST(p.lat AS DOUBLE) <= t.y1
),
cell AS (
  SELECT {pid}, tx * 64 + lcol AS gcol, (4 - ty) * 64 + lrow AS grow
  FROM hit WHERE rn = 1 AND lcol >= 0 AND lrow >= 0
)"""


def _point_data_ctes() -> str:
    """Shared CTE body: SQL recompute of fetch_point_data's raster columns at the 5 fixture
    probe points: elevation / catchment+VAT / fac / fdr-decode from the
    global field formulas through the SAME per-tile inverse-affine floor the
    sampler uses (every float expression mirrors the numpy op order, so IEEE
    doubles agree bit-for-bit), depth-weighted carbon stock from the
    per-pixel formula plan, and NDVI statistics from the scene formulas.
    Only the point->UTM-pixel mapping (Krueger projection) is embedded as
    literals — computed at SQL-build time and independently golden-tested in
    tests/test_point_data.py."""
    import numpy as np

    from demeter_ray.functions import geo
    from demeter_ray.sources import fixtures as fx

    pts = fx.make_points().to_pylist()
    # repr() round-trips doubles exactly, so the SQL literals ARE the
    # fixture coordinates bit-for-bit
    # the e0 suffix forces DOUBLE literals (DuckDB parses bare decimals as
    # DECIMAL and loses trailing double precision through the cast)
    pts_values = ",\n  ".join(
        f"('{p['point_id']}', {p['lon']!r}e0, {p['lat']!r}e0)" for p in pts
    )
    # NDVI pixel literals: per-point zone + scene-mosaic pixel via the UTM
    # forward projection (out-of-coverage points get no row -> NULL ndvi)
    nd_rows = []
    for p in pts:
        zn = int(geo.utm_zone_for([p["lon"]])[0])
        zone_i = zn - 13
        if zone_i not in (0, 1):
            continue
        e, n = geo.utm_forward(np.array([p["lon"]]), np.array([p["lat"]]), zn)
        t = fx._scene_transform(zone_i, 0, 10.0)
        # mirror affine_rowcol's op order exactly
        det = t[0] * t[4]
        ci = int(np.floor((t[4] * (e[0] - t[2])) / det))
        ri = int(np.floor((t[0] * (n[0] - t[5])) / det))
        if not (0 <= ci < 2 * fx.SCENE_PX and 0 <= ri < fx.SCENE_PX):
            continue
        nd_rows.append(
            f"('{p['point_id']}', {zone_i}, {ci // fx.SCENE_PX}, "
            f"{ci % fx.SCENE_PX}, {ri})"
        )
    nd_values = ",\n  ".join(nd_rows)
    return f"""pts(point_id, lon, lat) AS (VALUES
  {pts_values}
),
{tile_hit_cell_ctes()},
-- carbon stock at each point's pixel (range 0-100, 5 layers)
clayers(dt, db) AS (VALUES (0,5),(5,15),(15,30),(30,60),(60,100)),
cvals AS (
  SELECT c.point_id,
         CAST(l.db - l.dt AS DOUBLE) AS w,
         CASE WHEN (c.gcol + c.grow + l.dt) % 89 = 0 THEN NULL ELSE
           CAST(CAST(((c.gcol*13 + c.grow*7 + l.dt*29) % 500) / 100.0 AS REAL) AS DOUBLE)
         END AS om,
         CASE WHEN (c.gcol + c.grow + l.dt) % 89 = 0 THEN NULL ELSE
           CAST(CAST(((c.gcol*13 + c.grow*7 + 1000 + l.dt*29) % 500) / 100.0 AS REAL) AS DOUBLE)
         END AS bd,
         CASE WHEN (c.gcol + c.grow + l.dt) % 89 = 0 THEN NULL ELSE
           CAST(CAST(((c.gcol*13 + c.grow*7 + l.dt*29) % 500) / 100.0 + 0.5 AS REAL) AS DOUBLE)
           - CAST(CAST(((c.gcol*13 + c.grow*7 + l.dt*29) % 500) / 100.0 - 0.5 AS REAL) AS DOUBLE)
         END AS om_spread,
         CASE WHEN (c.gcol + c.grow + l.dt) % 89 = 0 THEN NULL ELSE
           CAST(CAST(((c.gcol*13 + c.grow*7 + 1000 + l.dt*29) % 500) / 100.0 + 0.5 AS REAL) AS DOUBLE)
           - CAST(CAST(((c.gcol*13 + c.grow*7 + 1000 + l.dt*29) % 500) / 100.0 - 0.5 AS REAL) AS DOUBLE)
         END AS bd_spread
  FROM cell c CROSS JOIN clayers l
),
carbon AS (
  SELECT point_id,
         ROUND((0.58 * (SUM(w*om) FILTER (WHERE om IS NOT NULL)
                        / SUM(w) FILTER (WHERE om IS NOT NULL)))
               * (SUM(w*bd) FILTER (WHERE bd IS NOT NULL)
                  / SUM(w) FILTER (WHERE bd IS NOT NULL)), 6) AS carbon_stock_mean,
         ROUND(SQRT(
             POWER(0.58 * SQRT(SUM(w*w*POWER(om_spread/(2*1.645), 2)) FILTER (WHERE om IS NOT NULL)
                               / SUM(w*w) FILTER (WHERE om IS NOT NULL)), 2)
             * POWER(SQRT(SUM(w*w*POWER(bd_spread/(2*1.645), 2)) FILTER (WHERE bd IS NOT NULL)
                          / SUM(w*w) FILTER (WHERE bd IS NOT NULL)), 2)
             + POWER(0.58 * SQRT(SUM(w*w*POWER(om_spread/(2*1.645), 2)) FILTER (WHERE om IS NOT NULL)
                                 / SUM(w*w) FILTER (WHERE om IS NOT NULL)), 2)
             * POWER(SUM(w*bd) FILTER (WHERE bd IS NOT NULL)
                     / SUM(w) FILTER (WHERE bd IS NOT NULL), 2)
             + POWER(SQRT(SUM(w*w*POWER(bd_spread/(2*1.645), 2)) FILTER (WHERE bd IS NOT NULL)
                          / SUM(w*w) FILTER (WHERE bd IS NOT NULL)), 2)
             * POWER(0.58 * (SUM(w*om) FILTER (WHERE om IS NOT NULL)
                             / SUM(w) FILTER (WHERE om IS NOT NULL)), 2)
         ), 6) AS carbon_stock_stddev
  FROM cvals GROUP BY point_id
),
-- NDVI statistics at each point's zone pixel (literals from the projection)
ndpix(point_id, zone_i, tile_i, c_local, srow) AS (VALUES
  {nd_values}
),
nddt AS (
  SELECT np.point_id,
    CASE WHEN np.c_local <= 1 THEN NULL
         WHEN (np.c_local + np.srow * 3 + d.dt) % 151 = 0 THEN NULL
         WHEN (np.srow // 2 >= 4 + d.dt * 6 AND np.srow // 2 < 8 + d.dt * 6
               AND np.c_local // 2 >= 8 AND np.c_local // 2 < 16) THEN NULL
         ELSE CAST(CAST(
           ( (5000 + (np.c_local*17 + np.srow*29 + d.dt*97 + np.tile_i*13 + np.zone_i*7) % 3000) / 10000.0
           - (1000 + (np.c_local*17 + np.srow*29 + d.dt*97 + np.tile_i*13 + np.zone_i*7) % 3000) / 10000.0 )
           /
           ( (5000 + (np.c_local*17 + np.srow*29 + d.dt*97 + np.tile_i*13 + np.zone_i*7) % 3000) / 10000.0
           + (1000 + (np.c_local*17 + np.srow*29 + d.dt*97 + np.tile_i*13 + np.zone_i*7) % 3000) / 10000.0 )
           AS REAL) AS DOUBLE)
    END AS v
  FROM ndpix np CROSS JOIN (VALUES (0), (1), (2)) d(dt)
),
ndstat AS (
  SELECT point_id,
         CAST(CAST(ANY_VALUE(m) AS REAL) AS DOUBLE) AS ndvi_mean,
         CAST(CAST(MIN(v) AS REAL) AS DOUBLE) AS ndvi_min,
         CAST(CAST(MAX(v) AS REAL) AS DOUBLE) AS ndvi_max,
         CAST(CAST(SQRT(AVG(POWER(v - m, 2))) AS REAL) AS DOUBLE) AS ndvi_stddev
  FROM (SELECT point_id, v, AVG(v) OVER (PARTITION BY point_id) AS m
        FROM nddt WHERE v IS NOT NULL)
  GROUP BY point_id
)"""


# raster output expressions shared by the rasters-only and full oracles
# (aliases c=cell, ca=carbon, nd=ndstat)
_PD_RASTER_COLS = """ca.carbon_stock_mean, ca.carbon_stock_stddev,
       CAST(CAST(((c.gcol*31 + c.grow*17) % 1000) / 10.0 AS REAL) AS DOUBLE)
         AS elevation,
       CASE WHEN ((c.gcol//64*5 + (4 - c.grow//64))*7
                  + (c.gcol%64 + c.grow%64)//32) % 11 + 1 <> 11
            THEN CAST(10000000000000
                      + (((c.gcol//64*5 + (4 - c.grow//64))*7
                          + (c.gcol%64 + c.grow%64)//32) % 11 + 1) * 17
                      + (c.gcol//64*5 + (4 - c.grow//64)) AS DOUBLE)
       END AS catchment_id,
       CAST(CAST(((c.gcol*11 + c.grow*23) % 5000) / 4.0 AS REAL) AS DOUBLE)
         AS flow_accumulation,
       CASE CAST(POWER(2, (c.gcol//8 + c.grow//8) % 8) AS BIGINT)
         WHEN 1 THEN 'E' WHEN 2 THEN 'SE' WHEN 4 THEN 'S' WHEN 8 THEN 'SW'
         WHEN 16 THEN 'W' WHEN 32 THEN 'NW' WHEN 64 THEN 'N' WHEN 128 THEN 'NE'
       END AS flow_direction,
       nd.ndvi_mean, nd.ndvi_min, nd.ndvi_max, nd.ndvi_stddev"""


def _point_data_rasters_sql() -> str:
    return f"""
WITH {_point_data_ctes()}
SELECT p.point_id, p.lon, p.lat,
       {_PD_RASTER_COLS}
FROM pts p
LEFT JOIN cell c USING (point_id)
LEFT JOIN carbon ca USING (point_id)
LEFT JOIN ndstat nd USING (point_id)
ORDER BY p.point_id
"""


@register("fetch_point_data_rasters", _point_data_rasters_sql())
def fetch_point_data_rasters_q(sf_dir: str):
    """fetch_point_data restricted to its raster sources (carbon stock,
    elevation, catchment + fac/fdr, NDVI) — the oracle recomputes every
    column from the deterministic field formulas in SQL (the ssurgo source
    stays in the full rows-only fetch_point_data: its polygon jitter uses
    RandomState, which SQL can't reproduce)."""
    from demeter_ray.pipelines import point_data
    from demeter_ray.sources import fixtures as fx

    out = point_data.fetch_point_data(
        fx.generate("tiny"),
        sources=("carbon_stock", "elevation", "catchment", "ndvi"),
    )
    out["carbon_stock_mean"] = duck_round(
        out["carbon_stock_mean"].to_numpy(dtype=np.float64), 6
    )
    out["carbon_stock_stddev"] = duck_round(
        out["carbon_stock_stddev"].to_numpy(dtype=np.float64), 6
    )
    # nullable Int64 -> float64 (the checker's int path can't carry NA)
    out["catchment_id"] = out["catchment_id"].astype("Float64").astype(np.float64)
    fd = out["flow_direction"].astype(object)
    out["flow_direction"] = fd.where(fd.notna(), None)
    return out


def _field_edges_values() -> str:
    """Every edge of every fixture field-polygon ring as SQL literals —
    the full even-odd (ray-crossing) containment test is then expressible
    in SQL: a point is inside a polygon iff its crossing count over ALL of
    the polygon's edges is odd (rings XOR via parity), mirroring
    geo.points_in_ring's float op order exactly."""
    from demeter_ray.functions import geo as _geo
    from demeter_ray.sources import fixtures as fx

    fields = fx.make_fields(fx.SCALES["tiny"]["grid"])
    rows = []
    for mid, wkb in zip(
        fields["map_unit_key"].to_pylist(), fields["geom_wkb"].to_pylist()
    ):
        for rings in _geo.parse_wkb(wkb):
            for ring in rings:
                r = np.asarray(ring, dtype=np.float64)
                for (x1, y1), (x2, y2) in zip(r[:-1], r[1:]):
                    rows.append(
                        f"({mid}, {float(x1)!r}e0, {float(y1)!r}e0, "
                        f"{float(x2)!r}e0, {float(y2)!r}e0)"
                    )
    return ",\n  ".join(rows)


def _point_data_full_sql() -> str:
    """The FULL fetch_point_data oracle: raster columns (shared CTEs) plus
    the ssurgo source — point->map-unit assignment via the SQL even-odd
    crossing test over the fixture polygon edges (min-key under overlap),
    joined to the first primary component row of the SSURGO plan."""
    ssurgo_cols = ",\n       ".join(
        f"s.{c} AS ssurgo_{c}" for c in _SOIL_ATTR_COLS
    )
    return f"""
WITH {_point_data_ctes()},
{_SOIL_CTES},
edges(fid, ex1, ey1, ex2, ey2) AS (VALUES
  {_field_edges_values()}
),
inside AS (
  SELECT p.point_id, e.fid
  FROM pts p CROSS JOIN edges e
  GROUP BY p.point_id, e.fid, p.lon, p.lat
  HAVING COUNT(*) FILTER (WHERE ((e.ey1 > p.lat) <> (e.ey2 > p.lat))
           AND p.lon < e.ex1 + (p.lat - e.ey1) * (e.ex2 - e.ex1)
                                / (e.ey2 - e.ey1)) % 2 = 1
),
mu AS (
  SELECT point_id, MIN(fid) AS mukey FROM inside GROUP BY point_id
),
soil_one AS (
  SELECT * EXCLUDE (rn) FROM (
    SELECT f.map_unit_key AS mukey, p.component_key,
           p.component_percent, p.component_name, p.component_kind,
           p.drainage_class,
           a.fine_fraction_percent_by_weight, a.gravel_percent_by_weight,
           a.sand_percent_of_fine_fraction_by_weight,
           a.silt_percent_of_fine_fraction_by_weight,
           a.clay_percent_of_fine_fraction_by_weight,
           a.organic_matter_percent_of_fine_fraction_by_weight,
           a.oven_dry_bulk_density_g_per_cm3,
           a.fragment_percent_by_volume,
           k.fragment_kind,
           ROW_NUMBER() OVER (PARTITION BY f.map_unit_key
                              ORDER BY p.component_key) AS rn
    FROM fields f
    LEFT JOIN prim p USING (map_unit_key)
    LEFT JOIN agg a USING (component_key)
    LEFT JOIN kinds k USING (component_key))
  WHERE rn = 1
)
SELECT p.point_id, p.lon, p.lat,
       {_PD_RASTER_COLS},
       CAST(mu.mukey AS DOUBLE) AS map_unit_key,
       CAST(s.component_key AS DOUBLE) AS ssurgo_component_key,
       {ssurgo_cols}
FROM pts p
LEFT JOIN cell c USING (point_id)
LEFT JOIN carbon ca USING (point_id)
LEFT JOIN ndstat nd USING (point_id)
LEFT JOIN mu USING (point_id)
LEFT JOIN soil_one s ON mu.mukey = s.mukey
ORDER BY p.point_id
"""


@register("fetch_point_data", _point_data_full_sql())
def fetch_point_data_q(sf_dir: str):
    """The reference's flagship multi-source point enrichment
    (api.py:13-102) over the deterministic fixtures.  The oracle recomputes
    EVERY column in SQL: rasters from the field formulas, the point->field
    assignment via the even-odd crossing test over the polygon-edge
    literals, and the ssurgo attributes from the SSURGO plan CTEs (golden
    conformance additionally in tests/test_point_data.py)."""
    from demeter_ray.pipelines import point_data
    from demeter_ray.pipelines.soiljoin import PROPERTY_COLS
    from demeter_ray.sources import fixtures as fx

    out = point_data.fetch_point_data(fx.generate("tiny"))
    # majcompflag is constant 'Yes' on the primary plan (already filtered);
    # the SQL plan doesn't carry it through
    out = out.drop(columns=["ssurgo_majcompflag"])
    for c in ("carbon_stock_mean", "carbon_stock_stddev"):
        out[c] = duck_round(out[c].to_numpy(dtype=np.float64), 6)
    for c in PROPERTY_COLS:
        out["ssurgo_" + c] = duck_round(
            out["ssurgo_" + c].to_numpy(dtype=np.float64), 4
        )
    for c in ("catchment_id", "map_unit_key", "ssurgo_component_key",
              "ssurgo_component_percent"):
        out[c] = out[c].astype("Float64").astype(np.float64)
    fd = out["flow_direction"].astype(object)
    out["flow_direction"] = fd.where(fd.notna(), None)
    return out



# the full SSURGO relational plan (top-1-with-ties, interval join, fragment
# rollup, missing-ignoring depth-weighted averages, sorted-unique kinds,
# one-to-one left merge) re-expressed in SQL over the SAME fixture parquet
# dims — the driver's hard oracle for the flagship soil plan.  The CTE body
# is shared with the full fetch_point_data oracle below.
@register("primary_soil_components", _PRIMARY_SOIL_SQL)
def primary_soil_components_q(sf_dir: str):
    """Full SSURGO plan over fixture dims (ssurgo.py:111-179 semantics;
    golden conformance in tests/test_soiljoin.py).  The oracle re-runs the
    whole plan in DuckDB over the same fixture parquet files; the property
    averages round to 4 decimals on both sides."""
    from demeter_ray.pipelines.soiljoin import PROPERTY_COLS, primary_soil_components
    from demeter_ray.sources import fixtures as fx

    out = primary_soil_components(fx.generate("tiny"), 0, 100)
    for c in PROPERTY_COLS:
        out[c] = duck_round(out[c].to_numpy(dtype=np.float64), 4)
    return out.drop(columns=["majcompflag"])


# full SQL recompute of the NDVI zone statistics from the deterministic
# scene formulas (fixtures.scene_band_value): detector-footprint mask
# (left 2 cols per tile), dropout stripe, SCL cloud block (20m grid
# upscaled), reflectance ratio quantized to the float32 the per-datatake
# rasters store, then per-pixel mean/min/max/stddev across datatakes
_NDVI_SQL = """
WITH zones(zone_i, utm_zone) AS (VALUES (0, '13N'), (1, '14N')),
px AS (SELECT t.t AS tile_i, r.r AS r, c.c AS c
       FROM generate_series(0, 1) t(t), generate_series(0, 63) r(r),
            generate_series(0, 63) c(c)),
dts(dt) AS (VALUES (0), (1), (2)),
nd AS (
  SELECT z.utm_zone, p.r, p.c + p.tile_i * 64 AS gc,
    CASE WHEN p.c <= 1 THEN NULL
         WHEN (p.c + p.r * 3 + d.dt) % 151 = 0 THEN NULL
         WHEN (p.r // 2 >= 4 + d.dt * 6 AND p.r // 2 < 8 + d.dt * 6
               AND p.c // 2 >= 8 AND p.c // 2 < 16) THEN NULL
         ELSE CAST(CAST(
           ( (5000 + (p.c*17 + p.r*29 + d.dt*97 + p.tile_i*13 + z.zone_i*7) % 3000) / 10000.0
           - (1000 + (p.c*17 + p.r*29 + d.dt*97 + p.tile_i*13 + z.zone_i*7) % 3000) / 10000.0 )
           /
           ( (5000 + (p.c*17 + p.r*29 + d.dt*97 + p.tile_i*13 + z.zone_i*7) % 3000) / 10000.0
           + (1000 + (p.c*17 + p.r*29 + d.dt*97 + p.tile_i*13 + z.zone_i*7) % 3000) / 10000.0 )
           AS REAL) AS DOUBLE)
    END AS v
  FROM zones z CROSS JOIN px p CROSS JOIN dts d
),
wm AS (
  SELECT utm_zone, r, gc, v,
         AVG(v) OVER (PARTITION BY utm_zone, r, gc) AS m
  FROM nd WHERE v IS NOT NULL
),
pix AS (
  SELECT utm_zone, r, gc, ANY_VALUE(m) AS mean_v, MIN(v) AS min_v,
         MAX(v) AS max_v, SQRT(AVG(POWER(v - m, 2))) AS std_v
  FROM wm GROUP BY utm_zone, r, gc
),
long AS (
  SELECT utm_zone, 'mean' AS statistic, mean_v AS v FROM pix
  UNION ALL SELECT utm_zone, 'min', min_v FROM pix
  UNION ALL SELECT utm_zone, 'max', max_v FROM pix
  UNION ALL SELECT utm_zone, 'stddev', std_v FROM pix
)
SELECT utm_zone, statistic, 64 AS h, 128 AS w, COUNT(*) AS valid_px,
       ROUND(AVG(v), 6) AS mean_value
FROM long GROUP BY utm_zone, statistic ORDER BY utm_zone, statistic
"""


@register("ndvi_zone_statistics", _NDVI_SQL)
def ndvi_zone_statistics_q(sf_dir: str):
    """Sentinel-2-style NDVI statistics per zone (ndvi.py:126-313 semantics;
    golden conformance in tests/test_ndvi.py).  Drops raster payload bytes
    for the driver's check; the oracle recomputes the full mask + statistic
    pipeline from the scene formulas in SQL."""
    import ray.data

    from demeter_ray.sources import fixtures as fx
    from demeter_ray.stages.ndvi import ndvi_statistics

    fd = fx.generate("tiny")
    out = ndvi_statistics(ray.data.read_parquet(f"{fd}/scene_tiles.parquet"))
    out = out.drop(columns=["pixels", "transform", "crs"])
    out["mean_value"] = duck_round(out["mean_value"].to_numpy(dtype=np.float64), 6)
    return out


# the fixture catchment field is pure modular arithmetic
# (fixtures.catchment_value), so the full remap+histogram pipeline is
# SQL-recomputable: code = (tidx*7 + (r+c)//32) % 11 + 1 per 64x64 tile,
# VAT id = 1e13 + code*17 + tidx, code 11 deliberately unmapped (dropped)
_CATCHMENT_HIST_SQL = """
WITH px AS (
  SELECT (t.tx * 5 + t.ty) AS tidx,
         ((t.tx * 5 + t.ty) * 7 + (r.r + c.c) // 32) % 11 + 1 AS code
  FROM (SELECT a.a AS tx, b.b AS ty
        FROM generate_series(0, 4) a(a), generate_series(0, 4) b(b)) t,
       generate_series(0, 63) r(r), generate_series(0, 63) c(c)
)
SELECT CAST(10000000000000 + code * 17 + tidx AS BIGINT) AS catchment_id,
       COUNT(*) AS n_pixels
FROM px WHERE code <> 11
GROUP BY catchment_id ORDER BY catchment_id
"""


@register("catchment_histogram", _CATCHMENT_HIST_SQL)
def catchment_histogram_q(sf_dir: str):
    """Hydrography pixel-count histogram per global catchment id
    (usgs/hydrography.py:211-323 semantics): remap every cat tile through
    its VAT, count pixels per global id.  The oracle recomputes the whole
    remap+histogram from the deterministic field formula in pure SQL."""
    import pyarrow.parquet as pq
    import ray.data

    from demeter_ray.sources import fixtures as fx
    from demeter_ray.stages.hydro import catchment_histogram_from_pixels

    fd = fx.generate("tiny")
    tiles = ray.data.read_parquet(f"{fd}/raster_tiles.parquet")
    vat = pq.read_table(f"{fd}/catchment_vat.parquet")
    return catchment_histogram_from_pixels(tiles, vat)


# full SQL recompute of the depth-weighted carbon stock over the fixture
# formulas (fixtures.soil_value + planted nodata holes + float32 tile
# quantization via REAL casts): per-pixel missing-ignoring weighted mean,
# stddev from p5/p95 spread with squared weights, Var(XY) stock stddev —
# the catchment_histogram formula-recompute pattern applied to the whole
# POLARIS plan
_CARBON_SQL = """
WITH ranges(top_cm, bottom_cm) AS (VALUES (0, 30), (0, 100), (30, 100)),
layers(dt, db) AS (VALUES (0,5),(5,15),(15,30),(30,60),(60,100),(100,200)),
px AS (SELECT r.r AS r, c.c AS c
       FROM generate_series(0, 319) r(r), generate_series(0, 319) c(c)),
vals AS (
  SELECT rg.top_cm, rg.bottom_cm, p.r, p.c,
         CAST(LEAST(l.db, rg.bottom_cm) - GREATEST(l.dt, rg.top_cm) AS DOUBLE) AS w,
         CASE WHEN (p.c + p.r + l.dt) % 89 = 0 THEN NULL ELSE
           CAST(CAST(((p.c*13 + p.r*7 + l.dt*29) % 500) / 100.0 AS REAL) AS DOUBLE)
         END AS om,
         CASE WHEN (p.c + p.r + l.dt) % 89 = 0 THEN NULL ELSE
           CAST(CAST(((p.c*13 + p.r*7 + 1000 + l.dt*29) % 500) / 100.0 AS REAL) AS DOUBLE)
         END AS bd,
         CASE WHEN (p.c + p.r + l.dt) % 89 = 0 THEN NULL ELSE
           CAST(CAST(((p.c*13 + p.r*7 + l.dt*29) % 500) / 100.0 + 0.5 AS REAL) AS DOUBLE)
           - CAST(CAST(((p.c*13 + p.r*7 + l.dt*29) % 500) / 100.0 - 0.5 AS REAL) AS DOUBLE)
         END AS om_spread,
         CASE WHEN (p.c + p.r + l.dt) % 89 = 0 THEN NULL ELSE
           CAST(CAST(((p.c*13 + p.r*7 + 1000 + l.dt*29) % 500) / 100.0 + 0.5 AS REAL) AS DOUBLE)
           - CAST(CAST(((p.c*13 + p.r*7 + 1000 + l.dt*29) % 500) / 100.0 - 0.5 AS REAL) AS DOUBLE)
         END AS bd_spread
  FROM ranges rg
  JOIN layers l ON l.db > rg.top_cm AND l.dt < rg.bottom_cm
  CROSS JOIN px p
),
pix AS (
  SELECT top_cm, bottom_cm, r, c,
         SUM(w*om) FILTER (WHERE om IS NOT NULL)
           / SUM(w) FILTER (WHERE om IS NOT NULL) AS om_mean,
         SQRT(SUM(w*w*POWER(om_spread/(2*1.645), 2)) FILTER (WHERE om IS NOT NULL)
           / SUM(w*w) FILTER (WHERE om IS NOT NULL)) AS om_std,
         SUM(w*bd) FILTER (WHERE bd IS NOT NULL)
           / SUM(w) FILTER (WHERE bd IS NOT NULL) AS bd_mean,
         SQRT(SUM(w*w*POWER(bd_spread/(2*1.645), 2)) FILTER (WHERE bd IS NOT NULL)
           / SUM(w*w) FILTER (WHERE bd IS NOT NULL)) AS bd_std
  FROM vals GROUP BY top_cm, bottom_cm, r, c
),
stock AS (
  SELECT top_cm, bottom_cm,
         (0.58*om_mean)*bd_mean AS sm,
         SQRT(POWER(0.58*om_std, 2)*POWER(bd_std, 2)
              + POWER(0.58*om_std, 2)*POWER(bd_mean, 2)
              + POWER(bd_std, 2)*POWER(0.58*om_mean, 2)) AS ss
  FROM pix
)
SELECT top_cm, bottom_cm,
       COUNT(*) FILTER (WHERE sm IS NOT NULL) AS valid_px,
       ROUND(AVG(sm), 6) AS stock_mean,
       ROUND(AVG(ss), 6) AS stock_stddev_mean
FROM stock GROUP BY top_cm, bottom_cm ORDER BY top_cm, bottom_cm
"""


@register("carbon_stock_summary", _CARBON_SQL)
def carbon_stock_summary_q(sf_dir: str):
    """POLARIS-style depth-weighted carbon stock over the fixture raster
    table: per-depth-range summary rows (polaris.py:160-324 semantics).
    The oracle recomputes the whole plan from the deterministic tile
    formulas in SQL."""
    import pyarrow.parquet as pq

    from demeter_ray.sources import fixtures as fx
    from demeter_ray.stages.depthagg import estimate_carbon_stock

    tiles = pq.read_table(f"{fx.generate('tiny')}/raster_tiles.parquet")
    rows = []
    for start, end in ((0, 30), (0, 100), (30, 100)):
        mean, std, _ = estimate_carbon_stock(tiles, start, end)
        rows.append(
            {
                "top_cm": start,
                "bottom_cm": end,
                "valid_px": int((~np.ma.getmaskarray(mean)).sum()),
                "stock_mean": float(duck_round(np.ma.mean(mean), 6)),
                "stock_stddev_mean": float(duck_round(np.ma.mean(std), 6)),
            }
        )
    return pd.DataFrame(rows)


# pairs = docs sharing >=1 exact 16-bit simhash chunk (the Charikar bucketing
# the engine shuffles on) AND Hamming <= 6 — both conditions SQL-recomputed
# from the simhash CTE, so the oracle reproduces the engine's recall shape
# exactly (verified incl. capped-bucket chains at sf0.001/sf0.01)
def _simhash_pairs_sql() -> str:
    from demeter_ray.pipelines.oracle_text import SIMHASH_CTE

    return SIMHASH_CTE + """
SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       bit_count(xor(a.simhash, b.simhash))::BIGINT AS hamming
FROM sim a JOIN sim b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 6
  AND (((a.simhash >> 0)  & 65535) = ((b.simhash >> 0)  & 65535)
    OR ((a.simhash >> 16) & 65535) = ((b.simhash >> 16) & 65535)
    OR ((a.simhash >> 32) & 65535) = ((b.simhash >> 32) & 65535)
    OR ((a.simhash >> 48) & 65535) = ((b.simhash >> 48) & 65535))
ORDER BY a_id, b_id
"""


@register("simhash_neardup_docs", _simhash_pairs_sql())
def simhash_neardup_docs_q(sf_dir: str):
    """SimHash chunk-bucketed near-dup pairs with exact Hamming verify."""
    from demeter_ray.stages.dedup import simhash_neardup

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return simhash_neardup(ds, max_hamming=6)


@register("ivf_ann_topk", None)
def ivf_ann_topk_q(sf_dir: str):
    """IVF-bucketed approximate nearest neighbors for 4 query vectors with
    recall annotated against the exact brute force (the scale path of
    knn_embeddings_top5)."""
    import ray.data

    from demeter_ray.stages.simsearch import brute_force_topk, build_ivf_index, ivf_topk

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    head = ds.limit(4).to_pandas()
    queries = np.array(head["embedding"].tolist(), dtype=np.float64)
    indexed = build_ivf_index(ds, n_lists=8)
    approx = ivf_topk(indexed, indexed.ivf_centroids, queries, k=5, nprobe=4)
    exact = brute_force_topk(ds, queries, k=5)
    recall = []
    for qi in range(len(queries)):
        e = set(exact[exact["query_idx"] == qi]["vec_id"])
        a = set(approx[approx["query_idx"] == qi]["vec_id"])
        recall.append(len(e & a) / max(1, len(e)))
    out = approx.copy()
    out["recall_at_5"] = out["query_idx"].map(dict(enumerate(np.round(recall, 3))))
    return out.drop(columns=["sim"])


# SQL recompute of the decode->resize->crop->features pipeline: source
# pixels are (i*97 + x*31 + y*17 + c*11) % 256; the 32->16 bilinear resize
# is an exact 2x2 average whose only rounding tie (s%4==2) follows np.rint's
# half-to-even; feat_mean = (sum of 24 histogram fractions + mean/255 +
# std/255) / 26 over the 12x12 center crop
_IMG_FEAT_SQL = """
WITH src AS (SELECT doc_id FROM documents),
grid AS (SELECT y.y AS y, x.x AS x, ch.ch AS ch
         FROM generate_series(2, 13) y(y), generate_series(2, 13) x(x),
              generate_series(0, 2) ch(ch)),
resized AS (
  SELECT d.doc_id, g.ch,
    ((d.doc_id*97 + (2*g.x)*31   + (2*g.y)*17   + g.ch*11) % 256
   + (d.doc_id*97 + (2*g.x+1)*31 + (2*g.y)*17   + g.ch*11) % 256
   + (d.doc_id*97 + (2*g.x)*31   + (2*g.y+1)*17 + g.ch*11) % 256
   + (d.doc_id*97 + (2*g.x+1)*31 + (2*g.y+1)*17 + g.ch*11) % 256) AS s
  FROM src d CROSS JOIN grid g
),
vals AS (
  SELECT doc_id, ch,
    CASE WHEN s % 4 = 2 THEN (CASE WHEN (s // 4) % 2 = 0 THEN s // 4 ELSE s // 4 + 1 END)
         WHEN s % 4 = 3 THEN s // 4 + 1
         ELSE s // 4 END AS v
  FROM resized
),
hist AS (
  SELECT doc_id, SUM(frac) AS hsum FROM (
    SELECT doc_id, ch, v // 32 AS b, COUNT(*) / 144.0 AS frac
    FROM vals GROUP BY doc_id, ch, v // 32
  ) GROUP BY doc_id
),
stats AS (
  SELECT doc_id, ANY_VALUE(m) AS mean_px, SQRT(AVG(POWER(v - m, 2))) AS std_px
  FROM (SELECT doc_id, v, AVG(v) OVER (PARTITION BY doc_id) AS m FROM vals)
  GROUP BY doc_id
)
SELECT 'img' || lpad(CAST(d.doc_id AS VARCHAR), 12, '0') AS image_id,
       ROUND((h.hsum + s.mean_px / 255.0 + s.std_px / 255.0) / 26.0, 6) AS feat_mean
FROM src d JOIN hist h USING (doc_id) JOIN stats s USING (doc_id)
ORDER BY image_id
"""


@register("image_transform_features", _IMG_FEAT_SQL)
def image_transform_features_q(sf_dir: str):
    """Decode -> bilinear resize -> center-crop -> feature-extraction task
    pool over derived images (payload-axis preprocessing; goldens in
    tests/test_image_stages.py; the oracle recomputes the whole transform
    from the deterministic pixel formula in SQL)."""
    import pyarrow as pa

    from demeter_ray.functions import codec
    from demeter_ray.stages.images import transform_images

    ds = read_table(sf_dir, "documents", columns=["doc_id"])

    def to_images(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        px4 = codec.generate_pixels_batch(ids, 32, 32)
        return pa.table(
            {
                "image_id": pa.array([f"img{int(i):012d}" for i in ids]),
                "bytes": pa.array(codec.encode_batch(px4, "png"), pa.binary()),
            }
        )

    ds = ds.map_batches(to_images, batch_format="pyarrow", batch_size=512)
    out = transform_images(ds, concurrency=(1, 4)).to_pandas()
    if len(out) == 0:
        return pd.DataFrame({"image_id": pd.Series(dtype="object"),
                             "feat_mean": pd.Series(dtype="float64")})
    feats = np.array(out["features"].tolist())
    out["feat_mean"] = duck_round(feats.mean(axis=1), 6)
    return out[["image_id", "feat_mean"]]


@register("image_embedding_neardup", None)
def image_embedding_neardup_q(sf_dir: str):
    """Image-feature near-dup: transform stage -> feature vectors -> cosine
    pairs ~ 1.0.  The planted i%100==99 duplicates land at exactly 1.0;
    the synthetic generator's gradients are cyclic shifts, so histogram
    features also collide across distinct images — the extra pairs are a
    property of the deterministic corpus, not the operator."""
    import pyarrow as pa

    from demeter_ray.functions import codec
    from demeter_ray.stages.images import transform_images

    ds = read_table(sf_dir, "documents", columns=["doc_id"])

    def to_images(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        src = np.where(ids % 100 == 99, ids - 1, ids)  # planted exact dups
        px4 = codec.generate_pixels_batch(src, 32, 32)
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "bytes": pa.array(codec.encode_batch(px4, "png"), pa.binary()),
            }
        )

    ds = ds.map_batches(to_images, batch_format="pyarrow", batch_size=512)
    feats_df = transform_images(ds, concurrency=(1, 4)).to_pandas()
    if len(feats_df) == 0:
        return pd.DataFrame({"a_id": pd.Series(dtype="int64"),
                             "b_id": pd.Series(dtype="int64")})
    ids = feats_df["vec_id"].to_numpy(dtype=np.int64)
    E = np.array(feats_df["features"].tolist(), dtype=np.float64)
    En = E / np.linalg.norm(E, axis=1, keepdims=True)
    S = En @ En.T
    iu = np.triu_indices(len(ids), 1)
    hit = S[iu] >= 0.999999
    a, b = ids[iu[0][hit]], ids[iu[1][hit]]
    out = pd.DataFrame({"a_id": np.minimum(a, b), "b_id": np.maximum(a, b)})
    return out.sort_values(["a_id", "b_id"]).reset_index(drop=True)


def _hll_estimate_cte(vals_query: str) -> str:
    """HyperLogLog p=12 recomputed in SQL, register-exact vs
    stages/sketches.hll_add/hll_estimate: h = stable_hash64(str(v)) << 1,
    idx = top 12 bits, rank = leading zeros of the remaining 52 bits + 1,
    alpha_m estimator with the small-range (linear-counting) correction."""
    from demeter_ray.pipelines.oracle_text import sha256_hash64_sql

    return f"""
WITH vals AS ({vals_query}),
hv AS (
  SELECT ({sha256_hash64_sql('v')} * 2)::HUGEINT AS h FROM vals
),
parts AS (
  SELECT (h >> 52)::BIGINT AS idx,
         (h & 4503599627370495)::BIGINT AS rest
  FROM hv
),
ranked AS (
  SELECT idx,
         (CASE WHEN rest = 0 THEN 52
               ELSE coalesce(list_position(list_transform(range(0, 52),
                      b -> (rest >> (51 - b)::INT) & 1), 1) - 1, 52) END + 1) AS rank
  FROM parts
),
regs AS (
  SELECT idx, MAX(rank) AS r FROM ranked GROUP BY idx
),
agg AS (
  SELECT SUM(2.0 ^ (-r)) AS s, COUNT(*) AS n_present FROM regs
),
est AS (
  SELECT (0.7213 / (1 + 1.079 / 4096)) * 4096 * 4096
           / (s + (4096 - n_present) * 1.0) AS raw,
         (4096 - n_present) AS zeros
  FROM agg
)
SELECT CASE WHEN raw <= 2.5 * 4096 AND zeros > 0
            THEN 4096 * ln(4096.0 / zeros) ELSE raw END AS estimate
FROM est
"""


def _approx_distinct_sql() -> str:
    return f"""
WITH u AS ({_hll_estimate_cte("SELECT CAST(user_id AS VARCHAR) AS v FROM events")}),
t AS ({_hll_estimate_cte("SELECT unnest(list_distinct(string_split(text, ' '))) AS v FROM documents")}),
ex AS (SELECT COUNT(DISTINCT user_id)::BIGINT AS exact FROM events)
SELECT 'distinct_users' AS metric, round_even(u.estimate, 1) AS estimate,
       ex.exact AS "exact",
       round_even(abs(u.estimate - ex.exact) / ex.exact, 4) AS rel_error
FROM u, ex
UNION ALL
SELECT 'distinct_tokens', round_even(t.estimate, 1), -1, -1.0 FROM t
ORDER BY metric DESC
"""


@register("approx_distinct_users", _approx_distinct_sql())
def approx_distinct_users_q(sf_dir: str):
    """HyperLogLog approximate distinct count (mergeable-sketch aggregation:
    one tiny sketch row per batch shuffles, never the values) beside the
    exact count and the relative error — register-exact SQL oracle (the HLL
    fold is recomputed in DuckDB); the error bound is also pytest-pinned in
    tests/test_sketches.py."""
    from demeter_ray.stages.sketches import approx_distinct, approx_distinct_tokens

    users = read_table(sf_dir, "events", columns=["user_id"])
    # exact comparison column via the distributed groupby (one row per key,
    # counted by metadata) — never a full-column driver pull
    exact = users.groupby("user_id").count().count()
    est = approx_distinct(users, "user_id", p=12)
    docs = read_table(sf_dir, "documents", columns=["text"])
    vocab_est = approx_distinct_tokens(docs, p=12)
    # an HLL estimate of 0.0 only happens on an EMPTY corpus (any value
    # sets a register), where the SQL fold yields NULL — mirror that
    return pd.DataFrame(
        {
            "metric": ["distinct_users", "distinct_tokens"],
            "estimate": [np.nan if est == 0.0 else round(est, 1),
                         np.nan if vocab_est == 0.0 else round(vocab_est, 1)],
            "exact": [exact, -1],
            "rel_error": [round(abs(est - exact) / exact, 4) if exact else np.nan,
                          -1.0],
        }
    )


@register("reproject_merge_zones", None)
def reproject_merge_zones_q(sf_dir: str):
    """Mixed-CRS mosaic: the fixture's EPSG:32613 elevation tile and the
    EPSG:4326 elevation tiles reproject onto one EPSG:4326 grid
    (average resampling) and merge with the mean method —
    reprojection.py:143-238 semantics distributed per-tile.  Output is one
    row per 32-row stripe of the mosaic (rows-only; the warp math is
    golden-tested in tests/test_warp.py)."""
    import pyarrow.parquet as pq

    from demeter_ray.functions import geo
    from demeter_ray.sources import fixtures as fx
    from demeter_ray.stages.merge import reproject_and_merge_tiles
    from demeter_ray.stages.sample import load_tiles

    fd = fx.generate("tiny")
    tbl = pq.read_table(f"{fd}/raster_tiles.parquet")
    tiles = load_tiles(tbl, "elevation", with_crs=True) + load_tiles(
        tbl, "elevation_utm", with_crs=True
    )
    merged, transform, _nodata, crs = reproject_and_merge_tiles(
        tiles, "EPSG:4326", "average", merge_method="mean"
    )
    rows = []
    for r0 in range(0, merged.shape[0], 32):
        stripe = merged[r0 : r0 + 32]
        rows.append(
            {
                "stripe": r0 // 32,
                "n_valid": int((~np.ma.getmaskarray(stripe)).sum()),
                "mean_value": round(float(stripe.mean()), 4),
            }
        )
    return pd.DataFrame(rows)


def _profile_sql() -> str:
    parts = []
    for c in ("l_quantity", "l_discount", "l_tax", "l_extendedprice"):
        parts.append(f"""
SELECT '{c}' AS col, COUNT({c}) AS n, COUNT(*) - COUNT({c}) AS n_null,
       ROUND(MIN({c}), 4) AS vmin, ROUND(MAX({c}), 4) AS vmax,
       COUNT(DISTINCT {c}) AS ndv
FROM lineitem""")
    return " UNION ALL ".join(parts) + " ORDER BY col"


@register("profile_lineitem_columns", _profile_sql())
def profile_lineitem_columns(sf_dir: str):
    """Table-statistics collection (the engine's ANALYZE): one streaming
    pass for count/nulls/min/max + size-gated EXACT distinct counts
    (driver union under ndv_cap, distributed groupby-count shuffle above —
    both branches parity-tested in tests/test_sketches.py)."""
    from demeter_ray.stages.sketches import profile_numeric_columns

    cols = ["l_quantity", "l_discount", "l_tax", "l_extendedprice"]
    ds = read_table(sf_dir, "lineitem", columns=cols)
    out = profile_numeric_columns(ds, cols)
    out["vmin"] = duck_round(out["vmin"], 4)
    out["vmax"] = duck_round(out["vmax"], 4)
    return out.sort_values("col").reset_index(drop=True)
