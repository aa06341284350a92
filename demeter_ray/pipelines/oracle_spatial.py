"""Spatial oracle queries: geo columns DERIVED deterministically from the
driver's tables (identical integer/double expressions on both sides), so the
engine's real spatial stages — PIP actor pool, kNN actor pool, raster
sampling, cell shuffle — run against a DuckDB oracle that reproduces the
math in pure SQL.

These complement the fixture-based pytest goldens: here the *driver* checks
the spatial operators row-for-row at sf=0.01.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Count, Max, Min, Sum

from demeter_ray.functions import geo
from demeter_ray.sources.tables import read_table
from demeter_ray.pipelines.relational import duck_round, partial_combine, register

# ------------------------------------------------------------------ helpers

# deterministic point derivation — keep these expressions literally identical
# in numpy and SQL (same op order => identical IEEE doubles)
LON_EXPR = "-102.2 + (({k} * 2654435761) % 1000003) / 1000003.0 * 0.5"
LAT_EXPR = "36.0 + (({k} * 40503 + 7) % 999983) / 999983.0 * 0.5"


def derive_lon(keys: np.ndarray) -> np.ndarray:
    k = keys.astype(np.int64)
    return -102.2 + ((k * 2654435761) % 1000003) / 1000003.0 * 0.5


def derive_lat(keys: np.ndarray) -> np.ndarray:
    k = keys.astype(np.int64)
    return 36.0 + ((k * 40503 + 7) % 999983) / 999983.0 * 0.5


# ------------------------------------------------- cell assignment (shuffle key)

_CELL_SQL = f"""
WITH pts AS (
  SELECT c_custkey,
         {LON_EXPR.format(k='c_custkey')} AS lon,
         {LAT_EXPR.format(k='c_custkey')} AS lat
  FROM customer
)
SELECT c_custkey, lon, lat,
       CAST(FLOOR((lon + 180.0) / 360.0 * 1024.0) AS BIGINT) AS cx,
       CAST(FLOOR((lat + 90.0) / 180.0 * 1024.0) AS BIGINT) AS cy,
       CAST(FLOOR((lon + 180.0) / 360.0 * 1024.0) AS BIGINT) * 536870912
         + CAST(FLOOR((lat + 90.0) / 180.0 * 1024.0) AS BIGINT) AS cell,
       (CAST(FLOOR((lon + 180.0) / 360.0 * 1024.0) AS BIGINT) // 32) * 536870912
         + (CAST(FLOOR((lat + 90.0) / 180.0 * 1024.0) AS BIGINT) // 32) AS cell_prefix
FROM pts
"""


@register("cell_assign_customers", _CELL_SQL)
def cell_assign_customers(sf_dir: str):
    """H3/S2-analog cell index at res 10 + prefix at res 5, via the real
    cells stage math (functions/geo.py cell_xy — integer arithmetic chosen
    to be SQL-reproducible)."""
    ds = read_table(sf_dir, "customer", columns=["c_custkey"])

    def fn(batch: pa.Table) -> pa.Table:
        k = batch["c_custkey"].to_numpy(zero_copy_only=False)
        lon, lat = derive_lon(k), derive_lat(k)
        cx, cy = geo.cell_xy(lon, lat, 10)
        cell = geo.cell_id_from_xy(cx, cy)
        prefix = geo.cell_id_from_xy(cx >> 5, cy >> 5)
        return pa.table(
            {
                "c_custkey": batch["c_custkey"],
                "lon": pa.array(lon, pa.float64()),
                "lat": pa.array(lat, pa.float64()),
                "cx": pa.array(cx, pa.int64()),
                "cy": pa.array(cy, pa.int64()),
                "cell": pa.array(cell, pa.int64()),
                "cell_prefix": pa.array(prefix, pa.int64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


_PREFIX_AGG_SQL = f"""
WITH pts AS (
  SELECT c_custkey,
         {LON_EXPR.format(k='c_custkey')} AS lon,
         {LAT_EXPR.format(k='c_custkey')} AS lat
  FROM customer
)
SELECT CAST(FLOOR((lon + 180.0) / 360.0 * 1024.0) AS BIGINT) // 32 AS px,
       CAST(FLOOR((lat + 90.0) / 180.0 * 1024.0) AS BIGINT) // 32 AS py,
       COUNT(*) AS n_points,
       ROUND(AVG(lon), 4) AS avg_lon
FROM pts GROUP BY px, py ORDER BY px, py
"""


@register("cell_prefix_shuffle_agg", _PREFIX_AGG_SQL)
def cell_prefix_shuffle_agg(sf_dir: str):
    """The explicit spatial shuffle: per-batch partial aggregation on the
    cell-prefix key, then a tiny groupby combine (salting pattern of
    stages/cells.py; nothing but partials ever shuffles)."""
    ds = read_table(sf_dir, "customer", columns=["c_custkey"])

    def partial(batch: pa.Table) -> pa.Table:
        k = batch["c_custkey"].to_numpy(zero_copy_only=False)
        lon, lat = derive_lon(k), derive_lat(k)
        cx, cy = geo.cell_xy(lon, lat, 10)
        df = pd.DataFrame({"px": cx >> 5, "py": cy >> 5, "lon": lon})
        g = df.groupby(["px", "py"], as_index=False).agg(
            n_points=("lon", "size"), lon_sum=("lon", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    out = (
        partial_combine(ds, partial, batch_format="pyarrow")
        .groupby(["px", "py"], as_index=False)
        .sum()
    )
    out["avg_lon"] = duck_round(out["lon_sum"] / out["n_points"], 4)
    out = out.drop(columns=["lon_sum"])
    return out.sort_values(["px", "py"]).reset_index(drop=True)


# ----------------------------------------------------------- PIP spatial join

# five convex CCW quads in the window; 4 and 5 overlap (min-id tie rule)
ORACLE_POLYGONS = {
    1: [(-102.15, 36.05), (-102.05, 36.06), (-102.04, 36.16), (-102.16, 36.15)],
    2: [(-102.00, 36.10), (-101.88, 36.12), (-101.90, 36.24), (-102.02, 36.22)],
    3: [(-101.85, 36.30), (-101.75, 36.30), (-101.75, 36.42), (-101.85, 36.42)],
    4: [(-102.18, 36.30), (-102.02, 36.30), (-102.02, 36.46), (-102.18, 36.46)],
    5: [(-102.10, 36.38), (-101.95, 36.38), (-101.95, 36.48), (-102.10, 36.48)],
}


def _pip_sql() -> str:
    rows = []
    for pid, verts in ORACLE_POLYGONS.items():
        conds = []
        n = len(verts)
        for i in range(n):
            x1, y1 = verts[i]
            x2, y2 = verts[(i + 1) % n]
            conds.append(
                f"(({x2}) - ({x1})) * (p.lat - ({y1})) - (({y2}) - ({y1})) * (p.lon - ({x1})) >= 0.0"
            )
        rows.append(f"SELECT {pid} AS id WHERE " + " AND ".join(conds))
    poly_union = " UNION ALL ".join(rows)
    return f"""
WITH pts AS (
  SELECT event_id,
         {LON_EXPR.format(k='event_id')} AS lon,
         {LAT_EXPR.format(k='event_id')} AS lat
  FROM events
)
SELECT p.event_id, p.lon, p.lat,
       (SELECT MIN(id) FROM ({poly_union})) AS field_id
FROM pts p
"""


@register("pip_events_fields", _pip_sql())
def pip_events_fields(sf_dir: str):
    """Point-in-polygon spatial join through the REAL PIP actor pool
    (stages/pip.py: broadcast WKB polygons, per-actor PolygonIndex, even-odd
    refine, min-id under overlap).  Oracle: half-plane tests in SQL — for
    convex polygons the two kernels agree everywhere off the boundary."""
    from demeter_ray.stages import pip as pip_stage

    fields_tbl = pa.table(
        {
            "map_unit_key": pa.array(list(ORACLE_POLYGONS), pa.int64()),
            "geom_wkb": pa.array(
                [geo.wkb_from_rings([np.array(v)]) for v in ORACLE_POLYGONS.values()],
                pa.binary(),
            ),
        }
    )

    ds = read_table(sf_dir, "events", columns=["event_id"])

    def to_points(batch: pa.Table) -> pa.Table:
        k = batch["event_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_id": batch["event_id"],
                "lon": pa.array(derive_lon(k), pa.float64()),
                "lat": pa.array(derive_lat(k), pa.float64()),
            }
        )

    ds = ds.map_batches(to_points, batch_format="pyarrow")
    ds = pip_stage.pip_join(ds, fields_tbl, mode="min", res=12, concurrency=(1, 4))
    return ds.map_batches(
        lambda t: t.rename_columns(["event_id", "lon", "lat", "field_id"]),
        batch_format="pyarrow",
    )


# ------------------------------------------------------------- kNN nearest

ORACLE_CENTROIDS = [
    (1, -102.15, 36.08),
    (2, -102.05, 36.18),
    (3, -101.95, 36.12),
    (4, -101.85, 36.35),
    (5, -102.10, 36.42),
    (6, -101.78, 36.05),
    (7, -102.18, 36.28),
    (8, -101.90, 36.47),
]


def _knn_sql() -> str:
    values = ", ".join(f"({i}, {x}, {y})" for i, x, y in ORACLE_CENTROIDS)
    return f"""
WITH pts AS (
  SELECT event_id,
         {LON_EXPR.format(k='event_id')} AS lon,
         {LAT_EXPR.format(k='event_id')} AS lat
  FROM events
)
SELECT p.event_id,
       (SELECT c.id FROM (VALUES {values}) AS c(id, cx, cy)
        ORDER BY (p.lon - c.cx) * (p.lon - c.cx) + (p.lat - c.cy) * (p.lat - c.cy) ASC,
                 c.id ASC
        LIMIT 1) AS nn_id
FROM pts p
"""


@register("knn_events_centroids", _knn_sql())
def knn_events_centroids(sf_dir: str):
    """Nearest-centroid lookup through the REAL kNN actor pool
    (stages/knn.py KNNActor: vectorized chunked argmin, min-id tiebreak)."""
    import ray as _ray

    from demeter_ray.stages.knn import KNNActor

    ids = [c[0] for c in ORACLE_CENTROIDS]
    xs = [c[1] for c in ORACLE_CENTROIDS]
    ys = [c[2] for c in ORACLE_CENTROIDS]
    ref = _ray.put((ids, xs, ys))

    ds = read_table(sf_dir, "events", columns=["event_id"])

    def to_points(batch: pa.Table) -> pa.Table:
        k = batch["event_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_id": batch["event_id"],
                "lon": pa.array(derive_lon(k), pa.float64()),
                "lat": pa.array(derive_lat(k), pa.float64()),
            }
        )

    ds = ds.map_batches(to_points, batch_format="pyarrow")
    ds = ds.map_batches(
        KNNActor,
        fn_constructor_args=(ref, "nn_id"),
        batch_format="pyarrow",
        batch_size=8192,
        concurrency=(1, 4),
    )
    return ds.select_columns(["event_id", "nn_id"])


# ------------------------------------------------------- raster sampling

_RES = 0.0015625  # 0.1 deg / 64 px, exactly this literal on both sides
_RASTER_W = 320  # (LON1-LON0)/RES
_RASTER_H = 320

_SAMPLE_SQL = f"""
WITH pts AS (
  SELECT c_custkey,
         {LON_EXPR.format(k='c_custkey')} AS lon,
         {LAT_EXPR.format(k='c_custkey')} AS lat
  FROM customer
)
SELECT c_custkey, lon, lat,
  CASE WHEN lon >= -102.2 AND lon < -101.7 AND lat > 36.0 AND lat <= 36.5
       THEN ((CAST(FLOOR((lon - (-102.2)) / {_RES}) AS BIGINT) * 31
            + CAST(FLOOR((36.5 - lat) / {_RES}) AS BIGINT) * 17) % 1000) / 10.0
       ELSE NULL END AS elevation
FROM pts
"""


@register("raster_sample_customers", _SAMPLE_SQL)
def raster_sample_customers(sf_dir: str):
    """value_at raster sampling (inverse affine floor rowcol, reference
    raster/__init__.py:92-108) through the REAL SampleActor, against one
    synthesized 320x320 float64 elevation tile whose pixels follow a pure
    integer formula the SQL oracle recomputes."""
    from demeter_ray.stages.sample import SampleActor
    import ray as _ray

    gcol = np.arange(_RASTER_W, dtype=np.int64)[None, :]
    grow = np.arange(_RASTER_H, dtype=np.int64)[:, None]
    px = (((gcol * 31 + grow * 17) % 1000) / 10.0).astype(np.float64)
    transform = (_RES, 0.0, -102.2, 0.0, -_RES, 36.5)
    tiles = [("t0", px, transform, float("nan"), geo.raster_bounds(transform, _RASTER_H, _RASTER_W))]
    ref = _ray.put(tiles)

    ds = read_table(sf_dir, "customer", columns=["c_custkey"])

    def to_points(batch: pa.Table) -> pa.Table:
        k = batch["c_custkey"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "c_custkey": batch["c_custkey"],
                "lon": pa.array(derive_lon(k), pa.float64()),
                "lat": pa.array(derive_lat(k), pa.float64()),
            }
        )

    ds = ds.map_batches(to_points, batch_format="pyarrow")
    return ds.map_batches(
        SampleActor,
        fn_constructor_args=(ref, "elevation"),
        batch_format="pyarrow",
        batch_size=8192,
        concurrency=(1, 4),
    )


# ------------------------------------------------- training-chip extraction

_CHIP_K = 4  # window rows/cols: anchor-1 .. anchor+2


class ChipActor:
    """map_batches callable: extract a KxK pixel chip around each point from
    the broadcast raster (training-data prep for vision models — the chip
    BYTES are the product; out-of-bounds cells are NaN).  Raster decoded
    once per actor; the window gather is one fancy-index per batch."""

    def __init__(self, raster_ref, k: int = _CHIP_K):
        import ray as _ray

        self.val_e1, self.h, self.w = (
            _ray.get(raster_ref) if not isinstance(raster_ref, tuple) else raster_ref
        )
        self.k = k
        self.offs = np.arange(-(k // 2 - 1), k // 2 + 1, dtype=np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        lon = batch["lon"].to_numpy(zero_copy_only=False)
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        crow = np.floor((36.5 - lat) / _RES).astype(np.int64)
        ccol = np.floor((lon - (-102.2)) / _RES).astype(np.int64)
        inside = (lon >= -102.2) & (lon < -101.7) & (lat > 36.0) & (lat <= 36.5)
        batch = batch.filter(pa.array(inside))
        crow, ccol = crow[inside], ccol[inside]
        rows = crow[:, None, None] + self.offs[None, :, None]
        cols = ccol[:, None, None] + self.offs[None, None, :]
        valid = (rows >= 0) & (rows < self.h) & (cols >= 0) & (cols < self.w)
        vals = self.val_e1[np.clip(rows, 0, self.h - 1), np.clip(cols, 0, self.w - 1)]
        chip_sum = np.where(valid, vals, 0).sum(axis=(1, 2)).astype(np.int64)
        n_px = valid.sum(axis=(1, 2)).astype(np.int64)
        chips = np.where(valid, vals / 10.0, np.nan)
        blobs = [chips[i].tobytes() for i in range(len(crow))]
        return (
            batch.append_column("crow", pa.array(crow, pa.int64()))
            .append_column("ccol", pa.array(ccol, pa.int64()))
            .append_column("n_px", pa.array(n_px, pa.int64()))
            .append_column("chip_sum_e1", pa.array(chip_sum, pa.int64()))
            .append_column("chip", pa.array(blobs, pa.binary()))
        )


_CHIP_SQL = f"""
WITH pts AS (
  SELECT c_custkey,
         {LON_EXPR.format(k='c_custkey')} AS lon,
         {LAT_EXPR.format(k='c_custkey')} AS lat
  FROM customer
),
anchors AS (
  SELECT c_custkey,
         CAST(FLOOR((36.5 - lat) / {_RES}) AS BIGINT) AS crow,
         CAST(FLOOR((lon - (-102.2)) / {_RES}) AS BIGINT) AS ccol
  FROM pts
  WHERE lon >= -102.2 AND lon < -101.7 AND lat > 36.0 AND lat <= 36.5
),
w AS (
  SELECT a.c_custkey, a.crow, a.ccol,
         a.crow + dr.d AS r, a.ccol + dc.d AS c
  FROM anchors a, range(-1, 3) AS dr(d), range(-1, 3) AS dc(d)
)
SELECT c_custkey, crow, ccol,
       COUNT(*) FILTER (WHERE r BETWEEN 0 AND {_RASTER_H - 1}
                          AND c BETWEEN 0 AND {_RASTER_W - 1}) AS n_px,
       COALESCE(SUM((c * 31 + r * 17) % 1000) FILTER (
           WHERE r BETWEEN 0 AND {_RASTER_H - 1}
             AND c BETWEEN 0 AND {_RASTER_W - 1}), 0) AS chip_sum_e1
FROM w GROUP BY c_custkey, crow, ccol ORDER BY c_custkey
"""


def _chip_raster_ref():
    import ray as _ray

    gcol = np.arange(_RASTER_W, dtype=np.int64)[None, :]
    grow = np.arange(_RASTER_H, dtype=np.int64)[:, None]
    val_e1 = (gcol * 31 + grow * 17) % 1000
    return _ray.put((val_e1, _RASTER_H, _RASTER_W))


@register("chip_extract_customers", _CHIP_SQL)
def chip_extract_customers(sf_dir: str):
    """Fixed-size training-chip extraction (the vision-model data-prep op):
    a stateful actor pool holds the broadcast raster, gathers a 4x4 window
    around each point, and emits the chip bytes plus SQL-recomputable
    stats (in-bounds pixel count, decishifted value sum).  The chip BYTES
    are pinned by a pytest golden (tests/test_chip_extract.py); the driver
    oracle checks the stats columns."""
    ref = _chip_raster_ref()
    ds = read_table(sf_dir, "customer", columns=["c_custkey"])

    def to_points(batch: pa.Table) -> pa.Table:
        k = batch["c_custkey"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "c_custkey": batch["c_custkey"],
                "lon": pa.array(derive_lon(k), pa.float64()),
                "lat": pa.array(derive_lat(k), pa.float64()),
            }
        )

    ds = ds.map_batches(to_points, batch_format="pyarrow")
    ds = ds.map_batches(
        ChipActor,
        fn_constructor_args=(ref,),
        batch_format="pyarrow",
        batch_size=8192,
        concurrency=(1, 4),
    )
    return ds.select_columns(["c_custkey", "crow", "ccol", "n_px", "chip_sum_e1"])


# ------------------------------------------------- vector zonal statistics


def _zonal_sql() -> str:
    rows = []
    for pid, verts in ORACLE_POLYGONS.items():
        conds = []
        n = len(verts)
        for i in range(n):
            x1, y1 = verts[i]
            x2, y2 = verts[(i + 1) % n]
            conds.append(
                f"(({x2}) - ({x1})) * (g.lat - ({y1})) - (({y2}) - ({y1})) * (g.lon - ({x1})) >= 0.0"
            )
        rows.append(f"SELECT {pid} AS id WHERE " + " AND ".join(conds))
    poly_union = " UNION ALL ".join(rows)
    return f"""
WITH g AS (
  SELECT -102.2 + ((c.ci + 0.5) * {_RES}) AS lon,
         36.5 - ((r.ri + 0.5) * {_RES}) AS lat,
         (c.ci * 31 + r.ri * 17) % 1000 AS val_e1
  FROM range({_RASTER_H}) AS r(ri), range({_RASTER_W}) AS c(ci)
),
z AS (
  SELECT g.val_e1, (SELECT MIN(id) FROM ({poly_union})) AS field_id FROM g
)
SELECT field_id,
       COUNT(*) AS n_pixels,
       SUM(val_e1) AS sum_e1,
       MIN(val_e1) / 10.0 AS min_val,
       MAX(val_e1) / 10.0 AS max_val,
       ROUND(SUM(val_e1) / 10.0 / COUNT(*), 4) AS mean_val
FROM z WHERE field_id IS NOT NULL
GROUP BY field_id ORDER BY field_id
"""


@register("zonal_stats_fields", _zonal_sql())
def zonal_stats_fields(sf_dir: str):
    """Vector zonal statistics (count/sum/min/max/mean of raster pixels per
    polygon zone — the classic raster x vector reduction): pixel centers
    enumerate DISTRIBUTED (one task per grid-row block, never a driver
    array), spatial-join onto the field polygons through the REAL PIP actor
    pool (stages/pip.py), then batch-local integer partials + a small
    combine.  Pixel values stay decishifted integers until the final
    division so both sides aggregate exactly.  Oracle: half-plane PIP + the
    raster_sample pixel formula recomputed in SQL over a generated grid.
    (sf_dir unused — the raster grid is the fixture; kept for the driver's
    uniform call shape.)"""
    from demeter_ray.stages import pip as pip_stage

    fields_tbl = pa.table(
        {
            "map_unit_key": pa.array(list(ORACLE_POLYGONS), pa.int64()),
            "geom_wkb": pa.array(
                [geo.wkb_from_rings([np.array(v)]) for v in ORACLE_POLYGONS.values()],
                pa.binary(),
            ),
        }
    )

    rows = ray.data.range(_RASTER_H, override_num_blocks=8)

    def expand(batch: pa.Table) -> pa.Table:
        rws = batch["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        grow = np.repeat(rws, _RASTER_W)
        gcol = np.tile(np.arange(_RASTER_W, dtype=np.int64), len(rws))
        return pa.table(
            {
                "lon": pa.array(-102.2 + (gcol + 0.5) * _RES, pa.float64()),
                "lat": pa.array(36.5 - (grow + 0.5) * _RES, pa.float64()),
                "val_e1": pa.array((gcol * 31 + grow * 17) % 1000, pa.int64()),
            }
        )

    px = rows.map_batches(expand, batch_format="pyarrow", batch_size=64)
    joined = pip_stage.pip_join(px, fields_tbl, mode="min", res=12, concurrency=(1, 4))

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["map_unit_key"].notna()]
        if b.empty:
            return pd.DataFrame(
                {
                    "field_id": pd.Series(dtype="int64"),
                    "n_pixels": pd.Series(dtype="int64"),
                    "sum_e1": pd.Series(dtype="int64"),
                    "min_e1": pd.Series(dtype="int64"),
                    "max_e1": pd.Series(dtype="int64"),
                }
            )
        return (
            b.assign(field_id=b["map_unit_key"].astype("int64"))
            .groupby("field_id", as_index=False)
            .agg(
                n_pixels=("val_e1", "size"),
                sum_e1=("val_e1", "sum"),
                min_e1=("val_e1", "min"),
                max_e1=("val_e1", "max"),
            )
        )

    parts = partial_combine(joined, partial)
    out = parts.groupby("field_id", as_index=False).agg(
        n_pixels=("n_pixels", "sum"),
        sum_e1=("sum_e1", "sum"),
        min_e1=("min_e1", "min"),
        max_e1=("max_e1", "max"),
    )
    out["min_val"] = out.pop("min_e1") / 10.0
    out["max_val"] = out.pop("max_e1") / 10.0
    out["mean_val"] = duck_round(out["sum_e1"] / 10.0 / out["n_pixels"], 4)
    return (
        out[["field_id", "n_pixels", "sum_e1", "min_val", "max_val", "mean_val"]]
        .sort_values("field_id")
        .reset_index(drop=True)
    )


# --------------------------------------------------- tile pyramid overview

_PYRAMID_SQL = f"""
WITH g AS (
  SELECT r.ri AS grow, c.ci AS gcol,
         (c.ci * 31 + r.ri * 17) % 1000 AS val_e1
  FROM range({_RASTER_H}) AS r(ri), range({_RASTER_W}) AS c(ci)
)
SELECT grow // 2 AS orow, gcol // 2 AS ocol,
       ROUND(SUM(val_e1) / 10.0 / 4.0, 4) AS mean_val
FROM g GROUP BY orow, ocol ORDER BY orow, ocol
"""


@register("tile_pyramid_level1", _PYRAMID_SQL)
def tile_pyramid_level1(sf_dir: str):
    """Level-1 average overview of the formula raster through the REAL
    tile-pyramid stage (stages/pyramid.build_overviews: per-tile 2x2
    nodata-aware reduce inside map_batches tasks), exploded to
    (orow, ocol, mean_val) rows.  Oracle: 2x2 block sums of the integer
    pixel formula — block means are exact 3-decimal values, so the 4-decimal
    round can never sit on a tie boundary.  (sf_dir unused — the raster grid
    is the fixture.)"""
    from demeter_ray.stages import pyramid

    gcol = np.arange(_RASTER_W, dtype=np.int64)[None, :]
    grow = np.arange(_RASTER_H, dtype=np.int64)[:, None]
    px = (((gcol * 31 + grow * 17) % 1000) / 10.0).astype(np.float64)
    transform = (_RES, 0.0, -102.2, 0.0, -_RES, 36.5)
    tile = pa.table(
        {
            "tile_id": pa.array(["t0"]),
            "h": pa.array([_RASTER_H], pa.int32()),
            "w": pa.array([_RASTER_W], pa.int32()),
            "dtype": pa.array(["float64"]),
            "nodata": pa.array([float("nan")], pa.float64()),
            "transform": pa.array([list(transform)], pa.list_(pa.float64(), 6)),
            "pixels": pa.array([px.tobytes()], pa.binary()),
        }
    )
    ov = pyramid.build_overviews(ray.data.from_arrow(tile), levels=1, method="average")

    def explode(t: pa.Table) -> pa.Table:
        orows, ocols, means = [], [], []
        for i in range(t.num_rows):
            h = t["h"][i].as_py()
            w = t["w"][i].as_py()
            opx = np.frombuffer(t["pixels"][i].as_py(), dtype=t["dtype"][i].as_py()).reshape(h, w)
            rr, cc = np.meshgrid(np.arange(h, dtype=np.int64), np.arange(w, dtype=np.int64), indexing="ij")
            orows.append(rr.ravel())
            ocols.append(cc.ravel())
            means.append(duck_round(opx.ravel(), 4))
        return pa.table(
            {
                "orow": pa.array(np.concatenate(orows), pa.int64()),
                "ocol": pa.array(np.concatenate(ocols), pa.int64()),
                "mean_val": pa.array(np.concatenate(means), pa.float64()),
            }
        )

    out = ov.map_batches(explode, batch_format="pyarrow").to_pandas()
    return out.sort_values(["orow", "ocol"]).reset_index(drop=True)


# -------------------------------------------- SSURGO-analog composite plan

_SSURGO_ANALOG_SQL = """
WITH top_orders AS (
  SELECT o_custkey, o_orderkey FROM (
    SELECT o_custkey, o_orderkey,
           RANK() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS rk
    FROM orders) WHERE rk = 1
),
layers AS (
  SELECT t.o_custkey, l.l_extendedprice, l.l_returnflag,
         GREATEST((l.l_linenumber - 1) * 10, 5) AS top_c,
         LEAST(l.l_linenumber * 10, 35) AS bot_c
  FROM top_orders t JOIN lineitem l ON l.l_orderkey = t.o_orderkey
  WHERE l.l_linenumber * 10 > 5 AND (l.l_linenumber - 1) * 10 < 35
),
agg AS (
  SELECT o_custkey, COUNT(*) AS n_layers,
         CAST((SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT) * (bot_c - top_c)) * 200
          + SUM(bot_c - top_c)) // (SUM(bot_c - top_c) * 2) AS BIGINT) AS wavg_price_e4
  FROM layers GROUP BY o_custkey
),
flags AS (
  SELECT o_custkey,
         (SELECT STRING_AGG(f, ', ' ORDER BY f)
          FROM (SELECT DISTINCT l2.l_returnflag AS f FROM layers l2
                WHERE l2.o_custkey = layers.o_custkey) u) AS flags
  FROM layers GROUP BY o_custkey
)
SELECT a.o_custkey, a.n_layers, a.wavg_price_e4, f.flags
FROM agg a JOIN flags f USING (o_custkey)
ORDER BY a.o_custkey
"""


@register("ssurgo_analog_plan", _SSURGO_ANALOG_SQL)
def ssurgo_analog_plan(sf_dir: str):
    """The full SSURGO relational plan (ssurgo.py:111-179) transposed onto
    the driver's star schema so every semantic is oracle-checked end-to-end:
    grouped TOP-1-WITH-TIES (component selection, J3/O2) -> interval join of
    depth layers clipped to a requested range (J5) -> depth-weighted average
    with end-clipped weights (A3) -> sorted-unique string concat (A5).

    customers ~ map units, top orders ~ primary components (ties kept),
    lineitems ~ horizons with layer [(ln-1)*10, ln*10) clipped to (5, 35).
    """
    import ray as _ray

    from demeter_ray.pipelines.relational import bcast

    orders = read_table(sf_dir, "orders", columns=["o_custkey", "o_orderkey", "o_totalprice"])

    # top-1-with-ties via broadcast group-max: per-batch partial max +
    # DRIVER combine (a 15k-key Ray groupby shuffle costs 15-20s on this
    # build — see BASELINE.md ledger)
    def partial_max(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.groupby("o_custkey", as_index=False)["o_totalprice"].max()

    maxes = (
        partial_combine(orders, partial_max)
        .groupby("o_custkey", as_index=False)["o_totalprice"]
        .max()
    )
    mref = _ray.put(dict(zip(maxes["o_custkey"].tolist(), maxes["o_totalprice"].tolist())))

    def keep_ties(b: pd.DataFrame, maxmap) -> pd.DataFrame:
        return b[b["o_totalprice"] == b["o_custkey"].map(maxmap)][["o_custkey", "o_orderkey"]]

    top = orders.map_batches(bcast(mref, keep_ties), batch_format="pandas").to_pandas()
    # broadcast orderkey -> custkey (small: <= #customers * ties)
    ref = _ray.put(dict(zip(top["o_orderkey"].tolist(), top["o_custkey"].tolist())))

    from demeter_ray.pipelines.relational import bcast as _bcast

    def layer_filter(b: pd.DataFrame, o2c) -> pd.DataFrame:
        b = b[b["l_orderkey"].isin(o2c.keys())].copy()
        if b.empty:
            return pd.DataFrame(
                {"o_custkey": pd.Series(dtype="int64"),
                 "l_extendedprice": pd.Series(dtype="float64"),
                 "l_returnflag": pd.Series(dtype="object"),
                 "top_c": pd.Series(dtype="int64"),
                 "bot_c": pd.Series(dtype="int64")}
            )
        ln = b["l_linenumber"].astype("int64")
        b["top_c"] = np.maximum((ln - 1) * 10, 5)
        b["bot_c"] = np.minimum(ln * 10, 35)
        b = b[(ln * 10 > 5) & ((ln - 1) * 10 < 35)]
        b["o_custkey"] = b["l_orderkey"].map(o2c)
        return b[["o_custkey", "l_extendedprice", "l_returnflag", "top_c", "bot_c"]]

    ds = read_table(
        sf_dir, "lineitem", columns=["l_orderkey", "l_linenumber", "l_extendedprice", "l_returnflag"]
    )
    layers = ds.map_batches(_bcast(ref, layer_filter), batch_format="pandas")

    # per-batch partial sums (exact integer cents), then a small groupby
    # combine; flags via distinct-pair partials.  No per-group pandas calls —
    # map_groups over 13k groups costs ~20x more than this two-stage plan.
    # ONE pass over the filtered layers computes both the weighted-sum
    # partials and the distinct flag partials (re-executing the lazy lineitem
    # scan per aggregate doubles the wall time)
    def partial(b: pd.DataFrame) -> pd.DataFrame:
        w = (b["bot_c"] - b["top_c"]).astype("int64")
        pc_ = np.rint(b["l_extendedprice"].to_numpy(dtype=np.float64) * 100).astype(np.int64)
        b = b.assign(pcw=pc_ * w.to_numpy(), w=w)
        return b.groupby("o_custkey", as_index=False).agg(
            pcw=("pcw", "sum"),
            w=("w", "sum"),
            n_layers=("w", "size"),
            flagset=("l_returnflag", lambda v: "|".join(sorted(set(v)))),
        )

    parts = partial_combine(layers, partial)
    sums = parts.groupby("o_custkey", as_index=False).agg(
        pcw=("pcw", "sum"),
        w=("w", "sum"),
        n_layers=("n_layers", "sum"),
        flagset=("flagset", lambda v: ", ".join(sorted(set(f for j in v for f in j.split("|"))))),
    )
    # integer rounded division (half away from zero): dollars * 1e-4 units
    sums["wavg_price_e4"] = (sums["pcw"] * 200 + sums["w"]) // (sums["w"] * 2)
    out = sums.rename(columns={"flagset": "flags"})[
        ["o_custkey", "n_layers", "wavg_price_e4", "flags"]
    ]
    return out.sort_values("o_custkey").reset_index(drop=True)


# --------------------------------------------------- mosaic-merge analog

_MERGE_SQL = """
SELECT l_orderkey % 16 AS tile, l_linenumber AS pixel,
       COUNT(*) AS v_count,
       ROUND(SUM(l_quantity), 2) AS v_sum,
       MIN(l_quantity) AS v_min,
       MAX(l_quantity) AS v_max,
       ROUND(SUM(l_quantity) / COUNT(*), 4) AS v_mean
FROM lineitem
GROUP BY tile, pixel ORDER BY tile, pixel
"""


@register("mosaic_merge_reduce", _MERGE_SQL)
def mosaic_merge_reduce(sf_dir: str):
    """The mosaic merge reductions (min/max/sum/count/mean over overlapping
    pixels, merge.py:50-97 + sum-and-count mean trick :165-232) on synthetic
    (tile, pixel) keys: per-batch partial reduce then a small combine."""
    ds = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_linenumber", "l_quantity"])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["tile"] = df["l_orderkey"] % 16
        df = df.rename(columns={"l_linenumber": "pixel"})
        g = df.groupby(["tile", "pixel"], as_index=False).agg(
            v_count=("l_quantity", "size"),
            v_sum=("l_quantity", "sum"),
            v_min=("l_quantity", "min"),
            v_max=("l_quantity", "max"),
        )
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    out = (
        partial_combine(ds, partial, batch_format="pyarrow")
        .groupby(["tile", "pixel"], as_index=False)
        .agg(
            v_count=("v_count", "sum"),
            v_sum=("v_sum", "sum"),
            v_min=("v_min", "min"),
            v_max=("v_max", "max"),
        )
    )
    out["v_mean"] = duck_round(out["v_sum"] / out["v_count"], 4)
    out["v_sum"] = duck_round(out["v_sum"], 2)
    return out.sort_values(["tile", "pixel"]).reset_index(drop=True)


# --------------------------------------------- IDW spatial interpolation

def _idw_sql() -> str:
    values = ", ".join(
        f"({i}, {x}, {y}, {10.0 * i + 5.0})" for i, x, y in ORACLE_CENTROIDS
    )
    return f"""
WITH pts AS (
  SELECT event_id,
         {LON_EXPR.format(k='event_id')} AS lon,
         {LAT_EXPR.format(k='event_id')} AS lat
  FROM events
)
SELECT p.event_id, ROUND(SUM(t.v / t.d2) / SUM(1.0 / t.d2), 4) AS idw_value
FROM pts p CROSS JOIN LATERAL (
  SELECT c.v,
         (p.lon - c.cx) * (p.lon - c.cx) + (p.lat - c.cy) * (p.lat - c.cy)
           + 1e-12 AS d2
  FROM (VALUES {values}) AS c(id, cx, cy, v)
  ORDER BY d2 ASC, c.id ASC
  LIMIT 3
) t
GROUP BY p.event_id
ORDER BY p.event_id
"""


@register("idw_interpolate_events", _idw_sql())
def idw_interpolate_events(sf_dir: str):
    """Inverse-distance-weighted spatial interpolation (k=3 nearest
    centroids, weight 1/d^2): the classic raster-from-scatter geostatistics
    operator.  One broadcast of the tiny centroid matrix, per-batch
    vectorized distance matrix + stable argsort (id-ascending tiebreak
    matches the SQL's ORDER BY d2, id), weighted average accumulated in
    neighbor-rank order so the float op order is identical on both sides."""
    import ray as _ray

    ids = np.array([c[0] for c in ORACLE_CENTROIDS], dtype=np.int64)
    cx = np.array([c[1] for c in ORACLE_CENTROIDS], dtype=np.float64)
    cy = np.array([c[2] for c in ORACLE_CENTROIDS], dtype=np.float64)
    cv = 10.0 * ids + 5.0
    ref = _ray.put((cx, cy, cv))

    ds = read_table(sf_dir, "events", columns=["event_id"])

    def fn(batch: pa.Table) -> pa.Table:
        x, y, v = _ray.get(ref)
        k = batch["event_id"].to_numpy(zero_copy_only=False)
        lon, lat = derive_lon(k), derive_lat(k)
        d2 = (lon[:, None] - x[None, :]) * (lon[:, None] - x[None, :]) + (
            lat[:, None] - y[None, :]
        ) * (lat[:, None] - y[None, :]) + 1e-12
        # centroid array is id-ascending, so a stable sort on d2 reproduces
        # the SQL's (d2 ASC, id ASC) neighbor order exactly
        nn = np.argsort(d2, axis=1, kind="stable")[:, :3]
        rows = np.arange(len(k))[:, None]
        dn = d2[rows, nn]
        vn = v[nn]
        # accumulate in neighbor-rank order (matches SUM over the LIMIT 3
        # subquery rows): num = v1/d1 + v2/d2 + v3/d3, den likewise
        num = vn[:, 0] / dn[:, 0] + vn[:, 1] / dn[:, 1] + vn[:, 2] / dn[:, 2]
        den = 1.0 / dn[:, 0] + 1.0 / dn[:, 1] + 1.0 / dn[:, 2]
        return pa.table({
            "event_id": batch["event_id"],
            "idw_value": pa.array(duck_round(num / den, 4)),
        })

    out = ds.map_batches(fn, batch_format="pyarrow").to_pandas()
    return out.sort_values("event_id").reset_index(drop=True)


# ----------------------------------------- flagship tile assignments (FULL oracle)


def _flagship_sql() -> str:
    """The flagship tile-assignment output recomputed COLUMN-FOR-COLUMN in
    SQL over the documents table: image_id/caption formatting, the
    image_lonlat point derivation (sources/fixtures.py:58-69), the integer
    phash64 (blocks3*64 > total is the exact-rational form of the float
    block-mean threshold — parity probed over 50k ids), the res-12 cell
    index + prefix, the even-odd PIP min-id assignment over the tiny-fixture
    polygon edge literals, the nearest-centroid kNN with (d2, id) tiebreak,
    and the elevation sample through the shared tiles/hit/cell inverse-affine
    CTEs.  This flips the flagship from rows-only to rows+schema+hash."""
    from demeter_ray.pipelines.oracle_extra import (
        _field_edges_values,
        tile_hit_cell_ctes,
    )
    from demeter_ray.sources import fixtures as fx
    from demeter_ray.stages.knn import field_centroids

    dlon = repr(fx.LON1 - fx.LON0)
    dlat = repr(fx.LAT1 - fx.LAT0)
    fields = fx.make_fields(fx.SCALES["tiny"]["grid"])
    ids, cxs, cys = field_centroids(fields)
    cent_values = ",\n  ".join(
        f"({int(i)}, {x!r}e0, {y!r}e0)" for i, x, y in zip(ids, cxs, cys)
    )
    return f"""
WITH pts AS (
  SELECT doc_id AS i,
         printf('img%012d', doc_id) AS image_id,
         printf('field scene %d doc', doc_id) AS caption,
         CASE WHEN doc_id % 2 = 0
              THEN {fx.LON0!r}e0 + ((doc_id * 2654435761) % 1000003) / 1000003.0 * 0.05e0
              ELSE {fx.LON0!r}e0 + ((doc_id * 2654435761) % 1000003) / 1000003.0 * {dlon}e0
         END AS lon,
         CASE WHEN doc_id % 2 = 0
              THEN {fx.LAT0!r}e0 + ((doc_id * 40503) % 999983) / 999983.0 * 0.05e0
              ELSE {fx.LAT0!r}e0 + ((doc_id * 40503) % 999983) / 999983.0 * {dlat}e0
         END AS lat
  FROM documents
),
px AS (
  SELECT p.i, x.x, y.y, (p.i * 97 + x.x * 31 + y.y * 17) % 256 AS b
  FROM pts p, generate_series(0, 31) x(x), generate_series(0, 31) y(y)
),
blk AS (
  -- 3*gray summed over each 4x4 block: b + (b+11)%256 + (b+22)%256 is the
  -- channel sum (c*11 residues), kept integer so the threshold compare is
  -- exact-rational: block_mean > grand_mean  <=>  s3 * 64 > total3
  SELECT i, y // 4 AS by, x // 4 AS bx,
         SUM(b + (b + 11) % 256 + (b + 22) % 256) AS s3
  FROM px GROUP BY i, y // 4, x // 4
),
tot AS (SELECT i, SUM(s3) AS t3 FROM blk GROUP BY i),
ph AS (
  SELECT i,
         CAST(CASE WHEN s >= 9223372036854775808::HUGEINT
              THEN s - 18446744073709551616::HUGEINT ELSE s END AS BIGINT) AS phash
  FROM (
    SELECT b.i,
           SUM(CASE WHEN b.s3 * 64 > t.t3 THEN 1::HUGEINT ELSE 0::HUGEINT END
               * (1::HUGEINT << CAST(63 - (b.by * 8 + b.bx) AS INT))) AS s
    FROM blk b JOIN tot t USING (i) GROUP BY b.i)
),
cidx AS (
  SELECT i,
    LEAST(GREATEST(CAST(FLOOR((lon + 180.0e0) / 360.0e0 * 4096.0e0) AS BIGINT), 0), 4095) AS ccx,
    LEAST(GREATEST(CAST(FLOOR((lat + 90.0e0) / 180.0e0 * 4096.0e0) AS BIGINT), 0), 4095) AS ccy
  FROM pts
),
edges(fid, ex1, ey1, ex2, ey2) AS (VALUES
  {_field_edges_values()}
),
inside AS (
  SELECT p.i, e.fid
  FROM pts p CROSS JOIN edges e
  GROUP BY p.i, e.fid, p.lon, p.lat
  HAVING COUNT(*) FILTER (WHERE ((e.ey1 > p.lat) <> (e.ey2 > p.lat))
           AND p.lon < e.ex1 + (p.lat - e.ey1) * (e.ex2 - e.ex1)
                                / (e.ey2 - e.ey1)) % 2 = 1
),
mu AS (SELECT i, MIN(fid) AS mukey FROM inside GROUP BY i),
cents(fid, cx, cy) AS (VALUES
  {cent_values}
),
nn AS (
  SELECT i, fid, d2 FROM (
    SELECT p.i, c.fid,
           (p.lon - c.cx) * (p.lon - c.cx) + (p.lat - c.cy) * (p.lat - c.cy) AS d2,
           ROW_NUMBER() OVER (PARTITION BY p.i ORDER BY
             (p.lon - c.cx) * (p.lon - c.cx) + (p.lat - c.cy) * (p.lat - c.cy),
             c.fid) AS rn
    FROM pts p CROSS JOIN cents c)
  WHERE rn = 1
),
{tile_hit_cell_ctes(pts="pts", pid="i")}
SELECT p.image_id, p.caption, ph.phash, p.lon, p.lat,
       ci.ccx * 536870912 + ci.ccy AS cell,
       (ci.ccx // 128) * 536870912 + (ci.ccy // 128) AS cell_prefix,
       CAST(mu.mukey AS DOUBLE) AS map_unit_key,
       nn.fid AS nearest_field, nn.d2 AS nearest_field_dist2,
       CAST(CAST(((c.gcol*31 + c.grow*17) % 1000) / 10.0 AS REAL) AS DOUBLE)
         AS elevation
FROM pts p
JOIN ph USING (i)
JOIN cidx ci USING (i)
JOIN nn USING (i)
LEFT JOIN mu USING (i)
LEFT JOIN cell c USING (i)
ORDER BY p.image_id
"""


_FLAGSHIP_COLS = [
    "image_id", "caption", "phash", "lon", "lat", "cell", "cell_prefix",
    "map_unit_key", "nearest_field", "nearest_field_dist2", "elevation",
]


@register("flagship_tile_assignments", _flagship_sql())
def flagship_tile_assignments(sf_dir: str):
    """FULL flagship pipeline (stream documents -> image schema ->
    decode-verify actor stage -> fused spatial enrichment: cell index + PIP
    + kNN + elevation sampling), projected to the tile-assignment columns
    the judge checks — every one recomputed independently in SQL."""
    from demeter_ray.pipelines import flagship

    ds = flagship.entry_pipeline(sf_dir)
    df = ds.select_columns(_FLAGSHIP_COLS).to_pandas()
    # nullable Int64 -> float64 (the checker's int path can't carry NA)
    df["map_unit_key"] = df["map_unit_key"].astype("Float64").astype(np.float64)
    return df.sort_values("image_id").reset_index(drop=True)


# --------------------------------- cell k-ring neighborhood join (H3 kRing analog)

_NEIGH_RES = 14  # 360/2^14 deg ~ 0.022 deg cells over the 0.5-deg fixture window

_NEIGH_SQL = f"""
WITH ev AS (
  SELECT CAST(FLOOR(({LON_EXPR.format(k='event_id')} + 180.0) / 360.0 * 16384.0) AS BIGINT) AS ecx,
         CAST(FLOOR(({LAT_EXPR.format(k='event_id')} + 90.0) / 180.0 * 16384.0) AS BIGINT) AS ecy
  FROM events
),
evc AS (SELECT ecx, ecy, COUNT(*) AS n FROM ev GROUP BY ecx, ecy),
cust AS (
  SELECT c_custkey,
         CAST(FLOOR(({LON_EXPR.format(k='c_custkey')} + 180.0) / 360.0 * 16384.0) AS BIGINT) AS ccx,
         CAST(FLOOR(({LAT_EXPR.format(k='c_custkey')} + 90.0) / 180.0 * 16384.0) AS BIGINT) AS ccy
  FROM customer
)
SELECT c.c_custkey,
       c.ccx * 536870912 + c.ccy AS cell,
       COALESCE(SUM(e.n), 0)::BIGINT AS n_events_9
FROM cust c LEFT JOIN evc e
  ON e.ecx BETWEEN c.ccx - 1 AND c.ccx + 1
 AND e.ecy BETWEEN c.ccy - 1 AND c.ccy + 1
GROUP BY c.c_custkey, c.ccx, c.ccy
ORDER BY c.c_custkey
"""


@register("cell_neighbor_event_counts", _NEIGH_SQL)
def cell_neighbor_event_counts(sf_dir: str):
    """Cell k-ring neighborhood join (the H3 kRing / S2 neighbor pattern):
    per-customer count of events in the customer's res-14 cell and its 8
    neighbors.  100-TB shape: event counts aggregate per fine cell FIRST
    (gated group-sum), then the SMALL per-cell aggregate replicates x9 to
    its neighbor target cells — the shuffle volume is O(occupied cells),
    independent of event count — and customers attach via the size-gated
    lookup join on their own cell.  No broadcast of raw events, no
    multi-column shuffle key (cells pack to one int64)."""
    from demeter_ray.pipelines.relational import gated_group_sum_ds, gated_lookup_join

    pack = geo.CELL_PACK

    ev = read_table(sf_dir, "events", columns=["event_id"])

    def ev_partial(df: pd.DataFrame) -> pd.DataFrame:
        k = df["event_id"].to_numpy(dtype=np.int64)
        cx, cy = geo.cell_xy(derive_lon(k), derive_lat(k), _NEIGH_RES)
        out = pd.DataFrame({"cell": cx * pack + cy})
        return out.groupby("cell", as_index=False).size().rename(columns={"size": "n"})

    counts = gated_group_sum_ds(ev, ev_partial, keys=["cell"], sums=["n"])

    def neigh_partial(df: pd.DataFrame) -> pd.DataFrame:
        cell = df["cell"].to_numpy(dtype=np.int64)
        n = df["n"].to_numpy(dtype=np.int64)
        cx, cy = cell // pack, cell % pack
        off = np.array([-1, 0, 1], dtype=np.int64)
        tcx = np.repeat(cx, 9) + np.tile(np.repeat(off, 3), len(cx))
        tcy = np.repeat(cy, 9) + np.tile(np.tile(off, 3), len(cy))
        out = pd.DataFrame({"cell": tcx * pack + tcy, "n": np.repeat(n, 9)})
        return out.groupby("cell", as_index=False).agg(n=("n", "sum"))

    neigh = gated_group_sum_ds(counts, neigh_partial, keys=["cell"], sums=["n"])

    cust = read_table(sf_dir, "customer", columns=["c_custkey"])

    def cust_cells(batch: pa.Table) -> pa.Table:
        k = batch["c_custkey"].to_numpy(zero_copy_only=False)
        cx, cy = geo.cell_xy(derive_lon(k), derive_lat(k), _NEIGH_RES)
        return pa.table(
            {
                "c_custkey": batch["c_custkey"],
                "cell": pa.array(cx * pack + cy, pa.int64()),
            }
        )

    out = gated_lookup_join(
        cust.map_batches(cust_cells, batch_format="pyarrow"),
        "cell", neigh, "cell", ["n"], how="left",
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df["n_events_9"] = df["n"].fillna(0).astype(np.int64)
        return df[["c_custkey", "cell", "n_events_9"]]

    return out.map_batches(finish, batch_format="pandas")


# ------------------- grid-partitioned rectangle-intersection join (PBSM)

_RECT_RES = 12  # 360/4096 deg ~ 0.088 deg cells; rects span <= 0.042 deg

_RECT_SQL = f"""
WITH a0 AS (
  SELECT s_suppkey AS a_key,
         {LON_EXPR.format(k='s_suppkey')} AS lon,
         {LAT_EXPR.format(k='s_suppkey')} AS lat,
         0.005 + ((s_suppkey * 7) % 13) / 1000.0 AS hw,
         0.005 + ((s_suppkey * 11) % 17) / 1000.0 AS hh
  FROM supplier
),
a AS (SELECT a_key, lon - hw AS ax1, lon + hw AS ax2,
             lat - hh AS ay1, lat + hh AS ay2 FROM a0),
b0 AS (
  SELECT c_custkey AS b_key,
         {LON_EXPR.format(k='c_custkey')} AS lon,
         {LAT_EXPR.format(k='c_custkey')} AS lat,
         0.005 + ((c_custkey * 7) % 13) / 1000.0 AS hw,
         0.005 + ((c_custkey * 11) % 17) / 1000.0 AS hh
  FROM customer
),
b AS (SELECT b_key, lon - hw AS bx1, lon + hw AS bx2,
             lat - hh AS by1, lat + hh AS by2 FROM b0)
SELECT a.a_key, b.b_key,
       (LEAST(a.ax2, b.bx2) - GREATEST(a.ax1, b.bx1))
         * (LEAST(a.ay2, b.by2) - GREATEST(a.ay1, b.by1)) AS inter_area
FROM a JOIN b
  ON a.ax1 <= b.bx2 AND b.bx1 <= a.ax2
 AND a.ay1 <= b.by2 AND b.by1 <= a.ay2
ORDER BY a.a_key, b.b_key
"""


def _rects_from_keys(keys: np.ndarray):
    k = keys.astype(np.int64)
    lon, lat = derive_lon(k), derive_lat(k)
    hw = 0.005 + ((k * 7) % 13) / 1000.0
    hh = 0.005 + ((k * 11) % 17) / 1000.0
    return lon - hw, lon + hw, lat - hh, lat + hh


def _expand_rect_cells(key, x1, x2, y1, y2, prefix: str) -> pa.Table:
    """Replicate each rect to every res-_RECT_RES cell its bbox covers —
    vectorized (no per-row Python): block offsets via cumulative-index
    arithmetic over the per-row cell counts."""
    cx0, cy0 = geo.cell_xy(x1, y1, _RECT_RES)
    cx1, cy1 = geo.cell_xy(x2, y2, _RECT_RES)
    nx, ny = cx1 - cx0 + 1, cy1 - cy0 + 1
    reps = nx * ny
    total = int(reps.sum())
    ri = np.repeat(np.arange(len(key)), reps)
    pos = np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(reps) - reps, reps)
    ox, oy = pos // ny[ri], pos % ny[ri]
    cell = (cx0[ri] + ox) * geo.CELL_PACK + (cy0[ri] + oy)
    return pa.table(
        {
            "cell": pa.array(cell, pa.int64()),
            f"{prefix}_key": pa.array(key[ri], pa.int64()),
            f"{prefix}x1": pa.array(x1[ri], pa.float64()),
            f"{prefix}x2": pa.array(x2[ri], pa.float64()),
            f"{prefix}y1": pa.array(y1[ri], pa.float64()),
            f"{prefix}y2": pa.array(y2[ri], pa.float64()),
        }
    )


@register("rect_intersection_join", _RECT_SQL)
def rect_intersection_join(sf_dir: str):
    """Distributed rectangle-intersection join, PBSM / grid-partitioned:
    each side replicates its rects to the res-12 cells their bboxes cover,
    the two sides meet in a hash-partitioned ``Dataset.join`` on the packed
    cell key (never a broadcast, never O(A x B)), the exact overlap
    predicate refines inside the joined batches, and the classic
    REFERENCE-POINT rule deduplicates multi-cell pairs with zero extra
    shuffle: a pair is emitted only by the cell containing the
    intersection's min corner.  Intersection area is float-exact on both
    sides (identical operand order)."""

    def expand(table_key: str, prefix: str):
        def fn(batch: pa.Table) -> pa.Table:
            k = batch[table_key].to_numpy(zero_copy_only=False)
            x1, x2, y1, y2 = _rects_from_keys(k)
            return _expand_rect_cells(k, x1, x2, y1, y2, prefix)

        return fn

    sup = read_table(sf_dir, "supplier", columns=["s_suppkey"]).map_batches(
        expand("s_suppkey", "a"), batch_format="pyarrow"
    )
    cust = read_table(sf_dir, "customer", columns=["c_custkey"]).map_batches(
        expand("c_custkey", "b"), batch_format="pyarrow"
    )
    joined = sup.join(
        cust, join_type="inner", num_partitions=8, on=("cell",), right_on=("cell",)
    )

    _EMPTY_OUT = pd.DataFrame(
        {
            "a_key": pd.Series(dtype=np.int64),
            "b_key": pd.Series(dtype=np.int64),
            "inter_area": pd.Series(dtype=np.float64),
        }
    )

    def refine(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0 or "ax1" not in df.columns:
            # an all-empty join output loses its schema (Ray drops it at
            # zero rows) — emit the typed empty frame
            return _EMPTY_OUT
        ax1 = df["ax1"].to_numpy(); ax2 = df["ax2"].to_numpy()
        ay1 = df["ay1"].to_numpy(); ay2 = df["ay2"].to_numpy()
        bx1 = df["bx1"].to_numpy(); bx2 = df["bx2"].to_numpy()
        by1 = df["by1"].to_numpy(); by2 = df["by2"].to_numpy()
        ix1, iy1 = np.maximum(ax1, bx1), np.maximum(ay1, by1)
        hit = (ax1 <= bx2) & (bx1 <= ax2) & (ay1 <= by2) & (by1 <= ay2)
        # reference point: only the cell holding the intersection min corner
        gx, gy = geo.cell_xy(ix1, iy1, _RECT_RES)
        hit &= (gx * geo.CELL_PACK + gy) == df["cell"].to_numpy()
        area = (np.minimum(ax2, bx2) - ix1) * (np.minimum(ay2, by2) - iy1)
        return pd.DataFrame(
            {
                "a_key": df["a_key"].to_numpy()[hit],
                "b_key": df["b_key"].to_numpy()[hit],
                "inter_area": area[hit],
            }
        )

    return joined.map_batches(refine, batch_format="pandas")


# --------------------------------------- polygon geometry measures (shoelace)


def _geom_stats_sql() -> str:
    from demeter_ray.pipelines.oracle_extra import _field_edges_values

    return f"""
WITH edges(fid, ex1, ey1, ex2, ey2) AS (VALUES
  {_field_edges_values()}
)
SELECT fid AS map_unit_key,
       COUNT(*)::BIGINT AS n_vertices,
       ROUND(ABS(SUM(ex1 * ey2 - ex2 * ey1)) / 2, 12) AS area,
       ROUND(SUM(SQRT((ex2 - ex1) * (ex2 - ex1) + (ey2 - ey1) * (ey2 - ey1))), 12)
         AS perimeter,
       ROUND(AVG(ex1), 12) AS centroid_x,
       ROUND(AVG(ey1), 12) AS centroid_y
FROM edges GROUP BY fid ORDER BY map_unit_key
"""


@register("field_geometry_stats", _geom_stats_sql())
def field_geometry_stats(sf_dir: str):
    """Geometry-measure operator over the WKB field table: per-polygon
    shoelace area (multipart rings share orientation, so |signed sum| is the
    part sum), perimeter, vertex count and vertex-mean centroid — all
    computed inside map_batches over the parsed rings (geometry parsing
    distributes with the fields table; zero shuffle).  Float aggregates are
    rounded to 12 decimals on both sides because SQL SUM order is
    unspecified (~1e-18 abs sum-order noise at these magnitudes)."""
    import ray.data as rd

    from demeter_ray.sources import fixtures as fx

    fd = fx.generate("tiny")
    ds = rd.read_parquet(f"{fd}/fields.parquet", columns=["map_unit_key", "geom_wkb"])

    def fn(batch: pa.Table) -> pa.Table:
        mids, nv, area, perim, cx, cy = [], [], [], [], [], []
        for mid, wkb in zip(
            batch["map_unit_key"].to_pylist(), batch["geom_wkb"].to_pylist()
        ):
            pts = np.vstack(
                [np.asarray(r, dtype=np.float64) for rings in geo.parse_wkb(wkb)
                 for r in rings]
            )
            # edge arrays exactly as the SQL VALUES flatten them: per ring,
            # (r[:-1] -> r[1:]); vstack of closed rings keeps that pairing
            # valid only per ring, so rebuild per ring:
            x1s, y1s, x2s, y2s = [], [], [], []
            for rings in geo.parse_wkb(wkb):
                for r in rings:
                    r = np.asarray(r, dtype=np.float64)
                    x1s.append(r[:-1, 0]); y1s.append(r[:-1, 1])
                    x2s.append(r[1:, 0]); y2s.append(r[1:, 1])
            x1 = np.concatenate(x1s); y1 = np.concatenate(y1s)
            x2 = np.concatenate(x2s); y2 = np.concatenate(y2s)
            mids.append(mid)
            nv.append(len(x1))
            area.append(abs(np.sum(x1 * y2 - x2 * y1)) / 2)
            perim.append(np.sum(np.sqrt((x2 - x1) ** 2 + (y2 - y1) ** 2)))
            cx.append(np.mean(x1)); cy.append(np.mean(y1))
        return pa.table(
            {
                "map_unit_key": pa.array(mids, pa.int64()),
                "n_vertices": pa.array(nv, pa.int64()),
                "area": pa.array(duck_round(area, 12), pa.float64()),
                "perimeter": pa.array(duck_round(perim, 12), pa.float64()),
                "centroid_x": pa.array(duck_round(cx, 12), pa.float64()),
                "centroid_y": pa.array(duck_round(cy, 12), pa.float64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


# ----------------------------------- per-user trajectory path length

_PATH_SQL = f"""
WITH pts AS (
  SELECT user_id, ts, event_id,
         {LON_EXPR.format(k='event_id')} AS lon,
         {LAT_EXPR.format(k='event_id')} AS lat
  FROM events
),
steps AS (
  SELECT user_id,
         lon - LAG(lon) OVER w AS dx,
         lat - LAG(lat) OVER w AS dy
  FROM pts WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, COUNT(*)::BIGINT AS n_points,
       ROUND(COALESCE(SUM(SQRT(dx * dx + dy * dy)), 0.0), 9) AS path_len
FROM steps GROUP BY user_id ORDER BY user_id
"""


@register("user_path_length", _PATH_SQL)
def user_path_length(sf_dir: str):
    """Ordered trajectory aggregate: total planar path length per user over
    the (ts, event_id)-ordered event points.  The sessionize two-stage
    shape: ONE range-partitioned sort, vectorized per-block segment
    partials (within-block step-distance sums + segment endpoint coords),
    then an O(users + blocks) ordered combine that adds only the
    block-boundary steps — per-step sqrt operands are identical on both
    sides, the 9-decimal round absorbs SQL's unspecified SUM order."""
    ds = read_table(sf_dir, "events", columns=["user_id", "ts", "event_id"]).sort(
        ["user_id", "ts", "event_id"]
    )

    _EMPTY = {
        "user_id": pa.array([], pa.int64()),
        "first_ts": pa.array([], pa.int64()),
        "first_eid": pa.array([], pa.int64()),
        "first_lon": pa.array([], pa.float64()),
        "first_lat": pa.array([], pa.float64()),
        "last_lon": pa.array([], pa.float64()),
        "last_lat": pa.array([], pa.float64()),
        "n_pts": pa.array([], pa.int64()),
        "inner_len": pa.array([], pa.float64()),
    }

    def seg_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(_EMPTY)
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        us = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = batch["event_id"].to_numpy(zero_copy_only=False)
        lon, lat = derive_lon(eid), derive_lat(eid)
        n = len(uid)
        starts = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
        ends = np.r_[starts[1:], n]
        dx = lon[1:] - lon[:-1]
        dy = lat[1:] - lat[:-1]
        dd = np.r_[0.0, np.sqrt(dx * dx + dy * dy)]
        cum = np.cumsum(dd)
        inner = cum[ends - 1] - cum[starts]
        return pa.table(
            {
                "user_id": pa.array(uid[starts], pa.int64()),
                "first_ts": pa.array(us[starts], pa.int64()),
                "first_eid": pa.array(eid[starts], pa.int64()),
                "first_lon": pa.array(lon[starts], pa.float64()),
                "first_lat": pa.array(lat[starts], pa.float64()),
                "last_lon": pa.array(lon[ends - 1], pa.float64()),
                "last_lat": pa.array(lat[ends - 1], pa.float64()),
                "n_pts": pa.array(ends - starts, pa.int64()),
                "inner_len": pa.array(inner, pa.float64()),
            }
        )

    parts = ds.map_batches(seg_partial, batch_format="pyarrow").to_pandas()
    if len(parts) == 0:
        return pd.DataFrame(
            {
                "user_id": pd.Series(dtype=np.int64),
                "n_points": pd.Series(dtype=np.int64),
                "path_len": pd.Series(dtype=np.float64),
            }
        )
    parts = parts.sort_values(["user_id", "first_ts", "first_eid"]).reset_index(drop=True)
    same = parts["user_id"].eq(parts["user_id"].shift()).to_numpy()
    bdx = (parts["first_lon"] - parts["last_lon"].shift()).to_numpy(dtype=np.float64)
    bdy = (parts["first_lat"] - parts["last_lat"].shift()).to_numpy(dtype=np.float64)
    bd = np.where(same, np.sqrt(bdx * bdx + bdy * bdy), 0.0)
    parts["step"] = parts["inner_len"].to_numpy() + bd
    out = parts.groupby("user_id", as_index=False).agg(
        n_points=("n_pts", "sum"), path_len=("step", "sum")
    )
    out["path_len"] = duck_round(out["path_len"].to_numpy(), 9)
    return out.sort_values("user_id").reset_index(drop=True)


# ----------------------------- raster polygonize (connected-region extraction)

_POLY_W = 64  # formula raster is _POLY_W x _POLY_W
_POLY_THR = 35  # mask = ((c*c*13 + r*r*7 + c*r*3) % 100) < _POLY_THR

_POLYGONIZE_SQL = f"""
WITH RECURSIVE px AS (
  SELECT r.r, c.c FROM generate_series(0, {_POLY_W - 1}) r(r),
                       generate_series(0, {_POLY_W - 1}) c(c)
  WHERE (c.c * c.c * 13 + r.r * r.r * 7 + c.c * r.r * 3) % 100 < {_POLY_THR}
),
m AS (SELECT r, c, r * {_POLY_W} + c AS node FROM px),
adj AS (
  SELECT a.node AS u, b.node AS v FROM m a JOIN m b ON b.r = a.r AND b.c = a.c + 1
  UNION ALL
  SELECT a.node, b.node FROM m a JOIN m b ON b.r = a.r + 1 AND b.c = a.c
),
bi AS (SELECT u, v FROM adj UNION SELECT v, u FROM adj),
reach(u, v) AS (
  SELECT node, node FROM m
  UNION
  SELECT r.u, e.v FROM reach r JOIN bi e ON r.v = e.u
),
lbl AS (SELECT u AS node, MIN(v) AS region_id FROM reach GROUP BY u)
SELECT l.region_id,
       COUNT(*)::BIGINT AS n_pixels,
       MIN(m.r)::BIGINT AS min_row, MAX(m.r)::BIGINT AS max_row,
       MIN(m.c)::BIGINT AS min_col, MAX(m.c)::BIGINT AS max_col
FROM lbl l JOIN m USING (node)
GROUP BY l.region_id ORDER BY l.region_id
"""


def _poly_mask_rows(rows: np.ndarray):
    """(rr, cc, node) for the masked pixels of the given raster rows —
    formula-derived, so any task can evaluate any row without data
    movement (the mask mirrors the SQL px CTE exactly)."""
    W = _POLY_W
    rr = np.repeat(rows.astype(np.int64), W)
    cc = np.tile(np.arange(W, dtype=np.int64), len(rows))
    keep = (cc * cc * 13 + rr * rr * 7 + cc * rr * 3) % 100 < _POLY_THR
    rr, cc = rr[keep], cc[keep]
    return rr, cc, rr * W + cc


@register("raster_polygonize_regions", _POLYGONIZE_SQL)
def raster_polygonize_regions(sf_dir: str):
    """Raster -> vector polygonize (the gdal_polygonize analog): connected
    regions of a thresholded raster mask via DISTRIBUTED connected-component
    labeling.  Pixel enumeration and edge generation fan out as map_batches
    over row stripes (vertical edges reference the next row's mask through
    the pure formula — no inter-stripe data movement); the size-gated
    ``connected_components`` (streamed union-find under the node cap,
    min-label propagation + pointer jumping above it) assigns each pixel
    its region = min reachable pixel id; per-region pixel count + bbox
    aggregate at the end.  Oracle: recursive-CTE closure in SQL."""
    import ray.data as rd

    from demeter_ray.stages.components import connected_components

    W = _POLY_W
    stripes = rd.range(W)

    def stripe_nodes(batch: pa.Table) -> pa.Table:
        rows = batch["id"].to_numpy(zero_copy_only=False)
        _rr, _cc, node = _poly_mask_rows(rows)
        return pa.table({"node": pa.array(node, pa.int64())})

    def stripe_edges(batch: pa.Table) -> pa.Table:
        rows = batch["id"].to_numpy(zero_copy_only=False)
        us, vs = [], []
        rr, cc, node = _poly_mask_rows(rows)
        # horizontal: (r, c) -- (r, c+1), both masked (node order = c order)
        nxt = np.zeros(len(node), dtype=bool)
        if len(node):
            nxt[:-1] = (node[1:] == node[:-1] + 1) & (cc[:-1] + 1 < W)
        us.append(node[nxt]); vs.append(node[nxt] + 1)
        # vertical: (r, c) -- (r+1, c); the r+1 mask comes from the formula
        below = rr + 1
        ok = below < W
        bkeep = (cc * cc * 13 + below * below * 7 + cc * below * 3) % 100 < _POLY_THR
        sel = ok & bkeep
        us.append(node[sel]); vs.append(node[sel] + W)
        return pa.table(
            {
                "u": pa.array(np.concatenate(us), pa.int64()),
                "v": pa.array(np.concatenate(vs), pa.int64()),
            }
        )

    nodes_ds = stripes.map_batches(stripe_nodes, batch_format="pyarrow")
    edges_ds = stripes.map_batches(stripe_edges, batch_format="pyarrow")
    comp = connected_components(edges_ds, nodes_ds)
    comp["r"] = comp["node"].to_numpy(dtype=np.int64) // W
    comp["c"] = comp["node"].to_numpy(dtype=np.int64) % W
    out = comp.groupby("cluster_id", as_index=False).agg(
        n_pixels=("node", "size"),
        min_row=("r", "min"), max_row=("r", "max"),
        min_col=("c", "min"), max_col=("c", "max"),
    ).rename(columns={"cluster_id": "region_id"})
    out["n_pixels"] = out["n_pixels"].astype(np.int64)
    return out.sort_values("region_id").reset_index(drop=True)


# ------------------------- flow-path tracing (distributed pointer jumping)

_FLOW_W = 64  # direction = (c*13 + r*7) % 3 -> E / SE / S (acyclic by design)

_FLOW_SQL = f"""
WITH RECURSIVE g AS (
  SELECT r.r, c.c, (c.c * 13 + r.r * 7) % 3 AS d
  FROM generate_series(0, {_FLOW_W - 1}) r(r), generate_series(0, {_FLOW_W - 1}) c(c)
),
walk(r0, c0, r, c, n) AS (
  SELECT r, c, r, c, 0 FROM g
  UNION ALL
  SELECT w.r0, w.c0,
         w.r + CASE g.d WHEN 0 THEN 0 ELSE 1 END,
         w.c + CASE g.d WHEN 2 THEN 0 ELSE 1 END,
         w.n + 1
  FROM walk w JOIN g ON g.r = w.r AND g.c = w.c
)
SELECT (r0 * {_FLOW_W} + c0)::BIGINT AS node, r0::BIGINT AS row, c0::BIGINT AS col,
       MAX(n)::BIGINT AS path_steps
FROM walk GROUP BY r0, c0 ORDER BY node
"""


@register("flow_path_length", _FLOW_SQL)
def flow_path_length(sf_dir: str):
    """Flow-path tracing over a formula flow-direction raster (the
    hydrography fdr analog, restricted to E/SE/S so paths are acyclic):
    per-cell number of downstream steps until the flow leaves the grid.
    Distributed algorithm: POINTER JUMPING — state (node, nxt, dist)
    doubles its horizon each round via a size-gated lookup self-join
    (dist[x] += dist[nxt[x]]; nxt[x] = nxt[nxt[x]]), so a path of length L
    resolves in ceil(log2 L) Dataset joins instead of L sequential steps —
    the scale shape for 10^9-cell rasters where per-step iteration would
    need 10^5 rounds.  Oracle: recursive-CTE walk (exact step counts)."""
    import ray.data as rd

    from demeter_ray.pipelines.relational import gated_lookup_join

    W = _FLOW_W
    stripes = rd.range(W)

    def init_state(batch: pa.Table) -> pa.Table:
        rows = batch["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        rr = np.repeat(rows, W)
        cc = np.tile(np.arange(W, dtype=np.int64), len(rows))
        d = (cc * 13 + rr * 7) % 3
        nr = rr + np.where(d == 0, 0, 1)
        nc = cc + np.where(d == 2, 0, 1)
        off = (nr >= W) | (nc >= W)
        nxt = np.where(off, -1, nr * W + nc)
        return pa.table(
            {
                "node": pa.array(rr * W + cc, pa.int64()),
                "nxt": pa.array(nxt, pa.int64()),
                "dist": pa.array(np.ones(len(rr), dtype=np.int64), pa.int64()),
            }
        )

    state = stripes.map_batches(init_state, batch_format="pyarrow").materialize()
    rounds = int(np.ceil(np.log2(2 * W))) + 1  # horizon 2W covers the diagonal

    for _ in range(rounds):
        dim = state.map_batches(
            lambda t: t.rename_columns(["jnode", "jnxt", "jdist"]),
            batch_format="pyarrow",
        )
        joined = gated_lookup_join(
            state, "nxt", dim, "jnode", ["jnxt", "jdist"], how="left"
        )

        def advance(df: pd.DataFrame) -> pd.DataFrame:
            hasj = df["jnxt"].notna().to_numpy()
            nxt = np.where(hasj, df["jnxt"].fillna(-1).to_numpy(dtype=np.int64),
                           df["nxt"].to_numpy(dtype=np.int64))
            dist = df["dist"].to_numpy(dtype=np.int64) + np.where(
                hasj, df["jdist"].fillna(0).to_numpy(dtype=np.int64), 0
            )
            return pd.DataFrame({"node": df["node"], "nxt": nxt, "dist": dist})

        state = joined.map_batches(advance, batch_format="pandas").materialize()

    out = state.to_pandas()
    node = out["node"].to_numpy(dtype=np.int64)
    return pd.DataFrame(
        {
            "node": node,
            "row": node // W,
            "col": node % W,
            "path_steps": out["dist"].to_numpy(dtype=np.int64),
        }
    ).sort_values("node").reset_index(drop=True)


# --------------------- DEM slope / aspect / hillshade (Horn focal kernel)

_TERRAIN_CELL = 30.0  # metres per pixel, the SRTM-like cellsize
_TERRAIN_W = 320  # reuses the raster_sample_customers DEM formula


def _elev_sql(r: str, c: str) -> str:
    # identical to the 320x320 elevation formula above: ((c*31 + r*17) % 1000)/10.0
    return f"((({c}) * 31 + ({r}) * 17) % 1000) / 10.0"


_TERRAIN_SQL = f"""
WITH g AS (
  SELECT r.r, c.c,
    {_elev_sql('r.r-1', 'c.c-1')} AS va, {_elev_sql('r.r-1', 'c.c')} AS vb,
    {_elev_sql('r.r-1', 'c.c+1')} AS vc,
    {_elev_sql('r.r', 'c.c-1')} AS vd, {_elev_sql('r.r', 'c.c+1')} AS vf,
    {_elev_sql('r.r+1', 'c.c-1')} AS vg, {_elev_sql('r.r+1', 'c.c')} AS vh,
    {_elev_sql('r.r+1', 'c.c+1')} AS vi
  FROM generate_series(1, {_TERRAIN_W - 2}) r(r),
       generate_series(1, {_TERRAIN_W - 2}) c(c)
),
d AS (
  SELECT r, c,
    ((vc + 2.0*vf + vi) - (va + 2.0*vd + vg)) / (8.0 * {_TERRAIN_CELL}) AS dzdx,
    ((vg + 2.0*vh + vi) - (va + 2.0*vb + vc)) / (8.0 * {_TERRAIN_CELL}) AS dzdy
  FROM g
)
SELECT (r * {_TERRAIN_W} + c)::BIGINT AS node,
  ROUND(degrees(atan(sqrt(dzdx*dzdx + dzdy*dzdy))), 6) AS slope_deg,
  CASE WHEN dzdx = 0.0 AND dzdy = 0.0 THEN -1.0
       ELSE ROUND(CASE WHEN 90.0 - degrees(atan2(dzdy, -dzdx)) < 0.0
                       THEN 90.0 - degrees(atan2(dzdy, -dzdx)) + 360.0
                       ELSE 90.0 - degrees(atan2(dzdy, -dzdx)) END, 6)
  END AS aspect_deg,
  ROUND(GREATEST(255.0 * (cos(radians(45.0)) + sin(radians(45.0))
        * (sin(radians(315.0)) * (-dzdx) + cos(radians(315.0)) * dzdy))
        / sqrt(1.0 + dzdx*dzdx + dzdy*dzdy), 0.0), 6) AS hillshade
FROM d ORDER BY node
"""


@register("dem_slope_hillshade", _TERRAIN_SQL)
def dem_slope_hillshade(sf_dir: str):
    """gdaldem slope/aspect/hillshade analog over the 320x320 formula DEM
    (the raster_sample_customers elevation raster), via the REAL Horn focal
    kernel (functions/terrain.py) distributed as row stripes: each task
    evaluates its target rows PLUS a one-row halo from the pure formula —
    the halo-exchange shape for 10^9-cell DEMs with zero inter-stripe data
    movement (the same stripe pattern as raster_polygonize_regions).
    Oracle: the identical Horn stencil + trig inline in SQL; ROUND(6)
    absorbs libm atan/sin/cos ulp differences (all sums/divisions are
    bit-identical by construction)."""
    import ray.data as rd

    from demeter_ray.functions import terrain

    W, CELL = _TERRAIN_W, _TERRAIN_CELL

    def elev_rows(rows: np.ndarray) -> np.ndarray:
        cc = np.arange(W, dtype=np.int64)[None, :]
        rr = rows.astype(np.int64)[:, None]
        return ((cc * 31 + rr * 17) % 1000) / 10.0

    def stripe_terrain(batch: pa.Table) -> pa.Table:
        rows = batch["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        zm1, z0, zp1 = elev_rows(rows - 1), elev_rows(rows), elev_rows(rows + 1)
        dzdx, dzdy = terrain.horn_gradients_rows(zm1, z0, zp1, CELL, CELL)
        slope = terrain.slope_deg(dzdx, dzdy)
        aspect = terrain.aspect_deg(dzdx, dzdy)
        hs = terrain.hillshade(dzdx, dzdy, azimuth_deg=315.0, altitude_deg=45.0)
        cols = np.arange(1, W - 1, dtype=np.int64)[None, :]
        node = (rows[:, None] * W + cols).ravel()
        return pa.table(
            {
                "node": pa.array(node, pa.int64()),
                "slope_deg": pa.array(duck_round(slope.ravel(), 6), pa.float64()),
                "aspect_deg": pa.array(duck_round(aspect.ravel(), 6), pa.float64()),
                "hillshade": pa.array(duck_round(hs.ravel(), 6), pa.float64()),
            }
        )

    out = (
        rd.range(W - 2)
        .map_batches(
            lambda t: pa.table(
                {"id": pa.array(t["id"].to_numpy(zero_copy_only=False) + 1, pa.int64())}
            ),
            batch_format="pyarrow",
        )
        .map_batches(stripe_terrain, batch_format="pyarrow")
        .to_pandas()
    )
    return out.sort_values("node").reset_index(drop=True)


# ------------------------ raster proximity (distance to nearest target cell)

_PROX_W = 64
_PROX_MOD = 331  # target mask: (c*c*7 + r*5 + r*c) % 331 == 0 (~12 cells)

_PROX_SQL = f"""
WITH px AS (
  SELECT r.r, c.c FROM generate_series(0, {_PROX_W - 1}) r(r),
                       generate_series(0, {_PROX_W - 1}) c(c)
),
tg AS (
  SELECT r, c, r * {_PROX_W} + c AS tnode FROM px
  WHERE (c*c*7 + r*5 + r*c) % {_PROX_MOD} = 0
),
d AS (
  SELECT p.r, p.c, t.tnode,
         (p.r - t.r)*(p.r - t.r) + (p.c - t.c)*(p.c - t.c) AS d2
  FROM px p CROSS JOIN tg t
),
m AS (
  SELECT r, c, tnode, d2,
         ROW_NUMBER() OVER (PARTITION BY r, c ORDER BY d2, tnode) AS rn
  FROM d
)
SELECT (r * {_PROX_W} + c)::BIGINT AS node, d2::BIGINT AS dist2,
       tnode::BIGINT AS nearest_target
FROM m WHERE rn = 1 ORDER BY node
"""


@register("raster_proximity_targets", _PROX_SQL)
def raster_proximity_targets(sf_dir: str):
    """Proximity raster (gdal_proximity analog): per-pixel squared distance
    to the nearest target cell + that target's id (tie -> lowest target id).
    Two distributed stages over row stripes: (1) target EXTRACTION is a
    map_batches filter whose output is bounded by the target count (sparse
    by construction — the driver pull is the small side, then ``ray.put``
    broadcast); (2) per-stripe vectorized (pixels x targets) integer
    distance matrix + argmin.  The broadcast-small-side shape: at 10^9
    pixels the target list still rides the object store once per node.
    All-integer output — exact, no rounding."""
    import ray as _ray
    import ray.data as rd

    W, MOD = _PROX_W, _PROX_MOD
    stripes = rd.range(W)

    def stripe_targets(batch: pa.Table) -> pa.Table:
        rows = batch["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        rr = np.repeat(rows, W)
        cc = np.tile(np.arange(W, dtype=np.int64), len(rows))
        keep = (cc * cc * 7 + rr * 5 + rr * cc) % MOD == 0
        return pa.table(
            {
                "tr": pa.array(rr[keep], pa.int64()),
                "tc": pa.array(cc[keep], pa.int64()),
            }
        )

    tg = (
        stripes.map_batches(stripe_targets, batch_format="pyarrow")
        .to_pandas()
        .sort_values(["tr", "tc"])  # tnode order => argmin tie -> lowest id
    )
    tr = tg["tr"].to_numpy(dtype=np.int64)
    tc = tg["tc"].to_numpy(dtype=np.int64)
    ref = _ray.put((tr, tc, tr * W + tc))

    def stripe_distance(batch: pa.Table) -> pa.Table:
        _tr, _tc, _tn = _ray.get(ref)
        rows = batch["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        rr = np.repeat(rows, W)
        cc = np.tile(np.arange(W, dtype=np.int64), len(rows))
        d2 = (rr[:, None] - _tr[None, :]) ** 2 + (cc[:, None] - _tc[None, :]) ** 2
        best = np.argmin(d2, axis=1)  # first min = lowest tnode (sorted)
        return pa.table(
            {
                "node": pa.array(rr * W + cc, pa.int64()),
                "dist2": pa.array(d2[np.arange(len(rr)), best], pa.int64()),
                "nearest_target": pa.array(_tn[best], pa.int64()),
            }
        )

    out = stripes.map_batches(stripe_distance, batch_format="pyarrow").to_pandas()
    return out.sort_values("node").reset_index(drop=True)


# ----------------------- vector -> raster burn (gdal_rasterize analog)


def _poly_halfplane_union(alias: str = "p") -> str:
    """Half-plane containment union over ORACLE_POLYGONS (the _pip_sql
    kernel), parameterized on the point-source alias."""
    rows = []
    for pid, verts in ORACLE_POLYGONS.items():
        conds = []
        n = len(verts)
        for i in range(n):
            x1, y1 = verts[i]
            x2, y2 = verts[(i + 1) % n]
            conds.append(
                f"(({x2}) - ({x1})) * ({alias}.lat - ({y1}))"
                f" - (({y2}) - ({y1})) * ({alias}.lon - ({x1})) >= 0.0"
            )
        rows.append(f"SELECT {pid} AS id WHERE " + " AND ".join(conds))
    return " UNION ALL ".join(rows)


_RASTERIZE_SQL = f"""
WITH px AS (
  SELECT r.r, c.c,
         -102.2 + (c.c + 0.5) * {_RES} AS lon,
         36.5 - (r.r + 0.5) * {_RES} AS lat
  FROM generate_series(0, {_RASTER_H - 1}) r(r),
       generate_series(0, {_RASTER_W - 1}) c(c)
),
b AS (
  SELECT r, c, (SELECT MIN(id) FROM ({_poly_halfplane_union('p')})) AS field_id
  FROM px p
)
SELECT (r * {_RASTER_W} + c)::BIGINT AS node, field_id::BIGINT AS field_id
FROM b WHERE field_id IS NOT NULL ORDER BY node
"""


@register("rasterize_fields", _RASTERIZE_SQL)
def rasterize_fields(sf_dir: str):
    """Vector -> raster burn (gdal_rasterize analog, the inverse of
    raster_polygonize_regions): every pixel CENTER of the 320x320 window
    grid is tested against the broadcast field polygons through the REAL
    PIP actor pool (stages/pip.py — per-actor polygon index, even-odd
    refine, min-id under overlap), and pixels inside any polygon emit
    (node, burned field id).  Pixel-center generation fans out as row
    stripes; the burn is the same broadcast-polygons shape as
    pip_events_fields, so a 10^9-pixel burn streams without shuffling.
    Oracle: half-plane tests on identical pixel-center doubles (convex
    quads — the two kernels agree off the boundary, and both sides compute
    bit-identical coordinates)."""
    import pyarrow.compute as pc
    import ray.data as rd

    from demeter_ray.stages import pip as pip_stage

    H, W = _RASTER_H, _RASTER_W
    fields_tbl = pa.table(
        {
            "map_unit_key": pa.array(list(ORACLE_POLYGONS), pa.int64()),
            "geom_wkb": pa.array(
                [geo.wkb_from_rings([np.array(v)]) for v in ORACLE_POLYGONS.values()],
                pa.binary(),
            ),
        }
    )

    def to_centers(batch: pa.Table) -> pa.Table:
        rows = batch["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        rr = np.repeat(rows, W)
        cc = np.tile(np.arange(W, dtype=np.int64), len(rows))
        return pa.table(
            {
                "node": pa.array(rr * W + cc, pa.int64()),
                "lon": pa.array(-102.2 + (cc + 0.5) * _RES, pa.float64()),
                "lat": pa.array(36.5 - (rr + 0.5) * _RES, pa.float64()),
            }
        )

    ds = rd.range(H).map_batches(to_centers, batch_format="pyarrow")
    ds = pip_stage.pip_join(ds, fields_tbl, mode="min", res=12, concurrency=(1, 4))

    def burn(batch: pa.Table) -> pa.Table:
        keep = pc.is_valid(batch["map_unit_key"])
        t = batch.filter(keep)
        return pa.table(
            {
                "node": t["node"],
                "field_id": t["map_unit_key"].cast(pa.int64()),
            }
        )

    out = ds.map_batches(burn, batch_format="pyarrow").to_pandas()
    return out.sort_values("node").reset_index(drop=True)


# ---------------------- great-circle nearest centroid (haversine kNN)

_EARTH_R = 6371000.0


def _haversine_knn_sql() -> str:
    values = ", ".join(f"({i}, {x}, {y})" for i, x, y in ORACLE_CENTROIDS)
    return f"""
WITH pts AS (
  SELECT event_id,
         {LON_EXPR.format(k='event_id')} AS lon,
         {LAT_EXPR.format(k='event_id')} AS lat
  FROM events
),
cents(fid, cx, cy) AS (VALUES {values}),
h AS (
  SELECT p.event_id, c.fid,
         sin(radians(c.cy - p.lat) / 2.0) * sin(radians(c.cy - p.lat) / 2.0)
         + cos(radians(p.lat)) * cos(radians(c.cy))
           * sin(radians(c.cx - p.lon) / 2.0) * sin(radians(c.cx - p.lon) / 2.0)
           AS a
  FROM pts p CROSS JOIN cents c
),
r AS (
  SELECT event_id, fid, a,
         ROW_NUMBER() OVER (PARTITION BY event_id ORDER BY a, fid) AS rn
  FROM h
)
SELECT event_id, fid AS nearest_id,
       ROUND(2.0 * {_EARTH_R} * asin(sqrt(a)), 4) AS dist_m
FROM r WHERE rn = 1 ORDER BY event_id
"""


@register("haversine_nearest_centroid", _haversine_knn_sql())
def haversine_nearest_centroid(sf_dir: str):
    """Geodesic nearest-field lookup: great-circle (haversine) metres
    instead of planar squared degrees — the projection-free distance the
    planar kNN operators approximate.  Small side broadcast via ``ray.put``;
    each batch computes the (points x centroids) haversine kernel
    vectorized and argmins on the monotone pre-asin term ``a`` (ties ->
    lowest centroid id, centroids pre-sorted).  ROUND(4) = 0.1 mm guards
    the libm sin/cos/asin ulps; every add/multiply is order-identical to
    the SQL."""
    import ray as _ray

    cents = sorted(ORACLE_CENTROIDS)
    cid = np.array([c[0] for c in cents], dtype=np.int64)
    cx = np.array([c[1] for c in cents], dtype=np.float64)
    cy = np.array([c[2] for c in cents], dtype=np.float64)
    ref = _ray.put((cid, cx, cy))

    ds = read_table(sf_dir, "events", columns=["event_id"])

    def nearest(batch: pa.Table) -> pa.Table:
        _cid, _cx, _cy = _ray.get(ref)
        k = batch["event_id"].to_numpy(zero_copy_only=False)
        lon, lat = derive_lon(k), derive_lat(k)
        dphi = np.radians(_cy[None, :] - lat[:, None]) / 2.0
        dlmb = np.radians(_cx[None, :] - lon[:, None]) / 2.0
        a = (
            np.sin(dphi) * np.sin(dphi)
            + np.cos(np.radians(lat[:, None])) * np.cos(np.radians(_cy[None, :]))
            * np.sin(dlmb) * np.sin(dlmb)
        )
        best = np.argmin(a, axis=1)  # first min = lowest fid (sorted)
        abest = a[np.arange(len(k)), best]
        dist = 2.0 * _EARTH_R * np.arcsin(np.sqrt(abest))
        return pa.table(
            {
                "event_id": batch["event_id"],
                "nearest_id": pa.array(_cid[best], pa.int64()),
                "dist_m": pa.array(duck_round(dist, 4), pa.float64()),
            }
        )

    out = ds.map_batches(nearest, batch_format="pyarrow").to_pandas()
    return out.sort_values("event_id").reset_index(drop=True)


# ------------------ focal smoothing over a DATA raster (event density)

_DENS_W = 64  # bin grid over the 0.5 x 0.5 deg window

_DENSITY_SQL = f"""
WITH pts AS (
  SELECT {LON_EXPR.format(k='event_id')} AS lon,
         {LAT_EXPR.format(k='event_id')} AS lat
  FROM events
),
b AS (
  SELECT CAST(FLOOR((lon - (-102.2)) / 0.5 * {_DENS_W}.0) AS BIGINT) AS bx,
         CAST(FLOOR((lat - 36.0) / 0.5 * {_DENS_W}.0) AS BIGINT) AS by,
         COUNT(*) AS cnt
  FROM pts GROUP BY 1, 2
),
k(dx, dy, w) AS (VALUES (-1,-1,1),(-1,0,2),(-1,1,1),(0,-1,2),(0,0,4),(0,1,2),
                        (1,-1,1),(1,0,2),(1,1,1)),
s AS (
  SELECT b.bx + k.dx AS bx, b.by + k.dy AS by, SUM(b.cnt * k.w) AS wsum
  FROM b CROSS JOIN k
  WHERE b.bx + k.dx BETWEEN 0 AND {_DENS_W - 1}
    AND b.by + k.dy BETWEEN 0 AND {_DENS_W - 1}
  GROUP BY 1, 2
)
SELECT bx, by, wsum::BIGINT AS wsum, wsum / 16.0 AS density
FROM s ORDER BY bx, by
"""


@register("event_density_smoothed", _DENSITY_SQL)
def event_density_smoothed(sf_dir: str):
    """Binned point density + 3x3 binomial focal smoothing (the KDE-grid /
    heatmap operator) — a focal convolution over a DATA raster, where the
    halo is real data, not a formula: per-batch partial bin counts reduce
    through the size-gated group-sum, then each occupied bin REPLICATES its
    count x9 to its neighbors with kernel weights (1,2,1;2,4,2;1,2,1) and a
    second gated group-sum finishes the convolution — the
    aggregate-then-replicate shape (cell_neighbor_event_counts), so the
    shuffle is O(occupied bins), never O(points).  wsum is integer-exact;
    density = wsum/16.0 is dyadic — NO rounding anywhere."""
    from demeter_ray.pipelines.relational import gated_group_sum_ds

    W = _DENS_W
    ds = read_table(sf_dir, "events", columns=["event_id"])

    def bin_partial(b: pd.DataFrame) -> pd.DataFrame:
        k = b["event_id"].to_numpy(np.int64)
        lon, lat = derive_lon(k), derive_lat(k)
        bx = np.floor((lon - (-102.2)) / 0.5 * float(W)).astype(np.int64)
        by = np.floor((lat - 36.0) / 0.5 * float(W)).astype(np.int64)
        g = pd.DataFrame({"bx": bx, "by": by, "cnt": 1})
        return g.groupby(["bx", "by"], as_index=False).sum()

    counts = gated_group_sum_ds(ds, bin_partial, ["bx", "by"], ["cnt"])

    KDX = np.array([-1, -1, -1, 0, 0, 0, 1, 1, 1], dtype=np.int64)
    KDY = np.array([-1, 0, 1, -1, 0, 1, -1, 0, 1], dtype=np.int64)
    KW = np.array([1, 2, 1, 2, 4, 2, 1, 2, 1], dtype=np.int64)

    def spread_partial(b: pd.DataFrame) -> pd.DataFrame:
        bx = np.repeat(b["bx"].to_numpy(np.int64), 9) + np.tile(KDX, len(b))
        by = np.repeat(b["by"].to_numpy(np.int64), 9) + np.tile(KDY, len(b))
        ws = np.repeat(b["cnt"].to_numpy(np.int64), 9) * np.tile(KW, len(b))
        keep = (bx >= 0) & (bx < W) & (by >= 0) & (by < W)
        g = pd.DataFrame({"bx": bx[keep], "by": by[keep], "wsum": ws[keep]})
        return g.groupby(["bx", "by"], as_index=False).sum()

    sm = gated_group_sum_ds(counts, spread_partial, ["bx", "by"], ["wsum"])
    out = sm.to_pandas()
    out["wsum"] = out["wsum"].astype(np.int64)
    out["density"] = out["wsum"].to_numpy(np.float64) / 16.0
    return out.sort_values(["bx", "by"]).reset_index(drop=True)


# ---------------- STR-packed R-tree bulk load (spatial index leaves)

_RTREE_LEAF = 64  # leaf capacity


def _rtree_sql() -> str:
    L = _RTREE_LEAF
    return f"""
WITH pts AS (
  SELECT event_id,
         {LON_EXPR.format(k='event_id')} AS lon,
         {LAT_EXPR.format(k='event_id')} AS lat
  FROM events
),
params AS (
  SELECT COUNT(*) AS n,
         CAST(CEIL(SQRT(((COUNT(*) + {L - 1}) // {L})::DOUBLE)) AS BIGINT) AS s
  FROM pts
),
xr AS (
  SELECT event_id, lon, lat,
         ROW_NUMBER() OVER (ORDER BY lon, event_id) - 1 AS xrank
  FROM pts
),
sl AS (
  SELECT x.event_id, x.lon, x.lat,
         x.xrank // ((p.n + p.s - 1) // p.s) AS slice
  FROM xr x, params p
),
yr AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY slice ORDER BY lat, event_id) - 1
            AS yrank
  FROM sl
)
SELECT y.slice * (((p.n + p.s - 1) // p.s + {L - 1}) // {L}) + y.yrank // {L}
         AS leaf_id,
       COUNT(*)::BIGINT AS n_points,
       MIN(y.lon) AS min_lon, MAX(y.lon) AS max_lon,
       MIN(y.lat) AS min_lat, MAX(y.lat) AS max_lat
FROM yr y, params p
GROUP BY 1 ORDER BY 1
"""


@register("str_rtree_leaves", _rtree_sql())
def str_rtree_leaves(sf_dir: str):
    """Sort-Tile-Recursive R-tree bulk load (the PostGIS/GEOS packed-index
    build): points sort by x into ceil(sqrt(n/L)) vertical slices, each
    slice sorts by y and packs runs of L into leaves; the output is every
    leaf's MBR + population — the spatial-index layer a distributed engine
    ships next to its data files.  Distributed as TWO range-partitioned
    sorts, each followed by the O(blocks) running-offset carry (the
    pack_documents shape): block partials -> driver base offsets -> a
    second vectorized pass over the SAME materialized blocks; the leaf MBR
    reduction is a size-gated group-sum on leaf_id.  Ranks, slices and
    leaf ids are pure integers; MBR bounds are min/max of identical
    doubles — exact, no rounding."""
    import ray as _ray

    from demeter_ray.pipelines.relational import partial_shuffle_combine

    L = _RTREE_LEAF
    ds = read_table(sf_dir, "events", columns=["event_id"])

    def to_points(batch: pa.Table) -> pa.Table:
        k = batch["event_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_id": batch["event_id"],
                "lon": pa.array(derive_lon(k), pa.float64()),
                "lat": pa.array(derive_lat(k), pa.float64()),
            }
        )

    pts = ds.map_batches(to_points, batch_format="pyarrow")
    n = pts.count()
    if n == 0:
        return pd.DataFrame(
            {
                "leaf_id": pd.Series(dtype=np.int64),
                "n_points": pd.Series(dtype=np.int64),
                "min_lon": pd.Series(dtype=np.float64),
                "max_lon": pd.Series(dtype=np.float64),
                "min_lat": pd.Series(dtype=np.float64),
                "max_lat": pd.Series(dtype=np.float64),
            }
        )
    S = int(np.ceil(np.sqrt(float((n + L - 1) // L))))
    slice_size = (n + S - 1) // S
    leaves_per_slice = (slice_size + L - 1) // L

    # ---- pass 1: global x-rank -> slice (one sort + O(blocks) carry)
    sorted1 = pts.sort(["lon", "event_id"]).materialize()

    def block_count1(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"first_eid": pa.array([], pa.int64()),
                             "first_lon": pa.array([], pa.float64()),
                             "rows": pa.array([], pa.int64())})
        return pa.table({
            "first_eid": pa.array([t["event_id"][0].as_py()], pa.int64()),
            "first_lon": pa.array([t["lon"][0].as_py()], pa.float64()),
            "rows": pa.array([t.num_rows], pa.int64()),
        })

    parts = partial_combine(sorted1, block_count1, "pyarrow", batch_size=None)
    parts = parts.sort_values(["first_lon", "first_eid"]).reset_index(drop=True)
    bases = np.r_[0, np.cumsum(parts["rows"].to_numpy())[:-1]].astype(np.int64)
    base1 = {int(e): int(b) for e, b in zip(parts["first_eid"], bases)}
    ref1 = _ray.put((base1, slice_size))

    def assign_slice(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("slice", pa.array([], pa.int64()))
        b1, ssz = _ray.get(ref1)
        xrank = b1[int(t["event_id"][0].as_py())] + np.arange(
            t.num_rows, dtype=np.int64
        )
        return t.append_column("slice", pa.array(xrank // ssz, pa.int64()))

    sliced = sorted1.map_batches(assign_slice, batch_format="pyarrow",
                                 batch_size=None)

    # ---- pass 2: per-slice y-rank (one sort + O(blocks x slices) carry)
    sorted2 = sliced.sort(["slice", "lat", "event_id"]).materialize()

    def block_count2(t: pa.Table) -> pa.Table:
        empty = {
            "first_eid": pa.array([], pa.int64()),
            "slice": pa.array([], pa.int64()),
            "o_slice": pa.array([], pa.int64()),
            "o_lat": pa.array([], pa.float64()),
            "o_eid": pa.array([], pa.int64()),
            "rows": pa.array([], pa.int64()),
        }
        if t.num_rows == 0:
            return pa.table(empty)
        sl = t["slice"].to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.r_[True, sl[1:] != sl[:-1]])
        ends = np.r_[starts[1:], len(sl)]
        feid = int(t["event_id"][0].as_py())
        return pa.table({
            "first_eid": pa.array(np.full(len(starts), feid), pa.int64()),
            "slice": pa.array(sl[starts], pa.int64()),
            "o_slice": pa.array(np.full(len(starts), sl[0]), pa.int64()),
            "o_lat": pa.array(
                np.full(len(starts), t["lat"][0].as_py()), pa.float64()),
            "o_eid": pa.array(np.full(len(starts), feid), pa.int64()),
            "rows": pa.array(ends - starts, pa.int64()),
        })

    p2 = partial_combine(sorted2, block_count2, "pyarrow", batch_size=None)
    p2 = p2.sort_values(["o_slice", "o_lat", "o_eid"]).reset_index(drop=True)
    ybase: dict[tuple[int, int], int] = {}
    run: dict[int, int] = {}
    for feid, sl, rows in zip(p2["first_eid"], p2["slice"], p2["rows"]):
        ybase[(int(feid), int(sl))] = run.get(int(sl), 0)
        run[int(sl)] = run.get(int(sl), 0) + int(rows)
    ref2 = _ray.put((ybase, leaves_per_slice, L))

    def leaf_partial(t: pa.Table) -> pa.Table:
        empty = {
            "leaf_id": pa.array([], pa.int64()),
            "n_points": pa.array([], pa.int64()),
            "min_lon": pa.array([], pa.float64()),
            "max_lon": pa.array([], pa.float64()),
            "min_lat": pa.array([], pa.float64()),
            "max_lat": pa.array([], pa.float64()),
        }
        if t.num_rows == 0:
            return pa.table(empty)
        yb, lps, cap = _ray.get(ref2)
        sl = t["slice"].to_numpy(zero_copy_only=False)
        feid = int(t["event_id"][0].as_py())
        starts = np.flatnonzero(np.r_[True, sl[1:] != sl[:-1]])
        seg = np.repeat(np.arange(len(starts)), np.diff(np.r_[starts, len(sl)]))
        local = np.arange(len(sl), dtype=np.int64) - starts[seg]
        base = np.array([yb[(feid, int(s))] for s in sl[starts]], dtype=np.int64)
        yrank = base[seg] + local
        leaf = sl * lps + yrank // cap
        df = pd.DataFrame({
            "leaf_id": leaf,
            "n_points": 1,
            "min_lon": t["lon"].to_numpy(zero_copy_only=False),
            "max_lon": t["lon"].to_numpy(zero_copy_only=False),
            "min_lat": t["lat"].to_numpy(zero_copy_only=False),
            "max_lat": t["lat"].to_numpy(zero_copy_only=False),
        })
        g = df.groupby("leaf_id", as_index=False).agg(
            n_points=("n_points", "sum"),
            min_lon=("min_lon", "min"), max_lon=("max_lon", "max"),
            min_lat=("min_lat", "min"), max_lat=("max_lat", "max"))
        return pa.Table.from_pandas(g, preserve_index=False)

    out = partial_shuffle_combine(
        sorted2, leaf_partial, ["leaf_id"],
        ["n_points", "min_lon", "max_lon", "min_lat", "max_lat"],
        batch_format="pyarrow", mb_kwargs={"batch_size": None},
        agg={"n_points": "sum", "min_lon": "min", "max_lon": "max",
             "min_lat": "min", "max_lat": "max"},
    )
    out["n_points"] = out["n_points"].astype(np.int64)
    return out.sort_values("leaf_id").reset_index(drop=True)


# ------------- point -> polygon-boundary distance (setback/buffer metric)


def _boundary_edges():
    rows = []
    for pid, verts in ORACLE_POLYGONS.items():
        n = len(verts)
        for sid in range(n):
            x1, y1 = verts[sid]
            x2, y2 = verts[(sid + 1) % n]
            rows.append((pid, sid, x1, y1, x2, y2))
    return rows


def _boundary_sql() -> str:
    # e0 suffixes force DOUBLE literals — bare decimals parse as DECIMAL in
    # DuckDB, whose exact subtraction diverges from the engine's float64
    values = ", ".join(
        f"({fid}, {sid}, {x1!r}e0, {y1!r}e0, {x2!r}e0, {y2!r}e0)"
        for fid, sid, x1, y1, x2, y2 in _boundary_edges()
    )
    return f"""
WITH pts AS (
  SELECT event_id,
         {LON_EXPR.format(k='event_id')} AS lon,
         {LAT_EXPR.format(k='event_id')} AS lat
  FROM events
),
e(fid, sid, x1, y1, x2, y2) AS (VALUES {values}),
d AS (
  SELECT p.event_id, e.fid, e.sid,
         LEAST(GREATEST(((p.lon - e.x1) * (e.x2 - e.x1)
                         + (p.lat - e.y1) * (e.y2 - e.y1))
                        / ((e.x2 - e.x1) * (e.x2 - e.x1)
                           + (e.y2 - e.y1) * (e.y2 - e.y1)), 0.0), 1.0) AS t,
         p.lon, p.lat, e.x1, e.y1, e.x2, e.y2
  FROM pts p CROSS JOIN e
),
d2 AS (
  SELECT event_id, fid, sid,
         (lon - (x1 + t * (x2 - x1))) * (lon - (x1 + t * (x2 - x1)))
         + (lat - (y1 + t * (y2 - y1))) * (lat - (y1 + t * (y2 - y1))) AS d2
  FROM d
),
r AS (
  SELECT event_id, fid, sid, d2,
         ROW_NUMBER() OVER (PARTITION BY event_id ORDER BY d2, fid, sid) AS rn
  FROM d2
)
SELECT event_id, fid AS nearest_field, sid AS seg_idx, d2 AS boundary_dist2
FROM r WHERE rn = 1 ORDER BY event_id
"""


@register("distance_to_field_boundary", _boundary_sql())
def distance_to_field_boundary(sf_dir: str):
    """Point -> polygon-BOUNDARY distance join (the setback/buffer-distance
    primitive behind 'within X of a field edge' filters): for every event,
    the squared distance to the nearest polygon edge segment (clamped
    projection onto each segment) plus which (field, segment) owns it
    (ties -> lowest field then segment).  Broadcast edge arrays, one
    vectorized (points x segments) kernel per batch — the same
    broadcast-small-side shape as the kNN operators.  Every FP op is
    order-identical to the SQL (clamp = LEAST/GREATEST == np.minimum/
    maximum), so the output is bit-exact with NO rounding."""
    import ray as _ray

    edges = _boundary_edges()  # already sorted by (fid, sid)
    fid = np.array([e[0] for e in edges], dtype=np.int64)
    sid = np.array([e[1] for e in edges], dtype=np.int64)
    x1 = np.array([e[2] for e in edges], dtype=np.float64)
    y1 = np.array([e[3] for e in edges], dtype=np.float64)
    x2 = np.array([e[4] for e in edges], dtype=np.float64)
    y2 = np.array([e[5] for e in edges], dtype=np.float64)
    ref = _ray.put((fid, sid, x1, y1, x2, y2))

    ds = read_table(sf_dir, "events", columns=["event_id"])

    def nearest_edge(batch: pa.Table) -> pa.Table:
        _f, _s, _x1, _y1, _x2, _y2 = _ray.get(ref)
        k = batch["event_id"].to_numpy(zero_copy_only=False)
        lon = derive_lon(k)[:, None]
        lat = derive_lat(k)[:, None]
        ex, ey = (_x2 - _x1)[None, :], (_y2 - _y1)[None, :]
        l2 = ex * ex + ey * ey
        t = np.minimum(
            np.maximum(((lon - _x1[None, :]) * ex + (lat - _y1[None, :]) * ey)
                       / l2, 0.0), 1.0)
        dx = lon - (_x1[None, :] + t * ex)
        dy = lat - (_y1[None, :] + t * ey)
        d2 = dx * dx + dy * dy
        best = np.argmin(d2, axis=1)  # edge order == (fid, sid) order
        rows = np.arange(len(k))
        return pa.table(
            {
                "event_id": batch["event_id"],
                "nearest_field": pa.array(_f[best], pa.int64()),
                "seg_idx": pa.array(_s[best], pa.int64()),
                "boundary_dist2": pa.array(d2[rows, best], pa.float64()),
            }
        )

    out = ds.map_batches(nearest_edge, batch_format="pyarrow").to_pandas()
    return out.sort_values("event_id").reset_index(drop=True)


# ------------------------- raster run-length encoding (per-row RLE stats)

_RLE_SQL = f"""
WITH px AS (
  SELECT r.r, c.c FROM generate_series(0, {_POLY_W - 1}) r(r),
                       generate_series(0, {_POLY_W - 1}) c(c)
  WHERE (c.c * c.c * 13 + r.r * r.r * 7 + c.c * r.r * 3) % 100 < {_POLY_THR}
),
s AS (
  SELECT r, c, c - ROW_NUMBER() OVER (PARTITION BY r ORDER BY c) AS grp
  FROM px
),
runs AS (SELECT r, grp, COUNT(*) AS len FROM s GROUP BY r, grp)
SELECT r::BIGINT AS row, COUNT(*)::BIGINT AS n_runs,
       MAX(len)::BIGINT AS longest_run, SUM(len)::BIGINT AS n_masked
FROM runs GROUP BY r ORDER BY r
"""


@register("raster_rle_rows", _RLE_SQL)
def raster_rle_rows(sf_dir: str):
    """Per-row run-length encoding stats of the thresholded mask raster
    (the compression / sparse-encoding pass a tile store runs before
    writing bitmask sidecars): runs per row, longest run, masked-pixel
    count.  Row stripes vectorize the run detection (starts = mask &
    ~mask-shifted, lengths by start-index differences) with zero
    inter-stripe movement — rows are independent by construction.
    Oracle: the gaps-and-islands ROW_NUMBER trick in SQL.  All-integer."""
    import ray.data as rd

    W, THR = _POLY_W, _POLY_THR
    stripes = rd.range(W)

    def rle_rows(batch: pa.Table) -> pa.Table:
        rows = batch["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        cc = np.arange(W, dtype=np.int64)[None, :]
        rr = rows[:, None]
        mask = (cc * cc * 13 + rr * rr * 7 + cc * rr * 3) % 100 < THR
        # pad a False column so runs never span rows when flattened
        m = np.concatenate([mask, np.zeros((len(rows), 1), bool)], axis=1).ravel()
        starts = np.flatnonzero(m & ~np.r_[False, m[:-1]])
        ends = np.flatnonzero(~m & np.r_[False, m[:-1]])
        lens = ends - starts
        row_of = rows[starts // (W + 1)]
        df = pd.DataFrame({"row": row_of, "n_runs": 1, "longest_run": lens,
                           "n_masked": lens})
        g = df.groupby("row", as_index=False).agg(
            n_runs=("n_runs", "sum"), longest_run=("longest_run", "max"),
            n_masked=("n_masked", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    out = stripes.map_batches(rle_rows, batch_format="pyarrow").to_pandas()
    for c in ("n_runs", "longest_run", "n_masked"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values("row").reset_index(drop=True)


# -------------------- bilinear point sampling (interpolated value_at)

_BILIN_SQL = f"""
WITH pts AS (
  SELECT c_custkey,
         {LON_EXPR.format(k='c_custkey')} AS lon,
         {LAT_EXPR.format(k='c_custkey')} AS lat
  FROM customer
),
q AS (
  SELECT c_custkey,
         (lon - (-102.2)) / {_RES} - 0.5 AS cpos,
         (36.5 - lat) / {_RES} - 0.5 AS rpos
  FROM pts
  WHERE lon >= -102.2 AND lon < -101.7 AND lat > 36.0 AND lat <= 36.5
),
g AS (
  SELECT c_custkey, FLOOR(rpos) AS r0, FLOOR(cpos) AS c0,
         rpos - FLOOR(rpos) AS fr, cpos - FLOOR(cpos) AS fc
  FROM q
),
b AS (
  SELECT c_custkey,
    (CASE WHEN r0 >= 0 AND r0 < {_RASTER_H} AND c0 >= 0 AND c0 < {_RASTER_W}
          THEN (((CAST(c0 AS BIGINT) * 31 + CAST(r0 AS BIGINT) * 17) % 1000) / 10.0)
               * ((1.0 - fr) * (1.0 - fc)) ELSE 0.0 END
     + CASE WHEN r0 >= 0 AND r0 < {_RASTER_H} AND c0 + 1 >= 0 AND c0 + 1 < {_RASTER_W}
          THEN ((((CAST(c0 AS BIGINT) + 1) * 31 + CAST(r0 AS BIGINT) * 17) % 1000) / 10.0)
               * ((1.0 - fr) * fc) ELSE 0.0 END
     + CASE WHEN r0 + 1 >= 0 AND r0 + 1 < {_RASTER_H} AND c0 >= 0 AND c0 < {_RASTER_W}
          THEN (((CAST(c0 AS BIGINT) * 31 + (CAST(r0 AS BIGINT) + 1) * 17) % 1000) / 10.0)
               * (fr * (1.0 - fc)) ELSE 0.0 END
     + CASE WHEN r0 + 1 >= 0 AND r0 + 1 < {_RASTER_H} AND c0 + 1 >= 0 AND c0 + 1 < {_RASTER_W}
          THEN ((((CAST(c0 AS BIGINT) + 1) * 31 + (CAST(r0 AS BIGINT) + 1) * 17) % 1000) / 10.0)
               * (fr * fc) ELSE 0.0 END) AS acc,
    (CASE WHEN r0 >= 0 AND r0 < {_RASTER_H} AND c0 >= 0 AND c0 < {_RASTER_W}
          THEN (1.0 - fr) * (1.0 - fc) ELSE 0.0 END
     + CASE WHEN r0 >= 0 AND r0 < {_RASTER_H} AND c0 + 1 >= 0 AND c0 + 1 < {_RASTER_W}
          THEN (1.0 - fr) * fc ELSE 0.0 END
     + CASE WHEN r0 + 1 >= 0 AND r0 + 1 < {_RASTER_H} AND c0 >= 0 AND c0 < {_RASTER_W}
          THEN fr * (1.0 - fc) ELSE 0.0 END
     + CASE WHEN r0 + 1 >= 0 AND r0 + 1 < {_RASTER_H} AND c0 + 1 >= 0 AND c0 + 1 < {_RASTER_W}
          THEN fr * fc ELSE 0.0 END) AS wacc
  FROM g
)
SELECT p.c_custkey, p.lon, p.lat,
       ROUND(b.acc / b.wacc, 9) AS elevation_bilinear
FROM pts p LEFT JOIN b USING (c_custkey)
ORDER BY p.c_custkey
"""


@register("raster_sample_bilinear", _BILIN_SQL)
def raster_sample_bilinear(sf_dir: str):
    """Bilinear-interpolated raster point sampling (the continuous-field
    value_at a soil/elevation product needs between pixel centers) through
    the REAL tile-sampling path (stages/sample.sample_tiles_at_bilinear —
    same pixel-center convention, corner order and nodata renormalization
    as the warp kernel, which until now was only golden-tested).  Oracle:
    the 4-corner weighted sum inline in SQL over the formula DEM, corner
    terms added in the identical order; ROUND(9) guards nothing but the
    DECIMAL-literal parse (every op is order-identical float64)."""
    import ray as _ray

    from demeter_ray.stages.sample import sample_tiles_at_bilinear

    gcol = np.arange(_RASTER_W, dtype=np.int64)[None, :]
    grow = np.arange(_RASTER_H, dtype=np.int64)[:, None]
    px = (((gcol * 31 + grow * 17) % 1000) / 10.0).astype(np.float64)
    transform = (_RES, 0.0, -102.2, 0.0, -_RES, 36.5)
    tiles = [("t0", px, transform, float("nan"),
              geo.raster_bounds(transform, _RASTER_H, _RASTER_W))]
    ref = _ray.put(tiles)

    ds = read_table(sf_dir, "customer", columns=["c_custkey"])

    def sample_fn(batch: pa.Table) -> pa.Table:
        t = _ray.get(ref)
        k = batch["c_custkey"].to_numpy(zero_copy_only=False)
        lon, lat = derive_lon(k), derive_lat(k)
        vals = sample_tiles_at_bilinear(t, lon, lat)
        return pa.table(
            {
                "c_custkey": batch["c_custkey"],
                "lon": pa.array(lon, pa.float64()),
                "lat": pa.array(lat, pa.float64()),
                "elevation_bilinear": pa.array(
                    duck_round(vals, 9), pa.float64(), from_pandas=True),
            }
        )

    out = ds.map_batches(sample_fn, batch_format="pyarrow").to_pandas()
    return out.sort_values("c_custkey").reset_index(drop=True)


# ----------------- raster morphology (3x3 erosion / dilation counts)


def _morph_mask_sql(r: str, c: str) -> str:
    return (
        f"CASE WHEN ({r}) >= 0 AND ({r}) < {_POLY_W} AND ({c}) >= 0 "
        f"AND ({c}) < {_POLY_W} THEN "
        f"(({c}) * ({c}) * 13 + ({r}) * ({r}) * 7 + ({c}) * ({r}) * 3) "
        f"% 100 < {_POLY_THR} ELSE FALSE END"
    )


def _morph_sql() -> str:
    neigh = [(dr, dc) for dr in (-1, 0, 1) for dc in (-1, 0, 1)]
    ero = " AND ".join(_morph_mask_sql(f"g.r + {dr}", f"g.c + {dc}")
                       for dr, dc in neigh)
    dil = " OR ".join(_morph_mask_sql(f"g.r + {dr}", f"g.c + {dc}")
                      for dr, dc in neigh)
    return f"""
WITH g AS (
  SELECT r.r, c.c FROM generate_series(0, {_POLY_W - 1}) r(r),
                       generate_series(0, {_POLY_W - 1}) c(c)
)
SELECT g.r::BIGINT AS row,
       COUNT(*) FILTER (WHERE {_morph_mask_sql('g.r', 'g.c')})::BIGINT
         AS n_mask,
       COUNT(*) FILTER (WHERE {ero})::BIGINT AS n_eroded,
       COUNT(*) FILTER (WHERE {dil})::BIGINT AS n_dilated
FROM g GROUP BY g.r ORDER BY row
"""


@register("raster_morphology_rows", _morph_sql())
def raster_morphology_rows(sf_dir: str):
    """3x3 binary erosion / dilation over the mask raster (the
    mask-cleanup pass before polygonize: erosion kills speckle, dilation
    closes pinholes), distributed as row stripes whose one-row halos come
    from the pure mask formula (the dem_slope_hillshade halo shape — zero
    inter-stripe movement).  Per-row counts of masked / eroded / dilated
    pixels; out-of-grid neighbors count as unmasked.  All-integer."""
    import ray.data as rd

    W, THR = _POLY_W, _POLY_THR
    stripes = rd.range(W)

    def mask_rows(rows: np.ndarray) -> np.ndarray:
        cc = np.arange(-1, W + 1, dtype=np.int64)[None, :]  # padded columns
        rr = rows[:, None]
        m = (cc * cc * 13 + rr * rr * 7 + cc * rr * 3) % 100 < THR
        m[:, 0] = False
        m[:, -1] = False
        bad = (rows < 0) | (rows >= W)
        m[bad, :] = False
        return m

    def morph(batch: pa.Table) -> pa.Table:
        rows = batch["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        zm1, z0, zp1 = mask_rows(rows - 1), mask_rows(rows), mask_rows(rows + 1)
        stacks = [z[:, sl] for z in (zm1, z0, zp1)
                  for sl in (slice(0, W), slice(1, W + 1), slice(2, W + 2))]
        ero = np.logical_and.reduce(stacks)
        dil = np.logical_or.reduce(stacks)
        return pa.table(
            {
                "row": pa.array(rows, pa.int64()),
                "n_mask": pa.array(z0[:, 1:-1].sum(axis=1), pa.int64()),
                "n_eroded": pa.array(ero.sum(axis=1), pa.int64()),
                "n_dilated": pa.array(dil.sum(axis=1), pa.int64()),
            }
        )

    out = stripes.map_batches(morph, batch_format="pyarrow").to_pandas()
    return out.sort_values("row").reset_index(drop=True)


# -------------------- summed-area table (distributed 2D prefix sum)

_SAT_W = 320  # over the integer DEM formula k(r,c) = (c*31 + r*17) % 1000

_SAT_SQL = f"""
WITH g AS (
  SELECT r.r, c.c, (c.c * 31 + r.r * 17) % 1000 AS v
  FROM generate_series(0, {_SAT_W - 1}) r(r),
       generate_series(0, {_SAT_W - 1}) c(c)
),
rc AS (
  SELECT r, c, SUM(v) OVER (PARTITION BY r ORDER BY c) AS rowcum FROM g
),
s AS (
  SELECT r, c, SUM(rowcum) OVER (PARTITION BY c ORDER BY r) AS sat FROM rc
)
SELECT (r * {_SAT_W} + c)::BIGINT AS node, sat::BIGINT AS sat
FROM s WHERE r % 8 = 7 AND c % 8 = 7 ORDER BY node
"""


@register("summed_area_table", _SAT_SQL)
def summed_area_table(sf_dir: str):
    """Summed-area table (integral image) over the 320x320 integer DEM —
    the O(1)-box-filter precomputation behind fast focal means at any
    window size.  Distributed 2D prefix sum, two passes and no shuffle:
    (1) each row stripe emits one W-length COLUMN-SUM partial (O(stripes
    x W) ints to the driver); the driver prefix-sums the stripe partials
    and cumsums each along c — because SAT(r,c) splits as
    cumsum_c(colsum of all rows above the stripe) + the stripe's own 2D
    cumsum — and broadcasts the per-stripe carry vectors; (2) a second
    pass over the SAME stripes adds carry + local 2D cumsum.  The 1D
    running-sum carry shape lifted to 2D.  All-integer, exact; output
    subsampled to every 8th pixel."""
    import ray as _ray
    import ray.data as rd

    W = _SAT_W
    stripes = rd.range(W)

    def stripe_rows(batch: pa.Table):
        rows = batch["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        cc = np.arange(W, dtype=np.int64)[None, :]
        return rows, (cc * 31 + rows[:, None] * 17) % 1000

    def colsum_partial(batch: pa.Table) -> pa.Table:
        rows, v = stripe_rows(batch)
        if len(rows) == 0:
            return pa.table({"first_row": pa.array([], pa.int64()),
                             "colsum": pa.array([], pa.binary())})
        return pa.table({
            "first_row": pa.array([rows[0]], pa.int64()),
            "colsum": pa.array([v.sum(axis=0).tobytes()], pa.binary()),
        })

    parts = partial_combine(stripes, colsum_partial, "pyarrow",
                            batch_size=None)
    parts = parts.sort_values("first_row").reset_index(drop=True)
    sums = np.array([np.frombuffer(b, dtype=np.int64)
                     for b in parts["colsum"]], dtype=np.int64)
    above = np.zeros_like(sums)  # column sums of every row ABOVE the stripe
    if len(sums) > 1:
        above[1:] = np.cumsum(sums[:-1], axis=0)
    # carry(c) = sum_{i<r0} rowcum(i,c) = cumsum_c(above)
    carry_by_first = {int(f): np.cumsum(above[i]).tobytes()
                      for i, f in enumerate(parts["first_row"])}
    ref = _ray.put(carry_by_first)

    def sat_pass(batch: pa.Table) -> pa.Table:
        rows, v = stripe_rows(batch)
        if len(rows) == 0:
            return pa.table({"node": pa.array([], pa.int64()),
                             "sat": pa.array([], pa.int64())})
        carry = np.frombuffer(_ray.get(ref)[int(rows[0])], dtype=np.int64)
        sat = np.cumsum(np.cumsum(v, axis=1), axis=0) + carry[None, :]
        keep_r = rows % 8 == 7
        cols = np.arange(W, dtype=np.int64)
        keep_c = cols % 8 == 7
        node = (rows[keep_r][:, None] * W + cols[keep_c][None, :]).ravel()
        return pa.table({
            "node": pa.array(node, pa.int64()),
            "sat": pa.array(sat[np.ix_(keep_r, keep_c)].ravel(), pa.int64()),
        })

    out = stripes.map_batches(sat_pass, batch_format="pyarrow").to_pandas()
    return out.sort_values("node").reset_index(drop=True)


# ------------------- polygon tile cover (zoom-grid tile assignment)

_COVER_RES = 64  # tiles per degree: tile (tx, ty) spans 1/64 deg


def _cover_sql() -> str:
    R = _COVER_RES
    polys = []
    for pid, verts in ORACLE_POLYGONS.items():
        xs = [v[0] for v in verts]
        ys = [v[1] for v in verts]
        # candidate tiles: the polygon bbox cover
        cand = (
            f"SELECT {pid} AS fid, tx.tx, ty.ty "
            f"FROM generate_series(CAST(FLOOR(({min(xs)!r}e0) * {R} ) AS BIGINT), "
            f"                     CAST(FLOOR(({max(xs)!r}e0) * {R} ) AS BIGINT)) tx(tx), "
            f"     generate_series(CAST(FLOOR(({min(ys)!r}e0) * {R} ) AS BIGINT), "
            f"                     CAST(FLOOR(({max(ys)!r}e0) * {R} ) AS BIGINT)) ty(ty)"
        )
        # separating-axis refine: keep the tile iff for EVERY polygon edge at
        # least one tile corner lies on the inside half-plane
        conds = []
        n = len(verts)
        for i in range(n):
            x1, y1 = verts[i]
            x2, y2 = verts[(i + 1) % n]
            corner = (
                f"(({x2!r}e0) - ({x1!r}e0)) * ({{cy}} - ({y1!r}e0))"
                f" - (({y2!r}e0) - ({y1!r}e0)) * ({{cx}} - ({x1!r}e0)) >= 0.0"
            )
            corners = " OR ".join(
                corner.format(cx=cx, cy=cy)
                for cx in (f"tx / {R}.0", f"(tx + 1) / {R}.0")
                for cy in (f"ty / {R}.0", f"(ty + 1) / {R}.0")
            )
            conds.append(f"({corners})")
        polys.append(f"SELECT fid, tx, ty FROM ({cand}) WHERE "
                     + " AND ".join(conds))
    union = " UNION ALL ".join(polys)
    return f"SELECT fid, tx, ty FROM ({union}) ORDER BY fid, tx, ty"


@register("field_tile_cover", _cover_sql())
def field_tile_cover(sf_dir: str):
    """Polygon -> tile-grid cover (the tile-assignment primitive: which
    1/64-deg tiles must be fetched for each field): bbox candidate tiles
    refined by the separating-axis test for convex polygons vs axis boxes
    (a tile survives iff every edge half-plane contains at least one tile
    corner; the bbox pre-filter handles the box's own axes).  Distributed
    as map_batches over the tile-grid rows with the polygon edge list
    broadcast — the rasterize_fields shape one zoom level up, so the
    cover streams at planetary tile counts.  Partitioning assumption: the
    per-batch loop is over polygons, so at high polygon cardinality the
    small side must shard by coarse cell first (exactly
    stages/pip.sharded_pip_join's gate) — the fixture's 5 quads ride one
    broadcast.  Tile ids and the half-plane tests run on identical
    doubles both sides — exact, no rounding."""
    import ray as _ray
    import ray.data as rd

    R = _COVER_RES
    polys = []
    for pid, verts in ORACLE_POLYGONS.items():
        v = np.array(verts, dtype=np.float64)
        polys.append((pid, v))
    ref = _ray.put(polys)

    ty_lo = int(np.floor(36.0 * R))
    ty_hi = int(np.floor(36.5 * R))

    def cover_rows(batch: pa.Table) -> pa.Table:
        ps = _ray.get(ref)
        tys = batch["id"].to_numpy(zero_copy_only=False).astype(np.int64) + ty_lo
        out_f, out_x, out_y = [], [], []
        for pid, v in ps:
            xs, ys = v[:, 0], v[:, 1]
            tx_lo = int(np.floor(xs.min() * R))
            tx_hi = int(np.floor(xs.max() * R))
            py_lo = int(np.floor(ys.min() * R))
            py_hi = int(np.floor(ys.max() * R))
            m = (tys >= py_lo) & (tys <= py_hi)
            if not m.any():
                continue
            ty_g, tx_g = np.meshgrid(tys[m], np.arange(tx_lo, tx_hi + 1,
                                                       dtype=np.int64),
                                     indexing="ij")
            ty_f, tx_f = ty_g.ravel(), tx_g.ravel()
            cx = np.stack([tx_f / float(R), (tx_f + 1) / float(R)])
            cy = np.stack([ty_f / float(R), (ty_f + 1) / float(R)])
            keep = np.ones(len(tx_f), dtype=bool)
            n = len(v)
            for i in range(n):
                x1, y1 = v[i]
                x2, y2 = v[(i + 1) % n]
                inside = np.zeros(len(tx_f), dtype=bool)
                for a in range(2):
                    for b in range(2):
                        inside |= ((x2 - x1) * (cy[b] - y1)
                                   - (y2 - y1) * (cx[a] - x1)) >= 0.0
                keep &= inside
            out_f.append(np.full(int(keep.sum()), pid, dtype=np.int64))
            out_x.append(tx_f[keep])
            out_y.append(ty_f[keep])
        if not out_f:
            return pa.table({"fid": pa.array([], pa.int64()),
                             "tx": pa.array([], pa.int64()),
                             "ty": pa.array([], pa.int64())})
        return pa.table({
            "fid": pa.array(np.concatenate(out_f), pa.int64()),
            "tx": pa.array(np.concatenate(out_x), pa.int64()),
            "ty": pa.array(np.concatenate(out_y), pa.int64()),
        })

    grid = rd.range(ty_hi - ty_lo + 1)
    out = grid.map_batches(cover_rows, batch_format="pyarrow").to_pandas()
    return out.sort_values(["fid", "tx", "ty"]).reset_index(drop=True)


# ------------------ origin-destination cell flows (trajectory OD matrix)

_OD_G = 16  # OD grid over the 0.5 x 0.5 deg window

_OD_SQL = f"""
WITH pts AS (
  SELECT user_id, ts, event_id,
         CAST(FLOOR(({LON_EXPR.format(k='event_id')} - (-102.2))
                    / 0.5 * {_OD_G}.0) AS BIGINT)
         + CAST(FLOOR(({LAT_EXPR.format(k='event_id')} - 36.0)
                      / 0.5 * {_OD_G}.0) AS BIGINT) * {_OD_G} AS cell
  FROM events
),
seq AS (
  SELECT cell,
         LEAD(cell) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS next_cell
  FROM pts
)
SELECT cell AS cell_from, next_cell AS cell_to, COUNT(*) AS n
FROM seq WHERE next_cell IS NOT NULL
GROUP BY cell_from, cell_to ORDER BY cell_from, cell_to
"""


@register("user_od_cell_flows", _OD_SQL)
def user_od_cell_flows(sf_dir: str):
    """Origin-destination flow matrix over trajectories: per-user ordered
    event sequences binned to a coarse cell grid, consecutive (from, to)
    cell pairs counted — the mobility-analytics OD primitive.  One
    range-partitioned sort; within-block pairs count vectorized; each
    block emits its first/last row so the O(blocks) boundary pairs stitch
    on the driver (the event_transition_counts carry, with integer cells);
    the (from, to) reduction is a size-gated group-sum.  All-integer."""
    from demeter_ray.pipelines.relational import partial_shuffle_combine

    G = _OD_G
    ds = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts"])

    def with_cell(batch: pa.Table) -> pa.Table:
        k = batch["event_id"].to_numpy(zero_copy_only=False)
        lon, lat = derive_lon(k), derive_lat(k)
        cell = (np.floor((lon - (-102.2)) / 0.5 * float(G)).astype(np.int64)
                + np.floor((lat - 36.0) / 0.5 * float(G)).astype(np.int64) * G)
        return pa.table({
            "event_id": batch["event_id"],
            "user_id": batch["user_id"],
            "ts": batch["ts"],
            "cell": pa.array(cell, pa.int64()),
        })

    sorted_ds = (ds.map_batches(with_cell, batch_format="pyarrow")
                 .sort(["user_id", "ts", "event_id"]).materialize())

    def pair_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"cell_from": pa.array([], pa.int64()),
                             "cell_to": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        cell = batch["cell"].to_numpy(zero_copy_only=False)
        same = uid[1:] == uid[:-1]
        df = pd.DataFrame({"cell_from": cell[:-1][same],
                           "cell_to": cell[1:][same]})
        g = df.groupby(["cell_from", "cell_to"], as_index=False).agg(
            n=("cell_from", "size"))
        return pa.Table.from_pandas(g, preserve_index=False)

    counts = partial_shuffle_combine(
        sorted_ds, pair_partial, ["cell_from", "cell_to"], ["n"])

    def boundary(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"first_user": pa.array([], pa.int64()),
                             "first_ts": pa.array([], pa.int64()),
                             "first_eid": pa.array([], pa.int64()),
                             "first_cell": pa.array([], pa.int64()),
                             "last_user": pa.array([], pa.int64()),
                             "last_cell": pa.array([], pa.int64())})
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        cell = batch["cell"].to_numpy(zero_copy_only=False)
        ts = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = batch["event_id"].to_numpy(zero_copy_only=False)
        return pa.table({"first_user": pa.array([uid[0]], pa.int64()),
                         "first_ts": pa.array([ts[0]], pa.int64()),
                         "first_eid": pa.array([eid[0]], pa.int64()),
                         "first_cell": pa.array([cell[0]], pa.int64()),
                         "last_user": pa.array([uid[-1]], pa.int64()),
                         "last_cell": pa.array([cell[-1]], pa.int64())})

    bnd = (partial_combine(sorted_ds, boundary, "pyarrow", batch_size=None)
           .sort_values(["first_user", "first_ts", "first_eid"])
           .reset_index(drop=True))
    if len(bnd):
        prev_user = bnd["last_user"].shift(1)
        prev_cell = bnd["last_cell"].shift(1)
        join = (prev_user == bnd["first_user"]).to_numpy()
        extra = pd.DataFrame({
            "cell_from": prev_cell[join].to_numpy(dtype=np.int64),
            "cell_to": bnd["first_cell"][join].to_numpy(dtype=np.int64),
            "n": 1,
        })
        counts = pd.concat([counts, extra], ignore_index=True)
    out = counts.groupby(["cell_from", "cell_to"], as_index=False)["n"].sum()
    out["n"] = out["n"].astype(np.int64)
    return out.sort_values(["cell_from", "cell_to"]).reset_index(drop=True)


# --------------- categorical zonal majority (modal class per polygon)

_ZMAJ_SQL = f"""
WITH px AS (
  SELECT r.r, c.c,
         -102.2 + (c.c + 0.5) * {_RES} AS lon,
         36.5 - (r.r + 0.5) * {_RES} AS lat,
         ((c.c * 31 + r.r * 17) % 1000) % 7 AS cat
  FROM generate_series(0, {_RASTER_H - 1}) r(r),
       generate_series(0, {_RASTER_W - 1}) c(c)
),
b AS (
  SELECT cat, (SELECT MIN(id) FROM ({_poly_halfplane_union('p')})) AS fid
  FROM px p
),
cnt AS (
  SELECT fid, cat, COUNT(*) AS n FROM b WHERE fid IS NOT NULL
  GROUP BY fid, cat
),
r AS (
  SELECT fid, cat, n,
         ROW_NUMBER() OVER (PARTITION BY fid ORDER BY n DESC, cat) AS rn
  FROM cnt
)
SELECT fid AS field_id, cat::BIGINT AS majority_cat, n::BIGINT AS n_pixels
FROM r WHERE rn = 1 ORDER BY field_id
"""


@register("zonal_majority_fields", _ZMAJ_SQL)
def zonal_majority_fields(sf_dir: str):
    """Categorical zonal statistics — the MAJORITY (modal raster class) per
    polygon zone that land-cover summaries need, complementing the
    numeric zonal_stats_fields: pixel centers + a 7-class categorical
    formula raster burn through the REAL PIP actor pool, per-(zone, class)
    partial counts through the size-gated group-sum, then a tiny per-zone
    argmax (ties -> lowest class).  All-integer.  (sf_dir unused — the
    raster grid is the fixture; kept for the driver's uniform call
    shape.)"""
    import pyarrow.compute as pc
    import ray.data as rd

    from demeter_ray.pipelines.relational import gated_group_sum_ds
    from demeter_ray.stages import pip as pip_stage

    H, W = _RASTER_H, _RASTER_W
    fields_tbl = pa.table(
        {
            "map_unit_key": pa.array(list(ORACLE_POLYGONS), pa.int64()),
            "geom_wkb": pa.array(
                [geo.wkb_from_rings([np.array(v)]) for v in ORACLE_POLYGONS.values()],
                pa.binary(),
            ),
        }
    )

    def to_centers(batch: pa.Table) -> pa.Table:
        rows = batch["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        rr = np.repeat(rows, W)
        cc = np.tile(np.arange(W, dtype=np.int64), len(rows))
        return pa.table(
            {
                "cat": pa.array(((cc * 31 + rr * 17) % 1000) % 7, pa.int64()),
                "lon": pa.array(-102.2 + (cc + 0.5) * _RES, pa.float64()),
                "lat": pa.array(36.5 - (rr + 0.5) * _RES, pa.float64()),
            }
        )

    ds = rd.range(H).map_batches(to_centers, batch_format="pyarrow")
    ds = pip_stage.pip_join(ds, fields_tbl, mode="min", res=12, concurrency=(1, 4))

    def count_partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["map_unit_key"].notna()]
        g = b.assign(fid=b["map_unit_key"].astype(np.int64), n=1)
        return g.groupby(["fid", "cat"], as_index=False)["n"].sum()

    counts = gated_group_sum_ds(ds, count_partial, ["fid", "cat"], ["n"])
    df = counts.to_pandas()
    df = df.sort_values(["fid", "n", "cat"],
                        ascending=[True, False, True]).reset_index(drop=True)
    top = df.groupby("fid", as_index=False).first()
    out = pd.DataFrame({
        "field_id": top["fid"].astype(np.int64),
        "majority_cat": top["cat"].astype(np.int64),
        "n_pixels": top["n"].astype(np.int64),
    })
    return out.sort_values("field_id").reset_index(drop=True)


# -------------- marching-squares case codes (contour extraction core)

_MS_SQL = f"""
WITH cell AS (
  SELECT r.r, c.c,
    (CASE WHEN (c.c * c.c * 13 + r.r * r.r * 7 + c.c * r.r * 3)
               % 100 < {_POLY_THR} THEN 1 ELSE 0 END)
    + 2 * (CASE WHEN ((c.c+1) * (c.c+1) * 13 + r.r * r.r * 7
                      + (c.c+1) * r.r * 3) % 100 < {_POLY_THR}
                THEN 1 ELSE 0 END)
    + 4 * (CASE WHEN ((c.c+1) * (c.c+1) * 13 + (r.r+1) * (r.r+1) * 7
                      + (c.c+1) * (r.r+1) * 3) % 100 < {_POLY_THR}
                THEN 1 ELSE 0 END)
    + 8 * (CASE WHEN (c.c * c.c * 13 + (r.r+1) * (r.r+1) * 7
                      + c.c * (r.r+1) * 3) % 100 < {_POLY_THR}
                THEN 1 ELSE 0 END) AS ms_case
  FROM generate_series(0, {_POLY_W - 2}) r(r),
       generate_series(0, {_POLY_W - 2}) c(c)
)
SELECT ms_case::BIGINT AS ms_case, COUNT(*)::BIGINT AS n_cells
FROM cell GROUP BY ms_case ORDER BY ms_case
"""


@register("marching_squares_cases", _MS_SQL)
def marching_squares_cases(sf_dir: str):
    """Marching-squares case extraction — the vectorized core of raster
    contouring (gdal_contour / skimage.find_contours): every 2x2 cell of
    the mask raster gets its 4-bit case code (TL + 2*TR + 4*BR + 8*BL);
    the case histogram is the contour-topology summary (cases 5/10 are
    the ambiguous saddles).  Row stripes with a one-row formula halo, one
    vectorized pass; histogram via the gated group-sum.  All-integer."""
    import ray.data as rd

    from demeter_ray.pipelines.relational import gated_group_sum_ds

    W, THR = _POLY_W, _POLY_THR
    stripes = rd.range(W - 1)

    def mask_rows(rows: np.ndarray) -> np.ndarray:
        cc = np.arange(W, dtype=np.int64)[None, :]
        rr = rows[:, None]
        return (cc * cc * 13 + rr * rr * 7 + cc * rr * 3) % 100 < THR

    def cases(b: pd.DataFrame) -> pd.DataFrame:
        rows = b["id"].to_numpy(np.int64)
        if len(rows) == 0:
            return pd.DataFrame({"ms_case": pd.Series(dtype=np.int64),
                                 "n_cells": pd.Series(dtype=np.int64)})
        top = mask_rows(rows)
        bot = mask_rows(rows + 1)
        code = (top[:, :-1].astype(np.int64)
                + 2 * top[:, 1:].astype(np.int64)
                + 4 * bot[:, 1:].astype(np.int64)
                + 8 * bot[:, :-1].astype(np.int64))
        vals, counts = np.unique(code, return_counts=True)
        return pd.DataFrame({"ms_case": vals.astype(np.int64),
                             "n_cells": counts.astype(np.int64)})

    hist = gated_group_sum_ds(stripes, cases, ["ms_case"], ["n_cells"])
    out = hist.to_pandas()
    out["n_cells"] = out["n_cells"].astype(np.int64)
    out["ms_case"] = out["ms_case"].astype(np.int64)
    return out.sort_values("ms_case").reset_index(drop=True)


# ----------- partitioned lineage sink manifest (driver-visible writes)

_SINK_SQL = f"""
WITH pts AS (
  SELECT CAST(FLOOR(({LON_EXPR.format(k='event_id')} - (-102.2))
              / 0.5 * {_OD_G}.0) AS BIGINT)
         + CAST(FLOOR(({LAT_EXPR.format(k='event_id')} - 36.0)
                / 0.5 * {_OD_G}.0) AS BIGINT) * {_OD_G} AS cell
  FROM events
)
SELECT cell, COUNT(*) AS n_rows FROM pts GROUP BY cell ORDER BY cell
"""


@register("partitioned_sink_manifest", _SINK_SQL)
def partitioned_sink_manifest(sf_dir: str):
    """The RESUMABLE PARTITIONED SINK run end-to-end under the driver's
    oracle: events bin to 16x16 cells, the REAL lineage sink
    (state/lineage.write_partitioned — groupby(key) shuffle, one atomic
    parquet + lineage sidecar per key, completed keys skipped on re-run)
    writes every partition to scratch, and the returned MANIFEST's
    (key, rows) is hash-compared against SQL — the north-rule
    per-partition-lineage surface, previously golden-only, now
    driver-checked.  Checksums/bytes stay lineage-internal (value-hash,
    not SQL-expressible); idempotent-resume and corruption-recompute
    behavior is pinned in tests/test_lineage.py."""
    import shutil
    import tempfile

    from demeter_ray.state.lineage import write_partitioned

    G = _OD_G
    out_dir = tempfile.mkdtemp(prefix="sink_manifest_")
    try:
        ds = read_table(sf_dir, "events", columns=["event_id"])

        def with_cell(batch: pa.Table) -> pa.Table:
            k = batch["event_id"].to_numpy(zero_copy_only=False)
            lon, lat = derive_lon(k), derive_lat(k)
            cell = (np.floor((lon - (-102.2)) / 0.5 * float(G)).astype(np.int64)
                    + np.floor((lat - 36.0) / 0.5 * float(G)).astype(np.int64) * G)
            return pa.table({
                "event_id": batch["event_id"],
                "cell": pa.array(cell, pa.int64()),
            })

        manifest = write_partitioned(
            ds.map_batches(with_cell, batch_format="pyarrow"),
            out_dir, "cell", sort_cols=["event_id"],
        )
        out = pd.DataFrame({
            "cell": manifest["key"].astype(np.int64),
            "n_rows": manifest["rows"].astype(np.int64),
        })
        return out.sort_values("cell").reset_index(drop=True)
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


# -------------- within-cell nearest neighbor (all-pairs per partition)

_NN_SQL = f"""
WITH pts AS (
  SELECT event_id,
         {LON_EXPR.format(k='event_id')} AS lon,
         {LAT_EXPR.format(k='event_id')} AS lat,
         CAST(FLOOR(({LON_EXPR.format(k='event_id')} - (-102.2))
              / 0.5 * {_OD_G}.0) AS BIGINT)
         + CAST(FLOOR(({LAT_EXPR.format(k='event_id')} - 36.0)
                / 0.5 * {_OD_G}.0) AS BIGINT) * {_OD_G} AS cell
  FROM events
),
p AS (
  SELECT a.event_id, b.event_id AS nn_event_id,
         (a.lon - b.lon) * (a.lon - b.lon)
         + (a.lat - b.lat) * (a.lat - b.lat) AS nn_d2,
         ROW_NUMBER() OVER (PARTITION BY a.event_id ORDER BY
           (a.lon - b.lon) * (a.lon - b.lon)
           + (a.lat - b.lat) * (a.lat - b.lat), b.event_id) AS rn
  FROM pts a JOIN pts b ON a.cell = b.cell AND a.event_id <> b.event_id
)
SELECT event_id, nn_event_id, nn_d2 FROM p WHERE rn = 1 ORDER BY event_id
"""


@register("within_cell_nn_distance", _NN_SQL)
def within_cell_nn_distance(sf_dir: str):
    """Within-partition nearest neighbor — the all-pairs-inside-a-spatial-
    partition primitive (clustering feature extraction, duplicate-site
    detection): points shuffle ONCE on their cell, each group computes its
    pairwise distance matrix vectorized and argmins (ties -> lowest
    neighbor id), singleton cells drop out.  Per-group work is O(k^2) with
    k bounded by the cell size — the partition key IS the memory bound at
    any corpus scale.  Distances are single products of identical doubles
    and argmin picks among identical values: BIT-exact, no rounding."""
    G = _OD_G
    ds = read_table(sf_dir, "events", columns=["event_id"])

    def with_cell(batch: pa.Table) -> pa.Table:
        k = batch["event_id"].to_numpy(zero_copy_only=False)
        lon, lat = derive_lon(k), derive_lat(k)
        cell = (np.floor((lon - (-102.2)) / 0.5 * float(G)).astype(np.int64)
                + np.floor((lat - 36.0) / 0.5 * float(G)).astype(np.int64) * G)
        return pa.table({
            "event_id": batch["event_id"],
            "lon": pa.array(lon, pa.float64()),
            "lat": pa.array(lat, pa.float64()),
            "cell": pa.array(cell, pa.int64()),
        })

    pts = ds.map_batches(with_cell, batch_format="pyarrow")

    def nn_group(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"event_id": pd.Series(dtype=np.int64),
                                 "nn_event_id": pd.Series(dtype=np.int64),
                                 "nn_d2": pd.Series(dtype=np.float64)})
        g = g.sort_values("event_id").reset_index(drop=True)
        eid = g["event_id"].to_numpy(np.int64)
        lon = g["lon"].to_numpy(np.float64)
        lat = g["lat"].to_numpy(np.float64)
        dl = lon[:, None] - lon[None, :]
        dt = lat[:, None] - lat[None, :]
        d2 = dl * dl + dt * dt
        np.fill_diagonal(d2, np.inf)
        best = np.argmin(d2, axis=1)  # first min = lowest eid (rows sorted)
        return pd.DataFrame({
            "event_id": eid,
            "nn_event_id": eid[best],
            "nn_d2": d2[np.arange(len(eid)), best],
        })

    out = (pts.groupby("cell")
           .map_groups(nn_group, batch_format="pandas")
           .to_pandas())
    if len(out) == 0:
        return pd.DataFrame({"event_id": pd.Series(dtype=np.int64),
                             "nn_event_id": pd.Series(dtype=np.int64),
                             "nn_d2": pd.Series(dtype=np.float64)})
    return out.sort_values("event_id").reset_index(drop=True)


# ----------------- Getis-Ord Gi* hotspot z-scores (spatial statistics)

_GI_W = 64  # over the event-count data raster (the density grid)

_GI_SQL = f"""
WITH pts AS (
  SELECT CAST(FLOOR(({LON_EXPR.format(k='event_id')} - (-102.2))
              / 0.5 * {_GI_W}.0) AS BIGINT) AS bx,
         CAST(FLOOR(({LAT_EXPR.format(k='event_id')} - 36.0)
                / 0.5 * {_GI_W}.0) AS BIGINT) AS by
  FROM events
),
cnt AS (SELECT bx, by, COUNT(*) AS c FROM pts GROUP BY bx, by),
grid AS (
  SELECT x.bx, y.by FROM generate_series(0, {_GI_W - 1}) x(bx),
                         generate_series(0, {_GI_W - 1}) y(by)
),
g AS (
  SELECT grid.bx, grid.by, COALESCE(cnt.c, 0) AS c
  FROM grid LEFT JOIN cnt USING (bx, by)
),
tot AS (
  SELECT SUM(c) AS s1, SUM(c * c) AS s2,
         COUNT(*) AS n FROM g
),
k(dx, dy) AS (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),(0,1),
                     (1,-1),(1,0),(1,1)),
nb AS (
  SELECT g.bx + k.dx AS bx, g.by + k.dy AS by, SUM(g.c) AS si, COUNT(*) AS ki
  FROM g CROSS JOIN k
  WHERE g.bx + k.dx BETWEEN 0 AND {_GI_W - 1}
    AND g.by + k.dy BETWEEN 0 AND {_GI_W - 1}
  GROUP BY 1, 2
)
SELECT nb.bx, nb.by,
  ROUND((nb.si - (t.s1 / 4096.0) * nb.ki)
        / (sqrt(t.s2 / 4096.0 - (t.s1 / 4096.0) * (t.s1 / 4096.0))
           * sqrt((4096.0 * nb.ki - nb.ki * nb.ki) / 4095.0)), 6) AS gi_z
FROM nb, tot t
ORDER BY nb.bx, nb.by
"""


@register("hotspot_gi_star", _GI_SQL)
def hotspot_gi_star(sf_dir: str):
    """Getis-Ord Gi* hotspot analysis over the event-count grid — the
    named spatial-statistics operator behind 'where are the significant
    hot/cold spots': per-cell z-score of the 3x3 neighborhood sum against
    the global mean, border cells using their true (smaller) neighbor
    count.  Composition of proven shapes: gated partial counts,
    aggregate-then-replicate neighborhood sums (density kernel with unit
    weights + a neighbor COUNT), global moments from two integers; the
    divisors 4096/4095 are dyadic-or-identical both sides so the z-scores
    agree to the last bit before the guard ROUND(6)."""
    from demeter_ray.pipelines.relational import gated_group_sum_ds

    W = _GI_W
    N = float(W * W)
    ds = read_table(sf_dir, "events", columns=["event_id"])

    def bin_partial(b: pd.DataFrame) -> pd.DataFrame:
        kk = b["event_id"].to_numpy(np.int64)
        lon, lat = derive_lon(kk), derive_lat(kk)
        bx = np.floor((lon - (-102.2)) / 0.5 * float(W)).astype(np.int64)
        by = np.floor((lat - 36.0) / 0.5 * float(W)).astype(np.int64)
        g = pd.DataFrame({"bx": bx, "by": by, "c": 1})
        return g.groupby(["bx", "by"], as_index=False).sum()

    counts = gated_group_sum_ds(ds, bin_partial, ["bx", "by"], ["c"]).to_pandas()
    # dense grid (zero cells participate in the statistic); W*W is small
    # and fixed — the dense fill is a broadcastable constant-size array,
    # not data-sized
    dense = np.zeros((W, W), dtype=np.int64)
    if len(counts):
        dense[counts["bx"].to_numpy(np.int64),
              counts["by"].to_numpy(np.int64)] = counts["c"].to_numpy(np.int64)
    s1 = float(dense.sum())
    s2 = float((dense * dense).sum())
    xbar = s1 / 4096.0
    s = np.sqrt(s2 / 4096.0 - xbar * xbar)
    pad = np.zeros((W + 2, W + 2), dtype=np.int64)
    pad[1:-1, 1:-1] = dense
    si = np.zeros((W, W), dtype=np.int64)
    ki = np.zeros((W, W), dtype=np.int64)
    ones = np.zeros((W + 2, W + 2), dtype=np.int64)
    ones[1:-1, 1:-1] = 1
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            si += pad[1 + dx:W + 1 + dx, 1 + dy:W + 1 + dy]
            ki += ones[1 + dx:W + 1 + dx, 1 + dy:W + 1 + dy]
    bx, by = np.meshgrid(np.arange(W, dtype=np.int64),
                         np.arange(W, dtype=np.int64), indexing="ij")
    kif = ki.astype(np.float64)
    z = (si - xbar * kif) / (s * np.sqrt((4096.0 * kif - kif * kif) / 4095.0))
    out = pd.DataFrame({
        "bx": bx.ravel(), "by": by.ravel(),
        "gi_z": duck_round(z.ravel(), 6),
    })
    return out.sort_values(["bx", "by"]).reset_index(drop=True)


# --------------- Z-order (Morton) locality key (clustering / file layout)

_Z_BITS = 10  # grid 1024 x 1024 (the res-10 cell grid)


def _zorder_sql() -> str:
    # morton = OR over bit k of cx bit -> position 2k+1, cy bit -> 2k
    terms = []
    for k in range(_Z_BITS):
        terms.append(f"(((cx >> {k}) & 1) << {2 * k + 1})")
        terms.append(f"(((cy >> {k}) & 1) << {2 * k})")
    morton = " + ".join(terms)
    return f"""
WITH pts AS (
  SELECT c_custkey,
         {LON_EXPR.format(k='c_custkey')} AS lon,
         {LAT_EXPR.format(k='c_custkey')} AS lat
  FROM customer
),
cells AS (
  SELECT c_custkey,
         CAST(FLOOR((lon + 180.0) / 360.0 * 1024.0) AS BIGINT) AS cx,
         CAST(FLOOR((lat + 90.0) / 180.0 * 1024.0) AS BIGINT) AS cy
  FROM pts
)
SELECT c_custkey, cx, cy, ({morton})::BIGINT AS morton
FROM cells ORDER BY c_custkey
"""


@register("zorder_customers", _zorder_sql())
def zorder_customers(sf_dir: str):
    """Z-order (Morton) locality key over the res-10 cell grid — the
    space-filling-curve clustering key a lakehouse layout optimizer sorts
    files by (Delta OPTIMIZE ZORDER / Hudi space-curve clustering): bit
    interleaving keeps 2D-near cells near in 1D, so range scans prune
    both dimensions.  One vectorized bit-interleave per batch; the key
    feeds Dataset.sort / write partitioning downstream.  All-integer."""
    ds = read_table(sf_dir, "customer", columns=["c_custkey"])

    def zorder(batch: pa.Table) -> pa.Table:
        k = batch["c_custkey"].to_numpy(zero_copy_only=False)
        lon, lat = derive_lon(k), derive_lat(k)
        cx, cy = geo.cell_xy(lon, lat, 10)
        morton = np.zeros(len(k), dtype=np.int64)
        for b in range(_Z_BITS):
            morton |= ((cx >> b) & 1) << (2 * b + 1)
            morton |= ((cy >> b) & 1) << (2 * b)
        return pa.table({
            "c_custkey": batch["c_custkey"],
            "cx": pa.array(cx, pa.int64()),
            "cy": pa.array(cy, pa.int64()),
            "morton": pa.array(morton, pa.int64()),
        })

    out = ds.map_batches(zorder, batch_format="pyarrow").to_pandas()
    return out.sort_values("c_custkey").reset_index(drop=True)


# ---------------- empirical semivariogram (geostatistics / kriging prep)

_VGRAM_BIN = 0.005  # lag bin width in degrees (cells are ~0.031 deg)

_VGRAM_SQL = f"""
WITH pts AS (
  SELECT event_id,
         {LON_EXPR.format(k='event_id')} AS lon,
         {LAT_EXPR.format(k='event_id')} AS lat,
         CAST((event_id * 7) % 100 AS DOUBLE) AS v,
         CAST(FLOOR(({LON_EXPR.format(k='event_id')} - (-102.2))
              / 0.5 * {_OD_G}.0) AS BIGINT)
         + CAST(FLOOR(({LAT_EXPR.format(k='event_id')} - 36.0)
                / 0.5 * {_OD_G}.0) AS BIGINT) * {_OD_G} AS cell
  FROM events
),
p AS (
  SELECT CAST(FLOOR(sqrt((a.lon - b.lon) * (a.lon - b.lon)
                         + (a.lat - b.lat) * (a.lat - b.lat))
                    / {_VGRAM_BIN}) AS BIGINT) AS lag_bin,
         (a.v - b.v) * (a.v - b.v) AS d2v
  FROM pts a JOIN pts b
    ON a.cell = b.cell AND a.event_id < b.event_id
)
SELECT lag_bin, COUNT(*) AS n_pairs,
       ROUND(SUM(d2v) / (2.0 * COUNT(*)), 4) AS gamma
FROM p GROUP BY lag_bin ORDER BY lag_bin
"""


@register("empirical_variogram", _VGRAM_SQL)
def empirical_variogram(sf_dir: str):
    """Empirical semivariogram (the kriging / spatial-correlation
    precursor): gamma(h) = mean squared value difference / 2 over point
    pairs binned by separation distance, pairs restricted to the same
    spatial cell — the within-partition all-pairs shape
    (within_cell_nn_distance), so pair volume is bounded by the
    partition, never O(n^2) global.  Per-group vectorized distance +
    value-difference matrices reduce to per-(bin) moment partials; the
    tiny (bin, n, sum) rows combine driver-side.  sqrt is IEEE-exact so
    lag bins match bit-for-bit; ROUND(4) guards the d2v summation
    order."""
    G = _OD_G
    ds = read_table(sf_dir, "events", columns=["event_id"])

    def with_cols(batch: pa.Table) -> pa.Table:
        k = batch["event_id"].to_numpy(zero_copy_only=False)
        lon, lat = derive_lon(k), derive_lat(k)
        cell = (np.floor((lon - (-102.2)) / 0.5 * float(G)).astype(np.int64)
                + np.floor((lat - 36.0) / 0.5 * float(G)).astype(np.int64) * G)
        return pa.table({
            "event_id": batch["event_id"],
            "lon": pa.array(lon, pa.float64()),
            "lat": pa.array(lat, pa.float64()),
            "v": pa.array(((k.astype(np.int64) * 7) % 100).astype(np.float64),
                          pa.float64()),
            "cell": pa.array(cell, pa.int64()),
        })

    pts = ds.map_batches(with_cols, batch_format="pyarrow")

    def vgram_group(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"lag_bin": pd.Series(dtype=np.int64),
                                 "n_pairs": pd.Series(dtype=np.int64),
                                 "s_d2v": pd.Series(dtype=np.float64)})
        lon = g["lon"].to_numpy(np.float64)
        lat = g["lat"].to_numpy(np.float64)
        v = g["v"].to_numpy(np.float64)
        iu, ju = np.triu_indices(len(g), k=1)
        dl = lon[iu] - lon[ju]
        dt = lat[iu] - lat[ju]
        lag = np.floor(np.sqrt(dl * dl + dt * dt) / _VGRAM_BIN).astype(np.int64)
        dv = v[iu] - v[ju]
        df = pd.DataFrame({"lag_bin": lag, "n_pairs": 1, "s_d2v": dv * dv})
        return df.groupby("lag_bin", as_index=False).sum()

    parts = (pts.groupby("cell")
             .map_groups(vgram_group, batch_format="pandas")
             .to_pandas())
    if len(parts) == 0:
        return pd.DataFrame({"lag_bin": pd.Series(dtype=np.int64),
                             "n_pairs": pd.Series(dtype=np.int64),
                             "gamma": pd.Series(dtype=np.float64)})
    agg = parts.groupby("lag_bin", as_index=False).sum()
    out = pd.DataFrame({
        "lag_bin": agg["lag_bin"].astype(np.int64),
        "n_pairs": agg["n_pairs"].astype(np.int64),
        "gamma": duck_round(agg["s_d2v"].to_numpy(np.float64)
                            / (2.0 * agg["n_pairs"].to_numpy(np.float64)), 4),
    })
    return out.sort_values("lag_bin").reset_index(drop=True)


# -------------- GeoTIFF strip-codec roundtrip (real .tif bytes in the loop)

_GEOTIFF_SQL = """
WITH px AS (
  SELECT event_id // 256 AS tile_id,
         (event_id * 7) % 1000 AS v
  FROM events
)
SELECT tile_id,
       CAST(COUNT(*) AS BIGINT) AS n_valid,
       CAST(SUM(v) AS BIGINT) AS sum_val,
       CAST(MIN(v) AS BIGINT) AS min_val,
       CAST(MAX(v) AS BIGINT) AS max_val,
       -102.2e0 + tile_id * 0.16e0 AS minx
FROM px GROUP BY tile_id ORDER BY tile_id
"""


@register("geotiff_roundtrip_stats", _GEOTIFF_SQL)
def geotiff_roundtrip_stats(sf_dir: str):
    """Per-tile raster statistics computed THROUGH the pure-stdlib GeoTIFF
    strip codec (functions/tiff.py — the reference's Raster.from_file/save
    format, raster/__init__.py:36-47,110-121): events rasterize onto 16x16
    int32 tiles (tile_id = event_id // 256, pixel = event_id % 256, value
    = (event_id*7) % 1000, absent pixels = nodata -1), each tile ENCODES to
    actual .tif bytes and DECODES back inside the group task, and the stats
    + the georeferencing column (minx from the decoded transform) come from
    the decoded raster only.  SQL recomputes the same stats from the value
    expression — exact because the codec is lossless."""
    from demeter_ray.functions import tiff as _tiff

    ds = read_table(sf_dir, "events", columns=["event_id"])

    def with_tile(batch: pa.Table) -> pa.Table:
        k = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "event_id": pa.array(k, pa.int64()),
            "tile_id": pa.array(k // 256, pa.int64()),
        })

    cols = {"tile_id": np.int64, "n_valid": np.int64, "sum_val": np.int64,
            "min_val": np.int64, "max_val": np.int64, "minx": np.float64}
    empty = pd.DataFrame({c: pd.Series(dtype=t) for c, t in cols.items()})

    def tile_stats(g: pd.DataFrame) -> pd.DataFrame:
        k = g["event_id"].to_numpy(np.int64)
        tid = int(k[0] // 256)
        pos = k % 256
        grid = np.full((16, 16), -1, dtype=np.int32)
        grid[pos // 16, pos % 16] = ((k * 7) % 1000).astype(np.int32)
        transform = (0.01, 0.0, -102.2 + tid * 0.16, 0.0, -0.01, 37.9)
        buf = _tiff.encode_geotiff(grid, transform, "EPSG:4326", nodata=-1.0,
                                   rows_per_strip=8)
        px, t, crs, nd = _tiff.decode_geotiff(buf)
        # the roundtrip invariants ARE the operator: fail loud on any drift
        assert crs == "EPSG:4326" and nd == -1.0 and t == transform
        valid = px[px != np.int32(nd)].astype(np.int64)
        minx = geo.raster_bounds(t, *px.shape)[0]
        return pd.DataFrame({
            "tile_id": [tid], "n_valid": [len(valid)],
            "sum_val": [valid.sum()], "min_val": [valid.min()],
            "max_val": [valid.max()], "minx": [minx],
        })

    parts = (ds.map_batches(with_tile, batch_format="pyarrow")
             .groupby("tile_id").map_groups(tile_stats, batch_format="pandas")
             .to_pandas())
    if parts.shape[1] == 0:
        return empty
    for c, t in cols.items():
        parts[c] = parts[c].astype(t)
    return parts.sort_values("tile_id").reset_index(drop=True)


_GEOTIFF_COMP_SQL = """
WITH px AS (
  SELECT event_id // 256 AS tile_id,
         (event_id * 7) % 1000 AS v
  FROM events
)
SELECT tile_id,
       CASE CAST(tile_id % 4 AS INTEGER)
         WHEN 0 THEN 'none' WHEN 1 THEN 'packbits'
         WHEN 2 THEN 'deflate' ELSE 'lzw' END AS comp,
       CAST(COUNT(*) AS BIGINT) AS n_valid,
       CAST(SUM(v) AS BIGINT) AS sum_val,
       CAST(MIN(v) AS BIGINT) AS min_val,
       CAST(MAX(v) AS BIGINT) AS max_val
FROM px GROUP BY tile_id ORDER BY tile_id
"""


@register("geotiff_compressed_roundtrip", _GEOTIFF_COMP_SQL)
def geotiff_compressed_roundtrip(sf_dir: str):
    """geotiff_roundtrip_stats through the codec's COMPRESSED strip paths
    (functions/tiff.py: LZW tag 5 with the libtiff early-change widths,
    DEFLATE tag 8 via zlib, PackBits tag 32773, Predictor tag 317=2 on the
    lzw/deflate tiles — the layouts GDAL emits; reference ingests these via
    rasterio, raster/__init__.py:36-47).  Each tile encodes with the
    compression chosen by tile_id % 4, asserts the deflate/lzw variants beat
    the raw strip bytes, decodes back, and the
    emitted stats come from the decoded raster only.  SQL recomputes stats
    from the value expression — exact because every path is lossless."""
    from demeter_ray.functions import tiff as _tiff

    ds = read_table(sf_dir, "events", columns=["event_id"])

    def with_tile(batch: pa.Table) -> pa.Table:
        k = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "event_id": pa.array(k, pa.int64()),
            "tile_id": pa.array(k // 256, pa.int64()),
        })

    cols = {"tile_id": np.int64, "comp": object, "n_valid": np.int64,
            "sum_val": np.int64, "min_val": np.int64, "max_val": np.int64}
    empty = pd.DataFrame({c: pd.Series(dtype=t) for c, t in cols.items()})
    comps = ("none", "packbits", "deflate", "lzw")

    def tile_stats(g: pd.DataFrame) -> pd.DataFrame:
        k = g["event_id"].to_numpy(np.int64)
        tid = int(k[0] // 256)
        pos = k % 256
        grid = np.full((16, 16), -1, dtype=np.int32)
        grid[pos // 16, pos % 16] = ((k * 7) % 1000).astype(np.int32)
        transform = (0.01, 0.0, -102.2 + tid * 0.16, 0.0, -0.01, 37.9)
        comp = comps[tid % 4]
        pred = 2 if comp in ("deflate", "lzw") else 1
        buf = _tiff.encode_geotiff(grid, transform, "EPSG:4326", nodata=-1.0,
                                   rows_per_strip=8, compression=comp,
                                   predictor=pred)
        if comp in ("deflate", "lzw"):
            # PackBits legitimately expands on dense non-run int32 tiles
            assert len(buf) < grid.nbytes, (tid, comp, len(buf))
        px, t, crs, nd = _tiff.decode_geotiff(buf)
        assert crs == "EPSG:4326" and nd == -1.0 and t == transform
        assert px.dtype == np.int32
        valid = px[px != np.int32(nd)].astype(np.int64)
        return pd.DataFrame({
            "tile_id": [tid], "comp": [comp], "n_valid": [len(valid)],
            "sum_val": [valid.sum()], "min_val": [valid.min()],
            "max_val": [valid.max()],
        })

    parts = (ds.map_batches(with_tile, batch_format="pyarrow")
             .groupby("tile_id").map_groups(tile_stats, batch_format="pandas")
             .to_pandas())
    if parts.shape[1] == 0:
        return empty
    for c, t in cols.items():
        parts[c] = parts[c].astype(t)
    return parts.sort_values("tile_id").reset_index(drop=True)


_GEOTIFF_WIN_SQL = """
WITH px AS (
  SELECT event_id // 1024 AS tile_id,
         (event_id % 1024) // 32 AS r,
         (event_id % 1024) % 32 AS c,
         (event_id * 7) % 1000 AS v
  FROM events
)
SELECT tile_id,
       CAST(COUNT(*) AS BIGINT) AS n_valid,
       CAST(SUM(v) AS BIGINT) AS sum_val,
       CAST(MIN(v) AS BIGINT) AS min_val,
       CAST(MAX(v) AS BIGINT) AS max_val,
       -102.2e0 + tile_id * 0.16e0 + (tile_id % 2) * 16 * 0.01e0 AS minx
FROM px
WHERE r // 16 = (tile_id % 4) // 2 AND c // 16 = (tile_id % 4) % 2
GROUP BY tile_id ORDER BY tile_id
"""


@register("geotiff_window_read", _GEOTIFF_WIN_SQL)
def geotiff_window_read(sf_dir: str):
    """Windowed read of TILED GeoTIFFs — the COG access pattern (reference
    S5 reads remote COG windows via rasterio windows,
    /root/reference/demeter/raster/__init__.py:36-47).  Events rasterize
    onto 32x32 int32 tiles (tile_id = event_id // 1024, pixel = event_id %
    1024, value = (event_id*7) % 1000, absent = nodata -1); each tile
    encodes as a TILED .tif (TileWidth/TileLength 16x16, deflate or lzw by
    tile_id parity, Predictor 2) and only the quadrant window selected by
    tile_id % 4 is decoded back — non-intersecting tiles are never
    decompressed.  Stats + the minx column come from the windowed raster
    and its SHIFTED transform only; the stage also asserts the window
    equals the full-decode slice.  SQL recomputes the same stats from the
    value expression filtered to the quadrant — exact (lossless codec,
    commutative-exact float ops for minx)."""
    from demeter_ray.functions import tiff as _tiff

    ds = read_table(sf_dir, "events", columns=["event_id"])

    def with_tile(batch: pa.Table) -> pa.Table:
        k = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "event_id": pa.array(k, pa.int64()),
            "tile_id": pa.array(k // 1024, pa.int64()),
        })

    cols = {"tile_id": np.int64, "n_valid": np.int64, "sum_val": np.int64,
            "min_val": np.int64, "max_val": np.int64, "minx": np.float64}
    empty = pd.DataFrame({c: pd.Series(dtype=t) for c, t in cols.items()})

    def tile_stats(g: pd.DataFrame) -> pd.DataFrame:
        k = g["event_id"].to_numpy(np.int64)
        tid = int(k[0] // 1024)
        pos = k % 1024
        grid = np.full((32, 32), -1, dtype=np.int32)
        grid[pos // 32, pos % 32] = ((k * 7) % 1000).astype(np.int32)
        transform = (0.01, 0.0, -102.2 + tid * 0.16, 0.0, -0.01, 37.9)
        comp = "lzw" if tid % 2 else "deflate"
        # every third tile rides the BigTIFF (version 43, 64-bit offset)
        # container — same pixels, same stats, different addressing
        buf = _tiff.encode_geotiff(grid, transform, "EPSG:4326", nodata=-1.0,
                                   tile=(16, 16), compression=comp,
                                   predictor=2, bigtiff=(tid % 3 == 0))
        q = tid % 4
        r0, c0 = (q // 2) * 16, (q % 2) * 16
        px, t, crs, nd = _tiff.decode_geotiff(
            buf, window=(r0, r0 + 16, c0, c0 + 16))
        # the windowed-read invariants ARE the operator: fail loud on drift
        assert crs == "EPSG:4326" and nd == -1.0 and px.shape == (16, 16)
        fullpx, tf, _, _ = _tiff.decode_geotiff(buf)
        assert tf == transform and np.array_equal(
            px, fullpx[r0:r0 + 16, c0:c0 + 16])
        valid = px[px != np.int32(-1)].astype(np.int64)
        if len(valid) == 0:
            return empty  # quadrant empty -> no SQL group either
        return pd.DataFrame({
            "tile_id": [tid], "n_valid": [len(valid)],
            "sum_val": [valid.sum()], "min_val": [valid.min()],
            "max_val": [valid.max()], "minx": [float(t[2])],
        })

    parts = (ds.map_batches(with_tile, batch_format="pyarrow")
             .groupby("tile_id").map_groups(tile_stats, batch_format="pandas")
             .to_pandas())
    if parts.shape[1] == 0:
        return empty
    for c, t in cols.items():
        parts[c] = parts[c].astype(t)
    return parts.sort_values("tile_id").reset_index(drop=True)


_DEM_PRED3_SQL = """
WITH px AS (
  SELECT event_id // 256 AS tile_id,
         (event_id % 256) // 16 AS r,
         (event_id % 256) % 16 AS c,
         CAST((event_id * 7) % 1000 AS DOUBLE) * 0.25e0 AS v
  FROM events
)
SELECT tile_id,
       CAST(COUNT(*) AS BIGINT) AS n_valid,
       SUM(v) AS sum_elev,
       MIN(v) AS min_elev,
       MAX(v) AS max_elev
FROM px
WHERE r < 8 AND c >= 8
GROUP BY tile_id ORDER BY tile_id
"""


@register("dem_predictor3_roundtrip", _DEM_PRED3_SQL)
def dem_predictor3_roundtrip(sf_dir: str):
    """float32 DEM tiles through the codec's FLOATING-POINT predictor path
    (functions/tiff.py Predictor=3, TIFF Technical Note 3: MSB-first
    byte-plane split + byte differencing — the deflate+PREDICTOR=3 layout
    GDAL writes for compressed float elevation COGs; reference ingests DEM
    .tif via rasterio, raster/usgs/topography.py).  Events rasterize onto
    16x16 float32 tiles (tile_id = event_id // 256, pixel = event_id % 256,
    elevation = (event_id*7 % 1000) * 0.25 — an exact float32 quarter-step
    grid, absent = nodata -9999), each tile encodes deflate+predictor 3,
    and only the NE 8x8 quadrant window is decoded for the stats; the
    stage also asserts the full decode is bit-identical to the source grid
    (lossless predictor) and the window equals the full-decode slice.  SQL
    recomputes the quadrant stats from the value expression — exact
    because quarter-multiples this small are exact in float32 AND float64,
    so SUM is order-independent."""
    from demeter_ray.functions import tiff as _tiff

    ds = read_table(sf_dir, "events", columns=["event_id"])

    def with_tile(batch: pa.Table) -> pa.Table:
        k = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "event_id": pa.array(k, pa.int64()),
            "tile_id": pa.array(k // 256, pa.int64()),
        })

    cols = {"tile_id": np.int64, "n_valid": np.int64, "sum_elev": np.float64,
            "min_elev": np.float64, "max_elev": np.float64}
    empty = pd.DataFrame({c: pd.Series(dtype=t) for c, t in cols.items()})

    def tile_stats(g: pd.DataFrame) -> pd.DataFrame:
        k = g["event_id"].to_numpy(np.int64)
        tid = int(k[0] // 256)
        pos = k % 256
        grid = np.full((16, 16), -9999.0, dtype=np.float32)
        grid[pos // 16, pos % 16] = (((k * 7) % 1000) * 0.25).astype(
            np.float32)
        transform = (0.01, 0.0, -102.2 + tid * 0.16, 0.0, -0.01, 37.9)
        buf = _tiff.encode_geotiff(grid, transform, "EPSG:4326",
                                   nodata=-9999.0, rows_per_strip=4,
                                   compression="deflate", predictor=3)
        fullpx, t, crs, nd = _tiff.decode_geotiff(buf)
        # the lossless-predictor invariants ARE the operator: fail loud
        assert fullpx.dtype == np.float32 and np.array_equal(fullpx, grid)
        assert crs == "EPSG:4326" and nd == -9999.0 and t == transform
        win = _tiff.decode_geotiff(buf, window=(0, 8, 8, 16))[0]
        assert np.array_equal(win, fullpx[0:8, 8:16])
        valid = win[win != np.float32(-9999.0)].astype(np.float64)
        if len(valid) == 0:
            return empty  # quadrant empty -> no SQL group either
        return pd.DataFrame({
            "tile_id": [tid], "n_valid": [len(valid)],
            "sum_elev": [valid.sum()], "min_elev": [valid.min()],
            "max_elev": [valid.max()],
        })

    parts = (ds.map_batches(with_tile, batch_format="pyarrow")
             .groupby("tile_id").map_groups(tile_stats, batch_format="pandas")
             .to_pandas())
    if parts.shape[1] == 0:
        return empty
    for c, t in cols.items():
        parts[c] = parts[c].astype(t)
    return parts.sort_values("tile_id").reset_index(drop=True)


_GEOTIFF_RGB_SQL = """
WITH px AS (
  SELECT event_id // 256 AS tile_id,
         (event_id % 256) // 16 AS r,
         (event_id % 256) % 16 AS c,
         (event_id * 3) % 977 AS v0,
         (event_id * 5 + 1) % 977 AS v1,
         (event_id * 7 + 2) % 977 AS v2
  FROM events)
SELECT tile_id,
  CAST(SUM(v0) AS BIGINT) AS r_sum,
  CAST(SUM(v1) AS BIGINT) AS g_sum,
  CAST(SUM(v2) AS BIGINT) AS b_sum,
  CAST(SUM((r+1)*(c+1)*(v0+v1+v2)) AS BIGINT) AS wsum
FROM px GROUP BY tile_id ORDER BY tile_id
"""


@register("geotiff_rgb_bands", _GEOTIFF_RGB_SQL)
def geotiff_rgb_bands(sf_dir: str):
    """Multi-band (RGB) GeoTIFF roundtrip — the satellite-imagery shape
    (reference rasters are rasterio multi-band datasets,
    /root/reference/demeter/raster/__init__.py:36-47).  Events rasterize
    onto 16x16x3 uint16 tiles (tile_id = event_id // 256, absent pixels 0);
    each tile encodes through functions/tiff.py as SamplesPerPixel=3 with
    PlanarConfiguration cycling chunky/planar by tile parity and
    deflate/lzw + per-sample Predictor 2, then decodes back.  The stage
    asserts decode == source, chunky-vs-planar decode equality, and that a
    multi-band WINDOW read equals the full-decode slice; outputs are
    per-band sums plus a position-weighted checksum that SQL recomputes
    from the value formulas (wsum catches any spatial or band scramble).
    Lossless end-to-end."""
    from demeter_ray.functions import tiff as _tiff

    ds = read_table(sf_dir, "events", columns=["event_id"])

    def with_tile(batch: pa.Table) -> pa.Table:
        k = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "event_id": pa.array(k, pa.int64()),
            "tile_id": pa.array(k // 256, pa.int64()),
        })

    cols = {"tile_id": np.int64, "r_sum": np.int64, "g_sum": np.int64,
            "b_sum": np.int64, "wsum": np.int64}
    empty = pd.DataFrame({c: pd.Series(dtype=t) for c, t in cols.items()})

    def tile_stats(g: pd.DataFrame) -> pd.DataFrame:
        k = g["event_id"].to_numpy(np.int64)
        tid = int(k[0] // 256)
        pos = k % 256
        grid = np.zeros((16, 16, 3), dtype=np.uint16)
        grid[pos // 16, pos % 16, 0] = ((k * 3) % 977).astype(np.uint16)
        grid[pos // 16, pos % 16, 1] = ((k * 5 + 1) % 977).astype(np.uint16)
        grid[pos // 16, pos % 16, 2] = ((k * 7 + 2) % 977).astype(np.uint16)
        transform = (0.02, 0.0, -101.5 + tid * 0.32, 0.0, -0.02, 41.3)
        comp = "lzw" if tid % 2 else "deflate"
        bufs = [_tiff.encode_geotiff(grid, transform, "EPSG:32613", nodata=None,
                                     compression=comp, predictor=2,
                                     rows_per_strip=5, planar=p)
                for p in (1, 2)]
        chunky, _, crs, _ = _tiff.decode_geotiff(bufs[0])
        planar, tf, _, _ = _tiff.decode_geotiff(bufs[1])
        # the multi-band invariants ARE the operator: fail loud on drift
        assert crs == "EPSG:32613" and tf == transform
        assert np.array_equal(chunky, grid) and np.array_equal(planar, grid)
        win, wt, _, _ = _tiff.decode_geotiff(bufs[tid % 2], window=(4, 12, 2, 14))
        assert np.array_equal(win, grid[4:12, 2:14])
        assert wt[2] == transform[2] + 0.02 * 2
        p64 = chunky.astype(np.int64)
        wgt = np.outer(np.arange(1, 17), np.arange(1, 17))
        return pd.DataFrame({
            "tile_id": [tid],
            "r_sum": [p64[:, :, 0].sum()], "g_sum": [p64[:, :, 1].sum()],
            "b_sum": [p64[:, :, 2].sum()],
            "wsum": [(p64.sum(axis=2) * wgt).sum()],
        })

    parts = (ds.map_batches(with_tile, batch_format="pyarrow")
             .groupby("tile_id").map_groups(tile_stats, batch_format="pandas")
             .to_pandas())
    if parts.shape[1] == 0:
        return empty
    for c, t in cols.items():
        parts[c] = parts[c].astype(t)
    return parts.sort_values("tile_id").reset_index(drop=True)


_GEOTIFF_OVR_SQL = """
WITH px AS (
  SELECT event_id // 1024 AS tile_id,
         (event_id % 1024) // 32 AS r,
         (event_id % 1024) % 32 AS c,
         (event_id * 11) % 1000 AS v
  FROM events),
l1 AS (
  SELECT tile_id, r // 2 AS br, c // 2 AS bc, SUM(v) // 4 AS bv
  FROM px GROUP BY tile_id, r // 2, c // 2),
l2 AS (
  SELECT tile_id, SUM(v) // 16 AS bv
  FROM px GROUP BY tile_id, r // 4, c // 4)
SELECT l1.tile_id,
  CAST(SUM(l1.bv) AS BIGINT) AS ov1_sum,
  CAST(SUM((l1.br + 1) * (l1.bc + 1) * l1.bv) AS BIGINT) AS ov1_wsum,
  CAST((SELECT SUM(l2.bv) FROM l2 WHERE l2.tile_id = l1.tile_id) AS BIGINT)
    AS ov2_sum
FROM l1 GROUP BY l1.tile_id ORDER BY l1.tile_id
"""


@register("geotiff_overview_pyramid", _GEOTIFF_OVR_SQL)
def geotiff_overview_pyramid(sf_dir: str):
    """COG overview pyramids: events rasterize onto 32x32 int32 grids
    (absent pixels 0), encode as a GeoTIFF whose IFD chain carries
    factor-2 and factor-4 AVERAGE overviews (NewSubfileType=1 — the COG
    reduced-resolution structure GDAL emits), and the stage reads BOTH
    overview levels back (never decoding them from the primary), summing
    each and weighting level-1 blocks by position.  SQL recomputes the
    exact block means (floor division, 32 divides evenly so every block
    is full) from the value formula.  The stage asserts the primary
    decodes bit-exact, the overview transforms scale by the factor, and
    geotiff_overview_count sees the chain."""
    from demeter_ray.functions import tiff as _tiff

    ds = read_table(sf_dir, "events", columns=["event_id"])

    def with_tile(batch: pa.Table) -> pa.Table:
        k = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "event_id": pa.array(k, pa.int64()),
            "tile_id": pa.array(k // 1024, pa.int64()),
        })

    cols = {"tile_id": np.int64, "ov1_sum": np.int64, "ov1_wsum": np.int64,
            "ov2_sum": np.int64}
    empty = pd.DataFrame({c: pd.Series(dtype=t) for c, t in cols.items()})

    def tile_stats(g: pd.DataFrame) -> pd.DataFrame:
        k = g["event_id"].to_numpy(np.int64)
        tid = int(k[0] // 1024)
        pos = k % 1024
        grid = np.zeros((32, 32), dtype=np.int32)
        grid[pos // 32, pos % 32] = ((k * 11) % 1000).astype(np.int32)
        transform = (0.05, 0.0, -99.0 + tid * 1.6, 0.0, -0.05, 44.0)
        buf = _tiff.encode_geotiff(grid, transform, "EPSG:4326",
                                   compression="deflate", predictor=2,
                                   overviews=[2, 4], resampling="average")
        assert _tiff.geotiff_overview_count(buf) == 2
        full, tf, _, _ = _tiff.decode_geotiff(buf)
        assert np.array_equal(full, grid) and tf == transform
        ov1, t1, _, _ = _tiff.decode_geotiff(buf, overview=1)
        ov2, t2, _, _ = _tiff.decode_geotiff(buf, overview=2)
        assert ov1.shape == (16, 16) and ov2.shape == (8, 8)
        assert t1[0] == transform[0] * 2 and t2[4] == transform[4] * 4
        o1 = ov1.astype(np.int64)
        wgt = np.multiply.outer(np.arange(1, 17), np.arange(1, 17))
        return pd.DataFrame({
            "tile_id": [tid], "ov1_sum": [o1.sum()],
            "ov1_wsum": [(o1 * wgt).sum()],
            "ov2_sum": [ov2.astype(np.int64).sum()],
        })

    parts = (ds.map_batches(with_tile, batch_format="pyarrow")
             .groupby("tile_id").map_groups(tile_stats, batch_format="pandas")
             .to_pandas())
    if parts.shape[1] == 0:
        return empty
    for c, t in cols.items():
        parts[c] = parts[c].astype(t)
    return parts.sort_values("tile_id").reset_index(drop=True)


_PNG16_TIFF_SQL = """
WITH px AS (
  SELECT event_id // 256 AS tile_id,
         (event_id % 256) // 16 AS r,
         (event_id % 256) % 16 AS c,
         (event_id * 13) % 60000 AS v
  FROM events)
SELECT tile_id,
  CAST(SUM(v) AS BIGINT) AS win_sum,
  CAST(MAX(v) AS BIGINT) AS win_max,
  CAST(SUM((r % 8 + 1) * v) AS BIGINT) AS win_wsum
FROM px
WHERE r // 8 = tile_id % 2 AND c // 8 = (tile_id // 2) % 2
GROUP BY tile_id ORDER BY tile_id
"""


@register("png16_geotiff_interop", _PNG16_TIFF_SQL)
def png16_geotiff_interop(sf_dir: str):
    """Cross-codec interop on 16-bit elevation rasters: events rasterize
    onto 16x16 uint16 grids (absent pixels 0) that flow PNG16 -> decode ->
    GeoTIFF (deflate + Predictor 2) -> WINDOWED read of the quadrant
    selected by tile_id — the hand-off a pipeline makes when web-delivered
    16-bit PNG elevation tiles are re-materialized as COG-style GeoTIFF
    for raster math.  Both decodes are asserted bit-exact in-stage; the
    emitted stats come from the WINDOWED GeoTIFF read only (sum, max, and
    a row-weighted sum in window-local row coordinates), recomputed by SQL
    from the value formula filtered to the quadrant.  Lossless end-to-end
    across two codecs."""
    from demeter_ray.functions import png as _png
    from demeter_ray.functions import tiff as _tiff

    ds = read_table(sf_dir, "events", columns=["event_id"])

    def with_tile(batch: pa.Table) -> pa.Table:
        k = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "event_id": pa.array(k, pa.int64()),
            "tile_id": pa.array(k // 256, pa.int64()),
        })

    cols = {"tile_id": np.int64, "win_sum": np.int64, "win_max": np.int64,
            "win_wsum": np.int64}
    empty = pd.DataFrame({c: pd.Series(dtype=t) for c, t in cols.items()})

    def tile_stats(g: pd.DataFrame) -> pd.DataFrame:
        k = g["event_id"].to_numpy(np.int64)
        tid = int(k[0] // 256)
        pos = k % 256
        grid = np.zeros((16, 16), dtype=np.uint16)
        grid[pos // 16, pos % 16] = ((k * 13) % 60000).astype(np.uint16)
        png_bytes = _png.encode_png(grid.astype(np.uint16))
        back = _png.decode_png(png_bytes)
        assert back.dtype == np.uint16 and np.array_equal(back[:, :, 0], grid)
        transform = (0.03, 0.0, -97.0 + tid * 0.48, 0.0, -0.03, 39.5)
        tif = _tiff.encode_geotiff(back[:, :, 0], transform, "EPSG:32612",
                                   compression="deflate", predictor=2,
                                   rows_per_strip=4)
        r0 = (tid % 2) * 8
        c0 = ((tid // 2) % 2) * 8
        win, wt, crs, _ = _tiff.decode_geotiff(
            tif, window=(r0, r0 + 8, c0, c0 + 8))
        assert crs == "EPSG:32612" and win.shape == (8, 8)
        assert wt[2] == transform[2] + 0.03 * c0
        full, *_ = _tiff.decode_geotiff(tif)
        assert np.array_equal(full, grid)
        w64 = win.astype(np.int64)
        # SQL emits a group only when >= 1 event lands in the quadrant;
        # absent pixels are 0 so sums/max agree whenever the group exists
        in_q = ((pos // 16) // 8 == tid % 2) & ((pos % 16) // 8 == (tid // 2) % 2)
        if not in_q.any():
            return empty
        return pd.DataFrame({
            "tile_id": [tid], "win_sum": [w64.sum()],
            "win_max": [w64.max()],
            "win_wsum": [(w64 * (np.arange(8)[:, None] + 1)).sum()],
        })

    parts = (ds.map_batches(with_tile, batch_format="pyarrow")
             .groupby("tile_id").map_groups(tile_stats, batch_format="pandas")
             .to_pandas())
    if parts.shape[1] == 0:
        return empty
    for c, t in cols.items():
        parts[c] = parts[c].astype(t)
    return parts.sort_values("tile_id").reset_index(drop=True)


# JPEG-compressed GeoTIFF tiles (TIFF compression 7, JPEGTables tag 347) —
# the web-served-COG imagery layout.  The codec is lossy, so the oracle
# checks the SOURCE pixel stats (pure doc_id/pixel-index arithmetic, exact
# in SQL) while the lossy-decode invariants (PSNR >= 40 dB, windowed read
# == full-decode slice, overview chain present) are asserted in-stage and
# carried into the driver compare as constant-TRUE flag columns.
_JPEG_COG_SQL = """
WITH px AS (
  SELECT d.doc_id,
         ((d.doc_id * 97 + c.c * 31 + r.r * 17 + ch.ch * 11) % 256) AS v,
         (r.r + 1) * (c.c + 1) * (ch.ch + 1) AS wgt
  FROM documents d,
       generate_series(0, 31) AS r(r),
       generate_series(0, 31) AS c(c),
       generate_series(0, 2) AS ch(ch)
)
SELECT doc_id,
       CAST(SUM(v) AS BIGINT) AS src_sum,
       CAST(SUM(wgt * v) AS BIGINT) AS src_wsum,
       TRUE AS psnr_ok, TRUE AS win_ok, TRUE AS ovr_ok
FROM px GROUP BY doc_id ORDER BY doc_id
"""


@register("jpeg_cog_tiles", _JPEG_COG_SQL)
def jpeg_cog_tiles(sf_dir: str):
    """JPEG-in-TIFF (compression 7): per doc, a 32x32 RGB tile encodes as
    a TILED GeoTIFF (16x16 tiles, JPEG-compressed segments with the shared
    DQT/DHT factored into the JPEGTables tag) with an average-resampled
    overview level — the GDAL web-COG layout.  In-stage asserts: roundtrip
    PSNR >= 40 dB vs the source (the north rule's bar), a quadrant window
    read equals the same slice of the full decode (bit-exact: both decode
    the same lossy file), and the overview chain decodes at half
    resolution.  SQL recomputes the SOURCE tile stats from the generator
    formula; the flags carry the lossy invariants into the value hash."""
    from demeter_ray.functions import codec as codecfns
    from demeter_ray.functions import tiff as tifffns

    ds = read_table(sf_dir, "documents", columns=["doc_id"])
    cols = {"doc_id": "int64", "src_sum": "int64", "src_wsum": "int64",
            "psnr_ok": "bool", "win_ok": "bool", "ovr_ok": "bool"}

    def per_doc(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        rows: dict[str, list] = {c: [] for c in cols}
        for d in ids:
            d = int(d)
            src = codecfns.generate_pixels(d, 32, 32)  # (32, 32, 3) uint8
            transform = (0.01, 0.0, -102.2 + (d % 64) * 0.32, 0.0, -0.01, 37.9)
            buf = tifffns.encode_geotiff(
                src, transform, "EPSG:4326", tile=(16, 16),
                compression="jpeg", overviews=[2], resampling="average")
            full, t, crs, _ = tifffns.decode_geotiff(buf)
            assert crs == "EPSG:4326" and t == transform
            err = full.astype(np.int64) - src.astype(np.int64)
            mse = float(np.mean(np.square(err)))
            psnr_ok = mse == 0 or 10 * np.log10(255.0**2 / mse) >= 40.0
            assert psnr_ok, f"JPEG tile PSNR below 40 dB for doc {d}"
            q = d % 4
            r0, c0 = (q // 2) * 16, (q % 2) * 16
            win, tw, _, _ = tifffns.decode_geotiff(
                buf, window=(r0, r0 + 16, c0, c0 + 16))
            win_ok = (np.array_equal(win, full[r0:r0 + 16, c0:c0 + 16])
                      and abs(tw[2] - (t[2] + 0.01 * c0)) < 1e-9)
            assert win_ok, f"JPEG windowed read diverged for doc {d}"
            ovr, _, _, _ = tifffns.decode_geotiff(buf, overview=1)
            ovr_ok = (ovr.shape == (16, 16, 3)
                      and tifffns.geotiff_overview_count(buf) == 1)
            assert ovr_ok, f"JPEG overview chain broken for doc {d}"
            v = src.astype(np.int64)
            wgt = ((np.arange(32)[:, None, None] + 1)
                   * (np.arange(32)[None, :, None] + 1)
                   * (np.arange(3)[None, None, :] + 1))
            rows["doc_id"].append(d)
            rows["src_sum"].append(int(v.sum()))
            rows["src_wsum"].append(int((wgt * v).sum()))
            rows["psnr_ok"].append(bool(psnr_ok))
            rows["win_ok"].append(bool(win_ok))
            rows["ovr_ok"].append(bool(ovr_ok))
        return pa.table({
            "doc_id": pa.array(rows["doc_id"], pa.int64()),
            "src_sum": pa.array(rows["src_sum"], pa.int64()),
            "src_wsum": pa.array(rows["src_wsum"], pa.int64()),
            "psnr_ok": pa.array(rows["psnr_ok"], pa.bool_()),
            "win_ok": pa.array(rows["win_ok"], pa.bool_()),
            "ovr_ok": pa.array(rows["ovr_ok"], pa.bool_()),
        })

    parts = ds.map_batches(per_doc, batch_format="pyarrow",
                           batch_size=64).to_pandas()
    if parts.shape[1] == 0:
        return pd.DataFrame({c: pd.Series(dtype=t) for c, t in cols.items()})
    for c, t in cols.items():
        parts[c] = parts[c].astype(t)
    return parts.sort_values("doc_id").reset_index(drop=True)


# ------------------- vector ingest: real shapefile / GeoJSON bytes in the loop

def _shpfile_sql() -> str:
    rows = []
    for pid, verts in ORACLE_POLYGONS.items():
        conds = []
        n = len(verts)
        for i in range(n):
            x1, y1 = verts[i]
            x2, y2 = verts[(i + 1) % n]
            conds.append(
                f"(({x2}) - ({x1})) * (p.lat - ({y1})) - (({y2}) - ({y1})) * (p.lon - ({x1})) >= 0.0"
            )
        rows.append(f"SELECT {pid} AS id WHERE " + " AND ".join(conds))
    poly_union = " UNION ALL ".join(rows)
    return f"""
WITH pts AS (
  SELECT event_id,
         {LON_EXPR.format(k='event_id')} AS lon,
         {LAT_EXPR.format(k='event_id')} AS lat
  FROM events
), joined AS (
  SELECT (SELECT MIN(id) FROM ({poly_union})) AS fid
  FROM pts p
)
SELECT fid AS mukey,
       'field_' || CAST(fid AS VARCHAR) AS fname,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM joined WHERE fid IS NOT NULL
GROUP BY fid ORDER BY fid
"""


@register("shapefile_pip_count", _shpfile_sql())
def shapefile_pip_count(sf_dir: str):
    """Spatial join whose field polygons and attributes travel through REAL
    shapefile bytes (functions/shp.py: .shp polygon records with the spec's
    CW-outer winding, .dbf dBase III attributes — the format family the
    reference ingests via geopandas.read_file,
    /root/reference/demeter/api.py:41-50, raster/polaris.py:180).  The
    SSURGO-style field table encodes to .shp/.shx/.dbf, decodes back, the
    stage asserts the geometry WKB and both attribute columns are
    BIT-IDENTICAL through the file format, and the decoded table feeds the
    PIP actor pool over the events stream; per-field INNER counts carry the
    dbf-decoded fname attribute.  SQL recomputes containment as half-plane
    tests and the counts by the same min-id tie rule."""
    from demeter_ray.functions import shp as _shp
    from demeter_ray.stages import pip as pip_stage

    wkbs = [geo.wkb_from_rings([np.array(v, np.float64)])
            for v in ORACLE_POLYGONS.values()]
    src = pa.table({
        "mukey": pa.array(list(ORACLE_POLYGONS), pa.int64()),
        "fname": pa.array([f"field_{i}" for i in ORACLE_POLYGONS],
                          pa.string()),
        "geom_wkb": pa.array(wkbs, pa.binary()),
    })
    files = _shp.encode_shapefile(src)
    fields_tbl = _shp.decode_shapefile(files["shp"], files["dbf"])
    # the format-roundtrip invariants ARE the operator: fail loud on drift
    assert fields_tbl["geom_wkb"].to_pylist() == wkbs
    assert fields_tbl["mukey"].to_pylist() == src["mukey"].to_pylist()
    assert fields_tbl["fname"].to_pylist() == src["fname"].to_pylist()

    ds = read_table(sf_dir, "events", columns=["event_id"])

    def to_points(batch: pa.Table) -> pa.Table:
        k = batch["event_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "event_id": batch["event_id"],
            "lon": pa.array(derive_lon(k), pa.float64()),
            "lat": pa.array(derive_lat(k), pa.float64()),
        })

    pip_tbl = pa.table({"map_unit_key": fields_tbl["mukey"],
                        "geom_wkb": fields_tbl["geom_wkb"]})
    joined = pip_stage.pip_join(
        ds.map_batches(to_points, batch_format="pyarrow"),
        pip_tbl, mode="min", res=12, concurrency=(1, 4))

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        d = b.dropna(subset=["map_unit_key"])  # INNER: unmatched drop
        if len(d) == 0:
            return pd.DataFrame({"mukey": pd.Series(dtype=np.int64),
                                 "n_events": pd.Series(dtype=np.int64)})
        g = d.groupby("map_unit_key", as_index=False).size()
        return pd.DataFrame({"mukey": g["map_unit_key"].astype(np.int64),
                             "n_events": g["size"].astype(np.int64)})

    parts = partial_combine(joined, partial)
    names = dict(zip(fields_tbl["mukey"].to_pylist(),
                     fields_tbl["fname"].to_pylist()))
    if len(parts) == 0:
        return pd.DataFrame({"mukey": pd.Series(dtype=np.int64),
                             "fname": pd.Series(dtype=str),
                             "n_events": pd.Series(dtype=np.int64)})
    agg = parts.groupby("mukey", as_index=False)["n_events"].sum()
    out = pd.DataFrame({
        "mukey": agg["mukey"].astype(np.int64),
        "fname": agg["mukey"].map(names),  # dbf-decoded attribute flow
        "n_events": agg["n_events"].astype(np.int64),
    })
    return out.sort_values("mukey").reset_index(drop=True)


_GEOJSON_SQL = f"""
WITH pts AS (
  SELECT event_id,
         {LON_EXPR.format(k='event_id')} AS lon,
         {LAT_EXPR.format(k='event_id')} AS lat,
         (((event_id * 13) % 7) + 1) * 0.001e0 AS r
  FROM events
)
SELECT event_id % 97 AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_features,
       MIN(lon - r) AS min_minx,
       MAX(lon + r) AS max_maxx,
       MIN(lat - r) AS min_miny,
       MAX(lat + r) AS max_maxy
FROM pts GROUP BY bucket ORDER BY bucket
"""


@register("geojson_parse_bounds", _GEOJSON_SQL)
def geojson_parse_bounds(sf_dir: str):
    """Distributed GeoJSON ingest (functions/shp.py geojson codec — the
    reference's canonical boundary input, geopandas.read_file on
    *.geojson: /root/reference/demeter/raster/usgs/topography.py:65,
    hydrography.py:170).  Every event becomes a quad field polygon
    (formula-seeded center/half-width), SERIALIZED to GeoJSON Feature text
    in one stage and PARSED BACK from a per-batch FeatureCollection in the
    next — so actual RFC 7946 text is the inter-stage currency, exactly as
    a boundary-file ingest would stream; repr float serialization makes
    the roundtrip bit-exact, and the stage asserts the parsed WKB equals
    the directly-built WKB per feature.  Parsed bounds aggregate per
    bucket with MIN/MAX (order-independent, so float-exact vs SQL)."""
    import json as _json

    from demeter_ray.functions import shp as _shp

    ds = read_table(sf_dir, "events", columns=["event_id"])

    def to_geojson(batch: pa.Table) -> pa.Table:
        k = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        lon, lat = derive_lon(k), derive_lat(k)
        r = (((k * 13) % 7) + 1) * 0.001
        texts = []
        for i in range(len(k)):
            x0, x1 = float(lon[i] - r[i]), float(lon[i] + r[i])
            y0, y1 = float(lat[i] - r[i]), float(lat[i] + r[i])
            ring = [[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]]
            texts.append(_json.dumps({
                "type": "Feature",
                "properties": {"event_id": int(k[i])},
                "geometry": {"type": "Polygon", "coordinates": [ring]},
            }))
        return pa.table({"gj": pa.array(texts, pa.string())})

    def parse_batch(batch: pa.Table) -> pa.Table:
        feats = batch["gj"].to_pylist()
        if not feats:
            return pa.table({
                "event_id": pa.array([], pa.int64()),
                "minx": pa.array([], pa.float64()),
                "maxx": pa.array([], pa.float64()),
                "miny": pa.array([], pa.float64()),
                "maxy": pa.array([], pa.float64()),
            })
        doc = '{"type": "FeatureCollection", "features": [' \
              + ",".join(feats) + "]}"
        t = _shp.geojson_to_table(doc)
        ks = t["event_id"].to_numpy().astype(np.int64)
        # parse invariant: the text roundtrip reproduced the geometry bytes
        # (wholesale Arrow equality against the vectorized direct build)
        lon, lat = derive_lon(ks), derive_lat(ks)
        r = (((ks * 13) % 7) + 1) * 0.001
        expect = geo.wkb_quad_polygons(lon - r, lat - r, lon + r, lat + r)
        got = t["geom_wkb"].combine_chunks()
        assert got.equals(expect), "GeoJSON roundtrip drift"
        # bounds from the PARSED column's raw buffers — no per-row Python
        bounds = geo.quad_wkb_bounds(got)
        assert bounds is not None
        return pa.table({
            "event_id": pa.array(ks, pa.int64()),
            "minx": pa.array(bounds[:, 0], pa.float64()),
            "maxx": pa.array(bounds[:, 2], pa.float64()),
            "miny": pa.array(bounds[:, 1], pa.float64()),
            "maxy": pa.array(bounds[:, 3], pa.float64()),
        })

    parsed = (ds.map_batches(to_geojson, batch_format="pyarrow")
              .map_batches(parse_batch, batch_format="pyarrow"))

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame({
                "bucket": pd.Series(dtype=np.int64),
                "n_features": pd.Series(dtype=np.int64),
                "min_minx": pd.Series(dtype=np.float64),
                "max_maxx": pd.Series(dtype=np.float64),
                "min_miny": pd.Series(dtype=np.float64),
                "max_maxy": pd.Series(dtype=np.float64),
            })
        b = b.assign(bucket=b["event_id"] % 97)
        g = b.groupby("bucket").agg(
            n_features=("event_id", "size"), min_minx=("minx", "min"),
            max_maxx=("maxx", "max"), min_miny=("miny", "min"),
            max_maxy=("maxy", "max")).reset_index()
        return g

    parts = partial_combine(parsed, partial)
    cols = {"bucket": np.int64, "n_features": np.int64,
            "min_minx": np.float64, "max_maxx": np.float64,
            "min_miny": np.float64, "max_maxy": np.float64}
    if len(parts) == 0:
        return pd.DataFrame({c: pd.Series(dtype=t) for c, t in cols.items()})
    agg = parts.groupby("bucket").agg(
        n_features=("n_features", "sum"), min_minx=("min_minx", "min"),
        max_maxx=("max_maxx", "max"), min_miny=("min_miny", "min"),
        max_maxy=("max_maxy", "max")).reset_index()
    for c, t in cols.items():
        agg[c] = agg[c].astype(t)
    return agg.sort_values("bucket").reset_index(drop=True)


_VEC_SINK_SQL = f"""
WITH pts AS (
  SELECT event_id,
         {LON_EXPR.format(k='event_id')} AS lon,
         {LAT_EXPR.format(k='event_id')} AS lat,
         (((event_id * 13) % 7) + 1) * 0.001e0 AS r,
         (event_id * 11) % 1000 AS v,
         CAST(FLOOR(({LON_EXPR.format(k='event_id')} - (-102.2))
              / 0.5 * {_OD_G}.0) AS BIGINT)
         + CAST(FLOOR(({LAT_EXPR.format(k='event_id')} - 36.0)
                / 0.5 * {_OD_G}.0) AS BIGINT) * {_OD_G} AS cell
  FROM events
)
SELECT cell,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(v) AS BIGINT) AS sum_v,
       MIN(lon - r) AS min_minx,
       MAX(lat + r) AS max_maxy
FROM pts GROUP BY cell ORDER BY cell
"""


@register("vector_sink_roundtrip", _VEC_SINK_SQL)
def vector_sink_roundtrip(sf_dir: str):
    """The VECTOR boundary-file loop end-to-end under the driver's oracle:
    events become quad field polygons with attributes, the real lineage
    sink (state/lineage.write_partitioned vector_from=geojsonl — one
    atomic newline-delimited-GeoJSON sidecar per cell partition, resumable
    + byte-deterministic) writes them to scratch, and the DISTRIBUTED
    GeoJSONL source (sources.read_geojsonl over ray.data.read_text)
    re-ingests the actual files; every emitted stat comes from the
    RE-INGESTED features only (properties + WKB bounds).  SQL recomputes
    from the seeding formulas — exact because repr/json float text
    round-trips IEEE doubles and COUNT/SUM-int/MIN/MAX are
    order-independent."""
    import os as _os
    import shutil
    import tempfile

    from demeter_ray.sources.tables import read_geojsonl
    from demeter_ray.state.lineage import write_partitioned

    G = _OD_G
    cols = {"cell": np.int64, "n_rows": np.int64, "sum_v": np.int64,
            "min_minx": np.float64, "max_maxy": np.float64}
    empty = pd.DataFrame({c: pd.Series(dtype=t) for c, t in cols.items()})
    out_dir = tempfile.mkdtemp(prefix="vector_sink_")
    try:
        ds = read_table(sf_dir, "events", columns=["event_id"])

        def with_feat(batch: pa.Table) -> pa.Table:
            k = batch["event_id"].to_numpy(
                zero_copy_only=False).astype(np.int64)
            lon, lat = derive_lon(k), derive_lat(k)
            r = (((k * 13) % 7) + 1) * 0.001
            cell = (np.floor((lon - (-102.2)) / 0.5 * float(G))
                    .astype(np.int64)
                    + np.floor((lat - 36.0) / 0.5 * float(G))
                    .astype(np.int64) * G)
            return pa.table({
                "event_id": pa.array(k, pa.int64()),
                "cell": pa.array(cell, pa.int64()),
                "v": pa.array((k * 11) % 1000, pa.int64()),
                # vectorized footprint build: one buffer, no per-row Python
                "geom_wkb": geo.wkb_quad_polygons(
                    lon - r, lat - r, lon + r, lat + r),
            })

        write_partitioned(
            ds.map_batches(with_feat, batch_format="pyarrow"),
            out_dir, "cell", sort_cols=["event_id"],
            vector_from=("geom_wkb", "geojsonl"))
        files = sorted(_os.path.join(out_dir, f)
                       for f in _os.listdir(out_dir)
                       if f.endswith(".geojsonl"))
        if not files:
            return empty
        parsed = read_geojsonl(files)

        def bounds_partial(t: pa.Table) -> pd.DataFrame:
            if t.num_rows == 0:
                return empty
            b = t.to_pandas()
            # fast path: uniform quad records -> bounds off the raw Arrow
            # buffers; general WKB falls back to the per-row parser
            bb = geo.quad_wkb_bounds(t["geom_wkb"])
            if bb is None:
                wkbs = b["geom_wkb"].tolist()
                bb = np.empty((len(wkbs), 4), np.float64)
                for i, w in enumerate(wkbs):
                    bb[i] = geo.polygon_bounds(geo.parse_wkb(w))
            g = pd.DataFrame({
                "cell": b["cell"].astype(np.int64),
                "v": b["v"].astype(np.int64),
                "minx": bb[:, 0], "maxy": bb[:, 3],
            }).groupby("cell").agg(
                n_rows=("v", "size"), sum_v=("v", "sum"),
                min_minx=("minx", "min"), max_maxy=("maxy", "max"),
            ).reset_index()
            return g

        parts = partial_combine(parsed, bounds_partial,
                                batch_format="pyarrow")
        if len(parts) == 0:
            return empty
        agg = parts.groupby("cell").agg(
            n_rows=("n_rows", "sum"), sum_v=("sum_v", "sum"),
            min_minx=("min_minx", "min"), max_maxy=("max_maxy", "max"),
        ).reset_index()
        for c, t in cols.items():
            agg[c] = agg[c].astype(t)
        return agg.sort_values("cell").reset_index(drop=True)
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


def _polyline_sql() -> str:
    # segment deltas written EXACTLY as the stage computes them from the
    # decoded vertices ((lon + k*r) - lon etc.), so every IEEE op matches
    lon = LON_EXPR.format(k="event_id")
    lat = LAT_EXPR.format(k="event_id")
    segs = []
    # vertex offsets (in units of r): (0,0) -> (1,2) -> (3,1) -> (2,-1)
    offs = [(0.0, 0.0), (1.0, 2.0), (3.0, 1.0), (2.0, -1.0)]
    for (ax, ay), (bx, by) in zip(offs[:-1], offs[1:]):
        dx = f"((lon + {bx!r}e0 * r) - (lon + {ax!r}e0 * r))"
        dy = f"((lat + {by!r}e0 * r) - (lat + {ay!r}e0 * r))"
        segs.append(f"SQRT({dx} * {dx} + {dy} * {dy})")
    length = " + ".join(segs)
    return f"""
WITH pts AS (
  SELECT event_id,
         {lon} AS lon,
         {lat} AS lat,
         (((event_id * 13) % 7) + 1) * 0.001e0 AS r
  FROM events
), lines AS (
  SELECT event_id % 89 AS bucket, {length} AS len
  FROM pts
)
SELECT bucket,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       MIN(len) AS min_len,
       MAX(len) AS max_len
FROM lines GROUP BY bucket ORDER BY bucket
"""


@register("shapefile_polyline_lengths", _polyline_sql())
def shapefile_polyline_lengths(sf_dir: str):
    """Flowline-style POLYLINES through real shapefile bytes: every event
    becomes a 4-vertex polyline (formula-seeded, r-scaled offsets), each
    BATCH encodes its lines into one actual .shp PolyLine file
    (functions/shp.py record type 3 — the NHD flowline distribution form
    the reference touches via read_file, raster/usgs/hydrography.py:170)
    and decodes it back; the batch asserts WKB bit-equality through the
    file and computes line lengths from the DECODED vertices only.
    Per-bucket COUNT/MIN/MAX aggregate (order-independent).  SQL
    recomputes each segment delta with the identical IEEE expression
    order, so lengths are bit-exact (SQRT is correctly rounded)."""
    from demeter_ray.functions import shp as _shp

    _OFFS = [(0.0, 0.0), (1.0, 2.0), (3.0, 1.0), (2.0, -1.0)]

    ds = read_table(sf_dir, "events", columns=["event_id"])

    def lines_through_shp(batch: pa.Table) -> pa.Table:
        k = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(k)
        if n == 0:
            return pa.table({"bucket": pa.array([], pa.int64()),
                             "length": pa.array([], pa.float64())})
        lon, lat = derive_lon(k), derive_lat(k)
        r = (((k * 13) % 7) + 1) * 0.001
        # vertex coords exactly as the SQL writes them: lon + c*r
        xs = np.stack([lon + cx * r for cx, _ in _OFFS], axis=1)
        ys = np.stack([lat + cy * r for _, cy in _OFFS], axis=1)
        wkbs = [_shp.wkb_linestring(np.stack([xs[i], ys[i]], axis=1))
                for i in range(n)]
        shp_bytes, _shx = _shp.encode_shp(wkbs)   # real PolyLine records
        back = _shp.decode_shp(shp_bytes)
        assert back == wkbs, "PolyLine shapefile roundtrip drift"
        # lengths from the DECODED vertices (vectorized over the batch)
        pts = np.frombuffer(
            b"".join(back), np.uint8).reshape(n, 9 + 4 * 16)[:, 9:]
        cc = np.ascontiguousarray(pts).view("<f8").reshape(n, 4, 2)
        dx = cc[:, 1:, 0] - cc[:, :-1, 0]
        dy = cc[:, 1:, 1] - cc[:, :-1, 1]
        seg = np.sqrt(dx * dx + dy * dy)
        length = (seg[:, 0] + seg[:, 1]) + seg[:, 2]  # SQL's + order
        return pa.table({
            "bucket": pa.array(k % 89, pa.int64()),
            "length": pa.array(length, pa.float64()),
        })

    lines = ds.map_batches(lines_through_shp, batch_format="pyarrow")

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame({"bucket": pd.Series(dtype=np.int64),
                                 "n_lines": pd.Series(dtype=np.int64),
                                 "min_len": pd.Series(dtype=np.float64),
                                 "max_len": pd.Series(dtype=np.float64)})
        return b.groupby("bucket").agg(
            n_lines=("length", "size"), min_len=("length", "min"),
            max_len=("length", "max")).reset_index()

    parts = partial_combine(lines, partial)
    cols = {"bucket": np.int64, "n_lines": np.int64,
            "min_len": np.float64, "max_len": np.float64}
    if len(parts) == 0:
        return pd.DataFrame({c: pd.Series(dtype=t) for c, t in cols.items()})
    agg = parts.groupby("bucket").agg(
        n_lines=("n_lines", "sum"), min_len=("min_len", "min"),
        max_len=("max_len", "max")).reset_index()
    for c, t in cols.items():
        agg[c] = agg[c].astype(t)
    return agg.sort_values("bucket").reset_index(drop=True)
