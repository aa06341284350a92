"""fetch_point_data — the reference's flagship multi-source point enrichment
(/root/reference/demeter/api.py:13-102) rebuilt Ray-first.

For each probe point, append columns from every requested source:

- carbon_stock: POLARIS-style depth-weighted carbon stock mean/stddev
  sampled at the point (api.py:105-126);
- elevation: topo raster sample (api.py:209-219);
- catchment: hydrography cat raster remapped to global ids, sampled,
  nullable Int64 (api.py:183-206 — Int64 cast semantics);
- ssurgo: PIP against field polygons -> primary-component soil attributes
  prefixed ``ssurgo_`` (api.py:222-236) — column-append join on point_id,
  NOT the reference's positional concat (SURVEY.md §3.1).

Each source is a vectorized sample/lookup over broadcast state; points
stream through one actor when used at scale (stages/spatial.py pattern);
at probe-table scale this materializes a pandas frame like the reference.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from demeter_ray.stages.depthagg import estimate_carbon_stock
from demeter_ray.stages.hydro import build_vat_lookup, remap_tile
from demeter_ray.stages.sample import load_tiles, sample_tiles_at, sample_tiles_at_crs
from demeter_ray.functions import geo
from demeter_ray.functions.scenes import decode_flow_direction

ALL_SOURCES = ("carbon_stock", "elevation", "catchment", "ndvi", "ssurgo")


def _sample_masked(raster, transform, lons, lats) -> np.ndarray:
    h, w = raster.shape
    bounds = geo.raster_bounds(transform, h, w)
    tile = [("t", raster.filled(np.nan), transform, float("nan"), bounds)]
    return sample_tiles_at(tile, lons, lats)


def fetch_point_data(
    fixture_dir: str,
    sources=ALL_SOURCES,
    top_depth_cm: int = 0,
    bottom_depth_cm: int = 100,
    elevation_dataset: str = "elevation",
    catchment_dataset: str = "cat",
) -> pd.DataFrame:
    points = pq.read_table(f"{fixture_dir}/points.parquet").to_pandas()
    lons = points["lon"].to_numpy()
    lats = points["lat"].to_numpy()
    out = points.copy()

    tiles_tbl = None
    if {"carbon_stock", "elevation", "catchment"} & set(sources):
        tiles_tbl = pq.read_table(f"{fixture_dir}/raster_tiles.parquet")

    if "carbon_stock" in sources:
        mean, std, transform = estimate_carbon_stock(tiles_tbl, top_depth_cm, bottom_depth_cm)
        out["carbon_stock_mean"] = _sample_masked(mean, transform, lons, lats)
        out["carbon_stock_stddev"] = _sample_masked(std, transform, lons, lats)

    if "elevation" in sources:
        # topo samples through the tile's own CRS (EPSG:4269 for the
        # reference's USGS topo path, api.py:210)
        tiles = load_tiles(tiles_tbl, elevation_dataset, with_crs=True)
        out["elevation"] = sample_tiles_at_crs(tiles, lons, lats)

    if "catchment" in sources:
        # hydrography samples through EPSG:5070 when the tiles carry it
        # (api.py:184); every tile — including the Albers mosaic — has its
        # own VAT rows keyed by tile_id
        vat = build_vat_lookup(pq.read_table(f"{fixture_dir}/catchment_vat.parquet"))
        cat_tiles = load_tiles(tiles_tbl, catchment_dataset, with_crs=True)
        remapped = []
        for tid, px, transform, nodata, bounds, crs in cat_tiles:
            codes, ids = vat[tid]
            remapped.append((tid, remap_tile(px, codes, ids, nodata), transform,
                             float("nan"), bounds, crs))
        vals = sample_tiles_at_crs(remapped, lons, lats)
        # Int64 nullable cast (api.py:200)
        out["catchment_id"] = pd.array(
            [None if np.isnan(v) else int(v) for v in vals], dtype="Int64"
        )
        # fac/fdr companions: the reference's hydro source samples all three
        # of cat/fac/fdr, decoding fdr to the FlowDirection categorical
        # (api.py:183-206, usgs/constants.py:14-24)
        fac_tiles = load_tiles(tiles_tbl, "fac", with_crs=True)
        out["flow_accumulation"] = sample_tiles_at_crs(fac_tiles, lons, lats)
        fdr_tiles = load_tiles(tiles_tbl, "fdr", with_crs=True)
        fdr_vals = sample_tiles_at_crs(fdr_tiles, lons, lats)
        out["flow_direction"] = decode_flow_direction(
            [None if np.isnan(v) else int(v) for v in fdr_vals]
        )

    if "ndvi" in sources:
        # per-zone NDVI statistic rasters sampled at each point's own zone
        # (api.py:128-178): zone assignment by the floor(lon/6) rule (J9),
        # four sentinel2-style statistic columns appended
        import ray.data

        from demeter_ray.stages.ndvi import ndvi_statistics

        nd = ndvi_statistics(
            ray.data.read_parquet(f"{fixture_dir}/scene_tiles.parquet")
        )
        zone_nums = geo.utm_zone_for(lons)
        for stat in ("mean", "min", "max", "stddev"):
            vals = np.full(len(lons), np.nan)
            for zone_label in nd["utm_zone"].unique():
                zn = int(zone_label[:-1])
                m = zone_nums == zn
                if not m.any():
                    continue
                row = nd[(nd["utm_zone"] == zone_label)
                         & (nd["statistic"] == stat)].iloc[0]
                px = (
                    np.frombuffer(row["pixels"], np.float32)
                    .reshape(row["h"], row["w"])
                    .astype(np.float64)
                )
                transform = tuple(float(v) for v in row["transform"].split(","))
                bounds = geo.raster_bounds(transform, row["h"], row["w"])
                tile = [(zone_label, px, transform, float("nan"), bounds, row["crs"])]
                vals[m] = sample_tiles_at_crs(tile, lons[m], lats[m])
            out[f"ndvi_{stat}"] = vals

    if "ssurgo" in sources:
        from demeter_ray.pipelines.soiljoin import primary_soil_components

        fields = pq.read_table(f"{fixture_dir}/fields.parquet")
        index = geo.PolygonIndex(
            fields["map_unit_key"].to_pylist(), fields["geom_wkb"].to_pylist()
        )
        assigned = index.query_min_id(lons, lats)
        soil = primary_soil_components(fixture_dir, top_depth_cm, bottom_depth_cm)
        # one row per map unit for the point join: the first ROW by
        # component_key (whole-row semantics — groupby().first() would mix
        # per-column first-non-null values across tied primary components)
        soil_first = soil.sort_values(["map_unit_key", "component_key"]).drop_duplicates(
            "map_unit_key", keep="first"
        )
        soil_first = soil_first.drop(columns=["map_unit_symbol", "map_unit_name"])
        soil_first = soil_first.add_prefix("ssurgo_").rename(
            columns={"ssurgo_map_unit_key": "map_unit_key"}
        )
        out["map_unit_key"] = pd.array(
            [None if a < 0 else int(a) for a in assigned], dtype="Int64"
        )
        out = out.merge(soil_first, how="left", on="map_unit_key")

    return out
