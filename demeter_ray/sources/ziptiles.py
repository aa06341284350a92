"""Zip-container raster source (S12): the reference downloads hydrography
rasters as zip archives holding the grid file plus a VAT sidecar
(/root/reference/demeter/raster/usgs/hydrography.py — zip extract, raster
read, .vat.dbf parse).  The analog here: one archive containing

- ``tiles/{tile_id}.json``  — header (dtype, h, w, transform, crs, nodata)
- ``tiles/{tile_id}.bin``   — raw pixel payload (np.tobytes)
- ``vat.json``              — the VAT sidecar records

``read_zip_tiles`` parses the archive into the engine's standard tile-table
schema + VAT table.  The parse is pure stdlib zipfile + numpy; at scale one
archive is one read task (map_batches over a list of archive paths), so
archives parallelize like any other source shard.
"""

from __future__ import annotations

import io
import json
import zipfile

import numpy as np
import pyarrow as pa

from demeter_ray.functions import tiff


def write_zip_tiles(path: str, tile_rows: list[dict], vat_records: list[dict],
                    fmt: str = "json") -> None:
    """Write the archive: tile_rows need (tile_id, dtype, h, w, transform,
    crs, nodata, pixels-bytes); vat_records are plain dicts.  ``fmt="tif"``
    stores each tile as an actual GeoTIFF member (functions/tiff.py) instead
    of the json+bin pair — the reference's zip payload IS a grid file
    (hydrography.py), so this is the format-faithful mode."""
    with zipfile.ZipFile(path, "w", compression=zipfile.ZIP_DEFLATED) as z:
        for r in tile_rows:
            if fmt == "tif":
                z.writestr(f"tiles/{r['tile_id']}.tif", tiff.tile_row_to_geotiff(r))
                continue
            header = {k: r[k] for k in ("tile_id", "dtype", "h", "w", "transform",
                                        "crs", "nodata")}
            z.writestr(f"tiles/{r['tile_id']}.json", json.dumps(header, sort_keys=True))
            z.writestr(f"tiles/{r['tile_id']}.bin", r["pixels"])
        z.writestr("vat.json", json.dumps(vat_records, sort_keys=True))


def read_zip_tiles(path: str, dataset: str = "cat") -> tuple[pa.Table, pa.Table]:
    """Archive -> (tile table in the raster_tiles schema, VAT table)."""
    from demeter_ray.functions import geo

    rows = []
    vat = []
    with zipfile.ZipFile(path) as z:
        names = set(z.namelist())
        tifs = sorted(n for n in names if n.startswith("tiles/") and n.endswith(".tif"))
        if tifs:
            for tname in tifs:
                tile_id = tname[len("tiles/") : -len(".tif")]
                rows.append(tiff.geotiff_to_tile_row(z.read(tname), tile_id, dataset))
        headers = sorted(n for n in names if n.startswith("tiles/") and n.endswith(".json"))
        for hname in headers:
            header = json.loads(z.read(hname))
            payload = z.read(hname[: -len(".json")] + ".bin")
            px = np.frombuffer(payload, dtype=header["dtype"]).reshape(
                header["h"], header["w"]
            )
            t = tuple(header["transform"])
            b = geo.raster_bounds(t, header["h"], header["w"])
            rows.append(
                dict(
                    dataset=dataset, statistic=None, depth_top_cm=None,
                    depth_bottom_cm=None, tile_id=header["tile_id"], band=1,
                    h=header["h"], w=header["w"], dtype=header["dtype"],
                    nodata=header["nodata"], transform=list(t),
                    crs=header["crs"], minx=b[0], miny=b[1], maxx=b[2], maxy=b[3],
                    pixels=px.tobytes(),
                )
            )
        vat = json.loads(z.read("vat.json"))
    cols = {k: [r[k] for r in rows] for k in rows[0]} if rows else {}
    tiles_tbl = pa.table(
        {
            "dataset": pa.array(cols.get("dataset", []), pa.string()),
            "statistic": pa.array(cols.get("statistic", []), pa.string()),
            "depth_top_cm": pa.array(cols.get("depth_top_cm", []), pa.int32()),
            "depth_bottom_cm": pa.array(cols.get("depth_bottom_cm", []), pa.int32()),
            "tile_id": pa.array(cols.get("tile_id", []), pa.string()),
            "band": pa.array(cols.get("band", []), pa.int8()),
            "h": pa.array(cols.get("h", []), pa.int32()),
            "w": pa.array(cols.get("w", []), pa.int32()),
            "dtype": pa.array(cols.get("dtype", []), pa.string()),
            "nodata": pa.array(cols.get("nodata", []), pa.float64()),
            "transform": pa.array(cols.get("transform", []), pa.list_(pa.float64(), 6)),
            "crs": pa.array(cols.get("crs", []), pa.string()),
            "minx": pa.array(cols.get("minx", []), pa.float64()),
            "miny": pa.array(cols.get("miny", []), pa.float64()),
            "maxx": pa.array(cols.get("maxx", []), pa.float64()),
            "maxy": pa.array(cols.get("maxy", []), pa.float64()),
            "pixels": pa.array(cols.get("pixels", []), pa.binary()),
        }
    )
    vat_tbl = pa.table(
        {
            "tile_id": pa.array([v["tile_id"] for v in vat], pa.string()),
            "value": pa.array([v["value"] for v in vat], pa.int32()),
            "catchment_id": pa.array([v["catchment_id"] for v in vat], pa.int64()),
            "count": pa.array([v["count"] for v in vat], pa.int32()),
        }
    )
    return tiles_tbl, vat_tbl
