"""Table readers.

``read_table`` loads one of the driver's TPC-H-ish parquet tables as a
``ray.data.Dataset`` with column pruning pushed to the read (SURVEY.md §2.1
S11: prune at the read — a read that loads all columns for a 2-column
transform is wrong).

``read_images`` reads the image+caption table per BASELINE.json input_hint:
Lance if the format/reader is available, parquet fallback otherwise (the
sandbox ships no lance wheel, so parquet is the tested path; the Lance branch
is the documented production path).
"""

from __future__ import annotations

import os

import ray.data


def _stripped_schema(path: str, columns=None):
    """Projected schema with file-level metadata removed: pandas-written
    parquet carries a schema-metadata dict that makes the Arrow schema
    unhashable, so every Ray schema-dedup pass logs a 'Failed to hash the
    schemas' warning — strip it at the read boundary."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    sch = pq.read_schema(path)
    if columns:
        sch = pa.schema([sch.field(c) for c in columns])
    return sch.remove_metadata()


def read_table(sf_dir: str, name: str, columns=None, blocks: int | None = None,
               filter=None) -> ray.data.Dataset:
    """Read one driver table.  Ray auto-splits even single-row-group files
    into parallel blocks (ReadParquet->SplitBlocks), so no repartition is
    needed — an explicit Repartition operator is an all-to-all barrier that
    measured ~17s of stall on this Ray build.  ``blocks`` remains available
    for callers that genuinely need a specific block count.

    ``filter`` is an optional ``pyarrow.dataset`` expression pushed into the
    parquet scan (row-group / page pruning at the read — at 100 TB a
    selective predicate evaluated post-read still pays the full scan; pushed
    down it prunes whole row groups by statistics).  Callers keep their
    vectorized residual mask — the pushdown is a bandwidth optimization,
    never the correctness boundary."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    ds = ray.data.read_parquet(
        path, columns=columns, schema=_stripped_schema(path, columns),
        filter=filter,
    )
    if blocks:
        ds = ds.repartition(blocks)
    return ds


def read_images(path: str, columns=None) -> ray.data.Dataset:
    """Image+caption table: (image_id, bytes, w, h, fmt, caption, phash[, lon, lat]).

    Prefers Lance (``ray.data.read_lance``) when the dataset dir and reader
    exist; falls back to parquet. Binary payload rows are wide — callers
    should keep ``batch_size`` small on decode stages (SURVEY.md §7.5).
    """
    if path.endswith(".lance") and hasattr(ray.data, "read_lance"):
        try:
            return ray.data.read_lance(path, columns=columns)
        except Exception:
            pass
    return ray.data.read_parquet(path, columns=columns)


def read_tiles_window(path: str, bounds, dataset: str | None = None,
                      columns=None) -> ray.data.Dataset:
    """Windowed tile read (the reference's windowed COG read, S5): only
    tile rows whose envelope intersects ``bounds`` leave storage — the bbox
    predicate and the dataset filter push into the parquet scan as an Arrow
    dataset expression (row-group pruning), mirroring the byte-range
    windowed read of a COG.  ``bounds`` = (minx, miny, maxx, maxy) in the
    tile table's envelope CRS (EPSG:4326 columns)."""
    import pyarrow.dataset as pads

    minx, miny, maxx, maxy = bounds
    f = pads.field
    expr = (
        (f("minx") < maxx) & (f("maxx") > minx)
        & (f("miny") < maxy) & (f("maxy") > miny)
    )
    if dataset is not None:
        expr = expr & (f("dataset") == dataset)
    return ray.data.read_parquet(path, columns=columns, filter=expr)


def read_geojsonl(path: str, geom_col: str = "geom_wkb") -> ray.data.Dataset:
    """Newline-delimited GeoJSON (one Feature per line — the streamable
    layout GDAL calls GeoJSONSeq) -> Dataset of properties + WKB geometry.
    The text read parallelizes per file/block and each batch parses as ONE
    FeatureCollection through functions/shp.py, so ingest is distributed
    and the per-batch parse is one json.loads, not one per row.  This is
    the cluster-shaped version of the reference's geopandas.read_file
    boundary ingest (/root/reference/demeter/api.py:41-50)."""
    import pyarrow as pa

    from demeter_ray.functions import shp

    def parse(batch: pa.Table) -> pa.Table:
        lines = [t for t in batch["text"].to_pylist() if t.strip()]
        if not lines:
            return pa.table({geom_col: pa.array([], pa.binary())})
        doc = ('{"type": "FeatureCollection", "features": ['
               + ",".join(lines) + "]}")
        return shp.geojson_to_table(doc, geom_col=geom_col)

    return ray.data.read_text(path).map_batches(
        parse, batch_format="pyarrow")
