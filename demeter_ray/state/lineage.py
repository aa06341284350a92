"""Per-partition lineage records + resumable idempotent partitioned sink.

The north rule requires "resume-from-checkpoint with idempotent tile writes
and per-partition lineage".  Design (SURVEY.md §4 'Checkpoint/resume'):

- output layout: one parquet file per partition key with a DETERMINISTIC name
  (``part-{key}.parquet``) — the Ray-native version of the reference's
  file-granular download caches (polaris.py:382-431, usgs/utils.py:18-30);
- atomic writes: tmp file + os.replace, so a crash never leaves a torn
  partition;
- lineage sidecar ``_lineage/part-{key}.json`` records {key, rows, checksum,
  schema}; a partition counts as done only when its lineage record exists
  and matches the data file;
- resume = anti-join: completed keys (valid lineage) are skipped; only the
  remaining partitions recompute.  Reruns are idempotent — rewriting a
  finished partition produces byte-identical output.

The write itself runs inside ``groupby(key).map_groups`` so each partition
is one task; FileLock is unnecessary because names are deterministic and
writes atomic (two writers of the same partition write identical bytes).
"""

from __future__ import annotations

import json
import os
from hashlib import blake2b

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from demeter_ray.functions import shp as _shp
from demeter_ray.functions import tiff


def _lineage_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "_lineage")


def _part_path(out_dir: str, key) -> str:
    return os.path.join(out_dir, f"part-{key}.parquet")


def _lineage_path(out_dir: str, key) -> str:
    return os.path.join(_lineage_dir(out_dir), f"part-{key}.json")


def _checksum(table: pa.Table) -> str:
    """Value-based checksum, stable across a parquet round-trip (raw Arrow
    buffer layouts are not: offsets/validity re-chunk on read)."""
    df = table.select(sorted(table.column_names)).to_pandas()
    row_hashes = pd.util.hash_pandas_object(df, index=False).to_numpy()
    h = blake2b(digest_size=16)
    h.update(row_hashes.tobytes())
    return h.hexdigest()


def completed_keys(out_dir: str, verify_checksum: bool = False) -> set:
    """Keys whose lineage record matches the data file: the file must exist
    AND its parquet row count must equal the recorded rows (so a corrupted
    or stale part-{key}.parquet is recomputed, not skipped).  The row-count
    check reads only parquet footer metadata; pass ``verify_checksum=True``
    to additionally re-hash the data (full read — use for audits)."""
    done = set()
    ldir = _lineage_dir(out_dir)
    if not os.path.isdir(ldir):
        return done
    for fn in os.listdir(ldir):
        if not fn.endswith(".json"):
            continue
        try:
            with open(os.path.join(ldir, fn)) as f:
                rec = json.load(f)
            part = _part_path(out_dir, rec["key"])
            if pq.read_metadata(part).num_rows != rec["rows"]:
                continue  # stale/corrupt partition -> recompute
            if "tif_bytes" in rec:
                tpath = os.path.join(out_dir, f"part-{rec['key']}.tif")
                if not os.path.isfile(tpath) or os.path.getsize(tpath) != rec["tif_bytes"]:
                    continue  # raster sidecar torn/missing -> recompute
            if verify_checksum and _checksum(pq.read_table(part)) != rec["checksum"]:
                continue
            done.add(rec["key"])
        except (json.JSONDecodeError, KeyError, OSError, pa.ArrowInvalid):
            continue  # torn record / unreadable file -> recompute
    return done


def write_partition(out_dir: str, key, df: pd.DataFrame, sort_cols=None,
                    profile: dict | None = None, tif_from=None,
                    vector_from=None) -> dict:
    """Atomically write one partition + its lineage record; returns the
    record.  Deterministic: rows sorted by ``sort_cols`` (or all columns).

    ``profile`` carries the raster sink metadata the reference's
    ``Raster.save`` writes into the GeoTIFF header (crs / transform /
    nodata / dtype — raster/__init__.py:110-153): it round-trips through
    BOTH the lineage record and the parquet schema metadata, so a reader
    can reconstruct the grid without the writer.

    ``tif_from=(row_col, col_col, value_col)`` additionally rasterizes the
    partition onto the profile's (h, w) grid and writes an ACTUAL GeoTIFF
    sidecar ``part-{key}.tif`` (functions/tiff.py — uncompressed strips,
    scale+tiepoint georeferencing, GDAL_NODATA), atomically, tracked by
    the lineage record: the reference's Raster.save made real, per
    partition.  Requires ``profile`` with h/w/dtype/transform.

    ``vector_from=(geom_col, fmt)`` writes a VECTOR sidecar from the
    partition's WKB geometry column: ``fmt="geojsonl"`` emits
    ``part-{key}.geojsonl`` (newline-delimited Features, re-ingestable by
    sources.read_geojsonl bit-exact), ``fmt="shpz"`` emits
    ``part-{key}.zip`` (a zipped shapefile, fixed timestamps).  Both are
    byte-deterministic for the sorted partition, written atomically and
    tracked in the lineage record — the boundary-file counterpart of the
    GeoTIFF sidecar."""
    os.makedirs(out_dir, exist_ok=True)
    os.makedirs(_lineage_dir(out_dir), exist_ok=True)
    cols = sort_cols or sorted(df.columns)
    df = df.sort_values(cols, kind="mergesort").reset_index(drop=True)
    table = pa.Table.from_pandas(df, preserve_index=False)
    if profile is not None:
        meta = dict(table.schema.metadata or {})
        meta[b"demeter_profile"] = json.dumps(profile, sort_keys=True).encode()
        table = table.replace_schema_metadata(meta)
    rec = {
        "key": key if not hasattr(key, "item") else key.item(),
        "rows": len(df),
        "checksum": _checksum(table),
        "columns": sorted(df.columns.tolist()),
    }
    if profile is not None:
        rec["profile"] = profile
    part = _part_path(out_dir, rec["key"])
    tmp = part + ".tmp"
    pq.write_table(table, tmp)
    # bytes is deterministic for a deterministic table (same sorted rows ->
    # same parquet), so the record stays byte-identical across re-writers
    rec["bytes"] = os.path.getsize(tmp)
    os.replace(tmp, part)
    if profile is not None and tif_from is not None:
        import numpy as np

        rcol, ccol, vcol = tif_from
        h, w = int(profile["h"]), int(profile["w"])
        nodata = profile.get("nodata")
        px = np.full((h, w), 0 if nodata is None else nodata,
                     dtype=profile["dtype"])
        px[df[rcol].to_numpy(np.int64), df[ccol].to_numpy(np.int64)] = (
            df[vcol].to_numpy().astype(profile["dtype"])
        )
        tif = tiff.encode_geotiff(
            px, profile["transform"], profile.get("crs") or "EPSG:4326", nodata
        )
        tpath = os.path.join(out_dir, f"part-{rec['key']}.tif")
        with open(tpath + ".tmp", "wb") as f:
            f.write(tif)
        os.replace(tpath + ".tmp", tpath)
        rec["tif_bytes"] = len(tif)
    if vector_from is not None:
        # _shp is a module-level import: this body runs in WORKERS, where a
        # call-time demeter_ray import would miss pickle-by-value shipping
        geom_col, fmt = vector_from
        vt = pa.Table.from_pandas(df, preserve_index=False)
        if fmt == "geojsonl":
            payload = _shp.table_to_geojsonl(vt, geom_col).encode()
            ext = "geojsonl"
        elif fmt == "shpz":
            payload = _shp.encode_shapefile_zip(
                vt, name=f"part-{rec['key']}", geom_col=geom_col)
            ext = "zip"
        else:
            raise ValueError(
                f"vector_from fmt must be 'geojsonl' or 'shpz', got {fmt!r}")
        vpath = os.path.join(out_dir, f"part-{rec['key']}.{ext}")
        with open(vpath + ".tmp", "wb") as f:
            f.write(payload)
        os.replace(vpath + ".tmp", vpath)
        rec["vector_bytes"] = len(payload)
    lpath = _lineage_path(out_dir, rec["key"])
    ltmp = lpath + ".tmp"
    with open(ltmp, "w") as f:
        json.dump(rec, f)
    os.replace(ltmp, lpath)
    return rec


def read_partition_profile(out_dir: str, key) -> dict | None:
    """Recover a partition's raster profile (crs/transform/nodata/dtype)
    from the parquet schema metadata — the sink-side half of the reference's
    Raster.from_file profile round-trip."""
    meta = pq.read_schema(_part_path(out_dir, key)).metadata or {}
    raw = meta.get(b"demeter_profile")
    return json.loads(raw) if raw is not None else None


def write_partitioned(
    ds: ray.data.Dataset,
    out_dir: str,
    key_col: str,
    sort_cols=None,
    fail_on_keys: frozenset = frozenset(),
    profile_for=None,
    tif_from=None,
    vector_from=None,
) -> pd.DataFrame:
    """Partitioned resumable sink: groupby(key) -> one atomic file+lineage
    per key; keys already completed are skipped (their groups filter out
    before the shuffle).  ``fail_on_keys`` injects failures for tests.

    Returns the manifest (key, rows, bytes, checksum, skipped)."""
    done = completed_keys(out_dir)

    if done:
        import pyarrow.compute as pc

        done_list = list(done)
        ds = ds.map_batches(
            lambda t: t.filter(
                pc.invert(pc.is_in(t[key_col], value_set=pa.array(done_list)))
            ),
            batch_format="pyarrow",
        )

    def write_group(g: pd.DataFrame) -> pd.DataFrame:
        key = g[key_col].iloc[0]
        k = key.item() if hasattr(key, "item") else key
        if k in fail_on_keys:
            raise RuntimeError(f"injected failure for partition {k}")
        prof = profile_for(k) if profile_for is not None else None
        rec = write_partition(out_dir, k, g, sort_cols, profile=prof,
                              tif_from=tif_from, vector_from=vector_from)
        return pd.DataFrame(
            {"key": [rec["key"]], "rows": [rec["rows"]],
             "bytes": [rec["bytes"]], "checksum": [rec["checksum"]],
             "skipped": [False]}
        )

    written = (
        ds.groupby(key_col).map_groups(write_group, batch_format="pandas").to_pandas()
    )
    if written.shape[1] == 0:
        # Ray drops the schema when every block is empty — an empty input
        # must still yield a TYPED manifest (edge-sweep rule)
        written = pd.DataFrame(
            {"key": pd.Series(dtype="int64"), "rows": pd.Series(dtype="int64"),
             "bytes": pd.Series(dtype="int64"),
             "checksum": pd.Series(dtype="object"),
             "skipped": pd.Series(dtype="bool")}
        )
    skipped = pd.DataFrame(
        {"key": sorted(done), "rows": -1, "bytes": -1, "checksum": "",
         "skipped": True}
    )
    manifest = pd.concat([written, skipped], ignore_index=True) if len(skipped) else written
    return manifest.sort_values("key").reset_index(drop=True)


def read_partitioned(out_dir: str) -> pa.Table:
    parts = sorted(
        os.path.join(out_dir, f)
        for f in os.listdir(out_dir)
        if f.startswith("part-") and f.endswith(".parquet")
    )
    return pa.concat_tables([pq.read_table(p) for p in parts])
