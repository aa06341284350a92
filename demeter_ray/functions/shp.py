"""Pure-stdlib ESRI Shapefile (.shp/.shx/.dbf) + GeoJSON vector codecs.

The reference ingests field-boundary vectors through
``geopandas.read_file`` — its documented inputs are GeoJSON boundary
files and anything fiona can open, shapefiles included
(/root/reference/demeter/api.py:41-50,
/root/reference/demeter/raster/usgs/topography.py:65,
/root/reference/demeter/raster/polaris.py:180).  This container has no
geopandas/fiona, so this module closes the VECTOR format gap the way
functions/tiff.py closed the raster one: from-scratch codecs for the two
formats the reference's users actually hand it, emitting the engine's
native geometry currency (WKB polygons, functions/geo.py) so everything
downstream — PIP actor pools, kNN, rasterize, zonal stats — is unchanged.

Shapefile (ESRI white paper, July 1998):
- main file (.shp): 100-byte header (big-endian file code 9994 + length
  in 16-bit words, little-endian version 1000 + shape type + bbox), then
  records of (big-endian record number / content length, little-endian
  shape payload);
- shape types: Null (0), Point (1), PolyLine (3), Polygon (5).  Polygon
  ring convention is vertex order: OUTER rings clockwise, holes
  counter-clockwise (the spec's "inside on the right" rule), rings
  explicitly closed;
- index file (.shx): same header, one (offset, length) word-pair per
  record — written so foreign readers can seek, not needed to decode;
- attribute file (.dbf): dBase III — 32-byte header + 32-byte field
  descriptors (C character / N numeric / F float / L logical), 0x0D
  terminator, space-padded fixed-width records behind a deletion flag,
  0x1A EOF.  Floats ride %.17g so values round-trip bit-exact.

Geometry mapping is orientation-normalizing and lossless both ways: the
engine's canonical WKB keeps outer rings counter-clockwise and holes
clockwise (the GeoJSON RFC 7946 winding, orientation-insensitive for the
even-odd PIP kernels); encode flips rings to the shapefile convention,
decode flips them back — so decode(encode(wkb)) is BYTE-IDENTICAL for
canonical input.  Multiple outer rings in one record decode to a WKB
MultiPolygon; holes attach to the outer ring containing their first
vertex (even-odd containment, matching how fiona/shapely rebuild them).

GeoJSON (RFC 7946): FeatureCollection/Feature/bare geometry to a
pyarrow table of properties + WKB, and back.  Python ``repr`` float
serialization round-trips IEEE doubles exactly, so GeoJSON emitted here
re-ingests bit-exact.
"""

from __future__ import annotations

import json
import struct

import numpy as np
import pyarrow as pa

from demeter_ray.functions import geo

# shapefile shape-type codes
NULL, POINT, POLYLINE, POLYGON = 0, 1, 3, 5


def _signed_area(ring: np.ndarray) -> float:
    """Shoelace signed area: positive = counter-clockwise (y-up)."""
    x, y = ring[:, 0], ring[:, 1]
    return float(np.sum(x[:-1] * y[1:] - x[1:] * y[:-1]) * 0.5)


def _close(ring: np.ndarray) -> np.ndarray:
    if not np.array_equal(ring[0], ring[-1]):
        ring = np.vstack([ring, ring[:1]])
    return ring


# ------------------------------------------------------------- WKB helpers
# (points / linestrings; polygons ride functions/geo.py's codec)

def wkb_point(x: float, y: float) -> bytes:
    return struct.pack("<BIdd", 1, 1, x, y)


def wkb_linestring(pts: np.ndarray) -> bytes:
    pts = np.asarray(pts, np.float64)
    return (struct.pack("<BII", 1, 2, len(pts))
            + pts.astype("<f8").tobytes())


def _wkb_type(buf: bytes) -> int:
    bo, gt = struct.unpack_from("<BI", buf, 0)
    if bo != 1:
        raise ValueError("only little-endian WKB is supported")
    return gt


def parse_wkb_point(buf: bytes) -> tuple[float, float]:
    bo, gt, x, y = struct.unpack_from("<BIdd", buf, 0)
    if gt != 1:
        raise ValueError(f"not a WKB point (type {gt})")
    return x, y


def parse_wkb_lines(buf: bytes) -> list[np.ndarray]:
    """WKB LineString (2) / MultiLineString (5) -> list of (N,2) arrays."""
    gt = _wkb_type(buf)

    def one(pos):
        bo, g = struct.unpack_from("<BI", buf, pos)
        if g != 2:
            raise ValueError(f"not a WKB linestring (type {g})")
        (n,) = struct.unpack_from("<I", buf, pos + 5)
        pts = np.frombuffer(buf, "<f8", count=n * 2, offset=pos + 9)
        return pts.reshape(n, 2).astype(np.float64), pos + 9 + n * 16

    if gt == 2:
        return [one(0)[0]]
    if gt == 5:
        (n,) = struct.unpack_from("<I", buf, 5)
        pos, out = 9, []
        for _ in range(n):
            line, pos = one(pos)
            out.append(line)
        return out
    raise ValueError(f"unsupported WKB line type {gt}")


# ---------------------------------------------------------------- .shp codec

def _polygon_record(wkb: bytes) -> bytes:
    """WKB Polygon/MultiPolygon -> shapefile Polygon record content.
    Outer rings re-oriented clockwise, holes counter-clockwise, outer
    ring first within each polygon (file order preserves WKB order)."""
    rings_out: list[np.ndarray] = []
    for rings in geo.parse_wkb(wkb):
        for i, ring in enumerate(rings):
            ring = _close(np.asarray(ring, np.float64))
            area = _signed_area(ring)
            want_cw = i == 0          # outer ring: clockwise in the file
            if (area > 0.0) == want_cw:
                ring = ring[::-1]
            rings_out.append(ring)
    return _multipart_content(POLYGON, rings_out)


def _polyline_record(wkb: bytes) -> bytes:
    return _multipart_content(POLYLINE, parse_wkb_lines(wkb))


def _multipart_content(stype: int, parts: list[np.ndarray]) -> bytes:
    allpts = np.vstack(parts)
    n_pts = sum(len(p) for p in parts)
    starts, at = [], 0
    for p in parts:
        starts.append(at)
        at += len(p)
    return (struct.pack("<I4dII", stype,
                        float(allpts[:, 0].min()), float(allpts[:, 1].min()),
                        float(allpts[:, 0].max()), float(allpts[:, 1].max()),
                        len(parts), n_pts)
            + struct.pack(f"<{len(starts)}i", *starts)
            + np.vstack(parts).astype("<f8").tobytes())


def encode_shp(wkbs: list[bytes | None]) -> tuple[bytes, bytes]:
    """Engine WKB geometries -> (.shp bytes, .shx bytes).  Geometry type
    is inferred from the first non-null WKB; a shapefile is homogeneous,
    so mixing types raises.  None entries become Null shapes."""
    stype = NULL
    contents: list[bytes] = []
    for wkb in wkbs:
        if wkb is None:
            contents.append(struct.pack("<I", NULL))
            continue
        gt = _wkb_type(wkb)
        this = {1: POINT, 2: POLYLINE, 5: POLYLINE, 3: POLYGON,
                6: POLYGON}.get(gt)
        if this is None:
            raise ValueError(f"unsupported WKB geometry type {gt}")
        if stype == NULL:
            stype = this
        elif this != stype:
            raise ValueError(
                f"shapefile is homogeneous: {this} after {stype}")
        if this == POINT:
            x, y = parse_wkb_point(wkb)
            contents.append(struct.pack("<Idd", POINT, x, y))
        elif this == POLYLINE:
            contents.append(_polyline_record(wkb))
        else:
            contents.append(_polygon_record(wkb))

    # file bbox over non-null records
    boxes = [struct.unpack_from("<4d", c, 4) for c in contents
             if len(c) > 4 and struct.unpack_from("<I", c)[0] in
             (POLYLINE, POLYGON)]
    boxes += [(x, y, x, y) for c in contents
              if struct.unpack_from("<I", c)[0] == POINT
              for x, y in [struct.unpack_from("<dd", c, 4)]]
    if boxes:
        bb = (min(b[0] for b in boxes), min(b[1] for b in boxes),
              max(b[2] for b in boxes), max(b[3] for b in boxes))
    else:
        bb = (0.0, 0.0, 0.0, 0.0)

    recs, idx = [], []
    at = 100  # bytes; offsets in the .shx are in 16-bit words
    for i, c in enumerate(contents):
        recs.append(struct.pack(">II", i + 1, len(c) // 2) + c)
        idx.append(struct.pack(">II", at // 2, len(c) // 2))
        at += 8 + len(c)

    def header(total_bytes: int) -> bytes:
        return (struct.pack(">I20xI", 9994, total_bytes // 2)
                + struct.pack("<II4d4d", 1000, stype, *bb, 0, 0, 0, 0))

    shp = header(at) + b"".join(recs)
    shx = header(100 + 8 * len(contents)) + b"".join(idx)
    return shp, shx


def decode_shp(buf: bytes) -> list[bytes | None]:
    """.shp bytes -> list of engine WKB geometries (None for Null shapes).
    Polygon rings are re-oriented to the canonical winding (outer CCW,
    holes CW); holes attach to the outer ring containing their first
    vertex, multiple outers make a MultiPolygon."""
    if len(buf) < 100:
        raise ValueError(f"shapefile truncated at {len(buf)} bytes")
    (code,) = struct.unpack_from(">I", buf, 0)
    (flen_words,) = struct.unpack_from(">I", buf, 24)
    version, stype = struct.unpack_from("<II", buf, 28)
    if code != 9994 or version != 1000:
        raise ValueError(f"not a shapefile (code {code}, version {version})")
    if flen_words * 2 != len(buf):
        raise ValueError(
            f"shapefile length field {flen_words * 2} != {len(buf)} bytes")
    out: list[bytes | None] = []
    pos, expect = 100, 1
    while pos < len(buf):
        recno, clen_words = struct.unpack_from(">II", buf, pos)
        if recno != expect:
            raise ValueError(f"record number {recno} != expected {expect}")
        expect += 1
        pos += 8
        end = pos + clen_words * 2
        (rtype,) = struct.unpack_from("<I", buf, pos)
        if rtype == NULL:
            out.append(None)
        elif rtype == POINT:
            x, y = struct.unpack_from("<dd", buf, pos + 4)
            out.append(wkb_point(x, y))
        elif rtype in (POLYLINE, POLYGON):
            if rtype != stype:
                raise ValueError(
                    f"record type {rtype} != file type {stype}")
            n_parts, n_pts = struct.unpack_from("<II", buf, pos + 36)
            starts = list(struct.unpack_from(f"<{n_parts}i", buf, pos + 44))
            pts = np.frombuffer(buf, "<f8", count=n_pts * 2,
                                offset=pos + 44 + 4 * n_parts)
            pts = pts.reshape(n_pts, 2).astype(np.float64)
            bounds = starts + [n_pts]
            parts = [pts[bounds[i]:bounds[i + 1]] for i in range(n_parts)]
            if rtype == POLYLINE:
                out.append(wkb_linestring(parts[0]) if n_parts == 1 else
                           struct.pack("<BII", 1, 5, n_parts)
                           + b"".join(wkb_linestring(p) for p in parts))
            else:
                out.append(_rings_to_wkb(parts))
        else:
            raise ValueError(f"unsupported shape type {rtype}")
        pos = end
    return out


def _rings_to_wkb(parts: list[np.ndarray]) -> bytes:
    """Shapefile polygon parts -> canonical WKB.  CW parts are outers,
    CCW parts are holes (spec winding); both flip to canonical order."""
    outers: list[list[np.ndarray]] = []
    holes: list[np.ndarray] = []
    order: list[int] = []  # file order of the outers, to keep WKB stable
    for ring in parts:
        ring = _close(ring)
        if _signed_area(ring) <= 0.0:          # clockwise -> outer
            outers.append([ring[::-1].copy()])  # canonical CCW
            order.append(len(order))
        else:                                   # counter-clockwise -> hole
            holes.append(ring[::-1].copy())     # canonical CW
    if not outers:
        raise ValueError("polygon record has holes but no outer ring")
    for hole in holes:
        placed = False
        for rings in outers:
            if bool(geo.points_in_ring(hole[:1, 0], hole[:1, 1],
                                       rings[0])[0]):
                rings.append(hole)
                placed = True
                break
        if not placed:  # orphan hole: foreign writers do emit these —
            outers[0].append(hole)  # keep it (even-odd PIP stays correct)
    if len(outers) == 1:
        return geo.wkb_from_rings(outers[0])
    return geo.wkb_from_polygons(outers)


# ---------------------------------------------------------------- .dbf codec

_DBF_DATE = (26, 1, 1)  # fixed: byte-deterministic output


def encode_dbf(table: pa.Table) -> bytes:
    """Attribute table -> dBase III bytes.  int64 -> N(20,0),
    float64 -> F(25) carrying %.17g (bit-exact roundtrip), string -> C,
    bool -> L."""
    cols = [(n, table[n].to_pylist()) for n in table.column_names]
    descs, widths, kinds = [], [], []
    for name, vals in cols:
        t = table.schema.field(name).type
        if pa.types.is_integer(t):
            kind, width, dec = b"N", 20, 0
        elif pa.types.is_floating(t):
            kind, width, dec = b"F", 25, 17
        elif pa.types.is_boolean(t):
            kind, width, dec = b"L", 1, 0
        elif pa.types.is_string(t) or pa.types.is_large_string(t):
            kind = b"C"
            width = max([1] + [len(str(v).encode()) for v in vals
                               if v is not None])
            if width > 254:
                raise ValueError(f"dbf C field {name} exceeds 254 bytes")
            dec = 0
        else:
            raise ValueError(f"unsupported dbf column type {t} ({name})")
        nm = name.encode()
        if not nm:
            raise ValueError("dbf field names must be non-empty")
        if len(nm) > 10:  # dBase III hard limit; fiona truncates with a
            # warning — silent truncation would break bit-exact roundtrips
            raise ValueError(f"dbf field name {name!r} exceeds 10 bytes")
        descs.append(struct.pack("<11sc4xBB14x", nm, kind, width, dec))
        widths.append(width)
        kinds.append(kind)
    rec_size = 1 + sum(widths)
    hdr_size = 32 + 32 * len(descs) + 1
    n = table.num_rows
    head = struct.pack("<B3BIHH20x", 0x03, *_DBF_DATE, n, hdr_size, rec_size)
    body = bytearray()
    for r in range(n):
        body += b" "  # not deleted
        for (name, vals), width, kind in zip(cols, widths, kinds):
            v = vals[r]
            if v is None:
                cell = b" " * width
            elif kind == b"N":
                cell = str(int(v)).rjust(width).encode()
            elif kind == b"F":
                cell = (b"%.17g" % float(v)).rjust(width)
            elif kind == b"L":
                cell = b"T" if v else b"F"
            else:
                cell = str(v).encode().ljust(width)
            if len(cell) != width:
                raise ValueError(f"dbf value overflow in {name}: {v!r}")
            body += cell
    return head + b"".join(descs) + b"\x0d" + bytes(body) + b"\x1a"


def decode_dbf(buf: bytes) -> pa.Table:
    """dBase III bytes -> pyarrow table (C -> string, N dec=0 -> int64,
    N dec>0 / F -> float64, L -> bool; blank cells -> null)."""
    if len(buf) < 33 or buf[0] not in (0x02, 0x03, 0x83):
        raise ValueError("not a dBase III file")
    n, hdr_size, rec_size = struct.unpack_from("<IHH", buf, 4)
    if len(buf) < hdr_size:
        raise ValueError(
            f"dbf truncated: {len(buf)} bytes < header size {hdr_size}")
    fields = []
    pos = 32
    while pos < hdr_size - 1 and buf[pos] != 0x0D:
        name_b, kind, width, dec = struct.unpack_from("<11sc4xBB14x",
                                                      buf, pos)
        fields.append((name_b.split(b"\x00")[0].decode(),
                       kind.decode(), width, dec))
        pos += 32
    if 1 + sum(f[2] for f in fields) != rec_size:
        raise ValueError("dbf record size disagrees with field widths")
    if len(buf) < hdr_size + n * rec_size:  # EOF byte optional in the wild
        raise ValueError(
            f"dbf truncated: {len(buf)} bytes < header {hdr_size} + "
            f"{n} records x {rec_size}")
    cols: dict[str, list] = {f[0]: [] for f in fields}
    at = hdr_size
    for _ in range(n):
        if buf[at:at + 1] == b"\x1a":
            raise ValueError("dbf truncated: EOF before record count")
        deleted = buf[at:at + 1] == b"*"
        at += 1
        for name, kind, width, dec in fields:
            raw = buf[at:at + width]
            at += width
            if deleted:
                continue
            s = raw.strip(b" \x00")
            if kind == "C":
                cols[name].append(raw.rstrip(b" \x00").decode())
            elif kind in ("N", "F"):
                if not s:
                    cols[name].append(None)
                elif kind == "N" and dec == 0:
                    cols[name].append(int(s))
                else:
                    cols[name].append(float(s))
            elif kind == "L":
                cols[name].append(None if s in (b"", b"?")
                                  else s in (b"T", b"t", b"Y", b"y"))
            else:
                raise ValueError(f"unsupported dbf field type {kind}")
    arrays = {}
    for name, kind, width, dec in fields:
        vals = cols[name]
        if kind == "C":
            arrays[name] = pa.array(vals, pa.string())
        elif kind == "N" and dec == 0:
            arrays[name] = pa.array(vals, pa.int64())
        elif kind in ("N", "F"):
            arrays[name] = pa.array(vals, pa.float64())
        else:
            arrays[name] = pa.array(vals, pa.bool_())
    return pa.table(arrays)


# ------------------------------------------------------- table-level surface

def encode_shapefile(table: pa.Table,
                     geom_col: str = "geom_wkb") -> dict[str, bytes]:
    """Table with a WKB geometry column -> {'shp', 'shx', 'dbf'} bytes —
    the three-file set every shapefile consumer expects."""
    shp, shx = encode_shp(table[geom_col].to_pylist())
    attrs = table.drop_columns([geom_col])
    return {"shp": shp, "shx": shx, "dbf": encode_dbf(attrs)}


def decode_shapefile(shp: bytes, dbf: bytes | None = None,
                     geom_col: str = "geom_wkb") -> pa.Table:
    """.shp (+ optional .dbf) bytes -> table of attributes + WKB geometry
    (the engine-side shape of geopandas.read_file)."""
    wkbs = decode_shp(shp)
    geom = pa.array(wkbs, pa.binary())
    if dbf is None:
        return pa.table({geom_col: geom})
    attrs = decode_dbf(dbf)
    if attrs.num_rows != len(wkbs):
        raise ValueError(
            f".dbf has {attrs.num_rows} records, .shp has {len(wkbs)}")
    return attrs.append_column(geom_col, geom)


def encode_shapefile_zip(table: pa.Table, name: str = "layer",
                         geom_col: str = "geom_wkb") -> bytes:
    """Table -> zipped shapefile (<name>.shp/.shx/.dbf members) — the
    archive form SSURGO/census distributions ship in.  Deterministic
    bytes (fixed zip timestamps), so sinks stay resumable-idempotent."""
    import io
    import zipfile

    files = encode_shapefile(table, geom_col)
    out = io.BytesIO()
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for ext in ("shp", "shx", "dbf"):
            info = zipfile.ZipInfo(f"{name}.{ext}", date_time=(1980, 1, 1,
                                                               0, 0, 0))
            zf.writestr(info, files[ext])
    return out.getvalue()


def decode_shapefile_zip(buf: bytes, layer: str | None = None,
                         geom_col: str = "geom_wkb") -> pa.Table:
    """Zipped shapefile -> table.  ``layer`` picks the basename when the
    archive carries several layers; exactly one match is required."""
    import io
    import zipfile

    zf = zipfile.ZipFile(io.BytesIO(buf))
    shps = [n for n in zf.namelist() if n.lower().endswith(".shp")]
    if layer is not None:
        shps = [n for n in shps
                if n.rsplit("/", 1)[-1][:-4] == layer]
    if len(shps) != 1:
        raise ValueError(
            f"need exactly one .shp member (layer={layer!r}), found {shps}")
    base = shps[0][:-4]
    dbf = next((n for n in zf.namelist()
                if n[:-4] == base and n.lower().endswith(".dbf")), None)
    return decode_shapefile(zf.read(shps[0]),
                            zf.read(dbf) if dbf else None, geom_col)


# ------------------------------------------------------------------- GeoJSON

def _geom_to_wkb(g: dict) -> bytes:
    t = g.get("type")
    if "coordinates" not in g:
        raise ValueError(f"unsupported GeoJSON geometry type {t}")
    c = g["coordinates"]
    if t == "Point":
        return wkb_point(float(c[0]), float(c[1]))
    if t == "LineString":
        return wkb_linestring(np.asarray(c, np.float64))
    if t == "MultiLineString":
        return (struct.pack("<BII", 1, 5, len(c))
                + b"".join(wkb_linestring(np.asarray(p, np.float64))
                           for p in c))
    if t == "Polygon":
        return geo.wkb_from_rings([np.asarray(r, np.float64) for r in c])
    if t == "MultiPolygon":
        return geo.wkb_from_polygons(
            [[np.asarray(r, np.float64) for r in poly] for poly in c])
    raise ValueError(f"unsupported GeoJSON geometry type {t}")


def _wkb_to_geom(wkb: bytes) -> dict:
    gt = _wkb_type(wkb)
    if gt == 1:
        return {"type": "Point", "coordinates": list(parse_wkb_point(wkb))}
    if gt in (2, 5):
        lines = [l.tolist() for l in parse_wkb_lines(wkb)]
        return ({"type": "LineString", "coordinates": lines[0]} if gt == 2
                else {"type": "MultiLineString", "coordinates": lines})
    polys = [[r.tolist() for r in rings] for rings in geo.parse_wkb(wkb)]
    return ({"type": "Polygon", "coordinates": polys[0]} if gt == 3
            else {"type": "MultiPolygon", "coordinates": polys})


def geojson_to_table(text: str | bytes,
                     geom_col: str = "geom_wkb") -> pa.Table:
    """GeoJSON FeatureCollection/Feature/geometry -> properties + WKB
    table.  Property columns appear in first-seen order; features missing
    a property get null."""
    doc = json.loads(text)
    if doc.get("type") == "FeatureCollection":
        feats = doc["features"]
    elif doc.get("type") == "Feature":
        feats = [doc]
    else:
        feats = [{"type": "Feature", "properties": {}, "geometry": doc}]
    prop_names: list[str] = []
    for f in feats:
        for k in (f.get("properties") or {}):
            if k not in prop_names:
                prop_names.append(k)
    cols: dict[str, list] = {k: [] for k in prop_names}
    wkbs: list[bytes | None] = []
    for f in feats:
        props = f.get("properties") or {}
        for k in prop_names:
            cols[k].append(props.get(k))
        g = f.get("geometry")
        wkbs.append(None if g is None else _geom_to_wkb(g))
    out = {k: pa.array(v) for k, v in cols.items()}
    out[geom_col] = pa.array(wkbs, pa.binary())
    return pa.table(out)


def _features_of(table: pa.Table, geom_col: str) -> list[dict]:
    attrs = [n for n in table.column_names if n != geom_col]
    feats = []
    for r in range(table.num_rows):
        wkb = table[geom_col][r].as_py()
        feats.append({
            "type": "Feature",
            "properties": {n: table[n][r].as_py() for n in attrs},
            "geometry": None if wkb is None else _wkb_to_geom(wkb),
        })
    return feats


def table_to_geojson(table: pa.Table, geom_col: str = "geom_wkb") -> str:
    """Properties + WKB table -> GeoJSON FeatureCollection text.  Floats
    serialize via repr so a re-ingest is bit-exact."""
    return json.dumps({"type": "FeatureCollection",
                       "features": _features_of(table, geom_col)})


def table_to_geojsonl(table: pa.Table, geom_col: str = "geom_wkb") -> str:
    """Properties + WKB table -> newline-delimited GeoJSON (one Feature per
    line, GDAL's GeoJSONSeq) — the streamable sink form; re-ingests through
    sources.read_geojsonl bit-exact."""
    lines = [json.dumps(f) for f in _features_of(table, geom_col)]
    return "\n".join(lines) + ("\n" if lines else "")
