"""Pure-stdlib uncompressed GeoTIFF strip codec (S1/S2 made real).

The reference reads/writes actual GeoTIFF files via rasterio
(/root/reference/demeter/raster/__init__.py:36-47,110-121: Raster.from_file
/ Raster.save round-trip pixels + transform + crs + nodata).  This container
has no rasterio/PIL, so the engine's raster bytes are normally raw-numpy
tile rows — this module closes the format gap with a from-scratch baseline
TIFF 6.0 + GeoTIFF 1.1 codec for the subset the engine's rasters occupy:

- single band, uncompressed, strip-organized (RowsPerStrip configurable);
- dtypes uint8/uint16/uint32/int16/int32/float32/float64 via
  BitsPerSample + SampleFormat;
- north-up affine georeferencing through ModelPixelScaleTag(33550) +
  ModelTiepointTag(33922) (the GeoTIFF spec's scale+tiepoint form — rotated
  transforms would need ModelTransformationTag and are rejected loudly);
- CRS through GeoKeyDirectoryTag(34735): GTModelTypeGeoKey geographic vs
  projected + Geographic/ProjectedCSTypeGeoKey carrying the EPSG code;
- nodata through the GDAL_NODATA ASCII tag (42113), the de-facto standard
  rasterio/GDAL emit.

Both byte orders decode ('II' and 'MM'); encode emits little-endian.
Everything is struct/numpy — no third-party codec anywhere.
"""

from __future__ import annotations

import struct

import numpy as np

from demeter_ray.functions import geo

# TIFF field types used here
_T_SHORT, _T_LONG, _T_RATIONAL, _T_ASCII, _T_DOUBLE = 3, 4, 5, 2, 12
_TYPE_SIZE = {_T_SHORT: 2, _T_LONG: 4, _T_ASCII: 1, _T_DOUBLE: 8}

# (SampleFormat, BitsPerSample) <-> numpy dtype
_FMT_BY_DTYPE = {
    "uint8": (1, 8), "uint16": (1, 16), "uint32": (1, 32),
    "int16": (2, 16), "int32": (2, 32),
    "float32": (3, 32), "float64": (3, 64),
}
_DTYPE_BY_FMT = {v: k for k, v in _FMT_BY_DTYPE.items()}

_GEOGRAPHIC_EPSG = frozenset({4326, 4269, 4267, 4258, 4759})


def _epsg_of(crs: str | int) -> int:
    if isinstance(crs, int):
        return crs
    s = str(crs).strip().upper()
    if s.startswith("EPSG:"):
        return int(s.split(":", 1)[1])
    return int(s)


def encode_geotiff(
    pixels: np.ndarray,
    transform,
    crs: str | int = "EPSG:4326",
    nodata: float | None = None,
    rows_per_strip: int = 64,
) -> bytes:
    """numpy (h, w) + (a, b, c, d, e, f) affine + crs + nodata -> GeoTIFF
    bytes.  Layout: 8-byte header, strip data, IFD + out-of-line values at
    the tail (header points past the strips)."""
    px = np.ascontiguousarray(pixels)
    if px.ndim != 2:
        raise ValueError(f"encode_geotiff wants a (h, w) band, got shape {px.shape}")
    dtype = str(px.dtype)
    if dtype not in _FMT_BY_DTYPE:
        raise ValueError(
            f"unsupported raster dtype {dtype}; one of {sorted(_FMT_BY_DTYPE)}"
        )
    a, b, c, d, e, f = (float(v) for v in transform)
    if b != 0.0 or d != 0.0 or a <= 0.0 or e >= 0.0:
        raise ValueError(
            "GeoTIFF scale+tiepoint georeferencing needs a north-up transform "
            f"(b == d == 0, a > 0, e < 0); got {(a, b, c, d, e, f)}"
        )
    h, w = px.shape
    fmt_code, bits = _FMT_BY_DTYPE[dtype]
    epsg = _epsg_of(crs)

    if px.dtype.byteorder == ">":
        px = px.astype(px.dtype.newbyteorder("<"))
    data = px.tobytes()
    rows_per_strip = max(1, min(int(rows_per_strip), h)) if h else 1
    n_strips = max(1, -(-h // rows_per_strip))
    row_bytes = w * (bits // 8)
    strip_offsets, strip_counts = [], []
    pos = 8  # strips start right after the header
    for s in range(n_strips):
        nrows = min(rows_per_strip, h - s * rows_per_strip)
        strip_offsets.append(pos)
        strip_counts.append(nrows * row_bytes)
        pos += strip_counts[-1]

    # GeoKeyDirectory: version 1.1.0, keys sorted by id
    model_type = 2 if epsg in _GEOGRAPHIC_EPSG else 1
    cs_key = 2048 if model_type == 2 else 3072
    geokeys = [
        (1024, 0, 1, model_type),  # GTModelTypeGeoKey
        (1025, 0, 1, 1),           # GTRasterTypeGeoKey = PixelIsArea
        (cs_key, 0, 1, epsg),
    ]
    geodir = [1, 1, 0, len(geokeys)]
    for k in geokeys:
        geodir.extend(k)

    entries: list[tuple[int, int, int, object]] = [
        (256, _T_LONG, 1, w),
        (257, _T_LONG, 1, h),
        (258, _T_SHORT, 1, bits),
        (259, _T_SHORT, 1, 1),          # Compression = none
        (262, _T_SHORT, 1, 1),          # BlackIsZero
        (273, _T_LONG, n_strips, strip_offsets),
        (277, _T_SHORT, 1, 1),          # SamplesPerPixel
        (278, _T_LONG, 1, rows_per_strip),
        (279, _T_LONG, n_strips, strip_counts),
        (339, _T_SHORT, 1, fmt_code),   # SampleFormat
        (33550, _T_DOUBLE, 3, [a, -e, 0.0]),           # ModelPixelScale
        (33922, _T_DOUBLE, 6, [0.0, 0.0, 0.0, c, f, 0.0]),  # ModelTiepoint
        (34735, _T_SHORT, len(geodir), geodir),
    ]
    if nodata is not None:
        nd = (
            repr(int(nodata)) if float(nodata).is_integer() and fmt_code != 3
            else repr(float(nodata))
        )
        nds = nd.encode() + b"\x00"
        entries.append((42113, _T_ASCII, len(nds), nds))
    entries.sort(key=lambda t: t[0])

    ifd_offset = pos
    ifd_size = 2 + 12 * len(entries) + 4
    overflow_pos = ifd_offset + ifd_size
    ifd = bytearray()
    overflow = bytearray()
    ifd += struct.pack("<H", len(entries))
    pack_code = {_T_SHORT: "H", _T_LONG: "I", _T_DOUBLE: "d"}
    for tag, typ, count, value in entries:
        if typ == _T_ASCII:
            raw = bytes(value)
        else:
            vals = value if isinstance(value, (list, tuple)) else [value]
            raw = struct.pack(f"<{len(vals)}{pack_code[typ]}", *vals)
        if len(raw) <= 4:
            inline = raw + b"\x00" * (4 - len(raw))
            ifd += struct.pack("<HHI", tag, typ, count) + inline
        else:
            ifd += struct.pack("<HHII", tag, typ, count, overflow_pos + len(overflow))
            overflow += raw
            if len(overflow) % 2:  # TIFF values are word-aligned
                overflow += b"\x00"
    ifd += struct.pack("<I", 0)  # no next IFD

    header = struct.pack("<2sHI", b"II", 42, ifd_offset)
    return header + data + bytes(ifd) + bytes(overflow)


def _read_values(buf: bytes, bo: str, typ: int, count: int, field: bytes):
    size = _TYPE_SIZE[typ] * count
    if size <= 4:
        raw = field[:size]
    else:
        (off,) = struct.unpack(f"{bo}I", field)
        raw = buf[off : off + size]
    if typ == _T_ASCII:
        return raw
    code = {_T_SHORT: "H", _T_LONG: "I", _T_DOUBLE: "d"}[typ]
    return list(struct.unpack(f"{bo}{count}{code}", raw))


def decode_geotiff(buf: bytes):
    """GeoTIFF bytes -> (pixels (h, w) numpy, (a, b, c, d, e, f) transform,
    crs 'EPSG:xxxx' | None, nodata float | None).  Baseline subset: first
    IFD, single band, uncompressed strips; both byte orders."""
    if len(buf) < 8:
        raise ValueError("not a TIFF: truncated header")
    order = buf[:2]
    if order == b"II":
        bo = "<"
    elif order == b"MM":
        bo = ">"
    else:
        raise ValueError(f"not a TIFF: bad byte-order mark {order!r}")
    magic, ifd_offset = struct.unpack(f"{bo}HI", buf[2:8])
    if magic != 42:
        raise ValueError(f"not a TIFF: magic {magic} != 42")

    (n_entries,) = struct.unpack(f"{bo}H", buf[ifd_offset : ifd_offset + 2])
    tags: dict[int, tuple[int, int, bytes]] = {}
    p = ifd_offset + 2
    for _ in range(n_entries):
        tag, typ, count = struct.unpack(f"{bo}HHI", buf[p : p + 8])
        tags[tag] = (typ, count, buf[p + 8 : p + 12])
        p += 12

    def val(tag, default=None):
        if tag not in tags:
            return default
        typ, count, field = tags[tag]
        return _read_values(buf, bo, typ, count, field)

    w = val(256)[0]
    h = val(257)[0]
    bits = val(258, [8])[0]
    comp = val(259, [1])[0]
    if comp != 1:
        raise ValueError(f"unsupported TIFF compression {comp} (baseline only)")
    spp = val(277, [1])[0]
    if spp != 1:
        raise ValueError(f"unsupported SamplesPerPixel {spp} (single band only)")
    fmt = val(339, [1])[0]
    key = (fmt, bits)
    if key not in _DTYPE_BY_FMT:
        raise ValueError(f"unsupported (SampleFormat, BitsPerSample) {key}")
    dtype = np.dtype(_DTYPE_BY_FMT[key]).newbyteorder(bo)
    offsets = val(273)
    counts = val(279)
    data = b"".join(buf[o : o + n] for o, n in zip(offsets, counts))
    px = np.frombuffer(data, dtype=dtype).reshape(h, w)
    if bo == ">":
        px = px.astype(px.dtype.newbyteorder("<"))

    transform = None
    scale = val(33550)
    tiepoint = val(33922)
    if scale is not None and tiepoint is not None:
        sx, sy = scale[0], scale[1]
        i, j, _, x, y, _ = tiepoint[:6]
        # tiepoint maps raster (i, j) -> model (x, y); origin = offset back
        transform = (sx, 0.0, x - i * sx, 0.0, -sy, y + j * sy)

    crs = None
    geodir = val(34735)
    if geodir is not None:
        n_keys = geodir[3]
        keys = {
            geodir[4 + 4 * k]: geodir[4 + 4 * k + 3] for k in range(n_keys)
            if geodir[4 + 4 * k + 1] == 0  # inline SHORT values only
        }
        epsg = keys.get(2048) or keys.get(3072)
        if epsg:
            crs = f"EPSG:{epsg}"

    nodata = None
    nd = val(42113)
    if nd is not None:
        s = nd.split(b"\x00", 1)[0].strip()
        if s:
            nodata = float(s)
    return px, transform, crs, nodata


def tile_row_to_geotiff(row: dict, rows_per_strip: int = 64) -> bytes:
    """Engine tile-table row (tile schema: pixels/dtype/h/w/transform/crs/
    nodata) -> GeoTIFF bytes."""
    px = np.frombuffer(row["pixels"], dtype=row["dtype"]).reshape(row["h"], row["w"])
    return encode_geotiff(px, row["transform"], row["crs"] or "EPSG:4326",
                          row["nodata"], rows_per_strip)


def geotiff_to_tile_row(tif: bytes, tile_id: str, dataset: str = "raster") -> dict:
    """GeoTIFF bytes -> engine tile-table row dict (raster_tiles schema)."""
    px, transform, crs, nodata = decode_geotiff(tif)
    if transform is None:
        raise ValueError("GeoTIFF lacks scale+tiepoint georeferencing")
    h, w = px.shape
    b = geo.raster_bounds(transform, h, w)
    return dict(
        dataset=dataset, statistic=None, depth_top_cm=None, depth_bottom_cm=None,
        tile_id=tile_id, band=1, h=h, w=w, dtype=str(px.dtype),
        nodata=nodata, transform=list(transform), crs=crs,
        minx=b[0], miny=b[1], maxx=b[2], maxy=b[3], pixels=px.tobytes(),
    )
