"""Pure-stdlib uncompressed GeoTIFF strip codec (S1/S2 made real).

The reference reads/writes actual GeoTIFF files via rasterio
(/root/reference/demeter/raster/__init__.py:36-47,110-121: Raster.from_file
/ Raster.save round-trip pixels + transform + crs + nodata).  This container
has no rasterio/PIL, so the engine's raster bytes are normally raw-numpy
tile rows — this module closes the format gap with a from-scratch baseline
TIFF 6.0 + GeoTIFF 1.1 codec for the subset the engine's rasters occupy:

- single- or multi-band (SamplesPerPixel, PlanarConfiguration 1 chunky /
  2 planar, per-sample Predictor 2 differencing for chunky rows),
  strip-organized (RowsPerStrip configurable) or tiled;
- compression: none (1), LZW (5), DEFLATE (8, also legacy 32946 on decode)
  and PackBits (32773) — DEFLATE rides stdlib zlib (C speed, the
  performance-bearing compressed path); LZW and PackBits are from-scratch
  (TIFF 6.0 §13/§9 semantics: MSB-first variable-width codes with the
  libtiff "early change", ClearCode table resets; PackBits run/literal
  headers).  LZW's per-code Python loop is an ingest-edge path for foreign
  GDAL/libtiff files, not the engine's hot raster format (raw numpy rows);
- new-style JPEG (7, TIFF Tech Note 2) for uint8 chunky 1/3-band rasters:
  each tile/strip is a baseline JFIF stream from functions/jpeg.py with
  the shared DQT/DHT factored into the JPEGTables tag (347) — the lossy
  imagery layout GDAL writes for web-served COGs; roundtrip PSNR rides
  the JPEG codec's ~45 dB default, above the north rule's 40 dB bar;
- Predictor tag (317) value 2 (horizontal differencing) for integer
  dtypes on LZW/DEFLATE strips, applied per row — the layout GDAL emits
  by default for LZW integer rasters; value 3 (floating-point predictor,
  TIFF Technical Note 3 / libtiff fpDiff: MSB-first byte-plane split then
  byte-wise differencing with stride = samples-per-pixel) for float
  dtypes — the layout GDAL writes for compressed float32 DEM COGs
  (PREDICTOR=3), vectorized both directions;
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
BigTIFF (version 43, 64-bit offsets) decodes transparently and is emitted
via ``encode_geotiff(bigtiff=True)``; COG overview pyramids ride chained
reduced-resolution IFDs (``overviews=[2, 4]`` / ``decode_geotiff(
overview=k)``).
Everything is struct/numpy — no third-party codec anywhere.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from demeter_ray.functions import geo
from demeter_ray.functions import jpeg as _jpeg

# TIFF field types used here (LONG8 is BigTIFF's 64-bit unsigned)
_T_SHORT, _T_LONG, _T_RATIONAL, _T_ASCII, _T_DOUBLE, _T_LONG8 = 3, 4, 5, 2, 12, 16
_T_UNDEFINED = 7
_TYPE_SIZE = {_T_SHORT: 2, _T_LONG: 4, _T_ASCII: 1, _T_DOUBLE: 8, _T_LONG8: 8,
              _T_UNDEFINED: 1}
_PACK_CODE = {_T_SHORT: "H", _T_LONG: "I", _T_DOUBLE: "d", _T_LONG8: "Q"}

# (SampleFormat, BitsPerSample) <-> numpy dtype
_FMT_BY_DTYPE = {
    "uint8": (1, 8), "uint16": (1, 16), "uint32": (1, 32),
    "int16": (2, 16), "int32": (2, 32),
    "float32": (3, 32), "float64": (3, 64),
}
_DTYPE_BY_FMT = {v: k for k, v in _FMT_BY_DTYPE.items()}

_GEOGRAPHIC_EPSG = frozenset({4326, 4269, 4267, 4258, 4759})

# Compression tag (259) codes
_COMP_CODE = {"none": 1, "lzw": 5, "deflate": 8, "packbits": 32773, "jpeg": 7}
_COMP_NAME = {1: "none", 5: "lzw", 8: "deflate", 32946: "deflate",
              32773: "packbits", 7: "jpeg"}

_LZW_CLEAR, _LZW_EOI = 256, 257


def _packbits_encode(data: bytes) -> bytes:
    """TIFF 6.0 §9 PackBits: runs of 2..128 as (257-L, byte), literals of
    1..128 as (L-1, bytes)."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 2:
            out.append((257 - run) & 0xFF)
            out.append(data[i])
            i += run
        else:
            j = i + 1
            while j < n and j - i < 128:
                if j + 2 < n and data[j] == data[j + 1] == data[j + 2]:
                    break
                j += 1
            out.append(j - i - 1)
            out += data[i:j]
            i = j
    return bytes(out)


def _packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n and len(out) < expected:
        h = data[i]
        i += 1
        if h < 128:
            out += data[i : i + h + 1]
            i += h + 1
        elif h > 128:
            out += bytes((data[i],)) * (257 - h)
            i += 1
        # h == 128 is a no-op per spec
    if len(out) != expected:
        raise ValueError(
            f"PackBits strip decoded to {len(out)} bytes, expected {expected}"
        )
    return bytes(out)


def _lzw_encode(data: bytes) -> bytes:
    """TIFF 6.0 §13 LZW: MSB-first variable-width codes starting at 9 bits,
    ClearCode=256/EOI=257, libtiff "early change" width bumps at next_code
    511/1023/2047, table reset via ClearCode before code 4094."""
    out = bytearray()
    bitbuf = 0
    bitcnt = 0

    def emit(code: int, width: int) -> None:
        nonlocal bitbuf, bitcnt
        bitbuf = (bitbuf << width) | code
        bitcnt += width
        while bitcnt >= 8:
            bitcnt -= 8
            out.append((bitbuf >> bitcnt) & 0xFF)

    table: dict[bytes, int] = {bytes((i,)): i for i in range(256)}
    next_code, width = 258, 9
    emit(_LZW_CLEAR, width)
    w = b""
    for ch in data:
        c = bytes((ch,))
        wc = w + c
        if wc in table:
            w = wc
            continue
        emit(table[w], width)
        if next_code == 4094:
            # reset instead of adding the last slot: decoders re-init on CLEAR
            emit(_LZW_CLEAR, width)
            table = {bytes((i,)): i for i in range(256)}
            next_code, width = 258, 9
        else:
            table[wc] = next_code
            next_code += 1
            if next_code == 511:
                width = 10
            elif next_code == 1023:
                width = 11
            elif next_code == 2047:
                width = 12
        w = c
    if w:
        emit(table[w], width)
    emit(_LZW_EOI, width)
    if bitcnt:  # flush the partial byte, zero-padded
        out.append((bitbuf << (8 - bitcnt)) & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    nbits = len(data) * 8
    pos = 0

    def read(width: int) -> int:
        nonlocal pos
        if pos + width > nbits:
            return _LZW_EOI
        v = 0
        need = width
        while need:
            byte = data[pos >> 3]
            avail = 8 - (pos & 7)
            take = min(need, avail)
            v = (v << take) | ((byte >> (avail - take)) & ((1 << take) - 1))
            pos += take
            need -= take
        return v

    table: list[bytes] = []
    width = 9
    prev: bytes | None = None
    while len(out) < expected:
        code = read(width)
        if code == _LZW_EOI:
            break
        if code == _LZW_CLEAR:
            table = [bytes((i,)) for i in range(256)] + [b"", b""]
            width = 9
            prev = None
            continue
        if prev is None:
            if code > 255:
                raise ValueError(f"LZW: first code after CLEAR is {code}")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"LZW: code {code} beyond table size {len(table)}")
        out += entry
        prev = entry
        # early change: the NEXT read widens one code before the table fills
        n = len(table)
        if n >= 2046:
            width = 12
        elif n >= 1022:
            width = 11
        elif n >= 510:
            width = 10
    if len(out) != expected:
        raise ValueError(
            f"LZW strip decoded to {len(out)} bytes, expected {expected}"
        )
    return bytes(out)


def _predict2_forward(rows: np.ndarray, spp: int = 1) -> np.ndarray:
    """Horizontal differencing (Predictor=2) per row, modular in the
    sample dtype — integer dtypes only (TIFF predictor 2 is int-domain).
    For chunky multi-sample rows (``spp`` > 1) differencing runs per
    SAMPLE across columns (TIFF 6.0 §14: x[i] - x[i - spp])."""
    d = rows.copy()
    d[:, spp:] = rows[:, spp:] - rows[:, :-spp]  # wraps in-dtype
    return d


def _predict2_inverse(rows: np.ndarray, spp: int = 1) -> np.ndarray:
    if spp == 1:
        return np.cumsum(rows, axis=1, dtype=rows.dtype)
    n, m = rows.shape
    r = rows.reshape(n, m // spp, spp)
    return np.cumsum(r, axis=1, dtype=rows.dtype).reshape(n, m)


def _predict3_forward(rows: np.ndarray, spp: int = 1) -> np.ndarray:
    """Floating-point predictor (Predictor=3, TIFF Technical Note 3 —
    the layout GDAL writes for compressed float DEM COGs).  Per scanline:
    each sample's bytes are split into byte planes ordered MSB-first
    (plane order is endian-independent on disk, libtiff ``fpDiff``), the
    planes are concatenated, and the whole reordered row is byte-wise
    horizontally differenced with stride ``spp`` samples-per-pixel.
    Input (nrows, w*spp) float rows -> (nrows, w*spp*itemsize) uint8."""
    n, m = rows.shape
    isz = rows.dtype.itemsize
    # big-endian view puts the MSB at byte 0 of every sample
    be = np.ascontiguousarray(
        rows.astype(rows.dtype.newbyteorder(">"))).view(np.uint8)
    planes = np.ascontiguousarray(
        be.reshape(n, m, isz).transpose(0, 2, 1)).reshape(n, m * isz)
    d = planes.copy()
    d[:, spp:] -= planes[:, :-spp]  # uint8 modular differencing
    return d


def _predict3_inverse(rows: np.ndarray, dtype: np.dtype,
                      spp: int = 1) -> np.ndarray:
    """Inverse of :func:`_predict3_forward` (libtiff ``fpAcc``): byte-wise
    accumulate with stride ``spp``, then gather the MSB-first byte planes
    back into native-endian samples.  Input (nrows, w*spp*itemsize) uint8
    -> (nrows, w*spp) of ``dtype``."""
    isz = np.dtype(dtype).itemsize
    n, tot = rows.shape
    m = tot // isz
    acc = np.cumsum(rows.reshape(n, tot // spp, spp), axis=1,
                    dtype=np.uint8).reshape(n, tot)
    be = np.ascontiguousarray(
        acc.reshape(n, isz, m).transpose(0, 2, 1)).reshape(n, m * isz)
    out = be.view(np.dtype(dtype).newbyteorder(">")).reshape(n, m)
    return out.astype(np.dtype(dtype).newbyteorder("="))


def _compress(raw: bytes, compression: str) -> bytes:
    if compression == "deflate":
        return zlib.compress(raw, 6)
    if compression == "packbits":
        return _packbits_encode(raw)
    if compression == "lzw":
        return _lzw_encode(raw)
    return raw


def _decompress(raw: bytes, comp_name: str, expected: int) -> bytes:
    if comp_name == "deflate":
        out = zlib.decompress(raw)
        if len(out) != expected:
            raise ValueError(f"DEFLATE segment decoded to {len(out)} bytes, "
                             f"expected {expected}")
        return out
    if comp_name == "packbits":
        return _packbits_decode(raw, expected)
    if comp_name == "lzw":
        return _lzw_decode(raw, expected)
    if len(raw) < expected:
        raise ValueError(f"uncompressed segment is {len(raw)} bytes, "
                         f"expected {expected}")
    return raw[:expected]


def _jpeg_expand(raw: bytes, tables: bytes | None, expected: int) -> bytes:
    """JPEG tile/strip payload (abbreviated, merged with the JPEGTables
    stream, or self-contained interchange) -> raw pixel bytes."""
    if not raw:
        return bytes(expected)
    stream = _jpeg.merge_abbreviated(tables, raw) if tables else bytes(raw)
    px = _jpeg.decode_jpeg(stream)
    out = np.ascontiguousarray(px).tobytes()
    if len(out) != expected:
        raise ValueError(
            f"JPEG segment decodes to shape {px.shape} ({len(out)} bytes) "
            f"but the TIFF segment geometry expects {expected} bytes")
    return out


def _downsample(px3: np.ndarray, f: int, resampling: str) -> np.ndarray:
    """(h, w, k) -> (ceil(h/f), ceil(w/f), k) reduced level.  ``nearest``
    takes the top-left sample of each f x f block (GDAL NEAREST);
    ``average`` is the exact block mean — floor division for integer
    dtypes (documented; ragged edge blocks average over their true count)."""
    h, w, k = px3.shape
    if resampling == "nearest":
        return px3[::f, ::f]
    if resampling != "average":
        raise ValueError(f"resampling must be nearest/average, got {resampling!r}")
    ri = np.arange(0, h, f)
    ci = np.arange(0, w, f)
    if px3.dtype.kind == "f":
        s = np.add.reduceat(np.add.reduceat(px3.astype(np.float64), ri, axis=0),
                            ci, axis=1)
        rc = np.minimum(ri + f, h) - ri
        cc = np.minimum(ci + f, w) - ci
        return (s / np.multiply.outer(rc, cc)[:, :, None]).astype(px3.dtype)
    s = np.add.reduceat(np.add.reduceat(px3.astype(np.int64), ri, axis=0),
                        ci, axis=1)
    rc = np.minimum(ri + f, h) - ri
    cc = np.minimum(ci + f, w) - ci
    return (s // np.multiply.outer(rc, cc)[:, :, None]).astype(px3.dtype)


def _pack_ifd(entries, ifd_offset: int, next_ifd: int = 0,
              big: bool = False) -> bytes:
    """Pack one little-endian IFD at ``ifd_offset``; out-of-line values
    land immediately after the entry table (word-aligned).  ``big`` packs
    the BigTIFF shape: 8-byte entry count, 20-byte entries with 8-byte
    inline value slots, 8-byte next pointer."""
    cap = 8 if big else 4
    ifd_size = (8 + 20 * len(entries) + 8) if big else (2 + 12 * len(entries) + 4)
    overflow_pos = ifd_offset + ifd_size
    ifd = bytearray()
    overflow = bytearray()
    ifd += struct.pack("<Q" if big else "<H", len(entries))
    head = "<HHQ" if big else "<HHI"
    off_code = "Q" if big else "I"
    for tag, typ, count, value in entries:
        if typ in (_T_ASCII, _T_UNDEFINED):
            raw = bytes(value)
        else:
            vals = value if isinstance(value, (list, tuple)) else [value]
            raw = struct.pack(f"<{len(vals)}{_PACK_CODE[typ]}", *vals)
        if len(raw) <= cap:
            inline = raw + b"\x00" * (cap - len(raw))
            ifd += struct.pack(head, tag, typ, count) + inline
        else:
            ifd += struct.pack(head + off_code, tag, typ, count,
                               overflow_pos + len(overflow))
            overflow += raw
            if len(overflow) % 2:  # TIFF values are word-aligned
                overflow += b"\x00"
    ifd += struct.pack(f"<{off_code}", next_ifd)
    return bytes(ifd) + bytes(overflow)


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
    compression: str = "none",
    predictor: int = 1,
    tile: tuple[int, int] | None = None,
    planar: int = 1,
    overviews: list[int] | None = None,
    resampling: str = "nearest",
    bigtiff: bool = False,
    jpeg_quality: float = 1.0,
    jpeg_subsampling: str = "444",
) -> bytes:
    """numpy (h, w) band or (h, w, bands) image + (a, b, c, d, e, f)
    affine + crs + nodata -> GeoTIFF bytes.  Layout: 8-byte header, strip
    data, IFD + out-of-line values at the tail (header points past the
    strips).  Multi-band uses SamplesPerPixel + PlanarConfiguration:
    ``planar=1`` (chunky, interleaved samples — the GDAL default) or
    ``planar=2`` (separate per-band planes, band-major segment order).

    ``overviews=[2, 4, ...]`` appends reduced-resolution IFDs chained off
    the primary (NewSubfileType=1) — the COG overview-pyramid structure —
    each downsampled from the FULL-resolution image by the given factor
    with ``resampling`` "nearest" (top-left sample) or "average" (exact
    block mean; floor division on integer dtypes).  The overview's
    ModelPixelScale is the base scale times the factor, same origin.

    ``bigtiff=True`` emits the BigTIFF (version 43) container — 64-bit
    offsets and counts, 20-byte IFD entries — the layout GDAL switches to
    when a raster exceeds classic TIFF's 4 GB addressing (the format any
    100-TB-scale mosaic sink must speak)."""
    px = np.ascontiguousarray(pixels)
    if px.ndim == 2:
        bands = 1
    elif px.ndim == 3 and px.shape[2] >= 1:
        bands = px.shape[2]
    else:
        raise ValueError(
            f"encode_geotiff wants (h, w) or (h, w, bands), got shape {px.shape}")
    if planar not in (1, 2):
        raise ValueError(f"PlanarConfiguration must be 1 or 2, got {planar}")
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
    h, w = px.shape[:2]
    fmt_code, bits = _FMT_BY_DTYPE[dtype]
    epsg = _epsg_of(crs)

    if compression not in _COMP_CODE:
        raise ValueError(
            f"unsupported compression {compression!r}; one of {sorted(_COMP_CODE)}"
        )
    if predictor not in (1, 2, 3):
        raise ValueError(f"unsupported predictor {predictor} (1, 2 or 3)")
    if predictor == 2 and fmt_code == 3:
        raise ValueError("Predictor=2 is integer horizontal differencing; "
                         "float rasters use predictor=3 (or 1)")
    if predictor == 3 and fmt_code != 3:
        raise ValueError("Predictor=3 is the floating-point predictor; "
                         "integer rasters use predictor=2 (or 1)")
    if predictor != 1 and compression == "none":
        raise ValueError(f"Predictor={predictor} without compression is "
                         "non-standard; pair it with lzw/deflate/packbits")
    if compression == "jpeg":
        if dtype != "uint8":
            raise ValueError(
                f"JPEG-in-TIFF (compression 7) needs uint8 samples, got {dtype}")
        if bands not in (1, 3):
            raise ValueError(
                f"JPEG-in-TIFF supports 1 or 3 bands, got {bands}")
        if planar == 2 and bands > 1:
            raise ValueError(
                "JPEG-in-TIFF is chunky-only (PlanarConfiguration 1)")
        if predictor != 1:
            raise ValueError("Predictor does not apply to JPEG compression")

    if px.dtype.byteorder == ">":
        px = px.astype(px.dtype.newbyteorder("<"))
    px3 = px[:, :, None] if px.ndim == 2 else px

    factors = [int(v) for v in (overviews or [])]
    if any(v < 2 for v in factors):
        raise ValueError(f"overview factors must be >= 2, got {overviews}")
    levels: list[tuple[np.ndarray, float, float]] = [(px3, a, e)]
    for fct in factors:
        levels.append((_downsample(px3, fct, resampling), a * fct, e * fct))

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

    # pass 1: pixel segments for every level (data starts right after the
    # header — 8 bytes classic, 16 BigTIFF; each level's IFD chains after
    # all pixel data)
    pos = 16 if bigtiff else 8
    off_t = _T_LONG8 if bigtiff else _T_LONG
    all_data: list[bytes] = []
    jpeg_tables: bytes | None = None
    level_meta = []  # (entries sans layout offsets, filled below)
    for lvl, (lpx, la, le) in enumerate(levels):
        lh, lw = lpx.shape[:2]
        if planar == 2 and bands > 1:
            planes = [lpx[:, :, b : b + 1] for b in range(bands)]
        else:
            planes = [lpx]  # chunky: interleaved samples in one plane
        segments: list[bytes] = []
        rps_used = rows_per_strip
        for plane in planes:
            k = plane.shape[2]
            if tile is not None:
                tw, tl = int(tile[0]), int(tile[1])
                if tw % 16 or tl % 16 or tw <= 0 or tl <= 0:
                    raise ValueError(
                        f"tile dims must be positive multiples of 16, got {tile}"
                    )
                ta = max(1, -(-lw // tw))  # tiles across
                td = max(1, -(-lh // tl))  # tiles down
                padded = np.zeros((td * tl, ta * tw, k), dtype=px.dtype)
                padded[:lh, :lw] = plane
                for ty in range(td):
                    for tx in range(ta):
                        t3 = padded[ty * tl : (ty + 1) * tl,
                                    tx * tw : (tx + 1) * tw]
                        if compression == "jpeg":
                            segments.append(_jpeg.encode_jpeg(
                                t3, jpeg_quality,
                                subsampling=jpeg_subsampling))
                            continue
                        t = t3.reshape(tl, tw * k)
                        if predictor == 2:
                            t = _predict2_forward(t, spp=k)
                        elif predictor == 3:
                            t = _predict3_forward(t, spp=k)
                        segments.append(_compress(t.tobytes(), compression))
            else:
                rps_used = max(1, min(int(rows_per_strip), lh)) if lh else 1
                n_strips = max(1, -(-lh // rps_used))
                for s in range(n_strips):
                    rows = plane[s * rps_used : s * rps_used + rps_used]
                    if compression == "jpeg":
                        segments.append(
                            _jpeg.encode_jpeg(
                                np.ascontiguousarray(rows), jpeg_quality,
                                subsampling=jpeg_subsampling)
                            if rows.shape[0] else b"")
                        continue
                    rows = np.ascontiguousarray(rows).reshape(rows.shape[0],
                                                              lw * k)
                    if predictor == 2 and rows.size:
                        rows = _predict2_forward(rows, spp=k)
                    elif predictor == 3 and rows.size:
                        rows = _predict3_forward(rows, spp=k)
                    segments.append(_compress(rows.tobytes(), compression))
        if compression == "jpeg":
            # factor the shared DQT/DHT into the JPEGTables tag (347) —
            # the encoder's tables depend only on jpeg_quality, so the
            # first segment's tables serve every segment and level
            abbreviated = []
            for raw in segments:
                if not raw:
                    abbreviated.append(raw)
                    continue
                t_stream, ab = _jpeg.split_tables(raw)
                if jpeg_tables is None:
                    jpeg_tables = t_stream
                abbreviated.append(ab)
            segments = abbreviated
        seg_offsets, seg_counts = [], []
        for raw in segments:
            seg_offsets.append(pos)
            seg_counts.append(len(raw))
            pos += len(raw)
        all_data.extend(segments)
        n_segs = len(segments)

        entries: list[tuple[int, int, int, object]] = [
            (256, _T_LONG, 1, lw),
            (257, _T_LONG, 1, lh),
            (258, _T_SHORT, bands, [bits] * bands),
            (259, _T_SHORT, 1, _COMP_CODE[compression]),
            (262, _T_SHORT, 1, 2 if bands == 3 else 1),  # RGB / BlackIsZero
            (277, _T_SHORT, 1, bands),      # SamplesPerPixel
            (339, _T_SHORT, bands, [fmt_code] * bands),  # SampleFormat
        ]
        if lvl > 0:
            entries.append((254, _T_LONG, 1, 1))  # NewSubfileType: reduced
        if compression == "jpeg" and jpeg_tables is not None:
            entries.append(
                (347, _T_UNDEFINED, len(jpeg_tables), jpeg_tables))
        if bands > 1:
            entries.append((284, _T_SHORT, 1, planar))  # PlanarConfiguration
        if tile is not None:
            entries += [
                (322, _T_LONG, 1, tw), (323, _T_LONG, 1, tl),
                (324, off_t, n_segs, seg_offsets),
                (325, _T_LONG, n_segs, seg_counts),
            ]
        else:
            entries += [
                (273, off_t, n_segs, seg_offsets),
                (278, _T_LONG, 1, rps_used),
                (279, _T_LONG, n_segs, seg_counts),
            ]
        if predictor != 1:
            entries.append((317, _T_SHORT, 1, predictor))
        entries += [
            (33550, _T_DOUBLE, 3, [la, -le, 0.0]),           # ModelPixelScale
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
        level_meta.append(entries)

    # pass 2: lay the IFD chain down after the pixel data.  Each packed
    # IFD's size is deterministic from its entries, so the chain offsets
    # resolve in one forward sweep.
    ifd_offsets = []
    at = pos
    for entries in level_meta:
        ifd_offsets.append(at)
        at += len(_pack_ifd(entries, at, 0, big=bigtiff))
    ifds = b"".join(
        _pack_ifd(entries, ifd_offsets[i],
                  ifd_offsets[i + 1] if i + 1 < len(level_meta) else 0,
                  big=bigtiff)
        for i, entries in enumerate(level_meta)
    )
    if bigtiff:
        header = struct.pack("<2sHHHQ", b"II", 43, 8, 0, ifd_offsets[0])
    else:
        header = struct.pack("<2sHI", b"II", 42, ifd_offsets[0])
    return header + b"".join(all_data) + ifds


def _read_values(buf: bytes, bo: str, typ: int, count: int, field: bytes):
    size = _TYPE_SIZE[typ] * count
    if size <= len(field):  # inline slot: 4 bytes classic, 8 BigTIFF
        raw = field[:size]
    else:
        (off,) = struct.unpack(f"{bo}{'Q' if len(field) == 8 else 'I'}", field)
        raw = buf[off : off + size]
    if typ in (_T_ASCII, _T_UNDEFINED):
        return raw
    return list(struct.unpack(f"{bo}{count}{_PACK_CODE[typ]}", raw))


def _ifd_chain(buf: bytes, bo: str, first: int, big: bool = False) -> list[int]:
    """Follow the next-IFD pointers; bounded to guard cyclic chains."""
    offsets = []
    off = first
    while off and len(offsets) < 64:
        offsets.append(off)
        if big:
            (n_entries,) = struct.unpack(f"{bo}Q", buf[off : off + 8])
            nxt_at = off + 8 + 20 * n_entries
            (off,) = struct.unpack(f"{bo}Q", buf[nxt_at : nxt_at + 8])
        else:
            (n_entries,) = struct.unpack(f"{bo}H", buf[off : off + 2])
            nxt_at = off + 2 + 12 * n_entries
            (off,) = struct.unpack(f"{bo}I", buf[nxt_at : nxt_at + 4])
    if off:
        raise ValueError("IFD chain longer than 64 entries (cycle?)")
    return offsets


def _parse_header(buf: bytes) -> tuple[str, bool, int]:
    """-> (byte order, bigtiff?, first IFD offset); validates magic."""
    if len(buf) < 8:
        raise ValueError("not a TIFF: truncated header")
    order = buf[:2]
    if order == b"II":
        bo = "<"
    elif order == b"MM":
        bo = ">"
    else:
        raise ValueError(f"not a TIFF: bad byte-order mark {order!r}")
    (magic,) = struct.unpack(f"{bo}H", buf[2:4])
    if magic == 42:
        (first,) = struct.unpack(f"{bo}I", buf[4:8])
        return bo, False, first
    if magic == 43:  # BigTIFF
        osz, pad = struct.unpack(f"{bo}HH", buf[4:8])
        if osz != 8 or pad != 0:
            raise ValueError(f"bad BigTIFF offset size {osz}/{pad}")
        if len(buf) < 16:
            raise ValueError("truncated BigTIFF header")
        (first,) = struct.unpack(f"{bo}Q", buf[8:16])
        return bo, True, first
    raise ValueError(f"not a TIFF: magic {magic} != 42/43")


def geotiff_overview_count(buf: bytes) -> int:
    """Number of reduced-resolution IFDs chained after the primary."""
    bo, big, first = _parse_header(buf)
    return len(_ifd_chain(buf, bo, first, big)) - 1


def decode_geotiff(buf: bytes, window: tuple[int, int, int, int] | None = None,
                   overview: int = 0):
    """GeoTIFF bytes -> (pixels numpy, (a, b, c, d, e, f) transform,
    crs 'EPSG:xxxx' | None, nodata float | None).  First IFD, single band,
    strip- or tile-organized, any supported compression; both byte orders.

    ``window=(row0, row1, col0, col1)`` decodes only that pixel rectangle —
    on tiled files only intersecting tiles are decompressed, on stripped
    files only intersecting strips (the COG windowed-read access pattern:
    reference S5 reads remote COG windows via rasterio;
    /root/reference/demeter/raster/__init__.py:36-47).  The returned
    transform is shifted to the window origin so georeferencing stays
    consistent.

    ``overview=k`` selects the k-th IFD of the chain (0 = primary full
    resolution, 1.. = the COG reduced-resolution overviews); window
    coordinates are in THAT level's pixel space and only that level's
    segments are touched."""
    bo, big, ifd_offset = _parse_header(buf)
    if overview:
        chain = _ifd_chain(buf, bo, ifd_offset, big)
        if not 0 <= overview < len(chain):
            raise ValueError(
                f"overview {overview} out of range (file has {len(chain) - 1})")
        ifd_offset = chain[overview]

    tags: dict[int, tuple[int, int, bytes]] = {}
    if big:
        (n_entries,) = struct.unpack(f"{bo}Q", buf[ifd_offset : ifd_offset + 8])
        p = ifd_offset + 8
        for _ in range(n_entries):
            tag, typ, count = struct.unpack(f"{bo}HHQ", buf[p : p + 12])
            tags[tag] = (typ, count, buf[p + 12 : p + 20])
            p += 20
    else:
        (n_entries,) = struct.unpack(f"{bo}H", buf[ifd_offset : ifd_offset + 2])
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
    bits_l = val(258, [8])
    comp = val(259, [1])[0]
    if comp not in _COMP_NAME:
        raise ValueError(f"unsupported TIFF compression {comp} "
                         f"(none/lzw/deflate/packbits/jpeg)")
    comp_name = _COMP_NAME[comp]
    jpeg_tables = bytes(val(347)) if (comp_name == "jpeg" and 347 in tags) \
        else None
    spp = val(277, [1])[0]
    if spp < 1:
        raise ValueError(f"bad SamplesPerPixel {spp}")
    planar = val(284, [1])[0]
    if planar not in (1, 2):
        raise ValueError(f"unsupported PlanarConfiguration {planar}")
    predictor = val(317, [1])[0]
    if predictor not in (1, 2, 3):
        raise ValueError(f"unsupported TIFF predictor {predictor}")
    fmt_l = val(339, [1])
    if len(set(bits_l)) != 1 or len(set(fmt_l)) != 1:
        raise ValueError(
            f"mixed per-band sample types unsupported ({bits_l}, {fmt_l})")
    bits, fmt = bits_l[0], fmt_l[0]
    key = (fmt, bits)
    if key not in _DTYPE_BY_FMT:
        raise ValueError(f"unsupported (SampleFormat, BitsPerSample) {key}")
    if predictor == 2 and fmt == 3:
        raise ValueError("Predictor=2 on float samples is unsupported")
    if predictor == 3 and fmt != 3:
        raise ValueError("Predictor=3 (floating-point) on integer samples "
                         "is unsupported")
    if comp_name == "jpeg":
        if (fmt, bits) != (1, 8):
            raise ValueError(
                f"JPEG-in-TIFF needs uint8 samples, file says {(fmt, bits)}")
        if predictor != 1:
            raise ValueError("Predictor with JPEG compression is invalid")
        if planar == 2 and spp > 1:
            raise ValueError("JPEG-in-TIFF planar configuration 2 unsupported")
    dtype = np.dtype(_DTYPE_BY_FMT[key]).newbyteorder(bo)
    native = dtype.newbyteorder("=")
    if window is None:
        r0, r1, c0, c1 = 0, h, 0, w
    else:
        r0, r1, c0, c1 = (int(v) for v in window)
        if not (0 <= r0 <= r1 <= h and 0 <= c0 <= c1 <= w):
            raise ValueError(f"window {window} outside raster {h}x{w}")
    # planar config 2 stores per-band planes band-major; chunky (1) stores
    # interleaved samples.  Each plane decodes with k interleaved samples:
    # k == spp for chunky, k == 1 per plane for planar.
    n_planes = spp if (planar == 2 and spp > 1) else 1
    k = spp // n_planes
    px = np.zeros((r1 - r0, c1 - c0, spp), dtype=native)
    if 322 in tags:  # tiled layout (the COG interior organization)
        tw = val(322)[0]
        tl = val(323)[0]
        offsets = val(324)
        counts = val(325)
        if tw <= 0 or tl <= 0 or not offsets:
            raise ValueError(f"bad tile layout ({tw}x{tl}, {offsets})")
        ta = max(1, -(-w // tw))
        td = max(1, -(-h // tl))
        if len(offsets) != ta * td * n_planes:
            raise ValueError(
                f"tile count {len(offsets)} != grid {ta}x{td}x{n_planes} "
                f"for {w}x{h}"
            )
        tile_bytes = tw * tl * k * dtype.itemsize
        # only tiles intersecting the window are read OR decompressed —
        # the tiles outside it are never touched (COG partial read)
        ty1 = min(td, -(-r1 // tl)) if r1 > r0 else r0 // tl
        tx1 = min(ta, -(-c1 // tw)) if c1 > c0 else c0 // tw
        for b in range(n_planes):
            for ty in range(r0 // tl, ty1):
                for tx in range(c0 // tw, tx1):
                    idx = b * ta * td + ty * ta + tx
                    o, n = offsets[idx], counts[idx]
                    if comp_name == "jpeg":
                        raw = _jpeg_expand(buf[o : o + n], jpeg_tables,
                                           tile_bytes)
                    else:
                        raw = _decompress(buf[o : o + n], comp_name,
                                          tile_bytes)
                    if predictor == 3:
                        # byte-plane layout: undo on the raw tile bytes,
                        # per TILE row, before interpreting the samples
                        t = _predict3_inverse(
                            np.frombuffer(raw, np.uint8)
                            .reshape(tl, tw * k * native.itemsize),
                            native, spp=k)
                    else:
                        t = np.frombuffer(raw, dtype=dtype).reshape(tl, tw * k)
                        t = t.astype(native)
                        if predictor == 2:
                            # differencing runs per TILE row (width tw) —
                            # undo on the whole tile before slicing
                            t = _predict2_inverse(t, spp=k)
                    t = t.reshape(tl, tw, k)
                    gr0, gr1 = max(r0, ty * tl), min(r1, ty * tl + tl)
                    gc0, gc1 = max(c0, tx * tw), min(c1, tx * tw + tw)
                    px[gr0 - r0 : gr1 - r0, gc0 - c0 : gc1 - c0,
                       b * k : (b + 1) * k] = \
                        t[gr0 - ty * tl : gr1 - ty * tl,
                          gc0 - tx * tw : gc1 - tx * tw]
    else:
        offsets = val(273)
        counts = val(279)
        if offsets is None or counts is None:
            raise ValueError("TIFF lacks both strip and tile offsets")
        rps = max(1, val(278, [h or 1])[0])
        spb = max(1, -(-h // rps))  # strips per plane (band-major order)
        if len(offsets) != spb * n_planes:
            raise ValueError(
                f"strip count {len(offsets)} != {spb}x{n_planes} for h={h}")
        row_bytes = w * k * (bits // 8)
        # only strips intersecting window rows are read or decompressed
        s0 = r0 // rps
        s1 = min(spb, -(-r1 // rps)) if r1 > r0 else s0
        for b in range(n_planes):
            parts = []
            for s in range(s0, s1):
                i = b * spb + s
                nrows = min(rps, h - s * rps)
                seg = buf[offsets[i] : offsets[i] + counts[i]]
                parts.append(
                    _jpeg_expand(seg, jpeg_tables, nrows * row_bytes)
                    if comp_name == "jpeg"
                    else _decompress(seg, comp_name, nrows * row_bytes))
            data = b"".join(parts)
            nrows_have = (len(data) // row_bytes) if row_bytes else 0
            if predictor == 3:
                # byte-plane layout: undo on raw full-width scanline bytes
                # (endian-independent on disk) before sample interpretation
                block = _predict3_inverse(
                    np.frombuffer(data, np.uint8)
                    .reshape(nrows_have, row_bytes),
                    native, spp=k) if nrows_have else \
                    np.zeros((0, w * k), dtype=native)
            else:
                block = np.frombuffer(data, dtype=dtype).reshape(
                    nrows_have, w * k)
                if bo == ">":
                    block = block.astype(native)
                if predictor == 2 and block.size:
                    # strip differencing is per full-width scanline — undo
                    # on the full-width rows BEFORE the column slice
                    block = _predict2_inverse(
                        np.ascontiguousarray(block), spp=k)
            block = block.reshape(nrows_have, w, k)
            px[:, :, b * k : (b + 1) * k] = \
                block[r0 - s0 * rps : r1 - s0 * rps, c0:c1]
    if spp == 1:
        px = px[:, :, 0]

    transform = None
    scale = val(33550)
    tiepoint = val(33922)
    if scale is not None and tiepoint is not None:
        sx, sy = scale[0], scale[1]
        i, j, _, x, y, _ = tiepoint[:6]
        # tiepoint maps raster (i, j) -> model (x, y); origin = offset back
        transform = (sx, 0.0, x - i * sx, 0.0, -sy, y + j * sy)
        if window is not None:
            # shift the origin to pixel (c0, r0) so the windowed raster
            # stays georeferenced (rasterio window-read semantics)
            a, b2, c2, d, e, f = transform
            transform = (a, b2, c2 + a * c0 + b2 * r0,
                         d, e, f + d * c0 + e * r0)

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


def tile_row_to_geotiff(row: dict, rows_per_strip: int = 64,
                        compression: str = "none", predictor: int = 1) -> bytes:
    """Engine tile-table row (tile schema: pixels/dtype/h/w/transform/crs/
    nodata) -> GeoTIFF bytes."""
    px = np.frombuffer(row["pixels"], dtype=row["dtype"]).reshape(row["h"], row["w"])
    return encode_geotiff(px, row["transform"], row["crs"] or "EPSG:4326",
                          row["nodata"], rows_per_strip,
                          compression=compression, predictor=predictor)


def geotiff_to_tile_rows(tif: bytes, tile_id: str,
                         dataset: str = "raster") -> list[dict]:
    """GeoTIFF bytes -> engine tile-table rows (raster_tiles schema), one
    row per band — multi-band files (RGB imagery, stacked indicators)
    explode into band-numbered single-band rows so every downstream raster
    stage keeps its (h, w) contract."""
    px, transform, crs, nodata = decode_geotiff(tif)
    if transform is None:
        raise ValueError("GeoTIFF lacks scale+tiepoint georeferencing")
    h, w = px.shape[:2]
    bnd = geo.raster_bounds(transform, h, w)
    planes = [px] if px.ndim == 2 else [
        np.ascontiguousarray(px[:, :, b]) for b in range(px.shape[2])]
    return [
        dict(
            dataset=dataset, statistic=None, depth_top_cm=None,
            depth_bottom_cm=None, tile_id=tile_id, band=b + 1, h=h, w=w,
            dtype=str(p.dtype), nodata=nodata, transform=list(transform),
            crs=crs, minx=bnd[0], miny=bnd[1], maxx=bnd[2], maxy=bnd[3],
            pixels=p.tobytes(),
        )
        for b, p in enumerate(planes)
    ]


def geotiff_to_tile_row(tif: bytes, tile_id: str, dataset: str = "raster") -> dict:
    """Single-band GeoTIFF bytes -> one engine tile-table row dict."""
    rows = geotiff_to_tile_rows(tif, tile_id, dataset)
    if len(rows) != 1:
        raise ValueError(
            f"geotiff_to_tile_row on a {len(rows)}-band file; use "
            "geotiff_to_tile_rows for multi-band imagery")
    return rows[0]
