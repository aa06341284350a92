"""Shapefile (.shp/.shx/.dbf) + GeoJSON vector codec tests.

The roundtrip contract: for canonical WKB (outer rings CCW, holes CW —
the RFC 7946 winding the engine's geometry kernel emits),
decode(encode(x)) is BYTE-IDENTICAL, and dbf attributes round-trip
bit-exact including float64 payloads.
"""

import json
import struct

import numpy as np
import pyarrow as pa
import pytest

from demeter_ray.functions import geo, shp

OUTER = np.array([(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0)])
HOLE = np.array([(4.0, 4.0), (4.0, 6.0), (6.0, 6.0), (6.0, 4.0)])  # CW


def _fields_table():
    polys = {
        1: OUTER,
        2: OUTER + 20.0,
        3: np.array([(-102.15, 36.05), (-102.05, 36.06),
                     (-102.04, 36.16), (-102.16, 36.15)]),
    }
    wkbs = [geo.wkb_from_rings([v]) for v in polys.values()]
    return pa.table({
        "mukey": pa.array(list(polys), pa.int64()),
        "fname": pa.array([f"field_{i}" for i in polys], pa.string()),
        "area_w": pa.array([1.5, float(np.pi), -1e300], pa.float64()),
        "geom_wkb": pa.array(wkbs, pa.binary()),
    })


def test_polygon_shapefile_bit_exact_roundtrip():
    tbl = _fields_table()
    files = shp.encode_shapefile(tbl)
    back = shp.decode_shapefile(files["shp"], files["dbf"])
    assert back.column_names == tbl.column_names
    for c in tbl.column_names:
        assert back[c].to_pylist() == tbl[c].to_pylist(), c


def test_shp_header_fields():
    files = shp.encode_shapefile(_fields_table())
    buf = files["shp"]
    assert struct.unpack_from(">I", buf, 0)[0] == 9994
    assert struct.unpack_from(">I", buf, 24)[0] * 2 == len(buf)
    version, stype = struct.unpack_from("<II", buf, 28)
    assert (version, stype) == (1000, shp.POLYGON)
    bb = struct.unpack_from("<4d", buf, 36)
    assert bb == (-102.16, 0.0, 30.0, 36.16)
    # .shx carries one (offset, length) pair per record
    shx = files["shx"]
    assert (len(shx) - 100) // 8 == 3
    off0, len0 = struct.unpack_from(">II", shx, 100)
    assert off0 == 50  # words: first record right after the header


def test_ring_winding_in_file_and_back():
    # file convention: outer CW, holes CCW; canonical WKB: outer CCW/hole CW
    w = geo.wkb_from_rings([OUTER, HOLE])
    s, _ = shp.encode_shp([w])
    n_parts, n_pts = struct.unpack_from("<II", s, 100 + 8 + 36)
    assert (n_parts, n_pts) == (2, 10)
    pts = np.frombuffer(s, "<f8", count=n_pts * 2,
                        offset=100 + 8 + 44 + 8).reshape(n_pts, 2)
    assert shp._signed_area(pts[:5]) < 0  # outer ring CW in the file
    assert shp._signed_area(pts[5:]) > 0  # hole CCW in the file
    assert shp.decode_shp(s)[0] == w  # and back, bit-exact


def test_polygon_hole_pip_semantics():
    w = geo.wkb_from_rings([OUTER, HOLE])
    s, _ = shp.encode_shp([w])
    polys = geo.parse_wkb(shp.decode_shp(s)[0])
    assert not geo.points_in_polygon(np.array([5.0]), np.array([5.0]), polys)[0]
    assert geo.points_in_polygon(np.array([2.0]), np.array([2.0]), polys)[0]


def test_multipolygon_record_roundtrip():
    mp = geo.wkb_from_polygons([[OUTER, HOLE], [OUTER + 20.0]])
    s, _ = shp.encode_shp([mp])
    assert shp.decode_shp(s)[0] == mp


def test_hole_attachment_to_containing_outer():
    # two outers, one hole inside the SECOND: decode must attach it there
    mp = geo.wkb_from_polygons([[OUTER], [OUTER + 20.0, HOLE + 20.0]])
    s, _ = shp.encode_shp([mp])
    assert shp.decode_shp(s)[0] == mp


def test_point_null_and_polyline_records():
    pts = [shp.wkb_point(1.5, -2.25), None, shp.wkb_point(0.0, 0.0)]
    s, _ = shp.encode_shp(pts)
    assert shp.decode_shp(s) == pts
    line = shp.wkb_linestring([(0.0, 0.0), (1.0, 1.0), (2.0, 0.0)])
    s, _ = shp.encode_shp([line])
    assert shp.decode_shp(s) == [line]
    two = [shp.wkb_linestring([(0.0, 0.0), (1.0, 0.0)]),
           shp.wkb_linestring([(5.0, 5.0), (6.0, 6.0), (7.0, 5.0)])]
    multi = struct.pack("<BII", 1, 5, 2) + b"".join(two)
    s, _ = shp.encode_shp([multi])
    assert shp.decode_shp(s) == [multi]


def test_mixed_geometry_types_fail_loud():
    with pytest.raises(ValueError, match="homogeneous"):
        shp.encode_shp([shp.wkb_point(0.0, 0.0),
                        geo.wkb_from_rings([OUTER])])


def test_malformed_shp_fail_loud():
    files = shp.encode_shapefile(_fields_table())
    good = files["shp"]
    with pytest.raises(ValueError, match="truncated"):
        shp.decode_shp(good[:50])
    with pytest.raises(ValueError, match="not a shapefile"):
        shp.decode_shp(b"\x00" * 100)
    with pytest.raises(ValueError, match="length field"):
        shp.decode_shp(good + b"\x00\x00")


def test_dbf_types_nulls_and_limits():
    t = pa.table({"a": pa.array([1, None, 3], pa.int64()),
                  "b": pa.array([None, 2.5, -1e300], pa.float64()),
                  "c": pa.array(["x", "yy", None], pa.string()),
                  "d": pa.array([True, False, None], pa.bool_())})
    back = shp.decode_dbf(shp.encode_dbf(t))
    assert back["a"].to_pylist() == [1, None, 3]
    assert back["b"].to_pylist() == [None, 2.5, -1e300]  # %.17g bit-exact
    assert back["c"].to_pylist() == ["x", "yy", ""]  # dbf has no C null
    assert back["d"].to_pylist() == [True, False, None]
    with pytest.raises(ValueError, match="10 bytes"):
        shp.encode_dbf(pa.table({"a_very_long_name": pa.array([1])}))
    with pytest.raises(ValueError, match="not a dBase"):
        shp.decode_dbf(b"\xff" * 64)


def test_dbf_record_count_mismatch_fails():
    tbl = _fields_table()
    files = shp.encode_shapefile(tbl)
    short = shp.encode_dbf(tbl.drop_columns(["geom_wkb"]).slice(0, 2))
    with pytest.raises(ValueError, match="records"):
        shp.decode_shapefile(files["shp"], short)


def test_geojson_bit_exact_roundtrip():
    tbl = _fields_table()
    txt = shp.table_to_geojson(tbl)
    back = shp.geojson_to_table(txt)
    for c in tbl.column_names:
        assert back[c].to_pylist() == tbl[c].to_pylist(), c


def test_geojson_geometry_variants():
    gj = json.dumps({"type": "FeatureCollection", "features": [
        {"type": "Feature", "properties": {"k": 1},
         "geometry": {"type": "Point", "coordinates": [1.5, 2.5]}},
        {"type": "Feature", "properties": {"k": 2, "extra": "x"},
         "geometry": {"type": "MultiPolygon", "coordinates":
                      [[OUTER.tolist() + [OUTER[0].tolist()]],
                       [(OUTER + 20.0).tolist()
                        + [(OUTER[0] + 20.0).tolist()]]]}},
        {"type": "Feature", "properties": {"k": 3}, "geometry": None},
    ]})
    t = shp.geojson_to_table(gj)
    assert t["k"].to_pylist() == [1, 2, 3]
    assert t["extra"].to_pylist() == [None, "x", None]
    assert t["geom_wkb"][0].as_py() == shp.wkb_point(1.5, 2.5)
    assert t["geom_wkb"][2].as_py() is None
    # bare geometry + single feature forms also parse
    assert shp.geojson_to_table(
        json.dumps({"type": "Point", "coordinates": [0.0, 1.0]})
    )["geom_wkb"][0].as_py() == shp.wkb_point(0.0, 1.0)
    with pytest.raises(ValueError, match="unsupported GeoJSON"):
        shp.geojson_to_table(json.dumps(
            {"type": "GeometryCollection", "geometries": []}))


def test_foreign_winding_normalizes():
    # a foreign writer emitting an ALREADY-CW outer ring (non-canonical
    # WKB) still encodes correctly and decodes to canonical CCW
    cw_ring = np.vstack([OUTER[::-1], OUTER[::-1][:1]])  # closed, CW
    s, _ = shp.encode_shp([geo.wkb_from_rings([cw_ring])])
    out = shp.decode_shp(s)[0]
    # reversal preserves the start vertex of a closed ring
    assert out == geo.wkb_from_rings([cw_ring[::-1]])  # canonical CCW
    ring = geo.parse_wkb(out)[0][0]
    assert shp._signed_area(ring) > 0


def test_zipped_shapefile_roundtrip_and_determinism():
    tbl = _fields_table()
    z1 = shp.encode_shapefile_zip(tbl, name="fields")
    z2 = shp.encode_shapefile_zip(tbl, name="fields")
    assert z1 == z2  # fixed timestamps: byte-deterministic archives
    back = shp.decode_shapefile_zip(z1)
    for c in tbl.column_names:
        assert back[c].to_pylist() == tbl[c].to_pylist(), c
    assert shp.decode_shapefile_zip(z1, layer="fields").num_rows == 3
    with pytest.raises(ValueError, match="exactly one"):
        shp.decode_shapefile_zip(z1, layer="nope")


def test_read_geojsonl_source(ray_session, tmp_path):
    from demeter_ray.sources.tables import read_geojsonl
    tbl = _fields_table()
    fc = json.loads(shp.table_to_geojson(tbl))
    p = tmp_path / "fields.geojsonl"
    p.write_text("\n".join(json.dumps(f) for f in fc["features"]) + "\n")
    out = read_geojsonl(str(p)).to_pandas()
    assert len(out) == 3
    got = out.sort_values("mukey").reset_index(drop=True)
    assert got["mukey"].tolist() == tbl["mukey"].to_pylist()
    assert got["geom_wkb"].tolist() == tbl["geom_wkb"].to_pylist()


def test_wkb_quad_polygons_vectorized_equivalence():
    rng = np.random.default_rng(3)
    x0 = rng.normal(size=200)
    y0 = rng.normal(size=200)
    x1 = x0 + np.abs(rng.normal(size=200))
    y1 = y0 + np.abs(rng.normal(size=200))
    arr = geo.wkb_quad_polygons(x0, y0, x1, y1)
    want = [geo.wkb_from_rings([np.array(
        [[x0[i], y0[i]], [x1[i], y0[i]], [x1[i], y1[i]], [x0[i], y1[i]]])])
        for i in range(200)]
    assert arr.to_pylist() == want  # byte-identical to the scalar builder
    bb = geo.quad_wkb_bounds(arr)
    np.testing.assert_array_equal(bb[:, 0], x0)
    np.testing.assert_array_equal(bb[:, 1], y0)
    np.testing.assert_array_equal(bb[:, 2], x1)
    np.testing.assert_array_equal(bb[:, 3], y1)
    # empty input is total
    assert len(geo.wkb_quad_polygons([], [], [], [])) == 0
    assert geo.quad_wkb_bounds(geo.wkb_quad_polygons([], [], [], [])).shape \
        == (0, 4)
    # any single-ring 5-point polygon gets exact bounds (min/max over the
    # ring), not just axis-aligned quads
    sq = geo.quad_wkb_bounds(pa.array([geo.wkb_from_rings([OUTER])]))
    np.testing.assert_array_equal(sq[0], [0.0, 0.0, 10.0, 10.0])
    # other vertex counts / multi-ring records decline the fast path
    tri = geo.wkb_from_rings([np.array([[0.0, 0.0], [1.0, 0.0], [0.5, 1.0]])])
    assert geo.quad_wkb_bounds(pa.array([want[0], tri], pa.binary())) is None
    holed = geo.wkb_from_rings([OUTER, HOLE])
    assert geo.quad_wkb_bounds(pa.array([holed], pa.binary())) is None
    withnull = pa.array([want[0], None], pa.binary())
    assert geo.quad_wkb_bounds(withnull) is None
    # sliced (offset != 0) columns still read the right records
    bb2 = geo.quad_wkb_bounds(arr.slice(50, 100))
    np.testing.assert_array_equal(bb2[:, 0], x0[50:150])


def test_dbf_truncation_fails_loud_everywhere():
    d = shp.encode_dbf(pa.table({"a": pa.array([1, 2, 3], pa.int64())}))
    for cut in (10, 33, 40, len(d) - 2):
        with pytest.raises(ValueError):
            shp.decode_dbf(d[:cut])
    # trailing EOF byte is optional in the wild
    assert shp.decode_dbf(d[:-1])["a"].to_pylist() == [1, 2, 3]
