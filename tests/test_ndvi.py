"""NDVI pipeline conformance: expected values recomputed with straight numpy
from the deterministic scene generator (the style of the reference's
statistical goldens, tests/raster/sentinel2/test_ndvi.py:27-108)."""

import numpy as np
import pytest

from demeter_ray.sources import fixtures as fx
from demeter_ray.stages.ndvi import ndvi_statistics


@pytest.fixture(scope="module")
def result(ray_session, tiny_fixtures):
    import ray.data

    ds = ray.data.read_parquet(f"{tiny_fixtures}/scene_tiles.parquet")
    return ndvi_statistics(ds)


def _expected_ndvi(zone_i: int, datatake_i: int) -> np.ma.MaskedArray:
    """Straight-numpy recomputation for one (zone, datatake): both tiles
    mosaicked side by side."""
    n = fx.SCENE_PX
    parts = []
    for tile_i in range(2):
        col = np.broadcast_to(np.arange(n, dtype=np.int64)[None, :], (n, n))
        row = np.broadcast_to(np.arange(n, dtype=np.int64)[:, None], (n, n))
        red = fx.scene_band_value(zone_i, tile_i, datatake_i, "red", col, row).astype(float)
        nir = fx.scene_band_value(zone_i, tile_i, datatake_i, "nir", col, row).astype(float)
        colh = np.broadcast_to(np.arange(n // 2, dtype=np.int64)[None, :], (n // 2, n // 2))
        rowh = np.broadcast_to(np.arange(n // 2, dtype=np.int64)[:, None], (n // 2, n // 2))
        scl = fx.scene_band_value(zone_i, tile_i, datatake_i, "scl", colh, rowh)
        scl10 = np.repeat(np.repeat(scl, 2, axis=0), 2, axis=1)
        mask = np.zeros((n, n), dtype=bool)
        mask[:, :2] = True  # detector footprint
        mask |= np.isin(scl10, fx.CLOUD_VALUES)  # cloud
        mask |= red == 0
        mask |= nir == 0
        red_r = np.ma.masked_array(red, mask) / 10000
        nir_r = np.ma.masked_array(nir, mask) / 10000
        parts.append((nir_r - red_r) / (nir_r + red_r))
    return np.ma.concatenate(parts, axis=1)


def test_shapes_and_statistics_present(result):
    assert set(result["utm_zone"]) == {"13N", "14N"}
    assert set(result["statistic"]) == {"mean", "min", "max", "stddev"}
    assert (result["h"] == fx.SCENE_PX).all()
    assert (result["w"] == 2 * fx.SCENE_PX).all()  # two tiles side by side


@pytest.mark.parametrize("zone_i,zone", [(0, "13N"), (1, "14N")])
def test_statistics_match_reference(result, zone_i, zone):
    stack = np.ma.stack([_expected_ndvi(zone_i, d) for d in range(3)])
    expected = {
        "mean": np.ma.mean(stack, axis=0),
        "min": np.ma.min(stack, axis=0),
        "max": np.ma.max(stack, axis=0),
    }
    expected["stddev"] = np.ma.sqrt(
        np.ma.mean((stack - expected["mean"][None]) ** 2, axis=0)
    )
    got_rows = result[result["utm_zone"] == zone].set_index("statistic")
    for stat, exp in expected.items():
        row = got_rows.loc[stat]
        got = np.frombuffer(row["pixels"], dtype=np.float32).reshape(row["h"], row["w"])
        exp32 = exp.filled(np.nan).astype(np.float32)
        np.testing.assert_allclose(got, exp32, rtol=1e-5, equal_nan=True)
        assert row["valid_px"] == int((~np.isnan(exp32)).sum())


def test_cloud_and_footprint_pixels_masked(result):
    mean13 = result[(result["utm_zone"] == "13N") & (result["statistic"] == "min")].iloc[0]
    got = np.frombuffer(mean13["pixels"], dtype=np.float32).reshape(mean13["h"], mean13["w"])
    # footprint columns (0,1) of each tile are fully masked in every datatake
    assert np.isnan(got[:, 0]).all() and np.isnan(got[:, 1]).all()
    # cloud blocks move per datatake, so across 3 datatakes those pixels are
    # masked in SOME but not all -> min still defined there
    assert np.isfinite(got[:, 16:]).any()


def test_sink_path_writes_lineage_not_pixels(ray_session, tiny_fixtures, tmp_path):
    """Scale path: stat rasters land in the partitioned sink inside the
    per-zone tasks; the driver frame has summaries only (no pixels), the
    summaries match the in-memory path, and a rerun resumes off lineage."""
    import ray.data

    from demeter_ray.state import lineage

    sink = str(tmp_path / "ndvi_sink")
    ds = ray.data.read_parquet(f"{tiny_fixtures}/scene_tiles.parquet")
    got = ndvi_statistics(ds, sink_dir=sink)
    assert "pixels" not in got.columns
    ref = ndvi_statistics(
        ray.data.read_parquet(f"{tiny_fixtures}/scene_tiles.parquet")
    )
    cols = ["utm_zone", "statistic", "h", "w", "valid_px", "mean_value"]
    np.testing.assert_array_equal(
        got[cols[:-1]].to_numpy(dtype=object), ref[cols[:-1]].to_numpy(dtype=object)
    )
    np.testing.assert_allclose(got["mean_value"], ref["mean_value"], rtol=1e-12)
    # every (zone, statistic) partition is complete with a valid checksum
    done = lineage.completed_keys(sink, verify_checksum=True)
    assert done == {
        f"{z}-{s}" for z in ("13N", "14N") for s in ("mean", "min", "max", "stddev")
    }
    # sink pixels equal the in-memory pixels
    part = lineage.read_partitioned(sink).to_pandas()
    for _, r in part.iterrows():
        exp = ref[(ref["utm_zone"] == r["utm_zone"])
                  & (ref["statistic"] == r["statistic"])].iloc[0]
        assert r["pixels"] == exp["pixels"]
    # rerun resumes: all zones skipped, summaries recovered from lineage
    again = ndvi_statistics(
        ray.data.read_parquet(f"{tiny_fixtures}/scene_tiles.parquet"),
        sink_dir=sink,
    )
    np.testing.assert_allclose(again["mean_value"], ref["mean_value"], rtol=1e-12)
    np.testing.assert_array_equal(again["valid_px"], ref["valid_px"])
