"""Training-chip extraction: the chip BYTES (the actual product — the
driver oracle only hashes the stats columns) against a direct numpy slice,
plus edge semantics at the raster border."""

import numpy as np
import pyarrow as pa
import pytest

from demeter_ray.pipelines.oracle_spatial import (
    _RES,
    ChipActor,
    _chip_raster_ref,
    derive_lat,
    derive_lon,
)


@pytest.fixture
def actor(ray_session):
    return ChipActor(_chip_raster_ref())


def _expected_chip(val_e1, crow, ccol):
    chips = np.full((4, 4), np.nan)
    for i, dr in enumerate(range(-1, 3)):
        for j, dc in enumerate(range(-1, 3)):
            r, c = crow + dr, ccol + dc
            if 0 <= r < 320 and 0 <= c < 320:
                chips[i, j] = val_e1[r, c] / 10.0
    return chips


def test_chip_bytes_match_direct_slice(actor):
    gcol = np.arange(320, dtype=np.int64)[None, :]
    grow = np.arange(320, dtype=np.int64)[:, None]
    val_e1 = (gcol * 31 + grow * 17) % 1000

    keys = np.array([1, 2, 3, 17, 123], dtype=np.int64)
    batch = pa.table(
        {
            "c_custkey": pa.array(keys, pa.int64()),
            "lon": pa.array(derive_lon(keys), pa.float64()),
            "lat": pa.array(derive_lat(keys), pa.float64()),
        }
    )
    out = actor(batch)
    assert out.num_rows == len(keys)  # derived points are inside the raster
    for i in range(out.num_rows):
        crow = out["crow"][i].as_py()
        ccol = out["ccol"][i].as_py()
        chip = np.frombuffer(out["chip"][i].as_py(), dtype=np.float64).reshape(4, 4)
        exp = _expected_chip(val_e1, crow, ccol)
        np.testing.assert_array_equal(np.isnan(chip), np.isnan(exp))
        np.testing.assert_allclose(chip[~np.isnan(chip)], exp[~np.isnan(exp)])
        # stats columns agree with the bytes
        assert out["n_px"][i].as_py() == int((~np.isnan(exp)).sum())
        s = int(np.round(np.nansum(exp) * 10))
        assert out["chip_sum_e1"][i].as_py() == s


def test_chip_border_pads_nan_and_outside_points_drop(actor):
    # anchor at the raster corner: window cells off-raster are NaN
    batch = pa.table(
        {
            "c_custkey": pa.array([7, 8], pa.int64()),
            "lon": pa.array([-102.2, -50.0], pa.float64()),  # corner; far outside
            "lat": pa.array([36.5 - 1e-9, 36.2], pa.float64()),
        }
    )
    out = actor(batch)
    assert out.num_rows == 1  # outside point dropped (inner semantics)
    chip = np.frombuffer(out["chip"][0].as_py(), dtype=np.float64).reshape(4, 4)
    assert np.isnan(chip[0]).all() and np.isnan(chip[:, 0]).all()  # padded edge
    assert out["n_px"][0].as_py() == 9
