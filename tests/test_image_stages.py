"""Image transform stages: resize/crop math, feature extraction, frame
sampling, and the Ray actor-pool plumbing (binary in, features out)."""

import numpy as np
import pytest

from demeter_ray.functions import codec
from demeter_ray.stages.images import (
    center_crop,
    image_features,
    resize_bilinear,
    sample_frames,
    transform_images,
)


def test_resize_preserves_constant_and_interpolates():
    flat = np.full((8, 8, 3), 100, dtype=np.uint8)
    out = resize_bilinear(flat, 4, 4)
    assert out.shape == (4, 4, 3)
    np.testing.assert_array_equal(out, 100)
    # horizontal gradient stays monotonic after downscale
    grad = np.tile(np.arange(0, 256, 16, dtype=np.uint8)[None, :, None], (16, 1, 3))
    out = resize_bilinear(grad, 8, 8)
    row = out[0, :, 0].astype(int)
    assert (np.diff(row) >= 0).all() and row[0] < row[-1]
    # identity size returns same values
    np.testing.assert_array_equal(resize_bilinear(grad, 16, 16), grad)


def test_center_crop():
    px = np.arange(6 * 6 * 1, dtype=np.uint8).reshape(6, 6, 1)
    out = center_crop(px, 2, 2)
    np.testing.assert_array_equal(out[:, :, 0], [[14, 15], [20, 21]])


def test_image_features_shape_and_determinism():
    px = codec.generate_pixels(5, 32, 32)
    f1 = image_features(px)
    f2 = image_features(px)
    assert f1.shape == (3 * 8 + 2,)
    np.testing.assert_array_equal(f1, f2)
    assert abs(f1[:8].sum() - 1.0) < 1e-9  # per-channel histogram normalized


def test_sample_frames():
    frames_in = [codec.generate_pixels(i, 8, 8) for i in range(6)]
    blob = b"".join(codec.encode(f, "png") for f in frames_in)
    out = sample_frames(blob, every=2)
    assert len(out) == 3
    np.testing.assert_array_equal(out[0], frames_in[0])
    np.testing.assert_array_equal(out[1], frames_in[2])
    np.testing.assert_array_equal(out[2], frames_in[4])
    # stride 1 returns everything
    assert len(sample_frames(blob, every=1)) == 6


def test_transform_images_ray(ray_session, tiny_fixtures):
    from demeter_ray.sources.tables import read_images

    ds = read_images(f"{tiny_fixtures}/images.parquet")
    out = transform_images(ds, out_size=16, crop=12, concurrency=2).to_pandas()
    assert len(out) == 60
    assert "bytes" not in out.columns
    feats = np.array(out["features"].tolist())
    assert feats.shape == (60, 26)
    # thumbnails decode to the crop size
    thumb = codec.decode(out.iloc[0]["thumb"])
    assert thumb.shape == (12, 12, 3)
    # features deterministic across runs
    out2 = transform_images(read_images(f"{tiny_fixtures}/images.parquet"),
                            out_size=16, crop=12, concurrency=2).to_pandas()
    a = out.sort_values("image_id")["features"].tolist()
    b = out2.sort_values("image_id")["features"].tolist()
    np.testing.assert_array_equal(np.array(a), np.array(b))


def test_pip_join_all_mode(ray_session, tiny_fixtures):
    """mode='all' emits one row per (point, polygon) containment pair —
    the one-to-many spatial join (J8 clip semantics)."""
    import pyarrow.parquet as pq

    from demeter_ray.sources.tables import read_images
    from demeter_ray.stages import pip

    fields = pq.read_table(f"{tiny_fixtures}/fields.parquet")
    ds = read_images(f"{tiny_fixtures}/images.parquet").drop_columns(["bytes"])
    pairs = pip.pip_join(ds, fields, mode="all", concurrency=2).to_pandas()
    single = pip.pip_join(ds, fields, mode="min", concurrency=2).to_pandas()
    matched = single["map_unit_key"].notna().sum()
    assert len(pairs) >= matched  # overlaps can produce extra pairs
    assert pairs["map_unit_key"].notna().all()
