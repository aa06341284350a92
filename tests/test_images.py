"""Image kernel unit tests."""

import numpy as np


def test_dhash56_planted_duplicates():
    """doc_id and doc_id+256 render identical pixels under the generator, so
    their integer dHashes must collide; neighbours must differ."""
    from demeter_ray.functions import codec

    ids = np.array([0, 256, 1, 257, 2, 3], dtype=np.int64)
    px = codec.generate_pixels_batch(ids, 16, 16)
    h = codec.dhash56_batch(px)
    assert h[0] == h[1] and h[2] == h[3]
    assert h[0] != h[2] or h[0] != h[4]  # generator varies across offsets
    assert (h >= 0).all() and (h < (1 << 56)).all()
