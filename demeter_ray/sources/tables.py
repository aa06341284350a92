"""Table readers.

``read_table`` loads one of the driver's TPC-H-ish parquet tables as a
``ray.data.Dataset`` with column pruning pushed to the read (SURVEY.md §2.1
S11: prune at the read — a read that loads all columns for a 2-column
transform is wrong).

``read_images`` reads the image+caption table per BASELINE.json input_hint:
Lance if the format/reader is available, parquet fallback otherwise (the
sandbox ships no lance wheel, so parquet is the tested path; the Lance branch
is the documented production path).
"""

from __future__ import annotations

import os

import ray.data


def read_table(sf_dir: str, name: str, columns=None) -> ray.data.Dataset:
    path = os.path.join(sf_dir, f"{name}.parquet")
    return ray.data.read_parquet(path, columns=columns)


def read_images(path: str, columns=None) -> ray.data.Dataset:
    """Image+caption table: (image_id, bytes, w, h, fmt, caption, phash[, lon, lat]).

    Prefers Lance (``ray.data.read_lance``) when the dataset dir and reader
    exist; falls back to parquet. Binary payload rows are wide — callers
    should keep ``batch_size`` small on decode stages (SURVEY.md §7.5).
    """
    if path.endswith(".lance") and hasattr(ray.data, "read_lance"):
        try:
            return ray.data.read_lance(path, columns=columns)
        except Exception:
            pass
    return ray.data.read_parquet(path, columns=columns)
