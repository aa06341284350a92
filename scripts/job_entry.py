"""Ray-job entrypoint: the flagship pipeline as a submitted job with a
resumable partitioned sink.

On a real cluster (the north rule's deployment shape):

    ray job submit --working-dir /root/repo -- \
        python scripts/job_entry.py --sf-dir s3://bucket/sfX --out s3://bucket/out

In this sandbox (no dashboard/job server) run it directly:

    python scripts/job_entry.py --sf-dir /root/testdata/sf0.001 --out /tmp/job_out

The job:
  1. connects to the cluster Ray (`address="auto"` under `ray job submit`,
     local otherwise) — the entrypoint, not the library, owns the session;
  2. runs the flagship image pipeline (encode -> decode-verify with the
     PSNR/caption invariant -> fused cell/PIP/kNN/raster enrichment);
  3. writes the enriched rows through the lineage sink partitioned by cell
     prefix — one atomic parquet + lineage record per partition, so a
     re-submitted job SKIPS finished partitions (resume-from-checkpoint);
  4. prints one JSON metrics line (rows, partitions written/skipped, secs).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.001"))
    ap.add_argument("--out", required=True)
    ap.add_argument("--num-cpus", type=int, default=None,
                    help="local-mode CPU count; ignored when a cluster address exists")
    ap.add_argument("--source", default="documents",
                    help="driver table streamed into the image schema")
    ap.add_argument("--key", default=None,
                    help="id column of --source (default <source-singular>_id)")
    ap.add_argument("--replicate", type=int, default=1,
                    help="images per source row (scales the job)")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        if os.environ.get("RAY_ADDRESS") not in (None, "", "local"):
            ray.init(address="auto")  # submitted job: join the cluster
        else:
            ray.init(address="local", num_cpus=args.num_cpus or 8,
                     include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import demeter_ray

    demeter_ray.ship_code_to_workers()
    from demeter_ray.pipelines import flagship
    from demeter_ray.state import lineage

    t0 = time.perf_counter()
    key = args.key or {"documents": "doc_id", "events": "event_id"}.get(
        args.source, f"{args.source.rstrip('s')}_id")
    ds = flagship.entry_pipeline(args.sf_dir, source=args.source, key=key,
                                 replicate=args.replicate)

    def part_key(batch):
        # salted partition key: the fixture geography piles into one hot
        # cell prefix, so the sink partitions on (prefix, salt) — the same
        # skew treatment the enrichment stage applies
        batch["part_key"] = batch["cell_prefix"] * 16 + batch["salt"]
        return batch

    ds = ds.map_batches(part_key, batch_format="pandas")
    manifest = lineage.write_partitioned(ds, args.out, "part_key")
    dt = time.perf_counter() - t0
    written = manifest[~manifest["skipped"]]
    print(json.dumps({
        "metric": "flagship job",
        "sf_dir": args.sf_dir,
        "out": args.out,
        "rows_written": int(written["rows"].sum()),
        "bytes_written": int(written["bytes"].sum()),
        "partitions_written": int((~manifest["skipped"]).sum()),
        "partitions_skipped": int(manifest["skipped"].sum()),
        "sec": round(dt, 3),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
