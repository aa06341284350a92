"""Edge-input sweeps over the full query registry.

Modes (composable; default: all):
  --empty          every table zero rows (schema kept)
  --partial        one table emptied at a time, the rest populated
  --head N         every table truncated to its first N rows, compared
                   against the DuckDB oracle (catches wrong answers at
                   degenerate cardinalities, not just crashes)

Rationale: Ray drops schemas when every block is empty and SQL null
semantics diverge from numpy at n∈{0,1} — both classes bit us; this
sweep is the regression net (see BASELINE.md ledger).

Usage: python scripts/sweep_edges.py [--src /root/testdata/sf0.001]
                                     [--empty] [--partial] [--head N]
"""

from __future__ import annotations

import argparse
import os
import shutil
import subprocess
import sys
import tempfile
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()


def _build_dir(src: str, empty: set, head: int | None) -> str:
    import pyarrow.parquet as pq

    d = tempfile.mkdtemp(prefix="sweep_")
    for t in TABLES:
        tbl = pq.read_table(f"{src}/{t}.parquet")
        if t in empty:
            tbl = tbl.slice(0, 0)
        elif head is not None:
            tbl = tbl.slice(0, head)
        pq.write_table(tbl, f"{d}/{t}.parquet")
    return d


def _run_registry(d: str, label: str) -> int:
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__ray_entry__", os.path.join(REPO, "__ray_entry__.py"))
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    qs = m.queries()
    bad = 0
    for name in sorted(qs):
        try:
            r = qs[name](d)
            r.to_pandas() if hasattr(r, "to_pandas") else r
        except Exception as e:
            bad += 1
            tb = traceback.extract_tb(sys.exc_info()[2])
            site = [f for f in tb if REPO in f.filename]
            loc = (f"{site[-1].filename.replace(REPO + '/', '')}:"
                   f"{site[-1].lineno}") if site else "?"
            print(f"CRASH [{label}] {name}: {type(e).__name__}: "
                  f"{str(e)[:70]} @ {loc}", flush=True)
    print(f"SUMMARY {label}: {len(qs) - bad} ok / {bad} crash", flush=True)
    return bad


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.001")
    ap.add_argument("--empty", action="store_true")
    ap.add_argument("--partial", action="store_true")
    ap.add_argument("--head", type=int, default=None)
    args = ap.parse_args()
    run_all = not (args.empty or args.partial or args.head is not None)

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import demeter_ray

    demeter_ray.ship_code_to_workers()

    failures = 0
    dirs = []
    try:
        if run_all or args.empty:
            d = _build_dir(args.src, set(TABLES), None)
            dirs.append(d)
            failures += _run_registry(d, "all-empty")
        if run_all or args.partial:
            for t in ("events", "lineitem", "documents", "embeddings",
                      "region", "orders"):
                d = _build_dir(args.src, {t}, None)
                dirs.append(d)
                failures += _run_registry(d, f"empty-{t}")
        heads = ([args.head] if args.head is not None
                 else ([1, 7] if run_all else []))
        for n in heads:
            d = _build_dir(args.src, set(), n)
            dirs.append(d)
            # oracle comparison, not just crash-check: the truncated dir
            # feeds check_oracle so DuckDB recomputes on identical inputs
            rc = subprocess.run(
                [sys.executable, os.path.join(REPO, "scripts/check_oracle.py"), d],
                capture_output=True, text=True)
            tail = rc.stdout.strip().splitlines()
            for line in tail:
                if line.startswith("FAIL"):
                    print(f"[head{n}] {line}", flush=True)
                    failures += 1
            if rc.returncode != 0:
                # a crashed oracle harness is a gate failure, not a pass
                failures += 1
                print(f"[head{n}] check_oracle exited {rc.returncode}: "
                      f"{rc.stderr.strip().splitlines()[-1] if rc.stderr.strip() else ''}",
                      flush=True)
            print(f"SUMMARY head{n}: {tail[-1] if tail else 'no output'}",
                  flush=True)
    finally:
        for d in dirs:
            shutil.rmtree(d, ignore_errors=True)
    ray.shutdown()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
