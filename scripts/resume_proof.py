"""Failure-injection resume proof for the lineage sink (VERDICT r4 item 1).

Demonstrates the north rule's resume-from-checkpoint posture end-to-end,
under REAL kills (SIGKILL, no cleanup) of both fault domains:

  1. baseline: scripts/job_entry.py runs the flagship pipeline to a
     partitioned lineage sink, uninterrupted; every part-*.parquet is
     sha256-hashed.
  2. interrupted: the same job (fresh output dir) is started as a
     subprocess; once lineage records start landing, one of ITS Ray worker
     processes is SIGKILLed (Ray must retry the lost task); after more
     partitions land, the DRIVER process itself is SIGKILLed mid-write.
  3. resume: the job is re-submitted on the same output dir.  The lineage
     manifest must show the already-completed partitions SKIPPED (not
     rewritten) and only the remainder computed.
  4. verdict: the resumed directory must be BIT-IDENTICAL (per-file sha256)
     to the uninterrupted baseline, and the union of skipped+written must
     cover every baseline partition exactly.

Run:  python scripts/resume_proof.py [--sf-dir /root/testdata/sf0.1]
Emits RESUME_PROOF.json (one JSON object) to the repo root and prints it.

Reference analog: the FileLock'd file-granular download caches
(/root/reference/demeter/raster/polaris.py:382-431) resume by skipping
files that already exist; here the unit is a lineage-verified partition.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _sha256_dir(out_dir: str) -> dict:
    """sha256 of every part-* data file (parquet + tif), sorted by name."""
    hashes = {}
    for fn in sorted(os.listdir(out_dir)):
        if fn.startswith("part-") and not fn.endswith(".tmp"):
            with open(os.path.join(out_dir, fn), "rb") as f:
                hashes[fn] = hashlib.sha256(f.read()).hexdigest()
    return hashes


def _descendants(pid: int) -> list[int]:
    """All descendant pids of ``pid`` via /proc (no psutil in this env)."""
    children: dict[int, list[int]] = {}
    for entry in os.listdir("/proc"):
        if not entry.isdigit():
            continue
        try:
            with open(f"/proc/{entry}/stat") as f:
                parts = f.read().split()
            children.setdefault(int(parts[3]), []).append(int(entry))
        except OSError:
            continue
    out, queue = [], [pid]
    while queue:
        p = queue.pop()
        for c in children.get(p, []):
            out.append(c)
            queue.append(c)
    return out


def _worker_pids(job_pid: int) -> list[int]:
    """Ray data-plane worker pids among the job's descendants (cmdline
    contains 'ray::' once a task/actor is running).  Busy workers (actively
    named after a task, not 'ray::IDLE') sort first — killing one of those
    is the interesting fault."""
    busy, idle = [], []
    for p in _descendants(job_pid):
        try:
            with open(f"/proc/{p}/cmdline", "rb") as f:
                cmd = f.read().replace(b"\x00", b" ").decode(errors="replace")
        except OSError:
            continue
        if "ray::" in cmd:
            (idle if "IDLE" in cmd else busy).append(p)
    return busy + idle


def _n_lineage(out_dir: str) -> int:
    ldir = os.path.join(out_dir, "_lineage")
    if not os.path.isdir(ldir):
        return 0
    return sum(1 for f in os.listdir(ldir) if f.endswith(".json"))


def _run_job(sf_dir: str, out: str, num_cpus: int, source: str, replicate: int):
    cmd = [sys.executable, os.path.join(REPO, "scripts", "job_entry.py"),
           "--sf-dir", sf_dir, "--out", out, "--num-cpus", str(num_cpus),
           "--source", source, "--replicate", str(replicate)]
    env = dict(os.environ, RAY_ADDRESS="local")
    return subprocess.Popen(cmd, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
                            text=True, env=env)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--num-cpus", type=int, default=16)
    ap.add_argument("--source", default="events")
    ap.add_argument("--replicate", type=int, default=1)
    ap.add_argument("--scratch", default="/tmp/resume_proof")
    args = ap.parse_args()

    import shutil

    shutil.rmtree(args.scratch, ignore_errors=True)
    base_out = os.path.join(args.scratch, "baseline")
    kill_out = os.path.join(args.scratch, "interrupted")
    report: dict = {"sf_dir": args.sf_dir, "source": args.source,
                    "num_cpus": args.num_cpus, "replicate": args.replicate}

    # ---- 1. uninterrupted baseline
    t0 = time.perf_counter()
    p = _run_job(args.sf_dir, base_out, args.num_cpus, args.source, args.replicate)
    out, _ = p.communicate()
    assert p.returncode == 0, f"baseline job failed rc={p.returncode}"
    base_metrics = json.loads(out.strip().splitlines()[-1])
    base_hashes = _sha256_dir(base_out)
    report["baseline"] = {**base_metrics, "sec": round(time.perf_counter() - t0, 2),
                          "n_files": len(base_hashes)}
    n_parts = base_metrics["partitions_written"]
    assert n_parts >= 4, f"need >=4 partitions for a mid-write kill, got {n_parts}"

    # ---- 2. interrupted run: SIGKILL a worker, then the driver, mid-write
    p = _run_job(args.sf_dir, kill_out, args.num_cpus, args.source, args.replicate)
    deadline = time.time() + 600
    while _n_lineage(kill_out) < 1 and time.time() < deadline:
        if p.poll() is not None:
            raise SystemExit("job finished before any kill — workload too small")
        time.sleep(0.05)
    # kill one Ray worker of THIS job (task retry must absorb it)
    victims = _worker_pids(p.pid)
    worker_killed = None
    if victims:
        worker_killed = victims[0]
        os.kill(worker_killed, signal.SIGKILL)
    report["worker_killed"] = worker_killed
    # let more partitions land, then SIGKILL the driver between partitions
    target = max(2, n_parts // 3)
    while _n_lineage(kill_out) < target and time.time() < deadline:
        if p.poll() is not None:
            break
        time.sleep(0.05)
    if p.poll() is None:
        os.kill(p.pid, signal.SIGKILL)
        p.wait()
        driver_killed = True
    else:
        driver_killed = False  # raced to completion; resume still must skip
    done_before_resume = _n_lineage(kill_out)
    report["driver_killed"] = driver_killed
    report["partitions_before_resume"] = done_before_resume
    assert done_before_resume < n_parts or not driver_killed, (
        "kill landed after all partitions completed — no resume to prove")
    time.sleep(5.0)  # let the killed job's ray session tear down

    # ---- 3. resume on the same output dir
    t0 = time.perf_counter()
    p = _run_job(args.sf_dir, kill_out, args.num_cpus, args.source, args.replicate)
    out, _ = p.communicate()
    assert p.returncode == 0, f"resume job failed rc={p.returncode}"
    resume_metrics = json.loads(out.strip().splitlines()[-1])
    report["resume"] = {**resume_metrics, "sec": round(time.perf_counter() - t0, 2)}
    assert resume_metrics["partitions_skipped"] > 0, "resume skipped nothing"
    assert (resume_metrics["partitions_skipped"]
            + resume_metrics["partitions_written"]) == n_parts

    # ---- 4. bit-identical verdict
    kill_hashes = _sha256_dir(kill_out)
    identical = kill_hashes == base_hashes
    report["files_compared"] = len(base_hashes)
    report["bit_identical"] = identical
    assert identical, {
        k: (base_hashes.get(k), kill_hashes.get(k))
        for k in set(base_hashes) ^ set(kill_hashes)
        | {k for k in base_hashes if kill_hashes.get(k) != base_hashes[k]}
    }
    report["verdict"] = "PASS"
    with open(os.path.join(REPO, "RESUME_PROOF.json"), "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
