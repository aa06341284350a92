"""Actor-pool sizing.

Fixed-size pools are required for throughput on this build (autoscaling
pools stall at 2-3 actors — BASELINE.md ledger), but a fixed pool that
claims EVERY cpu starves the upstream read/repartition tasks feeding it and
the pipeline deadlocks (observed on 4-cpu test sessions).  ``fitted_pool``
caps the requested pool at cluster CPUs minus headroom so the producer side
always has a core to run on."""

from __future__ import annotations

import ray

_HEADROOM = 1


def fitted_pool(requested: int) -> int:
    """Clamp a fixed actor-pool size to the session's CPU budget, keeping
    ``_HEADROOM`` cores free for the non-actor stages of the pipeline."""
    try:
        total = int(ray.cluster_resources().get("CPU", requested + _HEADROOM))
    except Exception:
        return max(1, requested)
    return max(1, min(requested, total - _HEADROOM))
