"""Small runtime utilities."""

from __future__ import annotations

import ray


def pool_size(frac: float = 0.5, lo: int = 1, hi: int = 16) -> int:
    """Actor-pool size leaving headroom for the read/write stages: an
    actor pool that reserves every CPU starves its upstream tasks and
    the pipeline serializes (or deadlocks on tiny clusters)."""
    try:
        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        cpus = 4
    return max(lo, min(hi, int(cpus * frac)))
