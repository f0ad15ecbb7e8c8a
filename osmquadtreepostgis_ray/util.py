"""Small runtime utilities."""

from __future__ import annotations

import uuid

import ray

_STAGE_CACHE: dict = {}


def worker_cached(factory):
    """Wrap a callable-factory as a plain map_batches fn with build-once-
    per-worker-process semantics.

    Ray reuses task worker processes, so a module-level cache gives the
    same amortization as an actor pool's __init__ WITHOUT paying actor
    process spawn (1-2 s each; a 16-actor pool costs more to start than
    most of our stages run).  Reserve real actor pools for state that is
    expensive to build (big indexes, models); use this for broadcast-ref
    lookups and compiled tables.  The factory must be picklable (may
    capture ray.ObjectRefs)."""
    key = uuid.uuid4().hex

    def fn(batch):
        obj = _STAGE_CACHE.get(key)
        if obj is None:
            obj = _STAGE_CACHE[key] = factory()
        return obj(batch)

    return fn


def pool_size(frac: float = 0.5, lo: int = 1, hi: int = 16) -> int:
    """Actor-pool size leaving headroom for the read/write stages: an
    actor pool that reserves every CPU starves its upstream tasks and
    the pipeline serializes (or deadlocks on tiny clusters)."""
    try:
        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        cpus = 4
    return max(lo, min(hi, int(cpus * frac)))
