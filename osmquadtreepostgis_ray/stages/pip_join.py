"""Point-in-polygon join — the engine-native replacement for the
reference's PostGIS gist spatial queries (SURVEY.md §2.5 J5).

Pattern: the polygon side (zones) is SMALL relative to the point corpus,
so it is broadcast once via ``ray.put`` and each actor builds a
GridIndex (STRtree-lite) in ``__init__`` — no shuffle; the point stream
maps through in zero-copy Arrow batches.  For a large polygon side the
scale path is groupby(cell) co-partitioning of both sides (the
assembly-join pattern in stages/assemble.py).

Output rows: (point_id, zone_id, kind) — one row per containment,
including the 1->N grid+admin fanout.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from osmquadtreepostgis_ray.functions.geometry import GridIndex
from osmquadtreepostgis_ray.sources.zones import zone_rings, zones_table


def build_zone_index(zt: pa.Table | None = None) -> GridIndex:
    zt = zt or zones_table()
    polys = []
    for row in zt.to_pylist():
        polys.append((int(row["zone_id"]), zone_rings(row)))
    return GridIndex(polys)


class PipJoin:
    """Actor-pool map_batches stage.

    zones_ref: ray.ObjectRef of the zones pa.Table (ray.put once on the
    driver) — read once per actor, never re-shipped per batch.
    """

    def __init__(self, zones_ref=None, id_col: str = "event_id",
                 lon_col: str = "lon", lat_col: str = "lat"):
        zt = ray.get(zones_ref) if zones_ref is not None else zones_table()
        self.index = build_zone_index(zt)
        # zone_id -> kind as sorted arrays (vectorized searchsorted lookup)
        zids = zt.column("zone_id").to_numpy()
        order = np.argsort(zids)
        self.kind_ids = zids[order]
        self.kind_vals = np.asarray(zt.column("kind").to_pylist(), dtype=object)[order]
        self.id_col, self.lon_col, self.lat_col = id_col, lon_col, lat_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        pts = np.stack([batch.column(self.lon_col).to_numpy(),
                        batch.column(self.lat_col).to_numpy()], axis=1)
        pi, zi = self.index.query(pts)
        ids = batch.column(self.id_col).to_numpy()[pi]
        kinds = self.kind_vals[np.searchsorted(self.kind_ids, zi)]
        return pa.table({
            self.id_col: pa.array(ids),
            "zone_id": pa.array(zi, pa.int64()),
            "kind": pa.array(kinds, pa.string()),
        })


_TASK_CACHE: dict = {}


def pip_join_fn(zones_ref=None, **kwargs):
    """Task-based form: a plain map_batches fn with a per-worker-process
    cache of the built index.  The zone side here is tiny (hundreds of
    rectangles, ~ms build), so actor-pool processes cost more to spawn
    than they save; Ray reuses task workers, so the module cache gives
    the same build-once amortization.  Use the PipJoin class form when
    the polygon side is big enough that actors pay off."""
    key = (zones_ref.hex() if zones_ref is not None else "default",
           tuple(sorted(kwargs.items())))

    def fn(batch: pa.Table) -> pa.Table:
        join = _TASK_CACHE.get(key)
        if join is None:
            join = _TASK_CACHE[key] = PipJoin(zones_ref, **kwargs)
        return join(batch)

    return fn
