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
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from osmquadtreepostgis_ray.functions import geotag, quadtree
from osmquadtreepostgis_ray.functions.geometry import GridIndex
from osmquadtreepostgis_ray.sources.zones import zone_rings, zones_table
from osmquadtreepostgis_ray.util import worker_cached


def build_zone_index(zt: pa.Table | None = None) -> GridIndex:
    # `zt or ...` would treat an EMPTY zone table as falsy and silently
    # substitute the full default set — a caller-filtered-to-nothing
    # zone side must index zero polygons
    zt = zones_table() if zt is None else zt
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
                 lon_col: str = "lon", lat_col: str = "lat",
                 carry: tuple = ()):
        # `carry`: extra point columns gathered through the join (e.g.
        # a measure for zonal statistics) — downstream aggregates then
        # need NO join back to the point table.
        zt = ray.get(zones_ref) if zones_ref is not None else zones_table()
        self.index = build_zone_index(zt)
        # zone_id -> kind as sorted arrays (vectorized searchsorted lookup)
        zids = zt.column("zone_id").to_numpy()
        order = np.argsort(zids)
        self.kind_ids = zids[order]
        self.kind_vals = np.asarray(zt.column("kind").to_pylist(), dtype=object)[order]
        self.id_col, self.lon_col, self.lat_col = id_col, lon_col, lat_col
        self.carry = tuple(carry)

    def __call__(self, batch: pa.Table) -> pa.Table:
        pts = np.stack([batch.column(self.lon_col).to_numpy(),
                        batch.column(self.lat_col).to_numpy()], axis=1)
        pi, zi = self.index.query(pts)
        ids = batch.column(self.id_col).to_numpy()[pi]
        kinds = self.kind_vals[np.searchsorted(self.kind_ids, zi)]
        cols = {
            self.id_col: pa.array(ids),
            "zone_id": pa.array(zi, pa.int64()),
            "kind": pa.array(kinds, pa.string()),
        }
        take = pa.array(pi)
        for c in self.carry:
            cols[c] = batch.column(c).take(take)
        return pa.table(cols)


def _col_type(ds, col: str) -> pa.DataType:
    sch = ds.schema()
    return dict(zip(sch.names, sch.types))[col]


def _zero_pad(n: int, typ: pa.DataType) -> pa.Array:
    """Typed zero-fill for union padding (never nulls — CLAUDE.md)."""
    if pa.types.is_string(typ) or pa.types.is_large_string(typ):
        return pa.array([""] * n, typ)
    if pa.types.is_floating(typ):
        return pa.array(np.zeros(n), typ)
    return pa.array(np.zeros(n, np.int64), typ)


def pip_join_copartitioned(points, zones: pa.Table, depth: int = 6,
                           id_col: str = "event_id",
                           lon_col: str = "lon", lat_col: str = "lat"):
    """The north-star big-polygon-side PIP join: a groupby-on-cell
    shuffle co-locates each quadtree partition's points WITH the zone
    polygons overlapping it (polygons replicated to every cell their
    bbox covers), then each partition builds its own GridIndex and joins
    locally — no broadcast of the polygon side, so it scales to polygon
    sets that don't fit one worker.  Identical output to the broadcast
    PipJoin (each point is tested exactly once, in its home cell).
    """
    # polygon side: explode each zone's half-open milli bbox to the cells
    # it covers at `depth` (zones are small per-cell; the count of
    # replicas is bbox_cells x zones)
    z = {c: zones.column(c).to_numpy() for c in ("zone_id", "lon0", "lat0", "lon1", "lat1")}
    kinds = np.asarray(zones.column("kind").to_pylist(), dtype=object)
    fx0, fy0 = geotag.milli_to_fixed(z["lon0"], z["lat0"])
    fx1, fy1 = geotag.milli_to_fixed(z["lon1"] - 1, z["lat1"] - 1)  # half-open
    ix0, iy0 = quadtree.fixed_to_ixy(fx0, fy0, depth)
    ix1, iy1 = quadtree.fixed_to_ixy(fx1, fy1, depth)
    reps = (ix1 - ix0 + 1) * (iy1 - iy0 + 1)
    rid = np.repeat(np.arange(len(reps)), reps)
    # vectorized 0..r-1 per zone (radius_join's fan form — no per-zone
    # Python arange on a data-scaled polygon side)
    local = (np.arange(int(reps.sum())) -
             np.repeat(np.cumsum(reps) - reps, reps)) if len(reps) \
        else np.empty(0, np.int64)
    nxr = np.repeat(ix1 - ix0 + 1, reps)
    cell = quadtree.encode_ixy(ix0[rid] + local % nxr, iy0[rid] + local // nxr, depth)
    zrep = pa.table({
        "__cell": pa.array(cell, pa.int64()),
        "__side": pa.array(np.zeros(len(rid), np.int8), pa.int8()),
        "zone_id": pa.array(z["zone_id"][rid], pa.int64()),
        "kind": pa.array(kinds[rid], pa.string()),
        "lon0": pa.array(z["lon0"][rid], pa.int64()),
        "lat0": pa.array(z["lat0"][rid], pa.int64()),
        "lon1": pa.array(z["lon1"][rid], pa.int64()),
        "lat1": pa.array(z["lat1"][rid], pa.int64()),
        # pad with typed ZEROS, not nulls (nulls would float int64
        # inside mixed pandas groups — the typed-union trap); the id
        # pad follows the point schema so non-int64 id columns work
        id_col: _zero_pad(len(rid), _col_type(points, id_col)),
        lon_col: pa.array(np.zeros(len(rid)), pa.float64()),
        lat_col: pa.array(np.zeros(len(rid)), pa.float64()),
    })
    zds = ray.data.from_arrow(zrep)

    def tag_points(batch: pa.Table) -> pa.Table:
        lon_m = batch.column("lon_milli").to_numpy()
        lat_m = batch.column("lat_milli").to_numpy()
        fx, fy = geotag.milli_to_fixed(lon_m, lat_m)
        ix, iy = quadtree.fixed_to_ixy(fx, fy, depth)
        pcell = quadtree.encode_ixy(ix, iy, depth)
        n = batch.num_rows
        return pa.table({
            "__cell": pa.array(pcell, pa.int64()),
            "__side": pa.array(np.ones(n, np.int8), pa.int8()),
            "zone_id": pa.array(np.zeros(n, np.int64), pa.int64()),
            "kind": pa.array([""] * n, pa.string()),
            "lon0": pa.array(np.zeros(n, np.int64), pa.int64()),
            "lat0": pa.array(np.zeros(n, np.int64), pa.int64()),
            "lon1": pa.array(np.zeros(n, np.int64), pa.int64()),
            "lat1": pa.array(np.zeros(n, np.int64), pa.int64()),
            id_col: batch.column(id_col),
            lon_col: batch.column(lon_col),
            lat_col: batch.column(lat_col),
        })

    u = zds.union(points.map_batches(tag_points, batch_format="pyarrow"))

    def local_pip(g: pd.DataFrame) -> pd.DataFrame:
        zg = g[g["__side"] == 0]
        pg = g[g["__side"] == 1]
        if not len(zg) or not len(pg):
            # id dtype follows the group's column (uniform across cells
            # now that the zone-side pad is typed like the point side)
            return pd.DataFrame({id_col: g[id_col].iloc[:0],
                                 "zone_id": pd.Series([], dtype=np.int64),
                                 "kind": pd.Series([], dtype=object)})
        zg = zg.drop_duplicates("zone_id")
        polys = [(int(r.zone_id), zone_rings({"lon0": r.lon0, "lat0": r.lat0,
                                              "lon1": r.lon1, "lat1": r.lat1}))
                 for r in zg.itertuples()]
        kind_of = dict(zip(zg["zone_id"].astype(np.int64), zg["kind"]))
        idx = GridIndex(polys, nx=8, ny=8)
        pts = np.stack([pg[lon_col].to_numpy(), pg[lat_col].to_numpy()], axis=1)
        pi, zi = idx.query(pts)
        return pd.DataFrame({id_col: pg[id_col].to_numpy()[pi],
                             "zone_id": zi,
                             "kind": [kind_of[int(x)] for x in zi]})

    return u.groupby("__cell").map_groups(local_pip, batch_format="pandas")


def pip_join_fn(zones_ref=None, **kwargs):
    """Task-based form: a plain map_batches fn with build-once-per-
    worker-process semantics (util.worker_cached — LRU-bounded, unlike
    the hand-rolled cache this replaced).  The zone side here is tiny
    (hundreds of rectangles, ~ms build), so actor-pool processes cost
    more to spawn than they save.  Use the PipJoin class form when the
    polygon side is big enough that actors pay off."""
    return worker_cached(lambda: PipJoin(zones_ref, **kwargs))


class PipAnti:
    """Spatial ANTI join (coverage-gap finder): emit only the points
    contained in NO polygon of the broadcast zone set — the PostGIS
    ``WHERE NOT EXISTS (ST_Contains...)`` analog, the question every
    service-coverage / geofence audit asks.  Same GridIndex containment
    kernel as PipJoin (so the boundary convention is identical, proven
    by the pip_zones oracle), membership inverted per batch: a point
    survives iff the index finds zero containing polygons.  Row-pure
    filter — no shuffle, output is a subset of the input batch."""

    def __init__(self, zones_ref=None, lon_col: str = "lon", lat_col: str = "lat"):
        zt = ray.get(zones_ref) if zones_ref is not None else zones_table()
        self.index = build_zone_index(zt)
        self.lon_col, self.lat_col = lon_col, lat_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        pts = np.stack([batch.column(self.lon_col).to_numpy(),
                        batch.column(self.lat_col).to_numpy()], axis=1)
        pi, _zi = self.index.query(pts)
        hit = np.zeros(batch.num_rows, dtype=bool)
        hit[pi] = True
        return batch.filter(pa.array(~hit))


class ZoneDistance:
    """Exact distance-to-nearest-polygon (the PostGIS ST_Distance /
    nearest-zone analog, completing the PIP family: in / not-in /
    how-far): for every point, the squared milli-degree euclid distance
    to the nearest zone RECTANGLE (clamp point into the box, distance
    to the clamped point — 0 inside) and that zone's id, tie -> lowest
    zone_id.  Vectorized (n_points x n_zones) clamp matrix per batch
    against the broadcast zone table; the small-side-broadcast plan of
    PipJoin (a data-scaled zone side would move to the co-partitioned
    cell plan with a ring-expansion closeout, as knn_cellring does)."""

    def __init__(self, zones_ref=None, id_col: str = "event_id"):
        zt = ray.get(zones_ref) if zones_ref is not None else zones_table()
        if not zt.num_rows:
            raise ValueError("ZoneDistance needs >= 1 zone: nearest-zone "
                             "distance is undefined over an empty zone set "
                             "(argmin over a zero-width matrix)")
        order = np.argsort(zt.column("zone_id").to_numpy(), kind="stable")
        self.zid = zt.column("zone_id").to_numpy()[order]
        # closed-left/open-right milli boxes: interior x in [lon0, lon1)
        self.x0 = zt.column("lon0").to_numpy()[order]
        self.y0 = zt.column("lat0").to_numpy()[order]
        self.x1 = zt.column("lon1").to_numpy()[order] - 1
        self.y1 = zt.column("lat1").to_numpy()[order] - 1
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        x = batch.column("lon_milli").to_numpy().astype(np.int64)
        y = batch.column("lat_milli").to_numpy().astype(np.int64)
        n, z = len(x), len(self.zid)
        # CONTIGUOUS (n, z) layout + in-place ops: ufuncs over stride-0
        # broadcast views ((n,1) op (1,z)) hit a ~60x slower int64
        # inner loop (measured: clip 0.65 s vs 0.01 s on the same
        # 9375x245 input) — this kernel was the suite's slowest query
        # until materialized.
        X = np.repeat(x, z).reshape(n, z)
        Y = np.repeat(y, z).reshape(n, z)
        cx = np.clip(X, self.x0, self.x1)
        cy = np.clip(Y, self.y0, self.y1)
        np.subtract(X, cx, out=X)
        np.multiply(X, X, out=X)
        np.subtract(Y, cy, out=Y)
        np.multiply(Y, Y, out=Y)
        np.add(X, Y, out=X)                      # X is now d (n, z) int64
        best = np.argmin(X, axis=1)              # first min == lowest zone_id
        return pa.table({
            self.id_col: batch.column(self.id_col),
            "zone_id": pa.array(self.zid[best], pa.int64()),
            "dist_sq": pa.array(X[np.arange(n), best], pa.int64()),
        })


def pip_anti_fn(zones_ref=None, **kwargs):
    """Task form of PipAnti (same per-worker cache rationale as
    pip_join_fn — the zone side is tiny, actors would cost more than
    they save)."""
    return worker_cached(lambda: PipAnti(zones_ref, **kwargs))


# ------------------------------------------------------------ radius join

def radius_join(points: ray.data.Dataset, radius_milli: int = 2000,
                query_mod: int = 101, depth: int = 6) -> ray.data.Dataset:
    """Within-distance spatial self-join (the PostGIS ST_DWithin analog,
    SURVEY.md §2.5 J5): pairs (query, event) with squared milli-degree
    distance <= radius^2, queries = rows with event_id % query_mod == 0.

    Partitioning assumption (documented per SURVEY §2 custom-operator
    rule): `radius_milli` should be <= one cell width at `depth` so a
    query's disk bbox covers at most a 3x3 cell rectangle (bounded
    replication).  Queries are replicated to every covering cell, events
    hash to their single own cell, and ONE groupby(cell) shuffle
    co-locates both sides; each pair is found exactly once because an
    event lives in exactly one cell.  Per-cell work is a vectorized
    distance matrix — cell population is bounded by spatial density, not
    dataset size, and hot cells can be split by raising `depth`
    (quadtree subdivision) while correspondingly lowering the radius."""
    cell_w = min(geotag.LON_MOD, 180_000) >> depth  # milli per cell, floor
    if radius_milli > cell_w:
        raise ValueError(f"radius {radius_milli} > cell width {cell_w} at depth {depth}")
    r2 = radius_milli * radius_milli

    def fan(t: pa.Table) -> pa.Table:
        eid = t.column("event_id").to_numpy()
        x = t.column("lon_milli").to_numpy()
        y = t.column("lat_milli").to_numpy()
        fx, fy = geotag.milli_to_fixed(x, y)
        ix, iy = quadtree.fixed_to_ixy(fx, fy, depth)
        own = quadtree.encode_ixy(ix, iy, depth)
        cells = [own]
        sides = [np.zeros(len(eid), np.int64)]
        ids, xs, ys = [eid], [x], [y]
        qm = eid % query_mod == 0
        if qm.any():
            qx, qy, qe = x[qm], y[qm], eid[qm]
            # full cell rectangle of the disk bbox (clipped to domain):
            # a 2R-long span intersects up to floor(2R/cell)+2 cells per
            # axis — corner-only enumeration misses the middle cell
            lo = [np.clip(qx - radius_milli, 0, geotag.LON_MOD - 1),
                  np.clip(qy - radius_milli, 0, geotag.LAT_MOD - 1)]
            hi = [np.clip(qx + radius_milli, 0, geotag.LON_MOD - 1),
                  np.clip(qy + radius_milli, 0, geotag.LAT_MOD - 1)]
            fx0, fy0 = geotag.milli_to_fixed(lo[0], lo[1])
            fx1, fy1 = geotag.milli_to_fixed(hi[0], hi[1])
            ix0, iy0 = quadtree.fixed_to_ixy(fx0, fy0, depth)
            ix1, iy1 = quadtree.fixed_to_ixy(fx1, fy1, depth)
            nx = ix1 - ix0 + 1
            ny = iy1 - iy0 + 1
            reps = nx * ny
            total = int(reps.sum())
            local = np.arange(total) - np.repeat(np.cumsum(reps) - reps, reps)
            ny_r = np.repeat(ny, reps)
            cix = np.repeat(ix0, reps) + local // ny_r
            ciy = np.repeat(iy0, reps) + local % ny_r
            cells.append(quadtree.encode_ixy(cix, ciy, depth))
            sides.append(np.ones(total, np.int64))
            ids.append(np.repeat(qe, reps))
            xs.append(np.repeat(qx, reps))
            ys.append(np.repeat(qy, reps))
        return pa.table({"cell": pa.array(np.concatenate(cells), pa.int64()),
                         "side": pa.array(np.concatenate(sides), pa.int64()),
                         "id": pa.array(np.concatenate(ids), pa.int64()),
                         "x": pa.array(np.concatenate(xs), pa.int64()),
                         "y": pa.array(np.concatenate(ys), pa.int64())})

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        q = g[g["side"] == 1]
        e = g[g["side"] == 0]
        if not len(q) or not len(e):
            return pd.DataFrame({"query_id": np.empty(0, np.int64),
                                 "event_id": np.empty(0, np.int64),
                                 "dist2": np.empty(0, np.int64)})
        dx = e["x"].to_numpy()[None, :] - q["x"].to_numpy()[:, None]
        dy = e["y"].to_numpy()[None, :] - q["y"].to_numpy()[:, None]
        d2 = dx * dx + dy * dy
        m = (d2 <= r2) & (e["id"].to_numpy()[None, :] != q["id"].to_numpy()[:, None])
        qi, ei = np.nonzero(m)
        return pd.DataFrame({"query_id": q["id"].to_numpy()[qi],
                             "event_id": e["id"].to_numpy()[ei],
                             "dist2": d2[qi, ei]})

    return (points.map_batches(fan, batch_format="pyarrow")
            .groupby("cell").map_groups(pairs, batch_format="pandas")
            .select_columns(["query_id", "event_id", "dist2"]))
