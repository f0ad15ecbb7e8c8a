"""Spatial-statistics operators: grid interpolation (IDW analog) and
global spatial autocorrelation (Moran's I).

Both are classic PostGIS-adjacent raster/statistics surfaces the
reference's tile outputs feed (heatmap interpolation, cluster-detection
diagnostics) re-expressed Ray-Data-first:

- ``idw_grid``: ONE groupby(cell) exchange — each event marks its home
  cell occupied and fans as an interpolation SOURCE to every cell its
  radius-bbox overlaps (the stages/pip_join.radius_join fan); per-cell
  work is a vectorized weighted sum against the cell center.  Cell
  population is bounded by spatial density x cell area, never dataset
  size (SURVEY §2 custom-operator partitioning rule).
- ``moran``: data-scaled part is a combiner-partial count aggregate
  (shuffle carries one (ix, iy, partial) row per batch-cell, never
  events); the adjacency statistic runs as a 5-way neighbor fan +
  groupby over the STRUCTURALLY bounded (<= 4^depth) cell table, so the
  exchange volume is data-independent.

Exactness discipline (CLAUDE.md): all coordinates are quarter-milli
int64 so depth-6 cell CENTERS are exact integers (cell width
4*360000/64 = 22500 and 4*180000/64 = 11250 quarter-milli — both even);
weights are the integer linear kernel (R^2 - d^2), so Ray and DuckDB
agree bit-for-bit with no float in sight.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from osmquadtreepostgis_ray.functions import geotag, quadtree
from osmquadtreepostgis_ray.util import sharded_agg

# depth-6 cell extents in quarter-milli units (exact: see module doc)
IDW_DEPTH = 6
_W4 = 4 * geotag.LON_MOD >> IDW_DEPTH    # 22500
_H4 = 4 * 180_000 >> IDW_DEPTH           # 11250


def idw_grid(points: ray.data.Dataset, radius_milli: int = 2500,
             value_col: str = "cents") -> ray.data.Dataset:
    """Linear-kernel inverse-distance interpolation onto occupied
    depth-6 grid-cell centers: per cell, ``num = sum(v * (R^2 - d^2))``
    and ``den = sum(R^2 - d^2)`` over all events with squared
    quarter-milli distance ``d^2 < R^2`` from the center (the estimate
    is num/den; numerator and denominator stay exact int64 so the
    DuckDB twin matches bit-for-bit).  ``n_src`` counts contributing
    events; a cell occupied only by corner events farther than R from
    its own center keeps an all-zero row (LEFT-join semantics).

    ``points`` needs (lon_milli, lat_milli, value_col) columns.
    Requires ``radius_milli <= cell width`` so an event's radius-bbox
    covers a bounded cell rectangle.
    """
    cell_w = min(geotag.LON_MOD, 180_000) >> IDW_DEPTH
    if radius_milli > cell_w:
        raise ValueError(f"radius {radius_milli} > cell width {cell_w}")
    r4 = 4 * radius_milli
    r2 = r4 * r4

    def fan(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "lon_milli" not in t.column_names:
            z = pa.array([], pa.int64())
            return pa.table({"cell": z, "side": pa.array([], pa.int8()),
                             "x4": z, "y4": z, "v": z})
        x = t.column("lon_milli").to_numpy()
        y = t.column("lat_milli").to_numpy()
        v = t.column(value_col).to_numpy()
        fx, fy = geotag.milli_to_fixed(x, y)
        ix, iy = quadtree.fixed_to_ixy(fx, fy, IDW_DEPTH)
        own = quadtree.encode_ixy(ix, iy, IDW_DEPTH)
        # source fanout: full cell rectangle of the radius bbox (clipped
        # to the domain) — same completeness rule as radius_join's fan
        lo_x = np.clip(x - radius_milli, 0, geotag.LON_MOD - 1)
        lo_y = np.clip(y - radius_milli, 0, geotag.LAT_MOD - 1)
        hi_x = np.clip(x + radius_milli, 0, geotag.LON_MOD - 1)
        hi_y = np.clip(y + radius_milli, 0, geotag.LAT_MOD - 1)
        fx0, fy0 = geotag.milli_to_fixed(lo_x, lo_y)
        fx1, fy1 = geotag.milli_to_fixed(hi_x, hi_y)
        ix0, iy0 = quadtree.fixed_to_ixy(fx0, fy0, IDW_DEPTH)
        ix1, iy1 = quadtree.fixed_to_ixy(fx1, fy1, IDW_DEPTH)
        nx, ny = ix1 - ix0 + 1, iy1 - iy0 + 1
        reps = nx * ny
        total = int(reps.sum())
        local = np.arange(total) - np.repeat(np.cumsum(reps) - reps, reps)
        ny_r = np.repeat(ny, reps)
        cix = np.repeat(ix0, reps) + local // ny_r
        ciy = np.repeat(iy0, reps) + local % ny_r
        x4 = 4 * x
        y4 = 4 * (y + 5_000)
        return pa.table({
            "cell": pa.array(np.concatenate(
                [own, quadtree.encode_ixy(cix, ciy, IDW_DEPTH)]), pa.int64()),
            "side": pa.array(np.concatenate(
                [np.zeros(len(x), np.int8), np.ones(total, np.int8)]), pa.int8()),
            "x4": pa.array(np.concatenate([x4, np.repeat(x4, reps)]), pa.int64()),
            "y4": pa.array(np.concatenate([y4, np.repeat(y4, reps)]), pa.int64()),
            "v": pa.array(np.concatenate([v, np.repeat(v, reps)]), pa.int64()),
        })

    def grp(g: pd.DataFrame) -> pd.DataFrame:
        empty = {"ix": np.empty(0, np.int64), "iy": np.empty(0, np.int64),
                 "n_src": np.empty(0, np.int64), "num": np.empty(0, np.int64),
                 "den": np.empty(0, np.int64)}
        if not (g["side"] == 0).any():
            return pd.DataFrame(empty)  # cell touched only by fanout
        cell = np.int64(g["cell"].iloc[0])
        ix, iy, _ = quadtree.decode(np.array([cell]))
        cx4 = np.int64(ix[0]) * _W4 + _W4 // 2
        cy4 = np.int64(iy[0]) * _H4 + _H4 // 2
        s = g[g["side"] == 1]
        dx = s["x4"].to_numpy(np.int64) - cx4
        dy = s["y4"].to_numpy(np.int64) - cy4
        d2 = dx * dx + dy * dy
        keep = d2 < r2
        w = r2 - d2[keep]
        return pd.DataFrame({
            "ix": np.array([ix[0]], np.int64),
            "iy": np.array([iy[0]], np.int64),
            "n_src": np.array([keep.sum()], np.int64),
            "num": np.array([(s["v"].to_numpy(np.int64)[keep] * w).sum()], np.int64),
            "den": np.array([w.sum()], np.int64)})

    return (points.map_batches(fan, batch_format="pyarrow")
            .groupby("cell").map_groups(grp, batch_format="pandas"))


def moran(points: ray.data.Dataset, depth: int = 6) -> ray.data.Dataset:
    """Global Moran's I over per-cell event counts with rook (4-way)
    adjacency and binary weights — the spatial-autocorrelation
    diagnostic (is the point pattern clustered?).  Returns ONE row of
    exact integer parts: ``n_cells`` occupied cells, ``w_pairs``
    directed adjacent occupied pairs, ``num = sum_adj(d_i * d_j)``,
    ``den = sum_i(d_i^2)`` where ``d_i = n_cells * count_i - total``
    (count deviations scaled by n_cells to stay integer).  The statistic
    is I = (n_cells / w_pairs) * (num / den) — left rational so the
    DuckDB twin matches exactly.  int64 is ample at sandbox scale; a
    100-TB deployment whose per-cell counts exceed ~1e9 moves the sums
    to HUGEINT/object dtype (same kernel shape).

    Shuffles: one combiner-partial count aggregate (data-scaled part),
    then one neighbor-fan groupby over the <= 4^depth cell table
    (structurally bounded volume, independent of dataset size).
    """
    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "lon_milli" not in t.column_names:
            z = pa.array([], pa.int64())
            return pa.table({"ix": z, "iy": z, "n": z})
        fx, fy = geotag.milli_to_fixed(t.column("lon_milli").to_numpy(),
                                       t.column("lat_milli").to_numpy())
        ix, iy = quadtree.fixed_to_ixy(fx, fy, depth)
        key = (ix << np.int64(32)) | iy
        u, counts = np.unique(key, return_counts=True)
        return pa.table({"ix": pa.array(u >> np.int64(32), pa.int64()),
                         "iy": pa.array(u & np.int64(0xFFFFFFFF), pa.int64()),
                         "n": pa.array(counts.astype(np.int64), pa.int64())})

    counts = sharded_agg(points.map_batches(partial, batch_format="pyarrow"),
                         ["ix", "iy"], {"n": ("n", "sum")}).materialize()
    # global scalars: bounded (<= 4^depth rows), driver gets two ints
    n_cells = int(counts.count())
    total = int(counts.sum("n"))
    side = np.int64(1) << np.int64(depth)

    def fan(t: pa.Table) -> pa.Table:
        cols = {"tix": [], "tiy": [], "role": [], "d": []}
        ix = t.column("ix").to_numpy()
        iy = t.column("iy").to_numpy()
        d = n_cells * t.column("n").to_numpy() - total
        for dx, dy, role in ((0, 0, 0), (1, 0, 1), (-1, 0, 1), (0, 1, 1), (0, -1, 1)):
            tx, ty = ix + dx, iy + dy
            ok = (tx >= 0) & (tx < side) & (ty >= 0) & (ty < side)
            cols["tix"].append(tx[ok])
            cols["tiy"].append(ty[ok])
            cols["role"].append(np.full(ok.sum(), role, np.int8))
            cols["d"].append(d[ok])
        return pa.table({
            "key": pa.array((np.concatenate(cols["tix"]) << np.int64(32))
                            | np.concatenate(cols["tiy"]), pa.int64()),
            "role": pa.array(np.concatenate(cols["role"]), pa.int8()),
            "d": pa.array(np.concatenate(cols["d"]), pa.int64())})

    def grp(g: pd.DataFrame) -> pd.DataFrame:
        home = g[g["role"] == 0]
        empty = {"w": np.empty(0, np.int64), "num": np.empty(0, np.int64),
                 "den": np.empty(0, np.int64)}
        if not len(home):
            return pd.DataFrame(empty)  # messenger to an unoccupied cell
        dh = np.int64(home["d"].iloc[0])
        msg = g.loc[g["role"] == 1, "d"].to_numpy(np.int64)
        return pd.DataFrame({"w": np.array([len(msg)], np.int64),
                             "num": np.array([dh * msg.sum()], np.int64),
                             "den": np.array([dh * dh], np.int64)})

    parts = (counts.map_batches(fan, batch_format="pyarrow")
             .groupby("key").map_groups(grp, batch_format="pandas"))

    def finish(t: pa.Table) -> pa.Table:
        w = t.column("w").to_numpy() if "w" in t.column_names else np.empty(0, np.int64)
        num = t.column("num").to_numpy() if "num" in t.column_names else np.empty(0, np.int64)
        den = t.column("den").to_numpy() if "den" in t.column_names else np.empty(0, np.int64)
        return pa.table({"n_cells": pa.array([n_cells], pa.int64()),
                         "w_pairs": pa.array([int(w.sum())], pa.int64()),
                         "num": pa.array([int(num.sum())], pa.int64()),
                         "den": pa.array([int(den.sum())], pa.int64())})

    # per-cell partials are bounded by 4^depth — one-task final merge
    return parts.repartition(1).map_batches(finish, batch_format="pyarrow",
                                            batch_size=None)


def hotspot_gi(points: ray.data.Dataset, depth: int = 6) -> ray.data.Dataset:
    """Getis-Ord Gi* hot-spot inputs per occupied cell: own count ``n``,
    queen-neighborhood (8 neighbors + self, occupied only) count sum
    ``nbr_sum`` and member count ``nbr_cnt`` — the exact integer parts
    the Gi* z-score is computed from (the global mean/variance are
    derivable from the same rows, so nothing is lost keeping the output
    rational).  Same two-exchange shape as ``moran``: a data-scaled
    combiner count aggregate, then a 9-way fan over the structurally
    bounded cell table."""
    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "lon_milli" not in t.column_names:
            z = pa.array([], pa.int64())
            return pa.table({"ix": z, "iy": z, "n": z})
        fx, fy = geotag.milli_to_fixed(t.column("lon_milli").to_numpy(),
                                       t.column("lat_milli").to_numpy())
        ix, iy = quadtree.fixed_to_ixy(fx, fy, depth)
        key = (ix << np.int64(32)) | iy
        u, counts = np.unique(key, return_counts=True)
        return pa.table({"ix": pa.array(u >> np.int64(32), pa.int64()),
                         "iy": pa.array(u & np.int64(0xFFFFFFFF), pa.int64()),
                         "n": pa.array(counts.astype(np.int64), pa.int64())})

    counts = sharded_agg(points.map_batches(partial, batch_format="pyarrow"),
                         ["ix", "iy"], {"n": ("n", "sum")})
    side = np.int64(1) << np.int64(depth)
    offsets = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]

    def fan(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "ix" not in t.column_names:
            z = pa.array([], pa.int64())
            return pa.table({"key": z, "role": pa.array([], pa.int8()),
                             "n": z})
        ix = t.column("ix").to_numpy()
        iy = t.column("iy").to_numpy()
        n = t.column("n").to_numpy()
        keys, roles, ns = [], [], []
        for dx, dy in offsets:
            tx, ty = ix + dx, iy + dy
            ok = (tx >= 0) & (tx < side) & (ty >= 0) & (ty < side)
            keys.append((tx[ok] << np.int64(32)) | ty[ok])
            roles.append(np.full(int(ok.sum()),
                                 0 if (dx, dy) == (0, 0) else 1, np.int8))
            ns.append(n[ok])
        return pa.table({"key": pa.array(np.concatenate(keys), pa.int64()),
                         "role": pa.array(np.concatenate(roles), pa.int8()),
                         "n": pa.array(np.concatenate(ns), pa.int64())})

    def grp(g: pd.DataFrame) -> pd.DataFrame:
        home = g[g["role"] == 0]
        if not len(home):  # messenger into an unoccupied cell
            z = np.empty(0, np.int64)
            return pd.DataFrame({"ix": z, "iy": z, "n": z,
                                 "nbr_sum": z, "nbr_cnt": z})
        k = np.int64(home["key"].iloc[0])
        n_home = np.int64(home["n"].iloc[0])
        msg = g.loc[g["role"] == 1, "n"].to_numpy(np.int64)
        return pd.DataFrame({
            "ix": np.array([k >> np.int64(32)], np.int64),
            "iy": np.array([k & np.int64(0xFFFFFFFF)], np.int64),
            "n": np.array([n_home], np.int64),
            "nbr_sum": np.array([n_home + msg.sum()], np.int64),
            "nbr_cnt": np.array([1 + len(msg)], np.int64)})

    return (counts.map_batches(fan, batch_format="pyarrow")
            .groupby("key").map_groups(grp, batch_format="pandas"))
