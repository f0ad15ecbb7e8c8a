"""Deterministic zone polygons — the polygon side of the PIP join
(FIXTURES.md F2; the analog of the reference's boundary/polygon tables).

Two families, all exact integer milli-degree rectangles so the DuckDB
oracle can replicate containment with interval arithmetic:

- grid zones: GX x GY grid over the lon/lat domain; a zone exists iff
  ``(zone_id * 2654435761) % 10 < 6`` (selective join).
- admin zones: a coarser AX x AY overlay (all present) — rows matching
  both families exercise the 1->N join fanout.

Containment convention: closed-left / open-right on both axes (exactly
`lon_milli // cell_w == zx`).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from osmquadtreepostgis_ray.functions.geotag import LAT_MOD, LON_MOD

GX, GY = 24, 17          # 15000 x 10000 milli cells, exact divisors
AX, AY = 6, 5            # admin overlay: 60000 x 34000 milli cells
GRID_KEEP_MULT = 2654435761
GRID_KEEP_MOD = 10
GRID_KEEP_LT = 6
ADMIN_ID_BASE = 100000

GRID_W = LON_MOD // GX   # 15000
GRID_H = LAT_MOD // GY   # 10000
ADMIN_W = LON_MOD // AX  # 60000
ADMIN_H = LAT_MOD // AY  # 34000


def grid_zone_ids() -> np.ndarray:
    ids = np.arange(GX * GY, dtype=np.int64)
    return ids[(ids * GRID_KEEP_MULT) % GRID_KEEP_MOD < GRID_KEEP_LT]


def zones_table() -> pa.Table:
    """All zones as (zone_id, kind, lon0/lat0/lon1/lat1 milli, rings).
    Rings are float lon/lat degree boxes (what the geometry PIP consumes)."""
    gz = grid_zone_ids()
    zx, zy = gz % GX, gz // GX
    g = {
        "zone_id": gz,
        "kind": np.full(len(gz), "grid", dtype=object),
        "lon0": zx * GRID_W, "lat0": zy * GRID_H,
        "lon1": (zx + 1) * GRID_W, "lat1": (zy + 1) * GRID_H,
    }
    aid = np.arange(AX * AY, dtype=np.int64)
    ax, ay = aid % AX, aid // AX
    a = {
        "zone_id": aid + ADMIN_ID_BASE,
        "kind": np.full(len(aid), "admin", dtype=object),
        "lon0": ax * ADMIN_W, "lat0": ay * ADMIN_H,
        "lon1": (ax + 1) * ADMIN_W, "lat1": (ay + 1) * ADMIN_H,
    }
    cols = {k: np.concatenate([g[k], a[k]]) for k in g}
    return pa.table({
        "zone_id": pa.array(cols["zone_id"], pa.int64()),
        "kind": pa.array(list(cols["kind"]), pa.string()),
        "lon0": pa.array(cols["lon0"], pa.int64()),
        "lat0": pa.array(cols["lat0"], pa.int64()),
        "lon1": pa.array(cols["lon1"], pa.int64()),
        "lat1": pa.array(cols["lat1"], pa.int64()),
    })


def zone_rings(row) -> list[np.ndarray]:
    """Milli-int zone row -> degree-space ring (closed, CCW)."""
    x0, y0 = row["lon0"] / 1000.0 - 180.0, row["lat0"] / 1000.0 - 85.0
    x1, y1 = row["lon1"] / 1000.0 - 180.0, row["lat1"] / 1000.0 - 85.0
    return [np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]])]


def zone_match_sql(lon_expr: str, lat_expr: str) -> str:
    """DuckDB subquery-free predicate pieces are built by the caller;
    here: the grid zone id covering a milli point, and its keep test."""
    zx = f"(({lon_expr}) // {GRID_W})"
    zy = f"(({lat_expr}) // {GRID_H})"
    zid = f"({zy} * {GX} + {zx})"
    keep = f"((({zid}) * {GRID_KEEP_MULT}) % {GRID_KEEP_MOD} < {GRID_KEEP_LT})"
    return zid, keep


def admin_zone_sql(lon_expr: str, lat_expr: str) -> str:
    ax = f"(({lon_expr}) // {ADMIN_W})"
    ay = f"(({lat_expr}) // {ADMIN_H})"
    return f"({ay} * {AX} + {ax} + {ADMIN_ID_BASE})"


def admin_border_dist(lon_milli: np.ndarray, lat_milli: np.ndarray
                      ) -> tuple[np.ndarray, np.ndarray]:
    """(containing admin zone_id, exact milli distance to its boundary)
    — min of the four edge offsets inside the closed-left/open-right
    rectangle; admin zones tile the domain so every point is inside
    exactly one."""
    x = np.asarray(lon_milli, dtype=np.int64)
    y = np.asarray(lat_milli, dtype=np.int64)
    ax, ay = x // ADMIN_W, y // ADMIN_H
    x0, y0 = ax * ADMIN_W, ay * ADMIN_H
    d = np.minimum.reduce([x - x0, x0 + ADMIN_W - 1 - x,
                           y - y0, y0 + ADMIN_H - 1 - y])
    return ay * AX + ax + ADMIN_ID_BASE, d
