"""Hilbert space-filling curve (xy2d) — the locality-preserving
alternative to the Morton order in functions/quadtree.py that spatial
stores use for bulk-load clustering (reference's quadtree groups sort
blocks by curve position; Hilbert improves on Morton's seam jumps).

Vectorized numpy port of the classic public-domain bit-twiddling
algorithm (Wikipedia "Hilbert curve", convert (x,y) to d): per level,
quadrant digit = gray-coded (rx, ry), then the frame rotates/reflects.
All int64; pure function of (ix, iy, depth) — bit-stable across
parallelism (CLAUDE.md cell-id invariant).

``xy2d_sql`` emits the SAME rounds unrolled as chained CTE selects so
the DuckDB oracle is the exact integer twin (rx/ry via non-negative
truncating division, no bitwise ops).
"""

from __future__ import annotations

import numpy as np


def xy2d(ix: np.ndarray, iy: np.ndarray, depth: int) -> np.ndarray:
    """Grid coords (0..2^depth-1) -> Hilbert curve position
    (0..4^depth-1)."""
    x = np.asarray(ix, dtype=np.int64).copy()
    y = np.asarray(iy, dtype=np.int64).copy()
    n = np.int64(1) << np.int64(depth)
    d = np.zeros_like(x)
    s = n >> np.int64(1)
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        # rotate the frame (uses the FULL side n, per the classic rot())
        flip = (ry == 0) & (rx == 1)
        xf = np.where(flip, n - 1 - x, x)
        yf = np.where(flip, n - 1 - y, y)
        swap = ry == 0
        x = np.where(swap, yf, xf)
        y = np.where(swap, xf, yf)
        s >>= np.int64(1)
    return d


def xy2d_sql(x_expr: str, y_expr: str, depth: int,
             base_cte: str, base_cols: str) -> str:
    """Unrolled CTE chain computing xy2d over ``base_cte`` (which must
    expose ``base_cols`` plus the x/y expressions).  Returns the full
    WITH-clause body ending in a CTE named h{depth} with columns
    (base_cols, d)."""
    n = 1 << depth
    parts = [f"h0 AS (SELECT {base_cols}, {x_expr} AS x, {y_expr} AS y, "
             f"CAST(0 AS BIGINT) AS d FROM {base_cte})"]
    level = 0
    s = n >> 1
    while s > 0:
        level += 1
        rx = f"((x // {s}) % 2)"
        ry = f"((y // {s}) % 2)"
        quad = (f"(CASE WHEN {rx} = 0 AND {ry} = 0 THEN 0 "
                f"WHEN {rx} = 0 AND {ry} = 1 THEN 1 "
                f"WHEN {rx} = 1 AND {ry} = 1 THEN 2 ELSE 3 END)")
        nx = (f"(CASE WHEN {ry} = 0 THEN (CASE WHEN {rx} = 1 "
              f"THEN {n - 1} - y ELSE y END) ELSE x END)")
        ny = (f"(CASE WHEN {ry} = 0 THEN (CASE WHEN {rx} = 1 "
              f"THEN {n - 1} - x ELSE x END) ELSE y END)")
        parts.append(
            f"h{level} AS (SELECT {base_cols}, {nx} AS x, {ny} AS y, "
            f"d + {s * s} * {quad} AS d FROM h{level - 1})")
        s >>= 1
    return ",\n    ".join(parts)
