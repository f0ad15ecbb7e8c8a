"""Quadtree cell ids — the engine's replacement for the reference's oqt
quadtree (object quadtree: src/postgiswriter.cpp:417-418; block quadtree
("tile"): src/postgiswriter.cpp:419-420).

Layout of a cell id (int64): ``(morton << 6) | depth`` where ``morton``
interleaves the x (even bits, bit 0) and y (odd bits) indices of the
cell at ``depth``.  Depth <= 26 keeps everything in int64.

All math is **fixed-point integer** (coordinates scaled by 1e7,
"decimicro degrees" like OSM itself) so a cell id is a pure function of
the row that numpy int64 and DuckDB BIGINT evaluate identically — the
bit-stable-across-parallelism requirement of SURVEY.md §7.3 and the
driver's DuckDB oracle both depend on this.

Vectorized throughout: every function takes/returns numpy arrays.
"""

from __future__ import annotations

import numpy as np

SCALE = 10_000_000            # 1e7 fixed-point (decimicro degrees)
LON_SPAN = 360 * SCALE        # [-180, 180)
LAT_SPAN = 180 * SCALE        # [-90, 90)
MAX_DEPTH = 26


def _part1by1(v: np.ndarray) -> np.ndarray:
    """Spread the low 32 bits of v over the even bits (Morton helper)."""
    v = v.astype(np.uint64)
    v = (v | (v << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v << np.uint64(2))) & np.uint64(0x3333333333333333)
    v = (v | (v << np.uint64(1))) & np.uint64(0x5555555555555555)
    return v


def _compact1by1(v: np.ndarray) -> np.ndarray:
    v = v.astype(np.uint64) & np.uint64(0x5555555555555555)
    v = (v | (v >> np.uint64(1))) & np.uint64(0x3333333333333333)
    v = (v | (v >> np.uint64(2))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v >> np.uint64(4))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v >> np.uint64(8))) & np.uint64(0x0000FFFF0000FFFF)
    v = (v | (v >> np.uint64(16))) & np.uint64(0x00000000FFFFFFFF)
    return v


def morton(ix: np.ndarray, iy: np.ndarray) -> np.ndarray:
    return (_part1by1(np.asarray(ix)) | (_part1by1(np.asarray(iy)) << np.uint64(1))).astype(np.int64)


def lonlat_to_ixy(lon: np.ndarray, lat: np.ndarray, depth: int) -> tuple[np.ndarray, np.ndarray]:
    """Float degrees -> integer cell indices at depth, via exact fixed point.

    ``round(lon * 1e7)`` recovers the exact integer for inputs that are
    decimal fractions (the synthetic corpus uses milli-degrees), then the
    division is pure int64.
    """
    li = np.rint(np.asarray(lon, dtype=np.float64) * SCALE).astype(np.int64) + 180 * SCALE
    la = np.rint(np.asarray(lat, dtype=np.float64) * SCALE).astype(np.int64) + 90 * SCALE
    return fixed_to_ixy(li, la, depth)


def fixed_to_ixy(lon_fixed: np.ndarray, lat_fixed: np.ndarray, depth: int) -> tuple[np.ndarray, np.ndarray]:
    """Non-negative fixed-point offsets (0..span) -> cell indices. Exact int math."""
    assert 0 <= depth <= MAX_DEPTH
    n = np.int64(1) << np.int64(depth)
    ix = (np.asarray(lon_fixed, dtype=np.int64) * n) // LON_SPAN
    iy = (np.asarray(lat_fixed, dtype=np.int64) * n) // LAT_SPAN
    return np.clip(ix, 0, n - 1), np.clip(iy, 0, n - 1)


def encode_ixy(ix: np.ndarray, iy: np.ndarray, depth: int) -> np.ndarray:
    return ((morton(ix, iy) << np.int64(6)) | np.int64(depth)).astype(np.int64)


def encode(lon: np.ndarray, lat: np.ndarray, depth: int) -> np.ndarray:
    ix, iy = lonlat_to_ixy(lon, lat, depth)
    return encode_ixy(ix, iy, depth)


def decode(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    cell = np.asarray(cell, dtype=np.int64)
    depth = (cell & np.int64(63)).astype(np.int64)
    m = (cell >> np.int64(6)).astype(np.uint64)
    return _compact1by1(m).astype(np.int64), _compact1by1(m >> np.uint64(1)).astype(np.int64), depth


def parent(cell: np.ndarray, levels: int = 1) -> np.ndarray:
    """Ancestor cell `levels` up (analog of quadtree round-to-depth)."""
    cell = np.asarray(cell, dtype=np.int64)
    depth = cell & np.int64(63)
    newdepth = np.maximum(depth - levels, 0)
    lv = depth - newdepth
    m = cell >> np.int64(6)
    return ((m >> (2 * lv).astype(np.int64)) << np.int64(6)) | newdepth


def at_depth(cell: np.ndarray, depth: int) -> np.ndarray:
    """Project cells to a fixed (shallower) depth — the "tile" mapping
    (block quadtree, src/postgiswriter.cpp:1099-1138)."""
    cell = np.asarray(cell, dtype=np.int64)
    cur = cell & np.int64(63)
    lv = cur - depth
    if np.any(lv < 0):
        raise ValueError("at_depth: target depth deeper than cell depth")
    m = cell >> np.int64(6)
    return ((m >> (2 * lv).astype(np.int64)) << np.int64(6)) | np.int64(depth)


def children(cell: int) -> np.ndarray:
    cell = int(cell)
    depth = cell & 63
    if depth >= MAX_DEPTH:
        raise ValueError("max depth")
    m = cell >> 6
    return np.array([((m << 2 | q) << 6) | (depth + 1) for q in range(4)], dtype=np.int64)


def ring(cell: int, radius: int = 1) -> np.ndarray:
    """Cells of the square ring at Chebyshev distance `radius` (the kNN
    cell-ring expansion primitive; radius 0 = the cell itself).
    Clipped at the grid edge (no wraparound)."""
    ix, iy, depth = (int(a[0]) for a in decode(np.array([cell])))
    n = 1 << depth
    if radius == 0:
        return np.array([cell], dtype=np.int64)
    xs, ys = [], []
    for dx in range(-radius, radius + 1):
        for dy in (-radius, radius):
            xs.append(ix + dx); ys.append(iy + dy)
    for dy in range(-radius + 1, radius):
        for dx in (-radius, radius):
            xs.append(ix + dx); ys.append(iy + dy)
    xs = np.array(xs); ys = np.array(ys)
    ok = (xs >= 0) & (xs < n) & (ys >= 0) & (ys < n)
    return encode_ixy(xs[ok], ys[ok], depth)


def disk(cell: int, radius: int) -> np.ndarray:
    """All cells within Chebyshev distance `radius` (filled square)."""
    ix, iy, depth = (int(a[0]) for a in decode(np.array([cell])))
    n = 1 << depth
    x0, x1 = max(0, ix - radius), min(n - 1, ix + radius)
    y0, y1 = max(0, iy - radius), min(n - 1, iy + radius)
    gx, gy = np.meshgrid(np.arange(x0, x1 + 1), np.arange(y0, y1 + 1))
    return encode_ixy(gx.ravel(), gy.ravel(), depth)


def cell_bounds(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(lon_min, lat_min, lon_max, lat_max) in degrees, float64."""
    ix, iy, depth = decode(cell)
    n = (np.int64(1) << depth).astype(np.float64)
    w, h = 360.0 / n, 180.0 / n
    lon0 = ix / n * 360.0 - 180.0
    lat0 = iy / n * 180.0 - 90.0
    return lon0, lat0, lon0 + w, lat0 + h


def interleave_sql(ix_expr: str, iy_expr: str, depth: int) -> str:
    """DuckDB SQL expression computing ``encode_ixy`` — bit-for-bit the
    same morton interleave, unrolled per bit (used by the driver oracle)."""
    terms = []
    for b in range(depth):
        terms.append(f"((({ix_expr}) >> {b}) & 1) * {1 << (2 * b)}")
        terms.append(f"((({iy_expr}) >> {b}) & 1) * {1 << (2 * b + 1)}")
    return "((" + " + ".join(terms) + ") * 64 + " + str(depth) + ")"


def quadkey(cell: np.ndarray) -> np.ndarray:
    """Bing-style quadkey strings for UNIFORM-depth cells (the tile
    address a web-map server keys its pyramid by; digit k at level k+1
    is x_bit + 2*y_bit, most-significant level first).  Packed first as
    a base-10 int (digits are 0-3, so base-10 packing is lossless),
    then zero-padded — one vectorized printf, no per-row loop."""
    cell = np.asarray(cell, dtype=np.int64)
    if len(cell) == 0:
        return np.empty(0, dtype=object)
    ix, iy, d = decode(cell)
    depth = int(d[0])
    if (d != depth).any():
        raise ValueError("quadkey requires uniform-depth cells")
    qnum = np.zeros(len(cell), np.int64)
    for k in range(depth):
        shift = depth - 1 - k
        digit = ((ix >> shift) & 1) + 2 * ((iy >> shift) & 1)
        qnum = qnum * 10 + digit
    return np.char.mod(f"%0{depth}d", qnum).astype(object)


def quadkey_sql(ix_expr: str, iy_expr: str, depth: int) -> str:
    """DuckDB twin of ``quadkey``: the same base-10 digit packing,
    rendered with printf zero-padding."""
    terms = []
    for k in range(depth):
        shift = depth - 1 - k
        terms.append(f"(((({ix_expr}) >> {shift}) & 1)"
                     f" + 2 * ((({iy_expr}) >> {shift}) & 1))"
                     f" * {10 ** (depth - 1 - k)}")
    return f"printf('%0{depth}d', " + " + ".join(terms) + ")"
