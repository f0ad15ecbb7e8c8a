"""EWKB geometry encoding — the engine's F11.

Matches the reference's wire format: big-endian (XDR) WKB with the SRID
flag set and SRID 3857 embedded (src/validategeoms.cpp:116-138).  Pure
numpy/struct, no shapely in the sandbox.

Coordinates come in as (N, 2) float64 arrays (already mercator-projected).
Rings are lists of such arrays (first outer, rest holes).
"""

from __future__ import annotations

import struct

import numpy as np

SRID = 3857
_SRID_FLAG = 0x20000000
WKB_POINT, WKB_LINESTRING, WKB_POLYGON, WKB_MULTIPOLYGON = 1, 2, 3, 6


def _hdr(geom_type: int, srid: int = SRID) -> bytes:
    return struct.pack(">BII", 0, geom_type | _SRID_FLAG, srid)


def _coords_be(a: np.ndarray) -> bytes:
    return np.ascontiguousarray(np.asarray(a, dtype=">f8")).tobytes()


def point(x: float, y: float) -> bytes:
    return _hdr(WKB_POINT) + struct.pack(">dd", x, y)


def linestring(coords: np.ndarray) -> bytes:
    coords = np.asarray(coords, dtype=np.float64)
    return _hdr(WKB_LINESTRING) + struct.pack(">I", len(coords)) + _coords_be(coords)


def _rings_body(rings: list[np.ndarray]) -> bytes:
    out = [struct.pack(">I", len(rings))]
    for r in rings:
        r = np.asarray(r, dtype=np.float64)
        out.append(struct.pack(">I", len(r)))
        out.append(_coords_be(r))
    return b"".join(out)


def polygon(rings: list[np.ndarray]) -> bytes:
    return _hdr(WKB_POLYGON) + _rings_body(rings)


def multipolygon(parts: list[list[np.ndarray]]) -> bytes:
    out = [_hdr(WKB_MULTIPOLYGON), struct.pack(">I", len(parts))]
    for rings in parts:
        # nested polygons carry no SRID flag (only the outermost does,
        # matching GEOS/PostGIS EWKB writer behavior)
        out.append(struct.pack(">BI", 0, WKB_POLYGON))
        out.append(_rings_body(rings))
    return b"".join(out)


def points_vectorized(x: np.ndarray, y: np.ndarray) -> list[bytes]:
    """Batch point EWKB: one contiguous big-endian pack, split per row."""
    n = len(x)
    hdr = np.frombuffer(_hdr(WKB_POINT), dtype=np.uint8)
    buf = np.empty((n, 9 + 16), dtype=np.uint8)
    buf[:, :9] = hdr
    xy = np.empty((n, 2), dtype=">f8")
    xy[:, 0] = x
    xy[:, 1] = y
    buf[:, 9:] = xy.view(np.uint8).reshape(n, 16)
    flat = buf.reshape(-1)
    return [flat[i * 25:(i + 1) * 25].tobytes() for i in range(n)]


def box_polygons_vectorized(x0, y0, x1, y1) -> list[bytes]:
    """Batch axis-aligned-box polygon EWKB (the image-footprint fast path,
    analog of the reference's cached-WKB skip, src/postgiswriter.cpp:737-777).
    Ring closed, CCW: (x0,y0) (x1,y0) (x1,y1) (x0,y1) (x0,y0)."""
    n = len(x0)
    head = _hdr(WKB_POLYGON) + struct.pack(">II", 1, 5)
    hlen = len(head)
    buf = np.empty((n, hlen + 5 * 16), dtype=np.uint8)
    buf[:, :hlen] = np.frombuffer(head, dtype=np.uint8)
    ring = np.empty((n, 10), dtype=">f8")
    ring[:, 0] = x0; ring[:, 1] = y0
    ring[:, 2] = x1; ring[:, 3] = y0
    ring[:, 4] = x1; ring[:, 5] = y1
    ring[:, 6] = x0; ring[:, 7] = y1
    ring[:, 8] = x0; ring[:, 9] = y0
    buf[:, hlen:] = ring.view(np.uint8).reshape(n, 80)
    flat = buf.reshape(-1)
    row = hlen + 80
    return [flat[i * row:(i + 1) * row].tobytes() for i in range(n)]


def lines_vectorized(coords: np.ndarray) -> list[bytes]:
    """Batch linestring EWKB for a fixed vertex count: (n, k, 2) float64
    -> n encodings.  One contiguous big-endian pack, split per row."""
    coords = np.asarray(coords, dtype=np.float64)
    n, k = coords.shape[0], coords.shape[1]
    head = _hdr(WKB_LINESTRING) + struct.pack(">I", k)
    hlen = len(head)
    row = hlen + k * 16
    buf = np.empty((n, row), dtype=np.uint8)
    buf[:, :hlen] = np.frombuffer(head, dtype=np.uint8)
    be = coords.astype(">f8").reshape(n, k * 2)
    buf[:, hlen:] = be.view(np.uint8).reshape(n, k * 16)
    flat = buf.reshape(-1)
    return [flat[i * row:(i + 1) * row].tobytes() for i in range(n)]


def parse(wkb: bytes):
    """Minimal EWKB reader for tests: returns (type, srid, coords-struct)."""
    assert wkb[0] == 0, "big-endian expected"
    gtype, = struct.unpack_from(">I", wkb, 1)
    off = 5
    srid = None
    if gtype & _SRID_FLAG:
        srid, = struct.unpack_from(">I", wkb, off)
        off += 4
        gtype &= ~_SRID_FLAG
    if gtype == WKB_POINT:
        return gtype, srid, np.frombuffer(wkb, dtype=">f8", count=2, offset=off).astype(np.float64)
    if gtype == WKB_LINESTRING:
        n, = struct.unpack_from(">I", wkb, off)
        c = np.frombuffer(wkb, dtype=">f8", count=2 * n, offset=off + 4)
        return gtype, srid, c.astype(np.float64).reshape(n, 2)
    if gtype == WKB_POLYGON:
        rings, _ = _parse_rings(wkb, off)
        return gtype, srid, rings
    if gtype == WKB_MULTIPOLYGON:
        nparts, = struct.unpack_from(">I", wkb, off)
        off += 4
        parts = []
        for _ in range(nparts):
            sub_type, = struct.unpack_from(">I", wkb, off + 1)
            assert sub_type & ~_SRID_FLAG == WKB_POLYGON
            rings, off2 = _parse_rings(wkb, off + 5)
            parts.append(rings)
            off = off2
        return gtype, srid, parts
    raise ValueError(f"unsupported wkb type {gtype}")


def _parse_rings(wkb: bytes, off: int):
    nrings, = struct.unpack_from(">I", wkb, off)
    off += 4
    rings = []
    for _ in range(nrings):
        n, = struct.unpack_from(">I", wkb, off)
        off += 4
        c = np.frombuffer(wkb, dtype=">f8", count=2 * n, offset=off).astype(np.float64).reshape(n, 2)
        rings.append(c)
        off += 16 * n
    return rings, off
