"""Standard geohash cell encoding (Niemeyer base32, lon-bit-first).

The reference's spatial key is its quadtree (functions/quadtree.py);
geohash is the other ubiquitous hierarchical cell id real pipelines
interop with (Elasticsearch/Redis/Uber H3 ecosystems ingest it), so the
engine exposes it as a first-class encode.  Reference analog: the
quadtree cell in Quadtree::calculate (SURVEY.md §2.3) — same
bit-interleaving idea, different bit order + base32 rendering.

Exactness discipline (CLAUDE.md): everything is non-negative int64
arithmetic so numpy's floor `//` and DuckDB's truncating `//` agree,
and the numpy kernel and the SQL twin derive from the SAME constants
in this one definition site.

Geohash convention: lon in [-180, 180), lat in [-90, 90); the leading
(most significant) bit of the interleaved code is a LONGITUDE bit.
``PRECISION`` = 4 chars = 20 bits = 10 lon + 10 lat — the per-geohash
count table is bounded by 2^20 cells regardless of input size (the
100-TB aggregation-output bound).
"""

from __future__ import annotations

import numpy as np

ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"
PRECISION = 4                      # chars
BITS = PRECISION * 5               # 20
HALF_BITS = BITS // 2              # 10 lon bits, 10 lat bits
LON_SPAN = 360_000                 # milli-degrees
LAT_SPAN = 180_000
LAT_OFF = 5_000                    # lat_milli [0,170000) -> [-85,85) deg;
#                                    geohash lat axis spans [-90,90) =>
#                                    (lat_milli + 5000) / 180000 of the axis

_ALPHA_BYTES = np.frombuffer(ALPHABET.encode(), dtype=np.uint8)


def encode_codes(lon_milli: np.ndarray, lat_milli: np.ndarray) -> np.ndarray:
    """Vectorized 20-bit interleaved geohash codes (int64)."""
    n = 1 << HALF_BITS
    gx = np.asarray(lon_milli, np.int64) * n // LON_SPAN
    gy = (np.asarray(lat_milli, np.int64) + LAT_OFF) * n // LAT_SPAN
    code = np.zeros(len(gx), np.int64)
    for i in range(HALF_BITS):
        code |= ((gx >> i) & 1) << (2 * i + 1)   # lon bits at odd positions
        code |= ((gy >> i) & 1) << (2 * i)       # (bit 2*HALF_BITS-1 = lon MSB)
    return code


def render(code: np.ndarray) -> np.ndarray:
    """Codes -> geohash strings (base32 chars, MSB-first 5-bit groups)."""
    chars = np.empty((len(code), PRECISION), np.uint8)
    for j in range(PRECISION):
        chars[:, j] = _ALPHA_BYTES[(code >> (BITS - 5 * (j + 1))) & 31]
    return chars.view(f"S{PRECISION}").ravel().astype(str)


def encode(lon_milli: np.ndarray, lat_milli: np.ndarray) -> np.ndarray:
    """Vectorized geohash-4 strings for milli-degree geotag columns."""
    return render(encode_codes(lon_milli, lat_milli))


def encode_sql(lon_expr: str, lat_expr: str) -> tuple[str, str]:
    """DuckDB twin of encode(): returns (code_expr over the raw lon/lat
    exprs, chars_expr over a CTE alias ``c.code``) — same constants,
    same bit plan, chars via substr into the same alphabet (1-based)."""
    n = 1 << HALF_BITS
    gx = f"((({lon_expr}) * {n}) // {LON_SPAN})"
    gy = f"(((({lat_expr}) + {LAT_OFF}) * {n}) // {LAT_SPAN})"
    code = " + ".join(
        f"((({gx} >> {i}) & 1) << {2 * i + 1}) + ((({gy} >> {i}) & 1) << {2 * i})"
        for i in range(HALF_BITS))
    chars = " || ".join(
        f"substr('{ALPHABET}', CAST(((c.code >> {BITS - 5 * (j + 1)}) & 31) AS INTEGER) + 1, 1)"
        for j in range(PRECISION))
    # caller wraps: needs a CTE alias c(code)
    return code, chars


def encode_any(lon_milli: np.ndarray, lat_milli: np.ndarray,
               chars: int) -> np.ndarray:
    """Geohash strings at ANY precision (odd char counts give lon the
    extra bit, per the standard): the generalization q_geohash_census
    (6 chars) shares with the 4-char interop encode above — one
    definition site for the bit plan, validated against an
    interval-bisection reference in tests/test_property_r4.py."""
    total = 5 * chars
    lon_bits = (total + 1) // 2  # lon leads, so it gets the ceil
    lat_bits = total // 2
    gx = np.asarray(lon_milli, np.int64) * np.int64(1 << lon_bits) \
        // LON_SPAN
    gy = (np.asarray(lat_milli, np.int64) + LAT_OFF) \
        * np.int64(1 << lat_bits) // LAT_SPAN
    g = np.zeros(len(gx), np.int64)
    # bit position p (0 = MSB of the code): even p -> lon, odd p -> lat
    for p in range(total):
        if p % 2 == 0:
            src, b = gx, lon_bits - 1 - p // 2
        else:
            src, b = gy, lat_bits - 1 - p // 2
        g |= ((src >> b) & 1) << (total - 1 - p)
    out = np.empty((len(g), chars), np.uint8)
    for j in range(chars):
        out[:, j] = _ALPHA_BYTES[(g >> (total - 5 * (j + 1))) & 31]
    return out.view(f"S{chars}").ravel().astype(str).astype(object)
