"""Deterministic synthetic geotags.

The reference gets coordinates from the OSM pbf; this engine's corpus is
image+caption rows (BASELINE.json input_hint) whose location is a pure
function of the ``phash`` column — SURVEY.md §7.0.  Everything here is
exact int64 arithmetic so the DuckDB oracle can replicate it: Knuth
multiplicative hashing, milli-degree fixed point, no wrapping 64-bit
multiplies (DuckDB BIGINT raises on overflow).

Coordinate convention: ``lon_milli`` in [0, 360000) maps to lon degrees
[-180, 180); ``lat_milli`` in [0, 170000) maps to lat [-85, 85) (web-
mercator-safe band, like the reference's EPSG:3857 output).
"""

from __future__ import annotations

import numpy as np

# Knuth multiplier (2654435761 = 2^32 * golden ratio) and a prime modulus
# < 2^53 so products of ids up to ~3e9 stay in int64 and DuckDB BIGINT.
PHASH_MULT = 2654435761
PHASH_ADD = 101
PHASH_MOD = 9007199254740997  # smallest prime > 2^53

LON_MOD = 360_000
LAT_MOD = 170_000

# events-table geotag coefficients (FIXTURES.md F5 "cell encode" row)
EV_LON_A, EV_LON_B = 9973, 7919
EV_LAT_A, EV_LAT_B = 7907, 6007


def phash_of(ids: np.ndarray) -> np.ndarray:
    """Synthetic perceptual-hash column: pure function of the row id."""
    ids = np.asarray(ids, dtype=np.int64)
    return (ids * PHASH_MULT + PHASH_ADD) % PHASH_MOD


def phash_sql(id_expr: str) -> str:
    return f"((({id_expr}) * {PHASH_MULT} + {PHASH_ADD}) % {PHASH_MOD})"


def lonlat_milli_from_phash(phash: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    phash = np.asarray(phash, dtype=np.int64)
    return phash % LON_MOD, (phash // LON_MOD) % LAT_MOD


def lonlat_milli_sql(phash_expr: str) -> tuple[str, str]:
    return (f"(({phash_expr}) % {LON_MOD})",
            f"((({phash_expr}) // {LON_MOD}) % {LAT_MOD})")


def event_lonlat_milli(user_id: np.ndarray, event_id: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Geotag for the driver `events` table (user_id/event_id are small)."""
    u = np.asarray(user_id, dtype=np.int64)
    e = np.asarray(event_id, dtype=np.int64)
    return (u * EV_LON_A + e * EV_LON_B) % LON_MOD, (u * EV_LAT_A + e * EV_LAT_B) % LAT_MOD


def event_lonlat_milli_sql(user_expr: str = "user_id", event_expr: str = "event_id") -> tuple[str, str]:
    return (f"((({user_expr}) * {EV_LON_A} + ({event_expr}) * {EV_LON_B}) % {LON_MOD})",
            f"((({user_expr}) * {EV_LAT_A} + ({event_expr}) * {EV_LAT_B}) % {LAT_MOD})")


def milli_to_degrees(lon_milli: np.ndarray, lat_milli: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    return (np.asarray(lon_milli, dtype=np.float64) / 1000.0 - 180.0,
            np.asarray(lat_milli, dtype=np.float64) / 1000.0 - 85.0)


def milli_to_fixed(lon_milli: np.ndarray, lat_milli: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Milli-degree offsets -> the quadtree module's 1e7 fixed point.
    lat band [-85,85) sits inside the quadtree's [-90,90) domain."""
    lon_fixed = np.asarray(lon_milli, dtype=np.int64) * 10_000
    lat_fixed = (np.asarray(lat_milli, dtype=np.int64) + 5_000) * 10_000
    return lon_fixed, lat_fixed


def footprint_milli(lon_milli, lat_milli, w, h) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Image footprint box (the polygon analog): half-extent scales with
    pixel dims — w pixels -> w milli-degrees east/west, h north/south.
    Exact ints; clipped to the coordinate domain."""
    lo = np.asarray(lon_milli, dtype=np.int64)
    la = np.asarray(lat_milli, dtype=np.int64)
    w = np.asarray(w, dtype=np.int64)
    h = np.asarray(h, dtype=np.int64)
    return (np.clip(lo - w, 0, LON_MOD - 1), np.clip(la - h, 0, LAT_MOD - 1),
            np.clip(lo + w, 0, LON_MOD - 1), np.clip(la + h, 0, LAT_MOD - 1))
