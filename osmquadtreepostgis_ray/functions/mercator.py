"""EPSG:3857 web-mercator forward/inverse transform — the engine's F6
(reference: forward_transform / round_2dp calls, src/validategeoms.cpp:148-161).

Vectorized numpy; optional 2-dp rounding matches the reference's
round_geometry flag (src/processpostgis.hpp + src/validategeoms.cpp:153).
"""

from __future__ import annotations

import numpy as np

R = 6378137.0
ORIGIN = np.pi * R  # 20037508.34...


def forward(lon: np.ndarray, lat: np.ndarray, round_2dp: bool = False) -> tuple[np.ndarray, np.ndarray]:
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    x = lon * (ORIGIN / 180.0)
    y = np.log(np.tan((90.0 + lat) * (np.pi / 360.0))) * R
    if round_2dp:
        x = np.round(x, 2)
        y = np.round(y, 2)
    return x, y


def inverse(x: np.ndarray, y: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    lon = x / (ORIGIN / 180.0)
    lat = np.degrees(2.0 * np.arctan(np.exp(y / R)) - np.pi / 2.0)
    return lon, lat
