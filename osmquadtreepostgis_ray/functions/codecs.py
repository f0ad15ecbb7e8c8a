"""Image codecs for the synthetic corpus — numpy only (no PIL/libjpeg in
the sandbox; real decoders slot in behind the same interface, see
stages/images.py).

Two formats per FIXTURES.md F1:
- ``raw``    : uint8 gray pixels, row-major, lossless.
- ``qlossy`` : quantize-to-Q-levels lossy codec; PSNR stays >= 40 dB for
               Q=64 on 8-bit data (max error = 2, MSE <= 4/3).

The per-row invariant (BASELINE.json): decoded pixels allclose /
PSNR >= 40 dB for lossy, exact for raw.
"""

from __future__ import annotations

import numpy as np

QLOSSY_LEVELS = 64
_STEP = 256 // QLOSSY_LEVELS  # 4


def synth_pixels(seed: int, w: int, h: int) -> np.ndarray:
    """Deterministic per-row image: gradient + seeded noise (uint8)."""
    rs = np.random.RandomState(seed % (2 ** 31))
    gx = np.linspace(0, 255, w, dtype=np.float64)[None, :]
    gy = np.linspace(0, 255, h, dtype=np.float64)[:, None]
    img = (gx + gy) / 2.0 + rs.randint(-16, 17, size=(h, w))
    return np.clip(img, 0, 255).astype(np.uint8)


def encode_raw(img: np.ndarray) -> bytes:
    return np.ascontiguousarray(img, dtype=np.uint8).tobytes()


def decode_raw(data: bytes, w: int, h: int) -> np.ndarray:
    return np.frombuffer(data, dtype=np.uint8, count=w * h).reshape(h, w)


def encode_qlossy(img: np.ndarray) -> bytes:
    q = (np.ascontiguousarray(img, dtype=np.uint8) // _STEP).astype(np.uint8)
    return q.tobytes()


def decode_qlossy(data: bytes, w: int, h: int) -> np.ndarray:
    q = np.frombuffer(data, dtype=np.uint8, count=w * h).reshape(h, w)
    return (q.astype(np.uint16) * _STEP + _STEP // 2).clip(0, 255).astype(np.uint8)


def encode(img: np.ndarray, fmt: str) -> bytes:
    if fmt == "raw":
        return encode_raw(img)
    if fmt == "qlossy":
        return encode_qlossy(img)
    raise NotImplementedError(f"codec {fmt!r} not available in this sandbox")


def decode(data: bytes, w: int, h: int, fmt: str) -> np.ndarray:
    if fmt == "raw":
        return decode_raw(data, w, h)
    if fmt == "qlossy":
        return decode_qlossy(data, w, h)
    raise NotImplementedError(f"codec {fmt!r} not available in this sandbox")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0 ** 2 / mse)


def resize_nearest(img: np.ndarray, ow: int, oh: int) -> np.ndarray:
    """Nearest-neighbor resize (numpy indexing — the real-resize slot)."""
    h, w = img.shape
    yi = (np.arange(oh) * h) // oh
    xi = (np.arange(ow) * w) // ow
    return img[yi[:, None], xi[None, :]]
