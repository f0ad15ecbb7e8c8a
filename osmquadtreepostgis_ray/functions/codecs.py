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


_MIX1 = np.uint64(0x9E3779B97F4A7C15)
_MIX2 = np.uint64(0xBF58476D1CE4E5B9)
_MIX3 = np.uint64(0x94D049BB133111EB)


def _splitmix(v: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (counter-based PRNG core)."""
    v = (v + _MIX1)
    v = (v ^ (v >> np.uint64(30))) * _MIX2
    v = (v ^ (v >> np.uint64(27))) * _MIX3
    return v ^ (v >> np.uint64(31))


def synth_pixels_batch(seeds: np.ndarray, w: int, h: int) -> np.ndarray:
    """Deterministic images for MANY seeds at once: gradient + counter-
    hashed noise, fully vectorized -> (n, h, w) uint8.  The counter PRNG
    (splitmix64 over seed*stride+pixel-index) makes every pixel a pure
    function of (seed, x, y) with no per-row generator state."""
    seeds = np.asarray(seeds, dtype=np.uint64)
    n = len(seeds)
    gx = np.linspace(0, 255, w, dtype=np.float64)[None, :]
    gy = np.linspace(0, 255, h, dtype=np.float64)[:, None]
    grad = (gx + gy) / 2.0  # (h, w)
    idx = np.arange(h * w, dtype=np.uint64)
    mixed = _splitmix(seeds[:, None] * np.uint64(0x100000001B3) + idx[None, :])
    noise = (mixed % np.uint64(33)).astype(np.int64) - 16  # [-16, 16]
    img = grad.reshape(1, h, w) + noise.reshape(n, h, w)
    return np.clip(img, 0, 255).astype(np.uint8)


def synth_pixels(seed: int, w: int, h: int) -> np.ndarray:
    """Single-image form of synth_pixels_batch (same pixels)."""
    return synth_pixels_batch(np.array([seed], dtype=np.uint64), w, h)[0]


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
