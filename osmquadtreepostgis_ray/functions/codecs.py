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


def rle_runs_q(imgs: np.ndarray) -> np.ndarray:
    """Vectorized run counts for the RLE-over-quantized codec: imgs is
    (k, n_px) uint8 DECODED pixels; runs are over the row-major
    quantized (//_STEP) sequence, uint16 run counts (every corpus image
    is < 65536 px, so runs never split).  n_runs = 1 + #adjacent
    changes — one whole-matrix compare, no per-image loop."""
    q = (np.ascontiguousarray(imgs, dtype=np.uint8) // _STEP)
    if q.shape[1] == 0:
        return np.zeros(q.shape[0], np.int64)
    return 1 + (q[:, 1:] != q[:, :-1]).sum(axis=1).astype(np.int64)


def encode_rleq(img: np.ndarray) -> bytes:
    """RLE over the quantized image: per run, 1 byte level + 2 bytes
    little-endian count.  Lossy exactly like qlossy (same quantizer,
    PSNR >= 40 dB), but variable-length — the 'real codec' slot for
    the transcode stage."""
    q = (np.ascontiguousarray(img, dtype=np.uint8) // _STEP).ravel()
    if len(q) == 0:
        return b""
    b = np.flatnonzero(q[1:] != q[:-1])
    starts = np.concatenate([[0], b + 1])
    ends = np.concatenate([b + 1, [len(q)]])
    out = np.empty((len(starts), 3), np.uint8)
    out[:, 0] = q[starts]
    counts = (ends - starts).astype(np.uint16)
    out[:, 1] = counts & 0xFF
    out[:, 2] = counts >> 8
    return out.tobytes()


def decode_rleq(data: bytes, w: int, h: int) -> np.ndarray:
    """Inverse of encode_rleq -> mid-bucket dequantized uint8 (h, w),
    identical pixels to decode_qlossy of the same source image."""
    rec = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
    counts = rec[:, 1].astype(np.int64) | (rec[:, 2].astype(np.int64) << 8)
    q = np.repeat(rec[:, 0], counts)
    return (q.astype(np.uint16) * _STEP + _STEP // 2).clip(0, 255) \
        .astype(np.uint8)[: w * h].reshape(h, w)
