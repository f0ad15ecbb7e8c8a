"""Synthetic audio corpus — the audio sibling of sources/images.py
(BASELINE.json input_hint shape, audio payload):

    (audio_id:string, bytes:binary, sr:int32, n_samples:int64,
     fmt:string, caption:string, phash:int64)

Track i is documents row doc_id with caption = text, phash = Knuth hash
of doc_id; samples are a deterministic integer sawtooth + counter-PRNG
noise (the 1-D analog of the image gradient+noise pattern), so every
sample is a pure function of (phash, index) and the DuckDB twin is
exact.  Two codecs:

- ``pcm16``: int16 little-endian samples, lossless.
- ``q8``   : 8-bit offset quantization (store (s+32768)>>8, decode
             back to mid-bucket); worst-case error 128 keeps SNR >= 40
             dB against the reference signal — the audio analog of the
             image PSNR invariant.  All shift operands are kept
             non-negative (CLAUDE.md integer-division invariant).

Sample range: saw in [-16384, 16256], noise in [-2048, 2048] — the sum
always fits int16, so no clipping anywhere (keeps the SQL twin a plain
sum).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from osmquadtreepostgis_ray.functions import codecs, geotag
from osmquadtreepostgis_ray.sources.tables import read_table

_SR_CHOICES = np.array([8000, 16000, 22050], dtype=np.int32)


def n_samples_of(doc_ids: np.ndarray) -> np.ndarray:
    ids = np.asarray(doc_ids, dtype=np.int64)
    return 1024 * (ids % 3 + 1)


def fmt_of(doc_ids: np.ndarray) -> np.ndarray:
    ids = np.asarray(doc_ids, dtype=np.int64)
    return np.where(ids % 5 == 0, "q8", "pcm16")


def synth_samples_batch(seeds: np.ndarray, n: int) -> np.ndarray:
    """(k,) seeds -> (k, n) int16 samples: integer sawtooth + splitmix64
    counter noise (same PRNG core as the image pixels)."""
    seeds = np.asarray(seeds, dtype=np.uint64)
    idx = np.arange(n, dtype=np.uint64)
    mixed = codecs._splitmix(seeds[:, None] * np.uint64(0x100000001B3) + idx[None, :])
    noise = (mixed % np.uint64(4097)).astype(np.int64) - 2048
    saw = (np.arange(n, dtype=np.int64) % 256) * 128 - 16384
    return (saw[None, :] + noise).astype(np.int16)


def encode_pcm16(s: np.ndarray) -> bytes:
    return np.ascontiguousarray(s, dtype="<i2").tobytes()


def decode_pcm16(data: bytes, n: int) -> np.ndarray:
    return np.frombuffer(data, dtype="<i2", count=n).astype(np.int16)


def encode_q8(s: np.ndarray) -> bytes:
    u = ((s.astype(np.int64) + 32768) >> 8).astype(np.uint8)
    return u.tobytes()


def decode_q8(data: bytes, n: int) -> np.ndarray:
    u = np.frombuffer(data, dtype=np.uint8, count=n)
    return ((u.astype(np.int64) << 8) - 32768 + 128).astype(np.int16)


def synth_audio_batch(batch: pa.Table) -> pa.Table:
    """documents(doc_id, text) -> audio rows, synthesized per n_samples
    group with the vectorized counter PRNG (streams; no driver state)."""
    ids = batch.column("doc_id").to_numpy()
    texts = batch.column("text").to_pylist()
    ns = n_samples_of(ids)
    fmts = fmt_of(ids)
    phash = geotag.phash_of(ids)
    payload = np.empty(len(ids), dtype=object)
    for n in np.unique(ns):
        for f in ("pcm16", "q8"):
            m = (ns == n) & (fmts == f)
            if not m.any():
                continue
            s = synth_samples_batch(phash[m], int(n))
            enc = encode_q8 if f == "q8" else encode_pcm16
            tmp = np.empty(int(m.sum()), dtype=object)
            tmp[:] = [enc(row) for row in s]
            payload[m] = tmp
    return pa.table({
        "audio_id": pa.array(np.char.mod("aud%012d", ids) if len(ids) else [], pa.string()),
        "doc_id": pa.array(ids, pa.int64()),
        "bytes": pa.array(payload.tolist(), pa.binary()),
        "sr": pa.array(_SR_CHOICES[ids % 3] if len(ids) else [], pa.int32()),
        "n_samples": pa.array(ns, pa.int64()),
        "fmt": pa.array(fmts, pa.string()),
        "caption": pa.array(texts, pa.string()),
        "phash": pa.array(phash, pa.int64()),
    })


def read_audio(sf_dir: str, repeat: int = 1,
               parallelism: int | None = None) -> ray.data.Dataset:
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"],
                      repeat=repeat, parallelism=parallelism)
    return docs.map_batches(synth_audio_batch, batch_format="pyarrow")


def payload_batch_size() -> int:
    """Memory-aware rows-per-batch for the audio payload stages: avg
    decoded size = mean(n_samples) x 2 bytes (pcm16)."""
    from osmquadtreepostgis_ray.util import payload_batch_rows
    return payload_batch_rows(float(np.mean([1024, 2048, 3072])) * 2)
