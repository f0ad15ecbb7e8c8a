"""The synthetic image+caption corpus (BASELINE.json input_hint shape):

    (image_id:string, bytes:binary, w:int32, h:int32, fmt:string,
     caption:string, phash:int64)

Derived deterministically from the driver's `documents` table — image i
is documents row doc_id with caption = text, phash = Knuth hash of
doc_id (functions/geotag.py), pixels = seeded gradient+noise pattern
(functions/codecs.py).  Production swaps this stage for a Lance read of
real images; everything downstream is format-identical.

Synthesis is itself a `map_batches` stage so the corpus streams — no
driver-side materialization.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from osmquadtreepostgis_ray.functions import codecs, geotag
from osmquadtreepostgis_ray.sources.tables import read_table

_W_CHOICES = np.array([16, 32, 64], dtype=np.int32)
_H_CHOICES = np.array([16, 32, 48], dtype=np.int32)


def dims_of(doc_ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    ids = np.asarray(doc_ids, dtype=np.int64)
    return _W_CHOICES[ids % 3], _H_CHOICES[ids % 3]


def fmt_of(doc_ids: np.ndarray) -> np.ndarray:
    ids = np.asarray(doc_ids, dtype=np.int64)
    return np.where(ids % 4 == 0, "qlossy", "raw")


def synth_images_batch(batch: pa.Table) -> pa.Table:
    """documents(doc_id, text) -> image rows.  Pixels are synthesized
    per (dims, fmt) GROUP with the vectorized counter-PRNG
    (codecs.synth_pixels_batch) — no per-row generator; the only row
    loop is the final ragged bytes split."""
    import numpy as _np

    ids = batch.column("doc_id").to_numpy()
    texts = batch.column("text").to_pylist()
    w, h = dims_of(ids)
    fmts = fmt_of(ids)
    phash = geotag.phash_of(ids)
    payload = _np.empty(len(ids), dtype=object)
    for wi, hi in zip(_W_CHOICES, _H_CHOICES):
        for f in ("raw", "qlossy"):
            m = (w == wi) & (h == hi) & (fmts == f)
            if not m.any():
                continue
            imgs = codecs.synth_pixels_batch(phash[m], int(wi), int(hi))
            flat = imgs.reshape(len(imgs), -1)
            if f == "qlossy":
                flat = flat // codecs._STEP
            tmp = _np.empty(int(m.sum()), dtype=object)
            tmp[:] = [row.tobytes() for row in flat]
            payload[m] = tmp
    payload = payload.tolist()
    return pa.table({
        "image_id": pa.array(np.char.mod("img%012d", ids) if len(ids) else [], pa.string()),
        "doc_id": pa.array(ids, pa.int64()),
        "bytes": pa.array(payload, pa.binary()),
        "w": pa.array(w, pa.int32()),
        "h": pa.array(h, pa.int32()),
        "fmt": pa.array(fmts, pa.string()),
        "caption": pa.array(texts, pa.string()),
        "phash": pa.array(phash, pa.int64()),
    })


def read_images(sf_dir: str, with_bytes: bool = True, repeat: int = 1,
                parallelism: int | None = None) -> ray.data.Dataset:
    """The corpus Dataset.  ``with_bytes=False`` skips pixel synthesis —
    the projection analog of not shipping image payloads through shuffles
    (SURVEY.md §7.3 'wide rows with binary payloads')."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"],
                      repeat=repeat, parallelism=parallelism)
    if with_bytes:
        return docs.map_batches(synth_images_batch, batch_format="pyarrow")
    return docs.map_batches(_synth_meta_batch, batch_format="pyarrow")


def _synth_meta_batch(batch: pa.Table) -> pa.Table:
    ids = batch.column("doc_id").to_numpy()
    w, h = dims_of(ids)
    return pa.table({
        "image_id": pa.array(np.char.mod("img%012d", ids) if len(ids) else [], pa.string()),
        "doc_id": pa.array(ids, pa.int64()),
        "w": pa.array(w, pa.int32()),
        "h": pa.array(h, pa.int32()),
        "fmt": pa.array(fmt_of(ids), pa.string()),
        "caption": batch.column("text"),
        "phash": pa.array(geotag.phash_of(ids), pa.int64()),
    })


def payload_batch_size() -> int:
    """Memory-aware rows-per-batch for the image payload stages
    (util.payload_batch_rows): the synthetic corpus's average decoded
    size is a pure function of the dims cycle.  With a REAL bytes
    column this estimate comes from parquet metadata instead
    (column total_compressed_size / num_rows) — same helper, different
    numerator."""
    from osmquadtreepostgis_ray.util import payload_batch_rows
    avg = float(np.mean((_W_CHOICES.astype(np.int64)
                         * _H_CHOICES.astype(np.int64))))
    return payload_batch_rows(avg)
