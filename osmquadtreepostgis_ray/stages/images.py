"""Multimodal (image) stages — decode / validate / resize / feature
extraction as actor-pool map_batches over opaque binary columns.

The Ray-side plumbing (schema, batch sizing, actor signature, output
layout) is real and tested; the raw/qlossy codecs are real numpy codecs
(functions/codecs.py).  External formats (jpeg/png/webp) would slot into
``codecs.decode`` — in this sandbox they raise NotImplementedError, the
clearly-marked stub the build brief asks for.

Batch sizing: binary payloads are wide — batch_size here is hundreds,
not tens of thousands, so batch x concurrency stays inside a worker
heap (the brief's memory-aware rule)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from osmquadtreepostgis_ray.functions import codecs

PSNR_FLOOR_DB = 40.0


class DecodeStats:
    """Decode each image, verify the PSNR invariant against the
    deterministic reference pixels, emit features (mean pixel, dims).
    Codec dispatch is resolved once per actor."""

    def __init__(self, target: tuple[int, int] | None = None):
        self.decoders = {"raw": codecs.decode_raw, "qlossy": codecs.decode_qlossy}
        self.target = target

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("image_id").to_pylist()
        data = batch.column("bytes").to_pylist()
        w = batch.column("w").to_numpy()
        h = batch.column("h").to_numpy()
        fmt = np.asarray(batch.column("fmt").to_pylist(), dtype=object)
        phash = batch.column("phash").to_numpy()
        n = len(ids)
        known = {"raw", "qlossy"}
        for f in set(fmt.tolist()) - known:
            raise NotImplementedError(f"codec {f!r} not available in sandbox")
        ok = np.zeros(n, dtype=bool)
        mean_px = np.zeros(n, dtype=np.int64)
        w_out = np.zeros(n, dtype=np.int64)
        h_out = np.zeros(n, dtype=np.int64)
        # vectorized per (fmt, dims) group: equal payload sizes stack into
        # one (k, h*w) matrix; PSNR/equality/mean/resize all batch ops
        for f in known:
            for wi, hi in {(int(a), int(b)) for a, b in zip(w[fmt == f], h[fmt == f])}:
                m = (fmt == f) & (w == wi) & (h == hi)
                if not m.any():
                    continue
                k = int(m.sum())
                buf = np.frombuffer(b"".join(data[i] for i in np.flatnonzero(m)),
                                    dtype=np.uint8).reshape(k, hi * wi)
                if f == "qlossy":
                    dec = (buf.astype(np.uint16) * codecs._STEP
                           + codecs._STEP // 2).clip(0, 255).astype(np.uint8)
                else:
                    dec = buf
                ref = codecs.synth_pixels_batch(phash[m], wi, hi).reshape(k, hi * wi)
                if f == "raw":
                    ok[m] = (dec == ref).all(axis=1)
                else:
                    mse = np.mean((dec.astype(np.float64) - ref) ** 2, axis=1)
                    with np.errstate(divide="ignore"):
                        ok[m] = np.where(mse == 0, True,
                                         10.0 * np.log10(255.0 ** 2 / np.maximum(mse, 1e-30))
                                         >= PSNR_FLOOR_DB)
                imgs = dec.reshape(k, hi, wi)
                if self.target:
                    ow, oh = self.target
                    yi = (np.arange(oh) * hi) // oh
                    xi = (np.arange(ow) * wi) // ow
                    imgs = imgs[:, yi[:, None], xi[None, :]]
                mean_px[m] = imgs.reshape(k, -1).mean(axis=1).astype(np.int64)
                h_out[m], w_out[m] = imgs.shape[1], imgs.shape[2]
        return pa.table({
            "image_id": pa.array(ids, pa.string()),
            "psnr_ok": pa.array(ok, pa.bool_()),
            "mean_pixel": pa.array(mean_px, pa.int64()),
            "w_out": pa.array(w_out, pa.int64()),
            "h_out": pa.array(h_out, pa.int64()),
        })


def synth_videos_batch(batch: pa.Table) -> pa.Table:
    """documents -> synthetic 'video' rows: F = (doc_id % 4) + 2 raw
    frames concatenated in one opaque binary payload (frame f pixels =
    synth_pixels(phash + f)).  The video analog of sources/images.py."""
    from osmquadtreepostgis_ray.functions import geotag

    ids = batch.column("doc_id").to_numpy()
    phash = geotag.phash_of(ids)
    w = np.full(len(ids), 16, dtype=np.int32)
    h = np.full(len(ids), 16, dtype=np.int32)
    nframes = (ids % 4 + 2).astype(np.int64)
    payload = [
        b"".join(codecs.encode_raw(codecs.synth_pixels(int(p) + f, int(wi), int(hi)))
                 for f in range(int(nf)))
        for p, wi, hi, nf in zip(phash, w, h, nframes)
    ]
    return pa.table({
        "video_id": pa.array(ids, pa.int64()),
        "bytes": pa.array(payload, pa.binary()),
        "w": pa.array(w, pa.int32()),
        "h": pa.array(h, pa.int32()),
        "n_frames": pa.array(nframes, pa.int64()),
        "fmt": pa.array(["rawv"] * len(ids), pa.string()),
    })


class FrameSample:
    """Actor-pool video stage: split the opaque payload into frames,
    keep every `stride`-th frame, emit one row per sampled frame with
    per-frame features — the 1->N multimodal explode (flat_map shape).
    External containers (mp4 etc.) would slot in here; in-sandbox the
    'rawv' concatenated-raw format is real and byte-exact."""

    def __init__(self, stride: int = 2):
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        # vectorized per (w, h, n_frames) group, like DecodeStats: equal
        # payload sizes stack into one (k, frames, h*w) cube; stride
        # sampling is a slice, per-frame features one mean over axis 2
        w = batch.column("w").to_numpy()
        h = batch.column("h").to_numpy()
        nf = batch.column("n_frames").to_numpy()
        vids = batch.column("video_id").to_numpy()
        data = batch.column("bytes").to_pylist()
        fmts = np.asarray(batch.column("fmt").to_pylist(), dtype=object)
        for f in set(fmts.tolist()) - {"rawv"}:
            raise NotImplementedError(f"video container {f!r} not available in sandbox")
        out_id, out_f, out_mean = [], [], []
        for wi, hi, nfi in {(int(a), int(b), int(c)) for a, b, c in zip(w, h, nf)}:
            m = (w == wi) & (h == hi) & (nf == nfi)
            k = int(m.sum())
            if not k:
                continue
            cube = np.frombuffer(b"".join(data[i] for i in np.flatnonzero(m)),
                                 dtype=np.uint8).reshape(k, nfi, hi * wi)
            sampled = cube[:, ::self.stride, :]              # (k, s, h*w)
            s = sampled.shape[1]
            means = sampled.mean(axis=2).astype(np.int64)
            fidx = np.arange(0, nfi, self.stride, dtype=np.int64)
            out_id.append(np.repeat(vids[m], s))
            out_f.append(np.tile(fidx, k))
            out_mean.append(means.ravel())
        cat = (lambda xs: np.concatenate(xs) if xs else np.empty(0, np.int64))
        return pa.table({
            "video_id": pa.array(cat(out_id), pa.int64()),
            "frame_idx": pa.array(cat(out_f), pa.int64()),
            "mean_pixel": pa.array(cat(out_mean), pa.int64()),
        })


class ResizeStage:
    """Pure resize actor stage: bytes -> resized bytes (raw format out)."""

    def __init__(self, ow: int, oh: int):
        self.ow, self.oh = ow, oh

    def __call__(self, batch: pa.Table) -> pa.Table:
        data = batch.column("bytes").to_pylist()
        w = batch.column("w").to_numpy()
        h = batch.column("h").to_numpy()
        fmt = batch.column("fmt").to_pylist()
        out = [
            codecs.encode_raw(codecs.resize_nearest(
                codecs.decode(data[i], int(w[i]), int(h[i]), fmt[i]), self.ow, self.oh))
            for i in range(len(data))
        ]
        n = batch.num_rows
        batch = batch.set_column(batch.schema.get_field_index("bytes"), "bytes",
                                 pa.array(out, pa.binary()))
        batch = batch.set_column(batch.schema.get_field_index("w"), "w",
                                 pa.array(np.full(n, self.ow, dtype=np.int32), pa.int32()))
        batch = batch.set_column(batch.schema.get_field_index("h"), "h",
                                 pa.array(np.full(n, self.oh, dtype=np.int32), pa.int32()))
        return batch.set_column(batch.schema.get_field_index("fmt"), "fmt",
                                pa.array(["raw"] * n, pa.string()))
