"""Audio stages — decode / SNR invariant / feature extraction /
windowed explode over opaque PCM binary columns, mirroring
stages/images.py for the audio payload.  External codecs (mp3/opus/…)
would slot into the decoder dispatch; in-sandbox the pcm16/q8 numpy
codecs are real and byte-exact (sources/audio.py).

All features are exact integers (sum/mean-floor/peak of |s|) so the
DuckDB twins compare value-for-value; SNR >= 40 dB is MEASURED here
against the deterministic reference signal while the oracle states the
invariant (same split as the image PSNR check)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from osmquadtreepostgis_ray.sources import audio as A

SNR_FLOOR_DB = 40.0


class AudioFeatures:
    """Decode each track, verify the SNR invariant, emit integer
    features (mean |s| floor, peak |s|).  Vectorized per (fmt,
    n_samples) group — equal payload sizes stack into one matrix."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("audio_id").to_pylist()
        data = batch.column("bytes").to_pylist()
        ns = batch.column("n_samples").to_numpy()
        fmt = np.asarray(batch.column("fmt").to_pylist(), dtype=object)
        phash = batch.column("phash").to_numpy()
        n = len(ids)
        for f in set(fmt.tolist()) - {"pcm16", "q8"}:
            raise NotImplementedError(f"audio codec {f!r} not available in sandbox")
        ok = np.zeros(n, dtype=bool)
        mean_abs = np.zeros(n, dtype=np.int64)
        peak = np.zeros(n, dtype=np.int64)
        for f in ("pcm16", "q8"):
            for nn in np.unique(ns[fmt == f]) if (fmt == f).any() else []:
                m = (fmt == f) & (ns == nn)
                k = int(m.sum())
                width = int(nn) if f == "q8" else 2 * int(nn)
                buf = np.frombuffer(b"".join(data[i] for i in np.flatnonzero(m)),
                                    dtype=np.uint8).reshape(k, width)
                if f == "q8":
                    dec = ((buf.astype(np.int64) << 8) - 32768 + 128)
                else:
                    dec = buf.view("<i2").astype(np.int64)
                ref = A.synth_samples_batch(phash[m], int(nn)).astype(np.int64)
                if f == "pcm16":
                    ok[m] = (dec == ref).all(axis=1)
                else:
                    err = dec - ref
                    sig = np.mean(ref.astype(np.float64) ** 2, axis=1)
                    mse = np.mean(err.astype(np.float64) ** 2, axis=1)
                    with np.errstate(divide="ignore"):
                        ok[m] = np.where(mse == 0, True,
                                         10.0 * np.log10(sig / np.maximum(mse, 1e-30))
                                         >= SNR_FLOOR_DB)
                ab = np.abs(dec)
                mean_abs[m] = ab.sum(axis=1) // int(nn)
                peak[m] = ab.max(axis=1)
        return pa.table({
            "audio_id": pa.array(ids, pa.string()),
            "snr_ok": pa.array(ok, pa.bool_()),
            "mean_abs": pa.array(mean_abs, pa.int64()),
            "peak": pa.array(peak, pa.int64()),
            "n_samples": pa.array(ns.astype(np.int64), pa.int64()),
        })


class WindowEnergy:
    """1->N windowed explode (the audio frame-sample analog): split each
    decoded track into `window`-sample windows, keep every `stride`-th,
    emit one row per kept window with its exact |s| sum.  Window count
    is a pure function of the row; vectorized as one reshape per
    (fmt, n_samples) group."""

    def __init__(self, window: int = 256, stride: int = 2):
        self.window, self.stride = window, stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("audio_id").to_pylist()
        data = batch.column("bytes").to_pylist()
        ns = batch.column("n_samples").to_numpy()
        fmt = np.asarray(batch.column("fmt").to_pylist(), dtype=object)
        out_id, out_w, out_s = [], [], []
        w = self.window
        for f in ("pcm16", "q8"):
            for nn in np.unique(ns[fmt == f]) if (fmt == f).any() else []:
                m = (fmt == f) & (ns == nn)
                k = int(m.sum())
                width = int(nn) if f == "q8" else 2 * int(nn)
                buf = np.frombuffer(b"".join(data[i] for i in np.flatnonzero(m)),
                                    dtype=np.uint8).reshape(k, width)
                if f == "q8":
                    dec = ((buf.astype(np.int64) << 8) - 32768 + 128)
                else:
                    dec = buf.view("<i2").astype(np.int64)
                nw = int(nn) // w
                sums = np.abs(dec).reshape(k, nw, w).sum(axis=2)  # (k, nw)
                kept = np.arange(0, nw, self.stride, dtype=np.int64)
                sel = np.asarray(ids, dtype=object)[np.flatnonzero(m)]
                out_id.append(np.repeat(sel, len(kept)))
                out_w.append(np.tile(kept, k))
                out_s.append(sums[:, kept].reshape(-1))
        if not out_id:
            return pa.table({"audio_id": pa.array([], pa.string()),
                             "win_idx": pa.array([], pa.int64()),
                             "sum_abs": pa.array([], pa.int64())})
        return pa.table({
            "audio_id": pa.array(np.concatenate(out_id).tolist(), pa.string()),
            "win_idx": pa.array(np.concatenate(out_w), pa.int64()),
            "sum_abs": pa.array(np.concatenate(out_s), pa.int64()),
        })


SILENCE_T = 1024   # |sample| <= T counts as silent


class SilenceRuns:
    """Silence-run detection per track (the VAD-style gating screen an
    audio-curation pipeline drops dead-air clips with): runs of
    consecutive samples with |s| <= SILENCE_T, reported as run count,
    longest run and total silent samples.  Run lengths are computed
    with the vectorized cumsum-reset trick (no per-row loop); tracks
    with no silent sample emit nothing (the oracle's islands CTE has no
    row for them).  Row-pure."""

    def __init__(self, thresh: int = SILENCE_T):
        self.thresh = thresh

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("audio_id").to_pylist()
        data = batch.column("bytes").to_pylist()
        ns = batch.column("n_samples").to_numpy()
        fmt = np.asarray(batch.column("fmt").to_pylist(), dtype=object)
        out_id, out_r, out_m, out_s = [], [], [], []
        for f in ("pcm16", "q8"):
            for nn in np.unique(ns[fmt == f]) if (fmt == f).any() else []:
                m = (fmt == f) & (ns == nn)
                k = int(m.sum())
                width = int(nn) if f == "q8" else 2 * int(nn)
                buf = np.frombuffer(b"".join(data[i]
                                             for i in np.flatnonzero(m)),
                                    dtype=np.uint8).reshape(k, width)
                if f == "q8":
                    dec = (buf.astype(np.int64) << 8) - 32768 + 128
                else:
                    dec = buf.view("<i2").astype(np.int64)
                z = (np.abs(dec) <= self.thresh).astype(np.int64)
                starts = z.copy()
                starts[:, 1:] &= 1 - z[:, :-1]
                cs = np.cumsum(z, axis=1)
                reset = np.where(z == 0, cs, 0)
                run = cs - np.maximum.accumulate(reset, axis=1)
                n_runs = starts.sum(axis=1)
                keep = n_runs > 0
                sel = np.asarray(ids, dtype=object)[np.flatnonzero(m)][keep]
                out_id.append(sel)
                out_r.append(n_runs[keep])
                out_m.append(run.max(axis=1)[keep])
                out_s.append(z.sum(axis=1)[keep])
        cat = (lambda xs: np.concatenate(xs) if xs
               else np.empty(0, np.int64))
        idc = (np.concatenate(out_id) if out_id
               else np.empty(0, dtype=object))
        return pa.table({"audio_id": pa.array(idc, pa.string()),
                         "n_runs": pa.array(cat(out_r), pa.int64()),
                         "max_run": pa.array(cat(out_m), pa.int64()),
                         "n_silent": pa.array(cat(out_s), pa.int64())})
