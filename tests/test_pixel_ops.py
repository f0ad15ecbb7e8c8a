"""Pixel-statistics operators: pixel_hist, glcm, codec_sse, dup_frames.
Brute numpy references re-synthesize the corpus directly from doc ids.
"""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from osmquadtreepostgis_ray import queries as Q
from osmquadtreepostgis_ray.functions import codecs, geotag
from osmquadtreepostgis_ray.sources.images import dims_of, fmt_of
from osmquadtreepostgis_ray.stages.images import FRAMEDIFF_T


def _decoded_corpus(sf_dir):
    """(doc_id, fmt, decoded (h*w,) uint8, clean ref) per image."""
    ids = np.sort(pq.read_table(f"{sf_dir}/documents.parquet",
                                columns=["doc_id"]).column("doc_id").to_numpy())
    w, h = dims_of(ids)
    fmts = fmt_of(ids)
    ph = geotag.phash_of(ids)
    for i, d in enumerate(ids):
        clean = codecs.synth_pixels(int(ph[i]), int(w[i]), int(h[i]))
        if fmts[i] == "qlossy":
            dec = codecs.decode_qlossy(codecs.encode_qlossy(clean),
                                       int(w[i]), int(h[i]))
        else:
            dec = clean
        yield int(d), str(fmts[i]), dec, clean


def test_pixel_hist_matches_brute(sf_dir):
    out = Q.q_pixel_hist(sf_dir).to_pandas() \
        .sort_values(["fmt", "bin"]).reset_index(drop=True)
    acc = {}
    for _d, f, dec, _c in _decoded_corpus(sf_dir):
        acc[f] = acc.get(f, np.zeros(16, np.int64)) \
            + np.bincount(dec.ravel() >> 4, minlength=16)
    rows = [(f, b, int(c[b])) for f, c in acc.items()
            for b in np.flatnonzero(c)]
    ref = pd.DataFrame(rows, columns=["fmt", "bin", "n"]) \
        .sort_values(["fmt", "bin"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)


def test_glcm_matches_brute(sf_dir):
    out = Q.q_glcm(sf_dir).to_pandas() \
        .sort_values(["fmt", "la", "lb"]).reset_index(drop=True)
    acc = {}
    for _d, f, dec, _c in _decoded_corpus(sf_dir):
        q = dec >> 6
        code = (q[:, :-1].astype(np.int64) * 4 + q[:, 1:]).ravel()
        acc[f] = acc.get(f, np.zeros(16, np.int64)) \
            + np.bincount(code, minlength=16)
    rows = [(f, b // 4, b % 4, int(c[b])) for f, c in acc.items()
            for b in np.flatnonzero(c)]
    ref = pd.DataFrame(rows, columns=["fmt", "la", "lb", "n"]) \
        .sort_values(["fmt", "la", "lb"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)


def test_codec_sse_psnr_floor(sf_dir):
    out = Q.q_codec_sse(sf_dir).to_pandas().set_index("image_id")
    for d, f, dec, clean in _decoded_corpus(sf_dir):
        iid = "img%012d" % d
        sse = int(((dec.astype(np.int64) - clean) ** 2).sum())
        assert int(out.loc[iid, "sse"]) == sse
        assert int(out.loc[iid, "n_px"]) == dec.size
        if f == "raw":
            assert sse == 0
    # the BASELINE.json invariant: PSNR >= 40 dB for lossy images
    lossy = out[out["sse"] > 0]
    psnr = 10 * np.log10(255.0 ** 2 * lossy["n_px"] / lossy["sse"])
    assert (psnr >= 40.0).all()


def test_dup_frames_matches_brute(sf_dir):
    out = Q.q_dup_frames(sf_dir).to_pandas() \
        .sort_values(["video_id", "f"]).reset_index(drop=True)
    ids = np.sort(pq.read_table(f"{sf_dir}/documents.parquet",
                                columns=["doc_id"]).column("doc_id").to_numpy())
    ph = geotag.phash_of(ids)
    rows = []
    for d, p in zip(ids, ph):
        nf = int(d % 4 + 2)
        frames = np.stack([codecs.synth_pixels(int(p) + f, 16, 16).ravel()
                           for f in range(nf)])
        diff = np.abs(frames[1:].astype(np.int16) - frames[:-1].astype(np.int16))
        for f, n in enumerate((diff > FRAMEDIFF_T).sum(axis=1)):
            rows.append((int(d), f, int(n)))
    ref = pd.DataFrame(rows, columns=["video_id", "f", "n_changed"]) \
        .sort_values(["video_id", "f"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)
