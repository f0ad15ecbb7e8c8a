"""Batch: letterbox, radial_profile, quadrant_balance — brute refs
re-synthesizing decoded pixels directly from doc ids."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from osmquadtreepostgis_ray import queries as Q
from osmquadtreepostgis_ray.functions import codecs, geotag
from osmquadtreepostgis_ray.sources.images import dims_of, fmt_of
from osmquadtreepostgis_ray.stages.images import LETTERBOX_B, RING_CAP


def _decoded_corpus(sf_dir):
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
        yield int(d), str(fmts[i]), int(w[i]), int(h[i]), \
            np.asarray(dec).ravel()


def test_letterbox_matches_brute(sf_dir):
    out = Q.q_letterbox(sf_dir).to_pandas() \
        .sort_values("image_id").reset_index(drop=True)
    rows = []
    for d, _f, wi, hi, dec in _decoded_corpus(sf_dir):
        x = np.arange(wi * hi) % wi
        y = np.arange(wi * hi) // wi
        b = ((x < LETTERBOX_B) | (x >= wi - LETTERBOX_B)
             | (y < LETTERBOX_B) | (y >= hi - LETTERBOX_B))
        bs = int(dec[b].astype(np.int64).sum())
        ins = int(dec.astype(np.int64).sum()) - bs
        nb, ni = int(b.sum()), wi * hi - int(b.sum())
        rows.append(("img%012d" % d, bs, ins, nb, ni,
                     int(bs * ni * 2 < ins * nb)))
    ref = pd.DataFrame(rows, columns=["image_id", "border_sum", "inner_sum",
                                      "n_border", "n_inner", "framed"]) \
        .sort_values("image_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)


def test_radial_profile_matches_brute(sf_dir):
    out = Q.q_radial_profile(sf_dir).to_pandas() \
        .sort_values(["fmt", "ring"]).reset_index(drop=True)
    acc = {}
    for _d, f, wi, hi, dec in _decoded_corpus(sf_dir):
        x = np.arange(wi * hi) % wi
        y = np.arange(wi * hi) // wi
        ring = np.minimum(np.minimum(np.minimum(x, wi - 1 - x),
                                     np.minimum(y, hi - 1 - y)) // 2,
                          RING_CAP - 1)
        s, n = acc.setdefault(f, (np.zeros(RING_CAP, np.int64),
                                  np.zeros(RING_CAP, np.int64)))
        np.add.at(s, ring, dec.astype(np.int64))
        np.add.at(n, ring, 1)
    rows = [(f, r, int(s[r]), int(n[r])) for f, (s, n) in acc.items()
            for r in np.flatnonzero(n)]
    ref = pd.DataFrame(rows, columns=["fmt", "ring", "s", "n"]) \
        .sort_values(["fmt", "ring"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)


def test_quadrant_balance_matches_brute(sf_dir):
    out = Q.q_quadrant_balance(sf_dir).to_pandas() \
        .sort_values("image_id").reset_index(drop=True)
    rows = []
    for d, _f, wi, hi, dec in _decoded_corpus(sf_dir):
        x = np.arange(wi * hi) % wi
        y = np.arange(wi * hi) // wi
        qs = [int(dec[(2 * y < hi) & (2 * x < wi)].astype(np.int64).sum()),
              int(dec[(2 * y < hi) & (2 * x >= wi)].astype(np.int64).sum()),
              int(dec[(2 * y >= hi) & (2 * x < wi)].astype(np.int64).sum()),
              int(dec[(2 * y >= hi) & (2 * x >= wi)].astype(np.int64).sum())]
        rows.append(("img%012d" % d, *qs, int(np.argmax(qs))))
    ref = pd.DataFrame(rows, columns=["image_id", "q00", "q01", "q10",
                                      "q11", "dominant"]) \
        .sort_values("image_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)
