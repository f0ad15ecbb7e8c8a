"""Batch: hist_equalize, box5, crossmodal_recall — brute references."""

import numpy as np
import pandas as pd

from osmquadtreepostgis_ray import queries as Q
from osmquadtreepostgis_ray.stages.images import LBP_DIM

from test_pixel_ops import _decoded_corpus


def test_hist_equalize_matches_brute(sf_dir):
    out = Q.q_hist_equalize(sf_dir).to_pandas() \
        .sort_values("image_id").reset_index(drop=True)
    rows = []
    for d, _f, dec, _c in _decoded_corpus(sf_dir):
        v = dec.ravel().astype(np.int64)
        npx = v.size
        hist = np.bincount(v, minlength=256)
        cdf = hist.cumsum()
        cfmin = int(cdf[cdf > 0].min())
        if npx == cfmin:
            eq = np.zeros_like(v)
        else:
            lut = (cdf - cfmin).clip(min=0) * 255 // (npx - cfmin)
            eq = lut[v]
        rows.append((f"img{d:012d}", int(eq.sum()), int(eq.min()),
                     int(eq.max()), npx))
    ref = pd.DataFrame(rows, columns=["image_id", "eq_sum", "eq_min",
                                      "eq_max", "n_px"]) \
        .sort_values("image_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)
    # equalized range always spans to 255 for non-constant images
    assert (out["eq_max"] == 255).all()


def test_box5_matches_brute(sf_dir):
    out = Q.q_box5(sf_dir).to_pandas() \
        .sort_values("image_id").reset_index(drop=True)
    rows = []
    for d, _f, dec, _c in _decoded_corpus(sf_dir):
        if dec.shape != (LBP_DIM, LBP_DIM):
            continue
        a = dec.astype(np.int64)
        h, w = a.shape
        bs = sum(a[2 + dy:h - 2 + dy, 2 + dx:w - 2 + dx]
                 for dy in range(-2, 3) for dx in range(-2, 3))
        rows.append((f"img{d:012d}", int(bs.sum()), int(bs.min()),
                     int(bs.max())))
    ref = pd.DataFrame(rows, columns=["image_id", "box_sum", "box_min",
                                      "box_max"]) \
        .sort_values("image_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)


def test_crossmodal_recall_consistent_with_topk(sf_dir):
    out = Q.q_crossmodal_recall(sf_dir).to_pandas()
    topk = Q.q_crossmodal_knn(sf_dir).to_pandas()
    uq = topk["query_id"].unique()
    hits = sum(1 for q in uq
               if (topk.loc[topk["query_id"] == q, "doc_id"] == q).any())
    assert int(out["n_queries"].iloc[0]) == len(uq)
    assert int(out["hits_at_k"].iloc[0]) == hits
    assert 0 <= hits <= len(uq)
