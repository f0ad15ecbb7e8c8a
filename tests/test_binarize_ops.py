"""Per-image binarization operators: otsu, morphology.
Brute references use scalar Python loops (exact Fractions for the Otsu
score) — independent of the vectorized kernels they check.
"""

from fractions import Fraction

import numpy as np
import pandas as pd

from osmquadtreepostgis_ray import queries as Q
from osmquadtreepostgis_ray.sources.images import dims_of
from osmquadtreepostgis_ray.stages.images import MORPH_FG, OTSU_BINS
from tests.test_pixel_ops import _decoded_corpus


def test_otsu_matches_brute(sf_dir):
    out = Q.q_otsu(sf_dir).to_pandas() \
        .sort_values("image_id").reset_index(drop=True)
    rows = []
    for d, _f, dec, _c in _decoded_corpus(sf_dir):
        bins = dec.ravel() >> 4
        hist = np.bincount(bins, minlength=OTSU_BINS)
        npx = int(hist.sum())
        s = int((hist * np.arange(OTSU_BINS)).sum())
        best = None
        for t in range(OTSU_BINS - 1):
            n0 = int(hist[: t + 1].sum())
            n1 = npx - n0
            if n0 == 0 or n1 == 0:
                continue
            s0 = int((hist[: t + 1] * np.arange(t + 1)).sum())
            a = s0 * n1 - (s - s0) * n0
            sc = Fraction(a * a, n0 * n1)   # exact — ties to smallest t
            if best is None or sc > best[0]:
                best = (sc, t, n1)
        rows.append(("img%012d" % d, best[1] if best else -1,
                     best[2] if best else 0))
    ref = pd.DataFrame(rows, columns=["image_id", "otsu_bin", "fg_n"]) \
        .sort_values("image_id").reset_index(drop=True)
    # the corpus gradient guarantees a non-degenerate threshold everywhere
    # (the shared gradient makes the BIN uniform; fg_n varies with dims)
    assert (ref["otsu_bin"] >= 0).all() and ref["fg_n"].nunique() > 1
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)


def test_morphology_matches_brute(sf_dir):
    out = Q.q_morphology(sf_dir).to_pandas() \
        .sort_values("image_id").reset_index(drop=True)
    ids = np.sort(out["image_id"].str.slice(3).astype(np.int64).to_numpy())
    w, h = dims_of(ids)
    dims = {int(d): (int(wi), int(hi)) for d, wi, hi in zip(ids, w, h)}
    rows = []
    for d, _f, dec, _c in _decoded_corpus(sf_dir):
        wi, hi = dims[d]
        m = (dec.reshape(hi, wi) >= MORPH_FG)
        ero = dil = 0
        for r in range(hi):
            for c in range(wi):
                win = [bool(m[rr, cc]) if 0 <= rr < hi and 0 <= cc < wi
                       else None
                       for rr in (r - 1, r, r + 1) for cc in (c - 1, c, c + 1)]
                if all(v is True for v in win):        # full window, OOB=0
                    ero += 1
                if any(v is True for v in win):        # clipped window
                    dil += 1
        rows.append(("img%012d" % d, ero, dil))
    ref = pd.DataFrame(rows, columns=["image_id", "eroded_n", "dilated_n"]) \
        .sort_values("image_id").reset_index(drop=True)
    assert (ref["dilated_n"] >= ref["eroded_n"]).all()
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)


def test_blobs_matches_brute_bfs(sf_dir):
    from osmquadtreepostgis_ray.stages.images import BLOB_FG

    out = Q.q_blobs(sf_dir).to_pandas() \
        .sort_values("image_id").reset_index(drop=True)
    ids = np.sort(out["image_id"].str.slice(3).astype(np.int64).to_numpy())
    w, h = dims_of(ids)
    dims = {int(d): (int(wi), int(hi)) for d, wi, hi in zip(ids, w, h)}
    rows = []
    for d, _f, dec, _c in _decoded_corpus(sf_dir):
        wi, hi = dims[d]
        m = (dec.reshape(hi, wi) >= BLOB_FG)
        seen = np.zeros_like(m)
        sizes = []
        for r0 in range(hi):
            for c0 in range(wi):
                if not m[r0, c0] or seen[r0, c0]:
                    continue
                stack, sz = [(r0, c0)], 0
                seen[r0, c0] = True
                while stack:
                    r, c = stack.pop()
                    sz += 1
                    for rr, cc in ((r - 1, c), (r + 1, c),
                                   (r, c - 1), (r, c + 1)):
                        if 0 <= rr < hi and 0 <= cc < wi \
                                and m[rr, cc] and not seen[rr, cc]:
                            seen[rr, cc] = True
                            stack.append((rr, cc))
                sizes.append(sz)
        rows.append(("img%012d" % d, len(sizes),
                     max(sizes) if sizes else 0, int(m.sum())))
    ref = pd.DataFrame(rows, columns=["image_id", "n_blobs",
                                      "max_blob", "fg_n"]) \
        .sort_values("image_id").reset_index(drop=True)
    assert (ref["n_blobs"] > 1).any()       # mask is speckled, not one blob
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)
