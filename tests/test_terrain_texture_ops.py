"""Terrain/texture/variogram operators: slope_aspect, lbp, median3x3,
variogram — brute numpy references recomputed from the raw tables."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from osmquadtreepostgis_ray import queries as Q
from osmquadtreepostgis_ray.functions import geotag
from osmquadtreepostgis_ray.stages.images import LBP_DIM

from test_pixel_ops import _decoded_corpus


def test_slope_aspect_matches_brute(sf_dir):
    out = Q.q_slope_aspect(sf_dir).to_pandas() \
        .sort_values(["gy", "gx"]).reset_index(drop=True)
    base = Q.q_rasterize(sf_dir).to_pandas()
    from osmquadtreepostgis_ray.functions import quadtree
    tx, ty, _ = quadtree.decode(base["tile"].to_numpy())
    gx = tx * 16 + base["px"].to_numpy()
    gy = ty * 16 + base["py"].to_numpy()
    z = dict(zip(zip(gx.tolist(), gy.tolist()), base["n"].tolist()))
    rows = []
    for (x, y), n in z.items():
        dzdx = z.get((x + 1, y), 0) - z.get((x - 1, y), 0)
        dzdy = z.get((x, y + 1), 0) - z.get((x, y - 1), 0)
        if dzdx == 0 and dzdy == 0:
            a = -1
        elif abs(dzdx) >= abs(dzdy):
            a = 0 if dzdx > 0 else 2
        else:
            a = 1 if dzdy > 0 else 3
        rows.append((x, y, n, dzdx, dzdy, dzdx * dzdx + dzdy * dzdy, a))
    ref = pd.DataFrame(rows, columns=["gx", "gy", "n", "dzdx", "dzdy",
                                      "slope2", "aspect"]) \
        .sort_values(["gy", "gx"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)


def _lbp_ref(dec):
    img = dec.astype(np.int16)
    h, w = img.shape
    c = img[1:h - 1, 1:w - 1]
    ones = np.zeros(c.shape, np.int64)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dx == 0 and dy == 0:
                continue
            ones += img[1 + dy:h - 1 + dy, 1 + dx:w - 1 + dx] >= c
    return np.bincount(ones.ravel(), minlength=9)


def test_lbp_matches_brute(sf_dir):
    out = Q.q_lbp(sf_dir).to_pandas() \
        .sort_values(["image_id", "ones"]).reset_index(drop=True)
    rows = []
    for d, _f, dec, _c in _decoded_corpus(sf_dir):
        if dec.shape != (LBP_DIM, LBP_DIM):
            continue
        hist = _lbp_ref(dec)
        for o in np.flatnonzero(hist):
            rows.append((f"img{d:012d}", int(o), int(hist[o])))
    ref = pd.DataFrame(rows, columns=["image_id", "ones", "n_px"]) \
        .sort_values(["image_id", "ones"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)


def test_median3x3_matches_brute(sf_dir):
    out = Q.q_median3x3(sf_dir).to_pandas() \
        .sort_values("image_id").reset_index(drop=True)
    rows = []
    for d, _f, dec, _c in _decoded_corpus(sf_dir):
        if dec.shape != (LBP_DIM, LBP_DIM):
            continue
        img = dec.astype(np.int64)
        h, w = img.shape
        stack = np.stack([img[1 + dy:h - 1 + dy, 1 + dx:w - 1 + dx]
                          for dy in (-1, 0, 1) for dx in (-1, 0, 1)],
                         axis=-1)
        med = np.partition(stack, 4, axis=-1)[..., 4]
        rows.append((f"img{d:012d}", int(med.sum()), int(med.min()),
                     int(med.max()), med.size))
    ref = pd.DataFrame(rows, columns=["image_id", "med_sum", "med_min",
                                      "med_max", "n_ctr"]) \
        .sort_values("image_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)


def test_variogram_matches_brute(sf_dir):
    out = Q.q_variogram(sf_dir).to_pandas() \
        .sort_values("r").reset_index(drop=True)
    ev = pq.read_table(f"{sf_dir}/events.parquet",
                       columns=["event_id", "user_id", "value"]).to_pandas()
    keep = ev["user_id"].to_numpy() % Q.RIPLEY_MOD == 0
    u = ev["user_id"].to_numpy()[keep]
    e = ev["event_id"].to_numpy()[keep]
    v = np.rint(ev["value"].to_numpy()[keep] * 100).astype(np.int64)
    x, y = geotag.event_lonlat_milli(u, e)
    d2 = (x[:, None] - x[None, :]) ** 2 + (y[:, None] - y[None, :]) ** 2
    dv2 = (v[:, None] - v[None, :]) ** 2
    off = ~np.eye(len(x), dtype=bool)
    r2s = np.array([r * r for r in Q.RIPLEY_R], np.int64)
    rows = []
    lo = -1
    for r, hi in zip(Q.RIPLEY_R, r2s):
        m = off & (d2 > lo) & (d2 <= hi)
        rows.append((r, int(m.sum()), int(dv2[m].sum())))
        lo = hi
    ref = pd.DataFrame(rows, columns=["r", "n_pairs", "sum_sq"]) \
        .sort_values("r").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)
