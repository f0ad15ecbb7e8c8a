"""Batch: chaikin smoothing, visual words, image dhash, length
histogram — brute references from the raw tables."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from osmquadtreepostgis_ray import queries as Q
from osmquadtreepostgis_ray.functions import geotag

from test_pixel_ops import _decoded_corpus


def test_chaikin_matches_brute(sf_dir):
    out = Q.q_chaikin(sf_dir).to_pandas() \
        .sort_values(["user_id", "seq"]).reset_index(drop=True)
    ev = pq.read_table(f"{sf_dir}/events.parquet",
                       columns=["event_id", "user_id", "ts"]).to_pandas()
    ev["ts_us"] = ev["ts"].astype("int64")
    x, y = geotag.event_lonlat_milli(ev["user_id"].to_numpy(),
                                     ev["event_id"].to_numpy())
    ev["x"], ev["y"] = x, y
    rows = []
    for uid, g in ev.sort_values(["user_id", "ts_us", "event_id"]) \
            .groupby("user_id"):
        xs = g["x"].to_numpy(np.int64)
        ys = g["y"].to_numpy(np.int64)
        for i in range(len(xs) - 1):
            rows.append((uid, 2 * i, 3 * xs[i] + xs[i + 1],
                         3 * ys[i] + ys[i + 1]))
            rows.append((uid, 2 * i + 1, xs[i] + 3 * xs[i + 1],
                         ys[i] + 3 * ys[i + 1]))
    ref = pd.DataFrame(rows, columns=["user_id", "seq", "qx4", "qy4"]) \
        .sort_values(["user_id", "seq"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)
    # a smoothed point is always inside the segment's bounding box
    m = out.merge(ref, on=["user_id", "seq"], suffixes=("", "_r"))
    assert (m["qx4"] == m["qx4_r"]).all()


def _word_of(patch):
    ss = patch.reshape(2, 4, 2, 4).sum(axis=(1, 3))
    q = ss // 1024
    return int(q[0, 0] + 4 * q[0, 1] + 16 * q[1, 0] + 64 * q[1, 1])


def test_visual_words_matches_brute(sf_dir):
    out = Q.q_visual_words(sf_dir).to_pandas() \
        .sort_values("word").reset_index(drop=True)
    patches = {}
    for d, _f, dec, _c in _decoded_corpus(sf_dir):
        h, w = dec.shape
        a = dec.astype(np.int64)
        for py in range(h // 8):
            for px in range(w // 8):
                wd = _word_of(a[py * 8:py * 8 + 8, px * 8:px * 8 + 8])
                n, imgs = patches.get(wd, (0, set()))
                imgs.add(d)
                patches[wd] = (n + 1, imgs)
    ref = pd.DataFrame(
        [(wd, n, len(imgs)) for wd, (n, imgs) in sorted(patches.items())],
        columns=["word", "n_patches", "n_images"])
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)


def test_image_dhash_matches_brute(sf_dir):
    out = Q.q_image_dhash(sf_dir).to_pandas() \
        .sort_values("image_id").reset_index(drop=True)
    rows = []
    for d, _f, dec, _c in _decoded_corpus(sf_dir):
        h, w = dec.shape
        bs = dec.astype(np.int64).reshape(8, h // 8, 8, w // 8) \
            .sum(axis=(1, 3))
        bits = bs[:, 1:] > bs[:, :-1]
        hv = sum(int(bits[r, c]) << (r * 7 + c)
                 for r in range(8) for c in range(7))
        rows.append((f"img{d:012d}", hv, int(bits.sum())))
    ref = pd.DataFrame(rows, columns=["image_id", "dhash", "nbits"]) \
        .sort_values("image_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)


def test_len_histogram_matches_brute(sf_dir):
    out = Q.q_len_histogram(sf_dir).to_pandas() \
        .sort_values("bucket").reset_index(drop=True)
    n = pq.read_table(f"{sf_dir}/documents.parquet",
                      columns=["n_chars"]).column("n_chars").to_numpy()
    b = np.floor(np.log2(n)).astype(np.int64)
    ref = pd.DataFrame({"bucket": b, "n": n}).groupby("bucket").agg(
        n_docs=("n", "size"), sum_chars=("n", "sum")).reset_index()
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)
    assert int(out["n_docs"].sum()) == len(n)
