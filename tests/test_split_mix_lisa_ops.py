"""Batch: time_split (embargo temporal split), temperature_mix,
saliency_crop, local_moran — brute references from the raw tables."""

import math

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from osmquadtreepostgis_ray import queries as Q

from test_pixel_ops import _decoded_corpus


def test_time_split_matches_brute(sf_dir):
    out = Q.q_time_split(sf_dir).to_pandas() \
        .sort_values(["split", "event_type"]).reset_index(drop=True)
    ev = pq.read_table(f"{sf_dir}/events.parquet",
                       columns=["ts", "event_type"]).to_pandas()
    ts = ev["ts"].astype("int64").to_numpy()
    lo, hi = int(ts.min()), int(ts.max())
    t1 = lo + ((hi - lo) * Q.TS_SPLIT_TENTHS[0]) // 10
    t2 = lo + ((hi - lo) * Q.TS_SPLIT_TENTHS[1]) // 10
    split = np.where(ts < t1, "train", np.where(ts < t2, "embargo", "test"))
    ref = pd.DataFrame({"split": split, "event_type": ev["event_type"]}) \
        .groupby(["split", "event_type"]).size().reset_index(name="n") \
        .sort_values(["split", "event_type"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)
    # every (train, test) boundary respects the embargo gap
    assert t1 < t2 <= hi + 1


def test_temperature_mix_matches_brute(sf_dir):
    out = Q.q_temperature_mix(sf_dir).to_pandas() \
        .sort_values("lang").reset_index(drop=True)
    docs = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["lang"]).to_pandas()
    c = docs.groupby("lang").size()
    w = {k: math.isqrt(int(v)) for k, v in c.items()}
    tw = sum(w.values())
    ref = pd.DataFrame({"lang": list(c.index),
                        "n_docs": [int(v) for v in c],
                        "w": [w[k] for k in c.index],
                        "quota": [1000 * w[k] // tw for k in c.index]}) \
        .sort_values("lang").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)
    assert out["quota"].sum() <= 1000


def test_saliency_crop_matches_brute(sf_dir):
    out = Q.q_saliency_crop(sf_dir).to_pandas() \
        .sort_values("image_id").reset_index(drop=True)
    rows = []
    for d, _f, dec, _c in _decoded_corpus(sf_dir):
        a = dec.astype(np.int64)
        h, w = a.shape
        dx = a[1:-1, 2:] - a[1:-1, :-2]
        dy = a[2:, 1:-1] - a[:-2, 1:-1]
        e = np.abs(dx) + np.abs(dy)
        ys = np.arange(1, h - 1)
        xs = np.arange(1, w - 1)
        q = (ys >= h // 2).astype(np.int64)[:, None] * 2 \
            + (xs >= w // 2)[None, :]
        en = [int(e[q == i].sum()) for i in range(4)]
        best = int(np.argmax(en))
        rows.append((f"img{d:012d}", best, en[best]))
    ref = pd.DataFrame(rows, columns=["image_id", "quad", "energy"]) \
        .sort_values("image_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)


def test_local_moran_matches_brute(sf_dir):
    out = Q.q_local_moran(sf_dir).to_pandas() \
        .sort_values(["ix", "iy"]).reset_index(drop=True)
    h = Q.q_hotspot(sf_dir).to_pandas()
    N = len(h)
    S = int(h["n"].sum())
    dev = N * h["n"].to_numpy(np.int64) - S
    nb_dev = (N * (h["nbr_sum"].to_numpy(np.int64)
                   - h["n"].to_numpy(np.int64))
              - (h["nbr_cnt"].to_numpy(np.int64) - 1) * S)
    ref = pd.DataFrame({"ix": h["ix"], "iy": h["iy"], "n": h["n"],
                        "lisa_num": dev * nb_dev}) \
        .sort_values(["ix", "iy"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)
    # spot invariant: a cell with no occupied neighbors has lisa_num
    # == dev * 0 only when nbr_cnt == 1
    solo = out.merge(h, on=["ix", "iy"])
    solo = solo[solo["nbr_cnt"] == 1]
    assert (solo["lisa_num"] == 0).all()
