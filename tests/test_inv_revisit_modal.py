"""Batch: inversions, revisits, modal_corr — brute references."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from osmquadtreepostgis_ray import queries as Q
from osmquadtreepostgis_ray.functions import geotag, quadtree

from test_pixel_ops import _decoded_corpus


def test_inversions_matches_brute(sf_dir):
    out = Q.q_inversions(sf_dir).to_pandas() \
        .sort_values("user_id").reset_index(drop=True)
    ev = pq.read_table(f"{sf_dir}/events.parquet").to_pandas()
    ev["tu"] = ev["ts"].astype("int64")
    ev["y"] = np.rint(ev["value"].to_numpy() * 100).astype(np.int64)
    rows = []
    for uid, g in ev.sort_values(["user_id", "tu", "event_id"]) \
            .groupby("user_id"):
        y = g["y"].tolist()
        n_inv = sum(1 for i in range(len(y)) for j in range(i + 1, len(y))
                    if y[i] > y[j])
        n_tie = sum(1 for i in range(len(y)) for j in range(i + 1, len(y))
                    if y[i] == y[j])
        rows.append((uid, len(y), n_inv, n_tie))
    ref = pd.DataFrame(rows, columns=["user_id", "n", "n_inv", "n_tie"])
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)
    # inversions + ties never exceed the pair count
    pairs = out["n"] * (out["n"] - 1) // 2
    assert ((out["n_inv"] + out["n_tie"]) <= pairs).all()


def test_revisits_matches_brute(sf_dir):
    out = Q.q_revisits(sf_dir).to_pandas() \
        .sort_values("user_id").reset_index(drop=True)
    ev = pq.read_table(f"{sf_dir}/events.parquet",
                       columns=["event_id", "user_id", "ts"]).to_pandas()
    lon, lat = geotag.event_lonlat_milli(ev["user_id"].to_numpy(),
                                         ev["event_id"].to_numpy())
    fx, fy = geotag.milli_to_fixed(lon, lat)
    ix, iy = quadtree.fixed_to_ixy(fx, fy, Q.CELL_DEPTH)
    ev["cell"] = quadtree.encode_ixy(ix, iy, Q.CELL_DEPTH)
    ev["tu"] = ev["ts"].astype("int64")
    rows = []
    for uid, g in ev.sort_values(["user_id", "tu", "event_id"]) \
            .groupby("user_id"):
        seen = set()
        rev = 0
        for c in g["cell"]:
            if c in seen:
                rev += 1
            seen.add(c)
        rows.append((uid, len(g), len(seen), rev))
    ref = pd.DataFrame(rows, columns=["user_id", "n_events", "n_cells",
                                      "n_revisits"])
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)
    assert (out["n_events"] == out["n_cells"] + out["n_revisits"]).all()


def test_modal_corr_matches_brute(sf_dir):
    from osmquadtreepostgis_ray.sources import audio as A
    out = Q.q_modal_corr(sf_dir).to_pandas()
    xs, ys = {}, {}
    for d, _f, dec, _c in _decoded_corpus(sf_dir):
        xs[d] = int(dec.astype(np.int64).sum() // dec.size)
    ids = np.sort(pq.read_table(f"{sf_dir}/documents.parquet",
                                columns=["doc_id"])
                  .column("doc_id").to_numpy())
    ph = geotag.phash_of(ids)
    ns = A.n_samples_of(ids)
    fmts = A.fmt_of(ids)
    for i, d in enumerate(ids):
        ref = A.synth_samples_batch(np.array([ph[i]], np.uint64),
                                    int(ns[i]))[0].astype(np.int64)
        if fmts[i] == "q8":
            q = (ref + 32768) >> 8
            ref = (q << 8) - 32768 + 128
        ys[int(d)] = int(np.abs(ref).sum() // ns[i])
    x = np.array([xs[d] for d in sorted(xs)], np.int64)
    y = np.array([ys[d] for d in sorted(xs)], np.int64)
    assert int(out["n"].iloc[0]) == len(x)
    assert int(out["sx"].iloc[0]) == int(x.sum())
    assert int(out["sy"].iloc[0]) == int(y.sum())
    assert int(out["sxy"].iloc[0]) == int((x * y).sum())
    assert int(out["sx2"].iloc[0]) == int((x * x).sum())
    assert int(out["sy2"].iloc[0]) == int((y * y).sum())
