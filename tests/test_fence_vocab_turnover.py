"""Batch: fence_dwell, vocab_tail, cell_turnover — brute refs."""

import collections

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from osmquadtreepostgis_ray import queries as Q
from osmquadtreepostgis_ray.functions import geotag, quadtree
from osmquadtreepostgis_ray.sources.zones import (ADMIN_H, ADMIN_ID_BASE,
                                                  ADMIN_W, AX)


def test_fence_dwell_matches_brute(sf_dir):
    out = Q.q_fence_dwell(sf_dir).to_pandas() \
        .sort_values("user_id").reset_index(drop=True)
    ev = pq.read_table(f"{sf_dir}/events.parquet",
                       columns=["event_id", "user_id", "ts"]).to_pandas()
    lon, lat = geotag.event_lonlat_milli(ev["user_id"].to_numpy(),
                                         ev["event_id"].to_numpy())
    ev["ins"] = ((lat // ADMIN_H) * AX + lon // ADMIN_W
                 + ADMIN_ID_BASE) == Q.FENCE_AZONE
    ev["tu"] = ev["ts"].astype("int64")
    rows = []
    for uid, g in ev.sort_values(["user_id", "tu", "event_id"]) \
            .groupby("user_id"):
        ins = g["ins"].to_numpy()
        t = g["tu"].to_numpy(np.int64)
        if not ins.any():
            continue
        runs = int((ins & ~np.r_[False, ins[:-1]]).sum())
        dwell = int(np.diff(t)[(ins[1:] & ins[:-1])].sum())
        rows.append((uid, int(ins.sum()), runs, dwell))
    ref = pd.DataFrame(rows, columns=["user_id", "n_inside", "n_runs",
                                      "dwell_us"])
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)


def test_vocab_tail_matches_brute(sf_dir):
    out = Q.q_vocab_tail(sf_dir).to_pandas()
    docs = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["text"]).to_pandas()
    c = collections.Counter()
    for t in docs["text"]:
        c.update(t.split(" "))
    total = sum(c.values())
    top = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:Q.VOCAB_TOPK]
    topk = sum(n for _w, n in top)
    assert int(out["total_tokens"].iloc[0]) == total
    assert int(out["topk_tokens"].iloc[0]) == topk
    assert int(out["coverage_permille"].iloc[0]) == topk * 1000 // total


def test_cell_turnover_matches_brute(sf_dir):
    out = Q.q_cell_turnover(sf_dir).to_pandas() \
        .sort_values("tile").reset_index(drop=True)
    ev = pq.read_table(f"{sf_dir}/events.parquet",
                       columns=["event_id", "user_id", "ts"]).to_pandas()
    ev["tu"] = ev["ts"].astype("int64")
    lo, hi = int(ev["tu"].min()), int(ev["tu"].max())
    mid = lo + (hi - lo) // 2
    lon, lat = geotag.event_lonlat_milli(ev["user_id"].to_numpy(),
                                         ev["event_id"].to_numpy())
    fx, fy = geotag.milli_to_fixed(lon, lat)
    ix, iy = quadtree.fixed_to_ixy(fx, fy, Q.TILE_DEPTH)
    ev["tile"] = quadtree.encode_ixy(ix, iy, Q.TILE_DEPTH)
    early = ev[ev["tu"] < mid].groupby("tile")["user_id"].apply(set)
    late = ev[ev["tu"] >= mid].groupby("tile")["user_id"].apply(set)
    rows = []
    for tile in sorted(set(early.index) | set(late.index)):
        e = early.get(tile, set())
        l_ = late.get(tile, set())
        b = len(e & l_)
        un = len(e | l_)
        rows.append((tile, len(e), len(l_), b,
                     b * 1000 // max(un, 1)))
    ref = pd.DataFrame(rows, columns=["tile", "n_early", "n_late",
                                      "n_both", "jaccard_permille"])
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)
