"""Batch: weekend_lift, pyramid_anomaly, covisit_tiles — brute refs."""

import itertools

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from osmquadtreepostgis_ray import queries as Q
from osmquadtreepostgis_ray.functions import geotag, quadtree


def _tiles(sf_dir):
    ev = pq.read_table(f"{sf_dir}/events.parquet",
                       columns=["event_id", "user_id", "ts"]).to_pandas()
    lon, lat = geotag.event_lonlat_milli(ev["user_id"].to_numpy(),
                                         ev["event_id"].to_numpy())
    fx, fy = geotag.milli_to_fixed(lon, lat)
    ix, iy = quadtree.fixed_to_ixy(fx, fy, Q.TILE_DEPTH)
    ev["tile"] = quadtree.encode_ixy(ix, iy, Q.TILE_DEPTH)
    cx, cy = quadtree.fixed_to_ixy(fx, fy, Q.CELL_DEPTH)
    ev["cell"] = quadtree.encode_ixy(cx, cy, Q.CELL_DEPTH)
    ev["tu"] = ev["ts"].astype("int64")
    return ev


def test_weekend_lift_matches_brute(sf_dir):
    out = Q.q_weekend_lift(sf_dir).to_pandas() \
        .sort_values("tile").reset_index(drop=True)
    ev = _tiles(sf_dir)
    ev["we"] = ((ev["tu"] // Q.DAY_US + 4) % 7).isin([0, 6]).astype(int)
    ref = ev.groupby("tile").agg(n=("we", "size"),
                                 n_weekend=("we", "sum")).reset_index()
    ref["n_weekday"] = ref["n"] - ref["n_weekend"]
    ref["lift_permille"] = (ref["n_weekend"] * 5000
                            // np.maximum(ref["n_weekday"] * 2, 1))
    ref = ref[["tile", "n_weekday", "n_weekend", "lift_permille"]]
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)


def test_pyramid_anomaly_matches_brute(sf_dir):
    out = Q.q_pyramid_anomaly(sf_dir).to_pandas() \
        .sort_values("cell").reset_index(drop=True)
    ev = _tiles(sf_dir)
    c12 = ev.groupby("cell").size().rename("n").reset_index()
    c12["p"] = quadtree.at_depth(c12["cell"].to_numpy(), 10)
    c10 = c12.groupby("p")["n"].sum().rename("n_parent").reset_index()
    ref = c12.merge(c10, on="p")
    ref["dev"] = 16 * ref["n"] - ref["n_parent"]
    ref = ref[["cell", "n", "n_parent", "dev"]] \
        .sort_values("cell").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)
    # conservation: per parent, sum over its occupied children of dev
    # equals (16 - n_occupied_children) * n_parent, because the
    # children's counts sum exactly to the parent's
    chk = ref.assign(p=quadtree.at_depth(ref["cell"].to_numpy(), 10))
    per_p = chk.groupby("p").agg(sd=("dev", "sum"), k=("dev", "size"),
                                 np_=("n_parent", "first"))
    assert (per_p["sd"] == (16 - per_p["k"]) * per_p["np_"]).all()


def test_covisit_tiles_matches_brute(sf_dir):
    out = Q.q_covisit_tiles(sf_dir).to_pandas() \
        .sort_values(["tile_a", "tile_b"]).reset_index(drop=True)
    ev = _tiles(sf_dir)
    ut = ev.groupby(["user_id", "tile"]).size().rename("n").reset_index()
    cells = {}
    for uid, g in ut.groupby("user_id"):
        g = g.sort_values(["n", "tile"], ascending=[False, True])
        tiles = sorted(g["tile"].head(Q.COVISIT_M).tolist())
        for a, b in itertools.combinations(tiles, 2):
            cells[(a, b)] = cells.get((a, b), 0) + 1
    ref = pd.DataFrame([(a, b, n) for (a, b), n in sorted(cells.items())],
                       columns=["tile_a", "tile_b", "n_users"])
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)
