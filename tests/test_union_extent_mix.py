"""Batch: interval_union, user_extent, degree_mix — brute references."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from osmquadtreepostgis_ray import queries as Q
from osmquadtreepostgis_ray.functions import geotag


def test_interval_union_matches_brute(sf_dir):
    out = Q.q_interval_union(sf_dir).to_pandas() \
        .sort_values("user_id").reset_index(drop=True)
    ev = pq.read_table(f"{sf_dir}/events.parquet",
                       columns=["event_id", "user_id", "ts"]).to_pandas()
    ev["s"] = ev["ts"].astype("int64")
    rows = []
    for uid, g in ev.sort_values(["user_id", "s", "event_id"]) \
            .groupby("user_id"):
        covered = n_isl = 0
        cur_s = cur_e = None
        for s in g["s"]:
            e = s + Q.IVU_DUR_US
            if cur_e is None or s > cur_e:
                if cur_e is not None:
                    covered += cur_e - cur_s
                cur_s, cur_e = s, e
                n_isl += 1
            else:
                cur_e = max(cur_e, e)
        covered += cur_e - cur_s
        rows.append((uid, covered, n_isl))
    ref = pd.DataFrame(rows, columns=["user_id", "covered_us", "n_islands"])
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)
    # coverage never exceeds n_events * duration
    m = out.merge(ev.groupby("user_id").size().rename("ne").reset_index(),
                  on="user_id")
    assert (m["covered_us"] <= m["ne"] * Q.IVU_DUR_US).all()


def test_user_extent_matches_brute(sf_dir):
    out = Q.q_user_extent(sf_dir).to_pandas() \
        .sort_values("user_id").reset_index(drop=True)
    ev = pq.read_table(f"{sf_dir}/events.parquet",
                       columns=["event_id", "user_id"]).to_pandas()
    x, y = geotag.event_lonlat_milli(ev["user_id"].to_numpy(),
                                     ev["event_id"].to_numpy())
    d = pd.DataFrame({"user_id": ev["user_id"], "x": x, "y": y})
    ref = d.groupby("user_id").agg(
        x0=("x", "min"), x1=("x", "max"),
        y0=("y", "min"), y1=("y", "max"), n=("x", "size")).reset_index()
    ref["bbox_area"] = (ref["x1"] - ref["x0"]) * (ref["y1"] - ref["y0"])
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)


def test_degree_mix_matches_brute(sf_dir):
    out = Q.q_degree_mix(sf_dir).to_pandas()
    ids = pq.read_table(f"{sf_dir}/documents.parquet",
                        columns=["doc_id"]).column("doc_id").to_numpy()
    ids = np.sort(ids.astype(np.int64))
    d1 = ids[(ids >= 1) & (ids % 5 != 0)]
    d2 = ids[(ids >= 2) & ((ids - 2) % 3 == 0)]
    a = np.concatenate([d1 - 1, d2 - 2])
    b = np.concatenate([d1, d2])
    src = np.r_[a, b]
    dst = np.r_[b, a]
    deg = pd.Series(src).value_counts()
    du = deg.loc[src].to_numpy(np.int64)
    dv = deg.loc[dst].to_numpy(np.int64)
    assert int(out["n_edges"].iloc[0]) == len(src)
    assert int(out["sum_dd"].iloc[0]) == int((du * dv).sum())
    assert int(out["sum_d"].iloc[0]) == int(du.sum())
    assert int(out["sum_d2"].iloc[0]) == int((du * du).sum())
