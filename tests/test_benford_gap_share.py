"""Batch: benford, gap_histogram, user_cell_share — brute refs."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from osmquadtreepostgis_ray import queries as Q
from osmquadtreepostgis_ray.functions import geotag, quadtree


def _events(sf_dir):
    return pq.read_table(f"{sf_dir}/events.parquet").to_pandas()


def test_benford_matches_brute(sf_dir):
    out = Q.q_benford(sf_dir).to_pandas() \
        .sort_values(["event_type", "digit"]).reset_index(drop=True)
    ev = _events(sf_dir)
    cents = np.rint(ev["value"].to_numpy() * 100).astype(np.int64)
    digit = np.array([int(str(c)[0]) for c in cents], np.int64)
    ref = pd.DataFrame({"event_type": ev["event_type"], "digit": digit}) \
        .groupby(["event_type", "digit"]).size().rename("n").reset_index() \
        .sort_values(["event_type", "digit"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)
    assert set(out["digit"]) <= set(range(1, 10))


def test_gap_histogram_matches_brute(sf_dir):
    out = Q.q_gap_histogram(sf_dir).to_pandas() \
        .sort_values("bucket").reset_index(drop=True)
    ev = _events(sf_dir).sort_values(["user_id", "ts", "event_id"])
    tu = ev["ts"].astype("int64").to_numpy()
    uid = ev["user_id"].to_numpy(np.int64)
    gap_s = np.diff(tu) // 1_000_000
    gaps = gap_s[np.diff(uid) == 0]
    bucket = np.array([int(g).bit_length() for g in gaps], np.int64)
    u, n = np.unique(bucket, return_counts=True)
    ref = pd.DataFrame({"bucket": u, "n": n.astype(np.int64)})
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)
    assert out["n"].sum() == len(gaps)


def test_user_cell_share_matches_brute(sf_dir):
    out = Q.q_user_cell_share(sf_dir).to_pandas() \
        .sort_values("user_id").reset_index(drop=True)
    ev = _events(sf_dir)
    lon, lat = geotag.event_lonlat_milli(ev["user_id"].to_numpy(),
                                         ev["event_id"].to_numpy())
    fx, fy = geotag.milli_to_fixed(lon, lat)
    ix, iy = quadtree.fixed_to_ixy(fx, fy, Q.CELL_DEPTH)
    ev["cell"] = quadtree.encode_ixy(ix, iy, Q.CELL_DEPTH)
    uc = ev.groupby(["user_id", "cell"]).size().rename("n").reset_index()
    uc = uc.sort_values(["user_id", "n", "cell"],
                        ascending=[True, False, True])
    top = uc.groupby("user_id").head(1).set_index("user_id")
    tot = uc.groupby("user_id")["n"].sum()
    ref = pd.DataFrame({
        "user_id": top.index.to_numpy(np.int64),
        "top_cell": top["cell"].to_numpy(np.int64),
        "n_top": top["n"].to_numpy(np.int64),
        "n_events": tot.reindex(top.index).to_numpy(np.int64)})
    ref["share_permille"] = ref["n_top"] * 1000 // ref["n_events"]
    ref = ref.sort_values("user_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)
