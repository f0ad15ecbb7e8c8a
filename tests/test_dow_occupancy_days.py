"""Batch: dow_profile, occupancy_curve, active_days — brute refs."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from osmquadtreepostgis_ray import queries as Q
from osmquadtreepostgis_ray.functions import geotag, quadtree


def _events(sf_dir):
    return pq.read_table(f"{sf_dir}/events.parquet").to_pandas()


def test_dow_profile_matches_brute(sf_dir):
    out = Q.q_dow_profile(sf_dir).to_pandas() \
        .sort_values(["event_type", "dow"]).reset_index(drop=True)
    ev = _events(sf_dir)
    tu = ev["ts"].astype("int64")
    ev["dow"] = (tu // Q.DAY_US + 4) % 7
    ev["cents"] = np.rint(ev["value"].to_numpy() * 100).astype(np.int64)
    ref = ev.groupby(["event_type", "dow"]).agg(
        n=("cents", "size"), sum_value_cents=("cents", "sum")) \
        .reset_index().sort_values(["event_type", "dow"]) \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)


def test_occupancy_curve_matches_brute(sf_dir):
    out = Q.q_occupancy_curve(sf_dir).to_pandas() \
        .sort_values("depth").reset_index(drop=True)
    ev = _events(sf_dir)
    lon, lat = geotag.event_lonlat_milli(ev["user_id"].to_numpy(),
                                         ev["event_id"].to_numpy())
    fx, fy = geotag.milli_to_fixed(lon, lat)
    ix, iy = quadtree.fixed_to_ixy(fx, fy, Q.CELL_DEPTH)
    c12 = quadtree.encode_ixy(ix, iy, Q.CELL_DEPTH)
    rows = []
    for d in Q.OCC_DEPTHS:
        u, n = np.unique(quadtree.at_depth(c12, d), return_counts=True)
        rows.append((d, len(u), int(n.max()), int(n.sum())))
    ref = pd.DataFrame(rows, columns=["depth", "n_cells", "max_cell_n",
                                      "n_events"])
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)
    # coarser depth never has more occupied cells; event totals conserve
    assert (out["n_cells"].to_numpy()
            == np.sort(out["n_cells"].to_numpy())).all()
    assert out["n_events"].nunique() == 1


def test_active_days_matches_brute(sf_dir):
    out = Q.q_active_days(sf_dir).to_pandas() \
        .sort_values("n_days").reset_index(drop=True)
    ev = _events(sf_dir)
    ev["day"] = ev["ts"].astype("int64") // Q.DAY_US
    per_user = ev.groupby("user_id")["day"].nunique()
    ref = per_user.value_counts().rename("n_users").reset_index()
    ref.columns = ["n_days", "n_users"]
    ref = ref.sort_values("n_days").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)
    assert out["n_users"].sum() == per_user.size
