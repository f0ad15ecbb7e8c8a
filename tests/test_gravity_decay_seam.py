"""Batch: decay_counts, od_gravity, seam_cols — brute references."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from osmquadtreepostgis_ray import queries as Q

from test_pixel_ops import _decoded_corpus


def test_decay_counts_matches_brute(sf_dir):
    out = Q.q_decay_counts(sf_dir).to_pandas() \
        .sort_values("tile").reset_index(drop=True)
    base = Q.q_tile_assign(sf_dir).to_pandas()
    ev = pq.read_table(f"{sf_dir}/events.parquet",
                       columns=["event_id", "ts"]).to_pandas()
    ev["ts_us"] = ev["ts"].astype("int64")
    j = base.merge(ev[["event_id", "ts_us"]], on="event_id")
    lo, hi = int(j["ts_us"].min()), int(j["ts_us"].max())
    hl = (hi - lo) // Q.DECAY_HL_DIV + 1
    age = (hi - j["ts_us"].to_numpy(np.int64)) // hl
    j["w"] = np.int64(1) << (Q.DECAY_K - age)
    ref = j.groupby("tile")["w"].sum().reset_index(name="score")
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)
    # newest event carries the full 2^K weight
    assert int(j.loc[j["ts_us"] == hi, "w"].iloc[0]) == 1 << Q.DECAY_K


def test_od_gravity_matches_brute(sf_dir):
    out = Q.q_od_gravity(sf_dir).to_pandas() \
        .sort_values(["from_tile", "to_tile"]).reset_index(drop=True)
    f = Q.q_od_flows(sf_dir).to_pandas()
    om = f.groupby("from_tile")["n"].sum().rename("o_total").reset_index()
    dm = f.groupby("to_tile")["n"].sum().rename("d_total").reset_index()
    total = int(f["n"].sum())
    ref = f.merge(om, on="from_tile").merge(dm, on="to_tile")
    ref["lift_milli"] = (ref["n"] * total * 1000
                         // (ref["o_total"] * ref["d_total"]))
    ref = ref.sort_values(["from_tile", "to_tile"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(out, ref[out.columns.tolist()],
                                  check_dtype=False)


def test_seam_cols_matches_brute(sf_dir):
    out = Q.q_seam_cols(sf_dir).to_pandas() \
        .sort_values("image_id").reset_index(drop=True)
    rows = []
    for d, _f, dec, _c in _decoded_corpus(sf_dir):
        a = dec.astype(np.int64)
        e = np.abs(a[:, 2:] - a[:, :-2]).sum(axis=0)
        rows.append((f"img{d:012d}", int(e.argmin()) + 1, int(e.min())))
    ref = pd.DataFrame(rows, columns=["image_id", "min_col", "min_energy"]) \
        .sort_values("image_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)
