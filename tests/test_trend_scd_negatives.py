"""Batch: trend_fit, history_ranges, link_negatives — brute refs."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from osmquadtreepostgis_ray import queries as Q


def _events(sf_dir):
    ev = pq.read_table(f"{sf_dir}/events.parquet").to_pandas()
    ev["tu"] = ev["ts"].astype("int64")
    return ev


def test_trend_fit_matches_brute(sf_dir):
    out = Q.q_trend_fit(sf_dir).to_pandas() \
        .sort_values("user_id").reset_index(drop=True)
    ev = _events(sf_dir)
    ev["y"] = np.rint(ev["value"].to_numpy() * 100).astype(np.int64)
    rows = []
    for uid, g in ev.groupby("user_id"):
        th = (g["tu"].to_numpy(np.int64) - g["tu"].min()) // Q.TREND_HOUR_US
        y = g["y"].to_numpy(np.int64)
        n = len(y)
        rows.append((uid, n,
                     n * int((th * y).sum()) - int(th.sum()) * int(y.sum()),
                     n * int((th * th).sum()) - int(th.sum()) ** 2))
    ref = pd.DataFrame(rows, columns=["user_id", "n", "slope_num",
                                      "slope_den"])
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)
    # Cauchy-Schwarz: the denominator is never negative
    assert (out["slope_den"] >= 0).all()


def test_history_ranges_matches_brute(sf_dir):
    out = Q.q_history_ranges(sf_dir).to_pandas() \
        .sort_values("user_id").reset_index(drop=True)
    ev = _events(sf_dir).sort_values(["user_id", "tu", "event_id"])
    rows = []
    for uid, g in ev.groupby("user_id"):
        v = g["event_type"].to_numpy()
        t = g["tu"].to_numpy(np.int64)
        brk = np.r_[True, v[1:] != v[:-1]]
        starts = np.flatnonzero(brk)
        ends = np.r_[starts[1:] - 1, len(t) - 1]
        rows.append((uid, len(starts), len(starts) - 1,
                     int((t[ends] - t[starts]).sum())))
    ref = pd.DataFrame(rows, columns=["user_id", "n_ranges", "n_changes",
                                      "sum_span_us"])
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)


def test_link_negatives_matches_brute(sf_dir):
    out = Q.q_link_negatives(sf_dir).to_pandas() \
        .sort_values(["src", "j"]).reset_index(drop=True)
    ids = np.sort(pq.read_table(f"{sf_dir}/documents.parquet",
                                columns=["doc_id"])
                  .column("doc_id").to_numpy().astype(np.int64))
    N = int(ids.max()) + 1
    d1 = ids[(ids >= 1) & (ids % 5 != 0)]
    d2 = ids[(ids >= 2) & ((ids - 2) % 3 == 0)]
    a = np.concatenate([d1 - 1, d2 - 2])
    b = np.concatenate([d1, d2])
    edges = set(zip(np.r_[a, b].tolist(), np.r_[b, a].tolist()))
    rows = []
    for s in ids:
        kept = 0
        for j in range(Q.NEG_PROPOSE):
            neg = (int(s) * Q.NEG_A + j * Q.NEG_B + 1) % N
            if neg == s or (int(s), neg) in edges:
                continue
            rows.append((int(s), neg, j))
            kept += 1
            if kept == Q.NEG_K:
                break
    ref = pd.DataFrame(rows, columns=["src", "neg_dst", "j"]) \
        .sort_values(["src", "j"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)
    # no emitted negative is a true edge
    assert all((s, d) not in edges
               for s, d in zip(out["src"], out["neg_dst"]))
