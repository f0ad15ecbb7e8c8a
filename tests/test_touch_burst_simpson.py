"""Batch: first_last_touch, burstiness, char_simpson — brute refs."""

import collections

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from osmquadtreepostgis_ray import queries as Q


def test_first_last_touch_matches_brute(sf_dir):
    out = Q.q_first_last_touch(sf_dir).to_pandas() \
        .sort_values(["first_type", "last_type"]).reset_index(drop=True)
    ev = pq.read_table(f"{sf_dir}/events.parquet").to_pandas()
    ev["tu"] = ev["ts"].astype("int64")
    ev = ev.sort_values(["user_id", "tu", "event_id"])
    f = ev.groupby("user_id")["event_type"].first()
    l_ = ev.groupby("user_id")["event_type"].last()
    ref = pd.DataFrame({"first_type": f, "last_type": l_}) \
        .groupby(["first_type", "last_type"]).size() \
        .reset_index(name="n_users") \
        .sort_values(["first_type", "last_type"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)
    assert int(out["n_users"].sum()) == ev["user_id"].nunique()


def test_burstiness_matches_brute(sf_dir):
    out = Q.q_burstiness(sf_dir).to_pandas() \
        .sort_values("user_id").reset_index(drop=True)
    ev = pq.read_table(f"{sf_dir}/events.parquet",
                       columns=["event_id", "user_id", "ts"]).to_pandas()
    ev["tu"] = ev["ts"].astype("int64")
    rows = []
    for uid, g in ev.sort_values(["user_id", "tu", "event_id"]) \
            .groupby("user_id"):
        t = g["tu"].to_numpy(np.int64)
        if len(t) < 2:
            continue
        gap = np.diff(t) // 1_000_000
        rows.append((uid, len(gap), int(gap.sum()), int(gap.min()),
                     int(gap.max()), int((gap * gap).sum())))
    ref = pd.DataFrame(rows, columns=["user_id", "n_gaps", "sum_gap_s",
                                      "min_gap_s", "max_gap_s",
                                      "sum_gap2_s"])
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)


def test_char_simpson_matches_brute(sf_dir):
    out = Q.q_char_simpson(sf_dir).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    docs = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    rows = []
    for d, t in zip(docs["doc_id"], docs["text"]):
        c = collections.Counter(t)
        rows.append((d, len(t), sum(v * v for v in c.values())))
    ref = pd.DataFrame(rows, columns=["doc_id", "n_chars", "sum_cnt2"])
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)
    # Cauchy-Schwarz bounds: n <= sum_cnt2 <= n^2
    assert (out["sum_cnt2"] >= out["n_chars"]).all()
    assert (out["sum_cnt2"] <= out["n_chars"] ** 2).all()
