"""Sinuosity, zone Gini, CUSUM changepoint: brute references."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from osmquadtreepostgis_ray import queries as Q
from osmquadtreepostgis_ray.functions import geotag
from osmquadtreepostgis_ray.stages.assembly import GROUP_SIZE


def test_sinuosity_matches_brute(sf_dir):
    out = Q.q_sinuosity(sf_dir).to_pandas() \
        .sort_values("gid").reset_index(drop=True)
    docs = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id"]).to_pandas() \
        .sort_values("doc_id")
    ph = geotag.phash_of(docs["doc_id"].to_numpy())
    docs["x"] = ph % 360000
    docs["y"] = (ph // 360000) % 170000
    rows = []
    for gid, g in docs.groupby(docs["doc_id"] // GROUP_SIZE):
        if len(g) < 2:
            continue
        x = g["x"].to_numpy(np.int64)
        y = g["y"].to_numpy(np.int64)
        path = int(np.abs(np.diff(x)).sum() + np.abs(np.diff(y)).sum())
        chord = int(abs(x[-1] - x[0]) + abs(y[-1] - y[0]))
        rows.append((int(gid), path, chord))
    ref = pd.DataFrame(rows, columns=["gid", "path_l1", "chord_l1"]) \
        .sort_values("gid").reset_index(drop=True)
    # phash-shuffled chains wind: path strictly exceeds the chord
    assert (ref["path_l1"] >= ref["chord_l1"]).all() \
        and (ref["path_l1"] > ref["chord_l1"]).any()
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)


def test_zone_gini_matches_brute(sf_dir):
    out = Q.q_zone_gini(sf_dir).to_pandas() \
        .sort_values(["zone_id", "kind"]).reset_index(drop=True) \
        [["zone_id", "kind", "n", "sum_cents", "gini2"]]
    pz = Q.q_pip_zones(sf_dir).to_pandas()
    ev = pq.read_table(f"{sf_dir}/events.parquet",
                       columns=["event_id", "value"]).to_pandas()
    j = pz.merge(ev, on="event_id")
    j["c"] = np.rint(j["value"] * 100).astype(np.int64)
    rows = []
    for (z, kd), g in j.groupby(["zone_id", "kind"]):
        v = np.sort(g["c"].to_numpy(np.int64))
        n = len(v)
        i = np.arange(1, n + 1)
        g2 = int(((2 * i - n - 1) * v).sum())
        # half-pairwise identity on a small prefix
        if n <= 60:
            assert 2 * g2 == int(np.abs(v[:, None] - v[None, :]).sum())
        rows.append((int(z), kd, n, int(v.sum()), g2))
    ref = pd.DataFrame(rows, columns=["zone_id", "kind", "n",
                                      "sum_cents", "gini2"]) \
        .sort_values(["zone_id", "kind"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)


def test_changepoint_matches_brute(sf_dir):
    out = Q.q_changepoint(sf_dir).to_pandas() \
        .sort_values("user_id").reset_index(drop=True)
    ev = pq.read_table(f"{sf_dir}/events.parquet",
                       columns=["event_id", "user_id", "ts", "value"]) \
        .to_pandas()
    ev["tsu"] = ev["ts"].astype("int64")
    ev["c"] = np.rint(ev["value"] * 100).astype(np.int64)
    rows = []
    for u, g in ev.groupby("user_id"):
        g = g.sort_values(["tsu", "event_id"])
        v = g["c"].to_numpy(np.int64)
        n = len(v)
        if n < 2:
            continue
        s = np.cumsum(v)
        best = None
        for i in range(1, n):
            dev = abs(int(n * s[i - 1] - i * s[-1]))
            if best is None or dev > best[1]:
                best = (i, dev)
        rows.append((int(u), best[0], best[1]))
    ref = pd.DataFrame(rows, columns=["user_id", "pos", "dev"]) \
        .sort_values("user_id").reset_index(drop=True)
    assert (ref["dev"] > 0).any()
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)
