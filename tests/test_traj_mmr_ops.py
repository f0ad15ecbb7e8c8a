"""Trajectory Hausdorff join + MMR selection: brute references."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from osmquadtreepostgis_ray import queries as Q
from osmquadtreepostgis_ray.functions import geotag
from osmquadtreepostgis_ray.stages.cluster import KM_SCALE, KM_SHIFT


def test_traj_hausdorff_matches_brute(sf_dir):
    out = Q.q_traj_hausdorff(sf_dir).to_pandas() \
        .sort_values(["ua", "ub"]).reset_index(drop=True)
    ev = pq.read_table(f"{sf_dir}/events.parquet",
                       columns=["event_id", "user_id"]).to_pandas()
    ev = ev[ev["user_id"] % Q.TRAJ_MOD == 0]
    x, y = geotag.event_lonlat_milli(ev["user_id"].to_numpy(),
                                     ev["event_id"].to_numpy())
    pts = {u: np.stack([x[ev["user_id"] == u], y[ev["user_id"] == u]], axis=1)
           for u in np.unique(ev["user_id"])}
    rows = []
    for ua, pa_ in pts.items():
        for ub, pb in pts.items():
            if ua == ub:
                continue
            d2 = ((pa_[:, None, :] - pb[None, :, :]) ** 2).sum(axis=2)
            rows.append((int(ua), int(ub), int(d2.min(axis=1).max())))
    ref = pd.DataFrame(rows, columns=["ua", "ub", "h2"]) \
        .sort_values(["ua", "ub"]).reset_index(drop=True)
    # directed: h2(a,b) != h2(b,a) in general — assert at least one
    asym = ref.merge(ref, left_on=["ua", "ub"], right_on=["ub", "ua"])
    assert (asym["h2_x"] != asym["h2_y"]).any()
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)


def test_mmr_select_matches_brute_greedy(sf_dir):
    out = Q.q_mmr_select(sf_dir).to_pandas() \
        .sort_values("step").reset_index(drop=True)
    emb = pq.read_table(f"{sf_dir}/embeddings.parquet",
                        columns=["vec_id", "embedding"]).to_pandas()
    ids = emb["vec_id"].to_numpy(np.int64)
    v = (np.floor(np.stack(emb["embedding"].to_numpy()).astype(np.float64)
                  * KM_SCALE).astype(np.int64) + KM_SHIFT)
    qv = v[ids == Q.MMR_QID][0]
    d2q = ((v - qv) ** 2).sum(axis=1)
    sel = []
    for _ in range(Q.MMR_K):
        best = None
        for i in np.argsort(ids):           # ties -> smallest vec_id
            if ids[i] == Q.MMR_QID or ids[i] in sel:
                continue
            mind = min((int(((v[i] - v[ids == s][0]) ** 2).sum())
                        for s in sel), default=0)
            sc = int(d2q[i]) - mind
            if best is None or sc < best[0]:
                best = (sc, int(ids[i]))
        sel.append(best[1])
    ref = pd.DataFrame({"step": np.arange(1, Q.MMR_K + 1), "vec_id": sel})
    # diversity sanity: MMR differs from plain top-k after step 1
    topk = ids[np.lexsort((ids, d2q))]
    topk = [int(t) for t in topk if t != Q.MMR_QID][:Q.MMR_K]
    assert sel != topk
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)
