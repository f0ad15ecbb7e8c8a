"""Multi-source BFS hops + proximity raster: brute references."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from osmquadtreepostgis_ray import queries as Q


def test_sssp_hops_matches_brute_bfs(sf_dir):
    out = Q.q_sssp_hops(sf_dir).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    ids = pq.read_table(f"{sf_dir}/documents.parquet",
                        columns=["doc_id"]).column("doc_id") \
        .to_numpy().astype(np.int64)
    d1 = ids[(ids >= 1) & (ids % 5 != 0)]
    d2 = ids[(ids >= 2) & ((ids - 2) % 3 == 0)]
    a = np.concatenate([d1 - 1, d2 - 2])
    b = np.concatenate([d1, d2])
    adj: dict[int, set] = {}
    for u, v in zip(a.tolist(), b.tolist()):
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    dist = {v: 0 for v in adj if v % Q.SSSP_SRC_MOD == 0}
    frontier = list(dist)
    d = 0
    while frontier:
        d += 1
        nxt = []
        for u in frontier:
            for v in adj[u]:
                if v not in dist:
                    dist[v] = d
                    nxt.append(v)
        frontier = nxt
    ref = pd.DataFrame(sorted(dist.items()), columns=["node", "dist"]) \
        .reset_index(drop=True)
    # unreachable components exist (not every chain block holds a depot)
    assert len(ref) < len(adj) and ref["dist"].max() > 0
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)


def test_dist_raster_matches_brute_l1(sf_dir):
    out = Q.q_dist_raster(sf_dir).to_pandas() \
        .sort_values(["cx", "cy"]).reset_index(drop=True)
    road = Q.q_line_raster(sf_dir).to_pandas()     # golden-tested derivation
    rx = road["cx"].to_numpy(np.int64)
    ry = road["cy"].to_numpy(np.int64)
    g = np.arange(Q.RASTER_N * Q.RASTER_N, dtype=np.int64)
    gx, gy = g // Q.RASTER_N, g % Q.RASTER_N
    d = np.abs(gx[:, None] - rx[None, :]) + np.abs(gy[:, None] - ry[None, :])
    ref = pd.DataFrame({"cx": gx, "cy": gy, "dist": d.min(axis=1)}) \
        .sort_values(["cx", "cy"]).reset_index(drop=True)
    # road cells themselves are at distance 0; the far corner is not
    assert (ref["dist"] == 0).sum() == len(road) and ref["dist"].max() > 0
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)
