"""KMV distinct sketch and neighborhood-Jaccard link prediction:
brute numpy/pandas twins recomputed directly from the parquet inputs.
"""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from osmquadtreepostgis_ray import queries as Q
from osmquadtreepostgis_ray.functions.codecs import _splitmix
from osmquadtreepostgis_ray.functions.sketch import kmv_estimate


def test_kmv_sketch_matches_brute_and_is_batching_invariant(sf_dir):
    out = Q.q_kmv_sketch(sf_dir).to_pandas() \
        .sort_values(["event_type", "rnk"]).reset_index(drop=True)
    ev = pq.read_table(f"{sf_dir}/events.parquet",
                       columns=["event_type", "user_id"]).to_pandas()
    h63 = (_splitmix(ev["user_id"].to_numpy().astype(np.uint64))
           % np.uint64(1 << 63)).astype(np.int64)
    rows = []
    for e, grp in pd.DataFrame({"e": ev["event_type"], "h": h63}) \
            .groupby("e", sort=True):
        u = np.unique(grp["h"].to_numpy())[:Q.KMV_K]
        rows.append(pd.DataFrame({"event_type": e,
                                  "rnk": np.arange(1, len(u) + 1),
                                  "kh": u}))
    brute = pd.concat(rows, ignore_index=True)
    pd.testing.assert_frame_equal(out, brute, check_dtype=False)
    # estimate sanity: within 4x of the true distinct count per type
    # (k=32 gives ~18% relative stddev; 4x is a smoke bound, not stats)
    for e, grp in brute.groupby("event_type"):
        if len(grp) < Q.KMV_K:
            continue  # small group: sketch IS the exact distinct set
        est = kmv_estimate(int(grp["kh"].max()), Q.KMV_K)
        true = ev[ev["event_type"] == e]["user_id"].nunique()
        assert true / 4 <= est <= true * 4


def test_link_jaccard_matches_brute(sf_dir):
    out = Q.q_link_jaccard(sf_dir).to_pandas() \
        .sort_values(["v1", "v2"]).reset_index(drop=True)
    ids = np.sort(pq.read_table(f"{sf_dir}/documents.parquet",
                                columns=["doc_id"])
                  .column("doc_id").to_numpy().astype(np.int64))
    c1 = ids[ids >= 1]
    c2 = ids[(ids >= 2) & ((ids - 2) % 3 == 0)]
    a = np.r_[c1 - 1, c2 - 2]
    b = np.r_[c1, c2]
    edge_set = set(zip(a.tolist(), b.tolist()))
    nbrs: dict[int, set] = {}
    for x, y in edge_set:
        nbrs.setdefault(x, set()).add(y)
        nbrs.setdefault(y, set()).add(x)
    from collections import Counter
    common = Counter()
    for _u, vs in nbrs.items():
        vv = sorted(vs)
        for i in range(len(vv)):
            for j in range(i + 1, len(vv)):
                common[(vv[i], vv[j])] += 1
    rows = []
    for (v1, v2), c in sorted(common.items()):
        if (v1, v2) in edge_set:
            continue
        d1, d2 = len(nbrs[v1]), len(nbrs[v2])
        rows.append((v1, v2, c, d1, d2, c * 1000 // (d1 + d2 - c)))
    brute = pd.DataFrame(rows, columns=["v1", "v2", "common", "deg1",
                                        "deg2", "jaccard_milli"])
    pd.testing.assert_frame_equal(out, brute, check_dtype=False)
    assert len(out) > 0
