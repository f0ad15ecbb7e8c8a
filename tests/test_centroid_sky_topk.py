"""Centroid numerators, skyline, windowed top-k: brute references."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from osmquadtreepostgis_ray import queries as Q
from osmquadtreepostgis_ray.functions import geotag
from osmquadtreepostgis_ray.stages.assembly import GROUP_SIZE


def test_centroids_matches_brute(sf_dir):
    out = Q.q_centroids(sf_dir).to_pandas() \
        .sort_values(["osm_id", "part"]).reset_index(drop=True)
    docs = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    ph = geotag.phash_of(docs["doc_id"].to_numpy())
    docs["x"] = ph % 360000
    docs["y"] = (ph // 360000) % 170000
    docs["gid"] = docs["doc_id"] // GROUP_SIZE
    docs["closehit"] = docs["text"].str.count(r"\bmerge\b")
    rows = []
    for gid, g in docs.sort_values("doc_id").groupby("gid"):
        k = len(g)
        closed = (g["closehit"] > 0).any() and k >= 3
        if not closed or (k >= 6 and gid % 2 == 0):
            continue
        m = k // 2 if k >= 6 else k
        rings = [(1, g.iloc[:m])] + ([(2, g.iloc[m:])] if m < k else [])
        for part, r in rings:
            x = r["x"].to_numpy(np.int64)
            y = r["y"].to_numpy(np.int64)
            xn, yn = np.roll(x, -1), np.roll(y, -1)
            cross = x * yn - xn * y
            rows.append((-int(gid), part, int(cross.sum()),
                         int(((x + xn) * cross).sum()),
                         int(((y + yn) * cross).sum())))
    ref = pd.DataFrame(rows, columns=["osm_id", "part", "a2", "cxn", "cyn"]) \
        .sort_values(["osm_id", "part"]).reset_index(drop=True)
    assert (ref["a2"] != 0).any()     # orientation signal survives (no abs)
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)


def test_skyline_matches_brute(sf_dir):
    out = Q.q_skyline(sf_dir).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    docs = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    nt = docs["text"].str.split().str.len().to_numpy(np.int64)
    stop = sum(docs["text"].str.count(rf"\b{w}\b").to_numpy(np.int64)
               for w in ("the", "a", "of", "and"))
    sp = np.where(nt > 0, (1000 * stop) // np.maximum(nt, 1), 0)
    keep = []
    for i in range(len(nt)):
        dom = ((nt >= nt[i]) & (sp >= sp[i])
               & ((nt > nt[i]) | (sp > sp[i]))).any()
        if not dom:
            keep.append(i)
    ref = pd.DataFrame({"doc_id": docs["doc_id"].to_numpy()[keep],
                        "n_tokens": nt[keep], "stop_permille": sp[keep]}) \
        .sort_values("doc_id").reset_index(drop=True)
    # the front is a proper subset and is mutually undominated
    assert 0 < len(ref) < len(docs)
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)


def test_windowed_topk_matches_brute(sf_dir):
    out = Q.q_windowed_topk(sf_dir)
    out = (out.to_pandas() if not isinstance(out, pd.DataFrame) else out)
    out = out.sort_values(["hour", "rank"]).reset_index(drop=True)
    ev = pq.read_table(f"{sf_dir}/events.parquet",
                       columns=["ts", "event_type"]).to_pandas()
    ev["hour"] = ev["ts"].astype("int64") // 3_600_000_000
    c = ev.groupby(["hour", "event_type"]).size().reset_index(name="n")
    c = c.sort_values(["hour", "n", "event_type"],
                      ascending=[True, False, True], kind="stable")
    c["rank"] = c.groupby("hour").cumcount() + 1
    ref = c[c["rank"] <= Q.WTOPK_K].reset_index(drop=True)
    ref["n"] = ref["n"].astype(np.int64)
    assert (ref.groupby("hour")["rank"].max() <= Q.WTOPK_K).all()
    pd.testing.assert_frame_equal(
        out, ref[["hour", "event_type", "n", "rank"]], check_dtype=False)
