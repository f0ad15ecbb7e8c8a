"""Batch: tile_distinct_users, video_cuts, source_ttr — brute refs."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from osmquadtreepostgis_ray import queries as Q
from osmquadtreepostgis_ray.functions import codecs, geotag, quadtree
from osmquadtreepostgis_ray.stages.images import FRAMEDIFF_T


def test_tile_distinct_users_matches_brute(sf_dir):
    out = Q.q_tile_distinct_users(sf_dir).to_pandas() \
        .sort_values("tile").reset_index(drop=True)
    ev = pq.read_table(f"{sf_dir}/events.parquet",
                       columns=["event_id", "user_id"]).to_pandas()
    lon, lat = geotag.event_lonlat_milli(ev["user_id"].to_numpy(),
                                         ev["event_id"].to_numpy())
    fx, fy = geotag.milli_to_fixed(lon, lat)
    ix, iy = quadtree.fixed_to_ixy(fx, fy, Q.TILE_DEPTH)
    ev["tile"] = quadtree.encode_ixy(ix, iy, Q.TILE_DEPTH)
    ref = ev.groupby("tile")["user_id"].nunique().rename("n_users") \
        .reset_index().sort_values("tile").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)


def test_video_cuts_matches_brute(sf_dir):
    out = Q.q_video_cuts(sf_dir).to_pandas() \
        .sort_values("video_id").reset_index(drop=True)
    ids = np.sort(pq.read_table(f"{sf_dir}/documents.parquet",
                                columns=["doc_id"]).column("doc_id")
                  .to_numpy())
    ph = geotag.phash_of(ids)
    rows = []
    for i, d in enumerate(ids):
        nf = int(d) % 4 + 2
        frames = [np.asarray(codecs.synth_pixels(
            int(ph[i]) + f, 16, 16)).ravel().astype(np.int16)
            for f in range(nf)]
        cuts = [f for f in range(nf - 1)
                if int((np.abs(frames[f + 1] - frames[f])
                        > FRAMEDIFF_T).sum()) > Q.CUT_T]
        rows.append((int(d), len(cuts), cuts[0] if cuts else -1))
    ref = pd.DataFrame(rows, columns=["video_id", "n_cuts", "first_cut"]) \
        .sort_values("video_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)


def test_source_ttr_matches_brute(sf_dir):
    out = Q.q_source_ttr(sf_dir).to_pandas() \
        .sort_values("source").reset_index(drop=True)
    d = pq.read_table(f"{sf_dir}/documents.parquet",
                      columns=["text", "source"]).to_pandas()
    terms, toks = {}, {}
    for s, txt in zip(d["source"], d["text"]):
        ws = txt.split()
        terms.setdefault(s, set()).update(ws)
        toks[s] = toks.get(s, 0) + len(ws)
    rows = [(s, len(terms[s]), toks[s],
             len(terms[s]) * 1000 // max(toks[s], 1))
            for s in sorted(terms)]
    ref = pd.DataFrame(rows, columns=["source", "n_terms", "n_tokens",
                                      "ttr_permille"])
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)
