"""Batch: word_len_hist, child_occupancy, phash_bits — brute refs."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from osmquadtreepostgis_ray import queries as Q
from osmquadtreepostgis_ray.functions import geotag, quadtree


def test_word_len_hist_matches_brute(sf_dir):
    out = Q.q_word_len_hist(sf_dir).to_pandas() \
        .sort_values(["lang", "wlen"]).reset_index(drop=True)
    d = pq.read_table(f"{sf_dir}/documents.parquet",
                      columns=["text", "lang"]).to_pandas()
    acc = {}
    for lang, txt in zip(d["lang"], d["text"]):
        for w in txt.split():
            acc[(lang, len(w))] = acc.get((lang, len(w)), 0) + 1
    ref = pd.DataFrame([(l, k, n) for (l, k), n in sorted(acc.items())],
                       columns=["lang", "wlen", "n"])
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)


def test_child_occupancy_matches_brute(sf_dir):
    out = Q.q_child_occupancy(sf_dir).to_pandas() \
        .sort_values("n_children").reset_index(drop=True)
    ev = pq.read_table(f"{sf_dir}/events.parquet",
                       columns=["event_id", "user_id"]).to_pandas()
    lon, lat = geotag.event_lonlat_milli(ev["user_id"].to_numpy(),
                                         ev["event_id"].to_numpy())
    fx, fy = geotag.milli_to_fixed(lon, lat)
    ix, iy = quadtree.fixed_to_ixy(fx, fy, Q.CELL_DEPTH)
    c12 = quadtree.encode_ixy(ix, iy, Q.CELL_DEPTH)
    c10 = np.unique(quadtree.at_depth(c12, Q.CHILD_DEPTH))
    t8 = quadtree.at_depth(c10, Q.TILE_DEPTH)
    _, k = np.unique(t8, return_counts=True)
    u, n = np.unique(k, return_counts=True)
    ref = pd.DataFrame({"n_children": u.astype(np.int64),
                        "n_tiles": n.astype(np.int64)})
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)
    assert out["n_children"].max() <= 16


def test_phash_bits_matches_brute(sf_dir):
    out = Q.q_phash_bits(sf_dir).to_pandas() \
        .sort_values("bit").reset_index(drop=True)
    ids = pq.read_table(f"{sf_dir}/documents.parquet",
                        columns=["doc_id"]).column("doc_id").to_numpy()
    ph = geotag.phash_of(ids)
    assert (ph >= 0).all()
    ref = pd.DataFrame({
        "bit": np.arange(Q.PHASH_BITS, dtype=np.int64),
        "n_set": np.array([int(((ph >> k) & 1).sum())
                           for k in range(Q.PHASH_BITS)], np.int64)})
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)
    assert len(out) == Q.PHASH_BITS
