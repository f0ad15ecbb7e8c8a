"""Batch: caption_len_by_dims, tile_type_diversity — brute refs."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from osmquadtreepostgis_ray import queries as Q
from osmquadtreepostgis_ray.functions import geotag, quadtree
from osmquadtreepostgis_ray.sources.images import dims_of


def test_caption_len_by_dims_matches_brute(sf_dir):
    out = Q.q_caption_len_by_dims(sf_dir).to_pandas() \
        .sort_values(["w", "h"]).reset_index(drop=True)
    d = pq.read_table(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "text"]).to_pandas()
    w, h = dims_of(d["doc_id"].to_numpy())
    d["w"] = w.astype(np.int64)
    d["h"] = h.astype(np.int64)
    d["nc"] = d["text"].str.len()
    ref = d.groupby(["w", "h"]).agg(
        n_images=("nc", "size"), sum_chars=("nc", "sum"),
        max_chars=("nc", "max")).reset_index() \
        .sort_values(["w", "h"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)


def test_tile_type_diversity_matches_brute(sf_dir):
    out = Q.q_tile_type_diversity(sf_dir).to_pandas() \
        .sort_values("n_types").reset_index(drop=True)
    ev = pq.read_table(f"{sf_dir}/events.parquet",
                       columns=["event_id", "user_id",
                                "event_type"]).to_pandas()
    lon, lat = geotag.event_lonlat_milli(ev["user_id"].to_numpy(),
                                         ev["event_id"].to_numpy())
    fx, fy = geotag.milli_to_fixed(lon, lat)
    ix, iy = quadtree.fixed_to_ixy(fx, fy, Q.TILE_DEPTH)
    ev["tile"] = quadtree.encode_ixy(ix, iy, Q.TILE_DEPTH)
    k = ev.groupby("tile")["event_type"].nunique()
    ref = k.value_counts().rename("n_tiles").reset_index()
    ref.columns = ["n_types", "n_tiles"]
    ref = ref.sort_values("n_types").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)
    assert out["n_types"].max() <= ev["event_type"].nunique()
