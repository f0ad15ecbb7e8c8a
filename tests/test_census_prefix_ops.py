"""Batch: script_census, prefix_dups, dim_census — brute refs."""

import re

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from osmquadtreepostgis_ray import queries as Q
from osmquadtreepostgis_ray.sources.images import dims_of, fmt_of


def _docs(sf_dir):
    return pq.read_table(f"{sf_dir}/documents.parquet").to_pandas()


def test_script_census_matches_brute(sf_dir):
    out = Q.q_script_census(sf_dir).to_pandas() \
        .sort_values(["lang", "source"]).reset_index(drop=True)
    d = _docs(sf_dir)
    d["n_chars"] = d["text"].str.len()
    d["n_vowels"] = d["text"].map(lambda s: len(re.findall("[aeiou]", s)))
    d["n_spaces"] = d["text"].str.count(" ")
    ref = d.groupby(["lang", "source"]).agg(
        n_docs=("doc_id", "size"), n_chars=("n_chars", "sum"),
        n_vowels=("n_vowels", "sum"),
        n_spaces=("n_spaces", "sum")).reset_index() \
        .sort_values(["lang", "source"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)


def test_prefix_dups_matches_brute(sf_dir):
    out = Q.q_prefix_dups(sf_dir).to_pandas() \
        .sort_values("prefix").reset_index(drop=True)
    d = _docs(sf_dir)
    d["prefix"] = d["text"].str[:Q.PREFIX_K]
    g = d.groupby("prefix").agg(n_docs=("doc_id", "size"),
                                min_doc=("doc_id", "min")).reset_index()
    ref = g[g["n_docs"] > 1].sort_values("prefix").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)
    assert (out["n_docs"] > 1).all()


def test_dim_census_matches_brute(sf_dir):
    out = Q.q_dim_census(sf_dir).to_pandas() \
        .sort_values(["fmt", "w", "h"]).reset_index(drop=True)
    ids = _docs(sf_dir)["doc_id"].to_numpy()
    w, h = dims_of(ids)
    d = pd.DataFrame({"fmt": fmt_of(ids), "w": w.astype(np.int64),
                      "h": h.astype(np.int64)})
    ref = d.groupby(["fmt", "w", "h"]).size().rename("n_images") \
        .reset_index()
    ref["px_total"] = ref["n_images"] * ref["w"] * ref["h"]
    ref["aspect_permille"] = ref["w"] * 1000 // ref["h"]
    ref = ref.sort_values(["fmt", "w", "h"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)
    # corpus totals conserve: every image lands in exactly one census row
    assert out["n_images"].sum() == len(ids)
