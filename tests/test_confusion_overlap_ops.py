"""Batch: lang_confusion, source_overlap, near_dup_rate — references
built from the already-verified minhash_pairs / lang_id outputs."""

import pandas as pd
import pyarrow.parquet as pq

from osmquadtreepostgis_ray import queries as Q


def test_lang_confusion_matches_components(sf_dir):
    out = Q.q_lang_confusion(sf_dir).to_pandas() \
        .sort_values(["lang", "lang_pred"]).reset_index(drop=True)
    pred = Q.q_lang_id(sf_dir).to_pandas()
    docs = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "lang"]).to_pandas()
    ref = pred.merge(docs, on="doc_id") \
        .groupby(["lang", "lang_pred"]).size().reset_index(name="n") \
        .sort_values(["lang", "lang_pred"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)
    assert int(out["n"].sum()) == len(docs)


def test_source_overlap_matches_components(sf_dir):
    out = Q.q_source_overlap(sf_dir).to_pandas() \
        .sort_values(["source_a", "source_b"]).reset_index(drop=True)
    pairs = Q.q_minhash_pairs(sf_dir).to_pandas()
    docs = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "source"]).to_pandas()
    src = dict(zip(docs["doc_id"], docs["source"]))
    cells = {}
    for a, b in zip(pairs["a"], pairs["b"]):
        sa, sb = sorted((src[a], src[b]))
        cells[(sa, sb)] = cells.get((sa, sb), 0) + 1
    ref = pd.DataFrame([(a, b, n) for (a, b), n in sorted(cells.items())],
                       columns=["source_a", "source_b", "n_pairs"])
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)
    assert int(out["n_pairs"].sum()) == len(pairs)


def test_near_dup_rate_matches_components(sf_dir):
    out = Q.q_near_dup_rate(sf_dir).to_pandas() \
        .sort_values("source").reset_index(drop=True)
    pairs = Q.q_minhash_pairs(sf_dir).to_pandas()
    docs = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "source"]).to_pandas()
    dup = set(pairs["a"]) | set(pairs["b"])
    docs["dup"] = docs["doc_id"].isin(dup).astype(int)
    ref = docs.groupby("source").agg(n_docs=("dup", "size"),
                                     n_dup=("dup", "sum")).reset_index()
    ref["dup_permille"] = ref["n_dup"] * 1000 // ref["n_docs"]
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)
